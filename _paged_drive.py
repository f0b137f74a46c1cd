import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)
from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.paged_kv import PagedBatcher, PagedConfig
from multi_spatialmllm_tpu.models.serving import ContinuousBatcher, ServeConfig

cfg = M.tiny_config()
model = M.MultiFrameMLLM(cfg)
b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
params = model.init(jax.random.key(0), b0["input_ids"], b0["tiles"])
t_img = cfg.tokens_per_tile
rng = np.random.default_rng(5)
requests = []
for i, L in enumerate((40, 63, 48, 62, 44)):
    ids = rng.integers(10, cfg.llm.vocab_size, size=L).astype(np.int32)
    ids[1:1+t_img] = cfg.img_context_id
    tiles = np.asarray(jax.random.normal(jax.random.key(100+i),
        (1, cfg.vit.image_size, cfg.vit.image_size, 3), dtype=jnp.float32))
    requests.append((ids, tiles))
paged = PagedBatcher(model, params,
    PagedConfig(slots=2, page_size=16, num_pages=12, max_prompt_len=64,
                max_new_tokens=6, chunk=2, length_bucket=64),
    pad_id=0, eos_id=2).generate_all(requests)
contig = ContinuousBatcher(model, params,
    ServeConfig(slots=2, max_prompt_len=64, max_new_tokens=6, chunk=2,
                length_bucket=64), pad_id=0, eos_id=2).generate_all(requests)
for p, c in zip(paged, contig):
    np.testing.assert_array_equal(p, c)
print("paged == contiguous on TPU for", len(requests), "requests:",
      [list(map(int, p)) for p in paged], flush=True)
