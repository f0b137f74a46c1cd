"""Verify int8 paged-KV serving end-to-end on the real TPU backend."""
import numpy as np
import jax
import jax.numpy as jnp

import multi_spatialmllm_tpu as msm
msm.enable_compilation_cache()

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.paged_kv import PagedBatcher, PagedConfig

print("backend:", jax.default_backend())

cfg = M.tiny_config()
model = M.MultiFrameMLLM(cfg)
rng = jax.random.key(0)
tok = jnp.ones((1, 8), dtype=jnp.int32)
params = model.init(rng, tok, method=lambda m, t: m.llm(m.llm.embed(t)))
vocab = cfg.llm.vocab_size

rq = np.random.default_rng(11)
requests = [rq.integers(3, vocab, size=rq.integers(4, 60)).astype(np.int32)
            for _ in range(5)]

def run(kv_dtype, slots=3, num_pages=48):
    b = PagedBatcher(
        model, params,
        PagedConfig(slots=slots, page_size=16, num_pages=num_pages,
                    max_prompt_len=128, max_new_tokens=8, chunk=2,
                    length_bucket=64, kv_dtype=kv_dtype),
        pad_id=0, eos_id=2)
    return b.generate_all(list(requests))

fp = run("native")
q8 = run("int8")
q8_pressure = run("int8", slots=2, num_pages=14)

for a, p in zip(q8, q8_pressure):
    np.testing.assert_array_equal(a, p)
print("int8 outputs invariant to slots/pool pressure: OK")

first_match = sum(int(a[0] == f[0]) for a, f in zip(q8, fp))
print(f"first-token (prefill, fp) agreement: {first_match}/{len(fp)}")
assert first_match == len(fp)

agree = sum(int(np.array_equal(a, f)) for a, f in zip(q8, fp))
print(f"full-sequence agreement fp vs int8 (tiny random model): {agree}/{len(fp)}")
print("VERIFY OK")
