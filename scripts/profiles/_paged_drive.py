"""TPU drive for paged-KV serving (models/paged_kv.py). Two checks:

1. Gather-fallback config (tiny model, head_dim 32 — paged_kernel_ok
   gates the kernel off): PagedBatcher greedy tokens are BIT-IDENTICAL
   to the contiguous ContinuousBatcher, as on CPU.
2. Kernel-engaged config (head_dim 128): the Pallas paged-attention
   kernel decodes end to end; runs are deterministic (re-run identical),
   and a single fused decode step's attention output matches the XLA
   gather path within bf16 noise. (Exact greedy-token parity vs the
   gather path is NOT asserted here: the kernel's online softmax is a
   different float accumulation order, which can flip near-tie argmaxes
   of a random-weights model — same caveat as the flash training
   kernels.)
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)
from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.llm import LLMConfig
from multi_spatialmllm_tpu.models.paged_kv import PagedBatcher, PagedConfig
from multi_spatialmllm_tpu.models.serving import ContinuousBatcher, ServeConfig


def make_requests(cfg, lens, seed=5):
    t_img = cfg.tokens_per_tile
    rng = np.random.default_rng(seed)
    requests = []
    for i, L in enumerate(lens):
        ids = rng.integers(10, cfg.llm.vocab_size, size=L).astype(np.int32)
        ids[1:1+t_img] = cfg.img_context_id
        tiles = np.asarray(jax.random.normal(jax.random.key(100+i),
            (1, cfg.vit.image_size, cfg.vit.image_size, 3),
            dtype=jnp.float32))
        requests.append((ids, tiles))
    return requests


# --- 1. gather fallback: bit parity vs the contiguous batcher ---------------
cfg = M.tiny_config()
model = M.MultiFrameMLLM(cfg)
b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
params = model.init(jax.random.key(0), b0["input_ids"], b0["tiles"])
requests = make_requests(cfg, (40, 63, 48, 62, 44))
pcfg = PagedConfig(slots=2, page_size=16, num_pages=12, max_prompt_len=64,
                   max_new_tokens=6, chunk=2, length_bucket=64)
paged = PagedBatcher(model, params, pcfg, pad_id=0, eos_id=2) \
    .generate_all(requests)
contig = ContinuousBatcher(model, params,
    ServeConfig(slots=2, max_prompt_len=64, max_new_tokens=6, chunk=2,
                length_bucket=64), pad_id=0, eos_id=2).generate_all(requests)
for p, c in zip(paged, contig):
    np.testing.assert_array_equal(p, c)
print("fallback: paged == contiguous for", len(requests), "requests:",
      [list(map(int, p)) for p in paged], flush=True)

# --- 2. kernel engaged: e2e decode + determinism + step-level agreement -----
kcfg = M.MLLMConfig(vit=cfg.vit, llm=LLMConfig(
    vocab_size=512, hidden_size=512, num_layers=2, num_heads=4,
    num_kv_heads=2, ffn_size=256, max_seq_len=512))
kmodel = M.MultiFrameMLLM(kcfg)
kb0 = M.make_example_batch(kcfg, batch=1, n_tiles=1, seq_len=64)
kparams = kmodel.init(jax.random.key(0), kb0["input_ids"], kb0["tiles"])
krequests = make_requests(kcfg, (40, 63, 48, 62, 44))
run1 = PagedBatcher(kmodel, kparams, pcfg, pad_id=0, eos_id=2) \
    .generate_all(krequests)
run2 = PagedBatcher(kmodel, kparams, pcfg, pad_id=0, eos_id=2) \
    .generate_all(krequests)
for a, b in zip(run1, run2):
    np.testing.assert_array_equal(a, b)
print("kernel: deterministic e2e decode for", len(krequests), "requests:",
      [list(map(int, p)) for p in run1], flush=True)

# single fused decode step vs the XLA gather path on live pools
from multi_spatialmllm_tpu.ops.paged_attention import (
    paged_decode_attention, paged_kernel_ok)
lcfg = kcfg.llm
B, H, KVH, hd, ps, pps = 4, lcfg.num_heads, lcfg.num_kv_heads, \
    lcfg.head_dim, 16, 5
pool = B * pps + 1
keys = jax.random.split(jax.random.key(1), 5)
q = jax.random.normal(keys[0], (B, H, 1, hd), dtype=jnp.bfloat16)
kp = jax.random.normal(keys[1], (pool, KVH, ps, hd), dtype=jnp.bfloat16)
vp = jax.random.normal(keys[2], (pool, KVH, ps, hd), dtype=jnp.bfloat16)
kn = jax.random.normal(keys[3], (B, KVH, hd), dtype=jnp.bfloat16)
vn = jax.random.normal(keys[4], (B, KVH, hd), dtype=jnp.bfloat16)
pt = np.zeros((B, pps), np.int32)
idx = np.asarray([ps*3+2, ps*2, 7, 0], np.int32)
nxt = 1
for b in range(B):
    need = idx[b] // ps + 1
    pt[b, :need] = np.arange(nxt, nxt + need)
    nxt += need
pt, idx = jnp.asarray(pt), jnp.asarray(idx)
assert paged_kernel_ok(q, kp)
out, kp2, vp2 = paged_decode_attention(q, kp, vp, pt, idx,
                                       k_new=kn, v_new=vn)
page = jnp.take_along_axis(pt, (idx // ps)[:, None], axis=1)[:, 0]
off = idx % ps
kp_ref = kp.at[page, :, off, :].set(kn)
vp_ref = vp.at[page, :, off, :].set(vn)
np.testing.assert_array_equal(np.asarray(kp2), np.asarray(kp_ref))
np.testing.assert_array_equal(np.asarray(vp2), np.asarray(vp_ref))
kvh = KVH
kw = kp_ref[pt]; vw = vp_ref[pt]
win = kw.shape[1]*kw.shape[3]
k = kw.transpose(0,2,1,3,4).reshape(B,kvh,win,hd)
v = vw.transpose(0,2,1,3,4).reshape(B,kvh,win,hd)
qg = q.reshape(B,kvh,H//kvh,1,hd)
s = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k).astype(jnp.float32)*(hd**-0.5)
valid = jnp.arange(win)[None,None,None,None,:] <= idx[:,None,None,None,None]
s = jnp.where(valid, s, -1e30)
p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
want = jnp.einsum("bgrqk,bgkd->bgrqd", p, v).reshape(B,H,1,hd)
d = float(jnp.abs(out.astype(jnp.float32) - want.astype(jnp.float32)).max())
print(f"kernel: pools bit-exact after fused write; step max diff vs "
      f"gather path {d:.4f} (bf16 noise)", flush=True)
assert d < 0.05, d
