"""TPU drive for the Pallas paged-attention decode kernel: on-device
correctness vs the XLA gather path (models/llm.py fallback), plus
steady-state timings. Not a test — run by hand on the TPU backend.

Timing: chains N decode steps inside ONE jit (the carry runs q through
the output so XLA cannot elide iterations) and fetches a scalar;
per-iter = total/N (tunnel RTT amortized; see docs/profiles/
flash_attention.md for the methodology).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, time, statistics, sys
from multi_spatialmllm_tpu.ops.paged_attention import paged_decode_attention

print("backend:", jax.default_backend(), flush=True)
B, H, KVH, hd = 8, 32, 8, 128       # flagship decode shape
ps, pps = 64, 32                    # 2048-token window per slot
if len(sys.argv) > 1:
    B, H, KVH, hd, ps, pps = map(int, sys.argv[1:7])
pool = B * pps + 1
print(f"slots={B} H={H} KVH={KVH} hd={hd} page={ps} pages/slot={pps} "
      f"pool={pool}", flush=True)

keys = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(keys[0], (B, H, 1, hd), dtype=jnp.bfloat16)
kp = jax.random.normal(keys[1], (pool, KVH, ps, hd), dtype=jnp.bfloat16)
vp = jax.random.normal(keys[2], (pool, KVH, ps, hd), dtype=jnp.bfloat16)
# every slot owns a distinct page run; mixed live lengths (continuous
# batching steady state): some slots near-full, some freshly prefilled
pt_np = np.zeros((B, pps), dtype=np.int32)
idx_np = np.zeros(B, dtype=np.int32)
lens = [ps * pps - 1, 1500, 1024, 700, 512, 300, 130, 64]
nxt = 1
for b in range(B):
    live = min(lens[b % len(lens)], ps * pps - 1)
    need = -(-(live + 1) // ps)
    pt_np[b, :need] = np.arange(nxt, nxt + need)
    nxt += need
    idx_np[b] = live
pt = jnp.asarray(pt_np)
idx = jnp.asarray(idx_np)
print("live lengths:", idx_np.tolist(), flush=True)


def gather_path(q, kp, vp, pt, idx):
    """The models/llm.py XLA fallback, verbatim semantics."""
    b, h, _, d = q.shape
    kvh = kp.shape[1]
    kw = kp[pt]                              # [B, PPS, KVH, ps, hd]
    vw = vp[pt]
    win = kw.shape[1] * kw.shape[3]
    k = kw.transpose(0, 2, 1, 3, 4).reshape(b, kvh, win, d)
    v = vw.transpose(0, 2, 1, 3, 4).reshape(b, kvh, win, d)
    qg = q.reshape(b, kvh, h // kvh, 1, d)
    s = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k).astype(jnp.float32)
    s = s * (d ** -0.5)
    valid = jnp.arange(win)[None, None, None, None, :] <= \
        idx[:, None, None, None, None]
    s = jnp.where(valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bgrqk,bgkd->bgrqd", p, v).reshape(b, h, 1, d)


kern = jax.jit(paged_decode_attention)
xla = jax.jit(gather_path)
o1 = kern(q, kp, vp, pt, idx)
o2 = xla(q, kp, vp, pt, idx)
print("max diff vs gather path:",
      float(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)).max()),
      f"(scale {float(jnp.abs(o2.astype(jnp.float32)).max()):.2f})",
      flush=True)

import statistics as _st
noop = jax.jit(lambda x: x + 1)
noop(jnp.zeros(()))
_ts = []
for _ in range(8):
    t0 = time.perf_counter()
    float(noop(jnp.zeros(())))
    _ts.append(time.perf_counter() - t0)
RTT = _st.median(_ts)
print(f"noop rtt: {RTT*1e3:.1f} ms", flush=True)

N = 1024


def chain(attn):
    @jax.jit
    def run(q, kp, vp, pt, idx):
        def body(qc, _):
            return attn(qc, kp, vp, pt, idx).astype(qc.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out
    return run


def timed_n(name, run, n=6):
    fn = lambda: run(q, kp, vp, pt, idx)
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn()).astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{name}: {med*1e3:.1f} ms total, "
          f"{(med - RTT)*1e6/N:.1f} us/iter rtt-corrected "
          f"(x{N} in-jit)", flush=True)


timed_n(f"paged kernel x{N}", chain(paged_decode_attention))
timed_n(f"xla gather   x{N}", chain(gather_path))
