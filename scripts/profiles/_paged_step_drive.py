"""TPU drive: realistic paged decode STEP (kv scatter-write + attention,
pools carried through the chain) — Pallas kernel vs XLA gather fallback.
This is the actual per-layer work in models/llm.py's paged branch."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, time, statistics, sys
from multi_spatialmllm_tpu.ops.paged_attention import paged_decode_attention

print("backend:", jax.default_backend(), flush=True)
B, H, KVH, hd = 8, 32, 8, 128
ps, pps = 64, 32
if len(sys.argv) > 1:
    B, H, KVH, hd, ps, pps = map(int, sys.argv[1:7])
pool = B * pps + 1
print(f"slots={B} H={H} KVH={KVH} hd={hd} page={ps} pages/slot={pps} "
      f"pool={pool}", flush=True)

keys = jax.random.split(jax.random.key(0), 5)
q = jax.random.normal(keys[0], (B, H, 1, hd), dtype=jnp.bfloat16)
kp0 = jax.random.normal(keys[1], (pool, KVH, ps, hd), dtype=jnp.bfloat16)
vp0 = jax.random.normal(keys[2], (pool, KVH, ps, hd), dtype=jnp.bfloat16)
knew = jax.random.normal(keys[3], (B, KVH, hd), dtype=jnp.bfloat16)
pt_np = np.zeros((B, pps), dtype=np.int32)
idx_np = np.zeros(B, dtype=np.int32)
lens = [ps * pps - 1, 1500, 1024, 700, 512, 300, 130, 64]
nxt = 1
for b in range(B):
    live = min(lens[b % len(lens)], ps * pps - 2)
    need = -(-(live + 1) // ps)
    pt_np[b, :need] = np.arange(nxt, nxt + need)
    nxt += need
    idx_np[b] = live
pt = jnp.asarray(pt_np)
idx0 = jnp.asarray(idx_np)
print("live lengths:", idx_np.tolist(), flush=True)


def write_kv(kp, vp, knew, pt, idx):
    """models/llm.py:100-114 scatter of the new kv row."""
    page = jnp.take_along_axis(pt, (idx // ps)[:, None], axis=1)[:, 0]
    off = idx % ps
    kp = kp.at[page, :, off, :].set(knew)
    vp = vp.at[page, :, off, :].set(knew)
    return kp, vp


def gather_attend(q, kp, vp, pt, idx):
    b, h, _, d = q.shape
    kvh = kp.shape[1]
    kw = kp[pt]
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


N = 256


def chain(attn):
    @jax.jit
    def run(q, kp, vp, pt, idx):
        def body(carry, _):
            qc, kp, vp, idx = carry
            kp, vp = write_kv(kp, vp, knew + qc[:, 0, 0, :1], pt, idx)
            out = attn(qc, kp, vp, pt, idx).astype(qc.dtype)
            return (out, kp, vp, idx), ()
        (qo, kp, vp, idx), _ = jax.lax.scan(
            body, (q, kp, vp, idx), None, length=N)
        return qo
    return run


noop = jax.jit(lambda x: x + 1)
noop(jnp.zeros(()))
_ts = []
for _ in range(8):
    t0 = time.perf_counter()
    float(noop(jnp.zeros(())))
    _ts.append(time.perf_counter() - t0)
RTT = statistics.median(_ts)
print(f"noop rtt: {RTT*1e3:.1f} ms", flush=True)


def timed_n(name, run, n=6):
    fn = lambda: run(q, kp0, vp0, pt, idx0)
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn()).astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{name}: {med*1e3:.1f} ms total, "
          f"{(med - RTT)*1e6/N:.1f} us/step rtt-corrected "
          f"(x{N} in-jit)", flush=True)


def chain_fused():
    @jax.jit
    def run(q, kp, vp, pt, idx):
        def body(carry, _):
            qc, kp, vp, idx = carry
            kn = knew + qc[:, 0, 0, :1]
            out, kp, vp = paged_decode_attention(
                qc, kp, vp, pt, idx, k_new=kn, v_new=kn)
            return (out.astype(qc.dtype), kp, vp, idx), ()
        (qo, kp, vp, idx), _ = jax.lax.scan(
            body, (q, kp, vp, idx), None, length=N)
        return qo
    return run


timed_n(f"fused kernel x{N}", chain_fused())
timed_n(f"write+kernel x{N}", chain(paged_decode_attention))
timed_n(f"write+gather x{N}", chain(gather_attend))

def chain_write_only():
    @jax.jit
    def run(q, kp, vp, pt, idx):
        def body(carry, _):
            qc, kp, vp, idx = carry
            kp, vp = write_kv(kp, vp, knew + qc[:, 0, 0, :1], pt, idx)
            qc = qc + kp[0, 0, 0, 0] + vp[0, 0, 0, 0]
            return (qc, kp, vp, idx), ()
        (qo, kp, vp, idx), _ = jax.lax.scan(
            body, (q, kp, vp, idx), None, length=N)
        return qo
    return run

timed_n(f"write only   x{N}", chain_write_only())
