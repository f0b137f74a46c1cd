"""TPU drive for the GQA-native flash kernels: on-device correctness vs
the XLA GQA reference, plus steady-state timings against the repeat-kv
kernel path it replaces. Not a test — run by hand on the TPU backend.

Timing: fetches a scalar from the result (block_until_ready does not
reliably block through the axon tunnel) and reports the median; the noop
round-trip baseline is printed for reference.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, time, statistics
from multi_spatialmllm_tpu.ops import attention as A

import sys
print("backend:", jax.default_backend(), flush=True)
B, H, KVH, S, D = 2, 16, 4, 2048, 128
if len(sys.argv) > 1:
    B, H, KVH, S, D = map(int, sys.argv[1:6])
print("shape:", (B, H, KVH, S, D), flush=True)
q = jax.random.normal(jax.random.key(0), (B, H, S, D), dtype=jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (B, KVH, S, D), dtype=jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (B, KVH, S, D), dtype=jnp.bfloat16)


def timed(name, fn, n=20):
    fn()  # warm/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn()[0]).astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {statistics.median(ts)*1e3:.3f} ms", flush=True)


noop = jax.jit(lambda x: x + 1)
timed("noop rtt       ", lambda: (noop(jnp.zeros(())),))

# --- forward: GQA-native kernel vs XLA vs repeat-then-kernel ---------------
rep = H // KVH
kr = jnp.repeat(k, rep, axis=1)
vr = jnp.repeat(v, rep, axis=1)

fwd_gqa = jax.jit(lambda q, k, v: A.trainable_flash_attention(q, k, v, True))
fwd_rep = jax.jit(
    lambda q, k, v: A.trainable_flash_attention(
        q, jnp.repeat(k, rep, axis=1), jnp.repeat(v, rep, axis=1), True))
ref = jax.jit(lambda q, k, v: A.reference_attention(q, k, v, causal=True))

o1 = fwd_gqa(q, k, v)
o2 = ref(q, k, v)
print("fwd max diff vs xla:",
      float(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)).max()),
      flush=True)

timed("fwd gqa-native ", lambda: (fwd_gqa(q, k, v),))
timed("fwd repeat+kern", lambda: (fwd_rep(q, k, v),))
timed("fwd xla        ", lambda: (ref(q, k, v),))

# --- backward ---------------------------------------------------------------
def loss_gqa(q, k, v):
    return jnp.sum(A.trainable_flash_attention(q, k, v, True).astype(jnp.float32))

def loss_rep(q, k, v):
    return jnp.sum(A.trainable_flash_attention(
        q, jnp.repeat(k, rep, axis=1), jnp.repeat(v, rep, axis=1),
        True).astype(jnp.float32))

def loss_xla(q, k, v):
    return jnp.sum(A.reference_attention(q, k, v, causal=True).astype(jnp.float32))

g_gqa = jax.jit(jax.grad(loss_gqa, argnums=(0, 1, 2)))
g_rep = jax.jit(jax.grad(loss_rep, argnums=(0, 1, 2)))
g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))

dq1, dk1, dv1 = g_gqa(q, k, v)
dq2, dk2, dv2 = g_xla(q, k, v)
for name, a, b in (("dq", dq1, dq2), ("dk", dk1, dk2), ("dv", dv1, dv2)):
    print(f"{name} max diff:",
          float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
          f"(scale {float(jnp.abs(b.astype(jnp.float32)).max()):.1f})",
          flush=True)

timed("grad gqa-native ", lambda: g_gqa(q, k, v))
timed("grad repeat+kern", lambda: g_rep(q, k, v))
timed("grad xla        ", lambda: g_xla(q, k, v))

# --- amortized: N chained iterations inside ONE dispatch --------------------
# (per-iteration device time = (total - noop rtt) / N; the chain carries
# q through the output so XLA cannot parallelize or elide iterations)
N = 32


def chain_fwd(attn):
    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            return attn(qc, k, v).astype(qc.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out
    return run


def chain_grad(loss):
    g = jax.grad(loss, argnums=(0, 1, 2))
    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            dq, dk, dv = g(qc, k, v)
            return qc + 1e-6 * dq.astype(qc.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out
    return run


def timed_n(name, run, n=6):
    fn = lambda: run(q, k, v)
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn()).astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{name}: {med*1e3:.1f} ms total, "
          f"{(med*1e3)/N:.3f} ms/iter (x{N} in-jit)", flush=True)


timed_n("fwd  gqa-native x32", chain_fwd(
    lambda q_, k_, v_: A.trainable_flash_attention(q_, k_, v_, True)))
timed_n("fwd  repeat+kern x32", chain_fwd(
    lambda q_, k_, v_: A.trainable_flash_attention(
        q_, jnp.repeat(k_, rep, axis=1), jnp.repeat(v_, rep, axis=1), True)))
timed_n("fwd  xla         x32", chain_fwd(
    lambda q_, k_, v_: A.reference_attention(q_, k_, v_, causal=True)))
timed_n("grad gqa-native x32", chain_grad(loss_gqa))
timed_n("grad repeat+kern x32", chain_grad(loss_rep))
timed_n("grad xla         x32", chain_grad(loss_xla))
