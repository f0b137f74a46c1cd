"""TPU drive for the flash-attention kernels: correctness on-device plus
steady-state timings of forward, Pallas backward, and the XLA/recompute
baselines. Not a test — run by hand on the TPU backend."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, time, statistics
from multi_spatialmllm_tpu.ops import attention as A

print("backend:", jax.default_backend(), flush=True)
B, H, S, D = 2, 8, 2048, 128
q = jax.random.normal(jax.random.key(0), (B, H, S, D), dtype=jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (B, H, S, D), dtype=jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (B, H, S, D), dtype=jnp.bfloat16)

t0 = time.time()
o1 = A.flash_attention(q, k, v, causal=True); o1.block_until_ready()
print("flash fwd compile+run", round(time.time() - t0, 1), flush=True)
ref = jax.jit(lambda q, k, v: A.reference_attention(q, k, v, causal=True))
t0 = time.time(); o2 = ref(q, k, v); o2.block_until_ready()
print("xla fwd compile+run", round(time.time() - t0, 1), flush=True)
print("fwd max diff:", float(jnp.abs(o1.astype(jnp.float32) -
                                     o2.astype(jnp.float32)).max()), flush=True)

def timed(name, fn, n=20):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {statistics.median(ts)*1e3:.3f} ms", flush=True)

timed("fwd pallas", lambda: A.flash_attention(q, k, v, causal=True))
timed("fwd xla   ", lambda: ref(q, k, v))

# Training step: value+grad through each backward implementation.
def loss_pallas(q, k, v):
    return jnp.sum(A.trainable_flash_attention(q, k, v, True).astype(jnp.float32))

def loss_xla(q, k, v):
    return jnp.sum(A.reference_attention(q, k, v, causal=True).astype(jnp.float32))

g_pallas = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))
g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))

dq1, dk1, dv1 = g_pallas(q, k, v)
dq2, dk2, dv2 = g_xla(q, k, v)
for name, a, b in (("dq", dq1, dq2), ("dk", dk1, dk2), ("dv", dv1, dv2)):
    print(f"{name} max diff:",
          float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
          flush=True)

timed("grad pallas bwd", lambda: g_pallas(q, k, v))
timed("grad xla bwd   ", lambda: g_xla(q, k, v))
