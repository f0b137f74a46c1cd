import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, time
from multi_spatialmllm_tpu.ops.attention import flash_attention, reference_attention, trainable_flash_attention
print("backend:", jax.default_backend(), flush=True)
q = jax.random.normal(jax.random.key(0), (2, 8, 1024, 128), dtype=jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (2, 8, 1024, 128), dtype=jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (2, 8, 1024, 128), dtype=jnp.bfloat16)
t0=time.time(); o1 = flash_attention(q, k, v, causal=True); o1.block_until_ready(); print("flash compile+run", round(time.time()-t0,1), flush=True)
ref = jax.jit(lambda q,k,v: reference_attention(q,k,v,causal=True))
t0=time.time(); o2 = ref(q,k,v); o2.block_until_ready(); print("ref compile+run", round(time.time()-t0,1), flush=True)
err = float(jnp.abs(o1.astype(jnp.float32)-o2.astype(jnp.float32)).max())
print("max diff flash vs ref:", err, flush=True)
import statistics
for name, fn in (("flash", lambda: flash_attention(q,k,v,causal=True)), ("xla", lambda: ref(q,k,v))):
    ts=[]
    for _ in range(20):
        t0=time.perf_counter(); fn().block_until_ready(); ts.append(time.perf_counter()-t0)
    print(name, f"{statistics.median(ts)*1e3:.3f} ms", flush=True)
# gradient path
def loss(q):
    return jnp.sum(trainable_flash_attention(q, k, v, True).astype(jnp.float32))
g = jax.jit(jax.grad(loss))(q)
print("grad ok:", g.shape, bool(jnp.isfinite(g.astype(jnp.float32)).all()), flush=True)
