import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, time, statistics
from multi_spatialmllm_tpu.ops import attention as A
B, H, KVH, S, hd = 2, 16, 4, 4096, 128
nseg, seglen = 16, 256
keys = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(keys[0], (B, H, S, hd), dtype=jnp.bfloat16)
k = jax.random.normal(keys[1], (B, KVH, S, hd), dtype=jnp.bfloat16)
v = jax.random.normal(keys[2], (B, KVH, S, hd), dtype=jnp.bfloat16)
seg = jnp.asarray(np.repeat(np.arange(nseg), seglen)[None].repeat(B, 0).astype(np.int32))
noop = jax.jit(lambda x: x + 1); noop(jnp.zeros(()))
ts=[]
for _ in range(8):
    t0=time.perf_counter(); float(noop(jnp.zeros(()))); ts.append(time.perf_counter()-t0)
RTT = statistics.median(ts)
N = 32
sm = hd ** -0.5
def chain(bq, bk):
    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            o, lse = A._flash_fwd(qc, k, v, True, sm, bq, bk, segment_ids=seg)
            g = jnp.ones_like(o)
            dq, dk, dv = A._flash_bwd(qc, k, v, o, lse, g, True, sm, bq, bk, segment_ids=seg)
            return qc + 1e-6 * dq.astype(qc.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out
    return run
for bq, bk in [(128,128),(256,256),(512,512)]:
    fn = chain(bq, bk); fn(q, k, v)
    ts=[]
    for _ in range(5):
        t0=time.perf_counter(); float(jnp.sum(fn(q,k,v)).astype(jnp.float32)); ts.append(time.perf_counter()-t0)
    med=statistics.median(ts)
    print(f"packed fwd+bwd bq={bq} bk={bk}: {(med-RTT)*1e6/N:.0f} us/iter", flush=True)
