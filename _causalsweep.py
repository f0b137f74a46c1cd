import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, time, statistics, sys
from multi_spatialmllm_tpu.ops import attention as A
B, H, KVH, S, hd = 2, 32, 8, 2048, 128
if len(sys.argv) > 1:
    B, H, KVH, S, hd = map(int, sys.argv[1:6])
print(f"B{B} H{H} KVH{KVH} S{S} hd{hd}", flush=True)
keys = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(keys[0], (B, H, S, hd), dtype=jnp.bfloat16)
k = jax.random.normal(keys[1], (B, KVH, S, hd), dtype=jnp.bfloat16)
v = jax.random.normal(keys[2], (B, KVH, S, hd), dtype=jnp.bfloat16)
noop = jax.jit(lambda x: x + 1); noop(jnp.zeros(()))
ts=[]
for _ in range(8):
    t0=time.perf_counter(); float(noop(jnp.zeros(()))); ts.append(time.perf_counter()-t0)
RTT = statistics.median(ts)
N = 32
sm = hd ** -0.5
def chain(bq, bk, grad):
    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            o, lse = A._flash_fwd(qc, k, v, True, sm, bq, bk)
            if grad:
                g = jnp.ones_like(o)
                dq, dk, dv = A._flash_bwd(qc, k, v, o, lse, g, True, sm, bq, bk)
                return qc + 1e-6 * dq.astype(qc.dtype), ()
            return o.astype(qc.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out
    return run
for grad in (False, True):
    for bq, bk in [(128,128),(256,256),(512,512),(256,512),(512,256)]:
        if S % bq or S % bk: continue
        try:
            fn = chain(bq, bk, grad); fn(q, k, v)
            ts=[]
            for _ in range(5):
                t0=time.perf_counter(); float(jnp.sum(fn(q,k,v)).astype(jnp.float32)); ts.append(time.perf_counter()-t0)
            med=statistics.median(ts)
            tag = "fwd+bwd" if grad else "fwd    "
            print(f"{tag} bq={bq} bk={bk}: {(med-RTT)*1e6/N:.0f} us/iter", flush=True)
        except Exception as e:
            print(f"bq={bq} bk={bk}: FAIL {str(e)[:80]}", flush=True)
