import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, time, statistics, sys
from multi_spatialmllm_tpu.ops import attention as A
shapes = [(2,16,4,4096,128), (1,8,8,16384,128)]
noop = jax.jit(lambda x: x + 1); noop(jnp.zeros(()))
ts=[]
for _ in range(8):
    t0=time.perf_counter(); float(noop(jnp.zeros(()))); ts.append(time.perf_counter()-t0)
RTT = statistics.median(ts)
N = 16
for B,H,KVH,S,hd in shapes:
    keys = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(keys[0], (B,H,S,hd), dtype=jnp.bfloat16)
    k = jax.random.normal(keys[1], (B,KVH,S,hd), dtype=jnp.bfloat16)
    v = jax.random.normal(keys[2], (B,KVH,S,hd), dtype=jnp.bfloat16)
    sm = hd**-0.5
    bq = A._block_for(S, True)
    def chain(fwd):
        @jax.jit
        def run(q, k, v):
            def body(qc, _):
                if fwd == "res":
                    o, lse = A._flash_fwd(qc, k, v, True, sm, bq, bq)
                    g = jnp.ones_like(o)
                    dq, dk, dv = A._flash_bwd(qc, k, v, o, lse, g, True, sm, bq, bq)
                else:
                    xb = A._xl_block(S)
                    o, lse = A._flash_fwd_xl(qc, k, v, True, sm, xb, xb)
                    g = jnp.ones_like(o)
                    dq, dk, dv = A._flash_bwd_xl(qc, k, v, o, lse, g, True, sm, xb, xb)
                return qc + 1e-6 * dq.astype(qc.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=N)
            return out
        return run
    for mode in ("res", "xl"):
        try:
            fn = chain(mode); fn(q, k, v)
            ts=[]
            for _ in range(5):
                t0=time.perf_counter(); float(jnp.sum(fn(q,k,v)).astype(jnp.float32)); ts.append(time.perf_counter()-t0)
            med=statistics.median(ts)
            print(f"B{B}H{H}KVH{KVH}S{S}: {mode:>3} fwd+bwd {(med-RTT)*1e6/N:.0f} us/iter", flush=True)
        except Exception as e:
            print(f"B{B}H{H}KVH{KVH}S{S}: {mode} FAIL {str(e)[:90]}", flush=True)
