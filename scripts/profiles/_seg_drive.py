import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, time, statistics
from multi_spatialmllm_tpu.ops import attention as A
print("backend:", jax.default_backend(), flush=True)

B, H, KVH, S, D = 2, 16, 4, 4096, 128
q = jax.random.normal(jax.random.key(0), (B, H, S, D), dtype=jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (B, KVH, S, D), dtype=jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (B, KVH, S, D), dtype=jnp.bfloat16)
# 16 packed segments of 256 tokens
seg = jnp.asarray(np.repeat(np.arange(1, 17), S // 16)[None].repeat(B, 0).astype(np.int32))

o_seg = jax.jit(lambda q,k,v: A.trainable_flash_attention_packed(q, k, v, seg, True))(q, k, v)
o_ref = jax.jit(lambda q,k,v: A.reference_attention(q, k, v, causal=True, segment_ids=seg))(q, k, v)
print("fwd max diff vs xla:", float(jnp.abs(o_seg.astype(jnp.float32)-o_ref.astype(jnp.float32)).max()), flush=True)

def g(loss): return jax.jit(jax.grad(loss, argnums=(0,1,2)))
gl_seg = g(lambda q,k,v: jnp.sum(A.trainable_flash_attention_packed(q,k,v,seg,True).astype(jnp.float32)))
gl_ref = g(lambda q,k,v: jnp.sum(A.reference_attention(q,k,v,causal=True,segment_ids=seg).astype(jnp.float32)))
for name, a, b in zip(("dq","dk","dv"), gl_seg(q,k,v), gl_ref(q,k,v)):
    print(f"{name} max diff:", float(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)).max()),
          f"(scale {float(jnp.abs(b.astype(jnp.float32)).max()):.1f})", flush=True)

N = 16
def chain(fn):
    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            return fn(qc, k, v).astype(qc.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out
    return run
def chain_grad(loss):
    gg = jax.grad(loss, argnums=(0,1,2))
    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            dq, dk, dv = gg(qc, k, v)
            return qc + 1e-6*dq.astype(qc.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out
    return run
def timed(name, run, n=6):
    run(q, k, v)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(jnp.sum(run(q, k, v)).astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{name}: {med*1e3:.1f} ms total, {(med*1e3)/N:.3f} ms/iter", flush=True)

timed("fwd  packed-kernel x16", chain(lambda q_,k_,v_: A.trainable_flash_attention_packed(q_,k_,v_,seg,True)))
timed("fwd  causal-kernel x16", chain(lambda q_,k_,v_: A.trainable_flash_attention(q_,k_,v_,True)))
timed("fwd  xla-seg       x16", chain(lambda q_,k_,v_: A.reference_attention(q_,k_,v_,causal=True,segment_ids=seg)))
timed("grad packed-kernel x16", chain_grad(lambda q_,k_,v_: jnp.sum(A.trainable_flash_attention_packed(q_,k_,v_,seg,True).astype(jnp.float32))))
timed("grad causal-kernel x16", chain_grad(lambda q_,k_,v_: jnp.sum(A.trainable_flash_attention(q_,k_,v_,True).astype(jnp.float32))))
timed("grad xla-seg       x16", chain_grad(lambda q_,k_,v_: jnp.sum(A.reference_attention(q_,k_,v_,causal=True,segment_ids=seg).astype(jnp.float32))))
