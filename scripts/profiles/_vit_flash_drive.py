"""TPU drive: ViT attention via padded segment-aware flash kernels vs the
XLA reference at the flagship encoder shape (S=1025 tokens: 1 cls + 32^2
patches; pads to 1152 in their own segment). Chained in-jit timing per
docs/profiles/flash_attention.md."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np, time, statistics, sys
from multi_spatialmllm_tpu.ops import attention as A

print("backend:", jax.default_backend(), flush=True)
B, H, S, hd = 6, 16, 1025, 64          # 6 tiles, InternViT-300M heads
if len(sys.argv) > 1:
    B, H, S, hd = map(int, sys.argv[1:5])
pad = (-S) % 128
SP = S + pad
print(f"B={B} H={H} S={S}->{SP} hd={hd}", flush=True)
keys = jax.random.split(jax.random.key(0), 4)
q = jax.random.normal(keys[0], (B, H, S, hd), dtype=jnp.bfloat16)
k = jax.random.normal(keys[1], (B, H, S, hd), dtype=jnp.bfloat16)
v = jax.random.normal(keys[2], (B, H, S, hd), dtype=jnp.bfloat16)
seg = jnp.concatenate([jnp.zeros((B, S), jnp.int32),
                       jnp.ones((B, pad), jnp.int32)], axis=1)


def flash(q, k, v):
    qp, kp, vp = (jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))
                  for a in (q, k, v))
    return A.trainable_flash_attention_packed(qp, kp, vp, seg,
                                              False)[:, :, :S]


def xla(q, k, v):
    return A.reference_attention(q, k, v, causal=False)


o1 = jax.jit(flash)(q, k, v)
o2 = jax.jit(xla)(q, k, v)
print("fwd max diff:", float(jnp.abs(
    o1.astype(jnp.float32) - o2.astype(jnp.float32)).max()), flush=True)

noop = jax.jit(lambda x: x + 1); noop(jnp.zeros(()))
ts = []
for _ in range(8):
    t0 = time.perf_counter(); float(noop(jnp.zeros(()))); ts.append(time.perf_counter() - t0)
RTT = statistics.median(ts)
print(f"noop rtt: {RTT*1e3:.1f} ms", flush=True)

N = 32


def chain_fwd(attn):
    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            return attn(qc, k, v).astype(qc.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out
    return run


def chain_grad(attn):
    def loss(q, k, v):
        return jnp.sum(attn(q, k, v).astype(jnp.float32))
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
          f"{(med - RTT)*1e6/N:.0f} us/iter (x{N} in-jit)", flush=True)


timed_n(f"fwd  flash x{N}", chain_fwd(flash))
timed_n(f"fwd  xla   x{N}", chain_fwd(xla))
timed_n(f"grad flash x{N}", chain_grad(flash))
timed_n(f"grad xla   x{N}", chain_grad(xla))
