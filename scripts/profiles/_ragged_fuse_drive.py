"""Does fusing gate+up into ONE ragged_dot recover MoE step time?

_moe_breakdown_drive.py attributed ~55 ms/step to ragged_dot running at
87 TFLOP/s vs the same-FLOPs dense yardstick's 142. The gate and up
projections share xs and group_sizes: concatenating wi_gate|wi_up into
[E, D, 2F] halves the xs HBM reads and the per-group setup passes.
This measures 2x ragged_dot vs 1x fused ragged_dot (+split) fwd+grad
at the exact bench shapes.

Run on the TPU backend: python scripts/profiles/_ragged_fuse_drive.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu  # noqa: E402

multi_spatialmllm_tpu.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from flax import linen as nn  # noqa: E402

B, S, D, F, E, K = 4, 2048, 2048, 2048, 4, 2
N, NK, CHAIN = B * S, B * S * K, 20
dt = jnp.bfloat16

rng = np.random.default_rng(0)
xf = jnp.asarray(rng.standard_normal((N, D)), dt)
wg = jnp.asarray(rng.standard_normal((E, D, F)) * 0.02, dt)
wu = jnp.asarray(rng.standard_normal((E, D, F)) * 0.02, dt)
wo = jnp.asarray(rng.standard_normal((E, F, D)) * 0.02, dt)
wgu = jnp.concatenate([wg, wu], axis=2)  # [E, D, 2F]

logits0 = np.asarray(rng.standard_normal((N, E)))
idx0 = jnp.asarray(np.argsort(-logits0, axis=1)[:, :K].reshape(NK))
sizes0 = jnp.bincount(idx0, length=E).astype(jnp.int32)


def timed(name, fn):
    def chained(x0):
        def body(x, _):
            return fn(x), 0.0
        xn, _ = jax.lax.scan(body, x0, None, length=CHAIN)
        return jnp.sum(xn.astype(jnp.float32))
    f = jax.jit(chained)
    float(f(xf))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(xf))
        best = min(best, time.perf_counter() - t0)
    ms = best / CHAIN * 1e3
    print(f"{name:28s} {ms:7.3f} ms/call", flush=True)
    return ms


def split_fn(x):
    xs = jnp.concatenate([x, x]).astype(dt)
    hg = jax.lax.ragged_dot(xs, wg, sizes0)
    hu = jax.lax.ragged_dot(xs, wu, sizes0)
    ys = jax.lax.ragged_dot(nn.silu(hg) * hu, wo, sizes0)
    return (ys[:N] + ys[N:]).astype(dt)


def fused_fn(x):
    xs = jnp.concatenate([x, x]).astype(dt)
    hgu = jax.lax.ragged_dot(xs, wgu, sizes0)        # [NK, 2F]
    h = nn.silu(hgu[:, :F]) * hgu[:, F:]
    ys = jax.lax.ragged_dot(h, wo, sizes0)
    return (ys[:N] + ys[N:]).astype(dt)


def grad_of(fn):
    g = jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32)))
    return lambda x: g(x).astype(dt)


print(f"shapes: NK={NK} D={D} F={F} E={E}, chain={CHAIN}", flush=True)
a = timed("split (2x ragged) fwd", split_fn)
b = timed("fused (1x ragged 2F) fwd", fused_fn)
ga = timed("split grad", grad_of(split_fn))
gb = timed("fused grad", grad_of(fused_fn))
print(f"\nfwd speedup {a / b:.3f}x, grad speedup {ga / gb:.3f}x; "
      f"per-step (8 layers, 2f+g): "
      f"split {8 * (2 * a + ga):.1f} ms, fused {8 * (2 * b + gb):.1f} ms",
      flush=True)
