"""Where do the ragged-MoE step's missing MFU points go? (r4 VERDICT #8)

Component-isolation timing at the EXACT bench_1chip_moe_config layer
shapes (D=2048, F=2048/expert, E=4, top-2, N=4x2048 tokens, bf16): each
stage of models/moe.ragged_moe runs alone in a chained jit (lax.scan
feeding its output back so nothing is DCE'd; one dispatch per timing —
the tunnel's 30-50 ms RTT never lands inside a measurement), forward
and backward, against the dense same-FLOPs matmul as the efficiency
yardstick. Ablation replaces trace parsing: the components partition
the layer, so their times attribute the step delta directly.

Run on the TPU backend:  python scripts/profiles/_moe_breakdown_drive.py
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

from multi_spatialmllm_tpu.models.moe import _topk_select  # noqa: E402

B, S, D, F, E, K = 4, 2048, 2048, 2048, 4, 2
N = B * S                      # 8192 tokens / layer call
NK = N * K                     # 16384 expert-routed row copies
CHAIN = 20
dt = jnp.bfloat16

rng = np.random.default_rng(0)
xf = jnp.asarray(rng.standard_normal((N, D)), dt)
router_w = jnp.asarray(rng.standard_normal((D, E)) * 0.02, jnp.float32)
wg = jnp.asarray(rng.standard_normal((E, D, F)) * 0.02, dt)
wu = jnp.asarray(rng.standard_normal((E, D, F)) * 0.02, dt)
wo = jnp.asarray(rng.standard_normal((E, F, D)) * 0.02, dt)
wd = jnp.asarray(rng.standard_normal((D, F)) * 0.02, dt)  # dense yardstick

# fixed routing for the isolated sort/matmul stages (balanced-ish load,
# same distribution the einsum impl sees on random data)
logits0 = np.asarray(
    jnp.einsum("nd,de->ne", xf.astype(jnp.float32), router_w))
idx0 = jnp.asarray(np.argsort(-logits0, axis=1)[:, :K].reshape(NK))
order0 = jnp.argsort(idx0, stable=True)
sizes0 = jnp.bincount(idx0, length=E).astype(jnp.int32)


def timed(name, fn, *args):
    """Chained scan in ONE jit; steady-state s/iter via scalar fetch."""
    def chained(x0):
        def body(x, _):
            return fn(x, *args), 0.0
        xn, _ = jax.lax.scan(body, x0, None, length=CHAIN)
        return jnp.sum(xn.astype(jnp.float32))
    f = jax.jit(chained)
    x0 = xf
    float(f(x0))  # compile + warm
    # 3 timed fetches, keep the best (tunnel jitter)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x0))
        best = min(best, time.perf_counter() - t0)
    ms = best / CHAIN * 1e3
    print(f"{name:34s} {ms:7.3f} ms/call", flush=True)
    return ms


def grad_timed(name, fn, *args):
    g = jax.grad(lambda x: jnp.sum(fn(x, *args).astype(jnp.float32)))
    return timed(name, lambda x: g(x).astype(dt))


# -- components ---------------------------------------------------------

def router_fn(x):
    logits = jnp.einsum("nd,de->ne", x.astype(jnp.float32), router_w)
    idx, gates, aux = _topk_select(logits, K, None)
    # fold the outputs back into an x-shaped tensor to chain the scan
    return x + (jnp.sum(gates) + aux + jnp.sum(idx)).astype(dt) * 0


def sortgather_fn(x):
    """dispatch gather + inverse scatter + gate-weighted sum, NO matmuls
    (fixed routing): the pure data-movement cost of dropless dispatch."""
    xs = jnp.take(x, order0 // K, axis=0)               # [NK, D] gather
    inv = jnp.argsort(order0, stable=True)
    yk = jnp.take(xs, inv, axis=0).reshape(N, K, D)
    return jnp.mean(yk, axis=1).astype(dt)


def ragged3_fn(x):
    xs = jnp.concatenate([x, x]).astype(dt)             # [NK, D]
    hg = jax.lax.ragged_dot(xs, wg, sizes0)
    hu = jax.lax.ragged_dot(xs, wu, sizes0)
    ys = jax.lax.ragged_dot(nn.silu(hg) * hu, wo, sizes0)
    return (ys[:N] + ys[N:]).astype(dt)


def dense3_fn(x):
    """Same machine FLOPs as ragged3 (NK rows through DxF), one group."""
    xs = jnp.concatenate([x, x]).astype(dt)
    hg = jnp.dot(xs, wd)
    hu = jnp.dot(xs, wd)
    ys = jnp.dot(nn.silu(hg) * hu, wd.T)
    return (ys[:N] + ys[N:]).astype(dt)


def full_fn(x):
    import types

    cfg = types.SimpleNamespace(dtype="bfloat16", moe_top_k=K,
                                moe_experts=E)
    from multi_spatialmllm_tpu.models.moe import ragged_moe

    y, aux = ragged_moe(cfg, x.reshape(B, S, D), router_w, wg, wu, wo)
    return (y.reshape(N, D) + aux.astype(dt) * 0).astype(dt)


print(f"shapes: N={N} NK={NK} D={D} F={F} E={E} top-{K}, chain={CHAIN}",
      flush=True)
r = {}
r["router+topk fwd"] = timed("router+topk fwd", router_fn)
r["sort+gather+scatter fwd"] = timed("sort+gather+scatter fwd",
                                     sortgather_fn)
r["3x ragged_dot fwd"] = timed("3x ragged_dot fwd", ragged3_fn)
r["3x dense dot fwd (same FLOPs)"] = timed(
    "3x dense dot fwd (same FLOPs)", dense3_fn)
r["full ragged_moe fwd"] = timed("full ragged_moe fwd", full_fn)
r["router+topk grad"] = grad_timed("router+topk grad", router_fn)
r["sort+gather+scatter grad"] = grad_timed("sort+gather+scatter grad",
                                           sortgather_fn)
r["3x ragged_dot grad"] = grad_timed("3x ragged_dot grad", ragged3_fn)
r["3x dense dot grad (same FLOPs)"] = grad_timed(
    "3x dense dot grad (same FLOPs)", dense3_fn)
r["full ragged_moe grad"] = grad_timed("full ragged_moe grad", full_fn)

flops3 = 3 * NK * D * F * 2
print(f"\n3-matmul fwd FLOPs: {flops3/1e9:.0f} GFLOP -> ragged "
      f"{flops3 / r['3x ragged_dot fwd'] / 1e9:.0f} GFLOP/s, dense "
      f"{flops3 / r['3x dense dot fwd (same FLOPs)'] / 1e9:.0f} GFLOP/s",
      flush=True)
print("per-STEP attribution (x8 layers; remat recomputes fwd in bwd, "
      "so bwd-side cost ~= grad + fwd):", flush=True)
for part in ("router+topk", "sort+gather+scatter", "3x ragged_dot"):
    per_step = 8 * (2 * r[f"{part} fwd"] + r[f"{part} grad"])
    print(f"  {part:24s} ~{per_step:6.1f} ms/step", flush=True)
