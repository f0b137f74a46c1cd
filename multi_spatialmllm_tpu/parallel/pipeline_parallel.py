"""Pipeline parallelism: GPipe-style microbatched layer execution.

The reference has no pipeline parallelism (SURVEY.md §2.5: "optional for
InternVL-scale LLM; not required for parity"); this provides the optional
"pipe" mesh axis for decoder stacks that exceed one chip's HBM.

Design: the layer stack is split into `P` contiguous stages; stage
parameters live sharded on the "pipe" axis (leading stage dimension).
Inside `shard_map`, every device runs the classic GPipe schedule: at tick
`t` it processes one microbatch (or a bubble), then `ppermute`s the
activations to the next stage over ICI. After `M + P - 1` ticks the last
stage holds every microbatch's output; a `psum` broadcast returns them
replicated. Forward-only (inference / activation serving); the training
step uses data/tensor/FSDP sharding (parallel/train.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

PIPE_AXIS = "pipe"


def make_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices[:n_stages]), (PIPE_AXIS,))


def stack_stage_params(per_layer_params: list, n_stages: int):
    """[L x layer pytree] -> pytree with leading [n_stages, layers_per_stage]
    dims, ready to shard on the pipe axis."""
    n_layers = len(per_layer_params)
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    per_stage = n_layers // n_stages
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves).reshape(
            (n_stages, per_stage) + leaves[0].shape),
        *per_layer_params)
    return stacked


def pipeline_forward(
    stage_params,
    x: jax.Array,
    mesh: Mesh,
    apply_layer: Callable,
) -> jax.Array:
    """Run microbatches through the pipelined layer stack.

    Args:
      stage_params: pytree with leading dims `[P, layers_per_stage, ...]`
        (from :func:`stack_stage_params`), sharded or shardable on "pipe".
      x: `[M, mb, ...]` microbatched activations (replicated).
      mesh: 1-D mesh over the "pipe" axis.
      apply_layer: `(layer_params, activation) -> activation` for ONE layer
        (layer_params leaves have the per-layer shape).

    Returns `[M, mb, ...]` outputs, replicated.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    n_micro = x.shape[0]
    ticks = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    param_specs = jax.tree_util.tree_map(
        lambda _: P(PIPE_AXIS), stage_params)

    def local(params_stage, x_all):
        # params_stage leaves: [1, layers_per_stage, ...]; x_all: [M, mb, ...]
        stage = jax.lax.axis_index(PIPE_AXIS)
        params_stage = jax.tree_util.tree_map(
            lambda l: l[0], params_stage)  # [layers_per_stage, ...]

        def run_stage(act):
            def body(carry, layer_params):
                return apply_layer(layer_params, carry), None

            out, _ = jax.lax.scan(body, act, params_stage)
            return out

        buf = jnp.zeros_like(x_all[0])
        outputs = jnp.zeros_like(x_all)

        def tick(t, carry):
            buf, outputs = carry
            # stage 0 ingests microbatch t (bubble-safe clipping)
            feed_idx = jnp.clip(t, 0, n_micro - 1)
            inp = jnp.where(stage == 0, x_all[feed_idx], buf)
            out = run_stage(inp)
            # last stage emits microbatch t - (P - 1)
            emit_idx = t - (n_stages - 1)
            do_emit = (stage == n_stages - 1) & (emit_idx >= 0)
            safe_idx = jnp.clip(emit_idx, 0, n_micro - 1)
            outputs = jnp.where(
                do_emit,
                outputs.at[safe_idx].set(out),
                outputs)
            buf = jax.lax.ppermute(out, PIPE_AXIS, perm)
            return buf, outputs

        _, outputs = jax.lax.fori_loop(0, ticks, tick, (buf, outputs))
        # broadcast the last stage's outputs to every device
        is_last = (stage == n_stages - 1).astype(outputs.dtype)
        return jax.lax.psum(outputs * is_last, PIPE_AXIS)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(param_specs, P()), out_specs=P(), check_vma=False)
    return fn(stage_params, x)
