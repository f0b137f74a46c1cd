"""Pipeline parallelism: microbatched layer execution + 1F1B training.

The reference has no pipeline parallelism (SURVEY.md §2.5: "optional for
InternVL-scale LLM; not required for parity"); this provides the optional
"pipe" mesh axis for decoder stacks that exceed one chip's HBM.

Design: the layer stack is split into `P` contiguous stages; stage
parameters live sharded on the "pipe" axis (leading stage dimension).
Inside `shard_map`, every device runs a lockstep tick schedule and
`ppermute`s activations to the next stage (and, when training, gradients
to the previous stage) over ICI.

* `pipeline_forward`: GPipe forward for inference — after `M + P - 1`
  ticks the last stage holds every microbatch's output.
* `pipeline_train_grads`: interleaved 1F1B training. Stage `s` forwards
  microbatch `m` at tick `m + s` and backwards it at tick
  `m + 2P - 1 - s`; in steady state every device does one forward and
  one backward per tick (the last stage strictly alternates). Backward
  recomputes the stage forward from the stashed stage *input* via
  `jax.vjp` (rematerialized backward — only inputs are stashed, the
  Megatron memory recipe), accumulates per-stage parameter grads locally
  (they stay pipe-sharded, exactly the layout the optimizer wants), and
  seeds the chain at the last stage with the loss VJP.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import shard_map_compat

PIPE_AXIS = "pipe"
DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_pipe_mesh(n_stages: int, devices=None, n_data: int = 1,
                   n_model: int = 1) -> Mesh:
    """1-D "pipe" mesh, or a combined (data[, model], pipe) mesh: the
    pipeline schedule goes shard_map-manual over data+pipe (microbatch
    rows sharded over "data", grads pmean'd across replicas) while a
    "model" axis, if present, stays AUTO — XLA tensor-partitions the
    stage compute from the stage params' shardings (partial-auto
    shard_map)."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_data * n_model * n_stages
    if n_data == 1 and n_model == 1:
        return Mesh(np.asarray(devices[:n_stages]), (PIPE_AXIS,))
    if n_model == 1:
        arr = np.asarray(devices[:n]).reshape(n_data, n_stages)
        return Mesh(arr, (DATA_AXIS, PIPE_AXIS))
    arr = np.asarray(devices[:n]).reshape(n_data, n_model, n_stages)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))


def _pipe_mesh_config(mesh: Mesh, manual_model: bool = False):
    """(has_data, axis_names-for-shard_map, batch_spec) for a pipe mesh.

    `manual_model`: include the "model" axis in the manual set — used by
    the tensor-parallel stage bodies (explicit Megatron f/g collectives,
    :func:`tp_region_enter` / :func:`tp_region_exit`) because leaving
    "model" AUTO while the schedule is manual over data+pipe crashes
    XLA's SPMD partitioner (ROADMAP gap #5)."""
    has_data = DATA_AXIS in mesh.axis_names and mesh.shape[DATA_AXIS] > 1
    manual = {PIPE_AXIS} | ({DATA_AXIS} if DATA_AXIS in mesh.axis_names
                            else set())
    if manual_model and MODEL_AXIS in mesh.axis_names:
        manual |= {MODEL_AXIS}
    if len(mesh.axis_names) == 1:
        manual = None
    batch_spec = P(None, DATA_AXIS) if has_data else P()
    return has_data, manual, batch_spec


# ---------------------------------------------------------------------------
# Megatron f/g operators for tensor parallelism inside manual shard_map
# ---------------------------------------------------------------------------
# Inside a manual region the compiler cannot be trusted to transpose psum
# the way replicated-activation TP needs (with check_rep/check_vma off,
# psum transposes to psum — double-counting replicated cotangents), so
# both boundaries of the parallel region are explicit custom-VJP ops:
#
#   tp_region_enter ("f"): identity forward; backward psums the per-shard
#     input cotangents (each shard back-propagates only its own head/ffn
#     columns' contribution to the replicated activation).
#   tp_region_exit ("g"): psum forward (each shard holds a partial sum of
#     the row-parallel matmul); backward is identity (the cotangent of
#     the replicated output is already full on every shard).
#
# With f after the (replicated) RMSNorm and g before the residual add,
# every carried activation/cotangent stays replicated over "model", so
# the 1F1B schedule above composes with TP unchanged.

import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_region_enter(x, axis: str):
    return x


def _tp_enter_fwd(x, axis):
    return x, None


def _tp_enter_bwd(axis, _, ct):
    return (jax.lax.psum(ct, axis),)


tp_region_enter.defvjp(_tp_enter_fwd, _tp_enter_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_region_exit(x, axis: str):
    return jax.lax.psum(x, axis)


def _tp_exit_fwd(x, axis):
    return jax.lax.psum(x, axis), None


def _tp_exit_bwd(axis, _, ct):
    return (ct,)


tp_region_exit.defvjp(_tp_exit_fwd, _tp_exit_bwd)


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

    fn = shard_map_compat(
        local, mesh, in_specs=(param_specs, P()), out_specs=P())
    return fn(stage_params, x)


def pipeline_train_grads(
    stage_params,
    x: jax.Array,
    y: jax.Array,
    mesh: Mesh,
    apply_layer: Callable,
    loss_fn: Callable,
):
    """Interleaved 1F1B pipeline training step: loss + parameter grads.

    Args:
      stage_params: pytree, leading dims `[P, layers_per_stage, ...]`.
      x: `[M, mb, ...]` microbatched inputs (replicated).
      y: `[M, ...]` microbatched targets for `loss_fn` (replicated).
      mesh: 1-D mesh over the "pipe" axis.
      apply_layer: `(layer_params, activation) -> activation` for ONE layer.
      loss_fn: `(last_stage_output_mb, y_mb) -> scalar` mean loss for one
        microbatch; the step returns the mean over microbatches.

    Returns `(loss, grads)`: scalar loss (replicated) and grads with the
    same pipe-sharded layout as `stage_params`.

    Schedule (P stages, M microbatches, tick t):
      forward  slot: stage s runs microbatch f = t - s      (GPipe wave)
      backward slot: stage s runs microbatch b = t - (2P - 1 - s)
    The backward wave trails the forward wave by 2(P - s) - 1 ticks, so
    grads of microbatch m leave stage s exactly one tick before stage s-1
    consumes them, and the last stage alternates F(m)/B(m) every tick —
    the 1F1B steady state. Total ticks: M + 2(P - 1) + 1.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    n_micro = x.shape[0]
    ticks = n_micro + 2 * (n_stages - 1) + 1
    perm_fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    perm_bwd = [(i, (i - 1) % n_stages) for i in range(n_stages)]

    param_specs = jax.tree_util.tree_map(
        lambda _: P(PIPE_AXIS), stage_params)

    def local(params_stage, x_all, y_all):
        stage = jax.lax.axis_index(PIPE_AXIS)
        params = jax.tree_util.tree_map(lambda l: l[0], params_stage)
        is_last = stage == n_stages - 1

        def run_stage(p, act):
            def body(carry, layer_params):
                return apply_layer(layer_params, carry), None

            out, _ = jax.lax.scan(body, act, p)
            return out

        # Last-stage backward seed: d(mean_m loss_m)/d(out_m).
        def stage_loss(p, act, tgt):
            return loss_fn(run_stage(p, act), tgt) / n_micro

        stash = jnp.zeros_like(x_all)  # stage inputs per microbatch
        fwd_buf = jnp.zeros_like(x_all[0])
        bwd_buf = jnp.zeros_like(x_all[0])
        grads0 = jax.tree_util.tree_map(
            lambda l: jnp.zeros(l.shape, jnp.float32), params)
        loss0 = jnp.zeros((), jnp.float32)

        def tick(t, carry):
            stash, fwd_buf, bwd_buf, grads, loss_sum = carry

            # ---- forward slot: microbatch f = t - stage ----------------
            f = t - stage
            do_f = (f >= 0) & (f < n_micro)
            f_safe = jnp.clip(f, 0, n_micro - 1)
            x_in = jnp.where(stage == 0, x_all[f_safe], fwd_buf)
            stash = jnp.where(do_f, stash.at[f_safe].set(x_in), stash)
            y_out = run_stage(params, x_in)

            # ---- backward slot: microbatch b = t - (2P - 1 - stage) ----
            b = t - (2 * n_stages - 1 - stage)
            do_b = (b >= 0) & (b < n_micro)
            b_safe = jnp.clip(b, 0, n_micro - 1)
            x_b = stash[b_safe]
            # rematerialize the stage forward and pull grads through it
            _, vjp = jax.vjp(run_stage, params, x_b)
            dp_chain, dx_chain = vjp(bwd_buf)
            loss_b, grad_seed = jax.value_and_grad(
                stage_loss, argnums=(0, 1))(params, x_b, y_all[b_safe])
            dp_seed, dx_seed = grad_seed
            dp = jax.tree_util.tree_map(
                lambda a, c: jnp.where(is_last, a, c), dp_seed, dp_chain)
            dx = jnp.where(is_last, dx_seed, dx_chain)
            grads = jax.tree_util.tree_map(
                lambda g, d: g + jnp.where(do_b, d.astype(jnp.float32), 0.0),
                grads, dp)
            loss_sum = loss_sum + jnp.where(
                do_b & is_last, loss_b.astype(jnp.float32), 0.0)

            # ---- communications ----------------------------------------
            fwd_buf = jax.lax.ppermute(y_out, PIPE_AXIS, perm_fwd)
            dx_masked = jnp.where(do_b, dx, jnp.zeros_like(dx))
            bwd_buf = jax.lax.ppermute(dx_masked, PIPE_AXIS, perm_bwd)
            return stash, fwd_buf, bwd_buf, grads, loss_sum

        carry = (stash, fwd_buf, bwd_buf, grads0, loss0)
        _, _, _, grads, loss_sum = jax.lax.fori_loop(0, ticks, tick, carry)
        # loss lives on the last stage; replicate. Grads stay pipe-sharded.
        loss = jax.lax.psum(loss_sum, PIPE_AXIS)
        grads = jax.tree_util.tree_map(lambda g: g[None], grads)
        return loss, grads

    fn = shard_map_compat(
        local, mesh, in_specs=(param_specs, P(), P()),
        out_specs=(P(), param_specs))
    return fn(stage_params, x, y)


def pipeline_train_grads_full(
    stage_params,
    head_params,
    x: jax.Array,
    y: jax.Array,
    mesh: Mesh,
    apply_layer: Callable,
    head_loss: Callable,
    param_specs=None,
    manual_model: bool = False,
):
    """1F1B training with a trainable head and input gradients.

    Same schedule as :func:`pipeline_train_grads`, extended for composing
    into a larger model (e.g. the full MLLM: vision/embedding preamble ->
    pipelined decoder stack -> norm + lm-head loss):

      * `head_loss(head_params, last_stage_out_mb, y_mb) -> scalar` runs
        at the last stage; its parameter grads are accumulated there and
        replicated out (the head is small: final norm + lm head).
      * d(loss)/d(x) per microbatch is captured at stage 0 and returned
        `[M, mb, ...]`, so the caller can chain into the preamble's VJP.

    `param_specs` (optional): per-leaf PartitionSpecs for `stage_params`
    when stage weights are additionally tensor-sharded over "model"
    (leading dim stays "pipe"); pair with `manual_model=True` and an
    `apply_layer` that runs the Megatron f/g collectives
    (:func:`tp_region_enter` / :func:`tp_region_exit`). Grads come back
    in the same sharded layout.

    Returns `(loss, stage_grads, head_grads, dx_inputs)`.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    n_micro = x.shape[0]
    ticks = n_micro + 2 * (n_stages - 1) + 1
    perm_fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    perm_bwd = [(i, (i - 1) % n_stages) for i in range(n_stages)]

    if param_specs is None:
        param_specs = jax.tree_util.tree_map(
            lambda _: P(PIPE_AXIS), stage_params)
    head_specs = jax.tree_util.tree_map(lambda _: P(), head_params)

    def local(params_stage, head_p, x_all, y_all):
        stage = jax.lax.axis_index(PIPE_AXIS)
        params = jax.tree_util.tree_map(lambda l: l[0], params_stage)
        is_last = stage == n_stages - 1
        is_first = stage == 0

        def run_stage(p, act):
            def body(carry, layer_params):
                return apply_layer(layer_params, carry), None

            out, _ = jax.lax.scan(body, act, p)
            return out

        def stage_loss(p, hp, act, tgt):
            return head_loss(hp, run_stage(p, act), tgt) / n_micro

        stash = jnp.zeros_like(x_all)
        fwd_buf = jnp.zeros_like(x_all[0])
        bwd_buf = jnp.zeros_like(x_all[0])
        grads0 = jax.tree_util.tree_map(
            lambda l: jnp.zeros(l.shape, jnp.float32), params)
        hgrads0 = jax.tree_util.tree_map(
            lambda l: jnp.zeros(l.shape, jnp.float32), head_p)
        dx_store0 = jnp.zeros_like(x_all)
        loss0 = jnp.zeros((), jnp.float32)

        def tick(t, carry):
            stash, fwd_buf, bwd_buf, grads, hgrads, dx_store, loss_sum = \
                carry

            f = t - stage
            do_f = (f >= 0) & (f < n_micro)
            f_safe = jnp.clip(f, 0, n_micro - 1)
            x_in = jnp.where(stage == 0, x_all[f_safe], fwd_buf)
            stash = jnp.where(do_f, stash.at[f_safe].set(x_in), stash)
            y_out = run_stage(params, x_in)

            b = t - (2 * n_stages - 1 - stage)
            do_b = (b >= 0) & (b < n_micro)
            b_safe = jnp.clip(b, 0, n_micro - 1)
            x_b = stash[b_safe]
            _, vjp = jax.vjp(run_stage, params, x_b)
            dp_chain, dx_chain = vjp(bwd_buf)
            loss_b, grad_seed = jax.value_and_grad(
                stage_loss, argnums=(0, 1, 2))(params, head_p, x_b,
                                               y_all[b_safe])
            dp_seed, dhp_seed, dx_seed = grad_seed
            dp = jax.tree_util.tree_map(
                lambda a, c: jnp.where(is_last, a, c), dp_seed, dp_chain)
            dx = jnp.where(is_last, dx_seed, dx_chain)
            grads = jax.tree_util.tree_map(
                lambda g, d: g + jnp.where(do_b, d.astype(jnp.float32), 0.0),
                grads, dp)
            hgrads = jax.tree_util.tree_map(
                lambda g, d: g + jnp.where(do_b & is_last,
                                           d.astype(jnp.float32), 0.0),
                hgrads, dhp_seed)
            # stage 0's dx IS d(loss)/d(input microbatch b)
            dx_store = jnp.where(
                do_b & is_first, dx_store.at[b_safe].set(dx), dx_store)
            loss_sum = loss_sum + jnp.where(
                do_b & is_last, loss_b.astype(jnp.float32), 0.0)

            fwd_buf = jax.lax.ppermute(y_out, PIPE_AXIS, perm_fwd)
            dx_masked = jnp.where(do_b, dx, jnp.zeros_like(dx))
            bwd_buf = jax.lax.ppermute(dx_masked, PIPE_AXIS, perm_bwd)
            return (stash, fwd_buf, bwd_buf, grads, hgrads, dx_store,
                    loss_sum)

        carry = (stash, fwd_buf, bwd_buf, grads0, hgrads0, dx_store0,
                 loss0)
        _, _, _, grads, hgrads, dx_store, loss_sum = jax.lax.fori_loop(
            0, ticks, tick, carry)
        loss = jax.lax.psum(loss_sum, PIPE_AXIS)
        # head grads live on the last stage, dx on the first: psum selects
        hgrads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(
                g * jnp.where(is_last, 1.0, 0.0), PIPE_AXIS), hgrads)
        dx_inputs = jax.lax.psum(
            dx_store * jnp.where(is_first, 1.0, 0.0), PIPE_AXIS)
        if has_data:
            # average the data replicas (each computed the mean loss over
            # its microbatch-row shard)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, DATA_AXIS), grads)
            hgrads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, DATA_AXIS), hgrads)
            # dx stays row-sharded (consumed by the preamble VJP over the
            # global batch), so the replica-average is a plain 1/n scale
            dx_inputs = dx_inputs / mesh.shape[DATA_AXIS]
        grads = jax.tree_util.tree_map(lambda g: g[None], grads)
        return loss, grads, hgrads, dx_inputs

    has_data, manual, batch_spec = _pipe_mesh_config(mesh, manual_model)
    fn = shard_map_compat(
        local, mesh,
        in_specs=(param_specs, head_specs, batch_spec, batch_spec),
        out_specs=(P(), param_specs, head_specs, batch_spec),
        axis_names=manual)
    return fn(stage_params, head_params, x, y)
