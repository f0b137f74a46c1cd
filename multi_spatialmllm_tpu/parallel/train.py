"""pjit training step for the multi-frame MLLM.

TPU-native replacement for the reference's delegated DeepSpeed training
(README.md:194-200): one jit-compiled step over a (data, model) mesh —
batch sharded on "data", parameters per parallel/sharding.py, AdamW.
Full finetune is the default; the reference's main-paper LoRA mode
(README.md:199) lives in parallel/lora.py (adapter-only grads/optimizer
state, zero-init identity, mergeable export).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llm import cross_entropy_loss
from ..models.mllm import MLLMConfig, MultiFrameMLLM
from .mesh import DATA_AXIS, EXPERT_AXIS, SEQ_AXIS
from .sharding import params_shardings


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: float = 1.0
    warmup_steps: int = 100
    total_steps: int = 10_000
    fsdp: bool = False  # also shard large params over the data axis



def _seq_unshard(mesh: Mesh):
    """Constraint applied to logits before the loss when the mesh has a
    "seq" axis: XLA's SPMD partitioner CHECK-crashes (CreateConstant,
    spmd_partitioner_util.h:117) on the cross-entropy gather's backward
    scatter when the sliced logits stay sequence-sharded; replicating
    them over "seq" first sidesteps it (the loss tensor is small next to
    attention)."""
    if SEQ_AXIS in mesh.axis_names and mesh.shape[SEQ_AXIS] > 1:
        sh = NamedSharding(mesh, P(DATA_AXIS))
        return lambda logits: jax.lax.with_sharding_constraint(logits, sh)
    return lambda logits: logits

def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, cfg.warmup_steps,
        max(cfg.total_steps, cfg.warmup_steps + 1))
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, b1=cfg.b1, b2=cfg.b2,
                    weight_decay=cfg.weight_decay),
    )


def init_train_state(model_cfg: MLLMConfig, train_cfg: TrainConfig,
                     example_batch, mesh: Mesh, seed: int = 0):
    """Initialize (model, params, opt_state) with parameters laid out on
    the mesh."""
    model = MultiFrameMLLM(model_cfg)
    # jit the init: unjitted flax init dispatches op-by-op (minutes for a
    # ~1B model through the dev tunnel's 30-50 ms RTT); one compiled
    # program materializes the tree on device directly
    params = jax.jit(model.init)(jax.random.key(seed),
                                 example_batch["input_ids"],
                                 example_batch["tiles"])
    p_shard = params_shardings(params, mesh, fsdp=train_cfg.fsdp)
    params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
    tx = make_optimizer(train_cfg)
    opt_state = tx.init(params)
    return model, params, opt_state, tx


def _moe_aux_mean(mutables) -> jax.Array:
    """Mean of every sow'n ("intermediates", "moe_aux_loss") scalar —
    one per MoE layer (models/moe.py), so the coefficient is
    depth-independent."""
    leaves = [x for x in jax.tree_util.tree_leaves(mutables)]
    return sum(leaves) / max(len(leaves), 1)


def make_train_step(model: MultiFrameMLLM,
                    tx: optax.GradientTransformation,
                    mesh: Mesh, accum_steps: int = 1,
                    moe_aux_weight: float = 0.01) -> Callable:
    """jit-compiled (params, opt_state, batch) -> (params, opt_state,
    metrics); batch arrays must lead with the global batch dim.

    `accum_steps > 1` splits the batch into that many microbatches and
    accumulates gradients over a `lax.scan` before the single optimizer
    update — the classic trick for effective batches whose activations
    exceed HBM. The accumulation sums UNNORMALIZED token nll and grads
    and divides by the GLOBAL token count once, so the result equals the
    single-pass step up to float reassociation even when microbatches
    carry different numbers of unmasked tokens (a mean of microbatch
    means would NOT).
    """

    unshard = _seq_unshard(mesh)
    # MoE decoders (models/moe.py) sow a per-layer load-balance loss;
    # collect it via a mutable apply only when the config enables MoE so
    # the dense path's programs are unchanged.
    use_moe = getattr(model.cfg.llm, "moe_experts", 0) > 0
    # The ragged impl routes via a GLOBAL stable sort + ragged_dot, which
    # cannot use the expert mesh axis (parallel/sharding.py still maps
    # moe/wi_* onto EXPERT_AXIS, so an EP mesh would at best allgather
    # every expert table per layer, at worst fail GSPMD partitioning).
    # Fail loudly instead of silently compiling the wrong program.
    if (use_moe
            and getattr(model.cfg.llm, "moe_impl", "einsum") == "ragged"
            and mesh.shape.get(EXPERT_AXIS, 1) > 1):
        raise ValueError(
            "moe_impl='ragged' is single-chip/data-parallel only: its "
            "global sort + ragged_dot dispatch cannot shard over the "
            f"'{EXPERT_AXIS}' mesh axis (size "
            f"{mesh.shape[EXPERT_AXIS]}). Use moe_impl='einsum' for "
            "expert-parallel meshes, or drop --expert-parallel.")

    def loss_of(params, batch):
        if use_moe:
            logits, mut = model.apply(
                params, batch["input_ids"], batch["tiles"],
                positions=batch.get("positions"),
                segment_ids=batch.get("segment_ids"),
                mutable=["intermediates"])
            logits = unshard(logits)
            return (cross_entropy_loss(logits[:, :-1],
                                       batch["labels"][:, 1:])
                    + moe_aux_weight * _moe_aux_mean(mut))
        logits = unshard(model.apply(
            params, batch["input_ids"], batch["tiles"],
            positions=batch.get("positions"),
            segment_ids=batch.get("segment_ids")))
        return cross_entropy_loss(logits[:, :-1], batch["labels"][:, 1:])

    def loss_sum_of(params, batch):
        from ..models.llm import cross_entropy_sum

        out = model.apply(
            params, batch["input_ids"], batch["tiles"],
            positions=batch.get("positions"),
            segment_ids=batch.get("segment_ids"),
            **({"mutable": ["intermediates"]} if use_moe else {}))
        logits, mut = out if use_moe else (out, None)
        logits = unshard(logits)
        nll, count = cross_entropy_sum(logits[:, :-1],
                                       batch["labels"][:, 1:])
        if use_moe:
            # token-weighted aux: summed as w*aux*count_mb, so after the
            # single global /denom the aux term is w * the token-weighted
            # mean over microbatches (exact when counts are equal)
            nll = nll + (moe_aux_weight * _moe_aux_mean(mut)
                         * count.astype(nll.dtype))
        return nll, count

    def step(params, opt_state, batch):
        from ..ops.ring_attention import ring_context

        with ring_context(mesh):  # trace-time: routes decoder attention
            return _step_inner(params, opt_state, batch)

    def _step_inner(params, opt_state, batch):
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_of)(params, batch)
        else:
            mb_sharding = NamedSharding(mesh, P(None, DATA_AXIS))

            def split(x):
                assert x.shape[0] % accum_steps == 0, \
                    (x.shape, accum_steps)
                mb = x.reshape(accum_steps, x.shape[0] // accum_steps,
                               *x.shape[1:])
                return jax.lax.with_sharding_constraint(mb, mb_sharding)

            mbs = jax.tree_util.tree_map(split, batch)
            gfn = jax.value_and_grad(loss_sum_of, has_aux=True)

            def body(carry, mb):
                gsum, nll, count = carry
                (mb_nll, mb_count), g = gfn(params, mb)
                gsum = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(a.dtype), gsum, g)
                return (gsum, nll + mb_nll.astype(nll.dtype),
                        count + mb_count.astype(count.dtype)), ()

            zeros = jax.tree_util.tree_map(
                lambda p: jax.numpy.zeros(p.shape, jax.numpy.float32),
                params)
            (gsum, nll, count), _ = jax.lax.scan(
                body, (zeros, jax.numpy.zeros((), jax.numpy.float32),
                       jax.numpy.zeros((), jax.numpy.int32)), mbs)
            denom = jax.numpy.maximum(count, 1).astype(jax.numpy.float32)
            grads = jax.tree_util.tree_map(
                lambda g, p: (g / denom).astype(p.dtype), gsum, params)
            loss = nll / denom
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    metric_sharding = NamedSharding(mesh, P())

    return jax.jit(
        step,
        # prefix pytree: every batch leaf (incl. packed-batch extras like
        # positions/segment_ids) leads with the global batch dim
        in_shardings=(None, None, batch_sharding),
        out_shardings=(None, None,
                       {"loss": metric_sharding,
                        "grad_norm": metric_sharding}),
        donate_argnums=(0, 1),
    )


def make_chained_train_step(model: MultiFrameMLLM,
                            tx: optax.GradientTransformation,
                            mesh: Mesh, n_steps: int) -> Callable:
    """`n_steps` full train steps (grads + optimizer + param update)
    chained inside ONE jit via `lax.scan` — the measurement harness for
    per-step timing through the dev tunnel's 30-50 ms dispatch RTT
    (amortized over the chain; see scripts/profiles/_train_drive.py).
    The batch is reused across the chained steps; each step's work is
    exactly `make_train_step`'s. Returns (params, opt_state, losses[n])."""

    unshard = _seq_unshard(mesh)

    def loss_of(params, batch):
        logits = unshard(model.apply(
            params, batch["input_ids"], batch["tiles"],
            positions=batch.get("positions"),
            segment_ids=batch.get("segment_ids")))
        return cross_entropy_loss(logits[:, :-1], batch["labels"][:, 1:])

    def run(params, opt_state, batch):
        from ..ops.ring_attention import ring_context

        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_of)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        with ring_context(mesh):
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n_steps)
        return params, opt_state, losses

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        run,
        in_shardings=(None, None, batch_sharding),
        out_shardings=(None, None, NamedSharding(mesh, P())),
        donate_argnums=(0, 1),
    )


def save_checkpoint(path: str, params, opt_state=None, step: int = 0):
    """Orbax checkpoint save (artifact-level resume, SURVEY.md §5.4)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload: dict[str, Any] = {"params": params, "step": step}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def _commit_latest(root: str, step: int, keep: int) -> None:
    """Atomically flip `{root}/LATEST` to step_{N} and prune step dirs
    beyond `keep` (shared by the sync and async rolling savers)."""
    import shutil

    import re

    tmp = os.path.join(root, "LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(f"step_{step:08d}\n")
    os.replace(tmp, os.path.join(root, "LATEST"))
    # prune only COMPLETED step dirs: a crashed async save leaves
    # step_NNNNNNNN.orbax-checkpoint-tmp-* behind, and a startswith()
    # match would let such an unusable dir consume a `keep` slot (at
    # keep=1 the only surviving entry could be the tmp dir)
    steps = sorted(d for d in os.listdir(root)
                   if re.fullmatch(r"step_\d{8}", d))
    for stale in steps[:-keep] if keep else []:
        shutil.rmtree(os.path.join(root, stale), ignore_errors=True)


def save_checkpoint_rolling(root: str, params, opt_state=None,
                            step: int = 0, keep: int = 2) -> str:
    """Crash-safe rolling saves: each checkpoint lands in its own
    `{root}/step_{N}` directory, `{root}/LATEST` flips to it only after
    the save completes, and older step dirs beyond `keep` are pruned —
    an interrupted save can never destroy the previous good checkpoint
    (unlike an in-place overwrite). Returns the step dir."""
    os.makedirs(root, exist_ok=True)
    out = os.path.join(os.path.abspath(root), f"step_{step:08d}")
    save_checkpoint(out, params, opt_state, step=step)
    _commit_latest(root, step, keep)
    return out


class AsyncRollingSaver:
    """Asynchronous crash-safe rolling saves (train CLI --async-save).

    `save()` blocks only for orbax's device->host snapshot (the async
    contract: data is copied to host before save() returns, so later
    donated train steps cannot clobber it), then serialization + IO run
    on background threads while training continues. LATEST commits
    DEFERRED — a step's pointer flips only once its write has finished
    (on the next save() or wait()) — so an interrupted run can never
    point LATEST at a half-written directory: the same crash-safety
    contract as :func:`save_checkpoint_rolling`, at one checkpoint of
    pointer latency."""

    def __init__(self, root: str, keep: int = 2):
        import orbax.checkpoint as ocp

        self.root = os.path.abspath(root)
        self.keep = keep
        # StandardCheckpointer IS an AsyncCheckpointer; the sync helpers
        # above only block because they call wait_until_finished()
        self._ckptr = ocp.StandardCheckpointer()
        self._pending: int | None = None
        os.makedirs(self.root, exist_ok=True)
        # clear half-written leftovers from a crashed earlier async run
        # (never pointed to by LATEST, but they waste disk and would
        # shadow a same-step re-save)
        import shutil

        for d in os.listdir(self.root):
            if ".orbax-checkpoint-tmp-" in d:
                shutil.rmtree(os.path.join(self.root, d),
                              ignore_errors=True)

    def _commit(self) -> None:
        if self._pending is None:
            return
        self._ckptr.wait_until_finished()  # usually a no-op by now
        step, self._pending = self._pending, None
        _commit_latest(self.root, step, self.keep)

    def save(self, params, opt_state=None, step: int = 0) -> str:
        self._commit()  # finalize the previous save first
        out = os.path.join(self.root, f"step_{step:08d}")
        payload: dict[str, Any] = {"params": params, "step": step}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        self._ckptr.save(out, payload, force=True)
        self._pending = step
        return out

    def wait(self) -> None:
        """Block until every pending save is durable and committed."""
        self._commit()


def resolve_checkpoint(path: str) -> str:
    """Accept either a plain orbax directory or a rolling-save root
    (resolves `{path}/LATEST` to its step dir)."""
    latest = os.path.join(path, "LATEST")
    if os.path.exists(latest):
        with open(latest) as f:
            return os.path.join(path, f.read().strip())
    return path


def restore_checkpoint(path: str, like=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(resolve_checkpoint(path), like)
