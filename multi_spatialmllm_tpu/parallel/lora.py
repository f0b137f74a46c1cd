"""LoRA adapters for the pjit training path.

The reference's main-paper training is LoRA over InternVL-2
(/root/reference/README.md:199: "we use LoRA training for research
efficiency"); its stack delegates that to DeepSpeed+peft. This is the
TPU-native equivalent: low-rank (A @ B) deltas over selected kernels,
merged into the (frozen) base parameters INSIDE the jit step, with the
optimizer state kept only for the adapters — the AdamW moments of an 8B
base (~64 GB f32) shrink to the adapter size (MBs), which is what makes
single-host finetuning of the flagship fit.

Design notes:
* Adapters live in a pruned pytree mirroring the params tree (only the
  matched kernels appear), so optax transforms apply unchanged.
* `B` starts at zero: the merged model equals the base exactly at init
  (test-asserted), the standard LoRA guarantee.
* Kernels are DenseGeneral weights with shaped in/out dims; each target
  declares how many leading dims are fan-in (e.g. wq `[hidden, H, hd]`
  has 1, wo `[H, hd, hidden]` has 2), and A/B are shaped
  `[fan_in, r]` / `[r, fan_out]` against that flattening.
* The merge is computed in f32 and cast back to the kernel dtype; under
  jit the delta add fuses into the step (the base stays untouched).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llm import cross_entropy_loss
from ..models.mllm import MultiFrameMLLM
from .mesh import DATA_AXIS

# target name -> number of leading kernel dims that are fan-in
_FAN_IN_DIMS = {
    "wq": 1, "wk": 1, "wv": 1, "wo": 2,          # LLM attention
    "gate": 1, "up": 1, "down": 1,               # LLM SwiGLU
    "qkv": 1, "proj": 2, "fc1": 1, "fc2": 1,     # ViT
    "lm_head": 1,
}


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16
    alpha: float = 32.0
    # module names whose `kernel` gets an adapter (keys of _FAN_IN_DIMS);
    # the reference-style default adapts the LLM attention projections
    targets: tuple[str, ...] = ("wq", "wk", "wv", "wo")

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def _path_keys(path) -> tuple[str, ...]:
    return tuple(getattr(k, "key", getattr(k, "name", str(k)))
                 for k in path)


def _target_of(path, cfg: LoRAConfig) -> str | None:
    keys = _path_keys(path)
    if not keys or keys[-1] != "kernel":
        return None
    if "moe" in keys:
        # routed-MoE expert tables (models/moe.py) are self.param leaves
        # (no trailing "kernel"), so they can't match today — this guard
        # keeps a future Dense-based expert from silently matching the
        # attention "wo" target with expert-count fan-in semantics
        return None
    for t in cfg.targets:
        if t in keys:
            return t
    return None


def _fan_dims(kernel_shape, target: str) -> tuple[int, int]:
    n_in = _FAN_IN_DIMS[target]
    fan_in = int(np.prod(kernel_shape[:n_in]))
    fan_out = int(np.prod(kernel_shape[n_in:]))
    return fan_in, fan_out


def init_lora(params, cfg: LoRAConfig, key) -> dict:
    """Pruned pytree of `{"a": [fan_in, r], "b": [r, fan_out]}` leaves
    (f32) for every kernel matched by `cfg.targets`. Empty-dict subtrees
    are dropped."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: dict = {}
    for path, leaf in flat:
        target = _target_of(path, cfg)
        if target is None:
            continue
        fan_in, fan_out = _fan_dims(leaf.shape, target)
        key, sub = jax.random.split(key)
        a = jax.random.normal(sub, (fan_in, cfg.rank),
                              dtype=jnp.float32) / np.sqrt(fan_in)
        b = jnp.zeros((cfg.rank, fan_out), dtype=jnp.float32)
        node = out
        keys = _path_keys(path)
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = {"a": a, "b": b}
    return out


def merge_lora(params, lora: dict, cfg: LoRAConfig):
    """Base params + scale * (A @ B) on every adapted kernel; everything
    else is passed through untouched. Returns a full params pytree in
    the base dtypes — also the export path for a merged checkpoint."""

    def walk(p_node, l_node):
        if isinstance(l_node, dict) and "a" in l_node and "b" in l_node \
                and not isinstance(p_node, dict):
            delta = (l_node["a"] @ l_node["b"]) * cfg.scale
            return (p_node.astype(jnp.float32)
                    + delta.reshape(p_node.shape)).astype(p_node.dtype)
        if isinstance(p_node, dict):
            return {k: walk(v, l_node.get(k)) if isinstance(l_node, dict)
                    else v
                    for k, v in p_node.items()}
        return p_node

    # flax params are FrozenDict-or-dict; normalize to plain dicts
    import flax

    p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") \
        else params
    return walk(p, lora)


def lora_shardings(lora: dict, mesh: Mesh):
    """Adapters replicate (rank-sized tensors are tiny; the merged delta
    inherits the base kernel's layout through sharding propagation)."""
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: rep, lora)


def make_lora_train_step(model: MultiFrameMLLM,
                         tx: optax.GradientTransformation,
                         mesh: Mesh, cfg: LoRAConfig) -> Callable:
    """jit-compiled (lora, opt_state, base_params, batch) -> (lora,
    opt_state, metrics). Gradients and optimizer state cover ONLY the
    adapters; the base is a frozen input (never donated)."""

    def loss_of(lora, base, batch):
        params = merge_lora(base, lora, cfg)
        logits = model.apply(params, batch["input_ids"], batch["tiles"],
                             positions=batch.get("positions"),
                             segment_ids=batch.get("segment_ids"))
        return cross_entropy_loss(logits[:, :-1], batch["labels"][:, 1:])

    def step(lora, opt_state, base, batch):
        loss, grads = jax.value_and_grad(loss_of)(lora, base, batch)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        gnorm = optax.global_norm(grads)
        return lora, opt_state, {"loss": loss, "grad_norm": gnorm}

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    metric_sharding = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(None, None, None, batch_sharding),
        out_shardings=(None, None,
                       {"loss": metric_sharding,
                        "grad_norm": metric_sharding}),
        donate_argnums=(0, 1),
    )


def lora_param_count(lora: dict) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(lora))
