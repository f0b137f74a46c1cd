"""Parameter partitioning rules: path-pattern -> PartitionSpec.

Tensor-parallel layout for the MLLM (models/llm.py, models/vit.py): head
and FFN dimensions shard on the mesh "model" axis; embeddings shard the
vocab; norms and small tensors replicate. XLA inserts the all-reduces
(wo/down/proj row-parallel matmuls) automatically from these specs.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (substring patterns of the flattened param path, spec-builder by ndim)
_RULES: list[tuple[tuple[str, ...], dict[int, P]]] = [
    # LLM attention: wq/wk/wv kernels [hidden, heads, head_dim]
    (("wq", "kernel"), {3: P(None, MODEL_AXIS, None)}),
    (("wk", "kernel"), {3: P(None, MODEL_AXIS, None)}),
    (("wv", "kernel"), {3: P(None, MODEL_AXIS, None)}),
    # wo kernel [heads, head_dim, hidden] — row parallel
    (("wo", "kernel"), {3: P(MODEL_AXIS, None, None)}),
    # SwiGLU
    (("gate", "kernel"), {2: P(None, MODEL_AXIS)}),
    (("up", "kernel"), {2: P(None, MODEL_AXIS)}),
    (("down", "kernel"), {2: P(MODEL_AXIS, None)}),
    # Embedding / head: shard vocab
    (("embed", "embedding"), {2: P(MODEL_AXIS, None)}),
    (("lm_head", "kernel"), {2: P(None, MODEL_AXIS)}),
    # ViT attention qkv [hidden, 3, heads, head_dim] and proj
    (("qkv", "kernel"), {4: P(None, None, MODEL_AXIS, None)}),
    (("proj", "kernel"), {3: P(MODEL_AXIS, None, None)}),
    # ViT MLP
    (("fc1", "kernel"), {2: P(None, MODEL_AXIS)}),
    (("fc2", "kernel"), {2: P(MODEL_AXIS, None)}),
]


def spec_for_path(path: tuple[str, ...], ndim: int) -> P:
    joined = tuple(str(p) for p in path)
    for patterns, by_ndim in _RULES:
        if all(any(pat == seg for seg in joined) for pat in patterns):
            if ndim in by_ndim:
                return by_ndim[ndim]
    return P()  # replicate


def params_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching the params pytree."""

    def assign(path, leaf):
        keys = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        return NamedSharding(mesh, spec_for_path(keys, leaf.ndim))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh):
    """Device-put params according to the rules."""
    return jax.tree_util.tree_map(
        jax.device_put, params, params_shardings(params, mesh))
