"""Parameter partitioning rules: path-pattern -> PartitionSpec.

Tensor-parallel layout for the MLLM (models/llm.py, models/vit.py): head
and FFN dimensions shard on the mesh "model" axis; embeddings shard the
vocab; norms and small tensors replicate. XLA inserts the all-reduces
(wo/down/proj row-parallel matmuls) automatically from these specs.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS

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
    # MoE FFN (models/moe.py): expert tables shard on "expert" and the
    # FFN dim on "model" — EP composes with Megatron TP like the dense
    # gate/up/down rules. The router stays replicated (tiny).
    (("moe", "wi_gate"), {3: P(EXPERT_AXIS, None, MODEL_AXIS)}),
    (("moe", "wi_up"), {3: P(EXPERT_AXIS, None, MODEL_AXIS)}),
    (("moe", "wo"), {3: P(EXPERT_AXIS, MODEL_AXIS, None)}),
]


def spec_for_path(path: tuple[str, ...], ndim: int) -> P:
    joined = tuple(str(p) for p in path)
    for patterns, by_ndim in _RULES:
        if all(any(pat == seg for seg in joined) for pat in patterns):
            if ndim in by_ndim:
                return by_ndim[ndim]
    return P()  # replicate


def _add_fsdp(spec: P, shape: tuple[int, ...], mesh: Mesh,
              min_size: int) -> P:
    """Fully-sharded layout: additionally shard the largest free dimension
    of big parameters over the mesh "data" axis (ZeRO-3 style — XLA
    inserts the all-gathers before use and reduce-scatters on gradients).
    """
    import numpy as np

    if int(np.prod(shape)) < min_size:
        return spec
    n_data = mesh.shape[DATA_AXIS]
    entries = list(spec) + [None] * (len(shape) - len(spec))
    # pick the largest dim not already sharded and divisible by n_data
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if entries[i] is None and shape[i] % n_data == 0:
            entries[i] = DATA_AXIS
            return P(*entries)
    return spec


def params_shardings(params, mesh: Mesh, fsdp: bool = False,
                     fsdp_min_size: int = 2 ** 16):
    """Pytree of NamedShardings matching the params pytree.

    `fsdp=True` additionally shards every large parameter over the "data"
    axis (combinable with the tensor-parallel "model" axis specs).
    """

    def assign(path, leaf):
        keys = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        spec = spec_for_path(keys, leaf.ndim)
        # drop axes the mesh doesn't carry (e.g. MoE "expert" specs on a
        # plain (data, model) mesh — the expert tables just replicate)
        spec = P(*(a if a in mesh.axis_names else None for a in spec))
        if fsdp:
            spec = _add_fsdp(spec, leaf.shape, mesh, fsdp_min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh, fsdp: bool = False):
    """Device-put params according to the rules."""
    return jax.tree_util.tree_map(
        jax.device_put, params, params_shardings(params, mesh, fsdp=fsdp))
