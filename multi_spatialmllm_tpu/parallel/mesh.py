"""Device-mesh construction for the (data, model) pjit layout.

The reference has no distributed runtime (multiprocessing only, SURVEY.md
§2.5); this is the TPU-native equivalent: one `jax.sharding.Mesh` whose
"data" axis carries batch parallelism and whose "model" axis carries tensor
parallelism, with all collectives emitted by XLA over ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"
EXPERT_AXIS = "expert"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None, n_seq: int = 1, n_expert: int = 1) -> Mesh:
    """Mesh over available devices; defaults to all-data.

    `n_seq > 1` adds a "seq" axis for sequence/context parallelism
    (ring attention in the training path — parallel/train.py routes the
    decoder's attention through ops/ring_attention when the step's mesh
    carries this axis). `n_expert > 1` adds an "expert" axis for
    expert-parallel MoE layers (models/moe.py): expert weight tables
    shard over it and XLA emits the dispatch/combine all-to-alls."""
    devices = list(devices if devices is not None else jax.devices())
    extra = n_model * n_seq * n_expert
    if n_data is None:
        n_data = len(devices) // extra
    assert n_data * extra == len(devices), (
        f"{n_data}x{n_model}x{n_seq}x{n_expert} != {len(devices)} devices")
    axes = [(DATA_AXIS, n_data), (MODEL_AXIS, n_model)]
    if n_seq > 1:
        axes.append((SEQ_AXIS, n_seq))
    if n_expert > 1:
        axes.append((EXPERT_AXIS, n_expert))
    arr = np.asarray(devices).reshape([n for _, n in axes])
    return Mesh(arr, tuple(name for name, _ in axes))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading arrays sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_map_compat(f, mesh, in_specs, out_specs, axis_names=None):
    """shard_map across jax versions: >=0.8 exposes jax.shard_map with
    `check_vma`; the older experimental API takes `check_rep` instead
    (passing the wrong kwarg raises TypeError at wrap time).

    `axis_names`: go manual over ONLY these mesh axes (partial-auto
    mode) — required when the region runs inside a pjit program that
    also shards over other axes (e.g. ring attention over "seq" inside a
    (data, model, seq) train step: full-manual shard_map would force the
    batch to gather over "data", and crashed XLA's SPMD partitioner
    under x64). Silently ignored by the legacy API."""
    try:
        from jax import shard_map

        kw = {}
        if axis_names:
            kw["axis_names"] = frozenset(axis_names)
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False, **kw)
    except ImportError:
        from jax.experimental.shard_map import shard_map

        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)
