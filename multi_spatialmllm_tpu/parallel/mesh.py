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


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Mesh over available devices; defaults to all-data."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{n_data}x{n_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading arrays sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_map_compat(f, mesh, in_specs, out_specs):
    """shard_map across jax versions: >=0.8 exposes jax.shard_map with
    `check_vma`; the older experimental API takes `check_rep` instead
    (passing the wrong kwarg raises TypeError at wrap time)."""
    try:
        from jax import shard_map

        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map

        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)
