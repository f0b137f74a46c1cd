"""Deterministic, order-independent named random streams.

The reference seeds one global `random`/`numpy.random` stream per engine
(distinct constants 0,1,2,4,5,6 — e.g. depth_estimation_coor_engine.py:15-16),
which makes sample identity depend on iteration order. Here every
(stage, scene, sample) gets its own PCG64 stream derived by hashing the
names, so shards can run in any order / in parallel and still reproduce
(SURVEY.md §7 "RNG discipline"). Distribution parity with the reference is
at the schema/label level, not the Mersenne-stream level (BASELINE.md).
"""

from __future__ import annotations

import hashlib

import numpy as np


def _digest(seed: int, names: tuple) -> bytes:
    h = hashlib.sha256()
    h.update(str(int(seed)).encode())
    for name in names:
        h.update(b"\x00")
        h.update(str(name).encode())
    return h.digest()


def stream(seed: int, *names) -> np.random.Generator:
    """A numpy Generator unique to (seed, *names)."""
    return np.random.Generator(
        np.random.PCG64(int.from_bytes(_digest(seed, names)[:8], "little"))
    )


def jax_key(seed: int, *names):
    """A jax PRNG key unique to (seed, *names)."""
    import jax

    return jax.random.key(
        int.from_bytes(_digest(seed, names)[:4], "little")
    )


# Engine seeds preserved from the reference as canonical defaults:
#   camera_movement: 0 (camera_movement_engine_train_val.py:17-18)
#   object_perception: 1 (single_object_perception_engine.py:14-15)
#   visual_correspondence: 2 (…dot_2_multichoice.py:11-12)
#   depth_perception: 4 (depth_estimation_coor_engine.py:15-16)
#   object_movement: 0 (single_object_movement_engine_coord.py:21-23)
ENGINE_SEEDS = {
    "camera_movement": 0,
    "object_perception": 1,
    "visual_correspondence": 2,
    "depth_perception": 4,
    "object_movement": 0,
    "frame_relations": 0,
    "coverage": 0,
}
