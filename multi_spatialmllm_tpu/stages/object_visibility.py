"""Stage: object visibility (which images see which objects).

TPU-native replacement for
`spatial_engine/object_perception/compute_object_visibility.py`: the
reference intersects Python sets per (object, image) sequentially
(:122-135, 1h46m train). Here intersection counts for *all* objects and
images of a scene are one MXU matmul: `counts = V @ onehot(instance_ids)`
with `V` the `[I, N]` visibility matrix.

Semantics parity:
  * skip categories in NONINFORMATIVE_DESC (compute_object_visibility.py:58),
  * skip objects with no points (:111-115),
  * keep images with intersection >= max(1, int(0.05 * |object|)) (:122, :135),
  * emit both `object_to_images` and `image_to_objects` with
    `intersection_count` and `visibility` percent (:135-150),
  * iterate images in sorted valid-pose order.
"""

from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.io import WarningSink, dump_pickle
from ..core.scene import Scene
from .visibility import compute_scene_visibility

NONINFORMATIVE_DESC = {"wall", "object", "floor", "ceiling", "window"}


@functools.lru_cache(maxsize=32)
def _counts_fn(i: int, n: int, num_segments: int):
    @jax.jit
    def fn(packed, instance_ids):
        # counts[img, obj] for obj ids 0..num_segments-1 (0 = unannotated).
        # `packed` is the host-packbits'd visibility matrix (big-endian
        # bit order within each byte, numpy.packbits default): unpacking
        # on device keeps the host->device transfer 8x smaller — the
        # transfer, not the matmul, dominates this stage's wall clock.
        bits = (packed[:, :, None] >> jnp.arange(7, -1, -1, dtype=packed.dtype)) & 1
        vis = bits.reshape(packed.shape[0], -1)[:, :n]
        onehot = jax.nn.one_hot(instance_ids, num_segments, dtype=jnp.float32)
        return vis.astype(jnp.float32) @ onehot

    return fn


def object_image_counts(scene: Scene, vis: np.ndarray) -> np.ndarray:
    """`[num_images, num_objects]` visible-point counts per object."""
    num_segments = scene.num_objects + 1
    fn = _counts_fn(vis.shape[0], vis.shape[1], num_segments)
    packed = np.packbits(np.ascontiguousarray(vis), axis=1)
    counts = fn(jnp.asarray(packed), jnp.asarray(scene.instance_ids.astype(np.int32)))
    return np.asarray(counts)[:, 1:]  # drop the unannotated segment


def compute_object_visibility(
    scene: Scene,
    vis: np.ndarray | None = None,
    warning_sink: WarningSink | None = None,
) -> dict:
    """Reference-schema dict for one scene (compute_object_visibility.py
    docstring :40-44)."""
    if vis is None:
        vis = compute_scene_visibility(scene)
    counts = object_image_counts(scene, vis)
    valid = scene.valid_image_mask()
    result = {"object_to_images": {}, "image_to_objects": {}}
    for object_id in range(scene.num_objects):
        if scene.categories[object_id] in NONINFORMATIVE_DESC:
            continue
        total = int(scene.object_point_mask(object_id).sum())
        if total == 0:
            if warning_sink is not None:
                warning_sink(
                    f"[Warning] Scene {scene.scene_id}, object {object_id} "
                    f"has no point indices, skipping."
                )
            continue
        threshold = max(1, int(0.05 * total))
        for i, image_id in enumerate(scene.image_ids):
            if not valid[i]:
                continue
            c = int(counts[i, object_id])
            if c >= threshold:
                pct = c / total * 100.0
                result["object_to_images"].setdefault(object_id, []).append(
                    {"image_id": image_id, "intersection_count": c,
                     "visibility": pct}
                )
                result["image_to_objects"].setdefault(image_id, []).append(
                    {"object_id": object_id, "intersection_count": c,
                     "visibility": pct}
                )
    return result


def build_object_visibility(
    scenes: Iterable[Scene],
    output_pkl: str | None = None,
    warning_path: str | None = None,
    visibility: "dict[str, np.ndarray] | None" = None,
) -> dict:
    sink = WarningSink(warning_path)
    results = {}
    for scene in scenes:
        vis = None if visibility is None else visibility.get(scene.scene_id)
        results[scene.scene_id] = compute_object_visibility(scene, vis, sink)
    if output_pkl:
        dump_pickle(results, output_pkl)
    return results
