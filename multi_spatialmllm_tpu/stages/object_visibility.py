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


def _count_kernel(packed, instance_ids, n: int, num_segments: int):
    """counts[img, obj] for obj ids 0..num_segments-1 (0 = unannotated).

    `packed` is the host-packbits'd `[I, ceil(n/8)]` visibility matrix
    (big-endian bit order within each byte, numpy.packbits default):
    unpacking on device keeps the host->device transfer 8x smaller — the
    transfer, not the matmul, dominates this stage's wall clock. The ONE
    definition of the bit order / one_hot dtype, traced by both the
    single-device and the shard_map multichip programs so they cannot
    diverge."""
    bits = (packed[:, :, None] >> jnp.arange(7, -1, -1, dtype=packed.dtype)) & 1
    vis = bits.reshape(packed.shape[0], -1)[:, :n]
    onehot = jax.nn.one_hot(instance_ids, num_segments, dtype=jnp.float32)
    return vis.astype(jnp.float32) @ onehot


@functools.lru_cache(maxsize=32)
def _counts_fn(i: int, n: int, num_segments: int):
    @jax.jit
    def fn(packed, instance_ids):
        return _count_kernel(packed, instance_ids, n, num_segments)

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
    counts: np.ndarray | None = None,
) -> dict:
    """Reference-schema dict for one scene (compute_object_visibility.py
    docstring :40-44). `counts` short-circuits the device matmul when a
    batched/multichip caller already computed `[I, num_objects]`."""
    if counts is None:
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


@functools.lru_cache(maxsize=32)
def _counts_multichip_fn(mesh, n_pad: int, seg_pad: int):
    """Compiled shard_map object-count program per (mesh, point width,
    segment width) — scenes shard over the mesh's leading axis, each
    device running the one-matmul count program on its shard (the
    multi-chip incarnation of the reference's sequential per-scene loop,
    compute_object_visibility.py:154-196)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import shard_map_compat

    axis = mesh.axis_names[0]

    def local(packed, instance_ids):
        def one(pk, ii):
            return _count_kernel(pk, ii, n_pad, seg_pad)

        return jax.vmap(one)(packed, instance_ids)

    return jax.jit(shard_map_compat(
        local, mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis)))


def object_visibility_multichip(
    scenes: "list[Scene]",
    mesh,
    visibility: "dict[str, np.ndarray]",
    warning_path: str | None = None,
    per_device_batch: int = 4,
) -> dict:
    """Scene-parallel object visibility across every device of a mesh.

    Returns the same {scene_id: reference-schema dict} as
    :func:`build_object_visibility`, bit-identical per scene
    (test-asserted on the 8-device CPU mesh): visible-point counts are
    sums of 0/1 values, exact in f32 at any reduction order, and the
    host threshold/assembly pass is shared with the single-device path.
    Scenes are grouped by padded shape via the shared batching
    scaffolding (`visibility.iter_packed_scene_batches`)."""
    from .visibility import iter_packed_scene_batches

    sink = WarningSink(warning_path)
    results = {}
    for i_pad, n_pad, chunk, packed in iter_packed_scene_batches(
            scenes, mesh, visibility, per_device_batch):
        seg_pad = ((max(s.num_objects for s in chunk) + 1 + 7) // 8) * 8
        batch = packed.shape[0]
        inst = np.zeros((batch, n_pad), dtype=np.int32)
        for j, scene in enumerate(chunk):
            inst[j, : scene.num_points] = scene.instance_ids.astype(
                np.int32)
        fn = _counts_multichip_fn(mesh, n_pad, seg_pad)
        counts = np.asarray(fn(jnp.asarray(packed), jnp.asarray(inst)))
        for j, scene in enumerate(chunk):
            c = counts[j, : scene.num_images, 1: scene.num_objects + 1]
            results[scene.scene_id] = compute_object_visibility(
                scene, warning_sink=sink, counts=c)
    return results


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
