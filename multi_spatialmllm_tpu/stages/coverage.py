"""Stage: minimal image-combination coverage search.

TPU-native replacement for
`spatial_engine/object_perception/single_object_coverage_finder.py` — the
hardest algorithm in the reference (SURVEY.md §7). Hybrid design:

  * Device: per (object, image, axis) min/max coordinate of the visible
    object points — segment reductions over the `[I, N]` visibility matrix,
    one fused program per scene.
  * Host: the breadth-first minimal-set search. Because the coverage of a
    union of images along one axis is just `max(per-image max) - min(
    per-image min)`, the BFS operates on scalar intervals and Python-int
    bitmasks instead of the reference's `[N]`-long boolean masks
    (single_object_coverage_finder.py:97-126) — asymptotically smaller
    state with identical results.

Search semantics parity (single_object_coverage_finder.py:76-220):
tolerance ±10% of target (:38), at most `max_images=5` per combination
(:85), cap of 25 candidate images via random sample (:117-119), suffix
cumulative-union early pruning (:121-126, :183-186 — including the
reference's overshoot behavior where the *full* suffix union must itself
satisfy the ±tolerance window), superset-of-minimal pruning (:131-140),
expansion only by first-layer singletons with larger index (:198-210), and
a 5000-combination cap per level via random sample (:212-214).
"""

from __future__ import annotations

import functools
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.io import dump_pickle
from ..core.rng import stream
from ..core.scene import Scene
from .visibility import compute_scene_visibility

TOLERANCE = 0.1
MAX_IMAGES = 5
MAX_CANDIDATE_IMAGES = 25
MAX_LEVEL_COMBINATIONS = 5000


@functools.lru_cache(maxsize=32)
def _interval_fn(i: int, n: int, num_segments: int):
    @jax.jit
    def fn(packed, instance_ids, coords):
        # For each image and axis: per-object min/max over visible points.
        # `packed` = numpy.packbits(vis, axis=1) (big-endian bit order):
        # the 8x-smaller host->device transfer dominates this stage's
        # wall clock on tunnel/PCIe hosts; unpacking on device is free.
        bits = (packed[:, :, None]
                >> jnp.arange(7, -1, -1, dtype=packed.dtype)) & 1
        vis = bits.reshape(packed.shape[0], -1)[:, :n].astype(bool)
        big = jnp.asarray(jnp.inf, coords.dtype)

        def per_image(vrow):
            def per_axis(c):
                masked_min = jnp.where(vrow, c, big)
                masked_max = jnp.where(vrow, c, -big)
                mins = jax.ops.segment_min(
                    masked_min, instance_ids, num_segments=num_segments)
                maxs = jax.ops.segment_max(
                    masked_max, instance_ids, num_segments=num_segments)
                return mins, maxs

            mins, maxs = jax.vmap(per_axis, in_axes=1, out_axes=0)(coords)
            cnt = jax.ops.segment_sum(
                vrow.astype(jnp.int32), instance_ids, num_segments=num_segments)
            return mins, maxs, cnt

        return jax.vmap(per_image)(vis)

    return fn


def object_coverage_intervals(scene: Scene, vis: np.ndarray):
    """Device precompute.

    Returns (mins, maxs, counts):
      mins/maxs: `[I, 3, O+1]` per-image per-axis extrema of visible points
        per instance segment (segment 0 = unannotated), +-inf when empty;
      counts: `[I, O+1]` visible-point counts.
    """
    from .visibility import ensure_x64

    ensure_x64(np.float64)
    fn = _interval_fn(vis.shape[0], vis.shape[1], scene.num_objects + 1)
    packed = np.packbits(np.ascontiguousarray(vis), axis=1)
    mins, maxs, cnt = fn(
        jnp.asarray(packed),
        jnp.asarray(scene.instance_ids.astype(np.int32)),
        jnp.asarray(scene.points_aligned[:, :3].astype(np.float64)),
    )
    return np.asarray(mins), np.asarray(maxs), np.asarray(cnt)


@functools.lru_cache(maxsize=32)
def _interval_multichip_fn(mesh, n_pad: int, num_segments: int):
    """Compiled shard_map interval program per (mesh, widths) — the
    device half of the coverage stage scene-parallel over the mesh's
    leading axis (the reference fans this out as one background process
    per 10 scenes, find_object_coverage.sh:24-48)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import shard_map_compat

    axis = mesh.axis_names[0]
    single = _interval_fn.__wrapped__  # uncached builder; jit inside

    def local(packed, instance_ids, coords):
        i = packed.shape[1]
        return jax.vmap(single(i, n_pad, num_segments))(
            packed, instance_ids, coords)

    return jax.jit(shard_map_compat(
        local, mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis)))


def coverage_intervals_multichip(
    scenes: "list[Scene]",
    mesh,
    visibility: "dict[str, np.ndarray]",
    per_device_batch: int = 4,
) -> dict:
    """Scene-parallel device precompute for the coverage search.

    Returns `{scene_id: (mins, maxs, counts)}` — identical to
    :func:`object_coverage_intervals` per scene (the host BFS consumes
    them unchanged, so `build_object_coverage(mesh=...)` output equals
    the single-device run bit-for-bit). Scenes group by padded shape and
    shard over the mesh's leading axis."""
    from .visibility import ensure_x64, iter_packed_scene_batches

    ensure_x64(np.float64)
    if not scenes:  # the single-device path returns {} here too
        return {}
    num_segments = max(s.num_objects for s in scenes) + 1

    out: dict = {}
    for i_pad, n_pad, chunk, packed in iter_packed_scene_batches(
            scenes, mesh, visibility, per_device_batch):
        fn = _interval_multichip_fn(mesh, n_pad, num_segments)
        batch = packed.shape[0]
        seg = np.zeros((batch, n_pad), np.int32)
        pts = np.zeros((batch, n_pad, 3), np.float64)
        for j, scene in enumerate(chunk):
            n = scene.num_points
            seg[j, :n] = scene.instance_ids.astype(np.int32)
            pts[j, :n] = scene.points_aligned[:, :3]
        mins, maxs, cnt = (np.asarray(v) for v in fn(
            jnp.asarray(packed), jnp.asarray(seg), jnp.asarray(pts)))
        for j, scene in enumerate(chunk):
            i, o = scene.num_images, scene.num_objects + 1
            out[scene.scene_id] = (mins[j, :i, :, :o],
                                   maxs[j, :i, :, :o],
                                   cnt[j, :i, :o])
    return out


def _covers(lo: float, hi: float, target: float, tolerance: float) -> bool:
    """covers_dimension parity (single_object_coverage_finder.py:68-74)."""
    if not (lo <= hi):  # empty union
        return False
    return abs((hi - lo) - target) <= tolerance * target


def find_minimal_combinations(
    image_ids: Sequence[str],
    lows: np.ndarray,
    highs: np.ndarray,
    target: float,
    rng: np.random.Generator,
    tolerance: float = TOLERANCE,
    max_images: int = MAX_IMAGES,
) -> dict[int, list[tuple]]:
    """BFS over image combinations; returns {k: [image-id tuples of size k]}.

    `lows[i]`/`highs[i]` are image i's coordinate extrema over the object's
    visible points along the chosen axis (+inf/-inf when it sees none).
    """
    valid = list(range(len(image_ids)))
    if len(valid) > MAX_CANDIDATE_IMAGES:
        # reference: random.sample of the image list (:117-119)
        valid = sorted(rng.choice(len(image_ids), MAX_CANDIDATE_IMAGES,
                                  replace=False).tolist())
    n = len(valid)
    lo = np.asarray([lows[i] for i in valid], dtype=np.float64)
    hi = np.asarray([highs[i] for i in valid], dtype=np.float64)

    # Suffix cumulative union intervals (:121-126).
    suf_lo = np.minimum.accumulate(lo[::-1])[::-1]
    suf_hi = np.maximum.accumulate(hi[::-1])[::-1]

    minimal_masks: list[int] = []
    minimal_solutions: dict[int, list[tuple]] = {}
    first_layer: list[tuple] = []  # (idx, lo, hi, bit)

    # level k=1
    current = [((i,), lo[i], hi[i], i, 1 << i) for i in range(n)]
    k = 1
    while k <= max_images and current:
        to_expand = []
        new_minimal = []
        for comb, ulo, uhi, last, bits in current:
            if any((m & bits) == m for m in minimal_masks):
                continue
            if _covers(ulo, uhi, target, tolerance):
                new_minimal.append(bits)
                minimal_solutions.setdefault(k, []).append(
                    tuple(image_ids[valid[i]] for i in comb)
                )
            else:
                if last < n - 1:
                    plo = min(suf_lo[last], ulo)
                    phi = max(suf_hi[last], uhi)
                    if not _covers(plo, phi, target, tolerance):
                        # reference's full-suffix prune (:183-186)
                        continue
                to_expand.append((comb, ulo, uhi, last, bits))
                if k == 1:
                    first_layer.append((comb[0], ulo, uhi, bits))
        minimal_masks.extend(new_minimal)

        next_level = []
        if k < max_images:
            for comb, ulo, uhi, last, bits in to_expand:
                for idx, slo, shi, sbit in first_layer:
                    if idx > last:
                        next_level.append(
                            (comb + (idx,), min(ulo, slo), max(uhi, shi),
                             idx, bits | sbit)
                        )
        if len(next_level) > MAX_LEVEL_COMBINATIONS:
            pick = rng.choice(len(next_level), MAX_LEVEL_COMBINATIONS,
                              replace=False)
            next_level = [next_level[int(i)] for i in pick]
        current = next_level
        k += 1
    return minimal_solutions


def process_object_coverage(
    scene: Scene,
    object_id: int,
    visible_images: Sequence[str],
    mins: np.ndarray,
    maxs: np.ndarray,
    rng: np.random.Generator,
    tolerance: float = TOLERANCE,
) -> dict[str, dict[int, list[tuple]]]:
    """Minimal combinations for height/length/width of one object.

    Axis selection parity: height axis=2; width/length axes from the
    aligned bbox (process_object, single_object_coverage_finder.py:245-253).
    """
    seg = object_id + 1
    rows = [scene.image_index(img) for img in visible_images]

    def run(axis: int, target: float):
        lows = mins[rows, axis, seg]
        highs = maxs[rows, axis, seg]
        return find_minimal_combinations(
            list(visible_images), lows, highs, target, rng, tolerance)

    width_axis = scene.object_width_axis(object_id)
    length_axis = 1 if width_axis == 0 else 0
    return {
        "height": run(2, scene.object_height(object_id)),
        "length": run(length_axis, scene.object_length(object_id)),
        "width": run(width_axis, scene.object_width(object_id)),
    }


def build_object_coverage(
    scenes: Iterable[Scene],
    object_visibility: dict,
    output_dir: str | None = None,
    split_name: str = "train",
    visibility: "dict[str, np.ndarray] | None" = None,
    seed: int = 0,
    tolerance: float = TOLERANCE,
    mesh=None,
):
    """Run the coverage stage; returns (height, length, width) dicts with
    the reference's nested schema
    `{scene_id: {object_id: {k: [image-tuples]}}}` and optionally writes the
    three pkls (process_split_objects, single_object_coverage_finder.py
    :287-338). With `mesh`, the device interval precompute runs
    scene-parallel over the mesh's leading axis
    (:func:`coverage_intervals_multichip`); results are identical."""
    scenes = list(scenes)
    multichip = None
    if mesh is not None:
        vis_all = {}
        for scene in scenes:
            if scene.scene_id not in object_visibility:
                continue
            v = None if visibility is None else visibility.get(
                scene.scene_id)
            vis_all[scene.scene_id] = (
                compute_scene_visibility(scene) if v is None else v)
        multichip = coverage_intervals_multichip(
            [s for s in scenes if s.scene_id in vis_all], mesh, vis_all)
    results = {"height": {}, "length": {}, "width": {}}
    for scene in scenes:
        sid = scene.scene_id
        if sid not in object_visibility:
            continue
        if multichip is not None:
            mins, maxs, _ = multichip[sid]
        else:
            vis = None if visibility is None else visibility.get(sid)
            if vis is None:
                vis = compute_scene_visibility(scene)
            mins, maxs, _ = object_coverage_intervals(scene, vis)
        obj_map = object_visibility[sid]["object_to_images"]
        for dim in results:
            results[dim].setdefault(sid, {})
        for object_id, vis_list in obj_map.items():
            visible_images = [v["image_id"] for v in vis_list]
            rng = stream(seed, "coverage", sid, object_id)
            res = process_object_coverage(
                scene, object_id, visible_images, mins, maxs, rng, tolerance)
            for dim in results:
                results[dim][sid][object_id] = res[dim]
    if output_dir:
        for dim in results:
            dump_pickle(
                results[dim],
                f"{output_dir}/{split_name}_object_coverage_{dim}.pkl",
            )
    return results["height"], results["length"], results["width"]


def merge_coverage_shards(shard_dicts: Iterable[dict]) -> dict:
    """Merge per-shard coverage dicts (merge_object_coverage.py:17-64)."""
    merged: dict = {}
    for shard in shard_dicts:
        for scene_id, objs in shard.items():
            merged.setdefault(scene_id, {}).update(objs)
    return merged
