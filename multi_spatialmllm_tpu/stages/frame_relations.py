"""Stage: pairwise frame relations (overlap / distance / yaw / pitch).

TPU-native replacement for
`spatial_engine/camera_movement/calculate_frames_relations.py`: the
reference walks all O(I^2) image pairs in Python calling a NumPy and/or
`torch.cuda` overlap routine per pair (:102-137, :176-194; 25-process Pool
over scenes, 82.65M train records). Here the whole pair block is one MXU
matmul (`V @ V^T`) plus elementwise inclusion-exclusion, and yaw/pitch/
distance difference matrices are broadcast subtractions — one fused XLA
program per scene.

Output schema parity: parquet columns
`scene_id, image_id1, image_id2, overlap, distance, yaw, pitch`
(calculate_frames_relations.py:40-57), plus the `_nonzero` variant
(:59-84). Pairs are the upper triangle (i < j) over *valid-pose* images in
sorted id order, matching `process_scene` (:176-179).
"""

from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as G
from ..core.io import WarningSink, write_parquet
from ..core.scene import Scene
from .visibility import compute_scene_visibility


def _unpack_bits(packed, n: int):
    """Device-side inverse of numpy.packbits(axis=-1) (big-endian bit
    order), sliced back to `n` columns. Uploading the packed matrix keeps
    the host->device transfer 8x smaller — the transfer, not the `V@Vᵀ`
    matmul, dominates real-scale relation dispatches on tunnel/PCIe."""
    bits = (packed[..., None]
            >> jnp.arange(7, -1, -1, dtype=packed.dtype)) & 1
    return bits.reshape(*packed.shape[:-1], -1)[..., :n].astype(bool)


@functools.lru_cache(maxsize=32)
def _relations_fn(i_pad: int, n_pad: int, dtype_name: str):
    @jax.jit
    def fn(packed, extrinsics, image_valid):
        vis = _unpack_bits(packed, n_pad)
        return G.pairwise_frame_relations(vis, extrinsics, image_valid)

    return fn


@functools.lru_cache(maxsize=32)
def _relations_multichip_fn(mesh, n_pad: int):
    """Compiled shard_map relations program per (mesh, point width) —
    scenes shard over the mesh's leading axis, each device vmapping the
    single-scene fused program over its shard (the multi-chip
    incarnation of the reference's 25-process Pool over scenes,
    calculate_frames_relations.py:200-253)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import shard_map_compat

    axis = mesh.axis_names[0]

    def local(packed, extrinsics, image_valid):
        return jax.vmap(
            lambda pk, e, iv: G.pairwise_frame_relations(
                _unpack_bits(pk, n_pad), e, iv)
        )(packed, extrinsics, image_valid)

    return jax.jit(shard_map_compat(
        local, mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis)))


def compute_relations_multichip(
    scenes: "list[Scene]",
    mesh,
    visibility: "dict[str, np.ndarray]",
    dtype=np.float64,
    per_device_batch: int = 4,
) -> "dict[str, dict[str, np.ndarray]]":
    """Scene-parallel frame relations across every device of a mesh.

    Returns `{scene_id: {relation: [I, I]}}` — bit-identical to
    :func:`compute_scene_relations` per scene (test-asserted on the
    8-device CPU mesh and in `dryrun_multichip`). Scenes are grouped by
    padded shape, stacked, and sharded over the mesh's leading axis;
    short groups pad with repeated scenes whose rows are dropped."""
    from .visibility import ensure_x64, iter_packed_scene_batches

    ensure_x64(dtype)
    out: dict[str, dict[str, np.ndarray]] = {}
    for i_pad, n_pad, chunk, packed in iter_packed_scene_batches(
            scenes, mesh, visibility, per_device_batch):
        fn = _relations_multichip_fn(mesh, n_pad)
        batch = packed.shape[0]
        exts = np.tile(np.eye(4, dtype=dtype), (batch, i_pad, 1, 1))
        ivalid = np.zeros((batch, i_pad), dtype=bool)
        for j, scene in enumerate(chunk):
            exts[j], _, ivalid[j] = scene.padded_images(dtype)
        rel = {k: np.asarray(v) for k, v in
               fn(jnp.asarray(packed), jnp.asarray(exts),
                  jnp.asarray(ivalid)).items()}
        for j, scene in enumerate(chunk):
            n = scene.num_images
            out[scene.scene_id] = {k: v[j, :n, :n]
                                   for k, v in rel.items()}
    return out


def _dispatch_scene_relations(scene: Scene, vis: np.ndarray, dtype):
    """Dispatch one scene's relation program; returns the device dict.

    Shared by `compute_scene_relations` and `project_scenes_pipelined` so
    the two paths cannot drift (padding, bit-packing, program cache key).
    Caller is responsible for `ensure_x64(dtype)`.
    """
    ext, _, ivalid = scene.padded_images(dtype)
    i_pad = ext.shape[0]
    vis_pad = np.zeros((i_pad, vis.shape[1]), dtype=bool)
    vis_pad[: vis.shape[0]] = vis
    fn = _relations_fn(i_pad, vis.shape[1], np.dtype(dtype).name)
    return fn(jnp.asarray(np.packbits(vis_pad, axis=1)), jnp.asarray(ext),
              jnp.asarray(ivalid))


def compute_scene_relations(
    scene: Scene,
    vis: np.ndarray | None = None,
    dtype=np.float64,
) -> dict[str, np.ndarray]:
    """`[I, I]` relation matrices for one scene (rows/cols = scene.image_ids)."""
    from .visibility import ensure_x64

    ensure_x64(dtype)
    if vis is None:
        vis = compute_scene_visibility(scene, dtype)
    rel = _dispatch_scene_relations(scene, vis, dtype)
    n = scene.num_images
    return {k: np.asarray(v)[:n, :n] for k, v in rel.items()}


def project_scenes_pipelined(
    scenes: "list[Scene]",
    dtype=np.float32,
    with_relations: bool = True,
):
    """Cross-scene software pipeline for the split build: visibility
    (exact-parity hybrid) + frame relations with scene k+1's uploads and
    device compute overlapping scene k's fetch + host f64 fix-up.

    The sequential per-scene loop (reference: make_visibility_info.py's
    25-process Pool, then calculate_frames_relations.py) serializes three
    resources that can run concurrently: the host->device interconnect
    (~182 MB of depth per ScanNet-val scene), the device itself, and the
    host CPU (exact borderline fix-up + packbits). jax dispatch is async,
    so dispatching scene k+1's chunks BEFORE finalizing scene k keeps all
    three busy; relation fetches are deferred one further scene because
    they queue on the device after scene k+1's chunks. Results are
    IDENTICAL to the unpipelined stages (same programs, same inputs —
    only the fetch order changes); yields (scene, vis, rel) in input
    order with rel=None when with_relations=False.

    Needs host cores to win: on a 1-core host the overlapped fix-up/
    fetch contends with the interconnect's transfer threads for the
    same core and the pipeline measures ~20% SLOWER than the
    sequential loop (scripts/profiles/_pipeproj_drive.py on the dev
    tunnel: seq 4.3-5.1 s/scene vs pipe 5.5-5.7) — bench.py therefore
    times the sequential loop; production multi-core hosts should use
    this path.
    """
    from .visibility import _hybrid_dispatch, _hybrid_finalize, ensure_x64

    ensure_x64(dtype)
    hyb_pending = None   # (scene, handles, fn_chunk)
    rel_pending = None   # (scene, vis, device rel dict)

    def rel_dispatch(scene, vis):
        return _dispatch_scene_relations(scene, vis, dtype)

    def rel_fetch(scene, rel):
        n = scene.num_images
        return {k: np.asarray(v)[:n, :n] for k, v in rel.items()}

    for scene in scenes:
        dispatched = (scene, *_hybrid_dispatch(scene))
        if hyb_pending is not None:
            s0, h0, c0 = hyb_pending
            vis0 = _hybrid_finalize(s0, h0, c0)
            if with_relations:
                if rel_pending is not None:
                    s1, v1, r1 = rel_pending
                    yield s1, v1, rel_fetch(s1, r1)
                rel_pending = (s0, vis0, rel_dispatch(s0, vis0))
            else:
                yield s0, vis0, None
        hyb_pending = dispatched
    if hyb_pending is not None:
        s0, h0, c0 = hyb_pending
        vis0 = _hybrid_finalize(s0, h0, c0)
        if with_relations:
            if rel_pending is not None:
                s1, v1, r1 = rel_pending
                yield s1, v1, rel_fetch(s1, r1)
            yield s0, vis0, rel_fetch(s0, rel_dispatch(s0, vis0))
        else:
            yield s0, vis0, None


def scene_relation_records(
    scene: Scene,
    rel: dict[str, np.ndarray],
    warning_sink: WarningSink | None = None,
) -> dict[str, np.ndarray]:
    """Flatten matrices to the reference's row schema (valid pairs, i < j)."""
    valid = scene.valid_image_mask()
    idx = np.where(valid)[0]
    ids = np.asarray(scene.image_ids)
    a, b = np.triu_indices(len(idx), k=1)
    ia, ib = idx[a], idx[b]
    overlap = rel["overlap"][ia, ib]
    distance = rel["distance"][ia, ib]
    yaw = rel["yaw"][ia, ib]
    pitch = rel["pitch"][ia, ib]
    if warning_sink is not None:
        bad = ~(
            np.isfinite(overlap) & np.isfinite(distance)
            & np.isfinite(yaw) & np.isfinite(pitch)
        )
        for k in np.where(bad)[0]:
            warning_sink(
                f"{scene.scene_id}: ({ids[ia[k]]}, {ids[ib[k]]}) has something "
                f"wrong {[overlap[k], distance[k], yaw[k], pitch[k]]}."
            )
    return {
        "scene_id": np.full(len(a), scene.scene_id, dtype=object),
        "image_id1": ids[ia],
        "image_id2": ids[ib],
        "overlap": overlap,
        "distance": distance,
        "yaw": yaw,
        "pitch": pitch,
    }


@functools.lru_cache(maxsize=32)
def _relations_batch_fn(s: int, i_pad: int, n_pad: int, dtype_name: str):
    @jax.jit
    def fn(packed, extrinsics, image_valid):
        vis = _unpack_bits(packed, n_pad)
        return jax.vmap(G.pairwise_frame_relations)(
            vis, extrinsics, image_valid)

    return fn


def _batched_scene_relations(
    scenes: "list[Scene]",
    visibility: dict,
    dtype,
    batch_size: int = 10,
) -> "dict[str, dict[str, np.ndarray]]":
    """Relations for many scenes with batched dispatch (same grouping as
    compute_visibility_batch: one device round-trip per shape-group chunk
    instead of one per scene)."""
    from .visibility import ensure_x64

    ensure_x64(dtype)
    groups: dict[tuple, list[Scene]] = {}
    for scene in scenes:
        ext, _, _ = scene.padded_images(dtype)
        vis = visibility[scene.scene_id]
        n_pad = ((max(vis.shape[1], 1) + 127) // 128) * 128
        groups.setdefault((ext.shape[0], n_pad), []).append(scene)

    out: dict[str, dict[str, np.ndarray]] = {}
    for (i_pad, n_pad), members in groups.items():
        for lo in range(0, len(members), batch_size):
            chunk = members[lo: lo + batch_size]
            s = len(chunk)
            vis_pad = np.zeros((s, i_pad, n_pad), dtype=bool)
            exts = np.tile(np.eye(4, dtype=dtype), (s, i_pad, 1, 1))
            ivalid = np.zeros((s, i_pad), dtype=bool)
            for j, scene in enumerate(chunk):
                v = visibility[scene.scene_id]
                vis_pad[j, : v.shape[0], : v.shape[1]] = v
                exts[j], _, ivalid[j] = scene.padded_images(dtype)
            fn = _relations_batch_fn(s, i_pad, n_pad, np.dtype(dtype).name)
            rel = fn(jnp.asarray(np.packbits(vis_pad, axis=2)),
                     jnp.asarray(exts), jnp.asarray(ivalid))
            rel = {k: np.asarray(v) for k, v in rel.items()}
            for j, scene in enumerate(chunk):
                n = scene.num_images
                out[scene.scene_id] = {
                    k: v[j, :n, :n] for k, v in rel.items()}
    return out


def build_frame_relations(
    scenes: Iterable[Scene],
    output_parquet: str | None = None,
    warning_path: str | None = None,
    dtype=np.float64,
    visibility: "dict[str, np.ndarray] | None" = None,
):
    """Run the stage over scenes; returns the full DataFrame.

    Writes `output_parquet` and the `_nonzero` companion when a path is
    given (calculate_frames_relations.py:242-244 semantics: nonzero keeps
    `overlap != 0`). With precomputed `visibility`, scenes dispatch in
    shape-grouped batches (one device round-trip per chunk).
    """
    import pandas as pd

    sink = WarningSink(warning_path)
    scenes = list(scenes)
    frames = []
    if visibility is not None and all(
            s.scene_id in visibility for s in scenes):
        rels = _batched_scene_relations(scenes, visibility, dtype)
        for scene in scenes:
            frames.append(pd.DataFrame(
                scene_relation_records(scene, rels[scene.scene_id], sink)))
        return _relations_frame(frames, output_parquet)
    for scene in scenes:
        vis = None if visibility is None else visibility.get(scene.scene_id)
        rel = compute_scene_relations(scene, vis=vis, dtype=dtype)
        frames.append(pd.DataFrame(scene_relation_records(scene, rel, sink)))
    return _relations_frame(frames, output_parquet)


def _relations_frame(frames, output_parquet):
    import pandas as pd

    df = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(
            columns=["scene_id", "image_id1", "image_id2", "overlap",
                     "distance", "yaw", "pitch"]
        )
    )
    if output_parquet:
        write_parquet(df, output_parquet)
        nonzero = df[df["overlap"] != 0.0]
        write_parquet(
            nonzero, output_parquet.replace(".parquet", "_nonzero.parquet")
        )
    return df
