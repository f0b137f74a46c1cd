"""Stage: point-visibility index (L3).

TPU-native replacement for the reference's
`spatial_engine/utils/scannet_utils/make_visibility_info.py`: instead of a
per-image Python loop with per-point set inversion (make_visibility_info.py
:93-113, 25-process Pool, 47 min val / 3 h train), each scene becomes one
fused XLA program producing the dense `[I, N]` visibility matrix; the
inverse `point_to_images` map is its transpose.

Output format parity: the parquet schema every consumer actually reads —
`key = "{scene_id}:image_to_points:{image_id}"` / `"{scene_id}:point_to_images:{p}"`,
`values` = JSON-encoded list (convert_pkl_to_parquet, make_visibility_info.py
:56-71; load_visibility_dict, compute_object_visibility.py:60-70;
VisibilityInfoHandler, info_handler.py:502-538). The reference's `run_split`
as shipped writes comma-separated keys and raw lists and crashes on a scoped
import (SURVEY.md §2 #9); we implement the evident intent.

Precision: device compute defaults to float64 (TPU-emulated): exact
agreement with the reference on CPU, and near-exact on TPU — the f64
emulation's division is not correctly rounded, which flips ~7 ppm of
EXACT-boundary bits at real scale (measured 11 / 2.6M pairs vs the numpy
oracle). `compute_scene_visibility_hybrid` closes even that gap: a true-f32
device pass plus numpy-f64 host recompute of conservatively-flagged
borderline pairs reproduces the reference bit-for-bit on every backend.
Plain float32 flips ~5% of borderline labels and is a speed opt-in. All
paths return the matrix bit-packed from the device (8x less transfer).
"""

from __future__ import annotations

import functools
import json
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as G
from ..core.io import WarningSink, write_parquet
from ..core.scene import Scene


def _packbits(mask):
    """[..., N] bool -> [..., N//8] uint8, np.packbits bit order — packed
    ON DEVICE so the host transfer moves 1 bit per pair, not 1 byte (the
    visibility matrix is the dominant device->host payload)."""
    shape = mask.shape[:-1] + (mask.shape[-1] // 8, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.uint8)
    return jnp.sum(mask.reshape(shape).astype(jnp.uint8) * weights,
                   axis=-1, dtype=jnp.uint8)


def _unpackbits(packed: np.ndarray, n: int) -> np.ndarray:
    return np.unpackbits(packed, axis=-1)[..., :n].astype(bool)


@functools.lru_cache(maxsize=32)
def _visibility_fn(i_pad: int, n_pad: int, depth_hw: tuple, image_hw: tuple, dtype_name: str):
    """Compile cache keyed by padded shapes (bucketed upstream)."""

    @jax.jit
    def fn(points, K, extrinsics, depth_maps, image_valid, point_valid):
        return _packbits(G.visibility_matrix(
            points, K, extrinsics, depth_maps, image_hw,
            image_valid, point_valid,
        ))

    return fn


def ensure_x64(dtype) -> None:
    """Stages default to float64 for exact label parity; jax silently
    downcasts f64 -> f32 unless the x64 flag is on, so flip it on demand."""
    if np.dtype(dtype) == np.float64 and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)


def iter_packed_scene_batches(scenes, mesh, visibility: dict,
                              per_device_batch: int):
    """Scenes grouped by padded (I, N) shape, visibility packbits-padded,
    yielded in mesh-shardable batches.

    Shared scaffolding for the scene-parallel derived-index stages
    (`frame_relations.compute_relations_multichip`,
    `coverage.coverage_intervals_multichip`): yields
    `(i_pad, n_pad, chunk, packed)` where `chunk` is this dispatch's
    <= batch scenes and `packed` the zero-filled
    `[batch, i_pad, n_pad // 8]` uint8 buffer
    (batch = mesh.shape[leading axis] * per_device_batch; trailing rows
    stay zero and are dropped by the caller's unpad slice). Keeping the
    8-row / 128-lane rounding here means every scene-parallel stage
    shares one padding convention."""
    axis = mesh.axis_names[0]
    batch = mesh.shape[axis] * per_device_batch

    groups: dict[tuple, list] = {}
    for scene in scenes:
        i_pad = ((max(scene.num_images, 1) + 7) // 8) * 8
        n_pad = ((max(scene.num_points, 1) + 127) // 128) * 128
        groups.setdefault((i_pad, n_pad), []).append(scene)

    for (i_pad, n_pad), members in groups.items():
        for lo in range(0, len(members), batch):
            chunk = members[lo: lo + batch]
            packed = np.zeros((batch, i_pad, n_pad // 8), np.uint8)
            for j, scene in enumerate(chunk):
                vis = visibility[scene.scene_id]
                vis_pad = np.zeros((i_pad, n_pad), dtype=bool)
                vis_pad[: vis.shape[0], : vis.shape[1]] = vis
                packed[j] = np.packbits(vis_pad, axis=1)
            yield i_pad, n_pad, chunk, packed


# Image-chunking threshold: the fused program materializes several
# [I, N]-shaped f64 intermediates (projected xy, depths, gather indices);
# past ~24M point-image pairs the single-program footprint stops fitting
# comfortably in one v5e's HBM, so real-scale scenes (ScanNet val D5:
# ~300 images x ~200K vertices = 60M pairs) dispatch in image chunks.
_PAIR_BUDGET_F64 = 24_000_000
# f32 intermediates are half the f64 footprint and skip the emulation's
# extra temporaries: 64M pairs (~1 GB of [I, N] f32 working set) runs the
# ScanNet-val-sized scene (296 x 202K = 60M pairs) in ONE dispatch.
_PAIR_BUDGET_F32 = 64_000_000


def compute_scene_visibility(
    scene: Scene, dtype=np.float64, image_chunk: int | None = None
) -> np.ndarray:
    """Dense `[num_images, num_points]` bool visibility for one scene.

    Large scenes are processed `image_chunk` images per dispatch (chosen
    automatically from the pair budget when not given); the point cloud is
    transferred once and reused across chunks.
    """
    ensure_x64(dtype)
    pts, pvalid = scene.padded_points(dtype)
    ext, depth, ivalid = scene.padded_images(dtype)
    i_pad, n_pad = ext.shape[0], pts.shape[0]
    budget = (_PAIR_BUDGET_F64 if np.dtype(dtype) == np.float64
              else _PAIR_BUDGET_F32)
    if image_chunk is None and i_pad * n_pad > budget:
        image_chunk = max(8, (budget // n_pad) // 8 * 8)
    if image_chunk and image_chunk < i_pad:
        n_chunks = -(-i_pad // image_chunk)
        tot = n_chunks * image_chunk
        if tot > i_pad:  # pad the image axis up to a chunk multiple
            ext = np.concatenate(
                [ext, np.tile(np.eye(4, dtype=ext.dtype),
                              (tot - i_pad, 1, 1))])
            depth = np.concatenate(
                [depth, np.zeros((tot - i_pad,) + depth.shape[1:],
                                 dtype=depth.dtype)])
            ivalid = np.concatenate(
                [ivalid, np.zeros(tot - i_pad, dtype=bool)])
        fn = _visibility_fn(image_chunk, n_pad, scene.depth_hw,
                            scene.image_hw, np.dtype(dtype).name)
        pts_d = jnp.asarray(pts)  # one transfer, reused per chunk
        K_d = jnp.asarray(scene.intrinsic.astype(dtype))
        pv_d = jnp.asarray(pvalid)
        # dispatch every chunk before fetching any (async dispatch:
        # later chunks' upload/compute overlap earlier fetches)
        handles = [
            fn(pts_d, K_d,
               jnp.asarray(ext[lo: lo + image_chunk]),
               jnp.asarray(depth[lo: lo + image_chunk]),
               jnp.asarray(ivalid[lo: lo + image_chunk]), pv_d)
            for lo in range(0, tot, image_chunk)
        ]
        rows = [np.asarray(h) for h in handles]
        vis = _unpackbits(np.concatenate(rows), n_pad)
        return vis[: scene.num_images, : scene.num_points]
    fn = _visibility_fn(
        i_pad, n_pad, scene.depth_hw, scene.image_hw,
        np.dtype(dtype).name,
    )
    vis = _unpackbits(np.asarray(fn(
        jnp.asarray(pts), jnp.asarray(scene.intrinsic.astype(dtype)),
        jnp.asarray(ext), jnp.asarray(depth),
        jnp.asarray(ivalid), jnp.asarray(pvalid),
    )), n_pad)
    return vis[: scene.num_images, : scene.num_points]


@functools.lru_cache(maxsize=32)
def _hybrid_fn(i_pad: int, n_pad: int, depth_hw: tuple, image_hw: tuple):
    @jax.jit
    def fn(points, K, extrinsics, depth_maps, image_valid, point_valid):
        vis, near = G.visibility_and_borderline(
            points, K, extrinsics, depth_maps, image_hw,
            image_valid, point_valid)
        return _packbits(vis), _packbits(near)

    return fn


def _hybrid_dispatch(scene: Scene, image_chunk: int | None = None):
    """Upload + dispatch every hybrid chunk of a scene WITHOUT fetching.

    jax dispatch is async: the returned handles' uploads/compute proceed
    in the background, so a caller can start the next scene (or do host
    work) while this scene's 182 MB of depth rides the interconnect.
    Returns (handles, fn_chunk) for :func:`_hybrid_finalize`."""
    pts, pvalid = scene.padded_points(np.float32)
    ext, depth, ivalid = scene.padded_images(np.float32)
    i_pad, n_pad = ext.shape[0], pts.shape[0]
    # chunk at HALF the f32 budget: the host-side exact fix-up of chunk k
    # overlaps chunk k+1's upload/compute (all chunks are dispatched
    # before any fetch), which a single monolithic dispatch cannot do
    budget = _PAIR_BUDGET_F32 // 2
    if image_chunk is None and i_pad * n_pad > budget:
        image_chunk = max(8, (budget // n_pad) // 8 * 8)
    fn_chunk = image_chunk if image_chunk and image_chunk < i_pad else i_pad
    n_chunks = -(-i_pad // fn_chunk)
    tot = n_chunks * fn_chunk
    if tot > i_pad:
        ext = np.concatenate(
            [ext, np.tile(np.eye(4, dtype=ext.dtype), (tot - i_pad, 1, 1))])
        depth = np.concatenate(
            [depth, np.zeros((tot - i_pad,) + depth.shape[1:],
                             dtype=depth.dtype)])
        ivalid = np.concatenate([ivalid, np.zeros(tot - i_pad, dtype=bool)])
    fn = _hybrid_fn(fn_chunk, n_pad, scene.depth_hw, scene.image_hw)
    pts_d = jnp.asarray(pts)
    K_d = jnp.asarray(scene.intrinsic.astype(np.float32))
    pv_d = jnp.asarray(pvalid)
    # dispatch EVERY chunk before fetching any: jax dispatch is async, so
    # uploads/compute of later chunks overlap the host-side fetch +
    # exact fix-up of earlier ones (the fix-up is pure numpy)
    handles = [
        fn(pts_d, K_d, jnp.asarray(ext[lo: lo + fn_chunk]),
           jnp.asarray(depth[lo: lo + fn_chunk]),
           jnp.asarray(ivalid[lo: lo + fn_chunk]), pv_d)
        for lo in range(0, tot, fn_chunk)
    ]
    return handles, fn_chunk


def _hybrid_finalize(scene: Scene, handles, fn_chunk: int) -> np.ndarray:
    """Fetch the dispatched chunks and run the exact f64 host fix-up."""
    from ..core.synthetic import np_project_points

    n_pad = handles[0][0].shape[1] * 8
    h, w = scene.image_hw
    hd, wd = scene.depth_hw
    vis_rows = []
    for ci, (v, nr) in enumerate(handles):
        base = ci * fn_chunk
        n_rows = min(fn_chunk, scene.num_images - base)
        if n_rows <= 0:
            break
        vis_c = _unpackbits(np.asarray(v), n_pad)[
            :n_rows, : scene.num_points]
        near_c = _unpackbits(np.asarray(nr), n_pad)[
            :n_rows, : scene.num_points]
        # exact f64 host fix-up of the flagged bits, grouped per image
        for r in np.where(near_c.any(axis=1))[0]:
            i = base + int(r)
            cols = np.where(near_c[r])[0]
            E = scene.extrinsic_align(i)
            xy, d = np_project_points(
                scene.points_aligned[cols, :3], scene.intrinsic, E)
            x, y = xy[:, 0], xy[:, 1]
            inb = (x >= 0) & (x < w) & (y >= 0) & (y < h)
            # x * (wd/w) order matters at exact .5 boundaries (see
            # engines/depth_perception._project_many)
            sx, sy = wd / w, hd / h
            dxi = np.clip(np.round(x * sx), 0, wd - 1).astype(np.int64)
            dyi = np.clip(np.round(y * sy), 0, hd - 1).astype(np.int64)
            dv = scene.depth_maps[i][dyi, dxi] * 0.001
            vis_c[r, cols] = inb & (d > 0) & (d < dv)
        vis_rows.append(vis_c)
    return np.concatenate(vis_rows)


def compute_scene_visibility_hybrid(
    scene: Scene, image_chunk: int | None = None
) -> np.ndarray:
    """Exact-parity visibility WITHOUT the f64-emulation cost.

    One true-f32 device pass computes the matrix plus a conservative
    borderline mask (core/geometry.visibility_and_borderline); the tiny
    flagged fraction — pairs within f32 rounding distance of a comparison
    boundary (~2%) — is recomputed exactly on host in numpy f64, i.e. the
    very computation the reference runs. Result is bit-equal to the numpy
    oracle on every backend — including TPU, where even the emulated-f64
    path flips ~7 ppm of exact-boundary bits (its division is not
    correctly rounded). Equals `compute_scene_visibility(scene, float64)`
    exactly on CPU.
    """
    handles, fn_chunk = _hybrid_dispatch(scene, image_chunk)
    return _hybrid_finalize(scene, handles, fn_chunk)


@functools.lru_cache(maxsize=32)
def _visibility_batch_fn(s: int, i_pad: int, n_pad: int, depth_hw: tuple,
                         image_hw: tuple, dtype_name: str):
    @jax.jit
    def fn(points, K, extrinsics, depth_maps, image_valid, point_valid):
        return _packbits(jax.vmap(
            lambda p, k, e, d, iv, pv: G.visibility_matrix(
                p, k, e, d, image_hw, iv, pv)
        )(points, K, extrinsics, depth_maps, image_valid, point_valid))

    return fn


def compute_visibility_batch(
    scenes: "list[Scene]", dtype=np.float64, batch_size: int = 8
) -> dict[str, np.ndarray]:
    """Visibility matrices for many scenes with batched device dispatch.

    Scenes are grouped by padded shape and vmapped `batch_size` at a time
    — one device round-trip per group chunk instead of one per scene
    (dispatch/transfer latency dominates small scenes on interconnects
    slower than PCIe). Returns {scene_id: [I, N] bool}.
    """
    ensure_x64(dtype)
    groups: dict[tuple, list[Scene]] = {}
    out: dict[str, np.ndarray] = {}
    for scene in scenes:
        n_pad = ((max(scene.num_points, 1) + 127) // 128) * 128
        i_pad = ((max(scene.num_images, 1) + 7) // 8) * 8
        key = (i_pad, n_pad, scene.depth_hw, scene.image_hw)
        groups.setdefault(key, []).append(scene)

    for (i_pad, n_pad, depth_hw, image_hw), members in groups.items():
        for lo in range(0, len(members), batch_size):
            chunk = members[lo: lo + batch_size]
            s = len(chunk)
            pts = np.empty((s, n_pad, 3), dtype=dtype)
            pvalid = np.empty((s, n_pad), dtype=bool)
            Ks = np.empty((s, 4, 4), dtype=dtype)
            exts = np.empty((s, i_pad, 4, 4), dtype=dtype)
            depths = np.empty((s, i_pad) + depth_hw, dtype=np.uint16)
            ivalid = np.empty((s, i_pad), dtype=bool)
            for j, scene in enumerate(chunk):
                pts[j], pvalid[j] = scene.padded_points(dtype)
                exts[j], depths[j], ivalid[j] = scene.padded_images(dtype)
                Ks[j] = scene.intrinsic.astype(dtype)
            fn = _visibility_batch_fn(
                s, i_pad, n_pad, depth_hw, image_hw, np.dtype(dtype).name)
            vis = _unpackbits(np.asarray(fn(
                jnp.asarray(pts), jnp.asarray(Ks), jnp.asarray(exts),
                jnp.asarray(depths), jnp.asarray(ivalid),
                jnp.asarray(pvalid))), n_pad)
            for j, scene in enumerate(chunk):
                out[scene.scene_id] = vis[
                    j, : scene.num_images, : scene.num_points]
    return out


@functools.lru_cache(maxsize=32)
def _multichip_fn(mesh, image_hw: tuple):
    """Compiled shard_map visibility program per (mesh, image shape) —
    cached so repeated stage calls reuse the lowered program (the compile
    service costs 20 s-15 min per program on the dev tunnel)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import shard_map_compat

    axis = mesh.axis_names[0]

    def local(points, K, ext, depth, ivalid, pvalid):
        vis = jax.vmap(
            lambda p, k, e, d, iv, pv: G.visibility_matrix(
                p, k, e, d, image_hw, iv, pv)
        )(points, K, ext, depth, ivalid, pvalid)
        return _packbits(vis)

    return jax.jit(shard_map_compat(
        local, mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis)))


def compute_visibility_multichip(
    scenes: "list[Scene]",
    mesh,
    dtype=np.float64,
    per_device_batch: int = 4,
) -> dict[str, np.ndarray]:
    """Scene-parallel visibility across every device of a mesh.

    The heaviest stage of the data engine (BASELINE.md: 3 h train split
    on 25 CPU procs) scales scene-parallel: scenes grouped by padded
    shape are stacked `[n_devices * per_device_batch, ...]`, sharded over
    the mesh's leading axis with `shard_map`, and each device runs the
    same fused visibility program on its shard — the multi-chip
    incarnation of `compute_visibility_batch` (same float64 exact-parity
    default, bit-identical results, test-asserted on the 8-device CPU
    mesh). Groups smaller than one full sharded batch pad with dummy
    scenes whose rows are dropped.
    """
    ensure_x64(dtype)
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    batch = n_dev * per_device_batch

    groups: dict[tuple, list[Scene]] = {}
    for scene in scenes:
        n_pad = ((max(scene.num_points, 1) + 127) // 128) * 128
        i_pad = ((max(scene.num_images, 1) + 7) // 8) * 8
        key = (i_pad, n_pad, scene.depth_hw, scene.image_hw)
        groups.setdefault(key, []).append(scene)

    out: dict[str, np.ndarray] = {}
    for (i_pad, n_pad, depth_hw, image_hw), members in groups.items():
        fn = _multichip_fn(mesh, tuple(image_hw))

        for lo in range(0, len(members), batch):
            chunk = members[lo: lo + batch]
            s = len(chunk)
            pts = np.zeros((batch, n_pad, 3), dtype=dtype)
            pvalid = np.zeros((batch, n_pad), dtype=bool)
            Ks = np.tile(np.eye(4, dtype=dtype), (batch, 1, 1))
            exts = np.tile(np.eye(4, dtype=dtype), (batch, i_pad, 1, 1))
            depths = np.zeros((batch, i_pad) + depth_hw, dtype=np.uint16)
            ivalid = np.zeros((batch, i_pad), dtype=bool)
            for j, scene in enumerate(chunk):
                pts[j], pvalid[j] = scene.padded_points(dtype)
                exts[j], depths[j], ivalid[j] = scene.padded_images(dtype)
                Ks[j] = scene.intrinsic.astype(dtype)
            packed = np.asarray(fn(
                jnp.asarray(pts), jnp.asarray(Ks), jnp.asarray(exts),
                jnp.asarray(depths), jnp.asarray(ivalid),
                jnp.asarray(pvalid)))
            vis = _unpackbits(packed, n_pad)
            for j, scene in enumerate(chunk):
                out[scene.scene_id] = vis[
                    j, : scene.num_images, : scene.num_points]
    return out


class VisibilityIndex:
    """In-memory visibility index over many scenes.

    Stores the dense bool matrix per scene — it is both maps at once —
    and speaks the reference's parquet key/value dialect at the edges.
    """

    def __init__(self):
        self._matrices: dict[str, np.ndarray] = {}
        self._image_ids: dict[str, list[str]] = {}
        self._id_rows: dict[str, dict[str, int]] = {}

    # -- construction ---------------------------------------------------

    def add_scene(self, scene_id: str, image_ids: list[str], vis: np.ndarray):
        self._matrices[scene_id] = vis.astype(bool)
        self._image_ids[scene_id] = list(image_ids)
        self._id_rows[scene_id] = {iid: i for i, iid in enumerate(image_ids)}

    @staticmethod
    def build(
        scenes: Iterable[Scene],
        dtype=np.float64,
        warning_sink: WarningSink | None = None,
    ) -> "VisibilityIndex":
        index = VisibilityIndex()
        for scene in scenes:
            vis = compute_scene_visibility(scene, dtype)
            if warning_sink is not None:
                valid = scene.valid_image_mask()
                for i, iid in enumerate(scene.image_ids):
                    if valid[i] and not vis[i].any():
                        warning_sink(
                            f"[Warning] {scene.scene_id}: {iid} has no in-bound points."
                        )
            index.add_scene(scene.scene_id, scene.image_ids, vis)
        return index

    # -- queries (VisibilityInfoHandler parity) -------------------------

    def scene_ids(self) -> list[str]:
        return sorted(self._matrices.keys())

    def matrix(self, scene_id: str) -> np.ndarray:
        return self._matrices[scene_id]

    def image_ids(self, scene_id: str) -> list[str]:
        return self._image_ids[scene_id]

    def image_to_points(self, scene_id: str, image_id: str) -> np.ndarray:
        """Point indices visible in an image (info_handler.py:502-519)."""
        row = self._id_rows[scene_id][f"{int(image_id):05d}"]
        return np.where(self._matrices[scene_id][row])[0]

    def point_to_images(self, scene_id: str, point_index: int) -> list[str]:
        """Image ids that see a point (info_handler.py:521-538)."""
        col = self._matrices[scene_id][:, point_index]
        return [iid for iid, v in zip(self._image_ids[scene_id], col) if v]

    def common_points(self, scene_id: str, image_id1: str, image_id2: str) -> np.ndarray:
        """Intersection of two images' visible-point sets (replaces
        np.intersect1d over JSON lists, coor_2_coor engine :300-306)."""
        rows = self._id_rows[scene_id]
        m = self._matrices[scene_id]
        r1 = rows[f"{int(image_id1):05d}"]
        r2 = rows[f"{int(image_id2):05d}"]
        return np.where(m[r1] & m[r2])[0]

    # -- persistence ----------------------------------------------------

    def to_parquet(self, path: str) -> int:
        """Reference-dialect parquet (colon keys, JSON-list values)."""
        import pandas as pd

        rows = []
        for scene_id in self.scene_ids():
            m = self._matrices[scene_id]
            ids = self._image_ids[scene_id]
            for i, iid in enumerate(ids):
                rows.append(
                    (f"{scene_id}:image_to_points:{iid}",
                     json.dumps(np.where(m[i])[0].tolist()))
                )
            for p in range(m.shape[1]):
                rows.append(
                    (f"{scene_id}:point_to_images:{p}",
                     json.dumps([ids[i] for i in np.where(m[:, p])[0]]))
                )
        df = pd.DataFrame(rows, columns=["key", "values"])
        write_parquet(df, path)
        return len(df)

    def save_npz(self, path: str) -> None:
        """Compact native format: packed bitmaps per scene."""
        payload = {}
        for scene_id in self.scene_ids():
            m = self._matrices[scene_id]
            payload[f"{scene_id}__bits"] = np.packbits(m, axis=1)
            payload[f"{scene_id}__shape"] = np.asarray(m.shape)
            payload[f"{scene_id}__ids"] = np.asarray(self._image_ids[scene_id])
        np.savez_compressed(path, **payload)

    @staticmethod
    def load_npz(path: str) -> "VisibilityIndex":
        z = np.load(path, allow_pickle=False)
        index = VisibilityIndex()
        scene_ids = {k[: -len("__bits")] for k in z.files if k.endswith("__bits")}
        for sid in sorted(scene_ids):
            shape = tuple(z[f"{sid}__shape"])
            bits = np.unpackbits(z[f"{sid}__bits"], axis=1)[:, : shape[1]]
            index.add_scene(sid, [str(s) for s in z[f"{sid}__ids"]], bits.astype(bool))
        return index

    @staticmethod
    def from_parquet(path: str) -> "VisibilityIndex":
        """Load a reference-dialect parquet (colon keys, JSON values)."""
        import pandas as pd

        df = pd.read_parquet(path)
        per_scene: dict[str, dict[str, list[int]]] = {}
        for key, value in zip(df["key"], df["values"]):
            scene_id, kind, entity = key.split(":")
            if kind != "image_to_points":
                continue  # transpose is redundant
            per_scene.setdefault(scene_id, {})[entity] = json.loads(value)
        index = VisibilityIndex()
        for scene_id, img_map in per_scene.items():
            ids = sorted(img_map.keys())
            n_points = max(
                (max(v) + 1 for v in img_map.values() if v), default=0
            )
            m = np.zeros((len(ids), n_points), dtype=bool)
            for i, iid in enumerate(ids):
                m[i, img_map[iid]] = True
            index.add_scene(scene_id, ids, m)
        return index
