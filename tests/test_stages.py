"""Tests for the L3 stages: visibility index, frame relations, object
visibility, coverage search. Oracles reimplement the reference flows with
sets/boolean masks (make_visibility_info.py, calculate_frames_relations.py,
compute_object_visibility.py, single_object_coverage_finder.py)."""

import numpy as np
import pytest

from multi_spatialmllm_tpu.core.synthetic import make_scene, np_project_points
from multi_spatialmllm_tpu.stages.visibility import (
    VisibilityIndex,
    compute_scene_visibility,
)
from multi_spatialmllm_tpu.stages.frame_relations import (
    build_frame_relations,
    compute_scene_relations,
    scene_relation_records,
)
from multi_spatialmllm_tpu.stages.object_visibility import (
    compute_object_visibility,
    object_image_counts,
)
from multi_spatialmllm_tpu.stages import coverage as C


@pytest.fixture(scope="module")
def scene():
    return make_scene(seed=2, n_images=10, n_background=3000, n_objects=3)


@pytest.fixture(scope="module")
def vis(scene):
    return compute_scene_visibility(scene)


class TestVisibilityIndex:
    def test_matrix_shape(self, scene, vis):
        assert vis.shape == (scene.num_images, scene.num_points)
        # poisoned pose row must be empty
        assert not vis[~scene.valid_image_mask()].any()

    def test_queries(self, scene, vis):
        idx = VisibilityIndex()
        idx.add_scene(scene.scene_id, scene.image_ids, vis)
        i = int(np.argmax(vis.sum(axis=1)))
        pts = idx.image_to_points(scene.scene_id, scene.image_ids[i])
        np.testing.assert_array_equal(pts, np.where(vis[i])[0])
        p = int(pts[0])
        imgs = idx.point_to_images(scene.scene_id, p)
        assert scene.image_ids[i] in imgs
        # common points = AND of rows
        j = (i + 1) % scene.num_images
        common = idx.common_points(
            scene.scene_id, scene.image_ids[i], scene.image_ids[j])
        np.testing.assert_array_equal(common, np.where(vis[i] & vis[j])[0])

    def test_parquet_roundtrip(self, scene, vis, tmp_path):
        idx = VisibilityIndex()
        idx.add_scene(scene.scene_id, scene.image_ids, vis)
        path = str(tmp_path / "vis.parquet")
        n = idx.to_parquet(path)
        assert n == scene.num_images + scene.num_points
        idx2 = VisibilityIndex.from_parquet(path)
        m2 = idx2.matrix(scene.scene_id)
        # column count may shrink to the max visible point index + 1
        np.testing.assert_array_equal(m2, vis[:, : m2.shape[1]])
        assert vis[:, m2.shape[1]:].sum() == 0

    def test_npz_roundtrip(self, scene, vis, tmp_path):
        idx = VisibilityIndex()
        idx.add_scene(scene.scene_id, scene.image_ids, vis)
        path = str(tmp_path / "vis.npz")
        idx.save_npz(path)
        idx2 = VisibilityIndex.load_npz(path)
        np.testing.assert_array_equal(idx2.matrix(scene.scene_id), vis)
        assert idx2.image_ids(scene.scene_id) == scene.image_ids

    def test_reference_parquet_dialect(self, scene, vis, tmp_path):
        import pandas as pd
        import json

        idx = VisibilityIndex()
        idx.add_scene(scene.scene_id, scene.image_ids, vis)
        path = str(tmp_path / "vis.parquet")
        idx.to_parquet(path)
        df = pd.read_parquet(path)
        assert list(df.columns) == ["key", "values"]
        key = f"{scene.scene_id}:image_to_points:{scene.image_ids[0]}"
        row = df[df["key"] == key]
        assert len(row) == 1
        assert json.loads(row["values"].iloc[0]) == np.where(vis[0])[0].tolist()


class TestFrameRelations:
    def test_records_vs_pairwise_oracle(self, scene, vis):
        rel = compute_scene_relations(scene, vis=vis)
        rec = scene_relation_records(scene, rel)
        ids = scene.image_ids
        valid = scene.valid_image_mask()
        # Oracle: reference per-pair computation.
        k = 0
        vidx = np.where(valid)[0]
        for a in range(len(vidx)):
            for b in range(a + 1, len(vidx)):
                i, j = vidx[a], vidx[b]
                assert rec["image_id1"][k] == ids[i]
                assert rec["image_id2"][k] == ids[j]
                inter = np.logical_and(vis[i], vis[j]).sum()
                union = np.logical_or(vis[i], vis[j]).sum()
                expect = inter / union * 100 if union else 0.0
                np.testing.assert_allclose(rec["overlap"][k], expect, atol=1e-9)
                E1 = scene.axis_align @ scene.extrinsics[i]
                E2 = scene.axis_align @ scene.extrinsics[j]
                np.testing.assert_allclose(
                    rec["distance"][k],
                    np.linalg.norm(E2[:3, 3] - E1[:3, 3]), atol=1e-9)
                for E, col in ((E1, None), (E2, None)):
                    pass
                z1, z2 = E1[:3, 2], E2[:3, 2]
                yaw1 = np.degrees(np.arctan2(z1[1], z1[0]))
                yaw2 = np.degrees(np.arctan2(z2[1], z2[0]))
                np.testing.assert_allclose(rec["yaw"][k], yaw2 - yaw1, atol=1e-9)
                k += 1
        assert k == len(rec["overlap"])

    def test_parquet_outputs(self, scene, tmp_path):
        out = str(tmp_path / "rel.parquet")
        df = build_frame_relations([scene], output_parquet=out)
        import pandas as pd

        full = pd.read_parquet(out)
        nonzero = pd.read_parquet(str(tmp_path / "rel_nonzero.parquet"))
        assert list(full.columns) == [
            "scene_id", "image_id1", "image_id2", "overlap", "distance",
            "yaw", "pitch"]
        assert len(full) == len(df)
        assert (nonzero["overlap"] != 0).all()
        assert len(nonzero) == (full["overlap"] != 0).sum()


class TestObjectVisibility:
    def test_counts_vs_set_oracle(self, scene, vis):
        counts = object_image_counts(scene, vis)
        for o in range(scene.num_objects):
            obj_set = set(scene.object_point_index(o).tolist())
            for i in range(scene.num_images):
                expect = len(obj_set & set(np.where(vis[i])[0].tolist()))
                assert counts[i, o] == expect

    def test_schema_and_threshold(self, scene, vis):
        res = compute_object_visibility(scene, vis)
        assert set(res.keys()) == {"object_to_images", "image_to_objects"}
        for o, lst in res["object_to_images"].items():
            total = len(scene.object_point_index(o))
            thr = max(1, int(0.05 * total))
            for entry in lst:
                assert entry["intersection_count"] >= thr
                np.testing.assert_allclose(
                    entry["visibility"],
                    entry["intersection_count"] / total * 100)
        # inverse map is consistent
        for img, lst in res["image_to_objects"].items():
            for entry in lst:
                o = entry["object_id"]
                assert any(e["image_id"] == img
                           for e in res["object_to_images"][o])

    def test_noninformative_skipped(self, scene, vis):
        scene.categories[0] = "wall"
        try:
            res = compute_object_visibility(scene, vis)
            assert 0 not in res["object_to_images"]
        finally:
            scene.categories[0] = "chair"


# ---------------------------------------------------------------------------
# Coverage search: mask-based oracle implementing the same BFS on full
# boolean masks (the reference's representation) to cross-check the
# interval-based implementation.
# ---------------------------------------------------------------------------

def _oracle_bfs(image_masks, coords, target, tol=0.1, max_images=5):
    n = len(image_masks)

    def cover(mask):
        if not mask.any():
            return False
        c = coords[mask]
        return abs((c.max() - c.min()) - target) <= tol * target

    suffix = [None] * n
    if n:
        suffix[-1] = image_masks[-1].copy()
        for i in range(n - 2, -1, -1):
            suffix[i] = image_masks[i] | suffix[i + 1]

    minimal_sets = []
    solutions = {}
    first_layer = []
    current = [((i,), image_masks[i], i, 1 << i) for i in range(n)]
    k = 1
    while k <= max_images and current:
        to_expand, new_min = [], []
        for comb, um, last, bits in current:
            if any((m & bits) == m for m in minimal_sets):
                continue
            if cover(um):
                new_min.append(bits)
                solutions.setdefault(k, []).append(comb)
            else:
                if last < n - 1 and not cover(um | suffix[last]):
                    continue
                to_expand.append((comb, um, last, bits))
                if k == 1:
                    first_layer.append((comb[0], image_masks[comb[0]], 1 << comb[0]))
        minimal_sets.extend(new_min)
        nxt = []
        if k < max_images:
            for comb, um, last, bits in to_expand:
                for idx, m, b in first_layer:
                    if idx > last:
                        nxt.append((comb + (idx,), um | m, idx, bits | b))
        current = nxt
        k += 1
    return solutions


class TestCoverage:
    def test_intervals_vs_masked_oracle(self, scene, vis):
        mins, maxs, cnt = C.object_coverage_intervals(scene, vis)
        for o in range(scene.num_objects):
            om = scene.object_point_mask(o)
            for i in range(scene.num_images):
                m = vis[i] & om
                assert cnt[i, o + 1] == m.sum()
                for axis in range(3):
                    if m.any():
                        c = scene.points_aligned[m, axis]
                        np.testing.assert_allclose(mins[i, axis, o + 1], c.min())
                        np.testing.assert_allclose(maxs[i, axis, o + 1], c.max())
                    else:
                        assert mins[i, axis, o + 1] == np.inf
                        assert maxs[i, axis, o + 1] == -np.inf

    def test_bfs_matches_mask_oracle(self, rng):
        # Random small instances, no caps triggered -> exact match expected.
        for trial in range(10):
            n_imgs, n_pts = 8, 60
            coords = rng.normal(size=n_pts)
            masks = [rng.random(n_pts) < 0.3 for _ in range(n_imgs)]
            target = float(coords.max() - coords.min()) * rng.uniform(0.5, 1.0)
            lows = np.array([coords[m].min() if m.any() else np.inf for m in masks])
            highs = np.array([coords[m].max() if m.any() else -np.inf for m in masks])
            ids = [f"{i:05d}" for i in range(n_imgs)]
            got = C.find_minimal_combinations(
                ids, lows, highs, target, np.random.default_rng(0))
            expect = _oracle_bfs(masks, coords, target)
            assert set(got.keys()) == set(expect.keys()), f"trial {trial}"
            for k in expect:
                exp_ids = {tuple(ids[i] for i in comb) for comb in expect[k]}
                assert set(got[k]) == exp_ids, f"trial {trial} k={k}"

    def test_full_stage_on_scene(self, scene, vis):
        from multi_spatialmllm_tpu.stages.object_visibility import (
            compute_object_visibility,
        )

        ov = {scene.scene_id: compute_object_visibility(scene, vis)}
        h, l, w = C.build_object_coverage(
            [scene], ov, visibility={scene.scene_id: vis})
        assert scene.scene_id in h
        # every reported combination must actually cover its target
        for dim, res, target_fn, axis_fn in (
            ("height", h, scene.object_height, lambda o: 2),
            ("length", l, scene.object_length, scene.object_length_axis),
            ("width", w, scene.object_width, scene.object_width_axis),
        ):
            for o, kdict in res[scene.scene_id].items():
                axis = axis_fn(o)
                target = target_fn(o)
                om = scene.object_point_mask(o)
                for k, combos in kdict.items():
                    for combo in combos:
                        assert len(combo) == k
                        union = np.zeros(scene.num_points, bool)
                        for img in combo:
                            union |= vis[scene.image_index(img)] & om
                        c = scene.points_aligned[union, axis]
                        cov = c.max() - c.min()
                        assert abs(cov - target) <= 0.1 * target + 1e-12

    def test_merge_shards(self):
        a = {"s1": {0: {1: [("a",)]}}}
        b = {"s1": {1: {1: [("b",)]}}, "s2": {0: {}}}
        m = C.merge_coverage_shards([a, b])
        assert set(m["s1"].keys()) == {0, 1} and "s2" in m


class TestBatchedVisibility:
    def test_batch_matches_per_scene(self):
        from multi_spatialmllm_tpu.stages.visibility import (
            compute_scene_visibility,
            compute_visibility_batch,
        )

        scenes = [make_scene(scene_id=f"vb{i}_00", seed=50 + i,
                             n_images=10, n_background=2000, n_objects=2)
                  for i in range(3)]
        # a different-shape scene exercises the grouping path
        scenes.append(make_scene(scene_id="vb_odd_00", seed=60, n_images=6,
                                 n_background=1500, n_objects=2))
        batch = compute_visibility_batch(scenes, batch_size=2)
        assert set(batch) == {s.scene_id for s in scenes}
        for s in scenes:
            single = compute_scene_visibility(s)
            np.testing.assert_array_equal(batch[s.scene_id], single)

    def test_image_chunked_matches_fused(self):
        """Large scenes dispatch in image chunks (HBM pair budget); the
        chunked result must equal the single fused program bit-for-bit,
        including when the image axis needs padding to a chunk multiple."""
        from multi_spatialmllm_tpu.stages.visibility import (
            compute_scene_visibility,
        )

        s = make_scene(scene_id="vchunk_00", seed=77, n_images=14,
                       n_background=3000, n_objects=2)
        fused = compute_scene_visibility(s)
        for chunk in (4, 8, 16):  # 16 pads the image axis
            chunked = compute_scene_visibility(s, image_chunk=chunk)
            np.testing.assert_array_equal(chunked, fused)


def _numpy_visibility_oracle(s):
    """The reference's own arithmetic in numpy f64 — exact on every
    backend (the TPU's EMULATED f64 can flip last-ulp boundary bits, so
    the device-f64 stage is not a safe oracle there; see PARITY.md)."""
    h, w = s.image_hw
    hd, wd = s.depth_hw
    sx, sy = wd / w, hd / h
    out = np.zeros((s.num_images, s.num_points), bool)
    valid = s.valid_image_mask()
    for i in range(s.num_images):
        if not valid[i]:
            continue
        E = s.extrinsic_align(i)
        xy, d = np_project_points(s.points_aligned[:, :3], s.intrinsic, E)
        x, y = xy[:, 0], xy[:, 1]
        inb = (x >= 0) & (x < w) & (y >= 0) & (y < h)
        dxi = np.clip(np.round(x * sx), 0, wd - 1).astype(np.int64)
        dyi = np.clip(np.round(y * sy), 0, hd - 1).astype(np.int64)
        dv = s.depth_maps[i][dyi, dxi] * 0.001
        out[i] = inb & (d > 0) & (d < dv)
    return out


class TestHybridVisibility:
    def test_hybrid_equals_numpy_oracle_bit_for_bit(self):
        """f32 pass + f64 borderline fix-up == the reference's numpy math,
        exactly — on synthetic scenes whose surface points sit ON
        depth-compare cliffs by construction (the stress case that flips
        ~5% of plain-f32 labels)."""
        from multi_spatialmllm_tpu.stages.visibility import (
            compute_scene_visibility,
            compute_scene_visibility_hybrid,
        )

        from multi_spatialmllm_tpu.core import geometry as G

        for seed in (3, 19, 77):
            s = make_scene(scene_id=f"hyb{seed:04d}_00", seed=seed,
                           n_images=12, n_background=3000, n_objects=3,
                           n_invalid_poses=1)
            exact = _numpy_visibility_oracle(s)
            hybrid = compute_scene_visibility_hybrid(s)
            np.testing.assert_array_equal(hybrid, exact)
            # sanity: the borderline mask actually flags pairs (the fix-up
            # path runs) — synthetic surface points sit on depth cliffs
            pts, pv = s.padded_points(np.float32)
            ext, depth, iv = s.padded_images(np.float32)
            import jax.numpy as jnp
            _, near = G.visibility_and_borderline(
                jnp.asarray(pts), jnp.asarray(s.intrinsic.astype(np.float32)),
                jnp.asarray(ext), jnp.asarray(depth), s.image_hw,
                jnp.asarray(iv), jnp.asarray(pv))
            assert int(np.asarray(near).sum()) > 0

    def test_hybrid_chunked_matches(self):
        from multi_spatialmllm_tpu.stages.visibility import (
            compute_scene_visibility,
            compute_scene_visibility_hybrid,
        )

        s = make_scene(scene_id="hybc0000_00", seed=5, n_images=14,
                       n_background=2500, n_objects=2)
        exact = _numpy_visibility_oracle(s)
        for chunk in (4, 8):
            np.testing.assert_array_equal(
                compute_scene_visibility_hybrid(s, image_chunk=chunk),
                exact)


class TestMultichipVisibility:
    def test_sharded_equals_per_scene(self):
        """Scene-parallel visibility over the 8-device mesh: bit-identical
        to the single-device per-scene stage."""
        import jax as _jax

        if len(_jax.devices()) < 8 or _jax.default_backend() != "cpu":
            pytest.skip("needs the 8-device CPU mesh (scripts/test.sh)")
        from jax.sharding import Mesh

        from multi_spatialmllm_tpu.stages.visibility import (
            compute_visibility_multichip,
        )

        scenes = [make_scene(scene_id=f"mc{i:04d}_00", seed=90 + i,
                             n_images=10, n_background=2000, n_objects=2)
                  for i in range(11)]  # not a multiple of 8: pad path
        mesh = Mesh(np.asarray(_jax.devices()[:8]), ("data",))
        got = compute_visibility_multichip(scenes, mesh, dtype=np.float32,
                                           per_device_batch=1)
        assert set(got) == {s.scene_id for s in scenes}
        for s in scenes:
            single = compute_scene_visibility(s, np.float32)
            np.testing.assert_array_equal(got[s.scene_id], single)


class TestMultichipRelationsAndCoverage:
    """Scene-parallel frame relations + coverage intervals over the mesh
    data axis (the reference's 25-process relation Pool and
    process-per-10-scenes coverage fan-out): results must equal the
    single-device stages exactly."""

    @pytest.fixture()
    def mesh8(self):
        import jax as _jax

        if len(_jax.devices()) < 8 or _jax.default_backend() != "cpu":
            pytest.skip("needs the 8-device CPU mesh (scripts/test.sh)")
        from jax.sharding import Mesh

        return Mesh(np.asarray(_jax.devices()[:8]), ("data",))

    def _scenes(self):
        scenes = [make_scene(scene_id=f"mcr{i:04d}_00", seed=60 + i,
                             n_images=10, n_background=2000, n_objects=2,
                             n_invalid_poses=1)
                  for i in range(9)]  # not a multiple of 8: pad path
        vis = {s.scene_id: compute_scene_visibility(s, np.float32)
               for s in scenes}
        return scenes, vis

    def test_relations_sharded_equals_per_scene(self, mesh8):
        from multi_spatialmllm_tpu.stages.frame_relations import (
            compute_relations_multichip,
            compute_scene_relations,
        )

        scenes, vis = self._scenes()
        got = compute_relations_multichip(scenes, mesh8, vis,
                                          dtype=np.float32,
                                          per_device_batch=1)
        assert set(got) == {s.scene_id for s in scenes}
        for s in scenes:
            single = compute_scene_relations(s, vis=vis[s.scene_id],
                                             dtype=np.float32)
            assert set(got[s.scene_id]) == set(single)
            for k, v in single.items():
                np.testing.assert_array_equal(got[s.scene_id][k], v)

    def test_coverage_sharded_equals_per_scene(self, mesh8):
        from multi_spatialmllm_tpu.stages.coverage import (
            build_object_coverage,
            coverage_intervals_multichip,
            object_coverage_intervals,
        )
        from multi_spatialmllm_tpu.stages.object_visibility import (
            build_object_visibility,
        )

        # no scenes (e.g. visibility built from a different split) must
        # return empty like the single-device path, not crash on max()
        assert coverage_intervals_multichip([], mesh8, {}) == {}

        scenes, vis = self._scenes()
        intervals = coverage_intervals_multichip(scenes, mesh8, vis)
        for s in scenes:
            mins, maxs, cnt = object_coverage_intervals(s,
                                                        vis[s.scene_id])
            np.testing.assert_array_equal(intervals[s.scene_id][0], mins)
            np.testing.assert_array_equal(intervals[s.scene_id][1], maxs)
            np.testing.assert_array_equal(intervals[s.scene_id][2], cnt)

        ovis = build_object_visibility(scenes, visibility=vis)
        cov_mc = build_object_coverage(scenes, ovis, visibility=vis,
                                       mesh=mesh8)
        cov_single = build_object_coverage(scenes, ovis, visibility=vis)
        assert cov_mc == cov_single

    def test_object_visibility_sharded_equals_per_scene(self, mesh8):
        """Scene-parallel object visibility (the last L3 stage without a
        multichip variant) equals the sequential builder exactly —
        counts are 0/1 sums, exact in f32 at any reduction order."""
        from multi_spatialmllm_tpu.stages.object_visibility import (
            build_object_visibility,
            object_visibility_multichip,
        )

        scenes, vis = self._scenes()
        got = object_visibility_multichip(scenes, mesh8, vis,
                                          per_device_batch=1)
        single = build_object_visibility(scenes, visibility=vis)
        assert got == single


class TestPipelinedSplitProjection:
    def test_pipelined_equals_sequential(self):
        """project_scenes_pipelined (cross-scene overlap of uploads,
        device compute, and host fix-up) must be IDENTICAL to the
        unpipelined hybrid + relations loop — same programs, same
        inputs, only the fetch order changes."""
        from multi_spatialmllm_tpu.stages.frame_relations import (
            compute_scene_relations,
            project_scenes_pipelined,
        )
        from multi_spatialmllm_tpu.stages.visibility import (
            compute_scene_visibility_hybrid,
        )

        scenes = [make_scene(scene_id=f"pp{i:04d}_00", seed=140 + i,
                             n_images=10, n_background=2000, n_objects=2,
                             n_invalid_poses=1)
                  for i in range(3)]
        got = list(project_scenes_pipelined(scenes, dtype=np.float32))
        assert [s.scene_id for s, _, _ in got] == [
            s.scene_id for s in scenes]  # input order preserved
        for s, vis, rel in got:
            vis_seq = compute_scene_visibility_hybrid(s)
            np.testing.assert_array_equal(vis, vis_seq)
            rel_seq = compute_scene_relations(s, vis=vis_seq,
                                              dtype=np.float32)
            assert set(rel) == set(rel_seq)
            for k, v in rel_seq.items():
                np.testing.assert_array_equal(rel[k], v)
        # no-relations mode + single-scene + empty inputs
        got1 = list(project_scenes_pipelined(scenes[:1],
                                             with_relations=False))
        assert len(got1) == 1 and got1[0][2] is None
        np.testing.assert_array_equal(
            got1[0][1], compute_scene_visibility_hybrid(scenes[0]))
        assert list(project_scenes_pipelined([])) == []

    def test_pipelined_f64_enables_x64_fresh_process(self):
        """Regression (r5 review): project_scenes_pipelined must call
        ensure_x64 itself — in a fresh process (jax_enable_x64 off, the
        default) dtype=float64 silently computed float32 relations,
        violating the 'IDENTICAL to the unpipelined stages' contract.
        Runs in a subprocess because any earlier ensure_x64 in this
        suite would mask the bug."""
        import os
        import subprocess
        import sys
        import textwrap

        prog = textwrap.dedent("""
            import numpy as np
            from multi_spatialmllm_tpu.core.synthetic import make_scene
            from multi_spatialmllm_tpu.stages.frame_relations import (
                compute_scene_relations, project_scenes_pipelined)
            s = make_scene(scene_id="f64p0000_00", seed=9, n_images=6,
                           n_background=800, n_objects=2)
            ((_, vis, rel),) = project_scenes_pipelined(
                [s], dtype=np.float64)
            assert rel["distance"].dtype == np.float64, rel[
                "distance"].dtype
            seq = compute_scene_relations(s, vis=vis, dtype=np.float64)
            for k, v in seq.items():
                np.testing.assert_array_equal(rel[k], v)
            print("F64-PIPE-OK")
        """)
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   JAX_PLATFORM_NAME="cpu")
        repo = os.path.join(os.path.dirname(__file__), "..")
        r = subprocess.run([sys.executable, "-c", prog],
                           capture_output=True, text=True, env=env,
                           cwd=repo)
        assert r.returncode == 0 and "F64-PIPE-OK" in r.stdout, (
            r.stderr[-800:])


class TestBatchedRelations:
    def test_batched_matches_per_scene(self):
        """build_frame_relations with precomputed visibility (batched
        dispatch) equals the per-scene path bit for bit."""
        scenes = [make_scene(scene_id=f"br{i:04d}_00", seed=70 + i,
                             n_images=10, n_background=2000, n_objects=2,
                             n_invalid_poses=1)
                  for i in range(3)]
        scenes.append(make_scene(scene_id="br_odd_00", seed=75, n_images=6,
                                 n_background=1500, n_objects=2))
        vis = {s.scene_id: compute_scene_visibility(s, np.float32)
               for s in scenes}
        batched = build_frame_relations(scenes, visibility=vis,
                                        dtype=np.float32)
        # per-scene path: no precomputed visibility for one scene forces it
        import pandas as pd

        from multi_spatialmllm_tpu.stages.frame_relations import (
            compute_scene_relations,
            scene_relation_records,
        )

        frames = []
        for s in scenes:
            rel = compute_scene_relations(s, vis=vis[s.scene_id],
                                          dtype=np.float32)
            frames.append(pd.DataFrame(scene_relation_records(s, rel)))
        single = pd.concat(frames, ignore_index=True)
        assert len(batched) == len(single)
        for col in ("scene_id", "image_id1", "image_id2"):
            assert (batched[col] == single[col]).all()
        for col in ("overlap", "distance", "yaw", "pitch"):
            np.testing.assert_array_equal(batched[col].to_numpy(),
                                          single[col].to_numpy())
