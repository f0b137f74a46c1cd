"""Scene data model + synthetic fixture tests."""

import numpy as np

from multi_spatialmllm_tpu.core.scene import Scene, SceneStore
from multi_spatialmllm_tpu.core.synthetic import make_scene, make_tapvid_npz


class TestSyntheticScene:
    def test_shapes_and_consistency(self, synth_scene):
        s = synth_scene
        assert s.num_images == len(s.extrinsics) == len(s.depth_maps)
        assert s.points_aligned.shape == s.points_unaligned.shape
        assert s.instance_ids.shape[0] == s.num_points
        assert s.num_objects == len(s.categories) == s.aligned_bboxes.shape[0]
        # aligned = axis_align @ unaligned
        pts_h = np.concatenate(
            [s.points_unaligned, np.ones((s.num_points, 1))], axis=1)
        recon = (s.axis_align @ pts_h.T).T[:, :3]
        np.testing.assert_allclose(recon, s.points_aligned, atol=1e-9)

    def test_invalid_pose_masking(self, synth_scene):
        s = synth_scene
        m = s.valid_image_mask()
        assert m.sum() == s.num_images - 1  # one poisoned pose
        assert len(s.valid_image_ids()) == int(m.sum())

    def test_object_accessors(self, synth_scene):
        s = synth_scene
        for k in range(s.num_objects):
            b = s.aligned_bboxes[k]
            assert s.object_height(k) == b[5]
            assert s.object_length(k) == max(b[3], b[4])
            assert s.object_width(k) == min(b[3], b[4])
            assert s.object_width_axis(k) == (0 if b[3] < b[4] else 1)
            assert s.object_length_axis(k) + s.object_width_axis(k) == 1
            idx = s.object_point_index(k)
            assert len(idx) > 0
            # bbox encloses the object's points
            pts = s.points_aligned[idx, :3]
            lo, hi = b[:3] - b[3:6] / 2, b[:3] + b[3:6] / 2
            assert (pts >= lo - 1e-9).all() and (pts <= hi + 1e-9).all()

    def test_padding(self, synth_scene):
        s = synth_scene
        pts, pvalid = s.padded_points()
        assert pts.shape[0] % 128 == 0
        assert pvalid.sum() == s.num_points
        ext, depth, ivalid = s.padded_images()
        assert ext.shape[0] % 8 == 0
        assert np.isfinite(ext).all()  # invalid poses replaced, masked
        assert ivalid.sum() == s.valid_image_mask().sum()

    def test_depth_maps_nonempty(self, synth_scene):
        s = synth_scene
        valid = s.valid_image_mask()
        assert all((s.depth_maps[i] > 0).sum() > 50
                   for i in range(s.num_images) if valid[i])


class TestSceneStore:
    def test_npz_roundtrip(self, synth_scene, tmp_path):
        root = str(tmp_path / "scenes")
        store = SceneStore.write([synth_scene], root)
        assert store.scene_ids() == [synth_scene.scene_id]
        s2 = store.get(synth_scene.scene_id)
        np.testing.assert_array_equal(s2.depth_maps, synth_scene.depth_maps)
        np.testing.assert_allclose(s2.extrinsics, synth_scene.extrinsics)
        assert s2.categories == synth_scene.categories
        assert s2.image_hw == synth_scene.image_hw
        assert isinstance(s2, Scene)


class TestSyntheticTapvid:
    def test_schema(self, tapvid_record):
        r = tapvid_record
        n_frames = r["tracks_XYZ"].shape[0]
        assert r["extrinsics_w2c"].shape == (n_frames, 4, 4)
        assert r["visibility"].shape == r["tracks_XYZ"].shape[:2]
        assert r["fx_fy_cx_cy"].shape == (4,)
        assert len(r["images_jpeg_bytes"]) == n_frames
        assert r["visibility"].sum() > 0

    def test_npz_roundtrip(self, tmp_path):
        path = str(tmp_path / "seq.npz")
        rec = make_tapvid_npz(path, seed=3)
        z = np.load(path, allow_pickle=True)
        np.testing.assert_allclose(z["tracks_XYZ"], rec["tracks_XYZ"])
        assert z["images_jpeg_bytes"].shape[0] == rec["tracks_XYZ"].shape[0]

    def test_static_points_are_static_in_world(self, tapvid_record):
        r = tapvid_record
        # transform camera tracks back to world; last 10 points are static
        c2w = np.linalg.inv(r["extrinsics_w2c"])
        n_frames, n_points, _ = r["tracks_XYZ"].shape
        pts_h = np.concatenate(
            [r["tracks_XYZ"], np.ones((n_frames, n_points, 1))], axis=2)
        world = np.einsum("nij,nkj->nki", c2w, pts_h)[..., :3]
        static = world[:, -10:, :]
        assert np.abs(static - static[0]).max() < 1e-9
