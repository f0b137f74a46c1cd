"""Execute the REFERENCE code itself on a synthetic scene written in its
artifact layout, and compare its outputs with this framework's stages.

The reference (read-only at /root/reference) is imported via importlib with
a minimal mmengine stub; nothing is copied. This is the strongest parity
check available without the real ScanNet download: the reference's own
`SceneInfoHandler` + visibility/relations `process_scene` run end-to-end
against our exported artifacts, and every visibility bit and pair relation
must match exactly (our stages run in float64, like the reference).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference not mounted")


def _install_mmengine_stub():
    if "mmengine" in sys.modules:
        return
    import pickle

    mm = types.ModuleType("mmengine")

    def load(path):
        with open(path, "rb") as f:
            return pickle.load(f)

    def dump(obj, path):
        with open(path, "wb") as f:
            pickle.dump(obj, f)

    def mkdir_or_exist(path):
        os.makedirs(path, exist_ok=True)

    class TimeCounter:
        def __init__(self, *a, **k):
            pass

        def __call__(self, fn=None):
            return fn if fn is not None else self

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    mm.load = load
    mm.dump = dump
    mm.mkdir_or_exist = mkdir_or_exist
    mm.list_from_file = lambda p: [l.strip() for l in open(p) if l.strip()]
    utils = types.ModuleType("mmengine.utils")
    dl_utils = types.ModuleType("mmengine.utils.dl_utils")
    dl_utils.TimeCounter = TimeCounter
    utils.dl_utils = dl_utils
    mm.utils = utils
    sys.modules["mmengine"] = mm
    sys.modules["mmengine.utils"] = utils
    sys.modules["mmengine.utils.dl_utils"] = dl_utils
    if "open3d" not in sys.modules:
        # only needed by remove_statistical_outliers, which we don't call
        sys.modules["open3d"] = types.ModuleType("open3d")


def _load_reference_module(rel_path, name):
    _install_mmengine_stub()
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REFERENCE_ROOT, rel_path))
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope="module")
def ref_info_handler():
    return _load_reference_module(
        "spatial_engine/utils/scannet_utils/handler/info_handler.py",
        "spatial_engine.utils.scannet_utils.handler.info_handler")


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    """Synthetic scene exported to the reference layout + our artifacts."""
    from multi_spatialmllm_tpu.core.io import dump_pickle
    from multi_spatialmllm_tpu.core.synthetic import make_scene
    from multi_spatialmllm_tpu.stages.frame_relations import (
        compute_scene_relations,
    )
    from multi_spatialmllm_tpu.stages.visibility import (
        compute_scene_visibility,
    )

    root = str(tmp_path_factory.mktemp("refparity"))
    scene = make_scene(scene_id="scene0777_00", seed=7, n_images=8,
                       n_background=2000, n_objects=2, n_invalid_poses=1)
    info = {scene.scene_id: scene.save_reference_layout(root)}
    info_path = os.path.join(root, "info.pkl")
    dump_pickle(info, info_path)

    ours_vis = compute_scene_visibility(scene)  # float64
    ours_rel = compute_scene_relations(scene, vis=ours_vis)
    return {"root": root, "scene": scene, "info_path": info_path,
            "vis": ours_vis, "rel": ours_rel}


def _make_handler(ref_info_handler, ref_env):
    return ref_info_handler.SceneInfoHandler(
        ref_env["info_path"],
        posed_images_root=os.path.join(ref_env["root"], "posed_images"),
        instance_data_root=os.path.join(ref_env["root"],
                                        "scannet_instance_data"))


class TestSceneInfoHandlerParity:
    def test_accessors_match(self, ref_info_handler, ref_env):
        handler = _make_handler(ref_info_handler, ref_env)
        scene = ref_env["scene"]
        sid = scene.scene_id
        assert handler.get_num_posed_images(sid) == scene.num_images
        assert handler.get_all_image_ids(sid) == scene.image_ids
        assert (handler.get_all_extrinsic_valid_image_ids(sid)
                == scene.valid_image_ids())
        assert handler.get_num_objects(sid) == scene.num_objects
        for oid in range(scene.num_objects):
            assert handler.get_object_height(sid, oid) == \
                scene.object_height(oid)
            assert handler.get_object_length(sid, oid) == \
                scene.object_length(oid)
            assert handler.get_object_width(sid, oid) == \
                scene.object_width(oid)
            assert handler.get_object_width_axis_aligned(sid, oid) == \
                scene.object_width_axis(oid)
            np.testing.assert_array_equal(
                handler.get_object_point_index(sid, oid),
                scene.object_point_index(oid))
        np.testing.assert_allclose(
            handler.get_extrinsic_matrix_align(sid, scene.image_ids[0]),
            scene.extrinsic_align(0), atol=1e-4)  # savetxt %f round-trip

    def test_visibility_bits_match_reference_pipeline(
            self, ref_info_handler, ref_env):
        """Reference online path: project_3d_point_to_image +
        check_point_visibility over every point/image (the exact loop of
        make_visibility_info.process_scene :93-113)."""
        handler = _make_handler(ref_info_handler, ref_env)
        scene = ref_env["scene"]
        sid = scene.scene_id
        pts = handler.get_scene_points_align(sid)[:, :3]
        for image_id in handler.get_all_extrinsic_valid_image_ids(sid):
            xy, depth = handler.project_3d_point_to_image(sid, image_id, pts)
            ref_mask = handler.check_point_visibility(sid, image_id, xy,
                                                      depth)
            ours = ref_env["vis"][scene.image_index(image_id)]
            mism = int((ref_mask != ours).sum())
            assert mism == 0, (image_id, mism)

    def test_relations_match_reference_math(self, ref_info_handler, ref_env):
        rel_mod = _load_reference_module(
            "spatial_engine/camera_movement/calculate_frames_relations.py",
            "ref_calculate_frames_relations")
        handler = _make_handler(ref_info_handler, ref_env)
        scene = ref_env["scene"]
        sid = scene.scene_id
        warning = os.path.join(ref_env["root"], "warn.txt")
        _, ref_overlap = rel_mod.process_scene(sid, handler, warning)
        ids = scene.image_ids
        ours = ref_env["rel"]
        for (img1, img2), vals in ref_overlap.items():
            i, j = ids.index(img1), ids.index(img2)
            np.testing.assert_allclose(
                ours["overlap"][i, j], vals["overlap"], atol=1e-9)
            np.testing.assert_allclose(
                ours["distance"][i, j], vals["distance"], atol=1e-6)
            np.testing.assert_allclose(
                ours["yaw"][i, j], vals["yaw"], atol=1e-4)
            np.testing.assert_allclose(
                ours["pitch"][i, j], vals["pitch"], atol=1e-4)

    def test_unprojection_matches_reference_ops(self, ref_env):
        """handler/ops.project_mask_to_3d vs geometry.unproject_pixels on
        the same depth image."""
        ops_mod = _load_reference_module(
            "spatial_engine/utils/scannet_utils/handler/ops.py",
            "ref_handler_ops")
        import jax.numpy as jnp

        from multi_spatialmllm_tpu.core.geometry import unproject_pixels

        scene = ref_env["scene"]
        i = 0
        depth = scene.depth_maps[i]
        mask = np.zeros(scene.image_hw, dtype=bool)
        rng = np.random.default_rng(0)
        ys = rng.integers(0, scene.image_hw[0], 50)
        xs = rng.integers(0, scene.image_hw[1], 50)
        mask[ys, xs] = True
        ref_pts = ops_mod.project_mask_to_3d(
            depth, scene.intrinsic, scene.extrinsics[i], mask,
            scene.axis_align)
        # ours: the same pixels in (x, y) order; np.where scans row-major
        my, mx = np.where(mask)
        pix = np.stack([mx, my], axis=1)
        pts, valid = unproject_pixels(
            jnp.asarray(pix), jnp.asarray(depth.astype(np.int64)),
            jnp.asarray(scene.intrinsic), jnp.asarray(scene.extrinsics[i]),
            axis_align=jnp.asarray(scene.axis_align),
            mask_hw=scene.image_hw)
        ours_pts = np.asarray(pts)[np.asarray(valid)]
        np.testing.assert_allclose(ours_pts, ref_pts, atol=1e-9)


class TestEngineMathParity:
    def test_depth_gt_math_matches(self, ref_info_handler, ref_env):
        """Reference get_point_2d_coordinates_in_image + 0-1000 rounding vs
        our depth-engine projection (depth_estimation_coor_engine.py
        :203-218 semantics)."""
        from multi_spatialmllm_tpu.engines.depth_perception import (
            _project_point,
        )
        from multi_spatialmllm_tpu.engines.base import normalized_coord

        handler = _make_handler(ref_info_handler, ref_env)
        scene = ref_env["scene"]
        sid = scene.scene_id
        checked = 0
        for image_id in handler.get_all_extrinsic_valid_image_ids(sid):
            row = scene.image_index(image_id)
            visible = np.where(ref_env["vis"][row])[0][:20]
            h, w = handler.get_image_shape(sid, image_id)
            for point in visible:
                p2d, pdep = handler.get_point_2d_coordinates_in_image(
                    sid, image_id, int(point), align=True,
                    check_visible=True, return_depth=True)
                assert len(p2d) == 1  # index and online check agree
                ref_x = round((p2d[0][0] / w) * 1000)
                ref_y = round((p2d[0][1] / h) * 1000)
                ref_depth = round(pdep[0] * 1000)
                ours = _project_point(scene, row, int(point))
                assert ours is not None
                assert normalized_coord(ours[0], w) == ref_x
                assert normalized_coord(ours[1], h) == ref_y
                assert int(np.round(ours[2] * 1000)) == ref_depth
                checked += 1
        assert checked > 50

    def _visibility_dict(self, ref_env):
        import json

        scene = ref_env["scene"]
        vis = ref_env["vis"]
        return {
            f"{scene.scene_id}:image_to_points:{iid}":
                json.dumps(np.where(vis[i])[0].tolist())
            for i, iid in enumerate(scene.image_ids)
        }

    def test_object_visibility_matches(self, ref_info_handler, ref_env):
        ov_mod = _load_reference_module(
            "spatial_engine/object_perception/compute_object_visibility.py",
            "ref_compute_object_visibility")
        from multi_spatialmllm_tpu.stages.object_visibility import (
            compute_object_visibility,
        )

        handler = _make_handler(ref_info_handler, ref_env)
        scene = ref_env["scene"]
        _, ref_result, _ = ov_mod.process_scene(
            scene.scene_id, handler, self._visibility_dict(ref_env))
        ours = compute_object_visibility(scene, ref_env["vis"])
        assert set(ref_result["object_to_images"].keys()) == \
            set(ours["object_to_images"].keys())
        for oid, ref_list in ref_result["object_to_images"].items():
            our_list = ours["object_to_images"][oid]
            assert [e["image_id"] for e in ref_list] == \
                [e["image_id"] for e in our_list]
            for r, o in zip(ref_list, our_list):
                assert r["intersection_count"] == o["intersection_count"]
                np.testing.assert_allclose(r["visibility"], o["visibility"])

    def test_coverage_search_matches(self, ref_info_handler, ref_env):
        cov_mod = _load_reference_module(
            "spatial_engine/object_perception/single_object_coverage_finder"
            ".py", "ref_single_object_coverage_finder")
        from multi_spatialmllm_tpu.core.rng import stream
        from multi_spatialmllm_tpu.stages.coverage import (
            find_minimal_combinations,
            object_coverage_intervals,
        )

        handler = _make_handler(ref_info_handler, ref_env)
        scene = ref_env["scene"]
        sid = scene.scene_id
        vis_dict = self._visibility_dict(ref_env)
        mins, maxs, _ = object_coverage_intervals(scene, ref_env["vis"])
        valid_ids = scene.valid_image_ids()
        for oid in range(scene.num_objects):
            obj_idx = handler.get_object_point_index(sid, oid)
            scene_pts = handler.get_scene_points_align(sid)[:, :3]
            for dim, axis, target in (
                ("height", 2, handler.get_object_height(sid, oid)),
                ("width", handler.get_object_width_axis_aligned(sid, oid),
                 handler.get_object_width(sid, oid)),
            ):
                ref_res = cov_mod.find_minimal_combinations(
                    sid, scene_pts, obj_idx, valid_ids, vis_dict, axis,
                    target, 0.1)
                rows = [scene.image_index(i) for i in valid_ids]
                lows = mins[rows, axis, oid + 1]
                highs = maxs[rows, axis, oid + 1]
                ours = find_minimal_combinations(
                    valid_ids, lows, highs, target,
                    stream(0, "parity", oid, dim))
                assert set(ref_res.keys()) == set(ours.keys()), (oid, dim)
                for k in ref_res:
                    assert {tuple(c) for c in ref_res[k]} == set(ours[k]), \
                        (oid, dim, k)


class TestCameraMovementEngineParity:
    def test_gt_values_match_reference_engine(self, ref_info_handler,
                                              ref_env):
        """Run the reference build_training_sample (with the swap branch
        pinned off) on rows of our relations table and compare every
        numeric/direction answer value with our columnar math."""
        import random

        sys.path.insert(0, os.path.join(
            REFERENCE_ROOT, "spatial_engine", "camera_movement"))
        try:
            cm_mod = _load_reference_module(
                "spatial_engine/camera_movement/"
                "camera_movement_engine_train_val.py",
                "ref_camera_movement_engine")
        finally:
            sys.path.pop(0)

        from multi_spatialmllm_tpu.engines.camera_movement import (
            build_answer_values,
        )
        from multi_spatialmllm_tpu.stages.frame_relations import (
            scene_relation_records,
        )

        handler = _make_handler(ref_info_handler, ref_env)
        scene = ref_env["scene"]
        rec = scene_relation_records(scene, ref_env["rel"])

        class Row(dict):
            def __getattr__(self, k):
                return self[k]

        orig_random = random.random
        random.random = lambda: 0.9  # pin the swap branch off (:163)
        try:
            checked = 0
            for k in range(len(rec["overlap"])):
                if rec["overlap"][k] <= 0.1:
                    continue
                row = Row(scene_id=scene.scene_id,
                          image_id1=rec["image_id1"][k],
                          image_id2=rec["image_id2"][k],
                          overlap=float(rec["overlap"][k]),
                          distance=float(rec["distance"][k]),
                          yaw=float(rec["yaw"][k]),
                          pitch=float(rec["pitch"][k]))
                row["distance"] = row["distance"]
                ref_sample = cm_mod.build_training_sample(
                    handler, row, k, "total_distance")
                # ours, same no-swap pair
                E1 = scene.extrinsic_align(
                    scene.image_index(rec["image_id1"][k]))
                E2 = scene.extrinsic_align(
                    scene.image_index(rec["image_id2"][k]))
                disp = (np.linalg.inv(E1) @ E2)[:3, 3]
                yaw = float(rec["yaw"][k])
                yaw = yaw - 360 if yaw > 180 else (yaw + 360 if yaw < -180
                                                   else yaw)
                ours = build_answer_values(disp, yaw,
                                           float(rec["pitch"][k]))
                ref_vals = ref_sample["answer_values"]
                for key in ("x_movement", "y_movement", "z_movement",
                            "yaw_movement", "pitch_movement", "x_distance",
                            "y_distance", "z_distance", "yaw_angle",
                            "pitch_angle", "x_value", "y_value", "z_value",
                            "total_distance"):
                    assert ours[key] == ref_vals[key], (key, k)
                np.testing.assert_allclose(
                    ours["displacement_vector"],
                    ref_vals["displacement_vector"], atol=1e-4)
                checked += 1
            assert checked >= 10
        finally:
            random.random = orig_random


class TestObjectMovementParity:
    def test_rigid_segmentation_matches_reference(self, tapvid_record):
        om_mod = _load_reference_module(
            "spatial_engine/object_movement/"
            "single_object_movement_engine_coord.py",
            "ref_object_movement_engine")
        from multi_spatialmllm_tpu.engines.object_movement import (
            rigid_body_segmentation,
        )

        tracks = tapvid_record["tracks_XYZ"]
        ref_groups = om_mod.filter_large_groups(
            om_mod.rigid_body_segmentation(tracks), min_size=5)
        ours = rigid_body_segmentation(tracks)
        assert sorted(map(sorted, ref_groups)) == sorted(map(sorted, ours))

    def test_projection_and_displacement_match(self, tapvid_record):
        om_mod = sys.modules["ref_object_movement_engine"]
        from multi_spatialmllm_tpu.engines.object_movement import (
            ObjectMovementConfig,
            project_point,
        )

        rec = tapvid_record
        engine = om_mod.TwoFrameVideoQAEngine(
            question_type="tapvid3d_total_distance", sub_dataset="adt")
        intr = rec["fx_fy_cx_cy"]
        image_hw = (64, 96)
        n_frames, n_points, _ = rec["tracks_XYZ"].shape
        checked = 0
        for t in range(0, n_frames, 3):
            for p in range(0, n_points, 5):
                ref_p = engine.project_point(rec["tracks_XYZ"][t, p], intr,
                                             image_hw[0], image_hw[1])
                ours_p = project_point(rec["tracks_XYZ"][t, p], intr,
                                       image_hw)
                if ref_p is None:
                    assert ours_p is None
                else:
                    np.testing.assert_allclose(ours_p, ref_p, atol=1e-12)
                    checked += 1
        assert checked > 20

        # displacement into camera-1 (rotation-only, w=0): reference
        # format math (:352-356) vs ours
        c2w = np.linalg.inv(rec["extrinsics_w2c"])
        pts_h = np.concatenate(
            [rec["tracks_XYZ"], np.ones((n_frames, n_points, 1))], axis=2)
        world = np.einsum("nij,nkj->nki", c2w, pts_h)[..., :3]
        f1, f2, p = 0, n_frames - 1, 0
        disp_world = world[f2, p] - world[f1, p]
        ref_disp = (rec["extrinsics_w2c"][f1]
                    @ np.concatenate([disp_world, [0]]))[:3]
        from multi_spatialmllm_tpu.engines.object_movement import (
            format_samples,
        )

        cfg = ObjectMovementConfig()
        out = format_samples(
            "seq", rec, [{"point_index": p, "frame1": f1, "frame2": f2}],
            world, image_hw, cfg, __import__("numpy").random.default_rng(0))
        if out:  # point visible in both frames
            got = np.asarray(out[0]["gt_value"]) \
                if isinstance(out[0]["gt_value"], list) else None
            # question_type is total_distance -> check p1/p2 instead
            assert out[0]["gt_value"] == int(
                np.linalg.norm(disp_world) * 1000) or \
                out[0]["gt_value"] == 0


def _make_interchange_sens(path, n_frames=8, color_hw=(32, 48),
                           depth_hw=(16, 24)):
    """Synthetic .sens with smooth gradient colors (JPEG-friendly so the
    reference's decode->re-encode stays close to our raw-byte passthrough)."""
    import zlib

    import cv2

    from multi_spatialmllm_tpu.ingest import sens as S

    frames = []
    h, w = color_hw
    yy, xx = np.mgrid[0:h, 0:w]
    dyy, dxx = np.mgrid[0:depth_hw[0], 0:depth_hw[1]]
    for i in range(n_frames):
        img = np.stack([
            (xx * 255 / w).astype(np.uint8),
            (yy * 255 / h).astype(np.uint8),
            np.full((h, w), (i * 29) % 256, np.uint8),
        ], axis=-1)
        ok, jpeg = cv2.imencode(".jpg", img)
        assert ok
        depth = ((dyy * 100 + dxx * 7 + i * 13) % 4000).astype(np.uint16)
        pose = np.eye(4)
        pose[:3, 3] = [i * 0.25, -i * 0.125, 1.0 + 0.0625 * i]
        frames.append(S.SensFrame(
            index=i, camera_to_world=pose, timestamp_color=i,
            timestamp_depth=i, color_jpeg=jpeg.tobytes(),
            depth_zlib=zlib.compress(depth.tobytes())))
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 40.0, 40.0, w / 2, h / 2
    header = S.SensHeader(
        sensor_name="interchange", intrinsic_color=K,
        extrinsic_color=np.eye(4), intrinsic_depth=K,
        extrinsic_depth=np.eye(4), color_compression="jpeg",
        depth_compression="zlib_ushort", color_hw=color_hw,
        depth_hw=depth_hw, depth_shift=1000.0, num_frames=n_frames)
    S.write_sens(str(path), header, frames)
    return header, frames


class TestL1SensInterchange:
    """Byte-level L1 interchange: the REFERENCE's own SensorData extractor
    (extract_posed_images.py:31-158) runs on a .sens file WRITTEN BY THIS
    REPO (ingest/sens.write_sens), and its posed_images output is diffed
    against ingest/sens.export_posed_images on the same bytes."""

    @pytest.fixture(scope="class")
    def extracted(self, tmp_path_factory):
        import imageio.v2 as imageio

        root = tmp_path_factory.mktemp("l1x")
        sens_path = root / "scene0901_00.sens"
        _make_interchange_sens(sens_path)

        ref_mod = _load_reference_module(
            "spatial_engine/utils/scannet_utils/extract_posed_images.py",
            "spatial_engine.utils.scannet_utils.extract_posed_images")
        data = ref_mod.SensorData(str(sens_path), frame_skip=2)
        ref_out = str(root / "ref_out")
        data.export_color_images(ref_out)
        data.export_intrinsics(ref_out)
        data.export_poses(ref_out)
        data.export_depth_images(ref_out)

        from multi_spatialmllm_tpu.ingest.sens import export_posed_images

        our_out = str(root / "our_out")
        n = export_posed_images(str(sens_path), our_out, frame_skip=2)
        assert n == 4
        return {"root": str(root), "ref": ref_out, "ours": our_out,
                "sens": str(sens_path)}

    def test_file_layout_identical(self, extracted):
        ref_files = sorted(os.listdir(extracted["ref"]))
        our_files = sorted(os.listdir(extracted["ours"]))
        assert ref_files == our_files
        assert "intrinsic.txt" in ref_files
        assert "00000.jpg" in ref_files and "00003.png" in ref_files

    def test_poses_and_intrinsic_byte_identical(self, extracted):
        for name in ["intrinsic.txt"] + [f"{i:05d}.txt" for i in range(4)]:
            ref = open(os.path.join(extracted["ref"], name), "rb").read()
            ours = open(os.path.join(extracted["ours"], name), "rb").read()
            assert ref == ours, name

    def test_depth_pngs_decode_identical(self, extracted):
        import cv2

        for i in range(4):
            ref = cv2.imread(os.path.join(extracted["ref"], f"{i:05d}.png"),
                             cv2.IMREAD_UNCHANGED)
            ours = cv2.imread(os.path.join(extracted["ours"], f"{i:05d}.png"),
                              cv2.IMREAD_UNCHANGED)
            assert ref.dtype == ours.dtype == np.uint16
            np.testing.assert_array_equal(ref, ours)

    def test_color_jpgs_decode_close(self, extracted):
        # the reference decodes and RE-encodes (imageio.imwrite), ours
        # passes the original JPEG bytes through; pixel content must agree
        # to re-encode tolerance on smooth images.
        import imageio.v2 as imageio

        for i in range(4):
            ref = imageio.imread(
                os.path.join(extracted["ref"], f"{i:05d}.jpg")).astype(int)
            ours = imageio.imread(
                os.path.join(extracted["ours"], f"{i:05d}.jpg")).astype(int)
            assert ref.shape == ours.shape
            assert np.abs(ref - ours).mean() < 4.0

    def test_reference_info_updater_on_our_layout(self, extracted,
                                                  tmp_path, monkeypatch):
        """Execute the reference's update_info_file_with_images.py script
        (module-level code) against OUR posed_images layout and diff the
        resulting *_i_D5.pkl against ingest/posed_images.update_info_with_
        images on the same inputs."""
        import pickle
        import runpy
        import shutil

        from multi_spatialmllm_tpu.ingest.posed_images import (
            update_info_with_images,
        )

        _install_mmengine_stub()
        sid = "scene0901_00"
        data_root = tmp_path / "data" / "scannet"
        posed = data_root / "posed_images" / sid
        posed.parent.mkdir(parents=True)
        shutil.copytree(extracted["ours"], posed)
        inst = data_root / "scannet_instance_data"
        inst.mkdir()
        base_info = {sid: {"base_key": 1}}
        with open(inst / "scenes_train_val_info.pkl", "wb") as f:
            pickle.dump(base_info, f)

        monkeypatch.chdir(tmp_path)
        runpy.run_path(os.path.join(
            REFERENCE_ROOT,
            "spatial_engine/utils/scannet_utils/update_info_file_with_images.py"))
        with open(inst / "scenes_train_val_info_i_D5.pkl", "rb") as f:
            ref_updated = pickle.load(f)

        ours_updated = update_info_with_images(
            {sid: {"base_key": 1}},
            str(data_root / "posed_images"), frame_skip=5)

        assert set(ref_updated) == set(ours_updated) == {sid}
        r, o = ref_updated[sid], ours_updated[sid]
        assert set(r.keys()) == set(o.keys())
        assert r["num_posed_images"] == o["num_posed_images"] == 1
        np.testing.assert_array_equal(r["intrinsic_matrix"],
                                      o["intrinsic_matrix"])
        assert set(r["images_info"]) == set(o["images_info"])
        for iid in r["images_info"]:
            ri, oi = r["images_info"][iid], o["images_info"][iid]
            assert ri["image_path"] == oi["image_path"]
            assert ri["depth_image_path"] == oi["depth_image_path"]
            np.testing.assert_array_equal(ri["extrinsic_matrix"],
                                          oi["extrinsic_matrix"])


class TestReferenceEngineExecution:
    """Run a REFERENCE QA engine end-to-end on this repo's artifacts (info
    pkl + visibility parquet + posed_images), then validate every record
    it produces against this repo's geometry — engine-level integration
    of the reference's quota/sampling/IO plumbing over our L1-L3 outputs."""

    def test_depth_estimation_coor_engine_on_our_artifacts(
            self, ref_info_handler, ref_env, tmp_path):
        # ref_info_handler registers the dotted module path the engine's
        # `from spatial_engine...info_handler import ...` resolves against
        import random

        from multi_spatialmllm_tpu.engines.depth_perception import (
            _project_many,
        )
        from multi_spatialmllm_tpu.stages.visibility import VisibilityIndex

        scene = ref_env["scene"]
        # our visibility index written in the reference parquet dialect
        index = VisibilityIndex()
        index.add_scene(scene.scene_id, scene.image_ids, ref_env["vis"])
        vis_parquet = str(tmp_path / "visibility.parquet")
        index.to_parquet(vis_parquet)

        mod = _load_reference_module(
            "spatial_engine/depth_perception/depth_estimation_coor_engine.py",
            "spatial_engine.depth_perception.depth_estimation_coor_engine")
        random.seed(0)
        engine = mod.DepthEstimationCoorQAEngine(
            ref_env["info_path"],
            all_max_samples=12,
            visibility_info_path=vis_parquet,
            max_n_points_per_image=1,
            warning_file=str(tmp_path / "warn.txt"))
        # point the reference handler's data roots at our artifacts
        engine.scene_info.posed_images_root = os.path.join(
            ref_env["root"], "posed_images")
        engine.scene_info.instance_data_root = os.path.join(
            ref_env["root"], "scannet_instance_data")
        samples = engine.generate_qa_training_data(str(tmp_path),
                                                   save_file=False)
        assert samples, "reference engine produced no samples on our data"

        valid = scene.valid_image_mask()
        for s in samples:
            assert s["question_type"] == "depth_estimation_coor"
            sid = s["image"][0].split("/")[0]
            image_id = s["image"][0].split("/")[1][:-4]
            point = int(s["id"].split("point")[-1])
            assert sid == scene.scene_id
            i = scene.image_index(image_id)
            assert valid[i]
            # our geometry must reproduce the reference engine's gt bits
            x, y, d, ok = _project_many(scene, i, [point])
            assert bool(ok[0]), (image_id, point)
            assert s["gt_value"] == round(float(d[0]) * 1000)
            assert s["ori_coordinates"] == [int(x[0]), int(y[0])]
            h, w = scene.image_hw
            assert s["height_list"] == [h] and s["width_list"] == [w]
            # the sampled point must be one our visibility index marks
            # visible in that image
            assert bool(ref_env["vis"][i, point])

    # ---- shared fixtures for the remaining engine executions ----------

    @pytest.fixture(scope="class")
    def vis_parquet(self, ref_env, tmp_path_factory):
        from multi_spatialmllm_tpu.stages.visibility import VisibilityIndex

        scene = ref_env["scene"]
        index = VisibilityIndex()
        index.add_scene(scene.scene_id, scene.image_ids, ref_env["vis"])
        path = str(tmp_path_factory.mktemp("visidx") / "visibility.parquet")
        index.to_parquet(path)
        return path

    @pytest.fixture(scope="class")
    def vis_dict(self, ref_env):
        """The correspondence engines' pickle-format visibility dict
        (`{scene: {"image_to_points": {image: [point,...]}}}` —
        visual_correspondence_qa_engine_coor_2_coor.py:296-302)."""
        scene = ref_env["scene"]
        vis = ref_env["vis"]
        return {scene.scene_id: {"image_to_points": {
            iid: [int(p) for p in np.flatnonzero(vis[i])]
            for i, iid in enumerate(scene.image_ids)
            if scene.valid_image_mask()[i]}}}

    def _point_roots(self, engine, ref_env):
        engine.scene_info.posed_images_root = os.path.join(
            ref_env["root"], "posed_images")
        engine.scene_info.instance_data_root = os.path.join(
            ref_env["root"], "scannet_instance_data")

    @staticmethod
    def _best_pair(scene, vis):
        """(image_id1, image_id2) maximizing common visible points."""
        valid = scene.valid_image_mask()
        best, pair = -1, None
        n = scene.num_images
        for i in range(n):
            if not valid[i]:
                continue
            for j in range(i + 1, n):
                if not valid[j]:
                    continue
                c = int(np.sum(vis[i] & vis[j]))
                if c > best:
                    best, pair = c, (scene.image_ids[i],
                                     scene.image_ids[j])
        assert best > 0, "synthetic scene has no overlapping pair"
        return pair

    def _check_comparison_samples(self, samples, scene, dot):
        """Every emitted comparison record's depths, coordinates, and
        closer/farther label must be reproduced by our geometry."""
        from multi_spatialmllm_tpu.engines.depth_perception import (
            _project_many,
        )

        h, w = scene.image_hw
        for s in samples:
            assert s["question_type"] == (
                "depth_comparison_annotated" if dot
                else "depth_comparison_coordinate")
            rest = s["id"][len(scene.scene_id) + 1:]
            image_id, p0, p1 = rest.split("_p")[0], \
                int(rest.split("_p")[1]), int(rest.split("_p")[2])
            i = scene.image_index(image_id)
            x, y, d, ok = _project_many(scene, i, [p0, p1])
            assert bool(ok[0]) and bool(ok[1])
            ours = {
                (round(float(x[k]) / w * 1000),
                 round(float(y[k]) / h * 1000)): round(float(d[k]) * 1000)
                for k in (0, 1)}
            infos = s["points_info"]
            assert len(infos) == 2
            for info in infos:
                assert ours[(info["x"], info["y"])] == info["depth"]
            # gt must name the truly closer/farther point (<=: ties are
            # skipped by the engine's retry loop, so strict here)
            closer = min(infos, key=lambda e: e["depth"])
            farther = max(infos, key=lambda e: e["depth"])
            want = closer if s["is_closer_question"] else farther
            if dot:
                assert s["gt_value"] == want["letter"]
            else:
                assert s["gt_value"] == [want["x"], want["y"]]
            assert s["height_list"] == [h] and s["width_list"] == [w]

    def test_depth_estimation_dot_engine_on_our_artifacts(
            self, ref_info_handler, ref_env, vis_parquet, tmp_path):
        import random

        import cv2

        from multi_spatialmllm_tpu.engines.depth_perception import (
            _project_many,
        )

        scene = ref_env["scene"]
        mod = _load_reference_module(
            "spatial_engine/depth_perception/depth_estimation_dot_engine.py",
            "ref_depth_estimation_dot_engine")
        random.seed(0)
        engine = mod.DepthEstimationDotQAEngine(
            ref_env["info_path"], all_max_samples=8,
            image_output_dir=str(tmp_path / "imgs"),
            visibility_info_path=vis_parquet,
            max_n_points_per_image=1,
            warning_file=str(tmp_path / "warn.txt"))
        self._point_roots(engine, ref_env)
        samples = engine.generate_qa_training_data(str(tmp_path),
                                                   save_file=False)
        assert samples, "reference dot engine produced no samples"
        h, w = scene.image_hw
        for s in samples:
            assert s["question_type"] == "depth_estimation_dot"
            image_id = s["image"][0].split("/")[1].split("_p")[0]
            point = int(s["id"].split("point")[-1])
            i = scene.image_index(image_id)
            x, y, d, ok = _project_many(scene, i, [point])
            assert bool(ok[0])
            assert s["gt_value"] == round(float(d[0]) * 1000)
            assert s["ori_coordinates"] == [int(x[0]), int(y[0])]
            # the annotated JPEG the reference wrote must exist & decode
            ann = cv2.imread(str(tmp_path / "imgs" / s["image"][0]))
            assert ann is not None and ann.shape == (h, w, 3)

    def test_depth_comparison_coor_engine_on_our_artifacts(
            self, ref_info_handler, ref_env, vis_parquet, tmp_path):
        import random

        mod = _load_reference_module(
            "spatial_engine/depth_perception/depth_comparison_coor_engine.py",
            "ref_depth_comparison_coor_engine")
        random.seed(0)
        engine = mod.DepthComparisonCoorQAEngine(
            ref_env["info_path"], all_max_samples=8,
            visibility_info_path=vis_parquet,
            warning_file=str(tmp_path / "warn.txt"))
        self._point_roots(engine, ref_env)
        samples = engine.generate_qa_training_data(str(tmp_path),
                                                   save_file=False)
        assert samples, "reference comparison engine produced no samples"
        self._check_comparison_samples(samples, ref_env["scene"], dot=False)

    def test_depth_comparison_dot_engine_on_our_artifacts(
            self, ref_info_handler, ref_env, vis_parquet, tmp_path):
        import random

        import cv2

        scene = ref_env["scene"]
        mod = _load_reference_module(
            "spatial_engine/depth_perception/depth_comparison_dot_engine.py",
            "ref_depth_comparison_dot_engine")
        random.seed(0)
        engine = mod.DepthComparisonDotQAEngine(
            ref_env["info_path"], all_max_samples=8,
            image_output_dir=str(tmp_path / "imgs"),
            visibility_info_path=vis_parquet,
            warning_file=str(tmp_path / "warn.txt"))
        self._point_roots(engine, ref_env)
        samples = engine.generate_qa_training_data(str(tmp_path),
                                                   save_file=False)
        assert samples, "reference dot comparison produced no samples"
        self._check_comparison_samples(samples, scene, dot=True)
        h, w = scene.image_hw
        for s in samples:
            ann = cv2.imread(str(tmp_path / "imgs" / s["image"][0]))
            assert ann is not None and ann.shape == (h, w, 3)

    def test_correspondence_coor_engine_bug_and_execution(
            self, ref_info_handler, ref_env, vis_dict, tmp_path):
        """coor_2_coor's build_training_sample calls the NONEXISTENT
        `SceneInfoHandler.get_image_size` (PARITY.md documented latent
        bug). Pin the bug as real, then patch the accessor to the
        defined `get_image_shape` (same (h, w) order, info_handler.py
        :133) and validate the executed output against our geometry."""
        import random

        from multi_spatialmllm_tpu.engines.depth_perception import (
            _project_many,
        )

        scene = ref_env["scene"]
        mod = _load_reference_module(
            "spatial_engine/visual_correspondence/"
            "visual_correspondence_qa_engine_coor_2_coor.py",
            "ref_corr_coor_engine")
        handler = _make_handler(ref_info_handler, ref_env)
        iid1, iid2 = self._best_pair(scene, ref_env["vis"])
        row = {"scene_id": scene.scene_id, "image_id1": iid1,
               "image_id2": iid2}
        warn = str(tmp_path / "warn.txt")

        random.seed(0)
        with pytest.raises(AttributeError, match="get_image_size"):
            mod.build_training_sample(handler, row, 0, vis_dict, warn)

        handler.get_image_size = handler.get_image_shape
        random.seed(0)
        sample = mod.build_training_sample(handler, row, 0, vis_dict,
                                           warn, max_points_per_pair=2)
        assert sample is not None
        assert sample["question_type"] == "visual_correspondence_coor_2_coor"
        h, w = scene.image_hw
        # the engine may have swapped image order (random 0.5 swap):
        # recover it from the emitted image list
        im1 = sample["image"][0].split("/")[1][:-4]
        im2 = sample["image"][1].split("/")[1][:-4]
        assert {im1, im2} == {iid1, iid2}
        i1, i2 = scene.image_index(im1), scene.image_index(im2)
        assert len(sample["p1_list"]) == len(sample["p2_list"]) >= 1
        for (x1, y1), (x2, y2) in zip(sample["p1_list"],
                                      sample["p2_list"]):
            # find the common point whose projections reproduce BOTH ends
            matched = False
            for p in np.flatnonzero(ref_env["vis"][i1]
                                    & ref_env["vis"][i2]):
                xa, ya, _, oka = _project_many(scene, i1, [int(p)])
                xb, yb, _, okb = _project_many(scene, i2, [int(p)])
                if not (bool(oka[0]) and bool(okb[0])):
                    continue
                if (round(float(xa[0]) / w * 1000) == x1
                        and round(float(ya[0]) / h * 1000) == y1
                        and round(float(xb[0]) / w * 1000) == x2
                        and round(float(yb[0]) / h * 1000) == y2):
                    matched = True
                    break
            assert matched, (x1, y1, x2, y2)
        assert sample["gt_value"] == list(sample["p2_list"][0])

    def test_correspondence_dot_multichoice_bug_and_execution(
            self, ref_info_handler, ref_env, vis_dict, tmp_path):
        """dot_2_multichoice reads the NONEXISTENT handler attributes
        `image_width`/`image_height` (PARITY.md documented latent bug;
        reference :372-373). Pin it, patch real sizes, execute, and
        validate the multiple-choice construction with our geometry."""
        import random

        import cv2

        from multi_spatialmllm_tpu.engines.depth_perception import (
            _project_many,
        )

        scene = ref_env["scene"]
        mod = _load_reference_module(
            "spatial_engine/visual_correspondence/"
            "visual_correspondence_qa_engine_dot_2_multichoice.py",
            "ref_corr_dot_mc_engine")
        mod.USE_PICKLE = True  # feed the pickle-format visibility dict
        handler = _make_handler(ref_info_handler, ref_env)
        iid1, iid2 = self._best_pair(scene, ref_env["vis"])
        row = {"scene_id": scene.scene_id, "image_id1": iid1,
               "image_id2": iid2}
        warn = str(tmp_path / "warn.txt")
        out_imgs = str(tmp_path / "mc_imgs")

        random.seed(0)
        with pytest.raises(AttributeError, match="image_width"):
            mod.build_training_sample(handler, row, 0, vis_dict, warn,
                                      image_output_dir=out_imgs)

        h, w = scene.image_hw
        handler.image_height, handler.image_width = h, w
        random.seed(0)
        sample = mod.build_training_sample(handler, row, 0, vis_dict,
                                           warn,
                                           image_output_dir=out_imgs)
        assert sample is not None
        assert sample["question_type"] == \
            "visual_correspondence_multiple_choice"
        # engine may have swapped the pair: recover order + point id
        # from the annotated file name `{idx}_point{pt}_{im1}_{im2}_img1`
        name = os.path.basename(sample["image"][0])
        _, pt_part, im1, im2, _ = name.split("_")
        pt = int(pt_part.removeprefix("point"))
        i1, i2 = scene.image_index(im1), scene.image_index(im2)
        x1, y1, _, ok1 = _project_many(scene, i1, [pt])
        x2, y2, _, ok2 = _project_many(scene, i2, [pt])
        assert bool(ok1[0]) and bool(ok2[0])
        assert sample["p1_list"] == [int(x1[0]), int(y1[0])]
        correct = (int(x2[0]), int(y2[0]))
        assert tuple(sample["p2_list"][0]) == correct
        # exactly 4 options, the gt label maps to the correct point
        assert len(sample["p2_list"]) == 4
        assert sample["gt_value"] in "ABCD"
        for rel in sample["image"]:
            ann = cv2.imread(os.path.join(out_imgs, rel))
            assert ann is not None and ann.shape == (h, w, 3)

    def test_object_perception_engine_bugs_and_execution(
            self, ref_info_handler, ref_env, tmp_path):
        """single_object_perception_engine defines ASK_DESCRIPTION (:25)
        but uses TASK_DESCRIPTION (:193) — a NameError on every run —
        and reads the nonexistent image_width/height attrs (PARITY.md).
        Pin both bugs, patch, and execute over OUR coverage output."""
        import json as json_mod
        import pickle
        import random

        from multi_spatialmllm_tpu.stages.coverage import (
            build_object_coverage,
        )
        from multi_spatialmllm_tpu.stages.object_visibility import (
            build_object_visibility,
        )

        scene = ref_env["scene"]
        mod = _load_reference_module(
            "spatial_engine/object_perception/"
            "single_object_perception_engine.py",
            "ref_object_perception_engine")
        handler = _make_handler(ref_info_handler, ref_env)

        ovis = build_object_visibility(
            [scene], visibility={scene.scene_id: ref_env["vis"]})
        cov_h, cov_l, cov_w = build_object_coverage(
            [scene], ovis, visibility={scene.scene_id: ref_env["vis"]})
        assert cov_h.get(scene.scene_id), "no coverage output to feed"
        info_pkl = str(tmp_path / "height_info.pkl")
        with open(info_pkl, "wb") as f:
            pickle.dump(cov_h, f)
        out_dir = str(tmp_path / "op_out")

        random.seed(0)
        with pytest.raises(NameError, match="TASK_DESCRIPTION"):
            mod.build_lwh_qa_samples(handler, info_pkl, "height", "train",
                                     out_dir, max_k=2)
        mod.TASK_DESCRIPTION = mod.ASK_DESCRIPTION  # the defined bank

        random.seed(0)
        with pytest.raises(AttributeError, match="image_height"):
            mod.build_lwh_qa_samples(handler, info_pkl, "height", "train",
                                     out_dir, max_k=2)
        h, w = scene.image_hw
        handler.image_height, handler.image_width = h, w

        random.seed(0)
        mod.build_lwh_qa_samples(handler, info_pkl, "height", "train",
                                 out_dir, max_k=2)
        files = sorted(os.listdir(out_dir))
        assert files, "reference engine wrote no jsonl"
        n_checked = 0
        for fname in files:
            for line in open(os.path.join(out_dir, fname)):
                s = json_mod.loads(line)
                sid, oid, k, _ = s["id"].rsplit("_", 3)
                assert sid == scene.scene_id
                assert s["question_type"] == \
                    "object_perception_height_estimation"
                # gt reproduced by our scene geometry
                assert s["gt_value"] == int(
                    round(scene.object_height(int(oid)) * 1000))
                assert len(s["image"]) == int(k)
                assert s["height_list"] == [h] * int(k)
                n_checked += 1
        assert n_checked > 0

    def _check_object_movement_entries(self, samples, rec, ann=False):
        """Validate every reference OM entry against our world-frame
        math (same checks as our engine's GT: total distance in mm with
        the 0.01 m not-moving floor; p1/p2 normalized projections)."""
        from multi_spatialmllm_tpu.engines.object_movement import (
            project_point,
        )

        n_frames, n_points, _ = rec["tracks_XYZ"].shape
        c2w = np.linalg.inv(rec["extrinsics_w2c"])
        pts_h = np.concatenate(
            [rec["tracks_XYZ"], np.ones((n_frames, n_points, 1))], axis=2)
        world = np.einsum("nij,nkj->nki", c2w, pts_h)[..., :3]
        image_hw = None
        import cv2

        arr = np.frombuffer(rec["images_jpeg_bytes"][0], np.uint8)
        image_hw = cv2.imdecode(arr, flags=cv2.IMREAD_UNCHANGED).shape[:2]
        assert samples, "reference OM engine produced no samples"
        for s in samples:
            sid_f1_f2_p = s["id"].rsplit("_", 4 if ann else 3)
            f1, f2, p = int(sid_f1_f2_p[1]), int(sid_f1_f2_p[2]), \
                int(sid_f1_f2_p[3])
            disp = world[f2, p] - world[f1, p]
            dist = float(np.linalg.norm(disp))
            if dist < 0.01:
                dist = 0.0
            if ann:
                # PINNED latent reference bug: the dot engine compares
                # `self.question_type == "total_distance"` but the real
                # question types are "tapvid3d_*"-prefixed
                # (single_object_movement_engine_dot.py:435), so its
                # gt_value is ALWAYS the camera-1 displacement vector in
                # meters — even for total-distance questions, whose
                # answer TEXT correctly says round(dist*1000) mm. Our
                # engine follows the coord twin's evident intent
                # (`"total_distance" in qtype` -> int mm). PARITY.md.
                dv = disp if dist else np.zeros(3)
                want = (rec["extrinsics_w2c"][f1]
                        @ np.concatenate([dv, [0.0]]))[:3]
                np.testing.assert_allclose(s["gt_value"], want,
                                           atol=1e-12)
            else:
                assert s["gt_value"] == int(dist * 1000)
            assert s["point_moving"] == int(dist > 0)
            for t, key in ((f1, "p1"), (f2, "p2")):
                ours = project_point(rec["tracks_XYZ"][t, p],
                                     rec["fx_fy_cx_cy"], image_hw)
                assert ours is not None
                assert tuple(s[key]) == (round(ours[0] * 1000),
                                         round(ours[1] * 1000))

    def test_object_movement_coord_engine_on_our_npz(self, tmp_path):
        """The reference coord engine runs end-to-end on a TAPVid-3D npz
        WRITTEN BY THIS REPO (core/synthetic.make_tapvid_npz), decoding
        our JPEG frames and emitting validated GT."""
        import random

        from multi_spatialmllm_tpu.core.synthetic import make_tapvid_npz

        mod = _load_reference_module(
            "spatial_engine/object_movement/"
            "single_object_movement_engine_coord.py",
            "ref_om_coord_engine")
        rec = make_tapvid_npz(path=str(tmp_path / "seq0.npz"), seed=3,
                              n_frames=10, n_groups=3, points_per_group=8,
                              n_static=10)
        random.seed(0)
        np.random.seed(0)
        engine = mod.TwoFrameVideoQAEngine(
            question_type="tapvid3d_total_distance", sub_dataset="adt")
        samples = engine.generate_qa_training_single_scene(
            str(tmp_path / "seq0.npz"), npoints_per_group=5,
            npairs_per_bin=2, img_output_dir=str(tmp_path / "om_imgs"),
            augment=True, augment_ratio=0.3)
        self._check_object_movement_entries(samples, rec)
        for s in samples[:3]:
            for rel in s["image"]:
                assert os.path.exists(
                    os.path.join(tmp_path, "om_imgs", rel)), rel

    def test_object_movement_dot_engine_on_our_npz(self, tmp_path):
        """Dot variant: the reference draws a W//100 circle on frame 1
        (single_object_movement_engine_dot.py:337) and emits `_ann` ids;
        GT math identical to coord — validated by our world-frame math."""
        import random

        import cv2

        from multi_spatialmllm_tpu.core.synthetic import make_tapvid_npz

        mod = _load_reference_module(
            "spatial_engine/object_movement/"
            "single_object_movement_engine_dot.py",
            "ref_om_dot_engine")
        rec = make_tapvid_npz(path=str(tmp_path / "seq1.npz"), seed=4,
                              n_frames=10, n_groups=3, points_per_group=8,
                              n_static=10)
        random.seed(0)
        np.random.seed(0)
        engine = mod.TwoFrameVideoQAEngineDot(
            question_type="tapvid3d_total_distance", sub_dataset="adt")
        samples = engine.generate_qa_training_single_scene(
            str(tmp_path / "seq1.npz"), str(tmp_path / "frames"),
            npoints_per_group=5, npairs_per_bin=2,
            img_output_dir=str(tmp_path / "omd_imgs"),
            augment=True, augment_ratio=0.3)
        self._check_object_movement_entries(samples, rec, ann=True)
        for s in samples[:3]:
            assert s["image"][0].endswith("_annotated.jpg")
            ann = cv2.imread(
                os.path.join(tmp_path, "omd_imgs", s["image"][0]))
            assert ann is not None
