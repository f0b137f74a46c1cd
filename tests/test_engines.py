"""End-to-end engine tests on synthetic scenes: schema parity + label
correctness against independent oracles."""

import json
import os

import numpy as np
import pytest

from multi_spatialmllm_tpu.core.scene import SceneStore
from multi_spatialmllm_tpu.core.synthetic import (
    make_scene,
    make_tapvid_npz,
    np_project_points,
)
from multi_spatialmllm_tpu.engines import base as B
from multi_spatialmllm_tpu.engines.sampling import sample_overlap_balanced
from multi_spatialmllm_tpu.stages.frame_relations import build_frame_relations
from multi_spatialmllm_tpu.stages.visibility import (
    VisibilityIndex,
    compute_scene_visibility,
)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("engines")
    scenes = [
        make_scene(scene_id=f"scene{i:04d}_00", seed=10 + i, n_images=12,
                   n_background=4000, n_objects=3)
        for i in range(2)
    ]
    store = SceneStore.write(scenes, str(root / "scenes"))
    vis = {s.scene_id: compute_scene_visibility(s) for s in scenes}
    index = VisibilityIndex()
    for s in scenes:
        index.add_scene(s.scene_id, s.image_ids, vis[s.scene_id])
    relations = build_frame_relations(scenes, visibility=vis)
    return {"root": root, "scenes": scenes, "store": store,
            "vis": vis, "index": index, "relations": relations}


class TestSampling:
    def test_against_pandas_semantics(self, rng):
        import pandas as pd

        overlap = np.concatenate([
            np.zeros(50),
            rng.uniform(0.01, 50, 3000),
        ])
        idx = sample_overlap_balanced(
            overlap, 600, np.random.default_rng(0), non_overlap_samples=20,
            overlap_min=6, overlap_max=35, interval=1)
        vals = overlap[idx]
        # 20 zeros included
        assert (vals == 0).sum() == 20
        nz = vals[vals != 0]
        # all nonzero values inside (6-eps, 35]
        assert (nz > 6 - 1e-9).all() and (nz <= 35).all()
        # total target met when data suffices
        assert len(nz) == 600
        # roughly balanced bins (29 bins x ~20-21 per bin)
        binned = pd.cut(pd.Series(nz), bins=np.arange(6, 36, 1),
                        include_lowest=True)
        counts = binned.value_counts()
        assert counts.max() <= counts.min() + 2

    def test_insufficient_bins_roll_over(self):
        overlap = np.array([6.5] * 5 + [7.5] * 100)
        idx = sample_overlap_balanced(
            overlap, 40, np.random.default_rng(0),
            overlap_min=6, overlap_max=8, interval=1)
        # bin1 has 5, quota 20 -> leftover 15 rolls to bin2 (quota 20+15)
        assert len(idx) == 40
        assert (overlap[idx] == 6.5).sum() == 5
        assert (overlap[idx] == 7.5).sum() == 35


class TestCameraMovement:
    def test_samples_schema_and_gt(self, env):
        from multi_spatialmllm_tpu.engines import camera_movement as CM

        cfg = CM.CameraMovementConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        samples = CM.build_samples_for_question_type(
            env["relations"], env["store"], "total_distance", 50, cfg)
        assert len(samples) > 10
        rel = env["relations"]
        by_pair = {}
        for _, row in rel.iterrows():
            by_pair[(row.scene_id, row.image_id1, row.image_id2)] = row
            by_pair[(row.scene_id, row.image_id2, row.image_id1)] = row
        for s in samples:
            assert not B.validate_train_sample(s), B.validate_train_sample(s)
            assert s["question_type"] == "total_distance"
            sid = s["image"][0].split("/")[0]
            i1 = s["image"][0].split("/")[1][:-4]
            i2 = s["image"][1].split("/")[1][:-4]
            scene = env["store"].get(sid)
            E1 = scene.axis_align @ scene.extrinsics[scene.image_index(i1)]
            E2 = scene.axis_align @ scene.extrinsics[scene.image_index(i2)]
            disp = (np.linalg.inv(E1) @ E2)[:3, 3]
            assert s["gt_value"] == int(np.linalg.norm(disp) * 1000)
            av = s["answer_values"]
            assert av["x_movement"] == ("right" if disp[0] > 0 else "left")
            np.testing.assert_allclose(av["displacement_vector"], disp,
                                       atol=1e-9)
            # answer text embeds the gt
            assert f"`{s['gt_value']}`" in s["conversations"][1]["value"]

    def test_yaw_sign_negation_on_swap(self, env):
        from multi_spatialmllm_tpu.engines import camera_movement as CM

        cfg = CM.CameraMovementConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        samples = CM.build_samples_for_question_type(
            env["relations"], env["store"], "yaw_angle", 60, cfg)
        rel = env["relations"]
        lookup = {}
        for _, row in rel.iterrows():
            lookup[(row.scene_id, row.image_id1, row.image_id2)] = row.yaw
        for s in samples:
            sid = s["image"][0].split("/")[0]
            i1 = s["image"][0].split("/")[1][:-4]
            i2 = s["image"][1].split("/")[1][:-4]
            if (sid, i1, i2) in lookup:
                yaw = lookup[(sid, i1, i2)]
            else:
                yaw = -lookup[(sid, i2, i1)]
            if yaw > 180:
                yaw -= 360
            elif yaw < -180:
                yaw += 360
            assert s["gt_value"] == int(abs(yaw))

    def test_generate_writes_train_and_val(self, env, tmp_path):
        from multi_spatialmllm_tpu.engines import camera_movement as CM

        cfg = CM.CameraMovementConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        outs = CM.generate(
            env["relations"], env["relations"], env["store"],
            str(tmp_path / "train"), str(tmp_path / "val"),
            train_counts={"x_movement": 20}, val_counts={"x_movement": 10},
            config=cfg)
        out = outs["x_movement"]
        assert out.n_train > 0 and out.n_val > 0
        val = [json.loads(l) for l in open(out.val_path)]
        for v in val:
            assert not B.validate_eval_sample(v)
            assert "conversations" not in v


class TestDepthEngines:
    def test_estimation_coor(self, env, tmp_path):
        from multi_spatialmllm_tpu.engines import depth_perception as DP

        out = DP.generate_depth_estimation(
            env["store"], env["index"], str(tmp_path / "de.jsonl"),
            variant="coor",
            config=DP.DepthEngineConfig(all_max_samples=40),
            warning_path=str(tmp_path / "w.txt"))
        samples = [json.loads(l) for l in open(out.train_path)]
        assert 0 < len(samples) <= 40
        for s in samples:
            assert not B.validate_train_sample(s)
            assert s["question_type"] == "depth_estimation_coor"
            # recompute depth from the stored pixel coordinates
            sid, rest = s["id"].split("_", 1)
            sid = s["image"][0].split("/")[0]
            image_id = s["image"][0].split("/")[1][:-4]
            point = int(s["id"].split("point")[-1])
            scene = env["store"].get(sid)
            E = scene.axis_align @ scene.extrinsics[scene.image_index(image_id)]
            xy, d = np_project_points(
                scene.points_aligned[point:point + 1, :3], scene.intrinsic, E)
            assert s["gt_value"] == int(np.round(d[0] * 1000))
            assert s["ori_coordinates"] == [int(xy[0, 0]), int(xy[0, 1])]

    def test_estimation_dot_writes_images(self, env, tmp_path):
        from multi_spatialmllm_tpu.engines import depth_perception as DP
        from multi_spatialmllm_tpu.engines.annotate import SyntheticImageProvider

        img_dir = str(tmp_path / "images")
        out = DP.generate_depth_estimation(
            env["store"], env["index"], str(tmp_path / "dd.jsonl"),
            variant="dot",
            config=DP.DepthEngineConfig(all_max_samples=10),
            image_provider=SyntheticImageProvider(
                env["scenes"][0].image_hw),
            image_output_dir=img_dir)
        samples = [json.loads(l) for l in open(out.train_path)]
        assert samples
        for s in samples:
            assert s["image"][0].endswith("_annotated.jpg")
            assert os.path.exists(os.path.join(img_dir, s["image"][0]))

    def test_comparison_coor(self, env, tmp_path):
        from multi_spatialmllm_tpu.engines import depth_perception as DP

        out = DP.generate_depth_comparison(
            env["store"], env["index"], str(tmp_path / "dc.jsonl"),
            variant="coor",
            config=DP.DepthEngineConfig(all_max_samples=30))
        samples = [json.loads(l) for l in open(out.train_path)]
        assert samples
        for s in samples:
            assert s["question_type"] == "depth_comparison_coordinate"
            p1, p2 = s["points_info"]
            assert p1["depth"] != p2["depth"]
            closer = p1 if p1["depth"] <= p2["depth"] else p2
            farther = p2 if p1["depth"] <= p2["depth"] else p1
            target = closer if s["is_closer_question"] else farther
            assert s["gt_value"] == [target["x"], target["y"]]

    def test_comparison_dot(self, env, tmp_path):
        from multi_spatialmllm_tpu.engines import depth_perception as DP
        from multi_spatialmllm_tpu.engines.annotate import SyntheticImageProvider

        out = DP.generate_depth_comparison(
            env["store"], env["index"], str(tmp_path / "dcd.jsonl"),
            variant="dot",
            config=DP.DepthEngineConfig(all_max_samples=15),
            image_provider=SyntheticImageProvider(env["scenes"][0].image_hw),
            image_output_dir=str(tmp_path / "imgs"))
        samples = [json.loads(l) for l in open(out.train_path)]
        assert samples
        for s in samples:
            assert s["question_type"] == "depth_comparison_annotated"
            assert s["gt_value"] in ("A", "B")
            letters = {p["letter"] for p in s["points_info"]}
            assert letters == {"A", "B"}
            p1, p2 = s["points_info"]
            closer = p1 if p1["depth"] <= p2["depth"] else p2
            farther = p2 if p1["depth"] <= p2["depth"] else p1
            target = closer if s["is_closer_question"] else farther
            assert s["gt_value"] == target["letter"]


class TestVisualCorrespondence:
    def test_coor_to_coor(self, env, tmp_path):
        from multi_spatialmllm_tpu.engines import visual_correspondence as VC

        cfg = VC.CorrespondenceConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        out = VC.generate_coor_to_coor(
            env["relations"], env["store"], env["index"],
            str(tmp_path / "vc.jsonl"), 30, cfg)
        samples = [json.loads(l) for l in open(out.train_path)]
        assert samples
        for s in samples:
            assert not B.validate_train_sample(s)
            assert s["gt_value"] == list(s["p2_list"][0])
            assert len(s["image"]) == 2

    def test_dot_to_multichoice(self, env, tmp_path):
        from multi_spatialmllm_tpu.engines import visual_correspondence as VC
        from multi_spatialmllm_tpu.engines.annotate import SyntheticImageProvider

        cfg = VC.CorrespondenceConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        img_dir = str(tmp_path / "imgs")
        out = VC.generate_dot_to_multichoice(
            env["relations"], env["store"], env["index"],
            str(tmp_path / "vcd.jsonl"), 15, img_dir,
            image_provider=SyntheticImageProvider(env["scenes"][0].image_hw),
            config=cfg)
        samples = [json.loads(l) for l in open(out.train_path)]
        assert samples
        for s in samples:
            assert s["gt_value"] in "ABCD"
            assert s["question_type"] == "visual_correspondence_multiple_choice"
            assert len(s["p2_list"]) == 4
            assert os.path.exists(os.path.join(img_dir, s["image"][0]))
            assert os.path.exists(os.path.join(img_dir, s["image"][1]))


class TestObjectPerception:
    def test_generate_from_coverage(self, env, tmp_path):
        from multi_spatialmllm_tpu.engines import object_perception as OP
        from multi_spatialmllm_tpu.stages.coverage import build_object_coverage
        from multi_spatialmllm_tpu.stages.object_visibility import (
            build_object_visibility,
        )

        ov = build_object_visibility(env["scenes"], visibility=env["vis"])
        h, l, w = build_object_coverage(env["scenes"], ov,
                                        visibility=env["vis"])
        outs = OP.generate(
            env["store"], {"height": h, "length": l, "width": w},
            str(tmp_path), "val", eval_mode=True)
        total = sum(o.n_val for o in outs.values())
        assert total > 0
        files = [f for f in os.listdir(tmp_path) if f.endswith(".jsonl")]
        assert files
        for f in files:
            dim = f.split("_")[2]
            k = int(f.split("_k")[1].split("_")[0])
            for line in open(os.path.join(tmp_path, f)):
                s = json.loads(line)
                assert not B.validate_eval_sample(s)
                assert len(s["image"]) == k
                assert s["text"].count("<image>") == k
                sid = s["image"][0].split("/")[0]
                oid = int(s["id"].split("_")[2])
                scene = env["store"].get(sid)
                expect = {"height": scene.object_height,
                          "length": scene.object_length,
                          "width": scene.object_width}[dim](oid)
                assert s["gt_value"] == int(round(expect * 1000))


class TestObjectMovement:
    def test_rigid_segmentation_recovers_groups(self, tapvid_record):
        from multi_spatialmllm_tpu.engines.object_movement import (
            rigid_body_segmentation,
        )

        groups = rigid_body_segmentation(tapvid_record["tracks_XYZ"])
        # moving groups have 8 points each (> 5), static block has 10
        assert all(len(g) > 5 for g in groups)
        assert len(groups) >= 2

    def test_generate_coord(self, tmp_path):
        from multi_spatialmllm_tpu.engines import object_movement as OM

        records = {f"seq{i}": make_tapvid_npz(seed=i, n_frames=10)
                   for i in range(2)}
        cfg = OM.ObjectMovementConfig(
            question_type="tapvid3d_total_distance",
            npoints_per_group=3, npairs_per_bin=2)
        out = OM.generate(records, str(tmp_path / "om.jsonl"), cfg,
                          img_output_dir=str(tmp_path / "imgs"))
        samples = [json.loads(l) for l in open(out.train_path)]
        assert samples
        for s in samples:
            assert not B.validate_train_sample(s)
            parts = s["id"].split("_")
            sid, f1, f2, p = parts[0], int(parts[1]), int(parts[2]), int(parts[3])
            rec = records[sid]
            c2w = np.linalg.inv(rec["extrinsics_w2c"])
            nfr, npts, _ = rec["tracks_XYZ"].shape
            pts_h = np.concatenate(
                [rec["tracks_XYZ"], np.ones((nfr, npts, 1))], axis=2)
            world = np.einsum("nij,nkj->nki", c2w, pts_h)[..., :3]
            dist = np.linalg.norm(world[f2, p] - world[f1, p])
            if dist < 0.01:
                assert s["gt_value"] == 0
                assert s["point_moving"] == 0
                assert s["conversations"][1]["value"].startswith(
                    "The point did not move. ")
            else:
                assert s["gt_value"] == int(dist * 1000)
                assert s["point_moving"] == 1
            # frames cached to disk
            assert os.path.exists(
                os.path.join(tmp_path, "imgs", sid, f"{f1:05d}.jpg"))

    def test_generate_vector_and_dot(self, tmp_path):
        from multi_spatialmllm_tpu.engines import object_movement as OM

        records = {"seqv": make_tapvid_npz(seed=5, n_frames=8)}
        cfg = OM.ObjectMovementConfig(
            question_type="tapvid3d_displacement_vector",
            npoints_per_group=2, npairs_per_bin=1, dot_variant=True)
        out = OM.generate(records, str(tmp_path / "omd.jsonl"), cfg,
                          img_output_dir=str(tmp_path / "imgs"))
        samples = [json.loads(l) for l in open(out.train_path)]
        assert samples
        for s in samples:
            assert s["image"][0].endswith("_annotated.jpg")
            assert os.path.exists(
                os.path.join(tmp_path, "imgs", s["image"][0]))
            assert isinstance(s["gt_value"], list) and len(s["gt_value"]) == 3


class TestAnnotationPool:
    def test_multiworker_outputs_identical_to_inline(self, env, tmp_path,
                                                     monkeypatch):
        """Force a 4-worker pool and compare every record and annotated
        JPEG byte-for-byte with the single-worker (inline) run: rng draws
        stay synchronous, so parallel image writes must not change
        anything."""
        import multi_spatialmllm_tpu.engines.annotate as AN
        from multi_spatialmllm_tpu.engines import depth_perception as DP
        from multi_spatialmllm_tpu.engines.annotate import (
            SyntheticImageProvider,
        )

        def run(tag, workers):
            real_init = AN.AnnotationPool.__init__
            monkeypatch.setattr(
                AN.AnnotationPool, "__init__",
                lambda self, w=None: real_init(self, workers))
            out_dir = tmp_path / tag
            out = DP.generate_depth_estimation(
                env["store"], env["index"], str(out_dir / "d.jsonl"),
                variant="dot",
                config=DP.DepthEngineConfig(all_max_samples=12),
                image_provider=SyntheticImageProvider(
                    env["scenes"][0].image_hw),
                image_output_dir=str(out_dir / "imgs"))
            monkeypatch.setattr(AN.AnnotationPool, "__init__", real_init)
            return out_dir

        d1 = run("inline", 1)
        d4 = run("pool4", 4)
        assert (d1 / "d.jsonl").read_bytes() == (d4 / "d.jsonl").read_bytes()
        imgs1 = sorted(p.relative_to(d1 / "imgs")
                       for p in (d1 / "imgs").rglob("*.jpg"))
        imgs4 = sorted(p.relative_to(d4 / "imgs")
                       for p in (d4 / "imgs").rglob("*.jpg"))
        assert imgs1 == imgs4 and imgs1
        for rel in imgs1:
            assert (d1 / "imgs" / rel).read_bytes() == \
                   (d4 / "imgs" / rel).read_bytes()


class TestDirImageProvider:
    def test_reads_and_caches(self, tmp_path):
        import cv2

        from multi_spatialmllm_tpu.engines.annotate import DirImageProvider

        img = np.random.default_rng(0).integers(
            0, 255, (48, 64, 3), dtype=np.uint8)
        d = tmp_path / "scene0001_00"
        d.mkdir()
        cv2.imwrite(str(d / "00000.jpg"), img)
        provider = DirImageProvider(str(tmp_path))
        got = provider("scene0001_00", "00000")
        assert got.shape == (48, 64, 3)
        # cached object identity on repeat lookups (decode amortized)
        assert provider("scene0001_00", "00000") is got
        with pytest.raises(FileNotFoundError):
            provider("scene0001_00", "99999")
