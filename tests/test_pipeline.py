"""Pipeline orchestrator + manifest tests."""

import json
import os

import numpy as np
import pytest

from multi_spatialmllm_tpu.core.scene import SceneStore
from multi_spatialmllm_tpu.core.synthetic import make_scene
from multi_spatialmllm_tpu.pipeline import PipelineConfig, SpatialEnginePipeline
from multi_spatialmllm_tpu.stages.manifest import Manifest, config_hash


class TestManifest:
    def test_config_hash_stability(self):
        a = config_hash({"x": 1, "y": [1, 2]})
        b = config_hash({"y": [1, 2], "x": 1})
        assert a == b
        assert config_hash({"x": 2}) != a

    def test_run_units_skips_done(self, tmp_path):
        m = Manifest(str(tmp_path / "m.jsonl"))
        calls = []
        ran = m.run_units("s", ["a", "b"], {"v": 1},
                          lambda u: calls.append(u) or {"out": u})
        assert ran == ["a", "b"]
        # resume: same config -> nothing runs (fresh Manifest re-reads file)
        m2 = Manifest(str(tmp_path / "m.jsonl"))
        ran2 = m2.run_units("s", ["a", "b"], {"v": 1},
                            lambda u: calls.append(u))
        assert ran2 == []
        assert m2.outputs("s", "a") == {"out": "a"}
        # config change invalidates
        ran3 = m2.run_units("s", ["a"], {"v": 2}, lambda u: None)
        assert ran3 == ["a"]


class TestPipeline:
    @pytest.fixture(scope="class")
    def pipe(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("pipe"))
        scenes = [
            make_scene(scene_id=f"p{i:04d}_00", seed=40 + i, n_images=10,
                       n_background=3000, n_objects=3)
            for i in range(2)
        ]
        store = SceneStore.write(scenes, os.path.join(root, "scenes"))
        return SpatialEnginePipeline(
            store, root,
            PipelineConfig(overlap_min=0.1, overlap_max=100.0, interval=5.0))

    def test_stages_produce_artifacts_and_cache(self, pipe):
        vis = pipe.visibility()
        assert os.path.exists(
            os.path.join(pipe.root, "indices", "visibility.npz"))
        rel = pipe.frame_relations()
        assert len(rel) > 0
        ov = pipe.object_visibility()
        assert set(ov.keys()) == set(pipe.store.scene_ids())
        covr = pipe.coverage()
        assert set(covr.keys()) == {"height", "length", "width"}
        # second pipeline over the same root loads from cache
        pipe2 = SpatialEnginePipeline(pipe.store, pipe.root, pipe.config)
        vis2 = pipe2.visibility()
        np.testing.assert_array_equal(
            vis2.matrix(pipe.store.scene_ids()[0]),
            vis.matrix(pipe.store.scene_ids()[0]))

    def test_run_all_engines(self, pipe):
        from multi_spatialmllm_tpu.core.synthetic import make_tapvid_npz

        tapvid = {"pipeseq0": make_tapvid_npz(seed=9)}
        results = pipe.run_all(tapvid_records=tapvid)
        assert set(results.keys()) == {
            "camera_movement", "depth_perception", "visual_correspondence",
            "object_perception", "object_movement"}
        cm = results["camera_movement"]["total_distance"]
        assert cm.n_train > 0 and cm.n_val > 0
        # every produced jsonl parses and has the schema
        qa_root = os.path.join(pipe.root, "qa")
        n_files = 0
        for dirpath, _, files in os.walk(qa_root):
            for fname in files:
                if not fname.endswith(".jsonl"):
                    continue
                n_files += 1
                with open(os.path.join(dirpath, fname)) as f:
                    first = f.readline().strip()
                    if first:
                        rec = json.loads(first)
                        assert "image" in rec and "gt_value" in rec
        assert n_files >= 6

    def test_engine_units_resume_without_rerun(self, pipe):
        """Campaign resume at engine-unit granularity: after run_all,
        a FRESH pipeline over the same root (a resumed process) skips
        every completed engine unit — output files untouched (mtime),
        recorded counts revived — and a changed config invalidates."""
        from multi_spatialmllm_tpu.core.synthetic import make_tapvid_npz

        tapvid = {"pipeseq0": make_tapvid_npz(seed=9)}
        first = pipe.run_all(tapvid_records=tapvid)

        jsonls = {}
        for dirpath, _, files in os.walk(os.path.join(pipe.root, "qa")):
            for fname in files:
                p = os.path.join(dirpath, fname)
                jsonls[p] = os.path.getmtime(p)
        assert jsonls

        pipe2 = SpatialEnginePipeline(pipe.store, pipe.root, pipe.config)
        second = pipe2.run_all(tapvid_records=tapvid)
        for p, mtime in jsonls.items():
            assert os.path.getmtime(p) == mtime, f"rewritten: {p}"
        cm1 = first["camera_movement"]["total_distance"]
        cm2 = second["camera_movement"]["total_distance"]
        assert (cm2.n_train, cm2.n_val) == (cm1.n_train, cm1.n_val)
        dp1, dp2 = first["depth_perception"], second["depth_perception"]
        assert {k: v.n_train for k, v in dp2.items()} == \
               {k: v.n_train for k, v in dp1.items()}
        # a changed unit config (different count) reruns that unit
        pipe3 = SpatialEnginePipeline(pipe.store, pipe.root, pipe.config)
        third = pipe3.run_camera_movement(
            train_counts={"total_distance": 40},
            val_counts={"total_distance": 5})
        assert third["total_distance"].n_train <= 40

    def test_run_all_reference_directory_shape(self, pipe):
        """Every engine emits BOTH training_data/ and evaluation_data/
        like the reference (depth_estimation_coor_engine.py:318-322), and
        the object-movement eval keeps the full _orig.jsonl dump
        (single_object_movement_engine_dot.py:676-686)."""
        qa = os.path.join(pipe.root, "qa")
        engines_both = [
            "camera_movement",
            "depth_estimation_coor", "depth_estimation_dot",
            "depth_comparison_coor", "depth_comparison_dot",
            "visual_correspondence_coor_2_coor",
            "visual_correspondence_dot_2_multichoice",
            "object_perception",
            "object_movement_coord", "object_movement_dot",
        ]
        for engine in engines_both:
            for split in ("training_data", "evaluation_data"):
                d = os.path.join(qa, split, engine)
                assert os.path.isdir(d), (split, engine)
                assert any(f.endswith(".jsonl") for _, _, fs in os.walk(d)
                           for f in fs), (split, engine)
        # eval records carry `text`; depth/object-movement keep
        # conversations, the others pop it (reference per-engine split)
        for engine, keeps in (("depth_estimation_coor", True),
                              ("object_movement_coord", True),
                              ("visual_correspondence_coor_2_coor", False)):
            d = os.path.join(qa, "evaluation_data", engine)
            fname = next(f for _, _, fs in os.walk(d) for f in fs
                         if f.endswith(".jsonl") and "_orig" not in f)
            path = next(os.path.join(dp, f) for dp, _, fs in os.walk(d)
                        for f in fs if f == fname)
            rec = json.loads(open(path).readline())
            assert "text" in rec
            assert ("conversations" in rec) == keeps, engine
        # object movement _orig full dump exists and is a superset
        d = os.path.join(qa, "evaluation_data", "object_movement_coord")
        files = {f for _, _, fs in os.walk(d) for f in fs}
        assert "object_movement_coord_orig.jsonl" in files
        n_orig = sum(1 for _ in open(os.path.join(
            d, "object_movement_coord_orig.jsonl")))
        n_eval = sum(1 for _ in open(os.path.join(
            d, "object_movement_coord.jsonl")))
        assert n_orig >= n_eval > 0


class TestCoverageCLIMultiProcess:
    def test_sharded_subprocess_run_equals_unsharded(self, tmp_path):
        """ROADMAP gap: an ACTUAL multi-process coverage run. Two shard
        subprocesses + a merge subprocess (the reference's
        find_object_coverage.sh launch pattern, scripts/*:24-48) must
        reproduce the single-process library result exactly — the
        coverage rng is streamed per (scene, object), so sharding cannot
        perturb it."""
        import subprocess
        import sys

        from multi_spatialmllm_tpu.core.io import load_pickle
        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.stages.coverage import (
            build_object_coverage,
        )
        from multi_spatialmllm_tpu.stages.object_visibility import (
            build_object_visibility,
        )

        scenes = [make_scene(scene_id=f"cov{i:04d}_00", seed=70 + i,
                             n_images=6, n_background=600, n_objects=2)
                  for i in range(3)]
        store_dir = tmp_path / "store"
        SceneStore.write(scenes, str(store_dir))
        out = tmp_path / "cov"
        env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
        repo = os.path.join(os.path.dirname(__file__), "..")

        def run(*extra):
            r = subprocess.run(
                [sys.executable, "-m", "multi_spatialmllm_tpu", "coverage",
                 "--output", str(out), *extra],
                capture_output=True, text=True, env=env, cwd=repo)
            assert r.returncode == 0, r.stderr[-800:]
            return r.stdout

        for i in (0, 1):
            run("--scenes", str(store_dir), "--shard-index", str(i),
                "--num-shards", "2")
        # resume semantics: re-running a finished shard is a no-op
        again = run("--scenes", str(store_dir), "--shard-index", "0",
                    "--num-shards", "2")
        assert "already done" in again
        run("--merge")

        ov = build_object_visibility(scenes)
        want = dict(zip(("height", "length", "width"),
                        build_object_coverage(scenes, ov, seed=0)))
        for dim, w in want.items():
            got = load_pickle(str(
                out / f"merged_train_object_coverage_{dim}.pkl"))
            assert got == w, dim
