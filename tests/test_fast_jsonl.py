"""Native JSONL emitter: program VM correctness + engine output parity."""

import json

import numpy as np
import pytest

from multi_spatialmllm_tpu.engines import fast_jsonl as FJ
from multi_spatialmllm_tpu.ingest.native import build, native_available


@pytest.fixture(scope="module", autouse=True)
def _built():
    build()
    assert native_available()


class TestEmitVM:
    def _tiny_program(self, n=5):
        p = FJ.EmitProgram(n)
        c_int = p.add_int_col(np.arange(n) * 10)
        c_flt = p.add_float_col(np.asarray([0.1, 1.5, -2.25, 3e-7, 123.0][:n]))
        c_str = p.add_str_col([f"name{i}" for i in range(n)])
        c_sel = p.add_int_col(np.asarray([0, 1, 0, 1, 0][:n]))
        sel = p.make_select(
            c_sel, [p.ops_for(lambda o: p.lit(o, "zero")),
                    p.ops_for(lambda o: p.lit(o, "one"))])
        main = []
        p.lit(main, '{"i": ')
        main.append((FJ.OP_INT, c_int, 0))
        p.lit(main, ', "f": ')
        main.append((FJ.OP_FLT, c_flt, 0))
        p.lit(main, ', "s": "')
        main.append((FJ.OP_STR, c_str, 0))
        p.lit(main, '", "sel": "')
        main.append(sel)
        p.lit(main, '"}')
        return p, main

    def test_native_matches_python(self, tmp_path):
        p, main = self._tiny_program()
        p.emit(main, str(tmp_path / "nat.jsonl"))
        p.emit(main, str(tmp_path / "py.jsonl"), force_python=True)
        nat = open(tmp_path / "nat.jsonl").read()
        py = open(tmp_path / "py.jsonl").read()
        assert nat == py
        rows = [json.loads(l) for l in nat.splitlines()]
        assert rows[1] == {"i": 10, "f": 1.5, "s": "name1", "sel": "one"}

    def test_row_order(self, tmp_path):
        p, main = self._tiny_program()
        order = np.asarray([4, 3, 2, 1, 0])
        p.emit(main, str(tmp_path / "o.jsonl"), row_order=order)
        rows = [json.loads(l) for l in open(tmp_path / "o.jsonl")]
        assert [r["i"] for r in rows] == [40, 30, 20, 10, 0]

    def test_float_formatting_matches_json_dumps_bytes(self, tmp_path):
        """OP_FLT must spell floats exactly like json.dumps (repr):
        integral floats keep '.0', 16/17-digit values use shortest
        round-trip, fixed/exponential switch at CPython's thresholds."""
        vals = [2.0, -3.0, 0.0, 0.1, 0.30000000000000004, 1.5e-05,
                0.0001, 1e15, 1e16, -1.2345678901234567e-300,
                8.98846567431158e+307, 123456789.123456, 2.5, -0.5,
                1e-4, 9.999999999999999e15, 1.7976931348623157e308]
        n = len(vals)
        p = FJ.EmitProgram(n)
        c = p.add_float_col(np.asarray(vals, dtype=np.float64))
        main = []
        p.lit(main, '{"v": ')
        main.append((FJ.OP_FLT, c, 0))
        p.lit(main, '}')
        p.emit(main, str(tmp_path / "nat.jsonl"))
        p.emit(main, str(tmp_path / "py.jsonl"), force_python=True)
        nat = open(tmp_path / "nat.jsonl").read()
        assert nat == open(tmp_path / "py.jsonl").read()
        expected = "".join(json.dumps({"v": v}, separators=(", ", ": "))
                           + "\n" for v in vals)
        assert nat == expected

    def test_ryu_formatter_matches_repr_adversarial(self):
        """The native Ryu float formatter against CPython repr on the
        families where shortest-ROUND-TRIP differs from shortest-
        correctly-rounded: power-of-2 mantissas have an asymmetric
        binary interval, so the round-tripping D-digit string can sit
        one last-digit ulp away from the nearest one (e.g. repr gives
        7.678447687145631e-239 where the correctly-rounded 16-digit
        string does not round-trip). The pre-Ryu probing emitter got
        these wrong (17 digits); deep coverage is scripts/fuzz_ryu.cpp
        (125M+ values vs the in-process oracle)."""
        import ctypes
        import math
        import random
        import struct

        from multi_spatialmllm_tpu.ingest import native

        native.build()
        lib = native._load()
        assert lib is not None
        lib.msm_format_double.argtypes = [ctypes.c_double,
                                          ctypes.c_char_p]
        lib.msm_format_double.restype = ctypes.c_int
        buf = ctypes.create_string_buffer(64)

        def fmt(v):
            ln = lib.msm_format_double(v, buf)
            return buf.raw[:ln].decode()

        cases = []
        for e in range(-1074, 1024, 7):  # power-of-2 mantissas + edges
            p = math.ldexp(1.0, e)
            cases += [p, -p, math.nextafter(p, 0.0),
                      math.nextafter(p, math.inf)]
        cases += [struct.unpack(">d", bytes.fromhex(h))[0] for h in
                  ("8e80000000000000", "0eb0000000000000",
                   "1690000000000000")]  # regression: pre-Ryu mismatches
        cases += [5e-324, 2.2250738585072014e-308, 0.1, 2 / 3,
                  1.7976931348623157e308]
        rng = random.Random(11)
        for _ in range(20000):
            bits = rng.getrandbits(64)
            v = struct.unpack(">d", struct.pack(">Q", bits))[0]
            if v == v and not math.isinf(v):
                cases.append(v)
        for v in cases:
            assert fmt(v) == repr(v), (v.hex(), fmt(v), repr(v))

    def test_probing_oracle_decade_boundaries(self):
        """Regression for the oracle's decade-crossing lower neighbor:
        when the correctly-rounded D-digit mantissa is exactly 10^(D-1)
        and rounds ABOVE v, the true neighbor below is 10^D-1 in the
        decade below (9.99...e(X-1)) — zero-padding mant-1 back to D
        digits instead tested the wrong value and overstated the
        shortest digit count. Scans 80 doubles below every decade
        boundary in [1e-30, 1e30] against CPython repr, on both the
        probing oracle and the production Ryu path."""
        import ctypes
        import math

        from multi_spatialmllm_tpu.ingest import native

        native.build()
        lib = native._load()
        assert lib is not None
        for name in ("msm_format_double", "msm_format_double_slow"):
            fn = getattr(lib, name)
            fn.argtypes = [ctypes.c_double, ctypes.c_char_p]
            fn.restype = ctypes.c_int
        buf = ctypes.create_string_buffer(64)
        for e in range(-30, 31):
            v = 10.0 ** e
            for _ in range(80):
                v = math.nextafter(v, 0.0)
                for name in ("msm_format_double",
                             "msm_format_double_slow"):
                    n = getattr(lib, name)(v, buf)
                    assert buf.raw[:n].decode() == repr(v), (
                        name, v.hex(), buf.raw[:n].decode(), repr(v))

    def test_escaping(self, tmp_path):
        p = FJ.EmitProgram(1)
        c = p.add_str_col(['with "quotes"\nand\tctrl'])
        main = []
        p.lit(main, '{"v": "')
        main.append((FJ.OP_STR, c, 0))
        p.lit(main, '"}')
        p.emit(main, str(tmp_path / "e.jsonl"))
        row = json.loads(open(tmp_path / "e.jsonl").read())
        assert row["v"] == 'with "quotes"\nand\tctrl'


class TestCameraMovementNativeParity:
    @pytest.fixture(scope="class")
    def env(self, tmp_path_factory):
        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.stages.frame_relations import (
            build_frame_relations,
        )
        from multi_spatialmllm_tpu.stages.visibility import (
            compute_scene_visibility,
        )

        root = tmp_path_factory.mktemp("fj")
        scene = make_scene(scene_id="fj0000_00", seed=3, n_images=12,
                           n_background=3000)
        store = SceneStore.write([scene], str(root / "scenes"))
        vis = {scene.scene_id: compute_scene_visibility(scene)}
        rel = build_frame_relations([scene], visibility=vis)
        return store, rel, root

    @pytest.mark.parametrize("qtype", [
        "total_distance", "displacement_vector", "x_movement", "yaw_angle"])
    def test_native_equals_python_assembly(self, env, tmp_path, qtype):
        from multi_spatialmllm_tpu.core.rng import stream
        from multi_spatialmllm_tpu.engines import camera_movement as CM

        store, rel, _ = env
        cfg = CM.CameraMovementConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        # identical rng streams for both paths
        r1 = stream(0, "parity", qtype)
        r2 = stream(0, "parity", qtype)
        samples = CM.build_samples_for_question_type(
            rel, store, qtype, 30, cfg, r1)
        order = r1.permutation(len(samples))
        expected = [samples[i] for i in order]

        path = str(tmp_path / f"{qtype}.jsonl")
        n = CM.generate_to_jsonl(rel, store, qtype, 30, path, cfg, r2)
        assert n == len(samples)
        got = [json.loads(l) for l in open(path)]
        assert len(got) == len(expected)
        for g, e in zip(got, expected):
            assert g == e, (g, e)

    def test_native_and_python_emit_identical_bytes(self, env, tmp_path):
        from multi_spatialmllm_tpu.core.rng import stream
        from multi_spatialmllm_tpu.engines import camera_movement as CM

        store, rel, _ = env
        cfg = CM.CameraMovementConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        p_nat = str(tmp_path / "nat.jsonl")
        p_py = str(tmp_path / "py.jsonl")
        CM.generate_to_jsonl(rel, store, "total_distance", 20, p_nat, cfg,
                             stream(0, "b"), force_python=False)
        CM.generate_to_jsonl(rel, store, "total_distance", 20, p_py, cfg,
                             stream(0, "b"), force_python=True)
        assert open(p_nat).read() == open(p_py).read()

    def test_prepared_relations_byte_identical(self, env, tmp_path):
        """PreparedRelations (one-time id->extrinsic resolution) must not
        change a single byte vs the raw-table path, for every qtype."""
        from multi_spatialmllm_tpu.core.rng import stream
        from multi_spatialmllm_tpu.engines import camera_movement as CM

        store, rel, _ = env
        cfg = CM.CameraMovementConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        prep = CM.prepare_relations(rel, store)
        assert CM.prepare_relations(prep, store) is prep  # idempotent
        for qtype in ("total_distance", "displacement_vector",
                      "x_movement", "yaw_angle", "pitch_movement"):
            p_raw = str(tmp_path / f"raw_{qtype}.jsonl")
            p_prep = str(tmp_path / f"prep_{qtype}.jsonl")
            CM.generate_to_jsonl(rel, store, qtype, 25, p_raw, cfg,
                                 stream(0, "pr", qtype))
            CM.generate_to_jsonl(prep, store, qtype, 25, p_prep, cfg,
                                 stream(0, "pr", qtype))
            assert open(p_raw).read() == open(p_prep).read()

    def test_eval_mode_schema(self, env, tmp_path):
        from multi_spatialmllm_tpu.core.rng import stream
        from multi_spatialmllm_tpu.engines import camera_movement as CM
        from multi_spatialmllm_tpu.engines.base import validate_eval_sample

        store, rel, _ = env
        cfg = CM.CameraMovementConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        path = str(tmp_path / "eval.jsonl")
        CM.generate_to_jsonl(rel, store, "yaw_angle", 10, path, cfg,
                             stream(0, "e"), eval_mode=True)
        for line in open(path):
            rec = json.loads(line)
            assert not validate_eval_sample(rec)
            assert "conversations" not in rec
            assert rec["text"].count("\n") >= 1


class TestDepthEstimationNativeParity:
    def test_matches_dict_path_bytes(self, tmp_path):
        import json

        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import depth_perception as DP
        from multi_spatialmllm_tpu.stages.visibility import (
            VisibilityIndex,
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="dj0000_00", seed=11, n_images=10,
                           n_background=2500)
        store = SceneStore.write([scene], str(tmp_path / "scenes"))
        index = VisibilityIndex()
        index.add_scene(scene.scene_id, scene.image_ids,
                        compute_scene_visibility(scene))
        cfg = DP.DepthEngineConfig(all_max_samples=6)

        dict_path = str(tmp_path / "dict.jsonl")
        out1 = DP.generate_depth_estimation(store, index, dict_path,
                                            "coor", cfg)
        nat_path = str(tmp_path / "native.jsonl")
        out2 = DP.generate_depth_estimation_to_jsonl(store, index, nat_path,
                                                     "coor", cfg)
        py_path = str(tmp_path / "py.jsonl")
        DP.generate_depth_estimation_to_jsonl(store, index, py_path, "coor",
                                              cfg, force_python=True)
        assert out1.n_train == out2.n_train > 0
        dict_rows = [json.loads(l) for l in open(dict_path)]
        nat_rows = [json.loads(l) for l in open(nat_path)]
        assert dict_rows == nat_rows
        assert open(nat_path).read() == open(py_path).read()

    def test_dot_variant_with_provider_matches_dict_path(self, tmp_path):
        """rng discipline across dict vs fast path for the dot variant WITH
        an image provider: template indices must be drawn before the
        annotation color in both paths (ADVICE r1 medium), so records —
        and the annotated JPEGs — come out identical."""
        import json

        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import depth_perception as DP
        from multi_spatialmllm_tpu.engines.annotate import (
            SyntheticImageProvider,
        )
        from multi_spatialmllm_tpu.stages.visibility import (
            VisibilityIndex,
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="dj0002_00", seed=13, n_images=10,
                           n_background=2500)
        store = SceneStore.write([scene], str(tmp_path / "scenes"))
        index = VisibilityIndex()
        index.add_scene(scene.scene_id, scene.image_ids,
                        compute_scene_visibility(scene))
        cfg = DP.DepthEngineConfig(all_max_samples=6)
        provider = SyntheticImageProvider(scene.image_hw)

        dict_path = str(tmp_path / "dict.jsonl")
        out1 = DP.generate_depth_estimation(
            store, index, dict_path, "dot", cfg,
            image_provider=provider,
            image_output_dir=str(tmp_path / "img_dict"))
        fast_path = str(tmp_path / "fast.jsonl")
        out2 = DP.generate_depth_estimation_to_jsonl(
            store, index, fast_path, "dot", cfg,
            image_provider=provider,
            image_output_dir=str(tmp_path / "img_fast"))
        assert out1.n_train == out2.n_train > 0
        dict_rows = [json.loads(l) for l in open(dict_path)]
        fast_rows = [json.loads(l) for l in open(fast_path)]
        assert dict_rows == fast_rows
        # Annotated outputs: same filenames and same bytes (same colors →
        # rng stream consumed in the same order).
        import pathlib
        d_imgs = sorted(p.relative_to(tmp_path / "img_dict")
                        for p in (tmp_path / "img_dict").rglob("*.jpg"))
        f_imgs = sorted(p.relative_to(tmp_path / "img_fast")
                        for p in (tmp_path / "img_fast").rglob("*.jpg"))
        assert d_imgs == f_imgs and len(d_imgs) > 0
        for rel in d_imgs:
            assert (tmp_path / "img_dict" / rel).read_bytes() == \
                   (tmp_path / "img_fast" / rel).read_bytes()

    def test_eval_mode(self, tmp_path):
        import json

        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import depth_perception as DP
        from multi_spatialmllm_tpu.engines.base import validate_eval_sample
        from multi_spatialmllm_tpu.stages.visibility import (
            VisibilityIndex,
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="dj0001_00", seed=12, n_images=8,
                           n_background=2000)
        store = SceneStore.write([scene], str(tmp_path / "scenes"))
        index = VisibilityIndex()
        index.add_scene(scene.scene_id, scene.image_ids,
                        compute_scene_visibility(scene))
        path = str(tmp_path / "eval.jsonl")
        DP.generate_depth_estimation_to_jsonl(
            store, index, path, "coor",
            DP.DepthEngineConfig(all_max_samples=5), eval_mode=True)
        dict_path = str(tmp_path / "eval_dict.jsonl")
        DP.generate_depth_estimation(
            store, index, dict_path, "coor",
            DP.DepthEngineConfig(all_max_samples=5), eval_mode=True)
        assert [json.loads(l) for l in open(path)] == \
               [json.loads(l) for l in open(dict_path)]
        for line in open(path):
            rec = json.loads(line)
            assert not validate_eval_sample(rec)
            # reference depth engines keep conversations in eval records
            # (depth_estimation_coor_engine.py:289-292)
            assert "conversations" in rec
            assert rec["text"] == rec["conversations"][0]["value"]


class TestAllQuestionTypesNative:
    def test_generate_all_nine_types(self, tmp_path):
        """Full generate() across every camera-movement question type via
        the native path; every record parses and validates."""
        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import camera_movement as CM
        from multi_spatialmllm_tpu.engines.base import (
            validate_eval_sample,
            validate_train_sample,
        )
        from multi_spatialmllm_tpu.stages.frame_relations import (
            build_frame_relations,
        )
        from multi_spatialmllm_tpu.stages.visibility import (
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="aq0000_00", seed=21, n_images=12,
                           n_background=2500)
        store = SceneStore.write([scene], str(tmp_path / "scenes"))
        vis = {scene.scene_id: compute_scene_visibility(scene)}
        rel = build_frame_relations([scene], visibility=vis)
        cfg = CM.CameraMovementConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        outs = CM.generate(
            rel, rel, store, str(tmp_path / "train"), str(tmp_path / "val"),
            train_counts={q: 8 for q in CM.QUESTION_TYPES},
            val_counts={q: 4 for q in CM.QUESTION_TYPES}, config=cfg)
        assert set(outs) == set(CM.QUESTION_TYPES)
        for qtype, out in outs.items():
            assert out.n_train > 0 and out.n_val > 0
            for line in open(out.train_path):
                rec = json.loads(line)
                assert not validate_train_sample(rec), qtype
                assert rec["question_type"] == qtype
            for line in open(out.val_path):
                rec = json.loads(line)
                assert not validate_eval_sample(rec), qtype


class TestCorrespondenceNativeParity:
    def test_matches_dict_path(self, tmp_path):
        from multi_spatialmllm_tpu.core.rng import stream
        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import visual_correspondence as VC
        from multi_spatialmllm_tpu.engines.base import shuffle_and_write
        from multi_spatialmllm_tpu.stages.frame_relations import (
            build_frame_relations,
        )
        from multi_spatialmllm_tpu.stages.visibility import (
            VisibilityIndex,
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="vcj0000_00", seed=31, n_images=12,
                           n_background=2500)
        store = SceneStore.write([scene], str(tmp_path / "scenes"))
        vis = compute_scene_visibility(scene)
        index = VisibilityIndex()
        index.add_scene(scene.scene_id, scene.image_ids, vis)
        rel = build_frame_relations(
            [scene], visibility={scene.scene_id: vis})
        cfg = VC.CorrespondenceConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)

        dict_path = str(tmp_path / "dict.jsonl")
        out1 = VC.generate_coor_to_coor(rel, store, index, dict_path, 20,
                                        cfg)
        nat_path = str(tmp_path / "nat.jsonl")
        out2 = VC.generate_coor_to_coor_to_jsonl(rel, store, index,
                                                 nat_path, 20, cfg)
        assert out1.n_train == out2.n_train > 0
        d = [json.loads(l) for l in open(dict_path)]
        nat = [json.loads(l) for l in open(nat_path)]
        assert d == nat
        py_path = str(tmp_path / "py.jsonl")
        VC.generate_coor_to_coor_to_jsonl(rel, store, index, py_path, 20,
                                          cfg, force_python=True)
        assert open(nat_path).read() == open(py_path).read()


class TestObjectPerceptionNativeParity:
    def test_native_equals_dict_path(self, tmp_path):
        import os

        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import object_perception as OP
        from multi_spatialmllm_tpu.stages.coverage import (
            build_object_coverage,
        )
        from multi_spatialmllm_tpu.stages.object_visibility import (
            build_object_visibility,
        )
        from multi_spatialmllm_tpu.stages.visibility import (
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="opj0000_00", seed=41, n_images=10,
                           n_background=2500, n_objects=3)
        store = SceneStore.write([scene], str(tmp_path / "scenes"))
        vis = {scene.scene_id: compute_scene_visibility(scene)}
        ov = build_object_visibility([scene], visibility=vis)
        h, l, w = build_object_coverage([scene], ov, visibility=vis)
        cov = {"height": h, "length": l, "width": w}

        nat_dir = str(tmp_path / "nat")
        dict_dir = str(tmp_path / "dict")
        o1 = OP.generate(store, cov, nat_dir, "train", use_native=True)
        o2 = OP.generate(store, cov, dict_dir, "train", use_native=False)
        files1 = sorted(os.listdir(nat_dir))
        files2 = sorted(os.listdir(dict_dir))
        assert files1 == files2 and files1
        total = 0
        for f in files1:
            a = [json.loads(x) for x in open(os.path.join(nat_dir, f))]
            b = [json.loads(x) for x in open(os.path.join(dict_dir, f))]
            assert a == b, f
            total += len(a)
        assert total > 0
        assert sum(o.n_train for o in o1.values()) == \
            sum(o.n_train for o in o2.values())

        # eval mode: text appended, conversations removed
        ev_dir = str(tmp_path / "ev")
        OP.generate(store, cov, ev_dir, "val", eval_mode=True,
                    use_native=True)
        from multi_spatialmllm_tpu.engines.base import validate_eval_sample

        for f in os.listdir(ev_dir):
            for line in open(os.path.join(ev_dir, f)):
                rec = json.loads(line)
                assert not validate_eval_sample(rec)
                k = int(f.split("_k")[1].split("_")[0])
                assert rec["text"].count("<image>") == k


class TestDepthComparisonNativeParity:
    def test_matches_dict_path(self, tmp_path):
        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import depth_perception as DP
        from multi_spatialmllm_tpu.stages.visibility import (
            VisibilityIndex,
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="dcj0000_00", seed=51, n_images=10,
                           n_background=2500)
        store = SceneStore.write([scene], str(tmp_path / "scenes"))
        index = VisibilityIndex()
        index.add_scene(scene.scene_id, scene.image_ids,
                        compute_scene_visibility(scene))
        cfg = DP.DepthEngineConfig(all_max_samples=8)

        dict_path = str(tmp_path / "dict.jsonl")
        o1 = DP.generate_depth_comparison(store, index, dict_path, "coor",
                                          cfg)
        nat_path = str(tmp_path / "nat.jsonl")
        o2 = DP.generate_depth_comparison_to_jsonl(store, index, nat_path,
                                                   "coor", cfg)
        assert o1.n_train == o2.n_train > 0
        d = [json.loads(l) for l in open(dict_path)]
        nat = [json.loads(l) for l in open(nat_path)]
        assert d == nat
        py_path = str(tmp_path / "py.jsonl")
        DP.generate_depth_comparison_to_jsonl(store, index, py_path, "coor",
                                              cfg, force_python=True)
        assert open(nat_path).read() == open(py_path).read()

    def test_dot_variant_matches_dict_path(self, tmp_path):
        """dot-variant fast path vs dict path with annotation: identical
        records (incl. letter gt and annotated image names) and identical
        JPEG bytes (rng stream consumed in the same order)."""
        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import depth_perception as DP
        from multi_spatialmllm_tpu.engines.annotate import (
            SyntheticImageProvider,
        )
        from multi_spatialmllm_tpu.stages.visibility import (
            VisibilityIndex,
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="dcj0002_00", seed=53, n_images=10,
                           n_background=2500)
        store = SceneStore.write([scene], str(tmp_path / "scenes"))
        index = VisibilityIndex()
        index.add_scene(scene.scene_id, scene.image_ids,
                        compute_scene_visibility(scene))
        cfg = DP.DepthEngineConfig(all_max_samples=8)
        provider = SyntheticImageProvider(scene.image_hw)

        dict_path = str(tmp_path / "dict.jsonl")
        o1 = DP.generate_depth_comparison(
            store, index, dict_path, "dot", cfg, image_provider=provider,
            image_output_dir=str(tmp_path / "img_dict"))
        fast_path = str(tmp_path / "fast.jsonl")
        o2 = DP.generate_depth_comparison_to_jsonl(
            store, index, fast_path, "dot", cfg, image_provider=provider,
            image_output_dir=str(tmp_path / "img_fast"))
        assert o1.n_train == o2.n_train > 0
        d = [json.loads(l) for l in open(dict_path)]
        f = [json.loads(l) for l in open(fast_path)]
        assert d == f
        for rec in f:
            assert rec["question_type"] == "depth_comparison_annotated"
            assert rec["gt_value"] in ("A", "B")
            assert rec["image"][0].endswith("_annotated.jpg")
        d_imgs = sorted(p.relative_to(tmp_path / "img_dict")
                        for p in (tmp_path / "img_dict").rglob("*.jpg"))
        f_imgs = sorted(p.relative_to(tmp_path / "img_fast")
                        for p in (tmp_path / "img_fast").rglob("*.jpg"))
        assert d_imgs == f_imgs and d_imgs
        for rel in d_imgs:
            assert (tmp_path / "img_dict" / rel).read_bytes() == \
                   (tmp_path / "img_fast" / rel).read_bytes()

    def test_eval_mode(self, tmp_path):
        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import depth_perception as DP
        from multi_spatialmllm_tpu.engines.base import validate_eval_sample
        from multi_spatialmllm_tpu.stages.visibility import (
            VisibilityIndex,
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="dcj0001_00", seed=52, n_images=8,
                           n_background=2000)
        store = SceneStore.write([scene], str(tmp_path / "scenes"))
        index = VisibilityIndex()
        index.add_scene(scene.scene_id, scene.image_ids,
                        compute_scene_visibility(scene))
        path = str(tmp_path / "eval.jsonl")
        DP.generate_depth_comparison_to_jsonl(
            store, index, path, "coor",
            DP.DepthEngineConfig(all_max_samples=5), eval_mode=True)
        for line in open(path):
            rec = json.loads(line)
            assert not validate_eval_sample(rec)
            assert isinstance(rec["is_closer_question"], bool)
            p1, p2 = rec["points_info"]
            assert {p1["letter"], p2["letter"]} == {"A", "B"}


class TestCorrespondenceDotNativeParity:
    def test_matches_dict_path(self, tmp_path):
        import json as _json

        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import visual_correspondence as VC
        from multi_spatialmllm_tpu.engines.annotate import (
            SyntheticImageProvider,
        )
        from multi_spatialmllm_tpu.stages.frame_relations import (
            build_frame_relations,
        )
        from multi_spatialmllm_tpu.stages.visibility import (
            VisibilityIndex,
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="vcd0000_00", seed=61, n_images=12,
                           n_background=3000)
        store = SceneStore.write([scene], str(tmp_path / "scenes"))
        vis = {scene.scene_id: compute_scene_visibility(scene)}
        index = VisibilityIndex()
        index.add_scene(scene.scene_id, scene.image_ids,
                        vis[scene.scene_id])
        rel = build_frame_relations([scene], visibility=vis)
        cfg = VC.CorrespondenceConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        provider = SyntheticImageProvider(scene.image_hw)

        d_dir = tmp_path / "img_dict"
        o1 = VC.generate_dot_to_multichoice(
            rel, store, index, str(tmp_path / "dict.jsonl"), 15,
            str(d_dir), image_provider=provider, config=cfg)
        f_dir = tmp_path / "img_fast"
        o2 = VC.generate_dot_to_multichoice_to_jsonl(
            rel, store, index, str(tmp_path / "fast.jsonl"), 15,
            str(f_dir), image_provider=provider, config=cfg)
        assert o1.n_train == o2.n_train > 0
        d = [_json.loads(l) for l in open(tmp_path / "dict.jsonl")]
        f = [_json.loads(l) for l in open(tmp_path / "fast.jsonl")]
        assert d == f
        d_imgs = sorted(p.relative_to(d_dir) for p in d_dir.rglob("*.jpg"))
        f_imgs = sorted(p.relative_to(f_dir) for p in f_dir.rglob("*.jpg"))
        assert d_imgs == f_imgs and d_imgs
        for r in d_imgs:
            assert (d_dir / r).read_bytes() == (f_dir / r).read_bytes()
        # python interpreter emits identical bytes to the C VM
        VC.generate_dot_to_multichoice_to_jsonl(
            rel, store, index, str(tmp_path / "py.jsonl"), 15,
            str(tmp_path / "img_py"), image_provider=provider, config=cfg,
            force_python=True)
        assert open(tmp_path / "fast.jsonl").read() == \
               open(tmp_path / "py.jsonl").read()

    def test_eval_mode_pops_conversations(self, tmp_path):
        import json as _json

        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import visual_correspondence as VC
        from multi_spatialmllm_tpu.engines.base import validate_eval_sample
        from multi_spatialmllm_tpu.stages.frame_relations import (
            build_frame_relations,
        )
        from multi_spatialmllm_tpu.stages.visibility import (
            VisibilityIndex,
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="vcd0001_00", seed=62, n_images=10,
                           n_background=2500)
        store = SceneStore.write([scene], str(tmp_path / "scenes"))
        vis = {scene.scene_id: compute_scene_visibility(scene)}
        index = VisibilityIndex()
        index.add_scene(scene.scene_id, scene.image_ids,
                        vis[scene.scene_id])
        rel = build_frame_relations([scene], visibility=vis)
        cfg = VC.CorrespondenceConfig(overlap_min=0.1, overlap_max=100,
                                      interval=5)
        o_f = VC.generate_dot_to_multichoice_to_jsonl(
            rel, store, index, str(tmp_path / "f.jsonl"), 8,
            str(tmp_path / "imgs"), config=cfg, eval_mode=True)
        o_d = VC.generate_dot_to_multichoice(
            rel, store, index, str(tmp_path / "d.jsonl"), 8,
            str(tmp_path / "imgs2"), config=cfg, eval_mode=True)
        f = [_json.loads(l) for l in open(tmp_path / "f.jsonl")]
        d = [_json.loads(l) for l in open(tmp_path / "d.jsonl")]
        assert f == d and f
        for rec in f:
            assert not validate_eval_sample(rec)
            assert "conversations" not in rec
            assert rec["gt_value"] in "ABCD"


class TestObjectMovementNativeParity:
    @pytest.mark.parametrize("qtype,dot", [
        ("tapvid3d_total_distance", False),
        ("tapvid3d_displacement_vector", True),
    ])
    def test_matches_dict_path(self, tmp_path, qtype, dot):
        import json as _json

        from multi_spatialmllm_tpu.core.synthetic import make_tapvid_npz
        from multi_spatialmllm_tpu.engines import object_movement as OM

        records = {f"omseq{i}": make_tapvid_npz(seed=40 + i, n_frames=10,
                                                n_groups=3,
                                                points_per_group=8)
                   for i in range(2)}
        cfg = OM.ObjectMovementConfig(question_type=qtype,
                                      npoints_per_group=4,
                                      npairs_per_bin=2, dot_variant=dot)
        d_dir = str(tmp_path / "img_dict") if dot else None
        f_dir = str(tmp_path / "img_fast") if dot else None
        o1 = OM.generate(records, str(tmp_path / "dict.jsonl"), cfg,
                         img_output_dir=d_dir, max_samples=25)
        o2 = OM.generate_to_jsonl(records, str(tmp_path / "fast.jsonl"),
                                  cfg, img_output_dir=f_dir,
                                  max_samples=25)
        assert o1.n_train == o2.n_train > 0
        d = [_json.loads(l) for l in open(tmp_path / "dict.jsonl")]
        f = [_json.loads(l) for l in open(tmp_path / "fast.jsonl")]
        assert d == f
        if dot:
            import pathlib
            di = sorted(p.relative_to(tmp_path / "img_dict")
                        for p in (tmp_path / "img_dict").rglob("*.jpg"))
            fi = sorted(p.relative_to(tmp_path / "img_fast")
                        for p in (tmp_path / "img_fast").rglob("*.jpg"))
            assert di == fi and di
            for rel in di:
                assert (tmp_path / "img_dict" / rel).read_bytes() == \
                       (tmp_path / "img_fast" / rel).read_bytes()
        # python interpreter path identical bytes
        OM.generate_to_jsonl(records, str(tmp_path / "py.jsonl"), cfg,
                             img_output_dir=None, max_samples=25,
                             force_python=True)
        # (annotation off for the py pass; records must still match)
        assert open(tmp_path / "fast.jsonl").read() == \
               open(tmp_path / "py.jsonl").read()

    def test_eval_orig_dump_and_subsample(self, tmp_path):
        import json as _json

        from multi_spatialmllm_tpu.core.synthetic import make_tapvid_npz
        from multi_spatialmllm_tpu.engines import object_movement as OM

        records = {"omev0": make_tapvid_npz(seed=45, n_frames=10,
                                            n_groups=3, points_per_group=8)}
        cfg = OM.ObjectMovementConfig(npoints_per_group=4, npairs_per_bin=2)
        o1 = OM.generate(records, str(tmp_path / "d.jsonl"), cfg,
                         max_samples=10, eval_mode=True)
        o2 = OM.generate_to_jsonl(records, str(tmp_path / "f.jsonl"), cfg,
                                  max_samples=10, eval_mode=True)
        assert o1.n_val == o2.n_val == 10
        for name in ("_orig", ""):
            d = [_json.loads(l)
                 for l in open(str(tmp_path / f"d{name}.jsonl"))]
            f = [_json.loads(l)
                 for l in open(str(tmp_path / f"f{name}.jsonl"))]
            assert d == f and f
        rec = _json.loads(open(tmp_path / "f.jsonl").readline())
        assert "text" in rec and "conversations" in rec


class TestMultithreadedEmit:
    def test_four_threads_byte_identical(self, tmp_path):
        """Forced 4-thread native emission must produce byte-identical
        output to the Python interpreter (waves keep row order)."""
        import ctypes
        import os

        import numpy as np

        from multi_spatialmllm_tpu.ingest import native

        lib = native._load()
        assert hasattr(lib, "msm_emit_jsonl_mt")

        n = 50_000
        rng = np.random.default_rng(3)
        p = FJ.EmitProgram(n)
        c_int = p.add_int_col(rng.integers(-10**6, 10**6, n))
        c_flt = p.add_float_col(rng.standard_normal(n))
        c_str = p.add_str_col([f"s{i % 37}" for i in range(n)])
        c_sel = p.add_int_col(rng.integers(0, 3, n))
        sel = p.make_select(c_sel, [
            p.ops_for(lambda o, t=t: p.lit(o, t))
            for t in ("alpha", "beta", "gamma")])
        main = []
        p.lit(main, '{"i": ')
        main.append((FJ.OP_INT, c_int, 0))
        p.lit(main, ', "f": ')
        main.append((FJ.OP_FLT, c_flt, 0))
        p.lit(main, ', "s": "')
        main.append((FJ.OP_STR, c_str, 0))
        p.lit(main, '", "w": "')
        main.append(sel)
        p.lit(main, '"}')
        order = rng.permutation(n)

        py_path = str(tmp_path / "py.jsonl")
        p.emit(main, py_path, row_order=order, force_python=True)

        # drive the mt symbol with an explicit thread count
        import multi_spatialmllm_tpu.engines.fast_jsonl as FJmod

        real_cpu_count = os.cpu_count
        os.cpu_count = lambda: 4
        try:
            mt_path = str(tmp_path / "mt.jsonl")
            p.emit(main, mt_path, row_order=order)
        finally:
            os.cpu_count = real_cpu_count
        assert open(mt_path, "rb").read() == open(py_path, "rb").read()
