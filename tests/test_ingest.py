"""L1 ingestion tests: PLY parsing, ScanNet export, .sens round-trip,
native zlib helpers, posed-image info, TAPVid records."""

import json
import os
import zlib

import numpy as np
import pytest

from multi_spatialmllm_tpu.ingest import ply as P
from multi_spatialmllm_tpu.ingest import scannet_export as SE
from multi_spatialmllm_tpu.ingest import sens as S
from multi_spatialmllm_tpu.ingest import tapvid as TV
from multi_spatialmllm_tpu.ingest.native import (
    build,
    inflate_depth_frames,
    native_available,
    zlib_inflate,
    zlib_inflate_batch,
)


class TestPly:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, rng, binary):
        xyz = rng.normal(size=(100, 3)).astype(np.float32)
        rgb = rng.integers(0, 255, size=(100, 3)).astype(np.uint8)
        path = str(tmp_path / "mesh.ply")
        P.write_ply_vertices(path, xyz, rgb, binary=binary)
        verts = P.read_mesh_vertices_rgb(path)
        assert verts.shape == (100, 6)
        np.testing.assert_allclose(verts[:, :3], xyz, atol=1e-6)
        np.testing.assert_array_equal(verts[:, 3:].astype(np.uint8), rgb)


def _make_scan_fixture(tmp_path, rng, n_verts=200, n_objects=3):
    """Synthetic ScanNet scan directory with mesh/agg/segs/meta files."""
    scan = "scene9999_00"
    scan_dir = tmp_path / scan
    scan_dir.mkdir()
    xyz = rng.normal(size=(n_verts, 3)).astype(np.float32) * 2
    rgb = rng.integers(0, 255, size=(n_verts, 3)).astype(np.uint8)
    P.write_ply_vertices(str(scan_dir / f"{scan}_vh_clean_2.ply"), xyz, rgb)

    # segments: each vertex belongs to one of 10 segments
    seg_of_vertex = rng.integers(0, 10, size=n_verts)
    with open(scan_dir / f"{scan}_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": seg_of_vertex.tolist()}, f)

    # objects: object k owns segments {3k, 3k+1} (0-indexed objectId)
    groups = []
    cats = ["chair", "table", "sofa"]
    for k in range(n_objects):
        groups.append({"objectId": k, "label": cats[k],
                       "segments": [3 * k, 3 * k + 1]})
    with open(scan_dir / f"{scan}.aggregation.json", "w") as f:
        json.dump({"segGroups": groups}, f)

    A = np.eye(4)
    A[:3, 3] = [1.0, -2.0, 0.5]
    vals = " ".join(str(v) for v in A.flatten())
    with open(scan_dir / f"{scan}.txt", "w") as f:
        f.write(f"axisAlignment = {vals}\n")
    with open(tmp_path / "labels.tsv", "w") as f:
        f.write("raw_category\tnyu40id\n")
        for i, c in enumerate(cats):
            f.write(f"{c}\t{i + 2}\n")
    return scan, str(scan_dir), xyz, rgb, seg_of_vertex, A, cats


class TestScannetExport:
    def test_export_arrays(self, tmp_path, rng):
        scan, scan_dir, xyz, rgb, segs, A, cats = _make_scan_fixture(
            tmp_path, rng)
        label_map = SE.read_label_mapping(str(tmp_path / "labels.tsv"))
        assert label_map == {"chair": 2, "table": 3, "sofa": 4}
        arrays = SE.export_scene_arrays(
            os.path.join(scan_dir, f"{scan}_vh_clean_2.ply"),
            os.path.join(scan_dir, f"{scan}.aggregation.json"),
            os.path.join(scan_dir, f"{scan}_vh_clean_2.0.010000.segs.json"),
            os.path.join(scan_dir, f"{scan}.txt"),
            label_map=label_map)
        # alignment: aligned = A @ unaligned
        pts_h = np.concatenate(
            [arrays["unaligned_points"][:, :3], np.ones((len(xyz), 1))], 1)
        np.testing.assert_allclose(
            arrays["aligned_points"][:, :3], (pts_h @ A.T)[:, :3], atol=1e-5)
        # instance ids: vertex with segment 3k or 3k+1 -> object k+1
        expect = np.zeros(len(xyz), dtype=np.uint32)
        for k in range(3):
            expect[np.isin(segs, [3 * k, 3 * k + 1])] = k + 1
        np.testing.assert_array_equal(arrays["instance_ids"], expect)
        # semantic ids from label map
        for k, c in enumerate(cats):
            m = arrays["instance_ids"] == k + 1
            assert (arrays["semantic_ids"][m] == k + 2).all()
        # bboxes enclose the object's aligned points; label in slot 7
        for k in range(3):
            m = arrays["instance_ids"] == k + 1
            p = arrays["aligned_points"][m, :3]
            b = arrays["aligned_bboxes"][k]
            np.testing.assert_allclose(b[:3], (p.min(0) + p.max(0)) / 2,
                                       atol=1e-5)
            np.testing.assert_allclose(b[3:6], p.max(0) - p.min(0),
                                       atol=1e-5)
            assert b[6] == k + 2
        assert arrays["raw_categories"] == cats

    def test_reference_layout_and_batch(self, tmp_path, rng):
        scan, scan_dir, *_ = _make_scan_fixture(tmp_path, rng)
        info = SE.batch_export(
            [scan_dir], str(tmp_path / "out"),
            label_map_path=str(tmp_path / "labels.tsv"),
            info_pkl_path=str(tmp_path / "info.pkl"))
        entry = info[scan]
        assert entry["num_objects"] == 3
        assert set(entry[0].keys()) == {"aligned_bbox", "unaligned_bbox",
                                        "raw_category"}
        out_dir = tmp_path / "out" / scan
        for fname in ("aligned_points.npy", "unaligned_points.npy",
                      "instance_mask.npy", "semantic_mask.npy",
                      "object_0_aligned_points.npy"):
            assert (out_dir / fname).exists()


def _make_sens_fixture(path, rng, n_frames=7, color_hw=(24, 32),
                       depth_hw=(12, 16)):
    import cv2

    frames = []
    for i in range(n_frames):
        img = rng.integers(0, 255, size=(*color_hw, 3), dtype=np.uint8)
        ok, jpeg = cv2.imencode(".jpg", img)
        depth = rng.integers(0, 5000, size=depth_hw, dtype=np.uint16)
        pose = np.eye(4)
        pose[:3, 3] = [i * 0.1, 0.0, 0.0]
        frames.append(S.SensFrame(
            index=i, camera_to_world=pose, timestamp_color=i,
            timestamp_depth=i, color_jpeg=jpeg.tobytes(),
            depth_zlib=zlib.compress(depth.tobytes())))
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 30.0
    header = S.SensHeader(
        sensor_name="synthetic", intrinsic_color=K,
        extrinsic_color=np.eye(4), intrinsic_depth=K,
        extrinsic_depth=np.eye(4), color_compression="jpeg",
        depth_compression="zlib_ushort", color_hw=color_hw,
        depth_hw=depth_hw, depth_shift=1000.0, num_frames=n_frames)
    S.write_sens(path, header, frames)
    return header, frames


class TestSens:
    def test_roundtrip(self, tmp_path, rng):
        path = str(tmp_path / "scene.sens")
        header, frames = _make_sens_fixture(path, rng)
        h2, f2 = S.read_sens(path, frame_skip=1)
        assert h2.num_frames == 7
        assert h2.depth_hw == header.depth_hw
        assert h2.color_hw == header.color_hw
        assert len(f2) == 7
        for a, b in zip(frames, f2):
            np.testing.assert_allclose(a.camera_to_world, b.camera_to_world,
                                       atol=1e-6)
            assert a.color_jpeg == b.color_jpeg
            np.testing.assert_array_equal(
                a.depth_mm(header.depth_hw), b.depth_mm(header.depth_hw))

    def test_frame_skip_streams(self, tmp_path, rng):
        path = str(tmp_path / "scene.sens")
        _make_sens_fixture(path, rng)
        kept = list(S.iter_frames(path, frame_skip=3))
        assert [f.index for f in kept] == [0, 3, 6]

    def test_export_posed_images(self, tmp_path, rng):
        import cv2

        path = str(tmp_path / "scene.sens")
        header, frames = _make_sens_fixture(path, rng)
        out = str(tmp_path / "posed")
        n = S.export_posed_images(path, out, frame_skip=2,
                                  inflate=zlib.decompress)
        assert n == 4
        files = sorted(os.listdir(out))
        assert "intrinsic.txt" in files
        assert "00000.jpg" in files and "00003.png" in files
        depth = cv2.imread(os.path.join(out, "00001.png"), -1)
        np.testing.assert_array_equal(
            depth, frames[2].depth_mm(header.depth_hw))
        pose = np.loadtxt(os.path.join(out, "00001.txt"))
        np.testing.assert_allclose(pose, frames[2].camera_to_world,
                                   atol=1e-6)


class TestNative:
    def test_build_and_inflate(self, rng):
        build()
        assert native_available()
        data = rng.integers(0, 255, size=5000, dtype=np.uint8).tobytes()
        comp = zlib.compress(data)
        assert zlib_inflate(comp) == data
        assert zlib_inflate(comp, expected_size=5000) == data

    def test_batch_inflate(self, rng):
        build()
        payloads = [rng.integers(0, 65535, size=192, dtype=np.uint16)
                    for _ in range(20)]
        streams = [zlib.compress(p.tobytes()) for p in payloads]
        out = zlib_inflate_batch(streams, expected_size=384, n_threads=4)
        for p, o in zip(payloads, out):
            np.testing.assert_array_equal(
                np.frombuffer(o, dtype=np.uint16), p)
        stack = inflate_depth_frames(streams, (12, 16))
        assert stack.shape == (20, 12, 16)
        np.testing.assert_array_equal(stack[3], payloads[3].reshape(12, 16))


class TestPosedImagesInfo:
    def test_build_images_info_and_scene_from_sens(self, tmp_path, rng):
        from multi_spatialmllm_tpu.ingest.posed_images import (
            build_images_info,
            scene_from_sens,
        )

        path = str(tmp_path / "scene.sens")
        header, frames = _make_sens_fixture(path, rng, n_frames=10)
        out = str(tmp_path / "posed" / "scene9999_00")
        S.export_posed_images(path, out, frame_skip=1,
                              inflate=zlib.decompress)
        info = build_images_info(out, frame_skip=5)
        assert info["num_posed_images"] == 2
        assert set(info["images_info"].keys()) == {"00000", "00005"}
        np.testing.assert_allclose(
            info["images_info"]["00005"]["extrinsic_matrix"],
            frames[5].camera_to_world, atol=1e-6)
        np.testing.assert_allclose(info["intrinsic_matrix"],
                                   header.intrinsic_color, atol=1e-6)

        scan, scan_dir, *_ = _make_scan_fixture(tmp_path, rng)
        arrays = SE.export_scene_arrays(
            os.path.join(scan_dir, f"{scan}_vh_clean_2.ply"),
            os.path.join(scan_dir, f"{scan}.aggregation.json"),
            os.path.join(scan_dir, f"{scan}_vh_clean_2.0.010000.segs.json"),
            os.path.join(scan_dir, f"{scan}.txt"))
        scene = scene_from_sens(path, scan, arrays, frame_skip=5)
        assert scene.num_images == 2
        assert scene.image_ids == ["00000", "00005"]
        assert scene.depth_maps.shape == (2, *header.depth_hw)
        assert scene.num_points == len(arrays["aligned_points"])


class TestTapvid:
    def test_record_validation(self, tmp_path, rng):
        from multi_spatialmllm_tpu.core.synthetic import make_tapvid_npz

        path = str(tmp_path / "rec.npz")
        make_tapvid_npz(path, seed=9)
        rec = TV.load_record(path)
        assert rec["extrinsics_w2c"].shape[1:] == (4, 4)
        bad = {k: rec[k] for k in rec if k != "visibility"}
        with pytest.raises(ValueError):
            TV.validate_record(bad)

    def test_split_lists(self, tmp_path):
        meta = tmp_path / "meta" / "adt"
        meta.mkdir(parents=True)
        (meta / "train.txt").write_text("seq_a\nseq_b\n\n")
        ids = TV.load_split_list(str(tmp_path / "meta"), "adt", "train")
        assert ids == ["seq_a", "seq_b"]

    def test_vendored_meta_lists(self):
        """meta_data_dir=None loads the VENDORED split lists
        (data/tapvid3d_meta, provenance in its README) with the
        reference's published counts, and they match the reference's
        shipped lists id-for-id when the reference is mounted."""
        for (sub, split), want in TV.EXPECTED_SPLIT_COUNTS.items():
            ids = TV.load_split_list(None, sub, split)
            assert len(ids) == want
            assert len(set(ids)) == want  # no duplicate scene ids
            ref = "/root/reference/data/tapvid3d_dataset/meta_data"
            if os.path.isdir(ref):
                assert ids == TV.load_split_list(ref, sub, split)

    def test_reference_meta_lists_present(self):
        # The reference ships the official split lists; verify our loader
        # reads them (read-only access).
        meta = "/root/reference/data/tapvid3d_dataset/meta_data"
        if not os.path.isdir(meta):
            pytest.skip("reference meta_data not mounted")
        adt_train = TV.load_split_list(meta, "adt", "train")
        adt_val = TV.load_split_list(meta, "adt", "val")
        ps_train = TV.load_split_list(meta, "pstudio", "train")
        ps_val = TV.load_split_list(meta, "pstudio", "val")
        assert (len(adt_train), len(adt_val)) == (1647, 309)
        assert (len(ps_train), len(ps_val)) == (131, 25)


class TestIngestSensCLI:
    def test_cli_builds_scene_packs(self, tmp_path, rng):
        """The ingest-sens CLI surface: raw scan dir (.sens + mesh/agg/
        segs/meta) -> scene npz packs loadable by SceneStore."""
        import subprocess
        import sys

        from multi_spatialmllm_tpu.core.scene import SceneStore

        scans_root = tmp_path / "scans"
        scans_root.mkdir()
        scan, scan_dir, *_ = _make_scan_fixture(scans_root, rng)
        _make_sens_fixture(str(os.path.join(scan_dir, f"{scan}.sens")), rng)
        env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
        out_dir = tmp_path / "packs"
        r = subprocess.run(
            [sys.executable, "-m", "multi_spatialmllm_tpu", "ingest-sens",
             "--scans", str(scans_root), "--output", str(out_dir),
             "--frame-skip", "2"],
            capture_output=True, text=True, env=env,
            cwd=os.path.join(os.path.dirname(__file__), ".."))
        assert r.returncode == 0, r.stderr[-800:]
        store = SceneStore(str(out_dir))
        loaded = store.get(scan)
        assert loaded.num_images == 4  # 7 frames, skip 2 -> 0,2,4,6
        assert loaded.num_points == 200
