"""Tests for box/IoU/AABB/outlier ops against hand-computed values and
NumPy oracles (reference: handler/ops.py)."""

import numpy as np
import jax.numpy as jnp

from multi_spatialmllm_tpu.core import boxes as B


class TestCorners:
    def test_unit_box(self):
        c = np.asarray(B.box_corners(jnp.asarray([0.0, 0.0, 0.0, 2.0, 2.0, 2.0])))
        assert c.shape == (8, 3)
        # reference order: first corner is (-,-,-), last is (+,+,+)
        np.testing.assert_allclose(c[0], [-1, -1, -1])
        np.testing.assert_allclose(c[7], [1, 1, 1])
        assert {tuple(r) for r in c.tolist()} == {
            (x, y, z) for x in (-1.0, 1.0) for y in (-1.0, 1.0) for z in (-1.0, 1.0)
        }


class TestIoU:
    def test_iou2d(self):
        m1 = np.zeros((4, 4), bool); m1[:2] = True
        m2 = np.zeros((4, 4), bool); m2[1:3] = True
        iou = float(B.iou_2d(jnp.asarray(m1), jnp.asarray(m2)))
        np.testing.assert_allclose(iou, 4 / 12)
        assert float(B.iou_2d(jnp.zeros((2, 2), bool), jnp.zeros((2, 2), bool))) == 0.0

    def test_iou3d(self):
        b1 = jnp.asarray([0.0, 0.0, 0.0, 2.0, 2.0, 2.0])
        b2 = jnp.asarray([1.0, 0.0, 0.0, 2.0, 2.0, 2.0])
        # overlap 1x2x2=4; union 8+8-4=12
        np.testing.assert_allclose(float(B.iou_3d(b1, b2)), 4 / 12)
        b3 = jnp.asarray([10.0, 0.0, 0.0, 2.0, 2.0, 2.0])
        assert float(B.iou_3d(b1, b3)) == 0.0
        np.testing.assert_allclose(float(B.iou_3d(b1, b1)), 1.0)


class TestAABB:
    def test_aabb_with_padding(self, rng):
        pts = rng.normal(size=(50, 3))
        pad = np.concatenate([pts, np.full((14, 3), 1e9)])
        valid = np.concatenate([np.ones(50, bool), np.zeros(14, bool)])
        got = np.asarray(B.aabb(jnp.asarray(pad), jnp.asarray(valid)))
        lo, hi = pts.min(0), pts.max(0)
        np.testing.assert_allclose(got[:3], (lo + hi) / 2, atol=1e-12)
        np.testing.assert_allclose(got[3:], hi - lo, atol=1e-12)

    def test_coverage_extent(self, rng):
        pts = rng.normal(size=(32, 3))
        valid = rng.random(32) < 0.5
        ext = float(B.coverage_extent(jnp.asarray(pts), jnp.asarray(valid), 1))
        ys = pts[valid, 1]
        np.testing.assert_allclose(ext, ys.max() - ys.min(), atol=1e-12)
        none = float(B.coverage_extent(jnp.asarray(pts), jnp.zeros(32, bool), 0))
        assert none == -np.inf


class TestOutliers:
    def test_truncated_matches_argsort_oracle(self, rng):
        pts = rng.normal(size=(100, 3))
        tx, ty, tz = 0.1, 0.05, 0.0
        mask = np.asarray(B.truncated_outlier_mask(jnp.asarray(pts), tx, ty, tz))
        # Oracle: rank-based trim per axis (handler/ops.py:185-203 semantics).
        n = 100
        keep = np.ones(n, bool)
        for axis, t in ((0, tx), (1, ty), (2, tz)):
            cut = int(t * n)
            if cut == 0:
                continue
            order = np.argsort(pts[:, axis])
            ok = np.zeros(n, bool)
            ok[order[cut:-cut]] = True
            keep &= ok
        np.testing.assert_array_equal(mask, keep)

    def test_statistical_keeps_cluster_drops_far_point(self, rng):
        cluster = rng.normal(size=(64, 3)) * 0.1
        outlier = np.array([[50.0, 50.0, 50.0]])
        pts = np.concatenate([cluster, outlier])
        mask = np.asarray(B.statistical_outlier_mask(jnp.asarray(pts), 10, 1.0))
        assert not mask[-1]
        assert mask[:-1].mean() > 0.8


class TestSharpness:
    def test_matches_cv2_laplacian(self, rng):
        import cv2

        img = (rng.random((32, 40)) * 255).astype(np.uint8)
        ours = float(B.laplacian_sharpness(jnp.asarray(img.astype(np.float64))))
        ref = cv2.Laplacian(img, cv2.CV_64F).var()
        np.testing.assert_allclose(ours, ref, rtol=1e-10)
