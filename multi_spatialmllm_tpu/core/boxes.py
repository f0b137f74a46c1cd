"""Bounding boxes, IoU, AABB and point-cloud filtering (JAX).

TPU-native equivalent of `spatial_engine/utils/scannet_utils/handler/ops.py`
(reference lines cited per function). Everything is batched and jit-able;
the Open3D statistical-outlier dependency of the reference is replaced by a
pure-JAX k-NN formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def box_corners(boxes: Array) -> Array:
    """Eight corners of center/size boxes.

    Parity: handler/ops.py:37-94 (`convert_to_corners`), same corner order
    (x varies fastest, then y, then z).

    Args:
      boxes: `[..., 6+]` with `[cx, cy, cz, dx, dy, dz, ...]`.
    Returns:
      `[..., 8, 3]` corners.
    """
    c = boxes[..., :3]
    h = boxes[..., 3:6] / 2
    # Signs in the reference's order: (-,-,-), (+,-,-), (-,+,-), (+,+,-),
    # (-,-,+), (+,-,+), (-,+,+), (+,+,+)
    signs = jnp.array(
        [
            [-1, -1, -1], [1, -1, -1], [-1, 1, -1], [1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [-1, 1, 1], [1, 1, 1],
        ],
        dtype=boxes.dtype,
    )
    return c[..., None, :] + signs * h[..., None, :]


def iou_2d(mask1: Array, mask2: Array) -> Array:
    """IoU of two binary masks. Parity: handler/ops.py:97-111."""
    inter = jnp.sum(jnp.logical_and(mask1, mask2))
    union = jnp.sum(jnp.logical_or(mask1, mask2))
    return jnp.where(union != 0, inter / jnp.where(union != 0, union, 1), 0.0)


def iou_3d(box1: Array, box2: Array) -> Array:
    """IoU of two axis-aligned center/size boxes `[x,y,z,dx,dy,dz]`.

    Parity: handler/ops.py:114-135 (zero intersection if any overlap dim
    is non-positive).
    """
    inter_min = jnp.maximum(box1[..., :3] - box1[..., 3:6] / 2,
                            box2[..., :3] - box2[..., 3:6] / 2)
    inter_max = jnp.minimum(box1[..., :3] + box1[..., 3:6] / 2,
                            box2[..., :3] + box2[..., 3:6] / 2)
    inter_dim = inter_max - inter_min
    inter_vol = jnp.where(
        jnp.all(inter_dim > 0, axis=-1), jnp.prod(inter_dim, axis=-1), 0.0
    )
    v1 = jnp.prod(box1[..., 3:6], axis=-1)
    v2 = jnp.prod(box2[..., 3:6], axis=-1)
    return inter_vol / (v1 + v2 - inter_vol)


def aabb(points: Array, valid: Array | None = None) -> Array:
    """Axis-aligned bounding box `[cx, cy, cz, dx, dy, dz]` of a point set.

    Parity: handler/ops.py:211-232 (`calculate_aabb`). `valid` masks padded
    rows (statically-shaped stand-in for the reference's ragged arrays).
    """
    pts = points[..., :3]
    if valid is not None:
        big = jnp.asarray(jnp.inf, pts.dtype)
        lo = jnp.min(jnp.where(valid[..., None], pts, big), axis=-2)
        hi = jnp.max(jnp.where(valid[..., None], pts, -big), axis=-2)
    else:
        lo = jnp.min(pts, axis=-2)
        hi = jnp.max(pts, axis=-2)
    return jnp.concatenate([(hi + lo) / 2, hi - lo], axis=-1)


def coverage_extent(points: Array, valid: Array, axis: int) -> Array:
    """max - min of one coordinate over the valid subset (scalar).

    Parity: object_perception/single_object_coverage_finder.py:57-65
    (`compute_coverage`). Returns -inf when nothing is valid so that any
    tolerance check fails (reference returns None).
    """
    coords = points[..., axis]
    big = jnp.asarray(jnp.inf, coords.dtype)
    lo = jnp.min(jnp.where(valid, coords, big), axis=-1)
    hi = jnp.max(jnp.where(valid, coords, -big), axis=-1)
    return hi - lo


def truncated_outlier_mask(points: Array, tx: float, ty: float, tz: float) -> Array:
    """Per-axis percentile trim mask (True = keep).

    Parity: handler/ops.py:163-208 (`remove_truncated_outliers`): for each
    axis, drop the `int(t * N)` smallest and largest values by sorted rank;
    keep the intersection. A point survives axis `a` iff its rank along `a`
    lies in `[n_a, N - n_a)`; if `2 n_a >= N` nothing survives.
    """
    n = points.shape[-2]

    def axis_mask(coords: Array, t: float) -> Array:
        cut = int(t * n)
        if cut == 0:
            return jnp.ones(coords.shape, dtype=bool)
        if 2 * cut >= n:
            return jnp.zeros(coords.shape, dtype=bool)
        order = jnp.argsort(coords, axis=-1)
        ranks = jnp.zeros_like(order).at[order].set(
            jnp.arange(n, dtype=order.dtype)
        )
        return (ranks >= cut) & (ranks < n - cut)

    return (
        axis_mask(points[..., 0], tx)
        & axis_mask(points[..., 1], ty)
        & axis_mask(points[..., 2], tz)
    )


def statistical_outlier_mask(
    points: Array, nb_neighbors: int = 20, std_ratio: float = 1.0
) -> Array:
    """Statistical outlier mask (True = keep), Open3D-compatible semantics.

    Replaces the reference's Open3D call (handler/ops.py:138-160): for every
    point compute the mean distance to its `nb_neighbors` nearest neighbours,
    keep points whose mean distance <= mean + std_ratio * std over the cloud.
    Dense `[N, N]` distances — one MXU-friendly Gram matrix — which is the
    right trade on TPU for the per-object clouds this is applied to.
    """
    pts = points[..., :3]
    sq = jnp.sum(pts * pts, axis=-1)
    d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * (pts @ jnp.swapaxes(pts, -1, -2))
    d2 = jnp.maximum(d2, 0.0)
    n = pts.shape[-2]
    k = min(nb_neighbors, n - 1)
    # smallest k+1 distances include self (0); drop the first column.
    neg_topk = -jax.lax.top_k(-d2, k + 1)[0][..., 1:]
    mean_knn = jnp.mean(jnp.sqrt(neg_topk), axis=-1)
    mu = jnp.mean(mean_knn, axis=-1, keepdims=True)
    sigma = jnp.std(mean_knn, axis=-1, keepdims=True)
    return mean_knn <= mu + std_ratio * sigma


def laplacian_sharpness(gray_image: Array) -> Array:
    """Variance of the 3x3 Laplacian response (image sharpness score).

    Parity: handler/ops.py:14-34 (`calculate_image_sharpness`), which uses
    `cv2.Laplacian(CV_64F)` — the 4-neighbour kernel [[0,1,0],[1,-4,1],
    [0,1,0]] with BORDER_REFLECT_101 — then takes the variance.
    """
    img = gray_image.astype(jnp.float64 if gray_image.dtype == jnp.float64 else jnp.float32)
    padded = jnp.pad(img, 1, mode="reflect")  # reflect_101 == jnp 'reflect'
    lap = (
        padded[:-2, 1:-1]
        + padded[2:, 1:-1]
        + padded[1:-1, :-2]
        + padded[1:-1, 2:]
        - 4.0 * img
    )
    return jnp.var(lap)
