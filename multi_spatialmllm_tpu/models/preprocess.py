"""Image preprocessing for the multi-frame MLLM.

Mirrors the InternVL-2 recipe the reference trains with (README.md:196-198:
images resized to 1296x968, dynamic aspect-ratio tiling with at most 6
tiles per image plus a thumbnail, 448x448 tiles): host-side decode +
resize, then device-friendly normalize/patchify — the tile tensor feeds
models/mllm.py directly.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# ImageNet normalization used by InternViT-style encoders.
MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    tile_size: int = 448
    max_tiles: int = 6
    use_thumbnail: bool = True
    resize_hw: tuple[int, int] | None = (968, 1296)  # reference train size


def candidate_grids(max_tiles: int) -> list[tuple[int, int]]:
    """All (cols, rows) grids with 1 <= cols*rows <= max_tiles."""
    grids = []
    for n in range(1, max_tiles + 1):
        for cols in range(1, n + 1):
            if n % cols == 0:
                grids.append((cols, n // cols))
    return sorted(set(grids), key=lambda g: g[0] * g[1])


def select_grid(width: int, height: int, max_tiles: int,
                tile_size: int) -> tuple[int, int]:
    """Pick the tile grid whose aspect ratio best matches the image
    (InternVL's dynamic-preprocess closest-ratio rule; ties broken toward
    more area when the image is large enough)."""
    aspect = width / height
    best, best_diff = (1, 1), float("inf")
    area = width * height
    for cols, rows in candidate_grids(max_tiles):
        diff = abs(aspect - cols / rows)
        if diff < best_diff or (
            diff == best_diff
            and area > 0.5 * tile_size * tile_size * cols * rows
            and cols * rows > best[0] * best[1]
        ):
            best, best_diff = (cols, rows), diff
    return best


def _resize(image: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    import cv2

    return cv2.resize(image, (hw[1], hw[0]), interpolation=cv2.INTER_AREA)


def tile_image(image: np.ndarray, config: PreprocessConfig | None = None
               ) -> np.ndarray:
    """RGB uint8 `[H, W, 3]` -> normalized float32 tiles
    `[n_tiles, tile, tile, 3]` (grid tiles + optional thumbnail)."""
    config = config or PreprocessConfig()
    if config.resize_hw is not None:
        image = _resize(image, config.resize_hw)
    h, w = image.shape[:2]
    cols, rows = select_grid(w, h, config.max_tiles, config.tile_size)
    resized = _resize(image, (rows * config.tile_size,
                              cols * config.tile_size))
    tiles = []
    for r in range(rows):
        for c in range(cols):
            t = resized[r * config.tile_size:(r + 1) * config.tile_size,
                        c * config.tile_size:(c + 1) * config.tile_size]
            tiles.append(t)
    if config.use_thumbnail and len(tiles) > 1:
        tiles.append(_resize(image, (config.tile_size, config.tile_size)))
    stack = np.stack(tiles).astype(np.float32) / 255.0
    return (stack - MEAN) / STD


def tile_images(images: list[np.ndarray],
                config: PreprocessConfig | None = None,
                pad_to: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Tile several frames into one `[total_tiles, tile, tile, 3]` tensor
    plus per-frame tile counts; optionally zero-pad the tile axis to a
    static size for jit-friendliness."""
    config = config or PreprocessConfig()
    parts = [tile_image(img, config) for img in images]
    counts = np.asarray([p.shape[0] for p in parts], dtype=np.int32)
    stack = np.concatenate(parts, axis=0)
    if pad_to is not None:
        assert stack.shape[0] <= pad_to, (stack.shape, pad_to)
        pad = np.zeros((pad_to - stack.shape[0],) + stack.shape[1:],
                       dtype=stack.dtype)
        stack = np.concatenate([stack, pad], axis=0)
    return stack, counts
