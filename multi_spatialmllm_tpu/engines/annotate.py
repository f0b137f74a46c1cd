"""Host-side image annotation for the "dot" engine variants.

The reference annotates with OpenCV inside the per-sample loop
(depth_estimation_dot_engine.py:162-173, depth_comparison_dot_engine.py
:332-346, visual_correspondence_qa_engine_dot_2_multichoice.py:357-397).
Annotation is I/O-bound host work; this module keeps the exact drawing
semantics (circle radius 10, letter offsets, distinct-color retry rule) and
decouples image *sourcing* behind a provider so engines run on reference
data, scene packs, or synthetic images alike.
"""

from __future__ import annotations

import os
from typing import Protocol

import numpy as np

from ..core.io import mkdir_or_exist

# BGR predefined fallback palette (reference: red, green, blue, black, white
# in RGB tuples; OpenCV drawing uses them as-is).
PREDEFINED_COLORS = [
    (255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 0, 0), (255, 255, 255)
]


def generate_distinct_colors(n: int, rng: np.random.Generator,
                             max_retries: int = 10) -> list[tuple]:
    """Random colors pairwise separated by Manhattan distance > 300, with a
    predefined-palette fallback (depth_estimation_coor_engine.py:22-33)."""
    colors: list[tuple] = []
    retries = 0
    while len(colors) < n and retries < max_retries:
        color = tuple(int(rng.integers(0, 256)) for _ in range(3))
        if all(
            sum(abs(c1 - c2) for c1, c2 in zip(color, existing)) > 300
            for existing in colors
        ):
            colors.append(color)
        retries += 1
    if len(colors) < n:
        pick = rng.choice(len(PREDEFINED_COLORS), size=n - len(colors),
                          replace=False)
        colors += [PREDEFINED_COLORS[int(i)] for i in pick]
    return colors


def draw_dot(image: np.ndarray, xy: tuple[int, int], color, radius: int = 10):
    import cv2

    cv2.circle(image, (int(xy[0]), int(xy[1])), radius, color, -1)


def draw_lettered_dot(
    image: np.ndarray,
    xy: tuple[int, int],
    letter: str,
    color,
    radius: int = 10,
    text_offset: tuple[int, int] = (15, 15),
    font_scale: float = 1.0,
    thickness: int = 2,
):
    import cv2

    x, y = int(xy[0]), int(xy[1])
    cv2.circle(image, (x, y), radius, color, -1)
    cv2.putText(image, letter, (x + text_offset[0], y + text_offset[1]),
                cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, thickness)


class ImageProvider(Protocol):
    """Returns the BGR color image for (scene_id, image_id)."""

    def __call__(self, scene_id: str, image_id: str) -> np.ndarray: ...


class _BoundedImageCache:
    """FIFO-bounded decoded-image cache, safe under AnnotationPool's
    worker threads. Annotated engines sample the same source image many
    times (max_n_points_per_image / per-pair draws); caching the decode
    amortizes it. Callers must .copy() before drawing (every engine
    already does)."""

    def __init__(self, max_entries: int):
        import threading

        self.max_entries = max_entries
        self._cache: dict[tuple[str, str], np.ndarray] = {}
        self._lock = threading.Lock()

    def get_or_load(self, key: tuple[str, str], load) -> np.ndarray:
        with self._lock:
            img = self._cache.get(key)
        if img is None:
            img = load()  # concurrent double-loads are harmless
            with self._lock:
                if key not in self._cache and \
                        len(self._cache) >= self.max_entries:
                    self._cache.pop(next(iter(self._cache)))
                self._cache[key] = img
        return img


class DirImageProvider:
    """Reads `{root}/{scene_id}/{image_id}.jpg` (reference posed_images
    layout, info_handler.py:126-131), with a bounded decode cache
    (default 256 entries ~ 230 MB of 480x640 frames)."""

    def __init__(self, root: str, cache_entries: int = 256):
        self.root = root
        self._cache = _BoundedImageCache(cache_entries)

    def __call__(self, scene_id: str, image_id: str) -> np.ndarray:
        def load():
            import cv2

            path = os.path.join(self.root, scene_id, f"{image_id}.jpg")
            img = cv2.imread(path)
            if img is None:
                raise FileNotFoundError(path)
            return img

        return self._cache.get_or_load((scene_id, image_id), load)


class SyntheticImageProvider:
    """Deterministic pseudo-images for tests/benchmarks (no dataset)."""

    def __init__(self, image_hw: tuple[int, int], cache_entries: int = 256):
        self.image_hw = image_hw
        self._cache = _BoundedImageCache(cache_entries)

    def __call__(self, scene_id: str, image_id: str) -> np.ndarray:
        def load():
            h, w = self.image_hw
            seed = abs(hash((scene_id, image_id))) % (2**32)
            rng = np.random.default_rng(seed)
            return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)

        return self._cache.get_or_load((scene_id, image_id), load)


def save_annotated(image: np.ndarray, image_output_dir: str,
                   relative_path: str) -> str:
    """Write an annotated jpg under the engine's image output dir; returns
    the relative path recorded in the sample's `image` list."""
    import cv2

    full = os.path.join(image_output_dir, relative_path)
    mkdir_or_exist(os.path.dirname(full))
    cv2.imwrite(full, image)
    return relative_path


class AnnotationPool:
    """Parallel decode+draw+encode for the annotated engines.

    The dot variants are annotation-bound (bench: ~3 ms cv2 JPEG encode
    per 480x640 sample); cv2 releases the GIL during decode/encode, so a
    thread pool scales them near-linearly with cores. Engines compute
    every rng-dependent value (colors, coordinates, paths) synchronously
    in row order — the submitted closure only does image work — so output
    bytes are identical to inline execution. On a single-core host
    (workers=1) it degrades to inline calls with zero overhead.
    """

    def __init__(self, workers: int | None = None):
        if workers is None:
            workers = os.cpu_count() or 1
        self._executor = None
        self._futures: list = []
        self._by_key: dict = {}
        if workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._executor = ThreadPoolExecutor(max_workers=workers)

    def submit(self, fn, key=None) -> None:
        """Run fn on the pool. Tasks sharing a key (e.g. the output image
        path) execute in submission order, so duplicate targets behave
        exactly like the inline engines (last write wins) instead of
        racing concurrent encoders on one file."""
        if self._executor is None:
            fn()
            return
        if key is None:
            self._futures.append(self._executor.submit(fn))
            return
        prev = self._by_key.get(key)

        def chained(prev=prev, fn=fn):
            if prev is not None:
                prev.result()
            fn()

        fut = self._executor.submit(chained)
        self._by_key[key] = fut
        self._futures.append(fut)

    def close(self) -> None:
        """Wait for every pending write; re-raises the first failure."""
        if self._executor is not None:
            for f in self._futures:
                f.result()
            self._executor.shutdown()
            self._futures.clear()
            self._by_key.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
