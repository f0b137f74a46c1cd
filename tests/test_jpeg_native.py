"""Native JPEG splice encoder (ingest/native/src/jpeg_encode.cpp) and the
AnnotatedJpegWriter built on it.

The splice invariant is the load-bearing property: an annotated sample
encoded via cached-row splicing must be BIT-IDENTICAL to a full native
encode of the same annotated bitmap — i.e. the dirty-row bounds cover
every pixel the draw touched and restart-marker segmentation composes.
Pixel parity vs cv2 (the reference's encoder) is asserted after decode;
byte streams intentionally differ (different encoder).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from multi_spatialmllm_tpu.ingest.native import (  # noqa: E402
    JpegSpliceCache,
    build as build_native,
    jpeg_available,
    jpeg_encode,
)

build_native()
pytestmark = pytest.mark.skipif(not jpeg_available(),
                                reason="native jpeg engine not built")


def _image(h=480, w=640, seed=0):
    """Structured pseudo-frame (gradients + texture), camera-like."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(yy // 3 + xx // 5) % 256, (xx // 2) % 256,
                    ((yy + xx) // 4) % 256], -1).astype(np.int16)
    img += rng.integers(-8, 8, img.shape)
    return np.ascontiguousarray(img.clip(0, 255).astype(np.uint8))


class TestEncoder:
    def test_valid_jpeg_and_cv2_quality_parity(self):
        img = _image()
        buf = jpeg_encode(img)
        dec = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
        assert dec is not None and dec.shape == img.shape
        err = np.abs(dec.astype(np.int16) - img.astype(np.int16))
        ok, cvbuf = cv2.imencode(".jpg", img)
        deccv = cv2.imdecode(cvbuf, cv2.IMREAD_COLOR)
        errcv = np.abs(deccv.astype(np.int16) - img.astype(np.int16))
        # same quality class as cv2's default (quality-95 baseline)
        assert err.mean() <= errcv.mean() * 1.25 + 0.5
        assert err.max() <= max(errcv.max() * 2, 64)

    @pytest.mark.parametrize("hw", [(480, 640), (120, 160), (100, 90)])
    def test_roundtrip_shapes(self, hw):
        img = _image(*hw, seed=3)
        buf = jpeg_encode(img)
        dec = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
        assert dec.shape == img.shape
        assert np.abs(dec.astype(np.int16) - img.astype(np.int16)).mean() < 12

    def test_splice_equals_full_encode(self):
        """Randomized dots (incl. image-border positions): splice output
        must be bit-identical to a full native encode of the annotated
        bitmap."""
        img = _image(seed=5)
        cache = JpegSpliceCache()
        rng = np.random.default_rng(7)
        try:
            for trial in range(12):
                x = int(rng.integers(0, 640))
                y = int(rng.integers(0, 480))
                ann = img.copy()
                cv2.circle(ann, (x, y), 10, (0, 0, 255), -1)
                cv2.putText(ann, "B", (x + 15, y + 15),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 0, 255), 2)
                (tw, th), baseline = cv2.getTextSize(
                    "B", cv2.FONT_HERSHEY_SIMPLEX, 1.0, 2)
                y0 = min(y - 11, y + 15 - th - 2 - 1)
                y1 = max(y + 12, y + 15 + baseline + 2 + 1)
                spliced = cache.encode("k", img, ann, y0, y1)
                full = jpeg_encode(ann)
                assert spliced == full, (trial, x, y)
        finally:
            cache.close()

    def test_column_splice_equals_full_encode(self):
        """Bit-granular column splicing (fresh MCUs + recoded bridge DC
        diffs + bit-copied remainder) must be BIT-IDENTICAL to a full
        native encode — randomized dot positions incl. image corners and
        multi-rect spans."""
        img = _image(seed=8)
        cache = JpegSpliceCache()
        rng = np.random.default_rng(11)
        try:
            for trial in range(16):
                ann = img.copy()
                spans = []
                for _ in range(int(rng.integers(1, 4))):
                    x = int(rng.integers(0, 640))
                    y = int(rng.integers(0, 480))
                    cv2.circle(ann, (x, y), 10, (0, 255, 0), -1)
                    spans.append((y - 11, y + 12, x - 11, x + 12))
                got = cache.encode_cols("k", img, ann, spans)
                assert got == jpeg_encode(ann), (trial, spans)
        finally:
            cache.close()

    def test_column_splice_edge_clipped_dots(self):
        """Dots clipped at every image edge: their spans go negative /
        past the frame, which must clamp — a negative x0 reaching the
        native side means 'row clean' and silently drops the
        annotation (regression)."""
        img = _image(seed=9)
        cache = JpegSpliceCache()
        try:
            for i, (x, y) in enumerate(
                    [(3, 200), (637, 200), (320, 4), (320, 477),
                     (0, 0), (639, 479)]):
                ann = img.copy()
                cv2.circle(ann, (x, y), 10, (0, 255, 0), -1)
                spans = [(y - 11, y + 12, x - 11, x + 12)]
                got = cache.encode_cols(f"edge{i}", img, ann, spans)
                assert got == jpeg_encode(ann), (i, x, y)
        finally:
            cache.close()


    def test_multi_interval_same_row_splice(self):
        """Two+ dirty rects far apart on the SAME MCU row: the span
        entry point re-encodes each rect's MCUs separately (clean MCUs
        between them bit-copy with recoded bridge DCs) and must still
        be BIT-IDENTICAL to a full encode — including adjacent and
        overlapping rects that merge into one interval."""
        img = _image(seed=12)
        cache = JpegSpliceCache()
        rng = np.random.default_rng(13)
        try:
            cases = [
                [(100, 123, 20, 43), (100, 123, 590, 613)],   # far apart
                [(100, 123, 20, 43), (104, 127, 52, 75)],     # adjacent
                [(100, 123, 20, 43), (96, 119, 30, 53)],      # overlap
                [(100, 123, 20, 43), (100, 123, 300, 323),
                 (100, 123, 590, 613)],                        # three
                [(0, 23, 0, 23), (0, 23, 617, 640)],          # corners
            ]
            for _ in range(8):  # randomized same-row multi-dot fuzz
                y = int(rng.integers(0, 468))
                xs = sorted(int(rng.integers(0, 629)) for _ in range(3))
                cases.append([(y, y + 12, x, x + 11) for x in xs])
            for ci, spans in enumerate(cases):
                ann = img.copy()
                for y0, y1, x0, x1 in spans:
                    ann[max(0, y0):y1, max(0, x0):x1] = (0, 255, 0)
                got = cache.encode_cols(f"mi{ci}", img, ann, spans)
                assert got == jpeg_encode(ann), (ci, spans)
        finally:
            cache.close()


    def test_splice_detects_handle_reuse(self):
        """Two different base frames under different keys don't cross."""
        a, b = _image(seed=1), _image(seed=2)
        cache = JpegSpliceCache()
        try:
            ann_a = a.copy()
            cv2.circle(ann_a, (100, 100), 10, (255, 0, 0), -1)
            ann_b = b.copy()
            cv2.circle(ann_b, (100, 100), 10, (255, 0, 0), -1)
            sa = cache.encode("a", a, ann_a, 89, 112)
            sb = cache.encode("b", b, ann_b, 89, 112)
            assert sa == jpeg_encode(ann_a)
            assert sb == jpeg_encode(ann_b)
        finally:
            cache.close()


class TestAnnotatedJpegWriter:
    def _provider(self):
        from multi_spatialmllm_tpu.engines.annotate import (
            SyntheticImageProvider,
        )

        return SyntheticImageProvider((480, 640))

    def test_native_matches_full_encode_and_cv2_pixels(self, tmp_path):
        from multi_spatialmllm_tpu.engines.annotate import (
            AnnotatedJpegWriter,
            draw_lettered_dot,
        )

        provider = self._provider()
        wr = AnnotatedJpegWriter(provider, str(tmp_path / "nat"),
                                 use_native=True)
        cv = AnnotatedJpegWriter(provider, str(tmp_path / "cv"),
                                 use_native=False)
        dots = [((320, 240), "A", (255, 0, 0)),
                ((50, 470), "B", (0, 255, 0))]  # second near bottom edge
        for w_ in (wr, cv):
            w_.write_lettered_dots("s0", "00000", dots, "s0/x.jpg")
            w_.write_dot("s0", "00000", (630, 5), (0, 0, 255),
                         "s0/y.jpg")  # top-right corner
        wr.close()
        cv.close()
        for name in ("x.jpg", "y.jpg"):
            nat = cv2.imread(str(tmp_path / "nat" / "s0" / name))
            ref = cv2.imread(str(tmp_path / "cv" / "s0" / name))
            assert nat is not None and ref is not None
            # both are q95 encodes of the SAME annotated bitmap
            d = np.abs(nat.astype(np.int16) - ref.astype(np.int16))
            assert d.mean() < 6, (name, d.mean())

        # splice invariant through the writer: bytes == full native
        # encode of an identically drawn bitmap
        base = provider("s0", "00000")
        ann = base.copy()
        for xy, letter, color in dots:
            draw_lettered_dot(ann, xy, letter, color)
        assert (tmp_path / "nat" / "s0" / "x.jpg").read_bytes() == \
            jpeg_encode(ann)

    def test_native_fallback_never_writes_stale_scratch(self, tmp_path):
        """If the native column splice fails (evicted handle, short cap),
        the multi-dot path must rebuild a fully-valid frame — the
        per-thread scratch's clean rows hold a PREVIOUS frame's pixels
        (regression: the fallback used to save the scratch directly)."""
        from multi_spatialmllm_tpu.engines.annotate import (
            AnnotatedJpegWriter,
            draw_lettered_dot,
        )

        provider = self._provider()
        wr = AnnotatedJpegWriter(provider, str(tmp_path / "nat"),
                                 use_native=True)
        assert wr._splice is not None
        dots = [((320, 100), "A", (255, 0, 0)),
                ((100, 400), "B", (0, 255, 0))]
        # poison the scratch with a different frame, then force the
        # native path to refuse
        other = provider("s0", "00001")
        wr._scratch_like(other)[:] = other
        wr._splice.encode_cols = lambda *a, **k: None
        wr.write_lettered_dots("s0", "00000", dots, "s0/f.jpg")
        wr.close()

        got = cv2.imread(str(tmp_path / "nat" / "s0" / "f.jpg"))
        want = provider("s0", "00000").copy()
        for xy, letter, color in dots:
            draw_lettered_dot(want, xy, letter, color)
        d = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert d.mean() < 6, d.mean()  # q95 re-encode of the SAME bitmap
        # and specifically: no row came from the poisoned frame
        stale = np.abs(got.astype(np.int16) - other.astype(np.int16))
        assert stale.mean() > 10


class TestGlyphMaskStamping:
    """draw_dot / draw_lettered_dot stamp cached cv2-rendered glyph masks
    instead of dispatching cv2 per draw — the stamp must reproduce direct
    cv2.circle + cv2.putText BIT-exactly at every position, including
    draws clipped at each image border."""

    def test_stamp_equals_cv2_everywhere(self):
        from multi_spatialmllm_tpu.engines.annotate import (
            draw_dot,
            draw_lettered_dot,
        )

        rng = np.random.default_rng(7)
        base = rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
        # positions covering interior + all four borders + fully outside
        xys = [(80, 60), (0, 0), (159, 119), (-5, 60), (80, -7),
               (158, 60), (80, 118), (-30, -30), (200, 200),
               (3, 60), (80, 3), (156, 117)]
        for i, xy in enumerate(xys):
            color = tuple(int(c) for c in rng.integers(0, 256, size=3))
            got = base.copy()
            want = base.copy()
            draw_dot(got, xy, color)
            cv2.circle(want, (int(xy[0]), int(xy[1])), 10, color, -1)
            np.testing.assert_array_equal(got, want, err_msg=f"dot {xy}")
            for letter in "ABCD":
                got = base.copy()
                want = base.copy()
                draw_lettered_dot(got, xy, letter, color)
                cv2.circle(want, (int(xy[0]), int(xy[1])), 10, color, -1)
                cv2.putText(want, letter,
                            (int(xy[0]) + 15, int(xy[1]) + 15),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.0, color, 2)
                np.testing.assert_array_equal(
                    got, want, err_msg=f"letter {letter} at {xy}")

    def test_stamp_random_fuzz(self):
        from multi_spatialmllm_tpu.engines.annotate import draw_lettered_dot

        rng = np.random.default_rng(11)
        base = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
        for _ in range(50):
            xy = (int(rng.integers(-40, 680)), int(rng.integers(-40, 520)))
            letter = "ABCD"[int(rng.integers(0, 4))]
            color = tuple(int(c) for c in rng.integers(0, 256, size=3))
            got = base.copy()
            want = base.copy()
            draw_lettered_dot(got, xy, letter, color)
            cv2.circle(want, (int(xy[0]), int(xy[1])), 10, color, -1)
            cv2.putText(want, letter, (int(xy[0]) + 15, int(xy[1]) + 15),
                        cv2.FONT_HERSHEY_SIMPLEX, 1.0, color, 2)
            np.testing.assert_array_equal(got, want)
