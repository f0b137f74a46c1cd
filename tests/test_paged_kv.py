"""Paged-KV serving tests: allocator, greedy parity vs the contiguous
continuous batcher, pool-pressure deferral/preemption, and the
too-small-pool guard. (The reference has no serving stack — this
subsystem is beyond-reference; see models/paged_kv.py.)"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.generate import (
    greedy_generate,
    pad_to_bucket,
)
from multi_spatialmllm_tpu.models.paged_kv import (
    PagedBatcher,
    PagedConfig,
    PageAllocator,
)


class TestPageAllocator:
    def test_alloc_release_cycle(self):
        a = PageAllocator(8)           # pages 1..7 usable, 0 is the sink
        assert a.available == 7
        got = a.alloc(7)
        assert sorted(got) == list(range(1, 8))
        assert a.alloc(1) is None      # dry
        assert a.alloc(0) == []
        a.release(got[:3])
        assert a.available == 3
        assert a.alloc(4) is None      # all-or-nothing
        assert len(a.alloc(3)) == 3

    def test_sink_page_never_allocated(self):
        a = PageAllocator(4)
        assert 0 not in a.alloc(3)
        with pytest.raises(AssertionError):
            a.release([0])


def _tiny_model_and_requests(n_requests=7, seed=5, lens=None):
    cfg = M.tiny_config()
    model = M.MultiFrameMLLM(cfg)
    init_batch = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
    params = model.init(jax.random.key(0), init_batch["input_ids"],
                        init_batch["tiles"])
    t_img = cfg.tokens_per_tile
    rng = np.random.default_rng(seed)
    requests = []
    if lens is None:
        lens = (40, 56, 48, 63, 44, 60, 52, 62, 47)
    lens = lens[:n_requests]
    for i, seq_len in enumerate(lens):
        ids = rng.integers(10, cfg.llm.vocab_size,
                           size=seq_len).astype(np.int32)
        ids[1:1 + t_img] = cfg.img_context_id
        tiles = np.asarray(jax.random.normal(
            jax.random.key(100 + i),
            (1, cfg.vit.image_size, cfg.vit.image_size, 3),
            dtype=jnp.float32))
        requests.append((ids, tiles))
    return cfg, model, params, requests


def _expected(model, params, requests, eos, max_new):
    want = []
    for ids, tiles in requests:
        prompt = pad_to_bucket(ids[None], 64, 0)
        w = np.asarray(greedy_generate(
            model, params, jnp.asarray(prompt), jnp.asarray(tiles[None]),
            max_new_tokens=max_new, eos_id=eos,
            prompt_len=len(ids)))[0]
        if eos in w:
            w = w[: int(np.where(w == eos)[0][0])]
        want.append(w)
    return want


class TestPagedDecodeKernel:
    """Pallas paged-attention decode kernel vs the XLA gather path
    (interpret mode on CPU; the same kernel runs compiled on TPU —
    scripts/profiles/_paged_drive.py)."""

    @staticmethod
    def _window_reference(q, kp, vp, pt, idx):
        """The models/llm.py gather path, verbatim semantics."""
        b, h, _, hd = q.shape
        kvh, ps = kp.shape[1], kp.shape[2]
        rep = h // kvh
        kw = kp[pt]                           # [B, PPS, KVH, ps, hd]
        vw = vp[pt]
        win = kw.shape[1] * kw.shape[3]
        k = kw.transpose(0, 2, 1, 3, 4).reshape(b, kvh, win, hd)
        v = vw.transpose(0, 2, 1, 3, 4).reshape(b, kvh, win, hd)
        qg = q.reshape(b, kvh, rep, 1, hd)
        s = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k).astype(jnp.float32)
        s = s * (hd ** -0.5)
        valid = jnp.arange(win)[None, None, None, None, :] <= \
            idx[:, None, None, None, None]
        s = jnp.where(valid, s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bgrqk,bgkd->bgrqd", p, v).reshape(b, h, 1, hd)

    @pytest.mark.parametrize("kvh,h", [(2, 4), (3, 3)])
    def test_matches_window_reference(self, kvh, h):
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops.paged_attention import (
            paged_decode_attention,
        )

        b, ps, pps, pool, hd = 3, 16, 4, 12, 64
        keys = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(keys[0], (b, h, 1, hd), dtype=jnp.float32)
        kp = jax.random.normal(keys[1], (pool, kvh, ps, hd),
                               dtype=jnp.float32)
        vp = jax.random.normal(keys[2], (pool, kvh, ps, hd),
                               dtype=jnp.float32)
        # distinct pages per slot, unallocated tails at the sink; rows
        # exercise mid-page, page-boundary, and single-page positions
        pt = jnp.asarray([[1, 4, 7, 0],
                          [2, 5, 0, 0],
                          [3, 0, 0, 0]], dtype=jnp.int32)
        idx = jnp.asarray([ps * 2 + 5, ps * 2 - 1, 3], dtype=jnp.int32)
        with pltpu.force_tpu_interpret_mode():
            out = paged_decode_attention(q, kp, vp, pt, idx)
        want = self._window_reference(q, kp, vp, pt, idx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-5)

    def test_fused_write_matches_scatter_then_attend(self):
        """k_new/v_new: the kernel lands the new kv rows in the pools
        itself (aliased) — must equal an XLA scatter followed by the
        window reference, and the returned pools must equal the
        scattered pools exactly."""
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops.paged_attention import (
            paged_decode_attention,
        )

        b, h, kvh, ps, pool, hd = 3, 4, 2, 16, 12, 64
        keys = jax.random.split(jax.random.key(2), 5)
        q = jax.random.normal(keys[0], (b, h, 1, hd), dtype=jnp.float32)
        kp = jax.random.normal(keys[1], (pool, kvh, ps, hd),
                               dtype=jnp.float32)
        vp = jax.random.normal(keys[2], (pool, kvh, ps, hd),
                               dtype=jnp.float32)
        kn = jax.random.normal(keys[3], (b, kvh, hd), dtype=jnp.float32)
        vn = jax.random.normal(keys[4], (b, kvh, hd), dtype=jnp.float32)
        pt = jnp.asarray([[1, 4, 7, 0],
                          [2, 5, 0, 0],
                          [3, 0, 0, 0]], dtype=jnp.int32)
        # positions to write: mid-page, first row of a fresh page, page 0
        idx = jnp.asarray([ps * 2 + 5, ps * 2, 3], dtype=jnp.int32)
        page = jnp.take_along_axis(pt, (idx // ps)[:, None], axis=1)[:, 0]
        off = idx % ps
        kp_ref = kp.at[page, :, off, :].set(kn)
        vp_ref = vp.at[page, :, off, :].set(vn)
        want = self._window_reference(q, kp_ref, vp_ref, pt, idx)
        with pltpu.force_tpu_interpret_mode():
            out, kp2, vp2 = paged_decode_attention(
                q, kp, vp, pt, idx, k_new=kn, v_new=vn)
        np.testing.assert_array_equal(np.asarray(kp2), np.asarray(kp_ref))
        np.testing.assert_array_equal(np.asarray(vp2), np.asarray(vp_ref))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-5)

    def test_garbage_beyond_index_is_ignored(self):
        """Pages allocated ahead of the decode horizon hold garbage; the
        kernel's per-position mask must not admit it (and the sink page
        contents must never matter)."""
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops.paged_attention import (
            paged_decode_attention,
        )

        b, h, kvh, ps, pool, hd = 1, 2, 1, 8, 6, 32
        keys = jax.random.split(jax.random.key(1), 3)
        q = jax.random.normal(keys[0], (b, h, 1, hd), dtype=jnp.float32)
        kp = jax.random.normal(keys[1], (pool, kvh, ps, hd),
                               dtype=jnp.float32)
        vp = jax.random.normal(keys[2], (pool, kvh, ps, hd),
                               dtype=jnp.float32)
        pt = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
        idx = jnp.asarray([ps + 2], dtype=jnp.int32)
        with pltpu.force_tpu_interpret_mode():
            out = paged_decode_attention(q, kp, vp, pt, idx)
        # poison everything the mask must hide: the trailing page, the
        # sink page, and the rows of page 2 past the index
        poison = kp.at[3].set(1e4).at[0].set(-1e4)
        poison = poison.at[2, :, 3:].set(1e4)
        vpois = vp.at[3].set(1e4).at[0].set(-1e4).at[2, :, 3:].set(1e4)
        with pltpu.force_tpu_interpret_mode():
            out2 = paged_decode_attention(q, poison, vpois, pt, idx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   atol=1e-6)


def _deq(pages, scales):
    return pages.astype(jnp.float32) * scales[..., None]


class TestInt8PagedKernel:
    """int8 kv pools with per-row scales (PagedConfig(kv_dtype="int8")):
    the kernel DMAs half the kv bytes and applies the scales on the
    score/probability tiles; its fused write quantizes with the exact
    quantize_kv_rows formula so pools stay bit-identical to the XLA
    fallback path."""

    def _quantized_setup(self, key, b=3, h=4, kvh=2, ps=16, pool=12,
                         hd=64):
        from multi_spatialmllm_tpu.ops.paged_attention import (
            quantize_kv_rows,
        )

        keys = jax.random.split(key, 3)
        q = jax.random.normal(keys[0], (b, h, 1, hd), dtype=jnp.float32)
        kp, ks = quantize_kv_rows(
            jax.random.normal(keys[1], (pool, kvh, ps, hd)))
        vp, vs = quantize_kv_rows(
            jax.random.normal(keys[2], (pool, kvh, ps, hd)))
        pt = jnp.asarray([[1, 4, 7, 0],
                          [2, 5, 0, 0],
                          [3, 0, 0, 0]], dtype=jnp.int32)
        idx = jnp.asarray([ps * 2 + 5, ps * 2 - 1, 3], dtype=jnp.int32)
        return q, kp, ks, vp, vs, pt, idx

    def test_quantize_roundtrip_error_bounded(self):
        from multi_spatialmllm_tpu.ops.paged_attention import (
            quantize_kv_rows,
        )

        rows = jax.random.normal(jax.random.key(3), (5, 2, 16, 64))
        qr, sc = quantize_kv_rows(rows)
        assert qr.dtype == jnp.int8
        err = np.abs(np.asarray(_deq(qr, sc)) - np.asarray(rows))
        # symmetric per-row quant: |err| <= scale/2 elementwise
        assert (err <= np.asarray(sc)[..., None] * 0.5 + 1e-7).all()
        z, zs = quantize_kv_rows(jnp.zeros((2, 3, 8)))
        assert (np.asarray(z) == 0).all() and (np.asarray(zs) > 0).all()

    def test_int8_kernel_matches_quantized_reference(self):
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops.paged_attention import (
            paged_decode_attention,
        )

        q, kp, ks, vp, vs, pt, idx = self._quantized_setup(jax.random.key(4))
        with pltpu.force_tpu_interpret_mode():
            out = paged_decode_attention(q, kp, vp, pt, idx,
                                         k_scale=ks, v_scale=vs)
        want = TestPagedDecodeKernel._window_reference(
            q, _deq(kp, ks), _deq(vp, vs), pt, idx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-4)

    def test_int8_fused_write_matches_xla_quantized_scatter(self):
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops.paged_attention import (
            paged_decode_attention, quantize_kv_rows,
        )

        q, kp, ks, vp, vs, pt, idx = self._quantized_setup(jax.random.key(5))
        b, kvh, hd = q.shape[0], kp.shape[1], q.shape[3]
        ps = kp.shape[2]
        keys = jax.random.split(jax.random.key(6), 2)
        kn = jax.random.normal(keys[0], (b, kvh, hd), dtype=jnp.float32)
        vn = jax.random.normal(keys[1], (b, kvh, hd), dtype=jnp.float32)
        # the XLA fallback's write: quantize rows, scatter ints + scales
        knq, kns = quantize_kv_rows(kn)
        vnq, vns = quantize_kv_rows(vn)
        page = jnp.take_along_axis(pt, (idx // ps)[:, None], axis=1)[:, 0]
        off = idx % ps
        kp_ref = kp.at[page, :, off, :].set(knq)
        vp_ref = vp.at[page, :, off, :].set(vnq)
        ks_ref = ks.at[page, :, off].set(kns)
        vs_ref = vs.at[page, :, off].set(vns)
        want = TestPagedDecodeKernel._window_reference(
            q, _deq(kp_ref, ks_ref), _deq(vp_ref, vs_ref), pt, idx)
        with pltpu.force_tpu_interpret_mode():
            out, kp2, vp2, ks2, vs2 = paged_decode_attention(
                q, kp, vp, pt, idx, k_new=kn, v_new=vn,
                k_scale=ks, v_scale=vs)
        np.testing.assert_array_equal(np.asarray(kp2), np.asarray(kp_ref))
        np.testing.assert_array_equal(np.asarray(vp2), np.asarray(vp_ref))
        np.testing.assert_array_equal(np.asarray(ks2), np.asarray(ks_ref))
        np.testing.assert_array_equal(np.asarray(vs2), np.asarray(vs_ref))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-4)

    def test_int8_attention_close_to_fp(self):
        """Quantization noise on the attention OUTPUT stays small (the
        softmax renormalizes the per-row score perturbations)."""
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops.paged_attention import (
            paged_decode_attention,
        )

        keys = jax.random.split(jax.random.key(7), 3)
        b, h, kvh, ps, pool, hd = 2, 4, 2, 16, 8, 64
        q = jax.random.normal(keys[0], (b, h, 1, hd), dtype=jnp.float32)
        kfp = jax.random.normal(keys[1], (pool, kvh, ps, hd))
        vfp = jax.random.normal(keys[2], (pool, kvh, ps, hd))
        pt = jnp.asarray([[1, 3, 5], [2, 4, 6]], dtype=jnp.int32)
        idx = jnp.asarray([ps * 2 + 7, ps + 3], dtype=jnp.int32)
        from multi_spatialmllm_tpu.ops.paged_attention import (
            quantize_kv_rows,
        )

        kp, ks = quantize_kv_rows(kfp)
        vp, vs = quantize_kv_rows(vfp)
        with pltpu.force_tpu_interpret_mode():
            out_q = paged_decode_attention(q, kp, vp, pt, idx,
                                           k_scale=ks, v_scale=vs)
        out_fp = TestPagedDecodeKernel._window_reference(
            q, kfp, vfp, pt, idx)
        err = np.abs(np.asarray(out_q) - np.asarray(out_fp))
        assert err.max() < 0.05, err.max()


def _shared_prefix_requests(cfg, n=5, seed=9, shared_len=36):
    """Requests sharing one image + identical first `shared_len` tokens
    (the MultiSPA serving shape: one image context, many questions)."""
    t_img = cfg.tokens_per_tile
    assert shared_len >= 1 + t_img
    rng = np.random.default_rng(seed)
    head = rng.integers(10, cfg.llm.vocab_size,
                        size=shared_len).astype(np.int32)
    head[1:1 + t_img] = cfg.img_context_id
    tiles = np.asarray(jax.random.normal(
        jax.random.key(77), (1, cfg.vit.image_size, cfg.vit.image_size, 3),
        dtype=jnp.float32))
    out = []
    for i in range(n):
        tail = rng.integers(10, cfg.llm.vocab_size,
                            size=int(rng.integers(8, 26))).astype(np.int32)
        out.append((np.concatenate([head, tail]), tiles))
    return out


class TestPrefixCache:
    """vLLM-style automatic prefix caching (PagedConfig(prefix_cache=
    True)): full pages shared across requests by refcount; prefill
    resumes only the unshared suffix against the gathered prefix kv."""

    def _run(self, model, params, requests, num_pages=64, slots=2,
             prefix_cache=True, kv_dtype="native"):
        b = PagedBatcher(
            model, params,
            PagedConfig(slots=slots, page_size=16, num_pages=num_pages,
                        max_prompt_len=128, max_new_tokens=6, chunk=2,
                        length_bucket=64, kv_dtype=kv_dtype,
                        prefix_cache=prefix_cache),
            pad_id=0, eos_id=2)
        return b, b.generate_all(list(requests))

    def test_reuse_outputs_match_uncached(self):
        cfg, model, params, _ = _tiny_model_and_requests(1)
        requests = _shared_prefix_requests(cfg)
        _, want = self._run(model, params, requests, prefix_cache=False)
        b, got = self._run(model, params, requests)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        # first request misses; every later one resumes off >= 2 full
        # shared pages (36 shared tokens / 16-row pages)
        assert b.stats["prefill_full"] == 1
        assert b.stats["prefill_resumed"] == len(requests) - 1
        assert b.stats["pages_reused"] >= 2 * (len(requests) - 1)

    def test_duplicate_request_shares_maximally(self):
        cfg, model, params, _ = _tiny_model_and_requests(1)
        (ids, tiles) = _shared_prefix_requests(cfg, n=1)[0]
        b, got = self._run(model, params, [(ids, tiles), (ids, tiles)])
        np.testing.assert_array_equal(got[0], got[1])
        # the repeat shares every full page before the last real token
        assert b.stats["pages_reused"] == (len(ids) - 1) // 16

    def test_different_tiles_do_not_share(self):
        """Same token ids, different image pixels: vision-token kv
        differs, so pages containing image positions must not hit."""
        cfg, model, params, _ = _tiny_model_and_requests(1)
        (ids, tiles) = _shared_prefix_requests(cfg, n=1)[0]
        tiles2 = np.asarray(tiles) + 1.0
        b, _ = self._run(model, params, [(ids, tiles), (ids, tiles2)])
        assert b.stats["prefill_resumed"] == 0
        assert b.stats["pages_reused"] == 0

    def test_refcount_conservation_and_clear(self):
        cfg, model, params, _ = _tiny_model_and_requests(1)
        requests = _shared_prefix_requests(cfg)
        b, _ = self._run(model, params, requests, num_pages=64)
        held = len(b.prefix_pages)
        assert held > 0
        assert b.allocator.available == 64 - 1 - held
        b.clear_prefix_cache()
        assert b.allocator.available == 64 - 1
        assert b.allocator.refs == {}

    def test_eviction_under_pool_pressure(self):
        """A pool too small to keep every cached page resident evicts
        LRU cache-only pages instead of deadlocking; outputs match the
        ample-pool cached run."""
        cfg, model, params, _ = _tiny_model_and_requests(1)
        requests = _shared_prefix_requests(cfg, n=6)
        _, want = self._run(model, params, requests, num_pages=64)
        b, got = self._run(model, params, requests, num_pages=10)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        assert b.stats["pages_evicted"] > 0

    def test_int8_composes_with_prefix_cache(self):
        """int8 + prefix cache: the resumed suffix quantizes off
        slightly different hidden states, so tokens are NOT asserted
        against the uncached int8 run (bin flips swamp a random tiny
        model's argmax margins). The pinned properties: determinism
        (two fresh batchers agree exactly), an identical full-prefill
        first request, and the sharing mechanics."""
        cfg, model, params, _ = _tiny_model_and_requests(1)
        requests = _shared_prefix_requests(cfg)
        _, base = self._run(model, params, requests, prefix_cache=False,
                            kv_dtype="int8")
        b, got = self._run(model, params, requests, kv_dtype="int8")
        _, again = self._run(model, params, requests, kv_dtype="int8")
        for g, a in zip(got, again):
            np.testing.assert_array_equal(g, a)
        # request 0 misses the cache -> the exact same full-prefill path
        np.testing.assert_array_equal(got[0], base[0])
        assert b.stats["prefill_resumed"] == len(requests) - 1
        assert b.stats["pages_reused"] >= 2 * (len(requests) - 1)


class TestGenerateStream:
    """generate_stream: per-dispatch (rid, new_tokens, done) increments
    whose concatenation reproduces generate_all exactly — including
    across pool-pressure preemption (replayed tokens are not
    re-emitted) and speculative chunks (1..n+1 tokens per event)."""

    def _stream_collect(self, model, params, requests, **cfg_kw):
        b = PagedBatcher(
            model, params,
            PagedConfig(page_size=16, max_prompt_len=128,
                        max_new_tokens=6, chunk=2, length_bucket=64,
                        **cfg_kw),
            pad_id=0, eos_id=2)
        acc: dict[int, list[int]] = {}
        done_seen: dict[int, int] = {}
        for rid, toks, done in b.generate_stream(list(requests)):
            acc.setdefault(rid, []).extend(toks)
            if done:
                done_seen[rid] = done_seen.get(rid, 0) + 1
        return acc, done_seen

    @pytest.mark.parametrize("cfg_kw", [
        dict(num_pages=64),
        dict(num_pages=13, slots=3),               # deferral + preempt
        dict(num_pages=64, speculate=3),
    ], ids=["ample", "pressure", "speculative"])
    def test_stream_reassembles_generate_all(self, cfg_kw):
        cfg, model, params, requests = _tiny_model_and_requests(5)
        slots = cfg_kw.pop("slots", 2)
        want = PagedBatcher(
            model, params,
            PagedConfig(slots=slots, page_size=16, max_prompt_len=128,
                        max_new_tokens=6, chunk=2, length_bucket=64,
                        **cfg_kw),
            pad_id=0, eos_id=2).generate_all(list(requests))
        acc, done_seen = self._stream_collect(model, params, requests,
                                              slots=slots, **cfg_kw)
        assert set(acc) == set(range(len(requests)))
        for rid, w in enumerate(want):
            np.testing.assert_array_equal(
                np.asarray(acc[rid], np.int32), w)
            assert done_seen[rid] == 1


class TestPagedSpeculative:
    """PagedConfig(speculate=n): prompt-lookup drafts verified in one
    t = n+1 paged forward (llm.py's multi-row page write + gather-path
    window attention). Emitted tokens must be bit-identical to the
    plain paged greedy loop."""

    def _run(self, model, params, requests, speculate, num_pages=64,
             slots=2, prefix_cache=False):
        b = PagedBatcher(
            model, params,
            PagedConfig(slots=slots, page_size=16, num_pages=num_pages,
                        max_prompt_len=128, max_new_tokens=8, chunk=2,
                        length_bucket=64, speculate=speculate,
                        prefix_cache=prefix_cache),
            pad_id=0, eos_id=2)
        out = b.generate_all(list(requests))
        b.clear_prefix_cache()
        assert b.allocator.available == num_pages - 1
        return out

    def test_bit_identical_to_paged_greedy(self):
        cfg, model, params, requests = _tiny_model_and_requests(5)
        base = self._run(model, params, requests, 0)
        spec = self._run(model, params, requests, 3)
        for a, s in zip(base, spec):
            np.testing.assert_array_equal(a, s)

    def test_bit_identical_under_pool_pressure(self):
        """Deferral + preemption with speculative chunks: the wider
        write horizon (chunk * (n+1) rows) must stay inside the page
        coverage the host pre-extends."""
        cfg, model, params, requests = _tiny_model_and_requests(5)
        base = self._run(model, params, requests, 0)
        spec = self._run(model, params, requests, 3, num_pages=16,
                         slots=3)
        for a, s in zip(base, spec):
            np.testing.assert_array_equal(a, s)

    def test_composes_with_prefix_cache(self):
        """Speculation changes only the decode dispatch; with the same
        prefix-cache state evolution, spec + prefix equals greedy +
        prefix bitwise."""
        cfg, model, params, _ = _tiny_model_and_requests(1)
        requests = _shared_prefix_requests(cfg)
        base = self._run(model, params, requests, 0, prefix_cache=True)
        spec = self._run(model, params, requests, 3, prefix_cache=True)
        for a, s in zip(base, spec):
            np.testing.assert_array_equal(a, s)


class TestChunkedPrefill:
    """PagedConfig(prefill_chunk=c): prompts stream through ONE
    fixed-size decoder chunk program (multi-token paged path) instead
    of one bucketed prefill program per length; prefix-cache resume
    starts chunking at the shared-page boundary with no text-only
    restriction."""

    def _run(self, model, params, requests, chunk_prefill, num_pages=64,
             prefix_cache=False, kv_dtype="native", speculate=0):
        b = PagedBatcher(
            model, params,
            PagedConfig(slots=2, page_size=16, num_pages=num_pages,
                        max_prompt_len=128, max_new_tokens=6, chunk=2,
                        length_bucket=64, prefill_chunk=chunk_prefill,
                        prefix_cache=prefix_cache, kv_dtype=kv_dtype,
                        speculate=speculate),
            pad_id=0, eos_id=2)
        out = b.generate_all(list(requests))
        b.clear_prefix_cache()
        assert b.allocator.available == num_pages - 1
        return b, out

    def test_matches_one_shot_prefill(self):
        """c=24 (not a page multiple: chunks straddle page boundaries)
        produces the same tokens as the bucketed one-shot prefill."""
        cfg, model, params, requests = _tiny_model_and_requests(5)
        _, want = self._run(model, params, requests, 0)
        _, got = self._run(model, params, requests, 24)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_prefix_resume_without_text_only_restriction(self):
        """Shared prefixes whose boundary falls inside the image block
        resume under chunked prefill (the one-shot resume would fall
        back to a full prefill there)."""
        cfg, model, params, _ = _tiny_model_and_requests(1)
        # shared head barely longer than one page: page 1 still holds
        # image-context tokens for tiny_config, so j=1 has an image in
        # the suffix
        requests = _shared_prefix_requests(cfg, shared_len=36)
        b, got = self._run(model, params, requests, 24,
                           prefix_cache=True)
        again, got2 = self._run(model, params, requests, 24,
                                prefix_cache=True)
        for g, g2 in zip(got, got2):
            np.testing.assert_array_equal(g, g2)
        assert b.stats["prefill_full"] == 1
        assert b.stats["prefill_resumed"] == len(requests) - 1

    def test_vision_cache_hits_and_matches(self):
        """vision_cache: repeat images skip the ViT; tokens match the
        uncached chunked run (same math, vis passed in)."""
        cfg, model, params, _ = _tiny_model_and_requests(1)
        requests = _shared_prefix_requests(cfg)  # one image, 5 prompts
        b0 = PagedBatcher(
            model, params,
            PagedConfig(slots=2, page_size=16, num_pages=64,
                        max_prompt_len=128, max_new_tokens=6, chunk=2,
                        length_bucket=64, prefill_chunk=24),
            pad_id=0, eos_id=2)
        want = b0.generate_all(list(requests))
        b = PagedBatcher(
            model, params,
            PagedConfig(slots=2, page_size=16, num_pages=64,
                        max_prompt_len=128, max_new_tokens=6, chunk=2,
                        length_bucket=64, prefill_chunk=24,
                        vision_cache=4),
            pad_id=0, eos_id=2)
        got = b.generate_all(list(requests))
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        assert b.stats["vision_hits"] == len(requests) - 1
        assert len(b.vision_feats) == 1

    def test_composes_with_int8_and_speculation(self):
        """chunked + int8 kv + speculative decode: spec stays bit-equal
        to greedy under the same (chunked, int8) prefill."""
        cfg, model, params, requests = _tiny_model_and_requests(5)
        _, base = self._run(model, params, requests, 24, kv_dtype="int8")
        _, spec = self._run(model, params, requests, 24, kv_dtype="int8",
                            speculate=3)
        for a, s in zip(base, spec):
            np.testing.assert_array_equal(a, s)


def _make_adapters(params, names, lcfg, scale=0.3, seed=20):
    """init_lora trees with RANDOMIZED b (zero-init b would make every
    delta vanish and the test vacuous)."""
    from multi_spatialmllm_tpu.parallel.lora import _path_keys, init_lora

    out = {}
    for i, name in enumerate(names):
        tree = init_lora(params, lcfg, jax.random.key(seed + i))
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        rand = {}
        for k, (path, leaf) in enumerate(leaves):
            if _path_keys(path)[-1] == "b":
                rand[_path_keys(path)] = scale * jax.random.normal(
                    jax.random.key(seed + 100 * i + k), leaf.shape)

        def walk(node, prefix=()):
            if isinstance(node, dict) and "a" in node and "b" in node:
                return {"a": node["a"],
                        "b": rand.get(prefix + ("b",), node["b"])}
            return {kk: walk(vv, prefix + (kk,)) for kk, vv in node.items()}

        out[name] = walk(tree)
    return out


class TestMultiLoRAServing:
    """Per-request LoRA adapters over one shared base (S-LoRA style):
    stacked tables, per-row adapter gather, unmerged deltas at the
    adapted kernels. Oracle: the SAME batcher with merge_lora'd params
    per adapter."""

    def _setup(self):
        from multi_spatialmllm_tpu.parallel.lora import LoRAConfig

        cfg, model, params, requests = _tiny_model_and_requests(4)
        lcfg = LoRAConfig(rank=4, alpha=8.0,
                          targets=("wq", "wv", "wo", "down"))
        adapters = _make_adapters(params, ("ad_a", "ad_b"), lcfg)
        return cfg, model, params, requests, lcfg, adapters

    def _pcfg(self, **kw):
        return PagedConfig(slots=2, page_size=16, num_pages=64,
                           max_prompt_len=128, max_new_tokens=6, chunk=2,
                           length_bucket=64, **kw)

    def test_lora_logits_match_merged_oracle(self):
        """Math correctness: prefill logits under the unmerged per-row
        delta equal merge_lora'd params to float tolerance (the two
        orders reassociate, so tokens can flip on knife-edge argmax of
        a random model — logits are the right comparison)."""
        import dataclasses

        from multi_spatialmllm_tpu.models.llm import init_cache
        from multi_spatialmllm_tpu.parallel.lora import (
            LoRAConfig,
            merge_lora,
        )
        from multi_spatialmllm_tpu.parallel.lora_serving import (
            stack_adapters,
        )

        # f32 compute so the merged-vs-unmerged comparison is tight
        # (bf16 rounding swamps any tolerance worth asserting)
        cfg = M.tiny_config()
        cfg = dataclasses.replace(
            cfg,
            vit=dataclasses.replace(cfg.vit, dtype="float32"),
            llm=dataclasses.replace(cfg.llm, dtype="float32"))
        model = M.MultiFrameMLLM(cfg)
        b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
        params = model.init(jax.random.key(0), b0["input_ids"],
                            b0["tiles"])
        lcfg = LoRAConfig(rank=4, alpha=8.0,
                          targets=("wq", "wv", "wo", "down"))
        adapters = _make_adapters(params, ("ad_a", "ad_b"), lcfg)
        _, _, _, requests = _tiny_model_and_requests(1)
        ids, tiles = requests[0]
        ids = pad_to_bucket(ids[None], 64, 0)
        tables = stack_adapters([adapters["ad_a"], adapters["ad_b"]],
                                cfg.llm.num_layers, lcfg)
        for name, aidx in (("ad_a", 1), ("ad_b", 2)):
            lora = {"scale": tables["scale"],
                    "idx": jnp.asarray([aidx], jnp.int32),
                    "layers": tables["layers"]}
            got, _ = model.apply(
                params, jnp.asarray(ids), jnp.asarray(tiles[None]),
                init_cache(cfg.llm, 1, 64), jnp.asarray(len(requests[0][0])),
                lora, method=model.prefill)
            merged = merge_lora(params, adapters[name], lcfg)
            want, _ = model.apply(
                merged, jnp.asarray(ids), jnp.asarray(tiles[None]),
                init_cache(cfg.llm, 1, 64), jnp.asarray(len(requests[0][0])),
                method=model.prefill)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=5e-4, rtol=5e-4)
        # base row (idx 0, zero tables) is exactly the base model
        lora0 = {"scale": tables["scale"],
                 "idx": jnp.asarray([0], jnp.int32),
                 "layers": tables["layers"]}
        got0, _ = model.apply(
            params, jnp.asarray(ids), jnp.asarray(tiles[None]),
            init_cache(cfg.llm, 1, 64), jnp.asarray(len(requests[0][0])),
            lora0, method=model.prefill)
        want0, _ = model.apply(
            params, jnp.asarray(ids), jnp.asarray(tiles[None]),
            init_cache(cfg.llm, 1, 64), jnp.asarray(len(requests[0][0])),
            method=model.prefill)
        np.testing.assert_array_equal(np.asarray(got0), np.asarray(want0))

    def test_mixed_batch_invariant_to_composition(self):
        """A mixed base/ad_a/ad_b batch produces exactly what each
        request gets when served alone through the same multi-LoRA
        batcher (per-row adapter gather has no cross-row effect)."""
        cfg, model, params, requests, lcfg, adapters = self._setup()
        tagged = [requests[0],                      # base
                  (*requests[1], "ad_a"),
                  (*requests[2], "ad_b"),
                  (*requests[3], "ad_a")]

        def run(reqs):
            return PagedBatcher(model, params, self._pcfg(), pad_id=0,
                                eos_id=2, adapters=adapters,
                                lora_config=lcfg).generate_all(reqs)

        got = run(tagged)
        for i, req in enumerate(tagged):
            solo = run([req])
            np.testing.assert_array_equal(got[i], solo[0])

    def test_adapters_change_outputs(self):
        cfg, model, params, requests, lcfg, adapters = self._setup()
        b = PagedBatcher(model, params, self._pcfg(), pad_id=0, eos_id=2,
                         adapters=adapters, lora_config=lcfg)
        got = b.generate_all([requests[0], (*requests[0], "ad_a")])
        assert not np.array_equal(got[0], got[1]), got

    def test_prefix_pages_not_shared_across_adapters(self):
        cfg, model, params, requests, lcfg, adapters = self._setup()
        b = PagedBatcher(model, params,
                         self._pcfg(prefix_cache=True, prefill_chunk=16),
                         pad_id=0, eos_id=2, adapters=adapters,
                         lora_config=lcfg)
        same = requests[0]
        b.generate_all([same, (*same, "ad_a"), (*same, "ad_b")])
        assert b.stats["prefill_resumed"] == 0    # three distinct keys
        b.generate_all([(*same, "ad_a")])         # repeat ad_a: shares
        assert b.stats["prefill_resumed"] == 1

    def test_rejects_bad_requests_and_configs(self):
        """Misconfigurations fail loudly at construction/enqueue, not as
        a bare KeyError mid-campaign (review finding r3)."""
        import dataclasses

        import pytest

        from multi_spatialmllm_tpu.parallel.lora import LoRAConfig
        from multi_spatialmllm_tpu.parallel.lora_serving import (
            stack_adapters,
        )

        cfg, model, params, requests, lcfg, adapters = self._setup()
        # adapters without the training LoRAConfig: wrong-scale hazard
        with pytest.raises(ValueError, match="lora_config"):
            PagedBatcher(model, params, self._pcfg(), pad_id=0, eos_id=2,
                         adapters=adapters)
        b = PagedBatcher(model, params, self._pcfg(), pad_id=0, eos_id=2,
                         adapters=adapters, lora_config=lcfg)
        # unknown adapter name / stray extras rejected at enqueue
        with pytest.raises(ValueError, match="unknown adapter"):
            b.generate_all([(*requests[0], "ad_typo")])
        with pytest.raises(TypeError, match="extras"):
            b.generate_all([(*requests[0], 7.5)])
        # per-request budget beyond the pool-shape cap
        with pytest.raises(ValueError, match="max_new_tokens"):
            b.generate_all([(*requests[0], 7)])   # cap is 6 here
        # rank mismatch between cfg and trees
        with pytest.raises(ValueError, match="rank"):
            stack_adapters([adapters["ad_a"]], cfg.llm.num_layers,
                           dataclasses.replace(lcfg, rank=8))
        # adapter 1 adapting targets adapter 0 lacks: silent-drop hazard
        narrow = _make_adapters(
            params, ("n",),
            dataclasses.replace(lcfg, targets=("wq",)))["n"]
        with pytest.raises(ValueError, match="absent from adapter 0"):
            stack_adapters([narrow, adapters["ad_a"]],
                           cfg.llm.num_layers, lcfg)

    def test_composes_with_speculation_and_chunked(self):
        cfg, model, params, requests, lcfg, adapters = self._setup()
        tagged = [(*r, "ad_a") for r in requests[:3]]

        def run(**kw):
            return PagedBatcher(
                model, params, self._pcfg(**kw), pad_id=0, eos_id=2,
                adapters=adapters,
                lora_config=lcfg).generate_all(tagged)

        plain = run()
        spec = run(speculate=3)
        chunked = run(prefill_chunk=24)
        for a, s in zip(plain, spec):
            np.testing.assert_array_equal(a, s)
        for a, ch in zip(plain, chunked):
            np.testing.assert_array_equal(a, ch)


class TestPagedSampling:
    """Per-request sampling over the paged pools: draws are keyed by
    fold_in(key(seed), absolute position) — the ContinuousBatcher's
    exact streams — so paged sampled outputs are bit-identical to the
    contiguous batcher's, invariant to batch composition, and
    reproduced across pool-pressure preemption replays."""

    def _pcfg(self, **kw):
        kw.setdefault("sampling", True)
        kw.setdefault("slots", 2)
        kw.setdefault("num_pages", 64)
        kw.setdefault("max_prompt_len", 128)
        return PagedConfig(page_size=16, max_new_tokens=6, chunk=2,
                           length_bucket=64, **kw)

    def _tagged(self, requests):
        from multi_spatialmllm_tpu.models.serving import SamplingParams

        sps = [SamplingParams(temperature=0.8, top_p=0.9, seed=7),
               SamplingParams(),                       # greedy row
               SamplingParams(temperature=1.2, seed=41),
               SamplingParams(temperature=0.5, top_p=0.7, seed=3)]
        return [(ids, tiles, sp)
                for (ids, tiles), sp in zip(requests, sps)]

    def test_matches_continuous_batcher(self):
        """Paged sampled tokens are BIT-identical to the contiguous
        ContinuousBatcher under the same SamplingParams (same logits,
        same (seed, position)-keyed draws)."""
        from multi_spatialmllm_tpu.models.serving import (
            ContinuousBatcher,
            ServeConfig,
        )

        cfg, model, params, requests = _tiny_model_and_requests(4)
        tagged = self._tagged(requests)
        got = PagedBatcher(model, params, self._pcfg(), pad_id=0,
                           eos_id=2).generate_all(tagged)
        want = ContinuousBatcher(
            model, params,
            ServeConfig(slots=2, max_prompt_len=128, max_new_tokens=6,
                        chunk=2, length_bucket=64, sampling=True),
            pad_id=0, eos_id=2).generate_all(tagged)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_temperature_zero_is_exact_greedy(self):
        """sampling=True with default (temperature=0) params is
        bit-equal to the all-greedy batcher."""
        cfg, model, params, requests = _tiny_model_and_requests(3)
        got = PagedBatcher(model, params, self._pcfg(), pad_id=0,
                           eos_id=2).generate_all(requests)
        want = PagedBatcher(model, params, self._pcfg(sampling=False),
                            pad_id=0, eos_id=2).generate_all(requests)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_invariant_to_batch_composition(self):
        """Each request's sampled stream is unchanged by what shares
        the batch (independent per-row keys)."""
        cfg, model, params, requests = _tiny_model_and_requests(4)
        tagged = self._tagged(requests)

        def run(reqs):
            return PagedBatcher(model, params, self._pcfg(), pad_id=0,
                                eos_id=2).generate_all(reqs)

        mixed = run(tagged)
        for i, req in enumerate(tagged):
            np.testing.assert_array_equal(mixed[i], run([req])[0])

    def test_preemption_replays_same_stream(self):
        """Pool pressure preempts and replays a sampled slot; position-
        keyed draws make the replay reproduce the identical stream."""
        from multi_spatialmllm_tpu.models.serving import SamplingParams

        cfg, model, params, requests = _tiny_model_and_requests(
            2, seed=9, lens=(63, 62))
        sp = SamplingParams(temperature=0.9, top_p=0.85, seed=13)
        tagged = [(*r, sp) for r in requests]
        tight = PagedBatcher(
            model, params,
            self._pcfg(slots=2, num_pages=10, max_prompt_len=64),
            pad_id=0, eos_id=2)
        got = tight.generate_all(tagged)
        ample = PagedBatcher(
            model, params,
            self._pcfg(slots=2, num_pages=64, max_prompt_len=64),
            pad_id=0, eos_id=2)
        want = ample.generate_all(tagged)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        assert tight.allocator.available == 9

    def test_composes_with_chunked_prefill_and_top_k(self):
        """Chunked prefill draws the first token from the true-length
        row with the same position key as the one-shot prefill; static
        top-k masks identically in both paths."""
        cfg, model, params, requests = _tiny_model_and_requests(3)
        tagged = self._tagged(requests)[:3]

        def run(**kw):
            return PagedBatcher(model, params,
                                self._pcfg(top_k=8, **kw), pad_id=0,
                                eos_id=2).generate_all(tagged)

        plain = run()
        chunked = run(prefill_chunk=24)
        for a, c in zip(plain, chunked):
            np.testing.assert_array_equal(a, c)

    def test_rejects_sampling_params_without_flag(self):
        cfg, model, params, requests = _tiny_model_and_requests(1)
        with pytest.raises(AssertionError, match="sampling=True"):
            PagedBatcher(model, params, self._pcfg(sampling=False),
                         pad_id=0, eos_id=2).generate_all(
                self._tagged(requests))

    def test_speculate_rejects_sampling(self):
        cfg, model, params, _ = _tiny_model_and_requests(1)
        with pytest.raises(AssertionError, match="greedy-exact"):
            PagedBatcher(model, params,
                         self._pcfg(speculate=2), pad_id=0, eos_id=2)


class TestPagedBatcher:
    def test_matches_per_request_greedy(self):
        """Ample pool: paged decode returns exactly the per-request greedy
        tokens across mixed prompt lengths and slot reuse."""
        cfg, model, params, requests = _tiny_model_and_requests(7)
        eos = 2
        batcher = PagedBatcher(
            model, params,
            PagedConfig(slots=3, page_size=16, num_pages=64,
                        max_prompt_len=128, max_new_tokens=6, chunk=2,
                        length_bucket=64),
            pad_id=0, eos_id=eos)
        got = batcher.generate_all(requests)
        want = _expected(model, params, requests, eos, 6)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        # every page returned to the pool at the end
        assert batcher.allocator.available == 63
        assert (batcher.page_table == 0).all()

    def test_pressure_defers_and_preempts_without_corruption(self):
        """Pool of 9 usable pages, two slots wanting 5 each: the second
        slot is repeatedly prefilled and preempted (pages freed, request
        re-queued) until the first finishes — outputs still match the
        per-request greedy, proving preempted slots never corrupt pages
        re-allocated to the survivor (sink-page invariant)."""
        # both prompts long enough that decode crosses the 4-page prompt
        # window into a 5th page
        cfg, model, params, requests = _tiny_model_and_requests(
            2, seed=9, lens=(63, 62))
        eos = 2
        batcher = PagedBatcher(
            model, params,
            PagedConfig(slots=2, page_size=16, num_pages=10,
                        max_prompt_len=64, max_new_tokens=6, chunk=2,
                        length_bucket=64),
            pad_id=0, eos_id=eos)
        got = batcher.generate_all(requests)
        want = _expected(model, params, requests, eos, 6)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        assert batcher.allocator.available == 9

    def test_idle_slot_positions_stay_in_window(self):
        """Regression (r2 advisor): idle slots decode into the sink page
        but their positions advanced by `chunk` every dispatch; under a
        long pool-dry stretch index//page_size walked past the slot's
        page-table row (out-of-window scalar reads in the paged kernel).
        Positions of empty slots must re-zero after every chunk."""
        cfg, model, params, requests = _tiny_model_and_requests(
            3, seed=9, lens=(63, 62, 60))
        eos = 2
        pcfg = PagedConfig(slots=3, page_size=16, num_pages=11,
                           max_prompt_len=64, max_new_tokens=6, chunk=2,
                           length_bucket=64)
        batcher = PagedBatcher(model, params, pcfg, pad_id=0, eos_id=eos)
        max_seen = {"v": 0}
        orig = type(batcher)._free_slot

        # observe positions after every public mutation point by
        # wrapping _free_slot (called at the end of each finish/preempt)
        def spy(self, slot):
            max_seen["v"] = max(max_seen["v"], int(self.positions.max()))
            return orig(self, slot)

        type(batcher)._free_slot = spy
        try:
            got = batcher.generate_all(requests)
        finally:
            type(batcher)._free_slot = orig
        want = _expected(model, params, requests, eos, 6)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        # no slot's position may exceed its max window
        assert max_seen["v"] <= pcfg.max_len, max_seen
        assert (batcher.positions == 0).all()

    def test_pool_too_small_raises(self):
        """A single request whose decode window can never fit (4 prompt
        pages fill the pool; the 5th decode page can never be granted)
        raises instead of livelocking."""
        cfg, model, params, requests = _tiny_model_and_requests(
            1, seed=9, lens=(63,))
        batcher = PagedBatcher(
            model, params,
            PagedConfig(slots=1, page_size=16, num_pages=5,
                        max_prompt_len=64, max_new_tokens=6, chunk=2,
                        length_bucket=64),
            pad_id=0, eos_id=2)
        with pytest.raises(RuntimeError, match="paged pool too small"):
            batcher.generate_all(requests)

    def test_int8_outputs_invariant_to_slots_and_pressure(self):
        """kv_dtype="int8": outputs are deterministic functions of the
        request alone — a 1-slot ample-pool run and a 3-slot
        pressure run (deferrals + slot reuse) must agree EXACTLY,
        because per-row quantization and window dequantization never
        depend on page placement or batch composition."""
        cfg, model, params, requests = _tiny_model_and_requests(5)
        eos = 2

        def run(slots, num_pages):
            batcher = PagedBatcher(
                model, params,
                PagedConfig(slots=slots, page_size=16, num_pages=num_pages,
                            max_prompt_len=128, max_new_tokens=6, chunk=2,
                            length_bucket=64, kv_dtype="int8"),
                pad_id=0, eos_id=eos)
            out = batcher.generate_all(requests)
            assert batcher.allocator.available == num_pages - 1
            return out

        ample = run(1, 64)
        pressured = run(3, 13)
        for a, p in zip(ample, pressured):
            np.testing.assert_array_equal(a, p)
        # sanity: the tiny random model's greedy path is only mildly
        # perturbed by int8 kv — first tokens (pure prefill, full
        # precision) must match the fp batcher exactly
        fp = PagedBatcher(
            model, params,
            PagedConfig(slots=2, page_size=16, num_pages=64,
                        max_prompt_len=128, max_new_tokens=6, chunk=2,
                        length_bucket=64),
            pad_id=0, eos_id=eos).generate_all(requests)
        for a, f in zip(ample, fp):
            assert a[0] == f[0]

    def test_int8_pool_half_the_bytes(self):
        from multi_spatialmllm_tpu.models.paged_kv import init_paged_pools

        cfg = M.tiny_config()
        pcfg = PagedConfig(slots=4, page_size=16, num_pages=33)
        native = init_paged_pools(cfg.llm, pcfg)
        q8 = init_paged_pools(
            cfg.llm, PagedConfig(slots=4, page_size=16, num_pages=33,
                                 kv_dtype="int8"))
        nat_bytes = sum(p["k_pages"].nbytes + p["v_pages"].nbytes
                        for p in native)
        q8_bytes = sum(sum(a.nbytes for a in p.values()) for p in q8)
        # int8 rows + f32 scales vs native rows: (hd + 4) / (hd * nb)
        nb = native[0]["k_pages"].dtype.itemsize
        hd = cfg.llm.head_dim
        assert q8_bytes == nat_bytes * (hd + 4) // (hd * nb)
        assert q8[0]["k_pages"].dtype == jnp.int8
        assert q8[0]["k_scale"].shape == q8[0]["k_pages"].shape[:3]

    def test_memory_footprint_beats_contiguous(self):
        """The paged pool's HBM budget is pool-sized, not slots*max_len:
        with many slots and short actual usage the paged cache is a
        fraction of the contiguous cache."""
        from multi_spatialmllm_tpu.models.llm import init_cache
        from multi_spatialmllm_tpu.models.paged_kv import init_paged_pools

        cfg = M.tiny_config()
        pcfg = PagedConfig(slots=16, page_size=16, num_pages=65,
                           max_prompt_len=1024, max_new_tokens=64)
        pools = init_paged_pools(cfg.llm, pcfg)
        contiguous = init_cache(cfg.llm, pcfg.slots, pcfg.max_len)
        paged_bytes = sum(p["k_pages"].nbytes + p["v_pages"].nbytes
                          for p in pools)
        contig_bytes = sum(c["k"].nbytes + c["v"].nbytes
                           for c in contiguous)
        # 65*16 = 1040 kv rows pooled vs 16*1088 = 17408 reserved
        assert paged_bytes * 10 < contig_bytes


class TestPerRequestBudget:
    """Per-request max_new_tokens: a budgeted request's output is the
    exact prefix of its unbudgeted greedy output, mixed freely with
    full-budget rows, composing with speculation and chunked prefill."""

    def _run(self, reqs, **kw):
        cfg, model, params, _ = _tiny_model_and_requests(1)
        pcfg = PagedConfig(slots=2, page_size=16, num_pages=64,
                           max_prompt_len=128, max_new_tokens=8, chunk=2,
                           length_bucket=64, **kw)
        return PagedBatcher(model, params, pcfg, pad_id=0,
                            eos_id=2).generate_all(reqs)

    def test_budget_is_exact_prefix(self):
        _, _, _, requests = _tiny_model_and_requests(3)
        full = self._run(list(requests))
        mixed = self._run([(*requests[0], 3), requests[1],
                           (*requests[2], 1)])
        assert len(mixed[0]) == min(3, len(full[0]))
        np.testing.assert_array_equal(mixed[0], full[0][:3])
        np.testing.assert_array_equal(mixed[1], full[1])
        assert len(mixed[2]) == 1
        np.testing.assert_array_equal(mixed[2], full[2][:1])

    def test_composes_with_speculate_and_chunked(self):
        _, _, _, requests = _tiny_model_and_requests(2)
        tagged = [(*requests[0], 5), (*requests[1], 2)]
        plain = self._run(tagged)
        spec = self._run(tagged, speculate=3)
        chunked = self._run(tagged, prefill_chunk=24)
        for a, b in zip(plain, spec):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(plain, chunked):
            np.testing.assert_array_equal(a, b)


class TestStopIds:
    """Extra stop tokens terminate like eos across both batchers: the
    output is the unstopped run cut at the first stop token."""

    def test_stop_set_cuts_both_batchers(self):
        from multi_spatialmllm_tpu.models.serving import (
            ContinuousBatcher,
            ServeConfig,
        )

        cfg, model, params, requests = _tiny_model_and_requests(3)
        pcfg = PagedConfig(slots=2, page_size=16, num_pages=64,
                           max_prompt_len=128, max_new_tokens=8, chunk=2,
                           length_bucket=64)
        scfg = ServeConfig(slots=2, max_prompt_len=128, max_new_tokens=8,
                           chunk=2, length_bucket=64)
        base = PagedBatcher(model, params, pcfg, pad_id=0,
                            eos_id=2).generate_all(list(requests))
        # pick a token that actually occurs mid-stream in some output
        stop = next(int(t) for out in base for t in out[:-1])

        def cut(seq):
            seq = list(map(int, seq))
            return seq[: seq.index(stop)] if stop in seq else seq

        paged = PagedBatcher(model, params, pcfg, pad_id=0, eos_id=2,
                             stop_ids=(stop,)).generate_all(
                                 list(requests))
        contig = ContinuousBatcher(model, params, scfg, pad_id=0,
                                   eos_id=2, stop_ids=(stop,)
                                   ).generate_all(list(requests))
        for b, p, c in zip(base, paged, contig):
            assert list(map(int, p)) == cut(b)
            assert list(map(int, c)) == cut(b)
        assert any(len(p) < len(b) for p, b in zip(paged, base))


class TestLogprobs:
    """PagedConfig(logprobs=True): per-emitted-token f32 log-softmax
    confidences in batcher.request_logprobs, aligned with the returned
    tokens, without changing the tokens themselves."""

    def _pcfg(self, **kw):
        return PagedConfig(slots=2, page_size=16, num_pages=64,
                           max_prompt_len=128, max_new_tokens=6, chunk=2,
                           length_bucket=64, **kw)

    def test_tokens_unchanged_and_oracle_values(self):
        from multi_spatialmllm_tpu.models.llm import init_cache

        cfg, model, params, requests = _tiny_model_and_requests(3)
        base = PagedBatcher(model, params, self._pcfg(), pad_id=0,
                            eos_id=2).generate_all(list(requests))
        b = PagedBatcher(model, params, self._pcfg(logprobs=True),
                         pad_id=0, eos_id=2)
        got = b.generate_all(list(requests))
        for g, w in zip(got, base):
            np.testing.assert_array_equal(g, w)     # tokens unchanged
        for rid, (ids, tiles) in enumerate(requests):
            lps = b.request_logprobs[rid]
            toks = got[rid]
            assert len(lps) == len(toks)
            # teacher-forced oracle: full forward over prompt+output
            row = np.concatenate([ids, np.asarray(toks, np.int32)])
            row = pad_to_bucket(row[None], 64, 0)
            logits, _ = model.apply(
                params, jnp.asarray(row), jnp.asarray(tiles[None]),
                init_cache(cfg.llm, 1, row.shape[1]),
                jnp.asarray(row.shape[1]), method=model.prefill)
            lp_all = np.asarray(jax.nn.log_softmax(
                np.asarray(logits, np.float32), axis=-1))
            # cache-incremental decode reassociates vs the one-shot
            # teacher-forced forward -> small logit drift, not bitwise
            for i, t in enumerate(toks):
                want = lp_all[0, len(ids) - 1 + i, int(t)]
                np.testing.assert_allclose(lps[i], want, atol=5e-2)

    def test_composes_with_chunked_prefix_and_sampling(self):
        from multi_spatialmllm_tpu.models.serving import SamplingParams

        cfg, model, params, requests = _tiny_model_and_requests(3)
        b = PagedBatcher(model, params,
                         self._pcfg(logprobs=True, prefill_chunk=16,
                                    prefix_cache=True, sampling=True),
                         pad_id=0, eos_id=2)
        tagged = [requests[0],
                  (*requests[0], SamplingParams(temperature=3.0, seed=4)),
                  requests[1]]
        outs = b.generate_all(tagged)
        for rid, out in enumerate(outs):
            lps = b.request_logprobs[rid]
            assert len(lps) == len(out)
            assert all(np.isfinite(lp) and lp <= 0.0 for lp in lps)
        # repeat request 0's prompt -> prefix-cache resume also records
        outs2 = b.generate_all([requests[0]])
        assert b.stats["prefill_resumed"] >= 1
        assert len(b.request_logprobs[0]) == len(outs2[0])

    def test_continuous_batcher_parity(self):
        """ServeConfig(logprobs=True): same semantics on the contiguous
        batcher — tokens unchanged, and (tokens being bit-identical
        across batchers) logprobs match the paged batcher's to float
        tolerance (contiguous vs paged kv layouts reassociate)."""
        from multi_spatialmllm_tpu.models.serving import (
            ContinuousBatcher,
            ServeConfig,
        )

        _, model, params, requests = _tiny_model_and_requests(3)
        scfg = ServeConfig(slots=2, max_prompt_len=128, max_new_tokens=6,
                           chunk=2, length_bucket=64)
        base = ContinuousBatcher(
            model, params, scfg, pad_id=0,
            eos_id=2).generate_all(list(requests))
        c = ContinuousBatcher(
            model, params, dataclasses.replace(scfg, logprobs=True),
            pad_id=0, eos_id=2)
        got = c.generate_all(list(requests))
        p = PagedBatcher(model, params, self._pcfg(logprobs=True),
                         pad_id=0, eos_id=2)
        pgot = p.generate_all(list(requests))
        for rid, (g, w, pg) in enumerate(zip(got, base, pgot)):
            np.testing.assert_array_equal(g, w)     # tokens unchanged
            np.testing.assert_array_equal(g, pg)    # cross-batcher
            lps = c.request_logprobs[rid]
            assert len(lps) == len(g)
            np.testing.assert_allclose(lps, p.request_logprobs[rid],
                                       atol=5e-2)
