"""Paged-KV serving tests: allocator, greedy parity vs the contiguous
continuous batcher, pool-pressure deferral/preemption, and the
too-small-pool guard. (The reference has no serving stack — this
subsystem is beyond-reference; see models/paged_kv.py.)"""

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
