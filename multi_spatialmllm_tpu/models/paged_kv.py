"""Paged KV cache + paged continuous batching (vLLM-style block tables,
TPU-native: a statically-shaped HBM page pool shared by all decode slots,
with gather/scatter attention under jit and a host-side page allocator).

The reference has no serving stack (training/eval delegate to InternVL-2,
/root/reference/README.md:194-200); this extends the repo's
ContinuousBatcher (models/serving.py) for very long mixed-length prompts:
instead of each slot reserving `max_prompt+max_new` contiguous cache rows,
slots borrow fixed-size pages from one pool sized to the TOTAL live
tokens, and return them at eos. When the pool runs dry a refill is
deferred and, if a running slot cannot extend, it is preempted (pages
freed, request re-queued) — the classic paged-attention memory story.

Key invariants:
* Page 0 is a SINK page, never allocated: freed/idle slots' table rows
  point at it so their (discarded) decode writes can never corrupt pages
  that were re-allocated to another slot.
* Greedy outputs are bit-identical to `ContinuousBatcher` /
  per-request `greedy_generate` (test-asserted): a slot's gathered page
  window holds exactly its own kv rows in logical order, and the
  attention mask admits only positions <= its own index.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from .generate import _draw, pad_to_bucket
from .llm import LLMConfig
from .mllm import MultiFrameMLLM
from .serving import SamplingParams, _prefill_one_fn, _row_keys


@dataclasses.dataclass
class PagedConfig:
    slots: int = 4                 # concurrent decode rows
    page_size: int = 64            # kv rows per page
    num_pages: int = 64            # pool size (page 0 is the sink)
    max_prompt_len: int = 512
    max_new_tokens: int = 32
    chunk: int = 8                 # decode steps per device dispatch
    length_bucket: int = 128       # prefill shape bucketing
    # "native" keeps pages in the model dtype; "int8" quantizes kv rows
    # symmetrically with per-row f32 scales (ops.paged_attention.
    # quantize_kv_rows): half the page-pool HBM and half the decode
    # DMA bytes, at a per-element relative error of ~1/254. Outputs are
    # deterministic (identical across slot/batch composition) but NOT
    # bit-identical to the unquantized path.
    kv_dtype: str = "native"
    # >0: stream prompt prefill through fixed-size decoder chunks over
    # the paged pools instead of one bucketed forward. The embeds
    # program (embed + ViT + splice) stays bucketed but is light; the
    # 24-layer decoder compiles ONE chunk program total instead of one
    # per (bucket, shared-prefix) combination — the TPU-native answer
    # to prefill program proliferation — and time-to-first-token is
    # bounded by the chunk, not the prompt. With prefix_cache, resume
    # just starts chunking at the shared-page boundary (no separate
    # resume program, and no text-only-suffix restriction: the embeds
    # carry spliced vision features for the whole prompt).
    prefill_chunk: int = 0
    # >0 (chunked prefill only): LRU-cache up to this many images'
    # projected vision features by tile-pixel digest — a repeated image
    # skips the whole ViT+projector forward even when the prompts
    # differ. Features are a few hundred KB per image on device.
    vision_cache: int = 0
    # >0: prompt-lookup speculative decoding (models/generate.py): each
    # iteration drafts n tokens by bigram lookup over the slot's
    # prompt+generated history and verifies them in ONE t = n+1 paged
    # forward (the gather path handles multi-token writes; the t=1
    # Pallas kernel is bypassed while speculating). Emitted tokens are
    # bit-identical to the greedy chunk loop — only the forward count
    # changes.
    speculate: int = 0
    # vLLM-style automatic prefix caching: full pages whose token (and,
    # for vision positions, tile-pixel) prefix matches a previous
    # request are reused by refcount instead of recomputed — prefill
    # then runs only the unshared suffix through the chunked-decode
    # branch against the gathered prefix kv. MultiSPA serving is the
    # motivating workload: many questions share one image-context
    # prefix (same tiles, ~tokens_per_tile*tiles rows). Cached pages
    # are evicted LRU when the pool runs dry. The resumed suffix
    # forward reassociates reductions differently from the one-shot
    # prefill, so logits agree to float tolerance, not bitwise; greedy
    # tokens are stable whenever the argmax margin exceeds that noise.
    prefix_cache: bool = False
    # enable per-request SamplingParams (serving.SamplingParams as an
    # extra request-tuple element): temperature / top-p / seeded draws
    # keyed by fold_in(key(seed), absolute position) — the SAME streams
    # as ContinuousBatcher, so results are deterministic and invariant
    # to slot assignment, chunk boundaries, batch composition, and
    # pool-pressure preemption replays. temperature=0 rows take the
    # exact argmax. Mutually exclusive with speculate (greedy-exact).
    sampling: bool = False
    top_k: int | None = None       # static top-k when sampling
    # record each emitted token's f32 log-softmax probability under the
    # raw logits (predictive confidence; for greedy rows this is the
    # max log-prob, for sampled rows the model's probability of the
    # drawn token before temperature/top-p shaping). Read them from
    # `batcher.request_logprobs[rid]` after the request finishes —
    # aligned 1:1 with the returned (stop-cut) tokens. Mutually
    # exclusive with speculate.
    logprobs: bool = False

    @property
    def max_len(self) -> int:
        # speculative verify writes draft kv up to `speculate` rows past
        # the last emitted position, and a chunked prefill's final chunk
        # writes pad rows up to `prefill_chunk - 1` past the prompt end;
        # page coverage must absorb both
        return (self.max_prompt_len + self.max_new_tokens
                + self.speculate + self.prefill_chunk)

    @property
    def pages_per_slot(self) -> int:
        return -(-self.max_len // self.page_size)


class PageAllocator:
    """Host-side refcounted free list over pages 1..num_pages-1 (0 is
    the sink). A freshly allocated page has one reference; prefix
    sharing adds references (`retain`) and `release` only returns a
    page to the free list when the last reference drops."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, 0, -1))
        self.refs: dict[int, int] = {}

    @property
    def available(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> list[int] | None:
        """n pages, or None (allocation is all-or-nothing)."""
        if n < 0 or len(self._free) < n:
            return None
        got = [self._free.pop() for _ in range(n)]
        for p in got:
            self.refs[p] = 1
        return got

    def retain(self, page: int) -> None:
        self.refs[page] += 1

    def release(self, pages) -> None:
        for p in pages:
            assert 0 < p < self.num_pages, p
            self.refs[p] -= 1
            if self.refs[p] == 0:
                del self.refs[p]
                self._free.append(p)


def init_paged_pools(cfg: LLMConfig, pcfg: PagedConfig):
    """Per-layer page pools `[num_pages, kv_heads, page_size, head_dim]`
    (+ per-row f32 scale pools `[num_pages, kv_heads, page_size]` when
    `pcfg.kv_dtype == "int8"`)."""
    assert pcfg.kv_dtype in ("native", "int8"), pcfg.kv_dtype
    dtype = jnp.dtype(cfg.dtype if pcfg.kv_dtype == "native" else jnp.int8)
    shape = (pcfg.num_pages, cfg.num_kv_heads, pcfg.page_size, cfg.head_dim)
    out = []
    for _ in range(cfg.num_layers):
        pool = {"k_pages": jnp.zeros(shape, dtype=dtype),
                "v_pages": jnp.zeros(shape, dtype=dtype)}
        if pcfg.kv_dtype == "int8":
            pool["k_scale"] = jnp.zeros(shape[:3], dtype=jnp.float32)
            pool["v_scale"] = jnp.zeros(shape[:3], dtype=jnp.float32)
        out.append(pool)
    return out


@functools.lru_cache(maxsize=16)
def _paged_insert_fn(model: MultiFrameMLLM, page_size: int,
                     n_write_pages: int, prompt_len: int):
    """Scatter a B=1 prefilled contiguous row cache into pool pages.

    The prompt's `prompt_len` (bucketed) kv rows are padded up to whole
    pages and written to `page_ids`; rows past the true length hold pad-
    key garbage that the decode mask never admits (and that in-place
    decode writes overwrite before their position becomes visible).
    """
    pad = n_write_pages * page_size - prompt_len
    assert pad >= 0, (n_write_pages, page_size, prompt_len)

    def to_pages(rows):                 # [1, KVH, T, hd] -> [P, KVH, ps, hd]
        r = jnp.pad(rows[0], ((0, 0), (0, pad), (0, 0)))
        kvh, _, hd = r.shape
        r = r.reshape(kvh, n_write_pages, page_size, hd)
        return r.transpose(1, 0, 2, 3)

    def fn(pools, row_caches, page_ids):
        from ..ops.paged_attention import quantize_kv_rows

        out = []
        for pool, rc in zip(pools, row_caches):
            kr, vr = to_pages(rc["k"]), to_pages(rc["v"])
            new = dict(pool)
            if "k_scale" in pool:       # int8 pools: quantize per row
                kr, ks = quantize_kv_rows(kr)
                vr, vs = quantize_kv_rows(vr)
                new["k_scale"] = pool["k_scale"].at[page_ids].set(ks)
                new["v_scale"] = pool["v_scale"].at[page_ids].set(vs)
            new["k_pages"] = pool["k_pages"].at[page_ids].set(
                kr.astype(pool["k_pages"].dtype))
            new["v_pages"] = pool["v_pages"].at[page_ids].set(
                vr.astype(pool["v_pages"].dtype))
            out.append(new)
        return out

    return jax.jit(fn, donate_argnums=(0,))


@functools.lru_cache(maxsize=16)
def _spliced_embeds_fn(model: MultiFrameMLLM, t: int, pad_to: int):
    """Vision-spliced prompt embeddings, zero-padded to `pad_to` rows so
    the chunk program below sees ONE static shape regardless of the
    prompt's length bucket."""

    def fn(params, ids, tiles):
        emb = model.apply(params, ids, tiles,
                          method=MultiFrameMLLM.spliced_embeds)
        return jnp.pad(emb, ((0, 0), (0, pad_to - t), (0, 0)))

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _vision_feats_fn(model: MultiFrameMLLM):
    """Projected vision features for one request's tile stack:
    `[1, n_tiles, H, W, 3] -> [1, n_tiles * tokens_per_tile, D]`."""

    def fn(params, tiles):
        feats = model.apply(
            params, tiles.reshape((-1,) + tiles.shape[2:]),
            method=MultiFrameMLLM.encode_tiles)
        return feats.reshape(1, -1, feats.shape[-1])

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _splice_embeds_fn(model: MultiFrameMLLM, t: int, pad_to: int):
    """spliced_embeds with the vision features passed IN (so a cached
    feature array skips the ViT); same cumsum slot scatter as
    MultiFrameMLLM.spliced_embeds, zero-padded to `pad_to` rows."""
    img_id = model.cfg.img_context_id

    def fn(params, ids, vis):
        embeds = model.apply(params, ids,
                             method=lambda m, i: m.llm.embed(i))
        is_ctx = ids == img_id
        slot_order = jnp.clip(jnp.cumsum(is_ctx, axis=1) - 1, 0,
                              vis.shape[1] - 1)
        gathered = jnp.take_along_axis(
            vis.astype(embeds.dtype), slot_order[..., None], axis=1)
        emb = jnp.where(is_ctx[..., None], gathered, embeds)
        return jnp.pad(emb, ((0, 0), (0, pad_to - t), (0, 0)))

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _prefill_chunk_fn(model: MultiFrameMLLM, c: int,
                      sampling: bool = False, top_k: int | None = None,
                      logprobs: bool = False):
    """One fixed-size prefill chunk over the paged pools: rows
    `[start, start+c)` of the padded embeds forward through the decoder
    (multi-token paged gather path — per-row position masks, kv rows
    scattered at consecutive (page, offset) slots) and every row's
    next token comes back so the host can read the first generated
    token from the row at the true prompt end. With sampling, row i's
    token is drawn with key fold(seed, start+i) — the row at
    true_len-1 therefore matches the one-shot prefill's draw exactly."""

    @functools.partial(jax.jit, donate_argnums=(3,))
    def fn(params, embeds, start, pools, pt_row, lora=None,
           temperature=None, top_p=None, seed=None):
        pool_keys = [kk for kk in ("k_pages", "v_pages", "k_scale",
                                   "v_scale") if kk in pools[0]]
        chunk = jax.lax.dynamic_slice_in_dim(embeds, start, c, axis=1)
        positions = (start + jnp.arange(c))[None]
        caches = [dict(p, page_table=pt_row,
                       index=jnp.full((1,), start, jnp.int32))
                  for p in pools]
        logits, caches = model.apply(
            params, chunk, positions, caches,
            method=lambda m, e, pos, cc:
                m.llm(input_embeds=e, positions=pos, caches=cc,
                      lora=lora))
        pools = [{kk: cc[kk] for kk in pool_keys} for cc in caches]
        if sampling:
            keys = _row_keys(jnp.broadcast_to(seed, (c,)), positions[0])
            toks = _draw(keys, logits[0],
                         jnp.broadcast_to(temperature, (c,)), top_k,
                         jnp.broadcast_to(top_p, (c,)))
        else:
            toks = jnp.argmax(logits[0], axis=-1)
        toks = toks.astype(jnp.int32)
        if logprobs:
            from .serving import _token_logprob

            return toks, _token_logprob(logits[0], toks[:, None]), pools
        return toks, pools

    return fn


@functools.lru_cache(maxsize=64)
def _prefix_resume_fn(model: MultiFrameMLLM, page_size: int,
                      n_shared_pages: int, t_total: int,
                      sampling: bool = False, top_k: int | None = None,
                      logprobs: bool = False):
    """Prefill resumed after a prefix-cache hit: gather the shared
    pages into a contiguous row cache, run ONLY the suffix tokens
    through the chunked-decode branch (llm.py's per-row `[B]` cache
    index path — the same machinery speculative verify uses), and
    scatter the fresh suffix kv into the suffix pages.

    The suffix must be text-only (no img_context positions): its
    embeddings come straight from the token table. `ids` is the full
    bucketed prompt `[1, t_total]`; positions are absolute, so RoPE
    matches the one-shot prefill exactly — only reduction order in the
    suffix attention differs.
    """
    shared = n_shared_pages * page_size
    t_suf = t_total - shared
    assert t_suf >= 1, (t_total, shared)
    n_cover = -(-t_total // page_size)
    n_suf_pages = n_cover - n_shared_pages
    pad = n_suf_pages * page_size - t_suf
    assert pad >= 0, (n_suf_pages, page_size, t_suf)

    def fn(params, pools, shared_page_ids, suf_page_ids, ids, true_len,
           lora=None, temperature=None, top_p=None, seed=None):
        from ..ops.paged_attention import quantize_kv_rows

        def rows_from_pages(pool, name):
            pw = pool[f"{name}_pages"][shared_page_ids]  # [j, KVH, ps, hd]
            if f"{name}_scale" in pool:
                sc = pool[f"{name}_scale"][shared_page_ids]
                pw = pw.astype(jnp.float32) * sc[..., None]
                pw = pw.astype(jnp.dtype(model.cfg.llm.dtype))
            kvh, hd = pw.shape[1], pw.shape[3]
            return pw.transpose(1, 0, 2, 3).reshape(kvh, shared, hd)[None]

        caches = []
        for pool in pools:
            kr, vr = rows_from_pages(pool, "k"), rows_from_pages(pool, "v")
            pad_rows = ((0, 0), (0, 0), (0, t_suf), (0, 0))
            caches.append({"k": jnp.pad(kr, pad_rows),
                           "v": jnp.pad(vr, pad_rows),
                           "index": jnp.full((1,), shared, jnp.int32)})

        suffix = ids[:, shared:]
        positions = (shared + jnp.arange(t_suf))[None]
        logits, caches = model.apply(
            params, suffix, positions, caches,
            method=lambda m, tok, pos, cc:
                m.llm(input_embeds=m.llm.embed(tok), positions=pos,
                      caches=cc, lora=lora))
        last = jnp.take_along_axis(
            logits, (true_len - shared - 1)[None, None, None], axis=1)[:, 0]
        if sampling:
            keys = _row_keys(seed[None], (true_len - 1)[None])
            first = _draw(keys, last, temperature[None], top_k,
                          top_p[None])[:, None]
        else:
            first = jnp.argmax(last, axis=-1)[:, None]
        first_lp = None
        if logprobs:
            from .serving import _token_logprob

            first_lp = _token_logprob(last, first)

        def to_pages(rows):             # [1, KVH, t_total, hd] suffix part
            r = jnp.pad(rows[0, :, shared:], ((0, 0), (0, pad), (0, 0)))
            kvh, _, hd = r.shape
            r = r.reshape(kvh, n_suf_pages, page_size, hd)
            return r.transpose(1, 0, 2, 3)

        out = []
        for pool, rc in zip(pools, caches):
            kr, vr = to_pages(rc["k"]), to_pages(rc["v"])
            new = dict(pool)
            if "k_scale" in pool:
                kr, ks = quantize_kv_rows(kr)
                vr, vs = quantize_kv_rows(vr)
                new["k_scale"] = pool["k_scale"].at[suf_page_ids].set(ks)
                new["v_scale"] = pool["v_scale"].at[suf_page_ids].set(vs)
            new["k_pages"] = pool["k_pages"].at[suf_page_ids].set(
                kr.astype(pool["k_pages"].dtype))
            new["v_pages"] = pool["v_pages"].at[suf_page_ids].set(
                vr.astype(pool["v_pages"].dtype))
            out.append(new)
        if logprobs:
            return first, first_lp, out
        return first, out

    return jax.jit(fn, donate_argnums=(1,))


@functools.lru_cache(maxsize=16)
def _paged_decode_chunk_fn(model: MultiFrameMLLM, n_slots: int, chunk: int,
                           sampling: bool = False,
                           top_k: int | None = None,
                           logprobs: bool = False):
    """`chunk` decode steps for every slot in one dispatch over the paged
    pools. positions is `[B]`; the page table is fixed for the whole
    chunk (the host pre-extends coverage before dispatch). With sampling,
    each slot draws with key fold(seed, position) — the same streams as
    serving._decode_chunk_fn, so paged sampled outputs are identical to
    the contiguous batcher's."""

    def step(params, token, positions, pools, page_table, lora,
             temperature, top_p, seed):
        pool_keys = [k for k in ("k_pages", "v_pages", "k_scale",
                                 "v_scale") if k in pools[0]]
        caches = [dict(p, page_table=page_table, index=positions)
                  for p in pools]
        logits, caches = model.apply(
            params, token, positions[:, None], caches,
            method=lambda m, tok, pos, cc:
                m.llm(input_embeds=m.llm.embed(tok), positions=pos,
                      caches=cc, lora=lora))
        pools = [{k: c[k] for k in pool_keys} for c in caches]
        if sampling:
            keys = _row_keys(seed, positions)
            token = _draw(keys, logits[:, -1], temperature, top_k,
                          top_p)[:, None]
        else:
            token = jnp.argmax(logits[:, -1], axis=-1)[:, None]
        if logprobs:
            from .serving import _token_logprob

            return token, _token_logprob(logits[:, -1], token), pools
        return token, None, pools

    @functools.partial(jax.jit, donate_argnums=(3,))
    def run(params, last_token, positions, pools, page_table, lora=None,
            temperature=None, top_p=None, seed=None):
        last_token = last_token.astype(jnp.int32)

        def body(carry, _):
            token, positions, pools = carry
            token, lp, pools = step(params, token, positions, pools,
                                    page_table, lora, temperature,
                                    top_p, seed)
            out = token[:, 0].astype(jnp.int32)
            return (token.astype(jnp.int32), positions + 1, pools), \
                ((out, lp) if logprobs else out)

        (token, positions, pools), outs = jax.lax.scan(
            body, (last_token, positions, pools), None, length=chunk)
        if logprobs:
            toks, lps = outs
            return (jnp.transpose(toks), jnp.transpose(lps), token,
                    positions, pools)
        return jnp.transpose(outs), token, positions, pools

    return run


@functools.lru_cache(maxsize=16)
def _paged_spec_chunk_fn(model: MultiFrameMLLM, n_slots: int, chunk: int,
                         n_draft: int, hist_len: int):
    """`chunk` speculative iterations over the paged pools in one
    dispatch. Drafting/acceptance is serving's prompt-lookup logic
    (serving._draft_lookup/_accept_chain); each verify is ONE t = n+1
    forward through the paged gather path (llm.py writes the chain's
    kv rows at consecutive (page, offset) slots — rejected drafts leave
    garbage past the emitted position that later writes overwrite
    before the mask admits it, exactly like the contiguous path)."""
    from .serving import _accept_chain, _draft_lookup

    k = n_draft
    rows = jnp.arange(n_slots)

    @functools.partial(jax.jit, donate_argnums=(3,))
    def run(params, positions, hist, pools, page_table, lora=None):
        pool_keys = [kk for kk in ("k_pages", "v_pages", "k_scale",
                                   "v_scale") if kk in pools[0]]

        def body(carry, _):
            positions, hist, pools = carry
            cur, draft = _draft_lookup(hist, positions, k, hist_len)
            tokens_in = jnp.clip(
                jnp.concatenate([cur[:, None], draft], axis=1), 0, None)
            pos_block = positions[:, None] + jnp.arange(k + 1)[None, :]
            chain = [dict(p, page_table=page_table, index=positions)
                     for p in pools]
            logits, caches = model.apply(
                params, tokens_in, pos_block, chain,
                method=lambda mdl, tok, pos, cc:
                    mdl.llm(input_embeds=mdl.llm.embed(tok),
                            positions=pos, caches=cc, lora=lora))
            pools = [{kk: c[kk] for kk in pool_keys} for c in caches]
            cand, n_emit = _accept_chain(draft, logits)
            slot = jnp.arange(k + 1)[None, :]
            emit = slot < n_emit[:, None]
            hidx = jnp.where(emit, positions[:, None] + 1 + slot,
                             hist_len)                 # OOB -> dropped
            hist = hist.at[rows[:, None], hidx].set(cand, mode="drop")
            return (positions + n_emit, hist, pools), (cand, n_emit)

        (positions, hist, pools), (cands, counts) = jax.lax.scan(
            body, (positions, hist, pools), None, length=chunk)
        return (jnp.transpose(cands, (1, 0, 2)), jnp.transpose(counts),
                positions, hist, pools)

    return run


class PagedBatcher:
    """Continuous batching over a shared KV page pool (greedy by
    default; per-request sampling with PagedConfig(sampling=True))."""

    def __init__(self, model: MultiFrameMLLM, params,
                 config: PagedConfig | None = None,
                 pad_id: int = 0, eos_id: int = 2,
                 adapters: dict | None = None, lora_config=None,
                 stop_ids: tuple = ()):
        """`adapters`: optional {name: adapter_tree} of LoRA adapters
        (parallel/lora.init_lora structure) served UNMERGED per request
        (parallel/lora_serving): a request tuple may carry an adapter
        name as its third element; one batch mixes adapters and base
        rows freely. `stop_ids`: extra token ids that terminate like
        eos (first stop wins, excluded from the output)."""
        self.model = model
        self.params = params
        self.config = config or PagedConfig()
        self.pad_id = pad_id
        self.eos_id = eos_id
        self.stop_ids = frozenset({int(eos_id), *map(int, stop_ids)})
        cfg = self.config
        assert not (cfg.speculate and cfg.sampling), \
            "speculative decoding is greedy-exact; disable sampling"
        assert not (cfg.speculate and cfg.logprobs), \
            "logprobs are not recorded on the speculative path"
        # rid -> [f32 logprob per returned token] for the most recent
        # generate_all/generate_stream call (cfg.logprobs)
        self.request_logprobs: dict[int, list[float]] = {}
        self.lora_tables = None
        self.adapter_index: dict = {}
        if adapters:
            from ..parallel.lora_serving import stack_adapters

            if lora_config is None:
                raise ValueError(
                    "PagedBatcher(adapters=...) needs lora_config: the "
                    "adapter trees carry rank but not alpha, and a "
                    "default scale would silently mis-serve them")
            names = list(adapters)
            self.lora_tables = stack_adapters(
                [adapters[n] for n in names],
                model.cfg.llm.num_layers, lora_config)
            self.adapter_index = {n: i + 1 for i, n in enumerate(names)}
        self.slot_adapter = np.zeros(cfg.slots, dtype=np.int32)
        self.pools = init_paged_pools(model.cfg.llm, cfg)
        self.allocator = PageAllocator(cfg.num_pages)
        # host-side mirrors; uploaded per chunk (a few hundred int32s)
        self.page_table = np.zeros((cfg.slots, cfg.pages_per_slot),
                                   dtype=np.int32)
        self.slot_pages: list[list[int]] = [[] for _ in range(cfg.slots)]
        self.positions = np.zeros(cfg.slots, dtype=np.int32)
        self.last_token = np.zeros((cfg.slots, 1), dtype=np.int32)
        # per-slot sampling knobs (cfg.sampling): temperature 0 = greedy
        self.temperature = np.zeros(cfg.slots, dtype=np.float32)
        self.top_p = np.ones(cfg.slots, dtype=np.float32)
        self.seed = np.zeros(cfg.slots, dtype=np.int32)
        # prefix cache: page-key -> page id, LRU-ordered; the cache holds
        # one reference per entry so shared pages survive slot frees
        self.prefix_pages: OrderedDict[bytes, int] = OrderedDict()
        self._page_key: dict[int, bytes] = {}
        self.stats = {"prefill_full": 0, "prefill_resumed": 0,
                      "pages_reused": 0, "pages_evicted": 0,
                      "vision_hits": 0}
        # tile-digest -> projected vision features (chunked prefill)
        self.vision_feats: OrderedDict[bytes, jax.Array] = OrderedDict()
        # per-slot prompt+generated history for prompt-lookup drafting
        self.hist_len = cfg.max_prompt_len + cfg.max_new_tokens + 1
        if cfg.speculate:
            self.hist = np.full((cfg.slots, self.hist_len), -1, np.int32)

    # -- page management ---------------------------------------------------

    def _free_slot(self, slot: int) -> None:
        self.allocator.release(self.slot_pages[slot])
        self.slot_pages[slot] = []
        self.page_table[slot, :] = 0            # sink: writes can't corrupt
        self.positions[slot] = 0                # idle decode stays in-range
        self.last_token[slot, 0] = 0
        self.slot_adapter[slot] = 0
        self.temperature[slot] = 0.0
        self.top_p[slot] = 1.0
        self.seed[slot] = 0
        if self.config.speculate:
            self.hist[slot, :] = -1

    def _alloc(self, n: int) -> list[int] | None:
        """Allocate n pages, evicting LRU prefix-cache entries whose only
        reference is the cache itself when the free list runs dry."""
        got = self.allocator.alloc(n)
        while got is None:
            victim = next((k for k, p in self.prefix_pages.items()
                           if self.allocator.refs.get(p) == 1), None)
            if victim is None:
                return None
            page = self.prefix_pages.pop(victim)
            del self._page_key[page]
            self.allocator.release([page])
            self.stats["pages_evicted"] += 1
            got = self.allocator.alloc(n)
        return got

    def _extend_to(self, slot: int, n_positions: int) -> bool:
        """Ensure the slot's table covers logical positions < n_positions."""
        cfg = self.config
        need = -(-n_positions // cfg.page_size)
        have = len(self.slot_pages[slot])
        if need <= have:
            return True
        assert need <= cfg.pages_per_slot, (need, cfg.pages_per_slot)
        got = self._alloc(need - have)
        if got is None:
            return False
        self.page_table[slot, have:need] = got
        self.slot_pages[slot].extend(got)
        return True

    def _page_keys(self, prompt_ids: np.ndarray, tiles,
                   adapter=None) -> list[bytes]:
        """Digest per FULL page of real prompt tokens. A page's key
        covers every token id up to its end plus, once any vision
        position precedes that end, the tile pixels (vision-token kv
        depends on the tile content, not just the placeholder id) —
        and the adapter name, since adapted projections change every
        kv row (pages never shared across adapters)."""
        ps = self.config.page_size
        img = int(self.model.cfg.img_context_id)
        ids = np.asarray(prompt_ids, dtype=np.int32)
        tiles_digest = None
        keys = []
        for p in range(len(ids) // ps):
            head = ids[: (p + 1) * ps]
            h = hashlib.blake2b(head.tobytes(), digest_size=16)
            h.update(repr(adapter).encode())
            if (head == img).any():
                if tiles_digest is None:
                    tiles_digest = hashlib.blake2b(
                        np.ascontiguousarray(tiles).tobytes(),
                        digest_size=16).digest()
                h.update(tiles_digest)
            keys.append(h.digest())
        return keys

    def clear_prefix_cache(self) -> None:
        """Drop every cache-owned page reference (pages still borrowed
        by live slots stay resident until their slot frees them)."""
        for key, page in list(self.prefix_pages.items()):
            del self._page_key[page]
            self.allocator.release([page])
        self.prefix_pages.clear()

    def _lora_for(self, idx) -> dict | None:
        """Serving bundle for the jitted programs: stacked tables + the
        per-row adapter indices (0 = base)."""
        if self.lora_tables is None:
            return None
        return {"scale": self.lora_tables["scale"],
                "idx": jnp.asarray(idx, jnp.int32),
                "layers": self.lora_tables["layers"]}

    # -- request lifecycle ---------------------------------------------------

    def _unpack(self, request):
        """(ids, tiles[, adapter_name][, SamplingParams][, max_new])
        in any trailing order — an adapter is a str, sampling knobs a
        SamplingParams, a per-request token budget an int (1 ..
        config.max_new_tokens, which stays the cap and the default)."""
        ids, tiles, adapter, sp, max_new = (request[0], request[1],
                                            None, None, None)
        for extra in request[2:]:
            if isinstance(extra, SamplingParams):
                sp = extra
            elif isinstance(extra, str):
                if extra not in self.adapter_index:
                    raise ValueError(
                        f"unknown adapter {extra!r}; registered: "
                        f"{sorted(self.adapter_index)}")
                adapter = extra
            elif isinstance(extra, int) and not isinstance(extra, bool):
                if not 1 <= extra <= self.config.max_new_tokens:
                    raise ValueError(
                        f"per-request max_new_tokens {extra} outside "
                        f"1..{self.config.max_new_tokens} "
                        f"(PagedConfig.max_new_tokens is the cap)")
                max_new = extra
            else:
                raise TypeError(
                    f"request extras must be an adapter name (str), "
                    f"SamplingParams, or a max_new_tokens int, got "
                    f"{type(extra).__name__}")
        return ids, tiles, adapter, sp or SamplingParams(), max_new

    def _prefill_into(self, slot: int, prompt_ids: np.ndarray, tiles,
                      adapter=None, sp: SamplingParams | None = None):
        """Returns the first generated token id, or None if the pool
        cannot cover the prompt right now."""
        cfg = self.config
        sp = sp or SamplingParams()
        assert cfg.sampling or (sp.temperature == 0.0), \
            "pass PagedConfig(sampling=True) to use SamplingParams"
        ps = cfg.page_size
        ids = pad_to_bucket(prompt_ids[None], cfg.length_bucket, self.pad_id)
        t = ids.shape[1]
        assert t <= cfg.max_prompt_len, (t, cfg.max_prompt_len)
        true_len = np.int32(len(prompt_ids))
        c = cfg.prefill_chunk
        n_cover = -(-t // ps)

        # prefix-cache lookup: longest run of cached full pages, capped
        # so at least one REAL token remains in the suffix (the resumed
        # forward needs the last real row for the first-token logits).
        # The one-shot resume program embeds tokens without tiles, so it
        # additionally requires a text-only suffix; the chunked path
        # splices vision features for the whole prompt and has no such
        # restriction.
        aidx = 0 if adapter is None else self.adapter_index[adapter]
        lora1 = self._lora_for([aidx])
        samp = {}
        if cfg.sampling:
            samp = {"temperature": jnp.asarray(sp.temperature, jnp.float32),
                    "top_p": jnp.asarray(sp.top_p, jnp.float32),
                    "seed": jnp.asarray(sp.seed, jnp.int32)}
        keys: list[bytes] = []
        j = 0
        if cfg.prefix_cache:
            keys = self._page_keys(prompt_ids, tiles, adapter)
            j_max = (int(true_len) - 1) // ps
            while j < j_max and keys[j] in self.prefix_pages:
                j += 1
            img = int(self.model.cfg.img_context_id)
            if j and not c \
                    and (np.asarray(prompt_ids[j * ps:]) == img).any():
                j = 0

        if c:
            # chunked prefill coverage: m fixed-size chunks starting at
            # the shared-page boundary; the final chunk's pad-row writes
            # land inside the covered span
            start = j * ps
            m = -(-(int(true_len) - start) // c)
            n_cover = -(-(start + m * c) // ps)

        fresh = self._alloc(n_cover - j)
        if fresh is None:
            return None
        shared = []
        for p in range(j):
            page = self.prefix_pages[keys[p]]
            self.prefix_pages.move_to_end(keys[p])
            self.allocator.retain(page)
            shared.append(page)
        pages = shared + fresh
        self.slot_pages[slot] = pages
        self.page_table[slot, :n_cover] = pages
        self.stats["pages_reused"] += j

        self.stats["prefill_resumed" if j else "prefill_full"] += 1
        if c:
            if cfg.vision_cache:
                digest = hashlib.blake2b(
                    np.ascontiguousarray(tiles).tobytes(),
                    digest_size=16).digest()
                vis = self.vision_feats.get(digest)
                if vis is None:
                    vis = _vision_feats_fn(self.model)(
                        self.params, jnp.asarray(tiles[None]))
                    self.vision_feats[digest] = vis
                    while len(self.vision_feats) > cfg.vision_cache:
                        self.vision_feats.popitem(last=False)
                else:
                    self.stats["vision_hits"] += 1
                    self.vision_feats.move_to_end(digest)
                emb = _splice_embeds_fn(self.model, t,
                                        cfg.max_prompt_len + c)(
                    self.params, jnp.asarray(ids), vis)
            else:
                emb = _spliced_embeds_fn(self.model, t,
                                         cfg.max_prompt_len + c)(
                    self.params, jnp.asarray(ids), jnp.asarray(tiles[None]))
            pt_row = jnp.asarray(self.page_table[slot][None])
            chunk_fn = _prefill_chunk_fn(self.model, c, cfg.sampling,
                                         cfg.top_k, cfg.logprobs)
            for i in range(m):
                if cfg.logprobs:
                    toks, lps, self.pools = chunk_fn(
                        self.params, emb,
                        jnp.asarray(start + i * c, jnp.int32),
                        self.pools, pt_row, lora=lora1, **samp)
                else:
                    toks, self.pools = chunk_fn(
                        self.params, emb,
                        jnp.asarray(start + i * c, jnp.int32),
                        self.pools, pt_row, lora=lora1, **samp)
            first_row = (int(true_len) - 1) - (start + (m - 1) * c)
            first = np.asarray(toks)[first_row][None, None]
            if cfg.logprobs:
                first_lp = float(np.asarray(lps)[first_row])
        elif j:
            out = _prefix_resume_fn(
                self.model, ps, j, t, cfg.sampling, cfg.top_k,
                cfg.logprobs)(
                self.params, self.pools,
                jnp.asarray(shared, dtype=jnp.int32),
                jnp.asarray(fresh[: n_cover - j], dtype=jnp.int32),
                jnp.asarray(ids), jnp.asarray(true_len), lora=lora1,
                **samp)
            if cfg.logprobs:
                first, lp_arr, self.pools = out
                first_lp = float(np.asarray(lp_arr)[0])
            else:
                first, self.pools = out
        else:
            out = _prefill_one_fn(
                self.model, t, cfg.sampling, cfg.top_k, cfg.logprobs)(
                self.params, jnp.asarray(ids), jnp.asarray(tiles[None]),
                jnp.asarray(true_len),
                jnp.asarray(sp.temperature, jnp.float32),
                jnp.asarray(sp.top_p, jnp.float32),
                jnp.asarray(sp.seed, jnp.int32), lora=lora1)
            if cfg.logprobs:
                first, lp_arr, row_caches = out
                first_lp = float(np.asarray(lp_arr)[0])
            else:
                first, row_caches = out
            self.pools = _paged_insert_fn(self.model, ps, n_cover, t)(
                self.pools, row_caches,
                jnp.asarray(pages, dtype=jnp.int32))

        # register this prompt's full pages for future prefix hits (one
        # cache-owned reference each)
        if cfg.prefix_cache:
            for p in range(int(true_len) // ps):
                if keys[p] not in self.prefix_pages:
                    self.prefix_pages[keys[p]] = pages[p]
                    self._page_key[pages[p]] = keys[p]
                    self.allocator.retain(pages[p])

        self.positions[slot] = int(true_len)
        self.last_token[slot, 0] = int(first[0, 0])
        self.slot_adapter[slot] = aidx
        self.temperature[slot] = sp.temperature
        self.top_p[slot] = sp.top_p
        self.seed[slot] = sp.seed
        if cfg.speculate:
            self.hist[slot, :] = -1
            self.hist[slot, : len(prompt_ids)] = prompt_ids
            self.hist[slot, int(true_len)] = int(first[0, 0])
        return (int(first[0, 0]),
                first_lp if cfg.logprobs else None)

    def generate_all(self, requests) -> list[np.ndarray]:
        """requests: iterable of (prompt_ids int32 [T], tiles [n,H,W,3])
        plus optional trailing elements: an adapter name (str, see
        `adapters`), a `SamplingParams` (PagedConfig(sampling=True)),
        and/or a per-request max_new_tokens int (<= the config cap).
        Returns generated token arrays (cut at eos, <= max_new_tokens),
        in request order. Requests that cannot get prompt pages are
        deferred; a running slot that cannot extend its window is
        preempted (pages freed, request restarted later from prefill) —
        greedy decoding makes the restart produce identical tokens, and
        sampled draws are keyed by (seed, absolute position), so replays
        reproduce the same stream too."""
        requests = list(requests)
        acc: dict[int, list[int]] = {i: [] for i in range(len(requests))}
        for rid, toks, _done in self.generate_stream(requests):
            acc[rid].extend(toks)
        return [np.asarray(acc[i], dtype=np.int32) for i in sorted(acc)]

    def generate_stream(self, requests):
        """Incremental serving: yields `(request_id, new_tokens, done)`
        after every prefill / decode dispatch, where `new_tokens` is the
        list of FRESH eos-cut tokens for that request (possibly empty on
        the final `done` event). Concatenating a request's increments
        reproduces `generate_all`'s output exactly. If pool pressure
        preempts a running slot, its greedy replay re-derives the same
        prefix and only tokens beyond the already-streamed count are
        emitted (with approximate modes — int8 kv, prefix_cache — a
        replay could in principle diverge from the streamed prefix; the
        stream never rewinds, it keeps extending from the streamed
        count)."""
        cfg = self.config
        # one unpack per request: validates extras at enqueue and feeds
        # both the budget table and the refill prefills below
        unpacked = {rid: self._unpack(req)
                    for rid, req in enumerate(requests)}
        queue = sorted(unpacked)
        results: dict[int, list[int]] = {}
        lprobs: dict[int, list[float]] = {}
        self.request_logprobs = {}
        emitted: dict[int, int] = {}      # clean tokens already yielded
        slot_req = [-1] * cfg.slots
        if cfg.speculate:
            decode = _paged_spec_chunk_fn(self.model, cfg.slots, cfg.chunk,
                                          cfg.speculate, self.hist_len)
        else:
            decode = _paged_decode_chunk_fn(self.model, cfg.slots,
                                            cfg.chunk, cfg.sampling,
                                            cfg.top_k, cfg.logprobs)
        # logical positions covered per dispatch (a speculative
        # iteration writes up to speculate rows past its last emit)
        advance = cfg.chunk * (cfg.speculate + 1)
        stalled = 0  # consecutive loop turns with no decode/finish progress

        budgets = {rid: u[4] or cfg.max_new_tokens
                   for rid, u in unpacked.items()}

        def finished(rid):
            toks = results[rid]
            return (len(toks) >= budgets[rid]
                    or (toks and toks[-1] in self.stop_ids))

        def _cut_len(toks):
            cut = [i for i, t in enumerate(toks) if t in self.stop_ids]
            return cut[0] if cut else len(toks)

        def increment(rid):
            toks = results[rid][: _cut_len(results[rid])]
            new = toks[emitted.get(rid, 0):]
            emitted[rid] = max(emitted.get(rid, 0), len(toks))
            return new

        while queue or any(r >= 0 for r in slot_req):
            if stalled > 2 * cfg.slots + 4:
                raise RuntimeError(
                    f"paged pool too small to make progress: "
                    f"{cfg.num_pages} pages, {self.allocator.available} "
                    f"free, {len(queue)} queued")
            stalled += 1
            # refill free slots while pages allow
            for slot in range(cfg.slots):
                if slot_req[slot] < 0 and queue:
                    rid = queue[0]
                    ids_r, tiles_r, ad_r, sp_r, _ = unpacked[rid]
                    got = self._prefill_into(slot, ids_r, tiles_r,
                                             ad_r, sp_r)
                    if got is None:             # pool dry: defer refill
                        break
                    first, first_lp = got
                    queue.pop(0)
                    slot_req[slot] = rid
                    results[rid] = [first]
                    lprobs[rid] = [first_lp]
                    done = finished(rid)
                    if done and cfg.logprobs:
                        self.request_logprobs[rid] = \
                            lprobs[rid][: _cut_len(results[rid])]
                    yield rid, increment(rid), done
                    if done:
                        stalled = 0
                        slot_req[slot] = -1
                        self._free_slot(slot)
            # extend page coverage for this chunk; preempt on dry pool
            for slot in range(cfg.slots):
                rid = slot_req[slot]
                if rid < 0:
                    continue
                horizon = min(int(self.positions[slot]) + advance,
                              cfg.max_len)
                if not self._extend_to(slot, horizon):
                    queue.insert(0, rid)        # preempt: retry from prefill
                    del results[rid]
                    lprobs.pop(rid, None)
                    slot_req[slot] = -1
                    self._free_slot(slot)
            if not any(r >= 0 for r in slot_req):
                continue
            lora = self._lora_for(self.slot_adapter)
            if cfg.speculate:
                cands, counts, positions, hist, self.pools = decode(
                    self.params, jnp.asarray(self.positions),
                    jnp.asarray(self.hist), self.pools,
                    jnp.asarray(self.page_table), lora=lora)
                stalled = 0
                cands, counts = np.asarray(cands), np.asarray(counts)
                self.positions = np.array(positions)
                self.hist = np.array(hist)
            else:
                dsamp = {}
                if cfg.sampling:
                    dsamp = {"temperature": jnp.asarray(self.temperature),
                             "top_p": jnp.asarray(self.top_p),
                             "seed": jnp.asarray(self.seed)}
                if cfg.logprobs:
                    toks, dlps, last, positions, self.pools = decode(
                        self.params, jnp.asarray(self.last_token),
                        jnp.asarray(self.positions), self.pools,
                        jnp.asarray(self.page_table), lora=lora, **dsamp)
                    dlps = np.asarray(dlps)
                else:
                    toks, last, positions, self.pools = decode(
                        self.params, jnp.asarray(self.last_token),
                        jnp.asarray(self.positions), self.pools,
                        jnp.asarray(self.page_table), lora=lora, **dsamp)
                stalled = 0
                toks = np.asarray(toks)
                self.last_token = np.array(last)
                self.positions = np.array(positions)
            # idle slots decode into the sink page but their positions
            # still advance by `advance` each dispatch; re-zero them so a
            # long pool-dry stretch cannot walk index//page_size past
            # the slot's page-table row (out-of-window scalar reads in
            # the paged kernel).
            for slot in range(cfg.slots):
                if slot_req[slot] < 0:
                    self.positions[slot] = 0
                    self.last_token[slot, 0] = 0
                    if cfg.speculate:
                        self.hist[slot, :] = -1
            for slot in range(cfg.slots):
                rid = slot_req[slot]
                if rid < 0:
                    continue
                if cfg.speculate:
                    for i in range(cfg.chunk):
                        for tok in cands[slot, i, : counts[slot, i]]:
                            if finished(rid):
                                break
                            results[rid].append(int(tok))
                        if finished(rid):
                            break
                else:
                    for i, tok in enumerate(toks[slot]):
                        if finished(rid):
                            break
                        results[rid].append(int(tok))
                        if cfg.logprobs:
                            lprobs[rid].append(float(dlps[slot, i]))
                done = finished(rid)
                if done and cfg.logprobs:
                    self.request_logprobs[rid] = \
                        lprobs[rid][: _cut_len(results[rid])]
                yield rid, increment(rid), done
                if done:
                    slot_req[slot] = -1
                    self._free_slot(slot)


def bench_paged_config(chunk: int = 32, max_new_tokens: int = 128,
                       kv_dtype: str = "native",
                       prefix_cache: bool = False) -> PagedConfig:
    """The serving-benchmark configuration — ONE definition shared by
    bench.py, scripts/warm_bench_cache.py and
    scripts/profiles/_serve_drive.py so the warmed programs always match
    the bench's exact shapes (a drifted copy re-introduces the
    compile-service stall CLAUDE.md warns about).

    int8 pools use page_size=128: the fused decode kernel requires
    lane-aligned pages for the f32 scale-slab DMAs
    (ops/paged_attention.paged_kernel_ok) — at page_size=64 the int8
    path would silently fall back to the XLA gather. Pool capacity in
    kv ROWS stays the same (105x64 vs 53x128 within one page)."""
    if kv_dtype == "int8":
        page_size, num_pages = 128, 53
    else:
        page_size, num_pages = 64, 105
    return PagedConfig(slots=8, page_size=page_size, num_pages=num_pages,
                       max_prompt_len=512, max_new_tokens=max_new_tokens,
                       chunk=chunk, length_bucket=128, kv_dtype=kv_dtype,
                       prefix_cache=prefix_cache)


def make_serve_requests(cfg, n: int, seed: int = 5,
                        questions_per_image: int = 1) -> list:
    """MultiSPA-shaped serving requests: an image-context prompt (one
    tile's worth of img_context_id tokens) followed by a random text
    tail of 40-200 tokens. Deterministic in (n, seed).

    `questions_per_image > 1` groups consecutive requests onto one
    image AND one shared leading text stretch (the eval-campaign shape:
    many questions per image pair) — the regime prefix caching serves.
    """
    rng = np.random.default_rng(seed)
    t_img = cfg.tokens_per_tile
    out = []
    head = tiles = None
    for i in range(n):
        if i % questions_per_image == 0:
            head = rng.integers(10, cfg.llm.vocab_size,
                                size=t_img + 2 + 24).astype(np.int32)
            head[1:1 + t_img] = cfg.img_context_id
            tiles = np.asarray(jax.random.normal(
                jax.random.key(100 + i),
                (1, cfg.vit.image_size, cfg.vit.image_size, 3),
                dtype=jnp.float32))
        text = int(rng.integers(16, 176))
        tail = rng.integers(10, cfg.llm.vocab_size,
                            size=text).astype(np.int32)
        out.append((np.concatenate([head, tail]), tiles))
    return out
