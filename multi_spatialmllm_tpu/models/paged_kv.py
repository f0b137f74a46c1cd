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

import jax
import jax.numpy as jnp
import numpy as np

from .generate import pad_to_bucket
from .llm import LLMConfig
from .mllm import MultiFrameMLLM
from .serving import _prefill_one_fn


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

    @property
    def max_len(self) -> int:
        return self.max_prompt_len + self.max_new_tokens

    @property
    def pages_per_slot(self) -> int:
        return -(-self.max_len // self.page_size)


class PageAllocator:
    """Host-side free list over pages 1..num_pages-1 (0 is the sink)."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, 0, -1))

    @property
    def available(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> list[int] | None:
        """n pages, or None (allocation is all-or-nothing)."""
        if n < 0 or len(self._free) < n:
            return None
        return [self._free.pop() for _ in range(n)]

    def release(self, pages) -> None:
        for p in pages:
            assert 0 < p < self.num_pages, p
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
def _paged_decode_chunk_fn(model: MultiFrameMLLM, n_slots: int, chunk: int):
    """`chunk` greedy steps for every slot in one dispatch over the paged
    pools. positions is `[B]`; the page table is fixed for the whole
    chunk (the host pre-extends coverage before dispatch)."""

    def step(params, token, positions, pools, page_table):
        pool_keys = [k for k in ("k_pages", "v_pages", "k_scale",
                                 "v_scale") if k in pools[0]]
        caches = [dict(p, page_table=page_table, index=positions)
                  for p in pools]
        logits, caches = model.apply(
            params, token, positions[:, None], caches,
            method=lambda m, tok, pos, cc:
                m.llm(input_embeds=m.llm.embed(tok), positions=pos,
                      caches=cc))
        pools = [{k: c[k] for k in pool_keys} for c in caches]
        return jnp.argmax(logits[:, -1], axis=-1)[:, None], pools

    @functools.partial(jax.jit, donate_argnums=(3,))
    def run(params, last_token, positions, pools, page_table):
        last_token = last_token.astype(jnp.int32)

        def body(carry, _):
            token, positions, pools = carry
            token, pools = step(params, token, positions, pools,
                                page_table)
            return (token.astype(jnp.int32), positions + 1, pools), \
                token[:, 0].astype(jnp.int32)

        (token, positions, pools), toks = jax.lax.scan(
            body, (last_token, positions, pools), None, length=chunk)
        return jnp.transpose(toks), token, positions, pools

    return run


class PagedBatcher:
    """Greedy continuous batching over a shared KV page pool."""

    def __init__(self, model: MultiFrameMLLM, params,
                 config: PagedConfig | None = None,
                 pad_id: int = 0, eos_id: int = 2):
        self.model = model
        self.params = params
        self.config = config or PagedConfig()
        self.pad_id = pad_id
        self.eos_id = eos_id
        cfg = self.config
        self.pools = init_paged_pools(model.cfg.llm, cfg)
        self.allocator = PageAllocator(cfg.num_pages)
        # host-side mirrors; uploaded per chunk (a few hundred int32s)
        self.page_table = np.zeros((cfg.slots, cfg.pages_per_slot),
                                   dtype=np.int32)
        self.slot_pages: list[list[int]] = [[] for _ in range(cfg.slots)]
        self.positions = np.zeros(cfg.slots, dtype=np.int32)
        self.last_token = np.zeros((cfg.slots, 1), dtype=np.int32)

    # -- page management ---------------------------------------------------

    def _free_slot(self, slot: int) -> None:
        self.allocator.release(self.slot_pages[slot])
        self.slot_pages[slot] = []
        self.page_table[slot, :] = 0            # sink: writes can't corrupt
        self.positions[slot] = 0                # idle decode stays in-range
        self.last_token[slot, 0] = 0

    def _extend_to(self, slot: int, n_positions: int) -> bool:
        """Ensure the slot's table covers logical positions < n_positions."""
        cfg = self.config
        need = -(-n_positions // cfg.page_size)
        have = len(self.slot_pages[slot])
        if need <= have:
            return True
        assert need <= cfg.pages_per_slot, (need, cfg.pages_per_slot)
        got = self.allocator.alloc(need - have)
        if got is None:
            return False
        self.page_table[slot, have:need] = got
        self.slot_pages[slot].extend(got)
        return True

    # -- request lifecycle ---------------------------------------------------

    def _prefill_into(self, slot: int, prompt_ids: np.ndarray, tiles):
        """Returns the first generated token id, or None if the pool
        cannot cover the prompt right now."""
        cfg = self.config
        ids = pad_to_bucket(prompt_ids[None], cfg.length_bucket, self.pad_id)
        t = ids.shape[1]
        assert t <= cfg.max_prompt_len, (t, cfg.max_prompt_len)
        if not self._extend_to(slot, t):
            return None
        true_len = np.int32(len(prompt_ids))
        zero = jnp.zeros((), jnp.float32)
        first, row_caches = _prefill_one_fn(self.model, t)(
            self.params, jnp.asarray(ids), jnp.asarray(tiles[None]),
            jnp.asarray(true_len), zero, zero + 1.0,
            jnp.zeros((), jnp.int32))
        n_write = -(-t // cfg.page_size)
        self.pools = _paged_insert_fn(self.model, cfg.page_size, n_write, t)(
            self.pools, row_caches,
            jnp.asarray(self.slot_pages[slot][:n_write], dtype=jnp.int32))
        self.positions[slot] = int(true_len)
        self.last_token[slot, 0] = int(first[0, 0])
        return int(first[0, 0])

    def generate_all(self, requests) -> list[np.ndarray]:
        """requests: iterable of (prompt_ids int32 [T], tiles [n,H,W,3]).
        Returns generated token arrays (cut at eos, <= max_new_tokens),
        in request order. Requests that cannot get prompt pages are
        deferred; a running slot that cannot extend its window is
        preempted (pages freed, request restarted later from prefill) —
        greedy decoding makes the restart produce identical tokens."""
        cfg = self.config
        payload = dict(enumerate(requests))
        queue = sorted(payload)
        results: dict[int, list[int]] = {}
        slot_req = [-1] * cfg.slots
        decode = _paged_decode_chunk_fn(self.model, cfg.slots, cfg.chunk)
        stalled = 0  # consecutive loop turns with no decode/finish progress

        def finished(rid):
            toks = results[rid]
            return (len(toks) >= cfg.max_new_tokens
                    or (toks and toks[-1] == self.eos_id))

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
                    first = self._prefill_into(slot, *payload[rid])
                    if first is None:           # pool dry: defer refill
                        break
                    queue.pop(0)
                    slot_req[slot] = rid
                    results[rid] = [first]
                    if finished(rid):
                        stalled = 0
                        slot_req[slot] = -1
                        self._free_slot(slot)
            # extend page coverage for this chunk; preempt on dry pool
            for slot in range(cfg.slots):
                rid = slot_req[slot]
                if rid < 0:
                    continue
                horizon = min(int(self.positions[slot]) + cfg.chunk,
                              cfg.max_len)
                if not self._extend_to(slot, horizon):
                    queue.insert(0, rid)        # preempt: retry from prefill
                    del results[rid]
                    slot_req[slot] = -1
                    self._free_slot(slot)
            if not any(r >= 0 for r in slot_req):
                continue
            toks, last, positions, self.pools = decode(
                self.params, jnp.asarray(self.last_token),
                jnp.asarray(self.positions), self.pools,
                jnp.asarray(self.page_table))
            stalled = 0
            toks = np.asarray(toks)
            self.last_token = np.array(last)
            self.positions = np.array(positions)
            # idle slots decode into the sink page but their positions
            # still advance by `chunk` each dispatch; re-zero them so a
            # long pool-dry stretch cannot walk index//page_size past
            # the slot's page-table row (out-of-window scalar reads in
            # the paged kernel).
            for slot in range(cfg.slots):
                if slot_req[slot] < 0:
                    self.positions[slot] = 0
                    self.last_token[slot, 0] = 0
            for slot in range(cfg.slots):
                rid = slot_req[slot]
                if rid < 0:
                    continue
                for tok in toks[slot]:
                    if finished(rid):
                        break
                    results[rid].append(int(tok))
                if finished(rid):
                    slot_req[slot] = -1
                    self._free_slot(slot)

        out = []
        for rid in sorted(results):
            toks = results[rid]
            if self.eos_id in toks:
                toks = toks[: toks.index(self.eos_id)]
            out.append(np.asarray(toks, dtype=np.int32))
        return out


def bench_paged_config(chunk: int = 32,
                       max_new_tokens: int = 128) -> PagedConfig:
    """The serving-benchmark configuration — ONE definition shared by
    bench.py, scripts/warm_bench_cache.py and
    scripts/profiles/_serve_drive.py so the warmed programs always match
    the bench's exact shapes (a drifted copy re-introduces the
    compile-service stall CLAUDE.md warns about)."""
    return PagedConfig(slots=8, page_size=64, num_pages=105,
                       max_prompt_len=512, max_new_tokens=max_new_tokens,
                       chunk=chunk, length_bucket=128)


def make_serve_requests(cfg, n: int, seed: int = 5) -> list:
    """MultiSPA-shaped serving requests: an image-context prompt (one
    tile's worth of img_context_id tokens) followed by a random text
    tail of 40-200 tokens. Deterministic in (n, seed)."""
    rng = np.random.default_rng(seed)
    t_img = cfg.tokens_per_tile
    out = []
    for i in range(n):
        text = int(rng.integers(40, 200))
        ids = rng.integers(10, cfg.llm.vocab_size,
                           size=t_img + 2 + text).astype(np.int32)
        ids[1:1 + t_img] = cfg.img_context_id
        tiles = np.asarray(jax.random.normal(
            jax.random.key(100 + i),
            (1, cfg.vit.image_size, cfg.vit.image_size, 3),
            dtype=jnp.float32))
        out.append((ids, tiles))
    return out
