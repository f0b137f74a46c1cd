"""Continuous-batching serving loop for the multi-frame MLLM.

`predict_batch` (runner.py) decodes a fixed batch to completion — short
answers wait for the longest row. This module keeps a fixed number of
decode SLOTS busy instead: each request is prefilled individually (B=1,
so any tile count / prompt length mixes freely) and its KV rows are
inserted into the batch cache at a free slot; decoding then proceeds in
jitted multi-token chunks over all slots at per-slot positions, and a
slot is refilled with the next queued request the moment its row emits
eos. Outputs are bit-identical to running `greedy_generate` per request
(greedy decoding depends only on a slot's own cache rows; stale kv from
a previous occupant is always overwritten before the valid mask can
admit it) — test-asserted.

Per-request SAMPLING (`ServeConfig(sampling=True)` + a `SamplingParams`
per request) draws each token with the key
`fold_in(key(seed), position)` — a function of the request's seed and
the ABSOLUTE position of the logits row only, so results are
deterministic AND independent of slot assignment, chunk boundaries, and
batch composition (test-asserted), and a preempted request restarted
from prefill reproduces its stream. `temperature=0` rows take the exact
argmax path, so mixed greedy/sampled batches keep greedy rows
bit-identical to the all-greedy batcher. The default `sampling=False`
compiles the plain argmax step (no per-step vocab sort for the nucleus
cutoff).

Throughput levers: one device dispatch per `chunk` decode steps for the
whole batch, compiled callables cached per shape signature, and slots
that finish early immediately start the next request instead of idling.

TENSOR-PARALLEL serving needs no code here: pass params committed via
`parallel.sharding.shard_params(params, mesh)` and GSPMD propagates the
Megatron layout through every jitted program (prefill, slot insert,
chunked decode), emitting the row-parallel all-reduces over ICI. The
batcher stays BIT-identical to per-request `greedy_generate` under the
same sharded params (tests/test_tp_serving.py; also exercised by
__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .generate import _draw, decode_logits, pad_to_bucket
from .llm import init_cache
from .mllm import MultiFrameMLLM


@dataclasses.dataclass
class ServeConfig:
    slots: int = 4                 # concurrent decode rows
    max_prompt_len: int = 512      # prompts padded up to this bucket
    max_new_tokens: int = 32
    chunk: int = 8                 # decode steps per device dispatch
    length_bucket: int = 128       # prefill shape bucketing
    sampling: bool = False         # enable per-request SamplingParams
    top_k: int | None = None       # static top-k when sampling
    speculate: int = 0             # >0: prompt-lookup speculative decode
    #   with this many draft tokens per forward (greedy only — tokens
    #   stay BIT-identical to the plain batcher; each chunk iteration
    #   then emits 1..speculate+1 tokens per slot instead of exactly 1)
    # record each emitted token's f32 log-softmax probability under the
    # raw logits (see PagedConfig.logprobs — same semantics). Read
    # `batcher.request_logprobs[rid]` after generate_all, aligned 1:1
    # with the returned (stop-cut) tokens. Mutually exclusive with
    # speculate.
    logprobs: bool = False


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request decode knobs (ServeConfig.sampling=True).

    temperature=0 (the default) is exact greedy; `seed` names the
    request's reproducible draw stream (see module docstring)."""
    temperature: float = 0.0
    top_p: float = 1.0
    seed: int = 0


def _row_keys(seed, positions):
    """One independent PRNG key per slot: fold the request seed with the
    absolute position of the logits row being sampled."""
    return jax.vmap(
        lambda s, p: jax.random.fold_in(jax.random.key(s), p))(
            seed, positions)


def _token_logprob(logits, token):
    """f32 log-softmax of `logits` `[B, V]` at `token` `[B, 1]` — the
    predictive confidence of the emitted token (for greedy this is the
    max log-probability; for sampled tokens it is the model's
    probability of the drawn token BEFORE temperature/top-p shaping)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lp, token, axis=-1)[..., 0]


@functools.lru_cache(maxsize=16)
def _prefill_one_fn(model: MultiFrameMLLM, prompt_len: int,
                    sampling: bool = False, top_k: int | None = None,
                    logprobs: bool = False):
    """B=1 prefill at a bucketed prompt length -> (first token, caches)
    (+ the first token's logprob when `logprobs`)."""

    def fn(params, ids, tiles, true_len, temperature, top_p, seed,
           lora=None):
        caches = init_cache(model.cfg.llm, 1, prompt_len)
        logits, caches = model.apply(
            params, ids, tiles, caches, true_len, lora,
            method=MultiFrameMLLM.prefill)
        last = jnp.take_along_axis(
            logits, (true_len - 1)[None, None, None], axis=1)[:, 0]
        if sampling:
            keys = _row_keys(seed[None], (true_len - 1)[None])
            first = _draw(keys, last, temperature[None], top_k,
                          top_p[None])[:, None]
        else:
            first = jnp.argmax(last, axis=-1)[:, None]
        if logprobs:
            return first, _token_logprob(last, first), caches
        return first, caches

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _insert_slot_fn(model: MultiFrameMLLM, n_slots: int, max_len: int,
                    prompt_len: int):
    """Scatter a single request's prefilled KV rows into batch slot b."""

    def fn(batch_caches, row_caches, b):
        zero = jnp.zeros((), jnp.int32)
        out = []
        for bc, rc in zip(batch_caches, row_caches):
            k = jax.lax.dynamic_update_slice(
                bc["k"], rc["k"], (b, zero, zero, zero))
            v = jax.lax.dynamic_update_slice(
                bc["v"], rc["v"], (b, zero, zero, zero))
            out.append({"k": k, "v": v, "index": bc["index"]})
        return out

    # donate the batch cache: the slot insert is an in-place update
    return jax.jit(fn, donate_argnums=(0,))


@functools.lru_cache(maxsize=16)
def _decode_chunk_fn(model: MultiFrameMLLM, n_slots: int, chunk: int,
                     sampling: bool = False, top_k: int | None = None,
                     logprobs: bool = False):
    """`chunk` decode steps for every slot in one dispatch.

    positions is `[B]` (per-slot cache index); returns the `[B, chunk]`
    tokens and updated caches/positions (plus `[B, chunk]` f32 logprobs
    when `logprobs`). Inactive slots decode whatever their cache holds —
    the host discards those tokens.
    """

    @functools.partial(jax.jit, donate_argnums=(3,))
    def run(params, last_token, positions, caches, temperature, top_p,
            seed):
        # normalize the carry: per-slot [B] cache indices, int32 tokens
        caches = [
            {"k": c["k"], "v": c["v"], "index": positions} for c in caches
        ]
        last_token = last_token.astype(jnp.int32)

        def body(carry, _):
            token, positions, caches = carry
            logits, caches = decode_logits(model, params, token,
                                           positions, caches)
            if sampling:
                keys = _row_keys(seed, positions)
                token = _draw(keys, logits, temperature, top_k,
                              top_p)[:, None]
            else:
                token = jnp.argmax(logits, axis=-1)[:, None]
            out = token[:, 0].astype(jnp.int32)
            if logprobs:
                out = (out, _token_logprob(logits, token))
            return (token.astype(jnp.int32), positions + 1, caches), out

        (token, positions, caches), outs = jax.lax.scan(
            body, (last_token, positions, caches), None, length=chunk)
        if logprobs:
            toks, lps = outs
            return (jnp.transpose(toks), jnp.transpose(lps), token,
                    positions, caches)
        return jnp.transpose(outs), token, positions, caches

    return run


def _draft_lookup(hist, positions, k: int, hist_len: int):
    """Prompt-lookup drafting over per-slot history rows: find the last
    earlier occurrence of the (prev, cur) bigram ending at `positions`
    and propose the k tokens that followed it. Returns (cur `[B]`,
    draft `[B, k]`; unknown positions draft token 0)."""
    rows = jnp.arange(hist.shape[0])
    cur = hist[rows, positions]
    prev = hist[rows, positions - 1]
    m = (hist[:, :-1] == prev[:, None]) & (hist[:, 1:] == cur[:, None])
    j_arange = jnp.arange(hist_len - 1)
    m &= (j_arange + 1)[None, :] < positions[:, None]
    jbest = jnp.max(jnp.where(m, j_arange[None, :], -1), axis=1)
    dpos = jbest[:, None] + 2 + jnp.arange(k)[None, :]
    known = (jbest[:, None] >= 0) & (dpos <= positions[:, None])
    draft = jnp.take_along_axis(hist, jnp.clip(dpos, 0, hist_len - 1),
                                axis=1)
    return cur, jnp.where(known & (draft >= 0), draft, 0)


def _accept_chain(draft, logits):
    """Greedy verification of a drafted chain: accept the longest prefix
    where the model's argmax agrees, emit one extra model token. Returns
    (cand `[B, k+1]`, n_emit `[B]`)."""
    kk = draft.shape[1]
    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    match = (draft == g[:, :kk]).astype(jnp.int32)
    n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
    slot = jnp.arange(kk + 1)[None, :]
    cand = jnp.where(slot < n_acc[:, None],
                     jnp.concatenate([draft, draft[:, -1:]], axis=1), g)
    return cand, (n_acc + 1).astype(jnp.int32)


@functools.lru_cache(maxsize=16)
def _spec_chunk_fn(model: MultiFrameMLLM, n_slots: int, chunk: int,
                   n_draft: int, hist_len: int):
    """`chunk` SPECULATIVE iterations for every slot in one dispatch.

    Same drafting/verification as generate._spec_decode_fn, restated for
    the batcher's state layout: `hist` `[B, hist_len]` carries each
    slot's prompt+generated tokens (-1 = unknown; host-owned, reset on
    refill), `positions` `[B]` is the sequence position of each slot's
    LAST token (== its cache index). Each iteration drafts `n_draft`
    tokens by bigram lookup, verifies them in one t = n_draft + 1
    forward, and emits 1..n_draft+1 tokens; the host consumes
    `counts[slot, i]` tokens of `cands[slot, i]` per iteration, so the
    consumed stream is bit-identical to the plain one-token chunk loop.
    Slots advance at different rates (per-row cache indices). Inactive
    slots decode garbage the host discards, exactly like _decode_chunk_fn.
    """
    k = n_draft
    rows = jnp.arange(n_slots)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(params, positions, caches, hist):
        # normalize the carry: per-slot [B] cache indices
        caches = [
            {"k": c["k"], "v": c["v"], "index": positions} for c in caches
        ]

        def body(carry, _):
            positions, caches, hist = carry
            cur, draft = _draft_lookup(hist, positions, k, hist_len)

            # idle slots carry cur == -1; clip for a safe embed lookup
            # (their logits are discarded by the host either way)
            tokens_in = jnp.clip(
                jnp.concatenate([cur[:, None], draft], axis=1), 0, None)
            pos_block = positions[:, None] + jnp.arange(k + 1)[None, :]
            chain = [{"k": c["k"], "v": c["v"], "index": positions}
                     for c in caches]
            logits, caches = model.apply(
                params, tokens_in, pos_block, chain,
                method=lambda mdl, tok, pos, cc:
                    mdl.llm(input_embeds=mdl.llm.embed(tok),
                            positions=pos, caches=cc))
            cand, n_emit = _accept_chain(draft, logits)
            slot = jnp.arange(k + 1)[None, :]
            emit = slot < n_emit[:, None]
            hidx = jnp.where(emit, positions[:, None] + 1 + slot,
                             hist_len)                 # OOB -> dropped
            hist = hist.at[rows[:, None], hidx].set(cand, mode="drop")
            return (positions + n_emit, caches, hist), (cand, n_emit)

        (positions, caches, hist), (cands, counts) = jax.lax.scan(
            body, (positions, caches, hist), None, length=chunk)
        # cands: [chunk, B, k+1] -> [B, chunk, k+1]; counts -> [B, chunk]
        return (jnp.transpose(cands, (1, 0, 2)), jnp.transpose(counts),
                positions, caches, hist)

    return run


class ContinuousBatcher:
    """Serving over a fixed pool of decode slots (greedy by default;
    per-request sampling with ServeConfig(sampling=True); greedy-exact
    speculative decoding with ServeConfig(speculate=n))."""

    def __init__(self, model: MultiFrameMLLM, params,
                 config: ServeConfig | None = None,
                 pad_id: int = 0, eos_id: int = 2,
                 stop_ids: tuple = ()):
        """`stop_ids`: extra token ids that terminate a request like
        eos does (HF chat models often stop on <|im_end|> AND </s>);
        generation halts at whichever appears first, stop token
        excluded from the output."""
        self.model = model
        self.params = params
        self.config = config or ServeConfig()
        self.pad_id = pad_id
        self.eos_id = eos_id
        self.stop_ids = frozenset({int(eos_id), *map(int, stop_ids)})
        cfg = self.config
        assert not (cfg.speculate and cfg.sampling), \
            "speculative decoding is greedy-exact; disable sampling"
        assert not (cfg.speculate and cfg.logprobs), \
            "logprobs are not recorded on the speculative path"
        # rid -> [f32 logprob per returned token] for the most recent
        # generate_all call (cfg.logprobs)
        self.request_logprobs: dict[int, list[float]] = {}
        # speculation margin: an unfinished slot one token from its
        # max_new limit still dispatches a full t = speculate+1 verify
        # chain, whose kv rows must not clamp into earlier valid rows
        self.max_len = cfg.max_prompt_len + cfg.max_new_tokens \
            + (cfg.speculate + 1 if cfg.speculate else 0)
        self.caches = init_cache(model.cfg.llm, cfg.slots, self.max_len)
        self.positions = np.zeros(cfg.slots, dtype=np.int32)
        self.last_token = np.zeros((cfg.slots, 1), dtype=np.int32)
        self.temperature = np.zeros(cfg.slots, dtype=np.float32)
        self.top_p = np.ones(cfg.slots, dtype=np.float32)
        self.seed = np.zeros(cfg.slots, dtype=np.int32)
        # per-slot prompt+generated history for prompt-lookup drafting
        # (host-owned; -1 = unknown; row reset on refill)
        self.hist_len = cfg.max_prompt_len + cfg.max_new_tokens + 1
        self.hist = np.full((cfg.slots, self.hist_len), -1, np.int32)

    def _unpack(self, request):
        """(ids, tiles[, SamplingParams][, max_new_tokens int]) in any
        trailing order (same surface as PagedBatcher minus adapters)."""
        ids, tiles, sp, max_new = request[0], request[1], None, None
        for extra in request[2:]:
            if isinstance(extra, SamplingParams):
                sp = extra
            elif isinstance(extra, int) and not isinstance(extra, bool):
                if not 1 <= extra <= self.config.max_new_tokens:
                    raise ValueError(
                        f"per-request max_new_tokens {extra} outside "
                        f"1..{self.config.max_new_tokens}")
                max_new = extra
            else:
                raise TypeError(
                    f"request extras must be SamplingParams or a "
                    f"max_new_tokens int, got {type(extra).__name__}")
        return ids, tiles, sp or SamplingParams(), max_new

    def _prefill_into(self, slot: int, prompt_ids: np.ndarray, tiles,
                      sp: SamplingParams):
        cfg = self.config
        assert cfg.sampling or (sp.temperature == 0.0), \
            "pass ServeConfig(sampling=True) to use SamplingParams"
        ids = pad_to_bucket(prompt_ids[None], cfg.length_bucket,
                            self.pad_id)
        t = ids.shape[1]
        assert t <= cfg.max_prompt_len, (t, cfg.max_prompt_len)
        true_len = np.int32(len(prompt_ids))
        out = _prefill_one_fn(
            self.model, t, cfg.sampling, cfg.top_k, cfg.logprobs)(
                self.params, jnp.asarray(ids), jnp.asarray(tiles[None]),
                jnp.asarray(true_len),
                jnp.asarray(sp.temperature, jnp.float32),
                jnp.asarray(sp.top_p, jnp.float32),
                jnp.asarray(sp.seed, jnp.int32))
        if cfg.logprobs:
            first, first_lp, row_caches = out
        else:
            (first, row_caches), first_lp = out, None
        self.caches = _insert_slot_fn(
            self.model, cfg.slots, self.max_len, t)(
                self.caches, row_caches, jnp.asarray(slot, jnp.int32))
        self.positions[slot] = int(true_len)
        self.last_token[slot, 0] = int(first[0, 0])
        self.temperature[slot] = sp.temperature
        self.top_p[slot] = sp.top_p
        self.seed[slot] = sp.seed
        if cfg.speculate:
            self.hist[slot, :] = -1
            self.hist[slot, : len(prompt_ids)] = prompt_ids
            self.hist[slot, int(true_len)] = int(first[0, 0])
        return int(first[0, 0]), (
            float(np.asarray(first_lp)[0]) if cfg.logprobs else None)

    def generate_all(self, requests) -> list[np.ndarray]:
        """requests: iterable of (prompt_ids int32 [T], tiles [n,H,W,3])
        plus optional trailing SamplingParams and/or a per-request
        max_new_tokens int (<= the config cap, which is the default).
        Returns generated token arrays (cut at eos), in request order."""
        cfg = self.config
        queue = list(enumerate(requests))
        results: dict[int, list[int]] = {}
        lprobs: dict[int, list[float]] = {}
        self.request_logprobs = {}
        slot_req = [-1] * cfg.slots      # request id per slot (-1 = free)
        if cfg.speculate:
            decode = _spec_chunk_fn(self.model, cfg.slots, cfg.chunk,
                                    cfg.speculate, self.hist_len)
        else:
            decode = _decode_chunk_fn(self.model, cfg.slots, cfg.chunk,
                                      cfg.sampling, cfg.top_k,
                                      cfg.logprobs)

        budgets: dict[int, int] = {}

        def finished(rid):
            toks = results[rid]
            return (len(toks) >= budgets[rid]
                    or (toks and toks[-1] in self.stop_ids))

        while queue or any(r >= 0 for r in slot_req):
            for slot in range(cfg.slots):
                if slot_req[slot] < 0 and queue:
                    rid, request = queue.pop(0)
                    ids, tiles, sp, max_new = self._unpack(request)
                    budgets[rid] = max_new or cfg.max_new_tokens
                    first, first_lp = self._prefill_into(slot, ids,
                                                         tiles, sp)
                    slot_req[slot] = rid
                    results[rid] = [first]
                    lprobs[rid] = [first_lp]
                    if finished(rid):
                        slot_req[slot] = -1
            if not any(r >= 0 for r in slot_req):
                continue
            if cfg.speculate:
                cands, counts, positions, self.caches, hist = decode(
                    self.params, jnp.asarray(self.positions), self.caches,
                    jnp.asarray(self.hist))
                cands, counts = np.asarray(cands), np.asarray(counts)
                self.positions = np.array(positions)
                self.hist = np.array(hist)
                for slot in range(cfg.slots):
                    rid = slot_req[slot]
                    if rid < 0:
                        continue
                    for i in range(cfg.chunk):
                        for tok in cands[slot, i, : counts[slot, i]]:
                            if finished(rid):
                                break
                            results[rid].append(int(tok))
                        if finished(rid):
                            break
                    if finished(rid):
                        slot_req[slot] = -1
                continue
            if cfg.logprobs:
                toks, dlps, last, positions, self.caches = decode(
                    self.params, jnp.asarray(self.last_token),
                    jnp.asarray(self.positions), self.caches,
                    jnp.asarray(self.temperature),
                    jnp.asarray(self.top_p), jnp.asarray(self.seed))
                dlps = np.asarray(dlps)
            else:
                toks, last, positions, self.caches = decode(
                    self.params, jnp.asarray(self.last_token),
                    jnp.asarray(self.positions), self.caches,
                    jnp.asarray(self.temperature),
                    jnp.asarray(self.top_p), jnp.asarray(self.seed))
            toks = np.asarray(toks)
            # writable copies: host mutates per-slot state on refill
            self.last_token = np.array(last)
            self.positions = np.array(positions)
            for slot in range(cfg.slots):
                rid = slot_req[slot]
                if rid < 0:
                    continue
                for i, tok in enumerate(toks[slot]):
                    if finished(rid):
                        break
                    results[rid].append(int(tok))
                    if cfg.logprobs:
                        lprobs[rid].append(float(dlps[slot, i]))
                if finished(rid):
                    slot_req[slot] = -1   # refilled next loop iteration

        out = []
        for rid in sorted(results):
            toks = results[rid]
            cut = [i for i, t in enumerate(toks) if t in self.stop_ids]
            n = cut[0] if cut else len(toks)
            if cfg.logprobs:
                self.request_logprobs[rid] = lprobs[rid][:n]
            out.append(np.asarray(toks[:n], dtype=np.int32))
        return out
