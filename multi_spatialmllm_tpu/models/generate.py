"""Greedy and sampled decoding for the multi-frame MLLM (KV-cache based).

Prefill runs once over the (optionally padded) prompt with pad keys masked
out of attention; the whole decode loop then runs INSIDE one jitted
`lax.while_loop` (one device dispatch for all `max_new_tokens` steps, with
early exit when every row has emitted eos) — per-token host round-trips
would dominate decode latency otherwise. The compiled prefill/decode
callables are cached per (model, shape signature), so repeated calls in
an eval run neither retrace nor relower. Padding prompts to a shared
bucket length keeps the number of compiled prefill shapes small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .llm import init_cache
from .mllm import MultiFrameMLLM


def pad_to_bucket(ids: np.ndarray, bucket: int, pad_id: int) -> np.ndarray:
    """Right-pad `[B, T]` ids to the next multiple of `bucket`."""
    t = ids.shape[1]
    target = ((t + bucket - 1) // bucket) * bucket
    if target == t:
        return ids
    pad = np.full((ids.shape[0], target - t), pad_id, dtype=ids.dtype)
    return np.concatenate([ids, pad], axis=1)


@functools.lru_cache(maxsize=32)
def _prefill_fn(model: MultiFrameMLLM):
    return jax.jit(
        lambda p, ids, tl, cc, n: model.apply(
            p, ids, tl, cc, n, method=MultiFrameMLLM.prefill))


def decode_logits(model: MultiFrameMLLM, params, token, positions, caches):
    """One decode step at per-row positions: rewrites each layer's cache
    index to the traced `[B]` positions (one compiled step serves every
    decode position and slot), embeds the last token, and returns the
    last-position logits `[B, V]` + caches. Shared by the while_loop
    decoders below and the continuous batcher (models/serving.py)."""
    caches = [
        {"k": c["k"], "v": c["v"], "index": positions} for c in caches
    ]
    logits, caches = model.apply(
        params, token, positions[:, None], caches,
        method=lambda m, tok, pos, cc:
            m.llm(input_embeds=m.llm.embed(tok), positions=pos,
                  caches=cc))
    return logits[:, -1], caches


def decode_step(model: MultiFrameMLLM, params, token, positions, caches):
    """Greedy decode_logits: (next_token [B, 1], caches)."""
    logits, caches = decode_logits(model, params, token, positions, caches)
    return jnp.argmax(logits, axis=-1)[:, None], caches


@functools.lru_cache(maxsize=32)
def _decode_fn(model: MultiFrameMLLM, b: int, max_new_tokens: int,
               eos_id: int | None):
    """Compiled full-decode loop for a (model, batch, length) signature.

    One decode step per `lax.while_loop` iteration; per-row positions
    ([B] cache indices) serve both the shared-length and per-row-length
    entry points. Early-exit semantics match the old per-step host loop
    exactly: a row is finished once ANY of its emitted tokens is eos, and
    the loop stops when all rows are; undecoded tail slots are eos-filled.
    The caches argument is donated (in-place KV update).
    """
    fill = eos_id if eos_id is not None else 0

    def step(params, token, positions, caches):
        return decode_step(model, params, token, positions, caches)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(params, first_token, caches, positions):
        out0 = jnp.full((b, max_new_tokens), fill, dtype=first_token.dtype)
        out0 = out0.at[:, 0].set(first_token[:, 0])

        def cond(carry):
            i, out, caches, positions = carry
            more = i < max_new_tokens
            if eos_id is None:
                return more
            # "finished" = row emitted eos among the i tokens decoded so
            # far (the fill value is eos too, so mask to emitted slots)
            emitted = jnp.arange(max_new_tokens) < i
            ever_eos = jnp.any((out == eos_id) & emitted[None, :], axis=1)
            return more & ~jnp.all(ever_eos)

        def body(carry):
            i, out, caches, positions = carry
            last = jnp.take_along_axis(
                out, jnp.broadcast_to((i - 1)[None, None], (b, 1)), axis=1)
            token, caches = step(params, last, positions, caches)
            out = jax.lax.dynamic_update_slice(
                out, token, (jnp.zeros((), jnp.int32), i))
            return i + 1, out, caches, positions + 1

        i0 = jnp.asarray(1, jnp.int32)
        _, out, _, _ = jax.lax.while_loop(
            cond, body, (i0, out0, caches, positions))
        return out

    return run


def greedy_generate(
    model: MultiFrameMLLM,
    params,
    input_ids: jax.Array,
    tiles: jax.Array,
    max_new_tokens: int = 32,
    eos_id: int | None = None,
    prompt_len: int | None = None,
):
    """`[B, T]` prompt -> `[B, max_new_tokens]` generated ids.

    `prompt_len` marks the real prompt length when `input_ids` is padded
    (same length for all rows); defaults to the full width.
    """
    b, t = input_ids.shape
    real_len = t if prompt_len is None else int(prompt_len)
    lens = jnp.full((b,), real_len, dtype=jnp.int32)
    return _generate(model, params, input_ids, tiles, lens,
                     max_new_tokens, eos_id)


def greedy_generate_batched(
    model: MultiFrameMLLM,
    params,
    input_ids: jax.Array,
    tiles: jax.Array,
    prompt_lens,
    max_new_tokens: int = 32,
    eos_id: int | None = None,
):
    """Batched greedy decoding with PER-ROW prompt lengths.

    `input_ids` is `[B, T]` right-padded; `prompt_lens` `[B]` gives each
    row's real length. Prefill masks nothing extra (right padding +
    causal attention already gives correct per-row logits at
    `prompt_lens[b] - 1`); each row's KV cache index starts at its own
    length so generated tokens overwrite that row's pad slots, and RoPE
    positions advance per row. Per-row results are identical to running
    `greedy_generate` one row at a time (test-asserted).

    Returns `[B, max_new_tokens]` ids, each row valid up to its own eos.
    """
    b, t = input_ids.shape
    lens = jnp.asarray(prompt_lens, dtype=jnp.int32)
    assert lens.shape == (b,), (lens.shape, b)
    return _generate(model, params, input_ids, tiles, lens,
                     max_new_tokens, eos_id)


def _generate(model, params, input_ids, tiles, lens, max_new_tokens,
              eos_id):
    b, t = input_ids.shape
    caches = init_cache(model.cfg.llm, b, t + max_new_tokens)
    logits, caches = _prefill_fn(model)(params, input_ids, tiles, caches,
                                        lens)
    next_token = jnp.take_along_axis(
        jnp.argmax(logits, axis=-1), (lens - 1)[:, None], axis=1)  # [B, 1]
    run = _decode_fn(model, b, int(max_new_tokens),
                     None if eos_id is None else int(eos_id))
    return run(params, next_token, caches, lens)


# ---------------------------------------------------------------------------
# Speculative decoding (prompt-lookup drafting, greedy-exact).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _spec_decode_fn(model: MultiFrameMLLM, b: int, prompt_width: int,
                    max_new_tokens: int, eos_id: int | None, n_draft: int):
    """Compiled speculative decode loop.

    Each iteration drafts `n_draft` continuation tokens by PROMPT LOOKUP
    (find the latest earlier occurrence of the bigram ending at the last
    token in the prompt+generated history and copy what followed it),
    then verifies the whole chain in ONE decode forward over t = n_draft
    + 1 positions: position i's greedy argmax must equal draft token i
    for it to be accepted, and the first mismatch position contributes
    its own argmax as a bonus token. Every emitted token therefore equals
    what step-by-step greedy would emit — speculation changes the number
    of forwards, never the output — while accepted drafts amortize one
    forward over several tokens. Decode is memory-bound (the KV-cache
    read dominates and is shared across the t positions), so a rejected
    draft costs barely more than a plain single step.

    KV handling: the verify forward writes rows at positions
    pos_last..pos_last+k before attending (llm.py decode path); on a
    partial accept the tail rows are stale but every later iteration
    rewrites from its own pos_last before reading, and the per-row valid
    mask never admits rows past the current chain. Rows advance at
    different rates, which the per-row [B] cache index already supports.

    The reference has no generation stack (README.md:194-200); this is
    beyond-reference serving surface.
    """
    fill = eos_id if eos_id is not None else 0
    k = n_draft
    hist_len = prompt_width + max_new_tokens + 1

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(params, first_token, caches, lens, prompt_hist):
        # history buffer: prompt tokens (pads already -1), then -1s;
        # -1 can never match a drafting bigram of real token ids
        hist = jnp.concatenate(
            [prompt_hist,
             jnp.full((b, max_new_tokens + 1), -1, jnp.int32)], axis=1)
        rows = jnp.arange(b)
        hist = hist.at[rows, lens].set(first_token[:, 0].astype(jnp.int32))
        out0 = jnp.full((b, max_new_tokens), fill, dtype=first_token.dtype)
        out0 = out0.at[:, 0].set(first_token[:, 0])
        written0 = jnp.ones((b,), jnp.int32)

        def finished(out, written):
            full_rows = written >= max_new_tokens
            if eos_id is None:
                return full_rows
            emitted = jnp.arange(max_new_tokens)[None, :] < written[:, None]
            ever_eos = jnp.any((out == eos_id) & emitted, axis=1)
            return ever_eos | full_rows

        def cond(carry):
            out, caches, hist, written, iters = carry
            return ~jnp.all(finished(out, written))

        def body(carry):
            out, caches, hist, written, iters = carry
            pos_last = lens + written - 1                        # [B]
            cur = hist[rows, pos_last]                           # [B]
            prev = hist[rows, pos_last - 1]

            # latest earlier bigram match: hist[j] == prev, hist[j+1]
            # == cur, with j+1 strictly before the suffix itself
            m = (hist[:, :-1] == prev[:, None]) \
                & (hist[:, 1:] == cur[:, None])
            j_arange = jnp.arange(hist_len - 1)
            m &= (j_arange + 1)[None, :] < pos_last[:, None]
            jbest = jnp.max(jnp.where(m, j_arange[None, :], -1), axis=1)

            # draft k tokens following the match; unknown/unmatched
            # slots become token 0 — verification simply rejects them
            # (or accepts them exactly when 0 IS the greedy argmax)
            dpos = jbest[:, None] + 2 + jnp.arange(k)[None, :]   # [B, k]
            known = (jbest[:, None] >= 0) & (dpos <= pos_last[:, None])
            draft = jnp.take_along_axis(
                hist, jnp.clip(dpos, 0, hist_len - 1), axis=1)
            draft = jnp.where(known & (draft >= 0), draft, 0)

            # one verify forward over the whole chain (t = k + 1)
            tokens_in = jnp.concatenate([cur[:, None], draft], axis=1)
            positions = pos_last[:, None] + jnp.arange(k + 1)[None, :]
            chain_caches = [
                {"k": c["k"], "v": c["v"], "index": pos_last}
                for c in caches
            ]
            logits, caches = model.apply(
                params, tokens_in, positions, chain_caches,
                method=lambda mdl, tok, pos, cc:
                    mdl.llm(input_embeds=mdl.llm.embed(tok), positions=pos,
                            caches=cc))
            g = jnp.argmax(logits, axis=-1).astype(jnp.int32)    # [B, k+1]

            match = (draft == g[:, :k]).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # [B]
            slot = jnp.arange(k + 1)[None, :]
            cand = jnp.where(
                slot < n_acc[:, None],
                jnp.concatenate([draft, draft[:, -1:]], axis=1), g)

            n_emit = jnp.minimum(n_acc + 1,
                                 max_new_tokens - written).astype(jnp.int32)
            emit = slot < n_emit[:, None]
            oidx = jnp.where(emit, written[:, None] + slot,
                             max_new_tokens)              # OOB -> dropped
            out = out.at[rows[:, None], oidx].set(
                cand.astype(out.dtype), mode="drop")
            hidx = jnp.where(emit, pos_last[:, None] + 1 + slot, hist_len)
            hist = hist.at[rows[:, None], hidx].set(cand, mode="drop")
            return out, caches, hist, written + n_emit, iters + 1

        out, _, _, _, iters = jax.lax.while_loop(
            cond, body, (out0, caches, hist, written0,
                         jnp.zeros((), jnp.int32)))
        return out, iters

    return run


def speculative_generate(
    model: MultiFrameMLLM,
    params,
    input_ids: jax.Array,
    tiles: jax.Array,
    max_new_tokens: int = 32,
    eos_id: int | None = None,
    prompt_lens=None,
    n_draft: int = 4,
    return_stats: bool = False,
):
    """Greedy decoding accelerated by prompt-lookup speculation.

    Tokens are IDENTICAL to `greedy_generate_batched` up to each row's
    eos (test-asserted); only the number of device forwards changes.
    MultiSPA answers are formulaic ("The camera moved X millimeters to
    the left."), so drafted continuations copied from the prompt+history
    verify at high acceptance rates. `return_stats=True` additionally
    returns the number of decode-loop iterations (forwards), i.e.
    decoded_tokens / iters = tokens per forward.
    """
    b, t = input_ids.shape
    if prompt_lens is None:
        lens = jnp.full((b,), t, dtype=jnp.int32)
    else:
        lens = jnp.asarray(prompt_lens, dtype=jnp.int32)
        assert lens.shape == (b,), (lens.shape, b)
    caches = init_cache(model.cfg.llm, b,
                        t + max_new_tokens + int(n_draft))
    logits, caches = _prefill_fn(model)(params, input_ids, tiles, caches,
                                        lens)
    first = jnp.take_along_axis(
        jnp.argmax(logits, axis=-1), (lens - 1)[:, None], axis=1)
    prompt_hist = jnp.where(
        jnp.arange(t)[None, :] < lens[:, None],
        jnp.asarray(input_ids, jnp.int32), -1)
    run = _spec_decode_fn(model, b, t, int(max_new_tokens),
                          None if eos_id is None else int(eos_id),
                          int(n_draft))
    out, iters = run(params, first, caches, lens, prompt_hist)
    if return_stats:
        return out, int(iters)
    return out


# ---------------------------------------------------------------------------
# Sampling (temperature / top-k / top-p) — same one-dispatch while_loop
# decoder as greedy, with a PRNG key threaded through the carry.
# ---------------------------------------------------------------------------


def _per_row(x):
    """Scalar or `[B]` knob -> broadcastable-along-vocab f32."""
    x = jnp.asarray(x, jnp.float32)
    return x[:, None] if x.ndim == 1 else x


def _mask_logits(logits, temperature, top_k, top_p):
    """`[B, V]` f32 logits -> masked/scaled logits to sample from.

    Order matches the common serving stacks (and HF defaults):
    temperature scaling, then top-k truncation, then top-p (nucleus)
    truncation on the renormalized distribution. `top_k` is static
    (None disables); `temperature` and `top_p` are traced scalars or
    per-row `[B]` arrays (no recompiles per value; `top_p=None` or 1.0
    disables nucleus truncation — with the exclusive cumsum, 1.0 keeps
    the whole distribution)."""
    logits = logits.astype(jnp.float32)
    logits = logits / jnp.maximum(_per_row(temperature), 1e-6)
    if top_k is not None:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1) - probs  # exclusive cumsum
        cutoff_idx = jnp.sum(cum < _per_row(top_p), axis=-1,
                             keepdims=True) - 1
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def _draw(key, logits, temperature, top_k, top_p):
    """Sample `[B]` token ids from `[B, V]` logits; `temperature == 0`
    is EXACT argmax (greedy), not a limit of the scaled distribution.
    `key` is one key (batched categorical) or a `[B]` key array (one
    independent stream per row — serving slots); `temperature`/`top_p`
    may be per-row `[B]` (mixed greedy/sampled batches)."""
    masked = _mask_logits(logits, temperature, top_k, top_p)
    karr = jnp.asarray(key)
    if (jax.dtypes.issubdtype(karr.dtype, jax.dtypes.prng_key)
            and karr.ndim == 1):
        sampled = jax.vmap(
            lambda k, lg: jax.random.categorical(k, lg))(karr, masked)
    else:
        sampled = jax.random.categorical(key, masked, axis=-1)
    greedy = jnp.argmax(masked, axis=-1)
    return jnp.where(jnp.asarray(temperature, jnp.float32) > 0,
                     sampled, greedy)


@functools.lru_cache(maxsize=32)
def _sample_decode_fn(model: MultiFrameMLLM, b: int, max_new_tokens: int,
                      eos_id: int | None, top_k: int | None,
                      top_p: float | None):
    """Compiled sampling decode loop (see _decode_fn for the early-exit
    semantics, which are identical)."""
    fill = eos_id if eos_id is not None else 0

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(params, first_token, caches, positions, key, temperature):
        out0 = jnp.full((b, max_new_tokens), fill, dtype=first_token.dtype)
        out0 = out0.at[:, 0].set(first_token[:, 0])

        def cond(carry):
            i, out, caches, positions, key = carry
            more = i < max_new_tokens
            if eos_id is None:
                return more
            emitted = jnp.arange(max_new_tokens) < i
            ever_eos = jnp.any((out == eos_id) & emitted[None, :], axis=1)
            return more & ~jnp.all(ever_eos)

        def body(carry):
            i, out, caches, positions, key = carry
            last = jnp.take_along_axis(
                out, jnp.broadcast_to((i - 1)[None, None], (b, 1)), axis=1)
            caches = [{"k": c["k"], "v": c["v"], "index": positions}
                      for c in caches]
            logits, caches = model.apply(
                params, last, positions[:, None], caches,
                method=lambda m, tok, pos, cc:
                    m.llm(input_embeds=m.llm.embed(tok), positions=pos,
                          caches=cc))
            key, sub = jax.random.split(key)
            token = _draw(sub, logits[:, -1], temperature, top_k,
                          top_p)[:, None]
            token = token.astype(out.dtype)
            out = jax.lax.dynamic_update_slice(
                out, token, (jnp.zeros((), jnp.int32), i))
            return i + 1, out, caches, positions + 1, key

        i0 = jnp.asarray(1, jnp.int32)
        _, out, _, _, _ = jax.lax.while_loop(
            cond, body, (i0, out0, caches, positions, key))
        return out

    return run


def sample_generate(
    model: MultiFrameMLLM,
    params,
    input_ids: jax.Array,
    tiles: jax.Array,
    key: jax.Array,
    max_new_tokens: int = 32,
    eos_id: int | None = None,
    prompt_lens=None,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
):
    """Sampled decoding: temperature scaling + optional top-k / top-p
    (nucleus) truncation, drawn with `key` (reproducible for a fixed
    key). `temperature=0` takes an exact argmax path and reproduces
    `greedy_generate` bit for bit; the first token is drawn from the
    prefill logits with the same rule as every later one.

    `prompt_lens`: optional `[B]` per-row real lengths of a right-padded
    prompt (same contract as `greedy_generate_batched`); defaults to the
    full width for every row.

    The reference has no generation stack at all (training/eval delegate
    to InternVL-2, /root/reference/README.md:194-200); sampling is
    beyond-reference serving surface. MultiSPA evaluation itself stays
    greedy (models/runner.py) for answer parity.
    """
    b, t = input_ids.shape
    if prompt_lens is None:
        lens = jnp.full((b,), t, dtype=jnp.int32)
    else:
        lens = jnp.asarray(prompt_lens, dtype=jnp.int32)
        assert lens.shape == (b,), (lens.shape, b)
    caches = init_cache(model.cfg.llm, b, t + max_new_tokens)
    logits, caches = _prefill_fn(model)(params, input_ids, tiles, caches,
                                        lens)
    first_logits = jnp.take_along_axis(
        logits, (lens - 1)[:, None, None], axis=1)[:, 0]       # [B, V]
    key, sub = jax.random.split(jnp.asarray(key))
    temperature = jnp.asarray(temperature, jnp.float32)
    first = _draw(sub, first_logits, temperature, top_k, top_p)[:, None]
    first = first.astype(input_ids.dtype)
    run = _sample_decode_fn(model, b, int(max_new_tokens),
                            None if eos_id is None else int(eos_id),
                            None if top_k is None else int(top_k),
                            None if top_p is None else float(top_p))
    return run(params, first, caches, lens, key, temperature)
