"""Greedy decoding for the multi-frame MLLM (KV-cache based).

Prefill runs once over the (optionally padded) prompt with pad keys masked
out of attention; then a jitted single-token decode step repeats, its cache
index carried as a traced position so one compiled step serves every decode
position. Padding prompts to a shared bucket length keeps the number of
compiled prefill shapes small across an eval run.
"""

from __future__ import annotations

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


def greedy_generate(
    model: MultiFrameMLLM,
    params,
    input_ids: jax.Array,
    tiles: jax.Array,
    max_new_tokens: int = 32,
    eos_id: int | None = None,
    prompt_len: int | None = None,
):
    """`[B, T]` prompt -> `[B, <=max_new_tokens]` generated ids.

    `prompt_len` marks the real prompt length when `input_ids` is padded
    (same length for all rows); defaults to the full width.
    """
    b, t = input_ids.shape
    real_len = t if prompt_len is None else int(prompt_len)
    max_len = t + max_new_tokens
    caches = init_cache(model.cfg.llm, b, max_len)

    prefill = jax.jit(
        lambda p, ids, tl, cc, n: model.apply(
            p, ids, tl, cc, n, method=MultiFrameMLLM.prefill))
    logits, caches = prefill(params, input_ids, tiles, caches,
                             jnp.asarray(real_len, dtype=jnp.int32))
    next_token = jnp.argmax(logits[:, real_len - 1], axis=-1)[:, None]

    @jax.jit
    def step(params, token, position, caches):
        # rewrite each layer's index to the traced position so one
        # compiled step serves every decode position
        caches = [
            {"k": c["k"], "v": c["v"], "index": position} for c in caches
        ]
        logits, caches = model.apply(
            params, token, jnp.broadcast_to(position[None, None], (b, 1)),
            caches, method=lambda m, tok, pos, cc:
                m.llm(input_embeds=m.llm.embed(tok), positions=pos,
                      caches=cc))
        return jnp.argmax(logits[:, -1], axis=-1)[:, None], caches

    out = [next_token]
    position = jnp.asarray(real_len, dtype=jnp.int32)
    finished = jnp.zeros((b,), dtype=bool)
    for _ in range(max_new_tokens - 1):
        if eos_id is not None:
            finished = finished | (out[-1][:, 0] == eos_id)
            if bool(finished.all()):
                break
        next_token, caches = step(params, out[-1], position, caches)
        out.append(next_token)
        position = position + 1
    return jnp.concatenate(out, axis=1)


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
    max_len = t + max_new_tokens
    caches = init_cache(model.cfg.llm, b, max_len)

    prefill = jax.jit(
        lambda p, ids, tl, cc, n: model.apply(
            p, ids, tl, cc, n, method=MultiFrameMLLM.prefill))
    logits, caches = prefill(params, input_ids, tiles, caches, lens)
    next_token = jnp.take_along_axis(
        jnp.argmax(logits, axis=-1), (lens - 1)[:, None], axis=1)  # [B, 1]

    @jax.jit
    def step(params, token, positions, caches):
        caches = [
            {"k": c["k"], "v": c["v"], "index": positions} for c in caches
        ]
        logits, caches = model.apply(
            params, token, positions[:, None], caches,
            method=lambda m, tok, pos, cc:
                m.llm(input_embeds=m.llm.embed(tok), positions=pos,
                      caches=cc))
        return jnp.argmax(logits[:, -1], axis=-1)[:, None], caches

    out = [next_token]
    positions = lens
    finished = jnp.zeros((b,), dtype=bool)
    for _ in range(max_new_tokens - 1):
        if eos_id is not None:
            finished = finished | (out[-1][:, 0] == eos_id)
            if bool(finished.all()):
                break
        next_token, caches = step(params, out[-1], positions, caches)
        out.append(next_token)
        positions = positions + 1
    gen = jnp.concatenate(out, axis=1)
    if gen.shape[1] < max_new_tokens and eos_id is not None:
        pad = jnp.full((b, max_new_tokens - gen.shape[1]), eos_id,
                       dtype=gen.dtype)
        gen = jnp.concatenate([gen, pad], axis=1)
    return gen
