"""Greedy decoding for the multi-frame MLLM (KV-cache based).

Prefill runs once over the prompt (vision tokens spliced), then a jitted
single-token decode step repeats; the cache index is carried as a static
Python int per step so the compiled step is reused across positions via a
traced position argument.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .llm import init_cache
from .mllm import MultiFrameMLLM


def greedy_generate(
    model: MultiFrameMLLM,
    params,
    input_ids: jax.Array,
    tiles: jax.Array,
    max_new_tokens: int = 32,
    eos_id: int | None = None,
):
    """`[B, T]` prompt -> `[B, <=max_new_tokens]` generated ids."""
    b, t = input_ids.shape
    max_len = t + max_new_tokens
    caches = init_cache(model.cfg.llm, b, max_len)

    prefill = jax.jit(
        lambda p, ids, tl, cc: model.apply(
            p, ids, tl, cc, method=MultiFrameMLLM.prefill))
    logits, caches = prefill(params, input_ids, tiles, caches)
    next_token = jnp.argmax(logits[:, -1], axis=-1)[:, None]

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
    position = jnp.asarray(t, dtype=jnp.int32)
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
