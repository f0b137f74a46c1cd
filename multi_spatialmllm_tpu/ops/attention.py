"""Pallas TPU flash attention (blockwise online-softmax), forward pass.

Used by the MLLM decode/eval path; the training path uses the XLA attention
in models/llm.py (differentiable; XLA already fuses it well at the
sequence lengths this model targets — max_seq_length 8192, README.md:198).

Kernel structure: grid over (batch*heads, q blocks); the kv loop runs
inside the kernel with `jax.lax.fori_loop`, maintaining running max /
normalizer / accumulator in VMEM scratch (standard flash-attention
recurrence). Causal masking skips fully-masked kv blocks via the loop upper
bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref,
    *, block_q: int, block_k: int, seq_len: int, causal: bool, sm_scale: float,
):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * sm_scale          # [block_q, d]

    m = jnp.full((block_q, 1), NEG_INF, dtype=jnp.float32)
    l = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc = jnp.zeros((block_q, q.shape[-1]), dtype=jnp.float32)

    num_k_blocks = pl.cdiv(seq_len, block_k)
    if causal:
        # kv blocks strictly after the last query row are fully masked.
        num_k_blocks = jnp.minimum(
            num_k_blocks, (qi * block_q + block_q + block_k - 1) // block_k
        )

    def body(ki, carry):
        m_prev, l_prev, acc_prev = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = q @ k.T                                       # [block_q, block_k]
        if causal:
            q_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_ids = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_cur = acc_prev * alpha + p @ v
        return m_cur, l_cur, acc_cur

    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "block_q", "block_k"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = True,
    sm_scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
) -> jax.Array:
    """Multi-head attention via the Pallas kernel.

    Args:
      q, k, v: `[batch, heads, seq, head_dim]` (same seq for q and kv).
        GQA callers should repeat kv heads before the call.
    Returns:
      `[batch, heads, seq, head_dim]`.
    """
    b, h, s, d = q.shape
    if sm_scale is None:
        sm_scale = d ** -0.5
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    assert s % block_q == 0 and s % block_k == 0, (s, block_q, block_k)

    qf = q.reshape(b * h, s, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)

    kernel = functools.partial(
        _flash_fwd_kernel, block_q=block_q, block_k=block_k, seq_len=s,
        causal=causal, sm_scale=sm_scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, s, d)


def reference_attention(q, k, v, causal=True, sm_scale=None, key_valid=None):
    """XLA reference (differentiable) with identical semantics.

    `key_valid`: optional `[B, T]` bool marking real (non-pad) keys.
    """
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    if causal:
        n = q.shape[2]
        mask = jnp.tril(jnp.ones((n, n), dtype=bool))
        s = jnp.where(mask, s, NEG_INF)
    if key_valid is not None:
        s = jnp.where(key_valid[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


# ---------------------------------------------------------------------------
# Trainable wrapper: Pallas forward, XLA-recompute backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def trainable_flash_attention(q, k, v, causal=True):
    """Flash-attention forward (Pallas kernel) with a recompute backward
    through the XLA reference path — same gradients, fast forward. Falls
    through to the kernel only when shapes satisfy its block constraints;
    otherwise uses the XLA path outright."""
    if _kernel_ok(q):
        return flash_attention(q, k, v, causal=causal)
    return reference_attention(q, k, v, causal=causal)


def _kernel_ok(q) -> bool:
    s, d = q.shape[2], q.shape[3]
    return s >= 128 and s % 128 == 0 and d % 8 == 0 and \
        jax.default_backend() == "tpu"


def _tfa_fwd(q, k, v, causal):
    return trainable_flash_attention(q, k, v, causal), (q, k, v)


def _tfa_bwd(causal, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_: reference_attention(q_, k_, v_, causal=causal),
        q, k, v)
    return vjp(g)


trainable_flash_attention.defvjp(_tfa_fwd, _tfa_bwd)
