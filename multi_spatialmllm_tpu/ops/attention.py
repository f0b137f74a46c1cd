"""Pallas TPU flash attention: forward + fused backward kernels.

Used by the MLLM train/decode paths (models/llm.py). Design:

* Forward: grid over (batch*heads, q blocks); the kv loop runs inside the
  kernel with `jax.lax.fori_loop`, maintaining running max / normalizer /
  accumulator in registers (standard flash-attention online softmax).
  K/V block specs are indexed by batch*head only, so the Pallas pipeline
  keeps them resident in VMEM across consecutive q-block steps (one HBM
  fetch per batch*head row, not per q block). Causal masking skips
  fully-masked kv blocks via the loop upper bound. The forward also emits
  the per-row logsumexp needed by the backward.

* GQA is native: k/v come in with `kv_heads <= heads` and are NEVER
  materialized at `heads` width. The forward/dq kernels map each q head's
  kv block spec to its group row (consecutive grid steps in the same
  group reuse the resident kv block — one HBM fetch per GROUP, not per
  head); the dk/dv kernels grid over (batch*kv_heads, k blocks) and load
  the group's `rep = heads//kv_heads` q-head rows as one (rep, ...)
  block, accumulating the group-summed dk/dv in f32 registers in-kernel
  (no rep-wide dk/dv writes, no XLA segment-sum pass afterwards).

* Backward (FlashAttention-2 style, no recomputation of the forward):
  dq kernel over (batch*heads, q blocks) and a fused dk/dv kernel over
  (batch*heads, k blocks), each re-materializing the probability block
  from q, k and the saved logsumexp: p = exp(s - lse). The softmax
  Jacobian contraction uses delta = rowsum(dO * O) (one cheap XLA
  elementwise pass), giving ds = p * (dp - delta) without ever forming
  the full [S, S] matrix.

VMEM budget: the resident-KV (forward, dq) and resident-Q/dO (dk/dv)
layouts need ~2 * S * D * itemsize bytes and are used up to
S * D <= 2^20 (8K seq x 128 head dim). Beyond that the XL variants take
over: a 3-D grid streams K/V (and Q/dO in the dkv kernel) through VMEM
in 1024/512-wide blocks (_xl_block: widest divisor whose dkv q/do
blocks stay VMEM-safe; 1024 measured 1.43x over 512 at S=16K MHA)
double-buffered by the Pallas pipeline, with the online-softmax state
in VMEM scratch persisting across the innermost grid dimension —
sequence length is then unbounded. Streaming trades HBM traffic (K/V
re-fetched once per q block) for residency; wide blocks keep that to
S/block full K/V passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kv_row_map(h: int, kvh: int):
    """Map a q-head grid row `bh` (over batch*heads) to its kv group row
    in the `[batch*kv_heads, s, d]` layout. Identity for MHA."""
    if h == kvh:
        return lambda bh: bh
    rep = h // kvh
    return lambda bh: (bh // h) * kvh + (bh % h) // rep


# Matmul helpers: operands stay in their NATIVE dtype (bf16 rides the
# MXU's fast path — upcasting to f32 first would cost ~8x matmul
# throughput) with f32 accumulation. Probability/score operands computed
# in f32 are cast back to the value dtype for the MXU, exactly like the
# XLA reference's `p.astype(q.dtype)`.

def _dot_qk(a, b):
    """[m, d] x [n, d] -> [m, n] f32 (contract the feature dim)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_pv(p, v):
    """[m, k] x [k, d] -> [m, d] f32; p cast to v's dtype for the MXU."""
    return jax.lax.dot_general(p.astype(v.dtype), v,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tq(a, b):
    """[q, k] x [q, d] -> [k, d] f32 (contract the q dim: pᵀ@do, dsᵀ@q);
    a cast to b's dtype for the MXU."""
    return jax.lax.dot_general(a.astype(b.dtype), b,
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, seg_ref, o_ref, lse_ref,
    *, block_q: int, block_k: int, seq_len: int, causal: bool,
    sm_scale: float, segmented: bool,
):
    qi = pl.program_id(1)
    q = q_ref[0]                                          # [block_q, d]

    m = jnp.full((block_q, 1), NEG_INF, dtype=jnp.float32)
    l = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc = jnp.zeros((block_q, q.shape[-1]), dtype=jnp.float32)

    num_k_blocks = pl.cdiv(seq_len, block_k)
    if causal:
        # kv blocks strictly after the last query row are fully masked.
        num_k_blocks = jnp.minimum(
            num_k_blocks, (qi * block_q + block_q + block_k - 1) // block_k
        )
    k_start = 0
    seg_q = None
    if segmented:
        # packed rows: segment ids are nondecreasing, so kv blocks whose
        # last segment precedes this q block's first are fully masked —
        # start the loop past them — and kv blocks whose first segment
        # exceeds this q block's last are fully masked too — stop before
        # them (block-diagonal complexity; the suffix bound is what
        # skips trailing pad segments in non-causal use, e.g. the ViT).
        seg_q = seg_ref[0, 0, pl.ds(qi * block_q, block_q)]
        # ids are nondecreasing: block max == last element, block min ==
        # first (Mosaic cannot lower unaligned scalar loads, so use
        # aligned full-row loads + reductions)
        seg_blocks = seg_ref[0, 0, :].reshape(seq_len // block_k, block_k)
        seg_ends = jnp.max(seg_blocks, axis=1)
        seg_starts = jnp.min(seg_blocks, axis=1)
        k_start = jnp.sum(seg_ends < jnp.min(seg_q), dtype=jnp.int32)
        num_k_blocks = jnp.minimum(
            num_k_blocks,
            jnp.sum(seg_starts <= jnp.max(seg_q), dtype=jnp.int32))

    def body(ki, carry):
        m_prev, l_prev, acc_prev = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = _dot_qk(q, k) * sm_scale                      # [block_q, block_k]
        if causal:
            q_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_ids = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        if segmented:
            seg_k = seg_ref[0, 0, pl.ds(ki * block_k, block_k)]
            s = jnp.where(seg_q[:, None] == seg_k[None, :], s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_cur = acc_prev * alpha + _dot_pv(p, v)
        return m_cur, l_cur, acc_cur

    m, l, acc = jax.lax.fori_loop(k_start, num_k_blocks, body, (m, l, acc))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    # lse rides in a [1, 1, S] full-row block (TPU tiling forbids
    # (1, block_q) blocks); each q step writes its slice.
    lse_ref[0, 0, pl.ds(qi * block_q, block_q)] = (m + jnp.log(l_safe))[:, 0]


def _seg_rows(segment_ids, b, s):
    """`[B, S]` segment ids (or None) -> ([b, 1, s] int32, segmented flag).
    A zero row keeps one code path; the `segmented` static flag removes
    the mask logic entirely from the unsegmented kernels.

    The kernels' prefix/suffix block-skip counts require ids to be
    NONDECREASING per row, but callers use two pad conventions that are
    only contiguous, not monotone: pack_samples emits trailing pads as
    id 0 after the 1-based segments (models/data.py), and the ViT path
    leads with real tokens as id 0 before pad id 1. Trailing zeros made
    the skip logic misattribute pad blocks to the PREFIX skip and drop
    real kv blocks. Normalize every row to its run index (cumsum of
    change points): any contiguous-run layout becomes a nondecreasing
    1,2,3,... relabeling, and the equality mask — all that the math uses —
    is invariant under it. (Rows whose equal ids sit in SEPARATED runs
    were always outside the kernels' contract.)"""
    if segment_ids is None:
        return jnp.zeros((b, 1, s), dtype=jnp.int32), False
    seg = segment_ids.astype(jnp.int32)
    changed = jnp.concatenate(
        [jnp.ones_like(seg[..., :1], dtype=bool),
         seg[..., 1:] != seg[..., :-1]], axis=-1)
    seg = jnp.cumsum(changed.astype(jnp.int32), axis=-1)
    return seg.reshape(b, 1, s), True


def _flash_fwd(q, k, v, causal, sm_scale, block_q, block_k,
               segment_ids=None):
    """Shared forward: returns (o, lse) with lse = logsumexp of the scaled
    scores per query row, shape [b*h, s], f32. k/v may carry fewer (GQA)
    heads than q; their block specs map each q head to its group row.
    `segment_ids` `[B, S]` (nondecreasing per row — packed layout) makes
    the mask block-diagonal and skips fully-masked kv blocks."""
    b, h, s, d = q.shape
    kvh = k.shape[1]
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    assert s % block_q == 0 and s % block_k == 0, (s, block_q, block_k)

    qf = q.reshape(b * h, s, d)
    kf = k.reshape(b * kvh, s, d)
    vf = v.reshape(b * kvh, s, d)
    row = _kv_row_map(h, kvh)
    seg, segmented = _seg_rows(segment_ids, b, s)

    kernel = functools.partial(
        _flash_fwd_kernel, block_q=block_q, block_k=block_k, seq_len=s,
        causal=causal, sm_scale=sm_scale, segmented=segmented)
    o, lse = pl.pallas_call(
        kernel,
        grid=(b * h, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda bh, qi: (row(bh), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda bh, qi: (row(bh), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bh, qi: (bh // h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, s), jnp.float32),
        ],
    )(qf, kf, vf, seg)
    return o.reshape(b, h, s, d), lse


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "block_q", "block_k"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = True,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
) -> jax.Array:
    """Multi-head attention via the Pallas kernel.

    Args:
      q: `[batch, heads, seq, head_dim]`.
      k, v: `[batch, kv_heads, seq, head_dim]` with
        `kv_heads` dividing `heads` (GQA native — do NOT repeat).
      block_q, block_k: override the measured-optimal block ladder
        (_block_for) — for tests/sweeps only.
    Returns:
      `[batch, heads, seq, head_dim]`.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    b = _block_for(q.shape[2], causal)
    o, _ = _flash_fwd(q, k, v, causal, sm_scale, block_q or b,
                      block_k or b)
    return o


# ---------------------------------------------------------------------------
# Backward kernels (FlashAttention-2)
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seg_ref, dq_ref,
    *, block_q: int, block_k: int, seq_len: int, causal: bool,
    sm_scale: float, segmented: bool,
):
    qi = pl.program_id(1)
    q = q_ref[0]                                          # [block_q, d]
    do = do_ref[0]                                        # [block_q, d]
    lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
    delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]

    acc = jnp.zeros((block_q, q.shape[-1]), dtype=jnp.float32)
    num_k_blocks = pl.cdiv(seq_len, block_k)
    if causal:
        num_k_blocks = jnp.minimum(
            num_k_blocks, (qi * block_q + block_q + block_k - 1) // block_k
        )
    k_start = 0
    seg_q = None
    if segmented:
        seg_q = seg_ref[0, 0, pl.ds(qi * block_q, block_q)]
        # ids are nondecreasing: block max == last element, block min ==
        # first (Mosaic cannot lower unaligned scalar loads, so use
        # aligned full-row loads + reductions); prefix AND suffix
        # fully-masked kv blocks are skipped (see _flash_fwd_kernel)
        seg_blocks = seg_ref[0, 0, :].reshape(seq_len // block_k, block_k)
        seg_ends = jnp.max(seg_blocks, axis=1)
        seg_starts = jnp.min(seg_blocks, axis=1)
        k_start = jnp.sum(seg_ends < jnp.min(seg_q), dtype=jnp.int32)
        num_k_blocks = jnp.minimum(
            num_k_blocks,
            jnp.sum(seg_starts <= jnp.max(seg_q), dtype=jnp.int32))

    def body(ki, acc_prev):
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = _dot_qk(q, k) * sm_scale                      # [block_q, block_k]
        if causal:
            q_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_ids = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        if segmented:
            seg_k = seg_ref[0, 0, pl.ds(ki * block_k, block_k)]
            s = jnp.where(seg_q[:, None] == seg_k[None, :], s, NEG_INF)
        p = jnp.exp(s - lse)                              # exact softmax block
        dp = _dot_qk(do, v)                               # [block_q, block_k]
        ds = p * (dp - delta) * sm_scale
        return acc_prev + _dot_pv(ds, k)

    acc = jax.lax.fori_loop(k_start, num_k_blocks, body, acc)
    dq_ref[0] = acc.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seg_ref, dk_ref,
    dv_ref,
    *, block_q: int, block_k: int, seq_len: int, causal: bool,
    sm_scale: float, rep: int, segmented: bool,
):
    """Grid over (batch*kv_heads, k blocks). q/do/lse/delta blocks carry
    the group's `rep` q-head rows; the static `for r` unroll sums the
    group's dk/dv contributions in f32 registers (GQA-native: the summed
    gradient is written once per KV head)."""
    ki = pl.program_id(1)
    k = k_ref[0]                                          # [block_k, d]
    v = v_ref[0]                                          # [block_k, d]

    dk = jnp.zeros((block_k, k.shape[-1]), dtype=jnp.float32)
    dv = jnp.zeros((block_k, k.shape[-1]), dtype=jnp.float32)
    num_q_blocks = pl.cdiv(seq_len, block_q)
    # causal: query blocks strictly before this kv block see none of it.
    q_start = (ki * block_k) // block_q if causal else 0
    q_end = num_q_blocks
    seg_k = None
    if segmented:
        # q blocks whose first segment is past this kv block's last are
        # fully masked (ids nondecreasing): stop the loop before them —
        # and q blocks whose last segment precedes this kv block's first
        # are fully masked too: start past them (the prefix bound is
        # what skips the all-real q blocks for trailing pad kv in
        # non-causal use, e.g. the ViT).
        seg_k = seg_ref[0, 0, pl.ds(ki * block_k, block_k)]
        seg_blocks = seg_ref[0, 0, :].reshape(num_q_blocks, block_q)
        seg_starts = jnp.min(seg_blocks, axis=1)
        seg_ends = jnp.max(seg_blocks, axis=1)
        q_end = jnp.sum(seg_starts <= jnp.max(seg_k), dtype=jnp.int32)
        q_start = jnp.maximum(
            q_start,
            jnp.sum(seg_ends < jnp.min(seg_k), dtype=jnp.int32))

    for r in range(rep):
        def body(qj, carry):
            dk_prev, dv_prev = carry
            q = q_ref[r, pl.ds(qj * block_q, block_q), :]
            do = do_ref[r, pl.ds(qj * block_q, block_q), :]
            lse = lse_ref[r, 0, pl.ds(qj * block_q, block_q)][:, None]
            delta = delta_ref[r, 0, pl.ds(qj * block_q, block_q)][:, None]
            s = _dot_qk(q, k) * sm_scale                  # [block_q, block_k]
            if causal:
                q_ids = qj * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                k_ids = ki * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                s = jnp.where(q_ids >= k_ids, s, NEG_INF)
            if segmented:
                seg_q = seg_ref[0, 0, pl.ds(qj * block_q, block_q)]
                s = jnp.where(seg_q[:, None] == seg_k[None, :], s, NEG_INF)
            p = jnp.exp(s - lse)
            dv_cur = dv_prev + _dot_tq(p, do)
            dp = _dot_qk(do, v)
            ds = p * (dp - delta) * sm_scale
            dk_cur = dk_prev + _dot_tq(ds, q)
            return dk_cur, dv_cur

        dk, dv = jax.lax.fori_loop(q_start, q_end, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse, g, causal, sm_scale, block_q, block_k,
               segment_ids=None):
    b, h, s, d = q.shape
    kvh = k.shape[1]
    rep = h // kvh
    block_q = min(block_q, s)
    block_k = min(block_k, s)

    qf = q.reshape(b * h, s, d)
    kf = k.reshape(b * kvh, s, d)
    vf = v.reshape(b * kvh, s, d)
    dof = g.reshape(b * h, s, d)
    row = _kv_row_map(h, kvh)
    seg, segmented = _seg_rows(segment_ids, b, s)
    # delta = rowsum(dO * O): one fused XLA elementwise pass, [b*h, s].
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1).reshape(b * h, 1, s)

    common = dict(block_q=block_q, block_k=block_k, seq_len=s,
                  causal=causal, sm_scale=sm_scale, segmented=segmented)
    dq_kernel = functools.partial(_flash_bwd_dq_kernel, **common)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b * h, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda bh, qi: (row(bh), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda bh, qi: (row(bh), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bh, qi: (bh // h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
    )(qf, kf, vf, dof, lse, delta, seg)

    # dk/dv: one grid row per KV head; q/do/lse/delta blocks carry the
    # whole group (first-dim block size `rep` at block index bkv — the
    # element offset rep*bkv is exactly the group's first q-head row).
    dkv_kernel = functools.partial(_flash_bwd_dkv_kernel, rep=rep, **common)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b * kvh, s // block_k),
        in_specs=[
            pl.BlockSpec((rep, s, d), lambda bkv, ki: (bkv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bkv, ki: (bkv, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bkv, ki: (bkv, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rep, s, d), lambda bkv, ki: (bkv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rep, 1, s), lambda bkv, ki: (bkv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rep, 1, s), lambda bkv, ki: (bkv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bkv, ki: (bkv // kvh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bkv, ki: (bkv, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bkv, ki: (bkv, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * kvh, s, d), k.dtype),
            jax.ShapeDtypeStruct((b * kvh, s, d), v.dtype),
        ],
    )(qf, kf, vf, dof, lse, delta, seg)

    return (dq.reshape(b, h, s, d), dk.reshape(b, kvh, s, d),
            dv.reshape(b, kvh, s, d))


# ---------------------------------------------------------------------------
# XL variant: K/V stream through VMEM block by block (3-D grid), so the
# sequence length is unbounded by VMEM residency. The Pallas pipeline
# double-buffers the kv-block fetches; running max / normalizer /
# accumulator persist in VMEM scratch across the innermost grid dim.
# Fully-masked causal blocks skip their compute via pl.when (their DMA
# still happens — the streaming price for arbitrary lengths).
# ---------------------------------------------------------------------------

def _flash_fwd_xl_kernel(
    q_ref, k_ref, v_ref, seg_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, block_q: int, block_k: int, num_k: int, causal: bool,
    sm_scale: float, segmented: bool,
):
    qi, ki = pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr[:], NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    needed = True
    if causal:
        needed = ki * block_k <= qi * block_q + block_q - 1
    if segmented:
        # fully-masked block (ids nondecreasing): skip its compute
        seg_q_blk = seg_ref[0, 0, pl.ds(qi * block_q, block_q)]
        seg_k_blk = seg_ref[0, 0, pl.ds(ki * block_k, block_k)]
        seg_q_first, seg_q_last = jnp.min(seg_q_blk), jnp.max(seg_q_blk)
        seg_k_first, seg_k_last = jnp.min(seg_k_blk), jnp.max(seg_k_blk)
        needed = jnp.logical_and(
            needed, jnp.logical_and(seg_q_last >= seg_k_first,
                                    seg_q_first <= seg_k_last))

    @pl.when(needed)
    def _update():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = _dot_qk(q, k) * sm_scale
        if causal:
            q_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_ids = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        if segmented:
            seg_q = seg_ref[0, 0, pl.ds(qi * block_q, block_q)]
            seg_k = seg_ref[0, 0, pl.ds(ki * block_k, block_k)]
            s = jnp.where(seg_q[:, None] == seg_k[None, :], s, NEG_INF)
        m_prev, l_prev = m_scr[:], l_scr[:]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        m_scr[:] = m_cur
        l_scr[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + _dot_pv(p, v)

    @pl.when(ki == num_k - 1)
    def _emit():
        l_safe = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0, pl.ds(qi * block_q, block_q)] = \
            (m_scr[:] + jnp.log(l_safe))[:, 0]


def _flash_fwd_xl(q, k, v, causal, sm_scale, block_q, block_k,
                  segment_ids=None):
    b, h, s, d = q.shape
    kvh = k.shape[1]
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    assert s % block_q == 0 and s % block_k == 0, (s, block_q, block_k)
    num_k = s // block_k

    qf = q.reshape(b * h, s, d)
    kf = k.reshape(b * kvh, s, d)
    vf = v.reshape(b * kvh, s, d)
    row = _kv_row_map(h, kvh)
    seg, segmented = _seg_rows(segment_ids, b, s)
    kernel = functools.partial(
        _flash_fwd_xl_kernel, block_q=block_q, block_k=block_k,
        num_k=num_k, causal=causal, sm_scale=sm_scale, segmented=segmented)
    o, lse = pl.pallas_call(
        kernel,
        grid=(b * h, s // block_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, qi, ki: (row(bh), ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, qi, ki: (row(bh), ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bh, qi, ki: (bh // h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bh, qi, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, s), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(qf, kf, vf, seg)
    return o.reshape(b, h, s, d), lse


def _flash_bwd_dq_xl_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seg_ref, dq_ref,
    acc_scr,
    *, block_q: int, block_k: int, num_k: int, causal: bool,
    sm_scale: float, segmented: bool,
):
    qi, ki = pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    needed = True
    if causal:
        needed = ki * block_k <= qi * block_q + block_q - 1
    if segmented:
        seg_q_blk = seg_ref[0, 0, pl.ds(qi * block_q, block_q)]
        seg_k_blk = seg_ref[0, 0, pl.ds(ki * block_k, block_k)]
        seg_q_first, seg_q_last = jnp.min(seg_q_blk), jnp.max(seg_q_blk)
        seg_k_first, seg_k_last = jnp.min(seg_k_blk), jnp.max(seg_k_blk)
        needed = jnp.logical_and(
            needed, jnp.logical_and(seg_q_last >= seg_k_first,
                                    seg_q_first <= seg_k_last))

    @pl.when(needed)
    def _update():
        q = q_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        k = k_ref[0]
        v = v_ref[0]
        s = _dot_qk(q, k) * sm_scale
        if causal:
            q_ids = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_ids = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        if segmented:
            seg_q = seg_ref[0, 0, pl.ds(qi * block_q, block_q)]
            seg_k = seg_ref[0, 0, pl.ds(ki * block_k, block_k)]
            s = jnp.where(seg_q[:, None] == seg_k[None, :], s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = _dot_qk(do, v)
        ds = p * (dp - delta) * sm_scale
        acc_scr[:] = acc_scr[:] + _dot_pv(ds, k)

    @pl.when(ki == num_k - 1)
    def _emit():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_xl_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seg_ref, dk_ref,
    dv_ref, dk_scr, dv_scr,
    *, block_q: int, block_k: int, num_q: int, causal: bool,
    sm_scale: float, rep: int, segmented: bool,
):
    """Grid over (batch*kv_heads, k blocks, q blocks); the streamed q/do
    blocks carry the group's `rep` q-head rows and the static `for r`
    unroll accumulates the group-summed dk/dv in the f32 scratch."""
    ki, qj = pl.program_id(1), pl.program_id(2)

    @pl.when(qj == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr[:])
        dv_scr[:] = jnp.zeros_like(dv_scr[:])

    needed = True
    if causal:
        # query blocks strictly before this kv block see none of it
        needed = qj * block_q + block_q - 1 >= ki * block_k
    if segmented:
        seg_q_blk = seg_ref[0, 0, pl.ds(qj * block_q, block_q)]
        seg_k_blk = seg_ref[0, 0, pl.ds(ki * block_k, block_k)]
        seg_q_first, seg_q_last = jnp.min(seg_q_blk), jnp.max(seg_q_blk)
        seg_k_first, seg_k_last = jnp.min(seg_k_blk), jnp.max(seg_k_blk)
        needed = jnp.logical_and(
            needed, jnp.logical_and(seg_q_last >= seg_k_first,
                                    seg_q_first <= seg_k_last))

    @pl.when(needed)
    def _update():
        k = k_ref[0]
        v = v_ref[0]
        if segmented:
            seg_q = seg_ref[0, 0, pl.ds(qj * block_q, block_q)]
            seg_k = seg_ref[0, 0, pl.ds(ki * block_k, block_k)]
            seg_mask = seg_q[:, None] == seg_k[None, :]
        dk_acc, dv_acc = dk_scr[:], dv_scr[:]
        for r in range(rep):
            q = q_ref[r]
            do = do_ref[r]
            lse = lse_ref[r, 0, pl.ds(qj * block_q, block_q)][:, None]
            delta = delta_ref[r, 0, pl.ds(qj * block_q, block_q)][:, None]
            s = _dot_qk(q, k) * sm_scale
            if causal:
                q_ids = qj * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                k_ids = ki * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                s = jnp.where(q_ids >= k_ids, s, NEG_INF)
            if segmented:
                s = jnp.where(seg_mask, s, NEG_INF)
            p = jnp.exp(s - lse)
            dv_acc = dv_acc + _dot_tq(p, do)
            dp = _dot_qk(do, v)
            ds = p * (dp - delta) * sm_scale
            dk_acc = dk_acc + _dot_tq(ds, q)
        dk_scr[:] = dk_acc
        dv_scr[:] = dv_acc

    @pl.when(qj == num_q - 1)
    def _emit():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_xl(q, k, v, o, lse, g, causal, sm_scale, block_q, block_k,
                  segment_ids=None):
    b, h, s, d = q.shape
    kvh = k.shape[1]
    rep = h // kvh
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    num_q, num_k = s // block_q, s // block_k

    qf = q.reshape(b * h, s, d)
    kf = k.reshape(b * kvh, s, d)
    vf = v.reshape(b * kvh, s, d)
    dof = g.reshape(b * h, s, d)
    row = _kv_row_map(h, kvh)
    seg, segmented = _seg_rows(segment_ids, b, s)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1).reshape(b * h, 1, s)

    dq_kernel = functools.partial(
        _flash_bwd_dq_xl_kernel, block_q=block_q, block_k=block_k,
        num_k=num_k, causal=causal, sm_scale=sm_scale, segmented=segmented)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b * h, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, qi, ki: (row(bh), ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, qi, ki: (row(bh), ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bh, qi, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bh, qi, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bh, qi, ki: (bh // h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, qi, ki: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )(qf, kf, vf, dof, lse, delta, seg)

    # dk/dv: one grid row per KV head; streamed q/do blocks carry the
    # group (first-dim block size `rep` at block index bkv == element
    # offset rep*bkv, the group's first q-head row).
    dkv_kernel = functools.partial(
        _flash_bwd_dkv_xl_kernel, block_q=block_q, block_k=block_k,
        num_q=num_q, causal=causal, sm_scale=sm_scale, rep=rep,
        segmented=segmented)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b * kvh, num_k, num_q),
        in_specs=[
            pl.BlockSpec((rep, block_q, d),
                         lambda bkv, ki, qj: (bkv, qj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bkv, ki, qj: (bkv, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bkv, ki, qj: (bkv, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rep, block_q, d),
                         lambda bkv, ki, qj: (bkv, qj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rep, 1, s), lambda bkv, ki, qj: (bkv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rep, 1, s), lambda bkv, ki, qj: (bkv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bkv, ki, qj: (bkv // kvh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bkv, ki, qj: (bkv, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bkv, ki, qj: (bkv, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * kvh, s, d), k.dtype),
            jax.ShapeDtypeStruct((b * kvh, s, d), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
    )(qf, kf, vf, dof, lse, delta, seg)

    return (dq.reshape(b, h, s, d), dk.reshape(b, kvh, s, d),
            dv.reshape(b, kvh, s, d))


def reference_attention(q, k, v, causal=True, sm_scale=None, key_valid=None,
                        segment_ids=None):
    """XLA reference (differentiable) with identical semantics.

    `key_valid`: optional `[B, T]` bool marking real (non-pad) keys.
    `segment_ids`: optional `[B, T]` int; queries attend only to keys in
    the SAME segment (block-diagonal mask for packed-sequence training).
    k/v may carry fewer (GQA) heads than q; they are repeated here (XLA
    fuses the broadcast; its VJP performs the group sum for dk/dv).
    """
    d = q.shape[-1]
    if k.shape[1] != q.shape[1]:
        rep = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    if sm_scale is None:
        sm_scale = d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    if causal:
        n = q.shape[2]
        mask = jnp.tril(jnp.ones((n, n), dtype=bool))
        s = jnp.where(mask, s, NEG_INF)
    if key_valid is not None:
        s = jnp.where(key_valid[:, None, None, :], s, NEG_INF)
    if segment_ids is not None:
        same = segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
        s = jnp.where(same, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


# ---------------------------------------------------------------------------
# Trainable wrapper: Pallas forward + Pallas fused backward
# ---------------------------------------------------------------------------

def _block_for(s: int, causal: bool) -> int:
    """Block size for the resident kernels. Wide blocks dominate: the
    per-block vector-op overhead of the 128-wide pipeline outweighs both
    the finer causal-triangle skipping and the finer segment skipping
    (measured on v5e: 512x512 is 3.7-4.3x faster than 128x128 at the
    flagship causal shapes, 1.75x on 256-token packed segments, and
    one-block-per-row is 1.7x over XLA at the ViT's non-causal ~1.2K
    rows where 128-blocks were 3x SLOWER — see
    docs/profiles/flash_attention.md). Non-causal additionally takes the
    whole row as one block when the f32 score tile fits VMEM."""
    if not causal and s * s * 4 <= 6 * 2 ** 20:
        return s
    for c in (512, 256):
        if s % c == 0:
            return c
    return 128


def _xl_block(s: int, rep: int = 1) -> int | None:
    """Widest streaming block dividing s (wider blocks cut the XL path's
    K/V re-fetch traffic AND its per-block overhead — 1024 measured
    1.43x over 512 at S=16K MHA), bounded so the dkv kernel's
    double-buffered (rep, block, d) q/do blocks stay within VMEM
    (1024-wide blocks failed to compile at rep 8). Returns None when no
    dividing block is VMEM-safe (e.g. extreme GQA ratios with s only
    divisible by 128) — callers fall back to the XLA reference via
    `_kernel_ok`."""
    for b in (1024, 512, 256, 128):
        if s % b == 0 and b * max(rep, 1) <= 4096:
            return b
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def trainable_flash_attention(q, k, v, causal=True):
    """Flash attention with Pallas kernels on both passes (dq and fused
    dk/dv backward; no forward recompute — the probability blocks are
    re-materialized from the saved logsumexp). GQA k/v (`kv_heads`
    dividing `heads`) are consumed natively — pass them UNREPEATED; the
    returned dk/dv carry `kv_heads`. Shapes beyond the resident-KV VMEM
    budget use the XL streaming kernels (3-D grid, K/V blocks
    double-buffered by the pipeline — unbounded sequence length); shapes
    that don't meet the block constraints at all fall back to XLA.
    """
    if _kernel_ok(q, k):
        sm_scale = q.shape[-1] ** -0.5
        if _resident_ok(q, k):
            b = _block_for(q.shape[2], causal)
            o, _ = _flash_fwd(q, k, v, causal, sm_scale, b, b)
        else:
            # wide blocks: K/V HBM traffic scales with S/block_q fetches
            # of the full K/V, so 512-wide q blocks cut it 4x vs 128
            b = _xl_block(q.shape[2], q.shape[1] // k.shape[1])
            o, _ = _flash_fwd_xl(q, k, v, causal, sm_scale, b, b)
        return o
    return reference_attention(q, k, v, causal=causal)


def _resident_ok(q, k) -> bool:
    s, d = q.shape[2], q.shape[3]
    rep = q.shape[1] // k.shape[1]
    # resident K/V (fwd/dq kernels: 2 * s*d operands) and the group's
    # Q/dO rows (dkv kernel: 2 * rep*s*d) must fit VMEM alongside the
    # block buffers; 6 MB of (rep+1)*s*d payload is the measured-safe
    # budget (S=4096 rep=4 bf16 resident compiles and is 1.37x the XL
    # streaming path; S=16K MHA bf16 does not compile resident and
    # streams). f32 shapes halve the admitted sequence automatically.
    return (rep + 1) * s * d * q.dtype.itemsize <= 6 * 2 ** 20


def _kernel_ok(q, k) -> bool:
    s, d = q.shape[2], q.shape[3]
    if not (s >= 128 and s % 128 == 0 and d % 8 == 0
            and q.shape[1] % k.shape[1] == 0
            and jax.default_backend() == "tpu"):
        return False
    # non-resident shapes additionally need a VMEM-safe streaming block
    return _resident_ok(q, k) \
        or _xl_block(s, q.shape[1] // k.shape[1]) is not None


def _tfa_fwd(q, k, v, causal):
    if not _kernel_ok(q, k):
        out, vjp = jax.vjp(
            lambda q_, k_, v_: reference_attention(q_, k_, v_, causal=causal),
            q, k, v)
        return out, (vjp, None)
    sm_scale = q.shape[-1] ** -0.5
    if _resident_ok(q, k):
        b = _block_for(q.shape[2], causal)
        o, lse = _flash_fwd(q, k, v, causal, sm_scale, b, b)
    else:
        b = _xl_block(q.shape[2], q.shape[1] // k.shape[1])
        o, lse = _flash_fwd_xl(q, k, v, causal, sm_scale, b, b)
    return o, (None, (q, k, v, o, lse))


def _tfa_bwd(causal, residuals, g):
    vjp, saved = residuals
    if vjp is not None:
        return vjp(g)
    q, k, v, o, lse = saved
    sm_scale = q.shape[-1] ** -0.5
    if _resident_ok(q, k):
        b = _block_for(q.shape[2], causal)
        return _flash_bwd(q, k, v, o, lse, g, causal, sm_scale, b, b)
    b = _xl_block(q.shape[2], q.shape[1] // k.shape[1])
    return _flash_bwd_xl(q, k, v, o, lse, g, causal, sm_scale, b, b)


# optimize_remat routes differentiation through a `remat_opt` primitive
# whose outputs are the fwd products (o, lse). Under per-layer
# jax.checkpoint a policy that saves `remat_opt` outputs (models/llm.py
# "dots_and_flash_saveable") then keeps them for the backward instead of
# re-running the forward kernel during the remat replay — without it the
# custom_vjp fwd rule (and its Pallas call) always re-executes, because
# residuals of a custom_vjp are opaque to checkpoint_name/policy saving
# (measured: 2 fwd kernel launches per layer per step -> 1).
trainable_flash_attention.defvjp(_tfa_fwd, _tfa_bwd, optimize_remat=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def trainable_flash_attention_packed(q, k, v, segment_ids, causal):
    """Block-diagonal flash attention for SEGMENTED rows: queries attend
    only to keys in the same segment, combined with a causal mask by
    default (packed-sequence training, models/data.pack_samples) or
    bidirectional with `causal=False` (e.g. the ViT encoder over
    pad-extended token rows, models/vit.py). Segment ids must be
    nondecreasing per row — the kernels use that to skip fully-masked kv
    blocks on BOTH sides (block-diagonal complexity, not S^2). GQA-native
    like trainable_flash_attention; falls back to the XLA reference
    off-TPU or for non-kernel shapes. `causal` is REQUIRED positional:
    custom_vjp does not apply Python defaults, so a default would shift
    bindings when omitted."""
    if _kernel_ok(q, k):
        sm_scale = q.shape[-1] ** -0.5
        if _resident_ok(q, k):
            b = _block_for(q.shape[2], causal)
            o, _ = _flash_fwd(q, k, v, causal, sm_scale, b, b,
                              segment_ids=segment_ids)
        else:
            bq = _xl_block(q.shape[2], q.shape[1] // k.shape[1])
            o, _ = _flash_fwd_xl(q, k, v, causal, sm_scale, bq, bq,
                                 segment_ids=segment_ids)
        return o
    return reference_attention(q, k, v, causal=causal,
                               segment_ids=segment_ids)


def _tfap_fwd(q, k, v, segment_ids, causal):
    # nondiff_argnums stay in their ORIGINAL positions for the fwd rule
    # (only the bwd rule receives them prepended)
    if not _kernel_ok(q, k):
        out, vjp = jax.vjp(
            lambda q_, k_, v_: reference_attention(
                q_, k_, v_, causal=causal, segment_ids=segment_ids),
            q, k, v)
        return out, (vjp, None, segment_ids)
    sm_scale = q.shape[-1] ** -0.5
    if _resident_ok(q, k):
        b = _block_for(q.shape[2], causal)
        o, lse = _flash_fwd(q, k, v, causal, sm_scale, b, b,
                            segment_ids=segment_ids)
    else:
        bq = _xl_block(q.shape[2], q.shape[1] // k.shape[1])
        o, lse = _flash_fwd_xl(q, k, v, causal, sm_scale, bq, bq,
                               segment_ids=segment_ids)
    return o, (None, (q, k, v, o, lse), segment_ids)


def _tfap_bwd(causal, residuals, g):
    import numpy as np

    vjp, saved, segment_ids = residuals
    dseg = np.zeros(segment_ids.shape, dtype=jax.dtypes.float0)
    if vjp is not None:
        return (*vjp(g), dseg)
    q, k, v, o, lse = saved
    sm_scale = q.shape[-1] ** -0.5
    if _resident_ok(q, k):
        b = _block_for(q.shape[2], causal)
        dq, dk, dv = _flash_bwd(q, k, v, o, lse, g, causal, sm_scale,
                                b, b, segment_ids=segment_ids)
    else:
        bq = _xl_block(q.shape[2], q.shape[1] // k.shape[1])
        dq, dk, dv = _flash_bwd_xl(q, k, v, o, lse, g, causal, sm_scale,
                                   bq, bq, segment_ids=segment_ids)
    return dq, dk, dv, dseg


# optimize_remat: see trainable_flash_attention.defvjp above
trainable_flash_attention_packed.defvjp(_tfap_fwd, _tfap_bwd,
                                        optimize_remat=True)
