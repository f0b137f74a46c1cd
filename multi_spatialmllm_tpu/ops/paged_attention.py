"""Pallas TPU paged-attention decode kernel.

Serves the paged-KV continuous-batching path (models/paged_kv.py; the
reference has no serving stack — /root/reference/README.md:194-200
delegates to InternVL-2). The XLA fallback in models/llm.py gathers each
slot's full page window (`k_pages[page_table]` — a materialized
[B, PPS, KVH, ps, hd] copy of the window, twice, per layer, per decode
step: gather-read + write + attention-read, ~3x the live-window HBM
traffic, independent of how much of the window is live). This kernel
reads only the pages a slot actually owns.

Design (the standard TPU paged-attention shape, cf. the public
jax.experimental.pallas.ops.tpu.paged_attention kernel):

* The page pools stay in HBM (`memory_space=ANY`); the kernel issues its
  own per-page async copies into a double-buffered VMEM scratch, guided
  by the PREFETCHED page table. While block `i` computes, the copies for
  the next LIVE block (possibly the next slot's first block) are already
  in flight — dead blocks past a slot's live length are never fetched
  at all, so HBM traffic scales with total LIVE tokens, not B x window.
* Grid (B, PPS/ppb), pages-per-block `ppb` chosen so one copy burst
  moves all kv heads of `ppb` pages (wide DMAs; a one-page-per-grid-step
  BlockSpec pipeline was measured DMA-latency-bound at 16-128 KB
  fetches).
* GQA native: q rides as [KVH, rep, hd]; page copies land at their
  row-slice of a [KVH, ppb*ps, hd] VMEM block so the whole block is ONE
  KVH-batched dot_general (kv never repeated to H width; per-page
  matmuls were measured compute-overhead-bound). Online-softmax state
  (m/l/acc, f32) lives in VMEM scratch across a slot's block loop; the
  output is written once, on the slot's last live block.

Semantics are identical to the masked-window XLA path: keys at logical
positions <= index[b] are admitted (the current token's kv row is
written by the caller before attention). Numerics differ only by online
vs single-pass softmax accumulation order (last-ulp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import NEG_INF

# Guard for all-zero kv rows: scale floors here so dequantization of a
# zero row stays exactly zero instead of dividing by zero.
KV_QUANT_EPS = 1e-8


def quantize_kv_rows(rows: jax.Array):
    """Symmetric per-row int8 quantization of kv rows.

    rows `[..., hd]` (any float dtype) -> `(int8 rows [..., hd],
    f32 scales [...])` with `rows ~= int8 * scale`. The SAME formula runs
    inside the Pallas kernel's fused write (`_paged_decode_kernel`) and
    in the XLA fallback (models/llm.py) so pools stay bit-identical
    across paths.
    """
    r = rows.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(r), axis=-1) / 127.0, KV_QUANT_EPS)
    q = jnp.clip(jnp.round(r / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def _scale_tile(scbuf, buf, ppb: int):
    """Assemble a block's `[KVH, bk]` scale tile from the per-page
    `[ppb, KVH, ps]` slab buffer: page j's scales land at lanes
    `j*ps..(j+1)*ps`. Lane-dim concatenation — the equivalent
    `transpose(1,0,2).reshape(KVH, bk)` is a minor-dim merge Mosaic
    rejects (`tpu.reshape vector<KVHxppbxps> -> vector<KVHx1xbk>:
    unsupported shape cast`, the round-3 bench-capture killer)."""
    if ppb == 1:
        return scbuf[buf, 0]
    return jnp.concatenate([scbuf[buf, j] for j in range(ppb)], axis=-1)


def _dot_qk_g(q, k):
    """[G, m, d] x [G, n, d] -> [G, m, n] f32 (batched over kv groups)."""
    return jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _dot_pv_g(p, v):
    """[G, m, k] x [G, k, d] -> [G, m, d] f32; p cast to v's dtype."""
    return jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _paged_decode_kernel(
    # scalar prefetch
    idx_ref, pt_ref, buf_ref, init_ref,
    # inputs: q_ref, kp_hbm, vp_hbm [, ks_hbm, vs_hbm if quant]
    #         [, knew_ref, vnew_ref if write]
    # outputs: o_ref [, kp_out, vp_out (+ ks_out, vs_out if quant)
    #          aliased onto the input pools, if write]
    # scratch: kbuf, vbuf [, kscbuf, vscbuf if quant], ksem, vsem
    #          [, wsem if write], m_scr, l_scr, acc_scr
    q_ref, kp_hbm, vp_hbm, *rest,
    page_size: int, ppb: int, pps: int, batch: int, sm_scale: float,
    write: bool, quant: bool,
):
    rest = list(rest)
    ks_hbm = vs_hbm = kscbuf = vscbuf = None
    if quant:
        ks_hbm, vs_hbm = rest.pop(0), rest.pop(0)
    if write:
        knew_ref, vnew_ref = rest.pop(0), rest.pop(0)
    o_ref = rest.pop(0)
    if write:
        # the pools are aliased input->output: the donated input refs
        # are dead; all reads and writes go through the output refs
        kp_hbm, vp_hbm = rest.pop(0), rest.pop(0)
        if quant:
            ks_hbm, vs_hbm = rest.pop(0), rest.pop(0)
    kbuf, vbuf = rest.pop(0), rest.pop(0)
    if quant:
        kscbuf, vscbuf = rest.pop(0), rest.pop(0)
    ksem, vsem = rest.pop(0), rest.pop(0)
    wsem = rest.pop(0) if write else None
    m_scr, l_scr, acc_scr = rest
    b, i = pl.program_id(0), pl.program_id(1)
    bk = ppb * page_size
    length = idx_ref[b] + 1
    num_blocks = (length + bk - 1) // bk        # >= 1 (idx >= 0)

    def page_copies(bb, ii, slot):
        # buffers are [2, KVH, ppb*ps, hd]: page j lands at row-slice
        # j*ps (a strided dst across the KVH dim), so the whole block is
        # one [KVH, bk, hd] operand afterwards — no in-kernel transpose.
        # Scale buffers are [2, ppb, KVH, ps]: page j's scale slab lands
        # at leading index j (a whole tile-aligned [KVH, ps] block).
        out = []
        for j in range(ppb):
            page = pt_ref[bb * pps + ii * ppb + j]
            dst = pl.ds(j * page_size, page_size)
            out.append(pltpu.make_async_copy(
                kp_hbm.at[page], kbuf.at[slot, :, dst], ksem.at[slot]))
            out.append(pltpu.make_async_copy(
                vp_hbm.at[page], vbuf.at[slot, :, dst], vsem.at[slot]))
            if quant:
                out.append(pltpu.make_async_copy(
                    ks_hbm.at[page], kscbuf.at[slot, j], ksem.at[slot]))
                out.append(pltpu.make_async_copy(
                    vs_hbm.at[page], vscbuf.at[slot, j], vsem.at[slot]))
        return out

    @pl.when(i < num_blocks)
    def _live():
        buf = buf_ref[0]
        idx = idx_ref[b]

        # the very first live step must start its own copies; after that
        # every live step's copies were prefetched by its predecessor
        @pl.when(init_ref[0] == 1)
        def _first():
            for c in page_copies(b, i, buf):
                c.start()
        init_ref[0] = 0

        @pl.when(i == 0)
        def _init():
            m_scr[:] = jnp.full_like(m_scr[:], NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr[:])
            acc_scr[:] = jnp.zeros_like(acc_scr[:])

        # prefetch the next LIVE block (this slot's next, or the next
        # slot's first) into the other buffer while we compute
        nxt_b, nxt_i = jax.lax.cond(
            i + 1 < num_blocks,
            lambda: (b, i + 1),
            lambda: (b + 1, jnp.int32(0)))

        @pl.when(nxt_b < batch)
        def _prefetch():
            nbuf = 1 - buf
            for c in page_copies(nxt_b, nxt_i, nbuf):
                c.start()
            buf_ref[0] = nbuf

        for c in page_copies(b, i, buf):
            c.wait()

        wpage = pt_ref[b * pps + idx // page_size]
        wj = idx // page_size - i * ppb               # block-local page
        wrow0 = wj * page_size

        def wb_copies():
            # the touched page's row-slice of the block buffer, back to
            # the pool (page starts are block-aligned: wrow0 is a
            # multiple of the sublane tiling)
            dst = pl.ds(pl.multiple_of(wrow0, page_size), page_size)
            out = [pltpu.make_async_copy(
                       kbuf.at[buf, :, dst], kp_hbm.at[wpage], wsem),
                   pltpu.make_async_copy(
                       vbuf.at[buf, :, dst], vp_hbm.at[wpage], wsem)]
            if quant:
                out += [pltpu.make_async_copy(
                            kscbuf.at[buf, wj], ks_hbm.at[wpage], wsem),
                        pltpu.make_async_copy(
                            vscbuf.at[buf, wj], vs_hbm.at[wpage], wsem)]
            return out

        if write:
            # land the current step's kv row: the row lives in this
            # slot's LAST block (position == idx), so patch it into the
            # freshly-waited VMEM block (vector select — Mosaic cannot
            # DMA a single unaligned sublane row), store the block back,
            # and DMA the touched PAGE to the pool for future steps.
            @pl.when(i == num_blocks - 1)
            def _patch():
                r = idx - i * bk
                rows = jax.lax.broadcasted_iota(jnp.int32, (1, bk, 1), 1)
                kn, vn = knew_ref[0], vnew_ref[0]     # [KVH, hd]
                if quant:
                    # same formula as quantize_kv_rows (pools must stay
                    # bit-identical to the XLA fallback's writes)
                    kn32 = kn.astype(jnp.float32)
                    vn32 = vn.astype(jnp.float32)
                    ksc_n = jnp.maximum(
                        jnp.max(jnp.abs(kn32), -1, keepdims=True) / 127.0,
                        KV_QUANT_EPS)                 # [KVH, 1]
                    vsc_n = jnp.maximum(
                        jnp.max(jnp.abs(vn32), -1, keepdims=True) / 127.0,
                        KV_QUANT_EPS)
                    kn = jnp.clip(jnp.round(kn32 / ksc_n),
                                  -127, 127).astype(jnp.int8)
                    vn = jnp.clip(jnp.round(vn32 / vsc_n),
                                  -127, 127).astype(jnp.int8)
                    # scale buffers are [ppb, KVH, ps]: flat position
                    # j*ps + row == r selects the one scalar per head
                    posq = (jax.lax.broadcasted_iota(
                                jnp.int32, (ppb, 1, page_size), 0)
                            * page_size
                            + jax.lax.broadcasted_iota(
                                jnp.int32, (ppb, 1, page_size), 2))
                    kscbuf[buf] = jnp.where(posq == r, ksc_n[None],
                                            kscbuf[buf])
                    vscbuf[buf] = jnp.where(posq == r, vsc_n[None],
                                            vscbuf[buf])
                kbuf[buf] = jnp.where(rows == r, kn[:, None, :],
                                      kbuf[buf])
                vbuf[buf] = jnp.where(rows == r, vn[:, None, :],
                                      vbuf[buf])
                for c in wb_copies():
                    c.start()

        q = q_ref[0]                                  # [KVH, rep, hd]
        k = kbuf[buf]                                 # [KVH, bk, hd]
        v = vbuf[buf]
        if quant:
            # int8 pools: cast to the q dtype for the MXU and apply the
            # per-row scales AFTER the matmuls on the [KVH, rep, bk]
            # score/probability tiles (bk values per head instead of
            # bk*hd — the dequant multiply never touches the big block)
            k = k.astype(q.dtype)
            v = v.astype(q.dtype)
        s = _dot_qk_g(q, k) * sm_scale                # [KVH, rep, bk]
        if quant:
            s = s * _scale_tile(kscbuf, buf, ppb)[:, None, :]
        pos = i * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(pos <= idx, s, NEG_INF)
        m_prev, l_prev = m_scr[:], l_scr[:]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        pexp = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        m_scr[:] = m_cur
        l_scr[:] = l_prev * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        if quant:
            pexp = pexp * _scale_tile(vscbuf, buf, ppb)[:, None, :]
        acc_scr[:] = acc_scr[:] * alpha + _dot_pv_g(pexp, v)

        @pl.when(i == num_blocks - 1)
        def _emit():
            o_ref[0] = (acc_scr[:] /
                        jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)
            if write:
                # the writeback must land before a later grid step's
                # prefetch reuses this VMEM buffer slot
                for c in wb_copies():
                    c.wait()


def _pages_per_block(pps: int, page_size: int) -> int:
    """Widest burst of <= 512 kv rows that divides the table width."""
    for c in (8, 4, 2, 1):
        if pps % c == 0 and c * page_size <= 512:
            return c
    return 1


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def paged_decode_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    page_table: jax.Array,
    index: jax.Array,
    sm_scale: float | None = None,
    k_new: jax.Array | None = None,
    v_new: jax.Array | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
):
    """Decode-step attention over a paged KV pool.

    Args:
      q: `[B, H, 1, hd]` (single decode position per slot).
      k_pages, v_pages: `[P, KVH, ps, hd]` shared page pools
        (`KVH` dividing `H` — GQA native, do NOT repeat).
      page_table: `[B, PPS]` int32; rows list a slot's pages in logical
        order, unallocated tail entries pointing at the sink page 0.
      index: `[B]` int32 position of the current kv row; keys at
        positions <= index are admitted.
      k_new, v_new: optional `[B, KVH, hd]` — the current step's kv rows.
        When given, the KERNEL lands them at (page, offset) of index
        before attending, and the (aliased) updated pools are returned:
        an XLA-side scatter/DUS write makes XLA pick a write-friendly
        pool layout and relayout-copy the full pools across the pallas
        boundary every step (measured ~10x the kernel cost) — fusing the
        write keeps the pools untouched by XLA.
      k_scale, v_scale: optional `[P, KVH, ps]` f32 per-row scale pools.
        When given the pools must be int8 (`quantize_kv_rows`); the
        kernel DMAs half the kv bytes and dequantizes on the score /
        probability tiles. With k_new/v_new, the kernel quantizes the
        fresh rows itself and the updated scale pools are returned too.
    Returns:
      `[B, H, 1, hd]`; with k_new/v_new: `(out, k_pages, v_pages)` or
      `(out, k_pages, v_pages, k_scale, v_scale)` when quantized
      (donate pools at the call boundary to alias in place).
    """
    b, h, t, hd = q.shape
    assert t == 1, "paged decode kernel is decode-only"
    _, kvh, ps, _ = k_pages.shape
    rep = h // kvh
    pps = page_table.shape[1]
    ppb = _pages_per_block(pps, ps)
    if sm_scale is None:
        sm_scale = hd ** -0.5
    write = k_new is not None
    assert write == (v_new is not None), "pass both k_new and v_new"
    quant = k_scale is not None
    assert quant == (v_scale is not None), "pass both k_scale and v_scale"
    if quant:
        assert k_pages.dtype == jnp.int8, k_pages.dtype

    qg = q.reshape(b, kvh, rep, hd)
    q_spec = pl.BlockSpec((1, kvh, rep, hd),
                          lambda bi, i, *_: (bi, 0, 0, 0))
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    in_specs = [q_spec, any_spec, any_spec]
    out_specs = [q_spec]
    out_shape = [jax.ShapeDtypeStruct((b, kvh, rep, hd), q.dtype)]
    operands = [index.astype(jnp.int32),
                page_table.astype(jnp.int32).reshape(-1),
                jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
                qg, k_pages, v_pages]
    if quant:
        in_specs += [any_spec, any_spec]
        operands += [k_scale, v_scale]
    aliases = {}
    if write:
        new_spec = pl.BlockSpec((1, kvh, hd), lambda bi, i, *_: (bi, 0, 0))
        in_specs += [new_spec, new_spec]
        out_specs += [any_spec, any_spec]
        out_shape += [jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                      jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype)]
        operands += [k_new, v_new]
        # flat input indices include the 4 scalar-prefetch operands
        aliases = {5: 1, 6: 2}
        if quant:
            out_specs += [any_spec, any_spec]
            out_shape += [
                jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)]
            aliases = {5: 1, 6: 2, 7: 3, 8: 4}
    scratch = [
        pltpu.VMEM((2, kvh, ppb * ps, hd), k_pages.dtype),
        pltpu.VMEM((2, kvh, ppb * ps, hd), v_pages.dtype),
    ]
    if quant:
        scratch += [pltpu.VMEM((2, ppb, kvh, ps), jnp.float32),
                    pltpu.VMEM((2, ppb, kvh, ps), jnp.float32)]
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if write:
        scratch.append(pltpu.SemaphoreType.DMA)
    scratch += [
        pltpu.VMEM((kvh, rep, 1), jnp.float32),
        pltpu.VMEM((kvh, rep, 1), jnp.float32),
        pltpu.VMEM((kvh, rep, hd), jnp.float32),
    ]

    kernel = functools.partial(
        _paged_decode_kernel, page_size=ps, ppb=ppb, pps=pps, batch=b,
        sm_scale=sm_scale, write=write, quant=quant)
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, pps // ppb),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        input_output_aliases=aliases,
        out_shape=out_shape,
    )(*operands)
    if write and quant:
        out, kp, vp, ks, vs = res
        return out.reshape(b, h, 1, hd), kp, vp, ks, vs
    if write:
        out, kp, vp = res
        return out.reshape(b, h, 1, hd), kp, vp
    return res[0].reshape(b, h, 1, hd)


def paged_kernel_ok(q, k_pages) -> bool:
    """Shape/backend gate mirroring ops.attention._kernel_ok: the kernel
    needs TPU (or interpret mode), a lane-aligned head dim (the page
    DMAs slice [KVH, ps, hd] out of the pool — Mosaic requires the
    minor dim aligned to the 128 lane tiling), sublane-aligned page
    rows (8 rows for >=16-bit pools; int8 pools need ps a multiple of
    128: the f32 scale pools are `[P, KVH, ps]` with ps on LANES, and
    Mosaic requires the per-page scale-slab DMA lane-aligned — at
    ps=64 the slab copy is rejected with "Slice shape along dimension 2
    must be aligned to tiling (128)"), and GQA head divisibility. The
    XLA gather path handles everything else."""
    h, hd = q.shape[1], q.shape[3]
    kvh, ps = k_pages.shape[1], k_pages.shape[2]
    min_rows = 128 if k_pages.dtype == jnp.int8 else 8
    return (jax.default_backend() == "tpu"
            and h % kvh == 0 and hd % 128 == 0 and ps % min_rows == 0)
