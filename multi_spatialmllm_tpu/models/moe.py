"""Mixture-of-Experts FFN with expert parallelism (beyond-reference).

The reference delegates all model training to InternVL-2's dense stack
(/root/reference/README.md:194-200); this module adds the sparse-FFN
scaling axis the TPU rebuild's mesh was designed around: a GShard-style
top-k routed SwiGLU whose expert weights shard over the mesh "expert"
axis (parallel/mesh.EXPERT_AXIS), with the token dispatch/combine
written as dense einsums so XLA's SPMD partitioner emits the
all-to-alls over ICI — no hand-written collectives.

Design (GShard / Switch-Transformer dispatch, TPU-idiomatic):
  - router logits in f32, softmax over E experts, iterative top-k
    (k is a tiny static Python loop — no sort, no dynamic shapes);
  - chosen-gate renormalization (Mixtral convention): the k gate
    values are rescaled to sum to 1, so E identical experts reproduce
    the dense MLP exactly (the parity oracle in tests/test_moe.py);
  - capacity C = ceil(top_k * T * capacity_factor / E) per batch row;
    position-in-expert via cumsum along T, tokens past C are dropped
    (their combine weight is 0 — output falls back to the residual);
  - TRAINING with cfg.moe_group = g > 0 routes in GShard groups: rows
    reshape to [B*(T/g), g, D] and capacity binds per group, so the
    dispatch/combine tensors cost O(T * k*g*cap) FLOPs against D —
    independent of T — instead of the whole-row O(k*T^2) that is
    infeasible at training sequence lengths (at S=2048 the per-row
    dispatch einsum alone is ~270 TFLOP/layer). The load-balance
    statistic is unchanged (fractions still average over all real
    tokens); only WHERE capacity binds moves (group-local, the
    standard GShard/Switch formulation);
  - INFERENCE (a kv cache is active) uses a NO-DROP capacity
    C = top_k * T for chunks up to NO_DROP_MAX_T, so incremental
    decode, chunked decode, and chunked prefill all produce identical
    routing regardless of chunk boundaries (capacity binding depends
    on position-in-chunk, so a capped capacity makes outputs
    chunk-size-dependent). Longer unchunked prefills fall back to the
    capped capacity — the dispatch tensor is O(T*C) = O(k*T^2) and a
    no-drop flagship 8K prefill would not fit; serve MoE models with
    `prefill_chunk <= 512` for strictly chunk-invariant outputs.
  - padding tokens (segment_ids == 0 in packed batches) are masked out
    of routing: they consume no expert capacity and are excluded from
    the load-balance aux fractions (a heavily padded batch must not
    bias router statistics toward whatever pads route to);
  - cfg.moe_impl = "ragged" swaps the dispatch machinery for a DROPLESS
    sorted-gather path (MegaBlocks / megablox style): token copies are
    stable-sorted by chosen expert and the three SwiGLU projections run
    as `jax.lax.ragged_dot` grouped matmuls over the sorted rows — the
    machine executes EXACTLY the activated-expert FLOPs (no capacity
    buffers, no one-hot dispatch einsums, no drops ever). Routing is
    per-token, so outputs are trivially chunk-/batch-composition-
    invariant at inference; the load-balance statistic is the same
    formula. Use it on single-chip or data-parallel meshes; the
    "einsum" impl remains the default because its dense dispatch is
    what XLA's SPMD partitioner turns into expert-parallel all-to-alls
    (a global sort does not shard over the "expert" axis);
  - dispatch [B,T,E,C] / combine [B,T,E,C] contract tokens into
    per-expert buffers [E,B,C,D]; the expert SwiGLU is ONE batched
    einsum per projection ([E,B,C,D] x [E,D,F]) — E stays a leading
    MXU batch dim, sharded over "expert";
  - the load-balance auxiliary loss (mean gate fraction x mean route
    fraction x E) is sow'n under ("intermediates", "moe_aux_loss");
    parallel/train.make_train_step collects it when the config enables
    MoE. Without a mutable apply the sow is inert, so every serving
    path (prefill, decode, paged programs) runs MoE unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

import functools

# Inference chunks up to this length route with a no-drop capacity
# (C = top_k * T). Decode chunks and chunked prefills sit far below it;
# above it the O(k*T^2) dispatch tensor stops being free.
NO_DROP_MAX_T = 512


def _grouped_dot(xs, w, group_sizes, kernel: str = "xla"):
    """lhs[start_g:end_g] @ w[g] for each group — the ragged impl's
    core op. kernel="xla" lowers through `lax.ragged_dot`; "pallas"
    runs the megablox Pallas grouped-matmul (MXU-sized tiles, group
    boundaries masked in-kernel; custom VJP computes dlhs with the same
    kernel and dw with its transposed variant). Measured motivation:
    ragged_dot reaches 87 TFLOP/s at the bench MoE shapes vs 142 for a
    same-FLOPs dense dot (docs/profiles/moe_train.md) — the grouped
    lowering, not data movement, is the gap the kernel closes. Off-TPU
    backends run the kernel in interpret mode (tests); production CPU
    paths should keep "xla"."""
    if kernel == "xla":
        return jax.lax.ragged_dot(xs, w, group_sizes)
    if kernel != "pallas":
        raise ValueError(f"unknown moe_kernel {kernel!r}")

    def tile(dim, prefs):
        # megablox requires tile | dim; whole-dim tiles always divide
        for c in prefs:
            if dim % c == 0:
                return c
        return dim

    m, k = xs.shape
    n = w.shape[-1]
    tiling = (tile(m, (512, 256, 128, 64, 32, 16, 8)),
              tile(k, (1024, 512, 256, 128)),
              tile(n, (1024, 512, 256, 128)))
    return _pallas_gmm(xs, w, group_sizes.astype(jnp.int32), tiling,
                       jax.default_backend() != "tpu")


class _NoX64:
    """Scope jax_enable_x64 off around a megablox kernel TRACE: the
    library's kernel bodies mix `pl.num_programs(...) - 1` (weak int,
    int64 under x64) with int32 grid ids, which fails to trace when the
    suite-wide x64 flag (tests/conftest.py — f64 geometry parity) is
    on. The scoped flip only affects ops created inside the kernel
    trace; every array crossing the boundary is explicitly f32/bf16/
    int32."""

    def __enter__(self):
        self.prev = jax.config.jax_enable_x64
        if self.prev:
            jax.config.update("jax_enable_x64", False)

    def __exit__(self, *exc):
        if self.prev:
            jax.config.update("jax_enable_x64", True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_gmm(lhs, rhs, group_sizes, tiling, interpret):
    """megablox grouped matmul with an x64-safe custom VJP (dlhs via the
    transposed-rhs gmm, drhs via tgmm — the same pairing as the
    library's own VJP, each traced under the x64 scope guard)."""
    import importlib

    mb = importlib.import_module(
        "jax.experimental.pallas.ops.tpu.megablox.gmm")
    with _NoX64():
        return mb.gmm(lhs, rhs, group_sizes, lhs.dtype, tiling,
                      interpret=interpret)


def _pallas_gmm_fwd(lhs, rhs, group_sizes, tiling, interpret):
    return (_pallas_gmm(lhs, rhs, group_sizes, tiling, interpret),
            (lhs, rhs, group_sizes))


def _pallas_gmm_bwd(tiling, interpret, res, dy):
    import importlib

    mb = importlib.import_module(
        "jax.experimental.pallas.ops.tpu.megablox.gmm")
    lhs, rhs, group_sizes = res
    with _NoX64():
        dlhs = mb.gmm(dy, rhs, group_sizes, lhs.dtype, tiling,
                      transpose_rhs=True, interpret=interpret)
        drhs = mb.tgmm(lhs.swapaxes(0, 1), dy, group_sizes, rhs.dtype,
                       tiling, None, rhs.shape[0], interpret=interpret)
    return dlhs, drhs, None


_pallas_gmm.defvjp(_pallas_gmm_fwd, _pallas_gmm_bwd)


def moe_capacity(cfg, seq_len: int, inference: bool = False) -> int:
    """Per-batch-row expert capacity (static given the padded T).

    Host math (not jnp): T is a static shape, and the capacity must be
    a Python int — it sizes the dispatch tensors inside jit. At
    inference, short chunks get the no-drop capacity (see module doc)."""
    import math

    if inference and seq_len <= NO_DROP_MAX_T:
        return max(int(cfg.moe_top_k * seq_len), 1)
    c = math.ceil(cfg.moe_top_k * seq_len * cfg.moe_capacity
                  / cfg.moe_experts)
    return max(int(c), 1)


def top_k_routing(logits: jax.Array, top_k: int, capacity: int,
                  valid: jax.Array | None = None):
    """Router math shared by tests and the module.

    Args:
      logits: [B, T, E] router logits (f32).
      top_k: experts per token.
      capacity: max tokens per expert per batch row.
      valid: optional [B, T] mask; False rows (padding) are excluded
        from routing entirely — zero dispatch/combine, no capacity
        consumed, no contribution to the aux fractions.
    Returns:
      dispatch [B,T,E,C] (0/1 f32), combine [B,T,E,C] (gate-weighted
      dispatch), aux (load-balance loss scalar, f32).
    """
    b, t, e = logits.shape
    # ONE copy of the router math: selection order, gate renorm, and
    # the Switch aux statistic live in _topk_select (shared with the
    # ragged impl); this function adds only the GShard dispatch/combine
    # construction. Gate values are identical: max(masked) ==
    # sum(masked * one_hot(argmax)) at every step, and pad tokens end
    # zeroed either way (gate_mat * vmask here, oh * vmask below).
    vflat = (None if valid is None
             else valid.reshape(b * t).astype(jnp.float32))
    idx, gate_mat, aux = _topk_select(
        logits.reshape(b * t, e), top_k, vflat)
    idx = idx.reshape(b, t, top_k)
    gate_mat = gate_mat.reshape(b, t, top_k)
    vmask = None
    if valid is not None:
        vmask = valid.astype(jnp.float32)[..., None]          # [B,T,1]

    # positions in each expert's buffer: k-th choices queue after the
    # (k-1)-th (GShard order), cumsum along T within each batch row
    counts = jnp.zeros((b, 1, e), dtype=jnp.float32)
    dispatch = jnp.zeros((b, t, e, capacity), dtype=jnp.float32)
    combine = jnp.zeros_like(dispatch)
    for j in range(top_k):
        oh = jax.nn.one_hot(idx[:, :, j], e, dtype=jnp.float32)
        if vmask is not None:
            oh = oh * vmask  # pads select nothing, consume nothing
        pos = jnp.cumsum(oh, axis=1) - oh + counts           # [B,T,E]
        counts = counts + jnp.sum(oh, axis=1, keepdims=True)
        keep = (pos < capacity) * oh                         # [B,T,E]
        pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                                dtype=jnp.float32)           # [B,T,E,C]
        d = keep[..., None] * pos_oh
        dispatch = dispatch + d
        combine = combine + gate_mat[:, :, j, None, None] * d
    return dispatch, combine, aux


def _topk_select(logits: jax.Array, top_k: int,
                 vmask: jax.Array | None):
    """Per-token top-k expert selection shared by the ragged path.

    Args:
      logits: [N, E] router logits (f32).
      vmask: optional [N] f32 validity (0.0 for pads).
    Returns:
      idx [N, top_k] int32, gates [N, top_k] f32 (renormalized to sum
      to 1 per token; zeroed on pads), aux (same load-balance statistic
      as top_k_routing, over real tokens only).
    """
    n, e = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    masked = probs
    idxs, gates = [], []
    for _ in range(top_k):
        i = jnp.argmax(masked, axis=-1)                      # [N]
        idxs.append(i.astype(jnp.int32))
        gates.append(jnp.max(masked, axis=-1))               # [N]
        masked = masked * (1.0 - jax.nn.one_hot(i, e,
                                                dtype=jnp.float32))
    denom = sum(gates) + 1e-9
    gate_mat = jnp.stack([g / denom for g in gates], axis=1)  # [N,k]

    oh0 = jax.nn.one_hot(idxs[0], e, dtype=jnp.float32)       # [N,E]
    if vmask is None:
        route_frac = jnp.mean(oh0, axis=0)
        prob_frac = jnp.mean(probs, axis=0)
    else:
        gate_mat = gate_mat * vmask[:, None]
        n_valid = jnp.maximum(jnp.sum(vmask), 1.0)
        route_frac = jnp.sum(oh0 * vmask[:, None], axis=0) / n_valid
        prob_frac = jnp.sum(probs * vmask[:, None], axis=0) / n_valid
    aux = jnp.sum(route_frac * prob_frac) * e
    return jnp.stack(idxs, axis=1), gate_mat, aux


def ragged_moe(cfg, x, router, wi_gate, wi_up, wo,
               valid: jax.Array | None = None):
    """Dropless sorted-gather MoE forward (cfg.moe_impl == "ragged").

    [B,T,D] -> [B,T,D]. Token copies are stable-sorted by expert id and
    the SwiGLU runs as three `lax.ragged_dot` grouped matmuls — exactly
    the activated-expert FLOPs, no capacity buffers or dispatch
    one-hots. Returns (y, aux)."""
    dtype = jnp.dtype(cfg.dtype)
    b, t, d = x.shape
    k, e = cfg.moe_top_k, cfg.moe_experts
    n = b * t
    xf = x.reshape(n, d)
    vmask = (None if valid is None
             else valid.reshape(n).astype(jnp.float32))

    logits = jnp.einsum("nd,de->ne", xf.astype(jnp.float32), router)
    idx, gates, aux = _topk_select(logits, k, vmask)          # [N,k] x2

    ei = idx.reshape(n * k)
    # stable sort keeps (token, k) order within an expert: the whole
    # pipeline below is a fixed permutation of per-row-independent
    # work, so outputs are batch-/chunk-composition invariant
    order = jnp.argsort(ei, stable=True)
    xs = jnp.take(xf, order // k, axis=0).astype(dtype)       # [N*k, D]
    group_sizes = jnp.bincount(ei, length=e).astype(jnp.int32)

    gd = functools.partial(_grouped_dot,
                           kernel=getattr(cfg, "moe_kernel", "xla"))
    hg = gd(xs, wi_gate.astype(dtype), group_sizes)
    hu = gd(xs, wi_up.astype(dtype), group_sizes)
    ys = gd(nn.silu(hg) * hu, wo.astype(dtype),
            group_sizes)                                      # [N*k, D]
    inv = jnp.argsort(order, stable=True)
    yk = jnp.take(ys, inv, axis=0).reshape(n, k, d)
    y = jnp.sum(yk * gates.astype(dtype)[..., None], axis=1)
    return y.reshape(b, t, d).astype(dtype), aux


class MoEMLP(nn.Module):
    """Drop-in replacement for models/llm.MLP when cfg.moe_experts > 0.

    Parameter shapes (all self.param, matched by parallel/sharding.py):
      router   [D, E]        — replicated (tiny)
      wi_gate  [E, D, F]     — P("expert", None, "model")
      wi_up    [E, D, F]     — P("expert", None, "model")
      wo       [E, F, D]     — P("expert", "model", None)
    so expert parallelism composes with Megatron tensor parallelism on
    the FFN dim exactly like the dense path's gate/up/down rules.
    """

    cfg: Any

    @nn.compact
    def __call__(self, x, lora=None, valid=None, inference=False):
        cfg = self.cfg
        if lora is not None and any(
                n in lora.get("tables", {}) for n in ("gate", "up",
                                                      "down")):
            # serving-time stacked adapters target the DENSE SwiGLU
            # kernels; silently ignoring them here would serve an
            # un-adapted FFN while reporting the adapter as applied
            raise ValueError(
                "LoRA adapters target dense MLP kernels (gate/up/down); "
                "this model's FFN is a routed MoE — attention-only "
                "adapters are supported, MLP adapters are not")
        dtype = jnp.dtype(cfg.dtype)
        b, t, d = x.shape
        e, f = cfg.moe_experts, cfg.ffn_size

        if getattr(cfg, "moe_impl", "einsum") == "ragged":
            init = nn.initializers.lecun_normal()
            router = self.param("router", init, (d, e), jnp.float32)
            wi_gate = self.param("wi_gate", init, (e, d, f), jnp.float32)
            wi_up = self.param("wi_up", init, (e, d, f), jnp.float32)
            wo = self.param("wo", init, (e, f, d), jnp.float32)
            y, aux = ragged_moe(cfg, x, router, wi_gate, wi_up, wo,
                                valid=valid)
            self.sow("intermediates", "moe_aux_loss", aux)
            return y

        # GShard grouped routing (training only): capacity binds per
        # `moe_group`-token group, so the dispatch tensor is
        # [B*G, g, E, ceil(k*g*cap/E)] — O(T * k*g*cap) total instead
        # of the whole-row O(k*T^2) that makes training-scale sequences
        # (S >= 2K) infeasible. Inference keeps whole-chunk routing:
        # its chunk-invariance guarantees depend on it.
        g = getattr(cfg, "moe_group", 0)
        if (not inference) and 0 < g < t and t % g != 0:
            # silent fallback here would mean whole-row O(k*T^2)
            # dispatch — the exact regime grouping exists to avoid
            # (~270 TFLOP/layer at S=2048; OOMs a 16 GB chip)
            raise ValueError(
                f"moe_group={g} must divide the training sequence "
                f"length (got T={t}); pick a divisor or 0 for "
                f"whole-row routing")
        grouped = (not inference) and 0 < g < t
        if grouped:
            xr = x.reshape(b * (t // g), g, d)
            vr = None if valid is None else valid.reshape(b * (t // g), g)
        else:
            xr, vr = x, valid
        cap = moe_capacity(cfg, xr.shape[1], inference=inference)

        init = nn.initializers.lecun_normal()
        router = self.param("router", init, (d, e), jnp.float32)
        wi_gate = self.param("wi_gate", init, (e, d, f), jnp.float32)
        wi_up = self.param("wi_up", init, (e, d, f), jnp.float32)
        wo = self.param("wo", init, (e, f, d), jnp.float32)

        logits = jnp.einsum("btd,de->bte", xr.astype(jnp.float32), router)
        dispatch, combine, aux = top_k_routing(logits, cfg.moe_top_k, cap,
                                               valid=vr)
        self.sow("intermediates", "moe_aux_loss", aux)

        xin = jnp.einsum("btec,btd->ebcd", dispatch.astype(dtype),
                         xr.astype(dtype))
        gate = jnp.einsum("ebcd,edf->ebcf", xin, wi_gate.astype(dtype))
        up = jnp.einsum("ebcd,edf->ebcf", xin, wi_up.astype(dtype))
        out = jnp.einsum("ebcf,efd->ebcd", nn.silu(gate) * up,
                         wo.astype(dtype))
        y = jnp.einsum("btec,ebcd->btd", combine.astype(dtype), out)
        return y.reshape(b, t, d).astype(dtype)
