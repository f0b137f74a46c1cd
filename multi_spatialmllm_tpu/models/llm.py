"""LLaMA/InternLM2-style decoder LLM in Flax (RMSNorm, RoPE, GQA, SwiGLU).

This is the language half of the InternVL-2-style MLLM the reference
delegates training to (README.md:194-200 points at InternVL-2 + DeepSpeed;
this repo replaces that external dependency with a TPU-native pjit stack).

Design: weights are laid out so tensor parallelism shards head and FFN
dimensions on the mesh "model" axis (parallel/sharding.py maps parameter
paths to PartitionSpecs); attention runs through the XLA path in training
(differentiable) and can use the Pallas flash kernel at inference; decoding
uses an explicit functional KV cache.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import reference_attention


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    num_layers: int = 8
    num_heads: int = 16
    num_kv_heads: int = 4
    ffn_size: int = 5632
    rope_theta: float = 1e6
    norm_eps: float = 1e-5
    max_seq_len: int = 8192
    dtype: str = "bfloat16"
    use_flash_attention: bool = False  # Pallas fwd + recompute bwd (TPU)
    remat: bool = False  # checkpoint each decoder layer (activation
    #   memory drops from O(layers) to O(1) residuals at ~1/3 extra
    #   FLOPs — the standard HBM/FLOPs trade for big models on TPU)
    remat_policy: str | None = None  # name of a jax.checkpoint_policies
    #   policy for selective remat (e.g. "dots_with_no_batch_dims_
    #   saveable" keeps matmul outputs and recomputes only the cheap
    #   elementwise ops — more memory than full remat, fewer recomputed
    #   FLOPs); None = save nothing (full recompute)
    moe_experts: int = 0  # >0 replaces every layer's dense MLP with a
    #   top-k routed Mixture-of-Experts SwiGLU (models/moe.py); expert
    #   weights shard over the mesh "expert" axis (expert parallelism)
    moe_top_k: int = 2
    moe_capacity: float = 2.0  # expert buffer = ceil(top_k*T*cap/E)
    moe_impl: str = "einsum"  # "einsum": GShard dense-dispatch einsums
    #   (what XLA's SPMD partitioner turns into expert-parallel
    #   all-to-alls; capacity drops apply). "ragged": DROPLESS
    #   sorted-gather + lax.ragged_dot grouped matmuls — exactly the
    #   activated FLOPs, for single-chip / data-parallel meshes
    #   (models/moe.ragged_moe)
    moe_group: int = 0  # >0: TRAINING routes in groups of this many
    #   tokens (GShard groups) — capacity binds per group, so the
    #   dispatch/combine tensors are O(T * top_k*group*cap) instead of
    #   O(top_k * T^2); required for training-scale sequences. 0 keeps
    #   whole-row routing (fine for short rows and all inference paths)
    moe_kernel: str = "xla"  # grouped-matmul backend for moe_impl=
    #   "ragged": "xla" = lax.ragged_dot (measured 87 TFLOP/s at bench
    #   shapes vs 142 for same-FLOPs dense — docs/profiles/moe_train.md);
    #   "pallas" = the megablox Pallas grouped-matmul kernel (MXU-tiled,
    #   group boundaries masked in-kernel). Same math, same dropless
    #   semantics; numerics differ at bf16 accumulation order only.

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _dots_and_flash_policy(prim, *args, **params):
    """`dots_with_no_batch_dims_saveable` PLUS the flash-attention fwd
    products. The attention custom VJPs differentiate through a
    `remat_opt` primitive (ops/attention.py defvjp(optimize_remat=True))
    whose outputs are (o, lse); saving them means the remat backward
    re-runs only elementwise ops — never a matmul OR a forward attention
    kernel. Costs one bf16 [B, S, D] + f32 [B, H, S] per attention layer
    (~34 MB/LLM layer at the bench shapes) and removes the second fwd
    kernel launch per layer (~15 ms/step of the 312 ms bench step)."""
    if prim is not None and getattr(prim, "name", "") == "remat_opt":
        return True
    return jax.checkpoint_policies.dots_with_no_batch_dims_saveable(
        prim, *args, **params)


def _remat_policy(cfg):
    """Resolve `cfg.remat_policy` (a `jax.checkpoint_policies` attribute
    name or the repo-composite "dots_and_flash_saveable", shared by
    LLMConfig and ViTConfig) to the policy callable; None/empty = save
    nothing (full per-layer recompute)."""
    name = getattr(cfg, "remat_policy", None)
    if not name:
        return None
    if name == "dots_and_flash_saveable":
        return _dots_and_flash_policy
    return getattr(jax.checkpoint_policies, name)


def rope_frequencies(head_dim: int, theta: float) -> jax.Array:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                            / head_dim))


def apply_rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x: [B, H, T, D]; positions: [B, T] (int)."""
    freqs = rope_frequencies(x.shape[-1], theta)            # [D/2]
    angles = positions[:, None, :, None].astype(jnp.float32) * freqs  # [B,1,T,D/2]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return rotated.astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(x.dtype)


def apply_lora_delta(x, lora, name, out_shape, dtype):
    """Per-row batched LoRA delta for serving (parallel/lora_serving):
    `lora` carries stacked adapters `{name: (A [N, fan_in, r],
    B [N, r, fan_out])}`, a per-row adapter index `idx [B]`, and the
    alpha/rank scale; rows select their adapter by gather, so one batch
    mixes adapters freely (index 0 is the zero base adapter). Returns
    the delta reshaped to `[B, T, *out_shape]`, or None when `name` has
    no adapter."""
    if lora is None or name not in lora["tables"]:
        return None
    a_stack, b_stack = lora["tables"][name]
    a = a_stack[lora["idx"]]                    # [B, fan_in, r]
    b = b_stack[lora["idx"]]                    # [B, r, fan_out]
    xa = jnp.einsum("btd,bdr->btr", x.astype(jnp.float32), a)
    d = jnp.einsum("btr,bro->bto", xa, b) * lora["scale"]
    return d.reshape(x.shape[:2] + out_shape).astype(dtype)


class Attention(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x, positions, attn_valid=None, cache=None,
                 segment_ids=None, lora=None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        b, t, _ = x.shape
        hd = cfg.head_dim

        wq = nn.DenseGeneral((cfg.num_heads, hd), axis=-1, use_bias=False,
                             dtype=dtype, name="wq")
        wk = nn.DenseGeneral((cfg.num_kv_heads, hd), axis=-1, use_bias=False,
                             dtype=dtype, name="wk")
        wv = nn.DenseGeneral((cfg.num_kv_heads, hd), axis=-1, use_bias=False,
                             dtype=dtype, name="wv")
        wo = nn.DenseGeneral(cfg.hidden_size, axis=(-2, -1), use_bias=False,
                             dtype=dtype, name="wo")

        def wo_proj(o):                     # o: [B, T, H, hd]
            y = wo(o)
            d = apply_lora_delta(
                o.reshape(o.shape[0], o.shape[1], -1), lora, "wo",
                (cfg.hidden_size,), dtype)
            return y if d is None else y + d

        q, k, v = wq(x), wk(x), wv(x)
        if lora is not None:
            for name, ref in (("wq", q), ("wk", k), ("wv", v)):
                d = apply_lora_delta(x, lora, name, ref.shape[2:], dtype)
                if d is not None:
                    if name == "wq":
                        q = q + d
                    elif name == "wk":
                        k = k + d
                    else:
                        v = v + d
        q = q.transpose(0, 2, 1, 3)         # [B, H, T, hd]
        k = k.transpose(0, 2, 1, 3)         # [B, KVH, T, hd]
        v = v.transpose(0, 2, 1, 3)

        q = apply_rope(q, positions, cfg.rope_theta)
        k = apply_rope(k, positions, cfg.rope_theta)

        new_cache = None
        if cache is not None and "k_pages" in cache:
            # Paged decode (models/paged_kv.py): each row writes its new
            # kv at the (page, offset) of its logical position, then
            # attends over its gathered page window. t == 1 is the plain
            # decode step (Pallas kernel when shapes allow); t > 1 is the
            # speculative verify chain — t rows land at consecutive
            # logical positions and the window attention below masks each
            # q row at its own position (the host guarantees page
            # coverage through position index + t - 1).
            idx = jnp.asarray(cache["index"], dtype=jnp.int32)   # [B]
            pt = cache["page_table"]                             # [B, PPS]
            ps = cache["k_pages"].shape[2]
            quant = "k_scale" in cache     # int8 pools + per-row scales
            from ..ops.paged_attention import (
                paged_decode_attention, paged_kernel_ok, quantize_kv_rows,
            )

            if t == 1 and paged_kernel_ok(q, cache["k_pages"]):
                # Pallas kernel: the new kv row is landed by the kernel
                # itself (pools aliased in place — an XLA-side scatter
                # makes XLA relayout-copy the full pools around the
                # kernel call every step) and the page copies stream only
                # the slot's live pages — no materialized window gather.
                new_cache = {"page_table": pt, "index": idx + 1}
                if quant:
                    (out, new_cache["k_pages"], new_cache["v_pages"],
                     new_cache["k_scale"], new_cache["v_scale"]) = \
                        paged_decode_attention(
                            q, cache["k_pages"], cache["v_pages"], pt,
                            idx, k_new=k[:, :, 0, :], v_new=v[:, :, 0, :],
                            k_scale=cache["k_scale"],
                            v_scale=cache["v_scale"])
                else:
                    (out, new_cache["k_pages"],
                     new_cache["v_pages"]) = paged_decode_attention(
                        q, cache["k_pages"], cache["v_pages"], pt, idx,
                        k_new=k[:, :, 0, :], v_new=v[:, :, 0, :])
                out = out.transpose(0, 2, 1, 3)
                return wo_proj(out), new_cache
            logical = idx[:, None] + jnp.arange(t)               # [B, t]
            pages = jnp.take_along_axis(pt, logical // ps, axis=1)
            off = logical % ps
            # advanced-index dims land first: [B, t, KVH(, hd)] targets
            k_rows = k.transpose(0, 2, 1, 3)      # [B, t, KVH, hd]
            v_rows = v.transpose(0, 2, 1, 3)
            new_cache = {"page_table": pt, "index": idx + t}
            if quant:
                k_rows, ks_rows = quantize_kv_rows(k_rows)
                v_rows, vs_rows = quantize_kv_rows(v_rows)
                ks = cache["k_scale"].at[pages, :, off].set(ks_rows)
                vs = cache["v_scale"].at[pages, :, off].set(vs_rows)
                new_cache["k_scale"], new_cache["v_scale"] = ks, vs
            kp = cache["k_pages"].at[pages, :, off, :].set(k_rows)
            vp = cache["v_pages"].at[pages, :, off, :].set(v_rows)
            new_cache["k_pages"], new_cache["v_pages"] = kp, vp
            kw = kp[pt]                       # [B, PPS, KVH, ps, hd]
            vw = vp[pt]
            if quant:                         # dequantize the windows
                kw = kw.astype(jnp.float32) * ks[pt][..., None]
                vw = vw.astype(jnp.float32) * vs[pt][..., None]
                kw, vw = kw.astype(q.dtype), vw.astype(q.dtype)
            win = kw.shape[1] * kw.shape[3]
            k = kw.transpose(0, 2, 1, 3, 4).reshape(b, kw.shape[2], win, hd)
            v = vw.transpose(0, 2, 1, 3, 4).reshape(b, vw.shape[2], win, hd)
        elif cache is not None:
            # decode: append at cache["index"] — a scalar (all rows share a
            # position) or a [B] array (batched serving with per-row
            # prompt lengths; each row writes at its own slot).
            k_new, v_new = k, v            # fresh prompt kv (prefill path)
            idx = jnp.asarray(cache["index"], dtype=jnp.int32)
            zero = jnp.zeros((), dtype=jnp.int32)
            if idx.ndim == 0:
                ck = jax.lax.dynamic_update_slice(
                    cache["k"], k, (zero, zero, idx, zero))
                cv = jax.lax.dynamic_update_slice(
                    cache["v"], v, (zero, zero, idx, zero))
            else:
                row_update = jax.vmap(
                    lambda c, new, i: jax.lax.dynamic_update_slice(
                        c, new, (zero, i, zero)))
                ck = row_update(cache["k"], k, idx)
                cv = row_update(cache["v"], v, idx)
            new_cache = {"k": ck, "v": cv, "index": idx + t}
            k, v = ck, cv

        if cache is None:
            # GQA kv stay at num_kv_heads: the Pallas kernels map q heads
            # to their group row natively, and reference_attention's
            # in-call repeat is a broadcast XLA fuses (its VJP performs
            # the group sum for dk/dv). `segment_ids` (packed training,
            # models/data.pack_samples) makes the mask block-diagonal.
            from ..ops.ring_attention import active_ring_mesh

            ring_mesh = active_ring_mesh()
            if ring_mesh is not None and attn_valid is None \
                    and segment_ids is None:
                # sequence/context parallelism: the train step's mesh has
                # a "seq" axis — attention runs blockwise with kv rotating
                # over the ring (ops/ring_attention; shard_map composes
                # under the enclosing pjit)
                from ..ops.ring_attention import ring_attention

                out = ring_attention(q, k, v, ring_mesh)
            elif cfg.use_flash_attention and attn_valid is None:
                if segment_ids is None:
                    from ..ops.attention import trainable_flash_attention

                    out = trainable_flash_attention(q, k, v, True)
                else:
                    from ..ops.attention import (
                        trainable_flash_attention_packed,
                    )

                    out = trainable_flash_attention_packed(
                        q, k, v, segment_ids, True)
            else:
                out = reference_attention(q, k, v, causal=True,
                                          key_valid=attn_valid,
                                          segment_ids=segment_ids)
        elif t > 1 and jnp.ndim(cache["index"]) == 0:
            # prompt prefill (cache index starts at 0 as a SCALAR; both
            # prefill entry points guarantee it): attend causally within
            # the fresh prompt kv instead of the masked full-cache einsum
            # — flash on TPU, and even the XLA fallback works over t keys
            # rather than max_len. Right padding + causal means logits at
            # real positions are unaffected by pad rows, whose logits the
            # caller discards (cache index rewinds to true_length).
            # Multi-token apply with a PER-ROW [B] index instead falls
            # through to the chunked-decode branch below, which attends
            # over the filled cache prefix — the speculative-verify
            # chain (models/generate.speculative_generate) depends on
            # that distinction.
            if cfg.use_flash_attention:
                from ..ops.attention import trainable_flash_attention

                out = trainable_flash_attention(q, k_new, v_new, True)
            else:
                out = reference_attention(q, k_new, v_new, causal=True)
        else:
            # decode: attend over the filled prefix only (per row when the
            # cache index is a [B] array). GQA stays grouped: q is viewed
            # as [B, KVH, rep, t, hd] so XLA batches the matmuls per kv
            # group instead of materializing a repeated [B, H, L, hd]
            # cache view every step.
            kvh = cfg.num_kv_heads
            rep = cfg.num_heads // kvh
            qg = q.reshape(b, kvh, rep, t, hd)
            s = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k).astype(jnp.float32)
            s = s * (hd ** -0.5)
            kv_len = k.shape[2]
            key_pos = jnp.arange(kv_len)
            idx = jnp.asarray(cache["index"], dtype=jnp.int32)
            if idx.ndim == 0:
                valid = key_pos[None, None, None, None, :] <= \
                    (idx + jnp.arange(t))[None, None, None, :, None]
            else:
                cur = idx[:, None] + jnp.arange(t)              # [B, t]
                valid = key_pos[None, None, None, None, :] <= \
                    cur[:, None, None, :, None]
            s = jnp.where(valid, s, -1e30)
            p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
            out = jnp.einsum("bgrqk,bgkd->bgrqd", p, v).reshape(
                b, cfg.num_heads, t, hd)

        out = out.transpose(0, 2, 1, 3)      # [B, T, H, hd]
        return wo_proj(out), new_cache


class MLP(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x, lora=None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)

        def dense(name, width, xin):
            y = nn.Dense(width, use_bias=False, dtype=dtype, name=name)(xin)
            d = apply_lora_delta(xin, lora, name, (width,), dtype)
            return y if d is None else y + d

        gate = dense("gate", cfg.ffn_size, x)
        up = dense("up", cfg.ffn_size, x)
        return dense("down", cfg.hidden_size, nn.silu(gate) * up)


class DecoderLayer(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x, positions, attn_valid=None, cache=None,
                 segment_ids=None, lora=None):
        attn_out, new_cache = Attention(self.cfg, name="attn")(
            RMSNorm(self.cfg.norm_eps, name="attn_norm")(x),
            positions, attn_valid=attn_valid, cache=cache,
            segment_ids=segment_ids, lora=lora)
        x = x + attn_out
        if self.cfg.moe_experts > 0:
            from .moe import MoEMLP
            # pads (segment_ids == 0) must not consume expert capacity
            # or bias the aux loss; a live kv cache marks inference
            # (no-drop capacity for short chunks — see models/moe.py)
            valid = None if segment_ids is None else segment_ids != 0
            mlp_out = MoEMLP(self.cfg, name="moe")(
                RMSNorm(self.cfg.norm_eps, name="mlp_norm")(x),
                lora=lora, valid=valid, inference=cache is not None)
        else:
            mlp_out = MLP(self.cfg, name="mlp")(
                RMSNorm(self.cfg.norm_eps, name="mlp_norm")(x),
                lora=lora)
        x = x + mlp_out
        return x, new_cache


class DecoderLM(nn.Module):
    """Token-in/logits-out decoder. `input_embeds` overrides the embedding
    lookup (used by the MLLM to splice vision tokens)."""

    cfg: LLMConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.embed_table = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                    dtype=dtype, name="embed")
        # remat: recompute each layer's activations in the backward
        # instead of saving them (decode-path applies take no grads, so
        # the checkpoint is inert there)
        layer_cls = (nn.remat(DecoderLayer, policy=_remat_policy(cfg))
                     if cfg.remat else DecoderLayer)
        self.layers = [layer_cls(cfg, name=f"layer_{i}")
                       for i in range(cfg.num_layers)]
        self.final_norm = RMSNorm(cfg.norm_eps, name="final_norm")
        self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False, dtype=dtype,
                                name="lm_head")

    def embed(self, input_ids):
        return self.embed_table(input_ids)

    def __call__(self, input_ids=None, input_embeds=None, positions=None,
                 attn_valid=None, caches=None, segment_ids=None,
                 lora=None):
        if input_embeds is None:
            input_embeds = self.embed_table(input_ids)
        b, t, _ = input_embeds.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(t), (b, t))

        x = input_embeds
        new_caches = []
        for i, layer in enumerate(self.layers):
            layer_cache = None if caches is None else caches[i]
            layer_lora = None
            if lora is not None and lora["layers"][i]:
                layer_lora = {"scale": lora["scale"], "idx": lora["idx"],
                              "tables": lora["layers"][i]}
            x, nc = layer(x, positions, attn_valid=attn_valid,
                          cache=layer_cache, segment_ids=segment_ids,
                          lora=layer_lora)
            new_caches.append(nc)
        x = self.final_norm(x)
        logits = self.lm_head(x)
        if caches is None:
            return logits
        return logits, new_caches


def init_cache(cfg: LLMConfig, batch: int, max_len: int):
    """Empty KV cache pytree for greedy decoding."""
    dtype = jnp.dtype(cfg.dtype)
    return [
        {"k": jnp.zeros((batch, cfg.num_kv_heads, max_len, cfg.head_dim),
                        dtype=dtype),
         "v": jnp.zeros((batch, cfg.num_kv_heads, max_len, cfg.head_dim),
                        dtype=dtype),
         "index": 0}
        for _ in range(cfg.num_layers)
    ]


def cross_entropy_sum(logits, labels, ignore_index: int = -100):
    """Masked next-token loss, UNNORMALIZED: returns (nll_sum,
    token_count). Accumulating these across microbatches and dividing
    once makes gradient accumulation exactly equal to the single-batch
    mean even when microbatches carry different numbers of real
    tokens (parallel/train.py accum_steps)."""
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask), jnp.sum(mask)


def cross_entropy_loss(logits, labels, ignore_index: int = -100):
    """Masked next-token loss. `labels` are already shifted by the caller."""
    nll_sum, count = cross_entropy_sum(logits, labels, ignore_index)
    return nll_sum / jnp.maximum(count, 1)
