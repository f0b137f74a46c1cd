"""Pipeline-parallel training of the FULL multi-frame MLLM.

Composes the interleaved-1F1B decoder pipeline (pipeline_parallel.py)
with the rest of the model:

    preamble (replicated): vision encoder + projector + token embedding
        -> spliced activations per microbatch
    pipe (sharded over "pipe"): the decoder layer stack, 1F1B schedule
    head (computed at the last stage): final RMSNorm + lm head + masked
        next-token loss

Gradients flow end to end: the pipeline returns d(loss)/d(activations)
per microbatch, which chains into the preamble's VJP, plus pipe-sharded
layer grads and replicated head grads. The loss is the mean of
per-microbatch masked means (the standard PP decomposition; equal to the
global masked mean when microbatches carry equal supervised-token
counts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.llm import (
    DecoderLayer,
    LLMConfig,
    RMSNorm,
    apply_rope,
    cross_entropy_loss,
)
from ..ops.attention import reference_attention
from .pipeline_parallel import (
    MODEL_AXIS,
    PIPE_AXIS,
    pipeline_train_grads_full,
    stack_stage_params,
    tp_region_enter,
    tp_region_exit,
)
from ..models.mllm import MLLMConfig, MultiFrameMLLM


def split_params(params: dict, cfg: MLLMConfig, n_stages: int):
    """Full flax tree -> (preamble tree, [P, L/P] stage tree, head tree)."""
    p = params["params"]
    llm = p["llm"]
    layers = [llm[f"layer_{i}"] for i in range(cfg.llm.num_layers)]
    stage_params = stack_stage_params(layers, n_stages)
    head_params = {"final_norm": llm["final_norm"],
                   "lm_head": llm["lm_head"]}
    pre_params = {"vision": p["vision"], "projector": p["projector"],
                  "embed": llm["embed"]}
    return pre_params, stage_params, head_params


def merge_params(pre_params, stage_params, head_params,
                 cfg: MLLMConfig) -> dict:
    """Inverse of :func:`split_params` (e.g. after an optimizer update)."""
    n_stages = jax.tree_util.tree_leaves(stage_params)[0].shape[0]
    per_stage = cfg.llm.num_layers // n_stages
    llm = {"embed": pre_params["embed"],
           "final_norm": head_params["final_norm"],
           "lm_head": head_params["lm_head"]}
    for i in range(cfg.llm.num_layers):
        s, k = divmod(i, per_stage)
        llm[f"layer_{i}"] = jax.tree_util.tree_map(
            lambda l: l[s, k], stage_params)
    return {"params": {"vision": pre_params["vision"],
                       "projector": pre_params["projector"],
                       "llm": llm}}


def _rmsnorm(scale, x, eps):
    """models/llm.RMSNorm as a plain function (replicated across TP)."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    y = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    return (y * scale).astype(x.dtype)


def tp_decoder_layer(cfg: LLMConfig, lp, x, positions,
                     axis: str = MODEL_AXIS):
    """One decoder layer with its head/ffn dims sharded over `axis`
    (Megatron column/row parallelism), for use INSIDE a manual shard_map.

    `lp` holds the LOCAL shards: wq/wk/wv kernels `[D, H/n, hd]`, wo
    `[H/n, hd, D]`, gate/up `[D, F/n]`, down `[F/n, D]`; norms
    replicated. Activations stay replicated over `axis`: the f operator
    (:func:`tp_region_enter`) sits after each norm, the g operator
    (:func:`tp_region_exit`) completes each row-parallel partial sum
    before the residual add — grads of the sharded weights come out
    per-shard, norm grads replicated-consistent. Numerically identical
    to `DecoderLayer` (same einsum contractions, up to reassociation of
    the head/ffn sums). Mirrors `models/llm.Attention` minus the
    cache/ring/packed paths (pipeline TP is a training-step feature)."""
    dtype = jnp.dtype(cfg.dtype)
    hd = cfg.head_dim

    h = _rmsnorm(lp["attn_norm"]["scale"], x, cfg.norm_eps)
    h = tp_region_enter(h, axis).astype(dtype)
    ap = lp["attn"]
    q = jnp.einsum("btd,dhk->bhtk", h, ap["wq"]["kernel"].astype(dtype))
    k = jnp.einsum("btd,dhk->bhtk", h, ap["wk"]["kernel"].astype(dtype))
    v = jnp.einsum("btd,dhk->bhtk", h, ap["wv"]["kernel"].astype(dtype))
    q = apply_rope(q, positions, cfg.rope_theta)
    k = apply_rope(k, positions, cfg.rope_theta)
    if cfg.use_flash_attention:
        from ..ops.attention import trainable_flash_attention

        out = trainable_flash_attention(q, k, v, True)
    else:
        out = reference_attention(q, k, v, causal=True)
    a = jnp.einsum("bhtk,hkd->btd", out.astype(dtype),
                   ap["wo"]["kernel"].astype(dtype))
    x = x + tp_region_exit(a, axis)

    h = _rmsnorm(lp["mlp_norm"]["scale"], x, cfg.norm_eps)
    h = tp_region_enter(h, axis).astype(dtype)
    mp = lp["mlp"]
    gate = h @ mp["gate"]["kernel"].astype(dtype)
    up = h @ mp["up"]["kernel"].astype(dtype)
    m = (jax.nn.silu(gate) * up) @ mp["down"]["kernel"].astype(dtype)
    return x + tp_region_exit(m, axis)


def tp_stage_param_specs(stage_params):
    """PartitionSpecs for `[P, L/P]`-stacked decoder stage params with
    head/ffn dims sharded over "model" (pipe stays the leading dim)."""
    def spec(path, leaf):
        keys = {k.key for k in path
                if isinstance(k, jax.tree_util.DictKey)}
        if keys & {"wq", "wk", "wv"}:       # [P, L, D, H, hd]
            return P(PIPE_AXIS, None, None, MODEL_AXIS, None)
        if "wo" in keys:                     # [P, L, H, hd, D]
            return P(PIPE_AXIS, None, MODEL_AXIS, None, None)
        if keys & {"gate", "up"}:            # [P, L, D, F]
            return P(PIPE_AXIS, None, None, MODEL_AXIS)
        if "down" in keys:                   # [P, L, F, D]
            return P(PIPE_AXIS, None, MODEL_AXIS, None)
        return P(PIPE_AXIS)                  # norm scales [P, L, D]
    return jax.tree_util.tree_map_with_path(spec, stage_params)


def mllm_pipeline_loss_and_grads(
    model: MultiFrameMLLM,
    params: dict,
    batch: dict,
    mesh,
    n_micro: int,
):
    """Loss + full-model grads with the decoder stack pipelined.

    `batch`: the usual dict of `input_ids [B, T]`, `tiles`, `labels`
    with `B` divisible by `n_micro`. Returns
    `(loss, (pre_grads, stage_grads, head_grads))` — stage grads stay
    pipe-sharded (the optimizer layout), the rest replicated.
    """
    cfg = model.cfg
    n_stages = mesh.shape[PIPE_AXIS]
    b, t = batch["input_ids"].shape
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro

    ids = batch["input_ids"].reshape(n_micro, mb, t)
    tiles = batch["tiles"].reshape((n_micro, mb) + batch["tiles"].shape[1:])
    labels = batch["labels"].reshape(n_micro, mb, t)

    pre_params, stage_params, head_params = split_params(
        params, cfg, n_stages)
    rest = params["params"]  # layer/head params closed over (no grads)

    def preamble(pre_p):
        full = {"params": {
            "vision": pre_p["vision"],
            "projector": pre_p["projector"],
            "llm": {**rest["llm"], "embed": pre_p["embed"]},
        }}

        def one(ids_mb, tiles_mb):
            return model.apply(full, ids_mb, tiles_mb,
                               method=MultiFrameMLLM.spliced_embeds)

        return jax.vmap(one)(ids, tiles)  # [M, mb, T, D]

    embeds, pre_vjp = jax.vjp(preamble, pre_params)

    n_model = (mesh.shape[MODEL_AXIS]
               if MODEL_AXIS in mesh.axis_names else 1)
    if n_model > 1:
        # tensor-parallel stage bodies: explicit Megatron f/g collectives
        # over a manual "model" axis (partial-auto TP under the manual
        # pipe schedule crashes XLA's partitioner — ROADMAP gap #5)
        assert cfg.llm.num_heads % n_model == 0, (cfg.llm, n_model)
        assert cfg.llm.num_kv_heads % n_model == 0, (cfg.llm, n_model)
        assert cfg.llm.ffn_size % n_model == 0, (cfg.llm, n_model)

        def apply_layer(lp, x):
            pos = jnp.broadcast_to(jnp.arange(x.shape[1]),
                                   (x.shape[0], x.shape[1]))
            return tp_decoder_layer(cfg.llm, lp, x, pos)

        param_specs = tp_stage_param_specs(stage_params)
    else:
        layer = DecoderLayer(cfg.llm)

        def apply_layer(lp, x):
            # positions from the LOCAL activation shape: under a combined
            # (data, pipe) mesh the microbatch rows are sharded over
            # "data", so x's batch dim is mb / n_data here
            pos = jnp.broadcast_to(jnp.arange(x.shape[1]),
                                   (x.shape[0], x.shape[1]))
            out, _ = layer.apply({"params": lp}, x, pos)
            return out

        param_specs = None

    norm = RMSNorm(cfg.llm.norm_eps)

    def head_loss(hp, x_mb, labels_mb):
        h = norm.apply({"params": hp["final_norm"]}, x_mb)
        # lm head: x @ kernel (Dense without bias)
        logits = h @ hp["lm_head"]["kernel"].astype(h.dtype)
        return cross_entropy_loss(logits[:, :-1], labels_mb[:, 1:])

    loss, stage_grads, head_grads, dx = pipeline_train_grads_full(
        stage_params, head_params, embeds, labels, mesh, apply_layer,
        head_loss, param_specs=param_specs, manual_model=n_model > 1)
    (pre_grads,) = pre_vjp(dx.astype(embeds.dtype))
    return loss, (pre_grads, stage_grads, head_grads)
