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

from ..models.llm import DecoderLayer, RMSNorm, cross_entropy_loss
from ..models.mllm import MLLMConfig, MultiFrameMLLM
from .pipeline_parallel import (
    PIPE_AXIS,
    pipeline_train_grads_full,
    stack_stage_params,
)


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

    layer = DecoderLayer(cfg.llm)

    def apply_layer(lp, x):
        # positions from the LOCAL activation shape: under a combined
        # (data, pipe) mesh the microbatch rows are sharded over "data",
        # so x's batch dim is mb / n_data here
        pos = jnp.broadcast_to(jnp.arange(x.shape[1]),
                               (x.shape[0], x.shape[1]))
        out, _ = layer.apply({"params": lp}, x, pos)
        return out

    norm = RMSNorm(cfg.llm.norm_eps)

    def head_loss(hp, x_mb, labels_mb):
        h = norm.apply({"params": hp["final_norm"]}, x_mb)
        # lm head: x @ kernel (Dense without bias)
        logits = h @ hp["lm_head"]["kernel"].astype(h.dtype)
        return cross_entropy_loss(logits[:, :-1], labels_mb[:, 1:])

    loss, stage_grads, head_grads, dx = pipeline_train_grads_full(
        stage_params, head_params, embeds, labels, mesh, apply_layer,
        head_loss)
    (pre_grads,) = pre_vjp(dx.astype(embeds.dtype))
    return loss, (pre_grads, stage_grads, head_grads)
