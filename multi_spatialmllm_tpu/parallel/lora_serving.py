"""Multi-LoRA serving: per-request adapters over one shared base model.

The reference's main-paper training mode is LoRA over InternVL-2
(/root/reference/README.md:199); parallel/lora.py trains such adapters.
This module serves MANY of them concurrently (S-LoRA style): adapter
pairs are stacked into `[n_adapters + 1, fan_in, r]` / `[.., r, fan_out]`
tables (index 0 is an all-zero base adapter), every decode row gathers
its own adapter by index, and the unmerged delta
`y += scale * (x @ A[idx]) @ B[idx]` is applied at each adapted kernel
(models/llm.apply_lora_delta). One batch freely mixes requests on
different adapters and on the base model; the base weights are never
copied or re-merged.

Serving supports the LLM decoder targets (attention projections +
SwiGLU). ViT / lm_head adapters would change the vision-feature and
logit paths per row and are rejected here — merge those with
parallel/lora.merge_lora instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lora import LoRAConfig, _path_keys

_SERVING_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def stack_adapters(adapters: list, num_layers: int,
                   cfg: LoRAConfig) -> dict:
    """`[adapter_tree, ...]` (parallel/lora.init_lora structure, trained
    or exported) -> serving tables:

    `{"scale": alpha/rank, "layers": [ {target: (A [N+1, fan_in, r],
    B [N+1, r, fan_out])} per decoder layer ]}`

    Adapter i in the input list is served as index i + 1; index 0 is the
    zero adapter (the base model). All adapters must share one structure
    (same rank and targets); `cfg` must be the LoRAConfig the adapters
    were trained with — the tree carries the rank (checked below) but
    not alpha, so the scale cannot be inferred from the leaves.
    """
    if cfg is None:
        raise ValueError(
            "stack_adapters needs the adapters' LoRAConfig: the tree "
            "carries rank but not alpha, so a default would silently "
            "serve every adapter at the wrong scale")
    assert adapters, "need at least one adapter"
    layers: list[dict] = [dict() for _ in range(num_layers)]

    flats = [dict(
        (_path_keys(p), leaf)
        for p, leaf in jax.tree_util.tree_flatten_with_path(ad)[0])
        for ad in adapters]
    for i, f in enumerate(flats[1:], start=1):
        extra = set(f) - set(flats[0])
        if extra:
            raise ValueError(
                f"adapter {i} adapts targets absent from adapter 0 "
                f"(e.g. {'/'.join(sorted(extra)[0])}); all adapters "
                f"must share one structure")
    for keys in flats[0]:
        if keys[-1] not in ("a", "b"):
            continue
        if keys[-1] == "b":
            continue                    # handled with its "a" sibling
        target = keys[-3]               # .../<target>/kernel/a
        layer_key = next((k for k in keys if k.startswith("layer_")), None)
        if layer_key is None or "llm" not in keys \
                or target not in _SERVING_TARGETS:
            raise ValueError(
                f"multi-LoRA serving supports LLM decoder targets only; "
                f"got adapter at {'/'.join(keys)} — merge it with "
                f"parallel/lora.merge_lora instead")
        li = int(layer_key.split("_")[1])
        b_keys = keys[:-1] + ("b",)
        a0, b0 = flats[0][keys], flats[0][b_keys]
        if a0.shape[-1] != cfg.rank:
            raise ValueError(
                f"adapter rank {a0.shape[-1]} != cfg.rank {cfg.rank} "
                f"at {'/'.join(keys)} — pass the training LoRAConfig")
        a_stack = jnp.stack(
            [jnp.zeros_like(a0)] + [f[keys] for f in flats])
        b_stack = jnp.stack(
            [jnp.zeros_like(b0)] + [f[b_keys] for f in flats])
        layers[li][target] = (a_stack, b_stack)
    return {"scale": cfg.scale, "layers": layers}
