"""Pretrained-weight import: InternVL-2 HF safetensors -> flax params.

The reference trains by delegating to InternVL-2 with released HF
checkpoints (/root/reference/README.md:194-200, e.g. InternVL2-8B =
InternViT-300M-448px + internlm2_chat_7b). This module maps that
checkpoint family's parameter naming onto this repo's flax modules
(models/vit.py, models/mllm.py Projector, models/llm.py DecoderLM) so the
flagship can start from pretrained weights instead of scratch.

Layout translations (torch Linear stores [out, in]; flax Dense [in, out]):

* ViT `attn.qkv` packs q/k/v along the output dim -> DenseGeneral kernel
  `[D, 3, H, hd]`.
* InternViT layer scales `ls1`/`ls2` multiply the residual branch output;
  they are folded EXACTLY into the following projection's kernel+bias
  (diag(ls) @ W == scale columns), since this repo's ViT block has no
  separate layer-scale parameter.
* InternLM2 `attention.wqkv` packs GQA groups interleaved as
  [kv_head, (rep q heads, k, v), head_dim] along the output dim -> split
  into wq `[D, H, hd]` / wk, wv `[D, KVH, hd]`.
* `language_model.output` (tied or untied lm head) -> `lm_head/kernel`.

Use `convert_state_dict` on an in-memory dict, or
`load_internvl2_checkpoint` to stream one or more `.safetensors` shards
(each tensor cast to `param_dtype` at read time — an 8B checkpoint never
materializes in f32).
"""

from __future__ import annotations

import os
from typing import Iterable, Mapping

import numpy as np

from .llm import LLMConfig
from .mllm import MLLMConfig
from .vit import ViTConfig


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> flax Dense kernel [in, out]."""
    return np.ascontiguousarray(np.transpose(w))


def _convert_vit(state: Mapping[str, np.ndarray], cfg: ViTConfig) -> dict:
    D, H = cfg.hidden_size, cfg.num_heads
    hd = D // H
    p: dict = {}
    pre = "vision_model.embeddings."
    p["cls_token"] = np.asarray(state[pre + "class_embedding"]).reshape(
        1, 1, D)
    p["pos_embed"] = np.asarray(state[pre + "position_embedding"]).reshape(
        1, 1 + cfg.num_patches, D)
    # torch conv OIHW -> flax HWIO
    p["patch_embed"] = {
        "kernel": np.transpose(
            np.asarray(state[pre + "patch_embedding.weight"]), (2, 3, 1, 0)),
        "bias": np.asarray(state[pre + "patch_embedding.bias"]),
    }
    for i in range(cfg.num_layers):
        lp = f"vision_model.encoder.layers.{i}."
        blk: dict = {}
        blk["norm1"] = {"scale": state[lp + "norm1.weight"],
                        "bias": state[lp + "norm1.bias"]}
        blk["norm2"] = {"scale": state[lp + "norm2.weight"],
                        "bias": state[lp + "norm2.bias"]}
        qkv_w = _t(state[lp + "attn.qkv.weight"])       # [D, 3D]
        blk["qkv"] = {
            "kernel": qkv_w.reshape(D, 3, H, hd),
            "bias": np.asarray(state[lp + "attn.qkv.bias"]).reshape(3, H, hd),
        }
        # layer scale folds into the next linear (exact):
        #   ls * (a @ W^T + b) == a @ (diag(ls) W)^T + ls * b
        ls1 = np.asarray(state.get(lp + "ls1", np.ones(D)))
        proj_w = _t(state[lp + "attn.proj.weight"]) * ls1[None, :]  # [D, D]
        blk["proj"] = {
            "kernel": proj_w.reshape(H, hd, D),
            "bias": np.asarray(state[lp + "attn.proj.bias"]) * ls1,
        }
        blk["fc1"] = {"kernel": _t(state[lp + "mlp.fc1.weight"]),
                      "bias": state[lp + "mlp.fc1.bias"]}
        ls2 = np.asarray(state.get(lp + "ls2", np.ones(D)))
        blk["fc2"] = {
            "kernel": _t(state[lp + "mlp.fc2.weight"]) * ls2[None, :],
            "bias": np.asarray(state[lp + "mlp.fc2.bias"]) * ls2,
        }
        p[f"block_{i}"] = blk
    return p


def _split_wqkv(w: np.ndarray, cfg: LLMConfig):
    """InternLM2 packed GQA projection [ (rep+2)*KVH*hd, D ] ->
    (wq [D, H, hd], wk [D, KVH, hd], wv [D, KVH, hd])."""
    D, H, KVH = cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads
    hd, rep = cfg.head_dim, cfg.num_heads // cfg.num_kv_heads
    wt = _t(w).reshape(D, KVH, rep + 2, hd)
    wq = np.ascontiguousarray(wt[:, :, :rep].reshape(D, H, hd))
    wk = np.ascontiguousarray(wt[:, :, rep])
    wv = np.ascontiguousarray(wt[:, :, rep + 1])
    return wq, wk, wv


def _convert_llm(state: Mapping[str, np.ndarray], cfg: LLMConfig) -> dict:
    H, hd = cfg.num_heads, cfg.head_dim
    p: dict = {}
    p["embed"] = {
        "embedding": state["language_model.model.tok_embeddings.weight"]}
    for i in range(cfg.num_layers):
        lp = f"language_model.model.layers.{i}."
        wq, wk, wv = _split_wqkv(
            np.asarray(state[lp + "attention.wqkv.weight"]), cfg)
        layer = {
            "attn": {
                "wq": {"kernel": wq},
                "wk": {"kernel": wk},
                "wv": {"kernel": wv},
                "wo": {"kernel": _t(
                    state[lp + "attention.wo.weight"]).reshape(
                        H, hd, cfg.hidden_size)},
            },
            "attn_norm": {"scale": state[lp + "attention_norm.weight"]},
            "mlp": {
                "gate": {"kernel": _t(state[lp + "feed_forward.w1.weight"])},
                "up": {"kernel": _t(state[lp + "feed_forward.w3.weight"])},
                "down": {"kernel": _t(state[lp + "feed_forward.w2.weight"])},
            },
            "mlp_norm": {"scale": state[lp + "ffn_norm.weight"]},
        }
        p[f"layer_{i}"] = layer
    p["final_norm"] = {"scale": state["language_model.model.norm.weight"]}
    p["lm_head"] = {"kernel": _t(state["language_model.output.weight"])}
    return p


def _convert_projector(state: Mapping[str, np.ndarray]) -> dict:
    return {
        "norm": {"scale": state["mlp1.0.weight"],
                 "bias": state["mlp1.0.bias"]},
        "fc1": {"kernel": _t(state["mlp1.1.weight"]),
                "bias": state["mlp1.1.bias"]},
        "fc2": {"kernel": _t(state["mlp1.3.weight"]),
                "bias": state["mlp1.3.bias"]},
    }


def convert_state_dict(state: Mapping[str, np.ndarray],
                       cfg: MLLMConfig, param_dtype=np.float32) -> dict:
    """HF InternVL-2 state dict -> `{"params": ...}` for MultiFrameMLLM."""
    params = {
        "vision": _convert_vit(state, cfg.vit),
        "projector": _convert_projector(state),
        "llm": _convert_llm(state, cfg.llm),
    }
    import jax

    return {"params": jax.tree_util.tree_map(
        lambda a: np.asarray(a, dtype=param_dtype), params)}


def export_state_dict(params: dict, cfg: MLLMConfig) -> dict:
    """Inverse of :func:`convert_state_dict` (layer scales come back
    folded, i.e. ls1/ls2 are not re-materialized). Round-trip oracle for
    tests and a writer for sharing weights back in HF layout."""
    p = params["params"]
    D, H = cfg.vit.hidden_size, cfg.vit.num_heads
    hd = D // H
    state: dict = {}
    v = p["vision"]
    pre = "vision_model.embeddings."
    state[pre + "class_embedding"] = np.asarray(v["cls_token"])
    state[pre + "position_embedding"] = np.asarray(v["pos_embed"])
    state[pre + "patch_embedding.weight"] = np.transpose(
        np.asarray(v["patch_embed"]["kernel"]), (3, 2, 0, 1))
    state[pre + "patch_embedding.bias"] = np.asarray(
        v["patch_embed"]["bias"])
    for i in range(cfg.vit.num_layers):
        lp = f"vision_model.encoder.layers.{i}."
        blk = v[f"block_{i}"]
        state[lp + "norm1.weight"] = np.asarray(blk["norm1"]["scale"])
        state[lp + "norm1.bias"] = np.asarray(blk["norm1"]["bias"])
        state[lp + "norm2.weight"] = np.asarray(blk["norm2"]["scale"])
        state[lp + "norm2.bias"] = np.asarray(blk["norm2"]["bias"])
        state[lp + "attn.qkv.weight"] = _t(
            np.asarray(blk["qkv"]["kernel"]).reshape(D, 3 * D))
        state[lp + "attn.qkv.bias"] = np.asarray(
            blk["qkv"]["bias"]).reshape(3 * D)
        state[lp + "attn.proj.weight"] = _t(
            np.asarray(blk["proj"]["kernel"]).reshape(D, D))
        state[lp + "attn.proj.bias"] = np.asarray(blk["proj"]["bias"])
        state[lp + "mlp.fc1.weight"] = _t(np.asarray(blk["fc1"]["kernel"]))
        state[lp + "mlp.fc1.bias"] = np.asarray(blk["fc1"]["bias"])
        state[lp + "mlp.fc2.weight"] = _t(np.asarray(blk["fc2"]["kernel"]))
        state[lp + "mlp.fc2.bias"] = np.asarray(blk["fc2"]["bias"])
    pj = p["projector"]
    state["mlp1.0.weight"] = np.asarray(pj["norm"]["scale"])
    state["mlp1.0.bias"] = np.asarray(pj["norm"]["bias"])
    state["mlp1.1.weight"] = _t(np.asarray(pj["fc1"]["kernel"]))
    state["mlp1.1.bias"] = np.asarray(pj["fc1"]["bias"])
    state["mlp1.3.weight"] = _t(np.asarray(pj["fc2"]["kernel"]))
    state["mlp1.3.bias"] = np.asarray(pj["fc2"]["bias"])

    lc = cfg.llm
    llm = p["llm"]
    state["language_model.model.tok_embeddings.weight"] = np.asarray(
        llm["embed"]["embedding"])
    rep = lc.num_heads // lc.num_kv_heads
    for i in range(lc.num_layers):
        lp = f"language_model.model.layers.{i}."
        layer = llm[f"layer_{i}"]
        wq = np.asarray(layer["attn"]["wq"]["kernel"]).reshape(
            lc.hidden_size, lc.num_kv_heads, rep, lc.head_dim)
        wk = np.asarray(layer["attn"]["wk"]["kernel"])[:, :, None]
        wv = np.asarray(layer["attn"]["wv"]["kernel"])[:, :, None]
        packed = np.concatenate([wq, wk, wv], axis=2)  # [D, KVH, rep+2, hd]
        state[lp + "attention.wqkv.weight"] = _t(
            packed.reshape(lc.hidden_size, -1))
        state[lp + "attention.wo.weight"] = _t(
            np.asarray(layer["attn"]["wo"]["kernel"]).reshape(
                lc.num_heads * lc.head_dim, lc.hidden_size))
        state[lp + "feed_forward.w1.weight"] = _t(
            np.asarray(layer["mlp"]["gate"]["kernel"]))
        state[lp + "feed_forward.w3.weight"] = _t(
            np.asarray(layer["mlp"]["up"]["kernel"]))
        state[lp + "feed_forward.w2.weight"] = _t(
            np.asarray(layer["mlp"]["down"]["kernel"]))
        state[lp + "attention_norm.weight"] = np.asarray(
            layer["attn_norm"]["scale"])
        state[lp + "ffn_norm.weight"] = np.asarray(
            layer["mlp_norm"]["scale"])
    state["language_model.model.norm.weight"] = np.asarray(
        llm["final_norm"]["scale"])
    state["language_model.output.weight"] = _t(
        np.asarray(llm["lm_head"]["kernel"]))
    return state


def load_internvl2_checkpoint(
    path_or_paths: str | Iterable[str],
    cfg: MLLMConfig,
    param_dtype=np.float32,
) -> dict:
    """Stream safetensors shard(s) into a flax params pytree.

    `path_or_paths`: one `.safetensors` file, a list of shards, or a
    directory containing `*.safetensors`. Tensors are cast to
    `param_dtype` as they are read (use ml_dtypes.bfloat16 for the 8B
    flagship so the f32 copy never materializes).
    """
    from safetensors import safe_open

    if isinstance(path_or_paths, str) and os.path.isdir(path_or_paths):
        paths = sorted(
            os.path.join(path_or_paths, f)
            for f in os.listdir(path_or_paths)
            if f.endswith(".safetensors"))
    elif isinstance(path_or_paths, str):
        paths = [path_or_paths]
    else:
        paths = list(path_or_paths)
    assert paths, path_or_paths

    state: dict[str, np.ndarray] = {}
    for path in paths:
        with safe_open(path, framework="np") as f:
            for key in f.keys():
                state[key] = np.asarray(f.get_tensor(key), dtype=param_dtype)
    return convert_state_dict(state, cfg, param_dtype=param_dtype)


def make_fixture_state_dict(cfg: MLLMConfig, seed: int = 0,
                            with_layer_scale: bool = True) -> dict:
    """Random HF-layout state dict with the exact InternVL-2 shapes for
    `cfg` — the test fixture standing in for a real checkpoint download."""
    rng = np.random.default_rng(seed)
    vt, lc = cfg.vit, cfg.llm
    D = vt.hidden_size
    proj_in = vt.hidden_size * cfg.downsample ** 2

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    state = {
        "vision_model.embeddings.class_embedding": r(1, 1, D),
        "vision_model.embeddings.position_embedding":
            r(1, 1 + vt.num_patches, D),
        "vision_model.embeddings.patch_embedding.weight":
            r(D, 3, vt.patch_size, vt.patch_size),
        "vision_model.embeddings.patch_embedding.bias": r(D),
        "mlp1.0.weight": r(proj_in), "mlp1.0.bias": r(proj_in),
        "mlp1.1.weight": r(lc.hidden_size, proj_in),
        "mlp1.1.bias": r(lc.hidden_size),
        "mlp1.3.weight": r(lc.hidden_size, lc.hidden_size),
        "mlp1.3.bias": r(lc.hidden_size),
        "language_model.model.tok_embeddings.weight":
            r(lc.vocab_size, lc.hidden_size),
        "language_model.model.norm.weight": 1.0 + r(lc.hidden_size),
        "language_model.output.weight": r(lc.vocab_size, lc.hidden_size),
    }
    mlp_d = int(D * vt.mlp_ratio)
    for i in range(vt.num_layers):
        lp = f"vision_model.encoder.layers.{i}."
        state.update({
            lp + "norm1.weight": 1.0 + r(D), lp + "norm1.bias": r(D),
            lp + "norm2.weight": 1.0 + r(D), lp + "norm2.bias": r(D),
            lp + "attn.qkv.weight": r(3 * D, D),
            lp + "attn.qkv.bias": r(3 * D),
            lp + "attn.proj.weight": r(D, D),
            lp + "attn.proj.bias": r(D),
            lp + "mlp.fc1.weight": r(mlp_d, D),
            lp + "mlp.fc1.bias": r(mlp_d),
            lp + "mlp.fc2.weight": r(D, mlp_d),
            lp + "mlp.fc2.bias": r(D),
        })
        if with_layer_scale:
            state[lp + "ls1"] = 1.0 + r(D)
            state[lp + "ls2"] = 1.0 + r(D)
    qkv_out = (lc.num_heads // lc.num_kv_heads + 2) * \
        lc.num_kv_heads * lc.head_dim
    for i in range(lc.num_layers):
        lp = f"language_model.model.layers.{i}."
        state.update({
            lp + "attention.wqkv.weight": r(qkv_out, lc.hidden_size),
            lp + "attention.wo.weight":
                r(lc.hidden_size, lc.num_heads * lc.head_dim),
            lp + "feed_forward.w1.weight": r(lc.ffn_size, lc.hidden_size),
            lp + "feed_forward.w3.weight": r(lc.ffn_size, lc.hidden_size),
            lp + "feed_forward.w2.weight": r(lc.hidden_size, lc.ffn_size),
            lp + "attention_norm.weight": 1.0 + r(lc.hidden_size),
            lp + "ffn_norm.weight": 1.0 + r(lc.hidden_size),
        })
    return state
