"""Weight-only int8 quantization for serving.

The reference serves InternVL-2 at full weight precision (training and
eval delegate to the InternVL stack, /root/reference/README.md:194-200);
this module is a beyond-reference serving capability: model weights are
stored in HBM as int8 with per-output-channel f32 scales — 4x smaller
than the f32 checkpoints, 2x smaller than bf16 — so one chip can hold a
model 2-4x bigger, and complements the int8 paged KV cache
(models/paged_kv.PagedConfig(kv_dtype="int8")).

Design (TPU-first): quantization is a pure host-side tree transform
(`quantize_weights`) and dequantization happens INSIDE every jitted
program, via one central hook — `MultiFrameMLLM.apply` routes variables
through `maybe_dequantize` before flax binds them. XLA sees
`convert(int8) * scale` producers feeding each matmul and fuses or
hoists them; at rest the weights stay int8. Dequantized VALUES are
bit-identical to dequantizing on the host first (int8 -> f32 is exact,
one f32 multiply per element), so on CPU a batcher holding quantized
params produces EXACTLY the tokens of the same batcher holding
`dequantize_weights(params_q)` — the oracle the tests pin. On TPU the
teacher-forcing forward is also bitwise equal, but XLA compiles the
skinny DECODE matmuls to different layouts/fusions when their weight
producer is a convert — per-token logprobs shift ~3e-2, so very long
greedy continuations can flip an argmax near-tie and diverge (measured
2026-08-19: 0 flips in 8x32 tokens, 2 of 8 requests diverged by 128;
scripts/profiles/_wint8_drive.py checks shared-prefix logprob
closeness there). Same benignity class as prefix-cache resume
numerics — documented float tolerance, not bug.

A quantized leaf replaces the original array with the sub-tree
`{"w_int8": int8 [...], "w_scale": f32 [..., 1 x last]}` where the
scale is per-output-channel (the trailing axis of every flax kernel
here: Dense/DenseGeneral outputs, conv features). Norm scales, biases,
small tables, and the embedding table (a gather, not a matmul) are left
alone by the default filters.
"""

from __future__ import annotations

from collections.abc import Mapping

import jax.numpy as jnp
import numpy as np

_Q_KEYS = frozenset({"w_int8", "w_scale"})
_DEFAULT_SKIP = ("embed",)


def _is_qleaf(node) -> bool:
    return isinstance(node, Mapping) and set(node.keys()) == _Q_KEYS


def quantize_weights(params, min_size: int = 1 << 16,
                     skip: tuple = _DEFAULT_SKIP):
    """Quantize every float kernel with ndim >= 2 and >= min_size
    elements to int8 with per-output-channel symmetric scales; returns
    a tree of the SAME structure with those leaves replaced by
    `{"w_int8", "w_scale"}` sub-trees. `skip` path substrings exempt
    modules (default: the embedding table — it feeds a gather, and
    keeping it dense costs nothing at decode)."""

    def walk(node, path):
        if isinstance(node, Mapping):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        arr = np.asarray(node)
        if (arr.ndim < 2 or arr.size < min_size
                or not np.issubdtype(arr.dtype, np.floating)
                or any(s in p for s in skip for p in path)):
            return node
        w = arr.astype(np.float32)
        red = tuple(range(w.ndim - 1))
        s = np.max(np.abs(w), axis=red, keepdims=True) / 127.0
        s = np.maximum(s, np.finfo(np.float32).tiny)
        q = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
        return {"w_int8": jnp.asarray(q),
                "w_scale": jnp.asarray(s.astype(np.float32))}

    return walk(params, ())


def is_quantized(tree) -> bool:
    if _is_qleaf(tree):
        return True
    if isinstance(tree, Mapping):
        return any(is_quantized(v) for v in tree.values())
    return False


def maybe_dequantize(variables):
    """Identity for ordinary trees; expands every quantized leaf to
    `int8.astype(f32) * scale` (traced inside jit — the weights stay
    int8 in HBM, the convert feeds the consumer). Returns the input
    object unchanged when nothing is quantized, so unquantized paths
    pay only a structural scan at trace time."""
    found = [False]

    def walk(node):
        if _is_qleaf(node):
            found[0] = True
            return (node["w_int8"].astype(jnp.float32)
                    * node["w_scale"])
        if isinstance(node, Mapping):
            return {k: walk(v) for k, v in node.items()}
        return node

    out = walk(variables)
    return out if found[0] else variables


def dequantize_weights(params_q):
    """Host-visible dequantization (the bit-exact oracle for the in-jit
    path): same tree with every quantized leaf expanded to f32."""
    return maybe_dequantize(params_q)


def tree_nbytes(tree) -> int:
    import jax

    return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree))
