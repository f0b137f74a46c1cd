"""Drive multi-LoRA paged serving end-to-end (TPU when up; CPU fallback).

Verifies through the public package surface: a PagedBatcher with two
stacked adapters serves a mixed base/ad_a/ad_b batch; each row must be
identical to serving that request alone, adapted rows must differ from
base, and base rows must be bit-equal to a no-adapter batcher.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

import multi_spatialmllm_tpu as msm

msm.enable_compilation_cache()

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.paged_kv import PagedBatcher, PagedConfig
from multi_spatialmllm_tpu.parallel.lora import LoRAConfig, init_lora

print("backend:", jax.default_backend())

cfg = M.tiny_config()
model = M.MultiFrameMLLM(cfg)
b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=32)
params = model.init(jax.random.key(0), b0["input_ids"], b0["tiles"])

lcfg = LoRAConfig(rank=4, alpha=8.0, targets=("wq", "wv", "wo", "down"))


def randomized(tree, seed):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    ks = jax.random.split(jax.random.key(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [0.3 * jax.random.normal(k, l.shape)
                  for k, l in zip(ks, leaves)])


adapters = {"ad_a": randomized(init_lora(params, lcfg, jax.random.key(1)), 2),
            "ad_b": randomized(init_lora(params, lcfg, jax.random.key(3)), 4)}

rq = np.random.default_rng(11)
vocab = cfg.llm.vocab_size
t_img = cfg.tokens_per_tile
reqs = []
for n in (40, 53, 61):
    ids = rq.integers(10, vocab, size=n).astype(np.int32)
    ids[1:1 + t_img] = cfg.img_context_id
    tiles = rq.standard_normal(
        (1, cfg.vit.image_size, cfg.vit.image_size, 3)).astype(np.float32)
    reqs.append((ids, tiles))
tagged = [reqs[0], (*reqs[1], "ad_a"), (*reqs[2], "ad_b")]

pcfg = PagedConfig(slots=2, page_size=16, num_pages=64, max_prompt_len=128,
                   max_new_tokens=6, chunk=2, length_bucket=64)


def run(requests):
    return PagedBatcher(model, params, pcfg, pad_id=0, eos_id=2,
                        adapters=adapters,
                        lora_config=lcfg).generate_all(requests)


mixed = run(tagged)
for i, r in enumerate(tagged):
    solo = run([r])
    np.testing.assert_array_equal(mixed[i], solo[0])
print("mixed == solo per row:", [list(map(int, m)) for m in mixed])

base_only = PagedBatcher(model, params, pcfg, pad_id=0,
                         eos_id=2).generate_all([reqs[0]])
np.testing.assert_array_equal(mixed[0], base_only[0])
print("base row bit-equal to no-adapter batcher")

adapted = run([(*reqs[0], "ad_a")])
assert not np.array_equal(adapted[0], base_only[0]), adapted
print("adapter changes output: OK")
print("PASS multi-LoRA paged serving drive on", jax.default_backend())
