"""Drive per-request sampling in the paged batcher (TPU when up; CPU
fallback). Verifies through the public package surface: sampled streams
over the paged pools are bit-identical to the contiguous
ContinuousBatcher's, temperature=0 stays exact greedy, and pool-pressure
preemption replays the same stream."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

import multi_spatialmllm_tpu as msm

msm.enable_compilation_cache()

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.paged_kv import PagedBatcher, PagedConfig
from multi_spatialmllm_tpu.models.serving import (
    ContinuousBatcher,
    SamplingParams,
    ServeConfig,
)

print("backend:", jax.default_backend())

cfg = M.tiny_config()
model = M.MultiFrameMLLM(cfg)
b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=32)
params = model.init(jax.random.key(0), b0["input_ids"], b0["tiles"])

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
sps = [SamplingParams(temperature=0.8, top_p=0.9, seed=7),
       SamplingParams(),
       SamplingParams(temperature=1.2, seed=41)]
tagged = [(*r, sp) for r, sp in zip(reqs, sps)]

pcfg = PagedConfig(slots=2, page_size=16, num_pages=64, max_prompt_len=128,
                   max_new_tokens=6, chunk=2, length_bucket=64,
                   sampling=True)
got = PagedBatcher(model, params, pcfg, pad_id=0,
                   eos_id=2).generate_all(tagged)
want = ContinuousBatcher(
    model, params,
    ServeConfig(slots=2, max_prompt_len=128, max_new_tokens=6, chunk=2,
                length_bucket=64, sampling=True),
    pad_id=0, eos_id=2).generate_all(tagged)
for g, w in zip(got, want):
    np.testing.assert_array_equal(g, w)
print("paged sampled == contiguous sampled:",
      [list(map(int, g)) for g in got])

greedy = PagedBatcher(
    model, params,
    PagedConfig(slots=2, page_size=16, num_pages=64, max_prompt_len=128,
                max_new_tokens=6, chunk=2, length_bucket=64),
    pad_id=0, eos_id=2).generate_all(reqs)
np.testing.assert_array_equal(got[1], greedy[1])
print("temperature=0 row bit-equal greedy")

tight = PagedBatcher(
    model, params,
    PagedConfig(slots=2, page_size=16, num_pages=10, max_prompt_len=64,
                max_new_tokens=6, chunk=2, length_bucket=64,
                sampling=True),
    pad_id=0, eos_id=2)
sp = SamplingParams(temperature=0.9, top_p=0.85, seed=13)
long_reqs = []
for n in (63, 62):
    ids = rq.integers(10, vocab, size=n).astype(np.int32)
    ids[1:1 + t_img] = cfg.img_context_id
    tiles = rq.standard_normal(
        (1, cfg.vit.image_size, cfg.vit.image_size, 3)).astype(np.float32)
    long_reqs.append((ids, tiles, sp))
pre = tight.generate_all(long_reqs)
ample = PagedBatcher(
    model, params,
    PagedConfig(slots=2, page_size=16, num_pages=64, max_prompt_len=64,
                max_new_tokens=6, chunk=2, length_bucket=64,
                sampling=True),
    pad_id=0, eos_id=2).generate_all(long_reqs)
for g, w in zip(pre, ample):
    np.testing.assert_array_equal(g, w)
print("preemption replays the same sampled stream")
print("PASS paged sampling drive on", jax.default_backend())
