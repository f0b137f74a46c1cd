"""Verify int8 paged-KV serving end-to-end (TPU when up; CPU fallback).

Drives the public PagedBatcher surface with real MLLM requests (tiles +
IMG_CONTEXT prompts): int8-kv outputs must be invariant to slot count /
pool pressure, and the first token (computed by full-precision prefill)
must agree with the fp pool on every request.
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

print("backend:", jax.default_backend())

cfg = M.tiny_config()
model = M.MultiFrameMLLM(cfg)
b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=32)
params = model.init(jax.random.key(0), b0["input_ids"], b0["tiles"])

rq = np.random.default_rng(11)
vocab = cfg.llm.vocab_size
t_img = cfg.tokens_per_tile
requests = []
for n in (40, 18, 53, 27, 61):
    ids = rq.integers(10, vocab, size=n).astype(np.int32)
    ids[1:1 + t_img] = cfg.img_context_id
    tiles = rq.standard_normal(
        (1, cfg.vit.image_size, cfg.vit.image_size, 3)).astype(np.float32)
    requests.append((ids, tiles))


def run(kv_dtype, slots=3, num_pages=48):
    b = PagedBatcher(
        model, params,
        PagedConfig(slots=slots, page_size=16, num_pages=num_pages,
                    max_prompt_len=128, max_new_tokens=8, chunk=2,
                    length_bucket=64, kv_dtype=kv_dtype),
        pad_id=0, eos_id=2)
    return b.generate_all(list(requests))


fp = run("native")
q8 = run("int8")
q8_pressure = run("int8", slots=2, num_pages=14)

for a, p in zip(q8, q8_pressure):
    np.testing.assert_array_equal(a, p)
print("int8 outputs invariant to slots/pool pressure: OK")

first_match = sum(int(a[0] == f[0]) for a, f in zip(q8, fp))
print(f"first-token (prefill, fp) agreement: {first_match}/{len(fp)}")
assert first_match == len(fp)

agree = sum(int(np.array_equal(a, f)) for a, f in zip(q8, fp))
print(f"full-sequence agreement fp vs int8 (tiny random model): {agree}/{len(fp)}")
print("VERIFY OK")
