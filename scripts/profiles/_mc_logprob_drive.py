"""Drive multiple-choice logprob scoring end-to-end through run_eval
(TPU when up; CPU fallback): MC records score by candidate logprob,
non-MC records free-decode, and the MC prediction equals the standalone
argmax of score_candidates."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

import multi_spatialmllm_tpu as msm

msm.enable_compilation_cache()

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.data import DataConfig
from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig
from multi_spatialmllm_tpu.models.runner import (
    EvalRunConfig,
    mc_candidates,
    run_eval,
    score_candidates,
)
from multi_spatialmllm_tpu.models.tokenizer import SpatialTokenizer

print("backend:", jax.default_backend())

tok = SpatialTokenizer()
cfg = M.tiny_config()
import dataclasses

cfg = dataclasses.replace(cfg,
                          llm=dataclasses.replace(
                              cfg.llm, vocab_size=tok.vocab_size),
                          img_context_id=tok.img_context_id)
model = M.MultiFrameMLLM(cfg)
b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
params = model.init(jax.random.key(0), b0["input_ids"], b0["tiles"])

rng = np.random.default_rng(3)
img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
samples = [
    {"id": "a", "image": ["s/0.jpg"],
     "text": "<image>\nHow deep is this point?",
     "question_type": "depth_estimation_coor", "gt_value": 1000},
    {"id": "m", "image": ["s/1.jpg"],
     "text": "<image>\nWhich dot matches the reference?",
     "question_type": "visual_correspondence_multiple_choice",
     "gt_value": "B"},
]
run_cfg = EvalRunConfig(
    max_new_tokens=4, length_bucket=64, mc_logprob=True,
    data=DataConfig(preprocess=PreprocessConfig(
        tile_size=cfg.vit.image_size, max_tiles=1, resize_hw=None)))
report = run_eval(model, params, tok, samples, lambda p: img, run_cfg)
preds = report["predictions"]
assert len(preds) == 2 and preds[1] in ("A", "B", "C", "D"), preds
cands = mc_candidates(samples[1])
scores = score_candidates(model, params, tok, samples[1], cands,
                          lambda p: img, run_cfg)
assert preds[1] == cands[int(np.argmax(scores))], (preds, scores)
print("mc prediction:", preds[1], "scores:",
      [round(float(s), 3) for s in scores])
print("PASS mc-logprob eval drive on", jax.default_backend())
