"""Warm the persistent compilation cache for bench.py's stage shapes."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import multi_spatialmllm_tpu
multi_spatialmllm_tpu.enable_compilation_cache()
import numpy as np
from multi_spatialmllm_tpu.core.synthetic import make_scene
from multi_spatialmllm_tpu.stages.visibility import compute_scene_visibility
from multi_spatialmllm_tpu.stages.frame_relations import compute_scene_relations

t0 = time.time()
s = make_scene(scene_id="warm0000_00", seed=1, n_images=96,
               n_background=4000, n_objects=4, n_invalid_poses=0)
print("scene", round(time.time() - t0, 1), flush=True)
vis = compute_scene_visibility(s, dtype=np.float32)
print("visibility f32 cached", round(time.time() - t0, 1), flush=True)
rel = compute_scene_relations(s, vis=vis, dtype=np.float32)
print("relations f32 cached", round(time.time() - t0, 1), flush=True)
vis64 = compute_scene_visibility(s, dtype=np.float64)
print("visibility f64 cached", round(time.time() - t0, 1), flush=True)
rel64 = compute_scene_relations(s, vis=vis64, dtype=np.float64)
print("relations f64 cached", round(time.time() - t0, 1), flush=True)
