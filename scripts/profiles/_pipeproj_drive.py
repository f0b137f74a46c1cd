"""Split-projection drive: pipelined vs sequential on real-scale scenes.

Measures the bench `split_projection_val` inner loop both ways on the
real chip — cross-scene pipelined (stages/frame_relations.
project_scenes_pipelined) vs the r4 sequential per-scene loop — and
projects both to the 312-scene val split. Run on TPU:

    timeout 1800 python scripts/profiles/_pipeproj_drive.py [n_scenes]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import multi_spatialmllm_tpu as msm
from multi_spatialmllm_tpu.core.synthetic import make_scene
from multi_spatialmllm_tpu.stages.frame_relations import (
    compute_scene_relations,
    project_scenes_pipelined,
)
from multi_spatialmllm_tpu.stages.visibility import (
    compute_scene_visibility_hybrid,
)

msm.enable_compilation_cache()
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3

scenes = [
    make_scene(scene_id=f"proj{i:04d}_00", seed=20 + i, n_images=296,
               n_background=200_000, n_objects=8, image_hw=(968, 1296),
               depth_hw=(480, 640), n_invalid_poses=0)
    for i in range(N)
]
print(f"{N} real-scale scenes built", flush=True)

# warmup: compile + tunnel heavy-transfer ramp
for _ in project_scenes_pipelined(scenes[:1], dtype=np.float32):
    pass
print("warmup done", flush=True)

for mode in ("sequential", "pipelined", "sequential", "pipelined"):
    t0 = time.perf_counter()
    if mode == "sequential":
        for s in scenes:
            v = compute_scene_visibility_hybrid(s)
            compute_scene_relations(s, vis=v, dtype=np.float32)
    else:
        for _ in project_scenes_pipelined(scenes, dtype=np.float32):
            pass
    dt = time.perf_counter() - t0
    per = dt / N
    print(f"{mode:10s}: {dt:6.1f}s total, {per:5.2f} s/scene, "
          f"val-split projection {per * 312 / 60:5.1f} min", flush=True)
