"""TPU drive: train-step time vs remat policy on bench_1chip_config.

Full-layer remat recomputes each layer's whole forward in the backward
(+1 fwd of FLOPs on top of train's 3x fwd). Selective policies keep the
expensive matmul outputs and recompute only the cheap elementwise ops —
more activation HBM, fewer recomputed FLOPs. This drive measures the
actual step time (8-step chains in one jit, scalar-fetch timing) for
each policy that fits the chip, so bench_1chip_config can ship the
fastest one that fits.

    python scripts/profiles/_remat_drive.py [policy ...]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import dataclasses
import time

import jax

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.parallel.mesh import make_mesh
from multi_spatialmllm_tpu.parallel.train import (
    TrainConfig, init_train_state, make_chained_train_step,
)

POLICIES = sys.argv[1:] or [
    "",  # full remat (save nothing) — the shipped baseline
    "dots_with_no_batch_dims_saveable",
    "dots_saveable",
]
B, S, TILES, CHAIN = 4, 2048, 2, 8

print("backend:", jax.default_backend(), flush=True)
base = M.bench_1chip_config()
batch = M.make_example_batch(base, batch=B, n_tiles=TILES, seq_len=S)
mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])

for pol in POLICIES:
    p = pol or None
    cfg = M.MLLMConfig(
        vit=dataclasses.replace(base.vit, remat_policy=p),
        llm=dataclasses.replace(base.llm, remat_policy=p))
    tag = pol or "full-remat"
    try:
        t0 = time.perf_counter()
        model, params, opt_state, tx = init_train_state(
            cfg, TrainConfig(warmup_steps=10), batch, mesh)
        step = make_chained_train_step(model, tx, mesh, CHAIN)
        params, opt_state, losses = step(params, opt_state, batch)
        float(losses[-1])  # warm + compile
        print(f"{tag}: compiled+warm in {time.perf_counter()-t0:.0f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            params, opt_state, losses = step(params, opt_state, batch)
            _ = float(losses[-1])
            best = min(best, (time.perf_counter() - t0) / CHAIN)
        toks = B * S / best
        print(f"{tag}: {best*1e3:.1f} ms/step, {toks:,.0f} tok/s",
              flush=True)
    except Exception as e:  # OOM and friends: report, keep going
        print(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:200]})",
              flush=True)
    finally:
        for n in ("params", "opt_state", "step", "losses"):
            if n in dir():
                try:
                    del globals()[n]
                except KeyError:
                    pass
