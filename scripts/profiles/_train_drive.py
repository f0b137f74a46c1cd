"""TPU drive: full MLLM train step — tokens/s + MFU on the real chip.

Measures bench_1chip_config (the flagship-shaped ~700M single-v5e
config) through make_chained_train_step: N full steps (grad + AdamW +
param update) inside ONE jit, so the tunnel's 30-50 ms dispatch RTT
amortizes away. MFU uses the analytic model-FLOPs count
(utils/flops.py; remat recompute NOT counted) against the chip's bf16
peak. Run by hand on the TPU backend:

    python scripts/profiles/_train_drive.py [batch seq n_tiles chain]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import time

import jax
import jax.numpy as jnp

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.parallel.mesh import make_mesh
from multi_spatialmllm_tpu.parallel.train import (
    TrainConfig, init_train_state, make_chained_train_step,
)
from multi_spatialmllm_tpu.utils.flops import (
    device_peak_flops, mllm_train_flops,
)

B, S, TILES, CHAIN = 4, 2048, 2, 8
if len(sys.argv) > 1:
    B, S, TILES, CHAIN = map(int, sys.argv[1:5])

dev = jax.devices()[0]
print(f"backend: {jax.default_backend()} device: {dev.device_kind}",
      flush=True)
peak = device_peak_flops(dev)
print(f"peak bf16: {peak/1e12:.0f} TFLOP/s" if peak else "peak unknown",
      flush=True)

cfg = M.bench_1chip_config()
batch = M.make_example_batch(cfg, batch=B, n_tiles=TILES, seq_len=S)
mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])

t0 = time.perf_counter()
model, params, opt_state, tx = init_train_state(
    cfg, TrainConfig(warmup_steps=10), batch, mesh)
n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"init: {time.perf_counter()-t0:.1f}s, {n_params/1e6:.0f}M params",
      flush=True)

step = make_chained_train_step(model, tx, mesh, CHAIN)

t0 = time.perf_counter()
params, opt_state, losses = step(params, opt_state, batch)
first_loss = float(losses[0])
print(f"compile+first chain: {time.perf_counter()-t0:.1f}s, "
      f"loss {first_loss:.3f}", flush=True)

flops_step = mllm_train_flops(cfg, B, S, TILES)
tokens_step = B * S
print(f"model flops/step: {flops_step/1e12:.2f} TFLOP, "
      f"{tokens_step} tokens/step", flush=True)

best = None
for it in range(4):
    t0 = time.perf_counter()
    params, opt_state, losses = step(params, opt_state, batch)
    lo = float(losses[-1])  # fetch = sync
    dt = time.perf_counter() - t0
    per_step = dt / CHAIN
    tps = tokens_step / per_step
    mfu = flops_step / per_step / peak if peak else float("nan")
    print(f"chain {it}: {dt*1e3:.0f} ms total, {per_step*1e3:.1f} ms/step, "
          f"{tps:,.0f} tok/s, MFU {mfu*100:.1f}%, loss {lo:.3f}",
          flush=True)
    if best is None or per_step < best[0]:
        best = (per_step, tps, mfu)
print(f"BEST: {best[0]*1e3:.1f} ms/step, {best[1]:,.0f} tok/s, "
      f"MFU {best[2]*100:.1f}%", flush=True)
