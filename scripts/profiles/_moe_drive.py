"""TPU drive: MoE MLLM train step — ms/step, tokens/s + MFU on the
real chip (closes the round-3 VERDICT's queued MoE measurement).

Measures bench_1chip_moe_config (the dense bench config with every
decoder MLP swapped for top-2-of-E routed MoE at the SAME total
parameter count — ffn 8192/E per expert) through
make_chained_train_step, and the dense bench_1chip_config back-to-back
for the apples-to-apples delta. MFU counts ACTIVATED-expert FLOPs only
(utils/flops.py: top_k experts + router; dense dispatch/combine
einsums excluded — Switch/GShard convention), so the MoE MFU is an
honest lower bound.

The (data x expert) sharded composition is validated functionally on
the virtual CPU mesh (tests/test_moe.py, dryrun_multichip); one real
chip can only measure the single-chip step. Run on the TPU backend:

    python scripts/profiles/_moe_drive.py [batch seq n_tiles chain]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import time

import jax

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.parallel.mesh import make_mesh
from multi_spatialmllm_tpu.parallel.train import (
    TrainConfig, init_train_state, make_chained_train_step,
)
from multi_spatialmllm_tpu.utils.flops import (
    device_peak_flops, mllm_train_flops,
)

_nums = [a for a in sys.argv[1:] if not a.startswith("-")]
_over = list(map(int, _nums[:4]))  # any prefix of the 4 overrides
B, S, TILES, CHAIN = _over + [4, 2048, 2, 8][len(_over):]

dev = jax.devices()[0]
print(f"backend: {jax.default_backend()} device: {dev.device_kind}",
      flush=True)
peak = device_peak_flops(dev)
print(f"peak bf16: {peak/1e12:.0f} TFLOP/s" if peak else "peak unknown",
      flush=True)

mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])


def drive(name, cfg):
    batch = M.make_example_batch(cfg, batch=B, n_tiles=TILES, seq_len=S)
    t0 = time.perf_counter()
    model, params, opt_state, tx = init_train_state(
        cfg, TrainConfig(warmup_steps=10), batch, mesh)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[{name}] init: {time.perf_counter()-t0:.1f}s, "
          f"{n_params/1e6:.0f}M params", flush=True)

    step = make_chained_train_step(model, tx, mesh, CHAIN)
    t0 = time.perf_counter()
    params, opt_state, losses = step(params, opt_state, batch)
    print(f"[{name}] compile+first chain: {time.perf_counter()-t0:.1f}s, "
          f"loss {float(losses[0]):.3f}", flush=True)

    flops_step = mllm_train_flops(cfg, B, S, TILES)
    tokens_step = B * S
    print(f"[{name}] model flops/step: {flops_step/1e12:.2f} TFLOP",
          flush=True)

    best = None
    for it in range(4):
        t0 = time.perf_counter()
        params, opt_state, losses = step(params, opt_state, batch)
        lo = float(losses[-1])  # fetch = sync through the tunnel
        per_step = (time.perf_counter() - t0) / CHAIN
        tps = tokens_step / per_step
        mfu = flops_step / per_step / peak if peak else float("nan")
        print(f"[{name}] chain {it}: {per_step*1e3:.1f} ms/step, "
              f"{tps:,.0f} tok/s, MFU {mfu*100:.1f}%, loss {lo:.3f}",
              flush=True)
        if best is None or per_step < best[0]:
            best = (per_step, tps, mfu)
    print(f"[{name}] BEST: {best[0]*1e3:.1f} ms/step, {best[1]:,.0f} "
          f"tok/s, MFU {best[2]*100:.1f}%", flush=True)
    return best


if "--pallas-only" in sys.argv:
    ragged = drive("moe ragged xla",
                   M.bench_1chip_moe_config(impl="ragged"))
    pallas = drive("moe ragged pallas",
                   M.bench_1chip_moe_config(impl="ragged",
                                            kernel="pallas"))
    print(f"SUMMARY: ragged xla {ragged[0]*1e3:.1f} ms/step "
          f"(MFU {ragged[2]*100:.1f}%) vs ragged pallas "
          f"{pallas[0]*1e3:.1f} ms/step (MFU {pallas[2]*100:.1f}%), "
          f"pallas/xla {pallas[0]/ragged[0]:.3f}", flush=True)
    sys.exit(0)

moe = drive("moe E=4 top2", M.bench_1chip_moe_config())
ragged = drive("moe ragged", M.bench_1chip_moe_config(impl="ragged"))
dense = drive("dense", M.bench_1chip_config())
print(f"SUMMARY: moe {moe[0]*1e3:.1f} ms/step (MFU {moe[2]*100:.1f}%), "
      f"ragged {ragged[0]*1e3:.1f} ms/step (MFU {ragged[2]*100:.1f}%) vs "
      f"dense {dense[0]*1e3:.1f} ms/step (MFU {dense[2]*100:.1f}%), "
      f"moe/dense step ratio {moe[0]/dense[0]:.2f}, "
      f"ragged/dense {ragged[0]/dense[0]:.2f}", flush=True)
