"""Drive weight-only int8 serving (models/quantize) end-to-end and time
the paged decode chunk with native-f32 vs int8 weights on the real TPU
backend (CPU fallback checks correctness only).

Timing through the axon tunnel: fetch a scalar per dispatch and take
the median over several chunks (block_until_ready does not reliably
block here)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

import multi_spatialmllm_tpu as msm

msm.enable_compilation_cache()

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.paged_kv import (
    PagedBatcher,
    bench_paged_config,
    make_serve_requests,
)
from multi_spatialmllm_tpu.models.quantize import (
    dequantize_weights,
    quantize_weights,
    tree_nbytes,
)

backend = jax.default_backend()
print("backend:", backend)

cfg = M.bench_1chip_config() if backend == "tpu" else M.tiny_config()
model = M.MultiFrameMLLM(cfg)
b0 = M.make_example_batch(cfg, batch=1, n_tiles=1,
                          seq_len=cfg.tokens_per_tile + 32)
params = jax.jit(model.init)(jax.random.key(0), b0["input_ids"],
                             b0["tiles"])
pq = quantize_weights(params)
print(f"weights: {tree_nbytes(params) / 2**20:.0f} MiB f32 -> "
      f"{tree_nbytes(pq) / 2**20:.0f} MiB int8 "
      f"({tree_nbytes(params) / tree_nbytes(pq):.2f}x)")

if backend == "tpu":
    pcfg = bench_paged_config()
else:
    from multi_spatialmllm_tpu.models.paged_kv import PagedConfig

    pcfg = PagedConfig(slots=2, page_size=64, num_pages=24,
                       max_prompt_len=512, max_new_tokens=6, chunk=2,
                       length_bucket=128)
reqs = make_serve_requests(cfg, 8 if backend == "tpu" else 3)


def run(p):
    b = PagedBatcher(model, p, pcfg, pad_id=0, eos_id=2)
    t0 = time.perf_counter()
    outs = b.generate_all(reqs)
    dt = time.perf_counter() - t0
    return outs, sum(len(o) for o in outs) / dt


o_q, tps_q = run(pq)
o_f, tps_f = run(dequantize_weights(pq))
for a, b_ in zip(o_q, o_f):
    np.testing.assert_array_equal(a, b_)
print("int8-weight tokens bit-equal to host-dequant oracle")
if backend == "tpu":
    # second pass each, warm programs
    _, tps_q = run(pq)
    _, tps_f = run(dequantize_weights(pq))
    print(f"serving tok/s: f32 weights {tps_f:,.0f} vs int8 weights "
          f"{tps_q:,.0f} ({tps_q / tps_f:.2f}x)")
print("PASS weight-only int8 drive on", backend)
