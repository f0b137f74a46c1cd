"""Drive weight-only int8 serving (models/quantize) end-to-end and time
the paged decode chunk with native-f32 vs int8 weights on the real TPU
backend (CPU fallback checks correctness only).

Oracle semantics (measured 2026-08-19): on CPU, in-jit dequant tokens
are BIT-equal to the host-dequant oracle (tests pin this). On TPU the
teacher-forcing forward is also bitwise equal, but the paged DECODE
program compiles to ULP-different numerics when its weight producers
are convert(int8)*scale (XLA picks different layouts/fusions for the
skinny decode matmuls) — per-token logprobs differ by ~3e-2, so a long
greedy continuation can flip an argmax near-tie and diverge from there
(probed: 32-token runs identical across 8 requests with max |dlogprob|
3.1e-2; 128-token runs diverged on 2 of 8 requests). On TPU this drive
therefore checks per-token LOGPROB closeness over the shared prefix of
each pair of continuations and reports the token-agreement fraction,
instead of asserting bit-equality.

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

import dataclasses as _dc

if backend == "tpu":
    pcfg = _dc.replace(bench_paged_config(), logprobs=True)
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
    lps = ([np.asarray(b.request_logprobs[i]) for i in range(len(reqs))]
           if pcfg.logprobs else None)
    return outs, sum(len(o) for o in outs) / dt, lps


o_q, tps_q, lp_q = run(pq)
o_f, tps_f, lp_f = run(dequantize_weights(pq))
if backend == "tpu":
    # ULP-different decode programs (module doc): require logprob
    # closeness over each pair's shared prefix, report agreement
    n_tok = n_same = 0
    for i, (a, b_) in enumerate(zip(o_q, o_f)):
        n = min(len(a), len(b_))
        agree = np.asarray(a[:n]) == np.asarray(b_[:n])
        j = int(agree.argmin()) if not agree.all() else n
        if j:
            d = np.max(np.abs(lp_q[i][:j] - lp_f[i][:j]))
            assert d < 0.1, (i, d)
        n_tok += n
        n_same += int(agree[:j].sum())
    print(f"token agreement {n_same}/{n_tok}; shared-prefix logprobs "
          f"within 0.1", flush=True)
else:
    for a, b_ in zip(o_q, o_f):
        np.testing.assert_array_equal(a, b_)
    print("int8-weight tokens bit-equal to host-dequant oracle",
          flush=True)
if backend == "tpu":
    # second pass each, warm programs
    _, tps_q, _ = run(pq)
    _, tps_f, _ = run(dequantize_weights(pq))
    print(f"serving tok/s: f32 weights {tps_f:,.0f} vs int8 weights "
          f"{tps_q:,.0f} ({tps_q / tps_f:.2f}x)", flush=True)
print("PASS weight-only int8 drive on", backend, flush=True)
