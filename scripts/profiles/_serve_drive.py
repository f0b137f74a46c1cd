"""TPU drive: end-to-end serving tokens/s — paged continuous batcher at
8 slots with the fused Pallas paged-decode kernel engaged (hd=128).

bench_1chip_config MLLM, realistic MultiSPA-shaped requests (one 448px
tile -> 256 vision tokens + text prompt), greedy decode. Reported rate =
total generated tokens / wall clock for the whole campaign, INCLUDING
prefills and the host loop — on the dev tunnel every dispatch pays
30-50 ms RTT, so this is a lower bound on a co-located host.

    python scripts/profiles/_serve_drive.py [n_requests max_new chunk]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import time

import jax
import jax.numpy as jnp
import numpy as np

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.paged_kv import (
    PagedBatcher,
    PagedConfig,
    make_serve_requests,
)

N_REQ, MAX_NEW, CHUNK = 16, 128, 32
if len(sys.argv) > 1:
    N_REQ, MAX_NEW, CHUNK = map(int, sys.argv[1:4])

print("backend:", jax.default_backend(), flush=True)
cfg = M.bench_1chip_config()
model = M.MultiFrameMLLM(cfg)
b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=512)
t0 = time.perf_counter()
params = jax.jit(model.init)(jax.random.key(0), b0["input_ids"],
                             b0["tiles"])
print(f"init: {time.perf_counter()-t0:.1f}s", flush=True)


def make_requests(n, seed=5):
    return make_serve_requests(cfg, n, seed)  # shared bench shapes


pcfg = PagedConfig(slots=8, page_size=64,
                   num_pages=8 * ((512 + MAX_NEW) // 64 + 1) + 17,
                   max_prompt_len=512, max_new_tokens=MAX_NEW,
                   chunk=CHUNK, length_bucket=128)
print(f"paged config: slots={pcfg.slots} pages={pcfg.num_pages} "
      f"chunk={CHUNK} max_new={MAX_NEW}", flush=True)

requests = make_requests(N_REQ)
# warm pass (compiles prefill buckets + decode chunk)
batcher = PagedBatcher(model, params, pcfg, pad_id=0, eos_id=2)
t0 = time.perf_counter()
warm = batcher.generate_all(requests[: pcfg.slots])
print(f"warm ({pcfg.slots} reqs): {time.perf_counter()-t0:.1f}s",
      flush=True)

best = 0.0
for it in range(2):
    batcher = PagedBatcher(model, params, pcfg, pad_id=0, eos_id=2)
    t0 = time.perf_counter()
    outs = batcher.generate_all(requests)
    dt = time.perf_counter() - t0
    n_tok = sum(len(o) for o in outs)
    rate = n_tok / dt
    print(f"pass {it}: {n_tok} tokens in {dt:.1f}s -> {rate:,.1f} tok/s",
          flush=True)
    best = max(best, rate)
print(f"BEST: {best:,.1f} tok/s", flush=True)
