"""Real-TPU compile pre-flight for every Pallas kernel variant.

Interpret-mode tests CANNOT catch Mosaic layout/lowering rejections: the
round-3 bench capture died on an int8 paged-decode kernel whose shapes
had never been compiled on a real chip (`tpu.reshape vector<8x2x64xf32>
-> vector<8x1x128xf32>: unsupported shape cast`, then a 64-lane scale
DMA misalignment behind it). This script compiles + executes each
kernel at the EXACT bench/flagship shapes in one short run.

Run it after ANY kernel edit and early every round:

    timeout 900 python scripts/preflight_kernels.py

Exit 0 = every variant compiled and ran on the real chip. Failures are
listed with one-line (truncated) errors and exit 1. Compiles persist in
the jax compilation cache, so a clean rerun is fast.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import multi_spatialmllm_tpu as msm  # noqa: E402

RESULTS: list[tuple[str, str, float]] = []


def check(name):
    def deco(fn):
        t0 = time.perf_counter()
        try:
            fn()
            RESULTS.append((name, "PASS", time.perf_counter() - t0))
            print(f"  PASS  {name}  ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report, don't die
            msg = "".join(traceback.format_exception_only(e)).strip()
            RESULTS.append((name, f"FAIL: {msg[:300]}",
                            time.perf_counter() - t0))
            print(f"  FAIL  {name}: {msg[:300]}", flush=True)
        return fn
    return deco


def _rand(shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype)


def _force(x):
    """Fetch a scalar — block_until_ready is unreliable over the tunnel."""
    return float(jnp.asarray(x, jnp.float32).sum())


def main() -> int:
    if jax.default_backend() != "tpu":
        print(f"preflight needs the real TPU backend, got "
              f"{jax.default_backend()!r} — run without JAX_PLATFORMS=cpu")
        return 2
    msm.enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"preflight on {dev} ...", flush=True)

    from multi_spatialmllm_tpu.ops.attention import (
        _kernel_ok, _resident_ok, trainable_flash_attention,
        trainable_flash_attention_packed)
    from multi_spatialmllm_tpu.ops.paged_attention import (
        paged_decode_attention, paged_kernel_ok, quantize_kv_rows)
    from multi_spatialmllm_tpu.models.paged_kv import bench_paged_config

    # ---- flash attention: bench_1chip LLM shape (resident, causal GQA)
    # bench.py model_train: B=4, S=2048, H=16, KVH=8, hd=128, bf16
    def _flash_case(name, b, h, kvh, s, hd, causal, resident):
        q = _rand((b, h, s, hd))
        k = _rand((b, kvh, s, hd), seed=1)
        v = _rand((b, kvh, s, hd), seed=2)
        assert _kernel_ok(q, k), (name, "shape does not engage kernels")
        assert _resident_ok(q, k) == resident, (
            name, "resident/XL path selection drifted")

        @check(f"flash_{name}_fwd")
        def _fwd():
            _force(trainable_flash_attention(q, k, v, causal))

        @check(f"flash_{name}_grad")
        def _grad():
            f = jax.jit(jax.grad(
                lambda a, b_, c: trainable_flash_attention(
                    a, b_, c, causal).astype(jnp.float32).sum(),
                argnums=(0, 1, 2)))
            _force(f(q, k, v)[0])

    _flash_case("llm_bench_causal_gqa", 4, 16, 8, 2048, 128,
                causal=True, resident=True)
    # flagship decoder shape: S=8192, rep=4 -> XL streaming kernels
    _flash_case("llm_flagship_xl_gqa", 1, 32, 8, 8192, 128,
                causal=True, resident=False)

    # ---- packed segmented rows (SFT packing; incl. trailing-pad rows,
    # the r3 nondecreasing-invariant regression)
    def _segments(b, s, n_seg):
        seg = np.repeat(np.arange(1, n_seg + 1), s // n_seg)[None]
        seg = np.broadcast_to(seg, (b, s)).copy()
        seg[-1, -s // n_seg:] = 0  # trailing pad on the last row
        return jnp.asarray(seg, jnp.int32)

    qp = _rand((2, 16, 4096, 128))
    kp_ = _rand((2, 8, 4096, 128), seed=1)
    vp_ = _rand((2, 8, 4096, 128), seed=2)
    segs = _segments(2, 4096, 16)

    @check("flash_packed_fwd")
    def _packed_fwd():
        _force(trainable_flash_attention_packed(qp, kp_, vp_, segs, True))

    @check("flash_packed_grad")
    def _packed_grad():
        f = jax.jit(jax.grad(
            lambda a, b_, c: trainable_flash_attention_packed(
                a, b_, c, segs, True).astype(jnp.float32).sum(),
            argnums=(0, 1, 2)))
        _force(f(qp, kp_, vp_)[0])

    # ---- ViT non-causal segment kernel: bench_1chip encoder rows are
    # pad-extended 1025 -> 1152 tokens, hidden 1024 / 16 heads -> hd=64
    qv = _rand((2, 16, 1152, 64))
    kv_ = _rand((2, 16, 1152, 64), seed=1)
    vv = _rand((2, 16, 1152, 64), seed=2)
    vseg = jnp.asarray(
        np.where(np.arange(1152) < 1025, 1, 2)[None].repeat(2, 0),
        jnp.int32)

    @check("flash_vit_noncausal_fwd")
    def _vit_fwd():
        _force(trainable_flash_attention_packed(qv, kv_, vv, vseg, False))

    @check("flash_vit_noncausal_grad")
    def _vit_grad():
        f = jax.jit(jax.grad(
            lambda a, b_, c: trainable_flash_attention_packed(
                a, b_, c, vseg, False).astype(jnp.float32).sum(),
            argnums=(0, 1, 2)))
        _force(f(qv, kv_, vv)[0])

    # ---- paged decode kernel at the exact serving-bench pool shapes
    # (models/paged_kv.bench_paged_config: native ps=64/pps=10,
    # int8 ps=128/pps=5; bench_1chip decoder: H=16, KVH=8, hd=128)
    def _paged_case(kv_dtype):
        pcfg = bench_paged_config(kv_dtype=kv_dtype)
        B, H, KVH, hd = 8, 16, 8, 128
        ps, P = pcfg.page_size, pcfg.num_pages
        pps = pcfg.pages_per_slot
        rng = np.random.default_rng(0)
        q = _rand((B, H, 1, hd))
        kf = _rand((P, KVH, ps, hd), jnp.float32, seed=1)
        vf = _rand((P, KVH, ps, hd), jnp.float32, seed=2)
        pt = jnp.asarray(rng.integers(1, P, (B, pps)), jnp.int32)
        idx = jnp.asarray(rng.integers(0, ps * pps - 1, (B,)), jnp.int32)
        kn = _rand((B, KVH, hd), seed=3)
        vn = _rand((B, KVH, hd), seed=4)
        quant = kv_dtype == "int8"
        if quant:
            kpool, ksc = quantize_kv_rows(kf)
            vpool, vsc = quantize_kv_rows(vf)
        else:
            kpool, vpool = kf.astype(q.dtype), vf.astype(q.dtype)
            ksc = vsc = None
        assert paged_kernel_ok(q, kpool), (kv_dtype, "kernel gated off")

        @check(f"paged_decode_{kv_dtype}_read")
        def _read():
            _force(paged_decode_attention(
                q, kpool, vpool, pt, idx, k_scale=ksc, v_scale=vsc))

        @check(f"paged_decode_{kv_dtype}_fused_write")
        def _write():
            out = paged_decode_attention(
                q, kpool, vpool, pt, idx, k_new=kn, v_new=vn,
                k_scale=ksc, v_scale=vsc)
            _force(out[0])

    _paged_case("native")
    _paged_case("int8")

    # ---- megablox grouped matmul (moe_kernel="pallas") at the exact
    # ragged-MoE bench shapes (docs/profiles/moe_train.md: NK=16384
    # routed copies, D=F=2048, E=4) — fwd through the wi_gate shape and
    # grad through the full gmm VJP (transposed gmm + tgmm kernels)
    from multi_spatialmllm_tpu.models.moe import _grouped_dot

    nk_, d_, f_, e_ = 16384, 2048, 2048, 4
    xs_ = _rand((nk_, d_))
    wg_ = _rand((e_, d_, f_), seed=5)
    gs_ = jnp.array([4096, 4096, 4096, 4096], jnp.int32)

    @check("megablox_gmm_fwd")
    def _gmm_fwd():
        _force(jax.jit(lambda a, b_: _grouped_dot(
            a, b_, gs_, kernel="pallas"))(xs_, wg_))

    @check("megablox_gmm_grad")
    def _gmm_grad():
        f = jax.jit(jax.grad(
            lambda a, b_: _grouped_dot(
                a, b_, gs_, kernel="pallas").astype(jnp.float32).sum(),
            argnums=(0, 1)))
        _force(f(xs_, wg_)[0])

    # ring attention is pure XLA under shard_map (ops/ring_attention.py)
    # — no Mosaic lowering surface; covered by the CPU-mesh tests and
    # dryrun_multichip instead.

    fails = [r for r in RESULTS if r[1] != "PASS"]
    print(f"\npreflight: {len(RESULTS) - len(fails)}/{len(RESULTS)} "
          f"kernel variants green")
    for name, status, _ in fails:
        print(f"  {name}: {status}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
