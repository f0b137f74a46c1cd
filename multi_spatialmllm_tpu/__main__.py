"""Command-line interface: `python -m multi_spatialmllm_tpu <command>`.

One typed-config CLI replacing the reference's per-script argparse/globals
mix (SURVEY.md §5.6). Commands:

  demo            synthesize scenes and run the full pipeline end to end
  ingest-scannet  raw ScanNet scans -> reference-layout arrays + info pkl
  ingest-sens     .sens streams -> packed scene npz store
  pipeline        run stages + engines over an existing scene store
  tapvid          run the object-movement engines over TAPVid npz files
  bench           run the benchmark (same as bench.py)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _mllm_config(args):
    """Model config from --config/--vocab-size/--moe-experts.

    ONE builder shared by export-checkpoint/eval/serve/train: a
    checkpoint trained with --moe-experts has a routed-FFN param tree,
    so every CLI that restores one must be able to build the matching
    config (ADVICE r3 — previously only `train` accepted the flag and
    MoE checkpoints could not be served or evaluated)."""
    import dataclasses

    from .models import mllm as M

    cfg = {"flagship": M.flagship_config, "tiny": M.tiny_config,
           "bench": M.bench_1chip_config}[args.config]()
    overrides = {}
    if getattr(args, "vocab_size", 0):
        overrides["vocab_size"] = args.vocab_size
    if getattr(args, "moe_experts", 0):
        overrides["moe_experts"] = args.moe_experts
        # grouped routing only affects TRAINING dispatch cost/drops;
        # inference paths ignore it, so serving/eval configs stay
        # compatible with any trained value (models/moe.py module doc)
        if getattr(args, "moe_group", 0):
            overrides["moe_group"] = args.moe_group
        if getattr(args, "moe_impl", None):
            overrides["moe_impl"] = args.moe_impl
        if getattr(args, "moe_kernel", None):
            if overrides.get("moe_impl", cfg.llm.moe_impl) != "ragged":
                raise SystemExit(
                    "--moe-kernel applies to the ragged impl's grouped "
                    "matmuls only (pass --moe-impl ragged)")
            overrides["moe_kernel"] = args.moe_kernel
    elif (getattr(args, "moe_group", 0) or getattr(args, "moe_impl", None)
          or getattr(args, "moe_kernel", None)):
        raise SystemExit(
            "--moe-group/--moe-impl/--moe-kernel require --moe-experts "
            "(a dense config has no routed FFN; the checkpoint's param "
            "tree would not match)")
    if overrides:
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, **overrides))
    return cfg


def cmd_demo(args) -> None:
    from .core.scene import SceneStore
    from .core.synthetic import make_scene, make_tapvid_npz
    from .pipeline import PipelineConfig, SpatialEnginePipeline

    scenes = [
        make_scene(scene_id=f"demo{i:04d}_00", seed=args.seed + i,
                   n_images=args.images_per_scene,
                   n_background=args.points_per_scene)
        for i in range(args.scenes)
    ]
    store = SceneStore.write(scenes, os.path.join(args.output, "scenes"))
    pipe = SpatialEnginePipeline(
        store, args.output,
        PipelineConfig(overlap_min=0.1, overlap_max=100.0, interval=5.0))
    tapvid = {f"demo_seq{i}": make_tapvid_npz(seed=args.seed + 50 + i)
              for i in range(2)}
    results = pipe.run_all(tapvid_records=tapvid)

    def count(v):
        if isinstance(v, dict):
            return sum(count(x) for x in v.values())
        return v.n_train + v.n_val

    summary = {
        engine: {k: count(v) for k, v in outs.items()}
        if isinstance(outs, dict) else outs
        for engine, outs in results.items()
    }
    print(json.dumps(summary, indent=2, default=str))


def cmd_ingest_scannet(args) -> None:
    from .ingest.scannet_export import batch_export

    scan_dirs = sorted(glob.glob(os.path.join(args.scans, "scene*")))
    if args.limit:
        scan_dirs = scan_dirs[: args.limit]
    info = batch_export(scan_dirs, args.output,
                        label_map_path=args.label_map,
                        info_pkl_path=os.path.join(
                            args.output, "scenes_info.pkl"))
    print(f"exported {len(info)} scans to {args.output}")


def cmd_ingest_sens(args) -> None:

    from .core.scene import SceneStore
    from .ingest.posed_images import scene_from_sens
    from .ingest.scannet_export import export_scene_arrays

    os.makedirs(args.output, exist_ok=True)
    sens_files = sorted(glob.glob(os.path.join(args.scans, "*", "*.sens")))
    if args.limit:
        sens_files = sens_files[: args.limit]
    count = 0
    for sens_path in sens_files:
        scan = os.path.basename(os.path.dirname(sens_path))
        scan_dir = os.path.dirname(sens_path)
        arrays = export_scene_arrays(
            os.path.join(scan_dir, f"{scan}_vh_clean_2.ply"),
            os.path.join(scan_dir, f"{scan}.aggregation.json"),
            os.path.join(scan_dir, f"{scan}_vh_clean_2.0.010000.segs.json"),
            os.path.join(scan_dir, f"{scan}.txt"))
        scene = scene_from_sens(sens_path, scan, arrays,
                                frame_skip=args.frame_skip)
        scene.save_npz(os.path.join(args.output, f"{scan}.npz"))
        count += 1
    print(f"built {count} scene packs in {args.output}")


def cmd_pipeline(args) -> None:
    from .core.scene import SceneStore
    from .pipeline import PipelineConfig, SpatialEnginePipeline
    from .utils.profiling import device_trace

    store = SceneStore(args.scenes)
    pipe = SpatialEnginePipeline(store, args.output, PipelineConfig())
    # --trace-dir wraps the device-heavy L3 stages in a jax.profiler
    # trace (view with tensorboard / xprof); engines run untraced.
    with device_trace(args.trace_dir):
        pipe.visibility()
        pipe.frame_relations()
    results = pipe.run_all()
    print(json.dumps({k: str(v) for k, v in results.items()}, indent=2))


def cmd_tapvid(args) -> None:
    from .engines import object_movement as OM
    from .ingest.tapvid import load_split_records

    records = load_split_records(args.data, args.meta, args.sub_dataset,
                                 args.split)
    for qtype in OM.QUESTION_TYPES:
        cfg = OM.ObjectMovementConfig(question_type=qtype,
                                      dot_variant=args.dot)
        out = OM.generate(
            records,
            os.path.join(args.output,
                         f"{args.sub_dataset}_{qtype}_{args.split}.jsonl"),
            cfg, img_output_dir=os.path.join(args.output, "images"),
            eval_mode=args.split == "val")
        print(f"{qtype}: {out.n_train + out.n_val} samples")


def cmd_bench(args) -> None:
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                   run_name="__main__")


def cmd_coverage(args) -> None:
    """Resumable sharded coverage runs (find_object_coverage.sh:24-48
    parity): each invocation processes its round-robin slice of scenes and
    writes per-dimension shard pkls; --merge combines shards into the
    reference's merged_{split}_object_coverage_{dim}.pkl files."""
    from .core.io import dump_pickle, load_pickle
    from .core.scene import SceneStore
    from .parallel.distributed import host_shard
    from .stages.coverage import build_object_coverage, merge_coverage_shards
    from .stages.object_visibility import build_object_visibility
    from .utils.profiling import device_trace

    os.makedirs(args.output, exist_ok=True)
    dims = ("height", "length", "width")
    if args.merge:
        for dim in dims:
            shards = sorted(glob.glob(os.path.join(
                args.output, f"{args.split}_object_coverage_{dim}_shard*.pkl")))
            merged = merge_coverage_shards(load_pickle(p) for p in shards)
            out = os.path.join(
                args.output,
                f"merged_{args.split}_object_coverage_{dim}.pkl")
            dump_pickle(merged, out)
            print(json.dumps({"dim": dim, "shards": len(shards),
                              "scenes": len(merged), "output": out}))
        return

    store = SceneStore(args.scenes)
    scene_ids = host_shard(store.scene_ids(), args.shard_index,
                           args.num_shards)
    shard_tag = f"shard{args.shard_index:03d}of{args.num_shards:03d}"
    paths = {dim: os.path.join(
        args.output, f"{args.split}_object_coverage_{dim}_{shard_tag}.pkl")
        for dim in dims}
    if all(os.path.exists(p) for p in paths.values()) and not args.force:
        print(json.dumps({"shard": shard_tag, "status": "already done"}))
        return
    scenes = [store.get(sid) for sid in scene_ids]
    with device_trace(args.trace_dir):
        ov = build_object_visibility(scenes)
        h, l, w = build_object_coverage(scenes, ov, seed=args.seed)
    for dim, result in zip(dims, (h, l, w)):
        dump_pickle(result, paths[dim])
    print(json.dumps({"shard": shard_tag, "scenes": len(scenes),
                      "outputs": list(paths.values())}))


def cmd_import_checkpoint(args) -> None:
    """HF InternVL-2 safetensors -> orbax checkpoint in this repo's
    parameter layout (ready for parallel/train.py restore)."""
    import numpy as np

    from .models import checkpoint_import as CI
    from .models import mllm as M

    cfg = M.flagship_config() if args.config == "flagship" else \
        M.tiny_config()
    dtype = {"float32": np.float32, "bfloat16": None}[args.dtype]
    if dtype is None:
        import ml_dtypes

        dtype = ml_dtypes.bfloat16
    params = CI.load_internvl2_checkpoint(args.checkpoint, cfg,
                                          param_dtype=dtype)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.output), params)
    ckptr.wait_until_finished()
    n = sum(int(np.prod(l.shape)) for l in
            __import__("jax").tree_util.tree_leaves(params))
    print(json.dumps({"output": args.output, "parameters": n,
                      "dtype": args.dtype}))


def cmd_export_checkpoint(args) -> None:
    """Inverse of import-checkpoint: orbax params -> HF InternVL-2
    safetensors shard(s) + index, so weights trained here load back
    into the reference's InternVL-2 stack (layer scales stay folded —
    checkpoint_import.export_state_dict)."""
    import numpy as np

    from .models import checkpoint_import as CI
    from .models import mllm as M
    from .parallel.train import restore_checkpoint

    cfg = _mllm_config(args)
    raw = restore_checkpoint(os.path.abspath(args.checkpoint))
    # train saves wrap the variables as {"params": vars, "step": ...};
    # import-checkpoint saves the bare vars ({"params": tree})
    params = raw["params"] if isinstance(raw, dict) and "step" in raw \
        else raw
    layers = params.get("params", {}).get("llm", {})
    has_moe = cfg.llm.moe_experts > 0 or any(
        "moe" in v for k, v in layers.items()
        if k.startswith("layer_") and isinstance(v, dict))
    if has_moe:
        raise SystemExit(
            "export-checkpoint: routed-MoE checkpoints cannot be "
            "exported — the HF InternVL-2 safetensors layout has no "
            "routed-expert tensors (feed_forward.w{1,2,3} are dense). "
            "Keep MoE checkpoints in orbax form; eval/serve/generate "
            "load them via --moe-experts.")
    state = CI.export_state_dict(params, cfg)
    dtype = {"float32": np.float32, "bfloat16": None}[args.dtype]
    if dtype is None:
        import ml_dtypes

        dtype = ml_dtypes.bfloat16
    state = {k: np.ascontiguousarray(v, dtype=dtype)
             for k, v in state.items()}

    from safetensors.numpy import save_file

    os.makedirs(args.output, exist_ok=True)
    budget = int(args.shard_gb * 1e9)
    shards: list[dict] = [{}]
    size = 0
    for k in state:                      # insertion order, HF style
        nbytes = state[k].nbytes
        if size and size + nbytes > budget:
            shards.append({})
            size = 0
        shards[-1][k] = state[k]
        size += nbytes
    n = len(shards)
    weight_map = {}
    for i, shard in enumerate(shards, start=1):
        name = "model.safetensors" if n == 1 else \
            f"model-{i:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(args.output, name))
        weight_map.update({k: name for k in shard})
    if n > 1:
        with open(os.path.join(args.output,
                               "model.safetensors.index.json"), "w") as f:
            json.dump({"metadata": {"total_size": sum(
                v.nbytes for v in state.values())},
                "weight_map": weight_map}, f)
    print(json.dumps({"output": args.output, "tensors": len(state),
                      "shards": n, "dtype": args.dtype}))


def cmd_eval(args) -> None:
    """MultiSPA evaluation from the CLI: orbax checkpoint x eval JSONL
    (engine output records) x images directory -> eval_harness report.
    `--paged` serves the campaign through the paged batcher, where
    prefix caching / int8 kv / chunked prefill / vision cache /
    speculation are opt-in flags; otherwise the batched-prefill path
    runs with `--batch-size` rows."""
    import multi_spatialmllm_tpu as msm

    msm.enable_compilation_cache()
    from .models import mllm as M
    from .models.data import DataConfig
    from .models.preprocess import PreprocessConfig
    from .models.runner import EvalRunConfig, run_eval
    from .models.tokenizer import load_tokenizer
    from .parallel.train import restore_checkpoint

    cfg = _mllm_config(args)
    model = M.MultiFrameMLLM(cfg)
    tok = load_tokenizer(args.tokenizer)
    assert tok.vocab_size <= cfg.llm.vocab_size, \
        (tok.vocab_size, cfg.llm.vocab_size)
    restored = restore_checkpoint(os.path.abspath(args.checkpoint))
    params = restored.get("params", restored) \
        if isinstance(restored, dict) else restored
    if args.quantize_weights:
        from .models.quantize import quantize_weights

        params = quantize_weights(params)

    assert bool(args.eval_jsonl) != bool(args.eval_root), \
        "pass exactly one of --eval-jsonl / --eval-root"

    def read_jsonl(path):
        with open(path) as f:
            rows = [json.loads(line) for line in f if line.strip()]
        return rows[: args.limit] if args.limit else rows

    if args.eval_jsonl:
        campaigns = [(os.path.basename(args.eval_jsonl),
                      read_jsonl(args.eval_jsonl))]
    else:
        # pipeline layout: qa/evaluation_data/<engine>/*.jsonl; the
        # *_orig.jsonl files are the full pre-subsample dumps
        # (reference single_object_movement_engine_dot.py:676-686) and
        # are skipped — they duplicate the subsampled eval set
        campaigns = []
        for engine in sorted(os.listdir(args.eval_root)):
            edir = os.path.join(args.eval_root, engine)
            if not os.path.isdir(edir):
                continue
            rows = []
            for fn in sorted(os.listdir(edir)):
                if fn.endswith(".jsonl") and not fn.endswith("_orig.jsonl"):
                    rows.extend(read_jsonl(os.path.join(edir, fn)))
            if rows:
                campaigns.append((engine, rows))
        assert campaigns, f"no eval JSONL under {args.eval_root}"

    def loader(path):
        import cv2

        img = cv2.imread(os.path.join(args.images_root, path))
        assert img is not None, f"unreadable image: {path}"
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    run_cfg = EvalRunConfig(
        max_new_tokens=args.max_new_tokens,
        mc_logprob=args.mc_logprob,
        speculate=0 if args.paged else args.speculate,
        data=DataConfig(preprocess=PreprocessConfig(
            tile_size=cfg.vit.image_size, max_tiles=args.max_tiles,
            resize_hw=None)))
    batcher = None
    if args.paged:
        from .models.paged_kv import PagedBatcher, PagedConfig

        batcher = PagedBatcher(
            model, params,
            PagedConfig(slots=args.slots, page_size=args.page_size,
                        num_pages=args.num_pages,
                        max_prompt_len=args.max_prompt_len,
                        max_new_tokens=args.max_new_tokens,
                        kv_dtype=args.kv_dtype,
                        prefix_cache=args.prefix_cache,
                        prefill_chunk=args.prefill_chunk,
                        vision_cache=args.vision_cache,
                        speculate=args.speculate,
                        logprobs=args.logprobs),
            pad_id=tok.pad_id, eos_id=tok.eos_id)
    per_engine = {}
    predictions = {}
    for name, samples in campaigns:
        rep = run_eval(model, params, tok, samples, loader, run_cfg,
                       batch_size=args.batch_size, batcher=batcher)
        predictions[name] = rep.pop("predictions")
        per_engine[name] = rep
    if len(campaigns) == 1:
        report = per_engine[campaigns[0][0]]
        flat_preds = predictions[campaigns[0][0]]
    else:
        total = sum(r["count"] for r in per_engine.values())
        hits = sum(r["accuracy"] * r["count"]
                   for r in per_engine.values())
        report = {"accuracy": hits / total if total else 0.0,
                  "count": total, "engines": per_engine}
        flat_preds = predictions
    if args.output:
        with open(args.output, "w") as f:
            json.dump({**report, "predictions": flat_preds}, f)
    if batcher is not None:
        report["serving_stats"] = batcher.stats
    print(json.dumps(report))


def cmd_serve(args) -> None:
    """JSONL serving loop over the paged continuous batcher: one request
    per stdin line -> result lines on stdout (final per request, or
    incremental chunks with --stream). Requests drain in windows of
    --window lines; ONE batcher persists across windows, so the prefix
    and vision caches keep paying image-context prefills once per image.

    Request line:  {"id": ..., "text": "<image>\\n...", "image": [paths],
                    "temperature": t, "top_p": p, "seed": s}   (knobs
                    need --sampling; omitted/0 temperature = greedy)
    Result line:   {"id": ..., "text": ..., "token_ids": [...]} or, with
                   --stream, {"id", "delta_ids", "delta", "done"} chunks.
    """
    import sys

    import multi_spatialmllm_tpu as msm

    msm.enable_compilation_cache()
    import numpy as np

    from .models import mllm as M
    from .models.paged_kv import PagedBatcher, PagedConfig
    from .models.serving import SamplingParams
    from .models.preprocess import PreprocessConfig, tile_image
    from .models.runner import build_prompt_ids
    from .models.tokenizer import load_tokenizer
    from .parallel.train import restore_checkpoint

    cfg = _mllm_config(args)
    model = M.MultiFrameMLLM(cfg)
    tok = load_tokenizer(args.tokenizer)
    restored = restore_checkpoint(os.path.abspath(args.checkpoint))
    params = restored["params"] if isinstance(restored, dict) \
        and "step" in restored else restored
    if args.quantize_weights:
        from .models.quantize import quantize_weights

        params = quantize_weights(params)
    pre = PreprocessConfig(tile_size=cfg.vit.image_size,
                           max_tiles=args.max_tiles, resize_hw=None)
    batcher = PagedBatcher(
        model, params,
        PagedConfig(slots=args.slots, page_size=args.page_size,
                    num_pages=args.num_pages,
                    max_prompt_len=args.max_prompt_len,
                    max_new_tokens=args.max_new_tokens,
                    kv_dtype=args.kv_dtype,
                    prefix_cache=args.prefix_cache,
                    prefill_chunk=args.prefill_chunk,
                    vision_cache=args.vision_cache,
                    speculate=args.speculate,
                    sampling=args.sampling,
                    logprobs=args.logprobs),
        pad_id=tok.pad_id, eos_id=tok.eos_id,
        stop_ids=tuple(args.stop_id or ()))

    def loader(path):
        import cv2

        img = cv2.imread(os.path.join(args.images_root, path))
        assert img is not None, f"unreadable image: {path}"
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def to_request(rec: dict):
        stacks = [tile_image(loader(p), pre) for p in rec.get("image", [])]
        tiles = np.concatenate(stacks, axis=0) if stacks else np.zeros(
            (0, cfg.vit.image_size, cfg.vit.image_size, 3), np.float32)
        ids = build_prompt_ids(rec, tok, cfg,
                               [s.shape[0] for s in stacks])
        req = [np.asarray(ids, dtype=np.int32), tiles]
        if any(k in rec for k in ("temperature", "top_p", "seed")):
            assert args.sampling, "pass --sampling to use sampling knobs"
            req.append(SamplingParams(
                temperature=float(rec.get("temperature", 0.0)),
                top_p=float(rec.get("top_p", 1.0)),
                seed=int(rec.get("seed", 0))))
        if "max_new_tokens" in rec:     # per-request budget (<= the cap)
            req.append(int(rec["max_new_tokens"]))
        out = tuple(req)
        batcher._unpack(out)            # front-load enqueue validation
        return out

    def emit(obj):
        print(json.dumps(obj), flush=True)

    def more_buffered(stdin) -> bool:
        """True when another line can be read without blocking (pipes /
        files; falls back to blocking reads where select is unusable)."""
        import select

        try:
            return bool(select.select([stdin], [], [], 0)[0])
        except (OSError, ValueError):
            return True

    stdin = sys.stdin
    done = False
    n_line = 0
    while not done:
        window: list[dict] = []     # accepted (id, request-tuple) pairs
        while len(window) < args.window:
            # block for the first request of a window, then only drain
            # what is already buffered — a slow producer must not stall
            # generation for requests that have arrived
            if window and not more_buffered(stdin):
                break
            line = stdin.readline()
            if not line:
                done = True
                break
            if not line.strip():
                continue
            n_line += 1
            # a bad line answers with an error and never kills the
            # server or the window's other in-flight requests
            rid_name = f"line{n_line}"
            try:
                rec = json.loads(line)
                if isinstance(rec, dict) and "id" in rec:
                    rid_name = rec["id"]
                window.append((rid_name, to_request(rec)))
            except Exception as exc:
                emit({"id": rid_name,
                      "error": f"{type(exc).__name__}: {exc}"})
        if not window:
            continue
        acc: dict[int, list[int]] = {i: [] for i in range(len(window))}
        texted: dict[int, str] = {i: "" for i in range(len(window))}
        for rid, toks, fin in batcher.generate_stream(
                [r for _, r in window]):
            acc[rid].extend(toks)
            lp = (batcher.request_logprobs.get(rid)
                  if args.logprobs and fin else None)
            if args.stream and (toks or fin):
                # decode the CUMULATIVE ids and emit the text suffix:
                # per-chunk decode would split multi-byte characters /
                # BPE merges at chunk boundaries
                full = tok.decode(np.asarray(acc[rid], np.int32))
                delta, texted[rid] = full[len(texted[rid]):], full
                rec_out = {"id": window[rid][0],
                           "delta_ids": [int(t) for t in toks],
                           "delta": delta, "done": fin}
                if lp is not None:
                    rec_out["logprobs"] = [round(x, 5) for x in lp]
                emit(rec_out)
            elif fin:
                out = np.asarray(acc[rid], dtype=np.int32)
                rec_out = {"id": window[rid][0],
                           "token_ids": [int(t) for t in out],
                           "text": tok.decode(out)}
                if lp is not None:
                    rec_out["logprobs"] = [round(x, 5) for x in lp]
                emit(rec_out)
    print(json.dumps({"served": True, "stats": batcher.stats}),
          file=sys.stderr)


def cmd_train(args) -> None:
    """SFT from the CLI: data-mixture meta JSON x model config -> orbax
    checkpoint. The reference's training entry is InternVL-2's SFT stack
    over a mixture meta (`data/configs/mix3M.json`, README.md:199); this
    is that surface on the TPU stack — deterministic mixture streaming
    (models/mixture.py), padded or packed batches, the pjit train step
    on a (data, model, seq) mesh, optional LoRA (adapter-only state,
    merged on export)."""
    import multi_spatialmllm_tpu as msm

    msm.enable_compilation_cache()
    import jax
    import numpy as np

    from .models import mllm as M
    from .models.data import DataConfig
    from .models.mixture import load_meta, mixture_batches, mixture_stats
    from .models.preprocess import PreprocessConfig
    from .models.tokenizer import load_tokenizer
    from .parallel.mesh import make_mesh
    from .parallel.train import (
        TrainConfig,
        init_train_state,
        make_train_step,
        restore_checkpoint,
    )
    from .utils.logging import StageLogger

    cfg = _mllm_config(args)
    tok = load_tokenizer(args.tokenizer)
    assert tok.vocab_size <= cfg.llm.vocab_size, \
        (tok.vocab_size, cfg.llm.vocab_size)
    assert tok.img_context_id == cfg.img_context_id, \
        (tok.img_context_id, cfg.img_context_id)
    assert not (args.resume and args.lora_rank), \
        "--resume restores full-finetune opt_state; LoRA runs restart"
    assert not (args.save_every and not args.output), \
        "--save-every needs --output"

    entries = load_meta(args.meta)
    log = StageLogger("train")
    log.event("mixture", **mixture_stats(entries))

    def loader(path):
        import cv2

        img = cv2.imread(path)  # mixture resolves paths onto each root
        assert img is not None, f"unreadable image: {path}"
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    if args.validate_only:
        from .models.mixture import validate_mixture

        report = validate_mixture(entries, image_loader=loader,
                                  sample=args.validate_sample,
                                  seed=args.seed)
        print(json.dumps(report))
        if not report["ok"]:
            raise SystemExit(1)
        return

    data_cfg = DataConfig(
        max_seq_len=args.seq_len, max_tiles=args.max_tiles,
        preprocess=PreprocessConfig(
            tile_size=cfg.vit.image_size, max_tiles=args.tiles_per_image,
            resize_hw=None))
    batches = mixture_batches(entries, tok, cfg, loader, args.batch_size,
                              data_cfg, seed=args.seed, packed=args.packed,
                              shard_index=args.data_shard,
                              num_shards=args.data_num_shards)
    if args.prefetch:
        from .models.data import prefetch_iterator

        batches = prefetch_iterator(batches, depth=args.prefetch)
    first = next(batches)

    # (moe_experts is applied by _mllm_config at cfg construction)
    devices = None
    if args.data_parallel:          # explicit shape: use that many chips
        devices = jax.devices()[: args.data_parallel
                                * args.model_parallel * args.seq_parallel
                                * args.expert_parallel]
    mesh = make_mesh(n_data=args.data_parallel or None,
                     n_model=args.model_parallel,
                     n_seq=args.seq_parallel,
                     n_expert=args.expert_parallel, devices=devices)
    train_cfg = TrainConfig(learning_rate=args.lr,
                            warmup_steps=args.warmup,
                            total_steps=args.steps, fsdp=args.fsdp)
    model, params, opt_state, tx = init_train_state(
        cfg, train_cfg, first, mesh, seed=args.seed)
    start_step = 0
    if args.init_checkpoint:
        path = os.path.abspath(args.init_checkpoint)
        if args.resume:
            # train saves wrap {params, opt_state, step}; `like` restores
            # the optax state with its exact pytree structure
            restored = restore_checkpoint(
                path, like={"params": params, "opt_state": opt_state,
                            "step": 0})
            new = restored["params"]
            # moment trees inherit the params' mesh layout; optax
            # counters (plain scalars) replicate — a bare device_put
            # would commit them to one chip and clash with the mesh
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            opt_state = jax.tree_util.tree_map(
                lambda cur, x: jax.device_put(
                    x, cur.sharding
                    if isinstance(cur.sharding, NamedSharding) else rep),
                opt_state, restored["opt_state"])
            start_step = int(restored["step"])
        else:
            # params-only init: a train save wraps the variables as
            # {"params": vars, "step": ...}; an import-checkpoint
            # output IS the bare vars ({"params": tree}) — discriminate
            # on "step", not "params" (the vars dict has that key too)
            raw = restore_checkpoint(path)
            new = raw["params"] if isinstance(raw, dict) \
                and "step" in raw else raw
        # commit the restored arrays onto the mesh layout init chose
        params = jax.tree_util.tree_map(
            lambda cur, x: jax.device_put(x, cur.sharding), params, new)
        log.event("restored", path=path, step=start_step)

    if args.lora_rank:
        from .parallel.lora import (
            LoRAConfig,
            init_lora,
            lora_param_count,
            make_lora_train_step,
            merge_lora,
        )

        lcfg = LoRAConfig(rank=args.lora_rank)
        if args.moe_experts:
            # make the scope explicit: the default LoRA targets are the
            # attention kernels; routed expert tables are never adapted
            # (ADVICE r3 — this is a deliberate restriction, not an
            # accidentally-narrow adapter)
            print("note: --lora-rank with --moe-experts adapts the "
                  "ATTENTION kernels only; the routed MoE FFN stays "
                  "frozen (expert tables are not LoRA targets)",
                  file=sys.stderr)
        lora = init_lora(params, lcfg, jax.random.key(args.seed + 1))
        opt_state = tx.init(lora)
        step_fn = make_lora_train_step(model, tx, mesh, lcfg)
        log.event("lora", rank=lcfg.rank,
                  trainable=lora_param_count(lora))
    else:
        step_fn = make_train_step(model, tx, mesh,
                                  accum_steps=args.accum)

    eval_samples = []
    if args.eval_jsonl:
        with open(args.eval_jsonl) as f:
            eval_samples = [json.loads(line) for line in f
                            if line.strip()]
        if args.eval_limit:
            eval_samples = eval_samples[: args.eval_limit]

    def eval_loader(path):
        import cv2

        img = cv2.imread(os.path.join(args.eval_images_root, path))
        assert img is not None, f"unreadable image: {path}"
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    eval_done = {}                  # step -> accuracy (avoid repeats)

    def run_eval_now(step):
        from .models.runner import EvalRunConfig, run_eval

        if step in eval_done:
            return eval_done[step]
        p = params
        if args.lora_rank:
            from .parallel.lora import merge_lora as _ml

            p = _ml(params, lora, lcfg)
        rep = run_eval(
            model, p, tok, eval_samples, eval_loader,
            EvalRunConfig(max_new_tokens=args.eval_max_new_tokens,
                          mc_logprob=args.mc_logprob, data=data_cfg),
            batch_size=min(len(eval_samples), args.batch_size))
        log.event("eval", step=step, accuracy=round(rep["accuracy"], 4),
                  count=rep["count"])
        eval_done[step] = rep["accuracy"]
        return rep["accuracy"]

    saver = None
    if args.async_save and args.output:
        from .parallel.train import AsyncRollingSaver

        saver = AsyncRollingSaver(os.path.abspath(args.output),
                                  keep=args.keep)

    def save(step):
        from .parallel.train import save_checkpoint_rolling

        out = os.path.abspath(args.output)
        tree = merge_lora(params, lora, lcfg) if args.lora_rank else params
        opt = None if args.lora_rank else opt_state
        if saver is not None:  # IO overlaps the next training interval
            where = saver.save(tree, opt, step=step)
        else:
            where = save_checkpoint_rolling(out, tree, opt, step=step,
                                            keep=args.keep)
        log.event("checkpoint", path=where, step=step)

    import itertools
    import time

    from .utils.profiling import device_trace

    train_stream = itertools.chain([first], batches)
    if start_step:
        # resume fast-forward: the mixture replays deterministically, so
        # skipping the already-trained batches puts the run back at the
        # exact data position (costs re-encoding those samples once;
        # training on them again would silently duplicate data while
        # the LR schedule moved on)
        t0 = time.perf_counter()
        for _ in itertools.islice(train_stream, start_step):
            pass
        log.event("data_fast_forward", batches=start_step,
                  seconds=round(time.perf_counter() - t0, 2))

    # losses stay DEVICE scalars between log points: fetching every step
    # would sync the pipeline once per step (a 30-50 ms round trip over
    # the dev tunnel; a dispatch bubble even on a local host). Only log
    # points and the final summary materialize them.
    losses = []
    steady_t0 = steady_tokens = steady_steps = 0
    interval_steps = 0
    save_s = 0.0                     # checkpoint/eval time, excluded
    mark = time.perf_counter()
    with device_trace(args.trace_dir):
        for step, batch in enumerate(train_stream, start=start_step):
            if step >= args.steps:
                break
            if args.lora_rank:
                lora, opt_state, metrics = step_fn(lora, opt_state,
                                                   params, batch)
            else:
                params, opt_state, metrics = step_fn(params, opt_state,
                                                     batch)
            losses.append(metrics["loss"])  # device scalar, no sync
            interval_steps += 1
            if len(losses) == 1:            # step 0 paid the compile
                float(losses[0])            # sync once post-compile
                steady_t0 = mark = time.perf_counter()
                interval_steps = 0
            else:
                steady_tokens += int(np.prod(batch["input_ids"].shape))
                steady_steps += 1
            if step % args.log_every == 0 or step == args.steps - 1:
                loss = float(losses[-1])    # sync: interval completed
                now = time.perf_counter()
                log.event("step", step=step, loss=round(loss, 6),
                          grad_norm=round(float(metrics["grad_norm"]), 6),
                          step_s=round((now - mark)
                                       / max(interval_steps, 1), 4))
                mark, interval_steps = now, 0
            if args.save_every and (step + 1) % args.save_every == 0:
                t0 = time.perf_counter()
                save(step + 1)
                save_s += time.perf_counter() - t0
                mark = time.perf_counter()
            if eval_samples and args.eval_every \
                    and (step + 1) % args.eval_every == 0:
                t0 = time.perf_counter()
                run_eval_now(step + 1)
                save_s += time.perf_counter() - t0   # exclude from rate
                mark = time.perf_counter()
    if losses:
        float(losses[-1])                   # final sync before timing
    steady_end = time.perf_counter()
    losses = [float(x) for x in losses]
    if args.output:
        save(min(args.steps, start_step + len(losses)))
        if saver is not None:
            saver.wait()  # final save must be durable before we exit
    final_acc = run_eval_now(start_step + len(losses)) \
        if eval_samples else None
    steady_s = (steady_end - steady_t0 - save_s) if steady_steps else 0.0
    print(json.dumps({
        "steps": len(losses),
        "first_loss": losses[0] if losses else None,
        "last_loss": losses[-1] if losses else None,
        "eval_accuracy": final_acc,
        "devices": len(jax.devices()), "mesh": dict(mesh.shape),
        # steady-state (post-compile) throughput; padded token count
        "steps_per_s": round(steady_steps / steady_s, 4)
        if steady_steps else None,
        "tokens_per_s": round(steady_tokens / steady_s, 1)
        if steady_steps else None}))


def main() -> None:
    parser = argparse.ArgumentParser(prog="multi_spatialmllm_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("demo", help="synthetic end-to-end pipeline run")
    p.add_argument("--output", default="./msm_demo")
    p.add_argument("--scenes", type=int, default=3)
    p.add_argument("--images-per-scene", type=int, default=16)
    p.add_argument("--points-per-scene", type=int, default=6000)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_demo)

    p = sub.add_parser("ingest-scannet", help="export raw ScanNet scans")
    p.add_argument("--scans", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--label-map", default=None)
    p.add_argument("--limit", type=int, default=0)
    p.set_defaults(fn=cmd_ingest_scannet)

    p = sub.add_parser("ingest-sens", help=".sens -> scene packs")
    p.add_argument("--scans", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--frame-skip", type=int, default=5)
    p.add_argument("--limit", type=int, default=0)
    p.set_defaults(fn=cmd_ingest_sens)

    p = sub.add_parser("pipeline", help="run stages+engines over a store")
    p.add_argument("--scenes", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--trace-dir", default=None,
                   help="jax.profiler trace dir for the L3 stages")
    p.set_defaults(fn=cmd_pipeline)

    p = sub.add_parser("coverage",
                       help="sharded object-coverage runs + merge")
    p.add_argument("--scenes", help="scene store (shard mode)")
    p.add_argument("--output", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--shard-index", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--merge", action="store_true",
                   help="merge existing shard pkls instead of computing")
    p.add_argument("--force", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--trace-dir", default=None)
    p.set_defaults(fn=cmd_coverage)

    p = sub.add_parser("tapvid", help="object-movement engines over npz")
    p.add_argument("--data", required=True)
    p.add_argument("--meta", default=None,
                   help="TAPVid-3D meta_data dir (default: the vendored "
                        "split lists in data/tapvid3d_meta)")
    p.add_argument("--sub-dataset", default="adt")
    p.add_argument("--split", default="train")
    p.add_argument("--dot", action="store_true")
    p.add_argument("--output", required=True)
    p.set_defaults(fn=cmd_tapvid)

    p = sub.add_parser("bench", help="run the benchmark")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("import-checkpoint",
                       help="HF InternVL-2 safetensors -> orbax params")
    p.add_argument("--checkpoint", required=True,
                   help=".safetensors file or directory of shards")
    p.add_argument("--output", required=True, help="orbax output dir")
    p.add_argument("--config", choices=("flagship", "tiny"),
                   default="flagship")
    p.add_argument("--dtype", choices=("bfloat16", "float32"),
                   default="bfloat16")
    p.set_defaults(fn=cmd_import_checkpoint)

    p = sub.add_parser("export-checkpoint",
                       help="orbax params -> HF InternVL-2 safetensors")
    p.add_argument("--checkpoint", required=True,
                   help="orbax dir (import-checkpoint or train output)")
    p.add_argument("--output", required=True,
                   help="directory for *.safetensors (+ index when "
                        "sharded)")
    p.add_argument("--config", choices=("flagship", "bench", "tiny"),
                   default="flagship")
    p.add_argument("--vocab-size", type=int, default=0)
    # no --moe-experts here: the HF InternVL-2 layout has no
    # routed-expert tensors; cmd_export_checkpoint rejects MoE trees
    p.add_argument("--dtype", choices=("bfloat16", "float32"),
                   default="bfloat16")
    p.add_argument("--shard-gb", type=float, default=4.0,
                   help="max shard size in GB (HF-style index written "
                        "when more than one shard)")
    p.set_defaults(fn=cmd_export_checkpoint)

    p = sub.add_parser("eval",
                       help="MultiSPA eval: checkpoint x JSONL -> scores")
    p.add_argument("--checkpoint", required=True, help="orbax dir "
                   "(import-checkpoint output or train save_checkpoint)")
    p.add_argument("--config", choices=("flagship", "bench", "tiny"),
                   default="flagship")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer.json (default: builtin word-level)")
    p.add_argument("--vocab-size", type=int, default=0,
                   help="override the config's vocab (0 = keep; must "
                        "cover the tokenizer)")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="routed-MoE expert count; must match the checkpoint's "
                        "training value (see train --moe-experts)")
    p.add_argument("--moe-impl", choices=("einsum", "ragged"),
                   default=None,
                   help="MoE dispatch implementation (serve a "
                        "ragged-trained checkpoint with ragged for "
                        "matching routing semantics)")
    p.add_argument("--moe-kernel", choices=("xla", "pallas"),
                   default=None,
                   help="grouped-matmul backend for --moe-impl ragged: "
                        "xla (lax.ragged_dot) or pallas (megablox MXU "
                        "kernel)")
    p.add_argument("--eval-jsonl", default=None,
                   help="one engine evaluation_data JSONL")
    p.add_argument("--eval-root", default=None,
                   help="qa/evaluation_data directory: every engine's "
                        "*.jsonl evaluated (skipping *_orig.jsonl), "
                        "per-engine + aggregate report")
    p.add_argument("--images-root", default=".")
    p.add_argument("--output", default=None, help="report+predictions json")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--max-new-tokens", type=int, default=24)
    p.add_argument("--max-tiles", type=int, default=6)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--speculate", type=int, default=0)
    p.add_argument("--paged", action="store_true",
                   help="serve through the paged continuous batcher")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--page-size", type=int, default=64)
    p.add_argument("--num-pages", type=int, default=128)
    p.add_argument("--max-prompt-len", type=int, default=2048)
    p.add_argument("--mc-logprob", action="store_true",
                   help="score multiple-choice records by candidate "
                        "logprob instead of free decoding")
    p.add_argument("--quantize-weights", action="store_true",
                   help="serve weight-only int8 (models/quantize)")
    p.add_argument("--kv-dtype", choices=("native", "int8"),
                   default="native")
    p.add_argument("--prefix-cache", action="store_true")
    p.add_argument("--prefill-chunk", type=int, default=0)
    p.add_argument("--vision-cache", type=int, default=0)
    p.add_argument("--logprobs", action="store_true",
                   help="report per-sample mean token logprob "
                        "(report['confidences']) — paged only")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("serve",
                       help="JSONL serving loop (stdin -> stdout) over "
                            "the paged batcher")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--config", choices=("flagship", "bench", "tiny"),
                   default="flagship")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--vocab-size", type=int, default=0)
    p.add_argument("--moe-experts", type=int, default=0,
                   help="routed-MoE expert count; must match the checkpoint's "
                        "training value (see train --moe-experts)")
    p.add_argument("--moe-impl", choices=("einsum", "ragged"),
                   default=None,
                   help="MoE dispatch implementation (serve a "
                        "ragged-trained checkpoint with ragged for "
                        "matching routing semantics)")
    p.add_argument("--moe-kernel", choices=("xla", "pallas"),
                   default=None,
                   help="grouped-matmul backend for --moe-impl ragged: "
                        "xla (lax.ragged_dot) or pallas (megablox MXU "
                        "kernel)")
    p.add_argument("--images-root", default=".")
    p.add_argument("--max-tiles", type=int, default=6,
                   help="dynamic-tiling cap per image")
    p.add_argument("--window", type=int, default=64,
                   help="max requests drained per serving window")
    p.add_argument("--stream", action="store_true",
                   help="emit incremental token chunks per request")
    p.add_argument("--sampling", action="store_true",
                   help="honor temperature/top_p/seed request fields")
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--page-size", type=int, default=64)
    p.add_argument("--num-pages", type=int, default=256)
    p.add_argument("--max-prompt-len", type=int, default=2048)
    p.add_argument("--kv-dtype", choices=("native", "int8"),
                   default="native")
    p.add_argument("--prefix-cache", action="store_true")
    p.add_argument("--prefill-chunk", type=int, default=0)
    p.add_argument("--vision-cache", type=int, default=0)
    p.add_argument("--speculate", type=int, default=0)
    p.add_argument("--quantize-weights", action="store_true")
    p.add_argument("--stop-id", type=int, action="append",
                   help="extra stop token id (repeatable; eos always "
                        "stops)")
    p.add_argument("--logprobs", action="store_true",
                   help="attach per-token logprobs to each result")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("train",
                       help="SFT on a data-mixture meta JSON -> orbax")
    p.add_argument("--meta", required=True,
                   help="InternVL-style mixture meta JSON (the "
                        "reference's mix3M.json format, README.md:199)")
    p.add_argument("--config", choices=("flagship", "bench", "tiny"),
                   default="flagship")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer.json (default: builtin word-level)")
    p.add_argument("--vocab-size", type=int, default=0)
    p.add_argument("--init-checkpoint", default=None,
                   help="orbax params to start from (import-checkpoint "
                        "output or a previous train save)")
    p.add_argument("--resume", action="store_true",
                   help="also restore opt_state + step from "
                        "--init-checkpoint (full-finetune saves only)")
    p.add_argument("--output", default=None,
                   help="checkpoint root: rolling step_N dirs + LATEST "
                        "pointer (crash-safe; restore resolves it)")
    p.add_argument("--save-every", type=int, default=0)
    p.add_argument("--keep", type=int, default=2,
                   help="rolling checkpoints retained under --output")
    p.add_argument("--async-save", action="store_true",
                   help="overlap checkpoint IO with training (orbax "
                        "async writes; LATEST commits only after a "
                        "write finishes, so crash-safety is unchanged)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=4096)
    p.add_argument("--max-tiles", type=int, default=14,
                   help="tile budget per sample across all frames")
    p.add_argument("--tiles-per-image", type=int, default=6,
                   help="dynamic-tiling cap per frame (reference "
                        "trains with 6, README.md:197)")
    p.add_argument("--packed", action="store_true",
                   help="sequence-packed rows (segment_ids/positions)")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation microbatches")
    p.add_argument("--lora-rank", type=int, default=0,
                   help="adapter-only training (0 = full finetune); "
                        "saves MERGED params")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="mesh data axis (0 = fill remaining devices)")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--seq-parallel", type=int, default=1)
    p.add_argument("--expert-parallel", type=int, default=1,
                   help="mesh 'expert' axis size for MoE configs "
                        "(models/moe.py)")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="replace every decoder MLP with a top-2 routed "
                        "MoE of this many experts")
    p.add_argument("--moe-group", type=int, default=0,
                   help="GShard routing-group size for MoE training "
                        "(capacity binds per group; REQUIRED for "
                        "training-scale sequences — whole-row dispatch "
                        "is O(T^2)). 256 is a good default")
    p.add_argument("--moe-kernel", choices=("xla", "pallas"),
                   default=None,
                   help="grouped-matmul backend for --moe-impl ragged: "
                        "xla (lax.ragged_dot) or pallas (megablox MXU "
                        "kernel)")
    p.add_argument("--moe-impl", choices=("einsum", "ragged"),
                   default=None,
                   help="MoE dispatch implementation: einsum (GShard "
                        "dense dispatch; shards over the expert axis) "
                        "or ragged (dropless sorted ragged_dot; "
                        "single-chip / data-parallel)")
    p.add_argument("--fsdp", action="store_true",
                   help="also shard large params over the data axis")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches assembled ahead in a producer thread "
                        "(0 = synchronous)")
    p.add_argument("--trace-dir", default=None,
                   help="wrap the step loop in a jax.profiler trace")
    p.add_argument("--validate-only", action="store_true",
                   help="schema-check every record + open sampled "
                        "images, print the report, and exit (nonzero "
                        "on issues)")
    p.add_argument("--validate-sample", type=int, default=200,
                   help="images opened per dataset in --validate-only")
    p.add_argument("--data-shard", type=int, default=0,
                   help="this host's stride into the epoch order "
                        "(multi-host input: every host computes the "
                        "same shuffle, takes order[shard::num])")
    p.add_argument("--data-num-shards", type=int, default=1)
    p.add_argument("--eval-jsonl", default=None,
                   help="held-out eval records: scored after training "
                        "and every --eval-every steps (accuracy in the "
                        "log and summary)")
    p.add_argument("--eval-every", type=int, default=0)
    p.add_argument("--eval-images-root", default=".")
    p.add_argument("--eval-limit", type=int, default=0)
    p.add_argument("--eval-max-new-tokens", type=int, default=24)
    p.add_argument("--mc-logprob", action="store_true",
                   help="score MC eval records by candidate logprob")
    p.set_defaults(fn=cmd_train)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
