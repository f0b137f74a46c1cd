#!/usr/bin/env python
"""Volume drill: one full `run_all` campaign writing >=1M QA records +
annotated JPEGs across all ten engines, KILLED mid-run and RESUMED
through the stage manifest (stages/manifest.py).

The reference demonstrably generated 27M+ samples for the paper
(/root/reference/README.md:39) but publishes only per-engine rates; this
drill proves the repo's pipeline holds up at campaign scale on one chip
— sustained record rate, annotated-image volume, and unit-granular
crash/resume — instead of extrapolating from 1,000-sample microbenches.

Modes
  drive     (default) build the inputs, launch the campaign subprocess,
            SIGKILL it after --kill-after seconds, relaunch to
            completion, then write docs/profiles/volume_drill.{md,json}
  campaign  internal: run `SpatialEnginePipeline.run_all` at volume
            counts against --root (resumable: rerunning skips every
            manifest-complete unit)

Counts (full scale, --scale full; 24 scenes x 296 posed images):
  camera movement   9 question types x 110K train + 300 val each
  depth est/comp    coor <=60K train + 15K eval each (8 pts/image);
                    dot 8K + 2K each (annotated 480x640 JPEGs)
  correspondence    coor->coor 60K + 15K; dot->MC 2.4K + 600 (2 JPEGs
                    per record)
  object perception coverage-driven (all samples, train + val)
  object movement   24 TAPVid sequences, coord + dot (annotated)
  total             >=1.3M records + ~30K annotated JPEGs

Run on the real chip: `python scripts/volume_drill.py` (~10-25 min
including the mid-run kill; tunnel latency dominates the stage math).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# camera-movement balanced sampling draws WITHOUT replacement per
# overlap bin (engines/sampling.py, reference parity), so per-type
# counts are bounded by qualifying relation pairs: 24 scenes x 296
# images ~= 1.05M raw pairs, ~40% in the 6-35% overlap band -> ~400K
# qualifying, comfortably above the 110K/type requests below.
CAMERA_TRAIN = {
    "total_distance": 110_000, "displacement_vector": 110_000,
    "x_movement": 110_000, "y_movement": 110_000, "z_movement": 110_000,
    "yaw_movement": 110_000, "pitch_movement": 110_000,
    "yaw_angle": 110_000, "pitch_angle": 110_000,
}
SMOKE_DIV = 500  # --scale smoke: structural pass in ~a minute on CPU


def _counts(scale: str) -> dict:
    d = SMOKE_DIV if scale == "smoke" else 1
    return {
        "camera_train": {k: max(v // d, 10)
                         for k, v in CAMERA_TRAIN.items()},
        "camera_val": {k: max(300 // d, 3) for k in CAMERA_TRAIN},
        "depth": max(60_000 // d, 20),
        "depth_dot": max(8_000 // d, 8),
        "depth_ppi": 8,  # 24 x 296 images x 8 pts ~= 57K estimation rows
        "corr": max(60_000 // d, 20),
        "corr_dot": max(2_400 // d, 8),
        "n_scenes": 24 if scale == "full" else 2,
        "n_tapvid": 24 if scale == "full" else 3,
    }


def _check_marker(root: str, scale: str) -> "str | None":
    """The store marker records the scale it was built at; a --root
    reused at a DIFFERENT scale must error, not silently reuse the old
    store + manifest (r5 review: smoke-then-full on the default root
    produced a 'full' report over the 2-scene smoke store)."""
    marker = os.path.join(root, "scenes", ".complete")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        built = f.read().strip()
    if built != scale:
        raise SystemExit(
            f"{root} was built at scale={built or '<unknown>'} but this "
            f"run asks for scale={scale}; pass a fresh --root (the store "
            f"AND out/manifest.jsonl there belong to the old scale)")
    return built


def build_inputs(root: str, scale: str) -> None:
    """Synthetic store at ScanNet-export geometry (480x640 frames,
    120x160 depth) + TAPVid sequences; idempotent per scale."""
    from multi_spatialmllm_tpu.core.scene import SceneStore
    from multi_spatialmllm_tpu.core.synthetic import (
        make_scene,
        make_tapvid_npz,
    )

    c = _counts(scale)
    scene_dir = os.path.join(root, "scenes")
    if _check_marker(root, scale) is None:
        scenes = [
            make_scene(scene_id=f"vol{i:04d}_00", seed=7_000 + i,
                       n_images=296 if scale == "full" else 10,
                       n_background=40_000 if scale == "full" else 2_000,
                       n_objects=5, image_hw=(480, 640),
                       depth_hw=(120, 160), n_invalid_poses=1)
            for i in range(c["n_scenes"])
        ]
        SceneStore.write(scenes, scene_dir)
        with open(os.path.join(scene_dir, ".complete"), "w") as f:
            f.write(scale + "\n")
    del make_tapvid_npz  # TAPVid records are rebuilt in-memory (seeded)


def campaign(root: str, scale: str) -> None:
    import multi_spatialmllm_tpu as msm
    from multi_spatialmllm_tpu.core.scene import SceneStore
    from multi_spatialmllm_tpu.core.synthetic import make_tapvid_npz
    from multi_spatialmllm_tpu.pipeline import (
        PipelineConfig,
        SpatialEnginePipeline,
    )

    msm.enable_compilation_cache()
    c = _counts(scale)
    build_inputs(root, scale)
    store = SceneStore(os.path.join(root, "scenes"))
    tapvid = {
        f"volseq{i:03d}": make_tapvid_npz(n_frames=12, n_groups=4,
                                          points_per_group=10,
                                          seed=9_000 + i)
        for i in range(c["n_tapvid"])
    }
    pipe = SpatialEnginePipeline(
        store, os.path.join(root, "out"),
        PipelineConfig(dtype="hybrid"))
    results = pipe.run_all(
        tapvid_records=tapvid,
        camera_train_counts=c["camera_train"],
        camera_val_counts=c["camera_val"],
        depth_samples=c["depth"],
        depth_dot_samples=c["depth_dot"],
        depth_points_per_image=c["depth_ppi"],
        correspondence_count=c["corr"],
        correspondence_dot_count=c["corr_dot"],
    )
    summary = {}
    for group, res in results.items():
        if hasattr(res, "n_train"):
            summary[group] = {"n_train": res.n_train, "n_val": res.n_val}
            continue
        summary[group] = {
            k: {"n_train": getattr(v, "n_train", 0),
                "n_val": getattr(v, "n_val", 0)}
            for k, v in res.items()}
    with open(os.path.join(root, "campaign_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("CAMPAIGN_DONE")


def _walk_outputs(root: str) -> dict:
    """Count records/images/bytes under out/qa."""
    n_records = n_images = total_bytes = 0
    per_engine: dict[str, dict] = {}
    qa = os.path.join(root, "out", "qa")
    for dirpath, _, files in os.walk(qa):
        for fname in files:
            p = os.path.join(dirpath, fname)
            sz = os.path.getsize(p)
            total_bytes += sz
            rel = os.path.relpath(dirpath, qa)
            engine = rel.split(os.sep)[1] if os.sep in rel else rel
            ent = per_engine.setdefault(
                engine, {"records": 0, "images": 0, "bytes": 0})
            ent["bytes"] += sz
            if fname.endswith(".jsonl"):
                with open(p, "rb") as f:
                    n = sum(1 for _ in f)
                ent["records"] += n
                n_records += n
            elif fname.endswith((".jpg", ".jpeg", ".png")):
                ent["images"] += 1
                n_images += 1
    return {"records": n_records, "images": n_images,
            "bytes": total_bytes, "per_engine": per_engine}


def _manifest_units(root: str) -> list[str]:
    path = os.path.join(root, "out", "manifest.jsonl")
    units = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:  # the campaign may be mid-append: a partially
                    rec = json.loads(line)  # flushed tail line is never
                except json.JSONDecodeError:  # a completed unit
                    continue
                units.append(f'{rec["stage"]}:{rec["unit"]}')
    return units


def drive(root: str, scale: str, kill_after: float) -> None:
    os.makedirs(root, exist_ok=True)
    _check_marker(root, scale)  # fail fast on a scale-mismatched root
    cmd = [sys.executable, os.path.abspath(__file__), "--mode", "campaign",
           "--root", root, "--scale", scale]
    log1 = os.path.join(root, "phase1.log")
    log2 = os.path.join(root, "phase2.log")

    # Phase 1: run + SIGKILL mid-campaign (no cleanup chance — the
    # resume path must cope with whatever was on disk at that instant).
    # The kill fires as soon as `kill_units` NEW manifest units complete
    # (so it reliably lands MID-campaign whatever the wall time, and a
    # pre-populated manifest cannot trigger it instantly);
    # `kill_after` is the fallback bound.
    kill_units = 8
    base_units = len(_manifest_units(root))
    t0 = time.time()
    with open(log1, "w") as lf:
        proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT)
        killed = False
        try:
            while proc.poll() is None:
                done = len(_manifest_units(root)) - base_units
                if done >= kill_units or time.time() - t0 >= kill_after:
                    proc.send_signal(signal.SIGKILL)
                    proc.wait()
                    killed = True
                    break
                time.sleep(2.0)
        finally:
            if proc.poll() is None:  # poller crashed: never orphan the
                proc.kill()          # full-scale campaign subprocess
                proc.wait()
    t_phase1 = time.time() - t0
    units_at_kill = _manifest_units(root)
    outputs_at_kill = _walk_outputs(root)
    if not killed:
        print("WARNING: campaign finished before the kill timer — "
              "report will show a completed phase 1 (raise --kill-after "
              "realism by lowering it)")

    # Phase 2: resume to completion.
    t0 = time.time()
    with open(log2, "w") as lf:
        rc = subprocess.call(cmd, stdout=lf, stderr=subprocess.STDOUT)
    t_phase2 = time.time() - t0
    if rc != 0:
        print(f"RESUME FAILED rc={rc}; see {log2}")
        sys.exit(rc)

    units_final = _manifest_units(root)
    outputs = _walk_outputs(root)
    report = {
        "scale": scale,
        "killed_mid_run": killed,
        "phase1_s": round(t_phase1, 1),
        "phase2_s": round(t_phase2, 1),
        "wall_s": round(t_phase1 + t_phase2, 1),
        "units_complete_at_kill": len(units_at_kill),
        "units_total": len(units_final),
        "units_resumed": len(units_final) - len(units_at_kill),
        "records_at_kill": outputs_at_kill["records"],
        "records": outputs["records"],
        "images": outputs["images"],
        "bytes": outputs["bytes"],
        "records_per_s": round(
            outputs["records"] / max(t_phase1 + t_phase2, 1e-9), 1),
        "units_at_kill": units_at_kill,
        "per_engine": outputs["per_engine"],
    }
    out_json = os.path.join(root, "volume_drill.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("per_engine", "units_at_kill")}))
    print(f"report: {out_json}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("drive", "campaign"),
                    default="drive")
    ap.add_argument("--root", default="/tmp/volume_drill")
    ap.add_argument("--scale", choices=("full", "smoke"), default="full")
    ap.add_argument("--kill-after", type=float, default=240.0,
                    help="SIGKILL the phase-1 campaign after this many "
                         "seconds (drive mode)")
    args = ap.parse_args()
    if args.mode == "campaign":
        campaign(args.root, args.scale)
    else:
        drive(args.root, args.scale, args.kill_after)


if __name__ == "__main__":
    main()
