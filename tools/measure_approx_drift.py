"""Measure end-to-end metric drift of the approximate sampling modes.

The repo's headline throughput levers (--step-cache N, the calibrated
step-cache table, --int8) are APPROXIMATE: until this harness, their only
quality evidence was unit-level sample error bounds.  The reference ties
every reported sampler setting to its metric table
(/root/reference/configs/stmogen/remodiffuse..._0_125b.py:93-101 pins the
respacing used for the published numbers); this is the equivalent for our
approximate modes.

Runs the 20-replication T2M protocol eval (tools/test.py over
configs/tests/protocol_learn.py with the TRAINED small contrastive evaluator
from tools/train_protocol_evaluator.py) once per mode on the SAME checkpoint
and seed, then reports per-mode deltas vs the exact bf16 run:

  - dFID, dR-precision top1/2/3, dMatching, dDiversity (protocol metrics)
  - sample-space relative error (same seed => same noise; elementwise
    comparable dumps via tools/test.py --dump-samples)

Writes artifacts/approx_drift.json.  Runs the modes SEQUENTIALLY (one TPU
process at a time — the device lock serializes anyway and two processes
deadlock-spin, see .claude/skills/verify).

Usage:
  python tools/measure_approx_drift.py \
      --config configs/tests/protocol_learn.py \
      --checkpoint outputs/soak_r05/params.npz \
      [--table artifacts/step_cache_soak_r05.json] \
      [--out artifacts/approx_drift.json] [--replications 20] [--limit N]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

METRIC_KEYS = [
    "R_precision Top 1 (mean)", "R_precision Top 2 (mean)",
    "R_precision Top 3 (mean)", "Matching Score (mean)", "FID (mean)",
    "Diversity (mean)",
]


def run_mode(name, extra, args, workdir):
    dump = os.path.join(workdir, "samples.npz")
    metrics_path = os.path.join(workdir, "metrics.json")
    if os.path.isfile(metrics_path) and os.path.isfile(dump):
        # resume: a killed harness re-run skips completed modes (each mode
        # is 10-40 min of TPU time; the per-mode workdirs are the record)
        print(f"[{name}] already complete, reusing {workdir}", flush=True)
        with open(metrics_path) as f:
            return json.load(f), dump, 0.0
    cmd = [sys.executable, os.path.join(REPO, "tools", "test.py"),
           args.config, workdir,
           "--checkpoint", args.checkpoint, "--seed", str(args.seed),
           "--bf16", "--dump-samples", dump] + extra
    if args.dispatch_batches > 1:
        cmd += ["--dispatch-batches", str(args.dispatch_batches)]
    if args.batch_size:
        cmd += ["--batch-size", str(args.batch_size)]
    if args.limit:
        cmd += ["--limit", str(args.limit)]
    if args.replications:
        cmd += ["--cfg-options",
                f"data.test.eval_cfg.replication_times={args.replications}"]
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        raise SystemExit(f"mode {name} failed (rc={r.returncode})")
    wall = time.time() - t0
    with open(os.path.join(workdir, "metrics.json")) as f:
        metrics = json.load(f)
    return metrics, dump, wall


def sample_err(exact_npz, mode_npz):
    """Per-clip relative L2 error over valid frames; mean / p95 / max."""
    a = np.load(exact_npz)
    b = np.load(mode_npz)
    xa, xb = a["pred_motion"], b["pred_motion"]
    n = min(len(xa), len(xb))
    errs = []
    for i in range(n):
        t = int(a["motion_length"][i])
        va, vb = xa[i, :t].ravel(), xb[i, :t].ravel()
        denom = float(np.linalg.norm(va)) or 1.0
        errs.append(float(np.linalg.norm(va - vb)) / denom)
    errs = np.asarray(errs)
    return {"mean": float(errs.mean()), "p95": float(np.percentile(errs, 95)),
            "max": float(errs.max()), "n_clips": int(n)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/tests/protocol_learn.py")
    p.add_argument("--checkpoint", default="outputs/soak_r05/params.npz")
    p.add_argument("--table", default=None,
                   help="calibrated step-cache table (skip the table mode "
                        "when absent)")
    p.add_argument("--out", default="artifacts/approx_drift.json")
    p.add_argument("--workroot", default="outputs/drift")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--dispatch-batches", type=int, default=8,
                   help="K loader batches per device dispatch (bit-identical "
                        "predictions; amortizes remote-tunnel overhead)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--replications", type=int, default=None,
                   help="override eval_cfg.replication_times (default: "
                        "config value, 20 = protocol)")
    p.add_argument("--modes", nargs="*", default=None,
                   help="subset of {exact,step_cache_2,step_cache_table,"
                        "int8w,int8} to run")
    args = p.parse_args()

    modes = [("exact", [])]
    modes.append(("step_cache_2", ["--step-cache", "2"]))
    if args.table:
        modes.append(("step_cache_table", ["--step-cache-table", args.table]))
    modes.append(("int8w", ["--int8-mode", "w8"]))
    modes.append(("int8", ["--int8-mode", "w8a8"]))
    if args.modes:
        keep = set(args.modes) | {"exact"}
        modes = [m for m in modes if m[0] in keep]

    results, dumps = {}, {}
    for name, extra in modes:
        wd = os.path.join(args.workroot, name)
        os.makedirs(wd, exist_ok=True)
        metrics, dump, wall = run_mode(name, extra, args, wd)
        results[name] = {"metrics": {k: metrics[k] for k in METRIC_KEYS
                                     if k in metrics},
                         "flags": metrics.get("flags"),
                         "wall_s": round(wall, 1)}
        dumps[name] = dump

    exact = results["exact"]["metrics"]
    for name in results:
        if name == "exact":
            continue
        m = results[name]["metrics"]
        results[name]["delta_vs_exact"] = {
            k: round(m[k] - exact[k], 6) for k in m if k in exact}
        results[name]["sample_rel_err"] = sample_err(dumps["exact"],
                                                     dumps[name])

    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                         capture_output=True, text=True).stdout.strip()
    out = {
        "config": args.config, "checkpoint": args.checkpoint,
        "table": args.table, "seed": args.seed, "limit": args.limit,
        "replications_override": args.replications, "git_rev": rev,
        "note": "deltas are mode - exact on the SAME trained checkpoint, "
                "same seed, same protocol eval (20 shuffled replications "
                "unless overridden); evaluator is the small TRAINED "
                "contrastive model (tools/train_protocol_evaluator.py), so "
                "ranking metrics are discriminative (chance top-1 = 1/32)",
        "modes": results,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
