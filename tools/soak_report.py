"""Summarize a TPU train-soak run into a committed artifact.

Parses the work-dir train.log (which appends across --resume restarts) into
artifacts/train_soak_*.json: loss curve, resume events, per-epoch timing,
steps/s, and the reference recipe this mirrors (tools/dist_train.sh:1-10 /
configs/stmogen/...0_125b.py:13-17 — Adam 2e-4, step decay @10, global
batch via --grad-accum).

Usage:
  python tools/soak_report.py --work-dir outputs/soak_r05 \
      --out artifacts/train_soak_r05.json \
      --note "killed at epoch 13 mid-checkpoint-write; resumed twice"
"""

import argparse
import json
import os
import re


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work-dir", default="outputs/soak_r05")
    p.add_argument("--out", default="artifacts/train_soak_r05.json")
    p.add_argument("--config", default="configs/tests/protocol_learn.py")
    p.add_argument("--note", default=None)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--grad-accum", type=int, default=2)
    args = p.parse_args()

    log = open(os.path.join(args.work_dir, "train.log")).read()
    losses = [
        {"epoch": int(e), "step": int(s), "loss": float(l),
         "moe_route_loss": float(m), "recon_loss": float(r)}
        for e, s, l, m, r in re.findall(
            r"epoch (\d+) step (\d+): loss=([\d.]+) moe_route_loss=([\d.]+) "
            r"recon_loss=([\d.]+)", log)]
    epochs = [{"epoch": int(e), "seconds": float(s)}
              for e, s in re.findall(r"epoch (\d+) done in ([\d.]+)s", log)]
    resumes = re.findall(r"resumed from \S+ at epoch (\d+)", log)
    saves = re.findall(r"saved checkpoint at epoch (\d+)", log)
    final_step = max((x["step"] for x in losses), default=0)
    # steady-state steps/s from post-compile epochs (epoch 0 includes jit)
    steady = [e["seconds"] for e in epochs if e["epoch"] > 0]
    steps_per_epoch = None
    m = re.search(r"dataset: (\d+) samples, (\d+) steps/epoch", log)
    if m:
        steps_per_epoch = int(m.group(2)) // args.grad_accum

    out = {
        "config": args.config,
        "work_dir": args.work_dir,
        "model": "0.125B STMoGen flagship topology (t2m_motionx_0_125b base)",
        "recipe": "Adam 2e-4 step-decay@10 (reference recipe), "
                  f"batch {args.batch} x grad-accum {args.grad_accum} "
                  f"(= global {args.batch * args.grad_accum})",
        "data": "learnable 32-class protocol tree "
                "(make_tiny_data --protocol-learnable, 1024 x 196 x 322)",
        "optimizer_steps": final_step,
        "epochs_completed": max((e["epoch"] for e in epochs), default=-1) + 1,
        "resume_events": [int(r) for r in resumes],
        "checkpoints_saved": len(saves),
        "loss_first": losses[0]["loss"] if losses else None,
        "loss_last": losses[-1]["loss"] if losses else None,
        "loss_curve": losses,
        "steady_epoch_seconds_median": (sorted(steady)[len(steady) // 2]
                                        if steady else None),
        "steps_per_epoch": steps_per_epoch,
        "compile_epoch0_seconds": next((e["seconds"] for e in epochs
                                        if e["epoch"] == 0), None),
        "note": args.note,
    }
    if steady and steps_per_epoch:
        med = out["steady_epoch_seconds_median"]
        out["steady_samples_per_s"] = round(
            args.batch * args.grad_accum * steps_per_epoch / med, 1)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "loss_curve"},
                     indent=2))
    print(f"wrote {args.out} ({len(losses)} loss points)")


if __name__ == "__main__":
    main()
