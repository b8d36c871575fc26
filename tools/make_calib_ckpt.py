"""Train a short synthetic-data checkpoint for step-cache calibration.

SmoothCache-style calibration (tools/calibrate_step_cache.py) needs residual
dynamics that look like a *trained* denoiser's: an untrained model either has
exactly-zero layer residuals (zero-init output heads) or, perturbed, produces
noise-like residuals whose step-to-step change never drops below any sane
reuse threshold.  This script overfits the flagship topology on a bank of
smooth synthetic motions (sinusoid mixtures at the protocol 196x322 shape) for
a few hundred steps — enough for the denoiser to predict smooth x0 and show
the slowly-varying mid-trajectory residuals SmoothCache exploits — and saves
an .npz param snapshot for ``calibrate_step_cache.py --checkpoint``.

NOT a released-quality model: the resulting calibration artifact must carry a
provenance note saying so (see artifacts/step_cache_flagship.json "note").

Usage:
  python tools/make_calib_ckpt.py configs/tests/flagship_calib.py out.npz \
      [--steps 400] [--batch-size 8] [--lr 2e-4] [--seed 0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROMPTS = [
    "a person walks forward slowly",
    "a person waves both hands in the air",
    "a person jumps up and down in place",
    "a person sits down on the ground",
    "a person runs in a circle",
    "a person stretches both arms overhead",
    "a person crouches and stands back up",
    "a person turns around and walks away",
]


def make_dataset(T: int, D: int, n: int, seed: int):
    """Smooth per-prompt motions: sinusoid banks the denoiser can memorise."""
    rng = np.random.RandomState(seed)
    t = np.linspace(0.0, 1.0, T, dtype=np.float32)
    K = len(PROMPTS)
    freqs = rng.uniform(0.5, 3.0, size=(K, D)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, size=(K, D)).astype(np.float32)
    amp = rng.uniform(0.3, 1.0, size=(K, D)).astype(np.float32)
    patterns = amp[:, None, :] * np.sin(
        2 * np.pi * freqs[:, None, :] * t[None, :, None] + phase[:, None, :])

    class DS:
        def __len__(self):
            return n

        def __getitem__(self, i):
            k = i % K
            return {"motion": patterns[k],
                    "motion_mask": np.ones((T,), np.float32),
                    "motion_length": T,
                    "motion_metas": {"text": PROMPTS[k]}}

    return DS()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("out", help="output .npz param snapshot")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import motioncraft_tpu.models  # noqa: F401
    from motioncraft_tpu.apis.train import train_model
    from motioncraft_tpu.config import Config
    from motioncraft_tpu.data.loader import DataLoader
    from motioncraft_tpu.registry import build_architecture
    from motioncraft_tpu.utils.checkpoint import save_params
    from motioncraft_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config.fromfile(args.config)
    arch = build_architecture(cfg.model)
    T = cfg.model["model"].get("max_seq_len", 196)
    D = cfg.model["model"].get("input_feats", 322)

    ds = make_dataset(T, D, n=args.batch_size * 8, seed=args.seed)
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                        num_workers=0, seed=args.seed)
    steps_per_epoch = len(ds) // args.batch_size
    epochs = max(1, -(-args.steps // steps_per_epoch))
    losses = []

    def logger(msg):
        print(msg, file=sys.stderr)
        for tok in msg.split():
            if tok.startswith("loss="):
                losses.append(float(tok.split("=")[1]))

    state = train_model(arch, loader,
                        optimizer_cfg={"type": "Adam", "lr": args.lr},
                        max_epochs=epochs, seed=args.seed,
                        log_interval=steps_per_epoch, logger=logger)
    if losses and not losses[-1] < losses[0]:
        print(f"WARNING: loss did not decrease ({losses[0]} -> {losses[-1]})",
              file=sys.stderr)
    variables = {"params": state.params}
    if state.extra_variables:
        variables.update(state.extra_variables)
    save_params(args.out, variables)
    print(f"{epochs * steps_per_epoch} steps, loss "
          f"{losses[0] if losses else float('nan'):.4f} -> "
          f"{losses[-1] if losses else float('nan'):.4f}; saved -> {args.out}")


if __name__ == "__main__":
    main()
