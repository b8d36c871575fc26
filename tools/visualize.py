"""Text-to-motion inference + export (reference tools/visualize.py:46-273).

Builds the model, samples motions for the given prompts via the jitted DDIM
scan, de-normalizes, and saves SMPL-X .npz files (axis-angle layout remap at
reference :244-253, with optional temporal gaussian smoothing).  Mesh-video
rendering requires pyrender/smplx assets and is gated (use --render when the
environment provides them); a matplotlib stick-figure render of FK joints is
always available with --plot.

Usage:
  python tools/visualize.py configs/stmogen/t2m_motionx_0_125b.py \
      --checkpoint params.npz --text "a person walks in a circle" \
      --motion_length 120 --out outputs/vis
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--text", nargs="+", required=True)
    p.add_argument("--motion_length", type=int, nargs="+", default=None)
    p.add_argument("--out", default="outputs/vis")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--smooth", type=float, default=0.0,
                   help="temporal gaussian smoothing sigma (frames)")
    p.add_argument("--plot", action="store_true", help="matplotlib FK skeleton video")
    p.add_argument("--web", action="store_true",
                   help="standalone HTML skeleton player per sample "
                        "(utils/web_player.py — the pymo mocapplayer "
                        "equivalent, no server/JS deps)")
    p.add_argument("--cfg-options", nargs="*", default=None)
    return p.parse_args()


def smplx322_to_npz(motion: np.ndarray, path: str, fps: int = 30,
                    smooth_sigma: float = 0.0):
    """322-d vector -> SMPL-X npz (poses [T,165], expressions, trans, betas),
    the reference's export layout (visualize.py:244-253)."""
    if smooth_sigma > 0:
        from scipy.ndimage import gaussian_filter1d
        motion = gaussian_filter1d(motion, smooth_sigma, axis=0)
    T = motion.shape[0]
    poses = np.zeros((T, 165), np.float32)
    poses[:, :66] = motion[:, :66]
    poses[:, 66:69] = motion[:, 156:159]
    poses[:, 75:165] = motion[:, 66:156]
    np.savez(path,
             poses=poses,
             expressions=motion[:, 209:309],
             trans=motion[:, 309:312],
             betas=np.zeros(300, np.float32),
             mocap_frame_rate=np.asarray(fps),
             gender="neutral", model="smplx2020")


def main():
    args = parse_args()
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import motioncraft_tpu.models  # noqa: F401
    from motioncraft_tpu.apis.factory import make_text_batch
    from motioncraft_tpu.config import Config, cfg_options_from_args
    from motioncraft_tpu.registry import build_architecture

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(cfg_options_from_args(args.cfg_options))
    os.makedirs(args.out, exist_ok=True)

    max_seq_len = cfg.model["model"].get("max_seq_len", 196)
    input_feats = cfg.model["model"].get("input_feats", 322)
    lengths = args.motion_length or [max_seq_len] * len(args.text)
    lengths = np.asarray(lengths, np.int32).reshape(-1, 1)

    arch = build_architecture(cfg.model)
    batch = make_text_batch(args.text, max_seq_len=max_seq_len,
                            input_feats=input_feats, lengths=lengths)
    variables = arch.init(jax.random.PRNGKey(args.seed), batch)
    if args.checkpoint:
        from motioncraft_tpu.utils.checkpoint import load_params
        variables = load_params(args.checkpoint)

    pred = np.asarray(jax.jit(lambda v, b, r: arch.sample(v, b, r))(
        variables, batch, jax.random.PRNGKey(args.seed + 1)))

    # de-normalize with the dataset stats when available
    norm_cfg = None
    for step in (cfg.get("data", {}).get("test", {}) or {}).get("pipeline", []):
        if step.get("type") == "Normalize":
            norm_cfg = step
    if norm_cfg and os.path.isfile(norm_cfg["mean_path"]):
        mean, std = np.load(norm_cfg["mean_path"]), np.load(norm_cfg["std_path"])
        pred = pred * (std + 1e-9) + mean

    for i, text in enumerate(args.text):
        T = int(lengths[i, 0])
        clip = pred[i, :T]
        path = os.path.join(args.out, f"sample_{i}.npz")
        if input_feats == 322:
            smplx322_to_npz(clip, path, args.fps, args.smooth)
        else:
            np.savez(path, motion=clip)
        print(f"[{i}] {text!r} -> {path} ({T} frames)")
        if args.plot and input_feats == 322:
            plot_skeleton(clip, os.path.join(args.out, f"sample_{i}.mp4"), args.fps)
        if args.web and input_feats == 322:
            from motioncraft_tpu.ops.fk import SMPLX_PARENTS
            from motioncraft_tpu.utils.export import fk_joints_322
            from motioncraft_tpu.utils.web_player import export_web_player
            html = export_web_player(fk_joints_322(clip), SMPLX_PARENTS,
                                     os.path.join(args.out, f"sample_{i}.html"),
                                     fps=args.fps, title=text)
            print(f"  web player -> {html}")


def plot_skeleton(motion322: np.ndarray, path: str, fps: int):
    """Matplotlib 3D stick-figure video of FK joints."""
    from motioncraft_tpu.ops.fk import SMPLX_PARENTS
    from motioncraft_tpu.utils.export import fk_joints_322
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    T = motion322.shape[0]
    joints = fk_joints_322(motion322)

    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")

    def draw(t):
        ax.cla()
        ax.set_xlim(-1, 1); ax.set_ylim(-1, 1); ax.set_zlim(-1, 1)
        j = joints[t]
        for i, p in enumerate(SMPLX_PARENTS):
            if p < 0:
                continue
            ax.plot([j[i, 0], j[p, 0]], [j[i, 2], j[p, 2]], [j[i, 1], j[p, 1]],
                    "b-", lw=1)
        ax.set_title(f"frame {t}")

    anim = animation.FuncAnimation(fig, draw, frames=T, interval=1000 / fps)
    try:
        anim.save(path, fps=fps)
        print(f"  skeleton video -> {path}")
    except Exception as e:  # no ffmpeg
        alt = path.replace(".mp4", ".gif")
        try:
            anim.save(alt, writer="pillow", fps=fps)
            print(f"  skeleton video -> {alt}")
        except Exception:
            print(f"  video export unavailable ({e}); npz saved")
    plt.close(fig)


if __name__ == "__main__":
    main()
