"""Speech-to-gesture inference + SMPL-X npz/video export
(reference tools/s2g_visualize.py:40-367).

For each BEAT2 test recording: windowed long-form generation (same RePaint
machinery as tools/s2g_test.py), de-normalize, export smoothed result + GT
SMPL-X npz pairs, and optionally render (mesh video when pyrender/smplx
assets exist, FK stick-figure otherwise).

Usage:
  python tools/s2g_visualize.py configs/stmogen/s2g_beats2_0125b.py \
      --checkpoint outputs/s2g/params.npz --out outputs/s2g_vis --limit 1
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--beats2-args", default="configs/beat2/st_mogen_emage.yaml")
    p.add_argument("--out", default="outputs/s2g_vis")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=None, help="max recordings")
    p.add_argument("--no_repaint", action="store_true")
    p.add_argument("--same_overlap_noisy", action="store_true")
    p.add_argument("--no-smooth", action="store_true",
                   help="skip the export-time temporal gaussian filters")
    p.add_argument("--render", action="store_true",
                   help="also render a video per clip (mesh if assets exist, "
                        "FK stick-figure otherwise)")
    p.add_argument("--web", action="store_true",
                   help="standalone HTML skeleton player per clip "
                        "(utils/web_player.py)")
    p.add_argument("--cfg-options", nargs="*", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import motioncraft_tpu.models  # noqa: F401
    import motioncraft_tpu.data  # noqa: F401
    from motioncraft_tpu.apis.windowed import denormalize, windowed_sample
    from motioncraft_tpu.config import Config, cfg_options_from_args
    from motioncraft_tpu.data.beat2 import load_beat2_args, load_recordings
    from motioncraft_tpu.data.datasets import beat2_pose_to_smplx322
    from motioncraft_tpu.diffusion.sampling import RepaintConfig
    from motioncraft_tpu.models.tokenizer import tokenize
    from motioncraft_tpu.registry import build_architecture
    from motioncraft_tpu.utils.export import gt_export_npz, s2g_export_npz

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(cfg_options_from_args(args.cfg_options))
    os.makedirs(args.out, exist_ok=True)

    win_cfg = cfg.get("windowed", {})
    window = win_cfg.get("window", 64)
    pre = win_cfg.get("pre_frames", 4)
    fps = win_cfg.get("pose_fps", 30)
    sr = win_cfg.get("audio_sr", 16000)
    spf = sr // fps

    arch = build_architecture(cfg.model)
    arch.repaint_cfg = RepaintConfig(overlap_len=pre,
                                     same_overlap_noisy=args.same_overlap_noisy,
                                     no_repaint=args.no_repaint)

    bargs = load_beat2_args(args.beats2_args)
    recordings = load_recordings(bargs, "test")[: args.limit]
    if not recordings:
        print("no BEAT2 test recordings found under", bargs.data_path)
        return
    mean = np.load(bargs.mean_pose_path) if bargs.mean_pose_path and os.path.isfile(
        bargs.mean_pose_path) else np.zeros(322, np.float32)
    std = np.load(bargs.std_pose_path) if bargs.std_pose_path and os.path.isfile(
        bargs.std_pose_path) else np.ones(322, np.float32)

    variables = None
    rng = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for ri, rec in enumerate(recordings):
        T = len(rec["pose"])
        gt322 = beat2_pose_to_smplx322(rec["pose"], rec["facial"], rec["trans"])
        audio = rec["audio"]

        def caption(start, end):
            words = []
            for (s, e, w) in rec["word_spans"]:
                if w and s < end / fps and e > start / fps and w not in words:
                    words.append(w)
            return ("A person is doing a speech, and the speech content is "
                    + " ".join(words))

        def make_window_batch(start, end):
            seg = audio[start * spf:end * spf]
            if len(seg) < (end - start) * spf:
                seg = np.pad(seg, ((0, (end - start) * spf - len(seg)), (0, 0)))
            return {"motion": np.zeros((1, window, 322), np.float32),
                    "motion_mask": np.ones((1, window), np.float32),
                    "motion_length": np.full((1, 1), window, np.int32),
                    "text_ids": tokenize([caption(start, end)]),
                    "c": np.asarray(seg, np.float32)[None]}

        if variables is None:
            variables = arch.init(jax.random.PRNGKey(args.seed),
                                  make_window_batch(0, window))
            if args.checkpoint:
                from motioncraft_tpu.utils.checkpoint import load_params
                variables = load_params(args.checkpoint)

        rng, sub = jax.random.split(rng)
        norm_pred = windowed_sample(arch, variables, make_window_batch,
                                    total_frames=T, window=window, pre_frames=pre,
                                    rng=sub, use_repaint=not args.no_repaint,
                                    repaint=arch.repaint_cfg)
        pred322 = denormalize(norm_pred, mean, std)
        gt322 = gt322[: len(pred322)]

        betas = rec.get("betas")
        res_path = os.path.join(args.out, f"res_{rec['name']}.npz")
        gt_path = os.path.join(args.out, f"gt_{rec['name']}.npz")
        s2g_export_npz(pred322, res_path, betas=betas, fps=fps,
                       smooth=not args.no_smooth)
        gt_export_npz(gt322, gt_path, betas=betas, fps=fps)
        print(f"[{ri + 1}/{len(recordings)}] {rec['name']}: T={len(pred322)} "
              f"-> {res_path} ({time.time() - t0:.1f}s)", flush=True)
        if args.render:
            from motioncraft_tpu.utils.render import render_one_sequence
            wav_path = rec.get("wav_path")
            render_one_sequence(res_path,
                                os.path.join(args.out, f"res_{rec['name']}.mp4"),
                                audio_path=wav_path, fps=fps)
        if args.web:
            from motioncraft_tpu.ops.fk import SMPLX_PARENTS
            from motioncraft_tpu.utils.export import fk_joints_322
            from motioncraft_tpu.utils.web_player import export_web_player
            export_web_player(fk_joints_322(pred322), SMPLX_PARENTS,
                              os.path.join(args.out, f"res_{rec['name']}.html"),
                              fps=fps, title=rec["name"])


if __name__ == "__main__":
    main()
