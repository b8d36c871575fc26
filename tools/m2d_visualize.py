"""Music-to-dance inference + SMPL-X npz/video export
(reference tools/m2d_visualize.py:120-285).

Given FineDance track ids: builds the style caption from the label json
("A dancer is performing a {style1} dance in the {style2} style to the
rhythm of the {name} song."), slices the 163-d music features (360-frame
head trim, then ``slice_idx`` windows of ``motion_length`` frames), samples
one window with the jitted DDIM scan, de-normalizes, and exports an SMPL-X
npz with the reference's 6d-rotation-space gaussian smoothing.

Usage:
  python tools/m2d_visualize.py configs/stmogen/m2d_finedance_0125b.py \
      --checkpoint outputs/m2d/params.npz --track 063 --motion_length 120
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--track", nargs="+", required=True,
                   help="FineDance track ids (label/music npy basenames)")
    p.add_argument("--motion_length", type=int, default=120,
                   help="frames per generated window (120..196)")
    p.add_argument("--slice-idx", type=int, default=0,
                   help="which motion_length-sized music window to condition on")
    p.add_argument("--out", default="outputs/m2d_vis")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--no-smooth", action="store_true")
    p.add_argument("--render", action="store_true",
                   help="also render a video (mesh if assets exist, FK "
                        "stick-figure otherwise)")
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
    from motioncraft_tpu.config import Config, cfg_options_from_args
    from motioncraft_tpu.models.tokenizer import tokenize
    from motioncraft_tpu.registry import build_architecture
    from motioncraft_tpu.utils.export import m2d_export_npz

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(cfg_options_from_args(args.cfg_options))
    os.makedirs(args.out, exist_ok=True)

    test_cfg = cfg.data["test"]
    data_prefix = test_cfg.get("data_prefix", "./data")
    dname = test_cfg.get("dataset_name", "finedance")
    droot = os.path.join(data_prefix, "datasets", dname)
    L = args.motion_length
    if not 120 <= L <= 196:
        print(f"warning: motion_length={L} outside the FineDance range "
              "[120, 196] (reference m2d_visualize.py:180)")

    # de-normalization stats
    mean_path = os.path.join(droot, "mean.npy")
    mean = np.load(mean_path) if os.path.isfile(mean_path) else np.zeros(322, np.float32)
    std_path = os.path.join(droot, "std.npy")
    std = np.load(std_path) if os.path.isfile(std_path) else np.ones(322, np.float32)

    arch = build_architecture(cfg.model)
    variables = None
    rng = jax.random.PRNGKey(args.seed)

    for track in args.track:
        label_path = os.path.join(droot, "label_json", track + ".json")
        if os.path.isfile(label_path):
            with open(label_path) as f:
                label = json.load(f)
            text = (f"A dancer is performing a {label['style1']} dance in the "
                    f"{label['style2']} style to the rhythm of the "
                    f"{label['name']} song.")
        else:
            text = f"A dancer is performing to the rhythm of song {track}."
            print(f"  (no label json at {label_path}; using generic caption)")

        music_path = os.path.join(droot, "music_npy", track + ".npy")
        if os.path.isfile(music_path):
            music = np.load(music_path).astype(np.float32)[360:]
            music = music[args.slice_idx * L:(args.slice_idx + 1) * L]
            if len(music) < L:
                music = np.pad(music, ((0, L - len(music)), (0, 0)))
        else:
            print(f"  (no music features at {music_path}; conditioning on zeros)")
            music = np.zeros((L, cfg.get("control_cond_feats", 163)), np.float32)

        batch = {"motion": np.zeros((1, L, 322), np.float32),
                 "motion_mask": np.ones((1, L), np.float32),
                 "motion_length": np.full((1, 1), L, np.int32),
                 "text_ids": tokenize([text]),
                 "c": np.asarray(music, np.float32)[None]}

        if variables is None:
            variables = arch.init(jax.random.PRNGKey(args.seed), batch)
            if args.checkpoint:
                from motioncraft_tpu.utils.checkpoint import load_params
                variables = load_params(args.checkpoint)

        rng, sub = jax.random.split(rng)
        pred = np.asarray(jax.jit(lambda v, b, r: arch.sample(v, b, r))(
            variables, batch, sub))[0]
        pred = pred * (std + 1e-9) + mean

        out_path = os.path.join(args.out, f"res_{track}_{L}_{args.slice_idx}.npz")
        m2d_export_npz(pred, out_path, fps=args.fps, smooth=not args.no_smooth)
        print(f"{track!r} ({text[:60]}...) -> {out_path} ({L} frames)")
        if args.render:
            from motioncraft_tpu.utils.render import render_one_sequence
            render_one_sequence(out_path, out_path.replace(".npz", ".mp4"),
                                fps=args.fps)
        if args.web:
            from motioncraft_tpu.ops.fk import SMPLX_PARENTS
            from motioncraft_tpu.utils.export import fk_joints_322
            from motioncraft_tpu.utils.web_player import export_web_player
            export_web_player(fk_joints_322(pred), SMPLX_PARENTS,
                              out_path.replace(".npz", ".html"),
                              fps=args.fps, title=track)


if __name__ == "__main__":
    main()
