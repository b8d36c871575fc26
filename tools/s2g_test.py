"""Speech-to-gesture evaluation harness (reference tools/s2g_test.py:50-626).

Per test recording: windowed long-form generation (64-frame windows, 4-frame
overlap, RePaint outpainting), de-normalize, then metrics:
  - L1div over the generated poses
  - BeatAlign: audio onsets vs FK-joint velocity beats
  - facial L2 / LVD over the expression coefficients
  - FID whole-body & hands via the configured evaluator model (when its
    pretrained weights exist)

Usage:
  python tools/s2g_test.py configs/stmogen/s2g_beats2_0125b.py \
      --checkpoint outputs/s2g/params.npz --beats2-args configs/beat2/st_mogen_emage.yaml
"""

import argparse
import json
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
    p.add_argument("--work-dir", default="outputs/s2g_eval")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=None, help="max recordings")
    p.add_argument("--no_repaint", action="store_true")
    p.add_argument("--same_overlap_noisy", action="store_true")
    p.add_argument("--save-npz", action="store_true")
    p.add_argument("--cfg-options", nargs="*", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import motioncraft_tpu.models  # noqa: F401
    import motioncraft_tpu.data  # noqa: F401  (register DATASETS/PIPELINES)
    from motioncraft_tpu.apis.windowed import denormalize, windowed_sample
    from motioncraft_tpu.config import Config, cfg_options_from_args
    from motioncraft_tpu.data.beat2 import load_beat2_args, load_recordings
    from motioncraft_tpu.data.datasets import beat2_pose_to_smplx322
    from motioncraft_tpu.diffusion.sampling import RepaintConfig
    from motioncraft_tpu.eval.gesture_metrics import (BeatAlign, L1div, facial_l2,
                                                      facial_lvd)
    from motioncraft_tpu.models.tokenizer import tokenize
    from motioncraft_tpu.ops.fk import SMPLXSkeleton
    from motioncraft_tpu.registry import build_architecture

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(cfg_options_from_args(args.cfg_options))
    os.makedirs(args.work_dir, exist_ok=True)

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

    fk = SMPLXSkeleton()
    fk_jit = jax.jit(fk.forward)
    l1div = L1div()
    beat = BeatAlign(sigma=0.3, order=7)
    l2s, lvds, aligns = [], [], []
    # FID embedding model (the reference embeds whole sequences with the
    # SMPL-X contrastive evaluator, s2g_test.py:313-325)
    from motioncraft_tpu.eval import build_evaluator_model
    fid_model = build_evaluator_model(cfg.get("eval_model") or dict(
        type="T2MContrastiveModel_SMPLX",
        motion_encoder=dict(nfeats=322, vae=True, num_layers=4),
        text_encoder=dict(num_layers=4)))
    pred_embs, gt_embs, pred_hand_embs, gt_hand_embs = [], [], [], []

    def hands_only(m322):
        out = np.zeros_like(m322)
        out[:, 0:3] = m322[:, 0:3]
        out[:, 66:156] = m322[:, 66:156]
        out[:, 309:312] = m322[:, 309:312]
        return out
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
            return {"motion": jnp.zeros((1, window, 322)),
                    "motion_mask": jnp.ones((1, window)),
                    "motion_length": jnp.full((1, 1), window, jnp.int32),
                    "text_ids": jnp.asarray(tokenize([caption(start, end)])),
                    "c": jnp.asarray(seg)[None]}

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
        # windows cover num_windows*(window-pre)+pre frames; trim GT to match
        T = len(pred322)
        gt322 = gt322[:T]

        # metrics
        l1div.run(pred322[:, :66 + 90].copy())
        for store, seq in ((pred_embs, pred322), (gt_embs, gt322),
                           (pred_hand_embs, hands_only(pred322)),
                           (gt_hand_embs, hands_only(gt322))):
            store.append(np.asarray(fid_model.encode_motion(
                seq[None], np.asarray([len(seq)]))))
        # FK joints for BeatAlign: 165-d pose layout from 322
        pose165 = np.zeros((T, 165), np.float32)
        pose165[:, :66] = pred322[:, :66]
        pose165[:, 66:69] = pred322[:, 156:159]
        pose165[:, 75:165] = pred322[:, 66:156]
        joints = np.asarray(fk_jit(jnp.asarray(pose165), jnp.asarray(pred322[:, 309:312])))
        aligns.append(beat.score(rec["wav"][: T * spf], joints, sr=sr, pose_fps=fps))
        l2s.append(facial_l2(pred322[:, 209:309], gt322[:, 209:309]))
        lvds.append(facial_lvd(pred322[:, 209:309], gt322[:, 209:309], fps))
        if args.save_npz:
            np.savez(os.path.join(args.work_dir, f"{rec['name']}.npz"),
                     pred=pred322, gt=gt322)
        print(f"[{ri + 1}/{len(recordings)}] {rec['name']}: T={T} "
              f"align={aligns[-1]:.4f} ({time.time() - t0:.1f}s)", flush=True)

    from motioncraft_tpu.eval.metrics import (calculate_activation_statistics,
                                              calculate_frechet_distance)

    def fid(pred_list, gt_list):
        pe, ge = np.concatenate(pred_list), np.concatenate(gt_list)
        mu_p, cov_p = calculate_activation_statistics(pe)
        mu_g, cov_g = calculate_activation_statistics(ge)
        return float(calculate_frechet_distance(mu_g, cov_g, mu_p, cov_p))

    metrics = {"L1div": l1div.avg(), "BeatAlign": float(np.mean(aligns)),
               "facial_L2": float(np.mean(l2s)), "facial_LVD": float(np.mean(lvds))}
    if len(pred_embs) > 1:
        metrics["FID_whole"] = fid(pred_embs, gt_embs)
        metrics["FID_hands"] = fid(pred_hand_embs, gt_hand_embs)
    print(json.dumps(metrics, indent=2))
    with open(os.path.join(args.work_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
