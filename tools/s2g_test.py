"""Speech-to-gesture evaluation harness (reference tools/s2g_test.py:50-626).

Per test recording: windowed long-form generation (64-frame windows, 4-frame
overlap, RePaint outpainting), de-normalize, then the reference metric
protocol (s2g_test.py:364-483):
  - L1div over SMPL-X LBS *joints* (55x3, betas applied, zero transl)
  - BeatAlign: audio onsets vs joint-velocity beats, align_mask=60 offsets,
    per-joint mean-velocity normalization
  - facial L2 (MSE) / LVD (L1 velocity) over SMPL-X face *vertices*
    (expression + jaw posed, body zeroed)
  - FID whole-body & hands via the SMPL-X contrastive evaluator

The SMPL-X body model npz is asset-gated; without it the harness falls back
to the approximate FK skeleton and expression *coefficients* and stamps
``"protocol": false`` plus per-fallback flags into metrics.json so the
numbers are never mistaken for protocol-comparable ones.

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
    p.add_argument("--torch-checkpoint", default=None,
                   help="released merged base+control .pth")
    p.add_argument("--beats2-args", default="configs/beat2/st_mogen_emage.yaml")
    p.add_argument("--work-dir", default="outputs/s2g_eval")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=None, help="max recordings")
    p.add_argument("--no_repaint", action="store_true")
    p.add_argument("--step-cache", type=int, default=0, metavar="N",
                   help="SmoothCache-style layer-residual reuse across DDIM "
                        "steps (diffusion/stepcache.py); 0 = off (exact), "
                        "N>=2 = reuse period.  Approximate like --int8; "
                        "stamped into the metrics flags")
    p.add_argument("--int8", nargs="?", const="w8a8", default=None,
                   choices=["w8a8", "w8"],
                   help="int8 denoiser weights (ops/quant.py); combine with "
                        "--bf16 for bf16 activations.  Bare --int8 = w8a8 "
                        "(dynamic activation quant onto the int8 MXU); "
                        "'--int8 w8' = weight-only (int8 weights dequantized "
                        "into the float dots).  Put bare --int8 after the "
                        "positionals or use --int8-mode")
    p.add_argument("--int8-mode", default=None, choices=["w8a8", "w8"],
                   help="position-safe alternative to '--int8 [mode]': "
                        "implies --int8 with the given mode")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 denoiser compute in the windowed sampler "
                        "(params cast + compute_dtype; metrics math stays f32)")
    p.add_argument("--same_overlap_noisy", action="store_true")
    p.add_argument("--save-npz", action="store_true")
    p.add_argument("--recording-batch", type=int, default=1,
                   help="process this many recordings in lockstep through "
                        "one DDIM scan per window (TPU batching; 1 = the "
                        "reference's sequential protocol)")
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()
    if args.int8_mode:  # unambiguous form wins
        args.int8 = args.int8_mode
    return args


def main():
    args = parse_args()
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from motioncraft_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()  # remote-AOT tunnel compiles cost minutes; cache them
    import jax.numpy as jnp
    import motioncraft_tpu.models  # noqa: F401
    import motioncraft_tpu.data  # noqa: F401  (register DATASETS/PIPELINES)
    from motioncraft_tpu.apis.windowed import denormalize, windowed_sample
    from motioncraft_tpu.config import Config, cfg_options_from_args
    from motioncraft_tpu.data.beat2 import load_beat2_args, load_recordings
    from motioncraft_tpu.data.datasets import beat2_pose_to_smplx322
    from motioncraft_tpu.diffusion.sampling import RepaintConfig
    from motioncraft_tpu.eval.gesture_metrics import (BeatAlign, L1div,
                                                      facial_lvd, facial_mse)
    from motioncraft_tpu.models.tokenizer import find_bpe_asset, tokenize
    from motioncraft_tpu.ops.fk import SMPLXSkeleton
    from motioncraft_tpu.ops.smplx_lbs import (SMPLXModel, find_model_path,
                                               pose165_parts)
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

    # SMPL-X body model (protocol) or approximate-FK fallback, flagged
    smplx_path = find_model_path(getattr(bargs, "smplx_model_path", None))
    body_model = SMPLXModel.from_npz(smplx_path) if smplx_path else None
    if body_model is None:
        print("WARNING: SMPL-X model npz not found — joints from the "
              "approximate FK skeleton, facial metrics on expression "
              "coefficients. Numbers are NOT protocol-comparable.")
        fk = SMPLXSkeleton()
        fk_jit = jax.jit(fk.forward)
    # per-joint mean-velocity normalizer (reference loads
    # weights/mean_vel_<pose_rep>.npy; scalar 1.0 fallback is non-protocol)
    mmae_path = os.path.join(
        bargs.data_path, "weights", f"mean_vel_{getattr(bargs, 'pose_rep', 'smplxflame_30')}.npy")
    mmae = np.load(mmae_path) if os.path.isfile(mmae_path) else 1.0
    align_mask = int(getattr(bargs, "align_mask", 60))
    l1div = L1div()
    beat = BeatAlign(sigma=0.3, order=7, mmae=mmae, align_mask=align_mask)
    align_sum, l2_sum, lvd_sum, total_length = 0.0, 0.0, 0.0, 0
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
    rng = jax.random.PRNGKey(args.seed)
    t0 = time.time()

    def make_mwb(rec):
        audio = rec["audio"]
        spans = rec["word_spans"]

        def caption(start, end):
            words = []
            for (s, e, w) in spans:
                if w and s < end / fps and e > start / fps and w not in words:
                    words.append(w)
            return ("A person is doing a speech, and the speech content is "
                    + " ".join(words))

        def make_window_batch(start, end):
            seg = audio[start * spf:end * spf]
            if len(seg) < (end - start) * spf:
                seg = np.pad(seg, ((0, (end - start) * spf - len(seg)), (0, 0)))
            # numpy (not jnp): eager device arrays cost one blocking RPC
            # each on a remote-runtime TPU; jit transfers these at dispatch
            return {"motion": np.zeros((1, window, 322), np.float32),
                    "motion_mask": np.ones((1, window), np.float32),
                    "motion_length": np.full((1, 1), window, np.int32),
                    "text_ids": tokenize([caption(start, end)]),
                    "c": np.asarray(seg, np.float32)[None]}

        return make_window_batch

    variables = arch.init(jax.random.PRNGKey(args.seed),
                          make_mwb(recordings[0])(0, window))
    from motioncraft_tpu.utils.checkpoint import load_eval_variables
    variables = load_eval_variables(
        cfg.model, variables, checkpoint=args.checkpoint,
        torch_checkpoint=args.torch_checkpoint)
    if args.bf16:
        from motioncraft_tpu.apis import bf16_cast_variables
        variables = bf16_cast_variables(variables)
    if args.int8:
        from motioncraft_tpu.apis import int8_quantize_variables
        variables = int8_quantize_variables(
            variables, weight_only=args.int8 == "w8")
        from motioncraft_tpu.ops.quant import count_quantized
        _n, _e = count_quantized(variables)
        print(f"int8 ({args.int8}): quantized {_n} weights "
              f"({_e / 1e6:.1f}M params)")

    # generation: sequential protocol (R=1) or lockstep recording batches
    # (windowed_sample_batch — windows of different recordings share one
    # DDIM scan; per-recording window chaining is preserved)
    R = max(1, args.recording_batch)
    norm_preds = {}
    cdt = jnp.bfloat16 if args.bf16 else None
    sc_cfg = None
    if args.step_cache > 1:
        from motioncraft_tpu.diffusion import StepCacheConfig
        sc_cfg = StepCacheConfig(reuse_every=args.step_cache)
    elif args.step_cache not in (0, 1):
        raise SystemExit("--step-cache must be 0 (off) or >= 2")
    kw = dict(window=window, pre_frames=pre, use_repaint=not args.no_repaint,
              repaint=arch.repaint_cfg, compute_dtype=cdt, step_cache=sc_cfg)
    if R > 1:
        from motioncraft_tpu.apis.windowed import windowed_sample_batch
        for g0 in range(0, len(recordings), R):
            group = recordings[g0:g0 + R]
            rng, sub = jax.random.split(rng)
            outs = windowed_sample_batch(
                arch, variables, [make_mwb(r) for r in group],
                [len(r["pose"]) for r in group], rng=sub, **kw)
            for i, o in enumerate(outs):
                norm_preds[g0 + i] = o

    for ri, rec in enumerate(recordings):
        T = len(rec["pose"])
        gt322 = beat2_pose_to_smplx322(rec["pose"], rec["facial"], rec["trans"])

        if ri in norm_preds:
            norm_pred = norm_preds.pop(ri)
        else:
            rng, sub = jax.random.split(rng)
            norm_pred = windowed_sample(arch, variables, make_mwb(rec),
                                        total_frames=T, rng=sub, **kw)
        pred322 = denormalize(norm_pred, mean, std)
        # windows cover num_windows*(window-pre)+pre frames; trim GT to match
        T = len(pred322)
        gt322 = gt322[:T]

        # FID embeddings (reference s2g_test.py:313-348)
        for store, seq in ((pred_embs, pred322), (gt_embs, gt322),
                           (pred_hand_embs, hands_only(pred322)),
                           (gt_hand_embs, hands_only(gt322))):
            store.append(np.asarray(fid_model.encode_motion(
                seq[None], np.asarray([len(seq)]))))
        # rec_pose 165-d layout from 322 (reference :290-293: eyes zero)
        pose165 = np.zeros((T, 165), np.float32)
        pose165[:, :66] = pred322[:, :66]
        pose165[:, 66:69] = pred322[:, 156:159]
        pose165[:, 75:165] = pred322[:, 66:156]
        if body_model is not None:
            # protocol joints: LBS with GT betas, zero transl/expression
            # (reference :364-378, joints_rec = first 55 joints)
            betas = np.broadcast_to(
                rec.get("betas", np.zeros(body_model.num_betas, np.float32)
                        )[: body_model.num_betas].reshape(1, -1),
                (T, body_model.num_betas))
            joints = body_model.forward_chunked(
                return_verts=False, betas=betas,
                **pose165_parts(pose165))["joints"]
            # facial vertices: expression + jaw only (reference :379-405)
            tar_pose165 = np.zeros((T, 165), np.float32)
            tar_pose165[:, :66] = gt322[:, :66]
            tar_pose165[:, 66:69] = gt322[:, 156:159]
            tar_pose165[:, 75:165] = gt322[:, 66:156]
            facial_rec = body_model.forward_chunked(
                betas=betas, expression=pred322[:, 209:309],
                jaw_pose=pose165[:, 66:69])["vertices"].reshape(T, -1)
            facial_tar = body_model.forward_chunked(
                betas=betas, expression=gt322[:, 209:309],
                jaw_pose=tar_pose165[:, 66:69])["vertices"].reshape(T, -1)
        else:
            joints = np.asarray(fk_jit(pose165.astype(np.float32),
                                       np.zeros((T, 3), np.float32)))
            facial_rec, facial_tar = pred322[:, 209:309], gt322[:, 209:309]
        joints_rec = np.asarray(joints).reshape(T, -1)[:, :55 * 3]
        l1div.run(joints_rec.copy())
        score = beat.score(rec["wav"][: T * spf], joints_rec.reshape(T, 55, 3),
                           sr=sr, pose_fps=fps, full_wav_len=len(rec["wav"]))
        align_sum += score * (T - 2 * align_mask)
        l2_sum += facial_mse(facial_rec, facial_tar) * T
        lvd_sum += facial_lvd(facial_rec, facial_tar) * T
        total_length += T
        if args.save_npz:
            np.savez(os.path.join(args.work_dir, f"{rec['name']}.npz"),
                     pred=pred322, gt=gt322)
        print(f"[{ri + 1}/{len(recordings)}] {rec['name']}: T={T} "
              f"align={score:.4f} ({time.time() - t0:.1f}s)", flush=True)

    from motioncraft_tpu.eval.metrics import (calculate_activation_statistics,
                                              calculate_frechet_distance)

    def fid(pred_list, gt_list):
        pe, ge = np.concatenate(pred_list), np.concatenate(gt_list)
        mu_p, cov_p = calculate_activation_statistics(pe)
        mu_g, cov_g = calculate_activation_statistics(ge)
        return float(calculate_frechet_distance(mu_g, cov_g, mu_p, cov_p))

    n_seq = len(recordings)
    # weighted accumulation exactly as the reference (:449-459)
    metrics = {
        "L1div": l1div.avg(),
        "BeatAlign": align_sum / max(total_length - 2 * n_seq * align_mask, 1),
        "facial_L2": l2_sum / max(total_length, 1),
        "facial_LVD": lvd_sum / max(total_length, 1),
    }
    if len(pred_embs) > 1:
        metrics["FID_whole"] = fid(pred_embs, gt_embs)
        metrics["FID_hands"] = fid(pred_hand_embs, gt_hand_embs)
    # honesty flags: make non-protocol runs say so in their artifacts
    flags = {
        "smplx_vertices": body_model is not None,
        "mmae_asset": not np.isscalar(mmae),
        "untrained_evaluator": not getattr(fid_model, "pretrained_loaded", False),
        "hash_tokenizer": find_bpe_asset() is None,
        "int8_weights": args.int8 or False,  # False|"w8a8"|"w8"
        "step_cache": int(args.step_cache),
    }
    metrics["protocol"] = (flags["smplx_vertices"] and flags["mmae_asset"]
                           and not flags["untrained_evaluator"]
                           and not flags["hash_tokenizer"])
    if flags["int8_weights"] or flags["step_cache"]:
        print("NOTE: approximate sampling mode (int8/step-cache); compare "
              "against an exact run before quoting numbers")
    metrics["flags"] = flags
    if not metrics["protocol"]:
        print("WARNING: run is NOT protocol-comparable:",
              {k: v for k, v in flags.items()})
    print(json.dumps(metrics, indent=2))
    with open(os.path.join(args.work_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
