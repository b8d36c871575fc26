"""Create ./data_tiny — the synthetic data tree behind configs/tests/*.

The tiny configs (tiny_t2m/tiny_s2g/tiny_m2d + tiny_beat2.yaml) drive the
full CLI surface without real datasets; this script materializes the tree
they expect (same layouts as the real Motion-X / FineDance / BEAT2 roots,
see SURVEY §2.5 and reference data/ README).  Deterministic (seed 0).

Usage: python tools/make_tiny_data.py [--root ./data_tiny]
"""

import argparse
import json
import os

import numpy as np


def make_motionx(root, rng, n=6, t=48):
    d = os.path.join(root, "datasets", "motionx")
    for sub in ("motions", "texts"):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
    np.save(os.path.join(d, "mean.npy"), np.zeros(322, np.float32))
    np.save(os.path.join(d, "std.npy"), np.ones(322, np.float32))
    names = [f"clip{i:03d}" for i in range(n)]
    for i, name in enumerate(names):
        np.save(os.path.join(d, "motions", name + ".npy"),
                (rng.randn(t, 322) * 0.1).astype(np.float32))
        with open(os.path.join(d, "texts", name + ".txt"), "w") as f:
            f.write(f"a person performs action number {i}#a/DET person/NOUN\n")
    with open(os.path.join(d, "ann.txt"), "w") as f:
        f.write("\n".join(names) + "\n")


def make_finedance(root, rng, t=400):
    d = os.path.join(root, "datasets", "finedance")
    for sub in ("motion_fea163", "music_npy", "label_json"):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
    np.save(os.path.join(d, "mean.npy"), np.zeros(322, np.float32))
    np.save(os.path.join(d, "std.npy"), np.ones(322, np.float32))
    for name, style in (("063", "Jazz"), ("132", "Hiphop")):
        np.save(os.path.join(d, "motion_fea163", name + ".npy"),
                (rng.randn(t, 319) * 0.1).astype(np.float32))
        np.save(os.path.join(d, "music_npy", name + ".npy"),
                (rng.randn(t, 163) * 0.1).astype(np.float32))
        with open(os.path.join(d, "label_json", name + ".json"), "w") as f:
            json.dump({"name": f"song{name}", "style1": style,
                       "style2": "modern"}, f)


def make_beat2(root, rng, t=200, sr=16000, fps=30):
    from scipy.io import wavfile
    d = os.path.join(root, "beat2")
    for sub in ("smplxflame_30", "wave16k", "textgrid"):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "stats"), exist_ok=True)
    np.save(os.path.join(root, "stats", "mean.npy"), np.zeros(322, np.float32))
    np.save(os.path.join(root, "stats", "std.npy"), np.ones(322, np.float32))
    rows = []
    for name, split in (("2_alice_0_1_1", "train"), ("2_alice_0_2_2", "test"),
                        ("9_bob_0_1_1", "train")):
        rows.append(f"{name},{split}")
        if name.startswith("9"):
            continue  # not in training_speakers=[2]; csv row is enough
        np.savez(os.path.join(d, "smplxflame_30", name + ".npz"),
                 poses=(rng.randn(t, 165) * 0.1).astype(np.float32),
                 expressions=(rng.randn(t, 100) * 0.1).astype(np.float32),
                 trans=(rng.randn(t, 3) * 0.1).astype(np.float32),
                 betas=np.zeros(300, np.float32))
        wav = (rng.randn(int(t / fps * sr)) * 0.1 * 32767).astype(np.int16)
        wavfile.write(os.path.join(d, "wave16k", name + ".wav"), sr, wav)
        dur = t / fps
        with open(os.path.join(d, "textgrid", name + ".TextGrid"), "w") as f:
            f.write('File type = "ooTextFile"\nObject class = "TextGrid"\n\n'
                    f'xmin = 0\nxmax = {dur}\ntiers? <exists>\nsize = 1\n'
                    'item []:\n    item [1]:\n        class = "IntervalTier"\n'
                    '        name = "words"\n        xmin = 0\n'
                    f'        xmax = {dur}\n        intervals: size = 2\n'
                    '        intervals [1]:\n            xmin = 0\n'
                    f'            xmax = {dur / 2}\n            text = "hello"\n'
                    '        intervals [2]:\n'
                    f'            xmin = {dur / 2}\n            xmax = {dur}\n'
                    '            text = "world"\n')
    with open(os.path.join(d, "train_test_split.csv"), "w") as f:
        f.write("id,type\n" + "\n".join(rows) + "\n")


def make_protocol_gt(root, rng, n=1000, t=196):
    """Protocol-shaped synthetic Motion-X tree for the GT metric-floor
    harness (configs/tests/protocol_gt.py): ~1k clips of 196x322, evaluated
    at batch 32 x 20 replications — the reference protocol's counts
    (configs/_base_/datasets/motionx_mix_bs128.py:89-111) on synthetic
    gaussians.  ~250 MB; generated on demand, never committed."""
    make_motionx(root, rng, n=n, t=t)


# 32 distinct action phrases (one per class) — enough lexical spread for
# both the CLIP BPE tokenizer (denoiser text tower) and the hash-fallback
# WordPiece tokenizer (evaluator) to separate classes.
_ACTIONS = [
    "walks forward slowly", "runs in a wide circle", "jumps up and down",
    "waves both hands overhead", "sits down on the floor",
    "stands up from a chair", "turns around and walks away",
    "stretches both arms sideways", "crouches low to the ground",
    "kicks with the right leg", "punches with the left fist",
    "spins on one foot", "claps both hands rhythmically",
    "bows deeply at the waist", "leans against an invisible wall",
    "climbs an imaginary ladder", "throws a ball far away",
    "catches a falling object", "dances with swaying hips",
    "marches in place steadily", "crawls forward on the ground",
    "balances on the left leg", "swims through the air",
    "rows an invisible boat", "lifts a heavy box upward",
    "pushes a cart forward", "pulls a rope toward the chest",
    "sweeps the floor with a broom", "digs with an imaginary shovel",
    "shrugs both shoulders repeatedly", "nods the head while standing",
    "stomps both feet angrily",
]


def make_protocol_learnable(root, rng, n=1024, t=196, d=322):
    """Protocol-scale tree with LEARNABLE text<->motion structure: 32 classes
    of smooth sinusoid-bank motions (the make_calib_ckpt.py trick at dataset
    scale), each with a distinct caption and n/32 instances that differ by
    per-clip phase jitter + noise.  A diffusion model can memorise the class
    conditionals and a small contrastive evaluator can learn the text<->motion
    correspondence, making R-Precision/Matching discriminative (chance top-1
    under batch-32 protocol = 1/32).  Drives the approx-mode drift harness
    (tools/measure_approx_drift.py) and the round-5 train soak.  ~250 MB;
    generated on demand, never committed."""
    dd = os.path.join(root, "datasets", "motionx")
    for sub in ("motions", "texts"):
        os.makedirs(os.path.join(dd, sub), exist_ok=True)
    np.save(os.path.join(dd, "mean.npy"), np.zeros(d, np.float32))
    np.save(os.path.join(dd, "std.npy"), np.ones(d, np.float32))
    k = len(_ACTIONS)
    tt = np.linspace(0.0, 1.0, t, dtype=np.float32)
    freqs = rng.uniform(0.5, 3.0, size=(k, d)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, size=(k, d)).astype(np.float32)
    amp = rng.uniform(0.3, 1.0, size=(k, d)).astype(np.float32)
    names = [f"clip{i:04d}" for i in range(n)]
    for i, name in enumerate(names):
        c = i % k
        jit = rng.uniform(-0.3, 0.3, size=(d,)).astype(np.float32)
        clip = amp[c] * np.sin(2 * np.pi * freqs[c] * tt[:, None]
                               + phase[c] + jit)
        clip = clip + rng.randn(t, d).astype(np.float32) * 0.05
        np.save(os.path.join(dd, "motions", name + ".npy"),
                clip.astype(np.float32))
        with open(os.path.join(dd, "texts", name + ".txt"), "w") as f:
            f.write(f"a person {_ACTIONS[c]}#a/DET person/NOUN\n")
    with open(os.path.join(dd, "ann.txt"), "w") as f:
        f.write("\n".join(names) + "\n")


def _smooth(rng, t, d, scale=0.1):
    """Deterministic smooth sinusoid bank [t, d] (compresses, looks like
    motion, and keeps the committed fixtures byte-stable)."""
    tt = np.linspace(0.0, 1.0, t, dtype=np.float32)[:, None]
    f = rng.uniform(0.5, 4.0, size=(1, d)).astype(np.float32)
    p = rng.uniform(0, 2 * np.pi, size=(1, d)).astype(np.float32)
    return (scale * np.sin(2 * np.pi * f * tt + p)).astype(np.float32)


def make_fixture_tree(root):
    """COMMITTED real-format miniature fixtures (tests/fixtures/mini):

    - BEAT2 layout (reference EMAGE_2024/dataloaders/beat_motionx.py:236-611):
      smplxflame_30/<name>.npz with poses [T,165] / expressions [T,100] /
      trans [T,3] / betas [300] at 30 fps, 16 kHz 16-bit PCM wave16k/*.wav,
      Praat textgrid/*.TextGrid, train_test_split.csv
    - FineDance layout (reference data/datasets/finedance/pre_motion.py:15-69):
      motion_fea163/<name>.npy [T,319], music_npy/<name>.npy [T,163] float32,
      label_json/<name>.json, with the 360-frame head trim leaving usable
      frames

    Unlike the throwaway ./data_tiny tree (same formats, regenerated on
    demand), these are committed so a silent co-drift between the generator
    and the loaders (field names, fps, dtypes) fails CI
    (tests/test_tools_e2e_fixtures.py drives tools/{s2g,m2d}_test.py over
    them end-to-end)."""
    from scipy.io import wavfile
    rng = np.random.RandomState(7)

    # ---- BEAT2: one train + one test recording for speaker 2, t=96 (3.2 s)
    t, sr, fps = 96, 16000, 30
    d = os.path.join(root, "beat2")
    for sub in ("smplxflame_30", "wave16k", "textgrid"):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "stats"), exist_ok=True)
    np.save(os.path.join(root, "stats", "mean.npy"), np.zeros(322, np.float32))
    np.save(os.path.join(root, "stats", "std.npy"), np.ones(322, np.float32))
    rows = []
    # two test recordings: the S2G FID path needs >1 embedding group
    for name, split in (("2_mini_0_1_1", "train"), ("2_mini_0_2_2", "test"),
                        ("2_mini_0_3_3", "test")):
        rows.append(f"{name},{split}")
        np.savez(os.path.join(d, "smplxflame_30", name + ".npz"),
                 poses=_smooth(rng, t, 165), expressions=_smooth(rng, t, 100),
                 trans=_smooth(rng, t, 3), betas=np.zeros(300, np.float32))
        dur = t / fps
        n_samp = int(dur * sr)
        tone = 0.2 * np.sin(2 * np.pi * 220.0 * np.arange(n_samp) / sr)
        wavfile.write(os.path.join(d, "wave16k", name + ".wav"), sr,
                      (tone * 32767).astype(np.int16))
        with open(os.path.join(d, "textgrid", name + ".TextGrid"), "w") as f:
            f.write('File type = "ooTextFile"\nObject class = "TextGrid"\n\n'
                    f'xmin = 0\nxmax = {dur}\ntiers? <exists>\nsize = 1\n'
                    'item []:\n    item [1]:\n        class = "IntervalTier"\n'
                    '        name = "words"\n        xmin = 0\n'
                    f'        xmax = {dur}\n        intervals: size = 2\n'
                    '        intervals [1]:\n            xmin = 0\n'
                    f'            xmax = {dur / 2}\n            text = "hello"\n'
                    '        intervals [2]:\n'
                    f'            xmin = {dur / 2}\n            xmax = {dur}\n'
                    '            text = "fixture"\n')
    with open(os.path.join(d, "train_test_split.csv"), "w") as f:
        f.write("id,type\n" + "\n".join(rows) + "\n")

    # ---- FineDance: one cross_genre test track ("063"), 360-trim + 64 usable
    t = 424
    d = os.path.join(root, "datasets", "finedance")
    for sub in ("motion_fea163", "music_npy", "label_json"):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
    np.save(os.path.join(d, "mean.npy"), np.zeros(322, np.float32))
    np.save(os.path.join(d, "std.npy"), np.ones(322, np.float32))
    name = "063"
    np.save(os.path.join(d, "motion_fea163", name + ".npy"), _smooth(rng, t, 319))
    np.save(os.path.join(d, "music_npy", name + ".npy"), _smooth(rng, t, 163))
    with open(os.path.join(d, "label_json", name + ".json"), "w") as f:
        json.dump({"name": "fixture_song", "style1": "Jazz",
                   "style2": "modern"}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./data_tiny")
    ap.add_argument("--protocol-gt", action="store_true",
                    help="write a protocol-scale (1k clips x 196 frames) "
                         "synthetic motionx tree instead of the tiny one")
    ap.add_argument("--fixtures", action="store_true",
                    help="regenerate the COMMITTED real-format miniature "
                         "fixtures under tests/fixtures/mini (then inspect "
                         "the diff and commit)")
    ap.add_argument("--protocol-learnable", action="store_true",
                    help="write a protocol-scale motionx tree with learnable "
                         "text<->motion class structure (32 sinusoid-bank "
                         "classes; drift/soak harness)")
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    if args.fixtures:
        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "fixtures", "mini")
        make_fixture_tree(root)
        print(f"fixture tree written under {root}")
        return
    if args.protocol_gt:
        make_protocol_gt(args.root, rng)
        print(f"protocol-gt data tree written under {args.root}")
        return
    if args.protocol_learnable:
        make_protocol_learnable(args.root, rng)
        print(f"protocol-learnable data tree written under {args.root}")
        return
    make_motionx(args.root, rng)
    make_finedance(args.root, rng)
    make_beat2(args.root, rng)
    print(f"tiny data tree written under {args.root}")


if __name__ == "__main__":
    main()
