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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./data_tiny")
    ap.add_argument("--protocol-gt", action="store_true",
                    help="write a protocol-scale (1k clips x 196 frames) "
                         "synthetic motionx tree instead of the tiny one")
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    if args.protocol_gt:
        make_protocol_gt(args.root, rng)
        print(f"protocol-gt data tree written under {args.root}")
        return
    make_motionx(args.root, rng)
    make_finedance(args.root, rng)
    make_beat2(args.root, rng)
    print(f"tiny data tree written under {args.root}")


if __name__ == "__main__":
    main()
