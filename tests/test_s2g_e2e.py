"""End-to-end S2G harness test: fabricated BEAT2 data + fabricated SMPL-X
model -> tools/s2g_test.py subprocess -> protocol metrics.json.

Exercises the full reference metric protocol path (LBS joints for
L1div/BeatAlign, face vertices for L2/LVD, honesty flags) without real
assets, per reference tools/s2g_test.py:364-483.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from test_smplx_lbs import fabricate_model  # noqa: E402


def fabricate_beat2(root, T=40, rng=None):
    rng = rng or np.random.RandomState(0)
    for sub in ("smplxflame_30", "wave16k", "textgrid", "weights"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    with open(os.path.join(root, "train_test_split.csv"), "w") as f:
        f.write("2_alice_0_2_2,test\n")
    np.savez(os.path.join(root, "smplxflame_30", "2_alice_0_2_2.npz"),
             poses=(rng.randn(T, 165) * 0.1).astype(np.float32),
             expressions=(rng.randn(T, 100) * 0.1).astype(np.float32),
             trans=(rng.randn(T, 3) * 0.1).astype(np.float32),
             betas=np.zeros(300, np.float32))
    from scipy.io import wavfile
    sr = 16000
    wav = (rng.randn(int(T / 30 * sr)) * 0.1 * 32767).astype(np.int16)
    wavfile.write(os.path.join(root, "wave16k", "2_alice_0_2_2.wav"), sr, wav)
    np.save(os.path.join(root, "weights", "mean_vel_smplxflame_30.npy"),
            np.full(55, 0.5, np.float32))


@pytest.mark.slow
def test_s2g_harness_protocol_metrics(tmp_path):
    root = str(tmp_path / "beat2")
    fabricate_beat2(root)
    stats = tmp_path / "stats"
    stats.mkdir()
    np.save(stats / "mean.npy", np.zeros(322, np.float32))
    np.save(stats / "std.npy", np.ones(322, np.float32))
    smplx_npz = tmp_path / "SMPLX_NEUTRAL_2020.npz"
    np.savez(smplx_npz, **fabricate_model())
    yaml_path = tmp_path / "beat2.yaml"
    yaml_path.write_text(f"""data_path: {root}/
pose_length: 16
stride: 8
pre_frames: 4
pose_fps: 30
audio_sr: 16000
audio_rep: onset+amplitude
pose_rep: smplxflame_30
training_speakers: [2]
align_mask: 5
mean_pose_path: {stats}/mean.npy
std_pose_path: {stats}/std.npy
""")
    work = str(tmp_path / "work")
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", MOTIONCRAFT_SMPLX_MODEL=str(smplx_npz),
               PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "s2g_test.py"),
         os.path.join(REPO, "configs", "tests", "tiny_s2g.py"),
         "--beats2-args", str(yaml_path), "--work-dir", work, "--limit", "1"],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(os.path.join(work, "metrics.json")) as f:
        metrics = json.load(f)
    for key in ("L1div", "BeatAlign", "facial_L2", "facial_LVD"):
        assert np.isfinite(metrics[key]), (key, metrics)
    flags = metrics["flags"]
    assert flags["smplx_vertices"] is True
    assert flags["mmae_asset"] is True
    # no CLIP BPE / evaluator ckpt in CI -> run must declare non-protocol
    assert metrics["protocol"] is False
    assert flags["untrained_evaluator"] is True
