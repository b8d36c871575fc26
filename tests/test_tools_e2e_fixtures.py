"""End-to-end CLI runs over the COMMITTED real-format miniature fixtures.

The throwaway ./data_tiny tree exercises the same loaders but is regenerated
by the same code that might drift — these tests pin the on-disk formats the
reference ships (BEAT2: smplxflame_30 npz poses[165]/expressions[100]/trans +
16 kHz wav + Praat TextGrid + split CSV, reference
EMAGE_2024/dataloaders/beat_motionx.py:236-611; FineDance: 319-d motion npy +
163-d music npy + label json, reference
data/datasets/finedance/pre_motion.py:15-69) as committed bytes under
tests/fixtures/mini, and drive the real tools over them:
TextGrid parse -> windows -> RePaint -> FK metrics -> npz export.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures", "mini")


def _run(cmd):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, f"{' '.join(cmd)}\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_fixture_formats_pin_loader_expectations():
    """Field names / dtypes / shapes of the committed fixture match what the
    loaders expect — a co-drift of generator+loader fails here."""
    npz = np.load(os.path.join(FIXTURES, "beat2", "smplxflame_30",
                               "2_mini_0_2_2.npz"))
    assert npz["poses"].shape[1] == 165 and npz["poses"].dtype == np.float32
    assert npz["expressions"].shape[1] == 100
    assert npz["trans"].shape[1] == 3 and npz["betas"].shape == (300,)
    from scipy.io import wavfile
    sr, wav = wavfile.read(os.path.join(FIXTURES, "beat2", "wave16k",
                                        "2_mini_0_2_2.wav"))
    assert sr == 16000 and wav.dtype == np.int16
    head = open(os.path.join(FIXTURES, "beat2", "textgrid",
                             "2_mini_0_2_2.TextGrid")).readline()
    assert "ooTextFile" in head
    motion = np.load(os.path.join(FIXTURES, "datasets", "finedance",
                                  "motion_fea163", "063.npy"))
    music = np.load(os.path.join(FIXTURES, "datasets", "finedance",
                                 "music_npy", "063.npy"))
    assert motion.shape[1] == 319 and motion.dtype == np.float32
    assert music.shape[1] == 163 and motion.shape[0] > 360


def test_s2g_tool_end_to_end(tmp_path):
    """tools/s2g_test.py over the BEAT2-format fixture: split CSV filter,
    npz pose load, wav onset+amplitude, TextGrid parse, windowed RePaint
    sampling, FK gesture metrics, npz export."""
    wd = str(tmp_path / "s2g")
    out = _run(["tools/s2g_test.py", "configs/tests/tiny_s2g.py",
                "--beats2-args", "configs/tests/fixture_beat2.yaml",
                "--work-dir", wd, "--save-npz"])
    metrics = json.load(open(os.path.join(wd, "metrics.json")))
    for key in ("fid_whole", "l1div", "beatalign", "facial_l2"):
        assert any(key in k.lower() for k in metrics), (key, metrics, out)
    npzs = [f for f in os.listdir(wd) if f.endswith(".npz")]
    assert npzs, f"no exported npz in {os.listdir(wd)}"
    exported = np.load(os.path.join(wd, npzs[0]))
    # the export carries pred/gt in the SMPL-X 322-d layout
    assert exported["pred"].shape[1] == 322
    assert exported["gt"].shape[1] == 322


def test_m2d_tool_end_to_end(tmp_path):
    """tools/m2d_test.py over the FineDance-format fixture: hardcoded
    cross_genre split, 319->322 remap + head trim, music conditioning,
    windowed RePaint sampling, metric dump."""
    wd = str(tmp_path / "m2d")
    out = _run(["tools/m2d_test.py", "configs/tests/fixture_m2d.py",
                "--work-dir", wd])
    metrics = json.load(open(os.path.join(wd, "metrics.json")))
    assert metrics, out
