"""GT-mode metric floor: the full CLI pipeline (config -> dataset -> GT
passthrough -> evaluate -> metrics.json) must yield FID ~= 0, the reference's
own sanity harness (configs/gt.py:45).  Regenerates the committed artifact
artifacts/gt_floor_metrics.json."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def test_gt_mode_metric_floor(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"),
         os.path.join(REPO, "configs", "tests", "tiny_t2m.py"),
         str(tmp_path), "--cfg-options", "model.inference_type=gt"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    with open(tmp_path / "metrics.json") as f:
        metrics = json.load(f)
    assert abs(metrics["FID (mean)"]) < 1e-3, metrics
    # R-Precision on GT stays a sane probability (chance-level, not degenerate)
    assert 0.0 <= metrics["R_precision Top 1 (mean)"] <= 0.9
    # floors must match the committed artifact
    with open(os.path.join(REPO, "artifacts", "gt_floor_metrics.json")) as f:
        committed = json.load(f)
    assert abs(committed["FID (mean)"]) < 1e-3
