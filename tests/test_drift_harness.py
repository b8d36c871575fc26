"""Unit coverage for tools/measure_approx_drift.py (the round-5 quality-drift
harness that ties every approximate sampling mode to a measured metric delta,
mirroring how the reference pins each reported sampler setting to its metric
table — /root/reference/configs/stmogen/remodiffuse..._0_125b.py:93-101).

The end-to-end run needs the TPU + hours; these tests pin the harness's math
(per-clip sample error over valid frames) and the resume contract (a killed
run reuses completed per-mode workdirs) so a rerun after an interruption is
trustworthy.
"""

import importlib.util
import json
import os
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_harness():
    spec = importlib.util.spec_from_file_location(
        "measure_approx_drift",
        os.path.join(REPO, "tools", "measure_approx_drift.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _dump(path, motions, lengths):
    np.savez(path, pred_motion=motions,
             motion_length=np.asarray(lengths, np.int32))


class TestSampleErr:
    def test_zero_for_identical_dumps(self, tmp_path):
        mod = _load_harness()
        x = np.random.RandomState(0).randn(4, 8, 6).astype(np.float32)
        a, b = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
        _dump(a, x, [8, 8, 8, 8])
        _dump(b, x.copy(), [8, 8, 8, 8])
        err = mod.sample_err(a, b)
        assert err["mean"] == 0.0 and err["max"] == 0.0
        assert err["n_clips"] == 4

    def test_known_relative_error(self, tmp_path):
        mod = _load_harness()
        x = np.ones((2, 4, 3), np.float32)
        y = x * 1.1  # uniform scale => rel L2 error exactly 0.1 per clip
        a, b = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
        _dump(a, x, [4, 4])
        _dump(b, y, [4, 4])
        err = mod.sample_err(a, b)
        assert abs(err["mean"] - 0.1) < 1e-6
        assert abs(err["max"] - 0.1) < 1e-6

    def test_only_valid_frames_counted(self, tmp_path):
        mod = _load_harness()
        x = np.ones((1, 6, 2), np.float32)
        y = x.copy()
        y[0, 3:] = 100.0  # corruption entirely in the padded tail
        a, b = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
        _dump(a, x, [3])
        _dump(b, y, [3])
        assert mod.sample_err(a, b)["max"] == 0.0

    def test_clip_count_mismatch_uses_common_prefix(self, tmp_path):
        mod = _load_harness()
        a, b = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
        _dump(a, np.ones((3, 4, 2), np.float32), [4, 4, 4])
        _dump(b, np.ones((2, 4, 2), np.float32), [4, 4])
        assert mod.sample_err(a, b)["n_clips"] == 2


class TestRunModeResume:
    def test_completed_mode_is_reused_without_subprocess(self, tmp_path):
        """A workdir holding metrics.json + samples.npz short-circuits: the
        harness must NOT re-spend 10-40 min of TPU time on a finished mode."""
        mod = _load_harness()
        wd = tmp_path / "exact"
        wd.mkdir()
        metrics = {"FID (mean)": 1.5}
        (wd / "metrics.json").write_text(json.dumps(metrics))
        _dump(str(wd / "samples.npz"), np.zeros((1, 2, 2), np.float32), [2])
        args = types.SimpleNamespace(config="cfg.py", checkpoint="ck.npz",
                                     seed=0, dispatch_batches=1,
                                     batch_size=None, limit=None,
                                     replications=None)
        got, dump, wall = mod.run_mode("exact", [], args, str(wd))
        assert got == metrics
        assert dump.endswith("samples.npz")
        assert wall == 0.0

    def test_incomplete_mode_is_not_reused(self, tmp_path):
        """metrics.json without the sample dump (a run killed mid-eval) must
        NOT be treated as complete."""
        mod = _load_harness()
        wd = tmp_path / "exact"
        wd.mkdir()
        (wd / "metrics.json").write_text("{}")
        args = types.SimpleNamespace(config="cfg.py",
                                     checkpoint="missing.npz", seed=0,
                                     dispatch_batches=1, batch_size=None,
                                     limit=None, replications=None)
        # no samples.npz => falls through to the subprocess path, which fails
        # fast on the bogus config (SystemExit) instead of silently reusing
        import pytest
        with pytest.raises(SystemExit):
            mod.run_mode("exact", [], args, str(wd))
