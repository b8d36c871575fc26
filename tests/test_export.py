"""SMPL-X npz export helpers (utils/export.py vs the reference visualizer
layouts, s2g_visualize.py:235-279 / m2d_visualize.py:239-276)."""

import numpy as np
import pytest

from motioncraft_tpu.utils.export import (gt_export_npz, m2d_export_npz,
                                          s2g_export_npz, smooth_axis_angle_6d,
                                          temporal_filter)


def _motion(T=24, seed=0):
    return np.random.RandomState(seed).randn(T, 322).astype(np.float32) * 0.3


def test_s2g_export_layout(tmp_path):
    m = _motion()
    path = str(tmp_path / "res.npz")
    s2g_export_npz(m, path, smooth=False)
    d = np.load(path, allow_pickle=True)
    assert d["poses"].shape == (24, 165)
    np.testing.assert_allclose(d["poses"][:, :66], m[:, :66], atol=1e-6)
    np.testing.assert_allclose(d["poses"][:, 66:69], m[:, 156:159], atol=1e-6)
    np.testing.assert_allclose(d["poses"][:, 75:165], m[:, 66:156], atol=1e-6)
    # 69:75 (the 2 lower-face joints the 322 layout drops) stay zero
    assert np.abs(d["poses"][:, 69:75]).max() == 0
    np.testing.assert_allclose(d["expressions"], m[:, 209:309], atol=1e-6)
    # vertical translation recentred to a 1.3 m mean
    assert abs(d["trans"][:, 1].mean() - 1.3) < 1e-5
    assert d["betas"].shape == (300,)


def test_gt_export_is_unsmoothed(tmp_path):
    m = _motion()
    path = str(tmp_path / "gt.npz")
    gt_export_npz(m, path)
    d = np.load(path, allow_pickle=True)
    np.testing.assert_allclose(d["trans"], m[:, 309:312], atol=1e-6)
    np.testing.assert_allclose(d["poses"][:, :66], m[:, :66], atol=1e-6)


def test_m2d_export_zeroes_face(tmp_path):
    m = _motion()
    path = str(tmp_path / "dance.npz")
    m2d_export_npz(m, path)
    d = np.load(path, allow_pickle=True)
    assert np.abs(d["poses"][:, 66:75]).max() == 0   # no jaw
    assert np.abs(d["expressions"]).max() == 0       # no face
    assert np.isfinite(d["poses"]).all()


def test_temporal_filter_reduces_jitter():
    x = np.random.RandomState(1).randn(100, 4).astype(np.float32)
    y = temporal_filter(x, 3.0)
    assert np.abs(np.diff(y, axis=0)).mean() < np.abs(np.diff(x, axis=0)).mean()
    np.testing.assert_array_equal(temporal_filter(x, 0.0), x)


def test_smooth_axis_angle_6d_identity_on_constant():
    # a constant rotation sequence is a fixed point of 6d smoothing
    aa = np.tile(np.asarray([[0.3, -0.2, 0.5, 0.0, 0.1, -0.4]], np.float32),
                 (20, 1))
    out = smooth_axis_angle_6d(aa, 3.0)
    np.testing.assert_allclose(out, aa, atol=1e-5)
