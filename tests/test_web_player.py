"""Coverage for the standalone HTML motion player (utils/web_player.py),
the capability equivalent of the reference's vendored pymo mocap web player
(EMAGE_2024/dataloaders/pymo/mocapplayer/playBuffer.html + three.js stack).
"""

import json
import re

import numpy as np
import pytest

from motioncraft_tpu.utils.web_player import export_web_player


def _extract_data(html: str) -> dict:
    m = re.search(r'<script id="motion-data" type="application/json">(.*?)'
                  r'</script>', html, re.S)
    assert m, "embedded JSON block missing"
    return json.loads(m.group(1))


def test_export_embeds_joints_and_parents(tmp_path):
    joints = np.random.RandomState(0).randn(12, 5, 3).astype(np.float32)
    parents = [-1, 0, 1, 1, 3]
    path = export_web_player(joints, parents, str(tmp_path / "p.html"),
                             fps=24, title="walk <&>")
    html = open(path).read()
    data = _extract_data(html)
    assert data["fps"] == 24
    assert data["parents"] == parents
    got = np.asarray(data["joints"], np.float32)
    assert got.shape == (12, 5, 3)
    np.testing.assert_allclose(got, joints, atol=5e-4)  # 4-decimal rounding
    # self-contained: no external script/css/fetch references
    assert "http://" not in html and "https://" not in html
    assert "<canvas" in html and "requestAnimationFrame" in html


def test_long_clips_are_subsampled_with_fps_rescale(tmp_path):
    joints = np.zeros((300, 2, 3), np.float32)
    joints[:, 0, 0] = np.arange(300)
    path = export_web_player(joints, [-1, 0], str(tmp_path / "p.html"),
                             fps=30, max_frames=100)
    data = _extract_data(open(path).read())
    assert len(data["joints"]) == 100
    assert data["fps"] == 10  # 30 * 100/300 — playback duration preserved
    xs = [fr[0][0] for fr in data["joints"]]
    assert xs[0] == 0 and xs[-1] == 299  # endpoints kept, uniform coverage


def test_shape_validation(tmp_path):
    with pytest.raises(ValueError):
        export_web_player(np.zeros((4, 3)), [-1], str(tmp_path / "p.html"))
    with pytest.raises(ValueError):
        export_web_player(np.zeros((4, 2, 3)), [-1], str(tmp_path / "p.html"))


def test_smplx_fk_joints_path(tmp_path):
    """End-to-end: 322-d clip -> FK joints -> player file (the --web flag's
    code path in tools/visualize.py / s2g_visualize.py / m2d_visualize.py)."""
    from motioncraft_tpu.ops.fk import SMPLX_PARENTS
    from motioncraft_tpu.utils.export import fk_joints_322

    clip = np.zeros((6, 322), np.float32)
    clip[:, 309:312] = [0.0, 1.3, 0.0]
    joints = fk_joints_322(clip)
    assert joints.shape == (6, len(SMPLX_PARENTS), 3)
    assert np.isfinite(joints).all()
    path = export_web_player(joints, SMPLX_PARENTS,
                             str(tmp_path / "fk.html"))
    data = _extract_data(open(path).read())
    assert len(data["parents"]) == len(SMPLX_PARENTS)
