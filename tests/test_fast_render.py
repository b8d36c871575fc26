"""Frame-parallel rendering orchestration (pyrender-free: injected renderer)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from motioncraft_tpu.utils.fast_render import (render_frames_multiprocess,
                                               split_frames,
                                               smplx_vertices_for_render)


def stub_factory(width, height):
    def render(vertices, faces):
        img = np.zeros((height, width, 3), np.uint8)
        # encode the mean vertex so frames are distinguishable
        img[0, 0, 0] = int(abs(float(vertices.mean())) * 100) % 255
        return img
    return render


def test_split_frames_covers_every_frame_once():
    for total, n in ((10, 3), (1, 4), (8, 8), (100, 7)):
        chunks = split_frames(total, n)
        flat = [f for c in chunks for f in c]
        assert flat == list(range(total))
        # contiguous chunks (workers get a contiguous vertex slice)
        for c in chunks:
            assert c == list(range(c[0], c[-1] + 1))


@pytest.mark.parametrize("n_workers", [1, 3])
def test_render_frames_multiprocess(tmp_path, n_workers):
    T, V = 7, 12
    rng = np.random.RandomState(0)
    vertices = rng.randn(T, V, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    out = str(tmp_path / "out.gif")
    path = render_frames_multiprocess(vertices, faces, out, fps=5,
                                      n_workers=n_workers, width=32, height=24,
                                      frame_renderer_factory=stub_factory)
    assert os.path.isfile(path)
    import imageio.v2 as imageio
    frames = imageio.mimread(path)
    assert len(frames) == T


def test_smplx_vertices_for_render(tmp_path, monkeypatch):
    from test_smplx_lbs import fabricate_model
    p = tmp_path / "SMPLX_NEUTRAL_2020.npz"
    np.savez(p, **fabricate_model())
    T = 5
    rng = np.random.RandomState(1)
    verts, faces = smplx_vertices_for_render(
        rng.randn(T, 165).astype(np.float32) * 0.1,
        rng.randn(T, 3).astype(np.float32),
        expressions=rng.randn(T, 100).astype(np.float32) * 0.1,
        betas=np.zeros(300, np.float32), model_path=str(p))
    assert verts.shape == (T, 40, 3) and np.isfinite(verts).all()
    assert faces is not None


@pytest.mark.slow
def test_pyrender_real_frames(tmp_path):
    """Render 2 real frames through _pyrender_frame_renderer (GL context,
    mesh upload, offscreen render) and mux them — the non-mocked path.
    Skips where pyrender / a GL stack is unavailable (this CI image has
    none); on a workstation with EGL/OSMesa it pins the pyrender API drift
    the injected-renderer tests cannot see."""
    pytest.importorskip("pyrender")
    pytest.importorskip("trimesh")
    from motioncraft_tpu.utils.fast_render import _pyrender_frame_renderer
    try:
        render = _pyrender_frame_renderer(64, 48)
        tri = np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.0, 0.5, 0.0]],
                       np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        frames = [render(tri + 0.01 * i, faces) for i in range(2)]
    except Exception as e:  # no GL device/EGL in headless CI
        pytest.skip(f"GL context unavailable: {e}")
    assert frames[0].shape == (48, 64, 3)
    import imageio.v2 as imageio
    out = str(tmp_path / "real.gif")
    imageio.mimwrite(out, frames, duration=500)
    assert len(imageio.mimread(out)) == 2
