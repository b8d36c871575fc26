"""SMPL-X rendering utilities.

The reference renders generated motions as SMPL-X mesh videos with pyrender
(offscreen OSMesa) + moviepy (EMAGE_2024/utils/other_tools.py:603-694,
fast_render.py:13-122) and as matplotlib skeletons (mogen/utils/plot_utils.py).
Mesh rendering needs the smplx body-model assets and pyrender, neither of
which ships with this image — both are auto-detected and degrade gracefully
to the always-available FK stick-figure renderer.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def have_mesh_renderer() -> bool:
    try:
        import pyrender  # noqa: F401
        import trimesh  # noqa: F401
        return True
    except ImportError:
        return False


def have_smplx_model(model_path: Optional[str] = None) -> Optional[str]:
    for cand in [model_path, os.environ.get("MOTIONCRAFT_SMPLX_MODELS"),
                 "./data/smplx_models"]:
        if cand and os.path.isdir(cand):
            return cand
    return None


def render_one_sequence(npz_path: str, out_video: str,
                        audio_path: Optional[str] = None,
                        model_path: Optional[str] = None, fps: int = 30) -> str:
    """SMPL-X npz -> video.  Mesh path (pyrender + smplx assets) when
    available; FK stick figure fallback otherwise.  Returns the written path."""
    data = np.load(npz_path, allow_pickle=True)
    poses, trans = data["poses"], data["trans"]

    models = have_smplx_model(model_path)
    if have_mesh_renderer() and models is not None:
        return _render_mesh(poses, trans, data, out_video, models, audio_path, fps)
    return _render_skeleton(poses, trans, out_video, fps)


def _render_skeleton(poses: np.ndarray, trans: np.ndarray, out_video: str,
                     fps: int) -> str:
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    from ..ops.fk import SMPLX_PARENTS, SMPLXSkeleton

    fk = SMPLXSkeleton()
    joints = np.asarray(fk(jnp.asarray(poses, jnp.float32),
                           jnp.asarray(trans, jnp.float32)))
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")

    def draw(t):
        ax.cla()
        ax.set_xlim(-1, 1); ax.set_ylim(-1, 1); ax.set_zlim(-1, 1)
        j = joints[t]
        for i, p in enumerate(SMPLX_PARENTS):
            if p >= 0:
                ax.plot([j[i, 0], j[p, 0]], [j[i, 2], j[p, 2]],
                        [j[i, 1], j[p, 1]], "b-", lw=1)

    anim = animation.FuncAnimation(fig, draw, frames=len(joints),
                                   interval=1000 / fps)
    try:
        anim.save(out_video, fps=fps)
    except Exception:
        out_video = os.path.splitext(out_video)[0] + ".gif"
        anim.save(out_video, writer="pillow", fps=fps)
    plt.close(fig)
    return out_video


def _render_mesh(poses, trans, data, out_video, model_path, audio_path, fps):
    """Frame-parallel pyrender mesh video (fast_render.py:13-122 equivalent):
    vertices from the JAX LBS body model (only the SMPL-X npz asset needed),
    rendered by a spawn pool of pyrender workers, muxed with imageio."""
    from ..ops.smplx_lbs import find_model_path
    from .fast_render import (render_frames_multiprocess,
                              smplx_vertices_for_render)

    npz = find_model_path(os.path.join(model_path, "smplx",
                                       "SMPLX_NEUTRAL_2020.npz"))
    T = len(poses)
    vertices, faces = smplx_vertices_for_render(
        poses, trans,
        expressions=np.asarray(data["expressions"], np.float32)
        if "expressions" in data else None,
        betas=np.asarray(data["betas"], np.float32) if "betas" in data else None,
        model_path=npz)
    return render_frames_multiprocess(vertices, faces, out_video, fps=fps,
                                      audio_path=audio_path)
