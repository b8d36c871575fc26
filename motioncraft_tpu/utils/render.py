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
    """pyrender offscreen mesh render (other_tools.render_one_sequence_wo_gt
    equivalent); requires smplx + pyrender + optionally moviepy for audio."""
    import smplx
    import torch
    import pyrender
    import trimesh
    import imageio

    T = len(poses)
    model = smplx.create(model_path, model_type="smplx", gender="NEUTRAL_2020",
                         use_face_contour=False, num_betas=300,
                         num_expression_coeffs=100, ext="npz",
                         use_pca=False).eval()
    betas = torch.zeros(T, 300)
    exps = torch.from_numpy(np.asarray(data.get("expressions",
                                                np.zeros((T, 100))))).float()
    pt = torch.from_numpy(poses).float()
    out = model(betas=betas, transl=torch.from_numpy(trans).float(),
                expression=exps, jaw_pose=pt[:, 66:69],
                global_orient=pt[:, :3], body_pose=pt[:, 3:66],
                left_hand_pose=pt[:, 75:120], right_hand_pose=pt[:, 120:165],
                leye_pose=pt[:, 69:72], reye_pose=pt[:, 72:75],
                return_verts=True)
    vertices = out.vertices.detach().numpy()
    faces = model.faces

    renderer = pyrender.OffscreenRenderer(640, 480)
    frames = []
    for t in range(T):
        mesh = trimesh.Trimesh(vertices[t], faces)
        scene = pyrender.Scene()
        scene.add(pyrender.Mesh.from_trimesh(mesh))
        cam = pyrender.PerspectiveCamera(yfov=np.pi / 3)
        cam_pose = np.eye(4)
        cam_pose[2, 3] = 3.0
        scene.add(cam, pose=cam_pose)
        scene.add(pyrender.DirectionalLight(intensity=3.0), pose=cam_pose)
        color, _ = renderer.render(scene)
        frames.append(color)
    imageio.mimwrite(out_video, frames, fps=fps)
    if audio_path and os.path.isfile(audio_path):
        try:
            import moviepy.editor as mpy
            clip = mpy.VideoFileClip(out_video)
            clip = clip.set_audio(mpy.AudioFileClip(audio_path))
            muxed = os.path.splitext(out_video)[0] + "_audio.mp4"
            clip.write_videofile(muxed, logger=None)
            return muxed
        except Exception:
            pass
    return out_video
