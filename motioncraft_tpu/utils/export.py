"""SMPL-X npz export with the reference's per-task temporal smoothing.

The reference visualizers write pyrender-compatible SMPL-X npz files
(poses [T,165] axis-angle, expressions [T,100], trans [T,3], betas) after
task-specific gaussian smoothing:
  - S2G (tools/s2g_visualize.py:235-279): smooth body+jaw axis-angle with
    sigma=3.5, hands with sigma=1.0, translation with sigma=3.5, then
    recenter the vertical translation to a 1.3 m mean.
  - M2D (tools/m2d_visualize.py:239-276): smooth body (22 joints) and hands
    (30 joints) in 6d-rotation space with sigma=3.0 (round-trip through
    ax_to_6v / ax_from_6v), translation with sigma=3.0; jaw and expressions
    are zeroed (FineDance has no face data).

Both consume the 322-d layout (body 0:66, hands 66:156, jaw 156:159,
expressions 209:309, trans 309:312).
"""

from __future__ import annotations

import numpy as np


def temporal_filter(x: np.ndarray, sigma: float) -> np.ndarray:
    """Per-channel temporal gaussian (reference motion_temporal_filter)."""
    if sigma <= 0:
        return x
    from scipy.ndimage import gaussian_filter1d
    return gaussian_filter1d(x, sigma, axis=0, mode="nearest").astype(x.dtype)


def smooth_axis_angle_6d(aa_flat: np.ndarray, sigma: float) -> np.ndarray:
    """Smooth [T, J*3] axis-angle in continuous 6d-rotation space — the
    reference's filter for dance poses (m2d_visualize.py:248-266), which
    avoids axis-angle wrap artifacts."""
    import jax.numpy as jnp

    from ..ops.rotation import ax_from_6v, ax_to_6v

    T = aa_flat.shape[0]
    J = aa_flat.shape[1] // 3
    d6 = np.asarray(ax_to_6v(jnp.asarray(aa_flat.reshape(T, J, 3))))
    d6 = temporal_filter(d6.reshape(T, -1), sigma).reshape(T, J, 6)
    return np.asarray(ax_from_6v(jnp.asarray(d6))).reshape(T, J * 3)


def _savez(path: str, poses, expressions, trans, betas, fps: int) -> None:
    np.savez(path,
             poses=poses.astype(np.float32),
             expressions=expressions.astype(np.float32),
             trans=trans.astype(np.float32),
             betas=np.asarray(betas, np.float32),
             mocap_frame_rate=np.asarray(fps),
             gender="neutral", model="smplx2020")


def s2g_export_npz(motion322: np.ndarray, path: str, betas=None,
                   fps: int = 30, smooth: bool = True) -> None:
    """Speech-gesture export (s2g_visualize.py:235-279)."""
    T = motion322.shape[0]
    poses = np.zeros((T, 165), np.float32)
    poses[:, :66] = motion322[:, :66]
    poses[:, 66:69] = motion322[:, 156:159]       # jaw
    poses[:, 75:165] = motion322[:, 66:156]       # hands
    trans = motion322[:, 309:312].copy()
    if smooth:
        poses[:, :69] = temporal_filter(poses[:, :69], 3.5)
        poses[:, 75:165] = temporal_filter(poses[:, 75:165], 1.0)
        trans = temporal_filter(trans, 3.5)
    trans[:, 1] -= np.mean(trans[:, 1]) - 1.3
    _savez(path, poses, motion322[:, 209:309], trans,
           betas if betas is not None else np.zeros(300), fps)


def m2d_export_npz(motion322: np.ndarray, path: str, fps: int = 30,
                   smooth: bool = True) -> None:
    """Dance export (m2d_visualize.py:239-276): no jaw/face, 6d smoothing."""
    T = motion322.shape[0]
    poses = np.zeros((T, 165), np.float32)
    body = motion322[:, :66]
    hands = motion322[:, 66:156]
    trans = motion322[:, 309:312].copy()
    if smooth:
        body = smooth_axis_angle_6d(body, 3.0)
        hands = smooth_axis_angle_6d(hands, 3.0)
        trans = temporal_filter(trans, 3.0)
    poses[:, :66] = body
    poses[:, 75:165] = hands
    _savez(path, poses, np.zeros((T, 100)), trans, np.zeros(300), fps)


def gt_export_npz(motion322: np.ndarray, path: str, betas=None,
                  fps: int = 30) -> None:
    """Unsmoothed ground-truth export next to a generated clip
    (s2g_visualize.py:258-268)."""
    T = motion322.shape[0]
    poses = np.zeros((T, 165), np.float32)
    poses[:, :66] = motion322[:, :66]
    poses[:, 66:69] = motion322[:, 156:159]
    poses[:, 75:165] = motion322[:, 66:156]
    _savez(path, poses, motion322[:, 209:309], motion322[:, 309:312],
           betas if betas is not None else np.zeros(300), fps)


def fk_joints_322(motion322: np.ndarray) -> np.ndarray:
    """FK joint trajectories [T, 55, 3] for a 322-d clip — the skeleton the
    stick-figure video and the web player (utils/web_player.py) draw.  Uses
    the SMPL-X rest joints when the asset is present, the approximate
    fallback skeleton otherwise (ops/fk.SMPLXSkeleton)."""
    import jax.numpy as jnp

    from ..ops.fk import SMPLXSkeleton

    T = motion322.shape[0]
    pose165 = np.zeros((T, 165), np.float32)
    pose165[:, :66] = motion322[:, :66]
    pose165[:, 66:69] = motion322[:, 156:159]
    pose165[:, 75:165] = motion322[:, 66:156]
    fk = SMPLXSkeleton()
    return np.asarray(fk.forward(jnp.asarray(pose165),
                                 jnp.asarray(motion322[:, 309:312])))
