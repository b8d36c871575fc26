"""HumanML3D 263-d feature recovery + skeleton plotting support.

Re-implements mogen/utils/plot_utils.py:40-104 (qrot/qinv,
recover_root_rot_pos, recover_from_ric) in jnp: the 263-d HumanML3D vector
(root rot-vel, root xz-vel, root height, ric positions, 6d rotations,
velocities, foot contacts) -> 22 global joint positions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# HumanML3D / KIT kinematic chains for plotting (Guo et al. conventions)
T2M_KINEMATIC_CHAIN = [[0, 2, 5, 8, 11], [0, 1, 4, 7, 10], [0, 3, 6, 9, 12, 15],
                       [9, 14, 17, 19, 21], [9, 13, 16, 18, 20]]
KIT_KINEMATIC_CHAIN = [[0, 11, 12, 13, 14, 15], [0, 16, 17, 18, 19, 20],
                       [0, 1, 2, 3, 4], [3, 5, 6, 7], [3, 8, 9, 10]]


def qinv(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0])


def qrot(q, v):
    """Rotate v [..., 3] by quaternion q [..., 4] (w, x, y, z)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2 * (q[..., :1] * uv + uuv)


def recover_root_rot_pos(data):
    """Integrate root yaw velocity + xz velocity (plot_utils.py:69-88)."""
    rot_vel = data[..., 0]
    r_rot_ang = jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], -1), -1)
    zeros = jnp.zeros_like(r_rot_ang)
    r_rot_quat = jnp.stack([jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], -1)

    r_xz = jnp.concatenate([jnp.zeros_like(data[..., :1, 1:3]), data[..., :-1, 1:3]],
                           axis=-2)
    r_pos = jnp.stack([r_xz[..., 0], jnp.zeros_like(r_xz[..., 0]), r_xz[..., 1]], -1)
    r_pos = qrot(qinv(r_rot_quat), r_pos)
    r_pos = jnp.cumsum(r_pos, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])
    return r_rot_quat, r_pos


def recover_from_ric(data, joints_num: int = 22):
    """263-d features [..., T, 263] -> joints [..., T, J, 3] (plot_utils.py:91-104)."""
    data = jnp.asarray(data)
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4:(joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))
    rot = jnp.broadcast_to(qinv(r_rot_quat)[..., None, :],
                           positions.shape[:-1] + (4,))
    positions = qrot(rot, positions)
    positions = positions.at[..., 0].add(r_pos[..., 0:1])
    positions = positions.at[..., 2].add(r_pos[..., 2:3])
    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


def plot_3d_motion(save_path: str, joints: np.ndarray, title: str = "",
                   kinematic_chain=T2M_KINEMATIC_CHAIN, fps: int = 20):
    """Matplotlib 3D skeleton animation (plot_utils.py:107-) for HumanML3D."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    joints = np.asarray(joints)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    radius = max(1.0, float(np.abs(joints).max()))

    def draw(t):
        ax.cla()
        ax.set_xlim(-radius, radius); ax.set_ylim(-radius, radius)
        ax.set_zlim(0, 2 * radius)
        ax.set_title(title[:60])
        j = joints[t]
        for chain in kinematic_chain:
            ax.plot(j[chain, 0], j[chain, 2], j[chain, 1], lw=2)

    anim = animation.FuncAnimation(fig, draw, frames=len(joints),
                                   interval=1000 / fps)
    try:
        anim.save(save_path, fps=fps)
    except Exception:
        save_path = save_path.rsplit(".", 1)[0] + ".gif"
        anim.save(save_path, writer="pillow", fps=fps)
    plt.close(fig)
    return save_path
