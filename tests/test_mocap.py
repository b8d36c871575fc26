"""Mocap preprocessing toolkit (pymo-equivalent capabilities)."""

import numpy as np
import pytest

from motioncraft_tpu.data.bvh import BVHData, BVHJoint, parse_bvh
from motioncraft_tpu.data.mocap import (downsample, euler_to_expmap,
                                        forward_kinematics, remove_constants,
                                        root_centric_positions, root_deltas,
                                        select_joints, write_bvh)


def chain_bvh(T=4):
    """Root -> child (offset +1y) -> end; root has pos+rot channels."""
    joints = [
        BVHJoint("Hips", None, np.zeros(3),
                 ["Xposition", "Yposition", "Zposition",
                  "Zrotation", "Xrotation", "Yrotation"], 0),
        BVHJoint("Spine", 0, np.array([0.0, 1.0, 0.0]),
                 ["Zrotation", "Xrotation", "Yrotation"], 6),
        BVHJoint("Spine_end", 1, np.array([0.0, 0.5, 0.0]), [], 9),
    ]
    frames = np.zeros((T, 9), np.float32)
    return BVHData(joints=joints, frames=frames, frame_time=1 / 30)


def test_fk_identity_pose_is_offsets():
    data = chain_bvh()
    P = forward_kinematics(data)
    np.testing.assert_allclose(P[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(P[:, 1], [[0.0, 1.0, 0.0]] * 4, atol=1e-6)
    np.testing.assert_allclose(P[:, 2], [[0.0, 1.5, 0.0]] * 4, atol=1e-6)


def test_fk_root_rotation_rotates_children():
    data = chain_bvh(T=1)
    data.frames[0, 3] = 90.0  # root Zrotation 90 deg: +y offset -> -x
    P = forward_kinematics(data)
    np.testing.assert_allclose(P[0, 1], [-1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(P[0, 2], [-1.5, 0.0, 0.0], atol=1e-6)


def test_fk_translation_and_root_deltas():
    data = chain_bvh(T=3)
    data.frames[:, 0] = [0.0, 1.0, 2.0]  # x moves 1/frame
    P = forward_kinematics(data)
    np.testing.assert_allclose(P[:, 0, 0], [0.0, 1.0, 2.0], atol=1e-6)
    d = root_deltas(P, fps=30)
    np.testing.assert_allclose(d[1:, 0], 30.0, atol=1e-4)  # dx * fps


def test_expmap_angle_magnitude():
    data = chain_bvh(T=1)
    data.frames[0, 6] = 45.0  # spine Zrotation
    e = euler_to_expmap(data)
    assert e.shape == (1, 3, 3)
    np.testing.assert_allclose(np.linalg.norm(e[0, 1]), np.deg2rad(45), atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(e[0, 0]), 0.0, atol=1e-6)


def test_root_centric_positions_zeroes_xz():
    data = chain_bvh(T=2)
    data.frames[:, 0] = [5.0, 7.0]
    data.frames[:, 2] = [1.0, 2.0]
    P = forward_kinematics(data)
    C = root_centric_positions(P)
    np.testing.assert_allclose(C[:, 0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(C[:, 0, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(C[:, 1, 1], 1.0, atol=1e-6)  # height kept


def test_select_joints_keeps_named_channels():
    data = chain_bvh()
    sub, cols = select_joints(data, ["Spine"])
    # root position channels kept + spine rotations
    assert [j.name for j in sub.joints] == ["Hips", "Spine"]
    assert sub.joints[0].channels == ["Xposition", "Yposition", "Zposition"]
    assert sub.frames.shape[1] == 6


def test_downsample_and_constants():
    x = np.arange(40, dtype=np.float32).reshape(10, 4)
    x[:, 2] = 3.0
    assert downsample(x, 2).shape == (5, 4)
    reduced, kept, consts = remove_constants(x)
    assert 2 not in kept.tolist() and reduced.shape[1] == 3
    assert consts[2] == 3.0


def test_bvh_write_parse_roundtrip(tmp_path):
    data = chain_bvh(T=3)
    data.frames[:] = np.random.RandomState(0).randn(3, 9).astype(np.float32)
    p = str(tmp_path / "chain.bvh")
    write_bvh(data, p)
    back = parse_bvh(p)
    assert [j.name for j in back.joints] == [j.name for j in data.joints]
    np.testing.assert_allclose(back.frames, data.frames, atol=1e-5)
    np.testing.assert_allclose(
        forward_kinematics(back), forward_kinematics(data), atol=1e-4)


def test_expmap_to_euler_roundtrip():
    """expmap -> euler (ZXY / XYZ) -> rotation matrix reproduces the
    original rotation."""
    import jax.numpy as jnp
    import numpy as np
    from motioncraft_tpu.data.mocap import _euler_axis_matrix, expmap_to_euler
    from motioncraft_tpu.ops.rotation import axis_angle_to_matrix
    rng = np.random.RandomState(0)
    aa = rng.randn(5, 4, 3) * 0.8
    want = np.asarray(axis_angle_to_matrix(jnp.asarray(aa.reshape(-1, 3)))).reshape(5, 4, 3, 3)
    for order in ("ZXY", "XYZ"):
        eul = np.deg2rad(expmap_to_euler(aa, order=order))
        R = np.broadcast_to(np.eye(3), want.shape).copy()
        for i, ax in enumerate(order):
            R = R @ _euler_axis_matrix(eul[..., i], ax)
        np.testing.assert_allclose(R, want, atol=1e-5)


def test_standard_scale_fit_apply():
    import numpy as np
    from motioncraft_tpu.data.mocap import standard_scale
    rng = np.random.RandomState(0)
    x = rng.randn(100, 7) * 3 + 2
    y, m, s = standard_scale(x)
    np.testing.assert_allclose(y.mean(0), 0, atol=1e-7)
    np.testing.assert_allclose(y.std(0), 1, atol=1e-4)
    y2, _, _ = standard_scale(x[:10], m, s)
    np.testing.assert_allclose(y2, y[:10], atol=1e-12)


def test_peak_indexes_finds_separated_maxima():
    from motioncraft_tpu.data.mocap import peak_indexes
    t = np.arange(400)
    y = np.sin(2 * np.pi * t / 100.0)  # peaks at ~25, ~125, ~225, ~325
    idx = peak_indexes(y, thres=0.3, min_dist=50)
    assert len(idx) == 4
    assert np.allclose(idx % 100, 25, atol=1)


def test_peak_indexes_min_dist_keeps_highest():
    from motioncraft_tpu.data.mocap import peak_indexes
    y = np.zeros(50)
    y[10], y[14], y[40] = 1.0, 2.0, 1.5  # 10 and 14 closer than min_dist
    idx = peak_indexes(y, thres=0.1, min_dist=5)
    assert list(idx) == [14, 40]


def test_peak_indexes_flat_signal_empty():
    from motioncraft_tpu.data.mocap import peak_indexes
    assert len(peak_indexes(np.ones(20))) == 0


def test_foot_contact_signal_alternates():
    """features.create_foot_contact_signal semantics (pymo features.py:19-35):
    0 from a down-peak (foot strikes), 1 from an up-peak (foot lifts)."""
    from motioncraft_tpu.data.mocap import foot_contact_idxs, foot_contact_signal
    t = np.arange(600)
    y = np.sin(2 * np.pi * t / 240.0)  # up-peaks at ~60, 300; down at ~180, 420
    up, down = foot_contact_idxs(y, t=0.02, min_dist=120)
    assert len(up) >= 2 and len(down) >= 2
    sig = foot_contact_signal(y, t=0.02, min_dist=120, start=1)
    assert set(np.unique(sig)) <= {0, 1}
    assert sig[0] == 1                       # `start` before any event
    assert sig[int(down[0]) + 1] == 0        # strike holds until next lift
    lifts_after = up[up > down[0]]
    assert sig[int(lifts_after[0]) + 1] == 1
