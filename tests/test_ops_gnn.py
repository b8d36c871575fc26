"""Tests: rotation conversions (round-trips + torch/pytorch3d-free golden
checks), SMPL-X FK invariants, gesture metrics, STGCN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioncraft_tpu.ops.fk import SMPLX_PARENTS, SMPLXSkeleton
from motioncraft_tpu.ops.rotation import (ax_from_6v, ax_to_6v, axis_angle_to_matrix,
                                          axis_angle_to_quaternion, matrix_to_axis_angle,
                                          matrix_to_quaternion, matrix_to_rotation_6d,
                                          quat_slerp, quaternion_to_matrix,
                                          rotation_6d_to_matrix)


def random_rotations(rng, n):
    """Random rotation matrices via QR."""
    M = rng.randn(n, 3, 3)
    Q, R = np.linalg.qr(M)
    # fix improper rotations
    det = np.linalg.det(Q)
    Q[:, :, 0] *= np.sign(det)[:, None]
    return Q.astype(np.float32)


class TestRotations:
    def test_axis_angle_matrix_roundtrip(self, rng):
        aa = rng.randn(20, 3).astype(np.float32) * 1.5
        R = axis_angle_to_matrix(jnp.asarray(aa))
        aa2 = matrix_to_axis_angle(R)
        R2 = axis_angle_to_matrix(aa2)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=2e-5)

    def test_matrix_is_rotation(self, rng):
        aa = rng.randn(10, 3).astype(np.float32)
        R = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
        np.testing.assert_allclose(R @ np.transpose(R, (0, 2, 1)),
                                   np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_quat_matrix_roundtrip(self, rng):
        R = random_rotations(rng, 20)
        q = matrix_to_quaternion(jnp.asarray(R))
        R2 = quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)

    def test_6d_roundtrip(self, rng):
        R = random_rotations(rng, 20)
        d6 = matrix_to_rotation_6d(jnp.asarray(R))
        R2 = rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)

    def test_ax_6d_roundtrip(self, rng):
        aa = rng.randn(20, 3).astype(np.float32)
        d6 = ax_to_6v(jnp.asarray(aa))
        aa2 = ax_from_6v(d6)
        R1 = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
        R2 = np.asarray(axis_angle_to_matrix(aa2))
        np.testing.assert_allclose(R1, R2, atol=2e-4)

    def test_known_rotation_90z(self):
        aa = jnp.asarray([[0.0, 0.0, np.pi / 2]])
        R = np.asarray(axis_angle_to_matrix(aa))[0]
        want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(R, want, atol=1e-6)

    def test_slerp_endpoints(self, rng):
        q1 = np.asarray(axis_angle_to_quaternion(jnp.asarray(rng.randn(5, 3))))
        q2 = np.asarray(axis_angle_to_quaternion(jnp.asarray(rng.randn(5, 3))))
        s0 = np.asarray(quat_slerp(jnp.asarray(q1), jnp.asarray(q2), 0.0))
        s1 = np.asarray(quat_slerp(jnp.asarray(q1), jnp.asarray(q2), 1.0))
        np.testing.assert_allclose(s0, q1, atol=1e-5)
        # endpoint may be sign-flipped (shortest path)
        err = np.minimum(np.abs(s1 - q2).max(-1), np.abs(s1 + q2).max(-1))
        assert (err < 1e-4).all()

    @pytest.mark.skipif(not pytest.importorskip("torch"), reason="torch needed")
    def test_rodrigues_vs_torch_reference_formula(self, rng):
        """Golden vs an independent numpy Rodrigues implementation."""
        aa = rng.randn(8, 3)
        angle = np.linalg.norm(aa + 1e-8, axis=1, keepdims=True)
        axis = aa / angle
        K = np.zeros((8, 3, 3))
        K[:, 0, 1], K[:, 0, 2] = -axis[:, 2], axis[:, 1]
        K[:, 1, 0], K[:, 1, 2] = axis[:, 2], -axis[:, 0]
        K[:, 2, 0], K[:, 2, 1] = -axis[:, 1], axis[:, 0]
        want = (np.eye(3)[None] + np.sin(angle)[..., None] * K
                + (1 - np.cos(angle))[..., None] * (K @ K))
        got = np.asarray(axis_angle_to_matrix(jnp.asarray(aa.astype(np.float32))))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestFK:
    def test_rest_pose_identity(self):
        """Zero rotations -> joints == rest joints + root."""
        sk = SMPLXSkeleton()
        rot = jnp.zeros((2, 165))
        root = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
        joints = np.asarray(sk.forward(rot, root))
        rest = np.asarray(sk.rest_joints)
        np.testing.assert_allclose(joints[0], rest + np.array([1, 2, 3]), atol=1e-5)
        np.testing.assert_allclose(joints[1], rest, atol=1e-5)

    def test_global_rotation_rotates_all(self):
        """Root rotation by 90deg about z rotates every joint around the pelvis."""
        sk = SMPLXSkeleton()
        rot = jnp.zeros((1, 165)).at[0, 2].set(np.pi / 2)
        joints = np.asarray(sk.forward(rot, jnp.zeros((1, 3))))[0]
        rest = np.asarray(sk.rest_joints)
        Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        want = (rest - rest[0]) @ Rz.T + rest[0]
        np.testing.assert_allclose(joints, want, atol=1e-4)

    def test_156_dim_pads_jaw_eyes(self):
        sk = SMPLXSkeleton()
        j165 = np.asarray(sk.forward(jnp.zeros((1, 165)), jnp.zeros((1, 3))))
        j156 = np.asarray(sk.forward(jnp.zeros((1, 156)), jnp.zeros((1, 3))))
        np.testing.assert_allclose(j165, j156)

    def test_parents_tree_valid(self):
        assert SMPLX_PARENTS[0] == -1
        assert (SMPLX_PARENTS[1:] < np.arange(1, 55)).all()


class TestGestureMetrics:
    def test_l1div_zero_for_constant(self):
        from motioncraft_tpu.eval.gesture_metrics import L1div
        m = L1div()
        m.run(np.ones((10, 5)))
        assert m.avg() == 0.0

    def test_l1div_known_value(self):
        from motioncraft_tpu.eval.gesture_metrics import L1div
        m = L1div()
        x = np.zeros((2, 1))
        x[1] = 2.0  # mean 1 -> |dev| sums to 2
        m.run(x)
        assert m.avg() == pytest.approx(1.0)

    def test_beat_align_perfect(self, rng):
        from motioncraft_tpu.eval.gesture_metrics import BeatAlign, gahr
        assert gahr([1.0, 2.0], [1.0, 2.0], 0.3) == pytest.approx(1.0)
        assert gahr([0.0], [10.0], 0.1) < 1e-6

    def test_facial_metrics(self, rng):
        from motioncraft_tpu.eval.gesture_metrics import (facial_l2, facial_lvd,
                                                          facial_mse)
        a = rng.randn(10, 100).astype(np.float32)
        assert facial_l2(a, a) == 0.0
        assert facial_mse(a, a) == 0.0
        assert facial_lvd(a, a) == 0.0
        b = a + 1.0
        assert facial_l2(a, b) == pytest.approx(10.0, rel=1e-5)
        assert facial_mse(a, b) == pytest.approx(1.0, rel=1e-5)
        # rec = gt + 1 constant offset: vel_rec = rec[1:]-gt[:-1] =
        # gt[1:]-gt[:-1] + 1, so the asymmetric LVD sees the offset
        assert facial_lvd(b, a) == pytest.approx(1.0, abs=1e-5)

    def test_beat_align_mask_offsets(self, rng):
        from motioncraft_tpu.eval.gesture_metrics import motion_beats
        joints = rng.randn(100, 5, 3).astype(np.float32)
        full = motion_beats(joints, mmae=0.01)
        windowed = motion_beats(joints, mmae=0.01, t_start=10, t_end=90)
        assert len(full) == len(windowed) == 5
        # windowed beat indices are relative to t_start and within the window
        for b in windowed:
            assert (b < 80).all() if len(b) else True


class TestSTGCN:
    def test_stgcn_shapes(self, rng):
        from motioncraft_tpu.models.gnns import STGCN
        m = STGCN(graph_cfg=dict(layout="smpl_parts", mode="spatial"),
                  in_channels=8, base_channels=8, num_stages=3)
        x = jnp.asarray(rng.randn(2, 6, 8, 8), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        out, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
        assert out.shape == (2, 6, 8, 8)
        out_eval = m.apply(v, x)
        assert np.isfinite(np.asarray(out_eval)).all()

    def test_graph_spatial_stacks(self):
        from motioncraft_tpu.models.gnns import Graph
        g = Graph(layout="smpl_parts", mode="spatial")
        assert g.A.shape == (3, 8, 8)
        g2 = Graph(layout="smpl_joints", mode="stgcn_spatial")
        assert g2.A.shape[1:] == (22, 22)
