"""HumanML3D 263-d feature recovery tests."""

import numpy as np
import jax.numpy as jnp

from motioncraft_tpu.ops.humanml3d import qrot, qinv, recover_from_ric


def test_qrot_identity(rng):
    v = jnp.asarray(rng.randn(5, 3), jnp.float32)
    q = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (5, 4))
    np.testing.assert_allclose(np.asarray(qrot(q, v)), np.asarray(v), atol=1e-6)


def test_qrot_90deg_y(rng):
    # quaternion for 90deg about y: (cos45, 0, sin45, 0)
    s = np.sin(np.pi / 4)
    q = jnp.asarray([[np.cos(np.pi / 4), 0, s, 0]], jnp.float32)
    v = jnp.asarray([[1.0, 0, 0]], jnp.float32)
    out = np.asarray(qrot(q, v))
    np.testing.assert_allclose(out, [[0, 0, -1]], atol=1e-6)


def test_recover_from_ric_static_root(rng):
    """Zero velocities -> root stays at origin; ric positions recovered as-is."""
    T, J = 8, 22
    data = np.zeros((T, 263), np.float32)
    ric = rng.randn(J - 1, 3).astype(np.float32)
    data[:, 4:4 + (J - 1) * 3] = ric.reshape(-1)
    data[:, 3] = 0.9  # root height
    joints = np.asarray(recover_from_ric(jnp.asarray(data), J))
    assert joints.shape == (T, J, 3)
    np.testing.assert_allclose(joints[0, 0], [0, 0.9, 0], atol=1e-6)
    np.testing.assert_allclose(joints[0, 1:, 1], ric[:, 1], atol=1e-5)


def test_recover_integrates_velocity():
    T, J = 4, 22
    data = np.zeros((T, 263), np.float32)
    data[:, 1] = 0.5  # x velocity per frame
    joints = np.asarray(recover_from_ric(jnp.asarray(data), J))
    np.testing.assert_allclose(joints[:, 0, 0], [0, 0.5, 1.0, 1.5], atol=1e-5)
