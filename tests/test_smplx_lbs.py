"""SMPL-X LBS parity tests against an independent numpy reference.

The numpy reference below follows the torch ``smplx`` package's structure
(4x4 homogeneous transform chain, reference tools/s2g_test.py smplx.create
semantics) on a fabricated tiny model, so the optimized (R, t)-pair JAX
implementation in ops/smplx_lbs.py is cross-checked by a differently
decomposed computation.
"""

import numpy as np
import pytest

from motioncraft_tpu.ops.smplx_lbs import (SMPLXModel, find_model_path,
                                           pose165_parts)
from motioncraft_tpu.ops.fk import SMPLX_PARENTS

V = 40  # tiny fabricated mesh


def fabricate_model(seed=0):
    rng = np.random.RandomState(seed)
    data = {
        "v_template": rng.randn(V, 3) * 0.3,
        "shapedirs": rng.randn(V, 3, 400) * 0.01,   # 300 betas + 100 expr
        "posedirs": rng.randn(V, 3, 54 * 9) * 0.001,
        "J_regressor": np.abs(rng.rand(55, V)),
        "weights": np.abs(rng.rand(V, 55)),
        "kintree_table": np.stack([
            np.where(SMPLX_PARENTS < 0, 2 ** 32 - 1, SMPLX_PARENTS),
            np.arange(55)]).astype(np.int64),
        "hands_meanl": rng.randn(45) * 0.1,
        "hands_meanr": rng.randn(45) * 0.1,
        "f": np.zeros((3, 3), np.int64),
    }
    data["J_regressor"] /= data["J_regressor"].sum(1, keepdims=True)
    data["weights"] /= data["weights"].sum(1, keepdims=True)
    return data


def rodrigues_np(aa):
    """axis-angle [N,3] -> rotation matrices [N,3,3] (Rodrigues)."""
    angle = np.linalg.norm(aa, axis=-1, keepdims=True) + 1e-16
    axis = aa / angle
    c, s = np.cos(angle)[..., None], np.sin(angle)[..., None]
    K = np.zeros(aa.shape[:-1] + (3, 3))
    K[..., 0, 1], K[..., 0, 2] = -axis[..., 2], axis[..., 1]
    K[..., 1, 0], K[..., 1, 2] = axis[..., 2], -axis[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -axis[..., 1], axis[..., 0]
    eye = np.eye(3)
    return eye + s * K + (1 - c) * (K @ K)


def lbs_reference(data, full_pose, betas, expression, transl):
    """Independent homogeneous-matrix LBS (smplx-package style)."""
    B = full_pose.shape[0]
    shapedirs = data["shapedirs"][:, :, :300]
    exprdirs = data["shapedirs"][:, :, 300:400]
    v_shaped = (data["v_template"][None]
                + np.einsum("bk,vik->bvi", betas, shapedirs)
                + np.einsum("bk,vik->bvi", expression, exprdirs))
    J = np.einsum("jv,bvi->bji", data["J_regressor"], v_shaped)
    rot = rodrigues_np(full_pose.reshape(B, 55, 3))
    pose_feature = (rot[:, 1:] - np.eye(3)).reshape(B, -1)
    posedirs = data["posedirs"].reshape(V * 3, -1).T
    v_posed = v_shaped + (pose_feature @ posedirs).reshape(B, V, 3)
    # homogeneous chain
    parents = SMPLX_PARENTS
    rel = J.copy()
    rel[:, 1:] -= J[:, parents[1:]]
    T = np.zeros((B, 55, 4, 4))
    T[:, 0, :3, :3] = rot[:, 0]
    T[:, 0, :3, 3] = rel[:, 0]
    T[:, 0, 3, 3] = 1
    for i in range(1, 55):
        loc = np.zeros((B, 4, 4))
        loc[:, :3, :3] = rot[:, i]
        loc[:, :3, 3] = rel[:, i]
        loc[:, 3, 3] = 1
        T[:, i] = T[:, parents[i]] @ loc
    posed_joints = T[:, :, :3, 3]
    # rest-pose correction:  A = T - pack(T @ [j; 0])
    Jh = np.concatenate([J, np.zeros((B, 55, 1))], axis=-1)
    corr = np.einsum("bjik,bjk->bji", T, Jh)
    A = T.copy()
    A[:, :, :3, 3] -= corr[:, :, :3]
    W = data["weights"]
    Tskin = np.einsum("vj,bjik->bvik", W, A)
    vh = np.concatenate([v_posed, np.ones((B, V, 1))], axis=-1)
    verts = np.einsum("bvik,bvk->bvi", Tskin, vh)[:, :, :3]
    return posed_joints + transl[:, None], verts + transl[:, None]


@pytest.fixture(scope="module")
def model_and_data():
    data = fabricate_model()
    return SMPLXModel(data, dtype=np.float32), data


def test_lbs_matches_independent_reference(model_and_data):
    model, data = model_and_data
    rng = np.random.RandomState(1)
    B = 3
    pose = rng.randn(B, 165) * 0.3
    betas = rng.randn(B, 300) * 0.5
    expr = rng.randn(B, 100) * 0.5
    transl = rng.randn(B, 3)
    parts = pose165_parts(pose)
    out = model.forward(betas=betas, expression=expr, transl=transl, **parts)
    # reference applies the hand means (flat_hand_mean=False default)
    full = pose.copy()
    full[:, 75:120] += data["hands_meanl"]
    full[:, 120:165] += data["hands_meanr"]
    joints_ref, verts_ref = lbs_reference(data, full, betas, expr, transl)
    np.testing.assert_allclose(np.asarray(out["joints"]), joints_ref,
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["vertices"]), verts_ref,
                               atol=5e-5, rtol=1e-4)


def test_zero_pose_zero_shape_is_template(model_and_data):
    model, data = model_and_data
    out = model.forward(full_pose=np.zeros((1, 165)), return_verts=True)
    # pose_mean (hand means) applies to explicit full_pose too, as in smplx
    full = np.zeros((1, 165))
    full[:, 75:120] += data["hands_meanl"]
    full[:, 120:165] += data["hands_meanr"]
    joints_ref, verts_ref = lbs_reference(
        data, full, np.zeros((1, 300)), np.zeros((1, 100)), np.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(out["vertices"]), verts_ref,
                               atol=5e-5)


def test_flat_hand_mean_skips_hand_offset(model_and_data):
    _, data = model_and_data
    model = SMPLXModel(data, flat_hand_mean=True, dtype=np.float32)
    out = model.forward(full_pose=np.zeros((1, 165)))
    joints_ref, _ = lbs_reference(
        data, np.zeros((1, 165)), np.zeros((1, 300)), np.zeros((1, 100)),
        np.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(out["joints"]), joints_ref, atol=5e-5)


def test_joints_only_skips_vertices(model_and_data):
    model, _ = model_and_data
    out = model.forward(full_pose=np.zeros((2, 165)), return_verts=False)
    assert "vertices" not in out and out["joints"].shape == (2, 55, 3)


def test_find_model_path_gates_on_missing_asset(tmp_path, monkeypatch):
    monkeypatch.delenv("MOTIONCRAFT_SMPLX_MODEL", raising=False)
    assert find_model_path(str(tmp_path / "nope.npz")) is None
    p = tmp_path / "SMPLX_NEUTRAL_2020.npz"
    np.savez(p, **fabricate_model())
    assert find_model_path(str(p)) == str(p)
    model = SMPLXModel.from_npz(str(p))
    out = model.forward(full_pose=np.zeros((1, 165)))
    assert out["joints"].shape == (1, 55, 3)
