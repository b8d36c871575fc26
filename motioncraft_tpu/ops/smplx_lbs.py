"""SMPL-X body model (linear blend skinning) in JAX.

The reference evaluates S2G facial metrics on SMPL-X mesh *vertices* and
L1div/BeatAlign on LBS *joints* produced by ``smplx.create(...,
gender='NEUTRAL_2020', num_betas=300, num_expression_coeffs=100,
use_pca=False)`` (reference tools/s2g_test.py:76-90, 364-415).  This module
re-implements that body model's forward pass as pure, jittable JAX:

  v_shaped = v_template + shapedirs @ betas + exprdirs @ expression
  J_rest   = J_regressor @ v_shaped
  v_posed  = v_shaped + posedirs @ vec(R_1..54 - I)
  G_j      = kinematic-chain global transforms from (R_j, J_rest)
  A_j      = G_j with rest-pose correction (t - R @ j_rest)
  verts    = (W @ A) * v_posed  (per-vertex skinning) + transl
  joints   = global joint positions (+ transl)

Unlike the torch ``smplx`` package we carry (R, t) pairs instead of 4x4
homogeneous matrices — fewer FLOPs, identical math.  The batch dimension
(B*T frames) carries the MXU work; the 55-step chain is a static python
loop under jit.

The model asset (``SMPLX_NEUTRAL_2020.npz``) is gated: ``find_model_path``
searches an explicit path, ``$MOTIONCRAFT_SMPLX_MODEL``, and the repo data
dir.  Without it, callers must fall back to the approximate skeleton in
``ops/fk.py`` and flag their outputs as non-protocol.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .fk import SMPLX_PARENTS
from .rotation import axis_angle_to_matrix

NUM_JOINTS = 55
SHAPE_SPACE_DIM = 300   # smplx package constant: betas live in shapedirs[..., :300]
NUM_EXPR = 100


def find_model_path(path: Optional[str] = None) -> Optional[str]:
    """Locate an SMPL-X neutral npz model; None when absent (asset-gated)."""
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in [path, os.environ.get("MOTIONCRAFT_SMPLX_MODEL"),
                 os.path.join(here, "..", "..", "data", "smplx_models", "smplx",
                              "SMPLX_NEUTRAL_2020.npz"),
                 os.path.join(here, "..", "..", "data", "SMPLX_NEUTRAL_2020.npz")]:
        if cand and os.path.isfile(cand):
            return cand
    return None


class SMPLXModel:
    """Functional SMPL-X LBS; all buffers are host numpy until ``forward``.

    Parameters mirror the torch smplx forward used by the reference harness:
    pose parts are axis-angle, hands are full 45-d (use_pca=False), and the
    hand means are added internally (flat_hand_mean=False default), matching
    ``smplx.body_models.SMPLX.forward``.
    """

    def __init__(self, data: Dict[str, np.ndarray], num_betas: int = 300,
                 num_expression: int = NUM_EXPR, flat_hand_mean: bool = False,
                 dtype=jnp.float32):
        self.dtype = dtype
        self.v_template = np.asarray(data["v_template"], np.float64)  # [V, 3]
        V = self.v_template.shape[0]
        shapedirs = np.asarray(data["shapedirs"], np.float64)         # [V,3,400]
        n_b = min(num_betas, SHAPE_SPACE_DIM, shapedirs.shape[-1])
        self.num_betas = n_b
        self.shapedirs = shapedirs[:, :, :n_b]
        if shapedirs.shape[-1] > SHAPE_SPACE_DIM:
            n_e = min(num_expression, shapedirs.shape[-1] - SHAPE_SPACE_DIM)
            self.exprdirs = shapedirs[:, :, SHAPE_SPACE_DIM:SHAPE_SPACE_DIM + n_e]
        else:
            self.exprdirs = np.zeros((V, 3, num_expression))
        self.num_expression = self.exprdirs.shape[-1]
        # posedirs stored [V,3,9*(J-1)] in the npz; fold to [9*(J-1), V*3]
        posedirs = np.asarray(data["posedirs"], np.float64)
        self.posedirs = posedirs.reshape(V * 3, -1).T                  # [486, V*3]
        self.J_regressor = np.asarray(data["J_regressor"], np.float64)  # [55, V]
        self.lbs_weights = np.asarray(data["weights"], np.float64)      # [V, 55]
        if "kintree_table" in data:
            parents = np.asarray(data["kintree_table"])[0].astype(np.int64)
            parents[0] = -1
            self.parents = parents.astype(np.int32)
        else:
            self.parents = SMPLX_PARENTS
        self.faces = np.asarray(data["f"]).astype(np.int32) if "f" in data else None
        # full-pose mean: zeros except the hand components (flat_hand_mean=False)
        pose_mean = np.zeros(NUM_JOINTS * 3)
        if not flat_hand_mean:
            if "hands_meanl" in data:
                pose_mean[75:120] = np.asarray(data["hands_meanl"], np.float64).ravel()
            if "hands_meanr" in data:
                pose_mean[120:165] = np.asarray(data["hands_meanr"], np.float64).ravel()
        self.pose_mean = pose_mean
        self._jit_forward = None

    @classmethod
    def from_npz(cls, path: Optional[str] = None, **kw) -> "SMPLXModel":
        resolved = find_model_path(path)
        if resolved is None:
            raise FileNotFoundError(
                "SMPL-X model npz not found (set MOTIONCRAFT_SMPLX_MODEL or pass "
                "a path); vertex-level metrics are asset-gated")
        return cls(dict(np.load(resolved, allow_pickle=True)), **kw)

    # ---- jittable core -------------------------------------------------

    def _buffers(self):
        d = self.dtype
        return dict(
            v_template=jnp.asarray(self.v_template, d),
            shapedirs=jnp.asarray(self.shapedirs, d),
            exprdirs=jnp.asarray(self.exprdirs, d),
            posedirs=jnp.asarray(self.posedirs, d),
            J_regressor=jnp.asarray(self.J_regressor, d),
            lbs_weights=jnp.asarray(self.lbs_weights, d),
            pose_mean=jnp.asarray(self.pose_mean, d),
        )

    def forward(self, betas=None, expression=None, global_orient=None,
                body_pose=None, jaw_pose=None, leye_pose=None, reye_pose=None,
                left_hand_pose=None, right_hand_pose=None, transl=None,
                full_pose=None, return_verts: bool = True) -> Dict[str, jnp.ndarray]:
        """Batched forward.  Any missing part defaults to zeros.

        ``full_pose`` [B, 165] (global, body 63, jaw, leye, reye, lhand 45,
        rhand 45) overrides the individual parts.  Returns ``joints``
        [B, 55, 3] and (when return_verts) ``vertices`` [B, V, 3].
        """
        parts = [global_orient, body_pose, jaw_pose, leye_pose, reye_pose,
                 left_hand_pose, right_hand_pose, betas, expression, transl,
                 full_pose]
        B = next(int(np.shape(p)[0]) for p in parts if p is not None)
        d = self.dtype

        def fill(x, dim):
            if x is None:
                return jnp.zeros((B, dim), d)
            return jnp.asarray(x, d).reshape(B, dim)

        if full_pose is None:
            full_pose = jnp.concatenate([
                fill(global_orient, 3), fill(body_pose, 63), fill(jaw_pose, 3),
                fill(leye_pose, 3), fill(reye_pose, 3),
                fill(left_hand_pose, 45), fill(right_hand_pose, 45)], axis=1)
        else:
            full_pose = jnp.asarray(full_pose, d).reshape(B, NUM_JOINTS * 3)
        betas = fill(betas, self.num_betas)
        expression = fill(expression, self.num_expression)
        transl = fill(transl, 3)

        if self._jit_forward is None:
            bufs = self._buffers()
            parents = self.parents

            def _fwd(full_pose, betas, expression, transl, return_verts):
                return lbs(full_pose + bufs["pose_mean"], betas, expression,
                           transl, parents=parents, return_verts=return_verts,
                           **bufs2_kw(bufs))

            self._jit_forward = jax.jit(_fwd, static_argnums=(4,))
        return self._jit_forward(full_pose, betas, expression, transl,
                                 return_verts)

    __call__ = forward

    def forward_chunked(self, chunk: int = 256, return_verts: bool = True,
                        **parts) -> Dict[str, np.ndarray]:
        """Forward over a long frame sequence in fixed-size chunks (one jit
        compile; the tail chunk is padded).  Skinning a [B, V, 3, 3] tensor
        for thousands of frames at once would blow HBM — V=10475 vertices x
        9 floats is ~380 KB/frame."""
        T = next(int(np.shape(p)[0]) for p in parts.values() if p is not None)
        outs = []
        for s in range(0, T, chunk):
            e = min(s + chunk, T)
            pad = chunk - (e - s)

            def cut(x):
                if x is None:
                    return None
                seg = np.asarray(x)[s:e]
                if pad:
                    seg = np.concatenate([seg, np.repeat(seg[-1:], pad, 0)], 0)
                return seg

            out = self.forward(return_verts=return_verts,
                               **{k: cut(v) for k, v in parts.items()})
            outs.append({k: np.asarray(v)[: e - s] for k, v in out.items()})
        return {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}


def bufs2_kw(bufs):
    return {k: v for k, v in bufs.items() if k != "pose_mean"}


def lbs(full_pose: jnp.ndarray, betas: jnp.ndarray, expression: jnp.ndarray,
        transl: jnp.ndarray, *, v_template, shapedirs, exprdirs, posedirs,
        J_regressor, lbs_weights, parents, return_verts: bool = True
        ) -> Dict[str, jnp.ndarray]:
    """Pure LBS: pose [B,165] (mean already added), betas [B,nb],
    expression [B,ne], transl [B,3] -> joints [B,55,3] (+vertices [B,V,3])."""
    B = full_pose.shape[0]
    J = len(parents)
    # blendshapes
    v_shaped = (v_template[None]
                + jnp.einsum("bk,vik->bvi", betas, shapedirs)
                + jnp.einsum("bk,vik->bvi", expression, exprdirs))
    j_rest = jnp.einsum("jv,bvi->bji", J_regressor, v_shaped)          # [B,J,3]
    rot_mats = axis_angle_to_matrix(full_pose.reshape(B, J, 3))        # [B,J,3,3]
    # kinematic chain with (R, t) pairs
    rel = j_rest.at[:, 1:].add(-j_rest[:, parents[1:]])
    Rg = [rot_mats[:, 0]]
    tg = [rel[:, 0]]
    for i in range(1, J):
        p = int(parents[i])
        Rg.append(Rg[p] @ rot_mats[:, i])
        tg.append(tg[p] + jnp.einsum("bij,bj->bi", Rg[p], rel[:, i]))
    Rg = jnp.stack(Rg, axis=1)                                         # [B,J,3,3]
    joints = jnp.stack(tg, axis=1)                                     # [B,J,3]
    out = {"joints": joints + transl[:, None]}
    if not return_verts:
        return out
    # pose blendshapes: vec(R_1.. - I) @ posedirs
    eye = jnp.eye(3, dtype=full_pose.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, (J - 1) * 9)
    v_posed = v_shaped + jnp.einsum(
        "bp,pk->bk", pose_feature, posedirs).reshape(B, -1, 3)
    # rest-pose correction: A_j = (Rg_j, t_j - Rg_j @ j_rest_j)
    At = joints - jnp.einsum("bjik,bjk->bji", Rg, j_rest)              # [B,J,3]
    # skinning
    R_skin = jnp.einsum("vj,bjik->bvik", lbs_weights, Rg)              # [B,V,3,3]
    t_skin = jnp.einsum("vj,bji->bvi", lbs_weights, At)                # [B,V,3]
    verts = jnp.einsum("bvik,bvk->bvi", R_skin, v_posed) + t_skin
    out["vertices"] = verts + transl[:, None]
    return out


def pose165_parts(pose165: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Split a BEAT2 smplxflame 165-d axis-angle pose into smplx call parts
    (layout per reference tools/s2g_test.py:365-376: global 0:3, body 3:66,
    jaw 66:69, leye 69:72, reye 72:75, lhand 75:120, rhand 120:165)."""
    return dict(global_orient=pose165[:, 0:3], body_pose=pose165[:, 3:66],
                jaw_pose=pose165[:, 66:69], leye_pose=pose165[:, 69:72],
                reye_pose=pose165[:, 72:75], left_hand_pose=pose165[:, 75:120],
                right_hand_pose=pose165[:, 120:165])
