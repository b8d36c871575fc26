"""VAESKConv (EMAGE S2G FID evaluator) torch->flax conversion parity.

Fabricates a torch ``model_state`` checkpoint with the reference's key
layout (motion_representation.py:67-76 + skeleton.py:9-113,547-585), runs an
independent torch forward (F.conv1d / F.group_norm / pooling matmul) over the
real 55-joint SMPL-X topology with the production eval settings
(vae_layer=4, grow [1,1,2,1], st_mogen_emage.yaml:14-20), and checks the
converted flax model matches to <=1e-4.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from motioncraft_tpu.eval.s2g_fid import (VAESKConv, build_edge_topology,  # noqa: E402
                                          find_neighbor, neighbor_mask,
                                          pooling_matrix, skeleton_pooling)
from motioncraft_tpu.ops.fk import SMPLX_PARENTS  # noqa: E402


pytestmark = pytest.mark.parity

def _layer_structure(num_layers=4, grow=(1, 1, 2, 1), channel_base=6):
    parents = [int(p) for p in SMPLX_PARENTS]
    topologies = [build_edge_topology(parents)]
    cb = [channel_base]
    for g in grow[:num_layers]:
        cb.append(cb[-1] * g)
    layers = []
    for i in range(num_layers):
        edges = topologies[i]
        nbrs = find_neighbor(edges, 2)
        last = i == num_layers - 1
        pooling_list, new_edges = skeleton_pooling(edges, last)
        layers.append(dict(
            edges=edges, nbrs=nbrs,
            in_per=cb[i], out_per=cb[i + 1],
            conv_mask=neighbor_mask(nbrs, cb[i], cb[i + 1], 4),
            short_mask=neighbor_mask(nbrs, cb[i], cb[i + 1], 1),
            pool=pooling_matrix(pooling_list, len(edges), cb[i + 1])
            if len(pooling_list) != len(edges) else None,
        ))
        topologies.append(edges if last else new_edges)
    return layers


def _fabricate_state_dict(layers, vae_length=240, seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    for i, L in enumerate(layers):
        J = len(L["edges"])
        out_c, in_c = J * L["out_per"], J * L["in_per"]
        p = f"encoder.layers.{i}.0"
        # raw torch weights are zero outside the neighborhood mask
        sd[f"{p}.residual.0.weight"] = (
            rng.randn(out_c, in_c, 4).astype(np.float32) * 0.2
            * np.transpose(L["conv_mask"], (0, 1, 2)))
        sd[f"{p}.residual.0.bias"] = rng.randn(out_c).astype(np.float32) * 0.1
        sd[f"{p}.residual.1.weight"] = 1 + rng.randn(out_c).astype(np.float32) * 0.1
        sd[f"{p}.residual.1.bias"] = rng.randn(out_c).astype(np.float32) * 0.1
        sd[f"{p}.shortcut.weight"] = (
            rng.randn(out_c, in_c, 1).astype(np.float32) * 0.2 * L["short_mask"])
        sd[f"{p}.shortcut.bias"] = rng.randn(out_c).astype(np.float32) * 0.1
    sd["fc_mu.weight"] = rng.randn(vae_length, vae_length).astype(np.float32) * 0.1
    sd["fc_mu.bias"] = rng.randn(vae_length).astype(np.float32) * 0.1
    return sd


def _torch_forward(sd, layers, x, variational=False):
    """Independent torch forward of the EMAGE encoder stack."""
    h = torch.from_numpy(x).permute(0, 2, 1)  # [B, C, T]
    for i, L in enumerate(layers):
        p = f"encoder.layers.{i}.0"
        w = torch.from_numpy(sd[f"{p}.residual.0.weight"])
        res = F.conv1d(F.pad(h, (1, 1), mode="constant"), w,
                       torch.from_numpy(sd[f"{p}.residual.0.bias"]), stride=2)
        res = F.group_norm(res, 10, torch.from_numpy(sd[f"{p}.residual.1.weight"]),
                           torch.from_numpy(sd[f"{p}.residual.1.bias"]))
        short = F.conv1d(h, torch.from_numpy(sd[f"{p}.shortcut.weight"]),
                         torch.from_numpy(sd[f"{p}.shortcut.bias"]), stride=2)
        h = res + short
        if L["pool"] is not None:
            h = torch.einsum("dc,bct->bdt", torch.from_numpy(L["pool"]), h)
        h = torch.tanh(h)
    h = h.permute(0, 2, 1)  # [B, T', C]
    if variational:
        h = F.linear(h, torch.from_numpy(sd["fc_mu.weight"]),
                     torch.from_numpy(sd["fc_mu.bias"]))
    return h.numpy()


def test_vaeskconv_topology_dims():
    layers = _layer_structure()
    assert [len(L["edges"]) for L in layers] == [55, 35, 20, 20]
    # last two layers keep 20 edges -> natural output dim 20*12 = 240
    assert layers[-1]["out_per"] * len(layers[-1]["edges"]) == 240
    assert layers[2]["pool"] is None and layers[3]["pool"] is None


@pytest.mark.parametrize("variational", [False, True])
def test_vaeskconv_conversion_parity(tmp_path, variational):
    layers = _layer_structure()
    sd = _fabricate_state_dict(layers)
    # save in the EMAGE trainer format, with DDP "module." prefixes
    ckpt = {"model_state": {f"module.{k}": torch.from_numpy(v)
                            for k, v in sd.items()}}
    path = str(tmp_path / "AESKConv_240_100.bin")
    torch.save(ckpt, path)

    model = VAESKConv(vae_length=240, vae_layer=4, vae_test_dim=330,
                      variational=variational,
                      init_cfg=dict(type="Pretrained", checkpoint=path))
    x = np.random.RandomState(1).randn(2, 16, 330).astype(np.float32)
    got = np.asarray(model.map2latent(x))
    want = _torch_forward(sd, layers, x, variational=variational)
    assert got.shape == want.shape == (2, 1, 240)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_vaeskconv_encode_motion_shape():
    model = VAESKConv()
    emb = np.asarray(model.encode_motion(np.zeros((3, 32, 330), np.float32)))
    assert emb.shape == (3, 240)
    # raw 322-d SMPL-X motion goes through the rot6d adapter (+ trim to a
    # multiple of the 2^4 temporal downsampling)
    emb322 = np.asarray(model.encode_motion(
        np.random.RandomState(0).randn(2, 35, 322).astype(np.float32)))
    assert emb322.shape == (2, 240)
    assert np.isfinite(emb322).all()
