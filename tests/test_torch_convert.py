"""Torch -> flax conversion parity tests.

torch (cpu) is baked into the image, so we can verify the checkpoint
converters end-to-end: build the torch reference layer, convert its weights,
and demand near-bitwise output parity from our flax module.  This is the
load-bearing guarantee for importing released MotionCraft checkpoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax

from motioncraft_tpu.eval.models import BiGRUCoModule, MovementConvEncoderModule
from motioncraft_tpu.models.text_encoder import PostLNEncoderLayer
from motioncraft_tpu.utils.torch_convert import (_tree_update, t_conv1d, t_linear,
                                                 t_postln_layer, remap_controlnet_keys)


def to_np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestLayerParity:
    def test_linear_parity(self, rng):
        lin = torch.nn.Linear(6, 4)
        x = rng.randn(3, 6).astype(np.float32)
        want = lin(torch.from_numpy(x)).detach().numpy()
        from flax import linen as nn
        m = nn.Dense(4)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((3, 6)))
        params = flax.core.unfreeze(params)
        _tree_update(params["params"], t_linear(to_np_sd(lin), ""))
        got = np.asarray(m.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_postln_encoder_layer_parity(self, rng):
        d, h, ff = 16, 4, 32
        layer = torch.nn.TransformerEncoderLayer(d, h, ff, dropout=0.0,
                                                 activation="gelu")
        layer.eval()
        x = rng.randn(5, 2, d).astype(np.float32)  # [T, B, D] torch layout
        with torch.no_grad():
            want = layer(torch.from_numpy(x)).numpy()

        m = PostLNEncoderLayer(d, h, ff, 0.0, "gelu")
        params = flax.core.unfreeze(
            m.init(jax.random.PRNGKey(0), jnp.zeros((2, 5, d))))
        _tree_update(params["params"], t_postln_layer(to_np_sd(layer), ""))
        got = np.asarray(m.apply(params, jnp.asarray(np.transpose(x, (1, 0, 2)))))
        np.testing.assert_allclose(got, np.transpose(want, (1, 0, 2)),
                                   rtol=1e-4, atol=1e-5)

    def test_conv1d_parity(self, rng):
        conv = torch.nn.Conv1d(6, 8, 4, stride=2, padding=1)
        x = rng.randn(2, 6, 12).astype(np.float32)  # [B, C, L]
        with torch.no_grad():
            want = conv(torch.from_numpy(x)).numpy()
        from flax import linen as nn
        m = nn.Conv(8, (4,), strides=(2,), padding=[(1, 1)])
        params = flax.core.unfreeze(m.init(jax.random.PRNGKey(0), jnp.zeros((2, 12, 6))))
        _tree_update(params["params"], t_conv1d(to_np_sd(conv), ""))
        got = np.asarray(m.apply(params, jnp.asarray(np.transpose(x, (0, 2, 1)))))
        np.testing.assert_allclose(got, np.transpose(want, (0, 2, 1)), rtol=1e-4,
                                   atol=1e-5)

    def test_bigru_parity(self, rng):
        """Full BiGRUCo (input_emb -> biGRU final states -> output net) vs a
        torch replica of the reference MotionEncoderBiGRUCo."""
        hid, out = 8, 6
        B, T, D = 3, 7, 5

        class TorchBiGRUCo(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.input_emb = torch.nn.Linear(D, hid)
                self.gru = torch.nn.GRU(hid, hid, batch_first=True, bidirectional=True)
                self.output_net = torch.nn.Sequential(
                    torch.nn.Linear(hid * 2, hid), torch.nn.LayerNorm(hid),
                    torch.nn.LeakyReLU(0.2), torch.nn.Linear(hid, out))
                self.hidden = torch.nn.Parameter(torch.randn(2, 1, hid))

            def forward(self, x, lens):
                emb = torch.nn.utils.rnn.pack_padded_sequence(
                    self.input_emb(x), lens, batch_first=True, enforce_sorted=False)
                h0 = self.hidden.repeat(1, x.shape[0], 1)
                _, last = self.gru(emb, h0)
                return self.output_net(torch.cat([last[0], last[1]], dim=-1))

        tm = TorchBiGRUCo().eval()
        x = rng.randn(B, T, D).astype(np.float32)
        lens = [7, 5, 3]
        with torch.no_grad():
            want = tm(torch.from_numpy(x), lens).numpy()

        m = BiGRUCoModule(hid, out)
        params = flax.core.unfreeze(
            m.init(jax.random.PRNGKey(0), jnp.zeros((B, T, hid if False else D)),
                   jnp.asarray(lens)))
        sd = to_np_sd(tm)
        from motioncraft_tpu.utils.torch_convert import t_layernorm
        H = hid
        def split3(a):
            return a[:H], a[H:2 * H], a[2 * H:]
        tree = {"input_emb": t_linear(sd, "input_emb"),
                "hidden": sd["hidden"].reshape(2, -1),
                "out1": t_linear(sd, "output_net.0"),
                "out_ln": t_layernorm(sd, "output_net.1"),
                "out2": t_linear(sd, "output_net.3")}
        for direction, name in (("", "gru_fwd"), ("_reverse", "gru_bwd")):
            wr, wz, wn = split3(sd[f"gru.weight_ih_l0{direction}"])
            hr, hz, hn = split3(sd[f"gru.weight_hh_l0{direction}"])
            br, bz, bn = split3(sd[f"gru.bias_ih_l0{direction}"])
            hbr, hbz, hbn = split3(sd[f"gru.bias_hh_l0{direction}"])
            tree[name] = {
                "ir": {"kernel": wr.T, "bias": br + hbr},
                "iz": {"kernel": wz.T, "bias": bz + hbz},
                "in": {"kernel": wn.T, "bias": bn},
                "hr": {"kernel": hr.T}, "hz": {"kernel": hz.T},
                "hn": {"kernel": hn.T, "bias": hbn}}
        _tree_update(params["params"], tree)
        got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(lens)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-5)

    def test_movement_conv_parity(self, rng):
        """MovementConvEncoder without dropout (eval) vs torch replica."""
        class TorchMove(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.main = torch.nn.Sequential(
                    torch.nn.Conv1d(10, 12, 4, 2, 1), torch.nn.Dropout(0.2),
                    torch.nn.LeakyReLU(0.2),
                    torch.nn.Conv1d(12, 8, 4, 2, 1), torch.nn.Dropout(0.2),
                    torch.nn.LeakyReLU(0.2))
                self.out_net = torch.nn.Linear(8, 8)

            def forward(self, x):
                return self.out_net(self.main(x.permute(0, 2, 1)).permute(0, 2, 1))

        tm = TorchMove().eval()
        x = rng.randn(2, 16, 10).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        m = MovementConvEncoderModule(12, 8)
        params = flax.core.unfreeze(m.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 10))))
        sd = to_np_sd(tm)
        _tree_update(params["params"], {
            "conv1": t_conv1d(sd, "main.0"), "conv2": t_conv1d(sd, "main.3"),
            "out_net": t_linear(sd, "out_net")})
        got = np.asarray(m.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestKeyRemap:
    def test_controlnet_remap(self):
        sd = {"model.temporal_decoder_blocks.0.ca_block.norm.weight": 1,
              "model.temporal_decoder_blocks.1.base_block.ca_block.norm.weight": 2,
              "model.joint_embed.body_embed.weight": 3}
        out = remap_controlnet_keys(sd)
        assert "model.temporal_decoder_blocks.0.base_block.ca_block.norm.weight" in out
        assert "model.temporal_decoder_blocks.1.base_block.ca_block.norm.weight" in out
        assert "model.joint_embed.body_embed.weight" in out
