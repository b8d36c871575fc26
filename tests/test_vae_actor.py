"""VAE architectures / ACTOR / InterCLIP smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.models.vae_actor import (ACTORDecoder, ACTOREncoder,
                                              InterCLIP, MotionVAE)
from motioncraft_tpu.registry import build_architecture


def test_actor_encoder_decoder_roundtrip(rng):
    enc = ACTOREncoder(max_seq_len=8, input_feats=12, latent_dim=16, num_heads=2,
                       ff_size=32, num_layers=1, output_var=True)
    dec = ACTORDecoder(max_seq_len=8, input_feats=12, input_dim=16, latent_dim=16,
                       num_heads=2, ff_size=32, num_layers=1)
    motion = jnp.asarray(rng.randn(2, 8, 12), jnp.float32)
    mask = jnp.ones((2, 8))
    ev = enc.init(jax.random.PRNGKey(0), motion, mask)
    mu, logvar = enc.apply(ev, motion, mask)
    assert mu.shape == (2, 16) and logvar.shape == (2, 16)
    dv = dec.init(jax.random.PRNGKey(1), mu, mask)
    out = dec.apply(dv, mu, mask)
    assert out.shape == (2, 8, 12)


def test_motion_vae_arch(rng):
    cfg = dict(type="MotionVAE",
               encoder=dict(type="ACTOREncoder", max_seq_len=8, input_feats=12,
                            latent_dim=16, num_heads=2, ff_size=32, num_layers=1,
                            output_var=True),
               decoder=dict(type="ACTORDecoder", max_seq_len=8, input_feats=12,
                            input_dim=16, latent_dim=16, num_heads=2, ff_size=32,
                            num_layers=1),
               loss_recon=dict(type="MSELoss", loss_weight=1, reduction="none"),
               kl_div_loss_weight=1e-4)
    arch = build_architecture(cfg)
    batch = {"motion": jnp.asarray(rng.randn(2, 8, 12), jnp.float32),
             "motion_mask": jnp.ones((2, 8))}
    v = arch.init(jax.random.PRNGKey(0), batch)
    loss, logs = arch.loss(v, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and "kl_div_loss" in logs


def test_interclip_embeddings(rng):
    ev = InterCLIP(input_dim=12, latent_dim=32, ff_size=32, num_layers=1,
                   num_heads=2)
    motion = rng.randn(2, 6, 24).astype(np.float32)  # two persons x 12
    emb = np.asarray(ev.encode_motion(motion, motion_mask=np.ones((2, 6))))
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-4)
    temb = np.asarray(ev.encode_text(["two people hug", "a duet dance"]))
    assert temb.shape == (2, 512)
