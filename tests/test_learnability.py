"""Learnability proof for the full training stack (VERDICT r3 item 3).

``tests/test_train_loop.py`` shows the loss goes down; this test shows the
train -> DDIM-sample -> evaluate chain actually LEARNS: overfit the tiny
flagship-topology STMoGen (same blocks as configs/stmogen/t2m_motionx_0_125b.py,
tiny dims) on a 4-prompt synthetic dataset until the loss is near-floor, then
assert DDIM samples from the trained weights land measurably closer to the GT
motions than samples from the init weights — both in raw motion space and in
the evaluator's embedding space (the same encoder the metric stack uses,
eval/models.py; the gt-floor harness is the yardstick for "close").  This
would catch loss-mask / aux-weight / CFG-dropout sign errors that a
loss-decrease assertion cannot.  (The reference's equivalent guarantee is its
released trained checkpoints, /root/reference/README.md:227-241.)
"""

import numpy as np
import pytest

from motioncraft_tpu.apis.factory import (build_flagship, make_text_batch,
                                          tiny_t2m_cfg)
from motioncraft_tpu.apis.train import train_model
from motioncraft_tpu.data.loader import DataLoader

pytestmark = pytest.mark.slow

PROMPTS = [
    "a person walks forward slowly",
    "a person waves both hands in the air",
    "a person jumps up and down in place",
    "a person sits down on the ground",
]
T, D = 16, 322


def _patterns():
    """Four distinct smooth motions, deliberately LOW-RANK: one shared
    per-channel amplitude vector times a per-prompt temporal sinusoid.  A
    full-rank 4x16x322 sinusoid bank exceeds what the tiny (latent-8) model
    can memorise — capacity, not training correctness, would then bound the
    sample error; rank-1 targets keep this a pure training-stack test."""
    rng = np.random.RandomState(0)
    t = np.linspace(0.0, 1.0, T, dtype=np.float32)
    amp = rng.uniform(0.3, 1.0, size=(D,)).astype(np.float32)
    freqs = np.array([0.5, 1.0, 1.75, 2.5], np.float32)
    phase = np.array([0.0, np.pi / 2, np.pi, 3 * np.pi / 2], np.float32)
    curve = np.sin(2 * np.pi * freqs[:, None] * t[None, :] + phase[:, None])
    return (curve[:, :, None] * amp[None, None, :]).astype(np.float32)


class PromptedMotionDataset:
    def __init__(self, n=64):
        self.patterns = _patterns()
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        k = i % len(PROMPTS)
        return {"motion": self.patterns[k],
                "motion_mask": np.ones((T,), np.float32),
                "motion_length": T,
                "motion_metas": {"text": PROMPTS[k]}}


def _tiny_evaluator():
    """The metric stack's contrastive motion encoder at tiny dims (untrained:
    a fixed random encoder still embeds distinct motions apart, which is all
    a relative trained-vs-init comparison needs; flagged in the assert msg)."""
    from motioncraft_tpu.eval.models import T2MContrastiveModel_SMPLX
    return T2MContrastiveModel_SMPLX(
        motion_encoder=dict(nfeats=D, vae=True, num_layers=1, latent_dim=32,
                            ff_size=32, num_heads=2),
        text_encoder=dict(num_layers=1, latent_dim=32, ff_size=32, num_heads=2,
                          bert_cfg=dict(dim=32, n_layers=1, n_heads=2,
                                        hidden_dim=64)))


def _sample(arch, variables, rng):
    import jax
    batch = make_text_batch(PROMPTS, max_seq_len=T, input_feats=D)
    return np.asarray(arch.sample(variables, batch, rng))


def _align(samples, gt):
    """The metric protocol's GT face/shape alignment (reference
    base_dataset.py:120-126): the flagship trains with ``face_no_loss=True``,
    so the face dims 156:309 and shape dims 312:322 carry no loss signal and
    evaluation copies GT into them before computing metrics.  Comparing raw
    samples without this would grade the model on dims it was told to
    ignore."""
    out = samples.copy()
    out[..., 156:309] = gt[..., 156:309]
    out[..., 312:322] = gt[..., 312:322]
    return out


def _variables(state):
    v = {"params": state.params}
    if state.extra_variables:
        v.update(state.extra_variables)
    return v


def test_overfit_then_sample_beats_init():
    import jax

    cfg = tiny_t2m_cfg()
    # scale=0.0 makes scale_func's CFG weight identically 1 (pure conditional
    # branch) — the right sampler for an overfit check: with 4 memorised
    # prompts the unconditional branch is their mean, and extrapolating away
    # from it (scale 6.5) is a generative prior, not a correctness signal.
    cfg["model"]["scale_func_cfg"] = {"scale": 0.0}
    arch = build_flagship(cfg)

    ds = PromptedMotionDataset()
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=0)
    losses = []

    def logger(msg):
        # "epoch E step S: ... loss=V ..."
        for tok in msg.split():
            if tok.startswith("loss="):
                losses.append(float(tok.split("=")[1]))

    # init-weights reference: same seed/init path as the train run
    first = next(iter(loader))
    init_vars = arch.init(jax.random.PRNGKey(0), first)

    # 150 epochs (1200 steps): the low-t denoising memorises within ~300
    # steps, but the HIGH-t regime — pure noise in, text-determined x0 out,
    # which is what the first DDIM step exercises — needs the longer tail
    # (measured: 320 steps leave t=999 x0-pred at 0.16 MSE and samples only
    # 1.3x better than init; 1200 steps reach 0.11 and 5x)
    state = train_model(arch, loader, optimizer_cfg={"type": "Adam", "lr": 1e-3},
                        max_epochs=150, seed=0, log_interval=8, logger=logger)
    assert losses, "train_model logged no losses"
    # near-floor: the recon MSE on a memorised constant-per-prompt target
    # must collapse well below its starting value (aux MoE/KL terms keep the
    # absolute total above zero)
    assert losses[-1] < 0.25 * losses[0], (losses[0], losses[-1])

    rng = jax.random.PRNGKey(42)
    gt = _patterns()
    samp_init = _align(_sample(arch, init_vars, rng), gt)
    samp_trained = _align(_sample(arch, _variables(state), rng), gt)

    mse_init = float(np.mean((samp_init - gt) ** 2))
    mse_trained = float(np.mean((samp_trained - gt) ** 2))
    assert mse_trained < 0.5 * mse_init, (mse_init, mse_trained)

    # evaluator-space distance (the metric stack's own motion encoder):
    # trained samples must embed measurably closer to GT than init samples
    ev = _tiny_evaluator()
    lengths = np.full((4,), T)
    e_gt = np.asarray(ev.encode_motion(gt, lengths))
    e_init = np.asarray(ev.encode_motion(samp_init, lengths))
    e_trained = np.asarray(ev.encode_motion(samp_trained, lengths))
    d_init = float(np.linalg.norm(e_init - e_gt, axis=-1).mean())
    d_trained = float(np.linalg.norm(e_trained - e_gt, axis=-1).mean())
    # 0.7: the protocol alignment injects identical GT face dims into both
    # sets, compressing embedding distances — the raw-space 0.5 bound is the
    # strong one; this asserts the improvement survives the encoder
    assert d_trained < 0.7 * d_init, (
        f"evaluator-space distance did not improve: init={d_init:.4f} "
        f"trained={d_trained:.4f} (untrained tiny evaluator — relative "
        f"comparison only)")

    # conditioning is actually used: each trained sample matches ITS OWN
    # prompt's pattern better than any other prompt's (catches a model that
    # collapses to the dataset mean).  Loss-bearing dims only — the aligned
    # samples carry their own prompt's GT face, which would make a full-dim
    # argmin circular.
    body = np.r_[0:156, 309:312]
    per_pair = ((samp_trained[:, None, :, body] - gt[None, :, :, body]) ** 2
                ).mean(axis=(2, 3))
    assert (per_pair.argmin(axis=1) == np.arange(4)).all(), per_pair
