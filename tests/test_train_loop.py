"""End-to-end ``train_model`` loop (reference mogen/apis/train.py:35-160 +
mmcv runner semantics): loss decreases on a learnable synthetic dataset,
checkpoints are written at the configured cadence, resume continues from the
right epoch, the eval hook fires every epoch, and the loss-second-moment
timestep sampler accumulates history from the jitted step's per-sample
losses."""

import os
import re

import numpy as np
import pytest

from motioncraft_tpu.apis.factory import build_flagship, tiny_t2m_cfg
from motioncraft_tpu.apis.train import train_model
from motioncraft_tpu.data.loader import DataLoader
from motioncraft_tpu.utils.checkpoint import latest_step, save_checkpoint

pytestmark = pytest.mark.slow


class ConstantMotionDataset:
    """Deterministic target: motion = fixed pattern, so the denoiser can
    drive the recon loss down within a few dozen steps."""

    def __init__(self, n=32, T=16, D=322):
        rng = np.random.RandomState(0)
        self.pattern = rng.randn(T, D).astype(np.float32) * 0.1
        self.n, self.T, self.D = n, T, D

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"motion": self.pattern,
                "motion_mask": np.ones((self.T,), np.float32),
                "motion_length": self.T,
                "motion_metas": {"text": "a person walks forward"}}


def _losses_from_logs(lines):
    out = []
    for ln in lines:
        m = re.search(r"(?:^|\s)loss=([0-9.eE+-]+)", ln)
        if m:
            out.append(float(m.group(1)))
    return out


def test_train_model_end_to_end(tmp_path):
    cfg = tiny_t2m_cfg()
    cfg["sampler_type"] = "loss-second-moment"
    arch = build_flagship(cfg)
    ds = ConstantMotionDataset()
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=2)
    ckpt_dir = str(tmp_path / "ckpt")
    events = {"ckpts": [], "evals": []}
    logs = []

    def checkpoint_fn(state, epoch):
        if (epoch + 1) % 2 == 0:  # interval = 2
            save_checkpoint(ckpt_dir, state, epoch)
            events["ckpts"].append(epoch)

    def eval_fn(state, epoch):
        events["evals"].append(epoch)

    state = train_model(arch, loader,
                        optimizer_cfg={"type": "Adam", "lr": 2e-3},
                        max_epochs=4, steps_per_epoch=len(loader),
                        log_interval=1, logger=logs.append,
                        checkpoint_fn=checkpoint_fn, eval_fn=eval_fn)

    # hooks fired at the configured cadence
    assert events["evals"] == [0, 1, 2, 3]
    assert events["ckpts"] == [1, 3]
    assert latest_step(ckpt_dir) == 3

    # loss decreases: first epoch's mean vs last epoch's mean
    losses = _losses_from_logs(logs)
    assert len(losses) == 4 * len(loader)
    n = len(loader)
    assert np.mean(losses[-n:]) < np.mean(losses[:n]), losses

    # loss-aware sampler saw every step's (t, loss) pairs
    assert arch.sampler._loss_counts.sum() >= 4 * n * 8

    # ---- resume: continues from epoch 4, trains only the remaining 2
    logs2 = []
    events2 = {"evals": []}
    train_model(arch, loader, optimizer_cfg={"type": "Adam", "lr": 2e-3},
                max_epochs=6, steps_per_epoch=len(loader), log_interval=1,
                logger=logs2.append, resume_dir=ckpt_dir,
                eval_fn=lambda s, e: events2["evals"].append(e))
    assert any("resumed" in ln for ln in logs2)
    assert events2["evals"] == [4, 5]
    losses2 = _losses_from_logs(logs2)
    assert len(losses2) == 2 * n
    # resumed training continues to improve on the already-trained loss
    assert np.mean(losses2) < np.mean(losses[:n])


def test_train_model_tensor_parallel(tmp_path):
    """The tp path through train_model (params + adam moments sharded over
    (data, expert, tensor), persistent across steps) trains and checkpoints:
    what tools/train.py --tensor-parallel drives."""
    import jax

    from motioncraft_tpu.parallel import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    arch = build_flagship(tiny_t2m_cfg(expert_axis="expert"))
    loader = DataLoader(ConstantMotionDataset(), batch_size=8, shuffle=True)
    mesh = create_mesh(8, axes=("data", "expert", "tensor"))  # (2, 2, 2)
    ckpt_dir = str(tmp_path / "ckpt_tp")
    logs = []
    state = train_model(arch, loader,
                        optimizer_cfg={"type": "Adam", "lr": 2e-3},
                        max_epochs=2, steps_per_epoch=len(loader),
                        log_interval=1, logger=logs.append, mesh=mesh,
                        checkpoint_fn=lambda s, e: save_checkpoint(ckpt_dir, s, e))
    losses = _losses_from_logs(logs)
    n = len(loader)
    assert np.mean(losses[-n:]) < np.mean(losses[:n]), losses
    assert latest_step(ckpt_dir) == 1
    # the live state really is tensor-sharded
    w1 = state.params["block_0"]["ca_block"]["motion_moe"]["model"]["expert_w1"]
    E, d, f = w1.shape
    assert {s.data.shape for s in w1.addressable_shards} == {(E // 2, d, f // 2)}
