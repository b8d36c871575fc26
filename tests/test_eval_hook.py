"""EvalHook in-training evaluation test (tiny synthetic pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np

import motioncraft_tpu.models  # noqa: F401
from motioncraft_tpu.apis import EvalHook
from motioncraft_tpu.parallel import create_train_state
from tests.test_stmogen_e2e import make_batch, tiny_cfg
from motioncraft_tpu.registry import build_architecture


class _FakeDataset:
    """Minimal test-mode dataset yielding collate-ready samples."""

    def __init__(self, rng, n=6, T=16):
        self.items = []
        for i in range(n):
            self.items.append({
                "motion": rng.randn(T, 322).astype(np.float32),
                "motion_mask": np.ones(T, np.float32),
                "motion_length": np.int32(T),
                "motion_metas": {"text": f"action {i}"},
            })
        self.metrics_called = 0

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return dict(self.items[i])

    def evaluate(self, results, work_dir=None):
        self.metrics_called += 1
        err = float(np.mean([np.abs(r["pred_motion"] - r["motion"]).mean()
                             for r in results]))
        return {"L1 (mean)": err}


def test_eval_hook_runs(tmp_path):
    rng = np.random.RandomState(0)
    arch = build_architecture(tiny_cfg())
    batch = make_batch(rng)
    variables = arch.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(variables["params"], {"type": "Adam", "lr": 1e-3})
    ds = _FakeDataset(rng)
    logs = []
    hook = EvalHook(ds, arch, batch_size=3, interval=2, save_best="L1 (mean)",
                    work_dir=str(tmp_path), logger=logs.append)
    assert hook(state, epoch=0) is None  # interval=2 -> skip epoch 0
    metrics = hook(state, epoch=1)
    assert ds.metrics_called == 1 and "L1 (mean)" in metrics
    assert (tmp_path / "best_params.npz").exists()
    assert hook.best == float(metrics["L1 (mean)"])
