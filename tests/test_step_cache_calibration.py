"""Step-cache calibration artifact (VERDICT r3 item 4).

``artifacts/step_cache_flagship.json`` is the committed operating point for
``--step-cache-table`` on the flagship T2M config: the error profile of one
exact DDIM-50 probe (configs/tests/flagship_calib.py — the exact 0.125B
topology over synthetic protocol-shape data) against a short synthetic-data
overfit checkpoint (tools/make_calib_ckpt.py — a trained denoiser's smooth
residual dynamics are what SmoothCache calibrates against; an untrained model
has either exactly-zero residuals (zero-init output heads) or, perturbed,
noise-like dynamics that never cross a sane reuse threshold).  Re-calibrate
against a real trained checkpoint before quoting metric numbers.  Tests here
keep the artifact honest:

- fast: the committed flags are exactly ``flags_from_errors`` of the committed
  error profile at the committed threshold (no hand edits), structural
  invariants hold (step 0 computes, tail computes, shapes match the flagship
  DDIM-50 x 4-layer schedule), and the table round-trips through
  ``load_flags`` into a ``StepCacheConfig`` that ``pattern_flags`` accepts.
- slow: end-to-end regeneration of a calibration artifact through the real
  CLI (tiny flagship topology so CI stays cheap), then a cached sampling run
  with the calibrated table stays within the documented drift bound of the
  exact sampler.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "artifacts", "step_cache_flagship.json")


def _artifact():
    with open(ARTIFACT) as f:
        return json.load(f)


def test_committed_flags_match_committed_errors():
    from motioncraft_tpu.diffusion import flags_from_errors

    a = _artifact()
    errors = np.asarray(a["errors"], dtype=np.float64)
    flags = np.asarray(a["flags"], dtype=bool)
    # flagship schedule shape: DDIM-50 ('15,15,8,6,6') x 4 decoder layers
    assert errors.shape == (50, 4) and flags.shape == (50, 4)
    regen = flags_from_errors(errors, threshold=a["threshold"],
                              max_consecutive=a["max_consecutive"],
                              tail=a["tail"])
    np.testing.assert_array_equal(regen, flags)
    assert abs(flags.mean() - a["reuse_fraction"]) < 1e-6
    # provenance honesty: the committed table is probed on a
    # trained-on-synthetic-data checkpoint (round 5: the TPU train-soak
    # model; earlier: tools/make_calib_ckpt.py overfit) — real residual
    # dynamics, NOT a released/real-data model; the note must say so.
    # (A random-init probe would need perturb>0 to be non-vacuous —
    # zero-init output heads give an identically-zero profile.)
    if a["random_weights"]:
        assert a["perturb"] > 0, "unperturbed random-init probe is vacuous"
    else:
        assert a["checkpoint"] and a["note"], "checkpoint probes need a note"
        assert "NOT a released" in a["note"]
    assert (errors[1:] > 0).any(), "vacuous error profile"
    # a useful operating point actually reuses something
    assert a["reuse_fraction"] > 0.2, a["reuse_fraction"]
    # the probe config must carry the flagship topology + DDIM-50 respace
    assert a["config"].endswith(("configs/tests/flagship_calib.py",
                                 "configs/tests/protocol_learn.py"))


def test_committed_flags_are_valid_schedule():
    from motioncraft_tpu.diffusion import (StepCacheConfig, load_flags,
                                           pattern_flags)

    flags = load_flags(ARTIFACT)
    assert not flags[0].any(), "step 0 cannot reuse (cache starts at zeros)"
    a = _artifact()
    assert not flags[-a["tail"]:].any(), "tail steps must compute"
    # max_consecutive honoured per layer
    for l in range(flags.shape[1]):
        run = 0
        for s in range(flags.shape[0]):
            run = run + 1 if flags[s, l] else 0
            assert run <= a["max_consecutive"]
    # the table passes the sampler's own validation path
    cfg = StepCacheConfig(flags=flags)
    out = pattern_flags(50, 4, cfg)
    np.testing.assert_array_equal(out, flags)


@pytest.mark.slow
def test_calibration_cli_regenerates_artifact(tmp_path):
    """End-to-end CLI regen at tiny scale + drift bound of the cached run."""
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out_npz = tmp_path / "calib.npz"
    out_json = tmp_path / "calib.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "calibrate_step_cache.py"),
         os.path.join(REPO, "configs", "tests", "tiny_t2m.py"),
         str(out_npz), "--json", str(out_json), "--batches", "1",
         "--batch-size", "4", "--threshold", "1.0", "--tail", "1",
         "--perturb", "0.05"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    with open(out_json) as f:
        a = json.load(f)
    flags = np.asarray(a["flags"], dtype=bool)
    # tiny config: respace '4' -> 4 steps, 1 decoder layer; the loose
    # threshold/tail must engage real reuse so the drift check below bites
    assert flags.shape == (4, 1)
    assert not flags[0].any()
    assert flags.any(), "calibration produced no reuse at threshold 1.0"
    npz = np.load(out_npz)
    np.testing.assert_allclose(npz["errors"], np.asarray(a["errors"]),
                               atol=1e-6)

    # the calibrated table drives the sampler and stays near the exact
    # output — built from the SAME config file the table was probed on
    import jax
    import motioncraft_tpu.models  # noqa: F401
    from motioncraft_tpu.apis.factory import make_text_batch
    from motioncraft_tpu.config import Config
    from motioncraft_tpu.diffusion import StepCacheConfig, load_flags
    from motioncraft_tpu.registry import build_architecture

    cfg = Config.fromfile(os.path.join(REPO, "configs", "tests", "tiny_t2m.py"))
    arch = build_architecture(cfg.model)
    batch = make_text_batch(["a person walks"],
                            max_seq_len=cfg.model["model"]["max_seq_len"],
                            input_feats=322)
    variables = arch.init(jax.random.PRNGKey(0), batch)
    # perturb away from the zero-init heads so the drift check is not vacuous
    # (zero residuals reuse to zero residuals — exact by construction)
    import jax.numpy as jnp
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    ks = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              if jnp.issubdtype(l.dtype, jnp.floating) else l
              for l, k in zip(leaves, ks)]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    rng = jax.random.PRNGKey(1)
    exact = np.asarray(arch.sample(variables, batch, rng))
    cached = np.asarray(arch.sample(
        variables, batch, rng,
        step_cache=StepCacheConfig(flags=load_flags(str(out_json)))))
    rel = np.abs(cached - exact).mean() / (np.abs(exact).mean() + 1e-9)
    assert rel < 0.25, rel  # random-weight tiny model: loose mechanics bound
