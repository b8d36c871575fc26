"""Multi-host evaluation correctness: per-rank interleaved dataset slices
(reference samplers/distributed_sampler.py:5-42), ordered result reassembly
(reference apis/test.py:120-163), and the async prefetch loader — including a
real two-process ``jax.distributed`` run on CPU."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from motioncraft_tpu.data.loader import DataLoader, RoundUpSampler, build_dataloader
from motioncraft_tpu.utils.dist_utils import interleave_parts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class RangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"motion": np.full((4, 3), i, np.float32),
                "motion_length": i,
                "motion_metas": {"idx": i}}


class TestRankSharding:
    def test_every_index_exactly_once(self):
        # 10 samples over 4 ranks, round_up -> 12 slots; the 2 pad slots
        # repeat the head of the stream, every real index appears >= once
        parts = [RoundUpSampler(10, shuffle=False, round_up=True,
                                num_replicas=4, rank=r).indices()
                 for r in range(4)]
        assert all(len(p) == 3 for p in parts)
        merged = interleave_parts([list(p) for p in parts], total_size=10)
        assert merged == list(range(10))

    def test_shuffled_partition_is_disjoint_and_complete(self):
        parts = [RoundUpSampler(16, shuffle=True, round_up=True,
                                num_replicas=4, rank=r, seed=3).indices()
                 for r in range(4)]
        flat = np.concatenate(parts)
        assert sorted(flat.tolist()) == list(range(16))

    def test_rank_slices_interleave(self):
        # rank r must hold indices [r::world] of the common stream
        world = 3
        full = RoundUpSampler(9, shuffle=True, round_up=True,
                              num_replicas=1, seed=7)
        stream = RoundUpSampler(9, shuffle=True, round_up=True,
                                num_replicas=world, rank=0, seed=7)
        assert stream.indices().tolist() == full.indices().tolist()[0::world]

    def test_round_up_cycles_short_datasets(self):
        # dataset smaller than world: round_up cycles the permutation
        # (reference: indices * k), not just the head
        p = [RoundUpSampler(2, shuffle=False, round_up=True,
                            num_replicas=5, rank=r).indices()
             for r in range(5)]
        assert sorted(np.concatenate(p).tolist()) == [0, 0, 0, 1, 1]
        merged = interleave_parts([list(x) for x in p], total_size=2)
        assert merged == [0, 1]

    def test_interleave_parts_unequal(self):
        assert interleave_parts([[0, 3], [1], [2]]) == [0, 1, 2, 3]

    def test_loader_len_per_rank(self):
        ds = RangeDataset(10)
        ld = build_dataloader(ds, samples_per_gpu=3, dist=True,
                              num_replicas=4, rank=1, shuffle=False)
        ld.drop_last = False
        assert len(ld) == 1  # ceil(ceil(10/4)=3 / 3)
        batches = list(ld)
        assert len(batches) == 1
        assert batches[0]["motion"].shape[0] == 3


class TestAsyncLoader:
    def test_prefetch_matches_sync(self):
        ds = RangeDataset(23)
        sync = DataLoader(ds, 4, shuffle=True, drop_last=False, seed=5)
        async_ = DataLoader(ds, 4, shuffle=True, drop_last=False, seed=5,
                            num_workers=3, prefetch=2)
        for a, b in zip(list(sync), list(async_)):
            np.testing.assert_array_equal(a["motion"], b["motion"])
            assert a["motion_length"].tolist() == b["motion_length"].tolist()

    def test_prefetch_short_epoch(self):
        # fewer batches than the prefetch depth
        ds = RangeDataset(3)
        ld = DataLoader(ds, 2, shuffle=False, drop_last=False,
                        num_workers=2, prefetch=8)
        batches = list(ld)
        assert [b["motion"].shape[0] for b in batches] == [2, 1]


_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:%PORT%",
                           num_processes=2, process_id=int(sys.argv[1]))
import numpy as np
from motioncraft_tpu.data.loader import build_dataloader
from motioncraft_tpu.utils.dist_utils import collect_results

class DS:
    def __len__(self):
        return 11
    def __getitem__(self, i):
        return {"motion": np.full((2, 3), i, np.float32),
                "motion_length": i, "motion_metas": {"idx": i}}

ds = DS()
loader = build_dataloader(ds, samples_per_gpu=2, dist=True, shuffle=False,
                          round_up=True)
loader.drop_last = False
local = []
for batch in loader:
    for m in batch["motion_metas"]:
        local.append({"idx": m["idx"]})
merged = collect_results(local, total_size=len(ds))
if jax.process_index() == 0:
    got = [r["idx"] for r in merged]
    assert got == list(range(11)), got
    print("DIST_EVAL_OK", got, flush=True)
"""


_TRAIN_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:%PORT%",
                           num_processes=2, process_id=int(sys.argv[1]))
import numpy as np
import jax.numpy as jnp
from motioncraft_tpu.apis.factory import build_flagship, make_text_batch, tiny_t2m_cfg
from motioncraft_tpu.apis.train import make_train_step
from motioncraft_tpu.parallel import (batch_sharding, create_mesh,
                                      create_train_state, replicated, shard_batch)

jax.config.update("jax_default_matmul_precision", "highest")
arch = build_flagship(tiny_t2m_cfg())
GLOBAL_B = 4
rank = jax.process_index()
full = make_text_batch([f"sample {i}" for i in range(GLOBAL_B)], max_seq_len=16)
# interleaved per-rank slice, as build_dataloader(dist=True) would hand out
local = {k: (v[rank::2] if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0
             else v)
         for k, v in full.items() if hasattr(v, "dtype")}
mesh = create_mesh(dcn_axis=True)  # (dcn=2, data=1, expert=1)
with jax.set_mesh(mesh):
    variables = arch.init(jax.random.PRNGKey(0), full)
    state = create_train_state(variables["params"], {"type": "Adam", "lr": 2e-4})
    step = jax.jit(make_train_step(arch),
                   in_shardings=(replicated(mesh), batch_sharding(mesh),
                                 replicated(mesh)),
                   out_shardings=(replicated(mesh), replicated(mesh)))
    sharded = shard_batch(local, mesh)
    # global batch order under (dcn, data) sharding = [rank0 slice, rank1
    # slice] = interleave-inverse; the loss is order-invariant (mean)
    state, logs = step(state, sharded, jax.random.PRNGKey(1))
    loss = float(logs["loss"])
print(f"RANK{rank}_LOSS {loss:.10f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_train_step_parity(tmp_path):
    """Real 2-process jax.distributed CPU training step over the hybrid
    (dcn, data, expert) mesh: each process feeds its interleaved batch slice
    via make_array_from_process_local_data; the globally-reduced loss must be
    identical on both ranks AND match a single-process run of the same
    global batch at f32 tolerance."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "train_worker.py"
    script.write_text(_TRAIN_WORKER.replace("%PORT%", str(port)))
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(r)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for r in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    losses = {}
    for out in outs:
        for ln in out.splitlines():
            if ln.startswith("RANK"):
                rank, val = ln.split()
                losses[rank] = float(val)
    assert set(losses) == {"RANK0_LOSS", "RANK1_LOSS"}, outs
    assert losses["RANK0_LOSS"] == losses["RANK1_LOSS"]

    # single-process reference on the same global batch
    import jax

    from motioncraft_tpu.apis.factory import build_flagship, make_text_batch, \
        tiny_t2m_cfg
    from motioncraft_tpu.apis.train import make_train_step
    from motioncraft_tpu.parallel import (batch_sharding, create_mesh,
                                          create_train_state, replicated,
                                          shard_batch)
    arch = build_flagship(tiny_t2m_cfg())
    full = make_text_batch([f"sample {i}" for i in range(4)], max_seq_len=16)
    # global order under the 2-process dcn sharding: rank0's interleaved
    # slice then rank1's
    reordered = {k: (np.concatenate([v[0::2], v[1::2]])
                     if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0 else v)
                 for k, v in full.items() if hasattr(v, "dtype")}
    mesh = create_mesh(1)
    with jax.set_mesh(mesh):
        variables = arch.init(jax.random.PRNGKey(0), full)
        state = create_train_state(variables["params"],
                                   {"type": "Adam", "lr": 2e-4})
        step = jax.jit(make_train_step(arch),
                       in_shardings=(replicated(mesh), batch_sharding(mesh),
                                     replicated(mesh)),
                       out_shardings=(replicated(mesh), replicated(mesh)))
        _, logs = step(state, shard_batch(reordered, mesh),
                       jax.random.PRNGKey(1))
        ref_loss = float(logs["loss"])
    assert abs(losses["RANK0_LOSS"] - ref_loss) < 1e-5 * max(1.0, abs(ref_loss)), (
        losses, ref_loss)


@pytest.mark.slow
def test_two_process_collect_results(tmp_path):
    """Real 2-process jax.distributed CPU run: each sample evaluated exactly
    once, merged list in dataset order."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("%PORT%", str(port)))
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(r)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for r in range(2)]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert "DIST_EVAL_OK" in outs[0], outs


class _StubArch:
    """Minimal arch for single_device_test: doubles the motion (+1) so the
    pipelined loop's ordering/padding/limit behavior is checkable."""

    inference_type = "ddim"

    def sample(self, variables, batch, rng, compute_dtype=None):
        return batch["motion"] * 2.0 + 1.0

    @staticmethod
    def split_results(results):
        from motioncraft_tpu.models.architecture import MotionDiffusion
        return MotionDiffusion.split_results(results)


class EvalDataset(RangeDataset):
    def __getitem__(self, i):
        return {"motion": np.full((4, 3), i, np.float32),
                "motion_mask": np.ones((4,), np.float32),
                "motion_length": np.array([4], np.int32),
                "motion_metas": {"idx": i}}


class TestSingleDeviceTest:
    def _loader(self, n, bs):
        loader = DataLoader(EvalDataset(n), batch_size=bs, shuffle=False,
                            drop_last=False, tokenize_text=False)
        return loader

    def test_order_padding_and_inflight(self):
        """10 samples at batch 4 (tail batch of 2 is padded then truncated):
        every sample evaluated once, in order, pred == 2*motion+1, with the
        deferred device_get draining behind 2 in-flight dispatches."""
        from motioncraft_tpu.apis.test import single_device_test
        results = single_device_test(_StubArch(), {}, self._loader(10, 4))
        assert len(results) == 10
        for i, r in enumerate(results):
            np.testing.assert_allclose(r["motion"], np.full((4, 3), i))
            np.testing.assert_allclose(r["pred_motion"],
                                       np.full((4, 3), 2 * i + 1))

    def test_limit(self):
        from motioncraft_tpu.apis.test import single_device_test
        results = single_device_test(_StubArch(), {}, self._loader(10, 4),
                                     limit=5)
        assert [int(r["motion"][0, 0]) for r in results] == [0, 1, 2, 3, 4]

    def test_jit_cache_keys_on_mutable_config(self):
        """Mutating arch.repaint_cfg / inference_type between evaluations
        must produce a fresh trace, not silently reuse a stale executable."""
        from motioncraft_tpu.apis.test import _eval_sample_jit
        from motioncraft_tpu.diffusion.sampling import RepaintConfig
        arch = _StubArch()
        arch.repaint_cfg = RepaintConfig(overlap_len=4)
        f1 = _eval_sample_jit(arch, None)
        assert _eval_sample_jit(arch, None) is f1  # same config -> cached
        arch.repaint_cfg = RepaintConfig(overlap_len=8)
        f2 = _eval_sample_jit(arch, None)
        assert f2 is not f1
        arch.inference_type = "ddpm"
        assert _eval_sample_jit(arch, None) is not f2


class _NoiseStubArch:
    """Arch whose sample ignores motion VALUES (uses only shape + rng), like
    MotionDiffusion under any non-gt inference_type."""

    inference_type = "ddim"
    sample_ignores_motion_values = True

    def sample(self, variables, batch, rng, compute_dtype=None):
        import jax
        B, T, D = batch["motion"].shape
        return (jax.random.normal(rng, (B, T, D))
                + batch["motion_length"][:, None, None].astype(np.float32))

    @staticmethod
    def split_results(results):
        from motioncraft_tpu.models.architecture import MotionDiffusion
        return MotionDiffusion.split_results(results)


class TestMotionUploadSkip:
    """sample_ignores_motion_values: the eval loop drops the motion array
    from the dispatched pytree (a zeros constant is materialized inside the
    trace) — predictions must be BIT-IDENTICAL to the uploading path, and
    the host-side GT motion must still reach the results for the metrics."""

    def _loader(self, n, bs):
        loader = DataLoader(EvalDataset(n), batch_size=bs, shuffle=False,
                            drop_last=False, tokenize_text=False)
        return loader

    def test_skip_matches_upload_bitexact(self):
        from motioncraft_tpu.apis.test import single_device_test
        arch = _NoiseStubArch()
        with_skip = single_device_test(arch, {}, self._loader(10, 4), seed=3)
        arch2 = _NoiseStubArch()
        arch2.sample_ignores_motion_values = False
        without = single_device_test(arch2, {}, self._loader(10, 4), seed=3)
        assert len(with_skip) == len(without) == 10
        for i, (a, b) in enumerate(zip(with_skip, without)):
            np.testing.assert_array_equal(a["pred_motion"], b["pred_motion"])
            # GT motion still present for the evaluators (not the traced
            # zeros constant: EvalDataset fills motion with the sample idx)
            np.testing.assert_array_equal(a["motion"], np.full((4, 3), i))

    def test_gt_mode_unaffected(self):
        from motioncraft_tpu.apis.test import single_device_test
        arch = _NoiseStubArch()
        arch.inference_type = "gt"
        results = single_device_test(arch, {}, self._loader(6, 4))
        for i, r in enumerate(results):
            np.testing.assert_array_equal(r["pred_motion"], r["motion"])


class TestMegaDispatch:
    """dispatch_batches=K groups K loader batches into one lax.map dispatch;
    predictions must be BIT-IDENTICAL to K=1 (same per-batch fold_in rng),
    including the padded final short group and the limit interaction."""

    def _loader(self, n, bs):
        return DataLoader(EvalDataset(n), batch_size=bs, shuffle=False,
                          drop_last=False, tokenize_text=False)

    @pytest.mark.parametrize("n,bs,k", [(10, 4, 3), (12, 4, 3), (8, 4, 8)])
    def test_bitexact_vs_single_dispatch(self, n, bs, k):
        from motioncraft_tpu.apis.test import single_device_test
        base = single_device_test(_NoiseStubArch(), {}, self._loader(n, bs),
                                  seed=7)
        mega = single_device_test(_NoiseStubArch(), {}, self._loader(n, bs),
                                  seed=7, dispatch_batches=k)
        assert len(base) == len(mega) == n
        for a, b in zip(base, mega):
            np.testing.assert_array_equal(a["pred_motion"], b["pred_motion"])

    def test_motion_carrying_arch(self):
        """An arch that DOES consume motion values (no skip attribute):
        the stacked group must carry the real motion arrays."""
        from motioncraft_tpu.apis.test import single_device_test
        mega = single_device_test(_StubArch(), {}, self._loader(10, 4),
                                  dispatch_batches=4)
        assert len(mega) == 10
        for i, r in enumerate(mega):
            np.testing.assert_allclose(r["pred_motion"],
                                       np.full((4, 3), 2 * i + 1))

    def test_limit_with_mega(self):
        from motioncraft_tpu.apis.test import single_device_test
        results = single_device_test(_NoiseStubArch(), {},
                                     self._loader(10, 4), seed=7,
                                     dispatch_batches=3, limit=5)
        base = single_device_test(_NoiseStubArch(), {}, self._loader(10, 4),
                                  seed=7, limit=5)
        assert len(results) == 5
        for a, b in zip(base, results):
            np.testing.assert_array_equal(a["pred_motion"], b["pred_motion"])
