"""Tests: multi-optimizer builder, dist utils, profiler, data prep, eval hook."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


class TestMultiOptimizer:
    def test_per_submodule_optimizers(self):
        from motioncraft_tpu.parallel.optimizers import build_optimizers
        params = {"generator": {"w": jnp.ones((3,))},
                  "discriminator": {"w": jnp.ones((3,))}}
        tx = build_optimizers(params, {"generator": {"type": "Adam", "lr": 1e-3},
                                       "discriminator": {"type": "SGD", "lr": 1e-1}})
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        # SGD lr 0.1 -> update -0.1; Adam first step -> ~ -lr
        np.testing.assert_allclose(np.asarray(updates["discriminator"]["w"]), -0.1,
                                   rtol=1e-5)
        assert abs(float(updates["generator"]["w"][0]) + 1e-3) < 2e-4

    def test_single_config_passthrough(self):
        from motioncraft_tpu.parallel.optimizers import build_optimizers
        tx = build_optimizers({"w": jnp.ones(2)}, {"type": "Adam", "lr": 1e-3})
        assert isinstance(tx, optax.GradientTransformation)


class TestDistUtils:
    def test_mean_across_hosts_single_process(self):
        from motioncraft_tpu.utils.dist_utils import mean_across_hosts
        tree = {"loss": 1.5}
        assert mean_across_hosts(tree)["loss"] == 1.5

    def test_collect_results_single_process(self):
        from motioncraft_tpu.utils.dist_utils import collect_results
        assert collect_results([1, 2, 3], total_size=2) == [1, 2]

    def test_allreduce_grads_shard_map(self):
        from motioncraft_tpu.utils.dist_utils import allreduce_grads
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("data",))
        x = jnp.arange(4, dtype=jnp.float32).reshape(4, 1)

        @jax.jit
        def f(x):
            return shard_map(lambda g: allreduce_grads({"g": g})["g"],
                             mesh=mesh, in_specs=P("data"), out_specs=P("data"))(x)

        out = np.asarray(f(x))
        np.testing.assert_allclose(out, 1.5)  # mean of 0..3


class TestProfiler:
    def test_phase_timer(self):
        from motioncraft_tpu.utils.profiler import PhaseTimer
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        assert t.counts["a"] == 2 and "a:" in t.summary()


class TestDataPrep:
    def test_norm_stats(self, tmp_path, rng):
        from motioncraft_tpu.data.prep import compute_norm_stats
        d = tmp_path / "motions"
        d.mkdir()
        xs = [rng.randn(10, 4).astype(np.float32) for _ in range(3)]
        for i, x in enumerate(xs):
            np.save(d / f"{i}.npy", x)
        compute_norm_stats(str(d), str(tmp_path / "stats"))
        mean = np.load(tmp_path / "stats" / "mean.npy")
        allx = np.concatenate(xs)
        np.testing.assert_allclose(mean, allx.mean(0), rtol=1e-4, atol=1e-5)

    def test_humanml3d_clip_align(self, tmp_path, rng):
        from motioncraft_tpu.data.prep import humanml3d_clip_align
        base = tmp_path / "motionx"
        (base / "motion_data/smplx_322/humanml").mkdir(parents=True)
        (base / "texts/semantic_labels/humanml").mkdir(parents=True)
        np.save(base / "motion_data/smplx_322/humanml/000001.npy",
                rng.randn(120, 322).astype(np.float32))
        with open(base / "texts/semantic_labels/humanml/000001.txt", "w") as f:
            f.write("a person walks#walk/VERB#0.0#0.0\n")
            f.write("a person jumps#jump/VERB#0.5#3.0\n")
        with open(base / "ann.txt", "w") as f:
            f.write("000001\n")
        n = humanml3d_clip_align(str(base), "aligned", str(base / "ann.txt"))
        assert n == 2  # full-span + one sub-clip
        files = list((base / "motion_data/smplx_322/aligned").glob("*.npy"))
        assert len(files) == 2

    def test_finedance_feats(self, tmp_path, rng):
        from motioncraft_tpu.data.prep import finedance_motion_feats
        d = tmp_path / "raw"
        d.mkdir()
        raw = np.concatenate([rng.randn(8, 3), rng.randn(8, 312)], 1).astype(np.float32)
        np.save(d / "001.npy", raw)
        n = finedance_motion_feats(str(d), str(tmp_path / "out"))
        assert n == 1
        feats = np.load(tmp_path / "out" / "001.npy")
        assert feats.shape == (8, 319)
        assert set(np.unique(feats[:, :4])).issubset({0.0, 1.0})


class TestMultiHost:
    def test_init_distributed_noop_single_process(self):
        from motioncraft_tpu.parallel import init_distributed
        assert init_distributed(num_processes=1) == 0

    def test_dcn_mesh_axes_and_batch_sharding(self):
        from motioncraft_tpu.parallel import batch_sharding, create_mesh
        from jax.sharding import PartitionSpec as P
        mesh = create_mesh(dcn_axis=True)  # single process -> dcn axis = 1
        assert mesh.axis_names == ("dcn", "data", "expert")
        assert mesh.shape["dcn"] == 1
        assert mesh.shape["data"] * mesh.shape["expert"] == 8
        sh = batch_sharding(mesh)
        assert sh.spec == P(("dcn", "data"))
