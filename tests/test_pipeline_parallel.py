"""Pipeline-parallel (GPipe over a `pipe` mesh axis) numeric equivalence.

The parity reference for the model test is a PER-MICROBATCH sequential
application: MoE capacity/dropping couples tokens within a routing group, so
the pipeline (which routes each microbatch independently — the reference's
own per-rank Tutel semantics) is compared against the plain model applied to
exactly the pipeline's microbatch groups.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioncraft_tpu.apis import build_flagship, make_text_batch, tiny_t2m_cfg
from motioncraft_tpu.parallel import create_mesh
from motioncraft_tpu.parallel.pp import gpipe

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device virtual CPU mesh")


class TestGpipePrimitive:
    L, B, D = 4, 8, 16

    def _setup(self):
        k = jax.random.PRNGKey(0)
        W = jax.random.normal(k, (self.L, self.D, self.D)) * 0.3
        b = jax.random.normal(jax.random.fold_in(k, 1), (self.L, self.D)) * 0.1
        x = jax.random.normal(jax.random.fold_in(k, 2), (self.B, 5, self.D))
        c = jax.random.normal(jax.random.fold_in(k, 3), (self.B, self.D))
        return W, b, x, c

    @staticmethod
    def layer_fn(p, xmb, cmb):
        w, b = p
        y = jnp.tanh(xmb @ w + b + cmb[:, None, :])
        return y, {"aux_loss": jnp.mean(y)}

    def test_forward_matches_sequential(self):
        W, b, x, c = self._setup()
        ref, aux_ref = x, 0.0
        for i in range(self.L):
            ref, a = self.layer_fn((W[i], b[i]), ref, c)
            aux_ref += a["aux_loss"]
        mesh = create_mesh(8, axes=("data", "pipe"))  # (4, 2)
        with jax.set_mesh(mesh):
            out, aux = jax.jit(lambda W, b, x, c: gpipe(
                self.layer_fn, (W, b), x, c, n_microbatch=2))(W, b, x, c)
        # per-sample math: pipeline == full-batch sequential exactly
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-6
        # mean-type aux: mean over microbatches == full-batch mean
        assert abs(float(aux["aux_loss"]) - float(aux_ref)) < 1e-6

    def test_four_stages(self):
        W, b, x, c = self._setup()
        ref = x
        for i in range(self.L):
            ref, _ = self.layer_fn((W[i], b[i]), ref, c)
        mesh = create_mesh(8, axes=("data", "pipe"), shape=(2, 4))
        with jax.set_mesh(mesh):
            out, _ = jax.jit(lambda W, b, x, c: gpipe(
                self.layer_fn, (W, b), x, c, n_microbatch=4))(W, b, x, c)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-6

    def test_gradients_flow_through_pipeline(self):
        W, b, x, c = self._setup()

        def seq_loss(W, b):
            xx = x
            for i in range(self.L):
                xx, _ = self.layer_fn((W[i], b[i]), xx, c)
            return jnp.sum(xx ** 2)

        g_seq = jax.grad(seq_loss, argnums=(0, 1))(W, b)
        mesh = create_mesh(8, axes=("data", "pipe"))
        with jax.set_mesh(mesh):
            g_pp = jax.jit(jax.grad(
                lambda W, b: jnp.sum(gpipe(self.layer_fn, (W, b), x, c,
                                           n_microbatch=2)[0] ** 2),
                argnums=(0, 1)))(W, b)
        for gp, gs in zip(g_pp, g_seq):
            denom = max(1.0, float(jnp.max(jnp.abs(gs))))
            assert float(jnp.max(jnp.abs(gp - gs))) / denom < 1e-5


class TestSTMoGenPipeline:
    DATA, PIPE, M, B, T = 4, 2, 2, 8, 16

    @pytest.fixture(scope="class")
    def setup(self):
        # gate_noise=0 so the parity reference needs no rng coordination
        pcfg = tiny_t2m_cfg()
        pcfg["model"]["ca_block_cfg"]["gate_noise"] = 0.0
        plain = build_flagship(pcfg)
        cfg = tiny_t2m_cfg()
        cfg["model"]["ca_block_cfg"]["gate_noise"] = 0.0
        cfg["model"]["pipeline_axis"] = "pipe"
        cfg["model"]["pipeline_microbatches"] = self.M
        piped = build_flagship(cfg)
        batch = make_text_batch([f"sample {i}" for i in range(self.B)],
                                max_seq_len=self.T)
        variables = plain.init(jax.random.PRNGKey(0), batch)
        xf = plain.encode_text(variables, batch["text_ids"])
        rng = jax.random.PRNGKey(7)
        motion = jax.random.normal(rng, (self.B, self.T, 322), jnp.float32)
        t = jax.random.randint(jax.random.fold_in(rng, 1), (self.B,), 0, 1000)
        cond = jax.random.bernoulli(
            jax.random.fold_in(rng, 2), 0.9, (self.B, 1, 1)).astype(jnp.float32) * 99
        return plain, piped, variables, batch, xf, motion, t, cond

    @staticmethod
    def _to_stacked(piped, variables):
        """Plain per-layer block params -> the piped model's stacked layout."""
        from motioncraft_tpu.parallel import stack_block_params
        return {**variables,
                "params": stack_block_params(dict(variables["params"]),
                                             piped.model.num_layers)}

    @staticmethod
    def _sum_aux(losses):
        """Sum only aux_loss-named leaves — what the architecture collects;
        the inner MoELayer l_aux leaves are logging duplicates of the same
        quantities and must not be double-counted."""
        return sum(float(jnp.asarray(leaf, jnp.float32))
                   for path, leaf in jax.tree_util.tree_leaves_with_path(losses)
                   if any(getattr(k, "key", None) == "aux_loss" for k in path))

    def _apply(self, arch, variables, motion, t, batch, xf, cond, rows):
        # jit + cache across the 8 per-group calls (same shapes): the eager
        # flax apply otherwise dominates the test's wall-clock
        jfwd = getattr(self, "_jfwd", None)
        if jfwd is None:
            jfwd = jax.jit(lambda p, m_, t_, mask, ml, xf_, c_: arch.model.apply(
                {"params": p}, m_, t_, motion_mask=mask, motion_length=ml,
                xf_out=xf_, cond_type=c_, mode="train", train=True,
                mutable=["losses"]))
            self._jfwd = jfwd
        out, state = jfwd(variables["params"], motion[rows], t[rows],
                          batch["motion_mask"][rows],
                          batch["motion_length"][rows], xf[rows], cond[rows])
        return out, self._sum_aux(state.get("losses", {}))

    def test_forward_train_matches_per_microbatch_sequential(self, setup):
        plain, piped, variables, batch, xf, motion, t, cond = setup
        variables_pp = self._to_stacked(piped, variables)
        mesh = create_mesh(8, axes=("data", "pipe"),
                           shape=(self.DATA, self.PIPE))
        with jax.set_mesh(mesh):
            out_pp, state_pp = jax.jit(
                lambda v, m, tt, mask, ml, xf_, c: piped.model.apply(
                    {"params": v}, m, tt, motion_mask=mask, motion_length=ml,
                    xf_out=xf_, cond_type=c, mode="train", train=True,
                    mutable=["losses"]))(
                variables_pp["params"], motion, t, batch["motion_mask"],
                batch["motion_length"], xf, cond)
            out_pp = np.asarray(out_pp)
            aux_pp = self._sum_aux(state_pp["losses"])

        # pipeline groups: batch -> (data shards, microbatches, mb rows)
        mb = self.B // (self.DATA * self.M)
        outs, auxs = [], []
        for g in range(self.B // mb):
            rows = np.arange(g * mb, (g + 1) * mb)
            o, a = self._apply(plain, variables, motion, t, batch, xf, cond, rows)
            outs.append(np.asarray(o))
            auxs.append(float(a))
        ref = np.concatenate(outs, axis=0)
        assert np.max(np.abs(out_pp - ref)) < 1e-5
        # gpipe aux = mean over microbatch groups of per-group layer sums
        assert abs(aux_pp - float(np.mean(auxs))) < 1e-5

    def test_forward_test_cfg_runs_pipelined(self, setup):
        plain, piped, variables, batch, xf, motion, t, cond = setup
        variables_pp = self._to_stacked(piped, variables)
        mesh = create_mesh(8, axes=("data", "pipe"),
                           shape=(self.DATA, self.PIPE))
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda v, m, tt, mask, ml, xf_: piped.model.apply(
                    {"params": v}, m, tt, motion_mask=mask, motion_length=ml,
                    xf_out=xf_, mode="test"))(
                variables_pp["params"], motion, t, batch["motion_mask"],
                batch["motion_length"], xf)
        out = np.asarray(out)
        assert out.shape == (self.B, self.T, 322)
        assert np.isfinite(out).all()

    def test_stacked_params_shard_over_pipe(self, setup):
        """The delivered promise of pp: block params (and so grads + adam
        moments, which mirror param paths) live num_layers/S per stage —
        per-device bytes for the stacked subtree shrink PIPE x."""
        from motioncraft_tpu.parallel import tree_shardings, unstack_block_params
        plain, piped, variables, batch, xf, motion, t, cond = setup
        variables_pp = self._to_stacked(piped, variables)
        mesh = create_mesh(8, axes=("data", "pipe"),
                           shape=(self.DATA, self.PIPE))
        params = variables_pp["params"]
        sharded = jax.device_put(params, tree_shardings(params, mesh))
        stacked = sharded["stacked_blocks"]
        for path, leaf in jax.tree_util.tree_leaves_with_path(stacked):
            spec = leaf.sharding.spec
            assert spec and spec[0] == "pipe", (path, spec)
            shard_bytes = max(s.data.nbytes for s in leaf.addressable_shards)
            assert shard_bytes * self.PIPE == leaf.nbytes, (path, shard_bytes)
        # round-trip: stacked -> per-layer restores the plain layout exactly
        restored = unstack_block_params(dict(jax.device_get(sharded)))
        for i in range(piped.model.num_layers):
            jax.tree_util.tree_map(
                np.testing.assert_array_equal,
                restored[f"block_{i}"], dict(variables["params"][f"block_{i}"]))

    def test_stacked_init_matches_layout(self, setup):
        """Initializing the piped model directly creates the stacked layout
        (same treedef + shapes as stacking a plain init), so training from
        scratch under pp needs no conversion step."""
        plain, piped, variables, batch, xf, motion, t, cond = setup
        v_init = piped.init(jax.random.PRNGKey(0), batch)
        stacked_ref = self._to_stacked(piped, variables)["params"]
        ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, stacked_ref)
        got_shapes = jax.tree_util.tree_map(lambda x: x.shape,
                                            dict(v_init["params"]))
        assert jax.tree_util.tree_structure(ref_shapes) == \
            jax.tree_util.tree_structure(got_shapes)
        assert ref_shapes == got_shapes
