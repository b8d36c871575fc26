"""Dynamic-batching serving layer (motioncraft_tpu/serving/server.py).

The reference has no serving story; this layer wraps the jitted CFG-DDIM
sampler with a latency-bounded dynamic batcher over static batch buckets
(one XLA executable per bucket).  Tests prove: grouped dispatch, bucket
padding accounting, per-request length slicing, denormalization,
determinism per (group, dispatch index), and error fan-out."""

import threading

import numpy as np
import pytest

from motioncraft_tpu.apis import build_flagship, tiny_t2m_cfg
from motioncraft_tpu.serving import MotionGenServer

T, D = 16, 322


@pytest.fixture(scope="module")
def arch_and_vars():
    import jax
    import jax.numpy as jnp
    from motioncraft_tpu.apis import make_text_batch
    arch = build_flagship(tiny_t2m_cfg(max_seq_len=T))
    variables = arch.init(jax.random.PRNGKey(0),
                          make_text_batch(["x"], max_seq_len=T))
    # perturb away from the zero-init output heads: an untouched tiny model
    # denoises everything to exactly 0 (start_x prediction), which would make
    # the determinism/seed assertions vacuous
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    ks = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [l + 0.03 * jax.random.normal(k, l.shape, l.dtype)
              if jnp.issubdtype(l.dtype, jnp.floating) else l
              for l, k in zip(leaves, ks)]
    return arch, jax.tree_util.tree_unflatten(treedef, leaves)


def _server(arch, variables, **kw):
    kw.setdefault("max_seq_len", T)
    kw.setdefault("batch_buckets", (1, 2, 4))
    kw.setdefault("max_wait_ms", 300.0)
    return MotionGenServer(arch, variables, **kw)


def test_generate_slices_lengths_and_batches(arch_and_vars):
    arch, variables = arch_and_vars
    with _server(arch, variables) as srv:
        outs = srv.generate(["a person walks", "a person waves", "jumps"],
                            [T, 8, 12])
        assert [o.shape for o in outs] == [(T, D), (8, D), (12, D)]
        assert all(np.isfinite(o).all() for o in outs)
        st = srv.stats()
    # all three rode one dispatch, padded 3 -> bucket 4
    assert st["requests"] == 3 and st["dispatches"] == 1
    assert st["mean_occupancy"] == 3.0
    assert 0 < st["padding_fraction"] <= 0.25
    assert st["latency_p95_s"] > 0


def test_concurrent_submits_group(arch_and_vars):
    arch, variables = arch_and_vars
    with _server(arch, variables) as srv:
        srv.warmup(buckets=(4,))
        futures = []
        barrier = threading.Barrier(4)

        def client(i):
            barrier.wait()
            futures.append(srv.submit(f"text {i}", 8 + i))

        threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        res = [f.result(timeout=120) for f in futures]
        assert sorted(r.shape[0] for r in res) == [8, 9, 10, 11]
        st = srv.stats()
    # max_wait window is generous: one full-bucket dispatch, zero padding
    assert st["dispatches"] == 1 and st["mean_occupancy"] == 4.0
    assert st["padding_fraction"] == 0.0


def test_determinism_per_dispatch(arch_and_vars):
    arch, variables = arch_and_vars
    texts, lengths = ["walk", "wave"], [T, T]
    with _server(arch, variables, seed=123) as a:
        out_a = a.generate(texts, lengths)
    with _server(arch, variables, seed=123) as b:
        out_b = b.generate(texts, lengths)
    for x, y in zip(out_a, out_b):
        np.testing.assert_array_equal(x, y)
    with _server(arch, variables, seed=124) as c:
        out_c = c.generate(texts, lengths)
    assert np.abs(out_a[0] - out_c[0]).max() > 0


def test_denormalize_applied(arch_and_vars):
    arch, variables = arch_and_vars
    mean = np.full((D,), 5.0, np.float32)
    std = np.zeros((D,), np.float32)  # out = raw * 1e-9 + 5 ~= 5
    with _server(arch, variables, mean=mean, std=std) as srv:
        out = srv.generate(["walk"])[0]
    np.testing.assert_allclose(out, 5.0, atol=1e-5)


def test_length_validation_and_error_fanout(arch_and_vars):
    arch, variables = arch_and_vars
    with pytest.raises(ValueError, match="together"):
        _server(arch, variables, std=np.ones((D,), np.float32))  # no mean
    srv = _server(arch, variables)
    with pytest.raises(ValueError, match="lengths"):
        srv.generate(["a", "b", "c"], [8, 16])  # count mismatch
    with pytest.raises(ValueError, match="length"):
        srv.submit("too long", T + 1)
    # a poisoned dispatch rejects every future in the group
    srv._variables = {"params": None}  # breaks the jitted call
    f = srv.submit("boom", T)
    with pytest.raises(Exception):
        f.result(timeout=120)
    srv.stop()


def test_seq_buckets_partition_group(arch_and_vars):
    """Requests at different length buckets run separate (shorter-T)
    executables; slicing still honors the exact requested length."""
    arch, variables = arch_and_vars
    with _server(arch, variables, seq_buckets=(8, T)) as srv:
        outs = srv.generate(["short walk", "long walk"], [5, 12])
        assert [o.shape for o in outs] == [(5, D), (12, D)]
        st = srv.stats()
    assert st["requests"] == 2 and st["dispatches"] == 2  # one per T bucket

    with pytest.raises(ValueError, match="seq_buckets"):
        _server(arch, variables, seq_buckets=(8,))  # must end at max_seq_len


def test_mesh_serving_matches_single_device(arch_and_vars):
    """Multi-chip dispatch (batch rows over the data axis) returns the same
    motions as the unsharded server at f32 tolerance."""
    from motioncraft_tpu.parallel import create_mesh
    arch, variables = arch_and_vars
    mesh = create_mesh()
    ndata = mesh.shape["data"]
    buckets = (ndata, 2 * ndata)
    texts, lengths = ["walk", "wave", "jump"], [T, 8, 12]
    with _server(arch, variables, batch_buckets=buckets, mesh=mesh) as srv:
        outs = srv.generate(texts, lengths)
        st = srv.stats()
    assert st["dispatches"] == 1
    with _server(arch, variables, batch_buckets=buckets) as ref:
        ref_outs = ref.generate(texts, lengths)
    for a, b in zip(outs, ref_outs):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="divisible"):
        _server(arch, variables, batch_buckets=(1, ndata), mesh=mesh)


def test_http_endpoints(arch_and_vars):
    """tools/serve.py HTTP layer: concurrent POSTs from separate connections
    batch through one dispatch; /stats and /healthz respond."""
    import json
    import sys
    import urllib.request
    from http.server import ThreadingHTTPServer
    sys.path.insert(0, "tools")
    from serve import make_handler

    arch, variables = arch_and_vars
    with _server(arch, variables) as srv:
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            def post(payload):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/generate",
                    data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"})
                return json.loads(urllib.request.urlopen(req, timeout=120).read())

            results = {}
            c1 = threading.Thread(target=lambda: results.update(
                a=post({"text": "a person waves", "length": 12})))
            c1.start()
            results["b"] = post({"texts": ["walks", "jumps"], "lengths": [8, T]})
            c1.join()
            assert results["a"]["lengths"] == [12]
            assert len(results["a"]["motions"][0][0]) == D
            assert results["b"]["lengths"] == [8, T]

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
                assert json.loads(r.read())["ok"]
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=30) as r:
                st = json.loads(r.read())
            assert st["requests"] == 3
            # bad request -> 400 with an error body, server stays up
            try:
                post({"length": 5})
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            httpd.shutdown()


def test_restart_after_stop(arch_and_vars):
    arch, variables = arch_and_vars
    srv = _server(arch, variables)
    out1 = srv.generate(["walk"])
    srv.stop()
    out2 = srv.generate(["walk"])  # submit() restarts the dispatcher
    assert out1[0].shape == out2[0].shape
    srv.stop()


# ------------------------------------------------- conditioned + long-form

@pytest.fixture(scope="module")
def s2g_arch_and_vars():
    """Tiny ControlNet S2G arch (raw-audio WavEncoder condition) — the
    conditioned serving path (reference task: tools/s2g_test.py)."""
    import jax
    from motioncraft_tpu.apis import make_text_batch
    from motioncraft_tpu.registry import build_architecture
    import motioncraft_tpu.models  # noqa: F401
    heads, lat = 12, 8
    base = dict(type="STMoGenTransformer", input_feats=D, max_seq_len=T,
                latent_dim=lat * heads, time_embed_dim=32, num_layers=2,
                ca_block_cfg=dict(type="STMA", latent_dim=lat,
                                  text_latent_dim=16, num_heads=heads,
                                  num_text_heads=1, num_experts=4, topk=2,
                                  gate_type="cosine_top", gate_noise=0.0,
                                  ffn_dim=16, time_embed_dim=32,
                                  max_seq_len=T, max_text_seq_len=77,
                                  temporal_comb=False, dropout=0),
                ffn_cfg=dict(latent_dim=lat, ffn_dim=16, dropout=0,
                             time_embed_dim=32, num_heads=heads),
                text_encoder=dict(pretrained_model="clip", latent_dim=16,
                                  num_layers=1, ff_size=16, dropout=0,
                                  use_text_proj=False, clip_width=32,
                                  clip_layers=1),
                pose_encoder_cfg=dict(dataset_name="motionx", latent_dim=lat,
                                      input_dim=D),
                pose_decoder_cfg=dict(dataset_name="motionx", latent_dim=lat,
                                      output_dim=D),
                scale_func_cfg=dict(scale=6.5))
    cfg = dict(type="MotionDiffusion",
               model=dict(type="ControlT2MHalf", base_model=base,
                          copy_blocks_num=1, control_cond_feats=2,
                          condition_encode_cfg=dict(
                              dataset_name="beats2",
                              condition_pre_encode=True,
                              condition_pre_encode_type="wav",
                              condition_latent_dim=16,
                              control_cond_feats=2, condition_cfg=True)),
               loss_recon=dict(type="MSELoss", loss_weight=1,
                               reduction="none"),
               diffusion_train=dict(beta_scheduler="linear",
                                    diffusion_steps=1000,
                                    model_mean_type="start_x",
                                    model_var_type="fixed_large"),
               diffusion_test=dict(beta_scheduler="linear",
                                   diffusion_steps=1000,
                                   model_mean_type="start_x",
                                   model_var_type="fixed_large", respace="4"),
               inference_type="ddim", loss_reduction="batch",
               repaint=dict(overlap_len=4, add_blend=True, jump_length=3,
                            jump_n_sample=2))
    arch = build_architecture(cfg)
    rate = 16000 // 30
    batch = make_text_batch(["someone speaks"], max_seq_len=T)
    batch["c"] = np.random.RandomState(0).randn(1, T * rate, 2).astype(np.float32)
    variables = arch.init(jax.random.PRNGKey(0), batch)
    return arch, variables, rate


def test_conditioned_requests_batch_and_slice(s2g_arch_and_vars):
    """S2G-style requests carry raw audio; same-rate requests share one
    dispatch, output honors per-request length."""
    arch, variables, rate = s2g_arch_and_vars
    rng = np.random.RandomState(1)
    with _server(arch, variables) as srv:
        f1 = srv.submit("a person speaks", T,
                        condition=rng.randn(T * rate, 2).astype(np.float32))
        f2 = srv.submit("another person speaks", 10,
                        condition=rng.randn(10 * rate, 2).astype(np.float32))
        o1, o2 = f1.result(timeout=600), f2.result(timeout=600)
        st = srv.stats()
    assert o1.shape == (T, D) and o2.shape == (10, D)
    assert np.isfinite(o1).all() and np.isfinite(o2).all()
    assert st["dispatches"] == 1  # same rate + trailing shape -> one group


def test_condition_validation(s2g_arch_and_vars):
    arch, variables, rate = s2g_arch_and_vars
    srv = _server(arch, variables)
    with pytest.raises(ValueError, match="whole"):
        srv.submit("x", 10, condition=np.zeros((10 * rate + 1, 2), np.float32))
    srv.stop()


def test_long_form_lockstep(arch_and_vars):
    """Two concurrent long-form requests run as ONE lockstep windowed
    dispatch; outputs are exact total_frames long."""
    arch, variables = arch_and_vars
    total_a, total_b = 40, 28
    with _server(arch, variables, window=T, pre_frames=4) as srv:
        fa = srv.submit_long("a long walk", total_a)
        fb = srv.submit_long("a long wave", total_b)
        oa, ob = fa.result(timeout=900), fb.result(timeout=900)
        st = srv.stats()
    assert oa.shape == (total_a, D) and ob.shape == (total_b, D)
    assert np.isfinite(oa).all() and np.isfinite(ob).all()
    assert st["long_dispatches"] == 1 and st["requests"] == 2


def test_long_form_conditioned_wav(s2g_arch_and_vars):
    """The VERDICT target: one request turns a wav of arbitrary length into
    a gesture clip via windowed RePaint generation."""
    arch, variables, rate = s2g_arch_and_vars
    total = 40  # > window=16 -> multiple outpainted windows
    wav = np.random.RandomState(2).randn(total * rate, 2).astype(np.float32)
    with _server(arch, variables, window=T, pre_frames=4) as srv:
        out = srv.submit_long("someone speaks at length", total,
                              condition=wav).result(timeout=900)
    assert out.shape == (total, D)
    assert np.isfinite(out).all()


def test_http_generate_long(arch_and_vars):
    """HTTP round-trip for long-form generation (/generate_long)."""
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "tools"))
    from serve import make_handler

    arch, variables = arch_and_vars
    with _server(arch, variables, window=T, pre_frames=4) as srv:
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate_long",
                data=json.dumps({"text": "a very long walk",
                                 "total_frames": 28}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                body = json.loads(r.read())
            assert body["lengths"] == [28]
            assert len(body["motions"][0]) == 28
            assert len(body["motions"][0][0]) == D
        finally:
            httpd.shutdown()
