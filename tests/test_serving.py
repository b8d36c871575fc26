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
