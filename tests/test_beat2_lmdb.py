"""BEAT2 LMDB cache reader: key layout, 9-tuple schema, vocab captions.

Uses a dict-backed env stub (the lmdb C library is optional at runtime;
the reader only touches begin()/get()/stat())."""

import pickle

import numpy as np
import pytest

from motioncraft_tpu.data.beat2 import (Beat2LmdbDataset,
                                        deserialize_lmdb_sample,
                                        find_lmdb_cache, load_vocab)


class StubTxn:
    def __init__(self, store):
        self.store = store

    def get(self, key):
        return self.store.get(key)

    def stat(self):
        return {"entries": len(self.store)}

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class StubEnv:
    def __init__(self, store):
        self.store = store

    def begin(self, write=False):
        return StubTxn(self.store)


def make_sample(T=16, rng=None):
    rng = rng or np.random.RandomState(0)
    return (rng.randn(T, 165).astype(np.float32),           # pose
            rng.randn(T * 533, 2).astype(np.float32),       # audio
            rng.randn(T, 100).astype(np.float32),           # facial
            np.zeros((T, 300), np.float32),                 # shape/beta
            np.array([0, 3, 3, 4] * (T // 4)),              # word ids
            np.array([1]), np.array([0.5]),                 # emo, sem
            np.array([2.0]),                                # vid
            rng.randn(T, 3).astype(np.float32))             # trans


def make_env(n=3):
    store = {}
    for i in range(n):
        store["{:005}".format(i).encode("ascii")] = pickle.dumps(make_sample())
    return StubEnv(store)


def test_lmdb_dataset_reads_reference_schema():
    ds = Beat2LmdbDataset(env=make_env(3))
    assert len(ds) == 3
    s = ds[0]
    assert s["pose"].shape == (16, 165)
    assert s["facial"].shape == (16, 100)
    assert s["beta"].shape == (16, 300)
    assert s["trans"].shape == (16, 3)
    with pytest.raises(IndexError):
        ds[99]


def test_lmdb_window_conversion_with_vocab():
    vocab = {0: "<pad>", 3: "hello", 4: "world"}
    ds = Beat2LmdbDataset(env=make_env(1), vocab=vocab)
    w = ds.window(0)
    assert w["pose"].shape == (16, 165)
    assert w["audio"].shape == (16 * 533, 2)
    assert w["words"] == ["hello", "world"] * 4 or "hello" in w["words"]
    # <pad> filtered, consecutive repeats collapsed
    assert "<pad>" not in w["words"]


def test_deserialize_pickle_fallback():
    sample = make_sample()
    out = deserialize_lmdb_sample(pickle.dumps(sample))
    np.testing.assert_array_equal(out[0], sample[0])


def test_find_lmdb_cache(tmp_path):
    from types import SimpleNamespace
    args = SimpleNamespace(cache_path=str(tmp_path), pose_rep="smplxflame_30")
    assert find_lmdb_cache(args, "test") is None
    d = tmp_path / "test" / "smplxflame_30_cache"
    d.mkdir(parents=True)
    (d / "data.mdb").write_bytes(b"x")
    assert find_lmdb_cache(args, "test") == str(d)
    args2 = SimpleNamespace(cache_path=None, pose_rep="smplxflame_30")
    assert find_lmdb_cache(args2, "test") is None


def test_load_vocab_tolerant_unpickle(tmp_path):
    # pickle a Vocab from a synthetic module, then remove the module so the
    # reader must tolerate the missing class (as with EMAGE's build_vocab)
    import sys
    import types
    pkg = types.ModuleType("dataloaders")
    mod = types.ModuleType("dataloaders.build_vocab")

    class Vocab:
        pass

    Vocab.__module__ = "dataloaders.build_vocab"
    Vocab.__qualname__ = "Vocab"
    mod.Vocab = Vocab
    sys.modules["dataloaders"] = pkg
    sys.modules["dataloaders.build_vocab"] = mod
    try:
        v = Vocab()
        v.index2word = {0: "<pad>", 1: "hi"}
        data = pickle.dumps(v)
    finally:
        del sys.modules["dataloaders.build_vocab"]
        del sys.modules["dataloaders"]
    with pytest.raises(Exception):
        pickle.loads(data)  # plain loader cannot resolve the class
    p = tmp_path / "vocab.pkl"
    p.write_bytes(data)
    out = load_vocab(str(p))
    assert out == {0: "<pad>", 1: "hi"}
    assert load_vocab(str(tmp_path / "missing.pkl")) is None
