"""Serving backend tests: bruteforce exactness, native HNSW recall, ABC contract.

Annoy/FAISS/Milvus tests are gated on availability (mirroring the reference's
optional-dependency gating, ``/root/reference/tests/test_serving.py``).
"""

import importlib.util
import os

import numpy as np
import pytest

from torch_rechub_tpu.serving import builder_factory

HAS_ANNOY = importlib.util.find_spec("annoy") is not None
HAS_FAISS = importlib.util.find_spec("faiss") is not None


def corpus(n=500, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)).astype(np.float32)


def test_bruteforce_exact_and_save_load(tmp_path):
    emb = corpus()
    builder = builder_factory("bruteforce", metric="ip")
    q = emb[:5] + 0.01
    with builder.from_embeddings(emb) as indexer:
        ids, scores = indexer.query(q, top_k=3)
        assert ids.shape == (5, 3)
        expected = np.argsort(-(q @ emb.T), axis=1)[:, :3]
        np.testing.assert_array_equal(ids, expected)
        indexer.save(tmp_path / "bf.npy")
    with builder.from_index_file(tmp_path / "bf.npy") as indexer:
        ids2, _ = indexer.query(q, top_k=3)
        np.testing.assert_array_equal(ids, ids2)


def test_bruteforce_l2():
    emb = corpus()
    builder = builder_factory("bruteforce", metric="l2")
    with builder.from_embeddings(emb) as indexer:
        ids, d2 = indexer.query(emb[:3], top_k=1)
        np.testing.assert_array_equal(ids[:, 0], [0, 1, 2])  # self is nearest
        np.testing.assert_allclose(d2[:, 0], 0.0, atol=1e-4)


def test_native_hnsw_recall_and_save_load(tmp_path):
    emb = corpus(n=1000)
    builder = builder_factory("hnsw", metric="ip", M=16, ef_construction=200, ef_search=128)
    q = corpus(n=50, seed=1)
    exact = np.argsort(-(q @ emb.T), axis=1)[:, :10]
    with builder.from_embeddings(emb) as indexer:
        assert indexer.size == 1000
        ids, scores = indexer.query(q, top_k=10)
        recall = np.mean([len(set(ids[i]) & set(exact[i])) / 10 for i in range(len(q))])
        assert recall > 0.9, f"HNSW recall@10 too low: {recall}"
        # scores are descending similarities
        assert np.all(np.diff(scores, axis=1) <= 1e-5)
        indexer.save(str(tmp_path / "index.hnsw"))
    with builder.from_index_file(str(tmp_path / "index.hnsw")) as indexer:
        ids2, _ = indexer.query(q, top_k=10)
        np.testing.assert_array_equal(ids, ids2)


def test_native_hnsw_angular():
    emb = corpus(n=300)
    builder = builder_factory("hnsw", metric="angular", ef_search=64)
    with builder.from_embeddings(emb) as indexer:
        ids, sims = indexer.query(emb[:4] * 5.0, top_k=1)  # scale-invariant
        np.testing.assert_array_equal(ids[:, 0], [0, 1, 2, 3])
        np.testing.assert_allclose(sims[:, 0], 1.0, rtol=1e-4)


def test_factory_unknown():
    with pytest.raises(NotImplementedError):
        builder_factory("scann")


@pytest.mark.skipif(not HAS_ANNOY, reason="annoy not installed")
def test_annoy_backend(tmp_path):
    emb = corpus()
    builder = builder_factory("annoy", metric="dot", n_trees=10)
    with builder.from_embeddings(emb) as indexer:
        ids, _ = indexer.query(emb[:3], top_k=5)
        assert ids.shape == (3, 5)


@pytest.mark.skipif(not HAS_FAISS, reason="faiss not installed")
def test_faiss_backend(tmp_path):
    emb = corpus()
    builder = builder_factory("faiss", index_key="Flat", metric="ip")
    with builder.from_embeddings(emb) as indexer:
        ids, _ = indexer.query(emb[:3], top_k=5)
        assert ids[0, 0] == 0


# ---------------------------------------------------------------------------
# Milvus: contract documentation (requires a live server — skip-marked here)
# ---------------------------------------------------------------------------

def _milvus_server_available(host="localhost", port=19530):
    import socket

    try:
        socket.create_connection((host, port), timeout=1).close()
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _milvus_server_available(), reason="no live Milvus server on localhost:19530 (this environment is network-isolated; the wrapper is UNTESTED, provided for API parity with /root/reference/tests/test_serving.py:220-291)")
def test_milvus_contract_live():
    """The contract the wrapper implements (runs only against a live server):

    - ``builder_factory("milvus", collection_name=..., index_type="FLAT"|"HNSW"|"IVF_FLAT", metric="ip"|"cosine"|"l2")``
      returns a context-managed builder;
    - ``builder.build(embeddings (N, D) float32, ids (N,) int64)`` creates the
      collection, inserts rows, builds the index, returns a MilvusIndexer;
    - ``indexer.query(q (B, D)|(D,), top_k)`` returns ``(ids (B, top_k) int64,
      distances (B, top_k) float32)`` with -1 padding for missing hits;
    - ``indexer.save(path)`` flushes server-side (no local artifact);
    - exiting the builder context drops the collection.
    """
    pymilvus = pytest.importorskip("pymilvus")  # noqa: F841
    from torch_rechub_tpu.serving import builder_factory

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(64, 8)).astype(np.float32)
    ids = np.arange(64, dtype=np.int64)
    with builder_factory("milvus", collection_name="rechub_test", index_type="FLAT", metric="ip") as builder:
        indexer = builder.build(emb, ids)
        got_ids, got_dists = indexer.query(emb[:4], top_k=5)
        assert got_ids.shape == (4, 5) and got_dists.shape == (4, 5)
        # exact FLAT/IP: each query's own id is its top hit
        assert (got_ids[:, 0] == ids[:4]).all()
