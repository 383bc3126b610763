"""Tests for exact brute-force top-k retrieval."""

import numpy as np

from torch_rechub_tpu.serving import brute_force_topk, match_evaluation, multi_interest_topk


def test_brute_force_topk_exact():
    rng = np.random.default_rng(0)
    users = rng.normal(size=(17, 8)).astype(np.float32)
    items = rng.normal(size=(100, 8)).astype(np.float32)
    idx, vals = brute_force_topk(users, items, k=5)
    scores = users @ items.T
    expected = np.argsort(-scores, axis=1)[:, :5]
    np.testing.assert_array_equal(idx, expected)
    np.testing.assert_allclose(vals, np.take_along_axis(scores, expected, axis=1), rtol=1e-5)


def test_multi_interest_topk_dedups():
    users = np.zeros((1, 2, 4), dtype=np.float32)
    users[0, 0] = [1, 0, 0, 0]
    users[0, 1] = [1, 0.01, 0, 0]  # nearly identical interest -> same top items
    items = np.eye(4, dtype=np.float32)
    idx = multi_interest_topk(users, items, k=3)
    assert len(set(idx[0].tolist())) == 3  # deduplicated


def test_match_evaluation_end_to_end():
    rng = np.random.default_rng(1)
    n_users, n_items, d = 20, 50, 8
    item_emb = rng.normal(size=(n_items, d)).astype(np.float32)
    # users whose embedding == their ground-truth item's embedding -> recall@1 should be 1
    gt_items = rng.integers(0, n_items, n_users)
    user_emb = item_emb[gt_items]
    test_user = {"user_id": np.arange(n_users), "item_id": gt_items}
    all_item = {"item_id": np.arange(n_items)}
    out = match_evaluation(user_emb, item_emb, test_user, all_item, topk=10)
    hit_val = float(out["Hit"][0].split(": ")[1])
    assert hit_val == 1.0
