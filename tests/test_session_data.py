"""Session-based data pipeline: ``generate_session_features`` semantics
(filters, time split, train-fitted encoding), prefix expansion, the
diginetica/yidian bundles, and the word2vec sample-weight map.

Reference behavior being mirrored:
``examples/matching/data/session_based/preprocess_session_based.py`` and
``examples/matching/run_sbr.py:24-29``; ``movielens_utils.py:61-67``.
"""

import numpy as np
import pandas as pd
import pytest

from benchmarks.datasets import build_diginetica_session_dataset, build_yidian_sbc_dataset
from torch_rechub_tpu.utils.data import generate_session_features, session_model_input
from torch_rechub_tpu.utils.match import get_item_sample_weight


def _frame(rows):
    return pd.DataFrame(rows, columns=["session_id", "item_id", "time"])


def test_session_filters_and_split():
    rows = [
        # session 1: 3 events, all before the cutoff
        (1, "a", "2024-01-01"), (1, "b", "2024-01-01"), (1, "a", "2024-01-02"),
        # session 2: single event -> dropped by min_session_len
        (2, "a", "2024-01-02"),
        # session 3: in the last 7 days -> test split
        (3, "a", "2024-01-20"), (3, "b", "2024-01-20"),
        # session 4: contains a rare item 'z' (freq 1) -> 'z' dropped, session shrinks to 2
        (4, "b", "2024-01-03"), (4, "z", "2024-01-03"), (4, "a", "2024-01-04"),
    ]
    train, test, n_items = generate_session_features(_frame(rows), min_item_freq=2, test_days=7)
    # items a, b encoded 1-based from TRAIN rows only
    assert n_items == 3
    assert train == [[1, 2, 1], [2, 1]]
    assert test == [[1, 2]]


def test_session_unknown_test_items_dropped():
    rows = [
        (1, "a", "2024-01-01"), (1, "b", "2024-01-01"),
        (2, "a", "2024-01-01"), (2, "b", "2024-01-02"),
        # test-window session with an item never seen in train: row dropped,
        # leaving 1 event -> whole session filtered
        (3, "a", "2024-01-20"), (3, "q", "2024-01-20"),
        (4, "a", "2024-01-20"), (4, "b", "2024-01-21"),
    ]
    train, test, n_items = generate_session_features(_frame(rows), min_item_freq=1, test_days=7)
    assert test == [[1, 2]]
    assert all(all(0 < i < n_items for i in s) for s in train + test)


def test_session_model_input_prefix_expansion():
    x, y = session_model_input([[5, 7, 9]], max_seq_len=4)
    assert x["hist_item_id"].shape == (2, 4)
    # history [5] -> target 7 ; history [5, 7] -> target 9, zero-post-padded
    np.testing.assert_array_equal(x["hist_item_id"], [[5, 0, 0, 0], [5, 7, 0, 0]])
    np.testing.assert_array_equal(y, [7, 9])
    # truncation keeps the FIRST max_seq_len items (reference run_sbr.py:28)
    x2, y2 = session_model_input([[1, 2, 3, 4, 5]], max_seq_len=2)
    np.testing.assert_array_equal(x2["hist_item_id"][-1], [1, 2])
    assert y2[-1] == 5


def test_diginetica_bundle_from_committed_sample():
    b = build_diginetica_session_dataset()
    assert b.x_train["hist_item_id"].shape[1] == 19
    assert len(b.y_train) > 100  # 500-row sample expands to a few hundred prefixes
    assert b.x_train["hist_item_id"].max() < b.n_items
    assert b.y_train.max() < b.n_items
    assert len(b.y_test) > 0


def test_yidian_bundle_from_committed_sample():
    b = build_yidian_sbc_dataset()
    assert {"user_id", "hist_item_id", "sample_weight", "network", "age0"} <= set(b.x_train)
    # SBC list-wise target: positive at column 0
    assert b.y_train.dtype == np.int64 and set(np.unique(b.y_train)) == {0}
    w = b.x_train["sample_weight"]
    assert w.dtype == np.float32 and (w > 0).all() and (w < 1).all()
    assert len(b.x_all_item["item_id"]) == len(b.x_all_item["sample_weight"])


def test_get_item_sample_weight_word2vec():
    weights = get_item_sample_weight([1, 1, 1, 2])
    assert pytest.approx(weights[1] + weights[2]) == 1.0
    assert pytest.approx(weights[1] / weights[2]) == 3**0.75
