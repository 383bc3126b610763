"""Preprocess scripts: fabricate tiny raw dumps, run each converter, assert
the output schema matches the committed sample CSV it is meant to produce
(reference ships per-dataset ``preprocess_*.py`` next to its data,
``examples/*/data/*/preprocess_*.py``)."""

import importlib.util
import os
import sys

import numpy as np
import pandas as pd
import pytest

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "benchmarks", "data")


def load_script(dataset, name):
    path = os.path.join(DATA_DIR, dataset, name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def sample_columns(dataset, csv_name):
    return list(pd.read_csv(os.path.join(DATA_DIR, dataset, csv_name), nrows=1).columns)


def test_criteo_preprocess(tmp_path):
    mod = load_script("criteo", "preprocess_criteo.py")
    rng = np.random.default_rng(0)
    raw = tmp_path / "train.txt"
    rows = []
    for _ in range(20):
        vals = [str(rng.integers(0, 2))] + [str(rng.integers(0, 100)) for _ in range(13)] + [f"{rng.integers(0, 1 << 32):08x}" for _ in range(26)]
        rows.append("\t".join(vals))
    raw.write_text("\n".join(rows))
    df = mod.convert(str(raw), str(tmp_path / "out.csv"), n_rows=10)
    assert list(df.columns) == sample_columns("criteo", "criteo_sample.csv")
    assert len(df) == 10


def test_avazu_preprocess(tmp_path):
    mod = load_script("avazu", "preprocess_avazu.py")
    rng = np.random.default_rng(0)
    cols = ["id", "click", "hour", "C1", "banner_pos"] + [f"x{i}" for i in range(19)]
    raw = tmp_path / "train.csv"
    df_raw = pd.DataFrame({c: rng.integers(0, 50, 30) for c in cols})
    df_raw["click"] = rng.integers(0, 2, 30)
    df_raw.to_csv(raw, index=False)
    df = mod.convert(str(raw), str(tmp_path / "out.csv"))
    assert list(df.columns) == sample_columns("avazu", "avazu_sample.csv")
    assert set(df["label"].unique()) <= {0, 1}
    # label-encoded: every feature is a contiguous-ish small int
    assert all(df[c].dtype.kind == "i" for c in df.columns)


def test_census_preprocess(tmp_path):
    mod = load_script("census", "preprocess_census.py")
    rng = np.random.default_rng(0)
    n = 24
    frame = {}
    for col in mod.COL_NAMES:
        if col in mod.CONTINUOUS:
            frame[col] = rng.normal(40, 10, n).round(2)
        elif col == "income":
            frame[col] = rng.choice([" 50000+.", " - 50000."], n)
        elif col == "marital status":
            frame[col] = rng.choice([" Never married", " Married"], n)
        else:
            frame[col] = rng.choice([" a", " b", " c"], n)
    df_raw = pd.DataFrame(frame)
    train, test = tmp_path / "train.data", tmp_path / "test.data"
    df_raw.iloc[:16].to_csv(train, index=False, header=False)
    df_raw.iloc[16:].to_csv(test, index=False, header=False)
    data = mod.convert(str(train), str(test), str(tmp_path), sample_rows=10)
    out = pd.read_csv(tmp_path / "census_income_sample.csv")
    assert list(out.columns) == sample_columns("census", "census_income_sample.csv")
    assert set(data["income"].unique()) <= {0, 1}
    assert set(data["marital status"].unique()) <= {0, 1}
    for col in mod.CONTINUOUS:
        assert 0.0 <= data[col].min() and data[col].max() <= 1.0


def test_ml1m_preprocess(tmp_path):
    mod = load_script("ml1m", "preprocess_ml1m.py")
    (tmp_path / "ratings.dat").write_text("1::10::5::978300760\n1::11::3::978300761\n2::10::4::978300762\n")
    (tmp_path / "movies.dat").write_text("10::Movie A (1999)::Drama\n11::Movie B (2000)::Comedy\n")
    (tmp_path / "users.dat").write_text("1::F::1::10::48067\n2::M::25::4::70072\n")
    df = mod.convert(str(tmp_path), str(tmp_path / "out.csv"))
    assert sorted(df.columns) == sorted(sample_columns("ml1m", "ml1m_sample.csv"))
    assert len(df) == 3


def test_amazon_books_preprocess(tmp_path):
    mod = load_script("amazon_books", "preprocess_amazon_books.py")
    rng = np.random.default_rng(0)
    n = 40
    df_raw = pd.DataFrame({
        "user_id": rng.choice([f"U{i}" for i in range(6)], n),
        "item_id": rng.choice([f"B{i}" for i in range(4)], n),
        "rating": rng.integers(1, 6, n),
        "time": rng.integers(1e9, 2e9, n),
    })
    raw = tmp_path / "ratings_Books.csv"
    df_raw.to_csv(raw, index=False, header=False)
    df = mod.convert(str(raw), str(tmp_path / "out.csv"), str(tmp_path / "sample.csv"), min_item_count=2)
    assert list(df.columns) == sample_columns("amazon_books", "amazon_books_sample.csv")
    assert set(df["label"].unique()) <= {0, 1}


def test_amazon_electronics_preprocess(tmp_path):
    mod = load_script("amazon_electronics", "preprocess_amazon_electronics.py")
    reviews = tmp_path / "reviews.json"
    meta = tmp_path / "meta.json"
    reviews.write_text(
        "{'reviewerID': 'A1', 'asin': 'B001', 'unixReviewTime': 1400000000}\n"
        "{'reviewerID': 'A1', 'asin': 'B002', 'unixReviewTime': 1400000100}\n"
        "{'reviewerID': 'A2', 'asin': 'B001', 'unixReviewTime': 1400000200}\n"
    )
    meta.write_text(
        "{'asin': 'B001', 'categories': [['Electronics', 'TV']]}\n"
        "{'asin': 'B002', 'categories': [['Electronics', 'Audio', 'Speakers']]}\n"
    )
    df = mod.convert(str(reviews), str(meta), str(tmp_path / "out.csv"))
    assert list(df.columns) == sample_columns("amazon_electronics", "amazon_electronics_sample.csv")
    assert len(df) == 3
    assert df["item_id"].max() == 1  # contiguous ids


def test_ali_ccp_preprocess(tmp_path):
    mod = load_script("ali_ccp", "preprocess_ali_ccp.py")

    def feat_str(pairs):
        return "\x01".join(f"{f}\x02{i}\x03{v}" for f, i, v in pairs)

    common = tmp_path / "common.csv"
    common.write_text("c1,2," + feat_str([("101", "7", "1.0"), ("109_14", "3", "0.5")]) + "\n")
    skeleton_rows = []
    for k in range(12):
        skeleton_rows.append(f"{k},1,0,c1,2," + feat_str([("205", "9", "1.0"), ("508", "4", "0.25")]))
    # impossible click=0 & purchase=1 row must be dropped
    skeleton_rows.append("99,0,1,c1,2," + feat_str([("205", "9", "1.0")]))
    skeleton = tmp_path / "skeleton.csv"
    skeleton.write_text("\n".join(skeleton_rows) + "\n")

    out = tmp_path / "out.csv"
    n = mod.convert(str(skeleton), str(common), str(out), vocab_path=str(tmp_path / "vocab.json"), min_freq=10)
    assert n == 12
    df = pd.read_csv(out)
    assert list(df.columns) == sample_columns("ali_ccp", "ali_ccp_sample.csv")
    # fields seen >= min_freq got contiguous 1-based ids; D-columns keep raw values
    assert (df["205"] == 1).all()
    assert np.allclose(df["D508"], 0.25)
    # common features propagated to every sample
    assert (df["101"] == 1).all()
    assert np.allclose(df["D109_14"], 0.5)


def test_aliexpress_preprocess(tmp_path):
    mod = load_script("aliexpress", "preprocess_aliexpress.py")
    cols = sample_columns("aliexpress", "aliexpress_sample.csv")
    rng = np.random.default_rng(0)
    part = pd.DataFrame({c: rng.integers(0, 5, 10) if not c.startswith("numerical") else rng.random(10) for c in cols})
    p1, p2 = tmp_path / "a.csv", tmp_path / "b.csv"
    part.to_csv(p1, index=False)
    part.to_csv(p2, index=False)
    df = mod.convert([str(p1), str(p2)], str(tmp_path / "out.csv"), n_rows=15)
    assert list(df.columns) == cols
    assert len(df) == 15
    with pytest.raises(ValueError):
        bad = part.drop(columns=["click"])
        bad.to_csv(p1, index=False)
        mod.convert([str(p1)], str(tmp_path / "out2.csv"))


def test_diginetica_preprocess(tmp_path):
    mod = load_script("diginetica", "preprocess_diginetica.py")
    rng = np.random.default_rng(0)
    raw = tmp_path / "train-item-views.csv"
    frame = pd.DataFrame({
        "sessionId": rng.integers(1, 5, 20),
        "userId": ["NA"] * 20,
        "itemId": rng.integers(100, 120, 20),
        "timeframe": rng.integers(0, 10**6, 20),
        "eventdate": "2016-05-09",
    })
    frame.to_csv(raw, sep=";", index=False)
    df = mod.convert(str(raw), str(tmp_path / "out.csv"), n_rows=10)
    out = pd.read_csv(tmp_path / "out.csv", sep=";")
    assert list(out.columns) == list(pd.read_csv(os.path.join(DATA_DIR, "diginetica", "train_item_views_sample.csv"), sep=";", nrows=1).columns)
    assert len(out) == 10
    with pytest.raises(ValueError):
        frame.drop(columns=["itemId"]).to_csv(raw, sep=";", index=False)
        mod.convert(str(raw), str(tmp_path / "out2.csv"))


def test_yidian_preprocess(tmp_path):
    mod = load_script("yidian_news", "preprocess_yidian.py")
    rng = np.random.default_rng(0)
    ui = tmp_path / "train_data.txt"
    users = tmp_path / "user_info.txt"
    n = 12
    ui_rows = ["\t".join(map(str, [rng.integers(0, 3), rng.integers(0, 50), 1624843756147, 5, 0, 16, rng.integers(0, 2), rng.integers(0, 60)])) for _ in range(n)]
    ui.write_text("\n".join(ui_rows))
    user_rows = ["\t".join([str(u), "DVC-AN20", "Android", "江西", "南昌", "0-12:0.1,13-18:0.2,19-35:0.3,36+:0.4", "female:0.4,male:0.6"]) for u in range(3)]
    users.write_text("\n".join(user_rows))
    df = mod.convert(str(ui), str(users), str(tmp_path / "out.csv"), n_rows=10)
    sample_cols = list(pd.read_csv(os.path.join(DATA_DIR, "yidian_news", "yidian_news_sample.csv"), index_col=0, nrows=1).columns)
    assert list(df.columns) == sample_cols
    assert len(df) == 10
    assert np.allclose(df["age0"], 0.1) and np.allclose(df["male"], 0.6)
