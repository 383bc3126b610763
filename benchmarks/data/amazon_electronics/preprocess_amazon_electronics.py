"""Convert the raw Amazon Reviews (Electronics) 5-core dumps into the CSV
consumed by ``examples/ranking/run_amazon_electronics.py`` (DIN) and
``examples/ranking/run_dien.py``.

Semantics match the reference
(``/root/reference/examples/ranking/data/amazon-electronics/preprocess_amazon_electronics.py:1-49``):

- reviews: keep (reviewerID, asin, unixReviewTime); meta: keep (asin, last
  category of the last category path);
- contiguous integer ids via sorted-unique maps for items, categories, users;
- inner-join reviews with item categories, sort by (user, time);
- output columns ``user_id,item_id,time,cate_id``.

Raw inputs are the public json-lines dumps (``reviews_Electronics_5.json``,
``meta_Electronics.json``).

    python preprocess_amazon_electronics.py --reviews reviews_Electronics_5.json --meta meta_Electronics.json
"""

from __future__ import annotations

import argparse
import ast

import pandas as pd


def _read_json_lines(path: str, cols):
    rows = []
    with open(path) as f:
        for line in f:
            rec = ast.literal_eval(line)
            rows.append({c: rec[c] for c in cols})
    return pd.DataFrame(rows)


def _encode(series: pd.Series) -> pd.Series:
    mapping = {v: i for i, v in enumerate(sorted(series.unique()))}
    return series.map(mapping)


def convert(reviews_path: str, meta_path: str, out_path: str) -> pd.DataFrame:
    reviews = _read_json_lines(reviews_path, ["reviewerID", "asin", "unixReviewTime"])
    meta = _read_json_lines(meta_path, ["asin", "categories"])
    meta = meta[meta["asin"].isin(reviews["asin"].unique())].reset_index(drop=True)
    meta["categories"] = meta["categories"].map(lambda paths: paths[-1][-1])

    asin_map = {v: i for i, v in enumerate(sorted(meta["asin"].unique()))}
    meta["asin"] = meta["asin"].map(asin_map)
    meta["categories"] = _encode(meta["categories"])
    reviews["asin"] = reviews["asin"].map(asin_map)
    reviews["reviewerID"] = _encode(reviews["reviewerID"])
    reviews = reviews.dropna(subset=["asin"]).sort_values(["reviewerID", "unixReviewTime"])

    data = reviews.merge(meta, on="asin", how="inner")
    data = data.rename(columns={"reviewerID": "user_id", "asin": "item_id", "unixReviewTime": "time", "categories": "cate_id"})
    data = data[["user_id", "item_id", "time", "cate_id"]].astype("int64")
    data.to_csv(out_path, index=False)
    return data


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--reviews", default="./reviews_Electronics_5.json")
    p.add_argument("--meta", default="./meta_Electronics.json")
    p.add_argument("--out", default="./amazon_electronics_sample.csv")
    a = p.parse_args()
    df = convert(a.reviews, a.meta, a.out)
    print(f"wrote {len(df)} rows -> {a.out}")
