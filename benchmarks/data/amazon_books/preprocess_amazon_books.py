"""Convert the raw Amazon Reviews (Books) ratings dump into the CSV consumed
by ``examples/generative/run_rqvae_amazon_books.py`` / HSTU examples.

Semantics match the reference
(``/root/reference/examples/ranking/data/amazon-books/preprocess_amazon_books.py:1-28``):

- keep items with >= ``min_item_count`` interactions;
- binary ``label``: 1 if the rating is >= that user's mean rating;
- all four columns integer label-encoded, rows sorted by user.

Raw input: ``ratings_Books.csv`` (no header: user_id,item_id,rating,time).

    python preprocess_amazon_books.py --raw ratings_Books.csv
"""

from __future__ import annotations

import argparse

import pandas as pd


def convert(raw_path: str, out_path: str, sample_path: str | None = None, min_item_count: int = 5) -> pd.DataFrame:
    data = pd.read_csv(raw_path, header=None, names=["user_id", "item_id", "rating", "time"])
    data = data[data.groupby("item_id")["item_id"].transform("count") >= min_item_count]
    user_mean = data.groupby("user_id")["rating"].transform("mean")
    data["label"] = (data["rating"] >= user_mean).astype(int)
    data = data[["user_id", "item_id", "time", "label"]]
    for col in data.columns:
        data[col], _ = pd.factorize(data[col], sort=True)
    data = data.sort_values("user_id")
    data.to_csv(out_path, index=False)
    if sample_path:
        data.head(100).to_csv(sample_path, index=False)
    return data


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--raw", default="./ratings_Books.csv")
    p.add_argument("--out", default="./amazon_books_datasets.csv")
    p.add_argument("--sample-out", default="./amazon_books_sample.csv")
    p.add_argument("--min-item-count", type=int, default=5)
    a = p.parse_args()
    df = convert(a.raw, a.out, a.sample_out, a.min_item_count)
    print(f"wrote {len(df)} rows -> {a.out} (+100-row sample -> {a.sample_out})")
