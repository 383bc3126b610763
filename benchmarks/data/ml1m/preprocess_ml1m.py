"""Join the raw MovieLens-1M ``.dat`` files into the single CSV consumed by
``benchmarks/datasets.build_ml1m_matching_dataset`` and every
``examples/matching/run_ml_*.py`` script.

Same join as the reference
(``/root/reference/examples/matching/data/ml-1m/preprocess_ml.py:1-13``):
ratings x movies x users on their id columns, columns
``user_id,movie_id,rating,timestamp,title,genres,gender,age,occupation,zip``.

    python preprocess_ml1m.py --raw-dir ./ml-1m --out ml-1m.csv
    python preprocess_ml1m.py --raw-dir ./ml-1m --out ml1m_sample.csv --n-rows 100
"""

from __future__ import annotations

import argparse
import os

import pandas as pd


def convert(raw_dir: str, out_path: str, n_rows: int | None = None) -> pd.DataFrame:
    read = lambda name, cols: pd.read_csv(os.path.join(raw_dir, name), sep="::", header=None, names=cols, engine="python", encoding="ISO-8859-1")
    ratings = read("ratings.dat", ["user_id", "movie_id", "rating", "timestamp"])
    movies = read("movies.dat", ["movie_id", "title", "genres"])
    users = read("users.dat", ["user_id", "gender", "age", "occupation", "zip"])
    data = ratings.merge(movies, on="movie_id").merge(users, on="user_id")
    if n_rows:
        data = data.head(n_rows)
    data.to_csv(out_path, index=False)
    return data


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--raw-dir", default="./ml-1m", help="directory with ratings.dat/movies.dat/users.dat")
    p.add_argument("--out", default="./ml1m_sample.csv")
    p.add_argument("--n-rows", type=int, default=None)
    a = p.parse_args()
    df = convert(a.raw_dir, a.out, a.n_rows)
    print(f"wrote {len(df)} rows x {len(df.columns)} cols -> {a.out}")
