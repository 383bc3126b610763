"""Convert the raw YiDian-News competition dump into the CSV consumed by
``benchmarks/datasets.build_yidian_sbc_dataset`` and
``examples/matching/run_yidian_sbc.py``.

Raw inputs (tab-separated, headerless — the public competition release):
- ``train_data.txt``: userId, itemId, showTime, network, refresh, showPos,
  click, duration
- ``user_info.txt``: userId, deviceName, OS, province, city, age, gender —
  where ``age`` packs four ``bucket:prob`` pairs and ``gender`` packs
  ``female:p,male:p``.

Output: the joined table with age/gender probability columns unpacked
(``age0..age3``, ``female``, ``male``) and ``duration`` dropped — the exact
schema of the committed ``yidian_news_sample.csv`` (and of the reference's
``examples/matching/data/yidian_news/yidian_news_sampled.csv``).

    python preprocess_yidian.py --ui train_data.txt --users user_info.txt --out yidian_news_sample.csv --n-rows 1000
"""

from __future__ import annotations

import argparse

import pandas as pd

UI_COLUMNS = ["userId", "itemId", "showTime", "network", "refresh", "showPos", "click", "duration"]
USER_COLUMNS = ["userId", "deviceName", "OS", "province", "city", "age", "gender"]


def _unpack_probs(series: pd.Series, names: list[str]) -> pd.DataFrame:
    parts = series.str.split(",", expand=True)
    parts.columns = names
    return parts.apply(lambda col: col.str.split(":").str[1].astype(float))


def convert(ui_path: str, users_path: str, out_path: str, n_rows: int | None = None) -> pd.DataFrame:
    ui = pd.read_csv(ui_path, sep="\t", header=None, names=UI_COLUMNS, nrows=n_rows)
    users = pd.read_csv(users_path, sep="\t", header=None, names=USER_COLUMNS)
    data = ui.merge(users, on="userId", how="left")
    age = _unpack_probs(data.pop("age"), ["age0", "age1", "age2", "age3"])
    gender = _unpack_probs(data.pop("gender"), ["female", "male"])
    data = pd.concat([data.drop(columns=["duration"]), age, gender], axis=1)
    data.to_csv(out_path)
    return data


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--ui", default="./train_data.txt", help="raw user-item interaction log")
    p.add_argument("--users", default="./user_info.txt", help="raw user profile table")
    p.add_argument("--out", default="./yidian_news_sample.csv")
    p.add_argument("--n-rows", type=int, default=None, help="truncate interactions to the first N rows")
    a = p.parse_args()
    df = convert(a.ui, a.users, a.out, a.n_rows)
    print(f"wrote {len(df)} rows x {len(df.columns)} cols -> {a.out}")
