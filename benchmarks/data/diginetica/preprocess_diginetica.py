"""Convert the raw Diginetica click-stream dump into the ``;``-separated
sample CSV consumed by ``benchmarks/datasets.build_diginetica_session_dataset``
and ``examples/matching/run_sbr.py``.

Raw input: ``train-item-views.csv`` from the public CIKM Cup 2016 release —
``;``-separated with columns ``sessionId;userId;itemId;timeframe;eventdate``.
The heavy lifting (session-length / item-frequency filtering, time-based
split, train-fitted 1-based item encoding) lives in
``torch_rechub_tpu.utils.data.generate_session_features`` so it is reusable
and unit-tested; this CLI only samples/validates the raw file.  Reference
pipeline: ``examples/matching/data/session_based/preprocess_session_based.py``.

    python preprocess_diginetica.py --raw train-item-views.csv --out train_item_views_full.csv
    python preprocess_diginetica.py --raw train-item-views.csv --out train_item_views_sample.csv --n-rows 500
"""

from __future__ import annotations

import argparse

import pandas as pd

COLUMNS = ["sessionId", "userId", "itemId", "timeframe", "eventdate"]


def convert(raw_path: str, out_path: str, n_rows: int | None = None) -> pd.DataFrame:
    df = pd.read_csv(raw_path, sep=";", nrows=n_rows)
    missing = [c for c in COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"raw diginetica file lacks columns {missing}; got {list(df.columns)}")
    df[COLUMNS].to_csv(out_path, sep=";", index=False)
    return df


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--raw", default="./train-item-views.csv", help="raw CIKM Cup 2016 click file")
    p.add_argument("--out", default="./train_item_views_sample.csv")
    p.add_argument("--n-rows", type=int, default=None, help="truncate to the first N rows (sample mode)")
    a = p.parse_args()
    df = convert(a.raw, a.out, a.n_rows)
    print(f"wrote {len(df)} rows ({df['sessionId'].nunique()} sessions, {df['itemId'].nunique()} items) -> {a.out}")
