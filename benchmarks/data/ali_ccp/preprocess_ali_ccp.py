"""Convert the raw Ali-CCP (Alibaba Click and Conversion Prediction) release
into the CSV consumed by ``benchmarks/datasets.build_aliccp_*`` and
``examples/ranking/run_ali_ccp_*.py``.

Semantics match the reference pipeline
(``/root/reference/examples/ranking/data/ali-ccp/preprocess_ali_ccp.py:26-118``):

- raw skeleton rows are ``sample_id,click,purchase,common_index,feat_num,feats``
  where ``feats`` packs ``field\\x02id\\x03value`` tuples joined by ``\\x01``;
  per-user common features live in a second file keyed by ``common_index``;
- rows with click=0 & purchase=1 are dropped (impossible label combination);
- 23 sparse fields keep the categorical id, 8 of them additionally emit their
  float value as a ``D``-prefixed dense column;
- sparse ids seen < ``min_freq`` times in train are mapped to 0, the rest to
  a contiguous 1-based vocabulary fit on train only.

    python preprocess_ali_ccp.py --skeleton sample_skeleton_train.csv \
        --common common_features_train.csv --out ali_ccp_train.csv
"""

from __future__ import annotations

import argparse
import json
import os

SPARSE = ["101", "121", "122", "124", "125", "126", "127", "128", "129", "205", "206", "207", "210", "216", "508", "509", "702", "853", "301", "109_14", "110_14", "127_14", "150_14"]
DENSE_SOURCE = ["109_14", "110_14", "127_14", "150_14", "508", "509", "702", "853"]
COLUMNS = SPARSE + ["D" + c for c in DENSE_SOURCE]


def _parse_feats(feat_str: str) -> dict:
    out = {}
    for part in feat_str.split("\x01"):
        field, rest = part.split("\x02")
        feat_id, value = rest.split("\x03")
        if field in SPARSE:
            out[field] = feat_id
        if field in DENSE_SOURCE:
            out["D" + field] = value
    return out


def _load_common(path: str) -> dict:
    common = {}
    with open(path) as f:
        for line in f:
            idx, _, feat_str = line.rstrip("\n").split(",")[:3]
            common[idx] = _parse_feats(feat_str)
    return common


def extract_rows(skeleton_path: str, common_path: str):
    """Yield (click, purchase, {col: raw value}) per kept sample."""
    common = _load_common(common_path)
    with open(skeleton_path) as f:
        for line in f:
            parts = line.rstrip("\n").split(",")
            _, click, purchase, common_idx, _, feat_str = parts[:6]
            if click == "0" and purchase == "1":
                continue
            feats = _parse_feats(feat_str)
            feats.update(common.get(common_idx, {}))
            yield click, purchase, feats


def convert(skeleton_path: str, common_path: str, out_path: str, vocab_path: str = "./ali_ccp_vocab.json", fit_vocab: bool = True, min_freq: int = 10):
    rows = list(extract_rows(skeleton_path, common_path))
    if fit_vocab:
        counts = {c: {} for c in SPARSE}
        for _, _, feats in rows:
            for c in SPARSE:
                v = feats.get(c)
                if v is not None:
                    counts[c][v] = counts[c].get(v, 0) + 1
        vocab = {c: {v: i for i, v in enumerate((k for k, n in sorted(cnt.items()) if n >= min_freq), start=1)} for c, cnt in counts.items()}
        with open(vocab_path, "w") as f:
            json.dump(vocab, f)
    else:
        with open(vocab_path) as f:
            vocab = json.load(f)

    with open(out_path, "w") as f:
        f.write("click,purchase," + ",".join(COLUMNS) + "\n")
        for click, purchase, feats in rows:
            vals = [click, purchase]
            for c in COLUMNS:
                raw = feats.get(c, "0")
                vals.append(str(vocab[c].get(raw, 0)) if c in vocab else raw)
            f.write(",".join(vals) + "\n")
    return len(rows)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--skeleton", default="./sample_skeleton_train.csv")
    p.add_argument("--common", default="./common_features_train.csv")
    p.add_argument("--out", default="./ali_ccp_sample.csv")
    p.add_argument("--vocab", default="./ali_ccp_vocab.json")
    p.add_argument("--test-mode", action="store_true", help="reuse the train-fit vocabulary instead of fitting one")
    p.add_argument("--min-freq", type=int, default=10)
    a = p.parse_args()
    n = convert(a.skeleton, a.common, a.out, a.vocab, fit_vocab=not a.test_mode, min_freq=a.min_freq)
    print(f"wrote {n} rows -> {a.out} (vocab: {a.vocab})")
