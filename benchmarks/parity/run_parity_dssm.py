"""Head-to-head DSSM retrieval parity: reference torch vs ours on ML-1M sample.

Both models train on IDENTICAL preprocessed data (the reference's own
``generate_seq_feature_match`` + ``gen_model_input`` pipeline), with the
reference's hyperparameters (``examples/matching/run_ml_dssm.py``), and both
embedding sets are evaluated with the same exact top-k protocol.

Requires the reference checkout at /root/reference.  Results go to stdout and
``BASELINE.md`` is updated by hand.
"""

import contextlib
import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REFERENCE = "/root/reference"
EPOCHS, BS, LR, WD, EMB, SEQ_LEN = int(os.environ.get("PARITY_EPOCHS", 8)), 256, 1e-3, 1e-6, 16, 50


def ensure_reference_importable():
    meta_dir = "/tmp/fake_meta/torch_rechub-0.0.3.dist-info"
    os.makedirs(meta_dir, exist_ok=True)
    meta = os.path.join(meta_dir, "METADATA")
    if not os.path.exists(meta):
        with open(meta, "w") as f:
            f.write("Metadata-Version: 2.1\nName: torch-rechub\nVersion: 0.0.3\n")
    sys.path.insert(0, "/tmp/fake_meta")
    sys.path.insert(0, REFERENCE)


def preprocess(seed):
    """Reference preprocessing pipeline, shared verbatim by both frameworks."""
    import pandas as pd
    import random

    from torch_rechub.utils.data import df_to_dict
    from torch_rechub.utils.match import gen_model_input, generate_seq_feature_match

    np.random.seed(seed)
    random.seed(seed)
    data = pd.read_csv(os.path.join(REFERENCE, "examples/matching/data/ml-1m/ml-1m_sample.csv"))
    data["cate_id"] = data["genres"].apply(lambda x: x.split("|")[0])
    sparse_features = ["user_id", "movie_id", "gender", "age", "occupation", "zip", "cate_id"]
    feature_max_idx = {}
    for feature in sparse_features:
        mapping = {v: i + 1 for i, v in enumerate(sorted(data[feature].astype(str).unique()))}
        data[feature] = data[feature].astype(str).map(mapping)
        feature_max_idx[feature] = data[feature].max() + 1
    user_profile = data[["user_id", "gender", "age", "occupation", "zip"]].drop_duplicates("user_id")
    item_profile = data[["movie_id", "cate_id"]].drop_duplicates("movie_id")
    df_train, df_test = generate_seq_feature_match(data, "user_id", "movie_id", time_col="timestamp", item_attribute_cols=[], sample_method=1, mode=0, neg_ratio=3, min_item=0)
    x_train = gen_model_input(df_train, user_profile, "user_id", item_profile, "movie_id", seq_max_len=SEQ_LEN)
    y_train = np.asarray(x_train["label"])
    x_test = gen_model_input(df_test, user_profile, "user_id", item_profile, "movie_id", seq_max_len=SEQ_LEN)
    all_item = df_to_dict(item_profile)
    return feature_max_idx, x_train, y_train, x_test, all_item


USER_COLS = ["user_id", "gender", "age", "occupation", "zip"]
ITEM_COLS = ["movie_id", "cate_id"]


def run_reference(seed, data):
    import torch

    from torch_rechub.basic.features import SequenceFeature as TSeq, SparseFeature as TSparse
    from torch_rechub.models.matching import DSSM as TDSSM
    from torch_rechub.trainers import MatchTrainer as TTrainer
    from torch_rechub.utils.data import MatchDataGenerator as TMDG

    torch.manual_seed(seed)
    feature_max_idx, x_train, y_train, x_test, all_item = data
    user_features = [TSparse(n, vocab_size=feature_max_idx[n], embed_dim=EMB) for n in USER_COLS]
    user_features += [TSeq("hist_movie_id", vocab_size=feature_max_idx["movie_id"], embed_dim=EMB, pooling="mean", shared_with="movie_id")]
    item_features = [TSparse(n, vocab_size=feature_max_idx[n], embed_dim=EMB) for n in ITEM_COLS]
    model = TDSSM(user_features, item_features, temperature=0.02, user_params={"dims": [256, 128, 64], "activation": "prelu"}, item_params={"dims": [256, 128, 64], "activation": "prelu"})
    os.makedirs(f"/tmp/parity_dssm_t{seed}", exist_ok=True)
    trainer = TTrainer(model, mode=0, optimizer_params={"lr": LR, "weight_decay": WD}, n_epoch=EPOCHS, device="cpu", model_path=f"/tmp/parity_dssm_t{seed}")
    dg = TMDG(x=x_train, y=y_train)
    train_dl, test_dl, item_dl = dg.generate_dataloader(x_test, all_item, batch_size=BS)
    with contextlib.redirect_stdout(io.StringIO()):
        trainer.fit(train_dl)
        user_emb = trainer.inference_embedding(model=model, mode="user", data_loader=test_dl, model_path=f"/tmp/parity_dssm_t{seed}").numpy()
        item_emb = trainer.inference_embedding(model=model, mode="item", data_loader=item_dl, model_path=f"/tmp/parity_dssm_t{seed}").numpy()
    return user_emb, item_emb


def run_ours(seed, data):
    from torch_rechub_tpu.basic.features import SequenceFeature, SparseFeature
    from torch_rechub_tpu.models.matching import DSSM
    from torch_rechub_tpu.trainers import MatchTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    feature_max_idx, x_train, y_train, x_test, all_item = data
    user_features = tuple(SparseFeature(n, vocab_size=feature_max_idx[n], embed_dim=EMB) for n in USER_COLS) + (
        SequenceFeature("hist_movie_id", vocab_size=feature_max_idx["movie_id"], embed_dim=EMB, pooling="mean", shared_with="movie_id"),
    )
    item_features = tuple(SparseFeature(n, vocab_size=feature_max_idx[n], embed_dim=EMB) for n in ITEM_COLS)
    model = DSSM(user_features, item_features, temperature=0.02, user_params={"dims": (256, 128, 64), "activation": "prelu"}, item_params={"dims": (256, 128, 64), "activation": "prelu"})
    trainer = MatchTrainer(model, mode=0, optimizer_params={"lr": LR, "weight_decay": WD}, n_epoch=EPOCHS, model_path=f"/tmp/parity_dssm_o{seed}", seed=seed)
    x_tr = {k: v for k, v in x_train.items() if k != "label"}
    with contextlib.redirect_stdout(io.StringIO()):
        trainer.fit(ArrayLoader(x_tr, y_train, batch_size=BS, shuffle=True, seed=seed))
        user_emb = trainer.inference_embedding(model, "user", ArrayLoader({k: v for k, v in x_test.items() if k != "label"}, batch_size=BS), f"/tmp/parity_dssm_o{seed}")
        item_emb = trainer.inference_embedding(model, "item", ArrayLoader(all_item, batch_size=BS), f"/tmp/parity_dssm_o{seed}")
    return user_emb, item_emb


def evaluate(user_emb, item_emb, x_test, all_item):
    from torch_rechub_tpu.serving import match_evaluation

    with contextlib.redirect_stdout(io.StringIO()):
        out = match_evaluation(user_emb, item_emb, x_test, all_item, user_col="user_id", item_col="movie_id", topk=10)
    return {k: float(v[0].split(": ")[1]) for k, v in out.items()}


def main():
    ensure_reference_importable()
    rows_t, rows_o = [], []
    for seed in (0, 1, 2):
        data = preprocess(seed)
        t_user, t_item = run_reference(seed, data)
        o_user, o_item = run_ours(seed, data)
        mt = evaluate(t_user, t_item, data[3], data[4])
        mo = evaluate(o_user, o_item, data[3], data[4])
        rows_t.append(mt)
        rows_o.append(mo)
        print(f"seed {seed}: reference {mt}  |  ours {mo}")
    for name in ("Recall", "Hit", "NDCG"):
        t_vals = [r[name] for r in rows_t]
        o_vals = [r[name] for r in rows_o]
        print(f"{name}@10: reference {np.mean(t_vals):.4f}+-{np.std(t_vals):.4f}  ours {np.mean(o_vals):.4f}+-{np.std(o_vals):.4f}")


if __name__ == "__main__":
    main()
