"""End-to-end matching tests: real preprocessing -> fit -> inference_embedding.

Mirrors the reference pattern (``/root/reference/tests/test_e2e_matching.py``):
synthetic interactions through ``generate_seq_feature_match`` +
``gen_model_input`` for each mode, then train + embed.
"""

import numpy as np
import pandas as pd
import pytest

from torch_rechub_tpu.basic.features import SequenceFeature, SparseFeature
from torch_rechub_tpu.models import matching
from torch_rechub_tpu.trainers.match_trainer import MatchTrainer
from torch_rechub_tpu.utils.data import ArrayLoader, MatchDataGenerator
from torch_rechub_tpu.utils.match import gen_model_input, generate_seq_feature_match

N_USERS, N_ITEMS, SEQ_LEN, D = 30, 40, 10, 8


def make_interactions(n=400, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": rng.integers(1, N_USERS, n),
        "item_id": rng.integers(1, N_ITEMS, n),
        "time": rng.integers(0, 10000, n),
    })


def prepare(mode, neg_ratio=2):
    df = make_interactions()
    df_train, df_test = generate_seq_feature_match(df, "user_id", "item_id", "time", mode=mode, neg_ratio=neg_ratio)
    user_profile = pd.DataFrame({"user_id": np.arange(N_USERS)})
    item_profile = pd.DataFrame({"item_id": np.arange(N_ITEMS)})
    x_train = gen_model_input(df_train, user_profile, "user_id", item_profile, "item_id", seq_max_len=SEQ_LEN)
    if mode == 0:
        y = x_train.pop("label")
    else:
        y = np.zeros(len(x_train["user_id"]), dtype=np.int64)
        x_train.pop("label", None)
    x_test = gen_model_input(df_test, user_profile, "user_id", item_profile, "item_id", seq_max_len=SEQ_LEN)
    return x_train, np.asarray(y), x_test


def user_item_features(n_neg=0):
    user = (
        SparseFeature("user_id", vocab_size=N_USERS, embed_dim=D),
        SequenceFeature("hist_item_id", vocab_size=N_ITEMS, embed_dim=D, pooling="mean", shared_with="item_id"),
    )
    item = (SparseFeature("item_id", vocab_size=N_ITEMS, embed_dim=D),)
    neg = (SequenceFeature("neg_items", vocab_size=N_ITEMS, embed_dim=D, pooling="concat", shared_with="item_id"),) if n_neg else ()
    return user, item, neg


def test_dssm_pointwise_and_inference():
    x_train, y, x_test = prepare(mode=0)
    user, item, _ = user_item_features()
    model = matching.DSSM(user_features=user, item_features=item, user_params={"dims": (16, D)}, item_params={"dims": (16, D)})
    dg = MatchDataGenerator(x_train, y)
    all_items = {"item_id": np.arange(N_ITEMS)}
    train_dl, test_dl, item_dl = dg.generate_dataloader(x_test, all_items, batch_size=64)
    trainer = MatchTrainer(model, mode=0, n_epoch=1, model_path="/tmp/rechub_match")
    trainer.fit(train_dl)
    user_emb = trainer.inference_embedding(model, "user", test_dl, "/tmp/rechub_match")
    item_emb = trainer.inference_embedding(model, "item", item_dl, "/tmp/rechub_match")
    assert user_emb.shape == (len(x_test["user_id"]), D)
    assert item_emb.shape == (N_ITEMS, D)
    np.testing.assert_allclose(np.linalg.norm(user_emb, axis=1), 1.0, rtol=1e-4)


def test_dssm_senet_runs():
    x_train, y, _ = prepare(mode=0)
    user, item, _ = user_item_features()
    model = matching.DSSMSENet(user_features=user, item_features=item, user_params={"dims": (16, D)}, item_params={"dims": (16, D)})
    trainer = MatchTrainer(model, mode=0, n_epoch=1, model_path="/tmp/rechub_match")
    trainer.fit(ArrayLoader(x_train, y, batch_size=64, shuffle=True))


def test_facebook_dssm_pairwise():
    x_train, y, _ = prepare(mode=1)
    user, item, _ = user_item_features()
    pos_item = item
    neg_item = (SparseFeature("neg_items", vocab_size=N_ITEMS, embed_dim=D, shared_with="item_id"),)
    model = matching.FaceBookDSSM(user_features=user, pos_item_features=pos_item, neg_item_features=neg_item, user_params={"dims": (16, D)}, item_params={"dims": (16, D)})
    trainer = MatchTrainer(model, mode=1, n_epoch=1, model_path="/tmp/rechub_match")
    trainer.fit(ArrayLoader(x_train, y, batch_size=64, shuffle=True))


@pytest.mark.parametrize("model_name", ["YoutubeDNN", "GRU4Rec", "MIND", "ComirecSA", "ComirecDR"])
def test_listwise_models(model_name):
    x_train, y, _ = prepare(mode=2, neg_ratio=3)
    user, item, neg = user_item_features(n_neg=3)
    kwargs = dict(user_features=user, item_features=item, neg_item_feature=neg)
    if model_name == "YoutubeDNN":
        model = matching.YoutubeDNN(**kwargs, user_params={"dims": (16, D)})
    elif model_name == "GRU4Rec":
        user_wo_hist = (user[0],)
        hist = (SequenceFeature("hist_item_id", vocab_size=N_ITEMS, embed_dim=D, pooling="concat", shared_with="item_id"),)
        model = matching.GRU4Rec(user_features=user_wo_hist, history_features=hist, item_features=item, neg_item_feature=neg, user_params={"dims": (16, D), "num_layers": 1})
    elif model_name == "MIND":
        user_wo_hist = (user[0],)
        hist = (SequenceFeature("hist_item_id", vocab_size=N_ITEMS, embed_dim=D, pooling="concat", shared_with="item_id"),)
        model = matching.MIND(user_features=user_wo_hist, history_features=hist, item_features=item, neg_item_feature=neg, max_length=SEQ_LEN)
    elif model_name == "ComirecSA":
        user_wo_hist = (user[0],)
        hist = (SequenceFeature("hist_item_id", vocab_size=N_ITEMS, embed_dim=D, pooling="concat", shared_with="item_id"),)
        model = matching.ComirecSA(user_features=user_wo_hist, history_features=hist, item_features=item, neg_item_feature=neg)
    else:
        user_wo_hist = (user[0],)
        hist = (SequenceFeature("hist_item_id", vocab_size=N_ITEMS, embed_dim=D, pooling="concat", shared_with="item_id"),)
        model = matching.ComirecDR(user_features=user_wo_hist, history_features=hist, item_features=item, neg_item_feature=neg, max_length=SEQ_LEN)
    trainer = MatchTrainer(model, mode=2, n_epoch=1, model_path="/tmp/rechub_match")
    trainer.fit(ArrayLoader(x_train, y, batch_size=64, shuffle=True))
    # multi-interest models return (B, K, D) user embeddings
    loader = ArrayLoader({k: v for k, v in x_train.items() if not k.startswith("neg")}, batch_size=64)
    emb = trainer.inference_embedding(model, "user", loader, "/tmp/rechub_match")
    assert emb.ndim in (2, 3)


def test_youtube_sbc_inbatch():
    x_train, y, _ = prepare(mode=2, neg_ratio=1)
    user, item, _ = user_item_features()
    weight = (SparseFeature("sample_weight", vocab_size=2, embed_dim=1),)
    x_train["sample_weight"] = np.ones(len(x_train["user_id"]), dtype=np.int32)
    model = matching.YoutubeSBC(user_features=user, item_features=item, sample_weight_feature=weight, user_params={"dims": (16, D)}, item_params={"dims": (16, D)}, batch_size=64, n_neg=3)
    trainer = MatchTrainer(model, mode=2, n_epoch=1, model_path="/tmp/rechub_match")
    trainer.fit(ArrayLoader(x_train, y, batch_size=64, shuffle=True))


def test_dssm_inbatch_negatives():
    x_train, y, _ = prepare(mode=0)
    # drop explicit negatives; keep positives only for in-batch sampling
    keep = y == 1
    x_pos = {k: v[keep] for k, v in x_train.items()}
    user, item, _ = user_item_features()
    model = matching.DSSM(user_features=user, item_features=item, user_params={"dims": (16, D)}, item_params={"dims": (16, D)})
    trainer = MatchTrainer(model, mode=0, in_batch_neg=True, in_batch_neg_ratio=4, hard_negative=False, sampler_seed=0, n_epoch=1, model_path="/tmp/rechub_match")
    trainer.fit(ArrayLoader(x_pos, y[keep], batch_size=32, shuffle=True))
    trainer_hard = MatchTrainer(model, mode=0, in_batch_neg=True, in_batch_neg_ratio=4, hard_negative=True, n_epoch=1, model_path="/tmp/rechub_match")
    trainer_hard.fit(ArrayLoader(x_pos, y[keep], batch_size=32, shuffle=True))


def test_inbatch_sampling_exact():
    """Hand-computed hard negatives + no self-sampling (mirrors reference unit test)."""
    import jax
    import jax.numpy as jnp

    from torch_rechub_tpu.utils.match import gather_inbatch_logits, inbatch_negative_sampling

    scores = jnp.array([
        [9.0, 1.0, 2.0, 3.0],
        [4.0, 9.0, 6.0, 5.0],
        [7.0, 8.0, 9.0, 1.0],
        [3.0, 2.0, 1.0, 9.0],
    ])
    idx = inbatch_negative_sampling(scores, neg_ratio=2, hard_negative=True)
    np.testing.assert_array_equal(np.asarray(idx), [[3, 2], [2, 3], [1, 0], [0, 1]])
    logits = gather_inbatch_logits(scores, idx)
    np.testing.assert_array_equal(np.asarray(logits[:, 0]), [9.0, 9.0, 9.0, 9.0])
    # uniform: no self index ever
    for seed in range(3):
        idx = inbatch_negative_sampling(scores, neg_ratio=3, rng=jax.random.PRNGKey(seed))
        assert not np.any(np.asarray(idx) == np.arange(4)[:, None])


def test_match_trainer_steps_per_call_trajectory():
    """Device-side scan path == per-step dispatch for mode-0 training."""
    x_train, y, _ = prepare(mode=0)
    user, item, _ = user_item_features()

    def run(steps_per_call):
        model = matching.DSSM(user_features=user, item_features=item, user_params={"dims": (16, D)}, item_params={"dims": (16, D)})
        tr = MatchTrainer(model, mode=0, n_epoch=1, model_path="/tmp/rechub_match_spc", seed=0, steps_per_call=steps_per_call)
        dl = ArrayLoader(x_train, y, batch_size=64, shuffle=False)
        return [tr.train_one_epoch(dl) for _ in range(2)]

    # scan-fused vs standalone step: same math, roundoff-level divergence only
    np.testing.assert_allclose(run(1), run(3), rtol=1e-2)
