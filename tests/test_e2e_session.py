"""End-to-end tests for session-based matching models (SASRec/NARM/STAMP/SINE)."""

import numpy as np
import pytest

from torch_rechub_tpu.basic.features import SequenceFeature, SparseFeature
from torch_rechub_tpu.models import matching
from torch_rechub_tpu.trainers.match_trainer import MatchTrainer
from torch_rechub_tpu.utils.data import ArrayLoader

N_ITEMS, SEQ_LEN, D = 60, 12, 8


def session_data(n=160, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(1, SEQ_LEN + 1, n)
    seq = np.zeros((n, SEQ_LEN), dtype=np.int32)
    for i, l in enumerate(lengths):
        seq[i, :l] = rng.integers(1, N_ITEMS, l)
    target = rng.integers(1, N_ITEMS, n).astype(np.int32)
    return seq, target


def test_sasrec_pairwise():
    seq, _ = session_data()
    rng = np.random.default_rng(1)
    pos = np.roll(seq, -1, axis=1)
    neg = np.where(seq > 0, rng.integers(1, N_ITEMS, seq.shape), 0).astype(np.int32)
    x = {"seq": seq, "pos": pos, "neg": neg}
    y = np.zeros(len(seq), dtype=np.int64)
    feats = (
        SequenceFeature("seq", vocab_size=N_ITEMS, embed_dim=D, pooling="concat"),
        SequenceFeature("pos", vocab_size=N_ITEMS, embed_dim=D, pooling="concat", shared_with="seq"),
        SequenceFeature("neg", vocab_size=N_ITEMS, embed_dim=D, pooling="concat", shared_with="seq"),
    )
    model = matching.SASRec(features=feats, max_len=SEQ_LEN, num_blocks=1, num_heads=1, dropout_rate=0.2)
    trainer = MatchTrainer(model, mode=1, n_epoch=1, model_path="/tmp/rechub_sess")
    trainer.fit(ArrayLoader(x, y, batch_size=32, shuffle=True))


def test_sasrec_two_tower_inbatch():
    seq, target = session_data()
    x = {"seq": seq, "target_item": target}
    y = np.ones(len(seq), dtype=np.float32)
    feats = (SequenceFeature("seq", vocab_size=N_ITEMS, embed_dim=D, pooling="concat"),)
    item_fea = SparseFeature("target_item", vocab_size=N_ITEMS, embed_dim=D, shared_with="seq")
    model = matching.SASRec(features=feats, max_len=SEQ_LEN, num_blocks=1, item_feature=item_fea)
    trainer = MatchTrainer(model, mode=0, in_batch_neg=True, in_batch_neg_ratio=4, n_epoch=1, model_path="/tmp/rechub_sess")
    trainer.fit(ArrayLoader(x, y, batch_size=32, shuffle=True))
    user_emb = trainer.inference_embedding(model, "user", ArrayLoader({"seq": seq}, batch_size=32), "/tmp/rechub_sess")
    assert user_emb.shape == (len(seq), D)


@pytest.mark.parametrize("model_name", ["NARM", "STAMP"])
def test_full_softmax_session_models(model_name):
    seq, target = session_data()
    x = {"hist_item": seq}
    y = target.astype(np.int64)  # class index over the item table
    fea = SequenceFeature("hist_item", vocab_size=N_ITEMS, embed_dim=D, pooling="concat", padding_idx=0)
    if model_name == "NARM":
        model = matching.NARM(item_history_feature=fea, hidden_dim=D, emb_dropout_p=0.2, session_rep_dropout_p=0.2)
    else:
        model = matching.STAMP(item_history_feature=fea, weight_std=0.05, emb_std=0.002)
    trainer = MatchTrainer(model, mode=2, n_epoch=1, model_path="/tmp/rechub_sess")
    trainer.fit(ArrayLoader(x, y, batch_size=32, shuffle=True))


def test_sine_listwise():
    seq, target = session_data()
    rng = np.random.default_rng(2)
    neg = rng.integers(1, N_ITEMS, (len(seq), 3)).astype(np.int32)
    x = {"hist_item": seq, "item_id": target, "neg_items": neg}
    y = np.zeros(len(seq), dtype=np.int64)
    model = matching.SINE(
        history_features=("hist_item",),
        item_features=("item_id",),
        neg_item_features=("neg_items",),
        num_items=N_ITEMS,
        embedding_dim=D,
        hidden_dim=16,
        num_concept=10,
        num_intention=3,
        seq_max_len=SEQ_LEN,
    )
    trainer = MatchTrainer(model, mode=2, n_epoch=1, model_path="/tmp/rechub_sess")
    trainer.fit(ArrayLoader(x, y, batch_size=32, shuffle=True))
    emb = trainer.inference_embedding(model, "user", ArrayLoader({"hist_item": seq, "item_id": target, "neg_items": neg}, batch_size=32), "/tmp/rechub_sess")
    assert emb.shape == (len(seq), D)
