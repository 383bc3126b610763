"""HLLM tests: frozen embeddings + SeqTrainer e2e."""

import jax
import numpy as np

from torch_rechub_tpu.models.generative import HLLMModel
from torch_rechub_tpu.trainers import SeqTrainer
from torch_rechub_tpu.utils.data import SequenceDataGenerator

VOCAB, L, D = 40, 12, 16


def test_hllm_frozen_embeddings_and_fit():
    rng = np.random.default_rng(0)
    item_emb = rng.normal(size=(VOCAB, D)).astype(np.float32)
    model = HLLMModel(item_embeddings=item_emb, vocab_size=VOCAB, d_model=D, n_heads=2, n_layers=1, max_seq_len=L, dropout=0.0, num_time_buckets=16)

    toks = rng.integers(1, VOCAB, (32, L)).astype(np.int32)
    tds = rng.integers(0, 86400, (32, L)).astype(np.int32)
    targets = rng.integers(1, VOCAB, 32).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), toks, tds, training=False)
    # frozen table lives in constants, not params
    assert "item_embeddings" in variables["constants"]
    assert "item_embeddings" not in str(list(variables["params"].keys()))
    logits = model.apply(variables, toks, tds, training=False)
    assert logits.shape == (32, L, VOCAB)
    # cosine scoring bound: |logits| <= 1/temperature
    assert np.abs(np.asarray(logits)).max() <= 1.0 / 0.07 + 1e-3

    positions = np.tile(np.arange(L), (32, 1))
    gen = SequenceDataGenerator(toks, positions, targets, tds)
    (dl,) = gen.generate_dataloader(batch_size=16)
    trainer = SeqTrainer(model, n_epoch=1, model_path="/tmp/rechub_hllm")
    trainer.fit(dl)
    # frozen embeddings unchanged after training
    np.testing.assert_allclose(
        np.asarray(trainer.const_vars["constants"]["item_embeddings"]),
        item_emb / np.maximum(np.linalg.norm(item_emb, axis=-1, keepdims=True), 1e-8),
        rtol=1e-5,
    )
