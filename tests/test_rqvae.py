"""RQ-VAE tests: quantizer invariants + trainer e2e + semantic IDs."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_rechub_tpu.models.generative.rqvae import RQVAEModel, VectorQuantizer, kmeans, sinkhorn_algorithm
from torch_rechub_tpu.trainers.rqvae_trainer import RQVAETrainer

IN_DIM, E_DIM = 32, 8


def embeddings(n=300, seed=0):
    rng = np.random.default_rng(seed)
    # clustered data so quantization is learnable
    centers = rng.normal(size=(10, IN_DIM)) * 3
    return (centers[rng.integers(0, 10, n)] + rng.normal(size=(n, IN_DIM)) * 0.1).astype(np.float32)


def test_vector_quantizer_straight_through():
    vq = VectorQuantizer(n_e=16, e_dim=E_DIM, sk_epsilon=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(20, E_DIM)).astype(np.float32))
    variables = vq.init(jax.random.PRNGKey(0), x, use_sk=False)
    x_q, loss, indices = vq.apply(variables, x, use_sk=False)
    assert x_q.shape == x.shape
    assert indices.shape == (20,)
    assert float(loss) >= 0
    # straight-through: grad of sum(x_q) wrt x is identity-like (ones)
    g = jax.grad(lambda x: jnp.sum(vq.apply(variables, x, use_sk=False)[0]))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-5)


def test_sinkhorn_balanced():
    d = jnp.asarray(np.random.default_rng(0).normal(size=(64, 8)).astype(np.float64))
    q = sinkhorn_algorithm(d, 0.05, 50)
    np.testing.assert_allclose(np.asarray(q.sum(axis=1)), 1.0, rtol=5e-2)


def test_kmeans_centers():
    x = embeddings(200)
    centers = kmeans(x, 10, num_iters=5)
    assert centers.shape == (10, IN_DIM)
    assert np.isfinite(centers).all()


def test_rqvae_trainer_fit_and_semantic_ids():
    data = embeddings(256)
    model = RQVAEModel(in_dim=IN_DIM, num_emb_list=(32, 32), e_dim=E_DIM, layers=(16,), sk_epsilons=(0.0, 0.003), kmeans_init=True, kmeans_iters=3)
    trainer = RQVAETrainer(model, n_epoch=3, eval_step=2, model_path="/tmp/rechub_rqvae", use_sk=False)
    best_loss, best_rate = trainer.fit(data, batch_size=64)
    assert np.isfinite(best_loss)
    sids = trainer.generate_semantic_ids(data, batch_size=64, max_retries=3)
    assert len(sids) == len(data)
    assert all(len(v) == 2 for v in sids.values())
    import os

    assert os.path.exists("/tmp/rechub_rqvae/best_loss_model.msgpack")
