"""Recurrent cells as single ``lax.scan`` kernels.

The reference relies on torch ``nn.GRU`` + ``pack_padded_sequence`` (host-side
packing, per-sequence lengths).  On TPU, variable-length packing is replaced
by static-shape scans with mask-frozen hidden state: outputs at padded steps
are zero and the final state equals the last valid step's state — identical
results for post-padded sequences, one compiled kernel, no host round-trips.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GRULayer(nn.Module):
    """Single GRU layer (torch gate equations) returning (outputs, final_h).

    ``mask`` (B, L) freezes the hidden state at padded steps and zeroes their
    outputs (pack_padded semantics); ``mask=None`` runs over every step like
    torch ``nn.GRU`` on an unpacked batch.
    """

    hidden: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, seq, mask=None):
        d = self.hidden
        bound = 1.0 / (d**0.5)
        init = lambda k, s: jax.random.uniform(k, s, minval=-bound, maxval=bound)
        w_i = self.param("w_i", init, (seq.shape[-1], 3 * d))
        w_h = self.param("w_h", init, (d, 3 * d))
        if self.use_bias:
            b_i = self.param("b_i", init, (3 * d,))
            b_h = self.param("b_h", init, (3 * d,))
        else:
            b_i = b_h = jnp.zeros((3 * d,), seq.dtype)
        h0 = jnp.zeros((seq.shape[0], d), seq.dtype)

        def step(h, inputs):
            x_t, m_t = inputs
            ir, iz, inn = jnp.split(x_t @ w_i + b_i, 3, axis=-1)
            hr, hz, hn = jnp.split(h @ w_h + b_h, 3, axis=-1)
            r = jax.nn.sigmoid(ir + hr)
            z = jax.nn.sigmoid(iz + hz)
            n = jnp.tanh(inn + r * hn)
            h_new = (1 - z) * n + z * h
            if m_t is None:
                return h_new, h_new
            keep = m_t[:, None] > 0
            return jnp.where(keep, h_new, h), jnp.where(keep, h_new, jnp.zeros_like(h_new))

        seq_t = jnp.swapaxes(seq, 0, 1)
        if mask is None:
            h_last, outs_t = jax.lax.scan(lambda h, x_t: step(h, (x_t, None)), h0, seq_t)
        else:
            h_last, outs_t = jax.lax.scan(step, h0, (seq_t, jnp.swapaxes(mask, 0, 1)))
        return jnp.swapaxes(outs_t, 0, 1), h_last
