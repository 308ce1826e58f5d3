"""Categorical sampling from unnormalized log-potentials.

Vectorized equivalent of the reference's per-variable inverse-CDF draw
(reference: numbskull/inference.py:36-52): Z[k] = exp(potential_k), cumsum,
u * Z[last], first index with cumsum >= u — identical distribution, but
max-subtracted for float32 stability and computed for a whole color block
at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def draw(pot, card, key):
    """Sample one value per row from softmax(potential) over k < card.

    Args:
      pot:  (R, K) float32 unnormalized log-potentials.
      card: (R,) int32 cardinalities (rows use only k < card).
      key:  PRNG key.

    Returns:
      (R,) int32 sampled values in [0, card).
    """
    R, K = pot.shape
    ks = jnp.arange(K, dtype=jnp.int32)
    mask = ks[None, :] < card[:, None]
    logits = jnp.where(mask, pot, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    z = jnp.where(mask, jnp.exp(logits - m), 0.0)
    csum = jnp.cumsum(z, axis=1)
    u = jax.random.uniform(key, (R, 1), dtype=pot.dtype) * csum[:, -1:]
    val = jnp.sum((csum < u).astype(jnp.int32), axis=1)
    return jnp.minimum(val, card - 1)
