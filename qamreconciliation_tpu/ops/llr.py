"""Channel-observation LLR builders (Bob-side, direct reconciliation).

Batched log-domain equivalent of the reference's Gray max-log-free exact LLR
(reference: sims/reconciliation.pyx:25-89): for each sample y and bit k,

    LLR_k = log sum_{i: gray_k(i)=0} e^{-(y-a_i)^2 / 2v}
          - log sum_{i: gray_k(i)=1} e^{-(y-a_i)^2 / 2v}

computed with logsumexp for float32 stability.
"""

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..models.bicm import gray_bit_masks
from ..config import DEFAULT_DTYPE

__all__ = ["y_to_lappr_gray"]


def y_to_lappr_gray(y, constellation, two_variance, dtype=DEFAULT_DTYPE):
    """y: [..., S] samples -> LLRs [..., S*bps] (per-symbol blocks contiguous).

    ``two_variance`` is 2*noise_var, matching the reference's argument
    (reference: sims/reconciliation.pyx:75-89).
    """
    y = jnp.asarray(y, dtype)
    c = jnp.asarray(constellation, dtype)
    M = c.shape[0]
    bps = M.bit_length() - 1
    mask1 = jnp.asarray(gray_bit_masks(bps), dtype) > 0      # [M, bps]

    log_w = -((y[..., None] - c) ** 2) / jnp.asarray(two_variance, dtype)
    lw = log_w[..., None]                                    # [..., S, M, 1]
    neg_inf = jnp.array(-jnp.inf, dtype)
    num = logsumexp(jnp.where(mask1, neg_inf, lw), axis=-2)
    den = logsumexp(jnp.where(mask1, lw, neg_inf), axis=-2)
    llr = num - den                                          # [..., S, bps]
    return llr.reshape(*llr.shape[:-2], -1)
