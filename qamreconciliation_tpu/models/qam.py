"""Square QAM as two independent PAM quadratures.

The reference implements PAM only (its QAM experiments factor a square QAM
constellation into independent I/Q PAM dimensions, which is exact for AWGN
with Gray labelling per dimension).  This module provides that factoring as
a first-class object: a ``QAMAlphabet`` wraps one :class:`PAMAlphabet` per
quadrature, samples complex symbols, and interleaves the per-quadrature Gray
bits as ``[I-bits, Q-bits]`` per symbol, so the whole reconciliation stack
(NoiseMapper, engines, decoder) runs unchanged on each quadrature's real
stream.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .alphabet import PAMAlphabet
from ..config import DEFAULT_DTYPE

__all__ = ["QAMAlphabet"]


class QAMAlphabet:
    """M-QAM with M = 4^(bit_per_symbol/2), factored into I/Q PAM.

    Args:
      bit_per_symbol: total bits per complex symbol (must be even).
      step: PAM grid spacing per quadrature.
      probabilities: optional per-quadrature PAM probabilities (the complex
        symbol distribution is the product measure).
    """

    def __init__(self, bit_per_symbol: int, step: float, probabilities=None):
        if bit_per_symbol % 2 != 0:
            raise ValueError(
                f"QAM bit_per_symbol must be even, got {bit_per_symbol}"
            )
        self.bit_per_symbol = int(bit_per_symbol)
        self.pam = PAMAlphabet(bit_per_symbol // 2, step, probabilities)
        self.order = self.pam.order ** 2
        self.step = self.pam.step
        # Es of the complex symbol = 2x the per-quadrature PAM variance.
        self.variance = 2.0 * self.pam.variance

    # ------------------------------------------------------------------ #

    def random_symbols(self, key: jax.Array, shape):
        """Sample (i_idx, q_idx) PAM index pairs, each of ``shape``."""
        ki, kq = jax.random.split(key)
        return (
            self.pam.random_symbols(ki, shape),
            self.pam.random_symbols(kq, shape),
        )

    def index_to_value(self, iq_index, dtype=DEFAULT_DTYPE) -> jax.Array:
        """(i_idx, q_idx) -> complex constellation points."""
        i_idx, q_idx = iq_index
        return jax.lax.complex(
            self.pam.index_to_value(i_idx, dtype),
            self.pam.index_to_value(q_idx, dtype),
        )

    def awgn(self, key: jax.Array, values, noise_var_total, dtype=DEFAULT_DTYPE):
        """Complex AWGN with TOTAL variance ``noise_var_total`` (split evenly
        over the quadratures, matching the per-quadrature PAM channel)."""
        kr, ki = jax.random.split(key)
        s = jnp.sqrt(jnp.asarray(noise_var_total, dtype) / 2.0)
        return values + jax.lax.complex(
            s * jax.random.normal(kr, jnp.shape(values), dtype),
            s * jax.random.normal(ki, jnp.shape(values), dtype),
        )

    def quadrature_streams(self, y):
        """Complex samples -> (real stream, imag stream) for the PAM stack."""
        y = jnp.asarray(y)
        return jnp.real(y), jnp.imag(y)

    def demap_symbols_to_bits(self, iq_index) -> jax.Array:
        """(i_idx, q_idx) [..., S] -> bits [..., S * bit_per_symbol] with the
        per-symbol layout ``[I Gray bits, Q Gray bits]``."""
        i_idx, q_idx = iq_index
        bi = self.pam._s_to_b_dev[i_idx]       # [..., S, bps/2]
        bq = self.pam._s_to_b_dev[q_idx]
        bits = jnp.concatenate([bi, bq], axis=-1)   # [..., S, bps]
        return bits.reshape(*bits.shape[:-2], -1)

    def interleave_llrs(self, llr_i, llr_q) -> jax.Array:
        """Per-quadrature LLR streams [..., S*bps/2] -> [..., S*bps] matching
        :meth:`demap_symbols_to_bits`'s bit layout."""
        h = self.pam.bit_per_symbol
        si = llr_i.reshape(*llr_i.shape[:-1], -1, h)
        sq = llr_q.reshape(*llr_q.shape[:-1], -1, h)
        out = jnp.concatenate([si, sq], axis=-1)
        return out.reshape(*out.shape[:-2], -1)
