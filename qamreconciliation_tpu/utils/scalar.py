"""Small scalar/batched utilities.

Capability parity with reference: qamreconciliation/utils.pyx:18-40, batched.
"""

import jax.numpy as jnp

__all__ = ["dist_cut", "count_errors_from_lappr"]


def dist_cut(x):
    """Clamp to [0, 1] (reference: qamreconciliation/utils.pyx:18-23)."""
    return jnp.clip(x, 0.0, 1.0)


def count_errors_from_lappr(lappr, word):
    """Hard-decision mismatch count: bit = 1 iff lappr < 0.

    ``lappr >= 0`` decides bit 0 (so counts ``word``), else bit 1 (counts
    ``1 - word``), matching reference: qamreconciliation/utils.pyx:27-40.
    Reduces over the last axis; leading axes are batch.
    """
    word = word.astype(jnp.int32)
    decided = (lappr < 0).astype(jnp.int32)
    return jnp.sum(decided ^ word, axis=-1)
