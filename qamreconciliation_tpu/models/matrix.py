"""Parity-check matrix / syndrome evaluation.

Capability parity with reference: qamreconciliation/matrix.pyx:20-60, built on
the same dual-layout graph metadata as the decoder so syndrome evaluation is a
batched gather + masked popcount (no scatters).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .decoder import TannerGraph

__all__ = ["Matrix"]


class Matrix:
    """Edge-list parity-check matrix.

    Constructor mirrors ``Matrix(vnode_array, cnode_array)``
    (reference: qamreconciliation/matrix.pyx:21-38); node counts are inferred
    as ``max(id) + 1``.
    """

    def __init__(self, vnode_array, cnode_array):
        vid = np.asarray(vnode_array, dtype=np.int64).reshape(-1)
        cid = np.asarray(cnode_array, dtype=np.int64).reshape(-1)
        if vid.shape[0] != cid.shape[0]:
            raise ValueError("Incompatible sizes for input vectors")
        self.graph = TannerGraph(vid, cid)
        self.vnum = self.graph.vnum
        self.cnum = self.graph.cnum
        self.ednum = self.graph.ednum

    def eval_syndrome(self, word):
        """Syndrome of hard bits.

        word: [..., V] (0/1) -> synd: [..., C] uint8, matching the XOR-scatter
        semantics of reference: qamreconciliation/matrix.pyx:55-60.
        """
        word = jnp.asarray(word)
        batch_shape = word.shape[:-1]
        bits = word.reshape(-1, self.vnum).T.astype(jnp.int32)   # [V, B]
        synd = self.graph.syndrome_from_bits(bits)               # [C, B]
        return synd.T.reshape(*batch_shape, self.cnum).astype(jnp.uint8)
