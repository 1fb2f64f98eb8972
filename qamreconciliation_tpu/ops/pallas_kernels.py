"""Pallas TPU kernels for the BP hot loop (SURVEY.md §7.7 speed-of-light pass).

The check-node (horizontal) update is the arithmetic core of each BP
iteration: phi/sign decomposition, masked reduction over the check's slots,
extrinsic magnitude and syndrome sign flip (see ops/boxplus.py for the math
and reference: qamreconciliation/decoder.pyx:322-369 for the semantics).
Here it runs as one fused Pallas kernel per block of check nodes: the whole
[CB, dc, B] tile lives in VMEM, so the phi intermediates never round-trip
through HBM the way the unfused XLA ops can.

``check_node_update_pallas`` is numerically identical to
``ops.boxplus.check_node_update`` (asserted in tests, interpret mode on CPU)
and is selected by benchmarking — integrate only where measured faster.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .boxplus import phi_llr

try:  # TPU-only module; tests on CPU use interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except ImportError:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["check_node_update_pallas"]


def _kernel(v2c_ref, synd_ref, mask_ref, out_ref, *, tiny):
    # phi_llr is the jnp-level two-regime form from ops/boxplus.py — it
    # lowers fine inside a Pallas kernel, so the two paths share one source
    # of truth for the numerics.
    v = v2c_ref[:]                                   # [CB, dc, B]
    mask = mask_ref[:][:, :, None]                   # [CB, dc, 1]
    absv = jnp.abs(v)
    phim = phi_llr(absv, tiny) * mask
    s_phi = jnp.sum(phim, axis=1, keepdims=True)
    mag = phi_llr(s_phi - phim, tiny)

    neg = jnp.logical_and(v < 0, mask > 0).astype(jnp.int32)
    parity = jnp.sum(neg, axis=1, keepdims=True) & 1
    ext_neg = jnp.bitwise_xor(parity, neg)
    sign = (1 - 2 * ext_neg).astype(v.dtype)

    pref = (1 - 2 * synd_ref[:]).astype(v.dtype)[:, None, :]
    out_ref[:] = sign * pref * mag * mask


@functools.partial(jax.jit, static_argnames=("block_c", "interpret"))
def check_node_update_pallas(
    v2c_c, synd, c_mask, tiny: float = 1e-30, *,
    block_c: int = 512, interpret: bool = False,
):
    """Fused check-node update.

    Args match ops.boxplus.check_node_update: v2c_c [C, dc, B], synd [C, B]
    (0/1 int), c_mask [C, dc].  Returns c2v [C, dc, B].
    ``block_c``: check rows per kernel instance; C is padded to a multiple.
    ``interpret``: run the Pallas interpreter (CPU tests).
    """
    C, dc, B = v2c_c.shape
    dtype = v2c_c.dtype
    synd = synd.astype(jnp.int32)
    c_mask = c_mask.astype(dtype)

    CB = min(block_c, C)
    C_pad = ((C + CB - 1) // CB) * CB
    if C_pad != C:
        pad = C_pad - C
        v2c_c = jnp.concatenate(
            [v2c_c, jnp.zeros((pad, dc, B), dtype)], axis=0
        )
        synd = jnp.concatenate([synd, jnp.zeros((pad, B), jnp.int32)], axis=0)
        c_mask = jnp.concatenate([c_mask, jnp.zeros((pad, dc), dtype)], axis=0)

    grid = (C_pad // CB,)
    out = pl.pallas_call(
        functools.partial(_kernel, tiny=tiny),
        out_shape=jax.ShapeDtypeStruct((C_pad, dc, B), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((CB, dc, B), lambda i: (i, 0, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((CB, B), lambda i: (i, 0), memory_space=_VMEM),
            pl.BlockSpec((CB, dc), lambda i: (i, 0), memory_space=_VMEM),
        ],
        out_specs=pl.BlockSpec((CB, dc, B), lambda i: (i, 0, 0),
                               memory_space=_VMEM),
        interpret=interpret,
    )(v2c_c, synd, c_mask)
    return out[:C]
