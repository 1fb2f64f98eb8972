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

from .boxplus import (
    MINSUM_ALPHA, fb_allbutone_list as _fb_allbutone_list,
    minsum_extrinsic_mag, minsum_mag, phi_llr, tanhfb_extrinsic_mag,
)

try:  # TPU-only module; tests on CPU use interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except ImportError:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = [
    "check_node_update_pallas",
    "bp_check_phase_qc",
    "bp_check_phase_generic",
    "bp_decode_rounds_qc",
    "bp_layered_sweeps_qc",
    "layered_resident_viable",
    "resident_vmem_bytes",
]


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


# --------------------------------------------------------------------- #
# Fused BP check PHASE (SURVEY.md §7.7): one kernel per block of checks
# performs, entirely in VMEM,
#   1. the syndrome convergence test of the gathered totals t
#      (parity of signs vs synd, partial violation counts out),
#   2. v2c = t - c2v (extrinsic reconstruction),
#   3. the sign/phi sum-product check update with the syndrome prefactor.
# The unfused XLA graph materializes v2c and the phi intermediates in HBM
# and re-reads t for the convergence reduction; at DVB-S2 scale that is
# ~300-500 MB of avoidable HBM traffic per BP iteration.  Messages may be
# bf16 (HBM at half width); the phi math always runs in f32.


def _check_phase_kernel(t_ref, c2v_ref, synd_ref, out_ref, viol_ref, *,
                        tiny, dc_axis, rule="sumproduct",
                        ms_alpha=MINSUM_ALPHA, ms_beta=0.0):
    # out follows the MESSAGE storage dtype (c2v); t may ride a wider
    # totals dtype (the f32-totals/bf16-messages hybrid, totals_dtype)
    out_dtype = out_ref.dtype
    compute = (
        jnp.float32
        if jnp.bfloat16 in (out_dtype, t_ref.dtype)
        else t_ref.dtype
    )
    # upcast ONCE at load: Mosaic rejects bf16 vector compares ("target does
    # not support this comparison"), and the phi math wants f32 anyway
    t = t_ref[:].astype(compute)
    synd = synd_ref[:].astype(jnp.int32)

    # 1. convergence partials: parity of hard decisions vs syndrome block.
    # The per-grid-cell count is written replicated over 8 sublanes (TPU
    # blocks need sublane-divisible shapes); consumers read sublane 0.
    neg_t = (t < 0).astype(jnp.int32)
    parity = jnp.sum(neg_t, axis=dc_axis) & 1                # synd-shaped
    viol = (parity != synd).astype(jnp.int32)
    count = jnp.sum(viol.reshape(-1, viol.shape[-1]), axis=0)
    viol_ref[0, 0] = jnp.broadcast_to(count[None, :], (8, count.shape[0]))

    # 2./3. extrinsic check update in f32
    v2c = t - c2v_ref[:].astype(compute)
    if rule == "minsum":
        # normalized min-sum: transcendental-free magnitude (the phi form
        # is VPU-bound here — measured 0.935 vs 0.531 ms/iter per kernel
        # loop at N=64800/B=128, against a 0.424 ms/iter copy floor)
        mag = minsum_mag(
            minsum_extrinsic_mag(jnp.abs(v2c), dc_axis), ms_alpha, ms_beta
        )
    elif rule == "tanhfb":
        # exact sum-product, tanh-F/B factorization: half the
        # transcendentals of the phi form (ops/boxplus.py)
        mag = tanhfb_extrinsic_mag(jnp.abs(v2c), dc_axis)
    else:
        phim = phi_llr(jnp.abs(v2c), tiny)
        s_phi = jnp.sum(phim, axis=dc_axis, keepdims=True)
        mag = phi_llr(s_phi - phim, tiny)
    neg = (v2c < 0).astype(jnp.int32)
    par = jnp.sum(neg, axis=dc_axis, keepdims=True) & 1
    sign = (1 - 2 * jnp.bitwise_xor(par, neg)).astype(compute)
    pref = jnp.expand_dims((1 - 2 * synd).astype(compute), dc_axis)
    out_ref[:] = (sign * pref * mag).astype(out_dtype)


def _pick_zb(z: int, B: int = 128, dc: int = 6) -> int | None:
    """z-chunk size for the QC check-phase kernel, or None if no legal
    blocking exists.

    Mosaic requires the -2 block dim to be a multiple of 8 OR equal to the
    full array dim, and the kernel keeps ~14 [1, dc, ZB, B] float32
    temporaries live against the ~16 MB scoped-VMEM budget — so: the whole
    z if it fits, else the largest 8-aligned divisor of z that fits, else
    None (caller falls back to the XLA check phase; e.g. z=450=2*3^2*5^2
    has no 8-aligned divisor and doesn't fit at B=128).

    VMEM tiles pad the minormost dim to 128 lanes and the -2 dim to 8
    sublanes, so the budget model uses the PADDED dims — with the raw B
    a B=16 decode (e.g. a small streaming batch) under-counted 8x and
    OOMed scoped vmem at compile time (24.45M vs the 16M limit)."""
    budget = 12 * 2 ** 20
    b_pad = -(-B // 128) * 128
    cap = max(1, budget // (14 * dc * b_pad * 4))
    if -(-z // 8) * 8 <= cap:
        return z
    aligned = [d for d in range(8, cap + 1, 8) if z % d == 0]
    return max(aligned) if aligned else None


@functools.partial(
    jax.jit,
    static_argnames=("block_z", "interpret", "rule", "ms_alpha", "ms_beta"),
)
def bp_check_phase_qc(t, c2v, synd, tiny: float = 1e-30, *,
                      block_z: int | None = None, interpret: bool = False,
                      rule: str = "sumproduct",
                      ms_alpha: float = MINSUM_ALPHA, ms_beta: float = 0.0):
    """Fused check phase in the QC decoder's native layout.

    Args:
      t:    [nb_c, dc, z, B] gathered variable totals (circulant rolls).
      c2v:  [nb_c, dc, z, B] previous check->var messages.
      synd: [nb_c, z, B] syndrome bits (0/1 int).
      rule: "sumproduct" (exact phi form, reference semantics) or
            "minsum" (normalized min-sum, TPU extension — see
            ops.boxplus.check_node_minsum_sm).

    Returns ``(c2v_new [nb_c, dc, z, B], viol [nb_c, nzb, 8, B] int32)``
    where ``viol[..., 0, :]`` holds per-(check-block, z-chunk) violation
    counts (replicated over the 8-sublane axis for TPU block alignment):
    ``viol[:, :, 0].sum((0, 1)) == 0`` is the per-frame convergence mask.
    Semantics match models/qc_decoder.qc_check_update + consistent()
    (reference: qamreconciliation/decoder.pyx:322-369, 251-257).
    """
    nb_c, dc, z, B = t.shape
    ZB = block_z or _pick_zb(z, B=B, dc=dc)
    if ZB is None:
        raise ValueError(
            f"no legal Pallas z-blocking for z={z}, B={B}, dc={dc} "
            "(needs an 8-aligned divisor of z that fits VMEM); use the "
            "XLA check phase instead"
        )
    if z % ZB:
        raise ValueError(f"block_z {ZB} must divide z {z}")
    nzb = z // ZB
    grid = (nb_c, nzb)
    out, viol = pl.pallas_call(
        functools.partial(
            _check_phase_kernel, tiny=tiny, dc_axis=1, rule=rule,
            ms_alpha=ms_alpha, ms_beta=ms_beta,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb_c, dc, z, B), c2v.dtype),
            jax.ShapeDtypeStruct((nb_c, nzb, 8, B), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dc, ZB, B), lambda i, j: (i, 0, j, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, dc, ZB, B), lambda i, j: (i, 0, j, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, ZB, B), lambda i, j: (i, j, 0),
                         memory_space=_VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, dc, ZB, B), lambda i, j: (i, 0, j, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, 1, 8, B), lambda i, j: (i, j, 0, 0),
                         memory_space=_VMEM),
        ),
        interpret=interpret,
    )(t, c2v, synd.astype(jnp.int32))
    return out, viol[:, :, 0, :]


@functools.partial(
    jax.jit,
    static_argnames=("block_c", "interpret", "rule", "ms_alpha", "ms_beta"),
)
def bp_check_phase_generic(t, c2v, synd, c_mask, tiny: float = 1e-30, *,
                           block_c: int = 256, interpret: bool = False,
                           rule: str = "sumproduct",
                           ms_alpha: float = MINSUM_ALPHA,
                           ms_beta: float = 0.0):
    """Fused check phase for the generic decoder's SLOT-MAJOR [dc, C, B]
    layout (degree axis leading, so the TPU-tiled minormost dims are
    (checks, frames) with no sublane padding — see models/decoder.py).

    Args:
      t:      [dc, C, B] gathered variable totals.
      c2v:    [dc, C, B] previous check->var messages.
      synd:   [C, B] syndrome bits (0/1 int).
      c_mask: [dc, C] 1.0 real slot / 0.0 padding.

    Same fusion as :func:`bp_check_phase_qc` with padded-slot masking.
    Returns ``(c2v_new [dc, C, B], viol [nblocks, B] int32)`` with
    per-check-block violation counts (``viol.sum(0) == 0`` = convergence).
    Semantics: ops.boxplus.check_node_update_sm + consistency test
    (reference: qamreconciliation/decoder.pyx:322-369, 251-257).
    """
    dc, C, B = t.shape
    # Scoped VMEM is ~16 MB; the kernel keeps ~14 [dc, CB, B] float32
    # temporaries live (f32 compute even for bf16 storage).  Cap CB so the
    # stack fits with headroom (measured: CB=512, dc=6, B=128 OOMs at
    # 20.06M vs the 16M limit on v5e).  The budget counts PADDED tile dims
    # (minor dim pads to 128 lanes — see _pick_zb's B=16 regression) and
    # the cap stays 8-sublane-aligned so a capped CB is a legal Mosaic
    # -2 block dim.
    vmem_budget = 12 * 2**20
    b_pad = -(-B // 128) * 128
    cb_cap = max(8, vmem_budget // (14 * dc * b_pad * 4) // 8 * 8)
    CB = min(block_c, C, cb_cap)
    C_pad = ((C + CB - 1) // CB) * CB
    if C_pad != C:
        pad = C_pad - C
        t = jnp.concatenate([t, jnp.zeros((dc, pad, B), t.dtype)], axis=1)
        c2v = jnp.concatenate(
            [c2v, jnp.zeros((dc, pad, B), c2v.dtype)], axis=1
        )
        synd = jnp.concatenate(
            [synd.astype(jnp.int32), jnp.zeros((pad, B), jnp.int32)], axis=0
        )
        c_mask = jnp.concatenate(
            [c_mask, jnp.zeros((dc, pad), c_mask.dtype)], axis=1
        )
    nblocks = C_pad // CB

    def kernel(t_ref, c2v_ref, synd_ref, mask_ref, out_ref, viol_ref, *,
               tiny=tiny):
        out_dtype = t_ref.dtype
        compute = jnp.float32 if out_dtype == jnp.bfloat16 else out_dtype
        # upcast once at load (Mosaic rejects bf16 vector compares)
        t_k = t_ref[:].astype(compute)
        mask = mask_ref[:].astype(compute)[:, :, None]      # [dc, CB, 1]
        synd_k = synd_ref[:].astype(jnp.int32)              # [CB, B]

        neg_t = (t_k < 0).astype(jnp.int32) * mask.astype(jnp.int32)
        parity = jnp.sum(neg_t, axis=0) & 1
        viol = (parity != synd_k).astype(jnp.int32)
        count = jnp.sum(viol, axis=0)
        # replicated over 8 sublanes for TPU block alignment (see QC kernel)
        viol_ref[0] = jnp.broadcast_to(count[None, :], (8, count.shape[0]))

        v2c = t_k - c2v_ref[:].astype(compute)
        if rule == "minsum":
            absm = jnp.where(
                mask > 0, jnp.abs(v2c), jnp.asarray(1e30, compute)
            )
            mag = minsum_mag(
                minsum_extrinsic_mag(absm, 0), ms_alpha, ms_beta
            )
        elif rule == "tanhfb":
            absm = jnp.where(
                mask > 0, jnp.abs(v2c), jnp.asarray(1e30, compute)
            )
            mag = tanhfb_extrinsic_mag(absm, 0)
        else:
            phim = phi_llr(jnp.abs(v2c), tiny) * mask
            s_phi = jnp.sum(phim, axis=0, keepdims=True)
            mag = phi_llr(s_phi - phim, tiny)
        neg = jnp.logical_and(v2c < 0, mask > 0).astype(jnp.int32)
        par = jnp.sum(neg, axis=0, keepdims=True) & 1
        sign = (1 - 2 * jnp.bitwise_xor(par, neg)).astype(compute)
        pref = (1 - 2 * synd_k).astype(compute)[None, :, :]
        out_ref[:] = (sign * pref * mag * mask).astype(out_dtype)

    out, viol = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((dc, C_pad, B), t.dtype),
            jax.ShapeDtypeStruct((nblocks, 8, B), jnp.int32),
        ),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((dc, CB, B), lambda i: (0, i, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((dc, CB, B), lambda i: (0, i, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((CB, B), lambda i: (i, 0), memory_space=_VMEM),
            pl.BlockSpec((dc, CB), lambda i: (0, i), memory_space=_VMEM),
        ],
        out_specs=(
            pl.BlockSpec((dc, CB, B), lambda i: (0, i, 0),
                         memory_space=_VMEM),
            pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                         memory_space=_VMEM),
        ),
        interpret=interpret,
    )(t, c2v, synd.astype(jnp.int32), c_mask)
    # padded rows are all-zero (t=0, synd=0 -> parity==synd), so they never
    # contribute violations; only the message rows need trimming
    return out[:, :C], viol[:, 0, :]


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


# --------------------------------------------------------------------- #
# VMEM-RESIDENT multi-iteration QC decode (round 3).
#
# Round 2 established (BASELINE.md, DESIGN.md) that the QC flooding loop is
# bound by a ~0.42 ms/iter "copy floor": every iteration materializes the
# rolled totals [nb_c, dc, z, B] in HBM, re-reads them in the check kernel,
# writes c2v, re-reads c2v for the variable scatter, and rewrites totals —
# ~300 MB of HBM round-trips per iteration at DVB-S2 scale.  The round-2
# kernels assumed a ~16 MB VMEM budget, which is only Mosaic's DEFAULT
# scoped-vmem limit: the v5e TensorCore has 128 MiB of VMEM and
# ``CompilerParams(vmem_limit_bytes=...)`` unlocks it
# (scripts/probe_vmem.py: a 120 MiB scratch compiles and runs).
#
# ``bp_decode_rounds_qc`` therefore keeps the ENTIRE decode state resident
# in VMEM — totals [nb_v, z, B], messages [nb_c, dc, z, B], priors, and the
# syndrome (int8) — and advances K full BP iterations per kernel call:
# circulant "gathers" become in-VMEM rolls of [z, B] slabs, and HBM is
# touched only to load/store the state once per K iterations (~170 MB per
# chunk instead of ~300 MB per iteration).  Convergence semantics
# (per-frame done mask, iters recorded at first convergence, final totals
# captured at that exact iteration) match models/qc_decoder._build_dense
# bit-for-bit for the min-sum rule (reduction orders deliberately mirrored)
# and to f32 summation order for sum-product.
# Reference semantics: qamreconciliation/decoder.pyx:391-436 (loop),
# 322-369 (check update), 251-257 (convergence test).


def _pick_zchunk(z: int, B: int = 128, dc: int = 6) -> int | None:
    """Largest divisor of z whose f32 chunk temporaries fit ~32 MB.

    Two measured failure modes bound the choice (N=64800, B=128, v5e):
    small chunks multiply the unrolled block count and Mosaic's register
    allocator keeps ~one [dc, ZC, B] f32 value live per block (ZC=360 ->
    90 blocks -> 60-85 MB of spill slots -> VMEM OOM), while ZC=z would
    make each block's ~12 live f32 temporaries ~64 MB.  ZC=900 (2 chunks,
    36 blocks) compiles and runs at 0.45 ms/iter.  Chunk boundaries need
    no sublane alignment (they are value slices of a VMEM ref, not
    BlockSpec dims)."""
    b_pad = -(-B // 128) * 128
    cap = (32 * 2**20) // (12 * dc * b_pad * 4)
    cands = [d for d in range(1, min(z, cap) + 1) if z % d == 0]
    best = max(cands) if cands else None
    # a sliver chunk (e.g. ZC=1 for prime z) would unroll z blocks and
    # feed the register-spill OOM regime — reject instead of compiling
    # a bomb; the caller falls back to the dense path
    if best is not None and best < 32 and z > cap:
        return None
    return best


def _pick_rowgroup(z: int, B: int, dc_max: int) -> int | None:
    """Auto row-group cap for the resident kernel, or None (ungrouped).

    Wide check rows (irregular codes, e.g. the IRA-style DVB-S2 family)
    squeeze ``_pick_zchunk`` from both sides: the per-block temporary
    budget scales with dc, so dc=10 forces ZC=450 at DVB-S2 scale — and
    the resulting 72 unrolled pass-1 blocks land in the measured
    register-spill VMEM-OOM regime (round-4 BASELINE.md).  Splitting each
    wide row into dc-bounded SUBGROUPS and merging with the associative
    P/Q (resp. phi-sum / min) factorization bounds the per-block
    liveness by the group cap instead of dc_max, so ZC can grow back to
    the proven few-chunk regime.

    Policy: ungrouped when the full-degree pick already yields <= 2
    chunks AND the max degree is inside the measured-safe liveness
    regime (dc <= 10: the z=360 rate-1/2 IRA runs whole-z ungrouped at
    0.504 ms/iter); otherwise the cap in 8..4 whose pick minimizes the
    chunk count (largest cap on ties — fewer groups, less merge
    overhead).  Grouping must strictly beat ungrouped on chunk count for
    dc <= 10; for WIDER rows (the rate-3/4 regime, dc ~ 12-17 — where
    the ungrouped per-block [dcr, ZC, B] liveness is itself the compile
    hazard, round-5 bench: ZC=180/nzc=2 ungrouped at dc=17 fails the
    remote Mosaic compile) a tie on chunk count is accepted too."""
    zc0 = _pick_zchunk(z, B=B, dc=dc_max)
    n0 = (z // zc0) if zc0 else None
    if n0 == 1:
        # whole-z single-chunk admitted by the liveness model: measured
        # safe ungrouped up to dc=11 (z=360 IRA 0.509 ms/iter, round-5
        # bench) and the model refuses whole-z beyond ~dc 22 anyway;
        # grouping here only adds merge overhead (+3% measured)
        return None
    safe_wide = dc_max <= 10
    if n0 is not None and n0 <= 2 and safe_wide:
        return None
    best = None                      # ((nzc, -cap), cap)
    for cap in (8, 7, 6, 5, 4):
        if cap >= dc_max:
            continue
        zcg = _pick_zchunk(z, B=B, dc=cap)
        if not zcg:
            continue
        key = (z // zcg, -cap)
        if best is None or key < best[0]:
            best = (key, cap)
    if best is None:
        return None
    if n0 is not None:
        limit = n0 - 1 if safe_wide else n0
        if best[0][0] > limit:
            return None
    return best[1]


def auto_rowgroup(rows, z: int, B: int, dtype, *,
                 doubled: bool = False, totals_f32: bool = False,
                 z_chunk=None) -> int | None:
    """Resolved auto row-group cap for the resident kernel: the
    chunk-count policy (:func:`_pick_rowgroup`) plus the VMEM-pressure
    fallback — when the resident state alone pushes the scoped budget
    against the 128 MiB ceiling (the real DVB-S2 structures: 600-660
    base edges -> 93-98 MB of state), a tight cap bounds the per-block
    temporaries.  Measured per-degree: cap 4 compiles for dc <= 14
    (rates 1/2, 2/3, 3/4: 0.635-0.72 ms/iter); the dc=22 rate-5/6 code
    fails at caps 4 AND 8 but compiles at 6 — Mosaic's liveness
    response to the group split is non-monotonic.  Pure function of the
    code shape (unit-tested against the measured matrix,
    tests/test_pallas_kernels.py)."""
    nb_c = len(rows)
    nb_v = max(v for row in rows for (v, _) in row) + 1
    E = sum(len(row) for row in rows)
    dc_max = max(len(row) for row in rows)
    cap = None if z_chunk else _pick_rowgroup(z, B, dc_max)
    state_est = resident_vmem_bytes(
        nb_v, nb_c, E, z, B, dtype, doubled=doubled,
        totals_f32=totals_f32,
    )
    if (cap is not None and cap > 6 and dc_max > 14
            and state_est > 90 * 10 ** 6):
        # measured: the dc=22 rate-5/6 construction fails the remote
        # compile at the chunk policy's cap 8 under VMEM pressure and
        # compiles at 6 (0.720 ms/iter)
        return 6
    if cap is None and not z_chunk and dc_max > 4 and z % 8 == 0:
        # measured boundary: the benchmark codes (E=540 base edges,
        # state 87.1 MB) compile and run UNGROUPED at both z=1800 and
        # z=360 — an earlier +48 MiB-headroom trigger silently grouped
        # them and cost ~8-10% (the round-5 "slow window" was partly
        # this); the DVB-S2 constructions (E=600-660, state
        # 93.2-98 MB) are the ones whose ungrouped temporaries
        # overflow (139.67 MB measured).  Threshold at the midpoint.
        if state_est > 90 * 10 ** 6:
            cap = 6 if dc_max > 14 else 4
    return cap


def resident_zpad(z: int) -> int:
    """Padded row count of the resident decode state when z is not
    8-sublane-aligned (e.g. z=450): every in-kernel ref access must be
    full-width on the sublane dim, so the HOST pads the state arrays to
    a 32-aligned row count (32 covers every state dtype's sublane tile:
    f32 8, bf16 16, int8 32) and the kernel trims/pads at value level.
    Returns z unchanged when already 8-aligned."""
    return z if z % 8 == 0 else -(-z // 32) * 32


def _split_row(dcr: int, cap: int | None):
    """Balanced (d0, d1) subgroup spans covering range(dcr)."""
    if cap is None or dcr <= cap:
        return [(0, dcr)]
    n = -(-dcr // cap)
    base, rem = divmod(dcr, n)
    spans, d0 = [], 0
    for i in range(n):
        d1 = d0 + base + (1 if i < rem else 0)
        spans.append((d0, d1))
        d0 = d1
    return spans


def resident_vmem_bytes(nb_v: int, nb_c: int, e_base: int, z: int, B: int,
                        dtype, *, doubled: bool = True,
                        totals_f32: bool = False) -> int:
    """Padded-VMEM model of the resident state (tile-padded dims).

    ``e_base`` counts BASE EDGES (= sum of check-block degrees; for a
    regular code nb_c * dc).  ``doubled`` stores totals [nb_v, 2z, B] so
    pass-1 rolled reads are single slices; ``totals_f32`` keeps totals at
    float32 regardless of the message dtype (the knee-quality hybrid)."""
    itemsize = jnp.dtype(dtype).itemsize
    tot_item = 4 if totals_f32 else itemsize
    sub = {2: 16, 4: 8}.get(itemsize, 8)
    tsub = {2: 16, 4: 8}.get(tot_item, 8)
    # unaligned z: the kernel allocates resident_zpad(z) (32-aligned)
    # rows for EVERY state buffer, not just the dtype's sublane tile —
    # model what is actually allocated so vlimit / fit checks match
    zr = resident_zpad(z)
    zp = -(-zr // sub) * sub
    ztp = -(-((2 * z) if doubled else zr) // tsub) * tsub
    zp8 = -(-zr // 32) * 32         # int8 syndrome tile
    bp = -(-B // 128) * 128
    total = nb_v * ztp * bp * tot_item
    msgs = (nb_v + e_base) * zp * bp * itemsize   # prior + flat c2v
    synd = nb_c * zp8 * bp
    return total + msgs + synd


def bp_decode_rounds_qc(rows, z: int, *, rule: str = "sumproduct",
                        k_rounds: int = 8, tiny: float = 1e-30,
                        interpret: bool = False, z_chunk: int | None = None,
                        phi_impl: str = "phi",
                        ms_alpha: float = MINSUM_ALPHA,
                        ms_beta: float = 0.0,
                        doubled: bool = False,
                        totals_f32: bool = False,
                        row_group: int | None = None):
    """Build the K-iteration VMEM-resident QC flooding kernel.

    Args:
      rows: per-check-block base-edge lists ``rows[cb] = [(vb, shift), ...]``
        (QCDecoder's convention).  Row lengths may DIFFER — irregular check
        degrees (the regime of real standard codes, e.g. the IRA-style
        DVB-S2 family the reference's flagship experiments use, reference:
        sims/display_biawgn.py:30-35 consumed by the fully general jagged
        decoder, qamreconciliation/decoder.pyx:60-89) unroll naturally: each
        check block's update is sized to its own degree, no padding waste.
      z: circulant size.
      rule: "sumproduct" | "minsum" (see ops/boxplus.py).
      k_rounds: BP iterations advanced per kernel call.
      interpret: Pallas interpreter (CPU tests).
      phi_impl: sum-product magnitude implementation — "phi" (the dense
        path's sign/phi form, f32-rounding-comparable to it) or "tanhfb"
        (tanh forward/backward products: exact same box-plus math at half
        the transcendental count; measured numbers in BASELINE.md).
      doubled: store totals [nb_v, 2z, B] (both halves identical) so every
        pass-1 rolled chunk read is ONE static slice instead of the
        two-slice+concat wraparound form (DESIGN.md round-4 lever 2).
        MEASURED SLOWER on the v5e (0.638 vs 0.584 ms/iter tanh-F/B at
        DVB-S2 scale): the extra per-chunk totals write in pass 2 costs
        more than the concats it removes.  Kept as an off-by-default
        option documenting the negative result.
      totals_f32: keep the running totals (and their accumulation) in
        float32 while messages stay at the storage dtype — the
        knee-quality hybrid (DESIGN.md round-4 lever 4).  Matches the
        dense path's ``totals_dtype="float32"`` numerics.
      row_group: max check-row slots handled per pass-1 subgroup.  Wide
        rows (irregular codes) are split into balanced subgroups merged
        with the ASSOCIATIVE factorization of each rule — phi sums add,
        P/Q tanh products multiply, mins min — via per-slot within-group
        partials staged in VMEM scratch, bounding the per-block register
        liveness by the cap instead of dc_max (the round-4 irregular
        spill; see :func:`_pick_rowgroup`).  ``None`` = auto policy; 0 =
        never split.  Min-sum grouping is bit-exact (min is associative,
        tie semantics preserved); phi/tanhfb grouping reassociates f32
        sums/products (the sum-product tier's existing tolerance).

    Returns ``step(it0, maxiter, total, c2v, prior, synd8, done, iters)
    -> (total, c2v, done, iters)`` advancing ``k_rounds`` flooding
    iterations.  Shapes: total [nb_v, z, B] (f32 when ``totals_f32``);
    prior [nb_v, z, B] storage dtype; c2v [E_base, z, B] storage dtype
    (FLAT row-major base-edge layout, rows concatenated); synd8
    [nb_c, z, B] int8; done/iters [8, B] int32 (sublane-replicated frame
    masks); it0/maxiter scalar int32 arrays of shape (1, 1).  Iterations
    with ``it0 + k >= maxiter`` are no-ops, so chunk overrun past maxiter
    is harmless.

    Convergence bookkeeping is FREEZE-instead-of-capture (round-4 lever
    3): pass 2 stops updating a frame's totals the iteration it converges,
    so the returned ``total`` IS the reference-exact final LLR array — the
    round-3 ``final`` buffer, its two DMAs and its per-iteration capture
    blend are gone.  Bit-identical to capture: frozen lanes' totals never
    change again and lanes are independent.
    """
    nb_c = len(rows)
    nb_v = max(v for row in rows for (v, _) in row) + 1
    degs = [len(row) for row in rows]
    dc_max = max(degs)
    e_off = [0]
    for d_ in degs:
        e_off.append(e_off[-1] + d_)
    E = e_off[-1]
    # reverse adjacency in scatter_partials' accumulation order (cb
    # ascending, slot ascending) so the bf16/f32 left-fold sums are
    # bit-identical to the XLA path (models/qc_decoder.scatter_partials)
    cols = [[] for _ in range(nb_v)]
    for cb, row in enumerate(rows):
        for d, (v, s) in enumerate(row):
            cols[v].append((e_off[cb] + d, s))

    def _read_rolled_chunk(slab_ref, s, j0, ZCk, span=z):
        """Rows [j0, j0+ZCk) of ``jnp.roll(slab, s, 0)`` read DIRECTLY from
        a [span, B] VMEM ref as one or two STATIC slices (Mosaic's
        tpu.dynamic_rotate only supports 32-bit element types; the
        circulant shifts are compile-time constants anyway).

        Materializing whole rolled [z, B] slabs as values made Mosaic keep
        dozens of them live across the unrolled block loop — 55 MB of
        register-allocator spill slots at DVB-S2 scale, an 11 MB VMEM OOM.
        roll(x, s)[j] = x[(j - s) % z], so the chunk is the contiguous
        (mod z) source window starting at (j0 - s) % z.  With ``span=2*z``
        (the doubled-totals buffer) the window never wraps: start <= z-1
        and ZCk <= z, so start + ZCk <= 2z-1 — always one slice.

        z % 8 != 0 (e.g. the z=450 N=16200 smoke shape): ANY ref slice
        whose sublane length is not the (physically padded) full dim or
        an 8-multiple is an illegal memref op on TPU — including a
        "full" [0:z] read of a z-row ref, whose memref is padded.  The
        whole state therefore rides zp = 32-aligned padded rows (padded
        host-side, see qc_decoder._build_resident), every ref access is
        full-width, and the roll happens at VALUE level: load [zp, B],
        trim to the z valid rows, static two-piece concat.  Only
        reachable in the whole-z chunk regime (step() rejects z % 8
        with nzc > 1), where the full-slab value is small enough not to
        re-enter the measured value-liveness spill regime of
        DVB-S2-scale slabs."""
        if not aligned:
            v = slab_ref[:][0:z]
            sh = s % z
            if sh == 0:
                return v
            return jnp.concatenate([v[z - sh:], v[:z - sh]], axis=0)
        start = (j0 - s) % z
        if start + ZCk <= span:
            return slab_ref[start:start + ZCk]
        head = slab_ref[start:span]
        return jnp.concatenate([head, slab_ref[0:start + ZCk - span]], axis=0)

    tot_dtype = jnp.float32 if totals_f32 else None  # None = storage dtype
    # zp: the padded row count of the whole resident state when z is not
    # 8-sublane-aligned (callers pad the HBM state arrays to match —
    # qc_decoder._build_resident); z itself when aligned.
    aligned = z % 8 == 0
    zp = resident_zpad(z)
    tot_span = 2 * z if doubled else zp

    def _make_kernel(ZC, nzc, cap, n_scr):
        def _grouped_row(cb, row, e0, grps, zc, sl, synd_i, pref,
                         total_s, c2v_s, viol_s, grp_s, grq_s):
            """Pass-1 check update of one WIDE row in dc-bounded subgroups
            (irregular codes — see ``row_group`` in the builder docstring).

            Phase A stages each subgroup's per-slot within-group partials in
            VMEM scratch (refs, not SSA values — so no [dcr, ZC, B] value
            chain stays live across groups, the register-spill hazard that
            motivates the split) plus the small per-group aggregates.
            Phase B merges with the rule's associative combine and writes
            c2v.  Slot signs are RECOMPUTED from the (unchanged) totals in
            phase B — three cheap VPU ops per slot — instead of staged,
            dodging both a second scratch buffer and a sign-of-zero packing
            hazard."""
            dtype = c2v_s.dtype

            def _read_group(d0, d1):
                t = jnp.stack([
                    _read_rolled_chunk(total_s.at[v], s, zc * ZC, ZC,
                                       span=tot_span)
                    for (v, s) in row[d0:d1]
                ]).astype(jnp.float32)                      # [dg, ZC, B]
                v2c = t - c2v_s[e0 + d0:e0 + d1, sl].astype(jnp.float32)
                return t, v2c

            par_t = None            # [ZC, B] totals-sign parity (conv test)
            par_v = None            # [ZC, B] v2c-sign parity
            fulls = []              # per-group aggregate for the merge
            for (d0, d1) in grps:
                t, v2c = _read_group(d0, d1)
                nt = jnp.sum((t < 0).astype(jnp.int32), axis=0)
                par_t = nt if par_t is None else par_t + nt
                nv = jnp.sum((v2c < 0).astype(jnp.int32), axis=0)
                par_v = nv if par_v is None else par_v + nv
                a = jnp.abs(v2c)
                if rule == "minsum":
                    # within-group all-but-one min (tie-correct); a
                    # singleton group's empty all-but-one is the 1e30
                    # sentinel — the exact neutral element of the merge
                    grp_s[d0:d1] = minsum_extrinsic_mag(a, 0)
                    fulls.append(jnp.min(a, axis=0))
                elif phi_impl == "tanhfb":
                    e_ = jnp.exp(-a)
                    pm = [1.0 - e_[d] for d in range(d1 - d0)]
                    qm = [1.0 + e_[d] for d in range(d1 - d0)]
                    Pi, Pf = _fb_allbutone_list(pm)
                    Qi, Qf = _fb_allbutone_list(qm)
                    grp_s[d0:d1] = jnp.stack(Pi)
                    grq_s[d0:d1] = jnp.stack(Qi)
                    fulls.append((Pf, Qf))
                else:
                    phim = phi_llr(a, tiny)
                    grp_s[d0:d1] = phim
                    fulls.append(jnp.sum(phim, axis=0))

            bad = ((par_t & 1) != synd_i).astype(jnp.int32)
            cnt = jnp.sum(bad, axis=0)
            viol_s[cb * nzc + zc] = jnp.broadcast_to(
                cnt[None, :], (8, cnt.shape[0])
            )
            par_all = (par_v & 1)[None]                     # [1, ZC, B]

            G = len(grps)
            if rule == "minsum":
                others = [
                    functools.reduce(
                        jnp.minimum, [fulls[h] for h in range(G) if h != g]
                    )
                    for g in range(G)
                ]
            elif phi_impl == "tanhfb":
                otherP = [
                    functools.reduce(
                        jnp.multiply,
                        [fulls[h][0] for h in range(G) if h != g],
                    )
                    for g in range(G)
                ]
                otherQ = [
                    functools.reduce(
                        jnp.multiply,
                        [fulls[h][1] for h in range(G) if h != g],
                    )
                    for g in range(G)
                ]
            else:
                s_all = functools.reduce(jnp.add, fulls)

            for g, (d0, d1) in enumerate(grps):
                _, v2c = _read_group(d0, d1)
                neg = (v2c < 0).astype(jnp.int32)
                if rule == "minsum":
                    mag = minsum_mag(
                        jnp.minimum(grp_s[d0:d1], others[g][None]),
                        ms_alpha, ms_beta,
                    )
                elif phi_impl == "tanhfb":
                    # same clamp as tanhfb_extrinsic_mag: P <= Q always
                    # (componentwise pm <= qm), Q <= 2^(dcr-1)
                    P = grp_s[d0:d1] * otherP[g][None]
                    Q = grq_s[d0:d1] * otherQ[g][None]
                    mag = jnp.log((Q + P) / jnp.maximum(Q - P, 6e-8 * Q))
                else:
                    mag = phi_llr(s_all[None] - grp_s[d0:d1], tiny)
                sign = (1 - 2 * jnp.bitwise_xor(par_all, neg)).astype(
                    jnp.float32
                )
                c2v_s[e0 + d0:e0 + d1, sl] = (
                    sign * pref * mag
                ).astype(dtype)

        def kernel(it0_ref, maxiter_ref, total_in, c2v_in, prior_in, synd_in,
                   done_in, iters_in,
                   total_out, c2v_out, done_out, iters_out,
                   total_s, c2v_s, prior_s, synd_s, done_s, iters_s,
                   viol_s, *scr):
            # optional row-group scratch (wide irregular rows only): per-slot
            # within-group partials — phi sums / min-sum all-but-one mins in
            # grp_s, the P and Q within-group all-but-one products of the
            # tanh-F/B factorization in (grp_s, grq_s)
            if n_scr == 2:
                grp_s, grq_s, sems = scr
            elif n_scr == 1:
                grp_s, sems = scr
                grq_s = None
            else:
                (sems,) = scr
                grp_s = grq_s = None
            dtype = c2v_s.dtype
            tdtype = total_s.dtype
            # ---- load state into VMEM (one DMA each; totals land in
            # both halves of the doubled buffer) ----
            # the partial-dim scratch slice is only needed for the
            # doubled-totals layout; undoubled uses the full ref — a
            # [:, 0:z] slice DMA requires z % 8 == 0 sublane alignment
            # (Mosaic rejects e.g. the z=450 smoke shape), while full-ref
            # DMAs carry any z
            tslab = total_s.at[:, 0:z] if doubled else total_s
            loads = [
                pltpu.make_async_copy(total_in, tslab, sems.at[0]),
                pltpu.make_async_copy(c2v_in, c2v_s, sems.at[1]),
                pltpu.make_async_copy(prior_in, prior_s, sems.at[2]),
                pltpu.make_async_copy(synd_in, synd_s, sems.at[3]),
            ]
            if doubled:
                loads.append(pltpu.make_async_copy(
                    total_in, total_s.at[:, z:2 * z], sems.at[4]
                ))
            for d_ in loads:
                d_.start()
            for d_ in loads:
                d_.wait()
            done_s[:] = done_in[:]
            iters_s[:] = iters_in[:]

            # unaligned-z (zp > z) ref access helpers: every ref access
            # stays full-width on the padded sublane dim, with the trim to
            # the z valid rows / the zero-pad back happening at VALUE
            # level (see _read_rolled_chunk's docstring).  Identity-cost
            # when aligned.
            def read_row(ref, i, sl):
                """ref[i, sl] ([len(sl), B])."""
                if aligned:
                    return ref[i, sl]
                return ref[i][0:z]

            def read_rows(ref, r0, r1, sl):
                """ref[r0:r1, sl] ([r1-r0, len(sl), B])."""
                if aligned:
                    return ref[r0:r1, sl]
                return ref[r0:r1][:, 0:z]

            def write_rows(ref, r0, r1, sl, val):
                if aligned:
                    ref[r0:r1, sl] = val
                else:
                    pad = jnp.zeros(
                        (val.shape[0], zp - z, val.shape[2]), val.dtype
                    )
                    ref[r0:r1] = jnp.concatenate([val, pad], axis=1)

            def write_row(ref, i, sl, val):
                if aligned:
                    ref[i, sl] = val
                else:
                    pad = jnp.zeros((zp - z, val.shape[1]), val.dtype)
                    ref[i] = jnp.concatenate([val, pad], axis=0)

            # dynamic trip count instead of a predicated body: iterations past
            # maxiter simply don't run (predicating the whole body with
            # @pl.when contributed to the register-spill blowup below)
            n_it = jnp.maximum(
                jnp.minimum(k_rounds, maxiter_ref[0, 0] - it0_ref[0, 0]), 0
            )

            def one_iteration(k, _):
                it = it0_ref[0, 0] + k

                # ---- pass 1: check phase (conv test + c2v update) ----
                # Each chunk-block writes its violation count into its OWN
                # viol_s slot: both a value-SSA accumulation chain and a
                # single read-modify-write ref made Mosaic keep every
                # chunk-block's parity intermediates live at once (measured
                # 31-85 MB of register spill slots -> VMEM OOM); independent
                # slot writes + one reduce at the end keep the blocks
                # schedulable in isolation.
                for cb, row in enumerate(rows):
                    e0 = e_off[cb]
                    dcr = len(row)
                    grps = _split_row(dcr, cap)
                    # circulant "gather": rolled chunks read straight from
                    # the VMEM ref (t[d, j] = total[vb, (j - s) % z], the
                    # same convention as qc_decoder.gather_totals); on the
                    # doubled buffer each read is a single static slice
                    for zc in range(nzc):
                        sl = slice(zc * ZC, (zc + 1) * ZC)
                        synd_i = read_row(synd_s, cb, sl).astype(jnp.int32)
                        pref = (1 - 2 * synd_i).astype(jnp.float32)[None]
                        if len(grps) > 1:
                            _grouped_row(cb, row, e0, grps, zc, sl,
                                         synd_i, pref, total_s, c2v_s,
                                         viol_s, grp_s, grq_s)
                            continue
                        t = jnp.stack([
                            _read_rolled_chunk(total_s.at[v], s, zc * ZC,
                                               ZC, span=tot_span)
                            for (v, s) in row
                        ]).astype(jnp.float32)             # [dcr, ZC, B]
                        neg_t = (t < 0).astype(jnp.int32)
                        parity = jnp.sum(neg_t, axis=0) & 1
                        bad = (parity != synd_i).astype(jnp.int32)
                        cnt = jnp.sum(bad, axis=0)          # [B]
                        viol_s[cb * nzc + zc] = jnp.broadcast_to(
                            cnt[None, :], (8, cnt.shape[0])
                        )
                        v2c = t - read_rows(c2v_s, e0, e0 + dcr, sl).astype(
                            jnp.float32
                        )
                        if rule == "minsum":
                            mag = minsum_mag(
                                minsum_extrinsic_mag(jnp.abs(v2c), 0),
                                ms_alpha, ms_beta,
                            )
                        elif phi_impl == "tanhfb":
                            # exact sum-product via the tanh forward/
                            # backward product factorization at HALF the
                            # transcendental count (shared source of
                            # truth: ops/boxplus.tanhfb_extrinsic_mag —
                            # lowers fine inside the kernel, like
                            # minsum_extrinsic_mag/phi_llr above)
                            mag = tanhfb_extrinsic_mag(jnp.abs(v2c), 0)
                        else:
                            phim = phi_llr(jnp.abs(v2c), tiny)
                            s_phi = jnp.sum(phim, axis=0, keepdims=True)
                            mag = phi_llr(s_phi - phim, tiny)
                        neg = (v2c < 0).astype(jnp.int32)
                        par = jnp.sum(neg, axis=0, keepdims=True) & 1
                        # NOTE (measured negative result): folding the
                        # syndrome prefactor into this XOR chain
                        # ((1-2*(par^neg^synd)) — bit-identical, one multiply
                        # saved) pushed Mosaic into the register-spill regime
                        # (72 MB of spill slots, VMEM OOM at 155 MB) — the
                        # same value-liveness hazard as DESIGN.md's resident
                        # rules 3/4.  Keep the float sign*pref product.
                        sign = (1 - 2 * jnp.bitwise_xor(par, neg)).astype(
                            jnp.float32
                        )
                        write_rows(c2v_s, e0, e0 + dcr, sl,
                                   (sign * pref * mag).astype(dtype))

                # ---- bookkeeping: iters / done ----
                conv = (jnp.sum(viol_s[:], axis=0) == 0).astype(
                    jnp.int32
                )                                           # [8, B]
                newly = conv * (1 - done_s[:])
                iters_s[:] = jnp.where(newly > 0, it, iters_s[:])
                done_s[:] = jnp.maximum(done_s[:], conv)
                frozen = done_s[0:1, :] > 0                 # [1, B]

                # ---- pass 2: variable update (totals from new c2v) ----
                # freeze-instead-of-capture: lanes whose frames are done
                # keep their totals — an unconditional vector select fused
                # into the writes pass 2 makes anyway (no extra buffer, no
                # data-dependent predication; see docstring)
                for vb in range(nb_v):
                    for zc in range(nzc):
                        sl = slice(zc * ZC, (zc + 1) * ZC)
                        # accumulate in f32 and round ONCE at the store:
                        # strictly fewer roundings than summing at bf16
                        # (mirrored by qc_decoder.scatter_partials so the
                        # dense/resident bit-parity tier holds)
                        acc = None
                        for (eidx, s) in cols[vb]:
                            slab = _read_rolled_chunk(
                                c2v_s.at[eidx], -s, zc * ZC, ZC
                            ).astype(jnp.float32)
                            acc = slab if acc is None else acc + slab
                        pr = read_row(prior_s, vb, sl).astype(jnp.float32)
                        new = (pr if acc is None else pr + acc).astype(tdtype)
                        val = jnp.where(frozen, read_row(total_s, vb, sl),
                                        new)
                        write_row(total_s, vb, sl, val)
                        if doubled:
                            total_s[vb, z + zc * ZC:z + (zc + 1) * ZC] = val

                return ()

            # NOTE (measured negative, round 5): wrapping this loop in a
            # data-dependent lax.while_loop carrying an all-done scalar
            # (in-kernel iteration-exact early exit) costs ~0.33 ms/iter
            # of cond overhead below threshold (headline 4220 -> 2371
            # fps) and broke the layered kernel's compile — dynamic
            # control around the big unrolled body re-enters the
            # round-3/4 hazard regime.  Early exit stays chunk-granular
            # (the outer XLA while between chunks).
            jax.lax.fori_loop(0, n_it, one_iteration, ())

            # ---- store state back (tslab: full ref unless doubled) ----
            stores = [
                pltpu.make_async_copy(tslab, total_out, sems.at[0]),
                pltpu.make_async_copy(c2v_s, c2v_out, sems.at[1]),
            ]
            for d_ in stores:
                d_.start()
            done_out[:] = done_s[:]
            iters_out[:] = iters_s[:]
            for d_ in stores:
                d_.wait()

        return kernel

    def step(it0, maxiter, total, c2v, prior, synd8, done, iters):
        dtype = c2v.dtype
        B = total.shape[-1]
        # row-group cap: auto grouping only picks a cap when it strictly
        # reduces the unrolled chunk count (so regular codes and small test
        # codes keep the exact ungrouped kernel); an explicit z_chunk pins
        # the chunking, so auto stays ungrouped there too
        if row_group is None:
            # chunk-count policy + VMEM-pressure fallback (see
            # auto_rowgroup — the pure, unit-tested decision)
            cap = auto_rowgroup(rows, z, B, dtype, doubled=doubled,
                                totals_f32=totals_f32, z_chunk=z_chunk)
        else:
            cap = int(row_group) or None
        if cap is not None and cap >= dc_max:
            cap = None
        if not aligned:
            # the grouped path's scratch slices assume aligned z; the
            # unaligned regime is whole-z-chunk anyway (no chunk-count
            # pressure for grouping to relieve)
            cap = None
        dc_eff = cap if cap is not None else dc_max
        ZC = z_chunk or _pick_zchunk(z, B=B, dc=dc_eff)
        if ZC is None or z % ZC:
            raise ValueError(
                f"no legal resident z-chunking for z={z}, B={B}"
            )
        nzc = z // ZC
        if z % 8 and nzc > 1:
            # unaligned z forces the whole-z value-roll read path (see
            # _read_rolled_chunk); chunked ref slices of non-8-multiple
            # length cannot be expressed
            raise ValueError(
                f"resident decode with z % 8 != 0 (z={z}) requires a "
                f"single whole-z chunk; got ZC={ZC}"
            )
        if doubled and z % 8:
            # the doubled buffer's [:, 0:z] / [:, z:2z] half-slice DMAs
            # need 8-sublane alignment (see the kernel's tslab note)
            raise ValueError(
                f"doubled totals require z % 8 == 0 (z={z}); use the "
                "default undoubled layout"
            )
        # cap is already forced < dc_max above, and the row attaining
        # dc_max always splits — so a non-None cap implies grouped rows
        grouped = cap is not None
        if grouped:
            n_scr = 2 if (rule != "minsum" and phi_impl == "tanhfb") else 1
            dc_scr = max(len(r) for r in rows if len(r) > cap)
        else:
            n_scr = 0
        kernel = _make_kernel(ZC, nzc, cap, n_scr)
        state_bytes = resident_vmem_bytes(
            nb_v, nb_c, E, z, B, dtype, doubled=doubled,
            totals_f32=totals_f32,
        )
        if grouped:
            # f32 row-group scratch, tile-padded like the state model
            zc_pad = -(-ZC // 8) * 8
            bp_ = -(-B // 128) * 128
            state_bytes += n_scr * dc_scr * zc_pad * bp_ * 4
        # 48 MiB headroom for Mosaic's per-block temporaries and spill
        # slots, capped at the v5e's 128 MiB: the z=360 IRA code (539
        # base edges, 90 block-rows) measured 125.95 MiB of scoped
        # allocation — 1 MiB over the previous 40 MiB-headroom limit,
        # comfortably under the hardware ceiling
        vlimit = min(int(state_bytes + 48 * 2**20), 128 * 2**20)
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem_spec = pl.BlockSpec(memory_space=_VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(total.shape, total.dtype),
                jax.ShapeDtypeStruct(c2v.shape, dtype),
                jax.ShapeDtypeStruct(done.shape, jnp.int32),
                jax.ShapeDtypeStruct(iters.shape, jnp.int32),
            ),
            in_specs=[smem_spec, smem_spec, any_spec, any_spec, any_spec,
                      any_spec, vmem_spec, vmem_spec],
            out_specs=(any_spec, any_spec, vmem_spec, vmem_spec),
            scratch_shapes=[
                pltpu.VMEM((nb_v, tot_span, B),
                           tot_dtype or dtype),           # total_s
                pltpu.VMEM((E, zp, B), dtype),            # c2v_s (flat)
                pltpu.VMEM((nb_v, zp, B), dtype),         # prior_s
                pltpu.VMEM((nb_c, zp, B), jnp.int8),      # synd_s
                pltpu.VMEM((8, B), jnp.int32),            # done_s
                pltpu.VMEM((8, B), jnp.int32),            # iters_s
                pltpu.VMEM((nb_c * nzc, 8, B), jnp.int32),  # viol_s
            ] + [
                # row-group scratch (wide irregular rows): per-slot
                # within-group partials, f32 (grp_s[, grq_s])
                pltpu.VMEM((dc_scr, ZC, B), jnp.float32)
                for _ in range(n_scr)
            ] + [
                pltpu.SemaphoreType.DMA((5,)),
            ],
            # total/c2v are donated in-place
            input_output_aliases={2: 0, 3: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vlimit
            ) if pltpu is not None and not interpret else None,
            interpret=interpret,
        )(it0, maxiter, total, c2v, prior, synd8, done, iters)

    return step


# --------------------------------------------------------------------- #
# VMEM-RESIDENT row-layered (serial-C) sweeps (late round 4).
#
# The XLA layered sweep is op-COUNT-bound on many-row codes: at the
# z=360 DVB-S2-lifting shape (90 check block-rows) its ~1080 small
# roll/static-add XLA ops cost 2.33-2.50 ms/sweep vs 0.73 at z=1800/18
# rows, and neither disjoint-row grouping (+7%) nor batched scatters
# (2.2x WORSE - TPU vector-index scatters) recover it (DESIGN.md,
# BASELINE.md).  This kernel runs K full serial-C sweeps per dispatch
# with the whole layered state resident in VMEM - totals (float32, the
# layered schedule's incremental acc dtype), flat c2v messages, int8
# syndrome - so every roll is a VALUE-level rotate of a full-z slab and
# every totals update is a full-ref read-modify-write: zero per-op XLA
# dispatch overhead and no partial-dim memref slices at all.
#
# Scope: the whole-z VALUE formulation keeps ~12 live [dc, z, B] f32
# temporaries per row body, so it is viable exactly in the many-row
# SMALL-z regime where the XLA sweep collapses (z*B <= ~64k lanes:
# z=360/B=128 yes, z=1800/B=128 no - use the XLA layered loop there,
# where it is already fast).  ``layered_resident_viable`` is the gate.
# Semantics mirror models/qc_decoder._build_layered's serial sweep
# bit-for-bit for min-sum (same row/edge order, same f32 delta
# accumulation; reference schedule semantics:
# qamreconciliation/decoder.pyx:424-433 per-sweep, serial-C extension).


def layered_resident_viable(rows, z: int, B: int) -> bool:
    """True when the whole-z value-rolled layered kernel fits the
    register/VMEM budget (see module comment): aligned z, and the
    per-row live-value footprint ~12 f32 [dc, z, B] temporaries within
    the measured ~32 MB safe budget."""
    dc_max = max(len(r) for r in rows)
    bp = -(-B // 128) * 128
    return z % 8 == 0 and 12 * dc_max * z * bp * 4 <= 32 * 2**20


def bp_layered_sweeps_qc(rows, z: int, *, rule: str = "sumproduct",
                         k_sweeps: int = 4, tiny: float = 1e-30,
                         interpret: bool = False,
                         phi_impl: str = "phi",
                         ms_alpha: float = MINSUM_ALPHA,
                         ms_beta: float = 0.0):
    """Build the K-sweep VMEM-resident serial-C layered kernel.

    Returns ``step(it0, maxiter, total, c2v, synd8, done, iters) ->
    (total, c2v, done, iters)`` advancing ``k_sweeps`` layered sweeps
    (sweeps past ``maxiter`` are no-ops).  Shapes: total [nb_v, z, B]
    float32 (the layered totals INCLUDE the prior - incremental
    schedule), c2v [E_base, z, B] storage dtype (flat row-major),
    synd8 [nb_c, z, B] int8, done/iters [8, B] int32
    (sublane-replicated).  Convergence (hard-decision syndrome test
    after EVERY sweep), per-sweep-exact ``iters``, and
    freeze-at-convergence (a done frame's totals never change, so the
    returned totals ARE the final LLRs) all run in-kernel, mirroring
    models/qc_decoder._build_layered's chunked while-loop semantics.
    """
    nb_c = len(rows)
    nb_v = max(v for row in rows for (v, _) in row) + 1
    degs = [len(row) for row in rows]
    e_off = [0]
    for d_ in degs:
        e_off.append(e_off[-1] + d_)
    E = e_off[-1]
    if z % 8:
        raise ValueError(
            f"resident layered requires z % 8 == 0 (z={z}); use the XLA "
            "layered loop"
        )

    def _val_roll(v, s):
        """VALUE-level roll by the static circulant shift (two-piece
        concat; vector ops carry any split point, unlike ref slices)."""
        sh = s % z
        if sh == 0:
            return v
        return jnp.concatenate([v[z - sh:], v[:z - sh]], axis=0)

    def _make_kernel():
        def kernel(it0_ref, maxiter_ref, total_in, c2v_in, synd_in,
                   done_in, iters_in,
                   total_out, c2v_out, done_out, iters_out,
                   total_s, c2v_s, synd_s, done_s, iters_s, viol_s, sems):
            dtype = c2v_s.dtype
            loads = [
                pltpu.make_async_copy(total_in, total_s, sems.at[0]),
                pltpu.make_async_copy(c2v_in, c2v_s, sems.at[1]),
                pltpu.make_async_copy(synd_in, synd_s, sems.at[2]),
            ]
            for d_ in loads:
                d_.start()
            for d_ in loads:
                d_.wait()
            done_s[:] = done_in[:]
            iters_s[:] = iters_in[:]

            n_it = jnp.maximum(
                jnp.minimum(k_sweeps, maxiter_ref[0, 0] - it0_ref[0, 0]), 0
            )

            def one_sweep(k, _):
                swp = it0_ref[0, 0] + k + 1
                frozen = done_s[0:1, :] > 0                 # [1, B]

                # ---- serial-C pass over the check block-rows ----
                for cb, row in enumerate(rows):
                    e0 = e_off[cb]
                    dcr = len(row)
                    t = jnp.stack([
                        _val_roll(total_s[v], s) for (v, s) in row
                    ])                                      # [dcr, z, B] f32
                    old = c2v_s[e0:e0 + dcr].astype(jnp.float32)
                    v2c = t - old
                    a = jnp.abs(v2c)
                    if rule == "minsum":
                        mag = minsum_mag(
                            minsum_extrinsic_mag(a, 0), ms_alpha, ms_beta
                        )
                    elif phi_impl == "tanhfb":
                        mag = tanhfb_extrinsic_mag(a, 0)
                    else:
                        phim = phi_llr(a, tiny)
                        s_phi = jnp.sum(phim, axis=0, keepdims=True)
                        mag = phi_llr(s_phi - phim, tiny)
                    neg = (v2c < 0).astype(jnp.int32)
                    par = jnp.sum(neg, axis=0, keepdims=True) & 1
                    sign = (1 - 2 * jnp.bitwise_xor(par, neg)).astype(
                        jnp.float32
                    )
                    synd_i = synd_s[cb].astype(jnp.int32)
                    pref = (1 - 2 * synd_i).astype(jnp.float32)[None]
                    stored = (sign * pref * mag).astype(dtype)
                    # delta of the STORED values keeps totals consistent
                    # with the rounded messages (mirrors the XLA sweep)
                    delta = stored.astype(jnp.float32) - old
                    for d, (v, s) in enumerate(row):
                        told = total_s[v]
                        tnew = told + _val_roll(delta[d], -s)
                        # freeze-at-convergence: done frames' totals
                        # never change (they ARE the final LLRs)
                        total_s[v] = jnp.where(frozen, told, tnew)
                    c2v_s[e0:e0 + dcr] = stored

                # ---- end-of-sweep convergence test (per-sweep exact) ----
                for cb, row in enumerate(rows):
                    bits = None
                    for (v, s) in row:
                        b = (_val_roll(total_s[v], s) < 0).astype(jnp.int32)
                        bits = b if bits is None else jnp.bitwise_xor(
                            bits, b
                        )
                    bad = (bits != synd_s[cb].astype(jnp.int32)).astype(
                        jnp.int32
                    )
                    cnt = jnp.sum(bad, axis=0)
                    viol_s[cb] = jnp.broadcast_to(
                        cnt[None, :], (8, cnt.shape[0])
                    )
                conv = (jnp.sum(viol_s[:], axis=0) == 0).astype(jnp.int32)
                newly = conv * (1 - done_s[:])
                iters_s[:] = jnp.where(newly > 0, swp, iters_s[:])
                done_s[:] = jnp.maximum(done_s[:], conv)
                return ()

            jax.lax.fori_loop(0, n_it, one_sweep, ())

            stores = [
                pltpu.make_async_copy(total_s, total_out, sems.at[0]),
                pltpu.make_async_copy(c2v_s, c2v_out, sems.at[1]),
            ]
            for d_ in stores:
                d_.start()
            done_out[:] = done_s[:]
            iters_out[:] = iters_s[:]
            for d_ in stores:
                d_.wait()

        return kernel

    def step(it0, maxiter, total, c2v, synd8, done, iters):
        dtype = c2v.dtype
        B = total.shape[-1]
        kernel = _make_kernel()
        state_bytes = (
            nb_v * z * (-(-B // 128) * 128) * 4
            + E * z * (-(-B // 128) * 128) * jnp.dtype(dtype).itemsize
            + nb_c * (-(-z // 32) * 32) * (-(-B // 128) * 128)
        )
        vlimit = min(int(state_bytes + 48 * 2**20), 128 * 2**20)
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem_spec = pl.BlockSpec(memory_space=_VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(total.shape, total.dtype),
                jax.ShapeDtypeStruct(c2v.shape, dtype),
                jax.ShapeDtypeStruct(done.shape, jnp.int32),
                jax.ShapeDtypeStruct(iters.shape, jnp.int32),
            ),
            in_specs=[smem_spec, smem_spec, any_spec, any_spec, any_spec,
                      vmem_spec, vmem_spec],
            out_specs=(any_spec, any_spec, vmem_spec, vmem_spec),
            scratch_shapes=[
                pltpu.VMEM((nb_v, z, B), jnp.float32),    # total_s
                pltpu.VMEM((E, z, B), dtype),             # c2v_s (flat)
                pltpu.VMEM((nb_c, z, B), jnp.int8),       # synd_s
                pltpu.VMEM((8, B), jnp.int32),            # done_s
                pltpu.VMEM((8, B), jnp.int32),            # iters_s
                pltpu.VMEM((nb_c, 8, B), jnp.int32),      # viol_s
                pltpu.SemaphoreType.DMA((3,)),
            ],
            input_output_aliases={2: 0, 3: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vlimit
            ) if pltpu is not None and not interpret else None,
            interpret=interpret,
        )(it0, maxiter, total, c2v, synd8, done, iters)

    return step
