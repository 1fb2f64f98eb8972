"""Is the fused QC check-phase kernel VPU-bound (phi transcendentals) or
HBM/DMA-bound?  Times a 50-step jitted loop over kernel variants with the
SAME block specs / memory pattern but different slot math:

  phi    — the production sum-product kernel (baseline),
  copy   — out = t - c2v (no transcendentals: the memory-system floor),
  minsum — normalized min-sum (min1/min2 + sign product, no phi).

Usage: python scripts/probe_check_math.py --math copy   (one at a time,
under timeout, in background; each variant is its own compile).
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--math", choices=["phi", "copy", "minsum"],
                    required=True)
    ap.add_argument("--n", type=int, default=64800)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    np.asarray(jnp.zeros((8, 8)) + 1)  # untimed tunnel warmup

    from qamreconciliation_tpu.ops.boxplus import phi_llr
    from qamreconciliation_tpu.ops.pallas_kernels import _VMEM, _pick_zb

    dt = jnp.dtype(args.dtype)
    nb_c, dc, B = 18, 6, args.batch
    z = args.n // 36
    ZB = _pick_zb(z, B=B, dc=dc)

    def kernel(t_ref, c2v_ref, synd_ref, out_ref, viol_ref):
        out_dtype = t_ref.dtype
        compute = jnp.float32
        t = t_ref[:].astype(compute)
        synd = synd_ref[:].astype(jnp.int32)
        neg_t = (t < 0).astype(jnp.int32)
        parity = jnp.sum(neg_t, axis=1) & 1
        viol = (parity != synd).astype(jnp.int32)
        count = jnp.sum(viol.reshape(-1, viol.shape[-1]), axis=0)
        viol_ref[0, 0] = jnp.broadcast_to(count[None, :], (8, count.shape[0]))
        v2c = t - c2v_ref[:].astype(compute)
        if args.math == "copy":
            out_ref[:] = v2c.astype(out_dtype)
            return
        neg = (v2c < 0).astype(jnp.int32)
        par = jnp.sum(neg, axis=1, keepdims=True) & 1
        sign = (1 - 2 * jnp.bitwise_xor(par, neg)).astype(compute)
        pref = jnp.expand_dims((1 - 2 * synd).astype(compute), 1)
        if args.math == "minsum":
            m = jnp.abs(v2c)
            min1 = jnp.min(m, axis=1, keepdims=True)
            big = jnp.where(m <= min1, jnp.float32(1e30), m)
            min2 = jnp.min(big, axis=1, keepdims=True)
            mag = 0.8125 * jnp.where(m <= min1, min2, min1)
        else:
            phim = phi_llr(jnp.abs(v2c), 1e-30)
            s_phi = jnp.sum(phim, axis=1, keepdims=True)
            mag = phi_llr(s_phi - phim, 1e-30)
        out_ref[:] = (sign * pref * mag).astype(out_dtype)

    nzb = z // ZB

    def phase(t, c2v, synd):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((nb_c, dc, z, B), t.dtype),
                jax.ShapeDtypeStruct((nb_c, nzb, 8, B), jnp.int32),
            ),
            grid=(nb_c, nzb),
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
        )(t, c2v, synd)

    @jax.jit
    def loop(t, c2v, synd):
        def body(i, carry):
            t_c, c2v_c = carry
            out, viol = phase(t_c, c2v_c, synd)
            # data dependency so the loop body cannot be hoisted
            return (t_c + 0.001 * out, out)

        return jax.lax.fori_loop(0, args.iters, body, (t, c2v))

    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(0, 3, (nb_c, dc, z, B)), dt)
    c2v = jnp.asarray(rng.normal(0, 1, (nb_c, dc, z, B)), dt)
    synd = jnp.asarray(rng.integers(0, 2, (nb_c, z, B)), jnp.int32)

    t0 = time.perf_counter()
    out = loop(t, c2v, synd)
    np.asarray(out[0].reshape(-1)[:4])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = loop(t, c2v, synd)
    np.asarray(out[0].reshape(-1)[:4])
    ms = (time.perf_counter() - t0) / args.reps / args.iters * 1000.0
    print(json.dumps({"math": args.math, "zb": ZB, "dtype": args.dtype,
                      "ms_per_iter": round(ms, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
