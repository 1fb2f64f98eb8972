"""Decompose the QC BP iteration cost on the real TPU.

Times two jitted 50-step loops that isolate the two halves of the QC
decode body (models/qc_decoder.py):

  rolls: gather_totals (E rolls) + scatter_partials (E rolls + adds) +
         prior add — the circulant data-movement half.
  check: the fused Pallas check phase (or XLA check update) on fixed-shape
         messages — the arithmetic half.

Each loop carries a data dependency so XLA cannot hoist or elide the body.
One TPU experiment at a time; end every timed window with a host read.

Usage: python scripts/probe_qc_parts.py --part rolls|check --batch 128
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["rolls", "check"], required=True)
    ap.add_argument("--n", type=int, default=64800)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--pallas", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros((8, 8)) + 1)  # untimed first-op tunnel warmup

    from qamreconciliation_tpu.models.qc_decoder import (
        QCDecoder, make_qc_ldpc,
    )

    dt = jnp.dtype(args.dtype)
    z = args.n // 36
    base, _, _ = make_qc_ldpc(36, z, dv=3, dc=6, seed=12345)
    dec = QCDecoder(base, z, dtype=dt, use_pallas=bool(args.pallas))
    nb_c, nb_v, dc = dec.nb_c, dec.nb_v, dec.dc
    B = args.batch
    rows = dec._rows

    rng = np.random.default_rng(0)
    synd = jnp.asarray(rng.integers(0, 2, (nb_c, z, B)), jnp.int32)
    prior = jnp.asarray(rng.normal(0, 3.0, (nb_v, z, B)), dt)

    def gather_totals(total):
        return jnp.stack([
            jnp.stack([jnp.roll(total[v], s, axis=0) for (v, s) in row])
            for row in rows
        ])

    def scatter_partials(c2v):
        acc = [None] * nb_v
        for cb, row in enumerate(rows):
            for d, (v, s) in enumerate(row):
                slab = jnp.roll(c2v[cb, d], -s, axis=0)
                acc[v] = slab if acc[v] is None else acc[v] + slab
        return jnp.stack(acc)

    if args.part == "rolls":
        def body(_, total):
            t = gather_totals(total)
            return prior + scatter_partials(t * jnp.asarray(0.33, dt))

        fn = jax.jit(lambda x: jax.lax.fori_loop(0, args.iters, body, x))
        arg = prior
    else:
        from qamreconciliation_tpu.ops.pallas_kernels import bp_check_phase_qc

        t0_arr = jnp.asarray(rng.normal(0, 3.0, (nb_c, dc, z, B)), dt)
        if args.pallas:
            def body(_, c2v):
                c2v_new, viol = bp_check_phase_qc(
                    t0_arr + c2v * jnp.asarray(0.01, dt), c2v,
                    synd, interpret=False,
                )
                return c2v_new
        else:
            def qc_check_update(v2c):
                from qamreconciliation_tpu.ops.boxplus import phi_llr

                out_dtype = v2c.dtype
                if out_dtype == jnp.bfloat16:
                    v2c = v2c.astype(jnp.float32)
                phim = phi_llr(jnp.abs(v2c), 1e-30)
                s_phi = jnp.sum(phim, axis=1, keepdims=True)
                mag = phi_llr(s_phi - phim, 1e-30)
                neg = (v2c < 0).astype(jnp.int32)
                parity = jnp.sum(neg, axis=1, keepdims=True) & 1
                sign = (1 - 2 * jnp.bitwise_xor(parity, neg)).astype(v2c.dtype)
                pref = (1 - 2 * synd).astype(v2c.dtype)[:, None]
                return (sign * pref * mag).astype(out_dtype)

            def body(_, c2v):
                return qc_check_update(
                    t0_arr + c2v * jnp.asarray(0.01, dt) - c2v
                )

        fn = jax.jit(lambda x: jax.lax.fori_loop(0, args.iters, body, x))
        arg = jnp.zeros((nb_c, dc, z, B), dt)

    t0 = time.perf_counter()
    out = fn(arg)
    np.asarray(out[0, 0, :2] if out.ndim > 2 else out[0, :2])
    compile_s = time.perf_counter() - t0
    print(f"compile+first: {compile_s:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(arg)
        np.asarray(out[0, 0, :2] if out.ndim > 2 else out[0, :2])
    ms_iter = (time.perf_counter() - t0) / args.reps / args.iters * 1e3
    print(json.dumps({
        "part": args.part, "batch": B, "pallas": args.pallas,
        "dtype": args.dtype, "ms_per_iter": round(ms_iter, 3),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
