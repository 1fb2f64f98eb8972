"""Decode-only TPU probe: time ms/BP-iteration for a given decoder config.

Usage (one TPU experiment at a time, under timeout, in background):
    python scripts/probe_decode.py --batch 256 --qc 1 --pallas 1

Prints one JSON line with {ms_per_iter, decode_fps, compile_s, ...}.
Same workload as bench.py step 1 (random syndrome -> exactly maxiter
iterations; end every timed window with a device->host read, the only
true sync on the axon backend).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64800)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--qc", type=int, default=1)
    ap.add_argument("--pallas", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--maxiter", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--check", default="sumproduct",
                    choices=["sumproduct", "minsum"])
    ap.add_argument("--schedule", default="flooding",
                    choices=["flooding", "layered"])
    ap.add_argument("--resident", type=int, default=0)
    ap.add_argument("--phi", default="phi", choices=["phi", "tanhfb"])
    ap.add_argument("--resident-chunk", type=int, default=50)
    ap.add_argument("--totals-dtype", default="storage",
                    choices=["storage", "float32"])
    ap.add_argument("--resident-double", type=int, default=-1,
                    help="-1 auto, 0 off, 1 on")
    ap.add_argument("--zchunk", type=int, default=0, help="0 = auto")
    ap.add_argument("--ira", type=int, default=0,
                    help="1 = irregular QC-IRA code (bench.py's 1b config: "
                    "nb_info/nb_acc = nbv/2 each, dv=3 — mixed degrees)")
    ap.add_argument("--nbv", type=int, default=36,
                    help="variable BLOCKS; z = n/nbv.  nbv=180 probes the "
                    "true DVB-S2 shape regime (z=360, 90 check "
                    "block-rows) vs the default z=1800/18-row bench code")
    ap.add_argument("--rowgroup", type=int, default=-1,
                    help="resident_rowgroup: -1 auto, 0 off, >=2 cap")
    ap.add_argument("--layered-groups", type=int, default=-1,
                    help="layered schedule: -1 auto, 0 serial, 1 grouped")
    ap.add_argument("--layered-chunk", type=int, default=4,
                    help="layered sweeps per while-loop dispatch")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros((8, 8)) + 1)  # untimed first-op tunnel warmup

    dt = jnp.dtype(args.dtype)
    if args.n % args.nbv:
        sys.exit(f"--n {args.n} must be divisible by --nbv {args.nbv}")
    if args.ira and args.nbv % 2:
        sys.exit("--ira needs an even --nbv (nb_info = nb_acc = nbv/2)")
    if args.qc:
        from qamreconciliation_tpu.models.qc_decoder import (
            QCDecoder, make_qc_ldpc,
        )

        z = args.n // args.nbv
        if args.ira:
            from qamreconciliation_tpu.models.qc_decoder import make_qc_ira

            base, vid, cid = make_qc_ira(
                nb_info=args.nbv // 2, nb_acc=args.nbv // 2, z=z, dv=3,
                seed=12345,
            )
        else:
            base, vid, cid = make_qc_ldpc(args.nbv, z, dv=3, dc=6,
                                          seed=12345)
        dec = QCDecoder(base, z, dtype=dt, use_pallas=bool(args.pallas),
                        check_rule=args.check, schedule=args.schedule,
                        layered_chunk=args.layered_chunk,
                        layered_groups=(None if args.layered_groups < 0
                                        else bool(args.layered_groups)),
                        resident=bool(args.resident),
                        resident_chunk=args.resident_chunk,
                        resident_double=(None if args.resident_double < 0
                                         else bool(args.resident_double)),
                        resident_zchunk=args.zchunk or None,
                        resident_rowgroup=(None if args.rowgroup < 0
                                           else args.rowgroup),
                        totals_dtype=args.totals_dtype,
                        check_phi=args.phi)
    else:
        from qamreconciliation_tpu.models.decoder import Decoder
        from qamreconciliation_tpu.utils.edgefile import make_regular_ldpc

        vid, cid = make_regular_ldpc(args.n, dv=3, dc=6, seed=12345)
        dec = Decoder(vid, cid, dtype=dt, use_pallas=bool(args.pallas),
                      check_rule=args.check, check_phi=args.phi)

    rng = np.random.default_rng(0)
    lappr = jnp.asarray(rng.normal(0, 3.0, (args.n, args.batch)), dt)
    synd = jnp.asarray(
        rng.integers(0, 2, (dec.cnum, args.batch)), jnp.int32
    )
    f = dec._build_decode()
    t0 = time.perf_counter()
    out = f(lappr, synd, jnp.int32(args.maxiter))
    np.asarray(out[1])
    compile_s = time.perf_counter() - t0
    print(f"compile+first: {compile_s:.1f}s", file=sys.stderr, flush=True)
    rep_ms = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = f(lappr, synd, jnp.int32(args.maxiter))
        np.asarray(out[1])
        rep_ms.append((time.perf_counter() - t0) * 1e3)
    # min over reps: robust to the tunnel's erratic per-dispatch spikes
    ms_iter = min(rep_ms) / args.maxiter
    extras = {}
    if args.qc and args.resident:
        dbl, tf32 = dec._resident_layout(args.batch)
        extras = {"resident_double": dbl, "totals_f32": tf32}
    print(json.dumps({
        "n": args.n, "nbv": args.nbv, "batch": args.batch, "qc": args.qc,
        "pallas": args.pallas, "dtype": args.dtype, "check": args.check,
        "schedule": args.schedule, "resident": args.resident,
        "phi": args.phi, "resident_chunk": args.resident_chunk,
        "totals_dtype": args.totals_dtype,
        "ms_per_iter": round(ms_iter, 3),
        "decode_fps": round(args.batch / (ms_iter * args.maxiter) * 1e3, 1),
        "compile_s": round(compile_s, 1),
        **extras,
    }))


if __name__ == "__main__":
    main()
