"""Round-5 campaign 4: sum-product resident tuning at z=360 (VERDICT r4
item 8: decode_ms_per_iter <= 0.48) + rate-3/4 rowgroup-fix validation
(item 3).  One process, shared warmup, min-over-reps protocol.

Configs (QC codes at N=64800, z=360, B=128, bf16 unless noted):
  - regular (3,6) sum-product resident: tree-F/B baseline (round-5
    boxplus.fb_allbutone_list), chunk 50 vs 250 (chunk-boundary share),
    phi_impl=phi control, minsum control (window calibration vs
    campaign 1's 0.383);
  - rate-1/2 IRA irregular resident (tree-F/B);
  - rate-3/4 IRA resident with the round-5 rowgroup policy (cap 8 at
    dc=17 — the bench fallback was a remote Mosaic compile failure on
    the ungrouped ZC=180 kernel).

Usage: timeout 7200 python scripts/run_r5_sp_grid.py > sp.jsonl 2> sp.log
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
    ap.add_argument("--nbv", type=int, default=180)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--probe-iters", type=int, default=250)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--configs", default="",
                    help="substring filter on config names")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    t0 = time.perf_counter()
    np.asarray(jnp.zeros((8, 8)) + 1)
    print(f"warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)

    from qamreconciliation_tpu.models.qc_decoder import (
        QCDecoder, make_qc_ira, make_qc_ldpc,
    )

    z = args.n // args.nbv
    B = args.batch
    reg, _, _ = make_qc_ldpc(args.nbv, z, dv=3, dc=6, seed=12345)
    ira, _, _ = make_qc_ira(nb_info=args.nbv // 2, nb_acc=args.nbv // 2,
                            z=z, dv=3, seed=12345)
    r34, _, _ = make_qc_ira(nb_info=3 * args.nbv // 4,
                            nb_acc=args.nbv // 4, z=z, dv=3, seed=12345)
    rng = np.random.default_rng(0)
    flt = [s for s in args.configs.split(",") if s]

    def probe(name, base, **kw):
        if flt and not any(s in name for s in flt):
            return
        try:
            dec = QCDecoder(base, z, dtype=jnp.bfloat16, **kw)
            lappr = jnp.asarray(rng.normal(0, 3.0, (dec.vnum, B)),
                                jnp.bfloat16)
            synd = jnp.asarray(rng.integers(0, 2, (dec.cnum, B)),
                               jnp.int32)
            f = dec._build_decode()
            t0 = time.perf_counter()
            o = f(lappr, synd, jnp.int32(args.probe_iters))
            np.asarray(o[1])
            compile_s = time.perf_counter() - t0
            ms = []
            for _ in range(args.reps):
                t1 = time.perf_counter()
                o = f(lappr, synd, jnp.int32(args.probe_iters))
                np.asarray(o[1])
                ms.append((time.perf_counter() - t1) * 1e3)
            from qamreconciliation_tpu.ops.pallas_kernels import (
                _pick_rowgroup,
            )

            out = {
                "config": name, "z": z, "batch": B,
                "dc": sorted({len(r) for r in dec._rows}),
                "rowgroup": (_pick_rowgroup(z, B, dec.dc)
                             if kw.get("resident") else None),
                "compile_s": round(compile_s, 1),
                "ms_per_iter": round(min(ms) / args.probe_iters, 4),
                "reps_ms_per_iter": [
                    round(m / args.probe_iters, 4) for m in ms
                ],
            }
        except Exception as e:
            out = {"config": name,
                   "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(out), flush=True)

    probe("rate34 resident rowgroup-fix", r34, check_rule="sumproduct",
          resident=True, resident_chunk=50)
    probe("rate34 resident minsum", r34, check_rule="minsum",
          resident=True, resident_chunk=50)
    probe("sp reg tree c50", reg, check_rule="sumproduct", resident=True,
          resident_chunk=50)
    probe("sp reg tree c250", reg, check_rule="sumproduct", resident=True,
          resident_chunk=250)
    probe("sp reg phi c50", reg, check_rule="sumproduct", resident=True,
          resident_chunk=50, resident_phi="phi")
    probe("minsum reg control c50", reg, check_rule="minsum",
          resident=True, resident_chunk=50)
    probe("sp ira tree c50", ira, check_rule="sumproduct", resident=True,
          resident_chunk=50)
    probe("sp reg layered-resident", reg, check_rule="sumproduct",
          schedule="layered", resident=True)


if __name__ == "__main__":
    main()
