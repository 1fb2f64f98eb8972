"""Round-5 campaign 3: knee-quality attempt #2 (VERDICT r4 item 4).

Round 4 attributed the bf16 knee-FER cost (0.581 vs f32's 0.417 at
3.5 dB) to c2v MESSAGE round-to-nearest bias and disproved the
f32-totals hybrid.  This campaign measures the two remaining levers on
the SAME code/seeds/protocol (QC(3,6) z=1800 seed 12345 — the round-4
knee table's exact config — 1024 frames, 3.5 dB, maxiter 50, Alternating
sign config, early exit disabled):

  1. stochastic rounding of the bf16 c2v stores (--sr-messages,
     ops/boxplus.stochastic_round_bf16) vs the round-to-nearest control
     on the same dense tanh-F/B path;
  2. the layered schedule at bf16 vs f32 (half the sweeps = half the
     rounding accumulation).

FER grids are congestion-immune (memory: tpu-tunnel-congestion), so this
can run any time.  One process, one warmup.

Usage: timeout 7200 python scripts/run_r5_knee.py > knee.jsonl 2> knee.log
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nbv", type=int, default=36)
    ap.add_argument("--snr", type=float, default=3.5)
    ap.add_argument("--simloops", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--maxiter", type=int, default=50)
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
        make_qc_ldpc, save_qc_csv,
    )
    from qamreconciliation_tpu.sims import sim_reconciliation as sr

    z = 64800 // args.nbv
    base, _, _ = make_qc_ldpc(args.nbv, z, dv=3, dc=6, seed=12345)
    code_csv = os.path.join(tempfile.gettempdir(), f"qc{args.nbv}_knee.csv")
    save_qc_csv(code_csv, base, z)

    grid = [
        # (name, extra argv)
        ("dense bf16 tanhfb RTN (control)",
         ["--dtype", "bfloat16", "--check-phi", "tanhfb"]),
        ("dense bf16 tanhfb SR",
         ["--dtype", "bfloat16", "--check-phi", "tanhfb",
          "--sr-messages"]),
        ("layered bf16", ["--dtype", "bfloat16", "--schedule", "layered"]),
        ("layered f32", ["--dtype", "float32", "--schedule", "layered"]),
        ("dense f32 (target)", ["--dtype", "float32"]),
    ]
    flt = [s for s in args.configs.split(",") if s]
    for name, extra in grid:
        if flt and not any(s in name for s in flt):
            continue
        out_csv = os.path.join(
            tempfile.gettempdir(),
            "knee_" + name.replace(" ", "_").replace("(", "").replace(
                ")", "") + ".csv",
        )
        argv = [code_csv, "--qc", "--out", out_csv,
                "--snr", str(args.snr), str(args.snr), "--nsnr", "1",
                "--simloops", str(args.simloops),
                "--batch", str(args.batch),
                "--maxiter", str(args.maxiter),
                "--ferr-count-min", "1000000000"] + extra
        t0 = time.perf_counter()
        try:
            sr.main(argv)
            import pandas as pd

            row = pd.read_csv(out_csv).iloc[0]
            out = {"config": name, "snr_dB": args.snr,
                   "frames": args.simloops,
                   "fer": float(row["fer"]), "ber": float(row["ber"]),
                   "iters": float(row["iters"]),
                   "wall_s": round(time.perf_counter() - t0, 1)}
        except Exception as e:
            out = {"config": name,
                   "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
