"""Round-5 campaign 2: MC mutual-information throughput attribution
(VERDICT r4 item 6).  One process, shared warmup.

The single-mapper MC estimator froze at round-2's 894.8k samples/s
(BASELINE config 5) with no profile of where the time goes.  This grid
times montecarlo_information at bps=2 (and one bps=4 row) across the
available math modes and the which-mask ablations that attribute the
cost between the sampling preamble (sample -> AWGN -> hard-decide ->
map_noise), the closed-form estimators, and the I(X,N;Xhat) candidate
machinery.

Usage: timeout 5400 python scripts/run_r5_mi_grid.py > mi.jsonl 2> mi.log
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 21)
    ap.add_argument("--snr", type=float, default=8.0)
    ap.add_argument("--reps", type=int, default=3)
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

    from qamreconciliation_tpu.models.alphabet import PAMAlphabet
    from qamreconciliation_tpu.models.mutual_information import (
        P_xhat, montecarlo_information,
    )
    from qamreconciliation_tpu.models.noisemapper import NoiseMapper

    def run(name, bps, which, ginv, fy, n=None):
        n = n or args.n
        try:
            pa = PAMAlphabet(bps, 2)
            Es = pa.variance
            N0 = Es * (10.0 ** (-args.snr / 10.0)) / 2.0
            nm = NoiseMapper(pa, N0, dtype=np.float32, fy_mode=fy)
            if ginv == "poly":
                nm._ensure_ginv_poly()
            if fy == "poly":
                nm._ensure_fy_poly()
            p_Xhat = P_xhat(nm)
            key = jax.random.key(0)
            t0 = time.perf_counter()
            montecarlo_information(key, pa, nm, p_Xhat, n, which=which,
                                   ginv_mode=ginv)
            compile_s = time.perf_counter() - t0
            ts = []
            for r in range(args.reps):
                t1 = time.perf_counter()
                montecarlo_information(
                    jax.random.fold_in(key, r), pa, nm, p_Xhat, n,
                    which=which, ginv_mode=ginv,
                )
                ts.append(time.perf_counter() - t1)
            out = {
                "config": name, "bps": bps, "which": list(which),
                "ginv": ginv, "fy": fy, "n": n,
                "compile_s": round(compile_s, 1),
                "rep_s": [round(t, 3) for t in ts],
                "samples_per_s": round(n / min(ts), 1),
            }
        except Exception as e:
            out = {"config": name,
                   "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(out), flush=True)

    W = (True, True, True)
    run("r2-baseline interp/erf", 2, W, "interp", "erf")
    run("cli-default poly/erf", 2, W, "poly", "erf")
    run("poly/poly", 2, W, "poly", "poly")
    run("no-IXN (preamble+closed)", 2, (True, True, False), "poly", "erf")
    run("only-IXN", 2, (False, False, True), "poly", "erf")
    run("only-IXXhat (preamble floor)", 2, (True, False, False),
        "poly", "erf")
    run("bps4 default", 4, W, "poly", "erf", n=1 << 19)


if __name__ == "__main__":
    main()
