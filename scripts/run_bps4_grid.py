"""16-PAM mode/fy-mode throughput grid in ONE process (one tunnel warmup).

Round-4 protocol for the BASELINE config-4 rows: two near-identical SNR
points per config (the first absorbs the compile, the SECOND is the clean
throughput number), 4096 frames at RPD=4, early exit disabled, so the
reported frames/s for point 2 is 8 amortized dispatches of pure round
work.  Configs: softening x {erf, erf_flat, poly} fy modes, soft direct
(layout-native), hard reverse — all min-sum bf16 so differences isolate
the PREAMBLE.

Usage (one TPU experiment at a time, under timeout, in background):
    python scripts/run_bps4_grid.py [--snr 12.0] [--simloops 4096]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snr", type=float, default=12.0)
    ap.add_argument("--simloops", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    from qamreconciliation_tpu.models.qc_decoder import (
        make_qc_ldpc, save_qc_csv,
    )
    from qamreconciliation_tpu.sims import sim_reconciliation as sr

    z = 1800
    base, _, _ = make_qc_ldpc(36, z, dv=3, dc=6, seed=12345)
    code_csv = os.path.join(tempfile.gettempdir(), "qc36_64800.csv")
    save_qc_csv(code_csv, base, z)

    common = [code_csv, "--qc", "--snr", str(args.snr),
              str(args.snr + 0.01), "--nsnr", "2",
              "--simloops", str(args.simloops),
              "--batch", str(args.batch), "--maxiter", "50",
              "--bps", "4", "--dtype", "bfloat16",
              "--check-rule", "minsum", "--rounds-per-dispatch", "4",
              "--ferr-count-min", "1000000000"]
    configs = [
        ("soft-erf", ["--fy-mode", "erf"]),
        ("soft-erf_flat", ["--fy-mode", "erf_flat"]),
        ("soft-poly", ["--fy-mode", "poly"]),
        ("direct", ["--direct"]),
        ("hard", ["--hard"]),
    ]
    for name, extra in configs:
        out = os.path.join(tempfile.gettempdir(), f"bps4_{name}.csv")
        print(f"=== {name} ===", file=sys.stderr, flush=True)
        sr.main(common + ["--out", out] + extra)


if __name__ == "__main__":
    main()
