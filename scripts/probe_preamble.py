"""Stage-by-stage TPU cost breakdown of the softening round preamble.

Times cumulative jitted programs (sample -> +hard_decide -> +map_noise ->
+word bits -> +poly LLR -> full preamble incl. lappr assembly) so the
incremental cost of each stage is the difference of adjacent rows.  Same
[S, B] layout and shapes as the engine's layout-native softening round
(sims/engine.py:200-213).  One JSON line per stage on stdout.

Usage (one TPU experiment at a time, under timeout, in background):
    python scripts/probe_preamble.py --bps 4
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64800)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bps", type=int, default=2)
    ap.add_argument("--snr", type=float, default=None)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--fy-mode", default="erf",
                    choices=["erf", "erf_flat", "poly"])
    args = ap.parse_args()
    snr = args.snr if args.snr is not None else (3.5 if args.bps == 2 else 10.0)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qamreconciliation_tpu.models.alphabet import PAMAlphabet
    from qamreconciliation_tpu.models.noisemapper import NoiseMapper

    np.asarray(jnp.zeros((8, 8)) + 1)  # untimed first-op tunnel warmup

    dt = jnp.dtype(args.dtype)
    pa = PAMAlphabet(args.bps, 2.0)
    Es = pa.variance
    N0 = Es * (10.0 ** (-snr / 10.0)) / 2.0
    sigma = math.sqrt(N0)
    nm = NoiseMapper(pa, N0, dtype=dt, fy_mode=args.fy_mode)
    nm._ensure_llr_poly()
    if args.fy_mode == "poly":
        nm._ensure_fy_poly()
    S = args.n // args.bps
    B = args.batch
    s2b = jnp.asarray(pa.s_to_b.astype(np.int32))
    bps = args.bps

    def sample(key, sigma):
        kx, kn = jax.random.split(key)
        x = pa.random_symbols(kx, (S, B))
        y = pa.index_to_value(x, dt) + sigma.astype(dt) * jax.random.normal(
            kn, (S, B), dt
        )
        return x, y

    def stage_sample(key, nm, sigma):
        x, y = sample(key, sigma)
        return y

    def stage_hard(key, nm, sigma):
        x, y = sample(key, sigma)
        return nm.hard_decide_index(y).astype(dt) + y

    def stage_noise(key, nm, sigma):
        x, y = sample(key, sigma)
        x_hat = nm.hard_decide_index(y)
        return nm.map_noise(y, x_hat)

    def stage_word(key, nm, sigma):
        x, y = sample(key, sigma)
        x_hat = nm.hard_decide_index(y)
        n_hat = nm.map_noise(y, x_hat)
        word = jnp.concatenate([s2b[:, b][x_hat] for b in range(bps)], axis=0)
        return n_hat + word.astype(dt)[:S]

    def stage_llr(key, nm, sigma):
        x, y = sample(key, sigma)
        x_hat = nm.hard_decide_index(y)
        n_hat = nm.map_noise(y, x_hat)
        word = jnp.concatenate([s2b[:, b][x_hat] for b in range(bps)], axis=0)
        llr_bits = nm._poly_llr_bits(n_hat, x)
        lappr = jnp.concatenate(llr_bits, axis=0)
        return lappr + word.astype(dt)

    stages = [
        ("sample", stage_sample),
        ("+hard_decide", stage_hard),
        ("+map_noise", stage_noise),
        ("+word_bits", stage_word),
        ("+poly_llr(full)", stage_llr),
    ]
    key = jax.random.key(0)
    sig = jnp.asarray(sigma, dt)
    for name, fn in stages:
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        out = jf(key, nm, sig)
        np.asarray(out.reshape(-1)[:4])  # true sync: device->host read
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jf(key, nm, sig)
        np.asarray(out.reshape(-1)[:4])
        ms = (time.perf_counter() - t0) / args.reps * 1000.0
        print(
            json.dumps(
                {
                    "stage": name,
                    "bps": bps,
                    "fy_mode": args.fy_mode,
                    "ms": round(ms, 3),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
