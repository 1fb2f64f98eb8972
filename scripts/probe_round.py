"""TPU cost breakdown of the full engine softening round (bench workload).

Times (a) the syndrome gather alone, (b) preamble+syndrome (no decode),
(c) the full round_fn, (d) the decode closure alone — so
round - decode - preamble(+synd) exposes the counting/overhead residue.

Usage: python scripts/probe_round.py --bps 4   (background, under timeout)
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
    ap.add_argument("--bps", type=int, default=4)
    ap.add_argument("--snr", type=float, default=None)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--maxiter", type=int, default=50)
    args = ap.parse_args()
    snr = args.snr if args.snr is not None else (3.5 if args.bps == 2 else 10.0)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qamreconciliation_tpu.models.alphabet import PAMAlphabet
    from qamreconciliation_tpu.models.matrix import Matrix
    from qamreconciliation_tpu.models.noisemapper import NoiseMapper
    from qamreconciliation_tpu.models.qc_decoder import QCDecoder, make_qc_ldpc
    from qamreconciliation_tpu.sims.engine import ReconciliationEngine

    np.asarray(jnp.zeros((8, 8)) + 1)  # untimed tunnel warmup

    dt = jnp.dtype(args.dtype)
    z = args.n // 36
    base, vid, cid = make_qc_ldpc(36, z, dv=3, dc=6, seed=12345)
    dec = QCDecoder(base, z, dtype=dt)
    mat = Matrix(vid, cid)
    pa = PAMAlphabet(args.bps, 2.0)
    eng = ReconciliationEngine(dec, mat, pa, batch=args.batch, dtype=dt,
                               llr_mode="poly")
    Es = pa.variance
    N0 = Es * (10.0 ** (-snr / 10.0)) / 2.0
    nm = NoiseMapper(pa, N0, np.zeros(pa.order, np.uint8), dtype=dt)
    nm._ensure_llr_poly()
    sig = jnp.asarray(float(np.sqrt(N0)), dt)
    alp = jnp.asarray(1.0, dt)
    key = jax.random.key(0)
    B = args.batch

    rng = np.random.default_rng(0)
    word = jnp.asarray(rng.integers(0, 2, (eng.N, B)), jnp.int32)

    def timeit(name, fn, *fargs):
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        out = jf(*fargs)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:4])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jf(*fargs)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:4])
        ms = (time.perf_counter() - t0) / args.reps * 1000.0
        print(json.dumps({"stage": name, "bps": args.bps, "ms": round(ms, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    # (a) generic syndrome gather alone
    timeit("syndrome_from_bits", dec.graph.syndrome_from_bits, word)

    # (b) preamble + syndrome, no decode
    body = eng._build_round_body("softening")

    def preamble_synd(key, nm, sigma, alpha):
        # replicate round_fn up to the decode call
        s2b = jnp.asarray(pa.s_to_b.astype(np.int32))
        kx, kn = jax.random.split(key)
        x = pa.random_symbols(kx, (eng.N_symb, B))
        y = pa.index_to_value(x, dt) + sigma.astype(dt) * jax.random.normal(
            kn, (eng.N_symb, B), dt)
        x_hat = nm.hard_decide_index(y)
        n_hat = nm.map_noise(y, x_hat)
        w = eng._bits_nb(lambda b, idx: s2b[:, b][idx], x_hat)
        llr_bits = nm._poly_llr_bits(n_hat, x)
        lappr = alpha.astype(dt) * eng._bits_nb(
            lambda b, _: llr_bits[b], x_hat)
        synd = dec.graph.syndrome_from_bits(w.astype(jnp.int32))
        return lappr, synd

    timeit("preamble+synd", preamble_synd, key, nm, sig, alp)

    # (c) full round
    timeit("full_round", body, key, jnp.int32(args.maxiter), nm, sig, alp)

    # (d) decode alone
    f = dec._build_decode()
    lappr = jnp.asarray(rng.normal(0, 3.0, (eng.N, B)), dt)
    synd = jnp.asarray(rng.integers(0, 2, (dec.cnum, B)), jnp.int32)
    timeit("decode_only", lambda l, s: f(l, s, jnp.int32(args.maxiter)),
           lappr, synd)


if __name__ == "__main__":
    main()
