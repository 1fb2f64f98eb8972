"""Sign-configuration comparison sweep CLI.

Mirrors the reference (reference: sims/sim_mutual_information_compare_signs.py):
enumerate all monotonicity sign configurations up to flip-reversal symmetry
(config_count = 2^(M/2-1) * (2^(M/2)+1) kept configs out of 2^M) and evaluate
I(X,N;Xhat) for each, analytically (quad) or by Monte-Carlo.

The Monte-Carlo path is config-BATCHED: ``sign_config`` is a device leaf of
the NoiseMapper pytree, so all kept configurations at one SNR stack into a
single pytree and one vmapped estimator call advances every configuration
at once — one compile for the whole enumeration (32,896 configs at bps=4),
where the reference loops configs sequentially
(reference: sim_mutual_information_compare_signs.py:67-95).  ``--resume``
restarts from the per-SNR-point journal.
"""

import argparse
import time

import numpy as np

from ..models.alphabet import PAMAlphabet
from ..models.mutual_information import (
    P_xhat,
    montecarlo_information_batched,
    mutual_information_base_scheme,
)
from ..models.noisemapper import NoiseMapper
from ..utils.checkpoint import SweepState
from .common import init_runtime as common_init_runtime


def reverse_flip_bits(n: int, M: int) -> int:
    """Bit-reverse + complement over M bits: the flip-reversal symmetry that
    maps a sign configuration to its equivalent mirror
    (reference: sim_mutual_information_compare_signs.py:33-37)."""
    res = 0
    for k in range(M):
        res += (((n >> k) & 0b1) ^ 0b1) << (M - 1 - k)
    return res


def index_to_config(n: int, M: int) -> np.ndarray:
    return np.array([(n >> i) & 0b1 for i in range(M)], dtype=np.uint8)


def enumerate_configs(M: int):
    """Keep one representative per flip-reversal orbit."""
    config_list = []
    kept_ids = []
    for c in range(1 << M):
        if reverse_flip_bits(c, M) >= c:
            config_list.append(index_to_config(c, M))
            kept_ids.append(c)
    return np.array(config_list), kept_ids


def build_parser():
    parser = argparse.ArgumentParser(
        prog="mutual_information_base_scheme",
        description="Evaluate mutual information vs SNR of the base scheme",
    )
    parser.add_argument("--out", default="out.csv")
    parser.add_argument("--snr", type=float, nargs=2, default=[0, 5])
    parser.add_argument("--nsnr", type=int, default=11)
    parser.add_argument("--bps", type=int, default=2)
    parser.add_argument("--montecarlo", action="store_true")
    parser.add_argument("--nmontecarlo", type=int, default=1 << 12)
    parser.add_argument("--nloops", type=int, default=1 << 6)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--mc-ginv", choices=["poly", "interp"], default="poly",
        help="Candidate-inverse reconstruction inside the MC estimator: "
        "'poly' (gather-free probit-warped Chebyshev fit of the same "
        "inverse table, ~6x faster on TPU, fit error ~1e-5 of the "
        "constellation scale — far below MC noise) or 'interp' (the "
        "reference's grid interpolation, mirrored exactly)",
    )
    parser.add_argument("--config-chunk", type=int, default=4096,
                        help="Configurations per vmapped estimator call "
                        "(bounds device memory at bps=4's 32,896 configs; "
                        "chunks of equal size share one compiled program)")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the per-SNR-point journal")
    return parser


def main(argv=None):
    import jax

    args = build_parser().parse_args(argv)
    common_init_runtime()
    M = 1 << args.bps

    config_array, kept_ids = enumerate_configs(M)
    column_list = ["EsN0dB"] + [f"I(X,N;Xhat)_{c}" for c in kept_ids]
    config_count = (1 << ((M >> 1) - 1)) * ((1 << (M >> 1)) + 1)
    assert config_array.shape[0] == config_count
    print(config_count)
    print(config_array)

    EsN0dB = np.linspace(args.snr[0], args.snr[1], args.nsnr)
    # One alphabet for the whole sweep (static arg of the jitted MC core).
    pa = PAMAlphabet(args.bps, 2)
    Es = pa.variance
    state = SweepState(args.out, resume=args.resume)
    rows = []
    for i, esn0db in enumerate(EsN0dB):
        prev = state.done(esn0db)
        if prev is not None:
            rows.append(tuple([prev["point"]] + list(prev["values"])))
            continue
        t_point = time.perf_counter()
        N0 = Es * (10 ** (-esn0db / 10)) / 2
        # ONE table build per SNR point: no constructor table depends on the
        # sign configuration (it only flips g/g_inv direction at read time),
        # so the enumeration clones the base mapper per config — every table
        # leaf shared by reference (NoiseMapper.with_sign_config).
        # device=False: host-numpy leaves.  Eager ctors put ~15 tables
        # each on the device, so 32,896 of them serialize ~500k transfers
        # (one roundtrip each on remote-tunnel backends); the stacked chunk
        # pytree pays one transfer per leaf when it enters the jitted
        # estimator.
        base_nm = NoiseMapper(pa, N0, dtype=np.float64, device=False)
        if args.montecarlo and args.mc_ginv == "poly":
            # fit ONCE per SNR point; every clone shares the coefficients
            # by reference (sign-independent), so the whole enumeration
            # rides one [nseg, deg+1] leaf via the shared-leaf batching
            base_nm._ensure_ginv_poly()
        nms = [base_nm.with_sign_config(config_array[k])
               for k in range(config_count)]
        if args.montecarlo:
            # all configs advance per dispatch: stacked mapper pytrees +
            # the vmapped one-program estimator (chunked to bound memory).
            # P{Xhat} is sign-independent: compute once, broadcast.
            p_base = P_xhat(base_nm)
            p_Xhats = np.broadcast_to(p_base, (config_count, p_base.size))
            acc = np.zeros(config_count)
            key = jax.random.key(args.seed + 104729 * i)
            CH = max(1, min(args.config_chunk, config_count))
            for lo in range(0, config_count, CH):
                hi = min(lo + CH, config_count)
                take = hi - lo
                # pad the tail chunk so every chunk reuses one program
                idx = list(range(lo, hi)) + [hi - 1] * (CH - take)
                chunk_nms = [nms[k] for k in idx]
                chunk_p = p_Xhats[idx]
                acc_c = np.zeros(CH)
                for ln in range(args.nloops):
                    keys = jax.random.split(
                        jax.random.fold_in(key, ln * 131071 + lo), CH
                    )
                    out = montecarlo_information_batched(
                        keys, pa, chunk_nms, chunk_p, args.nmontecarlo,
                        which=(False, False, True),
                        ginv_mode=args.mc_ginv,
                    )
                    acc_c += out[:, 2]
                acc[lo:hi] = acc_c[:take] / args.nloops
            values = [float(v) for v in acc]
        else:
            p_base = P_xhat(base_nm)
            values = [
                mutual_information_base_scheme(nm, p_base) for nm in nms
            ]
        state.record(esn0db, dict(values=values))
        rows.append(tuple([float(esn0db)] + values))
        dt_s = time.perf_counter() - t_point
        print(f"[EsN0dB={esn0db:.3f}] {config_count} configs in "
              f"{dt_s:.1f}s ({config_count / dt_s:.0f} configs/s)")

    from pandas import DataFrame

    df = DataFrame(rows, columns=column_list)
    df.to_csv(args.out)
    state.cleanup()
    return df


if __name__ == "__main__":
    main()
