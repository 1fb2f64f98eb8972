"""Sign-configuration comparison sweep CLI.

Mirrors the reference (reference: sims/sim_mutual_information_compare_signs.py):
enumerate all monotonicity sign configurations up to flip-reversal symmetry
(config_count = 2^(M/2-1) * (2^(M/2)+1) kept configs out of 2^M) and evaluate
I(X,N;Xhat) for each, analytically (quad) or by Monte-Carlo.
"""

import argparse

import numpy as np

from ..models.alphabet import PAMAlphabet
from ..models.mutual_information import (
    P_xhat,
    montecarlo_information,
    mutual_information_base_scheme,
)
from ..models.noisemapper import NoiseMapper
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
    rows = []
    for i, esn0db in enumerate(EsN0dB):
        N0 = Es * (10 ** (-esn0db / 10)) / 2
        res = [float(esn0db)]
        for k in range(config_count):
            nm = NoiseMapper(pa, N0, config_array[k], dtype=np.float64)
            p_Xhat = P_xhat(nm)
            if args.montecarlo:
                key = jax.random.key(args.seed + 104729 * i + k)
                acc = 0.0
                for ln in range(args.nloops):
                    _, _, tmp = montecarlo_information(
                        jax.random.fold_in(key, ln), pa, nm, p_Xhat,
                        args.nmontecarlo, which=(False, False, True),
                    )
                    acc += tmp
                res.append(acc / args.nloops)
            else:
                res.append(mutual_information_base_scheme(nm, p_Xhat))
        rows.append(tuple(res))
        print(f"[EsN0dB={esn0db:.3f}] done")

    from pandas import DataFrame

    df = DataFrame(rows, columns=column_list)
    df.to_csv(args.out)
    return df


if __name__ == "__main__":
    main()
