"""BI-AWGN direct sweep CLI.

Mirrors the reference (reference: sims/sim_direct.py): same math as
sim_decode (BPSK over AWGN, soft ``2*alpha/v*r`` or hard ``LLR0*sign(r)``)
but the output CSV's SNR column is named ``EsN0dB`` — a reference quirk kept
for display-layer compatibility (reference: sims/sim_direct.py:105).
"""

from .sim_decode import build_parser, run_sweep
from .common import init_runtime as common_init_runtime


def main(argv=None):
    args = build_parser().parse_args(argv)
    common_init_runtime()
    return run_sweep(args, "EsN0dB")


if __name__ == "__main__":
    main()
