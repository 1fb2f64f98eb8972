"""Render the sum-product ENGINE comparison waterfall artifact.

Three decode engines computing the same (up to f32 rounding /
saturation) sum-product math, measured on the real TPU at DVB-S2 scale
with identical seeds/code/protocol (sim_reconciliation CLI sweeps,
schema ``EsN0dB,ber,fer,iters`` — reference: sims/sim_reconciliation.py:
96-102): the dense phi-form path (reference-comparable numerics), the
VMEM-resident kernel with the tanh-F/B magnitude (bf16 auto default),
and normalized min-sum for scale.  The point of the figure: the 1.4x
faster tanh-F/B factorization is BER/FER-indistinguishable from the phi
form at every grid point.

Usage: python scripts/plot_sumproduct_engines_waterfall.py \
           SP.csv FB.csv MS.csv OUT.png
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd


def main(sp_csv, fb_csv, ms_csv, out_png):
    sp = pd.read_csv(sp_csv)
    fb = pd.read_csv(fb_csv)
    ms = pd.read_csv(ms_csv)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4), sharex=True)
    for ax, col, ylab in zip(axes, ("ber", "fer"), ("BER", "FER")):
        ax.semilogy(sp.EsN0dB, sp[col].clip(lower=1e-7), "o-",
                    label="dense, phi form (reference math)")
        ax.semilogy(fb.EsN0dB, fb[col].clip(lower=1e-7), "^-.",
                    label="VMEM-resident, tanh-F/B (1.4x faster)")
        ax.semilogy(ms.EsN0dB, ms[col].clip(lower=1e-7), "s--",
                    label="normalized min-sum (alpha=13/16)")
        ax.set_xlabel("$E_s/N_0$ [dB]")
        ax.set_ylabel(ylab)
        ax.grid(True, which="both", alpha=0.3)
    axes[0].legend(fontsize=8)
    fig.suptitle(
        "Sum-product decode engines: softening reverse reconciliation, "
        "QC(3,6) N=64800 rate-1/2, maxiter=50, TPU v5e", fontsize=10,
    )
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    print(f"wrote {out_png}")


if __name__ == "__main__":
    main(*sys.argv[1:5])
