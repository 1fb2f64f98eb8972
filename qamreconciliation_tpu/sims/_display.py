"""Shared plumbing for the display CLIs.

The reference display scripts (reference: sims/display_*.py) hardcode their
experiment CSV paths and always call ``plt.show()``.  Ours take every input
file as an argument and support ``--save FILE`` for headless rendering.
"""

from __future__ import annotations

import argparse


def add_output_args(parser: argparse.ArgumentParser):
    parser.add_argument(
        "--save", default=None,
        help="Write the figure to this file instead of opening a window",
    )


def get_pyplot(args):
    """Import pyplot, forcing the Agg backend when saving headless."""
    if args.save:
        import matplotlib

        matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    return plt


def finish(plt, args):
    if args.save:
        plt.savefig(args.save, dpi=150, bbox_inches="tight")
        print(f"wrote {args.save}")
    else:
        plt.show()


def binary_entropy(p):
    """h2(p) in bits, safe at 0/1."""
    import numpy as np

    p = np.asarray(p, dtype=np.float64)
    out = np.zeros_like(p)
    m = (p > 0) & (p < 1)
    pm = p[m]
    out[m] = -pm * np.log2(pm) - (1 - pm) * np.log2(1 - pm)
    return out
