"""Attribute the config-batched MC-MI estimator cost on the real TPU.

Times the vmapped I(X,N;Xhat) estimator (the sign study's inner loop,
which=(0,0,1)) and ablation variants that stub out one suspected hot
part each — the per-(sample, candidate) inverse-table gathers
(_y_hat_all_candidates "interp") and the Newton g_inv_search — to find
where the ~20 s/dispatch goes at P=4096 configs x N=4096 samples, M=16.

Usage: python scripts/probe_mcmi_parts.py --variant full|nogather|nonewton|noexp [--p 1024]
"""

import argparse
import json
import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="full",
                    choices=["full", "poly", "nogather", "nonewton",
                             "noexp"])
    ap.add_argument("--p", type=int, default=1024)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--bps", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros((8, 8)) + 1)  # untimed tunnel warmup

    from qamreconciliation_tpu.models.alphabet import PAMAlphabet
    from qamreconciliation_tpu.models.mutual_information import P_xhat
    from qamreconciliation_tpu.models.noisemapper import NoiseMapper

    pa = PAMAlphabet(args.bps, 2.0)
    M = pa.order
    nm = NoiseMapper(pa, pa.variance * 10 ** (-1.0), dtype=np.float64,
                     device=False)
    if args.variant == "poly":
        nm._ensure_ginv_poly()
    p_X = np.asarray(P_xhat(nm))

    def estimator(key, nm, variant):
        dtype = nm.dtype
        kx, kn = jax.random.split(jnp.asarray(key))
        x_ind = pa.random_symbols(kx, args.n)
        y = pa.index_to_value(x_ind, dtype) + nm._sigma_dev * \
            jax.random.normal(kn, (args.n,), dtype)
        xhat_ind = nm.hard_decide_index(y)
        n = nm.map_noise(y, xhat_ind)
        c, p, dF = nm._c, nm._p, nm._delta_F_Y
        x_val = c[x_ind]
        two_var = 2.0 * nm._noise_var_dev
        if variant == "nogather":
            y_hat_all = jnp.broadcast_to(y[:, None], (args.n, M))
        elif variant == "poly":
            y_hat_all = nm._y_hat_all_candidates(n, "poly")
        else:
            y_hat_all = nm._y_hat_all_candidates(n, "interp")
        if variant == "nonewton":
            y_hat_hat = y
        else:
            y_hat_hat = nm.g_inv_search(n, xhat_ind)
        karange = jnp.arange(M)
        is_hat = karange[None, :] == xhat_ind[:, None]
        y_hat_all = jnp.where(is_hat, y_hat_hat[:, None], y_hat_all)
        if variant == "noexp":
            denom = jnp.abs(y_hat_all) + 1.0
        else:
            expo = (
                (2.0 * y_hat_all[:, :, None] - x_val[:, None, None]
                 - c[None, None, :])
                * (c[None, None, :] - x_val[:, None, None]) / two_var
            )
            denom = jnp.sum(p * jnp.exp(expo), axis=2)
        terms = jnp.where(is_hat, 0.0, dF / denom)
        tmp_sum = jnp.sum(terms, axis=1)
        denom_hat = jnp.take_along_axis(denom, xhat_ind[:, None], 1)[:, 0]
        val = (tmp_sum * denom_hat / dF[xhat_ind] + 1.0) * \
            jnp.asarray(p_X, dtype)[xhat_ind]
        return -jnp.mean(jnp.log2(val))

    # shared-leaf batching exactly like montecarlo_information_batched
    clones = [nm.with_sign_config(np.zeros(M, np.uint8))
              for _ in range(args.p)]
    flats = [jax.tree_util.tree_flatten(c) for c in clones]
    leaves0, treedef = flats[0]
    shared = tuple(all(f[0][i] is leaves0[i] for f in flats)
                   for i in range(len(leaves0)))
    stacked = tuple(jnp.stack([jnp.asarray(f[0][i]) for f in flats])
                    for i in range(len(leaves0)) if not shared[i])
    shared_vals = tuple(jnp.asarray(leaves0[i])
                        for i in range(len(leaves0)) if shared[i])

    def one(k, st, sh):
        it_s, it_h = iter(st), iter(sh)
        leaves = [next(it_h) if m else next(it_s) for m in shared]
        nm_i = jax.tree_util.tree_unflatten(treedef, leaves)
        return estimator(k, nm_i, args.variant)

    fn = jax.jit(jax.vmap(one, in_axes=(0, 0, None)))
    keys = jax.random.split(jax.random.key(0), args.p)
    t0 = time.perf_counter()
    out = np.asarray(fn(keys, stacked, shared_vals))
    compile_s = time.perf_counter() - t0
    print(f"compile+first: {compile_s:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = np.asarray(fn(keys, stacked, shared_vals))
    dt = (time.perf_counter() - t0) / args.reps
    print(json.dumps({
        "variant": args.variant, "p": args.p, "n": args.n, "bps": args.bps,
        "dispatch_s": round(dt, 3),
        "samples_per_s": round(args.p * args.n / dt, 1),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
