"""Attribute the layered-sweep cost on the real TPU.

Variants (each a jitted fori_loop with a data dependency, so XLA cannot
elide the body; one TPU experiment at a time, under timeout):

  sweep    — the layered sweep alone (gather rolls + check update + DUS
             total updates), no convergence test, no capture
  parity   — the end-of-sweep int8 syndrome parity test alone
  full     — sweep + parity (the decode body minus the lax.cond capture)

--grouped 0 runs the strictly serial (one check block per step) order.

Usage: python scripts/probe_layered_parts.py --part sweep --grouped 1
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["sweep", "parity", "full"],
                    required=True)
    ap.add_argument("--grouped", type=int, default=1)
    ap.add_argument("--n", type=int, default=64800)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--check", default="minsum")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros((8, 8)) + 1)  # untimed first-op tunnel warmup

    from qamreconciliation_tpu.models.qc_decoder import (
        QCDecoder, make_qc_ldpc,
    )
    from qamreconciliation_tpu.ops.boxplus import (
        check_node_minsum_sm, check_node_update_sm,
    )

    dt = jnp.dtype(args.dtype)
    z = args.n // 36
    base, _, _ = make_qc_ldpc(36, z, dv=3, dc=6, seed=12345)
    dec = QCDecoder(base, z, dtype=dt, schedule="layered",
                    check_rule=args.check)
    nb_c, nb_v, dc = dec.nb_c, dec.nb_v, dec.dc
    rows = dec._rows
    B = args.batch
    # Grouping lives only here now: it MEASURED SLOWER than the serial
    # order (1.37 vs 0.73 ms/sweep — concat/transpose relayouts) and was
    # removed from the product loop; the probe keeps it reproducible.
    if args.grouped:
        var_sets = [{v for (v, _) in row} for row in rows]
        groups, used = [], []
        for cb in range(nb_c):
            for i in range(len(groups)):
                if not (used[i] & var_sets[cb]):
                    groups[i].append(cb)
                    used[i] |= var_sets[cb]
                    break
            else:
                groups.append([cb])
                used.append(set(var_sets[cb]))
    else:
        groups = [[cb] for cb in range(nb_c)]
    print(f"groups: {[len(g) for g in groups]}", file=sys.stderr)

    rng = np.random.default_rng(0)
    synd = jnp.asarray(rng.integers(0, 2, (nb_c, z, B)), jnp.int32)
    prior = jnp.asarray(rng.normal(0, 3.0, (nb_v, z, B)), jnp.float32)
    perm = [cb for grp in groups for cb in grp]
    synd_p = jnp.take(synd, jnp.asarray(perm), axis=0)
    offsets = np.cumsum([0] + [len(grp) for grp in groups])

    def layer_update(v2c, sg, g):
        ones = np.ones((dc, g * z), np.float32)
        if args.check == "minsum":
            return check_node_minsum_sm(v2c, sg, ones)
        return check_node_update_sm(v2c, sg, ones)

    def sweep(total, c2v):
        for gi, grp in enumerate(groups):
            g = len(grp)
            off = int(offsets[gi])
            t = jnp.concatenate(
                [jnp.stack([jnp.roll(total[v], s, axis=0)
                            for (v, s) in rows[cb]]) for cb in grp],
                axis=1,
            )
            old = (c2v[off:off + g].transpose(1, 0, 2, 3)
                   .reshape(dc, g * z, B).astype(jnp.float32))
            sg = synd_p[off:off + g].reshape(g * z, B)
            stored = layer_update(t - old, sg, g).astype(dt)
            delta = stored.astype(jnp.float32) - old
            for i, cb in enumerate(grp):
                for d, (v, s) in enumerate(rows[cb]):
                    total = total.at[v].add(
                        jnp.roll(delta[d, i * z:(i + 1) * z], -s, axis=0))
            c2v = c2v.at[off:off + g].set(
                stored.reshape(dc, g, z, B).transpose(1, 0, 2, 3))
        return total, c2v

    def parity_ok(total):
        bits = (total < 0).astype(jnp.int8)
        ok = jnp.zeros((B,), jnp.int32)
        for cb, row in enumerate(rows):
            par = None
            for (v, s) in row:
                slab = jnp.roll(bits[v], s, axis=0)
                par = slab if par is None else par ^ slab
            ok = ok + jnp.sum(
                (par.astype(jnp.int32) != synd[cb]).astype(jnp.int32), axis=0)
        return ok == 0

    c2v0 = jnp.zeros((nb_c, dc, z, B), dt)

    if args.part == "sweep":
        def body(_, st):
            return sweep(*st)

        fn = jax.jit(lambda st: jax.lax.fori_loop(0, args.iters, body, st))
        arg = (prior, c2v0)
        sync = lambda out: np.asarray(out[0][0, :2, 0])
    elif args.part == "parity":
        def body(_, total):
            okf = parity_ok(total).astype(jnp.float32)
            return total + okf[None, None, :] * 1e-6  # data dependency

        fn = jax.jit(lambda t: jax.lax.fori_loop(0, args.iters, body, t))
        arg = prior
        sync = lambda out: np.asarray(out[0, :2, 0])
    else:
        def body(_, st):
            total, c2v = sweep(*st)
            okf = parity_ok(total).astype(jnp.float32)
            return total + okf[None, None, :] * 0.0, c2v

        fn = jax.jit(lambda st: jax.lax.fori_loop(0, args.iters, body, st))
        arg = (prior, c2v0)
        sync = lambda out: np.asarray(out[0][0, :2, 0])

    t0 = time.perf_counter()
    out = fn(arg)
    sync(out)
    compile_s = time.perf_counter() - t0
    print(f"compile+first: {compile_s:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(arg)
        sync(out)
    ms = (time.perf_counter() - t0) / args.reps / args.iters * 1e3
    print(json.dumps({
        "part": args.part, "grouped": args.grouped, "check": args.check,
        "dtype": args.dtype, "ms_per_iter": round(ms, 3),
        "compile_s": round(compile_s, 1), "n_groups": len(groups),
    }))


if __name__ == "__main__":
    main()
