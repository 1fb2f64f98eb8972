"""Attribute the z=1800 resident sum-product regression: tree vs serial
F/B all-but-one products (round-5 boxplus.fb_allbutone_list change).

Monkeypatches the shared helper back to the round-4 SERIAL prefix-chain
form and probes the resident tanh-F/B kernel at both shapes in ONE
process — same window, direct comparison.

Usage: timeout 5400 python scripts/probe_fb_form.py > fb.jsonl 2> fb.log
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def serial_fb_allbutone_list(terms):
    """Round-4 serial forward/backward prefix-chain form."""
    import jax.numpy as jnp

    n = len(terms)
    if n == 1:
        return [jnp.ones_like(terms[0])], terms[0]
    F = [terms[0]]
    for d in range(1, n):
        F.append(F[-1] * terms[d])
    Bk = [terms[n - 1]]
    for d in range(n - 2, -1, -1):
        Bk.append(Bk[-1] * terms[d])
    Bk = Bk[::-1]
    out = [Bk[1]] + [F[d - 1] * Bk[d + 1] for d in range(1, n - 1)] \
        + [F[n - 2]]
    return out, F[n - 1]


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    np.asarray(jnp.zeros((8, 8)) + 1)

    from qamreconciliation_tpu.ops import boxplus, pallas_kernels
    from qamreconciliation_tpu.models.qc_decoder import (
        QCDecoder, make_qc_ldpc,
    )

    tree_form = boxplus.fb_allbutone_list
    rng = np.random.default_rng(0)
    B = 128

    def probe(name, nbv, form):
        boxplus.fb_allbutone_list = form
        pallas_kernels._fb_allbutone_list = form
        try:
            z = 64800 // nbv
            base, _, _ = make_qc_ldpc(nbv, z, dv=3, dc=6, seed=12345)
            dec = QCDecoder(base, z, dtype=jnp.bfloat16,
                            check_rule="sumproduct", resident=True,
                            resident_chunk=50)
            lappr = jnp.asarray(rng.normal(0, 3.0, (dec.vnum, B)),
                                jnp.bfloat16)
            synd = jnp.asarray(rng.integers(0, 2, (dec.cnum, B)),
                               jnp.int32)
            f = dec._build_decode()
            t0 = time.perf_counter()
            o = f(lappr, synd, jnp.int32(250)); np.asarray(o[1])
            cs = time.perf_counter() - t0
            ms = []
            for _ in range(4):
                t1 = time.perf_counter()
                o = f(lappr, synd, jnp.int32(250)); np.asarray(o[1])
                ms.append((time.perf_counter() - t1) * 1e3)
            out = {"config": name, "nbv": nbv,
                   "compile_s": round(cs, 1),
                   "ms_per_iter": round(min(ms) / 250, 4),
                   "reps": [round(m / 250, 4) for m in ms]}
        except Exception as e:
            out = {"config": name,
                   "error": f"{type(e).__name__}: {e}"[:250]}
        finally:
            boxplus.fb_allbutone_list = tree_form
            pallas_kernels._fb_allbutone_list = tree_form
        print(json.dumps(out), flush=True)

    probe("z1800 tree", 36, tree_form)
    probe("z1800 serial", 36, serial_fb_allbutone_list)
    probe("z360 tree", 180, tree_form)
    probe("z360 serial", 180, serial_fb_allbutone_list)


if __name__ == "__main__":
    main()
