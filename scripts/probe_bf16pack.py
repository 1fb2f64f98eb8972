"""Packed-bf16 VPU microprobe (VERDICT r4 item 7).

utils/perf.py's model says the resident decode loop runs at ~0.43-0.49
of the modeled VPU peak; DESIGN.md lever 2 parks "bf16 2-lane packing"
as blocked on Mosaic WITHOUT a measurement.  This probe measures it: a
pure elementwise chain (MAC mix and exp mix — the resident kernel's op
classes) over a VMEM-resident array inside one Pallas kernel, timed at
float32 vs bfloat16.  If current Mosaic vectorizes bf16 2-wide anywhere
in this mix, the bf16 column comes out ~2x; a ~1x ratio is the measured
"no packing at this toolchain" verdict.

Usage (one TPU experiment at a time, under timeout, in background):
    timeout 1800 python scripts/probe_bf16pack.py > pack.jsonl 2> pack.log
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--cols", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the axon plugin pins the platform at import; the env var alone
        # is ignored (a "CPU smoke" would silently hit the TPU tunnel)
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    interpret = jax.default_backend() != "tpu"
    if interpret:
        args.iters = min(args.iters, 4)   # CPU smoke only

    t0 = time.perf_counter()
    np.asarray(jnp.zeros((8, 8)) + 1)
    print(f"warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)

    def make(mode, dtype):
        # constants exactly representable in bf16 so neither backend
        # constant-folds differently (python floats: jnp folds them into
        # the op at the kernel's dtype — no captured tracers)
        a = 0.99609375       # 1 - 2^-8
        b = 0.015625         # 2^-6

        def kernel(x_ref, o_ref):
            def body(i, x):
                for _ in range(args.chain):
                    if mode == "mac":
                        x = x * a + b
                    else:                         # exp mix
                        x = jnp.exp(-jnp.abs(x)) * a + x * b
                return x
            o_ref[...] = jax.lax.fori_loop(
                0, args.iters, body, x_ref[...]
            )

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((args.rows, args.cols),
                                               dtype),
                interpret=interpret,
            )(x)

        return run

    rng = np.random.default_rng(0)
    for mode in ("mac", "exp"):
        out = {"mode": mode, "rows": args.rows, "cols": args.cols,
               "iters": args.iters, "chain": args.chain}
        for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            x = jnp.asarray(rng.normal(0, 1, (args.rows, args.cols)),
                            dtype)
            run = make(mode, dtype)
            t0 = time.perf_counter()
            np.asarray(run(x))
            out[f"{tag}_compile_s"] = round(time.perf_counter() - t0, 1)
            ms = []
            for _ in range(args.reps):
                t1 = time.perf_counter()
                np.asarray(run(x))
                ms.append((time.perf_counter() - t1) * 1e3)
            best = min(ms)
            elem_ops = (args.rows * args.cols * args.iters * args.chain
                        * (1 if mode == "mac" else 3))
            out[f"{tag}_ms"] = round(best, 2)
            out[f"{tag}_gops"] = round(elem_ops / best / 1e6, 1)
        out["bf16_speedup"] = round(out["f32_ms"] / out["bf16_ms"], 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
