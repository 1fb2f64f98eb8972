"""Round-5 campaign 1: streaming decode-engine grid at the true DVB-S2
shape (z=360) + resident decode confirmations — ONE process, shared
tunnel warmup (the congestion protocol: every new process pays the full
~2 min first-op warmup, so configs are batched; see BASELINE.md).

Answers VERDICT r4 item 1's streaming half: at z=360 the dense min-sum
roll decode is op-count-bound (540 base edges -> stream_fused 6.05M ->
3.84M symbols/s); candidates are the VMEM-resident flooding kernel
(min-sum 0.397 ms/iter at this shape) and the VMEM-resident layered
kernel (0.894 ms/sweep, ~half the sweeps).  The winner becomes
bench.py's BENCH_STREAM_DECODE=auto choice.

Usage (one TPU experiment at a time, background, under timeout):
    timeout 5400 python scripts/run_r5_stream_grid.py > grid.jsonl 2> grid.log

Emits one JSON line per config (appended as they complete).
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64800)
    ap.add_argument("--nbv", type=int, default=180)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--snr", type=float, default=4.0)
    ap.add_argument("--maxiter", type=int, default=50)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--chunk-frames", type=float, default=2.33)
    ap.add_argument("--skip-decode-probes", type=int, default=0)
    ap.add_argument("--configs", default="",
                    help="comma list to filter config names (substring)")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the axon plugin pins the platform at import; the env var alone
        # is ignored (a "CPU smoke" would silently hit the TPU tunnel)
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    t0 = time.perf_counter()
    np.asarray(jnp.zeros((8, 8)) + 1)
    log(f"tunnel warmup: {time.perf_counter() - t0:.1f}s")

    from qamreconciliation_tpu.models.alphabet import PAMAlphabet
    from qamreconciliation_tpu.models.matrix import Matrix
    from qamreconciliation_tpu.models.noisemapper import NoiseMapper
    from qamreconciliation_tpu.models.qc_decoder import QCDecoder, make_qc_ldpc
    from qamreconciliation_tpu.sims.streaming import StreamReconciler

    z = args.n // args.nbv
    base, vid, cid = make_qc_ldpc(args.nbv, z, dv=3, dc=6, seed=12345)
    mat = Matrix(vid, cid)
    pa = PAMAlphabet(2, 2)
    Es = pa.variance
    N0 = Es * (10.0 ** (-args.snr / 10.0)) / 2.0
    nm = NoiseMapper(pa, N0, dtype=jnp.bfloat16)
    N_symb = args.n // 2
    rng = np.random.default_rng(0)
    F = args.frames
    x = rng.choice(pa.order, size=F * N_symb, p=np.asarray(pa.probabilities))
    y = (np.asarray(pa.constellation)[x]
         + math.sqrt(N0) * rng.standard_normal(F * N_symb))
    chunk = int(args.chunk_frames * N_symb)
    y_chunks = [y[a:a + chunk] for a in range(0, F * N_symb, chunk)]
    x_chunks = [x[a:a + chunk] for a in range(0, F * N_symb, chunk)]

    def mk_dec(engine, rc=25):
        if engine == "dense":
            return QCDecoder(base, z, dtype=jnp.bfloat16,
                             check_rule="minsum")
        if engine == "resident":
            return QCDecoder(base, z, dtype=jnp.bfloat16,
                             check_rule="minsum", resident=True,
                             resident_chunk=rc)
        if engine == "layered":
            return QCDecoder(base, z, dtype=jnp.bfloat16,
                             check_rule="minsum", schedule="layered",
                             resident=True)
        raise ValueError(engine)

    # ---- streaming grid ---------------------------------------------------
    grid = [
        ("stream dense b64", "dense", 64, 25),
        ("stream resident25 b64", "resident", 64, 25),
        ("stream resident25 b128", "resident", 128, 25),
        ("stream resident50 b128", "resident", 128, 50),
        ("stream layered b128", "layered", 128, 0),
        ("stream layered b64", "layered", 64, 0),
    ]
    flt = [s for s in args.configs.split(",") if s]
    for name, engine, B, rc in grid:
        if flt and not any(s in name for s in flt):
            continue
        try:
            dec = mk_dec(engine, rc)
            sr = StreamReconciler(dec, mat, pa, nm, batch=B)
            t0 = time.perf_counter()
            sr.stream_fused(y[: B * N_symb], x[: B * N_symb], args.maxiter)
            compile_s = time.perf_counter() - t0
            log(f"{name}: warmup/compile {compile_s:.1f}s")
            els = []
            for _ in range(args.reps):
                sr2 = StreamReconciler(dec, mat, pa, nm, batch=B)
                sr2._fused_jit = sr._fused_jit
                sr2.dec = sr.dec
                t0 = time.perf_counter()
                r = sr2.stream_fused(y_chunks, x_chunks, args.maxiter)
                els.append(time.perf_counter() - t0)
            out = {
                "config": name, "engine": engine, "batch": B,
                "resident_chunk": rc, "z": z, "nbv": args.nbv,
                "frames": r.frames, "fer": round(r.fer, 4),
                "bit_errors": r.bit_errors,
                "compile_s": round(compile_s, 1),
                "rep_s": [round(e, 2) for e in els],
                "symbols_per_s": round(F * N_symb / min(els), 1),
            }
        except Exception as e:
            out = {"config": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(out), flush=True)

    if args.skip_decode_probes:
        return

    # ---- resident decode confirmations (shared process) -------------------
    # min-over-reps ms/iter probes at z=360: sum-product baseline &
    # doubled-totals variant (item 8's shape), min-sum resident.
    rng = np.random.default_rng(0)
    B = 128
    lappr = jnp.asarray(rng.normal(0, 3.0, (args.n, B)), jnp.bfloat16)
    synd = jnp.asarray(rng.integers(0, 2, (args.n // 2, B)), jnp.int32)
    probe_iters = 250

    def probe(name, **kw):
        try:
            dec = QCDecoder(base, z, dtype=jnp.bfloat16, **kw)
            f = dec._build_decode()
            t0 = time.perf_counter()
            o = f(lappr, synd, jnp.int32(probe_iters))
            np.asarray(o[1])
            compile_s = time.perf_counter() - t0
            ms = []
            for _ in range(4):
                t1 = time.perf_counter()
                o = f(lappr, synd, jnp.int32(probe_iters))
                np.asarray(o[1])
                ms.append((time.perf_counter() - t1) * 1e3)
            out = {
                "config": name, "z": z, "batch": B,
                "compile_s": round(compile_s, 1),
                "ms_per_iter": round(min(ms) / probe_iters, 4),
                "reps_ms_per_iter": [round(m / probe_iters, 4) for m in ms],
            }
        except Exception as e:
            out = {"config": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(out), flush=True)

    probe("sp resident baseline", check_rule="sumproduct", resident=True,
          resident_chunk=50)
    probe("sp resident doubled", check_rule="sumproduct", resident=True,
          resident_chunk=50, resident_double=True)
    probe("minsum resident c50", check_rule="minsum", resident=True,
          resident_chunk=50)
    probe("minsum dense", check_rule="minsum")


if __name__ == "__main__":
    main()
