"""Streaming-pipeline TPU probe (the round-3/4 BASELINE streaming protocol).

QC(3,6) N=64800 bf16 min-sum at 4.0 dB, deliberately frame-MISALIGNED
chunks (default 2.33 frames), defer=True, uint8 symbol uploads.  Measures
end-to-end symbols/s through bob_process -> alice_process (+ flushes) and
prints one JSON line.

Usage (one TPU experiment at a time, under timeout, in background):
    python scripts/probe_streaming.py --frames 256 --batch 64
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64800)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--chunk-frames", type=float, default=2.33)
    ap.add_argument("--snr", type=float, default=4.0)
    ap.add_argument("--bps", type=int, default=2)
    ap.add_argument("--maxiter", type=int, default=50)
    ap.add_argument("--defer", type=int, default=1)
    ap.add_argument("--fused", type=int, default=0,
                    help="use the one-program stream_fused driver "
                    "(device-resident Bob->Alice hand-off, packed-word "
                    "downloads)")
    ap.add_argument("--handoff", type=int, default=0,
                    help="use the bob_step/alice_step DEVICE-HANDOFF pair "
                    "(split-call protocol structure, but Bob's outputs "
                    "stay on device; defer is ignored)")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    np.asarray(jnp.zeros((8, 8)) + 1)  # untimed first-op tunnel warmup

    from qamreconciliation_tpu.models.alphabet import PAMAlphabet
    from qamreconciliation_tpu.models.matrix import Matrix
    from qamreconciliation_tpu.models.noisemapper import NoiseMapper
    from qamreconciliation_tpu.models.qc_decoder import QCDecoder, make_qc_ldpc
    from qamreconciliation_tpu.sims.streaming import StreamReconciler

    z = args.n // 36
    base, vid, cid = make_qc_ldpc(36, z, dv=3, dc=6, seed=12345)
    dec = QCDecoder(base, z, dtype=jnp.bfloat16, check_rule="minsum")
    mat = Matrix(vid, cid)
    pa = PAMAlphabet(args.bps, 2)
    Es = pa.variance
    N0 = Es * (10.0 ** (-args.snr / 10.0)) / 2.0
    nm = NoiseMapper(pa, N0, dtype=jnp.bfloat16)

    sr = StreamReconciler(dec, mat, pa, nm, batch=args.batch,
                          defer=bool(args.defer))
    N_symb = sr.N_symb
    rng = np.random.default_rng(0)
    F = args.frames
    x = rng.choice(pa.order, size=F * N_symb,
                   p=np.asarray(pa.probabilities))
    y = np.asarray(pa.constellation)[x] + math.sqrt(N0) * rng.standard_normal(
        F * N_symb
    )

    chunk = int(args.chunk_frames * N_symb)

    if args.fused:
        # untimed warmup (absorbs the fused compile), then timed run
        wf = args.batch * N_symb
        sr.stream_fused(y[:wf], x[:wf], args.maxiter)
        sr2 = StreamReconciler(dec, mat, pa, nm, batch=args.batch)
        sr2._fused_jit = sr._fused_jit
        sr2.dec = sr.dec          # shares the built decode jit
        y_chunks = [y[a:a + chunk] for a in range(0, F * N_symb, chunk)]
        x_chunks = [x[a:a + chunk] for a in range(0, F * N_symb, chunk)]
        t0 = time.perf_counter()
        r = sr2.stream_fused(y_chunks, x_chunks, args.maxiter)
        elapsed = time.perf_counter() - t0
        print(json.dumps({
            "frames": F, "decoded_frames": r.frames, "batch": args.batch,
            "chunk_frames": args.chunk_frames, "fused": True,
            "snr_dB": args.snr, "success": sum(r.success),
            "bit_errors": r.bit_errors,
            "dispatches": sr2.decode_dispatches,
            "elapsed_s": round(elapsed, 2),
            "symbols_per_s": round(F * N_symb / elapsed, 1),
        }))
        return

    if args.handoff:
        # step-pair driver: same misaligned-chunk protocol, but Bob's
        # (words, synd, n_hat) ride the DeviceHandoff instead of the
        # ~20 MB/batch host bounce.  Untimed warmup absorbs the compiles.
        sr = StreamReconciler(dec, mat, pa, nm, batch=args.batch)
        wf = args.batch * N_symb
        h = sr.bob_step(y[:wf])
        r = sr.alice_step(h, x[:wf], args.maxiter)
        assert r.frames == args.batch
        sr2 = StreamReconciler(dec, mat, pa, nm, batch=args.batch)
        sr2._bob_jit = sr._bob_jit
        sr2._alice_handoff_jit = sr._alice_handoff_jit
        sr2.dec = sr.dec          # shares the built decode jit
        t0 = time.perf_counter()
        frames = bit_errors = succ = 0
        for lo in range(0, F * N_symb, chunk):
            hi = min(lo + chunk, F * N_symb)
            h = sr2.bob_step(y[lo:hi])
            r = sr2.alice_step(h, x[lo:hi], args.maxiter)
            frames += r.frames
            bit_errors += r.bit_errors
            succ += sum(r.success)
        h = sr2.bob_step_flush()
        r = sr2.alice_step(h, np.empty(0, np.int64), args.maxiter)
        frames += r.frames
        bit_errors += r.bit_errors
        succ += sum(r.success)
        elapsed = time.perf_counter() - t0
        print(json.dumps({
            "frames": F, "decoded_frames": frames, "batch": args.batch,
            "chunk_frames": args.chunk_frames, "handoff": True,
            "snr_dB": args.snr, "success": succ, "bit_errors": bit_errors,
            "dispatches": sr2.decode_dispatches,
            "elapsed_s": round(elapsed, 2),
            "symbols_per_s": round(F * N_symb / elapsed, 1),
        }))
        return

    # untimed warmup pass over one batch to absorb the two compiles.
    # In defer mode the cross-call pipeline keeps the batch in flight, so
    # FLUSH both sides — otherwise alice_process sees 0 aligned frames,
    # never builds its jit, and the remote compile lands in the timed loop
    wf = args.batch * N_symb
    w, s, nh = sr.bob_process(y[:wf])
    if w.shape[0] == 0:
        w, s, nh = sr.bob_flush()
    res = sr.alice_process(nh, x[:wf], s, args.maxiter, bob_words=w)
    res2 = sr.alice_flush(args.maxiter)
    assert res.frames + res2.frames == args.batch, (res.frames, res2.frames)
    # reset carry/queues & accounting
    sr2 = StreamReconciler(dec, mat, pa, nm, batch=args.batch,
                           defer=bool(args.defer))
    sr2._bob_jit, sr2._alice_jit = sr._bob_jit, sr._alice_jit

    t0 = time.perf_counter()
    frames = 0
    bit_errors = 0
    succ = 0
    for lo in range(0, F * N_symb, chunk):
        hi = min(lo + chunk, F * N_symb)
        w, s, nh = sr2.bob_process(y[lo:hi])
        r = sr2.alice_process(nh, x[lo:hi], s, args.maxiter, bob_words=w)
        frames += r.frames
        bit_errors += r.bit_errors
        succ += sum(r.success)
    w, s, nh = sr2.bob_flush()
    if w.shape[0]:
        r = sr2.alice_process(nh, np.empty(0, np.int64), s, args.maxiter,
                              bob_words=w)
        frames += r.frames
        bit_errors += r.bit_errors
        succ += sum(r.success)
    r = sr2.alice_flush(args.maxiter)
    frames += r.frames
    bit_errors += r.bit_errors
    succ += sum(r.success)
    elapsed = time.perf_counter() - t0

    symbols = F * N_symb
    print(json.dumps({
        "frames": F, "decoded_frames": frames, "batch": args.batch,
        "chunk_frames": args.chunk_frames, "defer": bool(args.defer),
        "snr_dB": args.snr, "success": succ, "bit_errors": bit_errors,
        "dispatches": sr2.decode_dispatches,
        "elapsed_s": round(elapsed, 2),
        "symbols_per_s": round(symbols / elapsed, 1),
    }))


if __name__ == "__main__":
    main()
