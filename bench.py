"""Headline benchmark: decoded frames/s, soft reverse reconciliation.

Workload (BASELINE.md north-star): DVB-S2-scale rate-1/2 LDPC (N=64800,
regular (3,6) Tanner graph), 4-PAM (bps=2) softening reverse reconciliation at
Es/N0 = 3.5 dB (just below the decoding threshold, mean ~32 BP iterations),
max 50 decoder iterations — the reference's own measurement protocol
(reference: sims/sim_reconciliation.py:35-41, maxiter=50).

Measured head-to-head at run time:
  * TPU: the batched end-to-end round (sample -> AWGN -> harden -> soften ->
    syndrome -> LLR -> BP decode -> counters), steady state after warmup.
  * Baseline: the native single-core scalar flooding decoder
    (native/graphcore.cpp) on the same LLR/syndrome distribution, decode step
    only with per-frame early exit — a faithful stand-in for the reference's
    single-core Cython decoder (Cython is unavailable in this image; the
    scalar C++ loop is the same algorithm the reference compiles to C).
    Timing decode-only *understates* the reference's true per-frame cost
    (which also pays LLR generation), so vs_baseline is conservative.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

N_CODE = int(os.environ.get("BENCH_N", 64800))
BATCH = int(os.environ.get("BENCH_BATCH", 128))
SNR_DB = float(os.environ.get("BENCH_SNR", 3.5))
MAX_ITER = int(os.environ.get("BENCH_MAXITER", 50))
TIMED_ROUNDS = int(os.environ.get("BENCH_ROUNDS", 3))
BASELINE_BUDGET_S = float(os.environ.get("BENCH_BASELINE_S", 45.0))
BASELINE_MIN_FRAMES = 3

# Fallback, only used if the native baseline cannot build: single-core scalar
# flooding BP at N=64800/maxiter=50 measured on this image's CPU (see
# BASELINE.md "measured" table).
FALLBACK_BASELINE_FPS = float(os.environ.get("BENCH_BASELINE_FPS", 0.33))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from qamreconciliation_tpu.models.alphabet import PAMAlphabet
    from qamreconciliation_tpu.models.decoder import Decoder
    from qamreconciliation_tpu.models.matrix import Matrix
    from qamreconciliation_tpu.models.noisemapper import NoiseMapper
    from qamreconciliation_tpu.sims.engine import ReconciliationEngine
    from qamreconciliation_tpu.utils.edgefile import make_regular_ldpc

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    vid, cid = make_regular_ldpc(N_CODE, dv=3, dc=6, seed=12345)
    dec = Decoder(vid, cid)
    mat = Matrix(vid, cid)
    pa = PAMAlphabet(2, 2.0)
    eng = ReconciliationEngine(dec, mat, pa, batch=BATCH, llr_mode="interp")

    Es = pa.variance
    N0 = Es * (10.0 ** (-SNR_DB / 10.0)) / 2.0
    sigma = math.sqrt(N0)
    nm = NoiseMapper(pa, N0)

    round_fn = eng._build_round("softening", nm, sigma, 1.0)

    # ---- TPU steady-state -------------------------------------------------
    key = jax.random.key(0)
    t0 = time.perf_counter()
    out = round_fn(jax.random.fold_in(key, 0), jnp.int32(MAX_ITER))
    jax.block_until_ready(out)
    log(f"warmup (compile + run): {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    ferrs = 0
    for r in range(1, TIMED_ROUNDS + 1):
        out = round_fn(jax.random.fold_in(key, r), jnp.int32(MAX_ITER))
        jax.block_until_ready(out)
        ferrs += int(out[1])
    elapsed = time.perf_counter() - t0
    frames = TIMED_ROUNDS * BATCH
    tpu_fps = frames / elapsed
    log(f"tpu: {frames} frames in {elapsed:.2f}s -> {tpu_fps:.1f} frames/s "
        f"(fer={ferrs / frames:.3f})")

    # ---- native single-core baseline --------------------------------------
    baseline_fps = None
    try:
        from qamreconciliation_tpu._graphcore import ScalarDecoder

        # Same input distribution: pull one TPU-generated round to the host.
        def gen_inputs(k):
            kx, kn = jax.random.split(k)
            x = pa.random_symbols(kx, (BATCH, eng.N_symb))
            y = pa.index_to_value(x, eng.dtype) + sigma * jax.random.normal(
                kn, (BATCH, eng.N_symb), eng.dtype
            )
            x_hat = nm.hard_decide_index(y)
            n_hat = nm.map_noise(y, x_hat)
            word = pa.demap_symbols_to_bits(x_hat)
            lappr = nm.demap_lappr_array(n_hat, x, mode="interp")
            synd = mat.eval_syndrome(word)
            return lappr, synd

        lappr_h, synd_h = jax.jit(gen_inputs)(jax.random.fold_in(key, 999))
        lappr_h = np.asarray(lappr_h, np.float64)
        synd_h = np.asarray(synd_h, np.uint8)

        sd = ScalarDecoder(vid, cid)
        done = 0
        t0 = time.perf_counter()
        for f in range(BATCH):
            sd.decode(lappr_h[f], synd_h[f], MAX_ITER)
            done += 1
            el = time.perf_counter() - t0
            if el > BASELINE_BUDGET_S and done >= BASELINE_MIN_FRAMES:
                break
        el = time.perf_counter() - t0
        baseline_fps = done / el
        log(f"baseline (1-core scalar C++): {done} frames in {el:.2f}s "
            f"-> {baseline_fps:.3f} frames/s")
    except Exception as e:  # no compiler on this host, etc.
        log(f"native baseline unavailable ({e}); "
            f"using recorded {FALLBACK_BASELINE_FPS} frames/s")
        baseline_fps = FALLBACK_BASELINE_FPS

    print(json.dumps({
        "metric": "softening_decoded_frames_per_s",
        "value": round(tpu_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(tpu_fps / baseline_fps, 1),
    }))


if __name__ == "__main__":
    main()
