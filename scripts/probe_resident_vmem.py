"""Bisect the VMEM spill source in the resident QC decode kernel.

HISTORICAL bisect harness: the variants here capture the kernel as it
was during the round-3 spill hunt (value-chain viol, pl.when capture,
fori trip counts).  The production kernel in ops/pallas_kernels.py has
since diverged (per-block viol slots, unconditional capture blend,
while_loop).  Kept because the measured variant matrix documents WHICH
constructs triggered the Mosaic register-spill OOMs.

Variants (cumulative structure, mirrors ops/pallas_kernels.bp_decode_rounds_qc):
  nobook     pass1 updates + pass2 only (no viol, no bookkeeping, no capture)
  violonly   + viol_s accumulation (nothing consumes it)
  nocapture  + conv/newly/iters/done bookkeeping (no capture)
  full       + the pl.when(any_newly) final_s capture blend

Run: timeout 2400 python scripts/probe_resident_vmem.py --variant X
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from qamreconciliation_tpu.models.qc_decoder import make_qc_ldpc  # noqa: E402
from qamreconciliation_tpu.ops.boxplus import (  # noqa: E402
    MINSUM_ALPHA, minsum_extrinsic_mag,
)


def build(rows, z, ZC, B, variant, k_rounds=8):
    nb_c = len(rows)
    nb_v = max(v for row in rows for (v, _) in row) + 1
    dc = len(rows[0])
    nzc = z // ZC
    cols = [[] for _ in range(nb_v)]
    for cb, row in enumerate(rows):
        for d, (v, s) in enumerate(row):
            cols[v].append((cb, d, s))
    dtype = jnp.bfloat16
    lvl = ["nobook", "violonly", "nocapture", "full"].index(variant)

    def _read_rolled_chunk(slab_ref, s, j0, ZCk):
        start = (j0 - s) % z
        if start + ZCk <= z:
            return slab_ref[start:start + ZCk]
        head = slab_ref[start:z]
        return jnp.concatenate([head, slab_ref[0:start + ZCk - z]], axis=0)

    def kernel(it0_ref, maxiter_ref, total_in, c2v_in, prior_in, synd_in,
               final_in, done_in, iters_in,
               total_out, c2v_out, final_out, done_out, iters_out,
               total_s, c2v_s, prior_s, final_s, synd_s, done_s, iters_s,
               viol_s, sems):
        loads = [
            pltpu.make_async_copy(total_in, total_s, sems.at[0]),
            pltpu.make_async_copy(c2v_in, c2v_s, sems.at[1]),
            pltpu.make_async_copy(prior_in, prior_s, sems.at[2]),
            pltpu.make_async_copy(synd_in, synd_s, sems.at[3]),
            pltpu.make_async_copy(final_in, final_s, sems.at[4]),
        ]
        for d_ in loads:
            d_.start()
        for d_ in loads:
            d_.wait()
        done_s[:] = done_in[:]
        iters_s[:] = iters_in[:]
        n_it = jnp.maximum(
            jnp.minimum(k_rounds, maxiter_ref[0, 0] - it0_ref[0, 0]), 0
        )

        def one_iteration(k, _):
            it = it0_ref[0, 0] + k
            viol_s[:] = jnp.zeros_like(viol_s)
            for cb, row in enumerate(rows):
                for zc in range(nzc):
                    sl = slice(zc * ZC, (zc + 1) * ZC)
                    t = jnp.stack([
                        _read_rolled_chunk(total_s.at[v], s, zc * ZC, ZC)
                        for (v, s) in row
                    ]).astype(jnp.float32)
                    synd_i = synd_s[cb, sl].astype(jnp.int32)
                    if lvl >= 1:
                        neg_t = (t < 0).astype(jnp.int32)
                        parity = jnp.sum(neg_t, axis=0) & 1
                        bad = (parity != synd_i).astype(jnp.int32)
                        cnt = jnp.sum(bad, axis=0)
                        viol_s[:] = viol_s[:] + jnp.broadcast_to(
                            cnt[None, :], viol_s.shape
                        )
                    v2c = t - c2v_s[cb, :, sl].astype(jnp.float32)
                    mag = MINSUM_ALPHA * minsum_extrinsic_mag(
                        jnp.abs(v2c), 0
                    )
                    neg = (v2c < 0).astype(jnp.int32)
                    par = jnp.sum(neg, axis=0, keepdims=True) & 1
                    sign = (1 - 2 * jnp.bitwise_xor(par, neg)).astype(
                        jnp.float32
                    )
                    pref = (1 - 2 * synd_i).astype(jnp.float32)[None]
                    c2v_s[cb, :, sl] = (sign * pref * mag).astype(dtype)

            if lvl >= 2:
                conv = (viol_s[:] == 0).astype(jnp.int32)
                newly = conv * (1 - done_s[:])
                iters_s[:] = jnp.where(newly > 0, it, iters_s[:])
                done_s[:] = jnp.maximum(done_s[:], conv)
                if lvl >= 3:
                    any_newly = jnp.sum(newly[0:1, :]) > 0

                    @pl.when(any_newly)
                    def _capture():
                        nw = newly[0:1, :] > 0
                        for vb in range(nb_v):
                            final_s[vb] = jnp.where(
                                nw, total_s[vb], final_s[vb]
                            )

            for vb in range(nb_v):
                for zc in range(nzc):
                    sl = slice(zc * ZC, (zc + 1) * ZC)
                    acc = None
                    for (cb, d, s) in cols[vb]:
                        slab = _read_rolled_chunk(
                            c2v_s.at[cb, d], -s, zc * ZC, ZC
                        )
                        acc = slab if acc is None else acc + slab
                    total_s[vb, sl] = prior_s[vb, sl] + (
                        acc if acc is not None else 0
                    )
            return ()

        jax.lax.fori_loop(0, n_it, one_iteration, ())
        stores = [
            pltpu.make_async_copy(total_s, total_out, sems.at[0]),
            pltpu.make_async_copy(c2v_s, c2v_out, sems.at[1]),
            pltpu.make_async_copy(final_s, final_out, sems.at[2]),
        ]
        for d_ in stores:
            d_.start()
        done_out[:] = done_s[:]
        iters_out[:] = iters_s[:]
        for d_ in stores:
            d_.wait()

    def step(it0, maxiter, total, c2v, prior, synd8, final, done, iters):
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(total.shape, dtype),
                jax.ShapeDtypeStruct(c2v.shape, dtype),
                jax.ShapeDtypeStruct(final.shape, dtype),
                jax.ShapeDtypeStruct(done.shape, jnp.int32),
                jax.ShapeDtypeStruct(iters.shape, jnp.int32),
            ),
            in_specs=[smem_spec, smem_spec, any_spec, any_spec, any_spec,
                      any_spec, any_spec, vmem_spec, vmem_spec],
            out_specs=(any_spec, any_spec, any_spec, vmem_spec, vmem_spec),
            scratch_shapes=[
                pltpu.VMEM((nb_v, z, B), dtype),
                pltpu.VMEM((nb_c, dc, z, B), dtype),
                pltpu.VMEM((nb_v, z, B), dtype),
                pltpu.VMEM((nb_v, z, B), dtype),
                pltpu.VMEM((nb_c, z, B), jnp.int8),
                pltpu.VMEM((8, B), jnp.int32),
                pltpu.VMEM((8, B), jnp.int32),
                pltpu.VMEM((8, B), jnp.int32),
                pltpu.SemaphoreType.DMA((5,)),
            ],
            input_output_aliases={2: 0, 3: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 2**20
            ),
        )(it0, maxiter, total, c2v, prior, synd8, final, done, iters)

    return step, nb_c, nb_v, dc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="full")
    ap.add_argument("--zc", type=int, default=360)
    ap.add_argument("--n", type=int, default=64800)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    np.asarray(jnp.zeros((8, 8)) + 1)
    print("warmup done", file=sys.stderr, flush=True)

    z = args.n // 36
    base, vid, cid = make_qc_ldpc(36, z, dv=3, dc=6, seed=12345)
    rows = [[] for _ in range(18)]
    for (c, v, s) in base:
        rows[c].append((v, s))
    step, nb_c, nb_v, dc = build(rows, z, args.zc, args.batch, args.variant,
                                 args.k)
    step = jax.jit(step)

    B = args.batch
    rng = np.random.default_rng(0)
    total = jnp.asarray(rng.normal(0, 3, (nb_v, z, B)), jnp.bfloat16)
    c2v = jnp.zeros((nb_c, dc, z, B), jnp.bfloat16)
    prior = total
    synd8 = jnp.asarray(rng.integers(0, 2, (nb_c, z, B)), jnp.int8)
    final = total
    done = jnp.zeros((8, B), jnp.int32)
    iters = jnp.zeros((8, B), jnp.int32)
    it0 = jnp.zeros((1, 1), jnp.int32)
    maxi = jnp.full((1, 1), 10 ** 6, jnp.int32)

    t0 = time.perf_counter()
    try:
        out = step(it0, maxi, total, c2v, prior, synd8, final, done, iters)
        np.asarray(out[3])
        print(f"{args.variant}: COMPILED+RAN in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        reps = 6
        cur = (total, c2v, final, done, iters)
        t0 = time.perf_counter()
        for r in range(reps):
            o = step(it0, maxi, cur[0], cur[1], prior, synd8, cur[2],
                     cur[3], cur[4])
            cur = o
        np.asarray(cur[3])
        dt = time.perf_counter() - t0
        ms_iter = dt / (reps * args.k) * 1e3
        print(f"{args.variant}: {ms_iter:.3f} ms/iter "
              f"({args.k} iters/call, {reps} calls)", flush=True)
    except Exception as e:  # noqa: BLE001
        for line in str(e).splitlines():
            if ("spill" in line or "Ran out of memory" in line
                    or "vmem requirement" in line):
                print(f"{args.variant}: {line.strip()}", flush=True)
        print(f"{args.variant}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
