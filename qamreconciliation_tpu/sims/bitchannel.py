"""Bit-channel sweep engines: BSC and BI-AWGN (BPSK) decoding sanity sweeps.

Capability parity with the decoder-only reference CLIs:

* BSC: random word, syndrome, flip with probability f, constant-magnitude
  LLR ``(log2(1-f) - log2 f) * (1 - 2*flipped_bit)`` — note LOG BASE 2,
  a reference quirk preserved deliberately (reference: sims/sim_bsc.py:58-61).
* BI-AWGN: soft LLR ``2*alpha/v * r`` or hard LLR ``LLR0 * sign(r)`` with
  ``LLR0 = log((1-p)/p)``, ``p = 0.5*erfc(1/sqrt(2v))``
  (reference: sims/sim_decode.py:60-100, sims/sim_direct.py:58-76).

Both run whole frame batches per jitted round, like the reconciliation engine.
"""

from __future__ import annotations

import math
import time

import numpy as np
from scipy.special import erfc

import jax
import jax.numpy as jnp

from ..config import DEFAULT_DTYPE
from ..models.decoder import Decoder
from ..models.matrix import Matrix
from ..utils.scalar import count_errors_from_lappr
from .engine import PointResult, _decode_inline, scan_rounds

__all__ = ["BitChannelEngine"]


class BitChannelEngine:
    """Batched decoder-only Monte-Carlo engine."""

    def __init__(
        self,
        dec: Decoder,
        mat: Matrix,
        batch: int = 128,
        dtype=DEFAULT_DTYPE,
        mesh_axis=None,
        rounds_per_dispatch: int = 1,
    ):
        self.dec = dec
        self.mat = mat
        # Prefer structure-aware syndromes (QCDecoder circulant rolls) over
        # the expanded-graph gather, mirroring ReconciliationEngine (see
        # engine.py and the host-roundtrip rules in DESIGN.md).  Both map
        # word [V, B] -> synd [C, B].
        self._synd_vb = getattr(dec, "syndrome_from_bits", None) \
            or mat.graph.syndrome_from_bits
        self.batch = int(batch)
        self.dtype = jnp.dtype(dtype)
        self.mesh_axis = mesh_axis
        self.rounds_per_dispatch = int(rounds_per_dispatch)
        self.N = mat.vnum
        self.K = mat.vnum - mat.cnum
        # BSC counts bit errors over the whole word (N, not K); int32
        # on-device counters bound the per-dispatch error sum
        if self.rounds_per_dispatch * self.batch * self.N >= 2 ** 31:
            raise ValueError(
                "rounds_per_dispatch * batch * N must stay below 2^31 "
                "(int32 on-device counters)"
            )
        self.frames_per_round = (
            self.batch * self.rounds_per_dispatch
            * (mesh_axis[0].devices.size if mesh_axis is not None else 1)
        )
        self._round_cache = {}

    def _wrap(self, round_fn):
        round_fn = scan_rounds(round_fn, self.rounds_per_dispatch)
        if self.mesh_axis is not None:
            from ..parallel.sweep import shard_round

            return shard_round(round_fn, *self.mesh_axis)
        return jax.jit(round_fn)

    def _build_bsc_round(self):
        """One jitted BSC round; the flip probability and its constant LLR
        magnitude are traced scalars, so one compile serves the whole sweep."""
        B, N = self.batch, self.N
        dtype = self.dtype

        def round_fn(key, max_iterations, rber, llr0):
            kw, kf = jax.random.split(key)
            word = jax.random.bernoulli(kw, 0.5, (B, N)).astype(jnp.int32)
            synd = self._synd_vb(word.T).T
            flipped = jax.random.bernoulli(kf, rber, (B, N)).astype(jnp.int32)
            rx = word ^ flipped
            lappr = llr0.astype(dtype) * (1.0 - 2.0 * rx).astype(dtype)
            success, iters, final = _decode_inline(
                self.dec, lappr, synd, max_iterations
            )
            # BSC sweep counts errors over the WHOLE word
            # (reference: sims/sim_bsc.py:66).  Counters stacked into ONE
            # [4] array: a single device->host roundtrip per round (see
            # engine._decode_and_count).
            errors = count_errors_from_lappr(final, word)
            return jnp.stack([
                jnp.sum(errors),
                jnp.sum(errors > 0),
                jnp.sum(jnp.where(success, iters, 0)),
                jnp.sum(success),
            ])

        return self._wrap(round_fn)

    def _build_biawgn_round(self, hard: bool):
        """One jitted BI-AWGN round per hard/soft flavor; noise level, alpha
        and the hard-decision LLR magnitude are traced scalars."""
        B, N = self.batch, self.N
        dtype = self.dtype

        def round_fn(key, max_iterations, vsqrt, inv_v_alpha2, llr0):
            kw, kn = jax.random.split(key)
            word = jax.random.bernoulli(kw, 0.5, (B, N)).astype(jnp.int32)
            synd = self._synd_vb(word.T).T
            tx = (1.0 - 2.0 * word).astype(dtype)
            rx = tx + vsqrt.astype(dtype) * jax.random.normal(kn, (B, N), dtype)
            if hard:
                lappr = llr0.astype(dtype) * jnp.sign(rx)
            else:
                lappr = inv_v_alpha2.astype(dtype) * rx
            success, iters, final = _decode_inline(
                self.dec, lappr, synd, max_iterations
            )
            errors = count_errors_from_lappr(final[:, : self.K], word[:, : self.K])
            return jnp.stack([
                jnp.sum(errors),
                jnp.sum(errors > 0),
                jnp.sum(jnp.where(success, iters, 0)),
                jnp.sum(success),
            ])

        return self._wrap(round_fn)

    # ------------------------------------------------------------------ #

    def _run(self, round_fn, point, max_iterations, simloops, stop_fn, ber_div,
             *round_args):
        key = jax.random.key(0)
        err = ferr = its = succ = frames = 0
        n_rounds = max(1, math.ceil(simloops / self.frames_per_round))
        t0 = time.perf_counter()
        # double-buffered rounds (see engine.run_point): dispatch r+1 before
        # blocking on r's counters; early exit lags one round.
        pending = None
        for r in range(n_rounds):
            out = round_fn(
                jax.random.fold_in(key, r), jnp.int32(max_iterations),
                *round_args,
            )
            if pending is not None:
                e, fe, it, sc = np.asarray(pending)  # one host transfer
                err += int(e)
                ferr += int(fe)
                its += int(it)
                succ += int(sc)
                frames += self.frames_per_round
                if stop_fn(err, ferr, frames):
                    pending = out
                    break
            pending = out
        if pending is not None:
            e, fe, it, sc = np.asarray(pending)
            err += int(e)
            ferr += int(fe)
            its += int(it)
            succ += int(sc)
            frames += self.frames_per_round
        dt = time.perf_counter() - t0
        return PointResult(
            snr_dB=point,
            ber=err / (frames * ber_div),
            fer=ferr / frames,
            iters=0.0 if succ == 0 else its / succ,
            frames=frames,
            frames_per_s=frames / dt if dt > 0 else 0.0,
        )

    def run_bsc_point(self, rber, max_iterations, simloops, minerr) -> PointResult:
        """Early exit: error_count > minerr and frames > max(20, simloops/100)
        (reference: sims/sim_bsc.py:75-76); BER divides by the full word."""
        round_fn = self._round_cache.get("bsc")
        if round_fn is None:
            round_fn = self._round_cache["bsc"] = self._build_bsc_round()
        rber = float(rber)
        llr0 = math.log2(1.0 - rber) - math.log2(rber)
        stop = lambda err, ferr, frames: (
            err > minerr and frames > max(20, simloops // 100)
        )
        return self._run(
            round_fn, rber, max_iterations, simloops, stop, self.N,
            jnp.asarray(rber, jnp.float32), jnp.asarray(llr0, self.dtype),
        )

    def run_biawgn_point(
        self, ebn0_db, max_iterations, simloops, minerr, alpha=1.0, hard=False
    ) -> PointResult:
        """v = 10^(-EbN0/10)/2 (reference: sims/sim_decode.py:43); BER over
        the K info bits; early exit on bit errors
        (reference: sims/sim_decode.py:86-88)."""
        v = (10.0 ** (-float(ebn0_db) / 10.0)) / 2.0
        flavor = ("biawgn", bool(hard))
        round_fn = self._round_cache.get(flavor)
        if round_fn is None:
            round_fn = self._round_cache[flavor] = self._build_biawgn_round(
                bool(hard)
            )
        err_prob = 0.5 * erfc(1.0 / (math.sqrt(2.0) * math.sqrt(v)))
        llr0 = float(np.log((1.0 - err_prob) / err_prob))
        stop = lambda err, ferr, frames: (
            err >= minerr and frames > simloops / 20
        )
        return self._run(
            round_fn, float(ebn0_db), max_iterations, simloops, stop, self.K,
            jnp.asarray(math.sqrt(v), self.dtype),
            jnp.asarray(2.0 * alpha / v, self.dtype),
            jnp.asarray(llr0, self.dtype),
        )
