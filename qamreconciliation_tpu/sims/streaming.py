"""Block-streamed reconciliation over unbounded symbol streams.

The reference processes one whole frame at a time inside its C loops
(SURVEY.md §5 "long-context": frame length up to N=64800, symbol streams
N_symb = N/bps).  This module adds the TPU-side streaming capability from
BASELINE.json: arbitrarily long correlated (x, y) symbol streams are chunked
into code frames with carry-over boundary handling — symbols that arrive
mid-frame are held in a carry buffer until their frame completes (the
overlap-save analogue for frame-aligned block processing) — and complete
frames are decoded in fixed-size batches through one reused jitted program.

Bob-side and Alice-side steps are split exactly as the protocol splits them:
``bob_process`` consumes y and emits (hard words, syndromes, softening
metrics); ``alice_process`` consumes (softening metrics, Alice's x) plus
Bob's syndromes and emits corrected hard words.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..models.decoder import Decoder
from ..models.matrix import Matrix
from ..models.alphabet import PAMAlphabet
from ..models.noisemapper import NoiseMapper

__all__ = ["StreamReconciler", "StreamResult"]


@dataclass
class StreamResult:
    """Aggregated streaming statistics + decoded payload."""

    frames: int = 0
    decoded_words: list = field(default_factory=list)   # [N]-bit arrays
    success: list = field(default_factory=list)          # per-frame bool
    iterations: list = field(default_factory=list)       # per-frame int
    bit_errors: int = 0                                  # vs Bob's words

    @property
    def fer(self) -> float:
        return (
            0.0 if not self.success
            else 1.0 - sum(self.success) / len(self.success)
        )


class StreamReconciler:
    """Frame-aligned block streaming over a (code, alphabet, noise) triple.

    Args:
      dec, mat, pa, nm: decoder / parity matrix / alphabet / noise mapper.
      batch: frames processed per device round on BOTH sides (the streaming
        block size is ``batch * N_symb`` symbols; partial tail blocks are
        padded up to ``batch`` so every call reuses one compiled program).
      llr_mode: "poly" (default; gather-free piecewise-Chebyshev LLR
        curves), "table" (precomputed (n, j)->LLR map), "interp"
        (per-sample grid inverse) or "search" (exact Newton inverse) — see
        NoiseMapper.demap_lappr_array.
    """

    def __init__(
        self,
        dec: Decoder,
        mat: Matrix,
        pa: PAMAlphabet,
        nm: NoiseMapper,
        batch: int = 32,
        llr_mode: str = "poly",
    ):
        if mat.vnum % pa.bit_per_symbol != 0:
            raise ValueError("code length not divisible by bits/symbol")
        self.dec = dec
        self.mat = mat
        self.pa = pa
        self.nm = nm
        self.batch = int(batch)
        self.llr_mode = llr_mode
        self.N = mat.vnum
        self.N_symb = mat.vnum // pa.bit_per_symbol
        self._carry_y = np.empty(0, np.float64)
        self._carry_x = np.empty(0, np.int64)
        self._alice_jit = None
        self._bob_jit = None
        if llr_mode == "table":
            # build before any jit flattens the mapper: the lazy LLR table
            # changes the pytree structure when materialized
            nm._ensure_llr_tab()
        elif llr_mode == "poly":
            nm._ensure_llr_poly()

    # ---------------------------------------------------------------- Bob

    def bob_process(self, y_block):
        """Consume a block of Bob's samples; emit completed frames.

        Returns ``(words [F, N] uint8, synd [F, C] uint8, n_hat [F, N_symb])``
        for however many frames completed (F may be 0); incomplete-tail
        symbols are carried into the next call.

        Frames are processed in fixed ``batch``-sized blocks with tail
        padding (mirroring the Alice side), so any stream chunking reuses
        ONE compiled program — per-shape retraces cost minutes on
        remote-compile TPU backends.
        """
        y = np.concatenate([self._carry_y, np.asarray(y_block, np.float64).ravel()])
        F = y.size // self.N_symb
        self._carry_y = y[F * self.N_symb:]
        if F == 0:
            return (
                np.empty((0, self.N), np.uint8),
                np.empty((0, self.mat.cnum), np.uint8),
                np.empty((0, self.N_symb)),
            )
        yf = y[: F * self.N_symb].reshape(F, self.N_symb)

        if self._bob_jit is None:

            def bob_round(nm, yf):
                x_hat = nm.hard_decide_index(yf)
                n_hat = nm.map_noise(yf, x_hat)
                words = self.pa.demap_symbols_to_bits(x_hat)
                synd = self.mat.eval_syndrome(words)
                return words, synd, n_hat

            self._bob_jit = jax.jit(bob_round)

        words_l, synd_l, nhat_l = [], [], []
        for lo in range(0, F, self.batch):
            hi = min(lo + self.batch, F)
            take = hi - lo
            blk = yf[lo:hi]
            pad = self.batch - take
            if pad:
                blk = np.concatenate([blk, np.repeat(blk[-1:], pad, 0)])
            w, s, nh = self._bob_jit(
                self.nm, jnp.asarray(blk, self.nm.dtype)
            )
            words_l.append(np.asarray(w, np.uint8)[:take])
            synd_l.append(np.asarray(s, np.uint8)[:take])
            nhat_l.append(np.asarray(nh)[:take])
        return (
            np.concatenate(words_l, axis=0),
            np.concatenate(synd_l, axis=0),
            np.concatenate(nhat_l, axis=0),
        )

    # -------------------------------------------------------------- Alice

    def alice_process(self, n_hat, x_block, synd, max_iterations: int = 50,
                      bob_words=None):
        """Alice's side: LLRs from (softening metric, own symbols) + decode.

        ``x_block`` streams like Bob's y (carry-over boundary handling);
        ``n_hat``/``synd`` must cover the same frames that complete here.
        ``bob_words`` (optional, [F, N]) enables ``bit_errors`` accounting of
        the decoded words against Bob's.  Returns a StreamResult for the
        completed frames.
        """
        x = np.concatenate([self._carry_x, np.asarray(x_block, np.int64).ravel()])
        F = x.size // self.N_symb
        self._carry_x = x[F * self.N_symb:]
        res = StreamResult()
        if F == 0:
            return res
        xf = x[: F * self.N_symb].reshape(F, self.N_symb)
        n_hat = np.asarray(n_hat)[:F]
        synd = np.asarray(synd)[:F]

        if self._alice_jit is None:
            llr_mode = self.llr_mode
            if llr_mode == "table":
                self.nm._ensure_llr_tab()   # before flatten
            elif llr_mode == "poly":
                self.nm._ensure_llr_poly()

            def alice_round(nm, n_hat, x, synd, max_iter):
                lappr = nm.demap_lappr_array(n_hat, x, mode=llr_mode)
                if self.dec._decode_jit is None:
                    self.dec._decode_jit = self.dec._build_decode()
                return self.dec._decode_jit(lappr.T, synd.T, max_iter)

            self._alice_jit = jax.jit(alice_round)

        for lo in range(0, F, self.batch):
            hi = min(lo + self.batch, F)
            take = hi - lo
            nh, xs, sd = n_hat[lo:hi], xf[lo:hi], synd[lo:hi]
            pad = self.batch - take
            if pad:
                # pad the tail block to the fixed batch shape (single jit
                # program for every block); padded lanes are trimmed below
                nh = np.concatenate([nh, np.repeat(nh[-1:], pad, 0)])
                xs = np.concatenate([xs, np.repeat(xs[-1:], pad, 0)])
                sd = np.concatenate([sd, np.repeat(sd[-1:], pad, 0)])
            success, iters, total = self._alice_jit(
                self.nm,
                jnp.asarray(nh, self.nm.dtype),
                jnp.asarray(xs),
                jnp.asarray(sd),
                jnp.int32(max_iterations),
            )
            words = (np.asarray(total).T < 0).astype(np.uint8)[:take]
            if bob_words is not None:
                res.bit_errors += int(
                    np.sum(words != np.asarray(bob_words)[lo:hi])
                )
            res.frames += take
            res.decoded_words.extend(list(words))
            res.success.extend(bool(s) for s in np.asarray(success)[:take])
            res.iterations.extend(int(i) for i in np.asarray(iters)[:take])
        return res
