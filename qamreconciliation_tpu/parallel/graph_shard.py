"""Graph-sharded BP decoding: check nodes partitioned across a device mesh.

SURVEY.md §2's "graph sharding" plan: for codes too large for one chip, the
Tanner graph's check nodes are partitioned into contiguous blocks, one per
device.  Variable-node totals stay replicated; each device runs the
check-node update for its block and contributes its block's check->variable
messages to the variable sums, which are reduced with ``psum`` over ICI —
the only collective in the loop (per iteration: one [V, B] psum; no
point-to-point halo needed because variable totals are replicated).

The arithmetic is the same sum-product flooding schedule as
models/decoder.py (reference semantics: qamreconciliation/decoder.pyx:391-436);
only the summation order of the variable update differs (per-device partial
sums), so results agree with the single-device decoder to float rounding.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DEFAULT_DTYPE, INDEX_DTYPE
from ..models.decoder import TannerGraph
from ..ops.boxplus import check_node_minsum, check_node_update

__all__ = ["ShardedDecoder"]


class ShardedDecoder:
    """Check-sharded flooding decoder over a 1-D mesh.

    Args:
      e_to_v, e_to_c: edge lists (same contract as Decoder).
      mesh: 1-D ``jax.sharding.Mesh`` whose single axis carries the shards.
      axis_name: mesh axis name (defaults to the mesh's axis).
      dtype: message dtype.
    """

    def __init__(self, e_to_v, e_to_c, mesh: Mesh, dtype=DEFAULT_DTYPE,
                 check_rule: str = "sumproduct"):
        if len(mesh.axis_names) != 1:
            raise ValueError("ShardedDecoder expects a 1-D mesh")
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_dev = mesh.devices.size
        self.dtype = jnp.dtype(dtype)
        if check_rule not in ("sumproduct", "minsum"):
            raise ValueError(f"unknown check_rule {check_rule!r}")
        self.check_rule = check_rule

        g = TannerGraph(e_to_v, e_to_c)
        self.graph = g
        self.vnum, self.cnum, self.ednum = g.vnum, g.cnum, g.ednum

        D = self.n_dev
        C_pad = ((g.cnum + D - 1) // D) * D
        self.c_per_dev = C_pad // D
        dc, dv = g.dc_max, g.dv_max

        # Check-major metadata per device block [D, c_per_dev * dc].
        c_vids = np.zeros((C_pad, dc), np.int64)
        c_mask = np.zeros((C_pad, dc), np.float64)
        c_vids[: g.cnum] = np.asarray(g._c_vids).reshape(g.cnum, dc)
        c_mask[: g.cnum] = g._c_mask_np
        self._c_vids_sh = c_vids.reshape(D, -1)
        self._c_mask_sh = c_mask.reshape(D, self.c_per_dev, dc)

        # Per-device var-major gather map: var slot -> LOCAL check-flat slot
        # of the same edge, or the local dummy slot (last, always masked).
        chk_slot = g.chk_slot_of_edge          # global check-flat slot per edge
        var_slot = g.var_slot_of_edge
        dev_of_edge = (chk_slot // dc) // self.c_per_dev
        local_slot = chk_slot - dev_of_edge * self.c_per_dev * dc
        dummy = self.c_per_dev * dc            # one past the block: dummy lane
        v_from_c_local = np.full((D, g.vnum * dv), dummy, np.int64)
        v_valid = np.zeros((D, g.vnum * dv), np.float64)
        v_from_c_local[dev_of_edge, var_slot] = local_slot
        v_valid[dev_of_edge, var_slot] = 1.0
        self._v_from_c_sh = v_from_c_local
        self._v_valid_sh = v_valid.reshape(D, g.vnum, dv)

        self._decode_jit = None

    # ------------------------------------------------------------------ #

    def _build_decode(self):
        """Engine duck-type contract (same as Decoder._build_decode /
        QCDecoder._build_decode): returns the jitted
        ``(prior [V, B], synd [C, B], max_iter) -> (success, iters, total)``
        function, so a ShardedDecoder drops into ReconciliationEngine and
        sharded *sweeps* run end-to-end (the reference's flagship loop,
        reference: sims/reconciliation.pyx:93-168, under graph sharding)."""
        return self._build()

    def _build(self):
        g = self.graph
        dtype = self.dtype
        D, dc, dv = self.n_dev, g.dc_max, g.dv_max
        Cd = self.c_per_dev
        axis = self.axis
        check_update = (check_node_minsum if self.check_rule == "minsum"
                        else check_node_update)

        c_vids_sh = jnp.asarray(self._c_vids_sh, INDEX_DTYPE)
        c_mask_sh = jnp.asarray(self._c_mask_sh, dtype)
        c_mask_i_sh = jnp.asarray(self._c_mask_sh != 0, jnp.int32)
        v_from_c_sh = jnp.asarray(self._v_from_c_sh, INDEX_DTYPE)
        v_valid_sh = jnp.asarray(self._v_valid_sh, dtype)

        def local_decode(c_vids, c_mask, c_mask_i, v_from_c, v_valid,
                         prior, synd, max_iterations):
            """Runs on ONE device inside shard_map.

            c_vids [Cd*dc]; c_mask [Cd, dc]; v_from_c [V*dv]; v_valid
            [V, dv]; prior [V, B] replicated; synd [Cd, B] this device's
            syndrome block; returns (success [B], iters [B], total [V, B]).
            """
            B = prior.shape[1]
            synd = synd.astype(jnp.int32)

            def consistent(t_c):
                bits = (t_c < 0).astype(jnp.int32) * c_mask_i[:, :, None]
                parity = jnp.sum(bits, axis=1) & 1
                viol = jnp.sum((parity != synd).astype(jnp.int32), axis=0)
                return jax.lax.psum(viol, axis) == 0          # [B] bool

            def gather_totals(total):
                return total[c_vids].reshape(Cd, dc, B)

            def var_partial(c2v):
                """This device's contribution to the total sums [V, B]."""
                padded = jnp.concatenate(
                    [c2v.reshape(-1, B), jnp.zeros((1, B), dtype)], axis=0
                )
                c2v_v = padded[v_from_c].reshape(g.vnum, dv, B)
                return jnp.sum(c2v_v * v_valid[:, :, None], axis=1)

            def cond(state):
                it, _, _, _, done, _ = state
                return jnp.logical_and(it < max_iterations, ~jnp.all(done))

            def body(state):
                it, c2v, total, final, done, iters = state
                t_c = gather_totals(total)
                conv = consistent(t_c)
                newly = jnp.logical_and(conv, ~done)
                iters_new = jnp.where(newly, it, iters)
                done_new = jnp.logical_or(done, conv)
                # capture-at-convergence (see models/decoder.py): snapshot
                # instead of freezing; skips the [V, B] copy when nothing
                # newly converged.
                final_new = jax.lax.cond(
                    jnp.any(newly),
                    lambda f: jnp.where(newly[None, :], total, f),
                    lambda f: f,
                    final,
                )

                v2c = t_c - c2v
                c2v_new = check_update(v2c, synd, c_mask)
                total_new = prior + jax.lax.psum(var_partial(c2v_new), axis)
                return (
                    it + 1, c2v_new, total_new, final_new, done_new, iters_new
                )

            init = (
                jnp.int32(0),
                jnp.zeros((Cd, dc, B), dtype),
                prior.astype(dtype),
                prior.astype(dtype),
                jnp.zeros(B, bool),
                jnp.zeros(B, jnp.int32),
            )
            it, _, total, final, done, iters = jax.lax.while_loop(
                cond, body, init
            )
            conv = consistent(gather_totals(total))
            newly = jnp.logical_and(conv, ~done)
            iters = jnp.where(newly, jnp.minimum(it, max_iterations), iters)
            final = jnp.where(newly[None, :], total, final)
            done = jnp.logical_or(done, conv)
            iters = jnp.where(done, iters, max_iterations)
            final = jnp.where(done[None, :], final, total)
            return done, iters, final

        mapped = jax.shard_map(
            local_decode,
            mesh=self.mesh,
            in_specs=(
                P(axis), P(axis), P(axis), P(axis), P(axis),
                P(), P(axis), P(),
            ),
            out_specs=P(),
            check_vma=False,
        )

        def decode_batched(prior_vb, synd_cb, max_iterations):
            # pad the syndrome to the sharded check count
            pad = D * Cd - g.cnum
            synd_p = jnp.concatenate(
                [synd_cb.astype(jnp.int32),
                 jnp.zeros((pad, synd_cb.shape[1]), jnp.int32)], axis=0
            )
            return mapped(
                c_vids_sh.reshape(D * Cd * dc),
                c_mask_sh.reshape(D * Cd, dc),
                c_mask_i_sh.reshape(D * Cd, dc),
                v_from_c_sh.reshape(-1),
                v_valid_sh.reshape(D * g.vnum, dv),
                prior_vb, synd_p, max_iterations,
            )

        return jax.jit(decode_batched)

    def decode_batch(self, lappr, synd, max_iterations: int):
        """lappr [B, V], synd [B, C] -> (success [B], iters [B], final [B, V])."""
        if self._decode_jit is None:
            self._decode_jit = self._build()
        lappr = jnp.asarray(lappr, self.dtype)
        synd = jnp.asarray(synd)
        success, iters, total = self._decode_jit(
            lappr.T, synd.T, jnp.int32(max_iterations)
        )
        return success, iters, total.T
