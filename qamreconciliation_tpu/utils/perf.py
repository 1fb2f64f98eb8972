"""Compute-utilization accounting for the BP decode loop.

The decode loop at DVB-S2 scale is VPU-elementwise-bound (measured:
removing ~all HBM traffic with the VMEM-resident kernel bought only the
bandwidth share of the round-2 floor, DESIGN.md "VMEM-resident decode"),
so the honest utilization figure is an OPS model against the VPU peak —
the MFU analogue for a workload with no matmuls (VERDICT round-3 item 3).

Model
-----
Each flooding BP iteration performs, per edge slot per frame, a fixed
budget of f32 elementwise VPU ops: the convergence parity test, the
extrinsic reconstruction ``v2c = t - c2v``, the magnitude rule, the
sign/syndrome logic, and the variable-update accumulation.  The counts
below were tallied from the resident kernel's op graph
(ops/pallas_kernels.bp_decode_rounds_qc) at (3,6)-regular degrees;
they are estimates good to ~20%, not cycle-exact.

Transcendentals (exp/log/log1p/tanh) are multi-cycle on the VPU; they are
weighted ``TRANSCENDENTAL_WEIGHT`` (default 8) ALU-op equivalents — an
assumption, stated here so the figure is reproducible.  Note the phi form
evaluates BOTH of phi_llr's regime branches under ``jnp.where`` (ops/
boxplus.py:phi_llr), so it pays ~5 transcendentals per phi evaluation.

Peak
----
``V5E_VPU_OPS``: one v5e TensorCore VPU executes 8x128-lane vector ops on
~4 ALUs at ~940 MHz => 8*128*4*0.94e9 ~= 3.85e12 f32 elementwise ops/s.
(Public figure of the "How to Scale Your Model" hardware chapter's VPU
description; the MXU peak is irrelevant here — the loop has no matmuls.)

Cross-check: the measured transcendental-free min-sum resident kernel
(0.466 ms/iter at N=64800, B=128) lands at ~0.30 of this peak, and the
phi-form sum-product (0.861 ms/iter) at ~0.8 — consistent with the
measured "VPU-bound on transcendentals" conclusion, which is what this
model is for: regressions in the VPU regime are invisible to a GB/s
roofline.
"""

from __future__ import annotations

__all__ = ["V5E_VPU_OPS", "TRANSCENDENTAL_WEIGHT", "decode_ops_per_iter",
           "vpu_util_frac"]

# one v5e TensorCore VPU: 8x128 lanes x ~4 ALUs x ~940 MHz
V5E_VPU_OPS = 3.85e12
# ALU-op equivalents charged per transcendental (exp/log/log1p/tanh)
TRANSCENDENTAL_WEIGHT = 8.0

# per-edge-slot op budgets (ALU ops, transcendental ops) per BP iteration:
# conv parity test (~2.4) + v2c reconstruction (2) + abs (1) + sign /
# syndrome-prefactor logic (~6) + store cast (1) + variable-update
# accumulation incl. freeze select (~1.7) = ~14 ALU common, plus the
# magnitude rule:
#   minsum : min1/is-min/count/min2/select/alpha        ~8 ALU
#   tanhfb : P/Q forward-backward products + ratio       ~9 ALU + exp + log
#   phi    : 2 phi_llr evals (both regime branches each) ~11 ALU + 10 transc
_RULE_OPS = {
    "minsum": (22.0, 0.0),
    "tanhfb": (23.0, 2.0),
    "phi": (25.0, 10.0),
}


def decode_ops_per_iter(edges: int, batch: int, rule: str,
                        phi_impl: str = "phi",
                        transc_weight: float = TRANSCENDENTAL_WEIGHT):
    """Weighted VPU-op count of ONE flooding BP iteration.

    Args:
      edges: expanded edge count E (graph edges; message slots).
      batch: frames per batch B.
      rule: "sumproduct" | "minsum" | "tanhfb".
      phi_impl: magnitude implementation when rule == "sumproduct".
    """
    key = rule if rule != "sumproduct" else (
        "tanhfb" if phi_impl == "tanhfb" else "phi"
    )
    alu, transc = _RULE_OPS[key]
    return edges * batch * (alu + transc_weight * transc)


def vpu_util_frac(ms_per_iter: float, edges: int, batch: int, rule: str,
                  phi_impl: str = "phi",
                  peak_ops: float = V5E_VPU_OPS) -> float:
    """Fraction of the v5e VPU elementwise peak the measured loop achieves."""
    ops = decode_ops_per_iter(edges, batch, rule, phi_impl)
    return ops / (ms_per_iter * 1e-3) / peak_ops
