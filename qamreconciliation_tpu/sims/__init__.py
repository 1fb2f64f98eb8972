from .engine import (
    ReconciliationEngine,
    simulate_softening_snr_dB,
    simulate_direct_snr_dB,
    simulate_hard_reverse_snr_dB,
)
from ..ops.llr import y_to_lappr_gray

# API-parity alias for the reference's exported Bob-side LLR helper
# (reference: sims/reconciliation.pyx:75-89, `y_to_lappr_grey_array`).
y_to_lappr_grey_array = y_to_lappr_gray

__all__ = [
    "ReconciliationEngine",
    "simulate_softening_snr_dB",
    "simulate_direct_snr_dB",
    "simulate_hard_reverse_snr_dB",
    "y_to_lappr_gray",
    "y_to_lappr_grey_array",
]
