from .engine import (
    ReconciliationEngine,
    simulate_softening_snr_dB,
    simulate_direct_snr_dB,
    simulate_hard_reverse_snr_dB,
)

__all__ = [
    "ReconciliationEngine",
    "simulate_softening_snr_dB",
    "simulate_direct_snr_dB",
    "simulate_hard_reverse_snr_dB",
]
