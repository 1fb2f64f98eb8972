"""Pallas kernel parity (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from qamreconciliation_tpu.ops.boxplus import check_node_update
from qamreconciliation_tpu.ops.pallas_kernels import check_node_update_pallas


def test_check_node_update_pallas_parity():
    rng = np.random.default_rng(0)
    C, dc, B = 300, 6, 16
    v = jnp.asarray(rng.normal(0, 3, (C, dc, B)), jnp.float32)
    synd = jnp.asarray(rng.integers(0, 2, (C, B)), jnp.int32)
    mask = jnp.asarray(rng.random((C, dc)) < 0.9, jnp.float32)
    ref = check_node_update(v, synd, mask)
    # block_c=128 forces padding (300 -> 384) + multi-block grid
    got = check_node_update_pallas(v, synd, mask, block_c=128, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_pallas_extreme_llrs_no_nan():
    v = jnp.asarray(
        [[[0.0, 1e9, -1e9, 1e-30]] * 6], jnp.float32
    )  # [1, 6, 4]
    synd = jnp.zeros((1, 4), jnp.int32)
    mask = jnp.ones((1, 6), jnp.float32)
    out = check_node_update_pallas(v, synd, mask, block_c=8, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
