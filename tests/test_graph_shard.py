"""Graph-sharded decoder: equivalence with the single-device decoder
on the 8-way virtual CPU mesh (SURVEY.md §2 graph-sharding plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qamreconciliation_tpu import Decoder, Matrix
from qamreconciliation_tpu.parallel import make_mesh
from qamreconciliation_tpu.parallel.graph_shard import ShardedDecoder
from qamreconciliation_tpu.utils import make_regular_ldpc


@pytest.fixture(scope="module", params=[240, 252])
def setup(request):
    # 252 -> cnum=126 not divisible by 8: exercises the check padding
    n = request.param
    vid, cid = make_regular_ldpc(n, 3, 6, seed=31)
    mesh = make_mesh(8, axis_name="gs")
    dec = Decoder(vid, cid, dtype=jnp.float64)
    sdec = ShardedDecoder(vid, cid, mesh, dtype=jnp.float64)
    mat = Matrix(vid, cid)
    return dec, sdec, mat


def test_sharded_matches_single_device(setup):
    dec, sdec, mat = setup
    rng = np.random.default_rng(3)
    B, V = 6, dec.vnum
    word = rng.integers(0, 2, (B, V))
    synd = np.asarray(mat.eval_syndrome(word))
    llr = (1 - 2 * word) * 3.0 + rng.normal(0, 2.0, (B, V))

    s1, i1, f1 = dec.decode_batch(llr, synd, 30)
    s2, i2, f2 = sdec.decode_batch(llr, synd, 30)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # per-device partial sums reorder the float adds -> tolerance, not equality
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-9,
                               atol=1e-9)
    assert int(np.asarray(s1).sum()) > 0


def test_sharded_consistent_passthrough(setup):
    dec, sdec, mat = setup
    rng = np.random.default_rng(5)
    word = rng.integers(0, 2, (3, dec.vnum))
    synd = np.asarray(mat.eval_syndrome(word))
    llr = (1 - 2 * word) * 5.0
    s, i, f = sdec.decode_batch(llr, synd, 20)
    assert bool(jnp.all(s))
    np.testing.assert_array_equal(np.asarray(i), np.zeros(3, np.int32))
    np.testing.assert_allclose(np.asarray(f), llr)


def test_sharded_failure_semantics(setup):
    dec, sdec, mat = setup
    rng = np.random.default_rng(7)
    word = rng.integers(0, 2, (2, dec.vnum))
    synd = np.asarray(mat.eval_syndrome(word))
    llr = rng.normal(0, 0.5, (2, dec.vnum))  # hopeless
    s, i, _ = sdec.decode_batch(llr, synd, 5)
    for k in range(2):
        if not bool(s[k]):
            assert int(i[k]) == 5
