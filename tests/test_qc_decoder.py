"""Quasi-cyclic decoder: exact parity with the generic decoder + engine drop-in."""

import numpy as np
import jax.numpy as jnp
import pytest

from qamreconciliation_tpu import Decoder, Matrix, PAMAlphabet
from qamreconciliation_tpu.models.qc_decoder import QCDecoder, make_qc_ldpc
from qamreconciliation_tpu.sims import ReconciliationEngine


@pytest.fixture(scope="module")
def qc():
    base, vid, cid = make_qc_ldpc(nb_v=12, z=16, dv=3, dc=6, seed=4)
    return base, vid, cid


def test_expansion_shapes(qc):
    base, vid, cid = qc
    qdec = QCDecoder(base, 16)
    assert qdec.vnum == 12 * 16
    assert qdec.cnum == 6 * 16
    assert qdec.ednum == len(base) * 16
    assert qdec.dc == 6


def test_qc_matches_generic_decoder_exactly(qc):
    """success/iters bit-identical and final LLRs equal (same float pairs,
    different only in the roll-based data movement)."""
    base, vid, cid = qc
    qdec = QCDecoder(base, 16, dtype=jnp.float64)
    gdec = Decoder(vid, cid, dtype=jnp.float64)
    mat = Matrix(vid, cid)
    rng = np.random.default_rng(1)
    B = 6
    word = rng.integers(0, 2, (B, qdec.vnum))
    synd = np.asarray(mat.eval_syndrome(word))
    llr = (1 - 2 * word) * 3.0 + rng.normal(0, 2.0, (B, qdec.vnum))
    s1, i1, f1 = gdec.decode_batch(llr, synd, 30)
    s2, i2, f2 = qdec.decode_batch(llr, synd, 30)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-10, atol=1e-10)
    assert int(np.asarray(s1).sum()) > 0


def test_qc_engine_drop_in(qc):
    """QCDecoder drives the full reconciliation engine in all three modes."""
    base, vid, cid = qc
    qdec = QCDecoder(base, 16)
    mat = Matrix(vid, cid)
    pa = PAMAlphabet(2, 2.0)
    eng = ReconciliationEngine(qdec, mat, pa, batch=8)
    r = eng.run_point("softening", 4.5, 20, 16, 10**9,
                      nmconfig=np.zeros(4, np.uint8))
    assert 0.0 <= r.ber <= 1.0 and r.frames == 16
    for mode in ("hard", "direct"):
        r = eng.run_point(mode, 8.0, 20, 16, 10**9)
        assert 0.0 <= r.ber <= 1.0


def test_qc_rejects_irregular_rows():
    # two base edges on check 0, one on check 1 -> non-uniform row weight
    with pytest.raises(ValueError):
        QCDecoder([(0, 0, 1), (0, 1, 2), (1, 0, 3)], z=8)


def test_make_qc_no_duplicate_circulants():
    base, vid, cid = make_qc_ldpc(nb_v=24, z=32, dv=3, dc=6, seed=7)
    assert len(set(base)) == len(base)


def test_qc_csv_roundtrip_and_cli(tmp_path):
    from qamreconciliation_tpu.models.qc_decoder import save_qc_csv, load_qc_csv
    from qamreconciliation_tpu.sims import sim_reconciliation

    base, vid, cid = make_qc_ldpc(nb_v=12, z=16, dv=3, dc=6, seed=4)
    path = str(tmp_path / "qc.csv")
    save_qc_csv(path, base, 16)
    base2, z2 = load_qc_csv(path)
    assert base2 == base and z2 == 16

    out = str(tmp_path / "out.csv")
    df = sim_reconciliation.main([
        path, "--qc", "--out", out, "--snr", "4.5", "4.5", "--nsnr", "1",
        "--maxiter", "15", "--simloops", "16", "--ferr-count-min", "1000000",
        "--batch", "8",
    ])
    assert list(df.columns) == ["EsN0dB", "ber", "fer", "iters"]
    assert 0.0 <= float(df.ber[0]) <= 1.0


def test_qc_roll_syndrome_matches_generic_gather():
    """QCDecoder.syndrome_from_bits (circulant rolls — the engine hot path)
    must agree bit-exactly with the expanded-graph gather+popcount
    (TannerGraph.syndrome_from_bits) for every word."""
    import numpy as np

    base, vid, cid = make_qc_ldpc(nb_v=36, z=50, dv=3, dc=6, seed=3)
    dec = QCDecoder(base, 50, use_pallas=False)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(0, 2, (dec.vnum, 8)), jnp.int32)
    got = np.asarray(dec.syndrome_from_bits(w))
    ref = np.asarray(dec.graph.syndrome_from_bits(w))
    assert np.array_equal(got, ref)


def test_detect_qc_roundtrip(qc):
    """detect_qc recovers the exact lifting from an expanded edge list."""
    from qamreconciliation_tpu.models.qc_decoder import detect_qc

    base, vid, cid = qc
    got = detect_qc(vid, cid)
    assert got is not None
    got_base, got_z = got
    assert got_z == 16
    assert sorted(got_base) == sorted(base)


def test_detect_qc_lifted_decoder_matches_generic(qc):
    """A decoder lifted from the expanded list decodes identically to the
    generic decoder on the same edges."""
    from qamreconciliation_tpu.models.qc_decoder import detect_qc

    base, vid, cid = qc
    got_base, got_z = detect_qc(vid, cid)
    qdec = QCDecoder(got_base, got_z, dtype=jnp.float64)
    gdec = Decoder(vid, cid, dtype=jnp.float64)
    mat = Matrix(vid, cid)
    rng = np.random.default_rng(2)
    B = 4
    word = rng.integers(0, 2, (B, qdec.vnum))
    synd = np.asarray(mat.eval_syndrome(word))
    llr = (1 - 2 * word) * 3.0 + rng.normal(0, 2.0, (B, qdec.vnum))
    s1, i1, f1 = gdec.decode_batch(llr, synd, 25)
    s2, i2, f2 = qdec.decode_batch(llr, synd, 25)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_detect_qc_rejects_unstructured():
    from qamreconciliation_tpu.models.qc_decoder import detect_qc
    from qamreconciliation_tpu.utils.edgefile import make_regular_ldpc

    vid, cid = make_regular_ldpc(120, 3, 6, seed=9)
    assert detect_qc(vid, cid) is None
