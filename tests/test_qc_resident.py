"""VMEM-resident multi-iteration QC decoder: parity with the dense path.

``QCDecoder(resident=True)`` runs K flooding iterations per Pallas kernel
dispatch with the whole decode state in VMEM (ops/pallas_kernels.py:
bp_decode_rounds_qc).  The kernel mirrors the dense path's reduction and
accumulation orders, so for the min-sum rule (min/compare/select — exact
ops) the (success, iters, final) triple must be BIT-IDENTICAL to
``_build_dense`` with the XLA check phase; sum-product agrees on
(success, iters) with final LLRs equal to f32 summation-order tolerance.
Convergence semantics per reference: qamreconciliation/decoder.pyx:391-436.
Tests run the Pallas interpreter on CPU (conftest forces the CPU backend).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qamreconciliation_tpu import Matrix
from qamreconciliation_tpu.models.qc_decoder import QCDecoder, make_qc_ldpc


@pytest.fixture(scope="module")
def qc():
    base, vid, cid = make_qc_ldpc(nb_v=12, z=16, dv=3, dc=6, seed=4)
    return base, vid, cid


def _frames(qc, B, seed=1, noise=2.0):
    base, vid, cid = qc
    mat = Matrix(vid, cid)
    rng = np.random.default_rng(seed)
    V = 12 * 16
    word = rng.integers(0, 2, (B, V))
    synd = np.asarray(mat.eval_syndrome(word))
    llr = (1 - 2 * word) * 3.0 + rng.normal(0, noise, (B, V))
    return llr, synd


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_resident_matches_dense_minsum(qc, dtype):
    """min-sum: bit-identical (success, iters, final) vs the dense XLA
    path — same reduction orders, exact select arithmetic."""
    base, _, _ = qc
    dense = QCDecoder(base, 16, dtype=dtype, use_pallas=False,
                      check_rule="minsum")
    res = QCDecoder(base, 16, dtype=dtype, check_rule="minsum",
                    resident=True, resident_chunk=4)
    llr, synd = _frames(qc, B=8)
    s1, i1, f1 = dense.decode_batch(llr, synd, 30)
    s2, i2, f2 = res.decode_batch(llr, synd, 30)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(
        np.asarray(f1, np.float32), np.asarray(f2, np.float32)
    )
    assert int(np.asarray(s1).sum()) > 0        # some frames converge
    assert int(np.asarray(i1).max()) > 0        # ... after real iterations


def test_resident_matches_dense_sumproduct(qc):
    """sum-product: (success, iters) identical; final LLRs to f32
    summation-order tolerance (the kernel's running phi sum vs XLA's
    reduce order)."""
    base, _, _ = qc
    dense = QCDecoder(base, 16, dtype=jnp.float32, use_pallas=False)
    res = QCDecoder(base, 16, dtype=jnp.float32, resident=True,
                    resident_chunk=4)
    llr, synd = _frames(qc, B=8, seed=3)
    s1, i1, f1 = dense.decode_batch(llr, synd, 25)
    s2, i2, f2 = res.decode_batch(llr, synd, 25)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(f1), np.asarray(f2), rtol=2e-4, atol=2e-4
    )


def test_resident_chunk_overrun_and_passthrough(qc):
    """maxiter not divisible by the chunk: iterations past maxiter are
    in-kernel no-ops, so failed frames' finals snapshot exactly at
    maxiter; already-consistent inputs pass through with iters == 0
    (reference: decoder.pyx:402-405)."""
    base, _, _ = qc
    dense = QCDecoder(base, 16, dtype=jnp.float32, use_pallas=False,
                      check_rule="minsum")
    res = QCDecoder(base, 16, dtype=jnp.float32, check_rule="minsum",
                    resident=True, resident_chunk=4)
    llr, synd = _frames(qc, B=8, seed=7, noise=3.0)
    for maxiter in (0, 1, 7):
        s1, i1, f1 = dense.decode_batch(llr, synd, maxiter)
        s2, i2, f2 = res.decode_batch(llr, synd, maxiter)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(
            np.asarray(f1, np.float32), np.asarray(f2, np.float32)
        )
    # iters == 0 passthrough: decode a consistent word's own syndrome
    word = (np.asarray(llr) < 0).astype(np.int64)
    mat = Matrix(*_expanded(qc))
    synd_ok = np.asarray(mat.eval_syndrome(word))
    s, i, f = res.decode_batch(llr, synd_ok, 10)
    assert bool(np.asarray(s).all())
    np.testing.assert_array_equal(np.asarray(i), 0)
    np.testing.assert_allclose(np.asarray(f), np.asarray(llr, np.float32))


def _expanded(qc):
    _, vid, cid = qc
    return vid, cid


def test_resident_option_validation(qc):
    base, _, _ = qc
    # resident + layered is now a SUPPORTED combination (the VMEM-
    # resident serial-C kernel, late round 4); compressed still refuses
    dec = QCDecoder(base, 16, resident=True, schedule="layered")
    assert dec.resident and dec.schedule == "layered"
    with pytest.raises(ValueError):
        QCDecoder(base, 16, resident=True, compressed=True,
                  check_rule="minsum")


def test_resident_composes_with_engine_scan(qc):
    """The resident decoder must ride the engine's rounds_per_dispatch
    lax.scan (pallas_call inside a scan body) and produce counters that
    statistically match the dense decoder on the same seeds."""
    import jax.numpy as jnp

    from qamreconciliation_tpu import Matrix, PAMAlphabet
    from qamreconciliation_tpu.sims.engine import ReconciliationEngine

    base, vid, cid = qc
    mat = Matrix(vid, cid)
    pa = PAMAlphabet(2, 2.0)
    dense = QCDecoder(base, 16, dtype=jnp.float32, use_pallas=False,
                      check_rule="minsum")
    res = QCDecoder(base, 16, dtype=jnp.float32, check_rule="minsum",
                    resident=True, resident_chunk=4)
    kw = dict(batch=8, dtype=jnp.float32, rounds_per_dispatch=2)
    r1 = ReconciliationEngine(dense, mat, pa, **kw).run_point(
        "softening", 6.0, 10, 16, 10 ** 9, seed=3
    )
    r2 = ReconciliationEngine(res, mat, pa, **kw).run_point(
        "softening", 6.0, 10, 16, 10 ** 9, seed=3
    )
    assert r1.frames == r2.frames
    # same seeds + bit-identical decode => identical counters
    assert (r1.ber, r1.fer, r1.iters) == (r2.ber, r2.fer, r2.iters)


def test_resident_composes_with_frame_shard_dp(qc):
    """Resident decoder inside shard_map (frame-shard DP, 2-way virtual
    mesh): per-device pallas_call + psum counters must reproduce the
    dense sharded round exactly (same per-device seeds)."""
    import jax.numpy as jnp

    from qamreconciliation_tpu import Matrix, PAMAlphabet
    from qamreconciliation_tpu.parallel import make_mesh
    from qamreconciliation_tpu.sims.engine import ReconciliationEngine

    base, vid, cid = qc
    mat = Matrix(vid, cid)
    pa = PAMAlphabet(2, 2.0)
    mesh = make_mesh(2)
    dense = QCDecoder(base, 16, dtype=jnp.float32, use_pallas=False,
                      check_rule="minsum")
    res = QCDecoder(base, 16, dtype=jnp.float32, check_rule="minsum",
                    resident=True, resident_chunk=4)
    kw = dict(batch=8, dtype=jnp.float32, mesh_axis=(mesh, "dp"))
    r1 = ReconciliationEngine(dense, mat, pa, **kw).run_point(
        "softening", 6.0, 10, 16, 10 ** 9, seed=5
    )
    r2 = ReconciliationEngine(res, mat, pa, **kw).run_point(
        "softening", 6.0, 10, 16, 10 ** 9, seed=5
    )
    assert r1.frames == r2.frames
    assert (r1.ber, r1.fer, r1.iters) == (r2.ber, r2.fer, r2.iters)


def test_resident_sumproduct_tanhfb_equivalence(qc):
    """The tanh-F/B sum-product factorization (resident_phi="tanhfb", the
    bf16 auto default) computes the same box-plus reduction as the phi
    form — same success/iters on these frames, extrinsic LLRs equal to
    f32 rounding except where the phi form exceeds tanhfb's ~16.6
    saturation (both beyond BP decision levels)."""
    base, _, _ = qc
    dense = QCDecoder(base, 16, dtype=jnp.bfloat16, use_pallas=False)
    res = QCDecoder(base, 16, dtype=jnp.bfloat16, resident=True,
                    resident_chunk=4, resident_phi="tanhfb")
    llr, synd = _frames(qc, B=8, seed=11)
    s1, i1, f1 = dense.decode_batch(llr, synd, 25)
    s2, i2, f2 = res.decode_batch(llr, synd, 25)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    a = np.asarray(f1, np.float32)
    b = np.asarray(f2, np.float32)
    sat = 14.0     # compare only below tanhfb's per-message saturation
    m = (np.abs(a) < sat) & (np.abs(b) < sat)
    assert m.mean() > 0.5
    np.testing.assert_allclose(a[m], b[m], rtol=0.05, atol=0.3)
    assert (np.sign(a) == np.sign(b)).mean() > 0.99


def test_dense_sumproduct_tanhfb_equivalence(qc):
    """check_phi="tanhfb" on the DENSE path (XLA + fused Pallas check
    phase): same success/iters as the phi form on these frames, LLRs
    close below the tanhfb saturation."""
    base, _, _ = qc
    phi = QCDecoder(base, 16, dtype=jnp.bfloat16, use_pallas=False)
    for use_pallas in (False, True):
        fb = QCDecoder(base, 16, dtype=jnp.bfloat16, use_pallas=use_pallas,
                       check_phi="tanhfb")
        llr, synd = _frames(qc, B=8, seed=13)
        s1, i1, f1 = phi.decode_batch(llr, synd, 25)
        s2, i2, f2 = fb.decode_batch(llr, synd, 25)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        a = np.asarray(f1, np.float32)
        b = np.asarray(f2, np.float32)
        m = (np.abs(a) < 14.0) & (np.abs(b) < 14.0)
        assert m.mean() > 0.5
        np.testing.assert_allclose(a[m], b[m], rtol=0.05, atol=0.3)


def test_resident_cli_plumbing(tmp_path, qc):
    """--resident / --check-phi reach the decoder through every
    load_decoder CLI; a tiny BSC sweep runs end-to-end (interpret mode)."""
    from qamreconciliation_tpu.models.qc_decoder import save_qc_csv
    from qamreconciliation_tpu.sims import sim_bsc

    base, _, _ = qc
    code = tmp_path / "qc.csv"
    out = tmp_path / "out.csv"
    save_qc_csv(str(code), base, 16)
    sim_bsc.main([str(code), "--qc", "--resident", "--resident-chunk", "4",
                  "--out", str(out), "--rber", "0.02", "0.02",
                  "--rpoints", "1", "--simloops", "16", "--batch", "16",
                  "--maxiter", "8", "--minerr", "1000000"])
    import pandas as pd

    df = pd.read_csv(str(out))
    assert list(df.columns[1:]) == ["f", "ber", "fer", "iters"]


def test_generic_decoder_tanhfb_equivalence():
    """check_phi="tanhfb" on the GENERIC gather decoder (XLA + fused
    Pallas check phase, padded slots riding the large sentinel): same
    success/iters as the phi form, LLRs close below saturation."""
    from qamreconciliation_tpu.models.decoder import Decoder
    from qamreconciliation_tpu.utils.edgefile import make_regular_ldpc

    vid, cid = make_regular_ldpc(192, dv=3, dc=6, seed=9)
    mat = Matrix(vid, cid)
    rng = np.random.default_rng(21)
    word = rng.integers(0, 2, (8, 192))
    synd = np.asarray(mat.eval_syndrome(word))
    llr = (1 - 2 * word) * 3.0 + rng.normal(0, 2.0, (8, 192))

    phi = Decoder(vid, cid, dtype=jnp.bfloat16, use_pallas=False)
    for use_pallas in (False, True):
        fb = Decoder(vid, cid, dtype=jnp.bfloat16, use_pallas=use_pallas,
                     check_phi="tanhfb")
        s1, i1, f1 = phi.decode_batch(llr, synd, 25)
        s2, i2, f2 = fb.decode_batch(llr, synd, 25)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        a = np.asarray(f1, np.float32)
        b = np.asarray(f2, np.float32)
        m = (np.abs(a) < 14.0) & (np.abs(b) < 14.0)
        assert m.mean() > 0.5
        np.testing.assert_allclose(a[m], b[m], rtol=0.05, atol=0.3)


def test_resident_layout_defaults():
    """Regression (round-4 review): resident_double=None resolves OFF
    (doubled totals are a measured regression), and totals_dtype='float32'
    never downcasts float64 totals (f64 parity runs keep f64 end to
    end) while still widening bf16."""
    import jax.numpy as jnp
    from qamreconciliation_tpu.models.qc_decoder import QCDecoder, make_qc_ldpc

    base, _, _ = make_qc_ldpc(36, 1800, dv=3, dc=6, seed=12345)
    dec = QCDecoder(base, 1800, dtype=jnp.bfloat16, resident=True)
    assert dec._resident_layout(128) == (False, False)
    dec = QCDecoder(base, 1800, dtype=jnp.bfloat16, resident=True,
                    totals_dtype="float32")
    assert dec._resident_layout(128) == (False, True)
    dec = QCDecoder(base, 1800, dtype=jnp.float64, resident=True,
                    totals_dtype="float32")
    assert dec._resident_layout(128) == (False, False)
    dec = QCDecoder(base, 1800, dtype=jnp.bfloat16, resident=True,
                    resident_double=True)
    assert dec._resident_layout(128)[0] is True


# --------------------------------------------------------------------- #
# Row-grouped pass 1 (irregular wide rows): the round-4 VMEM-OOM fix.
# Wide check rows split into dc-bounded subgroups merged with each rule's
# associative factorization (ops/pallas_kernels._grouped_row): min-sum is
# bit-exact (min associative, ties preserved), phi/tanhfb reassociate f32
# sums/products.  Real irregular codes (IRA-style DVB-S2, reference:
# sims/display_biawgn.py:30-35 / the jagged decoder decoder.pyx:60-89)
# now ride the resident kernel.


@pytest.fixture(scope="module")
def ira():
    from qamreconciliation_tpu.models.qc_decoder import make_qc_ira

    base, vid, cid = make_qc_ira(6, 6, 16, dv=3, seed=3)
    return base, vid, cid


def _ira_frames(ira, B, seed=7):
    base, vid, cid = ira
    mat = Matrix(vid, cid)
    rng = np.random.default_rng(seed)
    V = (max(v for _, v, _ in base) + 1) * 16
    word = rng.integers(0, 2, (B, V))
    synd = np.asarray(mat.eval_syndrome(word))
    llr = (1 - 2 * word) * 3.0 + rng.normal(0, 1.2, (B, V))
    return llr, synd


def test_rowgroup_minsum_bit_identical(ira):
    """Grouped min-sum resident == dense min-sum, bit for bit, on an
    irregular IRA code (cap forces every row wider than 3 to split)."""
    base, _, _ = ira
    dense = QCDecoder(base, 16, dtype=jnp.float32, use_pallas=False,
                      check_rule="minsum")
    grp = QCDecoder(base, 16, dtype=jnp.float32, check_rule="minsum",
                    resident=True, resident_chunk=4, resident_rowgroup=3)
    llr, synd = _ira_frames(ira, B=8)
    s1, i1, f1 = dense.decode_batch(llr, synd, 30)
    s2, i2, f2 = grp.decode_batch(llr, synd, 30)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert int(np.asarray(s1).sum()) > 0


@pytest.mark.parametrize("phi", ["phi", "tanhfb"])
def test_rowgroup_sumproduct_matches_ungrouped(ira, phi):
    """Grouped sum-product resident matches the ungrouped resident kernel
    on (success, iters) exactly and finals to f32 reassociation
    tolerance, for both magnitude implementations."""
    base, _, _ = ira
    r0 = QCDecoder(base, 16, dtype=jnp.float32, resident=True,
                   resident_chunk=4, resident_rowgroup=0, resident_phi=phi)
    rg = QCDecoder(base, 16, dtype=jnp.float32, resident=True,
                   resident_chunk=4, resident_rowgroup=3, resident_phi=phi)
    llr, synd = _ira_frames(ira, B=8, seed=11)
    s1, i1, f1 = r0.decode_batch(llr, synd, 25)
    s2, i2, f2 = rg.decode_batch(llr, synd, 25)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(f1), np.asarray(f2), rtol=2e-4, atol=2e-4
    )
    assert int(np.asarray(s1).sum()) > 0


def test_rowgroup_auto_policy_and_validation():
    """Auto grouping engages only when it strictly reduces the chunk
    count: small-z codes and regular dc=6 at DVB-S2 scale stay
    ungrouped; a dc_max=10 irregular code at z=1800 groups to a cap
    whose pick returns to the few-chunk regime.  resident_rowgroup=1 is
    rejected."""
    from qamreconciliation_tpu.ops.pallas_kernels import (
        _pick_rowgroup, _pick_zchunk, _split_row,
    )

    assert _pick_rowgroup(16, 8, 7) is None          # small z: fits whole
    assert _pick_rowgroup(1800, 128, 6) is None      # regular DVB-S2: nzc=2
    cap = _pick_rowgroup(1800, 128, 10)              # irregular DVB-S2
    assert cap is not None and 4 <= cap <= 8
    zc_g = _pick_zchunk(1800, B=128, dc=cap)
    assert 1800 // zc_g < 1800 // _pick_zchunk(1800, B=128, dc=10)
    assert _split_row(10, 6) == [(0, 5), (5, 10)]
    assert _split_row(7, 6) == [(0, 4), (4, 7)]
    assert _split_row(6, 6) == [(0, 6)]
    base, _, _ = make_qc_ldpc(12, 16, dv=3, dc=6, seed=4)
    with pytest.raises(ValueError, match="resident_rowgroup"):
        QCDecoder(base, 16, resident=True, resident_rowgroup=1)


def test_resident_unaligned_z_and_doubled_guard():
    """z not divisible by 8 (e.g. the z=450 N=16200 bench-smoke shape)
    must work in the default undoubled layout — the state DMAs use full
    refs, not [:, 0:z] slices (Mosaic rejects sublane-misaligned slice
    DMAs) — while the doubled layout, whose half-slice DMAs genuinely
    need the alignment, refuses loudly."""
    base, vid, cid = make_qc_ldpc(12, 12, dv=3, dc=6, seed=8)
    dense = QCDecoder(base, 12, dtype=jnp.float32, use_pallas=False,
                      check_rule="minsum")
    res = QCDecoder(base, 12, dtype=jnp.float32, check_rule="minsum",
                    resident=True, resident_chunk=4)
    mat = Matrix(vid, cid)
    rng = np.random.default_rng(2)
    word = rng.integers(0, 2, (6, 12 * 12))
    synd = np.asarray(mat.eval_syndrome(word))
    llr = (1 - 2 * word) * 3.0 + rng.normal(0, 1.5, word.shape)
    s1, i1, f1 = dense.decode_batch(llr, synd, 25)
    s2, i2, f2 = res.decode_batch(llr, synd, 25)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    dbl = QCDecoder(base, 12, dtype=jnp.float32, check_rule="minsum",
                    resident=True, resident_chunk=4, resident_double=True)
    with pytest.raises(ValueError, match="z % 8"):
        dbl.decode_batch(llr, synd, 25)


# ----------------------------------------------- resident layered sweeps


@pytest.mark.parametrize("rule,kw", [
    ("minsum", {}),
    ("sumproduct", {"check_phi": "phi"}),
    ("sumproduct", {"check_phi": "tanhfb"}),
])
def test_resident_layered_matches_xla_layered(qc, rule, kw):
    """The VMEM-resident serial-C kernel (schedule='layered',
    resident=True) mirrors the XLA layered loop's row/edge order and
    f32 delta accumulation: min-sum is bit-identical on
    (success, iters, final); sum-product agrees to f32 tolerance."""
    base, _, _ = qc
    xla = QCDecoder(base, 16, dtype=jnp.float32, schedule="layered",
                    check_rule=rule, layered_chunk=3, **kw)
    res = QCDecoder(base, 16, dtype=jnp.float32, schedule="layered",
                    check_rule=rule, layered_chunk=3, resident=True, **kw)
    llr, synd = _frames(qc, B=8, seed=17)
    s1, i1, f1 = xla.decode_batch(llr, synd, 25)
    s2, i2, f2 = res.decode_batch(llr, synd, 25)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    if rule == "minsum":
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    else:
        np.testing.assert_allclose(
            np.asarray(f1), np.asarray(f2), rtol=2e-4, atol=2e-4
        )
    assert int(np.asarray(s1).sum()) > 0


def test_resident_layered_passthrough_and_guards(qc):
    """iters==0 passthrough on consistent input (frozen from sweep 0);
    float64 and non-viable shapes refuse loudly."""
    base, vid, cid = qc
    res = QCDecoder(base, 16, dtype=jnp.float32, schedule="layered",
                    check_rule="minsum", resident=True)
    rng = np.random.default_rng(3)
    B = 4
    word = rng.integers(0, 2, (B, res.vnum))
    synd = np.asarray(Matrix(vid, cid).eval_syndrome(word))
    clean = (1 - 2 * word) * 5.0
    s, i, f = res.decode_batch(clean, synd, 20)
    assert np.asarray(s).all()
    np.testing.assert_array_equal(np.asarray(i), 0)
    np.testing.assert_array_equal(np.asarray(f), clean)
    with pytest.raises(ValueError, match="float64"):
        QCDecoder(base, 16, dtype=jnp.float64, schedule="layered",
                  resident=True).decode_batch(clean, synd, 5)
    from qamreconciliation_tpu.ops.pallas_kernels import (
        layered_resident_viable,
    )

    assert layered_resident_viable(res._rows, 16, 8)
    assert layered_resident_viable(res._rows, 360, 128)
    assert not layered_resident_viable(res._rows, 1800, 128)  # value budget
    assert not layered_resident_viable(res._rows, 450, 128)   # unaligned z
