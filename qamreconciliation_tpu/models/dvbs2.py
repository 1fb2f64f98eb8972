"""DVB-S2 LDPC code construction (ETSI EN 302 307-1 Annex B/C).

The reference's flagship experiments run the real DVB-S2 LDPC codes —
rate 1/2 (reference: sims/display_biawgn.py:30-35, the
``res_dvbs2ldpc0.500_*`` CSVs) and rate 3/4 (reference:
sims/display_bsc.py:20-22) — consumed as expanded edge lists by the
fully general jagged-table decoder (reference:
qamreconciliation/decoder.pyx:60-89).  This module implements the
standard's *construction* exactly:

* the Annex B/C encoding rule: information bit ``i = 360*g + m`` of
  bit-group ``g`` accumulates into parity addresses
  ``(x + m*q) mod (N-K)`` for every address ``x`` in table row ``g``,
  followed by the bit-level accumulator ``p_j ^= p_{j-1}``;
* the systematic encoder implied by it (:func:`encode`);
* the blocked re-indexing under which the standard's H is quasi-cyclic
  with circulant size **z = 360** (:func:`to_qc_base`): parity/check
  index ``j`` maps to block ``j mod q``, offset ``j // q``, turning each
  address ``x = a + q*b`` into a shift-``b`` circulant in check block
  ``a`` — the q-interleaved accumulator becomes a block staircase of
  identities plus one shift-1 wrap circulant that is *deficient by
  exactly one edge* (the standard's accumulator has no ``p_{-1}``);
* a parser for the standard's Annex B/C integer tables
  (:func:`parse_address_table`) so the exact published rows drop in
  verbatim.

**Table provenance.**  This build environment has no copy of the ETSI
tables (zero network egress, none on disk — see BASELINE.md round 5),
and hallucinating ~450 integers from memory would be worse than honest
absence.  The shipped tables (:func:`make_table`) are therefore
SYNTHETIC: random addresses with the standard's exact frame structure —
N, K, q, rows-per-degree and hence the standard's exact degree profile
(rate 1/2: 36 rows of 8 + 54 rows of 3 -> bit degrees {8: 12960,
3: 19440, 2: 32399, 1: 1} and uniform check degree 7; rate 3/4: 15 rows
of 12 + 120 rows of 3, check degree 14; likewise 2/3 and 5/6).  Every
arithmetic invariant of the construction is unit-tested
(tests/test_dvbs2.py); a user holding EN 302 307-1 pastes the Annex B/C
rows into :func:`parse_address_table` and gets the exact standard code
through the same machinery.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "Z", "Dvbs2Table", "make_table", "parse_address_table", "encode",
    "expanded_edges", "to_qc_base", "blocked_perms", "RATE_PROFILES",
    "four_cycle_count",
]

Z = 360   # the standard's universal lifting / bit-group size


# (N, rate) -> list of (row_count, row_degree): the standard's Annex B
# information-part structure.  K = 360 * sum(row_count); q = (N-K)/360.
# Row counts/degrees reproduce the published degree distributions
# (e.g. rate 1/2: 12960 degree-8 + 19440 degree-3 information bits,
# uniform check degree (K*dv_avg)/(N-K) + 2).
RATE_PROFILES = {
    (64800, "1/2"): [(36, 8), (54, 3)],
    (64800, "2/3"): [(12, 13), (108, 3)],
    (64800, "3/4"): [(15, 12), (120, 3)],
    (64800, "5/6"): [(15, 13), (135, 3)],
}


@dataclass
class Dvbs2Table:
    """An Annex B/C-format LDPC definition: frame length, info length,
    and the per-bit-group parity-address rows."""

    n: int
    k: int
    rows: list = field(default_factory=list)   # list[list[int]]
    source: str = "synthetic"

    @property
    def m(self) -> int:       # parity count
        return self.n - self.k

    @property
    def q(self) -> int:       # accumulator spacing = parity block count
        return self.m // Z

    def validate(self):
        if self.n % Z or self.k % Z:
            raise ValueError("N and K must be multiples of 360")
        if len(self.rows) != self.k // Z:
            raise ValueError(
                f"need K/360 = {self.k // Z} address rows, got "
                f"{len(self.rows)}"
            )
        for g, row in enumerate(self.rows):
            if len(row) < 1:
                raise ValueError(f"row {g} is empty")
            if len(set(row)) != len(row):
                raise ValueError(f"row {g} has duplicate addresses")
            for x in row:
                if not (0 <= x < self.m):
                    raise ValueError(
                        f"row {g} address {x} outside [0, {self.m})"
                    )
        return self

    def check_degrees(self):
        """Expanded-H check-node degree histogram {degree: count}."""
        deg = np.full(self.m, 2, np.int64)     # staircase p_j, p_{j-1}
        deg[0] = 1                             # check 0 has no p_{-1}
        q = self.q
        for row in self.rows:
            for x in row:
                # addresses (x + m*q) mod M over m cover block x%q at
                # every offset once: +1 to each of its 360 checks
                a = x % q
                deg[a::q] += 1
        vals, cnts = np.unique(deg, return_counts=True)
        return {int(v): int(c) for v, c in zip(vals, cnts)}


def parse_address_table(text: str, n: int, k: int,
                        source: str = "annex-b") -> Dvbs2Table:
    """Parse the standard's Annex B/C table text (one whitespace-separated
    integer row per bit-group, blank lines ignored) into a
    :class:`Dvbs2Table`.  Use this to drop the exact published rows in."""
    rows = []
    for line in text.strip().splitlines():
        line = line.strip().replace(",", " ")
        if not line:
            continue
        rows.append([int(t) for t in line.split()])
    return Dvbs2Table(n=n, k=k, rows=rows, source=source).validate()


def make_table(rate: str, n: int = 64800, seed: int = 0,
               girth6: bool = True, girth: int = 6) -> Dvbs2Table:
    """Structure-exact SYNTHETIC Annex-B-format table for ``rate``.

    Frame layout (N, K, q, rows-per-degree — hence bit/check degree
    profiles) matches the standard exactly; the addresses themselves are
    uniform random (see the module docstring's provenance note).
    Addresses are drawn distinct within each row, and repaired so no two
    rows place two equal-shift edges in the same (check-block, bit-group)
    cell — parallel circulants with equal shifts would cancel mod 2
    (cannot happen with the real tables either: distinct addresses give
    distinct (block, shift) pairs; across-row collisions are allowed as
    they hit different bit-groups).
    """
    key = (int(n), rate)
    if key not in RATE_PROFILES:
        raise ValueError(
            f"no profile for N={n} rate={rate}; have "
            f"{sorted(RATE_PROFILES)}"
        )
    profile = RATE_PROFILES[key]
    k = Z * sum(cnt for cnt, _ in profile)
    m = n - k
    q = m // Z
    degs = [deg for cnt, deg in profile for _ in range(cnt)]
    total = sum(degs)
    if total % q:
        raise AssertionError("profile/q mismatch: cannot balance blocks")
    rng = np.random.default_rng(seed)
    # The real tables spread addresses EXACTLY evenly over the q parity
    # blocks (that is what makes the standard's check degrees uniform:
    # e.g. rate 1/2 -> 450 addresses / 90 blocks = 5 + 2 staircase = 7).
    # Assign each block total/q slots, shuffle, then draw shifts.
    blocks = np.repeat(np.arange(q), total // q)
    for _ in range(1000):
        blocks = blocks[rng.permutation(total)]
        rows, pos, ok = [], 0, True
        for deg in degs:
            a = blocks[pos:pos + deg]
            b = rng.integers(0, Z, deg)
            x = a + q * b.astype(np.int64)
            for _ in range(100):        # distinct addresses within a row
                _, first = np.unique(x, return_index=True)
                dup = np.ones(deg, bool)
                dup[first] = False
                if not dup.any():
                    break
                b[dup] = rng.integers(0, Z, int(dup.sum()))
                x = a + q * b.astype(np.int64)
            else:
                ok = False
                break
            rows.append([int(v) for v in x])
            pos += deg
        if ok and girth6:
            # the published tables are selected 4-cycle-free (expanded
            # girth >= 6); condition the synthetic ones the same way by
            # redrawing colliding info shifts (round 5 — this removed
            # the measured sub-knee FER floor of the unconditioned
            # rate-3/4 draw, BASELINE.md round 5)
            ok = _girth6_repair(rows, q, k // Z, rng)
        if ok and girth >= 8:
            # OPTIONAL girth-8 pass (exceeds the standard's own
            # conditioning): break every block-level 6-cycle witness by
            # redrawing one participating info shift, re-running the
            # 4-cycle repair after each pass.  Typical synthetic draws
            # carry only ~10 witnesses at rate 1/2, so this converges
            # in a few passes.
            for _ in range(200):
                wits = six_cycle_witnesses(rows, q, k // Z)
                wits = [w for w in wits if w]
                if not wits:
                    break
                for w in wits:
                    g, idx = w[int(rng.integers(0, len(w)))]
                    a = rows[g][idx] % q
                    for _ in range(100):
                        nx = a + q * int(rng.integers(0, Z))
                        if nx not in rows[g]:
                            rows[g][idx] = nx
                            break
                if not _girth6_repair(rows, q, k // Z, rng):
                    ok = False
                    break
            else:
                ok = False
            if ok and [w for w in six_cycle_witnesses(rows, q, k // Z)
                       if w]:
                ok = False
        if ok:
            return Dvbs2Table(n=n, k=k, rows=rows,
                              source=f"synthetic-{rate}"
                                     + ("-g8" if girth >= 8 else "")
                              ).validate()
    raise RuntimeError("could not draw a duplicate-free table")


def _staircase_cells(nbi: int, q: int):
    """The accumulator's fixed base cells ``(check_block, var_block,
    shift)`` in blocked coordinates (incl. the wrap circulant — its one
    missing edge still leaves 359 lanes that can participate in
    cycles)."""
    cells = []
    for u in range(q):
        cells.append((u, nbi + u, 0))
        if u > 0:
            cells.append((u, nbi + u - 1, 0))
    cells.append((0, nbi + q - 1, 1))
    return cells


def four_cycle_count(table: Dvbs2Table) -> int:
    """Number of BLOCK-level 4-cycle witnesses in the full base graph
    (info cells + accumulator).  Two cells in check blocks a1 != a2
    joining the same var-block pair (v1, v2) close length-4 cycles in
    the expanded H iff their shift differences agree mod 360; a
    parallel pair in ONE cell closes them iff the shift difference is
    180 (2*(b1-b2) = 0 mod 360).  Zero means expanded girth >= 6 —
    the property the standard's published tables are selected for."""
    q, nbi = table.q, table.k // Z
    cells = _staircase_cells(nbi, q)
    for g, row in enumerate(table.rows):
        for x in row:
            cells.append((x % q, g, x // q))
    by_a = {}
    for (a, v, b) in cells:
        by_a.setdefault(a, []).append((v, b))
    seen, bad = {}, 0
    for a, lst in by_a.items():
        for i in range(len(lst)):
            for j in range(i + 1, len(lst)):
                (v1, b1), (v2, b2) = lst[i], lst[j]
                if v1 == v2:                       # parallel circulants
                    if (2 * (b1 - b2)) % Z == 0:
                        bad += 1
                    continue
                if v1 > v2:
                    (v1, b1), (v2, b2) = (v2, b2), (v1, b1)
                key = (v1, v2, (b1 - b2) % Z)
                if key in seen and seen[key] != a:
                    bad += 1
                else:
                    seen[key] = a
    return bad


def six_cycle_witnesses(rows, q, nbi):
    """Block-level 6-cycle witnesses of the full base graph: triples of
    cells in distinct check blocks joining a var-block triangle with
    shift-sum ``(b12 + b23 + b31) % Z == 0`` (each witness expands to
    z = 360 length-6 cycles in H).  Returns a list of witnesses, each a
    list of the participating redrawable info cells ``(g, idx)`` (empty
    for staircase-only witnesses)."""
    cells = [(a, v, b, None) for (a, v, b) in _staircase_cells(nbi, q)]
    for g, row in enumerate(rows):
        for idx, x in enumerate(row):
            cells.append((x % q, g, x // q, (g, idx)))
    by_a = {}
    for c in cells:
        by_a.setdefault(c[0], []).append(c)
    P = {}
    for a, lst in by_a.items():
        for i in range(len(lst)):
            for j in range(len(lst)):
                if i == j:
                    continue
                (_, v1, b1, r1), (_, v2, b2, r2) = lst[i], lst[j]
                if v1 == v2:
                    continue
                P.setdefault((v1, v2), []).append((a, (b1 - b2) % Z, r1, r2))
    neigh = {}
    for (v1, v2) in P:
        if v1 < v2:
            neigh.setdefault(v1, set()).add(v2)
            neigh.setdefault(v2, set()).add(v1)
    out = []
    for v1 in sorted(neigh):
        for v2 in sorted(x for x in neigh[v1] if x > v1):
            for v3 in sorted(x for x in (neigh[v1] & neigh[v2]) if x > v2):
                for (a1, w12, r11, r12) in P[(v1, v2)]:
                    for (a2, w23, r22, r23) in P[(v2, v3)]:
                        if a2 == a1:
                            continue
                        for (a3, w31, r33, r31) in P[(v3, v1)]:
                            if a3 in (a1, a2):
                                continue
                            if (w12 + w23 + w31) % Z == 0:
                                out.append([r for r in
                                            (r11, r12, r22, r23, r33, r31)
                                            if r is not None])
    return out


def _girth6_repair(rows, q, nbi, rng, max_passes: int = 500):
    """Redraw info-address SHIFTS until the block-level base graph has
    no 4-cycles (expanded girth >= 6).  Only the redrawable info cells
    move; the accumulator cells are the standard's fixed structure.
    Returns True on success (rows edited in place)."""
    for _ in range(max_passes):
        # cell index: (row g, idx) for info; None for staircase
        cells = [(a, v, b, None) for (a, v, b) in _staircase_cells(nbi, q)]
        for g, row in enumerate(rows):
            for idx, x in enumerate(row):
                cells.append((x % q, g, x // q, (g, idx)))
        by_a = {}
        for c in cells:
            by_a.setdefault(c[0], []).append(c)
        seen = {}
        redraw = set()
        for a, lst in by_a.items():
            for i in range(len(lst)):
                for j in range(i + 1, len(lst)):
                    (_, v1, b1, r1), (_, v2, b2, r2) = lst[i], lst[j]
                    if v1 == v2:
                        if (2 * (b1 - b2)) % Z == 0:
                            redraw.add(r1 if r1 is not None else r2)
                        continue
                    if v1 > v2:
                        (v1, b1, r1), (v2, b2, r2) = (v2, b2, r2), \
                            (v1, b1, r1)
                    key = (v1, v2, (b1 - b2) % Z)
                    prev = seen.get(key)
                    if prev is not None and prev[0] != a:
                        cand = [r for r in (r1, r2, prev[1]) if r]
                        if not cand:        # staircase-only cycle:
                            return False    # structurally impossible
                        redraw.add(cand[0])
                    else:
                        seen[key] = (a, r1 if r1 is not None else r2)
        redraw.discard(None)
        if not redraw:
            return True
        for (g, idx) in redraw:
            x = rows[g][idx]
            a = x % q
            for _ in range(100):
                nb = int(rng.integers(0, Z))
                nx = a + q * nb
                if nx not in rows[g]:
                    rows[g][idx] = nx
                    break
    return False


def encode(table: Dvbs2Table, info_bits) -> np.ndarray:
    """Systematic Annex B/C encoder: ``[K] 0/1 -> [N] codeword`` in the
    standard's ORIGINAL bit order (info bits first, then parity bits
    ``p_0..p_{M-1}``).

    Algorithm (EN 302 307-1 B.1): zero parities; for info bit
    ``i = 360*g + m``, XOR it into ``p[(x + m*q) mod M]`` for every
    address ``x`` of row ``g``; finally ``p_j ^= p_{j-1}`` for
    ``j = 1..M-1``.
    """
    info = np.asarray(info_bits, np.int64).reshape(-1) & 1
    if info.size != table.k:
        raise ValueError(f"need {table.k} info bits, got {info.size}")
    m_idx = np.arange(Z, dtype=np.int64)
    q = table.q
    acc = np.zeros(table.m, np.int64)
    for g, row in enumerate(table.rows):
        bits = info[g * Z:(g + 1) * Z]
        for x in row:
            np.add.at(acc, (x + m_idx * q) % table.m, bits)
    # the bit accumulator p_j ^= p_{j-1} is a prefix-XOR = prefix-sum
    # parity over the pre-accumulator parity bits
    p = np.cumsum(acc & 1) & 1
    return np.concatenate([info, p]).astype(np.uint8)


def blocked_perms(table: Dvbs2Table):
    """Index maps between the standard's ORIGINAL ordering and the
    BLOCKED (quasi-cyclic) ordering.

    Blocked ordering: variable ``vb*360 + t`` / check ``cb*360 + t``
    with info blocks ``vb = g`` keeping their original offsets
    (``t = m`` — the info part is untouched) and parity/check index
    ``j`` mapping to block ``j mod q``, offset ``j // q`` (the
    q-interleave that renders the accumulator block-circulant).

    Returns ``(var_orig, chk_orig)``: ``var_orig[b]`` is the original
    variable index of blocked variable ``b`` (and likewise for checks),
    so ``word_blocked = word_orig[var_orig]``.
    """
    q = table.q
    j = np.arange(table.m, dtype=np.int64)
    # blocked parity (u, t) -> original parity index u + q*t
    u, t = j // Z, j % Z
    par_orig = table.k + (u + q * t)
    var_orig = np.concatenate([np.arange(table.k, dtype=np.int64), par_orig])
    chk_orig = u + q * t
    return var_orig, chk_orig


def to_qc_base(table: Dvbs2Table, wrap: str = "full"):
    """Quasi-cyclic base graph of the standard H in BLOCKED ordering.

    Every address ``x = a + q*b`` of row ``g`` becomes a shift-``b``
    circulant in cell (check block ``a``, info block ``g``); the
    accumulator becomes identity circulants on the double diagonal plus
    the shift-1 WRAP circulant (check block 0, last parity block) which
    the real H populates in only 359 of 360 lanes (``p_{-1}`` does not
    exist — the code is QC *up to one edge*).

    Args:
      wrap: ``"full"`` completes the wrap circulant — the QC fast paths
        (roll / resident / layered kernels) can then consume the code
        directly at the cost of ONE extra edge among ~2e5 (one check
        equation gains a term; FER impact measured nil — BASELINE.md
        round 5).  ``"exact"`` returns the deficient-wrap structure as
        ``(base_edges, missing)`` where ``missing`` identifies the
        blocked expanded edge to drop: ``(check 0, var (K/360+q-1)*360
        + 359)``.

    Returns ``base_edges`` (:class:`~qamreconciliation_tpu.models.
    qc_decoder.QCDecoder` convention ``[(cb, vb, shift), ...]``), plus
    ``missing`` when ``wrap="exact"``.
    """
    if wrap not in ("full", "exact"):
        raise ValueError(f"wrap must be 'full' or 'exact', got {wrap!r}")
    q = table.q
    nbi = table.k // Z
    cells = {}
    for g, row in enumerate(table.rows):
        for x in row:
            a, b = x % q, x // q
            key = (a, g, b)
            if key in cells:
                raise ValueError(
                    f"duplicate circulant (cb={a}, vb={g}, shift={b}): "
                    "equal-shift parallel edges cancel mod 2"
                )
            cells[key] = None
    base = sorted(cells)
    for u in range(q):
        base.append((u, nbi + u, 0))          # p_j diagonal
        if u > 0:
            base.append((u, nbi + u - 1, 0))  # p_{j-1} sub-diagonal
    base.append((0, nbi + q - 1, 1))          # wrap circulant (deficient)
    base.sort()
    if wrap == "full":
        return base
    missing = (0, (nbi + q - 1) * Z + (Z - 1))   # (check id, var id)
    return base, missing


def expanded_edges(table: Dvbs2Table, blocked: bool = True):
    """Exact expanded H edge list ``(vid, cid)`` of the standard code.

    ``blocked=True`` (default) emits the quasi-cyclic BLOCKED ordering
    (info bits keep their original indices; parity/check indices are
    q-interleaved — a pure relabeling, the code is identical); False
    emits the standard's original ordering.  The wrap circulant's
    missing edge is dropped either way, so this IS the standard H (up to
    the stated relabeling), suitable for the generic Decoder/Matrix and
    the reference-format edge CSVs.
    """
    base, (miss_c, miss_v) = to_qc_base(table, wrap="exact")
    k = np.arange(Z, dtype=np.int64)
    vid = np.concatenate([v * Z + k for (_, v, _) in base])
    cid = np.concatenate([c * Z + (k + s) % Z for (c, _, s) in base])
    keep = ~((vid == miss_v) & (cid == miss_c))
    vid, cid = vid[keep], cid[keep]
    if not blocked:
        var_orig, chk_orig = blocked_perms(table)
        vid = var_orig[vid]
        cid = chk_orig[cid]
    return vid, cid
