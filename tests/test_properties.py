"""Property-based checks (hypothesis) for the portability invariants the
oracle strategy rests on: portable rounding, universal-hash arithmetic, and
the WKT centroid — all must behave identically in Python, DuckDB, and (by
construction of identical expressions) Spark."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_project_spark.functions.geo import (
    multipolygon_centroid,
    parse_wkt_polygons,
)
from bigdata_project_spark.functions.scalars import round_portable_sql
from bigdata_project_spark.operators.text_dedup import _MH_A, _MH_B, _MH_P


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_round_portable_matches_python(x):
    """floor(x·10⁶ + 0.5)/10⁶ in DuckDB == the same IEEE ops in Python."""
    con = duckdb.connect()
    # CAST: bare literals parse as DECIMAL in DuckDB; the real oracles
    # always feed DOUBLE columns/expressions into round_portable_sql
    got = con.execute(
        f"SELECT {round_portable_sql(f'CAST({x!r} AS DOUBLE)', 6)}"
    ).fetchone()[0]
    want = math.floor(x * 1e6 + 0.5) / 1e6
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1), st.integers(min_value=0, max_value=11))
def test_minhash_universal_hash_exact_in_bigint(v, i):
    """(v·a + b) mod P stays exact in BIGINT on both sides for any 32-bit v."""
    con = duckdb.connect()
    a, b = _MH_A[i], _MH_B[i]
    assert v * a + b < 2**63  # no overflow on either engine
    got = con.execute(f"SELECT (CAST({v} AS BIGINT) * {a} + {b}) % {_MH_P}").fetchone()[0]
    assert got == (v * a + b) % _MH_P


_coord = st.integers(min_value=-1000, max_value=1000)


_edge = st.integers(min_value=1, max_value=60)


@st.composite
def _triangle(draw):
    """Right triangle anchored at a random point, legs along the axes, a
    shear on the apex — always CCW and non-degenerate, no rejection loop."""
    x0, y0 = draw(_coord), draw(_coord)
    w, h, shear = draw(_edge), draw(_edge), draw(_coord)
    return [(x0, y0), (x0 + w, y0), (x0 + shear, y0 + h)]


def _wkt_of(tris):
    rings = ", ".join(
        "((" + ", ".join(f"{x} {y}" for x, y in t + [t[0]]) + "))" for t in tris
    )
    return f"MULTIPOLYGON({rings})"


@settings(max_examples=100, deadline=None)
@given(st.lists(_triangle(), min_size=1, max_size=4), _coord, _coord)
def test_centroid_translation_equivariant(tris, dx, dy):
    """centroid(T + (dx,dy)) == centroid(T) + (dx,dy) — catches any
    asymmetry in parsing or the shoelace accumulation."""
    cx, cy = multipolygon_centroid(parse_wkt_polygons(_wkt_of(tris)))
    moved = [[(x + dx, y + dy) for x, y in t] for t in tris]
    mx, my = multipolygon_centroid(parse_wkt_polygons(_wkt_of(moved)))
    assert mx == pytest.approx(cx + dx, abs=1e-6)
    assert my == pytest.approx(cy + dy, abs=1e-6)


@settings(max_examples=100, deadline=None)
@given(_triangle())
def test_centroid_triangle_is_vertex_mean(t):
    cx, cy = multipolygon_centroid(parse_wkt_polygons(_wkt_of([t])))
    assert cx == pytest.approx(sum(x for x, _ in t) / 3, abs=1e-9)
    assert cy == pytest.approx(sum(y for _, y in t) / 3, abs=1e-9)


# --- BPE merge loop vs an independent brute-force re-implementation -----

@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="abcd", min_size=1, max_size=6),
                  st.integers(min_value=1, max_value=9)),
        min_size=1, max_size=12, unique_by=lambda t: t[0],
    )
)
def test_bpe_train_merges_matches_bruteforce(word_counts):
    """train_merges must pick, at every rank, the (count-max, lexmin) pair
    a from-scratch recount of the current vocab would pick."""
    from bigdata_project_spark.operators.bpe import END_OF_WORD, train_merges

    merges = train_merges(word_counts, n_merges=5)
    vocab = {tuple(list(w) + [END_OF_WORD]): c for w, c in word_counts}
    for rank, left, right, cnt in merges:
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        best_cnt = max(pairs.values())
        assert cnt == best_cnt
        assert (left, right) == min(p for p, c in pairs.items() if c == best_cnt)
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (left, right):
                    out.append(left + right); i += 2
                else:
                    out.append(syms[i]); i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab


# --- Morton z-value: interleave must be a bijection on bit pairs --------

@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**16 - 1),
       st.integers(min_value=0, max_value=2**16 - 1))
def test_zvalue_interleave_bijective(x, y):
    """The floor-div/mod interleave must equal the bitwise definition, so
    (x, y) is exactly recoverable — tight file extents depend on it."""
    z = 0
    for j in range(16):
        z += ((x >> j) & 1) << (2 * j)
        z += ((y >> j) & 1) << (2 * j + 1)
    # recover
    rx = sum(((z >> (2 * j)) & 1) << j for j in range(16))
    ry = sum(((z >> (2 * j + 1)) & 1) << j for j in range(16))
    assert (rx, ry) == (x, y)
    # and the SQL/Column formula (pure arithmetic) agrees with bitwise
    za = sum((x // (2**j) % 2) * 4**j + (y // (2**j) % 2) * 2 * 4**j for j in range(16))
    assert za == z
    # and the 4-step shift-mask spread (the r16 fast form the registered
    # query and its oracle both compile to) agrees with bitwise
    def spread(v: int) -> int:
        for sh, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
            v = (v | (v << sh)) & m
        return v
    assert spread(x) | (spread(y) << 1) == z


@given(
    st.text(alphabet="ab", min_size=1, max_size=24),
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"]),
                  st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"])),
        min_size=0,
        max_size=4,
    ),
)
@settings(max_examples=200, deadline=None)
def test_bpe_encode_len_matches_bruteforce_greedy(word, pairs):
    """encode_len == a from-scratch greedy reference for arbitrary merge
    chains over a binary alphabet — including self-pairs over runs, the
    case the r5 replace chain got wrong."""
    from bigdata_project_spark.operators.bpe import END_OF_WORD, encode_len

    merges = [(r, l, rt, 1) for r, (l, rt) in enumerate(pairs)]

    syms = list(word) + [END_OF_WORD]
    for _r, left, right, _c in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    assert encode_len(word, merges) == len(syms)


@given(st.text(alphabet="abc", min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_bpe_encode_len_bounds(word):
    """1 + ceil(len/2) <= n_sym <= len+1 under any single merge chain:
    merges only ever halve adjacent pairs, and </w> never merges with a
    letter unless a merge names it."""
    from bigdata_project_spark.operators.bpe import encode_len

    merges = [(0, "a", "a", 1), (1, "b", "c", 1)]
    n = encode_len(word, merges)
    assert n <= len(word) + 1
    assert n >= 1 + (len(word) + 1) // 2


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=200), min_size=1, max_size=30
    )
)
def test_char_entropy_formula_portable_and_accurate(counts):
    """The scaled-integer entropy formula (corpus_quality) evaluated in
    DuckDB equals the same IEEE ops in Python, and is within 1e-5 bits
    of true Shannon entropy for any character histogram."""
    from bigdata_project_spark.operators.corpus_quality import _LL_SCALE, _LN2

    n = sum(counts)
    s = sum(c * math.floor(math.log(float(c)) * _LL_SCALE + 0.5) for c in counts)
    want = (
        math.floor(math.log(float(n)) * _LL_SCALE + 0.5) - s / n
    ) / _LL_SCALE / _LN2
    con = duckdb.connect()
    vals = ", ".join(f"({c})" for c in counts)
    got = con.execute(
        f"""
        WITH h(c) AS (VALUES {vals}),
        p AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                     SUM(CAST(c * floor(ln(CAST(c AS DOUBLE)) * {_LL_SCALE} + 0.5)
                              AS DECIMAL(19,0))) AS s
              FROM h)
        SELECT (floor(ln(CAST(n AS DOUBLE)) * {_LL_SCALE} + 0.5)
                - CAST(s AS DOUBLE) / n) / {_LL_SCALE} / {_LN2}
        FROM p
        """
    ).fetchone()[0]
    assert got == pytest.approx(want, abs=1e-12)
    true_h = -sum((c / n) * math.log2(c / n) for c in counts)
    assert abs(want - true_h) < 1e-5


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ).filter(lambda v: sum(x * x for x in v) > 1e-6),
        min_size=2,
        max_size=12,
    )
)
def test_semdedup_cell_kernel_matches_bruteforce(vectors):
    """The per-cell numpy dup kernel (semdedup.cell_dups logic) agrees
    with an O(n²) double-loop on the same 1e-6-rounded cosine: same
    dup set, same lowest-id survivor choice."""
    import numpy as np
    import pandas as pd

    from bigdata_project_spark.operators.semdedup import SEM_TAU

    ids = list(range(len(vectors)))
    pdf = pd.DataFrame({"vec_id": ids, "embedding": [np.array(v) for v in vectors]})
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.sqrt(np.einsum("ij,ij->i", m, m))
    gram = np.floor((m @ m.T) / np.outer(norms, norms) * 1e6 + 0.5) / 1e6
    # kernel's vectorized answer
    hits = gram >= SEM_TAU
    np.fill_diagonal(hits, False)
    got = {}
    for j in range(1, len(ids)):
        above = np.nonzero(hits[:j, j])[0]
        if len(above):
            got[ids[j]] = ids[above[0]]
    # brute force with scalar math
    want = {}
    for j in range(len(ids)):
        for i in range(j):
            dot = float(np.dot(m[i], m[j]))
            cos = dot / (norms[i] * norms[j])
            if math.floor(cos * 1e6 + 0.5) / 1e6 >= SEM_TAU:
                want[j] = i
                break
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40))
def test_md5_shuffle_order_portable(doc_ids):
    """The seeded md5 shuffle key produces the identical total order in
    Python's hashlib and DuckDB's md5 — the portability the
    pipeline_global_shuffle oracle rests on."""
    import hashlib

    from bigdata_project_spark.operators.ordering import SHUFFLE_SEED

    ids = sorted(doc_ids)
    py = sorted(
        ids,
        key=lambda d: (
            hashlib.md5(f"{SHUFFLE_SEED}:{d}".encode()).hexdigest(),
            d,
        ),
    )
    con = duckdb.connect()
    vals = ", ".join(f"({d})" for d in ids)
    rows = con.execute(
        f"""
        WITH ids(doc_id) AS (VALUES {vals})
        SELECT doc_id
        FROM ids
        ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
        """
    ).fetchall()
    assert [r[0] for r in rows] == py
