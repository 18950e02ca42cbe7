"""PPRL: CLK Bloom encodings + Dice joins (operators/pprl.py).

The reference links records by plaintext key equality
(services/SearchService.java:165); PPRL reproduces linkage when parties
can only exchange Bloom-filter encodings (Schnell et al., BMC 2009).
Tests pin the encoding to a pure-Python reference implementation, the
exact inverted-index Dice join to a brute-force oracle, and the HLSH
bucket-then-verify path to (subset of exact) + full recall on a
near-duplicate corpus.
"""

from __future__ import annotations

import pytest

from sneaky_data_matcher_spark.operators import pprl

M = (1 << 31) - 1


def _horner_py(t: str, base: int) -> int:
    acc = 0
    for ch in t:
        acc = (acc * base + ord(ch)) % M
    return acc


def _clk_py(text: str, bits=pprl.CLK_BITS, k=pprl.CLK_K, qgram=None) -> set[int]:
    if qgram is None:
        toks = {t for t in text.split(" ") if t}
    else:
        toks = {text[j : j + qgram] for j in range(max(len(text) - qgram + 1, 1))}
        toks = {t for t in toks if t}
    pos = set()
    for t in toks:
        h1, h2 = _horner_py(t, pprl.PPRL_B1), _horner_py(t, pprl.PPRL_B2)
        for i in range(k):
            pos.add((h1 + i * h2) % bits)
    return pos


def _dice(a: set, b: set) -> float:
    return 2 * len(a & b) / (len(a) + len(b))


DOCS = [
    (1, "alice johnson 12 oak street portland"),
    (2, "alice johnson 12 oak street portland or"),  # near-dup of 1
    (3, "bob smith 99 elm avenue seattle"),
    (4, "bob smith 99 elm avenue seatle"),  # typo near-dup of 3
    (5, "carol wu 7 pine road austin"),
    (6, ""),  # blank: must be dropped
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(DOCS, "doc_id long, doc_text string")


def test_clk_encode_matches_python(spark, frame):
    rows = pprl.clk_frame(frame).orderBy("doc_id").collect()
    assert [r.doc_id for r in rows] == [1, 2, 3, 4, 5]  # blank dropped
    for r in rows:
        text = dict(DOCS)[r.doc_id]
        expect = sorted(_clk_py(text))
        assert list(r.clk) == expect
        assert r.card == len(expect)


def test_clk_encode_qgram_matches_python(spark, frame):
    rows = pprl.clk_frame(frame, qgram=2).orderBy("doc_id").collect()
    for r in rows:
        text = dict(DOCS)[r.doc_id]
        assert list(r.clk) == sorted(_clk_py(text, qgram=2))


def test_dice_pairs_matches_bruteforce(spark, frame):
    t = 0.5
    got = {
        (r.doc_id_a, r.doc_id_b): r.dice
        for r in pprl.dice_pairs(frame, threshold=t).collect()
    }
    clks = {i: _clk_py(txt) for i, txt in DOCS if txt}
    ids = sorted(clks)
    expect = {}
    for x in ids:
        for y in ids:
            if x < y:
                d = _dice(clks[x], clks[y])
                if d >= t:
                    expect[(x, y)] = round(d, 6)
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k], abs=1e-6)
    # the two planted near-dup pairs must be found
    assert (1, 2) in got and (3, 4) in got


def test_hlsh_subset_and_full_recall_on_near_dups(spark, frame):
    t = 0.5
    exact = {
        (r.doc_id_a, r.doc_id_b): r.dice
        for r in pprl.dice_pairs(frame, threshold=t).collect()
    }
    got = {
        (r.doc_id_a, r.doc_id_b): r.dice
        for r in pprl.hlsh_dice_pairs(frame, threshold=t).collect()
    }
    # exact-verified candidates => always a subset with identical dice
    assert set(got) <= set(exact)
    for k, v in got.items():
        assert v == exact[k]
    # high-similarity pairs collide in >=1 of the 8 tables here
    assert (1, 2) in got and (3, 4) in got


def test_hlsh_blocks_deterministic(spark, frame):
    clks = pprl.clk_frame(frame)
    a = sorted(map(tuple, pprl.hlsh_blocks(clks).collect()))
    b = sorted(map(tuple, pprl.hlsh_blocks(clks).collect()))
    assert a == b
    tables = pprl.hlsh_table_indices(4, 6)
    assert len(tables) == 4 and all(len(t) == 6 for t in tables)
    assert all(0 <= i < pprl.CLK_BITS for t in tables for i in t)
    assert tables == pprl.hlsh_table_indices(4, 6)  # pure function


def test_length_prune_is_exact_at_the_boundary(spark):
    # token set 1 is contained in token set 2, so the CLK bit sets are
    # contained too; a threshold exactly AT the achievable dice must
    # keep the pair (>=), and epsilon above must drop it.
    rows = [(1, "a b c d"), (2, "a b c d e f g h")]
    d = _dice(_clk_py(rows[0][1]), _clk_py(rows[1][1]))
    f = spark.createDataFrame(rows, "doc_id long, doc_text string")
    at = pprl.dice_pairs(f, threshold=d).collect()
    above = pprl.dice_pairs(f, threshold=d + 1e-6).collect()
    assert len(at) == 1 and at[0].dice == pytest.approx(round(d, 6))
    assert len(above) == 0
