"""Edit-distance join vs brute force: repetitive strings (multiset count
filter), short strings sharing zero grams (band path), and random fuzz."""

from __future__ import annotations

from sneaky_data_matcher_spark.operators.editjoin import edit_distance_join


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _run(spark, texts, k, q=3):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["dist"]
        for r in edit_distance_join(df, k=k, q=q).collect()
    }
    want = {
        (i, j): _lev(texts[i], texts[j])
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if _lev(texts[i], texts[j]) <= k
    }
    assert got == want


def test_short_strings_zero_shared_grams(spark):
    # dist("ab","cd")=2 with no shared grams: only the band path finds it
    _run(spark, ["ab", "cd", "abc", "xyz", "", "a"], k=2)


def test_repetitive_strings_multiset_filter(spark):
    # distinct-gram counting would reject these; multiset must keep them
    _run(spark, ["aaaaaaaaaaaaaaaaaaaa", "aaaaaaaaaaaaaaaaaaab",
                 "aaaaaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbbbbbbb"], k=2)


def test_boundary_lengths_cross_band(spark):
    # lengths straddle short_max=(k+1)*q-1=8 for k=2,q=3
    _run(spark, ["12345678", "123456789", "1234567890", "1234567",
                 "abcdefgh", "abcdefghi"], k=2)


def test_random_fuzz(spark):
    import random

    rng = random.Random(3)
    base = ["".join(rng.choice("abc") for _ in range(rng.randrange(1, 15)))
            for _ in range(25)]
    # seed near-dups deliberately
    mut = []
    for t in base[:10]:
        l = list(t)
        if l:
            l[rng.randrange(len(l))] = rng.choice("abc")
        mut.append("".join(l) + rng.choice(["", "a"]))
    _run(spark, base + mut, k=2)


def test_k1_tighter(spark):
    _run(spark, ["hello", "hallo", "hell", "help", "yellow"], k=1)
