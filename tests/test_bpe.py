from __future__ import annotations

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import bpe as B


def _ref_bpe(words: dict[str, int], n_merges: int):
    """Pure-Python reference BPE trainer (Sennrich et al. 2016 semantics):
    left-to-right non-overlapping merges, (freq desc, l, r) tie-break."""
    vocab = {tuple(list(w) + [B.END_MARK]): f for w, f in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = counts.get((sym[i], sym[i + 1]), 0) + f
        if not counts:
            break
        (l, r), fq = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, fq))
        new_vocab = {}
        for sym, f in vocab.items():
            out: list[str] = []
            for s in sym:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


CORPUS = "low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame([(CORPUS,)], "text string")
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_freq"])
        for r in B.bpe_train(docs, n_merges=8).orderBy("merge_rank").collect()
    ]
    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert got == _ref_bpe(words, 8)
    # the classic first merges: 'es' (9), then 'est', then 'est</w>'
    assert got[0][1:3] == ("e", "s") and got[0][3] == 9
    assert got[1][1:3] == ("es", "t")
    assert got[2][1:3] == ("est", B.END_MARK)


def test_bpe_train_sql_twin_bit_identical(spark):
    import duckdb

    docs = spark.createDataFrame([(CORPUS,)], "text string")
    got = sorted(
        tuple(r) for r in B.bpe_train(docs, n_merges=6).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (?)", [CORPUS])
    exp = sorted(tuple(r) for r in con.execute(B.bpe_train_sql(6)).fetchall())
    assert got == exp


def test_bpe_merge_left_to_right_nonoverlap(spark):
    # odd run: "aaa" under (a,a) -> [aa, a, </w>]
    df = spark.createDataFrame([("aaa",)], "w string")
    out = B.bpe_encode(df, "w", [("a", "a")]).collect()[0]["bpe_tokens"]
    assert out == ["aa", "a", B.END_MARK]
    # even run merges pairwise
    df4 = spark.createDataFrame([("aaaa",)], "w string")
    out4 = B.bpe_encode(df4, "w", [("a", "a")]).collect()[0]["bpe_tokens"]
    assert out4 == ["aa", "aa", B.END_MARK]


def test_bpe_encode_applies_rank_order(spark):
    df = spark.createDataFrame([("newest",), ("lowest",)], "w string")
    merges = [("e", "s"), ("es", "t"), ("est", B.END_MARK)]
    got = {
        r["w"]: r["bpe_tokens"] for r in B.bpe_encode(df, "w", merges).collect()
    }
    assert got["newest"] == ["n", "e", "w", "est</w>"]
    assert got["lowest"] == ["l", "o", "w", "est</w>"]


def test_bpe_early_stop_when_no_pairs(spark):
    docs = spark.createDataFrame([("a b c",)], "text string")
    # single-char words: pairs are (char, </w>) only; after merging each,
    # no pairs remain -> early stop before 50 merges
    m = B.bpe_train(docs, n_merges=50)
    assert m.count() <= 3


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=6), min_size=3, max_size=25
    )
)
def test_bpe_train_fuzz_matches_reference(spark, words):
    corpus = " ".join(words)
    docs = spark.createDataFrame([(corpus,)], "text string")
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_freq"])
        for r in B.bpe_train(docs, n_merges=5).orderBy("merge_rank").collect()
    ]
    from collections import Counter

    freq = Counter(words)
    assert got == _ref_bpe(dict(freq), 5)
