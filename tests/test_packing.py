"""Sequence packing (concat-and-split): conservation invariants, the
full-chunks property, and partition-count independence of the two-phase
global prefix sum."""

from __future__ import annotations

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators.packing import (
    global_token_offsets,
    pack_chunks,
    packing_stats,
)

SF_DIR = "/root/testdata/sf0.001"
CAP = 64


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


def test_offsets_match_python_prefix_sum(spark):
    docs = _docs(spark)
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_start"])
        for r in global_token_offsets(docs).collect()
    }
    rows = sorted(
        (r["doc_id"], len([t for t in (r["text"] or "").split() if t]))
        for r in docs.collect()
    )
    acc = 0
    for doc_id, n in rows:
        assert got[doc_id] == (n, acc), doc_id
        acc += n


def test_pack_conservation_and_full_chunks(spark):
    docs = _docs(spark)
    chunks = pack_chunks(docs, cap=CAP).localCheckpoint(eager=True)
    total_tokens = docs.select(
        F.sum(F.size(F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))))
    ).first()[0]
    # conservation: every token lands in exactly one chunk
    assert chunks.agg(F.sum("toks_in_chunk")).first()[0] == total_tokens
    # per-doc conservation
    bad = (
        chunks.groupBy("doc_id", "n_tokens")
        .agg(F.sum("toks_in_chunk").alias("s"))
        .where(F.col("s") != F.col("n_tokens"))
        .count()
    )
    assert bad == 0
    # no-padding-waste: every chunk but the last is exactly full
    stats = packing_stats(chunks, cap=CAP)
    last = stats.agg(F.max("chunk_id")).first()[0]
    assert stats.where((F.col("chunk_id") != last) & (F.col("fill_tokens") != CAP)).count() == 0
    assert stats.where(F.col("fill_tokens") > CAP).count() == 0


def test_pack_partition_count_invariance(spark):
    """The two-phase prefix sum must give identical chunk layout whether the
    corpus sits in 1 partition or 7."""
    docs = _docs(spark)
    a = sorted(
        map(tuple, pack_chunks(docs, cap=CAP, num_partitions=1).collect())
    )
    b = sorted(
        map(tuple, pack_chunks(docs, cap=CAP, num_partitions=7).collect())
    )
    assert a == b and len(a) > 0


def test_doc_spanning_chunks(spark):
    """A doc longer than cap spans ceil(n/cap)±1 chunks with contiguous ids."""
    data = [(1, "w " * 10), (2, "x " * 150), (3, "y " * 5)]
    docs = spark.createDataFrame(data, "doc_id long, text string")
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["toks_in_chunk"])
        for r in pack_chunks(docs, cap=CAP).collect()
    )
    # doc 1: tokens 0..9 -> chunk 0; doc 2: tokens 10..159 -> chunks 0,1,2;
    # doc 3: tokens 160..164 -> chunk 2
    assert rows == [
        (1, 0, 10),
        (2, 0, 54),
        (2, 1, 64),
        (2, 2, 32),
        (3, 2, 5),
    ]


def test_chunk_overlapping_windows(spark):
    from sneaky_data_matcher_spark.operators.packing import chunk_overlapping

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a  b"), (3, ""), (4, "solo")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["chunk_tokens"])
        for r in chunk_overlapping(docs, size=4, stride=3).collect()
    )
    assert rows == [
        (1, 0, "t0 t1 t2 t3", 4),
        (1, 1, "t3 t4 t5 t6", 4),
        (1, 2, "t6 t7 t8 t9", 4),
        (1, 3, "t9", 1),
        (2, 0, "a b", 2),
        (4, 0, "solo", 1),
    ]


def test_chunk_overlapping_covers_every_token(spark):
    from sneaky_data_matcher_spark.operators.packing import chunk_overlapping

    docs = _docs(spark)
    chunks = chunk_overlapping(docs, size=32, stride=24)
    # every doc's final chunk ends at its token count: reconstruct coverage
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_idx") * 24 + F.col("chunk_tokens")).alias("covered"),
        )
    )
    n_tok = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))).alias("n"),
    ).where(F.col("n") > 0)
    bad = per_doc.join(n_tok, "doc_id").where(F.col("covered") != F.col("n")).count()
    assert bad == 0
    assert per_doc.count() == n_tok.count()
