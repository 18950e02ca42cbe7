"""ANN operators: brute-force exactness vs a numpy oracle, LSH mechanics
(identical-direction vectors always collide), IVF routing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import ann

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").localCheckpoint(eager=True)


def test_brute_force_matches_numpy(spark, emb):
    import numpy as np

    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    qids = [i for i in vecs if i % 100 == 0]
    q = emb.where(F.col("vec_id") % 100 == 0)
    got = {}
    for r in ann.brute_force_topk(q, emb, k=3).collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cos"]))
    for qid in qids:
        qv = vecs[qid]
        sims = []
        for nid, nv in vecs.items():
            if nid == qid:
                continue
            c = float(qv @ nv / (np.linalg.norm(qv) * np.linalg.norm(nv)))
            sims.append((round(c, 6), -nid))
        sims.sort(reverse=True)
        expected = [(-n, c) for c, n in sims[:3]]
        got_q = got[qid]
        assert [n for n, _ in got_q] == [n for n, _ in expected], qid
        for (gn, gc), (en, ec) in zip(got_q, expected):
            assert gc == pytest.approx(ec, abs=1e-5)


def test_lsh_identical_direction_always_found(spark, emb):
    """A query that is a positive scalar multiple of a corpus vector lands
    in the same bucket in EVERY table (same signs) — LSH must return it
    as the top-1 neighbor with cos == 1."""
    q = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    out = ann.lsh_topk(q, emb, k=1)
    rows = {r["query_id"]: (r["neighbor_id"], r["cos"]) for r in out.collect()}
    for qid in range(5):
        nid, cos = rows[qid + 100000]
        assert nid == qid
        assert cos == pytest.approx(1.0, abs=1e-6)


def test_lsh_recall_reported(spark, emb):
    q = emb.where(F.col("vec_id") % 50 == 0)
    bf = {(r["query_id"], r["neighbor_id"]) for r in ann.brute_force_topk(q, emb, k=5).collect()}
    ls = {(r["query_id"], r["neighbor_id"]) for r in ann.lsh_topk(q, emb, k=5).collect()}
    recall = len(bf & ls) / len(bf)
    # near-uniform vectors: weak structure; mechanics-floor only
    assert recall > 0.05, recall


def test_lsh_bucket_empty_vector_matches_duckdb(spark):
    """Empty embeddings must bucket identically to the DuckDB twin (ADVICE
    r2: sequence(0,-1) made the dot NULL -> bit 0, while range(0,0) gives
    dot 0.0 -> bit 1). All-empty vectors now produce the all-ones pattern."""
    df = spark.createDataFrame(
        [(1, []), (2, [0.5, -0.25])], "vec_id long, embedding array<double>"
    )
    rows = ann.hyperplane_bucket_keys(df, n_planes=4, n_tables=2).collect()
    empty_buckets = {r["bucket"] for r in rows if r["vec_id"] == 1}
    assert empty_buckets == {"t0:1111", "t1:1111"}  # dot 0.0 >= 0 per plane


def test_ivf_self_retrieval(spark, emb):
    cent = emb.where(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    q = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(3.0)).alias("embedding"),
    )
    out = ann.ivf_topk(q, emb, cent, k=1, n_probe=1)
    rows = {r["query_id"]: r["neighbor_id"] for r in out.collect()}
    # scaled copy routes to the same centroid and wins top-1
    for qid in range(5):
        assert rows[qid + 100000] == qid


def test_ivf_with_trained_centroids_recall(spark, emb):
    """Real k-means centroids (MLlib) routing: IVF top-k with n_probe=4
    must recover most of brute-force top-5 on the fixture embeddings."""
    from sneaky_data_matcher_spark.operators.ann import (
        brute_force_topk,
        ivf_topk,
        train_centroids,
    )

    cent = train_centroids(emb, k=8)
    assert cent.count() == 8
    q = emb.limit(20)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(q, emb, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(q, emb, cent, k=5, n_probe=4).collect()
    }
    recall = len(truth & got) / len(truth)
    # n_probe=4 of 8 lists scans ~half the corpus; on near-uniform random
    # vectors expect at least half of the true neighbors back
    assert recall >= 0.5, recall
