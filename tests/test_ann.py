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


def test_pq_codes_match_numpy(spark, emb):
    """pq_encode's argmin codes agree with a direct numpy PQ encoder."""
    import numpy as np

    m = 8
    cb_rows = sorted(
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        for r in emb.where(F.col("vec_id") % 40 == 1).collect()
    )
    cbmat = np.stack([v for _, v in cb_rows])  # (K, D) sorted by cb_id
    cb = emb.where(F.col("vec_id") % 40 == 1).select(
        F.col("vec_id").alias("cb_id"), "embedding"
    )
    got = {
        r["vec_id"]: list(r["codes"])
        for r in ann.pq_encode(emb, cb, m=m).collect()
    }
    d = cbmat.shape[1] // m
    for r in emb.collect():
        v = np.array(r["embedding"], dtype=np.float64)
        want = []
        for s in range(m):
            dists = ((cbmat[:, s * d : (s + 1) * d] - v[s * d : (s + 1) * d]) ** 2).sum(axis=1)
            want.append(int(np.argmin(dists)) + 1)  # 1-based, ties→lowest (argmin)
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_pq_topk_matches_numpy_adc(spark, emb):
    """pq_topk's ADC ranking agrees with numpy lookup-table distances."""
    import numpy as np

    m, k = 8, 4
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    cb_ids = sorted(i for i in vecs if i % 40 == 1)
    cbmat = np.stack([vecs[i] for i in cb_ids])
    d = cbmat.shape[1] // m
    codes = {}
    for nid, v in vecs.items():
        codes[nid] = [
            int(np.argmin(((cbmat[:, s * d : (s + 1) * d] - v[s * d : (s + 1) * d]) ** 2).sum(axis=1)))
            for s in range(m)
        ]
    q = emb.where(F.col("vec_id") % 100 == 0)
    cb = emb.where(F.col("vec_id") % 40 == 1).select(
        F.col("vec_id").alias("cb_id"), "embedding"
    )
    got = {}
    for r in ann.pq_topk(q, emb, cb, k=k, m=m).collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["adist"]))
    for qid in [i for i in vecs if i % 100 == 0]:
        qv = vecs[qid]
        dtab = np.stack(
            [((cbmat[:, s * d : (s + 1) * d] - qv[s * d : (s + 1) * d]) ** 2).sum(axis=1) for s in range(m)]
        )  # (m, K)
        scored = sorted(
            (round(float(sum(dtab[s][codes[nid][s]] for s in range(m))), 6), nid)
            for nid in vecs
            if nid != qid
        )
        expected = [(n, a) for a, n in scored[:k]]
        assert [n for n, _ in got[qid]] == [n for n, _ in expected], qid
        for (gn, ga), (en, ea) in zip(got[qid], expected):
            assert ga == pytest.approx(ea, abs=1e-5)


def test_pq_identical_vector_is_nearest(spark, emb):
    """A duplicated vector quantizes to the same codes, so its ADC distance
    (= the query's own quantization error — NOT zero; ADC compares the
    exact query against the RECONSTRUCTED neighbor) is the minimum
    achievable over any code assignment — PQ must rank the twin first."""
    dup = emb.where(F.col("vec_id") == 7).select(
        F.lit(999999).cast("long").alias("vec_id"), "embedding", "label"
    )
    aug = emb.unionByName(dup)
    q = aug.where(F.col("vec_id") == 999999)
    cb = emb.where(F.col("vec_id") % 40 == 1).select(
        F.col("vec_id").alias("cb_id"), "embedding"
    )
    top = ann.pq_topk(q, aug, cb, k=1, m=8).collect()
    assert len(top) == 1 and top[0]["neighbor_id"] == 7
    assert top[0]["adist"] >= 0.0


def test_pq_rejects_indivisible_dim(spark):
    """dim % m != 0 must raise, not silently skip dimensions."""
    from sneaky_data_matcher_spark.operators.ann import pq_encode

    vecs = spark.createDataFrame(
        [(1, [float(i) for i in range(20)])], "vec_id long, embedding array<float>"
    )
    cb = spark.createDataFrame(
        [(0, [0.0] * 20), (1, [1.0] * 20)], "cb_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="not divisible"):
        pq_encode(vecs, cb, m=8).collect()
