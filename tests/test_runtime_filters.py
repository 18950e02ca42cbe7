"""Bloom-filter join pruning + daily gap-fill (r3 continuation)."""

from __future__ import annotations

from datetime import timedelta

from sneaky_data_matcher_spark import entry_queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_never_false_negative_and_counts_add_up(spark):
    rows = Q.QUERIES["bloom_prune_join"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # Bloom guarantee: every true member passes
        assert r["n_pass"] >= r["n_true"]
        assert r["n_false_pos"] == r["n_pass"] - r["n_true"]
        assert r["n_orders"] >= r["n_pass"]


def test_bloom_positions_stable_and_in_range(spark):
    df = spark.range(1000).select(
        Q._bloom_positions_col(Q.F.col("id")).alias("ps")
    )
    for r in df.collect():
        assert len(r["ps"]) == Q._BLOOM_K
        assert all(0 <= p < Q._BLOOM_M for p in r["ps"])


def test_gapfill_locf_semantics(spark):
    out = Q.QUERIES["gapfill_daily"](spark, SF_DIR).collect()
    assert out
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    from datetime import date

    for user, rows in by_user.items():
        # day is rendered as a 'yyyy-MM-dd' string since r5 (pandas-DATE
        # driver-hash hazard; see the registry query) — parse it back
        rows.sort(key=lambda r: r["day"])
        for a, b in zip(rows, rows[1:]):
            da = date.fromisoformat(a["day"])
            db = date.fromisoformat(b["day"])
            assert db - da == timedelta(days=1)
        # first row is always an observation; fills never null after it
        assert rows[0]["is_gap"] is False
        last = None
        for r in rows:
            if r["is_gap"]:
                assert r["value_filled"] == last  # carried forward
            else:
                assert r["value_filled"] is not None
            last = r["value_filled"]
    # at least one real gap got filled somewhere
    assert any(r["is_gap"] for r in out)
