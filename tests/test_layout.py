"""Layout policies: effects asserted IN-PLAN (partition pruning) and
on-disk (file counts, row-group clustering), not just round-trips."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from sneaky_data_matcher_spark.sources import layout
from sneaky_data_matcher_spark.entry_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
        (F.col("id") * 17 % 997).alias("x"),
    )


def test_partitioned_write_prunes(spark, tmp_path):
    p = str(tmp_path / "t")
    layout.write_partitioned(_docs(spark), p, "lang")
    assert sorted(
        d.split("=")[1] for d in glob.glob(f"{p}/lang=*") for d in [d.rsplit("/", 1)[1]]
    ) == ["0", "1", "2", "3"]
    q = spark.read.parquet(p).where(F.col("lang") == "2")
    plan = q._jdf.queryExecution().executedPlan().treeString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    # pruned scan reads one directory's files only
    assert q.count() == 250


def test_clustered_write_narrow_ranges(spark, tmp_path):
    p = str(tmp_path / "c")
    layout.write_clustered(_docs(spark), p, "doc_id", n_files=4)
    files = sorted(glob.glob(f"{p}/part-*.parquet"))
    assert len(files) == 4
    # ranges must be disjoint: per-file (min, max) intervals don't overlap
    import pyarrow.parquet as pq

    spans = []
    for f in files:
        t = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert t == sorted(t)  # sorted within file
        spans.append((min(t), max(t)))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_compact_reduces_files(spark, tmp_path):
    src, out = str(tmp_path / "frag"), str(tmp_path / "compacted")
    # 20 dribble files
    _docs(spark, 2000).repartition(20).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 20
    n_files = layout.compact(spark, src, out, target_rows=1000)
    assert n_files == 2
    assert len(glob.glob(f"{out}/part-*.parquet")) == 2
    assert spark.read.parquet(out).count() == 2000


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0b1010, 0b0110)], "x long, y long"
    ).select(layout.zorder_key(F.col("x"), F.col("y")).alias("z"))
    # x bits at even positions, y bits at odd: x=1010, y=0110
    # -> z = y3 x3 y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 0 0 (hand interleave)
    want = 0
    for i in range(8):
        want |= ((0b1010 >> i) & 1) << (2 * i)
        want |= ((0b0110 >> i) & 1) << (2 * i + 1)
    assert df.first()["z"] == want


def test_zorder_prunes_more_than_single_key_sort(spark):
    rows = QUERIES["zorder_prune_stats"](spark, SF_DIR).collect()
    scans = {"zorder": 0, "datesort": 0}
    for r in rows:
        scans[r["layout"]] += int(r["may_contain"])
    assert scans["zorder"] < scans["datesort"]
    assert sum(r["n_rows"] for r in rows if r["layout"] == "zorder") == sum(
        r["n_rows"] for r in rows if r["layout"] == "datesort"
    )


def test_write_zordered_files_cover_compact_boxes(spark, tmp_path):
    import pyarrow.parquet as pq

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"), ((F.col("id") * 7) % 64).alias("y")
    )
    p = str(tmp_path / "z")
    layout.write_zordered(df, p, "x", "y", n_files=8, bits=6)
    files = sorted(glob.glob(f"{p}/part-*.parquet"))
    assert len(files) == 8
    # each file's 2D bounding box must be far smaller than the full grid:
    # a random layout would give ~64x64 per file; z-curve segments stay local
    areas = []
    for f in files:
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
        areas.append((max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1))
    assert sum(areas) / len(areas) <= 64 * 64 / 2
