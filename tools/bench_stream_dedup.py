"""A/B: streaming dup-scoring trade (VERDICT r2 "what's wrong" #2).

The streaming ER topology emits cross-pass duplicate candidate pairs
(batch-measured dup factor ~1.14). Two ways to handle them:

  A (score_dups):   score every emitted pair in-stream; duplicate edges are
                    a no-op to connected components — no dedup shuffle.
  B (dedup_first):  per-micro-batch dropDuplicates (exact: cross-pass dups
                    always land in the same micro-batch) then score inside
                    foreachBatch — one extra shuffle per batch, ~12% less
                    scoring work.

Runs the SAME document stream through both topologies, interleaved
best-of-N trials, asserts identical final cluster tables, prints one JSON
line. Results recorded in BENCH.md; the faster option is the
PipelineConfig.stream_dedup_pairs_per_batch default.

Usage: python tools/bench_stream_dedup.py [n_docs] [trials]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _run(spark, spans_dir: str, schema, dedup: bool) -> tuple[float, set]:
    from pyspark.sql import functions as F

    from sneaky_data_matcher_spark.plans.pipeline import PipelineConfig
    from sneaky_data_matcher_spark.sources.io import TableIO
    from sneaky_data_matcher_spark.streaming.incremental import streaming_er_topology

    cfg = PipelineConfig(threshold=0.85, stream_dedup_pairs_per_batch=dedup)
    d = tempfile.mkdtemp(prefix="smsp_dupab_")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{spans_dir}/*")
        )
        io = TableIO(spark, f"{d}/state")
        t0 = time.perf_counter()
        q = streaming_er_topology(stream, io, cfg, checkpoint_dir=f"{d}/ckpt")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        wall = time.perf_counter() - t0
        clusters = {
            (r["doc_id"], r["cluster_id"])
            for r in io.load("clusters").collect()
        }
        return wall, clusters
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from pyspark.sql import functions as F

    from sneaky_data_matcher_spark.session import get_spark
    from sneaky_data_matcher_spark.sources.synth import generate_corpus

    spark = get_spark(app_name="bench-stream-dedup", cpus=8)
    in_dir = tempfile.mkdtemp(prefix="smsp_dupab_in_")
    try:
        docs, _ = generate_corpus(spark, n_docs=n_docs, seed=13)
        spans = docs.select("doc_id", "spans").localCheckpoint(eager=True)
        # 4 micro-batches
        part = F.pmod(F.xxhash64("doc_id"), F.lit(4))
        for b in range(4):
            spans.where(part == b).coalesce(2).write.mode("overwrite").parquet(
                f"{in_dir}/b{b}"
            )
        schema = spark.read.parquet(f"{in_dir}/b0").schema

        walls = {"score_dups": [], "dedup_first": []}
        clusters = {}
        for _ in range(trials):
            for name, dedup in (("score_dups", False), ("dedup_first", True)):
                w, c = _run(spark, in_dir, schema, dedup)
                walls[name].append(round(w, 2))
                prev = clusters.setdefault(name, c)
                assert c == prev, "nondeterministic clusters within variant"
        assert clusters["score_dups"] == clusters["dedup_first"], (
            "variants disagree on final clusters"
        )
        best = {k: min(v) for k, v in walls.items()}
        print(json.dumps({
            "n_docs": n_docs,
            "trials": trials,
            "walls_sec": walls,
            "best_sec": best,
            "clusters": len({c for _, c in clusters["score_dups"]}),
            "faster": min(best, key=best.get),
            "speedup_vs_other": round(max(best.values()) / min(best.values()), 3),
        }))
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
