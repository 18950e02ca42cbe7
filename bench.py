"""Benchmark harness.

Default mode (what the driver runs): full record-linkage pipeline
(canonicalize → multi-pass salted blocking → pair scoring → clustering)
over the interleaved spans table derived from $SPARK_GRAFT_SF_DIR's
documents, on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "candidate_pairs_scored_per_sec", "value": <pairs/sec>,
   "unit": "pairs/sec", "queries": {<name>: seconds, ...}, "sf": ...,
   "pairs_scored": N, "wall_sec": T, "cpus": C}

`--scaling` mode runs the same pipeline at local[8] and local[32] via
fresh subprocesses (a JVM cannot change master in-process) and writes the
north-rule scaling-efficiency evidence into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _run_pipeline(spark, sf_dir: str, threshold: float = 0.85) -> dict:
    from pyspark.sql import functions as F

    from sneaky_data_matcher_spark.plans import pipeline as P
    from sneaky_data_matcher_spark.sources.spans import derive_spans

    timings: dict[str, float] = {}
    cfg = P.PipelineConfig(threshold=threshold)

    # Warm the Python/Arrow worker pool (one tiny pandas-UDF job) so the
    # measured rates reflect steady state, not interpreter startup — the
    # cluster equivalent is executor spin-up, which benchmarks exclude.
    from sneaky_data_matcher_spark.functions.similarity import jaro_winkler

    spark.range(0, 64, 1, 32).select(
        jaro_winkler(F.lit("warm"), F.lit("warmup")).alias("x")
    ).agg(F.count("x")).collect()

    t0 = time.perf_counter()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = derive_spans(docs)
    canon = P.canonicalize_docs(spans)
    canon = canon.persist()
    n_docs = canon.count()
    timings["canonicalize"] = time.perf_counter() - t0

    t1 = time.perf_counter()
    pairs = P.build_candidate_pairs(canon, cfg).persist()
    n_pairs = pairs.count()
    timings["blocking_pairs"] = time.perf_counter() - t1

    t2 = time.perf_counter()
    scored = P.score_candidates(pairs, canon, cfg).persist()
    scored.count()
    timings["scoring"] = time.perf_counter() - t2

    t3 = time.perf_counter()
    clusters = P.assign_clusters(scored, canon, cfg)
    n_clusters = clusters.select("cluster_id").distinct().count()
    timings["clustering"] = time.perf_counter() - t3

    wall = time.perf_counter() - t0
    scoring_rate = n_pairs / timings["scoring"] if timings["scoring"] > 0 else 0.0
    e2e_rate = n_pairs / wall if wall > 0 else 0.0
    return {
        "n_docs": n_docs,
        "pairs_scored": n_pairs,
        "n_clusters": n_clusters,
        "timings": timings,
        "wall_sec": wall,
        "pairs_per_sec_scoring": scoring_rate,
        "pairs_per_sec_e2e": e2e_rate,
    }


def run_once(sf_dir: str, cpus: int) -> dict:
    from sneaky_data_matcher_spark.session import get_spark

    spark = get_spark(app_name=f"bench-{cpus}", cpus=cpus,
                      shuffle_partitions=max(2 * cpus, 16))
    try:
        return _run_pipeline(spark, sf_dir)
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        _scaling(sf_dir)
        return
    if "--child" in sys.argv:
        # used by --scaling: emit raw result json on the last line
        r = run_once(sf_dir, cpus)
        print(json.dumps(r))
        return

    r = run_once(sf_dir, cpus)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "candidate_pairs_scored_per_sec",
        "value": round(r["pairs_per_sec_e2e"], 2),
        "unit": "pairs/sec",
        "queries": {k: round(v, 3) for k, v in r["timings"].items()},
        "sf": sf,
        "pairs_scored": r["pairs_scored"],
        "n_docs": r["n_docs"],
        "n_clusters": r["n_clusters"],
        "wall_sec": round(r["wall_sec"], 3),
        "cpus": cpus,
    }
    print(json.dumps(out))


def _scaling(sf_dir: str) -> None:
    """Run the same job at local[8] and local[32]; report throughput at both
    and efficiency = (T_8 / T_32) / 4 (north rule: N vs 4N executors)."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, __file__, "--child"],
            env=env, capture_output=True, text=True, check=True,
        )
        results[cpus] = json.loads(p.stdout.strip().splitlines()[-1])
    t8 = results[8]["wall_sec"]
    t32 = results[32]["wall_sec"]
    eff = (t8 / t32) / 4.0
    report = {
        "sf_dir": sf_dir,
        "local8": results[8],
        "local32": results[32],
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
