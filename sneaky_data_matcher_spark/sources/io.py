"""Table I/O with Iceberg-first, Parquet-fallback semantics.

Production target is an Iceberg catalog (the north rule's resumable,
snapshot-committed stage outputs). This sandbox has no Iceberg jar on the
classpath, so `TableIO` probes once and falls back to directory-per-table
Parquet with `_SUCCESS` markers standing in for committed snapshots —
the same atomic-commit contract (Spark only writes _SUCCESS after all task
commits), behind one interface so the pipeline code is identical either way.

Replaces the reference's MinIO blob store + Neo4j graph persistence
(repositories/ExportsRepository.java:47-111, UploadRepository.java:42-78):
datasets are tables, job state is a metadata table, watermarks are commits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def spread_input(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition a freshly-read input to ``defaultParallelism
    * factor`` partitions.

    A production Iceberg/Parquet table at 100 TB arrives in thousands of
    file splits, so the map side parallelizes for free. The sandbox test
    fixtures are single-row-group files — unsplittable, one task — which
    would serialize every per-doc expression (canonicalize, span derivation)
    on one core. This one cheap shuffle of the raw input restores the
    multi-split shape the real table has; it is a no-op to correctness and
    should be dropped (or become a partition-count hint) on a real catalog.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df  # input already split wide enough — don't add a shuffle
    return df.repartition(target)


def load_docs(spark: SparkSession, path: str) -> DataFrame:
    """Read a corpus parquet — flat (doc_id, text, ...) or already spanned —
    as a (doc_id, spans) frame, spread across cores. Single entry point for
    bench.py and tools/submit_pipeline.py so the corpus-loading recipe
    cannot diverge between them."""
    from .spans import derive_spans

    docs = spread_input(spark.read.parquet(path))
    if "spans" not in docs.columns:
        docs = derive_spans(docs)
    return docs.select("doc_id", "spans")


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableIO:
    """save/load/exists for named stage tables under a base location.

    ``fmt`` selects the fallback file format when no Iceberg catalog is
    in play: parquet (default), orc (both columnar, splittable, and
    predicate-pushdown-capable — the only two sane choices at 100 TB),
    or json/csv for interchange with non-columnar consumers (row
    formats — exports only, never intermediate stage tables)."""

    FORMATS = ("parquet", "orc", "json", "csv")

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        catalog: str | None = None,
        fmt: str = "parquet",
    ):
        if fmt not in self.FORMATS:
            raise ValueError(f"fmt must be one of {self.FORMATS}, got {fmt!r}")
        self.spark = spark
        self.base = base.rstrip("/")
        self.use_iceberg = catalog is not None and _iceberg_available(spark)
        self.catalog = catalog
        self.fmt = fmt

    def _path(self, name: str) -> str:
        return f"{self.base}/{name}"

    def save(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        if self.use_iceberg:
            full = f"{self.catalog}.{name}"
            writer = df.writeTo(full)
            (writer.createOrReplace() if mode == "overwrite" else writer.append())
        else:
            w = df.write.mode(mode).format(self.fmt)
            if self.fmt == "csv":
                w = w.option("header", "true")
            w.save(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        if self.use_iceberg:
            df.writeTo(f"{self.catalog}.{name}").append()
        else:
            w = df.write.mode("append").format(self.fmt)
            if self.fmt == "csv":
                w = w.option("header", "true")
            w.save(self._path(name))

    def load(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.table(f"{self.catalog}.{name}")
        r = self.spark.read.format(self.fmt)
        if self.fmt == "csv":
            r = r.option("header", "true").option("inferSchema", "true")
        return r.load(self._path(name))

    def exists(self, name: str) -> bool:
        """Committed output only: Parquet dir must carry _SUCCESS (the
        all-tasks-committed marker), mirroring an Iceberg snapshot check."""
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def delete(self, name: str) -> None:
        if self.use_iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog}.{name}")
        else:
            import shutil

            shutil.rmtree(self._path(name), ignore_errors=True)
