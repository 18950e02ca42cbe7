"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k (query-set broadcast x corpus scan —
one pass over the corpus, no shuffle of the big side; the top-k is a
per-query window). Scale path: LSH bucketing via random-hyperplane signs
(SimHash for vectors) so each query only scans its bucket(s), plus an
IVF-style variant that routes via nearest centroid keys.

All dot products run JVM-side (zip_with + aggregate higher-order
functions); no Python in the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_similarity


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, cos) — top-k by (cos desc, neighbor_id).

    queries is expected to be small (broadcast side); the corpus is scanned
    once. Deterministic tie-break on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    j = F.broadcast(q).crossJoin(c)
    if exclude_self:
        j = j.where(F.col("query_id") != F.col("neighbor_id"))
    scored = j.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def hyperplane_bucket_keys(
    vecs: DataFrame,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table random-hyperplane LSH: for each of ``n_tables`` hash
    tables, the bucket is the sign pattern of ``n_planes`` hyperplane dot
    products. Multiple tables are the standard recall lever (one table is
    a needle-in-a-bucket lottery). Hyperplane components are deterministic
    pseudo-random ±1 from xxhash64(table, plane, j) — reproducible with no
    driver-side RNG. Output: (vec_id, bucket) with n_tables rows per vec,
    bucket prefixed by table id."""
    v = _as_double(F.col(vec_col))

    def plane_bit(t: int, i: int):
        dot = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, j: x
                * F.when(
                    F.xxhash64(F.lit(t), F.lit(i), j) % 2 == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))

    buckets = F.array(
        *[
            F.concat_ws(
                "",
                F.lit(f"t{t}:"),
                *[plane_bit(t, i).cast("string") for i in range(n_planes)],
            )
            for t in range(n_tables)
        ]
    )
    return vecs.select(
        F.col(id_col).alias("vec_id"), F.explode(buckets).alias("bucket")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: candidates share any hash table's bucket; exact cosine
    + top-k within the candidate set. Recall < 1 by construction (tests
    report it against brute force); n_tables is the recall lever, n_planes
    the bucket-size lever. On near-uniform vectors (no cluster structure)
    angular LSH recall is inherently poor — it shines when true neighbors
    sit at small angles (real embedding corpora)."""
    qb = hyperplane_bucket_keys(queries, n_planes, n_tables, id_col, vec_col)
    cb = hyperplane_bucket_keys(corpus, n_planes, n_tables, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")).join(
        qb.select(F.col("vec_id").alias("query_id"), "bucket"), "query_id"
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")).join(
        cb.select(F.col("vec_id").alias("neighbor_id"), "bucket"), "neighbor_id"
    )
    j = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = j.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def train_centroids(
    corpus: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 10,
) -> DataFrame:
    """Train IVF routing centroids with MLlib k-means (the real 'tiny
    k-means output' ivf_topk's docstring assumes). Returns (centroid_id,
    embedding: array<double>) — broadcastable. Deterministic via fixed
    seed. At 100 TB train on a sample (`corpus.sample(...)`) — k-means
    cost is per-row × k and the router only needs approximate centers."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(_as_double(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    spark = corpus.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, f"centroid_id int, {vec_col} array<double>")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: assign corpus vectors to their nearest centroid
    (one broadcast join), route each query to its n_probe nearest
    centroids, scan only those inverted lists. centroids: (centroid_id,
    embedding) — typically a tiny k-means output, broadcastable."""
    cent = centroids.select(
        F.col("centroid_id"), _as_double(F.col(vec_col)).alias("centv")
    )

    def assign(df: DataFrame, id_alias: str, n: int) -> DataFrame:
        j = df.select(
            F.col(id_col).alias(id_alias), _as_double(F.col(vec_col)).alias("v")
        ).crossJoin(F.broadcast(cent))
        scored = j.select(
            id_alias, "v", "centroid_id",
            cosine_similarity(F.col("v"), F.col("centv")).alias("csim"),
        )
        w = Window.partitionBy(id_alias).orderBy(F.desc("csim"), F.asc("centroid_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= n)
            .select(id_alias, "v", "centroid_id")
        )

    ca = assign(corpus, "neighbor_id", 1).withColumnRenamed("v", "cv")
    qa = assign(queries, "query_id", n_probe).withColumnRenamed("v", "qv")
    j = qa.join(ca, "centroid_id").where(F.col("query_id") != F.col("neighbor_id"))
    scored = j.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )
