"""Edit-distance similarity self-join (EDJoin-style filters + verify).

Finds all pairs with levenshtein(a, b) <= k without the O(n²) cross
join, using two classic sound filters (Xiao et al., "Ed-Join", VLDB'08):

  * length filter — |len(a) - len(b)| <= k (each edit changes length by
    at most 1);
  * count filter — q-gram MULTISET overlap: strings within edit distance
    k share at least max(la, lb) - q + 1 - k*q q-gram occurrences (one
    edit destroys at most q grams). Multiset intersection =
    sum_g min(count_a(g), count_b(g)) — a distinct-gram count would
    undercount repetitive strings and lose recall.

The count bound is positive only when max(la, lb) >= (k+1)*q; pairs of
SHORTER strings can be within distance k while sharing zero grams, so
short strings take a separate length-band path: band = len div (k+1),
each string probes its own and the next band (a qualifying pair's bands
differ by at most 1), giving a band equi-join instead of a cross join.
Both filter sets are necessary conditions, so recall is 1.0 by
construction — the DuckDB twin's exhaustive levenshtein join must match
hash-for-hash (certified by the driver query).

Scale notes (100 TB):
  - the q-gram candidate join shuffles (gram, id, count) — candidates
    stay bare id pairs until ONE verify join attaches the two strings
    (the r2 LSH-dedup lesson: never shuffle payload with candidates).
  - frequent grams are the skew risk; the shuffle key is the gram, so a
    stopband (drop grams above a document-frequency cap, lowering each
    string's threshold by its dropped occurrences) bolts on exactly like
    tfidf_cosine_pairs' df stopband when corpora demand it.
  - the short-string band path is bounded: bands hold only strings with
    len < (k+1)*q (tweets, titles), and each band pairs with itself and
    one neighbor only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_join(
    docs: DataFrame,
    k: int = 2,
    q: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All unordered pairs with levenshtein <= k over ``docs`` ->
    (doc_id_a, doc_id_b, dist). Exact: every filter is a necessary
    condition for dist <= k."""
    short_max = (k + 1) * q - 1  # count bound <= 0 iff max(la,lb) <= this
    d = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"),
        F.length(text_col).alias("ln"),
    )

    # --- long-string path: q-gram multiset count filter ---
    grams = d.where(F.col("ln") >= q).select(
        "id",
        "ln",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("ln") - q + 1),
                lambda i: F.substring(F.col("t"), i, q),
            )
        ).alias("g"),
    )
    gcnt = grams.groupBy("id", "ln", "g").agg(F.count("*").alias("c"))
    cand_long = (
        gcnt.alias("a")
        .join(gcnt.alias("b"), "g")
        .where(
            (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= k)
            # at least one side long enough for a positive count bound;
            # short-short pairs belong to the band path
            & (F.greatest("a.ln", "b.ln") > short_max)
        )
        .groupBy(
            F.col("a.id").alias("doc_id_a"),
            F.col("b.id").alias("doc_id_b"),
            F.col("a.ln").alias("la"),
            F.col("b.ln").alias("lb"),
        )
        .agg(F.sum(F.least("a.c", "b.c")).alias("shared"))
        .where(F.col("shared") >= F.greatest("la", "lb") - q + 1 - k * q)
        .select("doc_id_a", "doc_id_b")
    )

    # --- short-string path: length-band join (no gram requirement) ---
    shorts = d.where(F.col("ln") <= short_max).select(
        "id", "ln", (F.col("ln").cast("long") / (k + 1)).cast("long").alias("band")
    )
    # probe all three neighbor bands: the a.id < b.id tie-break doesn't
    # follow band order, so probing only [band, band+1] would miss pairs
    # where the smaller id sits in the HIGHER band; duplicates distinct out
    probe = shorts.select(
        "id",
        "ln",
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("band"),
    )
    cand_short = (
        probe.alias("a")
        .join(shorts.alias("b"), "band")
        .where(
            (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= k)
        )
        .select(F.col("a.id").alias("doc_id_a"), F.col("b.id").alias("doc_id_b"))
        .distinct()
    )

    cand = cand_long.unionByName(cand_short)
    a = d.select(F.col("id").alias("doc_id_a"), F.col("t").alias("ta"))
    b = d.select(F.col("id").alias("doc_id_b"), F.col("t").alias("tb"))
    return (
        cand.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select("doc_id_a", "doc_id_b", F.levenshtein("ta", "tb").alias("dist"))
        .where(F.col("dist") <= k)
    )
