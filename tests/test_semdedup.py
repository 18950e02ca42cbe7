"""SemDeDup: cell assignment, within-cell duplicate groups, and the
keep-farthest-from-centroid survivor rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sneaky_data_matcher_spark.operators import semdedup as SD


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


CENTROIDS = [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])]


def test_cell_assignment_and_ties(spark):
    vecs = _vecs(
        spark,
        [
            (1, [0.9, 0.1, 0.0]),   # cell 100
            (2, [0.1, 0.9, 0.0]),   # cell 200
            (3, [0.5, 0.5, 0.0]),   # exact tie -> smaller centroid id 100
        ],
    )
    cents = spark.createDataFrame(
        CENTROIDS, "centroid_id long, embedding array<float>"
    )
    got = {r["vec_id"]: r["cell"] for r in SD.assign_cells(vecs, cents).collect()}
    assert got == {1: 100, 2: 200, 3: 100}


def test_groups_and_survivor_rule(spark):
    # cell 100: 1 and 4 are near-identical (cos ~1); 5 is distinct.
    # cell 200: 2 alone. The survivor of {1,4} is the member FARTHER from
    # the centroid (lower cos_c) — vec 4 (tilted away).
    vecs = _vecs(
        spark,
        [
            (1, [1.0, 0.02, 0.0]),
            (4, [1.0, 0.08, 0.01]),
            (5, [0.7, 0.0, 0.7]),
            (2, [0.0, 1.0, 0.0]),
        ],
    )
    cents = spark.createDataFrame(
        CENTROIDS, "centroid_id long, embedding array<float>"
    )
    out = {r["vec_id"]: r for r in SD.semdedup(vecs, cents, eps=0.97).collect()}
    assert out[1]["group_id"] == out[4]["group_id"] == 1
    assert out[5]["group_id"] == 5 and out[2]["group_id"] == 2
    assert out[1]["cos_c"] > out[4]["cos_c"]
    assert not out[1]["keep"] and out[4]["keep"]  # farthest-from-centroid kept
    assert out[5]["keep"] and out[2]["keep"]      # singletons survive
    # exactly one survivor per group
    kept = [r for r in out.values() if r["keep"]]
    assert len(kept) == len({r["group_id"] for r in out.values()})


def test_pairs_stay_within_cells(spark):
    # near-identical vectors in DIFFERENT cells must not pair (the
    # paper's within-cluster restriction)
    vecs = _vecs(
        spark,
        [
            (1, [0.6, 0.55, 0.0]),  # cell 100 (barely)
            (2, [0.55, 0.6, 0.0]),  # cell 200 (barely), cos(1,2) ~ 0.997
        ],
    )
    cents = spark.createDataFrame(
        CENTROIDS, "centroid_id long, embedding array<float>"
    )
    assigned = SD.assign_cells(vecs, cents)
    assert SD.semdedup_pairs(assigned, eps=0.9).count() == 0
    out = {r["vec_id"]: r["keep"] for r in SD.semdedup(vecs, cents, eps=0.9).collect()}
    assert out == {1: True, 2: True}
