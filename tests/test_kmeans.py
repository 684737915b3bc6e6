"""Spherical k-means trainer (operators/kmeans.py): convergence,
assignment quality, empty-cell handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from huracan_spark.operators.kmeans import kmeans_train, lloyd_step
from huracan_spark.queries.similarity import _emb, _normalized


def _mean_cos(vectors, cents):
    """Mean assignment cosine — the spherical k-means objective."""
    assignment, _ = lloyd_step(vectors, cents)
    return assignment.agg(F.avg("cosine")).collect()[0][0]


def test_kmeans_improves_objective_and_converges(spark, sf_dir):
    vecs = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb").persist()
    init = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("long").alias("centroid_id"),
        F.col("nemb").alias("cemb"),
        F.lit(0).cast("long").alias("n_assigned"),
    )
    before = _mean_cos(vecs, init)
    trained = kmeans_train(vecs, 4, max_iter=10)
    after = _mean_cos(vecs, trained.select("centroid_id", "cemb"))
    assert after > before  # Lloyd monotonically improves the objective
    # every vector lands in exactly one cell
    assert trained.agg(F.sum("n_assigned")).collect()[0][0] == vecs.count()
    # centroids stay unit-norm (spherical variant)
    nrm2 = F.aggregate(
        F.transform(F.col("cemb"), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norms = [r.n for r in trained.select(nrm2.alias("n")).collect()]
    assert all(abs(n - 1.0) < 1e-9 for n in norms)


def test_kmeans_deterministic(spark, sf_dir):
    vecs = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb")
    a = kmeans_train(vecs, 3, max_iter=3).select("centroid_id", "n_assigned")
    b = kmeans_train(vecs, 3, max_iter=3).select("centroid_id", "n_assigned")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_lloyd_step_empty_cell_keeps_centroid(spark):
    """A centroid that attracts no vectors must survive unchanged with
    n_assigned = 0, not vanish or go null."""
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.99, 0.141])],
        "vec_id long, nemb array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
        "centroid_id long, cemb array<double>",
    )
    assignment, new_cents = lloyd_step(vecs, cents)
    got = {r.centroid_id: (r.cemb, r.n_assigned) for r in new_cents.collect()}
    assert got[1] == ([-1.0, 0.0], 0)  # empty cell: unchanged, count 0
    assert got[0][1] == 3
    assert {r.centroid_id for r in assignment.collect()} == {0}
