"""Spherical k-means (Lloyd) training for the IVF coarse quantizer.

queries/similarity.py::ivf_ann_assign uses a deterministic centroid
table ("a real deployment would run k-means once offline") — this is
that offline trainer, Spark-shaped for 100 TB:

- centroids are a K-row TABLE broadcast into the assignment join; the
  corpus is scanned linearly and NEVER shuffled at corpus size;
- assignment is a partial-aggregated ``max_by`` per vector (map-side
  combine: one candidate row per vector crosses no shuffle at all —
  the only exchanges carry K x dim aggregate cells);
- the mean update explodes assigned vectors to (centroid, dim)
  cells and partially aggregates sum/count map-side, so the shuffle
  is K x dim rows regardless of corpus size;
- convergence = max centroid drift (1 - cos(old, new)), one K-row
  scalar aggregate per round; rounds are O(K x dim) driver cost only.

Spherical variant: means are re-normalized each round, so cosine
assignment and Euclidean assignment coincide and the quantizer
matches the cosine geometry of queries/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def lloyd_step(
    vectors: DataFrame, centroids: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """One spherical Lloyd iteration.

    vectors:   (vec_id, nemb: array<double>) unit-norm
    centroids: (centroid_id, cemb: array<double>) unit-norm

    Returns (assignment, new_centroids) where assignment =
    (vec_id, centroid_id, cosine) and new_centroids =
    (centroid_id, cemb, n_assigned) with re-normalized means.
    Empty cells keep their previous centroid (n_assigned = 0).
    """
    centroids = centroids.select("centroid_id", "cemb")  # drop any extras
    dot = F.aggregate(
        F.zip_with(F.col("nemb"), F.col("cemb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "nemb", "centroid_id", F.round(dot, 6).alias("cosine")
    )
    # argmax per vector WITHOUT a window: max_by partially aggregates
    # map-side, so no corpus-sized shuffle.  Tie-break: highest cosine,
    # then lowest centroid_id (struct comparison is lexicographic).
    assigned = scored.groupBy("vec_id").agg(
        F.max_by(
            F.struct("centroid_id", "cosine"),
            F.struct(F.col("cosine"), (-F.col("centroid_id")).cast("long")),
        ).alias("_best"),
        F.first("nemb").alias("nemb"),  # constant within the group
    )
    assignment = assigned.select(
        "vec_id", F.col("_best.centroid_id").alias("centroid_id"),
        F.col("_best.cosine").alias("cosine"),
    )
    comps = (
        assigned.select(
            F.col("_best.centroid_id").alias("centroid_id"),
            F.posexplode("nemb").alias("pos", "v"),
        )
        .groupBy("centroid_id", "pos")
        # round(9): pins the only fold-order-sensitive intermediate so a
        # SQL oracle can replay the step bit-identically (the unrounded
        # avg differs across engines in final ulps; 1e-9 is far below
        # any geometric signal at unit norm).  Downstream cosines round
        # at 6, so the pin is invisible to results.
        .agg(F.round(F.avg("v"), 9).alias("m"), F.count("*").alias("n"))
    )
    means = comps.groupBy("centroid_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ),  # K x dim rows: driver-safe collect_list per centroid
            lambda s: s["m"],
        ).alias("mean"),
        F.first("n").alias("n_assigned"),
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("mean"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    new_cents = (
        centroids.join(means, "centroid_id", "left")
        .select(
            "centroid_id",
            F.when(
                F.col("mean").isNotNull(),
                F.transform(F.col("mean"), lambda x: x / nrm),
            )
            .otherwise(F.col("cemb"))
            .alias("cemb"),
            F.coalesce("n_assigned", F.lit(0)).alias("n_assigned"),
        )
    )
    return assignment, new_cents


def kmeans_train(
    vectors: DataFrame,
    k: int,
    *,
    max_iter: int = 20,
    tol: float = 1e-4,
) -> DataFrame:
    """Train K spherical centroids; init = first k vectors by vec_id
    (deterministic, mirrors ivf_ann_assign).  Returns (centroid_id,
    cemb, n_assigned) after convergence (max drift 1-cos < tol) or
    max_iter rounds."""
    vectors = vectors.select("vec_id", "nemb").persist()
    cents = (
        vectors.filter(F.col("vec_id") < k)
        .select(
            F.col("vec_id").cast("long").alias("centroid_id"),
            F.col("nemb").alias("cemb"),
            F.lit(0).cast("long").alias("n_assigned"),
        )
        .persist()
    )
    dot = F.aggregate(
        F.zip_with(F.col("cemb"), F.col("prev"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    for _ in range(max_iter):
        _, new_cents = lloyd_step(vectors, cents)
        # K rows: checkpointing is free and truncates the otherwise
        # round-nested logical plan (analysis time blows up without it)
        new_cents = new_cents.localCheckpoint(eager=True)
        if tol > 0:
            drift = (
                new_cents.join(
                    cents.select("centroid_id", F.col("cemb").alias("prev")),
                    "centroid_id",
                )
                .agg(F.max(1.0 - dot).alias("d"))
                .collect()[0][0]
            )
        else:
            # tol<=0 = fixed-iteration mode (the oracle-unrolled
            # ivf_search_trained contract): drift can never end the
            # loop, so skip its join+collect job per round
            drift = None
        cents.unpersist()
        cents = new_cents
        if drift is not None and drift < tol:
            break
    vectors.unpersist()
    return cents
