"""Similarity search over the ``embeddings`` table (array<float>, d=64).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant (random-hyperplane signatures) is the 100 TB scale path — it
only ever joins within sign-signature buckets, never the full cross
product.

Numeric parity with the DuckDB oracle: both sides fold the dot
product SEQUENTIALLY in double precision (Spark ``aggregate`` with 0.0
init == DuckDB ``list_reduce``), so the cosine values are
bit-identical before rounding; rounding to 6 decimals is belt and
braces.  Everything is built-in expressions — no UDF, stays in
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from huracan_spark.functions.textfns import hash60, hash60_sql
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

N_QUERIES = 5  # vec_id 0..4 are the probe vectors
TOP_K = 10
NEAR_DUP_COS = 0.35  # synthetic vectors are near-orthogonal; pairs above this are "near"
N_HYPERPLANES = 12


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _norm_sql(a: str) -> str:
    return f"sqrt({_dot_sql(a, a)})"


_KNN_ORACLE = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round({_dot_sql('q.embedding', 'e.embedding')}
               / ({_norm_sql('q.embedding')} * {_norm_sql('e.embedding')}), 6) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM sims
) WHERE rn <= {TOP_K}
"""


@register(
    "knn_cosine_topk",
    _KNN_ORACLE,
    doc=f"brute-force cosine top-{TOP_K} for {N_QUERIES} probe vectors (ANN exactness baseline)",
)
def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # probe set is tiny -> broadcast; corpus never shuffles
    sims = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (_norm(F.col("q_emb")) * _norm(F.col("embedding"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )


_NEAR_ORACLE = f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_dot_sql('a.embedding', 'b.embedding')}
               / ({_norm_sql('a.embedding')} * {_norm_sql('b.embedding')}), 6) AS cosine
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= {NEAR_DUP_COS}
"""


@register(
    "embedding_near_dups",
    _NEAR_ORACLE,
    doc="embedding-cosine near-dup pairs within label blocks",
)
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    a = e.alias("a")
    b = e.alias("b")
    cos = F.round(
        _dot(F.col("a.embedding"), F.col("b.embedding"))
        / (_norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COS)
    )


# -- LSH-bucketed ANN (the scale path) --------------------------------------
#
# Random-hyperplane LSH: plane p (p in 0..N_HYPERPLANES-1) has
# pseudo-random +-1 components derived from hash60(p||':'||dim) —
# deterministic and reproducible in both engines.  A vector's
# signature is the bit pattern of sign(v . plane_p).  Vectors sharing
# a signature land in one bucket; candidate pairs are generated within
# buckets only.


def _plane_component(p: int) -> Column:
    # +-1 from the low bit of the shared 60-bit hash of (plane, dim)
    return (
        hash60(F.concat(F.lit(f"{p}:"), F.col("dim").cast("string")), "pl")
        .bitwiseAND(F.lit(1))
        * 2
        - 1
    ).cast("double")


def _signature_spark(e: DataFrame) -> DataFrame:
    """(vec_id, sig): bit b set iff dot(v, plane_b) > 0."""
    comp = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).withColumn("val", F.col("val").cast("double"))
    proj_aggs = [
        F.sum(F.col("val") * _plane_component(p)).alias(f"p{p}")
        for p in range(N_HYPERPLANES)
    ]
    proj = comp.groupBy("vec_id").agg(*proj_aggs)
    sig = None
    for p in range(N_HYPERPLANES):
        bit = F.when(F.col(f"p{p}") > 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    return proj.select("vec_id", sig.alias("sig"))


def _signature_sql() -> str:
    proj_cols = ",\n".join(
        "         sum(val * (("
        + hash60_sql(f"'{p}:' || CAST(dim AS VARCHAR)", "pl")
        + f" & 1) * 2 - 1)) AS p{p}"
        for p in range(N_HYPERPLANES)
    )
    bits = " + ".join(
        f"(CASE WHEN p{p} > 0 THEN CAST({2**p} AS BIGINT) ELSE 0 END)"
        for p in range(N_HYPERPLANES)
    )
    return f"""
  WITH comp AS (
    -- parallel unnests zip row-wise; dim is 0-based like posexplode
    SELECT vec_id,
           unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS val,
           unnest(generate_series(0, len(embedding) - 1)) AS dim
    FROM embeddings
  ), proj AS (
    SELECT vec_id,
{proj_cols}
    FROM comp GROUP BY vec_id
  )
  SELECT vec_id, {bits} AS sig FROM proj
"""


_LSH_SIG_ORACLE = f"""
WITH sigs AS ({_signature_sql()})
SELECT sig, count(*) AS n_vectors, min(vec_id) AS min_vec_id
FROM sigs GROUP BY sig
"""


@register(
    "ann_lsh_buckets",
    _LSH_SIG_ORACLE,
    doc=f"random-hyperplane LSH bucketing ({N_HYPERPLANES} planes) — the ANN scale path",
)
def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = _signature_spark(_emb(spark, sf_dir))
    return sigs.groupBy("sig").agg(
        F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )
