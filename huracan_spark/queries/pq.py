"""Product quantization (PQ) for the embeddings table.

The memory-compression half of a production ANN stack (IVF narrows
WHERE to look, PQ shrinks WHAT is stored): each 64-d vector becomes
M=8 sub-codes of 4 bits (K=16 codewords per subspace) — 4 bytes per
vector instead of 512, the difference between an index that fits in
executor memory at 100 TB and one that doesn't.  Reference has no
analog (beyond-parity, same family as IVF in queries/similarity.py).

Spark-first shapes:
- the codebook is DETERMINISTIC (subvectors of the first K normalized
  corpus vectors, the ivf_ann_assign convention) and tiny (M x K = 128
  rows) — always broadcast, computed once per plan;
- encoding is argmin via partial-aggregated ``min_by`` per (vector,
  subspace) — map-side combine, never a corpus-sized window;
- ADC search precomputes the (query x subspace x codeword) lookup
  table — N_QUERIES x 128 rows, broadcast — and the corpus side only
  JOINS its codes against the LUT: the scan does table lookups, no
  arithmetic on raw vectors, which is exactly why PQ scans survive
  100 TB;
- codes pack into one BIGINT (4 bits x 8 subspaces) so the driver can
  value-hash the encoding.

Cross-engine determinism: subspace distances fold sequentially (Spark
``aggregate`` == DuckDB ``list_reduce``) and are pinned with round(6)
before any argmin/sum; ties break toward the lowest code id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from huracan_spark.queries.registry import register
from huracan_spark.queries.similarity import (
    DIM,
    N_QUERIES,
    TOP_K,
    _emb,
    _normalized,
    _NORMALIZED_SQL,
)

M_SUBS = 8  # subspaces
SUBDIM = DIM // M_SUBS  # dims per subspace
K_CODES = 16  # codewords per subspace (4 bits)


def _l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance between two arrays."""
    diffs = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _l2sq_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )


def _subspaces(df: DataFrame, vec_col: str = "nemb") -> DataFrame:
    """Explode (…, vec) into (…, m, sub): M_SUBS slices of SUBDIM dims."""
    subs = F.array(
        *[
            F.struct(
                F.lit(m).cast("int").alias("m"),
                F.slice(vec_col, m * SUBDIM + 1, SUBDIM).alias("sub"),
            )
            for m in range(M_SUBS)
        ]
    )
    return df.withColumn("_s", F.explode(subs)).select(
        *[c for c in df.columns if c != vec_col],
        F.col("_s.m").alias("m"),
        F.col("_s.sub").alias("sub"),
    )


def _codebook(n: DataFrame) -> DataFrame:
    """(m, code, cw): deterministic codebook — subvectors of the first
    K_CODES normalized corpus vectors.  M x K rows; broadcast-sized."""
    return _subspaces(
        n.filter(F.col("vec_id") < K_CODES).select(
            F.col("vec_id").cast("int").alias("code"), "nemb"
        )
    ).select("m", "code", F.col("sub").alias("cw"))


_CODEBOOK_SQL = f"""
  SELECT m.m, CAST(c.vec_id AS INT) AS code,
         c.nemb[m.m * {SUBDIM} + 1 : m.m * {SUBDIM} + {SUBDIM}] AS cw
  FROM n c CROSS JOIN (SELECT unnest(generate_series(0, {M_SUBS - 1})) AS m) m
  WHERE c.vec_id < {K_CODES}
"""

_CORPUS_SUBS_SQL = f"""
  SELECT v.vec_id, m.m,
         v.nemb[m.m * {SUBDIM} + 1 : m.m * {SUBDIM} + {SUBDIM}] AS sub
  FROM n v CROSS JOIN (SELECT unnest(generate_series(0, {M_SUBS - 1})) AS m) m
"""

# nearest codeword per (vector, subspace): round(6)-pinned distance,
# lowest code id on ties — identical ordering on both engines
_ENCODE_CTES = f"""n AS ({_NORMALIZED_SQL}),
cb AS ({_CODEBOOK_SQL}),
subs AS ({_CORPUS_SUBS_SQL}),
scored AS (
  SELECT s.vec_id, s.m, c.code,
         round({_l2sq_sql('s.sub', 'c.cw')}, 6) AS d
  FROM subs s JOIN cb c ON c.m = s.m
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY d, code) AS rn
    FROM scored
  ) WHERE rn = 1
)"""

_PQ_ENCODE_ORACLE = f"""
WITH {_ENCODE_CTES}
SELECT vec_id,
       CAST(sum(code * power(2, 4 * m)) AS BIGINT) AS pq_code
FROM codes GROUP BY vec_id
"""


def _encoded(n: DataFrame) -> DataFrame:
    """(vec_id, m, code): PQ codes of the corpus via partial-agg
    min_by argmin — no window touches the corpus."""
    cb = _codebook(n)
    scored = _subspaces(n.select("vec_id", "nemb")).join(
        F.broadcast(cb), "m"
    ).select(
        "vec_id", "m", "code", F.round(_l2sq(F.col("sub"), F.col("cw")), 6).alias("d")
    )
    return scored.groupBy("vec_id", "m").agg(
        F.min_by("code", F.struct("d", "code")).alias("code")
    )


# The corpus code table is shared per (applicationId, sf_dir) like the
# semdedup assignment: PQ codes ARE the stored index artifact (4 bytes
# per vector is the entire point), and all three PQ queries read the
# same encoding a deployment would persist.  The one-time argmin
# encode pass is charged to the `pq:encode` GROUP via matcost.
_SF_PQ_CODES: dict[tuple[str, str], DataFrame] = {}


def _codes_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.queries.matcost import charged_build

    key = (spark.sparkContext.applicationId, sf_dir)
    df = _SF_PQ_CODES.get(key)
    if df is None:
        with charged_build("pq:encode"):
            n = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb")
            # eager localCheckpoint: survives bench cache hygiene (RDD
            # blocks) and truncates the argmin lineage
            df = _encoded(n).localCheckpoint(eager=True)
        _SF_PQ_CODES[key] = df
    return df


@register(
    "pq_encode",
    _PQ_ENCODE_ORACLE,
    doc=f"product quantization: {M_SUBS}x{SUBDIM}-d subspaces, {K_CODES} "
    "deterministic codewords each; codes packed into one BIGINT "
    "(4 bytes/vector at 100 TB instead of 512)",
)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = F.expr("CAST(code AS BIGINT) * CAST(pow(2, 4 * m) AS BIGINT)")
    return (
        _codes_shared(spark, sf_dir)
        .groupBy("vec_id")
        .agg(F.sum(packed).alias("pq_code"))
    )


# -- asymmetric distance computation (ADC) search ---------------------------

_ADC_CTES = f"""lut AS (
  SELECT q.vec_id AS query_id, c.m, c.code,
         round({_l2sq_sql('q.sub', 'c.cw')}, 6) AS pd
  FROM (SELECT * FROM subs WHERE vec_id < {N_QUERIES}) q
  JOIN cb c ON c.m = q.m
),
adc AS (
  SELECT l.query_id, k.vec_id AS neighbor_id,
         round(sum(l.pd), 6) AS adc_dist
  FROM codes k JOIN lut l ON l.m = k.m AND l.code = k.code
  WHERE k.vec_id <> l.query_id
  GROUP BY l.query_id, k.vec_id
),
approx AS (
  SELECT query_id, neighbor_id, adc_dist FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {TOP_K}
)"""

_PQ_ADC_ORACLE = f"""
WITH {_ENCODE_CTES},
{_ADC_CTES}
SELECT query_id, neighbor_id, adc_dist FROM approx
"""


def _adc_topk(n: DataFrame, codes: DataFrame) -> DataFrame:
    cb = _codebook(n)
    q_subs = _subspaces(
        n.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "nemb"
        )
    )
    lut = q_subs.join(F.broadcast(cb), "m").select(
        "query_id",
        "m",
        "code",
        F.round(_l2sq(F.col("sub"), F.col("cw")), 6).alias("pd"),
    )
    # the corpus side carries only (vec_id, m, code); distance work is
    # a broadcast LUT lookup + partial-agg sum — the PQ scan shape
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("pd"), 6).alias("adc_dist"))
    )
    # two-phase top-k (the r9 _knn_from fix): a window over query_id
    # alone has N_QUERIES partitions, so the corpus-sized ADC table
    # would sort in 5 tasks; phase 1 ranks per (query, input
    # partition), phase 2 re-ranks the bounded survivor grid — any
    # global top-k row is in its partition's local top-k, so results
    # are identical (same distance, same tie-break).
    order = (F.col("adc_dist"), F.col("neighbor_id"))
    wpart = Window.partitionBy("query_id", F.spark_partition_id()).orderBy(*order)
    cands = (
        adc.withColumn("rn", F.row_number().over(wpart))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "adc_dist")
    )


@register(
    "pq_adc_topk",
    _PQ_ADC_ORACLE,
    doc=f"PQ asymmetric-distance top-{TOP_K}: broadcast "
    f"(query x subspace x codeword) LUT joined against corpus codes "
    "— the scan does lookups, not vector arithmetic",
)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # n feeds only the K_CODES codebook + N_QUERIES LUT slices (both
    # parquet-pruned by the vec_id filter); the corpus side reads the
    # shared code table
    n = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb")
    return _adc_topk(n, _codes_shared(spark, sf_dir))


# -- recall vs exact L2 -----------------------------------------------------

_PQ_RECALL_ORACLE = f"""
WITH {_ENCODE_CTES},
{_ADC_CTES},
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round({_l2sq_sql('q.nemb', 'e.nemb')}, 6),
                      e.vec_id) AS rn
    FROM n q JOIN n e ON e.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {TOP_K}
)
SELECT e.query_id,
       count(*) AS k,
       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       round(CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS recall_at_k
FROM exact e
LEFT JOIN approx a USING (query_id, neighbor_id)
GROUP BY 1
"""


@register(
    "pq_recall_eval",
    _PQ_RECALL_ORACLE,
    doc=f"recall@{TOP_K} of PQ-ADC search vs exact L2 top-k — the "
    "quantization-loss gauge (read with ann_recall_eval/ann_recall_trained)",
)
def q_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb").persist()
    n.count()  # eager: lazy persist under broadcast races re-runs the pass
    exact = (
        n.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("nemb").alias("qv"))
        .join(n, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_l2sq(F.col("qv"), F.col("nemb")), 6).alias("d"),
        )
    )
    # two-phase top-k, same rationale/audit as _adc_topk above
    order = (F.col("d"), F.col("neighbor_id"))
    wpart = Window.partitionBy("query_id", F.spark_partition_id()).orderBy(*order)
    exact_cand = (
        exact.withColumn("rn", F.row_number().over(wpart))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    exact_topk = (
        exact_cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    approx = _adc_topk(n, _codes_shared(spark, sf_dir)).select(
        "query_id", "neighbor_id", F.lit(1).alias("_hit")
    )
    return (
        exact_topk.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("k"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
            F.round(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count("*"), 6
            ).alias("recall_at_k"),
        )
    )
