"""Deterministic sketch operators: Count-Min, Bloom prefilter, vocab growth.

Beyond-reference extensions per the build brief. All three are the
exactly-reproducible twins of probabilistic-structure operators a
100 TB engine runs constantly:

- ``cms_heavy_hitters`` — a Count-Min sketch (d x w counter grid built
  from the shared ``hash60`` family) probed for the true top-K tokens,
  emitting the estimate next to the truth. The sketch is d*w cells by
  construction (mergeable across shards by cell-wise addition); the
  corpus-sized token stream collapses into it via map-side partial
  aggregation. CMS guarantees est >= true, and the query exposes the
  overestimate so the error bound is itself driver-checked.
- ``bloom_prefilter_join`` — a k-hash Bloom filter built from the
  small (filtered) side of a join, applied to the probe side BEFORE
  the join — the classic runtime-filter/semi-join-reduction pattern
  (Spark's own runtime bloom pushdown, made explicit and deterministic
  so the oracle reproduces the exact bit positions). Emits per-segment
  pass/actual/false-positive counts; zero false negatives is a
  structural property the hash-match verifies.
- ``vocab_growth_curve`` — Heaps-law vocabulary growth measured in ONE
  scan: each vocabulary unit (token bigram) records the minimum
  hash-slice in which it appears, so "distinct vocab after slice b" is
  a count over first-occurrence slices — no 10x re-scan of cumulative
  prefixes, no corpus-wide distinct per slice.

No UDFs; hash positions come from ``functions/textfns.py::hash60`` with
oracle twins generated from the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from huracan_spark.functions.textfns import hash60, hash60_sql, tokens, tokens_sql
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

CMS_DEPTH = 4  # count-min rows (independent hash functions)
CMS_WIDTH = 512  # counters per row
CMS_TOP_K = 15  # heavy hitters probed

BLOOM_BITS = 4096
BLOOM_HASHES = 3
BLOOM_PRICE_MIN = 450000  # build side: customers with an order above this

GROWTH_SLICES = 10  # hash slices for the vocabulary growth curve


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# -- Count-Min sketch heavy hitters -----------------------------------------

_CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest({tokens_sql('text')}) AS token FROM documents
),
truth AS (SELECT token, count(*) AS true_n FROM tok GROUP BY token),
top AS (
  SELECT token, true_n FROM truth
  ORDER BY true_n DESC, token LIMIT {CMS_TOP_K}
),
cells AS (
  SELECT r.r, {hash60_sql('t.token', 'cms' + "' || r.r || '")} % {CMS_WIDTH} AS bucket,
         count(*) AS cell_n
  FROM tok t CROSS JOIN (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS r) r
  GROUP BY 1, 2
),
probe AS (
  SELECT p.token, p.true_n, r.r,
         {hash60_sql('p.token', 'cms' + "' || r.r || '")} % {CMS_WIDTH} AS bucket
  FROM top p CROSS JOIN (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS r) r
)
SELECT p.token, p.true_n, min(c.cell_n) AS est_n,
       min(c.cell_n) - p.true_n AS overestimate
FROM probe p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
GROUP BY p.token, p.true_n
"""


@register(
    "cms_heavy_hitters",
    _CMS_ORACLE,
    doc=f"Count-Min sketch ({CMS_DEPTH}x{CMS_WIDTH}) probed for the true "
    f"top-{CMS_TOP_K} tokens: estimate = min over rows of the hashed "
    "cell count, emitted next to the truth so the one-sided error is "
    "itself checked. Sketch is d*w cells (mergeable, map-side combined); "
    "top-K is distributed TakeOrderedAndProject",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _docs(spark, sf_dir).select(F.explode(tokens("text")).alias("token"))
    # reduce the corpus to per-token counts FIRST: the CMS_DEPTH-way
    # hash explode then runs over the (Zipf-bounded) token TYPE table,
    # not the corpus — cells are weighted sums of type counts, exactly
    # equal to counting per-occurrence but 4x cheaper on the big side
    truth = tok.groupBy("token").agg(F.count("*").alias("true_n")).persist()
    top = truth.orderBy(F.col("true_n").desc(), "token").limit(CMS_TOP_K)

    def positions(df: DataFrame) -> DataFrame:
        rows = F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    (hash60(F.col("token"), f"cms{r}") % CMS_WIDTH).alias("bucket"),
                )
                for r in range(CMS_DEPTH)
            ]
        )
        return df.select(*df.columns, F.explode(rows).alias("pos")).select(
            *df.columns, F.col("pos.r").alias("r"), F.col("pos.bucket").alias("bucket")
        )

    cells = (
        positions(truth)
        .groupBy("r", "bucket")
        .agg(F.sum("true_n").cast("long").alias("cell_n"))
    )
    probe = positions(top)
    # the sketch is CMS_DEPTH * CMS_WIDTH rows by construction -> broadcast
    return (
        probe.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("token", "true_n")
        .agg(F.min("cell_n").alias("est_n"))
        .select(
            "token",
            "true_n",
            "est_n",
            (F.col("est_n") - F.col("true_n")).alias("overestimate"),
        )
    )


# -- Bloom-prefiltered join --------------------------------------------------

_BLOOM_ORACLE = f"""
WITH build AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > {BLOOM_PRICE_MIN}
),
bits AS (
  SELECT DISTINCT
         {hash60_sql('CAST(b.o_custkey AS VARCHAR)', 'bloom' + "' || h.h || '")}
           % {BLOOM_BITS} AS bit
  FROM build b
  CROSS JOIN (SELECT unnest(generate_series(0, {BLOOM_HASHES - 1})) AS h) h
),
probe AS (
  SELECT DISTINCT c.c_custkey, c.c_mktsegment,
         {hash60_sql('CAST(c.c_custkey AS VARCHAR)', 'bloom' + "' || h.h || '")}
           % {BLOOM_BITS} AS bit
  FROM customer c
  CROSS JOIN (SELECT unnest(generate_series(0, {BLOOM_HASHES - 1})) AS h) h
),
verdict AS (
  SELECT p.c_custkey, p.c_mktsegment,
         CAST(count(*) FILTER (WHERE s.bit IS NOT NULL) = count(*) AS INT)
           AS pass_bloom
  FROM probe p LEFT JOIN bits s ON p.bit = s.bit
  GROUP BY p.c_custkey, p.c_mktsegment
),
actual AS (
  SELECT v.c_custkey, v.c_mktsegment, v.pass_bloom,
         CAST(EXISTS (SELECT 1 FROM build b WHERE b.o_custkey = v.c_custkey)
              AS INT) AS is_match
  FROM verdict v
)
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(pass_bloom) AS BIGINT) AS n_pass_bloom,
       CAST(sum(is_match) AS BIGINT) AS n_actual,
       CAST(sum(pass_bloom) - sum(is_match) AS BIGINT) AS n_false_pos
FROM actual GROUP BY c_mktsegment
"""


@register(
    "bloom_prefilter_join",
    _BLOOM_ORACLE,
    doc=f"explicit runtime Bloom filter ({BLOOM_BITS} bits, {BLOOM_HASHES} "
    "hashes) built from the filtered build side of a join and applied to "
    "the probe side as a broadcast prefilter — the semi-join-reduction "
    "pattern that lets a 100 TB probe side skip the shuffle for rows that "
    "cannot match. Per-segment pass/actual/false-positive counts; the "
    "hash-match pins zero false negatives",
)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    build = (
        orders.filter(F.col("o_totalprice") > BLOOM_PRICE_MIN)
        .select("o_custkey")
        .distinct()
    )

    def positions(df: DataFrame, key: str) -> DataFrame:
        arr = F.array(
            *[
                (hash60(F.col(key).cast("string"), f"bloom{h}") % BLOOM_BITS)
                for h in range(BLOOM_HASHES)
            ]
        )
        return df.select(*df.columns, F.explode(arr).alias("bit")).distinct()

    bits = positions(build, "o_custkey").select("bit").distinct()
    probe = positions(cust.select("c_custkey", "c_mktsegment"), "c_custkey")
    verdict = (
        probe.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            (F.count("_set") == F.count("*")).cast("int").alias("pass_bloom")
        )
    )
    hit = build.withColumn("_hit", F.lit(1))
    actual = verdict.join(
        F.broadcast(hit), verdict.c_custkey == hit.o_custkey, "left"
    ).select(
        "c_mktsegment",
        "pass_bloom",
        F.coalesce(F.col("_hit"), F.lit(0)).alias("is_match"),
    )
    return actual.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum("pass_bloom").cast("long").alias("n_pass_bloom"),
        F.sum("is_match").cast("long").alias("n_actual"),
        (F.sum("pass_bloom") - F.sum("is_match")).cast("long").alias("n_false_pos"),
    )


# -- Heaps-law vocabulary growth curve ---------------------------------------

# Vocabulary unit = adjacent token bigram (the whitespace-token type
# space of the fixture is tiny; bigrams give a real growth curve).
# The one-scan trick: a unit's contribution to "distinct vocab after
# slice b" is decided entirely by the FIRST (minimum) slice it appears
# in, so one min-aggregate replaces per-slice distinct re-scans.

_GROWTH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {hash60_sql('CAST(doc_id AS VARCHAR)', 'slice')} % {GROWTH_SLICES}
           AS slice,
         {tokens_sql('text')} AS ts
  FROM documents
),
bg AS (
  SELECT slice, ts[i] || ' ' || ts[i + 1] AS unit
  FROM (
    SELECT slice, ts, unnest(generate_series(1, len(ts) - 1)) AS i
    FROM tok WHERE len(ts) >= 2
  )
),
mass AS (SELECT slice, count(*) AS n_units FROM bg GROUP BY slice),
first_seen AS (
  SELECT unit, min(slice) AS first_slice FROM bg GROUP BY unit
),
new_vocab AS (
  SELECT first_slice AS slice, count(*) AS n_new FROM first_seen GROUP BY 1
)
SELECT m.slice,
       CAST(sum(m2.n_units) AS BIGINT) AS n_units_cum,
       CAST(sum(coalesce(v.n_new, 0)) AS BIGINT) AS n_vocab_cum
FROM mass m
JOIN mass m2 ON m2.slice <= m.slice
LEFT JOIN new_vocab v ON v.slice = m2.slice
GROUP BY m.slice
"""


@register(
    "vocab_growth_curve",
    _GROWTH_ORACLE,
    doc=f"Heaps-law vocabulary growth over {GROWTH_SLICES} hash slices of "
    "the corpus in ONE scan: each bigram unit records its minimum slice, "
    "so cumulative distinct vocab is a count over first-occurrence "
    "slices — no per-slice re-scan, no corpus-wide distinct per point; "
    "the cumulative join runs over the bounded slice table only",
)
def q_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        (hash60(F.col("doc_id").cast("string"), "slice") % GROWTH_SLICES).alias(
            "slice"
        ),
        tokens("text").alias("ts"),
    ).filter(F.size("ts") >= 2)
    pair = F.concat(
        F.expr("element_at(ts, i)"), F.lit(" "), F.expr("element_at(ts, i + 1)")
    )
    bg = tok.select(
        "slice", F.explode(F.sequence(F.lit(1), F.size("ts") - 1)).alias("i"), "ts"
    ).select("slice", pair.alias("unit"))
    mass = bg.groupBy("slice").agg(F.count("*").alias("n_units"))
    first_seen = bg.groupBy("unit").agg(F.min("slice").alias("slice"))
    new_vocab = first_seen.groupBy("slice").agg(F.count("*").alias("n_new"))
    per_slice = mass.join(new_vocab, "slice", "left").select(
        "slice", "n_units", F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new")
    )
    # cumulative over the GROWTH_SLICES-row table only (bounded window)
    cum = Window.orderBy("slice").rowsBetween(Window.unboundedPreceding, 0)
    return per_slice.select(
        "slice",
        F.sum("n_units").over(cum).cast("long").alias("n_units_cum"),
        F.sum("n_new").over(cum).cast("long").alias("n_vocab_cum"),
    )


# -- AMS (Alon–Matias–Szegedy) F2 sketch ------------------------------------
#
# The second frequency moment Σ f_k² — the self-join size of the
# stream on its key, and THE statistic a cost-based optimizer wants
# before committing to a shuffle strategy.  The AMS estimator keeps
# R ±1-signed counters: c_r = Σ_k s_r(k)·f_k; each c_r² is an
# unbiased estimate of F2 and the mean over R concentrates.  Cost
# shape: ONE linear pass builds the per-key frequency table (the
# shuffle the query needs anyway), then ONE md5 per DISTINCT key
# supplies all R signs at once (bit r of hash60), and the counter
# fold runs over |keys|·R tiny rows — mergeable across shards/days
# because signs depend only on the key.  Exact F2 rides the same
# frequency table for the driver-checked estimator error.

AMS_R = 60  # one sign bit per hash60 bit


_AMS_ORACLE = f"""
WITH freq AS (
  SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS f
  FROM events GROUP BY user_id
),
hashed AS (
  SELECT f, {hash60_sql('k', 'ams')} AS h FROM freq
),
counters AS (
  SELECT r.r,
         CAST(sum(CASE WHEN (h & (CAST(1 AS BIGINT) << r.r)) <> 0
                       THEN f ELSE -f END)
              AS BIGINT) AS c
  FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, {AMS_R - 1})) AS r) r
  GROUP BY r.r
),
est AS (SELECT avg(CAST(c AS DOUBLE) * c) AS f2_est FROM counters),
exact AS (SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact FROM freq)
SELECT CAST(round(e.f2_est, 0) AS BIGINT) AS f2_est,
       x.f2_exact,
       round(e.f2_est / x.f2_exact, 4) AS est_ratio
FROM est e CROSS JOIN exact x
"""


@register(
    "ams_f2_estimate",
    _AMS_ORACLE,
    doc=f"AMS second-frequency-moment sketch ({AMS_R} ±1-signed "
    "counters; all signs from the bits of ONE hash60 per distinct "
    "key, counter fold over the |keys|-bounded frequency table): "
    "self-join-size estimation with mergeable bounded state — the "
    "shuffle-strategy planning statistic; exact F2 alongside for the "
    "driver-checked estimator quality",
)
def q_ams_f2_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    freq = (
        ev.groupBy(F.col("user_id").cast("string").alias("k"))
        .agg(F.count("*").alias("f"))
        .withColumn("h", hash60(F.col("k"), "ams"))
        .persist()  # counters + exact legs share one frequency pass
    )
    rs = spark.range(AMS_R).select(
        F.col("id").cast("int").alias("r"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").alias("mask"),
    )
    sign = F.when(F.col("h").bitwiseAND(F.col("mask")) != 0, 1).otherwise(-1)
    counters = (
        freq.crossJoin(F.broadcast(rs))
        .groupBy("r")
        .agg(F.sum(sign * F.col("f")).cast("long").alias("c"))
    )
    est = counters.agg(
        F.avg(F.col("c").cast("double") * F.col("c")).alias("f2_est")
    )
    exact = freq.agg(F.sum(F.col("f") * F.col("f")).cast("long").alias("f2_exact"))
    return est.crossJoin(F.broadcast(exact)).select(
        F.round("f2_est", 0).cast("long").alias("f2_est"),
        "f2_exact",
        F.round(F.col("f2_est") / F.col("f2_exact"), 4).alias("est_ratio"),
    )
