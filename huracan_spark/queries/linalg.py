"""Distributed linear algebra over the ``embeddings`` table.

Three operators a vector-data pipeline layers on an embedding corpus
(beyond-reference extension per the build brief; complements the ANN /
PQ stack in ``queries/similarity.py`` and ``queries/pq.py``):

- ``embedding_dim_stats`` — per-dimension mean / stddev / min / max
  (the feature-scaling audit every normalization step starts from).
  One ``posexplode`` scan + a 64-group hash agg; output bounded by
  the dimensionality, never the corpus.
- ``embedding_int8_quant`` — symmetric int8 quantization audit:
  per-dim max-abs scale, round-to-nearest code, reconstruction RMSE
  and saturation count.  Two linear scans (scale pass + error pass)
  with the 64-row scale table broadcast back — the int8 compression
  feasibility report for a 100 TB vector corpus.
- ``pca_power_iteration`` — dominant principal component of the
  centered corpus via two power-iteration steps, WITHOUT ever
  materializing the covariance matrix: each step is ONE scan of the
  ARRAY-form centered corpus — the per-vector dot  t_i = (x_i - m)·v
  folds inline against the broadcast vector row, then
  y = Σ_i t_i (x_i - m) is a posexplode + 64-group partial agg.
  State between steps is a 1-row vector array — broadcast, never
  shuffled; no corpus-sized exchange exists anywhere in a pass
  (the r10 long form paid an n-row groupBy(vec_id) shuffle + an
  n·64 join per pass).  O(n·d) work per pass, O(d) driver-visible
  state, no O(d²) intermediate.

Cross-engine determinism: float→double widening is exact on both
engines; quantization rounds via ``floor(v + 0.5)`` (identical double
math on both sides, no engine-native round-half mode involved); all
reported doubles are rounded after the final fold so parallel
summation order can't leak into the hash compare.

No UDFs, no driver-side loops, no ``collect`` — the iteration count
is a compile-time constant (2), so the "loop" is just a deeper plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

DIM = 64
# deterministic power-iteration init: uniform unit vector; sqrt(64)=8
# is exact in binary, so 1/8 is the same double on both engines.
V0 = 1.0 / 8.0


def _vecdim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, pos, x) long form — pos 0-based, x exact double."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.posexplode(
            F.transform(F.col("embedding"), lambda v: v.cast("double"))
        ).alias("pos", "x"),
    )


# oracle twin of _vecdim: 1-based dims table x list_extract; the +/-1
# shift is applied once in the final projection of each oracle.
_VECDIM_SQL = f"""
dims AS (SELECT unnest(generate_series(1, {DIM})) AS dim),
vd AS (
  SELECT e.vec_id, d.dim, CAST(e.embedding[d.dim] AS DOUBLE) AS x
  FROM embeddings e CROSS JOIN dims d
)
"""


# -- per-dimension distribution stats ---------------------------------------

_DIM_STATS_ORACLE = f"""
WITH {_VECDIM_SQL}
SELECT dim,
       round(avg(x), 6) AS mean_x,
       round(stddev_samp(x), 6) AS std_x,
       round(min(x), 6) AS min_x,
       round(max(x), 6) AS max_x
FROM vd GROUP BY dim
"""


@register(
    "embedding_dim_stats",
    _DIM_STATS_ORACLE,
    doc="per-dimension mean/stddev/min/max of the embedding corpus — "
    "one posexplode scan, 64-group partial agg; output bounded by "
    "dimensionality, the feature-scaling audit input",
)
def q_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    vd = _vecdim(spark, sf_dir)
    return (
        vd.groupBy("pos")
        .agg(
            F.round(F.avg("x"), 6).alias("mean_x"),
            F.round(F.stddev_samp("x"), 6).alias("std_x"),
            F.round(F.min("x"), 6).alias("min_x"),
            F.round(F.max("x"), 6).alias("max_x"),
        )
        .select(
            (F.col("pos") + 1).cast("long").alias("dim"),
            "mean_x",
            "std_x",
            "min_x",
            "max_x",
        )
    )


# -- symmetric int8 quantization audit --------------------------------------

# round-to-nearest via floor(v + 0.5): identical double arithmetic on
# both engines (engine-native round() half-mode never enters), and the
# max-abs scale guarantees |code| <= 127 with equality only at the
# per-dim extreme.  All-zero dims (scale = 0) encode to 0.
_QUANT_CODE_SQL = (
    "CASE WHEN s.scale = 0 THEN 0 "
    "ELSE CAST(floor(vd.x * 127.0 / s.scale + 0.5) AS BIGINT) END"
)

_INT8_QUANT_ORACLE = f"""
WITH {_VECDIM_SQL},
scales AS (SELECT dim, max(abs(x)) AS scale FROM vd GROUP BY dim),
coded AS (
  SELECT vd.dim, vd.x, s.scale, {_QUANT_CODE_SQL} AS code
  FROM vd JOIN scales s ON s.dim = vd.dim
)
SELECT dim,
       round(any_value(scale), 6) AS scale,
       round(sqrt(avg(pow(x - code * scale / 127.0, 2))), 8) AS rmse,
       CAST(sum(CASE WHEN abs(code) = 127 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_saturated
FROM coded GROUP BY dim
"""


@register(
    "embedding_int8_quant",
    _INT8_QUANT_ORACLE,
    doc="symmetric int8 quantization audit: per-dim max-abs scale, "
    "floor(v+0.5) round-to-nearest code, reconstruction RMSE + "
    "saturation count; 64-row scale table broadcast back onto the "
    "scan — two linear passes, no corpus shuffle",
)
def q_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    vd = _vecdim(spark, sf_dir)
    scales = vd.groupBy("pos").agg(F.max(F.abs("x")).alias("scale"))
    code = F.when(F.col("scale") == 0, F.lit(0).cast("long")).otherwise(
        F.floor(F.col("x") * 127.0 / F.col("scale") + 0.5)
    )
    coded = vd.join(F.broadcast(scales), "pos").withColumn("code", code)
    err = F.col("x") - F.col("code") * F.col("scale") / 127.0
    return (
        coded.groupBy("pos")
        .agg(
            F.round(F.any_value("scale"), 6).alias("scale"),
            F.round(F.sqrt(F.avg(err * err)), 8).alias("rmse"),
            F.sum((F.abs("code") == 127).cast("long")).alias("n_saturated"),
        )
        .select(
            (F.col("pos") + 1).cast("long").alias("dim"),
            "scale",
            "rmse",
            "n_saturated",
        )
    )


# -- dominant principal component via power iteration -----------------------
#
# (the r10 long-form ``_matvec`` — broadcast-join v by pos, groupBy
# vec_id for t, join t back, groupBy pos — was replaced by the
# array-form one-scan ``_matvec_arr`` below; plan pin:
# tests/test_plans.py::test_pca_matvec_is_one_scan_no_corpus_shuffle)


def _cent_arr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, xc: array<double>) — the centered corpus in ARRAY form.

    Round-11 shape fix (guide §2.4): the long-form matvec paid TWO
    corpus passes + an n-row ``groupBy(vec_id)`` shuffle + an n·64-row
    join PER PASS just to compute per-vector dot products that the
    array row already holds.  Centering is one posexplode means pass
    (64-group partial agg) + one zip_with projection; each matvec then
    becomes ONE corpus scan with zero corpus-sized shuffles (see
    ``_matvec_arr``).  xc values are the identical doubles the long
    form produced (elementwise x - m, no fold)."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda v: v.cast("double")).alias(
            "x"
        ),
    )
    means = (
        _vecdim(spark, sf_dir).groupBy("pos").agg(F.avg("x").alias("m"))
    )
    m_row = _vec_row(means, "m", "marr")
    return x.crossJoin(F.broadcast(m_row)).select(
        "vec_id",
        F.zip_with("x", "marr", lambda a, b: a - b).alias("xc"),
    )


def _field(name: str):
    # factory, not `lambda t, name=name: ...` — PySpark HOF lambdas
    # must be 1- or 2-ary (CLAUDE.md)
    return lambda t: t[name]


def _vec_row(v: DataFrame, col: str, out: str) -> DataFrame:
    """Fold a 64-row (pos, col) vector table into ONE row carrying the
    vector as a pos-ordered array — broadcastable state between power-
    iteration passes.  array_sort over (pos, value) structs makes the
    collect_list order irrelevant (pos is unique)."""
    return v.agg(
        F.array_sort(F.collect_list(F.struct("pos", col))).alias("_s")
    ).select(F.transform("_s", _field(col)).alias(out))


def _dot(xc, varr) -> Column:
    """Per-row dot product as a fold — the whole point of the array
    form: t = xc·v needs no join and no vec_id shuffle."""
    return F.aggregate(
        F.zip_with(xc, varr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _matvec_arr(cent: DataFrame, v_row: DataFrame) -> DataFrame:
    """One covariance matvec y = Σ_i ((x_i-m)·v) (x_i-m) over the ARRAY
    form: t computed inline per row against the broadcast vector, then
    one posexplode + 64-group partial agg.  ONE corpus scan, no
    corpus-sized shuffle (the long form cost two scans, an n-row
    groupBy(vec_id) exchange and an n·64 join per pass).  Fold-order
    ulp differences are absorbed by the final round(6), the same
    cross-engine contract the oracle already relies on."""
    return (
        cent.crossJoin(F.broadcast(v_row))
        .select(_dot("xc", "varr").alias("t"), "xc")
        .select("t", F.posexplode("xc").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum(F.col("x") * F.col("t")).alias("y"))
    )


def _normalize_vec(y: DataFrame) -> DataFrame:
    """(pos, y) -> (pos, v) unit vector; the scalar norm rides a
    broadcast 1-row crossJoin, never a window."""
    nrm = y.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
    return y.crossJoin(F.broadcast(nrm)).select(
        "pos", (F.col("y") / F.col("nrm")).alias("v")
    )


# oracle: the same two passes unrolled as CTEs (the established
# unrolled-iteration pattern — see _TRAINED_CENTS_CTES in
# queries/similarity.py).  v0 = 1/8 exactly, so t1 = sum(xc)/8.
_PCA_ORACLE = f"""
WITH {_VECDIM_SQL},
means AS (SELECT dim, avg(x) AS m FROM vd GROUP BY dim),
cent AS (
  SELECT vd.vec_id, vd.dim, vd.x - mm.m AS xc
  FROM vd JOIN means mm ON mm.dim = vd.dim
),
t1 AS (SELECT vec_id, sum(xc * {V0!r}) AS t FROM cent GROUP BY vec_id),
y1 AS (SELECT c.dim, sum(c.xc * t1.t) AS y
       FROM cent c JOIN t1 ON t1.vec_id = c.vec_id GROUP BY c.dim),
n1 AS (SELECT sqrt(sum(y * y)) AS nrm FROM y1),
v1 AS (SELECT dim, y / nrm AS v FROM y1 CROSS JOIN n1),
t2 AS (SELECT c.vec_id, sum(c.xc * v1.v) AS t
       FROM cent c JOIN v1 ON v1.dim = c.dim GROUP BY c.vec_id),
y2 AS (SELECT c.dim, sum(c.xc * t2.t) AS y
       FROM cent c JOIN t2 ON t2.vec_id = c.vec_id GROUP BY c.dim),
n2 AS (SELECT sqrt(sum(y * y)) AS nrm FROM y2),
nvec AS (SELECT count(*) AS n FROM embeddings)
SELECT y2.dim,
       round(y2.y / n2.nrm, 6) AS component,
       round(n2.nrm / nvec.n, 6) AS eigenvalue
FROM y2 CROSS JOIN n2 CROSS JOIN nvec
"""


@register(
    "pca_power_iteration",
    _PCA_ORACLE,
    doc="dominant principal component via 2 power-iteration matvec "
    "passes over the centered (vec, dim) long form — covariance never "
    "materialized, O(d) state broadcast between passes; eigenvalue = "
    "Rayleigh estimate ||C v||; oracle unrolls both passes as CTEs",
)
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ARRAY form (r11): one corpus scan per matvec, zero corpus-sized
    # shuffles — the long form paid 2 scans + an n-row groupBy(vec_id)
    # exchange + an n·64 join per pass (see _matvec_arr)
    cent = _cent_arr(spark, sf_dir).persist()
    # eager: cent feeds every matvec leg incl. broadcast subtrees
    cent.count()
    v0_row = spark.range(1).select(
        F.array(*([F.lit(V0)] * DIM)).alias("varr")
    )
    # persist each 64-row vector: its LINEAGE is a full corpus pass,
    # and normalize/Rayleigh each consume it twice (agg + projection)
    y1 = _matvec_arr(cent, v0_row).localCheckpoint(eager=True)
    v1 = _normalize_vec(y1)
    y2 = _matvec_arr(cent, _vec_row(v1, "v", "varr")).localCheckpoint(
        eager=True
    )
    nrm2 = y2.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
    nvec = (
        load_table(spark, sf_dir, "embeddings")
        .agg(F.count("*").alias("n"))
    )
    return (
        y2.crossJoin(F.broadcast(nrm2))
        .crossJoin(F.broadcast(nvec))
        .select(
            (F.col("pos") + 1).cast("long").alias("dim"),
            F.round(F.col("y") / F.col("nrm"), 6).alias("component"),
            F.round(F.col("nrm") / F.col("n"), 6).alias("eigenvalue"),
        )
    )


# -- Johnson–Lindenstrauss random projection + distortion audit -------------
#
# Project d=64 -> K=16 with a deterministic ±1 sign matrix (same
# md5-derived construction as the LSH hyperplanes in
# queries/similarity.py — components are PLAN-TIME literals, so the
# projection is K per-row folds with zero shuffle and zero per-row
# hashing).  y_k = (1/sqrt(K)) Σ_d R[k][d]·x_d preserves squared
# distances in expectation; the audit measures realized distortion
# ||y_a - y_b||² / ||x_a - x_b||² on a FIXED bounded probe subset
# (vec_id < 40 -> 780 pairs) — the quadratic part never touches the
# corpus, the projection itself is the linear 100 TB path.

import hashlib

JL_K = 16
N_JL_PROBE = 40


def _jl_row(k: int) -> list[float]:
    return [
        1.0
        if int(hashlib.md5(f"jl:{k}:{d}".encode()).hexdigest()[:15], 16) & 1
        else -1.0
        for d in range(DIM)
    ]


_JL_ROWS = [_jl_row(k) for k in range(JL_K)]
_JL_SCALE = 1.0 / 4.0  # 1/sqrt(16), exact in binary


def _jl_project(col):
    """array<double> d=64 -> array<double> K=16 via plan-time literals."""
    comps = []
    for row in _JL_ROWS:
        plane = F.array(*[F.lit(c) for c in row])
        prods = F.zip_with(col, plane, lambda x, s: x * s)
        comps.append(
            F.aggregate(prods, F.lit(0.0), lambda a, x: a + x) * F.lit(_JL_SCALE)
        )
    return F.array(*comps)


def _jl_project_sql(col: str) -> str:
    terms = []
    for row in _JL_ROWS:
        lits = ", ".join(repr(c) for c in row)
        terms.append(
            f"list_reduce(list_transform(generate_series(1, {DIM}), "
            f"i -> {col}[i] * ([{lits}])[i]), (a, x) -> a + x) * {_JL_SCALE!r}"
        )
    return "[" + ", ".join(terms) + "]"


def _sqdist_sql(a: str, b: str, n: int) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {n}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )


_JL_ORACLE = f"""
WITH probe AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
  FROM embeddings WHERE vec_id < {N_JL_PROBE}
),
proj AS (SELECT vec_id, x, {_jl_project_sql('x')} AS y FROM probe)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_sqdist_sql('a.x', 'b.x', 64)}, 6) AS d2_full,
       round({_sqdist_sql('a.y', 'b.y', 16)}, 6) AS d2_proj,
       round({_sqdist_sql('a.y', 'b.y', 16)}
             / {_sqdist_sql('a.x', 'b.x', 64)}, 6) AS distortion
FROM proj a JOIN proj b ON b.vec_id > a.vec_id
"""


def _sqdist(a: Column, b: Column) -> Column:
    diffs = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


@register(
    "jl_projection_distortion",
    _JL_ORACLE,
    doc=f"Johnson-Lindenstrauss ±1 projection {DIM}->{JL_K} (plan-time "
    "literal sign matrix, zero shuffle) with realized pairwise-distance "
    f"distortion on the fixed {N_JL_PROBE}-vector probe set — the "
    "dimensionality-reduction feasibility audit; the quadratic audit "
    "is probe-bounded, the projection is the linear scale path",
)
def q_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") < N_JL_PROBE).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda v: v.cast("double")).alias("x"),
    )
    proj = probe.select("vec_id", "x", _jl_project(F.col("x")).alias("y")).persist()
    a = proj.select(
        F.col("vec_id").alias("vec_a"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = proj.select(
        F.col("vec_id").alias("vec_b"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(F.broadcast(b), F.col("vec_b") > F.col("vec_a"))
    d2f = _sqdist(F.col("xa"), F.col("xb"))
    d2p = _sqdist(F.col("ya"), F.col("yb"))
    return pairs.select(
        "vec_a",
        "vec_b",
        F.round(d2f, 6).alias("d2_full"),
        F.round(d2p, 6).alias("d2_proj"),
        F.round(d2p / d2f, 6).alias("distortion"),
    )


# -- top-2 principal components via deflation -------------------------------
#
# Component 2 = power iteration on the DEFLATED long form
# xc2 = xc - (xc·c1)·c1 — the projection removal is two more linear
# passes over (vec, dim), so the whole top-2 extraction stays O(n·d)
# per pass with O(d) broadcast state; no Gram/covariance matrix, no
# orthogonalization matrix — deflation IS the orthogonality
# guarantee (up to convergence).  Oracle unrolls all four matvec
# passes + the deflation as CTEs.

_PCA2_ORACLE = f"""
WITH {_VECDIM_SQL},
means AS (SELECT dim, avg(x) AS m FROM vd GROUP BY dim),
cent AS (
  SELECT vd.vec_id, vd.dim, vd.x - mm.m AS xc
  FROM vd JOIN means mm ON mm.dim = vd.dim
),
t1 AS (SELECT vec_id, sum(xc * {V0!r}) AS t FROM cent GROUP BY vec_id),
y1 AS (SELECT c.dim, sum(c.xc * t1.t) AS y
       FROM cent c JOIN t1 ON t1.vec_id = c.vec_id GROUP BY c.dim),
n1 AS (SELECT sqrt(sum(y * y)) AS nrm FROM y1),
v1 AS (SELECT dim, y / nrm AS v FROM y1 CROSS JOIN n1),
t2 AS (SELECT c.vec_id, sum(c.xc * v1.v) AS t
       FROM cent c JOIN v1 ON v1.dim = c.dim GROUP BY c.vec_id),
y2 AS (SELECT c.dim, sum(c.xc * t2.t) AS y
       FROM cent c JOIN t2 ON t2.vec_id = c.vec_id GROUP BY c.dim),
n2 AS (SELECT sqrt(sum(y * y)) AS nrm FROM y2),
c1 AS (SELECT dim, y / nrm AS v FROM y2 CROSS JOIN n2),
tproj AS (SELECT c.vec_id, sum(c.xc * c1.v) AS t
          FROM cent c JOIN c1 ON c1.dim = c.dim GROUP BY c.vec_id),
cent2 AS (
  SELECT c.vec_id, c.dim, c.xc - tp.t * c1.v AS xc
  FROM cent c
  JOIN tproj tp ON tp.vec_id = c.vec_id
  JOIN c1 ON c1.dim = c.dim
),
s1 AS (SELECT vec_id, sum(xc * {V0!r}) AS t FROM cent2 GROUP BY vec_id),
z1 AS (SELECT c.dim, sum(c.xc * s1.t) AS y
       FROM cent2 c JOIN s1 ON s1.vec_id = c.vec_id GROUP BY c.dim),
m1 AS (SELECT sqrt(sum(y * y)) AS nrm FROM z1),
w1 AS (SELECT dim, y / nrm AS v FROM z1 CROSS JOIN m1),
s2 AS (SELECT c.vec_id, sum(c.xc * w1.v) AS t
       FROM cent2 c JOIN w1 ON w1.dim = c.dim GROUP BY c.vec_id),
z2 AS (SELECT c.dim, sum(c.xc * s2.t) AS y
       FROM cent2 c JOIN s2 ON s2.vec_id = c.vec_id GROUP BY c.dim),
m2 AS (SELECT sqrt(sum(y * y)) AS nrm FROM z2),
nvec AS (SELECT count(*) AS n FROM embeddings)
SELECT c1.dim,
       round(c1.v, 6) AS comp1,
       round(z2.y / m2.nrm, 6) AS comp2,
       round(n2.nrm / nvec.n, 6) AS eig1,
       round(m2.nrm / nvec.n, 6) AS eig2
FROM c1 JOIN z2 ON z2.dim = c1.dim
CROSS JOIN n2 CROSS JOIN m2 CROSS JOIN nvec
"""


@register(
    "pca_deflation_top2",
    _PCA2_ORACLE,
    doc="top-2 principal components: 2 power-iteration passes for c1, "
    "projection deflation xc - (xc.c1)c1 (two more linear passes), "
    "2 passes for c2 — still O(n.d) rows per pass, O(d) broadcast "
    "state, covariance never materialized; oracle unrolls everything",
)
def q_pca_deflation_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ARRAY form (r11): one corpus scan per matvec and one for the
    # deflation projection, zero corpus-sized shuffles — the long form
    # paid 2 scans + an n-row groupBy(vec_id) exchange + an n·64 join
    # per pass, and a 3-way join for the deflation (see _matvec_arr)
    cent = _cent_arr(spark, sf_dir).persist()
    # eager: cent feeds every matvec leg incl. broadcast subtrees —
    # one count() materializes the centering pass once instead of
    # letting the broadcast threads race the fill
    cent.count()
    v0_row = spark.range(1).select(
        F.array(*([F.lit(V0)] * DIM)).alias("varr")
    )
    # persist every 64-row vector table: each is consumed by several
    # downstream subplans (normalize agg + projection + broadcast
    # exchanges), and without the pin each broadcast subtree re-runs
    # the full corpus pass that produced it (measured 59 s -> ~8 s
    # at sf0.1)
    y1 = _matvec_arr(cent, v0_row).localCheckpoint(eager=True)
    v1 = _normalize_vec(y1)
    y2 = _matvec_arr(cent, _vec_row(v1, "v", "varr")).localCheckpoint(
        eager=True
    )
    nrm2 = y2.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
    c1 = _normalize_vec(y2).withColumnRenamed("v", "c1v")

    # projection deflation xc' = xc - (xc·c1)·c1 — one pass over the
    # cached cent, the per-row dot folded inline
    c1_row = _vec_row(c1, "c1v", "carr")
    cent2 = (
        cent.crossJoin(F.broadcast(c1_row))
        .withColumn("_t", _dot("xc", "carr"))
        .select(
            "vec_id",
            F.zip_with(
                "xc", "carr", lambda a, b: a - F.col("_t") * b
            ).alias("xc"),
        )
        .persist()
    )
    cent2.count()  # eager, same rationale as cent
    z1 = _matvec_arr(cent2, v0_row).localCheckpoint(eager=True)
    w1 = _normalize_vec(z1)
    z2 = _matvec_arr(cent2, _vec_row(w1, "v", "varr")).localCheckpoint(
        eager=True
    )
    m2 = z2.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
    nvec = load_table(spark, sf_dir, "embeddings").agg(F.count("*").alias("n"))
    return (
        c1.join(z2, "pos")
        .crossJoin(F.broadcast(nrm2.withColumnRenamed("nrm", "nrm1")))
        .crossJoin(F.broadcast(m2))
        .crossJoin(F.broadcast(nvec))
        .select(
            (F.col("pos") + 1).cast("long").alias("dim"),
            F.round(F.col("c1v"), 6).alias("comp1"),
            F.round(F.col("y") / F.col("nrm"), 6).alias("comp2"),
            F.round(F.col("nrm1") / F.col("n"), 6).alias("eig1"),
            F.round(F.col("nrm") / F.col("n"), 6).alias("eig2"),
        )
    )
