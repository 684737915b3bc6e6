"""Similarity search over the ``embeddings`` table (array<float>, d=64).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant (random-hyperplane signatures) is the 100 TB scale path — it
only ever joins within sign-signature buckets, never the full cross
product.

Performance shape (measured at sf0.1, see BENCH):
- vectors are L2-NORMALIZED ONCE in a first projection, so every pair
  costs a single fused zip_with+aggregate fold instead of three
  (dot + two norms) — 3x fewer FLOPs on the pair quadratic;
- hyperplane components are PRECOMPUTED literals (hashlib md5 at plan
  build, the same formula the oracle inlines), so signatures are 12
  per-row folds with zero shuffle and zero per-row hashing.

Numeric parity with the DuckDB oracle: both sides fold SEQUENTIALLY
in double precision (Spark ``aggregate`` with 0.0 init == DuckDB
``list_reduce``) over the SAME normalize-then-dot formulation, so
cosines are bit-identical before the round(6).  No UDFs — everything
stays in codegen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

N_QUERIES = 5  # vec_id 0..4 are the probe vectors
TOP_K = 10
NEAR_DUP_COS = 0.35  # synthetic vectors are near-orthogonal; pairs above this are "near"
N_HYPERPLANES = 12
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


def _normalized(e: DataFrame) -> DataFrame:
    """Project (vec_id, label, nemb): unit-norm double vectors."""
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e = e.withColumn("_d", dbl)
    nrm = F.sqrt(_dot(F.col("_d"), F.col("_d")))
    return e.select(
        "vec_id",
        "label",
        F.transform(F.col("_d"), lambda x: x / nrm).alias("nemb"),
    )


_NORMALIZED_SQL = f"""
  SELECT vec_id, label,
         list_transform(_d, x -> x / sqrt({_dot_sql('_d', '_d')})) AS nemb
  FROM (SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS _d
        FROM embeddings)
"""


_KNN_ORACLE = f"""
WITH n AS ({_NORMALIZED_SQL}),
q AS (SELECT vec_id, nemb FROM n WHERE vec_id < {N_QUERIES}),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round({_dot_sql('q.nemb', 'e.nemb')}, 6) AS cosine
  FROM q JOIN n e ON e.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM sims
) WHERE rn <= {TOP_K}
"""


# The exact ground-truth top-k panel is shared per (applicationId,
# sf_dir) like the trained quantizer: it is the stored eval artifact of
# any ANN deployment (you compute the brute-force panel once, then
# score every index build against it), and THREE registered queries
# consume the identical (query_id, neighbor_id, cosine) table —
# knn_cosine_topk itself, ann_recall_eval and ann_recall_trained each
# re-ran the full corpus fold pass (N_QUERIES cosines per row) before
# r10.  The one-time pass is charged to the `knn:exact` GROUP via
# matcost; the N_QUERIES x TOP_K result rides an eager localCheckpoint
# (survives bench's clearCache hygiene, like the other shared builds).
_SF_EXACT_KNN: dict[tuple[str, str], DataFrame] = {}


def _exact_knn_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.queries.matcost import charged_build

    key = (spark.sparkContext.applicationId, sf_dir)
    df = _SF_EXACT_KNN.get(key)
    if df is None:
        with charged_build("knn:exact"):
            # persist: corpus side + probe side both derive from n (see
            # q_embedding_near_dups for the scale note)
            n = _normalized(_emb(spark, sf_dir)).persist()
            df = _knn_from(n).localCheckpoint(eager=True)
            n.unpersist()
        _SF_EXACT_KNN[key] = df
    return df


@register(
    "knn_cosine_topk",
    _KNN_ORACLE,
    doc=f"brute-force cosine top-{TOP_K} for {N_QUERIES} probe vectors (ANN exactness baseline)",
)
def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _exact_knn_shared(spark, sf_dir)


def _knn_from(n: DataFrame) -> DataFrame:
    """Brute-force top-k over an already-normalized (persisted) corpus —
    the body of the shared `knn:exact` ground-truth build (consumed by
    q_knn and both ann_recall evals).

    Two-phase top-k: a single window over query_id alone has only
    N_QUERIES partitions, so at scale the whole corpus sorts in 5
    tasks while the other cores idle (measured: the d3 re-measure
    read exp 1.28 on what is linear work).  Phase 1 takes the per-
    (query, input-partition) top-k — same shuffle VOLUME as the
    single-window form (24B rows either way) but the sort fans out
    over nparts * N_QUERIES keys instead of N_QUERIES; any global
    top-k row is necessarily in its partition's local top-k.  Phase 2
    re-ranks the <= N_QUERIES * parts * K survivors — a bounded grid.
    Same round-6 cosine, same (cosine DESC, neighbor_id) tie-break:
    results are identical to the single-window form."""
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("nemb").alias("q_emb")
    )
    # probe set is tiny -> broadcast; corpus never shuffles
    sims = n.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_dot(F.col("q_emb"), F.col("nemb")), 6).alias("cosine"),
    )
    order = (F.col("cosine").desc(), F.col("neighbor_id"))
    wpart = Window.partitionBy(
        "query_id", F.spark_partition_id()
    ).orderBy(*order)
    cands = (
        sims.withColumn("rn", F.row_number().over(wpart))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )


# Exactness-baseline sample bound: the all-pairs formulation exists
# ONLY to anchor the banded twin's oracle, so as a *registered* query
# it runs over a fixed deterministic id-prefix sample — O(CAP^2) work
# is a CONSTANT at any corpus scale, never a quadratic term.  Inert at
# sf<=0.01 (every id < CAP), so the anchor semantics are unchanged
# where the lossless-twin equality is pinned (test_scale_dedup.py runs
# uncapped twins against this at sf0.001).  Full-corpus exactness
# remains covered by that pytest anchor.  ONE constant shared with the
# simhash baseline (dedup.py) — the two samples stay comparable.
from huracan_spark.queries.dedup import EXACT_BASELINE_CAP  # noqa: E402

_NEAR_ORACLE = f"""
WITH n AS ({_NORMALIZED_SQL}),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_dot_sql('a.nemb', 'b.nemb')}, 6) AS cosine
  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE a.vec_id < {EXACT_BASELINE_CAP} AND b.vec_id < {EXACT_BASELINE_CAP}
)
SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= {NEAR_DUP_COS}
"""


@register(
    "embedding_near_dups",
    _NEAR_ORACLE,
    doc="embedding-cosine near-dup pairs within label blocks (pre-normalized, "
    f"single fold per pair) — exactness baseline over the deterministic "
    f"id-prefix sample vec_id < {EXACT_BASELINE_CAP} (bounded constant work "
    "at any scale); the scale path is embedding_lsh_near_dups",
)
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: the self-join reads the normalized corpus on BOTH sides;
    # materializing it once halves the normalization work (measured
    # ~40% faster at sf0.1). Corpus-sized cache — the standard trade
    # for similarity workloads; at 100 TB this is the precomputed
    # normalized-embedding column of the silver table instead.
    n = _normalized(
        _emb(spark, sf_dir).filter(F.col("vec_id") < EXACT_BASELINE_CAP)
    ).persist()
    a = n.alias("a")
    b = n.alias("b")
    cos = F.round(_dot(F.col("a.nemb"), F.col("b.nemb")), 6)
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
# Random-hyperplane LSH.  Plane components are +-1 drawn from
# md5(f"pl:{p}:{dim}") — computed ONCE at plan-build time (hashlib)
# and inlined as literals into both the Spark plan and the oracle SQL,
# so the per-row work is 12 pure arithmetic folds: no hashing, no
# explode, no shuffle.


def _plane(p: int) -> list[float]:
    return [
        1.0 if int(hashlib.md5(f"pl:{p}:{d}".encode()).hexdigest()[:15], 16) & 1 else -1.0
        for d in range(DIM)
    ]


_PLANES = [_plane(p) for p in range(N_HYPERPLANES)]


def _signature_spark(e: DataFrame) -> DataFrame:
    """(vec_id, sig): bit p set iff dot(v, plane_p) > 0.  Shuffle-free."""
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    out = e.withColumn("_d", dbl)
    sig = None
    for p, plane in enumerate(_PLANES):
        plane_lit = F.array(*[F.lit(v) for v in plane])
        proj = F.aggregate(
            F.zip_with(F.col("_d"), plane_lit, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig + bit
    return out.select("vec_id", sig.alias("sig"))


def _signature_sql() -> str:
    terms = []
    for p, plane in enumerate(_PLANES):
        plane_lit = "[" + ", ".join(str(v) for v in plane) + "]"
        proj = (
            f"list_reduce(list_transform(generate_series(1, {DIM}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({plane_lit})[i]), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN CAST({2**p} AS BIGINT) ELSE 0 END)")
    return f"SELECT vec_id, {' + '.join(terms)} AS sig FROM embeddings"


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


# -- IVF-style ANN (the second scale path beside hyperplane LSH) ------------
#
# Inverted-file ANN with deterministic "centroids": the first K corpus
# vectors act as coarse quantizer cells (a real deployment would run
# k-means once offline and broadcast the centroid table — the query
# shape is identical).  Every vector is assigned to its nearest
# centroid by exact cosine; searches then probe only the closest
# cell(s) instead of the whole corpus.  The assignment below IS the
# index build: one broadcast join of K rows against the corpus — no
# shuffle of the corpus itself, linear in |corpus| x K.

N_CENTROIDS = 8

_IVF_ORACLE = f"""
WITH n AS ({_NORMALIZED_SQL}),
cents AS (SELECT vec_id AS centroid_id, nemb AS cemb FROM n
          WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT v.vec_id, c.centroid_id,
         round({_dot_sql('v.nemb', 'c.cemb')}, 6) AS cosine,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY round({_dot_sql('v.nemb', 'c.cemb')}, 6) DESC,
                                     c.centroid_id) AS rn
  FROM n v CROSS JOIN cents c
)
SELECT centroid_id, count(*) AS n_vectors,
       round(min(cosine), 6) AS min_cos, round(max(cosine), 6) AS max_cos
FROM scored WHERE rn = 1
GROUP BY centroid_id
"""


@register(
    "ivf_ann_assign",
    _IVF_ORACLE,
    doc=f"IVF-style ANN coarse quantization: nearest-of-{N_CENTROIDS}-centroids "
    "assignment (broadcast join, corpus never shuffles)",
)
def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: centroid side + corpus side both derive from n
    n = _normalized(_emb(spark, sf_dir)).persist()
    cents = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("nemb").alias("cemb")
    )
    scored = n.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        F.round(_dot(F.col("nemb"), F.col("cemb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("centroid_id")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.min("cosine"), 6).alias("min_cos"),
            F.round(F.max("cosine"), 6).alias("max_cos"),
        )
    )


# -- LSH-bucketed near-dup PAIRS (the scale pair generator) ------------------
#
# embedding_near_dups above is the exactness baseline: all-pairs within
# label blocks, quadratic per block.  This is the pair generator that
# survives 100 TB: candidates are pairs whose hyperplane signatures
# agree on a BAND (the 12 planes split into N_SIG_BANDS = 2 bands of
# 6) up to PROBE_HAMMING bit flips — multi-probe LSH (Lv et al.,
# VLDB'07): the probe side of the join is exploded to its band
# signature plus every Hamming-1 neighbor, the build side keeps the
# exact signature, so "within 1 flip" is still a PLAIN EQUI-JOIN on
# (band, sig) that a hash partitioner plans and AQE skew-splits —
# never a nested-loop hamming predicate, never the doc-pair cross
# product.  Cosine is then verified exactly on the candidates.
#
# Banding trades recall for linearity; multi-probe buys recall back
# (band-agreement probability p^w -> p^w + w*p^(w-1)*(1-p)) for a
# constant (w+1)-way probe fan-out.  At production scale the knobs
# are plane count (bucket granularity grows 2^w with corpus size) and
# probe radius.  The oracle runs the SAME multi-probe formulation
# (hamming(band_sig) <= PROBE_HAMMING) so the contract is bit-exact,
# and the recall-vs-baseline gap is measured in tests, not hidden.

N_SIG_BANDS = 2
PLANES_PER_BAND = N_HYPERPLANES // N_SIG_BANDS
_BAND_MASK = (1 << PLANES_PER_BAND) - 1
PROBE_HAMMING = 1


def _banded_vectors(
    e: DataFrame,
    n_bands: int = N_SIG_BANDS,
    planes_per_band: int = PLANES_PER_BAND,
) -> DataFrame:
    """(vec_id, nemb, band, bsig): normalized vector exploded to one
    row per signature band.  One projection, shuffle-free.

    ``planes_per_band`` is THE production scale knob: expected bucket
    occupancy is n / 2^w per band, so candidate volume stays linear
    when w grows with log2(corpus).  Wider bands trade recall at LOW
    similarity thresholds (band-agreement p^w with p = 1 - theta/pi)
    — for dup-grade thresholds (cos >= ~0.8, p >= ~0.8) selectivity
    and recall coexist; the registered fixture config (2x6, probe 1)
    matches the synthetic corpus's low 0.35 threshold.  Measured in
    tests/test_scale_dedup.py::test_lsh_band_width_is_the_scale_knob.

    Capacity: all bands pack into ONE signed 64-bit sig, so
    n_bands * planes_per_band <= 62 (bit 62 is the last safe plane;
    bit 63 is the sign).  62 bits is 31-bit bands x 2 — occupancy
    n/2^31, enough for ~10^11-vector corpora at dup-grade thresholds;
    beyond that, split signatures across multiple sig columns."""
    total_planes = n_bands * planes_per_band
    if total_planes > 62:
        raise ValueError(
            f"n_bands*planes_per_band = {total_planes} exceeds the 62 "
            "usable bits of the packed long signature; use multiple "
            "sig columns beyond 62 planes"
        )
    planes = [_plane(p) for p in range(total_planes)]
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e = e.withColumn("_d", dbl)
    nrm = F.sqrt(_dot(F.col("_d"), F.col("_d")))
    sig = None
    for p, plane in enumerate(planes):
        plane_lit = F.array(*[F.lit(v) for v in plane])
        proj = F.aggregate(
            F.zip_with(F.col("_d"), plane_lit, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    withsig = e.select(
        "vec_id",
        F.transform(F.col("_d"), lambda x: x / nrm).alias("nemb"),
        sig.alias("sig"),
    )
    band_mask = (1 << planes_per_band) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("sig"), b * planes_per_band)
                .bitwiseAND(F.lit(band_mask))
                .alias("bsig"),
            )
            for b in range(n_bands)
        ]
    )
    return withsig.select(
        "vec_id", "nemb", F.explode(bands).alias("_b")
    ).select("vec_id", "nemb", F.col("_b.band").alias("band"), F.col("_b.bsig").alias("bsig"))


def _lsh_candidates_from(
    bv: DataFrame, planes_per_band: int, probe_hamming: int
) -> DataFrame:
    """(vec_a, vec_b) candidates from a (possibly persisted) banded
    table: ids-only equi-join on (band, probe sig), distinct'd before
    any verification math."""
    probe_sigs = [F.col("bsig")]
    if probe_hamming >= 1:
        probe_sigs += [
            F.col("bsig").bitwiseXOR(F.lit(1 << j))
            for j in range(planes_per_band)
        ]
    probes = bv.select(
        "vec_id", "band", F.explode(F.array(*probe_sigs)).alias("pbsig")
    )
    build = bv.select(
        F.col("vec_id").alias("vec_b"), "band", F.col("bsig").alias("pbsig")
    )
    return (
        probes.join(build, ["band", "pbsig"])
        .filter(F.col("vec_id") < F.col("vec_b"))
        .select(F.col("vec_id").alias("vec_a"), "vec_b")
        .distinct()
    )


def lsh_candidate_pairs(
    e: DataFrame,
    n_bands: int = N_SIG_BANDS,
    planes_per_band: int = PLANES_PER_BAND,
    probe_hamming: int = PROBE_HAMMING,
) -> DataFrame:
    """(vec_a, vec_b) multi-probe LSH candidates at an arbitrary band
    configuration — the parameterized generator behind
    q_embedding_lsh_near_dups, exposed so deployments can scale
    ``planes_per_band`` with corpus size."""
    return _lsh_candidates_from(
        _banded_vectors(e, n_bands, planes_per_band),
        planes_per_band,
        probe_hamming,
    )


_LSH_PAIRS_ORACLE = f"""
WITH sigs AS ({_signature_sql()}),
n AS ({_NORMALIZED_SQL}),
bands AS (
  {" UNION ALL ".join(
      f"SELECT vec_id, {b} AS band, (sig >> {b * PLANES_PER_BAND}) & {_BAND_MASK} AS bsig FROM sigs"
      for b in range(N_SIG_BANDS)
  )}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.vec_id < b.vec_id
   AND bit_count(xor(a.bsig, b.bsig)) <= {PROBE_HAMMING}
)
SELECT vec_a, vec_b, round({_dot_sql('na.nemb', 'nb.nemb')}, 6) AS cosine
FROM cand
JOIN n na ON na.vec_id = vec_a
JOIN n nb ON nb.vec_id = vec_b
WHERE round({_dot_sql('na.nemb', 'nb.nemb')}, 6) >= {NEAR_DUP_COS}
"""


@register(
    "embedding_lsh_near_dups",
    _LSH_PAIRS_ORACLE,
    doc=f"embedding near-dup pairs via multi-probe hyperplane LSH ({N_SIG_BANDS} "
    f"bands x {PLANES_PER_BAND} planes, probe radius {PROBE_HAMMING}) — the "
    "100 TB pair generator; candidates only ever equi-join on (band, sig) "
    "probe keys",
)
def q_embedding_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Candidate generation is IDS-ONLY: the (band, sig) equi-join
    # carries no vectors, so the cosine fold never runs inside a join
    # condition, and a pair that meets through several probe keys is
    # DISTINCT'd *before* verification — one fold per unique pair, in
    # a post-shuffle stage that parallelizes across the cluster.  The
    # 10x scale rehearsal caught the previous shape (fold in the join
    # condition, distinct after): every probe collision re-evaluated
    # the 64-term fold inside one map task — 81x at 10x data.
    bv = _banded_vectors(_emb(spark, sf_dir)).persist()
    # multi-probe: exact signature + every Hamming-1 flip stays an
    # equi-join key; one-sided probing covers both orientations
    # (hamming(A,B)=1 means exactly one flip of A equals B).  The
    # distinct inside introduces the shuffle that runs verification
    # cluster-wide.
    cand = _lsh_candidates_from(bv, PLANES_PER_BAND, PROBE_HAMMING)
    n = bv.select("vec_id", "nemb").dropDuplicates(["vec_id"])
    na, nb = n.alias("na"), n.alias("nb")
    cos = F.round(_dot(F.col("na.nemb"), F.col("nb.nemb")), 6)
    return (
        cand.join(na, cand.vec_a == F.col("na.vec_id"))
        .join(nb, cand.vec_b == F.col("nb.vec_id"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COS)
    )


# -- IVF training: one Lloyd iteration (oracle-checked) ----------------------
#
# operators/kmeans.py is the offline trainer behind ivf_ann_assign's
# "k-means once offline" stance.  Iterative training is not
# SQL-expressible, so the driver-checkable contract is ONE spherical
# Lloyd step from the deterministic init: assign-to-nearest (broadcast
# K centroids, corpus linear, argmax via partial-agg max_by — no
# corpus shuffle), then per-centroid mean stats.  Mean vectors are
# arrays, which the driver's canonicalizer can't hash, so the query
# emits the scalar invariants instead: cell size, mean norm, and the
# drift cosine between old and new centroid.

_TRAIN_ORACLE = f"""
WITH n AS ({_NORMALIZED_SQL}),
cents AS (SELECT vec_id AS centroid_id, nemb AS cemb FROM n
          WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT v.vec_id, v.nemb, c.centroid_id,
         round({_dot_sql('v.nemb', 'c.cemb')}, 6) AS cosine
  FROM n v CROSS JOIN cents c
),
assigned AS MATERIALIZED (
  SELECT vec_id, nemb, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cosine DESC, centroid_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
dims AS (SELECT unnest(generate_series(1, {DIM})) AS dim),
mean_comp AS (
  SELECT a.centroid_id, d.dim, avg(a.nemb[d.dim]) AS m
  FROM assigned a CROSS JOIN dims d
  GROUP BY a.centroid_id, d.dim
),
stats AS (
  SELECT m.centroid_id,
         sum(m.m * m.m) AS norm2,
         sum(m.m * c.cemb[m.dim]) AS dot_old
  FROM mean_comp m JOIN cents c ON c.centroid_id = m.centroid_id
  GROUP BY m.centroid_id
),
counts AS (SELECT centroid_id, count(*) AS n_assigned FROM assigned
           GROUP BY centroid_id)
SELECT s.centroid_id, ct.n_assigned,
       round(sqrt(s.norm2), 6) AS mean_norm,
       round(s.dot_old / sqrt(s.norm2), 6) AS drift_cos
FROM stats s JOIN counts ct ON ct.centroid_id = s.centroid_id
"""


@register(
    "ivf_train_step",
    _TRAIN_ORACLE,
    doc=f"one spherical Lloyd step over {N_CENTROIDS} deterministic init "
    "centroids: partial-agg max_by assignment (no corpus shuffle), "
    "per-centroid mean norm + drift cosine",
)
def q_ivf_train_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb").persist()
    cents = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("long").alias("centroid_id"),
        F.col("nemb").alias("cemb"),
    )
    scored = n.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "nemb",
        "centroid_id",
        F.round(_dot(F.col("nemb"), F.col("cemb")), 6).alias("cosine"),
    )
    assigned = scored.groupBy("vec_id").agg(
        F.max_by(
            "centroid_id",
            F.struct(F.col("cosine"), (-F.col("centroid_id")).cast("long")),
        ).alias("centroid_id"),
        F.first("nemb").alias("nemb"),
    )
    # dim index is 1-based in the oracle; posexplode is 0-based
    mean_comp = (
        assigned.select("centroid_id", F.posexplode("nemb").alias("pos", "v"))
        .groupBy("centroid_id", "pos")
        .agg(F.avg("v").alias("m"))
    )
    cent_comp = cents.select(
        "centroid_id", F.posexplode("cemb").alias("pos", "cv")
    )
    stats = (
        mean_comp.join(cent_comp, ["centroid_id", "pos"])
        .groupBy("centroid_id")
        .agg(
            F.sum(F.col("m") * F.col("m")).alias("norm2"),
            F.sum(F.col("m") * F.col("cv")).alias("dot_old"),
        )
    )
    counts = assigned.groupBy("centroid_id").agg(F.count("*").alias("n_assigned"))
    return stats.join(counts, "centroid_id").select(
        "centroid_id",
        "n_assigned",
        F.round(F.sqrt("norm2"), 6).alias("mean_norm"),
        F.round(F.col("dot_old") / F.sqrt("norm2"), 6).alias("drift_cos"),
    )


# -- IVF search: probe-limited top-k (the IVF query path) --------------------
#
# Completes the IVF story (assign -> train -> SEARCH): each probe
# vector scores only the corpus inside its NPROBE closest cells
# instead of the whole corpus.  Plan shape at 100 TB: the K-row
# centroid table broadcasts twice (cell assignment of the corpus, cell
# choice of the probes); the only corpus-sized operation is one
# equi-join on centroid_id between the (tiny) probe-cell list and the
# cell-partitioned corpus — a hash join AQE can plan, never a cross
# product.  Recall loss vs brute force is the IVF trade; the oracle
# runs the SAME probe-limited formulation so the contract is exact,
# and the knn_cosine_topk baseline measures the gap.

NPROBE = 2

# search body over CTEs `n` (normalized corpus) and `cents`
# (centroid_id, cemb) — shared verbatim by the deterministic-init and
# the trained-centroid search oracles, so the two contracts differ
# ONLY in how cents is derived.
_IVF_SEARCH_BODY = f"""corpus_cells AS (
  SELECT vec_id, nemb, centroid_id FROM (
    SELECT v.vec_id, v.nemb, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round({_dot_sql('v.nemb', 'c.cemb')}, 6) DESC,
                                       c.centroid_id) AS rn
    FROM n v CROSS JOIN cents c
  ) WHERE rn = 1
),
probe_cells AS (
  SELECT vec_id AS query_id, centroid_id FROM (
    SELECT q.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round({_dot_sql('q.nemb', 'c.cemb')}, 6) DESC,
                                       c.centroid_id) AS rn
    FROM n q CROSS JOIN cents c WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {NPROBE}
),
scored AS (
  SELECT p.query_id, cc.vec_id AS neighbor_id,
         round({_dot_sql('q.nemb', 'cc.nemb')}, 6) AS cosine
  FROM probe_cells p
  JOIN corpus_cells cc ON cc.centroid_id = p.centroid_id
  JOIN n q ON q.vec_id = p.query_id
  WHERE cc.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {TOP_K}
"""

_IVF_SEARCH_ORACLE = f"""
WITH n AS ({_NORMALIZED_SQL}),
cents AS (SELECT vec_id AS centroid_id, nemb AS cemb FROM n
          WHERE vec_id < {N_CENTROIDS}),
{_IVF_SEARCH_BODY}
"""


@register(
    "ivf_search",
    _IVF_SEARCH_ORACLE,
    doc=f"IVF probe-limited top-{TOP_K}: each probe scores only its {NPROBE} "
    f"closest of {N_CENTROIDS} cells — centroids broadcast, corpus joined "
    "once on centroid_id, never cross-joined",
)
def q_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb").persist()
    return _ivf_search_from(n)


def _ivf_search_from(n: DataFrame) -> DataFrame:
    """IVF probe-limited search over an already-normalized (persisted)
    corpus projection — shared with q_ann_recall_eval."""
    cents = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("long").alias("centroid_id"),
        F.col("nemb").alias("cemb"),
    )
    return _ivf_search_with(n, cents)


def _ivf_search_with(n: DataFrame, cents: DataFrame) -> DataFrame:
    """Probe-limited search against an arbitrary (centroid_id, cemb)
    table — the deterministic-init and trained-centroid entry points
    share this plan; cents is always broadcast-sized (K rows)."""
    cos_c = F.round(_dot(F.col("nemb"), F.col("cemb")), 6)
    scored_cells = n.crossJoin(F.broadcast(cents)).select(
        "vec_id", "nemb", "centroid_id", cos_c.alias("_ccos")
    )
    # corpus assignment: partial-agg max_by, NOT a window — a window
    # would shuffle the corpus x K rows by vec_id; max_by combines
    # map-side so nothing corpus-sized crosses an exchange.  Tie-break
    # (max cosine, then min centroid_id) matches the oracle's
    # row_number ordering.
    corpus_cells = scored_cells.groupBy("vec_id").agg(
        F.max_by(
            "centroid_id",
            F.struct(F.col("_ccos"), (-F.col("centroid_id")).cast("long")),
        ).alias("centroid_id"),
        F.first("nemb").alias("nemb"),
    )
    # probe side is N_QUERIES x K rows — a window here is free, and
    # top-NPROBE needs ranked rows, not an argmax
    w_probe = Window.partitionBy("vec_id").orderBy(
        F.col("_ccos").desc(), F.col("centroid_id")
    )
    probe_cells = (
        scored_cells.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("nemb").alias("qemb"),
            "centroid_id",
        )
    )
    pair_cos = F.round(_dot(F.col("qemb"), F.col("nemb")), 6)
    w_q = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        probe_cells.join(corpus_cells, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            pair_cos.alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )


# -- ANN recall evaluation: IVF vs exact ------------------------------------
#
# The operator that makes an ANN index trustworthy at scale: measure
# recall@k of the probe-limited IVF path against the brute-force
# baseline, per probe vector.  At 100 TB you run this on a sampled
# probe set to pick NPROBE/K trade-offs before committing the full
# search; both inputs are the already-registered queries, so the plan
# is their union plus one tiny (N_QUERIES x TOP_K)-row join.

_RECALL_ORACLE = f"""
WITH exact AS ({_KNN_ORACLE}),
approx AS ({_IVF_SEARCH_ORACLE})
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
    "ann_recall_eval",
    _RECALL_ORACLE,
    doc=f"recall@{TOP_K} of the IVF probe-limited search vs the exact "
    "brute-force top-k, per probe vector — the index-quality gauge",
)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact leg reads the shared ground-truth panel (knn:exact group);
    # the persisted corpus projection feeds only the IVF leg now, so it
    # narrows to (vec_id, nemb) — label never reaches the cache
    n = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb").persist()
    n.count()  # eager: lazy persist under broadcast races re-runs the pass
    exact = _exact_knn_shared(spark, sf_dir).select("query_id", "neighbor_id")
    approx = _ivf_search_from(n).select(
        "query_id", "neighbor_id", F.lit(1).alias("_hit")
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("k"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
            F.round(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count("*"), 6
            ).alias("recall_at_k"),
        )
    )


# -- trained-centroid IVF search (kmeans_train promoted into the path) ------
#
# operators/kmeans.py::kmeans_train is the offline coarse quantizer;
# this registers the search AGAINST trained centroids as a fully
# hash-checked contract.  Iterative training is usually "not
# SQL-expressible", but for a FIXED iteration count it is: the oracle
# unrolls exactly TRAIN_ITERS spherical Lloyd steps as generated CTEs
# that replay operators/kmeans.py::lloyd_step bit-for-bit (assignment
# cosine rounded at 6, mean components pinned at round(9), sequential
# renormalization fold, empty cells keep the previous centroid).  The
# driver therefore checks the TRAINER's numerics, not just the search.

TRAIN_ITERS = 2


def _lloyd_sql(prev: str, out: str) -> str:
    """One spherical Lloyd step as DuckDB CTEs:
    {prev}(centroid_id, cemb) -> {out}(centroid_id, cemb).
    Requires CTEs `n` (normalized corpus) and `dims` (1..DIM)."""
    return f"""{out}_scored AS (
  SELECT v.vec_id, v.nemb, c.centroid_id,
         round({_dot_sql('v.nemb', 'c.cemb')}, 6) AS cosine
  FROM n v CROSS JOIN {prev} c
),
{out}_assigned AS (
  SELECT vec_id, nemb, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cosine DESC, centroid_id) AS rn
    FROM {out}_scored
  ) WHERE rn = 1
),
{out}_mean AS (
  SELECT a.centroid_id, d.dim, round(avg(a.nemb[d.dim]), 9) AS m
  FROM {out}_assigned a CROSS JOIN dims d
  GROUP BY a.centroid_id, d.dim
),
{out}_vec AS (
  SELECT centroid_id, list(m ORDER BY dim) AS mean
  FROM {out}_mean GROUP BY centroid_id
),
{out} AS (
  SELECT p.centroid_id,
         CASE WHEN v.centroid_id IS NULL THEN p.cemb
              ELSE list_transform(v.mean,
                     x -> x / sqrt({_dot_sql('v.mean', 'v.mean')}))
         END AS cemb
  FROM {prev} p LEFT JOIN {out}_vec v ON v.centroid_id = p.centroid_id
)"""


_TRAINED_CENTS_CTES = f"""dims AS (SELECT unnest(generate_series(1, {DIM})) AS dim),
cents0 AS (SELECT vec_id AS centroid_id, nemb AS cemb FROM n
           WHERE vec_id < {N_CENTROIDS}),
{_lloyd_sql('cents0', 'cents1')},
{_lloyd_sql('cents1', 'cents2')},
cents AS (SELECT centroid_id, cemb FROM cents2)"""

_IVF_SEARCH_TRAINED_ORACLE = f"""
WITH n AS ({_NORMALIZED_SQL}),
{_TRAINED_CENTS_CTES},
{_IVF_SEARCH_BODY}
"""


def _trained_cents(n: DataFrame) -> DataFrame:
    from huracan_spark.operators.kmeans import kmeans_train

    # tol=0.0 forces exactly TRAIN_ITERS Lloyd steps (drift < 0.0 is
    # never true), matching the oracle's fixed unroll depth.
    return kmeans_train(n, N_CENTROIDS, max_iter=TRAIN_ITERS, tol=0.0).select(
        "centroid_id", "cemb"
    )


# The trained coarse quantizer is shared per (applicationId, sf_dir)
# like the semdedup assignment: "run k-means once offline" is the
# operator's own stance, and both trained-IVF consumers
# (ivf_search_trained, ann_recall_trained) probe the SAME K-row
# centroid table a deployment would store.  The one-time training cost
# (TRAIN_ITERS Lloyd passes over the corpus) is charged to the
# `ivf:train` GROUP via matcost, so bench numbers don't blame
# whichever consumer runs first.
_SF_TRAINED: dict[tuple[str, str], DataFrame] = {}


def _trained_cents_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.queries.matcost import charged_build

    key = (spark.sparkContext.applicationId, sf_dir)
    df = _SF_TRAINED.get(key)
    if df is None:
        with charged_build("ivf:train"):
            n = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb")
            # K-row result: eager localCheckpoint survives bench's
            # clearCache hygiene (RDD blocks) and truncates the
            # iteration-nested lineage
            df = _trained_cents(n).localCheckpoint(eager=True)
        _SF_TRAINED[key] = df
    return df


@register(
    "ivf_search_trained",
    _IVF_SEARCH_TRAINED_ORACLE,
    doc=f"IVF probe-limited top-{TOP_K} against {TRAIN_ITERS}-step-trained "
    f"spherical k-means centroids (operators/kmeans.py); the oracle unrolls "
    "the same Lloyd steps as CTEs so the trainer's numerics are hash-checked",
)
def q_ivf_search_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb").persist()
    n.count()  # eager: lazy persist under broadcast races re-runs the pass
    return _ivf_search_with(n, _trained_cents_shared(spark, sf_dir))


_RECALL_TRAINED_ORACLE = f"""
WITH exact AS ({_KNN_ORACLE}),
approx AS ({_IVF_SEARCH_TRAINED_ORACLE})
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
    "ann_recall_trained",
    _RECALL_TRAINED_ORACLE,
    doc=f"recall@{TOP_K} of the TRAINED-centroid IVF search vs brute force — "
    "read alongside ann_recall_eval to measure what training buys over the "
    "deterministic init",
)
def q_ann_recall_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact leg from the shared knn:exact panel; cache narrowed to the
    # (vec_id, nemb) projection the trained-IVF leg needs
    n = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb").persist()
    n.count()  # eager: lazy persist under broadcast races re-runs the pass
    exact = _exact_knn_shared(spark, sf_dir).select("query_id", "neighbor_id")
    approx = _ivf_search_with(n, _trained_cents_shared(spark, sf_dir)).select(
        "query_id", "neighbor_id", F.lit(1).alias("_hit")
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("k"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
            F.round(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count("*"), 6
            ).alias("recall_at_k"),
        )
    )


# -- cross-modal cohesion report --------------------------------------------
#
# The documents<->embeddings join is the multimodal alignment step of
# a training pipeline (text row + its vector live in different
# tables); this reports, per document source, how tight the source's
# embedding cluster is: mean cosine of each member to its source
# centroid.  Low cohesion = mislabeled/mixed sources — the data-audit
# query you run before trusting source-level mixture weights.
#
# Scale shape: the join is a plain equi-join on the id; centroids are
# per-source K x dim aggregates (partial map-side, like the k-means
# mean step); members then join the broadcast centroid table.

_COHESION_ORACLE = f"""
WITH n AS ({_NORMALIZED_SQL}),
j AS (
  SELECT d.source, n.vec_id, n.nemb
  FROM documents d JOIN n ON n.vec_id = d.doc_id
),
comp AS (
  SELECT source, dim.d AS pos, round(avg(nemb[dim.d]), 9) AS m
  FROM j CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS d) dim
  GROUP BY source, dim.d
),
cent AS (
  SELECT source, list(m ORDER BY pos) AS mean FROM comp GROUP BY source
),
ncent AS (
  SELECT source,
         list_transform(mean, x -> x / sqrt({_dot_sql('mean', 'mean')}))
           AS cemb
  FROM cent
)
SELECT j.source,
       count(*) AS n_members,
       round(avg(round({_dot_sql('j.nemb', 'c.cemb')}, 6)), 6) AS cohesion
FROM j JOIN ncent c ON c.source = j.source
GROUP BY j.source
"""


@register(
    "source_embedding_cohesion",
    _COHESION_ORACLE,
    doc="cross-modal audit: per document source, mean cosine of member "
    "embeddings to the source centroid — the documents<->embeddings "
    "alignment join plus a k-means-style centroid aggregate",
)
def q_source_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    n = _normalized(_emb(spark, sf_dir)).select("vec_id", "nemb")
    j = docs.join(n, docs.doc_id == n.vec_id).select("source", "nemb").persist()
    # eager: j feeds the broadcast centroid build AND the cohesion
    # scan — lazy fill would let the broadcast thread re-run the
    # alignment join (r7 class)
    j.count()
    comp = (
        j.select("source", F.posexplode("nemb").alias("pos", "v"))
        .groupBy("source", "pos")
        .agg(F.round(F.avg("v"), 9).alias("m"))
    )
    cent = comp.groupBy("source").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("mean")
    )
    nrm = F.sqrt(_dot(F.col("mean"), F.col("mean")))
    ncent = cent.select(
        "source", F.transform("mean", lambda x: x / nrm).alias("cemb")
    )
    return (
        j.join(F.broadcast(ncent), "source")
        .select("source", F.round(_dot(F.col("nemb"), F.col("cemb")), 6).alias("_c"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg("_c"), 6).alias("cohesion"),
        )
    )


# -- SemDeDup: cluster-bounded semantic deduplication ------------------------
#
# Semantic dedup per Abbas et al. 2023 ("SemDeDup"): coarse-cluster the
# embedding space, then find near-duplicate pairs ONLY within clusters
# and keep one representative per duplicate relation.  The cluster
# assignment is the same broadcast nearest-of-K-centroids join as the
# IVF index build (corpus never shuffles for the assignment); the
# quadratic pair scan is bounded by the largest CLUSTER, not the
# corpus — at 100 TB the knob is K (cluster count grows with corpus so
# per-cluster blocks stay shuffle-partition-sized, same argument as
# the LSH banding). Keep policy: a vector is dropped iff a LOWER-id
# vector in its cluster is within SEMDEDUP_COS — deterministic, one
# anti-join, no iterative closure needed (contrast dedup_clusters,
# which pays connected components for the transitive variant).

SEMDEDUP_COS = 0.35

# Cluster count SCALES WITH THE CORPUS (K = N / SEMDEDUP_CELL, floored
# at the IVF default) so the average cell stays ~SEMDEDUP_CELL vectors
# and the within-cell quadratic stays a bounded constant per cell —
# total pair work is N x CELL/2, linear in the corpus.  A fixed K was
# the round-8 rehearsal's measured scale bug: cells grow 10x per
# decade, pair work 100x (decade-1 exponent 1.09 and climbing).
#
# The ASSIGNMENT is a FOUR-LEVEL centroid tree (the FAISS/SCaNN
# coarse-quantizer shape, two rungs deeper).  The r8 decade rehearsals
# forced each rung in turn: fixed K read exponent 1.09 at decade 1
# (quadratic pairs), K ~ N with brute assignment read 1.40 at decade 2
# (N x K scan), a two-level sqrt(K) probe read 1.47 at decade 3 (the
# sqrt term), and the depth-3 tree (m1 = icbrt(K/8), m2 = m1^2, K)
# still carried a ~10*(K/8)^(1/3) per-vector term (decade-3 exponents
# 1.19/1.32) because its last hop fanned out 8x the others.  Final
# shape: a depth-4 walk — level sizes r, r^2, r^3, K with r = the
# largest integer with r^4 <= K//8, so the three upper hops expect ~r
# candidates and the LAST hop stays ~8r wide; per-vector cost is
# ~(3 + 8)*(K/8)^(1/4) + self candidates.  The last hop is kept 8x
# wider than the others ON PURPOSE: cell BALANCE is set by how
# accurately the walk resolves the fine level, and the within-cell
# quadratic pays sum(cell^2) — a fully balanced-hop walk (r^4 <= K)
# measured 2.1x the pair work (sumsq 123M vs 58M at 200k vectors)
# and LOST more in the pair stage than it saved in assignment.
# A vector walks nearest-of-r, then nearest among that
# cell's L2 centroids, then that L2 cell's L3 centroids, then that L3
# cell's fine centroids; the tree itself is built with the same
# stacked probe (never a global m_i x m_j scan), so build cost is ~K
# per level.  Level sizes use INTEGER fourth roots (largest r with
# r^4 <= K//8 — the //8 IS the wide last hop) — no float pow whose
# last-ulp could diverge between engines.  The cell DEFINITION is the
# probe-limited argmax itself
# (deterministic on both engines; cells are a partition, not a
# nearest-neighbor truth claim — the published SemDeDup only needs a
# clustering).  At the sf0.1 anchor K=8 (2000//250) so r = 1, which
# collapses every level to the exact brute-nearest semantics the
# suite has always pinned — fixture results and floors are unchanged.
# Each probe stage UNION-adds the walker's current pick as its own
# candidate: guarantees a non-empty candidate set even if round-ties
# strand a cell with no members, and makes the collapse exact.
SEMDEDUP_CELL = 250

# ONE Lloyd refinement pass over the FINE centroids (round-9, the r8
# VERDICT's skew item): raw fine centroids are arbitrary corpus points
# (vec_id < K), and the resulting cell skew was MEASURED to creep with
# K (sumsq/ideal 1.27 -> 1.34 -> 1.53 across sf10/sf100/d4) — skew is
# what the within-cell pair quadratic pays (sum(cell^2)).  The pass:
# a deterministic 1-in-MOD sample (vec_id % MOD = 0 — identical
# predicate on both engines) walks the tree, each fine centroid is
# re-seated at the unit-normalized mean of its sample members
# (round-6 per-dim avg, then round-6 normalized coords, so both
# engines fold to identical doubles; memberless or zero-norm cells
# keep their original coords), and the FULL corpus walks the refined
# fine level — tree structure (l1/l2/l3, parent3 links) unchanged.
# Cost: the sample walk adds ~1/MOD of a corpus walk plus a K-row
# aggregate (map-side partial: K*dim doubles per task), so assignment
# pays ~1.1x for a measured skew reduction; pairs pay sum(cell^2),
# which is where the win lands.
SEMDEDUP_REFINE_MOD = 10


def _semdedup_k_sql(cell: int) -> str:
    """Cluster-count scalar for the oracle walk; parameterized by cell
    size so the active-tree (r >= 2) parity test can run the IDENTICAL
    static walk at a CI-sized corpus (cell=25 -> K=N/25 -> r up to 3
    at a few thousand vectors).  Registered oracles use SEMDEDUP_CELL."""
    return f"(SELECT GREATEST({N_CENTROIDS}, COUNT(*) // {cell}) FROM n)"


def _semdedup_r_sql(cell: int) -> str:
    # largest r in [1, 300] with r^4 <= K//8 (bounds K <= 6.5e10
    # centroids, i.e. N <= 1.6e13 vectors)
    return (
        "(SELECT MAX(i) FROM generate_series(1, 300) t(i) "
        f"WHERE i*i*i*i <= {_semdedup_k_sql(cell)} // 8)"
    )


_SEMDEDUP_K_SQL = _semdedup_k_sql(SEMDEDUP_CELL)
_SEMDEDUP_R_SQL = _semdedup_r_sql(SEMDEDUP_CELL)


def _probe_sql(walkers: str, w_id: str, w_vec: str, w_pick: str,
               cands: str, c_id: str, c_vec: str, c_parent: str,
               out_pick: str) -> str:
    """One tree-probe stage: each walker row (id, vec, current pick)
    considers candidates whose parent == pick, plus its own pick as a
    self-candidate, and keeps the nearest (round-6 cosine, lowest id
    tie-break)."""
    return f"""
  SELECT {w_id}, {w_vec}, {c_id} AS {out_pick} FROM (
    SELECT cd.{w_id}, cd.{w_vec}, cd.{c_id},
           row_number() OVER (PARTITION BY cd.{w_id}
                              ORDER BY round({_dot_sql(f'cd.{w_vec}', f'cd.{c_vec}')}, 6) DESC,
                                       cd.{c_id}) AS rn
    FROM (
      SELECT w.{w_id}, w.{w_vec}, c.{c_id}, c.{c_vec}
      FROM {walkers} w JOIN {cands} c ON c.{c_parent} = w.{w_pick}
      UNION ALL
      SELECT w.{w_id}, w.{w_vec}, c.{c_id}, c.{c_vec}
      FROM {walkers} w JOIN {cands} c ON c.{c_id} = w.{w_pick}
    ) cd
  ) WHERE rn = 1"""


def _argmax_sql(walkers: str, w_id: str, w_vec: str, out_pick: str) -> str:
    """Brute nearest-of-l1 for every walker row — the tree's entry hop
    (same round-6 cosine, lowest-cid tie-break as the probe stages)."""
    return f"""
  SELECT {w_id}, {w_vec}, cid AS {out_pick} FROM (
    SELECT w.{w_id}, w.{w_vec}, c.cid,
           row_number() OVER (PARTITION BY w.{w_id}
                              ORDER BY round({_dot_sql(f'w.{w_vec}', 'c.cemb')}, 6) DESC,
                                       c.cid) AS rn
    FROM {walkers} w CROSS JOIN l1 c
  ) WHERE rn = 1"""


def _semdedup_assigned_sql(cell: int) -> str:
    """The depth-4 static walk + one Lloyd refinement of the fine
    level as oracle CTEs, parameterized by cell size (see
    _semdedup_k_sql).  Byte-for-byte the registered oracle when
    cell == SEMDEDUP_CELL.

    Every walk CTE is AS MATERIALIZED: each probe stage references its
    predecessor TWICE (cell candidates UNION ALL self-candidate), so
    DuckDB's default inlining re-evaluates the chain 2^depth times —
    the r=3 active-tree oracle measured 371 s inlined vs 6.5 s
    materialized (and OOM'd DuckDB next to the 90g Spark JVM).
    Materialization makes the oracle walk linear, exactly like the
    Spark projection pipeline it mirrors."""
    R = _semdedup_r_sql(cell)
    K = _semdedup_k_sql(cell)
    return f"""
l1 AS (SELECT vec_id AS cid, nemb AS cemb FROM n
       WHERE vec_id < {R}),
l2 AS (SELECT vec_id AS fid, nemb AS femb FROM n
       WHERE vec_id < {R} * {R}),
l3 AS (SELECT vec_id AS lid, nemb AS lemb FROM n
       WHERE vec_id < {R} * {R} * {R}),
fine AS (SELECT vec_id AS gid, nemb AS gemb FROM n
         WHERE vec_id < {K}),
p1l2 AS MATERIALIZED ({_argmax_sql('l2', 'fid', 'femb', 'parent')}),
t1 AS MATERIALIZED ({_argmax_sql('l3', 'lid', 'lemb', 'pick')}),
p2l3 AS MATERIALIZED ({_probe_sql('t1', 'lid', 'lemb', 'pick',
                     'p1l2', 'fid', 'femb', 'parent', 'parent2')}),
g1 AS MATERIALIZED ({_argmax_sql('fine', 'gid', 'gemb', 'pick')}),
g2 AS MATERIALIZED ({_probe_sql('g1', 'gid', 'gemb', 'pick',
                   'p1l2', 'fid', 'femb', 'parent', 'pick2')}),
p3fine AS MATERIALIZED ({_probe_sql('g2', 'gid', 'gemb', 'pick2',
                       'p2l3', 'lid', 'lemb', 'parent2', 'parent3')}),
sm AS (SELECT vec_id, nemb FROM n WHERE vec_id % {SEMDEDUP_REFINE_MOD} = 0),
s1 AS MATERIALIZED ({_argmax_sql('sm', 'vec_id', 'nemb', 'pick')}),
s2 AS MATERIALIZED ({_probe_sql('s1', 'vec_id', 'nemb', 'pick',
                   'p1l2', 'fid', 'femb', 'parent', 'pick')}),
s3 AS MATERIALIZED ({_probe_sql('s2', 'vec_id', 'nemb', 'pick',
                   'p2l3', 'lid', 'lemb', 'parent2', 'pick')}),
sasg AS MATERIALIZED ({_probe_sql('s3', 'vec_id', 'nemb', 'pick',
                     'p3fine', 'gid', 'gemb', 'parent3', 'centroid_id')}),
refm AS (
  SELECT centroid_id, ord, round(avg(val), 6) AS m
  FROM (SELECT centroid_id, unnest(nemb) AS val,
               unnest(generate_series(1, len(nemb))) AS ord
        FROM sasg)
  GROUP BY centroid_id, ord
),
refv AS (
  SELECT centroid_id, list(m ORDER BY ord) AS mv FROM refm GROUP BY centroid_id
),
refn AS (
  SELECT centroid_id,
         CASE WHEN sqrt({_dot_sql('mv', 'mv')}) = 0 THEN NULL
              ELSE list_transform(mv, x -> round(x / sqrt({_dot_sql('mv', 'mv')}), 6))
         END AS rvec
  FROM refv
),
refined AS MATERIALIZED (
  SELECT p.gid, COALESCE(r.rvec, p.gemb) AS gemb, p.parent3
  FROM p3fine p LEFT JOIN refn r ON r.centroid_id = p.gid
),
v1 AS MATERIALIZED ({_argmax_sql('n', 'vec_id', 'nemb', 'pick')}),
v2 AS MATERIALIZED ({_probe_sql('v1', 'vec_id', 'nemb', 'pick',
                   'p1l2', 'fid', 'femb', 'parent', 'pick')}),
v3 AS MATERIALIZED ({_probe_sql('v2', 'vec_id', 'nemb', 'pick',
                   'p2l3', 'lid', 'lemb', 'parent2', 'pick')}),
assigned AS MATERIALIZED (
  SELECT vec_id, nemb, centroid_id FROM ({_probe_sql(
      'v3', 'vec_id', 'nemb', 'pick',
      'refined', 'gid', 'gemb', 'parent3', 'centroid_id')})
)"""


_SEMDEDUP_ASSIGNED_SQL = _semdedup_assigned_sql(SEMDEDUP_CELL)

_SEMDEDUP_PAIRS_SQL = f"""
pairs AS (
  SELECT a.centroid_id AS cluster_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_dot_sql('a.nemb', 'b.nemb')}, 6) AS cosine
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
)"""

def _semdedup_pairs_oracle(cell: int = SEMDEDUP_CELL) -> str:
    return f"""
WITH n AS ({_NORMALIZED_SQL}),
{_semdedup_assigned_sql(cell)},
{_SEMDEDUP_PAIRS_SQL}
SELECT cluster_id, vec_a, vec_b, cosine
FROM pairs WHERE cosine >= {SEMDEDUP_COS}
"""


_SEMDEDUP_PAIRS_ORACLE = _semdedup_pairs_oracle()


def _lloyd_refined_vecs(sasg: DataFrame, dim: int) -> DataFrame:
    """(_rid, _rvec): one Lloyd re-seat of the fine centroids from a
    sample assignment — round-6 per-dim mean of the members, unit
    normalization, round-6 coords; NULL _rvec on a zero-norm mean
    (caller coalesces back to the original centroid).  Mirrors the
    oracle's refm/refv/refn CTEs operation-for-operation: round-6
    after the avg makes both engines' fold-order ulps collapse to
    identical doubles, and everything downstream (the left-fold dot,
    sqrt, divide, round) is then bit-identical.  The groupBy is a
    K-row aggregate with map-side partial rows of K*dim doubles —
    never corpus-sized.  The per-dim sums are flat getItem aggregates
    (codegen'd, evaluated once per row — the HOF-substitution blowup
    gotcha applies to projections, not aggregate buffers)."""
    means = sasg.groupBy("centroid_id").agg(
        *[
            F.round(F.avg(F.col("nemb")[i]), 6).alias(f"_m{i}")
            for i in range(dim)
        ]
    )
    withmv = means.select(
        F.col("centroid_id").alias("_rid"),
        F.array(*[F.col(f"_m{i}") for i in range(dim)]).alias("_mv"),
    )
    withn = withmv.select(
        "_rid", "_mv", F.sqrt(_dot(F.col("_mv"), F.col("_mv"))).alias("_nrm")
    )
    return withn.select(
        "_rid",
        F.when(F.col("_nrm") == 0, F.lit(None))
        .otherwise(
            F.transform(F.col("_mv"), lambda x: F.round(x / F.col("_nrm"), 6))
        )
        .alias("_rvec"),
    )


def _semdedup_assigned(n: DataFrame, cell: int = SEMDEDUP_CELL) -> DataFrame:
    """(vec_id, nemb, centroid_id): balanced FOUR-LEVEL centroid-tree
    assignment (see the SEMDEDUP_CELL comment above), computed as a
    SHUFFLE-FREE projection pipeline.

    Each hop's candidate set is pre-grouped into a broadcast ARRAY
    column (per parent cell), the walker row joins it with a broadcast
    hash join (map-side, no exchange), and the argmax is a
    transform + array_max fold over the array — so the whole corpus
    walk (4 hops) fuses into ONE stage: scan -> projections -> output.
    The earlier shape (explode candidates, groupBy(vec_id) max_by)
    shuffled the corpus WITH ITS VECTORS once per hop — 4 corpus-wide
    exchanges plus corpus-sized materializations that measured
    IO-bound at 20M vectors (3 x 10GB checkpoint writes dominated the
    walk).  Per-row arithmetic is identical (same _dot fold, same
    round-6, same (score, -cid) max ordering), so results are
    bit-equal to the exploded shape and to the oracle's static walk.

    The centroid tables are corpus-DERIVED but bounded (r, r^2, r^3,
    K=N/250 rows; grouped-cell arrays total K*dim doubles per level):
    explicitly broadcast, safe through the measured decades (K*dim <<
    budget); past ~1e6 centroids the cell arrays outgrow broadcast and
    the probe joins flip to shuffle-hash equi-joins on the parent key
    (r7 planner-broadcast lesson).  The count() is one cheap scalar
    job over the narrow embedding scan.  At the fixture anchor r = 1,
    so every level collapses to exact brute-nearest-of-K.

    The fine level is Lloyd-refined before the corpus walk (see the
    SEMDEDUP_REFINE_MOD comment): a 1-in-10 sample walks the raw
    tree, a K-row mean aggregate re-seats the fine centroids, and the
    corpus's last hop probes the refined level.  Measured effect:
    cell skew sumsq/ideal 1.27 -> 1.051 at sf10 and 1.34 -> 1.039 at
    sf100 (probe tool), arresting the creep the r8 decades flagged,
    at ~1.1x assignment cost (the sample walk + one K-row shuffle)."""
    cnt = n.count()
    k = max(N_CENTROIDS, cnt // cell)
    # integer fourth root of K//8: matches the oracle's
    # generate_series scan; the fine hop stays ~8r wide (see the
    # SEMDEDUP_CELL comment — balance over assignment speed)
    r = max(i for i in range(1, 301) if i * i * i * i <= k // 8)
    # vector width for the Lloyd per-dim mean aggregate (one-row job
    # over the narrow embedding scan, like the count above)
    dim = n.select(F.size("nemb").alias("_d")).first()["_d"]
    s = n.filter(F.col("vec_id") % SEMDEDUP_REFINE_MOD == 0)

    def _best(vec_col, cands_col):
        """Argmax over an array<struct<cid,cemb>> column: highest
        round-6 cosine, lowest cid on ties — the exact (score, -cid)
        ordering the oracle's row_number uses, order-independent."""
        scored = F.transform(
            cands_col,
            lambda c: F.struct(
                F.round(_dot(vec_col, c["cemb"]), 6).alias("s"),
                (-c["cid"]).cast("long").alias("negc"),
                c["cid"].alias("cid"),
            ),
        )
        return F.array_max(scored)["cid"]

    def _argmax_all(walkers, w_id, w_vec, cents, out) -> DataFrame:
        """Nearest centroid over the WHOLE level: the level is
        collapsed to a single-row broadcast array, the argmax is a
        per-row fold — no explode, no groupBy, no shuffle."""
        carr = cents.agg(
            F.collect_list(F.struct(F.col("cid"), F.col("cemb"))).alias(
                "_cands"
            )
        )
        return walkers.crossJoin(F.broadcast(carr)).select(
            w_id,
            w_vec,
            _best(F.col(w_vec), F.col("_cands")).alias(out),
        )

    def _probe(walkers, w_id, w_vec, cands, c_id, c_vec, c_parent, out):
        """Nearest candidate whose parent == walker's current `pick`,
        with the pick itself appended as a self-candidate (non-empty
        set even if round-ties strand a cell; exact brute collapse at
        r=1 — levels are nested id prefixes, so the pick is always a
        member of the candidate level).  Cells are pre-grouped arrays
        keyed by parent; both joins are broadcast hash joins of
        <= K-row tables — map-side, shuffle-free."""
        cell = cands.groupBy(c_parent).agg(
            F.collect_list(
                F.struct(
                    F.col(c_id).alias("cid"), F.col(c_vec).alias("cemb")
                )
            ).alias("_cell")
        )
        selfrow = cands.select(
            F.col(c_id).alias("_sid"), F.col(c_vec).alias("_svec")
        )
        selfarr = F.array(
            F.struct(
                F.col("_sid").alias("cid"), F.col("_svec").alias("cemb")
            )
        )
        allc = F.when(F.col("_cell").isNull(), selfarr).otherwise(
            F.concat(F.col("_cell"), selfarr)
        )
        return (
            walkers.join(
                F.broadcast(cell), F.col(c_parent) == F.col("pick"), "left"
            )
            .join(F.broadcast(selfrow), F.col("_sid") == F.col("pick"))
            .select(w_id, w_vec, _best(F.col(w_vec), allc).alias(out))
        )

    fine = n.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("gid"), F.col("nemb").alias("gemb")
    )
    if r == 1:
        # degenerate tree (fixture scales, k <= 127): every level
        # collapses to brute-nearest-of-k — run the single argmax
        # directly; output is IDENTICAL to the 4-level walk (which is
        # what the static depth-4 oracle SQL computes), one corpus
        # pass instead of four.  The Lloyd pass degenerates the same
        # way: sample argmax over the raw fine level, re-seat, corpus
        # argmax over the refined level.
        cands0 = fine.select(
            F.col("gid").alias("cid"), F.col("gemb").alias("cemb")
        )
        sasg = _argmax_all(s, "vec_id", "nemb", cands0, "centroid_id")
        ref = _lloyd_refined_vecs(sasg, dim)
        # eager: the refined level feeds the final argmax's broadcast
        # (K rows — tiny), and its lineage carries the sample walk
        refined = (
            fine.join(ref, fine["gid"] == ref["_rid"], "left")
            .select(
                F.col("gid").alias("cid"),
                F.coalesce(F.col("_rvec"), F.col("gemb")).alias("cemb"),
            )
            .localCheckpoint(eager=True)
        )
        return _argmax_all(n, "vec_id", "nemb", refined, "centroid_id").select(
            "vec_id", "nemb", "centroid_id"
        )
    l1 = n.filter(F.col("vec_id") < r).select(
        F.col("vec_id").alias("cid"), F.col("nemb").alias("cemb")
    )
    l2 = n.filter(F.col("vec_id") < r * r).select(
        F.col("vec_id").alias("fid"), F.col("nemb").alias("femb")
    )
    l3 = n.filter(F.col("vec_id") < r * r * r).select(
        F.col("vec_id").alias("lid"), F.col("nemb").alias("lemb")
    )
    # tree build: stacked probes, never a global m_i x m_j scan.
    # CANDIDATE tables get an EAGER localCheckpoint: each one feeds
    # TWO broadcast derivations (grouped cells + self rows), and Spark
    # materializes broadcast exchanges in separate threads — racing on
    # a LAZY parent re-runs whole upstream passes (measured: the lazy
    # build wandered 66-212 s at 200k vectors; eager blocks make it
    # deterministic).  The corpus walk itself is a LINEAR projection
    # chain — each hop feeds exactly the next — so it needs NO
    # materialization at all and fuses into one stage.
    p1l2 = _argmax_all(l2, "fid", "femb", l1, "parent").localCheckpoint(
        eager=True
    )
    t1 = _argmax_all(l3, "lid", "lemb", l1, "pick")
    p2l3 = _probe(
        t1, "lid", "lemb", p1l2, "fid", "femb", "parent", "parent2"
    ).localCheckpoint(eager=True)
    g1 = _argmax_all(fine, "gid", "gemb", l1, "pick")
    g2 = _probe(g1, "gid", "gemb", p1l2, "fid", "femb", "parent", "pick")
    p3fine = _probe(
        g2, "gid", "gemb", p2l3, "lid", "lemb", "parent2", "parent3"
    ).localCheckpoint(eager=True)
    # Lloyd pass: the 1-in-MOD sample walks the raw tree (a linear
    # projection chain like the corpus walk — ~1/MOD of its cost),
    # the K-row mean aggregate re-seats the fine level, and the
    # refined table is eagerly checkpointed (K rows) because _probe
    # derives TWO broadcasts from it (grouped cells + self rows — the
    # lazy-parent broadcast race, see the tree-build comment above)
    s1 = _argmax_all(s, "vec_id", "nemb", l1, "pick")
    s2 = _probe(s1, "vec_id", "nemb", p1l2, "fid", "femb", "parent", "pick")
    s3 = _probe(s2, "vec_id", "nemb", p2l3, "lid", "lemb", "parent2", "pick")
    sasg = _probe(
        s3, "vec_id", "nemb", p3fine, "gid", "gemb", "parent3",
        "centroid_id",
    )
    ref = _lloyd_refined_vecs(sasg, dim)
    refined = (
        p3fine.join(ref, p3fine["gid"] == ref["_rid"], "left")
        .select(
            "gid",
            F.coalesce(F.col("_rvec"), F.col("gemb")).alias("gemb"),
            "parent3",
        )
        .localCheckpoint(eager=True)
    )
    # corpus walk: pure projections + broadcast joins, zero shuffles
    v1 = _argmax_all(n, "vec_id", "nemb", l1, "pick")
    v2 = _probe(v1, "vec_id", "nemb", p1l2, "fid", "femb", "parent", "pick")
    v3 = _probe(v2, "vec_id", "nemb", p2l3, "lid", "lemb", "parent2", "pick")
    assigned = _probe(
        v3, "vec_id", "nemb", refined, "gid", "gemb", "parent3",
        "centroid_id",
    )
    return assigned.select("vec_id", "nemb", "centroid_id")


def _semdedup_pairs_from(assigned: DataFrame) -> DataFrame:
    """Within-cluster pairs >= SEMDEDUP_COS from a persisted
    (vec_id, nemb, centroid_id) assignment: ONE shuffle-hash self-join
    on the cluster id, vectors carried on both sides, the cosine fold
    streaming through the join output.

    Why NOT the LSH shape (ids-only candidates, repartition, join
    vectors back): semdedup candidates are n^2/2 per cell — they
    OUTNUMBER the corpus ~CELL/2-fold, so joining vectors onto the
    pair stream moves |pairs| x 2 x |vec| bytes through SMJ sorts
    (decade-3 rehearsal: 250M pairs x 520B x 2 = a measured 90GB+
    spill abort at sf100).  Shuffling the CORPUS by cluster id instead
    moves |corpus| x |vec| once (~1GB at sf100); the quadratic then
    streams through the join's probe phase, distributed across the
    K ~ N/250 cell keys (thousands of keys >> cores — no single-task
    grind), and the r7 fold-in-join-condition hazard does not apply
    because the join is a SHUFFLE hash join on bounded cells, not a
    planner-estimated broadcast.  shuffle_hash hint: the build side is
    a per-partition slice of the corpus (~|corpus|/shuffle.partitions
    rows), and it also keeps the corpus-derived aggregate out of
    planner broadcast estimation (r7 lesson)."""
    a = assigned.select(
        F.col("centroid_id").alias("cluster_id"),
        F.col("vec_id").alias("vec_a"),
        F.col("nemb").alias("na"),
    )
    b = assigned.select(
        F.col("centroid_id").alias("cluster_id"),
        F.col("vec_id").alias("vec_b"),
        F.col("nemb").alias("nb"),
    )
    return (
        a.hint("shuffle_hash")
        .join(b, "cluster_id")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "cluster_id",
            "vec_a",
            "vec_b",
            F.round(_dot(F.col("na"), F.col("nb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= SEMDEDUP_COS)
    )


# The assignment is shared per (applicationId, sf_dir) like the dedup
# label tables: it is the materialized IVF index, which a real
# deployment stores anyway — pairs and keep both fold over it, and the
# one-time build is charged to the `semdedup:assign` GROUP (matcost)
# so bench numbers don't blame whichever query ran first.
_SF_ASSIGNED: dict[tuple[str, str], DataFrame] = {}


def _semdedup_assigned_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.queries.matcost import charged_build

    key = (spark.sparkContext.applicationId, sf_dir)
    df = _SF_ASSIGNED.get(key)
    if df is None:
        with charged_build("semdedup:assign"):
            n = _normalized(_emb(spark, sf_dir))
            # eager localCheckpoint: survives bench's clearCache
            # hygiene on purpose (shared state is RDD blocks), and the
            # pair self-join reads it on both sides without recompute
            df = _semdedup_assigned(n).localCheckpoint(eager=True)
        _SF_ASSIGNED[key] = df
    return df


def _semdedup_pairs(n: DataFrame) -> DataFrame:
    # non-shared entry (kept for direct callers/tests): persist so the
    # self-join reads the assignment on both sides without recompute
    return _semdedup_pairs_from(_semdedup_assigned(n).persist())


@register(
    "semdedup_pairs",
    _SEMDEDUP_PAIRS_ORACLE,
    doc=f"SemDeDup candidate pairs: within-centroid-cluster cosine >= "
    f"{SEMDEDUP_COS}. Equi-join on cluster id only — the quadratic is "
    "bounded per cluster, never corpus-wide; assignment is the broadcast "
    "IVF build",
)
def q_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _semdedup_pairs_from(_semdedup_assigned_shared(spark, sf_dir))


def _semdedup_keep_oracle(cell: int = SEMDEDUP_CELL) -> str:
    return f"""
WITH n AS ({_NORMALIZED_SQL}),
{_semdedup_assigned_sql(cell)},
{_SEMDEDUP_PAIRS_SQL},
dropped AS (
  SELECT DISTINCT vec_b AS vec_id FROM pairs WHERE cosine >= {SEMDEDUP_COS}
)
SELECT a.centroid_id AS cluster_id,
       count(*) AS n_total,
       count(d.vec_id) AS n_dropped,
       count(*) - count(d.vec_id) AS n_kept
FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
GROUP BY 1
"""


_SEMDEDUP_KEEP_ORACLE = _semdedup_keep_oracle()


@register(
    "semdedup_keep",
    _SEMDEDUP_KEEP_ORACLE,
    doc="SemDeDup keep policy: drop a vector iff a lower-id vector in its "
    "cluster is within the threshold; report per-cluster kept/dropped "
    "counts. One anti-join over the pair table — no transitive closure",
)
def q_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _semdedup_keep_from(_semdedup_assigned_shared(spark, sf_dir))


def _semdedup_keep_from(assigned: DataFrame) -> DataFrame:
    """Keep-policy fold over a persisted assignment — shared by the
    registered query and the active-tree (r >= 2) parity test so both
    run the identical plan."""
    dropped = (
        _semdedup_pairs_from(assigned)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("_drop", F.lit(1))
    )
    return (
        assigned.join(dropped, "vec_id", "left")
        .groupBy(F.col("centroid_id").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_total"),
            F.count("_drop").alias("n_dropped"),
            (F.count("*") - F.count("_drop")).alias("n_kept"),
        )
    )


# -- kNN label-vote classification eval ---------------------------------------

# The standard "is this embedding space any good" probe: majority label
# of the k nearest neighbors vs the query's own label.  Same
# broadcast-probe kNN shape as knn_cosine_topk (corpus never shuffles);
# the vote window is per query over <= k rows.

N_EVAL_QUERIES = 50

_LABEL_VOTE_ORACLE = f"""
WITH n AS ({_NORMALIZED_SQL}),
lab AS (SELECT vec_id, label FROM embeddings),
q AS (SELECT vec_id, nemb FROM n WHERE vec_id < {N_EVAL_QUERIES}),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round({_dot_sql('q.nemb', 'e.nemb')}, 6) AS cosine
  FROM q JOIN n e ON e.vec_id <> q.vec_id
),
topk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rn
    FROM sims
  ) WHERE rn <= {TOP_K}
),
votes AS (
  SELECT t.query_id, l.label, count(*) AS c
  FROM topk t JOIN lab l ON t.neighbor_id = l.vec_id
  GROUP BY 1, 2
),
pred AS (
  SELECT query_id, label AS pred_label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY c DESC, label) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT tl.label AS true_label,
       count(*) AS n_queries,
       count(*) FILTER (WHERE p.pred_label = tl.label) AS n_correct,
       round(CAST(count(*) FILTER (WHERE p.pred_label = tl.label) AS DOUBLE)
             / count(*), 6) AS accuracy
FROM pred p JOIN lab tl ON p.query_id = tl.vec_id
GROUP BY tl.label
"""


@register(
    "knn_label_accuracy",
    _LABEL_VOTE_ORACLE,
    doc=f"kNN label-vote classification eval: majority label of the "
    f"{TOP_K} nearest neighbors vs the query's own label, per label, "
    f"for {N_EVAL_QUERIES} probes — probe side broadcast (corpus never "
    "shuffles), vote window per query over <= k rows",
)
def q_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _normalized(_emb(spark, sf_dir)).persist()
    lab = _emb(spark, sf_dir).select("vec_id", "label")
    q = n.filter(F.col("vec_id") < N_EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("nemb").alias("q_emb")
    )
    sims = n.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_dot(F.col("q_emb"), F.col("nemb")), 6).alias("cosine"),
    )
    # two-phase top-k (the r9 _knn_from fix, applied here too): a
    # window over query_id alone sorts the corpus-sized sims table in
    # N_EVAL_QUERIES tasks; phase 1 ranks per (query, input partition),
    # phase 2 re-ranks the bounded survivors — identical results (any
    # global top-k row is in its partition's local top-k)
    korder = (F.col("cosine").desc(), F.col("neighbor_id"))
    wkp = Window.partitionBy("query_id", F.spark_partition_id()).orderBy(*korder)
    kcands = (
        sims.withColumn("rn", F.row_number().over(wkp))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )
    wk = Window.partitionBy("query_id").orderBy(*korder)
    topk = (
        kcands.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    votes = (
        topk.join(lab, topk.neighbor_id == lab.vec_id)
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("c"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("c").desc(), "label")
    pred = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"))
    )
    correct = F.count(F.when(F.col("pred_label") == F.col("label"), 1))
    return (
        pred.join(lab, pred.query_id == lab.vec_id)
        .groupBy(F.col("label").alias("true_label"))
        .agg(
            F.count("*").alias("n_queries"),
            correct.alias("n_correct"),
            F.round(correct.cast("double") / F.count("*"), 6).alias("accuracy"),
        )
    )


_CENTROID_DRIFT_ORACLE = f"""
WITH e AS (
  SELECT label, vec_id % 2 AS epoch, embedding FROM embeddings
),
comp AS (
  SELECT label, epoch, dim.d AS pos, round(avg(embedding[dim.d]), 9) AS m
  FROM e CROSS JOIN (SELECT unnest(generate_series(1, {DIM})) AS d) dim
  GROUP BY 1, 2, 3
),
paired AS (
  SELECT a.label, a.m AS m0, b.m AS m1
  FROM comp a JOIN comp b ON a.label = b.label AND a.pos = b.pos
  WHERE a.epoch = 0 AND b.epoch = 1
),
agg AS (
  SELECT label,
         round(sqrt(sum((m0 - m1) * (m0 - m1))), 6) AS l2_shift,
         round(sum(m0 * m1)
               / (sqrt(sum(m0 * m0)) * sqrt(sum(m1 * m1))), 6)
           AS centroid_cos
  FROM paired GROUP BY 1
),
counts AS (
  SELECT label,
         CAST(count(*) FILTER (WHERE vec_id % 2 = 0) AS BIGINT) AS n_a,
         CAST(count(*) FILTER (WHERE vec_id % 2 = 1) AS BIGINT) AS n_b
  FROM embeddings GROUP BY 1
)
SELECT c.label, c.n_a, c.n_b, a.l2_shift, a.centroid_cos
FROM counts c JOIN agg a ON a.label = c.label
"""


@register(
    "embedding_centroid_drift",
    _CENTROID_DRIFT_ORACLE,
    doc="embedding-space drift monitor: per label, the centroid SHIFT "
    "between two ingestion epochs (vec_id parity) as L2 distance and "
    "centroid-vs-centroid cosine — detects encoder-version or "
    "distribution drift between pipeline runs.  Scale shape: the "
    "posexplode fans out 64x but map-side partial aggregation folds to "
    "the |labels| x dims x 2 grid before the one shuffle; no vector "
    "leaves the grid",
)
def q_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select(
        "vec_id", "label", "embedding",
        (F.col("vec_id") % 2).cast("int").alias("epoch"),
    )
    comp = (
        e.select(
            "label", "epoch", F.posexplode("embedding").alias("pos", "v")
        )
        .groupBy("label", "epoch", "pos")
        .agg(F.round(F.avg("v"), 9).alias("m"))
    )
    a = comp.filter(F.col("epoch") == 0).select(
        "label", "pos", F.col("m").alias("m0")
    )
    b = comp.filter(F.col("epoch") == 1).select(
        "label", "pos", F.col("m").alias("m1")
    )
    agg = (
        a.join(b, ["label", "pos"])
        .groupBy("label")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("m0") - F.col("m1")) ** 2)), 6
            ).alias("l2_shift"),
            F.round(
                F.sum(F.col("m0") * F.col("m1"))
                / (
                    F.sqrt(F.sum(F.col("m0") ** 2))
                    * F.sqrt(F.sum(F.col("m1") ** 2))
                ),
                6,
            ).alias("centroid_cos"),
        )
    )
    counts = e.groupBy("label").agg(
        F.count(F.when(F.col("epoch") == 0, 1)).cast("long").alias("n_a"),
        F.count(F.when(F.col("epoch") == 1, 1)).cast("long").alias("n_b"),
    )
    return counts.join(agg, "label").select(
        "label", "n_a", "n_b", "l2_shift", "centroid_cos"
    )


_FILTERED_KNN_ORACLE = f"""
WITH n AS ({_NORMALIZED_SQL}),
q AS (SELECT vec_id, label, nemb FROM n WHERE vec_id < {N_QUERIES}),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round({_dot_sql('q.nemb', 'e.nemb')}, 6) AS cosine
  FROM q JOIN n e ON e.label <> q.label
)
SELECT query_id, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM sims
) WHERE rn <= {TOP_K}
"""


@register(
    "ann_filtered_search",
    _FILTERED_KNN_ORACLE,
    doc=f"filtered vector search: top-{TOP_K} cosine neighbors for "
    f"{N_QUERIES} probes among vectors whose LABEL DIFFERS from the "
    "probe's — the attribute predicate applies DURING candidate "
    "generation (pre-filter), not to the result, so the top-k is over "
    "the admissible set only.  Scale shape: probes broadcast, the "
    "corpus filter is a pushed-down join predicate, corpus never "
    "shuffles; the window partitions by probe id (|Q| bounded)",
)
def q_ann_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _normalized(_emb(spark, sf_dir)).persist()
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("nemb").alias("q_emb"),
    )
    sims = n.join(
        F.broadcast(q), F.col("label") != F.col("q_label")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_dot(F.col("q_emb"), F.col("nemb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )


# -- MMR diversified retrieval ------------------------------------------
# Maximal Marginal Relevance (Carbonell & Goldstein 1998): greedily pick
# items maximizing lambda*relevance - (1-lambda)*max-similarity-to-
# already-selected — the diversified top-k used to de-redundify
# retrieval pools when curating training data.  The greedy loop is
# depth-bounded (3 picks) so both engines unroll it EXACTLY: every
# cosine is rounded to 6 before entering a score, every score rounded
# to 6 before the argmax, ties broken by neighbor_id — the same
# fixed-order arithmetic on both sides (the quality_logreg_train
# unrolling pattern).

MMR_LAMBDA = 0.7
MMR_POOL = 10
MMR_K = 3

_MMR_ORACLE = f"""
WITH n AS ({_NORMALIZED_SQL}),
q AS (SELECT vec_id, nemb FROM n WHERE vec_id < {N_QUERIES}),
pool AS (
  SELECT * FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, e.nemb,
           round({_dot_sql('q.nemb', 'e.nemb')}, 6) AS rel,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round({_dot_sql('q.nemb', 'e.nemb')}, 6) DESC,
                      e.vec_id
           ) AS rn
    FROM q JOIN n e ON e.vec_id <> q.vec_id
  ) WHERE rn <= {MMR_POOL}
),
s1 AS (
  SELECT query_id, neighbor_id, nemb, rel FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY rel DESC, neighbor_id
    ) AS r FROM pool
  ) WHERE r = 1
),
sc2 AS (
  SELECT p.query_id, p.neighbor_id, p.nemb, p.rel,
         round({MMR_LAMBDA} * p.rel
               - {round(1 - MMR_LAMBDA, 6)}
                 * round({_dot_sql('p.nemb', 's1.nemb')}, 6), 6) AS score
  FROM pool p JOIN s1 ON s1.query_id = p.query_id
  WHERE p.neighbor_id <> s1.neighbor_id
),
s2 AS (
  SELECT query_id, neighbor_id, nemb, rel FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, neighbor_id
    ) AS r FROM sc2
  ) WHERE r = 1
),
sc3 AS (
  SELECT p.query_id, p.neighbor_id, p.rel,
         round({MMR_LAMBDA} * p.rel
               - {round(1 - MMR_LAMBDA, 6)}
                 * greatest(round({_dot_sql('p.nemb', 's1.nemb')}, 6),
                            round({_dot_sql('p.nemb', 's2.nemb')}, 6)),
               6) AS score
  FROM pool p
  JOIN s1 ON s1.query_id = p.query_id
  JOIN s2 ON s2.query_id = p.query_id
  WHERE p.neighbor_id <> s1.neighbor_id
    AND p.neighbor_id <> s2.neighbor_id
),
s3 AS (
  SELECT query_id, neighbor_id, rel FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, neighbor_id
    ) AS r FROM sc3
  ) WHERE r = 1
)
SELECT query_id, CAST(1 AS BIGINT) AS rank, neighbor_id, rel
  AS relevance FROM s1
UNION ALL
SELECT query_id, CAST(2 AS BIGINT) AS rank, neighbor_id, rel
  AS relevance FROM s2
UNION ALL
SELECT query_id, CAST(3 AS BIGINT) AS rank, neighbor_id, rel
  AS relevance FROM s3
"""


@register(
    "mmr_diversified_topk",
    _MMR_ORACLE,
    doc=f"Maximal Marginal Relevance retrieval: from each probe's "
    f"top-{MMR_POOL} relevance pool, greedily pick {MMR_K} items "
    f"maximizing lambda*rel - (1-lambda)*max-cos-to-selected — the "
    "diversified top-k that de-redundifies retrieval pools in "
    "training-data curation.  Scale shape: the pool bound makes every "
    "greedy step a |Q| x pool-sized join (probes and selections "
    "broadcast); the corpus participates only in the one pool scan",
)
def q_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    lam = MMR_LAMBDA
    mu = round(1 - MMR_LAMBDA, 6)
    n = _normalized(_emb(spark, sf_dir)).persist()
    # eager: n feeds the broadcast q branch AND the pool scan; the
    # broadcast thread would otherwise race the lazy cache fill and
    # re-run the normalization (r7 class)
    n.count()
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("nemb").alias("q_emb")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("neighbor_id")
    )
    pool = (
        n.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "nemb",
            F.round(_dot(F.col("q_emb"), F.col("nemb")), 6).alias("rel"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_POOL)
        .drop("rn")
        .persist()
    )
    # eager: pool is (N_QUERIES x MMR_POOL)-bounded and feeds the s1/s2
    # BROADCAST builds plus the sc2/sc3 scans — four consumers racing a
    # lazy fill would each re-run the corpus scoring pass
    pool.count()

    def _argmax(df, score_col):
        return df.groupBy("query_id").agg(
            F.max_by(
                F.struct("neighbor_id", "nemb", "rel"),
                F.struct(F.col(score_col), -F.col("neighbor_id")),
            ).alias("_w")
        ).select(
            "query_id",
            F.col("_w.neighbor_id").alias("sel_id"),
            F.col("_w.nemb").alias("sel_emb"),
            F.col("_w.rel").alias("sel_rel"),
        )

    s1 = _argmax(pool, "rel")
    sc2 = (
        pool.join(F.broadcast(s1), "query_id")
        .filter(F.col("neighbor_id") != F.col("sel_id"))
        .withColumn(
            "score",
            F.round(
                lam * F.col("rel")
                - mu * F.round(_dot(F.col("nemb"), F.col("sel_emb")), 6),
                6,
            ),
        )
    )
    s2 = _argmax(sc2, "score")
    sc3 = (
        pool.join(
            F.broadcast(
                s1.select(
                    "query_id",
                    F.col("sel_id").alias("id1"),
                    F.col("sel_emb").alias("emb1"),
                )
            ),
            "query_id",
        )
        .join(
            F.broadcast(
                s2.select(
                    "query_id",
                    F.col("sel_id").alias("id2"),
                    F.col("sel_emb").alias("emb2"),
                )
            ),
            "query_id",
        )
        .filter(
            (F.col("neighbor_id") != F.col("id1"))
            & (F.col("neighbor_id") != F.col("id2"))
        )
        .withColumn(
            "score",
            F.round(
                lam * F.col("rel")
                - mu
                * F.greatest(
                    F.round(_dot(F.col("nemb"), F.col("emb1")), 6),
                    F.round(_dot(F.col("nemb"), F.col("emb2")), 6),
                ),
                6,
            ),
        )
    )
    s3 = _argmax(sc3, "score")

    def _out(s, rank):
        return s.select(
            "query_id",
            F.lit(rank).cast("long").alias("rank"),
            F.col("sel_id").alias("neighbor_id"),
            F.col("sel_rel").alias("relevance"),
        )

    return _out(s1, 1).unionAll(_out(s2, 2)).unionAll(_out(s3, 3))
