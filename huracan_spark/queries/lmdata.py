"""Tokenizer-training and LM-data-curation queries over ``documents``.

Three operators a large-scale LLM data pipeline runs between raw text
and training shards:

- ``bpe_merge_step`` — the inner loop of BPE tokenizer training:
  count adjacent symbol-pair frequencies across the corpus and pick
  the top merges.  One explode + one hash-aggregate; at 100 TB the
  pair space is bounded (|alphabet|^2), so the shuffle key set is tiny
  and map-side partial aggregation collapses nearly everything before
  the exchange.
- ``oov_rate`` — vocabulary coverage per source against a bounded
  top-K vocab (the go/no-go signal for a tokenizer over a new data
  mix).  The vocab is K rows by construction -> broadcast join; the
  corpus-sized token stream never shuffles on the Zipf-skewed token.
- ``perplexity_filter`` — unigram-LM quality gate: flag documents
  whose mean token log-probability falls below a fixed threshold
  (the CCNet/Gopher-style "perplexity bucket" filter, reduced to its
  deterministic unigram form so the oracle can replicate it exactly).

All three are pure ``pyspark.sql.functions`` column expressions with
DuckDB oracle twins generated from the same constants; no UDFs.

Reference scope: beyond-reference LLM-prep extension per the build
brief (the reference engine has no text pipeline); tokenization is the
shared definition in ``functions/textfns.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.functions.textfns import tokens, tokens_sql
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table

TOP_MERGES = 20  # bpe_merge_step: emit the top-K candidate merges
OOV_VOCAB_K = 20  # oov_rate: vocabulary size. The synthetic corpus has
# only 31 distinct whitespace tokens, so the cut must land inside that
# range to leave OOV mass to measure (~32% at K=20); a real corpus uses
# a 30-100k cut — the plan shape (broadcast K-row vocab) is unchanged.
MIN_AVG_LOGPROB = -1.48  # perplexity_filter: docs below this are
# flagged (~13% of the fixture; scores span -1.61..-1.47 against the
# fixture's 31-token unigram LM)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# -- BPE merge-candidate counting -------------------------------------------

# Symbols here are characters of lowercase-alpha words (the first BPE
# iteration, before any merge has been applied); a full trainer would
# re-run this count after each merge over the updated symbol stream —
# the query shape (explode adjacent pairs -> count -> top-K) is
# identical at every iteration.

_BPE_ORACLE = f"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
  FROM documents
),
w2 AS (SELECT word FROM words WHERE length(word) >= 2),
pos AS (
  SELECT word, unnest(generate_series(1, length(word) - 1)) AS i FROM w2
),
pairs AS (SELECT substring(word, CAST(i AS INT), 2) AS pair FROM pos)
SELECT pair, count(*) AS n_occurrences
FROM pairs GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT {TOP_MERGES}
"""


@register(
    "bpe_merge_step",
    _BPE_ORACLE,
    doc=f"BPE tokenizer-training inner loop: top-{TOP_MERGES} adjacent "
    "character-pair frequencies across the corpus. Pair key space is "
    "bounded (alphabet^2), so partial aggregation collapses the "
    "corpus-sized explode before the shuffle; top-K is distributed "
    "TakeOrderedAndProject, never a global sort",
)
def q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _docs(spark, sf_dir).select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word")
    )
    w2 = words.filter(F.length("word") >= 2)
    # length >= 2 guarantees sequence(1, len-1) is non-empty, so the
    # Spark sequence() stop<start throw (DuckDB returns empty) can't
    # trigger.
    pos = w2.select(
        "word", F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i")
    )
    pairs = pos.select(F.col("word").substr(F.col("i"), F.lit(2)).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(TOP_MERGES)
    )


# -- vocabulary coverage / OOV rate per source -------------------------------

_OOV_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({tokens_sql('text')}) AS token FROM documents
),
counts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
vocab AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY cnt DESC, token) AS r
    FROM counts
  ) WHERE r <= {OOV_VOCAB_K}
)
SELECT t.source,
       count(*) AS n_tokens,
       count(*) FILTER (WHERE v.token IS NULL) AS n_oov,
       round(CAST(count(*) FILTER (WHERE v.token IS NULL) AS DOUBLE)
             / count(*), 6) AS oov_rate
FROM tok t LEFT JOIN vocab v ON t.token = v.token
GROUP BY t.source
"""


@register(
    "oov_rate",
    _OOV_ORACLE,
    doc=f"tokenizer vocabulary coverage: per-source OOV fraction against "
    f"the corpus top-{OOV_VOCAB_K} vocab. Vocab is K rows by construction "
    "(broadcast); the token stream is aggregated per source with map-side "
    "combine and never shuffles on the skewed token key",
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _docs(spark, sf_dir).select(
        "source", F.explode(tokens("text")).alias("token")
    )
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    # distributed top-K (TakeOrderedAndProject) -> K-row broadcast side
    vocab = (
        counts.orderBy(F.col("cnt").desc(), "token")
        .limit(OOV_VOCAB_K)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    oov = F.count(F.when(F.col("_in_vocab").isNull(), F.lit(1)))
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            oov.alias("n_oov"),
            F.round(oov.cast("double") / F.count("*"), 6).alias("oov_rate"),
        )
    )


# -- unigram-perplexity quality gate ----------------------------------------

# Same LM construction as queries/llmprep.py::q_unigram_logprob (top-K
# vocab, +0.5 OOV smoothing) but consumed as a FILTER: the pipeline
# stage that drops gibberish/boilerplate docs before training.  The
# threshold is a fixed constant, not a corpus quantile, so the gate is
# deterministic and shardable (each partition filters independently —
# no global pass to learn the cutoff).

PPL_VOCAB_K = 1000  # matches llmprep.LM_VOCAB_K so the two scores agree

_PPL_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS token FROM documents
),
counts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
vocab AS (
  SELECT token, cnt FROM (
    SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS r
    FROM counts
  ) WHERE r <= {PPL_VOCAB_K}
),
total AS (SELECT count(*) AS n FROM tok),
scored AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         round(avg(log10(CAST(coalesce(v.cnt, 0) + 0.5 AS DOUBLE) / total.n)),
               4) AS avg_logprob
  FROM tok t LEFT JOIN vocab v ON t.token = v.token CROSS JOIN total
  GROUP BY t.doc_id, total.n
)
SELECT doc_id, n_tokens, avg_logprob
FROM scored WHERE avg_logprob < {MIN_AVG_LOGPROB}
"""


@register(
    "perplexity_filter",
    _PPL_ORACLE,
    doc="unigram-perplexity quality gate: flag docs whose mean token "
    f"log10-prob < {MIN_AVG_LOGPROB} (CCNet-style perplexity bucket, "
    "deterministic unigram form). Fixed threshold -> no global quantile "
    "pass; scoring join broadcasts the bounded vocab",
)
def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _docs(spark, sf_dir).select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    # persist the distinct-token-sized counts, never the corpus-sized
    # token stream (see llmprep.q_unigram_logprob scale note)
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt")).persist()
    vocab = counts.orderBy(F.col("cnt").desc(), "token").limit(PPL_VOCAB_K)
    total = counts.agg(F.sum("cnt").alias("n"))
    lp = F.log10((F.coalesce(F.col("cnt"), F.lit(0)) + 0.5) / F.col("n"))
    scored = (
        tok.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(lp), 4).alias("avg_logprob"),
        )
    )
    return scored.filter(F.col("avg_logprob") < MIN_AVG_LOGPROB).select(
        "doc_id", "n_tokens", "avg_logprob"
    )


# -- iterative BPE training (greedy merge application) ------------------------

# The actual tokenizer-training loop, not just one pair count
# (``bpe_merge_step``): each round counts adjacent symbol pairs over
# the corpus, picks the top pair, and REWRITES the symbol stream by
# merging it — then recounts.  Two key scale moves:
#
# - training runs on the word TYPE table (distinct word + frequency),
#   so every round is O(|vocab|) with occurrence counts as weights —
#   the corpus is scanned exactly once, up front (this is how real BPE
#   trainers work: HuggingFace tokenizers does the same);
# - symbols are angle-wrapped ('<a><b>') so the merge rewrite is a
#   plain left-to-right non-overlapping string replace with no
#   cross-symbol false matches and exact BPE greedy semantics on
#   repeats ('<a><b><a><b>' -> '<ab><ab>').
#
# The chosen pair is a driver-side O(1) scalar per round (like the
# k-means convergence check); the oracle replays every round as CTEs
# with the identical replace, so merge choice AND application are both
# hash-checked.

BPE_TRAIN_ROUNDS = 2


def _bpe_pairs_sql(src: str, k: int) -> str:
    return f"""
arr{k} AS (
  SELECT string_split(substr(seq, 2, length(seq) - 2), '><') AS a, w
  FROM {src} WHERE length(seq) > 2
),
pc{k} AS (
  SELECT '<' || a[i] || '><' || a[i + 1] || '>' AS pair,
         '<' || a[i] || a[i + 1] || '>' AS merged,
         CAST(sum(w) AS BIGINT) AS weight
  FROM (SELECT a, w, unnest(generate_series(1, len(a) - 1)) AS i FROM arr{k}
        WHERE len(a) >= 2)
  GROUP BY 1, 2
),
b{k} AS (
  SELECT {k} AS step, pair, merged, weight FROM pc{k}
  ORDER BY weight DESC, pair LIMIT 1
)"""


_BPE_TRAIN_ORACLE = (
    """
WITH words AS (
  SELECT word, CAST(count(*) AS BIGINT) AS w FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
    FROM documents
  ) WHERE length(word) >= 2
  GROUP BY word
),
r0 AS (SELECT regexp_replace(word, '(.)', '<\\1>', 'g') AS seq, w FROM words),"""
    + _bpe_pairs_sql("r0", 1)
    + """,
r1 AS (SELECT replace(seq, b1.pair, b1.merged) AS seq, w
       FROM r0 CROSS JOIN b1),"""
    + _bpe_pairs_sql("r1", 2)
    + """
SELECT step, pair, merged, weight FROM b1
UNION ALL
SELECT step, pair, merged, weight FROM b2
"""
)


@register(
    "bpe_train_merges",
    _BPE_TRAIN_ORACLE,
    doc=f"iterative BPE training, {BPE_TRAIN_ROUNDS} greedy rounds: count "
    "weighted adjacent symbol pairs over the word-TYPE table, pick the "
    "top pair, rewrite the symbol stream (angle-wrapped symbols make "
    "the merge an exact boundary-safe replace), recount. One corpus "
    "scan total; every round is vocab-sized; the oracle replays both "
    "choice and application per round",
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("w"))
    )
    cur = words.select(
        F.regexp_replace(F.col("word"), "(.)", "<$1>").alias("seq"), "w"
    ).persist()

    def pair_counts(df: DataFrame) -> DataFrame:
        arr = df.filter(F.length("seq") > 2).select(
            F.split(F.expr("substring(seq, 2, length(seq) - 2)"), "><").alias("a"),
            "w",
        ).filter(F.size("a") >= 2)
        pos = arr.select(
            "a", "w", F.explode(F.sequence(F.lit(1), F.size("a") - 1)).alias("i")
        )
        left = F.expr("element_at(a, i)")
        right = F.expr("element_at(a, i + 1)")
        return pos.select(
            F.concat(F.lit("<"), left, F.lit("><"), right, F.lit(">")).alias("pair"),
            F.concat(F.lit("<"), left, right, F.lit(">")).alias("merged"),
            "w",
        ).groupBy("pair", "merged").agg(F.sum("w").cast("long").alias("weight"))

    chosen = []
    for step in range(1, BPE_TRAIN_ROUNDS + 1):
        best = (
            pair_counts(cur)
            .orderBy(F.col("weight").desc(), "pair")
            .limit(1)
            .collect()[0]  # O(1) driver scalar per round (kmeans-style)
        )
        chosen.append((step, best.pair, best.merged, best.weight))
        nxt = cur.select(
            F.replace(F.col("seq"), F.lit(best.pair), F.lit(best.merged)).alias(
                "seq"
            ),
            "w",
        ).persist()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return spark.createDataFrame(
        chosen, "step int, pair string, merged string, weight long"
    )
