"""Text-analysis column expressions for the training-data pipeline.

Language-ID, quality scoring, token counting, and fingerprinting over
the ``documents`` table — all pure ``pyspark.sql.functions`` (JVM-side,
codegen-friendly; no Python UDFs in the hot path).

Every helper has a DuckDB-SQL twin builder (``*_sql``) generated from
the SAME constants, so the driver's oracle hash-match can't drift from
the Spark implementation.  Tokenization is defined once:
``split(trim(text), '\\s+')`` lowercased.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS",
    "LANG_MARKERS",
    "tokens",
    "token_count",
    "punct_ratio",
    "stopword_ratio",
    "lang_scores",
    "predicted_lang",
    "fingerprint",
    "hash60",
    "hash60_sql",
    "tokens_sql",
    "punct_ratio_sql",
    "stopword_ratio_sql",
    "lang_score_sql",
    "predicted_lang_sql",
    "fingerprint_sql",
]

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# n-gram-heuristic language ID: marker-token hit counts per language,
# argmax with alphabetical tie-break.  (The heuristic is the operator
# under test — the fixture 'lang' column is generator metadata, not
# the oracle.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ein"),
    "en": ("the", "and", "of", "is", "a"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "et", "les", "des", "une"),
}

_PUNCT_CLASS = "[.,!?;:]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- tokenization -----------------------------------------------------------


def tokens(col: Column | str) -> Column:
    """array<string> of lowercased whitespace tokens."""
    return F.transform(F.split(F.trim(_c(col)), r"\s+"), lambda x: F.lower(x))


def tokens_sql(col: str) -> str:
    return f"list_transform(string_split_regex(trim({col}), '\\s+'), x -> lower(x))"


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# -- quality signals --------------------------------------------------------


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are sentence punctuation, round 6."""
    c = _c(col)
    n = F.length(c)
    stripped = F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))
    return F.round((n - stripped) / n, 6)


def punct_ratio_sql(col: str) -> str:
    return (
        f"round((length({col}) - length(regexp_replace({col}, '{_PUNCT_CLASS}', '', 'g')))"
        f" / length({col}), 6)"
    )


def stopword_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    stops = F.filter(toks, lambda x: x.isin(*STOPWORDS))
    return F.round(F.size(stops) / F.size(toks), 6)


def stopword_ratio_sql(col: str) -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    t = tokens_sql(col)
    return (
        f"round(CAST(len(list_filter({t}, x -> list_contains([{stop_list}], x))) AS DOUBLE)"
        f" / len({t}), 6)"
    )


# -- language id ------------------------------------------------------------


def lang_scores(col: Column | str) -> dict[str, Column]:
    return lang_scores_from_tokens(tokens(col))


def lang_scores_from_tokens(toks: Column) -> dict[str, Column]:
    """Per-language marker counts over a PRE-TOKENIZED array column.

    Callers that need several scores should project the token array
    into its own column first and pass that: each score otherwise
    carries its own ``tokens(text)`` subtree, and the filter/size HOFs
    are CodegenFallback, so the tokenizer re-runs once per score (and
    once per reference of any derived argmax/margin expression).  A
    multi-referenced non-cheap alias is a CollapseProject barrier, so
    the two-stage form tokenizes exactly once per row."""

    def _in(markers: tuple[str, ...]):
        # NB: a 2-arg lambda would receive (element, index) from F.filter
        return lambda x: x.isin(*markers)

    return {
        lang: F.size(F.filter(toks, _in(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_from_scores(scores: dict[str, Column]) -> Column:
    """argmax over precomputed score COLUMNS, alphabetical tie-break —
    bit-identical to ``predicted_lang`` (same fold, same tie rule),
    but safe to build over cheap column references instead of
    re-inlined score expressions."""
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    for lang in sorted(LANG_MARKERS, reverse=True):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("unknown")).otherwise(expr)


def lang_score_sql(col: str, lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter({tokens_sql(col)}, x -> list_contains([{markers}], x)))"


def predicted_lang(col: Column | str) -> Column:
    """argmax over lang scores, alphabetical tie-break (first match wins)."""
    return predicted_from_scores(lang_scores(col))


def predicted_lang_sql(col: str) -> str:
    score_exprs = {lang: lang_score_sql(col, lang) for lang in LANG_MARKERS}
    best = "greatest(" + ", ".join(score_exprs.values()) + ")"
    whens = " ".join(
        f"WHEN {score_exprs[lang]} = {best} THEN '{lang}'" for lang in sorted(LANG_MARKERS)
    )
    return f"CASE WHEN {best} = 0 THEN 'unknown' {whens} ELSE 'unknown' END"


# -- fingerprinting ---------------------------------------------------------


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text."""
    norm = F.lower(F.regexp_replace(F.trim(_c(col)), r"\s+", " "))
    return F.md5(norm)


def fingerprint_sql(col: str) -> str:
    return f"md5(lower(regexp_replace(trim({col}), '\\s+', ' ', 'g')))"


# -- deterministic 60-bit hash (shared by minhash/simhash) ------------------


def hash60(col: Column, seed: str) -> Column:
    """First 60 bits of md5(seed || ':' || value) as a positive long.

    Identical in DuckDB via ('0x' || substr(md5(...),1,15))::BIGINT —
    the cross-engine hash primitive every sketch here is built on.
    """
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), col)), 1, 15), 16, 10
    ).cast("long")


def hash60_sql(expr: str, seed: str) -> str:
    return f"('0x' || substr(md5('{seed}:' || {expr}), 1, 15))::BIGINT"
