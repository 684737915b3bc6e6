"""CTE-materialization fence (queries/ctemat.py) — unit + corpus pins.

Round-9 shipped a real regression: the harness's DuckDB 24GB memory cap
OOM'd kcore_trade_graph because its unrolled CTE chain references each
b{r} twice and DuckDB's default inlining re-evaluates it 2^rounds times.
The fence materializes every multi-referenced top-level CTE at
registration; these tests pin the transform's parsing edge cases and the
corpus-wide invariant.
"""

from huracan_spark.queries.ctemat import (
    inline_multiplicities,
    materialize_multiref_ctes,
)


def test_single_ref_untouched():
    sql = "WITH a AS (SELECT 1 AS x) SELECT x FROM a"
    assert materialize_multiref_ctes(sql) == sql


def test_double_ref_materialized():
    sql = "WITH a AS (SELECT 1 AS x) SELECT * FROM a JOIN a USING (x)"
    out = materialize_multiref_ctes(sql)
    assert "a AS MATERIALIZED (" in out


def test_idempotent_and_respects_existing():
    sql = (
        "WITH a AS MATERIALIZED (SELECT 1 AS x) "
        "SELECT * FROM a JOIN a USING (x)"
    )
    assert materialize_multiref_ctes(sql) == sql
    once = materialize_multiref_ctes(
        "WITH a AS (SELECT 1 AS x) SELECT * FROM a JOIN a USING (x)"
    )
    assert materialize_multiref_ctes(once) == once


def test_chain_counts_compound():
    # b references a twice, tail references b twice -> a evaluated 4x
    sql = (
        "WITH a AS (SELECT 1 AS x), "
        "b AS (SELECT a1.x FROM a a1 JOIN a a2 USING (x)) "
        "SELECT * FROM b JOIN b USING (x)"
    )
    mult = inline_multiplicities(sql)
    assert mult["b"] == (2, False)
    assert mult["a"] == (4, False)
    out = materialize_multiref_ctes(sql)
    # materialized, the compounding is cut: each body runs once
    mult2 = inline_multiplicities(out)
    assert mult2["b"] == (2, True)
    assert mult2["a"] == (2, True)


def test_alias_shadow_not_counted():
    # "FROM t a" uses a as an alias, not a table reference to CTE a
    sql = (
        "WITH a AS (SELECT 1 AS x) "
        "SELECT a.x FROM a WHERE a.x IN (SELECT x FROM (SELECT 2 AS x) a)"
    )
    out = materialize_multiref_ctes(sql)
    assert "MATERIALIZED" not in out


def test_comment_and_string_parens_ignored():
    sql = (
        "WITH a AS (\n"
        "  -- unbalanced ( comment\n"
        "  SELECT ':-)' AS s, 1 AS x\n"
        ") SELECT * FROM a JOIN a USING (x)"
    )
    out = materialize_multiref_ctes(sql)
    assert "a AS MATERIALIZED (" in out
    # original text (comment + literal) must survive verbatim
    assert "-- unbalanced ( comment" in out and "':-)'" in out


def test_recursive_member_never_materialized():
    sql = (
        "WITH RECURSIVE r AS ("
        "  SELECT 1 AS x UNION ALL SELECT x + 1 FROM r WHERE x < 3"
        ") SELECT * FROM r JOIN r USING (x)"
    )
    out = materialize_multiref_ctes(sql)
    assert "MATERIALIZED" not in out


def test_nonrecursive_member_of_recursive_list_materialized():
    sql = (
        "WITH RECURSIVE base AS (SELECT 1 AS x), "
        "r AS (SELECT x FROM base UNION ALL SELECT x + 1 FROM r WHERE x < 3) "
        "SELECT * FROM r JOIN base USING (x)"
    )
    out = materialize_multiref_ctes(sql)
    assert "base AS MATERIALIZED (" in out
    assert "r AS MATERIALIZED" not in out


def test_no_with_clause_noop():
    sql = "SELECT 1 AS x"
    assert materialize_multiref_ctes(sql) == sql


def test_registered_corpus_within_multiplicity_bound():
    """The 100 TB-lens invariant: no registered oracle contains a
    non-materialized CTE whose full-inlining evaluation multiplicity
    exceeds 4 (pre-fence worst offender: pca_deflation_top2's vd at
    660x; kcore's chain OOM'd the harness under the 24GB cap)."""
    from huracan_spark.queries.registry import oracle_queries

    bad = {}
    for qname, sql in oracle_queries().items():
        worst = [
            (nm, m)
            for nm, (m, mat) in inline_multiplicities(sql).items()
            if not mat and m > 4
        ]
        if worst:
            bad[qname] = worst
    assert not bad, f"inlining blowup risk: {bad}"


def test_transform_preserves_non_sql_text():
    """The fence only ever inserts the single token 'MATERIALIZED ' —
    stripping it must recover the raw source string exactly."""
    from huracan_spark.queries import insights
    from huracan_spark.queries.registry import REGISTRY, oracle_queries

    oracle_queries()  # force module load
    raw = insights._KCORE_ORACLE
    registered = REGISTRY["kcore_trade_graph"].oracle
    assert registered.replace("MATERIALIZED ", "") == raw.replace(
        "MATERIALIZED ", ""
    )
