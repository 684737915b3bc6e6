"""Audit registered oracle SQL for DuckDB CTE-inlining blowup.

DuckDB's default CTE handling inlines the body at every reference site;
a chain where level k references level k-1 twice is re-evaluated
2^depth times (the round-9 kcore_trade_graph OOM under the harness's
24GB cap).  The registry fences this corpus-wide at registration
(``huracan_spark/queries/ctemat.py``); this tool verifies the invariant
over the final registered SQL the driver actually runs.

Run: python3 -m tools.oracle_cte_audit [threshold]
Exit non-zero if any non-materialized CTE's full-inlining evaluation
multiplicity exceeds the threshold (default 4).
"""

import sys


def main() -> int:
    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from huracan_spark.queries.ctemat import inline_multiplicities

    oracles = entry.oracle_sql()
    bad = []
    for qname, sql in sorted(oracles.items()):
        res = inline_multiplicities(sql)
        worst = [
            (nm, m) for nm, (m, mat) in res.items() if not mat and m > threshold
        ]
        if worst:
            bad.append((qname, sorted(worst, key=lambda t: -t[1])))
    for qname, worst in bad:
        print(f"{qname}: " + ", ".join(f"{nm}x{m}" for nm, m in worst))
    print(
        f"\n{len(bad)}/{len(oracles)} oracles exceed inline multiplicity "
        f"{threshold} on a non-materialized CTE"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
