"""A/B the dup_span_report plan at decade scale (r9 VERDICT item 3).

The canonical d3 row reads exp 1.295 with EXACTLY linear output —
the excess is in the plan, not the answer.  Candidate attributions:

- v0  current registered plan (reproduce the baseline)
- v1  dup detection via min/max(doc_id) instead of countDistinct —
      Spark plans a single distinct aggregate as TWO exchanges
      (partial dedup on (hash, doc_id), then re-agg on hash); min!=max
      is semantically identical for "appears in >1 doc" and costs ONE
      exchange
- v2  v1 + hash60 (8-byte long) instead of md5 hex (32-char string)
      as the shuffle key — same md5 CPU, ~half the shuffle bytes

Usage: python3 -m tools.dupspan_ab [sf_dir ...]
Env: SPARK_GRAFT_INIT_PARTITIONS to match the canonical d3 width (512).
Prints one JSON line per (variant, sf_dir) with repeat-2 minima.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _variant(spark: SparkSession, sf_dir: str, mode: str) -> DataFrame:
    from huracan_spark.queries.dedup import (
        SUB_BLOCK_K,
        SUB_BLOCK_STRIDE,
        _docs,
    )
    from huracan_spark.functions.textfns import hash60

    d = _docs(spark, sf_dir).filter(F.length("text") >= SUB_BLOCK_K)
    pos = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(1),
                F.length("text") - (SUB_BLOCK_K - 1),
                F.lit(SUB_BLOCK_STRIDE),
            )
        ).alias("i"),
    )
    win = F.col("text").substr(F.col("i"), F.lit(SUB_BLOCK_K))
    hash_col = (
        hash60(win, "dupspan")
        if mode in ("hash60", "hash60_minmax")
        else F.md5(win)
    )
    blocks = pos.select(
        "doc_id",
        F.expr(f"CAST((i - 1) DIV {SUB_BLOCK_STRIDE} AS BIGINT)").alias("w"),
        hash_col.alias("block_hash"),
    )
    if mode in ("v0", "hash60"):
        dup = (
            blocks.groupBy("block_hash")
            .agg(F.countDistinct("doc_id").alias("_nd"))
            .filter(F.col("_nd") > 1)
            .select("block_hash")
        )
    else:
        dup = (
            blocks.groupBy("block_hash")
            .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
            .filter(F.col("_mn") != F.col("_mx"))
            .select("block_hash")
        )
    dw = blocks.join(dup.hint("shuffle_hash"), "block_hash").select(
        "doc_id", "w"
    )
    isl = dw.withColumn(
        "g",
        F.col("w")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("w")),
    )
    spans = isl.groupBy("doc_id", "g").agg(
        F.min("w").alias("w0"),
        F.max("w").alias("w1"),
        F.count("*").alias("n_windows"),
    )
    return spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_dup_spans"),
        F.sum("n_windows").cast("long").alias("n_dup_windows"),
        F.max((F.col("w1") - F.col("w0")) * SUB_BLOCK_STRIDE + SUB_BLOCK_K)
        .cast("long")
        .alias("max_span_chars"),
    )


def _stage(spark: SparkSession, sf_dir: str, upto: str) -> DataFrame:
    """Prefix of the v0 plan, for stage-isolated attribution:
    blocks -> dup -> dw (join, pre-window) -> islands (the window) ->
    full.  Each prefix is noop-sunk on its own so the super-linear
    stage can be pinpointed at decade scale."""
    from huracan_spark.queries.dedup import (
        SUB_BLOCK_K,
        SUB_BLOCK_STRIDE,
        _docs,
    )

    d = _docs(spark, sf_dir).filter(F.length("text") >= SUB_BLOCK_K)
    pos = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(1),
                F.length("text") - (SUB_BLOCK_K - 1),
                F.lit(SUB_BLOCK_STRIDE),
            )
        ).alias("i"),
    )
    blocks = pos.select(
        "doc_id",
        F.expr(f"CAST((i - 1) DIV {SUB_BLOCK_STRIDE} AS BIGINT)").alias("w"),
        F.md5(F.col("text").substr(F.col("i"), F.lit(SUB_BLOCK_K))).alias(
            "block_hash"
        ),
    )
    if upto == "blocks":
        return blocks
    dup = (
        blocks.groupBy("block_hash")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("block_hash")
    )
    if upto == "dup":
        return dup
    dw = blocks.join(dup.hint("shuffle_hash"), "block_hash").select(
        "doc_id", "w"
    )
    if upto == "dw":
        return dw
    isl = dw.withColumn(
        "g",
        F.col("w")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("w")),
    )
    if upto == "islands":
        return isl
    raise ValueError(upto)


def main() -> None:
    args = sys.argv[1:]
    stages = "--stages" in args
    if stages:
        args.remove("--stages")
    sf_dirs = args or ["/root/repo/.scale/sf10", "/root/repo/.scale/sf100"]
    from huracan_spark.session import get_spark

    spark = get_spark("dupspan-ab")
    if stages:
        import json as _json

        for sf_dir in sf_dirs:
            from huracan_spark.sources.tables import load_table

            load_table(spark, sf_dir, "documents").count()
            for upto in ("blocks", "dup", "dw", "islands"):
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    _stage(spark, sf_dir, upto).write.mode(
                        "overwrite"
                    ).format("noop").save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                print(
                    _json.dumps(
                        {"sf_dir": sf_dir, "stage": upto,
                         "sec_min2": round(best, 2)}
                    ),
                    flush=True,
                )
                spark.catalog.clearCache()
        return
    for sf_dir in sf_dirs:
        from huracan_spark.sources.tables import load_table

        load_table(spark, sf_dir, "documents").count()  # warm footers
        for mode in ("v0", "minmax", "hash60"):
            best, rows = None, None
            for _ in range(2):
                t0 = time.perf_counter()
                df = _variant(spark, sf_dir, mode)
                df.write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rows = _variant(spark, sf_dir, mode).count()
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "mode": mode,
                        "sec_min2": round(best, 2),
                        "rows": rows,
                    }
                ),
                flush=True,
            )
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
