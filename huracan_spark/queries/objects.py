"""Huracan query-surface operators (SURVEY §2.4 Q1-Q13) over TESTDATA.

The reference's GraphQL layer compiles six argument patterns into
MongoDB filters over the current-state objects table
(server/src/main.rs:277-347).  Here the same patterns are expressed as
DataFrame plans over the driver tables, with ``events`` playing the
object-change stream (user_id = object id, (ts, event_id) = version,
event_type = object type, props = dynamic fields JSON) and
customer/orders playing the parent/child object graph for the
dynamic-field join (Q7/Q8).

Every query is paired with a DuckDB oracle; all filters are
pushdown-friendly (startswith / isin / equality — no rlike), mirroring
SURVEY §4.1's "keep type prefix as startswith" note.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from huracan_spark.functions.codec import hex_to_long, long_to_hex
from huracan_spark.operators.compaction import latest_state
from huracan_spark.operators.pagination import paginate
from huracan_spark.queries.registry import register
from huracan_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# The silver current-state view: latest event per user (K1/M3 compaction).
# ---------------------------------------------------------------------------

_LATEST_STATE_ORACLE = """
SELECT user_id,
       event_id AS latest_event_id,
       epoch_ms(ts) AS ts_ms,
       event_type AS latest_type,
       value AS latest_value,
       props AS latest_props
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register(
    "latest_state",
    _LATEST_STATE_ORACLE,
    doc="K1/M3: last-writer-wins compaction of the change stream (etl.rs:1244-1267)",
)
def q_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    latest = latest_state(ev, key="user_id", version=("ts", "event_id"))
    return latest.select(
        "user_id",
        F.col("event_id").alias("latest_event_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("event_type").alias("latest_type"),
        F.col("value").alias("latest_value"),
        F.col("props").alias("latest_props"),
    )


# ---------------------------------------------------------------------------
# Q1/Q2: point + multi-id lookup (server/src/main.rs:271-282)
# ---------------------------------------------------------------------------


@register(
    "point_lookup",
    "SELECT event_id, user_id, event_type, value FROM events WHERE event_id = 42",
    doc="Q1: find_one(_id) point lookup",
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_id") == 42)
        .select("event_id", "user_id", "event_type", "value")
    )


_IDS = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233]


@register(
    "multi_id_lookup",
    f"SELECT event_id, user_id, event_type, value FROM events "
    f"WHERE event_id IN ({', '.join(map(str, _IDS))})",
    doc="Q2: _id $in [ids]",
)
def q_multi_id_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_id").isin(_IDS))
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Q3/Q4: owner lookups (server/src/main.rs:283-286)
# ---------------------------------------------------------------------------


@register(
    "owner_lookup",
    "SELECT event_id, user_id, event_type, value FROM events WHERE user_id = 7",
    doc="Q3: objects by single owner",
)
def q_owner_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("user_id") == 7)
        .select("event_id", "user_id", "event_type", "value")
    )


_OWNERS = [2, 3, 5, 7, 11]


@register(
    "owner_multi_lookup",
    f"SELECT event_id, user_id, event_type, value FROM events "
    f"WHERE user_id IN ({', '.join(map(str, _OWNERS))})",
    doc="Q4: objects by owner $in list",
)
def q_owner_multi_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("user_id").isin(_OWNERS))
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Q5/Q6: type-prefix filters (server/src/main.rs:287-294)
# ---------------------------------------------------------------------------


@register(
    "type_prefix_filter",
    "SELECT event_id, user_id, event_type FROM events WHERE event_type LIKE 'p%'",
    doc="Q5: ^type regex -> startswith (pushdown-friendly, SURVEY §4.1)",
)
def q_type_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type").startswith("p"))
        .select("event_id", "user_id", "event_type")
    )


@register(
    "type_prefix_multi",
    "SELECT event_id, user_id, event_type FROM events "
    "WHERE event_type LIKE 'p%' OR event_type LIKE 's%'",
    doc="Q6: regex alternation ^t1|^t2 -> OR of startswith",
)
def q_type_prefix_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    pred = ev.event_type.startswith("p") | ev.event_type.startswith("s")
    return ev.filter(pred).select("event_id", "user_id", "event_type")


# ---------------------------------------------------------------------------
# Q7: dynamic-field value filter via runtime JSON path
# (server/src/main.rs:295-322 builds dotted paths at runtime)
# ---------------------------------------------------------------------------


@register(
    "dynamic_field_filter",
    """
    SELECT event_id, user_id,
           CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k_value
    FROM events
    WHERE CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) BETWEEN 10 AND 20
    """,
    doc="Q7 filter: get_json_object on a runtime-built path",
)
def q_dynamic_field_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("k_value", k)
        .filter(F.col("k_value").between(10, 20))
        .select("event_id", "user_id", "k_value")
    )


# ---------------------------------------------------------------------------
# Q7/Q8: parent join + child expansion (field object -> parent object).
# customer = parent objects, orders = field/child objects keyed by
# o_custkey (the ObjectOwner back-pointer, server/src/main.rs:203-247).
# ---------------------------------------------------------------------------


@register(
    "dynamic_field_join",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    ORDER BY c.c_custkey, o.o_orderkey
    LIMIT 100 OFFSET 50
    """,
    doc="Q7/Q8: child->parent self-join ($lookup) with limit/skip, deterministic order",
)
def q_dynamic_field_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        orders.filter(F.col("o_orderstatus") == "O")
        # parent side is the small dimension -> broadcast (SURVEY Q7 note)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    )
    return paginate(joined, ["c_custkey", "o_orderkey"], limit=100, offset=50)


# ---------------------------------------------------------------------------
# Q9: deterministic pagination
# ---------------------------------------------------------------------------


@register(
    "pagination",
    "SELECT event_id, user_id, event_type, value FROM events "
    "ORDER BY event_id LIMIT 50 OFFSET 100",
    doc="Q9: limit/skip with explicit order (fixes SURVEY §4.3 nondeterminism)",
)
def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_id", "user_id", "event_type", "value")
    return paginate(ev, "event_id", limit=50, offset=100)


# ---------------------------------------------------------------------------
# Q12/Q13: version hex encode/decode roundtrip
# ---------------------------------------------------------------------------


@register(
    "version_hex_roundtrip",
    """
    SELECT event_id,
           '0x' || printf('%x', event_id) AS version_hex,
           event_id AS decoded
    FROM events WHERE event_id < 500
    """,
    doc="Q12/Q13: format!(\"{:#x}\") twin pair (server/src/main.rs:250-252, etl.rs:1223-1224)",
)
def q_version_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("event_id") < 500)
    withhex = ev.select("event_id", long_to_hex("event_id").alias("version_hex"))
    return withhex.withColumn("decoded", hex_to_long("version_hex"))


# -- keyset (seek) pagination -------------------------------------------------

_KEYSET_ORACLE = """
SELECT event_id, event_type, user_id
FROM events
WHERE event_id > 1234
ORDER BY event_id
LIMIT 50
"""


@register(
    "pagination_keyset",
    _KEYSET_ORACLE,
    doc="keyset (seek) pagination: WHERE key > cursor ORDER BY key LIMIT n "
    "— O(page) at any depth because the cursor predicate pushes into the "
    "parquet scan (GreaterThan in PushedFilters, plan-tested), unlike "
    "OFFSET pagination which reads and discards offset rows per page",
)
def q_pagination_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from huracan_spark.operators.pagination import paginate_after

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    return paginate_after(ev, "event_id", limit=50, after=(1234,))
