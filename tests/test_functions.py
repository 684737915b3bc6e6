"""Unit tests for the column-expression kernels (SURVEY §7.1 step 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from huracan_spark.functions.codec import b64_decode, hex_to_long, long_to_hex
from huracan_spark.functions.owner import owned_by, owned_by_any
from huracan_spark.functions.typeparse import (
    type_generics,
    type_module,
    type_package,
    type_struct,
)


def test_hex_roundtrip(spark):
    df = spark.createDataFrame([(0,), (1,), (31,), (255,), (2**40,)], ["v"])
    out = df.select(
        "v", long_to_hex("v").alias("h")
    ).withColumn("back", hex_to_long("h"))
    rows = {r.v: (r.h, r.back) for r in out.collect()}
    assert rows[31] == ("0x1f", 31)  # server/src/main.rs:250-252 format
    assert rows[255] == ("0xff", 255)
    assert all(v == back for v, (_, back) in rows.items())


def test_hex_decode_without_prefix(spark):
    df = spark.createDataFrame([("1f",), ("0x1f",)], ["h"])
    vals = [r[0] for r in df.select(hex_to_long("h")).collect()]
    assert vals == [31, 31]


def test_b64_decode(spark):
    import base64

    payload = base64.b64encode(b"huracan").decode()
    df = spark.createDataFrame([(payload,)], ["b"])
    assert df.select(b64_decode("b")).first()[0] == bytearray(b"huracan")


def test_type_parse_full_generic(spark):
    ty = "0x2::dynamic_field::Field<0x1::string::String, 0xabc::profile::Profile>"
    df = spark.createDataFrame([(ty,)], ["t"])
    row = df.select(
        type_package("t").alias("p"),
        type_module("t").alias("m"),
        type_struct("t").alias("s"),
        type_generics("t").alias("g"),
    ).first()
    assert row.p == "0x2"
    assert row.m == "dynamic_field"
    assert row.s == "Field"
    assert row.g == ["0x1::string::String", "0xabc::profile::Profile"]


def test_type_parse_no_generics(spark):
    df = spark.createDataFrame([("0x2::sui::SUI",)], ["t"])
    row = df.select(
        type_struct("t").alias("s"), type_generics("t").alias("g")
    ).first()
    assert row.s == "SUI"
    assert row.g == []


def test_owner_predicates(spark):
    rows = [
        ("AddressOwner", "0xa", None),
        ("ObjectOwner", "0xa", None),
        ("Shared", None, 5),
        ("Immutable", None, None),
        ("AddressOwner", "0xb", None),
    ]
    df = spark.createDataFrame(
        rows, "owner_kind string, owner_address string, initial_shared_version long"
    )
    assert df.filter(owned_by("0xa")).count() == 2
    assert df.filter(owned_by_any(["0xa", "0xb"])).count() == 3


def test_pii_scrub_synthetic(spark):
    """Redaction behavior on text that DOES contain PII (the fixture
    corpus is PII-free, so the registered doc_pii_scrub query only
    proves cross-engine parity of the no-match path; this pins the
    match path on both engines)."""
    import duckdb

    from huracan_spark.queries.text import (
        _PII_EMAIL,
        _PII_IP,
        _PII_URL,
        pii_scrub,
    )

    samples = [
        ("contact a.b+c@ex-ample.co.uk today", "contact <EMAIL> today"),
        ("see https://x.io/p?q=1#f and http://y.z/", "see <URL> and <URL>"),
        ("host 192.168.0.1 died", "host <IP> died"),
        # email inside a URL: URL redacted first, email never double-counted
        ("go https://a.com/mail?to=x@y.com now", "go <URL> now"),
        ("no pii here", "no pii here"),
        ("1234.5678 is not an ip", "1234.5678 is not an ip"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in samples], ["text"])
    got = [r[0] for r in df.select(pii_scrub(F.col("text"))).collect()]
    assert got == [want for _, want in samples]

    # DuckDB applies the same patterns identically (RE2 vs Java regex)
    for s, want in samples:
        lit = s.replace("'", "''")
        duck = duckdb.sql(
            f"SELECT regexp_replace(regexp_replace(regexp_replace('{lit}', "
            f"'{_PII_URL}', '<URL>', 'g'), '{_PII_EMAIL}', '<EMAIL>', 'g'), "
            f"'{_PII_IP}', '<IP>', 'g')"
        ).fetchone()[0]
        assert duck == want, (s, duck, want)
