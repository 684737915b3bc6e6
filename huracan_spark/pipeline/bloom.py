"""Per-file bloom-filter indexes for silver tables (Delta parity).

Min/max footer stats (``pipeline/skipping.py``) prune range predicates
but are useless for point lookups on high-cardinality columns that are
NOT the bucket key — a ``owner = X`` filter sees every file's
``[min_owner, max_owner]`` span nearly the whole key space.  Delta
solves this with per-file bloom filter indexes; SilverTable gets the
same behavior over plain parquet:

- ``SilverTable.add_bloom_index(col)`` registers a column (config in a
  table-local ``bloom.json``, like CHECK constraints);
- at commit time, ONE distributed Spark job over the just-written
  files computes a small bitmap per (file, column) — cost O(touched),
  the same order as the merge that wrote the files;
- the manifest carries ``blooms: {bucket: {file: {col: {m, k, hex}}}}``;
  untouched buckets inherit their previous entry verbatim;
- ``prune_plan`` tests ``=`` / ``in`` filter values against each
  surviving file's bitmap and skips files that provably cannot
  contain the value.

The bitmap is a standard Bloom filter (m bits, k probes) with
Kirsch-Mitzenmacher double hashing over md5 of the value's STRING
cast: ``h = md5(cast(v as string))``, ``h1 = h[0:8]``, ``h2 =
h[8:16] | 1`` (32-bit hex words), ``pos_i = (h1 + i*h2) mod m``.
md5-of-string is chosen because the JVM (``F.md5``) and CPython
(``hashlib.md5``) produce identical digests for identical UTF-8
bytes — the harvest job and the driver-side membership test cannot
drift.  Pruning stays conservative: only ``str``/``int`` filter
values are tested (their Python ``str()`` equals Spark's string
cast); anything else — and any file without a bitmap for the
column — is read.

Reference parity: the reference's Mongo secondary indexes serve its
point lookups (SURVEY §2 Q1-Q4); Delta's bloom filter index is the
public design this follows.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DEFAULT_BITS",
    "DEFAULT_K",
    "bit_positions",
    "position_columns",
    "harvest_blooms",
    "file_might_contain",
]

DEFAULT_BITS = 8192  # 1 KiB bitmap per (file, column)
DEFAULT_K = 4

# filter-value types whose Python str() matches Spark's CAST AS STRING
# byte-for-byte; everything else never bloom-prunes
_TESTABLE = (str, int)


def _words(value_str: str) -> tuple[int, int]:
    h = hashlib.md5(value_str.encode("utf-8")).hexdigest()
    return int(h[0:8], 16), int(h[8:16], 16) | 1


def bit_positions(value_str: str, m: int, k: int) -> list[int]:
    """The k probe positions for a value — driver-side twin of
    ``position_columns`` (same md5 words, same double hashing)."""
    h1, h2 = _words(value_str)
    return [(h1 + i * h2) % m for i in range(k)]


def position_columns(col: str, m: int, k: int) -> list[Column]:
    """The k probe positions as JVM-side column expressions (no
    Python UDF): md5 of the string cast, two 32-bit hex words, double
    hashing.  Null values yield null positions (filtered out by the
    harvest aggregation — a bloom answers non-null equality only)."""
    digest = F.md5(F.col(col).cast("string"))
    h1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").bitwiseOR(1)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]


def _to_hex(positions: set[int], m: int) -> str:
    bits = bytearray(m // 8)
    for p in positions:
        bits[p >> 3] |= 1 << (p & 7)
    return bits.hex()


def harvest_blooms(
    df: DataFrame, columns: dict[str, dict]
) -> dict[str, dict[str, dict]]:
    """One distributed pass over freshly written files: for every
    configured column present in ``df``, the distinct (file, column,
    bit position) triples — bounded by |files| x m, tiny next to the
    data — come back to the driver and assemble into per-file hex
    bitmaps.  ``df`` must carry a ``_file`` column (basename) and a
    ``_bucket_id`` column (bucket the file belongs to).

    Returns ``{bucket: {file: {col: {"m": m, "k": k, "hex": hex}}}}``.
    The per-bucket file map is COMPLETE — a file whose column is all
    null gets an all-zero bitmap (it really contains no value, so any
    lookup on it correctly prunes) — which lets ``prune_plan`` iterate
    a bucket's files off the bloom map alone.

    Scale shape: the distinct (file, col, position) set is bounded by
    |files| x |cols| x m (tiny next to the data), and the BITMAPS are
    assembled executor-side (Arrow-batched ``applyInPandas`` over that
    bounded set — a maintenance job, not a query path), so the driver
    receives only |files| x |cols| hex strings, never raw positions.
    """
    active = {c: cfg for c, cfg in columns.items() if c in df.columns}
    if not active:
        return {}
    probes = []
    for c, cfg in active.items():
        for pos in position_columns(c, cfg["m"], cfg["k"]):
            probes.append(F.struct(F.lit(c).alias("c"), pos.alias("p")))
    triples = (
        df.select(
            "_bucket_id",
            "_file",
            F.explode(F.array(*probes)).alias("probe"),
        )
        .select(
            "_bucket_id",
            "_file",
            F.col("probe.c").alias("c"),
            F.col("probe.p").alias("p"),
        )
        .filter(F.col("p").isNotNull())
        .distinct()
    )
    params = {c: (cfg["m"], cfg["k"]) for c, cfg in active.items()}

    def _assemble(pdf):
        import pandas as pd

        rows = []
        b = pdf["_bucket_id"].iloc[0]
        fn = pdf["_file"].iloc[0]
        for c, sub in pdf.groupby("c"):
            m = params[c][0]
            bits = bytearray(m // 8)
            for p in sub["p"]:
                p = int(p)
                bits[p >> 3] |= 1 << (p & 7)
            rows.append((b, fn, c, bits.hex()))
        return pd.DataFrame(
            rows, columns=["_bucket_id", "_file", "c", "hex"]
        )

    assembled = triples.groupBy("_bucket_id", "_file").applyInPandas(
        _assemble, schema="_bucket_id string, _file string, c string, hex string"
    )
    # one pass computes both: every (bucket, file) pair (completeness —
    # all-null files must appear with zero bitmaps) and the bitmaps
    files = df.select("_bucket_id", "_file").distinct().collect()
    out: dict[str, dict[str, dict]] = {}
    zero = {
        c: {"m": cfg["m"], "k": cfg["k"], "hex": "00" * (cfg["m"] // 8)}
        for c, cfg in active.items()
    }
    for r in files:
        out.setdefault(r._bucket_id, {})[r._file] = {
            c: dict(v) for c, v in zero.items()
        }
    for r in assembled.collect():
        out[r._bucket_id][r._file][r.c] = {
            "m": params[r.c][0],
            "k": params[r.c][1],
            "hex": r.hex,
        }
    return out


def _bit_set(hexmap: str, pos: int) -> bool:
    byte = int(hexmap[(pos >> 3) * 2 : (pos >> 3) * 2 + 2], 16)
    return bool(byte & (1 << (pos & 7)))


#: column dtypes whose CAST AS STRING matches Python ``str()`` of a
#: matching probe value: strings verbatim, the integer chain ("1" at
#: every width).  A double column casts 1.0 to "1.0" while an int
#: probe hashes "1" — bitmaps on such columns must never be consulted
#: (and a column can BECOME double later via type widening).
_STABLE_STR = "string"
_STABLE_INT = ("tinyint", "smallint", "int", "bigint")


def _probe_ok(value, col_type: str | None) -> bool:
    if isinstance(value, bool) or not isinstance(value, _TESTABLE):
        return False
    if col_type is None:
        # no type information (legacy caller): keep the value-only
        # guard — callers on typed tables always pass types
        return True
    if isinstance(value, str):
        return col_type == _STABLE_STR
    return col_type in _STABLE_INT


def file_might_contain(
    file_blooms: dict | None, filters, types: dict | None = None
) -> bool:
    """Conservative membership test for one file: False ONLY when a
    bloom proves an ``=`` value (or every member of an ``in`` list)
    is absent.  Files without a bitmap for the column, non-str/int
    values, probe/column type families whose string casts can drift
    (``types`` maps column -> committed dtype), and all other
    operators never prune."""
    if not file_blooms:
        return True
    for col, op, value in filters:
        ent = file_blooms.get(col)
        if ent is None:
            continue
        col_type = types.get(col) if types is not None else None
        m, k, hexmap = ent["m"], ent["k"], ent["hex"]
        if op == "=":
            if not _probe_ok(value, col_type):
                continue
            if not all(
                _bit_set(hexmap, p) for p in bit_positions(str(value), m, k)
            ):
                return False
        elif op == "in":
            vals = list(value)
            if any(not _probe_ok(v, col_type) for v in vals):
                continue
            if all(
                not all(
                    _bit_set(hexmap, p)
                    for p in bit_positions(str(v), m, k)
                )
                for v in vals
            ):
                return False
    return True
