"""Scalar codec expressions: hex<->int, base64, doc size.

Reference parity (all as pure Column expressions so they stay inside
whole-stage codegen — no Python UDFs):

- version hex encode: ``format!("{:#x}", version)`` (server/src/main.rs:250-252)
- hex decode:         ``u64::from_str_radix(&v[2..], 16)`` (main/src/etl.rs:1223-1224)
- bcs base64 decode:  (server/src/main.rs:424-430)
- max BSON doc size:  ``$bsonSize`` aggregate
  (example-queries/mongodb/get-largest-document-size.txt)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["long_to_hex", "hex_to_long", "b64_decode", "serialized_size"]


def long_to_hex(col: Column | str) -> Column:
    """``version_`` -> ``0x1f`` style hex string (Q12)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("0x"), F.lower(F.hex(c)))


def hex_to_long(col: Column | str) -> Column:
    """``0x1f`` -> 31, ingest twin of long_to_hex (Q13).

    ``conv`` handles upper/lower hex; strip the ``0x`` prefix first.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.when(c.startswith("0x"), F.substring(c, 3, 64)).otherwise(c)
    return F.conv(stripped, 16, 10).cast("long")


def b64_decode(col: Column | str) -> Column:
    """base64 string -> binary (bcs payload decode, Q10)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unbase64(c)


def serialized_size(*cols: str) -> Column:
    """Approximate serialized document size: byte length of the JSON
    encoding of the given columns (A6's ``$bsonSize`` analog)."""
    return F.octet_length(F.to_json(F.struct(*cols)))
