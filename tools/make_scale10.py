"""Synthesize a 10x-scale dataset from an existing sf dir (the "sf1"
scale rehearsal input).

Every 100 TB claim in COVERAGE.md is an O()-shape argument verified at
sf0.1; this tool manufactures empirical decades above it so the shapes
can be MEASURED (tools/scale_rehearsal.py).  The construction preserves
each table's statistical structure while keeping the copies genuinely
distinct — naive self-union would turn every document into a 10-way
exact-dup clique and every embedding into a 10-way cosine-1.0 clique,
exploding pair counts ~45x instead of 10x and poisoning the scaling
exponents:

- relational keys get per-copy offsets (k * (max_key+1)) applied
  CONSISTENTLY across FK edges (orders.o_custkey moves with
  customer.c_custkey, lineitem's three FKs move with their parents),
  so join fan-outs scale 10x with intact referential integrity;
  fixed dims (region, nation) are copied once
- document text goes through a per-copy LENGTH-PRESERVING CHARACTER
  BIJECTION (a seeded permutation of [a-z] mirrored onto [A-Z], plus a
  permutation of [0-9]; whitespace/punctuation untouched, copy 0 =
  identity).  A character bijection is injective on strings, so token
  multisets, shingle sets, and Jaccard/MinHash/SimHash similarity
  WITHIN a copy are exactly the original's; cross-copy token sets are
  near-disjoint (a collision needs pi_k(w) to spell a token of copy j
  — only plausible for 1-2 char tokens, far below any shingle/near-dup
  threshold).  Unlike the earlier token-prefix marker, text LENGTH is
  preserved exactly, so text-query scaling ratios read directly
  against the 10x row/char growth with no per-level ~1.35x length
  confound.  Char-class structure ([a-z]->[a-z], digit->digit) is
  preserved, so regex/PII/char-entropy workloads do identical work.
- embeddings get a per-copy diagonal +-1 orthogonal transform D_k
  (sign per dim from md5, copy 0 = identity): cosine(D_k x, D_k y) ==
  cosine(x, y) so within-copy neighbor structure is exact, while
  cross-copy cosines are sign-scrambled to near-orthogonal; labels
  are offset per copy so label-blocked queries see 10x blocks
- events keep their timestamps (10x event density over the same time
  range — the realistic scale-up for a fixed-history deployment) with
  offset event/user ids; the TIMESTAMP(NANOS) physical type is
  preserved by staying in pyarrow end-to-end

CHAINING (building decade 2/3 by running the tool on its own output):
pass a DISTINCT --seed per level.  With one shared seed family,
level-1 copy k then level-2 copy 0 applies pi_k — and so does level-1
copy 0 then level-2 copy k: copies (k,0) and (0,k) would be EXACT
cross-copy twins (9 spurious exact-dup pairs per source doc, and the
same collision for embedding sign vectors).  Distinct seeds make the
composed maps {pi2_j . pi1_k} pairwise distinct.

Writes stream one copy at a time through a ParquetWriter, so peak
memory is one input-table copy — decade-3 synthesis (600M-row
lineitem) stays feasible.

Usage:  python3 tools/make_scale10.py [SRC_SF_DIR] [OUT_DIR] [--seed S]
Default: /root/testdata/sf0.1 -> /root/repo/.scale/sf1, seed "1"
"""

from __future__ import annotations

import hashlib
import os
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{name}.parquet"))


def _write(out: str, name: str, tbl: pa.Table) -> None:
    pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))


class _CopyWriter:
    """Stream per-copy tables into one parquet file (bounded memory)."""

    def __init__(self, out: str, name: str):
        self.path = os.path.join(out, f"{name}.parquet")
        self.writer = None

    def write(self, tbl: pa.Table) -> None:
        if self.writer is None:
            self.writer = pq.ParquetWriter(self.path, tbl.schema)
        self.writer.write_table(tbl)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()


def _rand_stream(seed: str):
    """Deterministic uint stream from chained md5 (no RNG state deps)."""
    i = 0
    while True:
        yield int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), 16)
        i += 1


def _perm(chars: str, seed: str) -> str:
    """Seeded Fisher-Yates permutation of `chars`."""
    out = list(chars)
    rnd = _rand_stream(seed)
    for i in range(len(out) - 1, 0, -1):
        j = next(rnd) % (i + 1)
        out[i], out[j] = out[j], out[i]
    return "".join(out)


def _copy_trans(seed: str, k: int) -> dict[int, int] | None:
    """str.translate table for copy k: permute [a-z] (mirrored to
    [A-Z]) and [0-9]; identity for copy 0 so the source stays a subset."""
    if k == 0:
        return None
    lower = _perm(string.ascii_lowercase, f"perm:{seed}:{k}:alpha")
    digits = _perm(string.digits, f"perm:{seed}:{k}:digit")
    tbl = {}
    for a, b in zip(string.ascii_lowercase, lower):
        tbl[ord(a)] = ord(b)
        tbl[ord(a.upper())] = ord(b.upper())
    for a, b in zip(string.digits, digits):
        tbl[ord(a)] = ord(b)
    return tbl


def _offset_copy(tbl: pa.Table, k: int, offsets: dict[str, int],
                 suffix_cols: tuple[str, ...] = ()) -> pa.Table:
    """Copy k of a relational table: key columns shifted by k*base,
    name-ish columns suffixed so cross-copy rows never collide on a
    non-key identity column."""
    cols = {}
    for i, field in enumerate(tbl.schema):
        arr = tbl.column(i)
        if field.name in offsets and k > 0:
            arr = pc.add(arr, pa.scalar(k * offsets[field.name], type=field.type))
        elif field.name in suffix_cols and k > 0:
            arr = pc.binary_join_element_wise(
                arr.cast(pa.string()), pa.scalar(f"#{k}"), ""
            ).cast(field.type)
        cols[field.name] = arr
    return pa.table(cols, schema=tbl.schema)


def _key_base(tbl: pa.Table, col: str) -> int:
    return pc.max(tbl.column(col)).as_py() + 1


def _scale_relational(src: str, out: str) -> None:
    cust = _read(src, "customer")
    supp = _read(src, "supplier")
    part = _read(src, "part")
    orders = _read(src, "orders")
    li = _read(src, "lineitem")
    ev = _read(src, "events")

    c_base = _key_base(cust, "c_custkey")
    s_base = _key_base(supp, "s_suppkey")
    p_base = _key_base(part, "p_partkey")
    o_base = _key_base(orders, "o_orderkey")
    e_base = _key_base(ev, "event_id")
    u_base = _key_base(ev, "user_id")

    # fixed dims: one copy (a 10x fact load joins the SAME dim tables)
    _write(out, "region", _read(src, "region"))
    _write(out, "nation", _read(src, "nation"))

    def fan(name, tbl, offsets, suffix=()):
        w = _CopyWriter(out, name)
        for k in range(COPIES):
            w.write(_offset_copy(tbl, k, offsets, suffix))
        w.close()

    fan("customer", cust, {"c_custkey": c_base}, ("c_name",))
    fan("supplier", supp, {"s_suppkey": s_base}, ("s_name",))
    fan("part", part, {"p_partkey": p_base}, ("p_name",))
    fan("orders", orders, {"o_orderkey": o_base, "o_custkey": c_base})
    fan("lineitem", li, {"l_orderkey": o_base, "l_partkey": p_base,
                         "l_suppkey": s_base})
    fan("events", ev, {"event_id": e_base, "user_id": u_base})


def _scale_documents(src: str, out: str, seed: str) -> None:
    tbl = _read(src, "documents")
    d_base = _key_base(tbl, "doc_id")
    doc_ids = np.asarray(tbl.column("doc_id").to_pylist(), dtype=np.int64)
    texts = tbl.column("text").to_pylist()
    langs = tbl.column("lang")
    sources = tbl.column("source")
    n_chars = tbl.column("n_chars")

    w = _CopyWriter(out, "documents")
    for k in range(COPIES):
        trans = _copy_trans(seed, k)
        txts = texts if trans is None else [t.translate(trans) for t in texts]
        # the bijection is length-preserving: n_chars carries over
        w.write(pa.table(
            {"doc_id": pa.array(doc_ids + k * d_base, pa.int64()),
             "text": pa.array(txts, pa.string()),
             "lang": langs,
             "source": sources,
             "n_chars": n_chars}))
    w.close()


def _sign_vector(seed: str, k: int, dim: int) -> np.ndarray:
    if k == 0:
        return np.ones(dim, dtype=np.float32)
    return np.array(
        [1.0 if int(hashlib.md5(f"sr:{seed}:{k}:{d}".encode()).hexdigest()[:15], 16) & 1
         else -1.0 for d in range(dim)],
        dtype=np.float32)


def _scale_embeddings(src: str, out: str, seed: str) -> None:
    tbl = _read(src, "embeddings")
    v_base = _key_base(tbl, "vec_id")
    l_base = pc.max(tbl.column("label")).as_py() + 1
    vec_ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    embs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.asarray(tbl.column("label").to_pylist(), dtype=np.int32)
    dim = embs.shape[1]

    w = _CopyWriter(out, "embeddings")
    for k in range(COPIES):
        vecs = embs * _sign_vector(seed, k, dim)[None, :]
        w.write(pa.table(
            {"vec_id": pa.array(vec_ids + k * v_base, pa.int64()),
             "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
             "label": pa.array(labels + k * l_base, pa.int32())}))
    w.close()


def main() -> None:
    args = list(sys.argv[1:])
    seed = "1"
    if "--seed" in args:
        i = args.index("--seed")
        seed = args[i + 1]
        del args[i:i + 2]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/root/repo/.scale/sf1"
    os.makedirs(out, exist_ok=True)
    _scale_relational(src, out)
    _scale_documents(src, out, seed)
    _scale_embeddings(src, out, seed)
    for name in ("lineitem", "events", "documents", "embeddings"):
        n = pq.read_metadata(os.path.join(out, f"{name}.parquet")).num_rows
        print(f"{name}: {n} rows")
    print(f"wrote 10x dataset to {out} (seed {seed})")


if __name__ == "__main__":
    main()
