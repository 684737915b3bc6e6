"""Synthesize a 10x-scale dataset from an existing sf dir (the "sf1"
scale rehearsal input).

Every 100 TB claim in COVERAGE.md is an O()-shape argument verified at
sf0.1; this tool manufactures one empirical decade above it so the
shapes can be MEASURED (tools/scale_rehearsal.py).  The construction
preserves each table's statistical structure while keeping the copies
genuinely distinct — naive self-union would turn every document into a
10-way exact-dup clique and every embedding into a 10-way cosine-1.0
clique, exploding pair counts ~45x instead of 10x and poisoning the
scaling exponents:

- relational keys get per-copy offsets (k * (max_key+1)) applied
  CONSISTENTLY across FK edges (orders.o_custkey moves with
  customer.c_custkey, lineitem's three FKs move with their parents),
  so join fan-outs scale 10x with intact referential integrity;
  fixed dims (region, nation) are copied once
- document text goes through a per-copy TOKEN BIJECTION (prefix every
  whitespace token with a copy marker): Jaccard/MinHash/SimHash
  similarity WITHIN a copy is exactly the original's (bijections
  preserve set intersections), while cross-copy token sets are
  disjoint — near-dup density per doc stays constant, vocabulary
  scales 10x; n_chars is recomputed from the transformed text
- embeddings get a per-copy diagonal +-1 orthogonal transform D_k
  (sign per dim from md5, copy 0 = identity): cosine(D_k x, D_k y) ==
  cosine(x, y) so within-copy neighbor structure is exact, while
  cross-copy cosines are sign-scrambled to near-orthogonal; labels
  are offset per copy so label-blocked queries see 10x blocks
- events keep their timestamps (10x event density over the same time
  range — the realistic scale-up for a fixed-history deployment) with
  offset event/user ids; the TIMESTAMP(NANOS) physical type is
  preserved by staying in pyarrow end-to-end

Usage:  python3 tools/make_scale10.py [SRC_SF_DIR] [OUT_DIR]
Default: /root/testdata/sf0.1 -> /root/repo/.scale/sf1
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{name}.parquet"))


def _write(out: str, name: str, tbl: pa.Table) -> None:
    pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))


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

    def fan(tbl, offsets, suffix=()):
        return pa.concat_tables(
            _offset_copy(tbl, k, offsets, suffix) for k in range(COPIES)
        )

    _write(out, "customer", fan(cust, {"c_custkey": c_base}, ("c_name",)))
    _write(out, "supplier", fan(supp, {"s_suppkey": s_base}, ("s_name",)))
    _write(out, "part", fan(part, {"p_partkey": p_base}, ("p_name",)))
    _write(out, "orders",
           fan(orders, {"o_orderkey": o_base, "o_custkey": c_base}))
    _write(out, "lineitem",
           fan(li, {"l_orderkey": o_base, "l_partkey": p_base,
                    "l_suppkey": s_base}))
    _write(out, "events", fan(ev, {"event_id": e_base, "user_id": u_base}))


def _scale_documents(src: str, out: str) -> None:
    tbl = _read(src, "documents")
    d_base = _key_base(tbl, "doc_id")
    doc_ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    langs = tbl.column("lang").to_pylist()
    sources = tbl.column("source").to_pylist()

    ids, txts, lgs, srcs, ncs = [], [], [], [], []
    for k in range(COPIES):
        pref = "" if k == 0 else f"x{k}q"
        for d, t, lg, s in zip(doc_ids, texts, langs, sources):
            nt = t if not pref else " ".join(pref + w for w in t.split())
            ids.append(d + k * d_base)
            txts.append(nt)
            lgs.append(lg)
            srcs.append(s)
            ncs.append(len(nt))
    _write(out, "documents", pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "text": pa.array(txts, pa.string()),
         "lang": pa.array(lgs, pa.string()),
         "source": pa.array(srcs, pa.string()),
         "n_chars": pa.array(ncs, pa.int64())}))


def _sign(k: int, d: int) -> float:
    return 1.0 if int(hashlib.md5(f"sr:{k}:{d}".encode()).hexdigest()[:15], 16) & 1 else -1.0


def _scale_embeddings(src: str, out: str) -> None:
    tbl = _read(src, "embeddings")
    v_base = _key_base(tbl, "vec_id")
    l_base = pc.max(tbl.column("label")).as_py() + 1
    vec_ids = tbl.column("vec_id").to_pylist()
    embs = tbl.column("embedding").to_pylist()
    labels = tbl.column("label").to_pylist()
    dim = len(embs[0])

    ids, vecs, lbls = [], [], []
    for k in range(COPIES):
        signs = [1.0] * dim if k == 0 else [_sign(k, d) for d in range(dim)]
        for v, e, lb in zip(vec_ids, embs, labels):
            ids.append(v + k * v_base)
            vecs.append([x * s for x, s in zip(e, signs)])
            lbls.append(lb + k * l_base)
    _write(out, "embeddings", pa.table(
        {"vec_id": pa.array(ids, pa.int64()),
         "embedding": pa.array(vecs, pa.list_(pa.float32())),
         "label": pa.array(lbls, pa.int32())}))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    os.makedirs(out, exist_ok=True)
    _scale_relational(src, out)
    _scale_documents(src, out)
    _scale_embeddings(src, out)
    for name in ("lineitem", "events", "documents", "embeddings"):
        n = pq.read_metadata(os.path.join(out, f"{name}.parquet")).num_rows
        print(f"{name}: {n} rows")
    print(f"wrote 10x dataset to {out}")


if __name__ == "__main__":
    main()
