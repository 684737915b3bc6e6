"""Construction invariants of tools/make_scale10.py.

The 10x scale rehearsal's exponents are only meaningful if the
synthesis preserves each table's statistical structure:

- naive self-union would make every doc a 10-way exact-dup clique and
  every embedding a 10-way cosine-1.0 clique — pair counts would grow
  ~45x instead of 10x and every dedup/ANN exponent would read as
  quadratic.  The token bijection and the diagonal +-1 transform are
  what prevent that; these tests pin them.
- FK offsets must move PARENT and CHILD keys together or join
  selectivity collapses/explodes.
"""

from __future__ import annotations

import math
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def out_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale10"))
    subprocess.run(
        [sys.executable, "tools/make_scale10.py", SRC, out],
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
    )
    return out


def _col(path, name, col):
    return pq.read_table(os.path.join(path, f"{name}.parquet")).column(col).to_pylist()


def test_row_counts_scale_10x_dims_fixed(out_dir):
    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"):
        n_src = pq.read_metadata(os.path.join(SRC, f"{t}.parquet")).num_rows
        n_out = pq.read_metadata(os.path.join(out_dir, f"{t}.parquet")).num_rows
        assert n_out == 10 * n_src, t
    for t in ("region", "nation"):
        n_src = pq.read_metadata(os.path.join(SRC, f"{t}.parquet")).num_rows
        n_out = pq.read_metadata(os.path.join(out_dir, f"{t}.parquet")).num_rows
        assert n_out == n_src, t


def test_keys_unique_and_fk_integrity(out_dir):
    ok = _col(out_dir, "orders", "o_orderkey")
    assert len(ok) == len(set(ok)), "o_orderkey must stay unique"
    ck = set(_col(out_dir, "customer", "c_custkey"))
    assert set(_col(out_dir, "orders", "o_custkey")) <= ck
    pk = set(_col(out_dir, "part", "p_partkey"))
    assert set(_col(out_dir, "lineitem", "l_partkey")) <= pk
    assert set(_col(out_dir, "lineitem", "l_orderkey")) <= set(ok)


def test_copy0_documents_identical_others_token_disjoint(out_dir):
    src_ids = _col(SRC, "documents", "doc_id")
    src_txt = _col(SRC, "documents", "text")
    out_ids = _col(out_dir, "documents", "doc_id")
    out_txt = _col(out_dir, "documents", "text")
    out_nc = _col(out_dir, "documents", "n_chars")
    by_id = dict(zip(out_ids, out_txt))
    # copy 0 is the identity: sf_small is a subset of the 10x set
    for d, t in zip(src_ids[:50], src_txt[:50]):
        assert by_id[d] == t
    # n_chars recomputed from the transformed text
    for t, n in list(zip(out_txt, out_nc))[:200]:
        assert n == len(t)
    # cross-copy token sets are disjoint (the bijection marker)
    base = max(src_ids) + 1
    for d in src_ids[:20]:
        toks0 = set(by_id[d].split())
        toks3 = set(by_id[d + 3 * base].split())
        assert not (toks0 & toks3), "cross-copy token sets must be disjoint"
        # bijection: token COUNT structure preserved exactly
        assert len(by_id[d].split()) == len(by_id[d + 3 * base].split())
        assert len(toks0) == len(toks3)


def test_embedding_transform_preserves_within_copy_cosines(out_dir):
    src_ids = _col(SRC, "embeddings", "vec_id")
    src_emb = _col(SRC, "embeddings", "embedding")
    out_ids = _col(out_dir, "embeddings", "vec_id")
    out_emb = _col(out_dir, "embeddings", "embedding")
    by_id = dict(zip(out_ids, out_emb))
    base = max(src_ids) + 1

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    a0, b0 = src_emb[0], src_emb[1]
    for k in (0, 4, 7):
        ak = by_id[src_ids[0] + k * base]
        bk = by_id[src_ids[1] + k * base]
        # diagonal +-1 transform is orthogonal: within-copy cosine exact
        assert abs(cos(ak, bk) - cos(a0, b0)) < 1e-6
    # cross-copy cosine of the SAME source vector is sign-scrambled —
    # far from the 1.0 a naive self-union would produce
    a4 = by_id[src_ids[0] + 4 * base]
    assert abs(cos(a0, a4)) < 0.5
    # copy 0 is the identity
    assert by_id[src_ids[0]] == pytest.approx(a0)


def test_label_blocks_offset_per_copy(out_dir):
    src_labels = set(_col(SRC, "embeddings", "label"))
    out_labels = set(_col(out_dir, "embeddings", "label"))
    assert len(out_labels) == 10 * len(src_labels)
    assert src_labels <= out_labels  # copy 0 identity
