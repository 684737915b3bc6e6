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


def test_copy0_documents_identical_others_bijected(out_dir):
    src_ids = _col(SRC, "documents", "doc_id")
    src_txt = _col(SRC, "documents", "text")
    out_ids = _col(out_dir, "documents", "doc_id")
    out_txt = _col(out_dir, "documents", "text")
    out_nc = _col(out_dir, "documents", "n_chars")
    by_id = dict(zip(out_ids, out_txt))
    # copy 0 is the identity: sf_small is a subset of the 10x set
    for d, t in zip(src_ids[:50], src_txt[:50]):
        assert by_id[d] == t
    # the char bijection is LENGTH-PRESERVING and n_chars carries over
    for t, n in list(zip(out_txt, out_nc))[:200]:
        assert n == len(t)
    base = max(src_ids) + 1
    for d in src_ids[:20]:
        t0, t3 = by_id[d], by_id[d + 3 * base]
        # length preserved EXACTLY (no per-level text-growth confound)
        assert len(t3) == len(t0)
        toks0, toks3 = set(t0.split()), set(t3.split())
        # bijection: token COUNT structure preserved exactly
        assert len(t0.split()) == len(t3.split())
        assert len(toks0) == len(toks3)
        # cross-copy token sets near-disjoint: a collision needs
        # pi_3(w) to spell a token of copy 0 — only short tokens can
        inter = toks0 & toks3
        assert len(inter) <= max(1, len(toks0) // 20), inter
        assert all(len(w) <= 3 for w in inter), inter


def test_chained_levels_with_distinct_seeds_share_no_transform(
        out_dir, tmp_path_factory):
    """Decade-2 chaining pin: with per-level seeds, composed copies
    (k,0) and (0,k) must NOT be exact text twins (the shared-seed
    construction made pi_k . id == id . pi_k — 9 spurious exact-dup
    pairs per source doc that inflated decade-2 dup exponents)."""
    out2 = str(tmp_path_factory.mktemp("scale100"))
    subprocess.run(
        [sys.executable, "tools/make_scale10.py", out_dir, out2,
         "--seed", "2"],
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
    )
    src_ids = _col(SRC, "documents", "doc_id")
    base1 = max(src_ids) + 1                      # level-1 copy stride
    ids2 = _col(out2, "documents", "doc_id")
    txt2 = _col(out2, "documents", "text")
    by_id = dict(zip(ids2, txt2))
    # level-2 stride = max level-1 doc_id + 1 = 10 * base1
    stride2 = max(ids2) + 1
    assert stride2 % 10 == 0
    stride2 //= 10
    for d in src_ids[:20]:
        for k in (1, 4, 9):
            t_k0 = by_id[d + k * base1]            # level-1 copy k, level-2 copy 0
            t_0k = by_id[d + k * stride2]          # level-1 copy 0, level-2 copy k
            assert t_k0 != t_0k, "chained copies (k,0) and (0,k) must differ"


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
