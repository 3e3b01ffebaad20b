"""Similarity-search operators over the driver-provided embeddings table,
validated against a numpy brute-force oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocr_obsidian_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    lsh_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, mat


def _oracle_topk(ids, mat, qid, k=5):
    q = mat[ids == qid][0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(
        [(s, i) for s, i in zip(sims, ids) if i != qid], key=lambda t: (-t[0], t[1])
    )
    return [i for _, i in order[:k]]


def test_brute_force_topk_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    queries = emb.filter(F.col("vec_id") < 4)
    got = brute_force_topk(emb, queries, k=5).collect()
    by_q: dict[int, list[int]] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for qid in range(4):
        assert by_q[qid] == _oracle_topk(ids, mat, qid)


def test_lsh_topk_recall(spark, emb, emb_np):
    ids, mat = emb_np
    queries = emb.filter(F.col("vec_id") < 20)
    got = lsh_topk(emb, queries, k=5, dim=64, n_bits=6).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # recall@5 of the bucketed path vs exact — lenient but non-trivial
    hits = total = 0
    for qid in range(20):
        exact = set(_oracle_topk(ids, mat, qid, k=5))
        total += 5
        hits += len(exact & by_q.get(qid, set()))
    assert hits / total > 0.2


def test_embedding_near_duplicates_self_similarity(spark, emb):
    # append exact copies with shifted ids: cosine 1.0 must be found
    copies = emb.limit(5).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    both = emb.unionByName(copies)
    pairs = embedding_near_duplicates(both, dim=64, threshold=0.999)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for d in range(5):
        assert (d, d + 10000) in found


def test_ivf_topk_recall_and_cells(spark, emb, emb_np):
    from ocr_obsidian_spark.operators.similarity import ivf_assign, ivf_topk, sample_centroids

    ids, mat = emb_np
    cents = sample_centroids(emb, 8)
    assigned = ivf_assign(emb, cents)
    cells = {r["ivf_cell"] for r in assigned.select("ivf_cell").distinct().collect()}
    assert cells <= set(range(8)) and len(cells) > 1

    queries = emb.filter(F.col("vec_id") < 20)
    got = ivf_topk(emb, queries, cents, k=5, n_probe=3).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for qid in range(20):
        exact = set(_oracle_topk(ids, mat, qid, k=5))
        total += 5
        hits += len(exact & by_q.get(qid, set()))
    assert hits / total > 0.3
