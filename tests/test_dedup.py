"""Dedup operators over the driver-provided documents table + synthetic dups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_obsidian_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_duplicate_groups,
    minhash_lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_candidate_pairs,
    simhash64,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    # add exact dups (ids 100000+) and a near-dup (one word appended)
    dup = base.limit(10).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = base.limit(5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    return base.unionByName(dup).unionByName(near).cache()


def test_exact_dedup(docs):
    n = docs.count()
    groups = exact_duplicate_groups(docs)
    dup_groups = groups.filter("n_docs > 1")
    assert dup_groups.count() == 10
    deduped = drop_exact_duplicates(docs)
    assert deduped.count() == n - 10
    # representative is the min id — original survives
    assert deduped.filter(F.col("doc_id") >= 100000).filter(F.col("doc_id") < 200000).count() == 0


def test_null_text_matches_empty_text(spark):
    """NULL and '' text are the same dedup group (oracle coalesce semantics);
    NULL-text docs must not vanish from shingle-based paths."""
    from ocr_obsidian_spark.operators.dedup import word_shingles

    rows = [(1, None), (2, ""), (3, "   "), (4, "real content here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = exact_duplicate_groups(df).filter("n_docs > 1").collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 3 and groups[0]["keep_id"] == 1
    shs = {r["doc_id"]: r["s"] for r in df.select("doc_id", word_shingles().alias("s")).collect()}
    assert shs[1] == [""] and shs[2] == [""]  # present, not NULL


def test_minhash_lsh_finds_exact_and_near_dups(docs):
    pairs = minhash_lsh_candidate_pairs(docs).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # every exact dup pair must be a candidate
    for i in range(10):
        orig = docs.orderBy("doc_id").limit(10).collect()[i]["doc_id"]
        assert (orig, orig + 100000) in found
    # near-dups (one appended word) should bucket together for most docs
    near_hits = sum((d, d + 200000) in found for d in range(5))
    assert near_hits >= 3


def test_minhash_mega_bucket_cap(spark):
    """1k identical docs (the boilerplate-page scenario): candidate volume
    must be O(n) via sorted-adjacent chaining, not n²/2, and the duplicate
    cluster must stay one connected component (VERDICT r1 #3)."""
    from ocr_obsidian_spark.operators.dedup import minhash_banded_buckets
    from ocr_obsidian_spark.operators.similarity import bucket_cap_stats

    rows = [(i, "the same boilerplate page text repeated verbatim everywhere")
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_candidate_pairs(df, max_bucket_size=64).collect()
    assert len(pairs) == 999  # chained, collapsed by distinct across bands
    parent = list(range(1000))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        parent[find(r["id_a"])] = find(r["id_b"])
    assert len({find(i) for i in range(1000)}) == 1
    stats = bucket_cap_stats(minhash_banded_buckets(df), ["band", "bucket"], 64)
    assert stats["n_over_cap"] == 16 and stats["max_bucket"] == 1000


def test_ngram_jaccard_scores(docs):
    cands = minhash_lsh_candidate_pairs(docs)
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, candidate_pairs=cands)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    exact = [(a, b) for (a, b) in rows if a < 10 and b == a + 100000]
    assert len(exact) == 10
    assert all(abs(rows[p] - 1.0) < 1e-9 for p in exact)


def _uf_components(n_ids, pairs):
    parent = list(range(n_ids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comp = {}
    for i in range(n_ids):
        comp.setdefault(find(i), []).append(i)
    return {min(v): set(v) for v in comp.values() if len(v) > 1}


def test_pair_components_random_graph_vs_union_find(spark):
    import random

    from ocr_obsidian_spark.operators.dedup import pair_components

    rng = random.Random(17)
    n = 400
    pairs = {tuple(sorted(rng.sample(range(n), 2))) for _ in range(180)}
    df = spark.createDataFrame(sorted(pairs), "id_a long, id_b long")
    exp = _uf_components(n, pairs)
    exp_label = {node: m for m, members in exp.items() for node in members}
    in_pairs = {x for p in pairs for x in p}
    # BOTH strategies — the small-graph driver union-find (default gate)
    # and the distributed pointer doubling — must agree with the naive
    # union-find exactly; only nodes appearing in pairs are labeled
    for gate in (2_000_000, None):
        got = {
            r["node"]: r["component"]
            for r in pair_components(df, driver_max_edges=gate).collect()
        }
        assert set(got) == in_pairs
        for node in in_pairs:
            assert got[node] == exp_label.get(node, node), (gate, node)


def test_pair_components_long_chain_converges(spark):
    """A 1000-node path — exactly what over-cap bucket chaining emits for a
    duplicate mega-cluster — must resolve to ONE component within the
    default round budget (pointer doubling: O(log diameter))."""
    from ocr_obsidian_spark.operators.dedup import pair_components

    df = spark.createDataFrame([(i, i + 1) for i in range(999)], "id_a long, id_b long")
    rows = pair_components(df, driver_max_edges=None).collect()
    assert len(rows) == 1000
    assert {r["component"] for r in rows} == {0}


def test_drop_near_duplicates_end_to_end(docs):
    from ocr_obsidian_spark.operators.dedup import drop_near_duplicates

    cands = minhash_lsh_candidate_pairs(docs)
    verified = ngram_jaccard_pairs(docs, threshold=0.95, candidate_pairs=cands)
    kept = drop_near_duplicates(docs, verified)
    # the 10 exact copies (ids 100000+) vanish; min-id originals survive
    assert kept.filter((F.col("doc_id") >= 100000) & (F.col("doc_id") < 200000)).count() == 0
    assert kept.filter(F.col("doc_id") < 10).count() == 10


def test_simhash_stability_and_near_dup(docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    for d in list(sh):
        if d >= 100000 and d < 200000:
            assert sh[d] == sh[d - 100000]  # identical text → identical simhash
    pairs = simhash_candidate_pairs(docs)
    ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    exact = [(a, b) for (a, b) in ham if a < 10 and b == a + 100000]
    assert len(exact) == 10 and all(ham[p] == 0 for p in exact)


def test_pair_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint='reliable' (cluster setting: survives executor loss)
    converges to the same components as the local default, and refuses to
    run without a configured checkpoint dir."""
    import pytest as _pytest

    from ocr_obsidian_spark.operators.dedup import pair_components

    df = spark.createDataFrame([(i, i + 1) for i in range(200)], "id_a long, id_b long")
    sc = spark.sparkContext
    prev = sc.getCheckpointDir()
    if prev is None:
        with _pytest.raises(ValueError, match="setCheckpointDir"):
            pair_components(df, checkpoint="reliable").collect()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    got = {r["node"]: r["component"]
           for r in pair_components(
               df, checkpoint="reliable", driver_max_edges=None
           ).collect()}
    assert set(got.values()) == {0} and len(got) == 201
    with _pytest.raises(ValueError, match="unknown checkpoint mode"):
        pair_components(df, checkpoint="bogus")


def test_simhash64_md5_matches_python_oracle(spark):
    """The oracle-reachable md5 simhash twin reproduces a from-scratch
    python implementation (token md5 -> 64 sign-sum votes -> 32-bit
    fingerprint halves) — independent of both Spark and DuckDB."""
    import hashlib
    import re

    from ocr_obsidian_spark.operators.dedup import simhash64_md5

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # identical
        (2, "Multiple   spaces\tand CASE differences HERE"),
        (3, None),
        (4, "single"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: (r["sim_hi"], r["sim_lo"])
           for r in simhash64_md5(df).collect()}

    def oracle(text):
        norm = re.sub(r"\s+", " ", (text or "")).strip().lower()
        votes = [0] * 64
        for tok in norm.split(" "):
            hx = hashlib.md5(tok.encode()).hexdigest()
            hhi, hlo = int(hx[:8], 16), int(hx[8:16], 16)
            for i in range(64):
                src, s = (hlo, i) if i < 32 else (hhi, i - 32)
                votes[i] += 1 if (src >> s) & 1 else -1
        lo = sum(1 << i for i in range(32) if votes[i] > 0)
        hi = sum(1 << (i - 32) for i in range(32, 64) if votes[i] > 0)
        return hi, lo

    for doc_id, text in texts:
        assert got[doc_id] == oracle(text), doc_id
    assert got[0] == got[1]


def test_family_min_chunked_path_identical(spark, monkeypatch):
    """Force the hash-family chunking (normally only heavy-tailed batches
    trip it) and require bit-identical signatures."""
    from ocr_obsidian_spark.operators import dedup as D

    rows = [(i, f"some repeated words plus unique token{i} tail {i%5}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {r["doc_id"]: list(r["minhash"]) for r in D.minhash_signatures(df).collect()}
    monkeypatch.setattr(D, "_MINHASH_CHUNK_ELEMS", 8)  # h_chunk = 1
    chunked = {r["doc_id"]: list(r["minhash"]) for r in D.minhash_signatures(df).collect()}
    assert chunked == base


def test_incremental_exact_dedup_against_corpus(spark):
    from ocr_obsidian_spark.operators.dedup import drop_exact_duplicates_against

    existing = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = existing.limit(5).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text"
    ).unionByName(
        spark.createDataFrame(
            [(8000, "a genuinely new document qq"), (8001, None)],
            "doc_id long, text string",
        )
    )
    kept = drop_exact_duplicates_against(new, existing)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # copies vanish; the fresh row survives; the NULL-text row survives
    # only if no existing doc normalizes to '' (it collides with empties)
    assert 8000 in ids and not any(i >= 9000 for i in ids)
    n_empty = existing.filter(
        F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))) == ""
    ).count()
    assert (8001 in ids) == (n_empty == 0)


def test_incremental_near_matches_equal_exhaustive(spark):
    """The driver oracle's core assumption: on the snapshot population,
    LSH-restricted verified matches == the exhaustive cross-corpus
    Jaccard >= 0.95 set (J >= 0.95 band-miss probability <= 6.4e-12)."""
    import itertools

    from ocr_obsidian_spark.operators.dedup import (
        near_duplicate_matches_against,
        word_shingles,
    )

    existing = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    copies = existing.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = existing.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zyxtoken")).alias("text"),
    )
    new = copies.unionByName(near)
    got = {
        (r["new_id"], r["existing_id"])
        for r in near_duplicate_matches_against(new, existing).collect()
    }
    nsh = {r["doc_id"]: set(r["s"]) for r in
           new.select("doc_id", word_shingles().alias("s")).collect()}
    esh = {r["doc_id"]: set(r["s"]) for r in
           existing.select("doc_id", word_shingles().alias("s")).collect()}
    exp = set()
    for a, b in itertools.product(nsh, esh):
        inter = len(nsh[a] & esh[b])
        j = inter / (len(nsh[a]) + len(esh[b]) - inter)
        if j >= 0.95:
            exp.add((a, b))
    assert got == exp
    # every exact copy matched its origin
    assert all((100000 + i, i) in got for i in range(10))


def test_incremental_drop_near_keeps_unmatched(spark):
    from ocr_obsidian_spark.operators.dedup import drop_near_duplicates_against

    existing = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    new = existing.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    ).unionByName(
        spark.createDataFrame(
            [(8000, "completely unrelated fresh content qq zz")],
            "doc_id long, text string",
        )
    )
    kept = drop_near_duplicates_against(new, existing)
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == {8000}


def test_incremental_near_existing_bucket_cap_is_deterministic(spark):
    """A mega-bucket on the EXISTING side (many identical boilerplate
    rows) caps to the lowest ids — matches against the capped members
    still surface, and the result is stable across partitioning."""
    from ocr_obsidian_spark.operators.dedup import near_duplicate_matches_against

    text = "the same boilerplate page body repeated verbatim many times"
    existing = spark.createDataFrame(
        [(i, text) for i in range(30)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(9000, text)], "doc_id long, text string")
    got = {
        (r["new_id"], r["existing_id"])
        for r in near_duplicate_matches_against(
            new, existing, max_bucket_size=5
        ).collect()
    }
    assert got == {(9000, i) for i in range(5)}


def test_drop_near_duplicates_keep_best_quality(spark):
    """keep_by picks the best-scoring member per component (id-asc
    ties), not the min id; docs outside any pair always survive."""
    from pyspark.sql import functions as F

    from ocr_obsidian_spark.operators.dedup import drop_near_duplicates

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (10, 0.1)],
        ["doc_id", "q"],
    )
    # component {1,2,3} via chained pairs; {4} unpaired would not appear;
    # 10 is in no pair
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    kept = {
        r["doc_id"]
        for r in drop_near_duplicates(docs, pairs, keep_by="q").collect()
    }
    # best q in {1,2,3} is 0.9 shared by 2 and 3 -> id-asc keeps 2
    assert kept == {2, 4, 10}
    # ascending mode keeps the LOWEST score (cost-like metric)
    kept_asc = {
        r["doc_id"]
        for r in drop_near_duplicates(
            docs, pairs, keep_by="q", keep_desc=False
        ).collect()
    }
    assert kept_asc == {1, 4, 10}
    # default rule unchanged: min id
    kept_min = {
        r["doc_id"] for r in drop_near_duplicates(docs, pairs).collect()
    }
    assert kept_min == {1, 4, 10}
    # determinism across parallelism
    kept16 = {
        r["doc_id"]
        for r in drop_near_duplicates(
            docs.repartition(16), pairs.repartition(16), keep_by="q"
        ).collect()
    }
    assert kept16 == kept


def test_drop_near_duplicates_null_score_never_wins(spark):
    """NULL scores sort last in BOTH directions — an unscored member
    must not become the component representative."""
    from ocr_obsidian_spark.operators.dedup import drop_near_duplicates

    docs = spark.createDataFrame(
        [(1, None), (2, 0.5)], "doc_id long, q double"
    )
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    for desc in (True, False):
        kept = {
            r["doc_id"]
            for r in drop_near_duplicates(
                docs, pairs, keep_by="q", keep_desc=desc
            ).collect()
        }
        assert kept == {2}, desc


def test_word_shingles_zip_form_equals_per_index_form(docs):
    """Round-6 internals pin: the zip-of-k-slices shingle construction is
    bit-equal to the original per-index array_join(slice(toks, i+1, k))
    form — for the default k=3 AND a wide k=8 — on the real corpus
    (including the short-doc fallback branch)."""
    from ocr_obsidian_spark.operators.dedup import normalized_text, word_shingles

    def per_index(text_col, k):
        toks = F.split(normalized_text(text_col), " ")
        n = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        return F.when(
            n >= k,
            F.array_distinct(
                F.transform(
                    idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
                )
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))

    for k in (3, 8):
        both = docs.select(
            word_shingles("text", k).alias("new"),
            per_index("text", k).alias("old"),
        )
        assert both.filter(F.col("new") != F.col("old")).count() == 0


def test_simhash64_map_only_equals_explode_groupby_form(docs):
    """Round-6 internals pin: the map-only Arrow sign-sum simhash64
    reproduces the original explode + 64-conditional-sum groupBy
    formulation bit-for-bit (same per-occurrence xxhash64 votes, same
    sum>0 bit rule, same bit-63 two's-complement wrap)."""
    from ocr_obsidian_spark.operators.dedup import normalized_text, simhash64

    toks = docs.select(
        F.col("doc_id"),
        F.explode(F.split(normalized_text("text"), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b_{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for i in range(64):
        bit = (
            F.when(F.col(f"b_{i}") > 0, F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    ref = {
        r["doc_id"]: r["simhash"]
        for r in agg.select("doc_id", fp.alias("simhash")).collect()
    }
    got = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert got == ref
