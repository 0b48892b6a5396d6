"""Text analysis + dedup operators, checked against pure-Python recomputation."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark.operators import dedup as D
from cryptowalletcommunitydetection_spark.operators import text as X

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog. It is a fine day."),
    (2, "The quick brown fox jumps over the lazy dog. It is a fine day."),  # exact dup of 1
    (3, "The quick brown fox jumps over the lazy dog! It is a fine day."),  # near dup
    (4, "Der Hund ist nicht mit der Katze und das ist gut so, ich sage es."),
    (5, "completely different content about spark dataframes and shuffles here"),
    (6, "x"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    kept = {r["doc_id"] for r in D.exact_dedup(docs).collect()}
    assert kept == {1, 3, 4, 5, 6}  # doc 2 collapses into 1 (min id wins)


def test_token_count_matches_python(spark, docs):
    rx = re.compile(X.TOKEN_RE)
    got = {r["doc_id"]: r["n"] for r in docs.select("doc_id", X.token_count("text").alias("n")).collect()}
    want = {i: len(rx.findall(t)) for i, t in DOCS}
    assert got == want


def test_detect_language(spark, docs):
    got = {r["doc_id"]: r["l"] for r in docs.select("doc_id", X.detect_language("text").alias("l")).collect()}
    assert got[1] == "en" and got[4] == "de" and got[6] == "und"


def test_quality_score_bounds(spark, docs):
    rows = docs.select(X.quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_winnowing_fingerprint_overlap(spark, docs):
    fp = X.fingerprint_winnow(docs)
    by_doc = {
        r["doc_id"]: set(r["fps"])
        for r in fp.groupBy("doc_id").agg(F.collect_set("fp_hash").alias("fps")).collect()
    }
    assert by_doc[1] == by_doc[2]  # identical docs -> identical fingerprints
    inter13 = len(by_doc[1] & by_doc[3]) / len(by_doc[1] | by_doc[3])
    inter15 = len(by_doc[1] & by_doc[5]) / len(by_doc[1] | by_doc[5])
    assert inter13 > 0.5 > inter15


def _py_shingles(text, n=3):
    words = re.findall(r"[a-z0-9]+", text.lower())
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def test_exact_jaccard_matches_python(spark, docs):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in D.exact_jaccard_pairs(docs).collect()
    }
    ids = [i for i, _ in DOCS]
    texts = dict(DOCS)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            a, b = _py_shingles(texts[i]), _py_shingles(texts[j])
            if not (a & b):
                assert (i, j) not in got
            else:
                want = len(a & b) / len(a | b)
                assert abs(got[(i, j)] - want) < 1e-12


def test_minhash_lsh_finds_near_dups(spark, docs):
    sigs = D.minhash_signatures(docs)
    cands = {(r["a"], r["b"]) for r in D.minhash_lsh_candidates(sigs).collect()}
    assert (1, 2) in cands  # exact dups always collide
    assert (1, 3) in cands  # near dup (high jaccard) collides with 16 bands
    est = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in D.estimate_jaccard(sigs, D.minhash_lsh_candidates(sigs)).collect()
    }
    assert est[(1, 2)] == 1.0


def test_simhash_near_dups(spark, docs):
    sims = D.simhash(docs)
    h = {r["doc_id"]: r["simhash"] for r in sims.collect()}
    assert h[1] == h[2]
    pairs = {(r["a"], r["b"]): r["hamming"] for r in D.simhash_near_dups(sims, max_hamming=10).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs
    assert (1, 5) not in pairs


def test_dedup_on_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    kept = D.exact_dedup(docs).count()
    assert 0 < kept <= n


def test_no_python_in_dedup_plans(spark, docs):
    for df in (
        D.exact_dedup(docs),
        D.minhash_signatures(docs),
        D.simhash(docs),
        D.exact_jaccard_pairs(docs),
        X.doc_stats(docs),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


# ---------------------------------------------------- scale guards (r2)

def _mass_dup_docs(spark, k=40):
    """k near-identical copies of one doc + a few distinct docs — the
    degenerate-bucket case (k² pair blowup without a guard)."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, base + f" v{i % 3}") for i in range(k)]
    rows += [(100 + i, f"completely different text number {i} with unique words "
              + " ".join(f"w{i}_{j}" for j in range(10))) for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _closure(pairs):
    """Connected-component closure of a pair list (pure-python union-find)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for x in list(parent):
        groups.setdefault(find(x), set()).add(x)
    return {frozenset(g | {r}) for r, g in groups.items() if len(g | {r}) > 1}


def test_minhash_bucket_cap_preserves_closure(spark):
    """Representative chaining in oversized buckets: far fewer pair rows,
    identical duplicate-group closure under connected components."""
    docs = _mass_dup_docs(spark)
    sigs = D.minhash_signatures(docs).cache()
    full = [(r["a"], r["b"]) for r in D.minhash_lsh_candidates(sigs, max_bucket=None).collect()]
    capped = [(r["a"], r["b"]) for r in D.minhash_lsh_candidates(sigs, max_bucket=8).collect()]
    assert len(capped) < len(full)  # the k² blowup is actually cut
    assert _closure(capped) == _closure(full)
    sigs.unpersist()


def test_simhash_bucket_cap_preserves_closure(spark):
    docs = _mass_dup_docs(spark)
    sims = D.simhash(docs).cache()
    full = [(r["a"], r["b"]) for r in D.simhash_near_dups(sims, max_bucket=None).collect()]
    capped = [(r["a"], r["b"]) for r in D.simhash_near_dups(sims, max_bucket=8).collect()]
    assert len(capped) < len(full)
    assert _closure(capped) == _closure(full)
    sims.unpersist()


def test_exact_jaccard_max_df_guard(spark):
    """The stop-shingle cut drops only ubiquitous shingles: high-jaccard
    (near-dup) pairs survive with their scores intact-or-higher, and the
    join's row budget shrinks."""
    docs = _mass_dup_docs(spark)
    full = {(r["a"], r["b"]): r["jaccard"]
            for r in D.exact_jaccard_pairs(docs, threshold=0.8).collect()}
    cut = {(r["a"], r["b"]): r["jaccard"]
           for r in D.exact_jaccard_pairs(docs, threshold=0.8, max_df=10).collect()}
    # the 40-copy group's shingles (df≈40) are cut -> those pairs drop out,
    # but distinct docs gain no spurious pairs
    assert set(cut) <= set(full)
    # and with a cap above the dup-group size nothing changes at all
    same = {(r["a"], r["b"]): r["jaccard"]
            for r in D.exact_jaccard_pairs(docs, threshold=0.8, max_df=1000).collect()}
    assert same == full


def test_simhash_capped_payload_values_match_join(spark):
    """The signatures carried through the capped pair pipeline (_pa/_pb,
    including the representative's payload from min(struct)) must yield
    the same hamming values as joining pairs back to the signature
    table."""
    docs = _mass_dup_docs(spark)
    sims = D.simhash(docs).cache()
    got = {(r["a"], r["b"]): r["hamming"]
           for r in D.simhash_near_dups(sims, max_bucket=8).collect()}
    hs = {r["doc_id"]: r["simhash"] for r in sims.collect()}
    for (a, b), ham in got.items():
        assert ham == bin(hs[a] ^ hs[b]).count("1"), (a, b)
    sims.unpersist()
