"""Deduplication operators for large-scale training-data pipelines.

Five families, all shuffle-aware and Python-free on the hot path:

- exact: hash-groupBy on normalized content (keep min id),
- MinHash + LSH: shingle -> 64 deterministic min-hashes -> bands ->
  bucket join -> candidate pairs (optionally verified with exact
  Jaccard). Banding keeps the candidate join linear in near-dup count
  instead of O(n²),
- SimHash: 64-bit signature from token hashes, near-dup via banded
  Hamming join,
- n-gram Jaccard: exact similarity via inverted-index self-join
  (token -> docs) — the verification oracle for the sketch variants,
- embedding cosine: see operators/similarity.py (near-dup = cos >= τ).

Determinism: every hash is xxhash64 with a fixed literal seed — reruns
produce identical signatures (required for resumable pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1 as the universal-hash modulus: shingle hashes are
# first reduced mod p so a_i * h + b_i stays far inside int64 (ANSI mode
# overflow-checks multiplication). Parameters (a_i, b_i) derive
# deterministically from the permutation index.
_MERSENNE = (1 << 31) - 1


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Keep one row (min id) per distinct content. ONE hash-groupBy:
    ``min_by`` carries the winning row's struct through the aggregation,
    so there is no join back and the (expensive) normalize+sha256 key
    expression is evaluated once per row. Map-side partial aggregation
    collapses duplicate groups before the shuffle — shuffle bytes are
    bounded by DISTINCT contents, and a heavy duplicate group (the skew
    case for dedup) shrinks to one row per map task. (Previous plan:
    groupBy(min id) + semi-join back — two exchanges, key computed on
    both sides.)"""
    key = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")) if normalize else F.col(text_col)
    keyed = df.withColumn("_k", F.sha2(key, 256))
    kept = keyed.groupBy("_k").agg(
        F.min_by(F.struct(*df.columns), F.col(id_col)).alias("_row")
    )
    return kept.select("_row.*")


def word_tokens(text_col):
    """Lowercased word-token array expression."""
    c = text_col if not isinstance(text_col, str) else F.col(text_col)
    return F.regexp_extract_all(F.lower(c), F.lit(r"[a-z0-9]+"), 0)


def gram_hash(c, hash_mode: str = "xxhash64"):
    """Long-valued deterministic hash of a string column.

    - "xxhash64" (seed 42): the production path — fastest JVM hash.
    - "md5_52": first 13 hex chars of md5 as a 52-bit integer. Slower,
      but bit-for-bit reproducible in DuckDB (hex digits -> powers of 16
      stay exact in doubles below 2^53), which makes every sketch built
      on it oracle-checkable at the gate.
    """
    if hash_mode == "xxhash64":
        return F.xxhash64(c, F.lit(42))
    if hash_mode == "md5_52":
        return F.conv(F.substring(F.md5(c), 1, 13), 16, 10).cast("long")
    raise ValueError(f"unknown hash_mode: {hash_mode}")


def shingle_hashes_from_words(words_col, n: int = 3, hash_mode: str = "xxhash64"):
    """Word n-gram shingle hashes from a pre-materialized token-array
    COLUMN.

    ``words_col`` must be a column reference, not a computed expression:
    expressions referenced inside a higher-order-function lambda are
    re-evaluated once per output element (O(L^2) for a regex tokenizer),
    while a column reference is evaluated once per row."""
    cnt = F.size(words_col) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: gram_hash(F.concat_ws(" ", F.slice(words_col, i, n)), hash_mode),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """DataFrame[id, h] — one row per distinct shingle hash per doc,
    with the tokenizer staged as a column (see shingle_hashes_from_words)."""
    staged = df.select(F.col(id_col), word_tokens(text_col).alias("_w"))
    return staged.select(
        F.col(id_col),
        F.explode(shingle_hashes_from_words(F.col("_w"), n, hash_mode)).alias("h"),
    )


def word_shingles(text_col, n: int = 3):
    """Array of word n-gram shingle hashes as a single expression.

    Kept for expression-level composition on short strings; hot paths
    use _exploded_shingles (staged tokenizer) instead."""
    return shingle_hashes_from_words(word_tokens(text_col), n)


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 64, shingle_n: int = 3, hash_mode: str = "xxhash64",
    plan: str = "narrow",
) -> DataFrame:
    """DataFrame[id, sig array<long>] — per-doc MinHash signature.

    Two physical plans computing IDENTICAL values (same permutation
    arithmetic over the same distinct-shingle set):

    - "narrow" (default): the shingle array is already materialized
      per row (array_distinct), so each permutation's min is a per-row
      ``aggregate`` fold — a pure projection, ZERO shuffle. At 100 TB
      this is the difference between a map-only stage and shuffling
      |docs|x|shingles| exploded rows into a 64-aggregate hash agg.
    - "grouped": the former explode + groupBy formulation (map-side
      combinable mins). Kept for A/B measurement and for callers whose
      upstream already produces exploded (id, shingle) rows.

    ``id_col`` is assumed unique per document: the narrow plan emits one
    row per input row, while the grouped plan silently merged duplicate
    ids (min over the union of their shingles). Docs with fewer than
    ``shingle_n`` tokens are dropped by both plans."""
    if plan == "narrow":
        # A map-only plan is only as parallel as its input split count —
        # right-size with one round-robin exchange of (id, text) rows,
        # still far cheaper than the grouped plan's exchange of one row
        # per SHINGLE. No-op when the scan is already wide enough.
        from ..session import right_size

        df = right_size(df)
        staged = df.select(F.col(id_col), word_tokens(text_col).alias("_w"))
        staged = staged.select(
            id_col,
            F.transform(
                shingle_hashes_from_words(F.col("_w"), shingle_n, hash_mode),
                lambda h: F.pmod(h, F.lit(_MERSENNE)),
            ).alias("_sh"),
        )
        # one fold over the shingle array per row: acc[i] holds the
        # running min of permutation i ((2i+1)*h + b_i mod p); a single
        # aggregate keeps codegen to one loop instead of 64 independent
        # array_min(transform(...)) scans of the same array
        bs = F.array(*[
            F.lit((1_000_003 * (i + 1) + 17) % _MERSENNE)
            for i in range(num_hashes)
        ])
        idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
        sig = F.aggregate(
            F.col("_sh"),
            F.array_repeat(F.lit(_MERSENNE).cast("long"), num_hashes),
            lambda acc, h: F.zip_with(
                acc,
                idx,
                lambda m, i: F.least(
                    m,
                    F.pmod(
                        (2 * i + 1).cast("long") * h + F.element_at(bs, i + 1),
                        F.lit(_MERSENNE),
                    ),
                ),
            ),
        )
        # Drop empty-shingle docs with explode-of-0/1-array, NOT a filter:
        # a Filter whose predicate embeds _sh would be alias-substituted
        # and pushed below the right-sizing exchange above, evaluating the
        # whole tokenize+shingle expression a second time — in the
        # pre-exchange stage, i.e. at the SCAN's parallelism (serial on a
        # single-split file: measured +2.3s on the sf0.1 candidates
        # query). Generate is not a predicate, so it stays put: raw
        # (id, text) rows cross the exchange, and tokenize+fold run once,
        # post-shuffle, at full parallelism.
        return staged.select(
            F.col(id_col),
            F.explode(
                F.when(F.size("_sh") >= 1, F.array(sig)).otherwise(
                    F.array().cast("array<array<long>>")
                )
            ).alias("sig"),
        )
    if plan != "grouped":
        raise ValueError(f"unknown plan: {plan}")
    sh = _exploded_shingles(df, id_col, text_col, shingle_n, hash_mode)
    sh = sh.withColumn("h", F.pmod(F.col("h"), F.lit(_MERSENNE)))
    aggs = []
    for i in range(num_hashes):
        a = 2 * i + 1  # odd multiplier
        b = (1_000_003 * (i + 1) + 17) % _MERSENNE
        perm = F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_MERSENNE))
        aggs.append(F.min(perm).alias(f"mh_{i}"))
    sigs = sh.groupBy(id_col).agg(*aggs)
    return sigs.select(
        id_col, F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig")
    )


def _banded_pairs(
    banded: DataFrame, max_bucket: int | None, payload_col: str | None = None
) -> DataFrame:
    """Candidate pairs from a (_id, band, bh) bucket table.

    Buckets of size <= ``max_bucket`` emit all pairs (a < b). Oversized
    buckets — mass duplication: k near-identical docs would emit k² pairs
    on one task — instead emit a star (rep=min id, member): the pair
    *closure* under connected components is identical (every member links
    to the representative), but the row count is k, not k². Downstream
    clustering (graph/cc.py) recovers the same duplicate groups.

    ``payload_col``: optionally carry a NARROW per-id column (e.g. the
    64-bit simhash) through pair generation, emitted as ``_pa``/``_pb``.
    This lets a caller verify pairs without joining back to the
    signature table — which would re-evaluate the signature plan once
    per join side. Only worth it for scalar payloads: a wide payload
    (a full MinHash signature, an embedding) multiplied by the band
    explosion costs more in shuffle bytes than the verify join saves.
    """
    if max_bucket is None:
        pl = [F.col(payload_col).alias("_pa")] if payload_col else []
        pr = [F.col(payload_col).alias("_pb")] if payload_col else []
        l = banded.select(F.col("_id").alias("a"), "band", "bh", *pl)
        r = banded.select(F.col("_id").alias("b"), "band", "bh", *pr)
        out_cols = ["a", "b"] + (["_pa", "_pb"] if payload_col else [])
        return (
            l.join(r, ["band", "bh"])
            .filter(F.col("a") < F.col("b"))
            .select(*out_cols)
            .distinct()
        )
    # Single-consumption pipeline: ``banded`` is often an expensive
    # signature projection, and every plan branch that references it
    # re-evaluates it (a small/big self-join formulation was measured at
    # 3x the signature cost — exchange reuse does NOT survive AQE's
    # broadcast conversion of one join side). Instead: ONE window pass
    # tags each row with its bucket size + representative (linear per
    # bucket), then a SECOND window materializes the member list — for
    # small buckets only — and each row emits its own partners from that
    # array, so pair generation is a projection, not a join. Big-bucket
    # rows are routed to per-row singleton window keys (their member
    # list is never collected — a 10M-row degenerate bucket would
    # otherwise buffer 10M ids per partition) and emit the (rep, member)
    # star edge instead. The banded stream is computed once and flows
    # through exactly three exchanges: w1, w2, distinct.
    from pyspark.sql import Window

    # member unit: bare id, or (id, payload) struct — struct min orders
    # by _id first (unique per bucket), so min(struct) is the struct of
    # the min id and the representative's payload rides along for free
    unit = (
        F.struct(F.col("_id").alias("_id"), F.col(payload_col).alias("_p"))
        if payload_col
        else F.col("_id")
    )
    w1 = Window.partitionBy("band", "bh")
    tagged = banded.select(
        unit.alias("_u"), "band", "bh",
        (F.count(F.lit(1)).over(w1) <= max_bucket).alias("_small"),
        F.min(unit).over(w1).alias("_rep"),
    )
    uid = (lambda u: u["_id"]) if payload_col else (lambda u: u)
    tagged = tagged.select(
        "_u", "band", "_small", "_rep",
        # window-2 key: the true bucket for small rows; a per-row
        # singleton for big rows (the _small flag in the partition key
        # makes a big row's hash colliding with a small bucket's bh
        # harmless — they can never share a window partition)
        F.when(F.col("_small"), F.col("bh"))
        .otherwise(F.xxhash64(uid(F.col("_u"))))
        .alias("_wk"),
    )
    w2 = Window.partitionBy("band", "_small", "_wk")
    # window expressions can't be referenced inside a higher-order
    # lambda / explode projection — stage the member array as a column
    tagged = tagged.withColumn("_members", F.collect_list("_u").over(w2))
    partners = F.when(
        F.col("_small"),
        F.filter(
            F.col("_members"), lambda x: uid(x) > uid(F.col("_u"))
        ),
    ).otherwise(
        # star edge toward the bucket minimum; the rep row itself emits
        # nothing (slice(.., 1, 0) is the typed empty array)
        F.when(
            uid(F.col("_u")) != uid(F.col("_rep")), F.array(F.col("_u"))
        ).otherwise(F.slice(F.array(F.col("_u")), 1, 0))
    )
    ua = F.when(F.col("_small"), F.col("_u")).otherwise(F.col("_rep"))
    pairs = tagged.select(ua.alias("_ua"), F.explode(partners).alias("_ub"))
    if payload_col:
        return pairs.select(
            F.col("_ua._id").alias("a"), F.col("_ub._id").alias("b"),
            F.col("_ua._p").alias("_pa"), F.col("_ub._p").alias("_pb"),
        ).distinct()
    return pairs.select(
        F.col("_ua").alias("a"), F.col("_ub").alias("b")
    ).distinct()


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str = "doc_id",
    bands: int = 16, rows_per_band: int = 4,
    max_bucket: int | None = 1000,
    band_key: str = "hash",
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become a candidate pair.

    Output: DataFrame[a, b] with a < b, distinct. The self-join is on
    (band_idx, band_key). ``max_bucket`` defaults ON (1000): buckets
    above it switch to representative chaining (see _banded_pairs) — k
    rows instead of k² per degenerate bucket, same duplicate-group
    closure under connected components — so a naive caller at 100 TB
    never hits the quadratic path on a mass-duplicated corpus. Pass
    ``max_bucket=None`` to enumerate every in-bucket pair exhaustively
    (the contract the oracle gate queries and the verify pipeline's
    100%-recall equivalence assume).

    ``band_key``: "hash" re-hashes each band slice to a compact long
    (production); "string" joins the raw comma-separated slice values —
    byte-identical to a SQL twin's VARCHAR key, used by the oracle gate."""
    if band_key == "hash":
        bk = lambda i: F.xxhash64(
            F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band).cast("string"),
            F.lit(7),
        )
    elif band_key == "string":
        bk = lambda i: F.concat_ws(
            ",",
            F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band).cast(
                "array<string>"
            ),
        )
    else:
        raise ValueError(f"unknown band_key: {band_key}")
    banded = sigs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), bk(i).alias("bh"))
                for i in range(bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bh")
    return _banded_pairs(banded, max_bucket)


def estimate_jaccard(sigs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Signature-agreement Jaccard estimate for candidate pairs.

    Consumes ``sigs`` twice (one join per pair side). A full signature
    is too wide to ride through pair generation as a payload (512 B x
    the band explosion), so when ``sigs`` is a lazy computed plan rather
    than a table scan, persist or write it first — otherwise each join
    side re-evaluates the signature computation."""
    sa = sigs.select(F.col(id_col).alias("a"), F.col("sig").alias("_sa"))
    sb = sigs.select(F.col(id_col).alias("b"), F.col("sig").alias("_sb"))
    j = pairs.join(sa, "a").join(sb, "b")
    agree = F.size(F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda v: v))
    return j.select("a", "b", (agree / F.size("_sa")).alias("est_jaccard"))


def exact_jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    shingle_n: int = 3, threshold: float = 0.0,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard for ALL intersecting pairs via inverted-index
    self-join: explode shingles, join on shingle, count common, divide by
    union size. SQL-expressible — this is the oracle for the sketches.

    ``max_df`` is the stop-shingle cut, ON by default (1000): a shingle
    appearing in d documents emits d² join rows, so shingles with
    document frequency > max_df are dropped from BOTH the inverted index
    and the per-doc sizes (Jaccard over the effective vocabulary — the
    same guard shape as graph/edges.py max_entities_per_group). Pass
    ``max_df=None`` for the exact full-vocabulary oracle semantics (the
    gate queries do so explicitly)."""
    sh = _exploded_shingles(df, id_col, text_col, shingle_n)
    if max_df is not None:
        keep = sh.groupBy("h").agg(F.count(F.lit(1)).alias("_df")).filter(
            F.col("_df") <= max_df
        )
        sh = sh.join(keep.select("h"), "h", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col(id_col).alias("a"), "h")
    b = sh.select(F.col(id_col).alias("b"), "h")
    common = (
        a.join(b, "h")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    na = sizes.select(F.col(id_col).alias("a"), F.col("_n").alias("_na"))
    nb = sizes.select(F.col(id_col).alias("b"), F.col("_n").alias("_nb"))
    out = (
        common.join(na, "a")
        .join(nb, "b")
        .select(
            "a", "b",
            (F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common"))).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def verify_exact_jaccard(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    text_col: str = "text", shingle_n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard computed ONLY for the given candidate pairs —
    the verification stage of the candidate->verify dedup pipeline.

    Per-pair cost is array_intersect over the two docs' staged shingle
    arrays (JVM, no inverted-index blowup): work scales with
    |pairs| x doc length, the right shape when candidates are LSH-pruned.
    Output: (a, b, jaccard) for pairs at/above ``threshold``."""
    staged = df.select(F.col(id_col), word_tokens(text_col).alias("_w")).select(
        F.col(id_col),
        F.array_distinct(shingle_hashes_from_words(F.col("_w"), shingle_n)).alias("_sh"),
    )
    sa = staged.select(F.col(id_col).alias("a"), F.col("_sh").alias("_sa"))
    sb = staged.select(F.col(id_col).alias("b"), F.col("_sh").alias("_sb"))
    j = pairs.join(sa, "a").join(sb, "b")
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size("_sa") + F.size("_sb") - inter
    out = j.select(
        "a", "b", (inter / F.greatest(union, F.lit(1))).alias("jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold)


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """SimHash: sign of per-bit vote sums over token hashes.

    Output: DataFrame[id, simhash long]. Explode + ``bits`` algebraic
    sums — map-side combinable. Pass hash_mode="md5_52" with bits=52 for
    the DuckDB-reproducible oracle variant."""
    from ..session import right_size

    # tokenize+explode is a pre-shuffle map: right-size a narrow scan so
    # it doesn't run on one task (no-op on a wide scan)
    df = right_size(df)
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+"), 0)
            )
        ).alias("w"),
    ).withColumn("h", gram_hash(F.col("w"), hash_mode))
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{i}")
        for i in range(bits)
    ]
    per_doc = toks.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(bits):
        # shiftleft wraps at bit 63 inside the JVM (no Python-int overflow)
        bit = F.when(
            F.col(f"v_{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return per_doc.select(id_col, sig.alias("simhash"))


def simhash_near_dups(
    sims: DataFrame, id_col: str = "doc_id", max_hamming: int = 3,
    chunks: int = 4, max_bucket: int | None = 1000, bits: int = 64,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming via the
    pigeonhole band join: split the 64-bit signature into ``chunks``
    16-bit pieces; any pair within distance < chunks shares a piece.

    ``max_bucket`` defaults ON (1000): oversized piece buckets switch to
    representative chaining (see _banded_pairs) — mass-duplicate corpora
    emit k rows per bucket instead of k², so the default path is safe at
    100 TB. With the cap, pair enumeration is no longer exhaustive for
    *near* (non-identical) duplicates in a capped bucket — the
    duplicate-group closure under connected components is preserved for
    identical-signature members (hamming 0 to the representative), which
    is exactly the mass-duplication case the cap exists for. Pass
    ``max_bucket=None`` for exhaustive pigeonhole completeness (the
    oracle-gate contract)."""
    width = bits // chunks
    mask = (1 << width) - 1
    # the 64-bit signature rides through pair generation as a payload:
    # joining it back per side would re-evaluate the simhash plan
    # (tokenize + 64-vote groupBy) once per join side — the same
    # multi-consumption cost _banded_pairs' capped path eliminates
    banded = sims.select(
        F.col(id_col).alias("_id"),
        F.col("simhash").alias("_h"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("simhash", i * width).bitwiseAND(F.lit(mask)).alias("bh"),
                )
                for i in range(chunks)
            ])
        ).alias("cp"),
    ).select("_id", "_h", "cp.band", "cp.bh")
    pairs = _banded_pairs(banded, max_bucket, payload_col="_h")
    ham = F.bit_count(F.col("_pa").bitwiseXOR(F.col("_pb")))
    return (
        pairs.select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
