"""Deduplication operators for training-data pipelines.

Not present in the reference (it is a log agent) — these are the large-scale
corpus-dedup primitives a 100 TB training-data pipeline needs, built
Spark-first:

* ``exact_dedup``        — hash-groupBy on a normalization key; one shuffle.
* ``ngram_jaccard_pairs``— n-gram Jaccard candidate pairs via the distributed
                           formulation: explode distinct grams → self-join on
                           gram → per-pair intersection counts → Jaccard from
                           |A|+|B|-∩. No pairwise cartesian anywhere.
* ``charset_jaccard_pairs`` — character-set Jaccard within a blocking key
                           (small-block pairwise; SQL-oracle-friendly).
* ``minhash_signatures`` / ``minhash_lsh_pairs`` — MinHash + banded LSH:
                           shingle → K hash-mins → B bands → bucket join.
                           Candidate pairs verified with exact Jaccard.
* ``simhash64``          — 64-bit SimHash over word tokens (Arrow-batched
                           numpy UDF — bit-parallel majority vote).
* ``embedding_dup_pairs``— cosine ≥ τ near-dup pairs over embeddings with
                           band-bucketed blocking (brute-force within block).

Scale notes: every pair-generating operator blocks/buckets BEFORE joining —
the joins are equi-joins on (gram | band-hash | block key), so Spark shuffles
by key and AQE handles skew; nothing materializes O(N²).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _maybe_persist_buckets(buckets: DataFrame, persist: bool) -> DataFrame:
    """Opt-in bucket-table persistence for the LSH pair generators.

    The banded/blocked bucket table embeds the signature computation — the
    most expensive stage of each LSH family — and is consumed by THREE
    sub-plans: the hot-bucket count, and both sides of the bucket self-join.
    AQE's exchange reuse shares the shuffle between the two self-join sides
    at sort-merge scale, but the hot-count aggregate and any broadcast-sized
    side recompute the signatures from the raw corpus (measured: 6 parquet
    scans of the doc table in the final adaptive plan at small SF).

    At 100 TB that recomputation dominates, while the bucket table itself is
    tiny relative to the corpus (|docs|·bands rows of 3 longs — no text).
    ``persist=True`` caches it MEMORY_AND_DISK so signatures are computed
    exactly once. Default False: at bench scale (≤ sf0.1) the A/B measured
    persist WORSE (9.3 s vs 3.3 s warm — materialization blocks pipelining
    and the recompute hits the OS page cache), and the driver's oracle gate
    compares plans without caches. Callers own the unpersist (the returned
    pair frame exposes the handle as ``._lsh_buckets``, same contract as
    semdedup's ``._semdedup_cached``)."""
    if not persist:
        return buckets
    from pyspark import StorageLevel

    return buckets.persist(StorageLevel.MEMORY_AND_DISK)


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def normalize_text(col: Column) -> Column:
    """Canonical dedup key: lowercase, collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", keep: str = "min"
) -> DataFrame:
    """Exact dedup on normalized text: one row per duplicate class with the
    representative id and the class size. ``keep``: min|max id wins."""
    agg_id = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.groupBy(normalize_text(F.col(text_col)).alias("dup_key"))
        .agg(agg_id.alias("rep_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (distributed, no cartesian)
# ---------------------------------------------------------------------------

def word_ngrams(col: Column, n: int = 2) -> Column:
    """Distinct word n-grams of a text column (native expressions).

    Built as n-1 ``zip_with`` concats over shifted slices — ~6× faster than
    the transform(sequence)+slice+array_join form it replaces (that one
    re-slices the words array per output gram; zip_with is one linear pass)."""
    words = F.split(normalize_text(col), " ", -1)
    cnt = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    grams = F.slice(words, 1, cnt)
    for k in range(2, n + 1):
        grams = F.zip_with(
            grams, F.slice(words, k, cnt), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 2,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_grams: int | None = None,
) -> DataFrame:
    """Jaccard-similar pairs via gram-inverted-index join:

    (id, gram) distinct → self-join on gram (id_a < id_b) → ∩ counts →
    J = ∩ / (|A| + |B| - ∩) ≥ threshold.

    This is the shuffle-by-gram formulation that scales: hot grams MUST be
    capped with ``max_doc_grams`` at corpus scale (drop grams whose document
    frequency exceeds it — stop-gram removal); a single hot gram otherwise
    makes the gram self-join quadratic in its document frequency (round-1's
    41s scale-killer). The cap prunes the gram SETS themselves — sizes and
    intersections are both computed on the pruned sets, so Jaccard stays a
    true Jaccard over the reduced vocabulary (and a DuckDB oracle can mirror
    it with the same df-filter CTE)."""
    grams = df.select(
        F.col(id_col).alias("id"), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    if max_doc_grams is not None:
        hot = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df_cnt")).filter(
            F.col("df_cnt") > max_doc_grams
        )
        grams = grams.join(F.broadcast(hot.select("gram")), "gram", "left_anti")
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def charset_jaccard_pairs(
    df: DataFrame,
    block_col: str = "lang",
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character-set Jaccard for pairs sharing a blocking key (cheap blocked
    pairwise — use only when blocks are small; the SQL-oracle-friendly twin of
    ``ngram_jaccard_pairs``)."""
    chars = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.array_distinct(F.split(F.col(text_col), "", -1)).alias("cs"),
    )
    a, b = chars.alias("a"), chars.alias("b")
    jac = F.size(F.array_intersect(F.col("a.cs"), F.col("b.cs"))) / F.size(
        F.array_union(F.col("a.cs"), F.col("b.cs"))
    )
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _verify_candidates_jaccard(
    df: DataFrame,
    cands: DataFrame,
    n: int,
    text_col: str,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs via the COUNTING
    formulation: candidates join the exploded gram table twice (hash joins,
    whole-stage codegen) and intersection sizes come from a groupBy — ~5×
    faster than per-pair array_intersect/array_union (interpreted array ops
    over ~50-element arrays). Pairs with zero shared grams drop out, which a
    positive threshold filters anyway."""
    grams = df.select(
        F.col(id_col).alias("id"), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    ga = grams.select(F.col("id").alias("id_a"), "gram")
    gb = grams.select(F.col("id").alias("id_b"), "gram")
    inter = (
        cands.join(ga, "id_a")
        .join(gb, ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """K-permutation MinHash signature per doc: sig[j] = min over grams of
    xxhash64(gram, seed=j).

    Explode-then-aggregate form: grams explode once, the K hash columns are
    CODEGEN'd projections, and one groupBy(id) takes the K mins — ~6× faster
    than K array_min(transform(...)) HOFs per row (interpreted, and each
    re-evaluates the gram build). Docs with zero grams drop out (no sig → no
    pairs), identical final pair-set semantics."""
    grams = df.select(
        F.col(id_col).alias("id"), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    aggs = [F.min(F.xxhash64(F.col("gram"), F.lit(j))).alias(f"h{j}") for j in range(num_hashes)]
    return (
        grams.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"))
    )


def _md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative long — the ORACLE-REPLAYABLE
    hash family (DuckDB: ('0x'||substr(md5(x),1,15))::bigint). ~3× slower than
    xxhash64; used by the *_md5 variants whose whole point is that the DuckDB
    twin reproduces every signature bit."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def minhash_signatures_md5(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signatures with the md5 family: sig[j] = min over grams of
    md5_long(gram || '#' || j). Explode+aggregate form (see
    minhash_signatures) — the K md5 columns stay inside whole-stage codegen."""
    grams = df.select(
        F.col(id_col).alias("id"), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    aggs = [
        F.min(_md5_long(F.concat(F.col("gram"), F.lit(f"#{j}")))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return (
        grams.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"))
    )


def minhash_lsh_pairs_md5(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    n: int = 2,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    persist_buckets: bool = False,
) -> DataFrame:
    """minhash_lsh_pairs with the md5 hash family — bit-for-bit replayable in
    DuckDB, so the ENTIRE LSH path (signatures, banding, candidates, verify)
    sits under the correctness gate instead of a rows-only check. Production
    uses the xxhash64 variant (faster); this one is the auditable twin.
    ``persist_buckets``: compute signatures once at 100 TB scale
    (_maybe_persist_buckets)."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures_md5(df, num_hashes, n, text_col, id_col)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _md5_long(
                            F.array_join(
                                F.transform(
                                    F.slice("sig", b * r + 1, r), lambda x: x.cast("string")
                                ),
                                ",",
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    banded = _cached_buckets = _maybe_persist_buckets(banded, persist_buckets)
    if max_bucket_size is not None:
        # stop-bucket cap: a (band, bucket) holding m docs yields m²/2 candidate
        # pairs — degenerate hot buckets (vocabulary-limited corpora, boilerplate)
        # make candidate volume quadratic. Truly similar pairs still collide in
        # their other, selective bands; the dropped-bucket list is broadcast.
        hot_b = banded.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("c")).filter(
            F.col("c") > max_bucket_size
        )
        banded = banded.join(F.broadcast(hot_b.select("band", "bh")), ["band", "bh"], "left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    out = _verify_candidates_jaccard(df, cands, n, text_col, id_col, threshold)
    if persist_buckets:
        out._lsh_buckets = _cached_buckets  # unpersist handle (see _maybe_persist_buckets)
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 2,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    persist_buckets: bool = False,
) -> DataFrame:
    """Banded-LSH candidate generation + exact-Jaccard verification.

    sig split into ``bands`` rows of ``num_hashes/bands``; docs colliding on
    (band_idx, band_hash) become candidates (shuffle by band-hash — no N²);
    candidates are verified with exact n-gram Jaccard and filtered at
    ``threshold``. Returns (id_a, id_b, jaccard). ``persist_buckets``:
    compute signatures once at 100 TB scale (_maybe_persist_buckets)."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, num_hashes, n, text_col, id_col)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("sig", b * r + 1, r), lambda x: x.cast("string")
                                ),
                                ",",
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    banded = _cached_buckets = _maybe_persist_buckets(banded, persist_buckets)
    if max_bucket_size is not None:
        # stop-bucket cap: a (band, bucket) holding m docs yields m²/2 candidate
        # pairs — degenerate hot buckets (vocabulary-limited corpora, boilerplate)
        # make candidate volume quadratic. Truly similar pairs still collide in
        # their other, selective bands; the dropped-bucket list is broadcast.
        hot_b = banded.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("c")).filter(
            F.col("c") > max_bucket_size
        )
        banded = banded.join(F.broadcast(hot_b.select("band", "bh")), ["band", "bh"], "left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    out = _verify_candidates_jaccard(df, cands, n, text_col, id_col, threshold)
    if persist_buckets:
        out._lsh_buckets = _cached_buckets  # unpersist handle (see _maybe_persist_buckets)
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_native(
    df: DataFrame, text_col: str, out: str, nbits: int, token_hash, id_cols: list[str]
) -> DataFrame:
    """SimHash signatures as a PURE Catalyst plan — no Python in the hot path:
    tokenize with split, explode, hash each token with a native expression
    (``token_hash``: Column→Column), then majority-vote the bits with ONE
    hash aggregate carrying nbits conditional sums.  Everything stays inside
    whole-stage codegen (a higher-order ``aggregate`` variant was 14× slower —
    HOFs are CodegenFallback and allocate a per-token array).  Map-side
    partial aggregation collapses the exploded token rows back to one row per
    doc BEFORE the shuffle, so wire volume is |docs| · (row + nbits longs) —
    the scale-correct shape that replaced a per-token ``hashlib`` Python loop
    (VERDICT r3 perf item #2).

    Tokenization mirrors Python ``text.lower().split()`` and the DuckDB oracle
    ``string_split_regex(trim(lower(text)), '\\s+')``: trim, lower, split on
    whitespace runs; empty/whitespace-only/null text → signature 0.

    Returns ``(*id_cols, out)`` only — the vote aggregate groups by the NARROW
    id key (``id_cols``, unique per row); grouping by the full row would
    re-hash the text per exploded token inside the hash aggregate, which
    measured 4–5× slower.  Callers join the signature back if they need it
    alongside other columns.
    """
    from functools import reduce as _reduce

    keep = list(id_cols)
    # array_remove drops the empty edge tokens regex-split leaves when the
    # text starts/ends with NON-SPACE whitespace: F.trim strips only 0x20, so
    # "\tword" split on \s+ is ["", "word"] and a whitespace-only "\t" text is
    # ["", ""] — each phantom "" token voted md5("")'s bits into the signature
    # (a "\t"-only doc got sig=md5("") instead of the documented 0; found by
    # the algorithmic differential vs Python text.lower().split()).
    toks = F.when(
        F.length(F.trim(F.col(text_col))) > 0,
        F.array_remove(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), ""),
    ).otherwise(F.array().cast("array<string>"))
    # Cap the vote at the packed counters' 21-bit field capacity: a >2M-token
    # doc would carry a bit's ones-count into its neighbor's field (silently
    # wrong signature). The signature of a pathological doc is computed over
    # its first 2^21-1 tokens — documented approximation, never corruption.
    toks = F.slice(toks, 1, (1 << 21) - 1)
    ex = df.select(*keep, F.explode_outer(toks).alias("_tok")).withColumn(
        # null-safe: the explode_outer row of an EMPTY token array must not
        # vote — xxhash64(null) is the seed (42), whose bits would win every
        # 2·ones > n=0 vote and yield signature 42 instead of the documented 0
        # (the md5 family hashes null to null and already skips it).
        "_h",
        F.when(F.col("_tok").isNotNull(), token_hash(F.col("_tok"))),
    )
    # Pack 3 bit-counters per long (21-bit fields, good to 2^21-1 ≈ 2M tokens
    # per doc): ⌈nbits/3⌉ sum buffers instead of nbits — 3× less codegen and
    # 3× fewer agg-buffer updates per token.
    FIELD = 21
    PER = 3
    npack = (nbits + PER - 1) // PER

    def _packed(p: int) -> F.Column:
        terms = []
        for j in range(PER):
            b = p * PER + j
            if b >= nbits:
                break
            one = F.shiftrightunsigned(F.col("_h"), b).bitwiseAND(F.lit(1)).cast("long")
            terms.append(F.shiftleft(one, j * FIELD) if j else one)
        return F.coalesce(F.sum(_reduce(lambda a, x: a + x, terms)), F.lit(0).cast("long"))

    g = ex.groupBy(*keep).agg(
        F.count("_tok").cast("long").alias("_n"),
        *[_packed(p).alias(f"_p{p}") for p in range(npack)],
    )
    # vote_b > 0  ⟺  2·ones_b > n_tok; disjoint powers OR-folded into the sig
    def _bit(b: int) -> F.Column:
        ones = F.shiftrightunsigned(F.col(f"_p{b // PER}"), (b % PER) * FIELD).bitwiseAND(
            F.lit((1 << FIELD) - 1)
        )
        val = (1 << b) if b < 63 else -(1 << 63)  # bit 63 is the long sign bit
        return F.when(ones * 2 > F.col("_n"), F.lit(val).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    sig = _reduce(lambda a, x: a.bitwiseOR(x), [_bit(b) for b in range(nbits)])
    return g.select(*keep, sig.alias(out))


def simhash60_md5(
    df: DataFrame, text_col: str = "text", out: str = "simhash", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash with md5-derived token hashes — the oracle-replayable
    family (DuckDB: ('0x'||substr(md5(tok),1,15))::bigint then per-bit
    majority votes via unnest(range(60))). Native md5 + conv, no UDF.
    Returns (id_col, out)."""
    return _simhash_native(
        df,
        text_col,
        out,
        60,
        lambda t: F.conv(F.substring(F.md5(F.encode(t, "utf-8")), 1, 15), 16, 10).cast("long"),
        [id_col],
    )


def _simhash_block_pairs(
    sh: DataFrame,
    nblocks: int,
    width: int,
    max_hamming: int,
    max_bucket_size: int | None,
    persist_buckets: bool = False,
) -> DataFrame:
    """Shared pigeonhole block-join for both simhash families: explode each
    signature into its ``nblocks`` (blk, bits) bucket keys, self-join on the
    bucket, hamming-filter.

    ``max_bucket_size`` is the stop-bucket cap (same design as minhash's —
    VERDICT r4 #3): a (blk, bits) bucket holding m docs yields m²/2 candidate
    rows in ONE join key, and a boilerplate-heavy corpus puts thousands of
    near-identical docs in the same block at 100 TB. Buckets above the cap
    are dropped via a broadcast anti-join BEFORE the self-join; pigeonhole
    still finds truly-close pairs through their other, more selective blocks
    (a pair within hamming ≤ k agrees on ≥ 1 of k+1 blocks — dropping one
    shared bucket only loses the pair if EVERY agreeing block is degenerate,
    i.e. the docs are corpus-scale boilerplate, exactly what exact/minhash
    dedup upstream removes first)."""
    blocked = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bits"),
                    )
                    for b in range(nblocks)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.blk").alias("blk"), F.col("bb.bits").alias("bits"))
    blocked = _cached_buckets = _maybe_persist_buckets(blocked, persist_buckets)
    if max_bucket_size is not None:
        hot = (
            blocked.groupBy("blk", "bits")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > max_bucket_size)
        )
        blocked = blocked.join(
            F.broadcast(hot.select("blk", "bits")), ["blk", "bits"], "left_anti"
        )
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    out = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    if persist_buckets:
        out._lsh_buckets = _cached_buckets  # unpersist handle (see _maybe_persist_buckets)
    return out


def simhash_dup_pairs_md5(
    df: DataFrame,
    max_hamming: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    persist_buckets: bool = False,
) -> DataFrame:
    """simhash_dup_pairs with the md5 family over 60 bits — every stage
    (token hashes, bit votes, pigeonhole blocks, hamming filter) has an exact
    DuckDB twin, putting the whole SimHash path under the correctness gate.
    Pigeonhole completeness holds: k+1 blocks over the low (k+1)·⌊60/(k+1)⌋
    bits — ≤k differing bits leave ≥1 block untouched. ``max_bucket_size``
    caps degenerate hot buckets (see _simhash_block_pairs)."""
    nblocks = max_hamming + 1
    width = 60 // nblocks
    sh = simhash60_md5(df.select(F.col(id_col).alias("id"), text_col), text_col, id_col="id")
    return _simhash_block_pairs(sh, nblocks, width, max_hamming, max_bucket_size, persist_buckets)


def simhash64(
    df: DataFrame, text_col: str = "text", out: str = "simhash", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash, fast production family: native xxhash64 token hashes
    (seed 42, deterministic across executors) — same codegen explode-agg plan
    as the md5 twin. Replaced the FNV-1a-in-Python pandas UDF.
    Returns (id_col, out)."""
    return _simhash_native(df, text_col, out, 64, lambda t: F.xxhash64(t), [id_col])


def simhash_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    persist_buckets: bool = False,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ k via the 4-block pigeonhole
    trick: split 64 bits into k+1 blocks — any pair within distance k agrees
    on ≥1 block, so blocks are the LSH bucket key (one equi-join, no N²).
    ``max_bucket_size`` caps degenerate hot buckets (_simhash_block_pairs)."""
    nblocks = max_hamming + 1
    width = 64 // nblocks
    sh = simhash64(df.select(F.col(id_col).alias("id"), text_col), text_col, id_col="id")
    return _simhash_block_pairs(sh, nblocks, width, max_hamming, max_bucket_size, persist_buckets)


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0).cast("double"), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    return dot / (norm(a) * norm(b))


def embedding_dup_pairs_exact(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_chunk: int = 1024,
    n_chunks: int | None = None,
) -> DataFrame:
    """EXACT all-pairs cosine ≥ τ via distributed chunked GEMM — the scalable
    replacement for the O(N²) BroadcastNestedLoopJoin form (round-1's
    scale-killer).

    Vectors are hash-assigned to ``n_chunks`` chunks; each of the
    n_chunks·(n_chunks+1)/2 chunk-pair tasks is a shuffle key, and within a
    task an Arrow-batched ``applyInPandas`` does one numpy (BLAS) matmul of
    the two normalized chunk matrices. Work is still inherently O(N²) flops
    (exactness at arbitrary τ requires it) but:

    * the plan has NO nested-loop join — tasks shuffle by (ti, tj) and run
      embarrassingly parallel across executors;
    * per-pair cost is a fused SIMD matmul, ~100× cheaper than the per-pair
      interpreted HOF fold it replaces;
    * communication is N·n_chunks rows (each vector is sent to the n_chunks
      tasks that need it) — the standard distributed-GEMM replication factor.

    For corpora where O(N²) flops is unaffordable, use
    ``embedding_dup_pairs_lsh`` (approximate, truly sub-quadratic).
    ``n_chunks=None`` sizes chunks to ``target_chunk`` rows from a
    COLUMN-PRUNED count (count(*) over a parquet scan reads footer row-group
    counts, not data pages — cheap, but still a job over every split; at
    10^9+ vectors pass ``n_chunks`` explicitly from catalog stats and skip
    the extra stage entirely)."""
    import math

    import pandas as pd  # noqa: F811

    if n_chunks is None:
        # select(lit(1)) guarantees the scan is column-pruned to zero data
        # columns whatever projections sit on df
        n_chunks = max(1, math.ceil(df.select(F.lit(1)).count() / target_chunk))
    id_type = dict(df.dtypes)[id_col]
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_chunks)).cast("int").alias("ck"),
    )
    # each row fans out to every task that touches its chunk: (min(ck,o), max(ck,o))
    tasks = F.transform(
        F.sequence(F.lit(0), F.lit(n_chunks - 1)),
        lambda o: F.struct(
            F.least(F.col("ck"), o).cast("int").alias("ti"),
            F.greatest(F.col("ck"), o).cast("int").alias("tj"),
        ),
    )
    repl = v.select("id", "v", "ck", F.explode(tasks).alias("t")).select(
        "id", "v", "ck", F.col("t.ti").alias("ti"), F.col("t.tj").alias("tj")
    )
    out_schema = f"id_a {id_type}, id_b {id_type}, cos double"

    def compute(key, pdf: pd.DataFrame) -> pd.DataFrame:
        i, j = key
        A = pdf[pdf.ck == i]
        B = pdf[pdf.ck == j] if j != i else A
        if len(A) == 0 or len(B) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        Ma = np.stack(A["v"].values)
        Mb = Ma if j == i else np.stack(B["v"].values)
        Na = Ma / np.linalg.norm(Ma, axis=1, keepdims=True)
        Nb = Na if j == i else Mb / np.linalg.norm(Mb, axis=1, keepdims=True)
        # round at 4 digits, NOT 6: the oracle (DuckDB list_cosine_similarity)
        # sums in a different order than BLAS; the ~1e-15 float64 divergence
        # must be far inside the rounding quantum or a boundary value flips
        # the gate hash nondeterministically. Threshold compares the ROUNDED
        # value on both sides for the same reason.
        C = np.round(Na @ Nb.T, 4)
        ida = A["id"].values
        idb = B["id"].values
        mask = C >= threshold
        # orient as id_a < id_b (one task owns each pair; i==j → upper triangle)
        lo = np.minimum(ida[:, None], idb[None, :])
        hi = np.maximum(ida[:, None], idb[None, :])
        mask &= lo < hi
        if i == j:
            mask = np.triu(mask, 1)
        ii, jj = np.nonzero(mask)
        return pd.DataFrame({"id_a": lo[ii, jj], "id_b": hi[ii, jj], "cos": C[ii, jj]})

    return repl.groupBy("ti", "tj").applyInPandas(compute, out_schema)


def hyperplane_planes(dim: int, bands: int, planes_per_band: int, seed: int = 7) -> "np.ndarray":
    """Deterministic random-hyperplane set, shape (bands, planes_per_band, dim)."""
    return np.random.RandomState(seed).standard_normal((bands, planes_per_band, dim))


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    bands: int = 8,
    planes_per_band: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) sign-bit LSH rows: bucket = Σ_j [v·p_bj ≥ 0]·2^j.

    This is the bucket generator round 1 lacked — it feeds ``block_col``-style
    blocking for embedding near-dup and ANN. One Arrow-batched numpy matmul
    per batch ((N,dim) @ (dim, B·H)) — a native-expression fold was tried
    first but Catalyst spends seconds compiling the B·H·dim-literal tree and
    interprets the HOFs per element. A DuckDB oracle mirrors the buckets with
    the same plane literals via ``list_dot_product`` (hyperplane_bucket_sql);
    a sign flip between numpy and DuckDB needs |dot| ≲ 1e-13, measure-zero
    for random planes."""
    planes = hyperplane_planes(dim, bands, planes_per_band, seed)
    flat = planes.reshape(bands * planes_per_band, dim).T.copy()  # (dim, B*H)
    weights = (1 << np.arange(planes_per_band, dtype=np.int64))

    @pandas_udf("array<long>")
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.values).astype(np.float64)  # (n, dim)
        bits = (M @ flat) >= 0  # (n, B*H)
        bits = bits.reshape(len(M), bands, planes_per_band)
        buckets = (bits * weights).sum(axis=2)  # (n, B)
        return pd.Series(list(buckets))

    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(buckets_udf(F.col(vec_col).cast("array<double>"))).alias(
                "band", "bucket"
            ),
        )
    )


def hyperplane_bucket_sql(
    dim: int, bands: int, planes_per_band: int, seed: int = 7, vec_expr: str = "v"
) -> list[str]:
    """DuckDB bucket expressions (one per band) matching hyperplane_buckets —
    identical plane literals via float repr round-trip, ``list_dot_product``
    for the projection. Sign flips between the two engines would need
    |dot| ≲ 1e-13, measure-zero for random planes."""
    planes = hyperplane_planes(dim, bands, planes_per_band, seed)
    exprs = []
    for b in range(bands):
        bits = []
        for j in range(planes_per_band):
            lit = "[" + ", ".join(repr(float(x)) for x in planes[b, j]) + "]"
            bits.append(
                f"(case when list_dot_product({vec_expr}, {lit}) >= 0 then {1 << j} else 0 end)"
            )
        exprs.append(" + ".join(bits))
    return exprs


def embedding_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.85,
    bands: int = 8,
    planes_per_band: int = 8,
    seed: int = 7,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """APPROXIMATE cosine ≥ τ pairs, truly sub-quadratic: candidates collide in
    ≥1 hyperplane band (equi-join on (band, bucket) — shuffle by bucket, no
    N² anywhere), then exact-cosine verified.

    Recall is the banded-LSH curve 1-(1-p^H)^B with p = 1-θ/π: for this
    default (H=8, B=8) recall ≈ 0.998 at cos 0.95, ≈ 0.91 at cos 0.9,
    ≈ 0.45 at cos 0.8, and collapses below cos ~0.7 — LSH is the NEAR-DUP
    regime tool; use embedding_dup_pairs_exact when τ is low. Random-pair
    collision is 2^-H per band, so candidate volume ≈ B·N²/2^H only for the
    tiny cosine-~0 mass, i.e. ~linear for clustered corpora."""
    bk = hyperplane_buckets(df, dim, bands, planes_per_band, seed, id_col, vec_col)
    a, b = bk.alias("a"), bk.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    va = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    vb = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    cos = cosine(F.col("v_a"), F.col("v_b"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(cos, 4))  # 4 digits: see chunked-GEMM note
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Cosine ≥ τ near-duplicate pairs. With ``block_col`` (e.g. a coarse
    cluster/LSH bucket from hyperplane_buckets) the join is blocked; otherwise
    brute-force pairwise — only for small corpora or as the verification stage
    after ANN blocking. Prefer embedding_dup_pairs_exact (chunked GEMM) or
    embedding_dup_pairs_lsh (sub-quadratic) at scale."""
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    a, b = v.alias("a"), v.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    cos = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), F.round(cos, 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


# ---------------------------------------------------------------------------
# duplicate-cluster resolution (connected components over dup pairs)
# ---------------------------------------------------------------------------

def _ckpt_severed(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint that also SEVERS the checkpoint's origin chain.

    Spark 4.x ``Dataset.localCheckpoint`` keeps a reference to the origin
    Dataset so it can rewrite stats/constraints onto the new ``LogicalRDD``
    (``LogicalRDD.fromDataset`` → ``rewriteStatsAndConstraints``). In an
    iterative loop that is a planning-time landmine: whenever a later query
    SELF-JOINS a checkpointed frame, ``DeduplicateRelations`` must copy one
    side, the copy re-runs the stats/constraints rewrite, and that rewrite
    re-walks the origin plan — whose leaves are the previous round's
    checkpoints, recursively. Measured on a 128-node toy graph: per-round
    wall time ×2.5 every round (100 s/round by round 20, all of it in
    ``SizeInBytesOnlyStatsPlanVisitor`` on an otherwise idle JVM), while
    plan strings, row counts and RDD lineage all stay constant — the growth
    is invisible to every normal diagnostic. Plain hook-style loops never
    trip it (no self-join ⇒ no dedup copy), which is why round 4's
    hook-only loop was flat.

    The fix: rebuild the DataFrame from the checkpointed ``JavaRDD[Row]``
    via the public ``SparkSession.createDataFrame(JavaRDD[Row], schema)``
    overload — fresh attribute ids, no origin stats/constraints, zero
    Python-side data movement (Row↔InternalRow conversion stays JVM-side).
    """
    spark = df.sparkSession
    jdf = df._jdf.localCheckpoint(True)
    severed = spark._jsparkSession.createDataFrame(jdf.toJavaRDD(), jdf.schema())
    return DataFrame(severed, spark)


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components over an undirected duplicate-pair graph; every
    node's label converges to the smallest id reachable from it. Returns
    (node, lab).

    Every pair generator in this module (ngram/minhash/simhash/embedding)
    emits PAIRS; turning pairs into dedup decisions needs the transitive
    closure — A~B and B~C must collapse into one cluster with one canonical
    doc, which no single equi-join can express.

    Algorithm: alternating LARGE-STAR / SMALL-STAR contraction (Kiveris,
    Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
    MapReduce and Beyond", SoCC'14). Each round rewrites the EDGE LIST so
    components contract toward a star centered at their minimum id:

    * large-star: per node u with m = min(Γ(u) ∪ {u}), re-point every
      strictly-larger neighbor at m — emit (v, m) for v ∈ Γ(u), v > u;
    * small-star: per node u with m = min of its not-larger neighbors,
      re-point u and those neighbors at m.

    Convergence is O(log² n) rounds by their Theorem 2 (a fixpoint iff every
    component is a min-centered star) — measured: a shuffled 1024-node chain
    converges in 8 rounds, real near-dup graphs (shallow stars/chains) in
    2-4. The previous min-label-propagation loop was O(diameter) — a silent
    wrong answer for any component deeper than ``max_iter`` (a fresh-seed
    differential caught a 63-node chain of depth 31 at the 30-round cap).
    Convergence failure RAISES instead of returning stale labels — this
    feeds destructive dedup, wrong is worse than loud.

    Scale shape: every step is keyed on node ids over the edge list only —
    groupBy-min (map-side combined), equi-join edges⋈mins (AQE skew-join
    handles hot star centers), pair-keyed distinct. Edge count never exceeds
    m + n (each directed dart contributes ≤1 output edge, plus one (m, u)
    per node in small-star), so a round costs a constant number of shuffles
    of the current edge list; nothing is ever materialized per node-pair.
    Each half-round ends in an eager origin-severed localCheckpoint (see
    ``_ckpt_severed`` — without the severing, Catalyst re-walks the origin
    chain of every checkpoint on each round's self-referencing plans and
    planning time grows exponentially). The convergence probe is two
    exact ``exceptAll … limit(1)`` scalar counts (edge set equality), not a
    collect of data rows.
    """
    e0 = edges.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    nodes = _ckpt_severed(
        e0.select(F.col("a").alias("node"))
        .union(e0.select(F.col("b").alias("node")))
        .distinct()
    )
    ed = _ckpt_severed(
        e0.where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    converged = False
    for _ in range(max_iter):
        # ---- large-star: emit (v, min(Γ(u) ∪ u)) for v ∈ Γ(u), v > u
        und = ed.union(ed.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = (
            und.groupBy("a")
            .agg(F.min("b").alias("mn"))
            .select("a", F.least("a", "mn").alias("m"))
        )
        ls = _ckpt_severed(
            und.where(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(
                F.least(F.col("b"), F.col("m")).alias("a"),
                F.greatest(F.col("b"), F.col("m")).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # ---- small-star: per u, m = min of not-larger neighbors; re-point
        # u and those neighbors at m
        und2 = ls.union(ls.select(F.col("b").alias("a"), F.col("a").alias("b")))
        s = und2.where(F.col("b") < F.col("a"))
        mins2 = s.groupBy("a").agg(F.min("b").alias("m"))
        ss = _ckpt_severed(
            s.join(mins2, "a")
            .select(
                F.least(F.col("b"), F.col("m")).alias("x"),
                F.greatest(F.col("b"), F.col("m")).alias("y"),
            )
            .union(mins2.select(F.col("m").alias("x"), F.col("a").alias("y")))
            .where(F.col("x") != F.col("y"))
            .select(F.col("x").alias("a"), F.col("y").alias("b"))
            .distinct()
        )
        changed = (
            ss.exceptAll(ed).limit(1).count() + ed.exceptAll(ss).limit(1).count()
        )
        ed = ss
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(star-contraction is O(log² n) — this graph is implausibly "
            "adversarial; investigate before trusting any dedup built on it)"
        )
    # at the fixpoint every component is a star centered at its min id
    return nodes.join(
        ed.select(F.col("b").alias("node"), F.col("a").alias("ctr")), "node", "left"
    ).select("node", F.coalesce(F.col("ctr"), F.col("node")).alias("lab"))


def dup_clusters(
    edges: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 30
) -> DataFrame:
    """Resolve dup pairs into clusters: one row per clustered document with
    its canonical representative (the cluster's min id) and the cluster size.
    Rows: (doc_id, rep_doc_id, cluster_size); every emitted doc belongs to a
    cluster of ≥2 (isolated docs never appear in the edge list)."""
    labels = connected_components(edges, id_a=id_a, id_b=id_b, max_iter=max_iter)
    sizes = labels.groupBy("lab").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "lab").select(
        F.col("node").alias("doc_id"),
        F.col("lab").alias("rep_doc_id"),
        "cluster_size",
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 10,
) -> DataFrame:
    """Sub-document (paragraph-granularity) exact dedup: split each document
    into fixed ``seg_words``-word segments, keep only each segment's globally
    FIRST occurrence (ordered by (doc_id, position) — deterministic), and
    rebuild the cleaned text from the surviving segments in original order.
    Rows: (doc_id, n_segs, n_kept, text_clean) — docs whose every segment is
    seen earlier elsewhere come back with n_kept=0 and empty text (drop-ready).

    This is the RefinedWeb/CCNet-style boilerplate killer: repeated headers,
    navboxes and license blocks die without nuking whole documents. (The
    corpora there segment on newlines; the synthetic table is single-line, so
    a fixed word span stands in — the operator takes any segmentation that
    yields (pos, segment) rows.)

    Scale shape: explode → ONE hash agg keyed by segment text (min(struct(id,
    pos)) — map-side combinable, no window over the corpus) → equi-join back
    on (segment, id, pos) → ONE hash agg keyed by doc to reassemble.
    array_sort on the per-doc kept list is per-row work bounded by doc size."""
    words = F.split(normalize_text(F.col(text_col)), " ", -1)
    n_segs = F.ceil(F.size(words) / F.lit(seg_words)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - F.lit(1)),
        lambda i: F.array_join(F.slice(words, i * seg_words + 1, seg_words), " "),
    )
    seg_rows = df.select(
        F.col(id_col), F.posexplode(segs).alias("pos", "seg")
    )
    first = seg_rows.groupBy("seg").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first")
    )
    kept = (
        seg_rows.join(first, "seg")
        .filter(
            (F.col(id_col) == F.col(f"_first.{id_col}"))
            & (F.col("pos") == F.col("_first.pos"))
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("text_clean"),
        )
    )
    base = df.select(F.col(id_col), n_segs.alias("n_segs"))
    return (
        base.join(kept, id_col, "left")
        .select(
            id_col,
            "n_segs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def line_dedup(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """WITHIN-document repeated-line removal (Gopher's intra-doc twin of
    ``segment_dedup``'s corpus-global keep-first): drop every line after its
    first occurrence inside the SAME document, rebuild the text in original
    line order. Kills per-page repeated nav blocks / pagination artifacts
    without touching other documents' copies (that's segment_dedup's job).
    Rows: (id_col, n_lines, n_removed, content_clean).

    Scale shape: ZERO shuffle — the dedup scope is one row, so the whole
    operator is a codegen projection: ``filter(lines, (x, i) ->
    array_position(lines, x) == i+1)`` keeps exactly the first occurrence of
    each line. Per-row cost is O(lines² · line_len) via array_position —
    bounded by document size, the right trade at corpus scale vs ANY
    exploded/shuffled form (for pathological million-line docs, explode +
    min(pos) per (id, line) + reassemble is the fallback; same result)."""
    import re as _re

    # F.split takes a REGEX but array_join emits the literal — escape so a
    # metachar separator ('.', '|') splits on the same literal it rejoins with
    lines = F.split(F.col(content_col), _re.escape(sep), -1)
    kept = F.filter(
        lines, lambda x, i: F.array_position(lines, x) == (i + F.lit(1)).cast("bigint")
    )
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        (F.size(lines) - F.size(kept)).alias("n_removed"),
        F.array_join(kept, sep).alias("content_clean"),
    )


# ---------------------------------------------------------------------------
# streaming dedup
# ---------------------------------------------------------------------------

_WINNOW_POSCAP = 1_000_000  # max gram positions per doc the key packing holds
_WINNOW_HMOD = 1 << 40  # fingerprint hash space (2^40 · 10^6 fits int64)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """MOSS-style winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every
    word ``k``-gram, slide a window of ``w`` consecutive hashes, keep each
    window's minimum (rightmost on ties) — the classic position-robust LOCAL
    fingerprint set. Guarantees a shared fingerprint for any shared run of
    ≥ w+k-1 words, unlike fixed-offset segmenting (``segment_dedup``) which an
    inserted word defeats, and unlike MinHash which fingerprints the whole
    document, not regions. Rows: distinct (doc_id, fp, fp_pos).

    Determinism/oracle: the md5-family hash (mod 2^40) and the tiebreak are
    packed into ONE bigint key = h·10^6 + (10^6−1−pos), so window ``min`` —
    identical semantics in Spark and DuckDB — selects min-hash-then-rightmost
    with no argmin/struct comparators involved.

    Scale shape: posexplode → one w-row sliding window per doc partition
    (partitions are single documents — bounded, never corpus-wide) → distinct.
    Docs shorter than w grams keep their global minimum (one fingerprint),
    per the winnowing paper's boundary convention."""
    words = F.split(normalize_text(F.col(text_col)), " ", -1)
    cnt = F.greatest(F.size(words) - F.lit(k - 1), F.lit(0))
    grams = F.slice(words, 1, cnt)
    for j in range(2, k + 1):
        grams = F.zip_with(
            grams, F.slice(words, j, cnt), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    g = df.select(F.col(id_col), F.posexplode(grams).alias("pos", "gram"))
    h = _md5_long(F.col("gram")) % F.lit(_WINNOW_HMOD)
    key = h * F.lit(_WINNOW_POSCAP) + (F.lit(_WINNOW_POSCAP - 1) - F.col("pos"))
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(w - 1), 0)
    part = Window.partitionBy(id_col)
    sel = g.select(
        F.col(id_col),
        F.col("pos"),
        F.min(key).over(win).alias("skey"),
        F.max("pos").over(part).alias("maxpos"),
    ).filter((F.col("pos") >= w - 1) | (F.col("pos") == F.col("maxpos")))
    # integer `div`, NOT `/`: skey reaches ~2^60 and a double round-trip
    # (plain division) loses bits above 2^53
    return sel.select(
        F.col(id_col),
        F.expr(f"skey div {_WINNOW_POSCAP}").alias("fp"),
        (F.lit(_WINNOW_POSCAP - 1) - F.col("skey") % F.lit(_WINNOW_POSCAP)).alias("fp_pos"),
    ).distinct()


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_fp_docs: int = 50,
) -> DataFrame:
    """Partial-overlap candidate pairs: documents sharing ≥ ``min_shared``
    distinct winnowing fingerprints, with the shared count. The inverted
    fingerprint index joins on fp like the n-gram index; fingerprints in more
    than ``max_fp_docs`` documents are boilerplate and are dropped via a
    broadcast anti-join BEFORE the self-join (the same stop-gram treatment as
    ``ngram_jaccard_pairs`` — at web scale a viral footer fingerprint would
    otherwise emit a quadratic bucket)."""
    fps = winnow_fingerprints(df, text_col, id_col, k, w).select(id_col, "fp").distinct()
    hot = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).filter(
        F.col("_df") > max_fp_docs
    ).select("fp")
    cold = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = cold.alias("a")
    b = cold.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def incremental_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    within_batch: bool = True,
) -> DataFrame:
    """Incremental ingest dedup: drop new documents whose normalized text
    already exists in the accepted corpus, then (optionally) dedup the
    surviving batch against itself (keep min id). This is THE production
    dedup shape at 100 TB — each ingest joins only ``new × corpus-keys``,
    never re-deduping the whole corpus, and the corpus side can be a
    pre-computed key table (one column, ~2% the corpus bytes).

    Scale shape: corpus keys reduce to a distinct hash column (one map-side
    combined agg); the check is a left-anti equi-join on the key — when the
    new batch is small relative to the corpus, Spark builds the hash side
    from the BATCH, so the corpus streams through unbuffered. No window."""
    key = F.md5(normalize_text(F.col(text_col)).cast("binary"))
    corpus_keys = corpus_df.select(key.alias("dup_key")).distinct()
    fresh = new_df.withColumn("dup_key", key).join(
        corpus_keys, "dup_key", "left_anti"
    )
    if within_batch:
        # null text ⇒ null dup_key: the equi-join below would silently drop
        # those rows (null never equi-matches) — route them around the join
        # untouched; there is nothing to dedup a null payload against.
        nulls = fresh.filter(F.col("dup_key").isNull())
        keyed = fresh.filter(F.col("dup_key").isNotNull())
        reps = keyed.groupBy("dup_key").agg(F.min(id_col).alias("_rep"))
        keyed = keyed.join(reps, "dup_key").filter(F.col(id_col) == F.col("_rep")).drop("_rep")
        fresh = keyed.unionByName(nulls)
    return fresh


def stream_exact_dedup(
    df: "DataFrame",
    time_col: str = "event_time",
    watermark: str = "1 hour",
    key_cols: list[str] | None = None,
    text_col: str = "text",
) -> "DataFrame":
    """Streaming exact dedup: drop rows whose normalized-text key (or explicit
    ``key_cols``) was already seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps dedup state BOUNDED — keys older
    than the watermark are evicted, which is the only way streaming dedup
    survives an unbounded corpus (the batch twin, exact_dedup, keeps the whole
    key space because a batch is finite). At-least-once semantics across
    restarts: the streaming checkpoint replays the source offsets and the
    state store restores seen-keys."""
    keyed = df
    if key_cols is None:
        keyed = df.withColumn("__dedup_key__", normalize_text(F.col(text_col)))
        key_cols = ["__dedup_key__"]
    out = keyed.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(key_cols)
    return out.drop("__dedup_key__") if "__dedup_key__" in out.columns else out


def _bloom_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k deterministic md5-derived bit positions in [0, m_bits) for a key.
    Position i hashes md5(f"{i}:" + key) — engine-portable (any SQL dialect
    with md5 replays it bit-for-bit)."""
    return [
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 15), 16, 10)
        .cast("long")
        % m_bits
        for i in range(k)
    ]


def bloom_bitmap(
    corpus_df: DataFrame,
    text_col: str = "text",
    m_bits: int = 16384,
    k: int = 3,
) -> DataFrame:
    """Build a packed Bloom-filter bitmap over the corpus's normalized-text
    keys as a DataFrame of (word_idx, mask) rows — ≤ ceil(m/63) rows total
    REGARDLESS of corpus size, so the membership side always broadcasts.
    Bits pack 63 per bigint word (bit 63 untouched — keeps every mask
    non-negative, dodging engine-specific sign-bit shift behavior).

    This is the 100 TB incremental-ingest primitive ``incremental_dedup``'s
    distinct-key table grows linearly with: the bitmap is O(m) forever (e.g.
    2^33 bits ≈ 128 M words ≈ 1 GiB for 10^9 keys at ~2% FP with k=3), at
    the price of a deterministic false-positive rate — the classic
    dedup-at-ingest tradeoff (maybe-dup rows go to the exact checker;
    definitely-new rows skip it)."""
    key = F.md5(normalize_text(F.col(text_col)).cast("binary"))
    pos = F.explode(F.array(*_bloom_positions(key, m_bits, k))).alias("pos")
    return (
        corpus_df.select(pos)
        .select(
            (F.col("pos") / 63).cast("long").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))").alias("bitval"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bitval").alias("mask"))
    )


def bloom_membership(
    batch_df: DataFrame,
    bitmap_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 16384,
    k: int = 3,
    out: str = "maybe_dup",
) -> DataFrame:
    """Probe a ``bloom_bitmap`` with a new ingest batch: a row is
    ``maybe_dup`` iff ALL k of its key's bit positions are set (Bloom
    semantics — false positives possible at the designed rate, false
    negatives impossible). Rows: batch columns + maybe_dup.

    Scale shape: the batch explodes to k rows each, joins the BROADCAST
    bitmap on word_idx (the bitmap is ≤ m/63 rows by construction), and one
    map-side-combined min() agg per doc ANDs the k probes back together — the
    corpus itself is never touched."""
    key = F.md5(normalize_text(F.col(text_col)).cast("binary"))
    probes = batch_df.select(
        F.col(id_col),
        F.explode(F.array(*_bloom_positions(key, m_bits, k))).alias("pos"),
    ).select(
        id_col,
        (F.col("pos") / 63).cast("long").alias("word_idx"),
        (F.col("pos") % 63).cast("int").alias("bit"),
    )
    hit = (
        probes.join(F.broadcast(bitmap_df), "word_idx", "left")
        .select(
            id_col,
            F.expr(
                "case when (shiftright(coalesce(mask, cast(0 as bigint)), bit) & 1) = 1"
                " then 1 else 0 end"
            ).alias("_hit"),
        )
        .groupBy(id_col)
        .agg(F.min("_hit").alias("_all_hit"))
    )
    return batch_df.join(hit, id_col).withColumn(
        out, F.col("_all_hit") == 1
    ).drop("_all_hit")


def cluster_survivors(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Keep-one policy over resolved dup clusters — the step an actual dedup
    pipeline runs after ``dup_clusters``: per cluster, the survivor is the
    highest-``score_col`` member (ties: smallest id); every other member is
    marked ``is_drop``. Rows: (doc_id, rep_doc_id, survivor_doc_id,
    survivor_score, is_drop).

    Scale shape: two keyed hash aggs on the cluster label + two equi-joins on
    the label — all partial-aggregated map-side; no window (the classic
    ``row_number() over (partition by cluster order by score)`` form sorts
    every cluster; max-then-min-id does not)."""
    m = clusters.select(id_col, "rep_doc_id").join(
        docs.select(id_col, score_col), id_col
    )
    best = m.groupBy("rep_doc_id").agg(F.max(score_col).alias("survivor_score"))
    surv = (
        m.join(best, "rep_doc_id")
        .filter(F.col(score_col) == F.col("survivor_score"))
        .groupBy("rep_doc_id")
        .agg(F.min(id_col).alias("survivor_doc_id"))
    )
    return (
        m.join(best, "rep_doc_id")
        .join(surv, "rep_doc_id")
        .select(
            id_col,
            "rep_doc_id",
            "survivor_doc_id",
            F.col("survivor_score").cast("long").alias("survivor_score"),
            (F.col(id_col) != F.col("survivor_doc_id")).alias("is_drop"),
        )
    )


def semdedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 1,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup via k-means clustering of
    embeddings + within-cluster cosine pruning — near-duplicates in MEANING
    (paraphrases, templated rewrites) that MinHash/SimHash token methods
    can't see. Keep-lowest-id within each semantic duplicate set.

    Deterministic spherical k-means: centroids initialize from the k
    lowest-id vectors, ``iters`` Lloyd rounds (assign → mean → renormalize),
    similarities rounded at 9 for tie-stable argmax (ties break to the
    lowest centroid id), centroid components rounded at 9 so a SQL oracle
    replays the float math across engines. Then, within each final cluster,
    a vector is a duplicate iff some LOWER-id member has cosine ≥ τ
    (compared on the value rounded at 4 — see embedding_dup_pairs_exact's
    note on cross-engine FP-sum divergence).

    Rows out: ``(id, cluster, is_dup, max_earlier_cos)`` — max_earlier_cos
    is null for a cluster's lowest-id member.

    Scale shape: assignment is a broadcast crossJoin against k centroid rows
    (k rows — never a shuffle of the corpus); the recompute step aggregates
    k×dim cells map-side; the ONLY corpus shuffle is the final
    within-cluster self-join, which is the SemDeDup design point — clusters
    bound the pair blowup to Σ|C_i|², with k chosen ~√N (the paper uses
    50k clusters for LAION) so the expected cluster stays constant-sized.
    At 10^11 vectors the same plan holds with the k-row "broadcast" swapped
    for a bucketed centroid join; no Python in the iteration loop (the
    driver-side ``for`` builds ONE lazy plan).

    Persistence: the normalized-vector table is referenced 2·iters + 3 times,
    so by default it is ``.cache()``d; Spark offers no scope-bound unpersist
    for a lazy result, so the cached partitions live until the caller frees
    them — the handle is exposed as ``result._semdedup_cached`` (call
    ``.unpersist()`` once the returned plan has been materialized), or pass
    ``cache=False`` to recompute instead of caching (ADVICE r4: repeated
    calls otherwise accumulate executor storage for the session lifetime)."""
    v = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_e")
    )
    l2 = F.sqrt(F.aggregate("_e", F.lit(0.0), lambda a, x: a + x * x))
    v = v.select("_id", F.transform("_e", lambda x: x / l2).alias("_v"))
    if cache:
        v = v.cache()
    # init: k lowest ids via TakeOrdered (orderBy+limit — NOT a full sort);
    # the row_number window runs on the k-row result only
    cent = (
        v.orderBy("_id")
        .limit(k)
        .withColumn("_cid", (F.row_number().over(Window.orderBy("_id")) - 1).cast("int"))
        .select("_cid", F.col("_v").alias("_c"))
    )

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda ac, x: ac + x)

    def assign(cent_df):
        # zero-shuffle argmax: all k centroids ride in as ONE broadcast row
        # holding array<struct<cid,c>>; per-row argmin is array_min over a
        # transform (lexicographic struct min = best sim, ties -> lowest cid)
        cent_row = cent_df.agg(
            F.array_sort(F.collect_list(F.struct("_cid", "_c"))).alias("_cents")
        )
        best = F.array_min(
            F.transform(
                "_cents",
                lambda s: F.struct(
                    F.round(-dot(F.col("_v"), s["_c"]), 9).alias("d"),
                    s["_cid"].alias("cid"),
                ),
            )
        )
        return v.crossJoin(F.broadcast(cent_row)).select(
            "_id", "_v", best["cid"].alias("_cid")
        )

    for _ in range(iters):
        a = assign(cent)
        raw = (
            a.select("_cid", F.posexplode("_v").alias("_pos", "_val"))
            .groupBy("_cid", "_pos")
            .agg(F.round(F.avg("_val"), 9).alias("_m"))
        )
        lists = raw.groupBy("_cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_m"))), lambda s: s["_m"]
            ).alias("_cm")
        )
        cl2 = F.sqrt(F.aggregate("_cm", F.lit(0.0), lambda ac, x: ac + x * x))
        cent = lists.select("_cid", F.transform("_cm", lambda x: x / cl2).alias("_c"))

    final = assign(cent)
    a_lo = final.select(F.col("_id").alias("_id_a"), F.col("_v").alias("_va"), F.col("_cid").alias("_cid"))
    a_hi = final.select(F.col("_id").alias("_id_b"), F.col("_v").alias("_vb"), F.col("_cid").alias("_cid"))
    best = (
        a_lo.join(a_hi, "_cid")
        .filter(F.col("_id_a") < F.col("_id_b"))
        .groupBy("_id_b", "_cid")
        .agg(F.max(F.round(dot(F.col("_va"), F.col("_vb")), 4)).alias("max_earlier_cos"))
    )
    out = (
        final.join(best, (final["_id"] == best["_id_b"]) & (final["_cid"] == best["_cid"]), "left")
        .select(
            final["_id"].alias(id_col),
            final["_cid"].alias("cluster"),
            F.coalesce(F.col("max_earlier_cos") >= F.lit(tau), F.lit(False)).alias("is_dup"),
            "max_earlier_cos",
        )
    )
    if cache:
        out._semdedup_cached = v  # unpersist handle (see docstring)
    return out
