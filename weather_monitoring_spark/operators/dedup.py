"""Deduplication operators for large-scale document corpora.

Four families, each a composition of built-in DataFrame ops (no Python
UDFs — everything stays in whole-stage codegen):

- **exact**: group by content hash. One shuffle of (hash, id); at 100 TB
  hash first so the shuffle moves 16-byte digests, never documents.
- **n-gram Jaccard**: inverted-index similarity join — explode distinct
  shingles, self-join on shingle, count shared, Jaccard from set sizes.
  This is the scalable sparse formulation: cost is sum over shingles of
  (docs-per-shingle)^2, NOT O(n^2) over documents. Hot shingles should be
  dropped like stopwords at scale (df cutoff), a knob exposed here.
- **MinHash + LSH**: portable md5-based hash family (functions/text.py)
  -> K minhashes -> bands -> candidates share a band bucket. Probability
  of catching a pair with Jaccard j is 1-(1-j^r)^b — with K=12, r=3, b=4
  the planted >=0.9 near-dups are caught with p>0.999 while p99-background
  (~0.025) pairs are ~never banded together. The shuffle moves only
  (band_hash, doc_id) pairs.
- **SimHash**: 32-bit signature from per-token hash votes; near-dups are
  pairs within small Hamming distance. Signature build is one exploded
  aggregation; at 100 TB the pair search blocks on signature prefixes
  instead of the all-pairs join used at oracle scale.

All thresholds/constants are module-level so the DuckDB oracles
(plans/llm_queries.py) reference the same values.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import (
    h32_sql,
    minhash_sql,
    shingle_hashes_sql,
    shingles_expr,
    tokens_expr,
)

MINHASH_K = 12
LSH_BANDS = 4
LSH_ROWS = MINHASH_K // LSH_BANDS  # 3
SIMHASH_BITS = 32
JACCARD_THRESHOLD = 0.5
HAMMING_THRESHOLD = 3

#: Hot-shingle (document-frequency) cutoff for the inverted-index join:
#: a shingle present in more than max(MIN, ceil(FRAC * n_docs)) documents
#: is boilerplate, contributes ~nothing to near-dup evidence, and alone
#: generates df^2 join rows — dropped like a stopword BEFORE the join.
#: Jaccard is then computed over the filtered shingle universe on both
#: sides (sizes from the filtered sets), the standard formulation.
SHINGLE_DF_FRAC = 0.1
SHINGLE_DF_MIN = 20


def shingle_df_cutoff(n_docs: int) -> int:
    """Corpus-size-derived document-frequency cutoff for hot shingles."""
    return max(SHINGLE_DF_MIN, math.ceil(SHINGLE_DF_FRAC * n_docs))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: one surviving id per distinct text.

    Returns (fp, keeper_doc_id, n_copies). The min-id keeper rule makes
    survivor choice deterministic (plain ``dropDuplicates`` keeps an
    arbitrary row)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingles array) — shared front half of the fuzzy-dedup family."""
    return docs.withColumn("_tk", tokens_expr(text_col)).select(
        F.col(id_col), shingles_expr("_tk").alias("shingles")
    )


def _filtered_shingles(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_shingle_df: int | str | None,
) -> DataFrame:
    """Exploded (id, shingle) rows with the hot-shingle df cutoff applied.

    ``max_shingle_df``: ``"auto"`` derives the cutoff from the corpus size
    (shingle_df_cutoff), an int pins it, ``None`` disables the guard
    (oracle cross-checks only — never at scale)."""
    sh = (
        docs.withColumn("_tk", tokens_expr(text_col))
        .select(F.col(id_col).alias("id"), F.explode(shingles_expr("_tk")).alias("s"))
    )
    if max_shingle_df == "auto":
        # Lazy corpus-size-derived cutoff: the n_docs aggregate rides
        # inside the job as a broadcast 1-row frame instead of an eager
        # docs.count() action — at 100 TB that action is a second full
        # pass over the corpus before the real work starts. Same formula
        # as shingle_df_cutoff(); the oracle's `cut` CTE mirrors it.
        cut = docs.agg(
            F.greatest(
                F.lit(SHINGLE_DF_MIN).cast("long"),
                F.ceil(F.lit(SHINGLE_DF_FRAC) * F.count(F.lit(1))),
            ).alias("_cut")
        )
        hot = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .crossJoin(F.broadcast(cut))
            .filter(F.col("df") > F.col("_cut"))
        )
        sh = sh.join(F.broadcast(hot.select("s")), "s", "left_anti")
    elif max_shingle_df is not None:
        hot = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") > max_shingle_df
        )
        sh = sh.join(F.broadcast(hot.select("s")), "s", "left_anti")
    # Pin the exploded+filtered shingle table: every consumer joins it
    # against itself (or uses it twice — sizes + pairs), and recomputing
    # tokenize/shingle/explode per branch costs more than materializing
    # once. At 100 TB this is the persisted shingle-index table of a
    # production dedup pipeline.
    return sh.localCheckpoint(eager=False)


def _jaccard_from_shared(shared: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("shared") * F.lit(1.0) / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "shared", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | str | None = "auto",
) -> DataFrame:
    """Candidate near-duplicate pairs by exact 3-gram Jaccard, via the
    inverted-index join. Returns (id_a, id_b, shared, jaccard), id_a < id_b.

    The hot-shingle df cutoff (default corpus-derived, see
    shingle_df_cutoff) is the skew guard at scale — a shingle in 1M docs
    would alone generate 10^12 join rows. Per-doc set sizes are computed
    from the FILTERED shingle universe, so the Jaccard numerator and
    denominator agree (filtered-universe Jaccard; computing sizes before
    the filter would systematically underestimate)."""
    sh = _filtered_shingles(docs, id_col, text_col, max_shingle_df)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return _jaccard_from_shared(shared, sizes, threshold)


def ngram_jaccard_verify(
    docs: DataFrame,
    candidates: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | str | None = "auto",
) -> DataFrame:
    """Exact 3-gram Jaccard restricted to a candidate pair set — the
    verification stage of the composed dedup pipeline.

    ``candidates`` is (id_a, id_b), id_a < id_b (e.g. minhash_lsh_pairs
    output). The shingle work is bounded by the candidate set: shingle
    rows are first semi-joined to candidate doc ids, then joined
    pair-first (candidates ⨝ shingles(a) ⨝ shingles(b)), so the expensive
    stage costs O(|candidates| * avg_shingles), NOT the full
    inverted-index co-occurrence — the property that makes LSH worth
    running at 100 TB."""
    cand = candidates.select("id_a", "id_b")
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = _filtered_shingles(docs, id_col, text_col, max_shingle_df).join(
        cand_ids, "id", "left_semi"
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    sha = sh.select(F.col("id").alias("id_a"), F.col("s").alias("s"))
    shb = sh.select(F.col("id").alias("id_b"), F.col("s").alias("s"))
    shared = (
        cand.join(sha, "id_a")
        .join(shb, ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return _jaccard_from_shared(shared, sizes, threshold)


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = MINHASH_K
) -> DataFrame:
    """(id, sig string, band_0..band_{b-1} hashes). The signature is the
    dash-joined K minhashes (portable across engines; see functions/text.py)."""
    with_sh = (
        docs.withColumn("_tk", tokens_expr(text_col))
        .withColumn("_sh", shingles_expr("_tk"))
        # One md5 per shingle, materialized; the K minhashes are cheap
        # integer remixes of this array (functions/text.py).
        .withColumn("_hh", F.expr(shingle_hashes_sql("_sh")))
    )
    sig_cols = [
        F.expr(minhash_sql("_hh", i)).alias(f"mh_{i}") for i in range(k)
    ]
    sigs = with_sh.select(F.col(id_col), *sig_cols)
    band_cols = []
    for b in range(LSH_BANDS):
        parts = ", ".join(
            f"CAST(mh_{b * LSH_ROWS + r} AS STRING)" for r in range(LSH_ROWS)
        )
        band_cols.append(F.expr(f"md5(concat_ws('-', {parts}))").alias(f"band_{b}"))
    sig_str = F.concat_ws("-", *[F.col(f"mh_{i}").cast("string") for i in range(k)])
    return sigs.select(F.col(id_col), sig_str.alias("sig"), *band_cols)


def minhash_lsh_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Candidate pairs sharing >=1 LSH band bucket. Returns (id_a, id_b)
    distinct, id_a < id_b. The join key is (band_index, band_hash), so the
    shuffle carries only 16-byte digests + ids."""
    sigs = minhash_signatures(docs, id_col, text_col)
    bands = sigs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(LSH_BANDS)])).alias(
            "band_idx", "bh"
        ),
    # Pin: both sides of the self-join derive from bands, and the MinHash
    # signature expressions are the expensive part — evaluate them once.
    ).localCheckpoint(eager=False)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS
) -> DataFrame:
    """(id, simhash bigint): per-token 32-bit hash, per-bit +-1 votes
    weighted by term frequency, bit set where the vote is positive.

    One explode + one hash-aggregation; the 32 per-bit sums are columns of
    a single groupBy (map-side partials apply), not 32 passes."""
    tok = (
        docs.withColumn("_tk", tokens_expr(text_col))
        .select(F.col(id_col).alias("id"), F.explode("_tk").alias("t"))
        .withColumn("h", F.expr(h32_sql("sh", "t")))
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("id").agg(*votes)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"v_{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else (sim + term)
    return agg.select(F.col("id").alias("doc_id"), sim.alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = HAMMING_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "blocked",
) -> DataFrame:
    """Pairs within ``max_hamming`` bits of SimHash. (id_a, id_b, hamming).

    ``method="blocked"`` (default, the 100 TB path) applies pigeonhole
    blocking: split the 32-bit signature into ``max_hamming + 1`` disjoint
    bit blocks — two signatures differing in <= d bits must agree on at
    least one of the d+1 blocks — so candidates come from an equi-join on
    (block_idx, block_value) instead of an all-pairs cross join. Exact
    Hamming then verifies candidates; the result is IDENTICAL to the
    all-pairs plan (the blocking is lossless for the <= d predicate), at
    the cost of a (d+1)-way explode instead of an n^2 join.

    ``method="allpairs"`` keeps the naive cross join for small-corpus
    cross-checks of the blocked plan."""
    sigs = simhash_signatures(docs, id_col, text_col)
    if method == "allpairs":
        a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
        b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
        )
    if method != "blocked":
        raise ValueError(f"unknown method {method!r}")
    n_blocks = max_hamming + 1
    # Block bit-widths: split SIMHASH_BITS as evenly as possible (e.g.
    # 32 bits, d=3 -> 4 blocks of 8). Uneven splits stay correct.
    widths = [
        SIMHASH_BITS // n_blocks + (1 if i < SIMHASH_BITS % n_blocks else 0)
        for i in range(n_blocks)
    ]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]
    block_vals = F.array(
        *[
            F.expr(f"(simhash >> {offsets[i]}) & {(1 << widths[i]) - 1}")
            for i in range(n_blocks)
        ]
    )
    blocks = sigs.select(
        F.col("doc_id").alias("id"),
        F.col("simhash").alias("sig"),
        F.posexplode(block_vals).alias("blk_idx", "blk_val"),
    # Pin: the signature aggregation feeds both self-join sides.
    ).localCheckpoint(eager=False)
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk_idx") == F.col("b.blk_idx"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        # A close pair can agree on several blocks -> dedup the pair keys.
        .distinct()
    )


def dup_source_matrix(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix: roll a near-dup pair set up to
    (source_a, source_b, n_pairs) with the source pair normalized so the
    matrix is upper-triangular — the report that tells a crawl operator
    WHICH feeds duplicate each other (mirror sites, syndication) rather
    than just how many documents collide.

    Scale shape: the joins are pair-driven — ``pairs`` is the (small)
    output of a dedup operator, and the corpus side contributes only its
    (id, source) projection; the final aggregation has at most
    |sources|^2 groups."""
    a = docs.select(F.col(id_col).alias("id_a"), F.col(source_col).alias("_sa"))
    b = docs.select(F.col(id_col).alias("id_b"), F.col(source_col).alias("_sb"))
    labeled = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    return (
        labeled.select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
