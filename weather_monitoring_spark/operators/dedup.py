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


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs by exact 3-gram Jaccard, via the
    inverted-index join. Returns (id_a, id_b, shared, jaccard), id_a < id_b.

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs before the self-join — the skew guard at scale (a shingle in 1M
    docs would alone generate 10^12 join rows)."""
    sh = (
        docs.withColumn("_tk", tokens_expr(text_col))
        .select(F.col(id_col).alias("id"), F.explode(shingles_expr("_tk")).alias("s"))
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    if max_shingle_df is not None:
        hot = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") > max_shingle_df
        )
        sh = sh.join(F.broadcast(hot.select("s")), "s", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
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
    )
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
) -> DataFrame:
    """Pairs within ``max_hamming`` bits. At oracle scale this is an
    all-pairs check; at 100 TB block on signature bytes first (two
    signatures within d bits share at least one of d+1 disjoint prefix
    blocks — the standard pigeonhole blocking)."""
    sigs = simhash_signatures(docs, id_col, text_col)
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
