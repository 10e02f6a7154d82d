"""Oracle-checked plans that are NOT registered in the driver registry.

The driver's correctness gate covers only the first 50 registered queries,
so the registry (plans/*_queries.py) is consolidated to exactly fit that
window. Formulations that were merged away but still carry distinct
operator evidence live here and run through the SAME oracle harness in
pytest (tests/test_oracle_parity.py) — CI checks registry + extras.

Entries mirror the registry's QuerySpec contract but are deliberately not
added to REGISTRY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import (
    o_h60_from_md5,
    o_shingles,
    o_tokens,
)
from weather_monitoring_spark.operators.dedup import simhash_signatures
from weather_monitoring_spark.operators.dedup import JACCARD_THRESHOLD
from weather_monitoring_spark.operators.similarity import COSINE_NEARDUP_THRESHOLD
from weather_monitoring_spark.plans.llm_queries import (
    O_FILTERED_SH,
    _o_cosine,
    _o_simhash,
    o_band_candidates,
)
from weather_monitoring_spark.operators.training_prep import CHUNK_OVERLAP, CHUNK_TOKENS
from weather_monitoring_spark.plans.registry import QuerySpec
from weather_monitoring_spark.sources.tables import load_table, register_views


def _sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain multi-join aggregation through spark.sql over registered
    views (the registered SQL-path query, q53, is the decorrelation case)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name,
               count(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS revenue
        FROM orders, customer, nation, region
        WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
          AND n_regionkey = r_regionkey AND o_orderpriority = '1-URGENT'
        GROUP BY r_name
        """
    )


def _lateral_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split() + posexplode over a string column (the registered q54
    explodes a collect_set array instead)."""
    return (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", F.split("p_name", " ").alias("words"))
        .select("p_partkey", F.posexplode("words").alias("pos", "word"))
    )


def _per_group_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas twin of the registered
    q49_per_group_ordinal (which is the pure-Catalyst production plan).
    This keeps the §2.7 grouped-map UDF surface oracle-checked — exact
    integer outputs, so even the Python path hash-matches — as the
    pattern for per-entity logic window functions can't express."""
    from weather_monitoring_spark.plans.extended_queries import pandas_per_group

    return pandas_per_group(spark, sf_dir)


def _range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join (SURVEY §2.4's implied interval join): for each
    purchase, count clicks by the same user within the preceding 30
    minutes. The scale-correct shape: equi-join on (user, hour-bucket)
    pairs — each purchase probes its own and the previous hour bucket —
    so the range predicate only filters within small co-located groups
    instead of driving an n*m per-user nested loop. (The as-of variant,
    one shuffle + last(ignorenulls), is registered as q17.)"""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.date_trunc("hour", "ts").alias("c_bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id"),
        "ts",
        F.explode(
            F.array(
                F.date_trunc("hour", "ts"),
                F.date_trunc("hour", "ts") - F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("probe_bucket"),
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (purchases.probe_bucket == clicks.c_bucket)
        & (clicks.c_ts >= purchases.ts - F.expr("INTERVAL 30 MINUTES"))
        & (clicks.c_ts < purchases.ts),
        "left",
    )
    return joined.groupBy("user_id", "event_id", "ts").agg(
        F.count("c_ts").alias("clicks_30m")
    )


def _simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document SimHash bit-identity for ALL documents (the registered
    q34 oracle only proves signatures of colliding docs)."""
    return simhash_signatures(load_table(spark, sf_dir, "documents"))


def _pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing over the document corpus: global running
    token total via distributed_cumsum (range repartition + local windows
    + broadcast offsets — no single-task global sort), shard = the
    budget-interval containing the doc's first token."""
    from weather_monitoring_spark.operators.training_prep import pack_token_budget

    return pack_token_budget(load_table(spark, sf_dir, "documents"), budget=5_000)


def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 20 == 0 act as the
    held-out eval set; every other (training) doc is flagged when it
    shares >= 3 distinct word 3-grams with the union of eval shingles."""
    from weather_monitoring_spark.operators.training_prep import contamination_flags

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return contamination_flags(train, bench)


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transitive-closure completion of the q50 pipeline: MinHash-LSH
    candidates -> candidate-bounded exact Jaccard -> connected components
    over the verified pair graph (min-label propagation + pointer
    jumping) -> exactly one survivor per near-dup CLUSTER. The recursive
    oracle proves the fixpoint labels, not just pair semantics."""
    from weather_monitoring_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_verify,
    )
    from weather_monitoring_spark.operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    verified = ngram_jaccard_verify(docs, minhash_lsh_pairs(docs))
    return dedup_clusters(docs, verified.select("id_a", "id_b"))


def _semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup at cluster granularity: exact
    cosine near-dup pairs (blocked-GEMM prefilter + exact re-score) ->
    connected components -> one survivor per semantic cluster. Same
    clustering machinery as the text-side x_dedup_clusters, proving the
    survivor-selection stage composes across modalities."""
    from weather_monitoring_spark.operators.graph import dedup_clusters
    from weather_monitoring_spark.operators.similarity import cosine_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_neardup_pairs(emb).select("id_a", "id_b")
    return dedup_clusters(emb, pairs, id_col="vec_id")


def _quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection: the x_dedup_clusters pipeline
    (LSH candidates -> candidate-bounded exact Jaccard -> connected
    components), but keeping each cluster's HIGHEST-quality member
    (quality = text length here; ties -> smallest id) instead of the
    min-id copy — the policy that keeps the clean original rather than
    whichever truncated duplicate was crawled first. Deterministic
    argmax via max_by over the (quality, -id) struct."""
    from weather_monitoring_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_verify,
    )
    from weather_monitoring_spark.operators.graph import quality_survivors

    docs = load_table(spark, sf_dir, "documents")
    verified = ngram_jaccard_verify(docs, minhash_lsh_pairs(docs))
    return quality_survivors(
        docs, verified.select("id_a", "id_b"), F.length("text")
    )


def _vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: token -> document frequency + total count, top
    200 by (count desc, token asc) — the deterministic tie-break makes a
    top-k over ties oracle-checkable. Scale shape: explode + one partial
    agg (map-side combine collapses each task to its distinct tokens)
    + TakeOrderedAndProject; the vocab itself is tiny at any corpus
    size."""
    from weather_monitoring_spark.functions.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.col("doc_id"), F.explode(tokens_expr("text")).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy(F.col("n_total").desc(), F.col("token"))
        .limit(200)
    )


def _chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (doc -> fixed-context training
    samples): pure map-side projection — tokenize, sequence over the
    chunk count, posexplode, slice — no shuffle at any corpus size."""
    from weather_monitoring_spark.operators.training_prep import chunk_documents

    return chunk_documents(load_table(spark, sf_dir, "documents"))


def _tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-k TF-IDF terms with the engine-portable raw-IDF
    score tf * (N/df) — IEEE divide/multiply only, no log (libm is not
    bit-stable across engines)."""
    from weather_monitoring_spark.operators.textops import tfidf_topk

    return tfidf_topk(load_table(spark, sf_dir, "documents"))


def _quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8-style embedding quantization with a per-vector
    reconstruction-error bound; floor()-based so both engines agree
    bit-for-bit (round() of computed doubles is forbidden)."""
    from weather_monitoring_spark.operators.embeddings import quantize_embeddings

    return quantize_embeddings(load_table(spark, sf_dir, "embeddings"))


def _profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-column profiling of the events table (null rates,
    exact cardinalities, typed min/max slots; timestamps profile as
    unix micros — micros exceed double's 2^53 exact range, so they ride
    the integer slots)."""
    from weather_monitoring_spark.operators.profile import profile_table

    return profile_table(load_table(spark, sf_dir, "events"))


def _histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 25-bin histogram of events.value over [0, 500):
    IEEE divide/floor binning (bit-stable cross-engine), zero-filled
    empty bins from a generated bin table."""
    from weather_monitoring_spark.operators.profile import histogram

    return histogram(load_table(spark, sf_dir, "events"), "value", 0.0, 500.0, 25)


def _cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-domain capping (keep <= 30 docs per source,
    content-addressed md5 order — a pure function of the ids, no RNG)."""
    from weather_monitoring_spark.operators.training_prep import cap_per_group

    return cap_per_group(load_table(spark, sf_dir, "documents"), "source", 30)


def _corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus report: doc/char/token volumes, language spread,
    largest doc, mean doc size — one aggregation over one scan."""
    from weather_monitoring_spark.operators.textops import corpus_report

    return corpus_report(load_table(spark, sf_dir, "documents"))


def _oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing oversampling with deterministic integer weights
    derived from the source name (srcN -> N % 3 + 1 copies): explode
    multiplies rows map-side, the copy index keeps replicas distinct for
    downstream content-addressed shuffles."""
    from weather_monitoring_spark.operators.training_prep import oversample_sources

    docs = load_table(spark, sf_dir, "documents")
    weight = (F.expr("CAST(substring(source, 4) AS BIGINT)") % 3) + 1
    return oversample_sources(docs, weight)


#: Tokens per synthesized "line" for the line-ops specs. The testdata
#: documents are single-line word streams, so the specs synthesize a
#: lined corpus deterministically (k-token groups) on BOTH engines
#: before applying the line operators; k=2 over the small testdata
#: vocabulary makes intra-doc duplicates and cross-doc hot lines common
#: enough to exercise both code paths.
LINE_TOKENS = 2
LINE_MIN_DOCS = 25


def _with_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_monitoring_spark.functions.text import tokens_expr

    k = LINE_TOKENS
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id"), tokens_expr("text").alias("_tk"))
        .filter(F.size("_tk") > 0)
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, CAST((size(_tk) + {k - 1}) DIV {k} AS INT) - 1),"
                f" i -> concat_ws(' ', slice(_tk, i*{k}+1, {k})))"
            ).alias("lines"),
        )
    )


#: Oracle CTE building the identical lined corpus in DuckDB (1-based
#: inclusive list slicing; chr(10) == the Spark side's literal "\n").
O_LINED = f"""
    WITH lined AS (
        SELECT doc_id,
               list_transform(range(0, (len(tk) + {LINE_TOKENS - 1}) // {LINE_TOKENS}),
                              i -> array_to_string(tk[i*{LINE_TOKENS}+1 : i*{LINE_TOKENS}+{LINE_TOKENS}], ' ')) AS lines
        FROM (SELECT doc_id, {o_tokens('text')} AS tk FROM documents)
        WHERE len(tk) > 0
    )
"""


def _dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document duplicate-line removal (CCNet/Dolma line dedup):
    keep each line's FIRST occurrence in order, re-join, count. Pure
    per-row array projection — the corpus never shuffles; the
    first-occurrence index lambda states the order contract explicitly
    on both engines (list_distinct order is not portable)."""
    from weather_monitoring_spark.operators.lines import dedup_lines

    return dedup_lines(_with_lines(spark, sf_dir))


def _strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate-line stripping: lines appearing in >=
    LINE_MIN_DOCS distinct documents are removed from every document.
    Scale shape: only (line -> doc-frequency) pairs shuffle; the hot set
    (bounded by total_lines/min_docs) collapses to one broadcast array
    row and each document filters map-side — documents are never
    exploded, never re-assembled."""
    from weather_monitoring_spark.operators.lines import strip_boilerplate

    return strip_boilerplate(_with_lines(spark, sf_dir), min_docs=LINE_MIN_DOCS)


def _snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (run N vs run N+1): per-id verdict
    added/removed/changed/unchanged by md5 content digest. Both sides
    collapse to (id, 16-byte digest) before the full-outer join — text
    never shuffles. Snapshots are synthesized deterministically from the
    documents table (drop id%7 on the old side, drop id%5 and edit id%3
    on the new side) so all four verdicts occur."""
    from weather_monitoring_spark.operators.versioning import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(old, new)


def _bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM count table: (w1, w2) corpus count, context
    count, and conditional MLE probability — one IEEE divide of exact
    BIGINTs, bit-stable cross-engine (no log smoothing for exactly that
    reason). Pairs explode map-side; one partial-agg shuffle; the
    context table is a vocab-bounded reaggregation of the pair table."""
    from weather_monitoring_spark.operators.textops import bigram_lm

    return bigram_lm(load_table(spark, sf_dir, "documents"))


def _reduce_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random-projection reduction, expr path: deterministic ±1 planes
    baked in as literals, left-associated multiply-add chains — double
    results bit-identical to the oracle's identical chains. (The GEMM
    scale path is proven ulp-close to this one by test.)"""
    from weather_monitoring_spark.operators.embeddings import reduce_embeddings

    return reduce_embeddings(
        load_table(spark, sf_dir, "embeddings"), method="expr"
    )


#: Planted-dirt synthesis for the normalize_text spec: BEL + CR/CRLF +
#: tab runs injected around/into every document, written as ONE SQL
#: fragment valid verbatim on both engines (concat/chr/replace agree).
PLANT_DIRT = (
    "concat(chr(7), 'head ', chr(13), chr(10), "
    "replace(text, ' ', concat(' ', chr(9), chr(9), ' ')), "
    "' ', chr(13), ' tail')"
)


def _normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-text normalization over deterministically dirtied documents
    (BEL, CR/CRLF, tab runs planted via the same SQL fragment on both
    engines): strip C0/DEL controls, CR->LF, collapse horizontal
    whitespace, trim line and document edges. One zero-shuffle
    projection; the regex passes are whole-stage codegen."""
    from weather_monitoring_spark.operators.textops import normalize_text

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(PLANT_DIRT).alias("text")
    )
    return normalize_text(docs)


def _sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exactly-k sample: the 100 smallest md5(doc_id)
    values — RNG-free, partition-independent, exactly sized; plans as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    from weather_monitoring_spark.operators.training_prep import sample_exact_k

    return sample_exact_k(load_table(spark, sf_dir, "documents"), 100)


def _trim_tails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-tail curation gate: keep documents whose token count
    lies between the 5%- and 95%-rank values (integer-exact lower-value
    quantiles over a (value, count) histogram — the corpus aggregates
    once; no interpolation, no collect)."""
    from weather_monitoring_spark.functions.text import tokens_expr
    from weather_monitoring_spark.operators.training_prep import (
        trim_distribution_tails,
    )

    docs = load_table(spark, sf_dir, "documents")
    return trim_distribution_tails(docs, F.size(tokens_expr("text")))


def _mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square-root temperature mixture weights (alpha=0.5 sampling): per
    source, p = sqrt(n_tokens)/sum(sqrt(n_tokens)) plus the boost factor
    vs proportional sampling. Bit-stable cross-engine: alpha pinned at
    0.5 (sqrt is correctly-rounded IEEE; pow is not), exact BIGINT token
    counts, and both engines compute the weight denominator as a
    sequential fold over the per-source rows in source order."""
    from weather_monitoring_spark.operators.training_prep import mixture_weights

    return mixture_weights(load_table(spark, sf_dir, "documents"))


#: x_pack_contexts parameters: non-overlapping 32-token chunks packed
#: into 128-token training contexts.
CTX_CHUNK = 32
CTX_BUDGET = 128


def _pack_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus -> fixed-length training contexts: non-overlapping
    token chunks (pure map-side projection) -> global running token total
    (distributed_cumsum: range repartition + local windows + broadcast
    offsets, no single-task sort) -> context_id = the 128-token interval
    containing the chunk's first token. The whole composition is the
    data-loader feed path, oracle-checked as one plan."""
    from weather_monitoring_spark.operators.training_prep import (
        chunk_documents,
        distributed_cumsum,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=CTX_CHUNK, overlap=0)
    keyed = chunks.withColumn(
        "ord", F.col("doc_id") * 1048576 + F.col("chunk_idx")
    )
    packed = distributed_cumsum(keyed, "ord", "n_tokens", out_col="cum_tokens")
    return packed.select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        "cum_tokens",
        F.expr(f"CAST((cum_tokens - n_tokens) DIV {CTX_BUDGET} AS BIGINT)").alias(
            "context_id"
        ),
    )


def _dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix over the exact n-gram Jaccard
    near-dup pairs (q32's oracle-proven pair set): which sources
    duplicate each other, upper-triangular by source-name order. The
    joins are pair-driven; the corpus contributes only (id, source)."""
    from weather_monitoring_spark.operators.dedup import (
        dup_source_matrix,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return dup_source_matrix(docs, ngram_jaccard_pairs(docs))


#: Blocklist for the x_blocklist_filter spec: word-boundary patterns in
#: the RE2 ∩ Java common subset, hitting real testdata vocabulary.
BLOCK_PATTERNS = ("\\bslow\\b", "\\bdup\\b")


def _blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-blocklist gate (C4-style banned-terms filter): per-document
    hit counts over shared-verbatim regexes + an explicit blocked verdict
    for every document. One zero-shuffle regex projection."""
    from weather_monitoring_spark.operators.quality import blocklist_filter

    return blocklist_filter(
        load_table(spark, sf_dir, "documents"), BLOCK_PATTERNS, max_hits=2
    )


def _curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-call curation front door (normalize -> repetition fold ->
    blocklist -> first-failing-gate verdict) as a single zero-shuffle
    projection — composition oracle built from the same normalize /
    token / repetition / blocklist fragments the constituent specs use."""
    from weather_monitoring_spark.operators.quality import curate_corpus

    return curate_corpus(
        load_table(spark, sf_dir, "documents"), blocklist=BLOCK_PATTERNS
    )


EXTRA_SPECS: list[QuerySpec] = [
    QuerySpec(
        name="x_sql_surface",
        doc=_sql_surface.__doc__ or "",
        spark=_sql_surface,
        oracle="""
            SELECT r_name,
                   count(*) AS n_orders,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
            FROM orders, customer, nation, region
            WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
              AND n_regionkey = r_regionkey AND o_orderpriority = '1-URGENT'
            GROUP BY r_name
        """,
        tags=("extra", "sql"),
    ),
    QuerySpec(
        name="x_lateral_explode_words",
        doc=_lateral_words.__doc__ or "",
        spark=_lateral_words,
        oracle="""
            SELECT p_partkey, CAST(i - 1 AS INTEGER) AS pos, words[i] AS word
            FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part),
                 unnest(range(1, len(words) + 1)) AS u(i)
        """,
        tags=("extra", "generator"),
    ),
    QuerySpec(
        name="x_range_join",
        doc=_range_join.__doc__ or "",
        spark=_range_join,
        oracle="""
            SELECT p.user_id, p.event_id, p.ts,
                   (SELECT count(*) FROM events c
                    WHERE c.user_id = p.user_id AND c.event_type = 'click'
                      AND c.ts >= p.ts - INTERVAL '30 minutes'
                      AND c.ts < p.ts) AS clicks_30m
            FROM events p WHERE p.event_type = 'purchase'
        """,
        tags=("extra", "join", "range"),
    ),
    QuerySpec(
        name="x_per_group_pandas",
        doc=_per_group_pandas.__doc__ or "",
        spark=_per_group_pandas,
        oracle="""
            SELECT user_id, event_id,
                   CAST(row_number() OVER w AS INTEGER) AS ordinal,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        tags=("extra", "window"),
    ),
    QuerySpec(
        name="x_simhash_signatures",
        doc=_simhash_sigs.__doc__ or "",
        spark=_simhash_sigs,
        oracle=f"SELECT doc_id, simhash FROM ({_o_simhash()})",
        tags=("extra", "simhash"),
    ),
    QuerySpec(
        name="x_pack_token_shards",
        doc=_pack_shards.__doc__ or "",
        spark=_pack_shards,
        oracle=f"""
            WITH tok AS (
                SELECT doc_id,
                       CAST(len({o_tokens('text')}) AS BIGINT) AS n_tokens
                FROM documents
            ), c AS (
                SELECT doc_id, n_tokens,
                       CAST(sum(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS BIGINT) AS cum_tokens
                FROM tok
            )
            SELECT doc_id, n_tokens, cum_tokens,
                   CAST((cum_tokens - n_tokens) // 5000 AS BIGINT) AS shard_id
            FROM c
        """,
        tags=("extra", "training-prep", "window"),
    ),
    QuerySpec(
        name="x_decontaminate",
        doc=_decontaminate.__doc__ or "",
        spark=_decontaminate,
        oracle=f"""
            WITH tok AS (
                SELECT doc_id, {o_tokens('text')} AS tk FROM documents
            ), sh AS (
                SELECT doc_id, unnest({o_shingles('tk')}) AS s FROM tok
            ), ev AS (
                SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0
            ), hits AS (
                SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shared
                FROM sh JOIN ev USING (s)
                WHERE sh.doc_id % 20 <> 0
                GROUP BY sh.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
                   coalesce(h.n_shared, 0) >= 3 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 20 <> 0
        """,
        tags=("extra", "training-prep", "dedup"),
    ),
    QuerySpec(
        name="x_dedup_clusters",
        doc=_dedup_clusters.__doc__ or "",
        spark=_dedup_clusters,
        oracle=f"""
            WITH RECURSIVE {o_band_candidates()},
            {O_FILTERED_SH},
            shared AS (
                SELECT c.id_a, c.id_b, count(*) AS shared
                FROM cand c
                JOIN sh a ON a.id = c.id_a
                JOIN sh b ON b.id = c.id_b AND b.s = a.s
                GROUP BY 1, 2
            ),
            dup_pairs AS (
                SELECT id_a, id_b
                FROM shared JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
                WHERE shared * 1.0 / (x.n + y.n - shared) >= {JACCARD_THRESHOLD}
            ),
            sym AS (
                SELECT id_a AS a, id_b AS b FROM dup_pairs
                UNION
                SELECT id_b, id_a FROM dup_pairs
            ),
            reach(node, lbl) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
            ),
            comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
            SELECT d.doc_id,
                   CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS cluster,
                   d.doc_id = CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS survivor
            FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        """,
        tags=("extra", "dedup", "graph", "pipeline"),
    ),
    QuerySpec(
        name="x_semantic_dedup",
        doc=_semantic_dedup.__doc__ or "",
        spark=_semantic_dedup,
        oracle=f"""
            WITH RECURSIVE dup_pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE {_o_cosine('a.embedding', 'b.embedding')} >= {COSINE_NEARDUP_THRESHOLD}
            ),
            sym AS (
                SELECT id_a AS a, id_b AS b FROM dup_pairs
                UNION
                SELECT id_b, id_a FROM dup_pairs
            ),
            reach(node, lbl) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
            ),
            comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
            SELECT e.vec_id,
                   CAST(coalesce(c.component, e.vec_id) AS BIGINT) AS cluster,
                   e.vec_id = CAST(coalesce(c.component, e.vec_id) AS BIGINT) AS survivor
            FROM embeddings e LEFT JOIN comp c ON c.node = e.vec_id
        """,
        tags=("extra", "similarity", "graph", "pipeline"),
    ),
    QuerySpec(
        name="x_vocabulary",
        doc=_vocabulary.__doc__ or "",
        spark=_vocabulary,
        oracle=f"""
            SELECT token,
                   CAST(count(*) AS BIGINT) AS n_total,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM (SELECT doc_id, unnest({o_tokens('text')}) AS token FROM documents)
            GROUP BY token
            ORDER BY n_total DESC, token
            LIMIT 200
        """,
        tags=("extra", "text", "aggregate"),
    ),
    QuerySpec(
        name="x_chunk_documents",
        doc=_chunk_documents.__doc__ or "",
        spark=_chunk_documents,
        oracle=f"""
            WITH tok AS (
                SELECT doc_id, {o_tokens('text')} AS tk FROM documents
            ), sized AS (
                SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
                FROM tok WHERE len(tk) > 0
            ), counted AS (
                SELECT doc_id, tk, n,
                       CAST(CASE WHEN n <= {CHUNK_TOKENS} THEN 1
                            ELSE 1 + (n - {CHUNK_TOKENS} + {CHUNK_TOKENS - CHUNK_OVERLAP} - 1)
                                     // {CHUNK_TOKENS - CHUNK_OVERLAP}
                       END AS BIGINT) AS n_chunks
                FROM sized
            ), ex AS (
                SELECT doc_id, tk,
                       CAST(i AS BIGINT) AS chunk_idx,
                       CAST(i * {CHUNK_TOKENS - CHUNK_OVERLAP} AS BIGINT) AS chunk_start
                FROM counted, unnest(range(0, n_chunks)) AS u(i)
            )
            SELECT doc_id, chunk_idx, chunk_start,
                   CAST(len(tk[chunk_start + 1 : chunk_start + {CHUNK_TOKENS}]) AS BIGINT)
                       AS n_tokens,
                   array_to_string(tk[chunk_start + 1 : chunk_start + {CHUNK_TOKENS}], ' ')
                       AS chunk_text
            FROM ex
        """,
        tags=("extra", "training-prep", "chunking"),
    ),
    QuerySpec(
        name="x_tfidf_topk",
        doc=_tfidf.__doc__ or "",
        spark=_tfidf,
        oracle=f"""
            WITH tok AS (
                SELECT doc_id, unnest({o_tokens('text')}) AS token FROM documents
            ), tfq AS (
                SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                FROM tok GROUP BY doc_id, token
            ), dfq AS (
                SELECT token, CAST(count(*) AS BIGINT) AS df
                FROM tfq GROUP BY token
            ), scored AS (
                SELECT doc_id, token, tf, df,
                       CAST(tf AS DOUBLE) *
                       (CAST((SELECT count(*) FROM documents) AS DOUBLE)
                        / CAST(df AS DOUBLE)) AS score
                FROM tfq JOIN dfq USING (token)
            ), ranked AS (
                SELECT *, CAST(row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, token
                ) AS BIGINT) AS term_rank
                FROM scored
            )
            SELECT doc_id, token, tf, df, score, term_rank
            FROM ranked WHERE term_rank <= 5
        """,
        tags=("extra", "text", "tfidf"),
    ),
    QuerySpec(
        name="x_quantize_embeddings",
        doc=_quantize.__doc__ or "",
        spark=_quantize,
        oracle="""
            WITH xd AS (
                SELECT vec_id,
                       list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
                FROM embeddings
            ), s AS (
                SELECT vec_id, x,
                       list_max(list_transform(x, v -> abs(v))) / CAST(127 AS DOUBLE) AS scale
                FROM xd
            ), q AS (
                SELECT vec_id, x, scale,
                       list_transform(x, v -> CAST(
                           CASE WHEN scale = 0 THEN 0.0 ELSE floor(v / scale) END
                       AS BIGINT)) AS qvec
                FROM s
            )
            SELECT vec_id, scale, qvec,
                   CASE WHEN scale = 0 THEN CAST(0.0 AS DOUBLE) ELSE
                       list_max(list_transform(range(1, len(x) + 1),
                           i -> abs(x[i] - CAST(qvec[i] AS DOUBLE) * scale)))
                   END AS max_abs_err
            FROM q
        """,
        tags=("extra", "embeddings", "quantization"),
    ),
    QuerySpec(
        name="x_cap_per_source",
        doc=_cap_per_source.__doc__ or "",
        spark=_cap_per_source,
        oracle="""
            SELECT doc_id, text, lang, source, n_chars, group_rank FROM (
                SELECT *, CAST(row_number() OVER (
                    PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                ) AS BIGINT) AS group_rank
                FROM documents
            ) WHERE group_rank <= 30
        """,
        tags=("extra", "training-prep", "sampling"),
    ),
    QuerySpec(
        name="x_corpus_report",
        doc=_corpus_report.__doc__ or "",
        spark=_corpus_report,
        oracle=f"""
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS n_chars,
                   CAST(sum(len({o_tokens('text')})) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(max(len({o_tokens('text')})) AS BIGINT) AS max_doc_tokens,
                   CAST(sum(length(text)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS chars_per_doc
            FROM documents GROUP BY source
        """,
        tags=("extra", "text", "reporting"),
    ),
    QuerySpec(
        name="x_profile_events",
        doc=_profile_events.__doc__ or "",
        spark=_profile_events,
        oracle="""
            SELECT 'event_id' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count(event_id) AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
                   CAST(min(event_id) AS BIGINT) AS min_int,
                   CAST(max(event_id) AS BIGINT) AS max_int,
                   CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
                   CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
            FROM events
            UNION ALL
            SELECT 'ts', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(ts) AS BIGINT),
                   CAST(count(DISTINCT epoch_us(ts)) AS BIGINT),
                   CAST(min(epoch_us(ts)) AS BIGINT),
                   CAST(max(epoch_us(ts)) AS BIGINT),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM events
            UNION ALL
            SELECT 'user_id', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(user_id) AS BIGINT),
                   CAST(count(DISTINCT user_id) AS BIGINT),
                   CAST(min(user_id) AS BIGINT), CAST(max(user_id) AS BIGINT),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM events
            UNION ALL
            SELECT 'event_type', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(event_type) AS BIGINT),
                   CAST(count(DISTINCT event_type) AS BIGINT),
                   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   min(event_type), max(event_type)
            FROM events
            UNION ALL
            SELECT 'value', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(value) AS BIGINT),
                   CAST(count(DISTINCT value) AS BIGINT),
                   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                   CAST(min(value) AS DOUBLE), CAST(max(value) AS DOUBLE),
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM events
            UNION ALL
            SELECT 'props', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(props) AS BIGINT),
                   CAST(count(DISTINCT props) AS BIGINT),
                   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   min(props), max(props)
            FROM events
        """,
        tags=("extra", "profiling"),
    ),
    QuerySpec(
        name="x_histogram_value",
        doc=_histogram_value.__doc__ or "",
        spark=_histogram_value,
        oracle="""
            WITH b AS (SELECT CAST(range AS BIGINT) AS bin FROM range(0, 25)),
            binned AS (
                SELECT CAST(least(floor((value - 0.0) / 20.0), 24) AS BIGINT) AS bin,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM events
                WHERE value IS NOT NULL AND value >= 0.0 AND value <= 500.0
                GROUP BY 1
            )
            SELECT b.bin,
                   0.0 + CAST(b.bin AS DOUBLE) * 20.0 AS bin_lo,
                   0.0 + CAST(b.bin + 1 AS DOUBLE) * 20.0 AS bin_hi,
                   CAST(coalesce(cnt, 0) AS BIGINT) AS cnt
            FROM b LEFT JOIN binned USING (bin)
        """,
        tags=("extra", "profiling", "histogram"),
    ),
    QuerySpec(
        name="x_oversample_mixture",
        doc=_oversample.__doc__ or "",
        spark=_oversample,
        oracle="""
            SELECT doc_id, source, w AS weight, unnest(range(1, w + 1)) AS copy
            FROM (SELECT doc_id, source,
                         (CAST(substr(source, 4) AS BIGINT) % 3) + 1 AS w
                  FROM documents)
        """,
        tags=("extra", "training-prep", "mixture"),
    ),
    QuerySpec(
        name="x_dedup_lines",
        doc=_dedup_lines.__doc__ or "",
        spark=_dedup_lines,
        oracle=O_LINED
        + """
            SELECT doc_id,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(len(kept) AS BIGINT) AS n_kept,
                   array_to_string(kept, chr(10)) AS text_clean
            FROM (SELECT doc_id, lines,
                         list_filter(lines, (x, i) -> list_position(lines, x) = i) AS kept
                  FROM lined)
        """,
        tags=("extra", "text", "line-dedup"),
    ),
    QuerySpec(
        name="x_strip_boilerplate",
        doc=_strip_boilerplate.__doc__ or "",
        spark=_strip_boilerplate,
        oracle=O_LINED
        + f"""
            , hot AS (
                SELECT line FROM (
                    SELECT doc_id, unnest(list_distinct(lines)) AS line FROM lined
                ) GROUP BY line HAVING count(*) >= {LINE_MIN_DOCS}
            ), hotl AS (SELECT coalesce(list(line), []) AS hot FROM hot)
            SELECT doc_id,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(len(kept) AS BIGINT) AS n_kept,
                   array_to_string(kept, chr(10)) AS text_clean
            FROM (SELECT doc_id, lines,
                         list_filter(lines, x -> NOT list_contains(hot, x)) AS kept
                  FROM lined CROSS JOIN hotl)
        """,
        tags=("extra", "text", "line-dedup"),
    ),
    QuerySpec(
        name="x_sample_exact_k",
        doc=_sample_exact_k.__doc__ or "",
        spark=_sample_exact_k,
        oracle="""
            SELECT * FROM documents
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            LIMIT 100
        """,
        tags=("extra", "training-prep", "sampling"),
    ),
    QuerySpec(
        name="x_mixture_weights",
        doc=_mixture_weights.__doc__ or "",
        spark=_mixture_weights,
        oracle=f"""
            WITH per AS (
                SELECT source,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(len({o_tokens('text')})) AS BIGINT) AS n_tokens
                FROM documents GROUP BY source
            ), w AS (
                SELECT source, n_docs, n_tokens,
                       sqrt(CAST(n_tokens AS DOUBLE)) AS w
                FROM per
            ), t AS (
                SELECT list_reduce(
                           list_prepend(CAST(0.0 AS DOUBLE),
                                        list(w ORDER BY source)),
                           (a, b) -> a + b) AS w_total,
                       CAST(sum(n_tokens) AS BIGINT) AS tok_total
                FROM w
            )
            SELECT source, n_docs, n_tokens, w,
                   w / w_total AS p,
                   (w / w_total)
                       / (CAST(n_tokens AS DOUBLE) / CAST(tok_total AS DOUBLE))
                       AS boost
            FROM w CROSS JOIN t
        """,
        tags=("extra", "training-prep", "mixture"),
    ),
    QuerySpec(
        name="x_trim_tails",
        doc=_trim_tails.__doc__ or "",
        spark=_trim_tails,
        oracle=f"""
            WITH feat AS (
                SELECT *, CAST(len({o_tokens('text')}) AS BIGINT) AS f
                FROM documents
            ), hist AS (
                SELECT f, CAST(count(*) AS BIGINT) AS c FROM feat GROUP BY f
            ), cum AS (
                SELECT f, sum(c) OVER (ORDER BY f) AS cum FROM hist
            ), n AS (SELECT count(*) AS n FROM feat),
            bounds AS (
                SELECT min(CASE WHEN cum >= (n * 5 + 99) // 100 THEN f END) AS v_lo,
                       min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN f END) AS v_hi
                FROM cum, n
            )
            SELECT feat.*, v_lo, v_hi
            FROM feat CROSS JOIN bounds
            WHERE f >= v_lo AND f <= v_hi
        """,
        tags=("extra", "training-prep", "curation"),
    ),
    QuerySpec(
        name="x_pack_contexts",
        doc=_pack_contexts.__doc__ or "",
        spark=_pack_contexts,
        oracle=f"""
            WITH tok AS (
                SELECT doc_id, {o_tokens('text')} AS tk FROM documents
            ), sized AS (
                SELECT doc_id, CAST(len(tk) AS BIGINT) AS n
                FROM tok WHERE len(tk) > 0
            ), counted AS (
                SELECT doc_id, n,
                       CAST(CASE WHEN n <= {CTX_CHUNK} THEN 1
                            ELSE 1 + (n - 1) // {CTX_CHUNK}
                       END AS BIGINT) AS n_chunks
                FROM sized
            ), ex AS (
                SELECT doc_id, n,
                       CAST(i AS BIGINT) AS chunk_idx,
                       CAST(i * {CTX_CHUNK} AS BIGINT) AS start
                FROM counted, unnest(range(0, n_chunks)) AS u(i)
            ), ch AS (
                SELECT doc_id, chunk_idx,
                       CAST(least({CTX_CHUNK}, n - start) AS BIGINT) AS n_tokens
                FROM ex
            ), c AS (
                SELECT doc_id, chunk_idx, n_tokens,
                       CAST(sum(n_tokens) OVER (
                           ORDER BY doc_id, chunk_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS BIGINT) AS cum_tokens
                FROM ch
            )
            SELECT doc_id, chunk_idx, n_tokens, cum_tokens,
                   CAST((cum_tokens - n_tokens) // {CTX_BUDGET} AS BIGINT) AS context_id
            FROM c
        """,
        tags=("extra", "training-prep", "composition"),
    ),
    QuerySpec(
        name="x_dup_source_matrix",
        doc=_dup_source_matrix.__doc__ or "",
        spark=_dup_source_matrix,
        oracle=f"""
            WITH {O_FILTERED_SH},
            shared AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
                FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                GROUP BY 1, 2
            ),
            dup_pairs AS (
                SELECT id_a, id_b
                FROM shared JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
                WHERE shared * 1.0 / (x.n + y.n - shared) >= {JACCARD_THRESHOLD}
            ),
            lab AS (
                SELECT da.source AS sa, db.source AS sb
                FROM dup_pairs p
                JOIN documents da ON da.doc_id = p.id_a
                JOIN documents db ON db.doc_id = p.id_b
            )
            SELECT least(sa, sb) AS source_a,
                   greatest(sa, sb) AS source_b,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM lab GROUP BY 1, 2
        """,
        tags=("extra", "dedup", "reporting"),
    ),
    QuerySpec(
        name="x_blocklist_filter",
        doc=_blocklist.__doc__ or "",
        spark=_blocklist,
        oracle=f"""
            SELECT *,
                   CAST(len(regexp_extract_all(text, '{BLOCK_PATTERNS[0]}'))
                      + len(regexp_extract_all(text, '{BLOCK_PATTERNS[1]}'))
                      AS BIGINT) AS n_blocked_hits,
                   (len(regexp_extract_all(text, '{BLOCK_PATTERNS[0]}'))
                      + len(regexp_extract_all(text, '{BLOCK_PATTERNS[1]}'))) > 2
                      AS blocked
            FROM documents
        """,
        tags=("extra", "text", "curation"),
    ),
    QuerySpec(
        name="x_snapshot_diff",
        doc=_snapshot_diff.__doc__ or "",
        spark=_snapshot_diff,
        oracle="""
            WITH o AS (
                SELECT doc_id,
                       coalesce(md5(text),
                                'null:' || CAST(doc_id AS VARCHAR)) AS old_digest
                FROM documents WHERE doc_id % 7 <> 0
            ), n AS (
                SELECT doc_id,
                       coalesce(md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2'
                                         ELSE text END),
                                'null:' || CAST(doc_id AS VARCHAR)) AS new_digest
                FROM documents WHERE doc_id % 5 <> 0
            )
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN old_digest IS NULL THEN 'added'
                        WHEN new_digest IS NULL THEN 'removed'
                        WHEN old_digest = new_digest THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   old_digest, new_digest
            FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        """,
        tags=("extra", "versioning"),
    ),
    QuerySpec(
        name="x_bigram_lm",
        doc=_bigram_lm.__doc__ or "",
        spark=_bigram_lm,
        oracle=f"""
            WITH tk AS (
                SELECT {o_tokens('text')} AS t FROM documents
            ), pairs AS (
                SELECT unnest(list_transform(range(1, len(t)),
                              i -> t[i] || ' ' || t[i+1])) AS pair
                FROM tk WHERE len(t) > 1
            ), cp AS (
                SELECT split_part(pair, ' ', 1) AS w1,
                       split_part(pair, ' ', 2) AS w2,
                       CAST(count(*) AS BIGINT) AS c_pair
                FROM pairs GROUP BY 1, 2
            ), cc AS (
                SELECT w1, CAST(sum(c_pair) AS BIGINT) AS c_ctx
                FROM cp GROUP BY w1
            )
            SELECT w1, w2, c_pair, c_ctx,
                   CAST(c_pair AS DOUBLE) / CAST(c_ctx AS DOUBLE) AS p
            FROM cp JOIN cc USING (w1)
        """,
        tags=("extra", "text", "language-model"),
    ),
]

# The JL-reduction oracle SQL is generated from the same plane matrix the
# Spark side uses (literal chains, identical order) — append it with its
# generator rather than an inline string.
from weather_monitoring_spark.operators.embeddings import o_reduce_embeddings  # noqa: E402

from weather_monitoring_spark.operators.textops import o_normalize_text  # noqa: E402
from weather_monitoring_spark.operators.quality import (  # noqa: E402
    o_repetition_cols,
)

_O_CUR_REP = o_repetition_cols("t")
EXTRA_SPECS.append(
    QuerySpec(
        name="x_curate_corpus",
        doc=_curate_corpus.__doc__ or "",
        spark=_curate_corpus,
        oracle=f"""
            WITH normed AS (
                SELECT doc_id, {o_normalize_text('text')} AS text_norm
                FROM documents
            ), tk AS (
                SELECT doc_id, text_norm, {o_tokens('text_norm')} AS t
                FROM normed
            ), sig AS (
                SELECT doc_id, text_norm,
                       {_O_CUR_REP['n_tokens']} AS n_tokens,
                       {_O_CUR_REP['dup_token_frac']} AS dup_token_frac,
                       CAST(len(regexp_extract_all(text_norm, '{BLOCK_PATTERNS[0]}'))
                          + len(regexp_extract_all(text_norm, '{BLOCK_PATTERNS[1]}'))
                          AS BIGINT) AS n_blocked_hits
                FROM tk
            )
            SELECT doc_id, text_norm, n_tokens, dup_token_frac, n_blocked_hits,
                   CASE WHEN n_tokens < 5 THEN 'too_short'
                        WHEN dup_token_frac > 0.9 THEN 'repetitive'
                        WHEN n_blocked_hits > 0 THEN 'blocked'
                        ELSE 'kept' END AS verdict
            FROM sig
        """,
        tags=("extra", "text", "curation", "composition"),
    )
)

def _moji_damage() -> str:
    """Every damaged form in MOJIBAKE_TABLE, space-joined — the planted
    dirt, shared verbatim as a Python constant by both engines."""
    from weather_monitoring_spark.operators.textops import MOJIBAKE_TABLE

    return " ".join(bad for bad, _ in MOJIBAKE_TABLE)


def _fix_mojibake_x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windows-1252 mojibake repair over documents with every damaged
    form from the generated table planted (the same Python string
    constant on both engines — the Spark side plants via the Column
    API because Spark's chr() wraps mod 256, unlike DuckDB's
    codepoint chr()): one JVM-side replace chain, zero shuffle;
    'changed' is TRUE on every row because damage is planted, and the
    repaired targets ride the value hash."""
    from weather_monitoring_spark.operators.textops import fix_mojibake

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" " + _moji_damage()),
        ).alias("text"),
    )
    return fix_mojibake(docs)


def _o_fix_mojibake() -> str:
    from weather_monitoring_spark.operators.textops import o_fix_mojibake

    # chr()-built on the DuckDB side so no damaged byte sequence has to
    # survive the SQL parser verbatim (DuckDB chr() is codepoint-true).
    lits = " || ".join(f"chr({ord(c)})" for c in " " + _moji_damage())
    return f"""
        WITH dirty AS (
            SELECT doc_id, concat(coalesce(text, ''), {lits}) AS text
            FROM documents
        )
        SELECT doc_id,
               {o_fix_mojibake('text')} AS text_fixed,
               ({o_fix_mojibake('text')} <> coalesce(text, '')) AS changed
        FROM dirty
    """


EXTRA_SPECS.append(
    QuerySpec(
        name="x_fix_mojibake",
        doc=_fix_mojibake_x.__doc__ or "",
        spark=_fix_mojibake_x,
        oracle=_o_fix_mojibake(),
        tags=("extra", "text", "normalization"),
    )
)

EXTRA_SPECS.append(
    QuerySpec(
        name="x_normalize_text",
        doc=_normalize_text.__doc__ or "",
        spark=_normalize_text,
        oracle=f"""
            WITH dirty AS (SELECT doc_id, {PLANT_DIRT} AS text FROM documents)
            SELECT doc_id,
                   {o_normalize_text('text')} AS text_norm,
                   CAST(length(text) AS BIGINT) AS n_chars_raw,
                   CAST(length({o_normalize_text('text')}) AS BIGINT) AS n_chars_norm
            FROM dirty
        """,
        tags=("extra", "text", "normalization"),
    )
)

EXTRA_SPECS.append(
    QuerySpec(
        name="x_reduce_embeddings",
        doc=_reduce_embeddings.__doc__ or "",
        spark=_reduce_embeddings,
        oracle=o_reduce_embeddings(),
        tags=("extra", "embeddings", "dimensionality-reduction"),
    )
)


# ---- duplicated-span detection / masking (operators/spans.py) ------------

from weather_monitoring_spark.operators.spans import (  # noqa: E402
    DUP_SPAN_MIN_DOCS,
    DUP_SPAN_N,
    dup_spans,
    strip_dup_spans,
)


def _dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup audit view: maximal duplicated token spans (word
    8-grams shared by >= 2 documents, overlapping/adjacent occurrences
    merged) with 1-based inclusive token coordinates. Gram extraction is
    a map-side scan projection; only (gram, doc_id) pairs shuffle, and
    the span merge windows over the (tiny) flagged-position set."""
    return dup_spans(load_table(spark, sf_dir, "documents"))


def _strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring dedup proper: mask every token covered by a duplicated
    span, keeping the lowest-doc_id copy of each gram (exactly one copy
    survives the corpus). The mask is a token-index lambda over the
    per-document flagged-start array — the corpus is never exploded."""
    return strip_dup_spans(load_table(spark, sf_dir, "documents"))


_O_GRAM_POS = f"""
            tk AS (
                SELECT doc_id, {o_tokens('text')} AS t FROM documents
            ), pos AS (
                SELECT doc_id, t,
                       unnest(range(1, len(t) - {DUP_SPAN_N} + 2)) AS pos
                FROM tk WHERE len(t) >= {DUP_SPAN_N}
            ), gp AS (
                SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                       {o_h60_from_md5(
                           "md5('sg' || ':' || array_to_string("
                           f"t[pos:pos + {DUP_SPAN_N} - 1], ' '))"
                       )} AS gk
                FROM pos
            )"""

EXTRA_SPECS.append(
    QuerySpec(
        name="x_dup_spans",
        doc=_dup_spans.__doc__ or "",
        spark=_dup_spans,
        oracle=f"""
            WITH {_O_GRAM_POS}, dup AS (
                SELECT gk FROM gp GROUP BY gk
                HAVING count(DISTINCT doc_id) >= {DUP_SPAN_MIN_DOCS}
            ), fl AS (
                SELECT doc_id, pos FROM gp JOIN dup USING (gk)
            ), sess AS (
                SELECT doc_id, pos,
                       CASE WHEN lag(pos) OVER w IS NULL
                                 OR pos - lag(pos) OVER w > {DUP_SPAN_N}
                            THEN 1 ELSE 0 END AS nf
                FROM fl WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            ), sid AS (
                SELECT doc_id, pos,
                       sum(nf) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
                FROM sess
            )
            SELECT doc_id,
                   CAST(min(pos) AS BIGINT) AS span_start,
                   CAST(max(pos) + {DUP_SPAN_N} - 1 AS BIGINT) AS span_end,
                   CAST(max(pos) + {DUP_SPAN_N} - min(pos) AS BIGINT) AS span_tokens
            FROM sid GROUP BY doc_id, span_id
        """,
        tags=("extra", "dedup", "spans"),
    )
)

def _duplicated_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring-dedup audit view proper: every word 8-gram held by
    >= 2 distinct documents, with its count and min-id keeper. r7: the
    per-document gram distinct is row-local (array_distinct before the
    explode) so the aggregate is a plain count — no count_distinct
    expand; the oracle's SELECT DISTINCT replays the same semantics."""
    from weather_monitoring_spark.operators.spans import duplicated_grams

    return duplicated_grams(load_table(spark, sf_dir, "documents"))


EXTRA_SPECS.append(
    QuerySpec(
        name="x_duplicated_grams",
        doc=_duplicated_grams.__doc__ or "",
        spark=_duplicated_grams,
        oracle=f"""
            WITH tk AS (
                SELECT doc_id, {o_tokens('text')} AS t FROM documents
            ), pos AS (
                SELECT doc_id, t,
                       unnest(range(1, len(t) - {DUP_SPAN_N} + 2)) AS pos
                FROM tk WHERE len(t) >= {DUP_SPAN_N}
            ), gp AS (
                SELECT DISTINCT doc_id,
                       array_to_string(t[pos:pos + {DUP_SPAN_N} - 1], ' ') AS gram
                FROM pos
            )
            SELECT gram, CAST(count(*) AS BIGINT) AS n_docs,
                   min(doc_id) AS keeper
            FROM gp GROUP BY gram
            HAVING count(*) >= {DUP_SPAN_MIN_DOCS}
        """,
        tags=("extra", "dedup", "spans"),
    )
)


EXTRA_SPECS.append(
    QuerySpec(
        name="x_strip_dup_spans",
        doc=_strip_dup_spans.__doc__ or "",
        spark=_strip_dup_spans,
        oracle=f"""
            WITH {_O_GRAM_POS}, dup AS (
                SELECT gk, min(doc_id) AS keeper FROM gp GROUP BY gk
                HAVING count(DISTINCT doc_id) >= {DUP_SPAN_MIN_DOCS}
            ), fl AS (
                SELECT gp.doc_id, gp.pos
                FROM gp JOIN dup USING (gk) WHERE gp.doc_id <> dup.keeper
            ), st AS (
                SELECT doc_id, list(pos ORDER BY pos) AS starts
                FROM fl GROUP BY doc_id
            ), kept AS (
                SELECT tk.doc_id, t,
                       list_filter(t, (x, i) -> len(list_filter(
                           coalesce(starts, []),
                           s -> s <= i AND i <= s + {DUP_SPAN_N} - 1)) = 0
                       ) AS keep
                FROM tk LEFT JOIN st ON tk.doc_id = st.doc_id
            )
            SELECT doc_id,
                   CAST(len(t) AS BIGINT) AS n_tokens,
                   CAST(len(t) - len(keep) AS BIGINT) AS n_masked,
                   coalesce(array_to_string(keep, ' '), '') AS text_clean
            FROM kept
        """,
        tags=("extra", "dedup", "spans"),
    )
)


# ---- LM-novelty scoring (textops.lm_score) -------------------------------

from weather_monitoring_spark.operators.textops import bigram_lm, lm_score  # noqa: E402


def _lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy curation gate: score every document's bigram
    coverage against an LM count table built from the even-doc_id half
    of the corpus (a held-out reference, so odd documents exercise real
    OOV). Exact integer counts + one final IEEE divide — no log-space
    float accumulation, hence bit-identical cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    lm = bigram_lm(docs.filter("doc_id % 2 = 0"))
    return lm_score(docs, lm)


EXTRA_SPECS.append(
    QuerySpec(
        name="x_lm_score",
        doc=_lm_score.__doc__ or "",
        spark=_lm_score,
        oracle=f"""
            WITH ref AS (
                SELECT {o_tokens('text')} AS t FROM documents
                WHERE doc_id % 2 = 0
            ), ref_pairs AS (
                SELECT unnest(list_transform(range(1, len(t)),
                              i -> t[i] || ' ' || t[i+1])) AS pair
                FROM ref WHERE len(t) > 1
            ), cp AS (
                SELECT pair, CAST(count(*) AS BIGINT) AS c_pair
                FROM ref_pairs GROUP BY pair
            ), tk AS (
                SELECT doc_id, {o_tokens('text')} AS t FROM documents
            ), db AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(t)),
                              i -> t[i] || ' ' || t[i+1])) AS pair
                FROM tk WHERE len(t) > 1
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(count(c_pair) AS BIGINT) AS n_known,
                   CAST(count(c_pair) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS known_frac,
                   CAST(sum(coalesce(c_pair, 0)) AS BIGINT) AS c_evidence
            FROM db LEFT JOIN cp USING (pair)
            GROUP BY doc_id
        """,
        tags=("extra", "text", "language-model", "curation"),
    )
)


# ---- multimodal audio/video correctness standing -------------------------

from weather_monitoring_spark.operators.multimodal import (  # noqa: E402
    chunk_audio,
    sample_frames,
)


def _mm_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q61's asset construction (payload = UTF-8 bytes of an ASCII
    md5-chain string, kind = doc_id % 3), reused so audio/video operators
    get the same oracle-computable payloads."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat(F.md5("text"), F.md5(F.concat(F.col("text"), F.lit(":p")))),
            "UTF-8",
        ).alias("payload"),
    )


def _chunk_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-chunking correctness standing: fixed-byte chunks of each
    audio payload with offsets, per-chunk sha256, and the mean byte level
    — the mapInPandas 1-to-N batch shape, value-hash-checked because the
    payload is ASCII text the oracle can slice and re-digest in SQL."""
    return chunk_audio(_mm_assets(spark, sf_dir))


def _sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling correctness standing: deterministic frame
    indices + per-frame sha256 over the payload with an ASCII ordinal
    suffix (NUL-free by design so the SQL oracle can recompute it)."""
    return sample_frames(_mm_assets(spark, sf_dir))


_O_MM_PAYLOAD = "md5(text) || md5(text || ':p')"

EXTRA_SPECS.append(
    QuerySpec(
        name="x_chunk_audio",
        doc=_chunk_audio.__doc__ or "",
        spark=_chunk_audio,
        oracle=f"""
            WITH a AS (
                SELECT doc_id AS asset_id, {_O_MM_PAYLOAD} AS p
                FROM documents WHERE doc_id % 3 = 1
            ), c AS (
                SELECT asset_id, CAST(unnest(range(0, 8)) AS INT) AS chunk_idx, p
                FROM a
            )
            SELECT asset_id, chunk_idx,
                   CAST(chunk_idx * 8 AS BIGINT) AS byte_start,
                   CAST(8 AS BIGINT) AS byte_len,
                   sha256(substr(p, chunk_idx * 8 + 1, 8)) AS chunk_sha256,
                   CAST(list_aggregate(list_transform(range(1, 9),
                            i -> ascii(substr(p, chunk_idx * 8 + CAST(i AS INT), 1))),
                        'sum') AS DOUBLE) / CAST(8 AS DOUBLE) / 255.0 AS mean_level
            FROM c
        """,
        tags=("extra", "multimodal", "pandas-udf"),
    )
)

def _decode_images_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array-typed form of q61: identical decode pipeline, but the
    8-dim feature stays one ``array<double>`` column. The driver's
    canonicalizer cannot factorize list cells, so the registered q61
    projects f0..f7 scalars; this variant keeps the array shape
    oracle-checked (the local harness normalizes iterables)."""
    from weather_monitoring_spark.operators.multimodal import decode_images

    decoded = decode_images(_mm_assets(spark, sf_dir))
    return decoded.select(
        "asset_id",
        "kind",
        "width",
        "height",
        "channels",
        "sha256",
        F.col("feature").cast("array<double>").alias("feature"),
    )


def _o_mm_byte(hex_col: str, i: int) -> str:
    """DuckDB: byte ``i`` (0-based) of the ASCII-hex payload text."""
    return f"ascii(substr({hex_col}, {i + 1}, 1))"


EXTRA_SPECS.append(
    QuerySpec(
        name="x_multimodal_decode_array",
        doc=_decode_images_array.__doc__ or "",
        spark=_decode_images_array,
        oracle=f"""
            WITH a AS (
                SELECT doc_id AS asset_id, md5(text) AS h1, md5(text || ':p') AS h2
                FROM documents WHERE doc_id % 3 = 0
            )
            SELECT asset_id,
                   'image' AS kind,
                   CAST(64 + {_o_mm_byte('h1', 0)} % 192 AS INT) AS width,
                   CAST(64 + {_o_mm_byte('h1', 1)} % 192 AS INT) AS height,
                   CAST(1 + {_o_mm_byte('h1', 2)} % 3 AS INT) AS channels,
                   sha256(h1 || h2) AS sha256,
                   [{", ".join(
                       f"CAST(CAST({_o_mm_byte('h1', i)} / 255.0 AS FLOAT) AS DOUBLE)"
                       for i in range(8)
                   )}] AS feature
            FROM a
        """,
        tags=("extra", "multimodal", "pandas-udf"),
    )
)

EXTRA_SPECS.append(
    QuerySpec(
        name="x_sample_frames",
        doc=_sample_frames.__doc__ or "",
        spark=_sample_frames,
        oracle=f"""
            WITH a AS (
                SELECT doc_id AS asset_id, {_O_MM_PAYLOAD} AS p
                FROM documents WHERE doc_id % 3 = 2
            ), f AS (
                SELECT asset_id, CAST(unnest(range(0, 8)) AS INT) AS i, p
                FROM a
            )
            SELECT asset_id,
                   CAST(i * 4 AS INT) AS frame_idx,
                   sha256(p || ':' || CAST(i AS VARCHAR)) AS frame_sha256
            FROM f
        """,
        tags=("extra", "multimodal", "pandas-udf"),
    )
)


# ---- winnowing fingerprints (operators/winnow.py) ------------------------

from weather_monitoring_spark.operators.dedup import (  # noqa: E402
    SHINGLE_DF_FRAC,
    SHINGLE_DF_MIN,
)
from weather_monitoring_spark.functions.text import o_h32  # noqa: E402
from weather_monitoring_spark.operators.winnow import (  # noqa: E402
    WINNOW_K,
    WINNOW_MIN_SHARED,
    WINNOW_W,
    winnow_fingerprints,
    winnow_matches,
)


def _winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprints: rightmost-min of each window of W
    consecutive k-gram hashes — the position-aware, guarantee-bearing
    fingerprint family (any shared run of >= W+K-1 tokens must produce a
    shared fingerprint). Pure per-row array algebra: zero shuffle."""
    return winnow_fingerprints(load_table(spark, sf_dir, "documents"))


def _winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed-fingerprint document matching: inverted-index join over
    the fingerprint table (cost follows co-occurrence, never n²) with
    the corpus-derived hot-fingerprint df cutoff applied before the
    join — the q32 skew policy on a different fingerprint family."""
    return winnow_matches(load_table(spark, sf_dir, "documents"))


_O_WIN = f"g[j:j+{WINNOW_W - 1}]"
_O_WINNOW_FPS = f"""
            tk AS (
                SELECT doc_id, {o_tokens('text')} AS t FROM documents
            ), gh AS (
                SELECT doc_id,
                       list_transform(range(1, len(t) - {WINNOW_K} + 2),
                           i -> {o_h32('wn', f"array_to_string(t[i:i+{WINNOW_K - 1}], ' ')")}) AS g
                FROM tk WHERE len(t) >= {WINNOW_K + WINNOW_W - 1}
            ), fps0 AS (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, len(g) - {WINNOW_W} + 2),
                           j -> struct_pack(
                               pos := j + {WINNOW_W}
                                      - list_position(list_reverse({_O_WIN}),
                                                      list_min({_O_WIN})),
                               fp := list_min({_O_WIN})))) AS s
                FROM gh
            ), fps AS (
                -- row-level DISTINCT: this DuckDB build can't
                -- list_distinct a STRUCT list
                SELECT DISTINCT doc_id, s FROM fps0
            )"""

EXTRA_SPECS.append(
    QuerySpec(
        name="x_winnow_fingerprints",
        doc=_winnow_fps.__doc__ or "",
        spark=_winnow_fps,
        oracle=f"""
            WITH {_O_WINNOW_FPS}
            SELECT doc_id, s.pos AS pos, s.fp AS fp FROM fps
        """,
        tags=("extra", "dedup", "fingerprints"),
    )
)

EXTRA_SPECS.append(
    QuerySpec(
        name="x_winnow_matches",
        doc=_winnow_matches.__doc__ or "",
        spark=_winnow_matches,
        oracle=f"""
            WITH {_O_WINNOW_FPS}, dfp AS (
                SELECT DISTINCT doc_id AS id, s.fp AS fp FROM fps
            ), cut AS (
                SELECT greatest({SHINGLE_DF_MIN},
                                CAST(ceil({SHINGLE_DF_FRAC} * count(*)) AS BIGINT)) AS c
                FROM documents
            ), hot AS (
                SELECT fp FROM dfp GROUP BY fp
                HAVING count(*) > (SELECT c FROM cut)
            ), ok AS (
                SELECT * FROM dfp WHERE fp NOT IN (SELECT fp FROM hot)
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM ok a JOIN ok b ON a.fp = b.fp AND a.id < b.id
            GROUP BY 1, 2
            HAVING count(*) >= {WINNOW_MIN_SHARED}
        """,
        tags=("extra", "dedup", "fingerprints"),
    )
)


from weather_monitoring_spark.operators.winnow import winnow_contamination  # noqa: E402


def _winnow_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarantee-bearing decontamination: train docs (doc_id % 20 != 0)
    flagged when they share winnowed fingerprints with the eval split
    (doc_id % 20 == 0). Any >= W+K-1-token overlap MUST be flagged (the
    winnowing guarantee) — the audit-grade complement to the shingle-
    count heuristic in x_decontaminate."""
    docs = load_table(spark, sf_dir, "documents")
    return winnow_contamination(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
    )


EXTRA_SPECS.append(
    QuerySpec(
        name="x_winnow_decontaminate",
        doc=_winnow_decontaminate.__doc__ or "",
        spark=_winnow_decontaminate,
        oracle=f"""
            WITH {_O_WINNOW_FPS}, tf AS (
                SELECT DISTINCT doc_id AS id, s.fp AS fp FROM fps
                WHERE doc_id % 20 <> 0
            ), bf AS (
                SELECT DISTINCT s.fp AS fp FROM fps WHERE doc_id % 20 = 0
            ), hits AS (
                SELECT id, CAST(count(*) AS BIGINT) AS n_hits
                FROM tf JOIN bf USING (fp) GROUP BY id
            )
            SELECT d.doc_id,
                   coalesce(hits.n_hits, 0) AS n_hits,
                   hits.n_hits IS NOT NULL AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
            LEFT JOIN hits ON d.doc_id = hits.id
        """,
        tags=("extra", "decontamination", "fingerprints"),
    )
)


from weather_monitoring_spark.operators.winnow import contamination_spans  # noqa: E402


def _contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination LOCALIZATION: token spans of eval-set overlap inside
    flagged train docs (merged winnow-hit positions, exact to within w at
    the edges) — what an audit excises, not just a boolean verdict."""
    docs = load_table(spark, sf_dir, "documents")
    return contamination_spans(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
    )


EXTRA_SPECS.append(
    QuerySpec(
        name="x_contamination_spans",
        doc=_contamination_spans.__doc__ or "",
        spark=_contamination_spans,
        oracle=f"""
            WITH {_O_WINNOW_FPS}, tp AS (
                SELECT DISTINCT doc_id, s.pos AS pos, s.fp AS fp FROM fps
                WHERE doc_id % 20 <> 0
            ), bf AS (
                SELECT DISTINCT s.fp AS fp FROM fps WHERE doc_id % 20 = 0
            ), hits AS (
                SELECT DISTINCT doc_id, pos FROM tp JOIN bf USING (fp)
            ), sess AS (
                SELECT doc_id, pos,
                       CASE WHEN lag(pos) OVER w2 IS NULL
                                 OR pos - lag(pos) OVER w2
                                    > {WINNOW_W + WINNOW_K - 1}
                            THEN 1 ELSE 0 END AS nf
                FROM hits WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
            ), sid AS (
                SELECT doc_id, pos,
                       sum(nf) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
                FROM sess
            )
            SELECT doc_id,
                   CAST(min(pos) AS BIGINT) AS span_start,
                   CAST(max(pos) + {WINNOW_K - 1} AS BIGINT) AS span_end,
                   CAST(count(*) AS BIGINT) AS n_hits
            FROM sid GROUP BY doc_id, span_id
        """,
        tags=("extra", "decontamination", "spans"),
    )
)


# ---- incremental dedup against a persisted fingerprint index -------------

from weather_monitoring_spark.operators.winnow import (  # noqa: E402
    dedup_against_index,
    fingerprint_index,
)


def _incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup, the daily-crawl shape: the corpus split
    doc_id % 4 != 0 plays the historical index (its fingerprint table is
    the persisted artifact), the % 4 == 0 split plays today's batch;
    every batch doc gets (n_hits, is_dup) without the index ever
    shuffling — the batch's fingerprints broadcast into a map-side join."""
    docs = load_table(spark, sf_dir, "documents")
    idx = fingerprint_index(docs.filter(F.col("doc_id") % 4 != 0))
    return dedup_against_index(docs.filter(F.col("doc_id") % 4 == 0), idx)


EXTRA_SPECS.append(
    QuerySpec(
        name="x_incremental_dedup",
        doc=_incremental_dedup.__doc__ or "",
        spark=_incremental_dedup,
        oracle=f"""
            WITH {_O_WINNOW_FPS}, idx AS (
                SELECT DISTINCT s.fp AS fp FROM fps WHERE doc_id % 4 <> 0
            ), nf AS (
                SELECT DISTINCT doc_id AS id, s.fp AS fp FROM fps
                WHERE doc_id % 4 = 0
            ), hits AS (
                SELECT id, CAST(count(*) AS BIGINT) AS n_hits
                FROM nf JOIN idx USING (fp) GROUP BY id
            )
            SELECT d.doc_id,
                   coalesce(hits.n_hits, 0) AS n_hits,
                   coalesce(hits.n_hits, 0) >= {WINNOW_MIN_SHARED} AS is_dup
            FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 0) d
            LEFT JOIN hits ON d.doc_id = hits.id
        """,
        tags=("extra", "dedup", "incremental", "fingerprints"),
    )
)


# ---- quality-aware dedup survivor selection ------------------------------

#: The dedup-cluster component CTE chain (same fragments as
#: x_dedup_clusters / q50: band join -> candidate-bounded Jaccard ->
#: recursive min-label closure).
_O_CLUSTER_COMP = f"""{o_band_candidates()},
            {O_FILTERED_SH},
            shared AS (
                SELECT c.id_a, c.id_b, count(*) AS shared
                FROM cand c
                JOIN sh a ON a.id = c.id_a
                JOIN sh b ON b.id = c.id_b AND b.s = a.s
                GROUP BY 1, 2
            ),
            dup_pairs AS (
                SELECT id_a, id_b
                FROM shared JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
                WHERE shared * 1.0 / (x.n + y.n - shared) >= {JACCARD_THRESHOLD}
            ),
            sym AS (
                SELECT id_a AS a, id_b AS b FROM dup_pairs
                UNION
                SELECT id_b, id_a FROM dup_pairs
            ),
            reach(node, lbl) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
            ),
            comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)"""

EXTRA_SPECS.append(
    QuerySpec(
        name="x_quality_survivors",
        doc=_quality_survivors.__doc__ or "",
        spark=_quality_survivors,
        oracle=f"""
            WITH RECURSIVE {_O_CLUSTER_COMP},
            lab AS (
                SELECT d.doc_id,
                       CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS cluster,
                       CAST(length(d.text) AS DOUBLE) AS quality
                FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
            ),
            rk AS (
                SELECT *, row_number() OVER (
                    PARTITION BY cluster ORDER BY quality DESC, doc_id ASC
                ) AS rn
                FROM lab
            )
            SELECT doc_id, cluster, quality, rn = 1 AS survivor FROM rk
        """,
        tags=("extra", "dedup", "graph", "quality"),
    )
)


# ---- URL / domain curation (round 4) -------------------------------------

#: Deterministic planted URL per document, exercising every
#: canonicalization rule: mixed-case scheme/host, www. prefix, default
#: port, ccTLD second-level suffixes, trailing slash, unsorted +
#: tracker-polluted query strings, fragments. Path uses doc_id % 50 so
#: distinct raw URLs collapse to shared canonical URLs (url_dedup has
#: real groups). Spark and DuckDB generators are literal mirrors.
_PLANT_URL_SPARK = """concat(
    CASE WHEN doc_id % 7 = 0 THEN 'HTTPS' ELSE 'https' END, '://',
    CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
    CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END,
    '.Example',
    CASE WHEN doc_id % 11 = 0 THEN '.co.uk' ELSE '.com' END,
    CASE WHEN doc_id % 13 = 0 THEN ':443' ELSE '' END,
    '/', lang, '/doc/', CAST(doc_id % 50 AS STRING),
    CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
    CASE WHEN doc_id % 2 = 0
         THEN concat('?b=2&a=1&utm_source=x&fbclid=', CAST(doc_id AS STRING))
         ELSE '?a=1&b=2' END,
    CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)"""

_O_PLANT_URL = """(
    CASE WHEN doc_id % 7 = 0 THEN 'HTTPS' ELSE 'https' END || '://' ||
    CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
    CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END ||
    '.Example' ||
    CASE WHEN doc_id % 11 = 0 THEN '.co.uk' ELSE '.com' END ||
    CASE WHEN doc_id % 13 = 0 THEN ':443' ELSE '' END ||
    '/' || lang || '/doc/' || CAST(doc_id % 50 AS VARCHAR) ||
    CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
    CASE WHEN doc_id % 2 = 0
         THEN '?b=2&a=1&utm_source=x&fbclid=' || CAST(doc_id AS VARCHAR)
         ELSE '?a=1&b=2' END ||
    CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)"""


def _with_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_PLANT_URL_SPARK)
    )


def _url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/urlops.py): lowercase scheme/host,
    strip www./default ports/fragments/tracking params, sort surviving
    query params, normalize trailing slash; registrable domain via the
    documented eTLD+1 heuristic. Zero-shuffle projection; every rule is
    mirrored 1:1 in the DuckDB oracle."""
    from weather_monitoring_spark.operators.urlops import canonicalize_urls

    return canonicalize_urls(_with_urls(spark, sf_dir))


def _url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact URL-identity dedup after canonicalization — the cheapest
    dedup stage of a crawl (distinct raw URLs collapse onto shared
    canonical forms; planted paths guarantee real multi-copy groups).
    Shuffles only (16-byte canon digest, id) rows."""
    from weather_monitoring_spark.operators.urlops import url_dedup

    return url_dedup(_with_urls(spark, sf_dir))


def _domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain curation rollup: doc count, distinct
    canonical URLs (the count/distinct gap = within-domain URL
    duplication), total chars — the table a crawl operator ranks and
    blocklists from. |domains| rows, one aggregate."""
    from weather_monitoring_spark.operators.urlops import domain_stats

    return domain_stats(_with_urls(spark, sf_dir))


from weather_monitoring_spark.operators.urlops import (  # noqa: E402
    o_canonical_url,
    o_domain,
)

EXTRA_SPECS.extend(
    [
        QuerySpec(
            name="x_url_canonicalize",
            doc=_url_canonicalize.__doc__ or "",
            spark=_url_canonicalize,
            oracle=f"""
                WITH u AS (SELECT doc_id, {_O_PLANT_URL} AS url FROM documents)
                SELECT doc_id, url,
                       {o_canonical_url("url")} AS canon_url,
                       {o_domain("url")} AS domain
                FROM u
            """,
            tags=("extra", "url", "curation"),
        ),
        QuerySpec(
            name="x_url_dedup",
            doc=_url_dedup.__doc__ or "",
            spark=_url_dedup,
            oracle=f"""
                WITH u AS (SELECT doc_id, {_O_PLANT_URL} AS url FROM documents)
                SELECT coalesce(md5({o_canonical_url("url")}),
                                'null:' || CAST(doc_id AS VARCHAR)) AS url_fp,
                       min(doc_id) AS keeper_doc_id,
                       CAST(count(*) AS BIGINT) AS n_copies
                FROM u GROUP BY 1
            """,
            tags=("extra", "url", "dedup"),
        ),
        QuerySpec(
            name="x_domain_stats",
            doc=_domain_stats.__doc__ or "",
            spark=_domain_stats,
            oracle=f"""
                WITH u AS (SELECT doc_id, length(text) AS len,
                                  {_O_PLANT_URL} AS url
                           FROM documents)
                SELECT {o_domain("url")} AS domain,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(count(DISTINCT {o_canonical_url("url")}) AS BIGINT) AS n_urls,
                       CAST(sum(len) AS BIGINT) AS total_chars
                FROM u GROUP BY 1
            """,
            tags=("extra", "url", "curation"),
        ),
    ]
)


# --------------- HTML -> text extraction (crawl front door) ---------------

#: Deterministic planted HTML per document, exercising every extraction
#: rule: script elements whose BODIES contain '<' (defeats a naive tag
#: strip unless elements are removed first), style blocks, comments,
#: mixed-case tags, the full entity set including the single-pass
#: '&amp;amp;' case, and a doc_id-dependent anchor count. Spark and
#: DuckDB generators are literal mirrors.
_HTML_SCRIPT = '<script type="text/javascript">var i=1; if(i<2){go("<p>")}</script>'
_HTML_A1 = '<a href="/a">one</a>'
_HTML_A2 = '<A HREF="/b">two</A>'


def _plant_html() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit(" &amp;amp; "),
        F.col("lang"),
        F.lit("</title>"),
        F.when(d % 3 == 0, F.lit(_HTML_SCRIPT)).otherwise(F.lit("")),
        F.lit("<style>.m{x:1}</style></head><body>"),
        F.when(d % 4 == 0, F.lit("<!-- chrome -->")).otherwise(F.lit("")),
        F.lit("<h1>Doc &#39;"),
        d.cast("string"),
        F.lit("&#39;</h1><p>"),
        F.col("text"),
        F.lit(" &lt;EOF&gt;&nbsp;</p>"),
        F.when(d % 2 == 0, F.lit(_HTML_A1 + _HTML_A2)).otherwise(F.lit(_HTML_A1)),
        F.lit("</body></html>"),
    )


_O_PLANT_HTML = f"""(
    '<html><head><title>' || source || ' &amp;amp; ' || lang || '</title>' ||
    CASE WHEN doc_id % 3 = 0 THEN '{_HTML_SCRIPT}' ELSE '' END ||
    '<style>.m{{x:1}}</style></head><body>' ||
    CASE WHEN doc_id % 4 = 0 THEN '<!-- chrome -->' ELSE '' END ||
    '<h1>Doc &#39;' || CAST(doc_id AS VARCHAR) || '&#39;</h1><p>' ||
    text || ' &lt;EOF&gt;&nbsp;</p>' ||
    CASE WHEN doc_id % 2 = 0 THEN '{_HTML_A1}{_HTML_A2}' ELSE '{_HTML_A1}' END ||
    '</body></html>')"""


def _html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction (operators/htmlops.py): drop script/style
    ELEMENTS (bodies included — they contain '<' that would defeat a
    naive tag strip), drop comments, strip tags, decode entities
    (single-pass html.unescape ordering: '&amp;' last), collapse
    whitespace; emits markup-vs-text size and anchor-count curation
    signals. One zero-shuffle whole-stage-codegen projection; every
    pattern is RE2-and-Java-safe and mirrored verbatim in the oracle."""
    from weather_monitoring_spark.operators.htmlops import extract_html_text

    docs = load_table(spark, sf_dir, "documents").withColumn("html", _plant_html())
    return extract_html_text(docs)


from weather_monitoring_spark.operators.htmlops import (  # noqa: E402
    o_html_text,
    o_n_anchors,
)

EXTRA_SPECS.append(
    QuerySpec(
        name="x_html_extract",
        doc=_html_extract.__doc__ or "",
        spark=_html_extract,
        oracle=f"""
            WITH h AS (SELECT doc_id, {_O_PLANT_HTML} AS html FROM documents),
                 t AS (SELECT doc_id, html, {o_html_text("html")} AS text FROM h)
            SELECT doc_id, text,
                   CAST(length(html) AS BIGINT) AS html_chars,
                   CAST(length(text) AS BIGINT) AS text_chars,
                   {o_n_anchors("html")} AS n_anchors,
                   CASE WHEN length(html) = 0 THEN 0.0
                        ELSE CAST(length(text) AS DOUBLE) / CAST(length(html) AS DOUBLE)
                   END AS text_ratio
            FROM t
        """,
        tags=("extra", "html", "curation"),
    )
)


def _html_extract_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction with LINE STRUCTURE (lines=True): closing
    block-level tags and <br> become line breaks before the tag strip,
    horizontal whitespace and newline runs collapse separately — the
    front door for line-level curation (c4_rules, line dedup,
    boilerplate stripping). Same planted markup as x_html_extract; the
    paragraph/heading closers in it yield real multi-line text."""
    from weather_monitoring_spark.operators.htmlops import extract_html_text

    docs = load_table(spark, sf_dir, "documents").withColumn("html", _plant_html())
    return extract_html_text(docs, lines=True)


EXTRA_SPECS.append(
    QuerySpec(
        name="x_html_extract_lines",
        doc=_html_extract_lines.__doc__ or "",
        spark=_html_extract_lines,
        oracle=f"""
            WITH h AS (SELECT doc_id, {_O_PLANT_HTML} AS html FROM documents),
                 t AS (SELECT doc_id, html,
                              {o_html_text("html", lines=True)} AS text
                       FROM h)
            SELECT doc_id, text,
                   CAST(length(html) AS BIGINT) AS html_chars,
                   CAST(length(text) AS BIGINT) AS text_chars,
                   {o_n_anchors("html")} AS n_anchors,
                   CASE WHEN length(html) = 0 THEN 0.0
                        ELSE CAST(length(text) AS DOUBLE) / CAST(length(html) AS DOUBLE)
                   END AS text_ratio
            FROM t
        """,
        tags=("extra", "html", "curation"),
    )
)


def _html_extract_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction with PARAGRAPH structure (lines=True,
    paragraphs=True): block-level closers become blank lines, <br>
    stays a single line break, 3+ newline runs fold to one blank line —
    the two-level structure the Gopher A1.2 paragraph rules (split on
    \\n{2,}) require; plain lines=True output can never contain a
    \\n\\n (the r10 advisor fix). Same planted markup as
    x_html_extract_lines."""
    from weather_monitoring_spark.operators.htmlops import extract_html_text

    docs = load_table(spark, sf_dir, "documents").withColumn("html", _plant_html())
    return extract_html_text(docs, lines=True, paragraphs=True)


EXTRA_SPECS.append(
    QuerySpec(
        name="x_html_extract_paragraphs",
        doc=_html_extract_paragraphs.__doc__ or "",
        spark=_html_extract_paragraphs,
        oracle=f"""
            WITH h AS (SELECT doc_id, {_O_PLANT_HTML} AS html FROM documents),
                 t AS (SELECT doc_id, html,
                              {o_html_text("html", lines=True, paragraphs=True)} AS text
                       FROM h)
            SELECT doc_id, text,
                   CAST(length(html) AS BIGINT) AS html_chars,
                   CAST(length(text) AS BIGINT) AS text_chars,
                   {o_n_anchors("html")} AS n_anchors,
                   CASE WHEN length(html) = 0 THEN 0.0
                        ELSE CAST(length(text) AS DOUBLE) / CAST(length(html) AS DOUBLE)
                   END AS text_ratio
            FROM t
        """,
        tags=("extra", "html", "curation"),
    )
)


# ------------- corpus-wide paragraph dedup (Dolma paragraph stage) -------------


def _with_paras(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Three planted paragraphs per document: two text slices (which
    # collide exactly where the testdata plants duplicate documents) and
    # a SHARED-k paragraph with doc_id % 7 collision groups so every
    # document participates in cross-document dedup.
    return load_table(spark, sf_dir, "documents").withColumn(
        "paras",
        F.array(
            F.expr("substring(text, 1, 40)"),
            F.concat(F.lit("SHARED-"), (F.col("doc_id") % 7).cast("string")),
            F.expr("substring(text, 41, 40)"),
        ),
    )


def _dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-WIDE paragraph dedup (operators/lines.py::dedup_paragraphs,
    the Dolma paragraph stage): every distinct paragraph keeps exactly
    one copy — its first (doc_id, position) occurrence — all other
    copies in any document are dropped. Paragraph text never shuffles:
    16-byte digests elect keepers, surviving positions come back as one
    sorted array per document, and documents slice their own arrays
    map-side."""
    from weather_monitoring_spark.operators.lines import dedup_paragraphs

    return dedup_paragraphs(_with_paras(spark, sf_dir))


EXTRA_SPECS.append(
    QuerySpec(
        name="x_dedup_paragraphs",
        doc=_dedup_paragraphs.__doc__ or "",
        spark=_dedup_paragraphs,
        oracle="""
            WITH p AS (
                SELECT doc_id,
                       [substring(text, 1, 40),
                        'SHARED-' || CAST(doc_id % 7 AS VARCHAR),
                        substring(text, 41, 40)] AS paras
                FROM documents),
            px AS (
                SELECT doc_id,
                       unnest(paras) AS para,
                       unnest(range(len(paras))) AS pos
                FROM p),
            flag AS (
                SELECT doc_id, pos,
                       row_number() OVER (PARTITION BY md5(para)
                                          ORDER BY doc_id, pos) AS rn
                FROM px),
            kept AS (
                SELECT doc_id, list(pos ORDER BY pos) AS keep
                FROM flag WHERE rn = 1 GROUP BY doc_id)
            SELECT p.doc_id,
                   CAST(len(p.paras) AS BIGINT) AS n_paras,
                   CAST(coalesce(len(k.keep), 0) AS BIGINT) AS n_kept,
                   coalesce(array_to_string(
                       list_transform(coalesce(k.keep, []), i -> p.paras[i + 1]),
                       chr(10) || chr(10)), '') AS text_clean
            FROM p LEFT JOIN kept k ON p.doc_id = k.doc_id
        """,
        tags=("extra", "dedup", "curation"),
    )
)


# ------------- model-based quality scoring (classifier gate) -------------


def _quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier gate (operators/scoring.py): the
    DCLM/FineWeb-style stage — score every document with a (caller-
    trained) linear model over the engine's curation signals, keep above
    a threshold. One zero-shuffle projection chain; the margin folds
    bias + w*x left-to-right in the declared weight order (IEEE addition
    is not associative — the order IS the cross-engine contract), so the
    DuckDB oracle reproduces every double bit-for-bit."""
    from weather_monitoring_spark.operators.scoring import quality_scores

    return quality_scores(load_table(spark, sf_dir, "documents"))


def _o_quality_features() -> str:
    from weather_monitoring_spark.operators.textops import LANG_LEXICONS

    rep = o_rep_cols("tk")
    lex = list(LANG_LEXICONS["en"])
    return f"""
        SELECT doc_id,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                         / CAST(length(text) AS DOUBLE) END AS alpha_ratio,
               CASE WHEN len(tk) = 0 THEN 0.0
                    ELSE CAST(len(list_filter(tk, t -> list_contains({lex}, t))) AS DOUBLE)
                         / CAST(len(tk) AS DOUBLE) END AS stopword_ratio,
               {rep["top_token_share"]} AS top_token_share,
               {rep["top_bigram_share"]} AS top_bigram_share,
               {rep["dup_token_frac"]} AS dup_token_frac
        FROM (SELECT doc_id, text, {o_tokens("text")} AS tk FROM documents)
    """


from weather_monitoring_spark.operators.quality import (  # noqa: E402
    o_repetition_cols as o_rep_cols,
)
from weather_monitoring_spark.operators.scoring import (  # noqa: E402
    DEFAULT_QUALITY_THRESHOLD,
    o_quality_score,
)

EXTRA_SPECS.append(
    QuerySpec(
        name="x_quality_score",
        doc=_quality_score.__doc__ or "",
        spark=_quality_score,
        oracle=f"""
            WITH f AS ({_o_quality_features()})
            SELECT doc_id, alpha_ratio, stopword_ratio, top_token_share,
                   top_bigram_share, dup_token_frac,
                   {o_quality_score()} AS quality_score,
                   {o_quality_score()} >= CAST({float(DEFAULT_QUALITY_THRESHOLD)} AS DOUBLE) AS keep
            FROM f
        """,
        tags=("extra", "quality", "curation"),
    )
)


# ------------- LSH recall audit (oracle-checked observability) -------------


def _lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall audit (operators/dedup.py::estimate_lsh_recall) as a
    full cross-engine composition: exact ground-truth pairs AND banding
    candidates both rebuilt in DuckDB from the shared constants, so the
    one-row (n_true, n_caught, recall) report hash-matches. sample_k
    covers the whole sf table, making the deterministic sample the
    identity — the sampling path itself is pinned by sample_exact_k's
    partition-independence test."""
    from weather_monitoring_spark.operators.dedup import estimate_lsh_recall

    # sample_k must stay buffer-sized even as the whole-table identity:
    # orderBy().limit(k) plans as TakeOrderedAndProject, which allocates
    # k-capacity heaps per partition — an "unbounded" sentinel like 1e9
    # OOMs on allocation alone. 100k >= every sf table here.
    return estimate_lsh_recall(
        load_table(spark, sf_dir, "documents"), sample_k=100_000
    )


EXTRA_SPECS.append(
    QuerySpec(
        name="x_lsh_recall_audit",
        doc=_lsh_recall_audit.__doc__ or "",
        spark=_lsh_recall_audit,
        oracle=f"""
            WITH {o_band_candidates()},
            {O_FILTERED_SH},
            truth AS (
                SELECT id_a, id_b FROM (
                    SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
                    FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                    GROUP BY 1, 2
                ) s JOIN sz x ON s.id_a = x.id JOIN sz y ON s.id_b = y.id
                WHERE shared * 1.0 / (x.n + y.n - shared) >= {JACCARD_THRESHOLD}
            ),
            caught AS (
                SELECT t.id_a, t.id_b FROM truth t
                JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
            )
            SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
                   CAST((SELECT count(*) FROM caught) AS BIGINT) AS n_caught,
                   CASE WHEN (SELECT count(*) FROM truth) > 0
                        THEN CAST((SELECT count(*) FROM caught) AS DOUBLE)
                             / CAST((SELECT count(*) FROM truth) AS DOUBLE)
                   END AS recall
        """,
        tags=("extra", "dedup", "observability"),
    )
)


# ------------- DSIR importance weights (cross-engine exact) -----------------


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (operators/dsir.py): raw = every
    document, target = the lang='en' subset — per-doc hashed-ngram log
    importance weights, cross-engine EXACT despite ln() not being a
    cross-engine function (clipped counts close the log domain to a
    quantized literal table both engines sum in exact decimal)."""
    from weather_monitoring_spark.operators.dsir import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(docs, docs.filter("lang = 'en'"))


def _o_dsir():
    from weather_monitoring_spark.operators.dsir import o_dsir_weights_sql

    return o_dsir_weights_sql("TRUE", "lang = 'en'")


EXTRA_SPECS.append(
    QuerySpec(
        name="x_dsir_weights",
        doc=_dsir_weights.__doc__ or "",
        spark=_dsir_weights,
        oracle=_o_dsir(),
        tags=("extra", "selection", "curation"),
    )
)


# ------------- trigram language-ID (cross-engine exact) ---------------------


def _langid_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID (operators/langid.py): script-range
    detection for non-Latin scripts, then the Cavnar-Trenkle rank-profile
    argmax over the vendored integer-weight trigram profiles — every
    scoring step integer-exact, so the full output (prediction, score,
    margin, confidence) hash-matches DuckDB running the same profile
    rows inline."""
    from weather_monitoring_spark.operators.langid import lang_id_trigram

    return lang_id_trigram(load_table(spark, sf_dir, "documents"))


def _o_langid():
    from weather_monitoring_spark.operators.langid import o_langid_sql

    return o_langid_sql()


EXTRA_SPECS.append(
    QuerySpec(
        name="x_langid_trigram",
        doc=_langid_trigram.__doc__ or "",
        spark=_langid_trigram,
        oracle=_o_langid(),
        tags=("extra", "text", "language-id"),
    )
)


# ---- embedding clustering / cluster-balanced sampling (clustering.py) ----


def _kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic spherical k-means over the embeddings table:
    md5-seeded, fixed-iteration, with the QUANTIZED Lloyd update (int64
    sums — order-independent, hence bit-reproducible under any
    partitioning and cross-engine-exact; operators/clustering.py). The
    oracle replays the identical algorithm as an unrolled CTE chain and
    both cluster ids and cosines must match by float hex."""
    from weather_monitoring_spark.operators.clustering import kmeans_embeddings

    return kmeans_embeddings(load_table(spark, sf_dir, "embeddings"))


def _cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-capped sampling over the k-means assignment (the
    topic-rebalancing stage): at most CLUSTER_SAMPLE_CAP vectors per
    cluster by deterministic md5 rank within the cluster."""
    from weather_monitoring_spark.operators.clustering import (
        cluster_balanced_sample,
    )

    return cluster_balanced_sample(load_table(spark, sf_dir, "embeddings"))


def _o_kmeans():
    from weather_monitoring_spark.operators.clustering import o_kmeans_sql

    return o_kmeans_sql()


def _o_cluster_sample():
    from weather_monitoring_spark.operators.clustering import (
        o_cluster_balanced_sample_sql,
    )

    return o_cluster_balanced_sample_sql()


EXTRA_SPECS.extend(
    [
        QuerySpec(
            name="x_kmeans_clusters",
            doc=_kmeans_clusters.__doc__ or "",
            spark=_kmeans_clusters,
            oracle=_o_kmeans(),
            tags=("extra", "embeddings", "clustering"),
        ),
        QuerySpec(
            name="x_cluster_balanced_sample",
            doc=_cluster_balanced_sample.__doc__ or "",
            spark=_cluster_balanced_sample,
            oracle=_o_cluster_sample(),
            tags=("extra", "embeddings", "clustering", "sampling"),
        ),
    ]
)


def _semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (cluster-scoped semantic dedup): deterministic k-means
    blocks the corpus, exact cosine pairs are scored only within each
    cluster (quadratic cost drops n² -> Σ cluster_size², the k knob),
    connected components elect one min-id survivor per component. The
    cross-cluster-pair recall tradeoff is the published SemDeDup
    semantics; the deterministic quantized k-means makes the blocking
    itself reproducible, so the oracle replays the ENTIRE pipeline —
    clustering included — and ids must match exactly."""
    from weather_monitoring_spark.operators.clustering import semdedup_survivors

    return semdedup_survivors(load_table(spark, sf_dir, "embeddings"))


def _o_semdedup():
    from weather_monitoring_spark.operators.clustering import (
        KMEANS_CLUSTERS,
        KMEANS_ITERS,
        SEMDEDUP_CLUSTER_CAP_FACTOR,
        SEMDEDUP_CLUSTER_CAP_MIN,
        _o_kmeans_ctes,
    )

    ctes = _o_kmeans_ctes(
        KMEANS_CLUSTERS, KMEANS_ITERS, 64, "embeddings", "vec_id", "embedding"
    )
    # The degenerate-cluster guard replayed from the same constants as
    # semdedup_pairs(max_cluster_size="auto"): over-cap clusters divert
    # to exact-vector star pairs (min-id keeper per identical embedding).
    return f"""
        WITH RECURSIVE {ctes},
        asg AS (
            SELECT t.vec_id, t.embedding, s.c
            FROM embeddings t JOIN a{KMEANS_ITERS} s ON s.vec_id = t.vec_id
        ),
        ccut AS (
            SELECT greatest({SEMDEDUP_CLUSTER_CAP_MIN},
                            CAST(ceil({SEMDEDUP_CLUSTER_CAP_FACTOR} * count(*)
                                      / {KMEANS_CLUSTERS}.0) AS BIGINT)) AS cut
            FROM embeddings
        ),
        hotc AS (
            SELECT c FROM asg GROUP BY c
            HAVING count(*) > (SELECT cut FROM ccut)
        ),
        coldm AS (SELECT * FROM asg WHERE c NOT IN (SELECT c FROM hotc)),
        hotm AS (SELECT * FROM asg WHERE c IN (SELECT c FROM hotc)),
        hotkeep AS (
            SELECT embedding, min(vec_id) AS keeper FROM hotm GROUP BY embedding
        ),
        dup_pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM coldm a JOIN coldm b ON a.c = b.c AND a.vec_id < b.vec_id
            WHERE {_o_cosine('a.embedding', 'b.embedding')} >= {COSINE_NEARDUP_THRESHOLD}
            UNION ALL
            SELECT k.keeper AS id_a, m.vec_id AS id_b
            FROM hotm m JOIN hotkeep k ON m.embedding = k.embedding
            WHERE m.vec_id > k.keeper
        ),
        sym AS (
            SELECT id_a AS ga, id_b AS gb FROM dup_pairs
            UNION
            SELECT id_b, id_a FROM dup_pairs
        ),
        reach(node, lbl) AS (
            SELECT ga, ga FROM sym
            UNION
            SELECT s.gb, r.lbl FROM reach r JOIN sym s ON s.ga = r.node
        ),
        comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
        SELECT e.vec_id,
               CAST(coalesce(c.component, e.vec_id) AS BIGINT) AS cluster,
               e.vec_id = CAST(coalesce(c.component, e.vec_id) AS BIGINT) AS survivor
        FROM embeddings e LEFT JOIN comp c ON c.node = e.vec_id
    """


EXTRA_SPECS.append(
    QuerySpec(
        name="x_semdedup_survivors",
        doc=_semdedup_survivors.__doc__ or "",
        spark=_semdedup_survivors,
        oracle=_o_semdedup(),
        tags=("extra", "embeddings", "clustering", "dedup", "pipeline"),
    )
)


def _cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster topic labels: cluster-level TF-IDF (cluster = the
    'document' unit; raw N/df inverse frequency, no log — bit-stable)
    over the documents assigned to each k-means cluster, top 5 terms
    per cluster. The whole composition — deterministic quantized
    k-means included — replays in DuckDB and must hash-match."""
    from weather_monitoring_spark.operators.clustering import cluster_topics

    return cluster_topics(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )


def _o_cluster_topics():
    from weather_monitoring_spark.operators.clustering import (
        CLUSTER_TOPIC_TERMS,
        KMEANS_CLUSTERS,
        KMEANS_ITERS,
        _o_kmeans_ctes,
    )

    ctes = _o_kmeans_ctes(
        KMEANS_CLUSTERS, KMEANS_ITERS, 64, "embeddings", "vec_id", "embedding"
    )
    return f"""
        WITH {ctes},
        lab AS (
            SELECT s.c AS cluster, d.doc_id, d.text
            FROM documents d JOIN a{KMEANS_ITERS} s ON s.vec_id = d.doc_id
        ),
        tok AS (
            SELECT cluster, unnest({o_tokens('text')}) AS token FROM lab
        ),
        tf AS (
            SELECT cluster, token, CAST(count(*) AS BIGINT) AS tf
            FROM tok GROUP BY cluster, token
        ),
        dfq AS (
            SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
        ),
        kc AS (SELECT CAST(count(DISTINCT cluster) AS DOUBLE) AS k FROM tf),
        scored AS (
            SELECT tf.cluster, tf.token, tf.tf, dfq.df,
                   CAST(tf.tf AS DOUBLE) * ((SELECT k FROM kc) / CAST(dfq.df AS DOUBLE)) AS score
            FROM tf JOIN dfq USING (token)
        )
        SELECT cluster, token, tf, df, score, term_rank FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY cluster
                       ORDER BY score DESC, token ASC) AS BIGINT) AS term_rank
            FROM scored)
        WHERE term_rank <= {CLUSTER_TOPIC_TERMS}
    """


EXTRA_SPECS.append(
    QuerySpec(
        name="x_cluster_topics",
        doc=_cluster_topics.__doc__ or "",
        spark=_cluster_topics,
        oracle=_o_cluster_topics(),
        tags=("extra", "embeddings", "clustering", "text"),
    )
)


# ---- Gopher quality rules (operators/quality.py) -------------------------


def _gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete Gopher heuristic rule set (Rae et al. 2021, Appendix
    A1.1) in one zero-shuffle projection: word-count bounds, mean word
    length, symbol-to-word ratio, bullet/ellipsis line fractions,
    alphabetic-word fraction, required-stopword floor — plus the
    first-failing-rule verdict every document gets (the curate_corpus
    audit discipline). All ratios are single IEEE divisions of exact
    BIGINTs, so the full frame hash-matches the oracle."""
    from weather_monitoring_spark.operators.quality import gopher_rules

    return gopher_rules(load_table(spark, sf_dir, "documents"))


def _o_gopher() -> str:
    from weather_monitoring_spark.operators.quality import o_gopher_rules_sql

    return o_gopher_rules_sql()


EXTRA_SPECS.append(
    QuerySpec(
        name="x_gopher_rules",
        doc=_gopher_rules.__doc__ or "",
        spark=_gopher_rules,
        oracle=_o_gopher(),
        tags=("extra", "quality", "curation"),
    )
)


SEMDECON_TAU = 0.4  # testdata embeddings are near-orthogonal; the
# operator default (0.85) would find nothing to check at sf0.01


def _semantic_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-axis decontamination (the third axis of the family:
    exact n-gram overlap, winnow run-length guarantee, and this —
    paraphrased leakage that shares no 3-gram): train docs whose cosine
    vs ANY bench vector clears the threshold. Composition of the exact
    cosine_neardup machinery over a side-tagged union (bench ids in the
    negative space); zero-filled clean verdicts for every train row."""
    from weather_monitoring_spark.operators.training_prep import (
        semantic_decontaminate,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_decontaminate(
        emb.filter("vec_id % 97 != 0"),
        emb.filter("vec_id % 97 = 0"),
        threshold=SEMDECON_TAU,
    )


def _o_semantic_decon() -> str:
    return f"""
        WITH train AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id % 97 <> 0),
             bench AS (SELECT embedding AS bvec FROM embeddings
                       WHERE vec_id % 97 = 0),
             hits AS (
                 SELECT vec_id, {_o_cosine("embedding", "bvec")} AS cosine
                 FROM train, bench
                 WHERE {_o_cosine("embedding", "bvec")} >= {SEMDECON_TAU}
             ),
             agg AS (SELECT vec_id, max(cosine) AS max_cos,
                            CAST(count(*) AS BIGINT) AS n_bench_hits
                     FROM hits GROUP BY vec_id)
        SELECT train.vec_id,
               agg.max_cos IS NOT NULL AS contaminated,
               agg.max_cos,
               coalesce(agg.n_bench_hits, 0) AS n_bench_hits
        FROM train LEFT JOIN agg USING (vec_id)
    """


EXTRA_SPECS.append(
    QuerySpec(
        name="x_semantic_decontaminate",
        doc=_semantic_decon.__doc__ or "",
        spark=_semantic_decon,
        oracle=_o_semantic_decon(),
        tags=("extra", "decontamination", "embeddings"),
    )
)


def _hashed_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing TF vectors (Weinberger et al. 2009): tokens land
    in h32(token) %% dim buckets; unit=True L2-normalizes — exact-int
    counts, exact-int squared norm, and IEEE sqrt/divide are
    correctly-rounded (unlike ln), so even normalized components are
    bit-stable cross-engine. Bridges TEXT corpora into the vector
    family (kmeans/SemDeDup/ANN/JL) without a trained embedding model;
    one zero-shuffle projection."""
    from weather_monitoring_spark.operators.embeddings import hashed_tf_vectors

    return hashed_tf_vectors(
        load_table(spark, sf_dir, "documents"), dim=32, unit=True
    )


def _o_hashed_tf() -> str:
    from weather_monitoring_spark.operators.embeddings import (
        o_hashed_tf_vectors,
    )

    return o_hashed_tf_vectors(dim=32, unit=True)


EXTRA_SPECS.append(
    QuerySpec(
        name="x_hashed_tf_vectors",
        doc=_hashed_tf.__doc__ or "",
        spark=_hashed_tf,
        oracle=_o_hashed_tf(),
        tags=("extra", "embeddings", "vectorize"),
    )
)


PR_ITERS = 4
#: deterministic synthetic link graph over the documents table: two
#: out-links per doc via LCG-style arithmetic (pure BIGINT ops, same on
#: both engines) — testdata has no link column, the OPERATOR is the
#: thing under oracle test.
PR_EDGES_SQL = (
    "SELECT doc_id AS src, (doc_id * 48271 + 11) % 997 AS dst FROM documents "
    "UNION ALL "
    "SELECT doc_id AS src, (doc_id * 16807 + 7) % 997 AS dst FROM documents"
)


def _pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PageRank (operators/graph.py): ALL arithmetic in
    scaled int64 (ranks at 2^40, damping as the exact ratio 17/20,
    floor divisions, dangling mass redistributed floor(dm/N) — textbook
    semantics, still exact) so contribution sums are order-free and
    every iteration is bit-reproducible under ANY partitioning — float
    PageRank is not (IEEE addition is not associative). The oracle
    unrolls the same iterations as a CTE chain (each gaining a 1-row
    dangling-mass CTE); link-graph authority is the classic
    crawl-curation quality prior."""
    from weather_monitoring_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    e = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 48271 + 11) % 997).alias("dst"),
    ).unionAll(
        docs.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 16807 + 7) % 997).alias("dst"),
        )
    )
    return pagerank(e, iterations=PR_ITERS, checkpoint=False)


def _o_pagerank() -> str:
    from weather_monitoring_spark.operators.graph import o_pagerank

    return o_pagerank(PR_EDGES_SQL, iterations=PR_ITERS)


EXTRA_SPECS.append(
    QuerySpec(
        name="x_pagerank",
        doc=_pagerank.__doc__ or "",
        spark=_pagerank,
        oracle=_o_pagerank(),
        tags=("extra", "graph", "curation"),
    )
)


BM25_QUERY = ("spark", "window", "batch")


def _bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the corpus (the reference's
    Elasticsearch search surface re-expressed Spark-native): log-IDF
    (the Lucene/ES weighting) via the quantized integer-ln literal
    tables — ln(2N+2) - ln(2df+1) with both arguments exact BIGINTs, so
    no per-engine transcendental ever runs (the DSIR quantized-ln
    discipline; raw ln is not cross-engine bit-stable). All other
    factors IEEE ops of exact BIGINTs in a fixed mirrored order. The
    corpus stats (N, avgdl, per-term df) are ONE single-row aggregate
    broadcast back; the corpus never shuffles; top-k plans as
    TakeOrderedAndProject."""
    from weather_monitoring_spark.operators.retrieval import bm25_topk

    return bm25_topk(
        load_table(spark, sf_dir, "documents"), BM25_QUERY, top_k=25
    )


def _o_bm25() -> str:
    from weather_monitoring_spark.operators.retrieval import o_bm25_topk

    return o_bm25_topk(BM25_QUERY, top_k=25)


EXTRA_SPECS.append(
    QuerySpec(
        name="x_bm25_topk",
        doc=_bm25_topk.__doc__ or "",
        spark=_bm25_topk,
        oracle=_o_bm25(),
        tags=("extra", "retrieval", "search"),
    )
)


def _plant_structured_text() -> F.Column:
    """Multi-line / multi-paragraph text planted from the document's own
    bytes (the _plant_html discipline): the raw ``documents.text`` has
    ZERO newlines (measured), so without planting, the line/paragraph
    legs of the repetition rules compute trivially (one line, one
    paragraph) and the cross-engine check never exercises them. Classes:
    every 3rd doc carries a DUPLICATE LINE pair inside paragraph 1;
    every 4th doc repeats an 80-char slice as two identical standalone
    PARAGRAPHS; every doc has >= 2 lines and >= 2 paragraphs."""
    d = F.col("doc_id")
    p1 = F.substring(F.col("text"), 1, 80)
    return F.concat(
        p1,
        F.lit("\n"),
        F.when(
            d % 3 == 0, F.lit("dup line marker\ndup line marker\n")
        ).otherwise(F.lit("")),
        F.substring(F.col("text"), 41, 80),
        F.lit("\n\n"),
        F.when(d % 4 == 0, F.concat(p1, F.lit("\n\n"), p1, F.lit("\n\n")))
        .otherwise(F.lit("")),
        F.lit("closing paragraph of doc "),
        d.cast("string"),
    )


_O_PLANT_STRUCTURED = """(
    substring(text, 1, 80) || chr(10) ||
    CASE WHEN doc_id % 3 = 0
         THEN 'dup line marker' || chr(10) || 'dup line marker' || chr(10)
         ELSE '' END ||
    substring(text, 41, 80) || chr(10) || chr(10) ||
    CASE WHEN doc_id % 4 = 0
         THEN substring(text, 1, 80) || chr(10) || chr(10)
           || substring(text, 1, 80) || chr(10) || chr(10)
         ELSE '' END ||
    'closing paragraph of doc ' || CAST(doc_id AS VARCHAR))"""


def _gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher REPETITION rule set (Rae et al. Table A1 section A1.2):
    duplicate line/paragraph fractions and character fractions, top-
    {2,3,4}-gram character fraction (most-frequent gram, count >= 2),
    duplicated-{5..10}-gram character coverage (interval-union, overlaps
    once), paper thresholds as a first-failing verdict, over PLANTED
    multi-line/multi-paragraph text (r10: the raw table has no newlines,
    so the line/paragraph legs were never oracle-exercised before).
    Zero-shuffle row-local array algebra (sort-adjacency dup detection);
    the oracle replays the definitions as list comprehensions; all
    numerators exact BIGINTs, each fraction ONE IEEE divide."""
    from weather_monitoring_spark.operators.quality import (
        gopher_repetition_rules,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _plant_structured_text().alias("text")
    )
    return gopher_repetition_rules(docs)


def _o_gopher_rep() -> str:
    from weather_monitoring_spark.operators.quality import (
        o_gopher_repetition_sql,
    )

    return o_gopher_repetition_sql(
        source=f"(SELECT doc_id, {_O_PLANT_STRUCTURED} AS text FROM documents)"
    )


EXTRA_SPECS.append(
    QuerySpec(
        name="x_gopher_repetition",
        doc=_gopher_repetition.__doc__ or "",
        spark=_gopher_repetition,
        oracle=_o_gopher_rep(),
        tags=("extra", "quality", "curation"),
    )
)


def _plant_c4_page() -> F.Column:
    """Multi-line page text planted from the document's own bytes (the
    same r10 rationale as _plant_structured_text: raw documents.text has
    no newlines, so the oracle check split every page into ONE line and
    the line-keep/rebuild legs ran trivially). Line classes: two keeper
    sentences (terminal '.', >= 3 words), a too-short line, a
    javascript line on every 4th doc; page classes: a brace drop on
    every 5th, lorem ipsum on every 7th (brace precedence covers the
    overlap), and 4 extra sentences on every 2nd so verdicts split
    kept vs too_few_sentences."""
    d = F.col("doc_id")
    return F.concat(
        F.lit("First full sentence stays with "),
        F.substring(F.col("text"), 1, 8),
        F.lit(" inside.\ntiny\n"),
        F.when(
            d % 4 == 0,
            F.lit("Please enable javascript to view this page.\n"),
        ).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("some lorem ipsum filler text\n")).otherwise(
            F.lit("")
        ),
        F.lit("Second keeper sentence number "),
        d.cast("string"),
        F.lit(" stays.\n"),
        F.when(
            d % 2 == 0,
            F.lit("Extra one. Extra two. Extra three. Extra four.\n"),
        ).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("code { sample }\n")).otherwise(F.lit("")),
    )


_O_PLANT_C4 = """(
    'First full sentence stays with ' || substring(text, 1, 8) ||
    ' inside.' || chr(10) || 'tiny' || chr(10) ||
    CASE WHEN doc_id % 4 = 0
         THEN 'Please enable javascript to view this page.' || chr(10)
         ELSE '' END ||
    CASE WHEN doc_id % 7 = 0
         THEN 'some lorem ipsum filler text' || chr(10) ELSE '' END ||
    'Second keeper sentence number ' || CAST(doc_id AS VARCHAR) ||
    ' stays.' || chr(10) ||
    CASE WHEN doc_id % 2 = 0
         THEN 'Extra one. Extra two. Extra three. Extra four.' || chr(10)
         ELSE '' END ||
    CASE WHEN doc_id % 5 = 0 THEN 'code { sample }' || chr(10) ELSE '' END)"""


def _c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning rule set (Raffel et al. 2020 section 2.2): line-level
    keep predicate (terminal punctuation, >= 3 words, no 'javascript')
    rebuilding text_clean, plus the paper's page-level drops (brace /
    lorem ipsum / bad-word list / < 5 sentences) as a first-failing
    verdict — over PLANTED multi-line pages (r10: the raw table has no
    newlines, so the line legs ran on one-line pages before). One
    zero-shuffle projection; counts exact BIGINTs, strings byte-built —
    the whole frame hash-matches with no IEEE terms."""
    from weather_monitoring_spark.operators.quality import c4_rules

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _plant_c4_page().alias("text")
    )
    return c4_rules(docs)


def _o_c4() -> str:
    from weather_monitoring_spark.operators.quality import o_c4_rules_sql

    return o_c4_rules_sql(
        source=f"(SELECT doc_id, {_O_PLANT_C4} AS text FROM documents)"
    )


EXTRA_SPECS.append(
    QuerySpec(
        name="x_c4_rules",
        doc=_c4_rules.__doc__ or "",
        spark=_c4_rules,
        oracle=_o_c4(),
        tags=("extra", "quality", "curation"),
    )
)


# ---- leakage-safe split (operators/graph.py) -----------------------------


def _leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/val/test split: near-dup clusters (MinHash-LSH
    candidates -> candidate-bounded exact Jaccard -> connected
    components) are hashed by CLUSTER label, so near-duplicates can
    never straddle train and test — the leak a per-document hash split
    (q59) permits and decontamination pipelines exist to patch. The
    recursive oracle replays the clustering fixpoint AND the md5 bucket
    mapping, so the full assignment hash-matches."""
    from weather_monitoring_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_verify,
    )
    from weather_monitoring_spark.operators.graph import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    verified = ngram_jaccard_verify(docs, minhash_lsh_pairs(docs))
    return leakage_safe_split(docs, verified.select("id_a", "id_b"))


def _o_leakage_split() -> str:
    from weather_monitoring_spark.operators.graph import (
        SPLIT_SALT,
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
    )

    bucket = (
        "CAST(('0x' || substr(md5(CAST(cluster AS VARCHAR) ||"
        f" ':{SPLIT_SALT}'), 1, 8)) AS BIGINT) % 100"
    )
    return f"""
        WITH RECURSIVE {o_band_candidates()},
        {O_FILTERED_SH},
        shared AS (
            SELECT c.id_a, c.id_b, count(*) AS shared
            FROM cand c
            JOIN sh a ON a.id = c.id_a
            JOIN sh b ON b.id = c.id_b AND b.s = a.s
            GROUP BY 1, 2
        ),
        dup_pairs AS (
            SELECT id_a, id_b
            FROM shared JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
            WHERE shared * 1.0 / (x.n + y.n - shared) >= {JACCARD_THRESHOLD}
        ),
        sym AS (
            SELECT id_a AS a, id_b AS b FROM dup_pairs
            UNION
            SELECT id_b, id_a FROM dup_pairs
        ),
        reach(node, lbl) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
        ),
        comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
        lab AS (
            SELECT d.doc_id,
                   CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS cluster
            FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        ), bk AS (
            SELECT doc_id, cluster, {bucket} AS bucket FROM lab
        )
        SELECT doc_id, cluster, bucket,
               CASE WHEN bucket < {SPLIT_TRAIN_PCT} THEN 'train'
                    WHEN bucket < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM bk
    """


EXTRA_SPECS.append(
    QuerySpec(
        name="x_leakage_safe_split",
        doc=_leakage_safe_split.__doc__ or "",
        spark=_leakage_safe_split,
        oracle=_o_leakage_split(),
        tags=("extra", "split", "dedup", "graph"),
    )
)


# ---- corpus divergence (operators/dsir.py) -------------------------------


def _corpus_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional drift between two corpus halves (even vs odd
    doc_id) over the DSIR hashed-gram feature space: total-variation
    distance + Pearson chi-square on add-one-smoothed clipped bucket
    models. TV/chi2 instead of KL because ln(N) for unbounded totals is
    not cross-engine bit-stable; these are pure IEEE arithmetic summed
    by ONE bucket-ordered sequential fold on both engines, so the row
    hash-matches exactly."""
    from weather_monitoring_spark.operators.dsir import corpus_divergence

    docs = load_table(spark, sf_dir, "documents")
    return corpus_divergence(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )


def _o_divergence() -> str:
    from weather_monitoring_spark.operators.dsir import o_corpus_divergence_sql

    return o_corpus_divergence_sql()


EXTRA_SPECS.append(
    QuerySpec(
        name="x_corpus_divergence",
        doc=_corpus_divergence.__doc__ or "",
        spark=_corpus_divergence,
        oracle=_o_divergence(),
        tags=("extra", "training-prep", "observability"),
    )
)
