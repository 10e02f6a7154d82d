"""Mergeable frequency sketches — bounded-shuffle hot-key detection.

The skew guards in this repo (hot-shingle df cutoff in
operators/dedup.py, hot-fingerprint cutoff in operators/winnow.py,
hot-bucket caps in the LSH band joins) all need the same primitive:
"which keys are heavy?". The exact answer is a full groupBy over the
key column — fine when the key universe is modest, but at 100 TB a
shingle/URL/token column can carry 10^11 distinct keys, and the exact
groupBy shuffles ALL of them to answer a question about the top
handful.

`heavy_hitters` answers it with a Misra-Gries summary instead, whose
shuffle is bounded by (num_partitions x k) rows REGARDLESS of key
cardinality:

- per partition: a k-counter Misra-Gries summary folded one Arrow
  batch at a time (merge the batch's counts, subtract the (k+1)-th
  largest from everyone, keep the positives) — memory stays
  O(k + batch cardinality) however many distinct keys the partition
  holds, and each trim removes >= (k+1)x its cut, so the total
  undercount stays <= n_p/(k+1);
- merge: MG summaries are mergeable (Agarwal et al., "Mergeable
  Summaries", PODS'12) — summing per-key lower bounds across
  partitions is again a valid summary with error bounded by the SUM of
  the per-partition errors, i.e. <= n/(k+1) total.

Guarantees (asserted in tests/test_sketches.py):

- ANY key with true frequency > n/(k+1) is present in the output
  (no false negatives above the threshold);
- every reported `count_lb` is a lower bound of the true count, within
  n/(k+1) of it.

The output is partitioning-dependent (WHICH sub-threshold keys appear
may vary), so this is deliberately a pytest-guarantee operator, not a
DuckDB-hash-oracle one — same policy as the HLL/GK sketch demo
(plans/analytics_queries.py:117).

Reference parity: no sketch surface in the reference; extends the
engine per the builder brief (skew detection at crawl scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, key_col: str, k: int = 1000) -> DataFrame:
    """Misra-Gries heavy-hitters candidates over ``df[key_col]``.

    Returns (key, count_lb) with at most ~k rows: every key whose true
    frequency exceeds n/(k+1) is guaranteed present, and count_lb is a
    lower bound within n/(k+1) of the true count. Shuffle volume is
    bounded by partitions x k rows — independent of key cardinality.

    The per-partition summary runs in pandas (Arrow-batched) because MG
    truncation needs a per-partition rank cut, which has no single-pass
    Column-algebra form; the merge is a plain map-side-combined sum.
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def summarize(batches):
        import pandas as pd

        # True bounded-memory Misra-Gries: the counter dict is trimmed
        # back to <= k entries after EVERY Arrow batch (merge the
        # batch's counts, then subtract the (k+1)-th largest count from
        # everyone and keep the positives). Memory is O(k + batch
        # cardinality), never O(partition cardinality) — a partition of
        # a 100 TB key column can carry millions of distinct keys, and
        # holding exact per-partition counts would just be a groupBy in
        # Python memory. Folding batch merges this way is the mergeable-
        # summaries argument (Agarwal et al.): total undercount stays
        # <= n_p/(k+1).
        counters: dict = {}
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: c - cut for key, c in counters.items() if c > cut
                }
        if counters:
            s = pd.Series(counters)
            yield pd.DataFrame({key_col: s.index, "count_lb": s.values})

    schema_field = df.schema[key_col]
    # nulls are not keys (value_counts drops them); make that explicit.
    df = df.select(key_col).where(F.col(key_col).isNotNull())
    summary = df.select(key_col).mapInPandas(
        summarize, f"{key_col} {schema_field.dataType.simpleString()}, count_lb long"
    )
    # merge: summing lower bounds is again a valid MG summary; the input
    # is <= partitions x k rows, so this aggregate is noise.
    merged = summary.groupBy(key_col).agg(F.sum("count_lb").alias("count_lb"))
    # a merged key can sit below every per-partition cut's worth of mass;
    # keep all candidates (caller filters by its own threshold) — the
    # output is already cardinality-bounded.
    return merged


def heavy_hitters_threshold(
    df: DataFrame, key_col: str, min_frac: float, slack: int = 4
) -> DataFrame:
    """Keys with true frequency >= min_frac of the NON-NULL keys, exactly
    (NULL is not a key anywhere in this family; the threshold denominator
    matches that population).

    Two bounded passes: (1) a Misra-Gries pass with k chosen so the MG
    error n/(k+1) is at most min_frac/slack of the corpus — every
    qualifying key is guaranteed in the candidate set; (2) an exact
    count of ONLY the candidates via a broadcast semi join, so the
    exact pass shuffles nothing but candidate keys. Returns
    (key, count) with true counts, no false positives/negatives.

    The second scan is the price of exactness; at 100 TB it is still
    two orders cheaper than the exact groupBy because only <= k keys
    ever cross the wire.
    """
    if not (0.0 < min_frac <= 1.0):
        raise ValueError("min_frac must be in (0, 1]")
    k = max(1, int(slack / min_frac))
    candidates = heavy_hitters(df, key_col, k=k).select(key_col)
    kept = df.select(key_col).join(F.broadcast(candidates), key_col, "left_semi")
    counts = kept.groupBy(key_col).agg(F.count(F.lit(1)).alias("count"))
    # corpus size rides the job as a broadcast 1-row aggregate (the
    # repo-wide no-eager-count policy). NULL keys are excluded so the
    # denominator matches the population the MG pass and the exact
    # recount actually see — min_frac is a fraction of NON-NULL keys
    # (counting all rows would silently raise the bar on columns with a
    # large NULL share).
    n_total = df.filter(F.col(key_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        counts.crossJoin(F.broadcast(n_total))
        .filter(F.col("count") >= F.ceil(F.col("_n") * F.lit(min_frac)).cast("long"))
        .select(key_col, "count")
    )
