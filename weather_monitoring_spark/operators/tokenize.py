"""Arrow-batched BPE tokenization operators — the Spark side of
``functions/bpe.py``.

Why a Pandas UDF (the engine's documented slow path): BPE encoding is
an iterative greedy merge loop with per-token data-dependent control
flow — no composition of built-in column functions expresses it, and a
JVM implementation is out of scope for a PySpark-native engine. The
boundary is drawn the standard way (the ``normalize_text`` /
``unicode_form`` precedent, operators/textops.py): Arrow-batched
``pandas_udf``, never row-at-a-time Python, and everything AROUND the
count (cumsum, shard assignment, manifests) stays JVM-side column
algebra.

Per-process cost model (the zlib/tokenizer-cache precedent): the
tokenizer table loads lazily ONCE per executor Python worker via
``BPETokenizer.vendored()`` (an ``lru_cache``) — a few hundred KB of
dict, amortized over every batch the worker sees. The tokenizer's own
pre-token cache makes throughput track DISTINCT pre-tokens per worker,
not total tokens: natural text reuses a small vocabulary, so the
amortized per-token cost is a dict hit. Counting is embarrassingly
parallel — zero shuffle, no state across rows, so the operator scales
with executors exactly like any map-side projection.

Cross-engine oracle policy: greedy BPE has no SQL form (same class as
the HLL/GK sketches) — guarantees live in ``tests/test_bpe.py``:
dual-implementation agreement (the fast min-rank loop vs an
independent scan-replace reference), byte-exact
``decode(encode(x)) == x`` round-trips under hypothesis, golden
token-id fixtures, and Spark-vs-driver equality on the documents
fixture.

Reference parity: the reference has no tokenizer surface; this extends
the engine per the builder brief's LLM-pipeline scope (shard budgets
are denominated in the tokens a TRAINER will count — see
``operators/training_prep.pack_token_budget(token_counter=...)``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_table_paths(merges_path, vocab_path) -> None:
    """Driver-side argument guard: a vocab without merges cannot select
    a table (the merges file IS the tokenizer; vocab only renames ids),
    and silently falling back to the vendored table would hand the
    caller the wrong ids while they believe the published vocab is
    active."""
    if merges_path is None and vocab_path is not None:
        raise ValueError(
            "vocab_path given without merges_path — pass both files of "
            "the table (merges.txt selects the tokenizer; vocab.json "
            "maps its ids)."
        )


def _resolve_tok(merges_path, vocab_path):
    """Worker-side tokenizer lookup: explicit paths (shipped in the UDF
    closure — the cluster-safe drop-in route) beat the vendored/env
    default. Per-process cached either way."""
    from weather_monitoring_spark.functions.bpe import BPETokenizer

    if merges_path is not None:
        return BPETokenizer.cached(merges_path, vocab_path)
    return BPETokenizer.vendored()


def bpe_count_expr(
    text_col: str,
    merges_path: str | None = None,
    vocab_path: str | None = None,
) -> Column:
    """BIGINT BPE token count of ``text_col`` (null in, null out — the
    same null shape as the whitespace counter ``size(tokens_expr(...))``
    so the two counters are drop-in interchangeable).

    ``merges_path``/``vocab_path`` select an alternate table in the
    standard GPT-2 formats (a PUBLISHED tokenizer drops in unchanged);
    the paths ride the UDF closure to every worker — no env plumbing.
    Default: the vendored table (or ``$WMS_BPE_DIR``)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    _check_table_paths(merges_path, vocab_path)

    def _count(s):
        tok = _resolve_tok(merges_path, vocab_path)  # per-process, lazy
        return pd.Series(
            [None if x is None else tok.count(x) for x in s], dtype="Int64"
        )

    # explicit annotations: the module's future-import makes inline
    # hints strings pyspark cannot resolve (the textops precedent)
    _count.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_count, "long")(F.col(text_col))


def bpe_encode_expr(
    text_col: str,
    merges_path: str | None = None,
    vocab_path: str | None = None,
) -> Column:
    """ARRAY<BIGINT> of BPE token ids (null in, null out). The ids are
    the active table's — pass ``merges_path``/``vocab_path`` (or swap
    ``data/bpe/``) for a published pair to get that tokenizer's ids
    unchanged."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    _check_table_paths(merges_path, vocab_path)

    def _encode(s):
        tok = _resolve_tok(merges_path, vocab_path)
        return pd.Series(
            [None if x is None else tok.encode(x) for x in s]
        )

    _encode.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_encode, "array<long>")(F.col(text_col))


#: Counter factory signature shared with training_prep: text column
#: name -> BIGINT count Column. The whitespace default lives in
#: training_prep (``size(tokens_expr(c))``); this is the BPE drop-in.
TokenCounter = Callable[[str], Column]


def bpe_token_counter(
    merges_path: str | None = None, vocab_path: str | None = None
) -> TokenCounter:
    """The ``token_counter=`` argument for ``pack_token_budget`` /
    ``write_training_shards`` / ``curate_crawl``. Optional paths bind an
    alternate (e.g. published) table into the counter."""
    _check_table_paths(merges_path, vocab_path)
    if merges_path is None and vocab_path is None:
        return bpe_count_expr

    def _counter(text_col: str) -> Column:
        return bpe_count_expr(text_col, merges_path, vocab_path)

    return _counter


def count_bpe_tokens(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens_ws, n_tokens_bpe, bpe_per_ws) — both counters side
    by side, the budget-delta audit view (BASELINE.md records this on
    the fixture corpus). One zero-shuffle projection; the whitespace
    leg stays whole-stage codegen, the BPE leg is one Arrow batch pass."""
    from weather_monitoring_spark.functions.text import tokens_expr

    return docs.select(
        F.col(id_col),
        F.size(tokens_expr(text_col)).cast("long").alias("n_tokens_ws"),
        bpe_count_expr(text_col).alias("n_tokens_bpe"),
    ).withColumn(
        "bpe_per_ws",
        F.when(
            F.col("n_tokens_ws") > 0,
            F.col("n_tokens_bpe").cast("double")
            / F.col("n_tokens_ws").cast("double"),
        ),
    )


def encode_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, ids ARRAY<BIGINT>, n_tokens) — the materialized-id form a
    data loader consumes directly. ``n_tokens = size(ids)`` is computed
    JVM-side from the array so count and ids cannot disagree."""
    return docs.select(
        F.col(id_col),
        bpe_encode_expr(text_col).alias("ids"),
    ).withColumn("n_tokens", F.size("ids").cast("long"))
