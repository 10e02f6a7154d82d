"""Character-trigram language identification — the Cavnar & Trenkle
(1994, "N-Gram-Based Text Categorization") rank-profile method over the
vendored profiles in ``data/langid/profiles.tsv``, plus script-range
detection for languages whose writing system already identifies them.

Decision procedure (documented order, all deterministic):

1. **Script detection** — one per-script character COUNT per non-Latin
   script, in a fixed priority order (kana before Han: Japanese text
   contains Han characters, so kana presence must win): ja, ko, zh, ru,
   el, ar, he. A script wins only with MATERIAL evidence — at least
   SCRIPT_MIN_CHARS matching characters AND at least 1/SCRIPT_RATIO_MULT
   of the document's letters (both integer comparisons, mirrored in the
   oracle). A single stray Cyrillic/CJK character in an otherwise-Latin
   document no longer reclassifies the whole doc (r6 ADVICE item); the
   trigram argmax decides instead.
2. **Trigram profiles** — the document's padded character trigrams
   (lowercase, non-letter runs collapsed to one space) join the
   broadcast profile table; per (doc, lang) the INTEGER rank weights
   sum exactly; the argmax (score desc, lang asc tiebreak) is the
   prediction, with the runner-up gap as ``margin``.
3. **'und'** — no script hit and no profile hit (or no letters).

Every arithmetic step is integer (profile weights are ints by
construction — scripts/build_langid_profiles.py), so the whole scoring
table is cross-engine EXACT; ``confidence = score / n_trigrams`` is
the single IEEE division of identical operands. The
``x_langid_trigram`` extra check hash-matches the full output against
DuckDB running the same profile rows inline.

Scale shape (100 TB): trigrams explode map-side inside the scan; the
profile table is a few thousand rows — broadcast; the per-(doc, lang)
aggregation shuffles (doc_id, lang, partial-sum) tuples with map-side
combine, bounded at |languages| rows per document; the argmax window
partitions by doc_id on the SAME key the aggregation just shuffled to,
so no extra exchange. Documents never cross the wire.

The stopword-lexicon ``lang_id`` (operators/textops.py) remains for
zero-shuffle annotation passes; THIS operator is the higher-fidelity
path (morphology-level evidence, ~18 Latin-script languages + 7
script-detected, confidence + margin output).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PROFILES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)),
    "data",
    "langid",
    "profiles.tsv",
)

#: Non-letter runs -> one space. ``\p{L}`` is RE2-and-Java-safe.
NONLETTER_RE = r"[^\p{L}]+"

#: Script probes in DECISION ORDER (kana strictly before Han — see
#: module doc). Bare char ranges; both engines build the positive class
#: ``[rng]`` and its negation ``[^rng]`` from identical bytes.
SCRIPT_PROBES: tuple[tuple[str, str], ...] = (
    ("ja", "぀-ヿ"),  # hiragana + katakana
    ("ko", "가-힯"),  # hangul syllables
    ("zh", "一-鿿"),  # CJK unified ideographs
    ("ru", "Ѐ-ӿ"),  # cyrillic
    ("el", "Ͱ-Ͽ"),  # greek
    ("ar", "؀-ۿ"),  # arabic
    ("he", "֐-׿"),  # hebrew
)

#: Minimum script evidence before a probe beats the trigram argmax:
#: at least this many script characters ...
SCRIPT_MIN_CHARS = 3
#: ... AND script chars * MULT >= letter chars (i.e. the script is at
#: least 5% of the document's letters). Integer arithmetic on both
#: engines — no ratio floats to drift.
SCRIPT_RATIO_MULT = 20


@lru_cache(maxsize=1)
def load_langid_profiles(
    path: str = PROFILES_PATH,
) -> tuple[tuple[str, str, int], ...]:
    """(lang, trigram, weight) rows of the vendored profile table."""
    rows: list[tuple[str, str, int]] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            lang, trigram, w = line.split("\t")
            rows.append((lang, trigram, int(w)))
    return tuple(rows)


def _padded_expr(text_col: str):
    norm = F.regexp_replace(F.lower(F.col(text_col)), NONLETTER_RE, " ")
    return F.concat(F.lit(" "), F.trim(norm), F.lit(" "))


def lang_id_trigram(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pred_lang, best_lang, score, margin, n_trigrams,
    confidence) — see module doc for the decision procedure. Every doc
    gets a row; ``best_lang``/``margin``/``confidence`` are NULL when
    no profile trigram matched, ``pred_lang`` is never NULL ('und')."""
    spark = docs.sparkSession
    prof = spark.createDataFrame(
        list(load_langid_profiles()), "lang string, trigram string, w long"
    )
    base = docs.select(
        F.col(id_col),
        F.col(text_col).alias("_text"),
        _padded_expr(text_col).alias("_pad"),
    ).withColumn(
        "n_trigrams", F.greatest(F.length("_pad") - 2, F.lit(0)).cast("long")
    )
    tri = base.select(
        id_col,
        F.explode(
            F.expr(
                "CASE WHEN length(_pad) >= 3"
                " THEN transform(sequence(1, length(_pad) - 2),"
                " i -> substring(_pad, i, 3))"
                " ELSE array() END"
            )
        ).alias("tg"),
    )
    scores = (
        tri.join(F.broadcast(prof), tri["tg"] == prof["trigram"])
        .groupBy(id_col, "lang")
        .agg(F.sum("w").cast("long").alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("lang").asc())
    best = (
        scores.withColumn("_rn", F.row_number().over(w))
        .withColumn("_second", F.lead("score").over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("lang").alias("best_lang"),
            "score",
            (F.col("score") - F.coalesce("_second", F.lit(0))).alias("margin"),
        )
    )
    n_letters = F.length(F.regexp_replace(F.col("_text"), NONLETTER_RE, ""))
    script = None
    for lang, rng in SCRIPT_PROBES:
        cnt = F.length(F.regexp_replace(F.col("_text"), f"[^{rng}]+", ""))
        cond = (cnt >= F.lit(SCRIPT_MIN_CHARS)) & (
            cnt * F.lit(SCRIPT_RATIO_MULT) >= n_letters
        )
        script = (
            F.when(cond, F.lit(lang))
            if script is None
            else script.when(cond, F.lit(lang))
        )
    return (
        base.select(id_col, script.alias("_script"), "n_trigrams")
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce("_script", "best_lang", F.lit("und")).alias("pred_lang"),
            "best_lang",
            F.coalesce("score", F.lit(0).cast("long")).alias("score"),
            "margin",
            "n_trigrams",
            F.when(
                F.col("score").isNotNull() & (F.col("n_trigrams") > 0),
                F.col("score").cast("double") / F.col("n_trigrams").cast("double"),
            ).alias("confidence"),
        )
    )


# ---------------- DuckDB oracle (1:1 mirror) ---------------


def o_langid_sql(table: str = "documents") -> str:
    """The full decision procedure in DuckDB, profiles inlined as a
    VALUES CTE from the SAME vendored TSV."""
    vals = ", ".join(
        f"('{lang}', '{tg.replace(chr(39), chr(39) * 2)}', {w})"
        for lang, tg, w in load_langid_profiles()
    )
    def _cnt(rng: str) -> str:
        return f"length(regexp_replace(text, '[^{rng}]+', '', 'g'))"

    n_letters = f"length(regexp_replace(text, '{NONLETTER_RE}', '', 'g'))"
    script_case = " ".join(
        f"WHEN {_cnt(rng)} >= {SCRIPT_MIN_CHARS}"
        f" AND {_cnt(rng)} * {SCRIPT_RATIO_MULT} >= {n_letters}"
        f" THEN '{lang}'"
        for lang, rng in SCRIPT_PROBES
    )
    return f"""
        WITH prof(lang, trigram, w) AS (VALUES {vals}),
        base AS (
            SELECT doc_id, text,
                   ' ' || trim(regexp_replace(lower(text), '{NONLETTER_RE}', ' ', 'g')) || ' ' AS pad
            FROM {table}
        ), base2 AS (
            SELECT doc_id, text, pad,
                   CAST(greatest(length(pad) - 2, 0) AS BIGINT) AS n_trigrams
            FROM base
        ), tri AS (
            SELECT doc_id, unnest(CASE WHEN length(pad) >= 3
                       THEN list_transform(range(1, length(pad) - 1),
                                           i -> substr(pad, CAST(i AS INT), 3))
                       ELSE [] END) AS tg
            FROM base2
        ), sc AS (
            SELECT doc_id, lang, CAST(sum(w) AS BIGINT) AS score
            FROM tri JOIN prof ON tri.tg = prof.trigram
            GROUP BY doc_id, lang
        ), ranked AS (
            SELECT doc_id, lang, score,
                   row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn,
                   lead(score) OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS second
            FROM sc
        ), best AS (
            SELECT doc_id, lang AS best_lang, score,
                   score - coalesce(second, 0) AS margin
            FROM ranked WHERE rn = 1
        )
        SELECT b.doc_id,
               coalesce(CASE {script_case} END, best_lang, 'und') AS pred_lang,
               best_lang,
               CAST(coalesce(score, 0) AS BIGINT) AS score,
               CAST(margin AS BIGINT) AS margin,
               n_trigrams,
               CASE WHEN score IS NOT NULL AND n_trigrams > 0
                    THEN CAST(score AS DOUBLE) / CAST(n_trigrams AS DOUBLE)
               END AS confidence
        FROM base2 b LEFT JOIN best USING (doc_id)
    """
