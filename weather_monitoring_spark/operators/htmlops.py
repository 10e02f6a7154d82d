"""HTML -> text extraction — the step a crawl pipeline runs before ANY
text curation (quality gates, dedup, lang-id all assume plain text).
CommonCrawl-style corpora arrive as markup; this family strips it with
pure column algebra so extraction stays a zero-shuffle, whole-stage-
codegen projection at 100 TB.

Pipeline (order matters and is part of the contract):

1. drop ``<script>``/``<style>`` ELEMENTS including their content (their
   bodies are code, not prose — and contain ``<`` that would defeat a
   naive tag strip);
2. drop HTML comments (``<!-- ... -->``);
3. strip remaining tags (``<[^>]*>``);
4. decode entities — default ("basic"): the common six JVM-side
   (``&lt; &gt; &quot; &#39; &nbsp;`` first, ``&amp;`` LAST so
   ``&amp;lt;`` decodes to the literal ``&lt;`` — single-pass
   semantics, the html.unescape ordering); opt-in ("full"): the
   complete HTML5 set incl. numeric ``&#NNN;``/``&#xHH;`` as an
   Arrow-batched stdlib-``html.unescape`` pass (see html_text_expr);
5. collapse whitespace runs to one space and trim.

Every pattern is in the cross-engine regex subset (RE2 ∩ Java — no
lookaround, no backreferences; inline ``(?is)`` flags only), so the
DuckDB oracle fragments below run the SAME patterns verbatim (DuckDB
needs the explicit ``'g'`` option where Spark's regexp_replace is
global by default).

Also emits the curation signals extraction makes available for free:
markup size vs text size (boilerplate-heavy pages have low text ratio)
and anchor count (link farms have high link density).

Reference parity: the reference has no HTML surface; this extends the
engine per the builder brief's LLM-pipeline scope (web crawl -> training
text starts with markup removal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Element-content patterns: the element AND its body go. Non-greedy so
#: adjacent elements don't merge; (?is) = case-insensitive + DOTALL
#: (script bodies span lines). Shared verbatim with the oracle.
SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
COMMENT_RE = r"(?s)<!--.*?-->"
TAG_RE = r"<[^>]*>"
WS_RE = r"\s+"
#: paragraphs=True mode: block-level closers become PARAGRAPH breaks
#: (blank line) while <br> stays a line break, so the extracted text
#: carries the two-level structure the Gopher A1.2 paragraph rules
#: (split on \\n{2,}) need. RE2-and-Java-safe, mirrored in the oracle.
BLOCK_CLOSE_RE = (
    r"(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article"
    r"|header|footer|pre)\s*>"
)
BR_RE = r"(?i)<br\s*/?\s*>"
#: lines=True mode: closing block-level tags and <br> become line
#: breaks BEFORE the generic tag strip, so the extracted text carries
#: the line structure line-level curation needs (C4 line gates,
#: line/boilerplate dedup). DERIVED from the two constants above so
#: the lines and paragraphs modes can never disagree on the closer set
#: (both (?i) flags apply from their own alternative onward — same
#: semantics in Java regex and RE2).
BLOCK_BREAK_RE = BLOCK_CLOSE_RE + "|" + BR_RE
#: lines=True collapse: horizontal whitespace only, then newline runs.
HWS_ONLY_RE = r"[ \t\r\f]+"
NL_RUN_RE = r" ?\n[ \n]*"
#: paragraphs=True collapse: spaces hugging any newline die, then 3+
#: newline runs become exactly one blank line.
NL_PAD_RE = r" *\n *"
NL_MANY_RE = r"\n{3,}"

#: Opening-anchor detector: '<a' followed by whitespace (attributes),
#: '>' (attribute-less '<a>') or '/' (self-closed '<a/>') — but never a
#: letter, so '<abbr>'/'<article>' don't count. RE2-and-Java-safe.
ANCHOR_RE = r"(?i)<a[\s>/]"

#: (entity, replacement) in decode order — ``&amp;`` LAST (see module doc).
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _full_entity_udf():
    """Arrow-batched pandas_udf decoding EVERY HTML entity — numeric
    ``&#NNN;``/``&#xHH;`` and the complete HTML5 named set — via the
    stdlib ``html.unescape`` (whose single left-to-right pass gives the
    same ``&amp;lt;`` -> ``&lt;`` ordering the basic chain guarantees).
    Built lazily so only the opt-in path pays the pandas import (the
    ``normalize_text(unicode_form=...)`` precedent, textops.py)."""
    import html

    import pandas

    from pyspark.sql.functions import pandas_udf

    def _dec(s):
        return s.map(lambda x: html.unescape(x) if x is not None else None)

    _dec.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    return pandas_udf(_dec, "string")


def html_text_expr(
    html_col: str,
    entities: str = "basic",
    lines: bool = False,
    paragraphs: bool = False,
) -> Column:
    """Extracted plain text of one HTML document as a single Spark
    expression (steps 1-5 above). Zero shuffle, codegen-friendly.

    ``entities`` selects step 4's decoder:

    - ``"basic"`` (default): the 6-entity JVM-side replace chain —
      whole-stage codegen, zero Python, oracle-mirrored verbatim;
    - ``"full"``: the stdlib HTML5 decoder as an Arrow batch pass —
      numeric ``&#NNN;``/``&#xHH;`` and all named entities. Two
      documented deltas vs basic: ``&nbsp;`` decodes to U+00A0 (which
      Java's ASCII ``\\s`` does NOT collapse — faithful decode keeps
      it), and unknown/bare-ampersand sequences follow HTML5 parsing
      rather than passing through untouched. Python-boundary policy:
      guarantees live in pytest (tests/test_htmlops.py), the oracle
      fragment mirrors only the basic chain.

    ``lines=True`` turns closing block-level tags and ``<br>`` into
    line breaks before the tag strip and collapses horizontal
    whitespace / newline runs separately — the extracted text then
    carries the line structure line-level curation needs (c4_rules,
    line dedup, boilerplate stripping). Default stays the single-line
    collapse (the original contract and oracle).

    ``paragraphs=True`` (requires ``lines=True``) upgrades the
    structure to two levels: block-level closers become PARAGRAPH
    breaks (a blank line) while ``<br>`` stays a single line break, and
    the collapse keeps runs of 2 newlines (3+ fold to exactly one blank
    line). This is the mode the Gopher A1.2 paragraph rules need —
    plain ``lines=True`` folds every newline run to ONE ``\\n``, so a
    paragraph split on ``\\n{2,}`` can never fire on its output.

    Built with the Column API (not ``F.expr``) so the regex constants
    reach the engine verbatim — Spark's SQL string-literal parser treats
    ``\\b``/``\\s`` as escapes and would corrupt them; the function API
    has no such layer, keeping the constants shareable with the DuckDB
    fragments below byte-for-byte."""
    if entities not in ("basic", "full"):
        raise ValueError(f"entities must be 'basic' or 'full', got {entities!r}")
    if paragraphs and not lines:
        raise ValueError("paragraphs=True requires lines=True")
    c = F.col(html_col)
    for pat in (SCRIPT_RE, STYLE_RE, COMMENT_RE):
        c = F.regexp_replace(c, pat, " ")
    if paragraphs:
        c = F.regexp_replace(c, BLOCK_CLOSE_RE, "\n\n")
        c = F.regexp_replace(c, BR_RE, "\n")
    elif lines:
        c = F.regexp_replace(c, BLOCK_BREAK_RE, "\n")
    c = F.regexp_replace(c, TAG_RE, " ")
    if entities == "basic":
        for ent, rep in ENTITIES:
            c = F.replace(c, F.lit(ent), F.lit(rep))
    else:
        c = _full_entity_udf()(c)
    if paragraphs:
        c = F.regexp_replace(c, HWS_ONLY_RE, " ")
        c = F.regexp_replace(c, NL_PAD_RE, "\n")
        c = F.regexp_replace(c, NL_MANY_RE, "\n\n")
        return F.btrim(c, F.lit("\n "))
    if lines:
        c = F.regexp_replace(c, HWS_ONLY_RE, " ")
        c = F.regexp_replace(c, NL_RUN_RE, "\n")
        return F.btrim(c, F.lit("\n "))
    return F.trim(F.regexp_replace(c, WS_RE, " "))


def extract_html_text(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    entities: str = "basic",
    lines: bool = False,
    paragraphs: bool = False,
) -> DataFrame:
    """(id, text, html_chars, text_chars, n_anchors, text_ratio) — the
    extraction projection a crawl pipeline persists; downstream curation
    reads ``text`` and gates on the signals. One zero-shuffle projection.

    ``text_ratio`` = text_chars / html_chars (0.0 for empty markup):
    boilerplate/chrome-heavy pages score low. ``n_anchors`` counts
    ``<a`` opening tags in the RAW markup (link farms score high) —
    counted before extraction since extraction erases the evidence.
    ``entities="full"`` opts into complete HTML5 entity decoding (see
    html_text_expr).
    """
    text = html_text_expr(
        html_col, entities=entities, lines=lines, paragraphs=paragraphs
    )
    return docs.select(
        F.col(id_col),
        text.alias("text"),
        F.length(html_col).cast("long").alias("html_chars"),
        F.length(text).cast("long").alias("text_chars"),
        F.regexp_count(F.col(html_col), F.lit(ANCHOR_RE))
        .cast("long")
        .alias("n_anchors"),
    ).withColumn(
        "text_ratio",
        F.when(F.col("html_chars") == 0, F.lit(0.0)).otherwise(
            F.col("text_chars").cast("double") / F.col("html_chars").cast("double")
        ),
    )


# ---------------- DuckDB oracle fragments (1:1 rule mirror) ---------------


def o_html_text(
    html_col: str, lines: bool = False, paragraphs: bool = False
) -> str:
    """DuckDB mirror of html_text_expr — same patterns verbatim; DuckDB
    regexp_replace needs the explicit 'g' (global) option."""
    if paragraphs and not lines:
        raise ValueError("paragraphs=True requires lines=True")
    e = f"regexp_replace({html_col}, '{SCRIPT_RE}', ' ', 'g')"
    e = f"regexp_replace({e}, '{STYLE_RE}', ' ', 'g')"
    e = f"regexp_replace({e}, '{COMMENT_RE}', ' ', 'g')"
    if paragraphs:
        e = f"regexp_replace({e}, '{BLOCK_CLOSE_RE}', chr(10) || chr(10), 'g')"
        e = f"regexp_replace({e}, '{BR_RE}', chr(10), 'g')"
    elif lines:
        e = f"regexp_replace({e}, '{BLOCK_BREAK_RE}', chr(10), 'g')"
    e = f"regexp_replace({e}, '{TAG_RE}', ' ', 'g')"
    for ent, rep in ENTITIES:
        rep_sql = rep.replace("'", "''")
        e = f"replace({e}, '{ent}', '{rep_sql}')"
    if paragraphs:
        e = f"regexp_replace({e}, '{HWS_ONLY_RE}', ' ', 'g')"
        e = f"regexp_replace({e}, '{NL_PAD_RE}', chr(10), 'g')"
        e = f"regexp_replace({e}, '{NL_MANY_RE}', chr(10) || chr(10), 'g')"
        return f"trim({e}, chr(10) || ' ')"
    if lines:
        e = f"regexp_replace({e}, '{HWS_ONLY_RE}', ' ', 'g')"
        e = f"regexp_replace({e}, '{NL_RUN_RE}', chr(10), 'g')"
        return f"trim({e}, chr(10) || ' ')"
    return f"trim(regexp_replace({e}, '{WS_RE}', ' ', 'g'))"


def o_n_anchors(html_col: str) -> str:
    return f"CAST(len(regexp_extract_all({html_col}, '{ANCHOR_RE}')) AS BIGINT)"
