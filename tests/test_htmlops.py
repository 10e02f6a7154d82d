"""HTML -> text extraction (operators/htmlops.py): planted known cases,
ordering guarantees (elements before tag-strip, '&amp;' decoded last),
DOTALL multiline bodies, idempotence on plain text, and the curation
signals' contract. Cross-engine hash parity runs in test_oracle_parity
via the x_html_extract spec; these pin the rules themselves.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_monitoring_spark.operators.htmlops import extract_html_text


def _extract(spark, html: str):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return extract_html_text(df).collect()[0]


def test_script_body_with_angle_brackets_is_fully_dropped(spark):
    # 'i<2' inside the script would survive a naive tag strip; element
    # removal must run first.
    row = _extract(
        spark,
        '<p>keep</p><script>var i=1; if(i<2){emit("<p>junk</p>")}</script><p>tail</p>',
    )
    assert row.text == "keep tail"


def test_style_comment_and_multiline_bodies(spark):
    row = _extract(
        spark,
        "<style>\n.a{color:red}\n</style><!-- nav\nchrome --><SCRIPT>\nx()\n</SCRIPT>body",
    )
    assert row.text == "body"


def test_entity_decode_is_single_pass(spark):
    # html.unescape ordering: '&amp;' decodes LAST, so '&amp;lt;' yields
    # the literal '&lt;', never '<'.
    row = _extract(spark, "<p>a &amp;lt; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f &amp; g</p>")
    assert row.text == "a &lt; b <c> \"d\" 'e' f & g"


def test_plain_text_is_untouched_and_idempotent(spark):
    row = _extract(spark, "just words, no markup")
    assert row.text == "just words, no markup"
    again = _extract(spark, row.text)
    assert again.text == row.text


def test_signals_contract(spark):
    html = '<a href="/x">one</a><A HREF="/y">two</A><p>ab</p>'
    row = _extract(spark, html)
    assert row.n_anchors == 2  # case-insensitive open-tag count
    # attribute-less and self-closed anchors count; '<abbr>' does not
    bare = _extract(spark, "<a>x</a><a/><abbr>y</abbr><a name=z>w</a>")
    assert bare.n_anchors == 3
    assert row.html_chars == len(html)
    assert row.text_chars == len(row.text)
    assert row.text_ratio == pytest.approx(len(row.text) / len(html))


def test_empty_markup_ratio_is_zero(spark):
    row = _extract(spark, "")
    assert row.text == "" and row.text_ratio == 0.0


def test_extraction_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    plan = extract_html_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
