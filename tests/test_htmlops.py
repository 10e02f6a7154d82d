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


# ---- entities="full": complete HTML5 decode (opt-in Arrow pass) ----------


def _extract_full(spark, html: str):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return extract_html_text(df, entities="full").collect()[0]


def test_full_entities_numeric_and_named(spark):
    # decimal, hex (both cases), and named entities beyond the basic-6
    row = _extract_full(
        spark, "<p>&#233;t&#xE9; &#X41; caf&eacute; A&mdash;B &copy;2024</p>"
    )
    assert row.text == "été A café A—B ©2024"


def test_full_entities_single_pass_ordering(spark):
    # html.unescape's one left-to-right pass: '&amp;lt;' is the literal
    # '&lt;', '&amp;#65;' the literal '&#65;' — same contract as basic.
    row = _extract_full(spark, "a &amp;lt; b &amp;#65; c")
    assert row.text == "a &lt; b &#65; c"


def test_full_equals_basic_on_basic_set(spark):
    # On inputs covered by the basic 6-entity chain (minus &nbsp;, whose
    # faithful decode is U+00A0 — see below) the two modes agree.
    html = "<p>a &amp;lt; b &lt;c&gt; &quot;d&quot; &#39;e&#39; f &amp; g</p>"
    assert _extract_full(spark, html).text == _extract(spark, html).text


def test_full_nbsp_is_faithful_u00a0(spark):
    # documented delta: full decodes &nbsp; to U+00A0, which the ASCII
    # \s+ collapse leaves alone (basic maps it to a plain space).
    row = _extract_full(spark, "a&nbsp;b")
    assert row.text == "a\xa0b"
    assert _extract(spark, "a&nbsp;b").text == "a b"


def test_entities_mode_validated_eagerly(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    with pytest.raises(ValueError, match="entities"):
        extract_html_text(df, entities="typo")


def test_html_text_lines_mode_keeps_block_structure(spark):
    """lines=True: closing block tags and <br> become line breaks (the
    front door for line-level curation); default stays the single-line
    collapse."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.htmlops import html_text_expr

    rows = [
        (1, "<html><body><p>One here.</p><p>Two now.</p><br>Three tail</body></html>"),
        (2, "<div> spaced   <b>bold</b> text </div><ul><li>item a</li><li>item b</li></ul>"),
        (3, "<script>var x=1;</script><h1>Title</h1><p>Body &amp; more.</p>"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    lined = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", html_text_expr("html", lines=True).alias("t")
        ).collect()
    }
    assert lined[1] == "One here.\nTwo now.\nThree tail"
    assert lined[2] == "spaced bold text\nitem a\nitem b"
    assert lined[3] == "Title\nBody & more."
    assert lined[4] == ""
    flat = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", html_text_expr("html").alias("t")
        ).collect()
    }
    assert "\n" not in flat[1] and flat[3] == "Title Body & more."


def test_html_text_paragraphs_mode_two_level_structure(spark):
    """paragraphs=True: block closers -> blank line (paragraph break),
    <br> -> single line break, 3+ newline runs fold to one blank line —
    the structure the Gopher A1.2 paragraph rules (split on \\n{2,})
    need; plain lines=True output can never contain a blank line."""
    from weather_monitoring_spark.operators.htmlops import html_text_expr

    rows = [
        (1, "<html><body><p>One here.</p><p>Two now.</p></body></html>"),
        (2, "<p>line a<br>line b</p><p>next para.</p>"),
        (3, "<div>alpha</div>\n\n\n<div>beta</div>"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    para = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id",
            html_text_expr("html", lines=True, paragraphs=True).alias("t"),
        ).collect()
    }
    # </p> and </body>/</html> closers collapse to exactly one blank line
    assert para[1] == "One here.\n\nTwo now."
    assert para[2] == "line a\nline b\n\nnext para."  # <br> stays single
    assert para[3] == "alpha\n\nbeta"  # 3+ newlines fold to one blank line
    assert para[4] == ""
    # plain lines mode folds every run to ONE \n — no paragraph exists
    lined = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", html_text_expr("html", lines=True).alias("t")
        ).collect()
    }
    assert all("\n\n" not in t for t in lined.values())

    import pytest

    with pytest.raises(ValueError, match="requires lines"):
        html_text_expr("html", paragraphs=True)


def test_paragraph_extraction_feeds_repetition_paragraph_rules(spark):
    """The r10 advisor fix end-to-end at the operator level: on
    lines=True extraction the whole page is ONE paragraph (newline runs
    fold to one \\n), so frac_dup_paragraphs was structurally ALWAYS 0;
    on paragraphs=True extraction the planted duplicate paragraph is
    detected."""
    from weather_monitoring_spark.operators.htmlops import extract_html_text
    from weather_monitoring_spark.operators.quality import (
        gopher_repetition_rules,
    )

    para = "Alpha beta gamma delta epsilon zeta."
    html = (
        "<html><body>"
        + f"<p>{para}</p><p>{para}</p><p>Unique closing paragraph text.</p>"
        + "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")

    def signals(**kw):
        ext = extract_html_text(df, **kw).select("doc_id", "text")
        return gopher_repetition_rules(ext).first()

    flat = signals(lines=True)
    rich = signals(lines=True, paragraphs=True)
    assert flat["frac_dup_paragraphs"] == 0.0  # structurally impossible
    assert rich["frac_dup_paragraphs"] > 0.30  # 1 dup / 3 paragraphs
    assert rich["frac_dup_lines"] == flat["frac_dup_lines"]  # lines agree
