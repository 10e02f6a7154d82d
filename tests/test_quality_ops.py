"""Unit tests for operators/quality.py — PII redaction and repetition
signals on constructed documents with known answers. (Cross-engine oracle
parity for the same operators runs in test_oracle_parity via the
q27_pii_quality registry entry.)"""

from __future__ import annotations

import pytest

from weather_monitoring_spark.operators.quality import (
    pii_redaction,
    quality_annotations,
    repetition_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pii_redaction_masks_and_counts(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jo.doe+x@sub.example.co.uk or root@host.io today"),
            (2, "server 192.168.0.1 and 10.255.3.77 rebooted"),
            (3, "call 555-0100-1234 or 020-123-4567 now"),
            (4, "clean document with no identifiers at all"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_redaction(df).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_ips"] == 0 and out[1]["n_phones"] == 0
    assert out[1]["clean_text"] == "mail me at <EMAIL> or <EMAIL> today"
    assert out[2]["n_ips"] == 2
    assert out[2]["clean_text"] == "server <IP> and <IP> rebooted"
    assert out[3]["n_phones"] == 2
    assert out[3]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert out[4]["clean_text"] == df.collect()[3]["text"]
    assert out[4]["n_emails"] == out[4]["n_ips"] == out[4]["n_phones"] == 0


def test_repetition_signals_known_values(spark):
    # tokens: a a a b -> top unigram 3/4; bigrams (a a, a a, a b) -> 2/3;
    # duplicate fraction (4 - 2 distinct) / 4.
    df = _docs(spark, [(1, "a a a b"), (2, "x y z"), (3, "")])
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 4
    assert r1["top_token_share"] == pytest.approx(0.75)
    assert r1["top_bigram_share"] == pytest.approx(2 / 3)
    assert r1["dup_token_frac"] == pytest.approx(0.5)
    r2 = out[2]
    assert r2["top_token_share"] == pytest.approx(1 / 3)
    assert r2["top_bigram_share"] == pytest.approx(0.5)
    assert r2["dup_token_frac"] == 0.0
    r3 = out[3]
    assert r3["n_tokens"] == 0
    assert r3["top_token_share"] == r3["top_bigram_share"] == r3["dup_token_frac"] == 0.0


def test_repetition_boilerplate_detection(spark):
    # A heavily repeated phrase dominates the bigram distribution — the
    # signal a curation gate thresholds on.
    spam = " ".join(["buy now"] * 50)
    prose = "the quick brown fox jumps over the lazy dog again and again"
    df = _docs(spark, [(1, spam), (2, prose)])
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[1]["top_bigram_share"] > 0.49
    assert out[2]["top_bigram_share"] < 0.2
    assert out[1]["dup_token_frac"] > 0.9


def test_quality_annotations_single_projection(spark):
    df = _docs(spark, [(7, "ping 10.0.0.7 ping ping")])
    rows = quality_annotations(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["clean_text"] == "ping <IP> ping ping"
    assert r["n_ips"] == 1
    # tokens of the *raw* text: ping 10 0 0 7 ping ping -> 7 tokens, top=3
    assert r["n_tokens"] == 7
    assert r["top_token_share"] == pytest.approx(3 / 7)
    # one physical projection, no shuffle in the plan
    plan = quality_annotations(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_annotations_run_in_structured_streaming(tmp_path, spark):
    """The curation gate is a pure projection, so the SAME operator runs
    unchanged as a streaming transformation — batch/stream unification is
    the point of expressing it declaratively."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "ping 10.0.0.7 ping ping"), (2, "mail root@host.io now")],
        "doc_id bigint, text string",
    ).write.parquet(src)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = (
        quality_annotations(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["clean_text"] == "ping <IP> ping ping"
    assert rows[2]["n_emails"] == 1 and rows[2]["clean_text"] == "mail <EMAIL> now"


def test_compression_signals_flag_repetition(spark):
    import hashlib

    from weather_monitoring_spark.operators.quality import compression_signals

    noise = " ".join(
        hashlib.md5(f"n{i}".encode()).hexdigest() for i in range(60)
    )
    df = _docs(
        spark,
        [
            (1, "repeat me " * 200),
            (2, "the quick brown fox jumps over the lazy dog and then "
                "wanders across the quiet meadow looking for something new "
                "to chase before the evening settles in over the hills"),
            (3, noise),
            (4, ""),
        ],
    )
    out = {r["doc_id"]: r for r in compression_signals(df).collect()}
    # the signal that matters: repetition stands far out of the pack
    # (hex "noise" still compresses ~2x — 16-symbol alphabet — and short
    # prose pays the deflate header, so only the repetitive doc is
    # separable by a wide margin)
    assert out[1]["compression_ratio"] > 10
    assert out[1]["compression_ratio"] > 3 * out[2]["compression_ratio"]
    assert out[1]["compression_ratio"] > 3 * out[3]["compression_ratio"]
    assert 1.0 < out[2]["compression_ratio"] < 3
    assert 1.0 < out[3]["compression_ratio"] < 3
    assert out[4]["n_bytes"] == 0 and out[4]["compression_ratio"] is not None
    for r in out.values():
        assert r["n_compressed"] > 0


def test_blocklist_filter_counts_and_verdicts(spark):
    from weather_monitoring_spark.operators.quality import blocklist_filter

    df = _docs(
        spark,
        [
            (1, "clean words only"),
            (2, "bad thing here"),
            (3, "bad bad bad things badly"),  # 'badly' must NOT match \bbad\b
        ],
    )
    out = {
        r["doc_id"]: r
        for r in blocklist_filter(df, ("\\bbad\\b",), max_hits=1).collect()
    }
    assert out[1]["n_blocked_hits"] == 0 and not out[1]["blocked"]
    assert out[2]["n_blocked_hits"] == 1 and not out[2]["blocked"]
    assert out[3]["n_blocked_hits"] == 3 and out[3]["blocked"]
    # empty pattern tuple: nothing blocked, every doc still gets a verdict
    none = blocklist_filter(df, (), max_hits=0).collect()
    assert len(none) == 3 and all(not r["blocked"] for r in none)


def test_curate_corpus_verdicts_and_single_projection(spark):
    from weather_monitoring_spark.operators.quality import curate_corpus

    df = _docs(
        spark,
        [
            (1, "a perfectly ordinary document with enough distinct words"),
            (2, "tiny"),
            (3, " ".join(["spam"] * 20)),  # dup frac 19/20 > 0.9
            (4, "now discussing the banned topic at length for many words"),
            (5, "short\tbut\twide  enough after cleaning up the whitespace"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curate_corpus(df, blocklist=("\\bbanned\\b",)).collect()
    }
    assert out[1]["verdict"] == "kept"
    assert out[2]["verdict"] == "too_short"
    assert out[3]["verdict"] == "repetitive"
    assert out[4]["verdict"] == "blocked" and out[4]["n_blocked_hits"] == 1
    assert out[5]["verdict"] == "kept"
    assert out[5]["text_norm"] == "short but wide enough after cleaning up the whitespace"
    # first-failing-gate precedence: a short repetitive doc is too_short
    tiny_spam = _docs(spark, [(9, "x x")])
    assert curate_corpus(tiny_spam).collect()[0]["verdict"] == "too_short"
    # the whole gate is one projection — no shuffle in the plan
    plan = curate_corpus(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------- Gopher rule set ----------------------------------------

from weather_monitoring_spark.operators.quality import gopher_rules

#: 20 words, mean length 4.55, six distinct required stopwords, all
#: alphabetic — repeated 3x it passes every Gopher rule.
_PROSE = (
    "the quick brown foxes jumped over lazy dogs and that they have "
    "slept with comfort of being safely home tonight"
)


def _gopher(spark, rows, **kw):
    df = _docs(spark, rows)
    return {r["doc_id"]: r for r in gopher_rules(df, **kw).collect()}


def test_gopher_kept_and_signal_values(spark):
    out = _gopher(spark, [(1, " ".join([_PROSE] * 3))])
    r = out[1]
    assert r["verdict"] == "kept"
    assert r["n_words"] == 60
    assert r["mean_word_len"] == pytest.approx(4.55)
    assert r["frac_alpha_words"] == 1.0
    assert r["symbol_ratio"] == 0.0
    assert r["n_stopwords"] == 6


def test_gopher_word_count_rules(spark):
    out = _gopher(spark, [(1, "short doc"), (2, None), (3, "")])
    assert out[1]["verdict"] == "too_few_words"
    assert out[2]["verdict"] == "too_few_words" and out[2]["n_words"] == 0
    assert out[3]["verdict"] == "too_few_words"
    # max bound via threshold override (not a 100k-word literal)
    over = _gopher(spark, [(4, " ".join([_PROSE] * 3))], max_words=59)
    assert over[4]["verdict"] == "too_many_words"


def test_gopher_word_length_rule(spark):
    long_words = " ".join(["supercalifragilistic"] * 60)
    ones = " ".join(["a"] * 60)
    out = _gopher(spark, [(1, long_words), (2, ones)])
    assert out[1]["verdict"] == "word_length"
    assert out[1]["mean_word_len"] == 20.0
    assert out[2]["verdict"] == "word_length"


def test_gopher_symbol_ratio_rule(spark):
    text = " ".join([_PROSE] * 3) + " " + " ".join(["#"] * 7)
    out = _gopher(spark, [(1, text)])
    assert out[1]["verdict"] == "symbol_ratio"
    assert out[1]["n_words"] == 67
    assert out[1]["symbol_ratio"] == pytest.approx(7 / 67)


def test_gopher_bullet_and_ellipsis_rules(spark):
    bullets = "\n".join(["- the quick brown foxes jumped"] * 10)
    # 4 of 10 lines end with '...': ellipsis frac 0.4 while the symbol
    # ratio stays at 4/60 <= 0.1 (so the earlier rule does not fire).
    lines = ["the quick brown foxes jumped high"] * 6 + [
        "the quick brown foxes jumped so..."
    ] * 4
    out = _gopher(spark, [(1, bullets), (2, "\n".join(lines))])
    assert out[1]["verdict"] == "bullet_lines"
    assert out[1]["frac_bullet_lines"] == 1.0
    assert out[2]["verdict"] == "ellipsis_lines"
    assert out[2]["frac_ellipsis_lines"] == pytest.approx(0.4)


def test_gopher_alpha_and_stopword_rules(spark):
    numbers = " ".join([_PROSE] * 2) + " " + " ".join(["12345"] * 20)
    no_stops = " ".join(["quick brown foxes jumped over lazy dogs today"] * 8)
    out = _gopher(spark, [(1, numbers), (2, no_stops)])
    assert out[1]["verdict"] == "non_alpha_words"
    assert out[1]["frac_alpha_words"] == pytest.approx(40 / 60)
    assert out[2]["verdict"] == "stopwords"
    assert out[2]["n_stopwords"] == 0


def test_gopher_precedence_first_failing_rule_wins(spark):
    # fails word count AND symbols AND stopwords -> earliest rule named
    out = _gopher(spark, [(1, "# # #")])
    assert out[1]["verdict"] == "too_few_words"


def test_gopher_plan_is_exchange_free(spark):
    df = _docs(spark, [(1, _PROSE)])
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gopher_carry_collision_raises(spark):
    """A carry name that collides with a computed output column (or the
    id column) would emit duplicate/ambiguous columns — rejected up
    front with the offending names."""
    from pyspark.sql import functions as F

    df = _docs(spark, [(1, _PROSE)]).withColumn("n_words", F.lit(7))
    with pytest.raises(ValueError, match="n_words"):
        gopher_rules(df, carry=("n_words",))
    with pytest.raises(ValueError, match="doc_id"):
        gopher_rules(df, carry=("doc_id",))


def test_gopher_rules_run_in_structured_streaming(tmp_path, spark):
    """gopher_rules is a pure projection, so the identical operator runs
    unchanged on the streaming front door — streaming verdicts equal the
    batch verdicts on the same rows."""
    src = str(tmp_path / "gsrc")
    out = str(tmp_path / "gout")
    ckpt = str(tmp_path / "gckpt")
    rows = [
        (1, " ".join([_PROSE] * 3)),
        (2, "short doc"),
        (3, " ".join(["supercalifragilistic"] * 60)),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = (
        gopher_rules(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["doc_id"]: r["verdict"] for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["doc_id"]: r["verdict"]
        for r in gopher_rules(
            spark.createDataFrame(rows, "doc_id bigint, text string")
        ).collect()
    }
    assert got == batch == {1: "kept", 2: "too_few_words", 3: "word_length"}


# ---------------- C4 rule set ---------------------------------------------

from weather_monitoring_spark.operators.quality import c4_rules

#: five prose lines that each pass the C4 keep predicate, with six
#: sentence-terminal marks total -> page verdict 'kept'.
_C4_PAGE = "\n".join(
    [
        "The quick brown fox jumped over the lazy dog.",
        "A second proper sentence stands here!",
        "Is the third line also a question?",
        "Fourth line ends with a period. Twice over.",
        "The fifth and final line closes now.",
    ]
)


def _c4(spark, rows, **kw):
    df = _docs(spark, rows)
    return {r["doc_id"]: r for r in c4_rules(df, **kw).collect()}


def test_c4_kept_page_and_counts(spark):
    out = _c4(spark, [(1, _C4_PAGE)])
    r = out[1]
    assert r["verdict"] == "kept"
    assert r["n_lines"] == 5
    assert r["n_lines_kept"] == 5
    assert r["n_sentences"] == 6
    assert r["text_clean"] == _C4_PAGE


def test_c4_line_filters_drop_the_right_lines(spark):
    page = "\n".join(
        [
            "No terminal punctuation on this line",  # dropped: no terminal
            "Too short.",  # dropped: < 3 words
            "Please enable JavaScript to continue.",  # dropped: javascript
            "   ",  # blank after trim: not counted at all
            _C4_PAGE,
        ]
    )
    out = _c4(spark, [(1, page)])
    r = out[1]
    assert r["n_lines"] == 8  # 3 dropped-but-nonblank + 5 kept
    assert r["n_lines_kept"] == 5
    assert r["text_clean"] == _C4_PAGE
    assert r["verdict"] == "kept"


def test_c4_terminal_quote_endings_kept(spark):
    page = '\n'.join(
        [
            'He said "stop right there."',
            "She replied with a shout!",
            "Quoted closing also counts here”",
            "Another proper sentence. And one more.",
            "The last line closes properly now.",
        ]
    )
    out = _c4(spark, [(1, page)])
    assert out[1]["n_lines_kept"] == 5
    assert out[1]["verdict"] == "kept"


def test_c4_page_level_drops_and_precedence(spark):
    out = _c4(
        spark,
        [
            (1, _C4_PAGE + "\nfunction() { return 1; }"),
            (2, _C4_PAGE + "\nWe sell lorem ipsum filler."),
            (3, _C4_PAGE + "\nThis page mentions xxx today."),
            (4, "Only two sentences here.\nThe second one is this!"),
            # brace AND lorem AND bad word -> earliest rule named
            (5, "{ lorem ipsum xxx }"),
            (6, None),
            (7, ""),
        ],
    )
    assert out[1]["verdict"] == "brace"
    assert out[2]["verdict"] == "lorem_ipsum"
    assert out[3]["verdict"] == "bad_words"
    assert out[4]["verdict"] == "too_few_sentences"
    assert out[5]["verdict"] == "brace"
    assert out[6]["verdict"] == "too_few_sentences"
    assert out[6]["n_lines"] == 0 and out[6]["text_clean"] == ""
    assert out[7]["verdict"] == "too_few_sentences"


def test_c4_bad_words_parametrized(spark):
    # the published filter's word list is caller-supplied data
    out = _c4(spark, [(1, _C4_PAGE + "\nA zork appears in this tale.")],
              bad_words=("zork",))
    assert out[1]["verdict"] == "bad_words"
    # bad_words=() disables the word gate instead of failing analysis
    # on arrays_overlap(array<string>, empty untyped array)
    out = _c4(spark, [(1, _C4_PAGE)], bad_words=())
    assert out[1]["verdict"] == "kept"


def test_c4_plan_is_exchange_free(spark):
    df = _docs(spark, [(1, _C4_PAGE)])
    plan = c4_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_c4_carry_threads_payload_and_collisions_raise(spark):
    from pyspark.sql import functions as F

    df = _docs(spark, [(1, _C4_PAGE)]).withColumn("url", F.lit("u1"))
    r = c4_rules(df, carry=("url",)).collect()[0]
    assert r["url"] == "u1" and r["verdict"] == "kept"
    with pytest.raises(ValueError, match="text_clean"):
        c4_rules(df.withColumn("text_clean", F.lit("x")), carry=("text_clean",))


# ---------------- Gopher repetition rules (Table A1, A1.2) -----------------

from weather_monitoring_spark.operators.quality import gopher_repetition_rules


def _rep(spark, rows, **kw):
    df = _docs(spark, rows)
    return {
        r["doc_id"]: r for r in gopher_repetition_rules(df, **kw).collect()
    }


def test_rep_duplicate_line_and_paragraph_fractions(spark):
    out = _rep(
        spark,
        [
            (1, "same line here\nsame line here\nsame line here\nfresh one"),
            (2, "para one stands alone\n\npara one stands alone\n\n\npara two"),
        ],
    )
    r = out[1]
    # 4 lines, 2 distinct -> 2/4 duplicates; chars 14*3+9=51, dup 14*2=28
    assert r["frac_dup_lines"] == pytest.approx(2 / 4)
    assert r["frac_chars_dup_lines"] == pytest.approx(28 / 51)
    assert r["verdict"] == "frac_dup_lines"
    p = out[2]
    assert p["frac_dup_paragraphs"] == pytest.approx(1 / 3)
    # 3 non-blank lines, 2 distinct -> 1/3 duplicate lines too
    assert p["frac_dup_lines"] == pytest.approx(1 / 3)


def test_rep_top_ngram_char_fraction_hand_computed(spark):
    # tokens: a b c a b c a b c more words here now  (tc = 25 chars)
    out = _rep(spark, [(1, "a b c a b c a b c. more words here now.")])
    r = out[1]
    assert r["n_tokens"] == 13
    assert r["frac_chars_top_2gram"] == pytest.approx(6 / 25)   # "a b" x3
    assert r["frac_chars_top_3gram"] == pytest.approx(9 / 25)   # "a b c" x3
    assert r["frac_chars_top_4gram"] == pytest.approx(8 / 25)   # "a b c a" x2
    # dup 5-grams cover token positions 1..9 -> 9 chars
    assert r["frac_chars_dup_5gram"] == pytest.approx(9 / 25)
    assert r["frac_chars_dup_7gram"] == 0.0


def test_rep_count_one_gram_is_not_repetition(spark):
    """Without the count >= 2 guard every short natural sentence would
    flag on its longest bigram."""
    out = _rep(
        spark,
        [(1, "all distinct words in this perfectly natural sentence flow")],
    )
    r = out[1]
    assert r["frac_chars_top_2gram"] == 0.0
    assert r["frac_chars_top_4gram"] == 0.0
    assert r["verdict"] == "kept"


def test_rep_dup_ngram_coverage_counts_overlaps_once(spark):
    # "one .. ten" twice: EVERY 5-gram repeats, but coverage is all 20
    # tokens counted once -> fraction exactly 1.0 (not > 1).
    text = "one two three four five six seven eight nine ten " * 2
    out = _rep(spark, [(1, text.strip())])
    assert out[1]["frac_chars_dup_5gram"] == 1.0
    assert out[1]["frac_chars_dup_10gram"] == 1.0


def test_rep_nulls_empties_and_precedence(spark):
    out = _rep(spark, [(1, None), (2, ""), (3, "buy now " * 40)])
    assert out[1]["verdict"] == "kept" and out[1]["n_tokens"] == 0
    assert out[2]["verdict"] == "kept"
    # every token-level signal fires for doc 3; the FIRST table row
    # whose signal exceeds its threshold wins. ("buy now " * 40 is a
    # single line, so the line/paragraph rows can't fire — the first
    # firing row is the 2-gram one.) Parenthesized ternary: the bare
    # `assert x == a if cond else b` parses as `assert (x == a) if cond
    # else b` and was vacuously truthy.
    expected = (
        "frac_dup_lines"
        if out[3]["frac_dup_lines"] > 0.30
        else "frac_chars_top_2gram"
    )
    assert out[3]["verdict"] == expected
    assert out[3]["frac_chars_dup_5gram"] == 1.0


def test_rep_plan_is_exchange_free_and_carry_guarded(spark):
    from pyspark.sql import functions as F

    df = _docs(spark, [(1, "a b a b")])
    # both methods: the corpus never shuffles
    arrow_plan = (
        gopher_repetition_rules(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in arrow_plan
    # the expr path is additionally Python-free (oracle-exact twin)
    expr_plan = (
        gopher_repetition_rules(df, method="expr")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in expr_plan and "Python" not in expr_plan
    with pytest.raises(ValueError, match="n_tokens"):
        gopher_repetition_rules(
            df.withColumn("n_tokens", F.lit(1)), carry=("n_tokens",)
        )
    with pytest.raises(ValueError, match="method"):
        gopher_repetition_rules(df, method="nope")
    carried = gopher_repetition_rules(
        df.withColumn("src", F.lit("s1")), carry=("src",)
    ).collect()[0]
    assert carried["src"] == "s1"


def test_rep_arrow_and_expr_paths_are_bit_equal(spark):
    """The Arrow scale path (Counter + candidate pruning + prefix sums)
    and the pure-expr oracle twin produce IDENTICAL bits on every
    signal — the minhash method= discipline."""
    from pyspark.sql import functions as F

    rows = [
        (1, "a b c a b c a b c. more words here now."),
        (2, "same line here\nsame line here\nsame line here\nfresh one"),
        (3, "one two three four five six seven eight nine ten " * 2),
        (4, "buy now " * 40),
        (5, "all distinct words in this natural sentence flow calmly"),
        (6, None),
        (7, ""),
        (8, "para a\n\npara a\n\n\npara b"),
    ]
    df = _docs(spark, rows)
    a = gopher_repetition_rules(df, method="arrow").orderBy("doc_id")
    e = gopher_repetition_rules(df, method="expr").orderBy("doc_id")
    ra = [tuple(r) for r in a.collect()]
    re_ = [tuple(r) for r in e.collect()]
    assert ra == re_


def test_c4_and_mojibake_run_in_structured_streaming(tmp_path, spark):
    """c4_rules and fix_mojibake are pure projections, so the identical
    operators run unchanged on the streaming front door — streaming
    results equal batch results on the same rows (the gopher_rules
    streaming-twin discipline)."""
    from weather_monitoring_spark.operators.textops import fix_mojibake

    src = str(tmp_path / "csrc")
    rows = [
        (1, _C4_PAGE),
        (2, "No terminal here\n" + _C4_PAGE),
        (3, "He said â€œgoâ€\x9d now.\n" + _C4_PAGE),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    batch = spark.createDataFrame(rows, "doc_id bigint, text string")

    for name, op in (("c4", c4_rules), ("moji", fix_mojibake)):
        out = str(tmp_path / f"{name}_out")
        ckpt = str(tmp_path / f"{name}_ckpt")
        q = (
            op(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
        want = sorted(tuple(r) for r in op(batch).collect())
        assert got == want
