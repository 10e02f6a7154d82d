"""Unit tests for operators/lines.py — intra-document line dedup and
corpus-level boilerplate stripping on constructed corpora with known
answers. (Cross-engine oracle parity for the same operators runs in
test_oracle_parity via the x_dedup_lines / x_strip_boilerplate extras.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_monitoring_spark.operators.lines import (
    dedup_lines,
    line_doc_freq,
    strip_boilerplate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lines array<string>")


def test_dedup_lines_keeps_first_occurrence_in_order(spark):
    df = _docs(
        spark,
        [
            (1, ["nav", "body one", "nav", "body two", "body one", "nav"]),
            (2, ["only line"]),
            (3, []),
        ],
    )
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[1]["n_lines"] == 6 and out[1]["n_kept"] == 3
    assert out[1]["text_clean"] == "nav\nbody one\nbody two"
    assert out[2]["n_lines"] == out[2]["n_kept"] == 1
    assert out[3]["n_lines"] == out[3]["n_kept"] == 0 and out[3]["text_clean"] == ""


def test_dedup_lines_matches_array_distinct_cardinality(spark):
    # n_kept must equal the distinct-line count for every document.
    df = _docs(
        spark,
        [(i, [f"l{(i * j) % 7}" for j in range(20)]) for i in range(50)],
    )
    bad = (
        dedup_lines(df)
        .join(
            df.select("doc_id", F.size(F.array_distinct("lines")).alias("nd")),
            "doc_id",
        )
        .filter(F.col("n_kept") != F.col("nd"))
        .count()
    )
    assert bad == 0


def test_line_doc_freq_counts_documents_not_occurrences(spark):
    df = _docs(
        spark,
        [
            (1, ["hot", "hot", "hot", "rare a"]),
            (2, ["hot", "rare b"]),
            (3, ["rare c"]),
        ],
    )
    freq = {r["line"]: r["n_docs"] for r in line_doc_freq(df).collect()}
    assert freq["hot"] == 2  # repeats within doc 1 count once
    assert freq["rare a"] == freq["rare b"] == freq["rare c"] == 1


def test_strip_boilerplate_removes_hot_keeps_rare(spark):
    rows = [(i, ["footer", f"unique {i}", "footer"]) for i in range(10)]
    rows.append((99, ["footer"]))  # every line is boilerplate
    df = _docs(spark, rows)
    out = {r["doc_id"]: r for r in strip_boilerplate(df, min_docs=5).collect()}
    assert out[3]["n_lines"] == 3 and out[3]["n_kept"] == 1
    assert out[3]["text_clean"] == "unique 3"
    # the all-boilerplate doc survives with an explicit empty verdict
    assert out[99]["n_kept"] == 0 and out[99]["text_clean"] == ""
    assert len(out) == 11


def test_strip_boilerplate_formulations_agree(spark):
    # broadcast hot-set filter == explode + left-join + re-group, row for
    # row, including empty-array and all-hot documents.
    rows = [(i, [f"l{j % 4}" for j in range(i % 6)] + [f"u{i}"]) for i in range(40)]
    rows.append((100, []))
    df = _docs(spark, rows)
    a = strip_boilerplate(df, min_docs=10, broadcast_hot=True)
    b = strip_boilerplate(df, min_docs=10, broadcast_hot=False)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bigram_lm_known_counts(spark):
    from weather_monitoring_spark.operators.textops import bigram_lm

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (3, "x")],  # doc 3: no bigram
        "doc_id bigint, text string",
    )
    out = {(r["w1"], r["w2"]): r for r in bigram_lm(df).collect()}
    assert out[("a", "b")]["c_pair"] == 3 and out[("a", "b")]["c_ctx"] == 3
    assert out[("a", "b")]["p"] == 1.0
    assert out[("b", "a")]["c_pair"] == 1 and out[("b", "a")]["c_ctx"] == 2
    assert out[("b", "c")]["p"] == 0.5
    assert set(out) == {("a", "b"), ("b", "a"), ("b", "c")}


def test_bigram_lm_probabilities_sum_to_one_per_context(spark):
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.textops import bigram_lm
    from weather_monitoring_spark.sources.tables import load_table

    lm = bigram_lm(load_table(spark, "/root/testdata/sf0.001", "documents"))
    sums = lm.groupBy("w1").agg(
        F.sum("c_pair").alias("s"), F.first("c_ctx").alias("c")
    )
    assert sums.filter(F.col("s") != F.col("c")).count() == 0


def test_normalize_text_known_cases(spark):
    from weather_monitoring_spark.operators.textops import normalize_text

    df = spark.createDataFrame(
        [
            (1, "a\t\tb   c"),
            (2, "win\r\nline\rold"),
            (3, "ctrl\x07\x01char"),
            (4, "  padded \n  inner  \n end  "),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert out[1]["text_norm"] == "a b c"
    assert out[2]["text_norm"] == "win\nline\nold"
    assert out[3]["text_norm"] == "ctrlchar"
    assert out[4]["text_norm"] == "padded\ninner\nend"
    assert out[4]["n_chars_raw"] == 26 and out[4]["n_chars_norm"] == 16


def test_normalize_text_unicode_form_opt_in(spark):
    import unicodedata

    from weather_monitoring_spark.operators.textops import normalize_text

    # NFD-decomposed "café" + a combining mark next to whitespace, plus a
    # compatibility ligature for the NFKC case.
    nfd_cafe = "café"
    df = spark.createDataFrame(
        [(1, nfd_cafe + "  menu"), (2, "ﬁle")],  # ﬁ ligature
        "doc_id bigint, text string",
    )

    # default path: zero-Python, text passes through un-canonicalized
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert out[1]["text_norm"] == nfd_cafe + " menu"
    assert out[2]["text_norm"] == "ﬁle"

    # NFC opt-in: combining mark composes; raw count still pre-NFC
    nfc = {r["doc_id"]: r for r in normalize_text(df, unicode_form="NFC").collect()}
    assert nfc[1]["text_norm"] == "café menu"
    assert nfc[1]["text_norm"] == unicodedata.normalize("NFC", out[1]["text_norm"])
    assert nfc[1]["n_chars_raw"] == len(nfd_cafe + "  menu")
    assert nfc[2]["text_norm"] == "ﬁle"  # NFC keeps ligatures

    # NFKC folds compatibility forms
    nfkc = {r["doc_id"]: r for r in normalize_text(df, unicode_form="NFKC").collect()}
    assert nfkc[2]["text_norm"] == "file"

    # invalid form fails fast, before any job runs
    import pytest

    with pytest.raises(ValueError):
        normalize_text(df, unicode_form="NFX")


def test_normalize_text_is_idempotent(spark):
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.textops import normalize_text
    from weather_monitoring_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    once = normalize_text(docs).select(
        F.col("doc_id"), F.col("text_norm").alias("text")
    )
    twice = normalize_text(once)
    diff = (
        once.join(twice, "doc_id")
        .filter(F.col("text") != F.col("text_norm"))
        .count()
    )
    assert diff == 0


def test_normalize_and_dedup_lines_run_in_structured_streaming(tmp_path, spark):
    """The curation front door (normalize -> split lines -> intra-doc
    line dedup) is stateless column algebra, so the SAME operators run
    unchanged as a streaming transformation and agree with the batch
    pass row-for-row. (Corpus-level strip_boilerplate is deliberately
    NOT streaming-safe — its hot set is a corpus aggregate; the batch
    operator feeds the streaming path as a broadcast side input.)"""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.lines import dedup_lines
    from weather_monitoring_spark.operators.textops import normalize_text

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = spark.createDataFrame(
        [
            (1, "nav\r\nbody  one\x07\nnav\nbody one"),
            (2, "only\tline"),
            (3, ""),
        ],
        "doc_id bigint, text string",
    )
    batch.write.parquet(src)

    def curate(df):
        normed = normalize_text(df)
        lined = normed.select(
            "doc_id",
            F.expr("filter(split(text_norm, '\\n'), x -> x != '')").alias("lines"),
        )
        return dedup_lines(lined)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = (
        curate(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = {r.doc_id: (r.n_lines, r.n_kept, r.text_clean)
                for r in spark.read.parquet(out).collect()}
    batched = {r.doc_id: (r.n_lines, r.n_kept, r.text_clean)
               for r in curate(batch).collect()}
    assert streamed == batched
    assert streamed[1] == (4, 2, "nav\nbody one")
    assert streamed[2] == (1, 1, "only line")
    assert streamed[3] == (0, 0, "")


# ---------------- corpus-wide paragraph dedup ----------------


def _paras_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, paras array<string>")


def test_paragraph_dedup_keeps_first_global_occurrence(spark):
    from weather_monitoring_spark.operators.lines import dedup_paragraphs

    df = _paras_df(
        spark,
        [
            (1, ["alpha", "shared", "beta"]),
            (2, ["shared", "gamma"]),  # 'shared' keeper is doc 1 pos 1
            (3, ["gamma", "delta"]),  # 'gamma' keeper is doc 2 pos 1
        ],
    )
    got = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert got[1]["text_clean"] == "alpha\n\nshared\n\nbeta"
    assert got[2]["text_clean"] == "gamma"
    assert got[3]["text_clean"] == "delta"
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (2, 1)


def test_paragraph_dedup_subsumes_intra_doc_repeats(spark):
    from weather_monitoring_spark.operators.lines import dedup_paragraphs

    df = _paras_df(spark, [(1, ["x", "x", "y", "x"])])
    row = dedup_paragraphs(df).collect()[0]
    assert row["text_clean"] == "x\n\ny"
    assert row["n_kept"] == 2


def test_paragraph_dedup_all_duplicate_doc_survives_empty(spark):
    from weather_monitoring_spark.operators.lines import dedup_paragraphs

    df = _paras_df(spark, [(1, ["only"]), (2, ["only"])])
    got = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert got[1]["text_clean"] == "only"
    assert got[2]["text_clean"] == "" and got[2]["n_kept"] == 0
    # exactly one copy survives corpus-wide
    assert sum(r["n_kept"] for r in got.values()) == 1


# ---------------- mojibake repair ------------------------------------------


def test_fix_mojibake_table_known_cases(spark):
    from weather_monitoring_spark.operators.textops import fix_mojibake

    df = spark.createDataFrame(
        [
            (1, "He said â€œhello worldâ€\x9d and left."),
            (2, "CafÃ© rÃ©sumÃ© â€” naÃ¯ve?"),  # Ã¯ is NOT in the table
            (3, "clean text stays clean"),
            (4, None),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in fix_mojibake(df).collect()}
    assert out[1]["text_fixed"] == "He said “hello world” and left."
    assert out[1]["changed"] is True
    # table repairs the é and the em dash; Ã¯ is outside the table
    assert out[2]["text_fixed"] == "Café résumé — naÃ¯ve?"
    assert out[3]["text_fixed"] == "clean text stays clean"
    assert out[3]["changed"] is False
    assert out[4]["text_fixed"] == "" and out[4]["changed"] is False


def test_fix_mojibake_full_mode_repairs_beyond_the_table(spark):
    """The byte-round-trip mode repairs ANY damaged code point — CJK and
    emoji mojibake the fixed table cannot know — and leaves clean text
    (including genuine 'â' words) untouched unless the run decodes as
    valid UTF-8."""
    from weather_monitoring_spark.operators.textops import _w1252, fix_mojibake

    def damage(s: str) -> str:
        return _w1252(s.encode("utf-8"))

    df = spark.createDataFrame(
        [
            (1, f"title {damage('日本語')} body"),
            (2, f"emoji {damage('🙂')} here"),
            (3, "the word â alone stays"),
            (4, damage("’") + " and " + damage("é")),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in fix_mojibake(df, mode="full").collect()}
    assert out[1]["text_fixed"] == "title 日本語 body"
    assert out[2]["text_fixed"] == "emoji 🙂 here"
    assert out[3]["text_fixed"] == "the word â alone stays"
    assert out[3]["changed"] is False
    assert out[4]["text_fixed"] == "’ and é"
    # the 0x9D windows-1252 HOLE byte (C1 control through the WHATWG
    # map): the closing double quote round-trips in full mode too
    hole = spark.createDataFrame(
        [(9, damage("”quoted”"))], "doc_id bigint, text string"
    )
    got = fix_mojibake(hole, mode="full").collect()[0]
    assert got["text_fixed"] == "”quoted”"


def test_fix_mojibake_table_mode_is_exchange_free_and_modes_validated(spark):
    import pytest

    from weather_monitoring_spark.operators.textops import fix_mojibake

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    plan = fix_mojibake(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    with pytest.raises(ValueError, match="mode"):
        fix_mojibake(df, mode="nope")


def test_two_phase_gating_is_identical_for_full_mojibake(spark):
    """r12: the charset-routing pattern applied to the full-mode
    mojibake repair — text with no cp1252 lead-image char
    (U+00C2-U+00F4) cannot change under the byte-round-trip, so a JVM
    predicate routes clean rows around the Arrow crossing (measured
    1.31x on a 5%-dirty 1.5 GB corpus; the same gate on NFC measured a
    wash and was NOT shipped — see the note in textops.py). The gated
    default must be byte-identical to the raw udf over an adversarial
    corpus: ASCII, genuine 'â' words, damaged CJK/emoji, hole bytes,
    NFD forms, empties, NULLs."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.textops import (
        _fix_mojibake_udf,
        _w1252,
        mojibake_fixed_col,
    )

    def damage(s: str) -> str:
        return _w1252(s.encode("utf-8"))

    rows = [
        "plain ascii only",
        "",
        None,
        "café",  # NFD-decomposed
        "café",  # precomposed
        "ﬁle ﬂow ½ Ⅳ",  # compatibility forms
        "x́ edge combining",
        "the word â alone stays",
        f"title {damage('日本語')} body",
        f"emoji {damage('🙂')} here",
        damage("’") + " and " + damage("é"),
        damage("”quoted”"),  # 0x9D hole byte
        "mixed ascii then é then ascii",
        "Ð¿Ñ€Ð¸Ð²ÐµÑ‚",  # damaged cyrillic
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                               "doc_id bigint, text string")
    t = F.col("text")
    got = df.select(
        mojibake_fixed_col(t, mode="full").alias("gated"),
        _fix_mojibake_udf()(t).alias("raw"),
    ).collect()
    for r in got:
        assert r["gated"] == r["raw"], r
