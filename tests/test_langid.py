"""Trigram language-ID (operators/langid.py): planted multilingual
truth table (18 Latin-script languages by profile + 5 script-detected +
und), decision-order guarantees, determinism, and plan shape.
Cross-engine hash parity runs in test_oracle_parity via
x_langid_trigram.
"""

from __future__ import annotations

import pytest

#: (text, expected language). Held-out sentences — none appear in the
#: profile seed texts.
PLANTED = [
    ("The weather report said it would rain through the night and everyone stayed home.", "en"),
    ("Die Kinder spielten den ganzen Nachmittag im Garten, obwohl es ziemlich kalt war.", "de"),
    ("Le gouvernement a annoncé une nouvelle politique pour les écoles de la région.", "fr"),
    ("Los trabajadores terminaron la construcción del puente antes de la fecha prevista.", "es"),
    ("O menino levou o cachorro para passear na praia no final da tarde.", "pt"),
    ("Il treno per la città parte ogni mattina alle otto e arriva a mezzogiorno.", "it"),
    ("De kinderen liepen samen naar school omdat de bus vanochtend niet kwam.", "nl"),
    ("Barnen lekte i trädgården hela eftermiddagen trots att det var ganska kallt.", "sv"),
    ("Vejret var dårligt hele ugen, men børnene gik alligevel i skole hver dag.", "da"),
    ("Regjeringen la frem et nytt forslag om skolene i hele landet i går.", "no"),
    ("Hallituksen uusi päätös herätti paljon keskustelua kaupungin asukkaiden keskuudessa.", "fi"),
    ("Rząd ogłosił nową politykę dla szkół w całym województwie na przyszły rok.", "pl"),
    ("Vlak do města odjíždí každé ráno v osm hodin a přijíždí v poledne.", "cs"),
    ("Guvernul a anunțat o nouă politică pentru școlile din întreaga regiune.", "ro"),
    ("A gyerekek egész délután a kertben játszottak, pedig elég hideg volt.", "hu"),
    ("Çocuklar bütün öğleden sonra bahçede oynadılar ama hava oldukça soğuktu.", "tr"),
    ("Anak-anak bermain di taman sepanjang sore meskipun cuaca cukup dingin.", "id"),
    ("Watoto walicheza bustanini mchana wote ingawa hali ya hewa ilikuwa baridi.", "sw"),
    # script-detected
    ("今日は天気がよくて、こどもたちは公園であそびました。", "ja"),
    ("오늘은 날씨가 좋아서 아이들이 공원에서 놀았습니다.", "ko"),
    ("今天天气很好，孩子们在公园里玩。", "zh"),
    ("Сегодня хорошая погода, и дети играли в парке весь день.", "ru"),
    ("Σήμερα ο καιρός ήταν καλός και τα παιδιά έπαιζαν στο πάρκο.", "el"),
    # no evidence
    ("12345 !!! ???", "und"),
    ("", "und"),
]


@pytest.fixture(scope="module")
def predictions(spark):
    from weather_monitoring_spark.operators.langid import lang_id_trigram

    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(PLANTED)], "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in lang_id_trigram(df).collect()}


def test_planted_multilingual_truth_table(predictions):
    wrong = [
        (PLANTED[i][1], predictions[i]["pred_lang"], PLANTED[i][0])
        for i in range(len(PLANTED))
        if predictions[i]["pred_lang"] != PLANTED[i][1]
    ]
    assert not wrong, wrong


def test_every_doc_gets_a_row_and_contract(predictions):
    assert len(predictions) == len(PLANTED)
    for i, r in predictions.items():
        assert r["pred_lang"] is not None
        if r["best_lang"] is None:
            assert r["score"] == 0 and r["confidence"] is None
        else:
            assert r["score"] > 0 and r["margin"] >= 0
            assert r["confidence"] == pytest.approx(
                r["score"] / r["n_trigrams"]
            )


def test_kana_beats_han(spark):
    """Japanese text contains Han characters; the kana probe must win
    (decision order, not probe overlap, decides)."""
    from weather_monitoring_spark.operators.langid import lang_id_trigram

    df = spark.createDataFrame(
        [(1, "東京の天気は晴れです。こどもたちはあそびます。")],
        "doc_id long, text string",
    )
    assert lang_id_trigram(df).collect()[0]["pred_lang"] == "ja"


def test_single_stray_script_char_does_not_override(spark):
    """The r6 ADVICE fix: one Cyrillic (or CJK) character inside an
    otherwise-English document must NOT reclassify it — the script probe
    needs >= SCRIPT_MIN_CHARS chars and >= 5% of the letters."""
    from weather_monitoring_spark.operators.langid import lang_id_trigram

    en = (
        "The weather service published a detailed forecast for the "
        "whole region and everyone read it carefully before the trip."
    )
    df = spark.createDataFrame(
        [
            (1, en + " д"),  # one stray Cyrillic char
            (2, en + " 好"),  # one stray Han char
            (3, "Погода д " + en[:40]),  # material Cyrillic (>5%, >=3)
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id_trigram(df).collect()}
    assert got[1] == "en"
    assert got[2] == "en"
    assert got[3] == "ru"


def test_votes_deterministic(spark, predictions):
    from weather_monitoring_spark.operators.langid import lang_id_trigram

    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(PLANTED)], "doc_id long, text string"
    )
    again = {r["doc_id"]: tuple(r) for r in lang_id_trigram(df).collect()}
    assert again == {i: tuple(r) for i, r in predictions.items()}


def test_heldout_accuracy_floor(spark):
    """Measured accuracy on the held-out naturalistic eval set
    (tests/data/langid_eval.tsv — 5 original sentences per language,
    25 languages: all 18 profile languages + 7 script-detected, none in
    the profile seed corpus). The measured number
    and confusion rows are recorded in BASELINE.md; this test pins the
    floor so a profile regression is loud."""
    import os

    from weather_monitoring_spark.operators.langid import lang_id_trigram

    path = os.path.join(os.path.dirname(__file__), "data", "langid_eval.tsv")
    rows = []
    with open(path, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            line = line.rstrip("\n")
            if not line:
                continue
            lang, text = line.split("\t", 1)
            rows.append((i, lang, text))
    assert len({lang for _, lang, _ in rows}) == 25
    df = spark.createDataFrame(
        [(i, t) for i, _, t in rows], "doc_id long, text string"
    )
    pred = {r["doc_id"]: r["pred_lang"] for r in lang_id_trigram(df).collect()}
    confusion: dict[tuple[str, str], int] = {}
    hits = 0
    for i, truth, _ in rows:
        got = pred[i]
        hits += got == truth
        if got != truth:
            confusion[(truth, got)] = confusion.get((truth, got), 0) + 1
    acc = hits / len(rows)
    # print so a -s run surfaces the measured number for BASELINE.md
    print(f"langid held-out accuracy: {acc:.4f} ({hits}/{len(rows)})")
    print("confusion:", sorted(confusion.items()))
    assert acc >= 0.90, (acc, sorted(confusion.items()))


def test_profile_table_shape():
    from weather_monitoring_spark.operators.langid import load_langid_profiles

    rows = load_langid_profiles()
    langs = {lang for lang, _, _ in rows}
    assert len(langs) == 18
    by_lang: dict[str, list[int]] = {}
    for lang, tg, w in rows:
        assert len(tg) == 3
        by_lang.setdefault(lang, []).append(w)
    for lang, ws in by_lang.items():
        # rank weights: a permutation of K..1, all positive integers
        assert sorted(ws) == list(range(1, len(ws) + 1)), lang


def test_profile_join_is_broadcast(spark):
    from weather_monitoring_spark.operators.langid import lang_id_trigram

    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    plan = (
        lang_id_trigram(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan