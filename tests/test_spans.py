"""Semantic tests for duplicated-span detection/masking (operators/spans.py)
on a planted corpus with known coordinates. Oracle parity at corpus scale is
covered by x_dup_spans / x_strip_dup_spans in plans/extra_checks.py."""

from __future__ import annotations

import pytest

from weather_monitoring_spark.operators.spans import (
    dup_spans,
    gram_positions,
    strip_dup_spans,
)

S = "s1 s2 s3 s4 s5 s6 s7 s8"  # the shared 8-gram (one gram exactly)
M = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"  # 10-token shared run (3 grams, merge)

DOCS = [
    (1, f"u11 u12 u13 {S} u14 u15"),  # span at tokens 4..11
    (2, f"v21 {S} v22 v23 v24"),  # span at tokens 2..9
    (3, "w31 w32 w33 w34 w35 w36 w37 w38 w39"),  # unique, >= n tokens
    (4, f"x41 {M} x42"),  # run at tokens 2..11
    (5, f"y51 y52 {M}"),  # run at tokens 3..12
    (6, "z61 z62 z63"),  # shorter than n: no grams at all
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_gram_positions_skip_short_docs(docs):
    pos = gram_positions(docs)
    assert pos.filter("doc_id = 6").count() == 0
    # doc 3 has 9 tokens -> 2 grams, none duplicated
    assert pos.filter("doc_id = 3").count() == 2


def test_dup_spans_audit_coordinates(docs):
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in dup_spans(docs).collect()
    }
    assert spans == {
        (1, 4, 11, 8),
        (2, 2, 9, 8),
        (4, 2, 11, 10),  # three overlapping grams merged into one span
        (5, 3, 12, 10),
    }


def test_strip_keeps_keeper_and_masks_others(docs):
    out = {r.doc_id: r for r in strip_dup_spans(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}  # every doc survives to the output
    # keepers (lowest doc_id per gram) untouched
    assert out[1].n_masked == 0 and "s1 s2" in out[1].text_clean
    assert out[4].n_masked == 0
    # non-keepers masked exactly the span, fillers intact, order kept
    assert out[2].n_masked == 8
    assert out[2].text_clean == "v21 v22 v23 v24"
    assert out[5].n_masked == 10
    assert out[5].text_clean == "y51 y52"
    # unique and short docs untouched
    assert out[3].n_masked == 0
    assert out[6].n_masked == 0 and out[6].text_clean == "z61 z62 z63"
    assert all(r.n_tokens - r.n_masked == len(r.text_clean.split()) if r.text_clean else r.n_masked == r.n_tokens for r in out.values())


def test_strip_keep_first_false_masks_all_copies(docs):
    out = {r.doc_id: r.n_masked for r in strip_dup_spans(docs, keep_first=False).collect()}
    assert out[1] == 8 and out[2] == 8 and out[4] == 10 and out[5] == 10


def test_deterministic(docs):
    a = sorted(map(tuple, strip_dup_spans(docs).collect()))
    b = sorted(map(tuple, strip_dup_spans(docs).collect()))
    assert a == b
