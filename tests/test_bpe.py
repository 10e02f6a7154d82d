"""BPE tokenizer guarantees (functions/bpe.py + operators/tokenize.py).

Greedy BPE has no SQL form (same oracle class as the HLL/GK sketches),
so correctness is pinned here instead of in the DuckDB gate:

- bytes_to_unicode is a bijection (decode is exact for any byte);
- decode(encode(x)) == x byte-exactly, under hypothesis;
- the fast min-rank merge loop agrees with an INDEPENDENT reference
  implementation (exhaustive scan-replace in rank order — the original
  Sennrich formulation) on fixture text and hypothesis text;
- golden token-id fixtures pin the vendored table's behavior (a table
  or algorithm change that shifts ids fails loudly);
- the vendored table satisfies the size the training script requests
  (round 5 shipped a min-freq early stop at 447/2000 silently);
- the Arrow-batched Spark operators equal the driver-side tokenizer on
  real fixture documents, and the token_counter= thread through
  pack_token_budget / write_training_shards budgets in BPE tokens.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from weather_monitoring_spark.functions.bpe import (
    PRETOKEN_RE,
    BPETokenizer,
    bytes_to_unicode,
    save_tables,
    train_bpe,
    unicode_to_bytes,
)

TOK = BPETokenizer.vendored()

#: Natural-English sample where BPE and whitespace counts DIFFER (the
#: fixture documents' vocabulary is fully learned, so counts coincide
#: there — discriminating tests need unseen morphology + punctuation).
NATURAL = (
    "The committee's quarterly assessment, published yesterday, "
    "concluded that atmospheric variability increased by 3.7% — an "
    "unprecedented fluctuation attributable to oceanic circulation."
)


# ---------------- byte table ----------------


def test_bytes_to_unicode_bijection():
    b2u = bytes_to_unicode()
    u2b = unicode_to_bytes()
    assert len(b2u) == 256
    assert len(set(b2u.values())) == 256
    for b, c in b2u.items():
        assert u2b[c] == b


# ---------------- reference implementation ----------------


def _reference_encode(tok: BPETokenizer, text: str) -> list[int]:
    """Independent scan-replace formulation: apply every merge in rank
    order, each exhaustively left-to-right — no rank lookups inside the
    scan, no shared code with the min-rank loop."""
    b2u = bytes_to_unicode()
    ids: list[int] = []
    for pre in PRETOKEN_RE.findall(text):
        word = [b2u[b] for b in pre.encode("utf-8")]
        for first, second in tok.merges:
            out: list[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        ids.extend(tok.vocab[piece] for piece in word)
    return ids


def test_dual_implementation_agreement_fixture_text():
    for text in (NATURAL, "don't you'll they'd 1,048,576 $19.95", "aaa bbb aaab"):
        assert TOK.encode(text) == _reference_encode(TOK, text)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_dual_implementation_agreement_hypothesis(text):
    assert TOK.encode(text) == _reference_encode(TOK, text)


# ---------------- round-trips ----------------


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_roundtrip_hypothesis(text):
    assert TOK.decode(TOK.encode(text)) == text


def test_count_equals_encode_length():
    for text in (NATURAL, "", " ", "\n\n", "café naïve"):
        assert TOK.count(text) == len(TOK.encode(text))


def test_decode_partial_sequence_replaces_not_raises():
    ids = TOK.encode("café")
    # chop the id stream at every prefix — mid-UTF-8 splits must yield
    # U+FFFD (GPT-2 reference behavior), never raise.
    for i in range(len(ids)):
        assert isinstance(TOK.decode(ids[:i]), str)


# ---------------- vendored table properties ----------------


def test_vendored_table_meets_requested_size():
    from scripts.train_bpe import N_MERGES

    # min-freq early stop must not silently undershoot the requested
    # table size (r5 shipped 447/2000): require at least the 2000 the
    # original request named, and that the script's own target was met.
    assert len(TOK.merges) >= 2000
    assert len(TOK.merges) == N_MERGES


def test_vendored_vocab_is_canonical():
    # ids: 0..255 byte alphabet in byte order, then one id per merge in
    # rank order — what train_bpe produces and load() must preserve.
    b2u = bytes_to_unicode()
    for b in range(256):
        assert TOK.vocab[b2u[b]] == b
    for rank, (a, b) in enumerate(TOK.merges):
        assert TOK.vocab[a + b] == 256 + rank
    assert len(TOK.vocab) == 256 + len(TOK.merges)


def test_save_load_roundtrip(tmp_path):
    merges, vocab = train_bpe(["the theme there then theory"], 50)
    mp, vp = str(tmp_path / "merges.txt"), str(tmp_path / "vocab.json")
    save_tables(merges, vocab, mp, vp)
    loaded = BPETokenizer.load(mp, vp)
    assert loaded.merges == merges
    assert loaded.vocab == vocab


def test_train_is_deterministic():
    corpus = ["abab abab baba", "ab ba abab"]
    m1, v1 = train_bpe(corpus, 20)
    m2, v2 = train_bpe(corpus, 20)
    assert m1 == m2 and v1 == v2


# ---------------- golden token ids ----------------


def test_golden_token_ids():
    """Pinned ids in tests/data/bpe_golden.json (regenerated by
    scripts/make_bpe_golden.py when the table is retrained
    DELIBERATELY — an accidental table/algorithm drift fails here)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "bpe_golden.json")
    with open(path, encoding="utf-8") as fh:
        golden = json.load(fh)
    assert golden, "golden fixture file is empty"
    for text, ids in golden.items():
        assert TOK.encode(text) == ids, f"ids drifted for {text!r}"
        assert TOK.decode(ids) == text


# ---------------- Spark side ----------------


@pytest.fixture(scope="module")
def docs(spark):
    from weather_monitoring_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)


def test_spark_count_matches_driver(spark, docs):
    from weather_monitoring_spark.operators.tokenize import count_bpe_tokens

    rows = count_bpe_tokens(docs).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert rows
    for r in rows:
        assert r["n_tokens_bpe"] == TOK.count(texts[r["doc_id"]])
        assert r["n_tokens_ws"] == len(
            [t for t in __import__("re").split(r"[^a-z0-9]+", texts[r["doc_id"]].lower()) if t]
        )


def test_spark_encode_matches_driver(spark, docs):
    from weather_monitoring_spark.operators.tokenize import encode_documents

    rows = encode_documents(docs.limit(10)).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    for r in rows:
        assert list(r["ids"]) == TOK.encode(texts[r["doc_id"]])
        assert r["n_tokens"] == len(r["ids"])


def test_published_table_drop_in_swap(spark, tmp_path, monkeypatch):
    """The drop-in claim, executable: a SECOND, differently-trained
    merges/vocab pair in the standard file formats swaps in (a) via the
    explicit-path arguments on the Spark exprs — count/encode must
    match a driver-side load of the same files and differ from the
    vendored table — and (b) via $WMS_BPE_DIR for
    BPETokenizer.vendored()."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.functions.bpe import ENV_BPE_DIR
    from weather_monitoring_spark.operators.tokenize import (
        bpe_count_expr,
        bpe_encode_expr,
        bpe_token_counter,
    )

    # a deliberately tiny, different training corpus -> different merges
    merges, vocab = train_bpe(
        ["aaa bbb aaa bbb ccc", "aaa aaa bbb"], n_merges=20, min_freq=1
    )
    alt_dir = tmp_path / "alt_bpe"
    mp, vp = str(alt_dir / "merges.txt"), str(alt_dir / "vocab.json")
    save_tables(merges, vocab, mp, vp)
    alt = BPETokenizer.load(mp, vp)
    assert alt.merges != TOK.merges

    df = spark.createDataFrame([(1, NATURAL), (2, "aaa bbb aaa")], "id long, text string")
    got = {
        r["id"]: (r["n_alt"], list(r["ids_alt"]), r["n_vendored"])
        for r in df.select(
            "id",
            bpe_count_expr("text", mp, vp).alias("n_alt"),
            bpe_encode_expr("text", mp, vp).alias("ids_alt"),
            bpe_count_expr("text").alias("n_vendored"),
        ).collect()
    }
    texts = {1: NATURAL, 2: "aaa bbb aaa"}
    for i, text in texts.items():
        n_alt, ids_alt, n_ven = got[i]
        assert n_alt == alt.count(text)
        assert ids_alt == alt.encode(text)
        assert n_ven == TOK.count(text)
    # the two tables genuinely disagree somewhere in this sample
    assert any(got[i][0] != got[i][2] for i in texts)

    # counter factory binds the alternate table
    bound = bpe_token_counter(mp, vp)("text")
    rows = {r["id"]: r["n"] for r in df.select("id", bound.alias("n")).collect()}
    assert rows == {i: alt.count(t) for i, t in texts.items()}

    # env route (driver-side resolution; executors need executorEnv)
    monkeypatch.setenv(ENV_BPE_DIR, str(alt_dir))
    assert BPETokenizer.vendored().merges == alt.merges
    monkeypatch.delenv(ENV_BPE_DIR)
    assert BPETokenizer.vendored().merges == TOK.merges

    # vocab without merges cannot select a table: must raise, never
    # silently fall back to the vendored ids
    with pytest.raises(ValueError, match="merges_path"):
        bpe_count_expr("text", vocab_path=vp)
    with pytest.raises(ValueError, match="merges_path"):
        bpe_token_counter(vocab_path=vp)


def test_spark_count_null_shape(spark):
    from weather_monitoring_spark.operators.tokenize import bpe_count_expr

    df = spark.createDataFrame(
        [(1, NATURAL), (2, None), (3, "")], "id long, text string"
    ).select("id", bpe_count_expr("text").alias("n"))
    got = {r["id"]: r["n"] for r in df.collect()}
    assert got[1] == TOK.count(NATURAL) and got[1] > len(NATURAL.split())
    assert got[2] is None
    assert got[3] == 0


def test_pack_token_budget_with_bpe_counter(spark):
    from weather_monitoring_spark.operators.tokenize import bpe_token_counter
    from weather_monitoring_spark.operators.training_prep import pack_token_budget

    sentences = [
        (i, f"Sentence {i}: " + NATURAL[: 40 + 7 * (i % 9)]) for i in range(40)
    ]
    df = spark.createDataFrame(sentences, "doc_id long, text string")
    budget = 60
    rows = {
        r["doc_id"]: r
        for r in pack_token_budget(
            df, budget=budget, token_counter=bpe_token_counter()
        ).collect()
    }
    # python replay of the same contract, BPE-denominated
    cum = 0
    for i, text in sentences:
        n = TOK.count(text)
        cum += n
        assert rows[i]["n_tokens"] == n
        assert rows[i]["cum_tokens"] == cum
        assert rows[i]["shard_id"] == (cum - n) // budget


def test_write_training_shards_bpe_counter(spark, tmp_path):
    from weather_monitoring_spark.operators.tokenize import bpe_token_counter
    from weather_monitoring_spark.operators.training_prep import (
        verify_training_shards,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}. " + NATURAL) for i in range(30)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "shards")
    counter = bpe_token_counter()
    manifest = write_training_shards(df, out, budget=200, token_counter=counter)
    total = manifest.groupBy().sum("n_tokens").collect()[0][0]
    # manifest totals are BPE-denominated: equal to the driver-side sum
    expect = sum(TOK.count(f"doc {i}. " + NATURAL) for i in range(30))
    assert total == expect
    # same-counter verification: clean diff
    assert verify_training_shards(spark, out, token_counter=counter).count() == 0
    # wrong-counter verification: the mismatch is VISIBLE (BPE and
    # whitespace counts differ on this text), not silently absorbed
    assert verify_training_shards(spark, out).count() > 0


def test_streaming_shard_packer_bpe_counter(spark, tmp_path):
    """The streaming curation front door packs with the BPE counter:
    per-batch shard token totals are BPE-denominated and obey the same
    budget bounds as the batch packer on the same rows; a checkpointed
    restart with no new data adds nothing (exactly-once)."""
    import os

    from weather_monitoring_spark.operators.tokenize import bpe_token_counter
    from weather_monitoring_spark.operators.training_prep import (
        verify_training_shards,
        write_training_shards,
    )
    from weather_monitoring_spark.streaming.shard_stream import attach_shard_stream

    src = tmp_path / "src"
    src.mkdir()
    rows = [(i, f"doc {i}. " + NATURAL) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.filter("doc_id < 15").write.parquet(str(src / "a.parquet"))
    df.filter("doc_id >= 15").write.parquet(str(src / "b.parquet"))

    out, ck = str(tmp_path / "shards"), str(tmp_path / "ck")
    counter = bpe_token_counter()

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        q = attach_shard_stream(
            stream, out, ck, budget=200, token_counter=counter,
            emit_token_ids=True, trigger={"availableNow": True},
        )
        q.awaitTermination(120)

    run()
    batch_dirs = sorted(d for d in os.listdir(out) if d.startswith("batch_id="))
    assert len(batch_dirs) >= 1
    # each batch dir is a fully-formed shard tree: clean BPE-denominated
    # verification, visible mismatch under the wrong counter
    for d in batch_dirs:
        bdir = os.path.join(out, d)
        assert verify_training_shards(spark, bdir, token_counter=counter).count() == 0
        assert verify_training_shards(spark, bdir).count() > 0

    # streaming == batch shard bounds: the union of per-batch manifests
    # budgets exactly like the batch writer over the same rows — total
    # tokens equal, and every multi-doc shard within budget
    stream_manifest = [
        r
        for d in batch_dirs
        for r in spark.read.parquet(os.path.join(out, d, "_manifest")).collect()
    ]
    batch_out = str(tmp_path / "batch_shards")
    batch_manifest = write_training_shards(
        df, batch_out, budget=200, token_counter=counter
    ).collect()
    assert sum(r["n_tokens"] for r in stream_manifest) == sum(
        r["n_tokens"] for r in batch_manifest
    )
    # the packer's bound: a shard holds at most budget + its largest
    # document (the doc that straddles the boundary stays in the shard
    # where it starts — same formulation as the batch packer test)
    max_doc = max(TOK.count(t) for _, t in rows)
    for r in stream_manifest:
        assert r["n_tokens"] <= 200 + max_doc

    # emit_token_ids=True: streaming shards are loader-ready and the
    # budgeted counts equal size(input_ids) row-for-row
    rows_out = spark.read.parquet(os.path.join(out, batch_dirs[0])).collect()
    assert all(r["n_tokens"] == len(r["input_ids"]) for r in rows_out)

    # restart with no new files: no new batch dirs, manifests unchanged
    before = {d: os.listdir(os.path.join(out, d)) for d in batch_dirs}
    run()
    after_dirs = sorted(d for d in os.listdir(out) if d.startswith("batch_id="))
    assert after_dirs == batch_dirs
    assert {d: os.listdir(os.path.join(out, d)) for d in after_dirs} == before


def test_fixture_budget_delta_band(spark):
    """The BASELINE.md budget-delta row's invariant: on the synthetic
    documents fixture the vendored table fully learns the ~540-word
    vocabulary, so BPE == whitespace counts exactly; on natural English
    (unseen morphology + punctuation) BPE counts run HIGHER —
    whitespace-budgeted shards of such text are oversized."""
    from weather_monitoring_spark.operators.tokenize import count_bpe_tokens
    from weather_monitoring_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    agg = count_bpe_tokens(docs).groupBy().sum("n_tokens_ws", "n_tokens_bpe").collect()[0]
    assert agg[0] == agg[1]  # fixture: ratio exactly 1.0
    assert TOK.count(NATURAL) > len(NATURAL.split())


def test_shards_with_token_ids(spark, tmp_path):
    """emit_token_ids=True: shards carry input_ids, size(input_ids)
    equals the budgeted n_tokens row-for-row under the BPE counter, the
    ids replay the driver tokenizer, and the manifest still verifies."""
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.tokenize import bpe_token_counter
    from weather_monitoring_spark.operators.training_prep import (
        verify_training_shards,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}. " + NATURAL) for i in range(20)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "shards")
    counter = bpe_token_counter()
    write_training_shards(
        df, out, budget=200, token_counter=counter, emit_token_ids=True
    )
    written = spark.read.parquet(out)
    assert "input_ids" in written.columns
    bad = written.filter(F.size("input_ids") != F.col("n_tokens")).count()
    assert bad == 0
    row = written.filter("doc_id = 7").select("input_ids").first()
    assert list(row["input_ids"]) == TOK.encode("doc 7. " + NATURAL)
    assert verify_training_shards(spark, out, token_counter=counter).count() == 0


def test_mismatched_vocab_fails_at_load_not_mid_encode():
    """r12 (the charset=hex class, config flavor): a vocab that is not
    closed over the merge table (truncated download, files from two
    different tokenizers) used to KeyError mid-job inside the encode
    udf on whichever document first reached the missing piece — it must
    fail eagerly at construction with a diagnosable error. A consistent
    pair (incl. the vendored table's own vocab round-trip) still
    loads."""
    import pytest

    from weather_monitoring_spark.functions.bpe import BPETokenizer

    tok = BPETokenizer.vendored()
    # the vendored vocab is closed: re-supplying it explicitly loads
    assert BPETokenizer(tok.merges, dict(tok.vocab)).encode("hello world")

    # drop one merge-result piece -> eager failure naming the piece
    broken = dict(tok.vocab)
    victim = tok.merges[0][0] + tok.merges[0][1]
    broken.pop(victim)
    with pytest.raises(ValueError, match="not closed over the merge table"):
        BPETokenizer(tok.merges, broken)

    # drop a base byte char -> same eager failure
    from weather_monitoring_spark.functions.bpe import bytes_to_unicode

    broken2 = dict(tok.vocab)
    broken2.pop(bytes_to_unicode()[0])
    with pytest.raises(ValueError, match="not closed over the merge table"):
        BPETokenizer(tok.merges, broken2)
