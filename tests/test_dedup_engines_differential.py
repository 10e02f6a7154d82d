"""Differential property pinning the ONE documented semantic divergence
between the two streaming dedup engines (VERDICT r13 #3).

The engines agree on exact dedup and on within-batch keeper law (min-id
per fingerprint, min-id per band bucket). They diverge on CROSS-BATCH
band-bucket occupancy:

- parquet engine (``doc_dedup.StreamingDocDedup``): the persisted band
  index holds SURVIVOR bands only — a doc dropped by the fuzzy stage
  leaves no trace, so a later doc near ONLY the dropped doc survives.
- state engine (``doc_dedup_state.StateStoreDocDedup``): bucket claims
  are FIRST-PRESENTER — a doc that is itself dropped still claimed its
  fresh buckets, so a later near-dup of a dropped doc is dropped too
  (chain/transitive dropping).

Since survivors always presented their buckets, survivor-anchored
occupancy ⊆ first-presenter occupancy, which gives the one-directional
law this property pins:

    state_survivors ⊆ parquet_survivors

and EVERY disagreement doc X (parquet keeps, state drops) must be a
chain case: X shares a band bucket with some EARLIER-presented doc that
the state engine dropped, and with NO earlier state survivor (if it
shared one with a survivor S, S's bands are in BOTH indexes — S ∈
state_survivors ⊆ parquet_survivors — and both engines would drop X).

The corpus is adversarial by construction: chain triples A≈B≈C with
bands(A)∩bands(C) = ∅ SELECTED using the engines' own band derivation
(so the divergence is guaranteed to manifest, not hoped for), plus
exact dup pairs, exact re-arrivals of both survivors and dropped docs,
and the null/short bypass classes (which must never disagree).
"""

from __future__ import annotations

import json
import os
import random

from pyspark.sql import functions as F

from weather_monitoring_spark.streaming.doc_dedup import StreamingDocDedup
from weather_monitoring_spark.streaming.doc_dedup_state import (
    StateStoreDocDedup,
    _band_rows,
    _with_fp,
)


def _mutate(tokens: list[str], frac: float, rng: random.Random, tag: str):
    out = list(tokens)
    n = max(1, int(len(tokens) * frac))
    for j, pos in enumerate(rng.sample(range(len(tokens)), n)):
        out[pos] = f"mut{tag}{j}x{rng.randrange(10**6)}"
    return out


def _band_sets(spark, texts: dict[int, str]) -> dict[int, set]:
    """(band_idx, bh) sets per doc id, via the engines' own derivation."""
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = (
        _band_rows(_with_fp(df.filter(F.col("text").isNotNull())))
        .filter(F.col("bh").isNotNull())
        .select("doc_id", "band_idx", "bh")
        .collect()
    )
    out: dict[int, set] = {i: set() for i in texts}
    for r in rows:
        out[r.doc_id].add((r.band_idx, r.bh))
    return out


def _pick_chain_triples(spark, want: int = 2):
    """Generate candidate (A, B=mut(A), C=mut(B)) text triples over
    disjoint token universes and keep those where the ACTUAL band sets
    satisfy A∩B ≠ ∅, B∩C ≠ ∅, A∩C = ∅ — the chain shape. Seeded, so
    the selection is deterministic."""
    rng = random.Random(1404)
    triples = []
    for fam in range(24):
        base = [f"f{fam}w{k}" for k in range(60)]
        frac = 0.18 + 0.04 * (fam % 5)
        b = _mutate(base, frac, rng, f"{fam}b")
        c = _mutate(b, frac, rng, f"{fam}c")
        triples.append((" ".join(base), " ".join(b), " ".join(c)))
    texts = {}
    for i, (a, b, c) in enumerate(triples):
        texts[i * 3], texts[i * 3 + 1], texts[i * 3 + 2] = a, b, c
    bands = _band_sets(spark, texts)
    picked = []
    for i in range(len(triples)):
        ba, bb, bc = bands[i * 3], bands[i * 3 + 1], bands[i * 3 + 2]
        if (ba & bb) and (bb & bc) and not (ba & bc):
            picked.append(triples[i])
            if len(picked) == want:
                break
    assert len(picked) == want, (
        f"seeded corpus produced only {len(picked)} chain triples — "
        "retune fractions/seed"
    )
    return picked


def _run_parquet_engine(spark, store_dir: str, batches):
    dd = StreamingDocDedup(spark, store_dir)
    for i, rows in enumerate(batches):
        dd.process_batch(
            spark.createDataFrame(rows, "doc_id long, text string"), i
        )
    return {r.doc_id for r in dd.corpus().select("doc_id").collect()}


def _run_state_engine(spark, out_dir: str, ckpt: str, src: str, batches):
    os.makedirs(src)
    dd = StateStoreDocDedup(spark, out_dir)

    def wave():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        queries = dd.attach(
            stream,
            ckpt,
            trigger={"availableNow": True},
            output_files_per_batch=1,
            fuzzy_max_files_per_trigger=1,
        )
        for q in queries:
            q.awaitTermination()

    # Feed INCREMENTALLY — one file, then an availableNow wave — so each
    # stage sees exactly one new input per wave and arrival order equals
    # batch order (dumping all files upfront lets the file source's
    # mtime sort tie-break arbitrarily, which scrambles first-arrival
    # semantics; ordered arrival is the engine's documented determinism
    # precondition, attach_exact docstring). Two extra waves flush the
    # 3-stage pipeline; maxFilesPerTrigger=1 + one file per logical
    # batch keeps the 1:1 pairing.
    for i, rows in enumerate(batches):
        with open(os.path.join(src, f"b{i:03d}.json"), "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        wave()
    for _ in range(2):
        wave()
    return {r.doc_id for r in dd.corpus().select("doc_id").collect()}


def test_engine_divergence_is_exactly_the_chain_class(spark, tmp_path):
    (a1, b1, c1), (a2, b2, c2) = _pick_chain_triples(spark)
    unique = "an entirely novel standalone document " + " ".join(
        f"u{k}" for k in range(40)
    )
    # presentation order = (batch index, doc_id); ids increase with time
    batches = [
        # batch 0: chain heads + exact-dup pair (10,11) + null + short
        [(1, a1), (2, a2), (10, unique), (11, unique), (20, None),
         (21, "one two")],
        # batch 1: chain middles (near the heads -> dropped by BOTH) +
        # exact re-arrival of a SURVIVOR's text
        [(31, b1), (32, b2), (40, unique)],
        # batch 2: chain tails (near ONLY the dropped middles -> the
        # divergence) + exact re-arrival of a DROPPED doc's text
        [(51, c1), (52, c2), (60, b1)],
    ]
    pq = _run_parquet_engine(spark, str(tmp_path / "pq"), batches)
    st = _run_state_engine(
        spark,
        str(tmp_path / "st"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "src"),
        batches,
    )

    # agreed classes first: heads + exact-dup min-id + bypass docs
    for eng in (pq, st):
        assert {1, 2, 10, 20, 21} <= eng
        assert 11 not in eng          # exact dup, same batch
        assert 31 not in eng and 32 not in eng  # near the heads
        assert 40 not in eng          # exact re-arrival of a survivor
        assert 60 not in eng          # exact re-arrival of a dropped doc

    # the one-directional law
    assert st <= pq, f"state engine kept docs the parquet engine dropped: {st - pq}"

    # the constructed chain tails ARE the divergence
    disagreements = pq - st
    assert disagreements == {51, 52}, disagreements

    # classify every disagreement against the actual band geometry
    texts = {
        doc_id: text
        for i, rows in enumerate(batches)
        for doc_id, text in rows
        if text is not None
    }
    bands = _band_sets(spark, texts)
    order = {
        doc_id: (i, doc_id)
        for i, rows in enumerate(batches)
        for doc_id, _ in rows
    }
    unclassified = _classify(disagreements, texts, bands, order, st)
    assert not unclassified, (
        "disagreements outside the documented chain class: "
        f"{unclassified}"
    )


def _classify(disagreements, texts, bands, order, st):
    """Chain-class classifier: a disagreement doc must share a band
    bucket with some EARLIER-presented doc the state engine dropped,
    and with NO earlier state survivor (a survivor bucket-mate is in
    both indexes and both engines would have dropped it)."""
    unclassified = []
    for x in disagreements:
        earlier = [d for d in texts if order[d] < order[x]]
        dropped_mates = [
            d for d in earlier if d not in st and bands[d] & bands[x]
        ]
        survivor_mates = [
            d for d in earlier if d in st and bands[d] & bands[x]
        ]
        if not dropped_mates or survivor_mates:
            unclassified.append((x, dropped_mates, survivor_mates))
    return unclassified


def test_engine_divergence_law_holds_on_random_mutation_forests(
    spark, tmp_path
):
    """The subset law and the chain classifier are corpus-INDEPENDENT
    claims — check them on seeded random mutation forests (depth-3
    chains at random mutation rates, exact dups, nulls, shorts, no tie
    avoidance: both engines use first-arrival/min-id keepers, so ties
    cannot cause divergence here), without asserting which specific
    docs diverge."""
    rng = random.Random(2718)
    texts_by_id: dict[int, str | None] = {}
    batches: list[list[tuple[int, str | None]]] = [[] for _ in range(4)]
    nid = 0

    def add(batch, text):
        nonlocal nid
        nid += 1
        batches[batch].append((nid, text))
        texts_by_id[nid] = text
        return nid

    for fam in range(14):
        base = [f"r{fam}w{k}" for k in range(50)]
        frac = 0.05 + 0.05 * (fam % 6)
        b0 = rng.randrange(4)
        add(b0, " ".join(base))
        cur = base
        for depth in range(1, 3):
            cur = _mutate(cur, frac, rng, f"{fam}d{depth}")
            add(min(3, b0 + depth), " ".join(cur))
    # exact dups + bypass classes sprinkled across batches
    dup_src = " ".join(f"dup{k} token" for k in range(40))
    add(0, dup_src)
    add(2, dup_src)
    add(1, None)
    add(3, None)
    add(1, "one two")
    add(2, "one two")

    pq = _run_parquet_engine(spark, str(tmp_path / "pq"), batches)
    st = _run_state_engine(
        spark,
        str(tmp_path / "st"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "src"),
        batches,
    )
    assert st <= pq, f"subset law violated: {st - pq}"
    texts = {i: t for i, t in texts_by_id.items() if t is not None}
    bands = _band_sets(spark, texts)
    order = {
        doc_id: (i, doc_id)
        for i, rows in enumerate(batches)
        for doc_id, _ in rows
    }
    unclassified = _classify(pq - st, texts, bands, order, st)
    assert not unclassified, unclassified
    # bypass classes never disagree
    null_short = {i for i, t in texts_by_id.items()
                  if t is None or len(t.split()) < 3}
    assert (pq ^ st) & null_short == set()
