#!/usr/bin/env python
"""Train the vendored byte-level BPE table and write it in the standard
GPT-2 file formats (data/bpe/merges.txt + vocab.json).

Run from the repo root: ``python scripts/train_bpe.py``. Fully
deterministic: the corpus is the embedded seed text below plus the
sf0.001 documents table (itself a fixed fixture), and train_bpe breaks
ties lexicographically — re-running reproduces the checked-in files
byte-for-byte.

The seed text exists to give the table coverage the synthetic documents
lack (contractions, casing, punctuation runs, digits, a little code) so
merges generalize beyond the fixture vocabulary. The table is NOT GPT-2's
(no network in this container) but uses its exact file format, so a
published merges/vocab pair drops in without code changes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_monitoring_spark.functions.bpe import (  # noqa: E402
    MERGES_PATH,
    VOCAB_PATH,
    save_tables,
    train_bpe,
)

N_MERGES = 2000

SEED_TEXT = """
The quick brown fox jumps over the lazy dog, and then it doesn't stop:
it keeps running through the fields, across the river, and into the
woods where the light is thin and the ground is soft. We were there
last summer. You'll remember the place if you've seen the old bridge;
they'd told us it was closed, but we crossed it anyway.

Data pipelines read records, filter them, group them by key, and write
the results back to storage. A shuffle moves rows between partitions;
a broadcast join ships the small table to every executor. Counting
tokens, hashing documents, sorting by timestamp, sampling ten percent
of the input: these are the everyday verbs of large-scale processing.

In 1995 there were 2,048 entries; by 2024 the count had grown to
1,048,576 — roughly a 512x increase, or about 3.2% per month. Prices
ranged from $1.99 to $249.00, with a median of $19.95 and a mean of
$37.41. Version 2.0.1 fixed bugs #103, #1024, and #65535.

def process(records):
    total = 0
    for record in records:
        if record.value >= threshold:
            total += record.value
    return total

"What do you think?" she asked. "I think it's working," he said,
"though we should measure it again tomorrow." It was a long day;
nobody wanted another meeting, another review, another rewrite of the
same paragraph. Still, the work mattered, and everyone knew why.

Weather stations report temperature, humidity, and wind speed every
second. When humidity rises above seventy percent, the detector raises
an alert and the archive writes a new batch of records to the store.
The monitor keeps the latest status for each station in memory and
serves it to anyone who asks.

International text appears too: café, naïve, jalapeño, Zürich, señor,
résumé, coöperate, smörgåsbord. Punctuation clusters — ellipses...,
em-dashes — and (parentheses), [brackets], {braces}, plus symbols like
@, #, %, &, *, and ~ occur in real corpora, as do URLs such as
https://example.com/path?query=value and emails like user@example.com.
"""


EXTRA_TEXT = """
Monday morning the team met to review the results of the weekend run.
Nothing had failed, which surprised nobody and pleased everybody; the
new retry logic had absorbed two transient errors without paging
anyone. They spent an hour reading through the numbers together,
comparing this week against last week, asking whether the difference
was real or noise, and writing down three follow-up questions.

Consider a library that lends books to readers. Each reader has a card,
each book has a label, and every loan records who took what and when it
must come back. Most readers return most books on time; some books are
never asked for; a few are asked for constantly and the library buys
more copies of those. Over the years the catalogue grows, the shelves
fill, and the old ledgers move to the basement where the historians
find them delightful and everyone else finds them dusty.

To make bread you mix flour, water, salt, and yeast; you wait while it
rises, fold it a few times, wait again, shape it, and bake it hot. The
first loaf teaches patience, the tenth teaches judgment, and the
hundredth teaches that the oven matters more than the recipe. People
have done this for thousands of years, in every country, with whatever
grain the fields would give them.

The report concluded: throughput increased, latency decreased, costs
held steady. However, the appendix warned that the measurements were
taken during a quiet period, and that the busy season would tell a
different story. Therefore the committee recommended running the
experiment again in December, with larger samples and better
instruments, before committing to the migration.

She walked along the shore at low tide, picking up shells and putting
most of them back. The water was cold, the wind was steady, and the
gulls argued over something small and silver near the rocks. By noon
the beach had filled with families, umbrellas, sandwiches, and the
particular happiness of children who have found an unguarded bucket.
"""


def corpus() -> list[str]:
    texts = [SEED_TEXT, EXTRA_TEXT]
    # sf0.01 (not sf0.001): the larger fixture lifts fixture-vocabulary
    # pair frequencies past min_freq so the table actually learns the
    # words the engine's own tests and benches tokenize most.
    doc_path = "/root/testdata/sf0.01/documents.parquet"
    if os.path.exists(doc_path):
        import pyarrow.parquet as pq

        texts.extend(pq.read_table(doc_path).column("text").to_pylist())
    return texts


def main() -> None:
    merges, vocab = train_bpe(corpus(), N_MERGES)
    save_tables(merges, vocab)
    print(f"wrote {len(merges)} merges -> {MERGES_PATH}")
    print(f"wrote {len(vocab)} vocab entries -> {VOCAB_PATH}")


if __name__ == "__main__":
    main()
