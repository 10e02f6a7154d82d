#!/usr/bin/env python
"""Train the vendored byte-level BPE table and write it in the standard
GPT-2 file formats (data/bpe/merges.txt + vocab.json).

Run from the repo root: ``python scripts/train_bpe.py``. Fully
deterministic: the corpus is (a) the embedded seed prose below, (b) a
generated morphology grid (stem x prefix/suffix combinations — see
``morph_corpus``), and (c) the sf0.1 documents fixture table (itself a
fixed driver-generated artifact; the script FAILS if it is absent
rather than silently training on a smaller corpus), and ``train_bpe``
breaks ties lexicographically — re-running reproduces the checked-in
files byte-for-byte.

Why the morphology grid: round 5 trained on prose + fixture alone and
min_freq early-stopped at 447 of the requested 2000 merges — the
synthetic documents have a ~540-word vocabulary, so after those words
fully merge no pair reaches frequency 2. English subword structure
(the "ing"/"tion"/"pre-"/"-ment" units a tokenizer needs to count
UNSEEN text sanely) only materializes if many distinct words SHARE
affixes, so the grid composes ~580 common stems with standard English
prefixes/suffixes. Composed non-words are harmless — BPE learns pair
statistics, not a lexicon — and the grid is what lets the requested
merge count actually materialize with the Sennrich min-frequency
threshold intact.

The table is NOT GPT-2's (no network in this container) but uses its
exact file format, so a published merges/vocab pair drops in without
code changes.
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

N_MERGES = 5000

#: The fixture leg of the training corpus. sf0.1 (the largest fixture)
#: so the engine's own bench/test vocabulary is fully learned.
DOCS_PATH = "/root/testdata/sf0.1/documents.parquet"

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


#: ~580 common English stems for the morphology grid — ordinary
#: vocabulary, one source of shared-affix pair frequency.
STEMS = """act add age agree aim air amaze amount answer appear apply argue arm arrange arrive ask
assist assume attach attack attempt attend attract avoid award balance band bank base bear beat
begin behave believe belong bend bind bite blame blend block blow board boil bond book border
borrow bother bottle bounce bound brake branch brand break breathe bridge brief bright bring
broad brush build burn burst buy calculate call calm camp care carry carve cast catch cause
center chain challenge chance change charge charm chase check cheer choose claim class clean
clear climb close cloud coach coast collect color comfort command comment commit compare compete
complete compute concern conclude conduct confirm connect consider consist contain continue
contract control convert cook cool copy correct cost count cover crack craft crash create credit
cross crowd crush cure curl current cut damage dance dare deal debate decide declare decline
decorate deliver demand deny depart depend describe deserve design desire destroy detail detect
develop differ direct discover discuss display distance disturb divide double doubt draft drag
drain draw dream dress drift drill drink drive drop dry earn ease edge educate effect elect
employ empty enable end engage enjoy enter equal escape estimate examine exchange excite excuse
exist expand expect experience explain explore express extend face fail fall farm fasten fault
favor fear feature feed feel fight figure file fill film filter find finish fire firm fish fit
fix flash float flood flow fold follow force forget form found frame freeze fresh front fuel
function gain gather gaze gear generate glance glow govern grade grant grasp greet ground group
grow guard guess guide hand handle hang happen harm head heal heat help hide hold honor hope
host hunt hurry identify ignore imagine impact import impress improve include increase indicate
inform inject injure insert insist inspect inspire install intend interest interpret interview
invent invest invite involve issue join judge jump keep kick kill kind knock know label land
last laugh launch lay lead lean learn leave lend level lift light limit link list listen live
load locate lock look loose lose love lower maintain manage march mark market match matter
mean measure meet melt mention merge mind miss mix model modify monitor motion mount move name
narrow note notice number obtain occupy occur offer open operate order organize pack paint
pair park part pass paste pause pay perform permit persist pick picture place plan plant play
please point polish position possess post pour power practice praise predict prefer prepare
present preserve press prevent print proceed process produce profit program progress project
promise promote prompt proof propose protect prove provide publish pull pump punch purchase
push qualify question quote race rain raise range rank rate reach read reason receive record
recover reduce refer reflect reform refuse regard register regret relate relax release remain
remark remember remind remove rent repair repeat replace reply report request require rescue
research reserve resist resolve respect respond rest result return reveal review reward ride
ring rise risk roll rule rush sail sample save scale scan score search season seat secure see
seek select sell send sense serve settle shade shake shape share sharp shift shine ship shock
shoot shop show sign signal site sketch skill sleep slide slip smooth snap soften solve sort
sound source spare speak spell spend spill spin split spread spring stand start state stay
steer step stick store storm story stream stress stretch strike struggle study submit succeed
suffer suggest suit supply support suppose surround survey survive suspect sustain switch take
talk target taste teach tear tell tend test thank think threaten throw tie time touch tour
trace track trade train transfer transform translate transport travel treat trend trust turn
twist understand unite update upgrade urge value vary view visit voice vote wait wake walk
want warm warn wash waste watch wave wear weigh welcome wind wish witness wonder work worry
wrap write yield""".split()

#: Standard English suffixes/prefixes. The grid composes every stem
#: with every suffix; prefixes cycle deterministically over (stem,
#: suffix) index so each prefix co-occurs with many stems without the
#: grid cubing in size.
SUFFIXES = (
    "", "s", "ed", "ing", "er", "ers", "ion", "ions", "ly", "ment",
    "ments", "ness", "able", "ible", "ive", "al", "ous", "ful", "less",
    "est", "ity", "ation", "ance", "ence", "ant", "ent", "ure", "ary",
    "ism", "ist",
)
PREFIXES = (
    "", "re", "un", "pre", "over", "out", "inter", "dis", "mis", "non",
    "sub", "trans", "under", "co", "de", "en", "im", "in", "pro", "con",
    "ex", "per",
)


def morph_corpus() -> str:
    """The deterministic stem x affix grid as one space-joined text."""
    words = []
    for i, stem in enumerate(STEMS):
        for j, suf in enumerate(SUFFIXES):
            pre = PREFIXES[(i + j) % len(PREFIXES)]
            words.append(pre + stem + suf)
    return " ".join(words)


def corpus() -> list[str]:
    if not os.path.exists(DOCS_PATH):
        raise FileNotFoundError(
            f"{DOCS_PATH} missing — the vendored table is defined over "
            "seed + morphology grid + THIS fixture; training without it "
            "would silently produce a different table."
        )
    import pyarrow.parquet as pq

    docs = pq.read_table(DOCS_PATH).column("text").to_pylist()
    return [SEED_TEXT, EXTRA_TEXT, morph_corpus()] + docs


def main() -> None:
    merges, vocab = train_bpe(corpus(), N_MERGES)
    save_tables(merges, vocab)
    print(f"wrote {len(merges)} merges -> {MERGES_PATH}")
    print(f"wrote {len(vocab)} vocab entries -> {VOCAB_PATH}")


if __name__ == "__main__":
    main()
