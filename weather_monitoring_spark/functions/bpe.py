"""Byte-level BPE tokenizer — tokenizer-faithful token counting for the
training-prep surface.

Why this exists: ``pack_token_budget`` / ``write_training_shards`` budget
shards in tokens, and the consumer of those shards (a trainer) counts BPE
tokens, not whitespace tokens. Whitespace counts run ~1.3-1.5x low on
English web text, so whitespace-budgeted shards are systematically
oversized. This module supplies the faithful counter.

Everything here is the PUBLIC byte-level BPE construction (Sennrich et
al. 2016 "Neural Machine Translation of Rare Words with Subword Units";
the byte-level variant and file formats from the OpenAI GPT-2 public
release, Radford et al. 2019):

- a 256-entry byte→unicode table so arbitrary bytes become printable
  characters and the merges file stays a text file;
- a regex pre-tokenizer (contractions | letter runs | digit runs |
  punctuation runs | whitespace, with the space-prefix convention);
- greedy lowest-rank pair merging per pre-token;
- the standard ``merges.txt`` (one "left right" pair per line, rank =
  line order) and ``vocab.json`` (token string → id) file formats, so
  any published tokenizer in that format (e.g. GPT-2's own) drops in
  via :meth:`BPETokenizer.load`.

The VENDORED table (``weather_monitoring_spark/data/bpe/``) is trained
from scratch by ``scripts/train_bpe.py`` on a deterministic seed corpus
— this container has no network and no published tokenizer package, so
the repo ships its own deterministically-derived table in the standard
format rather than pretending to have GPT-2's. Token IDS therefore
differ from GPT-2's; token COUNTS track BPE compression behavior, which
is what shard budgeting needs. Swap the two data files to use a real
published tokenizer unchanged.

Cross-engine oracle policy: BPE encoding is an iterative greedy
algorithm with no SQL form (same class as HLL/GK sketches) — guarantees
live in pytest: dual-implementation agreement (the fast min-rank loop vs
an independent scan-replace reference), byte-exact decode(encode(x)) ==
x round-trips under hypothesis, and golden token-id fixtures pinned in
tests/test_bpe.py.

Scale notes: counting is embarrassingly parallel (see
operators/tokenize.py for the Arrow-batched Spark side); the per-process
pre-token cache makes throughput track DISTINCT pre-tokens, not total
tokens — natural text re-uses a small vocabulary, so the amortized cost
per token is a dict hit.
"""

from __future__ import annotations

import json
import os
from collections import Counter
from functools import lru_cache
from typing import Iterable

try:  # the 'regex' module supports \p{L}/\p{N}; baked into this env
    import regex as _re

    _PRETOKEN_PATTERN = (
        r"'s|'t|'re|'ve|'m|'ll|'d"
        r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
    )
except ImportError:  # pragma: no cover - fallback keeps module importable
    import re as _re

    # \p{L} ~= [^\W\d_] under re.UNICODE; \p{N} narrowed to \d. Documented
    # approximation — only reachable where 'regex' is absent.
    _PRETOKEN_PATTERN = (
        r"'s|'t|'re|'ve|'m|'ll|'d"
        r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+"
    )

PRETOKEN_RE = _re.compile(_PRETOKEN_PATTERN)

#: Where the vendored table lives (standard GPT-2 file formats).
DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "bpe")
MERGES_PATH = os.path.join(DATA_DIR, "merges.txt")
VOCAB_PATH = os.path.join(DATA_DIR, "vocab.json")

#: Env override for the active table directory (must contain merges.txt
#: + vocab.json in the standard formats) — the drop-in path for a
#: published tokenizer. Resolved at :meth:`BPETokenizer.vendored` call
#: time IN THE CALLING PROCESS: on a cluster that means it must reach
#: the executor Python workers (``spark.executorEnv.WMS_BPE_DIR``) —
#: the explicit-path arguments on operators/tokenize.py's exprs travel
#: in the UDF closure instead and need no env plumbing; prefer those.
ENV_BPE_DIR = "WMS_BPE_DIR"

#: Pre-token cache bound: cleared when exceeded so a pathological input
#: (random bytes => unbounded distinct pre-tokens) cannot grow executor
#: memory without limit.
_CACHE_MAX = 1 << 20


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte→printable-unicode table: visible latin-1
    bytes map to themselves, the rest shift to 256+n — a bijection, so
    merges files stay printable and decoding is exact for any byte."""
    visible = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    codes = list(visible)
    shift = 0
    for b in range(256):
        if b not in visible:
            visible.append(b)
            codes.append(256 + shift)
            shift += 1
    return dict(zip(visible, (chr(c) for c in codes)))


@lru_cache(maxsize=1)
def unicode_to_bytes() -> dict[str, int]:
    return {c: b for b, c in bytes_to_unicode().items()}


def _pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word, word[1:]))


class BPETokenizer:
    """Encode/decode/count with a merges table.

    ``merges`` is the ranked pair list; ``vocab`` maps token string → id.
    When ``vocab`` is None, ids are assigned canonically: 0..255 for the
    byte alphabet in byte order, then one id per merge in rank order —
    exactly what :func:`train_bpe` produces.
    """

    def __init__(
        self,
        merges: list[tuple[str, str]],
        vocab: dict[str, int] | None = None,
    ) -> None:
        self.merges = list(merges)
        self.ranks: dict[tuple[str, str], int] = {
            pair: i for i, pair in enumerate(self.merges)
        }
        if vocab is None:
            b2u = bytes_to_unicode()
            vocab = {b2u[b]: b for b in range(256)}
            next_id = 256
            for a, b in self.merges:
                vocab[a + b] = next_id
                next_id += 1
        else:
            # Eager closure check (r12): every piece encode() can emit
            # is a base byte char or the result a+b of some merge, so a
            # supplied vocab must cover exactly that closure — a
            # mismatched merges/vocab pair (truncated download, wrong
            # file) must fail HERE at load, not KeyError hours into a
            # distributed encode on whichever document first reaches
            # the missing piece.
            b2u = bytes_to_unicode()
            missing = [c for b in range(256) if (c := b2u[b]) not in vocab]
            missing += [a + b for a, b in self.merges if a + b not in vocab]
            if missing:
                raise ValueError(
                    f"BPE vocab is not closed over the merge table: "
                    f"{len(missing)} reachable piece(s) missing "
                    f"(first: {missing[0]!r}) — encode() would KeyError "
                    f"mid-job; the merges/vocab files do not belong "
                    f"together"
                )
        self.vocab = dict(vocab)
        self.id_to_token = {i: t for t, i in self.vocab.items()}
        self._cache: dict[str, tuple[str, ...]] = {}

    # ---------------- construction ----------------

    @classmethod
    def load(
        cls, merges_path: str = MERGES_PATH, vocab_path: str | None = VOCAB_PATH
    ) -> "BPETokenizer":
        """Load the standard merges.txt (+ optional vocab.json) formats.
        Lines starting with '#' (the ``#version`` header) are skipped."""
        merges: list[tuple[str, str]] = []
        with open(merges_path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                left, right = line.split(" ")
                merges.append((left, right))
        vocab = None
        if vocab_path is not None and os.path.exists(vocab_path):
            with open(vocab_path, encoding="utf-8") as fh:
                vocab = json.load(fh)
        return cls(merges, vocab)

    #: process-wide instance cache, keyed by resolved table paths —
    #: supersedes the old single-slot lru_cache so a path override can
    #: coexist with the vendored table in one process.
    _instances: dict[tuple[str, str | None], "BPETokenizer"] = {}

    @classmethod
    def cached(
        cls, merges_path: str = MERGES_PATH, vocab_path: str | None = VOCAB_PATH
    ) -> "BPETokenizer":
        """One instance per process per (merges, vocab) path pair."""
        key = (merges_path, vocab_path)
        inst = cls._instances.get(key)
        if inst is None:
            inst = cls.load(merges_path, vocab_path)
            cls._instances[key] = inst
        return inst

    @classmethod
    def vendored(cls) -> "BPETokenizer":
        """The ACTIVE table: ``data/bpe/`` by default, or the directory
        named by ``$WMS_BPE_DIR`` (standard merges.txt + vocab.json) —
        the published-tokenizer drop-in, resolved at call time so a
        swap needs no code change. Cached per process per path."""
        d = os.environ.get(ENV_BPE_DIR)
        if d:
            return cls.cached(
                os.path.join(d, "merges.txt"), os.path.join(d, "vocab.json")
            )
        return cls.cached()

    # ---------------- core ----------------

    def _merge_word(self, token: str) -> tuple[str, ...]:
        """Greedy BPE: repeatedly merge the present pair with the lowest
        rank until no ranked pair remains. The standard algorithm."""
        hit = self._cache.get(token)
        if hit is not None:
            return hit
        word: tuple[str, ...] = tuple(token)
        while len(word) > 1:
            best = min(
                _pairs(word), key=lambda p: self.ranks.get(p, float("inf"))
            )
            if best not in self.ranks:
                break
            first, second = best
            out: list[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        if len(self._cache) >= _CACHE_MAX:
            self._cache.clear()
        self._cache[token] = word
        return word

    def encode(self, text: str) -> list[int]:
        b2u = bytes_to_unicode()
        vocab = self.vocab
        ids: list[int] = []
        for pre in PRETOKEN_RE.findall(text):
            mapped = "".join(b2u[b] for b in pre.encode("utf-8"))
            ids.extend(vocab[piece] for piece in self._merge_word(mapped))
        return ids

    def count(self, text: str) -> int:
        b2u = bytes_to_unicode()
        n = 0
        for pre in PRETOKEN_RE.findall(text):
            mapped = "".join(b2u[b] for b in pre.encode("utf-8"))
            n += len(self._merge_word(mapped))
        return n

    def decode(self, ids: Iterable[int]) -> str:
        """Inverse of :meth:`encode`. ``errors="replace"`` (the GPT-2
        reference behavior): an id subsequence that splits a multi-byte
        UTF-8 character decodes to U+FFFD instead of raising, so
        partial/streamed id sequences never crash; complete
        ``encode()`` output always round-trips byte-exactly."""
        u2b = unicode_to_bytes()
        text = "".join(self.id_to_token[i] for i in ids)
        return bytes(u2b[c] for c in text).decode("utf-8", errors="replace")


def train_bpe(
    texts: Iterable[str], n_merges: int, min_freq: int = 2
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Deterministic BPE training (Sennrich et al. 2016): count
    pre-token frequencies once, then ``n_merges`` times merge the most
    frequent adjacent pair; ties break to the lexicographically smallest
    pair so the result is independent of dict iteration order. Training
    stops early when the best pair's frequency falls below ``min_freq``
    (merging frequency-1 pairs only memorizes rare words — Sennrich's
    vocabulary-threshold argument).

    Driver-side, offline: training a tokenizer is a sampled one-machine
    task (the table is KBs); only APPLYING it is distributed.
    """
    b2u = bytes_to_unicode()
    word_freq: Counter = Counter()
    for text in texts:
        for pre in PRETOKEN_RE.findall(text):
            word_freq[tuple(b2u[b] for b in pre.encode("utf-8"))] += 1

    merges: list[tuple[str, str]] = []
    words: dict[tuple[str, ...], int] = dict(word_freq)
    for _ in range(n_merges):
        pair_freq: Counter = Counter()
        for word, freq in words.items():
            for pair in zip(word, word[1:]):
                pair_freq[pair] += freq
        if not pair_freq:
            break
        best, best_freq = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_freq < min_freq:
            break
        merges.append(best)
        first, second = best
        joined = first + second
        next_words: dict[tuple[str, ...], int] = {}
        for word, freq in words.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            next_words[key] = next_words.get(key, 0) + freq
        words = next_words

    vocab = {b2u[b]: b for b in range(256)}
    for i, (a, b) in enumerate(merges):
        vocab[a + b] = 256 + i
    return merges, vocab


def save_tables(
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    merges_path: str = MERGES_PATH,
    vocab_path: str = VOCAB_PATH,
) -> None:
    """Write the standard GPT-2-format files."""
    os.makedirs(os.path.dirname(merges_path), exist_ok=True)
    with open(merges_path, "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n")
        for a, b in merges:
            fh.write(f"{a} {b}\n")
    with open(vocab_path, "w", encoding="utf-8") as fh:
        json.dump(vocab, fh, ensure_ascii=False, indent=0, sort_keys=True)
