#!/usr/bin/env python
"""Regenerate tests/data/bpe_golden.json from the vendored BPE table.

Run AFTER a deliberate retrain (scripts/train_bpe.py); the golden file
pins encode() ids so an accidental table or algorithm change fails
tests/test_bpe.py::test_golden_token_ids loudly.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_monitoring_spark.functions.bpe import BPETokenizer  # noqa: E402

#: Coverage: fixture vocabulary, contractions, digits/prices, unicode,
#: punctuation runs, whitespace shapes, code-ish text.
GOLDEN_TEXTS = [
    "the table scan",
    "key agg row scan slow fast table value part hash",
    "The committee's quarterly assessment, published yesterday.",
    "don't you'll they'd it's we're",
    "In 1995 there were 2,048 entries; prices from $1.99 to $249.00.",
    "café naïve jalapeño Zürich",
    "ellipses..., em-dashes — and (parentheses) [brackets] {braces}",
    "  leading spaces and\n\nnewlines\tand tabs  ",
    "def process(records): return sum(r.value for r in records)",
    "https://example.com/path?query=value",
]


def main() -> None:
    tok = BPETokenizer.vendored()
    golden = {t: tok.encode(t) for t in GOLDEN_TEXTS}
    for t, ids in golden.items():
        assert tok.decode(ids) == t
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "data",
        "bpe_golden.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(golden, fh, ensure_ascii=False, indent=1)
    print(f"wrote {len(golden)} golden entries -> {out}")


if __name__ == "__main__":
    main()
