"""Deterministic text primitives shared by the dedup / text-analysis
operators AND their DuckDB oracles.

Both engines compute the identical definition:

- tokens: ``lower(text)`` split on ``[^a-z0-9]+``, empties dropped;
- shingles: word 3-grams joined by single spaces;
- h32: the first 8 hex chars of ``md5(seed ':' s)`` as a bigint — md5 is
  byte-identical across engines, giving a portable deterministic 32-bit
  hash family (seeded by prefix) with no RNG and no engine-specific
  hash function. This is what makes MinHash/SimHash oracle-checkable.

Spark-side expressions are built as SQL strings (F.expr) and the oracle
fragments are generated from the same constants, so the two sides cannot
drift apart silently. Note the indexing difference: Spark arrays are
0-based, DuckDB lists are 1-based — each fragment accounts for it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
SHINGLE_N = 3

# ---------------- Spark side (0-based arrays) ----------------------------


def tokens_expr(col: str) -> Column:
    return F.expr(f"filter(split(lower({col}), '{TOKEN_SPLIT_RE}'), t -> t != '')")


def shingles_expr(tokens_col: str) -> Column:
    """Distinct word 3-grams (sets, for Jaccard/MinHash).

    The ``size >= N`` CASE guard is load-bearing: Spark's
    ``sequence(1, 0)`` is the DESCENDING ``[1, 0]``, not empty (unlike
    DuckDB's ``range``), so a 1-2-token document would index past the
    token array and throw. Short and NULL-text documents get the empty
    shingle set — matching the oracle's ``range(1, 1) = []``."""
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {SHINGLE_N} THEN"
        f" array_distinct(transform(sequence(1, size({tokens_col}) - 2),"
        f" i -> concat_ws(' ', {tokens_col}[i-1], {tokens_col}[i], {tokens_col}[i+1])))"
        f" ELSE CAST(array() AS array<string>) END"
    )


def h32_sql(seed: str, s: str) -> str:
    """Spark SQL fragment: deterministic 32-bit hash of expression ``s``."""
    return f"CAST(conv(substring(md5(concat('{seed}', ':', {s})), 1, 8), 16, 10) AS BIGINT)"


def h32_from_hex_sql(hex_col: str, offset: int = 1) -> str:
    """Spark SQL: 32 hash bits from 8 hex chars of an already-computed md5
    digest column — lets a 64-bit consumer (SimHash) take two independent
    32-bit words (offsets 1 and 9) from ONE md5 evaluation per token."""
    return f"CAST(conv(substring({hex_col}, {offset}, 8), 16, 10) AS BIGINT)"


#: Universal-hash family for MinHash: h_k(x) = (A_k * x + B_k) mod P over
#: the md5-derived 32-bit base hash. One md5 per shingle total (the
#: expensive string hash), K cheap integer remixes — ~K x faster than
#: hashing K times, and still exact integer arithmetic in both engines
#: (h < 2^32, A < 2^31 -> products < 2^63).
MINHASH_P = 2_147_483_647  # 2^31 - 1 (prime)


def minhash_params(k: int) -> tuple[int, int]:
    """Per-function coefficients (A_k, B_k), md5-derived so they are
    INDEPENDENT across k. The previous family A_k = c*(k+1) mod P was
    linear in k, which correlates the hash functions catastrophically:
    consecutive remixes of the same base hash differ by the constant
    (h*c mod P), so an adversarial h for which that step is small stays
    the minimum across dozens of k's — measured 76/81 minhash agreement
    between two UNRELATED documents sharing a single 32-bit base-hash
    collision (band false-positive rate ~3.7e-9/pair, i.e. ~2*10^9
    spurious candidate pairs at 10^9 documents). md5-derived
    coefficients restore pairwise independence; the banding S-curve
    p(j) = 1-(1-j^r)^b then actually holds. Deterministic and baked
    into both engines' SQL as literals, so cross-engine parity is
    unaffected."""
    import hashlib

    a = int(hashlib.md5(f"mha:{k}".encode()).hexdigest()[:15], 16) % (MINHASH_P - 1) + 1
    b = int(hashlib.md5(f"mhb:{k}".encode()).hexdigest()[:15], 16) % MINHASH_P
    return a, b


def shingle_hashes_sql(shingles_col: str) -> str:
    """Spark SQL: one 32-bit md5-derived hash per shingle (computed once)."""
    return f"transform({shingles_col}, s -> {h32_sql('mh', 's')})"


#: Hex chars taken when packing an md5 digest into a BIGINT join key:
#: 15 chars = 60 bits < 2^63, so the value is exact in both engines
#: (Spark ``conv`` emits an unsigned decimal string that a BIGINT cast
#: holds; DuckDB's '0x' literal cast likewise). Used for shuffle-borne
#: keys (LSH band buckets, span gram keys): an 8-byte long replaces a
#: 32-char hex string on every exchanged row — 4x fewer key bytes —
#: at a 60-bit collision rate (~n^2/2^61 spurious candidates) far below
#: the banding false-positive rate those keys already carry.
H60_HEX_CHARS = 15


def h60_from_md5_sql(md5_expr: str) -> str:
    """Spark SQL: pack an md5 hex expression into a 60-bit BIGINT key."""
    return (
        f"CAST(conv(substring({md5_expr}, 1, {H60_HEX_CHARS}), 16, 10) AS BIGINT)"
    )


def o_h60_from_md5(md5_expr: str) -> str:
    """DuckDB mirror of :func:`h60_from_md5_sql` — identical 60 bits."""
    return f"CAST(('0x' || substr({md5_expr}, 1, {H60_HEX_CHARS})) AS BIGINT)"


def minhash_sql(hashes_col: str, k: int) -> str:
    """Spark SQL: k-th MinHash as an affine remix of the base hashes.
    (Documentation form — the operator computes the same values
    row-locally in one Arrow pass by default, with the explode + min()
    aggregate kept as method="agg"; see
    operators/dedup.minhash_signatures. Kept as the 1:1 structural
    mirror of the DuckDB oracle fragment o_minhash below.)"""
    a, b = minhash_params(k)
    return f"array_min(transform({hashes_col}, h -> (h * {a} + {b}) % {MINHASH_P}))"


# ---------------- DuckDB oracle side (1-based lists) ----------------------


def o_tokens(col: str) -> str:
    return f"list_filter(regexp_split_to_array(lower({col}), '{TOKEN_SPLIT_RE}'), t -> t <> '')"


def o_shingles(tokens_col: str) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len({tokens_col}) - 2, 0) + 1),"
        f" i -> {tokens_col}[i] || ' ' || {tokens_col}[i+1] || ' ' || {tokens_col}[i+2]))"
    )


def o_h32(seed: str, s: str) -> str:
    return f"CAST(('0x' || substr(md5('{seed}' || ':' || {s}), 1, 8)) AS BIGINT)"


def o_h32_from_hex(hex_col: str, offset: int = 1) -> str:
    return f"CAST(('0x' || substr({hex_col}, {offset}, 8)) AS BIGINT)"


def o_shingle_hashes(shingles_col: str) -> str:
    return f"list_transform({shingles_col}, s -> {o_h32('mh', 's')})"


def o_minhash(hashes_col: str, k: int) -> str:
    a, b = minhash_params(k)
    return f"list_min(list_transform({hashes_col}, h -> (h * {a} + {b}) % {MINHASH_P}))"
