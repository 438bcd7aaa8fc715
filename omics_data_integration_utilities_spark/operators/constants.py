"""Shared constants for cross-engine-deterministic operators.

The dedup/similarity operators hash with md5 (available and identical in
Spark SQL and DuckDB) mapped to a 60-bit integer:

- Spark : ``conv(substr(md5(x),1,15),16,10)`` cast to long
- DuckDB: ``('0x' || substr(md5(x),1,15))::BIGINT``

MinHash permutations are ``(a*h + b) mod P`` with ``h`` pre-reduced mod P
so every product stays below 2^63 in both engines (P ≈ 2^30, a < 2^30).
"""

# modulus for minhash permutation arithmetic (prime, ~2^30)
MINHASH_P = 1_000_000_007

# (a, b) pairs for the 16 minhash permutations — fixed so reruns and the
# DuckDB oracle agree (replaces the reference's random virtual-molecule ids,
# gizmos.py:330-336, with deterministic hashing per SURVEY §7)
MINHASH_PERMS: list[tuple[int, int]] = [
    (472882049, 135664957), (972663749, 832472253), (292662877, 413215133),
    (673268485, 982451653), (581869302, 338158324), (862930157, 545404204),
    (999999937, 700268573), (198765431, 123456791), (715225739, 311485243),
    (433024223, 897987541), (655662917, 224478569), (387420489, 761838257),
    (526399877, 484874233), (918273645, 102334155), (736583521, 657428363),
    (273646877, 936586231),
]

# LSH banding: 16 minhashes → 4 bands of 4 rows
MINHASH_BANDS = 4
MINHASH_ROWS_PER_BAND = 4

# word-shingle width for document fingerprints / near-dup detection
SHINGLE_WIDTH = 3

# tiny English stopword list for the language-ID heuristic (must stay in
# sync between the Spark expression and the generated oracle SQL)
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this", "be",
]

# simhash width (bits)
SIMHASH_BITS = 32

# posting-list cap for inverted-index pair expansion (LSH buckets, shingle
# postings, containment index).  A degenerate key — a stop-shingle like
# "the the and", or a band key over near-constant signatures — collects
# every matching doc id into ONE row and emits |ids|² pairs from it; AQE
# cannot split a single row, so at corpus scale one hot key kills the
# stage.  Keys above the cap are dropped on BOTH engines (the DuckDB
# oracles carry the same HAVING bound) — for near-dup detection a key
# shared by >MAX_POSTING docs carries ~zero signal anyway.
MAX_POSTING = 1000
