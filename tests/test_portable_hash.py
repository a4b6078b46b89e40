"""Engine-portability contract for the round-3 hash families.

The minhash signatures, simhash fingerprints, and sign-LSH hyperplanes
are documented as reproducible by ANY engine with md5 (that claim is
what makes the LSH queries oracle-checkable and persisted signature
indexes engine-migratable). These tests pin it against a from-scratch
pure-Python reference — no Spark expression reuse, no DuckDB — so a
regression back to a JVM-private hash (or an off-by-one in the hex
slicing) fails loudly rather than silently greying the oracles.
"""

from __future__ import annotations

import hashlib
import re

from quantlab_data_pipeline_spark.llm.dedup import (
    MINHASH_PRIME,
    minhash_coefficients,
    minhash_signatures,
    simhash_fingerprints,
)
from quantlab_data_pipeline_spark.llm.similarity import sign_matrix

TEXTS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "short"),
    (3, "Sphinx of black quartz, judge my vow! 42 times."),
]


def _tokens(text: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_signature(text: str, num_hashes: int = 64, k: int = 3) -> list[int]:
    toks = _tokens(text)
    if len(toks) >= k:
        grams = list(dict.fromkeys(
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ))
    else:
        grams = [" ".join(toks)]
    hs = [_h32(g) for g in grams]
    return [
        min((a * h + b) % MINHASH_PRIME for h in hs)
        for a, b in minhash_coefficients(num_hashes)
    ]


def _py_simhash(text: str) -> int:
    sums = [0] * 64
    for tok in set(_tokens(text)):
        hexd = hashlib.md5(tok.encode()).hexdigest()
        lo, hi = int(hexd[:8], 16), int(hexd[8:16], 16)
        for i in range(64):
            bit = ((lo if i < 32 else hi) >> (i % 32)) & 1
            sums[i] += 1 if bit else -1
    fp = sum(1 << i for i in range(64) if sums[i] > 0)
    return fp - (1 << 64) if fp >= 1 << 63 else fp  # Spark long semantics


def test_minhash_signature_matches_python_reference(spark):
    df = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    got = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures(df).collect()
    }
    for doc_id, text in TEXTS:
        assert got[doc_id] == _py_signature(text), f"doc {doc_id}"


def test_simhash_fingerprint_matches_python_reference(spark):
    df = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(df).collect()}
    for doc_id, text in TEXTS:
        assert got[doc_id] == _py_simhash(text), f"doc {doc_id}"


def test_sign_matrix_is_md5_derived_and_stable():
    m = sign_matrix(3, 5)
    assert [len(r) for r in m] == [5, 5, 5]
    for i, row in enumerate(m):
        for d, s in enumerate(row):
            exp = 1 if hashlib.md5(f"plane:{i}:{d}".encode()).digest()[0] & 1 else -1
            assert s == exp
    assert all(s in (1, -1) for row in m for s in row)
    assert m == sign_matrix(3, 5)  # no hidden state


def test_minhash_coefficients_fit_overflow_budget():
    # a < 2^31 and base hash < 2^32 keeps a*h+b under 2^63 (no ANSI
    # bigint overflow in Spark OR DuckDB) — the documented invariant
    # the modulus choice rests on.
    for a, b in minhash_coefficients(256):
        assert 1 <= a < MINHASH_PRIME
        assert 0 <= b < MINHASH_PRIME
        assert a * (2**32 - 1) + b < 2**63
