"""SimHash fingerprinting + hamming distance (SURVEY.md §2.3 P12, P14).

Reproduces the reference's 64-bit SimHash math exactly
(TextAnalysis.java:185-301, kelleszzz/BingCrawler):

  token hash (:250-272)  Python-2-string-hash clone over the token's utf-8
      bytes as JAVA SIGNED bytes: x = b[0]<<7; per byte x = ((x*1000003) ^ b)
      & (2^64-1); finally x ^= len(token in CHARS); -1 → -2 (dead branch once
      masked, kept for parity). Python ints are infinite two's complement,
      same as BigInteger, so signed-byte xor needs no special casing.
  bit vote (:219-243)    per unique token, v[i] += 1 if bit i set else -1;
      fingerprint bit i = 1 iff v[i] >= 0 (NOTE >=, so an empty token set
      yields all-ones = 2^64-1 — quirk preserved).
  hamming (:278-300)     popcount(xor); -1 when either fingerprint missing
      (BingDataAnalysisUtils.java:24-39).

DOCUMENTED DIVERGENCE (SURVEY.md §7 hard-part d): the reference tokenizes via
ansj + Stanford CoreNLP lemmatization, whose dictionary blob is absent from
the repo (.MISSING_LARGE_BLOBS) — irreproducible. This rebuild fixes a
deterministic regex tokenizer (unicode word runs, lowercased) and keeps the
term-count cap semantics (first 151 terms — loop runs while count <= 150,
TextAnalysis.java:105) and the hash/vote math exact.

Spark side: one vectorized pandas UDF text→int64 (Arrow batches); hamming is
a pure JVM column expression (bit_count(xor)).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MASK64 = (1 << 64) - 1
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
_TERM_CAP = 151  # reference loop: `keyWordsCount <= 150`, post-incremented


def py_tokenize(text: str) -> list[str]:
    """Deterministic stand-in for ansj/CoreNLP: lowercase word runs, first
    151 terms (cap parity), de-duplicated preserving nothing (set semantics —
    the vote sums over unique tokens, so order is irrelevant)."""
    terms = _TOKEN_RE.findall(text.lower())[:_TERM_CAP]
    return list(set(terms))


def py_token_hash(token: str, hashbits: int = 64) -> int:
    """Exact clone of TextAnalysis.java:250-272 (Java signed bytes)."""
    if not token:
        return 0
    mask = (1 << hashbits) - 1
    raw = token.encode("utf-8")
    signed = [b - 256 if b >= 128 else b for b in raw]
    x = signed[0] << 7
    for b in signed:
        x = ((x * 1000003) ^ b) & mask
    x ^= len(token)  # CHAR length (source.length()), not byte length
    if x == -1:
        x = -2
    return x


def py_simhash64(text: str | None) -> int | None:
    """text → unsigned 64-bit fingerprint (None in, None out)."""
    if text is None:
        return None
    tokens = py_tokenize(text)
    v = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in tokens:
        h = np.uint64(py_token_hash(tok))
        bits = (h >> shifts) & np.uint64(1)
        v += np.where(bits.astype(bool), 1, -1)
    fp = 0
    for i in range(64):
        if v[i] >= 0:  # reference uses >=  (TextAnalysis.java:233)
            fp |= 1 << i
    return fp


def to_signed64(u: int) -> int:
    """unsigned 64-bit → Spark LongType two's-complement value."""
    return u - (1 << 64) if u >= (1 << 63) else u


def to_unsigned64(s: int) -> int:
    return s + (1 << 64) if s < 0 else s


@F.pandas_udf(T.LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) SimHash; stores the fingerprint as a signed
    int64 column — hamming via bit_count(xor) is sign-agnostic."""
    out = [
        None if t is None else to_signed64(py_simhash64(t)) for t in texts
    ]
    return pd.Series(out, dtype="object").astype("Int64")


def hamming_col(a: Column, b: Column) -> Column:
    """P14: popcount(a xor b); -1 when either side is null
    (BingDataAnalysisUtils.java:29-33 parity)."""
    return F.when(
        a.isNull() | b.isNull(), F.lit(-1)
    ).otherwise(F.bit_count(a.bitwiseXOR(b)))


def py_hamming(a: int | None, b: int | None) -> int:
    if a is None or b is None:
        return -1
    return bin((a & MASK64) ^ (b & MASK64)).count("1")
