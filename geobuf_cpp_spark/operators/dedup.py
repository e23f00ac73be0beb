"""Document deduplication operators for training-data pipelines.

Four families, each a DataFrame-in / DataFrame-out operator:

* ``exact_dedup`` — hash-groupBy on md5(text): one shuffle on the digest,
  map-side partial agg; the canonical first pass at 100 TB.
* ``minhash_lsh_pairs`` — shingle -> 64-perm MinHash -> banded LSH
  bucket-join -> exact-Jaccard verify. Candidate generation never compares
  all pairs: docs meet only inside (band, bucket) groups, so the shuffle
  key is the band hash and hot buckets are bounded by ``max_bucket``.
* ``simhash_pairs`` — 64-bit SimHash, banded by 4x16-bit chunks (any pair
  at Hamming distance <= 3 shares at least one exact chunk — pigeonhole),
  then exact Hamming verify.
* embedding near-dup lives in operators.ann (cosine_topk with a threshold).

Signatures are computed in Arrow-batched ``mapInPandas`` with numpy-
vectorized permutation minima; only tokenization walks Python strings
(bounded by document length, not corpus size).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

MERSENNE_P = (1 << 61) - 1
N_PERM = 64
N_BANDS = 16  # x 4 rows per band


def _perm_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    # a < 2^31 keeps every intermediate product below 2^63: a*hi < 2^60 and
    # a*lo < 2^63, so the mod-P arithmetic is exact in uint64 (no wrapping)
    a = rng.integers(1, 1 << 31, size=N_PERM, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=N_PERM, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """w-word shingles -> uint64 hashes (blake2b-8, deterministic)."""
    words = text.split()
    if len(words) < w:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + w]) for i in range(len(words) - w + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
        )
    return out


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N_PERM,) signature: min over shingles of (a*h + b) mod p."""
    if hashes.size == 0:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    # fully broadcast (n_perm, n_shingles): a*h mod p split as
    # ((a*hi mod p) << 32 mod p) + (a*lo mod p); with a < 2^31 every
    # product stays below 2^63 so uint64 arithmetic is exact
    p = np.uint64(MERSENNE_P)
    h = hashes % p
    lo = (h & np.uint64(0xFFFFFFFF))[None, :]
    hi = (h >> np.uint64(32))[None, :]
    A = a[:, None]
    t_hi = (A * hi) % p  # < 2^61
    # (t_hi * 2^32) mod p without overflow: with p = 2^61 - 1, 2^61 ≡ 1,
    # so split t_hi = u_hi*2^29 + u_lo -> t_hi*2^32 ≡ u_hi + u_lo*2^32
    u_hi = t_hi >> np.uint64(29)
    u_lo = t_hi & np.uint64((1 << 29) - 1)
    shifted = (u_hi + (u_lo << np.uint64(32))) % p
    t = (shifted + (A * lo) % p + b[:, None]) % p
    return t.min(axis=1)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def exact_dedup(docs_df, id_col: str = "doc_id", text_col: str = "text"):
    """Groups of byte-identical documents: (dup_key, n_docs, keeper_id)."""
    return (
        docs_df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("dup_key"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
    )


BANDS_SCHEMA = "doc_id long, band int, bucket long"


def minhash_bands(docs_df, id_col: str = "doc_id", text_col: str = "text",
                  w: int = 3, seed: int = 42):
    """(doc_id, band, bucket) rows — the LSH shuffle key table."""
    a, b = _perm_params(seed)
    rows_per_band = N_PERM // N_BANDS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                sig = minhash_signature(shingle_hashes(text, w), a, b)
                for band in range(N_BANDS):
                    chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                    bucket = int.from_bytes(
                        hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(),
                        "little",
                        signed=True,
                    )
                    out.append((int(doc_id), band, bucket))
            yield pd.DataFrame(out, columns=["doc_id", "band", "bucket"])

    from ..plans.partitioning import spread

    return spread(docs_df.select(id_col, text_col)).mapInPandas(gen, BANDS_SCHEMA)


def minhash_lsh_pairs(docs_df, id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.7, w: int = 3, seed: int = 42,
                      max_bucket: int = 64):
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Bucket-join candidate generation, then exact shingle-Jaccard verify on
    the joined texts. ``max_bucket`` caps degenerate buckets (e.g. empty
    docs) — a skew guard; capped buckets are dropped, trading recall on
    pathological keys for bounded work, logged via the returned plan.
    """
    bands = minhash_bands(docs_df, id_col, text_col, w, seed)
    sized = bands.withColumn(
        "bsize", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("bsize") <= max_bucket)
    left = sized.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    right = sized.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    texts = docs_df.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_text"))
    joined = (
        cand.join(texts.withColumnRenamed("_tid", "id_a").withColumnRenamed("_text", "text_a"), "id_a")
        .join(texts.withColumnRenamed("_tid", "id_b").withColumnRenamed("_text", "text_b"), "id_b")
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for id_a, id_b, ta, tb in zip(
                pdf["id_a"], pdf["id_b"], pdf["text_a"], pdf["text_b"]
            ):
                j = jaccard(shingle_hashes(ta, w), shingle_hashes(tb, w))
                if j >= threshold:
                    rows.append((int(id_a), int(id_b), float(j)))
            yield pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    return joined.mapInPandas(verify, "id_a long, id_b long, jaccard double")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word hashes."""
    acc = np.zeros(64, dtype=np.int64)
    for word in text.split():
        h = int.from_bytes(
            hashlib.blake2b(word.encode("utf-8"), digest_size=8).digest(), "little"
        )
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def simhash_pairs(docs_df, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3):
    """Pairs at Hamming distance <= max_hamming (banded exact search)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                sh = simhash64(text)
                u = sh & 0xFFFFFFFFFFFFFFFF
                for band in range(4):
                    rows.append(
                        (int(doc_id), sh, band, (u >> (band * 16)) & 0xFFFF)
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "simhash", "band", "chunk"])

    from ..plans.partitioning import spread

    bands = spread(docs_df.select(id_col, text_col)).mapInPandas(
        gen, "doc_id long, simhash long, band int, chunk int"
    )
    left = bands.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "chunk"
    )
    right = bands.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "chunk"
    )
    cand = (
        left.join(right, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
