"""Deduplication operators over a text column.

All are expressed Ray-Data-first:

- exact:    md5-hash column (vectorized) → groupby(hash) → first-by-id.
  At 100 TB the groupby shuffles only (hash, id) pairs — the text
  column is dropped before the exchange.
- minhash:  shingle → 128 minhashes → banded LSH; candidate pairs come
  from a groupby on (band, band_hash) — only keys whose band-bucket has
  ≥2 members are shuffled onward; verification re-computes real Jaccard.
- simhash:  64-bit fingerprint per doc; near-dups = identical value (or
  small Hamming distance within buckets).
- ngram-jaccard: the verifier kernel, usable standalone.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

# -- exact dedup -------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text", out_col: str = "content_hash") -> pa.Table:
    """Vectorized-ish md5 per row (C-speed hashing; no SQL-visible salt)."""
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(hashes, pa.string()))


def keep_first_by(group: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    return group.nsmallest(1, id_col)


# -- shingling / minhash -----------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Word k-gram 64-bit hashes (stable across processes: blake2b)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "little")
    return out


class MinHasher:
    """Actor-pool stage: per-doc minhash signature + LSH band keys.

    ``__init__`` builds the permutation tables once per actor;
    ``__call__`` emits ``num_bands`` rows per doc: (doc_id, band,
    band_hash) — the groupby key that buckets LSH candidates.
    """

    def __init__(self, num_perm: int = 128, num_bands: int = 16, k: int = 5, text_col: str = "text"):
        assert num_perm % num_bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.rows_per_band = num_perm // num_bands
        self.k = k
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (a * x + b) mod p, min over shingles, per permutation
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for did, text in zip(doc_ids, texts):
            sig = self.signature(text)
            for band in range(self.num_bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                out_doc.append(did)
                out_band.append(band)
                out_hash.append(int.from_bytes(h, "little") >> 1)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )


def band_bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """(band, band_hash) group → candidate pairs (a < b), deduped later."""
    ids = sorted(group["doc_id"].unique().tolist())
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    pairs = [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]
    return pd.DataFrame(pairs, columns=["a", "b"])


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact word-k-gram Jaccard (the LSH verification kernel)."""
    sa = set(shingle_hashes(text_a, k).tolist())
    sb = set(shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# -- simhash -----------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (stable blake2b word hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = [simhash64(t) >> 1 for t in batch[text_col].to_pylist()]  # >>1: fit int64
    return batch.append_column("simhash", pa.array(vals, pa.int64()))
