"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. Actor-pool shaped (profiles/regexes built once
per actor), vectorized per batch where the kernel allows."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# Tiny fixed stopword profiles for an n-gram/stopword language-ID
# heuristic (public-knowledge common-word lists, top function words).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "se", "por"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "que"},
    "de": {"der", "die", "und", "das", "in", "von", "zu", "den", "mit", "ist"},
    "zh": set(),  # CJK detected by codepoint range, not stopwords
}


def _is_cjk(ch: str) -> bool:
    return "一" <= ch <= "鿿"


class LanguageId:
    """Heuristic language ID: CJK codepoint ratio, else stopword votes."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}

    def classify(self, text: str) -> str:
        if text and sum(_is_cjk(c) for c in text[:200]) / max(1, min(len(text), 200)) > 0.2:
            return "zh"
        words = set(text.lower().split())
        best, best_score = "unknown", 0
        for lang, stops in self.profiles.items():
            score = len(words & stops)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token counts, vectorized via pandas str ops."""
    s = batch[text_col].to_pandas()
    counts = s.str.split().str.len().fillna(0).astype(np.int64)
    return batch.append_column("n_tokens", pa.array(counts, pa.int64()))


class QualityScorer:
    """Cheap quality features: length, token count, alpha ratio,
    stopword ratio, mean word length. Regexes compiled once per actor."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.word_re = re.compile(r"\w+", re.UNICODE)
        self.stops = _LANG_PROFILES["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n_chars, n_tokens, alpha_ratio, stop_ratio, mean_wlen = [], [], [], [], []
        for t in texts:
            toks = t.split()
            n_chars.append(len(t))
            n_tokens.append(len(toks))
            alpha = sum(c.isalpha() for c in t)
            alpha_ratio.append(alpha / max(1, len(t)))
            stop_ratio.append(sum(w in self.stops for w in toks) / max(1, len(toks)))
            mean_wlen.append(sum(map(len, toks)) / max(1, len(toks)))
        return batch.append_column("q_chars", pa.array(n_chars, pa.int64())) \
            .append_column("q_tokens", pa.array(n_tokens, pa.int64())) \
            .append_column("q_alpha_ratio", pa.array(alpha_ratio, pa.float64())) \
            .append_column("q_stop_ratio", pa.array(stop_ratio, pa.float64())) \
            .append_column("q_mean_word_len", pa.array(mean_wlen, pa.float64()))


def rolling_fingerprint(text: str, window: int = 16, keep_mod: int = 8) -> list[int]:
    """Winnowing-style fingerprint: rolling hash over byte windows, keep
    hashes ≡ 0 (mod keep_mod). Deterministic document sketch."""
    data = text.encode("utf-8")
    if len(data) < window:
        h = int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")
        return [h >> 1]
    B, M = 257, (1 << 61) - 1
    power = pow(B, window - 1, M)
    h = 0
    out = []
    for i, byte in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * power) % M
        h = (h * B + byte) % M
        if i >= window - 1 and h % keep_mod == 0:
            out.append(h >> 1)
    return out or [h >> 1]


def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = [rolling_fingerprint(t) for t in batch[text_col].to_pylist()]
    return batch.append_column("fingerprint", pa.array(fps, pa.list_(pa.int64())))


# GPT-2-style pre-tokenizer, restricted to RE2-compatible constructs
# (no lookahead, explicit ASCII classes) so the DuckDB oracle counts the
# exact same matches with regexp_extract_all. Python re and RE2 are both
# leftmost-first over these alternatives.
BPEISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


class BpeishTokenCounter:
    """Token counting with a GPT-2-style pre-tokenizer regex — the
    common approximation for LLM token budgeting when the real BPE
    merges aren't available. Regex compiled once per actor."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.pat = re.compile(BPEISH_PATTERN)

    def count(self, text: str) -> int:
        return len(self.pat.findall(text))

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [self.count(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("n_bpe_tokens", pa.array(counts, pa.int64()))
