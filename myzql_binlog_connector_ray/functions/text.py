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
    """Whitespace token counts — one Arrow RE2 kernel: the number of
    ``\\S+`` runs equals the post-trim split length (round-4: replaced
    the pandas str.split list materialization, which built every token
    as a Python object just to count them)."""
    import pyarrow.compute as pc

    counts = pc.cast(pc.count_substring_regex(batch[text_col], r"\S+"), pa.int64())
    # null text counts as 0 tokens (the old pandas path's fillna(0)) —
    # a propagated null would silently NaN-poison downstream prefix sums
    return batch.append_column("n_tokens", pc.coalesce(counts, pa.scalar(0, pa.int64())))


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


# Winnowing fingerprint spec — shared with the DuckDB oracle, which
# recomputes the exact same values via list_transform/list_filter over
# codepoints. Window hash of codepoints c[i..i+W-1] is the polynomial
# sum(c[i+j] * BASE^(W-1-j)) mod MOD; keep hashes ≡ 0 (mod KEEP_MOD),
# emit h >> 1. MOD = 2^31-1 keeps every intermediate product within
# int64 (codepoint < 2^21, power < 2^31, 16-term sum < 2^57) so numpy
# and SQL BIGINT arithmetic agree exactly.
FP_BASE = 257
FP_MOD = (1 << 31) - 1
FP_WINDOW = 16
FP_KEEP_MOD = 8
_FP_POWERS = np.array(
    [pow(FP_BASE, FP_WINDOW - 1 - j, FP_MOD) for j in range(FP_WINDOW)], dtype=np.int64
)


def rolling_fingerprint(text: str, window: int = FP_WINDOW, keep_mod: int = FP_KEEP_MOD) -> list[int]:
    """Winnowing-style fingerprint: polynomial hash over codepoint
    windows, keep hashes ≡ 0 (mod keep_mod); falls back to the last
    window (or the whole-text hash for short docs) so the sketch is
    never empty. Vectorized: one (L-W+1, W) @ (W,) int64 matmul."""
    if not text:
        return [0]
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    if len(cp) < window:
        h = 0
        for c in cp.tolist():
            h = (h * FP_BASE + c) % FP_MOD
        return [h >> 1]
    windows = np.lib.stride_tricks.sliding_window_view(cp, window)
    powers = _FP_POWERS if window == FP_WINDOW else np.array(
        [pow(FP_BASE, window - 1 - j, FP_MOD) for j in range(window)], dtype=np.int64
    )
    hashes = (windows @ powers) % FP_MOD
    kept = hashes[hashes % keep_mod == 0]
    if kept.size == 0:
        return [int(hashes[-1]) >> 1]
    return (kept >> 1).tolist()


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
