"""Text-analysis kernels for the training-data pipeline operators:
language ID (stopword/char heuristic), quality scoring, token
counting, document fingerprinting.  All vectorized per batch (pandas
str ops / numpy) — no model downloads, deterministic."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

_STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "por", "para"},
}


def token_counts(texts: pd.Series) -> pd.DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (words +
    punctuation marks), both int64."""
    ws = texts.str.split().map(len).astype("int64")
    bpe = texts.map(lambda t: len(_WORD_RE.findall(t))).astype("int64")
    return pd.DataFrame({"n_ws_tokens": ws, "n_re_tokens": bpe})


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality features (ratios in [0,1], float64):
    mean word length, stopword ratio (en), non-alpha ratio,
    unique-word ratio."""
    out = {}
    words = texts.str.lower().str.split()
    n_words = words.map(len).clip(lower=1)
    out["mean_word_len"] = (words.map(lambda ws: float(np.mean([len(w) for w in ws]))
                                      if ws else 0.0))
    en = _STOPWORDS["en"]
    out["stopword_ratio"] = words.map(
        lambda ws: sum(w in en for w in ws) / max(1, len(ws)))
    out["nonalpha_ratio"] = texts.map(
        lambda t: sum(not (c.isalpha() or c.isspace()) for c in t) / max(1, len(t)))
    out["unique_ratio"] = words.map(lambda ws: len(set(ws)) / max(1, len(ws)))
    df = pd.DataFrame(out)
    df["quality"] = ((1.0 - df["nonalpha_ratio"])
                     * (0.5 + 0.5 * df["unique_ratio"])).clip(0.0, 1.0)
    return df


def lang_id(texts: pd.Series) -> pd.Series:
    """n-gram/stopword language heuristic: CJK chars → zh; else the
    stopword set with most hits; ties/no-hits → en."""
    def _one(t: str) -> str:
        if any("一" <= c <= "鿿" for c in t[:400]):
            return "zh"
        ws = set(t.lower().split())
        best, best_n = "en", 0
        for lang in ("en", "de", "fr", "es"):
            n = len(ws & _STOPWORDS[lang])
            if n > best_n:
                best, best_n = lang, n
        return best

    return texts.map(_one)


def md5_fingerprint(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hashlib.md5(t.encode()).hexdigest())


_B = 1000003
_MASK = (1 << 64) - 1


def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """64-bit polynomial rolling hash over the word sequence
    (order-sensitive document fingerprint).  Word hash = first 8 bytes
    of md5 so the DuckDB oracle reproduces it exactly (list_reduce over
    the word list with the same multiply-mask-xor step)."""
    def _one(t: str) -> int:
        h = 1469598103934665603
        for w in t.split():
            wh = int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
            h = ((h * _B) & _MASK) ^ wh
        return h & 0x7FFFFFFFFFFFFFFF                   # keep int64-positive

    return texts.map(_one)


def word_shingles(text: str, k: int = 3) -> set[str]:
    ws = text.split()
    if len(ws) < k:
        return {" ".join(ws)} if ws else set()
    return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}
