"""Text-analysis kernels for large-scale training-data pipelines.

These run inside ``map_batches`` over the ``documents`` table: language
identification (character/stopword n-gram heuristic), quality scoring,
token counting, rolling-hash fingerprints, shingling, MinHash and
SimHash. All deterministic, all batch-oriented (numpy / compiled regex),
no per-row Python in the callers' hot paths beyond the inherent
per-document parse.
"""

from __future__ import annotations

import re

import numpy as np

from .urls import hash64

_RE_TOKEN = re.compile(r"\S+")
_RE_WORD = re.compile(r"[\w']+", re.UNICODE)
# a BPE-ish pre-tokenizer: words, numbers, punctuation runs (GPT-2 style, simplified)
_RE_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")

# tiny per-language stopword lists for the n-gram/stopword Lang-ID heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "with", "was", "on", "as"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "den", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "des", "dans", "pour", "que", "qui", "sur", "avec"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "un", "en", "que", "por", "para", "con", "del"},
}


def token_count(texts) -> np.ndarray:
    """Whitespace token count per text -> int64 ndarray."""
    return np.fromiter((len(_RE_TOKEN.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts))


def bpeish_token_count(texts) -> np.ndarray:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / punct runs)."""
    return np.fromiter((len(_RE_BPEISH.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts))


def detect_lang(text: str) -> str:
    """Stopword-ratio language id over {en,de,fr,es}, 'zh' for CJK-heavy,
    'und' when nothing matches."""
    if not text:
        return "und"
    cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
    if cjk > len(text[:400]) * 0.2:
        return "zh"
    words = [w.lower() for w in _RE_WORD.findall(text)[:200]]
    if not words:
        return "und"
    best, best_hits = "und", 0
    for lang, stops in _STOPWORDS.items():
        hits = sum(1 for w in words if w in stops)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best if best_hits >= 2 else "und"


def quality_features(texts) -> dict[str, np.ndarray]:
    """Per-document quality features: length, tokens, mean word length,
    alpha ratio, punctuation ratio, stopword ratio (en), uppercase ratio."""
    n = len(texts)
    n_chars = np.zeros(n, dtype=np.int64)
    n_tokens = np.zeros(n, dtype=np.int64)
    mean_word_len = np.zeros(n, dtype=np.float64)
    alpha_ratio = np.zeros(n, dtype=np.float64)
    punct_ratio = np.zeros(n, dtype=np.float64)
    stop_ratio = np.zeros(n, dtype=np.float64)
    en_stops = _STOPWORDS["en"]
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        toks = _RE_TOKEN.findall(t)
        n_tokens[i] = len(toks)
        if toks:
            mean_word_len[i] = sum(len(w) for w in toks) / len(toks)
            low = [w.lower().strip(".,;:!?") for w in toks]
            stop_ratio[i] = sum(1 for w in low if w in en_stops) / len(toks)
        if t:
            alpha = sum(ch.isalpha() for ch in t)
            punct = sum(not ch.isalnum() and not ch.isspace() for ch in t)
            alpha_ratio[i] = alpha / len(t)
            punct_ratio[i] = punct / len(t)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_word_len": mean_word_len,
        "alpha_ratio": alpha_ratio,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
    }


def quality_score(feats: dict[str, np.ndarray]) -> np.ndarray:
    """Scalar quality score in [0,1] from ``quality_features`` output.
    Fixed linear rubric (deterministic; documented, not learned)."""
    len_ok = np.clip(feats["n_tokens"] / 100.0, 0.0, 1.0)
    wl = feats["mean_word_len"]
    wl_ok = np.clip(1.0 - np.abs(wl - 5.0) / 5.0, 0.0, 1.0)
    return np.clip(
        0.35 * len_ok + 0.25 * feats["alpha_ratio"] + 0.2 * wl_ok
        + 0.2 * (1.0 - np.clip(feats["punct_ratio"] * 4.0, 0.0, 1.0)),
        0.0,
        1.0,
    )


def fingerprint64(texts) -> np.ndarray:
    """Rolling-hash document fingerprint: 64-bit hash of the
    whitespace-normalized text (exact-dup key)."""
    norm = [" ".join(_RE_TOKEN.findall(t or "")) for t in texts]
    return hash64(norm)


def shingles(text: str, k: int = 5) -> list[str]:
    """k-word shingles of the whitespace-normalized text."""
    toks = _RE_TOKEN.findall(text or "")
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


# --- MinHash ---------------------------------------------------------------
# 64-bit universal hashing: h_i(x) = (a_i * x + b_i) mod p, p = 2^61 - 1.
_MERSENNE = (1 << 61) - 1


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (len == num_perm) of a set of 64-bit shingle hashes."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)[:, None]
    # object-dtype exact modular arithmetic is too slow; use uint64 wraparound
    # multiply-add then mod p — collisions from wraparound are fine for LSH.
    hv = (x * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return hv.min(axis=0)


def simhash64(texts, ngram: int = 3) -> np.ndarray:
    """64-bit SimHash over word n-grams per text."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = _RE_TOKEN.findall(t or "")
        grams = [" ".join(toks[j : j + ngram]) for j in range(max(0, len(toks) - ngram + 1))] or ([" ".join(toks)] if toks else [])
        if not grams:
            continue
        hv = hash64(grams)
        bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        vote = (2 * bits - 1).sum(axis=0)
        out[i] = np.uint64(((vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    while np.any(x):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)
