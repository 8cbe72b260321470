"""Text-analysis kernels for large-scale training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. Pure, vectorized
where the kernel allows; all deterministic.

These extend the reference's (link-only) extraction with the text operations a
100 TB corpus pipeline needs; they run over the ``documents`` table as
``map_batches`` stages.
"""

from __future__ import annotations

import re

import numpy as np

_M64 = (1 << 64) - 1

# --------------------------------------------------------------------------
# language ID — tiny character/stopword-profile heuristic.
# Profiles are hand-rolled from public orthography facts (no external data):
# character ranges for zh, stopword sets for latin-script languages.

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "with"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "du", "que", "est"},
    "de": {"der", "die", "und", "das", "ist", "von", "den", "ein", "eine", "mit"},
}

_WORD_RE = re.compile(r"[A-Za-zÀ-ÿ]+")
_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")

# word → language bitmask (words can sit in several languages' stopword
# sets): one dict lookup per word replaces a set-membership pass per
# language. _LANG_ORDER preserves the original tie-break (first max wins).
_LANG_ORDER = list(_STOPWORDS)
_STOPWORD_LANGS: dict[str, int] = {}
for _li, _lang in enumerate(_LANG_ORDER):
    for _w in _STOPWORDS[_lang]:
        _STOPWORD_LANGS[_w] = _STOPWORD_LANGS.get(_w, 0) | (1 << _li)


def detect_lang(text: str) -> str:
    """Best-effort language guess: 'zh' by CJK density, else argmax stopword
    hit-rate over {en, es, fr, de}; 'und' when nothing matches."""
    if not text:
        return "und"
    cjk = len(_CJK_RE.findall(text[:2000]))
    if cjk > max(8, len(text[:2000]) * 0.05):
        return "zh"
    words = _WORD_RE.findall(text[:4000])
    if not words:
        return "und"
    counts = [0] * len(_LANG_ORDER)
    get = _STOPWORD_LANGS.get
    for w in words:
        m = get(w.lower())
        if m:
            li = 0
            while m:
                if m & 1:
                    counts[li] += 1
                m >>= 1
                li += 1
    n = len(words)
    best, best_score = "und", 0.0
    for li, lang in enumerate(_LANG_ORDER):
        score = counts[li] / n
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0.02 else "und"


# --------------------------------------------------------------------------
# quality scoring

_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)


def quality_features(text: str) -> dict:
    """Length/punctuation/stopword features used by corpus quality filters."""
    n_chars = len(text)
    tokens = text.split()
    n_tokens = len(tokens)
    mean_len = (sum(len(t) for t in tokens) / n_tokens) if n_tokens else 0.0
    n_punct = len(_PUNCT_RE.findall(text))
    lowered = [t.lower() for t in tokens]
    n_stop = sum(1 for t in lowered if t in _STOPWORDS["en"])
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": mean_len,
        "punct_ratio": n_punct / max(n_chars, 1),
        "stopword_ratio": n_stop / max(n_tokens, 1),
    }


def quality_score(feat: dict) -> float:
    """Monotone [0,1] quality heuristic: penalize very short docs, extreme
    punctuation, missing stopwords, degenerate token lengths."""
    s = 1.0
    if feat["n_tokens"] < 5:
        s *= feat["n_tokens"] / 5.0
    if feat["punct_ratio"] > 0.2:
        s *= max(0.0, 1.0 - (feat["punct_ratio"] - 0.2) * 2)
    if not (2.0 <= feat["mean_token_len"] <= 12.0):
        s *= 0.5
    s *= min(1.0, 0.25 + feat["stopword_ratio"] * 3)
    return float(min(1.0, max(0.0, s)))


# --------------------------------------------------------------------------
# token counting — whitespace words plus a BPE-ish sub-word estimate

_BPE_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def count_tokens_ws(text: str) -> int:
    """Whitespace token count (matches SQL split-on-space oracles)."""
    return len(text.split(" ")) if text else 0


def count_tokens_bpe(text: str) -> int:
    """BPE-ish token estimate: words contribute ceil(len/4), punctuation 1."""
    n = 0
    for m in _BPE_RE.finditer(text):
        tok = m.group(0)
        if tok[0].isalnum() or tok[0] == "_":
            n += (len(tok) + 3) // 4
        else:
            n += 1
    return n


# --------------------------------------------------------------------------
# fingerprinting / shingling

from .hashing import hash64  # noqa: E402


def fingerprint(text: str, window: int = 8) -> int:
    """64-bit rolling-window document fingerprint: min-hash over character
    windows (a winnowing-style selection with k=1 — stable under small
    shifts, cheap, deterministic)."""
    if len(text) <= window:
        return hash64(text)
    best = _M64
    step = max(1, window // 2)
    for i in range(0, len(text) - window + 1, step):
        h = hash64(text[i : i + window])
        if h < best:
            best = h
    return best


def fingerprint_batch(texts: list, window: int = 8) -> np.ndarray:
    """uint64[ndocs], element i == ``fingerprint(texts[i])`` — all windows
    of all documents hashed in one ``hash64_batch`` call with per-document
    mins via ``np.minimum.reduceat`` (the scalar path pays one Python
    ``hash64`` per window)."""
    from .hashing import hash64_batch

    all_w: list[str] = []
    offsets: list[int] = []
    step = max(1, window // 2)
    pos = 0
    for t in texts:
        if len(t) <= window:
            all_w.append(t)
            offsets.append(pos)
            pos += 1
        else:
            ws = [t[j:j + window] for j in range(0, len(t) - window + 1, step)]
            all_w.extend(ws)
            offsets.append(pos)
            pos += len(ws)
    if not all_w:
        return np.zeros(0, dtype=np.uint64)
    h = hash64_batch(all_w)
    return np.minimum.reduceat(h, np.asarray(offsets))


def word_shingles(text: str, k: int = 3) -> set[str]:
    toks = text.lower().split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def char_ngrams(text: str, n: int = 5) -> set[str]:
    t = text.lower()
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0
