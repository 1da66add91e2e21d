"""Text-analysis kernels for large-scale training-data pipelines.

None of these exist in the reference (its payload is relational API data);
they are the documents-table operators a 100 TB curation pipeline needs:
language ID (n-gram/stopword heuristic), quality scoring, token counting,
and document fingerprinting.  All are vectorized (pandas str / numpy) and are
meant to run inside ``map_batches``; the stateful variants (compiled regexes,
stopword tables) live in :class:`TextAnalyzer`, built ONCE per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_WS = re.compile(r"\S+")
_PUNCT = re.compile(r"[^\w\s]", re.UNICODE)
_CJK = re.compile(r"[一-鿿぀-ヿ]")

# tiny per-language stopword profiles (public common words)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it", "with", "as"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que", "des"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "para", "que", "de", "en"},
}


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count per document (vectorized regex count)."""
    return texts.fillna("").str.count(_WS).to_numpy(dtype=np.int64)


def bpe_ish_token_count(texts: pd.Series) -> np.ndarray:
    """A BPE-ish proxy: words + digits + punctuation runs counted separately
    (the usual pre-tokenizer regex shape)."""
    pat = re.compile(r"\w+|[^\w\s]+")
    return texts.fillna("").str.count(pat).to_numpy(dtype=np.int64)


class TextAnalyzer:
    """Actor-pool stage: ``map_batches(TextAnalyzer, batch_format="pandas",
    concurrency=N)``.  Regexes/stopword tables compile once per actor
    (``__init__``), never per batch."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.ws = _WS
        self.punct = _PUNCT
        self.cjk = _CJK
        self.stop = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    # ---------------------------------------------------------- language ID

    def lang_scores(self, texts: pd.Series) -> pd.Series:
        """Heuristic language ID over {en,de,fr,es,zh}: CJK char ratio decides
        zh; otherwise argmax of stopword hit ratio."""
        toks = texts.fillna("").str.lower().str.findall(r"[a-zà-ÿäöüß]+")
        cjk_ratio = texts.fillna("").str.count(self.cjk) / texts.fillna("").str.len().clip(lower=1)

        def best(ws, cjk):
            if cjk > 0.05:
                return "zh"
            if not ws:
                return "und"
            scores = {
                lang: sum(1 for w in ws if w in sw) / len(ws)
                for lang, sw in self.stop.items()
            }
            lang, sc = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            return lang if sc > 0 else "und"

        return pd.Series(
            [best(ws, c) for ws, c in zip(toks, cjk_ratio)], index=texts.index, dtype=object
        )

    # ---------------------------------------------------------- quality

    def quality(self, texts: pd.Series) -> pd.DataFrame:
        """Length / punctuation-ratio / stopword-ratio / mean-word-length
        features + a composite [0,1] score (higher = more natural text)."""
        t = texts.fillna("")
        n_chars = t.str.len().to_numpy(np.float64)
        n_tokens = t.str.count(self.ws).to_numpy(np.float64)
        n_punct = t.str.count(self.punct).to_numpy(np.float64)
        toks = t.str.lower().str.findall(r"[a-z]+")
        en = self.stop["en"]
        stop_ratio = np.array(
            [sum(1 for w in ws if w in en) / max(1, len(ws)) for ws in toks], np.float64
        )
        mean_word_len = n_chars / np.maximum(1, n_tokens)
        punct_ratio = n_punct / np.maximum(1, n_chars)
        score = (
            np.clip(n_tokens / 64.0, 0, 1) * 0.3
            + np.clip(1.0 - punct_ratio * 4.0, 0, 1) * 0.3
            + np.clip(stop_ratio * 3.0, 0, 1) * 0.2
            + np.clip(1.0 - np.abs(mean_word_len - 5.0) / 5.0, 0, 1) * 0.2
        )
        return pd.DataFrame(
            {
                "n_chars": n_chars.astype(np.int64),
                "n_tokens": n_tokens.astype(np.int64),
                "punct_ratio": punct_ratio,
                "stopword_ratio": stop_ratio,
                "quality_score": score,
            },
            index=texts.index,
        )

    # ---------------------------------------------------------- fingerprint

    def fingerprint(self, texts: pd.Series, window: int = 8) -> pd.Series:
        """Rolling-hash document fingerprint: min-sampled Rabin-Karp hashes of
        token windows, xor-folded to one 64-bit hex id (robust to small
        whitespace-only edits, unlike sha256 of raw bytes)."""
        from zlib import crc32  # stable across processes (hash() is salted)

        B, M = 1000003, (1 << 61) - 1
        out = []
        for s in texts.fillna(""):
            ws = s.split()
            if not ws:
                out.append("0" * 16)
                continue
            hs = [crc32(w.encode("utf-8")) for w in ws]
            if len(hs) <= window:
                roll = 0
                for h in hs:
                    roll = (roll * B + h) % M
                out.append(f"{roll:016x}")
                continue
            mins = []
            roll = 0
            pw = pow(B, window - 1, M)
            for i, h in enumerate(hs):
                roll = (roll * B + h) % M
                if i >= window:
                    roll = (roll - hs[i - window] * pw * B) % M
                if i >= window - 1:
                    mins.append(roll)
            mins.sort()
            fold = 0
            for m in mins[:16]:
                fold ^= m
            out.append(f"{fold:016x}")
        return pd.Series(out, index=texts.index, dtype=object)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col]
        q = self.quality(t)
        for c in q.columns:
            batch[c] = q[c]
        batch["lang_pred"] = self.lang_scores(t)
        batch["fingerprint"] = self.fingerprint(t)
        return batch
