"""Text analysis built-ins: tokenization, counting, quality scoring,
language-ID heuristic, fingerprinting.

All pure Column expressions over `documents.text` — no Python in the hot
path, so these run at full scan speed on 100 TB of text. Semantics are
deliberately simple/deterministic so the DuckDB oracles can mirror them
exactly (see plans/llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny English-marker stopword set for the n-gram/stopword language heuristic
EN_MARKERS = ("the", "a", "of", "and", "to", "in")


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (single-space convention of the testdata)."""
    return F.split(F.col(col), " ")


def token_count(col: str = "text") -> Column:
    return F.size(tokens(col))


def char_count(col: str = "text") -> Column:
    return F.length(F.col(col)).cast("bigint")


def avg_token_len(col: str = "text") -> Column:
    """Mean token length = (chars - separators) / tokens, one double divide
    (deterministic; avoids per-token float accumulation)."""
    n = token_count(col).cast("double")
    total = (char_count(col).cast("double") - (n - 1.0))
    return F.round(total / n, 6)


def english_marker_ratio(col: str = "text") -> Column:
    """Fraction of tokens that are English marker words — the stopword-ratio
    language-ID heuristic."""
    marker_list = ", ".join(f"'{w}'" for w in EN_MARKERS)
    hits = F.expr(
        f"size(filter(split({col}, ' '), w -> w IN ({marker_list})))"
    ).cast("double")
    return F.round(hits / token_count(col).cast("double"), 6)


def predicted_lang(col: str = "text", threshold: float = 0.05) -> Column:
    """'en' when the marker ratio clears the threshold, else 'other'."""
    return F.when(english_marker_ratio(col) >= threshold, "en").otherwise("other")


def chunks(col: str = "text", size: int = 64, stride: int = 48) -> Column:
    """Sliding-window document chunking: ``array<string>`` of token windows
    (``size`` tokens, advancing by ``stride`` — overlap = size - stride),
    the standard pretraining chunker shape.

    Pure Column expressions (split → sequence → transform/slice/array_join),
    so the 1→N fan-out happens JVM-side inside the row's partition — zero
    shuffle, no Python, and the explode downstream scales linearly with
    output chunks. Chunk count = 1 if n<=size else ceil((n-size)/stride)+1
    (no trailing window that is a pure suffix of the previous one).
    """
    tk = tokens(col)
    n = F.size(tk)
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.floor(
            (n - F.lit(size) + F.lit(stride - 1)) / F.lit(stride).cast("double")
        ).cast("int")
        + 1
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(tk, i * stride + 1, size), " "),
    )


def fingerprint(col: str = "text", prefix_chars: int = 100) -> Column:
    """Document fingerprint: md5 over the normalized (lowercased, trimmed)
    head of the document — the cheap first-pass dedup key."""
    return F.md5(F.lower(F.trim(F.substring(F.col(col), 1, prefix_chars))))


_ALNUM_SPACE = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
)


def punct_ratio(col: str = "text") -> Column:
    """Punctuation density: non-alphanumeric-non-space chars / chars.

    Implemented with ``translate`` (constant char-map lookup per char)
    rather than a regex — identical semantics for the ASCII class
    ``[^a-zA-Z0-9 ]``, ~several× cheaper per row at scan speed."""
    stripped = F.length(F.translate(F.col(col), _ALNUM_SPACE, ""))
    total = F.length(F.col(col))
    return F.round(
        stripped.cast("double") / total.cast("double"), 6
    )


def distinct_token_count(col: str = "text") -> Column:
    return F.size(F.array_distinct(tokens(col)))


def lexical_diversity(col: str = "text") -> Column:
    """distinct tokens / tokens — the repetition-penalty quality signal
    (boilerplate and template spam score low)."""
    return distinct_token_count(col).cast("double") / token_count(col).cast(
        "double"
    )


def quality_score(col: str = "text") -> Column:
    """Document quality = length score × lexical diversity, rounded.

    length score saturates at 100 tokens (LEAST(n/100, 1)); the product
    form means a long-but-repetitive document still scores low. All double
    ops are in a fixed order so the DuckDB oracle mirrors bit-exactly.
    """
    len_score = F.least(
        token_count(col).cast("double") / F.lit(100).cast("double"),
        F.lit(1).cast("double"),
    )
    return F.round(len_score * lexical_diversity(col), 6)


def quality_bucket(col: str = "text") -> Column:
    """Coarse keep/review/drop routing bucket over the quality score."""
    q = quality_score(col)
    return (
        F.when(q >= 0.5, "high").when(q >= 0.25, "medium").otherwise("low")
    )
