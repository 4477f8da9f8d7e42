"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting.

Everything here is JVM-side ``pyspark.sql.functions`` (whole-stage codegen,
zero Python in the hot path); the vectorized pandas-UDF variants live in
``mimic_iv_etl_spark.functions`` for the cases built-ins can't express.
All outputs are deterministic so a DuckDB oracle can pin them.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Deliberately static + public knowledge; at 100 TB this broadcast-free
# literal-array approach keeps language ID inside codegen.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empty-string safety: '' → []."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(df: DataFrame, text_col: str = "text",
                alias: str = "n_tokens") -> DataFrame:
    """Whitespace token count."""
    return df.withColumn(alias, F.size(tokens(text_col)))


def bpe_ish_token_count(df: DataFrame, text_col: str = "text",
                        alias: str = "n_subtokens") -> DataFrame:
    """BPE-ish subword proxy: count word chunks + digits + punctuation marks
    via regex splitting (a cheap stand-in for a real tokenizer, good enough
    for length-based curation thresholds)."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[A-Za-zÀ-ɏ]{1,4}|\d|[^\sA-Za-z\d]"), 0
    )
    return df.withColumn(alias, F.size(pieces))


# the exact character set of the regex class [A-Za-zÀ-ɏ] (ASCII letters +
# U+00C0–U+024F), enumerated so the alpha count can run as a translate()
# dictionary deletion instead of a regex replace — measured 1.8s → 0.32s
# over 50k docs at sf1.0 with zero value differences (both count the same
# code points; translate builds no result string per row)
_ALPHA_CHARS = "".join(
    chr(c) for r in ((65, 91), (97, 123), (0xC0, 0x250)) for c in range(*r)
)


def quality_score(df: DataFrame, text_col: str = "text",
                  alias: str = "quality") -> DataFrame:
    """Heuristic document quality in [0,1]: length band + alpha ratio +
    stopword presence + repetition penalty. All arithmetic — codegen'd."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    n_toks = F.size(tokens(text_col))
    n_alpha = n_chars - F.length(F.translate(txt, _ALPHA_CHARS, ""))
    uniq_ratio = F.when(
        n_toks > 0, F.size(F.array_distinct(tokens(text_col))) / n_toks
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(tokens(text_col)),
            F.array(*[F.lit(w) for w in LANG_PROFILES["en"]]),
        )
    )
    length_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    alpha_term = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    stop_term = F.least(stop_hits / F.lit(4.0), F.lit(1.0))
    score = (length_term + alpha_term + stop_term + uniq_ratio) / 4
    return df.withColumn(alias, F.round(score, 6))


def language_id(df: DataFrame, text_col: str = "text",
                alias: str = "lang_pred") -> DataFrame:
    """Stopword-profile language ID: distinct-token overlap with each
    language profile, argmax wins (ties broken by language code order so the
    result is deterministic). Unknown when nothing matches."""
    toks = F.array_distinct(tokens(text_col))
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in sorted(LANG_PROFILES.items())
    ]
    best = reduce(
        lambda acc, s: F.when(
            s[1] > acc["n"], F.struct(F.lit(s[0]).alias("l"), s[1].alias("n"))
        ).otherwise(acc),
        scores[1:],
        F.struct(F.lit(scores[0][0]).alias("l"), scores[0][1].alias("n")),
    )
    return df.withColumn(
        alias, F.when(best["n"] > 0, best["l"]).otherwise(F.lit("unknown"))
    )


def normalize_text_expr(col: Column | str) -> Column:
    """Canonical text form, JVM-side: trim + whitespace collapse + lowercase.
    (Unicode NFC normalization needs the pandas-UDF variant —
    ``mimic_iv_etl_spark.functions.normalize_text`` — Spark has no builtin.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def fingerprint(df: DataFrame, text_col: str = "text",
                alias: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text.
    md5 (not xxhash64) so the DuckDB oracle can reproduce it bit-exact."""
    return df.withColumn(alias, F.md5(normalize_text_expr(text_col)))


def rolling_fingerprint(df: DataFrame, text_col: str = "text", n: int = 5,
                        alias: str = "shingle_min_hash",
                        hash_fn: str = "xxhash64") -> DataFrame:
    """Winnowing-style fingerprint: min of hashes over word n-gram shingles
    (robust to local edits, used as a near-dup prefilter). Built entirely from
    higher-order array functions — no UDF, no explode/shuffle.

    ``hash_fn='xxhash64'`` (default) is the scale path; ``'md5'`` takes the
    lexicographic min of md5 hex digests — slower, but reproducible by any
    SQL engine, so the correctness gate can oracle it (same discipline as
    :func:`fingerprint`)."""
    if hash_fn == "md5":
        h = F.array_min(F.transform(_shingles(text_col, n), lambda s: F.md5(s)))
    else:
        h = F.array_min(F.transform(_shingles(text_col, n), lambda s: F.xxhash64(s)))
    return df.withColumn(alias, h)


def _shingles(text_col: str, n: int) -> Column:
    """Array of word n-gram shingle strings (sub-n-token text → ONE whole-text
    shingle).

    The token array is bound to a lambda variable via a one-element outer
    ``transform`` before the per-shingle loop touches it. Without the binding,
    Catalyst inlines the ``tokens()`` regex split into every lambda-body
    reference and the interpreted HOF re-splits the text once per shingle —
    O(tokens²) regex work per document (measured: 3.4s → <0.3s for 5k docs
    at sf0.1). Lambda variables are evaluated once; aliases are not."""
    def over_words(w: Column) -> Column:
        k = F.size(w) - (n - 1)
        return F.when(k <= 0, F.array(F.concat_ws(" ", w))).otherwise(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            )
        )

    return F.element_at(
        F.transform(F.array(tokens(text_col)), over_words), 1
    )
