"""Text-analysis operators for corpus curation (beyond-reference spec).

Language-ID, quality scoring, token counting, and document fingerprinting
over `documents(doc_id, text, ...)`. Everything is a JVM-side Column
expression — at 100 TB these run scan-local with zero shuffles (narrow
transformations), so throughput is bounded by parquet scan speed.

Each operator has a closed-form definition reproducible in ANSI SQL for
the DuckDB oracle (see queries/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from duckdb_spark.operators.dedup import hash64, tokens

# Tiny deterministic stopword lists per language (top function words).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est", "pour", "dans"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "den", "von", "mit"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "他"],
}


def token_count(col) -> Column:
    """Whitespace token count."""
    t = F.trim(_c(col))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def word_token_count(col) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation
    runs (regexp-based; a proxy for subword tokenizers)."""
    return F.size(
        F.expr(
            f"regexp_extract_all({_sql(col)}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"
        )
    )


def _sql(x) -> str:
    return x if isinstance(x, str) else str(x._jc)


def stopword_hits(col, lang: str) -> Column:
    """How many tokens are stopwords of `lang`."""
    return stopword_hits_from_tokens(tokens(col), lang)


def stopword_hits_from_tokens(toks, lang: str) -> Column:
    """stopword_hits over a pre-tokenized array column — callers that need
    hits for several languages should project `tokens(text)` ONCE and feed
    it here: the composed form re-inlines the regex split per language
    (Catalyst only collapses cheap expressions into multi-reference
    consumers), so a 5-language scorer re-splits the text 5×."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(_c(toks), lambda t: F.array_contains(sw, t)))


def argmax_lang(hit_cols: dict[str, Column]) -> Column:
    """Language-ID argmax over per-language hit-count COLUMNS (ties →
    lexicographic lang order; 'und' when all zero) — the decision chain of
    detect_language, decoupled from hit computation so hits are evaluated
    once even though the chain references each score twice."""
    scores = sorted(hit_cols.items())
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lg, s in reversed(scores):
        out = F.when(s == best, F.lit(lg)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def lang_scores(col) -> Column:
    """struct<lang:string> per-language stopword-hit counts."""
    return F.struct(*[stopword_hits(col, lg).alias(lg) for lg in STOPWORDS])


def detect_language(col) -> Column:
    """Heuristic language-ID: argmax stopword hits (ties → lexicographic
    lang order; 'und' when zero hits everywhere). Single-expression form;
    pipelines should project tokens once and use
    stopword_hits_from_tokens + argmax_lang (see queries/text.py)."""
    return argmax_lang({lg: stopword_hits(col, lg) for lg in STOPWORDS})


def punct_ratio(col) -> Column:
    stripped = F.regexp_replace(_c(col), r"[^\p{L}\p{N}\s]", "")
    return (F.length(_c(col)) - F.length(stripped)) / F.greatest(F.length(_c(col)), F.lit(1))


def mean_word_length(col) -> Column:
    toks = tokens(col)
    return F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / F.greatest(
        F.size(toks), F.lit(1)
    )


def quality_score(col) -> Column:
    """Composite quality heuristic in [0,1]: length band + low punctuation
    + stopword presence (standard corpus-filtering features)."""
    n_tok = token_count(col)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.3)
    p = punct_ratio(col)
    punct_ok = F.when(p <= 0.2, 1.0).otherwise(F.greatest(F.lit(0.0), 1.0 - (p - 0.2) * 4))
    sw = F.greatest(*[stopword_hits(col, lg) for lg in STOPWORDS])
    sw_ratio = sw / F.greatest(n_tok, F.lit(1))
    sw_ok = F.least(sw_ratio * 5, F.lit(1.0))
    return F.round((len_ok + punct_ok + sw_ok) / 3.0, 4)


def fingerprint(col) -> Column:
    """Content fingerprint: md5 of the sorted distinct token set
    (normalization-invariant — token order / duplication don't matter)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def rolling_fingerprint(col, k: int = 5, window: int = 4) -> Column:
    """Winnowing-style fingerprint (Schleimer et al., SIGMOD'03): hash all
    character k-grams, then keep the min hash of each `window` consecutive
    k-grams; fingerprint = distinct selected hashes. Used for robust
    near-dup/plagiarism detection."""
    s = F.lower(_c(col))
    n = F.length(s)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0))),
        lambda i: hash64(F.substring(s, 1, 0x7FFFFFFF).substr(i, F.lit(k))),
    )
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(grams) - (window - 1), F.lit(0))),
        lambda i: F.array_min(F.slice(grams, i, window)),
    )
    return F.array_sort(F.array_distinct(windows))
