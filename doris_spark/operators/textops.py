"""Text-analysis operators: tokenize / match / language-ID / quality /
fingerprint / BM25 ranking.

Reference analogs:
- tokenize: be/src/exprs/function/function_tokenize.cpp
- match_any/match_all/match_phrase: be/src/exprs/function/match.h:54-59 and
  the inverted-index layer be/src/storage/index/inverted/ — here expressed
  as token-set predicates over `tokenize` (semantic-equivalent layer per
  SURVEY §2.10; Spark has no inverted index, so matching is a scan predicate
  that Catalyst can still push into the parquet reader as a string filter).
- BM25 score(): be/src/exprs/function/function_score.cpp — implemented as a
  docfreq-join DataFrame pipeline (idf from a broadcast-size term-stats
  aggregate).

Everything is built-in-function composition — no Python UDFs — so the hot
path stays in whole-stage codegen.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Whitespace tokenizer over normalized text (lower + trim + collapse).
def tokenize(text_col):
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " ")


def match_any(text_col, terms: Sequence[str]):
    """True if the token set contains ANY of `terms` (Doris match_any)."""
    toks = tokenize(text_col)
    cond = F.lit(False)
    for t in terms:
        cond = cond | F.array_contains(toks, t.lower())
    return cond


def match_all(text_col, terms: Sequence[str]):
    """True if the token set contains ALL of `terms` (Doris match_all)."""
    toks = tokenize(text_col)
    cond = F.lit(True)
    for t in terms:
        cond = cond & F.array_contains(toks, t.lower())
    return cond


def _norm(text_col):
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def match_phrase(text_col, phrase: str):
    """True if the text contains the token phrase contiguously at token
    boundaries (Doris match_phrase; ' cat dog ' does not match 'bobcat
    dog'). Pure substring test on the space-padded normalized text — stays
    in whole-stage codegen, no token explosion."""
    needle = " " + " ".join(phrase.lower().split()) + " "
    return F.concat(F.lit(" "), _norm(text_col), F.lit(" ")).contains(needle)


def match_phrase_prefix(text_col, phrase: str):
    """Doris match_phrase_prefix: all terms match exactly except the LAST,
    which matches as a prefix ('spark jo' matches 'spark join'/'spark
    journal'). Same padded-substring trick without the trailing pad — the
    last term may continue arbitrarily, and the leading space enforces the
    boundary before every term."""
    needle = " " + " ".join(phrase.lower().split())
    return F.concat(F.lit(" "), _norm(text_col)).contains(needle)


# Small multilingual stopword table for the heuristic language classifier.
_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "los"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
}


def lang_id(text_col):
    """Heuristic n-gram/stopword language ID: the language whose marker
    words occur most often; 'und' when nothing matches. Deterministic
    tie-break by language code order.

    Single pass: one `aggregate` fold builds the per-language count vector
    (tokenize evaluated ONCE), and every later multi-use value (the vector,
    its max) is bound as a lambda variable via a 1-element `transform` so
    Catalyst cannot re-expand it — the same recompute trap measured on
    simhash (12 filter passes + 12 tokenize evals before; NOTES.md)."""
    langs = sorted(_LANG_MARKERS)
    toks = tokenize(text_col)
    init = F.array(*[F.lit(0) for _ in langs])
    vec = F.aggregate(
        toks,
        init,
        lambda acc, t: F.array(
            *[
                acc[i] + F.when(t.isin(*_LANG_MARKERS[lang]), 1).otherwise(0)
                for i, lang in enumerate(langs)
            ]
        ),
    )
    lang_lits = F.array(*[F.lit(lang) for lang in langs])
    # bind vec -> v, then max(v) -> b; array_position returns the FIRST
    # index of the max, which is exactly the sorted-language tie-break.
    out = F.transform(
        F.array(vec),
        lambda v: F.transform(
            F.array(F.array_max(v)),
            lambda b: F.when(
                b > 0, F.element_at(lang_lits, F.array_position(v, b).cast("int"))
            ).otherwise(F.lit("und")),
        )[0],
    )[0]
    return out


_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Adds standard quality-scoring features: token count, char count, mean
    token length, distinct-token ratio, stopword ratio."""
    toks = tokenize(text_col)
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return (
        df.withColumn("n_tokens", n)
        .withColumn("n_chars_norm", F.length(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")))
        .withColumn(
            "mean_token_len",
            F.when(n > 0, F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "distinct_ratio",
            F.when(n > 0, F.size(F.array_distinct(toks)).cast("double") / n).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n > 0, n_stop.cast("double") / n).otherwise(F.lit(0.0)),
        )
    )


def fingerprint(text_col):
    """Document fingerprint: md5 over the sorted distinct token set —
    order/whitespace-insensitive content identity (dedup key)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokenize(text_col)))))


def bm25_rank(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 10,
) -> DataFrame:
    """BM25 ranking of `docs` for a bag of query terms.

    Plan: one aggregate for (N, avgdl), one aggregate per-corpus for each
    term's docfreq (single groupBy over exploded matches), both broadcast
    into the scoring scan. Two passes over the corpus, no self-join —
    scales as O(corpus) with a tiny broadcast of term stats.

    Returns (id, score) top-`limit` by score desc (ties: id asc).
    """
    terms = [t.lower() for t in terms]
    toks_col = tokenize(text_col)
    with_toks = docs.select(
        F.col(id_col).alias("doc"), toks_col.alias("toks"), F.size(toks_col).alias("dl")
    )
    stats = with_toks.agg(
        F.count(F.lit(1)).alias("N"), F.avg("dl").alias("avgdl")
    )
    term_arr = F.array(*[F.lit(t) for t in terms])
    df_per_term = (
        with_toks.select(
            F.col("doc"), F.explode(F.array_distinct(F.filter(F.col("toks"), lambda t: F.array_contains(term_arr, t)))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = with_toks.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    # Per-term tf from the token array; idf joined from term stats.
    tstats = {r["term"]: r["df"] for r in df_per_term.collect()}  # ≤ len(terms) rows
    for t in terms:
        dfreq = tstats.get(t, 0)
        tf = F.size(F.filter(F.col("toks"), lambda x: x == F.lit(t))).cast("double")
        # docfreq comes from the tiny collected term-stats map (bounded by
        # the query-term count — a broadcast variable, not a data collect);
        # N/avgdl stay in-plan via the broadcast stats row.
        idf_expr = F.log(
            (F.col("N") - F.lit(dfreq) + F.lit(0.5)) / (F.lit(dfreq) + F.lit(0.5)) + F.lit(1.0)
        )
        denom = tf + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        score = score + idf_expr * (tf * F.lit(k1 + 1)) / denom
    return (
        scored.select(F.col("doc"), score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc"))
        .limit(limit)
    )


# ------------------------------------------------ pipeline curation ops


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard pre-embedding step of a training/RAG pipeline. Pure column
    algebra: tokenize -> slice windows with stride (chunk_tokens -
    overlap) -> posexplode. One narrow pass, no shuffle, no UDF; chunk
    counts scale with doc length so long docs fan out naturally across
    partitions. Returns (id, chunk_id, chunk_text, n_tokens)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokenize(text_col)
    n = F.size(toks)
    # window start indices: 0, stride, 2*stride, ... while start < n
    # (a doc shorter than one chunk still yields its single short chunk)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int"), F.lit(0)),
    )
    chunks = F.transform(
        starts,
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
    )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.filter(chunks, lambda c: F.size(c) > 0)).alias(
                "chunk_id", "__toks"
            ),
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join("__toks", " ").alias("chunk_text"),
            F.size("__toks").alias("n_tokens"),
        )
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# NANP-ish phones: optional +country code, optional (area), separators
# optional — catches 5551234567 and +1 555 123 4567, not just 3-3-4.
_PHONE_RE = r"(\+\d{1,3}[- .]?)?\(?\d{3}\)?[- .]?\d{3}[- .]?\d{4}\b"
# octets constrained to 0-255 (1.2.345.6 passes through); a valid-octet
# version string like 1.2.3.4 is still masked — indistinguishable from
# an address by regex, and over-masking is the safe side for a scrubber.
_IPV4_OCT = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_IPV4_RE = r"\b" + _IPV4_OCT + r"(\." + _IPV4_OCT + r"){3}\b"


def scrub_pii(text_col):
    """Mask common PII patterns (emails, phone numbers, IPv4 literals)
    with typed placeholders — the standard scrubbing pass before a
    corpus ships to training. Chained regexp_replace, fully JVM-side.
    Coverage is regex-level: international formats outside +CC NANP
    shapes and obfuscated spellings ('five five five...') pass through;
    route those through a dedicated NER pass if the corpus needs it."""
    c = F.regexp_replace(_c_text(text_col), _EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, _PHONE_RE, "<PHONE>")
    return F.regexp_replace(c, _IPV4_RE, "<IP>")


def _c_text(col):
    return F.col(col) if isinstance(col, str) else col


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    order_col: str,
    rank_expr=None,
) -> DataFrame:
    """Deterministic N-per-group sampling: rank rows inside each stratum
    by a stable pseudo-random key (xxhash64 of the order column — NOT a
    volatile rand(), so resampling is reproducible and the oracle can
    recompute it) and keep the first N. One shuffle on the strata key;
    WindowGroupLimit prunes to N per group before the filter at scale.
    The curation use: balance a corpus per (language, source) before
    training."""
    key = rank_expr if rank_expr is not None else F.xxhash64(_c_text(order_col))
    w = Window.partitionBy(*strata_cols).orderBy(key, F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )
