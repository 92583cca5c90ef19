"""Text-analysis operators for training-data pipelines (SURVEY.md
§2.11): language ID (stopword heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), document fingerprinting.

All pure built-in Column expressions — at 100 TB these run inside
whole-stage codegen with zero Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mo_etl_spark.operators.dedup import normalize_text, tokens

#: tiny English function-word list for the language-ID heuristic
EN_STOPWORDS = (
    "the a an and or of to in is are was were be been for with on at by "
    "from that this it as not no"
).split()

#: BPE-ish pretokenizer: word pieces, digit runs, single punctuation
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c))


def bpe_ish_tokens(c: Column) -> Column:
    """Regex pretokenization (GPT-2-style shape, simplified to a
    dialect-portable pattern)."""
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 0)


def stopword_ratio(c: Column) -> Column:
    toks = tokens(c)
    stops = F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    return F.size(stops) / F.size(toks)


def lang_id(c: Column, threshold: float = 0.05) -> Column:
    """n-gram/function-word heuristic language ID: enough English
    function words -> 'en', else 'unk'.  (Real models plug in here as a
    pandas UDF; the heuristic keeps the hot path JVM-side.)"""
    return F.when(stopword_ratio(c) >= threshold, "en").otherwise("unk")


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + alpha ratio +
    mean word length band.  Deterministic double math (each term is a
    ratio of exact ints) -> oracle-stable after rounding."""
    n_chars = F.length(c)
    n_toks = token_count(c)
    alpha = F.length(F.regexp_replace(F.lower(c), r"[^a-z]", ""))
    alpha_ratio = alpha / n_chars
    mean_wlen = n_chars / n_toks
    len_band = F.when((n_chars >= 100) & (n_chars <= 1000), 1.0).otherwise(0.5)
    wlen_band = F.when((mean_wlen >= 3) & (mean_wlen <= 12), 1.0).otherwise(0.5)
    return F.round((len_band + wlen_band + alpha_ratio) / 3.0, 6)


def fingerprint(c: Column) -> Column:
    """Key-collision fingerprint: sorted distinct tokens joined + md5
    (the classic OpenRefine-style clustering key)."""
    key = F.array_join(F.array_sort(F.array_distinct(tokens(c))), " ")
    return F.md5(key)


def chunk_tokens(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 50,
    stride: int = 40,
):
    """Overlapping token-window chunking — the context-window prep step
    of a training-data pipeline: one output row per (doc, chunk), text
    = ``chunk_size`` whitespace tokens starting every ``stride``
    (chunk_size - stride tokens of overlap; the tail chunk may be
    short).  Pure sequence/slice/array_join — JVM-side, and the fan-out
    is a narrow transform (no shuffle): at 100 TB each input partition
    chunks independently."""
    from mo_etl_spark.operators.dedup import normalize_text

    words = F.split(normalize_text(F.col(text_col)), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(stride)).cast("int")
    return df.select(
        F.col(id_col),
        words.alias("_w"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        id_col,
        "chunk_idx",
        F.array_join(
            F.slice(F.col("_w"), F.col("chunk_idx") * stride + 1, chunk_size), " "
        ).alias("chunk_text"),
        F.least(
            F.size("_w") - F.col("chunk_idx") * stride, F.lit(chunk_size)
        ).alias("n_tokens"),
    )


#: deterministic, engine-portable PII patterns (emails / NANP-ish phone)
PII_PATTERNS = (
    (r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_scrub(c: Column) -> Column:
    """Redact PII spans (scrub step of a corpus pipeline).  Plain
    regexp_replace chain — vectorized JVM regex, no UDF."""
    out = c
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def deterministic_sample(df, id_col: str = "doc_id", percent: int = 10, modulus: int = 97):
    """Stable corpus downsampling: keep rows whose Knuth-multiplicative
    id hash lands under ``percent`` of ``modulus``.  Pure arithmetic —
    reproducible across engines/runs/partitionings, pushes down to the
    scan as a data filter, and never shuffles; the standard way to cut
    a 100 TB corpus to an n% training slice.

    (a*b) mod m is computed as ((a mod m)*(b mod m)) mod m so the
    product never exceeds m² — id*2654435761 would overflow int64 for
    ids >= ~3.5e9 (raising under ANSI, silently wrapping otherwise)."""
    factor = 2654435761 % modulus
    bucket = F.pmod(F.pmod(F.col(id_col), F.lit(modulus)) * F.lit(factor), F.lit(modulus))
    return df.where(bucket < percent)
