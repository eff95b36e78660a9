"""Text analysis operators over a documents table.

All pure column expressions (JVM codegen, no UDFs), with exact DuckDB
SQL equivalents so the driver's oracle can verify values:

- token counts (whitespace + a word/number/punct regex lexer),
- quality score (length / punctuation / stopword / repetition signals),
- n-gram-heuristic language ID,
- document fingerprint (MD5 over whitespace-normalized casefolded text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORD_RE = r"\b(the|and|of|to|a|in|is|it|that|for)\b"
LEXER_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def lexer_token_count(text: Column) -> Column:
    """BPE-ish pre-tokenizer count: word / number / punct runs."""
    return F.regexp_count(text, F.lit(LEXER_RE)).cast("long")


def stopword_hits(text: Column) -> Column:
    return F.regexp_count(F.lower(text), F.lit(STOPWORD_RE)).cast("long")


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]")).cast("long")


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: MD5 over lower-cased, whitespace-
    collapsed, trimmed text — the exact-dedup key."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0, 1]: rewards stopword
    density (fluent prose) and length, penalizes punctuation soup.
    Rounded to 6 dp so engine/oracle float hashing agrees."""
    toks = ws_token_count(text)
    safe_toks = F.greatest(toks, F.lit(1))
    stop_ratio = stopword_hits(text) / safe_toks
    punct_ratio = punct_count(text) / F.greatest(F.length(text), F.lit(1))
    len_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    raw = (
        F.lit(0.4) * F.least(stop_ratio * 3, F.lit(1.0))
        + F.lit(0.4) * len_score
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
    )
    return F.round(raw, 6)


def lang_id(text: Column) -> Column:
    """N-gram-heuristic language ID: English function-word density."""
    ratio = stopword_hits(text) / F.greatest(ws_token_count(text), F.lit(1))
    return F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unk"))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per document with all signals — single scan, codegen'd.

    Widened to cluster parallelism first: the regex battery is heavy
    per row and a single-file parquet input would otherwise evaluate it
    on one core (dvx.ops.util.widen_partitions)."""
    from dvx.ops.util import widen_partitions

    t = F.col(text_col)
    return widen_partitions(docs).select(
        "doc_id",
        ws_token_count(t).alias("ws_tokens"),
        lexer_token_count(t).alias("lex_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        stopword_hits(t).alias("stop_hits"),
        punct_count(t).alias("punct"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )


# DuckDB oracle fragments (same semantics, DuckDB dialect: regexp_*_all
# needs the 'g' flag, counts via length(regexp_extract_all(...))).
def sql_ws_token_count(c: str = "text") -> str:
    return (
        f"cast(case when trim({c}) = '' then 0 else "
        f"length(regexp_split_to_array(trim({c}), '\\s+')) end as bigint)"
    )


def sql_lexer_token_count(c: str = "text") -> str:
    return f"cast(length(regexp_extract_all({c}, '{LEXER_RE}')) as bigint)"


def sql_stopword_hits(c: str = "text") -> str:
    return f"cast(length(regexp_extract_all(lower({c}), '{STOPWORD_RE}')) as bigint)"


def sql_punct_count(c: str = "text") -> str:
    return f"cast(length(regexp_extract_all({c}, '[^A-Za-z0-9\\s]')) as bigint)"


def sql_fingerprint(c: str = "text") -> str:
    return f"md5(trim(regexp_replace(lower({c}), '\\s+', ' ', 'g')))"


def sql_quality_score(c: str = "text") -> str:
    toks = sql_ws_token_count(c)
    return (
        f"round(0.4 * least(({sql_stopword_hits(c)}) * 3.0 / greatest({toks}, 1), 1.0)"
        f" + 0.4 * least(length({c}) / 500.0, 1.0)"
        f" + 0.2 * (1.0 - least(({sql_punct_count(c)}) * 5.0 / greatest(length({c}), 1), 1.0)), 6)"
    )


def sql_lang_id(c: str = "text") -> str:
    return (
        f"case when ({sql_stopword_hits(c)}) * 1.0 / greatest({sql_ws_token_count(c)}, 1)"
        f" >= 0.05 then 'en' else 'unk' end"
    )
