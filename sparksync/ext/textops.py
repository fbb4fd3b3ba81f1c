"""Text analysis operators over the `documents` table: tokenization,
language-ID heuristic, quality scoring, token counting, fingerprinting.

Everything stays inside whole-stage codegen (built-in higher-order
functions on arrays — no Python UDFs), so at 100 TB these are pure
map-side narrow transforms: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: stopword list used by the quality heuristic (kept tiny + explicit so
#: the DuckDB oracle can repeat it verbatim)
STOPWORDS = ("the", "a", "of")

FP_MOD = 2_147_483_647  # 2^31-1, polynomial fingerprint modulus


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens with empties dropped — the shared tokenizer for
    every text operator (mirrors list_filter(string_split(...)) in the
    DuckDB oracles)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), " "), lambda x: x != F.lit(""))


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("toks", tokens(text_col))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic. A real deployment swaps the rule
    for an n-gram profile model; the *shape* (narrow map, no shuffle) is
    identical. Deterministic so it is oracle-checkable."""
    t = F.col(text_col)
    pred = (
        F.when(F.length(F.trim(t)) == 0, F.lit("unknown"))
        .when(t.like("% the %") | t.like("the %") | t.like("% the"), F.lit("en"))
        .when(t.like("% data %") | t.like("data %"), F.lit("data-ish"))
        .otherwise(F.lit("other"))
    )
    return df.select(F.col("doc_id"), pred.alias("pred_lang"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / token-length quality features + a binary
    keep flag — the standard pre-training corpus filter shape."""
    toks = tokens(text_col)
    n_tokens = F.size(toks).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_cnt = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("long")
    char_len = F.length(F.col(text_col)).cast("long")
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    stop_ratio = F.when(n_tokens > 0, stop_cnt.cast("double") / n_tokens.cast("double")).otherwise(
        F.lit(0.0)
    )
    avg_tok_len = F.when(n_tokens > 0, tok_chars.cast("double") / n_tokens.cast("double")).otherwise(
        F.lit(0.0)
    )
    keep = F.when((n_tokens >= 20) & (n_tokens <= 1000) & (stop_ratio < 0.5), F.lit(1)).otherwise(
        F.lit(0)
    ).cast("long")
    return df.select(
        F.col("doc_id"),
        n_tokens.alias("n_tokens"),
        char_len.alias("char_len"),
        stop_cnt.alias("stop_cnt"),
        stop_ratio.alias("stop_ratio"),
        avg_tok_len.alias("avg_tok_len"),
        keep.alias("keep"),
    )


def token_counts(
    df: DataFrame, text_col: str = "text", keep: list[str] | None = None
) -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count (letter runs,
    digit runs, single other chars) — the cheap proxy for tokenizer cost
    used when sizing training corpora. `keep` carries extra columns
    through (e.g. n_chars for histogramming)."""
    t = F.col(text_col)
    ws = F.size(tokens(text_col)).cast("long")
    bpe = F.regexp_count(t, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")
    extra = [F.col(c) for c in (keep or [])]
    return df.select(
        F.col("doc_id"), ws.alias("ws_tokens"), bpe.alias("bpe_tokens"), *extra
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive polynomial rolling hash over tokens (mod 2^31-1):
    doc-level fingerprint for fast container-level dedup. Per-token code
    = 37*ascii(first char) + len(token), folded left with acc*31."""
    toks = tokens(text_col)
    codes = F.transform(
        toks, lambda x: (F.ascii(x) * F.lit(37) + F.length(x)).cast("long")
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(FP_MOD),
    )
    return df.select(F.col("doc_id"), fp.alias("fp"))
