"""PII scrubbing and context-window chunking for training-data prep.

Two corpus-preparation passes a large-scale LLM pipeline runs between
dedup and packing, both pure Catalyst (JVM-side regex / generator
expressions, whole-stage codegen'd — no Python in the hot path):

- :func:`pii_scan` — detect and redact personally-identifiable spans
  (emails, IPv4 addresses, phone-shaped numbers) with portable regexes.
  Per-row projection only: no shuffle, scales embarrassingly to 100 TB.

- :func:`chunk_token_windows` — split each document's token stream into
  fixed-size overlapping windows (the chunking pass feeding a training
  tokenizer or an embedding indexer).  One generator expression
  (``explode(sequence(...))``) per row: chunk count is computed
  arithmetically, never by materializing token arrays per chunk, so the
  expansion factor — not the document length — bounds the output.

The regex subset is deliberately portable between Java regex (Spark) and
RE2 (DuckDB oracle / ClickHouse ``match``): character classes, bounded
repetition, alternation — no lookaround, no backreferences (SURVEY §7
"Hard parts" #1).

Reference parity note: the reference adapter has no corpus operators
(single-purpose TSDB bridge, 542 LoC); these extend the engine for the
LLM-pipeline surface the north star requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.functions import textfuncs as tx

#: Portable PII patterns (Java regex and RE2 agree on all three).
EMAIL_PATTERN = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
IPV4_PATTERN = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PHONE_PATTERN = r"555-[0-9]{4}"

#: Redaction tokens, applied in this order (email first: an email contains
#: dots and digits but the IPv4 pattern can't match inside one after the
#: email is collapsed to a single token).
REDACTIONS = (
    (EMAIL_PATTERN, "<EMAIL>"),
    (IPV4_PATTERN, "<IP>"),
    (PHONE_PATTERN, "<PHONE>"),
)


def redact(text: Column) -> Column:
    """Replace every PII span with its redaction token (global replace)."""
    out = text
    for pattern, token in REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append PII match counts and the redacted text to ``df``.

    Adds ``n_emails``/``n_ipv4``/``n_phones`` (match counts per document)
    and ``redacted`` (the scrubbed text).  Counting runs on the
    *progressively redacted* text, mirroring the replacement order: an
    email's host part can't double-count as an IPv4-shaped span because
    the email is already collapsed when the IPv4 scan runs.

    Pure per-row projection — zero shuffles; at 100 TB this pass fuses
    into whatever scan feeds it (one WholeStageCodegen span, no exchange).
    """
    text = F.col(text_col)
    after_email = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_PATTERN, "<IP>")
    return df.select(
        "*",
        F.regexp_count(text, F.lit(EMAIL_PATTERN)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(IPV4_PATTERN)).cast("long").alias("n_ipv4"),
        F.regexp_count(after_ip, F.lit(PHONE_PATTERN)).cast("long").alias("n_phones"),
        F.regexp_replace(after_ip, PHONE_PATTERN, "<PHONE>").alias("redacted"),
    )


def chunk_token_windows(
    df: DataFrame,
    window: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_text: bool = False,
) -> DataFrame:
    """Explode each document into fixed-size overlapping token windows.

    Output: one row per (document, chunk) with ``chunk_idx`` (0-based),
    ``start_tok`` (token offset of the window start), ``n_tok_chunk``
    (window size, smaller for the final partial window) and the document's
    total ``n_tokens``.  Every document yields at least one chunk (an
    empty document yields one empty chunk) so no row silently disappears.

    Chunk count is closed-form — ``1 + ceil(max(0, n - window) / stride)``
    with ``stride = window - overlap`` — and the generator explodes a
    ``sequence(0, n_chunks-1)`` of *indices*, not token arrays: the only
    data amplification is the (id, offsets) rows themselves.  No shuffle;
    the explode pipelines inside the scan stage.

    With ``with_text=True`` each chunk also materializes its token-slice
    content as ``chunk_text`` — the variant feeding a tokenizer or an
    embedding indexer directly.  The amplification is then the chunk
    payload itself (inherent: that IS the output); the token array crosses
    the generator once per document, and the per-chunk slice is a
    row-local expression.
    """
    if overlap >= window:
        raise ValueError(f"overlap ({overlap}) must be < window ({window})")
    stride = window - overlap
    # r21: tokenize once in a lower projection — n_tokens, the chunk-count
    # generator, and (with_text) the slice source all need the token array,
    # and referencing tx.tokens(text) in each embedded the regexp tokenize
    # chain 2-3x per row (HOF chains are exempt from codegen subexpression
    # elimination).  _toks is non-cheap and referenced more than once, so
    # CollapseProject keeps the projections separate and the chain runs
    # once; everything downstream is size()/slice() over the materialized
    # array.  Same expressions, bit-identical output, still generator-only.
    toked = df.select(F.col(id_col), tx.tokens(F.col(text_col)).alias("_toks"))
    n_tok = F.size("_toks").cast("long")
    # ceil(max(0, n-window)/stride) in exact integer arithmetic
    n_chunks = (
        F.lit(1)
        + (F.greatest(n_tok - window, F.lit(0)) + (stride - 1)) / F.lit(stride)
    ).cast("long")
    base_cols = [F.col(id_col), n_tok.alias("n_tokens")]
    if with_text:
        base_cols.append(F.col("_toks"))
    base = toked.select(
        *base_cols,
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    out_cols = [
        F.col(id_col),
        F.col("n_tokens"),
        F.col("chunk_idx"),
        start.alias("start_tok"),
        F.least(F.lit(window).cast("long"), F.col("n_tokens") - start).alias(
            "n_tok_chunk"
        ),
    ]
    if with_text:
        out_cols.append(
            F.array_join(
                F.slice(F.col("_toks"), (start + 1).cast("int"), window), " "
            ).alias("chunk_text")
        )
    return base.select(*out_cols)
