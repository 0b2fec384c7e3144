"""Training-sequence packing (the step between curation and tokenized
shard export in an LLM data pipeline): concatenate documents in a
deterministic order into one virtual token stream and chop it into
fixed-length sequences — every sequence except the last is exactly
``seq_len`` tokens, so packing waste is only the final partial
sequence (the standard concat-and-chunk regime, e.g. GPT-style
pretraining).

The core is a DISTRIBUTED prefix sum: a naive ``sum() OVER (ORDER BY
doc_id)`` is a single-partition window — a scale-killer at 100 TB.
Instead:

1. docs bucket by ``doc_id div bucket_width``; per-bucket token totals
   aggregate map-side (one small shuffle on bucket id);
2. bucket offsets are a window over the BUCKET table (rows ~ N/width —
   thousands, not billions) and broadcast back;
3. each doc's global start offset = bucket offset + within-bucket
   running sum (window partitioned BY BUCKET — bounded partitions).

Everything downstream is integer arithmetic (div / least / greatest),
so a DuckDB oracle replays it with an independent single-window
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def doc_token_offsets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 4096,
) -> DataFrame:
    """(id, n_toks, start, end) with ``start``/``end`` the doc's
    half-open token interval in the id-ordered concatenated stream.
    Tokens are whitespace-split non-empty strings (the repo-wide
    convention).  Zero-token docs are dropped (they occupy no stream
    positions)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    # integral `div` for the bucket id (exact past 2^53, same contract
    # as rangejoin.interval_join)
    t = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_toks"),
        F.expr(f"CAST(`{id_col}` AS BIGINT) div {int(bucket_width)}").alias("_bkt"),
    ).where(F.col("n_toks") > 0)
    per_bucket = t.groupBy("_bkt").agg(F.sum("n_toks").alias("_bn"))
    w_b = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bkt", F.coalesce(F.sum("_bn").over(w_b), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = t.join(F.broadcast(offsets), "_bkt")
    end = F.col("_off") + F.sum("n_toks").over(w_in)
    return j.select(
        F.col(id_col),
        F.col("n_toks"),
        (end - F.col("n_toks")).alias("start"),
        end.alias("end"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 4096,
) -> DataFrame:
    """Per-sequence packing manifest: (seq_id, n_docs, n_tokens,
    first_doc).  A doc overlapping k sequences is counted in each (its
    tokens split across them); sum(n_tokens) over all rows equals the
    corpus token total and every n_tokens == seq_len except possibly
    the last sequence — the packing-efficiency invariant.  first_doc
    (lowest doc id touching the sequence) makes the row content-
    addressable for spot checks."""
    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")
    d = doc_token_offsets(
        docs, id_col=id_col, text_col=text_col, bucket_width=bucket_width
    )
    spans = d.select(
        F.col(id_col),
        "start",
        "end",
        F.explode(
            F.sequence(
                F.expr(f"start div {L}"), F.expr(f"(end - 1) div {L}")
            )
        ).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * L
    overlap = F.least(F.col("end"), seq_lo + L) - F.greatest(F.col("start"), seq_lo)
    return (
        spans.groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(overlap).alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
        )
        .orderBy("seq_id")
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """One-row summary: n_sequences, n_tokens, efficiency in ppm
    (tokens / (n_sequences * seq_len)) — integer-exact."""
    L = int(seq_len)
    return packed.agg(
        F.count("*").alias("n_sequences"),
        F.sum("n_tokens").alias("n_tokens"),
        F.expr(f"(sum(n_tokens) * 1000000) div (count(*) * {L})").alias(
            "efficiency_ppm"
        ),
    )
