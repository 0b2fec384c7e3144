"""Bloom-filter membership sketch (K85), built and probed relationally.

Completes the sketch tier beside HLL (distinct counts), CMS (heavy
hitters) and MinHash/SimHash (similarity): approximate SET MEMBERSHIP
with one-sided error — the structure crawl frontiers and
decontamination pre-filters consult before paying for an exact
anti-join.  Deterministic md5 hashing, so the filter bits — and every
false positive — replay exactly on any engine; the query layer reports
the measured FP count against exact membership (estimator-error
contract, same family as ann_recall_eval / minhash_estimate_error).

Layout: m bits as m/32 32-bit words (bit_or-aggregated BIGINTs — bit
63 of 64-bit words cannot round-trip engines that reject 1<<63).
Build: k positions per key, one (word)-keyed bit_or agg — map-side
combinable, filter size independent of key count.  Probe: k positions
per probe, one broadcastable join against the word table, present iff
all k bits are set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _positions(df: DataFrame, m_bits: int, k: int, key_col: str) -> DataFrame:
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.col(key_col), F.col("_j"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (
        df.select(key_col, F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_j"))
        .select(
            key_col,
            (h % m_bits).alias("_pos"),
        )
        .select(
            key_col,
            F.expr("_pos div 32").alias("word"),
            (F.col("_pos") % 32).alias("bit"),
        )
    )


def bloom_build(
    keys: DataFrame, m_bits: int = 1024, k: int = 4, key_col: str = "key"
) -> DataFrame:
    """(word, bits) rows — the filter itself, <= m_bits/32 rows."""
    return (
        _positions(keys.select(key_col).distinct(), m_bits, k, key_col)
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(1L, CAST(bit AS INT)))").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    m_bits: int = 1024,
    k: int = 4,
    key_col: str = "key",
) -> DataFrame:
    """probes + ``maybe_present`` (true iff all k bits set — one-sided:
    never false on a key that was inserted)."""
    pos = _positions(probes.select(key_col).distinct(), m_bits, k, key_col)
    hits = (
        pos.join(F.broadcast(bloom), "word", "left")
        .select(
            key_col,
            (
                F.coalesce(
                    F.expr("(bits & shiftleft(1L, CAST(bit AS INT))) != 0"),
                    F.lit(False),
                )
            ).cast("long").alias("hit"),
        )
        .groupBy(key_col)
        .agg((F.sum("hit") == k).alias("maybe_present"))
    )
    return probes.join(hits, key_col)
