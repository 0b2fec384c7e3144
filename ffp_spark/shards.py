"""Training-shard export (the publish step after curation/sampling):
deterministically hash-shuffle a curated corpus into a fixed number of
shards and commit them through the snapshot protocol with a manifest
of per-shard row counts and content checksums.

Design (all cross-engine exact — a DuckDB oracle replays every number):

* shard id   = md5-prefix(id) mod n_shards — md5 so the placement is
  engine-independent (xxhash64 has no DuckDB twin) and uniform;
* order key  = md5(id) hex — a deterministic pseudo-random TOTAL order
  within each shard (training-data shuffling without RNG, the same
  md5-rank trick as stratified sampling);
* checksum   = sum over rows of (md5-prefix-15(id ':' content) mod 1e9+7)
  — associative and commutative, so it distributes (map-side partial
  sums), is insensitive to row order, and stays far below int64
  overflow out to ~1e9 rows per shard.

At scale: one shuffle on shard id (the write's partitionBy), manifest
aggregates reduce map-side; nothing driver-side except the (n_shards)-
row manifest.  Commit goes through snapshots.write_snapshot, so readers
never observe a half-written export.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from .snapshots import read_snapshot, write_snapshot

CHECKSUM_MOD = 1_000_000_007


def _md5_int(col, n_hex: int):
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("long")


def with_shard(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Adds ``shard`` (int), ``order_key`` (md5 hex of id) and ``row_ck``
    (per-row modular content hash) columns."""
    sid = F.col(id_col).cast("string")
    return df.select(
        F.col(id_col),
        F.col(content_col),
        F.pmod(_md5_int(sid, 8), F.lit(int(n_shards))).cast("int").alias("shard"),
        F.md5(sid).alias("order_key"),
        (
            _md5_int(F.concat(sid, F.lit(":"), F.col(content_col)), 15)
            % F.lit(CHECKSUM_MOD)
        ).alias("row_ck"),
    )


def shard_manifest(sharded: DataFrame) -> DataFrame:
    """(shard, n_rows, checksum, first_key, last_key) — the manifest
    rows; checksum is the modular sum of row hashes, first/last_key the
    md5-order extremes (the within-shard sort evidence)."""
    return (
        sharded.groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            (F.sum("row_ck") % F.lit(CHECKSUM_MOD)).alias("checksum"),
            F.min("order_key").alias("first_key"),
            F.max("order_key").alias("last_key"),
        )
        .orderBy("shard")
    )


def shard_export(
    df: DataFrame,
    root: str,
    n_shards: int,
    snapshot_id: int = 1,
    id_col: str = "doc_id",
    content_col: str = "text",
    table: str = "shards",
) -> dict[str, Any]:
    """Write the sharded corpus as snapshot ``snapshot_id`` of ``table``
    under ``root`` (one parquet partition per shard, rows sorted by
    order_key inside each) and commit the per-shard manifest alongside.
    Returns the snapshot manifest dict (with ``extra.shards``)."""
    sharded = with_shard(df, n_shards, id_col=id_col, content_col=content_col)
    data = sharded.repartition(int(n_shards), "shard").sortWithinPartitions(
        "shard", "order_key"
    )
    per_shard = [
        {
            "shard": int(r.shard),
            "n_rows": int(r.n_rows),
            "checksum": int(r.checksum),
            "first_key": r.first_key,
            "last_key": r.last_key,
        }
        for r in shard_manifest(sharded).collect()
    ]
    return write_snapshot(
        data,
        root,
        table,
        snapshot_id,
        partition_by=["shard"],
        extra={"n_shards": int(n_shards), "shards": per_shard},
    )


def verify_export(
    spark: SparkSession,
    root: str,
    snapshot_id: int = 1,
    table: str = "shards",
) -> DataFrame:
    """Read the COMMITTED shard files back and recompute the manifest
    from their contents — the end-to-end check that what landed on disk
    is what the manifest claims.  Raises on any mismatch; returns the
    recomputed manifest DataFrame (the driver-query surface)."""
    from .snapshots import read_manifest

    df = read_snapshot(spark, root, table, snapshot_id)
    recomputed = shard_manifest(df)
    got = {
        int(r.shard): (int(r.n_rows), int(r.checksum), r.first_key, r.last_key)
        for r in recomputed.collect()
    }
    want = {
        int(s["shard"]): (
            int(s["n_rows"]), int(s["checksum"]), s["first_key"], s["last_key"]
        )
        for s in read_manifest(root, table, snapshot_id)["extra"]["shards"]
    }
    if got != want:
        raise AssertionError(
            f"shard export mismatch: files={got} manifest={want}"
        )
    return recomputed
