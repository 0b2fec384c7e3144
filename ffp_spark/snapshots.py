"""Snapshot/manifest layer emulating Iceberg semantics (operators K8-K9).

No Iceberg runtime jar ships in this sandbox, so tables are partitioned
Parquet directories plus a JSON manifest per snapshot and an atomically
swapped CURRENT pointer:

    <table>/
      snap-<id>/...parquet          (data, written to a temp dir first)
      manifest-<id>.json            (snapshot id, parent, row count, stats)
      CURRENT                       (text file naming the live snapshot)

Commit protocol: write data under ``_tmp-<id>``, fsync manifest, then
``os.replace`` both into place — readers never observe a half-written
snapshot (same guarantee Iceberg gets from its metadata swap).

Resume (K9): per-partition lineage rows record which explicit url-hash
partitions finished; `remaining_pages` anti-joins them away so a
restarted run only processes unfinished partitions.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any, Optional

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F


def _table_dir(root: str | Path, name: str) -> Path:
    return Path(root) / name


def _fsync_replace(tmp: Path, final: Path) -> None:
    """fsync file contents, rename into place, fsync the directory entry."""
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, final)
    dfd = os.open(final.parent, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def write_snapshot(
    df: DataFrame,
    root: str | Path,
    table: str,
    snapshot_id: int,
    partition_by: Optional[list[str]] = None,
    extra: Optional[dict[str, Any]] = None,
) -> dict[str, Any]:
    """Atomically commit ``df`` as snapshot ``snapshot_id`` of ``table``."""
    tdir = _table_dir(root, table)
    tdir.mkdir(parents=True, exist_ok=True)
    tmp = tdir / f"_tmp-{snapshot_id}"
    final = tdir / f"snap-{snapshot_id}"
    if tmp.exists():
        shutil.rmtree(tmp)
    # row count captured DURING the write via an observed metric — no
    # post-write re-read (at 100 TB that second scan of the triples
    # table per snapshot was the commit path's scale-killer)
    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    writer = observed.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(tmp))
    n_rows = int(obs.get["n"])
    manifest = {
        "table": table,
        "snapshot_id": snapshot_id,
        "parent_snapshot_id": current_snapshot_id(root, table),
        "row_count": n_rows,
        "partition_by": partition_by or [],
        "schema": df.schema.jsonValue(),
    }
    if extra:
        manifest["extra"] = extra

    if final.exists():
        shutil.rmtree(final)
    os.replace(tmp, final)

    mpath = tdir / f"manifest-{snapshot_id}.json"
    mtmp = tdir / f"_manifest-{snapshot_id}.json.tmp"
    mtmp.write_text(json.dumps(manifest, indent=2))
    _fsync_replace(mtmp, mpath)

    ctmp = tdir / "_CURRENT.tmp"
    ctmp.write_text(str(snapshot_id))
    _fsync_replace(ctmp, tdir / "CURRENT")
    return manifest


def current_snapshot_id(root: str | Path, table: str) -> Optional[int]:
    cur = _table_dir(root, table) / "CURRENT"
    if not cur.exists():
        return None
    try:
        return int(cur.read_text().strip())
    except ValueError:
        return None


def read_snapshot(
    spark: SparkSession,
    root: str | Path,
    table: str,
    snapshot_id: Optional[int] = None,
) -> DataFrame:
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(root, table)
    if sid is None:
        raise FileNotFoundError(f"no committed snapshot for table {table} under {root}")
    return spark.read.parquet(str(_table_dir(root, table) / f"snap-{sid}"))


def read_manifest(root: str | Path, table: str, snapshot_id: int) -> dict[str, Any]:
    return json.loads((_table_dir(root, table) / f"manifest-{snapshot_id}.json").read_text())


def snapshots_of(root: str | Path, table: str) -> list[int]:
    tdir = _table_dir(root, table)
    if not tdir.exists():
        return []
    ids = []
    for p in tdir.glob("manifest-*.json"):
        try:
            ids.append(int(p.stem.split("-", 1)[1]))
        except ValueError:
            continue
    return sorted(ids)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str | Path,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Catalog-bucketed parquet table for CO-LOCATED joins (K11 scale
    path): every join or aggregation keyed on ``bucket_col`` between
    tables bucketed the same way reads matching buckets side by side
    with NO exchange — at 100 TB this removes the dominant shuffle from
    repeated triple/node joins (tests/test_plans.py pins the
    exchange-free plan).

    Hash-directory bucketing (write_snapshot's partition_by) places
    files; CATALOG bucketing additionally records the bucket spec so
    Catalyst can elide the shuffle."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.option("path", str(path)).saveAsTable(name)


def _catalog_name(root: str | Path, table: str, snapshot_id: int, staging: bool = False) -> str:
    """Deterministic session-catalog name for a committed bucketed table;
    the root-path hash keeps concurrent test roots from colliding."""
    import zlib

    tag = zlib.crc32(str(Path(root).resolve()).encode()) & 0xFFFFFFFF
    prefix = "_stg_ffp" if staging else "ffp"
    return f"{prefix}_{table}_s{snapshot_id}_{tag:08x}"


def _bucket_ddl(df: DataFrame) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)


def write_snapshot_bucketed(
    df: DataFrame,
    root: str | Path,
    table: str,
    snapshot_id: int,
    bucket_col: str,
    n_buckets: int = 16,
    extra: Optional[dict[str, Any]] = None,
) -> dict[str, Any]:
    """Atomic snapshot commit THROUGH the catalog-bucketed writer (K11):
    the committed files carry bucket ids in their names and the manifest
    records the bucket spec, so the serving read path
    (`read_snapshot_bucketed`) joins/aggregates on ``bucket_col`` with
    ZERO exchange — bucketing is the default, not a demo.

    Protocol matches `write_snapshot`: data lands in ``_tmp-<id>`` (via
    a staging catalog entry, since bucketBy requires saveAsTable), is
    os.replace'd into ``snap-<id>`` — bucket file names survive the
    rename, which is what lets the final CLUSTERED BY table re-point at
    them — then manifest and CURRENT swap in with fsync."""
    spark = df.sparkSession
    tdir = _table_dir(root, table)
    tdir.mkdir(parents=True, exist_ok=True)
    tmp = tdir / f"_tmp-{snapshot_id}"
    final = tdir / f"snap-{snapshot_id}"
    if tmp.exists():
        shutil.rmtree(tmp)
    stg = _catalog_name(root, table, snapshot_id, staging=True)
    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    spark.sql(f"DROP TABLE IF EXISTS {stg}")
    try:
        (
            observed.write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .option("path", str(tmp))
            .saveAsTable(stg)
        )
        n_rows = int(obs.get["n"])
        if final.exists():
            shutil.rmtree(final)
        os.replace(tmp, final)
    finally:
        # external table: dropping removes metadata only, never the
        # (already renamed) data files
        spark.sql(f"DROP TABLE IF EXISTS {stg}")

    name = _catalog_name(root, table, snapshot_id)
    ddl = _bucket_ddl(df)
    create = (
        f"CREATE TABLE {name} ({ddl}) USING parquet "
        f"CLUSTERED BY (`{bucket_col}`) SORTED BY (`{bucket_col}`) "
        f"INTO {n_buckets} BUCKETS LOCATION '{final}'"
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(create)

    manifest = {
        "table": table,
        "snapshot_id": snapshot_id,
        "parent_snapshot_id": current_snapshot_id(root, table),
        "row_count": n_rows,
        "partition_by": [],
        "bucket_by": bucket_col,
        "n_buckets": n_buckets,
        "catalog_table": name,
        "create_ddl": create,
        "schema": df.schema.jsonValue(),
    }
    if extra:
        manifest["extra"] = extra

    mpath = tdir / f"manifest-{snapshot_id}.json"
    mtmp = tdir / f"_manifest-{snapshot_id}.json.tmp"
    mtmp.write_text(json.dumps(manifest, indent=2))
    _fsync_replace(mtmp, mpath)

    ctmp = tdir / "_CURRENT.tmp"
    ctmp.write_text(str(snapshot_id))
    _fsync_replace(ctmp, tdir / "CURRENT")
    return manifest


def read_snapshot_bucketed(
    spark: SparkSession,
    root: str | Path,
    table: str,
    snapshot_id: Optional[int] = None,
) -> DataFrame:
    """Serving read path for bucketed commits: returns the CATALOG table
    (bucket-spec-aware — joins on the bucket key need no exchange),
    re-registering it from the manifest's DDL in a fresh session.
    Falls back to the plain directory read for non-bucketed commits."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(root, table)
    if sid is None:
        raise FileNotFoundError(f"no committed snapshot for table {table} under {root}")
    manifest = read_manifest(root, table, sid)
    name = manifest.get("catalog_table")
    if not name:
        return read_snapshot(spark, root, table, sid)
    if not spark.catalog.tableExists(name):
        spark.sql(manifest["create_ddl"])
    return spark.table(name)


# ---------------------------------------------------------------------------
# checkpoint/resume over explicit url-hash partitions
# ---------------------------------------------------------------------------

def remaining_pages(
    pages_with_part: DataFrame, lineage: Optional[DataFrame]
) -> DataFrame:
    """Anti-join away partitions whose lineage row says status=done."""
    if lineage is None:
        return pages_with_part
    done = lineage.filter(F.col("status") == "done").select("part_id").distinct()
    return pages_with_part.join(done, "part_id", "left_anti")


# ---------------------------------------------------------------------------
# changelog compaction (K77): fold an event changelog into current state
# ---------------------------------------------------------------------------

def compact_changelog(
    changelog: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str,
    tombstone_ops: tuple[str, ...] = ("delete",),
) -> DataFrame:
    """Latest-op-wins compaction of a CDC/upsert changelog — the fold
    that turns an event-sourced entity log into current KG state
    (inserts/updates keep the newest row, a trailing tombstone marks
    the entity dead without losing its last attributes).

    One shuffle: max(struct(order_cols..., all payload)) per key — the
    map-side-combinable plan, deliberately NOT a row_number window
    (no per-key sort materialization; partial max reduces each
    partition to one candidate row per key before the exchange).
    ``order_cols`` must be totally ordering (e.g. ts + a unique id).
    Returns one row per key: key_cols + payload of the winning row +
    ``alive`` (false iff the last op is a tombstone).
    """
    payload = [c for c in changelog.columns if c not in key_cols]
    ordered = order_cols + [c for c in payload if c not in order_cols]
    latest = changelog.groupBy(*key_cols).agg(
        F.max(F.struct(*ordered)).alias("_l")
    )
    out = latest.select(
        *key_cols,
        *[F.col(f"_l.{c}").alias(c) for c in payload],
    )
    return out.withColumn(
        "alive", ~F.col(op_col).isin(*tombstone_ops)
    )


def changelog_history(
    changelog: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """SCD-2 history intervals from the same changelog
    :func:`compact_changelog` folds (K84): every event opens a version
    valid from its timestamp until the key's next event — the
    time-travel / temporal-table primitive ("state as of t" = the row
    whose [valid_from, valid_to) contains t; the latest row has
    valid_to NULL and equals compact_changelog's winner).

    One key-partitioned window (lead over order_cols) — the per-key
    sort is the honest cost of producing ORDERED version chains, and
    it shuffles once on the same key a consumer's as-of join probes.
    ``order_cols`` defaults to [ts_col]; pass ts + a unique id when
    timestamps can tie.
    """
    from pyspark.sql.window import Window

    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return changelog.select(
        "*",
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )
