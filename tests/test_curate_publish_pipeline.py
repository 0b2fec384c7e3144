"""End-to-end curate -> publish pipeline: the composed path a training-
data run ships — quality filter -> exact dedup -> decontaminate ->
per-source token budget -> sequence packing -> shard export — chained
as DataFrame stages over the sf0.001 corpus, with the cross-stage
invariants asserted (monotone shrink, token conservation into packing,
manifest-vs-files agreement, and bit-determinism of the final manifest
under a different input partitioning).

The individual stages each have their own oracled driver query; this
test proves they COMPOSE — counts flow consistently and nothing in the
chain depends on partitioning or evaluation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _curate(spark, docs: DataFrame) -> DataFrame:
    """Filter -> dedup -> decontaminate -> token budget; returns the
    kept (doc_id, text, source, n_toks) set."""
    d = docs.select(
        "doc_id", "text", "source", F.split("text", " ").alias("ws")
    ).withColumn("n_toks", F.size("ws"))

    # 1. gopher-style structural gate
    d = d.filter(
        (F.col("n_toks") >= 20)
        & (F.col("n_toks") <= 35)
        & F.array_contains(F.split(F.lower("text"), " "), "the")
    )

    # 2. exact dedup, keep the lowest doc_id per content hash
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    d = d.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")

    # 3. decontamination: drop the benchmark slice itself, then any doc
    # sharing >= 50% of its distinct 3-grams with the slice
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 2),
                lambda i: F.array_join(F.slice("ws", i, 3), " "),
            )
        ).alias("gram"),
    ).distinct()
    ev = grams.filter(F.col("doc_id") % 37 == 3).select("gram").distinct()
    contam = (
        grams.filter(F.col("doc_id") % 37 != 3)
        .join(F.broadcast(ev.withColumn("hit", F.lit(1))), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_contam"),
        )
        .filter(F.col("n_contam") * 2 < F.col("n_grams"))
        .select("doc_id")
    )
    d = d.filter(F.col("doc_id") % 37 != 3).join(contam, "doc_id", "left_semi")

    # 4. per-source token budget (greedy md5-order prefix, budget 500)
    wb = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    d = (
        d.withColumn("cum", F.sum("n_toks").over(wb))
        .filter(F.col("cum") <= 500)
        .select("doc_id", "text", "source", "n_toks")
    )
    return d


class TestCurateToPublish:
    def test_full_chain_invariants(self, spark, tmp_path):
        from ffp_spark.packing import pack_sequences
        from ffp_spark.shards import shard_export, verify_export

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        n0 = docs.count()
        kept = _curate(spark, docs).cache()
        n_kept = kept.count()
        assert 0 < n_kept < n0  # every stage can only shrink; chain non-vacuous

        # packing: token conservation and all-full-but-last
        total_toks = kept.agg(F.sum("n_toks")).collect()[0][0]
        packed = pack_sequences(kept, seq_len=64).collect()
        assert sum(r.n_tokens for r in packed) == total_toks
        assert all(r.n_tokens == 64 for r in packed[:-1])
        assert 0 < packed[-1].n_tokens <= 64

        # shard export: manifest agrees with the committed files
        manifest = shard_export(
            kept.select("doc_id", "text"), str(tmp_path / "pub"), n_shards=4
        )
        shards = manifest["extra"]["shards"]
        assert sum(s["n_rows"] for s in shards) == n_kept
        verify_export(spark, str(tmp_path / "pub"))  # raises on mismatch
        kept.unpersist()

    def test_chain_deterministic_under_partitioning(self, spark, tmp_path):
        from ffp_spark.shards import shard_export

        docs = spark.read.parquet(f"{SF}/documents.parquet")

        def run(src: DataFrame, tag: str):
            kept = _curate(spark, src).select("doc_id", "text")
            m = shard_export(kept, str(tmp_path / tag), n_shards=4)
            return [
                (s["shard"], s["n_rows"], s["checksum"], s["first_key"], s["last_key"])
                for s in m["extra"]["shards"]
            ]

        a = run(docs, "a")
        b = run(docs.repartition(7), "b")  # same input, different physical layout
        assert a == b and len(a) > 0
