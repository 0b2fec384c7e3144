"""Tests for the curate->publish operators: sequence packing, training-
shard export, and learned BPE.  Each has (a) a pure-Python reference on
a hand-checkable fixture and (b) structural/scale assertions (plan
shape, ordering, invariants)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ffp_spark.packing import doc_token_offsets, pack_sequences, packing_stats
from ffp_spark.shards import (
    CHECKSUM_MOD,
    shard_export,
    shard_manifest,
    verify_export,
    with_shard,
)
from ffp_spark.textops import BPE_D, bpe_token_counts, bpe_train

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

class TestPacking:
    def _fixture(self, spark):
        rows = [
            (1, "a b c"),            # 3 toks: [0, 3)
            (2, ""),                 # 0 toks: dropped
            (3, "d e f g h"),        # 5 toks: [3, 8)
            (4, "i j"),              # 2 toks: [8, 10)
            (5, "k"),                # 1 tok:  [10, 11)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_offsets_python_reference(self, spark):
        got = {
            r.doc_id: (r.n_toks, r.start, r.end)
            for r in doc_token_offsets(self._fixture(spark), bucket_width=2).collect()
        }
        assert got == {1: (3, 0, 3), 3: (5, 3, 8), 4: (2, 8, 10), 5: (1, 10, 11)}

    def test_pack_hand_checked(self, spark):
        # L=4: seq0=[0,4) gets docs 1,3; seq1=[4,8) doc 3; seq2=[8,11) docs 4,5
        got = [tuple(r) for r in pack_sequences(self._fixture(spark), seq_len=4, bucket_width=2).collect()]
        assert got == [(0, 2, 4, 1), (1, 1, 4, 3), (2, 2, 3, 4)]

    def test_token_conservation_and_full_sequences(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        packed = pack_sequences(docs, seq_len=512, bucket_width=64).collect()
        toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
        total = docs.select(F.sum(F.size(toks))).collect()[0][0]
        assert sum(r.n_tokens for r in packed) == total
        # every sequence except the last is exactly full
        assert all(r.n_tokens == 512 for r in packed[:-1])
        assert [r.seq_id for r in packed] == list(range(len(packed)))

    def test_bucket_width_invariance(self, spark):
        # the distributed prefix sum must not depend on the bucket knob
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = [tuple(r) for r in pack_sequences(docs, seq_len=256, bucket_width=16).collect()]
        b = [tuple(r) for r in pack_sequences(docs, seq_len=256, bucket_width=999).collect()]
        assert a == b

    def test_stats_efficiency(self, spark):
        st = packing_stats(
            pack_sequences(self._fixture(spark), seq_len=4, bucket_width=2), 4
        ).collect()[0]
        assert (st.n_sequences, st.n_tokens) == (3, 11)
        assert st.efficiency_ppm == (11 * 1_000_000) // 12


# ---------------------------------------------------------------------------
# shard export
# ---------------------------------------------------------------------------

def _md5_int(s: str, n: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:n], 16)


class TestShardExport:
    def test_manifest_python_reference(self, spark):
        docs = spark.createDataFrame(
            [(i, f"text {i}") for i in range(50)], "doc_id long, text string"
        )
        got = [tuple(r) for r in shard_manifest(with_shard(docs, 4)).collect()]
        per = {}
        for i in range(50):
            shard = _md5_int(str(i), 8) % 4
            ck = _md5_int(f"{i}:text {i}", 15) % CHECKSUM_MOD
            key = hashlib.md5(str(i).encode()).hexdigest()
            s = per.setdefault(shard, [0, 0, []])
            s[0] += 1
            s[1] = (s[1] + ck) % CHECKSUM_MOD
            s[2].append(key)
        want = [
            (sh, per[sh][0], per[sh][1], min(per[sh][2]), max(per[sh][2]))
            for sh in sorted(per)
        ]
        assert got == want

    def test_export_roundtrip_and_ordering(self, spark, tmp_path):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        manifest = shard_export(docs, str(tmp_path), n_shards=4, snapshot_id=1)
        assert manifest["row_count"] == docs.count()
        assert len(manifest["extra"]["shards"]) == 4
        # verify_export recomputes from the committed files and must agree
        recomputed = verify_export(spark, str(tmp_path), snapshot_id=1)
        assert recomputed.count() == 4
        # rows inside each shard file land in md5 order (the writer's
        # sortWithinPartitions contract) — check one shard's parquet
        from ffp_spark.snapshots import read_snapshot

        rows = (
            read_snapshot(spark, str(tmp_path), "shards", 1)
            .where("shard = 0").select("order_key").collect()
        )
        keys = [r.order_key for r in rows]
        assert keys == sorted(keys) and keys

    def test_verify_raises_on_tamper(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(20)], "doc_id long, text string"
        )
        shard_export(docs, str(tmp_path), n_shards=2, snapshot_id=1)
        # corrupt the manifest's checksum claim
        import json
        from pathlib import Path

        mpath = Path(tmp_path) / "shards" / "manifest-1.json"
        m = json.loads(mpath.read_text())
        m["extra"]["shards"][0]["checksum"] += 1
        mpath.write_text(json.dumps(m))
        with pytest.raises(AssertionError, match="shard export mismatch"):
            verify_export(spark, str(tmp_path), snapshot_id=1)


# ---------------------------------------------------------------------------
# learned BPE
# ---------------------------------------------------------------------------

def _py_bpe(word_counts: dict[str, int], k: int):
    """Reference BPE: greedy most-frequent adjacent pair, ties
    lexicographic on (left, right); left-to-right non-overlapping
    apply."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, k + 1):
        pairs = {}
        for w, toks in seqs.items():
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                pairs[p] = pairs.get(p, 0) + word_counts[w]
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, n))
        for w, toks in seqs.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


class TestLearnedBPE:
    CORPUS = [
        (1, "low low low low low"),
        (2, "lower lower newest newest"),
        (3, "newest newest newest newest"),
        (4, "widest widest newest low"),
    ]

    def test_merge_table_matches_python_reference(self, spark):
        docs = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        merges, _ = bpe_train(docs, n_merges=6)
        counts = {}
        for _, text in self.CORPUS:
            for w in text.split():
                counts[w] = counts.get(w, 0) + 1
        want, _ = _py_bpe(counts, 6)
        assert merges == want

    def test_apply_counts_match_python_reference(self, spark):
        docs = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        _, seqs = bpe_train(docs, n_merges=6)
        got = {
            r.doc_id: (r.n_words, r.n_subword_tokens)
            for r in bpe_token_counts(docs, seqs).collect()
        }
        counts = {}
        for _, text in self.CORPUS:
            for w in text.split():
                counts[w] = counts.get(w, 0) + 1
        _, ref_seqs = _py_bpe(counts, 6)
        want = {}
        for doc_id, text in self.CORPUS:
            ws = text.split()
            want[doc_id] = (len(ws), sum(len(ref_seqs[w]) for w in ws))
        assert got == want

    def test_overlapping_run_merges_left_to_right(self, spark):
        # "aaaa" with merge (a,a): greedy non-overlapping -> (aa)(aa);
        # "aaa" -> (aa)(a).  The delimiter encoding must reproduce that.
        docs = spark.createDataFrame(
            [(1, "aaaa aaaa aaa")], "doc_id long, text string"
        )
        merges, seqs = bpe_train(docs, n_merges=1)
        # pair (a,a): "aaaa" contributes 3 adjacencies x count 2,
        # "aaa" contributes 2 x count 1 -> 8
        assert merges[0][1:] == ("a", "a", 8)
        final = {r.word: r.seq for r in seqs.collect()}
        d = BPE_D
        assert final["aaaa"] == f"{d}aa{d}{d}aa{d}"
        assert final["aaa"] == f"{d}aa{d}{d}a{d}"

    def test_corpus_merge_count_nonvacuous(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        merges, _ = bpe_train(docs, n_merges=8)
        assert len(merges) == 8
        # merge counts are non-increasing only per greedy step's max —
        # but each must be positive and tokens genuinely multi-char by
        # the later steps
        assert all(m[3] > 0 for m in merges)
        assert any(len(m[1]) > 1 or len(m[2]) > 1 for m in merges[2:])
