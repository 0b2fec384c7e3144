"""Bloom membership sketch (ffp_spark.sketches, K85)."""

from __future__ import annotations

import hashlib


def _h15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_bloom(keys, probes, m=256, k=4):
    bits = set()
    for key in keys:
        for j in range(k):
            bits.add(_h15(f"{key}#{j}") % m)
    return {
        p: all(_h15(f"{p}#{j}") % m in bits for j in range(k)) for p in probes
    }


def test_bloom_one_sided_and_matches_python_replay(spark):
    from ffp_spark.sketches import bloom_build, bloom_probe

    keys = [f"k{i}" for i in range(0, 400, 7)]
    probes = [f"k{i}" for i in range(400)]
    kdf = spark.createDataFrame([(x,) for x in keys], "key string")
    pdf = spark.createDataFrame([(x,) for x in probes], "key string")
    bloom = bloom_build(kdf, m_bits=256)
    got = {
        r.key: r.maybe_present for r in bloom_probe(pdf, bloom, m_bits=256).collect()
    }
    want = _py_bloom(keys, probes)
    assert got == want
    # one-sided error: every inserted key MUST report present
    assert all(got[x] for x in keys)
    # and the sizing produces real false positives to measure
    assert sum(got[p] for p in probes if p not in set(keys)) > 0


def test_bloom_word_layout_stays_32_bit(spark):
    from ffp_spark.sketches import bloom_build

    kdf = spark.createDataFrame([(f"x{i}",) for i in range(300)], "key string")
    rows = bloom_build(kdf).collect()
    assert all(0 <= r.word < 1024 // 32 for r in rows)
    assert all(0 < r.bits < (1 << 32) for r in rows)  # never needs bit 63
