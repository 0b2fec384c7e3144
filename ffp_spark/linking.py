"""Entity linking (operators K3-K6): mention extraction, MinHash
signatures, LSH banding/blocking, candidate scoring, salted broadcast
joins for hot keys.

Spark-first split of work:
* MinHash signatures: vectorized numpy inside ONE pandas UDF (the only
  Python hop) with fixed-seed permutations broadcast as constants —
  deterministic across workers and runs.
* banding, bucketing, candidate self-join, Jaccard estimation, scoring:
  pure JVM expressions (posexplode/hash/zip_with/aggregate) — no Python
  in the shuffle-heavy path.

At 100 TB the candidate join is the hot spot: banding bounds each block,
``spark.sql.adaptive.skewJoin`` splits stragglers, and `salted_broadcast_join`
covers the hot-small-dim pattern (K5) explicitly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .triples import exploded_entries

MINHASH_K = 64  # permutations
LSH_BANDS = 16  # 16 bands x 4 rows: catches jaccard >~ 0.5
# Carter-Wegman prime JUST ABOVE the 32-bit hash domain.  The modulus
# must exceed max(h) by only a little: (a*h+b) mod p then wraps ~2^30
# times across the domain, scrambling the h-order independently per
# (a, b) — true min-wise-independent-style permutations.  (A large
# modulus like 2^61-1 keeps the map monotone in h across its ~4 wraps,
# so every "permutation" samples the SAME h-order and the Jaccard
# estimate biases low — measured 25/64 agreement on a true-0.7 pair.)
MINHASH_PRIME = 4294967311
_SHINGLE_W = 3

# permutation coefficients are bounded below 2^31 so that a*h + b with a
# 32-bit shingle hash stays under 2^63: the affine transform is EXACT in
# int64 on every engine (numpy, Spark BIGINT, DuckDB BIGINT) — no silent
# wraparound, which is what makes the signatures cross-engine replayable
_COEF_BOUND = 1 << 31


def _permutations(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _COEF_BOUND, size=k, dtype=np.int64)
    b = rng.randint(0, _COEF_BOUND, size=k, dtype=np.int64)
    return a, b


def shingle_hash32(s: str) -> int:
    """32-bit md5-prefix shingle hash — the same value DuckDB computes
    with CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT), so the whole
    MinHash signature (k affine permutations mod a Mersenne prime over
    these hashes) is replayable as pure integer SQL in any engine."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:4], "big")


def minhash_udf(
    k: int = MINHASH_K, seed: int = 42, width: int = _SHINGLE_W, mode: str = "char"
):
    """Series[str] -> Series[array<long>] MinHash signatures.

    ``mode='char'``: character ``width``-grams — right for short surfaces
    (author names) where edits are sub-token.  ``mode='word'``: token
    ``width``-grams — right for document near-dup, where char-grams over
    a shared vocabulary collide massively (measured: char-3 on synthetic
    docs LSH-buckets ~everything together -> O(n^2) candidates).

    Shingles hashed with the 32-bit md5 prefix (`shingle_hash32` — stable
    across processes AND engines), then k affine permutations mod a
    Mersenne prime, vectorized with numpy broadcasting per input string.
    Every step is exact int64 arithmetic, so a SQL engine can replay the
    signatures value-for-value (the driver's DuckDB oracle does).
    """
    a, b = _permutations(k, seed)

    @pandas_udf(ArrayType(LongType()))
    def _sig(col: pd.Series) -> pd.Series:
        import hashlib

        md5 = hashlib.md5
        # per-task shingle-hash memo (guide §4.5): shingle TYPES repeat
        # heavily across rows (shared vocabulary), so the md5 — the
        # dominant per-shingle cost — runs once per distinct shingle
        # seen by this task instead of once per occurrence.  Values are
        # identical by construction; the cap bounds worker memory on
        # adversarial corpora.
        hcache: dict[str, int] = {}

        def h32(sh: str) -> int:
            v = hcache.get(sh)
            if v is None:
                v = int.from_bytes(md5(sh.encode("utf-8")).digest()[:4], "big")
                if len(hcache) > 2_000_000:
                    hcache.clear()
                hcache[sh] = v
            return v

        out = []
        for s in col:
            if s is None:
                out.append(None)
                continue
            if mode == "word":
                toks = s.split()
                if len(toks) < width:
                    out.append(None)
                    continue
                shingles = {
                    " ".join(toks[i : i + width]) for i in range(len(toks) - width + 1)
                }
            else:
                if len(s) < width:
                    out.append(None)
                    continue
                shingles = {s[i : i + width] for i in range(len(s) - width + 1)}
            h = np.fromiter(
                (h32(sh) for sh in shingles),
                dtype=np.int64,
                count=len(shingles),
            )
            # (k, n) affine transforms; min over shingles per permutation.
            # a < 2^31 and h < 2^32 keep a*h + b < 2^63: exact, no wrap.
            sig = ((a[:, None] * h[None, :] + b[:, None]) % MINHASH_PRIME).min(axis=1)
            out.append(sig)
        return pd.Series(out)

    return _sig


def extract_mentions(parsed: DataFrame) -> DataFrame:
    """Author + site mentions from PARSED (north_star: author/site
    canonicalization).  mention_id is a deterministic content hash."""
    entries = exploded_entries(parsed)
    authors = entries.filter(F.col("entry.author").isNotNull()).select(
        F.col("entry.author").alias("surface"),
        F.lit("author").alias("kind"),
        F.col("url").alias("src_url"),
        F.col("entry.id").alias("subject_id"),
    )
    sites = (
        parsed.filter(F.col("error").isNull() & F.col("feed.title").isNotNull())
        .select(
            F.col("feed.title").alias("surface"),
            F.lit("site").alias("kind"),
            F.col("url").alias("src_url"),
            F.coalesce(F.col("feed.id"), F.col("feed.link")).alias("subject_id"),
        )
    )
    mentions = authors.unionByName(sites)
    return mentions.withColumn(
        "mention_id",
        F.sha2(F.concat_ws("", "kind", "surface", "src_url", "subject_id"), 256),
    ).withColumn(
        "norm",
        F.trim(F.regexp_replace(F.lower(F.col("surface")), r"[^\p{L}\p{Nd}]+", " ")),
    )


def with_signatures(
    mentions: DataFrame, k: int = MINHASH_K, seed: int = 42, mode: str = "char"
) -> DataFrame:
    sig = minhash_udf(k=k, seed=seed, mode=mode)
    return mentions.withColumn("sig", sig(F.col("norm")))


def candidate_pairs(
    signed: DataFrame,
    bands: int = LSH_BANDS,
    k: int = MINHASH_K,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """LSH banding -> block self-join -> signature-estimated Jaccard.

    Returns (a, b, norm_a, norm_b, score) with a < b.  All JVM-side:
    band hashes via slice+hash, similarity via zip_with/aggregate.
    """
    rows_per_band = k // bands
    banded = signed.filter(F.col("sig").isNotNull()).select(
        "mention_id",
        "norm",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band_id", "band_hash"),
    )
    # shuffle-hash, never broadcast: both sides descend from a Python UDF
    # whose cardinality Catalyst can't estimate — left alone, AQE guesses
    # "tiny" and broadcasts hundreds of MB of signatures (observed: 1 GB
    # broadcast-exchange GC thrash at 100k surfaces)
    left = banded.alias("l").hint("shuffle_hash")
    right = banded.alias("r")
    # score INSIDE the join projection and filter before the (a, b)
    # dedup: the score is identical for every band a pair collides in,
    # so filter-then-dedup is equivalent — and the 512-byte signature
    # arrays die before the dedup exchange instead of shuffling with
    # every pair row (measured the sig-through-shuffle shape at 5x the
    # stage wall on 98k surfaces / 1.5M banded pairs)
    scored = (
        left.join(
            right,
            on=[
                F.col("l.band_id") == F.col("r.band_id"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.mention_id") < F.col("r.mention_id"),
            ],
        )
        .select(
            F.col("l.mention_id").alias("a"),
            F.col("r.mention_id").alias("b"),
            F.col("l.norm").alias("norm_a"),
            F.col("r.norm").alias("norm_b"),
            (
                F.aggregate(
                    F.zip_with("l.sig", "r.sig", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(k)
            ).alias("score"),
        )
        .filter(F.col("score") >= min_jaccard)
    )
    return scored.dropDuplicates(["a", "b"])


def bucket_star_edges(
    signed: DataFrame,
    bands: int = LSH_BANDS,
    k: int = MINHASH_K,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Scale path for *clustering*: per LSH bucket, link every member to
    the bucket representative (min id) instead of all pairs.

    All-pairs is O(bucket^2) — a hot domain whose feed titles all share
    a bucket turns 6k members into 18M pairs.  The star keeps O(bucket)
    edges while preserving connectivity for connected components (any
    two members of a bucket are joined through the representative; the
    per-edge Jaccard filter still prunes false bucket collisions).
    """
    rows_per_band = k // bands
    banded = signed.filter(F.col("sig").isNotNull()).select(
        "mention_id",
        "norm",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band_id", "band_hash"),
    )
    reps = banded.groupBy("band_id", "band_hash").agg(
        F.min_by(F.struct("mention_id", "norm", "sig"), "mention_id").alias("rep")
    )
    # same shape as candidate_pairs: score in the join projection and
    # filter BEFORE the (a, b) dedup, so the signature arrays never
    # cross the dedup exchange (the score for a pair is band-invariant,
    # making the reorder exact)
    linked = (
        banded.hint("shuffle_hash")
        .join(reps, ["band_id", "band_hash"])
        .where(F.col("mention_id") > F.col("rep.mention_id"))
        .select(
            F.col("rep.mention_id").alias("a"),
            F.col("mention_id").alias("b"),
            F.col("rep.norm").alias("norm_a"),
            F.col("norm").alias("norm_b"),
            (
                F.aggregate(
                    F.zip_with("rep.sig", "sig", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(k)
            ).alias("score"),
        )
        .filter(F.col("score") >= min_jaccard)
    )
    return linked.dropDuplicates(["a", "b"])


def best_candidate(scored: DataFrame) -> DataFrame:
    """K6: per-mention best match — groupBy + max_by, map-side combined."""
    return scored.groupBy("a").agg(
        F.max_by("b", "score").alias("best_match"),
        F.max("score").alias("best_score"),
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "left",
) -> DataFrame:
    """K5: explicit hot-key salting beyond AQE.  The small side is
    replicated n_salts times (explode of a salt sequence) and broadcast;
    the big side picks a deterministic salt from xxhash64(key), spreading
    one hot key across n_salts parallel probe streams."""
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key)), F.lit(n_salts)).cast("int")
    )
    joined = salted_big.join(F.broadcast(salted_small), on=[key, "_salt"], how=how)
    return joined.drop("_salt")
