"""Text-analysis operators for the training-data pipeline: language ID,
quality scoring, token stats, fingerprints.

Everything is JVM-side DataFrame expressions — including the language
classifier, which is a naive-Bayes-ish char-bigram model expressed as
explode + join + groupBy (train AND predict distributed; no Python in
either path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

STOPWORDS = (
    "the a an and or of to in is are was were be been it this that "
    "with for on at by from as not"
).split()


def char_bigrams(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per (row, bigram) via sequence+transform+explode."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length(lower({text_col})) - 1, 1)),"
        f" i -> substr(lower({text_col}), i, 2))"
    )
    return df.select("*", F.explode(grams).alias("bigram"))


def doc_bigram_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, bigram, cnt) — the per-character explode collapses to one row
    per DISTINCT (doc, bigram) before anything downstream touches it
    (Spark's partial hash aggregation combines map-side, so shuffled
    rows are bounded by distinct pairs, not characters)."""
    grams = char_bigrams(docs.select(id_col, text_col), text_col)
    return grams.groupBy(id_col, "bigram").agg(F.count("*").alias("cnt"))


def train_lang_model(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """(lang, bigram, log-ish weight): P(bigram|lang) with add-one
    smoothing folded into a relative-frequency weight.

    The groupBy partial-aggregates map-side, so the shuffle is bounded by
    distinct (lang, bigram) per partition (~|langs| x |alphabet|^2), not
    by characters.  At corpus scale the bigram distribution converges
    long before the full data is seen — pass ``sample_fraction`` to train
    on a deterministic sample instead of every character of 100 TB."""
    if sample_fraction is not None:
        docs = docs.sample(fraction=sample_fraction, seed=seed)
    grams = char_bigrams(docs, text_col).groupBy(lang_col, "bigram").count()
    totals = grams.groupBy(lang_col).agg(F.sum("count").alias("total"))
    # weights quantized to integer micro-logs: downstream scores are
    # BIGINT sums — exact, summation-order independent, and reproducible
    # by any engine (float log-prob sums drift across engines/partitions)
    return (
        grams.join(totals, lang_col)
        .select(
            F.col(lang_col).alias("model_lang"),
            "bigram",
            F.round(
                F.log((F.col("count") + 1.0) / (F.col("total") + 1000.0)) * 1e6, 0
            ).cast("long").alias("w"),
        )
    )


def predict_lang(
    docs: DataFrame, model: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """argmax_lang sum of bigram weights; the model is broadcast (it is
    tiny: |langs| x |alphabet|^2 rows).

    Scoring joins per-doc bigram COUNTS (one row per distinct (doc,
    bigram)) against the model, so the broadcast-join probe stream and
    the score shuffle are both ~doc_len/alphabet smaller than the old
    one-row-per-character shape; score = sum(w * cnt) is identical."""
    counts = doc_bigram_counts(docs, id_col=id_col, text_col=text_col)
    scored = (
        counts.join(F.broadcast(model), "bigram")
        .groupBy(id_col, "model_lang")
        .agg(F.sum(F.col("w") * F.col("cnt")).alias("score"))
    )
    # struct ordering breaks score ties deterministically (max lang wins)
    return scored.groupBy(id_col).agg(
        F.max_by("model_lang", F.struct("score", "model_lang")).alias("predicted_lang")
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punct/stopword-ratio features, all codegen expressions."""
    s = F.col(text_col)
    n_chars = F.length(s)
    tokens = F.split(F.lower(s), r"\s+")
    n_tokens = F.size(tokens)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, t)))
    n_punct = n_chars - F.length(F.regexp_replace(s, r"[^\w\s]", ""))
    return docs.select(
        "*",
        n_chars.alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        (n_tokens / F.greatest(n_chars, F.lit(1))).alias("token_density"),
        (n_stop / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
    )


# ---------------------------------------------------------------------------
# SimHash near-duplicate detection
# ---------------------------------------------------------------------------

# cross-engine 60-bit token hash (md5 prefix — identical in DuckDB via
# CAST('0x'||substr(md5(t),1,15) AS BIGINT)); `t` is the lambda variable
# bound by the transform() in simhash()
MD5_60BIT_HASH = "cast(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)"


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "simhash",
    n_bits: int = 64,
    hash_expr: str | None = None,
) -> DataFrame:
    """``n_bits``-bit SimHash over whitespace tokens in ONE JVM
    projection — no row explosion (the old shape multiplied the token
    stream x16 through an explode and still only produced 16 bits).

    Per token h = hash(token); per bit b the doc accumulates a +-1 vote
    by h's bit b; the final code sets bit b iff the vote is positive.
    All higher-order functions (transform/aggregate/zip_with), fully
    codegen-able, CPU ~ tokens x n_bits with zero shuffle.

    ``hash_expr`` defaults to xxhash64 (fastest).  Pass ``MD5_60BIT_HASH``
    with ``n_bits=60`` for a value DuckDB can reproduce exactly.
    """
    if not 1 <= n_bits <= 64:
        raise ValueError("n_bits must be in [1, 64]")
    hexpr = hash_expr or "xxhash64(t)"
    expr = f"""
      aggregate(
        transform(filter(split(lower({text_col}), ' '), t -> t != ''),
                  t -> {hexpr}),
        array_repeat(0, {n_bits}),
        (acc, h) -> zip_with(acc, sequence(0, {n_bits - 1}),
                             (a, b) -> a + CASE WHEN (shiftright(h, b) & 1) = 1
                                            THEN 1 ELSE -1 END),
        votes -> aggregate(sequence(0, {n_bits - 1}), 0L,
                           (s, b) -> s + CASE WHEN element_at(votes, b + 1) > 0
                                           THEN shiftleft(1L, b) ELSE 0L END)
      )
    """
    return docs.withColumn(out_col, F.expr(expr))


def simhash_bands(
    df: DataFrame, n_bands: int = 4, bits_per_band: int = 16, col: str = "simhash"
) -> DataFrame:
    """One row per (row, band_id, band_val): contiguous bit slices of the
    SimHash code.  By pigeonhole, two codes within Hamming distance
    ``n_bands - 1`` share at least one identical band — the bands are the
    LSH bucket keys for candidate retrieval."""
    mask = (1 << bits_per_band) - 1
    return df.select(
        "*",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}),"
                f" j -> shiftright({col}, j * {bits_per_band}) & {mask}L)"
            )
        ).alias("band_id", "band_val"),
    )


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bits: int = 64,
    n_bands: int = 4,
    hash_expr: str | None = None,
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash) <= max_hamming, found
    via band-bucket self-join — never all pairs.  Exact (not just
    high-recall) as long as ``max_hamming < n_bands``: pigeonhole
    guarantees every qualifying pair shares a band bucket."""
    if max_hamming >= n_bands:
        raise ValueError("exactness needs max_hamming < n_bands (pigeonhole)")
    sh = simhash(docs, text_col=text_col, n_bits=n_bits, hash_expr=hash_expr).select(
        F.col(id_col).alias("id"), "simhash"
    )
    # the band self-join consumes the codes on both sides; checkpoint the
    # (tiny) id->code projection so the tokens x n_bits vote aggregation
    # runs once, not once per join side
    sh = sh.localCheckpoint(eager=True)
    banded = simhash_bands(sh, n_bands=n_bands, bits_per_band=n_bits // n_bands)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["a", "b"])
    )
    return (
        pairs.withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .drop("sh_a", "sh_b")
    )


def rolling_fingerprint(docs: DataFrame, text_col: str = "text", window: int = 64) -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-
    collapsed lowercase prefix (cheap dedup key for near-identical
    heads)."""
    norm = F.lower(F.regexp_replace(F.substring(F.col(text_col), 1, window), r"\s+", " "))
    return docs.withColumn("fingerprint", F.substring(F.md5(norm), 1, 16))


# ---------------------------------------------------------------------------
# Learned BPE (byte-pair encoding) — a REAL trained merge table, not the
# regex approximation in token_counts_bpe
# ---------------------------------------------------------------------------

#: token delimiter for the flat BPE word encoding (U+001F unit separator
#: — never appears in corpus text).  A word's token sequence is stored
#: as D t1 DD t2 DD ... tn D: every token owns its flanking delimiters,
#: so replacing the substring D a DD b D with D ab D merges EXACTLY the
#: non-overlapping left-to-right occurrences of the adjacent pair (a, b)
#: — the greedy BPE apply — with plain string replace on BOTH engines
#: (Spark `replace` and DuckDB `replace` share those semantics, so the
#: oracle replays training verbatim).
BPE_D = "\x1f"


def _bpe_word_seqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, seq): distinct corpus words with occurrence counts
    and the initial one-char-per-token delimited encoding.  Classic BPE
    trains on word TYPES weighted by frequency — the vocabulary table is
    tiny next to the corpus, so every merge iteration touches |vocab|
    rows, not |corpus| tokens."""
    words = (
        docs.select(
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    # one regexp wraps every char in its own delimiters: "cat" ->
    # D c D D a D D t D (adjacent tokens share no delimiter chars)
    seq = F.regexp_replace(F.col("word"), "(.)", BPE_D + "$1" + BPE_D)
    return words.select("word", "cnt", seq.alias("seq"))


def _bpe_pair_counts(seqs: DataFrame) -> DataFrame:
    """(left, right, n): corpus-weighted adjacent-token-pair counts from
    the current encodings."""
    toks = F.split(
        F.expr("substring(seq, 2, length(seq) - 2)"), BPE_D + BPE_D
    )
    pair = F.explode(
        F.arrays_zip(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("l"),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("r"),
        )
    )
    return (
        seqs.select("cnt", pair.alias("p"))
        .select("cnt", F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .groupBy("left", "right")
        .agg(F.sum("cnt").alias("n"))
    )


def bpe_train(docs: DataFrame, n_merges: int, text_col: str = "text"):
    """Train a BPE merge table on the corpus: ``n_merges`` rounds of
    merge-the-most-frequent-adjacent-pair, ties broken lexicographically
    on (left, right) — fully deterministic, no RNG.

    Returns (merges, seqs): ``merges`` is a list of (step, left, right,
    pair_count) in merge order; ``seqs`` the final per-word encodings
    (word, cnt, seq) for downstream apply.  Each round is one
    distributed pair-count aggregation over the word-TYPE table plus an
    O(1) driver collect of the winning pair (k rounds = k tiny
    barriers, the same O(iters) shape as PageRank); the apply is a
    single string replace per word."""
    seqs = _bpe_word_seqs(docs, text_col=text_col).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    pending = 0
    for step in range(1, int(n_merges) + 1):
        top = (
            _bpe_pair_counts(seqs)
            .orderBy(F.desc("n"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        merges.append((step, left, right, n))
        pat = BPE_D + left + BPE_D + BPE_D + right + BPE_D
        rep = BPE_D + left + right + BPE_D
        # the replace is a cheap projection over the word-TYPE table:
        # let a few of them stack lazily on the last checkpoint instead
        # of paying one materialization job per merge (round 7 — halves
        # the barrier count; each round's argmax collect re-applies at
        # most 3 pending replaces, string ops over vocabulary-sized data)
        seqs = seqs.withColumn("seq", F.replace("seq", F.lit(pat), F.lit(rep)))
        pending += 1
        if pending == 4:
            seqs = seqs.localCheckpoint(eager=True)
            pending = 0
    return merges, seqs


def bpe_token_counts(docs: DataFrame, seqs: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply the trained encodings corpus-wide: per-document subword
    token count under the learned vocabulary.  The (word -> n_tokens)
    map is vocabulary-sized and BROADCASTS into the corpus word stream;
    the per-doc reduce is a map-side partial sum."""
    n_toks = (F.length("seq") - F.length(F.replace("seq", F.lit(BPE_D + BPE_D), F.lit("")))) / 2 + 1
    lens = seqs.select("word", n_toks.cast("long").alias("n_sub"))
    stream = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("word"),
    )
    return (
        stream.join(F.broadcast(lens), "word")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_words"), F.sum("n_sub").alias("n_subword_tokens"))
    )


def paragraph_dedup_stats(
    docs: DataFrame,
    width: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Corpus-global keep-first paragraph dedup (the C4/RefinedWeb
    sub-document primitive): chop each doc into non-overlapping
    ``width``-word chunks, keep ONLY the corpus-wide first occurrence
    of each chunk type (first = lowest (doc_id, position)), and report
    per-``group_col`` retention.

    Returns (group, n_paras, n_kept, retained_micro) — retained_micro
    is integral-division exact.  Scale shape: the first-occurrence set
    is one chunk-keyed min(struct(doc_id, pos)) aggregation
    (map-side-combinable) joined back into the chunk stream on the
    same key — no window sort over the corpus; both shuffles share the
    chunk-hash partitioning.  Width 2 because the synthetic vocabulary
    is ~30 words (real pipelines hash whole lines; the plan shape is
    identical).
    """
    w = int(width)
    ch = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(group_col).alias("grp"),
            F.split(F.lower(F.col(text_col)), " ").alias("ws"),
        )
        .where(F.size("ws") >= w)  # sequence(1, 0) would yield [1, 0]
        .select(
            "doc_id",
            "grp",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {w - 1}, {w}),"
                    f" i -> struct(i AS pos,"
                    f" array_join(slice(ws, i, {w}), ' ') AS chunk))"
                )
            ).alias("c"),
        )
        .select("doc_id", "grp", "c.pos", "c.chunk")
    )
    first = ch.groupBy("chunk").agg(
        F.min(F.struct("doc_id", "pos")).alias("f")
    )
    flagged = ch.join(first, "chunk").select(
        "grp",
        (
            (F.col("doc_id") == F.col("f.doc_id"))
            & (F.col("pos") == F.col("f.pos"))
        ).cast("long").alias("kept"),
    )
    return (
        flagged.groupBy("grp")
        .agg(F.count("*").alias("n_paras"), F.sum("kept").alias("n_kept"))
        .select(
            F.col("grp").alias(group_col),
            "n_paras",
            "n_kept",
            F.expr("(n_kept * 1000000) div n_paras").alias("retained_micro"),
        )
    )


def unigram_token_stats(
    docs: DataFrame,
    max_piece_len: int = 4,
    min_count: int = 2,
    max_word_len: int = 12,
    text_col: str = "text",
) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer statistics (K75) —
    the learned-tokenizer family beside BPE (bpe_train): vocabulary =
    every <= ``max_piece_len``-char substring of the corpus word types
    with occurrence-weighted count >= ``min_count`` (single chars kept
    unconditionally so segmentation is always feasible), piece cost =
    round(ln(total/cnt) * 1e4) BIGINT (the 1e4 surprisal grid
    bigram_lm_surprisal uses — ln() exactness across engines is
    empirical on that grid, disclosed), and per WORD TYPE the exact
    integer Viterbi optimum: minimal (total cost, token count) in
    lexicographic order, encoded as cost*1024 + ntokens so one integer
    min is the whole DP state.

    Returns (word, n, cost_q, n_tokens) per word type.  Scale shape:
    everything is word-TYPE-sized after the first groupBy (bounded far
    below the corpus); the DP is data-parallel per word — piece costs
    ride a map column and the ``max_word_len`` DP steps unroll into
    one codegen projection (no loop, no UDF).  Words longer than
    ``max_word_len`` are excluded by contract on both engines.
    """
    L, W = int(max_piece_len), int(max_word_len)
    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
    )
    wt = (
        toks.where(
            (F.length("word") >= 1) & (F.length("word") <= W)
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    pairs = (
        wt.select(
            "word",
            "n",
            F.explode(F.expr("sequence(1, length(word))")).alias("i"),
        )
        .select(
            "word",
            "n",
            "i",
            F.explode(
                F.expr(f"sequence(greatest(0, i - {L}), i - 1)")
            ).alias("j"),
        )
        .select(
            "word",
            "n",
            "i",
            "j",
            F.expr("substring(word, j + 1, i - j)").alias("piece"),
        )
    )
    vocab = (
        pairs.groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
        .where((F.col("cnt") >= min_count) | (F.length("piece") == 1))
    )
    total = vocab.agg(F.sum("cnt").alias("t"))
    cost = vocab.crossJoin(total).select(
        "piece",
        (
            F.round(
                F.log(F.col("t").cast("double") / F.col("cnt")) * 10000, 0
            ).cast("long")
            * 1024
            + 1
        ).alias("enc"),
    )
    sc = pairs.join(cost, "piece").select(
        "word", (F.col("j") * 100 + F.col("i")).alias("k"), "enc"
    )
    m = sc.groupBy("word").agg(
        F.map_from_entries(F.collect_list(F.struct("k", "enc"))).alias("m")
    )
    dp = wt.join(m, "word")
    # unrolled Viterbi: b[i] = min over j of b[j] + enc(j, i); missing
    # pieces surface as NULL from try_element_at and F.least skips them
    b = [F.lit(0).cast("long")]
    for i in range(1, W + 1):
        cands = [
            b[j] + F.try_element_at("m", F.lit(j * 100 + i))
            for j in range(max(0, i - L), i)
        ]
        b.append(cands[0] if len(cands) == 1 else F.least(*cands))
    best = F.element_at(F.array(*b[1:]), F.length("word").cast("int"))
    return dp.select(
        "word",
        "n",
        best.alias("_best"),
    ).select(
        "word",
        "n",
        F.expr("_best div 1024").alias("cost_q"),
        (F.col("_best") % 1024).alias("n_tokens"),
    )


def setsim_join_half(tokens: DataFrame) -> DataFrame:
    """Exact set-similarity self-join at Jaccard >= 1/2 with PREFIX
    FILTERING (K80, the AllPairs/PPJoin family) over a (doc_id, tok)
    SET table (rows distinct per doc — shingles, tokens, features):
    unlike the MinHash/SimHash tiers this returns the EXACT qualifying
    pairs, and unlike the naive token self-join it never enumerates
    every co-occurring pair — each doc only exposes its
    |d| - ceil(|d|/2) + 1 RAREST tokens (global (df, token) order),
    and the prefix-filter theorem guarantees any pair with
    Jaccard >= 1/2 shares a prefix token.

    Entirely integer: at t = 1/2 the prefix length is
    (|d| div 2) + 1 and the qualifying predicate is
    3*|A∩B| >= |A| + |B| — no float threshold anywhere.

    Returns (a, b, inter, ua, ub, jac_ppm) for qualifying pairs.
    Scale shape: token df is vocabulary-sized; prefixes join on the
    RARE tokens (bounded fan-out exactly where a naive join explodes
    on hot tokens); the verification join touches candidate pairs
    only.
    """
    # toks feeds five consumers (sizes, df, prefix, both verification
    # sides) — materialize the set once
    toks = (
        tokens.select("doc_id", "tok")
        .dropDuplicates(["doc_id", "tok"])
        .localCheckpoint(eager=True)
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    df_rank = toks.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = toks.join(df_rank, "tok").join(sizes, "doc_id")
    # the (df, tok) TOTAL order is applied per doc — no global
    # vocabulary ranking window, just a doc-keyed row_number
    pos = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "tok")
    )
    prefix = ranked.withColumn("pos", pos).where(
        F.col("pos") <= F.expr("(sz div 2) + 1")
    )
    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), "tok")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .dropDuplicates(["a", "b"])
    )
    ta = toks.select(F.col("doc_id").alias("a"), "tok")
    tb = toks.select(F.col("doc_id").alias("b"), "tok")
    inter = (
        cand.join(ta, "a")
        .join(tb, ["b", "tok"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("ua"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("ub"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .where(F.expr("3 * inter >= ua + ub"))
        .select(
            "a",
            "b",
            "inter",
            "ua",
            "ub",
            F.expr("(1000000 * inter) div (ua + ub - inter)").alias("jac_ppm"),
        )
    )
