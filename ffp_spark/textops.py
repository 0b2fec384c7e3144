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


def train_lang_model(docs: DataFrame, lang_col: str = "lang", text_col: str = "text") -> DataFrame:
    """(lang, bigram, log-ish weight): P(bigram|lang) with add-one
    smoothing folded into a relative-frequency weight."""
    grams = char_bigrams(docs, text_col).groupBy(lang_col, "bigram").count()
    totals = grams.groupBy(lang_col).agg(F.sum("count").alias("total"))
    return (
        grams.join(totals, lang_col)
        .select(
            F.col(lang_col).alias("model_lang"),
            "bigram",
            F.log((F.col("count") + 1.0) / (F.col("total") + 1000.0)).alias("w"),
        )
    )


def predict_lang(
    docs: DataFrame, model: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """argmax_lang sum of bigram weights; the model is broadcast (it is
    tiny: |langs| x |alphabet|^2 rows)."""
    grams = char_bigrams(docs.select(id_col, text_col), text_col)
    scored = (
        grams.join(F.broadcast(model), "bigram")
        .groupBy(id_col, "model_lang")
        .agg(F.sum("w").alias("score"))
    )
    return scored.groupBy(id_col).agg(
        F.max_by("model_lang", "score").alias("predicted_lang")
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


def rolling_fingerprint(docs: DataFrame, text_col: str = "text", window: int = 64) -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-
    collapsed lowercase prefix (cheap dedup key for near-identical
    heads)."""
    norm = F.lower(F.regexp_replace(F.substring(F.col(text_col), 1, window), r"\s+", " "))
    return docs.withColumn("fingerprint", F.substring(F.md5(norm), 1, 16))
