"""fastText-style hashed-ngram linear quality classifier (inference).

CCNet / RefinedWeb / FineWeb pipelines gate web documents with a small
linear classifier over hashed bag-of-ngram features (Joulin et al.
2017, "Bag of Tricks for Efficient Text Classification"): every word
unigram/bigram hashes into a fixed feature space, the document score
is the mean of the feature weights (fastText mean pooling), and a
sigmoid turns it into a keep/drop probability.

Reference scope note: the reference engine (fisxoj/json-schema) stops
at per-document keyword validation; this is a §2.8 training-pipeline
extension.

Scale shape (the 100 TB posture): inference is ONE projection of pure
per-row array expressions — tokenize once, hash each gram to its
bucket, fold the weights in a single linear ``aggregate`` — zero
shuffle, zero join, zero Python, fully inside whole-stage codegen.
Weights enter either as a caller-supplied bounded map (a trained
model, <= n_buckets entries, inlined as a literal map the same way a
broadcast dim would ship) or as the default md5-derived placeholder
(deterministic "untrained" weights exercising the identical plan; the
md5 derivation keeps every score DuckDB-reproducible, same rationale
as operators/lm.py's bucketing).

The O(tokens²) higher-order-function trap (operators/quality.py) does
not bite here: each HOF makes one linear pass over the token array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _bucket
from .textstats import ws_tokens

# md5-hex range for 15 hex chars: weights normalize against 2^60 so
# the placeholder lands uniformly in [-1, 1)
_MD5_SPAN = float(1 << 60)


def _placeholder_weight(bucket: Column) -> Column:
    """Deterministic per-bucket weight in [-1, 1): the md5 of the
    bucket id re-read as a 60-bit integer. Stands in for trained
    weights with the exact same plan shape; DuckDB reproduces it
    verbatim (tests + oracle)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("w#"), bucket.cast("string"))), 1, 15),
        16, 10,
    ).cast("double")
    return h / F.lit(_MD5_SPAN) * F.lit(2.0) - F.lit(1.0)


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    weights: dict[int, float] | None = None,
    use_bigrams: bool = True,
    gain: float = 12.0,
    seed: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Score every document with a hashed bag-of-ngrams linear model.

        score(d)        = mean over d's grams of w[bucket(gram)]
        quality_prob(d) = sigmoid(gain * score(d))
        keep(d)         = round(score, round_to) > 0

    Grams are word unigrams (+ bigrams unless disabled); buckets come
    from the engine's md5 bucketing (sampling._bucket, seed'd) so a
    SQL oracle reproduces every score. ``weights`` maps bucket -> w
    for a trained model; absent buckets fall back to the placeholder
    weight, so a sparse trained model composes with the default.
    Documents with zero grams (empty/whitespace text) emit NULL
    score/prob/keep — no evidence, no verdict (the operators/lm.py
    convention).

    Emits (id, n_grams, score, quality_prob, keep).
    """
    did = F.col(id_col)
    toks = ws_tokens(F.lower(F.col(text_col)))
    grams = toks
    if use_bigrams:
        bis = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws("\x1f", toks[i - 1], toks[i]),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(toks, bis)

    def w_of(gram: Column) -> Column:
        b = _bucket(gram, seed=seed, buckets=n_buckets)
        placeholder = _placeholder_weight(b)
        if not weights:
            return placeholder
        trained = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv])
        return F.coalesce(trained[b], placeholder)

    out = df.where(F.col(text_col).isNotNull()).select(
        did.alias("id"),
        F.size(grams).alias("n_grams"),
        # try_divide: zero grams (blank text) -> NULL verdict, not an
        # ANSI divide-by-zero error
        F.try_divide(
            F.aggregate(grams, F.lit(0.0), lambda acc, g: acc + w_of(g)),
            F.size(grams),
        ).alias("__raw"),
    )
    score = F.round(F.col("__raw"), round_to)
    return out.select(
        "id",
        "n_grams",
        score.alias("score"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(gain) * F.col("__raw"))),
                round_to).alias("quality_prob"),
        (score > 0).alias("keep"),
    )
