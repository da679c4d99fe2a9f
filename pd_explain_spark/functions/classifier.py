"""Discriminative quality classification for training corpora.

The fasttext-style quality filter every modern pretraining pipeline
carries (GPT-3 / LLaMA data papers): train a linear classifier to
separate a small HIGH-QUALITY reference corpus from the raw crawl, then
score every raw document with the model's probability of being
reference-like. Complements DSIR (functions/mixing.py), which weights
by a GENERATIVE hashed-ngram ratio — the discriminative model learns
which features matter instead of assuming the unigram/bigram mixture.

No reference counterpart (the reference is a tabular explainer); part
of the training-data-pipeline extension surface.

Scale shape:
 * features are hashed unigram+bigram COUNT vectors (the same
   `_hashed_gram_buckets` space DSIR uses — one explode per corpus,
   then a map-side-combining (doc, bucket) count aggregate assembled
   into a sparse ml.linalg vector; no Python in the feature path);
 * training runs on reference + an equal-size deterministic sample of
   the raw corpus (md5-ordered — reproducible), so the fit cost is
   bounded by the REFERENCE size, not the crawl;
 * scoring is one broadcast of the coefficient vector folded into a
   JVM-side expression: probability = sigmoid(intercept + sum over the
   doc's buckets of coef[bucket] * count) — the corpus is scanned once
   and never leaves the JVM (the model is O(buckets) literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mixing import _hashed_gram_buckets, _sample_key
from .hashing import md5_int

__all__ = ["train_quality_classifier", "score_quality", "QualityModel"]


class QualityModel:
    """(intercept, coef: dict bucket -> weight, n_buckets) — a plain
    serializable linear model; `coefficients` is sparse (only buckets
    seen at training time)."""

    def __init__(self, intercept: float, coef: dict[int, float], n_buckets: int):
        self.intercept = float(intercept)
        self.coef = {int(k): float(v) for k, v in coef.items() if v != 0.0}
        self.n_buckets = int(n_buckets)


def _per_bucket_counts(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket, cnt) — the ONE definition of the classifier feature
    space (training vectors and scoring sums must count identically, and
    the quality_score_fixed oracle pins exactly this shape)."""
    return (
        _hashed_gram_buckets(df, text_col, id_col, n_buckets)
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bucket_count_vectors(df: DataFrame, text_col: str, id_col: str, n_buckets: int):
    """(id, features: sparse vector of bucket counts) via one explode +
    one map-combining aggregate; docs with zero grams keep an empty
    sparse vector (left join back to the id spine)."""
    per_bucket = _per_bucket_counts(df, text_col, id_col, n_buckets)
    assembled = per_bucket.groupBy("id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("bucket").cast("int").alias("bucket"),
                    F.col("cnt").cast("double").alias("cnt"),
                )
            )
        ).alias("pairs")
    )

    from pyspark.ml.linalg import SparseVector, VectorUDT

    @F.udf(returnType=VectorUDT())
    def to_vec(pairs):
        if not pairs:
            return SparseVector(n_buckets, [], [])
        return SparseVector(
            n_buckets, [p["bucket"] for p in pairs], [p["cnt"] for p in pairs]
        )

    spine = df.select(F.col(id_col).alias("id"))
    return spine.join(assembled, "id", "left").select(
        "id", to_vec(F.coalesce(F.col("pairs"), F.array())).alias("features")
    )


def train_quality_classifier(
    raw_df: DataFrame,
    reference_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    reg_param: float = 0.01,
    max_iter: int = 30,
    seed: int = 42,
) -> QualityModel:
    """Fit the reference-vs-raw linear classifier. The raw negative set
    is a deterministic md5-ordered sample matched to the reference size
    (balanced classes; reproducible without RNG state). Returns a plain
    :class:`QualityModel` whose coefficients fold into a JVM expression
    at scoring time — training artifacts never ship to executors."""
    from pyspark.ml.classification import LogisticRegression

    n_ref = reference_df.count()
    if n_ref == 0:
        raise ValueError("train_quality_classifier requires a non-empty reference")
    neg = (
        raw_df.withColumn("__ord", md5_int(_sample_key(id_col, seed)))
        .orderBy("__ord", F.col(id_col))
        .limit(n_ref)
        .drop("__ord")
    )
    # vectorize BOTH classes in one pipeline (r12): the two per-class
    # _bucket_count_vectors runs each paid their own explode + two
    # shuffles + UDF stage over tiny frames — union first (ids
    # disambiguated by a label-prefixed key, the classes may share an
    # id space), one gram/bucket pass for the whole training set
    uni = reference_df.select(
        F.col(id_col).alias("__oid"), F.col(text_col).alias("__txt"),
        F.lit(1.0).alias("__lbl"),
    ).unionByName(
        neg.select(
            F.col(id_col).alias("__oid"), F.col(text_col).alias("__txt"),
            F.lit(0.0).alias("__lbl"),
        )
    ).withColumn(
        "__uid",
        F.concat_ws(":", F.col("__lbl").cast("string"), F.col("__oid").cast("string")),
    )
    train = _bucket_count_vectors(uni, "__txt", "__uid", n_buckets).withColumn(
        "label",
        F.when(F.col("id").startswith("1.0:"), F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    # persist the vectorized frame for the fit (guide §5: reuse +
    # recompute cost): Spark 4's LogisticRegression does NOT cache its
    # input internally, so an unpersisted train frame re-runs the whole
    # bucket/UDF pipeline during the L-BFGS loop — measured 5.7s vs 0.5s
    # for the fit on the 16-row planted set, coefficients bit-identical.
    # The r12 coalesce() that sized partitions to the training set was
    # REMOVED: interleaved A/B showed coalesce(1) adds ~6s to evaluating
    # this plan (it drags the post-shuffle UDF/join stage to one task),
    # while the persist already makes the per-iteration treeAggregate
    # read cached blocks — mostly-empty task waves cost ~ms, not seconds.
    from pyspark.storagelevel import StorageLevel

    train = train.persist(StorageLevel.MEMORY_AND_DISK)
    lr = LogisticRegression(
        featuresCol="features", labelCol="label",
        regParam=reg_param, maxIter=max_iter, standardization=False,
    )
    try:
        model = lr.fit(train)
    finally:
        train.unpersist()
    coef = model.coefficients
    return QualityModel(
        intercept=model.intercept,
        coef={int(i): float(coef[int(i)]) for i in coef.indices}
        if hasattr(coef, "indices")
        else {i: float(v) for i, v in enumerate(coef) if v != 0.0},
        n_buckets=n_buckets,
    )


def score_quality(
    df: DataFrame,
    model: QualityModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc with the trained model: (id_col, n_grams,
    quality_prob) where quality_prob = sigmoid(intercept + sum of
    coef[bucket] * count). One explode + one map-combining (doc, bucket)
    count + a broadcast join against the O(buckets) coefficient table +
    one per-doc sum — the same single-scan shape as dsir_weights, all
    JVM-side. Zero-gram docs score sigmoid(intercept)."""
    spark = df.sparkSession
    coef_rows = [(b, w) for b, w in sorted(model.coef.items())]
    coef_df = spark.createDataFrame(coef_rows, "bucket long, w double")
    per_bucket = _per_bucket_counts(df, text_col, id_col, model.n_buckets)
    scored = (
        per_bucket.join(F.broadcast(coef_df), "bucket", "left")
        .groupBy("id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0.0))).alias("__z"),
        )
    )
    z = F.coalesce(F.col("__z"), F.lit(0.0)) + F.lit(model.intercept)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0).cast("bigint")).alias("n_grams"),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("quality_prob"),
        )
    )
