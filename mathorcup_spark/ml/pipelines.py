"""MLlib pipelines (SURVEY.md §2.11 M1-M7): the reference's model
capabilities re-expressed as fit/transform pipelines.

The reference trains bespoke torch networks (RGCN embeddings, IGANN
price regressor, TEIGANN classifier, TabNet multi-task); per SURVEY
§2.11 the *capabilities* — not the architectures — are the parity
target, mapped to MLlib estimators on shared feature pipelines. All
seeded; registered as rows-only queries (model internals have no SQL
oracle); metric parity with the reference's formulas comes from the
Milestone-3 metric aggregations run on these predictions.

Scale posture: MLlib estimators are data-parallel (tree aggregation
for gradients/splits); feature assembly is pure column work; nothing
here collects a dataset to the driver.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import LogisticRegression, RandomForestClassifier
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import (
    MinMaxScaler,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
    Word2Vec,
)
from pyspark.ml.functions import vector_to_array
from pyspark.ml.regression import GBTRegressor
from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

SEED = 42


def _price_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared tabular feature frame: discrete ids + continuous +
    date parts + target — the reference's vectorize() shape
    (src/data.py:8-31) on lineitem⋈part."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_brand",
            F.col("l_quantity").alias("qty"),
            F.col("l_discount").alias("disc"),
            F.col("p_retailprice").alias("listprice"),
            (F.year("l_shipdate") - 2000).cast("double").alias("y_off"),
            (F.month("l_shipdate") - 1).cast("double").alias("m_off"),
            F.col("l_extendedprice").alias("price"),
            (F.year("l_shipdate")).cast("string").alias("ship_year"),
            (F.month("l_shipdate")).cast("string").alias("ship_month"),
            F.col("l_returnflag").alias("returnflag"),
        )
    )


@register(
    "ml_word2vec_embeddings",
    oracle=None,
    doc="M1: entity-embedding pretraining — the reference pretrains "
    "RGCN embeddings on the attribute co-occurrence graph "
    "(preprocess.py:25-91); the idiomatic-Spark analog is Word2Vec "
    "over per-row attribute-token sentences ('col:value' tokens, "
    "SURVEY §2.11 M1): co-occurrence within a row = context window. "
    "Seeded, 1 partition → deterministic. Rows-only check.",
    tags=("M1", "ml"),
)
def ml_word2vec_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    sentences = part.select(
        F.array(
            F.concat_ws(":", F.lit("brand"), "p_brand"),
            F.concat_ws(":", F.lit("type"), "p_type"),
            F.concat_ws(":", F.lit("size"), F.col("p_size").cast("string")),
        ).alias("tokens")
    )
    w2v = Word2Vec(
        vectorSize=16,
        minCount=1,
        numPartitions=1,
        seed=SEED,
        inputCol="tokens",
        outputCol="vec",
    )
    model = w2v.fit(sentences)
    vectors = model.getVectors()  # (word, vector)
    return vectors.select(
        "word",
        F.round(vector_to_array("vector")[0], 6).alias("v0"),
        F.round(vector_to_array("vector")[1], 6).alias("v1"),
    )


@register(
    "ml_gbt_price_regression",
    oracle=None,
    doc="M2: tabular price regression — reference IGANN/TEIGANN MLP "
    "(first.py:21-117) as Pipeline(StringIndexer, VectorAssembler, "
    "GBTRegressor). Returns per-row predictions; MAPE/Acc@5%/score "
    "come from the m_regression_metrics aggregation applied to this "
    "output. Rows-only check (seeded).",
    tags=("M2", "M7", "ml"),
)
def ml_gbt_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _price_features(spark, sf_dir)
    pipe = Pipeline(
        stages=[
            StringIndexer(inputCol="p_brand", outputCol="brand_id", handleInvalid="keep"),
            VectorAssembler(
                inputCols=["brand_id", "qty", "disc", "listprice", "y_off", "m_off"],
                outputCol="features",
            ),
            GBTRegressor(
                labelCol="price", featuresCol="features", maxIter=5, maxDepth=4,
                seed=SEED,
            ),
        ]
    )
    train, test = df.randomSplit([0.7, 0.3], seed=SEED)
    model = pipe.fit(train)
    return model.transform(test).select(
        "l_orderkey",
        "l_linenumber",
        "price",
        F.round("prediction", 4).alias("predicted_price"),
    )


@register(
    "ml_logreg_sold_classifier",
    oracle=None,
    doc="M3: binary sale-probability classifier — reference "
    "TEIGANNClassifier (second.py:18-76) as LogisticRegression on the "
    "shared features (label: item returned). Outputs per-row "
    "probability + prediction; Pearson eval = m_pearson shape. "
    "Rows-only check.",
    tags=("M3", "ml"),
)
def ml_logreg_sold_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _price_features(spark, sf_dir).withColumn(
        "label", (F.col("returnflag") == "R").cast("double")
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=["qty", "disc", "listprice", "y_off", "m_off"],
                outputCol="features",
            ),
            LogisticRegression(maxIter=20, regParam=0.01),
        ]
    )
    train, test = df.randomSplit([0.7, 0.3], seed=SEED)
    model = pipe.fit(train)
    prob1 = vector_to_array("probability")[1]
    return model.transform(test).select(
        "l_orderkey",
        "l_linenumber",
        "label",
        F.round(prob1, 4).alias("sold_probability"),
        F.col("prediction").alias("predicted_label"),
    )


@register(
    "ml_multitask_bundle",
    oracle=None,
    doc="M4: multi-task deal prediction — reference TabNet jointly "
    "predicts sale year/month/day (classification) + price "
    "(regression) (second.py:78-117); here 2 classifiers + 1 regressor "
    "share one feature pipeline (SURVEY §2.11: the joint loss is a "
    "training detail, the capability is the parity target). "
    "Rows-only check.",
    tags=("M4", "M5", "ml"),
)
def ml_multitask_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _price_features(spark, sf_dir)
    assembler = VectorAssembler(
        inputCols=["qty", "disc", "listprice"], outputCol="features"
    )
    year_idx = StringIndexer(inputCol="ship_year", outputCol="year_label")
    month_idx = StringIndexer(inputCol="ship_month", outputCol="month_label")
    train, test = df.randomSplit([0.7, 0.3], seed=SEED)

    feats = Pipeline(stages=[assembler, year_idx, month_idx]).fit(train)
    train_f, test_f = feats.transform(train), feats.transform(test)

    year_clf = RandomForestClassifier(
        labelCol="year_label", featuresCol="features", numTrees=10, maxDepth=4,
        seed=SEED, predictionCol="year_pred",
        probabilityCol="year_prob", rawPredictionCol="year_raw",
    ).fit(train_f)
    month_clf = RandomForestClassifier(
        labelCol="month_label", featuresCol="features", numTrees=10, maxDepth=4,
        seed=SEED, predictionCol="month_pred",
        probabilityCol="month_prob", rawPredictionCol="month_raw",
    ).fit(train_f)
    price_reg = GBTRegressor(
        labelCol="price", featuresCol="features", maxIter=5, maxDepth=3, seed=SEED,
        predictionCol="price_pred",
    ).fit(train_f)

    out = price_reg.transform(month_clf.transform(year_clf.transform(test_f)))
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.col("year_pred").cast("int").alias("pred_year_id"),
        F.col("month_pred").cast("int").alias("pred_month_id"),
        F.round("price_pred", 4).alias("pred_price"),
    )


@register(
    "ml_scaler_fit_transform",
    oracle=None,
    doc="M6: normalization as fit/transform — reference per-column "
    "std/maxmin loops with params reused at inference "
    "(src/data.py:107-125); MLlib StandardScaler + MinMaxScaler on an "
    "assembled vector, params persisted in the model objects. The "
    "exact-arithmetic SQL equivalent is a_normalize_roundtrip. "
    "Rows-only check.",
    tags=("M6", "ml"),
)
def ml_scaler_fit_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    assembled = VectorAssembler(
        inputCols=["c_acctbal"], outputCol="raw"
    ).transform(customer)
    std = StandardScaler(
        inputCol="raw", outputCol="z", withMean=True, withStd=True
    ).fit(assembled)
    mm = MinMaxScaler(inputCol="raw", outputCol="mm").fit(assembled)
    out = mm.transform(std.transform(assembled))
    return out.select(
        "c_custkey",
        F.round(vector_to_array("z")[0], 6).alias("zscore"),
        F.round(vector_to_array("mm")[0], 6).alias("minmax"),
    )


@register(
    "ml_train_validation_select",
    oracle=None,
    doc="M7: model selection — the reference keeps the best checkpoint "
    "by validation metric (first.py:79-85); MLlib TrainValidationSplit "
    "over a GBT regParam/depth grid, RMSE objective. Returns the "
    "chosen params + validation metrics (1 row per grid point). "
    "Rows-only check.",
    tags=("M7", "W3", "ml"),
)
def ml_train_validation_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _price_features(spark, sf_dir)
    assembler = VectorAssembler(
        inputCols=["qty", "disc", "listprice"], outputCol="features"
    )
    gbt = GBTRegressor(labelCol="price", featuresCol="features", maxIter=5, seed=SEED)
    grid = ParamGridBuilder().addGrid(gbt.maxDepth, [2, 4]).build()
    tvs = TrainValidationSplit(
        estimator=Pipeline(stages=[assembler, gbt]),
        estimatorParamMaps=grid,
        evaluator=RegressionEvaluator(labelCol="price", metricName="rmse"),
        trainRatio=0.7,
        seed=SEED,
    )
    model = tvs.fit(df)
    spark_sess = spark
    rows = [
        (int(pm[gbt.maxDepth]), float(m))
        for pm, m in zip(grid, model.validationMetrics, strict=True)
    ]
    best_depth = rows[min(range(len(rows)), key=lambda i: rows[i][1])][0]
    return spark_sess.createDataFrame(
        [(d, round(m, 4), d == best_depth) for d, m in rows],
        "max_depth int, rmse double, is_best boolean",
    )


@register(
    "ml_checkpoint_roundtrip",
    oracle=None,
    doc="S9: model checkpoint save/load roundtrip — the reference "
    "persists torch checkpoints and reloads them for inference "
    "(first.py:80-81,120); the MLlib analog is PipelineModel.save → "
    "PipelineModel.load. Fits the shared GBT price pipeline, "
    "persists it, reloads it, re-predicts the SAME test split with "
    "both the in-memory and the reloaded model, and returns one row "
    "(n_mem, n_ckpt, roundtrip_exact) comparing row counts and an "
    "order-independent checksum over (keys, prediction-bits) — a "
    "loaded checkpoint must reproduce the fit bit-for-bit. The "
    "checksum (decimal sum of xxhash64 per row) avoids a row-level "
    "self-join, which the test data's duplicate (orderkey, "
    "linenumber) keys would cross-product. Rows-only check (seeded "
    "fit); the row itself asserts the equality so a driver green "
    "row IS the roundtrip evidence.",
    tags=("S9", "ml"),
)
def ml_checkpoint_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.ml import PipelineModel

    df = _price_features(spark, sf_dir)
    pipe = Pipeline(
        stages=[
            StringIndexer(inputCol="p_brand", outputCol="brand_id", handleInvalid="keep"),
            VectorAssembler(
                inputCols=["brand_id", "qty", "disc", "listprice", "y_off", "m_off"],
                outputCol="features",
            ),
            GBTRegressor(
                labelCol="price", featuresCol="features", maxIter=5, maxDepth=4,
                seed=SEED,
            ),
        ]
    )
    train, test = df.randomSplit([0.7, 0.3], seed=SEED)
    model = pipe.fit(train)
    out_dir = tempfile.mkdtemp(prefix="mathorcup_ckpt_")
    try:
        model.write().overwrite().save(out_dir)
        reloaded = PipelineModel.load(out_dir)

        def checksum(m):
            # order-independent: per-row xxhash64 over keys + the
            # prediction's exact bit pattern, summed in decimal
            out = m.transform(test).select(
                F.xxhash64("l_orderkey", "l_linenumber", "price", "prediction")
                .cast("decimal(28,0)")
                .alias("h")
            )
            return out.agg(
                F.count(F.lit(1)).alias("n"), F.sum("h").alias("chk")
            )

        a = checksum(model).select(
            F.col("n").alias("n_mem"), F.col("chk").alias("chk_mem")
        )
        b = checksum(reloaded).select(
            F.col("n").alias("n_ckpt"), F.col("chk").alias("chk_ckpt")
        )
        summary = a.crossJoin(b).select(
            "n_mem",
            "n_ckpt",
            (
                (F.col("n_mem") == F.col("n_ckpt"))
                & (F.col("chk_mem") == F.col("chk_ckpt"))
            ).alias("roundtrip_exact"),
        )
        # materialize before the checkpoint directory is deleted
        return summary.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


ALS_TOP_K = 3
ALS_N_QUERY_USERS = 100


def als_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit-style rating matrix: customer x part, rating = total
    quantity purchased (orders→lineitem join, one groupBy)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.sum("l_quantity").cast("float").alias("rating"))
    )


@register(
    "ml_als_recommend",
    oracle=None,
    doc="Collaborative-filtering recommender: ALS matrix "
    "factorization (rank 8, 5 iterations, seeded) on the customer x "
    "part purchase-quantity matrix, then top-3 part recommendations "
    "for the 100 lowest-id active customers via "
    "recommendForUserSubset — bounded query fan-out, NOT "
    "recommendForAllUsers, so the scoring stage is "
    "O(subset x items) regardless of user-base size (at 100 TB the "
    "subset is whatever batch the serving layer asks for). MLlib "
    "ALS itself is the scale path: block-partitioned factors, "
    "no driver-side matrix. The capability extends the reference's "
    "embedding-pretrain family (M1, src/model.py RGCN embeddings) "
    "to the user-item recommendation task. Rows-only check (seeded "
    "fit); quality/consistency floors are hash-verified by the "
    "als_recommender check row in ml_pipeline_suite.",
    tags=("ml", "als", "M1"),
)
def ml_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.recommendation import ALS

    ratings = als_ratings(spark, sf_dir)
    als = ALS(
        rank=8,
        maxIter=5,
        regParam=0.1,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        seed=SEED,
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    users = (
        ratings.select("user").distinct().orderBy("user").limit(ALS_N_QUERY_USERS)
    )
    recs = model.recommendForUserSubset(users, ALS_TOP_K)
    ex = recs.select(
        "user", F.posexplode("recommendations").alias("pos", "rec")
    )
    return ex.select(
        F.col("user").cast("long").alias("custkey"),
        (F.col("pos") + 1).cast("long").alias("rnk"),
        F.col("rec.item").cast("long").alias("partkey"),
        F.round(F.col("rec.rating").cast("double"), 4).alias("score"),
    )
