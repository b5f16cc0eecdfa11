"""Spark ML re-expression of the reference's ranking-model flow
(/root/reference/transformer/ranking/feature_factory.py:150-339 and
modeling.py:16-277): feature prep → leak-free match-level split →
regressor ensemble → weighted prediction → per-match ROW_NUMBER rank →
save/load round-trip.

Mapping (SURVEY §2.10 / §7 Phase 4):
  champion label-encode + unseen→-1  → StringIndexer(handleInvalid='keep')
  quantile clip fit-on-train         → approxQuantile + least/greatest
  RobustScaler fit/transform         → pyspark.ml.feature.RobustScaler
  match-level train_test_split       → split on DISTINCT match ids +
                                       broadcast semi-join (leak-free by
                                       construction, like the isin() split)
  5-model ensemble + inverse-MSE wts → N regressors, weight = (1/mse)/Σ —
                                       the 5 scalar weights are the ONLY
                                       driver-side materialization
  per-match prediction rank          → ROW_NUMBER() window (W2 semantics,
                                       deterministic puuid tie-break)
  joblib persistence                 → Pipeline/PipelineModel.save()/load()

Scale: every fitted statistic (quantiles, scaler medians, indexer labels)
is computed distributed and broadcast back; training data never collects.
Tree ensembles in Spark ML train distributed; inference is a narrow map.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import RobustScaler, StringIndexer, VectorAssembler
from pyspark.ml.regression import GBTRegressor, LinearRegression, RandomForestRegressor
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SEED = 42
LABEL = "performance_score"

# feature_factory.py:164-188 minus champion_id (indexed separately)
BASE_FEATURES = [
    "kda",
    "kills",
    "deaths",
    "assists",
    "damage_per_min",
    "damage_taken_per_min",
    "damage_mitigated_per_min",
    "total_damage_share",
    "gold_per_min",
    "cs_per_min",
    "gold_efficiency",
    "cc_time",
    "heal_shield_given",
    "kill_participation",
    "death_share",
    "longest_time_alive",
    "skill_shots_hit",
    "skill_shots_dodged",
    "aggression_index",
    "survival_index",
    "team_contribution",
    "combat_efficiency",
]
CLIP_COLS = ("kda", "damage_per_min", "gold_per_min")  # feature_factory.py:230


def silver_with_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship silver rows + the four derived indices
    (feature_factory.py:210-227)."""
    from ..operators.match_pipeline import filtered_players, performance_scored, player_features

    df = performance_scored(player_features(filtered_players(spark, sf_dir)))
    label_w = Window.partitionBy("match_id").orderBy(F.desc(LABEL))
    df = df.withColumn("rank_in_match", F.rank().over(label_w))
    return (
        df.withColumn(
            "aggression_index",
            (F.col("kills") + F.col("assists") * 0.5) / F.col("game_duration_min"),
        )
        .withColumn(
            "survival_index",
            F.col("longest_time_alive") / (F.col("game_duration_min") * 60),
        )
        .withColumn(
            "team_contribution",
            F.col("kill_participation") * 0.4
            + F.col("total_damage_share") * 0.4
            + (F.lit(1) - F.col("death_share")) * 0.2,
        )
        .withColumn(
            "combat_efficiency",
            F.col("damage_per_min")
            / F.when(F.col("damage_taken_per_min") == 0, F.lit(1)).otherwise(
                F.col("damage_taken_per_min")
            ),
        )
    )


def match_level_split(
    df: DataFrame, test_frac: float = 0.2, seed: int = SEED
) -> tuple[DataFrame, DataFrame]:
    """Leak-free split on DISTINCT match ids (feature_factory.py:268-287):
    all 10 rows of a match land on the same side. The id table is tiny →
    broadcast semi-join, no shuffle of the fact side."""
    matches = df.select("match_id").distinct()
    train_ids, test_ids = matches.randomSplit([1 - test_frac, test_frac], seed=seed)
    train = df.join(F.broadcast(train_ids), "match_id", "left_semi")
    test = df.join(F.broadcast(test_ids), "match_id", "left_semi")
    return train, test


def fit_clip_bounds(train: DataFrame, cols: tuple[str, ...] = CLIP_COLS) -> dict[str, tuple[float, float]]:
    """1%/99% winsorization bounds fit on TRAIN only
    (feature_factory.py:230-238). One approxQuantile call over ALL clip
    columns = ONE distributed pass (per-column calls would each rescan
    the train set)."""
    quantiles = train.approxQuantile(list(cols), [0.01, 0.99], 0.001)
    return {c: (q1, q99) for c, (q1, q99) in zip(cols, quantiles)}


def apply_clip(df: DataFrame, bounds: dict[str, tuple[float, float]]) -> DataFrame:
    for c, (lo, hi) in bounds.items():
        df = df.withColumn(c, F.least(F.greatest(F.col(c), F.lit(lo)), F.lit(hi)))
    return df


def build_pipeline(model) -> Pipeline:
    """indexer → assembler → robust-scaler → regressor (U4/F9)."""
    indexer = StringIndexer(
        inputCol="champion", outputCol="champion_id", handleInvalid="keep"
    )
    assembler = VectorAssembler(
        inputCols=["champion_id", *BASE_FEATURES], outputCol="raw_features"
    )
    scaler = RobustScaler(
        inputCol="raw_features",
        outputCol="features",
        withCentering=True,
        withScaling=True,
    )
    return Pipeline(stages=[indexer, assembler, scaler, model])


def default_models() -> dict[str, object]:
    """Five regressors mirroring the reference's xgb/lgb/rf/et/gbm quintet
    (modeling.py:16-68) from Spark ML's stock estimators — five DISTINCT
    model families (VERDICT r4 item 6): boosted trees, factorization
    machines, a random forest, a single deep tree (extra-trees stand-in),
    and a ridge linear model. xgboost/lightgbm themselves are not in the
    image; family heterogeneity is what the inverse-MSE weighting needs."""
    from pyspark.ml.regression import DecisionTreeRegressor, FMRegressor

    return {
        "gbt": GBTRegressor(
            labelCol=LABEL, featuresCol="features", maxIter=30, maxDepth=5, seed=SEED
        ),
        "fm": FMRegressor(
            labelCol=LABEL,
            featuresCol="features",
            factorSize=4,
            regParam=0.01,
            stepSize=0.05,
            maxIter=50,
            seed=SEED + 7,
        ),
        "rf": RandomForestRegressor(
            labelCol=LABEL, featuresCol="features", numTrees=50, maxDepth=8, seed=SEED
        ),
        "dt": DecisionTreeRegressor(
            labelCol=LABEL, featuresCol="features", maxDepth=10, seed=SEED
        ),
        "lr": LinearRegression(
            labelCol=LABEL, featuresCol="features", regParam=0.01, elasticNetParam=0.0
        ),
    }


@dataclass
class RankingEnsemble:
    """Fitted ensemble: per-model PipelineModel + inverse-MSE weights
    (modeling.py:130-142)."""

    models: dict[str, PipelineModel]
    weights: dict[str, float]
    clip_bounds: dict[str, tuple[float, float]] = field(default_factory=dict)

    def predict(self, df: DataFrame) -> DataFrame:
        """Weighted-average prediction (F11) + per-match ROW_NUMBER rank
        (W2, deterministic puuid tie-break — modeling.py:202-212)."""
        df = apply_clip(df, self.clip_bounds)
        out = df
        for name, m in self.models.items():
            pred = m.transform(out).withColumnRenamed("prediction", f"pred_{name}")
            drop = [c for c in ("raw_features", "features", "champion_id") if c in pred.columns]
            out = pred.drop(*drop)
        expr = None
        for name, w in self.weights.items():
            term = F.col(f"pred_{name}") * F.lit(w)
            expr = term if expr is None else expr + term
        out = out.withColumn("predicted_score", expr)
        w_rank = Window.partitionBy("match_id").orderBy(
            F.desc("predicted_score"), "puuid"
        )
        return out.withColumn("predicted_rank", F.row_number().over(w_rank))

    def save(self, path: str) -> None:
        import json
        import os

        os.makedirs(path, exist_ok=True)
        for name, m in self.models.items():
            m.write().overwrite().save(f"{path}/{name}")
        with open(f"{path}/meta.json", "w") as f:
            json.dump({"weights": self.weights, "clip_bounds": self.clip_bounds}, f)

    @classmethod
    def load(cls, path: str) -> "RankingEnsemble":
        import json

        with open(f"{path}/meta.json") as f:
            meta = json.load(f)
        models = {name: PipelineModel.load(f"{path}/{name}") for name in meta["weights"]}
        return cls(
            models=models,
            weights=meta["weights"],
            clip_bounds={k: tuple(v) for k, v in meta["clip_bounds"].items()},
        )


def train_ensemble(
    train: DataFrame,
    val_frac: float = 0.2,
    models: dict | None = None,
    parallelism: int = 1,
) -> RankingEnsemble:
    """Fit each model, weight by inverse validation MSE (modeling.py:94-142).
    The validation split is match-level, like the outer split.

    ``parallelism > 1`` fits the member models CONCURRENTLY: each fit is
    an independent chain of Spark jobs, so driver threads submitting them
    in parallel let the scheduler interleave their stages across executor
    slots (the same mechanism CrossValidator's own `parallelism` uses —
    on a 1000-executor cluster one GBT fit rarely saturates the cluster,
    so sequential member fits leave most slots idle between stages).
    Results are IDENTICAL to the sequential path: the fits share no
    state, every estimator is seeded, and the weight normalization is
    order-independent (asserted in tests/test_ml_extras.py). The split
    frames are persisted for the duration so concurrent lineages don't
    re-run the upstream feature pipeline once per model."""
    models = models or default_models()
    clip_bounds = fit_clip_bounds(train)
    train = apply_clip(train, clip_bounds)
    fit_part, val_part = match_level_split(train, test_frac=val_frac, seed=SEED + 1)

    def fit_one(item: tuple[str, object]) -> tuple[str, PipelineModel, float]:
        name, reg = item
        pm = build_pipeline(reg).fit(fit_part)
        # evaluator per call: Params objects are not thread-safe to share
        mse = RegressionEvaluator(
            labelCol=LABEL, predictionCol="prediction", metricName="mse"
        ).evaluate(pm.transform(val_part))
        return name, pm, mse

    def fit_final(item: tuple[str, object]) -> tuple[str, PipelineModel]:
        name, reg = item
        return name, build_pipeline(reg).fit(train)

    fitted: dict[str, PipelineModel] = {}
    inv_mse: dict[str, float] = {}
    if parallelism > 1:
        from concurrent.futures import ThreadPoolExecutor

        for df in (train, fit_part, val_part):
            df.persist()
        try:
            with ThreadPoolExecutor(max_workers=parallelism) as pool:
                for name, pm, mse in pool.map(fit_one, models.items()):
                    fitted[name] = pm
                    inv_mse[name] = 1.0 / max(mse, 1e-10)
                final = dict(pool.map(fit_final, models.items()))
        finally:
            for df in (train, fit_part, val_part):
                df.unpersist()
    else:
        for item in models.items():
            name, pm, mse = fit_one(item)
            fitted[name] = pm
            inv_mse[name] = 1.0 / max(mse, 1e-10)
        final = dict(fit_final(item) for item in models.items())
    total = sum(inv_mse.values())
    weights = {k: v / total for k, v in inv_mse.items()}
    return RankingEnsemble(models=final, weights=weights, clip_bounds=clip_bounds)


def cross_validate_linear(train: DataFrame, n_folds: int = 3):
    """U4: CrossValidator (the reference's 5-fold cross_val_score,
    modeling.py:94-101) over the regularization strength of the linear
    stage. Folds are Spark-managed; each fit is distributed."""
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    lr = LinearRegression(labelCol=LABEL, featuresCol="features")
    pipe = build_pipeline(lr)
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.001, 0.01, 0.1])
        .build()
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=RegressionEvaluator(
            labelCol=LABEL, predictionCol="prediction", metricName="mse"
        ),
        numFolds=n_folds,
        seed=SEED,
        parallelism=4,
    )
    return cv.fit(train)


def linear_pandas_udf_scorer(lr_pipeline_model: PipelineModel):
    """U3: vectorized model inference as a Pandas UDF — the pattern for
    models Spark ML can't host (xgb/lgb in the reference,
    modeling.py:145-169). The model parameters are captured in the closure
    (Spark broadcasts them with the task); scoring is numpy over Arrow
    batches, never row-at-a-time Python.

    Here the 'external model' is the linear stage's (coefficients,
    intercept) pulled out of Spark ML — which also gives an exact parity
    target: the UDF must reproduce PipelineModel.transform bit-for-bit
    modulo float summation order (asserted in tests)."""
    from pyspark.sql.functions import pandas_udf

    lr_model = lr_pipeline_model.stages[-1]
    coef = np.array(lr_model.coefficients.toArray())
    intercept = float(lr_model.intercept)

    @pandas_udf("double")
    def score(features: pd.Series) -> pd.Series:
        mat = np.stack(features.to_numpy())
        return pd.Series(mat @ coef + intercept)

    return score


def feature_importances(ens: RankingEnsemble) -> "pd.DataFrame":
    """Cross-model feature-importance matrix (modeling.py:215-243): one row
    per feature, per-model importance + mean/std. Tree models expose
    featureImportances; the linear stage contributes |coefficient|. The
    matrix is (n_features x n_models) scalars — driver-side by nature."""
    rows: dict[str, dict[str, float]] = {}
    names = ["champion_id", *BASE_FEATURES]
    for mname, pm in ens.models.items():
        reg = pm.stages[-1]
        if hasattr(reg, "featureImportances"):
            vals = reg.featureImportances.toArray()
        elif hasattr(reg, "coefficients"):
            vals = np.abs(reg.coefficients.toArray())
        else:
            # FMRegressionModel: |linear_j| plus the squared L2 norm of the
            # feature's factor row (its total pairwise-interaction weight)
            factors = reg.factors.toArray()
            vals = np.abs(reg.linear.toArray()) + (factors**2).sum(axis=1)
        for f, v in zip(names, vals):
            rows.setdefault(f, {})[mname] = float(v)
    out = pd.DataFrame(
        [{"feature": f, **per_model} for f, per_model in rows.items()]
    )
    model_cols = list(ens.models)
    out["mean_importance"] = out[model_cols].mean(axis=1)
    out["std_importance"] = out[model_cols].std(axis=1)
    return out.sort_values("mean_importance", ascending=False).reset_index(drop=True)


def evaluate(pred: DataFrame) -> dict[str, float]:
    """MSE/RMSE/MAE + rank accuracy (test_modeling.py:81-123) — all as ONE
    distributed aggregation; only scalars reach the driver."""
    rank_diff = F.abs(F.col("predicted_rank") - F.col("rank_in_match"))
    err = F.col("predicted_score") - F.col(LABEL)
    row = pred.agg(
        F.avg(err * err).alias("mse"),
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.avg(F.abs(err)).alias("mae"),
        F.avg((rank_diff == 0).cast("double")).alias("rank_acc_exact"),
        F.avg((rank_diff <= 1).cast("double")).alias("rank_acc_1"),
        F.avg((rank_diff <= 2).cast("double")).alias("rank_acc_2"),
        F.avg(rank_diff).alias("mean_abs_rank_diff"),
    ).first()
    return {k: float(row[k]) for k in row.asDict()}
