"""End-to-end event-analytics / feature-engineering pipeline.

The warehouse-side companion to ``pretraining_pipeline.py``: raw events in,
model-ready per-user features and monitoring tables out, composed entirely
from dftly-spark operators:

    read → engine expressions (derived columns) → null repair
    (impute_nulls) → outlier repair (winsorize) → anomaly flags
    (rolling_zscore) → sessions (sessionize + merge_intervals) → per-user
    features (lag_features, rolling_time_features, time_weighted_avg,
    ntile_features) → state history (scd2_history) → journey model
    (transition_matrix) → cohort & funnel reporting → skew diagnostics
    (key_skew_profile) → eval & drift (roc_auc_by_group, psi_drift)

Every stage is a DataFrame → DataFrame transformation keyed on the SAME
user/type keys, so at 100 TB the plan is a handful of keyed Exchanges that
AQE co-locates, not a stage per feature.  The monitoring outputs
(anomalies, skew, transitions) are exactly the tables an on-call engineer
asks for first.

Run:  python examples/event_feature_pipeline.py [sf_dir] [out_dir]
Test: tests/test_example_pipeline.py runs it end-to-end at sf0.001.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dftly_spark import Parser
from dftly_spark.io import normalize_event_ts
from dftly_spark.ops import (
    impute_nulls,
    key_skew_profile,
    lag_features,
    merge_intervals,
    ntile_features,
    psi_drift,
    roc_auc_by_group,
    rolling_time_features,
    rolling_zscore,
    scd2_history,
    sessionize,
    time_weighted_avg,
    transition_matrix,
    winsorize,
)


def build(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))

    # 1. Derived columns through the expression engine (fuse into the scan).
    ev = Parser.with_columns(
        events,
        {
            "hour": "$ts::hour_of_day",
            "is_purchase": '$event_type == "purchase"',
        },
    )

    # 2. Repair: fill missing values per type, clamp the heavy tail.
    ev = impute_nulls(ev, "event_type", {"value": "median"})
    ev = winsorize(ev, "event_type", "value", lower=0.01, upper=0.99)

    # 3. Monitoring: one-step-ahead anomaly flags per type.
    flagged = rolling_zscore(
        ev.select("event_id", "event_type", "ts", "clamped"),
        "event_type",
        ["ts", "event_id"],
        "clamped",
        lookback=100,
        z_threshold=3.0,
    )

    # 4. Sessions two ways: gap-based indices and merged activity spans.
    sessions = sessionize(ev, user_col="user_id", ts_col="ts", id_col="event_id")
    us = F.unix_micros("ts")
    spans = merge_intervals(
        ev.select("user_id", us.alias("s"), (us + 900_000_000).alias("e")),
        "user_id",
        "s",
        "e",
    )

    # 5. Per-user features: history lags, carry-forward average, standing.
    lagged = lag_features(
        ev.select("event_id", "user_id", us.alias("ts_us"), "clamped"),
        "user_id",
        ["ts_us", "event_id"],
        ["clamped"],
        lags=(1, 2),
    )
    twa = time_weighted_avg(ev, "user_id", "ts", "clamped")
    # global standing: rank every user against the whole population
    # (constant key — fine here because twa is already one row per user;
    # at extreme user counts switch the key to a coarse user bucket)
    standing = ntile_features(
        twa.withColumn("_all", F.lit(1)), "_all", "twa", ["user_id"], buckets=10
    ).drop("_all")

    # 6. State history + journey model for the product team.
    history = scd2_history(
        ev.select("user_id", "ts", "event_type", "event_id"),
        "user_id",
        "ts",
        ["event_type"],
        order_cols=["event_id"],
    )
    journeys = transition_matrix(
        ev, "user_id", "ts", "event_type", order_cols=("event_id",)
    )

    # 7. Ops diagnostics: is user_id safe to shuffle on?
    skew = key_skew_profile(ev, "user_id", top_k=20)

    # 8. Eval & drift monitoring: trailing-hour activity as of each event
    #    (strictly-before frame -> leakage-free as a training feature),
    #    does value separate purchases per hour-of-day slice (a global AUC
    #    hides a broken slice), and has the purchase value distribution
    #    drifted away from clicks?
    trailing = rolling_time_features(
        ev.select("event_id", "user_id", "ts", "clamped"),
        "user_id",
        "ts",
        "clamped",
        lookback_micros=3_600_000_000,
        include_current=False,
    )
    auc_by_hour = roc_auc_by_group(ev, "hour", "is_purchase", "clamped")
    drift = psi_drift(
        ev, "clamped", "event_type", "click", "purchase", lo=0.0, hi=500.0
    )

    return {
        "events_clean": ev,
        "anomalies": flagged.where("is_anomaly"),
        "sessions": sessions,
        "activity_spans": spans,
        "user_features": lagged,
        "user_standing": standing,
        "state_history": history,
        "journeys": journeys,
        "user_skew": skew,
        "trailing_features": trailing,
        "auc_by_hour": auc_by_hour,
        "value_drift": drift,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/event_features"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, df in build(spark, sf_dir).items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}")
        print(f"{name}: {spark.read.parquet(f'{out_dir}/{name}').count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
