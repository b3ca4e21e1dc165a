"""Streaming anomaly scoring: apply a batch-fitted scorer to a file
stream with thresholded alerting.

The streaming half of the reference's fit/predict split
(pipelines/control.py:139-204 — fit on a training frame, predict on
arriving data): every scorer in this engine ships its fitted state as
plan literals inside a Column expression or Arrow UDF (robust-Z
ensemble `scoring.ensemble_score`, Mahalanobis
`scoring.mahalanobis_score`, PCA reconstruction error
`spectral.pca_score_udf`), so streaming inference is the SAME
expression applied per micro-batch — no model server, no per-row
Python beyond the vectorized UDF, and replay idempotence comes from
the checkpoint exactly as in stream_validate.

Scale shape: stateless per-batch projection + filter; the only state
is the source-file checkpoint. Alerts are the thresholded subset
written to their own sink so downstream consumers tail a small table,
not the full scored firehose.

Restart safety: both sinks are hive-partitioned by ``batch_id`` and
written with dynamic partition OVERWRITE (the
stream_dedup_against_index pattern, validate.py) — a batch replayed
after a crash between the write and the checkpoint commit overwrites
its own partition instead of duplicating rows or re-firing alerts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def stream_score(
    spark: SparkSession,
    input_path: str,
    *,
    schema: StructType | str,
    score: Column,
    checkpoint_dir: str,
    scored_path: str,
    alert_path: str | None = None,
    threshold: float | None = None,
    keep_cols: list[str] | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming scorer; returns the StreamingQuery.

    score: a fitted scorer Column (see module docstring) evaluated over
    the stream's columns. threshold + alert_path: rows with
    score > threshold are ALSO appended to the alert sink (the
    reference's top-k% label becomes a fixed fitted threshold here —
    a per-batch quantile would alert relative to each batch's own
    distribution, which is not what a monitor wants; fit the threshold
    batch-side, e.g. from functions/stats.py percentiles, and pass it).
    keep_cols: projection for both sinks (defaults to all columns);
    `anomaly_score` and `batch_id` are appended to it.
    """
    if (threshold is None) != (alert_path is None):
        raise ValueError("threshold and alert_path must be set together")
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1000)
        .parquet(input_path)
    )

    def _write(df: DataFrame, path: str) -> None:
        # dynamic partition overwrite on batch_id: a replayed batch
        # replaces its own partition (metadata-level), never duplicates
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        cols = batch_df.columns if keep_cols is None else keep_cols
        out = batch_df.select(
            *cols, score.alias("anomaly_score")
        ).withColumn("batch_id", F.lit(batch_id))
        if threshold is not None:
            # one cached pass feeds both sinks; the alert subset is
            # bounded by the threshold's fitted tail mass
            out = out.cache()
            try:
                _write(out, scored_path)
                _write(
                    out.filter(F.col("anomaly_score") > threshold), alert_path
                )
            finally:
                out.unpersist()
        else:
            _write(out, scored_path)

    writer = (
        reader.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
