"""Composable streaming pipeline: dedup -> validate -> score in ONE
micro-batch pass (VERDICT r4 next-round #7 — the unification of the
single-purpose streaming faces in validate.py / score.py).

An ingest pipeline rarely wants one of these alone: arriving files
should be deduplicated against everything ever accepted, the SURVIVORS
validated against train-fitted constraints, and the survivors scored
with a batch-fitted anomaly model — all without reading the batch
three times or running three separate streaming queries against three
checkpoints (which would triple the file-source bookkeeping and lose
the shared scan). ``stream_pipeline`` runs the composition inside one
``foreachBatch``:

* ONE readStream + ONE checkpoint own the file-source log;
* the batch is cached once; dedup's kept-subset (computed via the
  SAME ``incremental.run_shard_dedup`` machinery as the standalone
  face, index excluded-current-partition read included) feeds validate
  and score directly — dropped rows never reach the validators;
* EVERY sink — kept / dropped / index / verdicts / violations /
  scored / alerts — is hive-partitioned by ``ingest_batch`` and
  written with dynamic partition OVERWRITE, so a batch replayed after
  a crash between any sink write and the checkpoint commit overwrites
  its own partitions across the WHOLE composed output instead of
  duplicating any of them (the property the replay test drives).

Stages are opt-in: pass any subset of DedupStage / ValidateStage /
ScoreStage. A single-stage pipeline is exactly the corresponding
standalone face with the hardened sink convention.

Scale shape: unchanged from the standalone faces — dedup exchanges
O(|batch|) signature rows against a partition-pruned index, marking is
a pure Arrow/codegen map, scoring a stateless projection; composing
them adds zero extra passes over the batch beyond the one cache.
"""

from __future__ import annotations

import os

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from autoprepad_spark.operators.marking import mark_slim
from autoprepad_spark.operators.profile import ProfileStats
from autoprepad_spark.plans import verdicts as V
from autoprepad_spark.plans.suite import ALL_CHECKS


@dataclass(frozen=True)
class DedupStage:
    """Shard-vs-history dedup config (streaming/validate.py
    stream_dedup_against_index semantics, verbatim)."""

    index_path: str
    kept_path: str
    dropped_path: str
    text_col: str = "text"
    id_col: str = "doc_id"
    k_shingle: int = 3
    num_hashes: int = 32
    seed: int = 42
    bands: int = 8
    threshold: float = 0.8


@dataclass(frozen=True)
class ValidateStage:
    """Train-fitted constraint marking config (stream_validate
    semantics; uniqueness intentionally excluded — a global property
    cannot be decided on a file subset)."""

    stats: ProfileStats
    verdict_path: str
    violation_path: str
    dim: DataFrame | None = None
    vocab_size: int | None = None


@dataclass(frozen=True)
class ScoreStage:
    """Batch-fitted scorer config (stream_score semantics: the fitted
    model IS the Column/UDF closure; threshold fixed at fit time)."""

    score: Column
    scored_path: str
    alert_path: str | None = None
    threshold: float | None = None
    keep_cols: list[str] | None = field(default=None, hash=False)

    def __post_init__(self):
        if (self.threshold is None) != (self.alert_path is None):
            raise ValueError("threshold and alert_path must be set together")


def _sink(df: DataFrame, path: str, batch_id: int) -> None:
    """The pipeline-wide idempotent sink: dynamic partition overwrite
    keyed on the ingest batch — a replayed batch replaces its own
    partition (metadata-level), never duplicates."""
    (
        df.withColumn("ingest_batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(path)
    )


def _dedup_batch(
    spark: SparkSession,
    cfg: DedupStage,
    batch_df: DataFrame,
    batch_id: int,
    id_type: T.DataType,
    downstream,
) -> None:
    """One batch through shard-vs-history dedup; calls
    ``downstream(kept_plain)`` with the kept rows (original columns)
    BEFORE unpersisting them, so later stages reuse the cached subset."""
    from pyspark.sql import Window as W

    from autoprepad_spark.operators import incremental as INC

    index_schema = T.StructType([
        T.StructField("doc_id", id_type),
        T.StructField("content_hash", T.LongType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ])
    if os.path.isdir(cfg.index_path) and any(
        d.startswith("ingest_batch=") for d in os.listdir(cfg.index_path)
    ):
        idx = (
            spark.read.parquet(cfg.index_path)
            .filter(F.col("ingest_batch") != batch_id)
            .select(*INC.INDEX_COLS)
        )
    else:
        idx = spark.createDataFrame([], index_schema)

    hashed = batch_df.withColumn("_ch", INC.content_hash(cfg.text_col))
    rn = F.row_number().over(W.partitionBy("_ch").orderBy(cfg.id_col))
    uniq = hashed.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
    in_batch_dropped = (
        hashed.withColumn("_rn", rn)
        .filter(F.col("_rn") > 1)
        .select(
            F.col(cfg.id_col).alias("doc_id"),
            F.lit("exact_in_batch").alias("reason"),
            # matched_id carries ids, so it types as the id column does
            F.lit(None).cast(id_type).alias("matched_id"),
            F.lit(None).cast("double").alias("est_jaccard"),
        )
    )
    uniq = uniq.drop("_ch").cache()

    def kept_sink(kept: DataFrame) -> None:
        kept = kept.cache()
        _sink(
            kept.select(F.col(cfg.id_col).alias("doc_id"),
                        "content_hash", "sig"),
            cfg.index_path, batch_id,
        )
        plain = kept.drop("content_hash", "sig")
        _sink(plain, cfg.kept_path, batch_id)
        downstream(plain)
        kept.unpersist()

    def dropped_sink(dropped: DataFrame) -> None:
        _sink(dropped.unionByName(in_batch_dropped),
              cfg.dropped_path, batch_id)

    try:
        INC.run_shard_dedup(
            uniq, idx,
            kept_sink=kept_sink, dropped_sink=dropped_sink,
            text_col=cfg.text_col, id_col=cfg.id_col,
            k_shingle=cfg.k_shingle, num_hashes=cfg.num_hashes,
            seed=cfg.seed, bands=cfg.bands, threshold=cfg.threshold,
        )
    finally:
        uniq.unpersist()


def _validate_batch(
    cfg: ValidateStage,
    allowed: list[str] | None,
    df: DataFrame,
    batch_id: int,
) -> None:
    kwargs = {} if cfg.vocab_size is None else {"vocab_size": cfg.vocab_size}
    marked = mark_slim(df, cfg.stats, allowed_sources=allowed, **kwargs)
    viol = V.explode_violations(marked).cache()
    try:
        row_counts = df.groupBy("part").agg(
            F.count(F.lit(1)).alias("row_count"))
        checks = [c for c in ALL_CHECKS if c != "unique_doc_id"]
        if cfg.dim is None:
            checks = [c for c in checks if c != "ref_source"]
        verd = V.assemble_verdicts(row_counts, viol, checks)
        _sink(viol, cfg.violation_path, batch_id)
        _sink(verd, cfg.verdict_path, batch_id)
    finally:
        viol.unpersist()


def _score_batch(cfg: ScoreStage, df: DataFrame, batch_id: int) -> None:
    cols = df.columns if cfg.keep_cols is None else cfg.keep_cols
    out = df.select(*cols, cfg.score.alias("anomaly_score"))
    if cfg.threshold is not None:
        out = out.cache()
        try:
            _sink(out, cfg.scored_path, batch_id)
            _sink(out.filter(F.col("anomaly_score") > cfg.threshold),
                  cfg.alert_path, batch_id)
        finally:
            out.unpersist()
    else:
        _sink(out, cfg.scored_path, batch_id)


def stream_pipeline(
    spark: SparkSession,
    input_path: str,
    *,
    schema: T.StructType | str,
    checkpoint_dir: str,
    dedup: DedupStage | None = None,
    validate: ValidateStage | None = None,
    score: ScoreStage | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the composed ingest pipeline; returns the StreamingQuery.

    Stage order is fixed — dedup, then validate, then score — because
    that is the only order with coherent semantics: validating or
    scoring rows that dedup is about to drop wastes work AND pollutes
    verdicts/alerts with rows the corpus never accepts. Pass any
    subset; at least one stage is required.
    """
    if dedup is None and validate is None and score is None:
        raise ValueError("at least one stage (dedup/validate/score) required")

    struct = (
        schema if isinstance(schema, T.StructType)
        else T.StructType.fromDDL(schema)
    )
    reader = (
        spark.readStream.schema(struct)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1000)
        .parquet(input_path)
    )

    allowed = None
    if validate is not None and validate.dim is not None:
        d = validate.dim
        if "active" in d.columns:
            d = d.filter(F.col("active"))
        allowed = sorted(
            r["source"] for r in d.select("source").distinct().collect())

    def tail_stages(df: DataFrame, batch_id: int) -> None:
        if validate is not None:
            _validate_batch(validate, allowed, df, batch_id)
        if score is not None:
            _score_batch(score, df, batch_id)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            if dedup is not None:
                id_type = struct[dedup.id_col].dataType
                _dedup_batch(
                    spark, dedup, batch_df, batch_id, id_type,
                    downstream=lambda kept: tail_stages(kept, batch_id),
                )
            else:
                tail_stages(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    writer = (
        reader.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
