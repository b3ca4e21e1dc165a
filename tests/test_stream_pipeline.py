"""Composed streaming pipeline (streaming/pipeline.py): dedup ->
validate -> score in one foreachBatch over one checkpoint.

Pins the three seams the standalone-face tests cannot: (1) validators
and scorer see ONLY dedup survivors; (2) a full replay (fresh
checkpoint, same files) leaves EVERY composed sink — kept, dropped,
index, verdicts, violations, scored, alerts — row-for-row identical
(dynamic partition overwrite across the whole pipeline); (3) a restart
with the checkpoint intact is a no-op until new files arrive, and then
processes only them.
"""

from __future__ import annotations

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from autoprepad_spark.operators import incremental as INC
from autoprepad_spark.operators.profile import global_stats
from autoprepad_spark.streaming.pipeline import (
    DedupStage,
    ScoreStage,
    ValidateStage,
    stream_pipeline,
)
from autoprepad_spark.streaming.validate import seed_index

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
    T.StructField("part", T.StringType()),
])


def _mk_text(i, n=40):
    rng = np.random.default_rng([29, i])
    return " ".join(f"w{v}" for v in rng.integers(0, 500, n))


def _doc(did, text, n_tok, part="p-0"):
    return (did, text, list(range(1, n_tok + 1)), n_tok, "web", part)


HIST = [(f"h{i:02d}", _mk_text(i)) for i in range(10)]
FILE1 = [
    _doc("d200", HIST[3][1], 50),            # exact dup of history -> drop
    _doc("d201", _mk_text(101), 50),          # intra-batch exact pair:
    _doc("d202", _mk_text(101), 50),          #   keep-first d201, drop d202
    _doc("d203", _mk_text(102), 80, "p-1"),   # fresh, scores over threshold
]
FILE2 = [
    _doc("d300", _mk_text(102) + " tail", 40),  # near dup of kept d203
    _doc("d301", _mk_text(103), 55, "p-1"),     # fresh
    # fresh survivor that VIOLATES len_mismatch (10 tokens, n_tok=30):
    # exercises the violations sink through the replay assertions
    ("d302", _mk_text(105), list(range(1, 11)), 30, "web", "p-0"),
]


@pytest.fixture()
def paths(tmp_path):
    return {k: str(tmp_path / k) for k in
            ("inp", "idx", "kept", "drop", "ckpt",
             "verd", "viol", "scored", "alerts")}


def _stages(spark, paths, stats):
    return dict(
        dedup=DedupStage(index_path=paths["idx"], kept_path=paths["kept"],
                         dropped_path=paths["drop"]),
        validate=ValidateStage(stats=stats, verdict_path=paths["verd"],
                               violation_path=paths["viol"]),
        score=ScoreStage(score=F.col("n_tok").cast("double"),
                         scored_path=paths["scored"],
                         alert_path=paths["alerts"], threshold=60.0),
    )


def _drain(spark, paths, stats):
    q = stream_pipeline(
        spark, paths["inp"], schema=SCHEMA,
        checkpoint_dir=paths["ckpt"], max_files_per_trigger=1,
        **_stages(spark, paths, stats),
    )
    q.awaitTermination(180)


def _snapshot(spark, paths):
    out = {}
    for k in ("idx", "kept", "drop", "verd", "viol", "scored", "alerts"):
        df = spark.read.parquet(paths[k])
        out[k] = sorted(
            tuple(str(v) for v in row)
            for row in df.collect()
        )
    return out


@pytest.fixture(scope="module")
def stats(spark):
    from autoprepad_spark.datagen import generate_tokens

    return global_stats(generate_tokens(spark, 20_000, seed=11, n_parts=4))


def test_composed_pipeline_and_replay(spark, paths, stats):
    seed_index(
        INC.build_dedup_index(spark.createDataFrame(HIST, "doc_id string, text string")),
        paths["idx"])

    # batch 0
    spark.createDataFrame(FILE1, SCHEMA).coalesce(1).write.mode(
        "append").parquet(paths["inp"])
    _drain(spark, paths, stats)
    # batch 1
    spark.createDataFrame(FILE2, SCHEMA).coalesce(1).write.mode(
        "append").parquet(paths["inp"])
    _drain(spark, paths, stats)

    kept = {r["doc_id"] for r in spark.read.parquet(paths["kept"]).collect()}
    dropped = {r["doc_id"]: r["reason"]
               for r in spark.read.parquet(paths["drop"]).collect()}
    assert kept == {"d201", "d203", "d301", "d302"}
    assert dropped == {"d200": "exact", "d202": "exact_in_batch",
                       "d300": "near"}
    viol = spark.read.parquet(paths["viol"])
    assert {(r["doc_id"], r["check_name"]) for r in viol.collect()} >= {
        ("d302", "len_mismatch")}

    # (1) downstream stages saw ONLY survivors
    scored = spark.read.parquet(paths["scored"])
    assert {r["doc_id"] for r in scored.collect()} == kept
    alerts = {r["doc_id"] for r in spark.read.parquet(paths["alerts"]).collect()}
    assert alerts == {"d203"}  # the one survivor with n_tok > 60
    verd = spark.read.parquet(paths["verd"])
    # verdict row counts = survivors per (batch, part), never arrivals
    rc = {(r["ingest_batch"], r["part"]): r["row_count"]
          for r in verd.select("ingest_batch", "part", "row_count")
          .distinct().collect()}
    assert rc == {(0, "p-0"): 1, (0, "p-1"): 1,
                  (1, "p-0"): 1, (1, "p-1"): 1}
    # uniqueness is excluded by design on a file subset
    assert verd.filter(F.col("check_name") == "unique_doc_id").count() == 0

    # (2) FULL REPLAY: wipe the checkpoint, re-drain the same files —
    # every composed sink must come out row-for-row identical (dynamic
    # partition overwrite, same batch numbering from the fresh log)
    before = _snapshot(spark, paths)
    shutil.rmtree(paths["ckpt"])
    _drain(spark, paths, stats)
    assert _snapshot(spark, paths) == before

    # (3) restart with checkpoint intact: no new files -> no-op
    _drain(spark, paths, stats)
    assert _snapshot(spark, paths) == before
    # a new file is processed as exactly one new batch
    extra = [_doc("d400", _mk_text(104), 45)]
    spark.createDataFrame(extra, SCHEMA).coalesce(1).write.mode(
        "append").parquet(paths["inp"])
    _drain(spark, paths, stats)
    after = {r["doc_id"] for r in spark.read.parquet(paths["kept"]).collect()}
    assert after == kept | {"d400"}
    assert spark.read.parquet(paths["scored"]).filter(
        F.col("doc_id") == "d400").count() == 1


def test_stage_guards(spark, paths, stats):
    with pytest.raises(ValueError, match="at least one stage"):
        stream_pipeline(spark, paths["inp"], schema=SCHEMA,
                        checkpoint_dir=paths["ckpt"])
    with pytest.raises(ValueError, match="together"):
        ScoreStage(score=F.lit(0.0), scored_path="x", threshold=1.0)


def test_validate_only_pipeline_matches_stream_validate(spark, tmp_path, stats):
    """A single-stage pipeline is the standalone face with the hardened
    sink: same verdicts as stream_validate on the same input."""
    from autoprepad_spark.datagen import generate_tokens
    from autoprepad_spark.streaming.validate import stream_validate

    base = generate_tokens(spark, 8_000, seed=13, n_parts=4)
    inp = str(tmp_path / "vin")
    base.write.mode("overwrite").parquet(inp)

    q = stream_pipeline(
        spark, inp, schema=base.schema,
        checkpoint_dir=str(tmp_path / "ck1"),
        validate=ValidateStage(stats=stats,
                               verdict_path=str(tmp_path / "v1"),
                               violation_path=str(tmp_path / "x1")),
    )
    q.awaitTermination(120)
    q2 = stream_validate(
        spark, inp, stats=stats,
        checkpoint_dir=str(tmp_path / "ck2"),
        verdict_path=str(tmp_path / "v2"),
        violation_path=str(tmp_path / "x2"))
    q2.awaitTermination(120)

    a = sorted(tuple(str(v) for v in r) for r in spark.read.parquet(
        str(tmp_path / "v1")).drop("ingest_batch").collect())
    b = sorted(tuple(str(v) for v in r) for r in spark.read.parquet(
        str(tmp_path / "v2")).drop("batch_id").collect())
    assert a == b
