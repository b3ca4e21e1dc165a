"""Physical-plan regression checks over the driver queries.

The brief's scale bar is about plan SHAPE, not small-SF timings: a
Cartesian product or a row-at-a-time Python UDF is invisible at
sf0.001 and fatal at 100 TB. These tests build each batch driver query
at sf0.001 and assert the executed plan never contains either. (Arrow
vectorized exchanges — ArrowEvalPython / MapInPandas /
FlatMapGroupsInPandas — are the sanctioned Python path.)
"""

from __future__ import annotations

import contextlib
import io
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

#: queries excluded here: streaming drains (plans are micro-batch
#: internals), and validate_tokens/corpus_pipeline whose suite plan is
#: already asserted operator-by-operator in the suite tests
_PLAN_CHECKED = [
    "dedup_exact",
    "minhash_dedup",
    "dup_clusters",
    "hash_split",
    "mahalanobis_scores",
    "regression_impute",
    "profile_stats",
    "null_profile",
    "robust_flags",
    "flag_totals",
    "scale_impute",
    "no_variance",
    "mode_per_group",
    "percentile_sweep",
    "dim_check",
    "inner_join_agg",
    "uniqueness",
    "ffill",
    "sort_severity",
    "spearman",
    "encoders",
    "charclass_pattern",
    "pairwise_dedup",
    "text_profile",
    "drift_psi",
    "embedding_topk",
    "anomaly_scores",
    "eval_metrics",
    "pr_eval",
    "ensemble_score",
    "pack_sequences",
    "grouped_robust",
    "event_time_ops",
    "profile_rollup",
    "top_terms",
    "stratified_sample",
    "approx_distinct",
    "mergeable_summaries",
    "token_decontam",
    "token_minhash_dedup",
    "token_repetition",
    "custom_checks",
    "multimodal_features",
    "embedding_ann_topk",
]

_FORBIDDEN = (
    "CartesianProduct",   # all-pairs blowup
    "BatchEvalPython",    # row-at-a-time Python UDF (Arrow paths allowed)
)


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", _PLAN_CHECKED)
def test_driver_query_plan_is_scale_safe(spark, name):
    import __spark_entry__ as E

    df = E.queries()[name](spark, SF)
    plan = _plan_of(df)
    for marker in _FORBIDDEN:
        assert marker not in plan, f"{name}: {marker} in physical plan"


def test_scan_is_column_pruned(spark):
    """The fit path must push its column selection into the parquet scan
    (a 16-column lineitem read for a 1-column histogram is wrong)."""
    import __spark_entry__ as E

    df = E.queries()["robust_flags"](spark, SF)
    plan = _plan_of(df)
    scans = [
        seg for seg in plan.split("\n\n") if "Scan parquet" in seg and "lineitem" in seg
    ]
    assert scans, "no lineitem scan found in plan"
    for seg in scans:
        read_schema = [l for l in seg.splitlines() if l.startswith("ReadSchema")]
        assert read_schema, seg
        # flag agg needs exactly the grouped column + the flagged column
        assert "l_extendedprice" in read_schema[0]
        assert "l_comment" not in read_schema[0]
        assert read_schema[0].count(":") <= 3, f"unpruned scan: {read_schema[0]}"
