"""Benchmark-contamination detection: exactness, thresholding,
decontamination, DuckDB oracle parity, and plan shape."""

from __future__ import annotations

import contextlib
import io

import duckdb
import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators.contamination import (
    contamination_report,
    decontaminate,
)

BENCH = [
    ("q1", "what is the capital city of france and where is it located"),
    ("q2", "name the largest ocean on the planet earth today please"),
]


def _docs(spark):
    rows = [
        # contains q1 verbatim -> every q1 shingle present -> overlap 1.0
        ("d_exact", "prefix words here what is the capital city of france "
                    "and where is it located suffix words"),
        # shares a 4-word run with q2 -> some 3-shingles, below 0.5
        ("d_partial", "the largest ocean is blue and deep and cold"),
        ("d_clean", "completely unrelated text about spark physical plans"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bench(spark):
    return spark.createDataFrame(BENCH, ["bench_id", "text"])


def test_contamination_flags_and_thresholds(spark):
    rep = contamination_report(
        _docs(spark), _bench(spark), k=3, min_overlap=0.5
    ).collect()
    by_pair = {(r["doc_id"], r["bench_id"]): r for r in rep}

    exact = by_pair[("d_exact", "q1")]
    assert exact["overlap_frac"] == 1.0 and exact["contaminated"]
    # q1 has 12 words -> 10 distinct 3-shingles
    assert exact["bench_n_shingles"] == 10 and exact["n_hits"] == 10

    partial = by_pair[("d_partial", "q2")]
    # shared run "the largest ocean" + ... -> fewer than half the shingles
    assert 0 < partial["n_hits"] < partial["bench_n_shingles"]
    assert not partial["contaminated"]

    # clean doc produces NO report rows (output-bounded join)
    assert not any(r["doc_id"] == "d_clean" for r in rep)


def test_decontaminate_drops_only_flagged(spark):
    docs = _docs(spark)
    rep = contamination_report(docs, _bench(spark), k=3, min_overlap=0.5)
    kept = sorted(r["doc_id"] for r in decontaminate(docs, rep).collect())
    assert kept == ["d_clean", "d_partial"]


def test_clean_corpus_empty_report(spark):
    docs = spark.createDataFrame(
        [("c1", "nothing in common at all"), ("c2", "more unrelated words")],
        ["doc_id", "text"],
    )
    assert contamination_report(docs, _bench(spark), k=3).count() == 0


def test_report_matches_duckdb_oracle(spark, tmp_path):
    """Full-report parity with an independent SQL formulation (string
    shingles — also proves the 64-bit hash join introduced no
    collisions) over the generated documents table."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    # benchmark = excerpts of real docs (guaranteed hits) + a clean item
    bench_rows = [
        (f"b{r['doc_id']}", " ".join(str(r["text"]).split()[2:12]))
        for r in docs.orderBy("doc_id").limit(4).collect()
    ] + [("b_clean", "zz qq xx vv ww yy uu tt ss rr")]
    bench = spark.createDataFrame(bench_rows, ["bench_id", "text"])

    dpath, bpath = f"{tmp_path}/docs.parquet", f"{tmp_path}/bench.parquet"
    docs.write.parquet(dpath)
    bench.write.parquet(bpath)

    got = sorted(
        (
            r["doc_id"], r["bench_id"], r["n_hits"], r["bench_n_shingles"],
            round(r["overlap_frac"], 9), r["contaminated"],
        )
        for r in contamination_report(
            docs, bench, k=3, min_overlap=0.5
        ).collect()
    )

    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    want = sorted(
        tuple(row)
        for row in duckdb.connect().execute(f"""
        WITH dw AS (SELECT doc_id, string_split({norm}, ' ') AS w
                    FROM '{dpath}/*.parquet'),
        dsh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
                FROM dw, unnest(generate_series(1, greatest(len(w) - 2, 1))) t(i)),
        bw AS (SELECT bench_id, string_split({norm}, ' ') AS w
               FROM '{bpath}/*.parquet'),
        bsh AS (SELECT DISTINCT bench_id, array_to_string(w[i:i+2], ' ') AS s
                FROM bw, unnest(generate_series(1, greatest(len(w) - 2, 1))) t(i)),
        sizes AS (SELECT bench_id, count(*) AS n_sh FROM bsh GROUP BY 1),
        hits AS (SELECT d.doc_id, b.bench_id, count(*) AS n_hits
                 FROM dsh d JOIN bsh b USING (s) GROUP BY 1, 2)
        SELECT h.doc_id, h.bench_id, h.n_hits, s.n_sh,
               round(h.n_hits / s.n_sh, 9) AS overlap_frac,
               h.n_hits / s.n_sh >= 0.5 AS contaminated
        FROM hits h JOIN sizes s USING (bench_id)
        """).fetchall()
    )
    assert got == want
    assert len(got) >= 4  # every excerpt found its source doc


def test_plan_broadcasts_bench_and_never_shuffles_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = contamination_report(docs, _bench(spark), k=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rep.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    for bad in ("CartesianProduct", "BatchEvalPython", "SortMergeJoin"):
        assert bad not in plan, f"{bad} in contamination plan"


def test_semantic_contamination_matches_duckdb(spark):
    import numpy as np

    from autoprepad_spark.operators.contamination import (
        semantic_contamination,
    )

    rng = np.random.default_rng(7)
    bench = [(f"b{i}", rng.standard_normal(8).tolist()) for i in range(6)]
    corpus = [(f"d{i}", rng.standard_normal(8).tolist()) for i in range(40)]
    # plant one exact copy and one scaled copy (cos == 1.0 both)
    corpus[3] = ("d3", bench[2][1])
    corpus[7] = ("d7", [2.0 * x for x in bench[5][1]])
    cdf = spark.createDataFrame(corpus, "doc_id string, embedding array<double>")
    bdf = spark.createDataFrame(bench, "bench_id string, embedding array<double>")

    got = {
        r["doc_id"]: r
        for r in semantic_contamination(cdf, bdf, threshold=0.999).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE c (doc_id text, v double[])")
    con.execute("CREATE TABLE b (bench_id text, v double[])")
    con.executemany("INSERT INTO c VALUES (?, ?)", corpus)
    con.executemany("INSERT INTO b VALUES (?, ?)", bench)
    want = con.execute(
        """
        SELECT doc_id, max(list_cosine_similarity(c.v, b.v)) AS mc,
               arg_max(bench_id, list_cosine_similarity(c.v, b.v)) AS nb
        FROM c CROSS JOIN b GROUP BY doc_id
        """
    ).fetchall()
    assert len(want) == len(got) == 40
    for doc_id, mc, nb in want:
        r = got[doc_id]
        assert abs(r["max_cos"] - mc) < 1e-9
        assert r["contaminated"] == (mc >= 0.999)
        if mc >= 0.999 or r["max_cos"] < 0.99:  # skip knife-edge arg ties
            assert r["nearest_bench"] == nb
    assert got["d3"]["contaminated"] and got["d3"]["nearest_bench"] == "b2"
    assert got["d7"]["contaminated"] and got["d7"]["nearest_bench"] == "b5"
    assert sum(r["contaminated"] for r in got.values()) == 2


def test_semantic_contamination_plan_broadcasts_bench(spark):
    from autoprepad_spark.operators.contamination import (
        semantic_contamination,
    )

    cdf = spark.createDataFrame(
        [("d0", [1.0, 0.0])], "doc_id string, embedding array<double>"
    )
    bdf = spark.createDataFrame(
        [("b0", [0.0, 1.0])], "bench_id string, embedding array<double>"
    )
    plan = (
        semantic_contamination(cdf, bdf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Python" not in plan
