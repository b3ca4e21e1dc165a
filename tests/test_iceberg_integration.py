"""Real-Iceberg integration for the PartitionedTable contract.

The engine's table layer (sources/tables.py) abstracts an
identity-partitioned table; the sandbox backend is hive-layout parquet
because no Iceberg runtime jar ships in this container and there is no
network to resolve one. This test keeps the Iceberg claims honest
(VERDICT r3 next-round #7): when a spark-runtime jar IS present —
point ICEBERG_SPARK_JAR at it, or drop it into pyspark's jars/ dir —
the test round-trips the exact semantics the engine relies on through
a real hadoop-catalog Iceberg table:

1. identity-partitioned create + append,
2. partition pruning (a part-filtered scan plans only matching files),
3. dynamic partition overwrite (overwritePartitions replaces ONLY the
   partitions present in the incoming frame — the checkpoint-resume /
   replay-idempotence primitive of streaming/validate.py).

It runs in a SUBPROCESS because the jar and catalog must be on the
session's classpath at JVM launch; the shared pytest session can't be
rebuilt. Skipped, with the reason stating the jar is absent, otherwise.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("ICEBERG_SPARK_JAR")
    if env and os.path.exists(env):
        return env
    try:
        import pyspark

        jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        hits = glob.glob(os.path.join(jars_dir, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    except ImportError:
        pass
    hits = glob.glob(
        os.path.expanduser("~/.ivy2/jars/*iceberg-spark-runtime*.jar")
    )
    return hits[0] if hits else None


ICEBERG_JAR = _find_iceberg_jar()

pytestmark = pytest.mark.skipif(
    ICEBERG_JAR is None,
    reason=(
        "no iceberg-spark-runtime jar on this host (no network to resolve "
        "one) — set ICEBERG_SPARK_JAR to run the real-catalog round-trip"
    ),
)


_SCRIPT = textwrap.dedent(
    """
    import sys
    from pyspark.sql import SparkSession, functions as F

    jar, warehouse = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.appName("iceberg-it")
        .master("local[4]")
        .config("spark.jars", jar)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    tbl = "local.db.tokens"

    rows = [(f"doc-{i:04d}", list(range(i % 5 + 1)), i % 5 + 1, "web",
             f"p-{i % 3:03d}") for i in range(300)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, part string"
    )
    # 1. identity-partitioned create + append
    df.writeTo(tbl).partitionedBy(F.col("part")).createOrReplace()
    df.filter(F.col("part") == "p-000").writeTo(tbl).append()
    assert spark.table(tbl).count() == 400, "append"

    # 2. partition pruning: the part predicate must reach the Iceberg scan
    pruned = spark.table(tbl).filter(F.col("part") == "p-001")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "filters=part" in plan.replace(" ", "") or "part=" in plan, plan
    assert pruned.count() == 100, "pruned count"

    # 3. dynamic partition overwrite: only p-000 is replaced
    repl = spark.createDataFrame(
        [("doc-new", [1, 2], 2, "web", "p-000")],
        "doc_id string, tokens array<int>, n_tok int, source string, part string",
    )
    repl.writeTo(tbl).overwritePartitions()
    got = {
        r["part"]: r["n"]
        for r in spark.table(tbl).groupBy("part").agg(F.count("*").alias("n")).collect()
    }
    assert got == {"p-000": 1, "p-001": 100, "p-002": 100}, got

    # snapshot history exists (time travel surface)
    n_snaps = spark.sql(f"SELECT count(*) FROM {tbl}.snapshots").collect()[0][0]
    assert n_snaps >= 3, n_snaps
    print("ICEBERG-OK")
    """
)


def test_iceberg_partitioned_roundtrip(tmp_path):
    p = subprocess.run(
        [sys.executable, "-c", _SCRIPT, ICEBERG_JAR, str(tmp_path / "wh")],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert "ICEBERG-OK" in p.stdout, p.stdout + p.stderr
