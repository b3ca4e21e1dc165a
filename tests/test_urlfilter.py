"""URL/domain source-gate: DuckDB-oracle parity + plan shape.

Oracle discipline matches tests/test_pii.py: the extraction regexes are
shared VERBATIM (RE2-compatible subset) between Spark and DuckDB; the
blocklist's suffix semantics ("host is the domain or a subdomain of
it") are re-expressed in the oracle as the quadratic-but-exact
``host = domain OR host LIKE '%.' || domain`` join, which the scalable
exploded-suffix equi-join must reproduce row-for-row.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators import urlfilter as U

URLS = [
    (0, "https://www.example.com/a/b?q=1"),
    (1, "http://sub.deep.example.com/page"),          # subdomain of blocked
    (2, "https://EXAMPLE.com:8080/UPPER"),             # case + port
    (3, "https://user:pw@ok-site.org/path"),           # userinfo
    (4, "ftp://files.ok-site.org/x"),                  # bad scheme
    (5, "https://casino-fun.net/win-big-casino"),      # substring rule
    (6, "https://ok-site.org/article?ref=poker"),      # substring in query
    (7, "notaurl"),                                    # no scheme
    (8, "https://localhost/admin"),                    # single-label host
    (9, None),                                         # null url
    (10, "https://a.b.c.d.e.example.com/deep"),        # > MAX_SUFFIX_LABELS
    (11, "https://goodexample.com/x"),                 # NOT a subdomain match
    (12, "https://ok-site.org/clean"),
]

BLOCKED = ["example.com", "spam.io"]
BAD_SUBSTRINGS = ["casino", "poker"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(URLS, ["doc_id", "url"])


def _oracle(con):
    import re as _re

    con.execute("CREATE OR REPLACE TABLE urls AS SELECT * FROM df")
    con.execute(
        "CREATE OR REPLACE TABLE blocked AS "
        + " UNION ALL ".join(f"SELECT '{d}' AS domain" for d in BLOCKED)
    )
    alt = "|".join(_re.escape(s) for s in BAD_SUBSTRINGS)
    scheme_re = U.URL_PATTERNS["scheme"]
    host_re = U.URL_PATTERNS["host"]
    return con.execute(
        f"""
        WITH parts AS (
          SELECT doc_id, url,
                 lower(regexp_extract(url, '{scheme_re}', 1)) AS scheme,
                 regexp_replace(
                   lower(regexp_extract(url, '{host_re}', 1)),
                   '^www\\.', '') AS host
          FROM urls
        ), flags AS (
          SELECT doc_id,
                 coalesce(scheme NOT IN ('http','https'), TRUE) AS bad_scheme,
                 coalesce(regexp_matches(lower(url), '{alt}'), FALSE)
                   AS bad_url_substring,
                 EXISTS (SELECT 1 FROM blocked b
                         WHERE parts.host = b.domain
                            OR parts.host LIKE '%.' || b.domain)
                   AS blocked_domain
          FROM parts
        )
        SELECT doc_id, bad_scheme, blocked_domain, bad_url_substring,
               NOT (bad_scheme OR blocked_domain OR bad_url_substring)
                 AS url_keep
        FROM flags ORDER BY doc_id
        """
    ).fetchall()


def test_url_filter_matches_duckdb_oracle(spark, docs):
    blocked = spark.createDataFrame([(d,) for d in BLOCKED], ["domain"])
    flagged = U.url_filter(
        docs,
        blocked_domains=blocked,
        blocked_substrings=BAD_SUBSTRINGS,
        keep=False,
    )
    got = {
        r["doc_id"]: (
            r["bad_scheme"],
            r["blocked_domain"],
            r["bad_url_substring"],
            r["url_keep"],
        )
        for r in flagged.collect()
    }
    con = duckdb.connect()
    con.register("df", docs.toPandas())
    want = {r[0]: tuple(r[1:]) for r in _oracle(con)}
    assert got == want
    # engineered expectations (guard the oracle itself)
    assert want[0][1] and want[1][1] and want[2][1] and want[10][1]
    assert not want[11][1]                       # goodexample.com ≠ subdomain
    assert want[4][0] and want[7][0] and want[9][0]
    assert want[5][2] and want[6][2]
    assert want[12] == (False, False, False, True)

    survivors = {r["doc_id"] for r in U.url_filter(
        docs, blocked_domains=blocked, blocked_substrings=BAD_SUBSTRINGS
    ).select("doc_id").collect()}
    assert survivors == {d for d, f in want.items() if f[3]}


def test_url_report_counts(spark, docs):
    blocked = spark.createDataFrame([(d,) for d in BLOCKED], ["domain"])
    flagged = U.url_filter(
        docs, blocked_domains=blocked,
        blocked_substrings=BAD_SUBSTRINGS, keep=False,
    )
    r = U.url_report(flagged).collect()[0]
    assert r["n_docs"] == len(URLS)
    assert r["n_bad_scheme"] == 3                 # ftp, notaurl, null
    assert r["n_blocked_domain"] == 4             # docs 0,1,2,10
    assert r["n_bad_url_substring"] == 2
    assert r["n_dropped"] == len(URLS) - 4        # survivors: 3,8,11,12


def test_domain_suffixes_shape(spark):
    df = spark.createDataFrame(
        [(1, "https://a.b.c.d.e.example.com/x"), (2, "https://localhost/")],
        ["i", "url"],
    )
    out = {r["i"]: r["s"] for r in df.select(
        "i", U.domain_suffixes("url").alias("s")).collect()}
    # shortest-first suffix chain capped at 4 labels, plus the full host
    assert out[1] == [
        "example.com",
        "e.example.com",
        "d.e.example.com",
        "a.b.c.d.e.example.com",
    ]
    assert out[2] == ["localhost"]


@pytest.fixture()
def aqe_defaults(spark):
    """Pin every conf the AQE SMJ->BHJ conversion depends on.

    The shared pytest session accumulates conf state from ~300 earlier
    tests; this assertion is about AQE's runtime-size conversion, not
    about whatever thresholds a previous module happened to leave
    behind. nonEmptyPartitionRatioForBroadcastJoin is pinned to 0
    because DynamicJoinSelection DEMOTES a broadcast candidate whose
    shuffle output has <20% non-empty partitions — with 8 shuffle
    partitions and a handful of blocklist hits the ratio sits exactly
    at that boundary, which is a demotion-heuristic coin flip, not the
    property under test."""
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "10485760b",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "10485760b",
        "spark.sql.adaptive.nonEmptyPartitionRatioForBroadcastJoin": "0.0",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_blocklist_join_resolves_to_broadcast(spark, docs, aqe_defaults):
    """A dimension-sized blocklist must never leave the corpus in a
    sort-merge join: the suffix join broadcasts statically (blocklist is
    a known-small dim) and the hit join-back — statically unknown-sized,
    output-bounded by true blocklist hits — must be converted to a
    broadcast hash join by AQE at runtime, so the final adaptive plan
    contains no SortMergeJoin."""
    blocked = spark.createDataFrame([(d,) for d in BLOCKED], ["domain"])
    out = U.url_filter(docs, blocked_domains=blocked, keep=False)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final_plan = plan.split("== Initial Plan ==")[0]  # AQE result only
    assert "SortMergeJoin" not in final_plan
    assert "BroadcastHashJoin" in final_plan
