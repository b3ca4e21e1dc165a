"""Constraint suggestion + snapshot diff (operators/suggest.py).

The reference fits thresholds but never emits reusable constraints;
suggest_checks is the Deequ-style profile-to-constraints loop. Tests
pin:

* the suggestion set + parameters against a DuckDB oracle computing the
  same stats EXACTLY (null counts, domains, min/max) on the same
  parquet;
* the loop property: every suggested check passes on the data it was
  suggested from, and catches a targeted corruption of each kind;
* ValidationSuite integration (suggested checks ride the marking scan
  and produce verdicts);
* the pass-2 guard: a domain that exceeds domain_max loses its isin
  suggestion instead of collecting unbounded values;
* snapshot determinism across parallelism and snapshot_diff's change
  taxonomy against a hand-built expectation.
"""

from __future__ import annotations

import json

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from autoprepad_spark.operators.suggest import (
    SuggestConfig,
    column_profile,
    snapshot_diff,
    suggest_checks,
    to_custom_checks,
)


@pytest.fixture(scope="module")
def frame_path(spark, tmp_path_factory):
    rows = []
    for i in range(1200):
        rows.append(Row(
            id=f"doc-{i:06d}",                       # unique, no nulls
            source=["web", "book", "code", "wiki", "chat"][i % 5],
            label=["a'b", "c", "d"][i % 3],          # quote-escaping domain
            grade=None if i % 10 == 7 else (i % 3) + 1,
            score=(i % 600) * 0.5 - 25.0,            # 600 distinct, negatives
            wide=f"v-{i % 20:04d}",                  # 20 distinct: gated in,
                                                     # over domain_max=16
            ghost=None,                              # all-null string column
            free=f"text {i * 2654435761 % 2**32}",   # high cardinality
        ))
    p = str(tmp_path_factory.mktemp("suggest") / "frame.parquet")
    spark.createDataFrame(
        rows,
        schema="id string, source string, label string, grade int, "
               "score double, wide string, ghost string, free string",
    ).repartition(8).write.mode("overwrite").parquet(p)
    return p


@pytest.fixture(scope="module")
def frame(spark, frame_path):
    return spark.read.parquet(frame_path)


@pytest.fixture(scope="module")
def suggestions(frame):
    return suggest_checks(
        frame, config=SuggestConfig(domain_max=16, domain_slack=2.0)
    ).collect()


def _by(suggestions, column, kind):
    hits = [s for s in suggestions if s["column"] == column and s["kind"] == kind]
    return hits[0] if hits else None


def test_suggestions_vs_duckdb(frame_path, suggestions):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{frame_path}/*.parquet')")
    stats = {}
    for c in ["id", "source", "label", "grade", "score", "wide", "ghost", "free"]:
        n, nn, d = con.execute(
            f'SELECT count(*), count("{c}"), count(DISTINCT "{c}") FROM t'
        ).fetchone()
        stats[c] = (n, nn, d)

    # not_null exactly for the zero-null columns
    expect_not_null = {c for c, (n, nn, _) in stats.items() if n == nn}
    got_not_null = {s["column"] for s in suggestions if s["kind"] == "not_null"}
    assert got_not_null == expect_not_null == {"id", "source", "label",
                                              "score", "wide", "free"}

    # null_rate_max for the nullable ones, ceiling = rate * 1.5
    for c in ["grade", "ghost"]:
        s = _by(suggestions, c, "null_rate_max")
        n, nn, _ = stats[c]
        want = min(1.0, (n - nn) / n * 1.5)
        assert abs(json.loads(s["params"])["max_rate"] - want) < 1e-9

    # unique: id only (free is also unique by construction — allow it)
    uniq = {s["column"] for s in suggestions if s["kind"] == "unique"}
    assert "id" in uniq and "free" in uniq
    assert not uniq & {"source", "label", "grade", "score", "wide", "ghost"}

    # isin domains match DuckDB exactly (sorted), including quote escape
    for c in ["source", "label", "grade"]:
        s = _by(suggestions, c, "isin")
        dom = [r[0] for r in con.execute(
            f'SELECT DISTINCT CAST("{c}" AS VARCHAR) FROM t '
            f'WHERE "{c}" IS NOT NULL ORDER BY 1').fetchall()]
        assert s is not None, c
        assert s["evidence"] == "domain=[" + ", ".join(dom) + "]"
        assert json.loads(s["params"])["domain_size"] == len(dom)
    # wide has 20 > domain_max=16 distinct: gated into pass 2 by the
    # estimate, rejected by the exact cap
    assert _by(suggestions, "wide", "isin") is None
    assert _by(suggestions, "free", "isin") is None
    assert _by(suggestions, "ghost", "isin") is None

    # numeric range/non_negative from exact min/max
    gmin, gmax = con.execute("SELECT min(grade), max(grade) FROM t").fetchone()
    smin, smax = con.execute("SELECT min(score), max(score) FROM t").fetchone()
    g = json.loads(_by(suggestions, "grade", "range")["params"])
    assert (g["min"], g["max"]) == (gmin, gmax)
    sc = json.loads(_by(suggestions, "score", "range")["params"])
    assert (sc["min"], sc["max"]) == (smin, smax)
    assert _by(suggestions, "grade", "non_negative") is not None
    assert _by(suggestions, "score", "non_negative") is None  # has negatives


def test_suggested_checks_hold_then_catch(spark, frame, suggestions):
    checks = to_custom_checks(suggestions)
    assert checks, "no compilable checks"
    # the loop property, per verdict rule: HARD checks have zero
    # violations on their source data; SOFT (statistical) checks stay
    # under the ceiling the suggestion itself proposed
    n = frame.count()
    flags = dict(zip(
        [c.name for c in checks],
        frame.select(*[c.flag_col().alias(c.name) for c in checks])
        .groupBy().sum().collect()[0]))
    ceilings = {f"sugg_{s['kind']}_{s['column']}":
                json.loads(s["params"]).get("max_rate")
                for s in suggestions}
    for c in checks:
        if c.hard:
            assert flags[c.name] == 0, (c.name, flags[c.name])
        elif ceilings.get(c.name) is not None:
            assert flags[c.name] / n <= ceilings[c.name], c.name

    # one corruption per kind is caught by the matching check
    bad = spark.createDataFrame(
        [Row(id=None, source="zzz", label="x", grade=-7, score=1e9,
             wide="v-0001", ghost=None, free="t")],
        schema=frame.schema)
    bflags = {c.name: v for c, v in zip(
        checks,
        bad.select(*[c.flag_col().alias(c.name) for c in checks])
        .collect()[0])}
    assert bflags["sugg_not_null_id"] == 1
    assert bflags["sugg_isin_source"] == 1
    assert bflags["sugg_isin_grade"] == 1
    assert bflags["sugg_non_negative_grade"] == 1
    assert bflags["sugg_range_score"] == 1


def test_suite_integration(spark, tokens_df, dim_df):
    """Suggest on the token table's light columns, run the suite with
    the compiled checks: suggestions hold, so every sugg_* verdict
    passes; the statistical `range` check is soft by construction."""
    from autoprepad_spark import ValidationSuite

    sugg = suggest_checks(tokens_df, cols=["source", "n_tok"])
    checks = to_custom_checks(sugg)
    res = ValidationSuite(custom_checks=checks).run(tokens_df, dim=dim_df)
    v = res.verdicts.filter(F.col("check_name").startswith("sugg_"))
    rows = v.collect()
    assert rows and all(r["status"] == "pass" for r in rows)
    names = {r["check_name"] for r in rows}
    assert "sugg_isin_source" in names
    res.unpersist()


def test_fd_discovery_vs_duckdb(spark, frame_path, frame):
    from autoprepad_spark.operators.suggest import suggest_fds

    got = {(r["determinant"], r["dependent"]):
           (r["n_groups"], r["violating_groups"], r["holds"], r["checked"])
           for r in suggest_fds(
               frame, max_determinant_distinct=700).collect()}
    # id is near-unique (excluded as determinant by the distinct cap);
    # ghost is all-null (no groups once null determinants drop)
    assert not [k for k in got if k[0] in ("id", "free")]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{frame_path}/*.parquet')")
    for (a, b), (n_groups, viol, holds, checked) in got.items():
        if a == "ghost":
            continue
        en, ev = con.execute(f'''
            SELECT count(*), sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)
            FROM (SELECT "{a}", count(DISTINCT "{b}") AS nb FROM t
                  WHERE "{a}" IS NOT NULL GROUP BY 1)''').fetchone()
        if checked:
            assert (n_groups, viol) == (en, int(ev)), (a, b)
            assert holds == (viol == 0)
        else:
            # cardinality-pruned from the profile alone: the exact
            # check must agree the FD cannot hold
            assert (n_groups, viol, holds) == (None, None, False), (a, b)
            assert int(ev) > 0, (a, b)
    # the large-dependent pair with a null-free determinant is settled
    # without a data pass; grade (which HAS nulls) must NOT be pruned —
    # the distinct(B) <= distinct(A) argument needs a null-free
    # determinant, so its large-dependent pairs are measured for real
    assert got[("source", "id")][3] is False
    assert got[("grade", "score")][3] is True
    assert got[("grade", "id")][3] is True
    # structural spot checks: i%5 source determines nothing about
    # i%3 label (gcd 1 -> every source sees all labels), while every
    # column trivially determines the all-null ghost (nb = 0 groups)
    assert got[("source", "label")][2] is False
    assert got[("source", "ghost")][2] is True
    # grade (i%3 over non-null rows) maps 1:1 onto label (i%3)? No:
    # grade nulls at i%10==7 but label still cycles -> grade g sees
    # label values from all i with i%3==g-1 -> exactly one label value.
    assert got[("grade", "label")] == (3, 0, True, True)


def test_fd_explicit_pairs_and_errors(spark, frame):
    from autoprepad_spark.operators.suggest import suggest_fds

    rows = suggest_fds(frame, pairs=[("source", "label")]).collect()
    assert len(rows) == 1 and rows[0]["determinant"] == "source"
    with pytest.raises(ValueError, match="missing column"):
        suggest_fds(frame, pairs=[("source", "nope")])
    # a violation tolerance disables cardinality pruning (the
    # distinct(B) <= distinct(A) argument only binds at rate 0), so the
    # large-dependent pair gets a real measured rate
    r = suggest_fds(frame, pairs=[("source", "id")],
                    max_violation_rate=0.5).collect()[0]
    assert r["checked"] is True and r["fd_rate"] == 1.0 and r["holds"] is False


def test_fd_null_determinant_not_pruned_unsoundly(spark):
    """The review scenario: most rows have a NULL determinant carrying
    distinct dependents, so the GLOBAL distinct(B) estimate dwarfs
    distinct(A) — yet the FD holds over the non-null-A rows. Pruning on
    the global estimate would wrongly settle holds=false."""
    from autoprepad_spark.operators.suggest import suggest_fds

    rows = [Row(a=None, b=f"doc-{i}") for i in range(990)]
    rows += [Row(a="x", b="c"), Row(a="y", b="c")] * 5
    df = spark.createDataFrame(rows, schema="a string, b string")
    r = suggest_fds(df, pairs=[("a", "b")]).collect()[0]
    assert r["checked"] is True and r["holds"] is True
    assert (r["n_groups"], r["violating_groups"]) == (2, 0)


def test_fd_vacuous_and_empty_pairs_get_rows(spark, frame):
    """An all-null determinant (no groups at any tolerance) still gets
    an explicit vacuous verdict instead of vanishing."""
    from autoprepad_spark.operators.suggest import suggest_fds

    rows = suggest_fds(frame, pairs=[("ghost", "source")],
                       max_violation_rate=0.1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["checked"] is True and r["holds"] is True and r["n_groups"] == 0


def test_nan_column_yields_no_unparseable_suggestions(spark):
    """NaN min/max (float columns sort NaN greatest) must not leak into
    range/isin SQL or params JSON."""
    rows = [Row(v=float(i % 3), w=float(i)) for i in range(50)]
    rows.append(Row(v=float("nan"), w=float("nan")))
    df = spark.createDataFrame(rows, schema="v double, w double")
    sugg = suggest_checks(df).collect()
    kinds = {(s["column"], s["kind"]) for s in sugg}
    assert ("v", "range") not in kinds and ("w", "range") not in kinds
    assert ("v", "isin") not in kinds  # NaN in the small domain
    for s in sugg:
        json.loads(s["params"])  # every params blob stays valid JSON
    # and every compiled check still parses/evaluates
    checks = to_custom_checks(sugg)
    if checks:
        df.select(*[c.flag_col().alias(c.name) for c in checks]).collect()


def test_non_identifier_column_names_compile(spark):
    """Columns like 'user-id' must produce suite-legal check names while
    predicates keep the real name via backticks."""
    from autoprepad_spark.operators.marking import validate_custom_checks

    df = spark.createDataFrame(
        [Row(**{"user-id": f"u{i}", "n tok": i % 5}) for i in range(100)],
        schema="`user-id` string, `n tok` int")
    checks = to_custom_checks(suggest_checks(df))
    assert checks
    validate_custom_checks(checks)  # would raise on a bad name
    flags = df.select(*[c.flag_col().alias(c.name) for c in checks]
                      ).groupBy().sum().collect()[0]
    hard = {c.name for c in checks if c.hard}
    for c, v in zip(checks, flags):
        if c.name in hard:
            assert v == 0, c.name


def test_suggested_null_ceiling_rides_into_suite(spark, dim_df):
    """A 30%-null column exceeds the suite-global 10% statistical
    ceiling; the suggested per-check ceiling (rate x headroom) must
    travel through to_custom_checks so the compiled check still passes
    on its source data."""
    from autoprepad_spark import ValidationSuite
    from autoprepad_spark.datagen import generate_tokens

    tokens = generate_tokens(spark, 20_000, seed=11, n_parts=4)
    # graft a 30%-null extra column onto the token schema
    tokens = tokens.withColumn(
        "aux", F.when(F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 3, None)
        .otherwise(F.lit("v")))
    sugg = suggest_checks(tokens, cols=["aux"])
    checks = to_custom_checks(sugg)
    null_check = [c for c in checks if c.name == "sugg_null_rate_max_aux"][0]
    assert null_check.stat_max_rate is not None
    assert 0.3 < null_check.stat_max_rate < 0.5
    res = ValidationSuite(custom_checks=checks).run(tokens, dim=dim_df)
    v = res.verdicts.filter(
        F.col("check_name") == "sugg_null_rate_max_aux").collect()
    assert v and all(r["status"] == "pass" for r in v)
    # sanity: the observed rate really does exceed the global ceiling
    assert all(r["metric"] > 0.1 for r in v)
    res.unpersist()


def test_runner_checks_from_persisted_suggestions(
        spark, tokens_df, dim_df, tmp_path):
    """The production loop: suggest once, persist the suggestion frame,
    later runs load it via --checks-from and validate forever after."""
    from autoprepad_spark import runner

    tok = str(tmp_path / "tok.parquet")
    dim = str(tmp_path / "dim.parquet")
    sugg = str(tmp_path / "sugg.parquet")
    out = str(tmp_path / "out")
    tokens_df.write.parquet(tok)
    dim_df.write.parquet(dim)
    suggest_checks(tokens_df, cols=["source", "n_tok"]).write.parquet(sugg)

    rc = runner.main([
        "--input", tok, "--dim", dim, "--output", out,
        "--run-id", "sugg-run", "--checks-from", sugg,
    ])
    # rc=2: the generated table carries INJECTED violations that the
    # built-in checks rightly fail on; the suggested checks must pass
    assert rc == 2
    v = spark.read.parquet(out + "/verdicts").filter(
        F.col("check_name").startswith("sugg_"))
    rows = v.collect()
    assert rows and all(r["status"] == "pass" for r in rows)
    assert {r["check_name"] for r in rows} >= {"sugg_isin_source",
                                               "sugg_not_null_source"}


def test_snapshot_parallelism_independent(spark, frame):
    a = column_profile(frame.repartition(2)).collect()
    b = column_profile(frame.repartition(13)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_profile_from_precomputed_snapshot(frame):
    prof = column_profile(frame)
    direct = suggest_checks(frame).collect()
    via = suggest_checks(frame, profile=prof).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via))


def test_snapshot_diff_taxonomy(spark):
    old_rows = [Row(k=f"k{i}", gone=1.0 * i, typed=i, num=float(i % 50),
                    nullable="x" if i % 100 else None)
                for i in range(1000)]
    # new: `gone` dropped, `added` new, `typed` int->string, `num` escapes
    # bounds, `nullable` null rate jumps 0.01 -> 0.2, rows 3x
    new_rows = [Row(k=f"k{i % 400}", typed=str(i), num=float(i % 80) - 5.0,
                    nullable="x" if i % 5 else None, added=i)
                for i in range(3000)]
    old = column_profile(spark.createDataFrame(
        old_rows,
        schema="k string, gone double, typed int, num double, nullable string"))
    new = column_profile(spark.createDataFrame(
        new_rows,
        schema="k string, typed string, num double, nullable string, added int"))
    d = snapshot_diff(old, new)
    got = {(r["column"], r["kind"]) for r in d.collect()}
    assert ("gone", "column_removed") in got
    assert ("added", "column_added") in got
    assert ("typed", "type_changed") in got
    assert ("num", "bounds_escape") in got
    assert ("nullable", "null_rate_shift") in got
    assert ("*", "row_count_shift") in got
    # k: 1000 unique of 1000 -> 400 unique of 3000 = density 1.0 -> 0.133
    assert ("k", "distinct_density_shift") in got
    # no spurious kinds for unchanged-distribution columns
    assert not [k for k in got if k[0] == "num" and k[1] not in
                ("bounds_escape",)]


def test_snapshot_diff_identity(frame):
    prof = column_profile(frame)
    d = snapshot_diff(prof, prof).collect()
    assert d == []


# ---------------------------------------------------------------------------
# hypothesis: the hold property under adversarial values
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_cell = st.one_of(
    st.none(),
    st.text(min_size=0, max_size=12),  # includes quotes/backticks/unicode
)
_num = st.one_of(
    st.none(),
    st.integers(min_value=-10**9, max_value=10**9).map(float),
    st.floats(allow_nan=True, allow_infinity=True, width=32),
)


@given(st.lists(st.tuples(_cell, _num, _num), min_size=1, max_size=30))
@settings(max_examples=12, deadline=None)
def test_hold_property_fuzz(spark, rows):
    """For ANY frame, every suggested HARD check has zero violations on
    the frame it was suggested from, and every params blob is valid
    JSON — across quotes, backslashes, unicode, NaN/inf, nulls, AND a
    FloatType column (the float->string->literal round-trip that broke
    isin domains before the double-widening fix)."""
    df = spark.createDataFrame(rows, schema="s string, x double, f float")
    sugg = suggest_checks(df).collect()
    for r in sugg:
        json.loads(r["params"])
    checks = to_custom_checks(sugg)
    hard = [c for c in checks if c.hard]
    if not hard:
        return
    flags = df.select(*[c.flag_col().alias(c.name) for c in hard]
                      ).groupBy().sum().collect()[0]
    assert all((v or 0) == 0 for v in flags), dict(
        zip([c.name for c in hard], flags))


# ---------------------------------------------------------------------------
# grouped suggestion
# ---------------------------------------------------------------------------

def _grouped_frame(spark):
    rows = []
    for i in range(900):
        g = ["alpha", "beta", "gamma"][i % 3]
        base = {"alpha": 0, "beta": 1000, "gamma": 5000}[g]
        rows.append(Row(
            grp=g,
            val=float(base + i % 100),
            maybe=None if (g == "beta" and i % 5 == 0) else float(i),
        ))
    return spark.createDataFrame(rows, schema="grp string, val double, maybe double")


def test_grouped_stats_vs_duckdb(spark, tmp_path):
    from autoprepad_spark.operators.suggest import suggest_grouped_checks

    df = _grouped_frame(spark)
    p = str(tmp_path / "g.parquet")
    df.write.parquet(p)
    got = {(r["group"], r["column"], r["kind"]): json.loads(r["params"])
           for r in suggest_grouped_checks(df, "grp", ["val", "maybe"]).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}/*.parquet')")
    for g, c in [(g, c) for g in ("alpha", "beta", "gamma")
                 for c in ("val", "maybe")]:
        lo, hi, n, nn = con.execute(
            f'SELECT min("{c}"), max("{c}"), count(*), count("{c}") '
            f"FROM t WHERE grp = '{g}'").fetchone()
        assert got[(g, c, "grp_range")] == {"min": lo, "max": hi}
        assert abs(got[(g, c, "grp_null_rate")]["rate"] - (n - nn) / n) < 1e-9


def test_grouped_catches_cross_group_outlier(spark):
    """The discriminating case: 5050.0 is inside gamma's range but far
    outside alpha's — a GLOBAL range check passes it, the grouped check
    flags it."""
    from autoprepad_spark.operators.suggest import (
        grouped_to_custom_checks,
        suggest_grouped_checks,
    )

    df = _grouped_frame(spark)
    sugg = suggest_grouped_checks(df, "grp", ["val"])
    checks = grouped_to_custom_checks(sugg, "grp")
    rng = [c for c in checks if c.name == "sugg_grp_range_val"][0]
    # hold: zero violations on the source frame
    assert df.select(rng.flag_col().alias("f")).groupBy().sum().collect()[0][0] == 0
    probe = spark.createDataFrame(
        [Row(grp="alpha", val=5050.0, maybe=1.0),     # gamma-legal, alpha-illegal
         Row(grp="gamma", val=5050.0, maybe=1.0),     # in-range for gamma
         Row(grp="novel", val=9.9e9, maybe=1.0)],     # unseen group: no arm
        schema="grp string, val double, maybe double")
    flags = [r["f"] for r in probe.select(rng.flag_col().alias("f")).collect()]
    assert flags == [1, 0, 0]
    # global-range blindness, for contrast
    gl = [c for c in to_custom_checks(suggest_checks(df, cols=["val"]))
          if c.name == "sugg_range_val"][0]
    assert probe.filter("grp = 'alpha'").select(
        gl.flag_col().alias("f")).collect()[0]["f"] == 0


def test_grouped_null_ceiling_and_guards(spark):
    from autoprepad_spark.operators.suggest import (
        grouped_to_custom_checks,
        suggest_grouped_checks,
    )

    df = _grouped_frame(spark)
    checks = grouped_to_custom_checks(
        suggest_grouped_checks(df, "grp", ["maybe"]), "grp")
    nc = [c for c in checks if c.name == "sugg_grp_null_rate_maybe"][0]
    # ceiling = laxest group (beta: 20% nulls) x headroom 1.5
    assert abs(nc.stat_max_rate - 0.3) < 1e-6
    with pytest.raises(ValueError, match="max_groups"):
        suggest_grouped_checks(
            df.withColumn("k", F.monotonically_increasing_id().cast("string")),
            "k", ["val"], max_groups=100)
    with pytest.raises(ValueError, match="numeric"):
        suggest_grouped_checks(df, "grp", ["grp"])


def test_runner_grouped_checks_from(spark, tokens_df, dim_df, tmp_path):
    from autoprepad_spark import runner
    from autoprepad_spark.operators.suggest import suggest_grouped_checks

    tok = str(tmp_path / "tok.parquet")
    dim = str(tmp_path / "dim.parquet")
    gs = str(tmp_path / "gsugg.parquet")
    out = str(tmp_path / "gout")
    tokens_df.write.parquet(tok)
    dim_df.write.parquet(dim)
    suggest_grouped_checks(tokens_df, "source", ["n_tok"]).write.parquet(gs)

    rc = runner.main([
        "--input", tok, "--dim", dim, "--output", out,
        "--run-id", "grp-run", "--grouped-checks-from", f"source={gs}",
    ])
    assert rc == 2  # built-ins fail on injected violations, as designed
    v = spark.read.parquet(out + "/verdicts").filter(
        F.col("check_name").startswith("sugg_grp_"))
    rows = v.collect()
    assert rows and all(r["status"] == "pass" for r in rows)
    assert {r["check_name"] for r in rows} == {
        "sugg_grp_range_n_tok", "sugg_grp_null_rate_n_tok"}


def test_backslash_values_compile_and_catch(spark):
    """Backslashes in group keys and domains are Spark SQL escape
    characters — the literals must escape them or the predicate either
    fails to parse (trailing backslash) or silently matches nothing."""
    from autoprepad_spark.operators.suggest import (
        grouped_to_custom_checks,
        suggest_grouped_checks,
    )

    rows = [Row(grp=g, val=float(b + i % 10))
            for i in range(300)
            for g, b in [("a\\", 0), ("c:\\tmp\\x", 100), ("plain'q", 500)]]
    df = spark.createDataFrame(rows, schema="grp string, val double")
    checks = grouped_to_custom_checks(
        suggest_grouped_checks(df, "grp", ["val"]), "grp")
    rng = [c for c in checks if c.name == "sugg_grp_range_val"][0]
    assert df.select(rng.flag_col().alias("f")
                     ).groupBy().sum().collect()[0][0] == 0
    probe = spark.createDataFrame(
        [Row(grp="a\\", val=505.0),        # legal for plain'q, not for a\
         Row(grp="c:\\tmp\\x", val=505.0),
         Row(grp="plain'q", val=505.0)],
        schema="grp string, val double")
    assert [r[0] for r in probe.select(rng.flag_col()).collect()] == [1, 1, 0]
    # global isin path shares the literal escaping
    gchecks = to_custom_checks(suggest_checks(df, cols=["grp"]))
    isin = [c for c in gchecks if c.name == "sugg_isin_grp"][0]
    assert df.select(isin.flag_col().alias("f")
                     ).groupBy().sum().collect()[0][0] == 0
    novel = spark.createDataFrame([Row(grp="d\\", val=1.0)],
                                  schema="grp string, val double")
    assert novel.select(isin.flag_col()).collect()[0][0] == 1


def test_grouped_null_rate_scope_holds_with_null_groups(spark):
    """Null-group rows are excluded from the stats, so the compiled
    soft check must exclude them too — otherwise a frame whose nulls
    live under a null group key fails its own suggested ceiling."""
    from autoprepad_spark.operators.suggest import (
        grouped_to_custom_checks,
        suggest_grouped_checks,
    )

    rows = [Row(grp="g1", val=1.0)] * 50 + [Row(grp=None, val=None)] * 50
    df = spark.createDataFrame(rows, schema="grp string, val double")
    checks = grouped_to_custom_checks(
        suggest_grouped_checks(df, "grp", ["val"]), "grp")
    nc = [c for c in checks if c.name == "sugg_grp_null_rate_val"][0]
    n = df.count()
    flagged = df.select(nc.flag_col().alias("f")).groupBy().sum().collect()[0][0]
    assert flagged / n <= nc.stat_max_rate  # the hold property


def test_grouped_name_collision_and_schema_guard(spark):
    from autoprepad_spark.operators.suggest import (
        grouped_to_custom_checks,
        suggest_grouped_checks,
    )
    from autoprepad_spark.operators.marking import validate_custom_checks

    df = spark.createDataFrame(
        [Row(**{"g": "x", "a.b": float(i), "a-b": float(i)})
         for i in range(50)],
        schema="g string, `a.b` double, `a-b` double")
    checks = grouped_to_custom_checks(
        suggest_grouped_checks(df, "g", ["a.b", "a-b"]), "g")
    validate_custom_checks(checks)  # unique, legal names
    assert len({c.name for c in checks}) == len(checks) == 4

    with pytest.raises(ValueError, match="grouped suggestion"):
        grouped_to_custom_checks(suggest_checks(df, cols=["g"]), "g")


def test_tiny_null_rate_ceiling_not_truncated():
    from autoprepad_spark.operators.suggest import grouped_to_custom_checks

    rows = [
        {"group": "g", "column": "c", "kind": "grp_null_rate",
         "params": '{"rate": 1e-07}', "evidence": "nulls=1 of 10000000"},
        {"group": "g", "column": "c", "kind": "grp_range",
         "params": '{"min": 0.0, "max": 1.0}', "evidence": ""},
    ]
    nc = [c for c in grouped_to_custom_checks(rows, "g")
          if c.name == "sugg_grp_null_rate_c"][0]
    assert nc.stat_max_rate == pytest.approx(1.5e-07)


@given(st.lists(
    st.tuples(st.one_of(st.none(), st.text(min_size=0, max_size=8)),
              st.one_of(st.none(), st.floats(allow_nan=True,
                                             allow_infinity=True,
                                             width=32))),
    min_size=1, max_size=25))
@settings(max_examples=10, deadline=None)
def test_grouped_hold_property_fuzz(spark, rows):
    """For ANY frame — group keys with quotes/backslashes/newlines/
    unicode, values with NaN/inf/null — every compiled grouped check
    parses, and the hard range check has zero violations on the frame
    it was suggested from."""
    from autoprepad_spark.operators.suggest import (
        grouped_to_custom_checks,
        suggest_grouped_checks,
    )

    df = spark.createDataFrame(rows, schema="g string, v double")
    sugg = suggest_grouped_checks(df, "g", ["v"])
    for r in sugg.collect():
        json.loads(r["params"])
    try:
        checks = grouped_to_custom_checks(sugg, "g")
    except ValueError:
        return  # empty suggestion frame (e.g. all-null groups): rejected loudly
    rng = [c for c in checks if c.name == "sugg_grp_range_v"]
    if not rng:
        return  # no finite bounds anywhere (all NaN/null values)
    flagged = df.select(rng[0].flag_col().alias("f")
                        ).groupBy().sum().collect()[0][0]
    assert (flagged or 0) == 0


# ---------------------------------------------------------------------------
# r5 ADVICE fixes: float domains, per-partition null ceiling, exact
# unique confirm, name-order stability, FD max_pairs guard
# ---------------------------------------------------------------------------

def test_float_domain_isin_holds_and_catches(spark):
    """FloatType exact domains: the shortest float repr ("0.1")
    re-parsed as a SQL numeric literal is the DOUBLE 0.1, not the
    float 0.1f widened (0.10000000149...). Before the double-widening
    fix, the suggested isin check flagged 100% of its own source
    rows; now it must hold exactly AND still catch a novel value."""
    rows = [Row(f=[0.1, 0.2, 0.3][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, schema="f float")
    sugg = suggest_checks(df).collect()
    isin = _by(sugg, "f", "isin")
    assert isin is not None
    assert json.loads(isin["params"])["domain_size"] == 3
    check = [c for c in to_custom_checks(sugg) if "isin" in c.name][0]
    flagged = df.select(check.flag_col().alias("x")
                        ).groupBy().sum().collect()[0][0]
    assert (flagged or 0) == 0, "isin check false-fails its own source data"
    # a float NOT in the domain still flags (0.25 is exactly
    # representable, so no widening ambiguity about it being novel)
    bad = spark.createDataFrame([Row(f=0.25)], schema="f float")
    assert bad.select(check.flag_col().alias("x")).collect()[0]["x"] == 1


def test_unique_requires_exact_distinct(spark):
    """A column with ~3% genuine duplicates sits inside the 5% HLL
    margin; the exact count_distinct confirm must suppress the unique
    suggestion (wired to the suite's EXACT uniqueness check, it would
    false-fail immediately), while a truly-unique column keeps it."""
    rows = [Row(u=f"u-{i:05d}",
                d=f"v-{0 if i % 33 == 0 else i:05d}")
            for i in range(1200)]
    df = spark.createDataFrame(rows, schema="u string, d string")
    sugg = suggest_checks(df).collect()
    uniq = {s["column"] for s in sugg if s["kind"] == "unique"}
    assert "u" in uniq
    assert "d" not in uniq, "near-unique column got an exact-failing unique"
    ev = _by(sugg, "u", "unique")["evidence"]
    assert "exact" in ev and "1200 of 1200" in ev


def test_null_ceiling_per_partition_mode(spark):
    """Global mode: a skewed partition's null rate can exceed the
    global-rate x headroom ceiling (documented). With partition_col
    the ceiling derives from the MAX per-partition rate, so no
    partition of the source data can fail its own suggestion."""
    rows = [Row(part="a", x=None if i % 100 == 0 else float(i))
            for i in range(1000)]
    rows += [Row(part="b", x=None if i % 5 < 2 else float(i))
             for i in range(100)]
    df = spark.createDataFrame(rows, schema="part string, x double")
    g = _by(suggest_checks(df, cols=["x"]).collect(), "x", "null_rate_max")
    p = _by(suggest_checks(df, cols=["x"], partition_col="part").collect(),
            "x", "null_rate_max")
    global_ceil = json.loads(g["params"])["max_rate"]
    part_ceil = json.loads(p["params"])["max_rate"]
    # partition b's rate is 0.4; global rate is 50/1100 ~ 0.045
    assert global_ceil < 0.4 < part_ceil
    assert abs(part_ceil - 0.4 * 1.5) < 1e-9
    with pytest.raises(ValueError, match="partition column"):
        suggest_checks(df, cols=["x"], partition_col="nope")


def test_to_custom_checks_names_stable_under_row_order(spark):
    """Sanitized-name collisions ('a.b' and 'a_b' both map to a_b) get
    '_'-suffixed deterministically by (column, kind) — NOT by stored
    row order, which a multi-file parquet read back via the runner
    does not preserve."""
    df = spark.createDataFrame(
        [Row(**{"a.b": f"x{i}", "a_b": f"y{i}"}) for i in range(50)],
        schema="`a.b` string, a_b string")
    rows = suggest_checks(df).collect()
    fwd = [c.name for c in to_custom_checks(rows)]
    rev = [c.name for c in to_custom_checks(list(reversed(rows)))]
    assert sorted(fwd) == sorted(rev)
    # and the COLUMN behind each name is identical across orders
    fwd_map = {c.name: c.predicate for c in to_custom_checks(rows)}
    rev_map = {c.name: c.predicate for c in to_custom_checks(list(reversed(rows)))}
    assert fwd_map == rev_map


def test_fd_max_pairs_guard(spark, frame):
    from autoprepad_spark.operators.suggest import suggest_fds

    with pytest.raises(ValueError, match="max_pairs"):
        suggest_fds(frame, max_determinant_distinct=700, max_pairs=3)
    # explicit small pair lists never trip the guard
    rows = suggest_fds(frame, pairs=[("source", "label")], max_pairs=3).collect()
    assert len(rows) == 1


def test_thousand_group_checks_survive_strict_codegen(spark):
    """The r4-verdict watch item, measured and closed: one CASE over
    ~384+ arms exceeds Janino's 64 KB method limit and silently drops
    the whole marking stage to the interpreted path (~6x slower
    measured at 1000 groups) — and chains in the same fused Project
    SHARE the method budget, so chunking the chain doesn't help. Above
    max_arms_per_check the compiler therefore switches representation:
    bounds become a dict in ONE vectorized Arrow UDF (O(1) generated
    code). With codegen fallback DISABLED — so any over-budget method
    raises instead of silently interpreting — the 1000-group check set
    must still execute, and its flags must equal the monolithic chain's
    on the same rows."""
    from autoprepad_spark.operators.suggest import (
        grouped_to_custom_checks,
        suggest_grouped_checks,
    )

    n_groups = 1000
    df = spark.range(20_000).select(
        F.concat(F.lit("g-"), (F.col("id") % n_groups).cast("string"))
        .alias("grp"),
        (F.col("id") % 997).cast("double").alias("val"),
    )
    sugg = suggest_grouped_checks(df, "grp", ["val"], max_groups=1000)
    checks = grouped_to_custom_checks(sugg, "grp")
    rng = [c for c in checks if "range" in c.name]
    # ONE check, unsuffixed name — representation changed, contract not
    assert len(rng) == 1 and rng[0].name == "sugg_grp_range_val"
    assert not isinstance(rng[0].predicate, str)  # UDF-backed Column

    bad = spark.createDataFrame(
        [("g-5", 1e9), ("g-777", -1e9), ("__novel__", 1e9), (None, 1e9)],
        schema="grp string, val double")
    both = df.unionByName(bad)
    old = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        hold = df.select(rng[0].flag_col().alias("f")
                         ).groupBy().sum().collect()[0][0]
        total = both.select(rng[0].flag_col().alias("f")
                            ).groupBy().sum().collect()[0][0]
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)
    assert (hold or 0) == 0          # hold property survives the UDF path
    assert total == 2                # novel + null groups pass, 2 real hits

    # UDF semantics == the monolithic chain (fallback back on for the
    # giant CASE, which is exactly the path the UDF representation
    # exists to avoid)
    mono = grouped_to_custom_checks(sugg, "grp", max_arms_per_check=10**6)
    mono_rng = [c for c in mono if "range" in c.name]
    assert len(mono_rng) == 1 and isinstance(mono_rng[0].predicate, str)
    mono_total = both.select(mono_rng[0].flag_col().alias("f")
                             ).groupBy().sum().collect()[0][0]
    assert mono_total == total == 2

    # at/below the threshold the plain when-chain path is unchanged
    small = grouped_to_custom_checks(
        [r for r in sugg.collect() if r["group"] < "g-2"], "grp")
    srng = [c for c in small if "range" in c.name]
    assert srng and isinstance(srng[0].predicate, str)
