"""Encoding repair: known mojibake pairs, clean-text stability, null
handling, plan shape, and a hypothesis round-trip property over the
driver-side reference (which is the Arrow UDF's per-row kernel)."""

import re

from hypothesis import given, settings, strategies as st

from autoprepad_spark.operators import encoding as E


def _moji(s: str, codec: str = "cp1252") -> str:
    return s.encode("utf-8").decode(codec)


def test_fix_encoding_repairs_and_flags(spark):
    rows = [
        (0, _moji("café")),                       # single cp1252 pass
        (1, _moji("“quoted” – ok", "latin-1")),   # cp1252-hole chars
        (2, _moji(_moji("déjà"))),                # double-encoded
        (3, "clean ascii stays"),
        (4, "légitime café, naïve"),              # real accents, no repair
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in E.fix_encoding(df).collect()}
    assert got[0]["text"] == "café" and got[0]["was_mojibake"]
    assert got[1]["text"] == "“quoted” – ok" and got[1]["was_mojibake"]
    assert got[2]["text"] == "déjà" and got[2]["was_mojibake"]
    for i in (3, 4, 6):
        assert got[i]["text"] == rows[i][1] and not got[i]["was_mojibake"]
    assert got[5]["text"] is None and not got[5]["was_mojibake"]


def test_mojibake_score_matches_reference(spark):
    rows = [(0, _moji("café au lait")), (1, "plain"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", E.mojibake_score("text").alias("s")
        ).collect()
    }
    for i, t in rows:
        if t:
            want = len(re.findall(E.MOJIBAKE_RE, t)) / len(t)
            assert abs(got[i] - want) < 1e-12
        elif t == "":
            assert got[i] == 0.0
    assert got[0] > 0 and got[1] == 0.0


def test_plan_is_row_local_single_udf(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = (
        E.fix_encoding(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert plan.count("ArrowEvalPython") == 1


# st.text() never yields surrogates; only exclude pre-existing artifacts
clean_text = st.text(min_size=0, max_size=60).filter(
    lambda s: not re.search(E.MOJIBAKE_RE, s)
)


@given(clean_text)
@settings(max_examples=200, deadline=None)
def test_latin1_mojibake_round_trips(s):
    # any clean text, once misdecoded as latin-1, repairs back exactly
    moji = s.encode("utf-8").decode("latin-1")
    assert E.repair_text(moji) == s


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=200, deadline=None)
def test_repair_never_raises_and_clean_is_identity(s):
    try:
        out = E.repair_text(s)
    except Exception as exc:  # pragma: no cover
        raise AssertionError(f"repair_text raised {exc!r} on {s!r}")
    assert isinstance(out, str)
    if not re.search(E.MOJIBAKE_RE, s):
        assert out == s
