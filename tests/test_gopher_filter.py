"""gopher_quality_filter vs an independent Python recount, on engineered
rule-violating docs plus a seeded fuzz corpus.
"""

from __future__ import annotations

import random
import re

from autoprepad_spark.operators.text import GOPHER_STOPWORDS, gopher_quality_filter


def _py_signals(text: str) -> dict:
    words = re.split(r"\s+", text.strip()) if text.strip() else []
    nw = max(len(words), 1)
    lines = text.split("\n")
    nl = max(len(lines), 1)
    mean_wl = sum(len(w) for w in words) / nw
    symbol = len(re.findall(r"#|\.\.\.|…", text)) / nw
    bullet = sum(
        1 for l in lines if re.match(r"^[-*•‣▪]", l.strip())
    ) / nl
    ellipsis = sum(
        1 for l in lines if re.search(r"(\.\.\.|…)$", l.strip())
    ) / nl
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w)) / nw
    lowered = {w.lower() for w in words}
    stops = sum(1 for s in GOPHER_STOPWORDS if s in lowered)
    return {
        "n_words": len(words),
        "mean_word_len": round(mean_wl, 6),
        "symbol_word_ratio": round(symbol, 6),
        "bullet_line_frac": round(bullet, 6),
        "ellipsis_line_frac": round(ellipsis, 6),
        "alpha_word_frac": round(alpha, 6),
        "stopword_hits": stops,
    }


def _py_keep(sig: dict) -> bool:
    return (
        50 <= sig["n_words"] <= 100_000
        and 3.0 <= sig["mean_word_len"] <= 10.0
        and sig["symbol_word_ratio"] <= 0.1
        and sig["bullet_line_frac"] <= 0.9
        and sig["ellipsis_line_frac"] <= 0.3
        and sig["alpha_word_frac"] >= 0.8
        and sig["stopword_hits"] >= 2
    )


def _good_doc(rnd):
    vocab = ["the", "of", "and", "report", "value", "signal", "batch",
             "window", "stream", "data", "table", "check", "that", "with"]
    return " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(60, 120)))


_BASE = ("the quick brown fox jumps over that lazy dog with plenty of "
         "extra and ordinary words to have more than fifty in total " * 3)

_DOCS = [
    (0, _BASE),                                         # keeps
    (1, "too few words here"),                          # n_words < 50
    (2, " ".join(["a"] * 60)),                          # mean_word_len < 3
    (3, _BASE + " " + "#" * 1 + " ###### ##### #### ### ## # # # # # # # # # # # # #"),  # symbols
    (4, "\n".join("- " + l for l in [_BASE] * 10)),     # all bullet lines
    (5, "\n".join(l + "..." for l in [_BASE] * 10)),    # all ellipsis lines
    (6, " ".join(["1234"] * 30) + " " + _BASE),         # alpha frac low-ish
    (7, " ".join(["zzz"] * 60)),                        # no stopwords
    (8, ""),                                            # empty
]


def test_gopher_matches_python_oracle(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in gopher_quality_filter(df).collect()}
    for i, t in _DOCS:
        want = _py_signals(t)
        got = out[i]
        for k, v in want.items():
            assert got[k] == v, (i, k, got[k], v)
        assert got["gopher_keep"] == _py_keep(want), (i, t[:40])
    assert out[0]["gopher_keep"]
    assert not any(out[i]["gopher_keep"] for i, _ in _DOCS[1:])


def test_gopher_fuzz(spark):
    rnd = random.Random(17)
    frags = ["- bullet line", "normal the line of and text with that",
             "ends with dots...", "#tag", "1234 5678", "…", "short"]
    docs = [(100, _good_doc(rnd))]
    for i in range(40):
        docs.append(
            (i, "\n".join(rnd.choice(frags) for _ in range(rnd.randrange(1, 8))))
        )
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in gopher_quality_filter(df).collect()}
    for i, t in docs:
        want = _py_signals(t)
        for k, v in want.items():
            assert out[i][k] == v, (i, k, out[i][k], v, t)
        assert out[i]["gopher_keep"] == _py_keep(want)
    assert out[100]["gopher_keep"]  # a generated good doc passes
