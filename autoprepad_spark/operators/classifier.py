"""FastText-style linear quality classifier: distributed weight fitting
plus per-document scoring for corpus filtering.

The shape every web-scale pipeline uses for model-based quality gating
(CCNet's fastText filter): fit per-term log-odds weights from a small
labeled sample, then score the full corpus with a linear bag-of-words
model and keep documents above a threshold.

Spark-first split of the two phases:

- **fit** (`fit_term_weights`) is one explode + one hash agg keyed by
  term — map-side combine collapses repeated terms before the shuffle,
  so the shuffle is |vocab| rows no matter the corpus size. A
  ``max_vocab`` guard bounds what the caller may collect.
- **score** (`score_documents`) never shuffles: the weight table rides
  into the executors either as a MapType literal (vocab ≤ ~64k terms —
  pure whole-stage-codegen `F.transform` + `F.aggregate`, the fast
  path), or as a broadcast hash join on the exploded tokens followed by
  a per-doc re-aggregation (arbitrary vocab). Both paths are
  deterministic; weights that are exact binary rationals make the score
  sum bit-exact across engines.

No reference counterpart (AutoPrepAD has no text models); part of the
training-data-pipeline extension. The labeled sample for fitting is
exactly what `sampling.hash_split` produces.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from autoprepad_spark.operators.dedup import normalize_text

#: fit() refuses to return more terms than this without an explicit
#: override — the weight table is driver/broadcast state.
DEFAULT_MAX_VOCAB = 1_000_000

#: score_documents(mode="map") refuses vocabularies beyond this — a
#: MapType-literal GetMapValue is a LINEAR key scan inside an
#: interpreted lambda, measured ~13-300x slower than the Arrow-UDF
#: path from ~1k entries up (see operators/lm_quality.py, same
#: mechanics); mode="auto" therefore always picks "udf".
MAP_LITERAL_CEILING = 65_536


def _words(text_col: str):
    return F.split(normalize_text(text_col), " ")


def fit_term_weights(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    *,
    alpha: float = 1.0,
    min_count: int = 1,
    max_vocab: int = DEFAULT_MAX_VOCAB,
) -> DataFrame:
    """Per-term naive-Bayes log-odds weights from a labeled sample.

    ``label_col`` must be boolean-ish (true = positive/keep class).
    Returns (term, n_pos, n_neg, weight) where
    ``weight = ln((n_pos+a)/(N_pos+2a)) - ln((n_neg+a)/(N_neg+2a))``
    with Laplace smoothing ``a``. Distributed end-to-end: one explode,
    one agg keyed by term (shuffle = |vocab| rows), totals via a single
    tiny global agg broadcast back as a literal-free cross join of one
    row. Raises if the vocabulary exceeds ``max_vocab``.
    """
    lab = F.col(label_col).cast("boolean")
    terms = df.select(
        lab.alias("_pos"), F.explode(_words(text_col)).alias("term")
    ).filter(F.length("term") > 0)
    counts = terms.groupBy("term").agg(
        F.sum(F.col("_pos").cast("long")).alias("n_pos"),
        F.sum((~F.col("_pos")).cast("long")).alias("n_neg"),
    )
    # class token totals over the WHOLE sample (before any vocab filter),
    # so min_count prunes the table without changing surviving weights
    totals = counts.agg(
        F.sum("n_pos").alias("_tp"), F.sum("n_neg").alias("_tn")
    )
    if min_count > 1:
        counts = counts.filter((F.col("n_pos") + F.col("n_neg")) >= min_count)
    n_terms = counts.limit(max_vocab + 1).count()
    if n_terms > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}; raise the cap or "
            f"filter terms (min_count) before fitting"
        )
    a = float(alpha)
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "term",
            "n_pos",
            "n_neg",
            (
                F.log((F.col("n_pos") + a) / (F.col("_tp") + 2 * a))
                - F.log((F.col("n_neg") + a) / (F.col("_tn") + 2 * a))
            ).alias("weight"),
        )
    )


def score_documents(
    df: DataFrame,
    weights: DataFrame | dict[str, float],
    text_col: str = "text",
    *,
    id_cols: list[str] | None = None,
    bias: float = 0.0,
    threshold: float = 0.0,
    mode: str = "auto",
) -> DataFrame:
    """Linear bag-of-words score per document: sum of term weights
    (unknown terms contribute 0) + bias, plus ``keep = score >= threshold``.

    mode="udf" (the auto default) — Arrow-batched pandas UDF: the JVM
    normalizes/splits (codegen), Python does hash-dict weight lookups
    and the sum per Arrow batch. Row-local: zero shuffles, zero joins.
    Measured fastest at every vocab size (a MapType-literal lookup is
    a linear key scan in an interpreted lambda — see
    operators/lm_quality.py's module docstring for the numbers; same
    mechanics here).

    mode="map" — weights become a MapType literal; scoring is
    ``F.transform`` + ``F.aggregate``: zero Python, but linear-scan
    lookups — the opt-out for Python-worker-free environments, tiny
    vocabularies only.

    mode="join" — explode tokens, broadcast-join the weight table, and
    re-aggregate per document. The per-doc groupBy shuffles ONE
    (id, partial-sum) row per document per map task (map-side combine),
    not the token stream. For vocabularies past broadcast size, drop
    the broadcast hint and let AQE decide.
    """
    if mode in ("auto", "udf"):
        if isinstance(weights, DataFrame):
            n = weights.limit(DEFAULT_MAX_VOCAB + 1).count()
            if n > DEFAULT_MAX_VOCAB:
                raise ValueError(
                    f"weight table exceeds {DEFAULT_MAX_VOCAB} terms; use "
                    "mode='join'"
                )
            wdict = {
                r["term"]: float(r["weight"]) for r in weights.collect()
            }
        else:
            wdict = {t: float(w) for t, w in weights.items()}
        from pyspark.sql.functions import pandas_udf

        b = float(bias)

        @pandas_udf("double")
        def _score(words: pd.Series) -> pd.Series:
            get = wdict.get
            out = []
            for ws in words:
                if ws is None:
                    out.append(b)
                    continue
                acc = b
                for w in ws:
                    v = get(w)
                    if v is not None:
                        acc += v
                out.append(acc)
            return pd.Series(out, dtype="float64")

        score = _score(_words(text_col))
        return df.select(
            "*",
            score.alias("score"),
            (score >= F.lit(float(threshold))).alias("keep"),
        )

    if isinstance(weights, dict):
        wmap = weights
    else:
        n = weights.limit(MAP_LITERAL_CEILING + 1).count()
        if mode == "map" and n <= MAP_LITERAL_CEILING:
            wmap = {
                r["term"]: float(r["weight"]) for r in weights.collect()
            }
        else:
            wmap = None

    if wmap is not None and mode != "join":
        if len(wmap) > MAP_LITERAL_CEILING and mode != "map":
            raise ValueError(
                f"{len(wmap)} terms exceeds the map-literal ceiling; pass "
                f"a weights DataFrame (mode='join') instead"
            )
        entries: list = []
        for t, w in wmap.items():
            entries.append(F.lit(t))
            entries.append(F.lit(float(w)))
        m = F.create_map(*entries) if entries else F.create_map()
        words = _words(text_col)
        score = F.aggregate(
            F.transform(words, lambda w: F.coalesce(m[w], F.lit(0.0))),
            F.lit(float(bias)),
            lambda acc, x: acc + x,
        )
        return df.select(
            "*",
            score.alias("score"),
            (score >= F.lit(float(threshold))).alias("keep"),
        )

    # join path: weights is a DataFrame(term, weight)
    if isinstance(weights, dict):  # pragma: no cover - symmetry
        spark = df.sparkSession
        weights = spark.createDataFrame(
            list(weights.items()), "term string, weight double"
        )
    ids = id_cols or [df.columns[0]]
    toks = df.select(*ids, F.explode(_words(text_col)).alias("term"))
    joined = toks.join(
        F.broadcast(weights.select("term", "weight")), "term", "left"
    )
    sums = joined.groupBy(*ids).agg(
        (F.sum(F.coalesce(F.col("weight"), F.lit(0.0))) + float(bias)).alias(
            "score"
        )
    )
    out = df.join(sums, ids, "left").withColumn(
        "score", F.coalesce(F.col("score"), F.lit(float(bias)))
    )
    return out.withColumn("keep", F.col("score") >= F.lit(float(threshold)))


def expected_weight(
    n_pos: int, n_neg: int, total_pos: int, total_neg: int, alpha: float = 1.0
) -> float:
    """Reference implementation of the fit formula (tests/oracles)."""
    return math.log((n_pos + alpha) / (total_pos + 2 * alpha)) - math.log(
        (n_neg + alpha) / (total_neg + 2 * alpha)
    )
