"""N-gram language-model perplexity scoring for corpus quality gating.

CCNet's second filter (after the fastText classifier, classifier.py)
scores every document's perplexity under a language model trained on a
trusted reference corpus (Wikipedia in the paper) and keeps the
low-perplexity head/middle. This is the same capability re-expressed
Spark-first with a backoff bigram model instead of a vendored KenLM
binary: the model is small, deterministic, exactly reproducible, and
the scoring plan is a bare scan+project.

Model (fit on the reference corpus, `fit_bigram_lm`):

    P(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})       if bigram seen
                     = backoff * P_uni(w_i)              otherwise
    P_uni(w)         = (c(w) + alpha) / (N + alpha*(V+1))  (add-alpha;
                       the +1 reserves mass for unseen words)

- **fit** is two hash aggregations (unigram + bigram counts) with
  map-side combine, so the shuffle is |vocab| / |bigram table| rows no
  matter the reference size; explicit ``max_vocab`` / ``max_bigrams``
  guards bound what becomes driver/broadcast state (the same contract
  as classifier.fit_term_weights).
- **score** (`perplexity`) never shuffles or joins — the stage is
  row-local either way — but HOW the lookups run matters and was
  MEASURED, not assumed: a MapType-literal expression looks
  Spark-native yet `GetMapValue` does a LINEAR key scan inside an
  interpreted higher-order lambda (20k docs scored in 18.4 s against a
  1.3k-entry map and 430 s against a 37k-entry map, 8 cores). The
  default is therefore an Arrow-vectorized pandas UDF: the JVM still
  normalizes and splits (codegen), only the per-token hash-dict
  lookups and the NLL sum run in Python over Arrow batches (the same
  20k x 37k-entry workload: 1.4 s — ~300x; it also beats the
  expression path at 512 entries). mode="map" remains as the explicit
  zero-Python opt-out for environments without Python workers.
  ppl = exp(mean NLL); lower = more reference-like.

Docs with a single word fall back to their unigram NLL; empty/null
docs get NULL perplexity (no evidence — gate them with the length
checks, not the LM).

No reference counterpart (AutoPrepAD has no text models); part of the
training-data-pipeline extension, following CCNet (Wenzek et al. 2020).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from autoprepad_spark.operators.dedup import normalize_text

#: fit refuses to exceed these without an explicit override — both
#: tables become executor literals / driver state.
DEFAULT_MAX_VOCAB = 32_768
DEFAULT_MAX_BIGRAMS = 262_144


def _words(text_col: str):
    return F.split(normalize_text(text_col), " ")


def fit_bigram_lm(
    ref: DataFrame,
    text_col: str = "text",
    *,
    alpha: float = 1.0,
    min_count: int = 1,
    min_bigram_count: int = 2,
    max_vocab: int = DEFAULT_MAX_VOCAB,
    max_bigrams: int = DEFAULT_MAX_BIGRAMS,
) -> dict:
    """Fit the backoff bigram LM on the reference corpus.

    Returns a plain dict (the model IS driver state by contract):
      {"uni": {word: count}, "bi": {"a b": count}, "n_tokens": N,
       "alpha": alpha} — pass it to `perplexity`. Ties are broken by
    term so the truncated vocab is deterministic.

    Truncation order: unigrams by (count desc, word) keep the
    ``max_vocab`` head; bigrams must have both words in the kept vocab
    and count >= min_bigram_count, then the top ``max_bigrams`` by
    (count desc, bigram). Counts for c(w_{i-1}) in the bigram
    conditional use the UNTRUNCATED unigram count of the kept word —
    probabilities stay <= 1 because truncation only removes bigram
    rows, never adds mass.
    """
    words = _words(text_col)
    toks = ref.select(F.explode(words).alias("w")).filter(F.col("w") != "")
    uni = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_vocab)
        .collect()
    )
    uni_map = {r["w"]: r["c"] for r in uni}
    n_tokens = toks.count()

    pairs = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    vocab_df = ref.sparkSession.createDataFrame(
        [(w,) for w in uni_map], "w string"
    )
    bi = (
        ref.select(F.explode(pairs).alias("p"))
        .withColumn("a", F.split_part(F.col("p"), F.lit(" "), F.lit(1)))
        .withColumn("b", F.split_part(F.col("p"), F.lit(" "), F.lit(2)))
        .join(F.broadcast(vocab_df.withColumnRenamed("w", "a")), "a", "left_semi")
        .join(F.broadcast(vocab_df.withColumnRenamed("w", "b")), "b", "left_semi")
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_bigram_count)
        .orderBy(F.col("c").desc(), F.col("p"))
        .limit(max_bigrams)
        .collect()
    )
    if min_count > 1:
        uni_map = {w: c for w, c in uni_map.items() if c >= min_count}
    return {
        "uni": uni_map,
        "bi": {r["p"]: r["c"] for r in bi},
        "n_tokens": n_tokens,
        "alpha": float(alpha),
    }


def _log_uni(model: dict) -> dict:
    a, n, v = model["alpha"], model["n_tokens"], len(model["uni"])
    denom = n + a * (v + 1)
    return (
        {w: math.log((c + a) / denom) for w, c in model["uni"].items()},
        math.log(a / denom),  # unseen-word log prob
    )


def log_prob_oracle(model: dict, text_words: list[str], backoff: float) -> float:
    """Reference (driver-side) scorer for tests: mean NLL of the doc."""
    lu, unk = _log_uni(model)
    if not text_words:
        return float("nan")
    if len(text_words) == 1:
        return -lu.get(text_words[0], unk)
    nll = 0.0
    for a, b in zip(text_words, text_words[1:]):
        big = model["bi"].get(f"{a} {b}")
        if big is not None and a in model["uni"]:
            nll -= math.log(big / model["uni"][a])
        else:
            nll -= math.log(backoff) + lu.get(b, unk)
    return nll / (len(text_words) - 1)




def ppl_expr(
    model: dict, text, *, backoff: float = 0.1, mode: str = "auto"
) -> F.Column:
    """The perplexity as a bare Column over ``text`` (name or Column) —
    row-local, composable into one-scan pipelines (clean_corpus).

    mode="udf" (the auto default): Arrow-batched pandas UDF doing
    hash-dict lookups; identical arithmetic to log_prob_oracle.
    mode="map": constant-folded MapType literals, zero Python — slower
    at EVERY measured model size (GetMapValue is a linear scan), kept
    only for Python-worker-free environments."""
    lu, unk = _log_uni(model)
    if mode == "auto":
        mode = "udf"
    if mode == "udf":
        from pyspark.sql.functions import pandas_udf

        bi_lp = {
            p: math.log(c / model["uni"][p.split(" ", 1)[0]])
            for p, c in model["bi"].items()
            if p.split(" ", 1)[0] in model["uni"]
        }
        lb = math.log(backoff)

        @pandas_udf("double")
        def _score(words: pd.Series) -> pd.Series:
            out = []
            for ws in words:
                if ws is None or len(ws) == 0:
                    out.append(None)
                    continue
                if len(ws) == 1:
                    out.append(
                        None
                        if ws[0] == ""
                        else math.exp(-lu.get(ws[0], unk))
                    )
                    continue
                nll = 0.0
                prev = ws[0]
                for w in ws[1:]:
                    big = bi_lp.get(prev + " " + w)
                    nll -= big if big is not None else lb + lu.get(w, unk)
                    prev = w
                out.append(math.exp(nll / (len(ws) - 1)))
            return pd.Series(out, dtype="float64")

        return _score(_words(text))
    # mode == "map": pure-expression path
    uni_entries: list = []
    for w, lp in lu.items():
        uni_entries.extend((F.lit(w), F.lit(lp)))
    bi_entries: list = []
    for p, c in model["bi"].items():
        a = p.split(" ", 1)[0]
        if a in model["uni"]:
            bi_entries.extend((F.lit(p), F.lit(math.log(c / model["uni"][a]))))
    m_uni = F.create_map(*uni_entries) if uni_entries else F.create_map()
    m_bi = F.create_map(*bi_entries) if bi_entries else F.create_map()
    log_backoff = F.lit(math.log(backoff))

    words = _words(text)
    n = F.size(words)
    pairs = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    pair_ll = F.aggregate(
        pairs,
        F.lit(0.0),
        lambda acc, p: acc
        + F.coalesce(
            m_bi[p],
            log_backoff
            + F.coalesce(
                m_uni[F.split_part(p, F.lit(" "), F.lit(2))], F.lit(unk)
            ),
        ),
    )
    single_ll = F.coalesce(m_uni[F.element_at(words, 1)], F.lit(unk))
    mean_nll = F.when(n >= 2, -pair_ll / (n - 1).cast("double")).when(
        (n == 1) & (F.element_at(words, 1) != ""), -single_ll
    )  # empty / null text -> NULL (no evidence)
    return F.exp(mean_nll)


def perplexity(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    *,
    backoff: float = 0.1,
    out_col: str = "ppl",
    mode: str = "auto",
) -> DataFrame:
    """Per-document perplexity under the fitted model — zero joins,
    zero shuffles; a bare scan+project either via constant-folded map
    literals (tiny models) or an Arrow-batched UDF (default — see
    module docstring for the measured crossover)."""
    return df.withColumn(
        out_col, ppl_expr(model, text_col, backoff=backoff, mode=mode)
    )


def ppl_filter(
    df: DataFrame,
    model: dict,
    max_ppl: float,
    text_col: str = "text",
    *,
    backoff: float = 0.1,
) -> DataFrame:
    """Keep documents at or below ``max_ppl`` (CCNet keeps the
    low-perplexity fraction; pick max_ppl from a percentile_sweep of
    `perplexity` over a sample)."""
    scored = perplexity(df, model, text_col, backoff=backoff)
    return scored.filter(F.col("ppl") <= F.lit(float(max_ppl)))
