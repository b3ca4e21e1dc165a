"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over hashed n-gram features.

Selects raw-corpus documents whose hashed-ngram distribution looks like
a small TARGET corpus (e.g. Wikipedia+books, or a downstream task's
text): fit bag-of-hashed-ngram multinomials p (target) and q (raw),
score every raw doc with the log importance weight

    log w(x) = sum_{gram g in x} [ log p_hat[h(g)] - log q_hat[h(g)] ]

and resample without replacement via the Gumbel top-k trick
(select the k largest  log w_i + Gumbel(u_i)).

No reference counterpart (AutoPrepAD profiles tabular frames); this is
the data-SELECTION member of the training-pipeline family, next to the
quality gates (Gopher/C4), the classifier (fastText-style), and the
perplexity gate (CCNet) — DSIR is the published alternative that needs
no labels and no LM, only a target corpus.

Spark shape (the whole pipeline is three bounded aggregations plus one
scan-level projection):

* features   — unigram+bigram buckets as ``array<int>`` built from the
  words array bound ONCE per row (interpreted higher-order lambdas get
  no CSE — the repo-wide lesson), two hash families:
  ``method="hash64"`` (default): grams hashed in the INTEGER domain —
  xxhash64 over the per-word hash longs via ``element_at``, no
  per-gram string/array allocation (the measured allocation ceiling on
  core scaling, see dedup.word_shingle_hashes); ``method="md5"``: md5
  over the gram string — slower, but reproducible in ANY engine with
  md5(), which is what the exact Python/DuckDB oracle checks.
* fit        — one explode + map-side-combined count per corpus; the
  shuffle carries at most ``buckets`` rows per task regardless of
  corpus size, and the result frame (<= buckets rows) is the
  persistable, shard-mergeable model (counts add across shards).
* score      — the smoothed log-ratio table becomes ONE array<double>
  literal (O(1) ``element_at`` indexing — NOT a MapType literal, whose
  GetMapValue linear-scans keys inside an interpreted lambda; measured
  13-300x slower in lm_quality); the per-doc weight is a pure
  expression fold, no shuffle, no Python, composes with the scan.
* select     — Gumbel key from the doc key's md5 fraction, so the
  resample is reproducible at any parallelism and on any engine;
  top-k is a TakeOrdered (bounded driver state).

Determinism: everything is a pure function of (row content, row key,
the two fitted count frames) — no RNG state, no partition dependence.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from autoprepad_spark.operators.dedup import normalize_text

_HASH_SPACE = 16 ** 8  # top 32 bits of md5 as an integer

def _empty_int_array() -> Column:
    return F.array().cast("array<int>")


def _md5_bucket(gram: Column, buckets: int) -> Column:
    """Engine-portable bucket: top 32 md5 bits mod ``buckets`` (md5 emits
    identical lowercase hex in Spark / DuckDB / hashlib)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(buckets)
    ).cast("int")


def hashed_ngram_buckets(
    text_col: str | Column,
    *,
    buckets: int = 10_000,
    bigrams: bool = True,
    method: str = "hash64",
) -> Column:
    """Per-doc hashed-ngram feature ids as ``array<int>`` (one entry per
    gram OCCURRENCE — DSIR's features are counts, so multiplicity is
    kept; order is unigrams in word order, then bigrams in word order,
    which pins the float summation order the oracle replicates).

    ``method="hash64"``: words hashed once (xxhash64), unigram bucket =
    pmod(word hash, buckets), bigram bucket = pmod(xxhash64 of the two
    word-hash longs, buckets) — zero per-gram allocation.
    ``method="md5"``: buckets from the gram STRING's md5 — the
    engine-portable family the exact oracle uses (bigram string is
    ``word || ' ' || word``).
    Empty/whitespace-only text yields an empty array.
    """
    if method not in ("hash64", "md5"):
        raise ValueError(f"method must be hash64|md5, got {method!r}")
    words = F.split(normalize_text(text_col), " ")

    def body(ws: Column) -> Column:
        ws = F.filter(ws, lambda w: w != "")
        n = F.size(ws)
        if method == "hash64":
            def with_wh(wh: Column) -> Column:
                uni = F.transform(
                    wh, lambda h: F.pmod(h, F.lit(buckets)).cast("int")
                )
                if not bigrams:
                    return uni
                # sequence(1, n-1) DESCENDS to [1, 0] when n < 2 — guard it
                bi = F.when(
                    n >= 2,
                    F.transform(
                        F.sequence(F.lit(1), n - 1),
                        lambda i: F.pmod(
                            F.xxhash64(
                                F.element_at(wh, i), F.element_at(wh, i + 1)
                            ),
                            F.lit(buckets),
                        ).cast("int"),
                    ),
                ).otherwise(_empty_int_array())
                return F.concat(uni, bi)

            wh = F.transform(ws, lambda w: F.xxhash64(w))
            return F.transform(F.array(wh), with_wh)[0]
        uni = F.transform(ws, lambda w: _md5_bucket(w, buckets))
        if not bigrams:
            return uni
        bi = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: _md5_bucket(
                    F.concat_ws(
                        " ", F.element_at(ws, i), F.element_at(ws, i + 1)
                    ),
                    buckets,
                ),
            ),
        ).otherwise(_empty_int_array())
        return F.concat(uni, bi)

    return F.coalesce(F.transform(F.array(words), body)[0], _empty_int_array())


def fit_hashed_ngrams(
    df: DataFrame,
    text_col: str = "text",
    *,
    buckets: int = 10_000,
    bigrams: bool = True,
    method: str = "hash64",
) -> DataFrame:
    """Bag-of-hashed-ngrams counts: ``(bucket:int, cnt:long)``, at most
    ``buckets`` rows. One explode + hash agg; the map-side partial
    bounds each task's shuffle output at ``buckets`` rows, so the fit
    costs one corpus scan at any scale. Counts over disjoint shards
    merge by groupBy-sum — the same mergeable-profile contract as the
    HLL register frames (operators/incremental.py)."""
    grams = hashed_ngram_buckets(
        text_col, buckets=buckets, bigrams=bigrams, method=method
    )
    # the fit's feature-space parameters ride the SCHEMA as column
    # metadata (not extra rows/columns — the (bucket, cnt) shape and
    # every DuckDB oracle stay untouched). Column metadata survives
    # transformations, groupBy-sum shard merges, and parquet
    # round-trips, so dsir_log_weights can refuse a fit built with a
    # different (buckets, bigrams, method) than the scoring call —
    # a mismatch (e.g. fit with method='md5', score with the default
    # 'hash64') would otherwise yield silently meaningless weights.
    meta = {
        "dsir_buckets": buckets,
        "dsir_bigrams": bool(bigrams),
        "dsir_method": method,
    }
    return (
        df.select(F.explode(grams).alias("bucket"))
        # re-alias AFTER the explode: Generate output attributes drop
        # alias metadata, a plain column alias keeps it
        .select(F.col("bucket").alias("bucket", metadata=meta))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratio_table(
    target_fit: DataFrame,
    raw_fit: DataFrame,
    *,
    buckets: int = 10_000,
    smoothing: float = 1.0,
) -> list[float]:
    """Driver-side λ[b] = log p̂[b] − log q̂[b] with add-α smoothing
    (p̂[b] = (t_b + α) / (T + α·m)). Collects the two fit frames —
    bounded by construction at ``buckets`` rows each, the same
    bounded-domain contract as every histogram fit in this repo."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    t = {r["bucket"]: r["cnt"] for r in target_fit.collect()}
    q = {r["bucket"]: r["cnt"] for r in raw_fit.collect()}
    t_tot = float(sum(t.values())) + smoothing * buckets
    q_tot = float(sum(q.values())) + smoothing * buckets
    return [
        math.log((t.get(b, 0) + smoothing) / t_tot)
        - math.log((q.get(b, 0) + smoothing) / q_tot)
        for b in range(buckets)
    ]


def dsir_log_weights(
    df: DataFrame,
    target_fit: DataFrame,
    raw_fit: DataFrame,
    text_col: str = "text",
    *,
    buckets: int = 10_000,
    bigrams: bool = True,
    method: str = "hash64",
    smoothing: float = 1.0,
    weight_col: str = "dsir_logw",
) -> DataFrame:
    """Append the per-doc log importance weight. The λ table rides the
    plan as ONE array<double> literal (O(1) element_at — deliberately
    not a MapType literal) and the weight is a left fold over the gram
    array: scan-level projection, no shuffle, no Python. Docs with no
    grams get weight 0.0 (w = 1: no evidence either way).

    Fit/score agreement is ENFORCED: fits from ``fit_hashed_ngrams``
    carry their (buckets, bigrams, method) in the bucket column's
    schema metadata, and this call raises if either fit disagrees with
    the scoring parameters — scoring through a different feature space
    than the fit's would produce silently meaningless weights. Fits
    from other producers (no metadata, e.g. the DuckDB oracle frame)
    are accepted as-is: the caller owns agreement then."""
    for label, fit in (("target_fit", target_fit), ("raw_fit", raw_fit)):
        md = dict(fit.schema["bucket"].metadata or {})
        if "dsir_buckets" not in md:
            continue
        got = (md["dsir_buckets"], bool(md["dsir_bigrams"]), md["dsir_method"])
        want = (buckets, bool(bigrams), method)
        if got != want:
            raise ValueError(
                f"{label} was fit with (buckets, bigrams, method)={got} "
                f"but dsir_log_weights was called with {want} — the fit "
                "and scoring feature spaces must match exactly"
            )
    if buckets > 65536:
        # the λ table rides the PLAN as an array literal (one element
        # per bucket); past ~64k the literal bloats analysis and task
        # binaries for no modeling gain (DSIR uses 10k buckets)
        raise ValueError(
            f"buckets={buckets}: the log-ratio table is a plan literal; "
            "keep buckets <= 65536 (paper default 10000)"
        )
    lam = F.lit(
        dsir_log_ratio_table(
            target_fit, raw_fit, buckets=buckets, smoothing=smoothing
        )
    )
    grams = hashed_ngram_buckets(
        text_col, buckets=buckets, bigrams=bigrams, method=method
    )
    return df.withColumn(
        weight_col,
        F.aggregate(
            grams,
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(lam, b + 1),
        ),
    )


def gumbel_key(key_col: str = "doc_id", *, salt: str = "dsir") -> Column:
    """Deterministic Gumbel(0,1) draw from the row key: u = (top 32 md5
    bits + 0.5) / 2^32 ∈ (0,1) — the +0.5 keeps u strictly inside the
    open interval so −ln(−ln u) is always finite — then g = −ln(−ln u).
    A pure function of (key, salt): reproducible at any parallelism."""
    k = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00null"))
    h = F.conv(F.substring(F.md5(F.concat(k, F.lit(salt))), 1, 8), 16, 10)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_HASH_SPACE))
    return -F.log(-F.log(u))


def dsir_select(
    df: DataFrame,
    k: int,
    *,
    weight_col: str = "dsir_logw",
    key_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel top-k resampling: keep the k docs with the largest
    ``log w + Gumbel`` — a sample WITHOUT replacement from the
    importance distribution softmax(log w) (Vieira 2014; the DSIR
    paper's resampling step). Deterministic: the Gumbel comes from the
    doc key, ties break on the key. The global top-k compiles to
    TakeOrdered — per-partition heaps of size k, then a k-row driver
    merge; no global sort materializes. The driver merge makes this
    exact path O(k) driver-side: right for budgets up to ~10^6 docs
    (measured: select of 800k from 8M costs 66-92 s, driver-bound —
    BENCH/BASELINE.md). For corpus-fraction budgets at 10^9+ rows,
    convert the weights to keep-probabilities and use
    ``sampling.weighted_sample`` instead — a scan-level deterministic
    filter with no driver state (Bernoulli rather than
    without-replacement semantics, the standard trade at that scale)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    scored = df.withColumn(
        "_gumbel_score", F.col(weight_col) + gumbel_key(key_col, salt=salt)
    )
    return (
        scored.orderBy(F.desc("_gumbel_score"), F.col(key_col))
        .limit(k)
        .drop("_gumbel_score")
    )


def fit_oracle_sql(docs_sql: str, *, buckets: int = 10_000) -> str:
    """DuckDB SQL computing the IDENTICAL ``fit_hashed_ngrams`` frame
    for ``method="md5"`` — the cross-engine proof that the md5 feature
    family is engine-portable (the same contract as
    ``sketches.hll_oracle_sql``). ``docs_sql`` must produce
    (doc_id, text). Normalization, gram construction (unigrams then
    word-pair bigrams joined by one space), the top-32-md5-bit bucket,
    and the counts all mirror the Spark expressions token for token;
    the hex parse is spelled as nibble arithmetic because DuckDB has no
    conv(). The whitespace split is the EXPLICIT class
    ``[ \\t\\n\\x0b\\f\\r]+`` rather than ``\\s+`` because the engines'
    regex dialects disagree on vertical tab: Java's ``\\s`` (Spark)
    includes \\x0b, RE2's (DuckDB) does not — with ``\\s+`` a text
    containing \\v would tokenize differently in the oracle."""
    nibbles = " + ".join(
        f"(strpos('0123456789abcdef', md5(g)[{j + 1}]) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"""
WITH docs AS ({docs_sql}),
norm AS (
  SELECT list_filter(
           string_split(
             trim(regexp_replace(lower(coalesce(text, '')), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')),
             ' '),
           w -> w <> '') AS ws
  FROM docs
),
grams AS (
  SELECT list_concat(
           ws,
           CASE WHEN len(ws) >= 2
                THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
                ELSE [] END
         ) AS gs
  FROM norm
),
bucketed AS (
  SELECT unnest(list_transform(gs, g -> ({nibbles}) % {buckets})) AS bucket
  FROM grams
)
SELECT bucket, count(*) AS cnt FROM bucketed GROUP BY bucket
"""
