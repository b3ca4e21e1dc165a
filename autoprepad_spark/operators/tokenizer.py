"""Real BPE tokenizer: distributed fit over the word-type histogram,
row-local Arrow-UDF encode.

The "tokens" axis so far had only an estimator (`text.bpe_ish_token_count`,
a regexp_count). This module is the real thing, designed around the fact
that classic BPE (Sennrich et al. 2016) learns merges from the WORD-TYPE
frequency table, not from the token stream:

- **fit** (`fit_bpe`) is exact over the FULL corpus, not a sample. The
  only distributed work is one explode + map-side-combined hash agg
  producing (word, count) — the same shape as `classifier.fit_term_weights`
  — bounded by a ``max_word_types`` guard (TakeOrdered head by count, so
  truncation drops only the rarest types, which contribute least to pair
  counts). The merge loop then runs driver-side on that bounded histogram:
  at 100 TB the corpus is petabytes but the word-type table is millions of
  rows, which is the correct distributed/driver split (tokenizer trainers
  are always histogram-based for exactly this reason).
- **encode** (`bpe_encode`) never shuffles or joins: the merge ranks ride
  into executors as broadcast-closure state inside an Arrow-batched pandas
  UDF, words are memoized per batch (Zipf makes the hit rate extreme), and
  the plan is a bare scan+project. A MapType-literal expression alternative
  was ruled out up front: GetMapValue linear-scans keys inside interpreted
  lambdas (measured ~13-300x slower in operators/lm_quality.py — same
  mechanics, bigger tables here).

Pre-tokenization matches `text.bpe_ish_token_count`'s word classes
([a-z]+ | digit | punct run) over `dedup.normalize_text`'s canonical form,
so the estimator and the real count are directly comparable. Each word is
a char sequence with an end-of-word marker (classic Sennrich, not
byte-level GPT-2 — no locale-dependent byte tables, deterministic
everywhere).

No reference counterpart (AutoPrepAD has no tokenizer); this is part of
the beyond-reference training-data surface. Fit counts are DuckDB-checked
and the Sennrich worked example is reproduced exactly in
tests/test_tokenizer.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from autoprepad_spark.operators.dedup import normalize_text

#: end-of-word marker (classic BPE); a char no pre-token can contain.
EOW = "</w>"

#: id 0 is reserved for characters never seen at fit time.
UNK_ID = 0
UNK_TOKEN = "<unk>"

#: fit-state bound: the word-type histogram that becomes driver state.
DEFAULT_MAX_WORD_TYPES = 1_000_000

#: the pre-tokenizer word classes — identical to text.bpe_ish_token_count
#: so the cheap estimator and the real tokenizer count the same units.
WORD_RE = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def pre_tokens(col: Column | str) -> Column:
    """The pre-token array (array<string>) — normalize + one regexp pass,
    all codegen. Empty/blank text yields an empty array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(normalize_text(c), F.lit(WORD_RE), 0)


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    max_word_types: int = DEFAULT_MAX_WORD_TYPES,
    min_count: int = 1,
) -> DataFrame:
    """(word, count) over the whole corpus: explode + one hash agg with
    map-side combine; the head-by-count bound keeps the result
    driver-safe. Deterministic: ties broken by word."""
    counts = (
        df.select(F.explode(pre_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    # TakeOrdered head (sort+limit collapses to a bounded top-k per
    # partition + driver merge — no global sort materialization).
    return counts.orderBy(F.desc("count"), F.asc("word")).limit(max_word_types)


def _learn_merges(
    histo: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Sennrich merge loop over the word-type histogram. Pair counts are
    maintained incrementally (only words containing the merged pair are
    re-scanned), so cost is O(merges x affected-types), not
    O(merges x types)."""
    words: list[list[str]] = [list(w) + [EOW] for w, _ in histo]
    freqs = [c for _, c in histo]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _add(i: int, sign: int) -> None:
        syms, f = words[i], freqs[i] * sign
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + f
            if sign > 0:
                pair_words.setdefault(p, set()).add(i)

    for i in range(len(words)):
        _add(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best, best_n = None, 0
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n < 1:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            syms = words[i]
            _add(i, -1)
            j, out = 0, []
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == best[0]
                    and syms[j + 1] == best[1]
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            _add(i, +1)
        # drop exhausted pairs so the argmax scan stays tight
        for p in [p for p, n in pair_counts.items() if n <= 0]:
            del pair_counts[p]
            pair_words.pop(p, None)
    return merges


def fit_bpe(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 1_000,
    max_word_types: int = DEFAULT_MAX_WORD_TYPES,
    min_count: int = 1,
) -> dict:
    """Learn a BPE model from the corpus. Returns
    ``{"merges": [(a, b), ...], "vocab": {token: id}}``.

    Exact over the full corpus (see module docstring): one distributed
    word-count agg, then the driver-side merge loop on the bounded
    histogram. Vocab ids are deterministic: <unk>=0, then base symbols
    sorted, then merge products in merge order.
    """
    histo = [
        (r["word"], r["count"])
        for r in word_counts(
            df, text_col, max_word_types=max_word_types, min_count=min_count
        ).collect()
    ]
    # re-sort driver-side: limit() preserves order but be explicit
    histo.sort(key=lambda t: (-t[1], t[0]))
    merges = _learn_merges(histo, num_merges)
    base = sorted({ch for w, _ in histo for ch in w} | {EOW})
    vocab: dict[str, int] = {UNK_TOKEN: UNK_ID}
    for s in base:
        vocab[s] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return {"merges": merges, "vocab": vocab}


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order BPE for one pre-token — the driver-side reference
    the Arrow UDF and the pytest oracle share."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_j, best_r = -1, None
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_j, best_r = j, r
        if best_r is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    *,
    out_col: str = "tokens",
) -> DataFrame:
    """Token-id array per document (``array<int>``). Row-local: the JVM
    normalizes + pre-tokenizes (codegen), the Arrow UDF applies merges
    with per-batch word memoization and maps to vocab ids (unseen
    symbols -> UNK_ID). Empty/null text -> empty array."""
    ranks = {p: i for i, p in enumerate(model["merges"])}
    vocab = dict(model["vocab"])

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _encode(words: pd.Series) -> pd.Series:
        memo: dict[str, list[int]] = {}
        out = []
        for ws in words:
            if ws is None:
                out.append([])
                continue
            ids: list[int] = []
            for w in ws:
                got = memo.get(w)
                if got is None:
                    got = [
                        vocab.get(s, UNK_ID) for s in encode_word(w, ranks)
                    ]
                    memo[w] = got
                ids.extend(got)
            out.append(ids)
        return pd.Series(out, dtype="object")

    return df.withColumn(out_col, _encode(pre_tokens(text_col)))


def bpe_token_count(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    *,
    out_col: str = "n_bpe_tok",
) -> DataFrame:
    """Exact BPE token count per document — the real-count upgrade of
    text.bpe_ish_token_count (same pre-token units)."""
    tmp = "__bpe_ids__"
    return (
        bpe_encode(df, model, text_col, out_col=tmp)
        .withColumn(out_col, F.size(F.col(tmp)))
        .drop(tmp)
    )


def decode_ids(model: dict, ids: list[int]) -> str:
    """Driver-side decode for tests: ids -> symbols -> text (EOW -> space).
    Lossless for in-vocab encodings of normalized text."""
    inv = {i: t for t, i in model["vocab"].items()}
    s = "".join(inv[i] for i in ids)
    return s.replace(EOW, " ").strip()
