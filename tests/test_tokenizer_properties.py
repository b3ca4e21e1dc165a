"""Property tests for the BPE tokenizer and WARC parser internals.

Pure driver-side (no SparkSession): the distributed paths delegate to
exactly these functions (`encode_word` is the Arrow UDF's per-word
kernel, `parse_warc_bytes` is the mapInPandas kernel), so properties
proven here hold for the cluster path — the same oracle-sharing
pattern as test_quantiles.py.
"""

import gzip

from hypothesis import given, settings, strategies as st

from autoprepad_spark.operators import tokenizer as T
from autoprepad_spark.sources.warc import parse_warc_bytes

words_st = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=8),
    min_size=1,
    max_size=40,
)


def _fit(words, num_merges):
    histo = {}
    for w in words:
        histo[w] = histo.get(w, 0) + 1
    h = sorted(histo.items(), key=lambda t: (-t[1], t[0]))
    merges = T._learn_merges(h, num_merges)
    return {p: i for i, p in enumerate(merges)}, merges


@given(words_st, st.text(alphabet="abcdef", min_size=1, max_size=12),
       st.integers(0, 30))
@settings(max_examples=200, deadline=None)
def test_segmentation_is_lossless(words, probe, num_merges):
    # merges only concatenate adjacent symbols, so joining the output
    # symbols must reconstruct any word exactly — fitted or unseen
    ranks, _ = _fit(words, num_merges)
    for w in set(words) | {probe}:
        assert "".join(T.encode_word(w, ranks)) == w + T.EOW


@given(words_st, st.integers(0, 15))
@settings(max_examples=150, deadline=None)
def test_more_merges_never_lengthen(words, k):
    # greedy fit is prefix-stable: the k-merge model IS the first k
    # merges of the full model; extra merges only keep or shrink counts
    ranks_full, merges_full = _fit(words, 50)
    ranks_k, merges_k = _fit(words, k)
    assert merges_k == merges_full[: len(merges_k)]
    for w in set(words):
        assert len(T.encode_word(w, ranks_full)) <= len(
            T.encode_word(w, ranks_k)
        )


@given(words_st, st.integers(0, 25))
@settings(max_examples=150, deadline=None)
def test_fitted_words_stay_in_vocab(words, num_merges):
    histo = {}
    for w in words:
        histo[w] = histo.get(w, 0) + 1
    merges = T._learn_merges(
        sorted(histo.items(), key=lambda t: (-t[1], t[0])), num_merges
    )
    base = sorted({ch for w in histo for ch in w} | {T.EOW})
    vocab = {T.UNK_TOKEN}
    vocab.update(base)
    vocab.update(a + b for a, b in merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in set(words):
        for sym in T.encode_word(w, ranks):
            assert sym in vocab


payload_st = st.binary(min_size=0, max_size=300)
header_val_st = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="\r\n", min_codepoint=32
    ),
    min_size=1,
    max_size=40,
)


def _serialize(recs):
    out = []
    for i, (wtype, uri, payload) in enumerate(recs):
        head = (
            f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:{i}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        out.append(head + payload + b"\r\n\r\n")
    return out


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "metadata", "resource"]),
            header_val_st,
            payload_st,
        ),
        min_size=1,
        max_size=8,
    ),
    st.booleans(),
)
@settings(max_examples=150, deadline=None)
def test_warc_payloads_round_trip(recs, gz):
    raw = _serialize(recs)
    blob = (
        b"".join(gzip.compress(r) for r in raw) if gz else b"".join(raw)
    )
    got = list(parse_warc_bytes("f", blob))
    assert len(got) == len(recs)
    for (wtype, uri, payload), r in zip(recs, got):
        assert r["warc_type"] == wtype
        # header values are whitespace-trimmed per the WARC spec
        assert r["target_uri"] == uri.strip()
        # non-HTTP payload blocks come back byte-exact
        assert r["payload"] == payload
