"""Portable Bloom filter — byte-exact Python oracle, no-false-negative /
FPR bounds, exact sketch-union merge, the incremental-dedup bloom gate
(identical semantics with and without), and plan shape."""

from __future__ import annotations

import contextlib
import hashlib
import io

import pytest
from pyspark.sql import functions as F

from autoprepad_spark.functions import sketches as S
from autoprepad_spark.operators import incremental as inc


def _py_bloom(keys, m_bits, k) -> bytes:
    """Byte-exact oracle for the serialized filter: APB1 header (magic,
    k) + bitmap, h2 forced odd (|1) — in lockstep with _bloom_h1_h2 and
    the UDF probe."""
    buf = bytearray(8 + m_bits // 8)
    buf[:4] = b"APB1"
    buf[4] = k
    for key in keys:
        hx = hashlib.md5(str(key).encode()).hexdigest()
        h1 = int(hx[:15], 16) % m_bits
        h2 = (int(hx[15:30], 16) % m_bits) | 1
        for i in range(k):
            p = (h1 + i * h2) % m_bits
            buf[8 + (p >> 3)] |= 1 << (p & 7)
    return bytes(buf)


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def keys_df(spark):
    df = spark.createDataFrame(
        [(f"key-{i}",) for i in range(2000)], "v string"
    ).cache()
    df.count()
    return df


def test_bloom_bytes_match_python_oracle(spark, keys_df):
    m, k = S.bloom_size(2000, 0.01)
    assert m % 64 == 0 and k >= 1
    got = S.bloom_bytes(S.bloom_registers(keys_df, "v", m_bits=m, k=k), m, k=k)
    assert got == _py_bloom([f"key-{i}" for i in range(2000)], m, k)


def test_no_false_negatives_and_fpr_bound(spark, keys_df):
    m, k = S.bloom_size(2000, 0.01)
    b = S.bloom_bytes(S.bloom_registers(keys_df, "v", m_bits=m, k=k), m, k=k)
    probe = spark.createDataFrame(
        [(f"key-{i}",) for i in range(2000)]
        + [(f"non-{i}",) for i in range(20000)],
        "v string",
    )
    got = probe.select("v", S.bloom_contains("v", b, k=k).alias("m")).collect()
    assert all(r["m"] for r in got if r["v"].startswith("key-"))
    fpr = sum(1 for r in got if r["v"].startswith("non-") and r["m"]) / 20000
    assert fpr < 0.03  # target 0.01, generous bound


def test_merge_is_exact_union(spark, keys_df):
    m, k = S.bloom_size(2000, 0.01)
    a = keys_df.filter(F.col("v") < "key-15")  # lexicographic split
    b = keys_df.filter(F.col("v") >= "key-15")
    merged = S.bloom_merge(
        S.bloom_registers(a, "v", m_bits=m, k=k),
        S.bloom_registers(b, "v", m_bits=m, k=k),
    )
    full = S.bloom_registers(keys_df, "v", m_bits=m, k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    # byte form identical too
    assert S.bloom_bytes(merged, m, k=k) == S.bloom_bytes(full, m, k=k)


def test_nulls_and_validation(spark):
    m, k = 1024, 3
    df = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
    b = S.bloom_bytes(S.bloom_registers(df, "v", m_bits=m, k=k), m, k=k)
    got = df.select("v", S.bloom_contains("v", b, k=k).alias("m")).collect()
    assert {r["v"]: r["m"] for r in got} == {"a": True, None: False, "b": True}
    with pytest.raises(ValueError):
        S.bloom_registers(df, "v", m_bits=100, k=k)  # not a multiple of 64
    with pytest.raises(ValueError):
        S.bloom_size(0, 0.01)
    with pytest.raises(ValueError):
        S.bloom_contains("v", b"\x00\x01\x02", k=k)  # no APB1 header
    with pytest.raises(ValueError):
        S.bloom_contains("v", b, k=k + 1)  # probe k != build k


def test_long_keys_match_oracle(spark):
    """content_hash keys are LONGS — the cast-to-string must agree with
    str() in Python (integers print identically)."""
    m, k = 4096, 4
    df = spark.createDataFrame(
        [(i,) for i in (-(2**63), -1, 0, 7, 2**63 - 1)], "v long"
    )
    got = S.bloom_bytes(S.bloom_registers(df, "v", m_bits=m, k=k), m, k=k)
    assert got == _py_bloom([-(2**63), -1, 0, 7, 2**63 - 1], m, k)


def _mini_corpus(spark, n=400, dup_every=5):
    rows = []
    for i in range(n):
        text = f"history doc number {i % (n // dup_every)} body text"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_gate_preserves_split_semantics(spark):
    history = _mini_corpus(spark, 400)
    index = inc.build_dedup_index(history)
    # shard: half dups of history, half genuinely new
    shard = spark.createDataFrame(
        [(10_000 + i, f"history doc number {i} body text") for i in range(40)]
        + [(20_000 + i, f"brand new shard doc {i}") for i in range(40)],
        "doc_id long, text string",
    )
    m, k = S.bloom_size(400, 0.01)
    bloom = S.bloom_bytes(
        S.bloom_registers(index, "content_hash", m_bits=m, k=k), m, k=k
    )
    f0, d0 = inc.split_exact_against_index(shard, index)
    f1, d1 = inc.split_exact_against_index(
        shard, index, history_bloom=bloom, bloom_k=k
    )
    ids = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert ids(f1) == ids(f0)
    assert ids(d1) == ids(d0)
    assert len(ids(d0)) == 40  # the dup half was dropped
    # kept rows carry the content_hash column either way
    assert set(f1.columns) == set(f0.columns)


def test_bloom_probe_plan_is_scan_level(spark, keys_df, tmp_path):
    m, k = S.bloom_size(2000, 0.01)
    b = S.bloom_bytes(S.bloom_registers(keys_df, "v", m_bits=m, k=k), m, k=k)
    p = str(tmp_path / "keys.parquet")
    keys_df.write.mode("overwrite").parquet(p)
    plan = _plan_of(spark.read.parquet(p).filter(S.bloom_contains("v", b, k=k)))
    assert "Exchange" not in plan
    assert "Python" not in plan
    reg_plan = _plan_of(S.bloom_registers(spark.read.parquet(p), "v", m_bits=m, k=k))
    assert "partial_bit_or" in reg_plan  # map-side combine bounds the shuffle


def test_udf_and_expr_paths_agree_bit_for_bit(spark, keys_df):
    m, k = S.bloom_size(2000, 0.01)
    b = S.bloom_bytes(S.bloom_registers(keys_df, "v", m_bits=m, k=k), m, k=k)
    probe = spark.createDataFrame(
        [(f"key-{i}",) for i in range(500)]
        + [(f"non-{i}",) for i in range(5000)]
        + [(None,)],
        "v string",
    )
    got = probe.select(
        "v",
        S.bloom_contains("v", b, k=k, method="expr").alias("e"),
        S.bloom_contains("v", b, k=k, method="udf").alias("u"),
    ).collect()
    assert all(r["e"] == r["u"] for r in got)
    # long keys too (the incremental gate's content_hash column)
    dfl = spark.createDataFrame([(i,) for i in range(-3, 4)], "v long")
    bl = S.bloom_bytes(S.bloom_registers(dfl, "v", m_bits=1024, k=3), 1024, k=3)
    gl = dfl.select(
        S.bloom_contains("v", bl, k=3, method="expr").alias("e"),
        S.bloom_contains("v", bl, k=3, method="udf").alias("u"),
    ).collect()
    assert all(r["e"] and r["u"] for r in gl)
    with pytest.raises(ValueError):  # valid header, oversized for expr
        big = S._BLOOM_MAGIC + bytes([3, 0, 0, 0]) + bytes(2 * 1024 * 1024)
        S.bloom_contains("v", big, method="expr")


def test_header_roundtrip_and_densify_cap(spark):
    """Round-4 contract: k travels in the bytes (ADVICE r3 medium), and
    bloom_bytes enforces a driver-bitmap budget with the stack-per-epoch
    guidance (VERDICT r3 next-round #6)."""
    m, k = 1024, 5
    df = spark.createDataFrame([("x",), ("y",)], "v string")
    regs = S.bloom_registers(df, "v", m_bits=m, k=k)
    b = S.bloom_bytes(regs, m, k=k)
    assert S.bloom_header(b) == (m, k)
    assert len(b) == 8 + m // 8
    # probing without k uses the header's k (no silent false negatives)
    got = df.select(S.bloom_contains("v", b).alias("m")).collect()
    assert all(r["m"] for r in got)
    # oversized densification raises with the stacking guidance
    with pytest.raises(ValueError, match="stack per-epoch|register frame"):
        S.bloom_bytes(regs, m, k=k, max_bytes=64)


def test_h2_forced_odd_prevents_probe_collapse():
    """Kirsch-Mitzenmacher degenerate case (ADVICE r3): when the raw
    h2 % m_bits lands on 0, the |1 keeps the k probes distinct instead
    of collapsing onto h1. Verified structurally on the oracle formula:
    an odd h2 in [1, m_bits-1] over an even m_bits never yields
    identical consecutive probes."""
    m_bits = 640
    for raw_h2 in (0, m_bits, 2 * m_bits):  # all ≡ 0 (the collapse case)
        h2 = (raw_h2 % m_bits) | 1
        probes = {(123 + i * h2) % m_bits for i in range(4)}
        assert len(probes) == 4
