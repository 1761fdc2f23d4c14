"""MERGE/upsert helper + IVF ANN tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR, rows


def test_merge_into_upsert(spark):
    from maple_spark.operators.dml import merge_into

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, name string, v int"
    )
    source = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "id int, name string, v int"
    )
    got = rows(merge_into(target, source, key=["id"]))
    assert got == [
        (1, "a", 10),
        (2, "B", 200),   # matched → updated
        (3, "c", 30),
        (4, "d", 40),    # unmatched source → inserted
    ]


def test_merge_into_partial_update_cols(spark):
    from maple_spark.operators.dml import merge_into

    target = spark.createDataFrame([(1, "a", 10)], "id int, name string, v int")
    source = spark.createDataFrame([(1, "Z", 99)], "id int, name string, v int")
    got = rows(merge_into(target, source, key=["id"], update_cols=["v"]))
    assert got == [(1, "a", 99)]  # only v updated, name preserved


def test_ivf_recall_against_exact(spark):
    """IVF with enough probes recovers most exact neighbors; probing all
    cells recovers them all (exactness fallback)."""
    from maple_spark.catalog import load_table
    from maple_spark.pipelines.similarity import cosine_topk, ivf_topk

    e = load_table(spark, SF_DIR, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(e, q, k=5).collect()
    }
    full_probe = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(e, q, k=5, n_cells=8, n_probe=8).collect()
    }
    assert full_probe == exact  # all cells probed ⇒ exact
    partial = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(e, q, k=5, n_cells=8, n_probe=2).collect()
    }
    recall = len(partial & exact) / len(exact)
    # random (unclustered) embeddings are the worst case for IVF — on
    # real clustered data recall is far higher at the same probe ratio
    assert recall >= 0.3


def test_merge_into_null_update_applies(spark):
    """A matched source row with a NULL value APPLIES the NULL — the
    coalesce formulation silently kept the stale target value (review
    finding, round 4)."""
    from maple_spark.operators.dml import merge_into

    target = spark.createDataFrame([(1, "active")], "id int, status string")
    source = spark.createDataFrame([(1, None)], "id int, status string")
    got = rows(merge_into(target, source, key=["id"]))
    assert got == [(1, None)]
