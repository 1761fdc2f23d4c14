"""Coverage for the smaller public API surface: helpers that are part of
the declared operator/library interface but weren't exercised by the
operator suites (found by a symbol-reference audit).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR, rows


def test_top_k_plans_take_ordered(spark):
    """operators.sort.top_k = order_by + limit → TakeOrderedAndProject
    (per-partition partial top-k, no global sort)."""
    from maple_spark.catalog import load_table
    from maple_spark.operators.sort import top_k

    df = load_table(spark, SF_DIR, "orders")
    got = top_k(df.select("o_orderkey", "o_totalprice"), 5, ("o_totalprice", False))
    vals = [r["o_totalprice"] for r in got.collect()]
    assert vals == sorted(vals, reverse=True) and len(vals) == 5
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_union_all_by_name(spark):
    """setops.union_all resolves independent projection orders by name."""
    from maple_spark.operators.setops import union_all

    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = spark.createDataFrame([("y", 2)], "v string, id long")
    got = rows(union_all(a, b))
    assert got == rows(spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string"))


def test_scan_csv_with_schema(spark, tmp_path):
    """operators.scan.scan_csv: explicit schema skips the inference pass
    (LoadFileCommand parity)."""
    from maple_spark.operators.scan import scan_csv

    p = tmp_path / "t.csv"
    p.write_text("1,a\n2,b\n")
    df = scan_csv(spark, str(p), schema="id int, name string")
    assert rows(df) == [(1, "a"), (2, "b")]
    assert [f.name for f in df.schema.fields] == ["id", "name"]


def test_analyze_table_computes_stats(spark, tmp_path):
    """plans.analyze_table writes CBO statistics readable from the
    catalog (AnalyzeCommand parity)."""
    import shutil

    from maple_spark.plans import analyze_table

    spark.sql("DROP TABLE IF EXISTS api_stats_t")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        shutil.rmtree(
            warehouse.removeprefix("file:") + "/api_stats_t", ignore_errors=True
        )
    spark.createDataFrame([(i,) for i in range(10)], "x int").write.saveAsTable(
        "api_stats_t"
    )
    analyze_table(spark, "api_stats_t", columns=["x"])
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED api_stats_t").collect()
    }
    assert "Statistics" in desc and "10 rows" in desc["Statistics"]
    spark.sql("DROP TABLE api_stats_t")


def test_resize_images_stub_updates_metadata_only(spark):
    """multimodal.resize_images: records target dims for image rows,
    passes bytes through unchanged (schema in == schema out)."""
    from maple_spark.pipelines.multimodal import documents_as_media, resize_images

    docs = spark.createDataFrame(
        [(i, "x" * (20 + i)) for i in range(1, 7)], "doc_id long, text string"
    )
    media = documents_as_media(docs)
    out = resize_images(media, 224, 224)
    assert out.schema == media.schema
    for r in out.collect():
        if r["modality"] == "image":
            assert (r["meta_width"], r["meta_height"]) == (224, 224)


def test_with_cosine_helper(spark):
    from maple_spark.pipelines.similarity import with_cosine

    pairs = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        "qvec array<float>, embedding array<float>",
    )
    got = [round(r["cosine"], 6) for r in with_cosine(pairs).collect()]
    assert got == [0.0, 1.0]


def test_running_sum_aggregate_contract():
    """functions.udf.RunningSumAggregate — the reference
    AggregateFunction clear/add/getResult contract (parity shim)."""
    from maple_spark.functions.udf import RunningSumAggregate

    agg = RunningSumAggregate()
    assert agg.get_result() is None
    agg.add(3)
    agg.add(None)
    agg.add(4)
    assert agg.get_result() == 7
    agg.clear()
    assert agg.get_result() is None


def test_table_constraints_dataclass_and_fk_check(spark):
    """constraints.TableConstraints declaration + fk_violations wiring."""
    from maple_spark.constraints import TableConstraints, fk_violations

    tc = TableConstraints(
        primary_key=["id"],
        not_null=["name"],
        foreign_keys=[(["rid"], "refs", ["id"])],
    )
    assert tc.primary_key == ["id"] and tc.foreign_keys[0][1] == "refs"
    child = spark.createDataFrame([(1, 10), (2, 99)], "id long, rid long")
    parent = spark.createDataFrame([(10,)], "id long")
    bad = fk_violations(child, ["rid"], parent, ["id"])
    assert [r["rid"] for r in bad.collect()] == [99]


def test_master_url_like_grammar():
    # session.py only honors SPARK_MASTER when it parses as a real Spark
    # master URL; anything else must fall through to the local[N] default
    from maple_spark.session import _master_url_like

    accepted = [
        "local", "local[4]", "local[*]", "local[4,2]",
        "local-cluster[2,1,1024]",
        "spark://host:7077", "yarn", "k8s://https://host:443",
        "mesos://host:5050",
    ]
    rejected = [
        "", "localhost:7077", "local[abc]", "local[]", "local[4,]",
        "local-cluster[2,1]", "local-cluster[a,b,c]", "LOCAL[4]",
        "local[4][2]",
    ]
    for v in accepted:
        assert _master_url_like(v), v
    for v in rejected:
        assert not _master_url_like(v), v


def test_top_word_count_nan_and_none_map_to_null():
    # Arrow conversion may surface missing strings as None or float NaN
    # depending on pandas dtype; both must map to NULL, not AttributeError
    import pandas as pd

    from maple_spark.pipelines.curation import _top_word_count

    func = getattr(_top_word_count, "func", None)
    assert func is not None, "cannot reach underlying kernel"
    out = func(pd.Series(["a a b", None, float("nan")]))
    assert out.iloc[0] == 2
    assert pd.isna(out.iloc[1])
    assert pd.isna(out.iloc[2])
