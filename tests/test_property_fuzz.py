"""Property-based cross-engine fuzzing: random filter/project/agg plans
must agree between Spark and DuckDB.

A lightweight sqllogictest-style randomized layer on top of the fixed
oracle suite: hypothesis generates predicate trees over the `part` table;
both engines evaluate the same SQL; counts and key-sums must match.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from conftest import SF_DIR

NUM_COLS = ["p_partkey", "p_size", "p_retailprice"]
STR_COLS = ["p_brand", "p_type", "p_name"]
OPS = ["<", "<=", ">", ">=", "=", "<>"]


@pytest.fixture(scope="module")
def engines(spark):
    from maple_spark.catalog import load_table

    df = load_table(spark, SF_DIR, "part")
    df.createOrReplaceTempView("fuzz_part")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW fuzz_part AS SELECT * FROM read_parquet('{SF_DIR}/part.parquet')"
    )
    return spark, con


num_pred = st.builds(
    lambda c, op, v: f"({c} {op} {v})",
    st.sampled_from(NUM_COLS),
    st.sampled_from(OPS),
    st.integers(min_value=-10, max_value=2500),
)
str_pred = st.builds(
    lambda c, v: f"({c} LIKE '%{v}%')",
    st.sampled_from(STR_COLS),
    st.sampled_from(["a", "e", "Brand#1", "STEEL", "zz", "PROMO"]),
)
leaf = st.one_of(num_pred, str_pred)


def combine(a, b, how):
    return f"({a} {how} {b})"


predicate = st.recursive(
    leaf,
    lambda children: st.builds(
        combine, children, children, st.sampled_from(["AND", "OR"])
    ),
    max_leaves=4,
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate)
def test_random_filters_agree(engines, pred):
    spark, con = engines
    sql = (
        "SELECT COUNT(*) AS n, "
        "CAST(SUM(CAST(p_partkey AS BIGINT)) AS BIGINT) AS s "
        f"FROM fuzz_part WHERE {pred}"
    )
    srow = spark.sql(sql).collect()[0]
    orow = con.execute(sql).fetchone()
    assert (srow["n"], srow["s"]) == (orow[0], orow[1]), pred


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    group=st.sampled_from(["p_brand", "p_size", "p_type"]),
    pred=predicate,
)
def test_random_groupby_agree(engines, group, pred):
    spark, con = engines
    sql = (
        f"SELECT {group} AS g, COUNT(*) AS n, MIN(p_partkey) AS mn, "
        f"MAX(p_partkey) AS mx FROM fuzz_part WHERE {pred} GROUP BY {group}"
    )
    srows = sorted(tuple(r) for r in spark.sql(sql).collect())
    orows = sorted(map(tuple, con.execute(sql).fetchall()))
    assert srows == orows, pred


# ----------------------------------------------------------------------
# Join fuzzing: random join type × random ON-clause residual predicate.
# ON-clause predicates on outer joins are where null-padding semantics
# genuinely bite (the reference's own NestedLoopsJoinNode never handled
# them — SURVEY.md J2); Spark and DuckDB must agree row-for-row.
# ----------------------------------------------------------------------

O_NUM = ["o_orderkey", "o_totalprice"]
C_NUM = ["c_custkey", "c_acctbal"]


@pytest.fixture(scope="module")
def join_engines(spark):
    from maple_spark.catalog import load_table

    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("fuzz_orders")
    load_table(spark, SF_DIR, "customer").createOrReplaceTempView("fuzz_customer")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW fuzz_orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    con.execute(
        f"CREATE VIEW fuzz_customer AS SELECT * FROM read_parquet('{SF_DIR}/customer.parquet')"
    )
    return spark, con


join_pred = st.builds(
    lambda c, op, v: f"({c} {op} {v})",
    st.sampled_from(O_NUM + C_NUM),
    st.sampled_from(OPS),
    st.integers(min_value=0, max_value=200000),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    how=st.sampled_from(["INNER", "LEFT", "RIGHT", "FULL"]),
    pred=join_pred,
)
def test_random_outer_joins_agree(join_engines, how, pred):
    spark, con = join_engines
    sql = (
        "SELECT COUNT(*) AS n, "
        "CAST(SUM(COALESCE(o_orderkey, 0)) AS BIGINT) AS so, "
        "CAST(SUM(COALESCE(c_custkey, 0)) AS BIGINT) AS sc "
        f"FROM fuzz_orders {how} JOIN fuzz_customer "
        f"ON o_custkey = c_custkey AND {pred}"
    )
    srow = spark.sql(sql).collect()[0]
    orow = con.execute(sql).fetchone()
    assert (srow["n"], srow["so"], srow["sc"]) == orow, (how, pred)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(group=st.sampled_from(["p_brand", "p_size", "p_type"]), pred=predicate)
def test_random_decimal_sums_agree(engines, group, pred):
    """The decimal-exact aggregation rule under random predicates: DECIMAL
    sums cast to double must be bit-identical across engines regardless of
    which rows a random filter admits."""
    spark, con = engines
    sql = (
        f"SELECT {group} AS g, "
        "CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS s, "
        "CAST(SUM(CAST(p_size AS DECIMAL(18,2))) AS DOUBLE) AS z "
        f"FROM fuzz_part WHERE {pred} GROUP BY {group}"
    )
    srows = sorted(tuple(r) for r in spark.sql(sql).collect())
    orows = sorted(map(tuple, con.execute(sql).fetchall()))
    assert srows == orows, pred


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(part=st.sampled_from(["p_brand", "p_type"]), pred=predicate)
def test_random_window_ranks_agree(engines, part, pred):
    """Window determinism under random filters: rank over a unique total
    order (p_partkey) must agree row-for-row."""
    spark, con = engines
    sql = (
        "SELECT p_partkey, "
        f"CAST(row_number() OVER (PARTITION BY {part} ORDER BY p_partkey ASC) AS BIGINT) AS rn "
        f"FROM fuzz_part WHERE {pred}"
    )
    srows = sorted(tuple(r) for r in spark.sql(sql).collect())
    orows = sorted(map(tuple, con.execute(sql).fetchall()))
    assert srows == orows, pred


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate)
def test_random_grouping_sets_agree(engines, pred):
    """GROUPING SETS under random predicates: every grouping level's
    counts, exact sums, and GROUPING() tags must agree across engines
    (exercises null-as-subtotal-marker vs null-in-data disambiguation).

    Known divergence, excluded: on EMPTY input the SQL standard (and
    DuckDB) still emit one () grand-total row (n=0), but Spark's
    Expand-based grouping-sets rewrite emits nothing — grand totals over
    possibly-empty filters need COUNT(*)-without-GROUP-BY instead."""
    from hypothesis import assume

    spark, con = engines
    assume(con.execute(f"SELECT COUNT(*) FROM fuzz_part WHERE {pred}").fetchone()[0] > 0)
    sql = (
        "SELECT p_brand, p_size, COUNT(*) AS n, "
        "CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS s, "
        "CAST(GROUPING(p_brand) AS INT) AS gb, "
        "CAST(GROUPING(p_size) AS INT) AS gs "
        f"FROM fuzz_part WHERE {pred} "
        "GROUP BY GROUPING SETS ((p_brand, p_size), (p_brand), ())"
    )
    srows = sorted((tuple(r) for r in spark.sql(sql).collect()),
                   key=lambda t: tuple((x is None, str(x)) for x in t))
    orows = sorted((tuple(r) for r in con.execute(sql).fetchall()),
                   key=lambda t: tuple((x is None, str(x)) for x in t))
    assert srows == orows, pred


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    part=st.sampled_from(["p_brand", "p_type"]),
    frame=st.sampled_from(
        ["ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
         "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
         "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"]
    ),
    pred=predicate,
)
def test_random_window_frames_agree(engines, part, frame, pred):
    """Frame-bounded window aggregates under random filters: exact decimal
    sums over explicit ROWS frames, plus lead/lag offsets, row-for-row."""
    spark, con = engines
    sql = (
        "SELECT p_partkey, "
        f"CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER "
        f"(PARTITION BY {part} ORDER BY p_partkey ASC {frame}) AS DOUBLE) AS ms, "
        f"lead(p_size, 1) OVER (PARTITION BY {part} ORDER BY p_partkey ASC) AS nx, "
        f"lag(p_size, 2) OVER (PARTITION BY {part} ORDER BY p_partkey ASC) AS pv "
        f"FROM fuzz_part WHERE {pred}"
    )
    srows = sorted((tuple(r) for r in spark.sql(sql).collect()),
                   key=lambda t: tuple((x is None, str(x)) for x in t))
    orows = sorted((tuple(r) for r in con.execute(sql).fetchall()),
                   key=lambda t: tuple((x is None, str(x)) for x in t))
    assert srows == orows, (part, frame, pred)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    col=st.sampled_from(["p_size", "p_brand", "p_retailprice", "p_partkey"]),
    direction=st.sampled_from(["ASC", "DESC"]),
    nulls=st.sampled_from(["NULLS FIRST", "NULLS LAST"]),
    limit=st.integers(min_value=1, max_value=50),
)
def test_random_order_by_limit_agree(engines, col, direction, nulls, limit):
    """Sort semantics parity (O1/O2: ordering directions × null placement
    × LIMIT): both engines must produce the identical ordered prefix.
    Ties broken on p_partkey so the prefix is deterministic."""
    spark, con = engines
    sql = (
        f"SELECT p_partkey FROM fuzz_part "
        f"ORDER BY {col} {direction} {nulls}, p_partkey ASC LIMIT {limit}"
    )
    sres = [r["p_partkey"] for r in spark.sql(sql).collect()]
    ores = [r[0] for r in con.execute(sql).fetchall()]
    assert sres == ores, sql


str_expr = st.recursive(
    st.sampled_from(["p_name", "p_brand", "p_type"]),
    lambda inner: st.one_of(
        st.builds(lambda e: f"lower({e})", inner),
        st.builds(lambda e: f"upper({e})", inner),
        st.builds(lambda e: f"trim({e})", inner),
        st.builds(lambda e, a, b: f"substr({e}, {a}, {b})", inner,
                  st.integers(min_value=1, max_value=8),
                  st.integers(min_value=0, max_value=12)),
        st.builds(lambda a, b: f"concat({a}, '-', {b})", inner, inner),
    ),
    max_leaves=3,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=str_expr)
def test_random_string_exprs_agree(engines, expr):
    """String-function compositions (lower/upper/trim/substr/concat) must
    produce identical values in both engines — fuzzed evidence for the
    §2.8 string surface beyond the fixed oracle queries."""
    spark, con = engines
    sql = (
        f"SELECT p_partkey, {expr} AS v FROM fuzz_part "
        "ORDER BY p_partkey LIMIT 200"
    )
    sres = [(r["p_partkey"], r["v"]) for r in spark.sql(sql).collect()]
    ores = con.execute(sql).fetchall()
    assert sres == [tuple(r) for r in ores], expr


# ---------------------------------------------------------------------------
# as-of join vs DuckDB's native ASOF JOIN
# ---------------------------------------------------------------------------

asof_key = st.integers(min_value=1, max_value=3)
asof_time = st.integers(min_value=0, max_value=20)
asof_left = st.lists(st.tuples(asof_key, asof_time), max_size=10)
# right side keyed by (key, time): duplicate right rows at the same
# (key, time) are ASOF-ambiguous in BOTH engines, so the generator never
# produces them (the operator's docstring documents the tie convention
# only across sides, not within the right side)
asof_right = st.dictionaries(
    st.tuples(asof_key, asof_time),
    st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
    max_size=10,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=asof_left, right=asof_right)
def test_random_asof_joins_agree(spark, left, right):
    """Custom-operator fuzz: as_of_join (union-and-carry window
    formulation) must agree with DuckDB's native ASOF LEFT JOIN on random
    keyed event sets — duplicate left rows, NULL payloads (carried row
    must stay NULL — no stale fill), keys with no right rows, empty
    sides."""
    from maple_spark.operators.asof import as_of_join

    lrows = [(i, k, t) for i, (k, t) in enumerate(left)]
    rrows = [(k, t, v) for (k, t), v in right.items()]
    ldf = spark.createDataFrame(
        lrows, "lid int, k int, lt int"
    ) if lrows else spark.createDataFrame([], "lid int, k int, lt int")
    rdf = spark.createDataFrame(
        rrows, "k int, rt int, v int"
    ) if rrows else spark.createDataFrame([], "k int, rt int, v int")

    got = sorted(
        (r["lid"], r["v"])
        for r in as_of_join(
            ldf, rdf, key="k", left_time="lt", right_time="rt",
            payload_cols=["v"],
        ).collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE l (lid INT, k INT, lt INT)")
    con.execute("CREATE TABLE r (k INT, rt INT, v INT)")
    if lrows:
        con.executemany("INSERT INTO l VALUES (?, ?, ?)", lrows)
    if rrows:
        con.executemany("INSERT INTO r VALUES (?, ?, ?)", rrows)
    want = sorted(
        (lid, v)
        for lid, v in con.execute(
            "SELECT l.lid, r.v FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND l.lt >= r.rt"
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# bag-semantics set operations (INTERSECT ALL / EXCEPT ALL)
# ---------------------------------------------------------------------------

bag_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        st.integers(min_value=0, max_value=2),
    ),
    max_size=8,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=bag_rows, b=bag_rows, op=st.sampled_from(["INTERSECT ALL", "EXCEPT ALL", "INTERSECT", "EXCEPT"]))
def test_random_set_ops_agree(spark, a, b, op):
    """Multiset set-op fuzz: INTERSECT/EXCEPT (ALL) over small random
    bags with NULL keys and duplicate rows — bag semantics
    (min/difference of multiplicities) and NULL-equality grouping must
    match DuckDB row for row."""
    schema = "x int, y int"
    adf = spark.createDataFrame(a, schema) if a else spark.createDataFrame([], schema)
    bdf = spark.createDataFrame(b, schema) if b else spark.createDataFrame([], schema)
    adf.createOrReplaceTempView("fuzz_bag_a")
    bdf.createOrReplaceTempView("fuzz_bag_b")
    sql = f"SELECT x, y FROM fuzz_bag_a {op} SELECT x, y FROM fuzz_bag_b"
    got = sorted(
        ((r["x"] is not None, r["x"] or 0), r["y"])
        for r in spark.sql(sql).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_bag_a (x INT, y INT)")
    con.execute("CREATE TABLE fuzz_bag_b (x INT, y INT)")
    if a:
        con.executemany("INSERT INTO fuzz_bag_a VALUES (?, ?)", a)
    if b:
        con.executemany("INSERT INTO fuzz_bag_b VALUES (?, ?)", b)
    want = sorted(
        ((x is not None, x or 0), y) for x, y in con.execute(sql).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# distributed two-pass rank vs the naive global window
# ---------------------------------------------------------------------------

rank_rows = st.lists(
    st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ks=rank_rows, n_buckets=st.sampled_from([1, 2, 3, 8]))
def test_random_distributed_rank_agrees(spark, ks, n_buckets):
    """o1's two-pass bucketed rank must equal the single-partition global
    row_number on arbitrary small NULL/duplicate-heavy inputs at any
    bucket count — including n_buckets=1 (degenerate: one bucket) and
    all-NULL keys (no cut points)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from maple_spark.operators.sort import distributed_row_number

    data = [(i, k) for i, k in enumerate(ks)]
    df = spark.createDataFrame(data, "id int, k int")
    keys = [F.col("k").asc_nulls_first(), F.col("id").asc()]
    got = sorted(
        tuple(r)
        for r in distributed_row_number(
            df, "k", keys, rn_name="rn", n_buckets=n_buckets
        ).select("id", "rn").collect()
    )
    want = sorted(
        tuple(r)
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*keys)).cast("bigint")
        ).select("id", "rn").collect()
    )
    assert got == want


# ----------------------------------------------------------------------
# BPE encoding invariants (d7/bpe round): random ASCII corpora


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(
            alphabet=st.sampled_from("ab'c\\-.x "),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_zero_merges_counts_chars(spark, words):
    """With NO merges, every character is its own token, so the doc's
    token count is the summed length of its (non-empty, '|'-free)
    words — the base-case anchor of the |sym| wrapper encoding, over
    corpora that include quotes, backslashes, dots, and empty words."""
    from maple_spark.pipelines.textstats import bpe_token_counts

    text = " ".join(w.replace(" ", "") for w in words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = bpe_token_counts(docs, []).collect()[0]["n_tokens"]
    want = sum(len(w) for w in text.split(" ") if w and "|" not in w)
    assert got == want, repr(text)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet=st.sampled_from("abc'"), min_size=1, max_size=5),
        min_size=2,
        max_size=6,
    )
)
def test_bpe_merges_never_increase_token_count(spark, words):
    """Each learned merge coalesces adjacent symbols, so the corpus
    token count is non-increasing round over round (and the learned
    pair counts are positive)."""
    from maple_spark.pipelines.textstats import (
        bpe_merges,
        bpe_token_counts,
    )

    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merges(docs, k=3).collect()
    ]
    assert all(c > 0 for _, _, c in merges)
    prev = bpe_token_counts(docs, []).collect()[0]["n_tokens"]
    for i in range(1, len(merges) + 1):
        cur = bpe_token_counts(
            docs, [(l, r) for l, r, _ in merges[:i]]
        ).collect()[0]["n_tokens"]
        assert cur <= prev, (merges[:i], text)
        prev = cur


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet=st.sampled_from("aab'c."), min_size=1, max_size=7),
        min_size=2,
        max_size=10,
    )
)
def test_bpe_hybrid_driver_tier_matches_distributed(spark, words):
    """The hybrid's driver-local tier (site-local incremental pair
    counts + lazy-deletion heap) must reproduce the distributed rounds
    verbatim on random repetitive corpora — the alphabet is skewed
    toward 'a' so adjacent/overlapping merge sites (the subtle update
    cases) occur constantly."""
    from maple_spark.pipelines.textstats import bpe_merges, bpe_merges_hybrid

    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    base = [tuple(r) for r in bpe_merges(docs, k=6).collect()]
    got = [tuple(r) for r in bpe_merges_hybrid(docs, k=6).collect()]
    assert got == base, (text, base, got)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.sampled_from(["a", "b", "c", "åß", "x'y", ""]),
                max_size=6,
            ).map(" ".join),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_perplexity_family_oracle_agree_on_random_corpora(
    spark, tmp_path_factory, texts
):
    """The LM scorers (inline tiers t19/t20/t21/t23 and the snapshot
    gates t19s/t20s) must stay value-exact vs their DuckDB oracles
    on RANDOM corpora — NULL texts, empty/whitespace-only texts,
    multi-space runs (empty tokens), unicode, quote characters, and
    corpora whose md5 train half is empty (every count NULL) are all
    reachable here where the fixed fixtures reach none of them."""
    import duckdb as _duck
    import math

    import __spark_entry__ as e

    tmp = str(tmp_path_factory.mktemp("lmfuzz"))
    docs = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    con = _duck.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the file glob
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp}/documents.parquet/*.parquet')"
    )

    def norm(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            vals = []
            for i in order:
                v = r[i]
                if isinstance(v, float):
                    v = None if math.isnan(v) else round(v, 9)
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=repr)

    for name in (
        "t19_perplexity_score",
        "t20_bigram_perplexity",
        "t21_trigram_perplexity",
        "t23_fivegram_perplexity",
        "t19s_lm_snapshot_score",
        # the snapshot BACKOFF path: meta/order round-trip + the
        # persisted-model scoring chain under empty-train/NULL regimes
        # (the max(lit(order))-over-empty-vocab NULL-order regression
        # was only reachable through a snapshot entry)
        "t20s_lm_snapshot_backoff",
    ):
        sdf = e.queries()[name](spark, tmp).toPandas()
        odf = con.execute(e.oracle_sql()[name]).fetchdf()
        odf = odf.astype(object).where(odf.notna(), None)
        sdf = sdf.astype(object).where(sdf.notna(), None)
        assert sorted(sdf.columns) == sorted(odf.columns), name
        got = norm(list(sdf.columns), list(sdf.itertuples(index=False)))
        want = norm(list(odf.columns), list(odf.itertuples(index=False)))
        assert got == want, (name, texts, got, want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.lists(
                    st.sampled_from(
                        ["the", "be", "ab", "x1", "##", "...", "åß",
                         "-", "*", "•x", 'a"b', ""]
                    ),
                    max_size=7,
                ).map(" ".join),
                max_size=4,
            ).map("\n".join),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_gopher_rules_oracle_agrees_on_random_corpora(
    spark, tmp_path_factory, texts
):
    """t24 must stay value-exact vs its DuckDB oracle on RANDOM
    corpora — the cross-engine surface here is the line split
    (split('\\n') vs string_split(chr(10))), LIKE-vs-startswith/endswith
    bullet and ellipsis matching ('- ', '* ', '•', '%...'),
    regexp_count vs regexp_extract_all for '#'/'...' (non-overlapping
    left-to-right in both), the [A-Za-z] word class on unicode, and the
    NULL/empty/whitespace-only regimes where every metric must surface
    NULL with keep=false in BOTH engines."""
    import math

    import duckdb as _duck

    import __spark_entry__ as e

    tmp = str(tmp_path_factory.mktemp("gopherfuzz"))
    docs = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    con = _duck.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp}/documents.parquet/*.parquet')"
    )

    def norm(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            vals = []
            for i in order:
                v = r[i]
                if isinstance(v, float):
                    v = None if math.isnan(v) else round(v, 9)
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=repr)

    sdf = e.queries()["t24_gopher_rules"](spark, tmp).toPandas()
    odf = con.execute(e.oracle_sql()["t24_gopher_rules"]).fetchdf()
    odf = odf.astype(object).where(odf.notna(), None)
    sdf = sdf.astype(object).where(sdf.notna(), None)
    assert sorted(sdf.columns) == sorted(odf.columns)
    got = norm(list(sdf.columns), list(sdf.itertuples(index=False)))
    want = norm(list(odf.columns), list(odf.itertuples(index=False)))
    assert got == want, (texts, got, want)
