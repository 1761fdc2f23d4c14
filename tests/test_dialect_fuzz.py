"""Property-fuzz for the reference-dialect front-end (VERDICT r4 task 8):
randomized CREATE STORE / INSERT / UPDATE / DELETE scripts — mixed-case
keywords, ragged whitespace, column-list permutations, quoted literals
full of keywords/escapes/unicode — replayed end-to-end through
``MapleEngine.execute_script`` against an in-memory Python model.  Any
routing slip (a keyword inside a literal steering the regex dispatch, a
clause boundary mis-cut, a column-list misalignment) diverges the store
from the model and fails the final byte-exact compare.

Statement budget: SEEDS × OPS_PER_SEED = 200 randomized DML statements,
plus one randomized CREATE STORE per seed.
"""

from __future__ import annotations

import random

import pytest

from conftest import SF_DIR

SEEDS = 5
OPS_PER_SEED = 40

#: literal fragments chosen to look like SQL clause soup
FRAGS = [
    "WHERE x", "SET y = 'z'", "VALUES (1)", "SELECT * FROM t",
    "a, b", "(nested)", "it's", " WHERE ", "AND OR NOT", "--dash",
    "DELETE FROM states", "INSERT INTO", "Ünïcode ☃", ";semi", "",
    "O''Brien style", "100% -- sure",
]


@pytest.fixture()
def engine(spark, tmp_path):
    from maple_spark.engine import MapleEngine

    return MapleEngine(spark, SF_DIR, warehouse=str(tmp_path / "stores"))


def _mixed_case(rnd: random.Random, kw: str) -> str:
    return "".join(c.upper() if rnd.random() < 0.5 else c.lower() for c in kw)


def _ws(rnd: random.Random) -> str:
    return rnd.choice([" ", "  ", "\n ", "\t", " \n\t "])


def _lit(rnd: random.Random) -> str:
    return " ".join(rnd.sample(FRAGS, rnd.randint(1, 3)))


@pytest.mark.parametrize("seed", range(SEEDS))
def test_dialect_dml_fuzz_vs_model(engine, tmp_path, seed):
    rnd = random.Random(90000 + seed)
    csv = tmp_path / f"seed{seed}.csv"
    base = {i: (f"name{i}", float(i) + 0.5) for i in range(1, 6)}
    csv.write_text(
        "".join(f"{i},{n},{v}\n" for i, (n, v) in sorted(base.items()))
    )
    ctor = rnd.choice(["CREATE STORE", "CREATE COLSTORE"])
    engine.execute_script(
        f"{_mixed_case(rnd, ctor)}{_ws(rnd)}states{_ws(rnd)}"
        f"{_mixed_case(rnd, 'FROM')}{_ws(rnd)}'{csv}'"
        f"{_ws(rnd)}(id int, name varchar(200), val double)"
    )
    model = dict(base)
    nxt = 100

    for _ in range(OPS_PER_SEED):
        op = rnd.choice(
            ["insert", "insert_cols", "update", "update_arith", "delete",
             "delete_in"]
        )
        if op == "insert":
            lit = _lit(rnd)
            v = float(rnd.randint(0, 50)) + 0.25
            engine.execute_script(
                f"{_mixed_case(rnd, 'INSERT INTO')}{_ws(rnd)}states"
                f"{_ws(rnd)}{_mixed_case(rnd, 'VALUES')}{_ws(rnd)}"
                f"({nxt},{_ws(rnd)}'{lit.replace(chr(39), chr(39) * 2)}', {v})"
            )
            model[nxt] = (lit, v)
            nxt += 1
        elif op == "insert_cols":
            lit = _lit(rnd)
            v = float(rnd.randint(0, 50)) + 0.75
            cols = [("id", str(nxt)),
                    ("name", f"'{lit.replace(chr(39), chr(39) * 2)}'"),
                    ("val", str(v))]
            rnd.shuffle(cols)
            engine.execute_script(
                f"{_mixed_case(rnd, 'INSERT INTO')} states"
                f"{_ws(rnd)}({', '.join(c for c, _ in cols)})"
                f"{_ws(rnd)}{_mixed_case(rnd, 'VALUES')}"
                f"{_ws(rnd)}({', '.join(x for _, x in cols)})"
            )
            model[nxt] = (lit, v)
            nxt += 1
        elif op == "update":
            lit = _lit(rnd)
            cmp_op, k = rnd.choice(["=", ">", "<="]), rnd.choice(
                sorted(model) if model else [1]
            )
            engine.execute_script(
                f"{_mixed_case(rnd, 'UPDATE')}{_ws(rnd)}states"
                f"{_ws(rnd)}{_mixed_case(rnd, 'SET')} name ="
                f" '{lit.replace(chr(39), chr(39) * 2)}'"
                f"{_ws(rnd)}{_mixed_case(rnd, 'WHERE')} id {cmp_op} {k}"
            )
            for i in list(model):
                hit = (i == k if cmp_op == "=" else
                       i > k if cmp_op == ">" else i <= k)
                if hit:
                    model[i] = (lit, model[i][1])
        elif op == "update_arith":
            # multi-assignment with arithmetic over OTHER columns: all SET
            # expressions must evaluate against the PRE-update row (the
            # update_where one-projection contract) — chained withColumn
            # semantics would diverge the model here
            cmp_op, k = rnd.choice(["=", ">", "<="]), rnd.choice(
                sorted(model) if model else [1]
            )
            engine.execute_script(
                f"{_mixed_case(rnd, 'UPDATE')}{_ws(rnd)}states"
                f"{_ws(rnd)}{_mixed_case(rnd, 'SET')} val = val * 2 + id,"
                f"{_ws(rnd)}name = upper(name)"
                f"{_ws(rnd)}{_mixed_case(rnd, 'WHERE')} id {cmp_op} {k}"
            )
            for i in list(model):
                hit = (i == k if cmp_op == "=" else
                       i > k if cmp_op == ">" else i <= k)
                if hit:
                    n, v = model[i]
                    model[i] = (n.upper(), v * 2 + i)
        elif op == "delete_in":
            if len(model) <= 3:
                continue  # keep the store populated
            ks = rnd.sample(sorted(model), rnd.randint(1, 2))
            # mix hits with misses — the miss ids must not delete anything
            ks.append(rnd.randint(9000, 9999))
            rnd.shuffle(ks)
            engine.execute_script(
                f"{_mixed_case(rnd, 'DELETE FROM')}{_ws(rnd)}states"
                f"{_ws(rnd)}{_mixed_case(rnd, 'WHERE')} id"
                f" {_mixed_case(rnd, 'IN')} ({', '.join(map(str, ks))})"
            )
            for k in ks:
                model.pop(k, None)
        else:  # delete
            if len(model) <= 2:
                continue  # keep the store populated
            k = rnd.choice(sorted(model))
            engine.execute_script(
                f"{_mixed_case(rnd, 'DELETE FROM')}{_ws(rnd)}states"
                f"{_ws(rnd)}{_mixed_case(rnd, 'WHERE')} id = {k}"
            )
            model.pop(k, None)

    got = {
        r["id"]: (r["name"], r["val"])
        for r in engine.sql("SELECT id, name, val FROM states").collect()
    }
    assert got == model


def test_dialect_utility_statements_interleaved(engine, tmp_path):
    """Utility statements (ANALYZE / VERIFY / OPTIMIZE / EXPLAIN DML /
    CREATE INDEX) randomly interleaved with DML must route correctly
    (no misdispatch into spark.sql, no side effects on data): after the
    soup, the store still equals the model byte-exactly."""
    rnd = random.Random(777)
    csv = tmp_path / "u.csv"
    csv.write_text("".join(f"{i},n{i},{i}.5\n" for i in range(1, 6)))
    engine.execute_script(
        f"CREATE STORE states FROM '{csv}' (id int, name varchar(200), val double)"
    )
    model = {i: (f"n{i}", i + 0.5) for i in range(1, 6)}
    nxt = 50
    utilities = [
        "ANALYZE states",
        "ANALYZE VERBOSE states",
        "VERIFY states",
        "OPTIMIZE states",
        "EXPLAIN SELECT * FROM states",
        "EXPLAIN UPDATE states SET name = 'x' WHERE id = 1",
        "EXPLAIN DELETE FROM states WHERE id = 1",
        "CREATE INDEX idx_states ON states (id)",
        # EXPORT is read-only on the store; repeated exports just
        # overwrite the same sink dir (mode=overwrite contract)
        f"EXPORT states TO '{tmp_path}/exp_soup' FORMAT orc",
        f"EXPORT states TO '{tmp_path}/exp_part' PARTITION BY (id)",
        f"EXPORT states TO '{tmp_path}/exp_z' COMPRESSION zstd",
    ]
    # write→read round-trip seeds for the IMPORT soup entries (round 12:
    # IMPORT joins the soup so routing slips / misdispatch into
    # spark.sql are fuzz-caught like every other utility statement);
    # imported views are read-only snapshots of the store AT EXPORT
    # TIME, so the soup only checks routing + readability, and the
    # final model equality below proves they never leak into `states`
    engine.execute_script(
        f"EXPORT states TO '{tmp_path}/imp_seed' PARTITION BY (id)"
    )
    engine.execute_script(
        f"EXPORT states TO '{tmp_path}/imp_seed_csv' FORMAT csv"
    )
    utilities += [
        f"IMPORT imp_a FROM '{tmp_path}/imp_seed'",
        f"IMPORT imp_b FROM '{tmp_path}/imp_seed' FORMAT parquet",
        f"IMPORT imp_c FROM '{tmp_path}/imp_seed_csv' FORMAT csv",
    ]
    for step in range(30):
        if rnd.random() < 0.5:
            stmt = rnd.choice(utilities)
            res = engine.execute_script(_mixed_case(rnd, stmt) if "'" not in stmt
                                        else stmt)
            # EXPLAIN DML must NOT execute the mutation
            assert {
                r["id"]: (r["name"], r["val"])
                for r in engine.sql("SELECT * FROM states").collect()
            } == model, stmt
        else:
            lit = _lit(rnd)
            engine.execute_script(
                f"INSERT INTO states VALUES ({nxt},"
                f" '{lit.replace(chr(39), chr(39) * 2)}', {nxt}.25)"
            )
            model[nxt] = (lit, nxt + 0.25)
            nxt += 1
    got = {
        r["id"]: (r["name"], r["val"])
        for r in engine.sql("SELECT id, name, val FROM states").collect()
    }
    assert got == model
    # an export after the soup must reflect the final store state
    res = engine.execute_script(
        f"EXPORT states TO '{tmp_path}/exp_final' FORMAT parquet"
    )
    assert {r["id"]: (r["name"], r["val"]) for r in res[0]} == model


SELECT_SEEDS = 3
SELECTS_PER_SEED = 40


@pytest.mark.parametrize("seed", range(SELECT_SEEDS))
def test_dialect_select_fuzz_vs_duckdb(engine, tmp_path, seed):
    """Reference-grammar SELECT fidelity fuzz (VERDICT r5 watch item;
    grammar grown r9 per VERDICT r8 task 7): randomized SELECTs —
    mixed-case keywords, ragged whitespace, nested boolean predicates,
    BETWEEN/IN/LIKE, IS [NOT] NULL over genuine NULLs (nullif), CASE
    projections, NATURAL / USING joins against a second store, optional
    GROUP BY/HAVING — routed through ``MapleEngine.execute_script``
    (the dialect front-end) and replayed on a DuckDB twin of the same
    stores.  Results compare as sorted row multisets (no ORDER BY in the
    generated grammar, so tie order cannot diverge); any routing slip
    or semantic mismatch in the shared SQL surface fails byte-exactly.

    The grammar deliberately stays inside the SQL both engines define
    identically (integer/decimal-exact arithmetic, 3VL comparisons,
    string ops) — the point is the FRONT-END, not engine divergence."""
    import duckdb

    rnd = random.Random(41000 + seed)
    csv = tmp_path / f"sel{seed}.csv"
    rows_data = [
        (i, f"name{i % 7}", i + 0.5) for i in range(1, 41)
    ]
    csv.write_text("".join(f"{i},{n},{v}\n" for i, n, v in rows_data))
    engine.execute_script(
        f"CREATE STORE states FROM '{csv}' (id int, name varchar(200), val double)"
    )
    # second store sharing ONLY the join column name `id` (so NATURAL
    # JOIN means USING (id) in both engines) and covering a strict
    # subset of ids — inner joins genuinely drop rows
    tags_csv = tmp_path / f"tags{seed}.csv"
    tags_data = [(i, f"tag{i % 3}") for i in range(1, 41, 2)]
    tags_csv.write_text("".join(f"{i},{t}\n" for i, t in tags_data))
    engine.execute_script(
        f"CREATE STORE tags FROM '{tags_csv}' (id int, tag varchar(50))"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE states (id INTEGER, name VARCHAR, val DOUBLE)")
    con.executemany("INSERT INTO states VALUES (?, ?, ?)", rows_data)
    con.execute("CREATE TABLE tags (id INTEGER, tag VARCHAR)")
    con.executemany("INSERT INTO tags VALUES (?, ?)", tags_data)

    def pred(depth=0):
        choices = [
            lambda: f"id {rnd.choice(['=', '<>', '<', '<=', '>', '>='])} {rnd.randint(0, 45)}",
            lambda: f"val {_mixed_case(rnd, 'BETWEEN')} {rnd.randint(0, 20)} {_mixed_case(rnd, 'AND')} {rnd.randint(20, 45)}",
            lambda: f"id {_mixed_case(rnd, 'IN')} ({', '.join(str(rnd.randint(0, 45)) for _ in range(rnd.randint(1, 4)))})",
            lambda: f"name {_mixed_case(rnd, 'LIKE')} 'name{rnd.randint(0, 9)}%'",
            lambda: f"{_mixed_case(rnd, 'NOT')} (id = {rnd.randint(0, 45)})",
            # IS [NOT] NULL over a genuine NULL (nullif is identical in
            # both engines) — E11 through the front-end
            lambda: f"nullif(name, 'name{rnd.randint(0, 6)}')"
                    f" {_mixed_case(rnd, rnd.choice(['IS NULL', 'IS NOT NULL']))}",
        ]
        p = rnd.choice(choices)()
        if depth < 2 and rnd.random() < 0.4:
            q = pred(depth + 1)
            return f"({p}{_ws(rnd)}{_mixed_case(rnd, rnd.choice(['AND', 'OR']))}{_ws(rnd)}{q})"
        return p

    def run_one():
        joined = rnd.random() < 0.25
        grouped = not joined and rnd.random() < 0.3
        distinct_q = False
        if joined:
            # J5 through the front-end: NATURAL JOIN / JOIN..USING against
            # the second store; the shared column is exactly `id`, so the
            # two spellings are equivalent — which one is generated is
            # random, and predicates stay on unambiguous columns
            how = rnd.choice(["natural", "using"])
            projs = rnd.sample(
                ["id", "name", "val", "tag", "upper(tag) AS ut",
                 "id * 2 AS dbl"],
                rnd.randint(1, 3),
            )
            if how == "natural":
                join_sql = (
                    f"{_mixed_case(rnd, 'FROM')} states"
                    f"{_ws(rnd)}{_mixed_case(rnd, 'NATURAL JOIN')}{_ws(rnd)}tags"
                )
            else:
                join_sql = (
                    f"{_mixed_case(rnd, 'FROM')} states"
                    f"{_ws(rnd)}{_mixed_case(rnd, 'JOIN')}{_ws(rnd)}tags"
                    f"{_ws(rnd)}{_mixed_case(rnd, 'USING')} (id)"
                )
            sql = (
                f"{_mixed_case(rnd, 'SELECT')}{_ws(rnd)}{', '.join(projs)}"
                f"{_ws(rnd)}{join_sql}"
                f"{_ws(rnd)}{_mixed_case(rnd, 'WHERE')} {pred()}"
            )
        elif grouped:
            aggs = rnd.sample(
                [
                    "COUNT(*) AS c",
                    "MIN(id) AS mn",
                    "MAX(val) AS mx",
                    "SUM(id) AS s",
                ],
                rnd.randint(1, 3),
            )
            sql = (
                f"{_mixed_case(rnd, 'SELECT')}{_ws(rnd)}id % 3 AS g,"
                f" {', '.join(aggs)}"
                f"{_ws(rnd)}{_mixed_case(rnd, 'FROM')} states"
                f"{_ws(rnd)}{_mixed_case(rnd, 'WHERE')} {pred()}"
                f"{_ws(rnd)}{_mixed_case(rnd, 'GROUP BY')} id % 3"
            )
            if rnd.random() < 0.5:
                sql += f"{_ws(rnd)}{_mixed_case(rnd, 'HAVING')} COUNT(*) > 1"
        elif rnd.random() < 0.2:
            # DISTINCT over a low-cardinality projection (name has 7
            # values) — exercises the A8 surface through the front-end
            distinct_q = True
            sql = (
                f"{_mixed_case(rnd, 'SELECT DISTINCT')}{_ws(rnd)}name,"
                f" id % {rnd.randint(2, 4)} AS g"
                f"{_ws(rnd)}{_mixed_case(rnd, 'FROM')} states"
                f"{_ws(rnd)}{_mixed_case(rnd, 'WHERE')} {pred()}"
            )
        else:
            projs = rnd.sample(
                [
                    "id",
                    "name",
                    "val",
                    "id + 7 AS id7",
                    "id * 2 AS dbl",
                    "upper(name) AS un",
                    "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS par",
                    "name || '!' AS bang",
                    "abs(id - 20) AS a20",
                    "length(name) AS ln",
                    "substr(name, 1, 4) AS s4",
                ],
                rnd.randint(1, 4),
            )
            sql = (
                f"{_mixed_case(rnd, 'SELECT')}{_ws(rnd)}{', '.join(projs)}"
                f"{_ws(rnd)}{_mixed_case(rnd, 'FROM')} states"
                f"{_ws(rnd)}{_mixed_case(rnd, 'WHERE')} {pred()}"
            )
        # ORDER BY a UNIQUE key + LIMIT → deterministic row ORDER, so the
        # compare below goes order-sensitive (O1/O3 through the front-end).
        # DISTINCT is excluded: ORDER BY a non-projected column is illegal
        # after DISTINCT in both engines.
        ordered = not grouped and not distinct_q and rnd.random() < 0.3
        if ordered:
            sql += (
                f"{_ws(rnd)}{_mixed_case(rnd, 'ORDER BY')} id"
                f" {_mixed_case(rnd, rnd.choice(['ASC', 'DESC']))}"
                f"{_ws(rnd)}{_mixed_case(rnd, 'LIMIT')} {rnd.randint(1, 15)}"
            )

        def canon(rows_in):
            vals = [
                tuple(
                    round(v, 9) if isinstance(v, float) else v for v in r
                )
                for r in rows_in
            ]
            return vals if ordered else sorted(vals)

        got = canon(engine.execute_script(sql)[0] or [])
        want = canon(con.execute(sql).fetchall())
        assert got == want, sql

    for _ in range(SELECTS_PER_SEED):
        run_one()
