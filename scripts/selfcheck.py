"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names,
and exact values (rows sorted by all columns, columns sorted by name) —
the strictest reading of the driver's value-hash compare.

Usage: python scripts/selfcheck.py [sf_dir] [query ...] [-excluded_query ...]
       SELFCHECK_JSON=out.json python scripts/selfcheck.py ...   # also write
       a machine-readable per-query record (committed per round as
       SELFCHECK_r{N}.json so the full-registry claim is reproducible)

Scale note: the gate SF is 0.01.  At sf0.1 exclude the SEVEN
quadratic-oracle entries (-d2_ngram_jaccard -d3_minhash_lsh
-d4_simhash_pairs -d5_dedup_clusters -sim2_embedding_near_dup
-d7_canonical_docs -cp4_dedup_token_budget — the last two replay d5's
exact-Jaccard CTE chain): the synthetic corpus has a ~50-word
vocabulary, so the oracle's shingle self-join explodes (observed 63 GB
of DuckDB spill at r10; an r11 run WITH d7 included filled the disk at
76 GB and took the host to ENOSPC) while the SPARK sides stay
bucketed/bounded — that asymmetry is the point of the scalable
formulations.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def normalize(df, float_ndigits=9):
    """pandas DataFrame → canonical sorted list of tuples."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None:
                row.append(None)
            elif isinstance(v, float):
                if math.isnan(v):
                    row.append(None)
                else:
                    row.append(round(v, float_ndigits))
            else:
                row.append(v)
        rows.append(tuple(row))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # bare names = run only those; "-name" = exclude (e.g. the
    # intentionally-quadratic exact verifiers d2/d5 at sf >= 0.1)
    only = {a for a in sys.argv[2:] if not a.startswith("-")}
    excluded = {a[1:] for a in sys.argv[2:] if a.startswith("-")}

    import __spark_entry__ as entrymod
    from maple_spark.session import get_spark

    spark = get_spark()
    qs = entrymod.queries()
    # Since round 5 every oracle is vanilla DuckDB SQL (the hash-defined
    # queries use the engine-portable md5 fingerprint, functions/phash.py)
    # — this connection is exactly what the driver's gate runs.
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    failures = []
    records = {}
    for name, fn in qs.items():
        if (only and name not in only) or name in excluded:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {e}")
            n_fail += 1
            failures.append(name)
            records[name] = {"status": "fail", "err": f"spark: {e}"}
            continue
        spark_time = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {spark_time:.1f}s)")
            n_rowsonly += 1
            records[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            n_fail += 1
            failures.append(name)
            records[name] = {"status": "fail", "err": f"duckdb: {e}"}
            continue
        scols, srows = normalize(sdf)
        ocols, orows = normalize(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns spark={scols} duckdb={ocols}")
            n_fail += 1
            failures.append(name)
            records[name] = {"status": "fail", "err": "schema mismatch"}
            continue
        dt_mismatch = [
            (c, str(sdf[c].dtype), str(odf[c].dtype))
            for c in scols
            if str(sdf[c].dtype) != str(odf[c].dtype)
        ]
        if dt_mismatch:
            print(f"DTYPE {name}: {dt_mismatch}")
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duckdb={len(orows)}")
            n_fail += 1
            failures.append(name)
            records[name] = {"status": "fail", "err": "rowcount mismatch"}
            continue
        mismatches = [
            (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
        ]
        if mismatches:
            i, a, b = mismatches[0]
            print(
                f"FAIL  {name}: {len(mismatches)}/{len(srows)} rows differ; "
                f"first at {i}:\n  spark : {a}\n  duckdb: {b}"
            )
            n_fail += 1
            failures.append(name)
            records[name] = {"status": "fail", "err": "value mismatch"}
            continue
        empty = "  [EMPTY RESULT]" if len(srows) == 0 else ""
        print(f"PASS  {name}: {len(srows)} rows ({spark_time:.1f}s){empty}")
        n_pass += 1
        records[name] = {
            "status": "pass",
            "rows": len(srows),
            "spark_sec": round(spark_time, 2),
        }

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only"
        + (f"; failures: {failures}" if failures else "")
    )
    import json
    import os

    out_json = os.environ.get("SELFCHECK_JSON")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rowsonly,
                    "queries": records,
                },
                f,
                indent=1,
            )
        print(f"wrote {out_json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
