"""Driver-gate replica under a VANILLA SparkSession (round 9).

scripts/selfcheck.py runs the registry with maple_spark.session.get_spark,
but the DRIVER builds its OWN bare session — and, crucially, may start it
from a working directory where ``maple_spark`` is NOT on the Python
workers' sys.path (the driver process imports __spark_entry__ via an
explicit path insert; worker processes inherit only PYTHONPATH/cwd).
That gap is invisible to selfcheck and pytest and bit for real: the
Arrow kernels originally referenced maple_spark module globals
(phash.BAND_C in the banding kernel, _fake_feature in the multimodal
kernel), which cloudpickle serializes BY MODULE REFERENCE — worker-side
ModuleNotFoundError for mm1/st7 under a vanilla session started in /tmp,
while every pure-Catalyst query passed.  Kernels are now closure-only;
this script is the regression tripwire.

It replays the driver's exact gate shape: a bare local session built
OUTSIDE the repo directory, every queries() entry vs its DuckDB oracle,
exact value compare.  Run it whenever a pandas_udf / mapInPandas body
changes.

Usage: python scripts/vanilla_gate.py [sf_dir] [first_n]
(first_n=0 → full registry).  One JSON line; exits 1 on any failure.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

# ONE canonicalization shared with the maple-session gate: the two gates
# must be the same comparison run under two sessions, so a semantics
# change to selfcheck.normalize applies here automatically
from selfcheck import normalize as norm  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    first_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    # the whole point: a bare session, built while cwd is NOT the repo
    os.chdir("/tmp")
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs)[:first_n] if first_n else list(qs)
    fails, errs, rows_only = [], {}, {}
    for name in names:
        try:
            if name not in osql:
                # rows-only trio: the driver still EXECUTES these (row
                # count only) — so must this replica (mm3's inference
                # kernel is exactly the kind of worker-side code this
                # script exists to smoke out)
                rows_only[name] = qs[name](spark, sf).count()
                continue
            ok = norm(qs[name](spark, sf).toPandas()) == norm(
                con.execute(osql[name]).fetchdf()
            )
        except Exception as ex:  # noqa: BLE001 — gate boundary
            ok, errs[name] = False, f"{type(ex).__name__}: {ex}"[:200]
        if not ok:
            fails.append(name)
    print(
        json.dumps(
            {
                "sf_dir": sf,
                "n_checked": len(names) - len(rows_only),
                "n_pass": len(names) - len(rows_only) - len(fails),
                "fails": fails,
                "errs": errs,
                "rows_only": rows_only,
            }
        )
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
