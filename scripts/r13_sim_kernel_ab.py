"""Interleaved A/B: Arrow argmin-cell assignment kernel (round-13
optimization) vs the Catalyst struct-sort formulation, for the
deterministic-Lloyd quantizer shared by sim4 (ivf_topk) and sim5
(semdedup).

Arms alternate within one session (the load-bracketing discipline);
each rep times CONSTRUCTION + execution to the noop sink — sim4/sim5
are CONSTRUCT_TIMED in the bench (the Lloyd collects run at build), so
this is the same clock the driver uses.  The expression arm is forced
by patching dedup._arrow_available (the exact gate _lloyd_cells reads);
value equality between the arms is asserted on the first rep.

Usage: python scripts/r13_sim_kernel_ab.py [reps] [--x100]
Writes SIM_KERNEL_AB_r13.json (plus an x100 block when asked).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X100 = "/tmp/maple_sfx100"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = int(args[0]) if args else 5
    want_x100 = "--x100" in sys.argv or "--x100-only" in sys.argv
    sf01_legs = "--x100-only" not in sys.argv

    import __spark_entry__ as entry
    from maple_spark.pipelines import dedup, similarity
    from maple_spark.session import get_spark, release_session_state

    spark = get_spark(app_name="r13_sim_kernel_ab")
    real_gate = dedup._arrow_available
    real_min = similarity.LLOYD_KERNEL_MIN_BYTES

    def force(kernel_on):
        # kernel arm: drop the size gate to 0 so the kernel runs at ANY
        # corpus size; expr arm: report arrow unavailable (the exact
        # fallback gate _lloyd_cells reads)
        dedup._arrow_available = real_gate if kernel_on else (lambda: False)
        similarity.LLOYD_KERNEL_MIN_BYTES = 0 if kernel_on else real_min

    def unforce():
        dedup._arrow_available = real_gate
        similarity.LLOYD_KERNEL_MIN_BYTES = real_min

    def run(name, sf_dir):
        df = entry.queries()[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return df

    def time_arm(name, sf_dir, kernel_on):
        force(kernel_on)
        try:
            t0 = time.time()
            run(name, sf_dir)
            return round(time.time() - t0, 3)
        finally:
            unforce()

    rec = {"sf_dir": SF_DIR, "reps": reps, "legs": {}, "loads_1m": []}
    for name in ("sim4_ivf_topk", "sim5_semdedup") if sf01_legs else ():
        # equality gate first: the two formulations must be value-identical
        force(False)
        expr_rows = sorted(map(tuple, run(name, SF_DIR).collect()))
        force(True)
        kern_rows = sorted(map(tuple, run(name, SF_DIR).collect()))
        unforce()
        assert expr_rows == kern_rows, f"{name}: kernel != expression"
        legs = {"expr": [], "kernel": []}
        for _ in range(reps):
            for label, on in (("expr", False), ("kernel", True)):
                rec["loads_1m"].append(round(os.getloadavg()[0], 2))
                legs[label].append(time_arm(name, SF_DIR, on))
                release_session_state(spark)
        rec["legs"][name] = {
            **legs, "min": {k: min(v) for k, v in legs.items()}
        }

    if want_x100:
        from scale100_experiment import build

        if not os.path.exists(f"{X100}/embeddings.parquet"):
            build(spark, X100)
        # sim4 only: sim5's per-cell gram kernel at the entry's pinned
        # n_cells=8 is Θ((n/8)²·d) — 5 GB gram matrices per cell task at
        # 200k vectors, which OOMs the box regardless of the assignment
        # tier (the operator's own docstring scales n_cells with the
        # corpus; the ENTRY pins 8 for the oracle fixture)
        for name in ("sim4_ivf_topk",):
            legs = {"expr": [], "kernel": []}
            for _ in range(max(2, reps // 2)):
                for label, on in (("expr", False), ("kernel", True)):
                    rec["loads_1m"].append(round(os.getloadavg()[0], 2))
                    legs[label].append(time_arm(name, X100, on))
                    release_session_state(spark)
            rec["legs"][f"{name}_x100"] = {
                **legs, "min": {k: min(v) for k, v in legs.items()}
            }

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SIM_KERNEL_AB_r13.json",
    )
    if os.path.exists(out_path):
        # partial runs (--x100-only) merge into the existing record
        with open(out_path) as f:
            prev = json.load(f)
        prev["legs"].update(rec["legs"])
        prev["loads_1m"] = prev.get("loads_1m", []) + rec["loads_1m"]
        rec = prev
    print(json.dumps(rec))
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
