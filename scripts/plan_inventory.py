"""Generate BENCH/PLANS.md: the physical-plan audit of every registered
query at sf0.01 — exchanges, broadcasts, Python stages, scan pushdown.

Usage: python scripts/plan_inventory.py  (writes BENCH/PLANS.md)

This is the machine-readable counterpart of tests/test_plan_shape.py:
the test suite pins the load-bearing plan properties; this inventory
shows the whole surface at a glance so a reviewer can spot a regression
(an unexpected exchange, a Python stage in a JVM-only query) without
re-deriving 74 plans by hand.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark import plans  # noqa: E402
from binlog_spark.queries import QUERIES  # noqa: E402
from binlog_spark.session import get_spark  # noqa: E402

PY_STAGES = ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
             "MapInArrow", "FlatMapGroupsInPandas")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="plan-inventory", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = plans.physical_plan(df)
            n_shuffles = plans.count_shuffles(df)
            bcast = plans.has_broadcast_join(df)
            py = sorted({s for s in PY_STAGES if s in plan})
            pushed = bool(re.search(r"PushedFilters: \[[^\]]", plan))
            rows.append((name, n_shuffles, "yes" if bcast else "",
                         "+".join(py) or "none (JVM only)",
                         "yes" if pushed else ""))
        except Exception as e:  # pragma: no cover - inventory robustness
            rows.append((name, "?", "?", f"ERROR {e}", "?"))
    out = ["# Physical-plan inventory (auto-generated)", "",
           "`python scripts/plan_inventory.py` at sf0.01. Exchanges counts",
           "every `Exchange` node in the final plan (upstream stages",
           "included); Python stages are the Arrow-vectorized evaluators —",
           "`none (JVM only)` means the whole query runs in codegen.",
           "",
           "| query | exchanges | broadcast join | python stages | "
           "pushed filters |",
           "|---|---|---|---|---|"]
    for r in rows:
        out.append("| " + " | ".join(str(x) for x in r) + " |")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
