"""Physical-plan audit over every bench + window query: render each
query's plan and flag FileScans whose pushed DataFilters embed an
expensive derived expression.

Predicate pushdown SUBSTITUTES the filtered column's defining
expression into the scan; for a cheap key predicate that is exactly
right, but when the column derives from an expensive chain (JSON
parse, string surgery, trig) the chain then runs twice — once per raw
row inside the scan's row-level filter, once in the projection above.
That is how `geojson_tiles` spent 8 of its 12 seconds re-parsing
JSON at the scan for three sessions while plan-identity A/Bs kept
"clearing" it (both arms carried the same filter); see BENCH.md
session 20. This tool makes the next such defect a one-command find.

Usage: python tools/plan_audit.py [sf_dir] [min_filter_chars]
Prints one line per (query, flagged scan filter); exit code 1 if any
filter contains a marker of a known-expensive expression class.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtzero_spark.engine.session import get_spark  # noqa: E402

# expression classes that are never acceptable to re-run per raw
# scan row: text parsing, regex/string surgery, transcendental math
_EXPENSIVE = re.compile(
    r"get_json_object|from_json|format_string|regexp|replace\(|"
    r"ATAN|SINH|TAN\(|LOG\(|EXP\(|transform\(")

# reviewed and accepted (BENCH.md session 20 audit): the pushed
# expression is the query's own selection predicate on a sub-2-second
# query, where evaluating at the scan saves materializing the rows it
# drops.  A flag on any OTHER query is a new finding and fails the run.
_ACCEPTED = {"curation", "dwithin_geo"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    min_chars = int(sys.argv[2]) if len(sys.argv) > 2 else 150

    spark = get_spark("plan-audit", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    import bench as B
    import __spark_entry__ as E

    queries = dict(E.queries())
    queries.update(B.BENCH_ONLY)

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("simple")
    flagged = 0
    for name, fn in sorted(queries.items()):
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution() \
                .explainString(mode)
        except Exception as exc:  # a broken query is itself a finding
            print(f"[ERROR] {name}: {type(exc).__name__}: {exc}")
            flagged += 1
            continue
        for line in plan.splitlines():
            m = re.search(r"DataFilters: \[(.*)", line)
            if not m:
                continue
            body = m.group(1)
            if len(body) >= min_chars and _EXPENSIVE.search(body):
                tag = "KNOWN" if name in _ACCEPTED else "FLAG"
                print(f"[{tag}] {name}: {body[:160]}")
                if name not in _ACCEPTED:
                    flagged += 1
    print(f"audited {len(queries)} queries; {flagged} flagged")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
