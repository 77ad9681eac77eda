"""Plan inspector: `python -m mapreduceindex_demo_spark.plans [query ...]`.

With no arguments, lists every registered query (name, tags, oracle'd or
rows-only, bench membership). With query names, prints each one's
`.explain("formatted")` at $SPARK_GRAFT_SF_DIR — the tool used to audit
the shuffle inventory in PLANS.md.
"""

from __future__ import annotations

import os
import sys

from mapreduceindex_demo_spark.plans import QUERIES
from mapreduceindex_demo_spark.session import DEFAULT_SF_DIR, get_spark


def main(argv: list[str]) -> int:
    if not argv:
        width = max(len(n) for n in QUERIES)
        for name in sorted(QUERIES):
            q = QUERIES[name]
            marks = ("bench " if q.bench else "") + (
                "oracle" if q.oracle else "rows-only"
            )
            print(f"{name:<{width}}  [{marks}]  {', '.join(q.tags)}")
        return 0

    unknown = [n for n in argv if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark(app_name="mri-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in argv:
        print(f"{'=' * 20} {name} @ {sf_dir}")
        QUERIES[name].fn(spark, sf_dir).explain("formatted")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
