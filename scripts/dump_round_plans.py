#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries into
``plans/<tag>/<query>_<suffix>.txt`` — the before/after plan evidence
for an optimization round.

Usage:
    python scripts/dump_round_plans.py <tag> <suffix> <query> [query ...]

e.g. ``python scripts/dump_round_plans.py r09 before media_index_dedup_docs``.

Notes: ``$SPARK_GRAFT_SF_DIR`` picks the data (default sf0.1). Rows
whose build runs an eager loop (the ``*_loop_docs`` family) execute the
loop at build time; their dumped plan is the verdict-log scan (see
PLAN_AUDIT.md), so for those the bench seconds + code diff carry the
evidence and the dump records the residual plan shape.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag, suffix, *names = sys.argv[1:]
    from quantlab_data_pipeline_spark.queries import SPARK_QUERIES
    from quantlab_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"plan-dump-{tag}")
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        fn = SPARK_QUERIES[name]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(
            f"# {name} — explain('formatted') at {SF_DIR} ({suffix})\n"
            + plan
        )
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
