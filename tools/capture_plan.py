"""Capture ``explain('formatted')`` for driver-contract queries.

Usage: python tools/capture_plan.py OUT_PATH QUERY [SF_DIR]

Writes the formatted physical plan of the named ``queries()`` entry to
OUT_PATH.  Run from any checkout (the round-start worktree gives the
"before" plans, HEAD the "after") — the plan judge checks claims against
these files.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    out_path, query = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

    import __spark_entry__ as e
    from deep_ner_spark.session import get_spark

    spark = get_spark("capture-plan", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    df = e.queries()[query](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    Path(out_path).write_text(f"-- {query} @ {sf_dir}\n{plan}")
    print(f"wrote {out_path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
