"""Capture .explain("formatted") for every bench-flagged query into
plans/<tag>/<query>_<suffix>.txt (r16 optimization-round deliverable).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r16 before

Note: the two ACID queries (t_streaming_acid_changes, x_acid_incremental_mv)
execute their merge/stream machinery at plan-BUILD time and return a
memory-sink-backed (or driver-rebuilt) frame; their captured plan covers the
final aggregate only, and the interesting work is in sources/acid.py's
internal jobs — the files still record that shape honestly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_kafka_ek_spark.plans import extensions  # noqa: F401
from data_pipeline_kafka_ek_spark.plans.catalog import bench_queries
from data_pipeline_kafka_ek_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    for name, fn in bench_queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture the failure, don't die mid-sweep
            plan = f"<explain failed: {exc}>"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
