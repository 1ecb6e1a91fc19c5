"""Fresh-session re-timer for BASELINE.md row re-records.

The re-record policy (BASELINE.md §'Baseline re-record policy') requires
each candidate row to be re-timed best-of-N in a FRESH SparkSession on a
quiet box, twice (different query orders), with the machine-speed
calibration printed alongside. This script is that procedure:

    python tools/retime_baseline.py q1 q2 ...

Prints one line per query per pass plus the calibration; makes NO file
changes — the human copies numbers into BASELINE.md with a dated note.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import run_calibration, run_query  # noqa: E402
from uk_procurement_data_pipeline_spark.queries import registry  # noqa: E402
from uk_procurement_data_pipeline_spark.session import get_spark  # noqa: E402


def one_pass(names: list[str], sf_dir: str, tag: str) -> None:
    spark = get_spark(f"retime-{tag}", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    warm = reg[names[0]]
    warm.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    spark.range(128).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    for _ in range(3):
        warm.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    jvm, py = run_calibration(spark)
    print(f"[{tag}] calibration jvm={jvm:.3f}s py={py:.3f}s")
    for n in names:
        secs = run_query(spark, reg[n], sf_dir, min_runs=3, max_runs=6)
        print(f"[{tag}] {n:40s} {secs:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    import os

    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: retime_baseline.py query [query ...]")
    # same env override as bench.py so relocated fixtures move everything
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    one_pass(names, sf_dir, "pass1")
    one_pass(list(reversed(names)), sf_dir, "pass2")
