"""Partition-invariance sweep: hash every registered query's result set
under the current Spark parallelism config and write name -> hash JSON.

Run twice with different configs and diff the outputs to prove results
are independent of cluster shape — the property the DuckDB oracle can
NOT see (it compares Spark at ONE partitioning against DuckDB):

    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32 \
        python tools/invariance_check.py /root/testdata/sf0.01 /tmp/a.json
    SPARK_GRAFT_CPUS=5 SPARK_GRAFT_SHUFFLE=7 \
        python tools/invariance_check.py /root/testdata/sf0.01 /tmp/b.json
    python - <<'EOF'
    import json
    a, b = (json.load(open(p)) for p in ('/tmp/a.json', '/tmp/b.json'))
    diff = {k for k in a if a[k] != b.get(k)}
    print('DIFFER:', sorted(diff) or 'none')
    EOF

A query whose hash differs across shapes has partition-dependent output
(first-seen-order assumptions, undeterministic tie-breaks, per-partition
ids leaking into results) — a bug at 1000 executors even if both gates
pass. tests/test_parallelism_invariance.py pins a sample; this sweeps
everything.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.oracle_check import canon_rows  # noqa: E402
from uk_procurement_data_pipeline_spark.queries import registry  # noqa: E402
from uk_procurement_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/invariance.json"
    only = set(sys.argv[3:])
    spark = get_spark(app_name="invariance-check")
    hashes: dict[str, str] = {}
    for name, spec in registry().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            rows = canon_rows(spec.fn(spark, sf_dir).toPandas())
            digest = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
        except Exception as exc:  # noqa: BLE001 — record, don't abort sweep
            digest = f"ERROR:{type(exc).__name__}"
        hashes[name] = digest
        print(f"{name:40s} {digest}  {time.time() - t0:.2f}s", file=sys.stderr)
    Path(out_path).write_text(json.dumps(hashes, indent=0, sort_keys=True))
    print(f"wrote {len(hashes)} hashes to {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
