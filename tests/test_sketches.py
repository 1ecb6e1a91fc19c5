"""Edge-case pins for queries/sketches.py beyond the fixture oracle runs:
the distributed ntile rewrite must reproduce textbook ntile() even when
n < bins (all buckets size 1 — the arithmetic's otherwise-branch divides
by s=0 and must never be evaluated) and when one floor(value) band holds
most rows (offsets dominated by a single band)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from uk_procurement_data_pipeline_spark.queries import registry


def _make_events_dir(tmp_path, values):
    pdf = pd.DataFrame(
        {
            "event_id": range(len(values)),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": [v % 5 for v in range(len(values))],
            "event_type": "e",
            "value": [float(v) for v in values],
            "props": "{}",
        }
    )
    d = tmp_path / "mini"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    return str(d), pdf


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con.sql(sql).df()


@pytest.mark.parametrize(
    "values",
    [
        [5.5, 1.1, 9.9, 3.3, 7.7, 2.2, 8.8],  # n=7 < 10 bins: s=0 path
        [1.25] * 19 + [2.5, 3.75, 4.0],  # one band holds 19 of 22 rows
        list(range(25)),  # n%b != 0: first 5 buckets get an extra row
    ],
)
def test_equidepth_matches_textbook_ntile(spark, tmp_path, values):
    spec = registry()["equidepth_value_bins"]
    d, _ = _make_events_dir(tmp_path, values)
    got = (
        spec.fn(spark, d)
        .toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
        .astype({"bin": "int64"})
    )
    want = (
        _oracle(d, spec.oracle)
        .sort_values("bin")
        .reset_index(drop=True)
        .astype({"bin": "int64"})
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )


def test_kmv_estimate_brackets_truth(spark, sf_dir):
    row = registry()["kmv_distinct_sketch"].fn(spark, sf_dir).collect()[0]
    assert row.k_used >= 1
    assert row.est_distinct > 0
    # KMV with k=64 has ~1/sqrt(k-1) ≈ 12.6% relative std error; allow 4σ.
    assert row.abs_err <= max(4, row.true_distinct * 0.51)
