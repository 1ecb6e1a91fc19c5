"""Scale-stress harness: replicate a fixture scale factor K-fold with
disjoint key spaces, then time selected queries at both scales to show
how wall time actually grows with data volume.

Why: the driver's fixtures stop at sf0.1, where most queries are
dominated by fixed overheads (session, codegen, small-shuffle setup).
Replicating sf0.1 K times — every key column offset per replica so
joins/aggregations see K x the rows AND K x the distinct keys — gives a
direct empirical read on each plan's scaling exponent. A linear plan
lands well under K x wall time (overhead amortizes); an accidentally
quadratic plan (cartesian, all-pairs similarity, unpartitioned sort)
explodes and is caught here before a real cluster finds it.

Usage:
    python tools/scale_stress.py [--k 5] [--src /root/testdata/sf0.1] \
        [query ...]            # default: a representative heavy set

Writes the replica to /tmp/spark_scale_stress/sf<sf*k> (reused if
present), times each query at src and replica scale (best-of-N, noop
sink — bench.py's methodology), and prints one line per query:
    <name>  base=<s>  big=<s>  ratio=<big/base>  (k=<K>)

Each line also carries an OUTPUT-NORMALIZED cost (ms per 1k workload
units) at both scales, so workload-quadratic growth (the query finds
K^2 x the true pairs — per-pair cost should FALL or hold) is measured
separately from plan-quadratic growth (same output, K^2 x the time —
the actual scale bug). The workload unit is output rows, except where a
query's real work unit is finer: semdedup_prune reports within-cell
candidate PAIRS (sum over cells of |c| choose 2, derivable from its
output), since bounded-cell pair growth is exactly the invariant its
corpus-proportional k must hold; fellegi_sunter_linkage reports
within-block candidate pairs (its output is a fixed 6-row histogram);
cross_source_dup_matrix reports the underlying minhash near-dup pairs
it aggregates.

``--perturb`` (VERDICT r08 item 3): the plain K-fold replica copies
documents.text VERBATIM, so every text-similarity op's TRUE pair count
grows ~K^2 (each doc finds its K-1 copies plus the planted pairs in
every replica) and the sweep cannot distinguish "linear in corpus"
from "linear in pairs". With --perturb, replica i > 0 applies an
INJECTIVE per-replica token substitution to documents.text: token t is
rewritten t~i whenever md5(t|i) mod 100 < 25. Because the map is by
token VALUE and identical for every document in a replica, all
WITHIN-replica set/shingle equalities — planted near-dups included —
are preserved exactly (an injective relabeling of the token alphabet),
while CROSS-replica similarity collapses: a token type survives
unsubstituted in two replicas with p = 0.75^2, so a distinct-token-set
Jaccard >= 0.9 pair falls to ~0.56/(2-0.56) ~= 0.39 and a 3-shingle
pair to ~0.42/(2-0.42) ~= 0.27, far below the 0.9 / 0.8 thresholds.
The corpus then scales the way real corpora do (vocabulary grows,
near-dup density stays constant), and wall time at K x data measures
the PLAN, not a replication artifact.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bench import run_query  # noqa: E402
from uk_procurement_data_pipeline_spark.catalog import TABLES  # noqa: E402
from uk_procurement_data_pipeline_spark.queries import registry  # noqa: E402
from uk_procurement_data_pipeline_spark.session import get_spark  # noqa: E402

# Key columns to offset per replica so the key domain scales with K.
# Dimension tables with fixed real-world cardinality (nation, region)
# replicate WITHOUT offsets? No — they are not replicated at all: their
# cardinality is scale-invariant by definition.
_OFFSET = 10**12
_KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_FIXED_DIMS = ("nation", "region")

_DEFAULT_QUERIES = [
    "pricing_summary",
    "revenue_by_region",
    "q18_large_volume_orders",
    "q21_waiting_suppliers",
    "q9_product_type_profit",
    "exact_dedup_docs",
    "minhash_near_dup",
    "bm25_topk_docs",
    "unigram_surprisal_quality",
    "ewma_user_value",
    "equidepth_value_bins",
    "domain_mixture_resample",
    "tfidf_top_terms",
    "events_tumbling_window",
    # expensive tail flagged in round-5 review — normalized metrics show
    # whether their growth is workload (output) or plan (time-per-unit)
    "allpairs_prefix_jaccard",
    "semdedup_prune",
    "recommender_hitrate_backtest",
    "dbscan_grid_clusters",
]


def _workload(spark, df, name: str, sf_dir: str) -> tuple[int, str]:
    """Query-specific workload unit for normalized cost reporting."""
    if name == "semdedup_prune":
        # within-cell verify pairs, recovered from the output's cluster col
        pairs = (
            df.groupBy("cluster")
            .count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")))
            .collect()[0][0]
        )
        return int(pairs or 0), "cell_pairs"
    if name == "fellegi_sunter_linkage":
        # Output is a fixed 6-row agreement-pattern histogram; the work is
        # the within-block (nation) candidate pairs it scores. With the
        # 25-value blocking key fixed by the schema, pairs grow exactly
        # K^2 under ANY K-fold replication — workload growth, measured
        # here so the per-pair cost exposes plan regressions.
        pairs = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .groupBy("c_nationkey")
            .count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")))
            .collect()[0][0]
        )
        return int(pairs or 0), "block_pairs"
    if name == "fellegi_sunter_banded":
        # Candidate pairs = within-nation pairs agreeing on band OR
        # segment; inclusion-exclusion over three linear group-counts
        # (never a pair join): |A u B| = |A| + |B| - |A n B|.
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").selectExpr(
            "c_nationkey",
            "c_mktsegment",
            "CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band",
        )

        def _pairs(*keys):
            return (
                cust.groupBy(*keys)
                .count()
                .agg(F.sum(F.expr("count * (count - 1) / 2")))
                .collect()[0][0]
            ) or 0

        n = (
            _pairs("c_nationkey", "band")
            + _pairs("c_nationkey", "c_mktsegment")
            - _pairs("c_nationkey", "band", "c_mktsegment")
        )
        return int(n), "cand_pairs"
    if name == "cross_source_dup_matrix":
        # Output is a bounded source x source matrix; the work is the
        # minhash near-dup pairs being attributed.
        from uk_procurement_data_pipeline_spark.queries.dedup import (
            minhash_near_dup,
        )

        return minhash_near_dup(spark, sf_dir).count(), "dup_pairs"
    return df.count(), "out_rows"


# Perturbation rate: percent of token TYPES substituted per replica.
# 25% leaves a cross-replica token type unsubstituted in both replicas
# with p = 0.5625, collapsing >=0.9-Jaccard / >=0.8-shingle pairs (see
# module docstring) while moving only a quarter of the token stream.
_PERTURB_PCT = 25


def _perturb_text(col: str, i: int):
    """Injective per-replica token relabeling of a space-joined text col.

    Token value t -> 't~<i>' iff md5('t|<i>') mod 100 < _PERTURB_PCT.
    Pure JVM expressions (split / transform / md5 / conv) — no Python in
    the replica build. Injective FOR '~'-FREE CORPORA: '~<i>' is appended,
    never removed, so two distinct '~'-free tokens can't collide and
    within-replica set equalities are preserved exactly. If the corpus
    itself contained a token like 't~1', a substituted 't' in replica 1
    could collide with it (ADVICE r09) — so we assert the precondition at
    build time (see the '~'-free check in build_replica) rather than
    claim unconditional injectivity.
    """
    return F.expr(
        f"array_join(transform(split({col}, ' '), t -> "
        f"CASE WHEN conv(substr(md5(concat(t, '|{i}')), 1, 8), 16, 10) "
        f"% 100 < {_PERTURB_PCT} THEN concat(t, '~{i}') ELSE t END), ' ')"
    )


def build_replica(spark, src: str, k: int, perturb: bool = False) -> str:
    tag = f"x{k}p" if perturb else f"x{k}"
    out = Path(f"/tmp/spark_scale_stress/{Path(src).name}{tag}")
    if out.exists() and any(out.rglob("*.parquet")):
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if perturb and t == "documents":
            # _perturb_text's injectivity needs a '~'-free corpus (its
            # docstring); fail loudly if the fixture ever violates that.
            n_tilde = df.filter(F.col("text").contains("~")).count()
            if n_tilde:
                raise ValueError(
                    f"perturbation requires '~'-free documents.text; "
                    f"found {n_tilde} rows containing '~'"
                )
        if t in _FIXED_DIMS:
            big = df
        else:
            parts = []
            for i in range(k):
                p = df
                for c in _KEYED.get(t, []):
                    p = p.withColumn(c, F.col(c) + F.lit(i * _OFFSET))
                if perturb and t == "documents" and i > 0:
                    p = p.withColumn("text", _perturb_text("text", i))
                parts.append(p)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
        big.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return str(out)


def main() -> int:
    args = sys.argv[1:]
    k, src, names, run_all, out_json = 5, "/root/testdata/sf0.1", [], False, None
    perturb = False
    it = iter(args)
    for a in it:
        if a == "--k":
            k = int(next(it))
        elif a == "--src":
            src = next(it)
        elif a == "--all":
            run_all = True
        elif a == "--perturb":
            perturb = True
        elif a == "--json":
            out_json = next(it)
        else:
            names.append(a)
    if run_all:
        names = list(registry())
    names = names or _DEFAULT_QUERIES
    spark = get_spark("scale-stress", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    big_dir = build_replica(spark, src, k, perturb=perturb)
    print(f"replica ready: {big_dir} (k={k}, perturb={perturb})", file=sys.stderr)
    # warmup (bench.py's pattern)
    reg[names[0]].fn(spark, src).write.mode("overwrite").format("noop").save()
    worst = 0.0
    results: dict[str, dict] = {}
    for n in names:
        try:
            base = run_query(spark, reg[n], src)
            big = run_query(spark, reg[n], big_dir)
            w_base, unit = _workload(spark, reg[n].fn(spark, src), n, src)
            w_big, _ = _workload(spark, reg[n].fn(spark, big_dir), n, big_dir)
        except Exception as e:  # noqa: BLE001 — sweep must survive one bad query
            results[n] = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
            print(f"{n:36s} ERROR {results[n]['error']}")
            continue
        ratio = big / base
        worst = max(worst, ratio)
        cost_b = base * 1e6 / max(w_base, 1)
        cost_g = big * 1e6 / max(w_big, 1)
        results[n] = {
            "base_s": round(base, 3),
            "big_s": round(big, 3),
            "ratio": round(ratio, 2),
            "unit": unit,
            "w_base": w_base,
            "w_big": w_big,
        }
        print(
            f"{n:36s} base={base:7.3f}s  big={big:7.3f}s  ratio={ratio:5.2f}x"
            f"  (k={k})  {unit}={w_base}->{w_big}"
            f"  us/{unit[:-1]}={cost_b:.1f}->{cost_g:.1f}"
        )
    print(f"\nworst ratio {worst:.2f}x vs data ratio {k}x")
    if out_json:
        import json

        Path(out_json).write_text(
            json.dumps({"k": k, "src": src, "perturb": perturb,
                        "results": results}, indent=1, sort_keys=True) + "\n"
        )
        print(f"wrote {out_json}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
