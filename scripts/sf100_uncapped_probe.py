"""Spark-only UNCAPPED heavy-pair run at sf100 (r12 verdict #4).

The r12 `_heavy_pair_cap_mod` dial exists because the DuckDB *oracle*
(full-corpus tokenize + pair CTEs in one process) is infeasible at
sf100 — not because the Spark plan needs it. This probe proves that
claim: it forces the cap off (m=1) and runs `minhash_lsh_pairs` over
the full 10M-doc sf100 corpus (5M base + 5M near-dup twins), recording
wall time, output cardinality, an output checksum-style aggregate, and
the physical plan. No oracle comparison is claimed — the artifact is a
PERF datasheet, not a correctness row (the capped row in
CORRECTNESS_r12_sf100_subset.json carries the hash evidence).

Cardinality is taken via count() + aggregates, never collect(): the
point of the probe is that the ENGINE completes distributed work at
full scale; shipping 10^6+ pairs to the driver would only measure
driver serialization.

Usage: python scripts/sf100_uncapped_probe.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

import real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries as dq  # noqa: E402
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark import (  # noqa: E402
    get_spark,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf100"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SF100_UNCAPPED_PROBE.json"

    spark = get_spark("sf100-uncapped-probe")
    spark.sparkContext.setLogLevel("ERROR")

    native_m = dq._heavy_cap_mod_for(spark, sf_dir)
    # force the dial OFF for this run only (the monkeypatch is the
    # same trick tests/test_dials.py uses to force it ON at fixtures)
    dq._heavy_cap_mod_for = lambda s, d: 1

    t0 = time.time()
    df = dq.minhash_lsh_pairs(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    agg = df.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("doc_a").alias("n_doc_a"),
        F.round(F.avg("jaccard"), 4).alias("avg_jaccard"),
        F.min("doc_a").alias("min_doc_a"),
        F.max("doc_b").alias("max_doc_b"),
    ).collect()[0]
    wall = time.time() - t0

    artifact = {
        "generated_by": "scripts/sf100_uncapped_probe.py",
        "query": "minhash_lsh_pairs",
        "sf_dir": sf_dir,
        "cap_dial_native_m": native_m,
        "cap_forced_m": 1,
        "wall_s": round(wall, 1),
        "output": {k: agg[k] for k in agg.asDict()},
        "oracle": None,
        "note": "Spark-only full-corpus run with the r12 heavy-pair cap "
        "forced off; proves the cap is a DuckDB-oracle-feasibility "
        "dial, not an engine limit. No correctness claim here - the "
        "capped run in CORRECTNESS_r12_sf100_subset.json is the "
        "hash-verified row.",
        "plan_formatted": plan,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
        fh.write("\n")
    print(
        f"UNCAPPED {artifact['query']} [{sf_dir}] m_native={native_m} "
        f"pairs={agg['n_pairs']} wall={wall:.1f}s -> {out_path}"
    )


if __name__ == "__main__":
    main()
