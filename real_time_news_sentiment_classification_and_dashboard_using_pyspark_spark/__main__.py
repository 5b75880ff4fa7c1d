"""CLI mirroring the reference's three entry points (SURVEY §3):

  python -m real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark batch --input news.json --output out/
      # work.py batch mode: read NDJSON -> score -> CSV/NDJSON sinks + summary
  python -m ... stream --input in_dir --output out_dir [--available-now]
      # streaming_pipeline.py: single-query foreachBatch pipeline
  python -m ... generate --input in_dir --batches 3 [--interval 10]
      # streaming_pipeline.py generate mode: drop synthetic NDJSON batches
  python -m ... dashboard --scored out_dir/scored
      # streamlit_app.py equivalent: print the dashboard metrics dict
  python -m ... curate --sf-dir /root/testdata/sf0.01 --output out/curated
      # corpus curation: quality gate -> dedup -> sample, written
      # partitioned by lang (engine extension; no reference equivalent)
"""

from __future__ import annotations

import argparse
import json

from . import get_spark
from .pipeline import run_batch_pipeline, sentiment_summary
from .serving import dashboard_metrics
from .sources.http import generate_batches
from .streaming import start_pipeline


def main() -> None:
    ap = argparse.ArgumentParser(prog="news-sentiment-engine")
    sub = ap.add_subparsers(dest="mode", required=True)

    b = sub.add_parser("batch")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)

    s = sub.add_parser("stream")
    s.add_argument("--input", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--checkpoint", default=None)
    s.add_argument("--available-now", action="store_true")
    s.add_argument("--trigger-seconds", type=int, default=10)

    g = sub.add_parser("generate")
    g.add_argument("--input", required=True)
    g.add_argument("--batches", type=int, default=3)
    g.add_argument("--interval", type=float, default=0.0)

    d = sub.add_parser("dashboard")
    d.add_argument("--scored", required=True)

    c = sub.add_parser("curate")
    c.add_argument("--sf-dir", required=True)
    c.add_argument("--output", required=True)

    args = ap.parse_args()

    if args.mode == "generate":
        files = generate_batches(args.input, n_batches=args.batches, interval_seconds=args.interval)
        print(json.dumps({"written": files}))
        return

    spark = get_spark(f"news-sentiment-{args.mode}")
    try:
        if args.mode == "batch":
            scored = run_batch_pipeline(spark, args.input, args.output)
            for row in sentiment_summary(scored).collect():
                print(f"{row['sentiment']:9s} {row['cnt']:8d}  {row['pct']:.1f}%")
        elif args.mode == "stream":
            ckpt = args.checkpoint or f"{args.output}/_checkpoint"
            q = start_pipeline(
                spark,
                args.input,
                args.output,
                ckpt,
                available_now=args.available_now,
                trigger_seconds=args.trigger_seconds,
            )
            q.awaitTermination()
        elif args.mode == "dashboard":
            scored = spark.read.parquet(args.scored)
            print(json.dumps(dashboard_metrics(scored), default=str, indent=2))
        elif args.mode == "curate":
            from .curation import write_curated_corpus

            write_curated_corpus(spark, args.sf_dir, args.output)
            back = spark.read.parquet(args.output)
            n = back.count()
            langs = sorted(r["lang"] for r in back.select("lang").distinct().collect())
            print(json.dumps({"written": args.output, "n_docs": n, "langs": langs}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
