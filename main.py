#!/usr/bin/env python3
"""spark-submit entry point (north_rule: "runs via spark-submit
--py-files"). Ship the package as a zip:

    python3 scripts/make_pyfiles_zip.py          # → dist/pyfiles.zip
    spark-submit --py-files dist/pyfiles.zip main.py crawl \\
        --pages /path/pages.parquet --seeds /path/seeds.parquet \\
        --robots /path/robots.parquet --store /path/warehouse \\
        --waves 8 [--resume] [--bloom]

    spark-submit --py-files dist/pyfiles.zip main.py demo \\
        --sf-dir /root/testdata/sf0.001 --store /tmp/warehouse

``demo`` derives pages/seeds/robots from the testdata documents table so
the whole flow runs with no external inputs.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    crawl = sub.add_parser("crawl", help="run a frontier crawl")
    crawl.add_argument("--pages", required=True)
    crawl.add_argument("--seeds", required=True)
    crawl.add_argument("--robots", required=True)
    crawl.add_argument("--store", required=True)
    crawl.add_argument("--waves", type=int, default=8)
    crawl.add_argument("--wave-seconds", type=float, default=60.0)
    crawl.add_argument("--resume", action="store_true")
    crawl.add_argument("--bloom", action="store_true")
    crawl.add_argument(
        "--metrics-port", type=int, default=None,
        help="serve Prometheus text exposition at :PORT/metrics while the "
        "crawl runs (the reference's tracing_and_metrics endpoint; its "
        "scrape_configs.yml points at :9000/:9001)",
    )
    crawl.add_argument(
        "--metrics-host", default="127.0.0.1",
        help="bind host for the metrics endpoint (loopback by default; "
        "the endpoint is unauthenticated — pass 0.0.0.0 explicitly for "
        "a real scrape config)",
    )

    demo = sub.add_parser("demo", help="crawl pages derived from testdata")
    demo.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    demo.add_argument("--store", required=True)
    demo.add_argument("--waves", type=int, default=3)
    demo.add_argument("--metrics-port", type=int, default=None)

    args = parser.parse_args()

    from pyspark.sql import SparkSession

    from basic_common_crawl_pipeline_spark.plans.config import CrawlConfig
    from basic_common_crawl_pipeline_spark.plans.crawl import run_crawl
    from basic_common_crawl_pipeline_spark.sources.snapshots import SnapshotStore

    spark = SparkSession.builder.appName("crawl-frontier").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    if args.cmd == "crawl":
        pages = spark.read.parquet(args.pages)
        seeds = spark.read.parquet(args.seeds)
        robots = spark.read.parquet(args.robots)
        config = CrawlConfig(
            wave_seconds=args.wave_seconds,
            max_waves=args.waves,
            use_bloom=args.bloom,
        )
        resume = args.resume
    else:
        from basic_common_crawl_pipeline_spark.plans.catalog import (
            pages_from_documents,
        )

        pages, seeds, robots = pages_from_documents(spark, args.sf_dir)
        config = CrawlConfig(wave_seconds=16.0, max_waves=args.waves)
        resume = False

    server = None
    if args.metrics_port is not None:
        from basic_common_crawl_pipeline_spark.plans.crawl import MetricsServer

        server = MetricsServer(
            port=args.metrics_port,
            host=getattr(args, "metrics_host", "127.0.0.1"),
        )
        print(
            "serving metrics at "
            f"http://{getattr(args, 'metrics_host', '127.0.0.1')}:"
            f"{server.port}/metrics"
        )
    try:
        state = run_crawl(
            spark, pages, seeds, robots, config,
            store=SnapshotStore(args.store), resume=resume,
            progress=server.update if server is not None else None,
        )
    finally:
        if server is not None:
            server.close()
    print(json.dumps({"waves": state.wave, "metrics": state.metrics}))


if __name__ == "__main__":
    main()
