#!/usr/bin/env python3
"""r6 probe: time crawl_3waves / crawl_bigwave / extract_full_corpus in
isolation (bench.py methodology, best-of-N) and dump the per-job wall
breakdown from the UI REST API for the LAST bigwave trial.

Usage: python3 scripts/probe_crawl_r06.py [3waves|bigwave|extract ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, PROBE_TRIALS (default 2).
Not part of the driver contract; bench.py stays frozen.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TRIALS = int(os.environ.get("PROBE_TRIALS", "2"))


def main() -> None:
    which = set(sys.argv[1:]) or {"3waves", "bigwave", "extract"}
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from pyspark.sql import functions as F

    from basic_common_crawl_pipeline_spark.plans import catalog
    from basic_common_crawl_pipeline_spark.plans.config import CrawlConfig
    from basic_common_crawl_pipeline_spark.plans.crawl import run_crawl
    from basic_common_crawl_pipeline_spark.plans.wave import (
        _EXTRACT_SCHEMA,
        _extract_batches,
        empty_seen,
        frontier_from_seeds,
        run_wave,
    )
    from basic_common_crawl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="probe_crawl_r06", master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS), 8),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    if "3waves" in which:
        replicate = int(os.environ.get("SPARK_GRAFT_CRAWL_REPLICATE", "50"))
        pages, seeds, robots = catalog.pages_from_documents(
            spark, SF_DIR, replicate=replicate, seeds_mod=3
        )
        pages.count()
        seeds = seeds.localCheckpoint(eager=True)
        robots = robots.localCheckpoint(eager=True)
        best = None
        for _ in range(TRIALS):
            t0 = time.time()
            state = run_crawl(
                spark, pages, seeds, robots,
                CrawlConfig(
                    wave_seconds=65536.0, max_waves=3, salt_partitions=8,
                    collect_metrics=False, broadcast_frontier=False,
                ),
            )
            sec = time.time() - t0
            urls = sum(m["selected"] for m in state.metrics)
            best = sec if best is None else min(best, sec)
        out["crawl_3waves"] = round(best, 3)
        out["crawl_urls"] = urls

    if "bigwave" in which or "extract" in which:
        big_rep = int(os.environ.get("SPARK_GRAFT_BIGWAVE_REPLICATE", "150"))
        bpages, bseeds, brobots = catalog.pages_from_documents(
            spark, SF_DIR, replicate=big_rep, seeds_mod=1
        )
        bpages.count()

    if "bigwave" in which:
        bfrontier = frontier_from_seeds(bseeds).localCheckpoint(True)
        bfrontier.count()
        brobots = brobots.persist()
        brobots.count()
        best = None
        mark = None
        for _ in range(TRIALS):
            mark = time.time()
            bout = run_wave(
                spark, bfrontier, empty_seen(spark), bpages, brobots, wave=0,
                config=CrawlConfig(
                    wave_seconds=1 << 20, salt_partitions=8,
                    collect_metrics=False, broadcast_frontier=False,
                ),
            )
            bout.new_frontier.localCheckpoint(True)
            sec = time.time() - mark
            best = sec if best is None else min(best, sec)
        out["crawl_bigwave"] = round(best, 3)
        out["bigwave_selected"] = bout.metrics["selected"]
        # job timeline of the LAST trial
        try:
            ui = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            jobs = json.load(
                urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs")
            )
            tl = []
            for j in jobs:
                sub = time.mktime(time.strptime(
                    j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                )) + float(j["submissionTime"][20:23] or 0) / 1000.0
                if sub < mark:
                    continue
                comp = j.get("completionTime")
                dur = (
                    time.mktime(time.strptime(comp[:19], "%Y-%m-%dT%H:%M:%S"))
                    + float(comp[20:23] or 0) / 1000.0 - sub
                ) if comp else -1
                tl.append({
                    "job": j["jobId"], "t": round(sub - mark, 2),
                    "dur": round(dur, 2),
                    "desc": (j.get("description") or j["name"])[:110],
                    "tasks": j.get("numTasks"),
                })
            out["bigwave_jobs"] = sorted(tl, key=lambda r: r["t"])
        except Exception as e:  # noqa: BLE001
            out["bigwave_jobs_error"] = str(e)

    if "extract" in which:
        best = None
        for _ in range(TRIALS):
            t0 = time.time()
            n = (
                bpages.select(F.col("url").alias("canon_url"), "html")
                .mapInPandas(_extract_batches, schema=_EXTRACT_SCHEMA)
                .filter(F.col("text").isNotNull())
                .count()
            )
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        out["extract_bigcorpus"] = round(best, 3)
        out["extract_ok"] = n

    print(json.dumps(out))


if __name__ == "__main__":
    main()
