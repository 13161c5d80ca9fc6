"""Determinism under varying parallelism (SURVEY.md §5 item 3): the crawl
is a deterministic function of its inputs — partition counts must not
change crawl order, seen set, or extracted bytes."""

from __future__ import annotations

from basic_common_crawl_pipeline_spark.plans.config import CrawlConfig
from basic_common_crawl_pipeline_spark.plans.crawl import collect_outputs, run_crawl
from basic_common_crawl_pipeline_spark.sources.pages import (
    corpus_to_spark,
    synth_corpus,
)
from basic_common_crawl_pipeline_spark.sources.snapshots import SnapshotStore

CONFIG = CrawlConfig(wave_seconds=8.0, max_waves=3, salt_partitions=5)


def _run(spark, corpus, root, shuffle_partitions):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        pages, seeds, robots = corpus_to_spark(spark, corpus)
        store = SnapshotStore(root)
        run_crawl(spark, pages, seeds, robots, CONFIG, store=store)
        return collect_outputs(spark, store)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_crawl_invariant_to_partitioning(spark, tmp_path):
    corpus = synth_corpus(n_pages=200, n_hosts=5, seed=7, n_seeds=8)
    o3, r3, s3 = _run(spark, corpus, str(tmp_path / "p3"), 3)
    o17, r17, s17 = _run(spark, corpus, str(tmp_path / "p17"), 17)
    assert [(r["seq"], r["wave"], r["url"]) for r in o3] == [
        (r["seq"], r["wave"], r["url"]) for r in o17
    ]
    assert {r["canon_url"]: r["text"] for r in r3} == {
        r["canon_url"]: r["text"] for r in r17
    }
    assert s3 == s17
    assert len(o3) > 10
