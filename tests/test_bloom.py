"""Partitioned Bloom seen-set: no false negatives, near-zero FP at test
scale, OR-merge correctness, and crawl-equality when used as the exact
anti-join's prefilter (SURVEY.md §7 Step 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_common_crawl_pipeline_spark.operators.seen import BloomSeen
from basic_common_crawl_pipeline_spark.plans.config import CrawlConfig
from basic_common_crawl_pipeline_spark.plans.crawl import collect_outputs, run_crawl
from basic_common_crawl_pipeline_spark.plans.oracle import run_oracle
from basic_common_crawl_pipeline_spark.sources.pages import (
    corpus_to_spark,
    synth_corpus,
)
from basic_common_crawl_pipeline_spark.sources.snapshots import SnapshotStore


def _urls(spark, lo, hi, prefix="http://h.test/p"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("canon_url")
    )


def test_bloom_no_false_negatives_and_low_fp(spark):
    bloom = BloomSeen(partitions=8, m_bits=1 << 18, k=7)
    blobs = bloom.add(bloom.empty(spark), _urls(spark, 0, 2000))
    inserted = bloom.contains(blobs, _urls(spark, 0, 2000))
    assert inserted.filter(~F.col("bloom_hit")).count() == 0  # no FN, ever
    fresh = bloom.contains(blobs, _urls(spark, 2000, 12000))
    fp = fresh.filter(F.col("bloom_hit")).count()
    # 2000 keys in 8×2^18 bits → expected FP ≈ 0 at 4 decimal places
    assert fp <= 2, f"false-positive count too high: {fp}"


def test_bloom_merge_is_union(spark):
    bloom = BloomSeen(partitions=4, m_bits=1 << 16, k=5)
    a = bloom.add(bloom.empty(spark), _urls(spark, 0, 500))
    b = bloom.add(bloom.empty(spark), _urls(spark, 500, 1000))
    merged = bloom.merge(a, b)
    both = bloom.contains(merged, _urls(spark, 0, 1000))
    assert both.filter(~F.col("bloom_hit")).count() == 0


def test_crawl_with_bloom_matches_oracle(spark, tmp_path):
    corpus = synth_corpus(n_pages=200, n_hosts=5, seed=11, n_seeds=8)
    config = CrawlConfig(
        wave_seconds=8.0, max_waves=3, salt_partitions=4,
        use_bloom=True, bloom_partitions=8, bloom_bits=1 << 18,
    )
    oracle = run_oracle(corpus.pages, corpus.seeds, corpus.robots, config)
    pages, seeds, robots = corpus_to_spark(spark, corpus)
    store = SnapshotStore(str(tmp_path / "snap"))
    state = run_crawl(spark, pages, seeds, robots, config, store=store)
    order, results, seen = collect_outputs(spark, store)
    assert [(r["seq"], r["wave"], r["url"]) for r in order] == [
        (r["seq"], r["wave"], r["url"]) for r in oracle.crawl_order
    ]
    assert seen == oracle.seen
    assert {r["canon_url"]: r["text"] for r in results} == oracle.extracted
    assert store.read_table(spark, "seen_bloom").count() == 8
    assert len(order) > 5


def test_resume_with_changed_bloom_geometry_rebuilds(spark, tmp_path):
    """Resuming with different bloom params must NOT reinterpret the
    committed blobs (wrong geometry → false negatives → re-crawls);
    the engine rebuilds the bloom from the exact seen table and the
    resumed crawl equals the uninterrupted one."""
    corpus = synth_corpus(n_pages=200, n_hosts=5, seed=11, n_seeds=8)
    base = dict(wave_seconds=8.0, max_waves=3, salt_partitions=4, use_bloom=True)
    cfg_a = CrawlConfig(**base, bloom_partitions=8, bloom_bits=1 << 18)
    # uninterrupted run
    pages, seeds, robots = corpus_to_spark(spark, corpus)
    full_store = SnapshotStore(str(tmp_path / "full"))
    run_crawl(spark, pages, seeds, robots, cfg_a, store=full_store)
    full = collect_outputs(spark, full_store)
    # interrupted after 2 waves with geometry A, resumed with geometry B
    part_store = SnapshotStore(str(tmp_path / "part"))
    cfg_2 = CrawlConfig(**{**base, "max_waves": 2},
                        bloom_partitions=8, bloom_bits=1 << 18)
    run_crawl(spark, pages, seeds, robots, cfg_2, store=part_store)
    cfg_b = CrawlConfig(**base, bloom_partitions=4, bloom_bits=1 << 16)
    run_crawl(spark, pages, seeds, robots, cfg_b, store=part_store, resume=True)
    resumed = collect_outputs(spark, part_store)
    assert [(r["seq"], r["url"]) for r in resumed[0]] == [
        (r["seq"], r["url"]) for r in full[0]
    ]
    assert resumed[2] == full[2]
    # the manifest records the geometry that produced the current blobs
    extra = part_store.read_manifest()["extra"]
    assert extra["bloom_params"] == {
        "partitions": 4, "m_bits": 1 << 16, "k": 7,
    }
