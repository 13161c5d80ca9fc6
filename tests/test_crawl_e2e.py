"""End-to-end: the Spark crawl engine must match the single-node oracle
exactly — crawl ordering, URL-seen set, per-wave metrics, and
byte-identical extracted text per url (BASELINE.json invariants;
SURVEY.md §5 item 2)."""

from __future__ import annotations

import pytest

from basic_common_crawl_pipeline_spark.plans.config import CrawlConfig
from basic_common_crawl_pipeline_spark.plans.crawl import collect_outputs, run_crawl
from basic_common_crawl_pipeline_spark.plans.oracle import run_oracle
from basic_common_crawl_pipeline_spark.sources.pages import (
    corpus_to_spark,
    synth_corpus,
)
from basic_common_crawl_pipeline_spark.sources.snapshots import SnapshotStore

CONFIG = CrawlConfig(wave_seconds=8.0, max_waves=5, salt_partitions=4)


@pytest.fixture(scope="module")
def corpus():
    return synth_corpus(n_pages=300, n_hosts=6, seed=42, n_seeds=10)


@pytest.fixture(scope="module")
def oracle_result(corpus):
    return run_oracle(corpus.pages, corpus.seeds, corpus.robots, CONFIG)


@pytest.fixture(scope="module")
def spark_outputs(spark, corpus, tmp_path_factory):
    pages, seeds, robots = corpus_to_spark(spark, corpus)
    store = SnapshotStore(str(tmp_path_factory.mktemp("snapshots")))
    state = run_crawl(spark, pages, seeds, robots, CONFIG, store=store)
    order, results, seen = collect_outputs(spark, store)
    return state, order, results, seen


def test_crawl_order_matches_oracle(oracle_result, spark_outputs):
    _, order, _, _ = spark_outputs
    got = [(r["seq"], r["wave"], r["url"]) for r in order]
    want = [(r["seq"], r["wave"], r["url"]) for r in oracle_result.crawl_order]
    assert got == want
    assert len(got) > 20  # the crawl actually went somewhere


def test_extracted_text_byte_identical(oracle_result, spark_outputs):
    _, _, results, _ = spark_outputs
    got = {r["canon_url"]: r["text"] for r in results}
    assert got == oracle_result.extracted
    # spot-check true byte identity through encoding
    for url, text in list(oracle_result.extracted.items())[:20]:
        assert got[url].encode() == text.encode()


def test_seen_set_matches_oracle(oracle_result, spark_outputs):
    _, _, _, seen = spark_outputs
    assert seen == oracle_result.seen


def test_wave_metrics_match_oracle(oracle_result, spark_outputs):
    state, _, _, _ = spark_outputs
    keys = [
        "wave", "candidates", "disallowed", "misses", "ineligible",
        "selected", "deferred", "extracted", "extract_failures", "discovered",
        "fetched_bytes", "frontier_size",
    ]
    got = [{k: m[k] for k in keys} for m in state.metrics]
    want = [{k: m[k] for k in keys} for m in oracle_result.metrics]
    assert got == want


def test_resume_from_snapshot(spark, corpus, oracle_result, tmp_path):
    """Interrupt after 2 waves, resume → identical final state
    (SURVEY.md §5 item 3)."""
    pages, seeds, robots = corpus_to_spark(spark, corpus)
    store = SnapshotStore(str(tmp_path / "snap"))
    half = CrawlConfig(wave_seconds=8.0, max_waves=2, salt_partitions=4)
    run_crawl(spark, pages, seeds, robots, half, store=store)
    assert store.current_snapshot() == 2
    state = run_crawl(spark, pages, seeds, robots, CONFIG, store=store, resume=True)
    order, results, seen = collect_outputs(spark, store)
    got = [(r["seq"], r["wave"], r["url"]) for r in order]
    want = [(r["seq"], r["wave"], r["url"]) for r in oracle_result.crawl_order]
    assert got == want
    assert seen == oracle_result.seen
    assert {r["canon_url"]: r["text"] for r in results} == oracle_result.extracted
    assert state.wave == CONFIG.max_waves or not state.frontier.take(1)


def test_crawl_over_deduped_multicapture_pages(spark, corpus, oracle_result, tmp_path):
    """A pages table with 3 captures per url (older duplicates), deduped
    at ingest via latest_capture, crawls identically to the clean table
    — AND passes the validate_pages_unique gate that rejects the raw
    multi-capture table."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from basic_common_crawl_pipeline_spark.sources.pages import latest_capture

    pages, seeds, robots = corpus_to_spark(spark, corpus)
    # duplicate every page twice with OLDER timestamps and corrupted html
    dup = pages
    for back in (1, 2):
        older = pages.withColumn(
            "warc_ts", F.col("warc_ts") - F.make_interval(days=F.lit(back))
        ).withColumn("html", F.lit(b"<html><p>stale</p></html>"))
        dup = dup.unionByName(older)
    import dataclasses

    cfg = dataclasses.replace(CONFIG, validate_pages_unique=True)
    with _pytest.raises(ValueError, match="duplicate urls"):
        run_crawl(spark, dup, seeds, robots, cfg, store=SnapshotStore(
            str(tmp_path / "reject")))
    deduped = latest_capture(dup)
    store = SnapshotStore(str(tmp_path / "ok"))
    run_crawl(spark, deduped, seeds, robots, cfg, store=store)
    order, results, seen = collect_outputs(spark, store)
    assert [(r["seq"], r["url"]) for r in order] == [
        (r["seq"], r["wave"], r["url"])[0:1] + (r["url"],)
        for r in oracle_result.crawl_order
    ]
    assert seen == oracle_result.seen
    assert {r["canon_url"]: r["text"] for r in results} == oracle_result.extracted


def test_go_extractor_crawl_matches_oracle(spark, tmp_path):
    """UD2 swappable extractor, end to end: a crawl configured with
    extractor="go" matches the single-node oracle running the same
    variant byte-for-byte, and its extracted text differs from the
    canonical rust-semantics run (the variant is real, not a no-op)."""
    corpus = synth_corpus(n_pages=120, n_hosts=4, seed=9, n_seeds=5)
    pages, seeds, robots = corpus_to_spark(spark, corpus)

    cfg_go = CrawlConfig(
        wave_seconds=8.0, max_waves=2, salt_partitions=2, extractor="go"
    )
    want = run_oracle(corpus.pages, corpus.seeds, corpus.robots, cfg_go)
    store = SnapshotStore(str(tmp_path / "go"))
    run_crawl(spark, pages, seeds, robots, cfg_go, store=store)
    _, results, seen = collect_outputs(spark, store)
    got = {r["canon_url"]: r["text"] for r in results}
    assert got == want.extracted
    assert seen == want.seen

    cfg_rust = CrawlConfig(wave_seconds=8.0, max_waves=2, salt_partitions=2)
    want_rust = run_oracle(corpus.pages, corpus.seeds, corpus.robots, cfg_rust)
    assert want_rust.extracted != want.extracted
    # crawl order/seen are extraction-independent (links logic is shared)
    assert want_rust.seen == want.seen
