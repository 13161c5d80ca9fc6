"""Spark-free unit tests of the single-node oracle: politeness/budget
arithmetic (FIXTURES.md §7 re-expression of the reference's batching
test, python/test_batcher.py:73-93) and robots semantics."""

from __future__ import annotations

import datetime

from basic_common_crawl_pipeline_spark.functions.extract import extract_text
from basic_common_crawl_pipeline_spark.plans.config import CrawlConfig, host_budget
from basic_common_crawl_pipeline_spark.plans.oracle import run_oracle

TS = datetime.datetime(2024, 7, 22, 12, 0, 0)


def _page(url, links=(), lang="eng", status=200):
    html = (
        "<html><body><p>content of " + url + "</p>"
        + "".join(f'<a href="{l}">x</a>' for l in links)
        + "</body></html>"
    ).encode()
    return {
        "url": url, "warc_ts": TS, "html": html,
        "text": extract_text(html), "lang": lang, "status": status,
        "mime": "text/html", "digest": "d",
    }


def test_host_budget_arithmetic():
    assert host_budget(4.0, 1.0) == 4
    assert host_budget(4.0, 2.0) == 2
    assert host_budget(1.0, 2.0) == 1   # never below 1
    assert host_budget(4.0, 3.0) == 1   # floor
    assert host_budget(60.0, 0.5) == 120


def test_budget_defers_across_waves():
    # 6 eligible urls on one host, budget 2/wave ⇒ exactly ceil(6/2)=3 waves
    pages = [_page(f"http://h.test/p{i}") for i in range(6)]
    seeds = [{"url": f"http://h.test/p{i}", "priority": 0} for i in range(6)]
    robots = [{"host": "h.test", "crawl_delay": 2.0, "disallow": []}]
    config = CrawlConfig(wave_seconds=4.0, max_waves=10)
    result = run_oracle(pages, seeds, robots, config)
    assert [m["selected"] for m in result.metrics] == [2, 2, 2]
    assert [m["deferred"] for m in result.metrics] == [4, 2, 0]
    # order within host: (priority, surt) — p0..p5 lexicographic
    assert [r["url"][-2:] for r in result.crawl_order] == [
        "p0", "p1", "p2", "p3", "p4", "p5"
    ]


def test_robots_disallow_marks_seen_without_fetch():
    pages = [_page("http://h.test/private/x"), _page("http://h.test/ok")]
    seeds = [
        {"url": "http://h.test/private/x", "priority": 0},
        {"url": "http://h.test/ok", "priority": 0},
    ]
    robots = [{"host": "h.test", "crawl_delay": 1.0, "disallow": ["/private/"]}]
    result = run_oracle(pages, seeds, robots, CrawlConfig(max_waves=2))
    assert result.metrics[0]["disallowed"] == 1
    assert result.metrics[0]["selected"] == 1
    assert "http://h.test/private/x" in result.seen
    assert "http://h.test/private/x" not in result.extracted


def test_bfs_priority_and_min_priority_merge():
    # seed links to c; c also seeded later at higher priority → min wins
    pages = [
        _page("http://h.test/a", links=["http://h.test/c"]),
        _page("http://h.test/c"),
    ]
    seeds = [{"url": "http://h.test/a", "priority": 0}]
    robots = [{"host": "h.test", "crawl_delay": 1.0, "disallow": []}]
    result = run_oracle(pages, seeds, robots, CrawlConfig(wave_seconds=4.0, max_waves=3))
    by_url = {r["url"]: r for r in result.crawl_order}
    assert by_url["http://h.test/a"]["priority"] == 0
    assert by_url["http://h.test/c"]["priority"] == 1
    assert by_url["http://h.test/a"]["wave"] == 0
    assert by_url["http://h.test/c"]["wave"] == 1


def test_miss_and_ineligible_marked_seen():
    pages = [_page("http://h.test/de", lang="deu"), _page("http://h.test/404", status=404)]
    seeds = [
        {"url": "http://h.test/de", "priority": 0},
        {"url": "http://h.test/404", "priority": 0},
        {"url": "http://h.test/ghost", "priority": 0},
    ]
    result = run_oracle(pages, seeds, [], CrawlConfig(max_waves=2))
    m = result.metrics[0]
    assert m["ineligible"] == 2 and m["misses"] == 1 and m["selected"] == 0
    assert result.seen == {
        "http://h.test/de", "http://h.test/404", "http://h.test/ghost"
    }


def test_frontier_from_seeds_null_priority_defaults_to_zero(spark):
    from basic_common_crawl_pipeline_spark.plans.wave import frontier_from_seeds

    seeds = spark.createDataFrame(
        [("http://a.test/x", None), ("http://b.test/y", 2)],
        "url string, priority int",
    )
    rows = {r["canon_url"]: r["priority"] for r in frontier_from_seeds(seeds).collect()}
    assert rows == {"http://a.test/x": 0, "http://b.test/y": 2}
