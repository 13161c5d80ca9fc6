"""robots.txt parser: scalar semantics + Spark transform + crawl
integration (a crawl driven by parsed robots.txt equals one driven by
the pre-built policy table)."""

from __future__ import annotations

from pyspark.sql import functions as F

from basic_common_crawl_pipeline_spark.functions.robots import (
    parse_robots_txt,
    robots_table,
)

SAMPLE = """
# example robots file
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 2

User-agent: fancybot
Disallow: /only-fancy/
Crawl-delay: 0.5
"""


def test_parse_star_group():
    delay, dis = parse_robots_txt(SAMPLE)
    assert delay == 2.0
    assert dis == ["/private/", "/tmp/"]


def test_specific_agent_overrides_star():
    delay, dis = parse_robots_txt(SAMPLE, agent="fancybot")
    assert delay == 0.5
    assert dis == ["/only-fancy/"]


def test_parse_edge_cases():
    assert parse_robots_txt(None) == (1.0, [])
    assert parse_robots_txt("", default_delay=3.0) == (3.0, [])
    # empty Disallow allows everything; comments/garbage ignored
    delay, dis = parse_robots_txt(
        "User-agent: *\nDisallow:\nCrawl-delay: oops\nnonsense line\n"
    )
    assert delay == 1.0 and dis == []
    # stacked user-agent lines share one group
    delay, dis = parse_robots_txt(
        "User-agent: a\nUser-agent: *\nDisallow: /x/\n"
    )
    assert dis == ["/x/"]


def test_crawl_with_parsed_robots_matches_prebuilt(spark, tmp_path):
    from basic_common_crawl_pipeline_spark.plans.catalog import (
        pages_from_documents,
    )
    from basic_common_crawl_pipeline_spark.plans.config import CrawlConfig
    from basic_common_crawl_pipeline_spark.plans.crawl import (
        collect_outputs,
        run_crawl,
    )
    from basic_common_crawl_pipeline_spark.sources.snapshots import SnapshotStore

    pages, seeds, robots = pages_from_documents(spark, "/root/testdata/sf0.001")
    # render each host's policy row back into robots.txt text, re-parse it
    raw = robots.select(
        "host",
        F.concat(
            F.lit("# generated\nUser-agent: *\n"),
            F.concat_ws(
                "\n",
                F.transform(
                    "disallow", lambda d: F.concat(F.lit("Disallow: "), d)
                ),
            ),
            F.lit("\nCrawl-delay: "),
            F.col("crawl_delay").cast("string"),
            F.lit("\n"),
        ).alias("robots_txt"),
    )
    parsed = robots_table(raw)
    cfg = CrawlConfig(wave_seconds=16.0, max_waves=2, salt_partitions=4)
    outs = []
    for name, rb in (("prebuilt", robots), ("parsed", parsed)):
        store = SnapshotStore(str(tmp_path / name))
        run_crawl(spark, pages, seeds, rb, cfg, store=store)
        outs.append(collect_outputs(spark, store))
    (o_a, r_a, s_a), (o_b, r_b, s_b) = outs
    assert [(r["seq"], r["url"]) for r in o_a] == [
        (r["seq"], r["url"]) for r in o_b
    ]
    assert s_a == s_b and len(o_a) > 5


def test_specific_group_with_only_empty_disallow_overrides_star():
    """The allow-everything-for-this-bot exemption: a specific-agent group
    whose only directive is an empty 'Disallow:' must override the '*'
    group ENTIRELY (most-specific-group rule) — not fall back to the star
    group's disallows."""
    txt = "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    delay, disallow = parse_robots_txt(txt, agent="mybot")
    assert disallow == []          # mybot may crawl everything
    assert delay == 1.0            # default — mybot's group sets none
    # other agents still get the star group's total block
    assert parse_robots_txt(txt, agent="otherbot")[1] == ["/"]
    assert parse_robots_txt(txt)[1] == ["/"]
