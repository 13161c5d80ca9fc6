"""robots.txt parsing → the engine's host-policy table (north-rule
addition: "per-host politeness priority queue enforcing crawl-delay and
robots.txt budgets" — the reference has no robots handling at all, its
politeness is the queue's prefetch-1 backpressure,
rust/src/rabbitmq.rs:74-81).

One pure scalar parser shared by tests and the Arrow-batched Spark
transform (the repo's standard oracle/UDF-sharing shape). Semantics are
the robots.txt de-facto standard restricted to what the crawl engine
enforces:

- group selection: the ``User-agent: *`` group(s); a specific agent name
  can be passed and wins over ``*`` when present;
- ``Disallow:`` path prefixes collected per selected group (empty
  Disallow = allow all, contributes nothing);
- ``Crawl-delay: <seconds>`` (float) from the selected group;
- comments (#...), blank lines, unknown directives and malformed lines
  are ignored (tolerant, like the Go reference's error-continue shape).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("crawl_delay", DoubleType()),
        StructField("disallow", ArrayType(StringType())),
    ]
)


def parse_robots_txt(
    text: str | None,
    agent: str = "*",
    default_delay: float = 1.0,
) -> tuple[float, list[str]]:
    """(crawl_delay, disallow prefixes) for ``agent`` from robots.txt
    text. Groups for the exact agent override ``*`` groups entirely when
    any exist (the standard's most-specific-group rule)."""
    if not text:
        return default_delay, []
    # "present" tracks whether ANY User-agent line targeted the group:
    # a specific-agent group whose only directive is an empty
    # "Disallow:" (the standard allow-everything exemption) must still
    # override the "*" group entirely — choosing by contributed rules
    # alone would wrongly fall back to the star group's disallows
    star: dict = {"delay": None, "disallow": [], "present": False}
    mine: dict = {"delay": None, "disallow": [], "present": False}
    current: list[dict] = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            ua = value.lower()
            target = (
                [mine] if ua == agent.lower() and agent != "*"
                else [star] if ua == "*"
                else []
            )
            for group in target:
                group["present"] = True
            if last_was_agent:
                current.extend(target)  # stacked agents share one group
            else:
                current = list(target)
            last_was_agent = True
            continue
        last_was_agent = False
        for group in current:
            if key == "disallow" and value:
                group["disallow"].append(value)
            elif key == "crawl-delay":
                try:
                    group["delay"] = float(value)
                except ValueError:
                    pass
    chosen = mine if mine["present"] else star
    delay = chosen["delay"] if chosen["delay"] is not None else default_delay
    return delay, chosen["disallow"]


def robots_table(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
    default_delay: float = 1.0,
) -> DataFrame:
    """(host, robots_txt) rows → the crawl engine's host-policy table
    (host, crawl_delay, disallow) via one Arrow crossing."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            delays, disallows = [], []
            for text in batch[text_col]:
                delay, dis = parse_robots_txt(text, agent, default_delay)
                delays.append(delay)
                disallows.append(dis)
            yield pd.DataFrame(
                {
                    "host": batch[host_col],
                    "crawl_delay": delays,
                    "disallow": disallows,
                }
            )

    return df.select(host_col, text_col).mapInPandas(
        parse, schema=ROBOTS_SCHEMA
    )
