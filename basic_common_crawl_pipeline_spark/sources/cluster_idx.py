"""cluster.idx source (operator S1 of SURVEY.md §2.1).

The reference reads the file line-by-line on a single thread
(python/commoncrawl.py:36-48; rust/src/bin/batcher.rs:64-68). Spark-first
equivalent: a text scan that parallelizes across file splits — at the real
corpus size (hundreds of MB of index) this is already a distributed scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.cdx import parse_cluster_idx


def read_cluster_idx(spark: SparkSession, path: str) -> DataFrame:
    """Read + parse a cluster.idx file into typed chunk pointers."""
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    return parse_cluster_idx(lines)
