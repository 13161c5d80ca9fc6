"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship crawl-wave query at sf0.001; ``queries`` /
``oracle_sql`` expose the operator catalog defined in
``basic_common_crawl_pipeline_spark/plans/catalog.py`` (one entry per
implemented operator from SURVEY.md §2 plus the training-data ops, each
SQL-expressible one paired with a DuckDB oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from basic_common_crawl_pipeline_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return catalog.crawl_wave_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
