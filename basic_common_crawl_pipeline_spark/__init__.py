"""PySpark-native crawl/analytics engine with the capabilities of
ahartel/basic-common-crawl-pipeline, rebuilt Spark-first.

Layout
------
- ``functions/``  pure-Python scalar core (extractor, URL canon, text stats)
  shared verbatim by the single-node oracle and the Arrow-vectorized UDFs,
  plus Column-expression builders for the SQL-expressible operators.
- ``sources/``    synthetic pages corpus, cluster.idx/CDX readers,
  Iceberg-style snapshot store.
- ``operators/``  frontier engine pieces (seen-set, politeness) and the
  training-data ops (dedup, similarity, multimodal).
- ``plans/``      the wave job (one frontier expansion as a DataFrame job),
  the multi-wave crawl driver, and the single-node reference oracle.
- ``streaming/``  Structured-Streaming analog of the reference's queue
  source/sink boundary.

Reference parity citations use ``file:line`` into ``/root/reference``.
"""

__version__ = "0.1.0"
