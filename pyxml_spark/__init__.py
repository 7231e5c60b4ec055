"""pyxml_spark — PySpark-native transcript main-content extraction engine.

Layers:

* :mod:`pyxml_spark.engine` — single-document HTML/XML parse/query/serialize
  core with behavior parity to imgurbot12/pyxml (the in-UDF workhorse).
* :mod:`pyxml_spark.pipeline` — Spark DataFrame pipeline: Arrow-batched
  extraction UDFs, salted repartitioning, checkpoint/resume, metrics.
"""

__version__ = '0.1.0'
