"""sphinxsearchengine_spark — a PySpark-native full-text engine.

A brand-new implementation (NOT a port) of the capability contract of the
SphinxSearchEngine MediaWiki extension (reference at /root/reference):
inverted-index build, BM25 + proximity + freshness ranking, the Sphinx
extended query language subset the reference emits, and the index lifecycle
(bulk build / upsert / delete / purge / compaction) — re-expressed on Spark
DataFrames with vectorized pandas/Arrow UDFs.

Reference capability map: see SURVEY.md §2 at the repo root.
"""

__version__ = "0.1.0"
