"""High-level engine facade (the reference's ``SphinxSearchEngine``
class analog, SphinxSearchEngine_class.php:70-243).

``Searcher`` pins per-index state across queries the way searchd keeps
its wordlist in RAM:

- the term dictionary is collected to the driver once (when under
  ``dict_cache_rows``) so query expansion costs ZERO Spark jobs;
- the hydration projection of the docs table is optionally cached in
  executor memory (``cache_docs=True``);
- repeated searches then run exactly one Spark action (scan → scorer →
  top-k → hydration join).

At 10^12-doc scale the dictionary no longer fits one driver; the same
class degrades gracefully to bucket-pruned dictionary scans
(dict_cache_rows=0).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from sphinxsearchengine_spark.index.layout import IndexLayout
from sphinxsearchengine_spark.query import executor as X
from sphinxsearchengine_spark.query.parser import Query, parse_query


def ensure_index(
    spark: SparkSession,
    index_dir: str,
    documents: DataFrame,
    cfg=None,
) -> IndexLayout:
    """S7 bootstrap analog (init_index, SphinxSearchEngine_class.php:484-535):
    probe for an existing index; build from `documents` when absent."""
    from sphinxsearchengine_spark.index.builder import build_index

    layout = IndexLayout(index_dir)
    if not layout.exists():
        build_index(spark, documents, index_dir, cfg)
    return layout


class Searcher:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cache_docs: bool = False,
        dict_cache_rows: int = 2_000_000,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.dict_cache_rows = dict_cache_rows
        self.layout = IndexLayout(index_dir)
        self._dict_pdf: pd.DataFrame | None = None
        self._docs_cached: DataFrame | None = None
        self._meta_snapshot = self.layout.meta
        dic = X._live_union(spark, self.layout, "dict")
        if dict_cache_rows and dic.count() <= dict_cache_rows:
            self._dict_pdf = (
                dic.groupBy("term")
                .agg(
                    F.sum("df").alias("df"),
                    F.sum("hits").alias("hits"),
                    F.max("max_tf").alias("max_tf"),
                    F.sum("exact_df").alias("exact_df"),
                    F.sum("exact_hits").alias("exact_hits"),
                    F.first("bucket").alias("bucket"),
                )
                .toPandas()
                .sort_values("term")
                .reset_index(drop=True)
            )
        # pin the block-max table too (same searchd-RAM-wordlist analog):
        # warm queries then plan block skipping in driver pandas with zero
        # extra Spark jobs.  Degrades to the distributed planner when the
        # table outgrows the cap or the index predates blockmax.
        self._blockmax_pdf: pd.DataFrame | None = None
        if dict_cache_rows:
            try:
                bmx = X._live_union(spark, self.layout, "blockmax")
                agg = bmx.groupBy("term", "blk").agg(
                    F.sum("n").alias("n"),
                    F.max("max_tf").alias("max_tf"),
                    F.max("max_etf").alias("max_etf"),
                    F.expr("bit_or(fmask)").alias("fmask"),
                    F.max("max_dsum").alias("max_dsum"),
                )
                if agg.count() <= 4 * dict_cache_rows:
                    # sorted by term: the executor's pinned block planner
                    # resolves query terms by binary search (no per-query
                    # full-frame isin scan)
                    self._blockmax_pdf = (
                        agg.toPandas()
                        .sort_values("term", kind="mergesort")
                        .reset_index(drop=True)
                    )
            except Exception:
                self._blockmax_pdf = None
        if cache_docs:
            self._docs_cached = X.live_docs(spark, index_dir).cache()
            self._docs_cached.count()

    # -- plumbing ---------------------------------------------------------
    def _ctx(self) -> dict:
        return {
            "dict_pdf": self._dict_pdf,
            "docs_df": self._docs_cached,
            "blockmax_pdf": self._blockmax_pdf,
        }

    def search(self, query: Query | str, **kw) -> DataFrame:
        return X.search(self.spark, self.index_dir, query, _ctx=self._ctx(), **kw)

    def search_with_meta(self, query: Query | str, **kw):
        return X.search_with_meta(
            self.spark, self.index_dir, query, _ctx=self._ctx(), **kw
        )

    def score_matches(self, query: Query | str, **kw) -> DataFrame:
        return X.score_matches(
            self.spark, self.index_dir, query, _ctx=self._ctx(), **kw
        )

    def facets(self, query: Query | str, **kw) -> DataFrame:
        from sphinxsearchengine_spark.query.facets import category_facet

        return category_facet(self.spark, self.index_dir, query, **kw)

    def suggest(self, raw_query: str, user: str | None = None) -> str | None:
        from sphinxsearchengine_spark.query.suggest import did_you_mean

        # pinned dictionary → zero Spark jobs for the whole suggestion
        return did_you_mean(
            self.spark, self.index_dir, raw_query, _ctx=self._ctx(), user=user
        )

    def refresh(self) -> None:
        """Re-pin state after lifecycle mutations (upsert/delete/compact)."""
        if self._docs_cached is not None:
            self._docs_cached.unpersist()
        self.__init__(
            self.spark,
            self.index_dir,
            cache_docs=self._docs_cached is not None,
            dict_cache_rows=self.dict_cache_rows,
        )
