from sphinxsearchengine_spark.index.layout import IndexLayout, IndexMeta  # noqa: F401
from sphinxsearchengine_spark.index.builder import build_index  # noqa: F401
