from sphinxsearchengine_spark.query.parser import parse_query, Query, Group, Atom  # noqa: F401
from sphinxsearchengine_spark.query.executor import search, search_with_meta  # noqa: F401
