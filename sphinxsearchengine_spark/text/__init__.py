from sphinxsearchengine_spark.text.tokenizer import (  # noqa: F401
    tokenize,
    index_terms,
    mangle_category,
    sanitize_query,
    stem_token,
)
