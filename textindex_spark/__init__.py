"""textindex_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch Spark engine with the query and data-processing
capabilities of the reference full-text indexer (thscharler/textindex,
surveyed in SURVEY.md), re-architected for the DataFrame/Catalyst
execution model: Common-Crawl-style page tables in, compressed
posting-list tables out, BM25 block-max top-k at query time.
"""

__version__ = "0.1.0"
