"""share_spark — a from-scratch PySpark-native full-text index + search engine.

Re-expresses the query and data-processing capabilities of
CenterForOpenScience/SHARE (reference at /root/reference) Spark-first:

- ingest/extract plane  -> vectorized pandas/Arrow UDFs over DataFrames
  (reference: trove/digestive_tract.py, trove/extract/)
- index plane           -> explicit inverted index: sorted, delta+varint
  compressed posting blocks with per-block max-impact metadata, built with
  range partitioning (skew-proof shuffle) and queried with block-max WAND
  (reference delegated all of this to Elasticsearch/Lucene)
- query plane           -> DataFrame plans: semi/anti-join filters, groupBy
  aggregations, top-k + cursors
  (reference: trove/trovesearch/search_params.py,
   share/search/index_strategy/trovesearch_denorm.py)

No code is copied from the reference; citations in docstrings are for
behavioral parity only.
"""

__version__ = "0.1.0"
