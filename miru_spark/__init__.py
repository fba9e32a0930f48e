"""miru_spark — a PySpark-native inverted-index build + BM25 top-k query engine.

A from-scratch rebuild of the capabilities of jivesoftware/miru's full-text
path (index construction + top-k query) as an idiomatic Spark batch engine,
plus the context operators (distincts, analytics waveforms, aggregate counts,
collaborative filtering, trending) and large-scale training-data operators
(dedup, similarity search, text analysis) a 100 TB corpus pipeline needs.

Design blueprint with reference file:line citations: /root/repo/SURVEY.md.
Nothing in here is a port — physical execution is DataFrame/SQL (Catalyst)
with vectorized Arrow UDFs confined to the varint codec and the WAND kernel.
"""

__version__ = "0.1.0"
