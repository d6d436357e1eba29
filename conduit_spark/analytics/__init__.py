"""Analytics surface: relational queries + training-data operators.

The reference has no relational algebra (SURVEY.md §2.4) — joins,
aggregations, windows, sorts come straight from Spark SQL. This package
holds the engine's query library: the TPC-H-ish relational suite
(``relational``), large-scale dedup (``dedup``), similarity search
(``similarity``), text analysis (``text``) and multimodal plumbing
(``multimodal``).
"""
