"""quickwit_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch rebuild of the indexing/search core of the reference engine
(Quickwit, at /root/reference) on idiomatic PySpark: DataFrame jobs build
per-partition immutable segments of delta-encoded varint-compressed posting
lists with per-block max-score metadata; a StableLog merge policy
hierarchically merges segments; queries answer top-k BM25 with posting-list
intersection/union and block-max WAND pruning, rank-identical to the
reference semantics.

Layout:
    functions/  tokenizers (code-aware), BM25 math, hashing
    index/      corpus generator, segment builder, manifest, merge
    search/     query AST, parser, execution engine, WAND
    pipeline/   training-data ops: dedup, similarity search, text stats
    streaming/  incremental/resumable build helpers
"""

__version__ = "0.1.0"
