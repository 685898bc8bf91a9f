"""Query catalog: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable, with a DuckDB-equivalent
oracle SQL string where the semantics are ANSI-SQL-expressible.

Modules:
  eventstore  — A-series analogues (positional reads, metadata, dedup)
  relational  — B-series (joins, aggs, windows, set ops, scalar fns)
  text        — C-series text analysis (quality, lang-id, tokens, fingerprints)
  dedup       — C-series dedup (exact, n-gram Jaccard, MinHash, SimHash)
  similarity  — C-series vector search (brute-force cosine, LSH buckets)
  multimodal  — C-series binary-column plumbing (pandas-UDF pipelines)
"""
