"""Query catalog: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable, with a DuckDB-equivalent
oracle SQL string where the semantics are ANSI-SQL-expressible.

Modules:
  eventstore  — A-series analogues (positional reads, metadata, dedup)
  relational  — B-series (joins, aggs, windows, set ops, scalar fns)
  advanced    — B-series depth (subquery shapes, grouping sets,
                percentiles, graph census, RANGE frames); also the
                facade that re-exports the round-8 thematic split:
  stats       — statistical tests, resampling, calibration, causal
  timeseries  — drift, changepoints, forecasting, burstiness
  lake        — layout/compaction/profiling/reconciliation advisors
  recsys      — recommender, marketing, entity-resolution analytics
  udf         — B-series extension points (pandas UDAF, Python UDTF,
                HLL sketches)
  text        — C-series text analysis (quality, lang-id, tokens,
                fingerprints); facade re-exporting the round-8 split:
  textlm      — n-gram LMs, BPE, masking/skip-gram plans, serving audits
  dedup       — C-series dedup (exact, n-gram Jaccard, MinHash, SimHash,
                embedding-cosine)
  similarity  — C-series vector search (brute-force cosine, LSH buckets)
  multimodal  — C-series binary-column plumbing (pandas-UDF pipelines)
"""
