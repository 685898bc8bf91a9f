"""Deterministic sampling & dataset splitting (training-data pipeline
surface): systematic hash sampling, per-stratum rates, and
train/val/test splits. All decisions are pure functions of a stable
content key (md5 of the doc id), so results are reproducible across
runs, engines, and cluster sizes — the property `df.sample`'s
RNG-based sampling can't give — and each is verified against the
DuckDB oracle computing the identical hash arithmetic.

Scale: sampling is a stateless per-row filter — no shuffle at all
until the reporting aggregate; the filter pushes to the scan's
projection (md5 of one column). A 100 TB sweep samples in one pass
with no coordination, and re-running it (or sampling a later
snapshot) keeps every previously-selected row selected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hematite_spark.functions import norm_text as _norm_text
from hematite_spark.io import load_table


def _hash_pct(key: Column) -> Column:
    """Stable 0-99 hash of a key: first 4 hex chars of md5 → int %
    100. JVM-side (conv), no UDF."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("bigint") % 100


# DuckDB equivalent of _hash_pct (it has no conv(); hex digits via
# strpos arithmetic, as elsewhere in the catalog).
_DUCK_HASH_PCT = (
    "(((strpos('0123456789abcdef', md5({k})[1]) - 1) * 4096"
    " + (strpos('0123456789abcdef', md5({k})[2]) - 1) * 256"
    " + (strpos('0123456789abcdef', md5({k})[3]) - 1) * 16"
    " + (strpos('0123456789abcdef', md5({k})[4]) - 1)) % 100)"
)


def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% systematic sample of documents: rows whose key-hash falls
    in [0, 10). Summarized per language (count + char sum) so the
    sampled set itself is value-checked, compactly."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.where(_hash_pct(F.col("doc_id")) < 10)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang")
    )


SAMPLE_SYSTEMATIC_SQL = f"""
SELECT lang, count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
       min(doc_id) AS first_doc
FROM documents
WHERE {_DUCK_HASH_PCT.format(k="doc_id::VARCHAR")} < 10
GROUP BY lang
ORDER BY lang
"""


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling — per-language rates (en 50%, else 20%):
    the corpus-rebalancing step of an LLM data pipeline. The rate
    lookup is a CASE on the stratum column; selection stays a
    stateless hash filter."""
    docs = load_table(spark, "documents", sf_dir)
    rate = F.when(F.col("lang") == "en", F.lit(50)).otherwise(F.lit(20))
    return (
        docs.where(_hash_pct(F.col("doc_id")) < rate)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.sum("n_chars").alias("sampled_chars"))
        .orderBy("lang")
    )


SAMPLE_STRATIFIED_SQL = f"""
SELECT lang, count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE {_DUCK_HASH_PCT.format(k="doc_id::VARCHAR")}
      < (CASE WHEN lang = 'en' THEN 50 ELSE 20 END)
GROUP BY lang
ORDER BY lang
"""


def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by key hash —
    membership is stable under corpus growth (a doc never migrates
    between splits when new docs arrive), unlike randomSplit. Reports
    per-split size and char statistics."""
    docs = load_table(spark, "documents", sf_dir)
    h = _hash_pct(F.col("doc_id"))
    split = F.when(h < 80, "train").when(h < 90, "val").otherwise(F.lit("test"))
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("split")
    )


SPLIT_TRAIN_TEST_SQL = f"""
SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 4) AS avg_chars
FROM (SELECT {_DUCK_HASH_PCT.format(k="doc_id::VARCHAR")} AS h, n_chars FROM documents)
GROUP BY split
ORDER BY split
"""


def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened domain mixture (the multilingual /
    multi-domain rebalancing rule used for training corpora): domain
    d's sampling weight ∝ p_d^α with α = 0.5, normalized so the
    highest-weight domain keeps 100% of its docs — small domains are
    up-weighted relative to their share, big ones thinned. Selection
    is the same stateless doc_id-hash filter as the other samplers,
    so the drawn set is deterministic and growth-stable; only the
    per-domain RATE comes from the corpus profile.

    Shape at scale: one tiny per-domain count aggregate (O(domains)
    rows) broadcast back into a stateless filter over the corpus —
    the 100 TB pass is scan + broadcast-join + filter, no wide
    shuffle. Reports per-domain before/after sizes and the applied
    rate."""
    docs = load_table(spark, "documents", sf_dir)
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    # w_d = sqrt(share); rate_d = 100 * w_d / max(w_d). Computed on
    # O(domains) rows — the max is a second tiny aggregate, cross-
    # joined (broadcast) rather than collected.
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    w = counts.crossJoin(F.broadcast(total)).select(
        "source", "n_docs", F.sqrt(F.col("n_docs") / F.col("n_total")).alias("w")
    )
    wmax = w.agg(F.max("w").alias("w_max"))
    rates = w.crossJoin(F.broadcast(wmax)).select(
        "source", "n_docs", (F.lit(100.0) * F.col("w") / F.col("w_max")).alias("rate")
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .where(_hash_pct(F.col("doc_id")) < F.col("rate"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"), F.first("n_docs").alias("n_before"),
             F.round(F.first("rate"), 4).alias("rate_pct"))
        .select("source", "n_before", "n_sampled", "rate_pct")
        .orderBy("source")
    )


SAMPLE_TEMPERATURE_SQL = f"""
WITH counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
w AS (SELECT source, n_docs,
             sqrt(n_docs / CAST((SELECT sum(n_docs) FROM counts) AS DOUBLE)) AS w
      FROM counts),
rates AS (SELECT source, n_docs,
                 100.0 * w / (SELECT max(w) FROM w) AS rate
          FROM w)
SELECT source, n_docs AS n_before, count(*) AS n_sampled,
       round(rate, 4) AS rate_pct
FROM documents JOIN rates USING (source)
WHERE {_DUCK_HASH_PCT.format(k="doc_id::VARCHAR")} < rate
GROUP BY source, n_docs, rate
ORDER BY source
"""


def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis:
    each doc draws a stable uniform u from md5(doc_id) and competes
    with key u^(1/weight) (weight = n_chars); the global top-20 keys
    ARE a weighted sample without replacement. This is THE
    distributed weighted-sampling algorithm: the key is a stateless
    per-row expression (no RNG, reproducible across engines and
    cluster sizes), selection is a top-k (TakeOrderedAndProject —
    per-task heaps, no global sort), and streams/partitions merge by
    just keeping the k largest keys. Keys round to 9 decimals so both
    engines' pow() agree; ties break on doc_id."""
    docs = load_table(spark, "documents", sf_dir)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )
    key = F.round(F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double")), 9)
    return (
        docs.select("doc_id", "source", F.col("n_chars").alias("weight"), key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(20)
    )


SAMPLE_WEIGHTED_SQL = """
SELECT doc_id, source, n_chars AS weight,
       round(pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT) / 4294967296.0,
                 1.0 / n_chars), 9) AS es_key
FROM documents
ORDER BY es_key DESC, doc_id
LIMIT 20
"""


def shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global training-order shuffle + sharding: every doc
    gets a pseudorandom rank (md5 of seed‖doc_id — stateless, so the
    permutation is reproducible on any cluster size and stable under
    re-runs) and a shard (rank-hash mod 8). This is the "shuffle the
    corpus before training" step: at 100 TB you never materialize a
    global sort — the shard is the write-partition key (one
    repartition by shard, sort WITHIN shards by rank at write), and
    readers interleave shards. Verifies the permutation is balanced
    and unbiased: per-shard doc counts, char mass, and the mean
    normalized rank (≈0.5 per shard when the hash mixes well).
    Seed change ⇒ a fresh, equally-balanced permutation."""
    docs = load_table(spark, "documents", sf_dir)
    h = F.md5(F.concat(F.lit("seed42:"), F.col("doc_id").cast("string")))
    rank = F.conv(F.substring(h, 1, 12), 16, 10).cast("double") / F.lit(float(16**12))
    shard = (F.conv(F.substring(h, 13, 4), 16, 10).cast("bigint") % 8).alias("shard")
    return (
        docs.select(shard, rank.alias("rank"), "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("rank"), 4).alias("mean_rank"),
            F.round(F.min("rank"), 6).alias("min_rank"),
            F.round(F.max("rank"), 6).alias("max_rank"),
        )
        .orderBy("shard")
    )


SHUFFLE_DETERMINISTIC_SQL = """
WITH h AS (
  SELECT md5('seed42:' || doc_id::VARCHAR) AS hx, n_chars FROM documents
), ranked AS (
  SELECT ('0x' || substr(hx, 1, 12))::BIGINT / CAST(281474976710656 AS DOUBLE) AS rank,
         ('0x' || substr(hx, 13, 4))::BIGINT % 8 AS shard,
         n_chars
  FROM h)
SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(rank), 4) AS mean_rank,
       round(min(rank), 6) AS min_rank, round(max(rank), 6) AS max_rank
FROM ranked
GROUP BY shard
ORDER BY shard
"""


def split_temporal_purged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free temporal split with an embargo gap: train on the
    first 70% of the event time range, embargo the next 5% (rows
    whose information could leak across the boundary — label windows,
    session tails — are DROPPED, not assigned), test on the rest.
    The time-series analogue of split_train_test: hash splits leak
    future information for forecasting tasks; purged temporal splits
    are the standard fix (combinatorial purged CV in finance).

    Cutoffs derive from the global min/max timestamp — two tiny
    aggregates broadcast into a stateless row filter, so the corpus
    pass is scan + filter, no shuffle beyond the final per-split
    rollup. Split boundaries are reported in epoch-µs so the result
    is engine-exact (no float time arithmetic)."""
    ev = load_table(spark, "events", sf_dir)
    us = F.unix_micros(F.col("ts"))
    bounds = ev.agg(
        F.min(us).alias("t0"), F.max(us).alias("t1")
    )
    b = F.broadcast(bounds)
    span = F.col("t1") - F.col("t0")
    train_end = (F.col("t0") + (span * 70) / 100).cast("bigint")
    test_start = (F.col("t0") + (span * 75) / 100).cast("bigint")
    tagged = (
        ev.select(us.alias("us"), "event_type")
        .crossJoin(b)
        .select(
            "event_type",
            "us",
            train_end.alias("train_end"),
            test_start.alias("test_start"),
        )
        .withColumn(
            "split",
            F.when(F.col("us") <= F.col("train_end"), "train")
            .when(F.col("us") >= F.col("test_start"), "test")
            .otherwise(F.lit("embargo")),
        )
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.min("us").alias("first_us"),
            F.max("us").alias("last_us"),
        )
        .orderBy("split")
    )


SPLIT_TEMPORAL_SQL = """
WITH b AS (
  SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 FROM events
), tagged AS (
  SELECT event_type, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) <= CAST(b.t0 + ((b.t1 - b.t0) * 70) / 100 AS BIGINT) THEN 'train'
              WHEN epoch_us(ts) >= CAST(b.t0 + ((b.t1 - b.t0) * 75) / 100 AS BIGINT) THEN 'test'
              ELSE 'embargo' END AS split
  FROM events, b)
SELECT split, count(*) AS n_events, count(DISTINCT event_type) AS n_types,
       min(us) AS first_us, max(us) AS last_us
FROM tagged
GROUP BY split
ORDER BY split
"""


def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling (k=3 per source): rank each
    group's docs by a stable md5 draw and keep the first three — the
    "show me a few examples from every domain" inspection query, and
    the building block for stratified eval-set construction when the
    stratum sizes are wildly skewed.

    One window pass partitioned by the group key; the md5 rank makes
    the choice reproducible and growth-stable in distribution (a new
    doc displaces at most one pick in its group). At 100 TB the
    window partitions by the group key — no global sort, and per-task
    top-k heaps do the work."""
    docs = load_table(spark, "documents", sf_dir)
    h = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.select("source", "doc_id", "lang", "n_chars")
        .withColumn("pick", F.row_number().over(w).cast("bigint"))
        .where(F.col("pick") <= 3)
        .orderBy("source", "pick")
    )


SAMPLE_PER_GROUP_SQL = """
SELECT source, doc_id, lang, n_chars, pick
FROM (
  SELECT source, doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(doc_id::VARCHAR), doc_id) AS pick
  FROM documents)
WHERE pick <= 3
ORDER BY source, pick
"""


def quality_nucleus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) data selection per source: rank each source's
    docs by quality and keep the head that covers 80% of the source's
    total quality mass — the budgeted quality-first selection rule
    (spend a token budget on the best docs, proportionally per
    domain), a step up from a global quality threshold because every
    source keeps its own best material.

    Two windows on the same source partitioning (running mass +
    total mass), then one aggregate. The running sum is sequential
    over an identical total order in both engines, so the float
    accumulation — and therefore the strict `< 0.8` boundary — is
    bit-reproducible. At 100 TB: source is the partition key; the
    per-source sort is the only heavy op and AQE splits skewed
    sources."""
    from hematite_spark.queries.text import quality_col

    docs = load_table(spark, "documents", sf_dir)
    q = docs.select("source", "doc_id", quality_col().alias("quality"))
    w_run = W.partitionBy("source").orderBy(F.col("quality").desc(), "doc_id")
    w_all = W.partitionBy("source")
    scored = q.select(
        "source",
        "quality",
        ((F.sum("quality").over(w_run) - F.col("quality")) < F.lit(0.8) * F.sum("quality").over(w_all)).alias(
            "kept"
        ),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.round(F.sum(F.when(F.col("kept"), F.col("quality")).otherwise(F.lit(0.0))), 4).alias("kept_mass"),
            F.round(F.sum("quality"), 4).alias("total_mass"),
        )
        .orderBy("source")
    )


QUALITY_NUCLEUS_SQL = """
WITH q AS (
  SELECT source, doc_id,
         round(least(1.0, len(w) / 50.0) * (len(list_distinct(w)) / CAST(len(w) AS DOUBLE))
               * (CASE WHEN len(list_intersect(list_distinct(w),
                   ['the','a','an','and','or','of','to','in','is','it'])) > 0
                  THEN 1.0 ELSE 0.5 END), 4) AS quality
  FROM (SELECT source, doc_id, string_split(text, ' ') AS w FROM documents)),
scored AS (
  SELECT source, quality,
         (sum(quality) OVER (PARTITION BY source ORDER BY quality DESC, doc_id) - quality)
           < 0.8 * sum(quality) OVER (PARTITION BY source) AS kept
  FROM q)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(sum(CASE WHEN kept THEN quality ELSE 0.0 END), 4) AS kept_mass,
       round(sum(quality), 4) AS total_mass
FROM scored
GROUP BY source
ORDER BY source
"""


def stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified k-fold assignment (k=5): every doc's
    fold is a pure function of its id (md5 mod k), so folds are
    reproducible, disjoint, and stable under corpus growth — append
    new docs and old assignments never move, the property random
    shuffles lose. The report audits balance per (stratum, fold):
    counts and each fold's share within its language stratum.

    Stateless hash filter → one hash aggregate + one stratum window;
    no shuffle of the corpus itself at scale (fold becomes a derived
    write-partition column)."""
    docs = load_table(spark, "documents", sf_dir)
    fold = (_hash_pct(F.col("doc_id")) % 5).cast("bigint")
    per = (
        docs.select("lang", fold.alias("fold"), "n_chars")
        .groupBy("lang", "fold")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars"))
    )
    w = W.partitionBy("lang")
    return (
        per.withColumn("share_of_lang", F.round(F.col("n_docs") / F.sum("n_docs").over(w), 4))
        .orderBy("lang", "fold")
    )


STRATIFIED_KFOLD_SQL = f"""
WITH per AS (
  SELECT lang, CAST({_DUCK_HASH_PCT.format(k="doc_id::VARCHAR")} % 5 AS BIGINT) AS fold,
         count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents
  GROUP BY 1, 2)
SELECT lang, fold, n_docs, n_chars,
       round(n_docs / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 4) AS share_of_lang
FROM per
ORDER BY lang, fold
"""


def data_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-recipe planning table: given per-(lang, source) token
    counts and a total training budget of 2× the corpus token count,
    allocate budget per domain under temperature sampling (α = 0.5,
    same rule as sample_temperature) and report the implied EPOCHS
    per domain (allocated ÷ available) — the number a pipeline owner
    reads to spot domains that would repeat too often (up-weighted
    small domains) before launching a run.

    Scale: per-domain token counts are one map-side-combined
    aggregate (token counts via size(split), no explode); everything
    after is O(domains) with 1-row broadcasts."""
    docs = load_table(spark, "documents", sf_dir)
    per_dom = (
        docs.select(
            "lang", "source",
            F.size(F.split(_norm_text(), " ")).cast("bigint").alias("n_tokens"),
        )
        .groupBy("lang", "source")
        .agg(F.sum("n_tokens").alias("tokens"))
    )
    tot = per_dom.agg(F.sum("tokens").alias("corpus_tokens"))
    w = per_dom.crossJoin(F.broadcast(tot)).select(
        "lang", "source", "tokens", "corpus_tokens",
        F.sqrt(F.col("tokens") / F.col("corpus_tokens")).alias("w"),
    )
    wsum = w.agg(F.sum("w").alias("w_sum"))
    return (
        w.crossJoin(F.broadcast(wsum))
        .select(
            "lang",
            "source",
            "tokens",
            F.round(F.col("w") / F.col("w_sum"), 6).alias("mix_share"),
            F.floor(F.col("w") / F.col("w_sum") * 2.0 * F.col("corpus_tokens"))
            .cast("bigint")
            .alias("allocated_tokens"),
            F.round(F.col("w") / F.col("w_sum") * 2.0 * F.col("corpus_tokens") / F.col("tokens"), 4)
            .alias("epochs"),
        )
        .orderBy("lang", "source")
    )


DATA_MIXTURE_SQL = """
WITH per_dom AS (
  SELECT lang, source,
         sum(len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')))::BIGINT AS tokens
  FROM documents GROUP BY lang, source),
tot AS (SELECT sum(tokens)::BIGINT AS corpus_tokens FROM per_dom),
w AS (SELECT lang, source, tokens, corpus_tokens,
             sqrt(tokens / CAST(corpus_tokens AS DOUBLE)) AS w
      FROM per_dom, tot),
ws AS (SELECT sum(w) AS w_sum FROM w)
SELECT lang, source, tokens,
       round(w / w_sum, 6) AS mix_share,
       CAST(floor(w / w_sum * 2.0 * corpus_tokens) AS BIGINT) AS allocated_tokens,
       round(w / w_sum * 2.0 * corpus_tokens / tokens, 4) AS epochs
FROM w, ws
ORDER BY lang, source
"""


def curriculum_phase_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule over sources: rank sources by their
    empirical-Bayes shrunk quality (the trustworthy ranking from
    source_quality_shrinkage), walk the ranking best-first
    accumulating token mass, and assign training phases by cumulative
    share — phase 1 = the cleanest third of tokens (early training),
    phase 3 = the noisy tail (late, after the model can absorb it).
    The per-source table a curriculum data-loader consumes.

    Scale: everything after the per-source aggregate is O(sources);
    the running-sum window over that pre-aggregate is allowlisted like
    revenue_growth_mom's O(months) window."""
    from pyspark.sql import Window

    from hematite_spark.queries.text import quality_col

    docs = load_table(spark, "documents", sf_dir)
    per_src = (
        docs.select(
            "source",
            quality_col().alias("q"),
            F.size(F.split(_norm_text(), " ")).cast("bigint").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.avg("q").alias("raw_mean"),
        )
    )
    g = per_src.agg(
        (F.sum(F.col("raw_mean") * F.col("n_docs")) / F.sum("n_docs")).alias("gmean"),
        F.sum("tokens").alias("total_tokens"),
    )
    shrunk = per_src.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        "tokens",
        "total_tokens",
        ((F.col("n_docs") * F.col("raw_mean") + 20.0 * F.col("gmean")) / (F.col("n_docs") + 20.0)).alias(
            "sq"
        ),
    )
    w = Window.orderBy(F.col("sq").desc(), F.col("source")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("tokens").over(w) / F.col("total_tokens")
    return (
        shrunk.select(
            "source",
            "tokens",
            F.round("sq", 6).alias("shrunk_q"),
            F.round(cum, 6).alias("cum_token_share"),
            F.when(cum <= 1.0 / 3, 1).when(cum <= 2.0 / 3, 2).otherwise(3).cast("bigint").alias(
                "phase"
            ),
        )
        .orderBy(F.col("shrunk_q").desc(), "source")
    )


CURRICULUM_SQL = """
WITH per_doc AS (
  SELECT source,
         round(least(1.0, len(w) / 50.0) * (len(list_distinct(w)) / CAST(len(w) AS DOUBLE))
             * (CASE WHEN len(list_intersect(list_distinct(w),
                 ['the','a','an','and','or','of','to','in','is','it'])) > 0
                THEN 1.0 ELSE 0.5 END), 4) AS q,
         len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '))::BIGINT AS n_tokens
  FROM (SELECT source, text, string_split(text, ' ') AS w FROM documents)),
per_src AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS tokens, avg(q) AS raw_mean
  FROM per_doc GROUP BY source),
g AS (SELECT sum(raw_mean * n_docs) / sum(n_docs) AS gmean, sum(tokens)::BIGINT AS total_tokens
      FROM per_src),
shrunk AS (
  SELECT source, n_docs, tokens, total_tokens,
         (n_docs * raw_mean + 20.0 * gmean) / (n_docs + 20.0) AS sq
  FROM per_src, g),
cum AS (
  SELECT source, tokens, sq,
         sum(tokens) OVER (ORDER BY sq DESC, source ROWS UNBOUNDED PRECEDING)
           / CAST(total_tokens AS DOUBLE) AS c
  FROM shrunk)
SELECT source, tokens, round(sq, 6) AS shrunk_q, round(c, 6) AS cum_token_share,
       (CASE WHEN c <= 1.0/3 THEN 1 WHEN c <= 2.0/3 THEN 2 ELSE 3 END)::BIGINT AS phase
FROM cum
ORDER BY shrunk_q DESC, source
"""


def domain_cap_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap — the C4/RefinedWeb-style curation rule
    'no more than N documents per domain/source': within each source,
    docs are ranked by a stable md5 hash (a deterministic uniform
    shuffle, so the kept subset is unbiased and reproducible) and only
    the first CAP=30 survive. Reported per source: kept/dropped counts
    and the kept share of characters — the inputs to rebalancing the
    mixture after capping.

    100 TB: one window partitioned BY SOURCE (never global) over a
    (source, doc_id) projection; at real scale the hot-domain skew is
    exactly what the cap removes, and AQE skew-split handles the rank
    computation for mega-domains. The selection predicate is stateless
    given (source, doc_id), so the capped set is stable under corpus
    growth in unaffected domains."""
    CAP = 30
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "n_chars")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = docs.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("rk") <= CAP).cast("long")).cast("bigint").alias("n_kept"),
            F.sum((F.col("rk") > CAP).cast("long")).cast("bigint").alias("n_dropped"),
            F.round(
                F.sum(F.when(F.col("rk") <= CAP, F.col("n_chars")).otherwise(F.lit(0)))
                / F.sum("n_chars"),
                6,
            ).alias("kept_char_share"),
        )
        .orderBy("source")
    )


DOMAIN_CAP_SQL = """
WITH ranked AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
  FROM documents)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN rk <= 30 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(CASE WHEN rk > 30 THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       round(sum(CASE WHEN rk <= 30 THEN n_chars ELSE 0 END) / CAST(sum(n_chars) AS DOUBLE), 6) AS kept_char_share
FROM ranked
GROUP BY source
ORDER BY source
"""


def gumbel_topk_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum Gumbel-top-k sampling plan: within each source,
    the 3 docs with the largest perturbed log-weights g = ln(weight)
    − ln(−ln(u)) (weight = n_chars, u a stable md5 uniform) ARE a
    weighted sample without replacement from that stratum — the
    Gumbel-max trick, the per-key twin of the global Efraimidis-
    Spirakis reservoir (sample_weighted_reservoir): same distribution
    family, but the key is additive in log-space, which is the form
    curriculum/temperature mixing composes with.

    100 TB: the Gumbel key is a stateless row expression; per-stratum
    top-3 is a source-partitioned window (per-partition heaps), never
    a global sort; output size = 3·#sources."""
    docs = load_table(spark, "documents", sf_dir)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("gum:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (h + 0.5) / F.lit(4294967296.0)
    g = F.round(
        F.log(F.col("n_chars").cast("double")) - F.log(-F.log(u)), 9
    )
    ranked = docs.select(
        "source", "doc_id", F.col("n_chars").alias("weight"), g.alias("gumbel_key")
    ).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("source").orderBy(F.col("gumbel_key").desc(), "doc_id")
        ),
    )
    return ranked.where(F.col("rk") <= 3).orderBy("source", "rk")


GUMBEL_TOPK_SQL = """
WITH keyed AS (
  SELECT source, doc_id, n_chars AS weight,
         round(ln(CAST(n_chars AS DOUBLE))
               - ln(-ln((('0x' || substr(md5('gum:' || doc_id::VARCHAR), 1, 8))::BIGINT + 0.5)
                        / 4294967296.0)), 9) AS gumbel_key
  FROM documents),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY gumbel_key DESC, doc_id) AS rk
  FROM keyed)
SELECT source, doc_id, weight, gumbel_key, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3
ORDER BY source, rk
"""
