"""Vector similarity search (SURVEY.md §2 C) over the `embeddings`
table (`embedding ARRAY<FLOAT>`, 64-dim).

Paths:
* brute-force cosine top-k — the correctness baseline; dot products
  as built-in higher-order functions (zip_with + aggregate), JVM-side,
  no UDF. At scale: broadcast the query vector(s), one scan, per-task
  top-k heaps (TakeOrderedAndProject), no global sort.
* sign-bucket IVF — coarse quantization on projection signs; probing
  only the query's bucket prunes the scan ~2^bits×. The partition-
  pruned ANN path for 100 TB: bucket becomes the table's partition
  key, so a query touches one partition.
* pairwise similarity join ≥ threshold within a label block.

All arithmetic is done in float64 after an explicit cast (the column
is float32 at rest) and left-folded so Spark and the DuckDB oracle
compute bit-identical dot products; cosines are rounded to 6 decimals
before ordering so ordering is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hematite_spark.io import load_table


# vector primitives live in the shared expression library; the
# private aliases keep this module's query bodies unchanged
from hematite_spark.functions import DUCK_DOT as _DUCK_DOT
from hematite_spark.functions import DUCK_NORM as _DUCK_NORM
from hematite_spark.functions import dbl as _dbl
from hematite_spark.functions import dot as _dot
from hematite_spark.functions import l2_norm as _norm


def ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors of vec_id 0, brute force. The query
    vector rides along via a broadcast cross join (1 row); candidates
    never shuffle — only the 10 survivors reach the driver."""
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") == 0).select(_dbl("embedding").alias("qv"))
    e = emb.where(F.col("vec_id") != 0).select("vec_id", "label", _dbl("embedding").alias("ev"))
    return (
        e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(_dot(F.col("ev"), F.col("qv")) / (_norm(F.col("ev")) * _norm(F.col("qv"))), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


ANN_BRUTE_SQL = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
     e AS (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings WHERE vec_id <> 0)
SELECT vec_id, label,
       round({_DUCK_DOT.format(a="ev", b="qv")}
             / ({_DUCK_NORM.format(a="ev")} * {_DUCK_NORM.format(a="qv")}), 6) AS cosine
FROM e CROSS JOIN q
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def knn_multi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched k-NN: top-3 neighbors for each of 5 query vectors in
    one pass — queries broadcast, row_number per query prunes to k.
    The per-query-partitioned top-k never globally sorts."""
    from pyspark.sql import Window as W

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), _dbl("embedding").alias("qv")
    )
    e = emb.select("vec_id", _dbl("embedding").alias("ev"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_dot(F.col("ev"), F.col("qv")) / (_norm(F.col("ev")) * _norm(F.col("qv"))), 6).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .orderBy("query_id", "rnk")
    )


KNN_MULTI_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
     e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
scored AS (
  SELECT query_id, vec_id,
         round({_DUCK_DOT.format(a="ev", b="qv")}
               / ({_DUCK_NORM.format(a="ev")} * {_DUCK_NORM.format(a="qv")}), 6) AS cosine
  FROM e CROSS JOIN q
  WHERE vec_id <> query_id)
SELECT query_id, vec_id, cosine, rnk
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
      FROM scored)
WHERE rnk <= 3
ORDER BY query_id, rnk
"""


def ann_ivf_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bucket IVF: coarse-quantize every vector by the sign of
    its first 4 components (16 buckets), then report bucket sizes and
    per-bucket mean norm — the index-build step. A query then probes
    only its own bucket (and hamming-1 neighbors for recall). At
    100 TB the bucket id is the partition key ⇒ ANN probe = partition
    prune, not a scan."""
    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    bucket = sum(
        (F.when(F.element_at(ev, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))) for i in range(4)
    ).cast("bigint")
    return (
        emb.select("vec_id", bucket.alias("bucket"), _norm(ev).alias("norm"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .orderBy("bucket")
    )


ANN_IVF_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
SELECT bucket, count(*) AS n_vectors, round(avg(norm), 6) AS avg_norm, min(vec_id) AS min_vec_id
FROM (
  SELECT vec_id,
         CAST((CASE WHEN ev[1] >= 0 THEN 1 ELSE 0 END)
            + (CASE WHEN ev[2] >= 0 THEN 2 ELSE 0 END)
            + (CASE WHEN ev[3] >= 0 THEN 4 ELSE 0 END)
            + (CASE WHEN ev[4] >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS bucket,
         {_DUCK_NORM.format(a="ev")} AS norm
  FROM v)
GROUP BY bucket
ORDER BY bucket
"""


def _adaptive_b(emb: DataFrame):
    """Plane count for sign-bucket blockers, derived from the corpus
    count INSIDE the plan (1-row broadcast): b = max(4, ⌈log2(n/64)⌉)
    so bucket cardinality grows with the corpus and blocks stay ~64
    wide. A FIXED-width bucket key makes the pair space Σblock² —
    quadratic in the corpus (the scale_slope-measured trap fixed in
    fuzzy_match_parts and dedup_embedding_cosine)."""
    return emb.agg(
        F.greatest(F.lit(4), F.ceil(F.log2(F.count("*") / F.lit(64.0))).cast("int")).alias("b")
    )


_EV_DBL_SQL = "transform(embedding, x -> CAST(x AS DOUBLE))"


def _adaptive_bucket(ev_sql: str = _EV_DBL_SQL, max_bits: int = 32):
    """Sign bucket over the first `b` components, bits gated on the
    in-plan `b` column. `ev_sql` is the SQL text of the (double-cast)
    vector — the whole 32-term bucket is ONE parsed expression string
    (round 12: the sum-of-F.when Column chain cost ~0.35 s of py4j
    round-trips per query build; the parsed tree is identical, so
    plans and oracles are unchanged).

    `max_bits` is a hard ceiling on subdivision: above n ≈ 64·2^max_bits
    vectors the buckets stop splitting and pair growth reverts toward
    quadratic (the round-3 advisor's catch — the old cap of 16 bits
    saturated at ~4.2M vectors). At 32 of the 64 embedding components
    the cap sits at ~2.7e11 vectors — beyond the 100 TB design point —
    and the unused upper components remain available for multi-table
    probing (see dedup_embedding_cosine's multi-table variant)."""
    return F.expr(
        "CAST("
        + " + ".join(
            f"(CASE WHEN {i} < b AND element_at({ev_sql}, {i + 1}) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i in range(max_bits)
        )
        + " AS BIGINT)"
    )


_DUCK_ADAPTIVE_BS = (
    "bs AS (SELECT greatest(4, CAST(ceil(log2(count(*) / 64.0)) AS INT)) AS b FROM embeddings)"
)
_DUCK_ADAPTIVE_BUCKET = "CAST(" + " + ".join(
    f"(CASE WHEN {i} < b AND ev[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(32)
) + " AS BIGINT)"


def similarity_join_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity self-join: pairs with cosine ≥ 0.3 within the same
    (label, sign-bucket) block. The composite key bounds the pair
    space twice over: label alone leaves a hot label degrading to
    O(block²) at 100 TB, and the sign bucket is SCALE-ADAPTIVE —
    b = max(4, ⌈log2(n/64)⌉) planes derived from the corpus count
    inside the plan (see _adaptive_b) — so cell cardinality grows
    with the corpus and pair growth stays ~n·64 per label, never
    Σcell². The join stays a pure equi-join on both keys. Recall:
    high-cosine pairs agree on most hyperplane signs; multi-probe
    over hamming-1 neighbor buckets is the recall knob at scale
    (same policy as ann_ivf_search's probe list)."""
    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    # norm hoisted to a scalar column: pair score = one dot fold + a
    # scalar divide (see _knn_edges) — bit-identical values
    v = (
        emb.crossJoin(F.broadcast(_adaptive_b(emb)))
        .select("vec_id", "label", _adaptive_bucket().alias("bucket"), ev.alias("ev"))
        .withColumn("nrm", _norm(F.col("ev")))
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                _dot(F.col("a.ev"), F.col("b.ev")) / (F.col("a.nrm") * F.col("b.nrm")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.3)
        .orderBy("label", "vec_a", "vec_b")
    )


SIMILARITY_JOIN_SQL = f"""
WITH {_DUCK_ADAPTIVE_BS},
v AS (
  SELECT vec_id, label, {_DUCK_ADAPTIVE_BUCKET} AS bucket, ev, {_DUCK_NORM.format(a="ev")} AS nrm
  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings), bs)
SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_DUCK_DOT.format(a="a.ev", b="b.ev")} / (a.nrm * b.nrm), 6) AS cosine
FROM v a JOIN v b ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({_DUCK_DOT.format(a="a.ev", b="b.ev")} / (a.nrm * b.nrm), 6) >= 0.3
ORDER BY label, vec_a, vec_b
"""


def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics: count, mean L2 norm, mean of
    the first component — the sanity profile run before any ANN
    build."""
    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    return (
        emb.select("label", _norm(ev).alias("norm"), F.element_at(ev, 1).alias("c0"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.round(F.avg("c0"), 6).alias("avg_c0"),
        )
        .orderBy("label")
    )


EMBEDDING_STATS_SQL = f"""
SELECT label, count(*) AS n_vectors,
       round(avg(norm), 6) AS avg_norm, round(avg(c0), 6) AS avg_c0
FROM (SELECT label, {_DUCK_NORM.format(a="embedding::DOUBLE[]")} AS norm,
             CAST(embedding[1] AS DOUBLE) AS c0
      FROM embeddings)
GROUP BY label
ORDER BY label
"""


def ann_ivf_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer build step with LEARNED centroids (vs the
    static sign buckets of ann_ivf_buckets): seed 8 centroids
    deterministically (vec_id 0-7), assign every vector to its
    nearest centroid by exact L2, report per-cell size and mean
    distance — the statistics that drive nlist/nprobe tuning.

    Shape: centroids are O(k) rows → broadcast; assignment is one
    scan with a per-row min over k distances (no shuffle until the
    final per-cell aggregate). At 100 TB the assignment output is
    written back as the partition key, making every later ANN probe a
    partition-pruned read. Ties broken by centroid id so the
    assignment is total and engine-independent.

    Round 12 (optimization): the per-row min is now LITERALLY a
    per-row expression — argmin over the centroid set collapsed into
    one broadcast array row — instead of a crossJoin ×k + row_number
    window; the window shape paid an n×k exchange + sort for the same
    (d, centroid_id)-min the struct ordering computes in the scan
    projection (same fold, same tie-break — byte-identical output;
    same rewrite as kmeans_lloyd_step, A/B evidence there)."""
    emb = load_table(spark, "embeddings", sf_dir)
    cents_arr = (
        emb.where(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("centroid_id"), _dbl("embedding").alias("cv"))
        .agg(F.expr("array_sort(collect_list(struct(centroid_id, cv)))").alias("cs"))
    )
    best = (
        "array_min(transform(cs, c -> named_struct("
        "'d', sqrt(aggregate(zip_with(ev, c.cv, (x, y) -> (x - y) * (x - y)),"
        " 0.0D, (acc, x) -> acc + x)),"
        " 'centroid_id', c.centroid_id)))"
    )
    assigned = (
        emb.select("vec_id", _dbl("embedding").alias("ev"))
        .crossJoin(F.broadcast(cents_arr))
        .select("vec_id", F.expr(best).alias("b"))
        .select("vec_id", F.col("b.centroid_id").alias("centroid_id"), F.col("b.d").alias("d"))
    )
    return (
        assigned.groupBy("centroid_id")
        .agg(
            F.count("*").alias("cell_size"),
            F.round(F.avg("d"), 6).alias("mean_dist"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .orderBy("centroid_id")
    )


ANN_IVF_KMEANS_SQL = f"""
WITH c AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 8),
     v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
     scored AS (
       SELECT vec_id, centroid_id,
              sqrt(list_reduce(list_transform(list_zip(ev, cv),
                   p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                   (acc, x) -> acc + x)) AS d
       FROM v CROSS JOIN c),
     assigned AS (
       SELECT vec_id, centroid_id, d
       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, centroid_id) AS rn
             FROM scored)
       WHERE rn = 1)
SELECT centroid_id, count(*) AS cell_size, round(avg(d), 6) AS mean_dist,
       min(vec_id) AS min_vec_id
FROM assigned
GROUP BY centroid_id
ORDER BY centroid_id
"""


def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF search — the piece ann_ivf_buckets /
    ann_ivf_kmeans_assign build toward: (1) coarse-quantize every
    vector to its nearest of 8 deterministic centroids (vec_id 0-7's
    embeddings), (2) probe the nprobe=2 cells nearest the query
    (vec_id 0), (3) exact cosine top-10 WITHIN the probed cells only.

    Shape at scale: centroids and the probe list are O(k) broadcasts;
    assignment is a scan (no shuffle); the probe is a semi-join that
    — with cell id as partition key — becomes partition pruning, so
    the search touches nprobe/nlist of the corpus. Everything is
    deterministic (tie-breaks on centroid_id / vec_id), so the DuckDB
    oracle replicates the whole pipeline value-for-value; the recall
    gate vs ann_brute_force lives in the unit tests.

    Round 12 (optimization): assignment and probe filter are per-row
    expressions against ONE broadcast state row (the sorted centroid
    array, the nprobe probe list derived from it, and the query
    vector) — the old crossJoin ×k + row_number window shuffled n×k
    rows carrying the 64-double vector just to pick rn=1, and the
    probe semi-join was a second pass over the same broadcast. Same
    distances (identical fold), same (d, centroid_id) / (dq, id)
    tie-breaks via struct ordering ⇒ byte-identical output; the plan
    is now scan → project+filter → TakeOrdered with zero exchanges
    on the corpus side (plans/r12/ann_ivf_search_*.txt)."""
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") == 0).select(_dbl("embedding").alias("qv"))
    cents_arr = (
        emb.where(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("centroid_id"), _dbl("embedding").alias("cv"))
        .agg(F.expr("array_sort(collect_list(struct(centroid_id, cv)))").alias("cs"))
    )
    # one-row search state: centroid array + nprobe=2 probe list + query
    state = cents_arr.crossJoin(q).withColumn(
        "probe_cells",
        F.expr(
            "transform(slice(array_sort(transform(cs, c -> named_struct("
            "'dq', aggregate(zip_with(c.cv, qv, (x, y) -> (x - y) * (x - y)),"
            " 0.0D, (acc, x) -> acc + x),"
            " 'centroid_id', c.centroid_id))), 1, 2), s -> s.centroid_id)"
        ),
    )
    best = (
        "array_min(transform(cs, c -> named_struct("
        "'d', aggregate(zip_with(ev, c.cv, (x, y) -> (x - y) * (x - y)),"
        " 0.0D, (acc, x) -> acc + x),"
        " 'centroid_id', c.centroid_id)))"
    )
    from hematite_spark.functions import cosine

    return (
        emb.where(F.col("vec_id") != 0)
        .select("vec_id", "label", _dbl("embedding").alias("ev"))
        .crossJoin(F.broadcast(state))
        .withColumn("cell", F.expr(best + ".centroid_id"))
        .where(F.expr("array_contains(probe_cells, cell)"))
        .select(
            "vec_id",
            "label",
            "cell",
            F.round(cosine(F.col("ev"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF search over the sign-bucket quantizer — the
    recall knob ann_ivf_buckets' docstring promises: probe the query's
    own 4-bit sign bucket PLUS its 4 hamming-1 neighbors (one sign
    flipped), then exact cosine top-10 within the probed 5/16 cells.

    Multi-probe is how production IVF/LSH systems buy recall without
    touching nlist: a near neighbor that disagrees with the query on
    exactly one hyperplane sign lands one bit away, so probing the
    hamming-1 shell recovers it for 5/16 of the scan cost (vs 1/16
    single-probe). At 100 TB with bucket as the partition key the
    probe list IS the partition-pruning predicate — 5 partitions
    scanned, no shuffle; the probe set is an O(probes) broadcast."""
    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    bucket = (
        sum(
            (F.when(F.element_at(ev, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
            for i in range(4)
        ).cast("bigint")
    )
    v = emb.where(F.col("vec_id") != 0).select(
        "vec_id", "label", bucket.alias("bucket"), ev.alias("ev")
    )
    q = emb.where(F.col("vec_id") == 0).select(bucket.alias("qb"), ev.alias("qv"))
    probes = q.select(
        F.explode(
            F.array(
                F.col("qb"),
                *[F.col("qb").bitwiseXOR(F.lit(1 << i)) for i in range(4)],
            )
        ).alias("bucket")
    )
    from hematite_spark.functions import cosine

    return (
        v.join(F.broadcast(probes), "bucket", "left_semi")
        .crossJoin(F.broadcast(q.select("qv")))
        .select(
            "vec_id",
            "label",
            F.col("bucket").alias("cell"),
            F.round(cosine(F.col("ev"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


_DUCK_BUCKET = (
    "CAST((CASE WHEN {e}[1] >= 0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN {e}[2] >= 0 THEN 2 ELSE 0 END)"
    " + (CASE WHEN {e}[3] >= 0 THEN 4 ELSE 0 END)"
    " + (CASE WHEN {e}[4] >= 0 THEN 8 ELSE 0 END) AS BIGINT)"
)

ANN_IVF_MULTIPROBE_SQL = f"""
WITH v AS (
  SELECT vec_id, label, {_DUCK_BUCKET.format(e="ev")} AS bucket, ev
  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings WHERE vec_id <> 0)),
q AS (
  SELECT {_DUCK_BUCKET.format(e="qv")} AS qb, qv
  FROM (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)),
probes AS (
  SELECT unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4), xor(qb, 8)]) AS bucket FROM q)
SELECT vec_id, label, bucket AS cell,
       round({_DUCK_DOT.format(a="ev", b="qv")}
             / ({_DUCK_NORM.format(a="ev")} * {_DUCK_NORM.format(a="qv")}), 6) AS cosine
FROM v, q
WHERE bucket IN (SELECT bucket FROM probes)
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


_DUCK_SQDIST = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)

ANN_IVF_SEARCH_SQL = f"""
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
probe AS (
  SELECT centroid_id FROM cents, q
  ORDER BY {_DUCK_SQDIST.format(a="cv", b="qv")}, centroid_id
  LIMIT 2),
assigned AS (
  SELECT vec_id, label, ev, centroid_id FROM (
    SELECT e.vec_id, e.label, e.embedding AS ev, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_DUCK_SQDIST.format(a="e.embedding", b="c.cv")}, c.centroid_id) AS rn
    FROM embeddings e, cents c
    WHERE e.vec_id <> 0)
  WHERE rn = 1)
SELECT vec_id, label, centroid_id AS cell,
       round({_DUCK_DOT.format(a="ev", b="qv")}
             / ({_DUCK_NORM.format(a="ev")} * {_DUCK_NORM.format(a="qv")}), 6) AS cosine
FROM assigned, q
WHERE centroid_id IN (SELECT centroid_id FROM probe)
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def timeseries_corr_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the EDBT/SIGMOD streaming-
    similarity shape): which users' daily activity series move with
    user 0's? Align per-user daily value sums on date, score with
    Pearson correlation (z-normalized similarity, so scale/offset
    differences don't matter), keep users sharing ≥ 10 observed days,
    return the top-10.

    Shape at scale: the daily pre-aggregate shrinks events to
    O(users × days) BEFORE any join; the target series is a broadcast
    build side; corr is a single-pass co-moment aggregate. The full
    pairwise variant (every user vs every user) is the same plan with
    the target filter dropped and a self-join on day — still never
    materializing raw-event pairs.

    No LIMIT cut: membership is governed solely by the exact integer
    n_days filter, so a last-ulp corr difference between engines can
    only perturb one VALUE past its rounding boundary, never which
    rows the two engines return (a top-k cut on a float rank would
    reintroduce that knife edge)."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum("value").alias("v"))
    base = daily.where(F.col("user_id") == 0).select("day", F.col("v").alias("v0"))
    return (
        daily.where(F.col("user_id") != 0)
        .join(F.broadcast(base), "day")
        .groupBy("user_id")
        .agg(
            F.round(F.corr("v", "v0"), 6).alias("corr"),
            F.count("*").alias("n_days"),
        )
        .where(F.col("n_days") >= 10)
        .orderBy(F.col("corr").desc(), "user_id")
    )


TIMESERIES_CORR_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, sum(value) AS v
  FROM events GROUP BY user_id, day),
base AS (SELECT day, v AS v0 FROM daily WHERE user_id = 0)
SELECT user_id, round(corr(v, v0), 6) AS corr, count(*) AS n_days
FROM daily JOIN base USING (day)
WHERE user_id <> 0
GROUP BY user_id
HAVING count(*) >= 10
ORDER BY corr DESC, user_id
"""


def ann_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query fusion (the AnalyticDB-V shape): vector top-k UNDER a
    structured predicate — top-10 cosine neighbors of vec 0 among
    label=1 vectors only. The structured filter applies BEFORE any
    vector math, so the scan prunes on the (cheap, pushable) label
    column and the dot products run on the survivors — at 100 TB
    with label as a partition/cluster key this is partition pruning
    followed by a fraction-of-corpus scan, not post-filtering a
    global ANN result (which under-fills k when the filter is
    selective)."""
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") == 0).select(_dbl("embedding").alias("qv"))
    e = emb.where((F.col("vec_id") != 0) & (F.col("label") == 1)).select(
        "vec_id", _dbl("embedding").alias("ev")
    )
    from hematite_spark.functions import cosine

    return (
        e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("ev"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


ANN_FILTERED_SQL = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
     e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
           WHERE vec_id <> 0 AND label = 1)
SELECT vec_id,
       round({_DUCK_DOT.format(a="ev", b="qv")}
             / ({_DUCK_NORM.format(a="ev")} * {_DUCK_NORM.format(a="qv")}), 6) AS cosine
FROM e CROSS JOIN q
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the storage/
    bandwidth optimization every large vector corpus applies before
    indexing (4× smaller than float32, 8× smaller than the float64
    compute form). Per vector: symmetric scale 127/max|x|, quantized
    q_i = round_half_up(x_i · scale), reported as per-label
    reconstruction-error statistics (max and mean absolute error) —
    the quality contract that tells you whether int8 is safe for the
    recall target.

    All higher-order column functions (transform/zip_with/aggregate)
    — JVM-side per-row array math, zero Python, embarrassingly
    parallel; the only shuffle is the O(labels) final aggregate.
    Rounding is floor(x+0.5) in BOTH engines because Spark round()
    (HALF_UP) and DuckDB round() (half-even) disagree on .5 ties."""
    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    amax = F.array_max(F.transform(ev, lambda x: F.abs(x)))
    scale = F.lit(127.0) / amax
    q = F.transform(ev, lambda x: F.floor(x * scale + F.lit(0.5)))
    err = F.zip_with(ev, q, lambda x, qq: F.abs(x - qq / scale))
    per_vec = emb.select(
        "label",
        F.array_max(err).alias("max_err"),
        F.aggregate(err, F.lit(0.0), lambda a, x: a + x).alias("sum_err"),
        F.size(F.col("embedding")).alias("dim"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.max("max_err"), 6).alias("max_abs_err"),
            F.round(F.sum("sum_err") / F.sum("dim"), 6).alias("mean_abs_err"),
        )
        .orderBy("label")
    )


EMBEDDING_QUANTIZE_SQL = """
WITH v AS (
  SELECT label, embedding::DOUBLE[] AS ev FROM embeddings
), scaled AS (
  SELECT label, ev,
         127.0 / list_aggregate(list_transform(ev, x -> abs(x)), 'max') AS scale
  FROM v
), errs AS (
  SELECT label,
         list_transform(ev, x -> abs(x - floor(x * scale + 0.5) / scale)) AS err,
         len(ev) AS dim
  FROM scaled
)
SELECT label, count(*) AS n_vectors,
       round(max(list_aggregate(err, 'max')), 6) AS max_abs_err,
       round(sum(list_aggregate(err, 'sum')) / sum(dim), 6) AS mean_abs_err
FROM errs
GROUP BY label
ORDER BY label
"""


def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization with asymmetric distance (PQ/ADC): encode
    every vector as 4 codebook ids (one per 16-dim subspace, 8
    centroids each — here the deterministic vec_id<8 slice), then
    score the query against CODES ONLY, summing per-subspace
    query→centroid distances from a 32-cell lookup table. This is the
    memory-side ANN compression story: at 100 TB the corpus resides
    as 4 bytes of codes per vector (16× less than float32), the ADC
    lookup is a broadcast of 8×4 floats, and scoring is 4 tiny
    broadcast-hash joins + an add — no float vectors are touched
    after encoding. Exact distance rides along as the recall audit.

    Encoding picks argmin by lexicographic (distance, centroid-id)
    struct-min, so ties are deterministic and both engines agree
    code-for-code."""
    emb = load_table(spark, "embeddings", sf_dir)
    v = emb.select("vec_id", _dbl("embedding").alias("e"))
    cents = v.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    sub_d = [
        F.expr(
            f"aggregate(zip_with(slice(e, {16 * s + 1}, 16), slice(ce, {16 * s + 1}, 16),"
            " (x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)"
        ).alias(f"d{s}")
        for s in range(4)
    ]
    pair = v.crossJoin(F.broadcast(cents)).select("vec_id", "cid", *sub_d)
    codes = pair.groupBy("vec_id").agg(
        *[
            F.min(F.struct(F.col(f"d{s}").alias("d"), F.col("cid").alias("cid")))
            .getField("cid")
            .alias(f"code{s}")
            for s in range(4)
        ]
    )
    q = v.where(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    lut = cents.crossJoin(F.broadcast(q)).select(
        "cid",
        *[
            F.expr(
                f"aggregate(zip_with(slice(qe, {16 * s + 1}, 16), slice(ce, {16 * s + 1}, 16),"
                " (x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)"
            ).alias(f"qd{s}")
            for s in range(4)
        ],
    )
    scored = codes
    for s in range(4):
        scored = scored.join(
            F.broadcast(lut.select(F.col("cid").alias(f"code{s}"), f"qd{s}")), f"code{s}"
        )
    approx = scored.select(
        "vec_id",
        F.round(F.sqrt(F.col("qd0") + F.col("qd1") + F.col("qd2") + F.col("qd3")), 6).alias(
            "approx_dist"
        ),
    )
    exact = v.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(
            F.sqrt(
                F.expr(
                    "aggregate(zip_with(e, qe, (x, y) -> (x - y) * (x - y)),"
                    " 0.0D, (acc, x) -> acc + x)"
                )
            ),
            6,
        ).alias("exact_dist"),
    )
    return (
        approx.join(exact, "vec_id")
        .orderBy(F.col("approx_dist").asc(), "vec_id")
        .limit(20)
    )


def _pq_d2(a: str, b: str, s: int) -> str:
    lo = 16 * s + 1
    hi = 16 * s + 16
    return (
        f"list_reduce(list_transform(list_zip(list_slice({a}, {lo}, {hi}),"
        f" list_slice({b}, {lo}, {hi})), p -> (p[1] - p[2]) * (p[1] - p[2])),"
        " (acc, x) -> acc + x)"
    )


ANN_PQ_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), cents AS (
  SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8
), pair AS (
  SELECT v.vec_id, c.cid,
         {", ".join(_pq_d2("v.e", "c.ce", s) + f" AS d{s}" for s in range(4))}
  FROM v CROSS JOIN cents c
), codes AS (
  SELECT vec_id,
         {", ".join(f"(min(struct_pack(d := d{s}, cid := cid))).cid AS code{s}" for s in range(4))}
  FROM pair GROUP BY vec_id
), q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
lut AS (
  SELECT cid,
         {", ".join(_pq_d2("c.ce", "qe", s) + f" AS qd{s}" for s in range(4))}
  FROM cents c CROSS JOIN q
), approx AS (
  SELECT vec_id, round(sqrt(l0.qd0 + l1.qd1 + l2.qd2 + l3.qd3), 6) AS approx_dist
  FROM codes
  {" ".join(f"JOIN lut l{s} ON l{s}.cid = codes.code{s}" for s in range(4))}
), exact AS (
  SELECT vec_id,
         round(sqrt(list_reduce(list_transform(list_zip(e, qe),
               p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, x) -> acc + x)), 6) AS exact_dist
  FROM v CROSS JOIN q
)
SELECT vec_id, approx_dist, exact_dist
FROM approx JOIN exact USING (vec_id)
ORDER BY approx_dist ASC, vec_id
LIMIT 20
"""


def pair_mining_contrastive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining over the embedding table:
    positives are in-bucket near-neighbors (sign-bucket blocked
    cosine ≥ 0.42 — the dedup_embedding_cosine candidate generator
    reused as a POSITIVE miner), negatives are deterministic
    pseudo-random partners (vec_id shifted by a fixed stride mod n)
    kept only when cosine < 0.1 — the "easy negative" floor that
    keeps false negatives out of the batch.

    Scale design: positives come from the equi-join on the SCALE-
    ADAPTIVE sign bucket (b = max(4, ⌈log2(n/64)⌉) planes from the
    in-plan corpus count — see _adaptive_b; candidate volume stays
    ~n·64, never Σblock²); negatives are a self-join on a
    COMPUTED key (id + stride mod n) — one shuffle each, both keyed.
    No RNG anywhere: the same pairs mine on any cluster, any day —
    reproducible batches, diffable across pipeline versions. Returns
    per-label pair counts and cosine stats (the contract a batch
    sampler consumes)."""
    from hematite_spark.functions import dbl as _dbl2

    emb = load_table(spark, "embeddings", sf_dir)
    # norm hoisted to a scalar column (checkpointed with the vector)
    # so every pair — positive block pairs AND stride negatives —
    # scores with one dot fold + a scalar divide (see _knn_edges)
    v = (
        emb.crossJoin(F.broadcast(_adaptive_b(emb)))
        .select(
            "vec_id",
            _dbl2("embedding").alias("ev"),
            _adaptive_bucket().alias("bucket"),
        )
        .withColumn("nrm", _norm(F.col("ev")))
        .localCheckpoint()
    )
    cos = lambda pa, pb: F.round(
        _dot(F.col(pa + ".ev"), F.col(pb + ".ev")) / (F.col(pa + ".nrm") * F.col(pb + ".nrm")), 6
    )
    a, b = v.alias("a"), v.alias("b")
    pos = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(cos("a", "b").alias("cosine"))
        .where(F.col("cosine") >= 0.42)
        .withColumn("label", F.lit("positive"))
    )
    # stride partner computed in-plan: the 1-row corpus count rides a
    # broadcast cross join instead of a driver count() action
    nrow = v.agg(F.count("*").alias("n"))
    withpartner = (
        v.crossJoin(F.broadcast(nrow))
        .withColumn("partner", (F.col("vec_id") + (F.col("n") / 2).cast("bigint") + 13) % F.col("n"))
        .alias("a")
    )
    neg = (
        withpartner.join(b, F.col("b.vec_id") == F.col("a.partner"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(cos("a", "b").alias("cosine"))
        .where(F.col("cosine") < 0.1)
        .withColumn("label", F.lit("negative"))
    )
    return (
        pos.unionByName(neg)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("cosine"), 6).alias("avg_cos"),
            F.round(F.min("cosine"), 6).alias("min_cos"),
            F.round(F.max("cosine"), 6).alias("max_cos"),
        )
        .orderBy("label")
    )


PAIR_MINING_SQL = f"""
WITH {_DUCK_ADAPTIVE_BS},
v AS (
  SELECT vec_id, {_DUCK_ADAPTIVE_BUCKET} AS bucket, ev, {_DUCK_NORM.format(a="ev")} AS nrm
  FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings), bs
), n AS (SELECT count(*) AS n FROM v),
pos AS (
  SELECT 'positive' AS label,
         round({_DUCK_DOT.format(a="a.ev", b="b.ev")} / (a.nrm * b.nrm), 6) AS cosine
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
neg AS (
  SELECT 'negative' AS label,
         round({_DUCK_DOT.format(a="a.ev", b="b.ev")} / (a.nrm * b.nrm), 6) AS cosine
  FROM v a JOIN v b ON b.vec_id = (a.vec_id + (SELECT n // 2 + 13 FROM n)) % (SELECT n FROM n)
  WHERE a.vec_id < b.vec_id),
pairs AS (
  SELECT * FROM pos WHERE cosine >= 0.42
  UNION ALL
  SELECT * FROM neg WHERE cosine < 0.1)
SELECT label, count(*) AS n_pairs,
       round(avg(cosine), 6) AS avg_cos,
       round(min(cosine), 6) AS min_cos,
       round(max(cosine), 6) AS max_cos
FROM pairs
GROUP BY label
ORDER BY label
"""


def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's iteration of k-means over the embedding corpus —
    the centroid-UPDATE step that closes the loop ann_ivf_kmeans_assign
    opens: assign every vector to its nearest seed centroid (exact L2,
    ties by centroid id), then recompute each cell's centroid as the
    per-dimension mean of its members.

    Shape: the update is ONE hash aggregate producing 64 `avg` columns
    — vectors never explode to (row, dim) pairs, so rows never widen
    and the shuffle carries k×d doubles (bytes, not data). That is the
    same partial/final two-stage reduce Spark ML's KMeans runs per
    iteration. The k×64 result is unpivoted to (cell, dim, value) rows
    only at the very end, at vocabulary scale. At 100 TB one iteration
    is one scan + a k×d-byte shuffle; iterating = re-running with the
    updated centroids broadcast back in (reference has no ML surface;
    this is north-star C-series depth, SURVEY.md §2 C).

    Round 12 (optimization): the ASSIGNMENT is a per-row argmin
    expression over the k-row centroid set collapsed into ONE
    broadcast array row — `array_min(transform(cs, …struct(d, id)))`
    — instead of a crossJoin ×k + row_number window. The window shape
    shuffled n×k rows each CARRYING the 64-double vector through an
    exchange + sort just to pick rn=1; the expression computes the
    same k distances (identical fold, identical (d, centroid_id)
    tie-break = struct ordering) inside the scan projection, so the
    only exchange left in the whole query is the k×d-byte aggregate.
    A/B at sf0.1 (5-rep median, same protocol): 2.31 → 0.87 s; plan
    loses Exchange+2×Sort+Window (plans/r12/kmeans_lloyd_step_*.txt).
    The 64 avg columns and the unpivot array are built as parsed SQL
    strings (one py4j round-trip instead of ~400 — driver plan-build
    time is part of every query's latency at any scale)."""
    dim = 64
    emb = load_table(spark, "embeddings", sf_dir)
    cents_arr = (
        emb.where(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("centroid_id"), _dbl("embedding").alias("cv"))
        .agg(F.expr("array_sort(collect_list(struct(centroid_id, cv)))").alias("cs"))
    )
    best = (
        "array_min(transform(cs, c -> named_struct("
        "'d', sqrt(aggregate(zip_with(ev, c.cv, (x, y) -> (x - y) * (x - y)),"
        " 0.0D, (acc, x) -> acc + x)),"
        " 'centroid_id', c.centroid_id)))"
    )
    assigned = (
        emb.select(_dbl("embedding").alias("ev"))
        .crossJoin(F.broadcast(cents_arr))
        .select("ev", F.expr(best + ".centroid_id").alias("centroid_id"))
    )
    updated = assigned.groupBy("centroid_id").agg(
        F.count("*").alias("cell_size"),
        *[F.expr(f"avg(element_at(ev, {i + 1})) AS c{i}") for i in range(dim)],
    )
    unpivot = "explode(array(" + ", ".join(
        f"named_struct('dim', CAST({i} AS BIGINT), 'centroid_val', round(c{i}, 6))"
        for i in range(dim)
    ) + "))"
    return (
        updated.select("centroid_id", "cell_size", F.expr(unpivot).alias("p"))
        .select("centroid_id", "cell_size", F.col("p.dim").alias("dim"), F.col("p.centroid_val").alias("centroid_val"))
        .orderBy("centroid_id", "dim")
    )


KMEANS_LLOYD_SQL = """
WITH c AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 8),
     v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
     scored AS (
       SELECT vec_id, ev, centroid_id,
              sqrt(list_reduce(list_transform(list_zip(ev, cv),
                   p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                   (acc, x) -> acc + x)) AS d
       FROM v CROSS JOIN c),
     assigned AS (
       SELECT vec_id, ev, centroid_id
       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, centroid_id) AS rn
             FROM scored)
       WHERE rn = 1)
SELECT centroid_id, count(*) AS cell_size, CAST(t.i AS BIGINT) AS dim,
       round(avg(ev[CAST(t.i + 1 AS INTEGER)]), 6) AS centroid_val
FROM assigned CROSS JOIN range(64) t(i)
GROUP BY centroid_id, t.i
ORDER BY centroid_id, dim
"""


def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by THREE
    unrolled power-iteration steps — distributed linear algebra as
    plain DataFrame aggregates, no MLlib: each step is w = Σ_x (x·v)x
    (ONE hash aggregate producing 64 sum columns) followed by
    normalization, and the next step consumes v via a broadcast of the
    one-row result. The whole pipeline stays lazy — agg → broadcast
    crossJoin → agg — with no driver round-trip between steps.

    At 100 TB each step is one scan + a 64-double reduce (the shuffle
    carries bytes, not rows), which is exactly how distributed PCA's
    matrix-free power method scales; more steps = chain more of the
    same block. Start vector is the deterministic uniform unit vector
    so both engines walk the identical float sequence; components are
    rounded to 5 decimals."""
    dim = 64
    emb = load_table(spark, "embeddings", sf_dir)
    vecs = emb.select(_dbl("embedding").alias("ev"))

    # The 64 per-component sums are parsed SQL strings (round 13, the
    # linear_probe_gd treatment from round 12): each F.sum(d * ...)
    # Column previously embedded the full 64-term dot-product fold and
    # cost ~6 py4j round-trips — ~400 per step, ~1.2 k per build, paid
    # on every run inside the bench's timed window and inside a real
    # driver's submission path. The parsed trees are identical
    # (element_at/aggregate/zip_with built-ins, same left-fold order),
    # so plans, values and the oracle are unchanged.
    _dot_sql = (
        "aggregate(zip_with(ev, v, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    )

    def step(vcol_df: DataFrame) -> DataFrame:
        # vcol_df: one row, column `v` (array<double>); returns same shape
        joined = vecs.crossJoin(F.broadcast(vcol_df))
        w = joined.agg(
            *[
                F.expr(f"sum(({_dot_sql}) * element_at(ev, {j + 1})) AS w{j}")
                for j in range(dim)
            ]
        ).select(F.expr("array(" + ", ".join(f"w{j}" for j in range(dim)) + ")").alias("w"))
        nrm = _norm(F.col("w"))
        return w.select(
            F.transform(F.col("w"), lambda x: x / nrm).alias("v"), nrm.alias("eig")
        )

    v0 = spark.range(1).select(
        F.array(*[F.lit(1.0 / 8.0) for _ in range(dim)]).alias("v")
    )
    v = step(v0).select("v")
    v = step(v).select("v")
    final = step(v)
    return (
        final.select(F.posexplode("v").alias("dim", "comp"), "eig")
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            F.round("comp", 5).alias("component"),
            F.round("eig", 3).alias("eigenvalue"),
        )
        .orderBy("dim")
    )


def _pca_step_sql(prev: str, out: str, dim: int = 64) -> str:
    """One power-iteration CTE pair: {out}_w aggregates Σ(x·v)x over
    the corpus against the one-row {prev}(v); {out} normalizes."""
    dot = _DUCK_DOT.format(a="ev", b="v")
    sums = ", ".join(f"sum(({dot}) * ev[{j + 1}]) AS w{j}" for j in range(dim))
    arr = "list_value(" + ", ".join(f"w{j}" for j in range(dim)) + ")"
    return f"""{out}_w AS (
  SELECT {sums} FROM v_all CROSS JOIN {prev}),
{out} AS (
  SELECT list_transform(w, x -> x / nrm) AS v, nrm AS eig
  FROM (SELECT {arr} AS w, {_DUCK_NORM.format(a=arr)} AS nrm FROM {out}_w))"""


PCA_POWER_SQL = f"""
WITH v_all AS (SELECT embedding::DOUBLE[] AS ev FROM embeddings),
v0 AS (SELECT list_transform(range(64), x -> 0.125) AS v),
{_pca_step_sql("v0", "v1")},
{_pca_step_sql("v1", "v2")},
{_pca_step_sql("v2", "v3")}
SELECT CAST(t.i AS BIGINT) AS dim,
       round(v[CAST(t.i + 1 AS INTEGER)], 5) AS component,
       round(eig, 3) AS eigenvalue
FROM v3 CROSS JOIN range(64) t(i)
ORDER BY dim
"""


def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) similarity search — ALL neighbors within a
    cosine threshold of each query, the contract dedup and recall
    audits need where top-k under-reports dense neighborhoods. Same
    sign-bucket coarse quantizer as ann_ivf_multiprobe (exact bucket +
    hamming-1 shell = 5 of 16 cells probed), but the verify step
    keeps every candidate ≥ τ instead of ranking to k. At 100 TB the
    probed cells are pruned partitions; the output size is governed by
    τ, so the radius IS the cost knob."""
    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    bucket = sum(
        (F.when(F.element_at(ev, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))) for i in range(4)
    ).cast("bigint")
    base = emb.select("vec_id", ev.alias("ev"), bucket.alias("bucket"))
    qs = base.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("ev").alias("qv"), F.col("bucket").alias("qbucket")
    )
    # probe shell: the query's own cell + its 4 hamming-1 neighbors
    shell = qs.select(
        "query_id",
        "qv",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(4)],
            )
        ).alias("bucket"),
    )
    cand = base.where(F.col("vec_id") >= 3).join(F.broadcast(shell), "bucket")
    cos = F.round(_dot(F.col("ev"), F.col("qv")) / (_norm(F.col("ev")) * _norm(F.col("qv"))), 6)
    return (
        cand.select("query_id", "vec_id", cos.alias("cosine"))
        .where(F.col("cosine") >= 0.2)
        .orderBy("query_id", F.col("cosine").desc(), "vec_id")
    )


ANN_RANGE_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev,
         ((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
        + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
        + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
        + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)) AS bucket
  FROM embeddings),
qs AS (SELECT vec_id AS query_id, ev AS qv, bucket AS qbucket FROM base WHERE vec_id < 3),
shell AS (
  SELECT query_id, qv, u.bucket
  FROM qs, unnest([qbucket, xor(qbucket, 1), xor(qbucket, 2), xor(qbucket, 4), xor(qbucket, 8)]) u(bucket)),
cand AS (
  SELECT s.query_id, b.vec_id,
         round({_DUCK_DOT.format(a="b.ev", b="s.qv")}
               / ({_DUCK_NORM.format(a="b.ev")} * {_DUCK_NORM.format(a="s.qv")}), 6) AS cosine
  FROM base b JOIN shell s ON b.bucket = s.bucket
  WHERE b.vec_id >= 3)
SELECT query_id, vec_id, cosine
FROM cand
WHERE cosine >= 0.2
ORDER BY query_id, cosine DESC, vec_id
"""


_GD_LR = 2.0  # full-batch learning rate; 3 unrolled steps below


def linear_probe_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a linear probe (logistic regression, label 0 vs rest) on
    the embedding corpus by THREE unrolled full-batch gradient-descent
    steps — the standard representation-quality measurement in LLM
    pipelines (freeze embeddings, fit a linear head), executed the
    same way as embedding_pca_power_iteration: each step is ONE hash
    aggregate (65 avg columns: 64 weight gradients + bias) against the
    broadcast one-row parameter state, so the whole training run is a
    lazy agg → broadcast → agg chain with no driver round-trip and a
    shuffle that carries bytes, not rows.

    Deterministic: zero init + full-batch gradients — no RNG, no
    sampling — so both engines walk the identical float sequence. The
    oracle unrolls the same three steps as CTEs. Output: the trained
    weight per dimension (dim 64 = bias) and the final training loss,
    the number a quality dashboard tracks."""
    dim = 64
    emb = load_table(spark, "embeddings", sf_dir)
    data = emb.select(
        _dbl("embedding").alias("ev"),
        F.when(F.col("label") == 0, 1.0).otherwise(0.0).alias("y"),
    )

    def sigmoid(z):
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    def step(params: DataFrame) -> DataFrame:
        # params: one row (w array<double>, b double); returns same
        # shape. The 64 gradient columns are parsed SQL strings — one
        # py4j round-trip each instead of ~6 (round 12: DataFrame
        # construction is rebuilt per run and was ~2.1 s of the wall;
        # the parsed expressions are identical, so the plan — and the
        # oracle — are unchanged).
        joined = data.crossJoin(F.broadcast(params))
        p = sigmoid(_dot(F.col("ev"), F.col("w")) + F.col("b"))
        err = (p - F.col("y")).alias("err")
        grads = joined.select("ev", "w", "b", err).agg(
            *[F.expr(f"avg(err * element_at(ev, {j + 1})) AS g{j}") for j in range(dim)],
            F.avg("err").alias("gb"),
            F.first("w").alias("w"),
            F.first("b").alias("b"),
        )
        garr = F.expr("array(" + ", ".join(f"g{j}" for j in range(dim)) + ")")
        return grads.select(
            F.zip_with(F.col("w"), garr, lambda wj, gj: wj - F.lit(_GD_LR) * gj).alias("w"),
            (F.col("b") - F.lit(_GD_LR) * F.col("gb")).alias("b"),
        )

    params = spark.range(1).select(
        F.array(*[F.lit(0.0) for _ in range(dim)]).alias("w"), F.lit(0.0).alias("b")
    )
    for _ in range(3):
        params = step(params)
    # final pass: training loss under the trained parameters
    scored = data.crossJoin(F.broadcast(params))
    p = sigmoid(_dot(F.col("ev"), F.col("w")) + F.col("b"))
    loss = scored.agg(
        F.avg(-(F.col("y") * F.log(p) + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p))).alias(
            "train_loss"
        ),
        F.first("w").alias("w"),
        F.first("b").alias("b"),
    )
    return (
        loss.select(
            F.posexplode(F.concat(F.col("w"), F.array(F.col("b")))).alias("dim", "wv"),
            "train_loss",
        )
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            F.round("wv", 6).alias("weight"),
            F.round("train_loss", 6).alias("train_loss"),
        )
        .orderBy("dim")
    )


def _gd_step_sql(prev: str, out: str, dim: int = 64) -> str:
    dot = _DUCK_DOT.format(a="ev", b="w")
    p = f"(1.0 / (1.0 + exp(-({dot} + b))))"
    gsums = ", ".join(f"avg(({p} - y) * ev[{j + 1}]) AS g{j}" for j in range(dim))
    garr = "list_value(" + ", ".join(f"g{j}" for j in range(dim)) + ")"
    return f"""{out}_g AS (
  SELECT {gsums}, avg({p} - y) AS gb, first(w) AS w, first(b) AS b
  FROM data CROSS JOIN {prev}),
{out} AS (
  SELECT list_transform(list_zip(w, {garr}), t -> t[1] - {_GD_LR} * t[2]) AS w,
         b - {_GD_LR} * gb AS b
  FROM {out}_g)"""


LINEAR_PROBE_SQL = f"""
WITH data AS (
  SELECT embedding::DOUBLE[] AS ev,
         CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings),
p0 AS (SELECT list_transform(range(64), x -> 0.0) AS w, 0.0 AS b),
{_gd_step_sql("p0", "p1")},
{_gd_step_sql("p1", "p2")},
{_gd_step_sql("p2", "p3")},
final AS (
  SELECT avg(-(y * ln({{p}}) + (1.0 - y) * ln(1.0 - {{p}}))) AS train_loss,
         first(w) AS w, first(b) AS b
  FROM data CROSS JOIN p3),
exploded AS (
  SELECT CAST(t.i AS BIGINT) AS dim,
         CASE WHEN t.i < 64 THEN w[CAST(t.i + 1 AS INTEGER)] ELSE b END AS wv,
         train_loss
  FROM final CROSS JOIN range(65) t(i))
SELECT dim, round(wv, 6) AS weight, round(train_loss, 6) AS train_loss
FROM exploded
ORDER BY dim
""".format(
    p=f"(1.0 / (1.0 + exp(-({_DUCK_DOT.format(a='ev', b='w')} + b))))"
)


_RECALL_PROBES = (1, 2, 4, 8)


def ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 as a function of nprobe — the ANN tuning curve that
    prices the IVF recall knob: for each probe budget, what fraction
    of the TRUE top-10 (brute force) lives in the probed cells. A
    global-top-10 member inside a probed cell is always in the IVF
    top-10 (nothing outside the true top-10 outranks it), so recall
    reduces to counting which true neighbors' cells get probed — one
    10-row join, no per-nprobe reruns.

    Everything shares one assignment pass and one exact top-10; the
    per-nprobe results are 4 columns of one aggregate, unpivoted at
    the end. Read with lsh_parameter_sweep: these two tables are the
    tuning story for the similarity stack."""
    from pyspark.sql import Window as W

    emb = load_table(spark, "embeddings", sf_dir)
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), _dbl("embedding").alias("cv")
    )
    q = emb.where(F.col("vec_id") == 0).select(_dbl("embedding").alias("qv"))
    sqdist = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )
    # cells ranked by distance to the query (O(k) rows; global window
    # over the centroid table is the intended shape)
    ranked_cells = (
        cents.crossJoin(F.broadcast(q))
        .select("centroid_id", sqdist(F.col("cv"), F.col("qv")).alias("dq"))
        .withColumn("cell_rank", F.row_number().over(W.orderBy("dq", "centroid_id")))
        .select("centroid_id", "cell_rank")
    )
    # per-row argmin expression over the broadcast centroid array
    # (round 12 — replaces the crossJoin ×k + row_number window; same
    # fold, same (d, centroid_id) tie-break, byte-identical — A/B and
    # plan evidence at kmeans_lloyd_step / ann_ivf_search)
    cents_arr = cents.agg(
        F.expr("array_sort(collect_list(struct(centroid_id, cv)))").alias("cs")
    )
    best = (
        "array_min(transform(cs, c -> named_struct("
        "'d', aggregate(zip_with(ev, c.cv, (x, y) -> (x - y) * (x - y)),"
        " 0.0D, (acc, x) -> acc + x),"
        " 'centroid_id', c.centroid_id)))"
    )
    assigned = (
        emb.where(F.col("vec_id") != 0)
        .select("vec_id", _dbl("embedding").alias("ev"))
        .crossJoin(F.broadcast(cents_arr))
        .withColumn("centroid_id", F.expr(best + ".centroid_id"))
    )
    brute10 = (
        assigned.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "centroid_id",
            F.round(_dot(F.col("ev"), F.col("qv")) / (_norm(F.col("ev")) * _norm(F.col("qv"))), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )
    hits = brute10.join(F.broadcast(ranked_cells), "centroid_id").agg(
        *[
            F.sum(F.when(F.col("cell_rank") <= p, 1).otherwise(0)).cast("bigint").alias(f"h{p}")
            for p in _RECALL_PROBES
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(p).cast("bigint").alias("nprobe"),
                F.col(f"h{p}").alias("hits_at_10"),
                F.round(F.col(f"h{p}") / 10.0, 2).alias("recall_at_10"),
            )
            for p in _RECALL_PROBES
        ]
    )
    return (
        hits.select(F.explode(rows).alias("r"))
        .select("r.nprobe", "r.hits_at_10", "r.recall_at_10")
        .orderBy("nprobe")
    )


def _recall_sql() -> str:
    probes = _RECALL_PROBES
    hit_cols = ", ".join(
        f"CAST(sum(CASE WHEN cell_rank <= {p} THEN 1 ELSE 0 END) AS BIGINT) AS h{p}"
        for p in probes
    )
    unpivot = " UNION ALL ".join(
        f"SELECT CAST({p} AS BIGINT) AS nprobe, h{p} AS hits_at_10, round(h{p} / 10.0, 2) AS recall_at_10 FROM hits"
        for p in probes
    )
    d2 = (
        "list_reduce(list_transform(list_zip({a}, {b}),"
        " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),"
        " (acc, x) -> acc + x)"
    )
    return f"""
WITH c AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 8),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
ranked_cells AS (
  SELECT centroid_id, row_number() OVER (ORDER BY dq, centroid_id) AS cell_rank
  FROM (SELECT centroid_id, {d2.format(a="cv", b="qv")} AS dq FROM c CROSS JOIN q)),
v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings WHERE vec_id <> 0),
assigned AS (
  SELECT vec_id, ev, centroid_id
  FROM (SELECT v.vec_id, v.ev, c.centroid_id,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY {d2.format(a="ev", b="cv")}, c.centroid_id) AS rn
        FROM v CROSS JOIN c)
  WHERE rn = 1),
brute10 AS (
  SELECT vec_id, centroid_id,
         round({_DUCK_DOT.format(a="ev", b="qv")}
               / ({_DUCK_NORM.format(a="ev")} * {_DUCK_NORM.format(a="qv")}), 6) AS cosine
  FROM assigned CROSS JOIN q
  ORDER BY cosine DESC, vec_id
  LIMIT 10),
hits AS (
  SELECT {hit_cols}
  FROM brute10 JOIN ranked_cells USING (centroid_id))
SELECT * FROM ({unpivot}) ORDER BY nprobe
"""


ANN_RECALL_SQL = _recall_sql()


# ------------------------------------------------- matryoshka truncation


_MRL_DIMS = (8, 16, 32, 64)


def matryoshka_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation audit: how much of the full-dim
    (64) cosine ranking survives when vectors are truncated to their
    first d dims (the MRL serving trick — store one embedding, search
    a prefix). For query vec 0 and d ∈ {8, 16, 32, 64}: the top-10
    overlap with the 64-dim ranking and the mean TRUE (64-dim) cosine
    of the docs the truncated index would have returned — the quality
    actually delivered at that truncation.

    Scale: one projection computes all four cosines in a single scan
    (localCheckpoint → four TakeOrderedAndProject top-10s, each a
    per-partition heap + 10-row merge; no global sort). The audit
    joins 40-row lists — driver-free, corpus-size-independent."""
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") == 0).select(_dbl("embedding").alias("qv"))
    scored = (
        emb.where(F.col("vec_id") != 0)
        .select("vec_id", _dbl("embedding").alias("ev"))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            *[
                (
                    _dot(F.slice("ev", 1, d), F.slice("qv", 1, d))
                    / (_norm(F.slice("ev", 1, d)) * _norm(F.slice("qv", 1, d)))
                ).alias(f"cos{d}")
                for d in _MRL_DIMS
            ],
        )
        .localCheckpoint()
    )
    tops = None
    for d in _MRL_DIMS:
        t = (
            scored.orderBy(F.col(f"cos{d}").desc(), "vec_id")
            .limit(10)
            .select(
                F.lit(d).cast("bigint").alias("trunc_dim"),
                "vec_id",
                F.col("cos64").alias("full_cos"),
            )
        )
        tops = t if tops is None else tops.unionByName(t)
    full10 = (
        scored.orderBy(F.col("cos64").desc(), "vec_id")
        .limit(10)
        .select("vec_id", F.lit(1).alias("in_full"))
    )
    return (
        tops.join(F.broadcast(full10), "vec_id", "left")
        .groupBy("trunc_dim")
        .agg(
            F.sum(F.coalesce(F.col("in_full"), F.lit(0))).cast("bigint").alias("overlap_at_10"),
            F.round(F.avg("full_cos"), 6).alias("avg_full_cosine"),
        )
        .orderBy("trunc_dim")
    )


def _mrl_sql() -> str:
    cos = lambda d: (  # noqa: E731
        f"{_DUCK_DOT.format(a=f'ev[1:{d}]', b=f'qv[1:{d}]')}"
        f" / ({_DUCK_NORM.format(a=f'ev[1:{d}]')} * {_DUCK_NORM.format(a=f'qv[1:{d}]')})"
    )
    per_d = "\nUNION ALL\n".join(
        f"SELECT {d}::BIGINT AS trunc_dim, vec_id, cos64 AS full_cos FROM "
        f"(SELECT vec_id, cos64 FROM scored ORDER BY cos{d} DESC, vec_id LIMIT 10)"
        for d in _MRL_DIMS
    )
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id, {', '.join(f'{cos(d)} AS cos{d}' for d in _MRL_DIMS)}
  FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings WHERE vec_id <> 0), q),
tops AS ({per_d}),
full10 AS (SELECT vec_id, 1 AS in_full FROM scored ORDER BY cos64 DESC, vec_id LIMIT 10)
SELECT trunc_dim,
       sum(coalesce(in_full, 0))::BIGINT AS overlap_at_10,
       round(avg(full_cos), 6) AS avg_full_cosine
FROM tops LEFT JOIN full10 USING (vec_id)
GROUP BY trunc_dim
ORDER BY trunc_dim
"""


MATRYOSHKA_SQL = _mrl_sql()


# --------------------------------------- Johnson–Lindenstrauss projection


def _jl_signs(d_out: int = 16, d_in: int = 64) -> list:
    """Deterministic Rademacher projection matrix: sign(j,i) = ±1 from
    the md5 parity of "j:i". A constant — computed once driver-side,
    folded into the plan as literals (the matrix is O(d_out × d_in),
    never data-dependent)."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1.0
            for i in range(d_in)
        ]
        for j in range(d_out)
    ]


def jl_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction 64 → 16 with a
    deterministic ±1 (Rademacher) matrix, audited on the distance it
    is supposed to preserve: for the 250 deterministic pairs
    (2k, 2k+1), the ratio ‖y_a−y_b‖ / ‖x_a−x_b‖ should concentrate
    around 1. Reports pair count and the ratio's min/avg/max/stddev —
    the go/no-go check before swapping the 4×-cheaper projected
    vectors into a downstream ANN index.

    Scale: the projection is 16 fused dot products per row in one
    scan (matrix folded in as literals); pairing is an equi-join on
    floor(vec_id/2) — co-partitioned, no broadcast needed; the audit
    aggregate is one row."""
    signs = _jl_signs()
    emb = load_table(spark, "embeddings", sf_dir)
    proj = F.array(
        *[
            (
                _dot(
                    F.col("ev"),
                    F.array(*[F.lit(s) for s in signs[j]]),
                )
                / 4.0  # 1/sqrt(d_out): E‖y‖² = ‖x‖²
            )
            for j in range(16)
        ]
    )
    base = emb.select(
        "vec_id",
        (F.col("vec_id") / 2).cast("bigint").alias("pair_id"),
        _dbl("embedding").alias("ev"),
    ).select("vec_id", "pair_id", "ev", proj.alias("yv"))
    a = base.where(F.col("vec_id") % 2 == 0).select(
        "pair_id", F.col("ev").alias("ea"), F.col("yv").alias("ya")
    )
    b = base.where(F.col("vec_id") % 2 == 1).select(
        "pair_id", F.col("ev").alias("eb"), F.col("yv").alias("yb")
    )
    diff64 = _norm(F.zip_with("ea", "eb", lambda x, y: x - y))
    diff16 = _norm(F.zip_with("ya", "yb", lambda x, y: x - y))
    return (
        a.join(b, "pair_id")
        .select((diff16 / diff64).alias("ratio"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.min("ratio"), 6).alias("min_ratio"),
            F.round(F.avg("ratio"), 6).alias("avg_ratio"),
            F.round(F.max("ratio"), 6).alias("max_ratio"),
            F.round(F.stddev("ratio"), 6).alias("stddev_ratio"),
        )
    )


def _jl_sql() -> str:
    signs = _jl_signs()
    y = ", ".join(
        "("
        + _DUCK_DOT.format(a="ev", b=f"[{', '.join(str(s) for s in signs[j])}]::DOUBLE[]")
        + f") / 4.0 AS y{j}"
        for j in range(16)
    )
    d16 = "sqrt(" + " + ".join(f"(a.y{j} - b.y{j}) * (a.y{j} - b.y{j})" for j in range(16)) + ")"
    d64 = _DUCK_NORM.format(a="list_transform(list_zip(a.ev, b.ev), p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))")
    return f"""
WITH base AS (
  SELECT vec_id, (vec_id // 2)::BIGINT AS pair_id, ev, {y}
  FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)),
pairs AS (
  SELECT {d16} / {d64} AS ratio
  FROM base a JOIN base b USING (pair_id)
  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1)
SELECT count(*)::BIGINT AS n_pairs,
       round(min(ratio), 6) AS min_ratio,
       round(avg(ratio), 6) AS avg_ratio,
       round(max(ratio), 6) AS max_ratio,
       round(stddev_samp(ratio), 6) AS stddev_ratio
FROM pairs
"""


JL_PROJECTION_SQL = _jl_sql()


# ------------------------------------------------ label-centroid outliers


def embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel / out-of-distribution detection: distance of every
    vector to its own label's centroid, z-scored within the label;
    report the top-20 outliers — the candidates a training-data
    curation pass re-labels or drops.

    Scale: centroids via one (label, pos) explode-aggregate
    (O(labels × dim) rows), re-assembled into per-label arrays and
    BROADCAST into a single scan that computes distance; the per-label
    mean/std of distances is a second O(labels) broadcast. Top-20 via
    TakeOrderedAndProject. No driver round-trip, no pairwise joins."""
    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.select("vec_id", "label", _dbl("embedding").alias("ev"))
    cent = (
        base.select("label", F.posexplode("ev").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cv")
        )
    )
    dist = _norm(F.zip_with("ev", "cv", lambda a, b: a - b))
    with_d = base.join(F.broadcast(cent), "label").select("vec_id", "label", dist.alias("d"))
    stats = with_d.groupBy("label").agg(
        F.avg("d").alias("mu"), F.stddev("d").alias("sigma")
    )
    return (
        with_d.join(F.broadcast(stats), "label")
        .select(
            "vec_id",
            "label",
            F.round("d", 6).alias("dist_to_centroid"),
            F.round((F.col("d") - F.col("mu")) / F.col("sigma"), 6).alias("z"),
        )
        .orderBy(F.col("z").desc(), "vec_id")
        .limit(20)
    )


EMBEDDING_OUTLIERS_SQL = f"""
WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings),
cent AS (
  SELECT label, list(c ORDER BY pos) AS cv
  FROM (
    SELECT label, pos, avg(x) AS c
    FROM (SELECT label, unnest(ev) AS x, generate_subscripts(ev, 1) AS pos FROM base)
    GROUP BY label, pos)
  GROUP BY label),
with_d AS (
  SELECT vec_id, base.label,
         {_DUCK_NORM.format(a="list_transform(list_zip(ev, cv), p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))")} AS d
  FROM base JOIN cent ON base.label = cent.label),
stats AS (SELECT label, avg(d) AS mu, stddev_samp(d) AS sigma FROM with_d GROUP BY label)
SELECT vec_id, with_d.label, round(d, 6) AS dist_to_centroid,
       round((d - mu) / sigma, 6) AS z
FROM with_d JOIN stats ON with_d.label = stats.label
ORDER BY z DESC, vec_id
LIMIT 20
"""


def quantized_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval impact of int8 scalar quantization (the companion to
    embedding_quantize's reconstruction-error contract): run the
    vec-0 top-10 query against the int8-RECONSTRUCTED database
    (asymmetric: float query, quantized candidates — the production
    serving shape) and report the overlap with the exact top-10 plus
    the true-cosine quality both selections deliver. This is the
    measurement that clears int8 for a recall target.

    Scale: one scan computes exact and reconstructed cosine side by
    side (both pure higher-order column math); two
    TakeOrderedAndProject top-10s; a 20-row audit join."""
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") == 0).select(_dbl("embedding").alias("qv"))
    ev = _dbl("embedding")
    amax = F.array_max(F.transform(ev, lambda x: F.abs(x)))
    scale = F.lit(127.0) / amax
    rv = F.transform(ev, lambda x: F.floor(x * scale + F.lit(0.5)) / scale)
    scored = (
        emb.where(F.col("vec_id") != 0)
        .select("vec_id", ev.alias("ev"), rv.alias("rv"))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (_dot(F.col("ev"), F.col("qv")) / (_norm(F.col("ev")) * _norm(F.col("qv")))).alias(
                "cos_exact"
            ),
            (_dot(F.col("rv"), F.col("qv")) / (_norm(F.col("rv")) * _norm(F.col("qv")))).alias(
                "cos_quant"
            ),
        )
        .localCheckpoint()
    )
    top_exact = (
        scored.orderBy(F.col("cos_exact").desc(), "vec_id")
        .limit(10)
        .select("vec_id", F.lit(1).alias("in_exact"), F.col("cos_exact").alias("ce"))
    )
    top_quant = (
        scored.orderBy(F.col("cos_quant").desc(), "vec_id")
        .limit(10)
        .select("vec_id", F.col("cos_exact").alias("cq_true"))
    )
    overlap = top_quant.join(F.broadcast(top_exact), "vec_id", "left").agg(
        F.sum(F.coalesce(F.col("in_exact"), F.lit(0))).cast("bigint").alias("overlap_at_10"),
        F.round(F.avg("cq_true"), 6).alias("avg_true_cos_quant"),
    )
    exact_avg = top_exact.agg(F.round(F.avg("ce"), 6).alias("avg_true_cos_exact"))
    return overlap.crossJoin(F.broadcast(exact_avg)).select(
        "overlap_at_10", "avg_true_cos_exact", "avg_true_cos_quant"
    )


QUANTIZED_RECALL_SQL = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
base AS (
  SELECT vec_id, ev,
         list_transform(ev, x -> floor(x * (127.0 / list_aggregate(list_transform(ev, y -> abs(y)), 'max')) + 0.5)
                               / (127.0 / list_aggregate(list_transform(ev, y -> abs(y)), 'max'))) AS rv
  FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings WHERE vec_id <> 0)),
scored AS (
  SELECT vec_id,
         {_DUCK_DOT.format(a="ev", b="qv")} / ({_DUCK_NORM.format(a="ev")} * {_DUCK_NORM.format(a="qv")}) AS cos_exact,
         {_DUCK_DOT.format(a="rv", b="qv")} / ({_DUCK_NORM.format(a="rv")} * {_DUCK_NORM.format(a="qv")}) AS cos_quant
  FROM base, q),
top_exact AS (
  SELECT vec_id, 1 AS in_exact, cos_exact AS ce FROM scored ORDER BY cos_exact DESC, vec_id LIMIT 10),
top_quant AS (
  SELECT vec_id, cos_exact AS cq_true FROM scored ORDER BY cos_quant DESC, vec_id LIMIT 10)
SELECT (SELECT sum(coalesce(in_exact, 0)) FROM top_quant LEFT JOIN top_exact USING (vec_id))::BIGINT AS overlap_at_10,
       (SELECT round(avg(ce), 6) FROM top_exact) AS avg_true_cos_exact,
       (SELECT round(avg(cq_true), 6) FROM top_quant) AS avg_true_cos_quant
"""


def quality_embedding_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal curation audit: does the TEXT quality score agree
    with EMBEDDING-space typicality? Joins each doc's rule-based
    quality to its distance-from-label-centroid and reports, per
    label, the Pearson correlation plus both means — a strong
    negative correlation says the cheap text rules already find the
    embedding outliers; near-zero says the two filters are
    complementary and BOTH belong in the funnel.

    Scale: centroids via the same (label, pos) explode-aggregate
    broadcast as embedding_label_outliers; the docs⋈embeddings join
    is 1:1 on the id; the correlation is one O(labels) aggregate."""
    from hematite_spark.queries.text import quality_col

    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.select("vec_id", "label", _dbl("embedding").alias("ev"))
    cent = (
        base.select("label", F.posexplode("ev").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cv")
        )
    )
    dist = _norm(F.zip_with("ev", "cv", lambda a, b: a - b))
    docs = load_table(spark, "documents", sf_dir).select(
        F.col("doc_id").alias("vec_id"), quality_col().alias("q")
    )
    joined = (
        base.join(F.broadcast(cent), "label")
        .select("vec_id", "label", dist.alias("d"))
        .join(docs, "vec_id")
    )
    return (
        joined.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.corr("q", "d"), 6).alias("quality_dist_corr"),
            F.round(F.avg("q"), 6).alias("mean_quality"),
            F.round(F.avg("d"), 6).alias("mean_dist"),
        )
        .orderBy("label")
    )


QUALITY_EMB_CORR_SQL = f"""
WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings),
cent AS (
  SELECT label, list(c ORDER BY pos) AS cv
  FROM (
    SELECT label, pos, avg(x) AS c
    FROM (SELECT label, unnest(ev) AS x, generate_subscripts(ev, 1) AS pos FROM base)
    GROUP BY label, pos)
  GROUP BY label),
dists AS (
  SELECT vec_id, base.label,
         {_DUCK_NORM.format(a="list_transform(list_zip(ev, cv), p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))")} AS d
  FROM base JOIN cent ON base.label = cent.label),
q AS (
  SELECT doc_id AS vec_id,
         round(least(1.0, len(w) / 50.0) * (len(list_distinct(w)) / CAST(len(w) AS DOUBLE))
             * (CASE WHEN len(list_intersect(list_distinct(w),
                 ['the','a','an','and','or','of','to','in','is','it'])) > 0
                THEN 1.0 ELSE 0.5 END), 4) AS q
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
SELECT label, count(*)::BIGINT AS n_docs,
       round(corr(q, d), 6) AS quality_dist_corr,
       round(avg(q), 6) AS mean_quality,
       round(avg(d), 6) AS mean_dist
FROM dists JOIN q USING (vec_id)
GROUP BY label
ORDER BY label
"""


def ann_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ end-to-end search — the production ANN serving path that
    ann_ivf_search (coarse routing) and ann_pq_adc (compressed
    scoring) each exhibit half of: (1) coarse-quantize every vector to
    its nearest of 8 deterministic centroids, (2) probe the nprobe=2
    cells nearest the query, (3) inside the probed cells score CODES
    ONLY — 4 PQ codebook ids per vector, ADC lookup against a
    broadcast 8x4 table — to shortlist 50 candidates, (4) exact-cosine
    rerank of the shortlist to the final top-10.

    This is the FAISS IVFPQ + refine topology on DataFrames. At
    100 TB: cell id is the partition key, so the probe list IS the
    partition-pruning predicate (2/8 of the corpus scanned); inside a
    cell only 4-byte codes are read (16x less I/O than float32
    vectors); the exact-cosine rerank touches just the 50-row
    shortlist. Everything is deterministic (struct-min tie-breaks),
    so the DuckDB oracle replays the whole cascade value-for-value;
    the recall gate vs brute force lives in the unit tests.

    Round 12 (optimization): the whole cascade up to the shortlist is
    per-row expressions against ONE broadcast state row — centroid
    array, probe list, and the 4 ADC LUTs as cid→distance maps. The
    old shape paid (a) an n×k exchange + sort for the row_number
    assignment, (b) a probe semi-join pass, (c) a crossJoin ×k + a
    (vec_id, cell) hash-aggregate shuffle for the PQ codes, and (d)
    FOUR broadcast joins for the LUT lookups; each replacement is the
    same arithmetic with the same struct-min / element_at semantics,
    so the output is byte-identical (oracle re-verified). The rerank
    join disappears outright: the vector never leaves the row, so the
    50-row TakeOrdered heap simply keeps it. A/B at sf0.1 (5-rep
    median, same protocol): see OPTIMIZATION_r12.md;
    plans/r12/ann_ivfpq_search_*.txt shows the exchange count drop."""
    from hematite_spark.functions import cosine

    emb = load_table(spark, "embeddings", sf_dir)
    v = emb.select("vec_id", _dbl("embedding").alias("e"))
    q = v.where(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    cents_arr = (
        v.where(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
        .agg(F.expr("array_sort(collect_list(struct(cid, ce)))").alias("cs"))
    )

    def sub_d2(a: str, b: str, s: int) -> str:
        return (
            f"aggregate(zip_with(slice({a}, {16 * s + 1}, 16), slice({b}, {16 * s + 1}, 16),"
            " (x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)"
        )

    # one-row search state: centroid array, nprobe=2 probe list, and
    # the four ADC lookup tables as cid → partial-distance maps
    state = cents_arr.crossJoin(q).select(
        "cs",
        "qe",
        F.expr(
            "transform(slice(array_sort(transform(cs, c -> named_struct("
            "'dq', aggregate(zip_with(c.ce, qe, (x, y) -> (x - y) * (x - y)),"
            " 0.0D, (acc, x) -> acc + x),"
            " 'cid', c.cid))), 1, 2), s -> s.cid)"
        ).alias("probe_cells"),
        *[
            F.expr(
                f"map_from_entries(transform(cs, c -> struct(c.cid, {sub_d2('qe', 'c.ce', s)})))"
            ).alias(f"qlut{s}")
            for s in range(4)
        ],
    )
    best = (
        "array_min(transform(cs, c -> named_struct("
        "'d', aggregate(zip_with(e, c.ce, (x, y) -> (x - y) * (x - y)),"
        " 0.0D, (acc, x) -> acc + x),"
        " 'cid', c.cid)))"
    )
    code = lambda s: (
        f"array_min(transform(cs, c -> named_struct('d', {sub_d2('e', 'c.ce', s)},"
        " 'cid', c.cid))).cid"
    )
    shortlist = (
        v.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(state))
        .withColumn("cell", F.expr(best + ".cid"))
        .where(F.expr("array_contains(probe_cells, cell)"))
        .select(
            "vec_id",
            "cell",
            "e",
            "qe",
            F.expr(
                "round(sqrt("
                + " + ".join(f"element_at(qlut{s}, {code(s)})" for s in range(4))
                + "), 6)"
            ).alias("approx_dist"),
        )
        .orderBy("approx_dist", "vec_id")
        .limit(50)
    )
    # exact rerank of the 50-row shortlist (the vector rode along)
    return (
        shortlist.select(
            "vec_id",
            "cell",
            "approx_dist",
            F.round(cosine(F.col("e"), F.col("qe")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


ANN_IVFPQ_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (
  SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
probe AS (
  SELECT cid AS cell FROM cents, q
  ORDER BY {_DUCK_SQDIST.format(a="ce", b="qe")}, cid
  LIMIT 2),
assigned AS (
  SELECT vec_id, e, cell FROM (
    SELECT v.vec_id, v.e, c.cid AS cell,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_DUCK_SQDIST.format(a="v.e", b="c.ce")}, c.cid) AS rn
    FROM v CROSS JOIN cents c
    WHERE v.vec_id <> 0)
  WHERE rn = 1),
probed AS (
  SELECT * FROM assigned WHERE cell IN (SELECT cell FROM probe)),
pair AS (
  SELECT p.vec_id, p.cell, c.cid,
         {", ".join(_pq_d2("p.e", "c.ce", s) + f" AS d{s}" for s in range(4))}
  FROM probed p CROSS JOIN cents c),
codes AS (
  SELECT vec_id, cell,
         {", ".join(f"(min(struct_pack(d := d{s}, cid := cid))).cid AS code{s}" for s in range(4))}
  FROM pair GROUP BY vec_id, cell),
lut AS (
  SELECT cid,
         {", ".join(_pq_d2("qe", "c.ce", s) + f" AS qd{s}" for s in range(4))}
  FROM cents c CROSS JOIN q),
shortlist AS (
  SELECT vec_id, cell, round(sqrt(l0.qd0 + l1.qd1 + l2.qd2 + l3.qd3), 6) AS approx_dist
  FROM codes
  {" ".join(f"JOIN lut l{s} ON l{s}.cid = codes.code{s}" for s in range(4))}
  ORDER BY approx_dist, vec_id
  LIMIT 50)
SELECT s.vec_id, s.cell, s.approx_dist,
       round({_DUCK_DOT.format(a="v.e", b="qe")}
             / ({_DUCK_NORM.format(a="v.e")} * {_DUCK_NORM.format(a="qe")}), 6) AS cosine
FROM shortlist s JOIN v ON v.vec_id = s.vec_id CROSS JOIN q
ORDER BY cosine DESC, s.vec_id
LIMIT 10
"""


def _knn_edges(spark: SparkSession, sf_dir: str, k: int = 3):
    """Directed k-NN edge list over the scale-adaptive sign-bucket
    blocks (shared by knn_graph_build and hubness_audit): per vector,
    its k highest-cosine same-bucket neighbors. Columns (src, dst,
    cosine, rn)."""
    from pyspark.sql import Window as W

    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    # norm precomputed ONCE per vector as a SCALAR column: the pair
    # score is then one dot fold + one scalar divide — the naive
    # cosine re-folds both norms per PAIR (~2x block-width redundant
    # folds per vector). Values are bit-identical to the naive form
    # (same dot, same na*nb multiply, same divide), so the oracle is
    # unchanged beyond hoisting nrm into the vector CTE.
    v = (
        emb.crossJoin(F.broadcast(_adaptive_b(emb)))
        .select("vec_id", _adaptive_bucket().alias("bucket"), ev.alias("ev"))
        .withColumn("nrm", _norm(F.col("ev")))
    )
    a, b = v.alias("a"), v.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("src"),
        F.col("b.vec_id").alias("dst"),
        F.round(
            _dot(F.col("a.ev"), F.col("b.ev")) / (F.col("a.nrm") * F.col("b.nrm")), 6
        ).alias("cosine"),
    )
    w = W.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst"))
    return cand.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def knn_graph_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph construction over the sign-bucket blocks — the input
    structure for graph-based curation (SemDeDup-style cluster pruning,
    label propagation, NN-descent refinement, graph-ANN serving): each
    vector keeps its k=3 nearest same-bucket neighbors by cosine, and
    the audit marks which edges are RECIPROCAL (mutual k-NN — the
    high-precision subset graph algorithms prefer to trust).

    Scale design: candidate generation is the SCALE-ADAPTIVE sign-
    bucket self-join (b = max(4, ⌈log2(n/64)⌉) planes from the in-plan
    corpus count, blocks stay ~64 wide — pair space ~n·64, never n²);
    top-k per node is a bucket-partitioned window, state O(k) per
    node after the rank filter; reciprocity is one self-join of the
    O(n·k) edge list on the reversed pair key. NN-descent iterations
    (join the edge list to itself to propose neighbor-of-neighbor
    candidates) reuse exactly this shape. Summarized per node for the
    first 20 vec_ids so the graph itself is value-checked.

    Round 12 (optimization): the edge list is localCheckpointed — the
    reciprocity join consumes it under two DIFFERENT keys ((src,dst)
    and the swapped pair), so while AQE reuses the inner candidate
    shuffle, the top-k window still re-ran on the second consumer.
    Interleaved same-session A/B at sf0.1 (4 reps, build+noop): stock
    med 2.39 s vs checkpointed 2.17 s; O(n·k) rows materialized once."""
    edges = _knn_edges(spark, sf_dir, k=3).localCheckpoint()
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("recip"))
    marked = edges.join(rev, ["src", "dst"], "left")
    return (
        marked.groupBy("src")
        .agg(
            F.count("*").cast("bigint").alias("k_found"),
            F.round(F.avg("cosine"), 6).alias("mean_cosine"),
            F.max("cosine").alias("best_cosine"),
            F.sum(F.coalesce(F.col("recip"), F.lit(0))).cast("bigint").alias("n_reciprocal"),
        )
        .where(F.col("src") < 20)
        .select(
            F.col("src").alias("vec_id"), "k_found", "mean_cosine", "best_cosine", "n_reciprocal"
        )
        .orderBy("vec_id")
    )


KNN_GRAPH_SQL = f"""
WITH {_DUCK_ADAPTIVE_BS},
v AS (
  SELECT vec_id, {_DUCK_ADAPTIVE_BUCKET} AS bucket, ev, {_DUCK_NORM.format(a="ev")} AS nrm
  FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings), bs),
cand AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round({_DUCK_DOT.format(a="a.ev", b="b.ev")} / (a.nrm * b.nrm), 6) AS cosine
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
edges AS (
  SELECT src, dst, cosine
  FROM (SELECT src, dst, cosine,
               row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
        FROM cand)
  WHERE rn <= 3),
marked AS (
  SELECT e.src, e.dst, e.cosine, CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS recip
  FROM edges e LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src)
SELECT src AS vec_id, count(*)::BIGINT AS k_found,
       round(avg(cosine), 6) AS mean_cosine, max(cosine) AS best_cosine,
       sum(recip)::BIGINT AS n_reciprocal
FROM marked
WHERE src < 20
GROUP BY src
ORDER BY vec_id
"""


def hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN hubness audit — the high-dimensional pathology metric: in
    high dimensions a few 'hub' vectors appear in everyone's neighbor
    lists (in-degree ≫ k) while 'anti-hubs' appear in none (in-degree
    0), which silently skews dedup verdicts and retrieval diversity.
    Reports the in-degree HISTOGRAM of the k=3 NN graph, including the
    in_degree=0 bin (nodes never chosen as anyone's neighbor), plus
    each bin's share — the curve a curation pipeline watches when the
    embedding model or index geometry changes.

    Scale: in-degree is one count aggregate over the O(n·k) edge list;
    the zero bin is total-minus-appearing via two broadcast scalars.
    No new pair joins beyond the shared _knn_edges build."""
    edges = _knn_edges(spark, sf_dir, k=3)
    emb = load_table(spark, "embeddings", sf_dir)
    indeg = edges.groupBy(F.col("dst").alias("vec_id")).agg(F.count("*").alias("in_degree"))
    hist = indeg.groupBy("in_degree").agg(F.count("*").cast("bigint").alias("n_nodes"))
    totals = emb.agg(F.count("*").alias("n_total"))
    chosen = indeg.agg(F.count("*").alias("n_chosen"))
    zero = (
        totals.crossJoin(F.broadcast(chosen))
        .select(
            F.lit(0).cast("bigint").alias("in_degree"),
            (F.col("n_total") - F.col("n_chosen")).cast("bigint").alias("n_nodes"),
        )
        .where(F.col("n_nodes") > 0)
    )
    full = hist.select(F.col("in_degree").cast("bigint"), "n_nodes").unionByName(zero)
    total_nodes = emb.agg(F.count("*").alias("nt"))
    return (
        full.crossJoin(F.broadcast(total_nodes))
        .select(
            "in_degree",
            "n_nodes",
            F.round(F.col("n_nodes") / F.col("nt"), 6).alias("share"),
        )
        .orderBy("in_degree")
    )


HUBNESS_SQL = f"""
WITH {_DUCK_ADAPTIVE_BS},
v AS (
  SELECT vec_id, {_DUCK_ADAPTIVE_BUCKET} AS bucket, ev, {_DUCK_NORM.format(a="ev")} AS nrm
  FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings), bs),
cand AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round({_DUCK_DOT.format(a="a.ev", b="b.ev")} / (a.nrm * b.nrm), 6) AS cosine
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
edges AS (
  SELECT src, dst
  FROM (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
        FROM cand)
  WHERE rn <= 3),
indeg AS (SELECT dst AS vec_id, count(*) AS in_degree FROM edges GROUP BY dst),
hist AS (SELECT in_degree::BIGINT AS in_degree, count(*)::BIGINT AS n_nodes FROM indeg GROUP BY in_degree),
tot AS (SELECT count(*) AS n_total FROM embeddings),
zero AS (
  SELECT 0::BIGINT AS in_degree, (n_total - (SELECT count(*) FROM indeg))::BIGINT AS n_nodes
  FROM tot
  WHERE n_total > (SELECT count(*) FROM indeg))
SELECT in_degree, n_nodes,
       round(n_nodes / CAST((SELECT n_total FROM tot) AS DOUBLE), 6) AS share
FROM (SELECT * FROM hist UNION ALL SELECT * FROM zero)
ORDER BY in_degree
"""


def ivf_cell_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index maintenance audit: per-cell occupancy of the
    scale-adaptive sign-bucket quantizer vs the uniform target, with a
    split/merge/ok recommendation per cell (split when a cell holds
    >2x the average — probe cost and skew; merge when <0.25x — wasted
    routing entries). This is the rebalancing decision table a 100 TB
    vector index runs nightly: cell id is the partition key, so 'split'
    literally means repartitioning hot partitions (add a plane bit for
    that cell), and the audit is ONE groupBy over the assignment scan
    plus a broadcast of the 1-row average."""
    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    v = emb.crossJoin(F.broadcast(_adaptive_b(emb))).select(
        "vec_id", _adaptive_bucket().alias("bucket")
    )
    cells = v.groupBy("bucket").agg(F.count("*").cast("bigint").alias("n_vectors"))
    avg = cells.agg(F.avg("n_vectors").alias("avg_n"))
    return (
        cells.crossJoin(F.broadcast(avg))
        .select(
            "bucket",
            "n_vectors",
            F.round(F.col("n_vectors") / F.col("avg_n"), 4).alias("ratio_to_avg"),
            F.when(F.col("n_vectors") > 2 * F.col("avg_n"), F.lit("split"))
            .when(F.col("n_vectors") < 0.25 * F.col("avg_n"), F.lit("merge"))
            .otherwise(F.lit("ok"))
            .alias("action"),
        )
        .orderBy("bucket")
    )


IVF_CELL_BALANCE_SQL = f"""
WITH {_DUCK_ADAPTIVE_BS},
v AS (
  SELECT vec_id, {_DUCK_ADAPTIVE_BUCKET} AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings), bs),
cells AS (SELECT bucket, count(*)::BIGINT AS n_vectors FROM v GROUP BY bucket),
a AS (SELECT avg(n_vectors) AS avg_n FROM cells)
SELECT bucket, n_vectors,
       round(n_vectors / avg_n, 4) AS ratio_to_avg,
       CASE WHEN n_vectors > 2 * avg_n THEN 'split'
            WHEN n_vectors < 0.25 * avg_n THEN 'merge'
            ELSE 'ok' END AS action
FROM cells, a
ORDER BY bucket
"""


def label_propagation_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation over the k-NN graph — the
    classic cheap-label-expansion pass (propagate sparse human labels
    to the unlabeled corpus along embedding-similarity edges): seeds
    are the vectors with vec_id % 5 == 0 (simulating 20% labeled
    data), everyone else starts unlabeled; two unrolled supersteps of
    'adopt the majority label among labeled neighbors' (ties broken by
    smaller label — deterministic), labeled nodes never change.

    Scale: each superstep is one equi-join of the O(n·k) undirected
    edge list against the current label table (node-keyed) + one
    (node, label) count aggregate + one per-node argmax window —
    the BSP pattern shared with dedup_connected_components, state
    O(n) per superstep, lineage cut irrelevant at 2 fixed steps.
    Output: per final label, node counts split seeded/propagated,
    plus the still-unlabeled row (label -1)."""
    from pyspark.sql import Window as W

    emb = load_table(spark, "embeddings", sf_dir)
    # round 12 (optimization): the symmetrized edge list is
    # localCheckpointed — it is consumed by both supersteps AND by the
    # final-label lineage each superstep's join chain embeds, and the
    # interleaved same-session A/B at sf0.1 measured the stock plan
    # executing 19 jobs / 46 stages vs 15 / 33 checkpointed, walls
    # 4.0 s vs 1.0 s (3 reps each) — AQE exchange reuse does NOT
    # collapse the repeated k-NN build here because the consumers sit
    # under different join keys. Same policy as textrank / connected
    # components: materialize the loop-invariant graph once.
    edges = _knn_edges(spark, sf_dir, k=3).select("src", "dst")
    und = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 5 == 0, F.col("label").cast("bigint"))
        .otherwise(F.lit(None).cast("bigint"))
        .alias("lbl"),
    )
    cur = nodes
    for _ in range(2):
        votes = (
            und.join(cur.select(F.col("vec_id").alias("dst"), F.col("lbl").alias("nlbl")), "dst")
            .where(F.col("nlbl").isNotNull())
            .groupBy(F.col("src").alias("vec_id"), F.col("nlbl"))
            .agg(F.count("*").alias("n"))
        )
        w = W.partitionBy("vec_id").orderBy(F.col("n").desc(), F.col("nlbl").asc())
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", F.col("nlbl").alias("voted"))
        )
        cur = (
            cur.join(best, "vec_id", "left")
            .select("vec_id", F.coalesce(F.col("lbl"), F.col("voted")).alias("lbl"))
        )
    seeded = F.when(F.col("vec_id") % 5 == 0, 1).otherwise(0)
    return (
        cur.select(F.coalesce(F.col("lbl"), F.lit(-1)).alias("final_label"), seeded.alias("s"))
        .groupBy("final_label")
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.sum("s").cast("bigint").alias("n_seeded"),
            (F.count("*") - F.sum("s")).cast("bigint").alias("n_propagated"),
        )
        .orderBy("final_label")
    )


LABEL_PROP_SQL = f"""
WITH {_DUCK_ADAPTIVE_BS},
v AS (
  SELECT vec_id, {_DUCK_ADAPTIVE_BUCKET} AS bucket, ev, {_DUCK_NORM.format(a="ev")} AS nrm
  FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings), bs),
cand AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round({_DUCK_DOT.format(a="a.ev", b="b.ev")} / (a.nrm * b.nrm), 6) AS cosine
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
knn AS (
  SELECT src, dst
  FROM (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
        FROM cand)
  WHERE rn <= 3),
und AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM knn UNION ALL SELECT dst, src FROM knn)),
n0 AS (
  SELECT vec_id, CASE WHEN vec_id % 5 = 0 THEN label::BIGINT ELSE NULL END AS lbl
  FROM embeddings),
v1 AS (
  SELECT u.src AS vec_id, n.lbl AS nlbl, count(*) AS n
  FROM und u JOIN n0 n ON n.vec_id = u.dst
  WHERE n.lbl IS NOT NULL GROUP BY u.src, n.lbl),
b1 AS (
  SELECT vec_id, nlbl AS voted
  FROM (SELECT vec_id, nlbl, row_number() OVER (PARTITION BY vec_id ORDER BY n DESC, nlbl ASC) AS rn FROM v1)
  WHERE rn = 1),
n1 AS (
  SELECT n0.vec_id, coalesce(n0.lbl, b1.voted) AS lbl
  FROM n0 LEFT JOIN b1 ON b1.vec_id = n0.vec_id),
v2 AS (
  SELECT u.src AS vec_id, n.lbl AS nlbl, count(*) AS n
  FROM und u JOIN n1 n ON n.vec_id = u.dst
  WHERE n.lbl IS NOT NULL GROUP BY u.src, n.lbl),
b2 AS (
  SELECT vec_id, nlbl AS voted
  FROM (SELECT vec_id, nlbl, row_number() OVER (PARTITION BY vec_id ORDER BY n DESC, nlbl ASC) AS rn FROM v2)
  WHERE rn = 1),
n2 AS (
  SELECT n1.vec_id, coalesce(n1.lbl, b2.voted) AS lbl
  FROM n1 LEFT JOIN b2 ON b2.vec_id = n1.vec_id)
SELECT coalesce(lbl, -1) AS final_label,
       count(*)::BIGINT AS n_nodes,
       sum(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_seeded,
       (count(*) - sum(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END))::BIGINT AS n_propagated
FROM n2
GROUP BY coalesce(lbl, -1)
ORDER BY final_label
"""


def quantizer_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-retraining migration plan: when the coarse quantizer is
    retrained (centroid set A = vec_id<8 → set B = vec_id 8..15), how
    many vectors move from which old cell to which new cell? The
    contingency table is the migration cost estimate — off-diagonal
    mass is data that must physically move partitions at reindex time,
    and rows that scatter across many new cells flag centroid drift.

    Scale: two argmin assignments (each a broadcast of 8 centroids +
    a per-vector struct-min aggregate — no window, no shuffle beyond
    the final O(cells²) count), so the audit costs two corpus scans
    regardless of index size. Deterministic tie-breaks keep both
    engines cell-identical."""
    emb = load_table(spark, "embeddings", sf_dir)
    v = emb.select("vec_id", _dbl("embedding").alias("e"))
    sqdist = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )

    def assign(lo: int, hi: int, out: str) -> DataFrame:
        cents = v.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).select(
            F.col("vec_id").alias("cid"), F.col("e").alias("ce")
        )
        return (
            v.crossJoin(F.broadcast(cents))
            .groupBy("vec_id")
            .agg(
                F.min(F.struct(sqdist(F.col("e"), F.col("ce")).alias("d"), F.col("cid").alias("cid")))
                .getField("cid")
                .alias(out)
            )
        )

    a = assign(0, 8, "cell_old")
    b = assign(8, 16, "cell_new")
    total = v.agg(F.count("*").alias("nt"))
    return (
        a.join(b, "vec_id")
        .groupBy("cell_old", "cell_new")
        .agg(F.count("*").cast("bigint").alias("n_vectors"))
        .crossJoin(F.broadcast(total))
        .select(
            "cell_old",
            "cell_new",
            "n_vectors",
            F.round(F.col("n_vectors") / F.col("nt"), 6).alias("share"),
        )
        .orderBy("cell_old", "cell_new")
    )


QUANTIZER_MIGRATION_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
ca AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
cb AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id >= 8 AND vec_id < 16),
a AS (
  SELECT vec_id, (min(struct_pack(d := {_DUCK_SQDIST.format(a="v.e", b="c.ce")}, cid := c.cid))).cid AS cell_old
  FROM v CROSS JOIN ca c GROUP BY vec_id),
b AS (
  SELECT vec_id, (min(struct_pack(d := {_DUCK_SQDIST.format(a="v.e", b="c.ce")}, cid := c.cid))).cid AS cell_new
  FROM v CROSS JOIN cb c GROUP BY vec_id),
tot AS (SELECT count(*) AS nt FROM v)
SELECT cell_old, cell_new, count(*)::BIGINT AS n_vectors,
       round(count(*) / CAST((SELECT nt FROM tot) AS DOUBLE), 6) AS share
FROM a JOIN b USING (vec_id)
GROUP BY cell_old, cell_new
ORDER BY cell_old, cell_new
"""


def hnsw_layer_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW layer assignment (Malkov & Yashunin 2018): each vector
    draws level = floor(-ln(u)·mL) with mL = 1/ln(M), M = 16, from a
    DETERMINISTIC hash-uniform on vec_id — the index-build step that
    decides which nodes appear in the sparse upper navigation layers.
    Output is the per-level census against the geometric law the
    search-complexity guarantees rest on: P(level=l) = p^l(1-p) with
    p = 1/M, plus `decay_ok` pinning that each level is ≤ n/M of the
    one below within noise (3σ binomial slack), and cum_share rising
    to 1 at level 0.

    100 TB: the assignment is one stateless column expression (the
    classic build parallelizes by partitioning on level-0 cells and
    broadcasting the tiny upper layers — here the census is one
    O(levels) hash aggregate); nothing shuffles but the ≤5-row
    result."""
    m = 16.0
    ml = 1.0 / 2.772588722239781  # 1/ln(16)
    v = load_table(spark, "embeddings", sf_dir).select("vec_id")
    h16 = F.conv(
        F.substring(F.md5(F.concat(F.lit("hnsw:"), F.col("vec_id").cast("string"))), 1, 4),
        16,
        10,
    ).cast("bigint")
    u = (h16 + F.lit(0.5)) / F.lit(65536.0)
    lvl = F.floor(-F.log(u) * F.lit(ml)).cast("int")
    from pyspark.sql import Window as W

    tot = v.count()  # O(1) metadata-scale count; census denominators
    levels = v.select(lvl.alias("level")).groupBy("level").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )
    p = 1.0 / m
    expected = F.round(F.lit(float(tot)) * F.pow(F.lit(p), F.col("level")) * F.lit(1 - p), 2)
    win = W.orderBy(F.col("level").desc()).rowsBetween(W.unboundedPreceding, 0)
    return (
        levels.select(
            "level",
            "n_nodes",
            expected.alias("expected_n"),
            F.round(F.sum("n_nodes").over(win) / F.lit(float(tot)), 6).alias("cum_share"),
            (
                F.col("n_nodes")
                <= expected / F.lit(1 - p) + 3.0 * F.sqrt(expected / F.lit(1 - p)) + F.lit(3.0)
            ).alias("decay_ok"),
        )
        .orderBy("level")
    )


HNSW_LAYER_SQL = """
WITH v AS (
  SELECT vec_id,
         (((strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[1]) - 1) * 4096
         + (strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[2]) - 1) * 256
         + (strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[3]) - 1) * 16
         + (strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[4]) - 1)) + 0.5)
         / 65536.0 AS u
  FROM embeddings),
lv AS (
  SELECT CAST(floor(-ln(u) / ln(16)) AS INT) AS level FROM v),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM lv),
census AS (
  SELECT level, count(*)::BIGINT AS n_nodes FROM lv GROUP BY level)
SELECT level, n_nodes,
       round(nt * power(1.0/16, level) * (15.0/16), 2) AS expected_n,
       round(sum(n_nodes) OVER (ORDER BY level DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / nt, 6) AS cum_share,
       n_nodes <= nt * power(1.0/16, level) * (15.0/16) / (15.0/16)
                  + 3.0 * sqrt(nt * power(1.0/16, level)) + 3.0 AS decay_ok
FROM census CROSS JOIN tot
ORDER BY level
"""


def hnsw_two_layer_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-layer coarse-to-fine search over the hash-leveled hierarchy
    hnsw_layer_assign builds — the HNSW navigation pattern: greedy
    entry through the sparse upper layer (level ≥ 1, ~n/16 nodes),
    then exact cosine top-10 restricted to the ef=16 production beam
    chosen by hnsw_ef_sweep: the query's cell widened by its full
    hamming-1 AND hamming-2 shells plus the entry node's cell and its
    hamming-1 shell (the 'edges' of the navigation graph — the
    sweep's prefix-16 probe set). Deterministic ties
    (distance, vec_id), so the oracle replays it value-for-value; the
    recall gate vs ann_brute_force lives in the unit tests.

    100 TB: the upper layer is a FILTERED SCAN (level ≥ 1 prunes 15/16
    of rows — with level as a partition column it is partition
    pruning) reduced by one TakeOrdered(1); the fine stage probes ≤10
    of 16 bucket-partitions (entry + query cells and their hamming-1
    shells). Nothing broadcasts but the query vector and the ≤10-row
    probe list."""
    from pyspark.sql import Window as W  # noqa: F401  (symmetry with siblings)

    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    h16 = F.conv(
        F.substring(F.md5(F.concat(F.lit("hnsw:"), F.col("vec_id").cast("string"))), 1, 4),
        16,
        10,
    ).cast("bigint")
    u = (h16 + F.lit(0.5)) / F.lit(65536.0)
    level = F.floor(-F.log(u) / F.lit(2.772588722239781)).cast("int")
    bucket = sum(
        (F.when(F.element_at(ev, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))) for i in range(4)
    ).cast("bigint")
    v = emb.select(
        "vec_id", "label", ev.alias("ev"), level.alias("level"), bucket.alias("bucket")
    )
    q = v.where(F.col("vec_id") == 0).select(
        F.col("ev").alias("qv"), F.col("bucket").alias("q_bucket")
    )
    sqdist = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )
    entry = (
        v.where((F.col("level") >= 1) & (F.col("vec_id") != 0))
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("entry_vec_id"),
            F.col("bucket").alias("entry_bucket"),
            sqdist(F.col("ev"), F.col("qv")).alias("dq"),
        )
        .orderBy("dq", "entry_vec_id")
        .limit(1)
        .select("entry_vec_id", "entry_bucket")
    )
    from hematite_spark.functions import cosine

    return (
        v.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(entry))
        .crossJoin(F.broadcast(q))
        .where(
            # ef=16 beam: hamming ≤ 2 of the query cell, hamming ≤ 1
            # of the entry cell (hnsw_ef_sweep's prefix-16 probe set)
            (F.bit_count(F.col("bucket").bitwiseXOR(F.col("q_bucket"))) <= 2)
            | (F.bit_count(F.col("bucket").bitwiseXOR(F.col("entry_bucket"))) <= 1)
        )
        .select(
            "vec_id",
            "label",
            "bucket",
            "entry_vec_id",
            F.round(cosine(F.col("ev"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


HNSW_SEARCH_SQL = f"""
WITH v0 AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS ev,
         CAST(floor(-ln((((strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[1]) - 1) * 4096
                        + (strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[2]) - 1) * 256
                        + (strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[3]) - 1) * 16
                        + (strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[4]) - 1)) + 0.5)
                       / 65536.0) / ln(16)) AS INT) AS level,
         CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings),
q AS (SELECT ev AS qv, bucket AS q_bucket FROM v0 WHERE vec_id = 0),
entry AS (
  SELECT vec_id AS entry_vec_id, bucket AS entry_bucket
  FROM v0 CROSS JOIN q
  WHERE level >= 1 AND vec_id <> 0
  ORDER BY {_DUCK_SQDIST.format(a="ev", b="qv")}, vec_id
  LIMIT 1)
SELECT vec_id, label, bucket, entry_vec_id,
       round(list_reduce(list_transform(list_zip(ev, qv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x) / (sqrt(list_reduce(list_transform(ev, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) * sqrt(list_reduce(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))), 6) AS cosine
FROM v0 CROSS JOIN entry CROSS JOIN q
WHERE vec_id <> 0 AND (bit_count(xor(bucket, q_bucket)) <= 2
       OR bit_count(xor(bucket, entry_bucket)) <= 1)
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def hnsw_ef_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ef/beam-width sweep for the two-layer HNSW-style search — the
    quality-vs-cost curve that picks the production ef (analogous to
    ann_recall_curve for IVF probe counts): candidate cells are
    ordered into a deterministic probe list — query cell, entry cell,
    their hamming-1 shells, then the query cell's hamming-2/3/4
    shells (21 entries, first-occurrence wins, covering all 16 cells
    by ef=21) — and each ef ∈ {1, 2, 6, 10, 16, 21} scores exact
    cosine top-10 within the first ef cells only. Output per ef:
    candidate count, cells actually probed, and recall@10 vs the
    exact brute-force top-10 — monotone in ef by construction (prefix
    sets nest), reaching 1.0 at ef=21 where the beam saturates the
    toy 4-bit navigation space. ef=16 (the query hamming-2 ball plus
    the entry hamming-1 ball — the prefix-16 probe set) is exactly
    hnsw_two_layer_search's production candidate set; the pytest gate
    pins recall ≥ 0.8 at ef=16.

    100 TB: one corpus scan computes each vector's first-probe index
    (array_position against the broadcast 21-entry probe list); the sweep
    explodes each candidate into the efs that include it (≤4×) and
    ranks per ef — partition count equals the 4 ef values, so at real
    scale each ef's top-10 is a TakeOrdered, not a global sort; the
    brute-force baseline is the same scan ranked without the cell
    filter."""
    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    h16 = F.conv(
        F.substring(F.md5(F.concat(F.lit("hnsw:"), F.col("vec_id").cast("string"))), 1, 4),
        16,
        10,
    ).cast("bigint")
    u = (h16 + F.lit(0.5)) / F.lit(65536.0)
    level = F.floor(-F.log(u) / F.lit(2.772588722239781)).cast("int")
    bucket = sum(
        (F.when(F.element_at(ev, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))) for i in range(4)
    ).cast("bigint")
    v = emb.select(
        "vec_id", ev.alias("ev"), level.alias("level"), bucket.alias("bucket")
    )
    q = v.where(F.col("vec_id") == 0).select(
        F.col("ev").alias("qv"), F.col("bucket").alias("q_bucket")
    )
    sqdist = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )
    entry = (
        v.where((F.col("level") >= 1) & (F.col("vec_id") != 0))
        .crossJoin(F.broadcast(q))
        .select(
            F.col("bucket").alias("entry_bucket"),
            sqdist(F.col("ev"), F.col("qv")).alias("dq"),
            "vec_id",
        )
        .orderBy("dq", "vec_id")
        .limit(1)
        .select("entry_bucket")
    )
    from hematite_spark.functions import cosine
    from pyspark.sql import Window as W

    qb, eb = F.col("q_bucket"), F.col("entry_bucket")
    probes = F.array(
        qb, eb,
        qb.bitwiseXOR(1), qb.bitwiseXOR(2), qb.bitwiseXOR(4), qb.bitwiseXOR(8),
        eb.bitwiseXOR(1), eb.bitwiseXOR(2), eb.bitwiseXOR(4), eb.bitwiseXOR(8),
        qb.bitwiseXOR(3), qb.bitwiseXOR(5), qb.bitwiseXOR(6),
        qb.bitwiseXOR(9), qb.bitwiseXOR(10), qb.bitwiseXOR(12),
        qb.bitwiseXOR(7), qb.bitwiseXOR(11), qb.bitwiseXOR(13), qb.bitwiseXOR(14),
        qb.bitwiseXOR(15),
    )
    scored = (
        v.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(entry))
        .select(
            "vec_id",
            "bucket",
            F.array_position(probes, F.col("bucket")).alias("probe_idx"),
            F.round(cosine(F.col("ev"), F.col("qv")), 6).alias("cosine"),
        )
        .localCheckpoint()  # one scan feeds the sweep AND the baseline
    )
    brute10 = (
        scored.orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id")
    )
    efs = [1, 2, 6, 10, 16, 21]
    cand = scored.where(F.col("probe_idx") >= 1).select(
        "vec_id",
        "bucket",
        "cosine",
        F.explode(
            F.filter(
                F.array(*[F.lit(e) for e in efs]), lambda e: e >= F.col("probe_idx")
            )
        ).alias("ef"),
    )
    wr = W.partitionBy("ef").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    top = cand.withColumn("r", F.row_number().over(wr)).where(F.col("r") <= 10)
    return (
        cand.groupBy("ef")
        .agg(
            F.count("*").cast("bigint").alias("n_candidates"),
            F.countDistinct("bucket").cast("bigint").alias("cells_probed"),
        )
        .join(
            top.join(brute10, "vec_id", "left_semi")
            .groupBy("ef")
            .agg(F.count("*").alias("n_hit")),
            "ef",
            "left",
        )
        .select(
            "ef",
            "n_candidates",
            "cells_probed",
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / 10.0, 6).alias("recall_at_10"),
        )
        .orderBy("ef")
    )


HNSW_EF_SWEEP_SQL = f"""
WITH v0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev,
         CAST(floor(-ln((((strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[1]) - 1) * 4096
                        + (strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[2]) - 1) * 256
                        + (strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[3]) - 1) * 16
                        + (strpos('0123456789abcdef', md5('hnsw:' || CAST(vec_id AS VARCHAR))[4]) - 1)) + 0.5)
                       / 65536.0) / ln(16)) AS INT) AS level,
         CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings),
q AS (SELECT ev AS qv, bucket AS q_bucket FROM v0 WHERE vec_id = 0),
entry AS (
  SELECT bucket AS entry_bucket
  FROM v0 CROSS JOIN q
  WHERE level >= 1 AND vec_id <> 0
  ORDER BY {_DUCK_SQDIST.format(a="ev", b="qv")}, vec_id
  LIMIT 1),
scored AS (
  SELECT vec_id, bucket,
         list_position([q_bucket, entry_bucket,
                        xor(q_bucket, 1), xor(q_bucket, 2), xor(q_bucket, 4), xor(q_bucket, 8),
                        xor(entry_bucket, 1), xor(entry_bucket, 2), xor(entry_bucket, 4), xor(entry_bucket, 8),
                        xor(q_bucket, 3), xor(q_bucket, 5), xor(q_bucket, 6),
                        xor(q_bucket, 9), xor(q_bucket, 10), xor(q_bucket, 12),
                        xor(q_bucket, 7), xor(q_bucket, 11), xor(q_bucket, 13), xor(q_bucket, 14),
                        xor(q_bucket, 15)],
                       bucket) AS probe_idx,
         round(list_reduce(list_transform(list_zip(ev, qv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)
               / (sqrt(list_reduce(list_transform(ev, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))
                * sqrt(list_reduce(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))), 6) AS cosine
  FROM v0 CROSS JOIN q CROSS JOIN entry
  WHERE vec_id <> 0),
brute10 AS (
  SELECT vec_id FROM scored ORDER BY cosine DESC, vec_id LIMIT 10),
cand AS (
  SELECT s.vec_id, s.bucket, s.cosine, e.ef
  FROM scored s JOIN (VALUES (1), (2), (6), (10), (16), (21)) AS e(ef)
    ON s.probe_idx IS NOT NULL AND s.probe_idx >= 1 AND e.ef >= s.probe_idx),
top AS (
  SELECT ef, vec_id
  FROM (SELECT ef, vec_id,
               row_number() OVER (PARTITION BY ef ORDER BY cosine DESC, vec_id) AS r
        FROM cand)
  WHERE r <= 10),
hits AS (
  SELECT ef, count(*) AS n_hit
  FROM top WHERE vec_id IN (SELECT vec_id FROM brute10)
  GROUP BY ef)
SELECT c.ef, count(*)::BIGINT AS n_candidates,
       count(DISTINCT c.bucket)::BIGINT AS cells_probed,
       round(coalesce(max(h.n_hit), 0) / 10.0, 6) AS recall_at_10
FROM cand c LEFT JOIN hits h ON c.ef = h.ef
GROUP BY c.ef
ORDER BY c.ef
"""


def kcenter_coreset_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point traversal) coreset seeding —
    the diversity-first subset selection used to seed clusterings and
    to pick maximally-covering exemplars for data curation: start from
    vec_id 0, then 3× add the vector FARTHEST from the current seed
    set (2-approximation of the k-center optimum). Output is the
    per-seed coverage report: cell population, cell radius (max
    min-distance of members), and mean min-distance — the 'how well do
    4 exemplars cover the corpus' table.

    100 TB: each traversal step is one corpus scan against a ≤k-row
    BROADCAST seed set reduced by TakeOrdered(1) — the chain is lazy
    (agg → broadcast → agg), no driver round-trip, k scans total; the
    final assignment reuses the same broadcast. Ties deterministic on
    (distance desc, vec_id), so the oracle unrolls the recursion as
    CTEs value-for-value.

    Round 12 (optimization): the seed set travels as ONE array row —
    each step appends the TakeOrdered(1) winner with array_append —
    and both the per-step min-distance and the final assignment are
    per-row expressions over that broadcast array. The old shape paid,
    PER STEP, a full (vec_id)-grouped aggregate shuffle plus a full
    corpus self-join back to fetch the winner's vector, and a final
    n×k row_number window exchange for the assignment; min over
    doubles / struct-min (d, seed_id) are order-identical to the old
    groupBy-min / window tie-break, so the output is byte-identical
    (oracle re-verified). Plan: 3 shuffle-free TakeOrdered scans + one
    aggregate (plans/r12/kcenter_coreset_seed_*.txt)."""
    emb = load_table(spark, "embeddings", sf_dir)
    v = emb.select("vec_id", _dbl("embedding").alias("ev"))
    mind = (
        "array_min(transform(sarr, s -> aggregate(zip_with(ev, s.sv,"
        " (x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)))"
    )
    seeds = v.where(F.col("vec_id") == 0).agg(
        F.expr("collect_list(struct(vec_id AS seed_id, ev AS sv))").alias("sarr")
    )
    for _ in range(3):
        seeds = (
            v.crossJoin(F.broadcast(seeds))
            .select("vec_id", "ev", "sarr", F.expr(mind).alias("mind"))
            .orderBy(F.col("mind").desc(), F.col("vec_id"))
            .limit(1)
            .select(F.expr("array_append(sarr, struct(vec_id AS seed_id, ev AS sv))").alias("sarr"))
        )
    assigned = (
        v.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            F.expr(
                "array_min(transform(sarr, s -> named_struct("
                "'d', aggregate(zip_with(ev, s.sv, (x, y) -> (x - y) * (x - y)),"
                " 0.0D, (acc, x) -> acc + x),"
                " 'seed_id', s.seed_id)))"
            ).alias("b"),
        )
        .select("vec_id", F.col("b.seed_id").alias("seed_id"), F.col("b.d").alias("d"))
    )
    return (
        assigned.groupBy("seed_id")
        .agg(
            F.count("*").cast("bigint").alias("n_assigned"),
            F.round(F.sqrt(F.max("d")), 6).alias("cell_radius"),
            F.round(F.avg(F.sqrt(F.col("d"))), 6).alias("mean_dist"),
        )
        .orderBy("seed_id")
    )


_KC_D = _DUCK_SQDIST.format(a="ev", b="sv")

KCENTER_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
s0 AS (SELECT vec_id AS seed_id, ev AS sv FROM v WHERE vec_id = 0),
n1 AS (
  SELECT v.vec_id AS seed_id, v.ev AS sv
  FROM v JOIN (SELECT vec_id, min({_KC_D}) AS mind
               FROM v CROSS JOIN s0 GROUP BY vec_id) m USING (vec_id)
  ORDER BY m.mind DESC, v.vec_id LIMIT 1),
s1 AS (SELECT * FROM s0 UNION ALL SELECT * FROM n1),
n2 AS (
  SELECT v.vec_id AS seed_id, v.ev AS sv
  FROM v JOIN (SELECT v.vec_id, min({_KC_D}) AS mind
               FROM v CROSS JOIN s1 GROUP BY v.vec_id) m USING (vec_id)
  ORDER BY m.mind DESC, v.vec_id LIMIT 1),
s2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM n2),
n3 AS (
  SELECT v.vec_id AS seed_id, v.ev AS sv
  FROM v JOIN (SELECT v.vec_id, min({_KC_D}) AS mind
               FROM v CROSS JOIN s2 GROUP BY v.vec_id) m USING (vec_id)
  ORDER BY m.mind DESC, v.vec_id LIMIT 1),
s3 AS (SELECT * FROM s2 UNION ALL SELECT * FROM n3),
assigned AS (
  SELECT vec_id, seed_id, d
  FROM (SELECT v.vec_id, s.seed_id, {_KC_D} AS d,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY {_KC_D}, s.seed_id) AS rn
        FROM v CROSS JOIN s3 s)
  WHERE rn = 1)
SELECT seed_id, count(*)::BIGINT AS n_assigned,
       round(sqrt(max(d)), 6) AS cell_radius,
       round(avg(sqrt(d)), 6) AS mean_dist
FROM assigned
GROUP BY seed_id
ORDER BY seed_id
"""


def retrieval_ndcg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 audit of the approximate retrieval stack — the graded
    metric recall@k can't see: how well does each ANN variant ORDER
    what it returns? Relevance = exact cosine of the brute-force
    top-10 (graded, not binary); each variant's returned list is
    scored by DCG with the log2 position discount against the ideal
    ordering. One row per variant (ivf, multiprobe, hnsw) with its
    overlap count and NDCG — the index-tuning table that separates
    'finds the right vectors' from 'ranks them right'.

    100 TB: every variant's result is already a ≤10-row TakeOrdered
    head; the audit joins and scores O(k) rows — cost lives in the
    searches themselves, shared via one pass each.

    Round 12 (optimization): the exact top-10 is localCheckpointed —
    the subtree is consumed four times downstream (the ideal-ordering
    broadcast and three hit joins) and a TakeOrdered head has no
    exchange for AQE to reuse, so without the cut the brute-force
    scan re-ran per consumer. Interleaved same-session A/B at sf0.1
    (4 reps, build+noop): stock med 2.38 s vs checkpointed 2.14 s —
    one 10-row materialization replaces the redundant scans, and the
    gap widens with corpus size (the scan is the O(n) term)."""
    from pyspark.sql import Window as W

    exact = (
        ann_brute_force(spark, sf_dir)
        .select("vec_id", F.col("cosine").alias("rel"))
        .localCheckpoint()
    )
    ideal = exact.select(
        "vec_id",
        "rel",
        F.row_number().over(W.orderBy(F.col("rel").desc(), F.col("vec_id"))).alias("ipos"),
    )
    idcg_row = ideal.agg(
        F.sum(F.col("rel") / F.log2(F.col("ipos") + 1.0)).alias("idcg")
    )

    def score(name, df):
        ranked = df.select(
            "vec_id",
            F.row_number()
            .over(W.orderBy(F.col("cosine").desc(), F.col("vec_id")))
            .alias("pos"),
        )
        hits = ranked.join(exact, "vec_id")
        return (
            hits.agg(
                F.count("*").cast("bigint").alias("overlap"),
                F.sum(F.col("rel") / F.log2(F.col("pos") + 1.0)).alias("dcg"),
            )
            .crossJoin(F.broadcast(idcg_row))
            .select(
                F.lit(name).alias("variant"),
                "overlap",
                F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
            )
        )

    out = (
        score("ivf", ann_ivf_search(spark, sf_dir))
        .unionByName(score("multiprobe", ann_ivf_multiprobe(spark, sf_dir)))
        .unionByName(score("hnsw", hnsw_two_layer_search(spark, sf_dir)))
    )
    return out.orderBy("variant")


NDCG_AUDIT_SQL = f"""
WITH exact AS (
  SELECT vec_id, cosine AS rel FROM ({ANN_BRUTE_SQL})),
ideal AS (
  SELECT vec_id, rel,
         row_number() OVER (ORDER BY rel DESC, vec_id) AS ipos
  FROM exact),
idcg AS (SELECT sum(rel / log2(ipos + 1.0)) AS idcg FROM ideal),
ivf AS (
  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS pos
  FROM ({ANN_IVF_SEARCH_SQL})),
mp AS (
  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS pos
  FROM ({ANN_IVF_MULTIPROBE_SQL})),
hn AS (
  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS pos
  FROM ({HNSW_SEARCH_SQL})),
scored AS (
  SELECT 'ivf' AS variant, count(*)::BIGINT AS overlap,
         round(sum(e.rel / log2(v.pos + 1.0)) / (SELECT idcg FROM idcg), 6) AS ndcg_at_10
  FROM ivf v JOIN exact e USING (vec_id)
  UNION ALL
  SELECT 'multiprobe', count(*)::BIGINT,
         round(sum(e.rel / log2(v.pos + 1.0)) / (SELECT idcg FROM idcg), 6)
  FROM mp v JOIN exact e USING (vec_id)
  UNION ALL
  SELECT 'hnsw', count(*)::BIGINT,
         round(sum(e.rel / log2(v.pos + 1.0)) / (SELECT idcg FROM idcg), 6)
  FROM hn v JOIN exact e USING (vec_id))
SELECT variant, overlap, ndcg_at_10 FROM scored ORDER BY variant
"""


def vptree_partition_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vantage-point (metric) tree partitioning audit — the third ANN
    indexing paradigm beside hashing (LSH/sign buckets) and learned
    cells (IVF): pick a pivot (vec_id 0), split the corpus at the
    median pivot-distance, then split each half again by its own
    sub-pivot (min vec_id in the half) — 4 metric cells from 2
    levels. The audit reports per-cell population, radius spread,
    and the balance ratio (max/min cell size ≈ 1 when medians split
    cleanly) — the health check before committing to a metric-tree
    layout.

    100 TB: each level is one distance projection against a broadcast
    pivot + a median (approx_percentile at scale) broadcast back; no
    pair joins anywhere — the tree build is O(levels) corpus scans."""
    from pyspark.sql import Window as W  # noqa: F401

    emb = load_table(spark, "embeddings", sf_dir)
    v = emb.select("vec_id", _dbl("embedding").alias("ev")).localCheckpoint()
    sqd = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )
    pivot0 = v.where(F.col("vec_id") == 0).select(F.col("ev").alias("pv"))
    d0 = v.crossJoin(F.broadcast(pivot0)).select(
        "vec_id", "ev", F.sqrt(sqd(F.col("ev"), F.col("pv"))).alias("d0")
    )
    med0 = d0.agg(F.percentile("d0", F.lit(0.5)).alias("m0"))
    lvl1 = d0.crossJoin(F.broadcast(med0)).select(
        "vec_id", "ev", "d0", (F.col("d0") <= F.col("m0")).cast("int").alias("side0")
    ).localCheckpoint()
    subp = lvl1.groupBy("side0").agg(F.min("vec_id").alias("pid")).select(
        F.col("side0").alias("p_side"), "pid"
    )
    sub_vecs = (
        lvl1.select(F.col("vec_id").alias("pvid"), F.col("ev").alias("spv"))
        .join(subp, F.col("pvid") == F.col("pid"))
        .select("p_side", "spv")
    )
    d1 = lvl1.join(F.broadcast(sub_vecs), lvl1.side0 == sub_vecs.p_side).select(
        "vec_id", "side0", "d0", F.sqrt(sqd(F.col("ev"), F.col("spv"))).alias("d1")
    )
    med1 = d1.groupBy("side0").agg(F.percentile("d1", F.lit(0.5)).alias("m1"))
    cells = d1.join(F.broadcast(med1), "side0").select(
        "vec_id",
        "d0",
        "d1",
        (F.col("side0") * 2 + (F.col("d1") <= F.col("m1")).cast("int")).alias("cell"),
    )
    per_cell = cells.groupBy("cell").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.round(F.min("d1"), 6).alias("min_d"),
        F.round(F.max("d1"), 6).alias("max_d"),
    )
    balance = per_cell.agg(
        F.round(F.max("n_vectors") / F.min("n_vectors"), 4).alias("balance_ratio")
    )
    return (
        per_cell.crossJoin(F.broadcast(balance))
        .select("cell", "n_vectors", "min_d", "max_d", "balance_ratio")
        .orderBy("cell")
    )


_VP_SQD = _DUCK_SQDIST

VPTREE_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
pivot0 AS (SELECT ev AS pv FROM v WHERE vec_id = 0),
d0 AS (
  SELECT vec_id, ev, sqrt({_VP_SQD.format(a="ev", b="pv")}) AS d0
  FROM v CROSS JOIN pivot0),
med0 AS (SELECT quantile_cont(d0, 0.5) AS m0 FROM d0),
lvl1 AS (
  SELECT vec_id, ev, d0, CASE WHEN d0 <= m0 THEN 1 ELSE 0 END AS side0
  FROM d0 CROSS JOIN med0),
subp AS (SELECT side0, min(vec_id) AS pid FROM lvl1 GROUP BY side0),
sub_vecs AS (
  SELECT s.side0 AS p_side, l.ev AS spv
  FROM lvl1 l JOIN subp s ON l.vec_id = s.pid),
d1 AS (
  SELECT l.vec_id, l.side0, l.d0, sqrt({_VP_SQD.format(a="l.ev", b="sv.spv")}) AS d1
  FROM lvl1 l JOIN sub_vecs sv ON l.side0 = sv.p_side),
med1 AS (SELECT side0, quantile_cont(d1, 0.5) AS m1 FROM d1 GROUP BY side0),
cells AS (
  SELECT d.vec_id, d.side0 * 2 + CASE WHEN d.d1 <= m.m1 THEN 1 ELSE 0 END AS cell, d.d1
  FROM d1 d JOIN med1 m USING (side0)),
per_cell AS (
  SELECT cell, count(*)::BIGINT AS n_vectors,
         round(min(d1), 6) AS min_d, round(max(d1), 6) AS max_d
  FROM cells GROUP BY cell),
balance AS (
  SELECT round(max(n_vectors) / CAST(min(n_vectors) AS DOUBLE), 4) AS balance_ratio
  FROM per_cell)
SELECT cell, n_vectors, min_d, max_d, balance_ratio
FROM per_cell CROSS JOIN balance
ORDER BY cell
"""


def auc_roc_label_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of each of the first three RAW embedding dimensions as
    a one-feature classifier for its same-indexed label — the linear-
    probe screening that checks whether single coordinates already
    carry class signal (a cheap representation-quality audit before
    training a real probe). AUC is computed by the rank formula
    AUC = (R_pos − n_pos(n_pos+1)/2)/(n_pos·n_neg) with average ranks
    from score-VALUE groups (the ks_two_sample/mann_whitney bounded-
    ECDF trick), so there is never a per-row global sort: each probe
    is its own window partition.

    100 TB: the 3-probe union is probe-partitioned; ranks walk
    distinct score values; the AUC itself is a 1-row aggregate per
    probe."""
    from pyspark.sql import Window as W

    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    probes = None
    for k in (0, 1, 2):
        p = emb.select(
            F.lit(k).alias("probe"),
            F.element_at(ev, k + 1).alias("score"),
            (F.col("label") == k).cast("int").alias("is_pos"),
        )
        probes = p if probes is None else probes.unionByName(p)
    g = probes.groupBy("probe", "score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("is_pos").alias("cnt_pos")
    )
    wv = (
        W.partitionBy("probe")
        .orderBy("score")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = g.select(
        "probe",
        "cnt",
        "cnt_pos",
        (F.sum("cnt").over(wv) - F.col("cnt") + (F.col("cnt") + 1) / 2.0).alias("avg_rank"),
    )
    res = ranked.groupBy("probe").agg(
        F.sum(F.col("cnt_pos") * F.col("avg_rank")).alias("r_pos"),
        F.sum("cnt_pos").cast("double").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("cnt_pos")).cast("double").alias("n_neg"),
    )
    auc = (F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0) / (
        F.col("n_pos") * F.col("n_neg")
    )
    return res.select(
        "probe",
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        (F.abs(auc - 0.5) > 0.05).alias("informative"),
    ).orderBy("probe")


AUC_LABEL_PROBE_SQL = """
WITH probes AS (
  SELECT k AS probe, CAST(embedding[k + 1] AS DOUBLE) AS score,
         CASE WHEN label = k THEN 1 ELSE 0 END AS is_pos
  FROM embeddings CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)),
g AS (
  SELECT probe, score, count(*) AS cnt, sum(is_pos) AS cnt_pos
  FROM probes GROUP BY probe, score),
ranked AS (
  SELECT probe, cnt, cnt_pos,
         sum(cnt) OVER (PARTITION BY probe ORDER BY score
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt + (cnt + 1) / 2.0 AS avg_rank
  FROM g),
res AS (
  SELECT probe,
         sum(cnt_pos * avg_rank) AS r_pos,
         CAST(sum(cnt_pos) AS DOUBLE) AS n_pos,
         CAST(sum(cnt - cnt_pos) AS DOUBLE) AS n_neg
  FROM ranked GROUP BY probe)
SELECT probe,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       round((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6) AS auc,
       abs((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg) - 0.5) > 0.05
         AS informative
FROM res
ORDER BY probe
"""


def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid geometry audit: each label's centroid
    vector vs the global centroid — cosine alignment and L2 offset —
    the drift/collapse check for embedding spaces (labels whose
    centroid hugs the global mean carry no linear signal; a label far
    off-axis flags covariate shift between labeled slices).

    100 TB: posexplode → (label, dim) mean is one partial-aggregated
    shuffle of (label, dim, sum, cnt); the global centroid derives
    from the same aggregate regrouped (no second corpus pass); the
    cosine/offset math happens on label-count×dim rows — broadcast
    scale."""
    emb = load_table(spark, "embeddings", sf_dir)
    dims = emb.select(
        "label", F.posexplode(_dbl("embedding")).alias("dim", "v")
    )
    per_label = dims.groupBy("label", "dim").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    )
    glob = per_label.groupBy("dim").agg(
        (F.sum("s") / F.sum("c")).alias("gmean")
    )
    j = per_label.select(
        "label", "dim", (F.col("s") / F.col("c")).alias("lmean")
    ).join(F.broadcast(glob), "dim")
    return (
        j.groupBy("label")
        .agg(
            F.round(
                F.sum(F.col("lmean") * F.col("gmean"))
                / (
                    F.sqrt(F.sum(F.col("lmean") * F.col("lmean")))
                    * F.sqrt(F.sum(F.col("gmean") * F.col("gmean")))
                ),
                6,
            ).alias("cos_to_global"),
            F.round(
                F.sqrt(
                    F.sum(
                        (F.col("lmean") - F.col("gmean"))
                        * (F.col("lmean") - F.col("gmean"))
                    )
                ),
                6,
            ).alias("l2_offset"),
        )
        .orderBy("label")
    )


CENTROID_DRIFT_SQL = """
WITH dims AS (
  SELECT label, d.i - 1 AS dim, CAST(d.v AS DOUBLE) AS v
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS i) d),
per_label AS (
  SELECT label, dim, sum(v) AS s, count(*) AS c FROM dims GROUP BY label, dim),
gcent AS (
  SELECT dim, sum(s) / sum(c) AS gmean FROM per_label GROUP BY dim),
j AS (
  SELECT p.label, p.dim, p.s / p.c AS lmean, g.gmean
  FROM per_label p JOIN gcent g USING (dim))
SELECT label,
       round(sum(lmean * gmean)
             / (sqrt(sum(lmean * lmean)) * sqrt(sum(gmean * gmean))), 6)
         AS cos_to_global,
       round(sqrt(sum((lmean - gmean) * (lmean - gmean))), 6) AS l2_offset
FROM j
GROUP BY label
ORDER BY label
"""


def embedding_clip_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile clip calibration for int8 quantization — the step
    before embedding_quantize's symmetric scale: per dimension, the
    exact 1%/99% quantiles of the component distribution and the
    fraction of mass that clipping at those bounds would saturate.
    Dimensions whose tails are much wider than their quantile range
    (high clip fraction) need per-dim scales; tight dims can share
    one. Reported for the first 8 dimensions.

    100 TB: posexplode → per-dim exact percentile aggregate (at real
    scale the documented swap is approx_percentile — same plan
    shape); the clipped-fraction pass reuses the same exploded rows
    via a broadcast of the 8-row bounds table."""
    emb = load_table(spark, "embeddings", sf_dir)
    dims = emb.select(F.posexplode(_dbl("embedding")).alias("dim", "v")).where(
        F.col("dim") < 8
    )
    bounds = dims.groupBy("dim").agg(
        F.expr("percentile(v, 0.01)").alias("lo"),
        F.expr("percentile(v, 0.99)").alias("hi"),
    )
    j = dims.join(F.broadcast(bounds), "dim")
    return (
        j.groupBy(F.col("dim").cast("bigint").alias("dim"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.max("lo"), 6).alias("clip_lo"),
            F.round(F.max("hi"), 6).alias("clip_hi"),
            F.round(
                F.avg(((F.col("v") < F.col("lo")) | (F.col("v") > F.col("hi"))).cast("double")),
                6,
            ).alias("clip_fraction"),
        )
        .orderBy("dim")
    )


CLIP_CALIBRATION_SQL = """
WITH dims AS (
  SELECT d.i - 1 AS dim, CAST(d.v AS DOUBLE) AS v
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS i) d
  WHERE d.i - 1 < 8),
bounds AS (
  SELECT dim, quantile_cont(v, 0.01) AS lo, quantile_cont(v, 0.99) AS hi
  FROM dims GROUP BY dim)
SELECT dims.dim,
       CAST(count(*) AS BIGINT) AS n,
       round(max(lo), 6) AS clip_lo,
       round(max(hi), 6) AS clip_hi,
       round(avg(CASE WHEN v < lo OR v > hi THEN 1.0 ELSE 0.0 END), 6)
         AS clip_fraction
FROM dims JOIN bounds USING (dim)
GROUP BY dims.dim
ORDER BY dims.dim
"""


def dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked DBSCAN core-point census on the first two
    embedding dimensions: eps = 0.15, minPts = 5; each point lands in
    an eps-sized grid cell and neighbor candidates come ONLY from the
    3×3 surrounding cells (the geo_grid_neighbor_join blocking, so
    the pair space is density-bounded, never O(n²)); a point is core
    iff ≥ minPts neighbors sit within eps. Emits the per-label core/
    border/noise census — the density profile that picks DBSCAN
    parameters before a full clustering run.

    100 TB: cell id is the partition key; the 9-cell candidate join
    is an equi-join on cell; distances only on candidates."""
    emb = load_table(spark, "embeddings", sf_dir)
    eps, min_pts = 0.15, 5
    ev = _dbl("embedding")
    pts = emb.select(
        "vec_id",
        "label",
        F.element_at(ev, 1).alias("x"),
        F.element_at(ev, 2).alias("y"),
    )
    pts = pts.withColumn("cx", F.floor(F.col("x") / eps).cast("int")).withColumn(
        "cy", F.floor(F.col("y") / eps).cast("int")
    )
    probe = pts.select(
        F.col("vec_id").alias("qid"), F.col("x").alias("qx"), F.col("y").alias("qy"),
        F.explode(
            F.array(*[F.struct((F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy"))
                      for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
        ).alias("c"),
    ).select("qid", "qx", "qy", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    cand = probe.join(pts.select("vec_id", "x", "y", "cx", "cy"), ["cx", "cy"])
    d2 = (F.col("qx") - F.col("x")) * (F.col("qx") - F.col("x")) + (
        F.col("qy") - F.col("y")
    ) * (F.col("qy") - F.col("y"))
    neigh = cand.where((F.col("qid") != F.col("vec_id")) & (d2 <= eps * eps)).groupBy(
        "qid"
    ).agg(F.count(F.lit(1)).alias("n_neighbors"))
    flagged = pts.join(
        neigh, pts.vec_id == neigh.qid, "left"
    ).select(
        "label",
        F.coalesce("n_neighbors", F.lit(0)).alias("nn"),
    )
    return (
        flagged.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum((F.col("nn") >= min_pts).cast("bigint")).alias("core_points"),
            F.sum(((F.col("nn") > 0) & (F.col("nn") < min_pts)).cast("bigint")).alias(
                "border_points"
            ),
            F.sum((F.col("nn") == 0).cast("bigint")).alias("isolated_points"),
        )
        .orderBy("label")
    )


DBSCAN_CORE_SQL = """
WITH pts AS (
  SELECT vec_id, label,
         CAST(embedding[1] AS DOUBLE) AS x, CAST(embedding[2] AS DOUBLE) AS y,
         CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.15) AS INT) AS cx,
         CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.15) AS INT) AS cy
  FROM embeddings),
probe AS (
  SELECT vec_id AS qid, x AS qx, y AS qy, cx + dx.dx AS cx, cy + dy.dy AS cy
  FROM pts,
       (SELECT unnest([-1, 0, 1]) AS dx) dx,
       (SELECT unnest([-1, 0, 1]) AS dy) dy),
neigh AS (
  SELECT qid, count(*) AS nn
  FROM probe JOIN pts USING (cx, cy)
  WHERE qid <> pts.vec_id
    AND (qx - x) * (qx - x) + (qy - y) * (qy - y) <= 0.15 * 0.15
  GROUP BY qid)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(CASE WHEN coalesce(nn, 0) >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS core_points,
       CAST(sum(CASE WHEN coalesce(nn, 0) > 0 AND coalesce(nn, 0) < 5 THEN 1 ELSE 0 END)
            AS BIGINT) AS border_points,
       CAST(sum(CASE WHEN coalesce(nn, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS isolated_points
FROM pts LEFT JOIN neigh ON pts.vec_id = neigh.qid
GROUP BY label
ORDER BY label
"""


def silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per label: a = distance
    to the own-label centroid, b = distance to the nearest OTHER
    centroid, s = (b−a)/max(a,b), averaged per label — the standard
    clustering-quality score in its O(n·k) form (the exact pairwise
    silhouette is O(n²) and adds little at corpus scale). Labels with
    s near 0 overlap their neighbors; negative s flags mislabeled
    slices.

    100 TB: centroids are one posexplode aggregate broadcast back;
    the per-point pass computes k=10 centroid distances via the
    broadcast array — map-only; one final per-label mean."""
    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    dims = emb.select("label", F.posexplode(ev).alias("dim", "v"))
    cent = dims.groupBy("label", "dim").agg(F.avg("v").alias("c"))
    cvec = cent.groupBy(F.col("label").alias("clabel")).agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "c"))
        ).alias("pairs")
    ).select(
        "clabel", F.expr("transform(pairs, p -> p.c)").alias("cvec")
    )
    pts = emb.select("vec_id", "label", ev.alias("v"))
    joined = pts.crossJoin(F.broadcast(cvec))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    dd = joined.select(
        "vec_id", "label", "clabel", F.round(dist, 9).alias("d")
    )
    own = dd.where(F.col("label") == F.col("clabel")).select(
        "vec_id", "label", F.col("d").alias("a")
    )
    other = dd.where(F.col("label") != F.col("clabel")).groupBy("vec_id").agg(
        F.min("d").alias("b")
    )
    s = own.join(other, "vec_id").select(
        "label",
        ((F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))).alias("s"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(F.avg("s"), 6).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


SILHOUETTE_SQL = """
WITH dims AS (
  SELECT vec_id, label, d.i - 1 AS dim, CAST(d.v AS DOUBLE) AS v
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS i) d),
cent AS (
  SELECT label AS clabel, dim, avg(v) AS c FROM dims GROUP BY label, dim),
dd AS (
  SELECT dims.vec_id, dims.label, cent.clabel,
         round(sqrt(sum((dims.v - cent.c) * (dims.v - cent.c))), 9) AS d
  FROM dims JOIN cent ON dims.dim = cent.dim
  GROUP BY dims.vec_id, dims.label, cent.clabel),
own AS (
  SELECT vec_id, label, d AS a FROM dd WHERE label = clabel),
other AS (
  SELECT vec_id, min(d) AS b FROM dd WHERE label <> clabel GROUP BY vec_id),
s AS (
  SELECT own.label, (b - a) / greatest(a, b) AS s
  FROM own JOIN other USING (vec_id))
SELECT label,
       CAST(count(*) AS BIGINT) AS n_points,
       round(avg(s), 6) AS mean_silhouette
FROM s
GROUP BY label
ORDER BY label
"""


def youden_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal decision threshold (Youden's J = TPR − FPR, maximized)
    for each of the first three raw-dimension label probes — the
    operating-point selection that turns auc_roc_label_probe's
    ranking quality into a deployable cutoff. Cumulative pos/neg
    counts over score VALUE groups (the bounded-ECDF machinery) give
    TPR/FPR at every candidate threshold without a per-row sort;
    ties break toward the lower threshold.

    100 TB: identical plan shape to the AUC probe — probe-partitioned
    value-group windows, one 1-row argmax per probe."""
    from pyspark.sql import Window as W

    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    probes = None
    for k in (0, 1, 2):
        p = emb.select(
            F.lit(k).alias("probe"),
            F.element_at(ev, k + 1).alias("score"),
            (F.col("label") == k).cast("int").alias("is_pos"),
        )
        probes = p if probes is None else probes.unionByName(p)
    g = probes.groupBy("probe", "score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("is_pos").alias("cnt_pos")
    )
    tot = g.groupBy("probe").agg(
        F.sum("cnt_pos").cast("double").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("cnt_pos")).cast("double").alias("n_neg"),
    )
    wv = (
        W.partitionBy("probe")
        .orderBy(F.col("score").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = g.select(
        "probe",
        "score",
        F.sum("cnt_pos").over(wv).alias("cpos"),
        F.sum(F.col("cnt") - F.col("cnt_pos")).over(wv).alias("cneg"),
    )
    j = cum.join(F.broadcast(tot), "probe").select(
        "probe",
        "score",
        (F.col("cpos") / F.col("n_pos") - F.col("cneg") / F.col("n_neg")).alias("yj"),
    )
    wbest = W.partitionBy("probe").orderBy(F.col("yj").desc(), F.col("score").asc())
    best = j.withColumn("rn", F.row_number().over(wbest)).where(F.col("rn") == 1)
    return best.select(
        "probe",
        F.round("score", 6).alias("threshold"),
        F.round("yj", 6).alias("youden_j"),
    ).orderBy("probe")


YOUDEN_SQL = """
WITH probes AS (
  SELECT k AS probe, CAST(embedding[k + 1] AS DOUBLE) AS score,
         CASE WHEN label = k THEN 1 ELSE 0 END AS is_pos
  FROM embeddings CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)),
g AS (
  SELECT probe, score, count(*) AS cnt, sum(is_pos) AS cnt_pos
  FROM probes GROUP BY probe, score),
tot AS (
  SELECT probe, CAST(sum(cnt_pos) AS DOUBLE) AS n_pos,
         CAST(sum(cnt - cnt_pos) AS DOUBLE) AS n_neg
  FROM g GROUP BY probe),
cum AS (
  SELECT probe, score,
         sum(cnt_pos) OVER w AS cpos,
         sum(cnt - cnt_pos) OVER w AS cneg
  FROM g
  WINDOW w AS (PARTITION BY probe ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
j AS (
  SELECT cum.probe, score,
         cpos / tot.n_pos - cneg / tot.n_neg AS yj
  FROM cum JOIN tot ON cum.probe = tot.probe)
SELECT probe, round(score, 6) AS threshold, round(yj, 6) AS youden_j
FROM (SELECT *, row_number() OVER (PARTITION BY probe
                                   ORDER BY yj DESC, score ASC) AS rn
      FROM j)
WHERE rn = 1
ORDER BY probe
"""
