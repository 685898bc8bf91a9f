"""Retrieval operators (SURVEY.md §2 C — text analysis / similarity
search composition): BM25 lexical scoring, reciprocal-rank fusion of
lexical + vector rankings, and cluster topic labeling (c-TF-IDF).

These are the read-side of an LLM data platform: the same corpus
statistics that power quality filtering (TF/DF/doc-length) re-used
for search, and the hybrid-retrieval pattern (BM25 ∪ ANN → RRF) that
RAG stacks run at serving time.

Scale notes (100 TB): BM25 filters the exploded token stream to the
|q| query terms BEFORE any aggregate, so the shuffle carries
O(matching docs × |q|) rows, never the corpus token stream; document
length comes from `size(split(...))` — no explode at all on that
branch. DF and avgdl are O(|q|)/O(1) broadcasts. RRF joins two
top-k lists (k rows each). c-TF-IDF aggregates are
O(cells × vocabulary).

Reference: Cantido/hematite has no retrieval surface (verified —
src/*.rs is an event store); this extends the north-star LLM-pipeline
inventory alongside queries/text.py and queries/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hematite_spark.functions import DUCK_DOT as _DUCK_DOT
from hematite_spark.functions import DUCK_NORM as _DUCK_NORM
from hematite_spark.functions import dbl as _dbl
from hematite_spark.functions import dot as _dot
from hematite_spark.functions import l2_norm as _norm
from hematite_spark.functions import norm_text as _norm_text
from hematite_spark.io import load_table

# Fixed query-term set for the oracle-checkable BM25/RRF entries (the
# testdata vocabulary is a closed word list; these are mid-frequency
# terms so scores spread).
_QUERY_TERMS = ("spark", "join", "window", "hash")
_K1, _B = 1.2, 0.75
_RRF_K = 60


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BM25 score over _QUERY_TERMS. Token stream is filtered
    to the query terms before the (doc, term) aggregate; doc length is
    computed as size(split) with no explode; DF and avgdl broadcast."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(_norm_text(), " ")
    base = docs.select(
        "doc_id", F.size(toks).cast("bigint").alias("dl"), F.explode(toks).alias("term")
    ).where(F.col("term").isin(*_QUERY_TERMS))
    tc = base.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    dfc = tc.groupBy("term").agg(F.count("*").alias("df_cnt"))
    stats = (
        load_table(spark, "documents", sf_dir)
        .select(F.size(F.split(_norm_text(), " ")).alias("dl0"))
        .agg(F.count("*").alias("n_docs"), F.avg("dl0").alias("avgdl"))
    )
    idf = F.log((F.col("n_docs") - F.col("df_cnt") + 0.5) / (F.col("df_cnt") + 0.5) + 1.0)
    tf_term = (F.col("tf") * (_K1 + 1)) / (
        F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tc.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(idf * tf_term).alias("score"),
            F.count("*").cast("bigint").alias("n_terms_matched"),
        )
    )


def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-20 documents for a fixed query —
    the lexical retrieval baseline every hybrid RAG stack starts
    from, as pure relational algebra on the corpus statistics the
    quality filters already compute."""
    scored = _bm25_scores(spark, sf_dir)
    return (
        scored.select("doc_id", "n_terms_matched", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


_BM25_CORE = """
docs AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
base AS (
  SELECT doc_id, len(toks)::BIGINT AS dl, unnest(toks) AS term FROM docs
),
tc AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM base
  WHERE term IN ('spark', 'join', 'window', 'hash')
  GROUP BY doc_id, dl, term
),
dfc AS (SELECT term, count(*) AS df_cnt FROM tc GROUP BY term),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs),
scored AS (
  SELECT doc_id,
         sum(ln((n_docs - df_cnt + 0.5) / (df_cnt + 0.5) + 1.0)
             * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS score,
         count(*)::BIGINT AS n_terms_matched
  FROM tc JOIN dfc USING (term), stats
  GROUP BY doc_id
)"""

BM25_SQL = f"""
WITH {_BM25_CORE}
SELECT doc_id, n_terms_matched, round(score, 6) AS bm25
FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25
    top-50 and the embedding-cosine top-50 (query = vec 0, the same
    anchor ann_brute_force uses; doc_id ≡ vec_id in the testdata).
    A doc missing from one list contributes 0 from that list — the
    standard RRF convention. Top-20 by fused score.

    Scale: each retriever cuts to its top-50 via orderBy().limit()
    (TakeOrderedAndProject — per-partition top-k then a k-row merge,
    never a global sort); the rank window then runs over the 50-row
    result (O(k), allowlisted in plan_lint like ann_recall_curve).
    The fusion join is broadcast-size regardless of corpus size."""
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    bm25 = (
        _bm25_scores(spark, sf_dir)
        .where(F.col("doc_id") != 0)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(50)
        .select("doc_id", F.row_number().over(w).cast("bigint").alias("bm25_rank"))
    )
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") == 0).select(_dbl("embedding").alias("qv"))
    cos = (
        emb.where(F.col("vec_id") != 0)
        .select("vec_id", _dbl("embedding").alias("ev"))
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            (_dot(F.col("ev"), F.col("qv")) / (_norm(F.col("ev")) * _norm(F.col("qv")))).alias(
                "score"
            ),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(50)
        .select("doc_id", F.row_number().over(w).cast("bigint").alias("cos_rank"))
    )
    # Fuse by union + re-aggregate instead of a full-outer join: a
    # 100-row union then a 100-row hash aggregate — full-outer would
    # force a SortMergeJoin (broadcast hash joins can't build the
    # unmatched side of FULL OUTER).
    contrib = lambda r: (1.0 / (_RRF_K + F.col(r))).alias("contrib")  # noqa: E731
    both = bm25.select(
        "doc_id", contrib("bm25_rank"), "bm25_rank", F.lit(None).cast("bigint").alias("cos_rank")
    ).unionByName(
        cos.select(
            "doc_id", contrib("cos_rank"), F.lit(None).cast("bigint").alias("bm25_rank"), "cos_rank"
        )
    )
    return (
        both.groupBy("doc_id")
        .agg(
            F.max("bm25_rank").alias("bm25_rank"),
            F.max("cos_rank").alias("cos_rank"),
            F.round(F.sum("contrib"), 6).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(20)
    )


RRF_SQL = f"""
WITH {_BM25_CORE},
bm25 AS (
  SELECT doc_id, rank::BIGINT AS bm25_rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
    FROM scored WHERE doc_id <> 0)
  WHERE rank <= 50
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
cosr AS (
  SELECT doc_id, rank::BIGINT AS cos_rank FROM (
    SELECT vec_id AS doc_id,
           row_number() OVER (ORDER BY {_DUCK_DOT.format(a="ev", b="qv")}
               / ({_DUCK_NORM.format(a="ev")} * {_DUCK_NORM.format(a="qv")}) DESC, vec_id) AS rank
    FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings WHERE vec_id <> 0), q)
  WHERE rank <= 50
)
SELECT doc_id, max(bm25_rank) AS bm25_rank, max(cos_rank) AS cos_rank,
       round(sum(contrib), 6) AS rrf
FROM (
  SELECT doc_id, 1.0 / (60 + bm25_rank) AS contrib, bm25_rank, NULL::BIGINT AS cos_rank FROM bm25
  UNION ALL
  SELECT doc_id, 1.0 / (60 + cos_rank) AS contrib, NULL::BIGINT AS bm25_rank, cos_rank FROM cosr
)
GROUP BY doc_id
ORDER BY rrf DESC, doc_id
LIMIT 20
"""


def cluster_topic_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic labeling for embedding clusters (BERTopic's c-TF-IDF
    shape): assign every doc to its 4-bit sign-bucket cell (the same
    coarse quantizer the IVF index uses), pool each cell's token
    counts into one pseudo-document, and score terms by
    rate × smooth-idf  =  (cnt/cell_tokens) × ln((1+n_cells)/(1+cells_with_term)) + rate
    keeping the top-3 terms per cell. The "+ rate" term keeps the
    ranking informative even for terms present in every cell (closed
    testdata vocabulary ⇒ ln term is often 0).

    Scale: docs⋈embeddings is a 1:1 equi-join on the id (co-partition
    key); after the (cell, term) aggregate everything is
    O(cells × vocabulary). The per-cell top-3 window partitions by
    cell — no global sort."""
    emb = load_table(spark, "embeddings", sf_dir)
    ev = _dbl("embedding")
    cell = (
        sum(
            (F.when(F.element_at(ev, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
            for i in range(4)
        )
        .cast("bigint")
        .alias("cell")
    )
    assign = emb.select(F.col("vec_id").alias("doc_id"), cell)
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.explode(F.split(_norm_text(), " ")).alias("term"))
    ct = (
        toks.join(assign, "doc_id")
        .groupBy("cell", "term")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()  # feeds cell totals, term df, and scoring
    )
    cell_tot = ct.groupBy("cell").agg(F.sum("cnt").alias("cell_tokens"))
    term_df = ct.groupBy("term").agg(F.countDistinct("cell").alias("cells_with_term"))
    n_cells = ct.agg(F.countDistinct("cell").alias("n_cells"))
    rate = F.col("cnt") / F.col("cell_tokens")
    score = rate * F.log((1.0 + F.col("n_cells")) / (1.0 + F.col("cells_with_term"))) + rate
    w = Window.partitionBy("cell").orderBy(F.col("score").desc(), F.col("term"))
    return (
        ct.join(cell_tot, "cell")
        .join(F.broadcast(term_df), "term")
        .crossJoin(F.broadcast(n_cells))
        .select("cell", "term", score.alias("score"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("cell", "rnk", "term", F.round("score", 6).alias("ctfidf"))
        .orderBy("cell", "rnk")
    )


CLUSTER_TOPICS_SQL = """
WITH assign AS (
  SELECT vec_id AS doc_id,
         CAST((CASE WHEN ev[1] >= 0 THEN 1 ELSE 0 END)
            + (CASE WHEN ev[2] >= 0 THEN 2 ELSE 0 END)
            + (CASE WHEN ev[3] >= 0 THEN 4 ELSE 0 END)
            + (CASE WHEN ev[4] >= 0 THEN 8 ELSE 0 END) AS BIGINT) AS cell
  FROM (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
),
toks AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) AS term
  FROM documents
),
ct AS (
  SELECT cell, term, count(*) AS cnt
  FROM toks JOIN assign USING (doc_id)
  GROUP BY cell, term
),
cell_tot AS (SELECT cell, sum(cnt) AS cell_tokens FROM ct GROUP BY cell),
term_df AS (SELECT term, count(DISTINCT cell) AS cells_with_term FROM ct GROUP BY term),
n AS (SELECT count(DISTINCT cell) AS n_cells FROM ct),
scored AS (
  SELECT cell, term,
         (cnt / CAST(cell_tokens AS DOUBLE))
           * ln((1.0 + n_cells) / (1.0 + cells_with_term))
           + (cnt / CAST(cell_tokens AS DOUBLE)) AS score
  FROM ct JOIN cell_tot USING (cell) JOIN term_df USING (term), n
)
SELECT cell, rnk::BIGINT AS rnk, term, round(score, 6) AS ctfidf
FROM (SELECT cell, term, score,
             row_number() OVER (PARTITION BY cell ORDER BY score DESC, term) AS rnk
      FROM scored)
WHERE rnk <= 3
ORDER BY cell, rnk
"""


def rag_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG context assembly — the retrieval stack composed
    into the artifact the generator actually consumes: BM25 top-5
    docs → 32-token non-overlapping chunks with provenance → chunks
    ranked by query-term hits (ties: bm25 desc, doc, chunk) → greedy
    pack into a 96-token context budget. Output is the context
    MANIFEST: per candidate chunk its rank, term hits, token count,
    running total, and whether it made the budget — the audit trail
    for 'why was this passage in the prompt'.

    100 TB: the doc side is the TakeOrdered(5) BM25 head, so chunking
    and ranking run on O(k) rows — the window is over ≤5 docs' chunks
    (allowlisted global window over a top-k pre-aggregate); the corpus
    pass is the same single BM25 scan bm25_retrieval runs."""
    from pyspark.sql import Window as W

    top = (
        _bm25_scores(spark, sf_dir)
        .select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(5)
    )
    docs = load_table(spark, "documents", sf_dir).join(F.broadcast(top), "doc_id")
    toks = docs.select(
        "doc_id", "bm25", F.posexplode(F.split(_norm_text(), " ")).alias("pos", "term")
    )
    chunks = (
        toks.withColumn("chunk_id", F.floor(F.col("pos") / 32).cast("int"))
        .groupBy("doc_id", "bm25", "chunk_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.col("term").isin(*_QUERY_TERMS).cast("int")).cast("bigint").alias(
                "term_hits"
            ),
        )
    )
    rw = W.orderBy(
        F.col("term_hits").desc(), F.col("bm25").desc(), F.col("doc_id"), F.col("chunk_id")
    )
    ranked = chunks.withColumn("rank", F.row_number().over(rw)).withColumn(
        "cum_tokens", F.sum("n_tokens").over(rw.rowsBetween(W.unboundedPreceding, 0))
    )
    return ranked.select(
        "rank",
        "doc_id",
        "chunk_id",
        "bm25",
        "term_hits",
        "n_tokens",
        "cum_tokens",
        (F.col("cum_tokens") <= 96).alias("included"),
    ).orderBy("rank")


RAG_CONTEXT_SQL = f"""
WITH {_BM25_CORE},
top AS (
  SELECT doc_id, round(score, 6) AS bm25
  FROM scored ORDER BY bm25 DESC, doc_id LIMIT 5),
toks AS (
  SELECT d.doc_id, t.bm25, i - 1 AS pos, w[i] AS term
  FROM (SELECT doc_id, string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
        FROM documents) d
  JOIN top t USING (doc_id),
       LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)),
chunks AS (
  SELECT doc_id, bm25, CAST(floor(pos / 32) AS INT) AS chunk_id,
         count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN term IN ('spark', 'join', 'window', 'hash') THEN 1 ELSE 0 END)::BIGINT AS term_hits
  FROM toks GROUP BY doc_id, bm25, 3),
ranked AS (
  SELECT *,
         CAST(row_number() OVER w AS INT) AS rank,
         CAST(sum(n_tokens) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM chunks
  WINDOW w AS (ORDER BY term_hits DESC, bm25 DESC, doc_id, chunk_id))
SELECT rank, doc_id, chunk_id, bm25, term_hits, n_tokens, cum_tokens,
       cum_tokens <= 96 AS included
FROM ranked
ORDER BY rank
"""


def ql_retrieval_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (μ=200) —
    the language-modeling ranking family next to BM25's probabilistic
    one: score(d) = Σ_{t∈Q} ln((tf_{t,d} + μ·p(t|C)) / (dl_d + μ)),
    where p(t|C) is the collection unigram probability. Unlike BM25,
    ABSENT query terms still contribute (the smoothed background
    mass), so every doc scores over all |Q| terms: the doc-length
    table cross-joins the broadcast 4-row term table and left-joins
    the tf table. Top 20, deterministic tie-break.

    100 TB: p(t|C) is a |Q|-row broadcast built from one filtered
    token pass; the per-doc score is docs × |Q| rows (|Q| constant),
    one left join + one aggregate; TakeOrdered caps the output."""
    docs = load_table(spark, "documents", sf_dir)
    mu = 200.0
    toks = F.split(_norm_text(), " ")
    dl = docs.select("doc_id", F.size(toks).cast("double").alias("dl"))
    hits = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .where(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    total = dl.agg(F.sum("dl").alias("n_tokens"))
    cf = (
        docs.select(F.explode(toks).alias("term"))
        .where(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("cf"))
        .crossJoin(F.broadcast(total))
        .select("term", (F.col("cf") / F.col("n_tokens")).alias("p_c"))
    )
    scored = (
        dl.crossJoin(F.broadcast(cf))
        .join(hits, ["doc_id", "term"], "left")
        .select(
            "doc_id",
            "term",
            F.log(
                (F.coalesce(F.col("tf"), F.lit(0.0)) + mu * F.col("p_c"))
                / (F.col("dl") + mu)
            ).alias("s"),
            F.coalesce(F.col("tf"), F.lit(0.0)).alias("tf0"),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("s"), 6).alias("ql_score"),
            F.sum((F.col("tf0") > 0).cast("bigint")).alias("n_terms_matched"),
        )
    )
    return scored.orderBy(F.col("ql_score").desc(), "doc_id").limit(20)


QL_DIRICHLET_SQL = """
WITH d AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM d),
hits AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM d)
  WHERE term IN ('spark', 'join', 'window', 'hash')
  GROUP BY doc_id, term),
total AS (SELECT sum(dl) AS n_tokens FROM dl),
cf AS (
  SELECT term, CAST(count(*) AS DOUBLE) / total.n_tokens AS p_c
  FROM (SELECT unnest(toks) AS term FROM d), total
  WHERE term IN ('spark', 'join', 'window', 'hash')
  GROUP BY term, total.n_tokens),
scored AS (
  SELECT dl.doc_id,
         ln((coalesce(h.tf, 0.0) + 200.0 * cf.p_c) / (dl.dl + 200.0)) AS s,
         coalesce(h.tf, 0.0) AS tf0
  FROM dl CROSS JOIN cf
  LEFT JOIN hits h ON h.doc_id = dl.doc_id AND h.term = cf.term)
SELECT doc_id, round(sum(s), 6) AS ql_score,
       CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms_matched
FROM scored
GROUP BY doc_id
ORDER BY ql_score DESC, doc_id
LIMIT 20
"""


def mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank evaluation of the BM25 ranker, one query
    per _QUERY_TERM with a deterministic relevance proxy (a doc is
    relevant to a term iff it contains the term ≥ 3 times): for each
    term, rank docs by single-term BM25 and take 1/rank of the first
    relevant hit — the navigational-search companion to
    retrieval_ndcg_audit's graded metric. Emits per-term RR plus the
    pooled MRR row (term = '__mrr__').

    100 TB: the token stream is filtered to the |Q| query terms
    before any aggregate; ranking is a term-partitioned window over
    the matched docs only; RR extraction is a 1-row-per-term
    aggregate."""
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(_norm_text(), " ")
    base = docs.select(
        "doc_id", F.size(toks).cast("bigint").alias("dl"), F.explode(toks).alias("term")
    ).where(F.col("term").isin(*_QUERY_TERMS))
    tc = base.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    dfc = tc.groupBy("term").agg(F.count("*").alias("df_cnt"))
    stats = (
        docs.select(F.size(F.split(_norm_text(), " ")).alias("dl0"))
        .agg(F.count("*").alias("n_docs"), F.avg("dl0").alias("avgdl"))
    )
    idf = F.log((F.col("n_docs") - F.col("df_cnt") + 0.5) / (F.col("df_cnt") + 0.5) + 1.0)
    tf_term = (F.col("tf") * (_K1 + 1)) / (
        F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tc.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(stats))
        .select("term", "doc_id", "tf", (idf * tf_term).alias("s"))
    )
    ranked = scored.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("term").orderBy(F.col("s").desc(), "doc_id")
        ),
    )
    per_term = ranked.groupBy("term").agg(
        F.min(F.when(F.col("tf") >= 3, F.col("rk"))).alias("first_rel_rank")
    )
    per_term = per_term.select(
        "term",
        "first_rel_rank",
        F.round(
            F.coalesce(1.0 / F.col("first_rel_rank"), F.lit(0.0)), 6
        ).alias("rr"),
    )
    mrr = per_term.agg(
        F.lit("__mrr__").alias("term"),
        F.lit(None).cast("int").alias("first_rel_rank"),
        F.round(F.avg("rr"), 6).alias("rr"),
    )
    return per_term.select(
        "term", F.col("first_rel_rank").cast("int").alias("first_rel_rank"), "rr"
    ).unionByName(mrr).orderBy("term")


MRR_EVAL_SQL = """
WITH docs AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
base AS (
  SELECT doc_id, len(toks)::BIGINT AS dl, unnest(toks) AS term FROM docs),
tc AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM base WHERE term IN ('spark', 'join', 'window', 'hash')
  GROUP BY doc_id, dl, term),
dfc AS (SELECT term, count(*) AS df_cnt FROM tc GROUP BY term),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs),
scored AS (
  SELECT tc.term, tc.doc_id, tc.tf,
         ln((stats.n_docs - dfc.df_cnt + 0.5) / (dfc.df_cnt + 0.5) + 1.0)
           * (tc.tf * 2.2)
           / (tc.tf + 1.2 * (1 - 0.75 + 0.75 * tc.dl / stats.avgdl)) AS s
  FROM tc JOIN dfc USING (term) CROSS JOIN stats),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY term ORDER BY s DESC, doc_id) AS rk
  FROM scored),
per_term AS (
  SELECT term,
         CAST(min(CASE WHEN tf >= 3 THEN rk END) AS INT) AS first_rel_rank
  FROM ranked GROUP BY term),
rr AS (
  SELECT term, first_rel_rank,
         round(coalesce(1.0 / first_rel_rank, 0.0), 6) AS rr
  FROM per_term)
SELECT term, first_rel_rank, rr FROM rr
UNION ALL
SELECT '__mrr__', CAST(NULL AS INT), round(avg(rr), 6) FROM rr
ORDER BY term
"""


def precision_at_k_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@10 / Recall@10 of the single-term BM25 rankings
    under the deterministic tf ≥ 3 relevance proxy — the set-based
    eval completing the ranking-metric triple (retrieval_ndcg_audit:
    graded; mrr_eval: navigational; this: set overlap at a cutoff).

    100 TB: same filtered token pass and term-partitioned ranking
    window as mrr_eval; the @10 cut is a windowed filter, the
    metrics one aggregate per term."""
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(_norm_text(), " ")
    base = docs.select(
        "doc_id", F.size(toks).cast("bigint").alias("dl"), F.explode(toks).alias("term")
    ).where(F.col("term").isin(*_QUERY_TERMS))
    tc = base.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    dfc = tc.groupBy("term").agg(F.count("*").alias("df_cnt"))
    stats = (
        docs.select(F.size(F.split(_norm_text(), " ")).alias("dl0"))
        .agg(F.count("*").alias("n_docs"), F.avg("dl0").alias("avgdl"))
    )
    idf = F.log((F.col("n_docs") - F.col("df_cnt") + 0.5) / (F.col("df_cnt") + 0.5) + 1.0)
    tf_term = (F.col("tf") * (_K1 + 1)) / (
        F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tc.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(stats))
        .select("term", "doc_id", "tf", (idf * tf_term).alias("s"))
    )
    ranked = scored.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("term").orderBy(F.col("s").desc(), "doc_id")),
    )
    return (
        ranked.groupBy("term")
        .agg(
            F.sum((F.col("tf") >= 3).cast("bigint")).alias("n_relevant"),
            F.sum(((F.col("tf") >= 3) & (F.col("rk") <= 10)).cast("bigint")).alias(
                "rel_in_top10"
            ),
        )
        .select(
            "term",
            "n_relevant",
            F.round(F.col("rel_in_top10") / 10.0, 6).alias("precision_at_10"),
            F.round(
                F.when(
                    F.col("n_relevant") > 0,
                    F.col("rel_in_top10") / F.col("n_relevant"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("recall_at_10"),
        )
        .orderBy("term")
    )


PRECISION_AT_K_SQL = """
WITH docs AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
base AS (
  SELECT doc_id, len(toks)::BIGINT AS dl, unnest(toks) AS term FROM docs),
tc AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM base WHERE term IN ('spark', 'join', 'window', 'hash')
  GROUP BY doc_id, dl, term),
dfc AS (SELECT term, count(*) AS df_cnt FROM tc GROUP BY term),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs),
scored AS (
  SELECT tc.term, tc.doc_id, tc.tf,
         ln((stats.n_docs - dfc.df_cnt + 0.5) / (dfc.df_cnt + 0.5) + 1.0)
           * (tc.tf * 2.2)
           / (tc.tf + 1.2 * (1 - 0.75 + 0.75 * tc.dl / stats.avgdl)) AS s
  FROM tc JOIN dfc USING (term) CROSS JOIN stats),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY term ORDER BY s DESC, doc_id) AS rk
  FROM scored)
SELECT term,
       CAST(sum(CASE WHEN tf >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant,
       round(sum(CASE WHEN tf >= 3 AND rk <= 10 THEN 1 ELSE 0 END) / 10.0, 6)
         AS precision_at_10,
       round(CASE WHEN sum(CASE WHEN tf >= 3 THEN 1 ELSE 0 END) > 0
                  THEN sum(CASE WHEN tf >= 3 AND rk <= 10 THEN 1 ELSE 0 END)
                       * 1.0 / sum(CASE WHEN tf >= 3 THEN 1 ELSE 0 END)
                  ELSE 0.0 END, 6) AS recall_at_10
FROM ranked
GROUP BY term
ORDER BY term
"""


def prf_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio-lite): for
    each query term, take its BM25 top-10 documents as pseudo-
    relevant, score every candidate term by its summed TF-IDF mass in
    that feedback set, and emit the top 3 non-query expansion terms —
    the classic recall-boosting step between first-pass retrieval and
    rerank. Terms shorter than 3 chars are stoplisted.

    100 TB: the feedback set is 10 docs per query term (TakeOrdered);
    candidate scoring joins tokens against a 40-row broadcast of
    feedback doc ids; IDF is the vocabulary aggregate the BM25 pass
    already builds."""
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(_norm_text(), " ")
    base = docs.select(
        "doc_id", F.size(toks).cast("bigint").alias("dl"), F.explode(toks).alias("term")
    )
    qhits = base.where(F.col("term").isin(*_QUERY_TERMS))
    tc = qhits.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    dfc = tc.groupBy("term").agg(F.count("*").alias("df_cnt"))
    stats = docs.select(F.size(F.split(_norm_text(), " ")).alias("dl0")).agg(
        F.count("*").alias("n_docs"), F.avg("dl0").alias("avgdl")
    )
    idf_q = F.log(
        (F.col("n_docs") - F.col("df_cnt") + 0.5) / (F.col("df_cnt") + 0.5) + 1.0
    )
    tf_term = (F.col("tf") * (_K1 + 1)) / (
        F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tc.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(stats))
        .select("term", "doc_id", (idf_q * tf_term).alias("s"))
    )
    fb = scored.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("term").orderBy(F.col("s").desc(), "doc_id")),
    ).where(F.col("rk") <= 10).select(F.col("term").alias("qterm"), "doc_id")
    # candidate expansion terms: TF-IDF mass within the feedback docs
    all_tf = base.where(F.length("term") >= 3).groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    all_df = all_tf.groupBy("term").agg(F.count("*").alias("dfc"))
    cand = (
        fb.join(all_tf, "doc_id")
        .join(F.broadcast(all_df), "term")
        .crossJoin(F.broadcast(stats))
        .where(~F.col("term").isin(*_QUERY_TERMS))
        .groupBy("qterm", "term")
        .agg(
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("n_docs") / (F.col("dfc") + 1.0))
                ),
                6,
            ).alias("rocchio_mass"),
            F.countDistinct("doc_id").cast("bigint").alias("fb_docs"),
        )
    )
    ranked = cand.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("qterm").orderBy(F.col("rocchio_mass").desc(), "term")
        ),
    )
    return ranked.where(F.col("rk") <= 3).select(
        "qterm", F.col("rk").cast("int").alias("rk"), "term", "rocchio_mass", "fb_docs"
    ).orderBy("qterm", "rk")


PRF_EXPANSION_SQL = """
WITH docs AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
base AS (
  SELECT doc_id, len(toks)::BIGINT AS dl, unnest(toks) AS term FROM docs),
tc AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM base WHERE term IN ('spark', 'join', 'window', 'hash')
  GROUP BY doc_id, dl, term),
dfc AS (SELECT term, count(*) AS df_cnt FROM tc GROUP BY term),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs),
scored AS (
  SELECT tc.term, tc.doc_id,
         ln((stats.n_docs - dfc.df_cnt + 0.5) / (dfc.df_cnt + 0.5) + 1.0)
           * (tc.tf * 2.2)
           / (tc.tf + 1.2 * (1 - 0.75 + 0.75 * tc.dl / stats.avgdl)) AS s
  FROM tc JOIN dfc USING (term) CROSS JOIN stats),
fb AS (
  SELECT term AS qterm, doc_id
  FROM (SELECT *, row_number() OVER (PARTITION BY term ORDER BY s DESC, doc_id) AS rk
        FROM scored)
  WHERE rk <= 10),
all_tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM base WHERE len(term) >= 3 GROUP BY doc_id, term),
all_df AS (SELECT term, count(*) AS dfc FROM all_tf GROUP BY term),
cand AS (
  SELECT fb.qterm, all_tf.term,
         round(sum(all_tf.tf * ln(stats.n_docs / (all_df.dfc + 1.0))), 6) AS rocchio_mass,
         CAST(count(DISTINCT all_tf.doc_id) AS BIGINT) AS fb_docs
  FROM fb
  JOIN all_tf USING (doc_id)
  JOIN all_df ON all_df.term = all_tf.term
  CROSS JOIN stats
  WHERE all_tf.term NOT IN ('spark', 'join', 'window', 'hash')
  GROUP BY fb.qterm, all_tf.term)
SELECT qterm, CAST(rk AS INT) AS rk, term, rocchio_mass, fb_docs
FROM (SELECT *, row_number() OVER (PARTITION BY qterm
                                   ORDER BY rocchio_mass DESC, term) AS rk
      FROM cand)
WHERE rk <= 3
ORDER BY qterm, rk
"""


def rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated rank-biased overlap (RBO, p=0.9, depth 20) between
    the BM25 and query-likelihood rankings — the top-weighted
    agreement measure for indefinite rankings (Kendall/Spearman treat
    all depths equally; RBO discounts depth d by p^(d−1), which is
    how users actually read result lists). RBO near 1 means the two
    ranking models are interchangeable; low RBO localizes where the
    lexical and LM views disagree.

    100 TB: both rankings are TakeOrdered(20) heads; the per-depth
    overlap is a 20×20-bounded join against a broadcast depth list —
    everything after the two retrieval passes is constant-sized."""
    from pyspark.sql import Window as W

    p = 0.9
    depth = 20
    bm25 = _bm25_scores(spark, sf_dir).select(
        "doc_id", F.col("score").alias("s_a")
    )
    # TakeOrdered first, rank the 20-row head second — the window
    # never sees a corpus-scale input (the rrf_fusion pattern)
    ra = (
        bm25.orderBy(F.col("s_a").desc(), "doc_id")
        .limit(depth)
        .withColumn("rk_a", F.row_number().over(W.orderBy(F.col("s_a").desc(), "doc_id")))
        .select("doc_id", "rk_a")
    )
    # query-likelihood ranking re-derived at full precision (the
    # catalog entry rounds for display; ranks are identical)
    docs = load_table(spark, "documents", sf_dir)
    mu = 200.0
    toks = F.split(_norm_text(), " ")
    dl = docs.select("doc_id", F.size(toks).cast("double").alias("dl"))
    hits = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .where(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    total = dl.agg(F.sum("dl").alias("n_tokens"))
    cf = (
        docs.select(F.explode(toks).alias("term"))
        .where(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("cf"))
        .crossJoin(F.broadcast(total))
        .select("term", (F.col("cf") / F.col("n_tokens")).alias("p_c"))
    )
    ql = (
        dl.crossJoin(F.broadcast(cf))
        .join(hits, ["doc_id", "term"], "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("tf"), F.lit(0.0)) + mu * F.col("p_c"))
                    / (F.col("dl") + mu)
                )
            ).alias("s_b")
        )
    )
    rb = (
        ql.orderBy(F.col("s_b").desc(), "doc_id")
        .limit(depth)
        .withColumn("rk_b", F.row_number().over(W.orderBy(F.col("s_b").desc(), "doc_id")))
        .select("doc_id", "rk_b")
    )
    both = ra.join(rb, "doc_id")
    depths = spark.range(1, depth + 1).select(F.col("id").cast("int").alias("d"))
    ov = (
        depths.crossJoin(both)
        .where((F.col("rk_a") <= F.col("d")) & (F.col("rk_b") <= F.col("d")))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("double").alias("x_d"))
    )
    agreement = depths.join(ov, "d", "left").select(
        "d", (F.coalesce("x_d", F.lit(0.0)) / F.col("d")).alias("a_d")
    )
    rbo = agreement.agg(
        F.round(
            (1 - p) * F.sum(F.col("a_d") * F.pow(F.lit(p), F.col("d") - 1)),
            6,
        ).alias("rbo_truncated"),
        F.round(F.max(F.when(F.col("d") == depth, F.col("a_d"))), 6).alias(
            "overlap_at_20"
        ),
    )
    return rbo.select(F.lit(depth).alias("depth"), "rbo_truncated", "overlap_at_20")


RBO_SQL = f"""
WITH {_BM25_CORE},
ra AS (
  SELECT doc_id, rk_a FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rk_a
    FROM scored)
  WHERE rk_a <= 20),
dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM docs),
hits AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
  WHERE term IN ('spark', 'join', 'window', 'hash')
  GROUP BY doc_id, term),
total AS (SELECT sum(dl) AS n_tokens FROM dl),
cf AS (
  SELECT term, CAST(count(*) AS DOUBLE) / total.n_tokens AS p_c
  FROM (SELECT unnest(toks) AS term FROM docs), total
  WHERE term IN ('spark', 'join', 'window', 'hash')
  GROUP BY term, total.n_tokens),
ql AS (
  SELECT dl.doc_id,
         sum(ln((coalesce(h.tf, 0.0) + 200.0 * cf.p_c) / (dl.dl + 200.0))) AS s_b
  FROM dl CROSS JOIN cf
  LEFT JOIN hits h ON h.doc_id = dl.doc_id AND h.term = cf.term
  GROUP BY dl.doc_id),
rb AS (
  SELECT doc_id, rk_b FROM (
    SELECT doc_id, row_number() OVER (ORDER BY s_b DESC, doc_id) AS rk_b
    FROM ql)
  WHERE rk_b <= 20),
joined AS (SELECT ra.doc_id, rk_a, rk_b FROM ra JOIN rb USING (doc_id)),
depths AS (SELECT CAST(unnest(generate_series(1, 20)) AS INT) AS d),
ov AS (
  SELECT d, CAST(count(*) AS DOUBLE) AS x_d
  FROM depths JOIN joined ON rk_a <= d AND rk_b <= d
  GROUP BY d),
agreement AS (
  SELECT depths.d, coalesce(ov.x_d, 0.0) / depths.d AS a_d
  FROM depths LEFT JOIN ov USING (d))
SELECT 20 AS depth,
       round((1 - 0.9) * sum(a_d * pow(0.9, d - 1)), 6) AS rbo_truncated,
       round(max(CASE WHEN d = 20 THEN a_d END), 6) AS overlap_at_20
FROM agreement
"""


def bm25_param_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 hyperparameter sensitivity: top-10 overlap between the
    production ranking (k1=1.2, b=0.75) and three perturbed configs
    (k1=0.9, k1=2.0, b=0.4) — a ranking that reshuffles under small
    parameter moves is fragile and its evaluation wins are noise
    (the IR twin of hnsw_ef_sweep's quality-vs-cost curve). Overlap
    10/10 means the corpus's score gaps dominate the parameters.

    100 TB: the (doc, term, tf, dl) table builds once; each config is
    one extra weighted aggregate over it; overlaps join four 10-row
    TakeOrdered heads."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(_norm_text(), " ")
    base = docs.select(
        "doc_id", F.size(toks).cast("bigint").alias("dl"), F.explode(toks).alias("term")
    ).where(F.col("term").isin(*_QUERY_TERMS))
    tc = base.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    dfc = tc.groupBy("term").agg(F.count("*").alias("df_cnt"))
    stats = docs.select(F.size(F.split(_norm_text(), " ")).alias("dl0")).agg(
        F.count("*").alias("n_docs"), F.avg("dl0").alias("avgdl")
    )
    j = tc.join(F.broadcast(dfc), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("n_docs") - F.col("df_cnt") + 0.5) / (F.col("df_cnt") + 0.5) + 1.0
    )

    def head(k1: float, b: float, name: str):
        tf_term = (F.col("tf") * (k1 + 1)) / (
            F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        scored = j.groupBy("doc_id").agg(F.sum(idf * tf_term).alias("s"))
        return (
            scored.orderBy(F.col("s").desc(), "doc_id")
            .limit(10)
            .select(F.lit(name).alias("config"), "doc_id")
        )

    baseline = head(1.2, 0.75, "baseline").select("doc_id")
    out = None
    for k1, b, name in ((0.9, 0.75, "k1_0.9"), (2.0, 0.75, "k1_2.0"), (1.2, 0.4, "b_0.4")):
        h = head(k1, b, name)
        ov = (
            h.join(baseline, "doc_id")
            .groupBy("config")
            .agg(F.count(F.lit(1)).cast("bigint").alias("overlap_at_10"))
        )
        row = h.select("config").distinct().join(ov, "config", "left").select(
            "config", F.coalesce("overlap_at_10", F.lit(0)).alias("overlap_at_10")
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "config",
        "overlap_at_10",
        (F.col("overlap_at_10") >= 8).alias("stable"),
    ).orderBy("config")


BM25_SENSITIVITY_SQL = f"""
WITH {_BM25_CORE},
baseline AS (
  SELECT doc_id FROM scored ORDER BY score DESC, doc_id LIMIT 10),
cfg AS (
  SELECT * FROM (VALUES ('k1_0.9', 0.9, 0.75), ('k1_2.0', 2.0, 0.75),
                        ('b_0.4', 1.2, 0.4)) AS t(config, k1, b)),
rescored AS (
  SELECT cfg.config, tc.doc_id,
         sum(ln((stats.n_docs - dfc.df_cnt + 0.5) / (dfc.df_cnt + 0.5) + 1.0)
             * (tc.tf * (cfg.k1 + 1))
             / (tc.tf + cfg.k1 * (1 - cfg.b + cfg.b * tc.dl / stats.avgdl))) AS s
  FROM tc JOIN dfc USING (term) CROSS JOIN stats CROSS JOIN cfg
  GROUP BY cfg.config, tc.doc_id),
heads AS (
  SELECT config, doc_id
  FROM (SELECT *, row_number() OVER (PARTITION BY config
                                     ORDER BY s DESC, doc_id) AS rk
        FROM rescored)
  WHERE rk <= 10)
SELECT h.config,
       CAST(sum(CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS overlap_at_10,
       sum(CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END) >= 8 AS stable
FROM heads h LEFT JOIN baseline b ON h.doc_id = b.doc_id
GROUP BY h.config
ORDER BY h.config
"""
