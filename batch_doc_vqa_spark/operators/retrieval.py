"""BM25 full-text retrieval over the corpus — the lexical search tier next
to the embedding ANN family (`operators/similarity.py`): given a small table
of queries, return the top-k documents per query under Okapi BM25.

Why it lives here: a training-data pipeline queries its corpus constantly —
decontamination forensics ("which documents score highest against this
benchmark prompt?"), targeted quality audits, dedup cluster inspection.
Embedding ANN answers "semantically near"; BM25 answers "lexically near",
and at 10^12 documents it must run as an inverted-index JOIN, never a scan
per query.

Plan shape (the inverted-index formulation): the postings table
(doc, term, tf, dl) is ONE explode + one shuffle on (doc, term); the
document-frequency table is computed ONLY for the query's terms (postings
semi-joined to the broadcast query-term dimension first, so the term
aggregate never touches non-query terms); the score join is
postings ⋈ broadcast(query terms) ⋈ broadcast(per-term idf) — map-side, no
corpus shuffle beyond the postings build — then one (query, doc) aggregate
and a per-query top-k rank window. Queries are a SMALL dimension (that is
the operator's contract, like the ANN query side); the corpus is never
collected.

Numeric discipline (CLAUDE.md): per-(doc, term) contributions round to 6
then sum as decimal(18,6) — an order-free exact fold — and the final score
rounds to 6; idf's ``ln`` and avgdl's division are written with identical
expression trees in the DuckDB oracle (the `lm_perplexity` precedent shows
JVM and DuckDB ``ln`` agree at round-6 on this discipline); the top-k rank
always carries the integer doc id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("_t", "_dl", "_term", "_tf", "_df", "_idf", "_n", "_avgdl", "_c", "_s")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float | None = None,
) -> DataFrame:
    """(query_id, doc_id, score, rank): top-``k`` documents per query under
    Okapi BM25 with ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the
    Robertson-Sparck-Jones form with the +1 that keeps idf positive) and
    the standard tf saturation / length normalization:

        score(q, d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    over the distinct query terms t. Tokenization is the repo's shared
    ``normalized_tokens`` (lower + whitespace split), the same unit every
    text operator counts in. Repeated query terms count once (standard
    BM25 query form for short queries). Ties rank by ascending doc id.
    Documents matching no query term do not appear (score 0 rows are not
    emitted); a query with no indexed term returns no rows.

    ``max_df_frac``: drop query terms whose document frequency exceeds
    this fraction of the corpus from SCORING (Lucene-style common-term
    pruning). The score join's intermediate size is
    Σ_t df(t) · |queries containing t| — a stop-word-grade term shared by
    a query batch multiplies nearly the whole corpus by nearly the whole
    batch (`scripts/bm25_scale_probe.py` measures exactly this blow-up),
    while contributing idf ≈ ln(1+1/1) ≈ 0 to any ranking. Surviving
    terms keep corpus-true idf/avgdl; a doc matching ONLY pruned terms
    drops out of the result set. None = exact full semantics (what the
    SQL oracle checks).
    """
    from .dedup import normalized_tokens

    reserved = [c for c in (*docs.columns, *queries.columns) if c in _RESERVED]
    if reserved:
        raise ValueError(f"bm25_topk: reserved column names in inputs: {reserved}")
    if k < 1:
        raise ValueError(f"bm25_topk: k must be >= 1: {k}")
    if query_id_col == id_col:
        raise ValueError(
            f"bm25_topk: query_id_col must differ from id_col: {id_col!r}"
        )

    toks = docs.select(
        F.col(id_col), normalized_tokens(F.col(text_col)).alias("_t")
    ).withColumn("_dl", F.size("_t"))
    # corpus scalars ride as a one-row broadcast (the pagerank `mm`
    # pattern): N and avgdl stay in-plan, no driver round-trip
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n"),
        F.round(F.sum("_dl") / F.count(F.lit(1)), 6).alias("_avgdl"),
    )
    # postings: ONE explode + one (doc, term) shuffle; dl is functionally
    # dependent on the doc id so grouping by it adds no key width in
    # practice and saves the join-back
    postings = (
        toks.select(id_col, "_dl", F.explode("_t").alias("_term"))
        .groupBy(id_col, "_dl", "_term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(normalized_tokens(F.col(query_text_col))).alias("_term"),
        )
        .distinct()
    )
    # document frequency ONLY for terms some query mentions: semi-join the
    # postings to the (tiny, broadcast) distinct-term dimension BEFORE the
    # term aggregate — at corpus scale the df table is query-sized, not
    # vocabulary-sized, and broadcasts back onto the score join
    q_vocab = qterms.select("_term").distinct()
    dfreq = (
        postings.join(F.broadcast(q_vocab), "_term")
        .groupBy("_term")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    # avgdl (a global scalar) rides ON the tiny per-term idf frame so the
    # corpus-sized score join never cross-joins the one-row stats — the
    # only nested-loop in the plan is stats × dfreq (1 × |query terms|)
    keyed = dfreq.crossJoin(F.broadcast(stats))
    if max_df_frac is not None:
        if not 0.0 < max_df_frac <= 1.0:
            raise ValueError(f"bm25_topk: max_df_frac must be in (0,1]: {max_df_frac}")
        keyed = keyed.filter(
            F.col("_df").cast("double") <= F.lit(float(max_df_frac)) * F.col("_n")
        )
    idf = keyed.select(
        "_term",
        F.round(
            F.log(
                F.lit(1.0)
                + (F.col("_n") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
            ),
            6,
        ).alias("_idf"),
        "_avgdl",
    )
    k1l, bl = F.lit(float(k1)), F.lit(float(b))
    tf = F.col("_tf").cast("double")
    dl = F.col("_dl").cast("double")
    contrib = F.round(
        F.col("_idf")
        * tf
        * (k1l + F.lit(1.0))
        / (tf + k1l * (F.lit(1.0) - bl + bl * dl / F.col("_avgdl"))),
        6,
    )
    # idf joins FIRST: it is inner and term-restricted, so it prunes the
    # postings stream to (surviving) query terms BEFORE the per-query
    # fan-out join multiplies rows by the queries containing each term
    scored = (
        postings.join(F.broadcast(idf), "_term")
        .join(F.broadcast(qterms), "_term")
        .withColumn("_c", contrib)
        .groupBy(query_id_col, id_col)
        .agg(F.sum(F.col("_c").cast("decimal(18,6)")).cast("double").alias("_s"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_s").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("_s", 6).alias("score"),
            "rank",
        )
    )
