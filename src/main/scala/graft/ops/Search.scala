package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Full-text retrieval over a document corpus: BM25 ranking in the
 * inverted-index shape (posting lists = the (term, doc) tf table; a
 * query touches only its terms' postings, never the corpus). The
 * reference's lakehouse has no search operator — this is the
 * training-data-pipeline extension for "find the documents about X"
 * curation passes (SURVEY §7.3 step 4).
 *
 * Determinism contract (what makes BM25 oracle-hashable at all):
 *
 *  - The IDF is the RATIONAL Robertson form (N − df + ½)/(df + ½)
 *    without the usual ln() — ln is libm-dependent and banned from
 *    oracle paths (the t_tfidf precedent); +, −, ×, ÷ are IEEE
 *    correctly-rounded everywhere. ln is monotone, so per-term
 *    rankings are preserved; multi-term scores weight rare terms
 *    more sharply than log-BM25 (documented, deterministic).
 *  - A per-(query, term, doc) double score is floor-scaled to integer
 *    MICRO-POINTS (⌊score·10⁶⌋ — floor, not cast: Spark truncates
 *    double→long where DuckDB rounds). The per-doc total is then a
 *    BIGINT sum — exact and order-independent where a double Σ would
 *    depend on partitioning.
 *  - Every float constant the oracle needs is interpolated via
 *    `Double.toString`, which round-trips: DuckDB parses the decimal
 *    string back to the bit-identical double Spark folded (writing
 *    `k1 + 1` as "2.2" in SQL while Scala computed `1.2 + 1.0` risks
 *    a one-ulp mismatch).
 *
 * Scale shape: tokenize once (tf, dl, df all derive from one
 * exploded-token aggregate chain, each map-side combined); the query
 * table and the (N, Σdl) stats row BROADCAST; the only shuffles are
 * the keyed tf/df/dl aggregates and the final per-query top-k — which
 * is [[Ranking.topKBy]]'s bounded heap (k pairs of state per query,
 * mergeable partials), not a rank window over every scored doc.
 */
object Search {

  /** Top-`k` docs per query by BM25. `queryTerms` must have columns
    * `(q_id bigint, term string)` — one row per query term; it is
    * broadcast (query sets are human-sized). Returns
    * `(q_id, rank, doc_id, score_pts)` with rank ties broken to the
    * smaller doc_id (a total order → deterministic). Docs matching no
    * query term never leave their partitions. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: DataFrame, k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (tf, dl) = indexBatch(docs, idCol, textCol)
    bm25FromIndex(tf, dl, queryTerms, k, k1, b)
  }

  /** The inverted-index TABLES for a document batch — per-(doc, term)
    * frequencies and per-doc lengths, both from ONE tokenize pass.
    * Documents are immutable, so disjoint batches' index rows simply
    * APPEND: the search index is an incrementally-maintained table
    * whose daily cost is the batch's own tokenization, never a corpus
    * re-index. df/N/avgdl are deliberately NOT materialized — they
    * derive from tf/dl at query time ([[bm25FromIndex]]), so an
    * append can never leave them stale. */
  def indexBatch(docs: DataFrame, idCol: String,
                 textCol: String): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    (toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")),
      toks.groupBy("doc_id").agg(count(lit(1)).as("dl")))
  }

  /** [[bm25]] scoring over MAINTAINED index tables (`tf(doc_id, term,
    * tf)`, `dl(doc_id, dl)`) — identical math and plan shape; the
    * corpus text never re-tokenizes at query time. */
  def bm25FromIndex(tf: DataFrame, dl: DataFrame,
                    queryTerms: DataFrame, k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_dl"))
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))

    def d(c: String) = col(c).cast(DoubleType)
    val avgdl = d("tot_dl") / d("n_docs")
    val idf = (d("n_docs") - d("df") + lit(0.5)) / (d("df") + lit(0.5))
    val tfc = (d("tf") * lit(k1 + 1.0)) /
      (d("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (d("dl") / avgdl)))
    val pts = floor(idf * tfc * lit(1e6)).cast(LongType)

    val scored = tf
      .join(broadcast(queryTerms), Seq("term"))
      .join(dfr, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("doc_id"), pts.as("pts"))
      .groupBy("q_id", "doc_id").agg(sum("pts").as("score_pts"))
    scored.groupBy("q_id")
      .agg(Ranking.topKBy(col("score_pts"), col("doc_id"), k).as("__top"))
      .select(col("q_id"), posexplode(col("__top")))
      .select(col("q_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as("doc_id"), col("col.score").cast(LongType).as("score_pts"))
  }

  /** Reciprocal-rank fusion of two rankings of the SAME candidate set
    * — the standard way to combine a lexical ranker with a second
    * signal (quality, recency, an ANN ranker) without score
    * calibration: fused = 1/(c+rankA) + 1/(c+rankB), c = 60 (the
    * constant from the original RRF paper; dampens the top-1's
    * dominance). Inputs carry `(q_id, doc_id, rank)`; candidates
    * missing from one ranking contribute only their present term
    * (full-outer semantics). Deterministic: the fused score is a
    * FIXED-ARITY sum of two correctly-rounded divisions (no
    * aggregation order anywhere), ties break to the smaller doc_id.
    * Scale: one key join + [[Ranking.topKBy]]'s bounded heap per
    * query. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Double = 60.0): DataFrame = {
    def term(r: org.apache.spark.sql.Column) =
      when(r.isNull, lit(0.0)).otherwise(lit(1.0) / (lit(c) + r.cast(DoubleType)))
    val fused = a.select(col("q_id"), col("doc_id"), col("rank").as("__ra"))
      .join(b.select(col("q_id"), col("doc_id"), col("rank").as("__rb")),
        Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        (term(col("__ra")) + term(col("__rb"))).as("rrf"))
    fused.groupBy("q_id")
      .agg(Ranking.topKBy(col("rrf"), col("doc_id"), k).as("__top"))
      .select(col("q_id"), posexplode(col("__top")))
      .select(col("q_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("rrf"))
  }

  /** DuckDB mirror of [[bm25]]: same CTE chain, same expression trees,
    * float constants round-tripped through `Double.toString`.
    * `qtValues` is the query-term VALUES list, e.g.
    * `(1,'hash'),(1,'join')`; `docsRel` the corpus relation with
    * `doc_id, text`. */
  def bm25Sql(docsRel: String, qtValues: String, k: Int,
              k1: Double = 1.2, b: Double = 0.75): String =
    bm25SqlFrom(docsRel, s"VALUES $qtValues", k, k1, b)

  /** The per-posting BM25 micro-point expression — factored so every
    * mirror that scores twice (e.g. search_prf's feedback rerun) uses
    * the ONE formula string and can't drift by a reformatted constant.
    * Expects columns `tf, df, dl, n_docs, tot_dl` in scope. */
  def bm25PtsSql(k1: Double = 1.2, b: Double = 0.75): String = {
    val k1p1 = (k1 + 1.0).toString
    val oneMb = (1.0 - b).toString
    s"""CAST(floor(
       |    ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
       |    * ((CAST(tf AS DOUBLE) * $k1p1)
       |       / (CAST(tf AS DOUBLE) + $k1 * ($oneMb + $b * (CAST(dl AS DOUBLE)
       |            / (CAST(tot_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
       |    * 1000000.0) AS BIGINT)""".stripMargin
  }

  /** [[bm25Sql]] with the query-term relation given as an arbitrary
    * SELECT/VALUES body (derived query sets — e.g. search_mrr's
    * per-document self-queries — can't be a literal VALUES list). */
  def bm25SqlFrom(docsRel: String, qtBody: String, k: Int,
                  k1: Double = 1.2, b: Double = 0.75): String = {
    s"""WITH qt(q_id, term) AS ($qtBody),
       |tok AS (SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS term FROM $docsRel),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs, SUM(dl) AS tot_dl FROM dl),
       |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |pts AS (SELECT q_id, doc_id, ${bm25PtsSql(k1, b)} AS pts
       |  FROM tf JOIN qt USING (term) JOIN dfr USING (term)
       |       JOIN dl USING (doc_id) CROSS JOIN stats),
       |scored AS (SELECT q_id, doc_id, CAST(SUM(pts) AS BIGINT) AS score_pts FROM pts GROUP BY 1, 2)
       |SELECT q_id, rank, doc_id, score_pts FROM (
       |  SELECT q_id, doc_id, score_pts,
       |         row_number() OVER (PARTITION BY q_id ORDER BY score_pts DESC, doc_id) AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin
  }

  /** Classic vector-space retrieval: cosine similarity between tf·idf
    * document vectors and tf·idf query vectors, computed as a SPARSE
    * dot product over the shared inverted index — only (query-term,
    * doc) postings ever join; a document's non-query terms contribute
    * solely through its precomputed norm. The geometric complement to
    * [[bm25]]'s probabilistic ranking (Salton's SMART lineage).
    *
    * Determinism contract (the bm25 rules, pushed further):
    *  - idf is INTEGER milli-idf `(N·1000) div df` — floor division,
    *    exact in both engines (`div`/`//`), no libm ln anywhere.
    *  - Per-(doc,term) weight `tf·idfm` is exact BIGINT; the dot
    *    product and both squared norms accumulate in DECIMAL(38,0)
    *    (w² outgrows BIGINT once idfm ~ N·1000), so every Σ is exact
    *    and order-independent. The ONLY doubles are the final
    *    `dot / (sqrt(n²_d) · sqrt(n²_q))` — a fixed-arity chain of
    *    correctly-rounded ops on exact integers (the ts_changepoint
    *    precedent for >2^53 exact-int→double casts).
    *  - Ties break to the smaller doc_id via [[Ranking.topKBy]].
    *
    * Scale shape: one tokenize pass builds tf/dl-free postings; doc
    * norms are a per-doc aggregate over the SAME postings (map-side
    * combined); the query table broadcasts; docs sharing no query term
    * never shuffle. At warehouse scale tf and norms are maintained
    * tables (the search_bm25_incremental pattern — norms are per-doc
    * constants, appended with the batch). */
  def tfidfCosine(docs: DataFrame, idCol: String, textCol: String,
                  queryTerms: DataFrame, k: Int): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val (tf, _) = indexBatch(docs, idCol, textCol)
    val stats = tf.select(countDistinct(col("doc_id")).as("n_docs"))
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val weighted = tf.join(dfr, Seq("term")).crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        (col("tf") * expr("(n_docs * 1000) div df")).as("w"))
    val docNorm = weighted.groupBy("doc_id")
      .agg(sum(col("w").cast(dec) * col("w").cast(dec)).as("n2d"))
    val qw = queryTerms.join(dfr, Seq("term")).crossJoin(broadcast(stats))
      .select(col("q_id"), col("term"),
        (col("qtf") * expr("(n_docs * 1000) div df")).as("wq"))
    val qNorm = qw.groupBy("q_id")
      .agg(sum(col("wq").cast(dec) * col("wq").cast(dec)).as("n2q"))
    val dot = weighted.join(broadcast(qw), Seq("term"))
      .groupBy("q_id", "doc_id")
      .agg(sum(col("w").cast(dec) * col("wq").cast(dec)).as("dot"))
    val cos = dot
      .join(docNorm, Seq("doc_id"))
      .join(broadcast(qNorm), Seq("q_id"))
      .select(col("q_id"), col("doc_id"),
        (col("dot").cast(DoubleType) /
          (sqrt(col("n2d").cast(DoubleType)) * sqrt(col("n2q").cast(DoubleType))))
          .as("cos"))
    cos.groupBy("q_id")
      .agg(Ranking.topKBy(col("cos"), col("doc_id"), k).as("__top"))
      .select(col("q_id"), posexplode(col("__top")))
      .select(col("q_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("cos"))
  }

  /** DuckDB mirror of [[tfidfCosine]] — same CTE chain, same floor
    * divisions (`//`), DECIMAL(38,0)/HUGEINT exact sums, identical
    * final double expression tree. The HUGEINT→DOUBLE casts of
    * dot/n2d/n2q ride [[graft.Det.hiLoDoubleSql]]: w² ~ (tf·N·1000)²
    * exceeds 2^53 at modest corpus sizes, and DuckDB's direct
    * HUGEINT→DOUBLE cast is not correctly rounded past 2^53 while
    * Spark's Decimal→Double is. */
  def tfidfCosineSql(docsRel: String, qtValues: String, k: Int): String =
    s"""WITH qt(q_id, term, qtf) AS (VALUES $qtValues),
       |tok AS (SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS term FROM $docsRel),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |stats AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
       |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |weighted AS (SELECT doc_id, term, CAST(tf * ((n_docs * 1000) // df) AS BIGINT) AS w
       |  FROM tf JOIN dfr USING (term) CROSS JOIN stats),
       |dnorm AS (SELECT doc_id, SUM(CAST(w AS HUGEINT) * w) AS n2d FROM weighted GROUP BY 1),
       |qw AS (SELECT q_id, term, CAST(qtf * ((n_docs * 1000) // df) AS BIGINT) AS wq
       |  FROM qt JOIN dfr USING (term) CROSS JOIN stats),
       |qnorm AS (SELECT q_id, SUM(CAST(wq AS HUGEINT) * wq) AS n2q FROM qw GROUP BY 1),
       |dotp AS (SELECT q_id, doc_id, SUM(CAST(w AS HUGEINT) * wq) AS dot
       |  FROM weighted JOIN qw USING (term) GROUP BY 1, 2),
       |cosd AS (SELECT q_id, doc_id,
       |    ${graft.Det.hiLoDoubleSql("dot")} /
       |      (sqrt(${graft.Det.hiLoDoubleSql("n2d")}) * sqrt(${graft.Det.hiLoDoubleSql("n2q")})) AS cos
       |  FROM dotp JOIN dnorm USING (doc_id) JOIN qnorm USING (q_id))
       |SELECT q_id, rank, doc_id, cos FROM (
       |  SELECT q_id, doc_id, cos,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS rank
       |  FROM cosd)
       |WHERE rank <= $k""".stripMargin

  /** Positional phrase search: documents containing the EXACT token
    * sequence `phrase`, with the per-doc occurrence count — the
    * "quoted query" feature a tf-only index (bm25) cannot answer.
    *
    * Postings carry token positions (one posexplode over the shared
    * tokenization); an n-term phrase closes with n−1 equi-joins on
    * (doc, position − term offset), i.e. every leg is re-anchored to
    * the phrase START so all joins share one key. Each leg filters to
    * ITS term before joining — the joined relations are term-selective
    * posting lists, never the corpus — and the join keys carry the doc
    * id, so the shuffles are the phrase-AND semantics and nothing
    * more. At warehouse scale the exploded postings are a maintained
    * TABLE (the search_bm25_incremental pattern, plus a position
    * column) and the corpus scan disappears entirely. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    require(phrase.forall(t => t.nonEmpty && !t.contains(" ")),
      s"phraseSearch: terms must be single non-empty tokens, got $phrase")
    val post = docs.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "term")))
    val anchored = phrase.zipWithIndex.map { case (t, i) =>
      post.filter(col("term") === t)
        .select(col(idCol), (col("pos") - i).as("pos"))
    }
    anchored.reduceLeft((a, b) => a.join(b, Seq(idCol, "pos")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }
}
