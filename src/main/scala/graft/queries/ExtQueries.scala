package graft.queries

import graft.{Det, Tables}
import graft.engine.Warehouse
import graft.ops.{Classifier, Dedup, EventOps, Graph, Linkage, Multimodal, Packing, Profile, Quality, Ranking, Sampling, Search, Similarity, StockOps, TextOps, TimeSeries, UrlOps}
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Extension operator inventory: the LLM-training-data-pipeline surface
 * (dedup, text analysis, similarity search, event-time processing,
 * multimodal plumbing) the north star adds beyond reference parity
 * (SURVEY.md §7.3 step 4). Every query that is SQL-expressible carries a
 * DuckDB oracle built from the same shared SQL mirrors the Scala ops
 * use ([[TextOps.tokensSql]], [[Similarity.cosineSql]], …) so double
 * arithmetic folds identically and the driver's hash compare is exact.
 *
 * MinHash/SimHash queries depend on Spark's xxhash64, which DuckDB
 * lacks — they are declared without oracle (driver records the weaker
 * rows-only check per the contract).
 */
object ExtQueries {

  /** Hive-partitioned DPP fact tables this JVM already wrote — j_dpp
    * times the dynamically-pruned join, not the once-per-ingest
    * partitioned write (the j_bucketed_join fixture discipline). */
  private val builtDppFacts = scala.collection.mutable.Set.empty[String]

  /** NN-descent graphs this JVM already built, keyed by (session, dir,
    * variant) — the j_bucketed_join fixture discipline for the graph-
    * ANN family: the k-NN graph is the once-per-ingest INDEX artifact
    * (sim_nndescent itself times the build and is NOT cached); the
    * consumers (sim_graph_search, sim_nn_incremental) time what
    * repeats in production — the beam walk / batch merge over an
    * existing index. localCheckpoint pins the materialized graph for
    * the JVM's lifetime; /tmp-free, a few MB per variant. */
  private val nnGraphCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def cachedNnGraph(s: SparkSession, dir: String, variant: String)
                           (build: => DataFrame): DataFrame =
    nnGraphCache.computeIfAbsent(
      s"${System.identityHashCode(s)}#$dir#$variant",
      _ => build.localCheckpoint())

  /** Corpus-adaptive NN-descent bucket count — buckets ∝ N keeps the
    * bucket self-join's init cost linear (fixed buckets would make it
    * N²/B). Spark computes it from one bounded count (the watermark-
    * read pattern); the oracle embeds the identical arithmetic as a
    * scalar subquery over the same source relation. Floors at 16 so
    * every driver SF (≤2000 vectors) keeps the r14 bucket count. */
  /** Once-per-JVM staged CDC-log dirs (stream_cdc_pruned_final): the
    * deterministic per-bucket files live outside the per-run base so a
    * rerun re-streams them without re-deriving or re-writing the log. */
  private val cdcpStagedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def adaptiveBuckets(n: Long): Int = math.max(16L, n / 128).toInt

  /** Once-per-(session, dir, variant) BM25 index tables (tf, dl) — the
    * cachedNnGraph fixture discipline applied to lexical search: the
    * inverted index is the once-per-ingest artifact
    * (search_bm25_incremental maintains it batch-by-batch), so eval
    * queries like search_mrr should time rank + join only, not the
    * corpus tokenization (r15 verdict item 2: the bigram build was
    * ~14× the unigram tf table and rode inside the timed query). */
  private val bm25IndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, DataFrame)]()
  private def cachedBm25Index(s: SparkSession, dir: String, variant: String)
      (build: => (DataFrame, DataFrame)): (DataFrame, DataFrame) =
    bm25IndexCache.computeIfAbsent(
      s"${System.identityHashCode(s)}#$dir#$variant",
      _ => { val (tf, dl) = build; (tf.localCheckpoint(), dl.localCheckpoint()) })

  /** Once-per-(session, dir) integer Gram matrix — the PCA family's
    * once-per-ingest sufficient statistic (dim² bounded scalars; the
    * UNCACHED distributed build is what sim_gram times). */
  private val gramCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Long]]]()
  private def cachedGram(s: SparkSession, dir: String): Array[Array[Long]] =
    gramCache.computeIfAbsent(s"${System.identityHashCode(s)}#$dir",
      _ => Similarity.gramMatrix(Tables.embeddings(s, dir), "vec_id", "embedding",
        qScale = 256.0))

  /** PCA fixed-point contract shared by the sim_pca_* family and their
    * oracles: round(x·2⁸) quantization, 2²⁰ iterate scale, 12 rounds. */
  private val PcaQScale = 256L
  private val PcaScale = 1L << 20
  private val PcaRounds = 12
  private def pcaCtes: String =
    Similarity.pcaPowerCtesSql("embeddings", "embedding", PcaQScale, PcaRounds, PcaScale)

  /** Planted-structure DBSCAN corpus shared by sim_dbscan and
    * sim_dbscan_lsh: per base b%10=0 a CHAIN of three replicas at
    * +0.4·r along coord (b div 10)%64 (middles core at minPts=2, ends
    * border), per b%10=5 a single 0.4-pair (both below minPts → noise),
    * every natural point isolated noise. Margins measured: next
    * non-planted distance ≥ 0.89 ≫ eps = 0.5 at every driver SF. */
  private def dbscanCorpus(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
    val off = base.agg(coalesce(max("vec_id"), lit(0L))).head.getLong(0) + 1
    val reps = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("r"))
      .unionByName(emb.filter(col("vec_id") % 10 === 5)
        .select(col("vec_id"), col("embedding"), lit(1L).as("r")))
      .withColumn("c", expr("CAST((vec_id div 10) % 64 AS INT)"))
      .withColumn("delta", col("r").cast(DoubleType) * lit(0.4))
      .select((lit(off) + col("vec_id") * 4 + col("r")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x.cast(DoubleType) +
            when(i === col("c"), col("delta")).otherwise(lit(0.0))).as("v"))
    base.unionByName(reps)
  }

  /** The corpus above as DuckDB CTEs (`ec`, `rep0`, `reps` → `corpus`). */
  private val dbscanCorpusCtesSql: String =
    """ec AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |       FROM embeddings),
      |rep0 AS (SELECT vec_id, embedding, r,
      |    CAST((vec_id // 10) % 64 AS BIGINT) AS c, CAST(r AS DOUBLE) * 0.4 AS delta
      |  FROM (SELECT vec_id, embedding, rr.r FROM embeddings
      |          CROSS JOIN (SELECT unnest([1, 2, 3]) AS r) rr
      |        WHERE vec_id % 10 = 0
      |        UNION ALL
      |        SELECT vec_id, embedding, 1 AS r FROM embeddings WHERE vec_id % 10 = 5)),
      |reps AS (SELECT (SELECT MAX(vec_id) + 1 FROM embeddings) + vec_id * 4 + r AS vec_id,
      |    list_transform(list_zip(embedding, range(0, len(embedding))), s ->
      |      CAST(s[1] AS DOUBLE) + CASE WHEN s[2] = c THEN delta ELSE 0.0 END) AS v
      |  FROM rep0),
      |corpus AS MATERIALIZED (SELECT * FROM ec UNION ALL SELECT * FROM reps)""".stripMargin

  /** The DBSCAN labeling CTE chain + final select over a candidate-
    * verified directed pair table `pr(qid, iid)` — shared mirror of
    * [[graft.ops.Similarity]]'s dbscanFromNbrs. A def taking minPts so
    * the mirror cannot drift from whatever the Scala caller passes
    * (the r15 advisor item: a hardcoded `n >= 2` would silently
    * diverge for any future minPts ≠ 2 caller). */
  private def dbscanLabelSql(minPts: Int): String =
    s"""cnt AS (SELECT qid, COUNT(*) AS n FROM pr GROUP BY 1),
      |core AS MATERIALIZED (SELECT qid AS id FROM cnt WHERE n >= $minPts),
      |ce AS MATERIALIZED (SELECT pr.qid AS src, pr.iid AS dst FROM pr
      |  JOIN core c1 ON pr.qid = c1.id JOIN core c2 ON pr.iid = c2.id),
      |reach(node, rt) AS (SELECT src, src FROM ce
      |  UNION
      |  SELECT ce.src, reach.rt FROM ce JOIN reach ON ce.dst = reach.node),
      |comp AS (SELECT node, MIN(rt) AS component FROM reach GROUP BY 1),
      |cc AS MATERIALIZED (SELECT core.id, COALESCE(comp.component, core.id) AS cluster
      |  FROM core LEFT JOIN comp ON core.id = comp.node),
      |bd AS (SELECT pr.qid AS id, MIN(cc.cluster) AS cluster
      |  FROM pr JOIN cc ON pr.iid = cc.id
      |  WHERE pr.qid NOT IN (SELECT id FROM core) GROUP BY 1)
      |SELECT id AS vec_id, cluster, 'core' AS role FROM cc
      |UNION ALL
      |SELECT id AS vec_id, cluster, 'border' AS role FROM bd
      |ORDER BY vec_id""".stripMargin

  /** The adaptive LSH plane pool for the 64-dim corpus
    * ([[Similarity.lshPlanePool]]: bMax × rMax md5-deterministic ±1
    * planes, band-major). The mirror GENERATES the identical pool in
    * SQL from the same md5("p_i") high-bit rule — see
    * [[lshPlanePoolSql]] — instead of embedding ~850 literal arrays. */
  private lazy val lshPool64: Array[Array[Double]] =
    Similarity.lshPlanePool(64)

  /** DuckDB twin of [[Similarity.lshPlanePool]](dim): plane p's sign at
    * coordinate i is the HIGH BIT of md5("p_i")'s first byte — the
    * exact [[Similarity.rademacherPlanes]] rule, replayed analytically
    * (the mm_audio discipline: the mirror shares the FORMULA, not the
    * array). */
  private def lshPlanePoolSql(dim: Int): String = {
    val nPlanes = Similarity.lshBandsForWidth.last * Similarity.LshRMax
    s"""(SELECT p, list_transform(range(0, $dim), i ->
       |    CASE WHEN (CAST(('0x' || substr(md5(
       |           CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)),
       |         1, 2)) AS INT) & 128) != 0
       |         THEN CAST(-1.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END) AS pvec
       |  FROM (SELECT unnest(range(0, $nPlanes)) AS p))""".stripMargin
  }

  /** The r → bands design table as a VALUES relation (the literal twin
    * of [[Similarity.lshBandsForWidth]]). */
  private def lshBandTableSql: String =
    Similarity.lshBandsForWidth.zipWithIndex
      .map { case (b, i) => s"(${Similarity.LshR0 + i}, $b)" }
      .mkString("(VALUES ", ",", ") v(rr, b)")
  private def adaptiveBucketsSql(rel: String): String =
    s"(SELECT GREATEST(16, COUNT(*) // 128) FROM $rel)" 

  /** The synthesized crawl-spelling URL of each document row as a
    * DuckDB expression — the SQL twin of the Column built inline in
    * dd_url_dedup / p_url_parts (same modulo arithmetic on doc_id). */
  private val synthUrlSql: String =
    """(CASE WHEN doc_id % 3 = 0 THEN 'HTTP://WWW.Site'
      |      WHEN doc_id % 3 = 1 THEN 'http://www.site'
      |      ELSE 'http://CDN.site' END
      | || CAST(doc_id % 7 AS VARCHAR) || '.com'
      | || CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END
      | || '/docs/' || CAST(doc_id % 40 AS VARCHAR)
      | || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
      | || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&b=2&a=1'
      |         WHEN doc_id % 4 = 1 THEN '?a=1&b=2'
      |         WHEN doc_id % 4 = 2 THEN '?b=2&a=1&fbclid=X'
      |         ELSE '' END
      | || CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END)"""
      .stripMargin.replaceAll("\\s*\\n\\s*", " ") // single-line: interpolated
      // into stripMargin'd templates, which would eat a leading `||`

  /** The md5-portable MinHash signature + banding chain as CTEs over
    * `rel` (prefix `p` keeps two chains in one query) — the same
    * construction dd_minhash_lsh inlines; n=5 shingles, k=16, 4 bands. */
  private def mhChainSql(rel: String, p: String): String =
    s"""${p}tok AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM $rel),
       |${p}sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 3),
       |  i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS shingles
       |  FROM ${p}tok WHERE len(toks) >= 5),
       |${p}hs AS (SELECT doc_id, list_transform(shingles, s ->
       |  CAST(('0x' || substr(md5(s), 1, 12)) AS BIGINT) % 2147483647) AS hs FROM ${p}sh),
       |${p}sig AS (SELECT doc_id, list_transform(range(0, 16), i ->
       |  CAST(list_min(list_transform(hs, h ->
       |    (h * (2*i+1) + 1000003*(i+1)) % 2147483647)) AS BIGINT)) AS sig FROM ${p}hs),
       |${p}bk AS (SELECT doc_id, sig, b AS band,
       |  array_to_string(list_slice(sig, b*4 + 1, b*4 + 4), ',') AS bucket
       |  FROM ${p}sig, (SELECT unnest(range(0, 4)) AS b) bb)""".stripMargin

  /** DROP-ONE probe buckets over [[mhChainSql]]'s `${p}sig` — the
    * DuckDB twin of [[Dedup.minhashIndexMd5Probe]]: per band b and
    * dropped slot j, the bucket is the band's other 3 slot values. */
  private def mhProbeBkSql(p: String): String =
    s"""${p}pbk AS (SELECT doc_id, sig, b AS band, j AS drp,
       |  array_to_string(list_concat(list_slice(sig, b*4 + 1, b*4 + j - 1),
       |                              list_slice(sig, b*4 + j + 1, b*4 + 4)), ',') AS bucket
       |  FROM ${p}sig, (SELECT unnest(range(0, 4)) AS b) bb,
       |       (SELECT unnest(range(1, 5)) AS j) jj)""".stripMargin

  /** documents ∪ exact copies of every doc_id % 5 == 0, copy ids offset
    * by MAX(doc_id)+1 (smallest copy id = offset > every real id, so the
    * injection is collision-free at ANY scale factor) — a corpus with
    * KNOWN exact duplicates for dedup operators. The offset is one
    * scalar collect, the same pattern as the watermark reads. */
  private def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val off = d.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
    d.unionByName(d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + off).as("doc_id"), col("text")))
  }

  private val dupCorpusSql =
    """corpus AS (SELECT doc_id, text FROM documents
      |           UNION ALL
      |           SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id, text
      |           FROM documents WHERE doc_id % 5 = 0)""".stripMargin

  /** The planted hierarchical-dedup corpus shared by dd_hierarchical
    * and its incremental twin, plus the id offset: originals, full
    * copies of every %5 doc (+off), paragraph chimeras of every %7 doc
    * (+2·off: first 32 tokens borrowed, rest reversed), line borrowers
    * of every %11 doc (+3·off: first 8 borrowed, rest reversed). Every
    * planted id exceeds every original id — stream order. */
  private def hierCorpusOff(s: SparkSession, dir: String): (DataFrame, Long) = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val off = base.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
    val tk = TextOps.tokens(col("text"))
    def rebuilt(take: Int) = concat_ws(" ",
      concat(slice(tk, 1, take), reverse(slice(tk, take + 1, 1000000))))
    val corpus = base
      .unionByName(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text")))
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2 * off).as("doc_id"), rebuilt(32).as("text")))
      .unionByName(base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 3 * off).as("doc_id"), rebuilt(8).as("text")))
    (corpus, off)
  }

  /** Fixed-width segmentation of a token-array column into `w`-token
    * slices, GREATEST(·, 1)-clamped so an empty array yields exactly
    * ONE empty segment (the mirror's range(0, GREATEST(...)) twin —
    * without the clamp Spark's sequence(0, -1) emits two phantoms). */
  private def segSlices(arrCol: String, w: Int): String =
    s"transform(sequence(0, GREATEST(CAST(ceil(size($arrCol) / $w.0) AS INT), 1) - 1)," +
      s" i -> slice($arrCol, i * $w + 1, $w))"

  /** Shared STAGE 1 of the two-stage retrieval harness
    * (eval_retrieval_slices / eval_rerank_positional): BM25 top-k over
    * the per-JVM staged bigram index for the %5 query docs below 150,
    * each querying with its 4 most-distinctive terms (smallest global
    * df, ties to the token). Returns `(q_id, rank, doc_id, ...)`,
    * localCheckpointed — both rerank harnesses fan out from it. */
  private def bm25Stage1(s: SparkSession, dir: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bigramText = array_join(transform(
      TextOps.bigramsOf(TextOps.tokens(col("text"))),
      g => translate(g, " ", "_")), " ")
    val corpus = dupCorpus(s, dir).select(col("doc_id"), bigramText.as("text"))
    val (tf, dl) = cachedBm25Index(s, dir, "mrr_bigram") {
      Search.indexBatch(corpus, "doc_id", "text")
    }
    val docTok = tf.select(col("doc_id"), col("term"))
    val dfr = docTok.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("term"))
    val qt = docTok.filter(col("doc_id") % 5 === 0 && col("doc_id") < 150)
      .join(broadcast(dfr), Seq("term"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select(col("doc_id").as("q_id"), col("term"))
    Search.bm25FromIndex(tf, dl, qt, k = k).localCheckpoint()
  }

  /** DuckDB twin of [[bm25Stage1]]: the `corpus`/`bcorpus`/`r1` CTE
    * prefix (a `WITH`-clause fragment; consumers chain their rerank
    * CTEs after it). */
  private def bm25Stage1Sql(k: Int): String = {
    val qtBody =
      s"""WITH dtok AS (SELECT doc_id,
         |    unnest(list_distinct(${TextOps.tokensSql("text")})) AS term
         |  FROM bcorpus),
         |dfr2 AS (SELECT term, count(*) AS df FROM dtok GROUP BY 1)
         |SELECT doc_id AS q_id, term FROM (
         |  SELECT dtok.doc_id, dtok.term,
         |         row_number() OVER (PARTITION BY dtok.doc_id
         |                            ORDER BY dfr2.df, dtok.term) AS rn
         |  FROM dtok JOIN dfr2 USING (term)
         |  WHERE dtok.doc_id % 5 = 0 AND dtok.doc_id < 150)
         |WHERE rn <= 4""".stripMargin
    s"""$dupCorpusSql,
       |bcorpus AS MATERIALIZED (SELECT doc_id,
       |  array_to_string(list_transform(${TextOps.bigramsSql("text")},
       |    g -> replace(g, ' ', '_')), ' ') AS text
       |  FROM corpus),
       |r1 AS MATERIALIZED (${Search.bm25SqlFrom("bcorpus", qtBody, k = k)})""".stripMargin
  }

  /** DuckDB mirror of the FULL three-stage hierarchical chain — shared
    * verbatim by dd_hierarchical (the batch form) and
    * dd_hierarchical_incremental (whose streamed output must equal the
    * batch's exactly: keeper order is ascending (doc_id, pidx, lidx)
    * and batch ids are all higher, so incremental admission can never
    * steal a keep — the same-oracle identity IS the correctness
    * statement). */
  private def hierChainOracleSql: String = {
        val toksSql = TextOps.tokensSql("text")
        s"""WITH b AS (SELECT doc_id, text FROM documents),
           |off AS (SELECT MAX(doc_id) + 1 AS o FROM b),
           |corpus AS (
           |  SELECT doc_id, text FROM b
           |  UNION ALL SELECT doc_id + o, text FROM b, off WHERE doc_id % 5 = 0
           |  UNION ALL SELECT doc_id + 2 * o,
           |    array_to_string(list_concat(list_slice($toksSql, 1, 32),
           |      list_reverse(list_slice($toksSql, 33, 1000000))), ' ')
           |  FROM b, off WHERE doc_id % 7 = 0
           |  UNION ALL SELECT doc_id + 3 * o,
           |    array_to_string(list_concat(list_slice($toksSql, 1, 8),
           |      list_reverse(list_slice($toksSql, 9, 1000000))), ' ')
           |  FROM b, off WHERE doc_id % 11 = 0),
           |tk AS (SELECT doc_id, $toksSql AS toks,
           |         md5(array_to_string($toksSql, ' ')) AS dh FROM corpus),
           |keep1 AS (SELECT dh, MIN(doc_id) AS doc_id FROM tk GROUP BY 1),
           |d1 AS (SELECT tk.doc_id, tk.toks FROM tk JOIN keep1
           |       ON tk.dh = keep1.dh AND tk.doc_id = keep1.doc_id),
           |paras AS (SELECT doc_id, CAST(i AS INT) AS pidx,
           |    list_slice(toks, CAST(i * 32 + 1 AS INT), CAST(i * 32 + 32 AS INT)) AS pt
           |  FROM d1, unnest(range(0, GREATEST(CAST(ceil(len(toks) / 32.0) AS INT), 1))) AS t(i)),
           |pk AS (SELECT doc_id, pidx, pt,
           |    row_number() OVER (PARTITION BY md5(array_to_string(pt, ' '))
           |                       ORDER BY doc_id, pidx) = 1 AS p_kept
           |  FROM paras),
           |lines AS (SELECT doc_id, pidx, CAST(j AS INT) AS lidx,
           |    list_slice(pt, CAST(j * 8 + 1 AS INT), CAST(j * 8 + 8 AS INT)) AS lt
           |  FROM pk, unnest(range(0, GREATEST(CAST(ceil(len(pt) / 8.0) AS INT), 1))) AS t(j)
           |  WHERE p_kept),
           |lk AS (SELECT doc_id, pidx, lidx, lt,
           |    row_number() OVER (PARTITION BY md5(array_to_string(lt, ' '))
           |                       ORDER BY doc_id, pidx, lidx) = 1 AS l_kept
           |  FROM lines),
           |pa AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_para,
           |         CAST(SUM(CASE WHEN p_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_para_kept
           |       FROM pk GROUP BY 1),
           |la AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_line,
           |         CAST(SUM(CASE WHEN l_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_line_kept,
           |         CAST(SUM(CASE WHEN l_kept THEN len(lt) ELSE 0 END) AS BIGINT) AS tok_kept
           |       FROM lk GROUP BY 1)
           |SELECT d1.doc_id,
           |  COALESCE(n_para, 0) AS n_para,
           |  COALESCE(n_para_kept, 0) AS n_para_kept,
           |  COALESCE(n_line, 0) AS n_line,
           |  COALESCE(n_line_kept, 0) AS n_line_kept,
           |  CAST(len(toks) AS BIGINT) AS tok_total,
           |  COALESCE(tok_kept, 0) AS tok_kept
           |FROM d1 LEFT JOIN pa USING (doc_id) LEFT JOIN la USING (doc_id)
           |ORDER BY doc_id""".stripMargin
  }

  /** Merge-table size for the BPE train/encode queries — small enough
    * that the oracle's unrolled iteration CTEs stay readable, large
    * enough to exercise merged-symbol merges (rank 6 merges a pair
    * containing a rank-1 product at every tested SF). */
  private val BpeMerges = 6

  /** Unrolled BPE-training CTE chain shared by the t_bpe_* oracles:
    * `words` (corpus word frequencies) → `v0` (spaced symbol strings)
    * → per iteration i: `p_i` (weighted pair counts), `m_i` (the
    * selected merge: count DESC, pair ASC), `v_i` (the vocabulary
    * re-spaced with merge i applied) — the exact computation
    * [[TextOps.bpeTrain]] runs, unrolled for DuckDB. */
  private def bpeCtes(k: Int): String = {
    val b = Seq.newBuilder[String]
    b += s"""words AS (
            |  SELECT w, CAST(count(*) AS BIGINT) AS freq
            |  FROM (SELECT unnest(${TextOps.tokensSql("text")}) AS w FROM documents)
            |  WHERE length(w) BETWEEN ${TextOps.BpeMinWordLen} AND ${TextOps.BpeMaxWordLen}
            |  GROUP BY w)""".stripMargin
    b += s"v0 AS (SELECT ${TextOps.spacedCharsSql("w")} AS sp, freq FROM words)"
    for (i <- 1 to k) {
      b += s"""p$i AS (SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt
              |  FROM (SELECT unnest(${TextOps.symbolPairsSql("sp")}) AS pr, freq FROM v${i - 1})
              |  GROUP BY pr)""".stripMargin
      b += s"m$i AS (SELECT pr, cnt FROM p$i ORDER BY cnt DESC, pr LIMIT 1)"
      b += s"v$i AS (SELECT ${TextOps.applyMergeSql(s"v${i - 1}.sp", s"m$i.pr")} AS sp, freq FROM v${i - 1}, m$i)"
    }
    b.result().mkString(",\n")
  }

  /** Training epochs for the perceptron queries. */
  private val PercEpochs = 3

  /** Stopword-density quality label shared by all classifier queries
    * ([[graft.ops.Classifier.qualityLabelSql]]). */
  private def percLabelSql = graft.ops.Classifier.qualityLabelSql("text")

  /** Unrolled batch-perceptron training CTEs (feats → w0 → per epoch:
    * d_i misclassified-sum deltas + error count, w_i updated weights)
    * — the exact integer recurrence [[graft.ops.Classifier
    * .trainPerceptron]] runs, unrolled for DuckDB. */
  private def percCtes(epochs: Int): String = {
    val n = graft.ops.Classifier.Dim + 1
    val b = Seq.newBuilder[String]
    b += s"feats AS (SELECT $percLabelSql AS y, " +
      s"${graft.ops.Classifier.featuresSql("text")} AS x FROM documents)"
    b += s"w0 AS (SELECT ${(0 until n).map(j => s"CAST(0 AS BIGINT) AS w_$j").mkString(", ")})"
    for (i <- 1 to epochs) {
      val dot = (0 until n).map(j => s"w_$j * x[${j + 1}]").mkString(" + ")
      b += s"""d$i AS (SELECT ${(0 until n).map(j =>
                s"coalesce(CAST(sum(y * x[${j + 1}]) AS BIGINT), 0) AS d_$j").mkString(", ")},
              |  CAST(count(*) AS BIGINT) AS nmis
              |  FROM feats, w${i - 1} WHERE y * ($dot) <= 0)""".stripMargin
      b += s"w$i AS (SELECT ${(0 until n).map(j =>
        s"w.w_$j + d.d_$j AS w_$j").mkString(", ")}, d.nmis AS nmis FROM w${i - 1} w, d$i d)"
    }
    b.result().mkString(",\n")
  }

  /** Nearest-centroid training CTEs shared by the ml_centroid oracles:
    * feats → st (class counts + per-bucket class sums) → w (scaled
    * centroid difference) → scored (per-doc integer score) → cls
    * (per-class HUGEINT score sums for the midpoint threshold) — the
    * exact two-scan computation [[graft.ops.Classifier.centroidModel]]
    * runs. */
  private def centroidCtes(): String = {
    val D = graft.ops.Classifier.Dim
    val spSn = (0 until D).flatMap(j => Seq(
      s"coalesce(CAST(sum(CASE WHEN y = 1 THEN x[${j + 1}] END) AS BIGINT), 0) AS sp_$j",
      s"coalesce(CAST(sum(CASE WHEN y = -1 THEN x[${j + 1}] END) AS BIGINT), 0) AS sn_$j"))
      .mkString(",\n              ")
    val ws = (0 until D).map(j => s"nneg * sp_$j - npos * sn_$j AS w_$j").mkString(", ")
    val dot = (0 until D).map(j => s"w_$j * x[${j + 1}]").mkString(" + ")
    s"""feats AS (SELECT doc_id, ${graft.ops.Classifier.qualityLabelSql("text")} AS y,
       |                 ${graft.ops.Classifier.rawCountsSql("text")} AS x
       |          FROM documents),
       |st AS (SELECT CAST(count(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS npos,
       |              CAST(count(CASE WHEN y = -1 THEN 1 END) AS BIGINT) AS nneg,
       |              $spSn
       |       FROM feats),
       |w AS (SELECT $ws, npos, nneg FROM st),
       |scored AS (SELECT doc_id, y, ($dot) AS s FROM feats, w),
       |cls AS (SELECT coalesce(sum(CASE WHEN y = 1 THEN CAST(s AS HUGEINT) END), 0) AS spos,
       |               coalesce(sum(CASE WHEN y = -1 THEN CAST(s AS HUGEINT) END), 0) AS sneg
       |        FROM scored)""".stripMargin
  }

  /** Shared by ev_retention (batch) and stream_retention_final (the
    * streaming sink's maintained tables) — identical by construction. */
  private val retentionOracleSql =
    """WITH acts AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
      |              FROM events WHERE event_id % 13 = 0),
      |cohorts AS (SELECT u, min(d) AS cohort_d FROM acts GROUP BY u)
      |SELECT c.cohort_d, datediff('day', c.cohort_d, a.d) AS day_offset,
      |       count(DISTINCT a.u) AS n_users
      |FROM acts a JOIN cohorts c ON a.u = c.u
      |GROUP BY 1, 2 ORDER BY cohort_d, day_offset""".stripMargin

  /** One k-means assignment round as CTEs (`j_<out>`, `<out>`):
    * nearest centroid in `cents` for every vector of `src`, the
    * ivfAssign tie-break (cosine DESC, c_id). Shared by the k-means
    * oracles. */
  private def kmAssignSql(src: String, cents: String, out: String): String =
    s"""j_$out AS (SELECT e.vec_id, c.c_id,
       |            ${Similarity.cosineSql("e.embedding", "c.c_vec")} AS cosine
       |     FROM $src e CROSS JOIN $cents c),
       |$out AS (SELECT vec_id, c_id AS centroid_id FROM (
       |    SELECT vec_id, c_id,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS rn
       |    FROM j_$out) WHERE rn = 1)""".stripMargin

  /** One k-means M-step as CTEs: integer (Σq, n) stats from assignment
    * `a` over the `codes` table, centroid = Σ/n as FLOAT, empty
    * clusters carried from `prev`. */
  private def kmMStepSql(a: String, prev: String, out: String,
                         codes: String = "codes"): String =
    s"""s_$out AS (SELECT $a.centroid_id, unnest(range(len(c.qv))) AS dim, unnest(c.qv) AS q
       |     FROM $a JOIN $codes c ON $a.vec_id = c.vec_id),
       |g_$out AS (SELECT centroid_id, dim, SUM(q) AS sum_q, COUNT(*) AS n
       |     FROM s_$out GROUP BY 1, 2),
       |m_$out AS (SELECT centroid_id AS c_id,
       |            list(CAST(CAST(sum_q AS DOUBLE) / CAST(n AS DOUBLE) AS FLOAT) ORDER BY dim) AS c_vec
       |     FROM g_$out GROUP BY centroid_id),
       |$out AS (SELECT * FROM m_$out
       |     UNION ALL
       |     SELECT c_id, c_vec FROM $prev
       |     WHERE c_id NOT IN (SELECT c_id FROM m_$out))""".stripMargin

  /** The full two-round k-means unroll over `embeddings` (cents0 →
    * a0 → cents1 → a1 → cents2) — [[Similarity.kmeansFit]]'s oracle
    * fragment, sound by the fixed-point argument (sim_kmeans_fit's
    * comment). Ends with the CTE `cents2` = the trained centroids. */
  private def kmUnrollSql(k: Int): String =
    s"""cents0 AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings
       |           ORDER BY vec_id LIMIT $k),
       |base AS (SELECT vec_id, ${Similarity.quantScaleSql("embedding")} AS sc, embedding
       |         FROM embeddings),
       |codes AS (SELECT vec_id, ${Similarity.quantizeInt8Sql("embedding", "sc")} AS qv FROM base),
       |${kmAssignSql("embeddings", "cents0", "a0")},
       |${kmMStepSql("a0", "cents0", "cents1")},
       |${kmAssignSql("embeddings", "cents1", "a1")},
       |${kmMStepSql("a1", "cents1", "cents2")}""".stripMargin

  /** Shared by ev_funnel (batch) and stream_funnel_final (the funnel
    * derived from the sink's compacted stage-event index). */
  private val funnelOracleSql =
    """WITH e AS (SELECT user_id AS u, event_type AS et, ts AS t FROM events),
      |r1 AS (SELECT u, min(t) AS tr FROM e WHERE et = 'signup' GROUP BY u),
      |r2 AS (SELECT e.u, min(e.t) AS tr FROM e JOIN r1 ON e.u = r1.u
      |       WHERE e.et = 'view' AND e.t > r1.tr GROUP BY e.u),
      |r3 AS (SELECT e.u, min(e.t) AS tr FROM e JOIN r2 ON e.u = r2.u
      |       WHERE e.et = 'click' AND e.t > r2.tr GROUP BY e.u),
      |r4 AS (SELECT e.u, min(e.t) AS tr FROM e JOIN r3 ON e.u = r3.u
      |       WHERE e.et = 'purchase' AND e.t > r3.tr GROUP BY e.u)
      |SELECT 1 AS stage_idx, 'signup' AS stage, (SELECT count(*) FROM r1) AS n_users
      |UNION ALL
      |SELECT 2, 'view', (SELECT count(*) FROM r2)
      |UNION ALL
      |SELECT 3, 'click', (SELECT count(*) FROM r3)
      |UNION ALL
      |SELECT 4, 'purchase', (SELECT count(*) FROM r4)
      |ORDER BY stage_idx""".stripMargin

  /** Shared by ev_transitions (batch) and stream_transitions_final
    * (the matrix derived from the sink's compacted event index). */
  private val transitionsOracleSql =
    """WITH seq AS (SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts, event_id) AS from_type
      |       FROM events),
      |cnt AS (SELECT from_type, event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
      |        FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total
      |        FROM cnt GROUP BY 1)
      |SELECT cnt.from_type, cnt.to_type, cnt.n,
      |       CAST(cnt.n AS DOUBLE) / CAST(tot.row_total AS DOUBLE) AS p
      |FROM cnt JOIN tot ON cnt.from_type = tot.from_type
      |ORDER BY cnt.from_type, cnt.to_type""".stripMargin

  /** Shared by s11_json_quarantine (batch) and stream_dlq_final (the
    * DLQ sink's two maintained lanes) — identical by construction. */
  private val quarantineOracleSql =
    """SELECT event_id,
      |  CASE WHEN json_valid(payload)
      |       THEN CAST(json_extract_string(payload, '$.k') AS INTEGER) END AS k,
      |  NOT json_valid(payload) AS quarantined,
      |  CASE WHEN NOT json_valid(payload) THEN payload END AS raw_payload
      |FROM (SELECT event_id,
      |        CASE WHEN event_id % 3 = 0 THEN substr(props, 1, 4) ELSE props END AS payload
      |      FROM events)
      |ORDER BY event_id""".stripMargin

  /** documents ∪ near copies (one appended token) of doc_id % 7 == 0,
    * copy ids offset by MAX(doc_id)+1 (collision-free at any SF) — KNOWN
    * near-duplicates at Jaccard ≈ (T-4)/(T-3) for 5-gram shingles. */
  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val off = d.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
    d.unionByName(d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + off).as("doc_id"),
        concat(col("text"), lit(" xtra")).as("text")))
  }

  private val nearDupCorpusSql =
    """corpus AS (SELECT doc_id, text FROM documents
      |           UNION ALL
      |           SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id, text || ' xtra' AS text
      |           FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  /** Deterministic hyperplanes shared by the Spark query and its SQL
    * oracle (12 planes → 4096 buckets keeps the bucket self-join tiny
    * even at sf0.1's 50k vectors; 6 planes → 64 buckets give the
    * top-k query populated candidate buckets on the 500-vector corpus). */
  private lazy val planes12: Array[Array[Double]] = Similarity.hyperplanes(12, 64)
  private lazy val planes6: Array[Array[Double]] = Similarity.hyperplanes(6, 64)

  /** DuckDB literal for a plane vector; Scala Double.toString is
    * shortest-round-trip, so DuckDB parses back the identical double. */
  private def planeSql(p: Array[Double]): String = p.mkString("[", ", ", "]")

  private def bucketSql(vec: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${Similarity.dotSql(vec, planeSql(p))} > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /**
   * Deterministic line-structured corpus: the raw documents are single
   * spaceless-newline word soup, so structure-sensitive operators
   * (Gopher duplicate-line rules, C4 line heuristics) get their
   * structure INJECTED deterministically — the same pattern as the
   * injected-PII / injected-dup corpora. Each doc is re-laid-out as
   * newline-separated lines of k = 5 + doc_id%7 tokens; a line is
   * terminally punctuated when (doc_id + line_idx) % 3 != 0; every 4th
   * doc gets its first line duplicated at the end (known duplicate
   * lines); every 97th doc gets a "lorem ipsum dolor." line (known
   * C4-filter hit). Mirrored operation-for-operation in
   * [[lineCorpusSql]].
   */
  private def lineCorpus(s: SparkSession, dir: String): DataFrame = {
    val k = (lit(5) + col("doc_id") % 7).cast(IntegerType)
    val n = size(col("toks"))
    val nLines = floor((n + k - lit(1)).cast(DoubleType) / k.cast(DoubleType)).cast(IntegerType)
    Tables.documents(s, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        when(n > lit(0), transform(sequence(lit(0), nLines - 1), i => {
          val joined = array_join(slice(col("toks"), i * k + lit(1), k), " ")
          when((col("doc_id") + i) % 3 =!= 0, concat(joined, lit("."))).otherwise(joined)
        })).otherwise(array().cast(ArrayType(StringType))).as("lines0"))
      .select(col("doc_id"),
        when(col("doc_id") % 4 === 0 && size(col("lines0")) > 0,
          concat(col("lines0"), slice(col("lines0"), 1, 1)))
          .otherwise(col("lines0")).as("lines1"))
      .select(col("doc_id"),
        array_join(
          when(col("doc_id") % 97 === 0,
            concat(col("lines1"), array(lit("lorem ipsum dolor."))))
            .otherwise(col("lines1")),
          "\n").as("text"))
  }

  private val lineCorpusSql: String =
    s"""lc AS (
       |  SELECT doc_id,
       |    array_to_string(
       |      CASE WHEN doc_id % 97 = 0 THEN list_append(lines1, 'lorem ipsum dolor.')
       |           ELSE lines1 END, chr(10)) AS text
       |  FROM (
       |    SELECT doc_id,
       |      CASE WHEN doc_id % 4 = 0 AND len(lines0) > 0 THEN list_append(lines0, lines0[1])
       |           ELSE lines0 END AS lines1
       |    FROM (
       |      SELECT doc_id,
       |        CASE WHEN n > 0 THEN list_transform(range(0, nl), i ->
       |          CASE WHEN (doc_id + i) % 3 <> 0
       |               THEN array_to_string(list_slice(toks, i * k + 1, i * k + k), ' ') || '.'
       |               ELSE array_to_string(list_slice(toks, i * k + 1, i * k + k), ' ')
       |          END)
       |        ELSE CAST([] AS VARCHAR[]) END AS lines0
       |      FROM (
       |        SELECT doc_id, toks, len(toks) AS n, 5 + doc_id % 7 AS k,
       |               (len(toks) + (5 + doc_id % 7) - 1) // (5 + doc_id % 7) AS nl
       |        FROM (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM documents)))))""".stripMargin

  /** DuckDB bit-interleave mirroring [[graft.ops.Layout.zValue2]]. */
  private def zSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString("(", " | ", ")")

  val queries: Seq[Q] = Seq(

    // ── Deduplication ──────────────────────────────────────────────────

    // Homoglyph-variant dedup ([[Dedup.homoglyphGroups]]): the corpus
    // is salted with confusable-substitution spam — copies of every
    // 9th document with Latin a/e/o swapped for their Cyrillic
    // lookalikes, the classic filter-evasion move. Exact dedup keys on
    // raw bytes and misses them; shingle signatures shatter because
    // every substituted character breaks its shingles; the TR39-style
    // skeleton (lowercase + confusable fold, a plain `translate`)
    // groups them exactly. Two-level aggregate — (skeleton, raw)
    // counts, then per-skeleton roll-up — so no distinct-Expand
    // touches corpus-sized data.
    Q("dd_homoglyph",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val off = d.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
        val spam = d.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + off).as("doc_id"),
            translate(col("text"), "aeo", "аео").as("text"))
        Dedup.homoglyphGroups(d.unionByName(spam), "doc_id", "text")
          .orderBy("keep_id")
      },
      Some(s"""WITH corpus AS (
              |  SELECT doc_id, text FROM documents
              |  UNION ALL
              |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
              |         translate(text, 'aeo', 'аео')
              |  FROM documents WHERE doc_id % 9 = 0),
              |l1 AS (SELECT translate(lower(text),
              |           '${Dedup.ConfusablesFrom}', '${Dedup.ConfusablesTo}') AS sk,
              |         text, min(doc_id) AS min_id, count(*) AS n
              |       FROM corpus GROUP BY 1, 2)
              |SELECT min(min_id) AS keep_id, CAST(sum(n) AS BIGINT) AS n_docs,
              |       CAST(count(*) AS BIGINT) AS n_variants
              |FROM l1 GROUP BY sk HAVING count(*) > 1 ORDER BY keep_id""".stripMargin)),

    // Exact dedup: one hash-aggregate shuffle keyed on the text; at
    // 100 TB you'd key on md5(text) to keep shuffle rows narrow — the
    // aggregate shape is identical.
    Q("dd_exact",
      (s, dir) => Dedup.exactDedup(dupCorpus(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH $dupCorpusSql
              |SELECT min(doc_id) AS doc_id, text, count(*) AS n_copies
              |FROM corpus GROUP BY text ORDER BY doc_id""".stripMargin)),

    // SOFT dedup ([[Dedup.softDedupWeights]]): duplicates keep a 1/n
    // sampling weight instead of being dropped — each distinct text
    // contributes total mass 1 while duplication signal survives for
    // downstream weighting (feeds samp_weighted). One hash aggregate +
    // one join back; the weight is a single correctly-rounded divide.
    Q("dd_soft_weights",
      (s, dir) => Dedup.softDedupWeights(dupCorpus(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH $dupCorpusSql,
              |sizes AS (SELECT text, count(*) AS cluster_n FROM corpus GROUP BY text)
              |SELECT doc_id, cluster_n,
              |       CAST(1.0 AS DOUBLE) / CAST(cluster_n AS DOUBLE) AS weight
              |FROM corpus JOIN sizes USING (text)
              |ORDER BY doc_id""".stripMargin)),

    // Incremental (continuous-ingestion) dedup: a new batch — fresh
    // docs + a simulated re-crawl of committed docs under new ids + a
    // within-batch duplicate slice — is admitted against the committed
    // corpus. [[Dedup.incrementalExact]]: the corpus contributes ONLY
    // its 8-byte text hashes to the anti-join (no corpus text moves —
    // the property that keeps daily dedup cost tracking the batch, not
    // the 100 TB corpus); within-batch first-id-wins is one groupBy.
    // The oracle replays the admission in SQL on raw text equality —
    // hash-green also certifies the xxhash64 keying loses nothing.
    Q("dd_incremental",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val off = d.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
        val corpus = d.filter(col("doc_id") % 3 =!= 0)
        val fresh = d.filter(col("doc_id") % 3 === 0)
        val recrawl = corpus.filter(col("doc_id") % 7 === 1)
          .select((col("doc_id") + off).as("doc_id"), col("text"))
        val selfdup = fresh.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 2 * off).as("doc_id"), col("text"))
        val batch = fresh.unionByName(recrawl).unionByName(selfdup)
        Dedup.incrementalExact(corpus, batch, "doc_id", "text").orderBy("doc_id")
      },
      Some("""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
             |off AS (SELECT MAX(doc_id) + 1 AS o FROM documents),
             |batch AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
             |  UNION ALL
             |  SELECT doc_id + (SELECT o FROM off) AS doc_id, text
             |  FROM corpus WHERE doc_id % 7 = 1
             |  UNION ALL
             |  SELECT doc_id + 2 * (SELECT o FROM off) AS doc_id, text
             |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 11 = 0),
             |firsts AS (SELECT MIN(doc_id) AS doc_id, text FROM batch GROUP BY text)
             |SELECT doc_id, text FROM firsts f
             |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = f.text)
             |ORDER BY doc_id""".stripMargin)),

    // N-gram Jaccard near-dup pairs: posting-list self-join with
    // stop-shingle (df > 20) pruning bounding the pair blowup.
    Q("dd_jaccard",
      (s, dir) => Dedup.jaccardPairs(nearDupCorpus(s, dir), "doc_id", "text",
        n = 5, minJaccard = 0.4, maxDf = 20).orderBy("id_a", "id_b"),
      Some(s"""WITH $nearDupCorpusSql,
              |tok AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM corpus),
              |sh AS (SELECT doc_id,
              |         unnest(list_distinct(list_transform(range(1, len(toks) - 3),
              |           i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS shingle
              |       FROM tok WHERE len(toks) >= 5),
              |dfr AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
              |pruned AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfr USING (shingle) WHERE dfr.df <= 20),
              |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
              |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
              |           FROM pruned a JOIN pruned b USING (shingle)
              |           WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
              |SELECT id_a, id_b, n_shared, jaccard FROM (
              |  SELECT id_a, id_b, n_shared,
              |         CAST(n_shared AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - n_shared AS DOUBLE) AS jaccard
              |  FROM shared JOIN cnt ca ON ca.doc_id = shared.id_a
              |              JOIN cnt cb ON cb.doc_id = shared.id_b)
              |WHERE jaccard >= 0.4 ORDER BY id_a, id_b""".stripMargin)),

    // Directed containment near-dups ([[Dedup.containmentPairs]]):
    // |A∩B|/|A| — the asymmetric statistic that catches a snippet
    // embedded in a longer document, which symmetric Jaccard
    // structurally misses (≈|A|/|B| → 0). Corpus plants a 200-char
    // prefix snippet of every 11th doc; threshold 0.8 tolerates the
    // mid-token cut at the snippet boundary. Same posting-list plan as
    // dd_jaccard, one extra both-directions projection, no new shuffle.
    Q("dd_containment",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val off = d.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
        val corpus = d.unionByName(d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + off).as("doc_id"),
            substring(col("text"), 1, 200).as("text")))
        Dedup.containmentPairs(corpus, "doc_id", "text",
          n = 5, minContainment = 0.8, maxDf = 20)
          .orderBy("contained_id", "container_id")
      },
      Some(s"""WITH corpus AS (SELECT doc_id, text FROM documents
              |           UNION ALL
              |           SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
              |                  substr(text, 1, 200) AS text
              |           FROM documents WHERE doc_id % 11 = 0),
              |tok AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM corpus),
              |sh AS (SELECT doc_id,
              |         unnest(list_distinct(list_transform(range(1, len(toks) - 3),
              |           i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS shingle
              |       FROM tok WHERE len(toks) >= 5),
              |dfr AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
              |pruned AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfr USING (shingle) WHERE dfr.df <= 20),
              |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
              |shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
              |           FROM pruned a JOIN pruned b USING (shingle)
              |           WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
              |dirp AS (SELECT id_a AS contained_id, id_b AS container_id, n_shared,
              |                CAST(n_shared AS DOUBLE) / CAST(ca.n_sh AS DOUBLE) AS containment
              |         FROM shared JOIN cnt ca ON ca.doc_id = shared.id_a
              |         UNION ALL
              |         SELECT id_b, id_a, n_shared,
              |                CAST(n_shared AS DOUBLE) / CAST(cb.n_sh AS DOUBLE)
              |         FROM shared JOIN cnt cb ON cb.doc_id = shared.id_b)
              |SELECT contained_id, container_id, n_shared, containment
              |FROM dirp WHERE containment >= 0.8
              |ORDER BY contained_id, container_id""".stripMargin)),

    // MinHash+LSH banded candidates over the PORTABLE md5 sketch
    // (Dedup.minhashSignaturesMd5: one md5 base hash per shingle,
    // k Carter-Wegman affine slots mod 2^61−1 — exact integer
    // arithmetic both engines reproduce bit-for-bit), so the PAIR LIST
    // itself hash-verifies. The xxhash64-native form keeps its own
    // recall-invariant query below.
    Q("dd_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairsMd5(dupCorpus(s, dir), "doc_id", "text",
        n = 5, k = 16, bands = 4, minEstJaccard = 0.5).orderBy("id_a", "id_b"),
      Some(s"""WITH $dupCorpusSql,
              |tok AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM corpus),
              |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 3),
              |         i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS shingles
              |       FROM tok WHERE len(toks) >= 5),
              |hs AS (SELECT doc_id, list_transform(shingles, s ->
              |         CAST(('0x' || substr(md5(s), 1, 12)) AS BIGINT) % 2147483647) AS hs FROM sh),
              |sig AS (SELECT doc_id, list_transform(range(0, 16), i ->
              |          CAST(list_min(list_transform(hs, h ->
              |            (h * (2*i+1) + 1000003*(i+1)) % 2147483647)) AS BIGINT)) AS sig
              |        FROM hs),
              |bk AS (SELECT doc_id, sig, b AS band,
              |         array_to_string(list_slice(sig, b*4 + 1, b*4 + 4), ',') AS bucket
              |       FROM sig, (SELECT unnest(range(0, 4)) AS b) bb),
              |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
              |                a.sig AS sig_a, b.sig AS sig_b
              |         FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
              |         WHERE a.doc_id < b.doc_id),
              |est AS (SELECT id_a, id_b,
              |          CAST(len(list_filter(range(1, 17), j ->
              |            list_extract(sig_a, j) = list_extract(sig_b, j))) AS DOUBLE) / 16.0 AS est_jaccard
              |        FROM cand)
              |SELECT id_a, id_b, est_jaccard FROM est
              |WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // INCREMENTAL near-dup admission ([[Dedup.incrementalMinhashAdmit]]
    // — incrementalExact's role for NEAR duplicates): the corpus
    // contributes only its banded LSH index rows; the batch mixes
    // exact re-crawls (rejected vs corpus at est-Jaccard 1), token-
    // reversed texts (fresh shingle sets → admitted), and a duplicated
    // reversed slice (first-id-wins within the batch). Probe cost
    // tracks the batch, never corpus volume — the daily-dedup
    // affordability property, here for near-dups.
    Q("dd_minhash_incremental",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val off = d.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
        val rev = d.filter(col("doc_id") % 10 === 3)
          .select(col("doc_id"),
            array_join(reverse(TextOps.tokens(col("text"))), " ").as("text"))
        val batch = d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + off).as("doc_id"), col("text"))
          .unionByName(rev.select((col("doc_id") + 2 * off).as("doc_id"), col("text")))
          .unionByName(rev.select((col("doc_id") + 3 * off).as("doc_id"), col("text")))
        Dedup.incrementalMinhashAdmit(d, batch, "doc_id", "text")
          .select(col("doc_id")).orderBy("doc_id")
      },
      Some(s"""WITH off AS (SELECT MAX(doc_id) + 1 AS o FROM documents),
              |rev AS (SELECT doc_id,
              |          array_to_string(list_reverse(${TextOps.tokensSql("text")}), ' ') AS text
              |        FROM documents WHERE doc_id % 10 = 3),
              |batch AS (
              |  SELECT d.doc_id + off.o AS doc_id, d.text
              |  FROM documents d, off WHERE d.doc_id % 10 = 0
              |  UNION ALL SELECT r.doc_id + 2 * off.o, r.text FROM rev r, off
              |  UNION ALL SELECT r.doc_id + 3 * off.o, r.text FROM rev r, off),
              |${mhChainSql("documents", "c")},
              |${mhChainSql("batch", "b")},
              |vsc AS (SELECT doc_id FROM (
              |    SELECT DISTINCT b.doc_id, b.sig AS sig_b, c.sig AS sig_c
              |    FROM bbk b JOIN cbk c ON b.band = c.band AND b.bucket = c.bucket)
              |  WHERE CAST(len(list_filter(range(1, 17),
              |          j -> sig_b[j] = sig_c[j])) AS DOUBLE) / 16.0 >= 0.5),
              |win AS (SELECT id_b AS doc_id FROM (
              |    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
              |           a.sig AS sig_a, b.sig AS sig_b
              |    FROM bbk a JOIN bbk b ON a.band = b.band AND a.bucket = b.bucket
              |    WHERE a.doc_id < b.doc_id)
              |  WHERE CAST(len(list_filter(range(1, 17),
              |          j -> sig_a[j] = sig_b[j])) AS DOUBLE) / 16.0 >= 0.5),
              |rej AS (SELECT doc_id FROM vsc UNION SELECT doc_id FROM win)
              |SELECT doc_id FROM batch
              |WHERE doc_id NOT IN (SELECT doc_id FROM rej)
              |ORDER BY doc_id""".stripMargin)),

    // MULTI-PROBE incremental admission ([[Dedup
    // .incrementalMinhashAdmitMultiProbe]]) — the RECALL dial on the
    // maintained LSH index (verdict-7 march: multi-probe for the
    // incremental admission path): per band, the batch also probes
    // every drop-one sub-bucket, so a near-dup that differs in exactly
    // one slot of EVERY band — the single-probe blind spot right at
    // the est-Jaccard threshold — still collides and pays the same
    // exact verify. The fixture plants exactly that borderline: every
    // 17th token of each %10 doc replaced (shingle Jaccard ≈ 12/22,
    // slot agreement ≈ 0.55, per-band full-hit ≈ 0.09 vs ≥3-of-4
    // ≈ 0.39) plus fresh reversed docs; the output lays the two
    // verdicts side by side per batch doc, and multi-probe's
    // rejections are PROVABLY a superset (a full-band match implies
    // all its drop-one matches). Hash-verified end to end.
    Q("dd_minhash_multiprobe",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val off = d.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
        val pert = d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + off).as("doc_id"), expr(
            "array_join(transform(filter(split(text, ' '), t -> length(t) > 0)," +
              " (t, i) -> IF(i % 17 = 0, 'q', t)), ' ')").as("text"))
        val rev = d.filter(col("doc_id") % 10 === 3)
          .select((col("doc_id") + 2 * off).as("doc_id"),
            array_join(reverse(TextOps.tokens(col("text"))), " ").as("text"))
        val batch = pert.unionByName(rev).localCheckpoint()
        val adm1 = Dedup.incrementalMinhashAdmit(d, batch, "doc_id", "text")
          .select(col("doc_id"), lit(true).as("__a1"))
        val admM = Dedup.incrementalMinhashAdmitMultiProbe(d, batch, "doc_id", "text")
          .select(col("doc_id"), lit(true).as("__am"))
        batch.select("doc_id")
          .join(adm1, Seq("doc_id"), "left")
          .join(admM, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("__a1"), lit(false)).as("adm_single"),
            coalesce(col("__am"), lit(false)).as("adm_multi"))
          .orderBy("doc_id")
      },
      Some(s"""WITH off AS (SELECT MAX(doc_id) + 1 AS o FROM documents),
              |pert AS (SELECT doc_id + off.o AS doc_id,
              |    array_to_string(list_transform(range(1, len(tk) + 1),
              |      i -> CASE WHEN (i - 1) % 17 = 0 THEN 'q' ELSE tk[i] END), ' ') AS text
              |  FROM (SELECT doc_id, ${TextOps.tokensSql("text")} AS tk
              |        FROM documents WHERE doc_id % 10 = 0), off),
              |rev AS (SELECT doc_id + 2 * off.o AS doc_id,
              |    array_to_string(list_reverse(${TextOps.tokensSql("text")}), ' ') AS text
              |  FROM documents, off WHERE doc_id % 10 = 3),
              |batch AS (SELECT * FROM pert UNION ALL SELECT * FROM rev),
              |${mhChainSql("documents", "c")},
              |${mhChainSql("batch", "b")},
              |${mhProbeBkSql("c")},
              |${mhProbeBkSql("b")},
              |rej1 AS (
              |  SELECT doc_id FROM (SELECT DISTINCT b.doc_id, b.sig AS sb, c.sig AS sc
              |      FROM bbk b JOIN cbk c ON b.band = c.band AND b.bucket = c.bucket)
              |    WHERE CAST(len(list_filter(range(1, 17), j -> sb[j] = sc[j])) AS DOUBLE) / 16.0 >= 0.5
              |  UNION
              |  SELECT id_b FROM (SELECT DISTINCT a.doc_id AS id_a, x.doc_id AS id_b,
              |        a.sig AS sa, x.sig AS sx
              |      FROM bbk a JOIN bbk x ON a.band = x.band AND a.bucket = x.bucket
              |      WHERE a.doc_id < x.doc_id)
              |    WHERE CAST(len(list_filter(range(1, 17), j -> sa[j] = sx[j])) AS DOUBLE) / 16.0 >= 0.5),
              |rejm AS (
              |  SELECT doc_id FROM (SELECT DISTINCT b.doc_id, b.sig AS sb, c.sig AS sc
              |      FROM bpbk b JOIN cpbk c
              |        ON b.band = c.band AND b.drp = c.drp AND b.bucket = c.bucket)
              |    WHERE CAST(len(list_filter(range(1, 17), j -> sb[j] = sc[j])) AS DOUBLE) / 16.0 >= 0.5
              |  UNION
              |  SELECT id_b FROM (SELECT DISTINCT a.doc_id AS id_a, x.doc_id AS id_b,
              |        a.sig AS sa, x.sig AS sx
              |      FROM bpbk a JOIN bpbk x
              |        ON a.band = x.band AND a.drp = x.drp AND a.bucket = x.bucket
              |      WHERE a.doc_id < x.doc_id)
              |    WHERE CAST(len(list_filter(range(1, 17), j -> sa[j] = sx[j])) AS DOUBLE) / 16.0 >= 0.5)
              |SELECT doc_id,
              |  doc_id NOT IN (SELECT doc_id FROM rej1) AS adm_single,
              |  doc_id NOT IN (SELECT doc_id FROM rejm) AS adm_multi
              |FROM batch ORDER BY doc_id""".stripMargin)),

    // STREAMING NEAR-DUP ADMISSION, oracle-hashed end state
    // ([[StreamOps.minhashAdmitSink]] →
    // [[Dedup.admitAgainstIndexMultiProbe]]): the corpus is seeded
    // with its drop-one LSH index (the once-per-ingest artifact —
    // corpus text is NEVER re-shingled after that); two ordered
    // micro-batches arrive: the borderline perturbed docs, then their
    // exact re-crawls plus fresh reversed docs. Batch order is
    // load-bearing: a batch-1 doc that slipped past the borderline
    // gate is IN the index when its batch-2 re-crawl arrives (rejected
    // at est 1.0), and one whose original was caught rejects the same
    // way against the corpus — so every re-crawl dies no matter which
    // way the borderline went, while the reversed docs admit. The
    // drained docs table must equal the two admission phases unrolled
    // in SQL over the shared probe-chain fragments.
    Q("stream_minhash_admit_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_mh_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val off = d.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
        st.overwrite(d, "dd", "docs")
        // the seed index build is pre-existing maintained state, not
        // the sink's work (the stream_nn_final fixture discipline)
        st.overwrite(cachedNnGraph(s, dir, "mh_probe_idx") {
          Dedup.minhashIndexMd5Probe(d, "doc_id", "text", n = 5, k = 16, bands = 4)
        }, "dd", "index")
        val pertText = expr(
          "array_join(transform(filter(split(text, ' '), t -> length(t) > 0)," +
            " (t, i) -> IF(i % 17 = 0, 'q', t)), ' ')")
        val pert = d.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), pertText.as("text"))
        val b1 = pert.select((col("doc_id") + off).as("doc_id"), col("text"))
        val b2 = pert.select((col("doc_id") + 3 * off).as("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 10 === 3)
            .select((col("doc_id") + 2 * off).as("doc_id"),
              array_join(reverse(TextOps.tokens(col("text"))), " ").as("text")))
        val staged = s"$base/in"
        // batch order pinned by explicit mtimes (the stream_nn_final
        // lesson: FileStreamSource orders by modification time)
        b1.coalesce(1).write.parquet(staged)
        val stagedPath = new org.apache.hadoop.fs.Path(staged)
        val t0 = System.currentTimeMillis() - 60000
        fs.listStatus(stagedPath).filter(_.isFile)
          .foreach(f => fs.setTimes(f.getPath, t0, -1))
        b2.coalesce(1).write.mode("append").parquet(staged)
        fs.listStatus(stagedPath).filter(f => f.isFile && f.getModificationTime != t0)
          .foreach(f => fs.setTimes(f.getPath, t0 + 2000, -1))
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        StreamOps.minhashAdmitSink(stream, st, "dd", "doc_id", "text",
          n = 5, k = 16, bands = 4, maxEstJaccard = 0.5,
          checkpoint = s"$base/ckpt").awaitTermination()
        st.read("dd", "docs").select(col("doc_id")).orderBy("doc_id")
      },
      Some {
        def est(a: String, b: String) =
          s"CAST(len(list_filter(range(1, 17), j -> $a[j] = $b[j])) AS DOUBLE) / 16.0"
        s"""WITH off AS (SELECT MAX(doc_id) + 1 AS o FROM documents),
           |pert AS (SELECT doc_id,
           |    array_to_string(list_transform(range(1, len(tk) + 1),
           |      i -> CASE WHEN (i - 1) % 17 = 0 THEN 'q' ELSE tk[i] END), ' ') AS text
           |  FROM (SELECT doc_id, ${TextOps.tokensSql("text")} AS tk
           |        FROM documents WHERE doc_id % 10 = 0)),
           |batch1 AS (SELECT p.doc_id + off.o AS doc_id, p.text FROM pert p, off),
           |batch2 AS (
           |  SELECT p.doc_id + 3 * off.o AS doc_id, p.text FROM pert p, off
           |  UNION ALL
           |  SELECT doc_id + 2 * off.o,
           |    array_to_string(list_reverse(${TextOps.tokensSql("text")}), ' ')
           |  FROM documents, off WHERE doc_id % 10 = 3),
           |${mhChainSql("documents", "c")},
           |${mhProbeBkSql("c")},
           |${mhChainSql("batch1", "p")},
           |${mhProbeBkSql("p")},
           |${mhChainSql("batch2", "q")},
           |${mhProbeBkSql("q")},
           |rej1 AS (
           |  SELECT doc_id FROM (SELECT DISTINCT b.doc_id, b.sig AS sb, c.sig AS sc
           |      FROM ppbk b JOIN cpbk c
           |        ON b.band = c.band AND b.drp = c.drp AND b.bucket = c.bucket)
           |    WHERE ${est("sb", "sc")} >= 0.5
           |  UNION
           |  SELECT id_b FROM (SELECT DISTINCT a.doc_id AS id_a, x.doc_id AS id_b,
           |        a.sig AS sa, x.sig AS sx
           |      FROM ppbk a JOIN ppbk x
           |        ON a.band = x.band AND a.drp = x.drp AND a.bucket = x.bucket
           |      WHERE a.doc_id < x.doc_id)
           |    WHERE ${est("sa", "sx")} >= 0.5),
           |adm1 AS (SELECT doc_id FROM batch1
           |         WHERE doc_id NOT IN (SELECT doc_id FROM rej1)),
           |idx1 AS (SELECT band, drp, bucket, sig FROM cpbk
           |  UNION ALL
           |  SELECT band, drp, bucket, sig FROM ppbk
           |  WHERE doc_id IN (SELECT doc_id FROM adm1)),
           |rej2 AS (
           |  SELECT doc_id FROM (SELECT DISTINCT b.doc_id, b.sig AS sb, c.sig AS sc
           |      FROM qpbk b JOIN idx1 c
           |        ON b.band = c.band AND b.drp = c.drp AND b.bucket = c.bucket)
           |    WHERE ${est("sb", "sc")} >= 0.5
           |  UNION
           |  SELECT id_b FROM (SELECT DISTINCT a.doc_id AS id_a, x.doc_id AS id_b,
           |        a.sig AS sa, x.sig AS sx
           |      FROM qpbk a JOIN qpbk x
           |        ON a.band = x.band AND a.drp = x.drp AND a.bucket = x.bucket
           |      WHERE a.doc_id < x.doc_id)
           |    WHERE ${est("sa", "sx")} >= 0.5),
           |adm2 AS (SELECT doc_id FROM batch2
           |         WHERE doc_id NOT IN (SELECT doc_id FROM rej2))
           |SELECT doc_id FROM documents
           |UNION ALL SELECT doc_id FROM adm1
           |UNION ALL SELECT doc_id FROM adm2
           |ORDER BY doc_id""".stripMargin
      }),

    // SimHash banded Hamming-≤3 candidates over the PORTABLE 60-bit
    // md5 bit-vote sketch (4 bands × 15 bits — pigeonhole still
    // guarantees a Hamming-≤3 pair shares a band) — pair list
    // hash-verified; the 64-bit xxhash64 form keeps its own
    // recall-invariant query below.
    Q("dd_simhash",
      (s, dir) => Dedup.simhashPairsMd5(dupCorpus(s, dir), "doc_id", "text",
        maxHamming = 3).orderBy("id_a", "id_b"),
      Some(s"""WITH $dupCorpusSql,
              |tok AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM corpus),
              |hs AS (SELECT doc_id, list_transform(toks, t ->
              |         CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs FROM tok),
              |sk AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), b ->
              |         CASE WHEN list_sum(list_transform(hs, h ->
              |           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
              |         THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
              |       FROM hs),
              |bk AS (SELECT doc_id, simhash, b AS band,
              |         (simhash >> CAST(b*15 AS INTEGER)) & 32767 AS chunk
              |       FROM sk, (SELECT unnest(range(0, 4)) AS b) bb),
              |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
              |                a.simhash AS sh_a, b.simhash AS sh_b
              |         FROM bk a JOIN bk b ON a.band = b.band AND a.chunk = b.chunk
              |         WHERE a.doc_id < b.doc_id)
              |SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
              |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
              |ORDER BY id_a, id_b""".stripMargin)),

    // MinHash/SimHash sketches use xxhash64 (no DuckDB equivalent), so
    // the pair LISTS above are rows-only — but a derived invariant IS
    // oracle-checkable: identical texts get identical sketches, land in
    // every shared band, and survive the est/hamming filter, so LSH must
    // recall 100% of identical-text pairs with a perfect sketch match.
    // DuckDB counts those pairs exactly (text self-join); a broken
    // sketch, bander, or filter makes n_recalled/n_perfect fall short
    // and the hash compare fails.
    Q("dd_minhash_recall",
      (s, dir) => {
        val corpus = dupCorpus(s, dir)
        val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
          n = 5, k = 16, bands = 4, minEstJaccard = 0.5)
        // true pairs restricted to docs that HAVE a 5-gram signature
        // (minhashSignatures drops <5-token docs) — without the mirror
        // filter the invariant breaks on any short duplicated text
        val t = corpus.where(size(TextOps.tokens(col("text"))) >= 5)
          .select(col("doc_id"), col("text"))
        val truePairs = t.as("a").join(t.as("b"),
            col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        truePairs.join(pairs, Seq("id_a", "id_b"), "left")
          .agg(count(lit(1)).as("n_true_pairs"),
            count(col("est_jaccard")).as("n_recalled"),
            sum(when(col("est_jaccard") === 1.0, 1L).otherwise(0L)).as("n_perfect"))
      },
      Some(s"""WITH $dupCorpusSql,
              |sig AS (SELECT doc_id, text FROM corpus
              |        WHERE len(${TextOps.tokensSql("text")}) >= 5),
              |p AS (SELECT count(*) AS n FROM sig a JOIN sig b
              |      ON a.text = b.text AND a.doc_id < b.doc_id)
              |SELECT CAST(n AS BIGINT) AS n_true_pairs, CAST(n AS BIGINT) AS n_recalled,
              |       CAST(n AS BIGINT) AS n_perfect FROM p""".stripMargin)),

    // Same invariant for SimHash: identical text → identical 64-bit
    // sketch → Hamming 0 on every band → guaranteed candidate.
    Q("dd_simhash_recall",
      (s, dir) => {
        val corpus = dupCorpus(s, dir)
        val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
        val t = corpus.select(col("doc_id"), col("text"))
        val truePairs = t.as("a").join(t.as("b"),
            col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        truePairs.join(pairs, Seq("id_a", "id_b"), "left")
          .agg(count(lit(1)).as("n_true_pairs"),
            count(col("hamming")).as("n_recalled"),
            sum(when(col("hamming") === 0L, 1L).otherwise(0L)).as("n_perfect"))
      },
      Some(s"""WITH $dupCorpusSql,
              |p AS (SELECT count(*) AS n FROM corpus a JOIN corpus b
              |      ON a.text = b.text AND a.doc_id < b.doc_id)
              |SELECT CAST(n AS BIGINT) AS n_true_pairs, CAST(n AS BIGINT) AS n_recalled,
              |       CAST(n AS BIGINT) AS n_perfect FROM p""".stripMargin)),

    // ── Sampling ───────────────────────────────────────────────────────

    // Deterministic per-key carve-out: xxhash64 order is not DuckDB-
    // expressible, but its CONTRACT is — exactly min(k, |group|) rows
    // per key, and the selected ids identical no matter how the input
    // is partitioned. The query runs the sampler twice (native layout
    // vs. repartition(7)) and reports per-key sample size plus the
    // count of ids picked by one run and not the other; the oracle
    // asserts (LEAST(k, n), 0) per key.
    // Neyman-optimal allocation ([[Sampling.neymanAllocation]]): the
    // budget splits ∝ N_h·S_h from exact integer sufficient statistics;
    // the only doubles are one division, one sqrt, and a stratum-ORDERED
    // fold for the cross-stratum total (a plain double SUM would be
    // partition-order-dependent) — so the floor()ed allocations
    // hash-match exactly.
    Q("samp_neyman",
      (s, dir) => Sampling.neymanAllocation(
          Tables.orders(s, dir), "o_orderpriority", "o_totalprice", total = 1000)
        .orderBy("stratum"),
      Some("""WITH st AS (SELECT o_orderpriority AS stratum,
             |         count(*) AS n_rows,
             |         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS sx,
             |         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
             |           * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS sxx
             |       FROM orders GROUP BY 1),
             |sc AS (SELECT stratum, n_rows,
             |         sqrt(CAST(CAST(n_rows AS HUGEINT) * sxx - sx * sx AS DOUBLE)
             |              / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE))) AS stddev
             |       FROM st),
             |tt AS (SELECT list_reduce(
             |         list_prepend(CAST(0.0 AS DOUBLE),
             |           list(CAST(n_rows AS DOUBLE) * stddev ORDER BY stratum)),
             |         (a, x) -> a + x) AS tot
             |       FROM sc)
             |SELECT stratum, n_rows, stddev,
             |       CAST(floor(1000.0 * (CAST(n_rows AS DOUBLE) * stddev) / tot) AS BIGINT)
             |         AS alloc
             |FROM sc, tt ORDER BY stratum""".stripMargin)),

    Q("samp_per_key",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val k = 3
        val s1 = Sampling.deterministicPerKey(docs, "lang", "doc_id", k)
          .select(col("lang"), col("doc_id"))
        val s2 = Sampling.deterministicPerKey(
            docs.repartition(7, col("doc_id")), "lang", "doc_id", k)
          .select(col("lang"), col("doc_id"), lit(1).as("m"))
        s1.join(s2, Seq("lang", "doc_id"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(when(col("m").isNull, 1L).otherwise(0L)).as("n_unstable"))
          .orderBy("lang")
      },
      Some("""SELECT lang, CAST(LEAST(3, count(*)) AS BIGINT) AS n_sampled,
             |       CAST(0 AS BIGINT) AS n_unstable
             |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin)),

    // Training-mix materialization: per-source caps in deterministic
    // hash order. Oracle asserts the mix counts (least(cap, |source|))
    // — the selection itself is xxhash-ordered, so counts are the
    // SQL-checkable contract (id-stability is samp_per_key's job).
    Q("samp_mixture",
      (s, dir) => Sampling.mixturePerKey(Tables.documents(s, dir), "source", "doc_id",
          Map("src0" -> 10, "src1" -> 3), default = 15)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .orderBy("source"),
      Some("""SELECT source,
             |  CAST(LEAST(CASE source WHEN 'src0' THEN 10 WHEN 'src1' THEN 3 ELSE 15 END,
             |             count(*)) AS BIGINT) AS n_docs
             |FROM documents GROUP BY 1 ORDER BY source""".stripMargin)),

    // Temperature-rebalanced mixture ([[Sampling.temperatureMixture]],
    // α = 1/2): domains draw quota ∝ floor(√n_d) — head domains
    // flattened, tail boosted, the standard LLM data-recipe
    // rebalancing — with ALL-BIGINT quota arithmetic (sqrt is the one
    // correctly-rounded fractional power; floor-integerized weights
    // make Σw and the div exact in any engine) and md5-ordered
    // selection, so the oracle verifies the chosen document
    // IDENTITIES, not just per-domain counts.
    Q("samp_temperature",
      (s, dir) => Sampling.temperatureMixture(
          Tables.documents(s, dir).select(col("doc_id"), col("source")),
          "source", "doc_id", budget = 2000L)
        .select(col("source"), col("doc_id"))
        .orderBy("source", "doc_id"),
      Some("""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
             |           FROM documents GROUP BY 1),
             |w AS (SELECT source, n,
             |        CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
             |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
             |q AS (SELECT source, (2000 * w) // tw AS quota FROM w CROSS JOIN t),
             |r AS (SELECT source, doc_id,
             |        row_number() OVER (PARTITION BY source
             |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |      FROM documents)
             |SELECT source, doc_id FROM r JOIN q USING (source)
             |WHERE rn <= quota ORDER BY source, doc_id""".stripMargin)),

    // α=1/2 EWMA checkpoints ([[TimeSeries.ewmaHalf]]): the
    // exponential smoother whose every step — s ← (x+s)/2 — is one
    // correctly-rounded addition plus an EXACT halving, so the folded
    // doubles are bit-identical in any engine (general-α EWMAs drift
    // ulps through non-dyadic weights and can't hash-verify). Four
    // evenly-spaced prefix checkpoints per ticker over the daily close
    // series; the fold order is the time order, pinned by the same
    // sorted-collect the trailing features use.
    Q("ts_ewma",
      (s, dir) => TimeSeries.ewmaHalf(
          graft.ops.StockOps.silverDaily(graft.ops.StockOps.bronzeFromLineitem(
            Tables.lineitem(s, dir))),
          Seq("sigla_empresa"), "data_pregao", "valor_fechamento", checkpoints = 4)
        .orderBy("sigla_empresa", "idx"),
      Some(s"""WITH silver AS (${graft.ops.StockOps.silverSql()}),
              |g AS (SELECT sigla_empresa,
              |        list(CAST(valor_fechamento AS DOUBLE) ORDER BY data_pregao) AS v
              |      FROM silver GROUP BY 1),
              |c AS (SELECT sigla_empresa,
              |        greatest(CAST(floor(len(v) * i / 4.0) AS INT), 1) AS idx, v
              |      FROM g, unnest(range(1, 5)) t(i))
              |SELECT DISTINCT sigla_empresa, CAST(idx AS BIGINT) AS idx,
              |       list_reduce(list_slice(v, 1, idx), (acc, x) -> (x + acc) / 2) AS ewma
              |FROM c ORDER BY sigla_empresa, idx""".stripMargin)),

    // Holt's linear smoothing ([[TimeSeries.holtHalf]]): level + trend
    // with α = β = ½ — every update is adds and one exact halving, so
    // the two-component struct fold hash-matches DuckDB's list_reduce
    // bit-for-bit. The one-step forecast (level + trend) is the
    // trend-aware successor to ts_ewma's flat smoother.
    Q("ts_holt",
      (s, dir) => TimeSeries.holtHalf(
          graft.ops.StockOps.silverDaily(graft.ops.StockOps.bronzeFromLineitem(
            Tables.lineitem(s, dir))),
          Seq("sigla_empresa"), "data_pregao", "valor_fechamento")
        .orderBy("sigla_empresa"),
      // oracle replays the recurrence as a recursive CTE, NOT DuckDB's
      // list_reduce: with a STRUCT accumulator, DuckDB 1.0 updates the
      // accumulator field-by-field in place, so a later field's
      // expression reads the earlier field's ALREADY-UPDATED value
      // (measured: b saw the new l) — the CTE makes each step's inputs
      // explicit and matches Spark's fold bit-for-bit
      Some(s"""WITH RECURSIVE silver AS (${graft.ops.StockOps.silverSql()}),
              |ord AS (SELECT sigla_empresa,
              |          row_number() OVER (PARTITION BY sigla_empresa
              |                             ORDER BY data_pregao) AS i,
              |          CAST(valor_fechamento AS DOUBLE) AS x
              |        FROM silver),
              |nn AS (SELECT sigla_empresa, max(i) AS n FROM ord GROUP BY 1),
              |rec(sigla_empresa, i, l, b) AS (
              |  SELECT sigla_empresa, i, x, CAST(0.0 AS DOUBLE) FROM ord WHERE i = 1
              |  UNION ALL
              |  SELECT r.sigla_empresa, r.i + 1,
              |         (o.x + (r.l + r.b)) / 2.0,
              |         (((o.x + (r.l + r.b)) / 2.0 - r.l) + r.b) / 2.0
              |  FROM rec r JOIN ord o
              |    ON o.sigla_empresa = r.sigla_empresa AND o.i = r.i + 1)
              |SELECT r.sigla_empresa, CAST(nn.n AS BIGINT) AS n,
              |       r.l AS level, r.b AS trend, r.l + r.b AS forecast
              |FROM rec r JOIN nn ON r.sigla_empresa = nn.sigla_empresa AND r.i = nn.n
              |ORDER BY r.sigla_empresa""".stripMargin)),

    // T5-style span-corruption examples ([[TextOps.spanCorrupt]]):
    // every 5th token becomes an incrementing `<X_k>` sentinel in the
    // input and the target carries the sentinel-prefixed removed
    // tokens — the denoising objective's (input, target) pair built as
    // a zero-shuffle projection that scales with the scan. Positions
    // (not randomness) choose spans, so the corpus regenerates
    // bit-identically; the oracle replays the full construction.
    Q("t_span_corrupt",
      (s, dir) => TextOps.spanCorrupt(Tables.documents(s, dir), "doc_id", "text",
          every = 5)
        .orderBy("doc_id"),
      Some {
        val (inp, tgt, nm) = TextOps.spanCorruptSql("text", 5)
        s"""SELECT doc_id, $inp AS input_text, $tgt AS target_text, $nm AS n_masked
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // Corpus length profile: equi-width histogram of document lengths
    // per source — pure INTEGER bucket arithmetic (n_chars div 200,
    // clamped), so both engines agree bit-exactly; one narrow shuffle
    // with map-side partials. The distribution-profiling pass that
    // sizes packing/truncation decisions at 100 TB.
    Q("t_len_histogram",
      (s, dir) => Tables.documents(s, dir)
        .select(col("source"),
          least(expr("n_chars div 200"), lit(9L)).cast(IntegerType).as("bucket"),
          col("n_chars"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
        .orderBy("source", "bucket"),
      Some("""SELECT source, CAST(LEAST(n_chars // 200, 9) AS INTEGER) AS bucket,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM documents GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin)),

    // End-to-end corpus dedup: duplicate pairs → connected components
    // (iterative min-label propagation) → drop every non-representative.
    // Ground truth: the min-id representative per distinct text — the
    // oracle computes it from the ORIGINAL table (injected copies can
    // never be representatives: their ids are original + max id). Phrased
    // as a GROUP BY, not `SELECT *`, because real corpora contain
    // NATURAL exact duplicates too (sf0.1 has 8) and the pipeline
    // rightly merges them.
    Q("dd_pipeline",
      (s, dir) => {
        val corpus = dupCorpus(s, dir)
        // pair on the md5 fingerprint, not the text: the shuffle carries
        // 16-byte keys instead of whole documents
        val a = corpus.select(col("doc_id").as("id_a"), md5(col("text")).as("fp"))
        val b = corpus.select(col("doc_id").as("id_b"), md5(col("text")).as("fp"))
        val pairs = a.join(b, Seq("fp")).where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
        Dedup.dedupByPairs(corpus, "doc_id", pairs).orderBy("doc_id")
      },
      Some("""SELECT min(doc_id) AS doc_id, text FROM documents
             |GROUP BY text ORDER BY doc_id""".stripMargin)),

    // Provenance-preserving dedup ([[Dedup.dedupWithProvenance]]):
    // every kept representative carries its component's member count
    // and merged source list — the licensing audit trail dedup
    // normally destroys. Injected copies arrive under source 'mirror',
    // so merged multi-source provenance provably survives.
    Q("dd_provenance",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"), col("source"))
        val off = d.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
        val corpus = d.unionByName(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + off).as("doc_id"), col("text"),
            lit("mirror").as("source")))
        val a = corpus.select(col("doc_id").as("id_a"), md5(col("text")).as("fp"))
        val b = corpus.select(col("doc_id").as("id_b"), md5(col("text")).as("fp"))
        val pairs = a.join(b, Seq("fp")).where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
        Dedup.dedupWithProvenance(corpus, "doc_id", pairs, Seq("source"))
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (SELECT doc_id, text, source FROM documents
             |           UNION ALL
             |           SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
             |                  text, 'mirror' AS source
             |           FROM documents WHERE doc_id % 5 = 0)
             |SELECT min(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_members,
             |       array_to_string(list_sort(list_distinct(list(source))), ',') AS sources
             |FROM corpus GROUP BY text ORDER BY doc_id""".stripMargin)),

    // Quality-aware dedup ([[Dedup.dedupByPairsKeepBest]]): one
    // representative per exact-dup component, keeping the member with
    // the highest quality score (ties → min id) instead of blind
    // min-id — production curation keeps the BEST copy, not the first
    // crawled. The injected score (doc_id % 7) makes the kept member
    // provably differ from min-id on most components, so the policy
    // itself is what the oracle hashes.
    Q("dd_keep_best",
      (s, dir) => {
        val scored = dupCorpus(s, dir)
          .withColumn("quality", (col("doc_id") % 7).cast("bigint"))
        val a = scored.select(col("doc_id").as("id_a"), md5(col("text")).as("fp"))
        val b = scored.select(col("doc_id").as("id_b"), md5(col("text")).as("fp"))
        val pairs = a.join(b, Seq("fp")).where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
        Dedup.dedupByPairsKeepBest(scored, "doc_id", pairs, "quality")
          .orderBy("doc_id")
      },
      Some(s"""WITH $dupCorpusSql,
              |scored AS (SELECT doc_id, text, CAST(doc_id % 7 AS BIGINT) AS quality
              |           FROM corpus)
              |SELECT doc_id, text, quality FROM (
              |  SELECT doc_id, text, quality,
              |         row_number() OVER (PARTITION BY text
              |                            ORDER BY quality DESC, doc_id) AS rn
              |  FROM scored)
              |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination: corpus docs sharing ≥10 5-gram
    // shingles with an "eval set" (docs 0-4). The corpus gets INJECTED
    // contaminated copies (+200000 ids) so the operator provably
    // detects leakage; natural high-overlap docs surface too.
    Q("dd_contamination",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val bench = d.filter(col("doc_id") < 5)
        val corpus = d.filter(col("doc_id") >= 5)
          .unionByName(bench.select((col("doc_id") + 200000).as("doc_id"), col("text")))
        Dedup.contamination(corpus, bench, "doc_id", "text", n = 5, minShared = 10)
          .orderBy("doc_id", "bench_id")
      },
      Some(s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id >= 5
              |                UNION ALL
              |                SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id < 5),
              |ctok AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM corpus),
              |csh AS (SELECT doc_id,
              |          unnest(list_distinct(list_transform(range(1, len(toks) - 3),
              |            i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS sh
              |        FROM ctok WHERE len(toks) >= 5),
              |btok AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM documents WHERE doc_id < 5),
              |bsh AS (SELECT doc_id AS bench_id,
              |          unnest(list_distinct(list_transform(range(1, len(toks) - 3),
              |            i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS sh
              |        FROM btok WHERE len(toks) >= 5)
              |SELECT doc_id, bench_id, count(*) AS n_shared
              |FROM csh JOIN bsh USING (sh)
              |GROUP BY 1, 2 HAVING count(*) >= 10
              |ORDER BY doc_id, bench_id""".stripMargin)),

    // Semantic (embedding-space) dedup, SemDeDup shape: cluster-scoped
    // cosine domination — a vector is dropped when a smaller-id member
    // of ITS CELL matches at cosine ≥ 0.99. Injected exact copies
    // (vec_id%5, +100000) share their original's cell with cosine 1.0,
    // so the operator provably removes them; the oracle replays the
    // full assignment + within-cell pair discovery in SQL.
    // INCREMENTAL semantic dedup ([[Similarity
    // .semanticDedupIncremental]]): a new batch is admitted against
    // the committed corpus — batch vectors dominated by a corpus
    // member (injected exact copies of corpus vectors prove the
    // cross-set path) or by a smaller-id batch member (injected
    // batch-internal copies prove that path) in the same cell are
    // dropped; the corpus is never re-paired with itself, and only
    // its TOUCHED cells' vectors join the batch. The daily-ingestion
    // cost shape: batch × cell density, never corpus².
    Q("dd_semantic_incremental",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val off = emb.agg(coalesce(max("vec_id"), lit(0L))).head.getLong(0) + 1
        val corpus = emb.filter(col("vec_id") % 4 =!= 0)
        val batch = emb.filter(col("vec_id") % 4 === 0)
          .unionByName(corpus.filter(col("vec_id") % 6 === 1)
            .select((col("vec_id") + off).as("vec_id"), col("embedding")))
          .unionByName(emb.filter(col("vec_id") % 8 === 0)
            .select((col("vec_id") + off * 2).as("vec_id"), col("embedding")))
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        Similarity.semanticDedupIncremental(corpus, batch, "embedding", "vec_id",
          cents, "c_vec", "c_id", minCosine = 0.99)
          .orderBy("vec_id")
      },
      Some(s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 <> 0),
              |off AS (SELECT MAX(vec_id) + 1 AS o FROM embeddings),
              |batch AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0
              |          UNION ALL
              |          SELECT vec_id + (SELECT o FROM off), embedding FROM corpus WHERE vec_id % 6 = 1
              |          UNION ALL
              |          SELECT vec_id + 2 * (SELECT o FROM off), embedding
              |          FROM embeddings WHERE vec_id % 8 = 0),
              |cents AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8),
              |bc AS (SELECT vec_id, embedding, c_id AS centroid_id FROM (
              |         SELECT b.vec_id, b.embedding, c.c_id,
              |                row_number() OVER (PARTITION BY b.vec_id ORDER BY
              |                  ${Similarity.cosineSql("b.embedding", "c.c_vec")} DESC, c.c_id) AS rn
              |         FROM batch b CROSS JOIN cents c) WHERE rn = 1),
              |cc AS (SELECT vec_id, embedding, c_id AS centroid_id FROM (
              |         SELECT e.vec_id, e.embedding, c.c_id,
              |                row_number() OVER (PARTITION BY e.vec_id ORDER BY
              |                  ${Similarity.cosineSql("e.embedding", "c.c_vec")} DESC, c.c_id) AS rn
              |         FROM corpus e CROSS JOIN cents c) WHERE rn = 1),
              |dom AS (
              |  SELECT DISTINCT b.vec_id FROM cc a JOIN bc b USING (centroid_id)
              |  WHERE ${Similarity.cosineSql("a.embedding", "b.embedding")} >= 0.99
              |  UNION
              |  SELECT DISTINCT b.vec_id FROM bc a JOIN bc b USING (centroid_id)
              |  WHERE a.vec_id < b.vec_id
              |    AND ${Similarity.cosineSql("a.embedding", "b.embedding")} >= 0.99)
              |SELECT vec_id, centroid_id FROM bc
              |WHERE vec_id NOT IN (SELECT vec_id FROM dom)
              |ORDER BY vec_id""".stripMargin)),

    Q("dd_semantic",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val off = emb.agg(coalesce(max("vec_id"), lit(0L))).head.getLong(0) + 1
        val corpus = emb.unionByName(emb.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + off).as("vec_id"), col("embedding")))
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        Similarity.semanticDedup(corpus, "embedding", "vec_id", cents, "c_vec", "c_id",
          minCosine = 0.99)
          .orderBy("vec_id")
      },
      Some(s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings
              |                UNION ALL
              |                SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id, embedding
              |                FROM embeddings WHERE vec_id % 5 = 0),
              |cents AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8),
              |j AS (SELECT e.vec_id, e.embedding, c.c_id,
              |             ${Similarity.cosineSql("e.embedding", "c.c_vec")} AS cosine
              |      FROM corpus e CROSS JOIN cents c),
              |cells AS (SELECT vec_id, embedding, c_id AS centroid_id FROM (
              |            SELECT vec_id, embedding, c_id,
              |                   row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS rn
              |            FROM j) WHERE rn = 1),
              |dom AS (SELECT DISTINCT b.vec_id FROM cells a JOIN cells b USING (centroid_id)
              |        WHERE a.vec_id < b.vec_id
              |          AND ${Similarity.cosineSql("a.embedding", "b.embedding")} >= 0.99)
              |SELECT vec_id, centroid_id FROM cells
              |WHERE NOT EXISTS (SELECT 1 FROM dom WHERE dom.vec_id = cells.vec_id)
              |ORDER BY vec_id""".stripMargin)),

    // ── Text analysis ──────────────────────────────────────────────────

    // Per-document stats: token/stopword counts, quality score,
    // language ID, exact + bag-of-words fingerprints, rolling hash.
    // Pure codegen'd expressions — zero shuffles, scales linearly.
    Q("t_text_stats",
      (s, dir) => TextOps.textStats(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tokens,
              |  ${TextOps.bpeishTokenCountSql("text")} AS n_bpe,
              |  ${TextOps.stopwordCountSql("text")} AS n_stop,
              |  ${TextOps.qualityScoreSql("text")} AS quality,
              |  ${TextOps.langIdSql("text")} AS lang_guess,
              |  md5(text) AS fp_exact,
              |  md5(array_to_string(list_sort(${TextOps.tokensSql("text")}), ' ')) AS fp_bag,
              |  ${TextOps.rollingHashSql("text")} AS roll_hash
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Vocabulary / document-frequency: explode distinct tokens per doc,
    // count docs per token, keep the head of the distribution — the
    // term-frequency pass every corpus pipeline starts with.
    Q("t_term_freq",
      (s, dir) => Tables.documents(s, dir)
        .select(explode(array_distinct(TextOps.tokens(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("token"))
        .limit(30),
      Some(s"""SELECT token, count(*) AS doc_freq
              |FROM (SELECT unnest(list_distinct(${TextOps.tokensSql("text")})) AS token
              |      FROM documents)
              |GROUP BY token ORDER BY doc_freq DESC, token LIMIT 30""".stripMargin)),

    // Sentence-level quality stats ([[TextOps.sentenceCount]]):
    // sentences per doc and mean words-per-sentence — the Gopher-style
    // signal token counts can't see (spam skews short, OCR noise
    // absurdly long). Zero-sentence docs score NULL, not ÷0. Pure
    // projections over one scan; exact integers + one division.
    Q("t_sentence_stats",
      (s, dir) => Tables.documents(s, dir)
        .filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"),
          TextOps.sentenceCount(col("text")).as("n_sentences"),
          TextOps.tokenCount(col("text")).as("n_tokens"))
        .withColumn("words_per_sentence",
          when(col("n_sentences") === 0, lit(null).cast("double"))
            .otherwise(col("n_tokens").cast("double") / col("n_sentences").cast("double")))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, n_sentences, n_tokens,
              |       CASE WHEN n_sentences = 0 THEN NULL
              |            ELSE CAST(n_tokens AS DOUBLE) / CAST(n_sentences AS DOUBLE)
              |       END AS words_per_sentence
              |FROM (SELECT doc_id,
              |        ${TextOps.sentenceCountSql("text")} AS n_sentences,
              |        CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tokens
              |      FROM documents WHERE doc_id % 20 = 0)
              |ORDER BY doc_id""".stripMargin)),

    // BPE merge-candidate counting ([[TextOps.charPairs]]) — the first
    // round of byte-pair-encoding vocabulary induction: count every
    // adjacent character pair over every token occurrence and rank the
    // merge candidates. Two explodes (pure projections) + ONE keyed
    // aggregate with map-side partials; the top-k is a partial
    // per-partition top-k + merge, never a global sort of all pairs.
    Q("t_bpe_pairs",
      (s, dir) => Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .filter(char_length(col("w")) >= 2)
        .select(explode(TextOps.charPairs(col("w"))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(40),
      Some(s"""SELECT pair, count(*) AS cnt FROM (
              |  SELECT unnest(${TextOps.charPairsSql("w")}) AS pair
              |  FROM (SELECT unnest(${TextOps.tokensSql("text")}) AS w FROM documents)
              |  WHERE length(w) >= 2)
              |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 40""".stripMargin)),

    // BPE vocabulary induction end-to-end ([[TextOps.bpeTrain]]): the
    // corpus is scanned ONCE into a word-frequency table; every merge
    // iteration runs on that corpus-sublinear table (the HuggingFace/
    // SentencePiece training shape — the reason BPE training is
    // feasible at 100 TB at all). The oracle re-derives the same merge
    // table with the SAME unrolled iterations in DuckDB: identical
    // leftmost-replace merge application, identical (count DESC, pair)
    // tie-break — the learned vocabulary is hash-verified, not just
    // row-counted.
    Q("t_bpe_train",
      (s, dir) => {
        val merges = TextOps.bpeTrain(Tables.documents(s, dir), "text", BpeMerges)
        import s.implicits._
        merges.map { case (r, p, c) => (r.toLong, p, c) }
          .toDF("rank", "pair", "cnt").orderBy("rank")
      },
      Some(s"""WITH ${bpeCtes(BpeMerges)}
              |SELECT rank, pair, cnt FROM (${
                 (1 to BpeMerges).map(i =>
                   s"SELECT CAST($i AS BIGINT) AS rank, pr AS pair, cnt FROM m$i")
                   .mkString(" UNION ALL ")})
              |ORDER BY rank""".stripMargin)),

    // BPE corpus encoding with the trained merges ([[TextOps.
    // bpeEncodeTokens]]): training's K scalar collects hand the merge
    // list to the driver, and encoding is then a PURE projection (the
    // merges ride the plan as literals) — tokenizing the full corpus
    // is one shuffle-free scan, the property that makes retokenization
    // a cheap pipeline stage rather than a second aggregation. Output
    // per sampled doc: exact encoded-token count + an encoded prefix;
    // the oracle re-trains in-query and encodes identically.
    Q("t_bpe_encode",
      (s, dir) => {
        val merges = TextOps.bpeTrain(Tables.documents(s, dir), "text", BpeMerges)
        Tables.documents(s, dir).filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"),
            TextOps.bpeEncodeTokens(col("text"), merges.map(_._2)).as("encs"))
          .select(col("doc_id"),
            aggregate(col("encs"), lit(0L),
              (acc, e) => acc + size(split(e, " ")).cast(LongType)).as("n_bpe"),
            substring(concat_ws(" | ", col("encs")), 1, 120).as("enc_prefix"))
          .orderBy("doc_id")
      },
      Some {
        val chain = (1 to BpeMerges).foldLeft(TextOps.spacedCharsSql("t")) {
          (sp, i) => TextOps.applyMergeSql(sp, s"m$i.pr")
        }
        s"""WITH ${bpeCtes(BpeMerges)}
           |SELECT doc_id,
           |  CAST(coalesce(list_sum(list_transform(encs, e -> len(string_split(e, ' ')))), 0) AS BIGINT) AS n_bpe,
           |  substr(array_to_string(encs, ' | '), 1, 120) AS enc_prefix
           |FROM (SELECT doc_id, list_transform(${TextOps.tokensSql("text")}, t -> $chain) AS encs
           |      FROM documents, ${(1 to BpeMerges).map("m" + _).mkString(", ")}
           |      WHERE doc_id % 7 = 0)
           |ORDER BY doc_id""".stripMargin
      }),

    // Substring-level duplication spans ([[Dedup.substringSpans]]):
    // character-granular dedup à la Lee et al. — maximal spans covered
    // by any 24-char substring occurring elsewhere in the corpus, per
    // doc, with the covered fraction. The only shuffle is keyed on the
    // gram and feeds a COUNT (never a pair join), so a million-fold
    // repeated passage is one group, not 10¹² pairs; span assembly is
    // a per-doc gaps-and-islands window. Finds the duplicated PASSAGE
    // inside an otherwise-novel document — the trim-don't-drop case
    // document-level Jaccard can't see.
    Q("dd_substring_spans",
      (s, dir) => Dedup.substringSpans(Tables.documents(s, dir), "doc_id", "text", 24)
        .orderBy("doc_id"),
      Some {
        val K = 24
        s"""WITH grams AS (
           |  SELECT doc_id, CAST(i AS INT) AS pos,
           |         CAST(('0x' || substr(md5(substr(text, CAST(i AS INT), $K)), 1, 15)) AS BIGINT) AS h
           |  FROM documents, unnest(range(1, greatest(length(text) - ${K - 1}, 0) + 1)) AS t(i)),
           |duph AS (SELECT h FROM grams GROUP BY h HAVING count(*) > 1),
           |duppos AS (SELECT doc_id, pos FROM grams WHERE h IN (SELECT h FROM duph)),
           |marked AS (SELECT doc_id, pos,
           |    max(pos + ${K - 1}) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
           |  FROM duppos),
           |isl AS (SELECT doc_id, pos,
           |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
           |  FROM marked),
           |spans AS (SELECT doc_id, island,
           |    CAST(max(pos + ${K - 1}) - min(pos) + 1 AS BIGINT) AS span_chars
           |  FROM isl GROUP BY 1, 2),
           |perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           |    CAST(sum(span_chars) AS BIGINT) AS dup_chars FROM spans GROUP BY 1)
           |SELECT d.doc_id, CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
           |       CAST(coalesce(dup_chars, 0) AS BIGINT) AS dup_chars,
           |       CAST(length(text) AS BIGINT) AS n_chars,
           |       CASE WHEN length(text) = 0 THEN 0.0
           |            ELSE CAST(coalesce(dup_chars, 0) AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS dup_frac
           |FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY doc_id""".stripMargin
      }),

    // HIERARCHICAL doc → paragraph → line dedup — the production
    // curation CHAIN as one composed query (r15 verdict item 7b; the
    // pieces existed as independent operators, the chaining did not):
    // stage 1 drops exact-duplicate DOCUMENTS (md5 of the full token
    // stream, keep the min id); stage 2 segments the SURVIVORS into
    // 32-token paragraphs and keeps only each paragraph hash's FIRST
    // occurrence (min (doc_id, pidx)); stage 3 segments the kept
    // paragraphs into 8-token lines and dedups those the same way —
    // each stage runs on the PREVIOUS stage's survivors, which is what
    // makes it the curation pipeline rather than three reports. The
    // planted corpus exercises all three stages: full copies of every
    // %5 doc (stage-1 kills), paragraph chimeras of every %7 doc
    // (first 32 tokens borrowed + the rest reversed — stage-2 kills
    // paragraph 0), line borrowers of every %11 doc (first 8 tokens
    // borrowed + rest reversed — stage-3 kills line 0). Scale: every
    // stage is an exact-hash groupBy/window keyed on the hash —
    // corpus-linear, no pair enumeration anywhere; at 100 TB this is
    // three shuffles on hash keys plus per-doc segmentation maps.
    // Output: per surviving doc, paragraph/line survival and the kept
    // token mass.
    Q("dd_hierarchical",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val (corpus, _) = hierCorpusOff(s, dir)
        val toks = corpus.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"),
          md5(concat_ws(" ", TextOps.tokens(col("text")))).as("dh"))
        val keep1 = toks.groupBy("dh").agg(min("doc_id").as("doc_id"))
        val d1 = toks.join(keep1, Seq("dh", "doc_id"), "left_semi")
          .localCheckpoint() // stage-1 survivors feed paras AND the final join
        // GREATEST(·, 1) clamp: an empty token array would make
        // sequence(0, -1) yield [0, -1] (two phantom slices) where the
        // mirror's range(0, 0) yields none — clamped, an empty doc
        // segments to exactly ONE empty paragraph in both engines
        val paras = d1.select(col("doc_id"), posexplode(expr(segSlices("toks", 32))))
          .select(col("doc_id"), col("pos").as("pidx"), col("col").as("pt"))
          .withColumn("ph", md5(concat_ws(" ", col("pt"))))
        val pKeep = paras.withColumn("__rn", row_number().over(
            Window.partitionBy("ph").orderBy("doc_id", "pidx")))
          .withColumn("p_kept", col("__rn") === 1).drop("__rn")
          .localCheckpoint() // feeds the per-doc rollup AND the line stage
        val lines = pKeep.filter(col("p_kept"))
          .select(col("doc_id"), col("pidx"), posexplode(expr(segSlices("pt", 8))))
          .select(col("doc_id"), col("pidx"), col("pos").as("lidx"), col("col").as("lt"))
          .withColumn("lh", md5(concat_ws(" ", col("lt"))))
        val lKeep = lines.withColumn("__rn", row_number().over(
            Window.partitionBy("lh").orderBy("doc_id", "pidx", "lidx")))
          .withColumn("l_kept", col("__rn") === 1).drop("__rn")
        val pAgg = pKeep.groupBy("doc_id").agg(
          count(lit(1)).as("n_para"),
          sum(when(col("p_kept"), 1L).otherwise(0L)).as("n_para_kept"))
        val lAgg = lKeep.groupBy("doc_id").agg(
          count(lit(1)).as("n_line"),
          sum(when(col("l_kept"), 1L).otherwise(0L)).as("n_line_kept"),
          sum(when(col("l_kept"), size(col("lt")).cast(LongType)).otherwise(0L))
            .as("tok_kept"))
        d1.select(col("doc_id"), size(col("toks")).cast(LongType).as("tok_total"))
          .join(pAgg, Seq("doc_id"), "left")
          .join(lAgg, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_para"), lit(0L)).as("n_para"),
            coalesce(col("n_para_kept"), lit(0L)).as("n_para_kept"),
            coalesce(col("n_line"), lit(0L)).as("n_line"),
            coalesce(col("n_line_kept"), lit(0L)).as("n_line_kept"),
            col("tok_total"),
            coalesce(col("tok_kept"), lit(0L)).as("tok_kept"))
          .orderBy("doc_id")
      },
      Some(hierChainOracleSql)),

    // INCREMENTAL twin of dd_hierarchical — the streaming-admission
    // form of the doc → paragraph → line chain (verdict-7 march; the
    // incremental-exact machinery generalized to the composed chain):
    // the MAINTAINED state from yesterday's ingest is the base chain's
    // output plus three exact-hash indexes (doc hashes of every base
    // doc; paragraph hashes of base survivors; line hashes of base
    // kept paragraphs — each staged per JVM, the once-per-ingest
    // artifact). Today's batch — every planted replica, all with
    // HIGHER ids (stream order) — probes the indexes: a doc whose hash
    // is indexed dies at stage 1, a paragraph whose hash is indexed is
    // never kept, a line likewise; first-occurrence WITHIN the batch
    // resolves the rest. Because keeper order is ascending
    // (doc_id, pidx, lidx) and base ids precede batch ids, a later
    // batch can never steal a keep from the maintained state — so
    // streamed ≡ batch EXACTLY, and the oracle is dd_hierarchical's
    // own full-batch SQL, unchanged. Per-batch cost: batch-linear
    // segmentation + three hash-key joins against the indexes — the
    // table is never re-deduped.
    Q("dd_hierarchical_incremental",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val (corpus, off) = hierCorpusOff(s, dir)
        def withHash(c: DataFrame) = c.select(col("doc_id"),
          TextOps.tokens(col("text")).as("toks"),
          md5(concat_ws(" ", TextOps.tokens(col("text")))).as("dh"))
        def paraSeg(d1: DataFrame) = d1
          .select(col("doc_id"), posexplode(expr(segSlices("toks", 32))))
          .select(col("doc_id"), col("pos").as("pidx"), col("col").as("pt"))
          .withColumn("ph", md5(concat_ws(" ", col("pt"))))
        def lineSeg(pKept: DataFrame) = pKept.filter(col("p_kept"))
          .select(col("doc_id"), col("pidx"), posexplode(expr(segSlices("pt", 8))))
          .select(col("doc_id"), col("pidx"), col("pos").as("lidx"), col("col").as("lt"))
          .withColumn("lh", md5(concat_ws(" ", col("lt"))))
        def rollup(d1: DataFrame, pKeep: DataFrame, lKeep: DataFrame) = {
          val pAgg = pKeep.groupBy("doc_id").agg(
            count(lit(1)).as("n_para"),
            sum(when(col("p_kept"), 1L).otherwise(0L)).as("n_para_kept"))
          val lAgg = lKeep.groupBy("doc_id").agg(
            count(lit(1)).as("n_line"),
            sum(when(col("l_kept"), 1L).otherwise(0L)).as("n_line_kept"),
            sum(when(col("l_kept"), size(col("lt")).cast(LongType)).otherwise(0L))
              .as("tok_kept"))
          d1.select(col("doc_id"), size(col("toks")).cast(LongType).as("tok_total"))
            .join(pAgg, Seq("doc_id"), "left")
            .join(lAgg, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("n_para"), lit(0L)).as("n_para"),
              coalesce(col("n_para_kept"), lit(0L)).as("n_para_kept"),
              coalesce(col("n_line"), lit(0L)).as("n_line"),
              coalesce(col("n_line_kept"), lit(0L)).as("n_line_kept"),
              col("tok_total"),
              coalesce(col("tok_kept"), lit(0L)).as("tok_kept"))
        }
        // ---- maintained state (per-JVM staged base chain + indexes) —
        // the incremental run READS this, it does not pay it ----
        def baseChain() = {
          val toksB = withHash(corpus.filter(col("doc_id") < off))
          val keep1B = toksB.groupBy("dh").agg(min("doc_id").as("doc_id"))
          val d1B = toksB.join(keep1B, Seq("dh", "doc_id"), "left_semi")
          val pKeepB = paraSeg(d1B).withColumn("__rn", row_number().over(
              Window.partitionBy("ph").orderBy("doc_id", "pidx")))
            .withColumn("p_kept", col("__rn") === 1).drop("__rn")
          val lKeepB = lineSeg(pKeepB).withColumn("__rn", row_number().over(
              Window.partitionBy("lh").orderBy("doc_id", "pidx", "lidx")))
            .withColumn("l_kept", col("__rn") === 1).drop("__rn")
          (toksB, d1B, pKeepB, lKeepB)
        }
        val baseOut = cachedNnGraph(s, dir, "hier_base_out") {
          val (_, d1B, pKeepB, lKeepB) = baseChain(); rollup(d1B, pKeepB, lKeepB)
        }
        val dhIdx = cachedNnGraph(s, dir, "hier_idx_dh") {
          baseChain()._1.select("dh").distinct()
        }
        val phIdx = cachedNnGraph(s, dir, "hier_idx_ph") {
          baseChain()._3.select("ph").distinct()
        }
        val lhIdx = cachedNnGraph(s, dir, "hier_idx_lh") {
          baseChain()._4.select("lh").distinct()
        }
        // ---- today's batch: probe the indexes, dedup within batch ----
        val toksD = withHash(corpus.filter(col("doc_id") >= off))
        val keep1D = toksD.join(dhIdx, Seq("dh"), "left_anti")
          .groupBy("dh").agg(min("doc_id").as("doc_id"))
        val d1D = toksD.join(keep1D, Seq("dh", "doc_id"), "left_semi")
          .localCheckpoint() // feeds paras AND the final rollup join
        val pKeepD = paraSeg(d1D)
          .withColumn("__rn", row_number().over(
            Window.partitionBy("ph").orderBy("doc_id", "pidx")))
          .join(phIdx.withColumn("__inb", lit(true)), Seq("ph"), "left")
          .withColumn("p_kept", col("__rn") === 1 && col("__inb").isNull)
          .drop("__rn", "__inb")
          .localCheckpoint() // feeds the rollup AND the line stage
        val lKeepD = lineSeg(pKeepD)
          .withColumn("__rn", row_number().over(
            Window.partitionBy("lh").orderBy("doc_id", "pidx", "lidx")))
          .join(lhIdx.withColumn("__inb", lit(true)), Seq("lh"), "left")
          .withColumn("l_kept", col("__rn") === 1 && col("__inb").isNull)
          .drop("__rn", "__inb")
        baseOut.unionByName(rollup(d1D, pKeepD, lKeepD)).orderBy("doc_id")
      },
      Some(hierChainOracleSql)),

    // Matryoshka-prefix retrieval fidelity ([[Similarity]] slicing):
    // rank the corpus by cosine on the FULL 64-dim embedding and on
    // its 16-dim PREFIX (the matryoshka-representation deployment
    // trade: 4× less memory/bandwidth per probe), and report per query
    // how much of the full-dim top-10 the prefix ranking preserves.
    // One broadcast of the query rows, both cosines in the same
    // codegen'd pass, two rank windows per query key — the measured
    // answer to "can the first-stage retriever run on truncated
    // vectors", hash-verified end to end.
    Q("sim_matryoshka",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        val scored = emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            Similarity.cosine(col("embedding"), col("qv")).as("cos_full"),
            Similarity.cosine(slice(col("embedding"), 1, 16),
              slice(col("qv"), 1, 16)).as("cos_pre"))
        val wf = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_full").desc, col("vec_id"))
        val wp = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_pre").desc, col("vec_id"))
        scored
          .withColumn("r_full", row_number().over(wf))
          .withColumn("r_pre", row_number().over(wp))
          .groupBy(col("q_id"))
          .agg(count(when(col("r_full") <= 10 && col("r_pre") <= 10, lit(1)))
            .as("overlap10"))
          .orderBy("q_id")
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 4),
              |scored AS (SELECT q_id, vec_id,
              |    ${Similarity.cosineSql("e.embedding", "q.qv")} AS cos_full,
              |    ${Similarity.cosineSql("e.embedding[1:16]", "q.qv[1:16]")} AS cos_pre
              |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id),
              |ranked AS (SELECT q_id, vec_id,
              |    row_number() OVER (PARTITION BY q_id ORDER BY cos_full DESC, vec_id) AS r_full,
              |    row_number() OVER (PARTITION BY q_id ORDER BY cos_pre DESC, vec_id) AS r_pre
              |  FROM scored)
              |SELECT q_id, CAST(count(CASE WHEN r_full <= 10 AND r_pre <= 10 THEN 1 END) AS BIGINT) AS overlap10
              |FROM ranked GROUP BY q_id ORDER BY q_id""".stripMargin)),

    // In-engine classifier training ([[graft.ops.Classifier
    // .trainPerceptron]]): a batch perceptron over md5-hashed
    // bag-of-token counts, every quantity an INTEGER so the epoch
    // update Σ_misclassified y·x is associative and exact — the
    // property that makes distributed training DETERMINISTIC where
    // double-gradient descent is partitioning-dependent. Each epoch is
    // one scan of the cached (y, x) projection + a (Dim+2)-column
    // aggregate collected as one row. The output is the full per-epoch
    // weight trajectory (idx −1 carries the epoch's misclassified
    // count), hash-verified against the same integer recurrence
    // unrolled in DuckDB — oracle agreement on every epoch pins the
    // whole computation, not just a final model, INCLUDING the
    // textbook oscillation full-batch updates exhibit on this
    // non-separable target (the Classifier scaladoc's point: the
    // convergent per-sample rule is inherently sequential; the
    // distributed-exact batch rule trades convergence for that —
    // the production-shaped trainer is ml_centroid below).
    Q("ml_perceptron",
      (s, dir) => {
        val tr = graft.ops.Classifier.trainPerceptron(
          Tables.documents(s, dir), "text",
          graft.ops.Classifier.qualityLabel(col("text")), PercEpochs)
        import s.implicits._
        tr.flatMap { ep =>
          (-1L, ep.nMis) +: ep.weights.toSeq.zipWithIndex.map {
            case (wj, j) => (j.toLong, wj)
          } map { case (idx, v) => (ep.epoch.toLong, idx, v) }
        }.toDF("epoch", "idx", "wv").orderBy("epoch", "idx")
      },
      Some(s"""WITH ${percCtes(PercEpochs)}
              |SELECT epoch, idx, wv FROM (${
                 (1 to PercEpochs).flatMap { i =>
                   s"SELECT CAST($i AS BIGINT) AS epoch, CAST(-1 AS BIGINT) AS idx, nmis AS wv FROM w$i" +:
                     (0 until graft.ops.Classifier.Dim + 1).map(j =>
                       s"SELECT CAST($i AS BIGINT), CAST($j AS BIGINT), w_$j FROM w$i")
                 }.mkString(" UNION ALL ")})
              |ORDER BY epoch, idx""".stripMargin)),

    // Nearest-centroid quality classifier ([[graft.ops.Classifier
    // .centroidModel]]): the closed-form, distribution-stable linear
    // probe — TWO integer aggregates (class centroids scaled by class
    // size, then per-class score sums for the midpoint threshold), no
    // iteration, no division, bit-identical in any engine. Output: the
    // scaled centroid-difference weights + class counts, hash-verified
    // against DuckDB deriving the same statistics.
    Q("ml_centroid",
      (s, dir) => {
        val m = graft.ops.Classifier.centroidModel(
          Tables.documents(s, dir), "text",
          graft.ops.Classifier.qualityLabel(col("text")))
        import s.implicits._
        ((-2L, m.nPos) +: (-1L, m.nNeg) +: m.w.toSeq.zipWithIndex.map {
          case (wj, j) => (j.toLong, wj)
        }).toDF("idx", "wv").orderBy("idx")
      },
      Some(s"""WITH ${centroidCtes()}
              |SELECT idx, wv FROM (
              |  SELECT CAST(-2 AS BIGINT) AS idx, npos AS wv FROM st
              |  UNION ALL SELECT CAST(-1 AS BIGINT), nneg FROM st
              |  ${(0 until graft.ops.Classifier.Dim).map(j =>
                   s"UNION ALL SELECT CAST($j AS BIGINT), w_$j FROM w").mkString("\n  ")})
              |ORDER BY idx""".stripMargin)),

    // Centroid-model scoring at corpus scale ([[graft.ops.Classifier
    // .centroidConfusion]]): the trained weights + exact rational
    // threshold ride the plan as literals, so inference is a pure
    // shuffle-free projection + one tiny grouped count — the
    // quality-gate deployment shape (score 100 TB in a single scan).
    // The decision compares in DECIMAL(38,0)/HUGEINT space because the
    // cross-multiplied threshold carries an n³ factor that would wrap
    // BIGINT on a large corpus. Hash-checked against DuckDB
    // re-deriving the same model and predictions end-to-end.
    Q("ml_centroid_eval",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val label = graft.ops.Classifier.qualityLabel(col("text"))
        val m = graft.ops.Classifier.centroidModel(docs, "text", label)
        graft.ops.Classifier.centroidConfusion(docs, "text", label, m)
          .orderBy("label", "predicted")
      },
      Some(s"""WITH ${centroidCtes()}
              |SELECT y AS label,
              |       CASE WHEN CAST(2 AS HUGEINT) * npos * nneg * CAST(s AS HUGEINT)
              |                 > CAST(nneg AS HUGEINT) * spos + CAST(npos AS HUGEINT) * sneg
              |            THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS predicted,
              |       CAST(count(*) AS BIGINT) AS n
              |FROM scored, w, cls
              |GROUP BY 1, 2 ORDER BY label, predicted""".stripMargin)),

    // Order-independent corpus CHECKSUM: per source, the bitwise XOR
    // of each document's 60-bit md5 reduction — associative,
    // commutative, overflow-free, so the checksum is identical at any
    // partitioning/order and across engines: the cheap "are these two
    // corpora THE SAME" audit primitive for pipeline handoffs (a
    // changed/dropped/duplicated doc flips it; XOR's self-inverse
    // means a doc added twice cancels — pair it with n_docs, which
    // catches exactly that). One narrow map-side-combined aggregate.
    Q("t_corpus_checksum",
      (s, dir) => Tables.documents(s, dir)
        .select(col("source"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)").as("h"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), expr("bit_xor(h)").as("checksum"))
        .orderBy("source"),
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)) AS BIGINT)
             |         AS checksum
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Classifier CALIBRATION curve (reliability diagram): corpus
    // ranked by the centroid model's exact integer score, cut into
    // score deciles (ntile over the (score, id) total order —
    // deterministic), each reporting its size and positive rate. The
    // eval that tells you whether higher score actually MEANS more
    // positive — the quality-gate threshold picker. The global ntile
    // sort is eval-only; at 100 TB rank via bucketed prefix sums like
    // ml_auc (same statistic, O(buckets) state).
    Q("ml_calibration",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val label = graft.ops.Classifier.qualityLabel(col("text"))
        val m = graft.ops.Classifier.centroidModel(docs, "text", label)
        graft.ops.Classifier.centroidScores(docs, "doc_id", "text", label, m)
          .withColumn("decile",
            ntile(10).over(Window.orderBy(col("s"), col("id"))).cast(LongType))
          .groupBy("decile")
          .agg(count(lit(1)).as("n"),
            count(when(col("y") === 1, lit(1))).as("n_pos"))
          .select(col("decile"), col("n"), col("n_pos"),
            (col("n_pos").cast(DoubleType) / col("n").cast(DoubleType)).as("pos_rate"))
          .orderBy("decile")
      },
      Some(s"""WITH ${centroidCtes()},
              |ranked AS (SELECT y, ntile(10) OVER (ORDER BY s, doc_id) AS decile
              |           FROM scored)
              |SELECT CAST(decile AS BIGINT) AS decile, CAST(count(*) AS BIGINT) AS n,
              |       CAST(count(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS n_pos,
              |       CAST(count(CASE WHEN y = 1 THEN 1 END) AS DOUBLE)
              |         / CAST(count(*) AS DOUBLE) AS pos_rate
              |FROM ranked GROUP BY decile ORDER BY decile""".stripMargin)),

    // Precision-recall curve at 20 bucketed thresholds (the companion
    // to ml_auc/ml_calibration): bucket 1 = highest scores; predicting
    // positive for buckets ≤ b gives cumulative exact TP/N counts, so
    // every precision/recall point is two integer divisions — the
    // operating-point picker for a quality gate (choose recall, read
    // off precision).
    Q("ml_pr_curve",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val label = graft.ops.Classifier.qualityLabel(col("text"))
        val m = graft.ops.Classifier.centroidModel(docs, "text", label)
        val sc = graft.ops.Classifier.centroidScores(docs, "doc_id", "text", label, m)
          .withColumn("b",
            ntile(20).over(Window.orderBy(col("s").desc, col("id"))).cast(LongType))
        val per = sc.groupBy("b")
          .agg(count(lit(1)).as("n"),
            count(when(col("y") === 1, lit(1))).as("n_pos"))
        val w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = per.agg(sum("n_pos").as("p")).select(col("p"))
        per.withColumn("cum_n", sum("n").over(w))
          .withColumn("cum_pos", sum("n_pos").over(w))
          .crossJoin(broadcast(tot))
          .select(col("b"), col("cum_n"), col("cum_pos"),
            (col("cum_pos").cast(DoubleType) / col("cum_n").cast(DoubleType))
              .as("precision"),
            when(col("p") === 0, lit(null).cast(DoubleType))
              .otherwise(col("cum_pos").cast(DoubleType) / col("p").cast(DoubleType))
              .as("recall"))
          .orderBy("b")
      },
      Some(s"""WITH ${centroidCtes()},
              |bk AS (SELECT y, ntile(20) OVER (ORDER BY s DESC, doc_id) AS b FROM scored),
              |per AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
              |               CAST(count(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS n_pos
              |        FROM bk GROUP BY b),
              |tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS p FROM per),
              |cum AS (SELECT b, n, n_pos,
              |          SUM(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum_n,
              |          SUM(n_pos) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum_pos
              |        FROM per)
              |SELECT CAST(b AS BIGINT) AS b, CAST(cum_n AS BIGINT) AS cum_n,
              |       CAST(cum_pos AS BIGINT) AS cum_pos,
              |       CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE) AS precision,
              |       CASE WHEN p = 0 THEN NULL
              |            ELSE CAST(cum_pos AS DOUBLE) / CAST(p AS DOUBLE) END AS recall
              |FROM cum, tot ORDER BY b""".stripMargin)),

    // Gaps-and-islands streaks: each customer's longest run of
    // CONSECUTIVE order dates — the classic `date − row_number()`
    // island key, exact integers end to end. The engagement-streak /
    // continuity-audit pattern every warehouse eventually writes.
    Q("w_streaks",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderdate").cast(DateType).as("d"))
          .distinct()
        val w = Window.partitionBy("o_custkey").orderBy("d")
        val st = d.withColumn("grp", date_sub(col("d"), row_number().over(w)))
          .groupBy(col("o_custkey"), col("grp"))
          .agg(count(lit(1)).as("len"))
        st.groupBy("o_custkey")
          .agg(max("len").as("max_streak"), count(lit(1)).as("n_streaks"))
          .filter(col("max_streak") >= 2)
          .orderBy("o_custkey")
      },
      Some("""WITH d AS (SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d
             |           FROM orders),
             |g AS (SELECT o_custkey, d,
             |        d - CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY d)
             |                 AS INTEGER) AS grp
             |      FROM d),
             |st AS (SELECT o_custkey, grp, CAST(count(*) AS BIGINT) AS len
             |       FROM g GROUP BY 1, 2)
             |SELECT o_custkey, CAST(MAX(len) AS BIGINT) AS max_streak,
             |       CAST(count(*) AS BIGINT) AS n_streaks
             |FROM st GROUP BY o_custkey HAVING MAX(len) >= 2
             |ORDER BY o_custkey""".stripMargin)),

    // Windowed co-occurrence with ln-free lift ([[TextOps.
    // cooccurrence]]): directional token pairs at distance ≤ 2, scored
    // by exp(PMI) = T·c_wv/(c_w·c_v) — same ranking as PMI with zero
    // libm risk; pair stream is per-doc-local array projections (no
    // corpus self-join), counts vocabulary-bounded. Top-50 by support.
    Q("t_cooccurrence",
      (s, dir) => TextOps.cooccurrence(Tables.documents(s, dir),
          "doc_id", "text", maxDist = 2)
        .orderBy(col("n_pair").desc, col("pair"))
        .limit(50),
      Some(s"""WITH tok AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS t FROM documents),
              |pr AS (SELECT unnest(flatten(list_transform(range(1, 3), d ->
              |         list_transform(range(1, len(t) - d + 1),
              |           i -> t[i] || ' ' || t[i + d])))) AS pair
              |       FROM tok),
              |pc AS (SELECT pair, count(*) AS n_pair,
              |              string_split(pair, ' ')[1] AS w,
              |              string_split(pair, ' ')[2] AS v
              |       FROM pr GROUP BY 1),
              |uni AS (SELECT unnest(t) AS w FROM tok),
              |uc AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
              |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM uc)
              |SELECT pair, CAST(n_pair AS BIGINT) AS n_pair,
              |       CAST(ul.c AS BIGINT) AS n_left, CAST(ur.c AS BIGINT) AS n_right,
              |       CAST(CAST(t AS HUGEINT) * CAST(n_pair AS HUGEINT) AS DOUBLE)
              |       / CAST(CAST(ul.c AS HUGEINT) * CAST(ur.c AS HUGEINT) AS DOUBLE)
              |         AS lift
              |FROM pc JOIN uc ul ON pc.w = ul.w JOIN uc ur ON pc.v = ur.w
              |CROSS JOIN tot
              |ORDER BY n_pair DESC, pair LIMIT 50""".stripMargin)),

    // Higher-moment statistics from EXACT integer power sums: per
    // priority stratum, skewness and excess kurtosis of the order value
    // — Σx..Σx⁴ in cents ride DECIMAL(38,0)/HUGEINT (x⁴ sums reach
    // ~1e36 at sf1, far past BIGINT), then a FIXED correctly-rounded
    // double chain both engines share; pow(m2, 1.5) is written
    // m2·sqrt(m2) because pow is libm (banned), sqrt is IEEE-exact.
    Q("agg_moments",
      (s, dir) => {
        val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
        val cents = dec(col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        val st = Tables.orders(s, dir)
          .select(col("o_orderpriority"), cents.as("x"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
            sum(col("x") * col("x")).as("s2"),
            sum(col("x") * col("x") * col("x")).as("s3"),
            sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
        val nd = col("n").cast(DoubleType)
        val d1 = col("s1").cast(DoubleType); val d2 = col("s2").cast(DoubleType)
        val d3 = col("s3").cast(DoubleType); val d4 = col("s4").cast(DoubleType)
        val mu = d1 / nd
        val m2 = d2 / nd - mu * mu
        val m3 = d3 / nd - lit(3.0) * mu * (d2 / nd) + lit(2.0) * mu * mu * mu
        val m4 = (d4 / nd - lit(4.0) * mu * (d3 / nd)
          + lit(6.0) * mu * mu * (d2 / nd) - lit(3.0) * mu * mu * mu * mu)
        st.select(col("o_orderpriority"), col("n"),
          (m3 / (m2 * sqrt(m2))).as("skewness"),
          (m4 / (m2 * m2) - lit(3.0)).as("kurtosis"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH st AS (SELECT o_orderpriority, count(*) AS n,
             |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS s1,
             |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
             |      * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS s2,
             |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
             |      * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
             |      * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS s3,
             |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
             |      * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
             |      * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
             |      * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS s4
             |  FROM orders GROUP BY 1),
             |m AS (SELECT o_orderpriority, n,
             |    CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS d1,
             |    CAST(s2 AS DOUBLE) AS d2, CAST(s3 AS DOUBLE) AS d3,
             |    CAST(s4 AS DOUBLE) AS d4
             |  FROM st),
             |k AS (SELECT o_orderpriority, n,
             |    d1 / nd AS mu,
             |    d2 / nd - (d1 / nd) * (d1 / nd) AS m2,
             |    d3 / nd - 3.0 * (d1 / nd) * (d2 / nd)
             |      + 2.0 * (d1 / nd) * (d1 / nd) * (d1 / nd) AS m3,
             |    d4 / nd - 4.0 * (d1 / nd) * (d3 / nd)
             |      + 6.0 * (d1 / nd) * (d1 / nd) * (d2 / nd)
             |      - 3.0 * (d1 / nd) * (d1 / nd) * (d1 / nd) * (d1 / nd) AS m4
             |  FROM m)
             |SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
             |       m3 / (m2 * sqrt(m2)) AS skewness,
             |       m4 / (m2 * m2) - 3.0 AS kurtosis
             |FROM k ORDER BY o_orderpriority""".stripMargin)),

    // EXACT heavy hitters with bounded memory ([[graft.ops.Ranking.
    // heavyHitters]]): tokens above 0.5% corpus frequency via the
    // two-pass Misra-Gries pattern — a mergeable ≤k-counter sketch
    // (custom TypedImperativeAggregate) generates a guaranteed
    // candidate superset, then one exact pass verifies candidates
    // only. The sketch's partition-dependence cancels in the verify
    // pass, so the output hashes against a plain GROUP BY/HAVING —
    // while an exact one-shot groupBy at 100 TB would hold state for
    // EVERY distinct token.
    Q("t_heavy_hitters",
      (s, dir) => {
        val tok = Tables.documents(s, dir)
          .select(explode(TextOps.tokens(col("text"))).as("w"))
        graft.ops.Ranking.heavyHitters(tok, "w", phi = 0.005, k = 512)
          .select(col("w").as("token"), col("n").as("n_occ"))
          .orderBy("token")
      },
      Some(s"""WITH tok AS (SELECT unnest(${TextOps.tokensSql("text")}) AS w FROM documents),
              |nn AS (SELECT count(*) AS n FROM tok)
              |SELECT w AS token, CAST(count(*) AS BIGINT) AS n_occ FROM tok GROUP BY 1
              |HAVING count(*) > (SELECT CAST(floor(0.005 * n) AS BIGINT) FROM nn)
              |ORDER BY token""".stripMargin)),

    // TF-IDF-style term weighting with an add-one RATIONAL rarity
    // factor — weight = tf × (N+1)/(df+1), deliberately log-free: ln()
    // is not guaranteed bit-identical across engines' libm, while
    // correctly-rounded double division and multiplication are. Two
    // narrow shuffles (tf, df) + a key join; N is a driver-held scalar
    // (same pattern as the reference's watermark read, SURVEY §2.5 A1).
    Q("t_tfidf",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val nDocs = docs.count()
        val tf = docs
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        val dfr = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        tf.join(dfr, Seq("token"))
          .withColumn("weight",
            col("tf").cast(DoubleType) *
              (lit((nDocs + 1).toDouble) / (col("df") + 1).cast(DoubleType)))
          .select(col("doc_id"), col("token"), col("tf"), col("df"), col("weight"))
          .orderBy(col("weight").desc, col("doc_id"), col("token"))
          .limit(30)
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS token FROM documents),
              |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
              |dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
              |nd AS (SELECT count(*) AS n FROM documents)
              |SELECT doc_id, token, tf, df,
              |       CAST(tf AS DOUBLE) * (CAST(n + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) AS weight
              |FROM tf JOIN dfr USING (token) CROSS JOIN nd
              |ORDER BY weight DESC, doc_id, token LIMIT 30""".stripMargin)),

    // BM25 full-text retrieval ([[Search.bm25]]): top-10 docs for three
    // multi-term queries over the posting-list (term, doc) shape —
    // rational Robertson IDF (no libm ln), per-term micro-point floors,
    // exact BIGINT per-doc sums, bounded-heap top-k per query
    // ([[Ranking.topKBy]], not a rank window over every scored doc).
    // Query table + corpus stats broadcast; docs matching no term never
    // shuffle.
    Q("search_bm25",
      (s, dir) => {
        import s.implicits._
        val qt = Seq((1L, "hash"), (1L, "join"), (2L, "window"), (2L, "agg"),
          (2L, "sort"), (3L, "stream"), (3L, "table")).toDF("q_id", "term")
        Search.bm25(Tables.documents(s, dir), "doc_id", "text", qt, k = 10)
          .orderBy("q_id", "rank")
      },
      Some(Search.bm25Sql("documents",
        "(1,'hash'),(1,'join'),(2,'window'),(2,'agg'),(2,'sort'),(3,'stream'),(3,'table')",
        k = 10) + "\nORDER BY q_id, rank")),

    // INCREMENTALLY-MAINTAINED BM25 index ([[Search.indexBatch]] +
    // [[Search.bm25FromIndex]]): the inverted index lives as two
    // snapshot-store TABLES (per-(doc,term) tf, per-doc dl) built from
    // one half of the corpus and APPENDED with the other — documents
    // are immutable, so a batch's index rows are a pure append costing
    // the batch's own tokenization, never a corpus re-index; df/N/
    // avgdl deliberately derive from the tables at query time so
    // appends can't leave them stale. Scoring from the maintained
    // tables must hash-equal search_bm25's full-corpus run — same
    // oracle.
    Q("search_bm25_incremental",
      (s, dir) => {
        import s.implicits._
        val st = new graft.engine.SnapshotStore(s, s"/tmp/graft_ss_bm25_${new java.io.File(dir).getName}")
        st.dropTable("idx", "tf"); st.dropTable("idx", "dl")
        val docs = Tables.documents(s, dir)
        val (tf1, dl1) = Search.indexBatch(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text")
        val (tf2, dl2) = Search.indexBatch(docs.filter(col("doc_id") % 2 =!= 0),
          "doc_id", "text")
        st.overwrite(tf1, "idx", "tf"); st.overwrite(dl1, "idx", "dl")
        st.append(tf2, "idx", "tf"); st.append(dl2, "idx", "dl")
        val qt = Seq((1L, "hash"), (1L, "join"), (2L, "window"), (2L, "agg"),
          (2L, "sort"), (3L, "stream"), (3L, "table")).toDF("q_id", "term")
        Search.bm25FromIndex(st.read("idx", "tf"), st.read("idx", "dl"), qt, k = 10)
          .orderBy("q_id", "rank")
      },
      Some(Search.bm25Sql("documents",
        "(1,'hash'),(1,'join'),(2,'window'),(2,'agg'),(2,'sort'),(3,'stream'),(3,'table')",
        k = 10) + "\nORDER BY q_id, rank")),

    // Pseudo-relevance feedback (Rocchio-style query expansion): BM25
    // retrieves top-5 feedback docs per query, the 3 heaviest
    // non-query terms across them (weight = Σ tf·idfm, integer
    // milli-idf (N·1000) div df — the tfidfCosine floor-division form,
    // no libm) expand the query, and BM25 reruns with the expanded
    // term set — the classic recall lever when queries underspecify.
    // BOTH scoring stages run [[Search.bm25FromIndex]] over ONE
    // materialized index (the tokenize pass is paid once); the mirror
    // reuses [[Search.bm25PtsSql]] twice so the stage formulas cannot
    // drift. Expansion picks are exact-integer ranked with term
    // tie-break; the chosen terms ride the output (exp_terms) so the
    // hash pins the expansion itself, not just the final ranking.
    Q("search_prf",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val qt = Seq((1L, "hash"), (1L, "join"), (2L, "window"), (2L, "agg"),
          (2L, "sort"), (3L, "stream"), (3L, "table")).toDF("q_id", "term")
        val (tf0, dl0) = Search.indexBatch(Tables.documents(s, dir), "doc_id", "text")
        val tf = tf0.localCheckpoint(); val dl = dl0.localCheckpoint()
        val s1 = Search.bm25FromIndex(tf, dl, qt, k = 5)
        val nDocs = dl.count() // bounded scalar — the watermark-read pattern
        val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val wts = s1.select(col("q_id"), col("doc_id"))
          .join(tf, Seq("doc_id"))
          .join(dfr, Seq("term"))
          .select(col("q_id"), col("term"),
            (col("tf") * expr(s"($nDocs * 1000) div df")).as("w0"))
          .groupBy("q_id", "term").agg(sum("w0").as("w"))
          .join(qt, Seq("q_id", "term"), "left_anti")
        val win = Window.partitionBy("q_id").orderBy(col("w").desc, col("term"))
        val exps = wts.withColumn("rn", row_number().over(win))
          .filter(col("rn") <= 3).select(col("q_id"), col("term"))
        val expStr = exps.groupBy("q_id")
          .agg(array_join(array_sort(collect_list("term")), ",").as("exp_terms"))
        Search.bm25FromIndex(tf, dl, qt.unionByName(exps), k = 10)
          .join(expStr, Seq("q_id"), "left")
          .orderBy("q_id", "rank")
      },
      Some {
        val qtv = "(1,'hash'),(1,'join'),(2,'window'),(2,'agg'),(2,'sort'),(3,'stream'),(3,'table')"
        s"""WITH qt(q_id, term) AS (VALUES $qtv),
           |tok AS (SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
           |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
           |stats AS (SELECT count(*) AS n_docs, SUM(dl) AS tot_dl FROM dl),
           |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |pts1 AS (SELECT q_id, doc_id, ${Search.bm25PtsSql()} AS pts
           |  FROM tf JOIN qt USING (term) JOIN dfr USING (term)
           |       JOIN dl USING (doc_id) CROSS JOIN stats),
           |sc1 AS (SELECT q_id, doc_id, CAST(SUM(pts) AS BIGINT) AS score_pts
           |        FROM pts1 GROUP BY 1, 2),
           |s1 AS (SELECT q_id, doc_id FROM (
           |         SELECT q_id, doc_id,
           |                row_number() OVER (PARTITION BY q_id
           |                  ORDER BY score_pts DESC, doc_id) AS rn
           |         FROM sc1) WHERE rn <= 5),
           |wts AS (SELECT s1.q_id, tf.term,
           |    CAST(SUM(tf.tf * ((n_docs * 1000) // df)) AS BIGINT) AS w
           |  FROM s1 JOIN tf USING (doc_id) JOIN dfr ON tf.term = dfr.term
           |  CROSS JOIN stats
           |  WHERE NOT EXISTS (SELECT 1 FROM qt
           |                    WHERE qt.q_id = s1.q_id AND qt.term = tf.term)
           |  GROUP BY 1, 2),
           |exps AS (SELECT q_id, term FROM (
           |           SELECT q_id, term,
           |                  row_number() OVER (PARTITION BY q_id
           |                    ORDER BY w DESC, term) AS rn
           |           FROM wts) WHERE rn <= 3),
           |qt2 AS (SELECT q_id, term FROM qt
           |        UNION ALL SELECT q_id, term FROM exps),
           |es AS (SELECT q_id, string_agg(term, ',' ORDER BY term) AS exp_terms
           |       FROM exps GROUP BY 1),
           |pts2 AS (SELECT q_id, doc_id, ${Search.bm25PtsSql()} AS pts
           |  FROM tf JOIN qt2 USING (term) JOIN dfr USING (term)
           |       JOIN dl USING (doc_id) CROSS JOIN stats),
           |sc2 AS (SELECT q_id, doc_id, CAST(SUM(pts) AS BIGINT) AS score_pts
           |        FROM pts2 GROUP BY 1, 2),
           |fin AS (SELECT q_id, doc_id, score_pts,
           |          row_number() OVER (PARTITION BY q_id
           |            ORDER BY score_pts DESC, doc_id) AS rank
           |        FROM sc2)
           |SELECT fin.q_id, CAST(rank AS BIGINT) AS rank, doc_id, score_pts, es.exp_terms
           |FROM fin LEFT JOIN es USING (q_id) WHERE rank <= 10
           |ORDER BY fin.q_id, rank""".stripMargin
      }),

    // Reciprocal-rank fusion ([[Search.rrfFuse]]): BM25 relevance fused
    // with a document-quality ranking over the SAME candidate set —
    // the calibration-free way to blend ranking signals (1/(60+rA) +
    // 1/(60+rB), the RRF constant from the original paper). The fused
    // score is a fixed-arity sum of two correctly-rounded divisions —
    // no aggregation-order nondeterminism — and the final top-10 is
    // the bounded heap, not a global sort.
    Q("search_rrf",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val qt = Seq((1L, "hash"), (1L, "join"), (2L, "window"), (2L, "agg"),
          (2L, "sort"), (3L, "stream"), (3L, "table")).toDF("q_id", "term")
        val docs = Tables.documents(s, dir)
        val cand = Search.bm25(docs, "doc_id", "text", qt, k = 20)
          .select(col("q_id"), col("doc_id"), col("rank"))
        val quality = cand
          .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
          .withColumn("rank", row_number().over(
            Window.partitionBy("q_id").orderBy(col("n_chars").desc, col("doc_id")))
            .cast(LongType))
          .select(col("q_id"), col("doc_id"), col("rank"))
        Search.rrfFuse(cand, quality, k = 10).orderBy("q_id", "rank")
      },
      Some {
        val bm = Search.bm25Sql("documents",
          "(1,'hash'),(1,'join'),(2,'window'),(2,'agg'),(2,'sort'),(3,'stream'),(3,'table')",
          k = 20)
        s"""WITH bm AS (SELECT q_id, doc_id, rank FROM ($bm) bm_sub),
           |qr AS (SELECT bm.q_id, bm.doc_id,
           |         row_number() OVER (PARTITION BY bm.q_id
           |                            ORDER BY d.n_chars DESC, bm.doc_id) AS rank
           |       FROM bm JOIN documents d USING (doc_id)),
           |f AS (SELECT COALESCE(a.q_id, b.q_id) AS q_id,
           |             COALESCE(a.doc_id, b.doc_id) AS doc_id,
           |        (CASE WHEN a.rank IS NULL THEN 0.0
           |              ELSE 1.0 / (60.0 + CAST(a.rank AS DOUBLE)) END
           |       + CASE WHEN b.rank IS NULL THEN 0.0
           |              ELSE 1.0 / (60.0 + CAST(b.rank AS DOUBLE)) END) AS rrf
           |      FROM bm a FULL OUTER JOIN qr b
           |        ON a.q_id = b.q_id AND a.doc_id = b.doc_id)
           |SELECT q_id, rank, doc_id, rrf FROM (
           |  SELECT q_id, doc_id, rrf,
           |         row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS rank
           |  FROM f)
           |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
      }),

    // Corpus-trained bigram-LM fluency scoring ([[TextOps.
    // bigramLmScore]]): the CCNet/KenLM-shaped perplexity filter with
    // the model trained in-engine — add-one-smoothed p(w₂|w₁) from two
    // keyed counts, micro-point floors, exact integer per-doc totals.
    // One tokenization feeds bigram AND unigram streams; V broadcast.
    Q("t_bigram_lm",
      (s, dir) => TextOps.bigramLmScore(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some(TextOps.bigramLmScoreSql("documents") + "\nORDER BY doc_id")),

    // PII redaction: regex scrub of emails/phones with per-doc match
    // counts — the compliance pass every training corpus runs before
    // release. Patterns stay in the Java∩RE2 common subset so the
    // DuckDB oracle replays them exactly; the corpus gets DETERMINISTIC
    // injected PII (doc_id-keyed) so the operator provably redacts
    // rather than matching nothing. Pure codegen'd projection — zero
    // shuffles, embarrassingly parallel at any scale.
    Q("t_pii_redact",
      (s, dir) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
        val pii = Tables.documents(s, dir).select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com now")))
            .when(col("doc_id") % 3 === 1,
              concat(col("text"), lit(" call 555-123-4567 today")))
            .otherwise(col("text")).as("text"))
        pii.select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(email), lit(0))).cast(LongType).as("n_emails"),
          size(regexp_extract_all(col("text"), lit(phone), lit(0))).cast(LongType).as("n_phones"),
          regexp_replace(regexp_replace(col("text"), lit(email), lit("<EMAIL>")),
            lit(phone), lit("<PHONE>")).as("redacted"))
          .orderBy("doc_id")
      },
      Some("""WITH pii AS (SELECT doc_id,
             |  CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || doc_id || '@example.com now'
             |       WHEN doc_id % 3 = 1 THEN text || ' call 555-123-4567 today'
             |       ELSE text END AS text FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
             |  regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |                 '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
             |FROM pii ORDER BY doc_id""".stripMargin)),

    // Context-length truncation: first-20-token cap per doc.
    Q("t_truncate",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.truncateTokens(col("text"), 20).as("truncated"),
        TextOps.tokenCount(TextOps.truncateTokens(col("text"), 20)).as("n_after"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tokens,
              |       ${TextOps.truncateTokensSql("text", 20)} AS truncated,
              |       CAST(len(list_filter(string_split(${TextOps.truncateTokensSql("text", 20)}, ' '),
              |                            t -> len(t) > 0)) AS BIGINT) AS n_after
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Sequence packing: shard-parallel greedy binning of documents into
    // ~512-token training sequences (ops/Packing.scala).
    Q("t_pack",
      (s, dir) => Packing.packDocuments(
        Tables.documents(s, dir), "doc_id", "text", binTokens = 512L, shards = 8)
        .orderBy("shard", "bin"),
      Some("""WITH t AS (
             |  SELECT doc_id, text,
             |         CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_tok,
             |         doc_id % 8 AS shard
             |  FROM documents),
             |c AS (SELECT doc_id, text, n_tok, shard,
             |             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
             |                              ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
             |      FROM t)
             |SELECT shard, CAST(floor(start_off / 512.0) AS BIGINT) AS bin,
             |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |       string_agg(text, ' ' ORDER BY doc_id) AS packed_text
             |FROM c GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin)),

    // Overlapping token-window chunking (64-token chunks every 48):
    // the long-document treatment upstream of packing. One explode,
    // zero shuffles besides the presentation sort.
    Q("t_chunk",
      (s, dir) => TextOps.chunkTokens(Tables.documents(s, dir), "doc_id", "text",
        chunkLen = 64, stride = 48)
        .orderBy("doc_id", "chunk_id"),
      Some(s"""WITH t AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM documents),
              |nz AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
              |st AS (SELECT doc_id, toks, n, unnest(range(0, n, 48)) AS start FROM nz)
              |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
              |       array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk_text,
              |       CAST(least(64, n - start) AS BIGINT) AS n_chunk_tokens
              |FROM st ORDER BY doc_id, chunk_id""".stripMargin)),

    // Gopher-style rule-based quality gate: each rule is its own
    // column (auditable), `keep` is their conjunction. All arithmetic
    // is single-pass scalar doubles — mirrored operation-for-operation
    // in the oracle so the hash compare is exact.
    Q("t_gopher_rules",
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val nTok = TextOps.tokenCount(col("text"))
        // nullif: zero-token docs → NULL ratios on both engines (DuckDB
        // would otherwise emit Infinity, Spark NULL — hash mismatch)
        val safeTok = nullif(nTok.cast(DoubleType), lit(0.0))
        val meanLen = length(col("text")).cast(DoubleType) / safeTok
        val distinctRatio =
          size(array_distinct(toks)).cast(DoubleType) / safeTok
        val stopHits = TextOps.stopwordCount(col("text"))
        Tables.documents(s, dir).select(
          col("doc_id"),
          nTok.as("n_tokens"),
          meanLen.as("mean_len"),
          distinctRatio.as("distinct_ratio"),
          stopHits.as("stop_hits"),
          (nTok >= 50 && nTok <= 100000 &&
            meanLen >= 3.0 && meanLen <= 10.0 &&
            distinctRatio >= 0.2 && stopHits >= 2).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, n_tokens, mean_len, distinct_ratio, stop_hits,
              |       (n_tokens >= 50 AND n_tokens <= 100000 AND mean_len >= 3.0 AND mean_len <= 10.0
              |        AND distinct_ratio >= 0.2 AND stop_hits >= 2) AS keep
              |FROM (SELECT doc_id,
              |        CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tokens,
              |        CAST(length(text) AS DOUBLE) / nullif(CAST(len(${TextOps.tokensSql("text")}) AS DOUBLE), 0) AS mean_len,
              |        CAST(len(list_distinct(${TextOps.tokensSql("text")})) AS DOUBLE)
              |          / nullif(CAST(len(${TextOps.tokensSql("text")}) AS DOUBLE), 0) AS distinct_ratio,
              |        ${TextOps.stopwordCountSql("text")} AS stop_hits
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin)),

    // FEATURE HASHING (the hashing trick, Weinberger et al. ICML'09):
    // tokens hash into a fixed 64-bucket signed feature space —
    // bucket = md5(token) % 64, sign = ±1 from an independent hash
    // bit, weight = Σ sign·tf per (doc, bucket) — the fixed-width
    // vectorizer that feeds linear classifiers/regressors without a
    // vocabulary table (no fit step, no OOV, mergeable across shards:
    // exactly what a 100 TB featurizer needs). Stateless md5 keeps it
    // engine-portable; weights are exact integers. One tokenize +
    // two keyed aggregates, both map-side combined.
    Q("t_feature_hash",
      (s, dir) => {
        val tf = Tables.documents(s, dir).filter(col("doc_id") < 100)
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        tf.withColumn("bucket",
            expr("CAST(conv(substring(md5(CONCAT('b:', tok)), 1, 8), 16, 10)" +
              " AS BIGINT) % 64"))
          .withColumn("sign",
            lit(1L) - lit(2L) * expr(
              "CAST(conv(substring(md5(CONCAT('s:', tok)), 1, 8), 16, 10)" +
                " AS BIGINT) % 2"))
          .groupBy("doc_id", "bucket")
          .agg(sum(col("sign") * col("tf")).as("weight"))
          .filter(col("weight") =!= 0)
          .orderBy("doc_id", "bucket")
      },
      Some(s"""WITH tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
              |  FROM (SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS tok
              |        FROM documents WHERE doc_id < 100)
              |  GROUP BY 1, 2),
              |h AS (SELECT doc_id,
              |    CAST(('0x' || substr(md5('b:' || tok), 1, 8)) AS BIGINT) % 64 AS bucket,
              |    1 - 2 * (CAST(('0x' || substr(md5('s:' || tok), 1, 8)) AS BIGINT) % 2) AS sign,
              |    tf
              |  FROM tf)
              |SELECT doc_id, bucket, CAST(SUM(sign * tf) AS BIGINT) AS weight
              |FROM h GROUP BY 1, 2 HAVING SUM(sign * tf) <> 0
              |ORDER BY doc_id, bucket""".stripMargin)),

    // Quality-filter FUNNEL report — the cascade attrition artifact a
    // pipeline run reads before committing to a rule set: the Gopher
    // rules applied IN ORDER, with per-stage survivors, docs/tokens
    // removed at that stage (first-failing-rule attribution), and each
    // rule's MARGINAL kill count (docs it fails regardless of order) —
    // marginal vs cascade is exactly the "is this rule redundant after
    // the others" question. One corpus projection computes every
    // predicate + the first-failing stage; ONE aggregate row carries
    // all 17 conditional sums (the single-row agg is checkpointed so
    // the 5 stage rows cost nothing more); rates are single divisions
    // of exact integers.
    Q("t_filter_funnel",
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val nTok = TextOps.tokenCount(col("text"))
        val safeTok = nullif(nTok.cast(DoubleType), lit(0.0))
        val meanLen = length(col("text")).cast(DoubleType) / safeTok
        val distinctRatio = size(array_distinct(toks)).cast(DoubleType) / safeTok
        val stopHits = TextOps.stopwordCount(col("text"))
        val perDoc = Tables.documents(s, dir).select(
          nTok.as("n_tok"),
          coalesce(nTok >= 50, lit(false)).as("p1"),
          coalesce(nTok <= 100000, lit(false)).as("p2"),
          coalesce(meanLen >= 3.0 && meanLen <= 10.0, lit(false)).as("p3"),
          coalesce(distinctRatio >= 0.2, lit(false)).as("p4"),
          coalesce(stopHits >= 2, lit(false)).as("p5"))
          .withColumn("fail_stage",
            when(!col("p1"), 1).when(!col("p2"), 2).when(!col("p3"), 3)
              .when(!col("p4"), 4).when(!col("p5"), 5).otherwise(0))
        val aggs = Seq(count(lit(1)).as("total")) ++ (1 to 5).flatMap(i => Seq(
          sum(when(col("fail_stage") === i, 1L).otherwise(0L)).as(s"f$i"),
          sum(when(col("fail_stage") === i, col("n_tok")).otherwise(0L)).as(s"t$i"),
          sum(when(!col(s"p$i"), 1L).otherwise(0L)).as(s"m$i")))
        val a = perDoc.agg(aggs.head, aggs.tail: _*).localCheckpoint()
        val names = Seq("min_tokens", "max_tokens", "mean_word_len",
          "distinct_ratio", "stopword_hits")
        (1 to 5).map { i =>
          val prevF = (1 until i).map(j => col(s"f$j")).foldLeft(lit(0L))(_ + _)
          val docsIn = col("total") - prevF
          val docsOut = docsIn - col(s"f$i")
          a.select(lit(i.toLong).as("stage"), lit(names(i - 1)).as("rule"),
            docsIn.cast(LongType).as("docs_in"),
            col(s"f$i").cast(LongType).as("failed_here"),
            col(s"m$i").cast(LongType).as("marginal_fail"),
            col(s"t$i").cast(LongType).as("tokens_removed"),
            docsOut.cast(LongType).as("docs_out"),
            when(docsIn > 0, docsOut.cast(DoubleType) / docsIn.cast(DoubleType))
              .as("pass_rate"))
        }.reduce(_ unionByName _).orderBy("stage")
      },
      Some {
        val names = Seq("min_tokens", "max_tokens", "mean_word_len",
          "distinct_ratio", "stopword_hits")
        val stageSelects = (1 to 5).map { i =>
          val prevF = if (i == 1) "0" else (1 until i).map(j => s"f$j").mkString(" + ")
          s"""SELECT ${i} AS stage, '${names(i - 1)}' AS rule,
             |  CAST(total - ($prevF) AS BIGINT) AS docs_in,
             |  CAST(f$i AS BIGINT) AS failed_here,
             |  CAST(m$i AS BIGINT) AS marginal_fail,
             |  CAST(t$i AS BIGINT) AS tokens_removed,
             |  CAST(total - ($prevF) - f$i AS BIGINT) AS docs_out,
             |  CASE WHEN total - ($prevF) > 0 THEN
             |    CAST(total - ($prevF) - f$i AS DOUBLE)
             |      / CAST(total - ($prevF) AS DOUBLE) END AS pass_rate
             |FROM a""".stripMargin
        }.mkString("\nUNION ALL\n")
        val aggCols = (1 to 5).map(i =>
          s"""SUM(CASE WHEN fail_stage = $i THEN 1 ELSE 0 END) AS f$i,
             |  SUM(CASE WHEN fail_stage = $i THEN n_tok ELSE 0 END) AS t$i,
             |  SUM(CASE WHEN NOT p$i THEN 1 ELSE 0 END) AS m$i""".stripMargin)
          .mkString(",\n  ")
        s"""WITH per_doc AS (SELECT n_tok, p1, p2, p3, p4, p5,
           |    CASE WHEN NOT p1 THEN 1 WHEN NOT p2 THEN 2 WHEN NOT p3 THEN 3
           |         WHEN NOT p4 THEN 4 WHEN NOT p5 THEN 5 ELSE 0 END AS fail_stage
           |  FROM (SELECT n_tok,
           |      COALESCE(n_tok >= 50, false) AS p1,
           |      COALESCE(n_tok <= 100000, false) AS p2,
           |      COALESCE(mean_len >= 3.0 AND mean_len <= 10.0, false) AS p3,
           |      COALESCE(distinct_ratio >= 0.2, false) AS p4,
           |      COALESCE(stop_hits >= 2, false) AS p5
           |    FROM (SELECT
           |        CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tok,
           |        CAST(length(text) AS DOUBLE)
           |          / nullif(CAST(len(${TextOps.tokensSql("text")}) AS DOUBLE), 0) AS mean_len,
           |        CAST(len(list_distinct(${TextOps.tokensSql("text")})) AS DOUBLE)
           |          / nullif(CAST(len(${TextOps.tokensSql("text")}) AS DOUBLE), 0) AS distinct_ratio,
           |        ${TextOps.stopwordCountSql("text")} AS stop_hits
           |      FROM documents))),
           |a AS (SELECT COUNT(*) AS total,
           |  $aggCols
           |  FROM per_doc)
           |$stageSelects
           |ORDER BY stage""".stripMargin
      }),

    // Gopher repetition rule: top-bigram fraction — docs dominated by a
    // single repeated phrase are boilerplate. Exact-integer top/total
    // counts divide identically on both engines.
    Q("t_top_bigram",
      (s, dir) => TextOps.topBigramStats(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH bg AS (SELECT doc_id, unnest(${TextOps.bigramsSql("text")}) AS bg
              |           FROM documents WHERE len(${TextOps.tokensSql("text")}) >= 2),
              |c AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2)
              |SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt,
              |       CAST(sum(c) AS BIGINT) AS n_bigrams,
              |       CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_frac
              |FROM c GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // Gopher duplicate-line repetition rules over the line-structured
    // corpus: fraction of repeated lines and fraction of characters in
    // repeated lines. Pure array arithmetic per doc (lines projected
    // ONCE in their own SELECT) — zero shuffles, integer counts divided
    // at the end so both engines agree bit-exactly. Every 4th doc has
    // an injected duplicate first line, so the operator provably
    // counts (dup_line_frac > 0 exactly there plus natural repeats).
    // Corpus-level boilerplate removal ([[TextOps.
    // removeBoilerplateLines]]): lines shared by >= 3 distinct docs
    // (the injected "lorem ipsum dolor." every 97th doc, plus natural
    // repeats) vanish from EVERY doc; survivors reassemble in original
    // line order; all-boilerplate docs drop out — C4's global line
    // dedup, beyond t_dup_lines' per-doc stats. Oracle: identical
    // explode → count-distinct gate → anti-join → ordered string_agg.
    Q("t_boilerplate",
      (s, dir) => TextOps.removeBoilerplateLines(
        lineCorpus(s, dir), "doc_id", "text", minDocs = 3)
        .orderBy("doc_id"),
      Some(s"""WITH $lineCorpusSql,
              |lines AS (SELECT doc_id,
              |    unnest(string_split(text, chr(10))) AS line,
              |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
              |  FROM lc),
              |boiler AS (SELECT line FROM lines GROUP BY line
              |           HAVING COUNT(DISTINCT doc_id) >= 3)
              |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
              |FROM lines ANTI JOIN boiler USING (line)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("t_dup_lines",
      (s, dir) => lineCorpus(s, dir)
        .select(col("doc_id"), split(col("text"), "\n").as("lines"))
        .select(col("doc_id"),
          size(col("lines")).cast(LongType).as("n_lines"),
          size(array_distinct(col("lines"))).cast(LongType).as("n_distinct"),
          aggregate(col("lines"), lit(0L), (a, x) => a + length(x)).as("line_chars"),
          aggregate(array_distinct(col("lines")), lit(0L), (a, x) => a + length(x))
            .as("distinct_chars"))
        .select(col("doc_id"), col("n_lines"), col("n_distinct"),
          ((col("n_lines") - col("n_distinct")).cast(DoubleType) /
            col("n_lines").cast(DoubleType)).as("dup_line_frac"),
          ((col("line_chars") - col("distinct_chars")).cast(DoubleType) /
            nullif(col("line_chars").cast(DoubleType), lit(0.0))).as("dup_char_frac"))
        .orderBy("doc_id"),
      Some(s"""WITH $lineCorpusSql,
              |l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM lc),
              |stats AS (SELECT doc_id,
              |    CAST(len(lines) AS BIGINT) AS n_lines,
              |    CAST(len(list_distinct(lines)) AS BIGINT) AS n_distinct,
              |    list_reduce(list_prepend(CAST(0 AS BIGINT),
              |      list_transform(lines, x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b) AS line_chars,
              |    list_reduce(list_prepend(CAST(0 AS BIGINT),
              |      list_transform(list_distinct(lines), x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b) AS distinct_chars
              |  FROM l)
              |SELECT doc_id, n_lines, n_distinct,
              |       CAST(n_lines - n_distinct AS DOUBLE) / CAST(n_lines AS DOUBLE) AS dup_line_frac,
              |       CAST(line_chars - distinct_chars AS DOUBLE) / nullif(CAST(line_chars AS DOUBLE), 0) AS dup_char_frac
              |FROM stats ORDER BY doc_id""".stripMargin)),

    // C4-style line heuristics over the same line corpus: terminal-
    // punctuation line ratio, ≥5-word line count, bad-phrase flags,
    // and the conjunctive keep gate. Injected structure guarantees
    // both outcomes occur (every 97th doc carries "lorem ipsum").
    // Pure projection — zero shuffles.
    Q("t_c4_filters",
      (s, dir) => lineCorpus(s, dir)
        .select(col("doc_id"), col("text"), split(col("text"), "\n").as("lines"))
        .select(col("doc_id"),
          size(col("lines")).cast(LongType).as("n_lines"),
          size(filter(col("lines"), l => l.endsWith("."))).cast(LongType).as("n_terminal"),
          size(filter(col("lines"), l => size(split(l, " ")) >= 5)).cast(LongType).as("n_ge5w"),
          col("text").contains("lorem ipsum").as("has_lorem"),
          col("text").contains("{").as("has_brace"))
        .withColumn("terminal_frac",
          col("n_terminal").cast(DoubleType) / col("n_lines").cast(DoubleType))
        .withColumn("keep",
          col("n_lines") >= 3 && col("terminal_frac") >= 0.5 &&
            !col("has_lorem") && !col("has_brace"))
        .orderBy("doc_id"),
      Some(s"""WITH $lineCorpusSql,
              |l AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM lc),
              |stats AS (SELECT doc_id,
              |    CAST(len(lines) AS BIGINT) AS n_lines,
              |    CAST(len(list_filter(lines, x -> ends_with(x, '.'))) AS BIGINT) AS n_terminal,
              |    CAST(len(list_filter(lines, x -> len(string_split(x, ' ')) >= 5)) AS BIGINT) AS n_ge5w,
              |    contains(text, 'lorem ipsum') AS has_lorem,
              |    contains(text, '{') AS has_brace
              |  FROM l)
              |SELECT doc_id, n_lines, n_terminal, n_ge5w, has_lorem, has_brace,
              |       CAST(n_terminal AS DOUBLE) / CAST(n_lines AS DOUBLE) AS terminal_frac,
              |       (n_lines >= 3 AND CAST(n_terminal AS DOUBLE) / CAST(n_lines AS DOUBLE) >= 0.5
              |        AND NOT has_lorem AND NOT has_brace) AS keep
              |FROM stats ORDER BY doc_id""".stripMargin)),

    // Unicode NFC normalization (native codegen'd expression — Spark
    // has no built-in normalizer): decomposed accents are injected
    // deterministically (every 'a' in every 11th doc becomes
    // 'a'+U+0301) and must compose to the precomposed form, shrinking
    // the codepoint count. DuckDB's ICU nfc_normalize replays the same
    // canonical composition, so the full normalized TEXT is
    // hash-compared, not just the lengths. Pure projection.
    Q("t_normalize",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0,
            regexp_replace(col("text"), "a", "a\u0301")).otherwise(col("text")).as("text"))
        .select(col("doc_id"),
          length(col("text")).cast(LongType).as("n_raw"),
          TextOps.normalizeNfc(col("text")).as("nfc_text"))
        .select(col("doc_id"), col("n_raw"), col("nfc_text"),
          length(col("nfc_text")).cast(LongType).as("n_nfc"),
          (length(col("nfc_text")) =!= col("n_raw")).as("changed"))
        .orderBy("doc_id"),
      Some(s"""WITH inj AS (SELECT doc_id,
              |  CASE WHEN doc_id % 11 = 0 THEN regexp_replace(text, 'a', 'a' || chr(769), 'g')
              |       ELSE text END AS text
              |  FROM documents)
              |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_raw,
              |       ${TextOps.normalizeNfcSql("text")} AS nfc_text,
              |       CAST(length(${TextOps.normalizeNfcSql("text")}) AS BIGINT) AS n_nfc,
              |       length(${TextOps.normalizeNfcSql("text")}) <> length(text) AS changed
              |FROM inj ORDER BY doc_id""".stripMargin)),

    // URL/domain filtering (the C4/RefinedWeb blocklist pass): URLs are
    // injected deterministically, the domain is regex-extracted (RE2 ∩
    // Java pattern subset, so both engines match identically), and a
    // broadcast-able blocklist decides the keep gate. Pure projection.
    Q("t_url_filter",
      (s, dir) => {
        val urlRe = "https://([a-z0-9]+)\\.example\\.com/p[0-9]+"
        val blocked = Seq("site0", "site7", "site13")
        Tables.documents(s, dir)
          .select(col("doc_id"),
            when(col("doc_id") % 6 === 0,
              concat(col("text"), lit(" see https://site"),
                (col("doc_id") % 20).cast(StringType), lit(".example.com/p"),
                col("doc_id").cast(StringType), lit(" now")))
              .otherwise(col("text")).as("text"))
          .select(col("doc_id"),
            size(regexp_extract_all(col("text"), lit(urlRe), lit(0))).cast(LongType).as("n_urls"),
            regexp_extract(col("text"), urlRe, 1).as("domain"))
          .select(col("doc_id"), col("n_urls"), col("domain"),
            col("domain").isin(blocked: _*).as("blocked"))
          .withColumn("keep", !col("blocked"))
          .orderBy("doc_id")
      },
      Some("""WITH inj AS (SELECT doc_id,
             |  CASE WHEN doc_id % 6 = 0
             |       THEN text || ' see https://site' || CAST(doc_id % 20 AS VARCHAR)
             |            || '.example.com/p' || CAST(doc_id AS VARCHAR) || ' now'
             |       ELSE text END AS text
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, 'https://([a-z0-9]+)\.example\.com/p[0-9]+')) AS BIGINT) AS n_urls,
             |  regexp_extract(text, 'https://([a-z0-9]+)\.example\.com/p[0-9]+', 1) AS domain,
             |  regexp_extract(text, 'https://([a-z0-9]+)\.example\.com/p[0-9]+', 1) IN ('site0','site7','site13') AS blocked,
             |  NOT (regexp_extract(text, 'https://([a-z0-9]+)\.example\.com/p[0-9]+', 1) IN ('site0','site7','site13')) AS keep
             |FROM inj ORDER BY doc_id""".stripMargin)),

    // Repetition REMOVAL (not just measurement): keep each line's first
    // occurrence, drop later repeats, re-join the cleaned document.
    // Index-aware lambda (first-occurrence test is array_position = i)
    // — O(lines²) per doc, fine for document-sized arrays; still a pure
    // zero-shuffle projection. Proven against the injected duplicate
    // first lines of the line corpus.
    Q("t_clean_lines",
      (s, dir) => lineCorpus(s, dir)
        .select(col("doc_id"), split(col("text"), "\n").as("lines"))
        .select(col("doc_id"),
          size(col("lines")).cast(LongType).as("n_lines"),
          filter(col("lines"),
            (x, i) => array_position(col("lines"), x) === i + 1).as("kept"))
        .select(col("doc_id"), col("n_lines"),
          size(col("kept")).cast(LongType).as("n_kept"),
          array_join(col("kept"), "\n").as("clean_text"))
        .orderBy("doc_id"),
      Some(s"""WITH $lineCorpusSql,
              |l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM lc),
              |k AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
              |             list_filter(lines, (x, i) -> list_position(lines, x) = i) AS kept
              |      FROM l)
              |SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
              |       array_to_string(kept, chr(10)) AS clean_text
              |FROM k ORDER BY doc_id""".stripMargin)),

    // Corpus rollup by detected language — the filter-then-aggregate
    // shape of a corpus quality report (one shuffle; exact aggregates).
    // Per-class precision/recall/F1 of the language-ID heuristic
    // against the corpus's labeled lang column
    // ([[graft.ops.Eval.classificationReport]]) — the go/no-go
    // measurement before any curation classifier gates a corpus.
    // Everything derives from the (label, pred) confusion matrix: ONE
    // map-side-combined keyed aggregate whose output is |classes|²
    // rows regardless of corpus size; the per-class rollups touch only
    // that matrix. Integer counts + fixed-shape double divisions →
    // oracle-hash-exact (zero denominators are NULL, never 0 or ±Inf).
    Q("ml_langid_report",
      (s, dir) => {
        val rel = Tables.documents(s, dir)
          .select(col("lang").as("label"), TextOps.langId(col("text")).as("pred"))
        graft.ops.Eval.classificationReport(rel, "label", "pred")
          .orderBy("clazz")
      },
      Some(s"""WITH rel AS (SELECT lang AS label, ${TextOps.langIdSql("text")} AS pred
              |             FROM documents),
              |${graft.ops.Eval.classificationReportSql("rel")}
              |SELECT * FROM rep ORDER BY clazz""".stripMargin)),

    // Modified bigram precision ([[Eval.bigramPrecision]] — BLEU's
    // clipped-count core): each document scored against a reference
    // built by dropping every 5th token (position-deterministic,
    // mirrored 1-based in DuckDB) — exact clipped counts per (doc,
    // gram), one division at the end. The generation-eval primitive.
    Q("eval_bleu2",
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val ref = array_join(
          filter(toks, (x, i) => (i + 1) % 5 =!= 0), " ")
        graft.ops.Eval.bigramPrecision(
          Tables.documents(s, dir).filter(col("doc_id") < 300)
            .select(col("doc_id"), col("text").as("cand"), ref.as("ref")),
          "doc_id", "cand", "ref")
          .orderBy("doc_id")
      },
      Some(s"""WITH pairs AS (SELECT doc_id, text AS cand,
              |    array_to_string(list_filter(${TextOps.tokensSql("text")},
              |      (x, i) -> i % 5 <> 0), ' ') AS ref
              |  FROM documents WHERE doc_id < 300),
              |cgr AS (SELECT doc_id, unnest(${TextOps.bigramsSql("cand")}) AS g FROM pairs),
              |rgr AS (SELECT doc_id, unnest(${TextOps.bigramsSql("ref")}) AS g FROM pairs),
              |cc AS (SELECT doc_id, g, count(*) AS cc FROM cgr GROUP BY 1, 2),
              |rc AS (SELECT doc_id, g, count(*) AS rc FROM rgr GROUP BY 1, 2),
              |j AS (SELECT cc.doc_id, CAST(SUM(cc.cc) AS BIGINT) AS n_cand,
              |        CAST(SUM(LEAST(cc.cc, COALESCE(rc.rc, 0))) AS BIGINT) AS n_matched
              |      FROM cc LEFT JOIN rc ON cc.doc_id = rc.doc_id AND cc.g = rc.g
              |      GROUP BY 1)
              |SELECT p.doc_id, COALESCE(j.n_cand, 0) AS n_cand,
              |       COALESCE(j.n_matched, 0) AS n_matched,
              |       CASE WHEN COALESCE(j.n_cand, 0) = 0 THEN NULL
              |            ELSE CAST(j.n_matched AS DOUBLE) / CAST(j.n_cand AS DOUBLE)
              |       END AS precision
              |FROM (SELECT DISTINCT doc_id FROM pairs) p
              |LEFT JOIN j ON p.doc_id = j.doc_id
              |ORDER BY p.doc_id""".stripMargin)),

    // Exact bucketed ROC-AUC ([[graft.ops.Eval.bucketAuc]]): a
    // nearest-prototype classifier (cosine to the first label-1
    // vector) scored against the true label, AUC computed in the
    // Mann-Whitney U form over SCORE BUCKETS — all-integer pair
    // counting with ½-credit ties, prefix sums over bucket rows only
    // (state = O(buckets) at any corpus size), one double division at
    // the end. The bucket floor is also what pins the float score
    // cross-engine.
    Q("ml_auc",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val proto = emb.filter(col("label") === 1).orderBy("vec_id").limit(1)
          .select(col("embedding").as("__p"))
        val scored = emb.crossJoin(broadcast(proto))
          .select(when(col("label") === 1, 1L).otherwise(0L).as("y"),
            floor(Similarity.cosine(col("embedding"), col("__p")) * 1000)
              .cast(LongType).as("b"))
        graft.ops.Eval.bucketAuc(scored, "y", "b")
      },
      Some(s"""WITH proto AS (SELECT embedding AS p FROM embeddings WHERE label = 1
              |               ORDER BY vec_id LIMIT 1),
              |sc AS (SELECT CASE WHEN label = 1 THEN 1 ELSE 0 END AS y,
              |         CAST(floor(${Similarity.cosineSql("embedding", "p")} * 1000) AS BIGINT) AS b
              |       FROM embeddings CROSS JOIN proto),
              |${graft.ops.Eval.bucketAucSql("sc")}""".stripMargin)),

    Q("t_corpus_by_lang",
      (s, dir) => Tables.documents(s, dir).select(
        TextOps.langId(col("text")).as("lang_guess"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.qualityScore(col("text")).as("q"))
        .groupBy(col("lang_guess"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          min(col("q")).as("min_quality"),
          max(col("q")).as("max_quality"))
        .orderBy("lang_guess"),
      Some(s"""SELECT lang_guess, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
              |       min(q) AS min_quality, max(q) AS max_quality
              |FROM (SELECT ${TextOps.langIdSql("text")} AS lang_guess,
              |             CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tokens,
              |             ${TextOps.qualityScoreSql("text")} AS q
              |      FROM documents)
              |GROUP BY lang_guess ORDER BY lang_guess""".stripMargin)),

    // CAPSTONE: the full training-data flow in one plan — corpus with
    // duplicates → quality filter → exact dedup (min-id representative
    // per fingerprint) → shard-parallel sequence packing. Everything
    // upstream of the pack is narrow or a single hash shuffle.
    Q("td_pipeline",
      (s, dir) => {
        val filtered = dupCorpus(s, dir)
          .filter(TextOps.qualityScore(col("text")) >= 0.5)
        val deduped = filtered
          .groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
          .select(col("doc_id"), col("text"))
        Packing.packDocuments(deduped, "doc_id", "text", binTokens = 512L, shards = 8)
          .orderBy("shard", "bin")
      },
      Some(s"""WITH $dupCorpusSql,
              |filtered AS (SELECT doc_id, text FROM corpus
              |             WHERE ${TextOps.qualityScoreSql("text")} >= 0.5),
              |deduped AS (SELECT min(doc_id) AS doc_id, text FROM filtered GROUP BY md5(text), text),
              |t AS (SELECT doc_id, text,
              |             CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_tok,
              |             doc_id % 8 AS shard
              |      FROM deduped),
              |c AS (SELECT doc_id, text, n_tok, shard,
              |             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
              |                              ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
              |      FROM t)
              |SELECT shard, CAST(floor(start_off / 512.0) AS BIGINT) AS bin,
              |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
              |       string_agg(text, ' ' ORDER BY doc_id) AS packed_text
              |FROM c GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin)),

    // ── Similarity search ──────────────────────────────────────────────

    // Brute-force cosine top-k against one query vector: the query side
    // is a 1-row broadcast; corpus side is one narrow scan + partial
    // top-k per partition merged by the final sort-limit.
    Q("sim_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        emb.crossJoin(broadcast(q))
          .where(col("vec_id") =!= 0)
          .select(col("vec_id"),
            Similarity.cosine(col("embedding"), col("qv")).as("cosine"))
          .orderBy(col("cosine").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""SELECT vec_id, ${Similarity.cosineSql("embedding", "qv")} AS cosine
              |FROM embeddings CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
              |WHERE vec_id <> 0
              |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin)),

    // IVF building block: nearest-centroid assignment (centroids
    // broadcast). At scale the output is written partitionBy(centroid)
    // so probes prune to one partition.
    Q("sim_ivf_assign",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        Similarity.ivfAssign(emb, "embedding", "vec_id", cents, "c_vec", "c_id")
          .orderBy("vec_id")
      },
      Some(s"""WITH cents AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8),
              |j AS (SELECT e.vec_id, c.c_id,
              |             ${Similarity.cosineSql("e.embedding", "c.c_vec")} AS cosine
              |      FROM embeddings e CROSS JOIN cents c),
              |r AS (SELECT vec_id, c_id, cosine,
              |             row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS rn
              |      FROM j)
              |SELECT vec_id, c_id AS centroid_id, cosine FROM r WHERE rn = 1
              |ORDER BY vec_id""".stripMargin)),

    // Embedding near-duplicates: random-hyperplane LSH buckets (4096)
    // turn the all-pairs cosine problem into a per-bucket equi-join.
    Q("sim_neardup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val off = emb.agg(coalesce(max("vec_id"), lit(0L))).head.getLong(0) + 1
        val corpus = emb.unionByName(emb.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + off).as("vec_id"), col("embedding")))
        Similarity.embeddingNearDupPairs(corpus, "embedding", "vec_id", planes12, 0.99)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings
              |                UNION ALL
              |                SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id, embedding
              |                FROM embeddings WHERE vec_id % 5 = 0),
              |sig AS (SELECT vec_id, embedding, ${bucketSql("embedding", planes12)} AS bucket FROM corpus)
              |SELECT id_a, id_b, cosine FROM (
              |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |         ${Similarity.cosineSql("a.embedding", "b.embedding")} AS cosine
              |  FROM sig a JOIN sig b USING (bucket) WHERE a.vec_id < b.vec_id)
              |WHERE cosine >= 0.99 ORDER BY id_a, id_b""".stripMargin)),

    // LSH-bucketed top-k where the query side is itself a table (the
    // right shape when both sides are large: bucket equi-join, then a
    // per-query window top-k — never a cross product).
    Q("sim_lsh_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val qs = emb.filter(col("vec_id") < 5)
        Similarity.lshTopK(emb, qs, "embedding", "vec_id", planes6, k = 5)
          .orderBy("query_id", "rn")
      },
      Some(s"""WITH base AS (SELECT vec_id, embedding, ${bucketSql("embedding", planes6)} AS bucket
              |              FROM embeddings),
              |qs AS (SELECT vec_id AS query_id, embedding AS query_vec, bucket
              |       FROM base WHERE vec_id < 5),
              |cand AS (SELECT qs.query_id, base.vec_id AS item_id,
              |                ${Similarity.cosineSql("qs.query_vec", "base.embedding")} AS cosine
              |         FROM qs JOIN base USING (bucket)
              |         WHERE qs.query_id <> base.vec_id),
              |ranked AS (SELECT query_id, item_id, cosine,
              |                  row_number() OVER (PARTITION BY query_id
              |                                     ORDER BY cosine DESC, item_id) AS rn
              |           FROM cand)
              |SELECT query_id, item_id, cosine, CAST(rn AS INTEGER) AS rn
              |FROM ranked WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin)),

    // IVF probe with nprobe=1: each query ranks only its own centroid's
    // inverted list — the partition-pruned ANN search path (the scan
    // prunes to one centroid partition when the assigned corpus is
    // written partitionBy(centroid_id)).
    Q("sim_ivf_search",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        Similarity.ivfSearch(emb, emb.filter(col("vec_id") < 3).select(col("vec_id")),
          "embedding", "vec_id", cents, "c_vec", "c_id", k = 5)
          .orderBy("query_id", "rn")
      },
      Some(s"""WITH cents AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8),
              |scored AS (SELECT e.vec_id, e.embedding, c.c_id,
              |                  ${Similarity.cosineSql("e.embedding", "c.c_vec")} AS cosine
              |           FROM embeddings e CROSS JOIN cents c),
              |assign AS (SELECT vec_id, embedding, c_id,
              |                  row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS arn
              |           FROM scored),
              |a1 AS (SELECT vec_id, embedding, c_id FROM assign WHERE arn = 1),
              |qs AS (SELECT vec_id AS query_id, embedding AS qv, c_id FROM a1 WHERE vec_id < 3),
              |cand AS (SELECT qs.query_id, a1.vec_id AS item_id,
              |                ${Similarity.cosineSql("qs.qv", "a1.embedding")} AS cosine
              |         FROM qs JOIN a1 USING (c_id) WHERE a1.vec_id <> qs.query_id),
              |r AS (SELECT query_id, item_id, cosine,
              |             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rn
              |      FROM cand)
              |SELECT query_id, item_id, cosine, CAST(rn AS INTEGER) AS rn
              |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin)),

    // The PERSISTED IVF index — the production ANN shape every
    // Similarity scaladoc promises: the assignment is WRITTEN
    // partitionBy(centroid_id), and a probe reads ONLY the probed
    // cells' partition directories (asserted in-query on inputFiles:
    // every file read must live under a probed centroid_id= dir).
    // At 100 TB this is the difference between scanning the corpus
    // and scanning nprobe/|cells| of it — the cells literal comes from
    // a ≤|queries| scalar read (the watermark pattern). Results must
    // equal the in-memory sim_ivf_search ranking exactly.
    Q("sim_ivf_persisted",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val assigned = Similarity.ivfAssign(emb, "embedding", "vec_id",
            cents, "c_vec", "c_id")
          .select(col("vec_id"), col("centroid_id"))
          .join(emb, Seq("vec_id"))
        val path = s"/tmp/graft_ivf_idx_${new java.io.File(dir).getName}"
        assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)
        val idx = s.read.parquet(path)
        val qc = assigned.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("centroid_id"),
            col("embedding").as("qv"))
        val cells = qc.select("centroid_id").distinct().collect().map(_.getLong(0))
        val pruned = idx.filter(col("centroid_id").isInCollection(cells))
        // the pruning REQUIRE reads the physical plan (inputFiles lists
        // the relation's files BEFORE partition pruning — measured):
        // the scan must carry a centroid_id partition filter
        val plan = pruned.queryExecution.sparkPlan.toString
        require(plan.contains("PartitionFilters: [centroid_id")
            || (plan.contains("PartitionFilters: [") && plan.contains("centroid_id")),
          s"sim_ivf_persisted: probe scan carries no centroid_id partition filter:\n" +
            plan.linesIterator.take(12).mkString("\n"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("item_id"))
        qc.join(pruned.select(col("centroid_id"), col("vec_id").as("item_id"),
            col("embedding").as("item_vec")), Seq("centroid_id"))
          .where(col("query_id") =!= col("item_id"))
          .withColumn("cosine", Similarity.cosine(col("qv"), col("item_vec")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("query_id"), col("item_id"), col("cosine"), col("rn"))
          .orderBy("query_id", "rn")
      },
      Some(s"""WITH cents AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8),
              |scored AS (SELECT e.vec_id, e.embedding, c.c_id,
              |                  ${Similarity.cosineSql("e.embedding", "c.c_vec")} AS cosine
              |           FROM embeddings e CROSS JOIN cents c),
              |assign AS (SELECT vec_id, embedding, c_id,
              |                  row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS arn
              |           FROM scored),
              |a1 AS (SELECT vec_id, embedding, c_id FROM assign WHERE arn = 1),
              |qs AS (SELECT vec_id AS query_id, embedding AS qv, c_id FROM a1 WHERE vec_id < 3),
              |cand AS (SELECT qs.query_id, a1.vec_id AS item_id,
              |                ${Similarity.cosineSql("qs.qv", "a1.embedding")} AS cosine
              |         FROM qs JOIN a1 USING (c_id) WHERE a1.vec_id <> qs.query_id),
              |r AS (SELECT query_id, item_id, cosine,
              |             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rn
              |      FROM cand)
              |SELECT query_id, item_id, cosine, CAST(rn AS INTEGER) AS rn
              |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin)),

    // IVF probe with nprobe=2: each query unions its two nearest cells
    // before ranking — the recall-vs-scan knob turned one notch.
    Q("sim_ivf_probe2",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        Similarity.ivfSearch(emb, emb.filter(col("vec_id") < 3).select(col("vec_id")),
          "embedding", "vec_id", cents, "c_vec", "c_id", k = 5, nprobe = 2)
          .orderBy("query_id", "rn")
      },
      Some(s"""WITH cents AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8),
              |scored AS (SELECT e.vec_id, e.embedding, c.c_id,
              |                  ${Similarity.cosineSql("e.embedding", "c.c_vec")} AS cosine
              |           FROM embeddings e CROSS JOIN cents c),
              |ranked AS (SELECT vec_id, embedding, c_id,
              |                  row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS arn
              |           FROM scored),
              |items AS (SELECT c_id, vec_id AS item_id, embedding AS item_vec FROM ranked WHERE arn = 1),
              |qs AS (SELECT vec_id AS query_id, c_id, embedding AS qv
              |       FROM ranked WHERE arn <= 2 AND vec_id < 3),
              |cand AS (SELECT qs.query_id, items.item_id,
              |                ${Similarity.cosineSql("qs.qv", "items.item_vec")} AS cosine
              |         FROM qs JOIN items USING (c_id) WHERE items.item_id <> qs.query_id),
              |r AS (SELECT query_id, item_id, cosine,
              |             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, item_id) AS rn
              |      FROM cand)
              |SELECT query_id, item_id, cosine, CAST(rn AS INTEGER) AS rn
              |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin)),

    // IVF retrieval QUALITY, not just output correctness: recall@5 of
    // the IVF probe vs the brute-force exact top-5 on the same query
    // set, at nprobe=1 and nprobe=2. Recall is SQL-computable from the
    // two result sets, so the quality number itself is oracle-HASHED —
    // and nprobe=2's candidate cells are a superset of nprobe=1's, so
    // recall is provably non-decreasing (SimilaritySpec asserts the
    // ordering; any item displacing an exact-top-5 hit must outrank it
    // and is therefore itself an exact-top-5 hit).
    Q("sim_ivf_recall",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = Tables.embeddings(s, dir)
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val queryIds = emb.filter(col("vec_id") < 3).select(col("vec_id"))
        val qs = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val wq = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("item_id"))
        val exact5 = emb.crossJoin(broadcast(qs))
          .where(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("item_id"),
            Similarity.cosine(col("embedding"), col("qv")).as("cosine"))
          .withColumn("rn", row_number().over(wq))
          .filter(col("rn") <= 5)
          .select("query_id", "item_id")
        def leg(np: Int): DataFrame =
          Similarity.ivfSearch(emb, queryIds, "embedding", "vec_id",
            cents, "c_vec", "c_id", k = 5, nprobe = np)
            .join(exact5, Seq("query_id", "item_id"), "left_semi")
            .agg(count(lit(1)).as("hits"))
            .select(lit(np).as("nprobe"), col("hits"),
              // 3 queries × k=5 ground-truth pairs
              (col("hits").cast(DoubleType) / lit(15.0)).as("recall"))
        leg(1).unionByName(leg(2)).orderBy("nprobe")
      },
      Some {
        def ivfLeg(np: Int) =
          s"""SELECT query_id, item_id FROM (
             |  SELECT qs.query_id, items.item_id,
             |         row_number() OVER (PARTITION BY qs.query_id
             |             ORDER BY ${Similarity.cosineSql("qs.qv", "items.item_vec")} DESC,
             |                      items.item_id) AS rn
             |  FROM (SELECT vec_id AS query_id, c_id, embedding AS qv
             |        FROM ranked WHERE arn <= $np AND vec_id < 3) qs
             |  JOIN items USING (c_id)
             |  WHERE items.item_id <> qs.query_id)
             |WHERE rn <= 5""".stripMargin
        s"""WITH cents AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8),
           |scored AS (SELECT e.vec_id, e.embedding, c.c_id,
           |                  ${Similarity.cosineSql("e.embedding", "c.c_vec")} AS cosine
           |           FROM embeddings e CROSS JOIN cents c),
           |ranked AS (SELECT vec_id, embedding, c_id,
           |                  row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS arn
           |           FROM scored),
           |items AS (SELECT c_id, vec_id AS item_id, embedding AS item_vec FROM ranked WHERE arn = 1),
           |exact5 AS (SELECT query_id, item_id FROM (
           |  SELECT q.vec_id AS query_id, e.vec_id AS item_id,
           |         row_number() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${Similarity.cosineSql("e.embedding", "q.embedding")} DESC,
           |                      e.vec_id) AS rn
           |  FROM embeddings e
           |  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3) q
           |  WHERE e.vec_id <> q.vec_id)
           |  WHERE rn <= 5),
           |ivf1 AS (${ivfLeg(1)}),
           |ivf2 AS (${ivfLeg(2)}),
           |h1 AS (SELECT count(*) AS hits FROM ivf1 JOIN exact5 USING (query_id, item_id)),
           |h2 AS (SELECT count(*) AS hits FROM ivf2 JOIN exact5 USING (query_id, item_id))
           |SELECT CAST(1 AS INTEGER) AS nprobe, CAST(hits AS BIGINT) AS hits,
           |       CAST(hits AS DOUBLE) / 15.0 AS recall FROM h1
           |UNION ALL
           |SELECT CAST(2 AS INTEGER), CAST(hits AS BIGINT),
           |       CAST(hits AS DOUBLE) / 15.0 FROM h2
           |ORDER BY nprobe""".stripMargin
      }),

    // ── Event-time processing ──────────────────────────────────────────

    // JSON property extraction with explicit schema (generalizes the
    // reference's API-payload parsing, ingest_stocks.py:52-63).
    Q("ev_json_extract",
      (s, dir) => EventOps.jsonProps(Tables.events(s, dir))
        .select(col("event_id"), col("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // Corrupt-record quarantine ([[EventOps.jsonPropsQuarantine]]):
    // every 3rd payload is deterministically TRUNCATED (an unterminated
    // object — Spark's Jackson and DuckDB's json_valid agree it is
    // invalid, unlike trailing garbage, which Jackson tolerates after
    // the first root); parsed rows keep
    // their extracted field, rejects land in a quarantine lane with the
    // raw payload preserved — neither FAILFAST's dead pipeline nor
    // DROPMALFORMED's silent data loss. Oracle: DuckDB json_valid
    // classifies the identical corpus.
    Q("s11_json_quarantine",
      (s, dir) => {
        val corpus = Tables.events(s, dir).select(col("event_id"), col("props"))
          .withColumn("payload",
            when(col("event_id") % 3 === 0,
              substring(col("props"), 1, 4))
              .otherwise(col("props")))
        EventOps.jsonPropsQuarantine(corpus, "payload")
          .select(col("event_id"), col("k"), col("quarantined"),
            when(col("quarantined"), col("payload")).as("raw_payload"))
          .orderBy("event_id")
      },
      Some(quarantineOracleSql)),

    // Tumbling 1-hour event-time windows (same transform runs under
    // Structured Streaming — graft.streaming.StreamOps).
    Q("ev_tumbling_hourly",
      (s, dir) => EventOps.tumblingHourly(Tables.events(s, dir))
        .orderBy("window_start", "event_type"),
      Some(s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
              |       count(*) AS n_events, ${Det.dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // Hopping windows (1 h size / 30 min slide): every event lands in
    // exactly two windows. Oracle replicates each event to its two
    // slide-aligned window starts with integer microsecond arithmetic
    // (make_timestamp keeps the result tz-naive, matching Det.ntz).
    Q("ev_hopping",
      (s, dir) => EventOps.hoppingHourBy30(Tables.events(s, dir))
        .orderBy("window_start", "event_type"),
      Some(s"""SELECT window_start, event_type, count(*) AS n_events,
              |       ${Det.dsumSql("value")} AS sum_value
              |FROM (SELECT make_timestamp(((epoch_us(ts) - off) // 3600000000) * 3600000000 + off) AS window_start,
              |             event_type, value
              |      FROM events CROSS JOIN (SELECT unnest([CAST(0 AS BIGINT), CAST(1800000000 AS BIGINT)]) AS off))
              |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // Session windows (30-min inactivity gap) — oracle is the classic
    // gaps-and-islands rewrite, proving the semantics line up. Spark
    // merges an event landing EXACTLY at the previous session's end
    // (next.start <= prev_end), so a new session starts only when the
    // quiet time strictly exceeds the gap — hence `>` here.
    // session_window with a COMPOSITE aggregate: the distinct-type
    // cardinality rides the same UpdatingSessions/MergingSessions pass
    // as the event count — one dynamic-gap groupBy, partial merge
    // included, where a window-function formulation would need a
    // second shuffle for the DISTINCT. Sessions must equal the
    // explicit gap-islands construction (the oracle's lag+cumsum).
    Q("ev_session_window",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"), col("n_types"))
        .orderBy("user_id", "session_start"),
      Some("""WITH m AS (SELECT user_id, ts, event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |g AS (SELECT user_id, ts, event_type,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM m)
             |SELECT user_id, min(ts) AS session_start,
             |       max(ts) + INTERVAL 30 MINUTE AS session_end,
             |       count(*) AS n_events,
             |       count(DISTINCT event_type) AS n_types
             |FROM g GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    Q("ev_sessions",
      (s, dir) => EventOps.sessions(Tables.events(s, dir), "30 minutes")
        .orderBy("user_id", "session_start"),
      Some("""WITH m AS (SELECT user_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |g AS (SELECT user_id, ts,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM m)
             |SELECT user_id, min(ts) AS session_start,
             |       max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
             |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),

    // INCREMENTAL sessionization ([[EventOps.mergeSessions]]): the
    // session table is built from history (events before the cut),
    // then a new batch folds in WITHOUT re-sessionizing history — only
    // each touched user's last session can bridge with their first
    // new one (the gap test is `new.start <= old.end`, exactly the
    // batch operator's boundary-inclusive merge rule), and the
    // existing table is semi-joined down to the batch's users first,
    // so a daily run costs the batch plus the touched session tails.
    // The maintained table must equal the full-corpus sessionization
    // EXACTLY — same oracle as ev_sessions.
    Q("ev_sessions_incremental",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val cut = ev.agg(
          timestamp_micros(expr(
            "unix_micros(min(ts)) + (unix_micros(max(ts)) - unix_micros(min(ts))) div 2"))
            .as("c")).head.getTimestamp(0)
        val existing = EventOps.sessions(ev.filter(col("ts") <= lit(cut)), "30 minutes")
        EventOps.mergeSessions(existing, ev.filter(col("ts") > lit(cut)), "30 minutes")
          .orderBy("user_id", "session_start")
      },
      Some("""WITH m AS (SELECT user_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |g AS (SELECT user_id, ts,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM m)
             |SELECT user_id, min(ts) AS session_start,
             |       max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
             |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),

    // Linear multi-touch attribution ([[EventOps.linearAttribution]]):
    // each purchase splits one credit unit equally across the user's
    // click/view touches in the prior hour; channel totals are exact
    // decimal sums of the per-conversion 1/n credits (one double
    // division re-anchored to DECIMAL(18,9) — order-independent where
    // raw double sums are not). Touchless conversions land under
    // '(unattributed)', so total credit == conversion count.
    Q("ev_attribution",
      (s, dir) => EventOps.linearAttribution(Tables.events(s, dir),
        "user_id", "event_type", "ts", "event_id",
        touchTypes = Seq("click", "view"), convType = "purchase",
        window = expr("INTERVAL 1 HOUR"))
        .orderBy("channel"),
      Some("""WITH touches AS (SELECT user_id AS u, event_type AS channel, ts AS touch_ts
             |                 FROM events WHERE event_type IN ('click', 'view')),
             |convs AS (SELECT user_id AS u, ts AS conv_ts, event_id AS conv_id
             |          FROM events WHERE event_type = 'purchase'),
             |touched AS (SELECT c.conv_id, t.channel
             |            FROM convs c JOIN touches t ON c.u = t.u
             |            WHERE t.touch_ts <= c.conv_ts
             |              AND t.touch_ts > c.conv_ts - INTERVAL 1 HOUR),
             |untouched AS (SELECT conv_id, '(unattributed)' AS channel, CAST(1 AS BIGINT) AS n
             |              FROM convs WHERE conv_id NOT IN (SELECT conv_id FROM touched)),
             |credited AS (SELECT conv_id, channel,
             |               CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n
             |             FROM touched
             |             UNION ALL SELECT conv_id, channel, n FROM untouched)
             |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touchpoints,
             |       CAST(SUM(CAST(1.0 / CAST(n AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) AS credit
             |FROM credited GROUP BY channel ORDER BY channel""".stripMargin)),

    // First-order Markov transitions over per-user event sequences
    // ([[EventOps.transitionMatrix]]): (prev type → type) counts and
    // row-normalized probabilities — next-event-model statistics.
    // Sequence order is (ts, event_id) so lag() is reproducible under
    // any partitioning; one window + one keyed aggregate; output is
    // |types|² regardless of event volume.
    Q("ev_transitions",
      (s, dir) => EventOps.transitionMatrix(Tables.events(s, dir),
        "user_id", "event_type", "ts", "event_id")
        .orderBy("from_type", "to_type"),
      Some(transitionsOracleSql)),

    // Interval union ([[EventOps.mergeIntervals]]): each supplier's
    // in-transit windows [shipdate, receiptdate] merged into maximal
    // busy islands — gaps-and-islands over EXPLICIT extents, the
    // interval-algebra sibling of ev_sessions (which only knows point
    // events + a gap). One shuffle on the key, two chained frames of
    // one window spec, one keyed rollup; all date/integer comparisons.
    Q("ev_interval_union",
      (s, dir) => {
        // the synthetic lineitem has no receipt date: transit end =
        // shipdate + 1..14 days, derived deterministically in both engines
        val iv = Tables.lineitem(s, dir).filter(col("l_suppkey") < 100)
          .select(col("l_suppkey"), col("l_shipdate").cast(DateType).as("s"),
            date_add(col("l_shipdate").cast(DateType),
              (col("l_linenumber") % 14) + 1).as("e"))
        EventOps.mergeIntervals(iv, Seq("l_suppkey"), "s", "e")
          .select(col("l_suppkey"), col("island_start"), col("island_end"),
            col("n_intervals"))
          .orderBy("l_suppkey", "island_start")
      },
      Some("""WITH iv AS (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS s,
             |                   CAST(l_shipdate AS DATE) + INTERVAL ((l_linenumber % 14) + 1) DAY AS e
             |            FROM lineitem WHERE l_suppkey < 100),
             |m AS (SELECT l_suppkey, s, e,
             |        CASE WHEN max(e) OVER wp IS NULL OR s > max(e) OVER wp
             |             THEN 1 ELSE 0 END AS brk
             |      FROM iv
             |      WINDOW wp AS (PARTITION BY l_suppkey ORDER BY s, e
             |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |g AS (SELECT l_suppkey, s, e,
             |        sum(brk) OVER (PARTITION BY l_suppkey ORDER BY s, e
             |                       ROWS UNBOUNDED PRECEDING) AS island
             |      FROM m)
             |SELECT l_suppkey, min(s) AS island_start, max(e) AS island_end,
             |       count(*) AS n_intervals
             |FROM g GROUP BY l_suppkey, island
             |ORDER BY l_suppkey, island_start""".stripMargin)),

    // Time-bounded event correlation: clicks joined to purchases of the
    // same user within the following hour — the batch form of
    // StreamOps.correlatedEvents (whose stream-stream state eviction
    // relies on exactly this time bound). Oracle-verified here; the
    // streaming variant is unit-tested for parity.
    Q("ev_correlated",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val a = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("a_ts"), col("event_id").as("a_id"))
        val b = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("b_user"), col("ts").as("b_ts"), col("event_id").as("b_id"))
        a.join(b, col("user_id") === col("b_user") &&
            col("b_ts") >= col("a_ts") &&
            col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
          .select(col("user_id"), col("a_id"), col("b_id"))
          .orderBy("user_id", "a_id", "b_id")
      },
      Some("""SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id
             |FROM events a JOIN events b ON a.user_id = b.user_id
             |  AND a.event_type = 'click' AND b.event_type = 'purchase'
             |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
             |ORDER BY a.user_id, a_id, b_id""".stripMargin)),

    // Sequence-pattern matching over user journeys ([[EventOps.
    // journeyMatch]] — MATCH_RECOGNIZE-lite): each user's events
    // collapse deterministically ((ts, id) total order) into an
    // initials string, classified by regexes: converted at all
    // (signup … purchase), and converted with NO error in between.
    // One keyed aggregate + a regex projection; the oracle rebuilds
    // the identical journeys with string_agg ORDER BY.
    Q("ev_sequence_match",
      (s, dir) => EventOps.journeyMatch(
        Tables.events(s, dir).filter(col("user_id") < 300),
        "user_id", "event_type", "ts", "event_id",
        Seq("converted" -> "s.*p", "clean_conversion" -> "s[^e]*p"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |       string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey,
             |       regexp_matches(string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
             |                      's.*p') AS converted,
             |       regexp_matches(string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
             |                      's[^e]*p') AS clean_conversion
             |FROM events WHERE user_id < 300
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Fixed-domain pivot on event type (conditional aggregation).
    Q("ev_pivot",
      (s, dir) => EventOps.pivotByType(Tables.events(s, dir)).orderBy("user_id"),
      Some(s"""SELECT user_id,
              |${EventOps.EventTypes.map(t =>
                 s"  count(CASE WHEN event_type = '$t' THEN 1 END) AS n_$t").mkString(",\n")}
              |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Sequential conversion funnel signup → view → click → purchase:
    // each stage's reach time is the user's earliest stage event
    // STRICTLY AFTER reaching the previous stage. The oracle replays
    // the same stage chain as CTEs.
    Q("ev_funnel",
      (s, dir) => EventOps.funnel(Tables.events(s, dir),
        "user_id", "event_type", "ts", Seq("signup", "view", "click", "purchase"))
        .orderBy("stage_idx"),
      Some(funnelOracleSql)),

    // A/B experiment readout ([[EventOps.abTest]]): users split by
    // user_id parity, converted = any purchase event; per-variant
    // counts/rates plus the pooled two-proportion z statistic — exact
    // integer sufficient statistics through a fixed IEEE epilogue, so
    // the z score hashes bit-for-bit (the pearsonByKey contract).
    Q("ev_ab_test",
      (s, dir) => EventOps.abTest(Tables.events(s, dir),
        "user_id", "event_type", "purchase", pmod(col("user_id"), lit(2))),
      Some("""WITH pu AS (SELECT user_id % 2 AS v, user_id,
             |         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv
             |       FROM events GROUP BY 1, 2),
             |agg AS (SELECT
             |    CAST(count(CASE WHEN v = 0 THEN 1 END) AS BIGINT) AS n_a,
             |    CAST(coalesce(sum(CASE WHEN v = 0 THEN conv END), 0) AS BIGINT) AS c_a,
             |    CAST(count(CASE WHEN v = 1 THEN 1 END) AS BIGINT) AS n_b,
             |    CAST(coalesce(sum(CASE WHEN v = 1 THEN conv END), 0) AS BIGINT) AS c_b
             |  FROM pu)
             |SELECT n_a, c_a, CAST(c_a AS DOUBLE) / n_a AS rate_a,
             |       n_b, c_b, CAST(c_b AS DOUBLE) / n_b AS rate_b,
             |       CASE WHEN n_a = 0 OR n_b = 0 OR
             |              sqrt(((CAST(c_a AS DOUBLE) + c_b) / (CAST(n_a AS DOUBLE) + n_b))
             |                * (1.0 - (CAST(c_a AS DOUBLE) + c_b) / (CAST(n_a AS DOUBLE) + n_b))
             |                * (1.0 / n_a + 1.0 / n_b)) = 0.0 THEN NULL
             |            ELSE (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b) /
             |              sqrt(((CAST(c_a AS DOUBLE) + c_b) / (CAST(n_a AS DOUBLE) + n_b))
             |                * (1.0 - (CAST(c_a AS DOUBLE) + c_b) / (CAST(n_a AS DOUBLE) + n_b))
             |                * (1.0 / n_a + 1.0 / n_b)) END AS z_score
             |FROM agg""".stripMargin)),

    // CUPED variance-reduced A/B lift ([[EventOps.cupedLift]] —
    // Deng–Xu–Kohavi–Walker '13, the experimentation-platform
    // standard): per user X = first-half spend (pre-period covariate,
    // integer cents), Y = second-half spend; θ = cov/var fit POOLED
    // from exact DECIMAL(38)/HUGEINT second moments (ONE rounded
    // conversion each), adjusted lift = lift − θ·Δmean_x, var_ratio =
    // 1 − cov²/(var·var) — the sample-size discount CUPED buys. Every
    // degenerate denominator NULL-gates identically in both engines.
    Q("ev_cuped",
      (s, dir) => EventOps.cupedLift(Tables.events(s, dir),
        "user_id", "ts", "value", pmod(col("user_id"), lit(2))),
      Some(s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS us,
              |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events),
              |b AS (SELECT (MIN(us) + MAX(us)) // 2 AS cut FROM ev),
              |pu AS (SELECT user_id, user_id % 2 AS v,
              |    CAST(COALESCE(SUM(CASE WHEN us < (SELECT cut FROM b) THEN c END), 0) AS BIGINT) AS x,
              |    CAST(COALESCE(SUM(CASE WHEN us >= (SELECT cut FROM b) THEN c END), 0) AS BIGINT) AS y
              |  FROM ev GROUP BY 1, 2),
              |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
              |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
              |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
              |    SUM(CAST(y AS HUGEINT) * y) AS syy,
              |    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
              |    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN x END), 0) AS BIGINT) AS sx_a,
              |    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN y END), 0) AS BIGINT) AS sy_a,
              |    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
              |    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN x END), 0) AS BIGINT) AS sx_b,
              |    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN y END), 0) AS BIGINT) AS sy_b
              |  FROM pu),
              |mm AS (SELECT n, n_a, n_b, sx_a, sx_b, sy_a, sy_b,
              |    ${Det.hiLoDoubleSql("CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx")} AS vx,
              |    ${Det.hiLoDoubleSql("CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy")} AS vy,
              |    ${Det.hiLoDoubleSql("CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy")} AS cxy
              |  FROM agg),
              |ep AS (SELECT n, n_a, n_b, vy, cxy,
              |    CASE WHEN vx > 0 THEN cxy / vx END AS theta,
              |    CASE WHEN vx > 0 AND vy > 0 THEN 1.0 - cxy * cxy / vx / vy END AS var_ratio,
              |    CASE WHEN n_a > 0 THEN CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 END AS mean_x_a,
              |    CASE WHEN n_b > 0 THEN CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 END AS mean_x_b,
              |    CASE WHEN n_a > 0 THEN CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 END AS mean_y_a,
              |    CASE WHEN n_b > 0 THEN CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 END AS mean_y_b
              |  FROM mm)
              |SELECT n, n_a, n_b, theta, mean_y_a, mean_y_b,
              |  mean_y_b - mean_y_a AS lift,
              |  mean_y_b - mean_y_a - theta * (mean_x_b - mean_x_a) AS lift_adj,
              |  var_ratio
              |FROM ep""".stripMargin)),

    // DIFFERENCE-IN-DIFFERENCES lift ([[EventOps.didLift]]) — the
    // quasi-experimental companion on ev_cuped's per-user pre/post
    // panel: each arm's own pre-period mean is its counterfactual, so
    // did = (post_b − pre_b) − (post_a − pre_a) nets out arm-level
    // baselines and common time trends — the readout when assignment
    // wasn't randomized. Exact cents to arm sums, fixed double
    // formulas, empty arms NULL-gated in both engines.
    Q("ev_did",
      (s, dir) => EventOps.didLift(Tables.events(s, dir),
        "user_id", "ts", "value", pmod(col("user_id"), lit(2))),
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) AS us,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events),
             |b AS (SELECT (MIN(us) + MAX(us)) // 2 AS cut FROM ev),
             |pu AS (SELECT user_id, user_id % 2 AS v,
             |    CAST(COALESCE(SUM(CASE WHEN us < (SELECT cut FROM b) THEN c END), 0) AS BIGINT) AS x,
             |    CAST(COALESCE(SUM(CASE WHEN us >= (SELECT cut FROM b) THEN c END), 0) AS BIGINT) AS y
             |  FROM ev GROUP BY 1, 2),
             |agg AS (SELECT
             |    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN x END), 0) AS BIGINT) AS sx_a,
             |    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN y END), 0) AS BIGINT) AS sy_a,
             |    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN x END), 0) AS BIGINT) AS sx_b,
             |    CAST(COALESCE(SUM(CASE WHEN v = 1 THEN y END), 0) AS BIGINT) AS sy_b
             |  FROM pu),
             |m AS (SELECT n_a, n_b,
             |    CASE WHEN n_a > 0 THEN CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 END AS pre_a,
             |    CASE WHEN n_a > 0 THEN CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 END AS post_a,
             |    CASE WHEN n_b > 0 THEN CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 END AS pre_b,
             |    CASE WHEN n_b > 0 THEN CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 END AS post_b
             |  FROM agg)
             |SELECT n_a, n_b, pre_a, post_a, pre_b, post_b,
             |  post_a - pre_a AS delta_a,
             |  post_b - pre_b AS delta_b,
             |  (post_b - pre_b) - (post_a - pre_a) AS did
             |FROM m""".stripMargin)),

    // Time-to-convert per funnel step ([[EventOps.funnelLatency]]):
    // reach-time differences per consecutive stage pair in exact
    // integer microseconds (fractional epoch seconds truncate
    // differently across engines), with n/min/p50/max per step — the
    // latency read product analytics puts next to the funnel counts.
    // p50 is an exact percentile over integers at a binary-exact
    // fraction, so quantile_cont mirrors it bit-for-bit.
    Q("ev_time_to_convert",
      (s, dir) => EventOps.funnelLatency(Tables.events(s, dir),
        "user_id", "event_type", "ts", Seq("signup", "view", "click", "purchase"))
        .orderBy("step_idx"),
      Some("""WITH e AS (SELECT user_id AS u, event_type AS et, ts AS t FROM events),
             |r1 AS (SELECT u, min(t) AS tr FROM e WHERE et = 'signup' GROUP BY u),
             |r2 AS (SELECT e.u, min(e.t) AS tr FROM e JOIN r1 ON e.u = r1.u
             |       WHERE e.et = 'view' AND e.t > r1.tr GROUP BY e.u),
             |r3 AS (SELECT e.u, min(e.t) AS tr FROM e JOIN r2 ON e.u = r2.u
             |       WHERE e.et = 'click' AND e.t > r2.tr GROUP BY e.u),
             |r4 AS (SELECT e.u, min(e.t) AS tr FROM e JOIN r3 ON e.u = r3.u
             |       WHERE e.et = 'purchase' AND e.t > r3.tr GROUP BY e.u),
             |lat AS (
             |  SELECT 1 AS step_idx, 'signup' AS from_stage, 'view' AS to_stage,
             |         epoch_us(b.tr) - epoch_us(a.tr) AS lat
             |  FROM r2 b JOIN r1 a ON b.u = a.u
             |  UNION ALL
             |  SELECT 2, 'view', 'click', epoch_us(b.tr) - epoch_us(a.tr)
             |  FROM r3 b JOIN r2 a ON b.u = a.u
             |  UNION ALL
             |  SELECT 3, 'click', 'purchase', epoch_us(b.tr) - epoch_us(a.tr)
             |  FROM r4 b JOIN r3 a ON b.u = a.u)
             |SELECT step_idx, from_stage, to_stage,
             |       CAST(count(*) AS BIGINT) AS n_converted,
             |       CAST(min(lat) AS BIGINT) AS min_us,
             |       quantile_cont(lat, 0.5) AS p50_us,
             |       CAST(max(lat) AS BIGINT) AS max_us
             |FROM lat GROUP BY 1, 2, 3 ORDER BY step_idx""".stripMargin)),

    // Windowed funnel: each stage must land within 1 day of reaching
    // the previous stage — the bounded-step semantics real product
    // funnels use. Same chain plan as ev_funnel plus one range
    // predicate per stage join.
    Q("ev_funnel_windowed",
      (s, dir) => EventOps.funnelWindowed(Tables.events(s, dir),
        "user_id", "event_type", "ts", Seq("signup", "view", "click", "purchase"),
        expr("INTERVAL 1 DAY"))
        .orderBy("stage_idx"),
      Some("""WITH e AS (SELECT user_id AS u, event_type AS et, ts AS t FROM events),
             |r1 AS (SELECT u, min(t) AS tr FROM e WHERE et = 'signup' GROUP BY u),
             |r2 AS (SELECT e.u, min(e.t) AS tr FROM e JOIN r1 ON e.u = r1.u
             |       WHERE e.et = 'view' AND e.t > r1.tr
             |         AND e.t <= r1.tr + INTERVAL 1 DAY GROUP BY e.u),
             |r3 AS (SELECT e.u, min(e.t) AS tr FROM e JOIN r2 ON e.u = r2.u
             |       WHERE e.et = 'click' AND e.t > r2.tr
             |         AND e.t <= r2.tr + INTERVAL 1 DAY GROUP BY e.u),
             |r4 AS (SELECT e.u, min(e.t) AS tr FROM e JOIN r3 ON e.u = r3.u
             |       WHERE e.et = 'purchase' AND e.t > r3.tr
             |         AND e.t <= r3.tr + INTERVAL 1 DAY GROUP BY e.u)
             |SELECT 1 AS stage_idx, 'signup' AS stage, (SELECT count(*) FROM r1) AS n_users
             |UNION ALL
             |SELECT 2, 'view', (SELECT count(*) FROM r2)
             |UNION ALL
             |SELECT 3, 'click', (SELECT count(*) FROM r3)
             |UNION ALL
             |SELECT 4, 'purchase', (SELECT count(*) FROM r4)
             |ORDER BY stage_idx""".stripMargin)),

    // Cohort retention triangle: users bucketed by first-activity date,
    // later active days land in that cohort's day_offset cell. Events
    // are thinned (event_id % 13) so first-activity dates actually
    // spread across the month instead of collapsing onto day one.
    Q("ev_retention",
      (s, dir) => EventOps.retentionCohorts(
        Tables.events(s, dir).filter(col("event_id") % 13 === 0), "user_id", "ts")
        .orderBy("cohort_d", "day_offset"),
      Some(retentionOracleSql)),

    // The streaming surface's oracle-hashed entry (every other streaming
    // op is unit-verified by batch parity — the driver oracle cannot run
    // a stream, but it CAN hash the FINAL warehouse table a sink
    // maintains): the events table replayed as a file stream in small
    // micro-batches through [[StreamOps.retentionSink]] (foreachBatch
    // insert-only + min-merge into two compact warehouse tables), then
    // the retention triangle derived from the maintained tables. Same
    // oracle as ev_retention — the sink's incremental merges must land
    // exactly where the one-shot batch aggregation lands.
    Q("stream_retention_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_ret_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        // fresh state every run: a retained checkpoint alongside dropped
        // tables would claim the files were processed and emit nothing
        fs.delete(base, true)
        // stage the (thinned, ts-normalized) events as a DIRECTORY of
        // several files — the file stream source needs a dir, and
        // maxFilesPerTrigger=1 then replays it as real micro-batches so
        // the sink's insert-only/min merges actually merge across them
        val staged = s"$base/in"
        Tables.events(s, dir).filter(col("event_id") % 13 === 0)
          .repartition(4).write.parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(2))
        val wh = new Warehouse(s, s"$base/wh")
        StreamOps.retentionSink(stream, wh, "silver", s"$base/ckpt").awaitTermination()
        StreamOps.retentionFromWarehouse(wh, "silver")
          .orderBy("cohort_d", "day_offset")
      },
      Some(retentionOracleSql)),

    // Partition-pruned streaming MERGE, oracle-hashed end state: the
    // recomputed Apr-Sep 1996 gold months arrive as a micro-batched
    // stream and upsert into the ano-partitioned snapshot table via
    // [[StreamOps.upsertPartitionsSink]] — per batch, only ano=1996 is
    // read and rewritten, every other year's files ride along by
    // manifest reference, and batch-id txn tags make replays no-ops.
    // The final table must land exactly on the batch splice
    // (m_snapshot_upsert's oracle), whatever the batch boundaries were.
    Q("stream_upsert_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_ups_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        def gold(src: DataFrame) =
          graft.ops.StockOps.goldMonthly(graft.ops.StockOps.silverDaily(
            graft.ops.StockOps.bronzeFromLineitem(src)))
        val li = Tables.lineitem(s, dir)
        val cut = java.sql.Timestamp.valueOf("1996-06-15 00:00:00")
        st.overwrite(gold(li.filter(col("l_shipdate") < lit(cut))),
          "gold", "monthly", Seq("ano"))
        // stage the recomputed months as one file per month → real
        // micro-batches through the sink (2 files per trigger)
        val staged = s"$base/in"
        gold(li).filter(col("ano") === 1996 && col("mes").between(4, 9))
          .repartition(6, col("mes")).write.parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(2))
        StreamOps.upsertPartitionsSink(stream, st, "gold", "monthly",
          keys = Seq("sigla_empresa", "ano", "mes"), partitionBy = Seq("ano"),
          checkpoint = s"$base/ckpt").awaitTermination()
        st.read("gold", "monthly")
          .select("sigla_empresa", "ano", "mes", "data_inicio_mes",
            "volume_total_mensal", "preco_medio_fechamento_mensal",
            "maximo_mensal", "minimo_mensal")
          .orderBy("sigla_empresa", "ano", "mes")
      },
      Some(s"""WITH prev_g AS (${graft.ops.StockOps.goldSql("WHERE l_shipdate < TIMESTAMP '1996-06-15 00:00:00'")}),
              |curr_g AS (${graft.ops.StockOps.goldSql()})
              |SELECT * FROM prev_g WHERE ano <> 1996
              |UNION ALL
              |SELECT * FROM prev_g WHERE ano = 1996 AND mes < 4
              |UNION ALL
              |SELECT * FROM curr_g WHERE ano = 1996 AND mes BETWEEN 4 AND 9
              |ORDER BY sigla_empresa, ano, mes""".stripMargin)),

    // Streaming RESTATEMENT sink, oracle-hashed end state
    // ([[StreamOps.replaceWhereSink]] → [[SnapshotStore.replaceWhere]]):
    // 1996's months arrive as restatement batches (doubled prices,
    // whole months per file via month-hash repartition) and each batch
    // ATOMICALLY replaces exactly its own months' slice — one snapshot
    // per batch, txn-tagged so a checkpoint replay is a no-op. The end
    // state must equal "every other year untouched + 1996 restated".
    Q("stream_replace_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_rw_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        val o = Tables.orders(s, dir).select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).cast(DateType).as("m"),
          col("o_totalprice"))
        st.overwrite(o, "silver", "ord")
        val staged = s"$base/in"
        o.filter(year(col("m")) === 1996)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
          .repartition(4, col("m")).write.parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        StreamOps.replaceWhereSink(stream, st, "silver", "ord",
          sliceOf = b => col("m").isInCollection(
            b.select("m").distinct().collect().map(_.getDate(0)).toSeq),
          checkpoint = s"$base/ckpt").awaitTermination()
        st.read("silver", "ord").orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             |       o_totalprice
             |FROM orders WHERE year(o_orderdate) <> 1996
             |UNION ALL
             |SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             |       o_totalprice * 2 AS o_totalprice
             |FROM orders WHERE year(o_orderdate) = 1996
             |ORDER BY o_orderkey""".stripMargin)),

    // Streaming EXACT heavy hitters, oracle-hashed end state
    // ([[StreamOps.keyedCountsSink]]): the token stream's per-batch
    // (token, cnt) partials append exactly-once; re-summing the
    // maintained table IS the corpus term-count relation, so the
    // heavy-hitter epilogue (count > ⌊φ·total⌋) lands exactly on the
    // batch GROUP BY/HAVING — continuous frequent-term monitoring
    // whose maintained state is batches × touched tokens, with no raw
    // token retention and replay-proof commits. Same oracle semantics
    // as t_heavy_hitters.
    Q("stream_heavy_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_hh_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val tok = Tables.documents(s, dir)
          .select(explode(TextOps.tokens(col("text"))).as("w"))
        val staged = s"$base/in"
        tok.repartition(4).write.parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        StreamOps.keyedCountsSink(stream, st, "metrics", "term_counts",
          Seq("w"), checkpoint = s"$base/ckpt").awaitTermination()
        val counts = st.read("metrics", "term_counts")
          .groupBy("w").agg(sum("cnt").as("n"))
        val total = counts.agg(sum("n").as("t"))
        counts.crossJoin(broadcast(total))
          .filter(col("n") > floor(lit(0.005) * col("t").cast(DoubleType)).cast(LongType))
          .select(col("w").as("token"), col("n").cast(LongType).as("n_occ"))
          .orderBy("token")
      },
      Some(s"""WITH tok AS (SELECT unnest(${TextOps.tokensSql("text")}) AS w FROM documents),
              |nn AS (SELECT count(*) AS n FROM tok)
              |SELECT w AS token, CAST(count(*) AS BIGINT) AS n_occ FROM tok GROUP BY 1
              |HAVING count(*) > (SELECT CAST(floor(0.005 * n) AS BIGINT) FROM nn)
              |ORDER BY token""".stripMargin)),

    // Streaming Benford drift monitor, oracle-hashed end state — the
    // continuous form of prof_benford's data-quality screen: per-batch
    // first-digit count partials append exactly-once
    // ([[StreamOps.keyedCountsSink]], replay-proof txn tags); digit
    // counts are ADDITIVE, so re-summing the maintained table equals
    // the single-pass corpus counts for ANY batching, and the shared
    // epilogue ([[Profile.benfordFromCounts]] — same inlined
    // expectation literals) lands bit-for-bit on the batch query's
    // oracle. State = batches × ≤9 digit rows; raw values never
    // retained.
    Q("stream_benford_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_benford_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val digitsIn = Tables.lineitem(s, dir).select(
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("pc"))
          .filter(col("pc").isNotNull && col("pc") > 0)
          .select(substring(col("pc").cast(StringType), 1, 1)
            .cast(LongType).as("digit"))
        val staged = s"$base/in"
        digitsIn.repartition(4).write.parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        StreamOps.keyedCountsSink(stream, st, "metrics", "digit_counts",
          Seq("digit"), checkpoint = s"$base/ckpt").awaitTermination()
        Profile.benfordFromCounts(
          st.read("metrics", "digit_counts")
            .groupBy("digit").agg(sum("cnt").as("n")))
          .orderBy("digit")
      },
      Some(Profile.benfordSql(
        "(SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents FROM lineitem)",
        "price_cents") + "\nORDER BY digit")),

    // Streaming CDC APPLY, oracle-hashed end state ([[StreamOps
    // .cdcApplySink]]): a change feed derived from lineitem — per
    // order key, line numbers are successive versions (op 'u'), and
    // every 7th key's final change is a DELETE — replays as
    // sequence-ordered micro-batches (one staged file per version,
    // written in order) into a warehouse table. Within each batch only
    // the key's highest-sequence change applies; deletes remove rows
    // an earlier batch upserted. The drained table must equal the
    // last-version-per-surviving-key relation — the Debezium-consumer
    // contract, hash-verified.
    Q("stream_cdc_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_cdc_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val li = Tables.lineitem(s, dir)
        val mx = li.groupBy(col("l_orderkey")).agg(max("l_linenumber").as("__mx"))
        // the synthetic lineitem repeats (orderkey, linenumber) pairs,
        // so the CDC sequence tie-breaks by the quantity's exact cents
        // — a unique-enough total order (rows tying on ALL of key,
        // linenumber, and qty are identical payloads, so either wins)
        val feed = li.join(mx, Seq("l_orderkey"))
          .select(col("l_orderkey").as("k"),
            (col("l_linenumber").cast(LongType) * 10000000L +
              expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("seq"),
            when(col("l_orderkey") % 7 === 0 && col("l_linenumber") === col("__mx"),
              lit("d")).otherwise(lit("u")).as("op"),
            col("l_quantity").as("qty"),
            col("l_linenumber").as("__v"))
        val staged = s"$base/in"
        // one file per version number in ONE pass (hive-partitioned by
        // version, repartitioned so each dir is a single file), then
        // explicit mtimes force the file source's replay order — the
        // 7 sequential per-version writes this replaces re-scanned the
        // feed 7 times for pure fixture setup
        feed.repartition(col("__v")).write.partitionBy("__v").parquet(staged)
        val t0 = System.currentTimeMillis - 70000
        (1 to 7).foreach { v =>
          val dir = new org.apache.hadoop.fs.Path(s"$staged/__v=$v")
          fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
            .foreach(st => fs.setTimes(st.getPath, t0 + v * 1000L, -1))
        }
        val wh = new graft.engine.Warehouse(s, s"$base/wh", keepVersions = 0)
        wh.dropTable("serve", "orders_cdc")
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
          .drop("__v") // the hive staging dir column is not feed payload
        // per-batch plans (window + merge + table write) bill fixed
        // cost per shuffle partition × batch — scope the fan-out for
        // the drive (restored in finally), the stream_join lesson
        val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
        try {
          s.conf.set("spark.sql.shuffle.partitions", "8")
          StreamOps.cdcApplySink(stream, wh, "serve", "orders_cdc",
            keys = Seq("k"), seqCol = "seq", opCol = "op",
            checkpoint = s"$base/ckpt").awaitTermination()
        } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        wh.read("serve", "orders_cdc").orderBy("k")
      },
      Some("""SELECT k, qty FROM (
             |  SELECT l_orderkey AS k, l_quantity AS qty,
             |         row_number() OVER (PARTITION BY l_orderkey
             |           ORDER BY l_linenumber DESC,
             |             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) DESC) AS rn
             |  FROM lineitem)
             |WHERE rn = 1 AND k % 7 <> 0
             |ORDER BY k""".stripMargin)),

    // PARTITION-PRUNED streaming CDC apply, oracle-hashed end state
    // ([[StreamOps.cdcApplyPrunedSink]] →
    // [[graft.engine.SnapshotStore.cdcApplyPartitions]]) — the 100 TB
    // form of stream_cdc_final's full-table-per-batch merge: the
    // maintained table is partitioned by the key bucket kb = k % 8,
    // seeded with every key's version-1 row, and the same Debezium
    // feed arrives as one micro-batch PER BUCKET (key-disjoint
    // batches satisfy the per-key sequence-order contract trivially,
    // and each key's whole history collapses inside its one batch),
    // so each batch reads and rewrites exactly ONE partition of
    // eight off a pinned snapshot — upserts and deletes in one
    // txn-tagged commit. Bucket 5 is withheld from the feed: its keys
    // must surface their SEED rows unchanged, and — the pruning proof
    // a result hash alone cannot give — its PHYSICAL FILES must ride
    // through all seven commits by manifest reference, asserted
    // in-query on file identity.
    Q("stream_cdc_pruned_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_cdcp_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        // same feed as stream_cdc_final (versions = line numbers, every
        // 7th key's last change is a delete), plus the partition bucket;
        // __mx via a whole-partition window (one shuffle, no agg+join).
        // Feed + seed are the pre-existing CDC log and maintained-table
        // baseline, not the sink's work — fixture-cached per JVM like
        // stream_nn_final's seed graph (Bench's min-of-samples then
        // times the sink loop, not the log derivation).
        val feed = cachedNnGraph(s, dir, "cdcp_feed") {
          val li = Tables.lineitem(s, dir)
          val wk = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
          li.withColumn("__mx", max("l_linenumber").over(wk))
            .select((col("l_orderkey") % 8).cast(IntegerType).as("kb"),
              col("l_orderkey").as("k"),
              (col("l_linenumber").cast(LongType) * 10000000L +
                expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("seq"),
              when(col("l_orderkey") % 7 === 0 && col("l_linenumber") === col("__mx"),
                lit("d")).otherwise(lit("u")).as("op"),
              col("l_quantity").as("qty"),
              col("l_linenumber").as("__v"))
        }
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        // seed = each key's version-1 row (synthetic lineitem repeats
        // (orderkey, linenumber) pairs; ties collapse by the same
        // cents-sequence the feed orders by)
        val seed = cachedNnGraph(s, dir, "cdcp_seed") {
          val w1 = org.apache.spark.sql.expressions.Window
            .partitionBy("kb", "k").orderBy(col("seq").desc)
          feed.filter(col("__v") === 1)
            .withColumn("__rn", row_number().over(w1)).filter(col("__rn") === 1)
            .select("kb", "k", "qty")
        }
        st.overwrite(seed, "serve", "orders_cdc", Seq("kb"))
        val seedFiles5 = st.read("serve", "orders_cdc")
          .inputFiles.filter(_.contains("kb=5")).toSet
        // one staged file per bucket (hive dir per kb, one file each);
        // bucket 5 withheld. Batch ORDER is immaterial here — batches
        // are key-disjoint — so no mtime pinning is needed. Staged
        // OUTSIDE base: the deterministic log is written once per JVM
        // and survives the per-run store/checkpoint wipe.
        val staged = cdcpStagedDirs.computeIfAbsent(
          s"${System.identityHashCode(s)}#$dir", { _ =>
            val p = s"/tmp/graft_cdcp_in_${new java.io.File(dir).getName}"
            val pp = new org.apache.hadoop.fs.Path(p)
            fs.delete(pp, true)
            feed.filter(col("kb") =!= 5).drop("__v")
              .repartition(col("kb")).write.partitionBy("kb").parquet(p)
            p
          })
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
        try {
          s.conf.set("spark.sql.shuffle.partitions", "8")
          StreamOps.cdcApplyPrunedSink(stream, st, "serve", "orders_cdc",
            keys = Seq("kb", "k"), seqCol = "seq", opCol = "op",
            partitionBy = Seq("kb"),
            checkpoint = s"$base/ckpt").awaitTermination()
        } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        val result = st.read("serve", "orders_cdc")
        val finalFiles5 = result.inputFiles.filter(_.contains("kb=5")).toSet
        require(finalFiles5 == seedFiles5,
          s"cdc pruning: untouched partition kb=5 must keep its seed files by " +
            s"reference (seed=${seedFiles5.size}, final=${finalFiles5.size})")
        result.select("k", "qty").orderBy("k")
      },
      Some("""SELECT k, qty FROM (
             |  SELECT l_orderkey AS k, l_quantity AS qty,
             |         row_number() OVER (PARTITION BY l_orderkey
             |           ORDER BY l_linenumber DESC,
             |             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) DESC) AS rn
             |  FROM lineitem)
             |WHERE rn = 1 AND k % 7 <> 0 AND k % 8 <> 5
             |UNION ALL
             |SELECT k, qty FROM (
             |  SELECT l_orderkey AS k, l_quantity AS qty,
             |         row_number() OVER (PARTITION BY l_orderkey
             |           ORDER BY CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) DESC) AS rn
             |  FROM lineitem WHERE l_linenumber = 1)
             |WHERE rn = 1 AND k % 8 = 5
             |ORDER BY k""".stripMargin)),

    // Streaming SESSION WINDOWS, oracle-hashed end state ([[StreamOps
    // .sessionsStream]]): the event corpus replays as real micro-
    // batches into the state-store-backed `session_window` aggregate —
    // per-key sessions merge as their member events arrive in whatever
    // order the replay produces, and a session emits exactly once when
    // the watermark passes its end. The delay horizon exceeds the
    // corpus span (no real row can be late-dropped), and one far-
    // future sentinel row — written LAST so the file source replays it
    // last — pushes the final watermark past every real session's
    // end, closing them. The drained result must equal the batch
    // gaps-and-islands sessionization EXACTLY (same oracle as
    // ev_sessions). On live feeds the same plan holds only OPEN
    // sessions per key and evicts closed ones — bounded state at any
    // event rate, where the batch window-function form re-sorts
    // everything per run.
    Q("stream_sessions_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_sess_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val ev = Tables.events(s, dir).select(col("ts"), col("user_id"))
        val staged = s"$base/in"
        ev.repartition(4).write.parquet(staged)
        // sentinel AFTER the corpus files (modification order = replay
        // order): watermark = 2999-01-01 − 100 years clears every real
        // session end while never reaching real data from the real files
        s.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(
            java.sql.Timestamp.valueOf("2999-01-01 00:00:00"), -1L)),
          s.read.parquet(staged).schema)
          .write.mode("append").parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        val mem = s"sess_${java.util.UUID.randomUUID.toString.replace("-", "")}"
        val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
        try {
          s.conf.set("spark.sql.shuffle.partitions", "8")
          StreamOps.runAvailableNowToMemory(
            StreamOps.sessionsStream(stream, gap = "30 minutes", delay = "36500 days"),
            mem, s"$base/ckpt_$mem")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        s.table(mem).filter(col("user_id") =!= -1L)
          .select(col("user_id"), col("session_start"), col("session_end"),
            col("n_events"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH m AS (SELECT user_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |g AS (SELECT user_id, ts,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM m)
             |SELECT user_id, min(ts) AS session_start,
             |       max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
             |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),

    // Streaming dedup, oracle-hashed end state ([[StreamOps.
    // dedupWithinWatermark]]): the corpus arrives with every fifth
    // event DUPLICATED (exact copies, so which copy survives is
    // irrelevant — what makes a first-row-wins stream operator
    // hash-verifiable at all), replayed as real micro-batches; the
    // built-in watermarked dedup state drops the twins across
    // whatever batch boundaries the replay produced, and the drained
    // set must equal SELECT DISTINCT. Horizon > corpus span ⇒ no twin
    // ever outlives the state; on live feeds the same plan evicts
    // per-key state past the watermark — bounded memory.
    Q("stream_dedup_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_dd_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val ev = Tables.events(s, dir).filter(col("event_id") % 7 === 0)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        val withDups = ev.unionByName(ev.filter(col("event_id") % 5 === 0))
        val staged = s"$base/in"
        withDups.repartition(4).write.parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        val deduped = StreamOps.dedupWithinWatermark(stream, Seq("event_id"),
          delay = "3650 days")
        val mem = s"sdd_${java.util.UUID.randomUUID.toString.replace("-", "")}"
        // per-batch state-store commits bill per partition × batch —
        // scope the stateful fan-out down for the drive (restored in
        // finally), the stream_join_final lesson
        val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
        try {
          s.conf.set("spark.sql.shuffle.partitions", "8")
          StreamOps.runAvailableNowToMemory(deduped, mem, s"$base/ckpt_$mem")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        s.table(mem).select(col("event_id"), Det.ntz(col("ts")).as("ts"),
          col("user_id"), col("event_type"))
          .orderBy("event_id")
      },
      Some("""SELECT DISTINCT event_id, ts, user_id, event_type
             |FROM events WHERE event_id % 7 = 0
             |ORDER BY event_id""".stripMargin)),

    // Streaming percentile maintenance, oracle-hashed end state
    // ([[StreamOps.binnedCountsSink]]): order values arrive as real
    // micro-batches; each batch appends its ADDITIVE bin-count
    // partials exactly-once, and the quantile epilogue over the
    // maintained table must land EXACTLY on the batch binned-quantile
    // run over the same data — continuous p50/p95 monitoring with
    // keys × bins state, no raw-value retention, no sort, replay-proof.
    Q("stream_quantiles_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_bq_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val ord = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val staged = s"$base/in"
        ord.repartition(4).write.parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        StreamOps.binnedCountsSink(stream, st, "metrics", "price_bins",
          Seq("o_orderstatus"), "o_totalprice", binWidthCents = 1000000L,
          checkpoint = s"$base/ckpt").awaitTermination()
        Profile.quantilesFromBinCounts(st.read("metrics", "price_bins"),
          Seq("o_orderstatus"), binWidthCents = 1000000L, Seq(0.5, 0.95))
          .orderBy("o_orderstatus")
      },
      Some(s"""WITH b1 AS (SELECT o_orderstatus,
              |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 1000000 AS bin
              |  FROM orders),
              |n1 AS (SELECT o_orderstatus, bin, CAST(count(*) AS BIGINT) AS cnt
              |       FROM b1 GROUP BY 1, 2),
              |c1 AS (SELECT o_orderstatus, bin, cnt,
              |    CAST(SUM(cnt) OVER (PARTITION BY o_orderstatus ORDER BY bin
              |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
              |    CAST(SUM(cnt) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS n
              |  FROM n1)
              |SELECT o_orderstatus, ${Profile.binnedQuantileSql(0.5, 1000000L)},
              |       ${Profile.binnedQuantileSql(0.95, 1000000L)}
              |FROM c1 GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Stream-STREAM join, oracle-hashed end state: clicks and purchases
    // arrive on TWO independent file streams (1 file per trigger = real
    // interleaved micro-batches), joined per user under a time bound by
    // [[StreamOps.correlatedStreams]] — both state stores keyed by
    // user, rows matched across whatever batch boundaries the replay
    // produced. The out-of-order horizon exceeds the corpus span, so
    // no row is late and the drained result must equal ev_correlated's
    // batch join EXACTLY — same oracle. On live feeds the same plan
    // evicts state once the watermark passes delay+within.
    Q("stream_join_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_jn_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        // a deterministic third of the users: the join shape (two live
        // state stores, cross-batch matching) is what's under test, and
        // micro-batched state-store commits bill per batch — 2 files a
        // side keeps the replay at two real interleaved triggers
        val ev = Tables.events(s, dir)
          .filter(col("user_id") % 3 === 0)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        val (inA, inB) = (s"$base/a", s"$base/b")
        ev.filter(col("event_type") === "click").repartition(2).write.parquet(inA)
        ev.filter(col("event_type") === "purchase").repartition(2).write.parquet(inB)
        val sa = StreamOps.eventStream(s, inA, s.read.parquet(inA).schema, Some(1))
        val sb = StreamOps.eventStream(s, inB, s.read.parquet(inB).schema, Some(1))
        val joined = StreamOps.correlatedStreams(sa, sb, "1 hour",
          delay = Some("3650 days"))
          .select(col("user_id"), col("a_id"), col("b_id"))
        val mem = s"sjf_${java.util.UUID.randomUUID.toString.replace("-", "")}"
        // per-batch state-store commits scale with the stateful shuffle
        // fan-out (2 stores × partitions × batches of driver-side file
        // traffic at this scale) — scope it down for the drive, restore
        // after; on a real cluster this is sized to executor count
        val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
        try {
          s.conf.set("spark.sql.shuffle.partitions", "8")
          StreamOps.runAvailableNowToMemory(joined, mem, s"$base/ckpt_$mem")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        s.table(mem).orderBy("user_id", "a_id", "b_id")
      },
      Some("""SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id
             |FROM events a JOIN events b ON a.user_id = b.user_id
             |  AND a.user_id % 3 = 0
             |  AND a.event_type = 'click' AND b.event_type = 'purchase'
             |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
             |ORDER BY a.user_id, a_id, b_id""".stripMargin)),

    // Streaming funnel, oracle-hashed end state: the event stream
    // drains through [[StreamOps.funnelEventsSink]] (per micro-batch,
    // an insert-only MERGE into the compacted distinct (user, stage,
    // ts) index — the minimal sufficient input, since per-stage minima
    // cannot merge incrementally under late events), then the funnel
    // derived from the maintained index must land exactly on the
    // one-shot batch funnel's oracle, whatever the batch boundaries.
    Q("stream_funnel_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_fun_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val staged = s"$base/in"
        Tables.events(s, dir).repartition(4).write.parquet(staged)
        val stages = Seq("signup", "view", "click", "purchase")
        val wh = new Warehouse(s, s"$base/wh")
        StreamOps.funnelEventsSink(
          StreamOps.eventStream(s, staged, s.read.parquet(staged).schema,
            maxFilesPerTrigger = Some(2)),
          wh, "silver", stages, s"$base/ckpt").awaitTermination()
        StreamOps.funnelFromWarehouse(wh, "silver", stages).orderBy("stage_idx")
      },
      Some(funnelOracleSql)),

    // Streaming transition matrix, oracle-hashed end state: same
    // compacted-index argument ([[StreamOps.transitionEventsSink]] —
    // one late event can rewrite two transitions, so per-batch counts
    // cannot merge; the distinct event index can), matrix derived from
    // the maintained index == the batch matrix's oracle.
    Q("stream_transitions_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_trn_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val staged = s"$base/in"
        Tables.events(s, dir).repartition(4).write.parquet(staged)
        val wh = new Warehouse(s, s"$base/wh")
        StreamOps.transitionEventsSink(
          StreamOps.eventStream(s, staged, s.read.parquet(staged).schema,
            maxFilesPerTrigger = Some(2)),
          wh, "silver", s"$base/ckpt").awaitTermination()
        StreamOps.transitionsFromWarehouse(wh, "silver")
          .orderBy("from_type", "to_type")
      },
      Some(transitionsOracleSql)),

    // Streaming DEAD-LETTER QUEUE, oracle-hashed end state
    // ([[StreamOps.quarantineSink]]): the corrupted-payload corpus (every
    // 3rd payload truncated, s11_json_quarantine's exact input) replayed
    // as real micro-batches; per batch the parseable rows land in the
    // `parsed` table and rejects in `quarantine` WITH raw payload, both
    // lanes via txn-tagged exactly-once appends. The WHOLE staged input
    // is then re-streamed from a FRESH checkpoint — same batch ids, same
    // txn tags — and must commit NOTHING (checkpoint-recovery replay),
    // so the hashed union of both final lanes doubles as the idempotence
    // proof. Same oracle as the batch classifier: the two lanes must
    // land exactly where one-shot batch classification lands.
    Q("stream_dlq_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_dlq_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val staged = s"$base/in"
        Tables.events(s, dir).select(col("event_id"),
            when(col("event_id") % 3 === 0, substring(col("props"), 1, 4))
              .otherwise(col("props")).as("props"))
          .repartition(4).write.parquet(staged)
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        // one logical writer identity (Delta's explicit txnAppId form):
        // txn tags are namespaced per sink, so only a writer carrying
        // the SAME sinkId replays as no-ops — a different query into
        // the same table keeps its own txn lane
        def drain(ckpt: String): Unit =
          StreamOps.quarantineSink(
            StreamOps.eventStream(s, staged, s.read.parquet(staged).schema,
              maxFilesPerTrigger = Some(2)),
            st, "silver", ckpt, sinkId = Some("dlq")).awaitTermination()
        drain(s"$base/ckpt")
        val afterFirst = st.snapshots("silver", "parsed").size +
          st.snapshots("silver", "quarantine").size
        // LOST-CHECKPOINT replay: fresh checkpoint, same sinkId, same
        // input → same batch ids, same txn tags, every commit a no-op
        drain(s"$base/ckpt2")
        require(st.snapshots("silver", "parsed").size +
          st.snapshots("silver", "quarantine").size == afterFirst,
          "replayed micro-batches must commit nothing (exactly-once)")
        val good = st.read("silver", "parsed")
          .select(col("event_id"), col("k"), lit(false).as("quarantined"),
            lit(null).cast(StringType).as("raw_payload"))
        val bad = st.read("silver", "quarantine")
          .select(col("event_id"), lit(null).cast(IntegerType).as("k"),
            lit(true).as("quarantined"), col("raw_payload"))
        good.unionByName(bad).orderBy("event_id")
      },
      Some(quarantineOracleSql)),

    // ── Multimodal plumbing ────────────────────────────────────────────

    // Binary payload + batched per-partition decode (stubbed codec —
    // deterministic fake metadata; the mapPartitions batch shape is the
    // real distributed plumbing). Oracle replays the stub arithmetic.
    Q("mm_decode_meta",
      (s, dir) => Multimodal.decodeMeta(s,
        Tables.documents(s, dir).select(col("doc_id"), col("text").cast(BinaryType).as("payload")),
        "doc_id", "payload")
        .orderBy("doc_id"),
      // strlen = BYTE length (Spark hashes the UTF-8 payload bytes);
      // header_hex's substr is char-based — DuckDB has no blob substr,
      // so that one column assumes the corpus's ASCII header bytes
      Some("""SELECT doc_id,
             |  CAST(strlen(text) AS BIGINT) AS byte_len,
             |  lower(hex(substr(text, 1, 8))) AS header_hex,
             |  CAST(64 + (strlen(text) * 2654435761) % 1024 AS INTEGER) AS width,
             |  CAST(64 + (strlen(text) * 40503) % 768 AS INTEGER) AS height,
             |  CAST(1 + strlen(text) % 30 AS INTEGER) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Image multimodal path with a REAL PNG container parse: genuine
    // CRC-verified PNGs (signature + IHDR + IDAT + IEND, network byte
    // order — the opposite endianness of BMP/RIFF) with id-keyed
    // dimensions, decoded by Multimodal.parsePng. The oracle predicts
    // every column analytically from the synthesis formulas — a
    // mis-read offset, a little-endian slip, or a broken CRC check
    // hash-mismatches.
    Q("mm_png_meta",
      (s, dir) => Multimodal.decodeMeta(s,
        Multimodal.synthPngCorpus(s, Tables.documents(s, dir), "doc_id"),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(67 + doc_id % 50 AS BIGINT) AS byte_len,
             |  '89504e470d0a1a0a' AS header_hex,
             |  CAST(16 + doc_id % 128 AS INTEGER) AS width,
             |  CAST(16 + (doc_id * 3) % 128 AS INTEGER) AS height,
             |  CAST(1 AS INTEGER) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Image multimodal path with a REAL JPEG marker-walk parse:
    // genuine JFIF containers (SOI + APP0 + COM padding + SOF0 + EOI)
    // with id-keyed dimensions, decoded by Multimodal.parseJpeg —
    // big-endian segment lengths stepped to the first SOF frame
    // header, truncation-safe. The oracle predicts every column
    // analytically; a mis-stepped segment or endian slip
    // hash-mismatches.
    Q("mm_jpeg_meta",
      (s, dir) => Multimodal.decodeMeta(s,
        Multimodal.synthJpegCorpus(s, Tables.documents(s, dir), "doc_id"),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(45 + doc_id % 40 AS BIGINT) AS byte_len,
             |  'ffd8ffe000104a46' AS header_hex,
             |  CAST(16 + doc_id % 256 AS INTEGER) AS width,
             |  CAST(16 + (doc_id * 5) % 256 AS INTEGER) AS height,
             |  CAST(1 AS INTEGER) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Image multimodal path with a REAL BMP container parse: genuine
    // 24bpp BMPs with id-keyed dimensions, decoded by
    // Multimodal.parseBmp (LE header fields, stride/size sanity). The
    // oracle predicts width/height/byte_len analytically — a mis-read
    // offset or a broken stride computation hash-mismatches.
    Q("mm_image_meta",
      (s, dir) => Multimodal.decodeMeta(s,
        Multimodal.synthBmpCorpus(s, Tables.documents(s, dir), "doc_id"),
        "doc_id", "payload")
        .select(col("doc_id"), col("byte_len"), col("width"), col("height"), col("n_frames"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(54 + ((3 * (16 + doc_id % 64) + 3) // 4) * 4 * (16 + (doc_id * 7) % 64) AS BIGINT) AS byte_len,
             |  CAST(16 + doc_id % 64 AS INTEGER) AS width,
             |  CAST(16 + (doc_id * 7) % 64 AS INTEGER) AS height,
             |  CAST(1 AS INTEGER) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame-sampling + aspect-resize plan over decoded metadata: the
    // columns that tell the (stubbed) codec which frames to decode and
    // at what size — compute pruning BEFORE the expensive work.
    Q("mm_frame_sample",
      (s, dir) => Multimodal.frameSamplePlan(
        Multimodal.decodeMeta(s,
          Tables.documents(s, dir).select(col("doc_id"), col("text").cast(BinaryType).as("payload")),
          "doc_id", "payload"),
        maxFrames = 8, fitBox = 256)
        .orderBy("doc_id"),
      Some("""WITH meta AS (
             |  SELECT doc_id,
             |         CAST(64 + (strlen(text) * 2654435761) % 1024 AS INTEGER) AS width,
             |         CAST(64 + (strlen(text) * 40503) % 768 AS INTEGER) AS height,
             |         CAST(1 + strlen(text) % 30 AS INTEGER) AS n_frames
             |  FROM documents)
             |SELECT doc_id, n_frames,
             |       CAST((n_frames + 7) // 8 AS INTEGER) AS stride,
             |       array_to_string(range(0, CAST(n_frames AS BIGINT), (n_frames + 7) // 8), ',') AS frame_csv,
             |       CAST(floor(width * least(256.0 / width, 256.0 / height, 1.0)) AS INTEGER) AS out_w,
             |       CAST(floor(height * least(256.0 / width, 256.0 / height, 1.0)) AS INTEGER) AS out_h
             |FROM meta ORDER BY doc_id""".stripMargin)),

    // Video multimodal path with a REAL AVI (RIFF) header parse: the
    // corpus is genuine RIFF→LIST(hdrl)→avih containers with id-keyed
    // frame counts and dimensions; the frame-sampling/resize PLAN is
    // then computed from the REAL parsed header — exactly the
    // prune-before-decode pattern (no frame ever decoded to plan the
    // sampling). Oracle predicts header fields + plan analytically.
    Q("mm_video_frames",
      (s, dir) => Multimodal.frameSamplePlan(
        Multimodal.decodeMeta(s,
          Multimodal.synthAviCorpus(s, Tables.documents(s, dir), "doc_id"),
          "doc_id", "payload"),
        maxFrames = 8, fitBox = 256)
        .orderBy("doc_id"),
      Some("""WITH meta AS (
             |  SELECT doc_id,
             |         CAST(320 + (doc_id % 8) * 160 AS INTEGER) AS width,
             |         CAST(240 + (doc_id % 5) * 120 AS INTEGER) AS height,
             |         CAST(10 + doc_id % 120 AS INTEGER) AS n_frames
             |  FROM documents)
             |SELECT doc_id, n_frames,
             |       CAST((n_frames + 7) // 8 AS INTEGER) AS stride,
             |       array_to_string(range(0, CAST(n_frames AS BIGINT), (n_frames + 7) // 8), ',') AS frame_csv,
             |       CAST(floor(width * least(256.0 / width, 256.0 / height, 1.0)) AS INTEGER) AS out_w,
             |       CAST(floor(height * least(256.0 / width, 256.0 / height, 1.0)) AS INTEGER) AS out_h
             |FROM meta ORDER BY doc_id""".stripMargin)),

    // Audio multimodal path with a REAL RIFF/WAV container parse: the
    // corpus is genuine PCM16 WAV bytes synthesized from id-keyed
    // parameters, decoded by Multimodal.parseWav (chunk walk, LE fmt
    // fields, true peak scan over the PCM payload). The oracle predicts
    // every parsed field analytically from the same id arithmetic, so a
    // mis-read header offset or endianness bug hash-mismatches.
    Q("mm_audio_feats",
      (s, dir) => Multimodal.audioFeats(s,
        Multimodal.synthWavCorpus(s, Tables.documents(s, dir), "doc_id"),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(100 + doc_id % 50 AS BIGINT) AS n_samples,
             |  CAST(8000 * (1 + doc_id % 3) AS INTEGER) AS sample_rate,
             |  CAST(100 + doc_id % 50 AS DOUBLE) / (8000 * (1 + doc_id % 3)) AS duration_s,
             |  CAST((doc_id * 997) % 32768 AS INTEGER) AS peak
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Salted two-phase aggregation, oracle-proven equivalent to the
    // plain GROUP BY: a hot key is spread over 16 (key, salt) partials
    // first, so one giant group cannot pin a single reducer. Decimal
    // sums keep phase-merge order irrelevant (exact associativity).
    Q("skew_salted_agg",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
          col("l_quantity").cast(DecimalType(18, 2)).as("q"), col("l_orderkey"))
        graft.ops.Skew.saltedStats(li, "l_returnflag", "q", "l_orderkey", salts = 16)
          .select(col("l_returnflag"), col("n"),
            col("sum_val").cast(DoubleType).as("sum_val"),
            col("min_val").cast(DoubleType).as("min_val"),
            col("max_val").cast(DoubleType).as("max_val"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
             |       CAST(min(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_val,
             |       CAST(max(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_val
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Salted equi-join against a broadcast dim: the big (skewed) side
    // takes a deterministic salt, the 3-row dim is exploded 16× so
    // every (key, salt) bucket matches — the hot returnflag key spreads
    // over 16 tasks instead of pinning one. Result is EXACTLY the
    // plain join (verified by the per-flag count + exact weighted sum);
    // PlanSpec pins the broadcast-no-shuffle shape.
    Q("skew_salted_join",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_returnflag"),
          col("l_quantity").cast(DecimalType(18, 2)).as("q"))
        val dim = Seq(("A", 2L), ("N", 3L), ("R", 5L)).toDF("l_returnflag", "weight")
        graft.ops.Skew.saltedJoinSmallSide(li, dim, "l_returnflag", "l_orderkey", salts = 16)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("q") * col("weight")).cast(DoubleType).as("wsum"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * weight) AS DOUBLE) AS wsum
             |FROM lineitem
             |JOIN (VALUES ('A', 2), ('N', 3), ('R', 5)) d(l_returnflag, weight)
             |  USING (l_returnflag)
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Z-order (Morton curve) layout: interleave the bits of two bounded
    // dimensions and zone the data by z-range. The output proves the
    // clustering property the layout exists for: every 16384-z zone's
    // min/max spans ≈ 1/8 of the domain in BOTH dimensions — so
    // parquet footer min/max prune on x AND y predicates alike, where a
    // 1-D sort leaves the second dimension's spans full-width. The
    // z-value is pure shift/AND/OR projection (whole-stage codegen);
    // clustering at write time is one range exchange (Layout.zorder2).
    Q("layout_zorder",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          (col("l_orderkey") % 1024).cast(LongType).as("x"),
          (col("l_partkey") % 1024).cast(LongType).as("y"))
        li.withColumn("zv", graft.ops.Layout.zValue2(col("x"), col("y"), 10))
          .withColumn("zone", shiftrightunsigned(col("zv"), 14))
          .groupBy(col("zone"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            min(col("y")).as("min_y"), max(col("y")).as("max_y"))
          .orderBy("zone")
      },
      Some(s"""WITH z AS (SELECT ${zSql("x", "y", 10)} AS zv, x, y FROM (
              |  SELECT CAST(l_orderkey % 1024 AS BIGINT) AS x,
              |         CAST(l_partkey % 1024 AS BIGINT) AS y FROM lineitem))
              |SELECT zv >> 14 AS zone, count(*) AS n_rows,
              |       min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
              |FROM z GROUP BY 1 ORDER BY zone""".stripMargin)),

    // Hilbert-curve layout vs Morton ([[graft.ops.Layout
    // .hilbertIndexed]]): both curves index the same (x, y) domain and
    // the rows chunk into FILE-SIZED index ranges (6000 cells — a
    // deliberately non-power-of-4 size, where the curves differ: any
    // aligned 4^k block is a perfect square under BOTH). The Hilbert
    // curve is continuous — consecutive indexes are adjacent cells —
    // so its chunks stay compact, while Morton chunks straddling a
    // quadrant seam jump across the domain and blow their extents
    // wide. The output is each chunk's spatial extent under each
    // curve; the in-query require pins the story quantitatively (total
    // Hilbert chunk extent strictly below Morton's). At 100 TB the
    // chunk extent IS the file's min/max footer: tighter extents =
    // more files skipped per predicate, at identical write cost (one
    // range exchange either way).
    Q("layout_hilbert",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          (col("l_orderkey") % 1024).cast(LongType).as("x"),
          (col("l_partkey") % 1024).cast(LongType).as("y"))
        val h = graft.ops.Layout.hilbertIndexed(li, "x", "y", 10, "idx")
          .withColumn("curve", lit("hilbert"))
        val m = li
          .withColumn("idx", graft.ops.Layout.zValue2(col("x"), col("y"), 10))
          .withColumn("curve", lit("morton"))
        val chunks = h.unionByName(m)
          .withColumn("chunk", expr("idx div 6000"))
          .groupBy(col("curve"), col("chunk"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        val span = chunks.groupBy("curve")
          .agg(sum(col("max_x") - col("min_x") + col("max_y") - col("min_y"))
            .as("total_span")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        require(span("hilbert") < span("morton"),
          s"hilbert chunks not tighter than morton: $span")
        chunks.orderBy("curve", "chunk")
      },
      Some {
        val (ctes, last) = graft.ops.Layout.hilbertSql(
          "src", "x", "y", 10, "idx")
        s"""WITH src AS (SELECT CAST(l_orderkey % 1024 AS BIGINT) AS x,
           |                    CAST(l_partkey % 1024 AS BIGINT) AS y FROM lineitem),
           |$ctes,
           |hil AS ($last),
           |both_c AS (
           |  SELECT 'hilbert' AS curve, idx, x, y FROM hil
           |  UNION ALL
           |  SELECT 'morton' AS curve, ${zSql("x", "y", 10)} AS idx, x, y FROM src)
           |SELECT curve, idx // 6000 AS chunk, count(*) AS n_rows,
           |       min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
           |FROM both_c GROUP BY 1, 2 ORDER BY curve, chunk""".stripMargin
      }),

    // ── Data-quality suite (the dbt test surface, SURVEY §5) ──────────

    // unique / not_null / accepted_values / relationships over the
    // orders table, as one unioned aggregate job. The duplicate check
    // runs against a corpus with INJECTED duplicates (every 100th key
    // repeated) so the operator provably counts, not just returns 0.
    Q("q_quality_suite",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val withDups = orders.unionByName(orders.filter(col("o_orderkey") % 100 === 0))
        Quality.suite(Seq(
          "unique_o_orderkey" -> Quality.duplicateKeyCount(withDups, Seq("o_orderkey")),
          "not_null_o_custkey" -> Quality.nullCount(orders, "o_custkey"),
          "accepted_o_orderstatus" -> Quality.notAcceptedCount(orders, "o_orderstatus",
            Seq("F", "O", "P")),
          "orphan_o_custkey" -> Quality.orphanCount(orders, "o_custkey",
            Tables.customer(s, dir), "c_custkey")))
          .orderBy("check_name")
      },
      Some("""SELECT 'unique_o_orderkey' AS check_name,
             |       (SELECT count(*) FROM (
             |          SELECT o_orderkey FROM (SELECT o_orderkey FROM orders UNION ALL
             |                                  SELECT o_orderkey FROM orders WHERE o_orderkey % 100 = 0)
             |          GROUP BY o_orderkey HAVING count(*) > 1)) AS n_violations
             |UNION ALL
             |SELECT 'not_null_o_custkey',
             |       (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
             |UNION ALL
             |SELECT 'accepted_o_orderstatus',
             |       (SELECT count(*) FROM orders
             |        WHERE o_orderstatus NOT IN ('F','O','P') OR o_orderstatus IS NULL)
             |UNION ALL
             |SELECT 'orphan_o_custkey',
             |       (SELECT count(*) FROM orders
             |        WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
             |ORDER BY check_name""".stripMargin)),

    // Int8 scalar quantization + exact integer dot scoring — the
    // memory-bandwidth scale path for ANN (1-byte codes instead of
    // 4-byte floats through every scan/shuffle). Codes and int64 dots
    // are exact integer arithmetic, so the whole kernel oracle-hashes
    // with zero tolerance; the float rerank is covered by sim_topk.
    Q("sim_quantized",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val codes = emb.select(col("vec_id"),
          Similarity.int8Codes(col("embedding")).as("qv"))
        val queryCodes = codes.filter(col("vec_id") === 0)
          .select(col("qv").as("query_qv"))
        // no global sort: scoring is a pure projection, and the
        // driver's compare canon-sorts rows — an orderBy here would be
        // a decorative full exchange at 100 TB
        codes.crossJoin(broadcast(queryCodes))
          .select(col("vec_id"), Similarity.quantizedDot(col("qv"), col("query_qv")).as("int_dot"))
      },
      Some(s"""WITH base AS (SELECT vec_id, embedding,
              |                     ${Similarity.quantScaleSql("embedding")} AS sc
              |              FROM embeddings),
              |codes AS (SELECT vec_id, ${Similarity.quantizeInt8Sql("embedding", "sc")} AS qv FROM base),
              |qq AS (SELECT qv AS query_qv FROM codes WHERE vec_id = 0)
              |SELECT codes.vec_id, ${Similarity.quantizedDotSql("codes.qv", "qq.query_qv")} AS int_dot
              |FROM codes CROSS JOIN qq ORDER BY vec_id""".stripMargin)),

    // Two-stage retrieval over the quantized codes — the production ANN
    // pattern: shortlist candidates with the cheap int8 cosine (1-byte
    // codes, compiled int64 loop), then rerank ONLY the shortlist with
    // the exact float cosine. At 100 TB the shortlist pass touches
    // 4-8× less memory bandwidth than float scoring and the expensive
    // kernel runs on 50 rows instead of the corpus. The quantized
    // cosine estimate is carried through, so Int8CosineSimilarity is
    // oracle-hash-verified end to end (scales cancel algebraically —
    // see Similarity.quantizedCosine).
    Q("sim_quantized_rerank",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val codes = emb.select(col("vec_id"), col("embedding"),
          Similarity.int8Codes(col("embedding")).as("qv"))
        val q = codes.filter(col("vec_id") === 0)
          .select(col("qv").as("query_qv"), col("embedding").as("query_vec"))
        val shortlist = codes.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), col("embedding"), col("query_vec"),
            Similarity.quantizedCosine(col("qv"), col("query_qv")).as("q_cosine"))
          .orderBy(col("q_cosine").desc, col("vec_id")).limit(50)
        shortlist
          .select(col("vec_id"), col("q_cosine"),
            Similarity.cosine(col("embedding"), col("query_vec")).as("cosine"))
          .orderBy(col("cosine").desc, col("vec_id")).limit(10)
      },
      Some(s"""WITH base AS (SELECT vec_id, embedding,
              |                     ${Similarity.quantScaleSql("embedding")} AS sc
              |              FROM embeddings),
              |codes AS (SELECT vec_id, embedding,
              |                 ${Similarity.quantizeInt8Sql("embedding", "sc")} AS qv FROM base),
              |qq AS (SELECT qv AS query_qv, embedding AS query_vec FROM codes WHERE vec_id = 0),
              |shortlist AS (
              |  SELECT codes.vec_id, codes.embedding, qq.query_vec,
              |         ${Similarity.quantizedCosineSql("codes.qv", "qq.query_qv")} AS q_cosine
              |  FROM codes CROSS JOIN qq WHERE codes.vec_id <> 0
              |  ORDER BY q_cosine DESC, vec_id LIMIT 50)
              |SELECT vec_id, q_cosine,
              |       ${Similarity.cosineSql("embedding", "query_vec")} AS cosine
              |FROM shortlist ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin)),

    // One k-means M-step as integer sufficient statistics
    // ([[Similarity.kmeansMStepStats]]): per (cluster, dim) the exact
    // Σ of int8-quantized components plus the member count — the
    // mergeable (S_k, n_k) form a distributed training loop actually
    // shuffles (partial sums combine by addition; the new centroid is
    // S/n). Assignment reuses the ivfAssign window; the reduce is one
    // keyed aggregate with map-side partials; output is k × dim rows
    // regardless of corpus size. All-integer → oracle-hash-exact.
    Q("sim_kmeans_mstep",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        Similarity.kmeansMStepStats(emb, "embedding", "vec_id", cents, "c_vec", "c_id")
          .orderBy("centroid_id", "dim")
      },
      Some(s"""WITH cents AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8),
              |j AS (SELECT e.vec_id, c.c_id,
              |             ${Similarity.cosineSql("e.embedding", "c.c_vec")} AS cosine
              |      FROM embeddings e CROSS JOIN cents c),
              |r AS (SELECT vec_id, c_id, cosine,
              |             row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS rn
              |      FROM j),
              |a AS (SELECT vec_id, c_id AS centroid_id FROM r WHERE rn = 1),
              |base AS (SELECT vec_id, ${Similarity.quantScaleSql("embedding")} AS sc, embedding
              |         FROM embeddings),
              |codes AS (SELECT vec_id, ${Similarity.quantizeInt8Sql("embedding", "sc")} AS qv FROM base),
              |x AS (SELECT a.centroid_id,
              |             unnest(range(len(c.qv))) AS dim,
              |             unnest(c.qv) AS q
              |      FROM a JOIN codes c ON a.vec_id = c.vec_id)
              |SELECT centroid_id, dim, CAST(SUM(q) AS BIGINT) AS sum_q,
              |       CAST(COUNT(*) AS BIGINT) AS n
              |FROM x GROUP BY centroid_id, dim
              |ORDER BY centroid_id, dim""".stripMargin)),

    // Full k-means E/M training loop ([[Similarity.kmeansFit]]): two
    // rounds of broadcast-assignment (E) + mergeable integer (Σq, n)
    // M-step over int8 codes, centroid = Σq/n rounded once to FLOAT,
    // empty clusters carrying their previous centroid, convergence =
    // zero reassignments. The oracle UNROLLS exactly maxIter rounds —
    // sound because convergence implies a fixed point (centroids are a
    // pure function of the assignment), so the early-stopped loop and
    // the unrolled SQL land on the same final assignment. Output: the
    // final assignment plus cluster sizes, hashed exactly.
    Q("sim_kmeans_fit",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val (_, assigned, _) =
          Similarity.kmeansFit(emb, "embedding", "vec_id", k = 8, maxIter = 2)
        val sizes = assigned.groupBy(col("centroid_id"))
          .agg(count(lit(1)).as("cluster_n"))
        assigned.join(sizes, Seq("centroid_id"))
          .select(col("vec_id"), col("centroid_id"), col("cluster_n"))
          .orderBy("vec_id")
      },
      Some {
        s"""WITH ${kmUnrollSql(8)},
           |${kmAssignSql("embeddings", "cents2", "a2")},
           |sizes AS (SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS cluster_n
           |          FROM a2 GROUP BY centroid_id)
           |SELECT a2.vec_id, a2.centroid_id, sizes.cluster_n
           |FROM a2 JOIN sizes USING (centroid_id)
           |ORDER BY vec_id""".stripMargin
      }),

    // Product quantization + ADC search ([[Similarity.pqCodebook]] /
    // pqEncode / pqAdcTopK — the FAISS-IVFPQ memory shape: m bytes per
    // corpus vector instead of 4·dim): per-subspace k-means codebooks
    // (the same deterministic fit as sim_kmeans_fit, per 16-dim slice),
    // corpus encoded as 4 codes, queries scored by broadcast LUT —
    // m integer lookups + an exact BIGINT sum per vector, never a
    // corpus-side float dot. The oracle unrolls all four subspace fits,
    // encodings, and the micro-point LUT join.
    Q("sim_pq_adc",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val cb = Similarity.pqCodebook(emb, "embedding", "vec_id", m = 4, dim = 64, k = 8)
        val codes = Similarity.pqEncode(emb, "embedding", "vec_id", cb, m = 4, dim = 64)
        val queries = emb.orderBy("vec_id").limit(3)
          .select(col("vec_id").as("q_id"), col("embedding"))
        Similarity.pqAdcTopK(codes, "vec_id", cb, queries, "q_id", "embedding",
          m = 4, dim = 64, k = 10)
          .orderBy("q_id", "rank")
      },
      Some {
        val subsSql = (0 until 4).map { j =>
          val lo = j * 16 + 1; val hi = (j + 1) * 16
          s"""sub$j AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM embeddings),
             |c0_$j AS (SELECT vec_id AS c_id, embedding AS c_vec FROM sub$j ORDER BY vec_id LIMIT 8),
             |b_$j AS (SELECT vec_id, ${Similarity.quantScaleSql("embedding")} AS sc, embedding FROM sub$j),
             |q_$j AS (SELECT vec_id, ${Similarity.quantizeInt8Sql("embedding", "sc")} AS qv FROM b_$j),
             |${kmAssignSql(s"sub$j", s"c0_$j", s"a0_$j")},
             |${kmMStepSql(s"a0_$j", s"c0_$j", s"c1_$j", codes = s"q_$j")},
             |${kmAssignSql(s"sub$j", s"c1_$j", s"enc_$j")},
             |lut_$j AS (SELECT q.q_id, $j AS sub_id, c.c_id AS code,
             |             CAST(floor(${Similarity.dotSql(s"(q.embedding[$lo:$hi])", "c.c_vec")} * 1000000.0) AS BIGINT) AS pts
             |           FROM qs q CROSS JOIN c1_$j c)""".stripMargin
        }.mkString(",\n")
        s"""WITH qs AS (SELECT vec_id AS q_id, embedding FROM embeddings ORDER BY vec_id LIMIT 3),
           |$subsSql,
           |codes_all AS (${(0 until 4).map(j =>
              s"SELECT vec_id, $j AS sub_id, centroid_id AS code FROM enc_$j")
              .mkString("\n UNION ALL ")}),
           |lut AS (${(0 until 4).map(j => s"SELECT * FROM lut_$j").mkString(" UNION ALL ")}),
           |sc AS (SELECT l.q_id, c.vec_id, CAST(SUM(l.pts) AS BIGINT) AS score_pts
           |       FROM codes_all c JOIN lut l ON c.sub_id = l.sub_id AND c.code = l.code
           |       GROUP BY 1, 2)
           |SELECT q_id, rank, vec_id, score_pts FROM (
           |  SELECT q_id, vec_id, score_pts,
           |         row_number() OVER (PARTITION BY q_id ORDER BY score_pts DESC, vec_id) AS rank
           |  FROM sc)
           |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
      }),

    // IVF+PQ combined ([[Similarity.ivfPqSearch]] — full FAISS-IVFPQ):
    // coarse cells prune candidates to each query's nprobe=2 inverted
    // lists, PQ-ADC scores only those — the cell gate bounds the scan,
    // the m-byte codes bound the memory, in ONE search. The oracle
    // chains sim_ivf_probe2's coarse assignment into sim_pq_adc's
    // subspace unroll with the cell-membership join as the gate.
    Q("sim_ivfpq_search",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val coarse = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val cb = Similarity.pqCodebook(emb, "embedding", "vec_id", m = 4, dim = 64, k = 8)
        Similarity.ivfPqSearch(emb, emb.filter(col("vec_id") < 3).select(col("vec_id")),
          "embedding", "vec_id", coarse, "c_vec", "c_id", cb,
          m = 4, dim = 64, k = 10, nprobe = 2)
          .orderBy("q_id", "rank")
      },
      Some {
        val subsSql = (0 until 4).map { j =>
          val lo = j * 16 + 1; val hi = (j + 1) * 16
          s"""sub$j AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM embeddings),
             |c0_$j AS (SELECT vec_id AS c_id, embedding AS c_vec FROM sub$j ORDER BY vec_id LIMIT 8),
             |b_$j AS (SELECT vec_id, ${Similarity.quantScaleSql("embedding")} AS sc, embedding FROM sub$j),
             |q_$j AS (SELECT vec_id, ${Similarity.quantizeInt8Sql("embedding", "sc")} AS qv FROM b_$j),
             |${kmAssignSql(s"sub$j", s"c0_$j", s"a0_$j")},
             |${kmMStepSql(s"a0_$j", s"c0_$j", s"c1_$j", codes = s"q_$j")},
             |${kmAssignSql(s"sub$j", s"c1_$j", s"enc_$j")},
             |lut_$j AS (SELECT q.q_id, $j AS sub_id, c.c_id AS code,
             |             CAST(floor(${Similarity.dotSql(s"(q.embedding[$lo:$hi])", "c.c_vec")} * 1000000.0) AS BIGINT) AS pts
             |           FROM qs q CROSS JOIN c1_$j c)""".stripMargin
        }.mkString(",\n")
        s"""WITH qs AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 3),
           |coarse AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8),
           |cscored AS (SELECT e.vec_id, c.c_id,
           |                   ${Similarity.cosineSql("e.embedding", "c.c_vec")} AS cosine
           |            FROM embeddings e CROSS JOIN coarse c),
           |cranked AS (SELECT vec_id, c_id,
           |                   row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS arn
           |            FROM cscored),
           |cells AS (SELECT vec_id, c_id AS cell FROM cranked WHERE arn = 1),
           |qcells AS (SELECT vec_id AS q_id, c_id AS cell FROM cranked
           |           WHERE arn <= 2 AND vec_id < 3),
           |$subsSql,
           |codes_all AS (${(0 until 4).map(j =>
              s"SELECT vec_id, $j AS sub_id, centroid_id AS code FROM enc_$j")
              .mkString("\n UNION ALL ")}),
           |lut AS (${(0 until 4).map(j => s"SELECT * FROM lut_$j").mkString(" UNION ALL ")}),
           |sc AS (SELECT qc.q_id, c.vec_id, CAST(SUM(l.pts) AS BIGINT) AS score_pts
           |       FROM codes_all c
           |       JOIN cells ce ON ce.vec_id = c.vec_id
           |       JOIN qcells qc ON qc.cell = ce.cell AND qc.q_id <> c.vec_id
           |       JOIN lut l ON l.q_id = qc.q_id AND l.sub_id = c.sub_id AND l.code = c.code
           |       GROUP BY 1, 2)
           |SELECT q_id, rank, vec_id, score_pts FROM (
           |  SELECT q_id, vec_id, score_pts,
           |         row_number() OVER (PARTITION BY q_id ORDER BY score_pts DESC, vec_id) AS rank
           |  FROM sc)
           |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
      }),

    // Trained SemDeDup, end to end ([[Similarity.kmeansFit]] →
    // [[Similarity.semanticDedup]]): the centroids are LEARNED by the
    // E/M loop on the base embeddings, then the dup-injected corpus is
    // deduplicated within the trained cells — the composition a real
    // curation pipeline runs (dd_semantic uses fixed seed centroids;
    // this proves the training half feeds the dedup half exactly). The
    // oracle chains the k-means unroll into the cell-scoped domination
    // SQL; injected exact copies still provably vanish.
    Q("dd_semantic_trained",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val (cents, _, _) = Similarity.kmeansFit(emb, "embedding", "vec_id",
          k = 8, maxIter = 2)
        val off = emb.agg(coalesce(max("vec_id"), lit(0L))).head.getLong(0) + 1
        val corpus = emb.unionByName(emb.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + off).as("vec_id"), col("embedding")))
        Similarity.semanticDedup(corpus, "embedding", "vec_id", cents, "c_vec", "c_id",
          minCosine = 0.99)
          .orderBy("vec_id")
      },
      Some(s"""WITH ${kmUnrollSql(8)},
              |corpus AS (SELECT vec_id, embedding FROM embeddings
              |           UNION ALL
              |           SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id, embedding
              |           FROM embeddings WHERE vec_id % 5 = 0),
              |jj AS (SELECT e.vec_id, e.embedding, c.c_id,
              |              ${Similarity.cosineSql("e.embedding", "c.c_vec")} AS cosine
              |       FROM corpus e CROSS JOIN cents2 c),
              |cells AS (SELECT vec_id, embedding, c_id AS centroid_id FROM (
              |            SELECT vec_id, embedding, c_id,
              |                   row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, c_id) AS rn
              |            FROM jj) WHERE rn = 1),
              |dom AS (SELECT DISTINCT b.vec_id FROM cells a JOIN cells b USING (centroid_id)
              |        WHERE a.vec_id < b.vec_id
              |          AND ${Similarity.cosineSql("a.embedding", "b.embedding")} >= 0.99)
              |SELECT vec_id, centroid_id FROM cells
              |WHERE NOT EXISTS (SELECT 1 FROM dom WHERE dom.vec_id = cells.vec_id)
              |ORDER BY vec_id""".stripMargin)),

    // Unpivot/melt: wide measure columns → (key, measure, value) long
    // form (Spark's native unpivot lowers to one Expand — a projection,
    // no shuffle, output = rows × measures).
    Q("p_unpivot",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 50 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure"),
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
             |FROM lineitem WHERE l_orderkey % 50 = 0
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
             |FROM lineitem WHERE l_orderkey % 50 = 0
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
             |FROM lineitem WHERE l_orderkey % 50 = 0
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
             |FROM lineitem WHERE l_orderkey % 50 = 0
             |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin)),

    // ── Time-series gap fill (ops/TimeSeries.scala) ───────────────────

    // Calendar densification + forward fill: per-customer daily order
    // totals get one row per calendar day between that customer's first
    // and last order, gap days carrying the last observed total. The
    // spine is explode(sequence(min,max)) over one-row-per-key spans —
    // its size is keys × days, independent of input row count.
    Q("ts_gapfill",
      (s, dir) => {
        val daily = Tables.orders(s, dir).filter(col("o_custkey") < 20)
          .groupBy(col("o_custkey"), col("o_orderdate").cast(DateType).as("d"))
          .agg(Det.dsum(col("o_totalprice")).as("day_total"))
        TimeSeries.gapFillForward(daily, Seq("o_custkey"), "d", Seq("day_total"))
          .orderBy("o_custkey", "d")
      },
      Some(s"""WITH daily AS (
              |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
              |         ${Det.dsumSql("o_totalprice")} AS day_total
              |  FROM orders WHERE o_custkey < 20 GROUP BY 1, 2),
              |spans AS (SELECT o_custkey, min(d) AS mn, max(d) AS mx FROM daily GROUP BY 1),
              |spine AS (SELECT o_custkey, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
              |          FROM spans),
              |j AS (SELECT s.o_custkey, s.d, daily.day_total
              |      FROM spine s LEFT JOIN daily ON s.o_custkey = daily.o_custkey AND s.d = daily.d)
              |SELECT o_custkey, d, day_total,
              |       last_value(day_total IGNORE NULLS) OVER (
              |         PARTITION BY o_custkey ORDER BY d
              |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_total_filled
              |FROM j ORDER BY o_custkey, d""".stripMargin)),

    // Linear interpolation between observations (the other standard gap
    // policy): a gap day sits on the straight line between its previous
    // and next observed values; tail gaps carry forward. Both engines
    // compute prev + (next - prev) * frac on the SAME decimal-summed
    // doubles, so the IEEE result is bit-identical.
    Q("ts_interp",
      (s, dir) => {
        val daily = Tables.orders(s, dir).filter(col("o_custkey") < 5)
          .groupBy(col("o_custkey"), col("o_orderdate").cast(DateType).as("d"))
          .agg(Det.dsum(col("o_totalprice")).as("day_total"))
        TimeSeries.gapFillInterpolate(daily, Seq("o_custkey"), "d", "day_total")
          .orderBy("o_custkey", "d")
      },
      Some(s"""WITH daily AS (
              |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
              |         ${Det.dsumSql("o_totalprice")} AS day_total
              |  FROM orders WHERE o_custkey < 5 GROUP BY 1, 2),
              |spans AS (SELECT o_custkey, min(d) AS mn, max(d) AS mx FROM daily GROUP BY 1),
              |spine AS (SELECT o_custkey, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
              |          FROM spans),
              |j AS (SELECT s.o_custkey, s.d, daily.day_total
              |      FROM spine s LEFT JOIN daily ON s.o_custkey = daily.o_custkey AND s.d = daily.d),
              |f AS (SELECT o_custkey, d, day_total,
              |             last_value(day_total IGNORE NULLS) OVER w_fwd AS prev_v,
              |             first_value(day_total IGNORE NULLS) OVER w_bwd AS next_v,
              |             last_value(CASE WHEN day_total IS NOT NULL THEN d END IGNORE NULLS) OVER w_fwd AS prev_d,
              |             first_value(CASE WHEN day_total IS NOT NULL THEN d END IGNORE NULLS) OVER w_bwd AS next_d
              |      FROM j
              |      WINDOW w_fwd AS (PARTITION BY o_custkey ORDER BY d
              |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |             w_bwd AS (PARTITION BY o_custkey ORDER BY d
              |                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
              |SELECT o_custkey, d, day_total,
              |       CASE WHEN day_total IS NOT NULL THEN day_total
              |            WHEN next_v IS NULL THEN prev_v
              |            ELSE prev_v + (next_v - prev_v) *
              |                 (CAST(datediff('day', prev_d, d) AS DOUBLE) /
              |                  CAST(datediff('day', prev_d, next_d) AS DOUBLE)) END AS day_total_interp
              |FROM f ORDER BY o_custkey, d""".stripMargin)),

    // Deterministic train/val/test split by hashed id
    // ([[Sampling.hashSplit]]) — stateless, shuffle-free, and
    // re-run/incremental-batch stable; the oracle hashes the EXACT
    // per-document assignment, not just the counts.
    Q("samp_split",
      (s, dir) => Sampling.hashSplit(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, ${Sampling.hashSplitSql("doc_id")} AS split
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // GROUP-aware train/val/test split ([[Sampling.hashSplit]] keyed on
    // the group column, not the row id): every document from one
    // `source` lands in the SAME split, so near-duplicates that cluster
    // within a crawl domain can never straddle train and test — the
    // leakage mode a row-level split invites and group-level splitting
    // is the standard fix for. Same md5 assignment (engine-portable,
    // rerun- and partitioning-stable); still a pure projection, no
    // shuffle. The in-query require pins the no-leakage invariant
    // (distinct (source, split) pairs == distinct sources) — one
    // bounded aggregate over the group domain, not a data collect.
    Q("samp_group_split",
      (s, dir) => {
        val out = Sampling.hashSplit(
          Tables.documents(s, dir).select(col("doc_id"), col("source")), "source")
        val Array(pairs, groups) = out.agg(
          countDistinct(col("source"), col("split")),
          countDistinct(col("source"))).head.toSeq.map(_.asInstanceOf[Long]).toArray
        require(pairs == groups,
          s"group split leaked: $pairs (source, split) pairs over $groups sources")
        out.orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, source, ${Sampling.hashSplitSql("source")} AS split
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Deterministic weighted Bernoulli sampling
    // ([[Sampling.weightedSample]]): keep each document with
    // probability proportional to a quality-style weight, decided by
    // md5 arithmetic instead of rand() — so the exact kept set is
    // rerun-stable, partitioning-independent, and oracle-hashable
    // row-for-row (a rand() sample could only ever be checked in
    // aggregate). Pure filter: no shuffle. The weight here is a
    // deterministic per-doc stand-in ((doc_id*7 mod 10)/10) spanning
    // the [0, 0.9] range so every decile is exercised.
    Q("samp_weighted",
      (s, dir) => Sampling.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"),
          (pmod(col("doc_id") * 7, lit(10)).cast(DoubleType) / 10.0).as("w")),
        "doc_id", "w")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, CAST((doc_id * 7) % 10 AS DOUBLE) / 10.0 AS w
              |FROM documents
              |WHERE ${Sampling.weightedSampleSql("doc_id", "CAST((doc_id * 7) % 10 AS DOUBLE) / 10.0")}
              |ORDER BY doc_id""".stripMargin)),

    // Systematic PPS sampling ([[Sampling.ppsSystematic]]): n = 100
    // equally-spaced picks along the order-value line — the classical
    // survey design (big orders near-certain, small ones ∝ value, zero
    // variance in the number drawn) behind proportional corpus
    // subsampling, with first-order inclusion probabilities (the H-T
    // weight denominators) carried per selected unit. RNG-free: the
    // pick grid is centered (start = ⌊step/2⌋), so the exact kept
    // multiset is rerun-stable and oracle-hashable. The global
    // cumulative position is an exact DISTRIBUTED prefix sum
    // (range-repartition + per-partition window + bounded broadcast
    // offsets — never a global-ORDER-BY window, which serializes the
    // corpus through one partition); the oracle replays the identical
    // frame with DuckDB's plain global window.
    Q("samp_pps_systematic",
      (s, dir) => Sampling.ppsSystematic(
        Tables.orders(s, dir).select(col("o_orderkey"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("pc")),
        "o_orderkey", "pc", n = 100)
        .orderBy("o_orderkey"),
      Some(Sampling.ppsSystematicSql(
        "(SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS w FROM orders)",
        "o_orderkey", n = 100) + "\nORDER BY o_orderkey")),

    // Hansen–Hurwitz estimation over the PPS design — the estimator
    // systematic PPS exists to serve: draw orders ∝ value
    // ([[Sampling.ppsSystematic]], the same 100-pick design as
    // samp_pps_systematic), then estimate the TOTAL LINEITEM COUNT
    // from the 100 picks alone: t̂ = (1/n)·Σ v_i/p_i with p_i = w_i/W,
    // i.e. Σ hits·v·W/(n·w). Exactness: each term is floored to
    // milli-units via the two-step division identity
    // ⌊A·W/B⌋ = A·(W div B) + ⌊A·(W mod B)/B⌋ (B = n·w), which keeps
    // every intermediate far inside BIGINT where the naive A·W product
    // overflows — so the estimate is an exact integer sum, order-free,
    // hash-stable. Output: the estimate next to the true total with
    // its realized error in ppm. Honest framing: the draw is ONE
    // deterministic centered systematic sample (no random start), so
    // err_ppm is that single draw's realized error on a weakly
    // size-correlated count (measured ~19% at sf0.001, in family with
    // the ~1/√100 CV of v/w) — the receipt here is exactness and
    // rerun-stability of the estimator arithmetic, not tightness;
    // tightness comes from n and v↗w correlation, as the formula says.
    Q("samp_hh_estimate",
      (s, dir) => {
        val ord = Tables.orders(s, dir).select(col("o_orderkey"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("w"))
        val bigW = ord.agg(sum("w")).head.getLong(0) // bounded scalar (watermark pattern)
        val li = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(count(lit(1)).as("v"))
        val sample = Sampling.ppsSystematic(ord, "o_orderkey", "w", n = 100)
        val terms = sample.join(li, Seq("o_orderkey"))
          .select(expr(
            s"n_hits * v * 1000 * ($bigW div (100 * w))" +
              s" + (n_hits * v * 1000 * ($bigW % (100 * w))) div (100 * w)")
            .as("term"))
        val tTrue = Tables.lineitem(s, dir).agg(count(lit(1)).as("t_true"))
        terms.agg(sum("term").as("t_hat_milli"))
          .crossJoin(broadcast(tTrue))
          .select(lit(100L).as("n_picks"), col("t_hat_milli"), col("t_true"),
            expr("(abs(t_hat_milli - 1000 * t_true) * 1000000) div (1000 * t_true)")
              .as("err_ppm"))
      },
      Some(s"""WITH src AS (SELECT o_orderkey,
              |    CAST(round(o_totalprice * 100) AS BIGINT) AS w FROM orders),
              |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS bw FROM src),
              |li AS (SELECT l_orderkey AS o_orderkey, CAST(count(*) AS BIGINT) AS v
              |       FROM lineitem GROUP BY 1),
              |samp AS (SELECT * FROM (
              |  ${Sampling.ppsSystematicSql("src", "o_orderkey", n = 100)})),
              |terms AS (SELECT n_hits * v * 1000 * (bw // (100 * w))
              |    + (n_hits * v * 1000 * (bw % (100 * w))) // (100 * w) AS term
              |  FROM samp JOIN li USING (o_orderkey) CROSS JOIN tot),
              |tt AS (SELECT CAST(count(*) AS BIGINT) AS t_true FROM lineitem)
              |SELECT CAST(100 AS BIGINT) AS n_picks,
              |  CAST(SUM(term) AS BIGINT) AS t_hat_milli, t_true,
              |  (abs(CAST(SUM(term) AS BIGINT) - 1000 * t_true) * 1000000)
              |    // (1000 * t_true) AS err_ppm
              |FROM terms CROSS JOIN tt GROUP BY t_true""".stripMargin)),

    // Deterministic negative sampling ([[Sampling.negativeSample]]):
    // 8 reproducible pseudo-random negatives per anchor from a 1/4
    // hash-slice of the pool — the contrastive-pairs generator whose
    // draws are auditable and rerun-stable (md5 rank key per anchor,
    // candidate-only hash for the slice so slicing never biases an
    // anchor's order). Slice = pure filter, anchors broadcast, one
    // per-anchor top-k window.
    Q("samp_negatives",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Sampling.negativeSample(
          docs.filter(col("doc_id") < 5), "doc_id", docs, "doc_id",
          k = 8, poolSlice = 0.25)
          .orderBy("anchor_id", "rank")
      },
      Some(s"""WITH anchors AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 5),
              |pool AS (SELECT doc_id FROM documents)
              |${Sampling.negativeSampleSql("anchors", "doc_id", "pool", "doc_id",
                 k = 8, poolSlice = 0.25)}
              |ORDER BY anchor_id, rank""".stripMargin)),

    // Token-budget-capped corpus selection, per language: rank docs by
    // quality within each language and keep them while the language's
    // cumulative token count fits the budget — the standard "best N
    // tokens per domain" curation cut when composing a training mix.
    // Scale shape: one keyed window (partitioned by language — never a
    // single global running sum, which would serialize the corpus
    // through one partition at 100 TB); quality/token scoring shares
    // one tokenization. Exact-integer cumulative sums hash-match.
    Q("samp_token_budget",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val scored = Tables.documents(s, dir).select(
          col("doc_id"),
          TextOps.langId(col("text")).as("lang"),
          TextOps.tokenCount(col("text")).as("n_tok"),
          TextOps.qualityScore(col("text")).as("quality"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("quality").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        scored.withColumn("cum_tok", sum(col("n_tok")).over(w))
          .filter(col("cum_tok") <= 3000)
          .select("lang", "doc_id", "n_tok", "quality", "cum_tok")
          .orderBy("lang", "cum_tok", "doc_id")
      },
      Some(s"""WITH scored AS (
              |  SELECT doc_id,
              |         ${TextOps.langIdSql("text")} AS lang,
              |         CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tok,
              |         ${TextOps.qualityScoreSql("text")} AS quality
              |  FROM documents),
              |c AS (SELECT lang, doc_id, n_tok, quality,
              |             CAST(sum(n_tok) OVER (PARTITION BY lang
              |                 ORDER BY quality DESC, doc_id
              |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
              |      FROM scored)
              |SELECT lang, doc_id, n_tok, quality, cum_tok FROM c
              |WHERE cum_tok <= 3000 ORDER BY lang, cum_tok, doc_id""".stripMargin)),

    // Probabilistic record linkage ([[Linkage.linkPairs]],
    // Fellegi–Sunter with exact-integer value-frequency weights): the
    // customer table is matched against a deterministically DIRTIED
    // copy (every 3rd name lowercased — normalization must recover it;
    // every 21st corrupted outright — those pairs must link on the
    // REMAINING evidence). Candidates come from a (nation, name-digit)
    // blocking equi-join, never all-pairs; each field agreement adds
    // (1e6·N) div n_value micro-points — rare-value agreement is
    // near-proof, common-value agreement is noise — and the match
    // threshold `score > 500000·N` ("evidence rarer than half the
    // corpus") is corpus-size-free. All-BIGINT scores hash identically
    // in any engine; the oracle replays the whole pipeline in SQL.
    Q("er_linkage",
      (s, dir) => {
        def norm(df: DataFrame) = df.select(
          col("c_custkey"),
          upper(col("c_name")).as("name_n"),
          col("c_nationkey"),
          expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("bal_c"),
          col("c_mktsegment"),
          expr("right(regexp_replace(c_name, '[^0-9]', ''), 2)").as("bk"))
        val cust = Tables.customer(s, dir)
        val dirty = cust.withColumn("c_name",
          when(pmod(col("c_custkey"), lit(21)) === 0, concat(col("c_name"), lit("x")))
            .when(pmod(col("c_custkey"), lit(3)) === 0, lower(col("c_name")))
            .otherwise(col("c_name")))
        val pairs = graft.ops.Linkage.linkPairs(norm(cust), norm(dirty),
          "c_custkey", "c_custkey",
          blockCols = Seq("c_nationkey", "bk"),
          fields = Seq("name_n", "bal_c", "c_mktsegment"))
        pairs.filter(col("score") > expr("500000 * corpus_n"))
          .select(col("id_a"), col("id_b"), col("score"), col("n_agree"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH dirty AS (
             |  SELECT c_custkey,
             |         CASE WHEN c_custkey % 21 = 0 THEN c_name || 'x'
             |              WHEN c_custkey % 3 = 0 THEN lower(c_name)
             |              ELSE c_name END AS c_name,
             |         c_nationkey, c_acctbal, c_mktsegment
             |  FROM customer),
             |a_n AS (SELECT c_custkey AS id_a, upper(c_name) AS name_n, c_nationkey,
             |               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c,
             |               c_mktsegment,
             |               right(regexp_replace(c_name, '[^0-9]', '', 'g'), 2) AS bk
             |        FROM customer),
             |b_n AS (SELECT c_custkey AS id_b, upper(c_name) AS name_n, c_nationkey,
             |               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c,
             |               c_mktsegment,
             |               right(regexp_replace(c_name, '[^0-9]', '', 'g'), 2) AS bk
             |        FROM dirty),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM b_n),
             |f_name AS (SELECT name_n AS v, CAST(count(*) AS BIGINT) AS nv FROM b_n GROUP BY 1),
             |f_bal AS (SELECT bal_c AS v, CAST(count(*) AS BIGINT) AS nv FROM b_n GROUP BY 1),
             |f_seg AS (SELECT c_mktsegment AS v, CAST(count(*) AS BIGINT) AS nv FROM b_n GROUP BY 1),
             |cands AS (
             |  SELECT a.id_a, b.id_b,
             |    CASE WHEN a.name_n = b.name_n
             |         THEN (1000000 * nn.N) // fn.nv ELSE 0 END AS w_name,
             |    CASE WHEN a.bal_c = b.bal_c
             |         THEN (1000000 * nn.N) // fb.nv ELSE 0 END AS w_bal,
             |    CASE WHEN a.c_mktsegment = b.c_mktsegment
             |         THEN (1000000 * nn.N) // fs.nv ELSE 0 END AS w_seg,
             |    nn.N AS n
             |  FROM a_n a JOIN b_n b
             |    ON a.c_nationkey = b.c_nationkey AND a.bk = b.bk
             |  CROSS JOIN nn
             |  LEFT JOIN f_name fn ON fn.v = b.name_n
             |  LEFT JOIN f_bal fb ON fb.v = b.bal_c
             |  LEFT JOIN f_seg fs ON fs.v = b.c_mktsegment)
             |SELECT id_a, id_b,
             |       CAST(w_name + w_bal + w_seg AS BIGINT) AS score,
             |       CAST((CASE WHEN w_name > 0 THEN 1 ELSE 0 END)
             |          + (CASE WHEN w_bal > 0 THEN 1 ELSE 0 END)
             |          + (CASE WHEN w_seg > 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_agree
             |FROM cands WHERE w_name + w_bal + w_seg > 500000 * n
             |ORDER BY id_a, id_b""".stripMargin)),

    // Fuzzy entity resolution over supplier names (edit distance ≤ 1):
    // deletion-neighborhood blocking + exact Levenshtein verify
    // ([[Dedup.editDistancePairs]]). The corpus injects KNOWN ED-1
    // variants (3rd character deleted, offset keys) so the operator
    // provably recalls insertions/deletions, not just the digit-
    // substitution pairs the TPC-H name pattern produces naturally.
    Q("dd_fuzzy_pairs",
      (s, dir) => {
        val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
        val off = sup.agg(coalesce(max("s_suppkey"), lit(0L))).head.getLong(0) + 1
        val corpus = sup
          .unionByName(sup.filter(col("s_suppkey") % 9 === 0)
            .select((col("s_suppkey") + off).as("s_suppkey"),
              concat(substring(col("s_name"), 1, 2), expr("substring(s_name, 4, length(s_name))"))
                .as("s_name")))
        Dedup.editDistancePairs(corpus, "s_suppkey", "s_name")
          .orderBy("id_a", "id_b")
      },
      Some("""WITH corpus AS (
             |  SELECT s_suppkey AS id, s_name AS name FROM supplier
             |  UNION ALL
             |  SELECT s_suppkey + (SELECT MAX(s_suppkey) + 1 FROM supplier) AS id,
             |         substr(s_name, 1, 2) || substr(s_name, 4) AS name
             |  FROM supplier WHERE s_suppkey % 9 = 0),
             |variants AS (
             |  SELECT DISTINCT id, name, v FROM (
             |    SELECT id, name, name AS v FROM corpus
             |    UNION ALL
             |    SELECT id, name,
             |           substr(name, 1, CAST(i AS INTEGER) - 1)
             |             || substr(name, CAST(i AS INTEGER) + 1) AS v
             |    FROM corpus, UNNEST(range(1, length(name) + 1)) AS t(i))),
             |cand AS (
             |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b
             |  FROM variants a JOIN variants b ON a.v = b.v AND a.id < b.id)
             |SELECT id_a, id_b, name_a, name_b,
             |       CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
             |FROM cand WHERE levenshtein(name_a, name_b) <= 1
             |ORDER BY id_a, id_b""".stripMargin)),

    // Table profiling (ANALYZE-style column stats): null count, exact
    // distinct count, numeric min/max per column — one aggregate leg
    // per column so each leg is a pruned one-column scan with map-side
    // partials (NO mixed-distinct Expand; see Profile scaladoc). The
    // NULLIF-derived column proves the null counting against a column
    // that actually contains NULLs.
    Q("prof_orders",
      (s, dir) => Profile.profile(
        Tables.orders(s, dir).select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"),
          nullif(col("o_orderstatus"), lit("P")).as("status_nn")),
        Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "status_nn"))
        .orderBy("column_name"),
      Some {
        val t = "(SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, " +
          "NULLIF(o_orderstatus, 'P') AS status_nn FROM orders) prof_src"
        Seq(
          Profile.profileLegSql(t, "o_orderkey", numeric = true),
          Profile.profileLegSql(t, "o_custkey", numeric = true),
          Profile.profileLegSql(t, "o_totalprice", numeric = true),
          Profile.profileLegSql(t, "o_orderstatus", numeric = false),
          Profile.profileLegSql(t, "status_nn", numeric = false))
          .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
      }),

    // The 100 TB profile variant: approx_count_distinct (HLL++) legs —
    // bounded agg state instead of an exact distinct's key set. The
    // estimate itself is not DuckDB-computable, so each leg hashes the
    // exact count plus `approx_ok` (estimate within 5× the configured
    // rsd) — the agg_approx_distinct contract: a broken sketch
    // hash-mismatches instead of passing as "no_oracle".
    Q("prof_orders_approx",
      (s, dir) => Profile.profileApprox(
        Tables.orders(s, dir).select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"),
          nullif(col("o_orderstatus"), lit("P")).as("status_nn")),
        Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "status_nn"))
        .orderBy("column_name"),
      Some {
        val t = "(SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, " +
          "NULLIF(o_orderstatus, 'P') AS status_nn FROM orders) prof_src"
        Seq(
          Profile.profileApproxLegSql(t, "o_orderkey", numeric = true),
          Profile.profileApproxLegSql(t, "o_custkey", numeric = true),
          Profile.profileApproxLegSql(t, "o_totalprice", numeric = true),
          Profile.profileApproxLegSql(t, "o_orderstatus", numeric = false),
          Profile.profileApproxLegSql(t, "status_nn", numeric = false))
          .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
      }),

    // K-core decomposition ([[Graph.kcore]]): the 3-core of the
    // customer↔supplier graph — iterative peel to the exact fixed
    // point (converged-required in-op, so the blind 12-round oracle
    // unroll lands on the identical set: a converged peel is
    // idempotent). Survivor-filtered degree aggregates per round,
    // bounded count scalars as the convergence probe.
    Q("gr_kcore",
      (s, dir) => Graph.kcore(graphEdges(s, dir), k = 3, maxRounds = 12)
        .orderBy("node"),
      Some {
        // every CTE is MATERIALIZED: each round references its
        // predecessor twice, and DuckDB's default inlining would
        // expand the 12-round chain exponentially (observed as a
        // too-many-open-files blowup on the base scans)
        val rounds = (1 to 12).map { i =>
          val prev = if (i == 1) "s0" else s"r${i - 1}"
          s"""r$i AS MATERIALIZED (SELECT e.src AS node, CAST(count(*) AS BIGINT) AS deg
             |  FROM em e JOIN $prev a ON e.src = a.node JOIN $prev b ON e.dst = b.node
             |  GROUP BY e.src HAVING count(*) >= 3)""".stripMargin
        }.mkString(",\n")
        s"""WITH $graphEdgesSql,
           |em AS MATERIALIZED (SELECT src, dst FROM edges),
           |s0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
           |$rounds
           |SELECT node, deg FROM r12 ORDER BY node""".stripMargin
      }),

    // EXACT median with bounded state ([[Profile.exactMedianBinned]]):
    // pass 1 bins (groups × bins state), a driver histogram walk finds
    // each group's median bin + residual rank, pass 2 ranks ONLY that
    // bin's rows — the exact-quantile-at-100 TB recipe where a global
    // sort is a non-starter. Lower median (rank ⌊(n+1)/2⌋), cents
    // BIGINT, mirrored by a per-group row_number selection.
    Q("agg_exact_median",
      (s, dir) => Profile.exactMedianBinned(
          Tables.orders(s, dir), "o_orderpriority", "o_totalprice",
          binWidthCents = 1000000L)
        .orderBy("o_orderpriority"),
      Some("""WITH c AS (SELECT o_orderpriority AS g,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
             |  FROM orders WHERE o_totalprice IS NOT NULL),
             |r AS (SELECT g, c,
             |        row_number() OVER (PARTITION BY g ORDER BY c) AS rn,
             |        count(*) OVER (PARTITION BY g) AS n
             |      FROM c)
             |SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n,
             |       c AS median_cents
             |FROM r WHERE rn = (n + 1) // 2
             |ORDER BY o_orderpriority""".stripMargin)),

    // Two-sample Kolmogorov–Smirnov drift ([[Profile.ksTest]]): 1996 vs
    // 1997 order values. The ECDF gap is carried as the exact integer
    // |C_a·n_b − C_b·n_a| (common-denominator form) so the max/argmax
    // never compares floats; KS pays one double division at the end —
    // the classical test made hash-exact.
    Q("prof_ks",
      (s, dir) => {
        val ord = Tables.orders(s, dir)
        def yr(y: Int) = ord.filter(year(col("o_orderdate")) === y)
          .select(col("o_totalprice"))
        Profile.ksTest(yr(1996), yr(1997), "o_totalprice")
      },
      Some(Profile.ksTestSql(
        "(SELECT o_totalprice FROM orders WHERE year(o_orderdate) = 1996)",
        "(SELECT o_totalprice FROM orders WHERE year(o_orderdate) = 1997)",
        "o_totalprice"))),

    // Histogram drift monitor ([[Profile.histogramDrift]]): order-value
    // distribution before vs after 1996 on a fixed 12-bin grid — the
    // PSI-style distribution-shift gate (L1 + χ², ln-free), with the
    // per-bin float terms reduced by an ORDERED fold over the
    // bin-sorted array so the double sums are engine- and
    // partitioning-independent. State O(nBins) at any input size.
    Q("prof_drift",
      (s, dir) => {
        val ord = Tables.orders(s, dir)
        val cut = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
        Profile.histogramDrift(
          ord.filter(col("o_orderdate") < lit(cut)),
          ord.filter(col("o_orderdate") >= lit(cut)),
          "o_totalprice", lo = 0.0, hi = 600000.0, nBins = 12)
      },
      Some(Profile.histogramDriftSql(
        "(SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00') drift_a",
        "(SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00') drift_b",
        "o_totalprice", lo = 0.0, hi = 600000.0, nBins = 12))),

    // NOTE: the BATCH Benford screen already ships as AnalyticsQueries'
    // prof_benford (o_totalprice, per-digit χ² terms). The ppm-integer
    // formulation below ([[Profile.benford]]) exists for the STREAMING
    // drift monitor stream_benford_final, whose maintained count
    // partials need the epilogue factored over a (digit, n) table
    // ([[Profile.benfordFromCounts]]) — a second batch query would
    // duplicate the name (QueriesSpec pins uniqueness; found live this
    // round: the first draft shadowed the Analytics query silently).

    // Per-key z-score anomaly screen over daily order totals
    // ([[TimeSeries.zscoreAnomalies]]): exact decimal Σx/Σx² in one
    // window pass, float epilogue restricted to correctly-rounded IEEE
    // ops (÷ × − √), so the standardized scores hash-match the oracle
    // bit-for-bit — no tolerance, no ln/exp.
    Q("ts_zscore",
      (s, dir) => {
        val daily = Tables.orders(s, dir).filter(col("o_custkey") < 50)
          .groupBy(col("o_custkey"), col("o_orderdate").cast(DateType).as("d"))
          .agg(Det.dsum(col("o_totalprice")).as("day_total"))
        TimeSeries.zscoreAnomalies(daily, Seq("o_custkey"), "day_total")
          .orderBy("o_custkey", "d")
      },
      Some {
        val (z, _) = TimeSeries.zscoreSql("day_total")
        s"""WITH daily AS (
           |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           |         ${Det.dsumSql("o_totalprice")} AS day_total
           |  FROM orders WHERE o_custkey < 50 GROUP BY 1, 2)
           |SELECT o_custkey, d, day_total, zscore, abs(zscore) > 2.0 AS is_anomaly
           |FROM (SELECT o_custkey, d, day_total, $z AS zscore
           |      FROM daily
           |      WINDOW w AS (PARTITION BY o_custkey))
           |ORDER BY o_custkey, d""".stripMargin
      }),

    // Day-of-week seasonal anomaly screen ([[TimeSeries.
    // seasonalAnomalies]]): each day's quantity vs the mean of its
    // key's SAME weekday — the deseasonalized outlier check a flat
    // z-score can't do (weekly troughs would flag every Saturday).
    // season = epoch_days mod 7 (pure date arithmetic; DAYOFWEEK()
    // numbers Sunday differently per engine), exact decimal seasonal
    // sums, correctly-rounded float epilogue — hash-exact, no
    // tolerance. ONE window pass partitioned (key, season).
    Q("ts_seasonal",
      (s, dir) => {
        val daily = Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_shipdate").cast(DateType).as("d"))
          .agg(Det.dsum(col("l_quantity")).as("day_qty"))
        TimeSeries.seasonalAnomalies(daily, Seq("l_returnflag"), "d", "day_qty")
          .orderBy("l_returnflag", "d")
      },
      Some(s"""WITH daily AS (
              |  SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
              |         ${Det.dsumSql("l_quantity")} AS day_qty
              |  FROM lineitem GROUP BY 1, 2)
              |SELECT l_returnflag, d, day_qty, season, baseline,
              |       CAST(day_qty AS DOUBLE) - baseline AS deviation,
              |       abs(CAST(day_qty AS DOUBLE) - baseline) * 2.0 > baseline AS is_anomaly
              |FROM (SELECT l_returnflag, d, day_qty,
              |             ${TimeSeries.seasonalSql("d", "day_qty", "l_returnflag")}
              |      FROM daily)
              |ORDER BY l_returnflag, d""".stripMargin)),

    // ROBUST median/MAD anomaly screen ([[TimeSeries.
    // robustZscoreAnomalies]]): the Iglewicz–Hoaglin modified z-score
    // 0.6745·(v−median)/MAD over the same daily totals as ts_zscore —
    // the screen whose baseline the outliers themselves cannot drag
    // (50% breakdown point vs the mean/σ's 0%). Median AND MAD come
    // from the bounded-state binned-quantile machinery (keys × bins
    // state, no per-key sort), so the whole thing is two keyed bin
    // aggregates + two tiny band joins at any scale.
    Q("ts_robust",
      (s, dir) => {
        val daily = Tables.orders(s, dir).filter(col("o_custkey") < 50)
          .groupBy(col("o_custkey"), col("o_orderdate").cast(DateType).as("d"))
          .agg(Det.dsum(col("o_totalprice")).as("day_total"))
        TimeSeries.robustZscoreAnomalies(daily, Seq("o_custkey"), "day_total",
          binWidthCents = 1000000L)
          .orderBy("o_custkey", "d")
      },
      Some {
        def binChain(src: String, vcol: String, tag: String) =
          s"""b$tag AS (SELECT o_custkey,
             |    CAST(CAST($vcol AS DECIMAL(18,2)) * 100 AS BIGINT) // 1000000 AS bin
             |  FROM $src),
             |n$tag AS (SELECT o_custkey, bin, CAST(count(*) AS BIGINT) AS cnt
             |          FROM b$tag GROUP BY 1, 2),
             |c$tag AS (SELECT o_custkey, bin, cnt,
             |    CAST(SUM(cnt) OVER (PARTITION BY o_custkey ORDER BY bin
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             |    CAST(SUM(cnt) OVER (PARTITION BY o_custkey) AS BIGINT) AS n
             |  FROM n$tag),
             |q$tag AS (SELECT o_custkey, ${Profile.binnedQuantileSql(0.5, 1000000L)}
             |          FROM c$tag GROUP BY o_custkey)""".stripMargin
        s"""WITH daily AS (
           |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           |         ${Det.dsumSql("o_totalprice")} AS day_total
           |  FROM orders WHERE o_custkey < 50 GROUP BY 1, 2),
           |${binChain("daily", "day_total", "1")},
           |dev AS (SELECT d0.o_custkey, d0.d, d0.day_total, q1.p50 AS med,
           |          abs(CAST(d0.day_total AS DOUBLE) - q1.p50) AS adev
           |        FROM daily d0 JOIN q1 USING (o_custkey)),
           |${binChain("dev", "adev", "2")},
           |scored AS (SELECT v.o_custkey, v.d, v.day_total, v.med, q2.p50 AS mad,
           |    CASE WHEN q2.p50 = 0
           |         THEN CASE WHEN CAST(v.day_total AS DOUBLE) = v.med THEN 0.0
           |              ELSE sign(CAST(v.day_total AS DOUBLE) - v.med)
           |                   * CAST('Infinity' AS DOUBLE) END
           |         ELSE 0.6745 * (CAST(v.day_total AS DOUBLE) - v.med) / q2.p50
           |    END AS rz
           |  FROM dev v JOIN q2 USING (o_custkey))
           |SELECT o_custkey, d, day_total, med, mad, rz, abs(rz) > 3.5 AS is_anomaly
           |FROM scored ORDER BY o_custkey, d""".stripMargin
      }),

    // Trailing distinct-count features ([[TimeSeries.trailingDistinct]]):
    // distinct parts each customer ordered in the trailing 7/30
    // calendar days as of every transaction — breadth-of-activity
    // features sums can't express. Same one-WindowExec shape as
    // feat_trailing; the DuckDB mirror builds the identical RANGE-frame
    // value set (len(list_distinct(list() OVER))).
    Q("feat_trailing_distinct",
      (s, dir) => {
        val tx = Tables.orders(s, dir).filter(col("o_custkey") < 500)
          .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("o_orderdate").cast(DateType).as("d"),
            col("l_partkey"))
        TimeSeries.trailingDistinct(tx, Seq("o_custkey"), "d", "l_partkey", Seq(7, 30))
          .orderBy("o_custkey", "d", "l_partkey", "l_partkey_nd_7d", "l_partkey_nd_30d")
      },
      Some("""WITH tx AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, l_partkey
             |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |            WHERE o_custkey < 500)
             |SELECT o_custkey, d, l_partkey,
             |  len(list_distinct(list(l_partkey) OVER w7)) AS l_partkey_nd_7d,
             |  len(list_distinct(list(l_partkey) OVER w30)) AS l_partkey_nd_30d
             |FROM tx
             |WINDOW w7 AS (PARTITION BY o_custkey
             |              ORDER BY datediff('day', DATE '1970-01-01', d)
             |              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
             |       w30 AS (PARTITION BY o_custkey
             |               ORDER BY datediff('day', DATE '1970-01-01', d)
             |               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, d, l_partkey, l_partkey_nd_7d, l_partkey_nd_30d""".stripMargin)),

    // Histogram-binned quantiles ([[Profile.binnedQuantiles]]): p50/p95
    // of extended price per return flag from fixed $1000 bins — the
    // percentile shape that survives 100 TB (two keyed aggregates with
    // a keys × bins intermediate; exact percentile() sorts every
    // group). Integer bin counts + one fixed interpolation chain →
    // oracle-hash-identical; error bounded by the bin width.
    Q("agg_binned_quantile",
      (s, dir) => Profile.binnedQuantiles(
        Tables.lineitem(s, dir), Seq("l_returnflag"), "l_extendedprice",
        binWidthCents = 100000L, ps = Seq(0.5, 0.95))
        .orderBy("l_returnflag"),
      Some(s"""WITH c AS (SELECT l_returnflag,
              |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000 AS bin
              |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
              |cnts AS (SELECT l_returnflag, bin, CAST(COUNT(*) AS BIGINT) AS cnt
              |         FROM c GROUP BY 1, 2),
              |cum AS (SELECT l_returnflag, bin, cnt,
              |          CAST(SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin
              |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
              |          CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
              |        FROM cnts)
              |SELECT l_returnflag,
              |  ${Profile.binnedQuantileSql(0.5, 100000L)},
              |  ${Profile.binnedQuantileSql(0.95, 100000L)}
              |FROM cum GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)),

    // Bounded-state percentile profiling ([[Profile.profileQuantiles]]):
    // p50/p95 of four lineitem measures in ONE pass — unpivot (Expand
    // projection, no shuffle) then histogram-binned quantiles keyed on
    // column_name; with profileApprox's HLL distincts this closes the
    // profile family at 100 TB (nothing sorts a column or holds a full
    // key set; intermediate = |cols| × bins). $1 bins; the oracle
    // replays the identical binning + interpolation per column.
    Q("prof_quantiles",
      (s, dir) => Profile.profileQuantiles(
        Tables.lineitem(s, dir),
        Seq("l_extendedprice", "l_quantity", "l_discount", "l_tax"),
        binWidthCents = 100L, ps = Seq(0.5, 0.95))
        .orderBy("column_name"),
      Some {
        def leg(c: String) =
          s"""SELECT * FROM (
             |  -- the DOUBLE hop mirrors profileQuantiles' unpivot cast
             |  WITH b AS (SELECT CAST(CAST(CAST($c AS DOUBLE) AS DECIMAL(18,2)) * 100 AS BIGINT) // 100 AS bin
             |             FROM lineitem WHERE $c IS NOT NULL),
             |  cnts AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
             |  cum AS (SELECT bin, cnt,
             |            CAST(SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             |            CAST(SUM(cnt) OVER () AS BIGINT) AS n
             |          FROM cnts)
             |  SELECT '$c' AS column_name,
             |    ${Profile.binnedQuantileSql(0.5, 100L)},
             |    ${Profile.binnedQuantileSql(0.95, 100L)}
             |  FROM cum)""".stripMargin
        Seq("l_extendedprice", "l_quantity", "l_discount", "l_tax").map(leg)
          .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
      }),

    // Incremental distinct counting via PERSISTED mergeable HLL
    // sketches (Spark 4 hll_sketch_agg / hll_union_agg — Apache
    // DataSketches): monthly customer sketches land in a snapshot table
    // as exactly-once incremental batches (binary sketch column in
    // parquet), one batch is REPLAYED (txn no-op, required in-query),
    // and the global distinct is answered by UNIONING the stored
    // sketches — the 100 TB incremental-metrics shape: history is never
    // rescanned, a new day appends one sketch row and the union stays
    // KB-sized. The estimate is bound-checked against the exact count
    // (the agg_approx_distinct contract); the oracle hashes the exact
    // count + flag.
    Q("agg_hll_incremental",
      (s, dir) => {
        val st = new graft.engine.SnapshotStore(
          s, s"/tmp/graft_ss_hll_${new java.io.File(dir).getName}")
        st.dropTable("metrics", "cust_sketch")
        val o = Tables.orders(s, dir).select(col("o_custkey"),
          date_trunc("month", col("o_orderdate")).cast(DateType).as("m"))
        def batch(b: Int) = o.filter(pmod(year(col("m")), lit(3)) === b)
          .groupBy(col("m"))
          .agg(hll_sketch_agg(col("o_custkey")).as("sketch"))
        (0 until 3).foreach(b =>
          st.appendIfAbsent(batch(b), "metrics", "cust_sketch", txnId = s"hll-b$b"))
        st.appendIfAbsent(batch(0), "metrics", "cust_sketch", txnId = "hll-b0") // replay
        val sk = st.read("metrics", "cust_sketch")
        // bounded driver scalars (the watermark pattern): months are
        // few by construction, and the union reduces to ONE sketch row
        val nMonths = sk.count()
        val est = sk.agg(hll_sketch_estimate(hll_union_agg(col("sketch"))))
          .head.getLong(0)
        val exact = o.agg(countDistinct(col("o_custkey"))).head.getLong(0)
        require(nMonths == o.select("m").distinct().count(),
          "replayed sketch batch must commit nothing (exactly-once)")
        s.range(1).select(
          lit(nMonths).as("n_months"),
          lit(exact).as("exact_custs"),
          (lit(math.abs(est - exact).toDouble / exact) <= 0.05)
            .cast(IntegerType).as("approx_ok"))
      },
      Some("""SELECT CAST(count(DISTINCT date_trunc('month', o_orderdate)) AS BIGINT) AS n_months,
             |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
             |       CAST(1 AS INTEGER) AS approx_ok
             |FROM orders""".stripMargin)),

    // Deterministic per-group MODE ([[graft.ops.Ranking.modeBy]], built
    // on the k=1 top-k heap): native mode() leaves ties engine- and
    // plan-dependent; here ties break to the smallest value — a total
    // order, hashed against a rank-window oracle with the same rule.
    Q("agg_mode",
      (s, dir) => graft.ops.Ranking.modeBy(
        Tables.lineitem(s, dir).select(col("l_returnflag"),
          col("l_quantity").cast(LongType).as("qty")),
        Seq("l_returnflag"), "qty")
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, qty AS mode, n FROM (
             |  SELECT l_returnflag, qty, n,
             |         row_number() OVER (PARTITION BY l_returnflag
             |                            ORDER BY n DESC, qty) AS rn
             |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
             |               CAST(COUNT(*) AS BIGINT) AS n
             |        FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2))
             |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin)),

    // Bounded-state exact top-k per group ([[graft.functions.
    // TopKByAgg]], surfaced as [[graft.ops.Ranking.topKBy]]): the five
    // highest-priced lineitems per return flag via a k-capped MERGEABLE
    // heap aggregate — k pairs of state per group and map-side partials
    // (each input partition ships ≤ k pairs per group), where the rank
    // window the oracle uses sorts every group's full row set. The
    // total order (score desc, id asc) makes the result hash-exact.
    Q("w_topk_agg",
      (s, dir) => {
        val rid = (col("l_orderkey") * 10 + col("l_linenumber")).cast(LongType)
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(graft.ops.Ranking.topKBy(col("l_extendedprice"), rid, 5).as("top"))
          .select(col("l_returnflag"), posexplode(col("top")).as(Seq("idx", "e")))
          .select(col("l_returnflag"), (col("idx") + 1).as("rank"),
            col("e.score").as("score"), col("e.id").as("id"))
          .orderBy("l_returnflag", "rank")
      },
      Some("""SELECT l_returnflag, CAST(rank AS INTEGER) AS rank, score, id FROM (
             |  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS score,
             |         l_orderkey * 10 + l_linenumber AS id,
             |         row_number() OVER (PARTITION BY l_returnflag
             |           ORDER BY CAST(l_extendedprice AS DOUBLE) DESC,
             |                    l_orderkey * 10 + l_linenumber) AS rank
             |  FROM lineitem)
             |WHERE rank <= 5 ORDER BY l_returnflag, rank""".stripMargin)),

    // OHLC bar resampling ([[TimeSeries.resampleOhlc]]): daily silver
    // bars → monthly bars with TRUE open/close semantics (value at the
    // bucket's earliest/latest trading day — the reference's gold model
    // only keeps avg/max/min). One keyed aggregate; min_by/max_by ride
    // map-side partials, no window over the raw series. Oracle: DuckDB
    // arg_min/arg_max over the identical silver CTE.
    Q("ts_ohlc",
      (s, dir) => TimeSeries.resampleOhlc(
        graft.ops.StockOps.silverDaily(graft.ops.StockOps.bronzeFromLineitem(
          Tables.lineitem(s, dir))),
        Seq("sigla_empresa"), "data_pregao",
        "valor_abertura", "valor_maximo", "valor_minimo", "valor_fechamento",
        "volume_negociado", unit = "month")
        .orderBy("sigla_empresa", "bucket_start"),
      Some(s"""WITH silver AS (${graft.ops.StockOps.silverSql()})
              |SELECT sigla_empresa,
              |       CAST(date_trunc('month', data_pregao) AS DATE) AS bucket_start,
              |       arg_min(valor_abertura, data_pregao) AS open,
              |       MAX(valor_maximo) AS high,
              |       MIN(valor_minimo) AS low,
              |       arg_max(valor_fechamento, data_pregao) AS close,
              |       ${Det.dsumSql("volume_negociado")} AS volume,
              |       count(*) AS n_bars
              |FROM silver
              |GROUP BY 1, 2
              |ORDER BY sigla_empresa, bucket_start""".stripMargin)),

    // Interval-interval OVERLAP join ([[TemporalJoins.
    // intervalOverlapJoin]]): supplier in-transit windows × 30-day
    // audit windows — the general range join a naive formulation makes
    // a CARTESIAN with a residual predicate. Both interval sets explode
    // into fixed bins, pairs meet by bin EQUI-join, the residual keeps
    // exact closed overlap, and each pair is kept only in its first
    // shared bin (arithmetic dedup, no distinct shuffle). The oracle is
    // the plain quadratic overlap join DuckDB can afford at this size.
    Q("j_interval_overlap",
      (s, dir) => {
        def days(c: String) = datediff(col(c).cast(DateType),
          lit("1970-01-01").cast(DateType)).cast(LongType)
        // synthetic transit span (the table has no receipt date):
        // 1-45 days, deterministic per line
        val transit = Tables.lineitem(s, dir).filter(col("l_suppkey") < 10)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
            days("l_shipdate").as("t_start"),
            (days("l_shipdate") + pmod(col("l_orderkey") + col("l_linenumber"), lit(45)) + 1)
              .as("t_end"))
        val audits = Tables.orders(s, dir).filter(col("o_custkey") < 10)
          .select(col("o_orderkey").as("a_id"), days("o_orderdate").as("a_start"),
            (days("o_orderdate") + 30).as("a_end"))
        graft.ops.TemporalJoins.intervalOverlapJoin(
          transit, audits, "t_start", "t_end", "a_start", "a_end", binSize = 32)
          .orderBy("l_orderkey", "l_linenumber", "a_id")
      },
      Some("""WITH transit AS (SELECT l_orderkey, l_linenumber, l_suppkey,
             |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t_start,
             |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
             |      + (l_orderkey + l_linenumber) % 45 + 1 AS t_end
             |  FROM lineitem WHERE l_suppkey < 10),
             |audits AS (SELECT o_orderkey AS a_id,
             |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS a_start,
             |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) + 30 AS a_end
             |  FROM orders WHERE o_custkey < 10)
             |SELECT t.l_orderkey, t.l_linenumber, t.l_suppkey, t.t_start, t.t_end,
             |       a.a_id, a.a_start, a.a_end
             |FROM transit t JOIN audits a
             |  ON t.t_start <= a.a_end AND a.a_start <= t.t_end
             |ORDER BY l_orderkey, l_linenumber, a_id""".stripMargin)),

    // Winsorization ([[Profile.winsorize]]): extended prices clipped
    // into each return flag's binned [p05, p95] band — robust-stats
    // outlier handling whose band estimation stays bounded-state
    // (histogram bins, no per-group sort). The oracle replays the
    // identical binning + interpolation + least/greatest clip.
    Q("t_winsorize",
      (s, dir) => Profile.winsorize(
        Tables.lineitem(s, dir)
          .filter(col("l_orderkey") % 50 === 0)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_extendedprice")),
        Seq("l_returnflag"), "l_extendedprice",
        binWidthCents = 100000L, pLo = 0.05, pHi = 0.95)
        .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""WITH src AS (SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
              |            FROM lineitem WHERE l_orderkey % 50 = 0),
              |c AS (SELECT l_returnflag,
              |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000 AS bin
              |  FROM src WHERE l_extendedprice IS NOT NULL),
              |cnts AS (SELECT l_returnflag, bin, CAST(COUNT(*) AS BIGINT) AS cnt
              |         FROM c GROUP BY 1, 2),
              |cum AS (SELECT l_returnflag, bin, cnt,
              |          CAST(SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin
              |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
              |          CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
              |        FROM cnts),
              |bands AS (SELECT l_returnflag,
              |    ${Profile.binnedQuantileSql(0.05, 100000L)},
              |    ${Profile.binnedQuantileSql(0.95, 100000L)}
              |  FROM cum GROUP BY l_returnflag)
              |SELECT s.l_orderkey, s.l_linenumber, s.l_returnflag, s.l_extendedprice,
              |       least(greatest(CAST(s.l_extendedprice AS DOUBLE), b.p5), b.p95)
              |         AS l_extendedprice_wins
              |FROM src s JOIN bands b USING (l_returnflag)
              |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Exact keyed Pearson correlation ([[TimeSeries.pearsonByKey]]):
    // quantity↔revenue correlation per supplier. Native corr() is
    // banned from oracle paths (order-dependent float partials in both
    // engines); here the sufficient statistics are exact cent-space
    // BIGINTs from ONE map-side-combined aggregate and the epilogue is
    // a fixed IEEE chain — hash-exact, and the mergeable-stats shape a
    // 100 TB shard-combine actually uses.
    Q("ts_corr",
      (s, dir) => TimeSeries.pearsonByKey(
        Tables.lineitem(s, dir).filter(col("l_suppkey") < 200),
        Seq("l_suppkey"), "l_quantity", "l_extendedprice")
        .orderBy("l_suppkey"),
      Some {
        val nd = "CAST(n_pairs AS DOUBLE)"
        def d(c: String) = s"CAST($c AS DOUBLE)"
        val num = s"($nd * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
        val varx = s"($nd * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
        val vary = s"($nd * ${d("syy")} - ${d("sy")} * ${d("sy")})"
        val den = s"(sqrt(GREATEST($varx, 0.0)) * sqrt(GREATEST($vary, 0.0)))"
        s"""WITH c AS (SELECT l_suppkey,
           |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS cx,
           |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cy
           |  FROM lineitem
           |  WHERE l_suppkey < 200 AND l_quantity IS NOT NULL
           |    AND l_extendedprice IS NOT NULL),
           |a AS (SELECT l_suppkey, ${TimeSeries.pearsonSql("cx", "cy")}
           |      FROM c GROUP BY l_suppkey)
           |SELECT l_suppkey, n_pairs,
           |       CASE WHEN n_pairs = 0 OR $den = 0.0 THEN NULL
           |            ELSE $num / $den END AS corr
           |FROM a ORDER BY l_suppkey""".stripMargin
      }),

    // Multi-horizon trailing features ([[TimeSeries.trailingFeatures]]):
    // trailing 7/30/90-CALENDAR-day spend sum/count/mean per customer as
    // of each activity date — the point-in-time feature backfill every
    // ML feature store computes. All three horizons are RANGE frames of
    // ONE window spec (same keys, same epoch-day order), so the whole
    // sweep is a single WindowExec over a single shuffle+sort — K
    // horizons for the price of one pass. Decimal-exact sums; the
    // oracle runs the identical frames via a SQL WINDOW clause.
    Q("feat_trailing",
      (s, dir) => {
        val daily = Tables.orders(s, dir).filter(col("o_custkey") < 2000)
          .groupBy(col("o_custkey"), col("o_orderdate").cast(DateType).as("d"))
          .agg(Det.dsum(col("o_totalprice")).as("day_total"))
        TimeSeries.trailingFeatures(daily, Seq("o_custkey"), "d", "day_total",
          Seq(7, 30, 90)).orderBy("o_custkey", "d")
      },
      Some {
        def feat(h: Int) =
          s"""CAST(SUM(CAST(day_total AS DECIMAL(18,2))) OVER w$h AS DOUBLE) AS day_total_sum_${h}d,
             |  CAST(COUNT(day_total) OVER w$h AS BIGINT) AS day_total_cnt_${h}d,
             |  CAST(SUM(CAST(day_total AS DECIMAL(18,2))) OVER w$h AS DOUBLE)
             |    / CAST(COUNT(day_total) OVER w$h AS BIGINT) AS day_total_avg_${h}d""".stripMargin
        def win(h: Int) =
          s"""w$h AS (PARTITION BY o_custkey ORDER BY datediff('day', DATE '1970-01-01', d)
             |  RANGE BETWEEN ${h - 1} PRECEDING AND CURRENT ROW)""".stripMargin
        s"""WITH daily AS (
           |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           |         ${Det.dsumSql("o_totalprice")} AS day_total
           |  FROM orders WHERE o_custkey < 2000 GROUP BY 1, 2)
           |SELECT o_custkey, d, day_total,
           |  ${feat(7)},
           |  ${feat(30)},
           |  ${feat(90)}
           |FROM daily
           |WINDOW ${win(7)}, ${win(30)}, ${win(90)}
           |ORDER BY o_custkey, d""".stripMargin
      }),

    // Equi-depth histogram of document lengths WITHOUT a global window:
    // exact quartile boundaries from one aggregate (0.25/0.5/0.75 are
    // binary-exact fractions, where Spark `percentile` and DuckDB
    // `quantile_cont` agree over integer data), broadcast onto the rows
    // for bucket assignment, then a keyed aggregate — the two-phase
    // shape that scales where `ntile()` (single global sort partition)
    // does not.
    Q("t_equidepth",
      (s, dir) => {
        val lens = Tables.documents(s, dir)
          .select(col("doc_id"), length(col("text")).as("len"))
        val bounds = lens.agg(
          percentile(col("len"), lit(0.25)).as("q1"),
          percentile(col("len"), lit(0.5)).as("q2"),
          percentile(col("len"), lit(0.75)).as("q3"))
        lens.crossJoin(broadcast(bounds))
          .withColumn("bucket",
            lit(1) + (col("len") > col("q1")).cast("int")
              + (col("len") > col("q2")).cast("int")
              + (col("len") > col("q3")).cast("int"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("docs"), min(col("len")).as("min_len"),
            max(col("len")).as("max_len"))
          .orderBy("bucket")
      },
      Some("""WITH lens AS (SELECT doc_id, length(text) AS len FROM documents),
             |bounds AS (SELECT quantile_cont(len, 0.25) AS q1,
             |                  quantile_cont(len, 0.5) AS q2,
             |                  quantile_cont(len, 0.75) AS q3 FROM lens)
             |SELECT 1 + CAST(len > q1 AS INTEGER) + CAST(len > q2 AS INTEGER)
             |         + CAST(len > q3 AS INTEGER) AS bucket,
             |       COUNT(*) AS docs, MIN(len) AS min_len, MAX(len) AS max_len
             |FROM lens CROSS JOIN bounds
             |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ── Graph analytics over interaction edges ─────────────────────────
    // The customer↔supplier interaction graph: an undirected edge per
    // distinct (customer, supplier) pair that ever traded (orders ⋈
    // lineitem). Node ids are namespaced into one key space (customer =
    // 2k, supplier = 2k+1) so the two entity families can't collide.

    // Degree distribution — the first thing to look at on any graph
    // (skew here predicts which PageRank/CC keys need salting). Integer
    // counts, zero float risk; two keyed aggregates.
    Q("gr_degree",
      (s, dir) => {
        val e = graphEdges(s, dir)
        e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
          .groupBy(col("degree")).agg(count(lit(1)).as("nodes"))
          .orderBy("degree")
      },
      Some(s"""WITH $graphEdgesSql,
              |deg AS (SELECT src AS node, COUNT(*) AS degree FROM edges GROUP BY src)
              |SELECT degree, COUNT(*) AS nodes FROM deg
              |GROUP BY degree ORDER BY degree""".stripMargin)),

    // Connected components as a first-class graph query
    // ([[Dedup.connectedComponents]] — the same label-propagation core
    // the dedup pipelines build on, here oracle-hashed directly):
    // component = min node id reachable, converged by min-label pull
    // rounds over the symmetrized edges. The oracle computes min
    // reachable id per node via a recursive CTE — exact integer labels,
    // so the hash has zero tolerance.
    Q("gr_components",
      // one-directional pairs: connectedComponents symmetrizes
      // internally, so the pre-symmetrized list doubled every round's
      // join volume (mirror edges re-added) — same result either way
      (s, dir) => Dedup.connectedComponents(
        graphPairs(s, dir).select(col("src").as("id_a"), col("dst").as("id_b")),
        maxIter = 20)
        .select(col("id").as("node"), col("component"))
        .orderBy("node"),
      Some(s"""WITH RECURSIVE $graphEdgesSql,
              |reach(node, r) AS (
              |  SELECT src AS node, src AS r FROM edges
              |  UNION
              |  SELECT e.src AS node, reach.r FROM edges e JOIN reach ON e.dst = reach.node)
              |SELECT node, MIN(r) AS component FROM reach
              |GROUP BY node ORDER BY node""".stripMargin)),

    // Connected components on CHAIN-SHAPED graphs
    // ([[Dedup.connectedComponentsStar]] — alternating large-star/
    // small-star contraction, O(log n) rounds): the fixture is the
    // shape min-label propagation provably cannot close — consecutive
    // order keys chained within 1000-key chunks, i.e. 1000-node PATHS
    // (diameter 999, vs min-label's default 10-20 rounds) — standing
    // in for URL-canonicalization chains and citation paths. The
    // oracle needs no recursion: components of a sorted-adjacency
    // chain are gaps-and-islands runs, exact integer labels.
    Q("gr_components_star",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("chunk").orderBy("k")
        val edges = Tables.orders(s, dir)
          .select(col("o_orderkey").as("k"),
            expr("o_orderkey div 1000").as("chunk"))
          .withColumn("nk", lead(col("k"), 1).over(w))
          .filter(col("nk").isNotNull && col("nk") - col("k") <= 25)
          .select(col("k").as("id_a"), col("nk").as("id_b"))
        Dedup.connectedComponentsStar(edges)
          .select(col("id").as("node"), col("component"))
          .orderBy("node")
      },
      Some("""WITH s AS (SELECT o_orderkey AS k, o_orderkey // 1000 AS chunk FROM orders),
             |g AS (SELECT k, chunk,
             |        CASE WHEN k - lag(k) OVER (PARTITION BY chunk ORDER BY k) <= 25
             |             THEN 0 ELSE 1 END AS brk
             |      FROM s),
             |i AS (SELECT k, chunk, SUM(brk) OVER (PARTITION BY chunk ORDER BY k) AS isl FROM g),
             |c AS (SELECT k, MIN(k) OVER (PARTITION BY chunk, isl) AS component,
             |        COUNT(*) OVER (PARTITION BY chunk, isl) AS sz
             |      FROM i)
             |SELECT k AS node, component FROM c WHERE sz >= 2
             |ORDER BY node""".stripMargin)),

    // Label-propagation communities ([[Graph.labelPropagation]], 2
    // synchronous rounds): each node adopts its neighbors' most
    // frequent label, ties to the smaller — exact integer labels, so
    // the 2-round SQL unroll hash-matches with zero tolerance. The
    // community structure is the curation signal componentry can't
    // give: components only split DISCONNECTED parts, LPA splits
    // dense regions inside one component.
    Q("gr_label_prop",
      (s, dir) => Graph.labelPropagation(graphEdges(s, dir), rounds = 2)
        .select(col("node"), col("label").as("community"))
        .orderBy("node"),
      Some {
        def round(prev: String, out: String) =
          s"""f_$out AS (SELECT e.src, l.label, COUNT(*) AS cnt
             |  FROM edges e JOIN $prev l ON e.dst = l.node GROUP BY 1, 2),
             |$out AS (SELECT src AS node, label FROM (
             |    SELECT src, label,
             |           row_number() OVER (PARTITION BY src ORDER BY cnt DESC, label) AS rn
             |    FROM f_$out) WHERE rn = 1)""".stripMargin
        s"""WITH $graphEdgesSql,
           |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
           |${round("l0", "l1")},
           |${round("l1", "l2")}
           |SELECT node, label AS community FROM l2 ORDER BY node""".stripMargin
      }),

    // Modularity of the LPA communities ([[Graph.modularity]]): the
    // "are these communities real" score in its exact integer form
    // (E2·Σe_c − Σd_c²)/E2² — three keyed counts, DECIMAL(38) products
    // (E2² overflows BIGINT at web scale), ONE double division. The
    // oracle recomputes the same integers over the 2-round LPA unroll.
    Q("gr_modularity",
      (s, dir) => {
        // one edge materialization feeds BOTH the LPA rounds and the
        // modularity tagging joins — the orders⋈lineitem derivation
        // would otherwise run 3×
        val e = graphEdges(s, dir).localCheckpoint()
        Graph.modularity(e, Graph.labelPropagation(e, rounds = 2))
      },
      Some {
        def round(prev: String, out: String) =
          s"""f_$out AS (SELECT e.src, l.label, COUNT(*) AS cnt
             |  FROM edges e JOIN $prev l ON e.dst = l.node GROUP BY 1, 2),
             |$out AS (SELECT src AS node, label FROM (
             |    SELECT src, label,
             |           row_number() OVER (PARTITION BY src ORDER BY cnt DESC, label) AS rn
             |    FROM f_$out) WHERE rn = 1)""".stripMargin
        s"""WITH $graphEdgesSql,
           |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
           |${round("l0", "l1")},
           |${round("l1", "l2")},
           |tagged AS (SELECT e.src, e.dst, ls.label AS cs, ld.label AS cd
           |           FROM edges e
           |           JOIN l2 ls ON e.src = ls.node
           |           JOIN l2 ld ON e.dst = ld.node),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS e2,
           |               CAST(SUM(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS BIGINT) AS intra
           |        FROM tagged),
           |dg AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
           |              CAST(SUM(d * d) AS BIGINT) AS sum_deg_sq FROM (
           |         SELECT cs, count(*) AS d FROM tagged GROUP BY cs))
           |SELECT n_communities, e2, intra AS intra_edges, sum_deg_sq,
           |       CAST(CAST(e2 AS HUGEINT) * CAST(intra AS HUGEINT)
           |            - CAST(sum_deg_sq AS HUGEINT) AS DOUBLE)
           |       / CAST(CAST(e2 AS HUGEINT) * CAST(e2 AS HUGEINT) AS DOUBLE)
           |         AS modularity
           |FROM tot, dg""".stripMargin
      }),

    // PageRank, 3 fixed-point rounds (graph-importance curation signal;
    // [[graft.ops.Graph.pageRank]] — per-round one keyed join + one
    // keyed aggregate over the edge table, ranks cached and lineage cut
    // per round, edges never broadcast/collected). Rank mass travels as
    // BIGINT fixed-point (units of 1e-15): integer div + integer SUM are
    // exact and order-independent in BOTH engines, so the oracle — the
    // identical three rounds unrolled in SQL — hash-matches bit-for-bit
    // (a double or DECIMAL formulation would not; see Graph scaladoc).
    Q("gr_pagerank",
      (s, dir) => Graph.pageRank(graphEdges(s, dir), iterations = 3)
        .orderBy("node"),
      Some {
        val s = Graph.SCALE
        def round(prev: String, out: String) =
          s"""c_$out AS (SELECT e.dst AS node, SUM(r.rank // d.out_deg) AS in_rank
             |  FROM edges e JOIN $prev r ON e.src = r.node JOIN outdeg d ON e.src = d.src
             |  GROUP BY e.dst),
             |$out AS (SELECT nodes.node,
             |    (150 * $s) // (1000 * (SELECT n FROM nn))
             |      + (850 * COALESCE(c.in_rank, 0)) // 1000 AS rank
             |  FROM nodes LEFT JOIN c_$out c ON nodes.node = c.node)""".stripMargin
        s"""WITH $graphEdgesSql,
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |nn AS (SELECT COUNT(*) AS n FROM nodes),
           |outdeg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
           |r0 AS (SELECT node, $s // (SELECT n FROM nn) AS rank FROM nodes),
           |${round("r0", "r1")},
           |${round("r1", "r2")},
           |${round("r2", "r3")}
           |SELECT node, CAST(rank AS DOUBLE) / $s.0 AS rank FROM r3 ORDER BY node""".stripMargin
      }),

    // Weighted PageRank: rank splits proportionally to interaction
    // strength (lineitem count per pair) instead of evenly —
    // `contrib = rank·w div strength`, still pure integer fixed-point,
    // so the unrolled SQL hash-matches exactly like the unweighted run.
    Q("gr_pagerank_weighted",
      (s, dir) => Graph.pageRank(weightedGraphEdges(s, dir), iterations = 3,
        weightCol = Some("w")).orderBy("node"),
      Some {
        val s = Graph.SCALE
        def round(prev: String, out: String) =
          s"""c_$out AS (SELECT e.dst AS node, SUM((r.rank * e.w) // d.strength) AS in_rank
             |  FROM edges e JOIN $prev r ON e.src = r.node JOIN outdeg d ON e.src = d.src
             |  GROUP BY e.dst),
             |$out AS (SELECT nodes.node,
             |    (150 * $s) // (1000 * (SELECT n FROM nn))
             |      + (850 * COALESCE(c.in_rank, 0)) // 1000 AS rank
             |  FROM nodes LEFT JOIN c_$out c ON nodes.node = c.node)""".stripMargin
        s"""WITH $weightedGraphEdgesSql,
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |nn AS (SELECT COUNT(*) AS n FROM nodes),
           |outdeg AS (SELECT src, SUM(w) AS strength FROM edges GROUP BY src),
           |r0 AS (SELECT node, $s // (SELECT n FROM nn) AS rank FROM nodes),
           |${round("r0", "r1")},
           |${round("r1", "r2")},
           |${round("r2", "r3")}
           |SELECT node, CAST(rank AS DOUBLE) / $s.0 AS rank FROM r3 ORDER BY node""".stripMargin
      }),

    // RENORMALIZED HITS ([[graft.ops.Graph.hits]]) on the DIRECTED
    // customer→supplier purchase graph — the DEEP-ITERATION form next
    // to AnalyticsQueries' gr_hits (whose unnormalized exact-integer
    // rounds grow score magnitude ~degree^k per round: DECIMAL(38)
    // holds 2 rounds, not 20): block-floating renormalization
    // x div (max div S + 1) caps every iterate below S in pure BIGINT
    // (never the overflowing x·S/max product, never an in-iterate
    // sqrt — any positive per-round divisor preserves the converged
    // direction), so the fixed point can run as many rounds as
    // convergence needs at any graph size. Two rounds here; the
    // unrolled oracle hash-matches bit-for-bit.
    Q("gr_hits_normalized",
      (s, dir) => {
        val pairs = Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        Graph.hits(pairs, iterations = 2).orderBy("node")
      },
      Some {
        val S = Graph.HITS_SCALE
        // one gather+renorm half-round: sum prev over joinCol, keyed by
        // groupCol, then integer block-floating renormalization
        def half(prev: String, out: String, joinCol: String,
                 groupCol: String, inCol: String, outCol: String) =
          s"""${out}_r AS (SELECT n.node, COALESCE(s.v, 0) AS v FROM nodes n LEFT JOIN
             |  (SELECT e.$groupCol AS node, SUM(p.$inCol) AS v
             |   FROM eraw e JOIN $prev p ON e.$joinCol = p.node GROUP BY 1) s
             |  ON n.node = s.node),
             |$out AS (SELECT node,
             |  v // ((SELECT MAX(v) FROM ${out}_r) // $S + 1) AS $outCol
             |  FROM ${out}_r)""".stripMargin
        s"""WITH eraw AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |nodes AS (SELECT src AS node FROM eraw UNION SELECT dst AS node FROM eraw),
           |h0 AS (SELECT node, CAST($S AS BIGINT) AS hub FROM nodes),
           |${half("h0", "a1", "src", "dst", "hub", "auth")},
           |${half("a1", "h1", "dst", "src", "auth", "hub")},
           |${half("h1", "a2", "src", "dst", "hub", "auth")},
           |${half("a2", "h2", "dst", "src", "auth", "hub")}
           |SELECT h2.node, CAST(h2.hub AS DOUBLE) / $S.0 AS hub,
           |       CAST(a2.auth AS DOUBLE) / $S.0 AS authority
           |FROM h2 JOIN a2 ON h2.node = a2.node ORDER BY 1""".stripMargin
      }),

    // INCREMENTAL PageRank ([[graft.ops.Graph.pageRankResume]]): the
    // maintained-graph refresh — ranks from the pre-1997 interaction
    // graph are the maintained table ([[Graph.pageRankUnits]], exact
    // fixed-point BIGINTs); when 1997+ edges land, iteration RESUMES
    // from those units on the full graph instead of cold-starting.
    // New nodes seed at SCALE/n; 3 warm rounds follow 3 maintained
    // rounds. Every operation is integer (div/sum), so the oracle —
    // both phases unrolled in SQL, warm start via COALESCE — matches
    // bit-for-bit. GraphSpec pins the incremental CLAIM (warm rounds
    // land closer to the converged ranks than the same cold rounds);
    // this query pins the exact arithmetic of the resumed schedule.
    Q("gr_pagerank_incremental",
      (s, dir) => {
        def edgesFrom(o: DataFrame) = o
          // single-pass explode symmetrization (the graphEdges form) —
          // the union-of-swap planned the join+distinct twice
          .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
          .select(explode(array(
            struct(col("src"), col("dst")),
            struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        val cut = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
        val prior = Graph.pageRankUnits(
          edgesFrom(Tables.orders(s, dir).filter(col("o_orderdate") < lit(cut))),
          iterations = 3)
        Graph.pageRankResume(edgesFrom(Tables.orders(s, dir)), prior, iterations = 3)
          .orderBy("node")
      },
      Some {
        val sc = Graph.SCALE
        def round(prev: String, out: String, e: String, od: String, nn: String) =
          s"""c_$out AS (SELECT e.dst AS node, SUM(r.rank // d.out_deg) AS in_rank
             |  FROM $e e JOIN $prev r ON e.src = r.node JOIN $od d ON e.src = d.src
             |  GROUP BY e.dst),
             |$out AS (SELECT n0.node,
             |    (150 * $sc) // (1000 * (SELECT n FROM $nn))
             |      + (850 * COALESCE(c.in_rank, 0)) // 1000 AS rank
             |  FROM (SELECT node FROM ${if (nn == "nn0") "nodes0" else "nodes"}) n0
             |  LEFT JOIN c_$out c ON n0.node = c.node)""".stripMargin
        s"""WITH eraw0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |         WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
           |edges0 AS (SELECT src, dst FROM eraw0 UNION ALL SELECT dst AS src, src AS dst FROM eraw0),
           |eraw AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |         FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |edges AS (SELECT src, dst FROM eraw UNION ALL SELECT dst AS src, src AS dst FROM eraw),
           |nodes0 AS (SELECT DISTINCT src AS node FROM edges0),
           |nn0 AS (SELECT COUNT(*) AS n FROM nodes0),
           |outdeg0 AS (SELECT src, COUNT(*) AS out_deg FROM edges0 GROUP BY src),
           |p0 AS (SELECT node, $sc // (SELECT n FROM nn0) AS rank FROM nodes0),
           |${round("p0", "p1", "edges0", "outdeg0", "nn0")},
           |${round("p1", "p2", "edges0", "outdeg0", "nn0")},
           |${round("p2", "p3", "edges0", "outdeg0", "nn0")},
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |nn AS (SELECT COUNT(*) AS n FROM nodes),
           |outdeg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
           |w0 AS (SELECT nodes.node,
           |    COALESCE(p3.rank, $sc // (SELECT n FROM nn)) AS rank
           |  FROM nodes LEFT JOIN p3 ON nodes.node = p3.node),
           |${round("w0", "w1", "edges", "outdeg", "nn")},
           |${round("w1", "w2", "edges", "outdeg", "nn")},
           |${round("w2", "w3", "edges", "outdeg", "nn")}
           |SELECT node, CAST(rank AS DOUBLE) / $sc.0 AS rank FROM w3 ORDER BY node""".stripMargin
      }),

    // Personalized PageRank ([[Graph.personalizedPageRank]]): teleport
    // mass concentrates on a SEED set (every 100th customer) instead
    // of all nodes — "importance relative to these entities", the
    // seed-expansion primitive behind related-item retrieval and
    // trusted-set curation. Seeds carry base (1000−d)·SCALE/(1000·|S|),
    // non-seeds 0; init SCALE/|S| on seeds. Same integer fixed-point
    // currency as gr_pagerank, so the unrolled oracle (seed CASE in
    // every round) matches bit-for-bit; rank-0 rows (unreachable from
    // seeds) are kept — absence of seed proximity is signal.
    Q("gr_ppr",
      (s, dir) => {
        val seeds = Tables.customer(s, dir).filter(col("c_custkey") % 100 === 0)
          .select((col("c_custkey") * 2).as("node"))
        Graph.personalizedPageRank(graphEdges(s, dir), seeds, iterations = 3)
          .orderBy("node")
      },
      Some {
        val sc = Graph.SCALE
        def round(prev: String, out: String) =
          s"""c_$out AS (SELECT e.dst AS node, SUM(r.rank // d.out_deg) AS in_rank
             |  FROM edges e JOIN $prev r ON e.src = r.node JOIN outdeg d ON e.src = d.src
             |  GROUP BY e.dst),
             |$out AS (SELECT nodes.node,
             |    CASE WHEN sn.node IS NOT NULL
             |      THEN (150 * $sc) // (1000 * (SELECT n FROM ns)) ELSE 0 END
             |      + (850 * COALESCE(c.in_rank, 0)) // 1000 AS rank
             |  FROM nodes LEFT JOIN c_$out c ON nodes.node = c.node
             |             LEFT JOIN sn ON nodes.node = sn.node)""".stripMargin
        s"""WITH $graphEdgesSql,
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |outdeg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
           |sn AS (SELECT node FROM nodes WHERE node IN
           |         (SELECT c_custkey * 2 FROM customer WHERE c_custkey % 100 = 0)),
           |ns AS (SELECT COUNT(*) AS n FROM sn),
           |r0 AS (SELECT nodes.node,
           |    CASE WHEN sn.node IS NOT NULL
           |      THEN $sc // (SELECT n FROM ns) ELSE 0 END AS rank
           |  FROM nodes LEFT JOIN sn ON nodes.node = sn.node),
           |${round("r0", "r1")},
           |${round("r1", "r2")},
           |${round("r2", "r3")}
           |SELECT node, CAST(rank AS DOUBLE) / $sc.0 AS rank FROM r3 ORDER BY node""".stripMargin
      }),

    // Triangle counting + local clustering coefficient over the PART
    // CO-OCCURRENCE graph (parts bought together in one order — the
    // customer↔supplier graph is bipartite and trivially triangle-free).
    // [[Graph.triangles]]: edges directed low→high under (degree, node)
    // order, wedges built only at each triangle's lowest-rank vertex,
    // closed by one equi-join — O(m^1.5) total, the exact-counting bound
    // that survives web-scale graphs; no broadcast, no driver reads.
    // Clustering coefficient is a curation signal (a page/product whose
    // neighbors all know each other is a community hub; isolated-star
    // nodes often spam). Q1-1996 window keeps the graph mid-sized at
    // every SF. Counts are exact integers; lcc is one correctly-rounded
    // division — the oracle runs the identical wedge algebra in SQL.
    Q("gr_triangles",
      (s, dir) => {
        val lp = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
            && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
        val co = lp.as("x").join(lp.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .select(col("x.p").as("src"), col("y.p").as("dst")).distinct()
        Graph.triangles(co).orderBy("node")
      },
      Some("""WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'),
             |und AS (SELECT DISTINCT x.p AS a, y.p AS b
             |        FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p),
             |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
             |          SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
             |        GROUP BY node),
             |dir AS (SELECT
             |    CASE WHEN da.degree < db.degree OR (da.degree = db.degree AND u0.a < u0.b)
             |         THEN u0.a ELSE u0.b END AS u,
             |    CASE WHEN da.degree < db.degree OR (da.degree = db.degree AND u0.a < u0.b)
             |         THEN u0.b ELSE u0.a END AS v,
             |    CASE WHEN da.degree < db.degree OR (da.degree = db.degree AND u0.a < u0.b)
             |         THEN db.degree ELSE da.degree END AS dv
             |  FROM und u0 JOIN deg da ON da.node = u0.a JOIN deg db ON db.node = u0.b),
             |tri AS (SELECT w1.u AS x, w1.v AS y, w2.v AS z
             |  FROM dir w1 JOIN dir w2 ON w1.u = w2.u
             |    AND (w1.dv < w2.dv OR (w1.dv = w2.dv AND w1.v < w2.v))
             |  JOIN dir c ON c.u = w1.v AND c.v = w2.v),
             |pern AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
             |           SELECT x AS node FROM tri UNION ALL SELECT y AS node FROM tri
             |           UNION ALL SELECT z AS node FROM tri)
             |         GROUP BY node)
             |SELECT deg.node, deg.degree, COALESCE(pern.triangles, 0) AS triangles,
             |       CASE WHEN deg.degree >= 2
             |            THEN CAST(2 * COALESCE(pern.triangles, 0) AS DOUBLE)
             |                 / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
             |            ELSE 0.0 END AS lcc
             |FROM deg LEFT JOIN pern ON pern.node = deg.node
             |ORDER BY deg.node""".stripMargin)),

    // Hop-bounded weighted shortest paths
    // ([[Graph.weightedShortestPaths]]): Bellman-Ford relaxation rounds
    // over the interaction-weighted customer↔supplier graph — min total
    // weight over ≤2-edge paths from the seed customers. The oracle is
    // a recursive CTE carrying a hop counter with the identical cap;
    // integer weights → bit-exact. Complements gr_bfs (hop metric) with
    // the cost metric, same checkpointed-generation loop shape.
    Q("gr_sssp_weighted",
      (s, dir) => {
        val sources = Tables.orders(s, dir).filter(col("o_custkey") < 2)
          .select((col("o_custkey") * 2).as("node")).distinct()
        Graph.weightedShortestPaths(weightedGraphEdges(s, dir), sources,
          maxHops = 2, weightCol = "w").orderBy("node")
      },
      Some(s"""WITH RECURSIVE $weightedGraphEdgesSql,
              |srcs AS (SELECT DISTINCT o_custkey * 2 AS node FROM orders WHERE o_custkey < 2),
              |paths(node, dist, hops) AS (
              |  SELECT node, CAST(0 AS BIGINT) AS dist, 0 AS hops FROM srcs
              |  UNION
              |  SELECT e.dst AS node, p.dist + e.w AS dist, p.hops + 1 AS hops
              |  FROM paths p JOIN edges e ON e.src = p.node
              |  WHERE p.hops < 2)
              |SELECT node, MIN(dist) AS dist FROM paths GROUP BY node
              |ORDER BY node""".stripMargin)),

    // Multi-source BFS hop distances ([[Graph.shortestPaths]]): frontier
    // expansion against src-pre-partitioned cached edges, one keyed
    // join + distinct + anti-join per hop, frontiers checkpointed and
    // the loop early-exits on an empty frontier. "How far is every
    // entity from this seed set" is the standard reachability/influence
    // primitive (seed-set contamination spread, crawl-frontier depth).
    // Hop counts are exact integers; the oracle is DuckDB's RECURSIVE
    // CTE with the identical hop cap — MIN(dist) over its (node, dist)
    // fixpoint IS first-reach BFS distance, so the hash matches.
    Q("gr_bfs",
      (s, dir) => {
        val sources = Tables.orders(s, dir).filter(col("o_custkey") < 3)
          .select((col("o_custkey") * 2).as("node")).distinct()
        Graph.shortestPaths(graphEdges(s, dir), sources, maxHops = 3)
          .orderBy("node")
      },
      Some(s"""WITH RECURSIVE $graphEdgesSql,
              |srcs AS (SELECT DISTINCT o_custkey * 2 AS node FROM orders WHERE o_custkey < 3),
              |bfs(node, dist) AS (
              |  SELECT node, 0 AS dist FROM srcs
              |  UNION
              |  SELECT e.dst AS node, b.dist + 1 AS dist
              |  FROM bfs b JOIN edges e ON e.src = b.node
              |  WHERE b.dist < 3)
              |SELECT node, MIN(dist) AS dist FROM bfs GROUP BY node
              |ORDER BY node""".stripMargin)),

    // ── Link prediction ────────────────────────────────────────────────

    // Common-neighbors / Jaccard link prediction
    // ([[Graph.linkPrediction]]) over the part co-occurrence graph (the
    // gr_triangles fixture): which part pairs NEVER bought together
    // share the most co-purchase neighbors — the classic
    // recommendation-candidate / graph-completion primitive. Wedges are
    // enumerated at their shared center (one equi-join keyed by center,
    // O(Σ deg²) where the data lives), hub centers above degree 50
    // contribute no wedges (the shingle-df-cap reasoning), existing
    // edges leave via one anti-join. Counts exact; Jaccard is one
    // correctly-rounded division.
    Q("gr_link_pred",
      (s, dir) => {
        val lp = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
            && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
        val co = lp.as("x").join(lp.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .select(col("x.p").as("src"), col("y.p").as("dst")).distinct()
        val edges = co.unionByName(co.select(col("dst").as("src"), col("src").as("dst")))
        Graph.linkPrediction(edges, maxCenterDegree = 50L)
          .orderBy(col("common").desc, col("a"), col("b")).limit(20)
      },
      Some("""WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'),
             |eraw AS (SELECT DISTINCT x.p AS src, y.p AS dst
             |         FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p),
             |edges AS (SELECT src, dst FROM eraw UNION ALL SELECT dst, src FROM eraw),
             |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
             |via AS (SELECT e.src, e.dst FROM edges e JOIN deg d ON e.src = d.node AND d.deg <= 50),
             |w AS (SELECT v1.dst AS a, v2.dst AS b, CAST(COUNT(*) AS BIGINT) AS common
             |      FROM via v1 JOIN via v2 ON v1.src = v2.src AND v1.dst < v2.dst
             |      GROUP BY 1, 2),
             |cand AS (SELECT w.* FROM w WHERE NOT EXISTS
             |         (SELECT 1 FROM edges e WHERE e.src = w.a AND e.dst = w.b))
             |SELECT a, b, common,
             |       CAST(da.deg + db.deg - common AS BIGINT) AS union_size,
             |       CAST(common AS DOUBLE) / (da.deg + db.deg - common) AS jaccard
             |FROM cand JOIN deg da ON cand.a = da.node JOIN deg db ON cand.b = db.node
             |ORDER BY common DESC, a, b LIMIT 20""".stripMargin)),

    // ── Change-point detection ─────────────────────────────────────────

    // CUSUM mean-shift detection ([[TimeSeries.changePoint]]) on the
    // per-returnflag daily revenue series: the argmax of the cumulative
    // deviation |n·CumSum_t − t·Total| locates the split a level shift
    // creates — monitoring's "when did this series change regime"
    // primitive next to the threshold screens (ts_zscore family). All
    // internals are exact integer cents in DECIMAL(38,0)/HUGEINT
    // (n·cum products outgrow BIGINT at 100 TB); outputs are the exact
    // before/after sufficient statistics plus one double conversion.
    Q("ts_changepoint",
      (s, dir) => {
        val daily = Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_shipdate").cast(DateType).as("d"))
          .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .as("cents"))
        TimeSeries.changePoint(daily, Seq("l_returnflag"), "d", "cents")
          .orderBy("l_returnflag")
      },
      Some("""WITH daily AS (
             |  SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
             |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
             |  FROM lineitem GROUP BY 1, 2),
             |st AS (SELECT l_returnflag, d,
             |         CAST(ROW_NUMBER() OVER w AS HUGEINT) AS t,
             |         CAST(SUM(cents) OVER w AS HUGEINT) AS cum,
             |         CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS HUGEINT) AS n,
             |         CAST(SUM(cents) OVER (PARTITION BY l_returnflag) AS HUGEINT) AS tot
             |       FROM daily WINDOW w AS (PARTITION BY l_returnflag ORDER BY d)),
             |sc AS (SELECT l_returnflag, d, n * cum - t * tot AS s, t, cum, n, tot
             |       FROM st WHERE t < n),
             |best AS (SELECT *, ROW_NUMBER() OVER
             |           (PARTITION BY l_returnflag ORDER BY ABS(s) DESC, d) AS rn FROM sc)
             |SELECT l_returnflag, d AS cp_at, CAST(ABS(s) AS DOUBLE) AS cusum_abs,
             |       CAST(t AS BIGINT) AS n_before, CAST(cum AS BIGINT) AS sum_before_cents,
             |       CAST(n - t AS BIGINT) AS n_after, CAST(tot - cum AS BIGINT) AS sum_after_cents
             |FROM best WHERE rn = 1 ORDER BY l_returnflag""".stripMargin)),

    // ── Customer analytics ─────────────────────────────────────────────

    // RFM quintile segmentation ([[EventOps.rfmSegments]]) over purchase
    // events, rolled up to the segment grid. The quintile thresholds
    // come from bounded VALUE-COUNT cumsums (never a global ntile — that
    // is one all-users sort through a single partition), so the plan
    // survives 10⁹ users; scoring is a broadcast-threshold projection.
    // Monetary rides exact integer cents throughout.
    Q("ev_rfm",
      (s, dir) => EventOps.rfmSegments(
          Tables.events(s, dir).filter(col("event_type") === "purchase"),
          "user_id", "ts", "value")
        .groupBy(col("r"), col("f"), col("m"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("monetary_cents")).as("monetary_cents_total"))
        .orderBy("r", "f", "m"),
      Some("""WITH ev AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
             |anchor AS (SELECT MAX(CAST(ts AS DATE)) AS ad FROM ev),
             |per AS (SELECT user_id,
             |          date_diff('day', MAX(CAST(ts AS DATE)), (SELECT ad FROM anchor)) AS recency_days,
             |          CAST(COUNT(*) AS BIGINT) AS frequency,
             |          CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS monetary_cents
             |        FROM ev GROUP BY user_id),
             |perb AS (SELECT *, monetary_cents // 10000 AS mbin FROM per),
             |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM perb),
             |rc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum
             |       FROM (SELECT recency_days AS v, COUNT(*) AS c FROM perb GROUP BY 1)),
             |rt AS (SELECT MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 1 THEN v END) AS t1,
             |              MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 2 THEN v END) AS t2,
             |              MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 3 THEN v END) AS t3,
             |              MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 4 THEN v END) AS t4 FROM rc),
             |fc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum
             |       FROM (SELECT frequency AS v, COUNT(*) AS c FROM perb GROUP BY 1)),
             |ft AS (SELECT MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 1 THEN v END) AS t1,
             |              MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 2 THEN v END) AS t2,
             |              MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 3 THEN v END) AS t3,
             |              MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 4 THEN v END) AS t4 FROM fc),
             |mc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum
             |       FROM (SELECT mbin AS v, COUNT(*) AS c FROM perb GROUP BY 1)),
             |mt AS (SELECT MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 1 THEN v END) AS t1,
             |              MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 2 THEN v END) AS t2,
             |              MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 3 THEN v END) AS t3,
             |              MIN(CASE WHEN cum * 5 >= (SELECT n FROM nn) * 4 THEN v END) AS t4 FROM mc),
             |scored AS (SELECT user_id, monetary_cents,
             |    1 + CAST(recency_days > rt.t1 AS INTEGER) + CAST(recency_days > rt.t2 AS INTEGER)
             |      + CAST(recency_days > rt.t3 AS INTEGER) + CAST(recency_days > rt.t4 AS INTEGER) AS r,
             |    1 + CAST(frequency > ft.t1 AS INTEGER) + CAST(frequency > ft.t2 AS INTEGER)
             |      + CAST(frequency > ft.t3 AS INTEGER) + CAST(frequency > ft.t4 AS INTEGER) AS f,
             |    1 + CAST(mbin > mt.t1 AS INTEGER) + CAST(mbin > mt.t2 AS INTEGER)
             |      + CAST(mbin > mt.t3 AS INTEGER) + CAST(mbin > mt.t4 AS INTEGER) AS m
             |  FROM perb, rt, ft, mt)
             |SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_users,
             |       CAST(SUM(monetary_cents) AS BIGINT) AS monetary_cents_total
             |FROM scored GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin)),

    // Cohort lifetime-value triangle ([[EventOps.cohortLtv]]): purchase
    // revenue per (first-purchase-day cohort, day offset), accumulated
    // across the offset axis — the LTV curve next to ev_retention's
    // user-count triangle. Exact integer cents end-to-end; the running
    // sum's partitions are calendar-bounded.
    Q("ev_cohort_ltv",
      (s, dir) => EventOps.cohortLtv(
          Tables.events(s, dir).filter(col("event_type") === "purchase"),
          "user_id", "ts", "value")
        .orderBy("cohort_d", "day_offset"),
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d,
             |              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |            FROM events WHERE event_type = 'purchase'),
             |f AS (SELECT user_id, MIN(d) AS cohort_d FROM ev GROUP BY 1),
             |g AS (SELECT f.cohort_d, date_diff('day', f.cohort_d, ev.d) AS day_offset,
             |             CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_active,
             |             CAST(SUM(ev.cents) AS BIGINT) AS revenue_cents
             |      FROM ev JOIN f USING (user_id) GROUP BY 1, 2)
             |SELECT cohort_d, day_offset, n_active, revenue_cents,
             |       CAST(SUM(revenue_cents) OVER
             |         (PARTITION BY cohort_d ORDER BY day_offset) AS BIGINT) AS cum_revenue_cents
             |FROM g ORDER BY cohort_d, day_offset""".stripMargin)),

    // ── kNN classification ─────────────────────────────────────────────

    // k-nearest-neighbor classifier evaluation over the embedding table:
    // every 10th vector is held out, classified by majority label of its
    // 5 nearest training neighbors (exact cosine — the brute-force
    // baseline; the scale path swaps in the IVF/LSH candidate generators
    // already here, sim_ivf_search/sim_lsh_topk). The held-out side is
    // a broadcast; the corpus side is one narrow scan, so no shuffle
    // touches the big table until the bounded per-query top-k. Ties
    // break (cosine DESC, id) for neighbors and (votes DESC, label) for
    // the prediction — deterministic in both engines.
    Q("ml_knn",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = Tables.embeddings(s, dir)
        val test = emb.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("label").as("true_label"))
        val train = emb.filter(col("vec_id") % 10 =!= 0)
        val top = train.crossJoin(broadcast(test))
          .select(col("q_id"), col("true_label"), col("vec_id"), col("label"),
            Similarity.cosine(col("embedding"), col("q_vec")).as("cos"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rn") <= 5)
        val pred = top.groupBy(col("q_id"), col("true_label"), col("label"))
          .agg(count(lit(1)).as("v"))
          .withColumn("pr", row_number().over(
            Window.partitionBy("q_id").orderBy(col("v").desc, col("label"))))
          .filter(col("pr") === 1)
        pred.groupBy(col("true_label"))
          .agg(count(lit(1)).as("n_queries"),
            sum(when(col("label") === col("true_label"), 1L).otherwise(0L)).as("n_correct"))
          .orderBy("true_label")
      },
      Some(s"""WITH test AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS true_label
              |             FROM embeddings WHERE vec_id % 10 = 0),
              |train AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 10 <> 0),
              |scored AS (SELECT t.q_id, t.true_label, r.vec_id, r.label,
              |                  ${Similarity.cosineSql("r.embedding", "t.q_vec")} AS cos
              |           FROM train r CROSS JOIN test t),
              |top AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
              |          (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn FROM scored)
              |        WHERE rn <= 5),
              |votes AS (SELECT q_id, true_label, label, COUNT(*) AS v FROM top GROUP BY 1, 2, 3),
              |pred AS (SELECT q_id, true_label, label FROM (SELECT *, ROW_NUMBER() OVER
              |           (PARTITION BY q_id ORDER BY v DESC, label) AS pr FROM votes)
              |         WHERE pr = 1)
              |SELECT true_label, CAST(COUNT(*) AS BIGINT) AS n_queries,
              |       CAST(SUM(CASE WHEN label = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
              |FROM pred GROUP BY 1 ORDER BY true_label""".stripMargin)),

    // ── MMR diversified re-ranking ─────────────────────────────────────

    // Maximal-marginal-relevance re-ranking ([[Similarity.mmrSelect]]):
    // the top-8 cosine candidates for query vector 0, greedily re-ranked
    // to 4 picks with λ=0.7 — retrieval diversification between the ANN
    // shortlist and the consumer. The greedy recursion is sequential by
    // definition: k driver-coordinated rounds over the cached bounded
    // candidate set (the kmeans-round shape). The oracle unrolls the
    // identical 4 rounds as CTEs; all arithmetic is the shared
    // left-to-right double fold, so the hash is exact.
    Q("sim_mmr",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        val cands = emb.crossJoin(broadcast(q))
          .where(col("vec_id") =!= 0)
          .select(col("vec_id"), col("embedding"),
            Similarity.cosine(col("embedding"), col("qv")).as("rel"))
          .orderBy(col("rel").desc, col("vec_id"))
          .limit(8)
        Similarity.mmrSelect(cands, "vec_id", "embedding", "rel", k = 4, lambda = 0.7)
          .orderBy("rank")
      },
      Some(mmrOracleSql(k = 4, nCands = 8, lambda = 0.7))),

    // ANN-assisted near-dup CANDIDATE PAIRS from the k-NN graph — the
    // index's production dedup use: instead of LSH banding or an
    // all-pairs verify, the maintained graph's edges under a distance
    // threshold ARE the candidate set (each node's k nearest were
    // already computed once, at build time). Canonicalized id_a <
    // id_b with the min distance per pair (an edge can appear in both
    // endpoints' lists). Candidate recall is the graph's recall —
    // sim_graph_stats' reciprocal fraction is its health gauge.
    Q("sim_nn_dedup_pairs",
      (s, dir) => {
        val g = cachedNnGraph(s, dir, "full") {
          val src = Tables.embeddings(s, dir)
          Similarity.nnDescent(src, "vec_id", "embedding",
            k = 6, rounds = 2, buckets = adaptiveBuckets(src.count()))
        }
        g.filter(col("dist") <= 1.2)
          .select(least(col("vec_id"), col("nbr_id")).as("id_a"),
            greatest(col("vec_id"), col("nbr_id")).as("id_b"), col("dist"))
          .groupBy("id_a", "id_b").agg(min("dist").as("dist"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id AS id, embedding AS vec FROM embeddings),
              |${Similarity.nnDescentCtesSql(k = 6, rounds = 2, adaptiveBucketsSql("e"))},
              |edges AS (SELECT src, dst, sqrt(d2) AS dist FROM knn2)
              |SELECT LEAST(src, dst) AS id_a, GREATEST(src, dst) AS id_b,
              |       MIN(dist) AS dist
              |FROM edges WHERE dist <= 1.2
              |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin)),

    // Greedy k-CENTER coreset selection ([[Similarity.kCenterSelect]],
    // Gonzalez '85): the corpus's 6 most mutually-distant exemplars
    // with the per-pick coverage radius — the diversity-sampling
    // decision curve ("how much does exemplar i still add") behind
    // training-data selection; a 2-approximation of the optimal
    // k-center cover. Sequential by definition (the mmrSelect
    // driver-round shape); the oracle unrolls the same greedy picks.
    Q("samp_kcenter",
      (s, dir) => Similarity.kCenterSelect(Tables.embeddings(s, dir),
          "vec_id", "embedding", k = 6)
        .orderBy("rank"),
      Some(kCenterOracleSql(k = 6))),

    // k-CENTER COVER assignment ([[Similarity.kCenterSelect]]'s
    // consumer): every vector assigned to its nearest selected
    // exemplar (ties → smaller center rank), with per-center member
    // counts, the REALIZED cover radius (max assigned distance — the
    // quantity the 2-approximation bounds), and mean member distance.
    // Centers are a bounded collect (6 rows, the watermark pattern);
    // assignment is one broadcast cross join + a struct-min aggregate
    // (map-side combined, no window).
    Q("samp_kcenter_cover",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cents = Similarity.kCenterSelect(emb, "vec_id", "embedding", k = 6)
          .join(emb, "vec_id")
          .select(col("rank").as("crank"), col("vec_id").as("center_id"),
            col("embedding").as("cvec"))
        val asg = emb.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("crank"),
            Similarity.distSqFold(col("embedding"), col("cvec")).as("d2"))
          .groupBy("vec_id")
          .agg(min(struct(col("d2"), col("crank"))).as("m"))
          .select(col("vec_id"), col("m.crank").as("crank"), col("m.d2").as("d2"))
        asg.groupBy("crank")
          .agg(count(lit(1)).as("n_assigned"),
            max(sqrt(col("d2"))).as("cover_radius"),
            sum(floor(sqrt(col("d2")) * lit(1e6)).cast(LongType)).as("__dm"))
          .join(broadcast(cents.select(col("crank"), col("center_id"))), "crank")
          .select(col("crank").as("center_rank"), col("center_id"),
            col("n_assigned"), col("cover_radius"),
            (col("__dm").cast(DoubleType) / lit(1e6) /
              col("n_assigned").cast(DoubleType)).as("mean_dist"))
          .orderBy("center_rank")
      },
      Some {
        val cents = (1 to 6).map(i => s"SELECT CAST($i AS BIGINT) AS crank, id, vec FROM s$i")
          .mkString(" UNION ALL ")
        s"""${kCenterOracleCtes(k = 6)},
           |cents AS (${cents}),
           |asg AS (SELECT p.vec_id, c.crank, c.id,
           |          ${Similarity.distSqSql("p.embedding", "c.vec")} AS d2
           |        FROM embeddings p CROSS JOIN cents c),
           |best AS (SELECT vec_id, crank, id, d2 FROM (
           |    SELECT vec_id, crank, id, d2,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, crank) AS rn
           |    FROM asg) WHERE rn = 1)
           |SELECT crank AS center_rank, id AS center_id,
           |       count(*) AS n_assigned,
           |       MAX(sqrt(d2)) AS cover_radius,
           |       CAST(SUM(CAST(floor(sqrt(d2) * 1000000.0) AS BIGINT)) AS DOUBLE)
           |         / 1000000.0 / count(*) AS mean_dist
           |FROM best GROUP BY 1, 2 ORDER BY center_rank""".stripMargin
      }),

    // Per-language TOKENIZER-FERTILITY report — the budget planner's
    // table: docs/tokens/chars per detected language plus chars-per-
    // token fertility (how many characters one token "costs" in each
    // language — the statistic multilingual token budgets are priced
    // with, since whitespace-tokenizer fertility varies by script and
    // morphology). One projection (shared langId + counts), one keyed
    // aggregate; the ratio is a single division of exact integers.
    Q("t_lang_fertility",
      (s, dir) => Tables.documents(s, dir)
        .select(TextOps.langId(col("text")).as("lang"),
          TextOps.tokenCount(col("text")).as("n_tok"),
          length(col("text")).cast(LongType).as("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").cast(LongType).as("tokens_total"),
          sum("n_chars").cast(LongType).as("chars_total"))
        .withColumn("chars_per_token",
          when(col("tokens_total") > 0,
            col("chars_total").cast(DoubleType) / col("tokens_total").cast(DoubleType)))
        .orderBy("lang"),
      Some(s"""SELECT lang, count(*) AS n_docs,
              |  CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
              |  CAST(SUM(n_chars) AS BIGINT) AS chars_total,
              |  CASE WHEN SUM(n_tok) > 0 THEN
              |    CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE) END
              |    AS chars_per_token
              |FROM (SELECT ${TextOps.langIdSql("text")} AS lang,
              |        CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tok,
              |        CAST(length(text) AS BIGINT) AS n_chars
              |      FROM documents)
              |GROUP BY 1 ORDER BY lang""".stripMargin)),

    // ── Corpus export sharding ─────────────────────────────────────────

    // Deterministic shard assignment for corpus handoff: shard =
    // md5(doc_id) first hex digit (engine-portable, partition-invariant
    // — the samp_* rank-key rule), with per-shard doc/byte accounting
    // and an IN-PLAN balance fence (max ≤ 4× min docs — a skewed export
    // starves downstream loader parallelism; fail loudly, not quietly).
    // One hash-agg shuffle over narrow columns; the oracle checks the
    // ASSIGNMENT (per-shard identities via min/max/count), not just
    // sizes.
    Q("t_shard_assign",
      (s, dir) => {
        val per = Tables.documents(s, dir)
          .groupBy(substring(md5(col("doc_id").cast("string")), 1, 1).as("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
            min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        val bounds = per.agg(max(col("n_docs")).as("__mx"), min(col("n_docs")).as("__mn"))
        per.crossJoin(broadcast(bounds))
          .select(col("shard"),
            when(col("__mx") > col("__mn") * 4,
              raise_error(concat(lit("t_shard_assign: unbalanced shards (max "),
                col("__mx"), lit(" > 4x min "), col("__mn"), lit(")"))).cast("long"))
              .otherwise(col("n_docs")).as("n_docs"),
            col("total_chars"), col("min_doc"), col("max_doc"))
          .orderBy("shard")
      },
      Some("""SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
             |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin)),

    // ── Winnowing fingerprints ─────────────────────────────────────────

    // MOSS-style winnowing ([[TextOps.winnow]], Schleimer et al.
    // SIGMOD'03): per-window minimal k-gram hashes — the classic
    // document-fingerprint scheme between exact-hash dedup and full
    // shingle sets (any shared substring ≥ k+w−1 chars shares a
    // fingerprint at ~2/(w+1) density). Gram hashes are md5-prefix
    // STRINGS (min = lexicographic min, engine-portable); the oracle
    // replays the identical explode → window-min → distinct chain. The
    // density invariant n_fp ≤ n_windows is implied by the per-doc
    // counts the hash pins.
    Q("t_winnow",
      (s, dir) => TextOps.winnow(Tables.documents(s, dir), "doc_id", "text",
          k = 5, w = 4)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fp"), min(col("fp")).as("min_fp"),
          max(col("fp")).as("max_fp"))
        .orderBy("doc_id"),
      Some(s"""WITH ${TextOps.winnowSql(k = 5, w = 4)}
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp,
              |       MIN(fp) AS min_fp, MAX(fp) AS max_fp
              |FROM wfp GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // ── Positional phrase search ───────────────────────────────────────

    // Quoted-phrase retrieval ([[Search.phraseSearch]]): documents
    // containing the exact token sequence "fast sort", with occurrence
    // counts — the positional-index capability tf-only BM25 cannot
    // answer. Each phrase term filters the postings BEFORE its join
    // (term-selective posting lists, never the corpus), all n−1 joins
    // share the phrase-start key.
    Q("search_phrase",
      (s, dir) => Search.phraseSearch(Tables.documents(s, dir), "doc_id", "text",
          Seq("fast", "sort"))
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS t FROM documents),
              |post AS (SELECT doc_id, i AS pos, t[i] AS term
              |         FROM tok, unnest(range(1, len(t) + 1)) AS r(i)),
              |m0 AS (SELECT doc_id, pos FROM post WHERE term = 'fast'),
              |m1 AS (SELECT doc_id, pos - 1 AS pos FROM post WHERE term = 'sort')
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
              |FROM (SELECT m0.doc_id, m0.pos FROM m0 JOIN m1 USING (doc_id, pos))
              |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // Nearest-neighbor PNG downscale ([[Multimodal.pngResizeStats]] /
    // decodePngPixelsStrided): the full CRC→inflate→defilter read path
    // with a stride-2 sampler — exactly the pixels a ×½ resize emits,
    // statistics predicted analytically per pixel by the oracle. The
    // thumbnail/training-resolution pass with a zero-tolerance check.
    Q("mm_resize",
      (s, dir) => Multimodal.pngResizeStats(s,
        Multimodal.synthPngPixelCorpus(s, Tables.documents(s, dir), "doc_id"),
        "doc_id", "payload", step = 2)
        .orderBy("doc_id"),
      Some("""WITH dims AS (SELECT doc_id, 8 + doc_id % 9 AS w,
             |                     8 + (doc_id * 3) % 9 AS h
             |              FROM documents),
             |px AS (SELECT doc_id, w, h, unnest(range(0, w, 2)) AS x FROM dims),
             |pxy AS (SELECT doc_id, w, h, x, unnest(range(0, h, 2)) AS y FROM px)
             |SELECT doc_id,
             |       CAST((w + 1) // 2 AS INTEGER) AS out_w,
             |       CAST((h + 1) // 2 AS INTEGER) AS out_h,
             |       CAST(count(*) AS BIGINT) AS n_pixels,
             |       CAST(SUM((doc_id + 7 * x + 13 * y) % 256) AS BIGINT) AS pix_sum
             |FROM pxy GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin)),

    // Animated-GIF multimodal path with a REAL block-walk parse:
    // genuine GIF89a containers (logical screen descriptor, per-frame
    // graphic-control extension + image descriptor + data sub-blocks,
    // trailer) with id-keyed dimensions AND frame counts, decoded by
    // [[Multimodal.parseGif]]. The oracle predicts every column
    // analytically — byte_len = 14 + Σ_f (22 + f % 5) exercises the
    // whole sub-block walk; a mis-stepped block or LE/BE slip
    // hash-mismatches. The only multi-frame IMAGE container in the
    // suite (AVI covers video): frame-sample planning gets its n_frames
    // from the header without decoding a pixel.
    Q("mm_gif_meta",
      (s, dir) => Multimodal.decodeMeta(s,
        Multimodal.synthGifCorpus(s, Tables.documents(s, dir), "doc_id"),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("""WITH fr AS (SELECT doc_id, 1 + doc_id % 4 AS nf FROM documents)
             |SELECT doc_id,
             |  CAST(14 + 22 * nf + (nf * (nf - 1)) / 2 AS BIGINT) AS byte_len,
             |  '474946383961' || printf('%02x', 16 + doc_id % 200) || '00' AS header_hex,
             |  CAST(16 + doc_id % 200 AS INTEGER) AS width,
             |  CAST(16 + (doc_id * 7) % 200 AS INTEGER) AS height,
             |  CAST(nf AS INTEGER) AS n_frames
             |FROM fr ORDER BY doc_id""".stripMargin)),

    // ── URL canonicalization ([[UrlOps]]) ─────────────────────────────

    // Canonical-URL dedup: the synthesized crawl spellings (case, www,
    // default port, trailing slash, param order, tracking params,
    // fragments — all deterministic functions of doc_id, mirrored in
    // SQL) collapse under [[UrlOps.urlCanonicalize]] into clusters on a
    // ~60-byte key. This is the FIRST dedup pass of a web corpus: one
    // narrow hash aggregate, before any content shingling.
    Q("dd_url_dedup",
      (s, dir) => {
        val d = col("doc_id")
        val url = concat(
          when(d % 3 === 0, lit("HTTP://WWW.Site"))
            .when(d % 3 === 1, lit("http://www.site"))
            .otherwise(lit("http://CDN.site")),
          (d % 7).cast(StringType), lit(".com"),
          when(d % 5 === 0, lit(":80")).otherwise(lit("")),
          lit("/docs/"), (d % 40).cast(StringType),
          when(d % 2 === 0, lit("/")).otherwise(lit("")),
          when(d % 4 === 0, lit("?utm_source=feed&b=2&a=1"))
            .when(d % 4 === 1, lit("?a=1&b=2"))
            .when(d % 4 === 2, lit("?b=2&a=1&fbclid=X"))
            .otherwise(lit("")),
          when(d % 6 === 0, lit("#section-2")).otherwise(lit("")))
        Tables.documents(s, dir)
          .select(d.as("doc_id"), UrlOps.urlCanonicalize(url).as("canonical_url"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_doc"))
          .filter(col("n_docs") > 1)
          .orderBy("canonical_url")
      },
      Some(s"""SELECT ${UrlOps.urlCanonicalizeSql(synthUrlSql)} AS canonical_url,
              |       CAST(COUNT(*) AS BIGINT) AS n_docs,
              |       MIN(doc_id) AS keep_doc
              |FROM documents
              |GROUP BY 1 HAVING COUNT(*) > 1
              |ORDER BY canonical_url""".stripMargin)),

    // IPv4 parse + CIDR containment (crawl-log infrastructure): the
    // dotted-quad STRING is parsed back to its uint32 (split → cast →
    // shift-add), the /16 subnet key extracted, and 10.0.0.0/9
    // membership tested on the numeric form — all integer arithmetic,
    // the rate-limit / dedup-by-subnet key of a fetch pipeline.
    Q("p_ipv4_cidr",
      (s, dir) => {
        val d = col("doc_id")
        val ip = concat(lit("10."), (d % 200).cast(StringType), lit("."),
          ((d * 7) % 256).cast(StringType), lit("."), ((d * 13) % 256).cast(StringType))
        val oct = split(col("ip"), "\\.")
        val ipNum = (oct.getItem(0).cast(LongType) * lit(16777216L)
          + oct.getItem(1).cast(LongType) * lit(65536L)
          + oct.getItem(2).cast(LongType) * lit(256L)
          + oct.getItem(3).cast(LongType))
        Tables.documents(s, dir).filter(d < 100)
          .select(d.as("doc_id"), ip.as("ip"))
          .withColumn("ip_num", ipNum)
          .withColumn("subnet16",
            concat(oct.getItem(0), lit("."), oct.getItem(1)))
          .withColumn("in_10_0_0_0_9",
            col("ip_num") >= lit(167772160L) && col("ip_num") < lit(176160768L))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (SELECT doc_id,
             |    '10.' || CAST(doc_id % 200 AS VARCHAR) || '.'
             |          || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
             |          || CAST((doc_id * 13) % 256 AS VARCHAR) AS ip
             |  FROM documents WHERE doc_id < 100),
             |p AS (SELECT doc_id, ip, string_split(ip, '.') AS o FROM u)
             |SELECT doc_id, ip,
             |       CAST(o[1] AS BIGINT) * 16777216 + CAST(o[2] AS BIGINT) * 65536
             |         + CAST(o[3] AS BIGINT) * 256 + CAST(o[4] AS BIGINT) AS ip_num,
             |       o[1] || '.' || o[2] AS subnet16,
             |       (CAST(o[1] AS BIGINT) * 16777216 + CAST(o[2] AS BIGINT) * 65536
             |         + CAST(o[3] AS BIGINT) * 256 + CAST(o[4] AS BIGINT)) >= 167772160
             |       AND (CAST(o[1] AS BIGINT) * 16777216 + CAST(o[2] AS BIGINT) * 65536
             |         + CAST(o[3] AS BIGINT) * 256 + CAST(o[4] AS BIGINT)) < 176160768
             |         AS in_10_0_0_0_9
             |FROM p ORDER BY doc_id""".stripMargin)),

    // URL structural projection: canonical form + host + registered
    // domain per document — the per-domain keys a crawl pipeline
    // partitions, rate-limits, and quality-priors by.
    Q("p_url_parts",
      (s, dir) => {
        val d = col("doc_id")
        val url = concat(
          when(d % 3 === 0, lit("HTTP://WWW.Site"))
            .when(d % 3 === 1, lit("http://www.site"))
            .otherwise(lit("http://CDN.site")),
          (d % 7).cast(StringType), lit(".com"),
          when(d % 5 === 0, lit(":80")).otherwise(lit("")),
          lit("/docs/"), (d % 40).cast(StringType),
          when(d % 2 === 0, lit("/")).otherwise(lit("")),
          when(d % 4 === 0, lit("?utm_source=feed&b=2&a=1"))
            .when(d % 4 === 1, lit("?a=1&b=2"))
            .when(d % 4 === 2, lit("?b=2&a=1&fbclid=X"))
            .otherwise(lit("")),
          when(d % 6 === 0, lit("#section-2")).otherwise(lit("")))
        Tables.documents(s, dir).filter(d < 60)
          .select(d.as("doc_id"), url.as("url"))
          .select(col("doc_id"), col("url"),
            UrlOps.urlCanonicalize(col("url")).as("canonical_url"),
            UrlOps.urlHost(col("url")).as("host"),
            UrlOps.urlRegisteredDomain(col("url")).as("reg_domain"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id, $synthUrlSql AS url
              |           FROM documents WHERE doc_id < 60)
              |SELECT doc_id, url,
              |       ${UrlOps.urlCanonicalizeSql("url")} AS canonical_url,
              |       ${UrlOps.urlHostSql("url")} AS host,
              |       ${UrlOps.urlRegisteredDomainSql("url")} AS reg_domain
              |FROM u ORDER BY doc_id""".stripMargin)),

    // Prefix-filtered set-similarity self-join
    // ([[graft.ops.Dedup.ppjoinPairs]] — the AllPairs/PPJoin family):
    // exact token-set Jaccard ≥ 0.95 pairs where candidate generation
    // touches only each document's (n − ⌈t·n⌉ + 1) globally-RAREST
    // tokens instead of every posting. Lossless (prefix-filter lemma),
    // so the brute-force oracle must agree exactly — the filter is
    // pure candidate pruning, never recall loss. The third member of
    // the exact-near-dup family next to dd_jaccard (df-capped shingle
    // postings) and dd_minhash_lsh (probabilistic banding): this one
    // keeps exactness AND prunes, the trade the others each give up.
    Q("dd_ppjoin",
      (s, dir) => Dedup.ppjoinPairs(
          Tables.documents(s, dir), "doc_id", "text", minJaccard = 0.95)
        .orderBy("id_a", "id_b"),
      Some("""WITH tok AS (SELECT DISTINCT doc_id AS id,
             |         unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS tok
             |       FROM documents),
             |n AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
             |inter AS (SELECT a.id AS ia, b.id AS ib, CAST(COUNT(*) AS BIGINT) AS shared
             |          FROM tok a JOIN tok b ON a.tok = b.tok AND a.id < b.id
             |          GROUP BY 1, 2)
             |SELECT ia AS id_a, ib AS id_b, na.n AS n_a, nb.n AS n_b,
             |       shared AS n_shared,
             |       CAST(shared AS DOUBLE) / CAST(na.n + nb.n - shared AS DOUBLE) AS jaccard
             |FROM inter JOIN n na ON na.id = ia JOIN n nb ON nb.id = ib
             |WHERE CAST(shared AS DOUBLE) / CAST(na.n + nb.n - shared AS DOUBLE) >= 0.95
             |ORDER BY id_a, id_b""".stripMargin)),

    // Per-document n-gram novelty ([[graft.ops.TextOps.ngramNovelty]]):
    // fraction of each doc's distinct 3-grams never seen in a lower-id
    // document — contribution scoring for data mixing ("how much NEW
    // text does this candidate add"), the complement of pairwise
    // near-dup. One min(doc_id) aggregate keyed by gram: strictly
    // linear in exploded grams, no pair table at any scale.
    Q("t_ngram_novelty",
      (s, dir) => TextOps.ngramNovelty(
          Tables.documents(s, dir), "doc_id", "text", n = 3)
        .orderBy("doc_id"),
      Some("""WITH tok AS (SELECT doc_id,
             |         list_filter(string_split(text, ' '), t -> len(t) > 0) AS toks
             |       FROM documents),
             |g AS (SELECT doc_id, unnest(list_distinct(
             |         list_transform(range(1, len(toks) - 1),
             |           i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS gram
             |      FROM tok WHERE len(toks) >= 3),
             |f AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY 1)
             |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             |       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             |       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             |         / CAST(COUNT(*) AS DOUBLE) AS novelty
             |FROM g JOIN f USING (gram)
             |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin)),

    // Market-basket association rules (Apriori's two levels): brands
    // co-purchased within an order, directed rules a→b with support /
    // confidence / lift, thresholds RELATIVE to basket count so the
    // query is scale-invariant. The frequent-item filter runs BEFORE
    // the per-basket self-join — Apriori's anti-monotone pruning is
    // what bounds the pair fan-out at scale (here every brand is
    // frequent, so the gate is exercised, not load-bearing) — and the
    // item list broadcasts. Counts exact BIGINT; conf/lift are single
    // correctly-rounded divisions of exact integer products.
    Q("t_assoc_rules",
      (s, dir) => {
        val items = Tables.lineitem(s, dir)
          .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
          .distinct()
        val nb = items.agg(countDistinct(col("basket")).as("n_baskets"))
        val supp = items.groupBy(col("item")).agg(count(lit(1)).as("supp"))
        val freq = supp.crossJoin(broadcast(nb))
          .filter(col("supp") >= lit(0.05) * col("n_baskets"))
        val fi = items.join(broadcast(freq.select("item", "supp")), "item")
        val pairs = fi.as("x").join(fi.as("y"),
            col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
          .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"),
            col("x.supp").as("supp_a"), col("y.supp").as("supp_b"))
          .agg(count(lit(1)).as("supp_ab"))
          .crossJoin(broadcast(nb))
          .filter(col("supp_ab") >= lit(0.025) * col("n_baskets"))
        val directed = pairs.select(
            col("item_a").as("ante"), col("item_b").as("cons"),
            col("supp_a").as("supp_ante"), col("supp_b").as("supp_cons"),
            col("supp_ab"), col("n_baskets"))
          .unionByName(pairs.select(
            col("item_b").as("ante"), col("item_a").as("cons"),
            col("supp_b").as("supp_ante"), col("supp_a").as("supp_cons"),
            col("supp_ab"), col("n_baskets")))
        directed.select(col("ante"), col("cons"), col("supp_ab"),
            (col("supp_ab").cast(org.apache.spark.sql.types.DoubleType) /
              col("supp_ante").cast(org.apache.spark.sql.types.DoubleType)).as("confidence"),
            ((col("supp_ab") * col("n_baskets")).cast(org.apache.spark.sql.types.DoubleType) /
              (col("supp_ante") * col("supp_cons")).cast(org.apache.spark.sql.types.DoubleType)).as("lift"))
          .orderBy("ante", "cons")
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey AS basket, p_brand AS item
             |         FROM lineitem JOIN part ON l_partkey = p_partkey),
             |nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets FROM items),
             |s AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS supp FROM items GROUP BY 1),
             |freq AS (SELECT item, supp FROM s, nb WHERE supp >= 0.05 * n_baskets),
             |fi AS (SELECT i.basket, i.item, f.supp FROM items i JOIN freq f USING (item)),
             |p AS (SELECT x.item AS item_a, y.item AS item_b,
             |        x.supp AS supp_a, y.supp AS supp_b,
             |        CAST(COUNT(*) AS BIGINT) AS supp_ab
             |      FROM fi x JOIN fi y ON x.basket = y.basket AND x.item < y.item
             |      GROUP BY 1, 2, 3, 4),
             |pf AS (SELECT p.* FROM p, nb WHERE supp_ab >= 0.025 * n_baskets),
             |d AS (SELECT item_a AS ante, item_b AS cons, supp_a AS supp_ante,
             |             supp_b AS supp_cons, supp_ab FROM pf
             |      UNION ALL
             |      SELECT item_b, item_a, supp_b, supp_a, supp_ab FROM pf)
             |SELECT ante, cons, supp_ab,
             |       CAST(supp_ab AS DOUBLE) / CAST(supp_ante AS DOUBLE) AS confidence,
             |       CAST(supp_ab * (SELECT n_baskets FROM nb) AS DOUBLE)
             |         / CAST(supp_ante * supp_cons AS DOUBLE) AS lift
             |FROM d ORDER BY ante, cons""".stripMargin)),

    // Jaro-Winkler fuzzy-name pairs ([[graft.functions.JaroWinkler]] —
    // a native codegen BinaryExpression, Spark's missing member of the
    // string-similarity family next to levenshtein). Semantics pinned
    // to RapidFuzz (which DuckDB vendors): identical match-window /
    // transposition / prefix-boost rules AND the identical double
    // association order, so the oracle compares UNROUNDED doubles.
    // Candidates are brand-blocked (never all-pairs); the comparator
    // runs inside whole-stage codegen on the blocked join output.
    Q("er_jaro",
      (s, dir) => {
        val p = Tables.part(s, dir)
          .filter(col("p_partkey") % 10 === 0)
          .select(col("p_partkey"), col("p_brand"), col("p_name"))
        p.as("a").join(p.as("b"),
            col("a.p_brand") === col("b.p_brand") &&
              col("a.p_partkey") < col("b.p_partkey"))
          .select(col("a.p_partkey").as("id_a"), col("b.p_partkey").as("id_b"),
            graft.ops.Linkage.jaroWinkler(col("a.p_name"), col("b.p_name")).as("jw"))
          .filter(col("jw") >= 0.85)
          .orderBy("id_a", "id_b")
      },
      Some("""SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             |       jaro_winkler_similarity(a.p_name, b.p_name) AS jw
             |FROM part a JOIN part b
             |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             | AND a.p_partkey % 10 = 0 AND b.p_partkey % 10 = 0
             |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85
             |ORDER BY id_a, id_b""".stripMargin)),

    // EXACT radius search with triangle-inequality cell pruning
    // ([[Similarity.rangeSearch]]): every item within Euclidean 1.2 of
    // each query — the epsilon-neighborhood primitive (radius dedup,
    // DBSCAN) — with whole cells skipped by the ball-tree bound
    // d(q,c) > τ + r_c. Pruning is recall-free (unlike ivfSearch's
    // nprobe trade): the brute-force oracle must agree EXACTLY, both
    // engines comparing dist² against the identical Scala-computed τ²
    // double on the identical distance fold.
    Q("sim_range_search",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val queries = emb.filter(col("vec_id") % 25 === 0).select("vec_id")
        Similarity.rangeSearch(emb, queries, "embedding", "vec_id",
            cents, "c_vec", "c_id", maxDist = 1.2)
          .orderBy("query_id", "item_id")
      },
      Some(s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
              |d AS (SELECT q.vec_id AS query_id, e.vec_id AS item_id,
              |        ${Similarity.distSqSql("q.embedding", "e.embedding")} AS dist_sq
              |      FROM q CROSS JOIN embeddings e WHERE q.vec_id <> e.vec_id)
              |SELECT query_id, item_id, sqrt(dist_sq) AS dist
              |FROM d WHERE dist_sq <= ${1.2 * 1.2}
              |ORDER BY query_id, item_id""".stripMargin)),

    // NN-DESCENT k-NN graph build ([[Similarity.nnDescent]], Dong et
    // al. WWW'11) — the graph-based ANN index family next to IVF
    // (sim_ivf_*) and PQ (sim_ivfpq_*): md5-bucket seeding, then two
    // neighbor-of-neighbor refinement rounds, k best per node by
    // (d², id). Deterministic end to end (no RNG state), so the
    // oracle unrolls the IDENTICAL schedule on the identical distance
    // fold and must hash-match exactly; SimilaritySpec separately
    // measures recall vs brute force and pins the monotone-improvement
    // invariant. Per-round cost N·C(2k,2) distances — never all-pairs.
    Q("sim_nndescent",
      (s, dir) => {
        val src = Tables.embeddings(s, dir)
        Similarity.nnDescent(src, "vec_id", "embedding", k = 6, rounds = 2,
            buckets = adaptiveBuckets(src.count()))
          .orderBy("vec_id", "rank")
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id AS id, embedding AS vec FROM embeddings),
              |${Similarity.nnDescentSql(k = 6, rounds = 2, adaptiveBucketsSql("e"))}""".stripMargin)),

    // BEAM SEARCH over the NN-descent graph ([[Similarity.graphSearch]])
    // — the query half of graph-based ANN (build: sim_nndescent): fixed
    // entry at the minimum node id, 3 expansion hops, beam 8, top-5
    // reported per query. Per query the search touches ≤ hops·beam·deg
    // nodes, never the corpus — the low-latency property HNSW-family
    // indexes are built for. Fully deterministic (set-union expansion,
    // (d², id) selection, bit-portable folds), so the oracle rebuilds
    // the same graph and replays the same hops, hash-exact.
    Q("sim_graph_search",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val nn = cachedNnGraph(s, dir, "full") {
          Similarity.nnDescent(emb, "vec_id", "embedding",
            k = 6, rounds = 2, buckets = adaptiveBuckets(emb.count()))
        }.select(col("vec_id").as("src"), col("nbr_id").as("dst"))
        val queries = emb.filter(col("vec_id") % 50 === 0).select("vec_id")
        Similarity.graphSearch(emb, "vec_id", "embedding", nn, queries,
            beam = 8, hops = 3, k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id AS id, embedding AS vec FROM embeddings),
              |${Similarity.nnDescentCtesSql(k = 6, rounds = 2, adaptiveBucketsSql("e"))},
              |knn AS MATERIALIZED (SELECT src, dst FROM knn2),
              |queries AS MATERIALIZED (SELECT vec_id AS q FROM embeddings WHERE vec_id % 50 = 0),
              |${Similarity.graphSearchSql(beam = 8, hops = 3, k = 5)}""".stripMargin)),

    // HNSW LAYERED SEARCH ([[Similarity.hnswBuild]] +
    // [[Similarity.hnswSearch]]) — the hierarchical entry structure
    // sim_graph_search's flat beam lacks, completing the graph-ANN
    // family the way IVF+PQ completed quantization: md5-geometric
    // levels (p = 1/4) stack three nnDescent layer graphs; each query
    // descends top→0, carrying its 4 best nodes per layer as the next
    // layer's entries (union a 2-node hash-min fallback per layer, so
    // sparse layers degrade to scored entries, never an empty
    // descent), then runs the full beam walk at layer 0. The oracle
    // unrolls all three builds (prefixed nnDescent CTE chains) and all
    // three walks (prefixed, seeded search chains) — bit-exact.
    Q("sim_hnsw_search",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val layered = cachedNnGraph(s, dir, "hnsw2") {
          Similarity.hnswBuild(emb, "vec_id", "embedding",
            k = 6, rounds = 2, maxLevel = 2, bucketsFor = adaptiveBuckets)
        }
        val queries = emb.filter(col("vec_id") % 40 === 0).select("vec_id")
        Similarity.hnswSearch(emb, "vec_id", "embedding", layered, queries,
            beam = 8, hops = 3, k = 6, maxLevel = 2,
            descentBeam = 4, carry = 4, fallback = 2)
          .orderBy("query_id", "rank")
      },
      Some {
        def fbSeed(l: Int, layerRel: String, carriedRel: Option[String]): String = {
          val carried = carriedRel
            .map(r => s"\nUNION SELECT q, node FROM $r").getOrElse("")
          s"""fb$l AS MATERIALIZED (SELECT id AS node FROM (
             |    SELECT id, md5('e:' || CAST(id AS VARCHAR)) || lpad(CAST(id AS VARCHAR), 20, '0') AS ek
             |    FROM $layerRel)
             |  ORDER BY ek LIMIT 2),
             |seed$l AS MATERIALIZED (SELECT DISTINCT q, node FROM (
             |    SELECT q.q, f.node FROM queries q CROSS JOIN fb$l f$carried))""".stripMargin
        }
        s"""WITH e AS MATERIALIZED (SELECT vec_id AS id, embedding AS vec FROM embeddings),
           |lv AS MATERIALIZED (SELECT id, vec,
           |    CASE WHEN h % 16 = 0 THEN 2 WHEN h % 4 = 0 THEN 1 ELSE 0 END AS lvl
           |  FROM (SELECT id, vec,
           |          CAST(('0x' || substr(md5('hl:' || CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
           |        FROM e)),
           |e2 AS MATERIALIZED (SELECT id, vec FROM lv WHERE lvl >= 2),
           |e1 AS MATERIALIZED (SELECT id, vec FROM lv WHERE lvl >= 1),
           |${Similarity.nnDescentCtesSql(k = 6, rounds = 2, adaptiveBucketsSql("e2"), srcRel = "e2", p = "l2_")},
           |${Similarity.nnDescentCtesSql(k = 6, rounds = 2, adaptiveBucketsSql("e1"), srcRel = "e1", p = "l1_")},
           |${Similarity.nnDescentCtesSql(k = 6, rounds = 2, adaptiveBucketsSql("e"), srcRel = "e", p = "l0_")},
           |queries AS MATERIALIZED (SELECT vec_id AS q FROM embeddings WHERE vec_id % 40 = 0),
           |${fbSeed(2, "e2", None)},
           |${Similarity.graphSearchCtesSql(beam = 4, hops = 3, k = 4,
                p = "h2_", eRel = "e", knnRel = "l2_knn2", seedRel = Some("seed2"))},
           |${fbSeed(1, "e1", Some("h2_found"))},
           |${Similarity.graphSearchCtesSql(beam = 4, hops = 3, k = 4,
                p = "h1_", eRel = "e", knnRel = "l1_knn2", seedRel = Some("seed1"))},
           |${fbSeed(0, "e", Some("h1_found"))},
           |${Similarity.graphSearchCtesSql(beam = 8, hops = 3, k = 6,
                p = "h0_", eRel = "e", knnRel = "l0_knn2", seedRel = Some("seed0"))}
           |SELECT q AS query_id, CAST(rn AS BIGINT) AS rank, node AS item_id,
           |       sqrt(d2) AS dist
           |FROM h0_found ORDER BY query_id, rank""".stripMargin
      }),

    // HNSW retrieval QUALITY, not just output correctness (the
    // sim_ivf_recall discipline): recall@6 of the layered search vs
    // the brute-force exact top-6 (same Euclidean metric, same query
    // set as sim_hnsw_search). Both result sets and the recall number
    // itself are oracle-HASHED — the denominator is the measured
    // ground-truth pair count, not a literal, so the query is
    // SF-portable.
    Q("sim_hnsw_recall",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val emb = Tables.embeddings(s, dir)
        val layered = cachedNnGraph(s, dir, "hnsw2") {
          Similarity.hnswBuild(emb, "vec_id", "embedding",
            k = 6, rounds = 2, maxLevel = 2, bucketsFor = adaptiveBuckets)
        }
        val queries = emb.filter(col("vec_id") % 40 === 0).select("vec_id")
        val got = Similarity.hnswSearch(emb, "vec_id", "embedding", layered, queries,
            beam = 8, hops = 3, k = 6, maxLevel = 2,
            descentBeam = 4, carry = 4, fallback = 2)
          .select("query_id", "item_id")
        val qs = emb.filter(col("vec_id") % 40 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("__qv"))
        val wq = Window.partitionBy(col("query_id"))
          .orderBy(col("__d2"), col("item_id"))
        val exact6 = emb.crossJoin(broadcast(qs))
          .where(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("item_id"),
            Similarity.distSqFold(col("embedding"), col("__qv")).as("__d2"))
          .withColumn("__rn", row_number().over(wq))
          .filter(col("__rn") <= 6)
          .select("query_id", "item_id")
          .localCheckpoint() // feeds the hit semi-join AND the denominator
        val hits = got.join(exact6, Seq("query_id", "item_id"), "left_semi")
          .agg(count(lit(1)).as("hits"))
        val truth = exact6.agg(count(lit(1)).as("n_truth"))
        hits.crossJoin(broadcast(truth))
          .select(col("hits"), col("n_truth"),
            (col("hits").cast(DoubleType) / col("n_truth").cast(DoubleType))
              .as("recall"))
      },
      Some {
        s"""WITH e AS MATERIALIZED (SELECT vec_id AS id, embedding AS vec FROM embeddings),
           |lv AS MATERIALIZED (SELECT id, vec,
           |    CASE WHEN h % 16 = 0 THEN 2 WHEN h % 4 = 0 THEN 1 ELSE 0 END AS lvl
           |  FROM (SELECT id, vec,
           |          CAST(('0x' || substr(md5('hl:' || CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
           |        FROM e)),
           |e2 AS MATERIALIZED (SELECT id, vec FROM lv WHERE lvl >= 2),
           |e1 AS MATERIALIZED (SELECT id, vec FROM lv WHERE lvl >= 1),
           |${Similarity.nnDescentCtesSql(k = 6, rounds = 2, adaptiveBucketsSql("e2"), srcRel = "e2", p = "l2_")},
           |${Similarity.nnDescentCtesSql(k = 6, rounds = 2, adaptiveBucketsSql("e1"), srcRel = "e1", p = "l1_")},
           |${Similarity.nnDescentCtesSql(k = 6, rounds = 2, adaptiveBucketsSql("e"), srcRel = "e", p = "l0_")},
           |queries AS MATERIALIZED (SELECT vec_id AS q FROM embeddings WHERE vec_id % 40 = 0),
           |fb2 AS MATERIALIZED (SELECT id AS node FROM (
           |    SELECT id, md5('e:' || CAST(id AS VARCHAR)) || lpad(CAST(id AS VARCHAR), 20, '0') AS ek
           |    FROM e2) ORDER BY ek LIMIT 2),
           |seed2 AS MATERIALIZED (SELECT DISTINCT q.q, f.node FROM queries q CROSS JOIN fb2 f),
           |${Similarity.graphSearchCtesSql(beam = 4, hops = 3, k = 4,
                p = "h2_", eRel = "e", knnRel = "l2_knn2", seedRel = Some("seed2"))},
           |fb1 AS MATERIALIZED (SELECT id AS node FROM (
           |    SELECT id, md5('e:' || CAST(id AS VARCHAR)) || lpad(CAST(id AS VARCHAR), 20, '0') AS ek
           |    FROM e1) ORDER BY ek LIMIT 2),
           |seed1 AS MATERIALIZED (SELECT DISTINCT q, node FROM (
           |    SELECT q.q, f.node FROM queries q CROSS JOIN fb1 f
           |    UNION SELECT q, node FROM h2_found)),
           |${Similarity.graphSearchCtesSql(beam = 4, hops = 3, k = 4,
                p = "h1_", eRel = "e", knnRel = "l1_knn2", seedRel = Some("seed1"))},
           |fb0 AS MATERIALIZED (SELECT id AS node FROM (
           |    SELECT id, md5('e:' || CAST(id AS VARCHAR)) || lpad(CAST(id AS VARCHAR), 20, '0') AS ek
           |    FROM e) ORDER BY ek LIMIT 2),
           |seed0 AS MATERIALIZED (SELECT DISTINCT q, node FROM (
           |    SELECT q.q, f.node FROM queries q CROSS JOIN fb0 f
           |    UNION SELECT q, node FROM h1_found)),
           |${Similarity.graphSearchCtesSql(beam = 8, hops = 3, k = 6,
                p = "h0_", eRel = "e", knnRel = "l0_knn2", seedRel = Some("seed0"))},
           |got AS MATERIALIZED (SELECT q AS query_id, node AS item_id FROM h0_found),
           |exact6 AS MATERIALIZED (SELECT query_id, item_id FROM (
           |    SELECT q.q AS query_id, e.id AS item_id,
           |           row_number() OVER (PARTITION BY q.q
           |               ORDER BY ${Similarity.distSqSql("e.vec", "qv.vec")}, e.id) AS rn
           |    FROM queries q JOIN e qv ON qv.id = q.q
           |    JOIN e ON e.id <> q.q)
           |  WHERE rn <= 6),
           |h AS (SELECT CAST(COUNT(*) AS BIGINT) AS hits
           |      FROM got g JOIN exact6 x
           |        ON g.query_id = x.query_id AND g.item_id = x.item_id),
           |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM exact6)
           |SELECT hits, n_truth,
           |       CAST(hits AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall
           |FROM h, t""".stripMargin
      }),

    // INCREMENTAL HNSW maintenance ([[Similarity.hnswInsert]]) — the
    // layered index's incremental twin, closing the r15 gap where only
    // the flat layer-0 graph had a maintained-index story: the base
    // corpus (90%) holds the built hierarchy; the arriving 10% batch
    // gets md5-geometric levels (a pure function of the id — the SAME
    // level a batch rebuild would assign, so insertion can never skew
    // layer sizes) and every layer ≤ level runs one nnDescentInsert:
    // beam-search the layer for the new member's k-best list, offer
    // each found edge back to its endpoint, re-rank only touched
    // lists. Upper layers hold ~1/4^l of the batch, so the insert cost
    // is ≤ 4/3 of the layer-0 insert. The oracle composes, per layer,
    // the build CTEs + the search CTEs + the identical reverse-offer
    // merge — hash-exact. The entry pools ride the MAINTAINED leveled
    // membership (staged per JVM with the hierarchy itself — the
    // once-per-ingest artifact, the cachedBm25Index discipline), so
    // the timed insert pays batch-level work only: no corpus-wide
    // level projection per call (the r16 `weak` closed; levels are a
    // pure id function, so the staged table equals a rebuild's).
    Q("sim_hnsw_incremental",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val base = emb.filter(col("vec_id") % 10 =!= 0)
        val delta = emb.filter(col("vec_id") % 10 === 0).select("vec_id")
        val l0 = cachedNnGraph(s, dir, "hnsw_base") {
          Similarity.hnswBuild(base, "vec_id", "embedding",
            k = 6, rounds = 2, maxLevel = 2, bucketsFor = adaptiveBuckets)
        }
        val lv = cachedNnGraph(s, dir, "hnsw_base_levels") {
          Similarity.hnswLevels(base, "vec_id", maxLevel = 2)
        }
        Similarity.hnswInsert(emb, "vec_id", "embedding", l0, delta,
            k = 6, beam = 8, hops = 3, maxLevel = 2, levels = Some(lv))
          .orderBy("layer", "vec_id", "rank")
      },
      Some {
        def layerChain(l: Int): String = {
          val lvlFilter = if (l == 0) "" else s" AND lvl >= $l"
          val memberFilter = if (l == 0) "" else s" WHERE lvl >= $l"
          s"""bl$l AS MATERIALIZED (SELECT id, vec FROM lv WHERE id % 10 <> 0$lvlFilter),
             |${Similarity.nnDescentCtesSql(k = 6, rounds = 2,
                adaptiveBucketsSql(s"bl$l"), srcRel = s"bl$l", p = s"g${l}_")},
             |q$l AS MATERIALIZED (SELECT id AS q FROM lv WHERE id % 10 = 0$lvlFilter),
             |fbi$l AS MATERIALIZED (SELECT id AS node FROM (
             |    SELECT id, md5('e:' || CAST(id AS VARCHAR)) || lpad(CAST(id AS VARCHAR), 20, '0') AS ek
             |    FROM lv$memberFilter) ORDER BY ek LIMIT 32),
             |seedi$l AS MATERIALIZED (SELECT DISTINCT q.q, f.node
             |  FROM q$l q CROSS JOIN fbi$l f),
             |${Similarity.graphSearchCtesSql(beam = 8, hops = 3, k = 6,
                p = s"s${l}_", eRel = "e", knnRel = s"g${l}_knn2", qRel = s"q$l",
                seedRel = Some(s"seedi$l"))},
             |old$l AS MATERIALIZED (SELECT src, dst, sqrt(d2) AS dist,
             |    row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rn
             |  FROM g${l}_knn2),
             |${Similarity.nnInsertMergeSql(s"m${l}_", s"old$l", s"s${l}_found", k = 6)}""".stripMargin
        }
        def layerSel(l: Int): String =
          s"""SELECT CAST($l AS INTEGER) AS layer, src AS vec_id,
             |  CAST(rn AS BIGINT) AS rank, dst AS nbr_id, dist
             |FROM m${l}_merged""".stripMargin
        s"""WITH e AS MATERIALIZED (SELECT vec_id AS id, embedding AS vec FROM embeddings),
           |lv AS MATERIALIZED (SELECT id, vec,
           |    CASE WHEN h % 16 = 0 THEN 2 WHEN h % 4 = 0 THEN 1 ELSE 0 END AS lvl
           |  FROM (SELECT id, vec,
           |          CAST(('0x' || substr(md5('hl:' || CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
           |        FROM e)),
           |${layerChain(0)},
           |${layerChain(1)},
           |${layerChain(2)}
           |${layerSel(0)}
           |UNION ALL ${layerSel(1)}
           |UNION ALL ${layerSel(2)}
           |ORDER BY layer, vec_id, rank""".stripMargin
      }),

    // STREAMING ANN-INDEX MAINTENANCE, oracle-hashed end state
    // ([[StreamOps.knnInsertSink]] → [[Similarity.nnDescentInsert]]):
    // the maintained k-NN graph is seeded from the base corpus, then
    // two vector batches arrive as ordered micro-batches (one staged
    // file each, maxFilesPerTrigger=1 — the stream_cdc discipline,
    // because batch 1's nodes serve batch 2's searches); each batch
    // beam-searches the CURRENT graph, reverse-offers its edges, and
    // lands graph + vectors. The drained graph must equal the two
    // insert phases unrolled in SQL — build CTEs, twice-instantiated
    // search CTEs (prefixed), and the shared merge fragment.
    Q("stream_nn_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_nn_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val b0 = emb.filter(col("vec_id") % 8 =!= 0 && col("vec_id") % 8 =!= 4)
        st.overwrite(b0, "ann", "vectors")
        // the seed build is the pre-existing maintained state, not the
        // sink's work — fixture-cached per JVM like the other graph
        // consumers (the timed body measures the per-batch maintenance)
        st.overwrite(cachedNnGraph(s, dir, "base8") {
          Similarity.nnDescent(b0, "vec_id", "embedding",
            k = 6, rounds = 2, buckets = adaptiveBuckets(b0.count()))
        }, "ann", "graph")
        val staged = s"$base/in"
        // Batch ORDER is load-bearing (the oracle unrolls A then B) and
        // FileStreamSource orders files by MODIFICATION TIME — two
        // back-to-back writes can tie at millisecond granularity and
        // make the order arbitrary. Pin it: stamp batch A's files to
        // t0 and batch B's to t0+2000 explicitly, independent of
        // filesystem timestamp resolution.
        emb.filter(col("vec_id") % 8 === 0).coalesce(1).write.parquet(staged)
        val stagedPath = new org.apache.hadoop.fs.Path(staged)
        val t0 = System.currentTimeMillis() - 60000
        fs.listStatus(stagedPath).filter(_.isFile)
          .foreach(f => fs.setTimes(f.getPath, t0, -1))
        emb.filter(col("vec_id") % 8 === 4).coalesce(1)
          .write.mode("append").parquet(staged)
        fs.listStatus(stagedPath).filter(f => f.isFile && f.getModificationTime != t0)
          .foreach(f => fs.setTimes(f.getPath, t0 + 2000, -1))
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        StreamOps.knnInsertSink(stream, st, "ann", "vec_id", "embedding",
          k = 6, beam = 8, hops = 3, entries = 32,
          checkpoint = s"$base/ckpt").awaitTermination()
        st.read("ann", "graph").orderBy("vec_id", "rank")
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id AS id, embedding AS vec FROM embeddings),
              |e0 AS MATERIALIZED (SELECT id, vec FROM e WHERE id % 8 <> 0 AND id % 8 <> 4),
              |${Similarity.nnDescentCtesSql(k = 6, rounds = 2, adaptiveBucketsSql("e0"), srcRel = "e0")},
              |ga AS MATERIALIZED (SELECT src, dst, sqrt(d2) AS dist,
              |    row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rn
              |  FROM knn2),
              |ea AS MATERIALIZED (SELECT id, vec FROM e WHERE id % 8 <> 4),
              |qa AS MATERIALIZED (SELECT id AS q FROM e WHERE id % 8 = 0),
              |${Similarity.graphSearchCtesSql(beam = 8, hops = 3, k = 6,
                   p = "a_", eRel = "ea", knnRel = "ga", qRel = "qa")},
              |${Similarity.nnInsertMergeSql("a_", "ga", "a_found", k = 6)},
              |qb AS MATERIALIZED (SELECT id AS q FROM e WHERE id % 8 = 4),
              |${Similarity.graphSearchCtesSql(beam = 8, hops = 3, k = 6,
                   p = "b_", eRel = "e", knnRel = "a_merged", qRel = "qb")},
              |${Similarity.nnInsertMergeSql("b_", "a_merged", "b_found", k = 6)}
              |SELECT src AS vec_id, CAST(rn AS BIGINT) AS rank, dst AS nbr_id, dist
              |FROM b_merged ORDER BY vec_id, rank""".stripMargin)),

    // Interpolated KNESER-NEY bigram LM scoring
    // ([[TextOps.kneserNeyScore]]) — the smoothing real perplexity
    // filters use (KenLM's default), next to t_bigram_lm's add-one
    // baseline: backoff mass follows CONTINUATION counts (distinct
    // contexts), not raw frequency. Discount 3/4 as an exact rational
    // makes every probability a ratio of exact integers → micro-points
    // by integer division, no doubles before the per-doc mean;
    // numerator products ride DECIMAL(38)/HUGEINT.
    Q("t_kneser_ney",
      (s, dir) => TextOps.kneserNeyScore(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some(TextOps.kneserNeyScoreSql("documents") + "\nORDER BY doc_id")),

    // ANN-index health report over the built k-NN graph — the
    // quality-control artifact an index deployment reads before
    // serving: per rank position, edge counts, mean neighbor distance
    // (the quality curve: rank-1 mean ≪ rank-k mean on a healthy
    // index), and the RECIPROCAL-edge fraction (mutual neighborhood —
    // low reciprocity at rank 1 flags a disconnected or skewed
    // build). Distances enter sums as floor-micro integers; fractions
    // are single divisions at the edge.
    Q("sim_graph_stats",
      (s, dir) => {
        val g = cachedNnGraph(s, dir, "full") {
          val src = Tables.embeddings(s, dir)
          Similarity.nnDescent(src, "vec_id", "embedding",
            k = 6, rounds = 2, buckets = adaptiveBuckets(src.count()))
        }
        val edges = g.select(col("vec_id").as("src"), col("rank"),
          col("nbr_id").as("dst"), col("dist"))
        val pairRev = edges.select(col("dst").as("src"), col("src").as("dst")).distinct()
        val recip = edges.join(pairRev, Seq("src", "dst"), "left_semi")
        val base = edges.groupBy("rank").agg(count(lit(1)).as("n_edges"),
          sum(floor(col("dist") * lit(1e6)).cast(LongType)).as("__dm"))
        val rc = recip.groupBy("rank").agg(count(lit(1)).as("n_reciprocal"))
        base.join(rc, Seq("rank"), "left")
          .select(col("rank"), col("n_edges"),
            coalesce(col("n_reciprocal"), lit(0L)).as("n_reciprocal"),
            (col("__dm").cast(DoubleType) / lit(1e6) /
              col("n_edges").cast(DoubleType)).as("avg_dist"),
            (coalesce(col("n_reciprocal"), lit(0L)).cast(DoubleType) /
              col("n_edges").cast(DoubleType)).as("reciprocal_frac"))
          .orderBy("rank")
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id AS id, embedding AS vec FROM embeddings),
              |${Similarity.nnDescentCtesSql(k = 6, rounds = 2, adaptiveBucketsSql("e"))},
              |edges AS MATERIALIZED (SELECT src, dst, sqrt(d2) AS dist,
              |    row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rank
              |  FROM knn2),
              |prev AS (SELECT DISTINCT dst AS src, src AS dst FROM edges),
              |recip AS (SELECT edges.rank FROM edges
              |          JOIN prev ON edges.src = prev.src AND edges.dst = prev.dst),
              |base AS (SELECT rank, count(*) AS n_edges,
              |           CAST(SUM(CAST(floor(dist * 1000000.0) AS BIGINT)) AS BIGINT) AS dm
              |         FROM edges GROUP BY 1),
              |rc AS (SELECT rank, CAST(count(*) AS BIGINT) AS n_reciprocal
              |       FROM recip GROUP BY 1)
              |SELECT CAST(base.rank AS BIGINT) AS rank, n_edges,
              |       COALESCE(n_reciprocal, 0) AS n_reciprocal,
              |       CAST(dm AS DOUBLE) / 1000000.0 / CAST(n_edges AS DOUBLE) AS avg_dist,
              |       CAST(COALESCE(n_reciprocal, 0) AS DOUBLE)
              |         / CAST(n_edges AS DOUBLE) AS reciprocal_frac
              |FROM base LEFT JOIN rc ON base.rank = rc.rank
              |ORDER BY rank""".stripMargin)),

    // Exact fixed-point GRAM MATRIX over the embedding corpus — the
    // Σ qᵢqⱼ sufficient statistics PCA / whitening / covariance run
    // from, computed ONCE as a mergeable aggregate instead of ever
    // collecting vectors. Elements quantize by 2¹⁶ — EXACT (a float
    // scaled by a power of two and rounded is fp-hazard-free in any
    // engine) — so the per-(i,j) sums are exact integers; at larger
    // corpora they widen to DECIMAL(38)/HUGEINT (documented; BIGINT
    // output holds to ~2⁴⁷ per cell here). Shape: one posexplode +
    // one id-keyed self-join (dim² fan-out per row, map-side combined
    // per (i,j) — dim(dim+1)/2 output cells, corpus-size-free).
    Q("sim_gram",
      (s, dir) => {
        val q = Tables.embeddings(s, dir)
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id"), col("pos").cast(LongType).as("i"),
            floor(col("col").cast(DoubleType) * lit(65536.0) + lit(0.5))
              .cast(LongType).as("q"))
        val a = q.select(col("vec_id"), col("i"), col("q").as("qi"))
        val b = q.select(col("vec_id"), col("i").as("j"), col("q").as("qj"))
        a.join(b, "vec_id").filter(col("i") <= col("j"))
          .groupBy("i", "j")
          .agg(count(lit(1)).as("n"), sum(col("qi") * col("qj")).as("sum_qq"))
          .orderBy("i", "j")
      },
      Some("""WITH q AS (SELECT vec_id, i,
             |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 65536.0 + 0.5) AS BIGINT) AS q
             |  FROM (SELECT vec_id, embedding,
             |          unnest(range(0, len(embedding))) AS i
             |        FROM embeddings))
             |SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS n,
             |       CAST(SUM(a.q * b.q) AS BIGINT) AS sum_qq
             |FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // INCREMENTAL k-NN graph maintenance ([[Similarity.nnDescentInsert]])
    // — the build's incremental twin: the base graph (90% of vectors)
    // is the maintained table; the arriving 10% batch SEARCHES the
    // graph for its lists (beam walk, no corpus scan) and offers each
    // found edge back to its endpoint, so only ≤ batch·k base lists
    // re-rank and the refresh cost tracks the batch — the same
    // admission contract as dd_minhash_incremental. The oracle
    // composes the build CTEs, the search CTEs, and the identical
    // merge, hash-exact.
    Q("sim_nn_incremental",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val base = emb.filter(col("vec_id") % 10 =!= 0)
        val delta = emb.filter(col("vec_id") % 10 === 0).select("vec_id")
        val g0 = cachedNnGraph(s, dir, "base") {
          Similarity.nnDescent(base, "vec_id", "embedding",
            k = 6, rounds = 2, buckets = adaptiveBuckets(base.count()))
        }
        Similarity.nnDescentInsert(emb, "vec_id", "embedding", g0, delta,
            k = 6, beam = 8, hops = 3)
          .orderBy("vec_id", "rank")
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id AS id, embedding AS vec FROM embeddings),
              |eb AS MATERIALIZED (SELECT id, vec FROM e WHERE id % 10 <> 0),
              |${Similarity.nnDescentCtesSql(k = 6, rounds = 2, adaptiveBucketsSql("eb"), srcRel = "eb")},
              |knn AS MATERIALIZED (SELECT src, dst FROM knn2),
              |queries AS MATERIALIZED (SELECT id AS q FROM e WHERE id % 10 = 0),
              |${Similarity.graphSearchCtesSql(beam = 8, hops = 3, k = 6)},
              |old AS MATERIALIZED (SELECT src, dst, sqrt(d2) AS dist,
              |    row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rn
              |  FROM knn2),
              |${Similarity.nnInsertMergeSql("", "old", "found", k = 6)}
              |SELECT src AS vec_id, CAST(rn AS BIGINT) AS rank, dst AS nbr_id, dist
              |FROM merged ORDER BY vec_id, rank""".stripMargin)),

    // LATE-INTERACTION (MaxSim) retrieval scoring — the ColBERT
    // (Khattab & Zaharia, SIGIR'20) multi-vector ranking function:
    // documents and queries are BAGS of token vectors and
    // score(q, d) = Σ_{t∈q} max_{u∈d} ⟨t, u⟩ — finer-grained than one
    // pooled vector per doc (a query token matches its best doc token
    // independently). Here consecutive embedding ids form 5-token
    // multi-vector docs and the first two docs act as queries.
    // Determinism: dots ride the bit-portable fold, MAX over doubles
    // is order-free, and the per-token maxima enter the sum as exact
    // floor-micro integers — no double addition anywhere. Scale: the
    // query token set broadcasts; the (query-token × doc-token) dot
    // map is corpus-linear; max and sum are map-side-combinable keyed
    // aggregates; top-k is the bounded-state heap.
    Q("sim_maxsim",
      (s, dir) => {
        val toks = Tables.embeddings(s, dir)
          .selectExpr("vec_id div 5 AS doc_id", "vec_id AS tok_id", "embedding AS v")
        val qtoks = toks.filter(col("doc_id") < 2)
          .select(col("doc_id").as("q_id"), col("tok_id").as("q_tok"),
            col("v").as("qv"))
        toks.join(broadcast(qtoks))
          .select(col("q_id"), col("q_tok"), col("doc_id"),
            Similarity.dot(col("qv"), col("v")).as("dp"))
          .groupBy("q_id", "q_tok", "doc_id")
          .agg(max("dp").as("m"))
          .groupBy("q_id", "doc_id")
          .agg(sum(floor(col("m") * lit(1e6)).cast(LongType)).as("score_micro"))
          .groupBy("q_id")
          .agg(Ranking.topKBy(col("score_micro").cast(DoubleType), col("doc_id"), 5)
            .as("__top"))
          .select(col("q_id"), posexplode(col("__top")))
          .select(col("q_id"), (col("pos") + 1).cast(LongType).as("rank"),
            col("col.id").as("doc_id"),
            col("col.score").cast(LongType).as("score_micro"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH toks AS (SELECT vec_id // 5 AS doc_id, vec_id AS tok_id,
              |         embedding AS v
              |       FROM embeddings),
              |qt AS (SELECT doc_id AS q_id, tok_id AS q_tok, v AS qv
              |       FROM toks WHERE doc_id < 2),
              |m AS (SELECT q_id, q_tok, t.doc_id,
              |        MAX(${Similarity.dotSql("qv", "t.v")}) AS m
              |      FROM qt, toks t GROUP BY 1, 2, 3),
              |sc AS (SELECT q_id, doc_id,
              |         CAST(SUM(CAST(floor(m * 1000000.0) AS BIGINT)) AS BIGINT)
              |           AS score_micro
              |       FROM m GROUP BY 1, 2)
              |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id, score_micro
              |FROM (SELECT q_id, doc_id, score_micro,
              |        row_number() OVER (PARTITION BY q_id
              |          ORDER BY score_micro DESC, doc_id) AS rank
              |      FROM sc)
              |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Image near-dup by PERCEPTUAL HASH ([[Multimodal.pngAHashPairs]]):
    // real PNGs (CRC walk → inflate → defilter) hashed to a 64-bit
    // aHash (8×8 nearest-neighbor grid, bit = strictly above the exact
    // integer mean), banded into 4×16 bits so Hamming-≤3 search is one
    // equi-join (pigeonhole: ≤3 flips leave a band intact) — the
    // multimodal twin of SimHash text dedup. The corpus plants
    // brightness-shifted variants (+1 gray level, wrapped) of every
    // 5th image: byte-identical nowhere, perceptually a few bits away.
    // Oracle replays decode-free from the analytic pixel formula —
    // sampling grid, exact-integer bits, banding, pairing, popcounts.
    Q("mm_phash_neardup",
      (s, dir) => {
        import graft.ops.Multimodal
        val base = Tables.documents(s, dir).filter(col("doc_id") < 250)
        val corpus = Multimodal.synthPngPixelCorpus(s, base, "doc_id")
          .unionByName(Multimodal.synthPngShiftedCorpus(s,
            base.filter(col("doc_id") % 5 === 0), "doc_id", 10000L, 1))
        Multimodal.pngAHashPairs(s, corpus, "doc_id", "payload", maxHamming = 3)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 250),
             |imgs AS (SELECT doc_id AS img_id, doc_id AS base, 0 AS shift FROM ids
             |         UNION ALL
             |         SELECT doc_id + 10000, doc_id, 1 FROM ids WHERE doc_id % 5 = 0),
             |dims AS (SELECT img_id, base, shift,
             |           8 + base % 9 AS w, 8 + (base * 3) % 9 AS h
             |         FROM imgs),
             |samp AS (SELECT img_id, jj.j * 8 + ii.i AS k,
             |           (base + shift + 7 * ((ii.i * w) // 8)
             |                         + 13 * ((jj.j * h) // 8)) % 256 AS v
             |         FROM dims, unnest(range(0, 8)) ii(i), unnest(range(0, 8)) jj(j)),
             |sums AS (SELECT img_id, SUM(v) AS s FROM samp GROUP BY 1),
             |bits AS (SELECT samp.img_id, k,
             |           CASE WHEN 64 * v > s THEN 1 ELSE 0 END AS bit
             |         FROM samp JOIN sums USING (img_id)),
             |bands AS (SELECT img_id, k // 16 AS bidx,
             |            CAST(SUM(bit * (1 << (k % 16))) AS BIGINT) AS bval
             |          FROM bits GROUP BY 1, 2),
             |hj AS (SELECT a.img_id AS ia, b.img_id AS ib,
             |         CAST(SUM(bit_count(xor(a.bval, b.bval))) AS BIGINT) AS hamming
             |       FROM bands a JOIN bands b
             |         ON a.bidx = b.bidx AND a.img_id < b.img_id
             |       GROUP BY 1, 2)
             |SELECT ia AS id_a, ib AS id_b, hamming
             |FROM hj WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin)),

    // VIDEO near-dup by sampled-frame perceptual hashes
    // ([[Multimodal.aviNearDupPairs]]) — mm_phash_neardup's TEMPORAL
    // composition, closing the multimodal dedup gap (images only until
    // now): real AVI payloads (RIFF → hdrl/avih → movi '00db' raw
    // grayscale frames) decoded per partition, 4 evenly-strided frame
    // slots aHashed, and two videos pair when ≥3 aligned slots hash
    // within Hamming ≤ 2 — candidates from one banded equi-join on
    // (slot, band, value), exact popcounts only on collisions. The
    // corpus plants brightness-nudged re-renders (+1 gray wrap) of
    // every 4th video: bytes differ everywhere, hashes a few bits
    // away. Oracle replays decode-free from the analytic pixel
    // formula, slot arithmetic included.
    Q("mm_video_neardup",
      (s, dir) => {
        import graft.ops.Multimodal
        val base = Tables.documents(s, dir).filter(col("doc_id") < 200)
        val corpus = Multimodal.synthAviPixelCorpus(s, base, "doc_id")
          .unionByName(Multimodal.synthAviShiftedCorpus(s,
            base.filter(col("doc_id") % 4 === 0), "doc_id", 10000L, 1))
        Multimodal.aviNearDupPairs(s, corpus, "doc_id", "payload",
            maxFrames = 4, maxHamming = 2, minMatch = 3)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
             |vids AS (SELECT doc_id AS vid, doc_id AS base, 0 AS shift FROM ids
             |         UNION ALL
             |         SELECT doc_id + 10000, doc_id, 1 FROM ids WHERE doc_id % 4 = 0),
             |dims AS (SELECT vid, base, shift,
             |           8 + base % 9 AS w, 8 + (base * 3) % 9 AS h,
             |           4 + base % 5 AS nf
             |         FROM vids),
             |slots AS (SELECT vid, base, shift, w, h, tt.t AS slot, (tt.t * nf) // 4 AS f
             |          FROM dims, unnest(range(0, 4)) tt(t)),
             |samp AS (SELECT vid, slot, jj.j * 8 + ii.i AS k,
             |           (base + shift + 17 * f + 7 * ((ii.i * w) // 8)
             |                         + 13 * ((jj.j * h) // 8)) % 256 AS v
             |         FROM slots, unnest(range(0, 8)) ii(i), unnest(range(0, 8)) jj(j)),
             |sums AS (SELECT vid, slot, SUM(v) AS s FROM samp GROUP BY 1, 2),
             |bits AS (SELECT samp.vid, samp.slot, k,
             |           CASE WHEN 64 * v > s THEN 1 ELSE 0 END AS bit
             |         FROM samp JOIN sums USING (vid, slot)),
             |bands AS (SELECT vid, slot, k // 16 AS bidx,
             |            CAST(SUM(bit * (1 << (k % 16))) AS BIGINT) AS bval
             |          FROM bits GROUP BY 1, 2, 3),
             |hj AS (SELECT a.vid AS ia, b.vid AS ib, a.slot AS slot,
             |         CAST(SUM(bit_count(xor(a.bval, b.bval))) AS BIGINT) AS hamming
             |       FROM bands a JOIN bands b
             |         ON a.slot = b.slot AND a.bidx = b.bidx AND a.vid < b.vid
             |       GROUP BY 1, 2, 3)
             |SELECT ia AS id_a, ib AS id_b, CAST(COUNT(*) AS BIGINT) AS n_matched
             |FROM hj WHERE hamming <= 2
             |GROUP BY 1, 2 HAVING COUNT(*) >= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // CLIP-ROBUST video near-dup ([[Multimodal.aviClipNearDupPairs]])
    // — mm_video_neardup minus the slot alignment: the corpus plants
    // RE-CUT variants (every frame's content advanced by one — the
    // trimmed-intro re-render) whose frames match pairwise but never
    // at the same slot, so the aligned matcher provably misses them
    // (unit-asserted) and the slot-free banded join finds them. Only
    // bases with nf ∈ {4, 5} are clipped: their 4-slot sampling grids
    // overlap the shifted grid in exactly 3 frames (≥ minMatch);
    // longer videos' strided grids diverge — the sampling-density
    // limit, stated rather than hidden.
    Q("mm_video_clip_neardup",
      (s, dir) => {
        import graft.ops.Multimodal
        val base = Tables.documents(s, dir).filter(col("doc_id") < 150)
        val corpus = Multimodal.synthAviMotionCorpus(s, base, "doc_id")
          .unionByName(Multimodal.synthAviMotionCorpus(s,
            base.filter(col("doc_id") % 5 <= 1), "doc_id", 20000L, 1))
        Multimodal.aviClipNearDupPairs(s, corpus, "doc_id", "payload",
            maxFrames = 4, maxHamming = 1, minMatch = 3)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 150),
             |vids AS (SELECT doc_id AS vid, doc_id AS base, 0 AS fs FROM ids
             |         UNION ALL
             |         SELECT doc_id + 20000, doc_id, 1 FROM ids WHERE doc_id % 5 <= 1),
             |dims AS (SELECT vid, base, fs,
             |           8 + base % 9 AS w, 8 + (base * 3) % 9 AS h,
             |           4 + base % 5 AS nf
             |         FROM vids),
             |slots AS (SELECT vid, base, fs, w, h, tt.t AS slot,
             |            (tt.t * nf) // 4 AS f
             |          FROM dims, unnest(range(0, 4)) tt(t)),
             |samp AS (SELECT vid, slot, jj.j * 8 + ii.i AS k,
             |           (base + (f + fs + 1) * ((ii.i * w) // 8) * ((jj.j * h) // 8)
             |                 + 7 * ((ii.i * w) // 8)
             |                 + 13 * ((jj.j * h) // 8)) % 256 AS v
             |         FROM slots, unnest(range(0, 8)) ii(i), unnest(range(0, 8)) jj(j)),
             |sums AS (SELECT vid, slot, SUM(v) AS s FROM samp GROUP BY 1, 2),
             |bits AS (SELECT samp.vid, samp.slot, k,
             |           CASE WHEN 64 * v > s THEN 1 ELSE 0 END AS bit
             |         FROM samp JOIN sums USING (vid, slot)),
             |bands AS (SELECT vid, slot, k // 16 AS bidx,
             |            CAST(SUM(bit * (1 << (k % 16))) AS BIGINT) AS bval
             |          FROM bits GROUP BY 1, 2, 3),
             |hj AS (SELECT a.vid AS ia, a.slot AS sa, b.vid AS ib, b.slot AS sb,
             |         CAST(SUM(bit_count(xor(a.bval, b.bval))) AS BIGINT) AS hamming
             |       FROM bands a JOIN bands b
             |         ON a.bidx = b.bidx AND a.vid < b.vid
             |       GROUP BY 1, 2, 3, 4)
             |SELECT ia AS id_a, ib AS id_b,
             |       CAST(COUNT(DISTINCT sa) AS BIGINT) AS n_matched
             |FROM hj WHERE hamming <= 1
             |GROUP BY 1, 2 HAVING COUNT(DISTINCT sa) >= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // Lead-lag CROSS-correlation: Pearson between series A (URGENT
    // daily revenue) and series B (HIGH) at every alignment lag in
    // [-3, 3] — the lead/lag detector behind "does A predict B".
    // Pairs per lag come from ONE equi-join on shifted day index (the
    // lag dimension explodes on the smaller aggregated series, never
    // the fact table); statistics are the exact integer-cents
    // sufficient sums of [[TimeSeries.pearsonByKey]], one double
    // epilogue per lag.
    Q("ts_crosscorr",
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .groupBy(col("o_orderpriority").as("prio"),
            datediff(col("o_orderdate").cast(DateType),
              lit("1995-01-01").cast(DateType)).as("day"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
        val a = daily.filter(col("prio") === "1-URGENT")
          .select(col("day"), col("rev").as("x"))
        val bl = daily.filter(col("prio") === "2-HIGH")
          .select(col("day").as("dayb"), col("rev").as("y"))
          .withColumn("lag", explode(sequence(lit(-3), lit(3))))
          .withColumn("day", col("dayb") - col("lag"))
        TimeSeries.pearsonByKey(a.join(bl, "day").select(col("lag"), col("x"), col("y")),
            Seq("lag"), "x", "y")
          .orderBy("lag")
      },
      Some {
        val nd = "CAST(n_pairs AS DOUBLE)"
        def d(c: String) = s"CAST($c AS DOUBLE)"
        val num = s"($nd * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
        val varx = s"($nd * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
        val vary = s"($nd * ${d("syy")} - ${d("sy")} * ${d("sy")})"
        val den = s"(sqrt(GREATEST($varx, 0.0)) * sqrt(GREATEST($vary, 0.0)))"
        s"""WITH daily AS (SELECT o_orderpriority AS prio,
           |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day,
           |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           |         * 100 AS BIGINT) AS c
           |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
           |  GROUP BY 1, 2),
           |a AS (SELECT day, c AS cx FROM daily WHERE prio = '1-URGENT'),
           |b AS (SELECT day, c AS cy FROM daily WHERE prio = '2-HIGH'),
           |lags AS (SELECT unnest(range(-3, 4)) AS lag),
           |p AS (SELECT l.lag, a.cx, b.cy
           |      FROM lags l JOIN b ON TRUE JOIN a ON b.day = a.day + l.lag),
           |ag AS (SELECT lag, ${TimeSeries.pearsonSql("cx", "cy")}
           |       FROM p GROUP BY lag)
           |SELECT CAST(lag AS INT) AS lag, n_pairs,
           |       CASE WHEN n_pairs = 0 OR $den = 0.0 THEN NULL
           |            ELSE $num / $den END AS corr
           |FROM ag ORDER BY lag""".stripMargin
      }),

    // One-sided CUSUM drift detection over the daily demand series —
    // the sequential change detector (alarm when cumulative excess
    // over a reference drifts past h) behind data-volume monitors.
    // The recursive S_t = max(0, S_{t-1} + d_t) is rewritten in its
    // closed form S_t = P_t − min(0, min_{j≤t} P_j) (P = prefix sum of
    // deviations), so the whole pass is two cumulative windows over
    // exact integer cents — no sequential fold, no driver loop. A
    // single bounded daily series rides one window partition; per-key
    // monitoring at scale partitions the same windows by key.
    Q("ts_cusum",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val k = 65000L   // reference (cents): slightly above median daily load
        val h = 300000L  // alarm threshold (cents)
        val daily = Tables.lineitem(s, dir)
          .groupBy(datediff(col("l_shipdate").cast(DateType),
            lit("1995-01-01").cast(DateType)).as("day"))
          .agg((sum(col("l_quantity").cast(DecimalType(18, 2))) * 100)
            .cast(LongType).as("qc"))
        val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
        daily
          .withColumn("p", sum(col("qc") - lit(k)).over(w))
          .withColumn("s", col("p") - least(min(col("p")).over(w), lit(0L)))
          .withColumn("alarm", (col("s") > lit(h)).cast("int"))
          .select(col("day"), col("qc"), col("s").as("cusum"), col("alarm"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT
             |    date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS day,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qc
             |  FROM lineitem GROUP BY 1),
             |p AS (SELECT day, qc,
             |        CAST(SUM(qc - 65000) OVER (ORDER BY day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pf
             |      FROM daily),
             |s AS (SELECT day, qc,
             |        pf - LEAST(CAST(MIN(pf) OVER (ORDER BY day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT),
             |          0) AS cusum
             |      FROM p)
             |SELECT CAST(day AS INT) AS day, qc, cusum,
             |       CAST(CASE WHEN cusum > 300000 THEN 1 ELSE 0 END AS INT) AS alarm
             |FROM s ORDER BY day""".stripMargin)),

    // Char-trigram fuzzy search (the pg_trgm shape): misspelled probe
    // strings find their catalog names by distinct-trigram Jaccard over
    // an inverted trigram posting join — typo-tolerant lookup that
    // needs no pairwise comparison against the whole catalog. Queries
    // broadcast; candidate fan-out is bounded by trigram selectivity
    // (a df cap on hot trigrams is the 100 TB lever, same as the
    // shingle stop-list).
    Q("search_trigram",
      (s, dir) => {
        import s.implicits._
        def tg(c: org.apache.spark.sql.Column) = array_distinct(
          transform(sequence(lit(1), length(c) - 2), i => c.substr(i, lit(3))))
        val qs = Seq("smal ring", "red widgt", "blue blot").toDF("q")
          .select(col("q"), tg(col("q")).as("ts"))
          .select(col("q"), size(col("ts")).cast(LongType).as("nq"),
            explode(col("ts")).as("tg"))
        val names = Tables.part(s, dir)
          .filter(length(col("p_name")) >= 3)
          .select(col("p_partkey"), tg(col("p_name")).as("ts"))
          .select(col("p_partkey"), size(col("ts")).cast(LongType).as("np"),
            explode(col("ts")).as("tg"))
        names.join(broadcast(qs), "tg")
          .groupBy(col("q"), col("p_partkey"), col("nq"), col("np"))
          .agg(count(lit(1)).as("shared"))
          .withColumn("sim", col("shared").cast(DoubleType) /
            (col("nq") + col("np") - col("shared")).cast(DoubleType))
          .filter(col("sim") >= 0.3)
          .select(col("q"), col("p_partkey"), col("shared"), col("sim"))
          .orderBy("q", "p_partkey")
      },
      Some("""WITH qs AS (SELECT unnest(['smal ring', 'red widgt', 'blue blot']) AS q),
             |qt AS (SELECT q, CAST(len(lt) AS BIGINT) AS nq, unnest(lt) AS tg FROM (
             |         SELECT q, list_distinct(list_transform(range(1, len(q) - 1),
             |           i -> substr(q, CAST(i AS INT), 3))) AS lt FROM qs)),
             |pt AS (SELECT p_partkey, CAST(len(lt) AS BIGINT) AS np, unnest(lt) AS tg FROM (
             |         SELECT p_partkey, list_distinct(list_transform(range(1, len(p_name) - 1),
             |           i -> substr(p_name, CAST(i AS INT), 3))) AS lt
             |         FROM part WHERE len(p_name) >= 3)),
             |sh AS (SELECT q, p_partkey, nq, np, CAST(COUNT(*) AS BIGINT) AS shared
             |       FROM pt JOIN qt USING (tg) GROUP BY 1, 2, 3, 4)
             |SELECT q, p_partkey, shared,
             |       CAST(shared AS DOUBLE) / CAST(nq + np - shared AS DOUBLE) AS sim
             |FROM sh
             |WHERE CAST(shared AS DOUBLE) / CAST(nq + np - shared AS DOUBLE) >= 0.3
             |ORDER BY q, p_partkey""".stripMargin)),

    // Per-document TF-IDF KEYWORDS: the top-3 most characteristic
    // tokens of each document by the same smoothed tf·idf weight as
    // the corpus-level t_tfidf, ranked inside a per-doc window — the
    // keyword-extraction pass behind tagging/faceting. The df table is
    // the one corpus-level aggregate; ranking rides a per-doc window
    // whose partitions are vocabulary-bounded.
    Q("t_keywords",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir).filter(col("doc_id") < 100)
        val nDocs = docs.count()
        val tf = docs
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        val dfr = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("weight").desc, col("token"))
        tf.join(dfr, Seq("token"))
          .withColumn("weight",
            col("tf").cast(DoubleType) *
              (lit((nDocs + 1).toDouble) / (col("df") + 1).cast(DoubleType)))
          .withColumn("kw_rank", row_number().over(w))
          .filter(col("kw_rank") <= 3)
          .select(col("doc_id"), col("kw_rank"), col("token"), col("tf"),
            col("df"), col("weight"))
          .orderBy("doc_id", "kw_rank")
      },
      Some(s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
              |tok AS (SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS token FROM d),
              |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
              |dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
              |nd AS (SELECT count(*) AS n FROM d),
              |r AS (SELECT doc_id, token, tf, df,
              |        CAST(tf AS DOUBLE) * (CAST(n + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) AS weight
              |      FROM tf JOIN dfr USING (token) CROSS JOIN nd),
              |rk AS (SELECT doc_id, token, tf, df, weight,
              |         CAST(row_number() OVER (PARTITION BY doc_id
              |           ORDER BY weight DESC, token) AS INT) AS kw_rank
              |       FROM r)
              |SELECT doc_id, kw_rank, token, tf, df, weight
              |FROM rk WHERE kw_rank <= 3 ORDER BY doc_id, kw_rank""".stripMargin)),

    // Array-function scalar surface: sort/dedup-union/intersect/except/
    // contains/position/max/min/slice over per-row arrays. Every array
    // result is SORTED then serialized with array_join — both to make
    // engine-internal orderings (Spark array_union's first-seen order
    // vs DuckDB list_distinct) canonical AND because the oracle
    // comparator row-sorts its frames, which array-typed cells break.
    // All codegen'd projections, no shuffle.
    Q("p_array_funcs",
      (s, dir) => {
        def js(c: org.apache.spark.sql.Column) = array_join(sort_array(c), ",")
        Tables.part(s, dir)
          .filter(col("p_partkey") % 20 === 0)
          .select(col("p_partkey"),
            array(col("p_partkey") % 10, col("p_size").cast(LongType),
              col("p_partkey") % 7, col("p_size").cast(LongType)).as("a"),
            array(col("p_size").cast(LongType), col("p_partkey") % 5, lit(3L)).as("b"))
          .select(col("p_partkey"),
            js(col("a")).as("sorted_a"),
            js(array_distinct(col("a"))).as("dedup_a"),
            js(array_union(col("a"), col("b"))).as("union_ab"),
            js(array_intersect(col("a"), col("b"))).as("inter_ab"),
            js(array_except(col("a"), col("b"))).as("except_ab"),
            array_contains(col("a"), 3L).cast("int").as("has3"),
            array_position(col("a"), col("p_partkey") % 7).cast(LongType).as("pos7"),
            array_max(col("a")).as("max_a"),
            array_min(col("b")).as("min_b"),
            array_join(slice(col("a"), 2, 2), ",").as("slice_a"))
          .orderBy("p_partkey")
      },
      Some("""WITH base AS (SELECT p_partkey,
             |    [p_partkey % 10, CAST(p_size AS BIGINT), p_partkey % 7,
             |     CAST(p_size AS BIGINT)] AS a,
             |    [CAST(p_size AS BIGINT), p_partkey % 5, CAST(3 AS BIGINT)] AS b
             |  FROM part WHERE p_partkey % 20 = 0)
             |SELECT p_partkey,
             |  array_to_string(list_sort(a), ',') AS sorted_a,
             |  array_to_string(list_sort(list_distinct(a)), ',') AS dedup_a,
             |  array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS union_ab,
             |  array_to_string(list_sort(list_distinct(
             |    list_filter(a, x -> list_contains(b, x)))), ',') AS inter_ab,
             |  array_to_string(list_sort(list_distinct(
             |    list_filter(a, x -> NOT list_contains(b, x)))), ',') AS except_ab,
             |  CAST(CASE WHEN list_contains(a, 3) THEN 1 ELSE 0 END AS INT) AS has3,
             |  CAST(list_position(a, p_partkey % 7) AS BIGINT) AS pos7,
             |  list_max(a) AS max_a,
             |  list_min(b) AS min_b,
             |  array_to_string(list_slice(a, 2, 3), ',') AS slice_a
             |FROM base ORDER BY p_partkey""".stripMargin)),

    // STREAMING CUSUM monitor ([[StreamOps.keyedSumsSink]]): the
    // order-sensitive drift detector made streamable by splitting it
    // into a commutative accumulation (per-day partial cent sums,
    // committed exactly-once per micro-batch — unordered arrival
    // converges to the exact batch aggregate) and a read-time epilogue
    // (the same closed-form two-window CUSUM as ts_cusum). End state
    // must equal the batch computation exactly — one oracle serves
    // both.
    Q("stream_cusum_final",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_cusum_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val li = Tables.lineitem(s, dir).select(
          datediff(col("l_shipdate").cast(DateType),
            lit("1995-01-01").cast(DateType)).as("day"),
          (col("l_quantity").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("qc"))
        val staged = s"$base/in"
        li.repartition(4).write.parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        StreamOps.keyedSumsSink(stream, st, "metrics", "daily_qc",
          Seq("day"), "qc", checkpoint = s"$base/ckpt").awaitTermination()
        val daily = st.read("metrics", "daily_qc")
          .groupBy(col("day")).agg(sum(col("part_sum")).as("qc"))
        val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
        daily
          .withColumn("p", sum(col("qc") - lit(65000L)).over(w))
          .withColumn("s", col("p") - least(min(col("p")).over(w), lit(0L)))
          .withColumn("alarm", (col("s") > lit(300000L)).cast("int"))
          .select(col("day"), col("qc"), col("s").as("cusum"), col("alarm"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT
             |    date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS day,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qc
             |  FROM lineitem GROUP BY 1),
             |p AS (SELECT day, qc,
             |        CAST(SUM(qc - 65000) OVER (ORDER BY day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pf
             |      FROM daily),
             |s AS (SELECT day, qc,
             |        pf - LEAST(CAST(MIN(pf) OVER (ORDER BY day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT),
             |          0) AS cusum
             |      FROM p)
             |SELECT CAST(day AS INT) AS day, qc, cusum,
             |       CAST(CASE WHEN cusum > 300000 THEN 1 ELSE 0 END AS INT) AS alarm
             |FROM s ORDER BY day""".stripMargin)),

    // Vector-space tf·idf cosine retrieval ([[Search.tfidfCosine]]):
    // the geometric complement to search_bm25 over the SAME inverted
    // index — sparse dot product on (query-term, doc) postings only,
    // integer milli-idf (floor division, no libm ln), DECIMAL(38,0)
    // exact dot/norms, doubles only in the final fixed-arity
    // dot/(|d||q|). Query table + corpus stats broadcast; docs sharing
    // no query term never shuffle.
    Q("search_tfidf",
      (s, dir) => {
        import s.implicits._
        val qt = Seq((1L, "hash", 1L), (1L, "join", 1L), (2L, "window", 1L),
          (2L, "agg", 1L), (2L, "sort", 1L), (3L, "stream", 2L), (3L, "table", 1L))
          .toDF("q_id", "term", "qtf")
        Search.tfidfCosine(Tables.documents(s, dir), "doc_id", "text", qt, k = 10)
          .orderBy("q_id", "rank")
      },
      Some(Search.tfidfCosineSql("documents",
        "(1,'hash',1),(1,'join',1),(2,'window',1),(2,'agg',1),(2,'sort',1),(3,'stream',2),(3,'table',1)",
        k = 10) + "\nORDER BY q_id, rank")),

    // Theil–Sen robust trend ([[TimeSeries.theilSenSlope]]): the lower
    // median of all pairwise slopes of the daily order count per
    // priority, H1-1995 — the 29%-breakdown rank estimator where OLS
    // (ts_linreg's shape) folds to one outlier. Pair enumeration is
    // O(span²) per key in the PRE-AGGREGATED series (≤181 days here),
    // never the fact table; each slope is one correctly-rounded
    // division of exact integers and the estimator is a REAL pair's
    // slope (lower median), so both engines pick the identical double.
    Q("ts_theil_sen",
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .filter(col("o_orderdate").cast(DateType) >= lit("1995-01-01").cast(DateType) &&
            col("o_orderdate").cast(DateType) < lit("1995-07-01").cast(DateType))
          .groupBy(col("o_orderpriority").as("prio"),
            datediff(col("o_orderdate").cast(DateType),
              lit("1995-01-01").cast(DateType)).as("day"))
          .agg(count(lit(1)).as("n"))
        TimeSeries.theilSenSlope(daily, Seq("prio"), "day", "n").orderBy("prio")
      },
      Some("""WITH daily AS (SELECT o_orderpriority AS prio,
             |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM orders
             |  WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
             |    AND CAST(o_orderdate AS DATE) < DATE '1995-07-01'
             |  GROUP BY 1, 2),
             |pairs AS (SELECT a.prio, a.day AS t1, b.day AS t2,
             |    CAST(b.n - a.n AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
             |  FROM daily a JOIN daily b ON a.prio = b.prio AND a.day < b.day),
             |rk AS (SELECT prio, t1, t2, slope,
             |    row_number() OVER (PARTITION BY prio ORDER BY slope, t1, t2) AS rn,
             |    count(*) OVER (PARTITION BY prio) AS n_pairs
             |  FROM pairs)
             |SELECT prio, CAST(n_pairs AS BIGINT) AS n_pairs, slope AS ts_slope,
             |       CAST(t1 AS BIGINT) AS anchor_t1, CAST(t2 AS BIGINT) AS anchor_t2
             |FROM rk WHERE rn = (n_pairs + 1) // 2 ORDER BY prio""".stripMargin)),

    // Mann–Whitney U rank-sum test ([[Profile.mannWhitney]]): did the
    // quantity distribution shift between return flags R and A — the
    // location-sensitive companion to q_ks_test, with ranks derived
    // from the VALUE-COUNT table (state = 50 distinct quantities, never
    // a per-row rank window). Doubled-rank integers keep every Σ exact
    // (tie-corrected variance included); the z-score is one fixed chain
    // of correctly-rounded IEEE ops mirrored verbatim in the oracle.
    Q("q_mann_whitney",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        Profile.mannWhitney(
          li.filter(col("l_returnflag") === "R")
            .select(col("l_quantity").cast(LongType).as("qty")),
          li.filter(col("l_returnflag") === "A")
            .select(col("l_quantity").cast(LongType).as("qty")),
          "qty")
      },
      Some(Profile.mannWhitneySql(
        "(SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'R')",
        "(SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'A')",
        "qty"))),

    // Spearman rank correlation ([[Profile.spearman]]): monotone
    // association between quantity and extended price (cents) over
    // lineitem — rank-based, so one wild price can't fold it the way
    // raw Pearson folds. Ranks ride the VALUE-COUNT lookups in doubled
    // integer units; all six sufficient statistics are DECIMAL(38,0)
    // exact; ρ is one fixed double chain mirrored verbatim.
    Q("q_spearman",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          col("l_quantity").cast(LongType).as("qty"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("price_cents"))
        Profile.spearman(li, "qty", "price_cents")
      },
      Some(Profile.spearmanSql(
        """(SELECT CAST(l_quantity AS BIGINT) AS qty,
          |        CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
          |   FROM lineitem)""".stripMargin.replace("\n", " "),
        "qty", "price_cents"))),

    // 2-D Pareto skyline ([[Ranking.skyline2d]]): parts that are
    // undominated in (size↑, retail-price↓) — "no strictly bigger part
    // is as cheap". The frontier computes on the DISTINCT-size level
    // (one keyed min + a 50-row window), never the row level — state is
    // the size domain's cardinality at any corpus size. All-integer
    // comparisons; duplicates at a frontier point counted, not dropped.
    Q("o_skyline",
      (s, dir) => {
        val pts = Tables.part(s, dir).select(
          col("p_size").cast(LongType).as("size"),
          (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("price_cents"))
        Ranking.skyline2d(pts, "size", "price_cents")
          .select(col("up").as("size"), col("down").as("price_cents"),
            col("n_rows"))
          .orderBy("size")
      },
      Some("""SELECT up AS size, down AS price_cents, n_rows FROM (""" +
        Ranking.skyline2dSql(
          """(SELECT CAST(p_size AS BIGINT) AS size,
            |        CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
            |   FROM part)""".stripMargin.replace("\n", " "),
          "size", "price_cents") +
        ")\nORDER BY size")),

    // MAD robust outlier days ([[TimeSeries.madOutliers]]): days whose
    // per-priority order count sits more than 3 MADs from that
    // priority's median — the 50%-breakdown outlier rule whose
    // thresholds don't move with the outliers themselves. Lower
    // medians are REAL series elements and every comparison is integer:
    // zero floating point end to end. Windows sort the PRE-AGGREGATED
    // daily series (≤ date-span rows per key), never the fact table.
    Q("ts_mad_outliers",
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority").as("prio"),
            datediff(col("o_orderdate").cast(DateType),
              lit("1992-01-01").cast(DateType)).as("day"))
          .agg(count(lit(1)).as("n"))
        TimeSeries.madOutliers(daily, Seq("prio"), "day", "n", k = 3)
          .orderBy("prio", "t")
      },
      Some("""WITH daily AS (SELECT o_orderpriority AS prio,
             |    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM orders GROUP BY 1, 2),
             |med AS (SELECT prio, n AS med FROM (
             |    SELECT prio, day, n,
             |      row_number() OVER (PARTITION BY prio ORDER BY n, day) AS rn,
             |      count(*) OVER (PARTITION BY prio) AS cnt
             |    FROM daily) WHERE rn = (cnt + 1) // 2),
             |dev AS (SELECT daily.prio, day, n, med, abs(n - med) AS absdev
             |  FROM daily JOIN med ON daily.prio = med.prio),
             |mad AS (SELECT prio, absdev AS mad FROM (
             |    SELECT prio, day, absdev,
             |      row_number() OVER (PARTITION BY prio ORDER BY absdev, day) AS rn,
             |      count(*) OVER (PARTITION BY prio) AS cnt
             |    FROM dev) WHERE rn = (cnt + 1) // 2)
             |SELECT dev.prio, CAST(day AS BIGINT) AS t, n AS v, med, mad, absdev
             |FROM dev JOIN mad ON dev.prio = mad.prio
             |WHERE absdev > 3 * mad
             |ORDER BY dev.prio, t""".stripMargin)),

    // Kendall τ-b ([[Profile.kendallTau]]): concordance between
    // quantity and line number over lineitem. The pair counting runs on
    // the 50×7 joint contingency — a few hundred broadcast cells
    // squared, row-count-independent — with DECIMAL(38,0)-exact C/D and
    // hi/lo-split casts in the mirror (DuckDB's HUGEINT→DOUBLE is not
    // correctly rounded; see Det.hiLoDoubleSql).
    Q("q_kendall",
      (s, dir) => Profile.kendallTau(
        Tables.lineitem(s, dir), "l_quantity", "l_linenumber"),
      Some(Profile.kendallTauSql("lineitem", "l_quantity", "l_linenumber"))),

    // Chi-squared independence + Cramér's V ([[Profile.chiSquared]]):
    // is order priority independent of order status? Computed on the
    // 5×3 contingency cells in exact micro fixed point — integral
    // division truncates identically in both engines, per-cell longs
    // sum exactly, zero order-dependent FP.
    Q("q_chi2",
      (s, dir) => Profile.chiSquared(
        Tables.orders(s, dir), "o_orderpriority", "o_orderstatus"),
      Some(Profile.chiSquaredSql("orders", "o_orderpriority", "o_orderstatus"))),

    // Exact weighted median ([[Profile.weightedMedian]]): the
    // quantity-weighted median unit price per return flag — "the price
    // at which half the shipped units are cheaper". Walks the per-key
    // VALUE-COUNT table, so window state is the distinct-price domain,
    // never the fact rows; all-integer lower-median pick.
    Q("q_weighted_median",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("price_cents"),
          col("l_quantity").cast(LongType).as("qty"))
        Profile.weightedMedian(li, Seq("l_returnflag"), "price_cents", "qty")
          .orderBy("l_returnflag")
      },
      Some(Profile.weightedMedianSql(
        """(SELECT l_returnflag,
          |        CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
          |        CAST(l_quantity AS BIGINT) AS qty FROM lineitem)"""
          .stripMargin.replace("\n", " "),
        Seq("l_returnflag"), "price_cents", "qty") + "\nORDER BY l_returnflag")),

    // Peak interval concurrency ([[EventOps.peakConcurrency]]): each
    // supplier's maximum simultaneous in-transit shipments over the
    // same derived transit windows as ev_interval_union — the
    // sweep-line occupancy statistic interval UNION cannot answer.
    // Deltas pre-aggregate onto the (supplier, date) grid, so the
    // cumulative window walks ~2500 distinct dates per key at any
    // fact size; earliest peak date breaks ties totally.
    Q("ev_peak_concurrency",
      (s, dir) => {
        val iv = Tables.lineitem(s, dir)
          .select(col("l_suppkey"), col("l_shipdate").cast(DateType).as("s"),
            date_add(col("l_shipdate").cast(DateType),
              (col("l_linenumber") % 14) + 1).as("e"))
        EventOps.peakConcurrency(iv, Seq("l_suppkey"), "s", "e")
          .orderBy("l_suppkey")
      },
      Some("SELECT * FROM (" + EventOps.peakConcurrencySql(
        """(SELECT l_suppkey, CAST(l_shipdate AS DATE) AS s,
          |   CAST(l_shipdate AS DATE) + INTERVAL ((l_linenumber % 14) + 1) DAY AS e
          | FROM lineitem)""".stripMargin.replace("\n", " "),
        Seq("l_suppkey"), "s", "e") + ")\nORDER BY l_suppkey")),

    // Blocked full-Levenshtein linkage ([[Linkage.editDistancePairs]]):
    // near-identical part names within (brand, type) blocks at edit
    // distance ≤ 3 — the band the ED≤1 deletion-neighborhood fast path
    // (dd_fuzzy_pairs) cannot reach. Builtin codegen DP on both
    // engines; quadratic work confined to blocks (Σ block², never
    // all-pairs).
    Q("er_edit_distance",
      (s, dir) => Linkage.editDistancePairs(
        Tables.part(s, dir), "p_partkey", "p_name",
        Seq("p_brand", "p_type"), maxDistance = 3)
        .orderBy("id_a", "id_b"),
      Some(Linkage.editDistancePairsSql(
        "part", "p_partkey", "p_name", Seq("p_brand", "p_type"), 3) +
        "\nORDER BY id_a, id_b")),

    // Business-day lead time ([[TimeSeries.busdays]]): Mon–Fri days
    // between order date and ship date per priority — closed-form
    // integer calendar arithmetic (no calendar table, no explode, fully
    // codegen) over the order⋈lineitem join; exact BIGINT sum, one
    // double division for the mean.
    Q("p_busdays",
      (s, dir) => {
        val j = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir),
            col("l_orderkey") === col("o_orderkey"))
        j.select(col("o_orderpriority"),
            TimeSeries.busdays(col("o_orderdate").cast(DateType),
              col("l_shipdate").cast(DateType)).as("bd"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum("bd").as("sum_busdays"))
          .withColumn("avg_busdays",
            col("sum_busdays").cast(DoubleType) / col("n").cast(DoubleType))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
              |  CAST(SUM(${TimeSeries.busdaysSql(
                   "CAST(o_orderdate AS DATE)", "CAST(l_shipdate AS DATE)")}) AS BIGINT)
              |    AS sum_busdays,
              |  CAST(SUM(${TimeSeries.busdaysSql(
                   "CAST(o_orderdate AS DATE)", "CAST(l_shipdate AS DATE)")}) AS DOUBLE)
              |    / count(*) AS avg_busdays
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Lexical corpus profile ([[TextOps.lexicalProfile]]): per-source
    // tokens/types/hapax/dis-legomena + TTR and hapax share — the
    // Zipf-tail health check run before trusting token counts.
    // Vocabulary-sized state: explode → (source, token) count with
    // map-side combine → count-of-counts rollup.
    Q("t_lexical",
      (s, dir) => TextOps.lexicalProfile(
        Tables.documents(s, dir), "source", "text")
        .orderBy("source"),
      Some(TextOps.lexicalProfileSql("documents", "source", "text") +
        "\nORDER BY source")),

    // Audience co-occurrence ([[EventOps.cooccurrence]]): distinct-user
    // overlap between event types with Jaccard — dedup to the
    // (user, type) grain FIRST so heavy clickers can't inflate the
    // matrix; per-user fan-out is C(k,2) over the tiny type domain.
    Q("ev_cooccurrence",
      (s, dir) => EventOps.cooccurrence(
        Tables.events(s, dir), "user_id", "event_type")
        .orderBy("cat_a", "cat_b"),
      Some(EventOps.cooccurrenceSql("events", "user_id", "event_type") +
        "\nORDER BY cat_a, cat_b")),

    // Lorenz concentration curve ([[Profile.lorenzCurve]]): the decile
    // revenue-concentration profile of order values — "the bottom d/10
    // of orders carry what share of total value?". All-integer boundary
    // picks on the value-count walk; the mirror's HUGEINT casts ride
    // Det.hiLoDoubleSql so the share doubles match bit-for-bit.
    Q("q_lorenz",
      (s, dir) => Profile.lorenzCurve(
        Tables.orders(s, dir).select(
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("price_cents")),
        "price_cents")
        .orderBy("decile"),
      Some(Profile.lorenzCurveSql(
        "(SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents FROM orders)",
        "price_cents") + "\nORDER BY decile")),

    // Deterministic Poisson bootstrap ([[Sampling.poissonBootstrap]]):
    // 32 resampled replicas of mean order value, replicate weights
    // drawn from md5(id:replica) against Poisson(1) CDF thresholds
    // generated ONCE and embedded in both engines — stateless,
    // partition-independent, oracle-identical. The replica spread is a
    // MEASURED standard error; no normality assumed anywhere.
    Q("samp_bootstrap",
      (s, dir) => Sampling.poissonBootstrap(
        Tables.orders(s, dir).select(col("o_orderkey"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("price_cents")),
        "o_orderkey", "price_cents", replicas = 32)
        .orderBy("replica"),
      Some(Sampling.poissonBootstrapSql(
        "(SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents FROM orders)",
        "o_orderkey", "price_cents", replicas = 32) + "\nORDER BY replica")),

    // Tukey-fence outliers ([[Profile.iqrOutliers]]): event values
    // outside [Q1−1.5·IQR, Q3+1.5·IQR] per event type — the boxplot
    // convention next to ts_mad_outliers' MAD rule (order totals were
    // probed first and are fence-clean at every SF: sums of uniform
    // line items have no Tukey tail — an empty report proves nothing,
    // so the query targets the heavy-tailed column). Doubled-integer
    // fences, lower-quartile picks on the value-count walk, flagged
    // DISTINCT values with their row counts.
    Q("q_iqr_outliers",
      (s, dir) => Profile.iqrOutliers(
        Tables.events(s, dir).select(col("event_type"),
          (col("value").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("value_cents")),
        Seq("event_type"), "value_cents")
        .orderBy("event_type", "v"),
      Some(Profile.iqrOutliersSql(
        "(SELECT event_type, CAST(round(value * 100) AS BIGINT) AS value_cents FROM events)",
        Seq("event_type"), "value_cents") +
        "\nORDER BY event_type, v")),

    // Exact correlation matrix ([[Profile.corrMatrix]]): all pairwise
    // Pearson r over four lineitem measures in ONE fact-table pass —
    // k(k+1)/2 DECIMAL(38,0) sufficient statistics in a single
    // map-side-combined aggregate, per-pair epilogues off a one-row
    // checkpointed stats table. Mirror casts ride Det.hiLoDoubleSql.
    Q("prof_corr_matrix",
      (s, dir) => Profile.corrMatrix(
        Tables.lineitem(s, dir).select(
          col("l_quantity").cast(LongType).as("qty"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("price_cents"),
          (col("l_discount").cast(DecimalType(18, 4)) * 10000)
            .cast(LongType).as("discount_bp"),
          (col("l_tax").cast(DecimalType(18, 4)) * 10000)
            .cast(LongType).as("tax_bp")),
        Seq("qty", "price_cents", "discount_bp", "tax_bp"))
        .orderBy("col_x", "col_y"),
      Some(Profile.corrMatrixSql(
        """(SELECT CAST(l_quantity AS BIGINT) AS qty,
          |   CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
          |   CAST(round(l_discount * 10000) AS BIGINT) AS discount_bp,
          |   CAST(round(l_tax * 10000) AS BIGINT) AS tax_bp FROM lineitem)"""
          .stripMargin.replace("\n", " "),
        Seq("qty", "price_cents", "discount_bp", "tax_bp")) +
        "\nORDER BY col_x, col_y")),

    // K-anonymity / l-diversity audit ([[Quality.kAnonymity]]): the
    // privacy gate before release — (market segment, nation, balance
    // sign) equivalence classes smaller than k=25 or with fewer than
    // l=5 distinct account-balance cents are re-identification /
    // homogeneity risks. One keyed aggregate; the output IS the
    // suppression list.
    Q("q_kanonymity",
      (s, dir) => Quality.kAnonymity(
        Tables.customer(s, dir).select(col("c_mktsegment"),
          col("c_nationkey"),
          signum(col("c_acctbal")).cast(LongType).as("bal_sign"),
          (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("bal_cents")),
        Seq("c_mktsegment", "c_nationkey", "bal_sign"), "bal_cents",
        k = 25, l = 5)
        .orderBy("c_mktsegment", "c_nationkey", "bal_sign"),
      Some(Quality.kAnonymitySql(
        """(SELECT c_mktsegment, c_nationkey,
          |   CAST(CASE WHEN c_acctbal > 0 THEN 1 WHEN c_acctbal < 0 THEN -1 ELSE 0 END AS BIGINT) AS bal_sign,
          |   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer)"""
          .stripMargin.replace("\n", " "),
        Seq("c_mktsegment", "c_nationkey", "bal_sign"), "bal_cents",
        k = 25, l = 5) +
        "\nORDER BY c_mktsegment, c_nationkey, bal_sign")),

    // Empirical-CDF quantile transform ([[Profile.cdfLookup]]): the
    // per-segment percentile mapping of order values — the
    // preprocessing "model" a feature pipeline trains (join back to
    // facts to materialize the feature; the table is the deployable).
    // Domain-sized output; integer walk; one division per value.
    Q("feat_cdf_norm",
      (s, dir) => Profile.cdfLookup(
        Tables.orders(s, dir).select(col("o_orderpriority"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("price_cents"))
          .filter(col("price_cents") % 97 === 0), // domain sample: keep the output parquet bounded
        Seq("o_orderpriority"), "price_cents")
        .orderBy("o_orderpriority", "v"),
      Some(Profile.cdfLookupSql(
        """(SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
          |   FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) % 97 = 0)"""
          .stripMargin.replace("\n", " "),
        Seq("o_orderpriority"), "price_cents") +
        "\nORDER BY o_orderpriority, v")),

    // K-fold out-of-fold m-estimate target encoding
    // ([[Classifier.targetEncodeOof]]) — the smoothed, leakage-free
    // production form next to feat_target_enc's leave-one-out
    // baseline: order priority encoded by the out-of-fold rate of
    // fulfilled orders, shrunk toward the out-of-fold global prior by
    // m = 20 pseudo-counts (rare categories decay to the prior instead
    // of memorizing noise). Exact BIGINT sufficient statistics; one
    // fixed double formula; the all-rows-in-one-fold prior NULL-gates
    // in both engines. Output = the deployable encoding table
    // (category × fold), never a per-row join-back.
    Q("feat_target_encode_oof",
      (s, dir) => Classifier.targetEncodeOof(
        Tables.orders(s, dir).select(
          col("o_orderpriority").as("pri"),
          pmod(col("o_orderkey"), lit(5L)).as("fold"),
          when(col("o_orderstatus") === "F", lit(1L)).otherwise(lit(0L)).as("y")),
        "pri", "fold", "y", m = 20L)
        .orderBy("pri", "fold"),
      Some(Classifier.targetEncodeOofSql(
        """(SELECT o_orderpriority AS pri, o_orderkey % 5 AS fold,
          |   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders)"""
          .stripMargin.replace("\n", " "),
        "pri", "fold", "y", m = 20L) +
        "\nORDER BY pri, fold")),

    // Deterministic random walks ([[Graph.randomWalks]]): 4-hop
    // node2vec-style walk corpus from the first 20 customer nodes over
    // the customer↔supplier graph — next hop = md5-argmin neighbor, so
    // the corpus regenerates identically on any layout, retry, or
    // engine (an RNG walker can't give lineage-stable training data).
    // One keyed join + min-reduce per hop, frontier checkpointed.
    Q("gr_random_walk",
      (s, dir) => {
        val seeds = Tables.customer(s, dir)
          .filter(col("c_custkey") < 20)
          .select((col("c_custkey") * 2).as("walk_id"),
            (col("c_custkey") * 2).as("node"))
        Graph.randomWalks(graphEdges(s, dir), seeds, steps = 4)
          .orderBy("walk_id", "step")
      },
      Some(s"""WITH $graphEdgesSql,
              |seeds AS (SELECT c_custkey * 2 AS walk_id, c_custkey * 2 AS node
              |          FROM customer WHERE c_custkey < 20),
              |${Graph.randomWalksSql(4)}
              |ORDER BY walk_id, step""".stripMargin)),

    // Monthly VWAP ([[graft.ops.StockOps.vwapMonthly]]): the
    // volume-weighted price the reference's gold layer approximates
    // with AVG(close) (monthly_stock_summary.sql:15) — exact
    // DECIMAL(38,0) price·volume numerator over the silver dailies,
    // one double division.
    Q("stock_vwap",
      (s, dir) => StockOps.vwapMonthly(
        StockOps.silverDaily(StockOps.bronzeFromLineitem(Tables.lineitem(s, dir))))
        .orderBy("ticker", "ano", "mes"),
      Some(s"""WITH silver AS (${StockOps.silverSql()})
              |SELECT * FROM (${StockOps.vwapMonthlySql})
              |ORDER BY ticker, ano, mes""".stripMargin)),

    // Maximum drawdown ([[StockOps.maxDrawdown]]): deepest
    // peak-to-trough loss per ticker in exact basis points — running
    // cumulative-max over the pre-aggregated dailies, integral
    // division, earliest trough date. The risk statistic a monthly
    // group-by gold table structurally cannot express.
    Q("stock_drawdown",
      (s, dir) => StockOps.maxDrawdown(
        StockOps.silverDaily(StockOps.bronzeFromLineitem(Tables.lineitem(s, dir))))
        .orderBy("ticker"),
      Some(s"""WITH silver AS (${StockOps.silverSql()})
              |SELECT * FROM (${StockOps.maxDrawdownSql})
              |ORDER BY ticker""".stripMargin)),

    // Cutler's RSI-14 ([[StockOps.rsi]]): exact integer rolling
    // gain/loss sums over daily diffs; full windows only; flat window
    // → NULL in both engines. Output restricted to one quarter to keep
    // the dump bounded — the operator itself is series-length-linear.
    Q("stock_rsi",
      (s, dir) => StockOps.rsi(
        StockOps.silverDaily(StockOps.bronzeFromLineitem(Tables.lineitem(s, dir))))
        .filter(col("d") >= lit("1995-01-01").cast(DateType) &&
          col("d") < lit("1995-04-01").cast(DateType))
        .orderBy("ticker", "d"),
      Some(s"""WITH silver AS (${StockOps.silverSql()})
              |SELECT * FROM (${StockOps.rsiSql()})
              |WHERE d >= DATE '1995-01-01' AND d < DATE '1995-04-01'
              |ORDER BY ticker, d""".stripMargin)),

    // SMA 5/20 crossover signals ([[StockOps.smaCross]]): golden/death
    // crosses as STRICT sign flips of the cross-multiplied relation
    // ΣF·20 − ΣS·5 — the whole signal is integer arithmetic, zero FP.
    Q("stock_sma_cross",
      (s, dir) => StockOps.smaCross(
        StockOps.silverDaily(StockOps.bronzeFromLineitem(Tables.lineitem(s, dir))))
        .orderBy("ticker", "d"),
      Some(s"""WITH silver AS (${StockOps.silverSql()})
              |SELECT * FROM (${StockOps.smaCrossSql()})
              |ORDER BY ticker, d""".stripMargin)),

    // DYNAMIC PARTITION PRUNING, plan-asserted: the fact table is
    // written hive-partitioned by ship month ONCE per JVM (ingest-time
    // cost, like j_bucketed_join's bucket build), and the join's month
    // set comes from DATA (distinct order months — not foldable, so
    // static pruning cannot fire). The in-query require pins the
    // runtime behavior that matters at 100 TB: the broadcast of the
    // dim REUSED as a partition filter on the fact scan, reading 3
    // month directories instead of 84. Without DPP this plan scans
    // every partition and filters after IO.
    Q("j_dpp",
      (s, dir) => {
        val factPath = s"/tmp/graft_dpp_${new java.io.File(dir).getName}/fact"
        builtDppFacts.synchronized {
          if (!builtDppFacts.contains(factPath)) {
            val li = Tables.lineitem(s, dir).select(
              col("l_quantity").cast(LongType).as("qty"),
              date_format(col("l_shipdate").cast(DateType), "yyyy-MM")
                .as("ship_month"))
            li.write.mode("overwrite").partitionBy("ship_month").parquet(factPath)
            builtDppFacts.add(factPath)
          }
        }
        val fact = s.read.parquet(factPath)
        val dim = Tables.orders(s, dir)
          .select(date_format(col("o_orderdate").cast(DateType), "yyyy-MM").as("m"))
          .distinct()
          .filter(col("m") >= "1995-01" && col("m") <= "1995-03")
        val agg = fact.join(broadcast(dim), col("ship_month") === col("m"))
          .groupBy("ship_month").agg(sum("qty").as("sum_qty"))
          .orderBy("ship_month")
        val plan = agg.queryExecution.executedPlan.toString
        require(plan.toLowerCase.contains("dynamicpruning"),
          s"expected dynamic partition pruning on the fact scan:\n$plan")
        agg
      },
      Some("""WITH m AS (SELECT DISTINCT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS m
             |  FROM orders
             |  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m') BETWEEN '1995-01' AND '1995-03')
             |SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS ship_month,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem JOIN m ON strftime(CAST(l_shipdate AS DATE), '%Y-%m') = m.m
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // STREAMING PEAK CONCURRENCY ([[StreamOps.keyedSumsSink]] reuse):
    // the sweep-line made streamable the stream_cusum way — the ±1
    // grid deltas are COMMUTATIVE partial sums (any arrival order,
    // any batch boundaries converge to the same per-(supplier, date)
    // delta), committed exactly-once per micro-batch; the order-
    // sensitive part (cumulative walk → peak, earliest date) runs at
    // read time over the bounded grid. End state must equal the batch
    // operator exactly — the ev_peak_concurrency oracle serves both.
    Q("stream_peak_final",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_peak_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val iv = Tables.lineitem(s, dir).filter(col("l_suppkey") < 50)
          .select(col("l_suppkey"), col("l_shipdate").cast(DateType).as("sd"),
            date_add(col("l_shipdate").cast(DateType),
              (col("l_linenumber") % 14) + 1).as("ed"))
        val ev = iv.select(col("l_suppkey"), col("sd").as("t"), lit(1L).as("d"))
          .unionAll(iv.select(col("l_suppkey"), col("ed").as("t"), lit(-1L).as("d")))
        val staged = s"$base/in"
        ev.repartition(4).write.parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        StreamOps.keyedSumsSink(stream, st, "metrics", "grid_deltas",
          Seq("l_suppkey", "t"), "d", checkpoint = s"$base/ckpt")
          .awaitTermination()
        val deltas = st.read("metrics", "grid_deltas")
          .groupBy("l_suppkey", "t").agg(sum("part_sum").as("delta"))
        val walk = Window.partitionBy("l_suppkey").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deltas.withColumn("__open", sum("delta").over(walk))
          .withColumn("__peak", max(col("__open"))
            .over(Window.partitionBy("l_suppkey")))
          .filter(col("__open") === col("__peak"))
          .groupBy("l_suppkey")
          .agg(max("__peak").as("peak"), min("t").as("peak_at"))
          .orderBy("l_suppkey")
      },
      Some("SELECT * FROM (" + EventOps.peakConcurrencySql(
        """(SELECT l_suppkey, CAST(l_shipdate AS DATE) AS s,
          |   CAST(l_shipdate AS DATE) + INTERVAL ((l_linenumber % 14) + 1) DAY AS e
          | FROM lineitem WHERE l_suppkey < 50)""".stripMargin.replace("\n", " "),
        Seq("l_suppkey"), "s", "e") + ")\nORDER BY l_suppkey")),

    // SQL-registration path end-to-end ([[graft.functions
    // .GraftFunctions]]): the native codegen expressions exercised the
    // way a SQL-only user reaches them — `spark.sql` over a registered
    // view with graft_jaro_winkler + graft_rolling_hash, hash-compared
    // against DuckDB's independent implementations (er_jaro pinned the
    // bit-identity; this pins the REGISTRATION plumbing).
    Q("sql_native_funcs",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Tables.part(s, dir).filter(col("p_partkey") < 200)
          .createOrReplaceTempView("__nf_part")
        s.sql("""SELECT p_partkey,
                |  graft_jaro_winkler(p_name, 'red widget') AS jw,
                |  graft_rolling_hash(p_name) AS rh
                |FROM __nf_part ORDER BY p_partkey""".stripMargin)
      },
      Some(s"""SELECT p_partkey,
              |  jaro_winkler_similarity(p_name, 'red widget') AS jw,
              |  ${TextOps.rollingHashSql("p_name")} AS rh
              |FROM part WHERE p_partkey < 200 ORDER BY p_partkey""".stripMargin)),

    // Exact 10% trimmed mean ([[Profile.trimmedMean]]): the robust
    // location estimate between mean and median — per-value kept-row
    // counts from span overlap with the [k, n−k) window, so ties and
    // partial trims are exact with NO row sort; ‰ trim keeps k itself
    // integer-derived in both engines.
    Q("q_trimmed_mean",
      (s, dir) => Profile.trimmedMean(
        Tables.lineitem(s, dir).select(col("l_returnflag"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("price_cents")),
        Seq("l_returnflag"), "price_cents", trimPerMille = 100)
        .orderBy("l_returnflag"),
      Some(Profile.trimmedMeanSql(
        "(SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents FROM lineitem)",
        Seq("l_returnflag"), "price_cents", trimPerMille = 100) +
        "\nORDER BY l_returnflag")),

    // Weekly churn / retention ([[EventOps.periodChurn]]): per
    // activity week — active, retained into next week, churned, and
    // next-week-new users on the distinct (user, week) grain (the
    // events table spans one month, so weeks are the period with a
    // real successor structure). The last observed week reports NULL
    // churn (unobserved ≠ 100%).
    Q("ev_churn",
      (s, dir) => EventOps.periodChurn(Tables.events(s, dir), "user_id", "ts",
        period = "week").orderBy("m"),
      Some(EventOps.periodChurnSql("events", "user_id", "ts", period = "week") +
        "\nORDER BY m")),

    // DAU/WAU stickiness ([[EventOps.dauMau]]): mean daily actives
    // over observed days vs the week's distinct actives — the
    // engagement headline ratio; exact integer dedup grains, two
    // fixed-arity divisions.
    Q("ev_dau_mau",
      (s, dir) => EventOps.dauMau(Tables.events(s, dir), "user_id", "ts",
        period = "week").orderBy("m"),
      Some(EventOps.dauMauSql("events", "user_id", "ts", period = "week") +
        "\nORDER BY m")),

    // EXPOSURE-CONDITIONED A/B analysis ([[EventOps.abTestExposure]])
    // — ev_ab_test's windowed companion (that one reads whole-history
    // conversions on parity arms): stateless md5 arms, exposure =
    // first 'view', conversion = 'purchase' within a 24-hour
    // attribution window of exposure (unbounded saturates to
    // "eventually everyone" on this corpus — rates 1.0, variance 0, z
    // undefined), pooled two-proportion z, NULL on zero pooled
    // variance.
    Q("ev_ab_exposure",
      (s, dir) => EventOps.abTestExposure(Tables.events(s, dir), "user_id",
        "event_type", "ts", exposeType = "view", convType = "purchase",
        window = expr("INTERVAL 24 HOURS")),
      Some(EventOps.abTestExposureSql("events", "user_id", "event_type", "ts",
        exposeType = "view", convType = "purchase",
        windowSql = "INTERVAL 24 HOUR"))),

    // Rolling 7-day median ([[TimeSeries.rollingMedian]]): the
    // despiking filter over each priority's daily order counts — the
    // rolling MEAN drags toward the spike it should reject. Lower
    // medians are real elements; windows sort ≤7 collected values on
    // the pre-aggregated series.
    Q("ts_rolling_median",
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority").as("prio"),
            datediff(col("o_orderdate").cast(DateType),
              lit("1992-01-01").cast(DateType)).as("day"))
          .agg(count(lit(1)).as("n"))
        TimeSeries.rollingMedian(daily, Seq("prio"), "day", "n", window = 7)
          .orderBy("prio", "t")
      },
      Some(TimeSeries.rollingMedianSql(
        """(SELECT o_orderpriority AS prio,
          |   date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day,
          |   CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1, 2)"""
          .stripMargin.replace("\n", " "),
        Seq("prio"), "day", "n", window = 7) + "\nORDER BY prio, t")),

    // Inter-arrival time quantiles ([[Profile.discQuantiles]]): p50 /
    // p90 / p99 of the microsecond gap between each user's consecutive
    // events, keyed by the arriving event's type — the latency-style
    // SLO readout for event feeds. Gaps are exact integer micros
    // (lag over (ts, event_id) total order); one value-count walk
    // serves all three levels via a broadcast level table.
    Q("ev_interarrival",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val gaps = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("gap_us", col("us") - lag("us", 1).over(w))
          .filter(col("gap_us").isNotNull)
        Profile.discQuantiles(gaps, Seq("event_type"), "gap_us",
          pMille = Seq(500, 900, 990))
          .orderBy("event_type", "p_mille")
      },
      Some(Profile.discQuantilesSql(
        """(SELECT event_type,
          |   epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
          |     PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
          | FROM events)""".stripMargin.replace("\n", " "),
        Seq("event_type"), "gap_us", pMille = Seq(500, 900, 990)) +
        "\nORDER BY event_type, p_mille")),

    // Sequence-gap report, keyed: each supplier's IDLE shipping
    // windows — runs of days with no shipment between two active days
    // (the driver's synthetic key spaces are dense, so the interesting
    // gaps live in per-key activity calendars, the same scan that
    // catches dropped ingest batches on a real feed). Gaps-and-islands
    // over the DISTINCT (supplier, active-day) domain: one keyed lag,
    // rows where the step exceeds 1 become (gap_start, gap_end,
    // n_missing) ranges — output is gap-count-sized.
    Q("q_key_gaps",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("sk").orderBy("k")
        Tables.lineitem(s, dir).filter(col("l_suppkey") < 10)
          .select(col("l_suppkey").as("sk"),
            datediff(col("l_shipdate").cast(DateType),
              lit("1992-01-01").cast(DateType)).cast(LongType).as("k"))
          .distinct()
          .withColumn("__prev", lag("k", 1).over(w))
          .filter(col("__prev").isNotNull && col("k") - col("__prev") > 1)
          .select(col("sk"), (col("__prev") + 1).as("gap_start"),
            (col("k") - 1).as("gap_end"),
            (col("k") - col("__prev") - 1).as("n_missing"))
          .orderBy("sk", "gap_start")
      },
      Some("""SELECT sk, CAST(prev + 1 AS BIGINT) AS gap_start,
             |  CAST(k - 1 AS BIGINT) AS gap_end,
             |  CAST(k - prev - 1 AS BIGINT) AS n_missing
             |FROM (SELECT sk, k, lag(k, 1) OVER (PARTITION BY sk ORDER BY k) AS prev
             |      FROM (SELECT DISTINCT l_suppkey AS sk,
             |              CAST(date_diff('day', DATE '1992-01-01',
             |                CAST(l_shipdate AS DATE)) AS BIGINT) AS k
             |            FROM lineitem WHERE l_suppkey < 10))
             |WHERE prev IS NOT NULL AND k - prev > 1
             |ORDER BY sk, gap_start""".stripMargin)),

    // NEAREST as-of ([[graft.ops.TemporalJoins.asofJoinNearest]]):
    // pandas merge_asof(direction='nearest'), ties backward —
    // completing the direction family. Two union+window shuffles on
    // the key, one fixed winner projection; the DuckDB mirror composes
    // its backward and forward ASOF JOINs with the same tie rule.
    Q("j_asof_nearest",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val snaps = orders.filter(col("o_orderkey") % 7 === 0)
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_totalprice")).as("snap_price"))
        graft.ops.TemporalJoins.asofJoinNearest(
          orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          snaps, key = "o_custkey", leftTs = "o_orderdate",
          rightTs = "o_orderdate", valueCols = Seq("snap_price"))
          .orderBy("o_orderkey")
      },
      Some("""WITH snaps AS (SELECT o_custkey, o_orderdate AS snap_ts,
             |                      max(o_totalprice) AS snap_price
             |               FROM orders WHERE o_orderkey % 7 = 0 GROUP BY 1, 2),
             |b AS (SELECT o.o_orderkey, s.snap_ts AS bts, s.snap_price AS bp
             |      FROM orders o ASOF LEFT JOIN snaps s
             |        ON o.o_custkey = s.o_custkey AND o.o_orderdate >= s.snap_ts),
             |f AS (SELECT o.o_orderkey, s.snap_ts AS fts, s.snap_price AS fp
             |      FROM orders o ASOF LEFT JOIN snaps s
             |        ON o.o_custkey = s.o_custkey AND o.o_orderdate <= s.snap_ts)
             |SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
             |  CASE WHEN f.fts IS NULL OR (b.bts IS NOT NULL AND
             |         epoch(CAST(o.o_orderdate AS TIMESTAMP)) - epoch(CAST(b.bts AS TIMESTAMP))
             |           <= epoch(CAST(f.fts AS TIMESTAMP)) - epoch(CAST(o.o_orderdate AS TIMESTAMP)))
             |       THEN b.bp ELSE f.fp END AS snap_price
             |FROM orders o JOIN b USING (o_orderkey) JOIN f USING (o_orderkey)
             |ORDER BY o.o_orderkey""".stripMargin)),

    // Deterministic class rebalancing ([[Sampling.rebalanceClasses]]):
    // every language downsampled to the smallest class by (md5(id),
    // id) order — the uniform-prior training carve that replays
    // identically on any layout, where sampleBy fractions neither hit
    // the exact count nor reproduce.
    Q("samp_rebalance",
      (s, dir) => Sampling.rebalanceClasses(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        "lang", "doc_id")
        .orderBy("lang", "doc_id"),
      Some(Sampling.rebalanceClassesSql(
        "(SELECT doc_id, lang FROM documents)", "lang", "doc_id",
        Seq("doc_id", "lang")) + "\nORDER BY lang, doc_id")),

    // First/last-touch attribution ([[EventOps.firstLastTouch]]): the
    // endpoint models bracketing ev_attribution's linear split — each
    // purchase credited to its earliest and latest preceding touch in
    // a 1-hour lookback; padded-string endpoint keys are engine-
    // identical; empty-window purchases report NULLs, not silence.
    Q("ev_attribution_ends",
      (s, dir) => EventOps.firstLastTouch(Tables.events(s, dir),
        "user_id", "event_type", "ts", "event_id",
        convType = "purchase", lookbackUs = 3600L * 1000000L)
        .orderBy("conv_id"),
      Some(EventOps.firstLastTouchSql("events", "user_id", "event_type",
        "ts", "event_id", convType = "purchase",
        lookbackUs = 3600L * 1000000L) + "\nORDER BY conv_id")),

    // Entity-resolution CLUSTERS over the blocked edit-distance pairs
    // ([[Linkage.editDistancePairs]] → [[Dedup.connectedComponents]]):
    // the step after pairwise matching every ER pipeline needs — the
    // transitive closure into canonical cluster ids (min member). The
    // oracle runs the identical pair SQL then a recursive min-label
    // CTE; the Spark side is bounded-round label propagation on the
    // pair edges (84k at sf0.1), never the part table.
    Q("er_edit_clusters",
      (s, dir) => Dedup.connectedComponents(
        Linkage.editDistancePairs(Tables.part(s, dir), "p_partkey", "p_name",
          Seq("p_brand", "p_type"), maxDistance = 3)
          .select(col("id_a"), col("id_b")),
        maxIter = 20)
        .select(col("id").as("p_partkey"), col("component").as("cluster"))
        .orderBy("p_partkey"),
      Some(s"""WITH RECURSIVE pe AS (
              |${Linkage.editDistancePairsSql("part", "p_partkey", "p_name",
                  Seq("p_brand", "p_type"), 3)}),
              |edges AS (SELECT id_a AS src, id_b AS dst FROM pe
              |          UNION ALL SELECT id_b AS src, id_a AS dst FROM pe),
              |reach(node, r) AS (
              |  SELECT src AS node, src AS r FROM edges
              |  UNION
              |  SELECT e.src AS node, reach.r FROM edges e JOIN reach ON e.dst = reach.node)
              |SELECT node AS p_partkey, MIN(r) AS cluster FROM reach
              |GROUP BY node ORDER BY p_partkey""".stripMargin)),

    // Soundex phonetic blocking ([[Linkage.soundex]]) — the classic ER
    // blocking key next to er_edit_distance's string-metric pairs:
    // part-name tokens group by what they SOUND like (one translate +
    // two array filters per row, the exact published algorithm
    // including the h/w-transparency and first-letter rules — the unit
    // pins Ashcraft→A261, Washington→W252, White→W300 and friends).
    // Output = the block table (code, member tokens, touched parts):
    // equal code = candidate pair, so downstream matching never goes
    // all-pairs. Two single-purpose aggregates joined on the block key
    // — never one mixed-distinct groupBy (the Expand trap).
    Q("er_soundex",
      (s, dir) => {
        val toks = Tables.part(s, dir)
          .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("tok"))
        val keys = toks.select("tok").distinct()
          .withColumn("sx", Linkage.soundex(col("tok")))
        val blocks = keys.groupBy("sx")
          .agg(count(lit(1)).as("n_tokens"),
            array_join(array_sort(collect_list("tok")), ",").as("members"))
        val parts = toks.join(keys, Seq("tok"))
          .groupBy("sx").agg(countDistinct("p_partkey").as("n_parts"))
        blocks.join(parts, Seq("sx"))
          .select(col("sx").as("soundex"), col("n_tokens"),
            col("members"), col("n_parts"))
          .orderBy("soundex")
      },
      Some(s"""WITH pt AS (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS tok
              |           FROM part),
              |tk AS (SELECT DISTINCT tok FROM pt),
              |${Linkage.soundexCtesSql("tk")},
              |blocks AS (SELECT sx, CAST(count(*) AS BIGINT) AS n_tokens,
              |    string_agg(tok, ',' ORDER BY tok) AS members
              |  FROM sx3 GROUP BY 1),
              |pc AS (SELECT sx, CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS n_parts
              |       FROM pt JOIN sx3 USING (tok) GROUP BY 1)
              |SELECT blocks.sx AS soundex, n_tokens, members, n_parts
              |FROM blocks JOIN pc USING (sx) ORDER BY soundex""".stripMargin)),

    // Embargoed temporal split ([[Sampling.timeSplit]]): train/test at
    // a 1997-01-01 cutoff with a 30-day purge buffer dropped — the
    // leakage guard trailing-window features require. Verified at the
    // row level (split label per order), aggregated for output size.
    Q("samp_time_split",
      (s, dir) => Sampling.timeSplit(
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        "o_orderdate", cutoff = "1997-01-01", embargoDays = 30)
        .groupBy("split")
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_orderdate").cast(DateType)).as("min_d"),
          max(col("o_orderdate").cast(DateType)).as("max_d"))
        .orderBy("split"),
      Some("SELECT split, CAST(count(*) AS BIGINT) AS n_rows, " +
        "MIN(CAST(o_orderdate AS DATE)) AS min_d, MAX(CAST(o_orderdate AS DATE)) AS max_d FROM (" +
        Sampling.timeSplitSql("orders", "o_orderdate", "1997-01-01", 30,
          Seq("o_orderkey", "o_orderdate")) +
        ")\nGROUP BY split ORDER BY split")),

    // Keyed table diff ([[Quality.tableDiff]]): reconcile two versions
    // of orders — a deterministic synthetic rewrite removes every
    // 97th key, reprices every 13th, and adds shifted keys — and the
    // diff must name exactly what changed per row (null-safe column
    // compare; unchanged rows withheld). The audit primitive row
    // counts and checksums can't give.
    Q("q_table_diff",
      (s, dir) => {
        val a = Tables.orders(s, dir).select(col("o_orderkey"),
          col("o_totalprice"), col("o_orderpriority"))
        val b = a.filter(col("o_orderkey") % 97 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))
          .unionByName(a.filter(col("o_orderkey") % 101 === 0)
            .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
              col("o_totalprice"), col("o_orderpriority")))
        Quality.tableDiff(a, b, "o_orderkey",
          Seq("o_totalprice", "o_orderpriority"))
          .filter(col("status") =!= "unchanged")
          .orderBy("o_orderkey")
      },
      Some("SELECT * FROM (\n" +
        """WITH a AS (SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders),
          |b AS (SELECT o_orderkey,
          |        CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
          |             ELSE o_totalprice END AS o_totalprice,
          |        o_orderpriority
          |      FROM a WHERE o_orderkey % 97 <> 0
          |      UNION ALL
          |      SELECT o_orderkey + 1000000000, o_totalprice, o_orderpriority
          |      FROM a WHERE o_orderkey % 101 = 0),
          |""".stripMargin +
        Quality.tableDiffSql("a", "b", "o_orderkey",
          Seq("o_totalprice", "o_orderpriority"))
          .replaceFirst("WITH j AS", "j AS") +
        ")\nWHERE status <> 'unchanged'\nORDER BY o_orderkey")),

    // Month-over-month growth on the GOLD summary
    // ([[StockOps.momGrowth]]): the BI staple downstream of the
    // reference's monthly table — exact delta + integral basis points
    // (no FP percentage); first month NULL, not zero.
    Q("stock_mom",
      (s, dir) => StockOps.momGrowth(StockOps.goldMonthly(
        StockOps.silverDaily(StockOps.bronzeFromLineitem(Tables.lineitem(s, dir)))))
        .orderBy("sigla_empresa", "ano", "mes"),
      Some(s"""WITH gold AS (${StockOps.goldSql()})
              |SELECT * FROM (${StockOps.momGrowthSql})
              |ORDER BY sigla_empresa, ano, mes""".stripMargin)),

    // CAPM beta vs the equal-weight market ([[StockOps.beta]]):
    // integer basis-point daily returns, DECIMAL(38,0) sufficient
    // statistics, doubled-sum market (the /k cancels in cov/var), only
    // balanced days — one double division per ticker at the end.
    Q("stock_beta",
      (s, dir) => StockOps.beta(
        StockOps.silverDaily(StockOps.bronzeFromLineitem(Tables.lineitem(s, dir))))
        .orderBy("ticker"),
      Some(s"""WITH silver AS (${StockOps.silverSql()})
              |SELECT * FROM (${StockOps.betaSql})
              |ORDER BY ticker""".stripMargin)),

    // Heaps'-law vocabulary growth ([[TextOps.vocabGrowth]]):
    // cumulative distinct tokens + token volume at doc milestones —
    // one min(doc_id)-per-token aggregate serves every milestone via a
    // broadcast literal fan-out; the corpus-health curve whose
    // flattening means templated intake.
    Q("t_vocab_growth",
      (s, dir) => TextOps.vocabGrowth(Tables.documents(s, dir), "doc_id", "text",
        milestones = Seq(50L, 100L, 200L, 400L, 800L, 1600L))
        .orderBy("milestone"),
      Some(TextOps.vocabGrowthSql("documents", "doc_id", "text",
        Seq(50L, 100L, 200L, 400L, 800L, 1600L)) + "\nORDER BY milestone")),

    // Deterministic k-fold CV ([[Sampling.kfold]]): fold = md5 byte
    // mod 5 — stateless, append-stable (a row's fold never moves),
    // engine-portable. Verified at the ASSIGNMENT level per document
    // plus fold-size balance in the same output.
    Q("samp_kfold",
      (s, dir) => Sampling.kfold(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", k = 5)
        .groupBy("fold").agg(count(lit(1)).as("n_rows"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("fold"),
      Some("SELECT fold, CAST(count(*) AS BIGINT) AS n_rows, " +
        "MIN(doc_id) AS min_id, MAX(doc_id) AS max_id FROM (" +
        Sampling.kfoldSql("documents", "doc_id", 5, Seq("doc_id")) +
        ")\nGROUP BY fold ORDER BY fold")),

    // Sharpe ratio ([[StockOps.sharpe]]): risk-adjusted return per
    // ticker from the same integer-bp daily returns as stock_beta —
    // exact Σr/Σr², sample-variance chain, NULL under 2 returns or
    // zero variance.
    Q("stock_sharpe",
      (s, dir) => StockOps.sharpe(
        StockOps.silverDaily(StockOps.bronzeFromLineitem(Tables.lineitem(s, dir))))
        .orderBy("ticker"),
      Some(s"""WITH silver AS (${StockOps.silverSql()})
              |SELECT * FROM (${StockOps.sharpeSql})
              |ORDER BY ticker""".stripMargin)),

    // Historical VaR / CVaR at 95% ([[StockOps.varCvar]]): the k-th
    // worst integer-bp daily return (k = ⌈5%·n⌉, exact integer ceil
    // division) and the exact mean of the k worst — ties at the
    // cutoff contribute only the remaining quota (the trimmedMean
    // span-overlap walk over the per-ticker VALUE-COUNT table, so the
    // window sorts distinct return values, never rows). The tail-risk
    // statistic next to stock_sharpe's mean-variance view.
    Q("stock_var",
      (s, dir) => StockOps.varCvar(
        StockOps.silverDaily(StockOps.bronzeFromLineitem(Tables.lineitem(s, dir))))
        .orderBy("ticker"),
      Some(s"""WITH silver AS (${StockOps.silverSql()})
              |SELECT * FROM (${StockOps.varCvarSql})
              |ORDER BY ticker""".stripMargin)),

    // Markov-chain steady state over event-type transitions
    // ([[EventOps.markovSteady]]): the long-run occupancy the
    // transition matrix implies — where user journeys spend their
    // time. Closed-chain counts, 6 integer fixed-point rounds in the
    // Graph SCALE currency (π·c products ride HUGEINT/DECIMAL(38)),
    // zero FP before the final division — the oracle unrolls the
    // identical rounds.
    Q("ev_markov_steady",
      (s, dir) => EventOps.markovSteady(Tables.events(s, dir),
          "user_id", "event_type", "ts", "event_id")
        .orderBy("event_type"),
      Some(EventOps.markovSteadySql("events") + "\nORDER BY event_type")),

    // Hour-of-day × type activity profile: the usage heat grid every
    // ops dashboard opens with — event counts and the hour's share of
    // its type's daily total (exact counts, one fixed division).
    // Complements ts_seasonal (weekday VALUE means on orders) with the
    // event-grain WHEN structure.
    Q("ev_hourly_profile",
      (s, dir) => {
        val base = Tables.events(s, dir)
          .select(col("event_type"), hour(col("ts")).cast(LongType).as("hod"))
          .groupBy("event_type", "hod").agg(count(lit(1)).as("n"))
        val tot = base.groupBy("event_type").agg(sum("n").as("__t"))
        base.join(broadcast(tot), Seq("event_type"))
          .select(col("event_type"), col("hod"), col("n"),
            (col("n").cast(DoubleType) / col("__t").cast(DoubleType)).as("share"))
          .orderBy("event_type", "hod")
      },
      Some("""WITH base AS (SELECT event_type,
             |    CAST(hour(ts) AS BIGINT) AS hod, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |tot AS (SELECT event_type, SUM(n) AS t FROM base GROUP BY 1)
             |SELECT base.event_type, hod, CAST(n AS BIGINT) AS n,
             |  CAST(n AS DOUBLE) / CAST(t AS BIGINT) AS share
             |FROM base JOIN tot ON base.event_type = tot.event_type
             |ORDER BY base.event_type, hod""".stripMargin)),

    // ── Density clustering / PCA / sketch overlap (round 15 march) ────

    // DBSCAN density clustering ([[Similarity.dbscan]]) — the cluster
    // shape k-means/SemDeDup cells can't express: arbitrary-shaped
    // dense regions with explicit noise. The corpus plants structure
    // the raw uniform embeddings lack (min natural pair distance ≈0.89
    // at every driver SF, measured): per base b%10=0 a CHAIN of three
    // replicas at +0.4·r along coord (b div 10)%64 — middle nodes are
    // core (2 neighbors at 0.4 ≤ eps), chain ENDS are borders — and per
    // b%10=5 a single 0.4-pair whose two 1-neighbor members stay below
    // minPts=2 and are dropped as noise, with every natural point
    // isolated noise too. Exercises all three DBSCAN roles with clean
    // margins (next non-planted distance ≥ 0.89 ≫ eps = 0.5).
    Q("sim_dbscan",
      (s, dir) => {
        val corpus = dbscanCorpus(s, dir)
        val cents = corpus.filter(col("vec_id") < 8)
          .select(col("vec_id").as("c_id"), col("v").as("c_vec"))
        Similarity.dbscan(corpus, "vec_id", "v", cents, "c_vec", "c_id",
            eps = 0.5, minPts = 2)
          .select(col("id").as("vec_id"), col("cluster"), col("role"))
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE
              |$dbscanCorpusCtesSql,
              |pr AS MATERIALIZED (SELECT a.vec_id AS qid, b.vec_id AS iid
              |  FROM corpus a JOIN corpus b ON a.vec_id <> b.vec_id
              |  WHERE ${Similarity.distSqSql("a.v", "b.v")} <= 0.25),
              |${dbscanLabelSql(2)}""".stripMargin)),

    // LSH-candidate DBSCAN ([[Similarity.dbscanLshAdaptive]]) — the
    // 100 TB form of sim_dbscan: the exact eps-graph is Ω(N²) on
    // concentrated high-dim distances (measured 6.3× at 10× data — the
    // cell bound admits everything), so candidates come from
    // deterministic ±1 sign-bands whose width AND count grow with the
    // corpus (the r15 `weak` closed): r = clamp(⌈log₂ N⌉, 8, 24)
    // planes per band keeps the bucket count 2^r ∝ N — expected
    // random-pair candidates per band N²/2^r ≈ N, LINEAR, where the
    // old fixed 8×8's 256 buckets left N²/256 — and the band count
    // b(r) = ⌈8·(1/p*)^(r−8)⌉ (p* ≈ 0.839, plane survival AT the
    // eps = 0.5 design radius on unit vectors) holds per-edge recall
    // 1 − (1 − p^r)^b at its design level instead of decaying with r
    // (measured on the 0.4-chord planted pairs: growing r alone
    // dropped label recovery 187→176 of 200). Total work b·N ≈
    // N^(1+ρ), ρ = log₂(1/p*) ≈ 0.253 — the Indyk–Motwani exponent.
    // Only survivors pay the exact d² ≤ eps² verify. (r, b) come from
    // ONE bounded count (the adaptiveBuckets pattern); the mirror
    // derives the identical r via integer bit-length arithmetic
    // (LENGTH(FORMAT('{:b}', N−1)), no transcendental log2 whose
    // power-of-two rounding could disagree), the identical b from the
    // shared literal design table, and REGENERATES the plane pool from
    // the same md5("p_i") high-bit rule — bit-identical buckets, so
    // the approximate graph is still hash-exact across engines.
    Q("sim_dbscan_lsh",
      (s, dir) => Similarity.dbscanLshAdaptive(
          dbscanCorpus(s, dir).localCheckpoint(), // counted once, hashed once
          "vec_id", "v", lshPool64, eps = 0.5, minPts = 2)
        .select(col("id").as("vec_id"), col("cluster"), col("role"))
        .orderBy("vec_id"),
      Some(s"""WITH RECURSIVE
              |$dbscanCorpusCtesSql,
              |nr AS (SELECT LEAST(${Similarity.LshRMax}, GREATEST(${Similarity.LshR0},
              |    LENGTH(FORMAT('{:b}', COUNT(*) - 1)))) AS r FROM corpus),
              |bt AS (SELECT * FROM $lshBandTableSql),
              |par AS (SELECT nr.r, bt.b FROM nr JOIN bt ON nr.r = bt.rr),
              |pl AS MATERIALIZED ${lshPlanePoolSql(64)},
              |plu AS MATERIALIZED (SELECT p // ${Similarity.LshRMax} AS band,
              |    p % ${Similarity.LshRMax} AS j, pvec
              |  FROM pl, par WHERE p % ${Similarity.LshRMax} < par.r
              |                 AND p // ${Similarity.LshRMax} < par.b),
              |bits AS (SELECT c.vec_id, u.band,
              |    CASE WHEN ${Similarity.dotSql("c.v", "u.pvec")} > 0
              |         THEN (CAST(1 AS BIGINT) << u.j) ELSE CAST(0 AS BIGINT) END AS w
              |  FROM corpus c CROSS JOIN plu u),
              |bnd AS MATERIALIZED (SELECT vec_id, band, SUM(w) AS bv
              |  FROM bits GROUP BY 1, 2),
              |cand AS MATERIALIZED (SELECT DISTINCT a.vec_id AS qid, c.vec_id AS iid
              |  FROM bnd a JOIN bnd c ON a.band = c.band AND a.bv = c.bv
              |                       AND a.vec_id < c.vec_id),
              |ver AS MATERIALIZED (SELECT qid, iid FROM cand
              |  JOIN corpus x ON x.vec_id = cand.qid
              |  JOIN corpus y ON y.vec_id = cand.iid
              |  WHERE ${Similarity.distSqSql("x.v", "y.v")} <= 0.25),
              |pr AS MATERIALIZED (SELECT qid, iid FROM ver
              |  UNION ALL SELECT iid, qid FROM ver),
              |${dbscanLabelSql(2)}""".stripMargin)),

    // INDEX-ASSISTED DBSCAN — the composition that actually changes the
    // law: the maintained NN-descent k-NN graph (the once-per-ingest
    // artifact sim_nndescent builds and stream_nn_final keeps fresh)
    // already holds each point's nearest neighbors, so the eps-graph is
    // ONE filter (dist ≤ eps) + symmetrize over N·k edges — no pair
    // enumeration at all, and the labeling phase is linear in edges.
    // Exact whenever every eps-ball fits in k AND the index is exact
    // (the planted chains have ≤ 3 true neighbors, k = 6); quality
    // tracks the index — 4 init hashes × 3 rounds measures 195/200
    // labels vs the exact baseline at sf0.001 (2 × 2 measured 92/200:
    // tiny 4-node families are the descent's hardest case, since
    // neighbor-of-neighbor expansion has almost nothing to walk).
    // sim_dbscan is the exact baseline; sim_dbscan_lsh the banding
    // constant-factor; this is the production shape.
    Q("sim_dbscan_graph",
      (s, dir) => {
        val corpus = dbscanCorpus(s, dir).localCheckpoint()
        val g = cachedNnGraph(s, dir, "dbscan") {
          Similarity.nnDescent(corpus, "vec_id", "v", k = 6, rounds = 3,
            buckets = adaptiveBuckets(corpus.count()), initHashes = 4)
        }
        val e = g.filter(col("dist") <= 0.5)
          .select(col("vec_id").as("query_id"), col("nbr_id").as("item_id"))
        val nbrs = e.unionByName(
            e.select(col("item_id").as("query_id"), col("query_id").as("item_id")))
          .distinct()
        Similarity.dbscanFromNbrs(nbrs, minPts = 2)
          .select(col("id").as("vec_id"), col("cluster"), col("role"))
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE
              |$dbscanCorpusCtesSql,
              |cx AS MATERIALIZED (SELECT vec_id AS id, v AS vec FROM corpus),
              |${Similarity.nnDescentCtesSql(k = 6, rounds = 3,
                 adaptiveBucketsSql("cx"), initHashes = 4, srcRel = "cx")},
              |-- sqrt domain, NOT d2 <= eps²: the Spark side filters the
              |-- index's dist = sqrt(d2) column, and a d2 one ulp above
              |-- eps² can still round to sqrt(d2) = eps exactly — the
              |-- engines must compare in the SAME domain (sqrt is
              |-- correctly rounded in both, so identical d2 ⇒ identical
              |-- dist ⇒ identical boundary verdict)
              |ge AS (SELECT src, dst FROM knn3 WHERE sqrt(d2) <= 0.5),
              |-- DISTINCT over UNION ALL, not UNION: DuckDB 1.0 silently
              |-- skips the UNION dedup for non-recursive CTEs inside a
              |-- WITH RECURSIVE block (reproduced against VALUES), so the
              |-- reciprocal edges knn2 carries would double-count toward
              |-- minPts where the Spark side's .distinct() collapses them
              |pr AS MATERIALIZED (SELECT DISTINCT qid, iid FROM (
              |  SELECT src AS qid, dst AS iid FROM ge
              |  UNION ALL
              |  SELECT dst AS qid, src AS iid FROM ge)),
              |${dbscanLabelSql(2)}""".stripMargin)),

    // PC1 of the embedding corpus by FIXED-POINT POWER ITERATION on the
    // integer Gram sufficient statistic ([[Similarity.gramMatrix]] —
    // distributed, corpus-size-free dim² reduction; [[Similarity
    // .powerIteration]] — 12 identical integer rounds on the bounded
    // dim² metadata, the watermark-read contract). No norm, no sqrt, no
    // float accumulation: both engines walk the same integer trajectory,
    // so the eigenvector is hashable with zero tolerance. At ~10⁸+
    // vectors the BIGINT Gram cells widen to DECIMAL(38) (sim_gram's
    // documented path); the iteration itself is scale-free.
    Q("sim_pca_power",
      (s, dir) => {
        val v = Similarity.powerIteration(cachedGram(s, dir), PcaRounds, PcaScale)
        import s.implicits._
        v.toSeq.zipWithIndex.map { case (x, i) => (i.toLong, x) }
          .toDF("dim_i", "v_fixed").orderBy("dim_i")
      },
      Some(s"""WITH $pcaCtes
              |SELECT j AS dim_i, v AS v_fixed FROM v$PcaRounds ORDER BY dim_i""".stripMargin)),

    // Distributed projection onto the learned PC1 — the scale half of
    // the PCA family: the eigenvector broadcasts as a literal and the
    // projection is one exact-integer dot per row inside whole-stage
    // codegen (top-20 magnitudes = the corpus' dominant-direction
    // outliers, the rows an embedding-quality audit reads first).
    Q("sim_pca_project",
      (s, dir) => {
        val v = Similarity.powerIteration(cachedGram(s, dir), PcaRounds, PcaScale)
        val vArr = array(v.map(lit).toIndexedSeq: _*)
        val q = transform(col("embedding"), x =>
          floor(x.cast(DoubleType) * lit(PcaQScale.toDouble) + lit(0.5)).cast(LongType))
        val proj = aggregate(zip_with(q, vArr, (a, b) => a * b), lit(0L), (acc, x) => acc + x)
        Tables.embeddings(s, dir)
          .select(col("vec_id"), proj.as("proj_fixed"))
          .orderBy(abs(col("proj_fixed")).desc, col("vec_id")).limit(20)
      },
      Some(s"""WITH $pcaCtes,
              |p AS (SELECT q.vec_id, CAST(SUM(q.q * v.v) AS BIGINT) AS proj_fixed
              |      FROM q JOIN v$PcaRounds v ON q.i = v.j GROUP BY 1)
              |SELECT vec_id, proj_fixed FROM p
              |ORDER BY ABS(proj_fixed) DESC, vec_id LIMIT 20""".stripMargin)),

    // Explained-variance summary of PC1: Rayleigh quotient λ₁ ≈ vᵀGv/vᵀv
    // and its share of trace(G) — the "is this corpus anisotropic"
    // one-liner (a large share means one direction dominates, the
    // classic symptom of uncentered or collapsed embeddings). All
    // integer: BigInt on the driver's bounded dim² metadata, HUGEINT in
    // the mirror, truncating division in both.
    Q("sim_pca_variance",
      (s, dir) => {
        val g = cachedGram(s, dir)
        val v = Similarity.powerIteration(g, PcaRounds, PcaScale)
        val dim = g.length
        var num = BigInt(0); var den = BigInt(0); var trace = 0L
        var i = 0
        while (i < dim) {
          var j = 0
          while (j < dim) { num += BigInt(v(i)) * g(i)(j) * v(j); j += 1 }
          den += BigInt(v(i)) * v(i); trace += g(i)(i); i += 1
        }
        val lambdaFixed = (num / den).toLong
        val sharePpm = (BigInt(lambdaFixed) * 1000000 / trace).toLong
        import s.implicits._
        Seq((lambdaFixed, trace, sharePpm))
          .toDF("lambda_fixed", "trace_qq", "share_ppm")
      },
      Some(s"""WITH $pcaCtes,
              |ray AS (SELECT SUM(CAST(vi.v AS HUGEINT) * g.g * vj.v) AS num
              |        FROM g JOIN v$PcaRounds vi ON g.i = vi.j
              |               JOIN v$PcaRounds vj ON g.j = vj.j),
              |dn AS (SELECT SUM(CAST(v AS HUGEINT) * v) AS den FROM v$PcaRounds),
              |tr AS (SELECT CAST(SUM(g) AS BIGINT) AS trace_qq FROM g WHERE i = j)
              |SELECT CAST(num // den AS BIGINT) AS lambda_fixed, trace_qq,
              |       CAST((num // den) * 1000000 // trace_qq AS BIGINT) AS share_ppm
              |FROM ray, dn, tr""".stripMargin)),

    // KMV (k-minimum-values) DISTINCT-OVERLAP SKETCH across two corpus
    // halves, in 5-token SHINGLE space (the near-dup currency: shared
    // shingle mass between corpora is the phrase-level contamination
    // screen) — the Beyer et al. (SIGMOD'07) estimator: each side keeps
    // only its k smallest md5 hash values (mergeable: k smallest per
    // partition → k smallest global, which is exactly Spark's
    // orderBy+limit physical plan — partial top-k, no full sort), the
    // kth value estimates distinct counts, and the union sketch's
    // both-sides fraction estimates Jaccard. At 100 TB the sketches are
    // 200 longs per corpus where the exact path is a giant distinct —
    // the exact columns ride along here only to exhibit estimator
    // error. All-integer: BIGINT hashes, truncating divisions.
    Q("agg_kmv_overlap",
      (s, dir) => {
        val K = 200
        val MaxH = 281474976710656L // 2^48: md5's first 12 hex chars
        val sh = Dedup.shingles(Tables.documents(s, dir), "doc_id", "text", n = 5)
        def side(m: Int) = sh.filter(col("doc_id") % 2 === m)
          .select(conv(substring(md5(col("shingle")), 1, 12), 16, 10)
            .cast(LongType).as("h"))
          .distinct().localCheckpoint() // 3 consumers: kmv, exact, probes
        val ha = side(0); val hb = side(1)
        val hu = ha.unionByName(hb).distinct().localCheckpoint()
        def kmvStats(hx: DataFrame, suffix: String) =
          hx.orderBy("h").limit(K)
            .agg(count(lit(1)).as(s"k_$suffix"), max("h").as(s"th_$suffix"))
        val kmvU = hu.orderBy("h").limit(K).localCheckpoint()
        val matches = kmvU.join(ha, Seq("h"), "left_semi")
          .join(hb, Seq("h"), "left_semi").agg(count(lit(1)).as("m"))
        val kU = kmvU.agg(count(lit(1)).as("k_u"))
        val exact = ha.agg(count(lit(1)).as("exact_a"))
          .crossJoin(hb.agg(count(lit(1)).as("exact_b")))
          .crossJoin(ha.join(hb, Seq("h"), "left_semi")
            .agg(count(lit(1)).as("inter_n")))
          .crossJoin(hu.agg(count(lit(1)).as("union_n")))
        kmvStats(ha, "a").crossJoin(kmvStats(hb, "b"))
          .crossJoin(matches).crossJoin(kU).crossJoin(exact)
          .selectExpr(
            "k_a", "k_b",
            s"(k_a - 1) * $MaxH div th_a AS est_a",
            s"(k_b - 1) * $MaxH div th_b AS est_b",
            "exact_a", "exact_b",
            "m * 1000000 div k_u AS jacc_est_ppm",
            "inter_n * 1000000 div union_n AS jacc_exact_ppm")
      },
      Some(s"""WITH tk AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks
              |           FROM documents),
              |t AS (SELECT doc_id, unnest(list_distinct(
              |    list_transform(range(1, len(toks) - 3),
              |      i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS tok
              |  FROM tk WHERE len(toks) >= 5),
              |ha AS MATERIALIZED (SELECT DISTINCT
              |    CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) AS h
              |  FROM t WHERE doc_id % 2 = 0),
              |hb AS MATERIALIZED (SELECT DISTINCT
              |    CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) AS h
              |  FROM t WHERE doc_id % 2 = 1),
              |hu AS MATERIALIZED (SELECT h FROM ha UNION SELECT h FROM hb),
              |ka AS (SELECT COUNT(*) AS k_a, MAX(h) AS th_a
              |       FROM (SELECT h FROM ha ORDER BY h LIMIT 200)),
              |kb AS (SELECT COUNT(*) AS k_b, MAX(h) AS th_b
              |       FROM (SELECT h FROM hb ORDER BY h LIMIT 200)),
              |ku AS MATERIALIZED (SELECT h FROM hu ORDER BY h LIMIT 200),
              |mt AS (SELECT (SELECT COUNT(*) FROM ku
              |               WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)) AS m,
              |              (SELECT COUNT(*) FROM ku) AS k_u),
              |ex AS (SELECT (SELECT COUNT(*) FROM ha) AS exact_a,
              |              (SELECT COUNT(*) FROM hb) AS exact_b,
              |              (SELECT COUNT(*) FROM ha WHERE h IN (SELECT h FROM hb)) AS inter_n,
              |              (SELECT COUNT(*) FROM hu) AS union_n)
              |SELECT k_a, k_b,
              |       (k_a - 1) * 281474976710656 // th_a AS est_a,
              |       (k_b - 1) * 281474976710656 // th_b AS est_b,
              |       exact_a, exact_b,
              |       m * 1000000 // k_u AS jacc_est_ppm,
              |       inter_n * 1000000 // union_n AS jacc_exact_ppm
              |FROM ka, kb, mt, ex""".stripMargin)),

    // HARD-NEGATIVE MINING for contrastive training — per query, the
    // top-5 most-similar corpus vectors whose LABEL DIFFERS (the
    // near-misses a bi-encoder learns most from; samp_negatives is the
    // random-negative baseline this upgrades). Query side broadcasts;
    // the label-mismatch dot map is corpus-linear; top-k is the
    // bounded-state heap aggregate — at production scale the corpus
    // side swaps to the IVF/graph candidates, the scoring is unchanged.
    Q("sim_hard_negatives",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val qs = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("label").as("q_lab"),
            col("embedding").as("qv"))
        emb.join(broadcast(qs), col("label") =!= col("q_lab"))
          .select(col("q_id"), col("vec_id"),
            Similarity.cosine(col("embedding"), col("qv")).as("cos"))
          .groupBy("q_id")
          .agg(Ranking.topKBy(col("cos"), col("vec_id"), 5).as("__top"))
          .select(col("q_id"), posexplode(col("__top")))
          .select(col("q_id"), (col("pos") + 1).cast(LongType).as("rank"),
            col("col.id").as("neg_id"), col("col.score").as("cosine"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, label AS q_lab, embedding AS qv
              |           FROM embeddings WHERE vec_id < 8),
              |c AS (SELECT q.q_id, e.vec_id,
              |        ${Similarity.cosineSql("e.embedding", "q.qv")} AS cosine
              |      FROM embeddings e JOIN q ON e.label <> q.q_lab),
              |r AS (SELECT q_id, vec_id, cosine,
              |        row_number() OVER (PARTITION BY q_id
              |                           ORDER BY cosine DESC, vec_id) AS rank
              |      FROM c)
              |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id AS neg_id, cosine
              |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // AUDIO near-duplicates by envelope-fingerprint banding
    // ([[Multimodal.wavEnvelopeBits]]) — completing the modality triple
    // next to mm_phash_neardup (images) and mm_video_neardup (video):
    // real mono PCM16 WAV payloads are decoded to a 24-window
    // amplitude-profile bitmask (exact integer energies, cross-
    // multiplied mean test), banded into three 8-bit buckets so
    // candidates come from an equi-join (never all-pairs), and
    // verified at Hamming ≤ 2. The planted truth: every id%5==0 doc
    // has a RE-ENCODED copy (8 kHz header relabel + 16 extra tail
    // frames — byte-different, envelope-identical) that byte hashing
    // cannot pair. The oracle replays the synth signal formula
    // analytically; the engine decodes actual RIFF bytes.
    Q("mm_audio_neardup",
      (s, dir) => {
        val corpus = Multimodal.synthWavNearDupCorpus(
          s, Tables.documents(s, dir), "doc_id")
        val fp = Multimodal.wavEnvelopePass(s, corpus, "doc_id", "payload",
            nWindows = 24, windowLen = 4)
          .localCheckpoint() // decode once; feeds both sides of the band join
        val bands = fp.select(col("doc_id"), col("fp"),
            explode(array(lit(0), lit(1), lit(2))).as("b"))
          .withColumn("bv", expr("shiftright(fp, 8 * b) & 255"))
        val a = bands.select(col("b"), col("bv"),
          col("doc_id").as("id_a"), col("fp").as("fa"))
        val c = bands.select(col("b"), col("bv"),
          col("doc_id").as("id_b"), col("fp").as("fb"))
        a.join(c, Seq("b", "bv")).filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b", "fa", "fb").distinct()
          .withColumn("hamming",
            bit_count(col("fa").bitwiseXOR(col("fb"))).cast(LongType))
          .filter(col("hamming") <= 2)
          .select(col("id_a"), col("id_b"), col("hamming"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH base AS (SELECT doc_id AS id, doc_id AS src FROM documents
             |  UNION ALL
             |  SELECT (SELECT MAX(doc_id) + 1 FROM documents) + doc_id, doc_id
             |  FROM documents WHERE doc_id % 5 = 0),
             |sv AS (SELECT b.id, i // 4 AS w,
             |         CAST(('0x' || substr(md5(CAST(src AS VARCHAR) || '_' ||
             |                                   CAST(i AS VARCHAR)), 1, 4)) AS BIGINT)
             |           - 32768 AS v
             |       FROM base b CROSS JOIN (SELECT unnest(range(0, 96)) AS i) ii),
             |we AS (SELECT id, w, SUM(v * v) AS e FROM sv GROUP BY 1, 2),
             |tot AS (SELECT id, SUM(e) AS te FROM we GROUP BY 1),
             |fp AS MATERIALIZED (SELECT we.id,
             |         CAST(SUM(CASE WHEN e * 24 > te
             |                       THEN CAST(1 AS BIGINT) << CAST(w AS INT)
             |                       ELSE 0 END) AS BIGINT) AS fp
             |       FROM we JOIN tot ON we.id = tot.id GROUP BY 1),
             |bands AS (SELECT id, fp, b, (fp >> CAST(8 * b AS INT)) & 255 AS bv
             |          FROM fp CROSS JOIN (SELECT unnest([0, 1, 2]) AS b) bb),
             |cand AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b, a.fp AS fa, c.fp AS fb
             |         FROM bands a JOIN bands c
             |           ON a.b = c.b AND a.bv = c.bv AND a.id < c.id)
             |SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
             |FROM cand WHERE bit_count(xor(fa, fb)) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // AUDIO voice-activity segmentation ([[Multimodal
    // .wavWindowEnergyRows]]) — the SEGMENTATION capability next to
    // mm_audio_neardup's fingerprinting: real mono PCM16 WAV payloads
    // decode to a 24×4 window-energy grid; a window is voiced iff its
    // exact integer energy exceeds 1/256 of the doc mean
    // (cross-multiplied, division-free): the gate must sit BETWEEN the
    // voiced level and the silence floor, and the plain mean does not —
    // a voiced window whose 4 samples land near zero dips below it
    // (caught live by the recover-the-plant spec: 2 of 24 windows on
    // doc 1). mean/256 is ≥38× the plant's ~mean/2¹⁴ silence floor and
    // ~256× below the voiced level, so both sides clear it by orders
    // of magnitude; maximal voiced RUNS
    // become segments via the gaps-and-islands key w − row_number —
    // one doc-keyed window, no self-join. The corpus is
    // amplitude-modulated md5 noise (voiced windows full int16 range,
    // silent ones the low byte — a ~2¹⁴× energy drop), so the
    // threshold recovers the planted voiced/silent pattern exactly;
    // the oracle replays signal, energies, gate, and islands
    // analytically while the engine decodes actual RIFF bytes.
    Q("mm_audio_vad",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val corpus = Multimodal.synthWavVadCorpus(
          s, Tables.documents(s, dir), "doc_id")
        val en = Multimodal.wavWindowEnergyRows(s, corpus, "doc_id", "payload",
          nWindows = 24, windowLen = 4)
        val tot = en.groupBy("doc_id")
          .agg(sum("e").as("te"), count(lit(1)).as("nw"))
        val voiced = en.join(tot, Seq("doc_id"))
          .filter(col("e") * col("nw") * lit(256L) > col("te"))
        val win = Window.partitionBy("doc_id").orderBy("w")
        voiced
          .withColumn("g", col("w") - row_number().over(win))
          .groupBy(col("doc_id"), col("g"))
          .agg(min("w").as("seg_start"), max("w").as("seg_end"),
            count(lit(1)).as("n_windows"), sum("e").as("energy"))
          .select("doc_id", "seg_start", "seg_end", "n_windows", "energy")
          .orderBy("doc_id", "seg_start")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents),
             |sv AS (SELECT doc_id, i // 4 AS w,
             |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '_w' ||
             |                          CAST(i // 4 AS VARCHAR)), 1, 1) >= '8'
             |      THEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_' ||
             |                                    CAST(i AS VARCHAR)), 1, 4)) AS BIGINT)
             |           - 32768
             |      ELSE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_' ||
             |                                     CAST(i AS VARCHAR)), 1, 4)) AS BIGINT)
             |            % 256) - 128 END AS v
             |  FROM ids CROSS JOIN (SELECT unnest(range(0, 96)) AS i) ii),
             |we AS (SELECT doc_id, w, CAST(SUM(v * v) AS BIGINT) AS e
             |       FROM sv GROUP BY 1, 2),
             |tt AS (SELECT doc_id, SUM(e) AS te, COUNT(*) AS nw FROM we GROUP BY 1),
             |vw AS (SELECT we.doc_id, w, e FROM we JOIN tt USING (doc_id)
             |       WHERE e * nw * 256 > te),
             |gi AS (SELECT doc_id, w, e,
             |         w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS g
             |       FROM vw)
             |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS seg_start,
             |  CAST(MAX(w) AS BIGINT) AS seg_end,
             |  CAST(COUNT(*) AS BIGINT) AS n_windows,
             |  CAST(SUM(e) AS BIGINT) AS energy
             |FROM gi GROUP BY doc_id, g
             |ORDER BY doc_id, seg_start""".stripMargin)),

    // STREAMING KMV sketch maintenance ([[StreamOps.kmvPartialsSink]]),
    // oracle-hashed end state: the corpus' 5-shingle hashes arrive as
    // four unordered micro-batches; each batch appends its k smallest
    // distinct hashes exactly-once, and the drained epilogue re-takes
    // the k smallest distinct over the maintained partials. k-min is a
    // semilattice — associative, commutative, idempotent — so the
    // result equals the single-pass corpus sketch for ANY batching or
    // arrival order (no mtime pinning needed, unlike the
    // order-sensitive sinks), and the estimator runs over a table of
    // batches × k rows however much data ever streamed.
    Q("stream_kmv_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_kmv_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val hashes = Dedup.shingles(Tables.documents(s, dir), "doc_id", "text", n = 5)
          .select(conv(substring(md5(col("shingle")), 1, 12), 16, 10)
            .cast(LongType).as("h"))
        val staged = s"$base/in"
        hashes.repartition(4).write.parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        StreamOps.kmvPartialsSink(stream, st, "metrics", "kmv_shingles",
          "h", k = 200, checkpoint = s"$base/ckpt").awaitTermination()
        val sk = st.read("metrics", "kmv_shingles").select("h").distinct()
          .orderBy("h").limit(200)
        sk.agg(count(lit(1)).as("k_sketch"), max("h").as("th"))
          .selectExpr("k_sketch", "th",
            "(k_sketch - 1) * 281474976710656 div th AS est_distinct")
      },
      Some(s"""WITH tk AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks
              |           FROM documents),
              |t AS (SELECT doc_id, unnest(list_distinct(
              |    list_transform(range(1, len(toks) - 3),
              |      i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS tok
              |  FROM tk WHERE len(toks) >= 5),
              |hh AS (SELECT DISTINCT
              |    CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) AS h FROM t),
              |ks AS (SELECT COUNT(*) AS k_sketch, MAX(h) AS th
              |       FROM (SELECT h FROM hh ORDER BY h LIMIT 200))
              |SELECT k_sketch, th,
              |       (k_sketch - 1) * 281474976710656 // th AS est_distinct
              |FROM ks""".stripMargin)),

    // ALL-BUT-THE-TOP embedding post-processing (Mu & Viswanath,
    // ICLR'18): remove the dominant principal direction from every
    // vector — the standard fix for anisotropic embedding spaces where
    // one rogue direction swamps cosine. All integer: the PC1 iterate
    // v (fixed-point, from the same cached Gram), per-vector projection
    // q·v exact, correction qᵢ − (proj·vᵢ) div (v·v) truncating in both
    // engines. Output: query 0's raw quantized-cosine top-10 with each
    // pair's corrected cosine alongside — the before/after re-ranking
    // an embedding-quality audit reads.
    Q("sim_all_but_top",
      (s, dir) => {
        val g = cachedGram(s, dir)
        val v = Similarity.powerIteration(g, PcaRounds, PcaScale)
        val den = v.map(x => x * x).sum
        val base = Tables.embeddings(s, dir)
          .select(col("vec_id"),
            transform(col("embedding"), x =>
              floor(x.cast(DoubleType) * lit(PcaQScale.toDouble) + lit(0.5))
                .cast(LongType)).as("q"))
          .withColumn("vv", array(v.map(lit).toIndexedSeq: _*))
          .withColumn("proj", aggregate(zip_with(col("q"), col("vv"),
            (a, b) => a * b), lit(0L), (acc, x) => acc + x))
          .withColumn("cq",
            expr(s"zip_with(q, vv, (qi, vi) -> qi - (proj * vi) div ${den}L)"))
        val q0 = base.filter(col("vec_id") === 0)
          .select(col("q").as("q0"), col("cq").as("cq0"))
        base.filter(col("vec_id") =!= 0).crossJoin(broadcast(q0))
          .select(col("vec_id"),
            Similarity.quantizedCosine(col("q"), col("q0")).as("cos_raw"),
            Similarity.quantizedCosine(col("cq"), col("cq0")).as("cos_corrected"))
          .orderBy(col("cos_raw").desc, col("vec_id")).limit(10)
      },
      Some(s"""WITH $pcaCtes,
              |vden AS (SELECT CAST(SUM(v * v) AS BIGINT) AS den FROM v$PcaRounds),
              |pj AS (SELECT q.vec_id, CAST(SUM(q.q * v.v) AS BIGINT) AS proj
              |       FROM q JOIN v$PcaRounds v ON q.i = v.j GROUP BY 1),
              |cells AS (SELECT q.vec_id, q.i, q.q,
              |    q.q - (pj.proj * v.v) // (SELECT den FROM vden) AS c
              |  FROM q JOIN v$PcaRounds v ON q.i = v.j
              |         JOIN pj ON q.vec_id = pj.vec_id),
              |lists AS MATERIALIZED (SELECT vec_id,
              |    list(q ORDER BY i) AS q, list(c ORDER BY i) AS cq
              |  FROM cells GROUP BY 1),
              |q0 AS (SELECT q AS q0, cq AS cq0 FROM lists WHERE vec_id = 0)
              |SELECT vec_id,
              |  ${Similarity.quantizedCosineSql("lists.q", "q0.q0")} AS cos_raw,
              |  ${Similarity.quantizedCosineSql("lists.cq", "q0.cq0")} AS cos_corrected
              |FROM lists CROSS JOIN q0 WHERE vec_id <> 0
              |ORDER BY cos_raw DESC, vec_id LIMIT 10""".stripMargin)),

    // STREAMING PCA sufficient-statistic maintenance
    // ([[StreamOps.gramPartialsSink]]), oracle-hashed end state: the
    // embedding corpus arrives as four unordered micro-batches; each
    // appends its (i, j, Σqᵢqⱼ) integer Gram partials exactly-once, and
    // the drained epilogue re-sums the dim²-bounded table and runs the
    // SAME fixed-point power iteration as sim_pca_power. The Gram is a
    // sum over rows — order-free, batch-free — so the oracle IS
    // sim_pca_power's single-pass mirror: streamed index maintenance
    // provably equals the batch build, the second order-free sink after
    // stream_kmv_final.
    Q("stream_pca_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_pca_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val staged = s"$base/in"
        Tables.embeddings(s, dir).select("vec_id", "embedding")
          .repartition(4).write.parquet(staged)
        val stream = StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        val st = new graft.engine.SnapshotStore(s, s"$base/store")
        StreamOps.gramPartialsSink(stream, st, "metrics", "gram_cells",
          "vec_id", "embedding", qScale = PcaQScale.toDouble,
          checkpoint = s"$base/ckpt").awaitTermination()
        val merged = st.read("metrics", "gram_cells")
          .groupBy("i", "j").agg(sum("g").as("g"))
        val v = Similarity.powerIteration(
          Similarity.collectGram(merged), PcaRounds, PcaScale)
        import s.implicits._
        v.toSeq.zipWithIndex.map { case (x, i) => (i.toLong, x) }
          .toDF("dim_i", "v_fixed").orderBy("dim_i")
      },
      Some(s"""WITH $pcaCtes
              |SELECT j AS dim_i, v AS v_fixed FROM v$PcaRounds ORDER BY dim_i""".stripMargin)),

    // Best-window SNIPPET EXTRACTION (search result highlighting): per
    // document the 10-token window holding the most query-term
    // occurrences (ties → earliest window), materialized as the snippet
    // string. Plan shape: hits are a narrow filtered projection, the
    // window score is one RANGE frame over hit positions (state = hits
    // in a 10-token span, not the document), the winner is a max_by
    // aggregate, and the token array joins back ONCE for the slice —
    // the full text never rides through the window shuffle.
    Q("search_highlight",
      (s, dir) => {
        val W = 10
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        val hits = docs.select(col("doc_id"), posexplode(col("toks")))
          .filter(col("col").isin("join", "merge", "hash"))
          .select(col("doc_id"), col("pos"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos").rangeBetween(0, W - 1)
        val best = hits.withColumn("n_hits", count(lit(1)).over(w))
          .groupBy("doc_id")
          .agg(max_by(struct(col("pos").as("start"), col("n_hits")),
            struct(col("n_hits"), (-col("pos")).as("np"))).as("b"))
          .select(col("doc_id"), col("b.start").cast(LongType).as("start"),
            col("b.n_hits").as("n_hits"))
        best.join(docs, Seq("doc_id"))
          .select(col("doc_id"), col("start"), col("n_hits"),
            array_join(slice(col("toks"), (col("start") + 1).cast(IntegerType), lit(W)), " ")
              .as("snippet"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks
              |           FROM documents),
              |hits AS (SELECT doc_id, i AS pos
              |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks))) AS i FROM tk)
              |  WHERE toks[i + 1] IN ('join', 'merge', 'hash')),
              |sc AS (SELECT doc_id, pos,
              |    COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
              |                   RANGE BETWEEN CURRENT ROW AND 9 FOLLOWING) AS n_hits
              |  FROM hits),
              |bs AS (SELECT doc_id, pos AS start, n_hits,
              |    row_number() OVER (PARTITION BY doc_id
              |                       ORDER BY n_hits DESC, pos) AS rn
              |  FROM sc)
              |SELECT bs.doc_id, CAST(start AS BIGINT) AS start,
              |  CAST(n_hits AS BIGINT) AS n_hits,
              |  array_to_string(list_slice(tk.toks, start + 1, start + 10), ' ') AS snippet
              |FROM bs JOIN tk ON bs.doc_id = tk.doc_id
              |WHERE rn = 1 ORDER BY bs.doc_id""".stripMargin)),

    // ROUGE-2 summary evaluation ([[graft.ops.Eval.rouge2]]) — the
    // recall-oriented complement of eval_bleu2: clipped-bigram overlap
    // against the reference, with F₁ collapsing to the exact rational
    // 2·overlap/(n_cand + n_ref) (P and R share the overlap). The
    // candidate "summary" drops every 4th token of the reference, so
    // recall < 1 and clipping binds. All-integer ppm outputs.
    Q("eval_rouge2",
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val cand = array_join(filter(toks, (x, i) => (i + 1) % 4 =!= 0), " ")
        graft.ops.Eval.rouge2(
          Tables.documents(s, dir).filter(col("doc_id") < 300)
            .select(col("doc_id"), cand.as("cand"), col("text").as("ref")),
          "doc_id", "cand", "ref")
          .orderBy("doc_id")
      },
      Some(s"""WITH pairs AS (SELECT doc_id,
              |    array_to_string(list_filter(${TextOps.tokensSql("text")},
              |      (x, i) -> i % 4 <> 0), ' ') AS cand,
              |    text AS ref
              |  FROM documents WHERE doc_id < 300),
              |cgr AS (SELECT doc_id, unnest(${TextOps.bigramsSql("cand")}) AS g FROM pairs),
              |rgr AS (SELECT doc_id, unnest(${TextOps.bigramsSql("ref")}) AS g FROM pairs),
              |cc AS (SELECT doc_id, g, count(*) AS cc FROM cgr GROUP BY 1, 2),
              |rc AS (SELECT doc_id, g, count(*) AS rc FROM rgr GROUP BY 1, 2),
              |j AS (SELECT COALESCE(cc.doc_id, rc.doc_id) AS doc_id,
              |        CAST(SUM(COALESCE(cc.cc, 0)) AS BIGINT) AS n_cand,
              |        CAST(SUM(COALESCE(rc.rc, 0)) AS BIGINT) AS n_ref,
              |        CAST(SUM(LEAST(COALESCE(cc.cc, 0), COALESCE(rc.rc, 0))) AS BIGINT) AS overlap
              |      FROM cc FULL JOIN rc ON cc.doc_id = rc.doc_id AND cc.g = rc.g
              |      GROUP BY 1),
              |o AS (SELECT p.doc_id, COALESCE(n_cand, 0) AS n_cand,
              |        COALESCE(n_ref, 0) AS n_ref, COALESCE(overlap, 0) AS overlap
              |      FROM (SELECT DISTINCT doc_id FROM pairs) p
              |      LEFT JOIN j ON p.doc_id = j.doc_id)
              |SELECT doc_id, n_cand, n_ref, overlap,
              |  CASE WHEN n_ref = 0 THEN NULL
              |       ELSE overlap * 1000000 // n_ref END AS recall_ppm,
              |  CASE WHEN n_cand = 0 THEN NULL
              |       ELSE overlap * 1000000 // n_cand END AS precision_ppm,
              |  CASE WHEN n_cand + n_ref = 0 THEN NULL
              |       ELSE 2 * overlap * 1000000 // (n_cand + n_ref) END AS f1_ppm
              |FROM o ORDER BY doc_id""".stripMargin)),

    // NDCG@10 with graded relevance ([[Ranking.ndcgAtK]]) — the
    // ranking-quality readout search_mrr's binary reciprocal rank
    // can't give: here it scores the int8-QUANTIZED cosine ranking
    // against exact-cosine relevance grades (≥0.30→3, ≥0.25→2,
    // ≥0.20→1 — tiers measured well-populated per query at every
    // driver SF), i.e. "how much ranking quality does 4×-cheaper
    // quantized scoring keep, position-discounted". The log₂ discounts
    // are driver-side integer literals inlined into BOTH engines
    // (query-time libm banned); gains, discounted sums, and the final
    // ppm are exact BIGINT, hash-stable with zero tolerance. Scale
    // shape: the metric is two query-keyed rank windows + one keyed
    // aggregate over the candidate table; candidates here are the
    // exact-eval brute-force cross (the sim_topk posture).
    Q("eval_ndcg",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val codes = emb.select(col("vec_id"), col("embedding"),
          Similarity.int8Codes(col("embedding")).as("qv"))
        val qs = codes.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("qv").as("q_qv"))
        val scored = codes.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            Similarity.quantizedCosine(col("qv"), col("q_qv")).as("q_cosine"),
            Similarity.cosine(col("embedding"), col("q_vec")).as("cosine"))
          .withColumn("rel",
            when(col("cosine") >= 0.30, lit(3L))
              .when(col("cosine") >= 0.25, lit(2L))
              .when(col("cosine") >= 0.20, lit(1L))
              .otherwise(lit(0L)))
        Ranking.ndcgAtK(scored, "q_id", "q_cosine", "vec_id", "rel", k = 10)
          .orderBy("q_id")
      },
      // (eval_map below shares this scored-candidates construction —
      // binary relevance over the same quantized-vs-exact setup)
      Some(s"""WITH base AS (SELECT vec_id, embedding,
              |                     ${Similarity.quantScaleSql("embedding")} AS sc
              |              FROM embeddings),
              |codes AS (SELECT vec_id, embedding,
              |                 ${Similarity.quantizeInt8Sql("embedding", "sc")} AS qv FROM base),
              |qs AS (SELECT vec_id AS q_id, embedding AS q_vec, qv AS q_qv
              |       FROM codes WHERE vec_id < 8),
              |scs AS (SELECT qs.q_id, c.vec_id,
              |               ${Similarity.quantizedCosineSql("c.qv", "qs.q_qv")} AS q_cosine,
              |               ${Similarity.cosineSql("c.embedding", "qs.q_vec")} AS cosine
              |        FROM codes c CROSS JOIN qs WHERE c.vec_id <> qs.q_id),
              |gr AS (SELECT q_id, vec_id, q_cosine,
              |          CASE WHEN cosine >= 0.30 THEN 3
              |               WHEN cosine >= 0.25 THEN 2
              |               WHEN cosine >= 0.20 THEN 1 ELSE 0 END AS rel
              |       FROM scs)
              |SELECT q AS q_id, dcg_units, idcg_units, ndcg_ppm
              |FROM (${Ranking.ndcgAtKSql("gr", "q_id", "q_cosine", "vec_id", "rel", k = 10)})
              |ORDER BY q_id""".stripMargin)),

    // Mean average precision + recall@10 ([[graft.ops.Eval
    // .apRecallAtK]]) — the BINARY-relevance retrieval pair next to
    // eval_ndcg's graded form, here measuring how much ranking quality
    // a 1-BIT-PER-DIM sign sketch keeps (the int8 ranking was probed
    // first and SATURATES — AP 10⁶ on every probe, an uninformative
    // eval): candidates rank by 63-bit SimHash agreement
    // (63 − popcount(xor), dim 63's bit dropped so the packed mask
    // never overflows a BIGINT add in either engine) against relevant
    // = exact cosine ≥ 0.25 (9–17 relevant per probe at both driver
    // SFs). AP sums precision at each relevant hit's rank, so it
    // rewards EARLY placement where recall@k only counts coverage.
    // All-integer: packed masks are disjoint power-of-two sums,
    // agreement is a popcount, precision terms floor to ppm, AP
    // divides by min(R, 10), recall by R — NULLIF-gated.
    Q("eval_map",
      (s, dir) => {
        val sketch = expr("aggregate(transform(embedding, (x, i) -> " +
          "CASE WHEN i < 63 AND x >= CAST(0.0 AS FLOAT) " +
          "THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END), " +
          "CAST(0 AS BIGINT), (a, b) -> a + b)")
        val emb = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"), sketch.as("sk"))
        val qs = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("sk").as("q_sk"))
        val scored = emb.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            (lit(63L) - expr("bit_count(sk ^ q_sk)")).as("agree"),
            when(Similarity.cosine(col("embedding"), col("q_vec")) >= 0.25, lit(1L))
              .otherwise(lit(0L)).as("rel"))
        graft.ops.Eval.apRecallAtK(scored, "q_id", "agree", "vec_id", "rel", k = 10)
          .orderBy("q_id")
      },
      Some(s"""WITH base AS (SELECT vec_id, embedding,
              |    list_reduce(list_prepend(CAST(0 AS BIGINT),
              |      list_transform(embedding, (x, i) ->
              |        CASE WHEN i <= 63 AND x >= CAST(0.0 AS FLOAT)
              |             THEN CAST(1 AS BIGINT) << CAST(i - 1 AS INTEGER)
              |             ELSE CAST(0 AS BIGINT) END)),
              |      (a, b) -> a + b) AS sk
              |  FROM embeddings),
              |qs AS (SELECT vec_id AS q_id, embedding AS q_vec, sk AS q_sk
              |       FROM base WHERE vec_id < 8),
              |scs AS (SELECT qs.q_id, c.vec_id,
              |               63 - bit_count(xor(c.sk, qs.q_sk)) AS agree,
              |               CASE WHEN ${Similarity.cosineSql("c.embedding", "qs.q_vec")} >= 0.25
              |                    THEN 1 ELSE 0 END AS rel
              |        FROM base c CROSS JOIN qs WHERE c.vec_id <> qs.q_id),
              |rk AS (SELECT q_id, rel,
              |         row_number() OVER (PARTITION BY q_id
              |           ORDER BY agree DESC, vec_id) AS sr,
              |         SUM(rel) OVER (PARTITION BY q_id
              |           ORDER BY agree DESC, vec_id
              |           ROWS UNBOUNDED PRECEDING) AS rc
              |       FROM scs)
              |SELECT q_id, CAST(SUM(rel) AS BIGINT) AS n_rel,
              |  CAST(SUM(CASE WHEN sr <= 10 THEN rel ELSE 0 END) AS BIGINT) AS rel_at_k,
              |  CAST(SUM(CASE WHEN sr <= 10 AND rel = 1
              |           THEN (rc * 1000000) // sr ELSE 0 END) AS BIGINT)
              |    // NULLIF(LEAST(CAST(SUM(rel) AS BIGINT), 10), 0) AS ap_ppm,
              |  (CAST(SUM(CASE WHEN sr <= 10 THEN rel ELSE 0 END) AS BIGINT) * 1000000)
              |    // NULLIF(CAST(SUM(rel) AS BIGINT), 0) AS recall_ppm
              |FROM rk GROUP BY q_id
              |ORDER BY q_id""".stripMargin)),

    // Cohen's kappa ([[graft.ops.Eval.cohenKappa]]) — chance-corrected
    // agreement between TWO quality filters judging the same corpus
    // (the Gopher-style length/diversity gate vs the stopword-density
    // gate): the inter-rater readout raw overlap flatters when both
    // filters keep most docs; κ subtracts the marginal-product chance
    // floor. (langId-vs-label was probed first and reads κ = 0 EXACTLY
    // — the heuristic predicts 'en' on this synthetic-English corpus
    // whatever the label says, i.e. pure chance; ml_langid_report
    // documents that same degeneracy per class. Two correlated filters
    // are the honest subject.) Exact BIGINT confusion-cell arithmetic;
    // the negative-κ branch truncates toward zero EXPLICITLY in both
    // engines (Spark div truncates, DuckDB // floors — the
    // audit-proven divergence class, pinned by a worse-than-chance
    // unit).
    Q("eval_kappa",
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val nTok = TextOps.tokenCount(col("text"))
        val raters = Tables.documents(s, dir).select(
          (nTok >= 50 && TextOps.stopwordCount(col("text")) >= 2 &&
            size(array_distinct(toks)).cast(DoubleType) * 5.0 >=
              nTok.cast(DoubleType)).as("gopher_keep"),
          (nTok >= 40 &&
            TextOps.stopwordCount(col("text")) * 16 >= nTok).as("density_keep"))
        graft.ops.Eval.cohenKappa(raters, "gopher_keep", "density_keep")
      },
      Some(graft.ops.Eval.cohenKappaSql(
        s"""(SELECT
           |   (len(${TextOps.tokensSql("text")}) >= 50
           |    AND ${TextOps.stopwordCountSql("text")} >= 2
           |    AND CAST(len(list_distinct(${TextOps.tokensSql("text")})) AS DOUBLE) * 5.0
           |        >= CAST(len(${TextOps.tokensSql("text")}) AS DOUBLE)) AS gopher_keep,
           |   (len(${TextOps.tokensSql("text")}) >= 40
           |    AND ${TextOps.stopwordCountSql("text")} * 16
           |        >= len(${TextOps.tokensSql("text")})) AS density_keep
           | FROM documents)""".stripMargin.replace("\n", " "),
        "gopher_keep", "density_keep"))),

    // Welch's unequal-variance t-test between the A and N return-flag
    // populations' quantities — the two-sample significance screen next
    // to q_mann_whitney's rank form ([[Eval.welchTTest]]). Sufficient
    // statistics are exact integers (cents, cents²); sample variances
    // come from the DECIMAL(38)/HUGEINT identity n·Σx² − (Σx)² with ONE
    // correctly-rounded conversion each ([[graft.Det.hiLoDoubleSql]] on
    // the mirror side), and every double step after that is the same
    // literal formula in both engines. An n ≤ 1 arm NULL-gates its
    // variance and everything downstream in BOTH engines (the
    // ev_ab_exposure-audit x/0 hazard class: Spark folds x/0 to NULL
    // where DuckDB reads +inf) — unreachable on the driver corpora
    // (n ≈ 2k per arm) but guarded on principle.
    Q("q_welch_ttest",
      (s, dir) => graft.ops.Eval.welchTTest(
        Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("f"),
            expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)").as("qc")),
        "f", "qc", "A", "N"),
      Some(s"""WITH st AS (SELECT l_returnflag AS f, COUNT(*) AS n,
              |    CAST(SUM(qc) AS BIGINT) AS s, CAST(SUM(qc * qc) AS BIGINT) AS ssq
              |  FROM (SELECT l_returnflag,
              |          CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc
              |        FROM lineitem WHERE l_returnflag IN ('A', 'N')) GROUP BY 1),
              |ab AS (SELECT a.n AS n_a, a.s AS s_a, a.ssq AS ssq_a,
              |              b.n AS n_b, b.s AS s_b, b.ssq AS ssq_b
              |       FROM (SELECT * FROM st WHERE f = 'A') a,
              |            (SELECT * FROM st WHERE f = 'N') b),
              |v AS (SELECT n_a, n_b, s_a, s_b,
              |    CASE WHEN n_a > 1 THEN
              |    ${Det.hiLoDoubleSql("CAST(ssq_a AS HUGEINT) * n_a - CAST(s_a AS HUGEINT) * s_a")}
              |      / CAST(n_a AS DOUBLE) / CAST(n_a - 1 AS DOUBLE) END AS va,
              |    CASE WHEN n_b > 1 THEN
              |    ${Det.hiLoDoubleSql("CAST(ssq_b AS HUGEINT) * n_b - CAST(s_b AS HUGEINT) * s_b")}
              |      / CAST(n_b AS DOUBLE) / CAST(n_b - 1 AS DOUBLE) END AS vb
              |  FROM ab),
              |m AS (SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
              |    CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS mean_a,
              |    CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 AS mean_b,
              |    CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS dm,
              |    va / CAST(n_a AS DOUBLE) AS sea, vb / CAST(n_b AS DOUBLE) AS seb,
              |    n_a - 1 AS dfa, n_b - 1 AS dfb
              |  FROM v)
              |SELECT n_a, n_b, mean_a, mean_b,
              |  dm / sqrt(sea + seb) AS t_stat,
              |  (sea + seb) * (sea + seb) / (sea * sea / CAST(dfa AS DOUBLE)
              |    + seb * seb / CAST(dfb AS DOUBLE)) AS df_welch
              |FROM m""".stripMargin)),

    // Retrieval-quality eval: MEAN-RECIPROCAL-RANK reciprocal ranks
    // over the BM25 engine, with relevance labels that are TRUE BY
    // CONSTRUCTION — the corpus is the dedup family's dup-injected one
    // (every doc_id%5==0 has an exact copy at off+id), each such doc
    // queries with its 4 most DISTINCTIVE tokens (smallest global df,
    // ties to the token — the keyword-formulation step; leading-token
    // and pure self-retrieval probes both collapsed to rank-nowhere on
    // this corpus' 31-word shared vocabulary, measured), and the rank
    // of the KNOWN-relevant copy is the metric. The identical-text self
    // sorts first on the id tiebreak, so a healthy engine lands the
    // copy at rank ≈ 2. Retrieval runs in BIGRAM space — the corpus'
    // 31-word vocabulary makes unigram df useless (every token is in
    // hundreds of docs; both unigram probes measured rank-nowhere),
    // while its ~12k distinct bigrams actually identify documents —
    // the same unigram→shingle lesson as agg_kmv_overlap. nDCG's log₂
    // is deliberately avoided — transcendental rounding isn't pinned
    // cross-engine; reciprocal ranks are exact rationals. NULL rank =
    // outside the top-10.
    Q("search_mrr",
      (s, dir) => {
        val base = Tables.documents(s, dir)
        val off = base.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
        val bigramText = array_join(transform(
          TextOps.bigramsOf(TextOps.tokens(col("text"))),
          g => translate(g, " ", "_")), " ")
        val corpus = dupCorpus(s, dir).select(col("doc_id"), bigramText.as("text"))
        // the staged once-per-ingest index; the timed query pays query
        // formulation + rank + join only (tf already holds one row per
        // DISTINCT (doc, term), so it doubles as the doc-term table the
        // query-formulation step needs — no re-tokenize anywhere)
        val (tf, dl) = cachedBm25Index(s, dir, "mrr_bigram") {
          Search.indexBatch(corpus, "doc_id", "text")
        }
        val docTok = tf.select(col("doc_id"), col("term"))
        val dfr = docTok.groupBy("term").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("df"), col("term"))
        val qt = docTok.filter(col("doc_id") % 5 === 0 && col("doc_id") < 50)
          .join(broadcast(dfr), Seq("term"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
          .select(col("doc_id").as("q_id"), col("term"))
        val ranked = Search.bm25FromIndex(tf, dl, qt, k = 10)
        val rel = ranked.filter(col("doc_id") === col("q_id") + lit(off))
          .select(col("q_id"), col("rank"))
        base.filter(col("doc_id") % 5 === 0 && col("doc_id") < 50)
          .select(col("doc_id").as("q_id")).distinct()
          .join(rel, Seq("q_id"), "left")
          .selectExpr("q_id", "rank", "COALESCE(1000000 div rank, 0) AS rr_ppm")
          .orderBy("q_id")
      },
      Some {
        val qtBody =
          s"""WITH dtok AS (SELECT doc_id,
             |    unnest(list_distinct(${TextOps.tokensSql("text")})) AS term
             |  FROM bcorpus),
             |dfr2 AS (SELECT term, count(*) AS df FROM dtok GROUP BY 1)
             |SELECT doc_id AS q_id, term FROM (
             |  SELECT dtok.doc_id, dtok.term,
             |         row_number() OVER (PARTITION BY dtok.doc_id
             |                            ORDER BY dfr2.df, dtok.term) AS rn
             |  FROM dtok JOIN dfr2 USING (term)
             |  WHERE dtok.doc_id % 5 = 0 AND dtok.doc_id < 50)
             |WHERE rn <= 4""".stripMargin
        s"""WITH $dupCorpusSql,
           |bcorpus AS MATERIALIZED (SELECT doc_id,
           |  array_to_string(list_transform(${TextOps.bigramsSql("text")},
           |    g -> replace(g, ' ', '_')), ' ') AS text
           |  FROM corpus)
           |SELECT q.q_id, r.rank, COALESCE(1000000 // r.rank, 0) AS rr_ppm
           |FROM (SELECT DISTINCT doc_id AS q_id FROM documents
           |      WHERE doc_id % 5 = 0 AND doc_id < 50) q
           |LEFT JOIN (${Search.bm25SqlFrom("bcorpus", qtBody, k = 10)}) r
           |  ON r.q_id = q.q_id
           |  AND r.doc_id = q.q_id + (SELECT MAX(doc_id) + 1 FROM documents)
           |ORDER BY q.q_id""".stripMargin
      }),

    // END-TO-END retrieval-quality harness PER CORPUS SLICE (r15
    // verdict item 7a — the eval-loop closer on top of the two-stage
    // retrieval): stage 1 is the maintained-index BM25 (bigram space,
    // top-50 candidates; the same once-per-ingest index search_mrr
    // rides), stage 2 a CROSS-ENCODER-STYLE pairwise reranker — a
    // scorer that sees (query doc, candidate doc) pairs, here
    // BIGRAM-set Jaccard in exact integer ppm, applied to the
    // 50 candidates only (the cross-encoder deployment shape: the
    // expensive pairwise model never touches the corpus, only the
    // candidate set). Bigrams, NOT unigrams: the r16 harness run
    // SURFACED that a unigram scorer collapses on the `long` slice
    // (long docs saturate the 31-word vocabulary, every candidate
    // ties at J = 1.0, and the id tiebreak demotes the planted copy —
    // measured mrr 500000 → 423280 ppm); the corpus' ~12k distinct
    // bigrams carry word ORDER, so only the true copy reaches J = 1.0
    // and the `long` slice recovers (mrr2 ≥ mrr1, pinned by spec).
    // Relevance is true by construction (the planted
    // exact copy), and every metric reports PER LENGTH SLICE of the
    // query document (short/medium/long terciles of the corpus) —
    // found@10 and MRR@10 for stage 1 vs reranked, which is exactly
    // the "which corpus slice does retrieval fail on, and does the
    // reranker pay for itself there" readout a curation run reads.
    // All-integer metrics (ppm divisions), total-ordered ranks; the
    // Jaccard denominator clamps at 1 (GREATEST) so a bigram-less
    // sub-2-token doc scores 0 identically in both engines instead
    // of riding either engine's x/0 or NULL-ordering behavior.
    Q("eval_retrieval_slices",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.documents(s, dir)
        val off = base.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
        val stage1 = bm25Stage1(s, dir, k = 50)
        val big = dupCorpus(s, dir).select(col("doc_id"),
          array_distinct(TextOps.bigramsOf(TextOps.tokens(col("text")))).as("ts"))
        val rr = stage1
          .join(big.select(col("doc_id").as("q_id"), col("ts").as("__qt")), "q_id")
          .join(big.select(col("doc_id"), col("ts").as("__ct")), "doc_id")
          .withColumn("score_ppm", expr(
            "CAST(size(array_intersect(__qt, __ct)) AS BIGINT) * 1000000 div " +
              "GREATEST(CAST(size(__qt) AS BIGINT) + size(__ct) - size(array_intersect(__qt, __ct)), 1)"))
          .withColumn("rank2", row_number().over(
            Window.partitionBy("q_id").orderBy(col("score_ppm").desc, col("doc_id"))))
        val hit1 = stage1.filter(col("doc_id") === col("q_id") + off && col("rank") <= 10)
          .select(col("q_id"), col("rank").as("rank1"))
        val hit2 = rr.filter(col("doc_id") === col("q_id") + off && col("rank2") <= 10)
          .select(col("q_id"), col("rank2"))
        val sliced = base.filter(col("doc_id") % 5 === 0 && col("doc_id") < 150)
          .select(col("doc_id").as("q_id"),
            size(TextOps.tokens(col("text"))).as("n_tok"))
          .withColumn("slice", when(col("n_tok") < 40, "short")
            .when(col("n_tok") < 70, "medium").otherwise("long"))
        sliced.join(hit1, Seq("q_id"), "left").join(hit2, Seq("q_id"), "left")
          .groupBy("slice").agg(
            count(lit(1)).as("n_q"),
            sum(when(col("rank1").isNotNull, 1L).otherwise(0L)).as("found1"),
            expr("CAST(SUM(COALESCE(1000000 div rank1, 0)) div COUNT(*) AS BIGINT)")
              .as("mrr1_ppm"),
            sum(when(col("rank2").isNotNull, 1L).otherwise(0L)).as("found2"),
            expr("CAST(SUM(COALESCE(1000000 div rank2, 0)) div COUNT(*) AS BIGINT)")
              .as("mrr2_ppm"))
          .orderBy("slice")
      },
      Some {
        s"""WITH ${bm25Stage1Sql(k = 50)},
           |big AS MATERIALIZED (SELECT doc_id,
           |  list_distinct(${TextOps.bigramsSql("text")}) AS ts FROM corpus),
           |rr AS (SELECT q_id, doc_id,
           |    row_number() OVER (PARTITION BY q_id ORDER BY score_ppm DESC, doc_id) AS rank2
           |  FROM (SELECT r1.q_id, r1.doc_id,
           |          CAST(len(list_intersect(uq.ts, uc.ts)) AS BIGINT) * 1000000
           |            // GREATEST(CAST(len(uq.ts) AS BIGINT) + len(uc.ts)
           |                - len(list_intersect(uq.ts, uc.ts)), 1) AS score_ppm
           |        FROM r1 JOIN big uq ON uq.doc_id = r1.q_id
           |                JOIN big uc ON uc.doc_id = r1.doc_id)),
           |o AS (SELECT MAX(doc_id) + 1 AS off FROM documents),
           |h1 AS (SELECT q_id, rank AS rank1 FROM r1, o
           |       WHERE doc_id = q_id + off AND rank <= 10),
           |h2 AS (SELECT q_id, rank2 FROM rr, o
           |       WHERE doc_id = q_id + off AND rank2 <= 10),
           |sl AS (SELECT doc_id AS q_id,
           |    CASE WHEN len(${TextOps.tokensSql("text")}) < 40 THEN 'short'
           |         WHEN len(${TextOps.tokensSql("text")}) < 70 THEN 'medium'
           |         ELSE 'long' END AS slice
           |  FROM documents WHERE doc_id % 5 = 0 AND doc_id < 150)
           |SELECT slice, CAST(COUNT(*) AS BIGINT) AS n_q,
           |  CAST(SUM(CASE WHEN rank1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS found1,
           |  CAST(SUM(COALESCE(1000000 // rank1, 0)) // COUNT(*) AS BIGINT) AS mrr1_ppm,
           |  CAST(SUM(CASE WHEN rank2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS found2,
           |  CAST(SUM(COALESCE(1000000 // rank2, 0)) // COUNT(*) AS BIGINT) AS mrr2_ppm
           |FROM sl LEFT JOIN h1 USING (q_id) LEFT JOIN h2 USING (q_id)
           |GROUP BY slice ORDER BY slice""".stripMargin
      }),

    // POSITIONAL pairwise reranker as a first-class operator
    // ([[TextOps.positionalAgreementPpm]] — the scorer the r16
    // long-slice defect pointed at, promoted per the verdict's march):
    // same two-stage harness as eval_retrieval_slices (staged-index
    // BM25 top-50, the cross-encoder deployment shape), stage 2 scores
    // each (query, candidate) pair by EXACT POSITIONAL token agreement
    // — matches at index i over max(len), integer ppm. Order
    // sensitivity is the point: where ANY set/bag scorer ties whole
    // candidate lists on a saturated vocabulary, only a true copy
    // aligns position-by-position, so copies pin to 1e6 and shuffles
    // fall to the ~1/V chance-agreement floor — per slice, found@10
    // and MRR@10 against the stage-1 baseline. Zero shuffle in the
    // scorer itself (one codegen'd zip_with fold per candidate pair,
    // candidates bounded by k per query — corpus-size-free).
    Q("eval_rerank_positional",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.documents(s, dir)
        val off = base.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
        val stage1 = bm25Stage1(s, dir, k = 50)
        val tk = dupCorpus(s, dir).select(col("doc_id"),
          TextOps.tokens(col("text")).as("ts"))
        val rr = stage1
          .join(tk.select(col("doc_id").as("q_id"), col("ts").as("__qt")), "q_id")
          .join(tk.select(col("doc_id"), col("ts").as("__ct")), "doc_id")
          .withColumn("score_ppm", TextOps.positionalAgreementPpm("__qt", "__ct"))
          .withColumn("rank2", row_number().over(
            Window.partitionBy("q_id").orderBy(col("score_ppm").desc, col("doc_id"))))
        val hit1 = stage1.filter(col("doc_id") === col("q_id") + off && col("rank") <= 10)
          .select(col("q_id"), col("rank").as("rank1"))
        val hit2 = rr.filter(col("doc_id") === col("q_id") + off && col("rank2") <= 10)
          .select(col("q_id"), col("rank2"))
        val sliced = base.filter(col("doc_id") % 5 === 0 && col("doc_id") < 150)
          .select(col("doc_id").as("q_id"),
            size(TextOps.tokens(col("text"))).as("n_tok"))
          .withColumn("slice", when(col("n_tok") < 40, "short")
            .when(col("n_tok") < 70, "medium").otherwise("long"))
        sliced.join(hit1, Seq("q_id"), "left").join(hit2, Seq("q_id"), "left")
          .groupBy("slice").agg(
            count(lit(1)).as("n_q"),
            sum(when(col("rank1").isNotNull, 1L).otherwise(0L)).as("found1"),
            expr("CAST(SUM(COALESCE(1000000 div rank1, 0)) div COUNT(*) AS BIGINT)")
              .as("mrr1_ppm"),
            sum(when(col("rank2").isNotNull, 1L).otherwise(0L)).as("found_pos"),
            expr("CAST(SUM(COALESCE(1000000 div rank2, 0)) div COUNT(*) AS BIGINT)")
              .as("mrr_pos_ppm"))
          .orderBy("slice")
      },
      Some {
        s"""WITH ${bm25Stage1Sql(k = 50)},
           |tk AS MATERIALIZED (SELECT doc_id,
           |  ${TextOps.tokensSql("text")} AS ts FROM corpus),
           |rr AS (SELECT q_id, doc_id,
           |    row_number() OVER (PARTITION BY q_id ORDER BY score_ppm DESC, doc_id) AS rank2
           |  FROM (SELECT r1.q_id, r1.doc_id,
           |          ${TextOps.positionalAgreementPpmSql("uq.ts", "uc.ts")} AS score_ppm
           |        FROM r1 JOIN tk uq ON uq.doc_id = r1.q_id
           |                JOIN tk uc ON uc.doc_id = r1.doc_id)),
           |o AS (SELECT MAX(doc_id) + 1 AS off FROM documents),
           |h1 AS (SELECT q_id, rank AS rank1 FROM r1, o
           |       WHERE doc_id = q_id + off AND rank <= 10),
           |h2 AS (SELECT q_id, rank2 FROM rr, o
           |       WHERE doc_id = q_id + off AND rank2 <= 10),
           |sl AS (SELECT doc_id AS q_id,
           |    CASE WHEN len(${TextOps.tokensSql("text")}) < 40 THEN 'short'
           |         WHEN len(${TextOps.tokensSql("text")}) < 70 THEN 'medium'
           |         ELSE 'long' END AS slice
           |  FROM documents WHERE doc_id % 5 = 0 AND doc_id < 150)
           |SELECT slice, CAST(COUNT(*) AS BIGINT) AS n_q,
           |  CAST(SUM(CASE WHEN rank1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS found1,
           |  CAST(SUM(COALESCE(1000000 // rank1, 0)) // COUNT(*) AS BIGINT) AS mrr1_ppm,
           |  CAST(SUM(CASE WHEN rank2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS found_pos,
           |  CAST(SUM(COALESCE(1000000 // rank2, 0)) // COUNT(*) AS BIGINT) AS mrr_pos_ppm
           |FROM sl LEFT JOIN h1 USING (q_id) LEFT JOIN h2 USING (q_id)
           |GROUP BY slice ORDER BY slice""".stripMargin
      }),
  )

  /** DuckDB mirror of the sim_mmr greedy: the identical `k` rounds
    * unrolled as CTEs — round i scores every unpicked candidate
    * `λ·rel − μ·MAX(cos to picks 1..i−1)` and takes the (score DESC,
    * vec_id) head. μ is interpolated from the SAME `1.0 − λ` double the
    * Scala op computes (0.7 ⇒ 0.30000000000000004 — re-typing "0.3"
    * would be a DIFFERENT double and the hash would drift). */
  /** The greedy-pick CTE chain of [[kCenterOracleSql]] (`WITH s1..sk`)
    * — one CTE per pick, scalar MIN-over-selected subqueries (the
    * mmrOracleSql discipline); composable by cover-assignment
    * consumers. */
  private def kCenterOracleCtes(k: Int): String = {
    val b = Seq.newBuilder[String]
    b += "s1 AS (SELECT vec_id AS id, embedding AS vec FROM embeddings ORDER BY vec_id LIMIT 1)"
    for (i <- 2 to k) {
      val prevIds = (1 until i).map(j => s"SELECT id FROM s$j").mkString(" UNION ALL ")
      val prevVecs = (1 until i).map(j => s"SELECT vec FROM s$j").mkString(" UNION ALL ")
      b += s"""s$i AS (SELECT id, vec, d FROM (
              |    SELECT c.vec_id AS id, c.embedding AS vec,
              |           (SELECT MIN(${Similarity.distSqSql("c.embedding", "pk.vec")})
              |            FROM ($prevVecs) pk(vec)) AS d
              |    FROM embeddings c WHERE c.vec_id NOT IN ($prevIds))
              |  ORDER BY d DESC, id LIMIT 1)""".stripMargin
    }
    s"WITH ${b.result().mkString(",\n")}"
  }

  /** Unrolled DuckDB mirror of [[Similarity.kCenterSelect]]. */
  private def kCenterOracleSql(k: Int): String = {
    val sel = (s"SELECT CAST(1 AS BIGINT) AS rank, id AS vec_id, CAST(NULL AS DOUBLE) AS radius FROM s1" +:
      (2 to k).map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, id AS vec_id, sqrt(d) AS radius FROM s$i"))
      .mkString("\nUNION ALL\n")
    s"${kCenterOracleCtes(k)}\n$sel\nORDER BY rank"
  }

  private def mmrOracleSql(k: Int, nCands: Int, lambda: Double): String = {
    val mu = 1.0 - lambda
    val b = Seq.newBuilder[String]
    b += s"""q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            |cand AS (SELECT vec_id, embedding, cos AS rel FROM (
            |    SELECT vec_id, embedding,
            |           ${Similarity.cosineSql("embedding", "qv")} AS cos
            |    FROM embeddings CROSS JOIN q WHERE vec_id <> 0)
            |  ORDER BY cos DESC, vec_id LIMIT $nCands)""".stripMargin
    b += s"""s1 AS (SELECT vec_id, embedding, rel,
            |         $lambda * rel - $mu * 0.0 AS score
            |       FROM cand ORDER BY $lambda * rel - $mu * 0.0 DESC, vec_id LIMIT 1)""".stripMargin
    for (i <- 2 to k) {
      val prevIds = (1 until i).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
      val prevVecs = (1 until i).map(j => s"SELECT embedding FROM s$j").mkString(" UNION ALL ")
      // the picked-vector alias must dodge dotSql's lambda vars (s/x/y/v)
      b += s"""s$i AS (SELECT vec_id, embedding, rel, score FROM (
              |    SELECT c.vec_id, c.embedding, c.rel,
              |           $lambda * c.rel - $mu * (SELECT MAX(${Similarity.cosineSql("c.embedding", "pk.embedding")})
              |                                    FROM ($prevVecs) pk(embedding)) AS score
              |    FROM cand c WHERE c.vec_id NOT IN ($prevIds))
              |  ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    }
    val sel = (1 to k).map(i =>
      s"SELECT CAST($i AS INTEGER) AS rank, vec_id, rel, score AS mmr_score FROM s$i")
      .mkString("\nUNION ALL\n")
    s"WITH ${b.result().mkString(",\n")}\n$sel\nORDER BY rank"
  }

  /** Symmetrized WEIGHTED customer↔supplier edges: weight = number of
    * lineitems traded between the pair (interaction strength). */
  private def weightedGraphEdges(s: SparkSession, dir: String): DataFrame =
    // same single-pass explode symmetrization as [[graphEdges]] — the
    // union form re-planned the join+groupBy once per branch
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .agg(count(lit(1)).as("w"))
      .select(explode(array(
        struct(col("src"), col("dst"), col("w")),
        struct(col("dst").as("src"), col("src").as("dst"), col("w")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))

  /** DuckDB mirror of [[weightedGraphEdges]] (a `WITH`-clause fragment). */
  private def weightedGraphEdgesSql =
    """eraw AS (SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
      |                CAST(COUNT(*) AS BIGINT) AS w
      |         FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2),
      |edges AS (SELECT src, dst, w FROM eraw
      |          UNION ALL SELECT dst AS src, src AS dst, w FROM eraw)""".stripMargin

  /** One-directional DISTINCT customer→supplier pairs — the half
    * [[graphEdges]] symmetrizes, exposed for consumers that symmetrize
    * internally ([[graft.ops.Dedup.connectedComponents]]): passing the
    * pre-symmetrized list made CC's own union re-add the mirror of
    * every edge, so each label round joined 2× the rows (r17 measured). */
  private def graphPairs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

  /** Symmetrized customer↔supplier edge list shared by the gr_* queries
    * (both directions per undirected edge — no dangling nodes).
    * Symmetrization is ONE explode over the distinct pairs: the old
    * `pairs UNION pairs.swap` form planned the orders⋈lineitem join and
    * the dedup exchange once PER BRANCH (2× scans, 2 exchanges — r17
    * StageProf measured the duplicated map stages at 6.6 s + 6.4 s run
    * inside gr_pagerank); the mirror needs no second dedup because the
    * parity key split (customer = 2k even, supplier = 2k+1 odd) makes
    * forward and swapped rows disjoint classes. */
  private def graphEdges(s: SparkSession, dir: String): DataFrame =
    graphPairs(s, dir)
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** DuckDB mirror of [[graphEdges]] (a `WITH`-clause fragment).
    * A `def`, not a `val`: it is interpolated inside `val queries`,
    * which initializes first. */
  private def graphEdgesSql =
    """eraw AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |         FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |edges AS (SELECT src, dst FROM eraw UNION ALL SELECT dst AS src, src AS dst FROM eraw)""".stripMargin
}
