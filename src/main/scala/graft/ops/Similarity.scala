package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/**
 * Similarity search over embedding columns (`ARRAY<FLOAT>`):
 * brute-force cosine top-k as the exact baseline, IVF-style centroid
 * assignment, and random-hyperplane LSH bucketing as the scale path.
 *
 * All vector math is higher-order Column expressions (zip_with /
 * aggregate) over double-cast elements — sequential left-to-right
 * accumulation, so results are bit-reproducible.
 *
 * Scale design: brute force is one narrow map over the corpus (fine for
 * a broadcast query set, O(corpus) per query); IVF prunes to the probed
 * centroid's partition (build: one k-means-ish assignment shuffle;
 * probe: partition-pruned scan when the table is written partitioned by
 * centroid_id); LSH trades recall for a bucket equi-join, the right
 * shape when queries are also a large table.
 */
object Similarity {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Elements cast to double — float arithmetic differs across engines;
    * double is the common exact currency. */
  private def dbl(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Higher-order-function formulations — kept as the executable
    * specification: SimilaritySpec asserts the native expressions below
    * are bit-identical to these folds. */
  private[graft] def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(dbl(a), dbl(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private[graft] def cosineFold(a: Column, b: Column): Column =
    dotFold(a, b) / (norm(a) * norm(b))

  /** Native codegen'd vector ops ([[graft.functions.DotProduct]] /
    * [[graft.functions.CosineSimilarity]]): same left-to-right double
    * accumulation compiled into the whole-stage loop instead of an
    * interpreted lambda per element. */
  def dot(a: Column, b: Column): Column =
    column(graft.functions.DotProduct(expression(a), expression(b)))

  def norm(a: Column): Column =
    sqrt(aggregate(dbl(a), lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column =
    column(graft.functions.CosineSimilarity(expression(a), expression(b)))

  /** Native codegen'd Σ(aᵢ−bᵢ)² ([[graft.functions.DistanceSquared]]) —
    * bit-identical to [[distSqFold]] (SimilaritySpec parity test); the
    * all-candidates verify in [[rangeSearch]]/[[dbscan]] runs it inside
    * the whole-stage loop instead of an interpreted lambda per element
    * (sim_dbscan at sf0.1: 57 s → the fold was ~µs per pair). */
  def distSq(a: Column, b: Column): Column =
    column(graft.functions.DistanceSquared(expression(a), expression(b)))

  /** DuckDB SQL mirroring [[dot]] — the SAME left-to-right double fold,
    * so results are bit-identical (no tolerance needed in the oracle). */
  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(list_zip($a, $b),
       |                 s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))),
       |  (x, y) -> x + y)""".stripMargin

  def normSql(a: String): String =
    s"""sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
       |  (x, y) -> x + y))""".stripMargin

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** Exact top-k by cosine against one query vector (broadcast as a
    * literal — no shuffle until the final top-k sort, which AQE executes
    * as a partial top-k per partition + merge). */
  def bruteForceTopK(emb: DataFrame, vecCol: String, idCol: String,
                     query: Array[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    emb.select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Squared Euclidean distance as the same left-to-right double fold
    * shape as [[dotFold]] — [[distSqSql]] is its DuckDB mirror, so
    * distances are bit-identical across engines. */
  private[graft] def distSqFold(a: Column, b: Column): Column =
    aggregate(zip_with(dbl(a), dbl(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** DuckDB mirror of [[distSqFold]] (same fold, same order). */
  def distSqSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(list_zip($a, $b),
       |                 s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)) *
       |                      (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)))),
       |  (x, y) -> x + y)""".stripMargin

  /**
   * EXACT radius (range) search with triangle-inequality cell pruning
   * — the epsilon-neighborhood primitive under radius dedup, density
   * estimation, and DBSCAN-style clustering. Unlike [[ivfSearch]]
   * (which trades recall for probe volume), this stays EXACT: every
   * item within Euclidean `maxDist` of a query is returned, yet whole
   * cells are skipped using the ball-tree bound — a member x of cell c
   * with d(q,x) ≤ τ forces d(q,c) ≤ d(q,x) + d(x,c) ≤ τ + r_c, so a
   * cell with d(q,c) > τ + r_c cannot contain an answer. Per-cell
   * radii come from the assignment aggregate; the gate carries a 1e-9
   * slack so float rounding can only ADMIT extra cells (re-verified
   * exactly), never drop a true answer.
   *
   * Scale: centroids/radii broadcast; candidate generation is the
   * pruned cell equi-join against the centroid-partitioned assignment
   * (same layout as [[ivfSearch]]'s production shape); the exact
   * `dist² ≤ τ²` verification runs in whole-stage codegen on the
   * surviving candidates. Queries are members of `emb` by id.
   * Output: `(query_id, item_id, dist)` — equals brute force exactly.
   */
  def rangeSearch(emb: DataFrame, queryIds: DataFrame, vecCol: String, idCol: String,
                  centroids: DataFrame, cVecCol: String, cIdCol: String,
                  maxDist: Double): DataFrame = {
    // Nearest-cell assignment is a min_by AGGREGATE over the k-expanded
    // emb×centroids frame, not a row_number window: the aggregate gets
    // map-side combine and no sort, where the window was a sort-based
    // shuffle of k× the corpus. Ties break to the smaller centroid id
    // via the (d2, cId) ordering struct — same semantics, cheaper.
    val joined = emb.crossJoin(broadcast(centroids))
      .withColumn("d2", distSq(col(vecCol), col(cVecCol)))
    val assigned = joined.groupBy(col(idCol).as("item_id"))
      .agg(min_by(
        struct(col(cIdCol).as("centroid_id"), col(vecCol).as("item_vec"),
          sqrt(col("d2")).as("dc")),
        struct(col("d2"), col(cIdCol))).as("__a"))
      .select(col("item_id"), col("__a.centroid_id"), col("__a.item_vec"),
        col("__a.dc"))
    val radii = assigned.groupBy(col("centroid_id")).agg(max(col("dc")).as("radius"))
    val qcells = emb.join(queryIds.select(col(idCol)), Seq(idCol), "left_semi")
      .crossJoin(broadcast(centroids))
      .withColumn("dqc", sqrt(distSq(col(vecCol), col(cVecCol))))
      .join(broadcast(radii), col(cIdCol) === col("centroid_id"))
      .filter(col("dqc") <= lit(maxDist) + col("radius") + lit(1e-9))
      .select(col(idCol).as("query_id"), col("centroid_id"), col(vecCol).as("query_vec"))
    qcells.join(assigned.select(col("centroid_id"), col("item_id"), col("item_vec")),
        Seq("centroid_id"))
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("dist_sq", distSq(col("query_vec"), col("item_vec")))
      .filter(col("dist_sq") <= lit(maxDist * maxDist))
      .select(col("query_id"), col("item_id"), sqrt(col("dist_sq")).as("dist"))
  }

  /**
   * Int8 scalar quantization — the memory-bandwidth scale path for
   * similarity search. Each vector is mapped to `round(x / scale)`
   * with per-vector `scale = max(|x|) / 127`, so every component lands
   * in [-127, 127]. At 100 TB this is the difference between shipping
   * 4-byte floats and 1-byte codes through every shuffle and scan
   * (4-8× less IO); candidate scoring then runs on EXACT int64
   * arithmetic ([[quantizedDot]]), with a float rerank only on the
   * shortlist. All-zero vectors quantize to all-zero codes.
   *
   * Pure projections (no shuffle, whole-stage codegen). The SQL
   * mirrors replay the identical double arithmetic, so quantized codes
   * and integer dots are oracle-hashable with zero tolerance.
   */
  def quantScale(vec: Column): Column =
    array_max(transform(dbl(vec), x => abs(x))) / lit(127.0)

  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(dbl(vec), x =>
      when(scale === 0.0, lit(0L)).otherwise(round(x / scale).cast(LongType)))

  /** Fused scale+quantize as ONE compiled kernel
    * ([[graft.functions.Int8Encode]]) — bit-identical to
    * `quantizeInt8(vec, quantScale(vec))` (SimilaritySpec parity test)
    * but runs as a single static call inside the whole-stage loop
    * instead of two interpreted HOF transforms per row. Use this form
    * in queries; the HOF pair above is the executable spec. */
  def int8Codes(vec: Column): Column =
    column(graft.functions.Int8Encode(expression(vec)))

  /** Higher-order-fold formulations of the int8 kernels — the
    * executable specification: SimilaritySpec asserts the native
    * expressions below are bit-identical. */
  private[graft] def quantizedDotFold(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  private[graft] def quantizedCosineFold(qa: Column, qb: Column): Column = {
    val na = aggregate(qa, lit(0L), (acc, x) => acc + x * x)
    val nb = aggregate(qb, lit(0L), (acc, x) => acc + x * x)
    when(na === 0L || nb === 0L, lit(0.0)).otherwise(
      quantizedDotFold(qa, qb).cast(DoubleType) /
        (sqrt(na.cast(DoubleType)) * sqrt(nb.cast(DoubleType))))
  }

  /** Exact int64 dot product of two quantized code vectors — native
    * codegen'd ([[graft.functions.Int8DotProduct]]); the int8 point is
    * cheap scoring, so the hot loop must be compiled, not interpreted. */
  def quantizedDot(qa: Column, qb: Column): Column =
    column(graft.functions.Int8DotProduct(expression(qa), expression(qb)))

  /** Cosine estimate from quantized codes alone: the per-vector scales
    * cancel algebraically (num = ab·sa·sb, denom = √aa·sa·√bb·sb), so
    * only the int64 code arrays are needed. Zero-norm (all-zero)
    * vectors return 0.0 instead of NaN — safe for quantized all-zero
    * inputs. Native codegen'd
    * ([[graft.functions.Int8CosineSimilarity]]). */
  def quantizedCosine(qa: Column, qb: Column): Column =
    column(graft.functions.Int8CosineSimilarity(expression(qa), expression(qb)))

  def quantScaleSql(a: String): String =
    s"(list_max(list_transform($a, v -> abs(CAST(v AS DOUBLE)))) / 127.0)"

  def quantizeInt8Sql(a: String, scale: String): String =
    s"""list_transform($a, v -> CASE WHEN $scale = 0 THEN CAST(0 AS BIGINT)
       |  ELSE CAST(round(CAST(v AS DOUBLE) / $scale) AS BIGINT) END)""".stripMargin

  def quantizedDotSql(qa: String, qb: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(list_zip($qa, $qb), s -> s[1] * s[2])),
       |  (x, y) -> x + y)""".stripMargin

  private def quantizedNormSqSql(q: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform($q, v -> v * v)), (x, y) -> x + y)""".stripMargin

  /** DuckDB mirror of [[quantizedCosine]]: the same exact-integer sums
    * (each ≤ 2⁵³, so exactly representable as doubles) through the same
    * sqrt/divide — bit-identical, zero tolerance. */
  def quantizedCosineSql(qa: String, qb: String): String =
    s"""(CASE WHEN ${quantizedNormSqSql(qa)} = 0 OR ${quantizedNormSqSql(qb)} = 0 THEN 0.0
       |  ELSE CAST(${quantizedDotSql(qa, qb)} AS DOUBLE) /
       |       (sqrt(CAST(${quantizedNormSqSql(qa)} AS DOUBLE)) *
       |        sqrt(CAST(${quantizedNormSqSql(qb)} AS DOUBLE))) END)""".stripMargin

  /** IVF building block: assign every vector to its nearest centroid
    * (centroids broadcast). Ties broken by centroid id. At scale the
    * output is written `partitionBy(centroid_id)` so probes prune. */
  def ivfAssign(emb: DataFrame, vecCol: String, idCol: String,
                centroids: DataFrame, cVecCol: String, cIdCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = emb.crossJoin(broadcast(centroids))
      .withColumn("cosine", cosine(col(vecCol), col(cVecCol)))
    val w = Window.partitionBy(col(idCol)).orderBy(col("cosine").desc, col(cIdCol))
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col(cIdCol).as("centroid_id"), col("cosine"))
  }

  /** IVF probe: answer top-k by ranking only the inverted lists of
    * each query's `nprobe` nearest centroids — the probe touches
    * ~nprobe × corpus/num_centroids vectors instead of the whole
    * table. At scale the assigned corpus is written
    * `partitionBy(centroid_id)` and the equi-join on centroid_id
    * becomes a partition-pruned scan. Recall is bounded by cell
    * boundaries; raising nprobe trades scan volume back for recall
    * (the standard IVF knob). Items live in exactly one cell, so a
    * query probing several cells still sees each item at most once —
    * no dedup needed. Queries must be members of `emb` (by id). */
  def ivfSearch(emb: DataFrame, queryIds: DataFrame, vecCol: String, idCol: String,
                centroids: DataFrame, cVecCol: String, cIdCol: String, k: Int,
                nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = emb.crossJoin(broadcast(centroids))
      .withColumn("cosine", cosine(col(vecCol), col(cVecCol)))
    val wAssign = Window.partitionBy(col(idCol)).orderBy(col("cosine").desc, col(cIdCol))
    // Both `items` and `qcells` consume this plan, so the broadcast-
    // scoring + ranking window executes twice per search. Deliberately
    // NOT persisted here: a persist inside a lazy builder has no
    // unpersist point and leaks one cache entry per invocation
    // (measured: no steady-state win at sf0.1 — both branches share
    // the scan and broadcast). Callers running repeated searches
    // should materialize the ASSIGNMENT once instead — write it
    // partitionBy(centroid_id) (see scaladoc above) and pass the
    // saved table; that is the production shape, not a session cache.
    val ranked = scored.withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") <= math.max(1, nprobe))
    val items = ranked.filter(col("arn") === 1)
      .select(col(cIdCol).as("centroid_id"), col(idCol).as("item_id"), col(vecCol).as("item_vec"))
    val qcells = ranked.filter(col("arn") <= nprobe)
      .join(queryIds.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as("query_id"), col(cIdCol).as("centroid_id"), col(vecCol).as("query_vec"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("item_id"))
    qcells.join(items, Seq("centroid_id"))
      .where(col("query_id") =!= col("item_id"))
      .withColumn("cosine", cosine(col("query_vec"), col("item_vec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("item_id"), col("cosine"), col("rn"))
  }

  /** Deterministic random hyperplanes: `planes(p)(d)` from a fixed seed. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit LSH signature: bit p = (v · plane_p) > 0. */
  def lshSignature(vecCol: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(dot(vecCol, array(p.map(lit): _*)) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN: candidates = same-signature vectors, ranked by true
    * cosine within the bucket. Returns top-k per query id from the
    * `queries` side (equi-join on bucket — no cross product). */
  def lshTopK(emb: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
              planes: Array[Array[Double]], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sig = lshSignature(col(vecCol), planes)
    val base = emb.withColumn("bucket", sig)
      .select(col("bucket"), col(idCol).as("item_id"), col(vecCol).as("item_vec"))
    val qs = queries.withColumn("bucket", sig)
      .select(col("bucket"), col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("item_id"))
    qs.join(base, Seq("bucket"))
      .where(col("query_id") =!= col("item_id"))
      .withColumn("cosine", cosine(col("query_vec"), col("item_vec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("item_id"), col("cosine"), col("rn"))
  }

  /**
   * Distributed Lloyd's k-means over an embedding column, built from
   * [[ivfAssign]]: assign → element-wise mean per cluster → repeat.
   * The mean runs as posexplode + (cluster, position) grouped AVG —
   * fully distributed, no vector ever on the driver; the driver loop
   * holds only the iteration counter. Initial centroids = the first k
   * vectors by id (deterministic). Empty clusters keep their previous
   * centroid. This is the "train" half of the IVF index; at 100 TB run
   * it on a sample, then one final [[ivfAssign]] pass over everything.
   */
  def kmeans(emb: DataFrame, vecCol: String, idCol: String,
             k: Int, iterations: Int): DataFrame = {
    var centroids = emb.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
    (1 to iterations).foreach { _ =>
      val assigned = ivfAssign(emb, vecCol, idCol, centroids, "c_vec", "c_id")
        .select(col(idCol), col("centroid_id"))
        .join(emb.select(col(idCol), col(vecCol)), Seq(idCol))
      val means = assigned
        .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id").as("c_id"),
          expr("transform(pm, x -> CAST(x.m AS FLOAT))").as("c_vec"))
      // empty clusters keep their previous centroid
      val next = means.unionByName(
        centroids.join(means.select(col("c_id")), Seq("c_id"), "left_anti"))
      next.cache().count() // materialize before dropping the parent cache
      if (centroids.storageLevel.useMemory) centroids.unpersist()
      centroids = next
    }
    centroids
  }

  /**
   * One k-means M-step as EXACT integer sufficient statistics: assign
   * every vector to its nearest centroid ([[ivfAssign]]), then reduce
   * each cluster to `(dim-wise Σ quantized component, member count)` —
   * the `(S_k, n_k)` pair from which the new centroid is `S_k / n_k`.
   * Output: one row per (centroid_id, dim): `(centroid_id, dim, sum_q,
   * n)`.
   *
   * Why sufficient statistics instead of AVG (the [[kmeans]] loop's
   * form): integer sums are associative and order-independent, so the
   * M-step is (a) oracle-hashable bit-for-bit with zero tolerance, and
   * (b) MERGEABLE — stats from two corpus shards (or two days of
   * ingest) combine by addition without touching the raw vectors,
   * which is how a 100 TB training loop actually updates centroids:
   * each partition emits partial (Σ, n), one narrow shuffle on
   * (centroid_id, dim) combines them. Components ride as int8 codes
   * ([[int8Codes]]) — 1 byte per dim through the explode instead of 4.
   *
   * Scale shape: broadcast centroids → assignment window keyed on the
   * vector id → posexplode (pure projection) → ONE keyed aggregate on
   * (centroid_id, dim) with map-side partials; output cardinality is
   * k × dim, independent of corpus size.
   */
  def kmeansMStepStats(emb: DataFrame, vecCol: String, idCol: String,
                       centroids: DataFrame, cVecCol: String, cIdCol: String): DataFrame = {
    val assigned = ivfAssign(emb, vecCol, idCol, centroids, cVecCol, cIdCol)
      .select(col(idCol), col("centroid_id"))
    val codes = emb.select(col(idCol), int8Codes(col(vecCol)).as("__qv"))
    mStepStats(assigned, codes, idCol)
  }

  /** The M-step reduce shared by [[kmeansMStepStats]] (one shot) and
    * [[kmeansFit]] (the loop): `(centroid_id, dim) → (Σq, n)` from an
    * assignment table and the int8 code table. */
  private def mStepStats(assigned: DataFrame, codes: DataFrame, idCol: String): DataFrame =
    assigned.join(codes, Seq(idCol))
      .select(col("centroid_id"), posexplode(col("__qv")).as(Seq("dim", "q")))
      .groupBy(col("centroid_id"), col("dim"))
      .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n"))

  /**
   * The FULL distributed k-means training loop the M-step statistics
   * were built for: E-step = broadcast-centroid assignment
   * ([[ivfAssign]]), M-step = the mergeable `(Σq, n)` integer reduce
   * ([[kmeansMStepStats]]'s shape — at 100 TB each corpus shard emits
   * partial stats and one narrow shuffle on (centroid_id, dim) adds
   * them), new centroid component = `Σq / n` (one double division,
   * rounded once to FLOAT — deterministic IEEE in every engine).
   * Because members ride as int8 codes, each member contributes
   * L∞-normalized direction (per-vector scale ≈ max|v|/127), making
   * the mean a spherical-k-means-style direction mean — the right
   * update under cosine assignment, where magnitude is meaningless.
   *
   * Convergence is the standard exact stop: ZERO reassignments in a
   * round (an integer count — deterministic, no floating-point
   * tolerance), or `maxIter`. Convergence implies fixed point:
   * centroids are a pure function of the assignment, so once the
   * assignment repeats, every later round repeats it — which is why an
   * oracle that unrolls exactly `maxIter` rounds lands on the same
   * final assignment the early-stopped loop returns (sim_kmeans_fit
   * hashes this). Empty clusters keep their previous centroid (the
   * [[kmeans]] rule). Initial centroids: the first `k` vectors by id —
   * deterministic.
   *
   * Per round: one broadcast cross + id-keyed ranking window (E), one
   * explode + keyed integer aggregate (M), one id-keyed equi-join for
   * the reassignment count (the bounded convergence scalar, the
   * pageRankConverged pattern). Assignments are localCheckpoint'ed so
   * lineage stays flat; codes are materialized once for all rounds.
   * Returns `(centroids (c_id, c_vec), assignment (idCol,
   * centroid_id), roundsRun)`.
   */
  def kmeansFit(emb: DataFrame, vecCol: String, idCol: String,
                k: Int, maxIter: Int): (DataFrame, DataFrame, Int) = {
    require(k >= 1, s"kmeansFit: k must be >= 1, got $k")
    require(maxIter >= 1, s"kmeansFit: maxIter must be >= 1, got $maxIter")
    val codes = emb.select(col(idCol), int8Codes(col(vecCol)).as("__qv"))
      .localCheckpoint()
    var cents = emb.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
    var assigned = ivfAssign(emb, vecCol, idCol, cents, "c_vec", "c_id")
      .select(col(idCol), col("centroid_id")).localCheckpoint()
    var rounds = 0
    var moved = Long.MaxValue
    while (rounds < maxIter && moved > 0) {
      val means = mStepStats(assigned, codes, idCol)
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("dim"),
          (col("sum_q").cast(DoubleType) / col("n").cast(DoubleType)).as("m")))).as("dm"))
        .select(col("centroid_id").as("c_id"),
          expr("transform(dm, x -> CAST(x.m AS FLOAT))").as("c_vec"))
      // empty clusters keep their previous centroid (the kmeans rule)
      val next = means.unionByName(
        cents.join(means.select(col("c_id")), Seq("c_id"), "left_anti"))
      val reassigned = ivfAssign(emb, vecCol, idCol, next, "c_vec", "c_id")
        .select(col(idCol), col("centroid_id")).localCheckpoint()
      // the reassignment count only feeds the while-condition — on the
      // LAST permitted round the loop exits either way, so the
      // join+count job is skipped (pqCodebook runs maxIter=1 fits per
      // subspace; this is its whole convergence-probe cost)
      moved =
        if (rounds + 1 < maxIter) reassigned
          .join(assigned.withColumnRenamed("centroid_id", "__prev"), Seq(idCol))
          .filter(col("centroid_id") =!= col("__prev")).count()
        else 0L
      cents = next
      assigned = reassigned
      rounds += 1
    }
    (cents, assigned, rounds)
  }

  /**
   * SemDeDup-style semantic deduplication: vectors are clustered to
   * their nearest centroid, near-duplicate pairs are discovered ONLY
   * within a cell (equi-join on centroid_id — never all-pairs), and a
   * vector dominated by a smaller-id cell-mate at cosine ≥ `minCosine`
   * is dropped (deterministic keep-smallest-id policy, the greedy
   * one-representative-per-ε-group rule). Returns `(idCol,
   * centroid_id)` of the survivors.
   *
   * Scale shape: the centroid set is the broadcast side; the only wide
   * operations are the assignment window (keyed on the vector id) and
   * the within-cell self-join (keyed on centroid_id). With the assigned
   * corpus written `partitionBy(centroid_id)`, each cell's pair join is
   * partition-local; cells bound the candidate blowup the way LSH bands
   * do for MinHash. Train centroids with [[kmeans]] on a sample.
   */
  def semanticDedup(emb: DataFrame, vecCol: String, idCol: String,
                    centroids: DataFrame, cVecCol: String, cIdCol: String,
                    minCosine: Double): DataFrame = {
    val cells = ivfAssign(emb, vecCol, idCol, centroids, cVecCol, cIdCol)
      .select(col(idCol), col("centroid_id"))
      .join(emb.select(col(idCol), col(vecCol)), Seq(idCol))
    val a = cells.select(col("centroid_id"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = cells.select(col("centroid_id"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    val dominated = a.join(b, Seq("centroid_id"))
      .where(col("id_a") < col("id_b"))
      .filter(cosine(col("vec_a"), col("vec_b")) >= minCosine)
      .select(col("id_b").as(idCol)).distinct()
    cells.select(col(idCol), col("centroid_id"))
      .join(dominated, Seq(idCol), "left_anti")
  }

  /**
   * INCREMENTAL SemDeDup — the continuous-ingestion form of
   * [[semanticDedup]]: admit only the `batch` vectors that are not
   * semantically dominated (cosine ≥ `minCosine`, same cell) by the
   * already-committed `corpus` or by a SMALLER-ID batch member. The
   * committed corpus is never re-deduped against itself.
   *
   * Scale shape (why a daily batch costs the batch): the batch assigns
   * against broadcast centroids; the corpus side is SEMI-JOINED down
   * to the batch's touched cells before any pairing, so the corpus
   * contributes only those cells' vectors — at 100 TB with stored
   * per-cell assignments ([[semanticDedup]]'s `partitionBy(centroid_
   * id)` layout) that read is partition-pruned, and the pair join is
   * batch × cell-density, never corpus². Ids must be globally unique
   * across corpus and batch (the committed set wins ties by
   * construction — it is already admitted).
   */
  def semanticDedupIncremental(corpus: DataFrame, batch: DataFrame,
                               vecCol: String, idCol: String,
                               centroids: DataFrame, cVecCol: String, cIdCol: String,
                               minCosine: Double): DataFrame = {
    val bCells = ivfAssign(batch, vecCol, idCol, centroids, cVecCol, cIdCol)
      .select(col(idCol), col("centroid_id"))
      .join(batch.select(col(idCol), col(vecCol)), Seq(idCol))
    val touched = bCells.select(col("centroid_id")).distinct()
    val cCells = ivfAssign(corpus, vecCol, idCol, centroids, cVecCol, cIdCol)
      .select(col(idCol), col("centroid_id"))
      .join(broadcast(touched), Seq("centroid_id"), "left_semi")
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
    val b = bCells.select(col("centroid_id"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    val byCorpus = cCells
      .select(col("centroid_id"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
      .join(b, Seq("centroid_id"))
      .filter(cosine(col("vec_a"), col("vec_b")) >= minCosine)
      .select(col("id_b").as(idCol))
    val byBatch = bCells
      .select(col("centroid_id"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
      .join(b, Seq("centroid_id"))
      .where(col("id_a") < col("id_b"))
      .filter(cosine(col("vec_a"), col("vec_b")) >= minCosine)
      .select(col("id_b").as(idCol))
    bCells.select(col(idCol), col("centroid_id"))
      .join(byCorpus.unionByName(byBatch).distinct(), Seq(idCol), "left_anti")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold among
    * same-LSH-bucket candidates (the embedding analogue of MinHash). */
  def embeddingNearDupPairs(emb: DataFrame, vecCol: String, idCol: String,
                            planes: Array[Array[Double]], minCosine: Double): DataFrame = {
    val withSig = emb.withColumn("bucket", lshSignature(col(vecCol), planes))
    val a = withSig.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = withSig.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  // ── Product quantization (PQ) ──────────────────────────────────────

  /** Every vector exploded into its m subspace slices:
    * `(idCol, sub_id, __sv)` — ONE projection, so every PQ stage
    * processes ALL subspaces in the same jobs (no per-subspace driver
    * loop; at 100 TB the m codebooks train in one pass per round). */
  private def pqSliced(df: DataFrame, vecCol: String, idCol: String,
                       m: Int, sub: Int): DataFrame =
    df.select(col(idCol), posexplode(transform(sequence(lit(0), lit(m - 1)),
      j => slice(col(vecCol), j * lit(sub) + lit(1), lit(sub)))).as(Seq("sub_id", "__sv")))

  /** Nearest codebook centroid per (vector, subspace) — [[ivfAssign]]'s
    * exact ranking (cosine DESC, c_id) run for all subspaces at once
    * (the tiny codebook broadcasts; one window per (sub_id, id)). */
  private def pqAssign(sliced: DataFrame, codebook: DataFrame,
                       idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    sliced.join(broadcast(codebook), Seq("sub_id"))
      .withColumn("__cos", cosine(col("__sv"), col("c_vec")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("sub_id"), col(idCol))
          .orderBy(col("__cos").desc, col("c_id"))))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("sub_id"), col("c_id").as("code"))
  }

  /** PQ codebook: split the `dim`-dim vector into `m` contiguous
    * subspaces and k-means each — same deterministic init (first k
    * vectors by id), int8-stat M-step, and cosine assignment as
    * [[kmeansFit]], but trained for ALL subspaces in the same jobs: the
    * slice-exploded frame assigns in one pass, the M-step is one keyed
    * `(sub_id, code, dim)` integer aggregate, empty clusters carry.
    * Returns `(sub_id, c_id, c_vec)`, m·k rows — the whole codebook
    * broadcasts at any corpus size. PQ is how billion-vector indexes
    * (FAISS IVFPQ) hold the corpus in memory: m bytes per vector
    * instead of 4·dim. */
  def pqCodebook(emb: DataFrame, vecCol: String, idCol: String,
                 m: Int, dim: Int, k: Int, maxIter: Int = 1): DataFrame = {
    require(m >= 1 && dim % m == 0, s"pqCodebook: m=$m must divide dim=$dim")
    require(k >= 1 && maxIter >= 1, s"pqCodebook: bad (k=$k, maxIter=$maxIter)")
    val sub = dim / m
    val sliced = pqSliced(emb, vecCol, idCol, m, sub).localCheckpoint()
    // init = the first k vectors by id (kmeansFit's rule) — k scalars,
    // the bounded driver read every watermark-style scalar uses
    val initIds = emb.select(col(idCol)).orderBy(col(idCol)).limit(k)
      .collect().map(_.get(0))
    var cents = sliced.filter(col(idCol).isin(initIds: _*))
      .select(col("sub_id"), col(idCol).as("c_id"), col("__sv").as("c_vec"))
    val codes = sliced.select(col(idCol), col("sub_id"),
      int8Codes(col("__sv")).as("__qv"))
    (1 to maxIter).foreach { _ =>
      val a = pqAssign(sliced, cents, idCol)
      val means = a.join(codes, Seq(idCol, "sub_id"))
        .select(col("sub_id"), col("code"), posexplode(col("__qv")).as(Seq("dim", "q")))
        .groupBy(col("sub_id"), col("code"), col("dim"))
        .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n"))
        .groupBy(col("sub_id"), col("code"))
        .agg(array_sort(collect_list(struct(col("dim"),
          (col("sum_q").cast(DoubleType) / col("n").cast(DoubleType)).as("m")))).as("dm"))
        .select(col("sub_id"), col("code").as("c_id"),
          expr("transform(dm, x -> CAST(x.m AS FLOAT))").as("c_vec"))
      cents = means.unionByName(
        cents.join(means.select(col("sub_id"), col("c_id")),
          Seq("sub_id", "c_id"), "left_anti"))
        .localCheckpoint()
    }
    cents
  }

  /** PQ encoding: each vector → m small codes, the nearest codebook
    * centroid per subspace — ONE assignment job for all subspaces.
    * Returns `(idCol, sub_id, code)`, the m-bytes-per-vector
    * compressed corpus. */
  def pqEncode(emb: DataFrame, vecCol: String, idCol: String,
               codebook: DataFrame, m: Int, dim: Int): DataFrame =
    pqAssign(pqSliced(emb, vecCol, idCol, m, dim / m), codebook, idCol)

  /** ADC top-k (asymmetric distance computation, inner-product form):
    * score(q, x) ≈ Σⱼ ⟨q's j-th slice, codebook[j][codeⱼ(x)]⟩ — the
    * query stays full-precision, the corpus is its codes. Per query
    * the m·k lookup table is computed ONCE and broadcast; scoring a
    * vector is m table lookups + an integer add, never a float dot
    * against the corpus. Determinism: each LUT cell floor-scales to
    * integer micro-points, so the per-vector sum is exact BIGINT
    * arithmetic (order-independent); ties break to the smaller id via
    * [[Ranking.topKBy]]'s bounded heap. Returns
    * `(q_id, rank, vec_id, score_pts)`. */
  def pqAdcTopK(codes: DataFrame, idCol: String, codebook: DataFrame,
                queries: DataFrame, qIdCol: String, vecCol: String,
                m: Int, dim: Int, k: Int): DataFrame = {
    val sub = dim / m
    val lut = pqSliced(queries, vecCol, qIdCol, m, sub)
      .join(broadcast(codebook), Seq("sub_id"))
      .select(col(qIdCol), col("sub_id"), col("c_id").as("code"),
        floor(dot(col("__sv"), col("c_vec")) * lit(1e6)).cast(LongType).as("pts"))
    codes.join(broadcast(lut), Seq("sub_id", "code"))
      .groupBy(col(qIdCol), col(idCol))
      .agg(sum("pts").as("score_pts"))
      .groupBy(col(qIdCol))
      .agg(Ranking.topKBy(col("score_pts"), col(idCol), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")))
      .select(col(qIdCol), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as(idCol), col("col.score").cast(LongType).as("score_pts"))
  }

  /** IVF+PQ search — the full FAISS-IVFPQ composition
    * (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011): the coarse quantizer prunes candidates to
    * the query's `nprobe` cells, PQ-ADC scores only those candidates
    * via the broadcast per-query lookup table. Cost per query is
    * ~nprobe/|cells| of the corpus × m integer lookups — BOTH axes of
    * the billion-vector recipe at once (cell pruning bounds the scan,
    * m-byte codes bound the memory). At scale the encoded corpus is
    * written `partitionBy(cell)` so the probe join partition-prunes;
    * everything after the coarse ranking is equi-joins and one keyed
    * integer aggregate. Determinism matches [[pqAdcTopK]]: micro-point
    * BIGINT scores, ties to the smaller id. Queries must be members of
    * `emb` (by id); self-matches are excluded like [[ivfSearch]].
    * Returns `(q_id, rank, idCol, score_pts)`. */
  def ivfPqSearch(emb: DataFrame, queryIds: DataFrame, vecCol: String, idCol: String,
                  coarse: DataFrame, cVecCol: String, cIdCol: String,
                  codebook: DataFrame, m: Int, dim: Int, k: Int,
                  nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sub = dim / m
    val scored = emb.crossJoin(broadcast(coarse))
      .withColumn("__ccos", cosine(col(vecCol), col(cVecCol)))
    val wA = Window.partitionBy(col(idCol)).orderBy(col("__ccos").desc, col(cIdCol))
    val ranked = scored.withColumn("arn", row_number().over(wA))
      .filter(col("arn") <= math.max(1, nprobe))
    val cells = ranked.filter(col("arn") === 1)
      .select(col(idCol), col(cIdCol).as("__cell"))
    val qcells = ranked.filter(col("arn") <= nprobe)
      .join(queryIds.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as("__q"), col(cIdCol).as("__cell"))
    val codes = pqEncode(emb, vecCol, idCol, codebook, m, dim)
      .join(cells, Seq(idCol))
    val queries = emb.join(queryIds.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as("__q"), col(vecCol))
    val lut = pqSliced(queries, vecCol, "__q", m, sub)
      .join(broadcast(codebook), Seq("sub_id"))
      .select(col("__q"), col("sub_id"), col("c_id").as("code"),
        floor(dot(col("__sv"), col("c_vec")) * lit(1e6)).cast(LongType).as("pts"))
    codes.join(broadcast(qcells), Seq("__cell"))
      .filter(col(idCol) =!= col("__q"))
      .join(broadcast(lut), Seq("__q", "sub_id", "code"))
      .groupBy(col("__q"), col(idCol))
      .agg(sum("pts").as("score_pts"))
      .groupBy(col("__q"))
      .agg(Ranking.topKBy(col("score_pts"), col(idCol), k).as("__top"))
      .select(col("__q").as("q_id"), posexplode(col("__top")))
      .select(col("q_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as(idCol), col("col.score").cast(LongType).as("score_pts"))
  }

  /**
   * NN-DESCENT k-NN graph construction (Dong, Charikar & Li, WWW'11) —
   * the GRAPH-BASED index family next to IVF (cell probe) and PQ
   * (code compression): the k-NN graph is the build artifact behind
   * HNSW/NSG-style search and is itself the "similar items" relation
   * recommendation and near-dup triage read directly.
   *
   * The principle: *a neighbor of a neighbor is likely a neighbor.*
   *  - INIT: deterministic bucket joins — each id hashes (md5, the
   *    engine-portable Sampling convention) into one of `buckets`
   *    cells, under `initHashes` INDEPENDENT seeded hashings whose
   *    within-cell k-NN lists union into the seed graph. One hashing
   *    is not enough: a single partitioning is transitively closed
   *    (co-neighbor candidates stay inside the cell, so the within-
   *    cell top-k is already the fixed point and refinement is a
   *    no-op — caught by the recall spec); overlapping cells from
   *    independent hashes connect the seed graph the way NN-descent's
   *    random init does, with no RNG state: re-runs, any
   *    partitioning, and the DuckDB oracle produce the same start.
   *  - ROUND (×`rounds`): symmetrize the current lists (forward ∪
   *    reverse = each node's "general" neighborhood), generate every
   *    pair that CO-OCCURS in some neighborhood (join on the shared
   *    pivot), score the new pairs, and re-select each node's k best
   *    from old ∪ new. Lists only improve (the new list is a top-k of
   *    a superset of the old one) — SimilaritySpec pins the monotone
   *    k-th-distance invariant and measures recall against brute
   *    force.
   *
   * Scale shape: per-round work is Σ_v C(deg_v, 2) ≤ N·C(2k,2)
   * distance evaluations — linear in N for fixed k, never all-pairs;
   * the joins key on node id / pivot id (plain hash shuffles); the
   * k-selection is the bounded-state mergeable [[Ranking.topKBy]]
   * aggregate (k structs per node, map-side combined), not a window
   * sort; per-round lineage is cut. Distances ride the bit-portable
   * double fold ([[distSqFold]]), so the whole schedule — including
   * tie-breaks (d², then smaller id) — replays exactly in the oracle
   * ([[nnDescentSql]] unrolls the same rounds).
   *
   * A node whose bucket is a singleton emits no initial list but
   * still enters others' lists via reverse edges in later rounds; a
   * node with no edges after all rounds is absent from the output
   * (documented, matches the mirror). Output:
   * `(vec_id, rank, nbr_id, dist)` — rank 1..≤k by (dist, nbr_id).
   */
  def nnDescent(emb: DataFrame, idCol: String, vecCol: String,
                k: Int, rounds: Int, buckets: Int, initHashes: Int = 2): DataFrame = {
    require(k >= 1 && k <= 64, s"nnDescent: k in [1, 64], got $k")
    require(rounds >= 0 && rounds <= 8, s"nnDescent: rounds in [0, 8], got $rounds")
    require(buckets >= 1, s"nnDescent: buckets must be >= 1, got $buckets")
    require(initHashes >= 1 && initHashes <= 8,
      s"nnDescent: initHashes in [1, 8], got $initHashes")
    val e = emb.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .localCheckpoint() // joined once per round per side — cut the source plan
    def topK(pairs: DataFrame): DataFrame = pairs
      .groupBy("src")
      .agg(Ranking.topKBy(-col("d2"), col("dst"), k).as("__t"))
      .select(col("src"), explode(col("__t")).as("__s"))
      .select(col("src"), col("__s.id").as("dst"), (-col("__s.score")).as("d2"))
    val initPairs = (0 until initHashes).map { h =>
      val withB = e.withColumn("b",
        expr(s"CAST(conv(substring(md5(CONCAT('$h:', CAST(id AS STRING))), 1, 8)," +
          s" 16, 10) AS BIGINT) % $buckets"))
      withB.as("a")
        .join(withB.as("c"), col("a.b") === col("c.b") && col("a.id") =!= col("c.id"))
        .select(col("a.id").as("src"), col("c.id").as("dst"),
          distSq(col("a.vec"), col("c.vec")).as("d2"))
    }.reduce(_ unionByName _)
      .groupBy("src", "dst").agg(min("d2").as("d2"))
    var knn = topK(initPairs).localCheckpoint()
    for (_ <- 1 to rounds) {
      val adj = knn
        .unionByName(knn.select(col("dst").as("src"), col("src").as("dst"), col("d2")))
        .groupBy("src", "dst").agg(min("d2").as("d2"))
        .localCheckpoint() // feeds both sides of the pivot join
      // explicit renames, not .as() aliases: both sides of this
      // self-join share attribute ids (adj is one checkpointed frame),
      // and alias-qualified `x.dst < y.dst` silently resolved both to
      // the SAME attribute (a constant-false predicate → empty
      // candidates → every round a no-op; caught by the recall spec)
      val cand = adj.select(col("src").as("__p"), col("dst").as("__n1"))
        .join(adj.select(col("src").as("__p"), col("dst").as("__n2")), "__p")
        .filter(col("__n1") < col("__n2"))
        .select(col("__n1").as("src"), col("__n2").as("dst"))
        .distinct()
      val candD = cand
        .join(e.select(col("id").as("src"), col("vec").as("__va")), "src")
        .join(e.select(col("id").as("dst"), col("vec").as("__vb")), "dst")
        .select(col("src"), col("dst"), distSq(col("__va"), col("__vb")).as("d2"))
      val candBoth = candD.unionByName(
        candD.select(col("dst").as("src"), col("src").as("dst"), col("d2")))
      knn = topK(knn.unionByName(candBoth)
          .groupBy("src", "dst").agg(min("d2").as("d2")))
        .localCheckpoint()
    }
    knn.groupBy("src")
      .agg(Ranking.topKBy(-col("d2"), col("dst"), k).as("__t"))
      .select(col("src"), posexplode(col("__t")))
      .select(col("src").as(idCol), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as("nbr_id"), sqrt(-col("col.score")).as("dist"))
  }

  /** The CTE chain of [[nnDescentSql]] up to its final k-NN table
    * `knn<rounds>` — a `WITH`-clause fragment expecting `e(id, vec)`
    * in scope, composable by consumers that search the built graph
    * ([[graphSearchSql]]).
    *
    * Every CTE is `AS MATERIALIZED`: DuckDB 1.0's heuristic INLINES
    * chained CTEs, and with each round referencing its predecessor 3×
    * the unrolled chain re-evaluates the init join exponentially —
    * measured 17 min → out-of-temp-disk at 2000 vectors, vs 4.2 s
    * materialized. Results are identical; only evaluation is pinned. */
  def nnDescentCtesSql(k: Int, rounds: Int, bucketsSql: String, initHashes: Int = 2,
                       srcRel: String = "e", p: String = ""): String = {
    def topK(src: String, out: String) =
      s"""$out AS MATERIALIZED (SELECT src, dst, d2 FROM (
         |  SELECT src, dst, d2,
         |         row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rn
         |  FROM $src) WHERE rn <= $k)""".stripMargin
    def roundSql(prev: String, r: Int) =
      s"""${p}adj$r AS MATERIALIZED (SELECT src, dst, MIN(d2) AS d2 FROM (
         |    SELECT src, dst, d2 FROM $prev
         |    UNION ALL SELECT dst AS src, src AS dst, d2 FROM $prev)
         |  GROUP BY 1, 2),
         |${p}cand$r AS MATERIALIZED (SELECT DISTINCT x.dst AS src, y.dst AS dst
         |  FROM ${p}adj$r x JOIN ${p}adj$r y ON x.src = y.src AND x.dst < y.dst),
         |${p}candd$r AS MATERIALIZED (SELECT c.src, c.dst, ${distSqSql("ea.vec", "eb.vec")} AS d2
         |  FROM ${p}cand$r c JOIN $srcRel ea ON ea.id = c.src JOIN $srcRel eb ON eb.id = c.dst),
         |${p}all$r AS MATERIALIZED (SELECT src, dst, MIN(d2) AS d2 FROM (
         |    SELECT src, dst, d2 FROM $prev
         |    UNION ALL SELECT src, dst, d2 FROM ${p}candd$r
         |    UNION ALL SELECT dst AS src, src AS dst, d2 FROM ${p}candd$r)
         |  GROUP BY 1, 2),
         |${topK(s"${p}all$r", s"${p}knn$r")}""".stripMargin
    val roundChain = (1 to rounds).map(r => roundSql(s"${p}knn${r - 1}", r)).mkString(",\n")
    val hashCtes = (0 until initHashes).map { h =>
      s"""${p}b$h AS MATERIALIZED (SELECT id, vec,
         |    CAST(('0x' || substr(md5('$h:' || CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % $bucketsSql AS b
         |  FROM $srcRel),
         |${p}p$h AS MATERIALIZED (SELECT a.id AS src, c.id AS dst,
         |    ${distSqSql("a.vec", "c.vec")} AS d2
         |  FROM ${p}b$h a JOIN ${p}b$h c ON a.b = c.b AND a.id <> c.id)""".stripMargin
    }.mkString(",\n")
    val unionInit = (0 until initHashes)
      .map(h => s"SELECT src, dst, d2 FROM ${p}p$h").mkString(" UNION ALL ")
    s"""$hashCtes,
       |${p}init_pairs AS MATERIALIZED (SELECT src, dst, MIN(d2) AS d2 FROM (
       |    $unionInit) GROUP BY 1, 2),
       |${topK(s"${p}init_pairs", s"${p}knn0")}${if (rounds > 0) ",\n" + roundChain else ""}""".stripMargin
  }

  /** DuckDB mirror of [[nnDescent]] over CTE `e(id, vec)` — the same
    * seeded md5 buckets, the same unrolled rounds, the same (d², id)
    * tie-break via `row_number` (order-equivalent to the top-k heap). */
  def nnDescentSql(k: Int, rounds: Int, bucketsSql: String, initHashes: Int = 2): String =
    s"""${nnDescentCtesSql(k, rounds, bucketsSql, initHashes)}
       |SELECT src AS vec_id, CAST(rn AS BIGINT) AS rank, dst AS nbr_id,
       |       sqrt(d2) AS dist
       |FROM (SELECT src, dst, d2,
       |        row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rn
       |      FROM knn$rounds)
       |ORDER BY vec_id, rank""".stripMargin

  /**
   * BEAM SEARCH over a k-NN graph — the query half of graph-based ANN
   * (the [[nnDescent]] build's consumer; HNSW/NSG answer queries this
   * way): start every query at a fixed entry node, repeatedly expand
   * the current beam's graph neighbors, score them against the query,
   * and keep the `beam` best; after `hops` rounds report the `k`
   * nearest found (the query's own node excluded). The search never
   * scans the corpus — per query it touches ≤ `hops·beam·deg` nodes,
   * the property that makes graph ANN the low-latency family.
   *
   * Deterministic by construction: entries are the `entries` GRAPH
   * nodes with the smallest md5 keys — a BOUNDED uniform sample
   * (graph nodes, not the whole corpus — so results are always graph
   * members even when `emb` carries extra vectors, e.g. a
   * not-yet-inserted batch in [[nnDescentInsert]]; bounded, because a
   * fixed FRACTION of nodes made the init scoring |queries|·N/c —
   * measured 19 of stream_nn_final's 21 s/batch at sf1 before the
   * fix) — MULTIPLE entries, because a
   * converged k-NN graph is near-cluster-pure and a beam from one
   * entry can never cross into a disconnected cluster (caught by the
   * recall spec; HNSW solves this with hierarchy, DiskANN-style
   * multi-start with spread entries — the latter is the declarative
   * fit). Expansion is a set union, scoring the bit-portable double
   * fold, every selection ordered by (d², id) — so the DuckDB mirror
   * ([[graphSearchSql]]) replays the identical schedule. Queries must
   * be members of `emb` by id (their vectors are looked up, the id
   * excluded from results).
   *
   * Scale shape: per hop one equi-join beam⋈graph on the node id +
   * one id-keyed vector lookup + the bounded-state per-query top-`beam`
   * heap; the beam table is |queries|·beam rows — broadcast-sized
   * against the graph. Graph edges are used symmetrized (an edge is
   * evidence of proximity in either direction).
   */
  def graphSearch(emb: DataFrame, idCol: String, vecCol: String,
                  graph: DataFrame, queryIds: DataFrame,
                  beam: Int, hops: Int, k: Int, entries: Int = 32,
                  entryIds: Option[DataFrame] = None): DataFrame = {
    require(entries >= 1, s"graphSearch: entries must be >= 1, got $entries")
    val e = emb.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .localCheckpoint()
    val g = graph.select(col("src"), col("dst"))
      .unionByName(graph.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val qs = queryIds.select(col(idCol).cast(LongType).as("q"))
    // hash-ordered top-E: the same E entry nodes on any layout/engine
    // (the randomWalks md5‖padded-id key: total order even on an md5
    // collision); a global sort-limit over the node table — top-E per
    // partition then merge, never a full sort at scale. `entryIds`
    // overrides the candidate pool (e.g. LAYER MEMBERS in hnswInsert —
    // a 1-member layer has an empty edge table but must still be
    // enterable, exactly like hnswSearch's per-layer member fallback).
    val pool = entryIds
      .map(_.select(col(idCol).cast(LongType).as("id")))
      .getOrElse(g.select(col("src").as("id"))).distinct()
    val entrySet = hashMinNodes(pool, entries)
    searchFrom(e, g, qs.crossJoin(broadcast(entrySet)), beam, hops, k)
  }

  /** The E nodes of `ids(id)` with the smallest md5‖padded-id keys —
    * the bounded deterministic entry sample shared by [[graphSearch]]
    * and the [[hnswSearch]] per-layer fallback. Returns (node). */
  private def hashMinNodes(ids: DataFrame, entries: Int): DataFrame =
    ids.select(col("id").as("node"),
        concat(md5(concat(lit("e:"), col("id").cast("string"))),
          lpad(col("id").cast("string"), 20, "0")).as("__ek"))
      .orderBy("__ek").limit(entries)
      .select("node")

  /** Beam-search core over symmetrized edges `g(src, dst)` from an
    * explicit per-query seed frame `seeds(q, node)` — the shared body
    * of [[graphSearch]] (seeds = queries × hash-min entries) and
    * [[hnswSearch]] (seeds = the layer above's results). Returns
    * `(query_id, rank, item_id, dist)`, self excluded, top-k by
    * (d², id). */
  private def searchFrom(e: DataFrame, g: DataFrame, seeds: DataFrame,
                         beam: Int, hops: Int, k: Int): DataFrame = {
    require(beam >= 1 && beam <= 256, s"searchFrom: beam in [1, 256], got $beam")
    require(hops >= 1 && hops <= 8, s"searchFrom: hops in [1, 8], got $hops")
    require(k >= 1 && k <= beam, s"searchFrom: k in [1, beam], got $k")
    def score(pairs: DataFrame): DataFrame = pairs
      .join(e.select(col("id").as("q"), col("vec").as("__qv")), "q")
      .join(e.select(col("id").as("node"), col("vec").as("__nv")), "node")
      .select(col("q"), col("node"), distSq(col("__qv"), col("__nv")).as("d2"))
    def topBeam(scored: DataFrame): DataFrame = scored
      .groupBy("q")
      .agg(Ranking.topKBy(-col("d2"), col("node"), beam).as("__t"))
      .select(col("q"), explode(col("__t")).as("__s"))
      .select(col("q"), col("__s.id").as("node"), (-col("__s.score")).as("d2"))
    // seed dedup: fallback ∪ carried entries may overlap, and a
    // duplicate (q, node) row would occupy two beam slots
    var frontier = topBeam(score(seeds.select(col("q"), col("node")).distinct()))
      .localCheckpoint()
    for (_ <- 1 to hops) {
      val expanded = frontier.select(col("q"), col("node"))
        .join(g.withColumnRenamed("src", "node"), "node")
        .select(col("q"), col("dst").as("node"))
        .union(frontier.select(col("q"), col("node")))
        .distinct()
      frontier = topBeam(score(expanded)).localCheckpoint()
    }
    frontier.filter(col("node") =!= col("q"))
      .groupBy("q")
      .agg(Ranking.topKBy(-col("d2"), col("node"), k).as("__t"))
      .select(col("q"), posexplode(col("__t")))
      .select(col("q").as("query_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as("item_id"), sqrt(-col("col.score")).as("dist"))
  }

  /** Deterministic HNSW layer level for a node id: the largest
    * l ≤ maxLevel with h % 4^l == 0, h = the node's md5-derived 32-bit
    * key — the geometric (p = 1/4) layer assignment HNSW draws from
    * exp(−ln U · mL), made reproducible (same id → same level on any
    * engine/layout, so the oracle mirrors it with the identical CASE). */
  def hnswLevelExpr(id: Column, maxLevel: Int): Column = {
    val h = conv(substring(md5(concat(lit("hl:"), id.cast("string"))), 1, 8),
      16, 10).cast(LongType)
    // fold LOW level first so the HIGHEST passing modulus wins the
    // outermost when() — h % 16 == 0 implies h % 4 == 0, so the other
    // order would cap every node at level 1
    (1 to maxLevel).foldLeft(lit(0)) { (acc, l) =>
      when(h % lit(math.pow(4, l).toLong) === 0, lit(l)).otherwise(acc)
    }
  }

  /** The `(idCol, lvl)` leveled-membership table of a corpus — the
    * MAINTAINED twin of [[hnswLevelExpr]] for [[hnswInsert]]'s `levels`
    * parameter: derive once at ingest, append each batch's rows
    * (levels are a pure function of the id, so appends never restate
    * and streamed membership equals a rebuild's). */
  def hnswLevels(rows: DataFrame, idCol: String, maxLevel: Int): DataFrame =
    rows.select(col(idCol).cast(LongType).as(idCol),
      hnswLevelExpr(col(idCol).cast(LongType), maxLevel).as("lvl"))

  /**
   * HNSW INDEX BUILD (Malkov & Yashunin '16, re-expressed declaratively):
   * a hierarchy of k-NN graphs where layer l contains the nodes with
   * [[hnswLevelExpr]] level ≥ l (geometric: each layer ~1/4 the one
   * below), each layer's edges built by [[nnDescent]] over just its
   * members. The hierarchy is what [[graphSearch]]'s flat beam lacks:
   * a top layer of ~N/4^L nodes gives every query a LONG-RANGE entry
   * path, so the layer-0 walk starts near the answer instead of at
   * corpus-global entry points — the property that keeps hop counts
   * flat as N grows.
   *
   * Scale shape: layer sizes are geometric, so the total build is
   * ≤ 4/3 of the layer-0 [[nnDescent]] build; each layer is the same
   * bucketed, never-all-pairs construction. Returns
   * `(layer, vec_id, rank, nbr_id, dist)` — one k-NN table per layer.
   */
  def hnswBuild(emb: DataFrame, idCol: String, vecCol: String,
                k: Int, rounds: Int, maxLevel: Int,
                bucketsFor: Long => Int): DataFrame = {
    require(maxLevel >= 1 && maxLevel <= 6, s"hnswBuild: maxLevel in [1, 6], got $maxLevel")
    val lv = emb.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"),
        hnswLevelExpr(col(idCol).cast(LongType), maxLevel).as("lvl"))
      .localCheckpoint()
    (0 to maxLevel).map { l =>
      val layer = lv.filter(col("lvl") >= l).select(col("id"), col("vec"))
      val n = layer.count()
      nnDescent(layer, "id", "vec", k, rounds, buckets = bucketsFor(n))
        .select(lit(l).as("layer"), col("id").as(idCol), col("rank"),
          col("nbr_id"), col("dist"))
    }.reduce(_ unionByName _)
  }

  /**
   * HNSW LAYERED SEARCH over a [[hnswBuild]] index: start at the top
   * layer, beam-walk each layer's graph, and carry each query's
   * `carry` best nodes down as the next layer's entries; the layer-0
   * walk runs at full `beam`/`k`. Every layer's entry set ALSO unions
   * the layer's own `fallback` hash-min nodes, so a sparse top layer
   * (or an empty layer graph on a tiny corpus) degrades to scored
   * entries instead of an empty descent — the bounded-entry discipline
   * graphSearch uses globally, here applied per layer. All selections
   * order by (d², id); the oracle unrolls the same layers.
   *
   * Scale shape: per layer one seed scoring + `hops` bounded
   * expansions; upper layers are geometrically small, so the search
   * cost is the layer-0 walk plus a vanishing tail — while the carried
   * entries localize that walk (the flat form's global entries are the
   * recall risk at large N, SCALING.md graph family).
   */
  def hnswSearch(emb: DataFrame, idCol: String, vecCol: String,
                 layered: DataFrame, queryIds: DataFrame,
                 beam: Int, hops: Int, k: Int, maxLevel: Int,
                 descentBeam: Int = 4, carry: Int = 2,
                 fallback: Int = 2): DataFrame = {
    require(carry >= 1 && carry <= descentBeam,
      s"hnswSearch: carry in [1, descentBeam], got $carry")
    val e = emb.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("vec"))
      .localCheckpoint()
    val lv = e.select(col("id"),
      hnswLevelExpr(col("id"), maxLevel).as("lvl"))
    val qs = queryIds.select(col(idCol).cast(LongType).as("q"))
    var carried: DataFrame = null
    var out: DataFrame = null
    for (l <- maxLevel to 0 by -1) {
      val g = layered.filter(col("layer") === l)
        .select(col(idCol).cast(LongType).as("src"), col("nbr_id").as("dst"))
      val gSym = g.unionByName(g.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint()
      val fb = hashMinNodes(lv.filter(col("lvl") >= l).select("id"), fallback)
      val seeds = {
        val base = qs.crossJoin(broadcast(fb))
        if (carried == null) base else base.unionByName(carried)
      }
      val found = searchFrom(e, gSym,
        seeds,
        beam = if (l == 0) beam else descentBeam,
        hops = hops,
        k = if (l == 0) k else carry)
      if (l == 0) out = found
      else carried = found.select(col("query_id").as("q"), col("item_id").as("node"))
        .localCheckpoint()
    }
    out
  }

  /** The CTE chain of [[graphSearchSql]] up to the final beam table
    * `s<hops>` plus the ranked answer CTE `found(q, rn, node, d2)`
    * (top-`k`, self excluded) — a `WITH`-clause fragment expecting
    * `e(id, vec)`, `knn(src, dst)`, and `queries(q)` in scope,
    * composable by consumers that merge search results onward
    * (incremental graph maintenance). Same MATERIALIZED discipline as
    * [[nnDescentCtesSql]]. */
  def graphSearchCtesSql(beam: Int, hops: Int, k: Int, entries: Int = 32,
                         p: String = "", eRel: String = "e",
                         knnRel: String = "knn", qRel: String = "queries",
                         seedRel: Option[String] = None): String = {
    def topBeam(src: String, out: String) =
      s"""$out AS MATERIALIZED (SELECT q, node, d2 FROM (
         |  SELECT q, node, d2,
         |         row_number() OVER (PARTITION BY q ORDER BY d2, node) AS rn
         |  FROM $src) WHERE rn <= $beam)""".stripMargin
    def hop(prev: String, r: Int) =
      s"""${p}x$r AS MATERIALIZED (SELECT DISTINCT s.q, g.dst AS node
         |  FROM $prev s JOIN ${p}sg g ON g.src = s.node
         |  UNION SELECT q, node FROM $prev),
         |${p}d$r AS MATERIALIZED (SELECT x.q, x.node, ${distSqSql("eq.vec", "en.vec")} AS d2
         |  FROM ${p}x$r x JOIN $eRel eq ON eq.id = x.q JOIN $eRel en ON en.id = x.node),
         |${topBeam(s"${p}d$r", s"${p}s$r")}""".stripMargin
    val hopChain = (1 to hops).map(r => hop(s"${p}s${r - 1}", r)).mkString(",\n")
    // seedRel(q, node), when given, replaces the global hash-min entry
    // construction — the HNSW descent shape, where a layer's entries
    // are the previous layer's results
    val seed = seedRel match {
      case Some(sr) =>
        s"""${p}d0 AS MATERIALIZED (SELECT s.q, s.node, ${distSqSql("eq.vec", "en.vec")} AS d2
           |  FROM $sr s
           |  JOIN $eRel eq ON eq.id = s.q JOIN $eRel en ON en.id = s.node)""".stripMargin
      case None =>
        s"""${p}ent AS MATERIALIZED (SELECT node FROM (
           |    SELECT node, md5('e:' || CAST(node AS VARCHAR)) || lpad(CAST(node AS VARCHAR), 20, '0') AS ek
           |    FROM (SELECT DISTINCT src AS node FROM ${p}sg))
           |  ORDER BY ek LIMIT $entries),
           |${p}d0 AS MATERIALIZED (SELECT q.q, ent.node, ${distSqSql("eq.vec", "en.vec")} AS d2
           |  FROM $qRel q CROSS JOIN ${p}ent ent
           |  JOIN $eRel eq ON eq.id = q.q JOIN $eRel en ON en.id = ent.node)""".stripMargin
    }
    s"""${p}sg AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM $knnRel UNION ALL SELECT dst AS src, src AS dst FROM $knnRel)),
       |$seed,
       |${topBeam(s"${p}d0", s"${p}s0")},
       |$hopChain,
       |${p}found AS MATERIALIZED (SELECT q, rn, node, d2
       |  FROM (SELECT q, node, d2,
       |          row_number() OVER (PARTITION BY q ORDER BY d2, node) AS rn
       |        FROM ${p}s$hops WHERE node <> q)
       |  WHERE rn <= $k)""".stripMargin
  }

  /** The reverse-offer MERGE of [[nnDescentInsert]] as a composable
    * SQL fragment: expects `oldRankedRel(src, dst, dist, rn)` (the
    * maintained ranked graph) and `foundRel(q, rn, node, d2)` (a
    * [[graphSearchCtesSql]] answer); produces
    * `<p>merged(src, rn, dst, dist)` — untouched lists verbatim,
    * touched lists re-ranked from old ∪ offers, new lists appended. */
  def nnInsertMergeSql(p: String, oldRankedRel: String, foundRel: String,
                       k: Int): String =
    s"""${p}offers AS MATERIALIZED (SELECT node AS src, q AS dst, sqrt(d2) AS dist
       |  FROM $foundRel),
       |${p}touched AS MATERIALIZED (SELECT DISTINCT src FROM ${p}offers),
       |${p}upd AS MATERIALIZED (SELECT src, dst, dist,
       |    row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
       |  FROM (SELECT o.src, o.dst, o.dist
       |        FROM $oldRankedRel o JOIN ${p}touched USING (src)
       |        UNION ALL SELECT src, dst, dist FROM ${p}offers)),
       |${p}merged AS MATERIALIZED (
       |  SELECT src, rn, dst, dist FROM $oldRankedRel
       |  WHERE src NOT IN (SELECT src FROM ${p}touched)
       |  UNION ALL SELECT src, rn, dst, dist FROM ${p}upd WHERE rn <= $k
       |  UNION ALL SELECT q AS src, rn, node AS dst, sqrt(d2) AS dist FROM $foundRel)""".stripMargin

  /** DuckDB mirror of [[graphSearch]] — expects CTEs `e(id, vec)`,
    * `knn(src, dst)` (the built graph, any direction), and
    * `queries(q)` in scope; unrolls the identical hops. */
  def graphSearchSql(beam: Int, hops: Int, k: Int, entries: Int = 32): String =
    s"""${graphSearchCtesSql(beam, hops, k, entries)}
       |SELECT q AS query_id, CAST(rn AS BIGINT) AS rank, node AS item_id,
       |       sqrt(d2) AS dist
       |FROM found
       |ORDER BY query_id, rank""".stripMargin

  /**
   * INCREMENTAL k-NN graph maintenance — the [[nnDescent]] build's
   * incremental twin (every maintained relation in this engine has
   * one): when a BATCH of new vectors lands, the graph updates
   * without a rebuild.
   *  - Phase 1 (search): each new vector runs [[graphSearch]] over
   *    the EXISTING graph → its own k-best list. Cost per new vector
   *    is the beam walk (`hops·beam·deg` nodes), never a corpus scan.
   *  - Phase 2 (reverse offers): every found edge (new → b) is
   *    offered back to b — b's list is re-selected from old ∪ offers
   *    by the same (dist, id) order. Only TOUCHED base nodes (≤
   *    batch·k of them) re-rank; untouched lists pass through
   *    verbatim, so the refresh cost tracks the batch, not the
   *    corpus — the same contract as the incremental MinHash/semantic
   *    dedup admissions.
   *
   * `baseGraph` is [[nnDescent]]'s output shape `(idCol, rank,
   * nbr_id, dist)`; `newIds` must be present in `emb` by id. Returns
   * the updated graph in the same shape (new nodes' lists appended).
   * Deterministic end to end, so the oracle composes
   * [[nnDescentCtesSql]] + [[graphSearchCtesSql]] + the same merge.
   */
  def nnDescentInsert(emb: DataFrame, idCol: String, vecCol: String,
                      baseGraph: DataFrame, newIds: DataFrame,
                      k: Int, beam: Int, hops: Int, entries: Int = 32,
                      entryIds: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && k <= beam, s"nnDescentInsert: k in [1, beam], got $k")
    val g = baseGraph.select(col(idCol).cast(LongType).as("src"),
      col("nbr_id").cast(LongType).as("dst"))
    val searched = graphSearch(emb, idCol, vecCol, g, newIds, beam, hops, k,
        entries, entryIds)
      .localCheckpoint() // feeds both the new lists and the reverse offers
    val offers = searched.select(col("item_id").as("__id"),
      col("query_id").as("nbr_id"), col("dist"))
    val touched = offers.select(col("__id")).distinct()
    val old = baseGraph.select(col(idCol).cast(LongType).as("__id"), col("rank"),
      col("nbr_id"), col("dist"))
    val upd = old.join(touched, Seq("__id"), "left_semi")
      .select(col("__id"), col("nbr_id"), col("dist"))
      .unionByName(offers)
      .groupBy("__id")
      .agg(Ranking.topKBy(-col("dist"), col("nbr_id"), k).as("__t"))
      .select(col("__id"), posexplode(col("__t")))
      .select(col("__id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as("nbr_id"), (-col("col.score")).as("dist"))
    val untouched = old.join(touched, Seq("__id"), "left_anti")
    val newLists = searched.select(col("query_id").as("__id"), col("rank"),
      col("item_id").as("nbr_id"), col("dist"))
    untouched.unionByName(upd).unionByName(newLists)
      .select(col("__id").as(idCol), col("rank"), col("nbr_id"), col("dist"))
  }

  /**
   * INCREMENTAL HNSW maintenance — [[hnswBuild]]'s incremental twin,
   * completing the maintained-index story the flat layer-0 graph
   * ([[nnDescentInsert]] / knnInsertSink) already has: when a batch of
   * new vectors lands, each new id gets its [[hnswLevelExpr]]
   * md5-geometric level (the SAME deterministic assignment a batch
   * rebuild would give it — levels are a pure function of the id, so
   * insertion order can never skew the layer sizes), and every layer
   * l ≤ level runs ONE [[nnDescentInsert]] over that layer's
   * maintained graph: the new member beam-searches the layer for its
   * k-best list and offers each found edge back to its endpoint —
   * ≤ batch·k touched lists re-rank per layer, untouched lists pass
   * through verbatim. Upper layers hold ~1/4^l of the batch (the
   * geometric assignment), so the total insert cost is ≤ 4/3 of the
   * layer-0 insert — the same geometric-tail shape as the build.
   * `layered` is [[hnswBuild]]'s output `(layer, idCol, rank, nbr_id,
   * dist)`; returns the updated index in the same shape.
   * Deterministic end to end: the oracle composes the per-layer build
   * CTEs, search CTEs, and the identical reverse-offer merge.
   *
   * `levels`: the MAINTAINED `(idCol, lvl)` membership of the existing
   * corpus (emb minus newIds; ids distinct — callers that may replay a
   * batch anti-join it back to this contract, the hnswInsertSink
   * discipline). When provided, the per-layer entry pools come from
   * that table's pushed-down scan plus the batch's own tiny level rows
   * — the insert's cost then tracks the BATCH, with no corpus-wide
   * level projection or materialization anywhere (the r16 `weak`:
   * re-deriving levels from ALL of emb and localCheckpointing them per
   * call is a corpus-sized write inside a maintenance operator; at
   * 10¹¹ vectors that is terabytes of (id, level) rows per
   * micro-batch). Levels are a pure function of the id, so an appended
   * membership table NEVER restates — `None` falls back to deriving
   * them from emb (exact same values, one-shot callers).
   */
  def hnswInsert(emb: DataFrame, idCol: String, vecCol: String,
                 layered: DataFrame, newIds: DataFrame,
                 k: Int, beam: Int, hops: Int, maxLevel: Int,
                 entries: Int = 32,
                 levels: Option[DataFrame] = None): DataFrame = {
    require(maxLevel >= 1 && maxLevel <= 6, s"hnswInsert: maxLevel in [1, 6], got $maxLevel")
    val nv = newIds.select(col(idCol).cast(LongType).as("__nid"),
        hnswLevelExpr(col(idCol).cast(LongType), maxLevel).as("__lvl"))
      .localCheckpoint() // maxLevel+1 consumers, one tiny id table
    // entry pool per layer = the layer's MEMBERS (level ≥ l over ALL of
    // emb), not the layer graph's edge endpoints — a 1-member upper
    // layer has an empty edge table but must still be enterable, or a
    // new top-level node could never connect (hnswSearch's per-layer
    // member-fallback discipline applied to inserts)
    val allLv = levels match {
      case Some(lv) =>
        // storage-backed membership: per-layer filters push into its
        // scan; deliberately NOT checkpointed (that would re-materialize
        // the corpus-sized table this parameter exists to avoid)
        lv.select(col(idCol).cast(LongType).as(idCol),
            col("lvl").cast(IntegerType).as("__lvl"))
          .unionByName(nv.select(col("__nid").as(idCol), col("__lvl")))
      case None =>
        emb.select(col(idCol).cast(LongType).as(idCol),
            hnswLevelExpr(col(idCol).cast(LongType), maxLevel).as("__lvl"))
          .localCheckpoint()
    }
    (0 to maxLevel).map { l =>
      val layerNew = nv.filter(col("__lvl") >= l).select(col("__nid").as(idCol))
      val members = allLv.filter(col("__lvl") >= l).select(idCol)
      val base = layered.filter(col("layer") === l)
        .select(col(idCol), col("rank"), col("nbr_id"), col("dist"))
      nnDescentInsert(emb, idCol, vecCol, base, layerNew, k, beam, hops,
          entries, entryIds = Some(members))
        .select(lit(l).as("layer"), col(idCol), col("rank"),
          col("nbr_id"), col("dist"))
    }.reduce(_ unionByName _)
  }

  /**
   * Greedy k-CENTER coreset selection (Gonzalez '85 farthest-point
   * traversal) — the diversity-sampling primitive for training-data
   * selection: pick the corpus's most mutually-distant k exemplars,
   * with the guarantee that every point lies within the final
   * selection radius of some center (a 2-approximation of the optimal
   * k-center cover). The reported per-pick radius sequence IS the
   * coverage curve a data-selection run reads ("how much does exemplar
   * i still add").
   *
   * Deterministic: the first center is the minimum id; each round
   * picks the point maximizing min-distance-to-selected, ties to the
   * smaller id; distances ride the bit-portable fold with the new
   * center's vector inlined as broadcast literals. The greedy
   * recursion is SEQUENTIAL BY DEFINITION: k driver-coordinated
   * rounds, each one scan + a single-row collect (the watermark-read
   * pattern) — but each point carries a RUNNING min-distance column
   * updated against only the newest center per round (min is exact,
   * so the values equal the recompute-everything form the oracle
   * unrolls), making the total work O(k·N) with constant-size
   * per-round plans instead of O(k²·N) with k-growing ones.
   * For large k at 100 TB, pre-sample (hash sample or per-cell
   * representatives) and run k-center on the sample — the standard
   * two-stage coreset.
   * Returns `(rank, id, radius)`; the first center's radius is NULL.
   */
  def kCenterSelect(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"kCenterSelect: k in [1, 64], got $k")
    val base = emb.select(col(idCol).cast(LongType).as("__id"), col(vecCol).as("__vec"))
      .cache()
    try {
      val spark = emb.sparkSession
      val first = base.orderBy("__id").limit(1).collect().head
      var picked = Vector[(Long, Seq[Float], Option[Double])](
        (first.getLong(0), first.getSeq[Float](1), None))
      // RUNNING min-distance state: each point carries its min distSq
      // to the picked set, updated with ONE new-center distance per
      // pick (min is exact — no FP reassociation — so the values, the
      // greedy sequence, and the unrolled oracle are identical to the
      // recompute-against-all-picked form this replaces, which was
      // O(k²·N) with a per-round plan growing in k: a least() chain of
      // k distance folds plus a k-literal isInCollection). Each round
      // is localCheckpoint'd: constant-size plans, O(k·N) total work.
      var state = base.filter(col("__id") =!= first.getLong(0))
        .select(col("__id"), col("__vec"),
          distSq(col("__vec"),
            array(first.getSeq[Float](1).map(x => lit(x)): _*)).as("__d"))
        .localCheckpoint()
      while (picked.size < k) {
        val next = state.orderBy(col("__d").desc, col("__id")).limit(1).collect()
        if (next.isEmpty) return toOut(spark, picked, idCol) // corpus exhausted
        val r = next.head
        val cVec = r.getSeq[Float](1)
        picked :+= ((r.getLong(0), cVec, Some(math.sqrt(r.getDouble(2)))))
        if (picked.size < k)
          state = state.filter(col("__id") =!= r.getLong(0))
            .select(col("__id"), col("__vec"),
              least(col("__d"),
                distSq(col("__vec"), array(cVec.map(x => lit(x)): _*))).as("__d"))
            .localCheckpoint()
      }
      toOut(spark, picked, idCol)
    } finally { base.unpersist(); () }
  }

  private def toOut(spark: org.apache.spark.sql.SparkSession,
                    picked: Vector[(Long, Seq[Float], Option[Double])],
                    idCol: String): DataFrame = {
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((id, _, rad), i) => (i + 1L, id, rad) }
      .toDF("rank", "__id", "radius")
      .select(col("rank"), col("__id").as(idCol), col("radius"))
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein '98):
    * greedily pick k items maximizing
    * `λ·rel − (1−λ)·max_{s∈selected} cos(item, s)` — the standard
    * diversification pass between retrieval and the consumer (dedup the
    * "ten near-identical top hits" problem without losing relevance).
    *
    * The greedy recursion is SEQUENTIAL BY DEFINITION — pick i+1 depends
    * on picks 1..i — so this runs k driver-coordinated rounds, each one
    * a full-candidate scoring job with the selected vectors inlined as
    * broadcast literals (the kmeans-round shape). Per-round cost is one
    * scan of the candidate set; the k collects are single-row scalar
    * reads (the watermark-read pattern). Candidates are bounded by
    * construction (a top-N retrieval feeds MMR), so cache-ability is a
    * given; at fleet scale the same greedy runs per query over its own
    * bounded candidate group.
    *
    * Ties break (score DESC, id ASC). μ is computed as `1.0 − λ` ONCE
    * and exposed to oracle mirrors via the same double (0.7 ⇒
    * 0.30000000000000004 — interpolate, don't re-type). Returns
    * `(rank, id, rel, mmr_score)` with exactly min(k, |cands|) rows. */
  def mmrSelect(cands: DataFrame, idCol: String, vecCol: String, relCol: String,
                k: Int, lambda: Double): DataFrame = {
    require(k >= 1 && lambda > 0.0 && lambda <= 1.0, s"mmrSelect: bad (k=$k, λ=$lambda)")
    val mu = 1.0 - lambda
    val base = cands.select(col(idCol).cast(LongType).as("__id"),
      col(vecCol).as("__vec"), col(relCol).cast(DoubleType).as("__rel")).cache()
    try {
      val spark = cands.sparkSession
      var picked = Vector.empty[(Long, Seq[Float], Double, Double)] // id, vec, rel, score
      var it = 0
      while (it < k) {
        val rem = base.filter(!col("__id").isInCollection(
          if (picked.isEmpty) Seq(-1L) else picked.map(_._1)))
        val sims = picked.map { case (_, v, _, _) =>
          cosine(col("__vec"), array(v.map(x => lit(x)): _*))
        }
        // NOT clamped at 0 — SQL MAX over the selected set can be
        // negative, and the mirror must land on the identical double
        val maxSim =
          if (sims.isEmpty) lit(0.0)
          else if (sims.size == 1) sims.head
          else greatest(sims: _*)
        val scored = rem.withColumn("__score", lit(lambda) * col("__rel") - lit(mu) * maxSim)
          .orderBy(col("__score").desc, col("__id")).limit(1)
          .select(col("__id"), col("__vec"), col("__rel"), col("__score")).collect()
        if (scored.isEmpty) it = k
        else {
          val r = scored.head
          picked :+= ((r.getLong(0), r.getSeq[Float](1), r.getDouble(2), r.getDouble(3)))
          it += 1
        }
      }
      import spark.implicits._
      picked.zipWithIndex
        .map { case ((id, _, rel, score), i) => (i + 1, id, rel, score) }
        .toDF("rank", "__id", "rel", "mmr_score")
        .select(col("rank"), col("__id").as(idCol), col("rel"), col("mmr_score"))
    } finally base.unpersist()
  }

  /**
   * DBSCAN (Ester et al., KDD'96) over an embedding column — DENSITY
   * clustering, the shape k-means can't express: clusters are maximal
   * chains of eps-reachable core points (≥ `minPts` neighbors within
   * `eps`, self excluded), low-density points are noise, and non-core
   * points inside a core's ball attach as borders.
   *
   * Scale composition — every stage is an operator this engine already
   * runs at corpus scale, never an all-pairs loop:
   *   1. the eps-neighbor graph comes from [[rangeSearch]] (cell-pruned
   *      ball-bound candidate generation; exact d² ≤ eps² verify),
   *   2. core tagging is one map-side-combinable count,
   *   3. cluster ids are the min-id connected component of the
   *      core-core subgraph via [[Dedup.connectedComponentsStar]]
   *      (O(log n) alternations, so giant clusters don't stall it),
   *   4. borders attach with one semi/anti join pair + a keyed MIN.
   *
   * Determinism: both engines compare the identical double fold to the
   * same eps² literal, and every label is an integer MIN — so the
   * output is oracle-hashable with zero tolerance. Noise rows are
   * dropped (they carry no label; the caller anti-joins if it wants
   * them). Output: `(id, cluster, role)` with role ∈ {core, border}.
   */
  def dbscan(emb: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, cVecCol: String, cIdCol: String,
             eps: Double, minPts: Int): DataFrame = {
    require(eps > 0.0 && minPts >= 1, s"dbscan: bad (eps=$eps, minPts=$minPts)")
    val nbrs = rangeSearch(emb, emb.select(col(idCol)), vecCol, idCol,
        centroids, cVecCol, cIdCol, eps)
      .select(col("query_id"), col("item_id"))
    dbscanFromNbrs(nbrs, minPts)
  }

  /** The DBSCAN labeling phase over a materialized eps-neighbor graph
    * `(query_id, item_id)` (both directions, self excluded): core
    * tagging, star-contraction components, border MIN attach. Shared by
    * the exact [[dbscan]] and the LSH-candidate [[dbscanLsh]]. */
  private[graft] def dbscanFromNbrs(nbrsIn: DataFrame, minPts: Int): DataFrame = {
    val nbrs = nbrsIn
      .localCheckpoint() // feeds 3 consumers; the eps-graph is the expensive part
    val core = nbrs.groupBy("query_id").agg(count(lit(1)).as("n_nbrs"))
      .filter(col("n_nbrs") >= minPts).select(col("query_id").as("id"))
    val coreEdges = nbrs
      .join(core.select(col("id").as("query_id")), Seq("query_id"), "left_semi")
      .join(core.select(col("id").as("item_id")), Seq("item_id"), "left_semi")
      .select(col("query_id").as("id_a"), col("item_id").as("id_b"))
    val comps = Dedup.connectedComponentsStar(coreEdges)
    // a core whose eps-ball holds only borders is its own 1-core cluster
    val coreClusters = core.join(comps.withColumnRenamed("id", "__cid"),
        core("id") === col("__cid"), "left")
      .select(core("id"), coalesce(col("component"), core("id")).as("cluster"))
    val borders = nbrs
      .join(core.select(col("id").as("query_id")), Seq("query_id"), "left_anti")
      .join(coreClusters.select(col("id").as("item_id"), col("cluster")),
        Seq("item_id"))
      .groupBy(col("query_id")).agg(min("cluster").as("cluster"))
      .select(col("query_id").as("id"), col("cluster"))
    coreClusters.withColumn("role", lit("core"))
      .unionByName(borders.withColumn("role", lit("border")))
  }

  /** Deterministic ±1 (Rademacher) hyperplanes — md5("p_i") high bit
    * picks the sign. Equivalent to Gaussian planes for sign-LSH, and
    * the oracle embeds them as literal arrays 7× more compactly. */
  def rademacherPlanes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim) { (p, i) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${p}_$i".getBytes("US-ASCII"))
      if ((d(0) & 0x80) != 0) -1.0 else 1.0
    }

  /**
   * LSH-candidate DBSCAN — the 100 TB form of [[dbscan]]. The exact
   * variant's eps-graph is the honest baseline, but on data whose
   * distances concentrate (any high-dim embedding corpus) the metric
   * cell bound admits every cell and the verify is Ω(N²) — measured
   * 6.3× at 10× data. Here candidates come from `bands` sign-LSH bands
   * (`planes.length / bands` planes each): a pair is considered iff
   * some band's full sign-slice matches, which prunes the ~90° bulk
   * exponentially in the band width while keeping tight eps-pairs with
   * probability ~1 − (1 − (1 − θ/π)^r)^b; survivors are verified with
   * the EXACT d² ≤ eps² gate. Recall is the LSH trade (deterministic
   * planes ⇒ the same, reproducible graph in both engines); counts,
   * cores, components, and borders then run on the candidate-verified
   * graph exactly as in [[dbscan]].
   */
  def dbscanLsh(emb: DataFrame, idCol: String, vecCol: String,
                planes: Array[Array[Double]], bands: Int,
                eps: Double, minPts: Int): DataFrame = {
    require(bands >= 1 && planes.length % bands == 0,
      s"dbscanLsh: ${planes.length} planes don't split into $bands bands")
    require(planes.length / bands <= 63,
      s"dbscanLsh: band width ${planes.length / bands} > 63 would wrap 1L << j")
    require(eps > 0.0 && minPts >= 1, s"dbscanLsh: bad (eps=$eps, minPts=$minPts)")
    val r = planes.length / bands
    val bandCols = (0 until bands).map { b =>
      val bits = (0 until r).map { j =>
        when(dot(col(vecCol), array(planes(b * r + j).map(lit).toIndexedSeq: _*)) > 0,
          lit(1L << j)).otherwise(lit(0L))
      }
      struct(lit(b).as("band"), bits.reduce(_ + _).as("bv"))
    }
    val banded = emb.select(col(idCol), explode(array(bandCols: _*)).as("__bb"))
      .select(col(idCol), col("__bb.band").as("band"), col("__bb.bv").as("bv"))
    val a = banded.select(col("band"), col("bv"), col(idCol).as("id_a"))
    val c = banded.select(col("band"), col("bv"), col(idCol).as("id_b"))
    val cand = a.join(c, Seq("band", "bv")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val vecs = emb.select(col(idCol), col(vecCol))
    val ver = cand
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), Seq("id_b"))
      .filter(distSq(col("__va"), col("__vb")) <= lit(eps * eps))
      .select(col("id_a"), col("id_b"))
    dbscanFromNbrs(
      ver.select(col("id_a").as("query_id"), col("id_b").as("item_id"))
        .unionByName(ver.select(col("id_b").as("query_id"), col("id_a").as("item_id"))),
      minPts)
  }

  /** ceil(log₂ n) as pure INTEGER bit-length arithmetic (n ≥ 1) — no
    * transcendental log whose last-ulp rounding could disagree with the
    * oracle's at exact powers of two. Mirror: DuckDB
    * `LENGTH(FORMAT('{:b}', n - 1))` (bit length of n−1), identical for
    * every n ≥ 2; n = 1 → 0 here vs 1 there, both clamped away by the
    * caller's floor. */
  def ceilLog2(n: Long): Int = {
    require(n >= 1, s"ceilLog2: n=$n")
    if (n <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
  }

  /** Data-adaptive sign-LSH design (Indyk–Motwani parameterized for
    * the eps = 0.5 design radius on UNIT vectors). Band width r =
    * clamp(⌈log₂ N⌉, [[LshR0]], [[LshRMax]]) keeps the bucket count
    * 2^r ∝ N — expected random-pair collisions per band N²/2^r ≈ N —
    * and the band COUNT grows with it as b(r) = ⌈b₀·(1/p*)^(r−r₀)⌉,
    * p* = 1 − 2·arcsin(eps/2)/π ≈ 0.8391 (plane survival of a pair AT
    * the design radius), so per-edge recall 1 − (1 − p*^r)^b stays
    * pinned at its r₀ design level at EVERY scale instead of decaying
    * with r. Total cost b·N ≈ N^(1+ρ) hashing + ≈ b·N candidates,
    * ρ = log₂(1/p*) ≈ 0.253 — the classic sub-quadratic LSH exponent,
    * vs the fixed-band form's N²/2^r. b(r) is a FIXED literal table in
    * both engines (below): a runtime pow() whose last-ulp rounding
    * differed cross-engine could flip a ⌈·⌉ at an exact integer. */
  val LshR0 = 8
  val LshRMax = 24
  /** b(r) for r = 8..24: ⌈8 · 1.19169^(r−8)⌉ (1/p* for eps = 0.5).
    * Extended 18 → 24 in r17 (the r16 design-table note): 2^24 buckets
    * cover 16.7M-row corpora before the width caps, at the honest
    * N^1.25 band cost — b(24) = 133. A spec pins every entry to the
    * formula. */
  val lshBandsForWidth: Array[Int] =
    Array(8, 10, 12, 14, 17, 20, 23, 28, 33, 39, 47, 56, 66, 79, 94, 112, 133)
  /** The full plane pool: bMax × rMax md5-deterministic ±1 planes,
    * laid out band-major (band b's slice is planes b·rMax .. b·rMax +
    * rMax − 1; width-r hashing uses each slice's FIRST r planes, so a
    * wider corpus EXTENDS the same buckets rather than rehashing). */
  def lshPlanePool(dim: Int): Array[Array[Double]] =
    rademacherPlanes(lshBandsForWidth.last * LshRMax, dim)

  /**
   * [[dbscanLsh]] with DATA-ADAPTIVE band width AND count — the change
   * that makes sign-LSH a law change rather than a constant-factor
   * prune (the r15 `weak`): fixed 8×8 bands hash into 256 buckets
   * whatever N, so the banded self-join's candidates grow N²/256 —
   * still quadratic. Here (r, b) come from ONE bounded count (the
   * adaptiveBuckets pattern; the mirror derives the identical r via
   * integer bit-length arithmetic and the identical b from the shared
   * literal table), giving N^(1+ρ) total work with recall pinned at
   * the design level — see [[lshBandsForWidth]]. Above 2^[[LshRMax]]
   * rows (16.7M at rMax = 24) the width caps and the prune degrades
   * gracefully toward constant-factor again; raising the cap further
   * is another design-table row, not a structural change — and past
   * any cap, the maintained-index [[dbscanFromNbrs]]-over-kNN-graph
   * composition (sim_dbscan_graph) remains the production path.
   */
  def dbscanLshAdaptive(emb: DataFrame, idCol: String, vecCol: String,
                        planePool: Array[Array[Double]],
                        eps: Double, minPts: Int): DataFrame = {
    require(planePool.length == lshBandsForWidth.last * LshRMax,
      s"dbscanLshAdaptive: pool ${planePool.length} != " +
        s"${lshBandsForWidth.last} bands × $LshRMax planes")
    val r = math.min(LshRMax, math.max(LshR0, ceilLog2(emb.count())))
    val b = lshBandsForWidth(r - LshR0)
    val sel = Array.tabulate(b * r)(idx =>
      planePool((idx / r) * LshRMax + idx % r))
    dbscanLsh(emb, idCol, vecCol, sel, b, eps, minPts)
  }

  /**
   * Exact integer GRAM MATRIX of the `round(x·qScale)` quantized corpus,
   * reduced distributedly (posexplode + id-keyed self-join, map-side
   * combined per (i,j)) and collected as dim² scalars — BOUNDED
   * metadata (schema-sized, corpus-size-free), the same contract as the
   * watermark reads. qScale is a power of two so the quantization is
   * fp-hazard-free in any engine. BIGINT cells hold to ~10⁸ vectors at
   * dim 64; past that widen to DECIMAL(38) (the [[gramSql]] note).
   */
  def gramMatrix(emb: DataFrame, idCol: String, vecCol: String,
                 qScale: Double): Array[Array[Long]] =
    collectGram(gramCells(emb, idCol, vecCol, qScale))

  /** The distributed (i ≤ j) integer Gram cells `(i, j, g)` of the
    * round(x·qScale) corpus — ADDITIVE over row subsets, so per-batch
    * partials appended by [[graft.streaming.StreamOps.gramPartialsSink]]
    * re-sum to the exact corpus Gram whatever the batching. */
  def gramCells(emb: DataFrame, idCol: String, vecCol: String,
                qScale: Double): DataFrame = {
    val quant = emb.select(col(idCol).as("__rid"), posexplode(col(vecCol)))
      .select(col("__rid"), col("pos").as("i"),
        floor(col("col").cast(DoubleType) * lit(qScale) + lit(0.5))
          .cast(LongType).as("q"))
    val a = quant.select(col("__rid"), col("i"), col("q").as("qi"))
    val b = quant.select(col("__rid"), col("i").as("j"), col("q").as("qj"))
    a.join(b, "__rid").filter(col("i") <= col("j"))
      .groupBy("i", "j").agg(sum(col("qi") * col("qj")).as("g"))
  }

  /** Collect (i ≤ j) Gram cells into the symmetric dim² driver matrix
    * (bounded metadata — the watermark-read contract). */
  def collectGram(cells: DataFrame): Array[Array[Long]] = {
    val rows = cells.select(col("i").cast(IntegerType), col("j").cast(IntegerType),
      col("g").cast(LongType)).collect()
    require(rows.nonEmpty, "collectGram: empty cell table")
    val dim = rows.map(r => math.max(r.getInt(0), r.getInt(1))).max + 1
    val out = Array.ofDim[Long](dim, dim)
    rows.foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getLong(2))
      out(i)(j) = v; out(j)(i) = v
    }
    out
  }

  /**
   * Dominant eigenvector of an integer Gram matrix by FIXED-POINT power
   * iteration — `rounds` identical integer rounds (w = G·v exact BIGINT;
   * rescale v ← w / max(1, max|w|/scale), truncating division), so the
   * trajectory is bit-reproducible in any engine: no norm, no sqrt, no
   * float accumulation anywhere. The Gram is PSD, so the iterate never
   * flips sign and converges monotonically toward PC1; `rounds` is a
   * fixed contract (both engines run the same count), not a tolerance.
   */
  def powerIteration(g: Array[Array[Long]], rounds: Int, scale: Long): Array[Long] = {
    val dim = g.length
    var v = Array.fill(dim)(scale)
    var r = 0
    while (r < rounds) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0L; var j = 0
        while (j < dim) { acc += g(i)(j) * v(j); j += 1 }
        acc
      }
      val m = w.map(math.abs).max
      val d = math.max(m / scale, 1L)
      v = w.map(_ / d)
      r += 1
    }
    v
  }

  /** DuckDB CTE chain mirroring [[gramMatrix]] + [[powerIteration]]:
    * `q` (quantized cells), `g` (full integer Gram), `v0..v{rounds}`
    * (the identical truncating-division rescale). Final vector CTE is
    * `v{rounds}(j, v)`. */
  def pcaPowerCtesSql(rel: String, vecCol: String, qScale: Long, rounds: Int,
                      scale: Long): String = {
    // every round CTE is MATERIALIZED: v{r} reads w{r} twice (scalar MAX
    // + projection), and DuckDB's default inlining would re-evaluate the
    // whole chain exponentially across rounds (the NOTES.md stream_nn
    // lesson)
    val rounds_ = (1 to rounds).map { r =>
      val p = s"v${r - 1}"
      s"""w$r AS MATERIALIZED (SELECT g.i, CAST(SUM(g.g * $p.v) AS BIGINT) AS w
         |  FROM g JOIN $p ON g.j = $p.j GROUP BY 1),
         |v$r AS MATERIALIZED (SELECT i AS j,
         |    w // GREATEST((SELECT MAX(ABS(w)) FROM w$r) // $scale, 1) AS v
         |  FROM w$r)""".stripMargin
    }.mkString(",\n")
    s"""q AS MATERIALIZED (SELECT vec_id, i,
       |    CAST(floor(CAST(v[i + 1] AS DOUBLE) * $qScale.0 + 0.5) AS BIGINT) AS q
       |  FROM (SELECT vec_id, $vecCol AS v, unnest(range(0, len($vecCol))) AS i
       |        FROM $rel)),
       |g AS MATERIALIZED (SELECT a.i AS i, b.i AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS g
       |  FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |v0 AS MATERIALIZED (SELECT DISTINCT i AS j, CAST($scale AS BIGINT) AS v FROM q),
       |$rounds_""".stripMargin
  }
}
