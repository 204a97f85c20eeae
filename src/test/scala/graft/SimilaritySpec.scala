package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f)),   // parallel to 0
      (3L, Array(1.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
  }

  test("cosine: identical=1, orthogonal=0, scale-invariant") {
    val out = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(out((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(out((0L, 1L))) < 1e-12)
    assert(math.abs(out((0L, 2L)) - 1.0) < 1e-12)
    assert(math.abs(out((0L, 3L)) - math.sqrt(0.5)) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val out = Similarity.bruteForceTopK(vecs, "embedding", "vec_id",
      Array(1.0, 0.0, 0.0), k = 3)
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(0L, 2L, 3L)) // cos 1.0, 1.0 (tiebreak id), 0.707
  }

  test("ivfAssign picks the nearest centroid, ties by centroid id") {
    import spark.implicits._
    val cents = Seq((10L, Array(1.0f, 0.0f, 0.0f)), (11L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("c_id", "c_vec")
    val out = Similarity.ivfAssign(vecs, "embedding", "vec_id", cents, "c_vec", "c_id")
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 10L), (1L, 11L), (2L, 10L), (3L, 10L))) // 3 ties → lower c_id
  }

  test("identical vectors land in the same LSH bucket; near-dup pairs found") {
    import spark.implicits._
    val planes = Similarity.hyperplanes(8, 3)
    val dup = vecs.unionByName(
      Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val pairs = Similarity.embeddingNearDupPairs(dup, "embedding", "vec_id", planes, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)))  // identical vector pair survives
    assert(pairs.contains((0L, 2L)))    // parallel vector pair too
    assert(!pairs.exists(p => p._1 == 1L || p._2 == 1L)) // orthogonal: no pair
  }

  test("native cosine/dot expressions are bit-identical to the HOF folds") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(q).select(
      Similarity.cosine(col("embedding"), col("qv")).as("native"),
      Similarity.cosineFold(col("embedding"), col("qv")).as("fold"),
      Similarity.dot(col("embedding"), col("qv")).as("native_dot"),
      Similarity.dotFold(col("embedding"), col("qv")).as("fold_dot"))
      .collect()
    assert(both.length > 0)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"cosine differs: $r")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), s"dot differs: $r")
    }
  }

  test("native cosine handles nulls and length mismatches like the fold") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f)),          // length mismatch
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)))    // zero vector → NaN
      .toDF("a", "b")
    val rows = df.select(Similarity.cosine(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0).isNaN)
    val nullRow = df.limit(1).select(
      Similarity.cosine(lit(null).cast("array<float>"), col("b"))).collect()
    assert(nullRow(0).isNullAt(0))
  }

  test("kmeans separates two obvious clusters and assigns all points") {
    import spark.implicits._
    val pts = Seq(
      (0L, Array(1.0f, 0.05f)), (1L, Array(0.9f, 0.1f)), (2L, Array(1.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.95f)), (5L, Array(0.05f, 1.1f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeans(pts, "embedding", "vec_id", k = 2, iterations = 3)
    assert(cents.count() == 2)
    val assign = Similarity.ivfAssign(pts, "embedding", "vec_id", cents, "c_vec", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // ids 0-2 share a centroid; ids 3-5 share the other
    assert(Set(assign(0L), assign(1L), assign(2L)).size == 1)
    assert(Set(assign(3L), assign(4L), assign(5L)).size == 1)
    assert(assign(0L) != assign(3L))
  }

  test("kmeansMStepStats: exact per-cluster sums, and shard stats merge by addition") {
    import spark.implicits._
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(1.1f, -0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f)), (5L, Array(-0.1f, 1.1f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("c_id", "c_vec")
    val stats = Similarity.kmeansMStepStats(pts, "embedding", "vec_id", cents, "c_vec", "c_id")
      .as[(Long, Int, Long, Long)].collect().toSet
    // int8 codes: scale = max|x|/127, so e.g. (0.9, 0.1) → (127, 14)
    def q(v: Array[Float]): Array[Long] = {
      val sc = v.map(x => math.abs(x.toDouble)).max / 127.0
      v.map(x => math.round(x / sc))
    }
    val expected = Seq(0L -> Seq(0, 1, 2), 1L -> Seq(3, 4, 5)).flatMap { case (c, ids) =>
      val members = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
        (2L, Array(1.1f, -0.1f)), (3L, Array(0.0f, 1.0f)),
        (4L, Array(0.1f, 0.9f)), (5L, Array(-0.1f, 1.1f)))
        .filter(p => ids.contains(p._1)).map(p => q(p._2))
      (0 until 2).map(d => (c, d, members.map(_(d)).sum, members.length.toLong))
    }.toSet
    assert(stats == expected, s"got $stats")
    // mergeability: stats over two disjoint shards sum to the full stats
    val shardA = pts.filter(col("vec_id") % 2 === 0)
    val shardB = pts.filter(col("vec_id") % 2 === 1)
    val merged = Similarity.kmeansMStepStats(shardA, "embedding", "vec_id", cents, "c_vec", "c_id")
      .unionByName(Similarity.kmeansMStepStats(shardB, "embedding", "vec_id", cents, "c_vec", "c_id"))
      .groupBy("centroid_id", "dim")
      .agg(sum("sum_q").as("sum_q"), sum("n").as("n"))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(merged == stats, "shard partials must combine to the full-corpus stats")
  }

  test("kmeansFit converges early (zero reassignments) and separates clusters") {
    import spark.implicits._
    val pts = Seq(
      (0L, Array(1.0f, 0.05f)), (1L, Array(0.9f, 0.1f)), (2L, Array(1.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.95f)), (5L, Array(0.05f, 1.1f)))
      .toDF("vec_id", "embedding")
    // init = first 2 by id → both initial centroids sit in cluster A;
    // the M-step must pull one toward cluster B and then stabilize
    val (cents, assigned, rounds) =
      Similarity.kmeansFit(pts, "embedding", "vec_id", k = 2, maxIter = 10)
    assert(rounds < 10, s"separable corpus should converge early, ran $rounds rounds")
    assert(cents.count() == 2)
    val a = assigned.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a.size == 6, "every vector assigned")
    assert(Set(a(0L), a(1L), a(2L)).size == 1)
    assert(Set(a(3L), a(4L), a(5L)).size == 1)
    assert(a(0L) != a(3L), s"clusters must separate, got $a")
    // converged means fixed point: one more round reassigns nothing
    val (_, again, extra) =
      Similarity.kmeansFit(pts, "embedding", "vec_id", k = 2, maxIter = rounds + 1)
    assert(extra == rounds, "an extra iteration budget must not change the round count")
    assert(again.collect().map(r => (r.getLong(0), r.getLong(1))).toMap == a)
  }

  test("ivfSearch ranks only the query's own cell (nprobe=1 pruning)") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),          // centroids
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.8f, 0.2f)),          // cell of 0
      (4L, Array(0.1f, 0.9f)), (5L, Array(0.05f, 0.95f))         // cell of 1
    ).toDF("vec_id", "embedding")
    val cents = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val out = Similarity.ivfSearch(emb, emb.filter(col("vec_id") === 0L).select(col("vec_id")),
      "embedding", "vec_id", cents, "c_vec", "c_id", k = 5)
      .orderBy("rn").collect()
    // query 0 sees items 2 and 3 (its cell), never 1/4/5 (the other cell)
    assert(out.map(_.getAs[Long]("item_id")).toSeq == Seq(2L, 3L))
    assert(out.map(_.getAs[Int]("rn")).toSeq == Seq(1, 2))
    // nprobe=2 widens the probe to both cells: all five other items rank
    val out2 = Similarity.ivfSearch(emb, emb.filter(col("vec_id") === 0L).select(col("vec_id")),
      "embedding", "vec_id", cents, "c_vec", "c_id", k = 5, nprobe = 2)
      .orderBy("rn").collect()
    assert(out2.map(_.getAs[Long]("item_id")).toSet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out2.take(2).map(_.getAs[Long]("item_id")).toSeq == Seq(2L, 3L)) // own cell still first
  }

  test("native functions are SQL-callable after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_dot(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS d,
        |       graft_rolling_hash('abc') AS h,
        |       graft_shingle_hashes('a b c', 2, true) AS sh,
        |       xxhash64('a b') AS x""".stripMargin).collect().head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 23.0 && r.getLong(2) == 96354L)
    assert(r.getSeq[Long](3).length == 2 && r.getSeq[Long](3).head == r.getLong(4))
    // the spark.sql.extensions entry point wires the same set
    new graft.functions.GraftExtensions() // constructible for --conf use
  }

  test("hyperplanes are deterministic for a fixed seed") {
    val a = Similarity.hyperplanes(4, 8)
    val b = Similarity.hyperplanes(4, 8)
    assert(a.flatten.toSeq == b.flatten.toSeq)
  }

  test("int8 quantization matches a reference impl; zero vector is safe") {
    import spark.implicits._
    def qRef(xs: Array[Float]): Array[Long] = {
      val sc = xs.map(v => math.abs(v.toDouble)).max / 127.0
      if (sc == 0.0) xs.map(_ => 0L)
      else xs.map(v => java.math.BigDecimal.valueOf(v.toDouble / sc)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
    }
    val data = Seq(
      (0L, Array(0.5f, -0.25f, 1.0f)),
      (1L, Array(-3.0f, 1.5f, 0.75f)),
      (2L, Array(0.0f, 0.0f, 0.0f))) // all-zero: scale 0 must not NaN
    val out = data.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding"), Similarity.quantScale(col("embedding"))).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    data.foreach { case (id, xs) =>
      assert(out(id).toSeq == qRef(xs).toSeq, s"vec $id")
      assert(out(id).forall(q => q >= -127 && q <= 127))
    }
  }

  test("quantized cosine tracks exact cosine within int8 error") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = (0L until 40L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = data.toDF("vec_id", "embedding")
      .withColumn("qv", Similarity.quantizeInt8(
        col("embedding"), Similarity.quantScale(col("embedding"))))
    val pairs = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("exact"),
        Similarity.quantizedCosine(col("a.qv"), col("b.qv")).as("approx"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.02,
        s"exact=${r.getDouble(0)} approx=${r.getDouble(1)}")
    }
  }

  test("native int8 dot/cosine are bit-identical to the long folds") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("qv", Similarity.quantizeInt8(
        col("embedding"), Similarity.quantScale(col("embedding"))))
    val q = emb.filter(col("vec_id") === 0).select(col("qv").as("qq"))
    val both = emb.crossJoin(q).select(
      Similarity.quantizedDot(col("qv"), col("qq")).as("native_dot"),
      Similarity.quantizedDotFold(col("qv"), col("qq")).as("fold_dot"),
      Similarity.quantizedCosine(col("qv"), col("qq")).as("native_cos"),
      Similarity.quantizedCosineFold(col("qv"), col("qq")).as("fold_cos"))
      .collect()
    assert(both.length > 0)
    both.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"int dot differs: $r")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), s"quantized cosine differs: $r")
    }
  }

  test("fused int8Codes is bit-identical to the quantScale+quantizeInt8 composition") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val both = emb.select(
      Similarity.int8Codes(col("embedding")).as("fused"),
      Similarity.quantizeInt8(col("embedding"), Similarity.quantScale(col("embedding"))).as("spec"))
      .collect()
    assert(both.length > 0)
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"codes differ: $r")
    }
    // edge shapes: all-zero vector → all-zero codes; empty → empty
    import spark.implicits._
    val edge = Seq(Array(0.0f, 0.0f), Array.empty[Float]).toDF("v")
      .select(Similarity.int8Codes(col("v"))).collect()
    assert(edge(0).getSeq[Long](0) == Seq(0L, 0L))
    assert(edge(1).getSeq[Long](0).isEmpty)
  }

  test("quantized cosine: zero vector → 0.0 (not NaN); null/mismatch → NULL") {
    import spark.implicits._
    val df = Seq(
      (Array(0L, 0L), Array(5L, 7L)),   // zero codes → 0.0
      (Array(1L, 2L), Array(1L)))       // length mismatch → NULL
      .toDF("a", "b")
    val rows = df.select(Similarity.quantizedCosine(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).isNullAt(0))
    val dotRows = df.select(Similarity.quantizedDot(col("a"), col("b"))).collect()
    assert(dotRows(0).getLong(0) == 0L)
    assert(dotRows(1).isNullAt(0))
  }

  test("PQ: m codes per vector, ADC retrieves the matching-code vector first") {
    import spark.implicits._
    // two 4-dim vectors with ORTHOGONAL slices in both subspaces
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (2L, Seq(0.0f, 1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebook(emb, "embedding", "vec_id", m = 2, dim = 4, k = 2)
    assert(cb.count() == 4) // m * k
    val codes = Similarity.pqEncode(emb, "embedding", "vec_id", cb, m = 2, dim = 4)
    // exactly m codes per vector, codes drawn from the codebook
    val perVec = codes.groupBy("vec_id").count().collect()
    assert(perVec.forall(_.getLong(1) == 2L))
    val cbIds = cb.select("c_id").as[Long].collect().toSet
    assert(codes.select("code").as[Long].collect().forall(cbIds.contains))
    // ADC: querying with vector 1 must rank vector 1 first (its codes'
    // centroids align with the query slices; vector 2's are orthogonal)
    val queries = emb.filter($"vec_id" === 1L).select($"vec_id".as("q_id"), $"embedding")
    val top = Similarity.pqAdcTopK(codes, "vec_id", cb, queries, "q_id", "embedding",
      m = 2, dim = 4, k = 2).orderBy("rank").collect()
    assert(top.head.getAs[Long]("vec_id") == 1L,
      s"ADC must retrieve the aligned vector first: ${top.mkString(", ")}")
    assert(top.head.getAs[Long]("score_pts") > top.last.getAs[Long]("score_pts"))
  }

  test("ivfPqSearch gates ADC scoring to the probed cells and excludes self") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)), (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)), // centroids
      (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)), (3L, Seq(0.8f, 0.2f, 0.2f, 0.8f)), // cell of 0
      (4L, Seq(0.1f, 0.9f, 0.9f, 0.1f))                                     // cell of 1
    ).toDF("vec_id", "embedding")
    val coarse = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val cb = Similarity.pqCodebook(emb, "embedding", "vec_id", m = 2, dim = 4, k = 2)
    // nprobe=1: query 0 scores only its own cell — items 2 and 3, never
    // 1/4 (other cell), never itself
    val out = Similarity.ivfPqSearch(emb, emb.filter($"vec_id" === 0L).select($"vec_id"),
      "embedding", "vec_id", coarse, "c_vec", "c_id", cb,
      m = 2, dim = 4, k = 5, nprobe = 1).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSet == Set(2L, 3L),
      s"nprobe=1 must stay in the query's cell: ${out.mkString(", ")}")
    // nprobe=2 widens to both cells; the full ADC ranking matches
    // pqAdcTopK over the whole corpus (minus self) — the gate only
    // prunes, the scoring is the same LUT arithmetic
    val out2 = Similarity.ivfPqSearch(emb, emb.filter($"vec_id" === 0L).select($"vec_id"),
      "embedding", "vec_id", coarse, "c_vec", "c_id", cb,
      m = 2, dim = 4, k = 5, nprobe = 2).orderBy("rank").collect()
    assert(out2.map(_.getAs[Long]("vec_id")).toSet == Set(1L, 2L, 3L, 4L))
    val codes = Similarity.pqEncode(emb, "embedding", "vec_id", cb, m = 2, dim = 4)
    val full = Similarity.pqAdcTopK(codes, "vec_id", cb,
      emb.filter($"vec_id" === 0L).select($"vec_id".as("q_id"), $"embedding"),
      "q_id", "embedding", m = 2, dim = 4, k = 5)
      .filter($"vec_id" =!= 0L).orderBy("rank").collect()
    assert(out2.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("score_pts"))).toSeq
      == full.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("score_pts"))).toSeq)
  }

  test("mmrSelect: diversity penalty demotes the near-duplicate of pick 1") {
    import spark.implicits._
    // rel and vectors chosen so greedy-by-relevance would pick the
    // near-duplicate second but MMR must not: b's small relevance gap
    // (0.05) is outweighed by a2's similarity to the first pick
    val cands = Seq(
      (1L, Array(1.0f, 0.0f), 0.99),            // top relevance
      (2L, Array(0.995f, 0.0998749f), 0.95),    // near-dup of 1
      (3L, Array(0.6f, 0.8f), 0.90))            // diverse
      .toDF("vec_id", "embedding", "rel")
    val out = Similarity.mmrSelect(cands, "vec_id", "embedding", "rel",
      k = 3, lambda = 0.7).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq == Seq((1, 1L), (2, 3L), (3, 2L)),
      "MMR must interleave the diverse candidate ahead of the near-duplicate")
  }

  test("mmrSelect scores equal a brute-force greedy replay; k caps at |cands|") {
    import spark.implicits._
    val vecs = Map(
      1L -> Array(1.0f, 0.0f, 0.0f), 2L -> Array(0.8f, 0.6f, 0.0f),
      3L -> Array(0.0f, 1.0f, 0.0f), 4L -> Array(0.5f, 0.5f, 0.70710677f))
    val rel = Map(1L -> 0.9, 2L -> 0.85, 3L -> 0.8, 4L -> 0.75)
    val cands = vecs.toSeq.map { case (id, v) => (id, v, rel(id)) }
      .toDF("vec_id", "embedding", "rel")
    val lambda = 0.7; val mu = 1.0 - lambda
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def fold(f: (Int) => Double) = (0 until a.length).foldLeft(0.0)((acc, i) => acc + f(i))
      fold(i => a(i).toDouble * b(i).toDouble) /
        (math.sqrt(fold(i => a(i).toDouble * a(i).toDouble)) *
          math.sqrt(fold(i => b(i).toDouble * b(i).toDouble)))
    }
    // brute-force greedy replay in plain Scala doubles
    var picked = Vector.empty[(Long, Double)]
    (1 to 4).foreach { _ =>
      val best = vecs.keys.toSeq.filterNot(id => picked.exists(_._1 == id))
        .map { id =>
          val pen = if (picked.isEmpty) 0.0
            else picked.map(p => cos(vecs(id), vecs(p._1))).max
          (id, lambda * rel(id) - mu * pen)
        }.sortBy { case (id, sc) => (-sc, id) }.head
      picked :+= best
    }
    // ask for MORE than |cands|: must return exactly 4 rows
    val out = Similarity.mmrSelect(cands, "vec_id", "embedding", "rel",
      k = 10, lambda = lambda).orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    assert(out.length == 4)
    out.zip(picked).foreach { case ((id, sc), (eid, esc)) =>
      assert(id == eid)
      assert(math.abs(sc - esc) < 1e-12, s"score drift for $id: $sc vs $esc")
    }
  }

  test("rangeSearch equals brute force on clustered data (pruning is recall-free)") {
    import spark.implicits._
    // two tight clusters far apart + their centers as the two centroids:
    // cross-cluster distances (~100) dwarf tau, so the ball-tree gate
    // must prune the far cell while intra-cluster neighbors all surface
    val mk = (base: Double, i: Int) => Array(base + i * 0.1, base - i * 0.1)
    val emb = ((0 until 5).map(i => (i.toLong, mk(0.0, i))) ++
      (0 until 5).map(i => (100L + i, mk(100.0, i)))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(0.0, 0.0)), (1L, Array(100.0, 100.0)))
      .toDF("c_id", "c_vec")
    val queries = Seq(0L, 100L).toDF("vec_id")
    val tau = 0.5
    val got = Similarity.rangeSearch(emb, queries, "embedding", "vec_id",
        cents, "c_vec", "c_id", maxDist = tau)
      .select("query_id", "item_id").as[(Long, Long)].collect().sorted.toSeq
    val brute = emb.as("q").join(emb.as("e"), col("q.vec_id") =!= col("e.vec_id"))
      .join(queries.select(col("vec_id").as("qid")), col("q.vec_id") === col("qid"))
      .filter(Similarity.distSqFold(col("q.embedding"), col("e.embedding")) <= tau * tau)
      .select(col("q.vec_id"), col("e.vec_id")).as[(Long, Long)].collect().sorted.toSeq
    assert(got == brute && got.nonEmpty, s"got $got vs brute $brute")
    // dist 0->1 = sqrt(0.1^2*2) ≈ 0.1414... so ids 1-3 are within 0.5 of 0
    assert(got.filter(_._1 == 0L).map(_._2) == Seq(1L, 2L, 3L))
  }

  test("nnDescent: refinement is monotone, layout-invariant, and recovers clustered neighbors") {
    import spark.implicits._
    // three tight 2-D clusters of 12 points each; true k-NN of every
    // point lies inside its own cluster, far from the md5 buckets'
    // arbitrary seeding
    val pts = for (c <- 0 until 3; i <- 0 until 12) yield
      ((c * 12 + i).toLong, Array((c * 50 + i * 0.1).toFloat, (c * 50 - i * 0.1).toFloat))
    val emb = pts.toDF("vec_id", "embedding")
    val k = 4
    val got = Similarity.nnDescent(emb, "vec_id", "embedding", k, rounds = 3, buckets = 6)
      .select("vec_id", "nbr_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute-force truth
    val brute = pts.flatMap { case (a, va) =>
      pts.filter(_._1 != a).map { case (b, vb) =>
        val d = math.sqrt(va.zip(vb).map { case (x, y) =>
          (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum)
        (a, b, d)
      }.sortBy(p => (p._3, p._2)).take(k)
    }
    val recall = got.map(g => (g._1, g._2)).toSet
      .intersect(brute.map(b => (b._1, b._2)).toSet).size.toDouble / brute.size
    assert(recall >= 0.9, s"3-round NN-descent recall on clustered data: $recall")
    // monotone improvement: every node's worst kept distance never
    // worsens round over round (new list = top-k of a superset)
    def worst(rounds: Int): Map[Long, Double] =
      Similarity.nnDescent(emb, "vec_id", "embedding", k, rounds, buckets = 6)
        .groupBy("vec_id").agg(max("dist").as("w")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w0 = worst(0); val w2 = worst(2)
    w2.foreach { case (id, w) =>
      w0.get(id).foreach(prev => assert(w <= prev, s"node $id worsened: $prev -> $w"))
    }
    // layout invariance: same rows under a different input partitioning
    val re = Similarity.nnDescent(emb.repartition(7), "vec_id", "embedding",
        k, rounds = 3, buckets = 6)
      .select("vec_id", "nbr_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(re.sorted.toSeq == got.sorted.toSeq, "nnDescent must be partition-invariant")
  }

  test("graphSearch: beam over the built graph recovers clustered neighbors, never scans the corpus") {
    import spark.implicits._
    val pts = for (c <- 0 until 3; i <- 0 until 12) yield
      ((c * 12 + i).toLong, Array((c * 50 + i * 0.1).toFloat, (c * 50 - i * 0.1).toFloat))
    val emb = pts.toDF("vec_id", "embedding")
    val graph = Similarity.nnDescent(emb, "vec_id", "embedding", 4, rounds = 3, buckets = 6)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val queries = Seq(5L, 17L, 29L).toDF("vec_id") // one per cluster
    val got = Similarity.graphSearch(emb, "vec_id", "embedding", graph, queries,
        beam = 6, hops = 4, k = 3, entries = 8)
      .select("query_id", "item_id").as[(Long, Long)].collect()
    // brute truth: top-3 per query
    val brute = Seq(5L, 17L, 29L).flatMap { q =>
      val vq = pts.find(_._1 == q).get._2
      pts.filter(_._1 != q).map { case (b, vb) =>
        val d = vq.zip(vb).map { case (x, y) =>
          (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
        (q, b, d)
      }.sortBy(p => (p._3, p._2)).take(3).map(p => (p._1, p._2))
    }.toSet
    val recall = got.toSet.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.85, s"graph beam search recall: $recall (got ${got.toSeq})")
    assert(got.length == 9, "exactly k results per query")
  }

  test("hnswBuild/hnswSearch: nested layers, geometric levels, clustered recall") {
    import spark.implicits._
    val pts = for (c <- 0 until 4; i <- 0 until 16) yield
      ((c * 16 + i).toLong, Array((c * 50 + i * 0.1).toFloat, (c * 50 - i * 0.1).toFloat))
    val emb = pts.toDF("vec_id", "embedding")
    // levels are md5-deterministic, bounded, and geometric-ish
    val lvls = emb.select(col("vec_id"),
        Similarity.hnswLevelExpr(col("vec_id"), 2).as("lvl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lvls.values.forall(l => l >= 0 && l <= 2))
    assert(lvls.values.count(_ >= 1) < lvls.size,
      "level 0 must hold the majority (p = 1/4 per level)")
    val layered = Similarity.hnswBuild(emb, "vec_id", "embedding",
      k = 4, rounds = 2, maxLevel = 2, bucketsFor = _ => 4)
    // layer graphs only contain members of that level set, which nest
    val srcs = (0 to 2).map(l => layered.filter(col("layer") === l)
      .select("vec_id").distinct().as[Long].collect().toSet)
    assert(srcs(2).subsetOf(srcs(1)) && srcs(1).subsetOf(srcs(0)), "layers must nest")
    assert(srcs(2) == lvls.filter(_._2 >= 2).keySet.filter(srcs(2).contains) &&
      srcs(2).forall(id => lvls(id) >= 2), "layer-2 members must have level >= 2")
    // search: one query per cluster; brute-force truth top-3
    val queries = Seq(5L, 21L, 37L, 53L).toDF("vec_id")
    val got = Similarity.hnswSearch(emb, "vec_id", "embedding", layered, queries,
        beam = 6, hops = 4, k = 3, maxLevel = 2)
      .select("query_id", "item_id").as[(Long, Long)].collect()
    val brute = Seq(5L, 21L, 37L, 53L).flatMap { q =>
      val vq = pts.find(_._1 == q).get._2
      pts.filter(_._1 != q).map { case (b, vb) =>
        val d = vq.zip(vb).map { case (x, y) =>
          (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
        (q, b, d)
      }.sortBy(p => (p._3, p._2)).take(3).map(p => (p._1, p._2))
    }.toSet
    val recall = got.toSet.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.85, s"hnsw layered search recall: $recall (got ${got.toSeq})")
    assert(got.length == 12, "exactly k results per query")
  }

  test("nnDescentInsert: batch insertion finds true neighbors and only improves touched lists") {
    import spark.implicits._
    val pts = for (c <- 0 until 3; i <- 0 until 12) yield
      ((c * 12 + i).toLong, Array((c * 50 + i * 0.1).toFloat, (c * 50 - i * 0.1).toFloat))
    val emb = pts.toDF("vec_id", "embedding")
    val base = emb.filter(col("vec_id") % 6 =!= 0)     // 30 base vectors
    val delta = emb.filter(col("vec_id") % 6 === 0).select("vec_id") // 6 new, 2/cluster
    val k = 4
    val g0 = Similarity.nnDescent(base, "vec_id", "embedding", k, rounds = 3, buckets = 5)
    val g1 = Similarity.nnDescentInsert(emb, "vec_id", "embedding", g0, delta,
      k, beam = 6, hops = 4, entries = 8)
    val rows = g1.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // shape: every node has <= k rows, ranks 1..n contiguous
    rows.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.length <= k && rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"bad list shape for $id: ${rs.toSeq}")
    }
    // every new node's list exists and stays inside its own cluster
    val newIds = Seq(0L, 6L, 12L, 18L, 24L, 30L)
    newIds.foreach { q =>
      val nbrs = rows.filter(_._1 == q).map(_._3)
      assert(nbrs.nonEmpty, s"new node $q got no list")
      assert(nbrs.forall(b => b / 12 == q / 12),
        s"new node $q crossed clusters: ${nbrs.toSeq}")
    }
    // touched base lists only improve: worst kept distance never worsens
    val w0 = g0.groupBy("vec_id").agg(max("dist").as("w")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.filter(r => !newIds.contains(r._1)).groupBy(_._1).foreach { case (id, rs) =>
      val w1 = rs.map(_._4).max
      w0.get(id).foreach(prev =>
        assert(w1 <= prev + 1e-12, s"base node $id worsened: $prev -> $w1"))
    }
  }

  test("kCenterSelect: one center per far cluster, non-increasing radii, min-id start") {
    import spark.implicits._
    val pts = for (c <- 0 until 3; i <- 0 until 10) yield
      ((c * 10 + i).toLong, Array((c * 100 + i * 0.1).toFloat, (c * 100).toFloat))
    val out = Similarity.kCenterSelect(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.length == 5)
    assert(out(0) == ((1L, 0L, None)), "first center is the minimum id, radius NULL")
    // first three centers cover all three clusters (farthest-point property)
    assert(out.take(3).map(_._2 / 10).toSet == Set(0L, 1L, 2L),
      s"first 3 centers must hit all 3 clusters: ${out.toSeq}")
    // radii never increase (each pick covers at least as well as the last)
    val radii = out.flatMap(_._3)
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-12, s"radius increased: $a -> $b") }
    // within-cluster picks 4-5 have tiny radii vs the cross-cluster ~100
    assert(radii.take(2).forall(_ > 90.0) && radii.drop(2).forall(_ < 2.0))
  }

  test("kCenterSelect: running-min state matches the exact driver-side greedy at k=20") {
    import spark.implicits._
    // the O(k·N) running-min refactor must reproduce the
    // recompute-against-all-picked greedy EXACTLY (min is exact in FP,
    // so sequence, ids, and radii are bit-identical) — pinned against
    // a driver-side reference on a deterministic pseudo-random cloud.
    // Per-round plans are constant-size by construction (each round is
    // a localCheckpoint'd scan + ONE new-center distance fold, not a
    // k-term least() chain over a k-literal isInCollection filter).
    val pts = (0 until 100).map { i =>
      val h = (i * 2654435761L) & 0xffffL
      (i.toLong, Array(((h % 251).toFloat - 125f) / 10f,
        (((h / 251) % 251).toFloat - 125f) / 10f))
    }
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) {
        val d = a(j).toDouble - b(j).toDouble; s += d * d; j += 1
      }
      s
    }
    // reference greedy: start at min id, pick argmax of min-dist² with
    // ties to the smaller id, radius = sqrt of the pick's min-dist²
    var picked = Vector(0L)
    var refRadii = Vector.empty[Double]
    while (picked.size < 20) {
      val cand = pts.filterNot(p => picked.contains(p._1))
        .map { case (id, v) =>
          (id, picked.map(pid => d2(pts(pid.toInt)._2, v)).min)
        }
      val best = cand.minBy { case (id, d) => (-d, id) }
      picked :+= best._1
      refRadii :+= math.sqrt(best._2)
    }
    val out = Similarity.kCenterSelect(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 20)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toVector == picked,
      s"greedy sequence diverged: ${out.map(_.getLong(1)).toVector} vs $picked")
    assert(out.drop(1).map(_.getDouble(2)).toVector == refRadii,
      "radii must be bit-identical to the exact reference")
  }

  test("rangeSearch: cell assignment is a min_by aggregate — no WindowExec in the plan") {
    import spark.implicits._
    // the r13 shape row_number()'d the k-expanded emb×centroids frame —
    // a sort-based shuffle of k× the corpus; the aggregate gets map-side
    // combine and no sort, same semantics (VERDICT r13 item 5)
    val emb = (0 until 8).map(i => (i.toLong, Array(i * 1.0, i * 2.0)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(0.0, 0.0)), (1L, Array(8.0, 16.0)))
      .toDF("c_id", "c_vec")
    val queries = Seq(0L, 7L).toDF("vec_id")
    val plan = Similarity.rangeSearch(emb, queries, "embedding", "vec_id",
        cents, "c_vec", "c_id", maxDist = 3.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"),
      s"rangeSearch must assign cells via min_by aggregate, not a window:\n$plan")
  }

  test("native distSq is bit-identical to the zip_with+aggregate fold") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .select(Similarity.distSq(col("a.embedding"), col("b.embedding")).as("native"),
        graft.ops.Similarity.distSqFold(col("a.embedding"), col("b.embedding")).as("fold"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} fold=${r.getDouble(1)}")
    }
    // null / length-mismatch parity with the fold's zip_with padding
    val edge = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))
    ).toDF("a", "b")
      .select(Similarity.distSq(col("a"), col("b")).as("d"))
      .collect()
    assert(edge.head.isNullAt(0), "length mismatch must yield NULL like the fold")
  }

  test("dbscan: chain → core middles + border ends; sparse pair + isolate → noise") {
    import spark.implicits._
    // 0-1-2-3 is a 0.4-spaced chain (eps=0.5, minPts=2): 1,2 have two
    // eps-neighbors (core), 0,3 one (border); 10-11 is an isolated pair
    // (one neighbor each — noise); 20 is fully isolated (noise)
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.4f, 0.0f)),
      (2L, Array(0.8f, 0.0f)), (3L, Array(1.2f, 0.0f)),
      (10L, Array(9.0f, 0.0f)), (11L, Array(9.4f, 0.0f)),
      (20L, Array(20.0f, 20.0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 0.0f)),
      (2L, Array(20.0f, 20.0f))).toDF("c_id", "c_vec")
    val out = Similarity.dbscan(pts, "vec_id", "embedding",
        cents, "c_vec", "c_id", eps = 0.5, minPts = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
    // cluster label = min id of the core component {1,2} = 1; border 3
    // reaches it through its only core neighbor 2
    assert(out.toSeq == Seq(
      0L -> ((1L, "border")), 1L -> ((1L, "core")),
      2L -> ((1L, "core")), 3L -> ((1L, "border"))),
      s"got ${out.toSeq}")
  }

  test("dbscan: lone core with only border satellites keeps its own id as cluster") {
    import spark.implicits._
    // hub 0 has two eps-neighbors (core); satellites 1,2 have one each
    // (borders) and are NOT within eps of each other — the core-core
    // edge set is empty, so the hub must fall back to cluster = own id
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(0.45f, 0.0f)),
      (2L, Array(-0.45f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(0.0f, 0.0f))).toDF("c_id", "c_vec")
    val out = Similarity.dbscan(pts, "vec_id", "embedding",
        cents, "c_vec", "c_id", eps = 0.5, minPts = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((0L, 0L, "core"), (1L, 0L, "border"), (2L, 0L, "border")))
  }

  test("approximate DBSCAN variants label only planted-chain members, ≥90% of the exact baseline") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.SparkEntry.queries("sim_dbscan")(spark, dir).collect()
    val ids = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id")).collect().map(_.getLong(0))
    val off = ids.max + 1
    // only the %10==0 chain families can be labeled: pairs (%10==5) and
    // naturals are noise by construction (measured margins in the query)
    val legal = ids.filter(_ % 10 == 0)
      .flatMap(b => Seq(b, off + 4 * b + 1, off + 4 * b + 2, off + 4 * b + 3)).toSet
    assert(exact.map(_.getLong(0)).forall(legal), "exact labels a non-planted id")
    Seq("sim_dbscan_lsh", "sim_dbscan_graph").foreach { q =>
      val out = graft.SparkEntry.queries(q)(spark, dir).collect()
      assert(out.map(_.getLong(0)).forall(legal), s"$q labels a non-planted id")
      assert(out.forall(r => Set("core", "border")(r.getString(2))))
      assert(out.length >= (exact.length * 9) / 10,
        s"$q recovered ${out.length} of ${exact.length} exact labels")
    }
  }

  test("ceilLog2: exact at powers of two and their neighbors (the mirror's bit-length twin)") {
    // the adaptive-LSH width r = clamp(ceilLog2(N), 8, 24) must agree
    // with the oracle's LENGTH(FORMAT('{:b}', N−1)) at EVERY N — the
    // risky spots are exact powers of two, where a transcendental
    // log2 could round either way
    assert(Similarity.ceilLog2(1) == 0 && Similarity.ceilLog2(2) == 1)
    for (k <- 1 to 40) {
      val p = 1L << k
      assert(Similarity.ceilLog2(p) == k, s"2^$k")
      assert(Similarity.ceilLog2(p + 1) == k + 1, s"2^$k + 1")
      if (p > 2) assert(Similarity.ceilLog2(p - 1) == k, s"2^$k - 1")
    }
    // bit-length identity the DuckDB twin computes: len(bin(n-1))
    for (n <- 2L to 1030L)
      assert(Similarity.ceilLog2(n) == java.lang.Long.toBinaryString(n - 1).length, s"n=$n")
  }

  test("lshBandsForWidth pins b(r) to the design formula for every width up to the cap") {
    // the r → bands table is a shared literal in both engines (a
    // runtime pow() whose last-ulp rounding differed cross-engine
    // could flip a ceil at an exact integer) — this spec is the single
    // source of truth tying the literal to ⌈8 · 1.19169^(r−8)⌉
    assert(Similarity.lshBandsForWidth.length ==
      Similarity.LshRMax - Similarity.LshR0 + 1)
    Similarity.lshBandsForWidth.zipWithIndex.foreach { case (b, i) =>
      val want = math.ceil(8.0 * math.pow(1.19169, i)).toInt
      assert(b == want, s"r=${Similarity.LshR0 + i}: table $b vs formula $want")
    }
    // the plane pool is band-major bMax × rMax — width-r hashing uses
    // each band slice's FIRST r planes, so a wider corpus EXTENDS the
    // same buckets rather than rehashing
    assert(Similarity.lshPlanePool(4).length ==
      Similarity.lshBandsForWidth.last * Similarity.LshRMax)
  }

  test("hnswInsert: empty delta is a no-op; inserted nodes land on every layer up to their level") {
    import spark.implicits._
    val pts = (0 until 32).map(i => (i.toLong, Array(i * 1.0f, (i % 5) * 3.0f)))
    val emb = pts.toDF("vec_id", "embedding")
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val g0 = Similarity.hnswBuild(base, "vec_id", "embedding",
      k = 3, rounds = 2, maxLevel = 2, bucketsFor = _ => 4)
    // empty delta: the maintained index passes through verbatim
    val noop = Similarity.hnswInsert(base, "vec_id", "embedding", g0,
      base.select("vec_id").limit(0), k = 3, beam = 6, hops = 3, maxLevel = 2)
    assert(noop.orderBy("layer", "vec_id", "rank").collect().toSeq ==
      g0.orderBy("layer", "vec_id", "rank").collect().toSeq)
    // real delta: every inserted id appears on exactly layers 0..level
    val delta = emb.filter(col("vec_id") % 4 === 0)
    val all = base.unionByName(delta)
    val g1 = Similarity.hnswInsert(all, "vec_id", "embedding", g0,
      delta.select("vec_id"), k = 3, beam = 6, hops = 3, maxLevel = 2)
    val lvls = delta.select(col("vec_id"),
        Similarity.hnswLevelExpr(col("vec_id"), 2).as("lvl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byLayer = g1.select("layer", "vec_id").distinct().collect()
      .groupBy(_.getInt(0)).map { case (l, rs) => l -> rs.map(_.getLong(1)).toSet }
    lvls.foreach { case (id, lvl) =>
      (0 to lvl).foreach(l => assert(byLayer(l).contains(id), s"$id not in layer $l"))
      ((lvl + 1) to 2).foreach(l => assert(!byLayer.getOrElse(l, Set.empty[Long]).contains(id),
        s"$id above its level in layer $l"))
    }
    // the maintained-levels path (batch-cost entry-pool derivation —
    // levels are a pure id function, so a staged membership table must
    // reproduce the legacy corpus-projection path bit for bit)
    val g1lv = Similarity.hnswInsert(all, "vec_id", "embedding", g0,
      delta.select("vec_id"), k = 3, beam = 6, hops = 3, maxLevel = 2,
      levels = Some(Similarity.hnswLevels(base, "vec_id", maxLevel = 2)))
    assert(g1lv.orderBy("layer", "vec_id", "rank").collect().toSeq ==
      g1.orderBy("layer", "vec_id", "rank").collect().toSeq,
      "maintained-levels insert must equal the corpus-derivation insert")
  }

  test("gramMatrix: exact integer cells on hand-quantizable vectors") {
    import spark.implicits._
    // components are multiples of 2^-8, so round(x·256) is exact
    val emb = Seq(
      (0L, Array(1.0f, 0.5f)),
      (1L, Array(0.25f, -0.25f))
    ).toDF("vec_id", "embedding")
    val g = Similarity.gramMatrix(emb, "vec_id", "embedding", qScale = 256.0)
    // q0 = (256, 128), q1 = (64, -64)
    assert(g(0)(0) == 256L * 256 + 64L * 64)
    assert(g(0)(1) == 256L * 128 + 64L * -64)
    assert(g(1)(0) == g(0)(1), "Gram must be symmetric")
    assert(g(1)(1) == 128L * 128 + 64L * 64)
  }

  test("powerIteration: converges to the dominant eigendirection, exactly reproducible") {
    // [[2,1],[1,2]] has eigenpairs (3, (1,1)) and (1, (1,-1)) — the
    // iterate must equalize its two components (the (1,1) direction)
    val g = Array(Array(2L, 1L), Array(1L, 2L))
    val v = Similarity.powerIteration(g, rounds = 12, scale = 1L << 20)
    assert(v(0) == v(1), s"expected (1,1) direction, got ${v.toSeq}")
    assert(math.abs(v(0) - (1L << 20)) <= 1, "iterate stays at the fixed-point scale")
    // diag(4,1): dominant axis 0 — component 1 decays toward 0
    val d = Array(Array(4L, 0L), Array(0L, 1L))
    val w = Similarity.powerIteration(d, rounds = 12, scale = 1L << 20)
    assert(w(0) == (1L << 20) && math.abs(w(1)) < 16,
      s"expected e0 direction, got ${w.toSeq}")
    // identical inputs → identical trajectory (pure integer fn)
    assert(Similarity.powerIteration(g, 12, 1L << 20).toSeq == v.toSeq)
  }

  test("sim_all_but_top: corrected vectors are orthogonal to PC1 up to truncation") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val g = graft.ops.Similarity.gramMatrix(
      graft.Tables.embeddings(spark, dir), "vec_id", "embedding", 256.0)
    val v = graft.ops.Similarity.powerIteration(g, 12, 1L << 20)
    val den = v.map(x => x * x).sum
    val rows = graft.Tables.embeddings(spark, dir).limit(50)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    rows.foreach { case (_, e) =>
      val q = e.map(x => math.floor(x.toDouble * 256.0 + 0.5).toLong)
      val proj = q.zip(v).map { case (a, b) => a * b }.sum
      val c = q.zip(v).map { case (qi, vi) => qi - (proj * vi) / den }
      val corrected = c.zip(v).map { case (a, b) => a * b }.sum
      // each component truncates by < 1, so |c·v| < Σ|vᵢ| ≤ dim·scale —
      // the bound that holds for EVERY vector
      val noise = 64L * (1L << 20)
      assert(math.abs(corrected) < noise,
        s"|corrected·v| = $corrected exceeds the truncation bound")
      // the ≥90% kill is only meaningful once the projection dwarfs the
      // truncation noise floor
      if (math.abs(proj) > 10 * noise)
        assert(math.abs(corrected) < math.abs(proj) / 10,
          s"correction must kill ≥90% of a large projection ($proj → $corrected)")
    }
  }

  test("agg_kmv_overlap: sketch estimates track the exact counts on driver data") {
    val row = graft.SparkEntry.queries("agg_kmv_overlap")(spark, "/root/testdata/sf0.001")
      .collect().head
    val (kA, kB) = (row.getLong(0), row.getLong(1))
    val (estA, estB) = (row.getLong(2), row.getLong(3))
    val (exactA, exactB) = (row.getLong(4), row.getLong(5))
    val (jaccEst, jaccExact) = (row.getLong(6), row.getLong(7))
    assert(kA == 200 && kB == 200, "vocab ≫ k at every driver SF")
    // KMV with k=200 has relative σ ≈ 1/√199 ≈ 7%; 30% is a safe gate
    assert(math.abs(estA - exactA).toDouble / exactA < 0.30, s"est_a=$estA exact_a=$exactA")
    assert(math.abs(estB - exactB).toDouble / exactB < 0.30, s"est_b=$estB exact_b=$exactB")
    // Jaccard estimator σ ≈ √(j(1−j)/k) ≤ 0.036 — 0.15 absolute gate
    assert(math.abs(jaccEst - jaccExact) < 150000L, s"est=$jaccEst exact=$jaccExact ppm")
  }

  test("sim_hard_negatives: every negative has a different label, scores descend") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("sim_hard_negatives")(spark, "/root/testdata/sf0.001")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, _, neg, _) =>
      assert(emb(q) != emb(neg), s"negative $neg shares query $q's label") }
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted(Ordering[Double].reverse).toSeq,
        "cosine must be non-increasing in rank")
    }
  }
}
