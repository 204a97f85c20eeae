package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Builds a scaled-up bench dataset from the largest driver SF by
 * replication — the scale-curve harness behind SCALING.md: the driver
 * ships sf ≤ 0.1, and the 100 TB claims deserve at least one measured
 * point beyond that, so `ScaleUp <srcDir> <dstDir> <replicas>` writes
 * an sf0.1×N dataset for the tables the headline operators read
 * (documents, embeddings, lineitem).
 *
 * Replication is workload-shape-aware, not naive:
 *  - `documents`: ids offset per replica AND token order permuted by a
 *    deterministic per-replica md5 key — a verbatim copy would give
 *    every doc N−1 exact near-duplicates and blow the dedup workload's
 *    pair density 100× past anything a real corpus has; permuting
 *    destroys the shingle sets while preserving token/length/quality
 *    statistics, so dedup/BM25/quality costs scale the way corpus
 *    GROWTH scales, not the way corpus COPYING would.
 *  - `embeddings`: ids offset AND every replica vector perturbed by
 *    deterministic per-(id, component) jitter of amplitude 0.15σ
 *    (σ = the corpus's own component stddev, measured once) — a
 *    verbatim copy left the sf1 ANN corpus 90% exact duplicates
 *    (distances degenerate to 0, near-dup pair density blows up
 *    N×), where the jitter keeps the component distribution's shape
 *    while giving replicas realistic nonzero distances, so ANN and
 *    semantic-dedup curves measure corpus GROWTH.
 *  - `lineitem`: order keys offset per replica (key-space grows with
 *    the data, as TPC-H scaling does); dates untouched so partition
 *    layouts deepen rather than widen — the harder incremental case.
 *
 * Bench-only data: correctness stays at the driver SFs with the
 * DuckDB oracle; nothing here feeds the correctness gate.
 */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <replicas>")
    val Array(src, dst, repStr) = args
    val reps = repStr.toInt
    require(reps >= 1 && reps <= 100, s"replicas out of range: $reps")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, perReplica: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until reps).map(i => perReplica(df, i)).reduce(_ unionByName _)

    // documents: offset ids, permute token order with a per-replica key
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docOff = docs.agg(coalesce(max("doc_id"), lit(0L))).head.getLong(0) + 1
    val docsN = replicate(docs, { (d, i) =>
      if (i == 0) d
      else {
        val toks = filter(split(col("text"), " "), t => length(t) > 0)
        val keyed = transform(toks, t => struct(md5(concat(t, lit(i.toString))).as("k"), t.as("v")))
        d.withColumn("doc_id", col("doc_id") + lit(i * docOff))
          .withColumn("text", concat_ws(" ", transform(array_sort(keyed), s => s("v"))))
      }
    })
    docsN.repartition(32).write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val idCol = emb.columns.find(_.endsWith("_id")).getOrElse(emb.columns.head)
    val embOff = emb.agg(coalesce(max(idCol), lit(0L))).head.getLong(0) + 1
    val vecCol = emb.schema.fields
      .find(_.dataType.typeName == "array").map(_.name).getOrElse("embedding")
    // jitter amplitude from the corpus itself, MIXED per replica family
    // (r16, closing the r15 eps-density caveat): a single 0.15σ
    // amplitude put every base + its 9 replicas in a 10-clique at
    // d ≈ 0.087 ≪ any eps of interest, so eps-family queries (dbscan,
    // range search) saw planted-clique pair density at sf1, not corpus
    // growth. Now 1 base family in 8 keeps the near jitter (the corpus
    // still carries realistic near-duplicates for the ANN/semantic-
    // dedup workloads), and the other 7 get 1.5σ — E[replica-to-base
    // distance] ≈ σ·1.5·√(64/3) ≈ 0.87 with min > 0.5 at ~6σ, so those
    // replicas are eps-ISOLATED organic points (far replica pairs of
    // one base sit ~√2·0.87 apart; hitting within eps of an unrelated
    // base is a 64-dim volume event, negligible).
    val sigma = emb.select(explode(col(vecCol)).as("x"))
      .agg(stddev_pop(col("x"))).head.getDouble(0)
    val ampNear = 0.15 * sigma
    val ampFar = 1.5 * sigma
    val embN = replicate(emb, { (d, i) =>
      if (i == 0) d
      else {
        val amp = when(col(idCol) % lit(embOff) % 8 === 0, lit(ampNear))
          .otherwise(lit(ampFar))
        d.withColumn(idCol, col(idCol) + lit(i * embOff))
          // per-(new id, component) hash → uniform in [-amp, amp];
          // md5-derived like every other determinism anchor in the repo
          .withColumn(vecCol, transform(col(vecCol), (x, j) =>
            (x + amp * (((xxhash64(col(idCol), j) % 10001L + 10001L) % 10001L)
              .cast("double") / 5000.0 - 1.0)).cast("float")))
      }
    })
    embN.repartition(32).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // lineitem + orders share the orderkey space — offset both by the
    // SAME base (max over either side) so the fact-fact join stays
    // consistent at every replica. Customers/parts/suppliers are held
    // constant (dims don't scale 1:1 with facts in real warehouses),
    // so per-entity fan-outs DEEPEN by N× — the harder aggregate case.
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val keyOff = math.max(
      li.agg(coalesce(max("l_orderkey"), lit(0L))).head.getLong(0),
      ord.agg(coalesce(max("o_orderkey"), lit(0L))).head.getLong(0)) + 1
    val liN = replicate(li, { (d, i) =>
      if (i == 0) d else d.withColumn("l_orderkey", col("l_orderkey") + lit(i * keyOff))
    })
    liN.repartition(32).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    val ordN = replicate(ord, { (d, i) =>
      if (i == 0) d else d.withColumn("o_orderkey", col("o_orderkey") + lit(i * keyOff))
    })
    ordN.repartition(8).write.mode("overwrite").parquet(s"$dst/orders.parquet")

    // dims + events copied verbatim (events feed no headline scale op;
    // present so any query can run against the scaled dir)
    Seq("customer", "supplier", "part", "nation", "region", "events").foreach { t =>
      val p = new java.io.File(s"$src/$t.parquet")
      if (p.exists)
        spark.read.parquet(p.toString).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    println(s"""{"scaled":"$dst","replicas":$reps,"docs":${docsN.count()},"emb":${embN.count()},"lineitem":${liN.count()},"orders":${ordN.count()}}""")
    spark.stop()
  }
}
