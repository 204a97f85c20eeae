package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus sampling for training-data mixes: per-stratum downsampling
 * (rebalance languages/sources) and deterministic per-key top-k.
 *
 * Two flavors with different determinism contracts:
 *  - [[downsampleByKey]] wraps Bernoulli `sampleBy` — statistically
 *    uniform, seed-stable for a fixed partitioning, the right tool for
 *    "keep ~10% of language X".
 *  - [[deterministicPerKey]] keeps exactly `k` rows per key chosen by
 *    hash order — fully reproducible across cluster layouts (the hash
 *    depends only on row ids), the right tool for eval-set carve-outs
 *    that must never drift between runs.
 *
 * Both are one narrow pass plus (for per-key) one window shuffle.
 */
object Sampling {

  /** Bernoulli stratified downsample: `fractions(key) → keep-rate`;
    * keys absent from the map are kept entirely.
    *
    * The distinct-key collect is the ONLY data-dependent driver-side
    * materialization in the sampling family. It is bounded by stratum
    * cardinality (languages/sources — tens, not millions), and the
    * `require` makes a mis-keyed call (e.g. stratifying on doc_id)
    * fail loudly instead of OOMing the driver. */
  def downsampleByKey(df: DataFrame, keyCol: String,
                      fractions: Map[String, Double], seed: Long,
                      maxStrata: Int = 10000): DataFrame = {
    val allKeys = df.select(col(keyCol)).distinct()
      .limit(maxStrata + 1).collect().map(_.get(0).toString)
    require(allKeys.length <= maxStrata,
      s"downsampleByKey: over $maxStrata distinct '$keyCol' strata — " +
        "this column is not a stratum key; use deterministicPerKey/mixturePerKey")
    val full = allKeys.map(k => k -> fractions.getOrElse(k, 1.0)).toMap
    df.stat.sampleBy(keyCol, full, seed)
  }

  /** Exactly `k` rows per key, selected by xxhash64(id) order —
    * deterministic for a given id column regardless of partitioning. */
  def deterministicPerKey(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic train/val/test assignment by hashed id — the split
    * step of a training-data pipeline (dedup → filter → mix → SPLIT →
    * pack). The first byte of `md5(id)` lands uniformly in 00..ff;
    * comparing it against hex thresholds partitions ids at
    * `floor(256·frac)/256` granularity. Properties that matter at any
    * scale: stateless (an id's split never depends on other rows, so
    * re-runs and incremental batches agree), no shuffle (pure
    * projection), and engine-portable (MD5 is standardized — unlike
    * xxhash64, which DuckDB lacks — so the oracle hashes the exact
    * assignment). NULL ids get NULL splits (surfaced, not silently
    * bucketed). */
  def hashSplit(df: DataFrame, idCol: String,
                trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1.0,
      s"hashSplit: need 0 < trainFrac, 0 <= valFrac, trainFrac+valFrac < 1 " +
        s"(got $trainFrac, $valFrac)")
    val t1 = f"${(trainFrac * 256).toInt}%02x"
    val t2 = f"${((trainFrac + valFrac) * 256).toInt}%02x"
    // thresholds floor to 1/256 granularity: a positive fraction that
    // floors to an existing boundary would make that split silently
    // EMPTY — fail loudly instead of shipping a zero-row split
    require(t1 > "00",
      s"hashSplit: trainFrac $trainFrac floors below 1/256 — train would be empty")
    require(valFrac == 0 || t2 > t1,
      s"hashSplit: valFrac $valFrac floors to zero width at 1/256 granularity " +
        "— val would be empty")
    val b = substring(md5(col(idCol).cast("string")), 1, 2)
    df.withColumn("split",
      when(col(idCol).isNull, lit(null).cast("string"))
        .when(b < t1, lit("train"))
        .when(b < t2, lit("val"))
        .otherwise(lit("test")))
  }

  /** DuckDB SQL mirror of [[hashSplit]]'s assignment expression. */
  def hashSplitSql(idCol: String, trainFrac: Double = 0.8,
                   valFrac: Double = 0.1): String = {
    val t1 = f"${(trainFrac * 256).toInt}%02x"
    val t2 = f"${((trainFrac + valFrac) * 256).toInt}%02x"
    s"""CASE WHEN $idCol IS NULL THEN NULL
       |     WHEN substr(md5(CAST($idCol AS VARCHAR)), 1, 2) < '$t1' THEN 'train'
       |     WHEN substr(md5(CAST($idCol AS VARCHAR)), 1, 2) < '$t2' THEN 'val'
       |     ELSE 'test' END""".stripMargin
  }

  /** Training-mix materialization: per-key row CAPS (e.g. "at most
    * 100k en docs, 10k zh docs, `default` for unlisted sources"),
    * selected in the same deterministic hash order as
    * [[deterministicPerKey]] so reruns and re-partitions pick the SAME
    * mix. One window shuffle + a broadcast join against the tiny cap
    * table — the cap map lives on executors, never drives a collect. */
  def mixturePerKey(df: DataFrame, keyCol: String, idCol: String,
                    caps: Map[String, Int], default: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val capDf = broadcast(caps.toSeq.toDF(keyCol, "__cap"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .join(capDf, Seq(keyCol), "left")
      .filter(col("__rn") <= coalesce(col("__cap"), lit(default)))
      .select(df.columns.map(col).toIndexedSeq: _*) // using-join moved the key first
  }
}
