package graft.tools
import graft.Tables
import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object TimeText {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    docs.count()
    def time(name: String)(c: org.apache.spark.sql.Column): Unit = {
      (1 to 2).foreach { it =>
        val t0 = System.nanoTime()
        docs.select(col("doc_id"), c.as("x")).write.format("noop").mode("overwrite").save()
        if (it == 2) println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("tokenCount")(TextOps.tokenCount(col("text")))
    time("bpeish")(TextOps.bpeishTokenCount(col("text")))
    time("stopword")(TextOps.stopwordCount(col("text")))
    time("quality")(TextOps.qualityScore(col("text")))
    time("langId")(TextOps.langId(col("text")))
    time("md5")(TextOps.md5Fingerprint(col("text")))
    time("bagFp")(TextOps.normalizedFingerprint(col("text")))
    time("rollingHash")(TextOps.rollingHash(col("text")))
    spark.stop()
  }
}
