package graft.ops

import graft.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Event-time operators over the `events` table — the engine
 * generalization of the reference's scheduled-incremental "streaming"
 * (daily watermark + upsert, SURVEY.md §2.9). The same transforms run
 * unchanged under Structured Streaming (see graft.streaming.StreamOps);
 * batch versions here are the oracle-verifiable surface.
 */
object EventOps {

  /** JSON property extraction with an explicit schema — generalizes the
    * reference's per-field API-payload parsing (ingest_stocks.py:52-63). */
  def jsonProps(events: DataFrame): DataFrame =
    events.withColumn("k",
      from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).getField("k"))

  /** Tumbling 1-hour event-time windows: count + exact value sum per
    * (window, event_type). One shuffle; map-side partial aggregation. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(Det.ntz(col("w.start")).as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Hopping (sliding) event-time windows — 1-hour windows starting
    * every 30 minutes, so each event lands in size/slide = 2 windows.
    * Spark replicates rows into their windows BEFORE the aggregate, so
    * this stays one shuffle with map-side partials (shuffle volume =
    * size/slide × input, the unavoidable cost of overlap). */
  def hoppingHourBy30(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(Det.ntz(col("w.start")).as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Session windows per user with a fixed inactivity gap: a new session
    * starts when the quiet time is ≥ gap. Emits start/end/count. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), Det.ntz(col("w.start")).as("session_start"),
        Det.ntz(col("w.end")).as("session_end"), col("n_events"))

  /** Conditional-aggregation pivot on event type (fixed domain, so the
    * output schema is static and oracle-expressible). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def pivotByType(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .toDF("user_id" +: EventTypes.map("n_" + _): _*)
}
