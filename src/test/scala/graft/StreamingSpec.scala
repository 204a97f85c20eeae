package graft

import graft.engine.Warehouse
import graft.ops.EventOps
import graft.streaming.StreamOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming == batch for the shared transforms; custom stateful dedup
  * and the foreachBatch upsert sink across micro-batches. */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  /** Write one parquet file of events; returns the directory. */
  private def eventDir(rowsByFile: Seq[Seq[(Long, String, Long, String, Double, String)]]): String = {
    import spark.implicits._
    val dir = tmp("graft_stream_in")
    rowsByFile.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", col("ts").cast("timestamp"))
        .coalesce(1).write.mode("append").parquet(dir)
      // distinct mtimes keep file-source batch order deterministic
      Thread.sleep(20)
    }
    dir
  }

  private val baseRows = Seq(
    (1L, "2024-01-01 10:05:00", 1L, "click", 1.5, "{}"),
    (2L, "2024-01-01 10:50:00", 1L, "view", 2.5, "{}"),
    (3L, "2024-01-01 11:10:00", 2L, "click", 4.0, "{}"),
    (4L, "2024-01-01 12:45:00", 2L, "purchase", 8.0, "{}"))

  private def schemaOf(dir: String) = spark.read.parquet(dir).schema

  test("streaming tumbling agg (complete mode) equals the batch result") {
    val dir = eventDir(Seq(baseRows))
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir))
    StreamOps.runAvailableNowToMemory(
      EventOps.tumblingHourly(stream), "tumbling_out", tmp("graft_ck"), outputMode = "complete")
    val streamed = spark.table("tumbling_out").orderBy("window_start", "event_type").collect()
    val batch = EventOps.tumblingHourly(spark.read.parquet(dir))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming hopping agg (complete mode) equals the batch result") {
    val dir = eventDir(Seq(baseRows))
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir))
    StreamOps.runAvailableNowToMemory(
      EventOps.hoppingHourBy30(stream), "hopping_out", tmp("graft_ck"), outputMode = "complete")
    val streamed = spark.table("hopping_out").orderBy("window_start", "event_type").collect()
    val batch = EventOps.hoppingHourBy30(spark.read.parquet(dir))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
  }

  test("watermarked append emits exactly the closed windows") {
    val dir = eventDir(Seq(baseRows))
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir))
    StreamOps.runAvailableNowToMemory(
      StreamOps.tumblingHourlyStream(stream, delay = "1 hour"), "tumbling_wm", tmp("graft_ck"))
    // watermark settles at max(ts) - 1h = 11:45; append emits windows
    // whose END <= watermark → only the 10:00 window (ends 11:00). The
    // 11:00 window (ends 12:00) and the live 12:00 window stay open.
    val hours = spark.table("tumbling_wm").collect()
      .map(_.getAs[java.time.LocalDateTime]("window_start").getHour).toSet
    assert(hours == Set(10))
  }

  test("streaming insert-only dedup keeps the first row per key across batches") {
    val dir = eventDir(Seq(
      Seq((1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "a"),
          (2L, "2024-01-01 10:01:00", 2L, "view", 2.0, "b")),
      Seq((3L, "2024-01-01 10:02:00", 2L, "view", 99.0, "c"),   // dup key user 2
          (4L, "2024-01-01 10:03:00", 3L, "click", 3.0, "d"))))
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1))
    StreamOps.runAvailableNowToMemory(
      StreamOps.streamingInsertOnlyDedup(stream, Seq("user_id")), "dedup_out", tmp("graft_ck"),
      outputMode = "append")
    val out = spark.table("dedup_out").orderBy("user_id")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")))
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 4L))) // event 3 dropped: key 2 seen
  }

  test("foreachBatch upsert sink merges micro-batches by key, staged wins") {
    import spark.implicits._
    val dir = eventDir(Seq(
      Seq((1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "v1"),
          (2L, "2024-01-01 10:01:00", 2L, "view", 2.0, "v1")),
      Seq((2L, "2024-01-01 10:02:00", 2L, "view", 2.0, "v2"))))   // restates event 2
    val wh = new Warehouse(spark, tmp("graft_stream_wh"))
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1))
    val q = StreamOps.upsertSink(stream, wh, "silver", "events", Seq("event_id"), tmp("graft_ck"))
    q.awaitTermination()
    val out = wh.read("silver", "events").orderBy("event_id")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[String]("props")))
    assert(out.toSeq == Seq((1L, "v1"), (2L, "v2"))) // later batch won on key 2
  }

  test("running count accumulates state across micro-batches (update mode)") {
    val dir = eventDir(Seq(
      Seq((1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "{}"),
          (2L, "2024-01-01 10:01:00", 1L, "view", 1.0, "{}"),
          (3L, "2024-01-01 10:02:00", 2L, "click", 1.0, "{}")),
      Seq((4L, "2024-01-01 10:03:00", 1L, "click", 1.0, "{}"))))
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1))
    StreamOps.runAvailableNowToMemory(
      StreamOps.streamingRunningCount(stream, "user_id").toDF("key", "n"),
      "running_out", tmp("graft_ck"), outputMode = "update")
    // update mode appends each refresh; the max per key is the final count
    val finals = spark.table("running_out").groupBy("key").agg(max("n").as("n"))
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(finals.toSeq == Seq(("1", 3L), ("2", 1L)))
  }

  test("stream-stream join correlates events within the time bound") {
    val dir = eventDir(Seq(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 10:20:00", 1L, "purchase", 5.0, "{}"),   // within 1h of click 1
      (3L, "2024-01-01 12:00:00", 1L, "purchase", 7.0, "{}"),   // outside the bound
      (4L, "2024-01-01 10:10:00", 2L, "purchase", 9.0, "{}"),   // other user, no click
      (99L, "2024-01-02 23:00:00", 99L, "view", 0.0, "{}"))))   // watermark sentinel
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir))
    StreamOps.runAvailableNowToMemory(
      StreamOps.correlatedEvents(stream, "click", "purchase", "1 hour"),
      "corr_out", tmp("graft_ck"))
    val out = spark.table("corr_out").orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("dropDuplicatesWithinWatermark keeps one row per key across batches") {
    val dir = eventDir(Seq(
      Seq((1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "a"),
          (1L, "2024-01-01 10:00:30", 1L, "click", 1.0, "b")),  // dup id, same batch
      Seq((1L, "2024-01-01 10:05:00", 1L, "click", 1.0, "c"),   // dup id, next batch
          (2L, "2024-01-01 10:06:00", 2L, "view", 2.0, "d"))))
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1))
    StreamOps.runAvailableNowToMemory(
      StreamOps.dedupWithinWatermark(stream, Seq("event_id"), "1 hour"),
      "ddwm_out", tmp("graft_ck"))
    val out = spark.table("ddwm_out").orderBy("event_id")
      .collect().map(_.getAs[Long]("event_id"))
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("streaming contamination gate equals the batch decontamination pass") {
    import spark.implicits._
    import graft.ops.Dedup
    val docsDir = tmp("graft_docs_in")
    Seq(
      (1L, "a b c d e xx yy zz"),            // shares 3 trigrams with the benchmark
      (2L, "totally different words here now"),
      (3L, "c d e f g something else here"), // shares 3 trigrams
      (4L, "a b q c d q e f"))               // interleaved: no shared trigram
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(docsDir)
    val benchmark = Seq((100L, "a b c d e f g")).toDF("doc_id", "text")
    val stream = spark.readStream.schema(spark.read.parquet(docsDir).schema).parquet(docsDir)
    StreamOps.runAvailableNowToMemory(
      StreamOps.contaminationStream(stream, benchmark, "doc_id", "text", n = 3, minShared = 2),
      "contam_out", tmp("graft_ck"), outputMode = "complete")
    val streamed = spark.table("contam_out").orderBy("doc_id", "bench_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id"), r.getAs[Long]("n_shared")))
    val batch = Dedup.contamination(spark.read.parquet(docsDir), benchmark,
        "doc_id", "text", n = 3, minShared = 2)
      .orderBy("doc_id", "bench_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id"), r.getAs[Long]("n_shared")))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.map(_._1).toSet == Set(1L, 3L))
  }

  test("incremental retention sink equals batch retention across out-of-order batches") {
    val dir = eventDir(Seq(
      Seq((1L, "2024-01-03 10:00:00", 1L, "click", 1.0, "{}"),   // user 1 first seen Jan 3
          (2L, "2024-01-03 11:00:00", 2L, "view", 1.0, "{}")),
      Seq((3L, "2024-01-01 09:00:00", 1L, "click", 1.0, "{}"),   // LATE batch: user 1's
          (4L, "2024-01-05 09:00:00", 2L, "click", 1.0, "{}")),  // true cohort is Jan 1
      Seq((5L, "2024-01-03 12:00:00", 1L, "view", 1.0, "{}"),    // dup day for user 1
          (6L, "2024-01-04 12:00:00", 3L, "view", 1.0, "{}"))))
    val wh = new Warehouse(spark, tmp("graft_ret_wh"))
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1))
    StreamOps.retentionSink(stream, wh, "gold", tmp("graft_ck")).awaitTermination()
    val streamed = StreamOps.retentionFromWarehouse(wh, "gold")
      .orderBy("cohort_d", "day_offset").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    val batch = EventOps.retentionCohorts(spark.read.parquet(dir), "user_id", "ts")
      .orderBy("cohort_d", "day_offset").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
    // the late batch moved user 1's cohort back to Jan 1 (min-merge):
    // Jan 1 cohort has day offsets 0 (Jan 1) and 2 (Jan 3)
    assert(streamed.filter(_._1 == "2024-01-01").map(x => (x._2, x._3)).toSeq ==
      Seq((0, 1L), (2, 1L)))
  }

  test("incremental funnel equals batch funnel across out-of-order batches") {
    val stages = Seq("signup", "view", "click")
    val dir = eventDir(Seq(
      Seq((1L, "2024-01-01 12:00:00", 1L, "view", 1.0, "{}"),     // view BEFORE signup arrives
          (2L, "2024-01-01 13:00:00", 2L, "view", 1.0, "{}")),
      Seq((3L, "2024-01-01 10:00:00", 1L, "signup", 1.0, "{}"),   // late signup: makes the
          (4L, "2024-01-01 11:00:00", 2L, "signup", 1.0, "{}"),   // earlier views qualify
          (5L, "2024-01-01 12:30:00", 1L, "click", 1.0, "{}"),
          (6L, "2024-01-01 12:30:00", 1L, "click", 1.0, "{}")),   // same-instant duplicate
      Seq((7L, "2024-01-03 13:30:00", 2L, "click", 1.0, "{}"))))  // >1 day after view
    val wh = new Warehouse(spark, tmp("graft_fun_wh"))
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1))
    StreamOps.funnelEventsSink(stream, wh, "gold", stages, tmp("graft_ck")).awaitTermination()
    val all = spark.read.parquet(dir)
    // unbounded: both users complete all three stages
    val streamed = StreamOps.funnelFromWarehouse(wh, "gold", stages)
      .orderBy("stage_idx").collect().map(_.getLong(2))
    val batch = EventOps.funnel(all, "user_id", "event_type", "ts", stages)
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(streamed.toSeq == batch.toSeq && streamed.toSeq == Seq(2L, 2L, 2L))
    // windowed (1 day): user 2's click lands too late — both forms agree
    val g = expr("INTERVAL 1 DAY")
    val streamedW = StreamOps.funnelFromWarehouse(wh, "gold", stages, Some(g))
      .orderBy("stage_idx").collect().map(_.getLong(2))
    val batchW = EventOps.funnelWindowed(all, "user_id", "event_type", "ts", stages, g)
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(streamedW.toSeq == batchW.toSeq && streamedW.toSeq == Seq(2L, 2L, 1L))
    // the compacted index holds only distinct funnel-stage triples
    assert(wh.read("gold", "stage_events").count() == 6) // 7 events, 1 duplicate
  }

  test("quarantine sink: dead-letter lane with raw payloads, exactly-once on replay") {
    import graft.engine.SnapshotStore
    val dir = eventDir(Seq(
      Seq((1L, "2024-01-01 10:00:00", 1L, "view", 1.0, """{"k": 5}"""),
          (2L, "2024-01-01 10:01:00", 1L, "view", 1.0, """{"k":""")),   // truncated junk
      Seq((3L, "2024-01-01 10:02:00", 2L, "view", 1.0, """not json"""),
          (4L, "2024-01-01 10:03:00", 2L, "view", 1.0, """{"k": 9}"""))))
    val st = new SnapshotStore(spark, tmp("graft_dlq"))
    val ck = tmp("graft_ck")
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1))
    StreamOps.quarantineSink(stream, st, "bronze", ck).awaitTermination()
    val good = st.read("bronze", "parsed").orderBy("event_id")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Int]("k")))
    assert(good.toSeq == Seq((1L, 5), (4L, 9)))
    val bad = st.read("bronze", "quarantine").orderBy("event_id")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[String]("raw_payload")))
    assert(bad.toSeq == Seq((2L, """{"k":"""), (3L, """not json""")),
      "rejects keep their raw payload for replay")
    // drained rerun from the same checkpoint: nothing commits twice
    StreamOps.quarantineSink(
      StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1)),
      st, "bronze", ck).awaitTermination()
    assert(st.read("bronze", "parsed").count() == 2)
    assert(st.read("bronze", "quarantine").count() == 2)
  }

  test("two streaming queries into one table keep separate txn namespaces") {
    import graft.engine.SnapshotStore
    // both queries number their batches from 0; a bare batch-id txn tag
    // would make the second query's commits read as replays of the
    // first's and silently drop them
    val dirA = eventDir(Seq(baseRows.take(2)))
    val dirB = eventDir(Seq(baseRows.drop(2)))
    val st = new SnapshotStore(spark, tmp("graft_twoq"))
    val ckA = tmp("graft_ck_a")
    StreamOps.appendOnlySink(
      StreamOps.eventStream(spark, dirA, schemaOf(dirA)),
      st, "bronze", "events", ckA).awaitTermination()
    StreamOps.appendOnlySink(
      StreamOps.eventStream(spark, dirB, schemaOf(dirB)),
      st, "bronze", "events", tmp("graft_ck_b")).awaitTermination()
    import spark.implicits._
    assert(st.read("bronze", "events").select("event_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      "the second query's batch 0 must not be dropped as a 'replay' of the first's")
    // replay-dedup still holds per query: a drained rerun of A from its
    // OWN checkpoint commits nothing twice
    StreamOps.appendOnlySink(
      StreamOps.eventStream(spark, dirA, schemaOf(dirA)),
      st, "bronze", "events", ckA).awaitTermination()
    assert(st.read("bronze", "events").count() == 4)
  }

  test("incremental transition matrix equals batch across out-of-order batches") {
    val dir = eventDir(Seq(
      Seq((2L, "2024-01-01 11:00:00", 1L, "click", 1.0, "{}"),   // arrives BEFORE its
          (4L, "2024-01-01 10:30:00", 2L, "view", 1.0, "{}")),   // predecessor event
      Seq((1L, "2024-01-01 10:00:00", 1L, "view", 1.0, "{}"),    // late: rewrites user 1's
          (3L, "2024-01-01 12:00:00", 1L, "click", 1.0, "{}")),  // first transition
      Seq((4L, "2024-01-01 10:30:00", 2L, "view", 1.0, "{}"),    // exact replayed duplicate
          (5L, "2024-01-01 11:00:00", 2L, "buy", 1.0, "{}"))))
    val wh = new Warehouse(spark, tmp("graft_tr_wh"))
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1))
    StreamOps.transitionEventsSink(stream, wh, "gold", tmp("graft_ck")).awaitTermination()
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("from_type", "to_type").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val streamed = shape(StreamOps.transitionsFromWarehouse(wh, "gold"))
    val batch = shape(EventOps.transitionMatrix(
      spark.read.parquet(dir).distinct(), "user_id", "event_type", "ts", "event_id"))
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
    // the late view became user 1's first event: view→click, click→click;
    // user 2: view→buy (replay deduped by the insert-only merge)
    assert(streamed.toSeq == Seq(
      ("click", "click", 1L, 1.0), ("view", "buy", 1L, 0.5), ("view", "click", 1L, 0.5)))
    assert(wh.read("gold", "transition_events").count() == 5) // 6 rows, 1 replay
  }

  test("stream-static anomaly screen matches batch z-scores; unseen keys score NULL") {
    import graft.ops.TimeSeries
    import spark.implicits._
    // per-user values with one clear spike for user 1
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "m", 10.0, "{}"),
      (2L, "2024-01-01 11:00:00", 1L, "m", 10.0, "{}"),
      (3L, "2024-01-01 12:00:00", 1L, "m", 10.0, "{}"),
      (4L, "2024-01-01 13:00:00", 1L, "m", 10.0, "{}"),
      (5L, "2024-01-01 14:00:00", 1L, "m", 110.0, "{}"),
      (6L, "2024-01-01 10:30:00", 2L, "m", 5.0, "{}"))
    val dir = eventDir(Seq(rows))
    val history = spark.read.parquet(dir)
    val baseline = TimeSeries.zscoreBaseline(history, Seq("user_id"), "value")
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir))
    StreamOps.runAvailableNowToMemory(
      StreamOps.anomalyStream(stream, baseline, Seq("user_id"), "value", threshold = 1.5),
      "anomaly_out", tmp("graft_ck"))
    val streamed = spark.table("anomaly_out")
      .select("event_id", "zscore", "is_anomaly").orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val batch = TimeSeries.zscoreAnomalies(history, Seq("user_id"), "value",
      threshold = 1.5)
      .select("event_id", "zscore", "is_anomaly").orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.count(_._3) == 1 && streamed(4)._3, "only the spike flags")

    // a key absent from the baseline scores NULL, not a phantom number
    val novel = StreamOps.anomalyStream(
      Seq((7L, 9L, 1.0)).toDF("event_id", "user_id", "value"),
      baseline, Seq("user_id"), "value").collect().head
    assert(novel.isNullAt(novel.fieldIndex("zscore"))
      && novel.isNullAt(novel.fieldIndex("is_anomaly")))

    // a value DEVIATING from a zero-variance baseline is the most
    // extreme anomaly there is — it must flag (z = ±∞), not score 0
    val constBase = TimeSeries.zscoreBaseline(
      Seq((2L, 5.0), (2L, 5.0)).toDF("user_id", "value"), Seq("user_id"), "value")
    val dev = StreamOps.anomalyStream(
      Seq((8L, 2L, 9999.0), (9L, 2L, 5.0)).toDF("event_id", "user_id", "value"),
      constBase, Seq("user_id"), "value").orderBy("event_id").collect()
    assert(dev(0).getDouble(dev(0).fieldIndex("zscore")).isPosInfinity
      && dev(0).getBoolean(dev(0).fieldIndex("is_anomaly")))
    assert(dev(1).getDouble(dev(1).fieldIndex("zscore")) == 0.0
      && !dev(1).getBoolean(dev(1).fieldIndex("is_anomaly")))

    // a stream already carrying the baseline stat columns would make the
    // join ambiguous (or score against the wrong column) — refused loudly
    val e = intercept[IllegalArgumentException] {
      StreamOps.anomalyStream(
        Seq((10L, 2L, 1.0, 0.0)).toDF("event_id", "user_id", "value", "mean_c"),
        constBase, Seq("user_id"), "value")
    }
    assert(e.getMessage.contains("mean_c"))
  }

  test("streaming sessions match batch sessions once all windows close") {
    val dir = eventDir(Seq(baseRows :+
      (99L, "2024-01-02 23:59:59", 99L, "click", 0.0, "{}"))) // sentinel advances watermark
    val stream = StreamOps.eventStream(spark, dir, schemaOf(dir))
    StreamOps.runAvailableNowToMemory(
      StreamOps.sessionsStream(stream, gap = "30 minutes", delay = "1 minute"),
      "sessions_out", tmp("graft_ck"))
    val streamed = spark.table("sessions_out")
      .filter(col("user_id") =!= 99).orderBy("user_id", "session_start").collect()
    val batch = EventOps.sessions(spark.read.parquet(dir).filter(col("user_id") =!= 99))
      .orderBy("user_id", "session_start").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("knnInsertSink: streamed batches equal sequential nnDescentInsert; replay is a no-op") {
    import spark.implicits._
    import graft.ops.Similarity
    import graft.engine.SnapshotStore
    val pts = (0 until 24).map(i => (i.toLong, Array(i * 1.0f, (i % 7) * 2.0f)))
    val emb = pts.toDF("vec_id", "embedding")
    val b0 = emb.filter(col("vec_id") % 4 =!= 0)
    val batch1 = emb.filter(col("vec_id") % 8 === 0)
    val batch2 = emb.filter(col("vec_id") % 8 === 4)
    val root = tmp("graft_knn_sink")
    val st = new SnapshotStore(spark, s"$root/store")
    st.overwrite(b0, "ann", "vectors")
    st.overwrite(Similarity.nnDescent(b0, "vec_id", "embedding",
      k = 3, rounds = 2, buckets = 4), "ann", "graph")
    val staged = s"$root/in"
    batch1.coalesce(1).write.parquet(staged)
    Thread.sleep(20)
    batch2.coalesce(1).write.mode("append").parquet(staged)
    val ck = s"$root/ckpt"
    def run(): Unit = StreamOps.knnInsertSink(
      StreamOps.eventStream(spark, staged, spark.read.parquet(staged).schema,
        maxFilesPerTrigger = Some(1)),
      st, "ann", "vec_id", "embedding", k = 3, beam = 6, hops = 3, entries = 8,
      checkpoint = ck).awaitTermination()
    run()
    val streamed = st.read("ann", "graph").orderBy("vec_id", "rank").collect().toSeq
    // sequential batch replay must agree exactly
    val g0 = Similarity.nnDescent(b0, "vec_id", "embedding", k = 3, rounds = 2, buckets = 4)
    val e1 = b0.unionByName(batch1)
    val g1 = Similarity.nnDescentInsert(e1, "vec_id", "embedding", g0,
      batch1.select("vec_id"), k = 3, beam = 6, hops = 3, entries = 8)
    val e2 = e1.unionByName(batch2)
    val g2 = Similarity.nnDescentInsert(e2, "vec_id", "embedding", g1,
      batch2.select("vec_id"), k = 3, beam = 6, hops = 3, entries = 8)
    val replayed = g2.orderBy("vec_id", "rank").collect().toSeq
    assert(streamed == replayed, "streamed graph must equal sequential batch inserts")
    // checkpoint replay: re-running the drained stream changes nothing
    run()
    val again = st.read("ann", "graph").orderBy("vec_id", "rank").collect().toSeq
    assert(again == streamed, "replaying a drained stream must be a no-op")
    // all inserted nodes present with non-empty lists
    val ids = streamed.map(_.getLong(0)).toSet
    assert((0 until 24 by 8).forall(i => ids.contains(i.toLong)))
    assert((4 until 24 by 8).forall(i => ids.contains(i.toLong)))
  }

  test("hnswInsertSink: streamed batches equal sequential hnswInsert; replay is a no-op") {
    import spark.implicits._
    import graft.ops.Similarity
    import graft.engine.SnapshotStore
    val pts = (0 until 48).map(i => (i.toLong, Array(i * 1.0f, (i % 7) * 2.0f)))
    val emb = pts.toDF("vec_id", "embedding")
    val b0 = emb.filter(col("vec_id") % 4 =!= 0)
    val batch1 = emb.filter(col("vec_id") % 8 === 0)
    val batch2 = emb.filter(col("vec_id") % 8 === 4)
    val root = tmp("graft_hnsw_sink")
    val st = new SnapshotStore(spark, s"$root/store")
    st.overwrite(b0, "hnsw", "vectors")
    st.overwrite(Similarity.hnswBuild(b0, "vec_id", "embedding",
      k = 3, rounds = 2, maxLevel = 2, bucketsFor = _ => 4), "hnsw", "graph")
    val staged = s"$root/in"
    batch1.coalesce(1).write.parquet(staged)
    Thread.sleep(20)
    batch2.coalesce(1).write.mode("append").parquet(staged)
    val ck = s"$root/ckpt"
    def run(): Unit = StreamOps.hnswInsertSink(
      StreamOps.eventStream(spark, staged, spark.read.parquet(staged).schema,
        maxFilesPerTrigger = Some(1)),
      st, "hnsw", "vec_id", "embedding", k = 3, beam = 6, hops = 3,
      maxLevel = 2, entries = 8, checkpoint = ck).awaitTermination()
    run()
    val streamed = st.read("hnsw", "graph")
      .orderBy("layer", "vec_id", "rank").collect().toSeq
    // sequential batch replay must agree exactly
    val g0 = Similarity.hnswBuild(b0, "vec_id", "embedding",
      k = 3, rounds = 2, maxLevel = 2, bucketsFor = _ => 4)
    val e1 = b0.unionByName(batch1)
    val g1 = Similarity.hnswInsert(e1, "vec_id", "embedding", g0,
      batch1.select("vec_id"), k = 3, beam = 6, hops = 3, maxLevel = 2, entries = 8)
    val e2 = e1.unionByName(batch2)
    val g2 = Similarity.hnswInsert(e2, "vec_id", "embedding", g1,
      batch2.select("vec_id"), k = 3, beam = 6, hops = 3, maxLevel = 2, entries = 8)
    val replayed = g2.orderBy("layer", "vec_id", "rank").collect().toSeq
    assert(streamed == replayed, "streamed index must equal sequential batch inserts")
    // checkpoint replay: re-running the drained stream changes nothing
    run()
    val again = st.read("hnsw", "graph")
      .orderBy("layer", "vec_id", "rank").collect().toSeq
    assert(again == streamed, "replaying a drained stream must be a no-op")
    // every inserted node appears at layer 0 AND at every layer up to
    // its md5-geometric level — the batch-rebuild level assignment
    val lvls = emb.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"),
        Similarity.hnswLevelExpr(col("vec_id"), 2).as("lvl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byLayer = streamed.groupBy(_.getInt(0))
      .map { case (l, rows) => l -> rows.map(_.getLong(1)).toSet }
    lvls.foreach { case (id, lvl) =>
      (0 to lvl).foreach { l =>
        assert(byLayer(l).contains(id), s"inserted $id missing from layer $l (lvl=$lvl)")
      }
      ((lvl + 1) to 2).foreach { l =>
        assert(!byLayer(l).contains(id), s"inserted $id above its level in layer $l")
      }
    }
    // the maintained levels table covers the drained corpus EXACTLY
    // once (bootstrap + per-batch appends, txn-guarded) and equals the
    // pure-id assignment a rebuild would produce
    val lvT = st.read("hnsw", "levels").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(lvT.map(_._1).sorted.toSeq == (0L until 48L).toSeq,
      s"levels table must cover the corpus exactly once, got ${lvT.length} rows")
    val wantLv = emb.select(col("vec_id"),
        Similarity.hnswLevelExpr(col("vec_id"), 2).as("lvl"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(lvT.toMap == wantLv, "maintained levels must equal the pure-id assignment")
    // vectors table holds each id exactly once (append-if-absent)
    val vIds = st.read("hnsw", "vectors").collect().map(_.getLong(0))
    assert(vIds.sorted.toSeq == (0L until 48L).toSeq, "vectors must hold each id once")
  }

  test("minhashAdmitSink: streamed batches equal sequential admission; replay is a no-op") {
    import spark.implicits._
    import graft.ops.Dedup
    import graft.engine.SnapshotStore
    val mk = (id: Long, t: String) => (id, t)
    val corpusDocs = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      mk(2L, "one two three four five six seven eight nine ten"))
    val corpus = corpusDocs.toDF("doc_id", "text")
    // batch 1: a re-crawl of doc 1 (rejected vs corpus) + a fresh doc
    val b1 = Seq(
      mk(10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      mk(11L, "red orange yellow green blue indigo violet black white gray"))
      .toDF("doc_id", "text")
    // batch 2: a re-crawl of batch-1's ADMITTED doc (rejected only
    // because batch 1 landed in the index first) + a fresh doc
    val b2 = Seq(
      mk(20L, "red orange yellow green blue indigo violet black white gray"),
      mk(21L, "lion tiger bear wolf fox deer hawk owl crow swan"))
      .toDF("doc_id", "text")
    val root = tmp("graft_mh_admit_sink")
    val st = new SnapshotStore(spark, s"$root/store")
    st.overwrite(corpus, "dd", "docs")
    st.overwrite(Dedup.minhashIndexMd5Probe(corpus, "doc_id", "text", 5, 16, 4),
      "dd", "index")
    val staged = s"$root/in"
    b1.coalesce(1).write.parquet(staged)
    Thread.sleep(20)
    b2.coalesce(1).write.mode("append").parquet(staged)
    def run(): Unit = StreamOps.minhashAdmitSink(
      StreamOps.eventStream(spark, staged, spark.read.parquet(staged).schema,
        maxFilesPerTrigger = Some(1)),
      st, "dd", "doc_id", "text", n = 5, k = 16, bands = 4,
      maxEstJaccard = 0.5, checkpoint = s"$root/ckpt").awaitTermination()
    run()
    val streamed = st.read("dd", "docs").select("doc_id")
      .as[Long].collect().sorted.toSeq
    // sequential replay: admit b1 vs corpus index, extend, admit b2
    val idx0 = Dedup.minhashIndexMd5Probe(corpus, "doc_id", "text", 5, 16, 4)
    val adm1 = Dedup.admitAgainstIndexMultiProbe(idx0, b1, "doc_id", "text",
      5, 16, 4, 0.5)
    val idx1 = idx0.unionByName(
      Dedup.minhashIndexMd5Probe(adm1, "doc_id", "text", 5, 16, 4))
    val adm2 = Dedup.admitAgainstIndexMultiProbe(idx1, b2, "doc_id", "text",
      5, 16, 4, 0.5)
    val want = (corpusDocs.map(_._1) ++
      adm1.select("doc_id").as[Long].collect() ++
      adm2.select("doc_id").as[Long].collect()).sorted
    assert(streamed == want, s"streamed $streamed vs sequential $want")
    // the batch-order semantics the fixture encodes: 11 admitted in
    // batch 1, so its batch-2 re-crawl 20 must be rejected; 10 rejected
    assert(streamed.contains(11L) && !streamed.contains(10L) && !streamed.contains(20L))
    assert(streamed.contains(21L))
    // the maintained index covers exactly the admitted docs
    val idxIds = st.read("dd", "index").select("doc_id").distinct()
      .as[Long].collect().sorted.toSeq
    assert(idxIds == streamed, "index rows must track the docs table exactly")
    // checkpoint replay: re-running the drained stream changes nothing
    run()
    assert(st.read("dd", "docs").select("doc_id").as[Long].collect().sorted.toSeq
      == streamed, "replaying a drained stream must be a no-op")
  }

  test("hnswInsertBatch converges when replayed after any partial-commit prefix") {
    // the crash-window audit (r16 advice): the sink commits three
    // tables per batch; a crash between any two of them followed by a
    // checkpoint replay must still converge to the sequential-insert
    // state. Every commit is txn-tagged, so the replay skips landed
    // commits and recomputes the rest from the same logical inputs.
    import spark.implicits._
    import graft.ops.Similarity
    import graft.engine.SnapshotStore
    val pts = (0 until 40).map(i => (i.toLong, Array(i * 1.0f, (i % 5) * 3.0f)))
    val emb = pts.toDF("vec_id", "embedding")
    val b0 = emb.filter(col("vec_id") % 4 =!= 0)
    val batch = emb.filter(col("vec_id") % 4 === 0)
    def freshStore(tag: String): SnapshotStore = {
      val st = new SnapshotStore(spark, tmp(s"graft_hnsw_replay_$tag"))
      st.overwrite(b0, "hnsw", "vectors")
      st.overwrite(Similarity.hnswBuild(b0, "vec_id", "embedding",
        k = 3, rounds = 2, maxLevel = 2, bucketsFor = _ => 4), "hnsw", "graph")
      st
    }
    def apply1(st: SnapshotStore): Unit =
      StreamOps.hnswInsertBatch(st, "hnsw", "vec_id", "embedding", batch,
        "t1", k = 3, beam = 6, hops = 3, maxLevel = 2, entries = 8)
    def state(st: SnapshotStore) = (
      st.read("hnsw", "graph").orderBy("layer", "vec_id", "rank").collect().toSeq,
      st.read("hnsw", "vectors").collect().map(_.getLong(0)).sorted.toSeq,
      st.read("hnsw", "levels").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq)
    // reference: one clean application
    val clean = freshStore("clean")
    apply1(clean)
    val want = state(clean)
    assert(want._2 == (0L until 40L).toSeq)
    // prefix 1: vectors landed, crash before levels/graph, full replay
    val p1 = freshStore("p1")
    p1.appendIfAbsent(batch, "hnsw", "vectors", "t1")
    apply1(p1)
    assert(state(p1) == want, "replay after vectors-only commit diverged")
    // prefix 2: vectors + levels landed, crash before graph, replay
    val p2 = freshStore("p2")
    p2.appendIfAbsent(batch, "hnsw", "vectors", "t1")
    p2.overwrite(Similarity.hnswLevels(p2.read("hnsw", "vectors"), "vec_id", 2),
      "hnsw", "levels", txnId = Some("t1"))
    apply1(p2)
    assert(state(p2) == want, "replay after vectors+levels commit diverged")
    // full prefix: everything landed — a second invocation is a no-op
    apply1(clean)
    assert(state(clean) == want, "replay after a complete batch must be a no-op")
  }

  test("cdcApplySink: churn collapses, deletes remove, later upserts reinsert") {
    import spark.implicits._
    val staged = tmp("graft_cdc_in")
    // batch 1: k=1 v1, k=2 v1, and k=1 churns to v2 inside the batch
    Seq((1L, 1L, "u", 10.0), (2L, 2L, "u", 20.0), (1L, 3L, "u", 11.0))
      .toDF("k", "seq", "op", "qty").coalesce(1).write.mode("append").parquet(staged)
    // batch 2: delete k=1, update k=2
    Seq((1L, 4L, "d", 0.0), (2L, 5L, "u", 21.0))
      .toDF("k", "seq", "op", "qty").coalesce(1).write.mode("append").parquet(staged)
    // batch 3: k=1 REINSERTS after its delete, k=3 appears
    Seq((1L, 6L, "u", 12.0), (3L, 7L, "u", 30.0))
      .toDF("k", "seq", "op", "qty").coalesce(1).write.mode("append").parquet(staged)
    val wh = new graft.engine.Warehouse(spark, tmp("graft_cdc_wh"), keepVersions = 0)
    val stream = StreamOps.eventStream(spark, staged, schemaOf(staged),
      maxFilesPerTrigger = Some(1))
    StreamOps.cdcApplySink(stream, wh, "serve", "t",
      keys = Seq("k"), seqCol = "seq", opCol = "op",
      checkpoint = tmp("graft_cdc_ck")).awaitTermination()
    val got = wh.read("serve", "t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 12.0), (2L, 21.0), (3L, 30.0)))
  }

  test("kmvPartialsSink: merged partials equal the single-pass sketch; replay is a no-op") {
    import graft.engine.SnapshotStore
    import spark.implicits._
    // three unordered batches with cross-batch duplicates; k = 4
    val batches = Seq(Seq(90L, 40L, 10L, 70L), Seq(40L, 20L, 95L), Seq(15L, 10L, 99L, 30L))
    val dir = tmp("graft_kmv_in")
    batches.foreach { b =>
      b.toDF("h").coalesce(1).write.mode("append").parquet(dir)
    }
    val st = new SnapshotStore(spark, tmp("graft_kmv_st"))
    val ck = tmp("graft_ck")
    def drain(): Unit = StreamOps.kmvPartialsSink(
      StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1)),
      st, "metrics", "kmv", "h", k = 4, checkpoint = ck).awaitTermination()
    drain()
    // the maintained table holds per-batch partials: ≤ batches × k rows
    assert(st.read("metrics", "kmv").count() <= 12)
    val sketch = st.read("metrics", "kmv").select("h").distinct()
      .orderBy("h").limit(4).as[Long].collect().toSeq
    // global 4 smallest DISTINCT values — whatever the batch boundaries
    assert(sketch == Seq(10L, 15L, 20L, 30L))
    // drained rerun from the same checkpoint: nothing commits twice
    drain()
    assert(st.read("metrics", "kmv").select("h").distinct()
      .orderBy("h").limit(4).as[Long].collect().toSeq == sketch)
  }

  test("gramPartialsSink: re-summed partials equal the single-pass Gram; replay is a no-op") {
    import graft.engine.SnapshotStore
    import graft.ops.Similarity
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.5f)), (2L, Array(0.25f, -0.25f)),
      (3L, Array(-0.5f, 1.0f)), (4L, Array(0.75f, 0.0f)))
    val dir = tmp("graft_gram_in")
    vecs.grouped(2).foreach { b =>
      b.toDF("vec_id", "embedding").coalesce(1).write.mode("append").parquet(dir)
    }
    val st = new SnapshotStore(spark, tmp("graft_gram_st"))
    val ck = tmp("graft_ck")
    def drain(): Unit = StreamOps.gramPartialsSink(
      StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1)),
      st, "metrics", "gram", "vec_id", "embedding", qScale = 256.0,
      checkpoint = ck).awaitTermination()
    drain()
    def merged() = Similarity.collectGram(
      st.read("metrics", "gram").groupBy("i", "j")
        .agg(org.apache.spark.sql.functions.sum("g").as("g")))
    val batchGram = Similarity.gramMatrix(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", qScale = 256.0)
    assert(merged().map(_.toSeq).toSeq == batchGram.map(_.toSeq).toSeq,
      "streamed partials must re-sum to the single-pass Gram")
    drain() // replay: txn tags commit nothing twice
    assert(merged().map(_.toSeq).toSeq == batchGram.map(_.toSeq).toSeq)
  }

  test("keyedCountsSink digit partials: streamed Benford equals batch; replay is a no-op") {
    import graft.engine.SnapshotStore
    import graft.ops.Profile
    import spark.implicits._
    // three batches of positive integer values with all magnitudes mixed
    val batches = Seq(Seq(12L, 25L, 301L), Seq(19L, 7L, 14L), Seq(99L, 120L, 3L, 18L))
    val dir = tmp("graft_benford_in")
    batches.foreach { b =>
      b.map(v => v.toString.head.asDigit.toLong).toDF("digit")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val st = new SnapshotStore(spark, tmp("graft_benford_st"))
    val ck = tmp("graft_ck")
    def drain(): Unit = StreamOps.keyedCountsSink(
      StreamOps.eventStream(spark, dir, schemaOf(dir), maxFilesPerTrigger = Some(1)),
      st, "metrics", "digit_counts", Seq("digit"), checkpoint = ck).awaitTermination()
    drain()
    def streamed() = Profile.benfordFromCounts(
      st.read("metrics", "digit_counts").groupBy("digit")
        .agg(sum("cnt").as("n")))
      .orderBy("digit").collect().map(_.toSeq).toSeq
    val batch = Profile.benford(batches.flatten.toDF("v"), "v")
      .orderBy("digit").collect().map(_.toSeq).toSeq
    assert(streamed() == batch,
      "additive digit counts: streamed partials re-sum to the batch screen")
    drain() // replay from the drained checkpoint: txn tags commit nothing twice
    assert(streamed() == batch)
  }
}
