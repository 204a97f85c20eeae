package graft.streaming

import graft.engine.{Merge, SnapshotStore, Warehouse}
import graft.ops.EventOps
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming surface — the engine generalization of the
 * reference's scheduled-incremental "streaming" (daily Airflow trigger +
 * watermark filter + keyed upsert, SURVEY.md §2.9):
 *
 *   - `@daily` batch trigger        → `Trigger.AvailableNow` (process all
 *     outstanding input, then stop — exactly the run-on-schedule pattern,
 *     reference: airflow_home/dags/daily_lakehouse_pipeline.py:36)
 *   - MAX(date) watermark filter    → `withWatermark` event-time bound
 *     (reference: transforme_stock_silver.py:80-84)
 *   - Delta MERGE / dbt unique_key  → `foreachBatch` + [[Merge.upsert]]
 *     into the [[Warehouse]] (reference: ingest_stocks.py:87-100,
 *     dbt/lakehouse_models/models/silver/daily_stocks.sql:1-6)
 *
 * The batch transforms in [[EventOps]] run unchanged on a streaming
 * DataFrame — that is the point of declaring them as logical plans.
 *
 * Scale notes: state stores (windows, sessions, dedup keys) shard by
 * groupBy key across executors; watermarks bound state size; AvailableNow
 * rides checkpoint offsets so a 1000-executor cluster restarts exactly
 * where it left off.
 */
object StreamOps {

  /** File-source stream over a directory of parquet event files.
    * (File sources need an explicit schema — infer is a batch luxury.) */
  def eventStream(spark: SparkSession, path: String, schema: StructType,
                  maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(path)
  }

  /** Tumbling 1-hour windows under a watermark: late events beyond
    * `delay` are dropped; closed windows emit exactly once (append). */
  def tumblingHourlyStream(events: DataFrame, delay: String = "1 hour"): DataFrame =
    EventOps.tumblingHourly(events.withWatermark("ts", delay))

  /** Hopping 1h/30min windows under a watermark — state holds
    * size/slide = 2 open windows per key instead of 1; same append
    * semantics (a window emits when its END passes the watermark). */
  def hoppingStream(events: DataFrame, delay: String = "1 hour"): DataFrame =
    EventOps.hoppingHourBy30(events.withWatermark("ts", delay))

  /** Session windows under a watermark (built-in session_window —
    * the state-store-backed generalization of gaps-and-islands). */
  def sessionsStream(events: DataFrame, gap: String = "30 minutes",
                     delay: String = "1 hour"): DataFrame =
    EventOps.sessions(events.withWatermark("ts", delay), gap)

  /**
   * Streaming insert-only dedup: the reference's insert-only MERGE
   * (W2) as a custom stateful operator — the FIRST row seen per key is
   * emitted, every later arrival is dropped. State is one boolean per
   * key, sharded by the groupBy; at 100 TB you would add a state TTL
   * (`GroupStateTimeout.EventTimeTimeout`) to bound it.
   */
  def streamingInsertOnlyDedup(df: DataFrame, keyCols: Seq[String]): Dataset[Row] = {
    val enc = Encoders.row(df.schema)
    df.groupByKey { r: Row =>
      keyCols.map(k => String.valueOf(r.getAs[Any](k))).mkString("\u0000")
    }(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }(Encoders.scalaBoolean, enc)
  }

  /**
   * Stream-stream inner join: correlate `typeA` events with `typeB`
   * events of the same user occurring within `within` AFTER them. Both
   * sides carry watermarks and the join condition is time-bounded, so
   * each side's state store evicts rows once the other side's watermark
   * passes — bounded memory at any scale.
   */
  def correlatedEvents(events: DataFrame, typeA: String, typeB: String,
                       within: String = "1 hour"): DataFrame =
    correlatedStreams(
      events.filter(col("event_type") === typeA),
      events.filter(col("event_type") === typeB), within)

  /** [[correlatedEvents]] over TWO independent source streams (each
    * with `user_id, ts, event_id`) — the general stream-stream join
    * where the sides arrive on separate feeds. `delay` is the
    * out-of-order tolerance (defaults to `within`); pass a horizon
    * longer than the replayed data's time span to make a bounded
    * replay EXACTLY equal the batch join — no row can be late, so the
    * only rows dropped are the ones the time bound excludes. State
    * eviction still needs only the watermark to pass `delay + within`
    * behind each side — bounded memory on live feeds. */
  def correlatedStreams(aEvents: DataFrame, bEvents: DataFrame,
                        within: String = "1 hour",
                        delay: Option[String] = None): DataFrame = {
    val d = delay.getOrElse(within)
    val a = aEvents
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"), col("event_id").as("a_id"))
      .withWatermark("a_ts", d)
    val b = bEvents
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"), col("event_id").as("b_id"))
      .withWatermark("b_ts", d)
    a.join(b, expr(
      s"a_user = b_user AND b_ts >= a_ts AND b_ts <= a_ts + INTERVAL $within"))
      .select(col("a_user").as("user_id"), col("a_id"), col("b_id"),
        col("a_ts"), col("b_ts"))
  }

  /** Built-in streaming dedup with state TTL: duplicates of a key are
    * dropped while the key is within the watermark horizon, then state
    * is evicted — the bounded-memory form of insert-only dedup. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)

  /**
   * Running per-key count via `mapGroupsWithState` — the minimal custom
   * stateful aggregate (Update mode: each batch emits the refreshed
   * total for keys it touched). The state is one long per key; a real
   * deployment adds an event-time TTL like the dedup note above.
   */
  def streamingRunningCount(df: DataFrame, keyCol: String): Dataset[(String, Long)] =
    df.groupByKey { r: Row => String.valueOf(r.getAs[Any](keyCol)) }(Encoders.STRING)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Row], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (key, n)
      }(Encoders.scalaLong, Encoders.tuple(Encoders.STRING, Encoders.scalaLong))

  /** Streaming decontamination gate: the batch
    * [[graft.ops.Dedup.contamination]] plan UNCHANGED over a document
    * stream — a stream-static broadcast join (the benchmark side is
    * static and tiny) feeding a streaming aggregate keyed on
    * (doc, bench) pairs. Run in complete/update mode; state is one
    * count per contaminated pair, bounded by benchmark size × flagged
    * docs (contaminated pairs are rare by construction). This is the
    * eval-leak tripwire run WHILE ingesting, instead of as a nightly
    * batch over the full corpus. */
  def contaminationStream(docStream: DataFrame, benchmark: DataFrame,
                          idCol: String, textCol: String,
                          n: Int, minShared: Int): DataFrame =
    graft.ops.Dedup.contamination(docStream, benchmark, idCol, textCol, n, minShared)

  /** Streaming PERCENTILE maintenance with bounded state: per
    * micro-batch, the batch's [[graft.ops.Profile.binCounts]] partials
    * (keys × bins rows — additive by construction) append exactly-once
    * into a snapshot table; [[graft.ops.Profile.quantilesFromBinCounts]]
    * over the table then yields estimates IDENTICAL to a batch run
    * over all data ever streamed — latency percentiles maintained
    * continuously without ever sorting or retaining raw values. State
    * grows as batches × touched bins; compact the table on a schedule
    * (the partials re-merge additively, so compaction is just
    * [[SnapshotStore.compact]]). Replays commit nothing
    * ([[SnapshotStore.appendIfAbsent]]'s txn tag). */
  /** Per-query transaction namespace: every streaming query numbers its
    * batches from 0, so two queries (distinct checkpoints) writing the
    * SAME table would collide on a bare batch-id tag — the second
    * query's batch 0 would read as a replay of the first's and be
    * silently dropped by the txn dedup. Namespacing by the checkpoint
    * (the query's durable identity: stable across restarts of the same
    * query, necessarily distinct between concurrent queries) keeps
    * replay-dedup per query. This is exactly Delta's `txnAppId` role.
    * A caller-supplied `sinkId` overrides the checkpoint-derived
    * namespace — the explicit txnAppId form, for writers whose logical
    * identity must survive a LOST checkpoint (a rebuilt query with the
    * same sinkId replays as no-ops instead of double-committing). */
  private def txnTag(checkpoint: String, sinkId: Option[String],
                     batchId: Long): String =
    "stream-" + sinkId.getOrElse(Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(checkpoint))) + s"-$batchId"

  def binnedCountsSink(stream: DataFrame, st: SnapshotStore, layer: String, table: String,
                       keys: Seq[String], valueCol: String, binWidthCents: Long,
                       checkpoint: String,
                       sinkId: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        st.appendIfAbsent(
          graft.ops.Profile.binCounts(batch.toDF(), keys, valueCol, binWidthCents),
          layer, table, txnTag(checkpoint, sinkId, batchId))
        ()
      }
      .start()

  /** Additive BITMAP-DISTINCT maintenance: each micro-batch appends
    * its per-(keys, bucket) bitmap partials exactly-once (batch-id
    * transaction tags). Bitmaps OR-merge, so the epilogue —
    * `bitmap_or_agg` per (keys, bucket), `bitmap_count`, sum per keys
    * — equals COUNT(DISTINCT id) over everything ever streamed: exact
    * streaming distinct with NO raw-id retention and no growing state
    * store (the state is the maintained table, batches × touched
    * buckets rows, and compaction re-merges it additively — the
    * mergeable-distinct property raw COUNT(DISTINCT) lacks). */
  def bitmapPartialsSink(stream: DataFrame, st: SnapshotStore, layer: String,
                         table: String, keys: Seq[String], idCol: String,
                         checkpoint: String,
                         sinkId: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        st.appendIfAbsent(
          batch.toDF()
            .groupBy(keys.map(col) :+
              bitmap_bucket_number(col(idCol)).as("bucket"): _*)
            .agg(bitmap_construct_agg(bitmap_bit_position(col(idCol))).as("bm")),
          layer, table, txnTag(checkpoint, sinkId, batchId))
        ()
      }
      .start()

  /** Additive KEYED-COUNT maintenance: each micro-batch appends its
    * (keys, cnt) partial counts exactly-once (batch-id transaction
    * tags), so re-summing the maintained table equals a batch count
    * over everything ever streamed — the streaming form of any
    * additive rollup (term counts feeding exact heavy hitters,
    * per-key event totals). State = batches × keys touched per batch,
    * no raw rows retained; compaction re-merges additively. */
  def keyedCountsSink(stream: DataFrame, st: SnapshotStore, layer: String,
                      table: String, keys: Seq[String], checkpoint: String,
                      sinkId: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        st.appendIfAbsent(
          batch.toDF().groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt")),
          layer, table, txnTag(checkpoint, sinkId, batchId))
        ()
      }
      .start()

  /** Mergeable KMV partial-sketch maintenance: each micro-batch appends
    * its k smallest DISTINCT hash values exactly-once (txn-tagged).
    * k-min is a semilattice (associative, commutative, idempotent), so
    * any global k smallest hash is also within its own batch's k
    * smallest — re-taking the k smallest DISTINCT values over the
    * maintained table equals the single-pass corpus sketch EXACTLY,
    * whatever the batch boundaries or arrival order. State = batches ×
    * k rows, no raw retention; compaction re-merges losslessly. The
    * distinct-cardinality / overlap estimators run at read time
    * (agg_kmv_overlap's epilogue). */
  def kmvPartialsSink(stream: DataFrame, st: SnapshotStore, layer: String,
                      table: String, hashCol: String, k: Int, checkpoint: String,
                      sinkId: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        st.appendIfAbsent(
          batch.toDF().select(col(hashCol).as("h")).distinct()
            .orderBy("h").limit(k),
          layer, table, txnTag(checkpoint, sinkId, batchId))
        ()
      }
      .start()

  /** Additive GRAM-CELL maintenance: each micro-batch appends its
    * (i, j, Σqᵢqⱼ) integer partials exactly-once; the Gram is a sum over
    * rows, so re-summing the maintained table equals the single-pass
    * corpus Gram for any batching — the streaming form of the PCA
    * sufficient statistic (power iteration runs at read time on the
    * dim²-bounded merge). State = batches × dim(dim+1)/2 rows, no
    * vectors retained; compaction re-merges additively. */
  def gramPartialsSink(stream: DataFrame, st: SnapshotStore, layer: String,
                       table: String, idCol: String, vecCol: String,
                       qScale: Double, checkpoint: String,
                       sinkId: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        st.appendIfAbsent(
          graft.ops.Similarity.gramCells(batch.toDF(), idCol, vecCol, qScale),
          layer, table, txnTag(checkpoint, sinkId, batchId))
        ()
      }
      .start()

  /** Exactly-once per-key partial SUM accumulation — the mergeable-
    * state metrics sink for monitors whose epilogue (CUSUM, drift,
    * z-score) runs at read time over the accumulated table. Each batch
    * commits its per-key partial sums as one txn-tagged snapshot;
    * arrival ORDER is irrelevant because partials are commutative
    * adds, so an unordered file stream still converges to the exact
    * batch aggregate — the trick that makes order-sensitive monitors
    * streamable without ordered delivery. */
  def keyedSumsSink(stream: DataFrame, st: SnapshotStore, layer: String,
                    table: String, keys: Seq[String], valueCol: String,
                    checkpoint: String,
                    sinkId: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        st.appendIfAbsent(
          batch.toDF().groupBy(keys.map(col): _*)
            .agg(sum(col(valueCol)).as("part_sum"), count(lit(1)).as("part_cnt")),
          layer, table, txnTag(checkpoint, sinkId, batchId))
        ()
      }
      .start()

  /** EXACTLY-ONCE streaming append into a [[SnapshotStore]] table: each
    * micro-batch commits one snapshot tagged with its batch id
    * ([[SnapshotStore.appendIfAbsent]]), so a checkpoint-recovery
    * replay of a batch finds its transaction already committed and
    * appends nothing — the Delta `txnAppId`/`txnVersion` idempotent-
    * writer pattern, which plain file sinks cannot offer (a replayed
    * foreachBatch against a raw directory double-appends). Commit cost
    * per batch is the batch's files plus one manifest write; readers
    * are snapshot-isolated throughout. */
  def appendOnlySink(stream: DataFrame, st: SnapshotStore, layer: String, table: String,
                     checkpoint: String, partitionBy: Seq[String] = Nil,
                     sinkId: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        st.appendIfAbsent(batch.toDF(), layer, table,
          txnTag(checkpoint, sinkId, batchId), partitionBy)
        ()
      }
      .start()

  /** PARTITION-PRUNED streaming MERGE: each micro-batch upserts into
    * only the partitions it touches
    * ([[SnapshotStore.upsertPartitions]] — existing side reads just the
    * touched partitions, write is a dynamic partition overwrite), with
    * the batch id as transaction tag so checkpoint-recovery replays
    * merge nothing. This is the 100 TB form of the reference's
    * daily MERGE (ingest_stocks.py:87-100 rewrites the whole Delta
    * table's join every run): per batch, cost tracks the touched
    * partitions' volume, not the table's. Requires `partitionBy ⊆
    * keys` (enforced downstream) so keys cannot move partitions. */
  def upsertPartitionsSink(stream: DataFrame, st: SnapshotStore, layer: String,
                           table: String, keys: Seq[String], partitionBy: Seq[String],
                           checkpoint: String,
                           sinkId: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        st.upsertPartitions(batch.toDF(), layer, table, keys, partitionBy,
          txnId = Some(txnTag(checkpoint, sinkId, batchId)))
        ()
      }
      .start()

  /** RESTATEMENT sink — `foreachBatch` + [[SnapshotStore.replaceWhere]]:
    * every micro-batch atomically replaces the slice it restates
    * (`sliceOf(batch)` derives the predicate from the batch's own
    * rows, e.g. its partition dates), landing the position-delete and
    * the replacement files in ONE snapshot. The txn tag makes a
    * checkpoint-replayed batch a no-op, so the sink is exactly-once —
    * the streaming form of the warehouse "late data restates its day"
    * pattern (Delta's replaceWhere sink). The table must exist
    * (restatement without a baseline is an append). */
  def replaceWhereSink(stream: DataFrame, st: SnapshotStore, layer: String,
                       table: String,
                       sliceOf: DataFrame => org.apache.spark.sql.Column,
                       checkpoint: String,
                       sinkId: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = batch.toDF()
        if (!b.isEmpty)
          st.replaceWhere(b, layer, table, sliceOf(b),
            txnId = Some(txnTag(checkpoint, sinkId, batchId)))
        ()
      }
      .start()

  /**
   * STREAMING ANN-INDEX MAINTENANCE sink — `foreachBatch` +
   * [[graft.ops.Similarity.nnDescentInsert]]: each micro-batch of new
   * vectors searches the MAINTAINED k-NN graph for its lists (beam
   * walk, no corpus scan), offers its edges back to the touched
   * endpoints, and lands the updated graph + the appended vector
   * table. The streaming form of "the index keeps up with ingest":
   * per-batch cost is the batch's beam walks plus ≤ batch·k list
   * re-ranks — state is the maintained tables, not the state store.
   * Batch ORDER matters (an earlier batch's nodes serve the next
   * batch's searches), so stage one file per batch in sequence and
   * run `maxFilesPerTrigger = 1` — the stream_cdc_final discipline.
   * Expects `<layer>/vectors` and `<layer>/graph` pre-seeded with the
   * base corpus and its [[graft.ops.Similarity.nnDescent]] build.
   */
  def knnInsertSink(newVecs: DataFrame, st: SnapshotStore, layer: String,
                    idCol: String, vecCol: String,
                    k: Int, beam: Int, hops: Int, entries: Int,
                    checkpoint: String): StreamingQuery =
    newVecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = batch.toDF()
        if (!b.isEmpty) {
          // txn-tagged commits (Delta's txnAppId pattern): a replayed
          // micro-batch (crash between the two table commits, then
          // checkpoint recovery) skips whichever commit already landed
          // and recomputes the other from the SAME inputs — the vector
          // append is exactly-once, so `all` is old ∪ batch either way
          val txn = s"knn_insert:$batchId"
          st.appendIfAbsent(b, layer, "vectors", txn)
          val all = st.read(layer, "vectors")
          val g1 = graft.ops.Similarity.nnDescentInsert(all, idCol, vecCol,
            st.read(layer, "graph"), b.select(col(idCol)), k, beam, hops, entries)
          st.overwrite(g1, layer, "graph", txnId = Some(txn))
        }
        ()
      }
      .start()

  /** Streaming HNSW maintenance — [[knnInsertSink]] lifted to the
    * LAYERED index ([[graft.ops.Similarity.hnswInsert]]): each
    * micro-batch's vectors get their md5-geometric levels (a pure
    * function of the id, so streamed levels equal a batch rebuild's)
    * and every layer ≤ level runs one reverse-offer insert over the
    * maintained layer graph. Expects `<layer>/vectors` and
    * `<layer>/graph` pre-seeded with the base corpus and its
    * [[graft.ops.Similarity.hnswBuild]]; batch ORDER matters (earlier
    * nodes serve later searches), so stage one file per batch with
    * `maxFilesPerTrigger = 1` — the knnInsertSink discipline.
    *
    * The per-layer entry pools ride a MAINTAINED `<layer>/levels`
    * table — `(idCol, lvl)`, bootstrapped from the corpus once if
    * absent, then appended batch-by-batch (levels are a pure function
    * of the id, so appends never restate) — so each insert's level
    * work tracks the batch instead of re-projecting the whole corpus
    * ([[graft.ops.Similarity.hnswInsert]]'s `levels` contract). All
    * three commits per batch are txn-tagged: any crash/replay
    * interleaving converges to the sequential-insert state (the
    * batch-ids anti-join below restores the pre-batch membership even
    * when the replayed levels table already carries the batch). */
  def hnswInsertSink(newVecs: DataFrame, st: SnapshotStore, layer: String,
                     idCol: String, vecCol: String,
                     k: Int, beam: Int, hops: Int, maxLevel: Int, entries: Int,
                     checkpoint: String): StreamingQuery =
    newVecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = batch.toDF()
        if (!b.isEmpty)
          hnswInsertBatch(st, layer, idCol, vecCol, b,
            s"hnsw_insert:$batchId", k, beam, hops, maxLevel, entries)
        ()
      }
      .start()

  /** One micro-batch of [[hnswInsertSink]], factored out so the
    * crash-replay interleavings are directly unit-testable: every
    * commit is txn-tagged, so re-invoking with the same `txn` after
    * ANY partial-commit prefix (vectors only; vectors + levels; all
    * three) skips the landed commits, recomputes the rest from the
    * SAME logical inputs, and converges to the sequential-insert
    * state. */
  private[graft] def hnswInsertBatch(st: SnapshotStore, layer: String,
      idCol: String, vecCol: String, b: DataFrame, txn: String,
      k: Int, beam: Int, hops: Int, maxLevel: Int, entries: Int): Unit = {
    st.appendIfAbsent(b, layer, "vectors", txn)
    val all = st.read(layer, "vectors")
    if (!st.tableExists(layer, "levels"))
      // one-time ingest derivation (covers the pre-seeded base corpus
      // AND this batch — harmless: the anti-join below excludes the
      // batch ids again); carries this batch's txn so a replay takes
      // the append branch and skips
      st.overwrite(graft.ops.Similarity.hnswLevels(all, idCol, maxLevel),
        layer, "levels", txnId = Some(txn))
    else
      st.appendIfAbsent(
        graft.ops.Similarity.hnswLevels(b, idCol, maxLevel),
        layer, "levels", txn)
    // pre-batch membership for the insert's entry pools: a broadcast
    // anti-join of the TINY batch id set against the maintained
    // table's scan — no shuffle, no corpus materialization
    val lvOld = st.read(layer, "levels")
      .join(broadcast(b.select(col(idCol))), Seq(idCol), "left_anti")
    val g1 = graft.ops.Similarity.hnswInsert(all, idCol, vecCol,
      st.read(layer, "graph"), b.select(col(idCol)),
      k, beam, hops, maxLevel, entries, levels = Some(lvOld))
    st.overwrite(g1, layer, "graph", txnId = Some(txn))
    ()
  }

  /** Streaming NEAR-DUP ADMISSION — [[graft.ops.Dedup
    * .admitAgainstIndexMultiProbe]] as a maintained-corpus sink: each
    * micro-batch admits against the maintained drop-one LSH index
    * (`<layer>/index` — the corpus's ENTIRE contribution; corpus text
    * is never re-shingled) plus within-batch first-id-wins; the
    * admitted docs append to `<layer>/docs` and their index rows to
    * `<layer>/index`, both exactly-once under the batch txn. A crash
    * between the two appends replays safely: the admission recomputes
    * from whichever index state survived — the docs append is
    * txn-skipped, the index rows re-derive identically (signatures are
    * pure text functions). Batch ORDER matters (an admitted doc
    * rejects later re-crawls) — stage one file per batch with
    * `maxFilesPerTrigger = 1`. Expects `<layer>/docs` and
    * `<layer>/index` pre-seeded with the base corpus. */
  def minhashAdmitSink(docs: DataFrame, st: SnapshotStore, layer: String,
                       idCol: String, textCol: String,
                       n: Int, k: Int, bands: Int, maxEstJaccard: Double,
                       checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = batch.toDF()
        if (!b.isEmpty) {
          val txn = s"mh_admit:$batchId"
          val adm = graft.ops.Dedup.admitAgainstIndexMultiProbe(
              st.read(layer, "index"), b, idCol, textCol, n, k, bands,
              maxEstJaccard)
            .localCheckpoint() // two consumers, batch-sized
          st.appendIfAbsent(adm, layer, "docs", txn)
          st.appendIfAbsent(graft.ops.Dedup.minhashIndexMd5Probe(
            adm, idCol, textCol, n, k, bands), layer, "index", txn)
        }
        ()
      }
      .start()

  /** Keyed-upsert sink: every micro-batch MERGEs into the warehouse
    * table by unique key (staged wins) — `foreachBatch` + [[Merge]] is
    * Spark's idiom for the reference's Delta MERGE sink. */
  def upsertSink(stream: DataFrame, wh: Warehouse, layer: String, table: String,
                 keys: Seq[String], checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val staged = batch.toDF()
        if (wh.tableExists(layer, table)) {
          val existing = wh.read(layer, table)
          Merge.schemaGuard(existing, staged)
          wh.atomicOverwrite(Merge.upsert(existing, staged, keys), layer, table)
        } else wh.atomicOverwrite(staged, layer, table)
      }
      .start()

  /**
   * Streaming CDC APPLY — the Debezium-feed consumer: a change stream
   * of (key columns, sequence, op ∈ {'u','d'}, payload) applied to a
   * warehouse table per micro-batch. Within a batch only each key's
   * HIGHEST-sequence change applies (intermediate churn collapses to
   * one write); an upsert overwrites the key's row, a delete removes
   * it, and a later batch's upsert REINSERTS a previously-deleted key.
   * CONTRACT: the feed is per-key sequence-ordered across batches (a
   * CDC log's offset order — what Kafka-partition-by-key delivery
   * gives); under that order the apply is idempotent per batch, so
   * checkpoint replays converge to the same table.
   *
   * Scale shape: per batch, one bounded window over the BATCH (not
   * the table) collapses churn, then one keyed merge against the
   * maintained table — the table is read/written once per batch
   * regardless of feed rate, and the merge's anti-join sides are
   * batch-sized (broadcast at daily-feed scale).
   */
  def cdcApplySink(changes: DataFrame, wh: Warehouse, layer: String, table: String,
                   keys: Seq[String], seqCol: String, opCol: String,
                   checkpoint: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
        val last = batch.toDF()
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .drop("__rn")
        val ups = last.filter(col(opCol) =!= "d").drop(opCol, seqCol)
        val dels = last.filter(col(opCol) === "d").select(keys.map(col): _*)
        if (wh.tableExists(layer, table)) {
          val kept = wh.read(layer, table).join(dels, keys, "left_anti")
          Merge.schemaGuard(kept, ups)
          wh.atomicOverwrite(Merge.upsert(kept, ups, keys), layer, table)
        } else wh.atomicOverwrite(ups, layer, table)
      }
      .start()

  /**
   * PARTITION-PRUNED streaming CDC apply — [[cdcApplySink]]'s 100 TB
   * form, for maintained tables whose keys include a partition-
   * derivable column (`partitionBy ⊆ keys`): the same per-batch churn
   * collapse (highest sequence per key wins), then
   * [[SnapshotStore.cdcApplyPartitions]] applies upserts AND deletes
   * to only the partitions the batch's keys land in — untouched
   * partitions' files ride into the new snapshot by manifest
   * reference, never read or rewritten, and a batch of pure deletes
   * that empties a partition still drops its files. Batch-id txn tags
   * make checkpoint replays no-ops (exactly once). Where
   * [[cdcApplySink]] reads + rewrites the ENTIRE table per micro-batch
   * (cost = the table), this costs the touched partitions (cost = the
   * delta) — keep the full-table sink only for non-partitionable keys.
   */
  def cdcApplyPrunedSink(changes: DataFrame, st: SnapshotStore, layer: String,
                         table: String, keys: Seq[String], seqCol: String,
                         opCol: String, partitionBy: Seq[String],
                         checkpoint: String,
                         sinkId: Option[String] = None): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
        val last = batch.toDF()
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .drop("__rn")
        val ups = last.filter(col(opCol) =!= "d").drop(opCol, seqCol)
        val dels = last.filter(col(opCol) === "d").select(keys.map(col): _*)
        st.cdcApplyPartitions(ups, dels, layer, table, keys, partitionBy,
          txnId = Some(txnTag(checkpoint, sinkId, batchId)))
        ()
      }
      .start()

  /**
   * Incremental retention cohorts — the classic "cohort table
   * maintained by upsert". Each micro-batch MERGEs two compact
   * warehouse tables instead of re-scanning the event history:
   *
   *   - `user_days` (u, d): insert-only merge of the batch's distinct
   *     per-user activity days (idempotent under replays);
   *   - `user_cohorts` (u, cohort_d): min-merge — a late-arriving batch
   *     carrying an EARLIER event moves the user's cohort back, so
   *     event-time disorder across batches cannot corrupt cohorts.
   *
   * The retention triangle is then derived from the maintained tables
   * by [[retentionFromWarehouse]] — identical, by construction, to the
   * batch [[EventOps.retentionCohorts]] over all events seen so far
   * (StreamingSpec proves equality across out-of-order batches).
   *
   * Scale shape: state lives in the warehouse, not the state store —
   * both tables are bounded by users × active days (compact vs the
   * event stream), both merges are keyed anti-join/aggregate plans,
   * and the triangle is a keyed join + aggregate over them.
   */
  def retentionSink(events: DataFrame, wh: Warehouse, layer: String,
                    checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val acts = batch.select(col("user_id").as("u"), to_date(col("ts")).as("d")).distinct()
        if (wh.tableExists(layer, "user_days"))
          wh.atomicOverwrite(
            Merge.insertOnlyMerge(wh.read(layer, "user_days"), acts, Seq("u", "d")),
            layer, "user_days")
        else wh.atomicOverwrite(acts, layer, "user_days")
        val stagedCohorts = acts.groupBy("u").agg(min(col("d")).as("cohort_d"))
        if (wh.tableExists(layer, "user_cohorts"))
          wh.atomicOverwrite(
            wh.read(layer, "user_cohorts").unionByName(stagedCohorts)
              .groupBy("u").agg(min(col("cohort_d")).as("cohort_d")),
            layer, "user_cohorts")
        else wh.atomicOverwrite(stagedCohorts, layer, "user_cohorts")
      }
      .start()

  /** The retention triangle derived from [[retentionSink]]'s maintained
    * tables — same output shape as [[EventOps.retentionCohorts]]. */
  def retentionFromWarehouse(wh: Warehouse, layer: String): DataFrame =
    wh.read(layer, "user_days").join(wh.read(layer, "user_cohorts"), "u")
      .groupBy(col("cohort_d"), datediff(col("d"), col("cohort_d")).as("day_offset"))
      .agg(count_distinct(col("u")).as("n_users"))

  /**
   * Incremental funnel — log compaction to the funnel's sufficient
   * statistic. A funnel's stage-i reach time depends on the FULL event
   * history (a late stage-1 event can move every later reach time), so
   * per-stage running minima cannot be merged incrementally without
   * losing correctness. What CAN be maintained incrementally is the
   * minimal sufficient input: the distinct (user, stage, ts) triples of
   * funnel-stage events — an insert-only MERGE per micro-batch
   * (idempotent under replays, order-insensitive across batches). The
   * funnel is then derived from that compacted index, which is
   * duplicate-free and orders of magnitude smaller than the raw stream
   * (non-funnel event types never land in it at all).
   */
  def funnelEventsSink(events: DataFrame, wh: Warehouse, layer: String,
                       stages: Seq[String], checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val staged = batch.filter(col("event_type").isin(stages: _*))
          .select(col("user_id").as("u"), col("event_type").as("et"), col("ts").as("t"))
          .distinct()
        if (wh.tableExists(layer, "stage_events"))
          wh.atomicOverwrite(
            Merge.insertOnlyMerge(wh.read(layer, "stage_events"), staged, Seq("u", "et", "t")),
            layer, "stage_events")
        else wh.atomicOverwrite(staged, layer, "stage_events")
      }
      .start()

  /** Funnel (and its windowed variant) derived from
    * [[funnelEventsSink]]'s compacted index — identical to the batch
    * operators over all events seen so far. */
  def funnelFromWarehouse(wh: Warehouse, layer: String, stages: Seq[String],
                          maxGap: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val idx = wh.read(layer, "stage_events")
    maxGap match {
      case Some(g) => EventOps.funnelWindowed(idx, "u", "et", "t", stages, g)
      case None => EventOps.funnel(idx, "u", "et", "t", stages)
    }
  }

  /**
   * Streaming DEAD-LETTER QUEUE: every micro-batch is split by
   * [[EventOps.jsonPropsQuarantine]] — parseable rows land in the
   * `parsed` table, rejects in `quarantine` WITH their raw payload, so
   * junk neither kills the stream (FAILFAST) nor vanishes
   * (DROPMALFORMED) and can be replayed after an upstream fix. Both
   * lanes commit via txn-tagged [[SnapshotStore.appendIfAbsent]]
   * (txn = batch id + lane), so a checkpoint-recovery replay of a
   * micro-batch commits NOTHING twice — exactly-once on both lanes,
   * the property a plain append dead-letter sink lacks.
   */
  def quarantineSink(events: DataFrame, st: SnapshotStore, layer: String,
                     checkpoint: String,
                     sinkId: Option[String] = None): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val parsed = EventOps.jsonPropsQuarantine(batch, "props")
        st.appendIfAbsent(
          parsed.filter(!col("quarantined")).drop("quarantined"),
          layer, "parsed", txnId = txnTag(checkpoint, sinkId, id) + "-good")
        st.appendIfAbsent(
          parsed.filter(col("quarantined"))
            .select(col("event_id"), col("props").as("raw_payload")),
          layer, "quarantine", txnId = txnTag(checkpoint, sinkId, id) + "-bad")
        ()
      }
      .start()

  /**
   * Incremental transition matrix — the [[funnelEventsSink]] log-
   * compaction argument applies verbatim: a transition's FROM side is
   * "the user's previous event", so ONE late event can rewrite two
   * transitions — per-batch transition counts cannot be merged
   * incrementally without losing correctness under reordering. What CAN
   * be maintained is the minimal sufficient input: the distinct
   * `(user, ts, event_id, type)` tuples, an insert-only MERGE per
   * micro-batch (idempotent under replays, order-insensitive across
   * batches). [[transitionsFromWarehouse]] then derives the matrix from
   * the compacted index — identical to batch over all events seen so
   * far, whatever the batch boundaries were (StreamingSpec asserts this
   * against [[EventOps.transitionMatrix]] with out-of-order batches).
   */
  def transitionEventsSink(events: DataFrame, wh: Warehouse, layer: String,
                           checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch
          .select(col("user_id").as("u"), col("ts").as("t"),
            col("event_id").as("eid"), col("event_type").as("et"))
          .distinct()
        if (wh.tableExists(layer, "transition_events"))
          wh.atomicOverwrite(
            Merge.insertOnlyMerge(wh.read(layer, "transition_events"), rows,
              Seq("u", "t", "eid")),
            layer, "transition_events")
        else wh.atomicOverwrite(rows, layer, "transition_events")
      }
      .start()

  /** Transition matrix derived from [[transitionEventsSink]]'s compacted
    * index — batch-identical over all events seen so far. */
  def transitionsFromWarehouse(wh: Warehouse, layer: String): DataFrame =
    EventOps.transitionMatrix(wh.read(layer, "transition_events"),
      "u", "et", "t", "eid")

  /** Stream-static anomaly screen: per-key baseline stats
    * ([[graft.ops.TimeSeries.zscoreBaseline]], trained on history)
    * broadcast-joined onto live events, each event scored immediately
    * with the batch-identical z epilogue
    * ([[graft.ops.TimeSeries.zscoreAgainst]]). Stateless on the stream
    * side — no state store, no watermark needed; the baseline is the
    * only memory, so this scales to any event rate. Keys unseen in the
    * baseline score NULL (flag-and-route them separately if novel keys
    * matter). StreamingSpec proves parity with the batch
    * [[graft.ops.TimeSeries.zscoreAnomalies]] when the baseline is
    * trained on the same data the stream replays. */
  def anomalyStream(stream: DataFrame, baseline: DataFrame, keys: Seq[String],
                    valueCol: String, threshold: Double = 2.0): DataFrame = {
    // same collision contract as Warehouse.changesBetween's _change_type
    // check: the join would make mean_c/sd_c ambiguous (or score against
    // the wrong column) if the stream already carries them
    val clash = stream.columns.toSet.intersect(Set("mean_c", "sd_c"))
    require(clash.isEmpty,
      s"anomalyStream: stream already has column(s) ${clash.mkString(", ")} — " +
        "they collide with the baseline stats; rename them first")
    graft.ops.TimeSeries.zscoreAgainst(
      stream.join(broadcast(baseline), keys, "left"), valueCol, threshold)
      .drop("mean_c", "sd_c")
  }

  /** Run any streaming result to an in-memory table with AvailableNow
    * (drain everything outstanding, then stop) and return the sink. */
  def runAvailableNowToMemory(df: DataFrame, name: String, checkpoint: String,
                              outputMode: String = "append"): Unit = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
