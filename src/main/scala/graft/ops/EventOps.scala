package graft.ops

import graft.Det
import org.apache.spark.sql.{Column, DataFrame}
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

  /** PERMISSIVE JSON parse with CORRUPT-RECORD QUARANTINE — the
    * engine-grade upgrade of [[jsonProps]] for feeds that can carry
    * junk (the reference's API ingestion just trusts the payload,
    * ingest_stocks.py:49-63; at pipeline scale a malformed row must
    * neither kill the job (FAILFAST) nor silently vanish (DROPMALFORMED)
    * but land in a quarantine lane with its raw payload preserved for
    * replay). Emits `k` (NULL when unparseable) and `quarantined`
    * (true + raw payload retained in `payloadCol` when the parser
    * rejected the row). Pure projection — no shuffle, codegen'd. */
  def jsonPropsQuarantine(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("_corrupt_record", StringType)))
    df.withColumn("__p", from_json(col(payloadCol), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")))
      .withColumn("k", col("__p.k"))
      .withColumn("quarantined", col("__p._corrupt_record").isNotNull)
      .drop("__p")
  }

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

  /**
   * INCREMENTAL sessionization: fold a new batch of events into an
   * already-materialized session table so the result equals
   * [[sessions]] over everything — without re-sessionizing history.
   * The warehouse pattern behind daily "user sessions" tables: only a
   * user's LAST existing session can bridge with their FIRST new-batch
   * session (CONTRACT: batch events are strictly newer than every
   * ingested event — the incremental watermark guarantee upstream
   * filters enforce); every other session on either side passes
   * through untouched.
   *
   * Scale shape: the existing table is first SEMI-JOINED down to the
   * batch's users (broadcast of the batch's distinct user set), so the
   * per-run cost is the batch plus the touched users' session tails —
   * never a rescan of the full history. A bridged pair merges by pure
   * arithmetic (start = old start, end = new end, counts add) because
   * `session_end` already carries the gap: `new.start <= old.end` IS
   * the "quiet time within gap" test, boundary-inclusive, exactly
   * matching the batch operator's merge rule.
   */
  def mergeSessions(existing: DataFrame, batch: DataFrame,
                    gap: String = "30 minutes"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bs = sessions(batch, gap)
    val users = batch.select(col("user_id")).distinct()
    val touched = existing.join(broadcast(users), Seq("user_id"), "left_semi")
    val lastOld = touched
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("session_start").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val firstNew = bs
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("session_start"))))
      .filter(col("__rn") === 1).drop("__rn")
    val bridged = lastOld.alias("o")
      .join(firstNew.alias("n"), Seq("user_id"))
      .filter(col("n.session_start") <= col("o.session_end"))
      .select(col("user_id"),
        col("o.session_start").as("session_start"),
        col("n.session_end").as("session_end"),
        (col("o.n_events") + col("n.n_events")).as("n_events"),
        col("o.session_start").as("__old_key"),
        col("n.session_start").as("__new_key"))
    val keepOld = existing.join(
      bridged.select(col("user_id"), col("__old_key").as("session_start")),
      Seq("user_id", "session_start"), "left_anti")
    val keepNew = bs.join(
      bridged.select(col("user_id"), col("__new_key").as("session_start")),
      Seq("user_id", "session_start"), "left_anti")
    keepOld.unionByName(keepNew)
      .unionByName(bridged.drop("__old_key", "__new_key"))
  }

  /**
   * Interval union (gaps-and-islands over EXPLICIT extents): merge each
   * key's overlapping-or-touching `[startCol, endCol]` intervals into
   * maximal islands and report per island its span and the number of
   * source intervals. The sibling of [[sessions]] for data that carries
   * its own duration (shipments in transit, maintenance windows, lease
   * terms, GPU-job reservations) — a gap-based session window cannot
   * express "this row OCCUPIES until its own end date".
   *
   * Standard distributed shape: one shuffle on the key, two chained
   * frames of the same window spec (inherently two phases — the island
   * counter is a running sum OF the break flag): an interval starts a
   * new island iff its start exceeds the running max of every EARLIER
   * end (strictly-preceding frame), islands are numbered by running sum
   * of that flag, then one keyed aggregate rolls each island up.
   * Pure date/integer comparisons — oracle-hash-exact.
   *
   * NULL starts/ends are rejected up front (an unbounded interval would
   * silently swallow its whole key); zero-length (start = end) and
   * inverted intervals are the caller's modeling choice — inverted ones
   * fail loudly too.
   */
  def mergeIntervals(df: DataFrame, keys: Seq[String],
                     startCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = col(startCol)
    val e = col(endCol)
    // the guard rides the materialized start column itself, so it is
    // evaluated for EVERY row (a guard inside the island-break flag
    // would be skipped whenever the || short-circuits on the first row
    // of a key) — in-plan raise_error, zero extra jobs
    val guarded = when(s.isNull || e.isNull,
      raise_error(lit(s"mergeIntervals: NULL $startCol/$endCol — unbounded " +
        "intervals are not mergeable; filter or repair upstream"))
        .cast(df.schema(startCol).dataType))
      .when(e < s,
        raise_error(concat(lit(s"mergeIntervals: inverted interval at $startCol="),
          s.cast("string"))).cast(df.schema(startCol).dataType))
      .otherwise(s)
    val withS = df.withColumn("__s", guarded)
    // total order: ties on start broken by end so the running max is
    // deterministic row-by-row, keeping the oracle mirror exact
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__s"), e)
    val prevMaxEnd = max(e).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = withS.withColumn("__new_island",
      when(prevMaxEnd.isNull || col("__s") > prevMaxEnd, lit(1)).otherwise(lit(0)))
    val numbered = flagged.withColumn("__island",
      sum(col("__new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    numbered.groupBy(keys.map(col) :+ col("__island"): _*)
      .agg(min(col("__s")).as("island_start"), max(e).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  private def periodShift(c: org.apache.spark.sql.Column, period: String,
                          steps: Int): org.apache.spark.sql.Column = period match {
    case "month" => add_months(c, steps)
    case "week"  => date_add(c, steps * 7)
    case other   => throw new IllegalArgumentException(
      s"period must be week or month, got $other")
  }

  /** DuckDB twin of [[periodShift]] as an expression fragment —
    * negative steps emit `- INTERVAL n`, DuckDB rejects a signed
    * interval literal. */
  private def periodShiftSql(e: String, period: String, steps: Int): String = {
    val (op, n) = if (steps < 0) ("-", -steps) else ("+", steps)
    period match {
      case "month" => s"$e $op INTERVAL $n MONTH"
      case "week"  => s"$e $op INTERVAL ${n * 7} DAY"
      case other   => throw new IllegalArgumentException(
        s"period must be week or month, got $other")
    }
  }

  /**
   * FIRST/LAST-TOUCH attribution within a lookback window — for every
   * conversion, the earliest and the latest preceding touch in the
   * window: the two endpoint models bracketing [[linearAttribution]]'s
   * equal-split (marketing reads all three side by side). The per-pair
   * join is time-bounded (`conv − lookback ≤ touch < conv`, same shape
   * as the stream-stream correlate), so fan-out is events-per-window,
   * never a user's full history². Endpoint picks ride ONE padded
   * string key `lpad(µs)·:·lpad(id)·:·type` — min = (ts, id)-first,
   * max = (ts, id)-last, identical in both engines with no composite
   * argmin — parsed back by fixed offsets. Conversions with no touch
   * in window report NULLs (dropped conversions would silently
   * overstate coverage).
   */
  def firstLastTouch(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, idCol: String, convType: String,
                     lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, s"firstLastTouch: lookbackUs must be > 0")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(idCol).as("conv_id"),
        unix_micros(col(tsCol)).as("__cus"))
    val touch = events.filter(col(typeCol) =!= convType)
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__tus"),
        concat(lpad(unix_micros(col(tsCol)).cast("string"), 20, "0"), lit(":"),
          lpad(col(idCol).cast("string"), 20, "0"), lit(":"),
          col(typeCol)).as("__k"))
    def parse(k: org.apache.spark.sql.Column) = (
      substring(k, 22, 20).cast("long"), substring(k, 43, 1000))
    // time-bounded pair join, LEFT so empty-window conversions survive
    val pairs = conv.as("c").join(touch.as("t"),
      col("c.__u") === col("t.__u") &&
        col("t.__tus") < col("c.__cus") &&
        col("t.__tus") >= col("c.__cus") - lookbackUs,
      "left")
    val agg = pairs.groupBy(col("c.conv_id").as("conv_id"))
      .agg(count(col("t.__k")).as("n_touches"),
        min(col("t.__k")).as("__fk"), max(col("t.__k")).as("__lk"))
    val (fid, fty) = parse(col("__fk"))
    val (lid, lty) = parse(col("__lk"))
    agg.select(col("conv_id"), col("n_touches"),
      fid.as("first_touch_id"), fty.as("first_type"),
      lid.as("last_touch_id"), lty.as("last_type"))
  }

  /** DuckDB mirror of [[firstLastTouch]]. */
  def firstLastTouchSql(rel: String, userCol: String, typeCol: String,
                        tsCol: String, idCol: String, convType: String,
                        lookbackUs: Long): String =
    s"""WITH conv AS (SELECT $userCol AS u, $idCol AS conv_id,
       |    epoch_us($tsCol) AS cus FROM $rel WHERE $typeCol = '$convType'),
       |touch AS (SELECT $userCol AS u, epoch_us($tsCol) AS tus,
       |    lpad(CAST(epoch_us($tsCol) AS VARCHAR), 20, '0') || ':' ||
       |    lpad(CAST($idCol AS VARCHAR), 20, '0') || ':' || $typeCol AS k
       |  FROM $rel WHERE $typeCol <> '$convType'),
       |j AS (SELECT conv.conv_id, touch.k
       |  FROM conv LEFT JOIN touch ON conv.u = touch.u
       |    AND touch.tus < conv.cus AND touch.tus >= conv.cus - $lookbackUs),
       |agg AS (SELECT conv_id, COUNT(k) AS n_touches,
       |    MIN(k) AS fk, MAX(k) AS lk FROM j GROUP BY 1)
       |SELECT conv_id, CAST(n_touches AS BIGINT) AS n_touches,
       |  CAST(substr(fk, 22, 20) AS BIGINT) AS first_touch_id,
       |  substr(fk, 43) AS first_type,
       |  CAST(substr(lk, 22, 20) AS BIGINT) AS last_touch_id,
       |  substr(lk, 43) AS last_type
       |FROM agg""".stripMargin

  /**
   * PERIOD CHURN / RETENTION — per activity period (week or month):
   * active users, how many return next period (retained), how many
   * don't (churned), and how many of next period's actives are new.
   * Computed on the DISTINCT (user, period) grain (one hash-agg dedup
   * — repeat events never inflate), then two self equi-joins keyed on
   * (user, period±1): every count is an exact integer, rates one
   * division each. The last period reports NULL churn (its successor
   * is unobserved, not zero) — silently reporting 100% churn there is
   * the classic dashboard bug.
   */
  def periodChurn(events: DataFrame, userCol: String, tsCol: String,
                  period: String = "month"): DataFrame = {
    val um = events.select(col(userCol).as("u"),
      date_trunc(period, col(tsCol)).cast(DateType).as("m")).distinct()
    val lastM = um.agg(max("m").as("__last"))
    val nxt = um.select(col("u"), periodShift(col("m"), period, -1).as("m"),
      lit(1).as("__in_next"))
    val prv = um.select(col("u"), periodShift(col("m"), period, 1).as("m"),
      lit(1).as("__in_prev"))
    um.join(nxt, Seq("u", "m"), "left")
      .join(prv, Seq("u", "m"), "left")
      .groupBy("m")
      .agg(count(lit(1)).as("n_active"),
        sum(coalesce(col("__in_next"), lit(0))).cast(LongType).as("n_retained"),
        sum(when(col("__in_next").isNull, 1).otherwise(0)).cast(LongType)
          .as("n_churned"),
        sum(when(col("__in_prev").isNull, 1).otherwise(0)).cast(LongType)
          .as("n_new"))
      .crossJoin(broadcast(lastM))
      .select(col("m"), col("n_active"), col("n_new"),
        when(col("m") < col("__last"), col("n_retained")).as("n_retained"),
        when(col("m") < col("__last"), col("n_churned")).as("n_churned"),
        when(col("m") < col("__last"),
          col("n_churned").cast(DoubleType) / col("n_active").cast(DoubleType))
          .as("churn_rate"))
  }

  /** DuckDB mirror of [[periodChurn]]. */
  def periodChurnSql(rel: String, userCol: String, tsCol: String,
                     period: String = "month"): String =
    s"""WITH um AS (SELECT DISTINCT $userCol AS u,
       |    CAST(date_trunc('$period', $tsCol) AS DATE) AS m FROM $rel),
       |lastm AS (SELECT MAX(m) AS lm FROM um),
       |base AS (SELECT um.m, count(*) AS n_active,
       |    SUM(CASE WHEN nx.u IS NOT NULL THEN 1 ELSE 0 END) AS n_retained,
       |    SUM(CASE WHEN nx.u IS NULL THEN 1 ELSE 0 END) AS n_churned,
       |    SUM(CASE WHEN pv.u IS NULL THEN 1 ELSE 0 END) AS n_new
       |  FROM um
       |  LEFT JOIN um nx ON um.u = nx.u AND nx.m = ${periodShiftSql("um.m", period, 1)}
       |  LEFT JOIN um pv ON um.u = pv.u AND pv.m = ${periodShiftSql("um.m", period, -1)}
       |  GROUP BY 1)
       |SELECT m, CAST(n_active AS BIGINT) AS n_active, CAST(n_new AS BIGINT) AS n_new,
       |  CASE WHEN m < lm THEN CAST(n_retained AS BIGINT) END AS n_retained,
       |  CASE WHEN m < lm THEN CAST(n_churned AS BIGINT) END AS n_churned,
       |  CASE WHEN m < lm THEN CAST(n_churned AS DOUBLE) / n_active END AS churn_rate
       |FROM base, lastm""".stripMargin

  /**
   * DAU / period-AU stickiness — mean daily actives over the period's
   * OBSERVED days divided by the period's distinct actives (DAU/MAU
   * monthly, DAU/WAU weekly): the engagement ratio every consumer
   * dashboard leads with ("how much of the period audience shows up on
   * a given day"). Two dedup aggregates on the (user, day) and
   * (user, period) grains; mean DAU is the exact integer
   * Σ(daily distinct)/days; both divisions are fixed-arity doubles
   * over exact integers.
   */
  def dauMau(events: DataFrame, userCol: String, tsCol: String,
             period: String = "month"): DataFrame = {
    val ud = events.select(col(userCol).as("u"),
      col(tsCol).cast(DateType).as("d")).distinct()
    val daily = ud.groupBy(col("d")).agg(count(lit(1)).as("dau"))
      .groupBy(date_trunc(period, col("d")).cast(DateType).as("m"))
      .agg(sum("dau").as("__dau_sum"), count(lit(1)).as("n_days"))
    val mau = ud.select(col("u"), date_trunc(period, col("d")).cast(DateType).as("m"))
      .distinct().groupBy("m").agg(count(lit(1)).as("mau"))
    daily.join(mau, Seq("m"))
      .select(col("m"), col("n_days"), col("mau"),
        (col("__dau_sum").cast(DoubleType) / col("n_days").cast(DoubleType))
          .as("avg_dau"),
        (col("__dau_sum").cast(DoubleType) /
          (col("n_days") * col("mau")).cast(DoubleType)).as("stickiness"))
  }

  /** DuckDB mirror of [[dauMau]]. */
  def dauMauSql(rel: String, userCol: String, tsCol: String,
                period: String = "month"): String =
    s"""WITH ud AS (SELECT DISTINCT $userCol AS u, CAST($tsCol AS DATE) AS d FROM $rel),
       |daily AS (SELECT CAST(date_trunc('$period', d) AS DATE) AS m,
       |    SUM(dau) AS dau_sum, count(*) AS n_days
       |  FROM (SELECT d, count(*) AS dau FROM ud GROUP BY 1) GROUP BY 1),
       |mau AS (SELECT m, count(*) AS mau FROM (
       |    SELECT DISTINCT u, CAST(date_trunc('$period', d) AS DATE) AS m FROM ud)
       |  GROUP BY 1)
       |SELECT m, CAST(n_days AS BIGINT) AS n_days, CAST(mau AS BIGINT) AS mau,
       |  CAST(dau_sum AS DOUBLE) / n_days AS avg_dau,
       |  CAST(dau_sum AS DOUBLE) / (n_days * mau) AS stickiness
       |FROM daily JOIN mau USING (m)""".stripMargin

  /**
   * AUDIENCE CO-OCCURRENCE matrix — for every unordered pair of
   * categories, the number of DISTINCT actors seen in both, plus the
   * Jaccard overlap |A∩B| / (|A|+|B|−|A∩B|): the segment-overlap /
   * market-basket-at-audience-grain question ("how much do the
   * populations of X and Y overlap?") that per-event co-occurrence
   * counts get wrong whenever heavy actors repeat.
   *
   * Shape: dedup to the (actor, category) grain FIRST (one hash-agg
   * shuffle keyed by actor+category — map-side combine kills the
   * repeat-event volume), then a self-equi-join ON ACTOR. Per-actor
   * fan-out is C(k,2) where k = that actor's distinct categories —
   * bounded by the category domain, so the join output is
   * |actors|·C(k,2), never |events|². Output is ≤ |categories|² rows.
   * Exact integers; Jaccard is one fixed-arity double division.
   */
  def cooccurrence(df: DataFrame, actorCol: String, catCol: String): DataFrame = {
    val ac = df.filter(col(actorCol).isNotNull && col(catCol).isNotNull)
      .select(col(actorCol).as("__a"), col(catCol).as("__c")).distinct()
    val sizes = ac.groupBy(col("__c")).agg(count(lit(1)).as("__n"))
    val pairs = ac.select(col("__a"), col("__c").as("cat_a"))
      .join(ac.select(col("__a"), col("__c").as("cat_b")), Seq("__a"))
      .filter(col("cat_a") < col("cat_b"))
      .groupBy("cat_a", "cat_b").agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(sizes.withColumnRenamed("__c", "cat_a")
        .withColumnRenamed("__n", "n_a")), Seq("cat_a"))
      .join(broadcast(sizes.withColumnRenamed("__c", "cat_b")
        .withColumnRenamed("__n", "n_b")), Seq("cat_b"))
      .select(col("cat_a"), col("cat_b"), col("n_a"), col("n_b"), col("n_both"),
        (col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double")).as("jaccard"))
  }

  /** DuckDB mirror of [[cooccurrence]] — same actor-grain dedup,
    * self-join, and Jaccard epilogue. */
  def cooccurrenceSql(rel: String, actorCol: String, catCol: String): String =
    s"""WITH ac AS (SELECT DISTINCT $actorCol AS a, $catCol AS c FROM $rel
       |  WHERE $actorCol IS NOT NULL AND $catCol IS NOT NULL),
       |sizes AS (SELECT c, CAST(count(*) AS BIGINT) AS n FROM ac GROUP BY 1),
       |pairs AS (SELECT x.c AS cat_a, y.c AS cat_b,
       |    CAST(count(*) AS BIGINT) AS n_both
       |  FROM ac x JOIN ac y ON x.a = y.a AND x.c < y.c GROUP BY 1, 2)
       |SELECT cat_a, cat_b, sa.n AS n_a, sb.n AS n_b, n_both,
       |  CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both) AS jaccard
       |FROM pairs JOIN sizes sa ON pairs.cat_a = sa.c
       |           JOIN sizes sb ON pairs.cat_b = sb.c""".stripMargin

  /**
   * PEAK CONCURRENCY per key — the sweep-line maximum of simultaneously
   * open half-open intervals [start, end): +1 at each start, −1 at each
   * end, cumulative-sum over time, max. The classic occupancy /
   * max-connections / in-flight-shipments statistic that
   * [[mergeIntervals]]'s union-length cannot answer.
   *
   * Scale shape: deltas PRE-AGGREGATE onto the per-(key, time) grid
   * (one keyed agg with map-side combine over 2 rows per interval), so
   * the cumulative window walks each key's DISTINCT event times — at
   * 100 TB the window state is the time-grid cardinality (dates: a few
   * thousand), never the interval count. The cumulative sum is exact
   * integers; `peak_at` is the EARLIEST time attaining the peak (the
   * min-over-filter makes the answer a total function of the data, no
   * tie ambiguity). Inverted/NULL intervals fail loudly like
   * [[mergeIntervals]] — a silent drop would understate occupancy.
   */
  def peakConcurrency(df: DataFrame, keys: Seq[String],
                      startCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = col(startCol)
    val e = col(endCol)
    val guarded = when(s.isNull || e.isNull || e < s,
      raise_error(lit(s"peakConcurrency: NULL or inverted [$startCol, $endCol)"))
        .cast(df.schema(startCol).dataType)).otherwise(s)
    val kcols = keys.map(col)
    val events = df.withColumn("__s", guarded)
      .select(kcols :+ col("__s").as("t") :+ lit(1L).as("d"): _*)
      .unionAll(df.select(kcols :+ e.as("t") :+ lit(-1L).as("d"): _*))
    val deltas = events.groupBy(kcols :+ col("t"): _*).agg(sum("d").as("delta"))
    val walk = Window.partitionBy(kcols: _*).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = deltas.withColumn("__open", sum("delta").over(walk))
      .withColumn("__peak", max(col("__open"))
        .over(Window.partitionBy(kcols: _*)))
    run.filter(col("__open") === col("__peak"))
      .groupBy(kcols: _*)
      .agg(max("__peak").as("peak"), min("t").as("peak_at"))
  }

  /** DuckDB mirror of [[peakConcurrency]] — same ±1 grid deltas,
    * cumulative walk, earliest-peak pick. `keys`/cols are interpolated
    * verbatim; `rel` supplies start/end columns by those names. */
  def peakConcurrencySql(rel: String, keys: Seq[String],
                         startCol: String, endCol: String): String = {
    val ks = keys.mkString(", ")
    s"""WITH ev AS (
       |  SELECT $ks, $startCol AS t, CAST(1 AS BIGINT) AS d FROM $rel
       |  UNION ALL
       |  SELECT $ks, $endCol AS t, CAST(-1 AS BIGINT) AS d FROM $rel),
       |deltas AS (SELECT $ks, t, SUM(d) AS delta FROM ev GROUP BY ALL),
       |walk AS (SELECT $ks, t,
       |    SUM(delta) OVER (PARTITION BY $ks ORDER BY t
       |      ROWS UNBOUNDED PRECEDING) AS open
       |  FROM deltas),
       |pk AS (SELECT $ks, t, open,
       |    MAX(open) OVER (PARTITION BY $ks) AS peak FROM walk)
       |SELECT $ks, CAST(MAX(peak) AS BIGINT) AS peak, MIN(t) AS peak_at
       |FROM pk WHERE open = peak GROUP BY ALL""".stripMargin
  }

  /**
   * First-order Markov transition matrix over each user's event-type
   * sequence: counts of (previous type → type) transitions plus the
   * row-normalized transition probability — the standard
   * next-event-model / funnel-discovery statistic (and the label
   * distribution a next-action training set would be packed from).
   *
   * Determinism: the per-user sequence order is `(ts, eventIdCol)` —
   * the unique id breaks timestamp ties, otherwise lag() would be
   * partition-order-dependent and the counts irreproducible. Counts
   * are exact integers; the probability is one double division per
   * (from, to) pair.
   *
   * Shape: one window (lag over the user partition) + one keyed
   * aggregate on (from, to) with map-side partials + a broadcast-size
   * per-from rollup joined back — output is |types|², independent of
   * event volume.
   */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, eventIdCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(eventIdCol))
    val pairs = events
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .select(col("__from").as("from_type"), col(typeCol).as("to_type"))
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type").as("__ft"))
      .agg(sum(col("n")).as("__row_total"))
    counts.join(totals, col("from_type") === col("__ft"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("__row_total").cast("double")).as("p"))
  }

  /**
   * Markov-chain STEADY-STATE distribution over event-type transitions
   * — the long-run occupancy the [[transitionMatrix]] implies ("where
   * do user journeys spend their time"), the stationary π with
   * π(j) = Σ_i π(i)·P(i,j). Fixed-point iteration in the
   * [[graft.ops.Graph]] integer currency (BIGINT multiples of 1e-15):
   * each round is `π'(j) = Σ_i (π(i)·c_ij) div r_i` — the per-row
   * product widened to DECIMAL(38)/HUGEINT (π·c exceeds 2⁶³ at modest
   * event counts), integer SUM, no FP anywhere — so the unrolled-SQL
   * oracle matches bit-for-bit. The chain is CLOSED TO A FIXED POINT
   * over the type graph: repeatedly drop transitions into types that
   * no longer emit and recompute the emitting set until stable —
   * i.e. keep exactly the types that can reach a CYCLE of the type
   * graph (one pass is not enough: a type whose every successor is a
   * sink keeps its π row but loses all out-rows, and its mass would
   * silently evaporate each round, breaking the "every round is
   * exactly stochastic" contract). The closure runs on the
   * driver over the DISTINCT type-pair table (|types|² rows,
   * guarded ≤ 100k — metadata, not data), so the per-round
   * distributed cost is still just the counts join. Types outside
   * the recurrent closure carry zero long-run occupancy by
   * definition, so restricting π to the closure IS the stationary
   * answer, not an approximation. A chain whose every observed type
   * drains (a pure DAG of types) has no stationary distribution and
   * fails loudly.
   */
  def markovSteady(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, eventIdCol: String,
                   iterations: Int = 6): DataFrame = {
    require(iterations >= 1 && iterations <= 32,
      s"markovSteady: iterations in [1, 32], got $iterations")
    import org.apache.spark.sql.expressions.Window
    val SCALE = graft.ops.Graph.SCALE
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(eventIdCol))
    val pairs = events
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .select(col("__from").as("from_type"), col(typeCol).as("to_type"))
    // Recurrent-closure fixed point on the TYPE graph (tiny): start
    // from all emitting types, repeatedly drop types whose every
    // out-transition lands outside the surviving set. Terminates in
    // ≤ |types| rounds; the survivors are exactly the types that can
    // reach a cycle. Driver-side over the distinct pair table — the
    // same bounded-metadata shape as the watermark collects.
    val typeEdges = pairs.distinct().limit(100001).collect()
      .map(r0 => (r0.getString(0), r0.getString(1)))
    require(typeEdges.length <= 100000,
      "markovSteady: > 100k distinct type-pairs — type column is not a category")
    var surv = typeEdges.map(_._1).toSet
    var stable = false
    while (!stable) {
      val next = typeEdges.filter { case (f, t) => surv(f) && surv(t) }
        .map(_._1).toSet
      stable = next == surv
      surv = next
    }
    require(surv.nonEmpty,
      "markovSteady: no recurrent class — every observed type drains to a sink, " +
        "the chain has no stationary distribution")
    val fromTypes = pairs.select(col("from_type").as("t")).distinct()
      .filter(col("t").isInCollection(surv)).localCheckpoint()
    val c = pairs
      .filter(col("from_type").isInCollection(surv) &&
        col("to_type").isInCollection(surv))
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val r = c.groupBy("from_type").agg(sum("cnt").as("rt"))
    val n = fromTypes.count()
    var pi = fromTypes.select(col("t").as("event_type"),
      lit(SCALE / n).as("pi"))
    for (_ <- 1 to iterations) {
      val m = c.join(pi.withColumnRenamed("event_type", "from_type"), "from_type")
        .join(r, "from_type")
        .selectExpr("to_type AS event_type",
          "(CAST(pi AS DECIMAL(38,0)) * cnt) div rt AS m")
        .groupBy("event_type").agg(sum("m").as("__pi"))
      pi = fromTypes.select(col("t").as("event_type"))
        .join(m, Seq("event_type"), "left")
        .select(col("event_type"), coalesce(col("__pi"), lit(0L)).as("pi"))
        .localCheckpoint()
    }
    pi.select(col("event_type"),
      (col("pi").cast(org.apache.spark.sql.types.DoubleType) /
        lit(SCALE.toDouble)).as("steady"))
  }

  /** DuckDB mirror of [[markovSteady]] — the same recurrent-closure
    * type set (via a recursive reachability CTE: survivors = types
    * that reach a cycle of the internal type graph, exactly the
    * drop-sinks-until-stable fixed point) and unrolled integer
    * rounds. Expects the events relation name. */
  def markovSteadySql(rel: String, iterations: Int = 6): String = {
    val sc = graft.ops.Graph.SCALE
    def round(prev: String, i: Int) =
      s"""m$i AS (SELECT c.to_type AS event_type,
         |    SUM((CAST(p.pi AS HUGEINT) * c.cnt) // r.rt) AS pi
         |  FROM c JOIN $prev p ON c.from_type = p.event_type
         |       JOIN r ON c.from_type = r.from_type
         |  GROUP BY 1),
         |p$i AS (SELECT ft.t AS event_type, CAST(COALESCE(m.pi, 0) AS BIGINT) AS pi
         |  FROM ft LEFT JOIN m$i m ON ft.t = m.event_type)""".stripMargin
    val rounds = (1 to iterations).map(i => round(s"p${i - 1}", i)).mkString(",\n")
    s"""WITH RECURSIVE pairs AS (SELECT prev AS from_type, event_type AS to_type FROM (
       |    SELECT event_type,
       |           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |    FROM $rel) WHERE prev IS NOT NULL),
       |f0 AS (SELECT DISTINCT from_type AS t FROM pairs),
       |ie AS (SELECT DISTINCT from_type AS a, to_type AS b FROM pairs
       |       WHERE to_type IN (SELECT t FROM f0)),
       |reach(a, b) AS (
       |    SELECT a, b FROM ie
       |  UNION
       |    SELECT r.a, e.b FROM reach r JOIN ie e ON r.b = e.a),
       |cyc AS (SELECT DISTINCT a FROM reach WHERE a = b),
       |ft AS (SELECT DISTINCT r.a AS t FROM reach r
       |       WHERE r.b IN (SELECT a FROM cyc)),
       |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
       |      FROM pairs WHERE from_type IN (SELECT t FROM ft)
       |        AND to_type IN (SELECT t FROM ft) GROUP BY 1, 2),
       |r AS (SELECT from_type, SUM(cnt) AS rt FROM c GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM ft),
       |p0 AS (SELECT t AS event_type, $sc // (SELECT n FROM nn) AS pi FROM ft),
       |$rounds
       |SELECT event_type, CAST(pi AS DOUBLE) / $sc.0 AS steady
       |FROM p$iterations""".stripMargin
  }

  /**
   * EXPOSURE-CONDITIONED A/B experiment analysis — the windowed
   * companion to [[abTest]]'s whole-history readout: users split into
   * two arms by a DETERMINISTIC md5 hash of the user key (the stateless assignment real experiment
   * platforms use — stable under replays, joins, and re-runs, where
   * `rand()` is none of those), exposure = the user's first
   * `exposeType` event, conversion = a `convType` event INSIDE the
   * attribution window [t₀, t₀ + window] after exposure (conditioning
   * on exposure time — a purchase before the first view is not
   * treatment effect; an unbounded window saturates to "eventually
   * everyone"). Reports one row: per-arm exposed/converted counts
   * (exact integers), rates, absolute lift, and the pooled
   * two-proportion z statistic
   * `z = (p₁ − p₀) / √(p̂(1−p̂)(1/n₀ + 1/n₁))` — every double op in a
   * fixed order, so the mirror lands on the identical bits; z is NULL
   * when the pooled variance is 0 (all or none converted — the test is
   * undefined, and 0/0 must not masquerade as evidence).
   *
   * Scale shape: one keyed min-aggregate (first exposures), one
   * time-qualified LEFT SEMI join on the user key for conversions
   * (state bounded by users, not events), one conditional aggregate to
   * a single row. No windows, no collects.
   */
  def abTestExposure(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
                     exposeType: String, convType: String, window: Column): DataFrame = {
    val fv = events.filter(col(typeCol) === exposeType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t0"))
    val arm = fv.withColumn("__arm",
      expr(s"CAST(conv(substring(md5(CONCAT('ab:', CAST($userCol AS STRING))), 1, 8)," +
        " 16, 10) AS BIGINT) % 2")
      .cast(org.apache.spark.sql.types.IntegerType))
    val purch = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__cu"), col(tsCol).as("__cts"))
    val convUsers = arm.join(purch,
        arm(userCol) === col("__cu") && col("__cts") >= col("__t0") &&
          col("__cts") <= col("__t0") + window, "left_semi")
      .select(col(userCol)).withColumn("__c", lit(1L))
    val flags = arm.join(convUsers, Seq(userCol), "left")
      .select(col("__arm"), coalesce(col("__c"), lit(0L)).as("__c"))
    val s = flags.agg(
      sum(when(col("__arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__arm") === 0, col("__c")).otherwise(0L)).as("conv_a"),
      sum(when(col("__arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__arm") === 1, col("__c")).otherwise(0L)).as("conv_b"))
    val d = (c: Column) => c.cast(DoubleType)
    val rateA = d(col("conv_a")) / d(col("n_a"))
    val rateB = d(col("conv_b")) / d(col("n_b"))
    val pool = d(col("conv_a") + col("conv_b")) / d(col("n_a") + col("n_b"))
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b"))))
    // DEGENERATE-ARM guard (r16 audit): an EMPTY arm would make the
    // epilogue divide by zero, where Spark yields NULL but DuckDB
    // yields ±inf/nan — a mirror-shared formula cannot be allowed to
    // reach an expression the engines evaluate differently. Every rate
    // column is therefore explicitly NULL unless its arm is populated,
    // in BOTH engines; z additionally needs positive pooled variance.
    val armed = col("n_a") > 0 && col("n_b") > 0
    s.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") > 0, rateA).as("rate_a"),
      when(col("n_b") > 0, rateB).as("rate_b"),
      when(armed, rateB - rateA).as("lift"),
      when(armed && se > 0.0, (rateB - rateA) / se).as("z_pooled"))
  }

  /**
   * CUPED variance-reduced A/B lift (Deng–Xu–Kohavi–Walker, WSDM '13)
   * — the experimentation-platform standard for shrinking metric
   * variance with PRE-EXPERIMENT behavior: per user, X = spend in the
   * first half of the observation window (the covariate), Y = spend in
   * the second half (the experiment metric; the cut is the integer
   * midpoint of the event-time range — deterministic in any engine).
   * θ = cov(X,Y)/var(X) is fit POOLED (assignment-independent, so
   * adjustment cannot leak treatment), the adjusted metric is
   * Y − θ(X − E[X]), and the adjusted lift collapses algebraically to
   * `lift − θ·(mean_x_b − mean_x_a)` — arm-level sums suffice, no
   * second per-user pass. `var_ratio` = 1 − cov²/(var·var) is the
   * fraction of Y-variance CUPED keeps (the sample-size discount).
   *
   * Determinism: X/Y are exact integer cents; every second moment is
   * one keyed aggregate in DECIMAL(38) (n·Σ − Σ² identities, ONE
   * correctly-rounded double conversion each — hiLoDouble on the
   * mirror), and each double step is a fixed shared formula. All
   * degenerate denominators NULL-gate in BOTH engines (the
   * ev_ab_exposure audit class): var(X) = 0 kills θ/lift_adj/
   * var_ratio, an empty arm kills its means and both lifts.
   *
   * Scale shape: one scan → per-user keyed aggregate (state bounded by
   * users), one conditional aggregate to a single row. The bounds row
   * broadcasts; no windows, no collects.
   */
  def cupedLift(events: DataFrame, userCol: String, tsCol: String,
                valCol: String, arm: Column): DataFrame = {
    val per = prePostCents(events, userCol, tsCol, valCol).withColumn("__v", arm)
    per.agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(when(col("__v") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__v") === 0, col("x")).otherwise(0L)).as("sx_a"),
        sum(when(col("__v") === 0, col("y")).otherwise(0L)).as("sy_a"),
        sum(when(col("__v") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__v") === 1, col("x")).otherwise(0L)).as("sx_b"),
        sum(when(col("__v") === 1, col("y")).otherwise(0L)).as("sy_b"))
      .selectExpr("n", "n_a", "n_b", "sx_a", "sx_b", "sy_a", "sy_b",
        "CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) AS vx",
        "CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE) AS vy",
        "CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE) AS cxy")
      .selectExpr("n", "n_a", "n_b", "vy", "cxy",
        "CASE WHEN vx > 0 THEN cxy / vx END AS theta",
        "CASE WHEN vx > 0 AND vy > 0 THEN 1.0 - cxy * cxy / vx / vy END AS var_ratio",
        "CASE WHEN n_a > 0 THEN CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 END AS mean_x_a",
        "CASE WHEN n_b > 0 THEN CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 END AS mean_x_b",
        "CASE WHEN n_a > 0 THEN CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 END AS mean_y_a",
        "CASE WHEN n_b > 0 THEN CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 END AS mean_y_b")
      .selectExpr("n", "n_a", "n_b", "theta", "mean_y_a", "mean_y_b",
        "mean_y_b - mean_y_a AS lift",
        "mean_y_b - mean_y_a - theta * (mean_x_b - mean_x_a) AS lift_adj",
        "var_ratio")
  }

  /** Per-user (pre, post) integer-cent spend around the integer
    * midpoint of the event-time range — the shared panel frame of
    * [[cupedLift]] and [[didLift]]: x = first-half cents, y = second-
    * half cents, zero-filled so every observed user appears in both
    * periods. Deterministic in any engine (epoch-micro integer
    * midpoint, truncating division on positive epochs). */
  private def prePostCents(events: DataFrame, userCol: String, tsCol: String,
                           valCol: String): DataFrame = {
    val withUs = events.select(col(userCol),
      unix_micros(col(tsCol)).as("__us"),
      expr(s"CAST(CAST($valCol AS DECIMAL(18,2)) * 100 AS BIGINT)").as("__c"))
    val bounds = withUs.agg(min("__us").as("__mn"), max("__us").as("__mx"))
    withUs.crossJoin(broadcast(bounds))
      .withColumn("__cut", expr("(__mn + __mx) div 2"))
      .groupBy(col(userCol))
      .agg(sum(when(col("__us") < col("__cut"), col("__c")).otherwise(0L)).as("x"),
        sum(when(col("__us") >= col("__cut"), col("__c")).otherwise(0L)).as("y"))
  }

  /** DIFFERENCE-IN-DIFFERENCES lift — the quasi-experimental companion
    * of [[cupedLift]] on the same per-user pre/post panel: each arm's
    * own pre-period mean is its counterfactual baseline, so
    * did = (post_b − pre_b) − (post_a − pre_a) nets out any level
    * difference between the arms AND any common time trend — the
    * estimator a platform reads when assignment wasn't randomized
    * (parallel-trends assumption documented, not hidden). Exact
    * integer cents to arm-level sums, one fixed double formula per
    * output; empty arms NULL-gate everything downstream in BOTH
    * engines. One row: per-arm n / pre / post means, per-arm deltas,
    * and the DiD estimate. */
  def didLift(events: DataFrame, userCol: String, tsCol: String,
              valCol: String, arm: Column): DataFrame =
    prePostCents(events, userCol, tsCol, valCol).withColumn("__v", arm)
      .agg(
        sum(when(col("__v") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__v") === 0, col("x")).otherwise(0L)).as("sx_a"),
        sum(when(col("__v") === 0, col("y")).otherwise(0L)).as("sy_a"),
        sum(when(col("__v") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__v") === 1, col("x")).otherwise(0L)).as("sx_b"),
        sum(when(col("__v") === 1, col("y")).otherwise(0L)).as("sy_b"))
      .selectExpr("n_a", "n_b",
        "CASE WHEN n_a > 0 THEN CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 END AS pre_a",
        "CASE WHEN n_a > 0 THEN CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 END AS post_a",
        "CASE WHEN n_b > 0 THEN CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 END AS pre_b",
        "CASE WHEN n_b > 0 THEN CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 END AS post_b")
      .selectExpr("n_a", "n_b", "pre_a", "post_a", "pre_b", "post_b",
        "post_a - pre_a AS delta_a",
        "post_b - pre_b AS delta_b",
        "(post_b - pre_b) - (post_a - pre_a) AS did")

  /** DuckDB mirror of [[abTestExposure]] — same md5 arms, same
    * time-qualified conversion join, same fixed-order double epilogue. */
  def abTestExposureSql(rel: String, userCol: String, typeCol: String, tsCol: String,
                        exposeType: String, convType: String, windowSql: String): String =
    s"""WITH fv AS (SELECT $userCol AS u, MIN($tsCol) AS t0 FROM $rel
       |  WHERE $typeCol = '$exposeType' GROUP BY 1),
       |arm AS (SELECT u, t0,
       |    CAST(CAST(('0x' || substr(md5('ab:' || CAST(u AS VARCHAR)), 1, 8)) AS BIGINT)
       |         % 2 AS INTEGER) AS arm
       |  FROM fv),
       |cv AS (SELECT DISTINCT a.u FROM arm a
       |  JOIN $rel e ON e.$userCol = a.u AND e.$typeCol = '$convType'
       |             AND e.$tsCol >= a.t0 AND e.$tsCol <= a.t0 + $windowSql),
       |fl AS (SELECT a.arm, CASE WHEN cv.u IS NULL THEN 0 ELSE 1 END AS c
       |       FROM arm a LEFT JOIN cv ON cv.u = a.u),
       |s AS (SELECT
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(SUM(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS conv_a,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(SUM(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT) AS conv_b
       |  FROM fl)
       |SELECT n_a, conv_a, n_b, conv_b,
       |  CASE WHEN n_a > 0
       |       THEN CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS rate_a,
       |  CASE WHEN n_b > 0
       |       THEN CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS rate_b,
       |  CASE WHEN n_a > 0 AND n_b > 0
       |       THEN CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
       |          - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS lift,
       |  CASE WHEN n_a > 0 AND n_b > 0
       |   AND sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
       |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
       |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) > 0.0
       |  THEN (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
       |    - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
       |  / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
       |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
       |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
       |  END AS z_pooled
       |FROM s""".stripMargin

  /**
   * Linear multi-touch attribution: every conversion splits one unit
   * of credit EQUALLY across the user's touch events inside the
   * lookback window (touch_ts ∈ (conv_ts − window, conv_ts]), and each
   * channel's total is the sum of its credits — the standard
   * marketing-attribution model between last-touch (as-of join) and
   * data-driven.
   *
   * Determinism: per-conversion credit `1/n` is ONE double division
   * (identical everywhere), then re-anchored to DECIMAL(18,9) so the
   * channel-level SUM is exact decimal addition — order-independent
   * and engine-identical, where summing raw double credits would be
   * partial-aggregation-order dependent. Conversions with NO touch in
   * the window surface under channel '(unattributed)' so no credit
   * vanishes wholesale. Conservation is exact to the DECIMAL(18,9)
   * anchor, not absolute: an n-way split sums to n·trunc(1/n), i.e.
   * within 1e-9 per conversion of 1 (an n=3 conversion contributes
   * 0.999999999) — both engines truncate identically, so the oracle
   * hash is still exact. Distribute the remainder to one touchpoint
   * if absolute conservation ever matters more than equal splits.
   *
   * Shape: one time-bounded equi-join on the user key (the
   * ev_correlated / stream-stream join shape — state bounded by the
   * window), one per-conversion count window, one keyed aggregate.
   */
  def linearAttribution(events: DataFrame, userCol: String, typeCol: String,
                        tsCol: String, idCol: String,
                        touchTypes: Seq[String], convType: String,
                        window: Column): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      s"linearAttribution: touch types must be non-empty and exclude '$convType'")
    import org.apache.spark.sql.expressions.Window
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(typeCol).as("channel"),
        col(tsCol).as("__touch_ts"))
    val convs = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(tsCol).as("__conv_ts"),
        col(idCol).as("conv_id"))
    val touched = convs.join(touches, Seq("__u"))
      .filter(col("__touch_ts") <= col("__conv_ts")
        && col("__touch_ts") > col("__conv_ts") - window)
    val untouched = convs.join(touched.select(col("conv_id")), Seq("conv_id"), "left_anti")
      .select(col("conv_id"), lit("(unattributed)").as("channel"), lit(1L).as("__n"))
    val w = Window.partitionBy(col("conv_id"))
    val credited = touched
      .withColumn("__n", count(lit(1)).over(w))
      .select(col("conv_id"), col("channel"), col("__n"))
      .unionByName(untouched)
    credited
      .withColumn("__credit",
        (lit(1.0) / col("__n").cast("double")).cast(DecimalType(18, 9)))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touchpoints"),
        sum(col("__credit")).cast("double").as("credit"))
  }

  /**
   * A/B experiment readout — the two-proportion z-test product teams
   * run on every experiment: users split by a deterministic variant
   * expression, a user counts as CONVERTED if they have ≥ 1 `convType`
   * event, and the readout is one row of per-variant counts/rates plus
   * the pooled z statistic
   * `z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b))`.
   *
   * Determinism: the sufficient statistics are exact integer counts
   * from two keyed aggregates (per-user conversion flag, then one
   * conditional global aggregate — both map-side combined); the
   * epilogue is a fixed chain of correctly-rounded IEEE ops (÷ × − √)
   * on those integers, so the statistic is engine-identical and
   * oracle-hashable — the pearsonByKey contract. Degenerate splits
   * (an empty variant, or a pooled rate of 0 or 1, where the z
   * denominator is 0) yield NULL, never NaN/±Inf.
   */
  def abTest(events: DataFrame, userCol: String, typeCol: String,
             convType: String, variant: Column): DataFrame = {
    val perUser = events
      .select(variant.as("__v"), col(userCol).as("__u"),
        (col(typeCol) === convType).as("__c"))
      .groupBy(col("__v"), col("__u"))
      .agg(max(col("__c")).cast("long").as("__conv"))
    val agg = perUser.agg(
      count(when(col("__v") === 0, lit(1))).as("n_a"),
      coalesce(sum(when(col("__v") === 0, col("__conv"))), lit(0L)).as("c_a"),
      count(when(col("__v") === 1, lit(1))).as("n_b"),
      coalesce(sum(when(col("__v") === 1, col("__conv"))), lit(0L)).as("c_b"))
    val (na, ca, nb, cb) = (col("n_a").cast("double"), col("c_a").cast("double"),
      col("n_b").cast("double"), col("c_b").cast("double"))
    val pa = ca / na
    val pb = cb / nb
    val pool = (ca + cb) / (na + nb)
    val den = sqrt(pool * (lit(1.0) - pool) * (lit(1.0) / na + lit(1.0) / nb))
    agg.select(col("n_a"), col("c_a"), pa.as("rate_a"),
      col("n_b"), col("c_b"), pb.as("rate_b"),
      when(col("n_a") === 0 || col("n_b") === 0 || den === 0.0,
        lit(null).cast(DoubleType))
        .otherwise((pa - pb) / den).as("z_score"))
  }

  /** Conditional-aggregation pivot on event type (fixed domain, so the
    * output schema is static and oracle-expressible). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def pivotByType(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .toDF("user_id" +: EventTypes.map("n_" + _): _*)

  /**
   * Sequential conversion funnel: a user reaches stage i when some
   * stage-i event occurs STRICTLY AFTER the time they reached stage
   * i-1 (their earliest qualifying stage-i event becomes the reach
   * time). This is the order-respecting semantics product funnels use —
   * a click before ever viewing does not count, a later click does.
   *
   * Plan shape: stage 0 is one keyed aggregate; each later stage is an
   * equi-join on the user key against the previous reach set (which
   * only shrinks) plus a keyed min — a chain of `stages.length` narrow
   * shuffles, no window over the whole event stream and nothing
   * quadratic. The per-stage counts are 1-row aggregates unioned at
   * the end.
   */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events.select(
      col(userCol).as("u"), col(typeCol).as("et"), col(tsCol).as("t"))
    val reaches = reachChain(base, stages)
    stages.zip(reaches).zipWithIndex.map { case ((st, r), i) =>
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** The per-user stage reach-time chain [[funnel]] counts over:
    * element i = `(u, tr)` of users who reached stage i, with their
    * earliest qualifying time. */
  private def reachChain(base: DataFrame, stages: Seq[String]): Vector[DataFrame] =
    stages.zipWithIndex.foldLeft(Vector.empty[DataFrame]) {
      case (acc, (st, i)) =>
        val r =
          if (i == 0)
            base.filter(col("et") === st).groupBy("u").agg(min(col("t")).as("tr"))
          else
            base.filter(col("et") === st)
              .join(acc.last.select(col("u"), col("tr").as("prev_tr")), "u")
              .filter(col("t") > col("prev_tr"))
              .groupBy("u").agg(min(col("t")).as("tr"))
        acc :+ r
    }

  /**
   * Time-to-convert per funnel step — the latency distribution product
   * analytics reads next to the counts [[funnel]] gives: for every
   * consecutive stage pair, how long users who made the step took
   * (reach-time difference), as `(step_idx, from_stage, to_stage,
   * n_converted, min_us, p50_us, max_us)` in exact MICROSECONDS
   * (integer diffs — engine-portable where fractional epoch seconds
   * truncate differently across engines; the p50 midpoint of two
   * integers is exactly representable). Same reach-chain plan as the
   * funnel plus one keyed join per step; each step's aggregate is one
   * row. Users at stage i are a subset of stage i-1 by construction,
   * so the join drops nobody.
   */
  def funnelLatency(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnelLatency needs at least two stages")
    val base = events.select(
      col(userCol).as("u"), col(typeCol).as("et"), col(tsCol).as("t"))
    val reaches = reachChain(base, stages)
    (1 until stages.size).map { i =>
      val from = reaches(i - 1).select(col("u"), unix_micros(col("tr")).as("t_from"))
      val to = reaches(i).select(col("u"), unix_micros(col("tr")).as("t_to"))
      to.join(from, "u")
        .select((col("t_to") - col("t_from")).as("lat"))
        .agg(count(lit(1)).as("n_converted"),
          min(col("lat")).as("min_us"),
          percentile(col("lat"), lit(0.5)).as("p50_us"),
          max(col("lat")).as("max_us"))
        .select(lit(i).as("step_idx"), lit(stages(i - 1)).as("from_stage"),
          lit(stages(i)).as("to_stage"), col("n_converted"),
          col("min_us"), col("p50_us"), col("max_us"))
    }.reduce(_ unionByName _)
  }

  /**
   * Time-constrained funnel: identical to [[funnel]] except stage i
   * must occur within `maxGap` of reaching stage i-1 (real product
   * funnels bound each step — "purchased within a day of clicking" —
   * or every ancient signup eventually "converts"). Same join-chain
   * plan with one extra range predicate on the already-joined row, so
   * the 100 TB shape is unchanged: the reach sets only shrink faster.
   * `maxGap` is an interval expression, e.g. `expr("INTERVAL 1 DAY")`.
   */
  def funnelWindowed(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
                     stages: Seq[String], maxGap: Column): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events.select(
      col(userCol).as("u"), col(typeCol).as("et"), col(tsCol).as("t"))
    val reaches = stages.zipWithIndex.foldLeft(Vector.empty[DataFrame]) {
      case (acc, (st, i)) =>
        val r =
          if (i == 0)
            base.filter(col("et") === st).groupBy("u").agg(min(col("t")).as("tr"))
          else
            base.filter(col("et") === st)
              .join(acc.last.select(col("u"), col("tr").as("prev_tr")), "u")
              .filter(col("t") > col("prev_tr") && col("t") <= col("prev_tr") + maxGap)
              .groupBy("u").agg(min(col("t")).as("tr"))
        acc :+ r
    }
    stages.zip(reaches).zipWithIndex.map { case ((st, r), i) =>
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /**
   * Cohort retention: users are grouped by their first activity date
   * (the cohort), and each later active day contributes to that
   * cohort's `day_offset` bucket. The classic triangle matrix behind
   * every retention chart.
   *
   * Plan shape: per-user-day distinct (one shuffle on the compound
   * key), per-user min (narrow keyed agg), an equi-join on the user
   * key, and the final (cohort, offset) aggregate — all keyed, nothing
   * collected, skew bounded by days-per-user.
   */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val acts = events.select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
    val cohorts = acts.groupBy("u").agg(min(col("d")).as("cohort_d"))
    acts.join(cohorts, "u")
      .groupBy(col("cohort_d"), datediff(col("d"), col("cohort_d")).as("day_offset"))
      .agg(count_distinct(col("u")).as("n_users"))
  }

  /** Sequence-pattern matching over each user's event JOURNEY — the
    * MATCH_RECOGNIZE-lite every product-analytics stack grows: the
    * user's events collapse (in (ts, id) order — a total order, so the
    * journey string is deterministic under any partitioning) into one
    * compact string of event-type initials, and each named regex
    * classifies it ("converted", "converted before any error", …).
    * Patterns must stay in the Java∩RE2 common subset so the DuckDB
    * oracle replays them exactly (the t_pii_redact rule).
    *
    * Scale shape: ONE keyed aggregate (array_sort over the collected
    * (ts, id, initial) structs — per-user state is the user's event
    * count, the same bound sessionization already carries) + a pure
    * regex projection. No windows, no joins. */
  def journeyMatch(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, idCol: String,
                   patterns: Seq[(String, String)]): DataFrame = {
    require(patterns.nonEmpty, "journeyMatch: no patterns given")
    val j = events
      .select(col(userCol), col(tsCol), col(idCol),
        substring(col(typeCol), 1, 1).as("__init"))
      .groupBy(col(userCol))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col(tsCol), col(idCol), col("__init")))),
        x => x.getField("__init"))).as("journey"))
    patterns.foldLeft(j) { case (df, (name, re)) =>
      df.withColumn(name, col("journey").rlike(re))
    }
  }

  /** Exact cent conversion with the zscore guard (see
    * [[graft.ops.TimeSeries]]): DECIMAL(18,2)·100 → BIGINT, loud on
    * overflow, loud on negatives where the caller requires them. */
  private def centsOf(valueCol: String, requireNonNeg: Boolean = false): org.apache.spark.sql.Column = {
    val vc = (col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast("bigint")
    val guarded = when(col(valueCol).isNotNull && vc.isNull,
      raise_error(concat(
        lit(s"events: $valueCol out of DECIMAL(18,2) cent range: "),
        col(valueCol).cast("string"))).cast("bigint"))
      .otherwise(vc)
    if (!requireNonNeg) guarded
    else when(guarded < 0,
      raise_error(concat(lit(s"events: $valueCol must be non-negative, got "),
        col(valueCol).cast("string"))).cast("bigint")).otherwise(guarded)
  }

  /** RFM segmentation — the classic recency/frequency/monetary quintile
    * grid over a user event stream. Each user gets three 1–5 scores
    * (quintile index ASCENDING in the metric: r=1 most recent, f=5 most
    * frequent, m=5 biggest spender) and lands in segment "rfm".
    *
    * The quintile thresholds are NOT a global ntile — a global ntile is
    * one all-rows sort through a single partition, the exact shape that
    * dies at 10⁹ users. Instead, threshold k = the smallest metric
    * value v with #users(metric ≤ v) ≥ k·n/5, computed from a
    * VALUE-COUNT cumsum whose size is the metric's distinct-value count:
    * recency is calendar-bounded, frequency is count-bounded, and
    * monetary is pre-binned to `monetaryBinCents` buckets (the
    * agg_binned_quantile bound) — so every window runs over a bounded
    * bin table, never the user table. Scoring is then a pure
    * broadcast-threshold projection. All arithmetic is exact integers;
    * `cum·5 ≥ n·k` keeps the quintile rule division-free. */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String, valueCol: String,
                  monetaryBinCents: Long = 10000L): DataFrame = {
    require(monetaryBinCents >= 1, s"rfmSegments: bad bin $monetaryBinCents")
    val anchor = events.agg(max(to_date(col(tsCol))).as("__anchor"))
    val per = events
      .groupBy(col(userCol))
      .agg(max(to_date(col(tsCol))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(centsOf(valueCol, requireNonNeg = true)).as("monetary_cents"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days", datediff(col("__anchor"), col("__last")).cast("long"))
      .withColumn("__mbin", expr(s"monetary_cents div $monetaryBinCents"))
    val n = broadcast(per.agg(count(lit(1)).as("__n")))
    def thresholds(metric: String, pfx: String): DataFrame = {
      val cum = per.groupBy(col(metric).as("__v")).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("__v"))))
        .crossJoin(n)
      cum.agg(
        min(when(col("__cum") * 5 >= col("__n") * 1, col("__v"))).as(s"${pfx}1"),
        min(when(col("__cum") * 5 >= col("__n") * 2, col("__v"))).as(s"${pfx}2"),
        min(when(col("__cum") * 5 >= col("__n") * 3, col("__v"))).as(s"${pfx}3"),
        min(when(col("__cum") * 5 >= col("__n") * 4, col("__v"))).as(s"${pfx}4"))
    }
    def score(metric: String, pfx: String) =
      (lit(1) + (col(metric) > col(s"${pfx}1")).cast("int")
        + (col(metric) > col(s"${pfx}2")).cast("int")
        + (col(metric) > col(s"${pfx}3")).cast("int")
        + (col(metric) > col(s"${pfx}4")).cast("int"))
    per
      .crossJoin(broadcast(thresholds("recency_days", "__r")))
      .crossJoin(broadcast(thresholds("frequency", "__f")))
      .crossJoin(broadcast(thresholds("__mbin", "__m")))
      .select(col(userCol),
        col("recency_days"), col("frequency"), col("monetary_cents"),
        score("recency_days", "__r").as("r"),
        score("frequency", "__f").as("f"),
        score("__mbin", "__m").as("m"))
  }

  /** Cohort lifetime-value triangle: users cohorted by first-event day,
    * revenue rolled up per (cohort, day offset) and accumulated across
    * the offset axis — the "how much has the Jan-3 cohort spent by day
    * 14" table every growth dashboard carries next to the retention
    * triangle ([[retentionCohorts]]).
    *
    * Scale shape: one keyed aggregate for first-touch, one keyed join
    * back to events (both sides keyed by user — co-partitioned), one
    * (cohort, offset) aggregate, then a per-cohort running sum whose
    * partitions are calendar-bounded (≤ observed days per cohort).
    * Revenue is exact integer cents end-to-end. */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
                valueCol: String): DataFrame = {
    val firstDay = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_d"))
    events
      .select(col(userCol), to_date(col(tsCol)).as("__d"),
        centsOf(valueCol).as("__cents"))
      .join(firstDay, Seq(userCol))
      .groupBy(col("cohort_d"),
        datediff(col("__d"), col("cohort_d")).cast("long").as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"),
        sum(col("__cents")).as("revenue_cents"))
      .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("cohort_d")).orderBy(col("day_offset"))))
  }

  /**
   * Top-k session paths: each user session's first `pathLen` event
   * types joined `a>b>c`, counted across all sessions — the "what do
   * users actually do first" path-analysis staple.
   *
   * Shape: ONE `session_window` aggregate builds per-session event
   * lists (state bounded by the session, exactly like [[sessions]]);
   * the list is totally ordered by `sort_array` over
   * `(ts, event_id, type)` structs (event_id breaks ts ties, so
   * collect_list's arrival order can't leak in); the path is a pure
   * projection; the final count is a low-cardinality aggregate whose
   * top-k rides TakeOrderedAndProject. No window over raw events, no
   * self-join.
   */
  /**
   * Stationary distribution of the user-journey Markov chain: `iters`
   * power-iteration steps of `p·T` from the uniform start, where T is
   * [[transitionMatrix]]'s row-stochastic matrix — "where do journeys
   * spend their time" as a single vector, the PageRank-role summary of
   * the transition matrix.
   *
   * Determinism: the matrix entries are exact-count ratios (single
   * correctly-rounded divisions); each step's Σ over sources is an
   * ORDERED fold over the source-sorted term array (the prof_drift
   * reduction), so the double sums are partition- and
   * engine-invariant. State space = distinct event types (bounded),
   * so every iteration is one small join + one bounded aggregate.
   * States with no outgoing edges would leak mass (absorbing) — with
   * journey event types every state transitions onward; the oracle
   * replays the identical joins so any asymmetry shows as a hash
   * mismatch, not silence.
   */
  def stationaryDistribution(events: DataFrame, userCol: String,
                             typeCol: String, tsCol: String, idCol: String,
                             iters: Int = 3): DataFrame = {
    val m = transitionMatrix(events, userCol, typeCol, tsCol, idCol)
      .select(col("from_type"), col("to_type"), col("p"))
    val states = m.select(col("from_type").as("st"))
      .unionByName(m.select(col("to_type").as("st"))).distinct()
    val nStates = broadcast(states.agg(count(lit(1)).as("__ns")))
    var pk = states.crossJoin(nStates)
      .select(col("st"), (lit(1.0) / col("__ns").cast("double")).as("prob"))
    (1 to iters).foreach { _ =>
      pk = pk.join(m, col("st") === col("from_type"))
        .groupBy(col("to_type"))
        .agg(aggregate(
          transform(
            sort_array(collect_list(struct(col("from_type").as("f"),
              (col("prob") * col("p")).as("t")))),
            s => s("t")),
          lit(0.0), (acc, v) => acc + v).as("prob"))
        .select(col("to_type").as("st"), col("prob"))
    }
    pk.select(col("st").as("state"), col("prob"))
  }

  def topPaths(events: DataFrame, gap: String, pathLen: Int, k: Int): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("__evs"))
      .select(array_join(
        transform(slice(col("__evs"), 1, pathLen), e => e("event_type")), ">")
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
}
