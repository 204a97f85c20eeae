package graft.queries

import graft.{Det, Tables}
import graft.engine.SnapshotStore
import graft.ops.{Classifier, Dedup, EventOps, TextOps, TimeSeries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/**
 * Round-12 analytics additions: series diagnostics (ACF), exact-
 * arithmetic ML primitives (Gini stump, leave-one-out target
 * encoding), behavioral path mining, Spark-4 VARIANT semi-structured
 * access, and corpus diversity — each a first-class operator with a
 * DuckDB oracle, same determinism discipline as the rest of the
 * inventory (integer/decimal-exact statistics, one correctly-rounded
 * double conversion at the edge, total-order sorts).
 */
object AnalyticsQueries {

  val queries: Seq[Q] = Seq(

    // ACF of the daily demand series ([[TimeSeries.autocorr]]): lags
    // 1-3 of daily total quantity. The heavy reduction is the one
    // keyed date aggregate; the window + per-lag Pearson run on the
    // bounded daily series. Exact integer sufficient statistics
    // (pearsonByKey's DECIMAL(38,0) accumulators), double epilogue
    // mirrored operation-for-operation in the oracle.
    Q("ts_acf",
      (s, dir) => {
        val daily = Tables.lineitem(s, dir)
          .groupBy(to_date(col("l_shipdate")).as("d"))
          .agg(sum(col("l_quantity")).as("qty")) // integer-valued: exact
        TimeSeries.autocorr(daily, "d", "qty", maxLag = 3)
          .orderBy("lag")
      },
      Some {
        val nd = "CAST(n_pairs AS DOUBLE)"
        def d(c: String) = s"CAST($c AS DOUBLE)"
        val num = s"($nd * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
        val varx = s"($nd * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
        val vary = s"($nd * ${d("syy")} - ${d("sy")} * ${d("sy")})"
        val den = s"(sqrt(GREATEST($varx, 0.0)) * sqrt(GREATEST($vary, 0.0)))"
        val lagSel = (1 to 3).map(k =>
          s"SELECT $k AS lag, qty AS x, lag(qty, $k) OVER (ORDER BY d) AS y FROM daily")
          .mkString("\n  UNION ALL ")
        s"""WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS d, SUM(l_quantity) AS qty
           |               FROM lineitem GROUP BY 1),
           |l AS (\n  $lagSel),
           |c AS (SELECT lag,
           |        CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT) AS cx,
           |        CAST(CAST(y AS DECIMAL(18,2)) * 100 AS BIGINT) AS cy
           |      FROM l WHERE x IS NOT NULL AND y IS NOT NULL),
           |a AS (SELECT lag, ${TimeSeries.pearsonSql("cx", "cy")}
           |      FROM c GROUP BY lag)
           |SELECT lag, n_pairs,
           |       CASE WHEN n_pairs = 0 OR $den = 0.0 THEN NULL
           |            ELSE $num / $den END AS corr
           |FROM a ORDER BY lag""".stripMargin
      }),

    // Exact-integer decision stump ([[Classifier.giniStump]]): best
    // Gini split of l_quantity against "was returned" — CART's split
    // search as one aggregate + one bounded window, micro-point
    // integer scores (no floating point anywhere in the decision).
    Q("ml_gini_stump",
      (s, dir) => Classifier.giniStump(
        Tables.lineitem(s, dir),
        col("l_quantity"), (col("l_returnflag") === "R").cast("long"))
        .orderBy("thr"),
      Some(s"""WITH per AS (SELECT CAST(l_quantity AS BIGINT) AS thr,
              |         CAST(count(*) AS BIGINT) AS n,
              |         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos
              |       FROM lineitem GROUP BY 1),
              |c AS (SELECT thr,
              |        CAST(SUM(n) OVER (ORDER BY thr ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
              |        CAST(SUM(pos) OVER (ORDER BY thr ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl,
              |        CAST(SUM(n) OVER () AS BIGINT) AS nn,
              |        CAST(SUM(pos) OVER () AS BIGINT) AS pp
              |      FROM per),
              |s AS (SELECT thr, nl, pl, nn - nl AS nr, pp - pl AS pr
              |      FROM c WHERE nn - nl > 0),
              |sc AS (SELECT thr, nl, pl, nr, pr,
              |         CAST(${Classifier.giniScoreSql} AS BIGINT) AS score
              |       FROM s)
              |SELECT thr, nl, pl, nr, pr, score,
              |       CAST(score = MAX(score) OVER () AS INT) AS is_best
              |FROM sc ORDER BY thr""".stripMargin)),

    // Leave-one-out target encoding ([[Classifier.targetEncode]]):
    // o_totalprice mean of the OTHER orders in each priority class as
    // a per-row feature — exact cent sums, one keyed window, no
    // self-join, no label leakage.
    Q("feat_target_enc",
      (s, dir) => Classifier.targetEncode(
        Tables.orders(s, dir), "o_orderpriority", "o_totalprice")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"), col("enc"))
        .orderBy("o_orderkey"),
      Some("""WITH c AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
             |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS own
             |       FROM orders),
             |w AS (SELECT *,
             |        CAST(SUM(own) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS s,
             |        COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
             |      FROM c)
             |SELECT o_orderkey, o_orderpriority, o_totalprice,
             |       CASE WHEN n = 1 THEN NULL
             |            ELSE CAST(s - own AS DOUBLE) / CAST(n - 1 AS DOUBLE) / 100.0
             |       END AS enc
             |FROM w ORDER BY o_orderkey""".stripMargin)),

    // Top-15 session paths ([[EventOps.topPaths]]): the first three
    // event types of every 30-minute session, counted corpus-wide.
    // The oracle replays session_window's STRICT-gap merge rule
    // (quiet time must EXCEED the gap to split — the ev_sessions
    // boundary lesson) with lag/cumsum, and orders each path by
    // (ts, event_id) exactly like the struct sort.
    Q("ev_paths",
      (s, dir) => EventOps.topPaths(
        Tables.events(s, dir), "30 minutes", pathLen = 3, k = 15),
      Some("""WITH m AS (SELECT user_id, ts, event_id, event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                                 ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM m),
             |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
             |                                   ORDER BY ts, event_id) AS rn
             |      FROM g),
             |p AS (SELECT user_id, sid,
             |        string_agg(event_type, '>' ORDER BY ts, event_id) AS path
             |      FROM r WHERE rn <= 3 GROUP BY user_id, sid)
             |SELECT path, count(*) AS n_sessions FROM p
             |GROUP BY path ORDER BY n_sessions DESC, path LIMIT 15""".stripMargin)),

    // Spark-4 VARIANT surface: parse_json → binary variant,
    // variant_get typed path extraction, try_variant_get on a missing
    // path — the semi-structured column type Snowflake/Databricks
    // users expect, here exercised end-to-end and aggregated so the
    // JSON-function oracle can verify the SEMANTICS (the variant
    // binary itself is engine-internal).
    Q("p_variant_shred",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(
          (variant_get(col("v"), "$.k", "int") % 10).as("bucket"),
          variant_get(col("v"), "$.k", "int").as("k"),
          try_variant_get(col("v"), "$.missing", "int").as("miss"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("sum_k"),
          count(when(col("miss").isNull, lit(1))).as("n_missing"))
        .orderBy("bucket"),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS bucket,
             |       count(*) AS n,
             |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
             |       CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Simpson diversity of the token distribution per language — the
    // log-free concentration measure (Σ c·(c−1) / n·(n−1): the
    // probability two random tokens collide). An entropy-style corpus
    // health metric whose statistic is pure BIGINT, so it hashes
    // exactly; one explode + two aggregates, no ln().
    Q("t_simpson",
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("lang"))
        .agg(sum(col("c") * (col("c") - 1)).as("coll_pairs"),
          sum(col("c")).as("n_tokens"))
        .select(col("lang"), col("n_tokens"), col("coll_pairs"),
          when(col("n_tokens") > 1,
            col("coll_pairs").cast("double")
              / (col("n_tokens") * (col("n_tokens") - 1)).cast("double"))
            .otherwise(lit(null).cast("double")).as("simpson"))
        .orderBy("lang"),
      Some(s"""WITH tok AS (SELECT lang, unnest(${TextOps.tokensSql("text")}) AS token
              |             FROM documents),
              |pc AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c
              |       FROM tok GROUP BY 1, 2),
              |a AS (SELECT lang, CAST(SUM(c * (c - 1)) AS BIGINT) AS coll_pairs,
              |        CAST(SUM(c) AS BIGINT) AS n_tokens
              |      FROM pc GROUP BY 1)
              |SELECT lang, n_tokens, coll_pairs,
              |       CASE WHEN n_tokens > 1
              |            THEN CAST(coll_pairs AS DOUBLE)
              |                 / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
              |            ELSE NULL END AS simpson
              |FROM a ORDER BY lang""".stripMargin)),

    // Classical additive decomposition ([[TimeSeries.decomposeWeekly]]):
    // daily demand = centered-7 trend + weekday season + residual.
    // Detrended numerators stay BIGINT (7·v − Σ₇), so the season means
    // are single exact-integer divisions — no mean-of-doubles order
    // dependence; weekday is epoch-days mod 7 (engine-neutral).
    Q("ts_decompose",
      (s, dir) => {
        val daily = Tables.lineitem(s, dir)
          .groupBy(to_date(col("l_shipdate")).as("d"))
          .agg(sum(col("l_quantity")).as("qty")) // integer-valued: exact
        TimeSeries.decomposeWeekly(daily, "d", "qty").orderBy("d")
      },
      Some("""WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS d,
             |         CAST(SUM(l_quantity) AS BIGINT) AS value
             |       FROM lineitem GROUP BY 1),
             |b AS (SELECT d, value,
             |        CAST((d - DATE '1970-01-01') % 7 AS INT) AS weekday,
             |        CAST(SUM(value) OVER w7 AS BIGINT) AS sum7,
             |        COUNT(*) OVER w7 AS cnt7
             |      FROM daily
             |      WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |bb AS (SELECT *, CASE WHEN cnt7 = 7 THEN 7 * value - sum7 END AS det_num
             |       FROM b),
             |se AS (SELECT weekday, CAST(SUM(det_num) AS BIGINT) AS s_num,
             |         COUNT(*) AS s_cnt
             |       FROM bb WHERE cnt7 = 7 GROUP BY 1),
             |s2 AS (SELECT weekday,
             |         CAST(s_num AS DOUBLE) / CAST(7 * s_cnt AS DOUBLE) AS season
             |       FROM se)
             |SELECT d, value, weekday,
             |       CASE WHEN cnt7 = 7 THEN CAST(sum7 AS DOUBLE) / 7.0 END AS trend,
             |       season,
             |       CASE WHEN cnt7 = 7
             |            THEN CAST(det_num AS DOUBLE) / 7.0 - season END AS residual
             |FROM bb LEFT JOIN s2 USING (weekday) ORDER BY d""".stripMargin)),

    // Cross-source shingle-overlap matrix ([[Dedup.sourceOverlap]]):
    // the corpus-provenance audit — shared distinct 5-gram shingles and
    // containment per source pair. Posting-list distinct first, so the
    // hash self-join fans out at most |sources|² per shingle.
    Q("dd_source_overlap",
      (s, dir) => Dedup.sourceOverlap(
        Tables.documents(s, dir), "source", "text", n = 5)
        .orderBy("src_a", "src_b"),
      Some(s"""WITH grams AS (
              |  SELECT DISTINCT src,
              |         CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS h
              |  FROM (SELECT source AS src,
              |          unnest(list_transform(range(1, greatest(len(${TextOps.tokensSql("text")}) - 4, 0) + 1),
              |            i -> array_to_string(list_slice(${TextOps.tokensSql("text")}, i, i + 4), ' '))) AS g
              |        FROM documents)),
              |counts AS (SELECT src, CAST(count(*) AS BIGINT) AS n_sh FROM grams GROUP BY 1),
              |pairs AS (SELECT a.src AS src_a, b.src AS src_b,
              |            CAST(count(*) AS BIGINT) AS shared
              |          FROM grams a JOIN grams b ON a.h = b.h AND a.src < b.src
              |          GROUP BY 1, 2)
              |SELECT src_a, src_b, shared, ca.n_sh AS n_a, cb.n_sh AS n_b,
              |       CAST(shared AS DOUBLE) / CAST(least(ca.n_sh, cb.n_sh) AS DOUBLE)
              |         AS containment
              |FROM pairs
              |JOIN counts ca ON ca.src = src_a
              |JOIN counts cb ON cb.src = src_b
              |ORDER BY src_a, src_b""".stripMargin)),

    // Correlated LATERAL subquery with LIMIT (SQL surface): top-2
    // orders per customer. Catalyst decorrelates this into
    // WindowGroupLimit — a PARTIAL per-partition top-k BEFORE the
    // shuffle, then the rank filter — with the customer dim broadcast:
    // the plan a hand-written window query can't beat, from the SQL a
    // warehouse user actually writes.
    Q("j_lateral_topn",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("lat_customer")
        Tables.orders(s, dir).createOrReplaceTempView("lat_orders")
        s.sql("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
                |FROM lat_customer c,
                |LATERAL (SELECT o_orderkey, o_totalprice FROM lat_orders
                |         WHERE o_custkey = c.c_custkey
                |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
                |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)
      },
      Some("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
             |FROM customer c,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             |         WHERE o_custkey = c.c_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
             |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)),

    // min_by / max_by (argmin/argmax aggregate surface): which order
    // is the cheapest / priciest per priority class. Ties exist in
    // o_totalprice, so the selector is a composite BIGINT
    // (cents·10⁷ + orderkey) — total order, engine-portable (DuckDB
    // arg_min/arg_max take scalar keys only).
    Q("agg_minmax_by",
      (s, dir) => {
        val key = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType) * lit(10000000L) + col("o_orderkey")
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(
            min_by(col("o_orderkey"), key).as("cheapest_order"),
            max_by(col("o_orderkey"), key).as("priciest_order"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  arg_min(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |            * 10000000 + o_orderkey) AS cheapest_order,
             |  arg_max(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |            * 10000000 + o_orderkey) AS priciest_order,
             |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ROW LINEAGE ([[SnapshotStore.appendLineage]]/readLineage/
    // compactLineage — the Iceberg v3 row-id mechanism): three batches
    // append (ids assigned at commit from per-file firstRowId + parquet
    // row position, zero write cost, no global sort), a compaction in
    // the middle MATERIALIZES ids physically (a rewrite reorders rows),
    // and the ids must come out stable, dense, and unique — the
    // in-query require pins dense+unique, the oracle replays the exact
    // assignment (batches are single sorted files, so ids are
    // row_number over (batch, key)).
    Q("m_row_lineage",
      (s, dir) => {
        val st = new SnapshotStore(s,
          s"/tmp/graft_ss_rowlin_${new java.io.File(dir).getName}",
          statsFor = Seq("o_orderkey"))
        st.dropTable("silver", "ord")
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
        def batch(r: Int) = o.filter(col("o_orderkey") % 3 === r)
          .repartition(1).sortWithinPartitions("o_orderkey")
        st.appendLineage(batch(0), "silver", "ord")
        st.appendLineage(batch(1), "silver", "ord")
        st.compactLineage("silver", "ord")
        st.appendLineage(batch(2), "silver", "ord")
        val out = st.readLineage("silver", "ord")
        val chk = out.agg(count(lit(1)).as("n"),
          countDistinct(col("_row_id")).as("d"), max(col("_row_id")).as("mx")).head
        require(chk.getLong(0) == chk.getLong(1) && chk.getLong(2) == chk.getLong(0) - 1,
          s"row ids not dense/unique: n=${chk.getLong(0)} distinct=${chk.getLong(1)} max=${chk.getLong(2)}")
        out.select(col("o_orderkey"), col("o_totalprice"), col("_row_id"))
          .orderBy("_row_id")
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |       CAST(row_number() OVER (ORDER BY o_orderkey % 3, o_orderkey) - 1
             |            AS BIGINT) AS _row_id
             |FROM orders ORDER BY _row_id""".stripMargin)),

    // Benford first-digit audit: the classic fraud/fabrication screen
    // over monetary amounts. The first digit comes from the CENTS
    // BIGINT's string form (double formatting is engine-specific;
    // integer formatting is not); expected shares are literal
    // log10(1+1/d) doubles (identical parses both engines); the χ²
    // term stays per-digit, so no cross-row double-sum order exists.
    Q("prof_benford",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val benford = Map(
          1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
          3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
          5 -> 0.079181246047624818, 6 -> 0.066946789630613221,
          7 -> 0.057991946977686733, 8 -> 0.051152522447381291,
          9 -> 0.045757490560675143)
        val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType)
        val expected = benford.foldLeft(lit(null).cast("double")) {
          case (acc, (d, p)) => when(col("digit") === d.toString, lit(p)).otherwise(acc)
        }
        val all = Window.partitionBy()
        Tables.orders(s, dir)
          .select(substring(cents.cast("string"), 1, 1).as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
          .withColumn("__tot", sum(col("n")).over(all))
          .withColumn("share", col("n").cast("double") / col("__tot").cast("double"))
          .withColumn("expected_share", expected)
          .withColumn("chisq_term",
            (col("n").cast("double") - col("__tot").cast("double") * col("expected_share"))
              * (col("n").cast("double") - col("__tot").cast("double") * col("expected_share"))
              / (col("__tot").cast("double") * col("expected_share")))
          .drop("__tot")
          .orderBy("digit")
      },
      Some {
        val benfordCase = Seq(
          1 -> "0.3010299956639812", 2 -> "0.17609125905568124",
          3 -> "0.12493873660829992", 4 -> "0.09691001300805642",
          5 -> "0.079181246047624818", 6 -> "0.066946789630613221",
          7 -> "0.057991946977686733", 8 -> "0.051152522447381291",
          9 -> "0.045757490560675143")
          .map { case (d, p) => s"WHEN digit = '$d' THEN $p" }.mkString(" ")
        s"""WITH d AS (SELECT substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |             AS BIGINT) AS VARCHAR), 1, 1) AS digit
           |           FROM orders),
           |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
           |t AS (SELECT *, CAST(SUM(n) OVER () AS BIGINT) AS tot,
           |        CASE $benfordCase END AS expected_share
           |      FROM c)
           |SELECT digit, n, CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
           |       expected_share,
           |       (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * expected_share)
           |         * (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * expected_share)
           |         / (CAST(tot AS DOUBLE) * expected_share) AS chisq_term
           |FROM t ORDER BY digit""".stripMargin
      }),

    // Flesch-style readability over the corpus — ln-free linear
    // formula on three exact integer counts per document (words,
    // terminal-punct sentence runs, vowel-run syllable proxy); each
    // document's score is a fixed chain of correctly-rounded IEEE ops,
    // mirrored operation-for-operation.
    Q("t_readability",
      (s, dir) => {
        val words = size(TextOps.tokens(col("text"))).cast(LongType)
        val sentences = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
          .cast(LongType)
        val syllables = regexp_count(col("text"), lit("[aeiouyAEIOUY]+"))
          .cast(LongType)
        Tables.documents(s, dir)
          .select(col("doc_id"), words.as("n_words"),
            sentences.as("n_sentences"), syllables.as("n_syllables"))
          .withColumn("flesch",
            when(col("n_words") > 0,
              lit(206.835)
                - lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double"))
                - lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double"))))
          .orderBy("doc_id")
      },
      Some(s"""WITH c AS (SELECT doc_id,
              |    CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_words,
              |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
              |      AS n_sentences,
              |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT)
              |      AS n_syllables
              |  FROM documents)
              |SELECT doc_id, n_words, n_sentences, n_syllables,
              |       CASE WHEN n_words > 0 THEN
              |         206.835
              |           - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
              |           - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
              |       END AS flesch
              |FROM c ORDER BY doc_id""".stripMargin)),

    // Stationary distribution of the journey Markov chain
    // ([[EventOps.stationaryDistribution]]): 3 power-iteration steps
    // from uniform — exact-ratio matrix entries, ordered-fold double
    // sums (the prof_drift reduction), every iteration one bounded
    // join + aggregate. The oracle unrolls the identical iterations.
    Q("ev_stationary",
      (s, dir) => EventOps.stationaryDistribution(
        Tables.events(s, dir), "user_id", "event_type", "ts", "event_id",
        iters = 3)
        .orderBy("state"),
      Some {
        def step(prev: String, out: String) =
          s"""$out AS (SELECT to_type AS st,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(prob * p ORDER BY from_type)), (acc, v) -> acc + v) AS prob
             |  FROM $prev JOIN m ON st = from_type GROUP BY to_type)""".stripMargin
        s"""WITH seq AS (SELECT user_id, event_type,
           |         lag(event_type) OVER (PARTITION BY user_id
           |                               ORDER BY ts, event_id) AS from_type
           |       FROM events),
           |cnt AS (SELECT from_type, event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
           |        FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
           |tot AS (SELECT from_type AS ft, CAST(SUM(n) AS BIGINT) AS row_total
           |        FROM cnt GROUP BY 1),
           |m AS (SELECT from_type, to_type,
           |        CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE) AS p
           |      FROM cnt JOIN tot ON from_type = ft),
           |states AS (SELECT DISTINCT st FROM
           |  (SELECT from_type AS st FROM m UNION ALL SELECT to_type FROM m)),
           |p0 AS (SELECT st, 1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM states) AS prob
           |       FROM states),
           |${step("p0", "p1")},
           |${step("p1", "p2")},
           |${step("p2", "p3")}
           |SELECT st AS state, prob FROM p3 ORDER BY state""".stripMargin
      }),

    // OLS simple regression per key ([[TimeSeries.linregByKey]]):
    // price ~ quantity per supplier, from the same exact integer
    // sufficient statistics as ts_corr — one keyed aggregate, a fixed
    // chain of correctly-rounded IEEE ops out.
    Q("ts_linreg",
      (s, dir) => TimeSeries.linregByKey(
        Tables.lineitem(s, dir).filter(col("l_suppkey") < 200),
        Seq("l_suppkey"), "l_quantity", "l_extendedprice")
        .orderBy("l_suppkey"),
      Some {
        val nd = "CAST(n_pairs AS DOUBLE)"
        def d(c: String) = s"CAST($c AS DOUBLE)"
        val num = s"($nd * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
        val varx = s"($nd * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
        s"""WITH c AS (SELECT l_suppkey,
           |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS cx,
           |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cy
           |  FROM lineitem
           |  WHERE l_suppkey < 200 AND l_quantity IS NOT NULL
           |    AND l_extendedprice IS NOT NULL),
           |a AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |        CAST(SUM(cx) AS BIGINT) AS sx, CAST(SUM(cy) AS BIGINT) AS sy,
           |        CAST(SUM(cx * cy) AS BIGINT) AS sxy,
           |        CAST(SUM(cx * cx) AS BIGINT) AS sxx
           |      FROM c GROUP BY l_suppkey),
           |sl AS (SELECT l_suppkey, n_pairs, sx, sy,
           |         CASE WHEN n_pairs = 0 OR $varx = 0.0 THEN NULL
           |              ELSE $num / $varx END AS slope
           |       FROM a)
           |SELECT l_suppkey, n_pairs, slope,
           |       (${d("sy")} - slope * ${d("sx")}) / $nd / 100.0 AS intercept
           |FROM sl ORDER BY l_suppkey""".stripMargin
      }),

    // Window NAVIGATION surface: first/last/nth over an explicit
    // full-partition frame (the default RANGE-to-current frame makes
    // last_value a footgun — pinned explicitly in BOTH engines) and
    // lag(... IGNORE NULLS) for "previous urgent order" — the
    // fill-forward idiom.
    Q("w_nav_funcs",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val order = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            first(col("o_orderkey")).over(full).as("first_order"),
            last(col("o_orderkey")).over(full).as("last_order"),
            nth_value(col("o_orderkey"), 2).over(full).as("second_order"),
            lag(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")),
              1, null, true).over(order).as("prev_urgent_price"))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  first_value(o_orderkey) OVER wf AS first_order,
             |  last_value(o_orderkey) OVER wf AS last_order,
             |  nth_value(o_orderkey, 2) OVER wf AS second_order,
             |  lag(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END
             |      IGNORE NULLS) OVER wo AS prev_urgent_price
             |FROM orders
             |WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // Exact distinct via BITMAPS (Spark 3.5 bitmap aggregate family):
    // per-bucket bitmaps are MERGEABLE partials — the pre-aggregable
    // exact-distinct infrastructure (ClickHouse/Iceberg pattern) that
    // an incremental pipeline can maintain additively, unlike a raw
    // COUNT(DISTINCT). Buckets partition the key space, so the
    // per-group total is the sum of per-bucket cardinalities.
    Q("agg_bitmap_distinct",
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"),
          bitmap_bucket_number(col("o_custkey")).as("__bucket"))
        .agg(bitmap_construct_agg(bitmap_bit_position(col("o_custkey")))
          .as("__bm"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(bitmap_count(col("__bm"))).as("n_distinct"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |       count(DISTINCT o_custkey) AS n_distinct
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Wilson 95% confidence interval per event type — the A/B-test
    // bound that stays honest at small n (unlike the normal
    // approximation). All inputs exact BIGINTs; z = 1.96 literal; the
    // interval is a fixed chain of correctly-rounded IEEE ops (sqrt
    // included) mirrored exactly.
    Q("ev_conversion_ci",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val totals = ev.agg(countDistinct(col("user_id")).as("n_users"))
        val perType = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("k_users"))
        val n = col("n_users").cast("double")
        val p = col("k_users").cast("double") / n
        val z = lit(1.96)
        val denom = lit(1.0) + z * z / n
        val center = p + z * z / (lit(2.0) * n)
        val margin = z * sqrt(p * (lit(1.0) - p) / n
          + z * z / (lit(4.0) * n * n))
        perType.crossJoin(broadcast(totals))
          .select(col("event_type"), col("k_users"), col("n_users"),
            p.as("p"),
            ((center - margin) / denom).as("ci_lo"),
            ((center + margin) / denom).as("ci_hi"))
          .orderBy("event_type")
      },
      Some("""WITH t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |           FROM events),
             |k AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS k_users
             |      FROM events GROUP BY 1)
             |SELECT event_type, k_users, n_users,
             |  CAST(k_users AS DOUBLE) / CAST(n_users AS DOUBLE) AS p,
             |  ((CAST(k_users AS DOUBLE) / CAST(n_users AS DOUBLE)
             |     + 1.96 * 1.96 / (2.0 * CAST(n_users AS DOUBLE)))
             |   - 1.96 * sqrt(CAST(k_users AS DOUBLE) / CAST(n_users AS DOUBLE)
             |       * (1.0 - CAST(k_users AS DOUBLE) / CAST(n_users AS DOUBLE))
             |       / CAST(n_users AS DOUBLE)
             |     + 1.96 * 1.96 / (4.0 * CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE))))
             |  / (1.0 + 1.96 * 1.96 / CAST(n_users AS DOUBLE)) AS ci_lo,
             |  ((CAST(k_users AS DOUBLE) / CAST(n_users AS DOUBLE)
             |     + 1.96 * 1.96 / (2.0 * CAST(n_users AS DOUBLE)))
             |   + 1.96 * sqrt(CAST(k_users AS DOUBLE) / CAST(n_users AS DOUBLE)
             |       * (1.0 - CAST(k_users AS DOUBLE) / CAST(n_users AS DOUBLE))
             |       / CAST(n_users AS DOUBLE)
             |     + 1.96 * 1.96 / (4.0 * CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE))))
             |  / (1.0 + 1.96 * 1.96 / CAST(n_users AS DOUBLE)) AS ci_hi
             |FROM k CROSS JOIN t ORDER BY event_type""".stripMargin)),

    // HITS hubs/authorities on the bipartite customer↔supplier trade
    // graph — EXACT-INTEGER power iteration: two unnormalized rounds
    // from h₀=1 keep every score a sum of products of exact counts
    // (DECIMAL(38,0) against sf1-scale overflow), so the ranking is
    // bit-deterministic with no float normalization to mirror. Each
    // round is one keyed join + one keyed aggregate, the gr_pagerank
    // cost shape.
    Q("gr_hits",
      (s, dir) => {
        val dec = DecimalType(38, 0)
        val e = Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("p"))
          .agg(count(lit(1)).as("w"))
        val a1 = e.groupBy(col("p")).agg(sum(col("w")).as("a1"))
        val h1 = e.join(a1, "p").groupBy(col("c"))
          .agg(sum(col("w").cast(dec) * col("a1").cast(dec)).as("h1"))
        val a2 = e.join(h1, "c").groupBy(col("p"))
          .agg(sum(col("w").cast(dec) * col("h1")).as("a2"))
        a2.join(a1, "p")
          .join(broadcast(Tables.supplier(s, dir)), col("p") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("a1"),
            col("a2").cast("double").as("auth_score"))
          .orderBy(col("auth_score").desc, col("s_suppkey"))
          .limit(10)
      },
      Some("""WITH e AS (SELECT o_custkey AS c, l_suppkey AS p,
             |         CAST(count(*) AS BIGINT) AS w
             |       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |       GROUP BY 1, 2),
             |a1 AS (SELECT p, CAST(SUM(w) AS BIGINT) AS a1 FROM e GROUP BY 1),
             |h1 AS (SELECT c, SUM(CAST(w AS HUGEINT) * CAST(a1 AS HUGEINT)) AS h1
             |       FROM e JOIN a1 USING (p) GROUP BY 1),
             |a2 AS (SELECT p, SUM(CAST(w AS HUGEINT) * h1) AS a2
             |       FROM e JOIN h1 USING (c) GROUP BY 1)
             |SELECT s_suppkey, s_name, a1, CAST(a2 AS DOUBLE) AS auth_score
             |FROM a2 JOIN a1 USING (p) JOIN supplier ON p = s_suppkey
             |ORDER BY auth_score DESC, s_suppkey LIMIT 10""".stripMargin)),

    // Streaming EXACT DISTINCT, oracle-hashed end state
    // ([[graft.streaming.StreamOps.bitmapPartialsSink]]): orders
    // replay as micro-batches; each batch appends mergeable bitmap
    // partials exactly-once; the epilogue (OR-merge per bucket, count,
    // sum) must equal COUNT(DISTINCT) over the whole stream — the
    // agg_bitmap_distinct contract held continuously, with no raw-id
    // state.
    Q("stream_bitmap_final",
      (s, dir) => {
        val base = new org.apache.hadoop.fs.Path(
          s"/tmp/graft_stream_bm_${new java.io.File(dir).getName}")
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(base, true)
        val staged = s"$base/in"
        Tables.orders(s, dir).select(col("o_orderpriority"), col("o_custkey"))
          .repartition(4).write.parquet(staged)
        val stream = graft.streaming.StreamOps.eventStream(s, staged,
          s.read.parquet(staged).schema, maxFilesPerTrigger = Some(1))
        val st = new SnapshotStore(s, s"$base/store")
        graft.streaming.StreamOps.bitmapPartialsSink(stream, st,
          "metrics", "cust_bitmaps", Seq("o_orderpriority"), "o_custkey",
          checkpoint = s"$base/ckpt").awaitTermination()
        st.read("metrics", "cust_bitmaps")
          .groupBy(col("o_orderpriority"), col("bucket"))
          .agg(bitmap_or_agg(col("bm")).as("bm"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(bitmap_count(col("bm"))).as("n_distinct"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |       count(DISTINCT o_custkey) AS n_distinct
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CCNet-style quality bucketing: corpus terciles by bigram-LM
    // fluency score (head / middle / tail — the split CCNet trains and
    // filters by). Scores are the exact micro-point LM sums; the
    // tercile cut is ntile(3) over a TOTAL order (score desc, doc_id),
    // identical split rule both engines; the per-bucket rollup stays
    // BIGINT + min/max doubles (exact).
    Q("t_quality_buckets",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val scored = TextOps.bigramLmScore(Tables.documents(s, dir), "doc_id", "text")
        val w = Window.orderBy(col("avg_pts").desc, col("doc_id"))
        scored.withColumn("__t", ntile(3).over(w))
          .withColumn("bucket",
            when(col("__t") === 1, "head")
              .when(col("__t") === 2, "middle").otherwise("tail"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("pts_total")).as("pts_total"),
            min(col("avg_pts")).as("min_avg_pts"),
            max(col("avg_pts")).as("max_avg_pts"))
          .orderBy("bucket")
      },
      Some(s"""WITH base AS (
              |${TextOps.bigramLmScoreSql("documents")}
              |),
              |scored AS (SELECT doc_id, pts_total, avg_pts,
              |             ntile(3) OVER (ORDER BY avg_pts DESC, doc_id) AS t
              |           FROM base)
              |SELECT CASE WHEN t = 1 THEN 'head' WHEN t = 2 THEN 'middle'
              |            ELSE 'tail' END AS bucket,
              |       count(*) AS n_docs,
              |       CAST(SUM(pts_total) AS BIGINT) AS pts_total,
              |       min(avg_pts) AS min_avg_pts, max(avg_pts) AS max_avg_pts
              |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin)),

    // String-function surface parity: pad/translate/split_part/
    // levenshtein/repeat/reverse as one codegen'd projection — the
    // everyday string toolkit, pinned engine-identical.
    Q("p_string_extras",
      (s, dir) => Tables.part(s, dir)
        .filter(col("p_partkey") % 10 === 0)
        .select(col("p_partkey"),
          lpad(col("p_brand"), 12, ".").as("padded"),
          rpad(col("p_type"), 10, "*").as("rpadded"),
          translate(col("p_name"), "aeiou", "#####").as("devoweled"),
          split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
          levenshtein(col("p_brand"), col("p_type")).as("edit_dist"),
          repeat(col("p_brand"), 2).as("doubled"),
          reverse(col("p_name")).as("reversed"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  lpad(p_brand, 12, '.') AS padded,
             |  rpad(p_type, 10, '*') AS rpadded,
             |  translate(p_name, 'aeiou', '#####') AS devoweled,
             |  split_part(p_name, ' ', 2) AS second_word,
             |  CAST(levenshtein(p_brand, p_type) AS INT) AS edit_dist,
             |  repeat(p_brand, 2) AS doubled,
             |  reverse(p_name) AS reversed
             |FROM part WHERE p_partkey % 10 = 0 ORDER BY p_partkey""".stripMargin)),

    // FULL PNG pixel decode ([[graft.ops.Multimodal.decodePngPixels]]):
    // genuine 8-bit grayscale PNGs (real zlib-deflated scanlines,
    // CRC-correct chunks) decoded end-to-end — chunk walk with
    // per-chunk CRC verification, inflate, per-scanline defilter,
    // pixel statistics. Pixels are (id + 7x + 13y) mod 256, so the
    // oracle computes every statistic analytically — a wrong inflate,
    // a filter-byte slip, or a mis-walked chunk hash-mismatches.
    Q("mm_png_decode",
      (s, dir) => {
        import graft.ops.Multimodal
        Multimodal.pngPixelStats(s,
          Multimodal.synthPngPixelCorpus(s, Tables.documents(s, dir), "doc_id"),
          "doc_id", "payload")
          .orderBy("doc_id")
      },
      Some("""WITH dims AS (SELECT doc_id, 8 + doc_id % 9 AS w,
             |         8 + (doc_id * 3) % 9 AS h
             |       FROM documents),
             |px AS (SELECT doc_id, w, h,
             |         (doc_id + 7 * x.i + 13 * y.i) % 256 AS v
             |       FROM dims, unnest(range(0, w)) AS x(i),
             |            unnest(range(0, h)) AS y(i))
             |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             |       CAST(w * h AS BIGINT) AS n_pixels,
             |       CAST(SUM(v) AS BIGINT) AS pix_sum,
             |       CAST(min(v) AS INT) AS pix_min, CAST(max(v) AS INT) AS pix_max
             |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin)),

    // POSITION DELETES ([[SnapshotStore.deleteWherePositions]] —
    // Iceberg's second delete-file type): rows named by physical
    // address (file, row index), committed zero-copy (in-query require
    // pins that no data file was rewritten), applied by readers as a
    // broadcast address anti-join. Re-appending value-IDENTICAL rows
    // after the delete must NOT be swallowed (addresses point at old
    // files only) — the oracle proves it by landing exactly back on
    // the even-key relation.
    Q("m_position_deletes",
      (s, dir) => {
        val st = new SnapshotStore(s,
          s"/tmp/graft_ss_posdel_${new java.io.File(dir).getName}")
        st.dropTable("silver", "ord")
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
        st.overwrite(o.filter(col("o_orderkey") % 2 === 0).repartition(2),
          "silver", "ord")
        val before = st.read("silver", "ord").inputFiles.toSet
        st.deleteWherePositions("silver", "ord", col("o_orderkey") % 10 === 6)
        val after = st.read("silver", "ord").inputFiles.toSet
        require(before.subsetOf(after),
          "position delete rewrote data files (expected zero-copy)")
        st.append(o.filter(col("o_orderkey") % 10 === 6).repartition(1),
          "silver", "ord")
        st.read("silver", "ord").orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey""".stripMargin)),

    // FULL PCM16 WAV sample decode ([[graft.ops.Multimodal
    // .wavSampleStats]]): genuine RIFF containers whose int16 samples
    // follow an id-keyed formula, scanned for EXACT integer energy
    // (Σ s², BIGINT) and zero-crossings — the real audio-feature read
    // path next to the header-walk metadata pass. The oracle replays
    // every sample; one double sqrt at the edge for RMS.
    Q("mm_wav_energy",
      (s, dir) => {
        import graft.ops.Multimodal
        Multimodal.wavFeatureStats(s,
          Multimodal.synthWavSignalCorpus(s, Tables.documents(s, dir), "doc_id"),
          "doc_id", "payload")
          .orderBy("doc_id")
      },
      Some("""WITH base AS (SELECT doc_id, 120 + doc_id % 40 AS n FROM documents),
             |sm AS (SELECT doc_id, n, i.i AS i,
             |         ((doc_id * 31 + i.i * 17) % 65536) - 32768 AS v
             |       FROM base, unnest(range(0, n)) AS i(i)),
             |st AS (SELECT doc_id, n,
             |         CAST(SUM(v * v) AS BIGINT) AS energy,
             |         CAST(SUM(CASE WHEN i > 0 AND
             |             ((v >= 0) <> (((doc_id * 31 + (i - 1) * 17) % 65536) - 32768 >= 0))
             |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
             |       FROM sm GROUP BY 1, 2)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_samples, energy, zero_crossings,
             |       sqrt(CAST(energy AS DOUBLE) / CAST(CAST(n AS BIGINT) AS DOUBLE)) AS rms
             |FROM st ORDER BY doc_id""".stripMargin)),

    // Pareto revenue concentration: users ranked into deciles by exact
    // cent totals, cumulative share per decile — the "top 10% drive
    // X%" curve every revenue review opens with. The only windows run
    // over 10 decile rows; the per-user reduction is one keyed
    // aggregate.
    Q("ev_pareto",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val perUser = Tables.events(s, dir)
          .select(col("user_id"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("__c"))
          .groupBy(col("user_id")).agg(sum(col("__c")).as("c"))
        val ranked = perUser.withColumn("decile",
          ntile(10).over(Window.orderBy(col("c").desc, col("user_id"))))
        val deciles = ranked.groupBy(col("decile"))
          .agg(count(lit(1)).as("n_users"), sum(col("c")).as("revenue_cents"))
        val wc = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val all = Window.partitionBy()
        deciles
          .withColumn("cum_share",
            sum(col("revenue_cents")).over(wc).cast("double")
              / sum(col("revenue_cents")).over(all).cast("double"))
          .orderBy("decile")
      },
      Some("""WITH pu AS (SELECT user_id,
             |         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS c
             |       FROM events GROUP BY 1),
             |r AS (SELECT user_id, c,
             |        ntile(10) OVER (ORDER BY c DESC, user_id) AS decile
             |      FROM pu),
             |d AS (SELECT decile, count(*) AS n_users,
             |        CAST(SUM(c) AS BIGINT) AS revenue_cents
             |      FROM r GROUP BY 1)
             |SELECT decile, n_users, revenue_cents,
             |       CAST(SUM(revenue_cents) OVER (ORDER BY decile
             |              ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             |         / CAST(SUM(revenue_cents) OVER () AS DOUBLE) AS cum_share
             |FROM d ORDER BY decile""".stripMargin)),

    // Degree assortativity of the trade graph: Pearson correlation of
    // endpoint degrees over the distinct customer↔supplier edges —
    // "do high-degree customers trade with high-degree suppliers".
    // Exact integer sufficient statistics ([[TimeSeries.pearsonByKey]]
    // with a constant key); degrees are distinct-neighbor counts from
    // one aggregate each.
    Q("gr_assortativity",
      (s, dir) => {
        val e = Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("p"))
          .distinct()
        val degC = e.groupBy(col("c")).agg(count(lit(1)).as("deg_c"))
        val degP = e.groupBy(col("p")).agg(count(lit(1)).as("deg_p"))
        val pairs = e.join(degC, "c").join(broadcast(degP), "p")
          .withColumn("g", lit(1))
        TimeSeries.pearsonByKey(pairs, Seq("g"), "deg_c", "deg_p")
          .select(col("n_pairs"), col("corr").as("assortativity"))
      },
      Some {
        val nd = "CAST(n_pairs AS DOUBLE)"
        def d(c: String) = s"CAST($c AS DOUBLE)"
        val num = s"($nd * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
        val varx = s"($nd * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
        val vary = s"($nd * ${d("syy")} - ${d("sy")} * ${d("sy")})"
        val den = s"(sqrt(GREATEST($varx, 0.0)) * sqrt(GREATEST($vary, 0.0)))"
        s"""WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS p
           |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |dc AS (SELECT c, CAST(count(*) AS BIGINT) AS deg_c FROM e GROUP BY 1),
           |dp AS (SELECT p, CAST(count(*) AS BIGINT) AS deg_p FROM e GROUP BY 1),
           |pr AS (SELECT CAST(CAST(deg_c AS DECIMAL(18,2)) * 100 AS BIGINT) AS cx,
           |         CAST(CAST(deg_p AS DECIMAL(18,2)) * 100 AS BIGINT) AS cy
           |       FROM e JOIN dc USING (c) JOIN dp USING (p)),
           |a AS (SELECT ${TimeSeries.pearsonSql("cx", "cy")} FROM pr)
           |SELECT n_pairs,
           |       CASE WHEN n_pairs = 0 OR $den = 0.0 THEN NULL
           |            ELSE $num / $den END AS assortativity
           |FROM a""".stripMargin
      }),

    // Code-vs-prose detection — the corpus-routing gate an LLM data
    // pipeline runs before language-specific filters: symbol density,
    // bracket/brace counts, and an assignment/semicolon signal, all
    // exact integer counts from Java∩RE2-safe patterns, combined into
    // a deterministic integer score (micro-point weights, no floats).
    // The corpus gets deterministic injected "code" (doc_id-keyed) so
    // the gate provably routes rather than matching nothing.
    Q("t_code_detect",
      (s, dir) => {
        val codeSnip = lit(" x = f(a[i]); y += 2; { return (x < y); }")
        val docs = Tables.documents(s, dir).select(col("doc_id"),
          when(col("doc_id") % 4 === 0, concat(col("text"), codeSnip))
            .otherwise(col("text")).as("text"))
        val braces = regexp_count(col("text"), lit("[{}\\[\\]()]")).cast(LongType)
        val assigns = regexp_count(col("text"), lit("(=|;|\\+=)")).cast(LongType)
        val chars = length(col("text")).cast(LongType)
        docs.select(col("doc_id"), braces.as("n_brackets"),
          assigns.as("n_assign"), chars.as("n_chars"))
          .withColumn("code_score", // `div`, not `/` (always double in Spark)
            expr("(1000000 * (n_brackets * 3 + n_assign * 2)) div n_chars"))
          .withColumn("is_code", (col("code_score") >= 20000).cast("int"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
             |         CASE WHEN doc_id % 4 = 0
             |              THEN text || ' x = f(a[i]); y += 2; { return (x < y); }'
             |              ELSE text END AS text
             |       FROM documents),
             |c AS (SELECT doc_id,
             |        CAST(len(regexp_extract_all(text, '[{}\[\]()]')) AS BIGINT) AS n_brackets,
             |        CAST(len(regexp_extract_all(text, '(=|;|\+=)')) AS BIGINT) AS n_assign,
             |        CAST(length(text) AS BIGINT) AS n_chars
             |      FROM d)
             |SELECT doc_id, n_brackets, n_assign, n_chars,
             |       (1000000 * (n_brackets * 3 + n_assign * 2)) // n_chars AS code_score,
             |       CAST((1000000 * (n_brackets * 3 + n_assign * 2)) // n_chars >= 20000
             |            AS INT) AS is_code
             |FROM c ORDER BY doc_id""".stripMargin)),

    // New-vs-returning daily active users — the growth-dashboard
    // staple: each user's first-touch day from one keyed aggregate,
    // then per-day splits (is this activity day the user's first?).
    // Both aggregates keyed by user/day; no window over raw events.
    Q("ev_new_returning",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val userDays = ev.distinct()
        val first = userDays.groupBy(col("user_id"))
          .agg(min(col("d")).as("first_d"))
        userDays.join(first, "user_id")
          .groupBy(col("d"))
          .agg(
            count(when(col("d") === col("first_d"), lit(1))).as("new_users"),
            count(when(col("d") =!= col("first_d"), lit(1))).as("returning_users"))
          .orderBy("d")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
             |f AS (SELECT user_id, min(d) AS first_d FROM ud GROUP BY 1)
             |SELECT d,
             |       CAST(SUM(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT)
             |         AS new_users,
             |       CAST(SUM(CASE WHEN d <> first_d THEN 1 ELSE 0 END) AS BIGINT)
             |         AS returning_users
             |FROM ud JOIN f USING (user_id)
             |GROUP BY d ORDER BY d""".stripMargin)),

    // Aggregate FILTER clause surface (SQL:2003, supported by both
    // engines): conditional counts/sums without CASE scaffolding,
    // through the spark.sql entry path.
    Q("agg_filter_clause",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("afc_orders")
        s.sql(s"""SELECT o_orderpriority,
                 |  count(*) AS n,
                 |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
                 |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 |       FILTER (WHERE o_totalprice > 200000) AS DOUBLE) AS big_revenue
                 |FROM afc_orders GROUP BY o_orderpriority
                 |ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority,
             |  count(*) AS n,
             |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |       FILTER (WHERE o_totalprice > 200000) AS DOUBLE) AS big_revenue
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    // join keys MATCH each other instead of dropping — the semantics
    // dimension-key joins with "unknown" buckets need. NULLs are
    // injected deterministically on both sides; a plain equi-join
    // would silently lose those rows (counted and pinned in-query).
    Q("j_null_safe",
      (s, dir) => {
        val n = Tables.nation(s, dir).select(
          when(col("n_nationkey") % 5 === 0, lit(null).cast("int"))
            .otherwise(col("n_regionkey")).as("rk"),
          col("n_nationkey"), col("n_name"))
        val r = Tables.region(s, dir).select(
          when(col("r_regionkey") === 0, lit(null).cast("int"))
            .otherwise(col("r_regionkey")).as("rk"),
          col("r_name"))
        val joined = n.join(r, n("rk") <=> r("rk"))
          .select(col("n_nationkey"), col("n_name"), col("r_name"))
        val nullMatches = joined.join(
          n.filter(col("rk").isNull).select(col("n_nationkey")),
          Seq("n_nationkey"), "left_semi").count()
        require(nullMatches > 0, "null-safe join matched no NULL keys")
        joined.orderBy("n_nationkey", "r_name")
      },
      Some("""WITH n AS (SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
             |                       ELSE n_regionkey END AS rk,
             |                n_nationkey, n_name
             |           FROM nation),
             |r AS (SELECT CASE WHEN r_regionkey = 0 THEN NULL
             |                  ELSE r_regionkey END AS rk, r_name
             |      FROM region)
             |SELECT n_nationkey, n_name, r_name
             |FROM n JOIN r ON n.rk IS NOT DISTINCT FROM r.rk
             |ORDER BY n_nationkey, r_name""".stripMargin)),

    // Systematic sampling over a hash order: every k-th row of the
    // md5-shuffled corpus — deterministic, partition-invariant, and
    // evenly spread across the (pseudo-random) order, the classic
    // alternative to Bernoulli sampling when exact quota matters.
    Q("samp_systematic",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, dir)
          .withColumn("__rn", row_number().over(
            Window.orderBy(md5(col("text")), col("doc_id"))))
          .filter((col("__rn") - 1) % 20 === 0)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, n_chars FROM (
             |  SELECT doc_id, lang, n_chars,
             |         row_number() OVER (ORDER BY md5(text), doc_id) AS rn
             |  FROM documents)
             |WHERE (rn - 1) % 20 = 0 ORDER BY doc_id""".stripMargin)),

    // Duplicate-cluster size histogram: how much of the corpus sits in
    // clusters of each size — the dedup-impact summary ("N docs are
    // singletons, M sit in pairs, ...") run before choosing a dedup
    // threshold. Exact-duplicate components via one hash aggregate on
    // the (line-injected) corpus; two more bounded aggregates for the
    // histogram.
    Q("dd_cluster_sizes",
      (s, dir) => {
        // deterministic duplicate groups: every run of 7 consecutive
        // ids shares its base doc's text (the corpus has no full-doc
        // exact dups of its own — injected, like the PII fixture)
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val base = d.select(col("doc_id").as("b_id"), col("text").as("b_text"))
        val docs = d.select(col("doc_id"),
          (col("doc_id") - col("doc_id") % 7).as("b_id"))
          .join(base, "b_id")
          .select(col("doc_id"), col("b_text").as("text"))
        val clusters = docs.groupBy(col("text"))
          .agg(count(lit(1)).as("cluster_size"))
        clusters.groupBy(col("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("cluster_size")).cast("long").as("n_docs"))
          .orderBy("cluster_size")
      },
      Some("""WITH docs AS (SELECT d.doc_id, b.text
             |              FROM documents d
             |              JOIN documents b ON b.doc_id = d.doc_id - d.doc_id % 7),
             |cl AS (SELECT text, CAST(count(*) AS BIGINT) AS cluster_size
             |       FROM docs GROUP BY 1)
             |SELECT cluster_size, count(*) AS n_clusters,
             |       CAST(SUM(cluster_size) AS BIGINT) AS n_docs
             |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Dedup COST/BENEFIT report — the decision artifact every pipeline
    // run wants before committing to a dedup pass: per duplicate-
    // cluster size, how many docs dedup would drop and how many TOKENS
    // that saves (training-data budget is token-denominated, not
    // doc-denominated). Chains the dd_cluster_sizes clusters into
    // token-count deltas: keep-one-per-cluster (min doc_id, the
    // dd_exact convention), tokens_removed = cluster tokens minus the
    // representative's. Clusters key on md5(text) — 16 bytes through
    // the shuffle instead of full bodies (the at-scale shape;
    // dd_cluster_sizes groups raw text only because its output IS
    // text-keyed). One token-count projection, two bounded aggregates.
    Q("dd_cost_benefit",
      (s, dir) => {
        // same injected duplicate groups as dd_cluster_sizes: every
        // run of 7 consecutive ids shares its base doc's text
        val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val base = d.select(col("doc_id").as("b_id"), col("text").as("b_text"))
        val docs = d.select(col("doc_id"),
          (col("doc_id") - col("doc_id") % 7).as("b_id"))
          .join(base, "b_id")
          .select(col("doc_id"), md5(col("b_text")).as("h"),
            size(TextOps.tokens(col("b_text"))).cast(LongType).as("n_tok"))
        val clusters = docs.groupBy(col("h"))
          .agg(count(lit(1)).as("cluster_size"),
            sum(col("n_tok")).as("tok_total"),
            min(col("n_tok")).as("tok_kept")) // dup texts: all n_tok equal
        clusters.groupBy(col("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("cluster_size")).cast(LongType).as("n_docs"),
            sum(col("cluster_size") - 1).cast(LongType).as("docs_removed"),
            sum(col("tok_total")).cast(LongType).as("tokens_total"),
            sum(col("tok_kept")).cast(LongType).as("tokens_kept"))
          .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
            col("docs_removed"), col("tokens_total"), col("tokens_kept"),
            (col("tokens_total") - col("tokens_kept")).as("tokens_removed"),
            ((col("tokens_total") - col("tokens_kept")).cast(DoubleType) /
              col("tokens_total").cast(DoubleType)).as("pct_tokens_saved"))
          .orderBy("cluster_size")
      },
      Some(s"""WITH docs AS (SELECT d.doc_id, md5(b.text) AS h,
             |         CAST(len(${TextOps.tokensSql("b.text")}) AS BIGINT) AS n_tok
             |       FROM documents d
             |       JOIN documents b ON b.doc_id = d.doc_id - d.doc_id % 7),
             |cl AS (SELECT h, CAST(count(*) AS BIGINT) AS cluster_size,
             |         CAST(SUM(n_tok) AS BIGINT) AS tok_total,
             |         CAST(MIN(n_tok) AS BIGINT) AS tok_kept
             |       FROM docs GROUP BY 1)
             |SELECT cluster_size, count(*) AS n_clusters,
             |  CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
             |  CAST(SUM(cluster_size - 1) AS BIGINT) AS docs_removed,
             |  CAST(SUM(tok_total) AS BIGINT) AS tokens_total,
             |  CAST(SUM(tok_kept) AS BIGINT) AS tokens_kept,
             |  CAST(SUM(tok_total) - SUM(tok_kept) AS BIGINT) AS tokens_removed,
             |  CAST(SUM(tok_total) - SUM(tok_kept) AS DOUBLE)
             |    / CAST(SUM(tok_total) AS DOUBLE) AS pct_tokens_saved
             |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Dedup THRESHOLD-SWEEP report — the curve a curation run actually
    // tunes against before committing to a near-dup pass: for each
    // candidate Jaccard threshold, how many doc pairs fire, how many
    // duplicate components form, and how many docs/tokens
    // keep-one-per-component (min doc_id) would drop. Structured the
    // way a 100 TB run is: EXACT-SET CONTRACTION first (identical
    // token sets collapse to one supernode — J = 1 keeps them together
    // at every threshold, so the contraction is lossless for the
    // sweep), then ONE prefix-filtered candidate pass over the
    // representatives at the loosest threshold
    // ([[graft.ops.Dedup.ppjoinPairs]]), then T cheap component passes
    // over the filtered GROUP graph. Doc-level pair counts come back
    // arithmetically (cross pairs Σ sa·sb + within-group Σ C(s,2)) —
    // identical numbers to the uncontracted sweep at a fraction of the
    // join volume (the synthetic corpus is dup-dense: 5,000 docs
    // contract to far fewer distinct sets, and candidate work falls
    // quadratically in the dup factor).
    Q("dd_threshold_sweep",
      (s, dir) => {
        val tokCol = graft.ops.TextOps.tokens(col("text"))
        val base = Tables.documents(s, dir)
          .select(col("doc_id"),
            md5(concat_ws(" ", array_sort(array_distinct(tokCol)))).as("h"),
            size(tokCol).cast(LongType).as("n_tok"), col("text"))
          .localCheckpoint()
        val corpus = base.agg(sum("n_tok").cast(LongType).as("__ct"))
        val groups = base.groupBy("h")
          .agg(min("doc_id").as("gid"),
            count(lit(1)).as("gsize"),
            sum("n_tok").cast(LongType).as("gtok"),
            // keep-one keeps the component's MIN doc id; within the
            // min-gid group that is its min doc — min_by pins its
            // exact token count (set-equal docs can differ in repeats)
            min_by(col("n_tok"), col("doc_id")).cast(LongType).as("tok_kept1"))
          .localCheckpoint()
        val reps = base.join(groups.select(col("gid").as("doc_id")), "doc_id")
          .select(col("doc_id"), col("text"))
        val pairs = graft.ops.Dedup.ppjoinPairs(reps, "doc_id", "text", 0.90)
          .select(col("id_a"), col("id_b"), col("jaccard")).localCheckpoint()
        val g = groups.select(col("gid"), col("gsize"), col("gtok"), col("tok_kept1"))
          .localCheckpoint()
        // within-group doc pairs are J = 1 — they fire at EVERY threshold
        val within = g.agg(sum(col("gsize") * (col("gsize") - 1) / 2)
          .cast(LongType).as("__wp"))
        // ONE component run for all four thresholds: encode the
        // threshold index into the node id (id·4 + ti — superlevel
        // graphs never cross-connect, min-label decodes exactly), so
        // the sweep pays one driver-coordinated label loop, not four
        // (measured: the four eager loops were over half the query's
        // wall, all of it per-round fixed latency)
        val thresholds = Seq(0.90, 0.92, 0.95, 0.98)
        val multiEdges = thresholds.zipWithIndex.map { case (t, ti) =>
          pairs.filter(col("jaccard") >= t)
            .select((col("id_a") * 4 + ti).as("id_a"),
              (col("id_b") * 4 + ti).as("id_b"))
        }.reduce(_ unionByName _)
        val compAll = graft.ops.Dedup.connectedComponents(multiEdges, maxIter = 30)
          .select((col("id") % 4).cast("int").as("__ti"),
            expr("id div 4").as("id"), expr("component div 4").as("component"))
          .localCheckpoint()
        val rows = thresholds.zipWithIndex.map { case (t, ti) =>
          val e = pairs.filter(col("jaccard") >= t)
          val comp0 = compAll.filter(col("__ti") === ti).drop("__ti")
          // dup groups untouched by any cross-set edge are their own
          // singleton components
          val lone = g.filter(col("gsize") >= 2)
            .join(comp0.withColumnRenamed("id", "gid"), Seq("gid"), "left_anti")
            .select(col("gid").as("id"), col("gid").as("component"))
          val comp = comp0.unionByName(lone)
            .join(g.withColumnRenamed("gid", "id"), "id")
          val byComp = comp.groupBy("component")
            .agg(sum("gsize").as("docs"), sum("gtok").as("toks"),
              min_by(col("tok_kept1"), col("id")).as("kept"))
          val cc = byComp.agg(
            count(lit(1)).as("n_components"),
            coalesce(sum("docs"), lit(0L)).cast(LongType).as("n_dup_docs"),
            coalesce(sum(col("toks") - col("kept")), lit(0L)).cast(LongType)
              .as("tokens_removed"))
          val cross = e
            .join(g.select(col("gid").as("id_a"), col("gsize").as("__sa")), "id_a")
            .join(g.select(col("gid").as("id_b"), col("gsize").as("__sb")), "id_b")
            .agg(coalesce(sum(col("__sa") * col("__sb")), lit(0L))
              .cast(LongType).as("__cp"))
          cross.crossJoin(broadcast(within)).crossJoin(broadcast(cc))
            .crossJoin(broadcast(corpus))
            .select(lit(t).as("threshold"),
              (col("__cp") + col("__wp")).as("n_pairs"),
              col("n_dup_docs"), col("n_components"),
              (col("n_dup_docs") - col("n_components")).as("docs_removed"),
              col("tokens_removed"),
              (col("tokens_removed").cast(DoubleType) /
                col("__ct").cast(DoubleType)).as("pct_corpus_tokens_saved"))
        }
        rows.reduce(_ unionByName _).orderBy("threshold")
      },
      Some {
        def block(tag: String, t: String): String =
          s"""e$tag AS (SELECT ia, ib FROM j WHERE jac >= $t),
             |sym$tag AS (SELECT ia AS a, ib AS b FROM e$tag
             |            UNION ALL SELECT ib, ia FROM e$tag),
             |reach$tag(node, r) AS (
             |    SELECT a, a FROM sym$tag
             |  UNION
             |    SELECT s.a, reach$tag.r FROM sym$tag s
             |    JOIN reach$tag ON s.b = reach$tag.node),
             |comp0$tag AS (SELECT node, MIN(r) AS component
             |              FROM reach$tag GROUP BY 1),
             |comp$tag AS (SELECT c.node, c.component, g.gsize, g.gtok, g.tok_kept1
             |  FROM (SELECT node, component FROM comp0$tag
             |        UNION ALL
             |        SELECT gid, gid FROM groups
             |        WHERE gsize >= 2 AND gid NOT IN (SELECT node FROM comp0$tag)) c
             |  JOIN groups g ON g.gid = c.node),
             |byc$tag AS (SELECT component, SUM(gsize) AS docs, SUM(gtok) AS toks,
             |              MIN_BY(tok_kept1, node) AS kept
             |            FROM comp$tag GROUP BY 1),
             |row$tag AS (SELECT CAST($t AS DOUBLE) AS threshold,
             |    (SELECT CAST(COALESCE(SUM(ga.gsize * gb.gsize), 0) AS BIGINT)
             |     FROM e$tag JOIN groups ga ON ga.gid = ia
             |                JOIN groups gb ON gb.gid = ib)
             |      + (SELECT wp FROM within) AS n_pairs,
             |    CAST(COALESCE(SUM(docs), 0) AS BIGINT) AS n_dup_docs,
             |    CAST(COUNT(*) AS BIGINT) AS n_components,
             |    CAST(COALESCE(SUM(docs), 0) - COUNT(*) AS BIGINT) AS docs_removed,
             |    CAST(COALESCE(SUM(toks - kept), 0) AS BIGINT) AS tokens_removed,
             |    CAST(COALESCE(SUM(toks - kept), 0) AS DOUBLE)
             |      / (SELECT CAST(ct AS DOUBLE) FROM ct) AS pct_corpus_tokens_saved
             |  FROM byc$tag)""".stripMargin
        val tags = Seq("90" -> "0.90", "92" -> "0.92", "95" -> "0.95", "98" -> "0.98")
        s"""WITH RECURSIVE base AS (SELECT doc_id,
           |         md5(array_to_string(list_sort(list_distinct(
           |           list_filter(string_split(text, ' '), t -> len(t) > 0))), ' ')) AS h,
           |         CAST(len(${graft.ops.TextOps.tokensSql("text")}) AS BIGINT) AS n_tok
           |       FROM documents),
           |ct AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS ct FROM base),
           |groups AS (SELECT h, MIN(doc_id) AS gid,
           |             CAST(COUNT(*) AS BIGINT) AS gsize,
           |             CAST(SUM(n_tok) AS BIGINT) AS gtok,
           |             CAST(MIN_BY(n_tok, doc_id) AS BIGINT) AS tok_kept1
           |           FROM base GROUP BY 1),
           |within AS (SELECT CAST(SUM(gsize * (gsize - 1) // 2) AS BIGINT) AS wp
           |           FROM groups),
           |gt AS (SELECT DISTINCT g.gid AS id,
           |         unnest(list_filter(string_split(d.text, ' '), t -> len(t) > 0)) AS tok
           |       FROM groups g JOIN documents d ON d.doc_id = g.gid),
           |n AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM gt GROUP BY 1),
           |inter AS (SELECT a.id AS ia, b.id AS ib, CAST(COUNT(*) AS BIGINT) AS shared
           |          FROM gt a JOIN gt b ON a.tok = b.tok AND a.id < b.id
           |          GROUP BY 1, 2),
           |j AS (SELECT ia, ib,
           |        CAST(shared AS DOUBLE) / CAST(na.n + nb.n - shared AS DOUBLE) AS jac
           |      FROM inter JOIN n na ON na.id = ia JOIN n nb ON nb.id = ib),
           |${tags.map { case (tag, t) => block(tag, t) }.mkString(",\n")}
           |${tags.map { case (tag, _) => s"SELECT * FROM row$tag" }
                .mkString("\nUNION ALL\n")}
           |ORDER BY threshold""".stripMargin
      }),

    // VACUUM dry-run ([[SnapshotStore.orphanReport]]): three
    // generations under keepSnapshots=1 leave exactly two orphaned
    // single-file generations; the report must name them (without
    // deleting), vacuum must then reclaim exactly those, and a second
    // report must come back empty — the audit-before-sweep contract.
    Q("m_orphan_report",
      (s, dir) => {
        val st = new SnapshotStore(s,
          s"/tmp/graft_ss_orphan_${new java.io.File(dir).getName}",
          keepSnapshots = 1)
        st.dropTable("gold", "t")
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
        (1 to 3).foreach(i =>
          st.overwrite(o.filter(col("o_orderkey") % 3 === i % 3).repartition(1),
            "gold", "t"))
        val report = st.orphanReport("gold", "t")
        val nOrphans = report.count()
        val bytesPositive = report.agg(min(col("bytes")).as("mn")).head.getLong(0) > 0
        val reclaimed = st.vacuum("gold", "t")
        val after = st.orphanReport("gold", "t").count()
        val s2 = s // one-row summary, all invariants data-carried
        import s2.implicits._
        Seq((nOrphans, bytesPositive, reclaimed.toLong, after))
          .toDF("n_orphans", "bytes_positive", "n_reclaimed", "n_after_vacuum")
      },
      Some("""SELECT CAST(2 AS BIGINT) AS n_orphans, TRUE AS bytes_positive,
             |       CAST(2 AS BIGINT) AS n_reclaimed,
             |       CAST(0 AS BIGINT) AS n_after_vacuum""".stripMargin)),

    // INTERVAL RANGE window frame (calendar-aware trailing window on a
    // TIMESTAMP order key — `RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
    // AND CURRENT ROW`): the time-based frame both engines implement
    // with identical tie semantics (all rows at the current instant
    // join the frame). Exact decimal sums; per-order output.
    Q("w_interval_range",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("wir_orders")
        s.sql("""SELECT o_custkey, o_orderkey, o_orderdate,
                |  count(*) OVER w AS n_trailing_30d,
                |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                |    AS spend_trailing_30d
                |FROM wir_orders
                |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                |             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  count(*) OVER w AS n_trailing_30d,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             |    AS spend_trailing_30d
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             |             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // Subquery-semantics family through spark.sql: IN, NOT IN, EXISTS,
    // and scalar subquery in projection context. DIVERGENCE FOUND AND
    // EXCLUDED: `NOT IN (subquery with a NULL element)` in a SELECT
    // list returns the SQL-standard UNKNOWN in DuckDB but FALSE in
    // Spark — Spark compiles the projection-context IN-subquery to an
    // ExistenceJoin that is not null-aware (the WHERE-context
    // null-aware anti-join machinery doesn't apply to projections).
    // Measured at sf0.001 where the only building-segment customers of
    // a nation carry negative balances. The parity surface here stays
    // on NULL-free lists; the divergence is the documented caveat.
    Q("j_subquery_family",
      (s, dir) => {
        Tables.nation(s, dir).createOrReplaceTempView("sqf_nation")
        Tables.customer(s, dir).createOrReplaceTempView("sqf_customer")
        Tables.supplier(s, dir).createOrReplaceTempView("sqf_supplier")
        s.sql("""SELECT n_nationkey, n_name,
                |  n_nationkey IN (SELECT c_nationkey FROM sqf_customer
                |                  WHERE c_acctbal > 9000) AS has_rich,
                |  EXISTS (SELECT 1 FROM sqf_supplier
                |          WHERE s_nationkey = n_nationkey) AS has_supplier,
                |  (SELECT count(*) FROM sqf_customer
                |   WHERE c_nationkey = n_nationkey) AS n_customers,
                |  n_nationkey NOT IN (SELECT c_nationkey FROM sqf_customer
                |                      WHERE c_mktsegment = 'BUILDING')
                |    AS not_in_building
                |FROM sqf_nation ORDER BY n_nationkey""".stripMargin)
      },
      Some("""SELECT n_nationkey, n_name,
             |  n_nationkey IN (SELECT c_nationkey FROM customer
             |                  WHERE c_acctbal > 9000) AS has_rich,
             |  EXISTS (SELECT 1 FROM supplier
             |          WHERE s_nationkey = n_nationkey) AS has_supplier,
             |  (SELECT count(*) FROM customer
             |   WHERE c_nationkey = n_nationkey) AS n_customers,
             |  n_nationkey NOT IN (SELECT c_nationkey FROM customer
             |                      WHERE c_mktsegment = 'BUILDING')
             |    AS not_in_building
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // Templated-document detection by normalized-prefix clustering:
    // lowercase, digits→'#', whitespace collapsed, first 48 chars —
    // the skeleton that groups "Invoice #123 for..." / "Invoice #456
    // for..." boilerplate exact dedup and shingles both miss. One
    // hash aggregate on the short skeleton key (never the full text);
    // deterministic digit-suffix injection proves the fold clusters.
    Q("dd_template_prefix",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"),
          concat(lit("Report #"), (col("doc_id") % 1000).cast("string"),
            lit(" :: "), col("text")).as("text"))
        val skeleton = substring(
          regexp_replace(regexp_replace(lower(col("text")), "[0-9]+", "#"),
            "\\s+", " "), 1, 48)
        docs.select(col("doc_id"), skeleton.as("skel"))
          .groupBy(col("skel"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("exemplar_id"))
          .filter(col("n_docs") > 1)
          .orderBy(col("n_docs").desc, col("skel"))
          .limit(20)
      },
      Some("""WITH d AS (SELECT doc_id,
             |         'Report #' || CAST(doc_id % 1000 AS VARCHAR) || ' :: ' || text AS text
             |       FROM documents),
             |s AS (SELECT doc_id,
             |        substr(regexp_replace(regexp_replace(lower(text), '[0-9]+', '#', 'g'),
             |               '\s+', ' ', 'g'), 1, 48) AS skel
             |      FROM d)
             |SELECT skel, count(*) AS n_docs,
             |       CAST(min(doc_id) AS BIGINT) AS exemplar_id
             |FROM s GROUP BY skel HAVING count(*) > 1
             |ORDER BY n_docs DESC, skel LIMIT 20""".stripMargin)),

    // Row-id CDC ([[SnapshotStore.readLineage]] with time travel): the
    // change feed between two lineage snapshots keyed by the STABLE
    // `_row_id` — no natural key needed, the consumer Iceberg v3 row
    // lineage exists for. Inserts are ids present only in the new
    // snapshot (one anti-join on the id; file-immutability means no
    // updates-in-place to classify). The oracle replays the id
    // assignment and the batch split.
    Q("m_lineage_cdc",
      (s, dir) => {
        val st = new SnapshotStore(s,
          s"/tmp/graft_ss_lincdc_${new java.io.File(dir).getName}",
          statsFor = Seq("o_orderkey"))
        st.dropTable("silver", "ord")
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
        def batch(r: Int) = o.filter(col("o_orderkey") % 2 === r)
          .repartition(1).sortWithinPartitions("o_orderkey")
        val v1 = st.appendLineage(batch(0), "silver", "ord")
        st.appendLineage(batch(1), "silver", "ord")
        val prev = st.readLineage("silver", "ord", Some(v1))
          .select(col("_row_id").as("__prev_id"))
        st.readLineage("silver", "ord")
          .join(prev, col("_row_id") === col("__prev_id"), "left_anti")
          .select(col("o_orderkey"), col("o_totalprice"), col("_row_id"))
          .orderBy("_row_id")
      },
      Some("""WITH evens AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 2 = 0)
             |SELECT o_orderkey, o_totalprice,
             |       CAST((SELECT n FROM evens)
             |            + row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT)
             |         AS _row_id
             |FROM orders WHERE o_orderkey % 2 = 1
             |ORDER BY _row_id""".stripMargin)),

    // Delta replaceWhere as ONE commit ([[SnapshotStore.replaceWhere]]):
    // the predicate's rows leave via a position-delete file and the
    // replacement rows land in the SAME snapshot — the in-query require
    // pins exactly one new snapshot id, so no reader can observe the
    // deleted-but-not-yet-reinserted middle. Urgent orders are replaced
    // by their doubled-price restatement; everything else is untouched
    // and unrewitten.
    Q("m_replace_where",
      (s, dir) => {
        val st = new SnapshotStore(s,
          s"/tmp/graft_ss_rw_${new java.io.File(dir).getName}")
        st.dropTable("silver", "ord")
        val o = Tables.orders(s, dir).select(
          col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        st.overwrite(o, "silver", "ord")
        val before = st.snapshots("silver", "ord").size
        val replacement = o.filter(col("o_orderpriority") === "1-URGENT")
          .withColumn("o_totalprice", col("o_totalprice") * 2)
        st.replaceWhere(replacement, "silver", "ord",
          col("o_orderpriority") === "1-URGENT")
        require(st.snapshots("silver", "ord").size == before + 1,
          "m_replace_where: the swap must be exactly ONE commit")
        st.read("silver", "ord").orderBy("o_orderkey", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
             |WHERE o_orderpriority <> '1-URGENT'
             |UNION ALL
             |SELECT o_orderkey, o_orderpriority, o_totalprice * 2 AS o_totalprice
             |FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY o_orderkey, o_totalprice""".stripMargin)),

    // Multinomial naive Bayes langid ([[Classifier.naiveBayes]]): the
    // classical generative text classifier, trained and scored with
    // keyed counts + an ln-free reference-relative likelihood (the
    // exact MAP decision, bit-identical across engines — scaladoc).
    // Per-document predictions, exact double scores included.
    Q("ml_naive_bayes",
      (s, dir) => Classifier.naiveBayes(
          Tables.documents(s, dir), "doc_id", "text", "lang")
        .orderBy("doc_id"),
      Some(s"""WITH ${Classifier.naiveBayesSql("documents", "lang")}
              |SELECT p.doc_id, b.lab AS true_lab, p.pred_lab, p.score
              |FROM pred p JOIN base b USING (doc_id)
              |WHERE p.rn = 1 ORDER BY p.doc_id""".stripMargin)),

    // The NB confusion matrix — the model-quality artifact a pipeline
    // actually gates on (per-class precision/recall derive from it).
    Q("ml_nb_confusion",
      (s, dir) => Classifier.naiveBayes(
          Tables.documents(s, dir), "doc_id", "text", "lang")
        .groupBy(col("true_lab"), col("pred_lab"))
        .agg(count(lit(1)).as("n"))
        .orderBy("true_lab", "pred_lab"),
      Some(s"""WITH ${Classifier.naiveBayesSql("documents", "lang")}
              |SELECT b.lab AS true_lab, p.pred_lab, CAST(count(*) AS BIGINT) AS n
              |FROM pred p JOIN base b USING (doc_id)
              |WHERE p.rn = 1
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Bitwise scalar surface (AND/OR/XOR/NOT/shifts/popcount) — the
    // bit-manipulation toolkit behind bitmap indexes, feature flags,
    // and hash mixing, pinned engine-identical in one codegen'd
    // projection. Popcount is the bitmap-cardinality primitive
    // agg_bitmap_distinct builds on.
    Q("p_bitwise",
      (s, dir) => Tables.part(s, dir)
        .filter(col("p_partkey") % 7 === 0)
        .select(col("p_partkey"),
          col("p_partkey").bitwiseAND(col("p_size").cast(LongType)).as("band"),
          col("p_partkey").bitwiseOR(col("p_size").cast(LongType)).as("bor"),
          col("p_partkey").bitwiseXOR(col("p_size").cast(LongType)).as("bxor"),
          bitwise_not(col("p_size")).as("bnot"),
          shiftleft(col("p_size").cast(LongType), 2).as("shl"),
          shiftright(col("p_partkey"), 1).as("shr"),
          bit_count(col("p_partkey")).as("popcount"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  p_partkey & CAST(p_size AS BIGINT) AS band,
             |  p_partkey | CAST(p_size AS BIGINT) AS bor,
             |  xor(p_partkey, CAST(p_size AS BIGINT)) AS bxor,
             |  ~p_size AS bnot,
             |  CAST(p_size AS BIGINT) << 2 AS shl,
             |  p_partkey >> 1 AS shr,
             |  CAST(bit_count(p_partkey) AS INT) AS popcount
             |FROM part WHERE p_partkey % 7 = 0 ORDER BY p_partkey""".stripMargin)),

    // Local-extrema detection over the daily revenue series — the peak
    // finder under every alerting/seasonality-inspection pass. One
    // keyed-date aggregate (exact integer-cent sums: per-row 2-decimal
    // prices cast exactly to cents, summed as BIGINT — r13's DECIMAL
    // output hashed red in the driver despite value-identical rows, so
    // the output basis is pure integers, which hash identically in any
    // engine) is the only heavy shuffle; the lag/lead comparisons ride
    // a per-priority window whose partitions are tiny (one row per
    // observed day). Strict `>` on both sides: plateaus are not peaks.
    Q("ts_peaks",
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("prio"), col("o_orderdate").as("d"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast(LongType).as("xc"))
          .groupBy(col("prio"), col("d"))
          .agg(sum(col("xc")).as("rev_cents"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("prio")).orderBy(col("d"))
        daily
          .withColumn("prev", lag(col("rev_cents"), 1).over(w))
          .withColumn("nxt", lead(col("rev_cents"), 1).over(w))
          .filter(col("prev").isNotNull && col("nxt").isNotNull &&
            col("rev_cents") > col("prev") && col("rev_cents") > col("nxt"))
          .select(col("prio"), col("d"), col("rev_cents"))
          .orderBy("prio", "d")
      },
      Some("""WITH xs AS (SELECT o_orderpriority AS prio, o_orderdate AS d,
             |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
             |       FROM orders),
             |daily AS (SELECT prio, d, CAST(SUM(xc) AS BIGINT) AS rev_cents
             |       FROM xs GROUP BY 1, 2),
             |w AS (SELECT prio, d, rev_cents,
             |        lag(rev_cents) OVER (PARTITION BY prio ORDER BY d) AS prev,
             |        lead(rev_cents) OVER (PARTITION BY prio ORDER BY d) AS nxt
             |      FROM daily)
             |SELECT prio, d, rev_cents
             |FROM w
             |WHERE prev IS NOT NULL AND nxt IS NOT NULL
             |  AND rev_cents > prev AND rev_cents > nxt
             |ORDER BY prio, d""".stripMargin)),

    // Exact Gini concentration coefficient per priority class over
    // order totals — the inequality measure behind revenue-concentration
    // dashboards. Computed from the rank-weighted identity
    // G = (2·Σ i·x_i − (n+1)·Σ x) / (n·Σ x) with every sum exact (the
    // Σ i·x term is invariant under tie permutations, so the o_orderkey
    // tiebreak only pins determinism, not the value); the xc·i products
    // are widened to DECIMAL(38,0) BEFORE multiply/sum — at sf10 the
    // running Σ i·x exceeds Long range (n≈3e6 rows/group × xc≈5e7
    // cents) and a LongType sum would wrap silently while DuckDB's
    // promotes to HUGEINT — and the single double division at the edge
    // rides the hi/lo-split epilogue so both engines round the >2^53
    // integers identically. One window sort + one aggregate per group —
    // no pairwise |x_i − x_j| blowup.
    Q("agg_gini",
      (s, dir) => {
        val dec38 = DecimalType(38, 0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("prio")).orderBy(col("xc"), col("o_orderkey"))
        Tables.orders(s, dir)
          .select(col("o_orderpriority").as("prio"), col("o_orderkey"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast(LongType).as("xc"))
          .withColumn("i", row_number().over(w).cast(LongType))
          .groupBy(col("prio"))
          .agg(count(lit(1)).as("n"),
            sum(col("xc").cast(dec38)).as("sxc"),
            sum(col("xc").cast(dec38) * col("i").cast(dec38)).as("sixc"))
          .select(col("prio"), col("n"), col("sxc").cast(LongType).as("total_cents"),
            (((lit(2L).cast(dec38) * col("sixc")) -
              ((col("n") + 1).cast(dec38) * col("sxc"))).cast(DoubleType) /
              (col("n").cast(dec38) * col("sxc")).cast(DoubleType)).as("gini"))
          .orderBy("prio")
      },
      Some(s"""WITH xs AS (SELECT o_orderpriority AS prio, o_orderkey,
             |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
             |       FROM orders),
             |rk AS (SELECT prio, xc,
             |         row_number() OVER (PARTITION BY prio ORDER BY xc, o_orderkey) AS i
             |       FROM xs),
             |agg AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
             |          SUM(CAST(xc AS HUGEINT)) AS sxc,
             |          SUM(CAST(xc AS HUGEINT) * i) AS sixc
             |        FROM rk GROUP BY prio)
             |SELECT prio, n, CAST(sxc AS BIGINT) AS total_cents,
             |       ${graft.Det.hiLoDoubleSql("2 * sixc - (n + 1) * sxc")}
             |         / ${graft.Det.hiLoDoubleSql("n * sxc")} AS gini
             |FROM agg ORDER BY prio""".stripMargin)),

    // Herfindahl–Hirschman concentration index per market (priority
    // class over customer revenue shares): HHI = Σ share_i² =
    // Σ x_i² / (Σ x)² — the antitrust-grade concentration statistic
    // next to agg_gini's inequality view. Both Σ x_i² and (Σ x)² are
    // exact integer statistics (cents, DECIMAL(38,0) accumulators);
    // the edge divides TWICE — sxx / sx / sx, not sxx / sx² — so every
    // hi/lo-split operand stays ≤ 2⁸⁵ far past the scale where sx²
    // itself (≈ 2e25 at sf1) would sit within 2× of the split's
    // correctly-rounded ceiling and drift an ulp between engines.
    // IEEE division is deterministic, so two divisions are as
    // bit-exact as one. Two keyed aggregates (per-entity totals, then
    // per-market moments) — no pairwise work.
    Q("agg_hhi",
      (s, dir) => {
        val dec38 = DecimalType(38, 0)
        val perCust = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("prio"), col("o_custkey"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast(LongType).as("xc"))
          .groupBy("prio", "o_custkey")
          .agg(sum(col("xc").cast(dec38)).as("cx"))
        perCust.groupBy("prio")
          .agg(count(lit(1)).as("n_entities"),
            sum(col("cx")).as("sx"),
            sum(col("cx") * col("cx")).as("sxx"))
          .select(col("prio"), col("n_entities"),
            col("sx").cast(LongType).as("total_cents"),
            (col("sxx").cast(DoubleType) /
              col("sx").cast(DoubleType) / col("sx").cast(DoubleType)).as("hhi"))
          .orderBy("prio")
      },
      Some(s"""WITH pc AS (SELECT o_orderpriority AS prio, o_custkey,
             |         SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |             AS HUGEINT)) AS cx
             |       FROM orders GROUP BY 1, 2),
             |agg AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_entities,
             |          SUM(cx) AS sx, SUM(cx * cx) AS sxx
             |        FROM pc GROUP BY 1)
             |SELECT prio, n_entities, CAST(sx AS BIGINT) AS total_cents,
             |       ${graft.Det.hiLoDoubleSql("sxx")}
             |         / ${graft.Det.hiLoDoubleSql("sx")}
             |         / ${graft.Det.hiLoDoubleSql("sx")} AS hhi
             |FROM agg ORDER BY prio""".stripMargin)),

    // Approximate functional-dependency profiling (q_fd_check): for
    // candidate FDs lhs→rhs, how many lhs groups exist, how many carry
    // more than one rhs variant, and the worst fan-out — the
    // TANE-style violation report a schema-inference pass runs before
    // trusting a column as a key. Each FD costs one hash-agg shuffle
    // keyed by its lhs (count-distinct per group, then a scalar
    // re-aggregate); candidates run independently and union.
    Q("q_fd_check",
      (s, dir) => {
        def fd(name: String, lhs: String, rhs: String): DataFrame =
          Tables.orders(s, dir)
            .groupBy(col(lhs))
            .agg(countDistinct(col(rhs)).as("variants"))
            .agg(count(lit(1)).as("lhs_groups"),
              sum(when(col("variants") > 1, 1L).otherwise(0L)).as("violating"),
              max(col("variants")).as("max_variants"))
            .select(lit(name).as("fd"), col("lhs_groups"), col("violating"),
              col("max_variants"),
              (col("violating").cast(DoubleType) /
                col("lhs_groups").cast(DoubleType)).as("violation_rate"))
        fd("o_orderkey->o_custkey", "o_orderkey", "o_custkey")
          .unionByName(fd("o_custkey->o_orderpriority", "o_custkey", "o_orderpriority"))
          .unionByName(fd("o_orderdate->o_orderstatus", "o_orderdate", "o_orderstatus"))
          .orderBy("fd")
      },
      Some("""WITH f1 AS (SELECT o_orderkey AS lhs, COUNT(DISTINCT o_custkey) AS variants
             |        FROM orders GROUP BY 1),
             |f2 AS (SELECT o_custkey AS lhs, COUNT(DISTINCT o_orderpriority) AS variants
             |       FROM orders GROUP BY 1),
             |f3 AS (SELECT o_orderdate AS lhs, COUNT(DISTINCT o_orderstatus) AS variants
             |       FROM orders GROUP BY 1),
             |r AS (
             |  SELECT 'o_orderkey->o_custkey' AS fd, CAST(COUNT(*) AS BIGINT) AS lhs_groups,
             |         CAST(SUM(CASE WHEN variants > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating,
             |         CAST(MAX(variants) AS BIGINT) AS max_variants
             |  FROM f1
             |  UNION ALL
             |  SELECT 'o_custkey->o_orderpriority', CAST(COUNT(*) AS BIGINT),
             |         CAST(SUM(CASE WHEN variants > 1 THEN 1 ELSE 0 END) AS BIGINT),
             |         CAST(MAX(variants) AS BIGINT)
             |  FROM f2
             |  UNION ALL
             |  SELECT 'o_orderdate->o_orderstatus', CAST(COUNT(*) AS BIGINT),
             |         CAST(SUM(CASE WHEN variants > 1 THEN 1 ELSE 0 END) AS BIGINT),
             |         CAST(MAX(variants) AS BIGINT)
             |  FROM f3)
             |SELECT fd, lhs_groups, violating, max_variants,
             |       CAST(violating AS DOUBLE) / CAST(lhs_groups AS DOUBLE) AS violation_rate
             |FROM r ORDER BY fd""".stripMargin)),
  )

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    queries.map(q => q.name -> q.fn).toMap

  def oracleMap: Map[String, String] =
    queries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
