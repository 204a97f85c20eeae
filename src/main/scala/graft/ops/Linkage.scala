package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Probabilistic record linkage in the Fellegi–Sunter shape, with
 * VALUE-SPECIFIC agreement weights made exact-integer so every engine
 * reproduces the scores bit-for-bit.
 *
 * Classic FS sums per-field log-odds ln(m/u) over agreeing fields. The
 * discriminating part of that weight is the u-probability — how likely
 * a RANDOM pair agrees on the value — and its value-specific form is
 * u_v = n_v / N (the value's frequency on the index side): agreeing on
 * a value shared by 3 records out of a million is near-proof, agreeing
 * on one shared by a third of the corpus is noise. This module scores
 * with the monotone transform 1/u_v kept in integer micro-points,
 *   w(field, v) = (1_000_000 × N) div n_v      (0 when disagreeing),
 * so scores are exact BIGINTs (no ln, no doubles — engine-portable and
 * order-independent) while preserving FS ranking within each field.
 * Missing (NULL) values contribute no evidence, per FS convention.
 *
 * Scale shape: candidates come from a BLOCKING equi-join (never
 * all-pairs — the reference point is the deletion-neighborhood blocking
 * of [[Dedup.fuzzyPairs]]); per-field frequency tables are count
 * aggregates joined broadcast (bounded by distinct values; at 100 TB a
 * high-cardinality field's freq join falls back to a shuffle on the
 * value key — same plan, no driver involvement).
 */
object Linkage {

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Jaro-Winkler similarity ([[graft.functions.JaroWinkler]]) — the
    * native codegen comparator for fuzzy-name scoring; RapidFuzz/DuckDB
    * semantics, so oracle comparison needs no rounding tolerance. */
  def jaroWinkler(a: Column, b: Column): Column =
    column(graft.functions.JaroWinkler(expression(a), expression(b)))

  /**
   * Score all blocked candidate pairs of `a` × `b`.
   *
   * @param blockCols columns equal on both sides to form candidates
   * @param fields    comparison fields; each agreement adds the
   *                  value-frequency weight of the B-side value
   * @return (id_a, id_b, score, n_agree, corpus_n) — one row per
   *         candidate pair; callers threshold on `score` (e.g.
   *         `score > 500000 * corpus_n`: agreement evidence rarer
   *         than half the corpus)
   */
  def linkPairs(a: DataFrame, b: DataFrame, idA: String, idB: String,
                blockCols: Seq[String], fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "linkPairs: no comparison fields")
    require(blockCols.nonEmpty, "linkPairs: blocking columns required (never all-pairs)")
    val n = b.agg(count(lit(1)).cast(LongType).as("__N"))
    val aP = a.select((blockCols ++ fields).map(c => col(c).as(s"a_$c"))
      :+ col(idA).as("id_a"): _*)
    val bP = b.select((blockCols ++ fields).map(c => col(c).as(s"b_$c"))
      :+ col(idB).as("id_b"): _*)
    val cands = aP.join(bP,
        blockCols.map(c => col(s"a_$c") === col(s"b_$c")).reduce(_ && _))
      .crossJoin(broadcast(n))
    val withW = fields.foldLeft(cands) { (df, f) =>
      val freq = b.groupBy(col(f).as(s"__v_$f"))
        .agg(count(lit(1)).cast(LongType).as(s"__n_$f"))
      df.join(broadcast(freq), col(s"b_$f") === col(s"__v_$f"), "left")
        .withColumn(s"__w_$f",
          when(col(s"a_$f") === col(s"b_$f"),
            expr(s"(1000000 * __N) div __n_$f")).otherwise(0L))
        .drop(s"__v_$f", s"__n_$f")
    }
    withW.select(col("id_a"), col("id_b"),
      fields.map(f => col(s"__w_$f")).reduce(_ + _).as("score"),
      fields.map(f => when(col(s"__w_$f") > 0, 1).otherwise(0))
        .reduce(_ + _).as("n_agree"),
      col("__N").as("corpus_n"))
  }

  /**
   * Blocked EDIT-DISTANCE pairs — full Levenshtein (arbitrary distance,
   * unlike [[graft.ops.Dedup]]'s ED≤1 deletion-neighborhood fast path),
   * for the "same entity, differently typed" band the ED≤1 trick can't
   * reach. Uses Spark's builtin codegen `levenshtein` (classic unit-cost
   * DP — identical in DuckDB, so pairs oracle-verify exactly).
   *
   * Blocking is MANDATORY: candidates come from an equi-join on
   * `blockCols` (a shuffle hash join at any scale); the quadratic DP
   * runs only within blocks, so cost is Σ block² — the linkage-survey
   * posture, never all-pairs. Each unordered pair appears once
   * (`id_a < id_b`); self-pairs are excluded by the same inequality.
   */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], maxDistance: Int): DataFrame = {
    require(blockCols.nonEmpty,
      "editDistancePairs: blocking columns required (never all-pairs)")
    require(maxDistance >= 1, "editDistancePairs: maxDistance must be >= 1")
    val aP = df.select(blockCols.map(col) :+ col(idCol).as("id_a")
      :+ col(textCol).as("__t_a"): _*)
    val bP = df.select(blockCols.map(col) :+ col(idCol).as("id_b")
      :+ col(textCol).as("__t_b"): _*)
    aP.join(bP, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("distance", levenshtein(col("__t_a"), col("__t_b")))
      .filter(col("distance") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("distance"))
  }

  /** DuckDB mirror of [[editDistancePairs]] — same block equi-join,
    * same builtin DP levenshtein, same `id_a < id_b` dedup. */
  def editDistancePairsSql(rel: String, idCol: String, textCol: String,
                           blockCols: Seq[String], maxDistance: Int): String = {
    val on = blockCols.map(c => s"a.$c = b.$c").mkString(" AND ")
    s"""SELECT a.$idCol AS id_a, b.$idCol AS id_b,
       |  CAST(levenshtein(a.$textCol, b.$textCol) AS INT) AS distance
       |FROM $rel a JOIN $rel b ON $on AND a.$idCol < b.$idCol
       |WHERE levenshtein(a.$textCol, b.$textCol) <= $maxDistance""".stripMargin
  }

  /** American-Soundex letter→code map: vowels + y → 0 (separators,
    * stripped last), h/w → 7 (TRANSPARENT — removed before the
    * adjacent-duplicate collapse, so codes equal across an h/w merge:
    * Ashcraft → A261), consonant classes 1–6. One string so the Spark
    * and DuckDB translates are literally the same literal. */
  val SoundexCodes = "01230127022455012623017202"

  /**
   * AMERICAN SOUNDEX — the classic phonetic blocking key for entity
   * resolution (matches names that sound alike through spelling
   * variation: Robert/Rupert → R163), complementing [[jaroWinkler]]'s
   * pairwise scoring with a BLOCKING key: equal soundex = candidate
   * pair, so ER never goes all-pairs.
   *
   * Exact classic algorithm, engine-portable (no UDF, no regex
   * backreference — RE2 in DuckDB has none): letters → codes via ONE
   * `translate`; h/w (code 7) removed FIRST so they never separate a
   * duplicate pair; adjacent equal codes collapse via an
   * index-vs-previous array filter; the first letter's own code drops
   * (unless the first letter IS h/w — it contributed no code:
   * Washington → W252, White → W300); vowel separators (code 0) strip
   * last; pad/truncate to letter + 3 digits. Empty/non-alpha input →
   * NULL. Pure per-row projection — no shuffle, embarrassingly
   * parallel.
   */
  def soundex(name: Column): Column = {
    val tok = regexp_replace(lower(name), "[^a-z]", "")
    val codes = translate(tok, "abcdefghijklmnopqrstuvwxyz", SoundexCodes)
    val cl1 = filter(split(codes, ""), c => c =!= "7")
    val cl2 = filter(cl1, (c, i) => (i === 0) || (c =!= get(cl1, i - 1)))
    val tail0 = when(substring(codes, 1, 1) === "7", cl2)
      .otherwise(slice(cl2, lit(2), greatest(size(cl2) - 1, lit(0))))
    val digits = filter(tail0, c => c =!= "0")
    when(length(tok) === 0, lit(null).cast("string"))
      .otherwise(concat(upper(substring(tok, 1, 1)),
        rpad(concat_ws("", slice(digits, 1, 3)), 3, "0")))
  }

  /** DuckDB mirror of [[soundex]] as a CTE chain over a relation
    * exposing a `tok` column (staged so the char list isn't inlined
    * into its own dedup lambda twice) — emits CTEs `sx0..sx3`; the
    * final stage exposes `(tok, sx)`. 1-based DuckDB lambda indexes
    * mirror Spark's 0-based ones one-for-one. */
  def soundexCtesSql(rel: String): String =
    s"""sx0 AS (SELECT tok,
       |    translate(regexp_replace(lower(tok), '[^a-z]', '', 'g'),
       |              'abcdefghijklmnopqrstuvwxyz', '$SoundexCodes') AS codes,
       |    regexp_replace(lower(tok), '[^a-z]', '', 'g') AS ctok
       |  FROM $rel),
       |sx1 AS (SELECT tok, ctok, codes,
       |    list_filter(string_split(codes, ''), c -> c <> '7') AS cl1
       |  FROM sx0),
       |sx2 AS (SELECT tok, ctok, codes,
       |    list_filter(cl1, (c, i) -> i = 1 OR c <> cl1[i - 1]) AS cl2
       |  FROM sx1),
       |sx3 AS (SELECT tok,
       |    CASE WHEN ctok = '' THEN NULL
       |         ELSE upper(ctok[1:1]) ||
       |           -- COALESCE: DuckDB array_to_string([]) is NULL where
       |           -- Spark concat_ws gives '' (caught live on 'new')
       |           rpad(COALESCE(array_to_string(list_slice(
       |             list_filter(CASE WHEN codes[1:1] = '7' THEN cl2
       |                              ELSE cl2[2:] END, c -> c <> '0'),
       |             1, 3), ''), ''), 3, '0') END AS sx
       |  FROM sx2)""".stripMargin
}
