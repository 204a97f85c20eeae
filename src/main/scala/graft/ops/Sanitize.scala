package graft.ops

import java.text.Normalizer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dynamic-schema hygiene: column-name sanitization and key
 * normalization, replicating the reference's pandas cleaning rules
 * (reference: pipelines/ativos_financeiro_csv/transformacao.py:38-67)
 * and its key normalization (transforme_stock_silver.py:112).
 *
 * Pure driver-side metadata work (`df.toDF(...)` renames are free in the
 * plan — a Project node, no shuffle, no data movement).
 */
object Sanitize {

  /** transformacao.py:38-67, rule for rule:
    *   1. pandas `Unnamed: N` artifacts → `coluna_extra_<idx>`
    *   2. NFKD-normalize, strip combining accents to ASCII
    *   3. lowercase, trim, inner whitespace runs → `_`
    *   4. strip everything outside `[a-z0-9_]`
    *   5. empty after cleaning → `coluna_sem_nome_<idx>`
    *   6. leading digit → prefix `num_`
    */
  def sanitizeName(raw: String, idx: Int): String = {
    if (raw == null) return s"coluna_sem_nome_$idx"
    if (raw.trim.toLowerCase.startsWith("unnamed")) return s"coluna_extra_$idx"
    val deaccented = Normalizer.normalize(raw, Normalizer.Form.NFKD)
      .replaceAll("\\p{M}+", "")
    var s = deaccented.toLowerCase.trim.replaceAll("\\s+", "_")
    s = s.replaceAll("[^a-z0-9_]", "")
    if (s.isEmpty) s = s"coluna_sem_nome_$idx"
    if (s.head.isDigit) s = s"num_$s"
    s
  }

  /** Sanitize all column names; dedupe collisions with `_<idx>` suffix
    * so the result is always a valid, unique header set. */
  def sanitizeColumns(df: DataFrame): DataFrame = {
    val cleaned = df.columns.zipWithIndex.map { case (c, i) => sanitizeName(c, i) }
    val seen = scala.collection.mutable.Map[String, Int]()
    val unique = cleaned.zipWithIndex.map { case (c, i) =>
      val n = seen.getOrElse(c, 0); seen(c) = n + 1
      if (n == 0) c else s"${c}_$i"
    }
    df.toDF(unique.toIndexedSeq: _*)
  }

  /** Key normalization `upper(trim(x))` (transforme_stock_silver.py:112). */
  def normalizeKey(c: Column): Column = upper(trim(c))
}
