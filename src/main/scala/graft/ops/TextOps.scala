package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Text-analysis operators for training-data pipelines: tokenization,
 * quality scoring, language identification, and content fingerprints.
 * These generalize the reference's string-normalization surface
 * (transforme_stock_silver.py:112, transformacao.py:38-67) to document
 * corpora.
 *
 * All functions are pure Column expressions (codegen'd builtins +
 * higher-order functions) — no UDFs, so whole-stage codegen spans the
 * full pipeline and the operators scale embarrassingly parallel with
 * zero shuffles.
 */
object TextOps {

  /** Whitespace tokenization; empties from doubled spaces dropped so
    * downstream counts are stable. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  def tokenCount(text: Column): Column = tokenCountOf(tokens(text))

  private def tokenCountOf(toks: Column): Column = size(toks).cast(LongType)

  /** DuckDB mirror of [[tokens]]: `list_filter(string_split(x,' '), t -> len(t)>0)`. */
  def tokensSql(col: String): String =
    s"list_filter(string_split($col, ' '), t -> len(t) > 0)"

  /** BPE-ish pre-tokenization: letter runs, digit runs, and single
    * non-alphanumeric marks — the GPT-2-style split shape that
    * approximates subword token counts without a vocab. The pattern
    * stays in the Java∩RE2 common subset so the DuckDB oracle matches. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast(LongType)

  def bpeishTokenCountSql(col: String): String =
    s"CAST(len(regexp_extract_all($col, '$BpeishPattern')) AS BIGINT)"

  /** Sentence count: non-blank segments between terminal-punctuation
    * runs (`[.!?]+`) — the denominator of mean-words-per-sentence, the
    * Gopher-style quality signal a token-level pass cannot see (spam
    * and boilerplate skew short; OCR noise skews absurdly long). The
    * regex stays in the Java∩RE2 common subset so the DuckDB oracle
    * splits identically. Pure projection — codegen'd, no shuffle. */
  def sentenceCount(text: Column): Column =
    size(filter(split(text, "[.!?]+"), s => length(trim(s)) > 0)).cast(LongType)

  /** DuckDB mirror of [[sentenceCount]]. */
  def sentenceCountSql(col: String): String =
    s"CAST(len(list_filter(string_split_regex($col, '[.!?]+'), s -> len(trim(s)) > 0)) AS BIGINT)"

  /** Adjacent character pairs of one token — the merge-candidate
    * generator for BPE vocabulary induction: training's first step
    * counts every adjacent symbol pair across the corpus and merges the
    * most frequent. Tokens shorter than 2 chars have no pairs (callers
    * filter them BEFORE exploding: `sequence(1, 0)` would descend).
    * A pure projection (sequence+transform over the token), so corpus-
    * wide pair counting is explode → keyed aggregate with map-side
    * combine — one narrow shuffle of (pair, partial count). */
  def charPairs(word: Column): Column =
    transform(sequence(lit(1), char_length(word) - 1),
      i => word.substr(i, lit(2)))

  /** DuckDB mirror of [[charPairs]] (`range(1, n)` is end-exclusive —
    * the same 1..n-1 starts as Spark's inclusive `sequence(1, n-1)`). */
  def charPairsSql(w: String): String =
    s"list_transform(range(1, length($w)), i -> substr($w, CAST(i AS INT), 2))"

  // ---------------------------------------------------------------- BPE

  /** Leftmost-replace passes per merge application: enough for any
    * ≤[[BpeMaxWordLen]]-symbol word to reach the replace fixpoint (each
    * pass merges every non-overlapping occurrence left to right; a
    * missed overlap needs one further pass, and a 16-symbol word has
    * ≤ 15 pairs, halving per pass). Shared by the Spark expressions
    * and the SQL mirror so both engines apply merges IDENTICALLY. */
  val BpePasses = 5
  val BpeMinWordLen = 2
  val BpeMaxWordLen = 16

  /** Word → spaced symbol string (`hello` → `h e l l o`): the working
    * representation of BPE vocabulary induction — symbols are space-
    * separated so a merge is a literal string replace. */
  def spacedChars(w: Column): Column =
    trim(regexp_replace(w, "(.)", "$1 "))

  /** DuckDB mirror of [[spacedChars]]. */
  def spacedCharsSql(w: String): String =
    s"trim(regexp_replace($w, '(.)', '\\1 ', 'g'))"

  /** Apply ONE merge (`"a b"` → symbol `"ab"`) exhaustively to a spaced
    * symbol string: [[BpePasses]] leftmost non-overlapping literal
    * replaces over the space-padded string. This iterated-replace rule
    * is the engine-portable variant of greedy BPE application — on
    * runs of ≥4 identical symbols it can pick different (equally
    * frequent) occurrences than the left-to-right rescanning merge HF
    * tokenizers use, but it is deterministic and bit-identical in any
    * engine with leftmost `replace` semantics, which is what makes the
    * trained merge table and the encoded corpus oracle-verifiable. */
  def applyMergeLit(sp: Column, pair: String): Column = {
    val merged = pair.replace(" ", "")
    var e: Column = concat(lit(" "), sp, lit(" "))
    for (_ <- 1 to BpePasses)
      e = replace(e, lit(s" $pair "), lit(s" $merged "))
    trim(e)
  }

  /** SQL mirror of [[applyMergeLit]] with the pair as an EXPRESSION
    * (the oracle derives merges in-query, so pairs are CTE columns). */
  def applyMergeSql(sp: String, pr: String): String = {
    var e = s"' ' || $sp || ' '"
    for (_ <- 1 to BpePasses)
      e = s"replace($e, ' ' || $pr || ' ', ' ' || replace($pr, ' ', '') || ' ')"
    s"trim($e)"
  }

  /** Adjacent symbol pairs of a spaced string, as `"a b"` pair keys.
    * Single-symbol strings (fully merged words) yield an EMPTY array —
    * guarded explicitly because Spark's `sequence(0, -1)` descends
    * (the charPairs trap), which would emit null pairs. */
  def symbolPairs(sp: Column): Column = {
    val a = split(sp, " ")
    when(size(a) >= 2,
      transform(sequence(lit(0), size(a) - 2),
        j => concat(get(a, j), lit(" "), get(a, j + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** DuckDB mirror of [[symbolPairs]] (1-based lists; `range` end-
    * exclusive — the same n−1 pairs). */
  def symbolPairsSql(sp: String): String =
    s"list_transform(range(1, len(string_split($sp, ' '))), " +
      s"j -> string_split($sp, ' ')[j] || ' ' || string_split($sp, ' ')[j + 1])"

  /**
   * BPE vocabulary induction, word-frequency-table shaped — the way
   * industrial trainers (HuggingFace tokenizers, SentencePiece-BPE)
   * actually scale: the 100 TB corpus is touched ONCE (explode →
   * word-count aggregate, one narrow shuffle of (word, partial count));
   * every merge iteration then runs on the distinct-WORD table, whose
   * size is corpus-sublinear (Heaps' law) and independent of corpus
   * row count. Each of the `numMerges` iterations is one pair-count
   * aggregate + a 1-row top-1 collect (the driver-held-scalar pattern
   * of the watermark reads, SURVEY §2.5 A1) + one pure-projection
   * merge application; generations are cached and materialized so
   * lineage stays one hop.
   *
   * Words outside [[BpeMinWordLen]]..[[BpeMaxWordLen]] chars are
   * excluded from TRAINING (single chars have no pairs; overlong
   * tokens are pre-tokenizer noise — the standard length cap) but
   * still encode fine (they pass through unmerged / partially merged).
   * Tie-break: highest count, then lexicographically smallest pair —
   * total, engine-independent order.
   *
   * Returns the learned merges in application order: (rank, pair,
   * count-at-selection).
   */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int): Seq[(Int, String, Long)] = {
    require(numMerges >= 1, s"bpeTrain: numMerges must be >= 1, got $numMerges")
    val words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(char_length(col("w")).between(BpeMinWordLen, BpeMaxWordLen))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var vt = words.select(spacedChars(col("w")).as("sp"), col("freq")).cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    try {
      for (i <- 1 to numMerges) {
        val top = vt.select(explode(symbolPairs(col("sp"))).as("pr"), col("freq"))
          .groupBy("pr").agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("pr")).limit(1).collect()
        require(top.nonEmpty, s"bpeTrain: corpus exhausted after ${i - 1} merges")
        val pair = top(0).getString(0)
        merges += ((i, pair, top(0).getLong(1)))
        val next = vt.select(applyMergeLit(col("sp"), pair).as("sp"), col("freq")).cache()
        next.count() // materialize before dropping the parent generation
        vt.unpersist()
        vt = next
      }
    } finally vt.unpersist()
    merges.toSeq
  }

  /** Encode a document with a trained merge list: every token spaced,
    * each merge applied in rank order — a PURE projection (the merges
    * ride the plan as literals), so corpus-wide encoding is an
    * embarrassingly parallel map with zero shuffles: the property that
    * makes tokenizing 100 TB a single scan. Returns the per-token
    * encoded symbol strings as an array column. */
  def bpeEncodeTokens(text: Column, merges: Seq[String]): Column =
    transform(tokens(text),
      t => merges.foldLeft(spacedChars(t))((sp, pr) => applyMergeLit(sp, pr)))

  /** Small closed-class stopword set (shared with the SQL oracle). */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  def stopwordCount(text: Column): Column = stopwordCountOf(tokens(text))

  private def stopwordCountOf(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(Stopwords))).cast(LongType)

  def stopwordCountSql(col: String): String = {
    val set = Stopwords.map(s => s"'$s'").mkString(", ")
    s"CAST(len(list_filter(${tokensSql(col)}, t -> t IN ($set))) AS BIGINT)"
  }

  /** Heuristic quality score in [0,1]: penalizes very short docs,
    * rewards moderate mean token length and stopword presence —
    * the shape of the C4/Gopher-style length+stopword filters. All
    * scalar double arithmetic → bit-identical across engines. */
  def qualityScore(text: Column): Column = qualityScoreOf(text, tokens(text))

  private def qualityScoreOf(text: Column, toks: Column): Column = {
    // Zero-token docs score an explicit 0.0 — both the pre-guard form
    // (NULL-skipping least() quietly yielded 0.45) and a bare nullif
    // guard (least(NULL,1)=1 inflated it to 0.85!) gave empty docs a
    // nonsense nonzero quality. The divisions still use the nullif'd
    // denominator so Spark's NULL and DuckDB's Infinity (ieee default)
    // can never diverge on the guarded branch.
    val rawTok = tokenCountOf(toks).cast(DoubleType)
    val nTok = nullif(rawTok, lit(0.0))
    val nChars = length(text).cast(DoubleType)
    val meanLen = nChars / nTok
    val stopRatio = stopwordCountOf(toks).cast(DoubleType) / nTok
    val lenScore = least(rawTok / lit(50.0), lit(1.0))
    val shapeScore = when(meanLen >= 3 && meanLen <= 10, lit(1.0)).otherwise(lit(0.5))
    val stopScore = least(stopRatio * lit(5.0), lit(1.0))
    when(rawTok === 0.0, lit(0.0)).otherwise(
      lenScore * lit(0.4) + shapeScore * lit(0.3) + stopScore * lit(0.3))
  }

  def qualityScoreSql(col: String): String = {
    val rawTok = s"CAST(len(${tokensSql(col)}) AS DOUBLE)"
    val nTok = s"nullif($rawTok, 0)"
    val meanLen = s"(CAST(length($col) AS DOUBLE) / $nTok)"
    s"""(CASE WHEN $rawTok = 0 THEN 0.0 ELSE
       |   least($rawTok / 50.0, 1.0) * 0.4
       | + (CASE WHEN $meanLen >= 3 AND $meanLen <= 10 THEN 1.0 ELSE 0.5 END) * 0.3
       | + least((CAST(${stopwordCountSql(col)} AS DOUBLE) / $nTok) * 5.0, 1.0) * 0.3 END)""".stripMargin
  }

  /** Marker-word language ID (n-gram-free heuristic): CJK chars → zh,
    * else argmax of per-language function-word hits with the fixed
    * tiebreak order en > es > de > fr. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "los", "de", "que"),
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  def langId(text: Column): Column = langIdOf(text, tokens(text))

  private def langIdOf(text: Column, toks: Column): Column = {
    def hits(ws: Seq[String]) = size(filter(toks, t => t.isInCollection(ws)))
    val Seq(en, es, de, fr) = LangMarkers.map { case (_, ws) => hits(ws) }
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  def langIdSql(col: String): String = {
    def hits(ws: Seq[String]) = {
      val set = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(${tokensSql(col)}, t -> t IN ($set)))"
    }
    val Seq(en, es, de, fr) = LangMarkers.map { case (_, ws) => hits(ws) }
    s"""CASE WHEN regexp_matches($col, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |     WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
       |     WHEN $es >= $de AND $es >= $fr THEN 'es'
       |     WHEN $de >= $fr THEN 'de'
       |     ELSE 'fr' END""".stripMargin
  }

  /** Word bigrams of a token array (n=2 shingles, duplicates KEPT —
    * repetition measurement needs the multiset, unlike [[Dedup.shingles]]).
    * Guarded for < 2 tokens: sequence(1, size-1) would run DESCENDING
    * through index 0 and element_at(_, 0) throws in Spark. */
  def bigramsOf(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))

  def bigramsSql(col: String): String =
    s"list_transform(range(1, len(${tokensSql(col)})), i -> ${tokensSql(col)}[i] || ' ' || ${tokensSql(col)}[i+1])"

  /** POSITIONAL agreement of two token-array columns in exact integer
    * ppm: count of positions i where q[i] = c[i], over
    * max(len(q), len(c)) — the unmatched tail of the longer doc counts
    * against the score, and the GREATEST(·,1) clamp pins two empty
    * docs to 0 in any engine. ORDER-SENSITIVE where set/bag Jaccard is
    * not: a same-vocabulary shuffle scores near 0, only a true copy
    * reaches 1e6 — the cross-encoder-style pairwise scorer for rerank
    * stages whose candidates share a saturated vocabulary (the
    * eval_retrieval_slices `long`-slice lesson). Zero shuffle: one
    * codegen'd zip_with fold per pair. Takes column NAMES (the repo's
    * exact-integer `div` rides a SQL expr). */
  def positionalAgreementPpm(qToks: String, cToks: String): Column =
    expr(s"CAST(aggregate(zip_with($qToks, $cToks," +
      s" (a, b) -> IF(a = b, CAST(1 AS BIGINT), CAST(0 AS BIGINT)))," +
      s" CAST(0 AS BIGINT), (acc, x) -> acc + x) * 1000000" +
      s" div GREATEST(GREATEST(size($qToks), size($cToks)), 1) AS BIGINT)")

  /** DuckDB twin of [[positionalAgreementPpm]] — positions past the
    * shorter doc can never match, so the mirror counts over
    * range(1, min_len + 1) with the same max-length denominator. */
  def positionalAgreementPpmSql(q: String, c: String): String =
    s"CAST(len(list_filter(range(1, LEAST(len($q), len($c)) + 1)," +
      s" i -> $q[i] = $c[i])) * 1000000" +
      s" // GREATEST(len($q), len($c), 1) AS BIGINT)"

  /**
   * Gopher-style repetition stats: the fraction of all word bigrams
   * taken by the single most frequent bigram (docs dominated by one
   * repeated phrase are boilerplate/spam — "top-2-gram fraction" in the
   * Gopher/DataComp filter family).
   *
   * Shape: the per-doc mode never needs a cross-row aggregate — sort
   * the doc's bigram array and take the longest equal run in ONE
   * `aggregate` fold. The whole stat block is a zero-shuffle
   * projection (the explode+groupBy spec below measured 5 s at sf0.1;
   * this runs with the scan). Works at any scale because state is one
   * (prev, run, best) struct per row.
   */
  def topBigramStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenize ONCE in its own projection (same rationale as textStats)
    val toks = col("__toks")
    val sorted = array_sort(bigramsOf(toks))
    val zero = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("best"))
    val folded = aggregate(sorted, zero, (acc, x) => {
      val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(1L)
      struct(x.as("prev"), run.as("run"),
        greatest(acc.getField("best"), run).as("best"))
    })
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .where(size(toks) >= 2)
      .select(col(idCol),
        folded.getField("best").as("top_cnt"),
        (size(toks) - 1).cast(LongType).as("n_bigrams"))
      .withColumn("top_frac",
        col("top_cnt").cast(DoubleType) / col("n_bigrams").cast(DoubleType))
  }

  /** Executable spec for [[topBigramStats]]: explode + two-level
    * aggregate (per-(doc,bigram) counts, then per-doc max/sum).
    * TextOpsSpec asserts parity — do NOT remove. */
  private[graft] def topBigramStatsAgg(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val bg = docs.where(size(toks) >= 2)
      .select(col(idCol), explode(bigramsOf(toks)).as("bg"))
    bg.groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(max(col("c")).as("top_cnt"), sum(col("c")).as("n_bigrams"))
      .select(col(idCol), col("top_cnt"), col("n_bigrams"),
        (col("top_cnt").cast(DoubleType) / col("n_bigrams").cast(DoubleType)).as("top_frac"))
  }

  /** Context-length truncation: keep the first `maxTokens` tokens
    * (the standard pre-tokenizer cap before expensive BPE). */
  def truncateTokens(text: Column, maxTokens: Int): Column =
    array_join(slice(tokens(text), 1, maxTokens), " ")

  /**
   * T5-style SPAN CORRUPTION pair construction: every `every`-th token
   * (1-based positions divisible by `every`) is replaced by an
   * incrementing sentinel `<X_k>` in the model INPUT, and the TARGET
   * is the sentinel-prefixed sequence of the removed tokens — the
   * denoising objective's (input, target) example, built as a pure
   * zero-shuffle projection (one tokenize, three array HOFs) that
   * scales with the scan. Documents shorter than `every` tokens yield
   * an uncorrupted input and an empty target — never dropped, so the
   * example count is stable under length filtering decisions made
   * elsewhere. Deterministic: positions, not randomness, choose the
   * spans (auditable corpora re-generate bit-identically; swap the
   * position rule for a salted hash to approximate i.i.d. masking).
   */
  def spanCorrupt(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, every: Int = 5): org.apache.spark.sql.DataFrame = {
    require(every >= 2, s"spanCorrupt: every must be >= 2, got $every")
    val base = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val sentinel = (p: Column) =>
      concat(lit("<X_"), (p / lit(every)).cast("int").cast("string"), lit(">"))
    val input = concat_ws(" ", transform(col("__toks"), (t, i0) =>
      when((i0 + 1) % every === 0, sentinel(i0 + 1)).otherwise(t)))
    val masked = filter(
      transform(col("__toks"), (t, i0) => struct((i0 + 1).as("p"), t.as("t"))),
      s => s("p") % every === 0)
    val target = concat_ws(" ",
      transform(masked, s => concat(sentinel(s("p")), lit(" "), s("t"))))
    base.select(col(idCol), input.as("input_text"), target.as("target_text"),
      size(masked).cast(LongType).as("n_masked"))
  }

  /** DuckDB mirror of [[spanCorrupt]] (its lambda index is 1-based
    * where Spark's is 0-based — aligned here). */
  def spanCorruptSql(col: String, every: Int): (String, String, String) = {
    val sent = (p: String) => s"'<X_' || CAST($p // $every AS VARCHAR) || '>'"
    val toks = tokensSql(col)
    (s"array_to_string(list_transform($toks, (t, i) -> " +
      s"CASE WHEN i % $every = 0 THEN ${sent("i")} ELSE t END), ' ')",
      s"array_to_string(list_transform(list_filter(list_transform($toks, " +
        s"(t, i) -> {'p': i, 't': t}), s -> s.p % $every = 0), " +
        s"s -> ${sent("s.p")} || ' ' || s.t), ' ')",
      s"CAST(len(list_filter($toks, (t, i) -> i % $every = 0)) AS BIGINT)")
  }

  def truncateTokensSql(col: String, maxTokens: Int): String =
    s"array_to_string(list_slice(${tokensSql(col)}, 1, $maxTokens), ' ')"

  /** Overlapping token-window chunking: split each document into
    * training-context chunks of `chunkLen` tokens, one starting every
    * `stride` tokens (overlap = chunkLen - stride) — the standard
    * long-document treatment before sequence packing. The chunk array
    * is built in ONE expression over a pre-projected token column and
    * exploded once; per-chunk work is array slicing, never
    * re-tokenization (see Dedup.jaccardPairs for why computing derived
    * values beside an explode is a trap). Zero shuffles. */
  def chunkTokens(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                  chunkLen: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
    val chunks = transform(
      sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(stride)),
      st => struct(
        array_join(slice(col("__toks"), st + 1, lit(chunkLen)), " ").as("chunk_text"),
        least(lit(chunkLen), size(col("__toks")) - st).cast(LongType).as("n_chunk_tokens")))
    base.select(col(idCol), posexplode(chunks).as(Seq("pos", "c")))
      .select(col(idCol), col("pos").cast(LongType).as("chunk_id"),
        col("c.chunk_text").as("chunk_text"), col("c.n_chunk_tokens").as("n_chunk_tokens"))
  }

  /** Word n-gram shingle xxhash64 values in one compiled pass
    * ([[graft.functions.WordShingleHashes]]): the dedup-family front
    * end (Jaccard postings, MinHash input, SimHash token votes).
    * Hash-identical to `xxhash64(array_join(slice(tokens,...)))`. */
  /** Corpus-level BOILERPLATE LINE removal (C4's global form of line
    * dedup, beyond the per-document stats of the dup-lines operator):
    * a line appearing in at least `minDocs` DISTINCT documents —
    * navigation chrome, cookie banners, license footers — is removed
    * from EVERY document, and each survivor document is reassembled in
    * original line order. Documents left with zero lines drop out
    * (C4's behavior).
    *
    * Scale shape: explode to (doc, pos, line) — one pass; the
    * boilerplate set is ONE map-side-combined count-distinct keyed on
    * the line (its cardinality is the distinct-line count, and the
    * SELECTED set is small by construction — boilerplate is what
    * repeats); removal is a left-anti equi-join on the line;
    * reassembly is one keyed aggregate whose per-group state is the
    * document's own lines (bounded by document length, never corpus
    * size). No window over the corpus, no driver reads. */
  def removeBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                             minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"removeBoilerplateLines: minDocs must be >= 2, got $minDocs")
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val boiler = lines.groupBy(col("__line"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__line"))
    lines.join(boiler, Seq("__line"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws("\n",
        expr("transform(array_sort(collect_list(struct(__pos, __line))), x -> x.__line)"))
        .as(textCol))
  }

  def shingleHashes(text: Column, n: Int, distinct: Boolean = true): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.WordShingleHashes(Bridge.expression(text), n, distinct))
  }

  /** Content fingerprint: exact (md5 of raw text) and token-order-
    * insensitive (md5 of sorted token list) — the bag-of-words
    * canonical form used for near-exact dedup. */
  def md5Fingerprint(text: Column): Column = md5(text)

  def normalizedFingerprint(text: Column): Column =
    md5(array_join(array_sort(tokens(text)), " "))

  /** Per-document stat block over ONE shared tokenization: the token
    * array is projected once in its own SELECT (expensive aliases
    * referenced many times don't collapse into the consumer, so it is
    * materialized per row, not per use) and every stat derives from it.
    * Expression trees over the tokens are identical to the
    * single-column APIs above — same values, ~⅒ the split/filter work. */
  def textStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = col("__toks")
    docs.select(col(idCol), col(textCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        tokenCountOf(toks).as("n_tokens"),
        bpeishTokenCount(col(textCol)).as("n_bpe"),
        stopwordCountOf(toks).as("n_stop"),
        qualityScoreOf(col(textCol), toks).as("quality"),
        langIdOf(col(textCol), toks).as("lang_guess"),
        md5(col(textCol)).as("fp_exact"),
        md5(array_join(array_sort(toks), " ")).as("fp_bag"),
        rollingHash(col(textCol)).as("roll_hash"))
  }

  /** Karp–Rabin rolling polynomial hash over characters, mod 1e9+7 —
    * exact BIGINT arithmetic, reproducible in any engine. Runs as the
    * native codegen'd [[graft.functions.RollingHash]]; the fold below
    * is the executable spec (TextOpsSpec asserts bit-parity). */
  val RollMod = 1000000007L

  def rollingHash(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.RollingHash(Bridge.expression(text)))
  }

  private[graft] def rollingHashFold(text: Column): Column =
    aggregate(
      filter(split(text, ""), c => length(c) > 0),
      lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + ascii(ch).cast(LongType), lit(RollMod)))

  def rollingHashSql(col: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(list_filter(string_split($col, ''), c -> len(c) > 0),
       |                   c -> CAST(unicode(c) AS BIGINT))),
       |  (acc, ch) -> (acc * 31 + ch) % ${RollMod})""".stripMargin

  /** Unicode NFC canonical composition (native codegen'd
    * [[graft.functions.NormalizeNfc]]) — decomposed and precomposed
    * forms must fingerprint identically before dedup. DuckDB mirror:
    * `nfc_normalize` (same Unicode canonical composition). */
  def normalizeNfc(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.NormalizeNfc(Bridge.expression(text)))
  }

  def normalizeNfcSql(col: String): String = s"nfc_normalize($col)"

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03):
    * hash every character k-gram, slide a w-gram window, keep each
    * window's minimal hash — the MOSS document-fingerprint scheme. Any
    * substring of length ≥ k + w − 1 shared by two documents shares at
    * least one fingerprint (the guarantee threshold), while the
    * expected density is only 2/(w+1) of the grams — the right
    * selectivity knob between exact-hash dedup and full shingle sets.
    *
    * Engine-portable determinism: a gram "hash" is its md5-hex 8-char
    * prefix COMPARED AS A STRING (min = lexicographic min — no hex
    * parse, the samp_* rank-key rule), disambiguated by appending the
    * zero-padded gram position, so each window selects exactly one
    * (hash, pos) winner in any engine. Short documents (fewer than w
    * full windows) winnow their whole gram list as one window instead
    * of fingerprinting nothing.
    *
    * Scale shape: one explode to (id, pos, key) — 8+1+7 chars per gram,
    * the gram TEXT never leaves its partition (the dd_substring_spans
    * rule) — one per-doc window min over a (pos)-sorted partition, one
    * distinct. Returns (idCol, fp, fp_hash, fp_pos). */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
             k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"winnow: bad (k=$k, w=$w)")
    import org.apache.spark.sql.expressions.Window
    val npos = greatest(length(col(textCol)) - lit(k - 1), lit(0))
    val keyed = docs
      .select(col(idCol), col(textCol), npos.as("__n"),
        explode(when(npos >= 1, sequence(lit(1), npos))
          .otherwise(array())).as("__p"))
      .select(col(idCol), col("__n"), col("__p"),
        concat(
          substring(md5(col(textCol).substr(col("__p"), lit(k))), 1, 8),
          lit("@"), lpad(col("__p").cast("string"), 7, "0")).as("__key"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("__p"))
      .rowsBetween(Window.currentRow, w - 1)
    keyed
      .withColumn("__fp", min(col("__key")).over(win))
      // full windows only — except short docs, whose single truncated
      // window (start 1) stands in for the whole gram list
      .filter(col("__p") <= greatest(col("__n") - lit(w - 1), lit(1)))
      .select(col(idCol), col("__fp").as("fp"))
      .distinct()
      .select(col(idCol), col("fp"),
        substring(col("fp"), 1, 8).as("fp_hash"),
        substring(col("fp"), 10, 7).cast(LongType).as("fp_pos"))
  }

  /** DuckDB mirror of [[winnow]] as a `WITH`-fragment producing
    * relation `wfp(doc_id, fp)` from `documents`. */
  def winnowSql(k: Int = 5, w: Int = 4): String =
    s"""wg AS (
       |  SELECT doc_id, p,
       |         concat(substr(md5(substr(text, CAST(p AS INTEGER), $k)), 1, 8),
       |                '@', lpad(CAST(p AS VARCHAR), 7, '0')) AS key0,
       |         GREATEST(length(text) - ${k - 1}, 0) AS npos
       |  FROM (SELECT doc_id, text,
       |               unnest(range(1, GREATEST(length(text) - ${k - 1}, 0) + 1)) AS p
       |        FROM documents)),
       |wmin AS (
       |  SELECT doc_id, p, npos,
       |         MIN(key0) OVER (PARTITION BY doc_id ORDER BY p
       |                         ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp
       |  FROM wg),
       |wfp AS (SELECT DISTINCT doc_id, fp FROM wmin
       |        WHERE p <= GREATEST(npos - ${w - 1}, 1))""".stripMargin

  /**
   * Corpus-trained bigram language-model scoring — the CCNet-style
   * fluency screen: score every document by the add-one-smoothed
   * bigram probabilities of its own text under counts trained on the
   * WHOLE corpus, p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V). Documents whose
   * word sequences are unusual for the corpus (boilerplate, shuffled
   * spam, wrong-language fragments) score low and can be filtered —
   * the shape of the perplexity filter production pipelines run with
   * a KenLM model, with the model here trained in-engine by two keyed
   * counts.
   *
   * Determinism: no ln() (libm-banned; the classic log-perplexity is a
   * monotone transform of nothing we need — ranking and thresholding
   * work on raw probabilities), each bigram's double probability is
   * floor-scaled to integer MICRO-POINTS, and the per-doc total is an
   * exact BIGINT sum — order-independent under any partitioning. The
   * per-doc mean divides two exact integers once (correctly-rounded
   * IEEE ÷).
   *
   * Scale shape: ONE tokenization feeds both the bigram stream and the
   * unigram counts; c₂/c₁ are map-side-combined keyed aggregates; the
   * scoring join shuffles on bigram/unigram keys (both bounded by
   * vocabulary², not corpus size); V is one broadcast scalar row. No
   * driver collects, no windows.
   *
   * Returns `(doc_id, n_bigrams, pts_total, avg_pts)` — `avg_pts` is
   * mean micro-probability (≈ 10⁶/perplexity per bigram).
   */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
    val bg = tok.select(col("doc_id"), explode(bigramsOf(col("t"))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val c2 = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
    val uni = tok.select(explode(col("t")).as("w1"))
    val c1 = uni.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = c1.agg(count(lit(1)).as("v"))
    val p = (col("c2") + 1).cast(DoubleType) / (col("c1") + col("v")).cast(DoubleType)
    bg.join(c2, Seq("bg"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), floor(p * lit(1e6)).cast(LongType).as("pts"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("pts").as("pts_total"))
      .withColumn("avg_pts",
        col("pts_total").cast(DoubleType) / col("n_bigrams").cast(DoubleType))
  }

  /** DuckDB mirror of [[bigramLmScore]] over `docsRel(doc_id, text)`. */
  def bigramLmScoreSql(docsRel: String): String =
    s"""WITH tok AS (SELECT doc_id, ${tokensSql("text")} AS t FROM $docsRel),
       |bgr AS (SELECT doc_id,
       |          unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bg
       |        FROM tok),
       |bgw AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bgr),
       |c2 AS (SELECT bg, count(*) AS c2 FROM bgw GROUP BY 1),
       |uni AS (SELECT unnest(t) AS w1 FROM tok),
       |c1 AS (SELECT w1, count(*) AS c1 FROM uni GROUP BY 1),
       |v AS (SELECT count(*) AS v FROM c1),
       |pts AS (SELECT doc_id,
       |          CAST(floor((CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)) * 1000000.0)
       |               AS BIGINT) AS pts
       |        FROM bgw JOIN c2 USING (bg) JOIN c1 USING (w1) CROSS JOIN v)
       |SELECT doc_id, count(*) AS n_bigrams, CAST(SUM(pts) AS BIGINT) AS pts_total,
       |       CAST(SUM(pts) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_pts
       |FROM pts GROUP BY 1""".stripMargin

  /**
   * INTERPOLATED KNESER-NEY bigram LM scoring — the upgrade from
   * [[bigramLmScore]]'s add-one smoothing to the smoothing real LM
   * filters use (KenLM's default; Kneser & Ney '95): the backoff mass
   * goes to each word's CONTINUATION probability (how many distinct
   * contexts it follows), not its raw frequency — the "San Francisco"
   * fix ("Francisco" is frequent but follows only "San", so it gets
   * almost no backoff mass).
   *
   *   P(w₂|w₁) = (c₂ − D)/c₁ + D·N₁₊(w₁·)/c₁ · N₁₊(·w₂)/N₂₂
   *
   * where c₁ = Σ_w c(w₁·w) is the bigram-PREFIX count (not the raw
   * unigram frequency — doc-final tokens start no bigram), so each
   * context's probabilities sum to exactly 1.
   *
   * with discount D = 3/4 as an EXACT RATIONAL: multiplying through
   * by 4·c₁·N₂₂ makes every scored bigram's probability
   *   [(4c₂ − 3)·N₂₂ + 3·N₁₊(w₁·)·N₁₊(·w₂)] / (4·c₁·N₂₂)
   * — integer numerator and denominator, micro-points via integer
   * division, NO double arithmetic anywhere before the per-doc mean.
   * Numerator products ride DECIMAL(38,0)/HUGEINT (c₂·N₂₂ passes 2⁶³
   * once corpus bigrams do). Only observed bigrams are scored (c₂ ≥ 1,
   * so c₂ − D > 0 — unseen-bigram backoff costs a second lookup join
   * and belongs to a serving path, not a corpus scorer).
   *
   * Scale shape: one tokenization feeds everything; c₂/c₁ and both
   * continuation counts are map-side-combined keyed aggregates over
   * the (vocabulary-bounded) distinct-bigram table; N₂₂ is one
   * broadcast scalar. Returns `(doc_id, n_bigrams, pts_total,
   * avg_pts)` — same consumer shape as [[bigramLmScore]].
   */
  def kneserNeyScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val tok = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
    val bg = tok.select(col("doc_id"), explode(bigramsOf(col("t"))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
    val c2 = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
    // c₁ is the BIGRAM-PREFIX count Σ_w c(w₁·w), NOT the raw unigram
    // frequency: doc-final occurrences of w₁ start no bigram, and
    // counting them would inflate the denominator so per-context
    // probabilities no longer sum to 1 — with the prefix count,
    // Σ_{w} P(w|w₁) = (c₁ − D·N₁₊(w₁·))/c₁ + D·N₁₊(w₁·)/c₁ · 1 = 1
    // exactly, the interpolated-KN identity KenLM normalizes to.
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val distinctBg = bg.select("bg", "w1", "w2").distinct()
    val n1f = distinctBg.groupBy("w1").agg(count(lit(1)).as("n1f")) // N₁₊(w₁·)
    val n1p = distinctBg.groupBy(col("w2")).agg(count(lit(1)).as("n1p")) // N₁₊(·w₂)
    val nbb = distinctBg.agg(count(lit(1)).as("nbb"))
    val num = ((lit(4) * col("c2") - 3).cast(dec38) * col("nbb").cast(dec38) +
      lit(3).cast(dec38) * col("n1f").cast(dec38) * col("n1p").cast(dec38))
    val den = (lit(4).cast(dec38) * col("c1").cast(dec38) * col("nbb").cast(dec38))
    bg.join(c2, Seq("bg"))
      .join(c1, Seq("w1"))
      .join(n1f, Seq("w1"))
      .join(n1p, Seq("w2"))
      .crossJoin(broadcast(nbb))
      .select(col("doc_id"), num.as("__num"), den.as("__den"))
      .selectExpr("doc_id",
        "CAST((__num * 1000000) div __den AS BIGINT) AS pts")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("pts").as("pts_total"))
      .withColumn("avg_pts",
        col("pts_total").cast(DoubleType) / col("n_bigrams").cast(DoubleType))
  }

  /** DuckDB mirror of [[kneserNeyScore]] over `docsRel(doc_id, text)`
    * — same counts, same exact-rational micro points via HUGEINT `//`. */
  def kneserNeyScoreSql(docsRel: String): String =
    s"""WITH tok AS (SELECT doc_id, ${tokensSql("text")} AS t FROM $docsRel),
       |bgr AS (SELECT doc_id,
       |          unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bg
       |        FROM tok),
       |bgw AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1,
       |               string_split(bg, ' ')[2] AS w2 FROM bgr),
       |c2 AS (SELECT bg, count(*) AS c2 FROM bgw GROUP BY 1),
       |c1 AS (SELECT w1, count(*) AS c1 FROM bgw GROUP BY 1),
       |dbg AS (SELECT DISTINCT bg, w1, w2 FROM bgw),
       |n1f AS (SELECT w1, count(*) AS n1f FROM dbg GROUP BY 1),
       |n1p AS (SELECT w2, count(*) AS n1p FROM dbg GROUP BY 1),
       |nbb AS (SELECT CAST(count(*) AS HUGEINT) AS nbb FROM dbg),
       |pts AS (SELECT doc_id,
       |          CAST((((4 * CAST(c2 AS HUGEINT) - 3) * nbb
       |                 + 3 * CAST(n1f AS HUGEINT) * n1p) * 1000000)
       |               // (4 * CAST(c1 AS HUGEINT) * nbb) AS BIGINT) AS pts
       |        FROM bgw JOIN c2 USING (bg) JOIN c1 USING (w1)
       |             JOIN n1f USING (w1) JOIN n1p USING (w2) CROSS JOIN nbb)
       |SELECT doc_id, count(*) AS n_bigrams, CAST(SUM(pts) AS BIGINT) AS pts_total,
       |       CAST(SUM(pts) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_pts
       |FROM pts GROUP BY 1""".stripMargin

  /**
   * Windowed co-occurrence with LN-FREE lift — the word-association /
   * embedding-prep statistic (the counts word2vec's sampling and PMI
   * tables are built from): directional pairs (w, v) with v at
   * distance 1..maxDist after w, scored by
   * `lift = (T · c_wv) / (c_w · c_v)` — exp(PMI), same ranking, no
   * libm log. All counts exact integers from keyed aggregates; the
   * products ride DECIMAL(38)/HUGEINT (corpus² overflows BIGINT at
   * scale); lift is ONE double division.
   *
   * Scale shape: the pair stream is `maxDist` projections of the
   * token stream (positions are array indexes — no self-join of the
   * corpus, the pair explode is per-doc-local); pair/unigram counts
   * are map-side-combined keyed aggregates bounded by vocabulary², not
   * corpus size. Returns `(pair, n_pair, n_left, n_right, lift)`.
   */
  def cooccurrence(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"cooccurrence: maxDist=$maxDist")
    val dec = (c: Column) => c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val tok = docs.select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
    val pairs = tok.select(explode(flatten(transform(
        sequence(lit(1), lit(maxDist)),
        d => zip_with(col("__t"), slice(col("__t"), d + 1, size(col("__t"))),
          (a, b) => concat(a, lit(" "), b))))).as("pair"))
      .filter(col("pair").isNotNull)
    val pc = pairs.groupBy("pair").agg(count(lit(1)).as("n_pair"))
      .withColumn("w", split(col("pair"), " ").getItem(0))
      .withColumn("v", split(col("pair"), " ").getItem(1))
    val uni = tok.select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")).as("t"))
    pc.join(uni.select(col("w"), col("c").as("n_left")), Seq("w"))
      .join(uni.select(col("w").as("v"), col("c").as("n_right")), Seq("v"))
      .crossJoin(broadcast(tot))
      .select(col("pair"), col("n_pair"), col("n_left"), col("n_right"),
        ((dec(col("t")) * dec(col("n_pair"))).cast(org.apache.spark.sql.types.DoubleType)
          / (dec(col("n_left")) * dec(col("n_right")))
            .cast(org.apache.spark.sql.types.DoubleType)).as("lift"))
  }

  /**
   * LEXICAL corpus profile per key — tokens, types (distinct tokens),
   * hapax/dis legomena (frequency-1 and -2 types), type-token ratio,
   * and hapax share: the Zipf-tail health check a corpus-curation pass
   * reads before trusting token counts (boilerplate collapses TTR;
   * synthetic/templated text starves the hapax tail; OCR noise
   * inflates it). One explode → one keyed (key, token) count with
   * map-side combine → one per-key rollup of the count-of-counts;
   * state is vocabulary-sized, never corpus-sized. Counts exact;
   * the two ratios are fixed-arity double divisions.
   */
  def lexicalProfile(docs: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val tc = docs
      .select(col(keyCol), explode(tokens(col(textCol))).as("__tok"))
      .groupBy(col(keyCol), col("__tok"))
      .agg(count(lit(1)).as("__c"))
    tc.groupBy(col(keyCol))
      .agg(sum("__c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("__c") === 2, 1L).otherwise(0L)).as("dis_legomena"))
      .select(col(keyCol), col("n_tokens"), col("n_types"),
        col("hapax"), col("dis_legomena"),
        (col("n_types").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_tokens").cast(org.apache.spark.sql.types.DoubleType))
          .as("type_token_ratio"),
        (col("hapax").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_types").cast(org.apache.spark.sql.types.DoubleType))
          .as("hapax_ratio"))
  }

  /** DuckDB mirror of [[lexicalProfile]] — same tokenize/count/rollup. */
  def lexicalProfileSql(rel: String, keyCol: String, textCol: String): String =
    s"""WITH tok AS (SELECT $keyCol, unnest(${tokensSql(textCol)}) AS t FROM $rel),
       |tc AS (SELECT $keyCol, t, count(*) AS c FROM tok GROUP BY 1, 2)
       |SELECT $keyCol, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |  CAST(count(*) AS BIGINT) AS n_types,
       |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis_legomena,
       |  CAST(count(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS type_token_ratio,
       |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS hapax_ratio
       |FROM tc GROUP BY 1""".stripMargin

  /**
   * VOCABULARY GROWTH curve (Heaps' law) — cumulative distinct-token
   * count after each doc-id milestone: the corpus-health curve whose
   * flattening says "more of the same" (templated/duplicated intake)
   * and whose unusual steepness says OCR noise. NO per-milestone
   * recompute: each token's FIRST document (one min(doc_id) aggregate,
   * the [[ngramNovelty]] trick) makes vocab(m) = #{tokens: first ≤ m}
   * — milestones fan out over a broadcast literal table, so k
   * milestones cost one aggregate, not k scans. Also reports
   * cumulative token volume per milestone (the Heaps x-axis), exact.
   */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  milestones: Seq[Long]): DataFrame = {
    require(milestones.nonEmpty && milestones == milestones.sorted,
      s"vocabGrowth: milestones must be non-empty ascending, got $milestones")
    val tok = docs.select(col(idCol).as("__id"),
      explode(tokens(col(textCol))).as("__tok"))
    val first = tok.groupBy("__tok").agg(min("__id").as("__first"))
    val vols = docs.select(col(idCol).as("__id"),
      size(tokens(col(textCol))).cast(LongType).as("__n"))
    val ms = docs.sparkSession.createDataFrame(milestones.map(Tuple1(_)))
      .toDF("milestone")
    val vocab = first.crossJoin(broadcast(ms))
      .filter(col("__first") <= col("milestone"))
      .groupBy("milestone").agg(count(lit(1)).as("vocab_size"))
    val volume = vols.crossJoin(broadcast(ms))
      .filter(col("__id") <= col("milestone"))
      .groupBy("milestone").agg(sum("__n").as("n_tokens"))
    volume.join(vocab, Seq("milestone"), "left")
      .withColumn("vocab_size", coalesce(col("vocab_size"), lit(0L)))
  }

  /** DuckDB mirror of [[vocabGrowth]]. */
  def vocabGrowthSql(rel: String, idCol: String, textCol: String,
                     milestones: Seq[Long]): String = {
    val ms = milestones.map(m => s"($m)").mkString(", ")
    s"""WITH tok AS (SELECT $idCol AS id, unnest(${tokensSql(textCol)}) AS t FROM $rel),
       |first AS (SELECT t, MIN(id) AS f FROM tok GROUP BY 1),
       |vols AS (SELECT $idCol AS id, CAST(len(${tokensSql(textCol)}) AS BIGINT) AS n
       |  FROM $rel),
       |ms(milestone) AS (VALUES $ms),
       |vocab AS (SELECT milestone, CAST(count(*) AS BIGINT) AS vocab_size
       |  FROM first, ms WHERE f <= milestone GROUP BY 1),
       |volume AS (SELECT milestone, CAST(SUM(n) AS BIGINT) AS n_tokens
       |  FROM vols, ms WHERE id <= milestone GROUP BY 1)
       |SELECT volume.milestone AS milestone, n_tokens,
       |  COALESCE(vocab_size, 0) AS vocab_size
       |FROM volume LEFT JOIN vocab ON volume.milestone = vocab.milestone""".stripMargin
  }

  /**
   * Per-document n-gram NOVELTY: the fraction of a document's distinct
   * token n-grams never seen in any lower-id document — the
   * contribution-scoring pass a curriculum/data-mixing pipeline runs
   * to rank candidate documents by how much genuinely new text they
   * add (the complement of the near-dup view: not "is this a copy"
   * but "how much of it is new"). First-occurrence attribution is
   * one `min(doc_id)` aggregate keyed by gram — no per-pair work at
   * all, so unlike pairwise dedup this is strictly linear in the
   * exploded gram count. At 100 TB you'd group on a 64-bit gram hash
   * to keep the shuffle narrow; raw gram strings keep the DuckDB
   * oracle engine-portable here.
   * Output: `(docId, n_grams, n_novel, novelty)` per doc with ≥ n tokens.
   */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    require(n >= 1, s"ngramNovelty: n=$n")
    val grams = docs
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col(idCol), explode(array_distinct(
        transform(sequence(lit(1), size(col("__t")) - (n - 1)),
          i => concat_ws(" ", slice(col("__t"), i, lit(n)))))).as("gram"))
    val first = grams.groupBy(col("gram")).agg(min(col(idCol)).as("__first"))
    grams.join(first, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_grams").cast(org.apache.spark.sql.types.DoubleType))
  }
}
