package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  private def col1(df: org.apache.spark.sql.DataFrame) = df.collect().head

  test("tokens drops empties from doubled spaces") {
    val r = col1(one("a  b   c").select(TextOps.tokenCount(col("text"))))
    assert(r.getLong(0) == 3L)
  }

  test("stopword count uses the closed set") {
    val r = col1(one("the cat and the hat").select(TextOps.stopwordCount(col("text"))))
    assert(r.getLong(0) == 3L) // the, and, the
  }

  test("sentenceCount splits on terminal punctuation runs, ignoring blanks") {
    val r = col1(one("One two. Three four!! Five?").select(TextOps.sentenceCount(col("text"))))
    assert(r.getLong(0) == 3L)
    // an unterminated fragment still counts as one sentence segment
    assert(col1(one("fragment without end").select(TextOps.sentenceCount(col("text"))))
      .getLong(0) == 1L)
    // pure punctuation yields zero (every segment blank)
    assert(col1(one("...!!!").select(TextOps.sentenceCount(col("text")))).getLong(0) == 0L)
  }

  test("charPairs emits every adjacent character pair in order") {
    val r = col1(one("abcd").select(TextOps.charPairs(col("text"))))
    assert(r.getSeq[String](0) == Seq("ab", "bc", "cd"))
    // 2-char word: exactly one pair; repeated chars count per position
    val rr = col1(one("aaa").select(TextOps.charPairs(col("text"))))
    assert(rr.getSeq[String](0) == Seq("aa", "aa"))
  }

  test("rolling hash matches hand-computed Karp-Rabin") {
    // "abc": ((0*31+97)*31+98)*31+99 mod 1e9+7 = 96354
    val r = col1(one("abc").select(TextOps.rollingHash(col("text"))))
    assert(r.getLong(0) == 96354L)
  }

  test("normalizeNfc composes decomposed accents; ASCII and nulls pass through") {
    import spark.implicits._
    val df = Seq(
      Some("ábc"), // decomposed a + combining acute -> á
      Some("ábc"), // already precomposed
      Some("plain ascii"),
      None: Option[String])
      .toDF("text")
      .select(col("text"), TextOps.normalizeNfc(col("text")).as("nfc"))
    val rows = df.collect().map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(rows(0)._2.contains("ábc")) // composed, 3 codepoints
    assert(rows(1)._2.contains("ábc")) // unchanged
    assert(rows(2)._2.contains("plain ascii"))
    assert(rows(3)._2.isEmpty) // null-safe
    // matches java.text.Normalizer on every row (the executable spec)
    rows.foreach { case (in, out) =>
      assert(out == in.map(s =>
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)))
    }
  }

  test("graft_nfc is SQL-callable after registration") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq("á").toDF("t").createOrReplaceTempView("nfc_in")
    val r = spark.sql("SELECT graft_nfc(t) AS n FROM nfc_in").collect().head.getString(0)
    assert(r == "á")
  }

  test("native rolling hash is bit-identical to the HOF fold on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
      TextOps.rollingHash(col("text")).as("native"),
      TextOps.rollingHashFold(col("text")).as("fold"))
      .filter(col("native") =!= col("fold"))
    assert(diff.count() == 0)
  }

  test("langId picks marker-word argmax with fixed tiebreak") {
    def lang(s: String) =
      col1(one(s).select(TextOps.langId(col("text")))).getString(0)
    assert(lang("the cat is with food") == "en")
    assert(lang("el gato que de la casa") == "es")
    assert(lang("der hund und die katze nicht") == "de")
    assert(lang("le chat et les chiens une") == "fr")
    assert(lang("中文文本") == "zh")
    assert(lang("nothing matches anything") == "en") // all-zero → tiebreak order
  }

  test("bag-of-words fingerprint is token-order insensitive, exact is not") {
    import spark.implicits._
    val df = Seq(("b a", "a b")).toDF("x", "y")
    val r = df.select(
      TextOps.normalizedFingerprint(col("x")) === TextOps.normalizedFingerprint(col("y")),
      TextOps.md5Fingerprint(col("x")) === TextOps.md5Fingerprint(col("y"))).collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("chunkTokens covers every token with the declared overlap") {
    import spark.implicits._
    val df = Seq((7L, (1 to 10).map(i => s"t$i").mkString(" ")), (8L, "")).toDF("doc_id", "text")
    val chunks = graft.ops.TextOps.chunkTokens(df, "doc_id", "text", chunkLen = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
    // empty doc yields no chunks; 10 tokens / stride 3 → starts 0,3,6,9
    assert(chunks.forall(_.getLong(0) == 7L) && chunks.length == 4)
    assert(chunks.map(_.getString(2)).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(chunks.map(_.getLong(3)).toSeq == Seq(4L, 4L, 4L, 1L))
  }

  test("chunkTokens matches slice semantics across boundary sizes") {
    import spark.implicits._
    val sizes = Seq(0, 1, 4, 47, 48, 49, 96, 150)
    val docs = sizes.zipWithIndex
      .map { case (k, i) => (i.toLong, (1 to k).map(j => s"w$j").mkString(" ")) }
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.chunkTokens(docs, "doc_id", "text", chunkLen = 64, stride = 48)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getString(2), r.getLong(3)))).toMap
    sizes.zipWithIndex.foreach { case (k, i) =>
      val toks = (1 to k).map(j => s"w$j")
      val expected = if (k == 0) Seq.empty else (0 until k by 48).map(st => toks.slice(st, st + 64))
      assert(out.keys.count(_._1 == i.toLong) == expected.length, s"doc of $k tokens")
      expected.zipWithIndex.foreach { case (c, ci) =>
        val (txt, n) = out((i.toLong, ci.toLong))
        assert(txt == c.mkString(" ") && n == c.length, s"doc $k chunk $ci")
      }
    }
  }

  test("quality score is bounded in [0,1] and rewards real prose") {
    import spark.implicits._
    val df = Seq("x", "the quick brown fox jumps over the lazy dog and runs on")
      .toDF("text").select(TextOps.qualityScore(col("text")).as("q"))
    val qs = df.collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
    assert(qs(1) > qs(0))
  }

  test("topBigramStats: sorted-run fold equals the explode+groupBy spec") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val fast = TextOps.topBigramStats(docs, "doc_id", "text").orderBy("doc_id").collect()
    val spec = TextOps.topBigramStatsAgg(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(fast.toSeq == spec.toSeq && fast.nonEmpty)
  }

  test("topBigramStats: repeated-phrase doc is flagged by top_frac") {
    val r = TextOps.topBigramStats(
      one("spam spam spam spam spam ok"), "text", "text").collect().head
    // bigrams: 4x "spam spam" + 1x "spam ok" -> top 4 of 5
    assert(r.getAs[Long]("top_cnt") == 4L && r.getAs[Long]("n_bigrams") == 5L)
  }

  test("qualityScore of empty/whitespace docs is exactly 0.0") {
    for (t <- Seq("", "   ")) {
      val r = col1(one(t).select(TextOps.qualityScore(col("text")).as("q")))
      assert(r.getDouble(0) == 0.0, s"'$t' scored ${r.getDouble(0)}")
    }
    // cross-engine spot values (DuckDB replay of qualityScoreSql agrees)
    val cat = col1(one("the cat").select(TextOps.qualityScore(col("text")).as("q")))
    assert(math.abs(cat.getDouble(0) - 0.616) < 1e-9)
  }

  test("bigramsOf is total on empty and single-token docs") {
    for (t <- Seq("", "one")) {
      val r = col1(one(t).select(TextOps.bigramsOf(TextOps.tokens(col("text"))).as("bg")))
      assert(r.getSeq[String](0).isEmpty, s"'$t' produced bigrams")
    }
  }

  // ------------------------------------------------------------- BPE

  /** Driver-side replicate of the engine's merge rule: BpePasses
    * leftmost non-overlapping replaces over the padded string. */
  private def applyMergeRef(sp: String, pair: String): String = {
    var e = s" $sp "
    for (_ <- 1 to TextOps.BpePasses)
      e = e.replace(s" $pair ", s" ${pair.replace(" ", "")} ")
    e.trim
  }

  private def bpeTrainRef(words: Map[String, Long], k: Int): Seq[String] = {
    var vt = words.toSeq.map { case (w, f) => (w.toSeq.mkString(" "), f) }
    (1 to k).map { _ =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((sp, f) <- vt; Array(a, b) <- sp.split(" ").sliding(2))
        counts(s"$a $b") = counts.getOrElse(s"$a $b", 0L) + f
      val (pair, _) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      vt = vt.map { case (sp, f) => (applyMergeRef(sp, pair), f) }
      pair
    }
  }

  test("spacedChars spaces every character and round-trips") {
    val r = col1(one("hello").select(TextOps.spacedChars(col("text"))))
    assert(r.getString(0) == "h e l l o")
  }

  test("applyMergeLit reaches the replace fixpoint on same-symbol runs") {
    // " a a a a " needs a second pass: pass 1 leaves "aa a a"
    val r = col1(one("a a a a").select(TextOps.applyMergeLit(col("text"), "a a")))
    assert(r.getString(0) == "aa aa")
    assert(applyMergeRef("a a a a", "a a") == "aa aa")
    // odd run: one symbol survives unmerged
    val r3 = col1(one("a a a").select(TextOps.applyMergeLit(col("text"), "a a")))
    assert(r3.getString(0) == "aa a")
  }

  test("bpeTrain matches a driver-side reference on a classic corpus") {
    import spark.implicits._
    // the textbook BPE corpus (low/lower/newest/widest), frequencies
    // encoded by repetition
    val docs = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = docs.map(w => w).toDF("text")
    val got = TextOps.bpeTrain(df, "text", 5).map(_._2)
    val want = bpeTrainRef(docs.groupBy(identity).map { case (w, g) => w -> g.size.toLong }, 5)
    assert(got == want, s"got $got, want $want")
  }

  test("bpeEncodeTokens applies merges in rank order; out-of-range tokens pass through") {
    val merges = Seq("e s", "es t", "l o")
    val enc = col1(one("newest x lo").select(
      TextOps.bpeEncodeTokens(col("text"), merges).as("e")))
    assert(enc.getSeq[String](0) == Seq("n e w est", "x", "lo"))
  }

  test("spanCorrupt: sentinel numbering, short docs, round-trip token counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),  // 10 tokens -> masks pos 5, 10
      (2L, "one two three"),        // shorter than every=5: untouched
      (3L, "")).toDF("doc_id", "text")
    val got = TextOps.spanCorrupt(docs, "doc_id", "text", every = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got(0) == ((1L, "a b c d <X_1> f g h i <X_2>", "<X_1> e <X_2> j", 2L)))
    assert(got(1) == ((2L, "one two three", "", 0L)))
    assert(got(2) == ((3L, "", "", 0L)))
    // input + target together carry every original token exactly once
    val in0 = got(0)._2.split(" ").filterNot(_.startsWith("<X_"))
    val tg0 = got(0)._3.split(" ").filterNot(_.startsWith("<X_"))
    assert((in0 ++ tg0).sorted.toSeq == "a b c d e f g h i j".split(" ").sorted.toSeq)
  }

  /** Driver-side winnowing reference: md5-prefix gram keys, window
    * minima, distinct — the exact algorithm [[TextOps.winnow]] claims. */
  private def winnowRef(text: String, k: Int, w: Int): Set[(String, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(p: Int): String = {
      val g = text.substring(p - 1, p - 1 + k)
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.take(8) + "@" + f"$p%07d"
    }
    val npos = math.max(text.length - (k - 1), 0)
    if (npos == 0) return Set.empty
    val starts = 1 to math.max(npos - (w - 1), 1)
    starts.map { t =>
      val fp = (t to math.min(t + w - 1, npos)).map(key).min
      val Array(h, p) = fp.split("@")
      (h, p.toLong)
    }.toSet
  }

  test("winnow matches the driver-side reference fingerprint set exactly") {
    import spark.implicits._
    val texts = Seq(
      (1L, "abcdefgabcdefg repeated structure here"),
      (2L, "zzzzzzzzzz"), // degenerate: all grams identical
      (3L, "short"),      // len == k: one truncated window
      (4L, "abc"))        // len < k: no grams at all
    val out = TextOps.winnow(texts.toDF("doc_id", "text"), "doc_id", "text",
        k = 5, w = 4).collect()
      .map(r => (r.getLong(0), (r.getString(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    texts.foreach { case (id, t) =>
      val expect = winnowRef(t, 5, 4)
      assert(out.getOrElse(id, Set.empty) == expect, s"doc $id")
    }
    assert(!out.contains(4L)) // sub-k docs have no fingerprints
  }

  test("winnow guarantee: a shared substring of length >= k+w-1 shares a fingerprint") {
    import spark.implicits._
    val shared = "THE-COMMON-RUN!!" // 16 chars >= 5+4-1
    val docs = Seq(
      (1L, s"left padding junk $shared and a tail"),
      (2L, s"$shared completely different remainder xyz")).toDF("doc_id", "text")
    val fps = TextOps.winnow(docs, "doc_id", "text", k = 5, w = 4)
      .select("doc_id", "fp_hash").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val a = fps.filter(_._1 == 1L).map(_._2).toSet
    val b = fps.filter(_._1 == 2L).map(_._2).toSet
    assert(a.intersect(b).nonEmpty,
      "winnowing guarantee violated: no shared fingerprint hash")
  }

  test("winnow density: at most one fingerprint per window, at least one overall") {
    import spark.implicits._
    val doc = Seq((1L, "a regular document with plenty of distinct grams inside"))
      .toDF("doc_id", "text")
    val n = TextOps.winnow(doc, "doc_id", "text", k = 5, w = 4).count()
    val len = "a regular document with plenty of distinct grams inside".length
    val windows = (len - 4) - 3 // npos - (w-1)
    assert(n >= 1 && n <= windows)
  }

  test("ngramNovelty attributes each gram to its first (lowest-id) document") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // grams "a b c","b c d" — both novel: 2/2
      (2L, "a b c x"),   // "a b c" seen in 1, "b c x" new: 1/2
      (3L, "a b c d"),   // both seen: 0/2
      (4L, "q r")        // < 3 tokens → dropped entirely
    ).toDF("doc_id", "text")
    val out = TextOps.ngramNovelty(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0)))
  }

  test("vocabGrowth: first-occurrence attribution, cumulative volume per milestone") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "a d")).toDF("doc_id", "text")
    val out = TextOps.vocabGrowth(docs, "doc_id", "text", Seq(1L, 2L, 3L))
      .orderBy("milestone").collect()
      .map(r => (r.getAs[Long]("milestone"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("vocab_size")))
    assert(out.toSeq == Seq((1L, 2L, 2L), (2L, 4L, 3L), (3L, 6L, 4L)))
    intercept[IllegalArgumentException] {
      TextOps.vocabGrowth(docs, "doc_id", "text", Seq(3L, 1L))
    }
  }

  test("lexicalProfile: hand-computed tokens/types/hapax/dis and ratios") {
    import spark.implicits._
    // source s: tokens (a a b | b c) -> 5 tokens, 3 types,
    // counts a=2 b=2 c=1 -> hapax 1, dis 2, TTR 0.6, hapax_ratio 1/3
    val docs = Seq(("s", "a a b"), ("s", "b c")).toDF("source", "text")
    val r = TextOps.lexicalProfile(docs, "source", "text").collect().head
    assert(r.getAs[Long]("n_tokens") == 5L && r.getAs[Long]("n_types") == 3L)
    assert(r.getAs[Long]("hapax") == 1L && r.getAs[Long]("dis_legomena") == 2L)
    assert(r.getAs[Double]("type_token_ratio") == 0.6)
    assert(r.getAs[Double]("hapax_ratio") == 1.0 / 3.0)
  }
}
