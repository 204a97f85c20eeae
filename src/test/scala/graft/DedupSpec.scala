package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat"),   // near dup of 1
      (4L, "completely different words about spark engines here")
    ).toDF("doc_id", "text")
  }

  test("exactDedup keeps min id and counts copies") {
    val out = Dedup.exactDedup(corpus, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("incrementalExact admits only batch texts unseen in corpus, first id wins") {
    import spark.implicits._
    val committed = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "gamma"),          // new → admitted
      (11L, "alpha"),          // re-crawl of committed text → rejected
      (12L, "delta"), (13L, "delta"), // within-batch dup → min id only
      (14L, "beta")).toDF("doc_id", "text")
    val out = Dedup.incrementalExact(committed, batch, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq((10L, "gamma"), (12L, "delta")))
    // empty corpus: everything admitted (still first-id-wins)
    val out2 = Dedup.incrementalExact(committed.limit(0), batch, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out2 == Seq((10L, "gamma"), (11L, "alpha"), (12L, "delta"), (14L, "beta")))
  }

  test("shingles emits distinct n-grams, skipping too-short docs") {
    import spark.implicits._
    val tiny = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val sh = Dedup.shingles(tiny, "doc_id", "text", 3).collect()
    assert(sh.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "a b c")))
  }

  test("native shingleHashes is hash-identical to the composed formulation") {
    import graft.ops.TextOps
    import spark.implicits._
    val docs = Seq((1L, "the quick  brown fox jumps"), (2L, " a b "), (3L, ""), (4L, "x"))
      .toDF("doc_id", "text")
    // distinct n-gram hashes == xxhash64 over the string shingles
    val native = docs.select(col("doc_id"),
      sort_array(TextOps.shingleHashes(col("text"), 2)).as("h"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val composed = Dedup.shingles(docs, "doc_id", "text", 2)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("h"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(native(1L) == composed(1L) && native(2L) == composed(2L))
    assert(native(3L).isEmpty && native(4L).isEmpty) // < n tokens → empty
    // n=1 non-distinct == per-token xxhash64, frequencies preserved
    val tokNative = docs.filter(col("doc_id") === 1)
      .select(explode(TextOps.shingleHashes(col("text"), 1, distinct = false)).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val tokComposed = docs.filter(col("doc_id") === 1)
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .select(xxhash64(col("t")).as("h")).collect().map(_.getLong(0)).toSeq
    assert(tokNative == tokComposed && tokNative.length == 5)
  }

  test("jaccardPairs finds the hand-computed pair set") {
    // 9-token docs, 3-gram shingles → 7 shingles each.
    // doc1 vs doc2: identical → J = 1.0
    // doc1 vs doc3: differ in the last token → only the final shingle
    // ("the lazy dog/cat") differs → share 6 → J = 6/(7+7-6) = 0.75
    val out = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, minJaccard = 0.5, maxDf = 10)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.length == 3)
    assert(out(0) == ((1L, 2L, 1.0)))
    assert(out(1) == ((1L, 3L, 0.75)))
    assert(out(2) == ((2L, 3L, 0.75)))
  }

  test("containmentPairs flags an embedded snippet that Jaccard misses") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"tok$i").mkString(" ")
    val snippet = (1 to 8).map(i => s"tok$i").mkString(" ") // prefix of `long`
    val docs = Seq((1L, long), (2L, snippet),
      (3L, "unrelated words entirely outside the shared vocabulary space"))
      .toDF("doc_id", "text")
    // snippet: 4 5-gram shingles, all inside long (36 shingles)
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 5, minContainment = 0.9, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(cont.toSeq == Seq((2L, 1L, 1.0)),
      s"only snippet→long, fully contained; got ${cont.toSeq}")
    // the same pair's Jaccard is 4/36 ≈ 0.11 — invisible to a 0.4 gate
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 5, minJaccard = 0.4, maxDf = 10).collect()
    assert(jac.isEmpty, "symmetric Jaccard must miss the embedded snippet")
  }

  test("stop-shingle pruning drops high-df postings") {
    import spark.implicits._
    // 4 docs all sharing one 2-gram "x y"; maxDf=3 excludes it entirely.
    val docs = Seq((1L, "x y a"), (2L, "x y b"), (3L, "x y c"), (4L, "x y d"))
      .toDF("doc_id", "text")
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, minJaccard = 0.1, maxDf = 3)
    assert(out.count() == 0)
  }

  test("contamination flags corpus docs overlapping the benchmark set") {
    import spark.implicits._
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),          // full leak: 2 shared 5-grams
      (11L, "totally unrelated words in this document here")
    ).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, bench, "doc_id", "text", n = 5, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((10L, 1L, 2L)))
  }

  test("connected components merge transitive near-dup chains") {
    import spark.implicits._
    // 1-2, 2-3 (chain → one component), 10-11, and 20-21-22 clique
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comps.toSeq == Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L), (22L, 20L)))
  }

  test("dedupByPairs keeps one representative per component plus unpaired docs") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 99L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByPairs(docs, "doc_id", pairs)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(1L, 10L, 99L)) // min of each component + untouched 99
  }

  test("dedupByPairsKeepBest keeps the highest-scoring member, not min id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "dup text", 2.0), (2L, "dup text", 9.0), (3L, "dup text", 9.0),
      (4L, "solo", 0.5))
      .toDF("doc_id", "text", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b") // transitive chain
    val kept = Dedup.dedupByPairsKeepBest(docs, "doc_id", pairs, "q")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    // component {1,2,3}: max q = 9.0, tie between 2 and 3 → min id 2;
    // unpaired doc 4 survives
    assert(kept.toSeq == Seq((2L, 9.0), (4L, 0.5)), kept.toSeq.toString)
    // min-id policy would have kept doc 1 — the policies provably differ
    val minId = Dedup.dedupByPairs(docs, "doc_id", pairs)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(minId.toSeq == Seq(1L, 4L))
  }

  test("dedupWithProvenance merges member counts and sorted source lists") {
    import spark.implicits._
    val docs = Seq(
      (1L, "dup", "web"), (2L, "dup", "mirror"), (3L, "dup", "web"),
      (4L, "solo", "books"))
      .toDF("doc_id", "text", "source")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.dedupWithProvenance(docs, "doc_id", pairs, Seq("source"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 3L, "mirror,web"), // distinct sources, sorted — audit trail survives
      (4L, 1L, "books")))
  }

  test("native minhash signature is bit-identical to the aggregate formulation") {
    val native = Dedup.minhashSignatures(corpus, "doc_id", "text", n = 3, k = 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val agg = Dedup.minhashSignaturesAgg(corpus, "doc_id", "text", n = 3, k = 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(native == agg && native.size == 4)
  }

  test("portable md5 minhash: native expression == HOF spec; exact dups at est 1.0") {
    val native = Dedup.minhashSignaturesMd5(corpus, "doc_id", "text", n = 3, k = 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val spec = Dedup.minhashSignaturesMd5Spec(corpus, "doc_id", "text", n = 3, k = 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(native == spec && native.size == 4)
    val out = Dedup.minhashLshPairsMd5(corpus, "doc_id", "text",
      n = 3, k = 16, bands = 4, minEstJaccard = 0.9)
      .filter(col("id_a") === 1 && col("id_b") === 2).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 1.0)
    assert(Dedup.minhashLshPairsMd5(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        corpus.schema), "doc_id", "text").count() == 0)
  }

  test("portable md5 simhash: native == HOF spec; empty docs sketch 0; hamming-0 pairs") {
    import spark.implicits._
    val docs = corpus.unionByName(Seq((9L, ""), (10L, "   ")).toDF("doc_id", "text"))
    val native = Dedup.simhashMd5(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val spec = Dedup.simhashMd5Spec(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(native == spec && native.size == 6)
    assert(native(9L) == 0L && native(10L) == 0L)
    assert(native.values.forall(v => v >= 0 && v < (1L << 60)),
      "portable sketch must stay within 60 bits")
    val pairs = Dedup.simhashPairsMd5(docs, "doc_id", "text", maxHamming = 0)
      .filter(col("id_a") === 1 && col("id_b") === 2).collect()
    assert(pairs.length == 1 && pairs.head.getLong(2) == 0L)
  }

  test("minhash LSH surfaces exact duplicates with est_jaccard 1.0") {
    val out = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      n = 3, k = 16, bands = 4, minEstJaccard = 0.9)
      .filter(col("id_a") === 1 && col("id_b") === 2).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 1.0)
  }

  test("dedup operators are total on empty and trivial corpora") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exactDedup(empty, "doc_id", "text").count() == 0)
    assert(Dedup.jaccardPairs(empty, "doc_id", "text", 3, 0.5, 10).count() == 0)
    assert(Dedup.minhashLshPairs(empty, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(empty, "doc_id", "text").count() == 0)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val docs = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(Dedup.dedupByPairs(docs, "doc_id", noPairs).count() == 1)
  }

  test("zero-token docs get sketch 0 and pair up as duplicates") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real words here")).toDF("doc_id", "text")
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sh.length == 3)
    assert(sh(0)._2 == 0L && sh(1)._2 == 0L) // empty docs share sketch 0
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("connectedComponents fails loudly when maxIter is too small") {
    import spark.implicits._
    // a 5-node chain needs ~4 rounds; maxIter=1 must not return quietly
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    assertThrows[IllegalArgumentException](
      Dedup.connectedComponents(chain, maxIter = 1).collect())
  }

  test("connectedComponentsStar: 50-node path closes in O(log n) where min-label cannot") {
    import spark.implicits._
    // a 50-node PATH has diameter 49: min-label needs 49 rounds and
    // provably cannot converge in its default 10 — star contraction
    // must close it inside ITS default (≈ log₂ 50 alternations)
    val path = (1L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assertThrows[IllegalArgumentException](
      Dedup.connectedComponents(path).collect()) // default maxIter = 10
    val star = Dedup.connectedComponentsStar(path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == (1L to 50L).map(_ -> 1L).toMap)
    // mixed shapes in one edge set: a clique {100..104}, a chain
    // {200..230}, a star {300; 301..309}, reversed/duplicated edges,
    // self-loops — labels must equal min-label's (run with enough
    // rounds) on every node
    val clique = for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (b, a)
    val chain = (200L until 230L).map(i => (i + 1, i))
    val hub = (301L to 309L).map(i => (i, 300L))
    val edges = (clique ++ chain ++ hub ++ Seq((100L, 100L), (104L, 100L)))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponentsStar(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ref = Dedup.connectedComponents(edges, maxIter = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == ref, s"star vs min-label: ${got.toSeq.sorted.diff(ref.toSeq.sorted)}")
    // an edge set of only self-loops has no components to report
    assert(Dedup.connectedComponentsStar(
      Seq((7L, 7L)).toDF("id_a", "id_b")).count() == 0)
  }

  test("native simhash sketch is bit-identical to the aggregate formulation") {
    import spark.implicits._
    val docs = corpus.unionByName(Seq((9L, ""), (10L, "   ")).toDF("doc_id", "text"))
    val native = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val agg = Dedup.simhashAgg(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(native == agg && native.size == 6)
  }

  test("simhash of identical docs is identical; pairs found at hamming 0") {
    val sh = Dedup.simhash(corpus, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(sh(0) == sh(1))
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 0)
      .filter(col("id_a") === 1 && col("id_b") === 2).collect()
    assert(pairs.length == 1 && pairs.head.getLong(2) == 0L)
  }

  test("editDistancePairs recalls every ED<=1 class and rejects ED 2") {
    import spark.implicits._
    val rows = Seq(
      (1L, "abc"),  // baseline
      (2L, "abd"),  // substitution of 1
      (3L, "ab"),   // deletion of 1
      (4L, "xabc"), // insertion into 1
      (5L, "abc"),  // exact duplicate of 1
      (6L, "xyz"),  // unrelated
      (7L, "aab"),  // shares deletion variant "ab" with 8 but ED=2 —
      (8L, "aba"))  //   the false positive Levenshtein must kill
      .toDF("id", "name")
    val got = Dedup.editDistancePairs(rows, "id", "name")
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got.contains((1L, 2L, 1)) && got.contains((1L, 3L, 1))
      && got.contains((1L, 4L, 1)) && got.contains((1L, 5L, 0)))
    assert(!got.exists(p => p._1 == 7L && p._2 == 8L), "aab/aba is ED 2")
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L), "xyz matches nothing")
    // symmetric closure: 3 ("ab") is also ED1 from 2 ("abd")? no — ED 2;
    // but 2/5 ("abd"/"abc") and 3/5, 4/5 mirror the baseline's pairs
    assert(got.contains((2L, 5L, 1)) && got.contains((3L, 5L, 1)) && got.contains((4L, 5L, 1)))
  }

  test("hashed-key editDistancePairs is pair-identical to raw-string blocking") {
    import spark.implicits._
    // the 8-byte xxhash64 shuffle key may only ADD candidates (hash
    // collisions), which the exact levenshtein filter kills — so the
    // two forms must return the same pair set, row for row
    val rows = Seq(
      (1L, "abc"), (2L, "abd"), (3L, "ab"), (4L, "xabc"),
      (5L, "abc"), (6L, "xyz"), (7L, "aab"), (8L, "aba"))
      .toDF("id", "name")
    def pairs(hashKey: Boolean) =
      Dedup.editDistancePairs(rows, "id", "name", hashKey)
        .orderBy("id_a", "id_b")
        .select("id_a", "id_b", "name_a", "name_b", "dist")
        .collect().toSeq
    assert(pairs(hashKey = true) == pairs(hashKey = false))
  }

  test("homoglyphGroups catches confusable variants exact dedup misses") {
    import spark.implicits._
    val docs = Seq(
      (1L, "free money now"),
      (2L, "frее mоnеy nоw"),   // Cyrillic е/о — same skeleton as doc 1
      (3L, "FREE Money Now"),   // case variant — skeleton lowercases
      (4L, "free money now"),   // raw-exact copy of 1: same VARIANT, not a new one
      (5L, "совершенно другой"), // genuinely different text, no group
      (6L, "unique doc"))
      .toDF("doc_id", "text")
    val got = Dedup.homoglyphGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // one group: keep doc 1, 4 docs total, 3 DISTINCT raw variants
    assert(got == Seq((1L, 4L, 3L)))
    // raw-exact-only duplicates are NOT homoglyph groups (n_variants = 1)
    val rawOnly = Seq((1L, "same"), (2L, "same")).toDF("doc_id", "text")
    assert(Dedup.homoglyphGroups(rawOnly, "doc_id", "text").count() == 0)
  }

  test("substringSpans merges overlapping dup windows into maximal spans") {
    import spark.implicits._
    // docs 1 and 2 share one verbatim 12-char passage ("SHAREDPASSAGE"
    // minus one char); doc 3 is novel; doc 4 is shorter than k
    val passage = "shared-passage-text"
    val docs = Seq(
      (1L, s"aaaa${passage}bbbb"),
      (2L, s"cccccc${passage}dddd"),
      (3L, "completely novel content here!"),
      (4L, "tiny"))
      .toDF("doc_id", "text")
    val k = 8
    val got = Dedup.substringSpans(docs, "doc_id", "text", k)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every k-window fully inside the passage duplicates; the covered
    // region in doc 1 is exactly the passage (positions 5..23), one
    // maximal span of passage.length chars
    assert(got(0) == ((1L, 1L, passage.length.toLong, (8 + passage.length).toLong)))
    assert(got(1)._3 == passage.length.toLong) // doc 2: same dup_chars
    assert(got(2) == ((3L, 0L, 0L, 30L)))      // novel doc: no spans
    assert(got(3) == ((4L, 0L, 0L, 4L)))       // shorter than k: guarded
    // fraction column: exact division
    val fr = Dedup.substringSpans(docs, "doc_id", "text", k)
      .filter($"doc_id" === 3L).select($"dup_frac").head.getDouble(0)
    assert(fr == 0.0)
  }

  test("incrementalMinhashAdmit: re-crawls rejected, fresh admitted, first-id-wins") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fresh = "one two three four five six seven eight nine ten"
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),   // exact re-crawl → rejected vs corpus
      (11L, fresh),  // genuinely new → admitted
      (12L, fresh),  // batch-duplicate of 11 → rejected (first id wins)
      (13L, "too short")  // no signature → admitted by contract
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalMinhashAdmit(corpus, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(11L, 13L), s"got $out")
  }

  test("minhashIndexMd5Probe equals a plain-Scala drop-one reconstruction from the signatures") {
    // independent audit of the NEW probe-bucket fragment (the
    // mhProbeBkSql twin): rebuild every (band, drop, bucket) key from
    // the signatures with plain list slicing — band b's key omitting
    // slot j is the comma-join of the band's other slots — and demand
    // the operator's rows match exactly
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "red orange yellow green blue indigo violet black white gray"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignaturesMd5(docs, "doc_id", "text", 5, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val want = (for {
      (id, sig) <- sigs.toSeq
      band <- 0 until 4
      drop <- 1 to 4
    } yield {
      val slots = sig.slice(band * 4, band * 4 + 4)
      val key = (slots.take(drop - 1) ++ slots.drop(drop)).mkString(",")
      (id, band, drop, key)
    }).toSet
    val got = Dedup.minhashIndexMd5Probe(docs, "doc_id", "text", 5, 16, 4)
      .select("doc_id", "band", "drop", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(got == want, s"probe keys diverge:\nonly-got ${got -- want}\nonly-want ${want -- got}")
    assert(got.size == sigs.size * 4 * 4, "exactly bands × rows keys per doc")
  }

  test("multi-probe admission rejects a superset and catches borderline near-dups") {
    // drop-one probing can only ADD candidates (a full-band match
    // implies all its drop-one matches), so multi-probe rejections
    // must contain single-probe's; on the planted borderline fixture
    // (every 17th token replaced ⇒ slot agreement ≈ 0.55, right at
    // the est threshold) it must also catch near-dups whose every
    // band differs in exactly one slot — the single-probe blind spot
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("dd_minhash_multiprobe")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(out.forall { case (_, s, m) => !m || s },
      "multi-probe admitted a doc single-probe rejected — superset violated")
    val caught = out.count { case (_, s, m) => s && !m }
    assert(caught >= 5, s"borderline catches only by multi-probe: $caught (measured 10)")
    // the genuinely fresh reversed docs (ids >= 2·off) stay admitted by BOTH
    val off = graft.Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.max("doc_id")).head.getLong(0) + 1
    val fresh = out.filter(_._1 >= 2 * off)
    assert(fresh.nonEmpty && fresh.forall { case (_, s, m) => s && m },
      "a fresh reversed doc was wrongly rejected")
  }

  test("softDedupWeights: each cluster's weights sum to exactly 1 in count terms") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "z"), (6L, "z"))
      .toDF("doc_id", "text")
    val out = Dedup.softDedupWeights(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == (3L, 1.0 / 3.0) && out(2L) == (3L, 1.0 / 3.0))
    assert(out(4L) == (1L, 1.0))
    assert(out(5L) == (2L, 0.5) && out(6L) == (2L, 0.5))
    assert(out.size == 6, "soft dedup DROPS nothing")
  }

  test("ppjoinPairs equals brute-force token-set Jaccard (prefix filter is lossless)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e f"),     // J(1,2) = 5/6
      (3L, "e d c b a"),       // J(1,3) = 1 (order-independent sets)
      (4L, "a b x y z"),       // J(1,4) = 2/8 — below any threshold here
      (5L, "p q r")            // disjoint from 1-4 except nothing
    ).toDF("doc_id", "text")
    val got = Dedup.ppjoinPairs(docs, "doc_id", "text", minJaccard = 0.8)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(got == Seq((1L, 2L, 5.0 / 6.0), (1L, 3L, 1.0), (2L, 3L, 5.0 / 6.0)))
    // brute force over every pair must agree at a looser threshold too
    val tok = docs.select(col("doc_id"), explode(array_distinct(
      graft.ops.TextOps.tokens(col("text")))).as("tok"))
    val n = tok.groupBy("doc_id").count()
    val brute = tok.as("x").join(tok.as("y"),
        col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("sh"))
      .join(n.select(col("doc_id").as("a"), col("count").as("na")), "a")
      .join(n.select(col("doc_id").as("b"), col("count").as("nb")), "b")
      .filter(col("sh") / (col("na") + col("nb") - col("sh")) >= 0.3)
      .select("a", "b").as[(Long, Long)].collect().sorted.toSeq
    val got2 = Dedup.ppjoinPairs(docs, "doc_id", "text", minJaccard = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    assert(got2 == brute)
  }

  test("ppjoinPairs: lossless at exact-integer threshold boundaries (rational bounds)") {
    import spark.implicits._
    // J = 22/(31+31-22) = 22/40 = 0.55 EXACTLY, with t = 0.55 whose
    // double rounds ABOVE the decimal (0.55000000000000004). The r13
    // ceil-of-double alpha ⌈0.55·62/1.55⌉ hit ceil(22.000000000000004)
    // = 23 > 22 and silently dropped this qualifying pair; the integer
    // bound (550·62 + 1549) div 1550 = 22 keeps it.
    val shared = (0 until 22).map(i => s"s$i")
    val a = shared ++ (0 until 9).map(i => s"a$i")   // n_a = 31
    val b = shared ++ (0 until 9).map(i => s"b$i")   // n_b = 31
    val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.ppjoinPairs(docs, "doc_id", "text", minJaccard = 0.55)
      .select("id_a", "id_b", "n_shared").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 22L)),
      s"boundary pair at J=0.55 must survive the pruning bounds, got $got")
    // an arbitrary (non-per-mille) threshold is accepted: the pruning
    // bounds floor to t' = 0.555 ≤ t (looser — lossless), and the
    // final gate applies the caller's exact t, so the J = 0.55 pair
    // is correctly EXCLUDED at t = 0.5554321 …
    assert(Dedup.ppjoinPairs(docs, "doc_id", "text", minJaccard = 0.5554321)
      .count() == 0L)
    // … and correctly KEPT at a runtime-computed t just below it
    assert(Dedup.ppjoinPairs(docs, "doc_id", "text", minJaccard = 1.0 / 1.8182)
      .count() == 1L, "J=0.55 pair must survive t≈0.54999")
    // out-of-range thresholds still fail loudly
    intercept[IllegalArgumentException] {
      Dedup.ppjoinPairs(docs, "doc_id", "text", minJaccard = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dedup.ppjoinPairs(docs, "doc_id", "text", minJaccard = 1.2)
    }
  }

  test("SortedIntersectCount: merge count on sorted arrays, eval and codegen paths") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    def cnt(a: Seq[String], b: Seq[String]): Long =
      Seq((a, b)).toDF("a", "b")
        .select(column(graft.functions.SortedIntersectCount(
          expression(sort_array(col("a"))), expression(sort_array(col("b"))))))
        .as[Long].collect().head
    assert(cnt(Seq("a", "c", "e"), Seq("b", "c", "d", "e")) == 2L)
    assert(cnt(Seq("a"), Seq.empty) == 0L)
    assert(cnt(Seq("x", "y"), Seq("x", "y")) == 2L)
    assert(cnt(Seq("aa", "ab"), Seq("ac")) == 0L)
    // interpreted eval path must agree
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def ad(xs: String*) = ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray)
    assert(graft.functions.SortedIntersectCount.compute(
      ad("a", "c", "e"), ad("b", "c", "d", "e")) == 2L)
  }
}
