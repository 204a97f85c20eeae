package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Deduplication operators for training-data pipelines, in increasing
 * fuzziness: exact (hash group-by), n-gram Jaccard (posting-list
 * self-join), MinHash+LSH (banded signatures), SimHash (bit sketches).
 *
 * Scale design notes (the whole point of these operators is 100 TB):
 *  - exact dedup is one hash-aggregate shuffle on the text (or its md5,
 *    which is what you'd group by at scale to keep shuffle rows narrow);
 *  - Jaccard pair generation self-joins shingle posting lists; postings
 *    with document frequency > `maxDf` ("stop shingles") are dropped
 *    first, which bounds the per-shingle pair blowup at df², the classic
 *    trick that keeps candidate generation near-linear;
 *  - MinHash/LSH replaces the all-pairs problem with band-bucket joins:
 *    k hash slots in b bands; only same-bucket docs meet, so cost tracks
 *    true-duplicate density rather than corpus size²;
 *  - SimHash packs a document into one 64-bit sketch; banded 16-bit
 *    chunks make Hamming-≤k candidate search a 4-way equi-join.
 *
 * Everything is expressions + joins — no UDFs, no driver-side loops.
 */
object Dedup {

  /** Exact dedup: deterministic representative (min id) per distinct
    * text + duplicate count. One shuffle, map-side partial agg. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col(textCol), col("n_copies"))

  /** SOFT dedup: instead of dropping duplicates, every member of an
    * exact-duplicate cluster keeps a sampling weight 1/n — the corpus
    * still contributes each distinct text with total mass 1, but no
    * arbitrary keep-choice is made (the reweighting used when
    * duplicates carry signal, e.g. popularity, that hard dedup would
    * erase). One hash aggregate + one equi-join back on the text key;
    * the weight is a single correctly-rounded division, so outputs
    * hash-match across engines. Returns every row + `(cluster_n,
    * weight)`. */
  def softDedupWeights(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sizes = docs.groupBy(col(textCol)).agg(count(lit(1)).as("cluster_n"))
    docs.join(sizes, Seq(textCol))
      .select(col(idCol), col("cluster_n"),
        (lit(1.0) / col("cluster_n").cast(DoubleType)).as("weight"))
  }

  /** Unicode confusables commonly abused to evade text filters: the
    * Cyrillic and Greek characters visually identical to Latin (left)
    * and their Latin skeleton (right). A SUBSET of Unicode TR39's
    * confusable table — the high-frequency spam set, kept 1:1 so a
    * plain `translate` (same semantics in every engine) applies it. */
  val ConfusablesFrom = "аеорсхуіјѕԁοαε"
  val ConfusablesTo = "aeopcxyijsdoae"

  /** Homoglyph skeleton of a text: lowercase, confusables folded to
    * Latin. Texts equal under the skeleton but DIFFERENT raw are the
    * signature of confusable-substitution spam. */
  def skeleton(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    translate(lower(c), ConfusablesFrom, ConfusablesTo)

  /**
   * Homoglyph-variant dedup: group documents by their confusable
   * skeleton and report every group whose members are NOT raw-equal —
   * the duplicates only the skeleton can see (exact dedup keys on the
   * raw bytes; shingle/minhash signatures shatter because every
   * substituted character breaks its shingles). Two-level aggregate:
   * (skeleton, raw text) counts first, then per-skeleton roll-up — so
   * no distinct-aggregate Expand ever touches corpus-sized data, and
   * both shuffles are hash-keyed on text (md5-narrow them at 100 TB,
   * like [[exactDedup]]).
   */
  def homoglyphGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), col(textCol), skeleton(col(textCol)).as("__sk"))
      .groupBy(col("__sk"), col(textCol))
      .agg(min(col(idCol)).as("__min_id"), count(lit(1)).as("__n"))
      .groupBy(col("__sk"))
      .agg(min(col("__min_id")).as("keep_id"), sum(col("__n")).as("n_docs"),
        count(lit(1)).as("n_variants"))
      .filter(col("n_variants") > 1)
      .select(col("keep_id"), col("n_docs"), col("n_variants"))

  /** Incremental (continuous-ingestion) exact dedup: admit only the
    * `batch` documents whose text appears neither in the already-
    * committed `corpus` nor EARLIER in the batch itself (first id wins
    * within the batch — deterministic). This is the shape a corpus that
    * grows daily actually needs: dedup cost must track the BATCH, never
    * re-scan the corpus' text.
    *
    * Scale shape: the corpus contributes only `xxhash64(text)` — 8
    * bytes per committed document through the shuffle, no corpus text
    * ever moves (at 100 TB the hash set is ~1000× smaller than the
    * corpus and can also be maintained incrementally as its own
    * warehouse table). The batch side is one groupBy (first-id-wins)
    * plus one LEFT ANTI join keyed on the hash. A 64-bit collision
    * would drop a genuinely-new document with probability ≈ n²/2⁶⁵ —
    * the standard trade (see [[jaccardPairs]]); swap in a 128-bit
    * concat of two seeded hashes if a stricter bound is required. */
  def incrementalExact(corpus: DataFrame, batch: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val firsts = batch.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col(textCol))
    val seen = corpus.select(xxhash64(col(textCol)).as("__seen_h")).distinct()
    firsts.join(seen, xxhash64(col(textCol)) === col("__seen_h"), "left_anti")
  }

  /** Distinct word n-gram shingles per doc: (id, shingle). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs.where(size(toks) >= n)
      .select(col(idCol),
        explode(array_distinct(
          transform(sequence(lit(0), size(toks) - n),
            i => array_join(slice(toks, i + 1, lit(n)), " ")))).as("shingle"))
  }

  /**
   * Candidate near-duplicate pairs by n-gram Jaccard ≥ `minJaccard`.
   * Shingle postings with df > `maxDf` are dropped before the
   * self-join (stop-shingle pruning).
   *
   * Scale shape — several shuffles, every one keyed on 8-byte longs:
   * shingles are xxhash64'd before any aggregation, so no shuffle ever
   * carries shingle text. Per-doc counts and document frequencies are
   * separate narrow count-aggregates (df computed FIRST so posting
   * lists stay bounded — see body comments), and the two denominator
   * joins land on the already-pruned, small pair table. A 64-bit
   * collision merging two distinct shingles corpus-wide is ~q²/2⁶⁵
   * (≈1e-7 at a billion distinct shingles) — the standard trade every
   * large-scale shingling pipeline makes.
   */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, minJaccard: Double, maxDf: Int): DataFrame =
    sharedShingleCounts(docs, idCol, textCol, n, maxDf)
      .withColumn("jaccard",
        col("n_shared").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_shared")).cast(DoubleType))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("jaccard"))

  /**
   * Directed CONTAINMENT near-dup pairs: `|A∩B| / |A| ≥ minContainment`
   * emits "A is contained in B" — the asymmetric complement of
   * [[jaccardPairs]]. Symmetric Jaccard structurally misses the
   * quote-expansion / boilerplate-wrapper case (a short doc fully
   * embedded in a much longer one has Jaccard ≈ |A|/|B| → 0 while its
   * containment is ≈ 1), and containment is the statistic corpus
   * pipelines actually dedup subsumed documents with. Same posting-
   * list machinery and stop-shingle pruning as Jaccard — one extra
   * projection (both directions of each undirected pair), no extra
   * shuffle. Output: `(contained_id, container_id, n_shared,
   * containment)`.
   */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, minContainment: Double, maxDf: Int): DataFrame =
    sharedShingleCounts(docs, idCol, textCol, n, maxDf)
      .select(col("n_shared"), explode(array(
        struct(col("id_a").as("contained_id"), col("id_b").as("container_id"),
          (col("n_shared").cast(DoubleType) / col("n_a").cast(DoubleType)).as("containment")),
        struct(col("id_b").as("contained_id"), col("id_a").as("container_id"),
          (col("n_shared").cast(DoubleType) / col("n_b").cast(DoubleType)).as("containment"))))
        .as("d"))
      .select(col("d.contained_id"), col("d.container_id"), col("n_shared"),
        col("d.containment"))
      .filter(col("containment") >= minContainment)

  /**
   * Provenance-preserving dedup: like [[dedupByPairs]] (one min-id
   * representative per component) but each survivor CARRIES its
   * component's merged attribute values — `n_members` plus, per
   * requested attribute, the sorted distinct values joined with ','.
   * The licensing/audit requirement dedup usually destroys: when a
   * document existed on three sources under two licenses, the kept
   * copy must say so, or the training-set audit trail is gone the
   * moment the duplicates are.
   *
   * Deterministic output: `collect_set` order is partition-dependent,
   * so values pass through `sort_array` before joining — the string is
   * identical under any partitioning (and engine-identical for the
   * oracle). One component-keyed aggregate over the labeled docs.
   */
  def dedupWithProvenance(docs: DataFrame, idCol: String, pairs: DataFrame,
                          attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "dedupWithProvenance: no attribute columns given")
    val comps = connectedComponents(pairs)
      .select(col("id").as(idCol), col("component"))
    val labeled = docs.join(comps, Seq(idCol), "left")
      .withColumn("__comp", coalesce(col("component"), col(idCol)))
    labeled.groupBy(col("__comp"))
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).as("n_members") +:
          attrCols.map(a =>
            array_join(sort_array(collect_set(col(a))), ",").as(s"${a}s")): _*)
      .drop("__comp")
  }

  /** Shared core of [[jaccardPairs]] and [[containmentPairs]]: candidate
    * pairs with shared-shingle counts and both docs' shingle totals —
    * `(id_a, id_b, n_shared, n_a, n_b)` with `id_a < id_b`. */
  private def sharedShingleCounts(docs: DataFrame, idCol: String, textCol: String,
                                  n: Int, maxDf: Int): DataFrame = {
    // Every shuffle after the explode moves only 8-byte longs. The
    // hashed shingle stream feeds THREE consumers (per-doc counts,
    // df counts, the semi-joined posting collect), so the compiled
    // scan+shingle pass re-executes per consumer — at cluster scale
    // persist postingRows between them; the re-run stage is the
    // cheapest in the plan. The denominators come from a separate
    // narrow count-aggregate JOINED back onto the (pruned, small)
    // pair table — computing size(arr) alongside explode(arr) is a
    // trap: the optimizer hoists the size() projection ABOVE the
    // Generate and re-evaluates the whole shingle transform per
    // exploded row, turning the scan O(shingles²) per doc (measured
    // 13× slower at sf0.1).
    val postingRows = docs.select(col(idCol),
      explode(TextOps.shingleHashes(col(textCol), n)).as("shingle"))
    val cnt = postingRows.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    // document frequency FIRST (count-aggregate: map-side partials,
    // bounded state) — so the posting-list collect below only ever
    // materializes lists of 2..maxDf ids. Collecting before filtering
    // would buffer a stop-shingle's entire posting list (in a web
    // corpus: most of the corpus) inside one aggregation buffer.
    val eligible = postingRows.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf))
      .select(col("shingle"))
    val postings = postingRows.join(eligible, Seq("shingle"), "left_semi")
      .groupBy(col("shingle"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
    val shared = postings
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1),
          |  i -> transform(slice(ids, i + 1, size(ids) - i),
          |       y -> struct(element_at(ids, i) AS id_a, y AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(cnt.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(cnt.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
  }

  /** MinHash signature: k slots, slot i = min over shingle HASHES h of
    * xxhash64(i, h). Returns (id, sig ARRAY<BIGINT>).
    *
    * Shape: the native [[graft.functions.MinHashSignature]] expression
    * computes the whole signature per doc in one compiled pass — a
    * narrow PROJECTION, no explode and no aggregate, so signature
    * building contributes ZERO shuffles (the first exchange in
    * MinHash/LSH is the band-bucket join itself). Docs with fewer than
    * n tokens have no signature (empty array → filtered), mirroring
    * the aggregate formulation's absent groups. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    docs.select(col(idCol),
      Bridge.column(graft.functions.MinHashSignature(
        Bridge.expression(col(textCol)), n, k)).as("sig"))
      .where(size(col("sig")) > 0)
  }

  /** Executable spec for [[minhashSignatures]]: the explode + k-MIN
    * aggregate formulation (one shuffle). DedupSpec asserts bit-parity
    * with the native expression — do NOT remove. */
  private[graft] def minhashSignaturesAgg(docs: DataFrame, idCol: String, textCol: String,
                                          n: Int, k: Int): DataFrame = {
    val sh = docs.select(col(idCol),
      explode(TextOps.shingleHashes(col(textCol), n)).as("shingle"))
    val slotCols = (0 until k).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"__slot$i"))
    sh.groupBy(col(idCol))
      .agg(slotCols.head, slotCols.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"__slot$i")): _*).as("sig"))
  }

  /** Engine-PORTABLE MinHash signatures — same single-projection,
    * zero-shuffle shape as [[minhashSignatures]], but every hash is
    * derivable in ANY engine: the base hash comes from `md5(shingle)`
    * and slot i applies the Carter-Wegman affine universal hash
    * `((2i+1)·h + 1000003·(i+1)) mod (2^31−1)`. One md5 per shingle
    * (the k slots are k cheap affine maps over it — the textbook
    * MinHash construction, not k independent hashes), so the cost
    * stays one strong hash per shingle like the xxhash64 form. What
    * this buys over [[minhashSignatures]]: a DuckDB oracle reproduces
    * the signatures bit-for-bit, so the LSH pair list itself is
    * hash-verified instead of rows-only; the native form remains the
    * throughput path and keeps its recall-invariant check. */
  def minhashSignaturesMd5(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    docs.select(col(idCol),
      Bridge.column(graft.functions.Md5MinHashSignature(
        Bridge.expression(col(textCol)), n, k)).as("sig"))
      .where(size(col("sig")) > 0)
  }

  /** Executable spec for [[minhashSignaturesMd5]]: the same values via
    * builtin higher-order functions — and structurally the SAME
    * program as the DuckDB oracle SQL, so the parity chain is
    * native expression == HOF spec == oracle. DedupSpec asserts the
    * first equality; the correctness gate hashes the second.
    * base = first 48 bits of md5 REDUCED mod p = 2^31−1 (Mersenne
    * prime): every affine step then stays comfortably inside LONG
    * (h' < 2^31, a ≤ 2k−1 → a·h' + c < 2^36) — exact 64-bit integer
    * arithmetic in BOTH engines, where a 60-bit base would force
    * decimal/HUGEINT (measured 10× slower under Spark's BigDecimal
    * boxing). The mod-p WRAP is what keeps the k slots independent:
    * without it min(a·h + c) = a·min(h) + c and every slot would
    * elect the same shingle. */
  private[graft] def minhashSignaturesMd5Spec(docs: DataFrame, idCol: String, textCol: String,
                                              n: Int, k: Int): DataFrame = {
    val p = 2147483647L
    val toks = TextOps.tokens(col(textCol))
    val shingles = array_distinct(transform(
      sequence(lit(1), size(toks) - lit(n - 1)),
      i => array_join(slice(toks, i, lit(n)), " ")))
    val base = transform(shingles,
      s => conv(substring(md5(s), 1, 12), 16, 10).cast(LongType) % p)
    // the md5 base-hash array MUST materialize behind its own project
    // boundary (the textStats pattern: a multiply-referenced expensive
    // alias is not collapsed into its consumers) — inlining it would
    // re-tokenize, re-shingle, and re-md5 the document once PER SLOT,
    // a k-fold blowup of the only expensive step. The short-doc gate
    // filters BEFORE the projection (a predicate on the projected
    // alias would push back down and evaluate the md5 chain twice);
    // it also keeps sequence(1, size-4) from flipping descending on
    // < n tokens. Mirrors minhashSignatures dropping short docs.
    docs.where(size(toks) >= n)
      .select(col(idCol), base.as("__base"))
      .select(col(idCol),
        array((0 until k).map { i =>
          array_min(transform(col("__base"),
            h => (h * lit(2L * i + 1) + lit(1000003L * (i + 1))) % p))
        }: _*).as("sig"))
  }

  /** [[minhashLshPairs]] over the portable md5 signatures
    * ([[minhashSignaturesMd5]]): identical banding/verification plan —
    * band buckets key on the band's slot values directly (a string of
    * 4 exact integers; no engine-private bucket hash), so the whole
    * operator is DuckDB-reproducible and oracle-hashable. */
  def minhashLshPairsMd5(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 5, k: Int = 16, bands: Int = 4,
                         minEstJaccard: Double = 0.5): DataFrame = {
    val rows = k / bands
    val sigs = minhashSignaturesMd5(docs, idCol, textCol, n, k)
    val buckets = sigs
      .select(col(idCol), col("sig"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket",
        array_join(slice(col("sig"), col("band") * rows + 1, lit(rows)), ","))
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b")).distinct()
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast(DoubleType) / lit(k.toDouble))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** The banded LSH index of a corpus — `(band, bucket, id, sig)` —
    * the table an INCREMENTAL near-dup pipeline maintains: appends add
    * the new docs' rows; [[incrementalMinhashAdmit]] probes it. */
  def minhashIndexMd5(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    minhashSignaturesMd5(docs, idCol, textCol, n, k)
      .select(col(idCol), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket",
        array_join(slice(col("sig"), col("band") * rows + 1, lit(rows)), ","))
  }

  /**
   * INCREMENTAL near-dup admission — [[incrementalExact]]'s role for
   * NEAR duplicates: a new batch is admitted against the maintained
   * corpus LSH index ([[minhashIndexMd5]]) without ever touching
   * corpus text. A batch doc is REJECTED iff its estimated Jaccard
   * (matching signature slots / k, over shared band buckets) reaches
   * `maxEstJaccard` against ANY corpus doc, or against any batch doc
   * with a SMALLER id (first-id-wins within the batch, independent of
   * that doc's own fate — a deterministic, order-free rule). Docs too
   * short to shingle carry no signature and are admitted.
   *
   * Scale shape: the corpus contributes index rows only (bands ×
   * ~30 bytes per doc); the probe is a bucket equi-join whose cost
   * tracks the BATCH and the duplicate density, never the corpus
   * volume — the property that keeps daily near-dedup affordable at
   * 100 TB corpus size. Returns the admitted batch rows.
   */
  def incrementalMinhashAdmit(corpus: DataFrame, batch: DataFrame,
                              idCol: String, textCol: String,
                              n: Int = 5, k: Int = 16, bands: Int = 4,
                              maxEstJaccard: Double = 0.5): DataFrame = {
    def est(a: Column, b: Column): Column =
      size(filter(zip_with(a, b, (x, y) => x === y), v => v))
        .cast(DoubleType) / lit(k.toDouble)
    val ci = minhashIndexMd5(corpus, idCol, textCol, n, k, bands)
      .select(col("band"), col("bucket"), col("sig").as("sig_c"))
    val bi = minhashIndexMd5(batch, idCol, textCol, n, k, bands)
    val vsCorpus = bi.join(ci, Seq("band", "bucket"))
      .select(col(idCol), col("sig"), col("sig_c")).distinct()
      .filter(est(col("sig"), col("sig_c")) >= maxEstJaccard)
      .select(col(idCol))
    val a = bi.select(col("band"), col("bucket"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = bi.select(col("band"), col("bucket"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))
    val within = a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b")).distinct()
      .filter(est(col("sig_a"), col("sig_b")) >= maxEstJaccard)
      .select(col("id_b").as(idCol))
    batch.join(vsCorpus.unionByName(within).distinct(), Seq(idCol), "left_anti")
  }

  /** DROP-ONE sub-bucket LSH index — the MULTI-PROBE twin of
    * [[minhashIndexMd5]]: per band of `rows` slots, `rows` keys each
    * omitting one slot — `(band, drop, bucket)` — so two docs collide
    * iff some band agrees on ≥ rows−1 of its slots. OR-amplification
    * at fixed signature size: at slot-agreement p the per-band hit
    * rate rises from p^r to p^r + r·p^(r−1)(1−p) — the borderline
    * near-dups that differ in exactly one slot of EVERY band (the
    * single-probe blind spot right at the threshold) become
    * catchable. The trade is explicit and linear: index and probe
    * rows ×r, wider (r−1)-slot buckets admit more candidates, and
    * every candidate still pays the same exact est-Jaccard verify —
    * recall is bought with probe volume, never with a looser verify. */
  def minhashIndexMd5Probe(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    minhashSignaturesMd5(docs, idCol, textCol, n, k)
      .select(col(idCol), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col(idCol), col("sig"), col("band"),
        explode(sequence(lit(1), lit(rows))).as("drop"))
      .withColumn("bucket", array_join(concat(
        slice(col("sig"), col("band") * rows + 1, col("drop") - 1),
        slice(col("sig"), col("band") * rows + col("drop") + 1,
          lit(rows) - col("drop"))), ","))
  }

  /** [[incrementalMinhashAdmit]] with MULTI-PROBE candidate recall
    * ([[minhashIndexMd5Probe]]): identical admission rule — reject iff
    * est-Jaccard ≥ `maxEstJaccard` against any corpus doc or any
    * smaller-id batch doc — over the drop-one candidate set, which is
    * a SUPERSET of the full-band one (a full-band match implies every
    * drop-one sub-bucket of that band matches), so multi-probe can
    * only reject MORE near-dups, never fewer. Probe cost still tracks
    * the batch: ×r probe rows, corpus contributes index rows only. */
  def incrementalMinhashAdmitMultiProbe(corpus: DataFrame, batch: DataFrame,
                                        idCol: String, textCol: String,
                                        n: Int = 5, k: Int = 16, bands: Int = 4,
                                        maxEstJaccard: Double = 0.5): DataFrame =
    admitAgainstIndexMultiProbe(
      minhashIndexMd5Probe(corpus, idCol, textCol, n, k, bands),
      batch, idCol, textCol, n, k, bands, maxEstJaccard)

  /** The probe-and-admit core of [[incrementalMinhashAdmitMultiProbe]]
    * over a PREBUILT drop-one index ([[minhashIndexMd5Probe]] rows —
    * the table a streaming pipeline maintains by appending each
    * admitted batch's rows; [[graft.streaming.StreamOps
    * .minhashAdmitSink]]): corpus text is never re-shingled — the
    * maintained index IS the corpus's entire contribution. */
  def admitAgainstIndexMultiProbe(index: DataFrame, batch: DataFrame,
                                  idCol: String, textCol: String,
                                  n: Int, k: Int, bands: Int,
                                  maxEstJaccard: Double): DataFrame = {
    def est(a: Column, b: Column): Column =
      size(filter(zip_with(a, b, (x, y) => x === y), v => v))
        .cast(DoubleType) / lit(k.toDouble)
    val keys = Seq("band", "drop", "bucket")
    val ci = index
      .select(col("band"), col("drop"), col("bucket"), col("sig").as("sig_c"))
    val bi = minhashIndexMd5Probe(batch, idCol, textCol, n, k, bands)
    val vsCorpus = bi.join(ci, keys)
      .select(col(idCol), col("sig"), col("sig_c")).distinct()
      .filter(est(col("sig"), col("sig_c")) >= maxEstJaccard)
      .select(col(idCol))
    val a = bi.select(col("band"), col("drop"), col("bucket"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = bi.select(col("band"), col("drop"), col("bucket"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))
    val within = a.join(b, keys)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b")).distinct()
      .filter(est(col("sig_a"), col("sig_b")) >= maxEstJaccard)
      .select(col("id_b").as(idCol))
    batch.join(vsCorpus.unionByName(within).distinct(), Seq(idCol), "left_anti")
  }

  /**
   * MinHash+LSH candidate pairs: signatures split into `bands` bands of
   * k/bands rows; docs sharing any band bucket become candidates;
   * candidates are verified by estimated Jaccard (matching slots / k)
   * ≥ `minEstJaccard`.
   */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 5, k: Int = 16, bands: Int = 4,
                      minEstJaccard: Double = 0.5): DataFrame = {
    val rows = k / bands
    val sigs = minhashSignatures(docs, idCol, textCol, n, k)
    val buckets = sigs
      .select(col(idCol), col("sig"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket",
        xxhash64(col("band"), array_join(slice(col("sig"), col("band") * rows + 1, lit(rows)), ",")))
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b")).distinct()
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast(DoubleType) / lit(k.toDouble))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /**
   * Connected components over near-dup pairs by iterative min-label
   * propagation: every doc adopts the smallest id reachable through
   * pair edges; converged components ARE the duplicate groups. The
   * loop is a driver-side iteration of JOINS (each a distributed
   * shuffle) — iterations needed = graph diameter, which for near-dup
   * clusters is tiny (dup groups are cliques or short chains), so 5-10
   * rounds close 100 TB corpora. The driver holds only the
   * changed-label COUNT per round, never data.
   *
   * @param pairs (id_a, id_b) undirected edges
   * @return (id, component) — component = min id in the component
   */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // edges are consumed EVERY round — cache them, pre-partitioned by
    // id_a: the per-round label join broadcasts the (one-row-per-node)
    // label table, which preserves the edge partitioning, so the
    // groupBy(id_a) gather is exchange-free (the pageRank shape). The
    // round-10 form recomputed the edge lineage each round — for a
    // caller whose pairs are a join pipeline (gr_components' edge
    // build), that re-derived the join maxIter times (13.3 s → 3.4 s
    // at sf0.1).
    val edges = pairs.select(col("id_a"), col("id_b"))
      .unionByName(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .repartition(col("id_a")).cache()
    try {
      // localCheckpoint, not cache: constant-size plans across rounds,
      // and blocks release on GC instead of pinning a CacheManager
      // entry the caller can never unpersist (the pageRank lesson)
      var labels = edges.select(col("id_a").as("id"))
        .union(edges.select(col("id_b").as("id"))).distinct()
        .withColumn("component", col("id")).localCheckpoint()
      var iter = 0
      var changed = 1L
      while (iter < maxIter && changed > 0) {
        // each node pulls the smallest label among itself and its neighbors
        val neighborMin = edges
          .join(labels.withColumnRenamed("id", "id_b"), Seq("id_b"))
          .groupBy(col("id_a").as("id"))
          .agg(min(col("component")).as("n_comp"))
        val updated = labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("component"), coalesce(col("n_comp"), col("component"))).as("component"),
            (col("n_comp") < col("component")).as("__changed"))
          .localCheckpoint()
        changed = updated.filter(col("__changed")).count()
        labels = updated.drop("__changed")
        iter += 1
      }
      // silent non-convergence would let duplicates survive dedupByPairs —
      // fail loudly instead (raise maxIter: rounds needed = graph diameter)
      require(changed == 0,
        s"connectedComponents did not converge in $maxIter iterations ($changed labels still changing)")
      labels
    } finally {
      edges.unpersist()
      ()
    }
  }

  /**
   * Connected components by ALTERNATING STAR CONTRACTION (Kiveris et
   * al., "Connected Components in MapReduce and Beyond", SoCC'14) —
   * the O(log n)-round companion to [[connectedComponents]]'s
   * min-label propagation, whose rounds = graph DIAMETER: right for
   * dup cliques, unusable on chain-shaped components (URL-canonical
   * chains, citation paths), where it loudly aborts at maxIter. Star
   * contraction halves tree heights each alternation instead of
   * walking them:
   *
   *   - large-star (per node c over its full neighborhood Γ(c)):
   *     connect every neighbor n > c to m = min(Γ(c) ∪ {c});
   *   - small-star (per node u over its smaller neighbors N(u)):
   *     connect u and all of N(u) to m = min(N(u) ∪ {u}).
   *
   * Both steps preserve the node set and connectivity and only ever
   * point edges big→small, so the fixed point is a STAR FOREST whose
   * roots are exactly the component minima — detected EXACTLY (no
   * hash-signature probabilism): converged iff no root is also a
   * child and no child has two roots. A 50-node path closes in ~6
   * alternations where min-label needs 49 rounds.
   *
   * Scale shape per round: two keyed min-aggregates + two joins +
   * two distincts over the CURRENT edge set — which only shrinks
   * (contraction dedups parallel edges), each round localCheckpoint'd
   * to keep plans constant-size. Heavier per round than min-label's
   * single join, so [[connectedComponents]] stays the default for
   * known-shallow dup graphs; this is the shape-agnostic form.
   *
   * @param pairs (id_a, id_b) undirected edges (self-loops ignored)
   * @return (id, component) for every edge endpoint — component = min
   *         id in the component, same contract as
   *         [[connectedComponents]]
   */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    var e = pairs.filter(col("id_a") =!= col("id_b"))
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .distinct().localCheckpoint()
    var iter = 0
    var done = e.isEmpty // an empty edge set is already converged
    while (!done && iter < maxIter) {
      // Each phase is ONE unbounded-min window over the grouping node
      // (neighborhoods are per-node partitions — tiny next to the edge
      // set, so the window sort is trivial) instead of an aggregate +
      // self-join pair: 3 exchanges per alternation, not 5, and the
      // only dedup is the single distinct at ss. The per-round wall at
      // bench scale is exchange count × fixed latency, and the round
      // count (~log n) is the algorithm's whole point.
      // large-star: symmetrize to see each node's FULL neighborhood;
      // every neighbor v > center hangs off min(Γ(center) ∪ {center})
      val wU = org.apache.spark.sql.expressions.Window.partitionBy("u")
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val ls = sym.withColumn("mn", min(col("v")).over(wU))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
      // small-star: edges already point big→small; hang each node and
      // all its smaller neighbors off the smallest of them
      val ss = ls.withColumn("mm", min(col("v")).over(wU))
        .select(explode(array(col("v"), col("u"))).as("w"), col("mm"))
        .filter(col("w") =!= col("mm"))
        .select(col("w").as("u"), col("mm").as("v"))
        .distinct()
        .localCheckpoint()
      // exact star-forest test, ONE job: a child with two roots (rows
      // are distinct pairs, so count(1) per child counts roots) or a
      // root that is also a child breaks the star property
      val children = ss.groupBy("u").agg(count(lit(1)).as("d"))
      val bad = children.filter(col("d") > 1).select(col("u"))
        .unionByName(ss.select(col("v").as("u"))
          .join(children, Seq("u"), "left_semi"))
        .limit(1).count()
      done = bad == 0
      e = ss
      iter += 1
    }
    require(done,
      s"connectedComponentsStar did not converge in $maxIter alternations — " +
        "raise maxIter (rounds needed ~ log of the largest component)")
    e.select(col("u").as("id"), col("v").as("component"))
      .unionByName(e.select(col("v").as("id"), col("v").as("component")).distinct())
  }

  /** Corpus dedup end-to-end: given near-dup pairs, keep ONE doc per
    * component (the min id) plus every unpaired doc. */
  def dedupByPairs(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    val losers = comps.filter(col("id") =!= col("component")).select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware dedup: one representative per near-dup component,
    * keeping the member with the HIGHEST `scoreCol` (ties → smallest
    * id) — what production curation actually does: when a page exists
    * as a clean copy and a boilerplate-wrapped copy, keep the clean
    * one, not the one that happened to crawl first ([[dedupByPairs]]'s
    * min-id policy). Unpaired docs survive untouched. Plan shape: the
    * [[connectedComponents]] labels (a table of PAIRED ids only — tiny
    * next to the corpus) left-join the docs, then one row_number window
    * per component; per-partition size is the component size. */
  def dedupByPairsKeepBest(docs: DataFrame, idCol: String, pairs: DataFrame,
                           scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comps = connectedComponents(pairs)
      .select(col("id").as(idCol), col("component"))
    val labeled = docs.join(comps, Seq(idCol), "left")
      .withColumn("__comp", coalesce(col("component"), col(idCol)))
    val w = Window.partitionBy(col("__comp"))
      .orderBy(col(scoreCol).desc, col(idCol))
    labeled.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__comp", "__rn", "component")
  }

  /** Cross-corpus n-gram contamination: for every corpus doc, how many
    * n-gram shingles it shares with each benchmark doc — the
    * decontamination pass run before training so eval data never leaks
    * into the training set. Same narrow-key shape as [[jaccardPairs]]:
    * both sides reduce to (id, shingle-hash) longs via the compiled
    * [[TextOps.shingleHashes]]; the join key is 8 bytes; the benchmark
    * side is tiny (eval suites are small) so it broadcasts. */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    n: Int, minShared: Int): DataFrame = {
    val c = corpus.select(col(idCol),
      explode(TextOps.shingleHashes(col(textCol), n)).as("sh"))
    val b = benchmark.select(col(idCol).as("bench_id"),
      explode(TextOps.shingleHashes(col(textCol), n)).as("sh"))
    c.join(broadcast(b), Seq("sh"))
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** 64-bit SimHash over word hashes (uniform weights): bit j of the
    * sketch is 1 iff the sum of ±1 votes from token-hash bits is > 0.
    *
    * Shape: the native [[graft.functions.SimHashSketch]] expression
    * computes the whole sketch per doc in one compiled pass — a narrow
    * PROJECTION, no explode/aggregate shuffle and no re-join for empty
    * docs (zero tokens → zero votes → sketch 0 naturally; the most
    * common duplicate class in web corpora is the empty page, and
    * dropping them would hide exactly those). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    docs.select(col(idCol),
      Bridge.column(graft.functions.SimHashSketch(
        Bridge.expression(col(textCol)))).as("simhash"))
  }

  /** Executable spec for [[simhash]]: explode + 64 conditional SUMs +
    * bit packing + empty-doc re-join (one shuffle). DedupSpec asserts
    * bit-parity with the native expression — do NOT remove. */
  private[graft] def simhashAgg(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs.select(col(idCol),
      explode(TextOps.shingleHashes(col(textCol), 1, distinct = false)).as("__h"))
    val voteCols = (0 until 64).map(b =>
      sum(when(expr(s"(shiftrightunsigned(__h, $b) & 1) = 1"), 1L).otherwise(-1L)).as(s"__b$b"))
    val packed = (0 until 64).map(b => s"IF(__b$b > 0, shiftleft(1L, $b), 0L)").mkString(" + ")
    val sketches = hashed.groupBy(col(idCol))
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col(idCol), expr(packed).as("simhash"))
    docs.select(col(idCol))
      .join(sketches, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** Fuzzy string matching / entity resolution at edit distance ≤ 1:
    * deletion-neighborhood blocking (FastSS). Each string generates
    * itself plus every single-character deletion; any ED≤1 pair —
    * substitution, insertion, deletion, or equality — provably shares a
    * variant, so candidates come from ONE equi-join on the variant
    * (sub-quadratic: never all-pairs), then exact `levenshtein ≤ 1`
    * kills the false positives (two different deletions can collide,
    * e.g. "aab"/"aba" → "ab"). Both engines agree on integer
    * Levenshtein exactly, so the whole operator is oracle-hashable.
    *
    * Scale shape: variants ≈ rows × avg-length — a projection-explode;
    * the join (and the variant-dedup shuffle before it) keys on
    * `xxhash64(v)` by default — 8 bytes through the shuffle instead of
    * the ~word-length string. A hash collision only ADDS a spurious
    * candidate pair, which the exact `levenshtein ≤ 1` filter kills, so
    * the OUTPUT is provably identical to raw-string blocking — which is
    * why the raw-string DuckDB oracle still hash-verifies the hashed
    * plan (DedupSpec additionally asserts pair-for-pair parity of the
    * two forms). `hashKey = false` keeps the raw-string key as the
    * executable spec. Blocking degrades for very long strings
    * (length × rows variants) — for documents use the shingle/MinHash
    * family instead; this operator is for NAMES and short keys. */
  def editDistancePairs(rows: DataFrame, idCol: String, strCol: String,
                        hashKey: Boolean = true): DataFrame = {
    val keyOf: Column => Column = if (hashKey) (v => xxhash64(v)) else identity
    val variants = rows.select(col(idCol).as("id"), col(strCol).as("name"))
      .select(col("id"), col("name"), explode(concat(
        array(col("name")),
        expr("transform(sequence(1, length(name)), " +
          "i -> concat(substring(name, 1, i-1), substring(name, i+1, length(name))))")))
        .as("v"))
      .select(col("id"), col("name"), keyOf(col("v")).as("v"))
      .distinct() // repeated characters produce duplicate variants
    val a = variants.select(col("id").as("id_a"), col("name").as("name_a"), col("v"))
    val b = variants.select(col("id").as("id_b"), col("name").as("name_b"), col("v"))
    a.join(b, Seq("v")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b").distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 1)
  }

  /** SimHash near-dup candidates: 4 bands of 16 bits; docs agreeing on
    * any band meet, verified by Hamming distance ≤ `maxHamming`. */
  /** Engine-PORTABLE SimHash — a 60-bit sketch from md5 token hashes
    * (first 15 hex chars, the [[minhashSignaturesMd5]] base), packed
    * by the classic bit-vote: bit b is set iff more token hashes carry
    * bit b than not. One projection per doc: the votes fold once over
    * the token-hash array (array state, one pass) and the pack is a
    * fixed 60-term sum — no explode, no shuffle, and every step
    * (md5, hex→int, shifts, comparisons) is DuckDB-reproducible, so
    * the banded pair list hash-verifies against an oracle. Empty docs
    * sketch to 0 (the [[simhash]] convention). Duplicate tokens vote
    * multiply — term WEIGHT matters in SimHash, so tokens are NOT
    * deduped. */
  def simhashMd5(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    docs.select(col(idCol),
      Bridge.column(graft.functions.Md5SimHashSketch(
        Bridge.expression(col(textCol)))).as("simhash"))
  }

  /** Executable spec for [[simhashMd5]] via builtin higher-order
    * functions — the same program as the DuckDB oracle SQL (parity
    * chain as in [[minhashSignaturesMd5Spec]]). DedupSpec asserts
    * bit-parity with the native expression — do NOT remove. */
  private[graft] def simhashMd5Spec(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val hs = transform(toks, t => conv(substring(md5(t), 1, 15), 16, 10).cast(LongType))
    // the token-hash array is materialized ONCE behind its own project
    // boundary (the textStats pattern); the 60 bit-votes are then 60
    // in-memory folds over it — still one pass over the DATA
    val withHs = docs.select(col(idCol), hs.as("__hs"))
    val sketch = (0 until 60).map { b =>
      val vote = aggregate(col("__hs"), lit(0),
        (acc, h) => acc + when(shiftrightunsigned(h, b) % 2 === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    withHs.select(col(idCol), sketch.as("simhash"))
  }

  /** [[simhashPairs]] over the portable 60-bit md5 sketches: 4 bands
    * of 15 bits (a Hamming-≤3 pair is identical on ≥ 1 band by
    * pigeonhole, same guarantee as the 64-bit form), XOR + bit_count
    * verification — all DuckDB-expressible, so the pair list is
    * oracle-hashable. */
  def simhashPairsMd5(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sh = simhashMd5(docs, idCol, textCol)
    val banded = sh
      .select(col(idCol), col("simhash"), explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("chunk", expr("shiftrightunsigned(simhash, band * 15) & 32767"))
    val a = banded.select(col("band"), col("chunk"), col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("chunk"), col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)").cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val banded = sh
      .select(col(idCol), col("simhash"), explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("chunk", expr("shiftrightunsigned(simhash, band * 16) & 65535"))
    val a = banded.select(col("band"), col("chunk"), col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("chunk"), col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)").cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /**
   * Substring-level duplication spans — the character-granular dedup
   * signal of Lee et al.'s "Deduplicating Training Data Makes Language
   * Models Better": for every document, the maximal character spans
   * covered by a length-`k` substring that occurs MORE THAN ONCE in
   * the corpus (in another doc or elsewhere in the same doc), plus the
   * covered-character fraction. Token/shingle Jaccard sees documents;
   * this sees the duplicated PASSAGE inside an otherwise-novel
   * document — the case where you trim, not drop.
   *
   * Plan shape (no pair join anywhere — the reason this scales):
   *  1. every char position explodes ONCE to `(id, pos, h)` where `h`
   *     is a 60-bit md5 reduction of its k-gram — the gram TEXT never
   *     leaves the projection, so the one wide shuffle moves 8-byte
   *     keys, not k chars per position;
   *  2. duplicated positions = `count > 1` over an `h`-partitioned
   *     window (one pass — the agg+semi-join form computed the gram
   *     explode twice and shuffled it twice, measured 1.5× slower end-to-end);
   *  3. a per-doc gaps-and-islands window (running max of span end)
   *     merges overlapping [pos, pos+k) windows into maximal spans.
   * The md5 reduction is ENGINE-PORTABLE (DuckDB computes the same
   * 60 bits), so the oracle replays the run bit-for-bit — a hash
   * collision would over-mark a span identically in both engines
   * (probability ~positions²/2⁶⁰; acceptable for a trim signal).
   *
   * Docs shorter than `k` yield zero grams (guarded — Spark's
   * `sequence(1, 0)` descends) and report zero spans via the left
   * join. Output: `(id, n_spans, dup_chars, n_chars, dup_frac)`.
   */
  def substringSpans(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"substringSpans: k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val grams = docs.select(col(idCol),
        explode(when(char_length(col(textCol)) >= k,
          transform(sequence(lit(1), char_length(col(textCol)) - (k - 1)),
            i => struct(i.as("pos"),
              conv(substring(md5(col(textCol).substr(i, lit(k))), 1, 15), 16, 10)
                .cast(LongType).as("h"))))
          .otherwise(array().cast(s"array<struct<pos:int,h:bigint>>"))).as("pg"))
      .select(col(idCol), col("pg.pos").as("pos"), col("pg.h").as("h"))
    val dupPos = grams
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("__n") > 1)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevEnd = max(col("pos") + (k - 1)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = dupPos
      .withColumn("is_new",
        when(prevEnd.isNull || col("pos") > prevEnd, 1L).otherwise(0L))
      .withColumn("island", sum(col("is_new")).over(w))
      .groupBy(col(idCol), col("island"))
      .agg((max(col("pos") + (k - 1)) - min(col("pos")) + 1).cast(LongType).as("span_chars"))
    val perDoc = islands.groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"), sum(col("span_chars")).as("dup_chars"))
    docs.select(col(idCol), char_length(col(textCol)).cast(LongType).as("n_chars"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        col("n_chars"),
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(coalesce(col("dup_chars"), lit(0L)).cast(DoubleType) /
            col("n_chars").cast(DoubleType)).as("dup_frac"))
  }

  /**
   * Cross-source content-overlap matrix: for every source pair, how
   * many distinct word n-gram shingles they share, and the containment
   * ratio `shared / min(|A|,|B|)` — the corpus-provenance audit that
   * catches mirrored crawls, re-posted content, and cross-source
   * contamination BEFORE sources are mixed into a training set.
   *
   * Scale shape: documents reduce to DISTINCT (source, shingle-hash)
   * rows first (one hash aggregate — the posting-list trick), so the
   * shingle self-join on the 60-bit md5 key fans out at most
   * |sources|² per shingle regardless of how many documents share it;
   * with a bounded source count the join output is bounded by
   * |distinct shingles|·|sources|². Hashes are md5-derived (engine-
   * portable, same collisions in the oracle — the dd_substring_spans
   * pattern).
   */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
                    n: Int = 5): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val shingles = transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(0))),
      i => array_join(slice(toks, i, lit(n)), " "))
    // ONE pass over the corpus: per shingle hash, the sorted set of
    // sources holding it (collect_set dedups — the distinct and the
    // self-join collapse into this aggregate). localCheckpoint because
    // two consumers read it (per-source counts, pair expansion) — the
    // Eval.scala pattern; size is bounded by distinct shingles.
    val byH = docs
      .select(col(srcCol).as("src"), explode(shingles).as("g"))
      .select(col("src"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast(LongType).as("h"))
      .groupBy(col("h"))
      .agg(sort_array(collect_set(col("src"))).as("ss"))
      .localCheckpoint()
    val counts = byH.select(explode(col("ss")).as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("n_sh"))
    // all i<j pairs of each shingle's (sorted, ≤|sources|) holder set —
    // a bounded nested transform, never a raw-table self-join
    val pairs = byH.filter(size(col("ss")) > 1)
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))),
          y => struct(x.as("src_a"), y.as("src_b")))))).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(counts.select(col("src").as("src_a"), col("n_sh").as("n_a"))), "src_a")
      .join(broadcast(counts.select(col("src").as("src_b"), col("n_sh").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("shared"), col("n_a"), col("n_b"),
        (col("shared").cast(DoubleType) /
          least(col("n_a"), col("n_b")).cast(DoubleType)).as("containment"))
  }

  /**
   * Prefix-filtered set-similarity self-join (the AllPairs/PPJoin
   * family): EXACT token-set Jaccard ≥ `minJaccard` pairs, but
   * candidates are generated only from each document's PREFIX — its
   * `n − ⌈t·n⌉ + 1` globally-rarest tokens under the total order
   * (document frequency, token). Lossless by the prefix-filter lemma:
   * for the first common token of A and B in the global order at
   * positions i, j, `|A∩B| ≤ min(n_a−i+1, n_b−j+1)`; Jaccard ≥ t
   * forces `|A∩B| ≥ ⌈t·n_a⌉`, so i ≤ n_a − ⌈t·n_a⌉ + 1 — the first
   * common token sits inside BOTH prefixes and the equi-join on
   * prefix tokens finds every qualifying pair. Candidates also pass
   * the length filter (`⌈t·n_a⌉ ≤ n_b` and vice versa) before the
   * exact intersection-count verification.
   *
   * Scale: where a raw posting-list self-join fans out on every
   * token, this joins only on the rare end of the vocabulary —
   * per-token fan-out is df², and the prefix keeps exactly the
   * low-df tokens. On top of the prefix filter, PPJoin's POSITION
   * filter prunes each candidate row by the overlap upper bound its
   * matching positions allow: the first common token at positions
   * (i, j) caps `|A∩B| ≤ 1 + min(n_a−i, n_b−j)`, and Jaccard ≥ t
   * needs `|A∩B| ≥ ⌈t·(n_a+n_b)/(1+t)⌉` — lossless, because the
   * FIRST common token's row carries the pair's loosest bound, so a
   * qualifying pair always survives on that row (measured at sf0.1:
   * 3.4M prefix-only candidates → the position filter cuts the
   * small-vocabulary worst case by ~40×). Verification then joins the
   * (small, distinct) pair table to the per-doc sorted token ARRAYS
   * twice and counts `array_intersect` in-row — no exploded
   * candidate×token fan-out, which at sf0.1 was an ~80M-row
   * intermediate and 90% of the operator's wall.
   * Output: `(id_a, id_b, n_a, n_b, n_shared, jaccard)`, id_a < id_b.
   */
  def ppjoinPairs(docs: DataFrame, idCol: String, textCol: String,
                  minJaccard: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The pruning bounds (prefix length, length filter, overlap bound
    // α) are computed in EXACT integer arithmetic on the per-mille
    // rational t' = tPm/1000 — ceil()-of-double-products overshoots at
    // exact-integer boundaries for thresholds whose double rounds
    // ABOVE the decimal (0.55 → 0.55000000000000004 makes ceil(0.55·n)
    // one too large whenever 0.55·n is integral), silently dropping
    // qualifying pairs and breaking the lossless claim. ceil(a/b) on
    // non-negative integers is `(a + b - 1) div b`. ANY double
    // threshold is accepted: tPm is minJaccard FLOORED to the nearest
    // per-mille (with a 1e-9 nudge so exact per-mille doubles like 0.3
    // whose binary form sits a hair BELOW the decimal still land on
    // it), so t' ≤ t up to that sub-ulp nudge — the integer bounds
    // prune at a threshold no tighter than the caller's, which keeps
    // the candidate set a superset (lossless; at worst ~0.1 per-mille
    // looser, i.e. marginally more candidates to verify). The final
    // Jaccard gate stays the caller's exact double compare, identical
    // to the brute-force oracle (the floored bound and the true gate
    // can only disagree on a pair when |sh/union − t| < 1 ulp,
    // impossible for small-denominator rationals under ~2.6e13
    // tokens).
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"ppjoinPairs: minJaccard in (0, 1], got $minJaccard")
    val tPm = math.floor(minJaccard * 1000 + 1e-9).toInt.min(1000)
    // localCheckpoint both shared subtrees: `tok` feeds THREE consumers
    // (df counts, the ranked window, the verification arrays) and
    // `prefix` feeds both sides of the self-join — without the cut,
    // Spark recomputes the explode+join+window per consumer (measured
    // 2× end-to-end at sf0.1). Both are post-reduction tables (exploded
    // distinct tokens; prefix tokens only), bounded by corpus
    // vocabulary × docs, not raw text.
    val tok = docs
      .select(col(idCol).as("id"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
      .localCheckpoint()
    val dfs = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfs, "tok")
    val byDoc = Window.partitionBy(col("id"))
    val withPos = ranked
      .withColumn("pos", row_number().over(byDoc.orderBy(col("df"), col("tok"))))
      .withColumn("n", count(lit(1)).over(byDoc))
    val prefix = withPos
      .filter(expr(s"pos <= n - (($tPm * n + 999) div 1000) + 1"))
      .select(col("id"), col("tok"), col("n"), col("pos"))
      .localCheckpoint()
    // overlap lower bound α = ⌈t(n_a+n_b)/(1+t)⌉ = ⌈tPm(n_a+n_b)/(1000+tPm)⌉
    // (J ≥ t ⟺ o ≥ α), exact integer ceil-division
    val alpha = expr(s"($tPm * (n_a + n_b) + ${1000 + tPm - 1}) div ${1000 + tPm}")
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
      // length filter n_b ≥ t·n_a cross-multiplied: 1000·n_b ≥ tPm·n_a
      .filter(lit(1000) * col("n_b") >= lit(tPm) * col("n_a") &&
        lit(1000) * col("n_a") >= lit(tPm) * col("n_b"))
      .filter(lit(1) + least(col("n_a") - col("pos_a"),
        col("n_b") - col("pos_b")) >= alpha)
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .distinct()
    val arrs = tok.groupBy(col("id"))
      .agg(sort_array(collect_set(col("tok"))).as("__ts"))
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    cand
      .join(arrs.select(col("id").as("id_a"), col("__ts").as("__ta")), "id_a")
      .join(arrs.select(col("id").as("id_b"), col("__ts").as("__tb")), "id_b")
      .withColumn("n_shared",
        column(graft.functions.SortedIntersectCount(
          expression(col("__ta")), expression(col("__tb")))))
      .withColumn("jaccard", col("n_shared").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("n_shared")).cast(DoubleType))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        col("n_shared"), col("jaccard"))
  }
}
