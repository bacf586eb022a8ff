package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Near-duplicate detection for large text corpora.
  *
  * Scale design (the part that matters at 100 TB):
  *  - Shingling/minhashing are narrow per-row transforms over built-in
  *    higher-order functions — no shuffle, no UDF serialization.
  *  - Candidate generation is LSH banding: duplicates collide on a
  *    (band, bandHash) key, so the only shuffle is an equi-join on
  *    band hashes — never an all-pairs product. With b bands of r rows
  *    collision probability is 1-(1-j^r)^b: b=16, r=4 gives >99%
  *    recall at jaccard 0.8 while keeping buckets tiny.
  *  - Candidate pairs are id-only; shingle sets are joined back ONLY
  *    for the surviving pairs (exact verify via array_intersect /
  *    array_union) — big arrays never ride the banded shuffle.
  *  - All hashing is xxhash64 — deterministic across runs/executors.
  *
  * The reference's only dedup is last-write-wins by key
  * (/root/reference/scripts/dbitool.pl:2680-2681 — see Ops); fuzzy
  * dedup is north-star extension work.
  *
  * Cache note: the pair builders persist small internal relations
  * (hashed shingles, signatures) that are load-bearing for
  * correctness-of-cost (plan reuse across join sides). Every public
  * builder RELEASES those persists before returning (eager
  * localCheckpoint of the result, then unpersist — the Ops.pageRank
  * pattern, VERDICT r12 #2): long-lived sessions running many dedup
  * jobs accumulate nothing, no caller-side clearCache contract.
  * DedupSimSpec gates cacheManager-empty after each builder.
  */
object Dedup {

  /** Materialize `out` once (eager localCheckpoint) and release every
    * internal persist before returning — the Ops.pageRank cache-hygiene
    * pattern applied to the pair builders. The returned Dataset's
    * checkpoint blocks are executor-local (unrecoverable on executor
    * loss — cluster callers needing fault tolerance should write the
    * pairs out) and live until it is GC'd; callers done early can
    * release them with out.unpersist().
    */
  private[operators] def checkpointReleasing(out: DataFrame,
                                             internals: DataFrame*): DataFrame = {
    val cp = out.localCheckpoint()
    internals.foreach(_.unpersist(false))
    cp
  }

  /** Distinct word-k-shingles per document. */
  def shingles(text: Column, k: Int): Column =
    array_distinct(TextFunctions.wordNgrams(text, k))

  /** Sorted-distinct xxhash64'd word-k-shingles — one codegen'd pass
    * (no gram strings materialized); value-set identical to
    * `transform(shingles(text, k), xxhash64)`. The minhash/jaccard
    * input of choice: arrays of longs, already sorted for merge-based
    * jaccard (`TextExpr.jaccardSorted`).
    */
  def hashedShingles(text: Column, k: Int): Column =
    graft.functions.TextExpr.hashedShingles(text, k)

  private def permSeed(j: Int): Long = j * 0x9E3779B97F4A7C15L

  /** MinHash signature as a Column (array<long> of numPerm). NOTE:
    * convenient for ad-hoc use, but Catalyst's CollapseProject inlines
    * the shingle subtree into all numPerm elements — interpreted
    * higher-order functions then recompute it numPerm times. The
    * scalable path is `minhashSignatures` (explode + codegen'd
    * hash-aggregate), which is what the LSH pipeline uses.
    */
  def minhashSignature(sh: Column, numPerm: Int = 64): Column = {
    val hs = transform(sh, s => xxhash64(s))
    array((0 until numPerm).map { j =>
      array_min(transform(hs, h => xxhash64(h.bitwiseXOR(lit(permSeed(j))))))
    }: _*)
  }

  /** MinHash signatures for a whole table: explode shingles (each
    * string hashed ONCE), then numPerm `min(xxhash64(h ^ seed_j))`
    * columns in one hash-aggregate — map-side partial mins, one shuffle
    * on id. Output: (id, m0..m{n-1}). Superseded in the pair path by
    * the single-pass narrow kernel (`TextExpr.minhashSig` — zero
    * shuffle, bit-identical); kept as the independent cross-check
    * implementation (TextKernelsSpec asserts agreement).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int, numPerm: Int): DataFrame = {
    val exploded = df
      .select(col(idCol).as("id"),
        explode(hashedShingles(col(textCol), k)).as("h"))
    val sigCols = (0 until numPerm).map { j =>
      min(xxhash64(col("h").bitwiseXOR(lit(permSeed(j))))).as(s"m$j")
    }
    exploded.groupBy(col("id")).agg(sigCols.head, sigCols.tail: _*)
  }

  /** LSH band keys: hash each group of rowsPerBand signature slots.
    * Same (bandIdx, bandHash) ⇒ candidate pair. THE definition of a
    * band key — `minhashDuplicatePairs` calls this, so the two can
    * never diverge.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64((0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** Exact jaccard over two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Candidate pairs from banded rows `(id, bandIdx, <keyCol>)` with a
    * hub-bucket cut — the piece that keeps LSH banding linear on real
    * corpora. A band key shared by B near-identical documents
    * (boilerplate, empty strings, license headers — guaranteed in any
    * crawl) would make a naive band self-join emit B² candidate rows.
    * Instead:
    *
    *  - bucket stats (count + min id) in one hash-aggregate with
    *    map-side partials — never a per-bucket array in memory;
    *  - buckets with ≤ maxBucket members take the all-pairs self-join
    *    (bounded at maxBucket² rows per bucket);
    *  - oversized buckets emit LINEAR "star" edges member→representative
    *    (the bucket's min id). Members of a hub bucket are near-identical
    *    by construction, so linking them through one representative
    *    preserves the keep-smallest-id dedup outcome
    *    (`dropDuplicatesByPairs`) at B-1 instead of B² edges.
    *
    * All three stages shuffle on the same (bandIdx, key) key, so the
    * stats join and the self-join co-partition. Callers still verify
    * every emitted pair exactly — star edges included.
    *
    * Recall trade-off, stated honestly: inside an OVERSIZED bucket,
    * a pair (A, B) is only found if each member verifies against the
    * REPRESENTATIVE — a pair where both are near each other but far
    * from the rep is missed. For MinHash this is rare (sharing a full
    * band = r equal signature slots is strong near-dup evidence, so
    * hub members are mutually similar); SimHash's 16-bit bands are
    * weaker evidence, so size maxBucket to the corpus (the guarantee
    * "any pair within hamming ≤ 3 collides on ≥1 band" holds
    * unconditionally only for buckets within maxBucket).
    */
  private[operators] def bandCandidates(banded: DataFrame, keyCol: String,
                                        maxBucket: Int): DataFrame = {
    val stats = banded.groupBy(col("bandIdx"), col(keyCol))
      .agg(count(lit(1)).as("__bsz"), min(col("id")).as("__rep"))
    val sized = banded.join(stats, Seq("bandIdx", keyCol))
    val small = sized.filter(col("__bsz") <= maxBucket)
      .select(col("bandIdx"), col(keyCol), col("id"))
    val smallPairs = small.as("a").join(small.as("b"), Seq("bandIdx", keyCol))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("idA"), col("b.id").as("idB"))
    val starPairs = sized
      .filter(col("__bsz") > maxBucket && col("id") =!= col("__rep"))
      .select(col("__rep").as("idA"), col("id").as("idB"))
    smallPairs.unionByName(starPairs).dropDuplicates("idA", "idB")
  }

  /** Shared verification tail: join each candidate pair's sorted
    * fingerprint/shingle sets back (survivors only — the sets never
    * ride the banded shuffle), exact jaccard, threshold, rounded
    * output. `sets` must be (id, set) with set sorted-distinct.
    */
  private[operators] def verifiedJaccardPairs(candidates: DataFrame,
                                              sets: DataFrame,
                                              threshold: Double): DataFrame =
    candidates
      .join(sets.select(col("id").as("idA"), col("set").as("__sA")), "idA")
      .join(sets.select(col("id").as("idB"), col("set").as("__sB")), "idB")
      .withColumn("jaccard",
        graft.functions.TextExpr.jaccardSorted(col("__sA"), col("__sB")))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), round(col("jaccard"), 4).as("jaccard"))

  /** Doc-in-doc containment pairs — the subset-duplication semantic
    * Jaccard-targeted LSH structurally misses: a snippet embedded in a
    * 10× larger doc has jaccard ≈ 0.1 (never band-collides) but
    * containment |A∩B| / min(|A|,|B|) = 1.0. Candidates come from a
    * shingle INVERTED INDEX (docs sharing any shingle), with posting
    * lists over the [[bandCandidates]] hub-cut: common-boilerplate
    * shingles (list longer than maxBucket) emit linear min-id star
    * edges instead of quadratic pairs, so the plan is equi-join shaped
    * at any corpus size; the recall trade is the documented star-edge
    * one — a pair sharing ONLY ultra-common shingles must reach the
    * same star hub to surface. Verify joins sorted md5-shingle sets
    * back for survivors only (one merge-pass containment kernel). md5
    * family throughout -> any engine replays it exactly.
    * Output: (idA, idB, containment), idA < idB, >= threshold.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 3, threshold: Double = 0.8,
                       maxBucket: Int = 64): DataFrame = {
    val hashed = df
      .select(col(idCol).as("id"),
        graft.functions.PortableExpr.md5Shingles(col(textCol), k).as("hs"))
      .filter(size(col("hs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val posting = hashed.select(col("id"), lit(0).as("bandIdx"),
      explode(col("hs")).as("h"))
    val cand = bandCandidates(posting, "h", maxBucket)
    checkpointReleasing(
      verifiedContainmentPairs(cand,
        hashed.select(col("id"), col("hs").as("set")), threshold),
      hashed)
  }

  /** The [[verifiedJaccardPairs]] tail with the asymmetric containment
    * denominator — (idA, idB, containment), survivors only.
    */
  private[operators] def verifiedContainmentPairs(candidates: DataFrame,
                                                  sets: DataFrame,
                                                  threshold: Double): DataFrame =
    candidates
      .join(sets.select(col("id").as("idA"), col("set").as("__sA")), "idA")
      .join(sets.select(col("id").as("idB"), col("set").as("__sB")), "idB")
      .withColumn("containment",
        graft.functions.TextExpr.containmentSorted(col("__sA"), col("__sB")))
      .filter(col("containment") >= threshold)
      .select(col("idA"), col("idB"),
        round(col("containment"), 4).as("containment"))

  /** Incremental doc-in-doc containment — the daily-crawl twin of
    * [[incrementalMinhash]] for the subset-duplication semantic: flag
    * delta docs contained in (or containing) a corpus doc or an
    * earlier delta doc. The corpus NEVER reshuffles: its shingle
    * postings are pruned by a broadcast of the delta's distinct
    * shingles (delta-sized keys), hub shingles thin to their min-id
    * rep, and only the survivors verify. Same id-disjointness
    * contract and verdict semantics as incrementalMinhash; score
    * column is `best_containment`.
    */
  def incrementalContainment(corpus: DataFrame, delta: DataFrame,
                             idCol: String, textCol: String,
                             k: Int = 3, threshold: Double = 0.8,
                             maxBucket: Int = 64): DataFrame = {
    def hashedOf(df: DataFrame) = df
      .select(col(idCol).as("id"),
        graft.functions.PortableExpr.md5Shingles(col(textCol), k).as("hs"))
      .filter(size(col("hs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def postingOf(h: DataFrame) = h.select(col("id"),
      lit(0).as("bandIdx"), explode(col("hs")).as("bandHash"))
    val ch = hashedOf(corpus)
    val dh = hashedOf(delta)
    val dp = postingOf(dh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    checkpointReleasing(
      incrementalVerdicts(ch, postingOf(ch), dh, dp,
        delta.select(col(idCol).as("id")), threshold, maxBucket,
        verifier = verifiedContainmentPairs, scoreCol = "containment"),
      ch, dh, dp)
  }

  /** MinHash-LSH candidate pairs, verified with EXACT shingle jaccard.
    * Output: (idA, idB, jaccard), idA < idB, jaccard >= threshold.
    */
  def minhashDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 3, numPerm: Int = 64, bands: Int = 16,
                            threshold: Double = 0.7,
                            maxBucket: Int = 64): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rowsPerBand = numPerm / bands

    // Shingle + hash ONCE (codegen'd single-pass kernel), persist: the
    // plan references this relation three times (signature pass + both
    // sides of the verify join) and Catalyst does not share common
    // subtrees across joins — without the persist the shingling runs
    // 3x. Verification compares hashed shingle sets (64-bit):
    // identical to string jaccard up to hash collisions (~1e-9 for
    // 10^2-shingle docs), and the arrays that ride the verify shuffle
    // are sorted longs instead of strings.
    val hashed = df
      .select(col(idCol).as("id"),
        hashedShingles(col(textCol), k).as("hs"))
      .filter(size(col("hs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Signatures via the single-pass kernel: a NARROW projection over
    // the cached shingle hashes — no explode, no 64-min aggregate, no
    // shuffle (bit-identical to that formulation; TextKernelsSpec).
    // The persist doubles as a CollapseProject barrier: the banding
    // below reads numPerm slots of "sig", and without materialization
    // Catalyst would inline the kernel into every element_at use.
    val sig = hashed.select(col("id"),
        graft.functions.TextExpr.minhashSig(col("hs"), numPerm).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = sig.select(col("id"),
      posexplode(bandKeys(col("sig"), bands, rowsPerBand))
        .as(Seq("bandIdx", "bandHash")))

    // id-only candidate join (shuffled payload: 3 longs per row) with
    // the hub-bucket cut — see bandCandidates.
    val candidates = bandCandidates(banded, "bandHash", maxBucket)

    // Exact verification joins hashed shingles back for surviving
    // pairs only.
    checkpointReleasing(
      verifiedJaccardPairs(candidates,
        hashed.select(col("id"), col("hs").as("set")), threshold),
      hashed, sig)
  }

  /** SimHash-64 from token hashes: bit b of the output is 1 iff tokens
    * with bit b set outnumber those without. Composed from built-in
    * higher-order functions — the REFERENCE formulation: CollapseProject
    * inlines the token-hash array into all 64 bit sums, so this
    * tokenizes 64× per row. Production path:
    * `graft.functions.TextExpr.simhash64` (single-pass codegen kernel,
    * bit-identical — asserted in TextKernelsSpec).
    */
  def simhash64(text: Column): Column = {
    val hs = transform(TextFunctions.tokens(text), t => xxhash64(t))
    val n = size(hs)
    // Unrolled per-bit majority votes (shift amounts must be literal).
    (0 until 64).map { b =>
      when(aggregate(hs, lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L))) * 2 >= n,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash for a whole table via explode + 64 codegen'd bit-count
    * sums in one hash-aggregate. Superseded by the single-pass scalar
    * kernel (`TextExpr.simhash64` — narrow, zero shuffle, bit-identical)
    * which the pair path uses; kept as the independent cross-check
    * implementation (TextKernelsSpec asserts all three agree).
    */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val aggs = (0 until 64).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"c$b")
    } :+ count(lit(1)).as("n")
    val counts = exploded.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val fp = (0 until 64).map { b =>
      when(col(s"c$b") * 2 >= col("n"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    counts.select(col("id"), fp.as("fp"))
  }

  /** Hamming distance between two 64-bit fingerprints (codegen'd). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: 16-bit band blocking (a pair within
    * hamming distance 3 of 64 bits must agree on ≥1 of 4 bands), then
    * exact hamming verify. Same join-on-band-key scale shape as
    * MinHash-LSH, including the hub-bucket cut (identical boilerplate
    * docs all share a fingerprint, hence every band — a naive band
    * self-join would go quadratic on them).
    *
    * Guarantee is CONDITIONAL on bucket size: "hamming <= maxDist ⇒
    * >= 1 shared band ⇒ pair emitted" holds unconditionally only for
    * band buckets within maxBucket members; oversized hub buckets emit
    * member→representative star edges instead, trading in-bucket pair
    * recall for linearity (see bandCandidates). SimHash's 16-bit bands
    * are weaker collision evidence than MinHash's, so the default
    * maxBucket is 4× larger here (256 vs 64); size it to the corpus's
    * boilerplate profile.
    */
  def simhashDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                            maxDist: Int = 3, maxBucket: Int = 256): DataFrame = {
    // Single-pass codegen kernel: fingerprints are a NARROW projection
    // (no explode/aggregate shuffle). (id, fp) is two longs per row;
    // persisted because it feeds the banding AND both sides of the
    // verify join below.
    fingerprintDuplicatePairs(
      df.select(col(idCol).as("id"),
        graft.functions.TextExpr.simhash64(col(textCol)).as("fp")),
      maxDist, maxBucket, bands = 4, bandBits = 16)
  }

  /** Banded hamming near-dup over PRECOMPUTED bitwise fingerprints —
    * the SimHash band machinery opened up to any fingerprint source
    * (image perceptual hashes, audio signatures, …). Input is
    * `(id, fp)`; fp uses the low `bands × bandBits` bits. Same scale
    * shape as the text paths: band equi-join with the hub-bucket cut,
    * exact hamming verify on survivors; the band guarantee ("hamming ≤
    * bands-1 ⇒ ≥ 1 shared band") is conditional on bucket size exactly
    * as in [[simhashDuplicatePairs]].
    */
  def fingerprintDuplicatePairs(fps: DataFrame, maxDist: Int = 3,
                                maxBucket: Int = 256, bands: Int = 4,
                                bandBits: Int = 15): DataFrame = {
    val mask = (1L << bandBits) - 1
    val base = fps.select(col("id"), col("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("fp"), b * bandBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("bandIdx", "bandHash")))
    checkpointReleasing(
      bandCandidates(banded, "bandHash", maxBucket)
        .join(base.select(col("id").as("idA"), col("fp").as("fpA")), "idA")
        .join(base.select(col("id").as("idB"), col("fp").as("fpB")), "idB")
        .select(col("idA"), col("idB"),
          hamming(col("fpA"), col("fpB")).cast("int").as("dist"))
        .filter(col("dist") <= maxDist),
      base)
  }

  /** Video (frame-sequence) near-dup over PRECOMPUTED per-frame
    * fingerprints: input `(id, fhs array<long>)`, one hash per sampled
    * frame. Each POSITION acts as one band (an edited copy keeps its
    * frame order, so a near-dup must agree at ≥ minShared positions and
    * therefore shares at least one (position, hash) band whenever fewer
    * than `len - minShared + 1` frames changed); candidates come from
    * the (position, hash) equi-join with the standard hub-bucket cut,
    * verified by the exact count of positions whose hashes match. Same
    * scale shape as [[fingerprintDuplicatePairs]]: banded equi-join,
    * never all-pairs on clips.
    */
  def frameHashDuplicatePairs(fhs: DataFrame, minShared: Int = 3,
                              maxBucket: Int = 256): DataFrame = {
    val base = fhs.select(col("id"), col("fhs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(col("id"),
      posexplode(col("fhs")).as(Seq("bandIdx", "fh")))
    checkpointReleasing(
      bandCandidates(banded, "fh", maxBucket)
        .join(base.select(col("id").as("idA"), col("fhs").as("fA")), "idA")
        .join(base.select(col("id").as("idB"), col("fhs").as("fB")), "idB")
        .select(col("idA"), col("idB"),
          expr("cast(aggregate(zip_with(fA, fB, (x, y) -> if(x = y, 1, 0))," +
            " 0, (a, v) -> a + v) as int)").as("shared"))
        .filter(col("shared") >= minShared),
      base)
  }

  /** Winnowing fingerprint (rolling-hash, MOSS scheme — see
    * functions.TextKernels.winnowFingerprint): sorted-distinct selected
    * hashes per document.
    */
  def winnowFingerprints(text: Column, k: Int = 16, w: Int = 8): Column =
    graft.functions.TextExpr.winnowFingerprint(text, k, w)

  /** Fingerprint-based near-dup pairs: candidates are documents that
    * SHARE a selected fingerprint (guaranteed for any common substring
    * of ≥ k+w-1 bytes), verified by exact fingerprint-set jaccard.
    *
    * Scale shape: explode fingerprints → equi-join on the fingerprint
    * value — never all-pairs. Fingerprints appearing in more than
    * maxBucket docs are dropped BEFORE the self-join (boilerplate
    * shared by everything — headers, licenses — would otherwise create
    * quadratic hub buckets), the standard common-fingerprint cut.
    */
  def winnowDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 16, w: Int = 8, threshold: Double = 0.5,
                           maxBucket: Int = 64): DataFrame = {
    val (out, internals) =
      winnowDuplicatePairsRaw(df, idCol, textCol, k, w, threshold, maxBucket)
    checkpointReleasing(out, internals: _*)
  }

  /** [[winnowDuplicatePairs]] before the checkpoint-release tail:
    * (lazy result, persisted internals). Exists so plan-shape gates
    * (ScaleSpec) can inspect the REAL candidate-join plan — the public
    * builder's localCheckpoint collapses it to a scan. Callers must
    * unpersist the returned internals.
    */
  private[graft] def winnowDuplicatePairsRaw(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, w: Int = 8, threshold: Double = 0.5,
      maxBucket: Int = 64): (DataFrame, Seq[DataFrame]) = {
    val fps = df
      .select(col(idCol).as("id"), winnowFingerprints(col(textCol), k, w).as("fp"))
      .filter(size(col("fp")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val exploded = fps.select(col("id"), explode(col("fp")).as("f"))
    val rare = exploded.groupBy(col("f"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) between (2, maxBucket))

    // pair generation INSIDE each fingerprint bucket (bounded by
    // maxBucket), id-only payload
    val candidates = rare
      .select(explode(col("ids")).as("idA"), col("ids"))
      .select(col("idA"), explode(col("ids")).as("idB"))
      .filter(col("idA") < col("idB"))
      .dropDuplicates("idA", "idB")

    (verifiedJaccardPairs(candidates,
      fps.select(col("id"), col("fp").as("set")), threshold), Seq(fps))
  }

  /** Greedy keep-smallest-id dedup from a pair list: drop every doc
    * that appears as the larger id of a duplicate pair. (Not full
    * connected components — the standard "keep first seen" corpus
    * policy, one anti-join. For transitive-closure-correct dedup use
    * `duplicateClusters` + `dropDuplicatesByClusters`.)
    */
  def dropDuplicatesByPairs(df: DataFrame, idCol: String,
                            pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("idB").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Connected components over a duplicate-pair graph: one row per node
    * appearing in `pairs` with `rep` = the smallest id of its component
    * (reps map to themselves). The transitive-closure grouping a
    * near-dup pair list implies — A~B and B~C put A,B,C in one cluster
    * even though (A,C) was never emitted.
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — each round is
    * hash-aggregates and equi-joins only (min over neighborhoods joined
    * back; never a per-node neighbor list in memory, so hub nodes don't
    * blow a task), and the edge set converges to min-rooted stars in
    * O(log n) rounds even on worst-case path graphs. Each round ends in
    * `localCheckpoint` to truncate the iterative plan lineage.
    * Convergence is detected by an order-independent edge-set checksum
    * (count + XOR of pair hashes), one tiny aggregate per round.
    */
  def duplicateClusters(pairs: DataFrame, idA: String = "idA",
                        idB: String = "idB", maxIter: Int = 25,
                        smallGraph: Int = 100000): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val d = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val m = d.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      d.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val d = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val m = d.groupBy("u").agg(min("v").as("m"))
      d.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(bit_xor(
        xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var edges = pairs
      .select(col(idA).as("u"), col(idB).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var prev = checksum(edges)

    // Adaptive strategy (the AQE move): a duplicate-pair graph that
    // fits comfortably on the driver (3 longs/edge → MBs at the
    // threshold) doesn't need O(log n) distributed rounds of stage
    // latency — union-find with path compression finishes in
    // milliseconds and returns the IDENTICAL (id, rep=component-min)
    // result, pinned against the distributed path in OpsSpec. Long-id
    // graphs only; anything else (or anything big) takes the
    // unbounded alternating-star path below.
    val longIds = edges.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longIds && prev._1 <= smallGraph) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
        }
        r
      }
      es.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(if (ru < rv) rv else ru) = math.min(ru, rv)
      }
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val repOf = nodes.groupBy(find).map { case (root, ms) =>
        root -> ms.min
      }
      val spark = pairs.sparkSession
      import spark.implicits._
      return nodes.map(n => (n, repOf(find(n)))).toSeq
        .toDF("id", "rep")
    }

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val cs = checksum(next)
      converged = cs == prev
      prev = cs
      edges = next
      iter += 1
    }
    // converged edges are min-rooted stars: u -> componentMin
    edges.select(col("u").as("id"), col("v").as("rep"))
      .unionByName(edges.select(col("v").as("id"), col("v").as("rep")))
      .distinct()
  }

  /** Keep exactly one doc (the component representative) per duplicate
    * cluster; docs in no cluster survive untouched.
    */
  def dropDuplicatesByClusters(df: DataFrame, idCol: String,
                               clusters: DataFrame): DataFrame =
    df.join(clusters.filter(col("id") =!= col("rep"))
      .select(col("id").as(idCol)), Seq(idCol), "left_anti")

  /** Full-corpus cluster assignment `(id, rep)`: every doc mapped to
    * its duplicate-cluster representative, singletons (docs in no
    * pair) to themselves via an anti-join — the q147/q148 composition
    * as a reusable operator (and the `dedupcluster` DSL module).
    */
  def clusterAssignments(df: DataFrame, idCol: String,
                         pairs: DataFrame): DataFrame = {
    val clusters = duplicateClusters(pairs)
    val singles = df.select(col(idCol).as("id"))
      .join(clusters.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("rep"))
    clusters.unionByName(singles)
  }

  /** Skew-safe survivorship: keep the best-`quality` member of each
    * cluster (ties to the smallest id), annotated with its `rep` and
    * the cluster size `family`. The keeper pick is the SALTED
    * two-phase top-1 (Ops.saltedTopKPerGroup) — the hub-bucket cut
    * deliberately emits giant star clusters, so a plain per-rep rank
    * window would serialize the biggest cluster into one straggler
    * task at 100 TB; family counts come from the map-side-combining
    * hash-agg, joined back on rep. Returns the surviving docs with all
    * their original columns plus `rep` and `family`.
    */
  def survivors(docs: DataFrame, idCol: String, quality: Column,
                clusters: DataFrame): DataFrame = {
    val members = docs
      .join(clusters.select(col("id").as(idCol), col("rep").as("__rep")),
        Seq(idCol))
      .withColumn("__q", quality)
    val family = members.groupBy(col("__rep"))
      .agg(count(lit(1)).as("family"))
    Ops.saltedTopKPerGroup(members, Seq("__rep"),
        Seq(col("__q").desc, col(idCol).asc), k = 1, saltCol = col(idCol),
        rankCol = "__rk")
      .drop("__rk", "__q")
      .join(family, "__rep")
      .withColumnRenamed("__rep", "rep")
  }

  /** Incremental (delta-vs-corpus) near-dup core, shared by the
    * xxhash64 hot path ([[incrementalMinhash]]) and the portable md5
    * twin (DedupPortable.incrementalMinhashPortable). The daily-crawl
    * shape: a small delta batch is checked against an already-deduped
    * corpus WITHOUT re-pairing corpus×corpus.
    *
    * Scale design — the corpus side never shuffles:
    *  - the delta's distinct (band, key) set is BROADCAST as a
    *    left-semi prune on the corpus bands (a day's delta is MBs of
    *    keys against a 100 TB corpus), so corpus band rows that no
    *    delta doc touches never leave the scan;
    *  - surviving buckets are COMPLETE (the semi join keeps or drops
    *    whole keys), so bucket sizes computed on survivors equal
    *    full-corpus sizes and the hub cut stays exact: buckets within
    *    `maxBucket` join all members, oversized boilerplate buckets
    *    contribute only their min-id representative (the same linear
    *    star convention as [[bandCandidates]]);
    *  - delta-within-delta candidates reuse [[bandCandidates]] on the
    *    delta bands alone (first-occurrence-wins: the smaller delta id
    *    stays `new`, the larger is flagged — the standard within-batch
    *    approximation, deterministic and oracle-replayable);
    *  - verification joins shingle sets back for CANDIDATES only.
    *
    * Verdict per delta doc: `status` = dup_corpus (any verified corpus
    * match — corpus always wins) | dup_delta (a verified smaller-id
    * delta match) | new; `dup_of` = min matching id with corpus
    * matches preferred; match counts and best (max) jaccard alongside.
    * Ids must be disjoint across corpus and delta (caller's split).
    */
  private[operators] def incrementalVerdicts(
      corpusHashed: DataFrame, corpusBanded: DataFrame,
      deltaHashed: DataFrame, deltaBanded: DataFrame,
      deltaIds: DataFrame, threshold: Double, maxBucket: Int,
      verifier: (DataFrame, DataFrame, Double) => DataFrame =
        verifiedJaccardPairs,
      scoreCol: String = "jaccard"): DataFrame = {
    val deltaKeys = deltaBanded.select(col("bandIdx"), col("bandHash")).distinct()
    val touched = corpusBanded
      .join(broadcast(deltaKeys), Seq("bandIdx", "bandHash"), "left_semi")
    val stats = touched.groupBy(col("bandIdx"), col("bandHash"))
      .agg(count(lit(1)).as("__bsz"), min(col("id")).as("__rep"))
    val thinned = touched.join(stats, Seq("bandIdx", "bandHash"))
      .filter(col("__bsz") <= maxBucket || col("id") === col("__rep"))
    val xCand = thinned.select(col("bandIdx"), col("bandHash"), col("id"))
      .join(deltaBanded.select(col("bandIdx"), col("bandHash"),
        col("id").as("__did")), Seq("bandIdx", "bandHash"))
      .select(col("id").as("idA"), col("__did").as("idB"))
      .dropDuplicates("idA", "idB")
    val allSets = corpusHashed.select(col("id"), col("hs").as("set"))
      .unionByName(deltaHashed.select(col("id"), col("hs").as("set")))
    val corpusPairs = verifier(xCand, allSets, threshold)
    val deltaPairs = verifier(
      bandCandidates(deltaBanded, "bandHash", maxBucket),
      deltaHashed.select(col("id"), col("hs").as("set")), threshold)
    val matches = corpusPairs.withColumn("__src", lit("corpus"))
      .unionByName(deltaPairs.withColumn("__src", lit("delta")))
    val agg = matches.groupBy(col("idB"))
      .agg(
        sum(when(col("__src") === "corpus", 1L).otherwise(0L)).as("__nc"),
        sum(when(col("__src") === "delta", 1L).otherwise(0L)).as("__nd"),
        min(when(col("__src") === "corpus", col("idA"))).as("__dupc"),
        min(when(col("__src") === "delta", col("idA"))).as("__dupd"),
        max(col(scoreCol)).as(s"best_$scoreCol"))
      .withColumnRenamed("idB", "id")
    deltaIds.join(agg, Seq("id"), "left")
      .select(col("id"),
        when(coalesce(col("__nc"), lit(0L)) > 0, "dup_corpus")
          .when(coalesce(col("__nd"), lit(0L)) > 0, "dup_delta")
          .otherwise("new").as("status"),
        coalesce(col("__dupc"), col("__dupd")).as("dup_of"),
        coalesce(col("__nc"), lit(0L)).as("n_corpus"),
        coalesce(col("__nd"), lit(0L)).as("n_delta"),
        col(s"best_$scoreCol"))
  }

  /** Incremental MinHash near-dup, xxhash64 hot path: flag delta docs
    * that near-dup against the corpus or an earlier delta doc. See
    * [[incrementalVerdicts]] for the verdict semantics and scale shape.
    * Here the corpus shingles/bands are computed inline and persisted
    * (test-scale convenience); at 100 TB the corpus side reads a STORED
    * signature table (id, hs, sig) written once at ingest — the per-run
    * cost is then one delta shingling pass plus delta-sized joins.
    *
    * CONTRACT: corpus and delta ids must be DISJOINT (the caller owns
    * the id space — e.g. crawl-date-prefixed ids). Violations are NOT
    * detected: the unioned shingle-set relation then carries duplicate
    * ids, match counts inflate, and verdicts silently corrupt. No
    * guard is run here because proving disjointness costs a full join
    * of exactly the kind this operator exists to avoid; the portable
    * twin (DedupPortable.incrementalMinhashPortable) is the test-scale
    * path where callers can afford an upstream assert.
    */
  def incrementalMinhash(corpus: DataFrame, delta: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 3, numPerm: Int = 64, bands: Int = 16,
                         threshold: Double = 0.7,
                         maxBucket: Int = 64): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    def hashedOf(df: DataFrame) = df
      .select(col(idCol).as("id"), hashedShingles(col(textCol), k).as("hs"))
      .filter(size(col("hs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def bandedOf(hashed: DataFrame) = hashed.select(col("id"),
      posexplode(bandKeys(
        graft.functions.TextExpr.minhashSig(col("hs"), numPerm),
        bands, numPerm / bands)).as(Seq("bandIdx", "bandHash")))
    val ch = hashedOf(corpus)
    val dh = hashedOf(delta)
    val db = bandedOf(dh).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    checkpointReleasing(
      incrementalVerdicts(ch, bandedOf(ch), dh, db,
        delta.select(col(idCol).as("id")), threshold, maxBucket),
      ch, dh, db)
  }

  /** EXACT all-pairs Jaccard similarity self-join via prefix filtering
    * (the AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    * WWW'08). The exact complement to the probabilistic-recall LSH
    * family above: the output is EVERY unordered pair with word-set
    * Jaccard >= threshold — zero false negatives by construction —
    * yet no stage of the plan is quadratic in the corpus.
    *
    * Why it is exact: order all tokens by a global total order
    * (document frequency asc, token asc — rare first). For a doc with
    * n distinct tokens the prefix is its first n - ceil(t*n) + 1
    * tokens. For any pair with jaccard >= t the intersection size i
    * satisfies i >= ceil(t * max(na, nb)); the MINIMAL common token w
    * must sit inside BOTH prefixes — if w were in A's suffix (its
    * largest ceil(t*na) - 1 tokens), every common token (all >= w in
    * the order) would also be, but the suffix has fewer slots than i.
    * So a prefix-token equi-join finds every qualifying pair.
    *
    * Scale shape (each stage an equi-join or hash-agg):
    *  0. exact-duplicate collapse: docs group by their DISTINCT
    *     token-set (the sorted array is the grouping key — no hash,
    *     stays exact; at 100 TB key by md5(set) if array keys are too
    *     wide for the shuffle) into one representative "shape" per
    *     set. Crawl corpora are dominated by exact duplicates, so the
    *     expensive candidate join runs over the (much smaller) shape
    *     relation and the final answer is recovered by expansion —
    *     identical-set pairs have jaccard exactly 1.0, cross-shape
    *     pairs inherit the shape pair's jaccard.
    *  1. one hash-agg computes global df per token over SHAPES
    *     (rare-first order; any strict total order is correct, df is
    *     the heuristic that keeps join buckets small);
    *  2. one shuffle by shape rebuilds each shape's tokens sorted
    *     rare-first (sort_array over (df, tok) structs);
    *  3. candidates = self equi-join of posexploded PREFIX tokens —
    *     the rarest tokens carry the join, so hot common words never
    *     enter the shuffle; two residual prunes fire before the
    *     distinct: the symmetric length filter
    *     t*max(na,nb) <= min(na,nb), and PPJoin's POSITIONAL filter —
    *     a match at 0-based prefix positions (pa, pb) bounds the
    *     overlap by 1 + min(na-1-pa, nb-1-pb), which must reach the
    *     Jaccard overlap floor t·(na+nb)/(1+t); the pair's minimal
    *     common token row always satisfies the bound (all other
    *     common tokens sit strictly after it in both arrays), so no
    *     true pair is lost while candidates that only share late
    *     prefix tokens die before the shuffle. Both prunes are
    *     loosened by 1e-9 so double rounding can never drop a
    *     boundary pair.
    *  4. exact verify joins the full token arrays back for surviving
    *     candidate shapes only (arrays never ride the candidate
    *     shuffle) and computes |A∩B| / |A∪B| with array_intersect;
    *  5. expansion: shape pairs fan back out to member id pairs
    *     (equi-joins on the shape key), plus the within-shape
    *     id pairs at jaccard 1.0 — both stages are output-bound.
    *
    * Returns (idA, idB, jac) with idA < idB and raw double jac.
    * The reference has no fuzzy join at all (dbitool.pl's only dedup
    * is last-write-wins by key, dbitool.pl:2680-2681) — north-star
    * extension work.
    */
  def prefixJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                         threshold: Double,
                         pairsMode: String = "all"): DataFrame = {
    val (out, internals) =
      prefixJaccardPairsRaw(docs, idCol, textCol, threshold, pairsMode)
    checkpointReleasing(out, internals: _*)
  }

  /** [[prefixJaccardPairs]] before the checkpoint-release tail:
    * (lazy result, persisted internals). Exists so plan-shape gates
    * (ScaleSpec) can inspect the REAL prefix-token candidate plan —
    * the public builder's localCheckpoint collapses it to a scan.
    * Callers must unpersist the returned internals.
    *
    * `pairsMode` (VERDICT r12 #1 — the output-volume scale knob):
    *  - "all": every qualifying (idA, idB, jac) pair. Within a
    *    duplicate family of m docs that is m(m-1)/2 rows — the one
    *    stage of the operator that ISN'T shape-collapsed, and at
    *    crawl scale (boilerplate families of 10^5 docs) it alone can
    *    dwarf everything upstream.
    *  - "starEdges": the LINEAR certificate of the same clustering —
    *    within each shape, rep→member edges at jaccard 1.0 (rep =
    *    sid, the shape's min member id); across shapes, ONE
    *    rep→rep edge per qualifying shape pair carrying the shape
    *    jaccard. Connected components over these edges are IDENTICAL
    *    to components over "all" (each star edge is a real pair;
    *    every all-pairs edge is a within/cross star path), so
    *    duplicateClusters / survivors / leakage-safe splits consume
    *    them unchanged — DedupSimSpec pins the cluster bit-equality.
    *    Output rows: members + shape pairs, never members².
    */
  private[graft] def prefixJaccardPairsRaw(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double,
      pairsMode: String = "all"): (DataFrame, Seq[DataFrame]) = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    require(pairsMode == "all" || pairsMode == "starEdges",
      s"pairsMode must be all|starEdges, got $pairsMode")
    val toks = docs
      .select(col(idCol).as("id"),
        array_distinct(filter(split(col(textCol), " "), t => t =!= ""))
          .as("toks"))
      .withColumn("n", size(col("toks"))).filter(col("n") > 0)
    // 0: collapse exact-duplicate token sets into shapes. skey (the
    // alphabetically sorted set) is exact shape identity; sid is the
    // shape's min member id — a compact exact key for every later
    // join, so arrays never ride the candidate/expansion shuffles.
    val keyed = toks.select(col("id"), sort_array(col("toks")).as("skey"),
      col("n"))
    val shapes = keyed.groupBy(col("skey"), col("n"))
      .agg(min(col("id")).as("sid"), count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val members = keyed.join(shapes.select(col("skey"), col("sid")), "skey")
      .select(col("sid"), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 1-2: global rare-first order over shapes, then per-shape
    // rare-first arrays.
    val dfreq = shapes.select(explode(col("skey")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ordered = shapes
      .select(col("sid"), col("n"), explode(col("skey")).as("tok"))
      .join(dfreq, "tok")
      .groupBy(col("sid"), col("n"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("st"))
      .select(col("sid"), col("n"),
        transform(col("st"), s => s("tok")).as("sorted"))
      .withColumn("p",
        (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 3: prefix-prefix candidate equi-join with length + positional
    // residual prunes (positions are 0-based via posexplode).
    val pre = ordered.select(col("sid"), col("n"),
      posexplode(slice(col("sorted"), lit(1), col("p"))).as(Seq("pos", "tok")))
    val cand = pre.select(col("tok"), col("sid").as("sidA"),
        col("n").as("nA"), col("pos").as("pA"))
      .join(pre.select(col("tok"), col("sid").as("sidB"),
        col("n").as("nB"), col("pos").as("pB")), "tok")
      .filter(col("sidA") < col("sidB"))
      .filter(least(col("nA"), col("nB")).cast("double") >=
        lit(threshold) * greatest(col("nA"), col("nB")) - lit(1e-9))
      .filter((lit(1) + least(col("nA") - 1 - col("pA"),
          col("nB") - 1 - col("pB"))).cast("double") >=
        lit(threshold / (1.0 + threshold)) * (col("nA") + col("nB"))
          - lit(1e-9))
      .select(col("sidA"), col("sidB")).distinct()
    // 4: exact verify on full arrays, candidate shapes only. Distinct
    // sets can never reach jaccard 1.0, so cross-shape and
    // within-shape outputs never overlap.
    val spairs = cand
      .join(ordered.select(col("sid").as("sidA"), col("sorted").as("ta"),
        col("n").as("na")), "sidA")
      .join(ordered.select(col("sid").as("sidB"), col("sorted").as("tb"),
        col("n").as("nb")), "sidB")
      .withColumn("i", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jac",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jac") >= threshold)
      .select(col("sidA"), col("sidB"), col("jac"))
    // 5: expansion. "all" — cross-shape member pairs inherit the
    // shape jaccard (fan-out join), within-shape member pairs are
    // exact duplicates (jaccard exactly 1.0, identical to i/(2n-i) at
    // i=n=union). "starEdges" — no fan-out at all: sid IS the shape's
    // min member id, so shape pairs are already rep→rep edges and the
    // within stars are one members-sized projection.
    val out =
      if (pairsMode == "starEdges") {
        val cross = spairs
          .select(col("sidA").as("idA"), col("sidB").as("idB"), col("jac"))
        val within = members.filter(col("id") =!= col("sid"))
          .select(col("sid").as("idA"), col("id").as("idB"),
            lit(1.0).as("jac"))
        cross.unionByName(within)
      } else {
        val cross = spairs
          .join(members.select(col("sid").as("sidA"), col("id").as("ia")),
            "sidA")
          .join(members.select(col("sid").as("sidB"), col("id").as("ib")),
            "sidB")
          .select(least(col("ia"), col("ib")).as("idA"),
            greatest(col("ia"), col("ib")).as("idB"), col("jac"))
        val within = members.select(col("sid"), col("id").as("idA"))
          .join(members.select(col("sid"), col("id").as("idB")), "sid")
          .filter(col("idA") < col("idB"))
          .select(col("idA"), col("idB"), lit(1.0).as("jac"))
        cross.unionByName(within)
      }
    (out, Seq(shapes, members, ordered))
  }
}
