package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFunctions

/** Oracle-mode (cross-engine portable) variants of the near-dup
  * operators in [[Dedup]].
  *
  * The hot paths hash with xxhash64 (codegen'd single-pass kernels —
  * TextExpressions.scala); xxhash64 does not exist in DuckDB, so those
  * results can only be rows-checked by the driver's oracle. Every hash
  * here is instead derived from md5 — standardized, bit-identical in
  * Spark and DuckDB — so the FULL near-dup pipelines (shingling,
  * signatures, banding, hub cuts, verification) replay exactly in
  * plain SQL and the driver hash-compares end to end. The md5 variants
  * are verify-scale tools; at 100 TB you run the xxhash64 kernels
  * (same shapes, cheaper hash — agreement between the two families is
  * asserted statistically in DedupPortableSpec).
  *
  * Portability rules the whole file obeys (each breaks subtly if
  * ignored):
  *  - every intermediate stays inside a signed 64-bit long so Spark's
  *    ANSI mode never overflows: hashes are md5 PREFIXES (60- or
  *    40-bit), multiplications happen in 31-bit space;
  *  - no xxhash64, no floating-point in key derivation (doubles don't
  *    round-trip through SQL literals reliably; longs do);
  *  - tie-breaks are encoded arithmetically (e.g. the winnow position
  *    packing) rather than relying on engine-specific ordering.
  */
object DedupPortable {

  /** First `hexChars` hex digits of md5 as a positive long. DuckDB
    * twin: `CAST('0x' || substr(md5(x), 1, hexChars) AS BIGINT)`.
    * 15 hex chars = 60 bits (sums/shifts stay in-range under ANSI);
    * 10 chars = 40 bits (leaves 20 bits for position packing).
    */
  def md5Long(c: Column, hexChars: Int = 15): Column =
    conv(substring(md5(c), 1, hexChars), 16, 10).cast("long")

  val Mask31 = 0x7FFFFFFFL

  /** Per-permutation affine constants (a odd, both 31-bit): the MinHash
    * permutation family h -> (a*h + b) mod 2^31 — a true bijection on
    * [0, 2^31) for odd a, derived deterministically so the oracle SQL
    * can embed the very same literals. Products are bounded by
    * (2^31-1)^2 + 2^31 < 2^63, so ANSI-safe. Source of truth lives in
    * PortableKernels (the codegen kernels read the flat form).
    */
  def permConstants(numPerm: Int): Seq[(Long, Long)] = {
    val flat = graft.functions.PortableKernels.permConstantsFlat(numPerm)
    (0 until numPerm).map(j => (flat(2 * j), flat(2 * j + 1)))
  }

  /** The permutation itself, Column form (mirrors the SQL generator in
    * queries.DedupPortableSql — keep the two in lockstep).
    */
  def perm(h: Column, a: Long, b: Long): Column =
    (h.bitwiseAND(lit(Mask31)) * lit(a) + lit(b)).bitwiseAND(lit(Mask31))

  /** Composed-builtin md5 shingle hashes — the semantic reference for
    * the single-pass kernel (bit-equality asserted in
    * DedupPortableSpec; the kernel is what the pair path runs).
    */
  def hashedShinglesMd5Hof(text: Column, k: Int): Column =
    sort_array(array_distinct(
      transform(TextFunctions.wordNgrams(text, k), s => md5Long(s))))

  /** Portable twin of [[Dedup.minhashDuplicatePairs]]: md5'd distinct
    * word-k-shingles and affine-permutation signature minima via
    * single-pass codegen kernels (narrow projections — no explode, no
    * aggregate shuffle, same plan shape as the hot path), md5Long band
    * keys over rowsPerBand signature slots, the shared hub-cut
    * candidate join, exact jaccard verification on the hashed shingle
    * sets. Only the hash family differs from the hot path — and it
    * replays verbatim in DuckDB (DedupPortableSql.minhashOracleSql).
    */
  def minhashDuplicatePairsPortable(df: DataFrame, idCol: String, textCol: String,
                                    k: Int = 3, numPerm: Int = 64, bands: Int = 16,
                                    threshold: Double = 0.7,
                                    maxBucket: Int = 64): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")

    val hashed = df
      .select(col(idCol).as("id"),
        graft.functions.PortableExpr.md5Shingles(col(textCol), k).as("hs"))
      .filter(size(col("hs")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // signature + band keys fused in ONE kernel pass; PERSISTED because
    // bandCandidates references `banded` four times (bucket stats, both
    // self-join sides, star edges) and Catalyst does not share common
    // subtrees — without this the O(numPerm×|hs|) kernel would re-run
    // per reference. Payload is 3 longs/row.
    val banded = hashed.select(col("id"),
      posexplode(graft.functions.PortableExpr
        .minhashBandKeys(col("hs"), numPerm, bands))
        .as(Seq("bandIdx", "bandHash")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    Dedup.checkpointReleasing(
      Dedup.verifiedJaccardPairs(
        Dedup.bandCandidates(banded, "bandHash", maxBucket),
        hashed.select(col("id"), col("hs").as("set")), threshold),
      hashed, banded)
  }

  /** The 60-bit md5-family SimHash per row via the single-pass kernel:
    * (id, fp).
    */
  def simhashPortableFingerprints(df: DataFrame, idCol: String,
                                  textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.PortableExpr.simhashMd5(col(textCol)).as("fp"))

  /** Composed explode + 60-conditional-sum aggregate formulation — the
    * semantic reference the kernel is asserted against (and the shape
    * the DuckDB oracle replays).
    */
  def simhashPortableFingerprintsAgg(df: DataFrame, idCol: String,
                                     textCol: String): DataFrame = {
    val ex = df
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
      .select(col("id"), md5Long(col("t")).as("h"))
    val aggs = (0 until 60).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"c$b")
    } :+ count(lit(1)).as("n")
    val counts = ex.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val fpExpr = (0 until 60).map { b =>
      when(col(s"c$b") * 2 >= col("n"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    counts.select(col("id"), fpExpr.as("fp"))
  }

  /** Portable twin of [[Dedup.simhashDuplicatePairs]]: 60-bit md5-family
    * SimHash (single-pass kernel; tokens counted WITH multiplicity),
    * 4 bands of 15 bits, shared hub cut, exact hamming verification.
    * The band guarantee — any pair within hamming maxDist<=3 shares
    * >=1 of the 4 bands — holds for buckets within maxBucket, same
    * conditionality as the hot path.
    */
  def simhashDuplicatePairsPortable(df: DataFrame, idCol: String, textCol: String,
                                    maxDist: Int = 3,
                                    maxBucket: Int = 256): DataFrame =
    Dedup.fingerprintDuplicatePairs(
      simhashPortableFingerprints(df, idCol, textCol),
      maxDist, maxBucket, bands = 4, bandBits = 15)

  /** Portable twin of [[Dedup.winnowDuplicatePairs]], reformulated so
    * a SQL engine replays it with window functions:
    *
    *  - character k-grams (`substr`, char-based in both engines) hashed
    *    to 40 bits (md5 prefix);
    *  - each position packed into ONE long:
    *    `key = (h40 << 20) + max(0, 2^20 - 1 - i)` — the window MINIMUM of
    *    `key` is then exactly robust winnowing's "smallest hash,
    *    rightmost position on ties" selection, with the selected hash
    *    recoverable as `key >> 20`. No structs, no argmin, no
    *    engine-specific tie-break semantics;
    *  - `min(key) OVER (PARTITION BY doc ORDER BY i ROWS CURRENT..w-1
    *    FOLLOWING)` per window start, truncated tail windows filtered
    *    (`i <= m - (w-1)`, m = k-gram count);
    *  - the fingerprint set per doc is the distinct selected hashes —
    *    same rare-fingerprint candidate join + exact jaccard as the
    *    hot path.
    *
    * Selection differs from the byte-rolling kernel only in hash family
    * and char-vs-byte k-gram units; the winnowing guarantee (any shared
    * substring of >= k+w-1 chars yields a shared fingerprint) holds
    * identically. Documents shorter than k+w-1 chars have no full
    * window and are excluded (the kernel instead fingerprints any doc
    * with >= k bytes — at these thresholds both treat short docs as
    * un-fingerprintable).
    */
  def winnowDuplicatePairsPortable(df: DataFrame, idCol: String, textCol: String,
                                   k: Int = 16, w: Int = 8, threshold: Double = 0.5,
                                   maxBucket: Int = 64): DataFrame = {
    val (out, internals) = winnowDuplicatePairsPortableRaw(
      df, idCol, textCol, k, w, threshold, maxBucket)
    Dedup.checkpointReleasing(out, internals: _*)
  }

  /** [[winnowDuplicatePairsPortable]] before the checkpoint-release
    * tail: (lazy result, persisted internals) — plan-shape gates
    * (ScaleSpec q57) inspect the real candidate-join plan through this;
    * the public builder's localCheckpoint collapses it to a scan.
    * Callers must unpersist the returned internals.
    */
  private[graft] def winnowDuplicatePairsPortableRaw(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, w: Int = 8, threshold: Double = 0.5,
      maxBucket: Int = 64): (DataFrame, Seq[DataFrame]) = {
    // Single-pass kernel: per-doc fingerprint set in one narrow
    // projection (the exploded + window-min DataFrame formulation below
    // is the bit-identical semantic reference).
    val fps = df
      .select(col(idCol).as("id"),
        graft.functions.PortableExpr.winnowMd5(col(textCol), k, w).as("fp"))
      .filter(size(col("fp")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sel = fps.select(col("id"), explode(col("fp")).as("f"))

    // rare-fingerprint cut BEFORE the self-join, as in the hot path
    val cnt = sel.groupBy(col("f")).agg(count(lit(1)).as("__c"))
    val small = sel.join(cnt.filter(col("__c").between(2, maxBucket)), "f")
      .select(col("f"), col("id"))
    val candidates = small.as("a").join(small.as("b"), "f")
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("idA"), col("b.id").as("idB"))
      .dropDuplicates("idA", "idB")

    (Dedup.verifiedJaccardPairs(candidates,
      fps.select(col("id"), col("fp").as("set")), threshold), Seq(fps))
  }

  /** Exploded + window-min formulation of the portable winnowing
    * fingerprints — (id, fp). Bit-identical to the kernel (asserted in
    * DedupPortableSpec); this is also the exact shape the DuckDB
    * oracle replays with SQL window functions.
    */
  def winnowPortableFingerprintsWindowed(df: DataFrame, idCol: String,
                                         textCol: String, k: Int,
                                         w: Int): DataFrame = {
    val base = df
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .filter(length(col("t")) >= k + w - 1)
      .select(col("id"), col("t"), (length(col("t")) - (k - 1)).as("m"))
    val pos = base
      .select(col("id"), col("m"), explode(sequence(lit(1), col("m"))).as("i"), col("t"))
      .select(col("id"), col("m"), col("i"),
        // position term clamped at 0 — see PortableKernels.winnowMd5
        (shiftleft(md5Long(col("t").substr(col("i"), lit(k)), 10), 20) +
          greatest(lit(0), lit(1048575) - col("i"))).as("key"))
    val winSpec = Window.partitionBy("id").orderBy("i")
      .rowsBetween(Window.currentRow, w - 1)
    pos
      .select(col("id"), col("i"), col("m"),
        min(col("key")).over(winSpec).as("mk"))
      .filter(col("i") <= col("m") - (w - 1))
      .select(col("id"), shiftright(col("mk"), 20).as("f"))
      .distinct()
      .groupBy(col("id"))
      .agg(sort_array(collect_set(col("f"))).as("fp"))
  }

  /** Portable twin of [[Dedup.incrementalMinhash]] — md5 shingle/
    * signature family, same broadcast-pruned corpus join, same hub
    * conventions, so the whole incremental pass replays verbatim in
    * DuckDB (DedupPortableSql.incrementalOracleSql). Verdict semantics
    * and the 100 TB shape are documented on
    * [[Dedup.incrementalVerdicts]]. Corpus/delta ids must be disjoint
    * (violations corrupt verdicts silently, not loudly — see the
    * contract note on [[Dedup.incrementalMinhash]]); this test-scale
    * twin asserts it cheaply via an id-intersection count.
    */
  def incrementalMinhashPortable(corpus: DataFrame, delta: DataFrame,
                                 idCol: String, textCol: String,
                                 k: Int = 3, numPerm: Int = 64, bands: Int = 16,
                                 threshold: Double = 0.7,
                                 maxBucket: Int = 64): DataFrame = {
    val (out, internals) = incrementalMinhashPortableRaw(
      corpus, delta, idCol, textCol, k, numPerm, bands, threshold, maxBucket)
    Dedup.checkpointReleasing(out, internals: _*)
  }

  /** [[incrementalMinhashPortable]] before the checkpoint-release tail:
    * (lazy verdicts, persisted internals) — ScaleSpec's broadcast-prune
    * gate inspects the real plan through this (the public builder's
    * localCheckpoint collapses it to a scan). Callers must unpersist
    * the returned internals.
    */
  private[graft] def incrementalMinhashPortableRaw(
      corpus: DataFrame, delta: DataFrame,
      idCol: String, textCol: String,
      k: Int = 3, numPerm: Int = 64, bands: Int = 16,
      threshold: Double = 0.7,
      maxBucket: Int = 64): (DataFrame, Seq[DataFrame]) = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    def hashedOf(df: DataFrame) = df
      .select(col(idCol).as("id"),
        graft.functions.PortableExpr.md5Shingles(col(textCol), k).as("hs"))
      .filter(size(col("hs")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    def bandedOf(hashed: DataFrame) = hashed.select(col("id"),
      posexplode(graft.functions.PortableExpr
        .minhashBandKeys(col("hs"), numPerm, bands))
        .as(Seq("bandIdx", "bandHash")))
    // Test-scale disjointness guard (the hot path skips this — proving
    // it costs the corpus-wide join the operator exists to avoid).
    val overlap = corpus.select(col(idCol).as("id"))
      .join(delta.select(col(idCol).as("id")), Seq("id"), "left_semi")
      .limit(1).count()
    require(overlap == 0L,
      s"incrementalMinhashPortable: corpus and delta share ids on '$idCol' — " +
        "verdicts would silently corrupt (see Dedup.incrementalMinhash contract)")
    val ch = hashedOf(corpus)
    val dh = hashedOf(delta)
    val db = bandedOf(dh).persist(StorageLevel.MEMORY_AND_DISK)
    (Dedup.incrementalVerdicts(ch, bandedOf(ch), dh, db,
      delta.select(col(idCol).as("id")), threshold, maxBucket),
      Seq(ch, dh, db))
  }
}
