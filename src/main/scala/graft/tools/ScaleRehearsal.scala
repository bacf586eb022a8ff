package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Order-of-magnitude scale rehearsal (VERDICT r10 #7): synthesize a
  * 10× corpus from sf0.1 and run the heaviest compositions once,
  * recording measured-vs-predicted shapes for SCALE.md — one real
  * data point that converts the 100 TB scaling argument from design
  * prose into evidence.
  *
  * Corpus construction (all derived from the driver's sf0.1 parquet —
  * no fresh synthesis, just replication with controlled divergence):
  *  - documents ×10: replica r keeps doc structure but (a) prefixes
  *    every token with a replica tag "q<r>x" and (b) Caesar-shifts
  *    letters by r — token sets across replicas are DISJOINT, so the
  *    exact operators (q170 prefix-Jaccard) must scale EXACTLY 10×
  *    in output pairs, and char-shingle similarity across replicas
  *    collapses, so LSH compositions should land ≈10× (probabilistic
  *    recall, tolerance recorded);
  *  - orders/lineitem ×10 with per-replica key offsets (new customers
  *    per replica, SAME part/brand domain) — association-rule
  *    supports scale exactly 10×, so rules at minSupport×10 must be
  *    IDENTICAL to sf0.1's at minSupport.
  *
  * Run: `sbt "runMain graft.tools.ScaleRehearsal"` (~4 min). Prints
  * one labelled line per measurement.
  */
object ScaleRehearsal {
  private val Lower = "abcdefghijklmnopqrstuvwxyz"

  private def shifted(r: Int): String = {
    val k = r % 26
    Lower.drop(k) + Lower.take(k)
  }

  private def replicate(spark: SparkSession, sf: String, out: String): Unit = {
    val dir = new java.io.File(out)
    if (new java.io.File(dir, "documents.parquet").exists()) {
      println(s"rehearsal: $out already generated")
      return
    }
    dir.mkdirs()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val reps = (0 until 10).map { r =>
      if (r == 0) docs
      else {
        val tag = s"q${r}x"
        docs.select(
          (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
          array_join(transform(
            filter(split(col("text"), " "), t => t =!= ""),
            t => concat(lit(tag),
              translate(t, Lower + Lower.toUpperCase,
                shifted(r) + shifted(r).toUpperCase))), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
    }
    reps.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    (0 until 10).map { r =>
      orders.select(
        (col("o_orderkey") + lit(r.toLong * 100000000L)).as("o_orderkey"),
        (col("o_custkey") + lit(r.toLong * 10000000L)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    (0 until 10).map { r =>
      li.withColumn("l_orderkey",
        col("l_orderkey") + lit(r.toLong * 100000000L))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    for (t <- Seq("part", "region", "nation", "customer", "supplier"))
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    println(s"rehearsal: generated $out")
  }

  private def timed[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"rehearsal: $tag = ${(System.nanoTime() - t0) / 1e9}%.1f s")
    a
  }

  private def baskets(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .join(spark.read.parquet(s"$dir/part.parquet"),
        col("p_partkey") === col("l_partkey"))
      .select(col("o_custkey").as("ck"), col("p_brand").as("brand"))

  private def survivorCount(spark: SparkSession, dir: String): Long = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = graft.operators.DedupPortable.minhashDuplicatePairsPortable(
      docs, "doc_id", "text", k = 3, numPerm = 64, bands = 16,
      threshold = 0.7)
    val clusters = graft.operators.Dedup.duplicateClusters(pairs)
    val singles = docs.select(col("doc_id"))
      .join(clusters.select(col("id").as("doc_id")), Seq("doc_id"),
        "left_anti")
      .select(col("doc_id").as("id"), col("doc_id").as("rep"))
    clusters.unionByName(singles).select(col("rep")).distinct().count()
  }

  def main(args: Array[String]): Unit = {
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = "target/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // r18 WARC row: binaryFiles packs files smaller than
      // max(openCostInBytes, bytesPerCore) into shared splits — the
      // small-files mitigation. Real crawl segments (~1 GB) always
      // exceed the 128 MB split ceiling and get one task each; shrink
      // the open-cost floor so the fixture's ~0.4 MB shards play the
      // role of GB segments and the task-per-file claim is testable
      // at fixture scale.
      .config("spark.files.openCostInBytes", "1024")
      .appName("graft-scale-rehearsal")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // `runMain graft.tools.ScaleRehearsal r16` runs only the r16 rows
    // (they build their 10× inputs in-memory — no target/sf1 needed).
    if (args.contains("r16")) {
      rehearseR16(spark, sf01)
      spark.stop()
      return
    }
    if (args.contains("r17")) {
      rehearseR17(spark, sf01)
      spark.stop()
      return
    }
    if (args.contains("r18")) {
      rehearseR18(spark, sf01)
      spark.stop()
      return
    }
    if (args.contains("r19")) {
      rehearseR19(spark)
      spark.stop()
      return
    }

    timed("generate-sf1")(replicate(spark, sf01, out))

    // 1. EXACT prefix-Jaccard join: pairs must scale EXACTLY 10×.
    val p01 = timed("q170-pairs-sf0.1")(
      graft.operators.Dedup.prefixJaccardPairs(
        spark.read.parquet(s"$sf01/documents.parquet"),
        "doc_id", "text", threshold = 0.9).count())
    spark.catalog.clearCache()
    val p1 = timed("q170-pairs-sf1")(
      graft.operators.Dedup.prefixJaccardPairs(
        spark.read.parquet(s"$out/documents.parquet"),
        "doc_id", "text", threshold = 0.9).count())
    println(s"rehearsal: q170 pairs sf0.1=$p01 sf1=$p1 " +
      s"exact10x=${p1 == 10 * p01}")
    spark.catalog.clearCache()

    // 2. Association rules: at minSupport×10 the rule set must be
    // IDENTICAL (supports scale exactly, ratios unchanged).
    val r01 = timed("q177-rules-sf0.1")(
      graft.operators.Ops.associationRules(
        baskets(spark, sf01), "ck", "brand", 800L, 0.0)
        .collect().map(_.toSeq).toSet)
    spark.catalog.clearCache()
    val r1 = timed("q177-rules-sf1")(
      graft.operators.Ops.associationRules(
        baskets(spark, out), "ck", "brand", 8000L, 0.0)
        .collect().toSeq)
    val r1scaled = r1.map { row =>
      // un-scale the exact-integer counts; ratios must match as-is
      Seq(row.getString(0), row.getString(1), row.getLong(2) / 10,
        row.getLong(3) / 10, row.getLong(4) / 10, row.getDouble(5),
        row.getDouble(6), row.getDouble(7))
    }.toSet
    println(s"rehearsal: q177 rules sf0.1=${r01.size} sf1=${r1.size} " +
      s"identicalScaled=${r1scaled == r01}")
    spark.catalog.clearCache()

    // 3. LSH dedup -> clusters -> survivorship composition
    // (probabilistic recall: expect ≈10×, report the ratio).
    val s01 = timed("q148-survivors-sf0.1")(survivorCount(spark, sf01))
    spark.catalog.clearCache()
    val s1 = timed("q148-survivors-sf1")(survivorCount(spark, out))
    println(f"rehearsal: q148 survivors sf0.1=$s01 sf1=$s1 " +
      f"ratio=${s1.toDouble / s01}%.3f (predicted 10.0)")
    spark.catalog.clearCache()

    // 4. Containment pairs must scale EXACTLY 10×: the replica cipher
    // is a bijection on tokens (so shingle-set structure, posting-list
    // sizes, hub cuts, and containment values per replica all mirror
    // the original exactly) and replica shingle domains are disjoint
    // (no cross-replica candidates).
    val c01 = timed("q213-containment-sf0.1")(
      graft.operators.Dedup.containmentPairs(
        spark.read.parquet(s"$sf01/documents.parquet"),
        "doc_id", "text", k = 3, threshold = 0.8).count())
    spark.catalog.clearCache()
    val c1 = timed("q213-containment-sf1")(
      graft.operators.Dedup.containmentPairs(
        spark.read.parquet(s"$out/documents.parquet"),
        "doc_id", "text", k = 3, threshold = 0.8).count())
    println(s"rehearsal: q213 pairs sf0.1=$c01 sf1=$c1 " +
      s"exact10x=${c1 == 10 * c01}")
    spark.catalog.clearCache()

    // 5. Walk corpus rows must scale EXACTLY with the seed set: the
    // bipartite graph is symmetric (no sinks), so every seed yields
    // exactly steps+1 rows — 10× seeds over the 10× graph = 10× rows,
    // proving the per-step joins neither drop nor duplicate under the
    // bigger ranked-edge relation.
    def walkRows(dir: String): Long = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
      val pairsG = li.join(ord, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("p"))
        .distinct().persist()
      val edges = pairsG.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(pairsG.select(col("p").as("src"), col("c").as("dst")))
      val seeds = ord.select(col("o_custkey")).distinct()
        .filter(col("o_custkey") % 100 === 0)
        .select((col("o_custkey") * 2).as("id"))
      val n = graft.operators.Ops.randomWalks(edges, seeds, steps = 4,
        salt = "w1").count()
      pairsG.unpersist(blocking = false)
      n
    }
    val w01 = timed("q211-walk-rows-sf0.1")(walkRows(sf01))
    spark.catalog.clearCache()
    val w1 = timed("q211-walk-rows-sf1")(walkRows(out))
    println(s"rehearsal: q211 walk rows sf0.1=$w01 sf1=$w1 " +
      s"exact10x=${w1 == 10 * w01}")
    spark.catalog.clearCache()

    // 6. Variable-span EXACTSUBSTR totals must scale EXACTLY 10×: the
    // replica cipher is a token bijection (each replica's internal
    // segment-duplication structure mirrors the original exactly) and
    // replica segment domains are disjoint (no cross-replica window
    // ever matches), so Σ dup_tokens and Σ n_spans are both exactly
    // 10× the originals — proving the (g, md5) rank window and the
    // island merge neither drop nor double-count at 10× input.
    def spanTotals(dir: String): (Long, Long) = {
      val row = graft.operators.Curation.segmentDedupSpans(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        grans = Seq(100, 50, 20))
        .agg(sum(col("dup_tokens")), sum(col("n_spans"))).head()
      (row.getLong(0), row.getLong(1))
    }
    val sp01 = timed("q222-span-totals-sf0.1")(spanTotals(sf01))
    spark.catalog.clearCache()
    val sp1 = timed("q222-span-totals-sf1")(spanTotals(out))
    println(s"rehearsal: q222 dup_tokens sf0.1=${sp01._1} sf1=${sp1._1} " +
      s"spans sf0.1=${sp01._2} sf1=${sp1._2} " +
      s"exact10x=${sp1._1 == 10 * sp01._1 && sp1._2 == 10 * sp01._2}")
    spark.catalog.clearCache()

    // 7. k-core: node count and degree mass must scale EXACTLY 10×.
    // The replicated lineitem shares the part domain (only order keys
    // shift), so the 10× graph is built by re-offsetting part keys
    // per replica (r = l_orderkey div 1e8) while HASH-THINNING ON THE
    // UNSHIFTED keys — each replica then contains the IDENTICAL
    // thinned co-occurrence graph on a disjoint id range, the peel
    // cascade runs the same 12 rounds in every copy, and the union's
    // core is exactly 10 disjoint copies of the sf0.1 core.
    def kcoreTotals(dir: String, tenX: Boolean): (Long, Long) = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"),
          (col("l_orderkey") / 100000000L).cast("long").as("rep"),
          col("l_partkey"))
        .select(col("l_orderkey"), col("l_partkey").as("u0"),
          (col("l_partkey") +
            (if (tenX) col("rep") * 10000000L else lit(0L))).as("uid"))
        .distinct()
      val edges = li.select(col("l_orderkey"), col("u0"), col("uid"))
        .join(li.select(col("l_orderkey"), col("u0").as("v0"),
          col("uid").as("vid")), "l_orderkey")
        .filter(col("u0") < col("v0") &&
          (col("u0") * 1009 + col("v0")) % 29 === 0)
        .select(col("uid").as("u"), col("vid").as("v")).distinct()
      val core = graft.operators.Ops.kCore(edges, k = 3)
      val row = core.agg(count(lit(1)), sum(col("deg"))).head()
      val res = (row.getLong(0), row.getLong(1))
      core.unpersist(blocking = false)
      res
    }
    val kc01 = timed("q225-kcore-sf0.1")(kcoreTotals(sf01, tenX = false))
    spark.catalog.clearCache()
    val kc1 = timed("q225-kcore-sf1")(kcoreTotals(out, tenX = true))
    println(s"rehearsal: q225 core nodes sf0.1=${kc01._1} sf1=${kc1._1} " +
      s"degmass sf0.1=${kc01._2} sf1=${kc1._2} " +
      s"exact10x=${kc1._1 == 10 * kc01._1 && kc1._2 == 10 * kc01._2}")
    spark.catalog.clearCache()

    // 8. HITS: on 10 disjoint identical copies (customer AND supplier
    // ids re-offset per replica) every copy reaches the same scores
    // and the global max-normalization is over identical maxima — so
    // node count and the rounded score masses must all be EXACTLY
    // 10× the originals.
    def hitsTotals(dir: String, tenX: Boolean): (Long, Double, Double) = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
      val rep = (col("o_orderkey") / 100000000L).cast("long")
      val off = if (tenX) rep * 10000000L else lit(0L)
      val edges = li.join(ord, col("o_orderkey") === col("l_orderkey"))
        .select(((col("o_custkey") + off) * 2).as("src"),
          ((col("l_suppkey") + off) * 2 + 1).as("dst"))
        .distinct()
      val sc = graft.operators.Ops.hits(edges, iters = 2)
      val row = sc.agg(count(lit(1)),
        sum(round(col("hub"), 6).cast("decimal(30,6)")),
        sum(round(col("auth"), 6).cast("decimal(30,6)"))).head()
      val res = (row.getLong(0), row.getDecimal(1).doubleValue,
        row.getDecimal(2).doubleValue)
      sc.unpersist(blocking = false)
      res
    }
    val h01 = timed("q226-hits-sf0.1")(hitsTotals(sf01, tenX = false))
    spark.catalog.clearCache()
    val h1 = timed("q226-hits-sf1")(hitsTotals(out, tenX = true))
    println(s"rehearsal: q226 nodes sf0.1=${h01._1} sf1=${h1._1} " +
      s"hubmass sf0.1=${h01._2} sf1=${h1._2} " +
      s"authmass sf0.1=${h01._3} sf1=${h1._3} " +
      s"exact10x=${h1._1 == 10 * h01._1 &&
        math.abs(h1._2 - 10 * h01._2) < 1e-6 &&
        math.abs(h1._3 - 10 * h01._3) < 1e-6}")
    spark.catalog.clearCache()

    // 9. Label propagation: the 10× graph (q225's per-replica
    // re-offset construction) is 10 disjoint id-shifted copies, and
    // monotone LPA is a pure function of structure + WITHIN-COMPONENT
    // id order, which the constant per-replica offset preserves — so
    // community count and member total must be EXACTLY 10× and the
    // largest community the same size, proving the vote/clamp rounds
    // neither merge across copies nor diverge under 10× relations.
    def lpaTotals(dir: String, tenX: Boolean): (Long, Long, Long) = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"),
          (col("l_orderkey") / 100000000L).cast("long").as("rep"),
          col("l_partkey"))
        .select(col("l_orderkey"), col("l_partkey").as("u0"),
          (col("l_partkey") +
            (if (tenX) col("rep") * 10000000L else lit(0L))).as("uid"))
        .distinct()
      val edges = li.select(col("l_orderkey"), col("u0"), col("uid"))
        .join(li.select(col("l_orderkey"), col("u0").as("v0"),
          col("uid").as("vid")), "l_orderkey")
        .filter(col("u0") < col("v0") &&
          (col("u0") * 1009 + col("v0")) % 29 === 0)
        .select(col("uid").as("u"), col("vid").as("v")).distinct()
      val comms = graft.operators.Ops.labelPropagation(edges)
        .groupBy(col("label")).agg(count(lit(1)).as("sz"))
      val row = comms.agg(count(lit(1)), sum(col("sz")), max(col("sz")))
        .head()
      (row.getLong(0), row.getLong(1), row.getLong(2))
    }
    val lp01 = timed("q229-labelprop-sf0.1")(lpaTotals(sf01, tenX = false))
    spark.catalog.clearCache()
    val lp1 = timed("q229-labelprop-sf1")(lpaTotals(out, tenX = true))
    println(s"rehearsal: q229 comms sf0.1=${lp01._1} sf1=${lp1._1} " +
      s"members sf0.1=${lp01._2} sf1=${lp1._2} " +
      s"maxsz sf0.1=${lp01._3} sf1=${lp1._3} " +
      s"exact10x=${lp1._1 == 10 * lp01._1 && lp1._2 == 10 * lp01._2 &&
        lp1._3 == lp01._3}")
    spark.catalog.clearCache()

    // 10. Span attribution: on the 10× documents corpus (disjoint
    // token domains per replica) span count, span token mass, AND the
    // attribution displacement Σ(id − owner) must all be EXACTLY 10× —
    // the per-replica id offset cancels in (id − owner), so the owner
    // join neither crosses replicas nor picks a different first
    // occurrence at 10× input.
    def ownerTotals(dir: String): (Long, Long, Long) = {
      val row = graft.operators.Curation.segmentDedupSpanOwners(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        grans = Seq(100, 50, 20))
        .agg(count(lit(1)),
          sum((col("end") - col("start")).cast("long")),
          sum(col("id") - col("owner"))).head()
      (row.getLong(0), row.getLong(1), row.getLong(2))
    }
    val ow01 = timed("q230-owners-sf0.1")(ownerTotals(sf01))
    spark.catalog.clearCache()
    val ow1 = timed("q230-owners-sf1")(ownerTotals(out))
    println(s"rehearsal: q230 spans sf0.1=${ow01._1} sf1=${ow1._1} " +
      s"mass sf0.1=${ow01._2} sf1=${ow1._2} " +
      s"displacement sf0.1=${ow01._3} sf1=${ow1._3} " +
      s"exact10x=${ow1._1 == 10 * ow01._1 && ow1._2 == 10 * ow01._2 &&
        ow1._3 == 10 * ow01._3}")
    spark.catalog.clearCache()

    // 11. BM25: replica token domains are disjoint, so each replica's
    // queries retrieve only within their replica and the result is
    // exactly 10× rows; self-retrieval@1 must also scale exactly
    // (the N grows 10× while per-term df stays replica-local, which
    // re-weights idf — ranks may legitimately reshuffle below the
    // self hit, so the invariants are row count and self@1, not the
    // full ranking). maxDfFrac=1.0 mirrors q232's tiny-vocab setting;
    // on this degenerate corpus every doc matches every same-replica
    // query, so this run is also the operator's densest stress case.
    def bm25Totals(dir: String): (Long, Long) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val qs = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(filter(split(col("text"), " "),
            t => t =!= ""), 1, 5), " ").as("qtext"))
      val top = graft.operators.Curation.bm25TopK(docs, "doc_id", "text",
        qs, "query_id", "qtext", k = 5, maxDfFrac = 1.0)
      val row = top.agg(count(lit(1)),
        sum(when(col("rk") === 1 && col("query_id") === col("doc_id"), 1L)
          .otherwise(0L))).head()
      (row.getLong(0), row.getLong(1))
    }
    val bm01 = timed("q232-bm25-sf0.1")(bm25Totals(sf01))
    spark.catalog.clearCache()
    val bm1 = timed("q232-bm25-sf1")(bm25Totals(out))
    println(s"rehearsal: q232 rows sf0.1=${bm01._1} sf1=${bm1._1} " +
      s"self@1 sf0.1=${bm01._2} sf1=${bm1._2} " +
      s"exact10x=${bm1._1 == 10 * bm01._1 && bm1._2 == 10 * bm01._2}")
    spark.catalog.clearCache()

    // 12. Anchored spans (q237): the replica cipher rewrites token
    // HASHES, so anchor positions differ per replica and a 10× count
    // invariant would be wrong by construction. The valid invariant
    // is ISOLATION: replica 0 inside the 10× corpus is the original
    // corpus verbatim, and disjoint replica token domains mean no
    // segment ever matches across replicas — so replica 0's per-doc
    // span rows inside the 10× run must equal the standalone sf0.1
    // run EXACTLY (adding 9× unrelated data changes nothing).
    def anchoredRows(dir: String, cap: Long): Map[Long, (Long, Long, Long)] =
      graft.operators.Curation.anchoredDedupSpans(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
        .filter(col("id") < cap)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val an01 = timed("q237-anchored-sf0.1")(anchoredRows(sf01, Long.MaxValue))
    spark.catalog.clearCache()
    val an1 = timed("q237-anchored-sf1")(anchoredRows(out, 10000000L))
    println(s"rehearsal: q237 docs sf0.1=${an01.size} sf1r0=${an1.size} " +
      s"dupmass sf0.1=${an01.values.map(_._2).sum} " +
      s"sf1r0=${an1.values.map(_._2).sum} isolation=${an01 == an1}")
    spark.catalog.clearCache()

    // 13. Manifest update (q239): the additive merge is scale-free —
    // folding the %11 delta into the standing manifest over the 10×
    // corpus must equal a full rebuild bit-for-bit (counts, token
    // sums, decimal fingerprints, id bounds).
    def manifestExact(dir: String): Boolean = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val upd = graft.operators.Ops.manifestUpdate(
        graft.operators.Ops.shardManifest(
          docs.filter(col("doc_id") % 11 =!= 0), "doc_id", "text", 8, "rx"),
        docs.filter(col("doc_id") % 11 === 0), "doc_id", "text", 8, "rx")
      val full = graft.operators.Ops.shardManifest(
        docs, "doc_id", "text", 8, "rx")
      upd.orderBy("shard").collect().toSeq ==
        full.orderBy("shard").collect().toSeq
    }
    val mu1 = timed("q239-manifest-sf1")(manifestExact(out))
    println(s"rehearsal: q239 update==rebuild at sf1: $mu1")
    rehearseR16(spark, sf01)
    rehearseR17(spark, sf01)
    spark.stop()
  }

  /** r16 rows (VERDICT r15 #6): repetition gate counts and the
    * Bradley-Terry fit at 10×. Both build their 10× corpus in-memory
    * (neither touches the ciphered target/sf1 — see each invariant's
    * note), so they also run standalone: `runMain ... r16`.
    */
  private def rehearseR16(spark: SparkSession, sf01: String): Unit = {
    // 14. Repetition battery (q245): the battery is a PURE per-doc
    // function with zero cross-doc interaction, so the valid 10×
    // corpus is plain replication under fresh doc ids (the cipher
    // would rewrite the ' line ' token the query's paragraph rewrite
    // keys on and change every stat by construction). The invariant:
    // every per-lang gate count and integer mass scales EXACTLY 10× —
    // the per-lang hash-agg neither merges nor drops at volume.
    def repTotals(docs: DataFrame): Map[String, Seq[Long]] = {
      val stats = graft.functions.TextFunctions.repetitionStats(
        regexp_replace(col("text"), " line ", "\n"))
      val st = docs.select(
        col("lang") +: stats.map { case (nm, c) => c.as(nm) }: _*)
      val fDl = col("dup_lines") * 10 > col("n_lines") * 3
      val fDlc = col("dup_line_chars") * 5 > col("line_chars")
      val fT2 = col("top2_num") * 5 > col("gram_den")
      val fT3 = col("top3_num") * 100 > col("gram_den") * 18
      val fD5 = col("dup5_masked") * 100 > col("gram_den") * 15
      st.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          count(when(!fDl && !fDlc && !fT2 && !fT3 && !fD5, lit(1)))
            .as("kept"),
          count(when(fDl, lit(1))).as("f_dupline"),
          count(when(fDlc, lit(1))).as("f_duplinechar"),
          count(when(fT2, lit(1))).as("f_top2"),
          count(when(fT3, lit(1))).as("f_top3"),
          count(when(fD5, lit(1))).as("f_dup5"),
          sum(col("gram_den")).as("s_den"),
          sum(col("dup5_masked")).as("s_masked"))
        .collect()
        .map(r => r.getString(0) -> (1 to 9).map(r.getLong).toSeq)
        .toMap
    }
    val docs01 = spark.read.parquet(s"$sf01/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val docs10 = docs01
      .withColumn("r", explode(sequence(lit(0), lit(9))))
      .select((col("doc_id") + col("r").cast("long") * 10000000L)
        .as("doc_id"), col("lang"), col("text"))
      .repartition(32)
    val rp01 = timed("q245-repetition-sf0.1")(repTotals(docs01))
    val rp1 = timed("q245-repetition-10x")(repTotals(docs10))
    val repExact = rp01.keySet == rp1.keySet &&
      rp01.forall { case (l, v) => rp1(l) == v.map(_ * 10) }
    // Seq indices into the row built above: 0=n_docs, 1=kept,
    // 7=s_den, 8=s_masked (ADVICE r16: head/_(0) printed total/total)
    println(s"rehearsal: q245 langs=${rp01.size} " +
      s"sf0.1 kept=${rp01.values.map(_(1)).sum}/" +
      s"${rp01.values.map(_(0)).sum} masked=${rp01.values.map(_(8)).sum} " +
      s"exact10x=$repExact")

    // 15. Bradley-Terry (q248): replicate the CONTEST relation 10×
    // with per-replica ITEM tags — disjoint item domains make 10
    // independent copies of the same comparison graph, the MM
    // fixpoint decomposes per copy (every join/agg is item-keyed),
    // and the final normalization is invariant because the score sum
    // and the item count both scale by the same 10. Invariant:
    // replica 0's (item, n_games, n_wins, score) rows inside the 10×
    // fit equal the standalone fit EXACTLY (rounded scores
    // bit-equal), and total rows/games are exactly 10×.
    def contests(dir: String): DataFrame = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
      val a = docs.select(col("doc_id"), col("source").as("sa"),
        col("q").as("qa"))
      val b = docs.select((col("doc_id") - 1).as("doc_id"),
        col("source").as("sb"), col("q").as("qb"))
      a.join(b, "doc_id").filter(col("sa") =!= col("sb"))
        .select(when(col("qa") >= col("qb"), col("sa"))
          .otherwise(col("sb")).as("w"),
          when(col("qa") >= col("qb"), col("sb"))
            .otherwise(col("sa")).as("l"))
    }
    val ct = contests(sf01).localCheckpoint(true)
    val base = timed("q248-bt-sf0.1")(
      graft.operators.Ops.bradleyTerry(ct, "w", "l", iters = 8)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap)
    val ct10 = ct.withColumn("r", explode(sequence(lit(0), lit(9))))
      .select(concat(lit("r"), col("r"), lit("_"), col("w")).as("w"),
        concat(lit("r"), col("r"), lit("_"), col("l")).as("l"))
      .repartition(32)
    val fit10 = timed("q248-bt-10x")(
      graft.operators.Ops.bradleyTerry(ct10, "w", "l", iters = 8)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap)
    val r0 = fit10.collect {
      case (k, v) if k.startsWith("r0_") => k.stripPrefix("r0_") -> v
    }
    val btRows10 = fit10.size == 10 * base.size
    val btGames10 = fit10.values.map(_._1).sum == 10 * base.values.map(_._1).sum
    val btBitEqual = r0 == base
    println(s"rehearsal: q248 items sf0.1=${base.size} 10x=${fit10.size} " +
      s"rows10x=$btRows10 games10x=$btGames10 replica0BitEqual=$btBitEqual")
    ct.unpersist(false)
  }

  /** r17 rows (VERDICT r16 #6 tail): HTML extraction counter scaling
    * and novelty replica isolation. In-memory 10× inputs like the r16
    * rows; also runs standalone: `runMain ... r17`.
    */
  private def rehearseR17(spark: SparkSession, sf01: String): Unit = {
    // 16. HTML extraction (q249/q250 front half): htmlExtract and
    // anchorHrefs are PURE per-page kernels with zero cross-doc state,
    // so plain replication under fresh doc ids must scale every
    // per-source counter EXACTLY 10× — pages, extracted pages, kept
    // main-text char mass, kept/total block counts, outlinks. The
    // replica id offset is 7,000,000 = 7·10⁶ (divisible by 7, so the
    // fixture's `doc_id % 7` conditional <ul> hits the same docs in
    // every replica; also ≡ 0 mod 10 for row 17's ref/batch split).
    val docs01 = spark.read.parquet(s"$sf01/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    def times10(docs: DataFrame): DataFrame = docs
      .withColumn("r", explode(sequence(lit(0), lit(9))))
      .select((col("doc_id") + col("r").cast("long") * 7000000L)
        .as("doc_id"), col("source"), col("lang"), col("text"))
      .repartition(32)
    def extractTotals(docs: DataFrame): Map[String, Seq[Long]] = {
      val page = graft.queries.TextQueries.htmlPageCol
      val f = graft.functions.TextFunctions.htmlExtract(page).toMap
      docs.select(col("source"),
          f("main_text").as("mt"), f("n_blocks").as("nb"),
          f("kept_blocks").as("kb"), f("kept_chars").as("kc"),
          size(graft.functions.HtmlExpr.anchorHrefs(page)).as("nl"))
        .groupBy(col("source")).agg(
          count(lit(1)).as("n_pages"),
          count(when(col("mt") =!= "", 1)).as("n_extracted"),
          sum(col("nb")).as("blocks"),
          sum(col("kb")).as("kept_blocks"),
          sum(col("kc")).as("kept_chars"),
          sum(col("nl")).as("outlinks"))
        .collect()
        .map(r => r.getString(0) -> (1 to 6).map(r.getLong).toSeq)
        .toMap
    }
    val ex01 = timed("q249-extract-sf0.1")(extractTotals(docs01))
    val ex10 = timed("q249-extract-10x")(extractTotals(times10(docs01)))
    val exExact = ex01.keySet == ex10.keySet &&
      ex01.forall { case (s, v) => ex10(s) == v.map(_ * 10) }
    println(s"rehearsal: q249 sources=${ex01.size} " +
      s"sf0.1 pages=${ex01.values.map(_.head).sum} " +
      s"outlinks=${ex01.values.map(_(5)).sum} exact10x=$exExact")

    // 17. n-gram novelty (q256) replica ISOLATION: each replica gets a
    // disjoint shingle domain (per-replica token tag + letter cipher —
    // a token bijection, so within a replica the shingle equality
    // structure mirrors the original exactly, and across replicas no
    // shingle collides). Invariants: the 10× run emits EXACTLY 10×
    // rows, and EVERY replica's (n_shingles, n_novel, novelty) rows
    // bit-equal the standalone sf0.1 run after the id offset is
    // stripped — any cross-replica contamination of the standing set
    // (or a dropped replica in the seen-set hash-agg) breaks it.
    def ciphered(docs: DataFrame): DataFrame = (0 until 10).map { r =>
      if (r == 0) docs.select(col("doc_id"), col("text"))
      else {
        val tag = s"q${r}x"
        docs.select(
          (col("doc_id") + lit(r.toLong * 7000000L)).as("doc_id"),
          array_join(transform(
            filter(split(col("text"), " "), t => t =!= ""),
            t => concat(lit(tag),
              translate(t, Lower + Lower.toUpperCase,
                shifted(r) + shifted(r).toUpperCase))), " ").as("text"))
      }
    }.reduce(_ unionByName _).repartition(32)
    def novelty(docs: DataFrame): Map[Long, (Long, Long, Double)] =
      graft.operators.Curation.ngramNovelty(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", k = 5)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
    val nv01 = timed("q256-novelty-sf0.1")(novelty(
      docs01.select(col("doc_id"), col("text"))))
    val nv10 = timed("q256-novelty-10x")(novelty(ciphered(docs01)))
    val nvRows10 = nv10.size == 10 * nv01.size
    val nvIsolated = nv10.forall { case (id, v) => nv01(id % 7000000L) == v }
    println(s"rehearsal: q256 docs sf0.1=${nv01.size} 10x=${nv10.size} " +
      s"rows10x=$nvRows10 replicasBitEqual=$nvIsolated")
  }

  /** r18 row (VERDICT r17 next #7): WARC container scan at realistic
    * file counts. Every prior q259/q265 fixture was driver-written
    * and small; this row generates the containers DISTRIBUTED — each
    * task streams its partition's pages into its OWN .warc.gz (the
    * exact layout a distributed WARC export produces; on a cluster
    * the local-file write becomes a Hadoop-FS stream, the per-task
    * unit is identical) — and proves the two container-scan scale
    * claims directly:
    *  (a) parallelism = file count: gzip members are unsplittable, so
    *      one task per .warc.gz is the unit of work (what every
    *      Common Crawl consumer gets); the 10× corpus lands in 10×
    *      the files and the scan must report exactly that many
    *      partitions.
    *  (b) content transparency at volume: per-source extraction
    *      counters over the DECODED payloads (the q249 battery:
    *      pages, extracted, block/char masses, outlinks) must be
    *      EXACTLY 10× the 1× container run — framing + gzip + HTTP
    *      split + UTF-8 lose nothing at file-count scale.
    */
  /** r19 row (VERDICT r18 next #1's 10× half): the capture-index
    * point lookup must stay O(one file) as the index grows — publish
    * a sorted CDX at N and 10N urlkeys (10× FILES at constant
    * per-file rows, the production posture: file size fixed, file
    * count grows), then verify at BOTH scales that (a) per-file
    * urlkey ranges are pairwise disjoint and (b) exactly ONE file's
    * [min, max] covers a point key — the footer-stat invariant that
    * makes the lookup independent of index size on a 1000-executor
    * cluster.
    */
  private def rehearseR19(spark: SparkSession): Unit = {
    def buildIdx(n: Long, files: Int, dir: String): Array[(String, String)] = {
      spark.range(n).select(
          format_string("example,h%07d)/p", col("id")).as("urlkey"),
          lit("20260101000000").as("ts14"),
          md5(col("id").cast("string")).as("digest"))
        .repartitionByRange(files, col("urlkey"), col("ts14"))
        .sortWithinPartitions(col("urlkey"), col("ts14"))
        .write.mode("overwrite").parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col("urlkey")), max(col("urlkey"))).head
          (r.getString(0), r.getString(1))
        }.sortBy(_._1)
    }
    def disjoint(spans: Array[(String, String)]): Boolean =
      spans.sliding(2).forall {
        case Array((_, hi), (lo2, _)) => hi < lo2
        case _ => true
      }
    val key = "example,h0050000)/p"
    def covering(spans: Array[(String, String)]): Int =
      spans.count { case (lo, hi) => lo <= key && key <= hi }
    val s01 = timed("cdx-index-build-n")(
      buildIdx(100000L, 16, "target/cdx_r19/n1"))
    val s10 = timed("cdx-index-build-10n")(
      buildIdx(1000000L, 160, "target/cdx_r19/n10"))
    val hit = timed("cdx-point-lookup-10n")(
      spark.read.parquet("target/cdx_r19/n10")
        .filter(col("urlkey") === key).count())
    println(s"rehearsal: cdx files=${s01.length}->${s10.length} " +
      s"disjointN=${disjoint(s01)} disjoint10N=${disjoint(s10)} " +
      s"coveringN=${covering(s01)} covering10N=${covering(s10)} " +
      s"lookupRows=$hit")

    // Replay-locator row (the q284 invariant at scale): the reader's
    // per-member extents must TILE every container byte-exactly —
    // offset 0, no gaps/overlaps, last extent ending at file size —
    // at N and 10N files (task-per-file, so the check is per-task
    // local and scale-free by construction; what 10× proves is that
    // the distributed member accounting never drifts when the fleet
    // grows). Containers written distributed, one task per file, the
    // r18 writeWarc posture.
    def writeFleet(n: Long, nFiles: Int, dir: String): Unit = {
      val d = new java.io.File(dir)
      d.mkdirs()
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".warc.gz")).foreach(_.delete())
      spark.range(n).select(col("id"),
          format_string("doc body %d with deterministic filler", col("id"))
            .as("body"))
        .repartition(nFiles, col("id"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          if (it.hasNext) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val _ = graft.formats.Warc.write(f"$dir/part-$pid%05d.warc.gz",
              it.map { r =>
                ("response", s"https://r.example/doc/${r.getLong(0)}",
                  "2026-05-01T00:00:00Z",
                  r.getString(1).getBytes(
                    java.nio.charset.StandardCharsets.UTF_8),
                  Int.box(200): java.lang.Integer, "text/plain")
              })
          }
        }
    }
    def tiling(dir: String): (Long, Long, Boolean) = {
      val scan = graft.formats.Warc.readMembers(spark, s"$dir/*.warc.gz")
      val perFile = scan.groupBy(col("path"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("member_offset")).as("n_off"),
          min(col("member_offset")).as("lo"),
          max(col("member_offset") + col("member_length")).as("end"),
          sum(col("member_length")).as("bytes"))
        .collect()
      val sizes = perFile.map { r =>
        val f = new java.io.File(r.getString(0).stripPrefix("file:"))
        val tiled = r.getLong(3) == 0L && r.getLong(4) == f.length() &&
          r.getLong(5) == f.length() && r.getLong(1) == r.getLong(2)
        (r.getLong(1), tiled)
      }
      (sizes.length.toLong, sizes.map(_._1).sum, sizes.forall(_._2))
    }
    writeFleet(10000L, 8, "target/warcloc_r19/n1")
    writeFleet(100000L, 80, "target/warcloc_r19/n10")
    val (f1, r1, t1) = timed("warc-locator-tiling-n")(
      tiling("target/warcloc_r19/n1"))
    val (f10, r10, t10) = timed("warc-locator-tiling-10n")(
      tiling("target/warcloc_r19/n10"))
    println(s"rehearsal: warc-locators files=$f1->$f10 recs=$r1->$r10 " +
      s"exact10x=${r10 == 10 * r1} tiledN=$t1 tiled10N=$t10")

    // Harmonic-centrality row (q292/q293 invariant at scale): C
    // disjoint ring-with-chord components — per-node scores are a
    // pure function of position in the component, so 10× components
    // must give EXACTLY 10× output rows with an identical per-score
    // histogram, and HyperBall (whose state is O(V) sketches either
    // way) must stay bit-equal to exact while balls sit in the
    // sparse-exact range. This is the property that makes the pair
    // (exact for host graphs, HyperBall for the web) trustworthy:
    // growth changes ROW COUNT, never per-node values.
    def ringEdges(comps: Int): DataFrame =
      spark.range(comps.toLong).select(col("id").as("c"))
        .withColumn("i", explode(sequence(lit(0), lit(9))))
        .select(
          concat(col("c"), lit(":"), col("i")).as("src"),
          concat(col("c"), lit(":"), (col("i") + 1) % 10).as("dst"))
        .unionByName(spark.range(comps.toLong).select(
          concat(col("id"), lit(":0")).as("src"),
          concat(col("id"), lit(":5")).as("dst")))
    def hist(df: DataFrame): (Long, Map[(Long, Long), Long]) = {
      val rows = df.groupBy(col("reached"), col("harmonic_e6"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      (rows.values.sum, rows)
    }
    val (hn, hh) = timed("harmonic-exact-n")(
      hist(graft.operators.Ops.harmonicCentrality(ringEdges(30), 6)))
    val (h10, hh10) = timed("harmonic-exact-10n")(
      hist(graft.operators.Ops.harmonicCentrality(ringEdges(300), 6)))
    val (bn, bh) = timed("harmonic-hyperball-n")(
      hist(graft.operators.Ops.hyperBallCentrality(ringEdges(30), 6)))
    val (b10, bh10) = timed("harmonic-hyperball-10n")(
      hist(graft.operators.Ops.hyperBallCentrality(ringEdges(300), 6)))
    val scaled = hh.map { case (k, v) => k -> v * 10 }
    println(s"rehearsal: harmonic rows=$hn->$h10 " +
      s"exact10x=${h10 == 10 * hn && hh10 == scaled} " +
      s"hyperballEqualN=${bn == hn && bh == hh} " +
      s"hyperballEqual10N=${b10 == h10 && bh10 == hh10}")
  }

  private def rehearseR18(spark: SparkSession, sf01: String): Unit = {
    import java.nio.charset.StandardCharsets.UTF_8
    val docs01 = spark.read.parquet(s"$sf01/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    def times10(docs: DataFrame): DataFrame = docs
      .withColumn("r", explode(sequence(lit(0), lit(9))))
      .select((col("doc_id") + col("r").cast("long") * 7000000L)
        .as("doc_id"), col("source"), col("lang"), col("text"))
    def writeWarc(docs: DataFrame, dir: String, nFiles: Int): Int = {
      val d = new java.io.File(dir)
      d.mkdirs()
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".warc.gz")).foreach(_.delete())
      val page = graft.queries.TextQueries.htmlPageCol
      docs.select(col("doc_id"), col("source"), page.as("html"))
        .repartition(nFiles, col("doc_id"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          if (it.hasNext) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            // extents discarded: this rehearsal writes, it doesn't index
            val _ = graft.formats.Warc.write(f"$dir/part-$pid%05d.warc.gz",
              it.map { r =>
                val id = r.getLong(0)
                ("response",
                  s"https://${r.getString(1)}.example/doc/$id",
                  f"2026-04-${id % 28 + 1}%02dT00:00:00Z",
                  r.getString(2).getBytes(UTF_8),
                  Int.box(200): java.lang.Integer,
                  "text/html; charset=utf-8")
              })
          }
        }
      Option(d.listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".warc.gz"))
    }
    def scanTotals(glob: String,
                   minParts: Int): (Int, Long, Map[String, Seq[Long]]) = {
      val raw = graft.formats.Warc.read(spark, glob, minPartitions = minParts)
      val nParts = raw.rdd.getNumPartitions
      val pages = raw.filter(col("warc_type") === "response")
        .select(substring_index(substring_index(col("url"), "/", 3),
          "/", -1).as("host"),
          col("payload").cast("string").as("html"))
      val f = graft.functions.TextFunctions.htmlExtract(col("html")).toMap
      val per = pages.select(col("host"),
          f("main_text").as("mt"), f("n_blocks").as("nb"),
          f("kept_blocks").as("kb"), f("kept_chars").as("kc"),
          size(graft.functions.HtmlExpr.anchorHrefs(col("html"))).as("nl"))
        .groupBy(col("host")).agg(
          count(lit(1)).as("n_pages"),
          count(when(col("mt") =!= "", 1)).as("n_extracted"),
          sum(col("nb")).as("blocks"),
          sum(col("kb")).as("kept_blocks"),
          sum(col("kc")).as("kept_chars"),
          sum(col("nl")).as("outlinks"))
        .collect()
        .map(r => r.getString(0) -> (1 to 6).map(r.getLong).toSeq)
        .toMap
      (nParts, per.values.map(_.head).sum, per)
    }
    val files01 = timed("q259-warc-write-sf0.1")(
      writeWarc(docs01, "target/warc_r18/sf01", 8))
    val files10 = timed("q259-warc-write-10x")(
      writeWarc(times10(docs01), "target/warc_r18/sf1", 80))
    // minPartitions 4× the file count pushes the combine split size
    // below ANY single shard (shard sizes vary with page content, so
    // an avg-sized split still packs the small ones); gzip members
    // are unsplittable, so the scan can NEVER exceed one task per
    // file — the assert is that it reaches exactly that ceiling, the
    // parallelism a 1000-executor cluster actually gets from a
    // Common Crawl segment listing.
    val (p01, n01, t01) = timed("q259-warc-scan-sf0.1")(
      scanTotals("target/warc_r18/sf01/*.warc.gz", files01 * 4))
    val (p10, n10, t10) = timed("q259-warc-scan-10x")(
      scanTotals("target/warc_r18/sf1/*.warc.gz", files10 * 4))
    val taskPerFile = p01 == files01 && p10 == files10
    val exact10 = t01.keySet == t10.keySet &&
      t01.forall { case (s, v) => t10(s) == v.map(_ * 10) }
    println(s"rehearsal: q259 files sf0.1=$files01 10x=$files10 " +
      s"scanParts sf0.1=$p01 10x=$p10 taskPerFile=$taskPerFile " +
      s"pages sf0.1=$n01 10x=$n10 exact10x=$exact10")
    // capture index (q269): one row per response at BOTH scales, and
    // the distinct urlkeys match the row count (doc-unique paths —
    // the index projection neither drops nor duplicates at volume)
    def cdxTotals(glob: String): (Long, Long) = {
      val idx = graft.formats.Warc.cdxIndex(
        graft.formats.Warc.read(spark, glob))
      val row = idx.agg(count(lit(1)),
        countDistinct(col("urlkey"))).head()
      (row.getLong(0), row.getLong(1))
    }
    val cx01 = timed("q269-cdx-sf0.1")(
      cdxTotals("target/warc_r18/sf01/*.warc.gz"))
    val cx10 = timed("q269-cdx-10x")(
      cdxTotals("target/warc_r18/sf1/*.warc.gz"))
    println(s"rehearsal: q269 cdx rows sf0.1=${cx01._1} 10x=${cx10._1} " +
      s"exact10x=${cx10._1 == 10 * cx01._1 && cx01._1 == cx01._2 &&
        cx10._1 == cx10._2}")
  }

}
