package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the 100 TB story: these tests fail if a
  * future change silently reintroduces a shuffle, loses pushdown, or
  * breaks broadcast — the regressions that don't show up at sf0.01.
  */
class ScaleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("bucketed tables join WITHOUT a shuffle (co-located join)") {
    // The bucketing path replaces the per-join shuffle of a 100 TB
    // fact-fact join with a one-time bucketed write.
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
      val plan = executed(joined)
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() ==
        Tables(spark, sf, "lineitem").count()) // FK: every line has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("filters and projection reach the parquet scan") {
    val plan = executed(
      Tables(spark, sf, "lineitem")
        .filter($"l_quantity" > 40)
        .select($"l_orderkey", $"l_quantity"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40"),
      s"filter not pushed:\n$plan")
    assert("ReadSchema:.*l_orderkey.*l_quantity".r.findFirstIn(plan).isDefined)
    assert(!plan.contains("l_comment"), "column pruning lost")
  }

  test("star join broadcasts dims; fact side never shuffles for the join") {
    val plan = executed(SparkEntry.queries("q3_join_star")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only non-broadcast exchanges allowed are for the final agg/sort
    val joins = "SortMergeJoin".r.findAllIn(plan).length
    assert(joins == 0, s"dim join degraded to sort-merge:\n$plan")
  }

  test("global top-k compiles to TakeOrderedAndProject (no full sort)") {
    val plan = executed(SparkEntry.queries("q8_sort_limit")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("winnow dedup is equi-join shaped: no cartesian, no nested loop") {
    // Raw variant: the public builder localCheckpoints its result
    // (cache-release, VERDICT r12 #2), which collapses the executed
    // plan to a checkpoint scan — the gate must see the REAL plan.
    val (out, internals) = graft.operators.DedupPortable
      .winnowDuplicatePairsPortableRaw(Tables(spark, sf, "documents"),
        "doc_id", "text", k = 16, w = 8, threshold = 0.5)
    try {
      val plan = executed(out)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally internals.foreach(_.unpersist(false))
  }

  test("associationRules hot-basket cap: equi-join shaped, basket-partitioned window only") {
    // The one shape apriori can't bound is a single hot basket (B
    // frequent items → B²/2 pairs from ONE join key — AQE can spread
    // but not shrink them). The cap must stay relational: no
    // cartesian, no nested loop, and the sampling window partitioned
    // by basket — never a global (unpartitioned) window.
    val baskets = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("ck"), $"l_partkey".as("it"))
    val plan = executed(graft.operators.Ops.associationRules(
      baskets, "ck", "it", minSupport = 2L, minConfidence = 0.0,
      maxBasket = 8))
    assert(!plan.contains("CartesianProduct"), plan)
    // exactly one nested-loop join is allowed: the 1-row
    // broadcast(nTotal) scalar attach — data-sized sides never NLJ
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 1, plan)
    // every Window in the plan must carry a partition spec
    plan.split('\n').filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("windowspecdefinition(__ck"),
        s"unpartitioned or mis-partitioned window: $l")
    }
  }

  test("prefix-filter jaccard join: equi-join shaped end to end") {
    // q170 is EXACT all-pairs similarity — the gate proves the plan
    // still never goes quadratic: candidates ride a prefix-token
    // equi-join, verify is an id equi-join, nothing cartesian. Raw
    // variant: the public builder's localCheckpoint (cache-release,
    // VERDICT r12 #2) would collapse the plan the gate must inspect.
    for (mode <- Seq("all", "starEdges")) {
      val (out, internals) = graft.operators.Dedup.prefixJaccardPairsRaw(
        Tables(spark, sf, "documents"), "doc_id", "text",
        threshold = 0.9, pairsMode = mode)
      try {
        val plan = executed(out)
        assert(!plan.contains("CartesianProduct"), s"[$mode] $plan")
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"[$mode] $plan")
      } finally internals.foreach(_.unpersist(false))
    }
  }

  test("EXACTSUBSTR family: NO window over the segment-class key, no cartesian") {
    // VERDICT r14 #1: a class-partitioned window (partitionBy(g,
    // md5(seg))) serializes a boilerplate class repeated 10^9 times
    // into ONE sort task. The first-occurrence rule must be the
    // hash-aggregate + dup-class join form in every member of the
    // family — the only windows allowed in any executed plan are the
    // doc-bounded island merges, partitioned on the doc id.
    for (q <- Seq("q111_segment_dedup", "q222_dup_spans", "q230_span_owners",
                  "q237_anchored_spans")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"[$q] $plan")
      val windows = plan.split('\n').filter(_.contains("windowspecdefinition"))
      windows.foreach { l =>
        assert(l.contains("windowspecdefinition(id"),
          s"[$q] window not doc-partitioned (class-key window reintroduced?): $l")
        assert(!l.contains("md5"),
          s"[$q] window partitioned on the segment-class hash: $l")
      }
      // the first-occurrence rule must still be present as an aggregate
      assert(plan.contains("HashAggregate"), s"[$q] $plan")
    }
  }

  test("dsirSelect: broadcast bin table, heap top-k, no corpus-sized window") {
    // The B-row log-ratio table must broadcast into the occurrence
    // stream (the corpus never reshuffles on it) and the global top-k
    // must be a per-partition heap (TakeOrderedAndProject), not a
    // global sort. The only window is the k-row rank after the limit.
    // (no BNLJ assert: the 1-row corpus-totals crossJoin(broadcast(...))
    // compiles to a benign BroadcastNestedLoopJoin — the audited
    // repo-wide pattern for scalar stats)
    val plan = executed(SparkEntry.queries("q240_dsir_select")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("TakeOrderedAndProject"),
      s"dsir top-k lost its heap (global sort?):\n$plan")
    assert(plan.split('\n').count(_.contains("windowspecdefinition")) <= 1,
      s"dsir grew corpus windows:\n$plan")
  }

  test("perplexityBuckets: windows only over the bounded histogram") {
    // Tertile cutoffs come from a per-(label, 0.01-bin) HISTOGRAM —
    // bin-bounded regardless of corpus size. A window keyed by the
    // doc id (or none) means someone rewrote it as ntile-per-language,
    // which sorts whole languages in single tasks at 100 TB.
    val plan = executed(SparkEntry.queries("q241_ppl_buckets")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    val windows = plan.split('\n').filter(_.contains("windowspecdefinition"))
    assert(windows.nonEmpty, s"histogram cumsum window missing:\n$plan")
    windows.foreach { l =>
      assert(l.contains("windowspecdefinition(__lab"),
        s"window not histogram-partitioned: $l")
    }
  }

  test("urlnorm is a NARROW per-row map: zero exchanges before the sort") {
    // Canonicalization must stay embarrassingly parallel — the only
    // exchange in q223's plan is the final presentation ORDER BY.
    val plan = executed(SparkEntry.queries("q223_urlnorm")(spark, sf))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"urlnorm plan shuffles beyond the sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("runtime bloom filter: selective dim reaches the fact scan as might_contain") {
    // The 100 TB semi-join reduction: when a dim carries a selective
    // filter and the fact side is a shuffle join, Catalyst's
    // InjectRuntimeFilter builds a bloom filter from the dim keys and
    // pushes might_contain() into the fact scan — fact rows that
    // can't join die at the scan, before the shuffle. Local testdata
    // sits under the default 10MB/10GB size thresholds, so the gate
    // pins the behavior with them lowered; at production scale the
    // defaults fire on their own. Broadcast is disabled to force the
    // shuffle-join shape this rewrite targets.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val li = Tables(spark, sf, "lineitem")
      val p = Tables(spark, sf, "part").filter($"p_size" === 1)
      val j = li.join(p, li("l_partkey") === p("p_partkey"))
        .groupBy($"p_brand").agg(count(lit(1)).as("n"))
      val plan = executed(j)
      assert(plan.contains("bloom_filter_agg"), plan)
      assert(plan.contains("might_contain"), plan)
    } finally olds.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("stratified split: doc-level rank windows carry the bucket key") {
    // q174's rank must come from the bucketed distributed rank — a
    // whole-stratum window (partitioned by lang alone, ordered by the
    // doc-level (u, doc_id) key) would serialize the biggest lang
    // into one task at 100 TB. The tiny allocation windows (ordered
    // by fp/idx over the per-lang counts) are exempt: they never see
    // doc-level rows.
    val plan = executed(
      SparkEntry.queries("q174_stratified_split")(spark, sf))
    val docLevelWindows = plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .filter(_.contains("doc_id#")).toSeq
    assert(docLevelWindows.nonEmpty, plan)
    docLevelWindows.foreach(l =>
      assert(l.contains("_rg_bucket"), s"unbucketed doc-level window: $l"))
  }

  test("minhash LSH is equi-join shaped: no cartesian, no nested loop") {
    val plan = executed(SparkEntry.queries("q51_minhash_lsh")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("LSH->clusters->survivorship composition: no cartesian, no NLJ anywhere") {
    // q147/q148 replace the bounded all-pairs demo (q48/q71) with the
    // scale path: the pair source is the banded LSH join (gated by the
    // q51 test — same operator, same params); here we gate the
    // composition ABOVE the pair source. duplicateClusters checkpoints
    // eagerly, so the executed plan covers the singles anti-join, the
    // quality join and the rank window — none may degrade to a
    // cartesian or nested loop.
    val plan = executed(SparkEntry.queries("q148_lsh_survivorship")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // The keeper pick must be the SALTED two-phase top-1 (VERDICT r9
    // #1): phase 1 windows on (rep, __salt) so no hub cluster ever
    // sorts in one task; the only rep-only window is phase 2 over the
    // <=saltParts survivors per rep. A plain partitionBy(rep) keeper
    // window would drop the __salt key from every window line.
    val keeperWindows = plan.linesIterator
      .filter(l => l.contains("row_number"))
      .toSeq
    assert(keeperWindows.exists(_.contains("__salt")),
      s"keeper pick lost the salt phase (unsalted rep window):\n$plan")
    val clusterPlan = executed(SparkEntry.queries("q147_lsh_dup_clusters")(spark, sf))
    assert(!clusterPlan.contains("CartesianProduct"), clusterPlan)
    assert(!clusterPlan.contains("BroadcastNestedLoopJoin"), clusterPlan)
  }

  test("corpus recipe keeper pick is salted: no unsalted rep window") {
    // q157 composes gate -> LSH -> survivorship -> summary; the
    // survivorship stage must use the same salted top-1 as q148.
    val plan = executed(SparkEntry.queries("q157_corpus_recipe")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.linesIterator.filter(_.contains("row_number"))
      .exists(_.contains("__salt")),
      s"q157 keeper pick lost the salt phase:\n$plan")
  }

  test("simhash band join is equi-join shaped: no cartesian, no NLJ") {
    val plan = executed(SparkEntry.queries("q52_simhash_neardup")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("image phash dedup is banded: no cartesian, no NLJ on image pairs") {
    val plan = executed(SparkEntry.queries("q149_image_phash_dedup")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("bucketed as-of join windows on (key, bucket), never inequality-joins") {
    val plan = executed(SparkEntry.queries("q39_asof_bucketed")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the expensive window must partition on the bucket too — that's
    // the skew escape; a key-only window would be a silent regression
    val mainWindow = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("last("))
    assert(mainWindow.exists(l => l.contains("user_id") && l.contains("__bucket")),
      s"as-of window lost the bucket partition key:\n$plan")
    // the bucket must be an integral LONG (attrs print as __bucket#nL):
    // Column./ is true division, and a fractional Double bucket makes
    // every distinct timestamp its own group — skew-safety silently gone
    assert("__bucket#\\d+L".r.findFirstIn(plan).isDefined,
      s"__bucket is not a long (fractional buckets?):\n$plan")
  }

  test("text kernels stay inside whole-stage codegen") {
    // The expression must appear INSIDE a WholeStageCodegen span — a
    // codegen fallback would show it outside every *(n) region.
    val df = Tables(spark, sf, "documents")
      .select(graft.operators.Dedup.hashedShingles($"text", 3).as("h"))
      .select(sum(size($"h")))
    df.collect() // finalize AQE so codegen markers appear
    val plan = executed(df)
    // whole-stage-codegen spans print as *(n) markers; inspect the AQE
    // final plan only (the echoed initial plan has no markers)
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("*("), s"no codegen span:\n$finalPlan")
    val unsupported = finalPlan.linesIterator
      .filter(l => l.contains("Project") || l.contains("HashAggregate"))
      .filterNot(_.contains("*("))
    assert(unsupported.isEmpty,
      s"operator fell out of codegen:\n${unsupported.mkString("\n")}\n$finalPlan")
  }

  test("portable md5 kernels stay inside whole-stage codegen") {
    // Same gate as the text kernels, for the oracle-replayable family:
    // a codegen fallback would silently reintroduce the interpreted
    // per-element md5 these kernels exist to remove.
    val df = Tables(spark, sf, "documents")
      .select(
        graft.functions.PortableExpr.md5Shingles($"text", 3).as("hs"),
        graft.functions.PortableExpr.simhashMd5($"text").as("fp"),
        graft.functions.PortableExpr.winnowMd5($"text", 16, 8).as("wf"))
      // bit_xor, not sum: summing 60-bit fingerprints overflows ANSI longs
      .select(sum(size($"hs")) + bit_xor($"fp") + sum(size($"wf")))
    df.collect()
    val finalPlan = executed(df).split("== Initial Plan ==").head
    assert(finalPlan.contains("*("), s"no codegen span:\n$finalPlan")
    val unsupported = finalPlan.linesIterator
      .filter(l => l.contains("Project") || l.contains("HashAggregate"))
      .filterNot(_.contains("*("))
    assert(unsupported.isEmpty,
      s"portable kernel fell out of codegen:\n$finalPlan")
  }

  test("Q21-shape decorrelates to semi+anti equi-joins, never nested loops") {
    // Catalyst must rewrite the correlated EXISTS into a left-semi and
    // the NOT EXISTS into a left-anti hash join on l_orderkey; a
    // decorrelation regression would surface as a nested-loop or
    // cartesian over lineitem — the 100 TB killer.
    val plan = executed(SparkEntry.queries("q89_tpch_q21_shape")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftSemi"), s"EXISTS did not decorrelate:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS did not decorrelate:\n$plan")
  }

  test("hot kernels sit inside WholeStageCodegen spans in the AQE final plan") {
    // VERDICT r5 #3: gate the kernels on the REAL final plan (walking
    // WholeStageCodegenExec subtrees, stopping at InputAdapter), not on
    // the pre-AQE string whose codegen markers are always absent. A
    // kernel falling back to interpreted eval would vanish from every
    // span and fail here.
    import graft.functions.{ArrayMath, TextExpr}
    val textDf = Tables(spark, sf, "documents")
      .select(
        TextExpr.minhashSig(TextExpr.hashedShingles($"text", 3), 16).as("sig"),
        TextExpr.simhash64($"text").as("fp"))
      .select(sum(size($"sig")) + bit_xor($"fp"))
    val tp = Explain.finalPlan(textDf)
    assert(Explain.codegenSpans(tp) >= 1, tp.toString)
    Seq("minhashsig", "simhash64", "hashedshingles").foreach { k =>
      assert(Explain.inCodegen(tp, k), s"$k fell out of codegen:\n$tp")
    }
    val cosDf = Tables(spark, sf, "embeddings")
      .select(ArrayMath.cosineSimilarity($"embedding", $"embedding").as("c"))
      .agg(sum($"c"))
    val cp = Explain.finalPlan(cosDf)
    assert(Explain.inCodegen(cp, "cosinesimilarity"),
      s"cosine fell out of codegen:\n$cp")
  }

  test("decontamination broadcasts the eval side; shingle join is hash, not sort-merge") {
    // The eval set is the benchmark split (MBs); a sort-merge join here
    // would shuffle the full train shingle stream at 100 TB.
    val plan = executed(SparkEntry.queries("q77_decontaminate")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"eval side stopped broadcasting:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("mixture rebalancing never shuffles the corpus side") {
    // The count table is broadcast back; the only Exchange allowed is
    // the one building that tiny per-domain aggregate.
    val plan = executed(SparkEntry.queries("q78_lang_rebalance")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the final output sort is the query's ORDER BY; strip it and the
    // count-agg exchange, then no other shuffle may remain
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size <= 3, // count partial->final + output range sort
      s"unexpected shuffles in rebalance plan:\n$plan")
  }

  test("doc chunking is a pure generator: no shuffle before the output sort") {
    val df = graft.operators.Curation.chunkDocs(
      Tables(spark, sf, "documents"), "doc_id", "text", 32, 24)
    val plan = executed(df)
    assert(!plan.contains("Exchange"),
      s"chunking should be narrow/zero-shuffle:\n$plan")
    assert(plan.contains("Generate"), plan) // explode of start offsets
  }

  test("hard negatives broadcast the anchors, no cartesian on the corpus") {
    val plan = executed(SparkEntry.queries("q75_hard_negatives")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    // the anchor set rides a broadcast (nested-loop IS the one-scan
    // cross join against the broadcast anchors — bounded by k anchors)
    assert(plan.contains("Broadcast"), plan)
  }

  test("RRF pools bound before ranking: TakeOrdered feeds the rank windows") {
    val plan = executed(SparkEntry.queries("q76_rrf_fusion")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"RRF pools must be top-N bounded before the global window:\n$plan")
  }

  test("Q19-shape keeps the equi-key under the disjunction: one broadcast hash join") {
    // The OR-of-ANDs must NOT degrade to a cartesian/nested-loop: the
    // planner extracts l_partkey = p_partkey as the join key and keeps
    // the brand/size/qty disjunction as a residual filter.
    val plan = executed(SparkEntry.queries("q96_tpch_q19_shape")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast hash join:\n$plan")
  }

  test("Q15-shape scalar subquery: no nested loop, aggregate feeds both consumers") {
    val plan = executed(SparkEntry.queries("q94_tpch_q15_shape")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Subquery") || plan.contains("ReusedExchange"), plan)
  }

  test("Q20-shape nested INs decorrelate to semi joins, never nested loops") {
    val plan = executed(SparkEntry.queries("q95_tpch_q20_shape")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftSemi"), s"IN chain did not decorrelate:\n$plan")
  }

  test("Q2/Q4/Q16 shapes: correlated subqueries decorrelate, no nested loops") {
    val q2 = executed(SparkEntry.queries("q102_tpch_q2_shape")(spark, sf))
    assert(!q2.contains("CartesianProduct") && !q2.contains("BroadcastNestedLoopJoin"), q2)
    val q4 = executed(SparkEntry.queries("q103_tpch_q4_shape")(spark, sf))
    assert(q4.contains("LeftSemi"), s"correlated EXISTS did not decorrelate:\n$q4")
    val q16 = executed(SparkEntry.queries("q108_tpch_q16_shape")(spark, sf))
    assert(q16.contains("LeftAnti"), s"NOT IN did not plan as anti join:\n$q16")
  }

  test("Q6 shape: every predicate reaches the parquet scan") {
    // The one-line plan truncates long PushedFilters lists; formatted
    // explain prints the scan detail in full.
    val df = SparkEntry.queries("q104_tpch_q6_shape")(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: ["), plan)
    // the discount/quantity range bounds must appear among pushed filters
    assert(plan.contains("GreaterThanOrEqual(l_discount,0.05)"), plan)
    assert(plan.contains("LessThan(l_quantity,24.0)"), plan)
  }

  test("incremental dedup: corpus prune is a BROADCAST semi join") {
    // The whole point of the incremental pass at 100 TB: the corpus
    // bands are filtered by a broadcast of the delta's band keys, never
    // shuffled on them. The plan must show the semi join as broadcast
    // (and no cartesian anywhere).
    val docs = Tables(spark, sf, "documents")
    // Raw variant: the public builder's localCheckpoint (cache-release,
    // VERDICT r12 #2) collapses the plan this gate must inspect.
    val (v, internals) = graft.operators.DedupPortable
      .incrementalMinhashPortableRaw(
        docs.filter($"doc_id" % 10 =!= 0), docs.filter($"doc_id" % 10 === 0),
        "doc_id", "text")
    try {
      val plan = executed(v)
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
        s"corpus prune not a broadcast semi join:\n$plan")
      assert(!plan.contains("CartesianProduct"), plan)
    } finally internals.foreach(_.unpersist(false))
  }

  test("semDedup: cluster equi-join only — no all-pairs corpus compare") {
    val kept = graft.operators.Similarity.semDedup(
      Tables(spark, sf, "embeddings"), "vec_id", "embedding", k = 16, tau = 0.3)
    val plan = executed(kept)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("segmentDedup: first-occurrence hash-agg + class equi-join, never a window") {
    // VERDICT r14 #1 budget: duplicate detection is a map-side-partial
    // hash-aggregate on the segment hash (absorbs a 10^9-row
    // boilerplate class before the exchange), an equi-join back on
    // that hash, and the per-doc rebuild aggregate. A window here
    // means the class-key sort came back; a cartesian/NLJ means
    // someone rewrote it as a self-compare.
    val plan = executed(graft.operators.Curation.segmentDedup(
      Tables(spark, sf, "documents"), "doc_id", "text"))
    assert(!plan.contains("Window"), s"class-key window reintroduced:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size <= 4, // class agg + join align + doc rebuild agg
      s"segment dedup grew extra shuffles:\n$plan")
  }

  test("saltedTopKPerGroup: both phases shuffle, no join, bounded plan") {
    val df = Tables(spark, sf, "documents").select($"doc_id", $"source", $"n_chars")
    val plan = executed(graft.operators.Ops.saltedTopKPerGroup(
      df, Seq("source"), Seq($"n_chars".desc, $"doc_id".asc), 15,
      saltCol = $"doc_id", saltParts = 8))
    assert(!plan.contains("Join"), plan)
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size <= 2, // (group,salt) window + group window
      s"salted top-k grew extra shuffles:\n$plan")
  }

  test("DS Q67 shape: rollup Expand feeds a PARTITIONED rank window") {
    val df = SparkEntry.queries("q150_tpcds_q67_shape")(spark, sf)
    val plan = executed(df)
    assert(plan.contains("Expand"), s"rollup lost its Expand:\n$plan")
    // the rank window must partition on the rolled-up dim — a global
    // (unpartitioned) window would single-partition 100 TB of subtotals
    val windowLines = plan.linesIterator.filter(_.contains("rank(")).toSeq
    assert(windowLines.exists(_.contains("flag")),
      s"rank window lost its partition key:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("DS Q14 shape: INTERSECTs become semi joins, scalar threshold is a subquery") {
    val plan = executed(SparkEntry.queries("q151_tpcds_q14_shape")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftSemi"), s"INTERSECT did not decorrelate:\n$plan")
  }

  test("DS Q87 shape: EXCEPT chain becomes stacked anti joins, no NLJ") {
    val plan = executed(SparkEntry.queries("q152_tpcds_q87_shape")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert("LeftAnti".r.findAllIn(plan).length >= 2,
      s"EXCEPT chain did not become stacked anti joins:\n$plan")
  }

  test("DS Q72 shape: fact-fact join is pk-equi with residual, dims broadcast") {
    val plan = executed(SparkEntry.queries("q163_tpcds_q72_shape")(spark, sf))
    // the date-window + shortfall conditions must ride as the pk
    // join's RESIDUAL — a cartesian or nested loop here is the 100 TB
    // killer (the pre-residual fanout is already 18M at sf0.1)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // part/supplier/nation dim chain must broadcast, not shuffle
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
      s"dim chain lost its broadcasts:\n$plan")
  }

  test("DS Q95 shape: EXISTS/NOT EXISTS decorrelate to hash semi/anti joins") {
    val plan = executed(
      SparkEntry.queries("q176_tpcds_q95_shape")(spark, sf))
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("DS Q23 shape: both restriction sets are semi joins, threshold a subquery") {
    val plan = executed(SparkEntry.queries("q164_tpcds_q23_shape")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert("LeftSemi".r.findAllIn(plan).length >= 2,
      s"IN restrictions did not become semi joins:\n$plan")
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"),
      s"max-sales threshold is not a scalar subquery:\n$plan")
  }

  test("bucketed join: the layout carries the distribution — no exchange on join keys") {
    // force the SMJ path (at verify scale the small side would
    // broadcast, which also skips exchanges but proves nothing about
    // the bucketed layout)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(SparkEntry.queries("q165_bucketed_join")(spark, sf))
      assert(plan.contains("SortMergeJoin"), plan)
      // the only exchanges allowed are the agg/orderBy above the join;
      // a join-key exchange means the bucketed layout was ignored.
      // (The SMJ's within-partition Sorts remain: Spark ≥3 does not
      // propagate bucket sortBy order without the legacy
      // bucketedTableScan.outputOrdering flag — the shuffle elision is
      // the scale win; sorting already-sorted partitions is the cheap
      // linear-merge case.)
      assert("Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findFirstIn(plan).isEmpty,
        s"bucketed join still shuffles a join key:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pagerank rounds are equi-join + hash-agg: no cartesian, no NLJ, no windows") {
    // each damped round must be the edges⋈ranks co-partitioned join
    // plus a dst hash-agg — a cartesian, nested loop, or rank window
    // anywhere would break the O(E) per-round contract (the
    // dangling-mass scalar is a per-round 1-row driver fetch, so it
    // never appears as a join in the plan)
    val plan = executed(SparkEntry.queries("q168_pagerank")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), s"pagerank grew a window:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 did not compile to TakeOrdered:\n$plan")
  }

  test("shuffle-shard assignment partitions by shard, never single-partitions") {
    // the within-shard rank must window on shard (rows move once, on
    // the shard key) — an unpartitioned window here would be the
    // global sort this operator exists to avoid
    val plan = executed(SparkEntry.queries("q166_shuffle_shards")(spark, sf))
    val rn = plan.linesIterator.filter(_.contains("row_number")).toSeq
    assert(rn.nonEmpty && rn.forall(_.contains("shard")),
      s"shard window lost its partition key:\n$plan")
  }

  test("explode_outer preserves empty-array rows (one output row per doc)") {
    val df = SparkEntry.queries("q153_explode_outer")(spark, sf)
    val plan = executed(df)
    assert(plan.contains("Generate"), s"generator missing:\n$plan")
    // the semantics the outer generator exists for: no doc disappears
    assert(df.count() == Tables(spark, sf, "documents").count())
  }

  test("DS Q51 shape: windows stay partitioned; crossover filter sits above the full outer") {
    val df = SparkEntry.queries("q113_tpcds_q51_shape")(spark, sf)
    val plan = executed(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("FullOuter"), s"full outer join lost:\n$plan")
    // the coalesce() filter references both sides: pushing it below the
    // join would change results — it must survive as a post-join Filter
    assert(plan.linesIterator.exists(l =>
        l.contains("Filter") && l.contains("coalesce")),
      s"crossover filter not above the join:\n$plan")
  }

  test("DS Q47 shape: one exchange serves both window families") {
    val df = SparkEntry.queries("q114_tpcds_q47_shape")(spark, sf)
    val plan = executed(df)
    // (pri,m) agg + pri windows + output range sort — nothing else
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size <= 3,
      s"Q47-shape windows stopped sharing their exchange:\n$plan")
    assert(!plan.contains("Join"), plan)
  }

  test("DS Q88 shape: ONE scan + conditional aggregate, zero joins") {
    // The oracle runs the literal 8-subquery cross-join text (8 scans);
    // the engine must compile the rewrite: a single fact scan feeding
    // one aggregate. 8x scan reduction at 100 TB.
    val df = SparkEntry.queries("q120_tpcds_q88_shape")(spark, sf)
    val plan = executed(df)
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 1, s"expected 1 fact scan, found $scans:\n$plan")
    assert(!plan.contains("Join"), s"multi-band counts must not join:\n$plan")
  }

  test("DS Q11 shape: conditional-agg pivot — no self-joins of the CTE") {
    val df = SparkEntry.queries("q121_tpcds_q11_shape")(spark, sf)
    val plan = executed(df)
    assert(!plan.contains("Join"),
      s"YoY pivot reintroduced self-joins:\n$plan")
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 1, s"expected 1 orders scan, found $scans:\n$plan")
  }

  test("SCD2 merge: window runs ONLY over batch-touched keys") {
    // The untouched-open branch must reach the output without a Window
    // above it; the semi/anti key probes are broadcastable.
    val current = Tables(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id".as("k"), $"value".as("attr"),
        $"ts".as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"),
        lit(true).as("is_current"))
    val changes = Tables(spark, sf, "events")
      .filter($"event_type" === "click").limit(10)
      .select($"user_id".as("k"), $"value".as("attr"), $"ts")
    val out = graft.operators.Ops.scd2Apply(current, changes, "k",
      Seq("attr"))
    val plan = executed(out)
    assert(plan.contains("Window"), plan)
    // both key probes hash-join (semi + anti), never nested-loop
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"key pruning joins missing:\n$plan")
  }

  test("column profile is ONE scan: multi-distinct compiles to Expand") {
    val df = SparkEntry.queries("q127_profile")(spark, sf)
    val plan = executed(df)
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 1, s"profile must scan once, found $scans:\n$plan")
    assert(plan.contains("Expand"),
      s"multi count-distinct lost its Expand rewrite:\n$plan")
    assert(!plan.contains("Join"), plan)
  }

  test("KMV sketch aggregates map-side: partial_kmvsketch below the exchange") {
    val k = 16
    val kmv = udaf(new graft.functions.Aggregators.KmvSketch(k),
      org.apache.spark.sql.Encoders.scalaDouble)
    val df = Tables(spark, sf, "events")
      .select($"event_type", graft.operators.Ops.kmvUnitHash($"user_id").as("u"))
      .groupBy($"event_type").agg(kmv($"u").as("sk"))
    val plan = executed(df)
    // partial aggregation before the shuffle: only k-vectors cross it
    val lines = plan.linesIterator.toSeq
    val exchangeIdx = lines.indexWhere(_.contains("Exchange"))
    val partialIdx = lines.indexWhere(l =>
      l.contains("Aggregate") && l.contains("partial"))
    assert(partialIdx > exchangeIdx && exchangeIdx >= 0,
      s"no map-side partial aggregate below the exchange:\n$plan")
  }

  test("record linkage: block guard broadcasts, pair join is equi-keyed") {
    // The block-size relation is tiny (<= one row per distinct blocking
    // key) — it must broadcast into a semi join, never shuffle the
    // relation for the guard. The pair join itself must be equi-keyed
    // on the block columns: a cartesian or nested-loop here is the
    // O(n^2) failure blocking exists to prevent.
    val plan = executed(SparkEntry.queries("q133_record_linkage")(spark, sf))
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), s"block guard not broadcast-semi:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // The similarity kernel runs post-join inside codegen, so the
    // score+threshold never leaves the generated stage (final AQE plan).
    val fp = Explain.finalPlan(
      SparkEntry.queries("q133_record_linkage")(spark, sf))
    assert(Explain.inCodegen(fp, "jarowinkler"),
      s"kernel not in the generated stage:\n$fp")
  }

  test("rolling windows are contribution explodes: no range join anywhere") {
    // q138/q140 cover a 7-day window by EXPLODING each day's
    // contribution, not by range-joining days to a grid — a
    // BroadcastNestedLoopJoin here would scan the fact once per
    // calendar day at 100 TB.
    for (q <- Seq("q138_rolling_actives", "q140_rolling_kmv")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(plan.contains("Generate"), s"$q lost the explode:\n$plan")
    }
  }

  test("ntileGlobal never single-partitions: no window, no SinglePartition exchange") {
    // The sort lives in assignIds' range-partitioned RDD lineage (a
    // prior job); the final plan must not contain a Window operator —
    // an empty-OVER ntile would move EVERY data row through one
    // partition. (A SinglePartition exchange is still present and
    // fine: it is the 1-row global count, fed by a map-side partial
    // aggregate and broadcast back.)
    val plan = executed(SparkEntry.queries("q137_rfm_segments")(spark, sf))
    assert(!plan.contains("Window"),
      s"ntileGlobal fell back to a window:\n$plan")
    val lines = plan.linesIterator.toSeq
    val spIdx = lines.indexWhere(_.contains("SinglePartition"))
    assert(spIdx >= 0 && lines.drop(spIdx + 1)
        .exists(l => l.contains("partial_count")),
      s"the only SinglePartition exchange must be the partial-agg'd count:\n$plan")
  }

  test("edit-distance histogram aggregates map-side above the pair join") {
    val plan = executed(SparkEntry.queries("q134_edit_histogram")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    val lines = plan.linesIterator.toSeq
    val exchangeIdx = lines.indexWhere(_.contains("Exchange"))
    val partialIdx = lines.indexWhere(l =>
      l.contains("Aggregate") && l.contains("partial"))
    assert(partialIdx > exchangeIdx && exchangeIdx >= 0,
      s"histogram must combine map-side before the 12-row shuffle:\n$plan")
  }

  test("hashed-feature inference is join-free: the weight table is an array literal") {
    // The weight lookup must ride the projection (element_at on a
    // literal) — a join or broadcast against a weight table would add
    // a build/exchange for 64 constants.
    import graft.operators.Ops
    val df = Ops.hashedFeatureScore(Tables(spark, sf, "documents"),
      "doc_id", "text", (0 until 64).map(i => i % 7 - 3), 1L)
    val plan = executed(df)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("element_at("), plan)
    // exactly ONE exchange — the per-doc aggregate; the lookup itself
    // moves nothing
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1, plan)
  }

  test("AQE splits a skewed join partition at runtime (skewed shuffle read)") {
    // The 100 TB skew story: a hot key's shuffle partition is split by
    // AQE into several reads joined against the replicated other side
    // — no salting rewrite needed when the skew is discovered at
    // runtime. Local data is tiny, so the thresholds are lowered to
    // make the hot partition "big"; at production scale the defaults
    // (256MB) fire on their own. 60% of a 200k-row fact lands on one
    // key; the final adaptive plan must read that partition as a
    // skewed (split) shuffle read.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(0, 200000).selectExpr(
        "CASE WHEN id % 5 < 3 THEN 0 ELSE id % 1000 END AS k",
        "id AS payload")
      val dim = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS d")
      val j = fact.join(dim, "k").selectExpr("sum(payload + d) AS s")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"), s"join not marked skew=true in:\n$plan")
      assert(plan.contains("skewed"), s"no skewed AQEShuffleRead in:\n$plan")
    } finally olds.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("NOT IN corner: null-aware anti join is broadcast-ONLY; the q181 rewrite shuffles") {
    // A NOT IN whose subquery column Catalyst cannot prove non-null
    // needs a null-aware anti join, and Spark supports NAAJ ONLY as a
    // broadcast build (single-column BroadcastHashJoin isNullAware, or
    // BroadcastNestedLoopJoin) — when the exclusion set outgrows the
    // broadcast threshold there is NO shuffle fallback: the set is
    // broadcast regardless. Simulate "set too big to broadcast" with
    // threshold -1 and pin both halves of the story.
    Tables(spark, sf, "orders").createOrReplaceTempView("orders")
    Tables(spark, sf, "customer").createOrReplaceTempView("customer")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val naive = executed(spark.sql(
        """SELECT c_custkey FROM customer WHERE c_custkey NOT IN (
          |  SELECT CASE WHEN o_custkey % 1000 <> 7 THEN o_custkey END
          |  FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin))
      // NAAJ ignores the threshold: a broadcast build survives even
      // when broadcasting is "off" — the 100 TB failure mode.
      assert(naive.contains("BroadcastNestedLoopJoin") ||
        naive.contains("BroadcastHashJoin"), naive)
      // The q181 rewrite (explicit null filter + LEFT ANTI) respects
      // it: a shuffle-family anti join, no forced broadcast.
      val rewritten = executed(
        graft.queries.Relational.queries("q181_null_safe_not_in")(spark, sf))
      assert(!rewritten.contains("BroadcastNestedLoopJoin") &&
        !rewritten.contains("BroadcastHashJoin"), rewritten)
      assert(rewritten.contains("LeftAnti"), rewritten)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("SSSP rounds are equi-joins: no cartesian, lineage capped per round") {
    // Each Bellman-Ford round must relax through a keyed join; a
    // cartesian/nested-loop product would make a round O(V·E).
    import graft.operators.Ops
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 5L))
      .toDF("src", "dst", "w")
    val out = Ops.shortestPaths(edges, Seq(1L).toDF("id"), maxHops = 3)
    val plan = executed(out)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // localCheckpoint truncates lineage: the returned plan must scan
    // checkpointed partitions, not replay every round's joins.
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LocalTableScan"),
      plan)
  }

  test("random walks: steps are equi-joins on src, lineage capped per step") {
    // Each step must join the frontier to the ranked edge relation on
    // the src key (the hash pick rides the join as a residual) — a
    // cartesian/NLJ step would be walk-count × edge-count. And the
    // returned corpus must read checkpointed steps, not replay the
    // whole walk per reference.
    import graft.operators.Ops
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val out = Ops.randomWalks(edges, Seq(1L, 2L).toDF("id"), steps = 3)
    val plan = executed(out)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LocalTableScan"),
      plan)
  }

  test("skip-gram extraction: walk self-join is seed-keyed, count aggregates map-side") {
    val plan = executed(SparkEntry.queries("q216_walk_skipgrams")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("partial_count"), plan)
  }

  test("zipf slope: rank window partitions by lang, never SinglePartition") {
    val plan = executed(SparkEntry.queries("q217_zipf_slope")(spark, sf))
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("partial_"), plan) // sums combine map-side
  }

  test("shard manifest is ONE map-side-combining hash-agg over a narrow scan") {
    val plan = executed(SparkEntry.queries("q214_shard_manifest")(spark, sf))
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("Window"), plan) // no pos window in the manifest path
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("leakage-safe split summary aggregates map-side (partial below exchange)") {
    // The q209 tail after the cluster join is a narrow md5 projection
    // + ONE hash aggregate: partial_count must sit below the exchange
    // so the per-split summary combines map-side at 100 TB.
    import graft.operators.Ops
    val asg = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "rep")
    val out = Ops.hashSplit(asg, "rep",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "v1")
      .groupBy($"split").agg(count(lit(1)).as("n"))
    val plan = executed(out)
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bm25: query side broadcasts into the postings, corpus never reshuffles twice") {
    val plan = executed(SparkEntry.queries("q232_bm25_topk")(spark, sf))
    // the (qid, term, df, stats) side must reach the postings join as
    // a broadcast — a sort-merge/shuffle join there would reshuffle
    // the corpus-sized posting relation a second time
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the ONE tolerated nested-loop is the broadcast of the 1-row
    // (N, avgdl) stats relation — the standard broadcast-global
    // pattern (welch/q191 class), constant-size by construction
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 1, plan)
    assert(plan.contains("partial_count"), plan) // tf/df combine map-side
  }

  test("bm25 fallback: above the guard the postings join is a shuffle join") {
    // VERDICT r14 #4: with broadcastQueryLimit forced to 0 the
    // (qid, term, df, stats) side must NOT broadcast into the
    // postings — the plan degrades to a term-keyed shuffle equi-join
    // (AQE-skew-splittable), never a cartesian or nested loop.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable auto-broadcast so Catalyst can't silently re-promote
      // the small test relation and vacuously pass the gate
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = Tables(spark, sf, "documents")
      val qs = docs.limit(50).select($"doc_id".as("qid"),
        $"text".as("qtext"))
      val plan = executed(graft.operators.Curation.bm25TopK(
        docs, "doc_id", "text", qs, "qid", "qtext", k = 3,
        broadcastQueryLimit = 0L))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"fallback lost the shuffle join:\n$plan")
      assert(!plan.contains("CartesianProduct"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bootstrap test: the B-fold generator combines map-side") {
    val plan = executed(SparkEntry.queries("q233_bootstrap_eval")(spark, sf))
    // the explode-by-resamples amplification must feed a PARTIAL sum
    // below the exchange — the shuffle carries B rows per partition,
    // never the generated rows
    assert(plan.contains("partial_sum"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // tolerated nested-loops: the 1-row observed-total sentinel and
    // the 1-row finish crossJoin (broadcast-global pattern)
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 2, plan)
  }

  test("LM quality filter: vocab-keyed joins, no cartesian beyond the 1-row V") {
    val plan = executed(SparkEntry.queries("q234_lm_quality")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 1, plan)
    assert(plan.contains("partial_count"), plan) // count tables combine map-side
  }

  test("Kneser-Ney filter: same LM plan discipline as add-k plus 1-row globals") {
    val plan = executed(SparkEntry.queries("q246_kneser_ney")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    // one tolerated BNLJ: the broadcast 1-row (Ntypes, Vcont) globals
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 1, plan)
    assert(plan.contains("partial_count"), plan) // count tables combine map-side
  }

  test("labelPropagation: EVERY executed round stays equi-join shaped") {
    import graft.operators.Ops
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val edges = (1L to 60L).map(i => (i, i % 12 + 1)).toDF("u", "v")
      Ops.labelPropagation(edges).count()
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        if (plans.size == last) stable += 1 else { last = plans.size; stable = 0 }
      }
    } finally spark.listenerManager.unregister(l)
    assert(plans.size >= 2, s"expected several round jobs, saw ${plans.size}")
    plans.forEach { p =>
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
      // the per-node argmax must be the two-hash-agg shape, never a
      // per-node window/sort task
      assert(!p.contains("windowspecdefinition"), p)
    }
  }

  test("pcaTopComponent: EVERY executed iteration is equi-join + agg, no window") {
    // The corpus is touched once (moment checkpoint); the 10
    // iterations run on the d^2 covariance relation. No plan may go
    // cartesian or introduce a window/sort task. (BNLJ is allowed
    // here: the 1-row count/norm crossJoin(broadcast(...)) scalars —
    // the audited repo-wide pattern.)
    import graft.operators.Similarity
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      Similarity.pcaTopComponent(
        Tables(spark, sf, "embeddings").limit(50), "embedding", iters = 3)
        .count()
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        if (plans.size == last) stable += 1 else { last = plans.size; stable = 0 }
      }
    } finally spark.listenerManager.unregister(l)
    assert(plans.size >= 4, s"expected moment + iteration jobs, saw ${plans.size}")
    plans.forEach { p =>
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("windowspecdefinition"), p)
    }
  }

  test("kCore/hits: EVERY executed round stays equi-join shaped") {
    // The returned Datasets are checkpoint scans, so gating only the
    // final plan would miss the per-round jobs — capture every plan
    // the operators execute and assert none goes cartesian/NLJ.
    // (QueryExecutionListener delivery is async: drain until stable.)
    import graft.operators.Ops
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val edges = (1L to 60L).map(i => (i, i % 12 + 1)).toDF("u", "v")
      Ops.kCore(edges, k = 2).count()
      Ops.hits(edges.select($"u".as("src"), $"v".as("dst")), iters = 2)
        .count()
      var last = -1
      var stable = 0
      while (stable < 3) { // 3 × 100 ms with no new events = drained
        Thread.sleep(100)
        if (plans.size == last) stable += 1 else { last = plans.size; stable = 0 }
      }
    } finally spark.listenerManager.unregister(l)
    assert(plans.size >= 4, s"expected several round jobs, saw ${plans.size}")
    plans.forEach { p =>
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("hits query: global top-10 is TakeOrdered, never a full sort") {
    val plan = executed(SparkEntry.queries("q226_hits")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("heaps-law: growth windows partition by lang, sums combine map-side") {
    // The cumulative window must run over the ≤32-row bucket relation
    // PER LANGUAGE — an unpartitioned (SinglePartition) window or a
    // per-doc window would serialize the corpus.
    val plan = executed(SparkEntry.queries("q227_heaps_law")(spark, sf))
    plan.split('\n').filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("windowspecdefinition(lang"),
        s"unpartitioned or mis-partitioned window: $l")
    }
    assert(plan.contains("partial_"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("event precedence: rank window partitions by user, type-pair join is keyed") {
    val plan = executed(SparkEntry.queries("q228_event_precedence")(spark, sf))
    plan.split('\n').filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("windowspecdefinition(user_id"),
        s"unpartitioned or mis-partitioned window: $l")
    }
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("repetition battery: narrow kernel scan + ONE per-lang hash-agg, no window") {
    // VERDICT r15 #1/#6: the whole Gopher battery must ride the scan
    // as one codegen kernel call per row — the only exchanges are the
    // per-lang aggregate and the presentation sort. A window, a join,
    // or a third exchange means someone reintroduced the interpreted
    // per-n-gram HOF shape that timed out BENCH_r15.
    val plan = executed(SparkEntry.queries("q245_repetition")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("SortMergeJoin"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"repetition grew exchanges beyond agg+sort:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"per-lang agg lost map-side combine:\n$plan") // docs collapse per task
    assert(plan.contains("repetition_stats") || plan.contains("RepetitionExpr")
      || plan.contains("repetitionstats"),
      s"kernel column missing from the scan-side project:\n$plan")
  }

  test("htmlextract is a NARROW per-page map: zero exchanges before the sort") {
    // Extraction must stay embarrassingly parallel — one kernel call
    // per page riding the scan; the only exchange in q249's plan is
    // the presentation ORDER BY (same gate class as q223 urlnorm).
    val plan = executed(SparkEntry.queries("q249_html_extract")(spark, sf))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"htmlextract plan shuffles beyond the sort:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("windowspecdefinition"), plan)
  }

  test("crawl recipe: dedup is the md5-class hash-agg + keyed join, no window") {
    // q250's first-occurrence rule must be the hash-agg + join form —
    // a window over the md5 class would serialize a boilerplate page
    // repeated 10^9 times into one sort task (the EXACTSUBSTR lesson,
    // VERDICT r14 #1). Extraction itself must stay narrow.
    val plan = executed(SparkEntry.queries("q250_crawl_corpus")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("warc crawl recipe: container scan feeds the same no-window dedup tail") {
    // q265 = q250's tail over warcread's decoded payloads — the plan
    // discipline is inherited: no class window, no cartesian, the
    // firsts rule a hash-agg. (The WARC scan side is an RDD leaf —
    // one streaming pass per file, gated structurally at q259.)
    val plan = executed(SparkEntry.queries("q265_warc_corpus")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("source JSD: vocab-keyed joins + hash-aggs, no window, no cartesian") {
    // q254's per-word terms ride a w-keyed equi-join between the two
    // count tables; totals are 1-row broadcasts (tolerated BNLJs). A
    // window or cartesian means someone rewrote the support-linear
    // decomposition.
    val plan = executed(SparkEntry.queries("q254_source_jsd")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"count tables lost map-side combine:\n$plan")
  }

  test("ngram novelty: seen-set hash-agg + ONE h-keyed join, no window") {
    val plan = executed(SparkEntry.queries("q256_ngram_novelty")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("outlink extraction: narrow kernel map + explode + ONE hash-agg") {
    // q258 (VERDICT r16 #6): pages → anchorHrefs is a per-page kernel
    // scan; the host histogram is one hash-agg. No join at all, no
    // window, and at most the agg + presentation-sort exchanges.
    val plan = executed(SparkEntry.queries("q258_outlink_hosts")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"outlink histogram grew a join:\n$plan")
    assert(plan.contains("Generate"), s"href explode missing:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"more than agg+sort exchanges:\n$plan")
  }

  test("crawl frontier: pagerank rounds stay equi-join + hash-agg over host edges") {
    // q260 (VERDICT r16 #2): the composition must inherit q168's
    // per-round contract — co-partitioned edges⋈ranks equi-join + dst
    // hash-agg, dangling mass as a 1-row driver scalar (never a plan
    // join), top-k as TakeOrdered. Windows/cartesians anywhere mean
    // the frontier recipe lost the O(E)-per-round shape.
    val plan = executed(SparkEntry.queries("q260_crawl_frontier")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 did not compile to TakeOrdered:\n$plan")
  }

  test("bpe fertility: narrow per-doc encode + per-lang hash-agg, no window") {
    // q251 (VERDICT r16 #6): the BPE encode is a per-doc expression
    // riding the scan; fertility is lang-keyed hash-aggs + one small
    // lang-keyed join of the two rollups. Nothing may sort a corpus.
    val plan = executed(SparkEntry.queries("q251_bpe_fertility")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("chao1: two map-side-combining hash-aggs, no join, no window") {
    // q253 (VERDICT r16 #6): (lang,word) counts then per-lang
    // frequency-of-frequency tallies — both hash-aggs with partial
    // aggregation; the estimator is a projection.
    val plan = executed(SparkEntry.queries("q253_chao1_richness")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"chao1 grew a join:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"counts lost map-side combine:\n$plan")
  }

  test("dedup provenance: doc-keyed equi-joins + bounded agg, no window") {
    // q255 (VERDICT r16 #6): cluster membership joins back to docs on
    // the doc key twice; the (source_a, source_b) matrix agg is
    // |sources|²-bounded. No window, no cartesian.
    val plan = executed(SparkEntry.queries("q255_dup_provenance")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("krippendorff: coincidence algebra is hash-aggs + keyed joins, no window") {
    // q257 (VERDICT r16 #6): unit marginals and pair mass are exact
    // hash-aggs keyed by (group, unit) / (group, class); units never
    // sort. The only tolerated nested loop is a 1-row scalar attach.
    val plan = executed(SparkEntry.queries("q257_krippendorff")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 1, plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("warc roundtrip read: response filter + narrow projection, no shuffle before sort") {
    // q259: the WARC scan is one streaming pass per file; the only
    // exchange tolerated is the presentation ORDER BY.
    val plan = executed(SparkEntry.queries("q259_roundtrip_warc")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"warc read shuffles beyond the sort:\n$plan")
  }

  test("robots filter: rules broadcast into the URL stream, windows only over robots lines") {
    // q261 (VERDICT r16 #8): the robots PARSE may window — but only
    // partitioned by host over a single file's lines (KB-bounded by
    // protocol); the URL stream takes the rule table as a BROADCAST
    // hash join (host equi-key + LIKE residual) and ONE url-keyed
    // aggregation. A window without the host key, or the rule table
    // arriving via shuffle, is the 100 TB failure.
    val plan = executed(SparkEntry.queries("q261_robots_filter")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    val windows = plan.split('\n').filter(_.contains("windowspecdefinition"))
    assert(windows.nonEmpty, s"robots group window missing:\n$plan")
    windows.foreach { l =>
      assert(l.contains("windowspecdefinition(__h"),
        s"window not partitioned by robots host: $l")
    }
    assert(plan.contains("BroadcastHashJoin"),
      s"rule table not broadcast into the URL stream:\n$plan")
  }

  test("robots fallback: above the guard the rule join is a shuffle join") {
    // VERDICT r17 #1: the rule relation is host-cardinality at a web
    // crawl — with broadcastRuleLimit forced to 0 (and auto-broadcast
    // disabled so Catalyst can't silently re-promote the small test
    // relation) the URL⋈rules join must degrade to a host-keyed
    // shuffle equi-join (AQE-skew-splittable), never a cartesian or
    // a driver-side broadcast materialization of an unbounded table.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val d = Tables(spark, sf, "documents")
      val robots = d.select($"source").distinct().select(
        concat($"source", lit(".example")).as("host"),
        lit("User-agent: *\nDisallow: /private/\n").as("robots_txt"))
      val rules = graft.operators.Curation.robotsRules(
        robots, "host", "robots_txt", "graftbot")
      val urls = d.select($"doc_id",
        concat($"source", lit(".example")).as("host"),
        concat(lit("/private/"), $"lang").as("path"))
      val plan = executed(graft.operators.Curation.robotsFilter(
        urls, "doc_id", "host", "path", rules, broadcastRuleLimit = 0L))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"fallback lost the shuffle join:\n$plan")
      assert(!plan.contains("CartesianProduct"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("crawl loop: sitemap locs extract narrow, rules broadcast, windows host-bounded") {
    // q263: the <loc> extraction is a codegen regexp per body (no
    // shuffle), the rule table broadcasts into the loc stream, and
    // every window carries the robots-host key.
    val plan = executed(SparkEntry.queries("q263_crawl_loop")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    plan.split('\n').filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("windowspecdefinition(__h"),
        s"window not partitioned by robots host: $l")
    }
    assert(plan.contains("BroadcastHashJoin"),
      s"rule table not broadcast into the loc stream:\n$plan")
  }

  test("crawl delays: host-bounded parse windows, one host-keyed agg") {
    val plan = executed(SparkEntry.queries("q264_crawl_delay")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    plan.split('\n').filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("windowspecdefinition(__h"),
        s"window not partitioned by robots host: $l")
    }
  }

  test("crawl schedule: host-keyed join + horizon-bounded generator, no corpus window") {
    // q266: the frontier⋈delays join is a host equi-join (both sides
    // host-cardinality — NO forced broadcast anywhere in the
    // operator), the slot fanout is a per-row sequence generator
    // bounded by the caller's horizon, and the only windows in the
    // plan are the robots PARSE windows (host-keyed, KB-bounded).
    val plan = executed(SparkEntry.queries("q266_crawl_schedule")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    plan.split('\n').filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("windowspecdefinition(__h"),
        s"window not robots-host-bounded: $l")
    }
    assert(plan.contains("Generate"), s"slot sequence generator lost:\n$plan")
  }

  test("warc revisit ingest: verdict union stays equi-keyed, no cartesian, no window") {
    // q267: the revisit arm is a narrow filter+project off the
    // container scan (NO shingling — that skip is the point), the
    // response arm is the gated q110 incremental machinery; the union
    // must not introduce a cartesian, a nested loop on data-sized
    // sides, or any window.
    val plan = executed(SparkEntry.queries("q267_warc_revisit")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(plan.contains("Union"), s"revisit verdict union lost:\n$plan")
  }

  test("container index family: narrow projections, equi-joins, no window anywhere") {
    // q269 (cdx) is a pure projection + sort off the scan; q270
    // (captures) is TWO equi-joins of prunes of the same scan (the
    // Concurrent-To UUID pass + the (url, ts) fallback for the
    // residue — VERDICT r18 #2); q271 (digest collapse) is one
    // digest-keyed hash-agg; q272
    // (metadata) adds one more (url, ts) hash-agg + equi-join. None
    // may grow a window, a cartesian, or a nested loop on data-sized
    // sides — at 100 TB all of these ride the per-file container
    // pass.
    for (q <- Seq("q269_warc_cdx", "q270_warc_captures",
        "q271_cdx_digest_dedup", "q272_warc_metadata")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("windowspecdefinition"), s"$q grew a window:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
    }
  }

  test("cdx sorted artifact: point lookup prunes to exactly one file, filter pushed to the scan") {
    // VERDICT r18 next #1's gate: the index is PUBLISHED
    // range-clustered (disjoint per-file urlkey slices), so a point
    // lookup is answerable from the one file whose footer min/max
    // covers the key — at 100 TB the other files are never opened
    // (footer-stat row-group skipping; the q84/zorder precedent), and
    // the predicate must reach the parquet scan as a pushed filter.
    val d = java.nio.file.Files.createTempDirectory("cdxprune").toString
    val idx = (0 until 4096)
      .map(i => (f"example,h$i%04d)/p", "20260101000000", s"d$i"))
      .toDF("urlkey", "ts14", "digest")
    idx.repartitionByRange(8, $"urlkey", $"ts14")
      .sortWithinPartitions($"urlkey", $"ts14")
      .write.mode("overwrite").parquet(d)
    val files = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length > 4, s"expected a multi-file artifact: ${files.length}")
    val key = "example,h2049)/p"
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min($"urlkey"), max($"urlkey")).head
      (r.getString(0), r.getString(1))
    }
    // disjoint ranges ⇒ exactly ONE file's [min, max] covers the key
    val candidates = spans.count { case (lo, hi) => lo <= key && key <= hi }
    assert(candidates == 1, s"lookup key spans $candidates files: ${spans.toSeq}")
    val lookup = spark.read.parquet(d).filter($"urlkey" === key)
    val plan = executed(lookup)
    assert(plan.contains("PushedFilters: [IsNotNull(urlkey), EqualTo(urlkey,"),
      s"urlkey predicate not pushed to the scan:\n$plan")
    assert(lookup.count() == 1L)
  }

  test("cdx scopes (q295): StartsWith pushed to the artifact scan, prefix covers a key subrange") {
    // each matchType is a sargable urlkey predicate: the parquet scan
    // must show it in PushedFilters (footer min/max pruning at
    // scale), and on a range-clustered artifact a host-scope prefix
    // covers only the contiguous file slice that can hold it.
    val d = java.nio.file.Files.createTempDirectory("cdxscope").toString
    val idx = (0 until 4096)
      .map(i => (f"example,h$i%04d)/p", "20260101000000", s"d$i"))
      .toDF("urlkey", "ts14", "digest")
    idx.repartitionByRange(8, $"urlkey", $"ts14")
      .sortWithinPartitions($"urlkey", $"ts14")
      .write.mode("overwrite").parquet(d)
    val files = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length > 4, s"expected a multi-file artifact: ${files.length}")
    val scoped = graft.formats.Warc.cdxScope(
      spark.read.parquet(d), "host", "example,h2049")
    val plan = executed(scoped)
    assert(plan.contains("StringStartsWith(urlkey,example,h2049))"),
      s"host-scope prefix not pushed:\n$plan")
    // disjoint ranges: the prefix's [lo, hi] overlaps exactly one file
    val lo = "example,h2049)"
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min($"urlkey"), max($"urlkey")).head
      (r.getString(0), r.getString(1))
    }
    val candidates = spans.count { case (l, h) =>
      l <= lo + "￿" && lo <= h } // any overlap with [lo, lo+inf)
    assert(candidates == 1, s"host scope spans $candidates files")
    assert(scoped.count() == 1L)
  }

  test("budget apportionment (q294/q296): broadcast scalars, no corpus-keyed shuffle joins") {
    // q294: the rank window runs over KEY-cardinality rows (sources/
    // hosts), and the two scalar aggregates come back as broadcasts —
    // never a shuffle join of corpus data against itself. q296 stacks
    // the per-source prefix-cut window (inherently ordered semantics)
    // plus a broadcast of the tiny budget table into the doc stream.
    for (q <- Seq("q294_crawl_budget", "q296_token_budget_cut")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$q: key-level sides must broadcast, not shuffle-join:\n$plan")
    }
  }

  test("cdx lookups (q273/q274): broadcast probe equi-join on the artifact, no window") {
    // The batch-lookup shape: the tiny probe set broadcasts INTO the
    // index scan (never the index into the probe), the q274 latest-
    // before-T answer is one hash-agg, and no window/cartesian/NLJ
    // appears anywhere.
    for (q <- Seq("q273_cdx_lookup_all", "q274_cdx_lookup_latest")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(plan.contains("BroadcastHashJoin"), s"$q probe not broadcast:\n$plan")
      assert(!plan.contains("windowspecdefinition"), s"$q grew a window:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
    }
  }

  test("cdx replay locators (q284): extents ride the member scan — no join, no window") {
    // the (offset, length) extents are computed IN the per-file member
    // pass (gzipMembers' inflater consumption accounting) and pass
    // through the index projection untouched — the writer-truth
    // cross-check joins in the ORACLE, never in the engine, so the
    // plan is the q269 shape plus two columns: narrow projection +
    // the presentation sort, nothing else.
    val plan = executed(SparkEntry.queries("q284_cdx_locators")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("Join"), s"locator index must not join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bin pack (q285): one shard shuffle + in-partition sort + sequential pass, no window") {
    // greedy packing's only wide step is the shard hash exchange; the
    // pass itself is per-partition sequential (the documented genuine-
    // imperative case). Tolerated exchanges: shard hash + presentation
    // sort. A window or join here is the O(shard²) encoding we
    // rejected.
    val plan = executed(SparkEntry.queries("q285_bin_pack")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("Join"), s"binPack must not join:\n$plan")
    assert(plan.contains("MapPartitions"),
      s"sequential pack pass lost:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"binPack shuffles beyond shard+sort:\n$plan")
    // the efficiency report (q286) stacks two hash-aggs on top —
    // still no window, no join
    val rpt = executed(SparkEntry.queries("q286_pack_efficiency")(spark, sf))
    assert(!rpt.contains("windowspecdefinition"), rpt)
    assert(!rpt.contains("Join"), s"pack report must not join:\n$rpt")
  }

  test("anchor corpus (q287): narrow regexp extraction + one hash-agg, no window, no join") {
    // per-row regexp work rides the scan; the rollup is one
    // (href, anchor) hash-agg (countDistinct expands, still agg-side)
    val plan = executed(SparkEntry.queries("q287_anchor_corpus")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("Join"), s"anchor corpus must not join:\n$plan")
    assert(plan.contains("Generate"), s"anchor explode lost:\n$plan")
  }

  test("change rate (q275): ONE urlkey hash-agg off the container scan, no window, no join") {
    val plan = executed(SparkEntry.queries("q275_change_rate")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), s"window crept in:\n$plan")
    assert(!plan.contains("Join"), s"changeRate must not join:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"),
      s"urlkey agg lost:\n$plan")
  }

  test("sitemap freshness (q276): narrow block split, zero shuffles before the sort") {
    // block split + per-field regexp are per-row codegen work; the
    // ONLY exchange allowed is the presentation orderBy's range
    // partitioning (and the fixture's source-distinct prep).
    val plan = executed(SparkEntry.queries("q276_sitemap_freshness")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("Join"), s"entry parse must not join:\n$plan")
    assert(plan.contains("Generate"), s"block explode lost:\n$plan")
  }

  test("frontier seen filter (q277): bloom bypass + exact anti join, no cartesian") {
    // the sure-new arm must carry the bloom probe (scalar-subquery
    // might_contain) and the residue an equi anti join — never a
    // nested loop on data-sized sides.
    val plan = executed(SparkEntry.queries("q277_frontier_seen")(spark, sf))
    assert(plan.contains("BloomFilterMightContain") ||
      plan.contains("might_contain"), s"bloom bypass lost:\n$plan")
    assert(plan.contains("LeftAnti"), s"exact anti join lost:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("windowspecdefinition"), plan)
  }

  test("deflate ratio (q278): kernel rides the scan inside codegen, zero pre-sort shuffles") {
    val df = SparkEntry.queries("q278_deflate_ratio")(spark, sf)
    val plan = executed(df)
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("Join"), s"per-doc kernel must not join:\n$plan")
    // the expression participates in whole-stage codegen
    // (UnaryExpression with doGenCode — would sit outside every span
    // as a fallback project otherwise); inspect the AQE FINAL plan,
    // the pre-execution string carries no codegen markers
    val fp = Explain.finalPlan(df)
    assert(Explain.inCodegen(fp, "deflatelenexpr"),
      s"deflate kernel fell out of codegen:\n$fp")
  }

  test("regdomain (q290): compiled-rules kernel rides the scan — zero joins, in codegen") {
    // The PSL is driver-collected bounded side data compiled into
    // the expression: annotation must stay a narrow per-row pass —
    // NO join against the rule table, no window, nothing but the
    // final presentation sort's exchange.
    val df = SparkEntry.queries("q290_registrable_domain")(spark, sf)
    val plan = executed(df)
    assert(!plan.contains("Join"), s"rule table leaked into a join:\n$plan")
    assert(!plan.contains("windowspecdefinition"), plan)
    val fp = Explain.finalPlan(df)
    assert(Explain.inCodegen(fp, "pslexpr"),
      s"psl kernel fell out of codegen:\n$fp")
  }

  test("archive write path (q279/q280/q281): narrow encode, one union+agg, one join — no window") {
    // q279 CDXJ encode/parse is per-row work either side of the
    // range-partitioned sort; q280 compaction is distinct-union + ONE
    // capture-keyed hash-agg; q281 revisit detection is one standing
    // per-key max agg + one urlkey equi-join. None may grow a window,
    // cartesian, or data-sized nested loop.
    for (q <- Seq("q279_cdxj_roundtrip", "q280_cdx_compact",
        "q281_revisit_detect")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("windowspecdefinition"), s"$q grew a window:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q:\n$plan")
    }
  }

  test("semantic decontamination (q282): eval broadcasts into ONE corpus scan + max agg, no window") {
    // the eval side is benchmark-sized and must broadcast (a shuffled
    // train×eval join at 100 TB would move the corpus); the flag is
    // one train-keyed hash-agg — no window, no sort-merge, no
    // train×train stage anywhere.
    val plan = executed(SparkEntry.queries("q282_embed_decontam")(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"eval side stopped broadcasting:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"),
      s"max agg lost:\n$plan")
  }

  test("robots sitemaps: narrow line split, zero pre-agg windows") {
    val plan = executed(SparkEntry.queries("q262_robots_sitemaps")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("cohenKappa: marginals are hash-aggs + ONE keyed full-outer, no window") {
    // VERDICT r15 #6: kappa is three hash-aggregates (base, per-rater
    // marginals) + one (group, class)-keyed full-outer join between
    // the marginals + the group-keyed chance join. Class cardinality
    // bounds every post-agg relation, so nothing here may ever sort a
    // corpus: no window, no cartesian, no nested loop on data-sized
    // sides.
    val plan = executed(SparkEntry.queries("q247_kappa")(spark, sf))
    assert(!plan.contains("windowspecdefinition"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("FullOuter"), s"marginal full-outer join lost:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"marginal counts lost map-side combine:\n$plan")
  }

  test("bradleyTerry: EVERY executed round is item-keyed joins + hash-agg") {
    // VERDICT r15 #6: contests collapse to the pair-type hash-agg
    // BEFORE iteration; each MM round is two item-keyed equi-joins +
    // one hash-agg over the pair relation. The returned frame is a
    // checkpoint scan, so capture every plan the operator executes —
    // none may go cartesian or grow a window; the only tolerated NLJ
    // is the 1-row normalization crossJoin(broadcast(...)) at finish.
    import graft.operators.Ops
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val contests = (1L to 300L)
        .map(i => (s"m${i % 7}", s"m${(i * 3) % 7}"))
        .toDF("winner", "loser")
      Ops.bradleyTerry(contests, "winner", "loser", iters = 3).count()
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        if (plans.size == last) stable += 1 else { last = plans.size; stable = 0 }
      }
    } finally spark.listenerManager.unregister(l)
    assert(plans.size >= 4, s"expected pair-agg + round jobs, saw ${plans.size}")
    plans.forEach { p =>
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("windowspecdefinition"), p)
      // adaptive plans print Final AND Initial sections — count the
      // tolerated 1-row-normalization NLJ in the final plan only
      val finalPlan = p.split("== Initial Plan ==")(0)
      assert(finalPlan.split("BroadcastNestedLoopJoin").length - 1 <= 1, p)
    }
  }
}
