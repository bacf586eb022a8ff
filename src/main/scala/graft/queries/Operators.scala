package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Ops

/** Oracle-checked queries for the operator layer (SURVEY.md §1.4, §2.6):
  * keyed last-write-wins dedup (ndb), broadcast lookup, schema-merging
  * concat, as-of join, approximate distinct.
  */
object Operators {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Shared q211/q216 walk corpus (VERDICT r12 #3): both queries walk
    * the SAME bipartite customer↔supplier graph with the same seeds,
    * steps and salt, so the graph build (lineitem⋈orders distinct,
    * ~2.5-3 s in-suite) and the 4-step walk run ONCE per (session,
    * sfDir) and the result — a union of per-step localCheckpoints,
    * already materialized and lineage-free — is memoized. This is the
    * production shape too: a DeepWalk pipeline samples one walk corpus
    * and derives every downstream artifact (node visits, skip-gram
    * pairs, …) from it. The intermediate `pairs` persist is RELEASED
    * before returning (walk steps are eagerly checkpointed, so nothing
    * lazy still needs it); memoized entries hold only checkpointed
    * |corpus|-row blocks.
    */
  private val walkCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Wall-clock seconds each memoization MISS spent building the walk
    * corpus, keyed by sfDir. Bench reads this after the run and reports
    * the build as its own `q211_walk_build` row so the shared prelude's
    * real cost lands in total/minsum exactly once — per-query mins of
    * q211/q216 alone would hide ~4 s of real work behind the cache hit
    * (VERDICT r13 #3 / ADVICE r13 #1).
    */
  val walkBuildSeconds =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  private def sharedWalkCorpus(s: SparkSession, dir: String): DataFrame = {
    // Entries pin their session and its checkpointed blocks — drop the
    // ones whose sessions are gone so restarts can't accumulate
    // (ADVICE r13 #2).
    walkCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val key = (s, dir)
    val cached = walkCache.get(key)
    if (cached != null) return cached
    // Build OUTSIDE the map lock (computeIfAbsent would run a
    // multi-second Spark job while holding the bin lock); a concurrent
    // double-build is resolved by putIfAbsent and the loser releases
    // its blocks.
    import s.implicits._
    val t0 = System.nanoTime()
    val pairs = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("p"))
      .distinct()
      .persist()
    val edges = pairs.select($"c".as("src"), $"p".as("dst"))
      .unionByName(pairs.select($"p".as("src"), $"c".as("dst")))
    val seeds = t(s, dir, "customer").filter($"c_custkey" % 100 === 0)
      .select(($"c_custkey" * 2).as("id"))
    val w = Ops.randomWalks(edges, seeds, steps = 4, salt = "w1")
      .localCheckpoint()
    pairs.unpersist(false)
    val prior = walkCache.putIfAbsent(key, w)
    if (prior != null) { w.unpersist(false); prior }
    else {
      walkBuildSeconds.merge(dir,
        java.lang.Double.valueOf((System.nanoTime() - t0) / 1e9),
        (a, b) => java.lang.Double.valueOf(a.doubleValue + b.doubleValue))
      w
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ndb last-write-wins keyed dedup: latest event per user
    // (recency = ts, tie-broken by event_id).
    "q30_dedup_lastwins" -> ((s, dir) => {
      import s.implicits._
      Ops.dedupLastWins(t(s, dir, "events"),
          keys = Seq("user_id"), order = Seq($"ts", $"event_id"))
        .select($"user_id", $"event_id", $"event_type", $"value")
        .orderBy($"user_id")
    }),

    // Broadcast lookup enrichment: lineitem × part dimension.
    "q31_lookup_enrich" -> ((s, dir) => {
      import s.implicits._
      val part = t(s, dir, "part").select($"p_partkey", $"p_brand")
      Ops.lookup(
          t(s, dir, "lineitem").withColumnRenamed("l_partkey", "p_partkey"),
          part, keys = Seq("p_partkey"), how = "inner")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"),
          round(sum($"l_extendedprice".cast("decimal(30,4)")), 2)
            .cast("double").as("total_price"))
        .orderBy($"p_brand")
    }),

    // Schema-merging concat (unionByName + missing columns → null).
    "q32_concat" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val a = o.filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_custkey")
      val b = o.filter($"o_orderstatus" === "O")
        .select($"o_orderkey", $"o_totalprice")
      Ops.concat(Seq(a, b))
        .agg(
          count(lit(1)).as("n_rows"),
          count($"o_custkey").as("n_custkey"),
          count($"o_totalprice").as("n_totalprice"),
          round(sum($"o_totalprice".cast("decimal(30,4)")), 2)
            .cast("double").as("sum_price"))
    }),

    // As-of join: each click event matched to the user's most recent
    // purchase at-or-before it. Single-shuffle union+window plan.
    "q33_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id".as("purchase_id"),
          $"value".as("purchase_value"))
      Ops.asofJoin(clicks, purchases, keys = Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightPrefix = "p_")
        .select($"event_id", $"user_id", $"p_purchase_id",
          round($"p_purchase_value", 2).as("p_purchase_value"))
        .orderBy($"event_id")
    }),

    // As-of join with tolerance: purchases older than 24h don't count.
    "q36_asof_tolerance" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id".as("purchase_id"))
      Ops.asofJoin(clicks, purchases, keys = Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightPrefix = "p_",
          toleranceMicros = Some(24L * 3600 * 1000000))
        .select($"event_id", $"user_id", $"p_purchase_id")
        .orderBy($"event_id")
    }),

    // Range join: clicks landing inside a 1-hour attribution window
    // after any purchase by the same user — bucketed equi-join, not a
    // quadratic inequality join.
    "q37_range_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val windows = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("w_start"),
          ($"ts" + expr("INTERVAL 1 HOUR")).as("w_end"),
          $"event_id".as("purchase_id"))
      Ops.rangeJoin(clicks, windows, keys = Seq("user_id"),
          pointTs = "ts", startTs = "w_start", endTs = "w_end",
          bucketMicros = 3600L * 1000000)
        .select($"event_id", $"user_id", $"purchase_id")
        .orderBy($"event_id", $"purchase_id")
    }),

    // Skew-safe bucketed as-of join: identical semantics to q33 (same
    // oracle), but the window partitions on (user, 6h-bucket) so a hot
    // user parallelizes across time buckets.
    "q39_asof_bucketed" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id".as("purchase_id"),
          $"value".as("purchase_value"))
      Ops.asofJoinBucketed(clicks, purchases, keys = Seq("user_id"),
          leftTs = "ts", rightTs = "ts",
          bucketMicros = 6L * 3600 * 1000000, rightPrefix = "p_")
        .select($"event_id", $"user_id", $"p_purchase_id",
          round($"p_purchase_value", 2).as("p_purchase_value"))
        .orderBy($"event_id")
    }),

    // Custom typed Aggregator (UDAF surface): quantity-weighted average
    // price per return flag, exact-decimal partial aggregation.
    "q35_weighted_avg" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.udaf
      val wavg = udaf(new graft.functions.Aggregators.WeightedAverage(4))
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(wavg($"l_extendedprice", $"l_quantity").as("wavg_price"))
        .orderBy($"l_returnflag")
    }),

    // Approximate distinct (HLL++). Raw sketch values are
    // engine-specific, so the oracle-checked output carries the exact
    // counts plus booleans asserting the approx is within 5% of exact
    // (the oracle emits literal TRUE); OpsSpec asserts the error bound
    // numerically as well.
    "q34_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .agg(
          count_distinct($"l_partkey").as("exact_parts"),
          count_distinct($"l_orderkey").as("exact_orders"),
          approx_count_distinct($"l_partkey").as("approx_parts"),
          approx_count_distinct($"l_orderkey").as("approx_orders"))
        .select($"exact_parts", $"exact_orders",
          (abs($"approx_parts" - $"exact_parts") <=
            $"exact_parts" * 0.05).as("approx_parts_ok"),
          (abs($"approx_orders" - $"exact_orders") <=
            $"exact_orders" * 0.05).as("approx_orders_ok"))
    }),

    // Count-Min-Sketch heavy hitters (completes the sketch family next
    // to q34's HLL and q83's quantile sketch). The sketch is THE 100 TB
    // pattern for frequency estimation: counters merge map-side
    // (order-independent adds), the driver collects ~80 KB regardless
    // of corpus size, and probes ride a broadcast. As with q34, raw
    // estimates are sketch-internal, so the oracle-checked output is
    // the exact top-10 plus a boolean asserting the CMS guarantee.
    // The 1-sided eps*N overcount bound only holds at confidence 0.99
    // PER QUERY, so the oracle gate uses 2x the bound: deterministic
    // for the fixed seed 42 AND robust to testdata regeneration or
    // tokenizer changes flipping one low-probability miss (ADVICE r5).
    // OpsSpec asserts the tight 1x bound numerically on the current
    // corpus, so real precision regressions still surface.
    "q82_cms_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
        .filter($"tok" =!= "")
      val total = toks.count()
      val skBytes = toks
        .agg(expr("count_min_sketch(tok, 0.001d, 0.99d, 42)")).head.getAs[Array[Byte]](0)
      val sk = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(skBytes))
      val bc = s.sparkContext.broadcast(sk)
      val est = udf((t: String) => bc.value.estimateCount(t))
      val bound = 2L * math.ceil(total * 0.001).toLong
      val top = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"tok".asc).limit(10)
      top.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"n".desc, $"tok".asc)))
        .withColumn("est", est($"tok"))
        .select($"tok", $"n", $"rk",
          ($"est" >= $"n" && $"est" - $"n" <= bound).as("cms_ok"))
        .orderBy($"rk")
    }),

    // Bloom-filter semi-join reduction: fact rows that cannot join the
    // selective dim side are dropped BEFORE the shuffle (broadcast
    // bloom probe, codegen'd) — the explicit form of AQE's runtime
    // row-level filtering. Bloom false positives are removed by the
    // join itself, so the result is BIT-IDENTICAL to the plain join:
    // the oracle runs the plain join.
    "q88_bloom_prejoin" -> ((s, dir) => {
      import s.implicits._
      val dim = t(s, dir, "part").filter($"p_size" === 1)
      val reduced = graft.operators.Ops.bloomPreFilter(
        t(s, dir, "lineitem")
          .select($"l_partkey", $"l_extendedprice"),
        "l_partkey", dim.select($"p_partkey"), "p_partkey",
        expectedItems = 4096L, numBits = 65536L)
      reduced.join(dim, $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"),
          sum($"l_extendedprice".cast("decimal(30,4)")).as("__s"))
        .select($"p_brand", $"n",
          round($"__s", 2).cast("double").as("total_price"))
        .orderBy($"p_brand")
    }),

    // Z-order (Morton) clustering curve: the data-layout key that makes
    // 2-D min/max file pruning work (Ops.zorderWrite clusters on it).
    // Pure codegen'd long arithmetic, bit-identical in the oracle via
    // the generated SQL twin (Ops.zorderSql — same mask constants).
    // Relational PageRank (3 damped iterations) over the bipartite
    // customer↔supplier trade graph (node ids parity-disambiguated:
    // cust*2, supp*2+1; symmetric edges so no dangling mass). Each
    // round is ONE edges⋈ranks join + one hash-agg — no graph library,
    // no adjacency lists, hubs cost nothing special. Contributions sum
    // as decimal(30,15) (order-independent) and the per-row double
    // arithmetic is identical IEEE in any engine, so 3 unrolled rounds
    // replay hash-exact in the oracle; output is floor(r·1e10) — floor
    // has no rounding convention to diverge on.
    "q168_pagerank" -> ((s, dir) => {
      import s.implicits._
      val pairs = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("p"))
        .distinct()
        .persist() // both union branches read it; unpersisted by the
                   // harness cache clear (Verify per-query, Bench per-sample)
      val edges = pairs.select($"c".as("src"), $"p".as("dst"))
        .unionByName(pairs.select($"p".as("src"), $"c".as("dst")))
      Ops.pageRank(edges, iters = 3)
        .select($"id", expr("cast(floor(r * 1e10) as bigint)").as("r_e10"))
        .orderBy($"r_e10".desc, $"id").limit(100)
        .orderBy($"r_e10".desc, $"id")
    }),

    // Bucketed co-located join (the pay-once-shuffle-never-again
    // layout): both sides written hash-bucketed+sorted on their join
    // keys (Ops.bucketedWrite), then the join runs with ZERO exchange
    // and ZERO sort on either side — the bucketed scans carry the
    // distribution and order Catalyst needs (ScaleSpec gates it). At
    // 100 TB this is how fact-to-fact joins on a stable key (daily
    // loads joining the same orderkey) amortize their shuffle to
    // ingest time. Oracle replays the join/agg relationally from the
    // raw parquet — the layout must not change the answer.
    "q165_bucketed_join" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01' AND " +
          "l_shipdate < TIMESTAMP '1996-03-01'"))
        .select($"l_orderkey", $"l_extendedprice")
      val ord = t(s, dir, "orders").select($"o_orderkey", $"o_orderpriority")
      Ops.bucketedWrite(li, "graft_bkt_lineitem", "l_orderkey", 8)
      Ops.bucketedWrite(ord, "graft_bkt_orders", "o_orderkey", 8)
      s.table("graft_bkt_lineitem")
        .join(s.table("graft_bkt_orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(round(sum($"l_extendedprice".cast("decimal(30,4)")), 2)
            .cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    }),

    // Deterministic shuffle-shard export assignment (the training-data
    // "global shuffle" that never globally sorts): md5(key‖seed) picks
    // the shard AND the within-shard order; rows move once on the
    // shard key, order exists only within shards — exactly the
    // contract sharded training files need. Portable md5 family: the
    // oracle replays shard and position bit-for-bit.
    "q166_shuffle_shards" -> ((s, dir) => {
      import s.implicits._
      Ops.shuffleShardAssign(t(s, dir, "documents").select($"doc_id"),
          "doc_id", nShards = 8, seed = "r10")
        .select($"doc_id", $"shard", $"pos")
        .orderBy($"doc_id")
    }),

    // Incremental materialized-view maintenance: the per-customer
    // order count/revenue view is advanced from yesterday's snapshot
    // to today's by MERGING the base AGGREGATE with the day's CDC
    // deltas — the base fact is never rescanned (the avoid-rescanning-
    // 100-TB path). Snapshots are carved deterministically from
    // orders: s1 drops keys %10=0 (→ inserts today), s2 drops keys
    // %13=0 (→ deletes) and reprices keys %7=0 (+100 → updates). The
    // oracle recomputes the view DIRECTLY from the s2 definition —
    // equality proves the delta algebra, including groups that drop
    // to zero and updates that change the measure.
    "q171_incremental_agg" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val s1 = o.filter($"o_orderkey" % 10 =!= 0)
      val s2 = o.filter($"o_orderkey" % 13 =!= 0)
        .withColumn("o_totalprice",
          when($"o_orderkey" % 7 === 0, $"o_totalprice" + 100.0)
            .otherwise($"o_totalprice"))
      val baseAgg = s1.groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(30,4)")).as("rev"))
      val cdc = Ops.snapshotDiff(s1, s2, "o_orderkey",
        Seq("o_custkey", "o_totalprice"))
      val contribs = Ops.cdcAggContributions(cdc, "o_custkey", "o_totalprice")
      Ops.incrementalAggMerge(baseAgg, contribs,
          "o_custkey", "n_orders", "rev")
        .select($"o_custkey", $"n_orders",
          round($"rev", 2).cast("double").as("rev"))
        .orderBy($"o_custkey")
    }),

    // Per-node triangle counts over the supplier co-occurrence graph
    // (edge = two suppliers serving the same order): degree-ordered
    // orientation keeps wedge generation near O(m^1.5) — hubs receive
    // edges instead of fanning out deg² wedges. The raw co-occurrence
    // graph densifies toward a CLIQUE as sf grows (every supplier
    // pair eventually shares an order: K1000 at sf0.1 ≈ 1.7e8
    // triangles — quadratic-in-disguise input, 85 s in-suite), so the
    // edge set is thinned by a deterministic hash to ~1/17 — the
    // production move for co-occurrence graphs, stated in the query,
    // replayed by the oracle. Oracle: the definitional a<b<c triple
    // self-join, which the orientation plan must reproduce exactly.
    "q172_triangle_count" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey").distinct()
      val edges = li.select($"l_orderkey", $"l_suppkey".as("u"))
        .join(li.select($"l_orderkey", $"l_suppkey".as("v")), "l_orderkey")
        .filter($"u" < $"v" && ($"u" * 1009 + $"v") % 17 === 0)
        .select($"u", $"v").distinct()
      Ops.triangleCounts(edges).orderBy($"node")
    }),

    // Hierarchy flattening by pointer doubling: the deterministic
    // decimal-digit forest over custkeys (parent = key/10, keys < 10
    // are roots) resolved to (root, depth) in log-depth join rounds —
    // 4 rounds cover chains 16 deep, where a recursive walk would
    // cost one join PER LEVEL. Oracle: DuckDB recursive CTE.
    "q173_hierarchy_flatten" -> ((s, dir) => {
      import s.implicits._
      val nodes = t(s, dir, "customer").select($"c_custkey".as("id"),
        when($"c_custkey" >= 10, floor($"c_custkey" / 10)).as("parent"))
      Ops.flattenHierarchy(nodes, rounds = 4)
        .select($"id", $"root", $"depth").orderBy($"id")
    }),

    // Stratified train/val/test split with EXACT largest-remainder
    // allocation per stratum (800/100/100 permille): per-lang counts
    // give integer base shares, the remainder goes to the largest
    // fractional parts (tie-broken by split order), and rows fill the
    // splits in deterministic md5 order. Ranking is the DISTRIBUTED
    // per-group rank (bucketed by the uniform hash itself) — no
    // whole-stratum window task. Oracle replays hash, rank, and the
    // integer-exact allocation arithmetic.
    "q174_stratified_split" -> ((s, dir) => {
      import s.implicits._
      Ops.stratifiedSplit(t(s, dir, "documents").select($"doc_id", $"lang"),
          key = "doc_id", stratum = "lang",
          weights = Seq(800L, 100L, 100L),
          names = Seq("train", "val", "test"))
        .select($"doc_id", $"lang", $"split")
        .orderBy($"doc_id")
    }),

    // Market-basket association rules over customer×brand baskets:
    // apriori-pruned frequent pairs, directed rules with exact
    // support/confidence/lift (integer ratios in double — bit-
    // replayable). The pair join fans out only over items that
    // survive the support cut.
    "q177_assoc_rules" -> ((s, dir) => {
      import s.implicits._
      val baskets = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          $"o_orderkey" === $"l_orderkey")
        .join(t(s, dir, "part"), $"p_partkey" === $"l_partkey")
        .select($"o_custkey".as("ck"), $"p_brand".as("brand"))
      Ops.associationRules(baskets, "ck", "brand",
          minSupport = 800L, minConfidence = 0.7)
        .select($"ant", $"cons", $"n_both", $"n_ant", $"n_cons",
          round($"support", 6).as("support"),
          round($"confidence", 6).as("confidence"),
          round($"lift", 6).as("lift"))
        .orderBy($"ant", $"cons")
    }),

    // EXACT Gini coefficient of customer spend (inequality — the
    // concentration metric behind "top-1% of customers" analyses):
    // rank formula G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over the
    // ascending-spend order, with ranks from the DISTRIBUTED global
    // enumeration (range partition + zipWithIndex — no single-task
    // ORDER BY window) and every sum an exact integer of cents. The
    // only doubles are the two final ratio terms.
    "q203_gini_spend" -> ((s, dir) => {
      import s.implicits._
      val spend = t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("cents"))
      val ranked = Ops.assignIds(spend,
        Seq($"cents".asc, $"o_custkey".asc), "rid")
      // Σ(rank·cents) is ~n²·avg_cents: a raw BIGINT sum silently
      // wraps at production scale (Spark non-ANSI) while the oracle
      // promotes to HUGEINT — accumulate in decimal(38,0) (the
      // groupedLinearFit convention) and so for the n·total product.
      // The rank factor is cast to decimal BEFORE the multiply: the
      // per-row product i·cents itself wraps a BIGINT at ~2e9 rows of
      // average spend, long before the sum does (ADVICE r11).
      ranked.agg(
          count(lit(1)).as("n"),
          sum($"cents").as("total_cents"),
          sum((($"rid" + 1L).cast("decimal(38,0)") * $"cents")
            .cast("decimal(38,0)")).as("s1"))
        .select($"n", $"total_cents",
          round(
            ($"s1" * 2L).cast("double") /
              ($"n".cast("decimal(38,0)") * $"total_cents")
                .cast("double") -
            ($"n" + 1L).cast("double") / $"n".cast("double"), 6)
            .as("gini"))
    }),

    // Composition recipe: quantile binning feeding grouped OLS —
    // quantity ~ price WITHIN each per-flag price quartile ("price
    // sensitivity by price tier"). Demonstrates that the new
    // operators compose as relational citizens: the binner's output
    // is just columns, the fitter groups on (flag, bin), and the
    // whole thing stays two hash-aggs + one broadcast join.
    "q200_elasticity_by_tier" -> ((s, dir) => {
      import s.implicits._
      val binned = Ops.quantileBucketize(
        t(s, dir, "lineitem")
          .select($"l_returnflag",
            floor($"l_extendedprice" * 100).cast("long").as("cents"),
            $"l_quantity".cast("long").as("qty")),
        Seq("l_returnflag"), $"cents", Seq(250, 500, 750))
      Ops.groupedLinearFit(binned, Seq("l_returnflag", "bin"),
          $"cents", $"qty")
        .select($"l_returnflag", $"bin", $"n",
          round($"slope" * 1e6, 6).as("slope_ppm"),
          round($"intercept", 6).as("intercept"),
          round($"r2", 6).as("r2"))
        .orderBy($"l_returnflag", $"bin")
    }),

    // Quantile binning (feature discretization): quartile labels per
    // returnflag from the two-phase exact-quantile machinery, bins
    // broadcast back as one tiny array per group — summarized to
    // per-bin counts and price ranges (binning a 100 TB fact adds one
    // broadcast join, nothing else).
    "q196_quantile_binning" -> ((s, dir) => {
      import s.implicits._
      Ops.quantileBucketize(
          t(s, dir, "lineitem")
            .select($"l_returnflag", floor($"l_extendedprice" * 100)
              .cast("long").as("cents")),
          Seq("l_returnflag"), $"cents", Seq(250, 500, 750))
        .groupBy($"l_returnflag", $"bin")
        .agg(count(lit(1)).as("n"),
          min($"cents").as("min_cents"), max($"cents").as("max_cents"))
        .orderBy($"l_returnflag", $"bin")
    }),

    // Item-item co-visitation similarity (the recommender staple):
    // cosine between brand "customer vectors" — n_ab/√(n_a·n_b) from
    // exact pair counts over a deterministic 1/3 customer sample
    // (co-visitation pair space is quadratic PER BASKET; the sample
    // bounds it the same way q172 thins its graph). Top-3 neighbors
    // per brand via the rank window over ≤ items² similarity rows —
    // metadata-sized, never data-sized.
    "q195_item_similarity" -> ((s, dir) => {
      import s.implicits._
      val baskets = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), $"o_orderkey" === $"l_orderkey")
        .join(t(s, dir, "part"), $"p_partkey" === $"l_partkey")
        .filter($"o_custkey" % 3 === 0)
        .select($"o_custkey".as("ck"), $"p_brand".as("brand")).distinct()
      val cnt = baskets.groupBy($"brand").agg(count(lit(1)).as("n"))
      val pairs = baskets.select($"ck", $"brand".as("ba"))
        .join(baskets.select($"ck", $"brand".as("bb")), "ck")
        .filter($"ba" < $"bb")
        .groupBy($"ba", $"bb").agg(count(lit(1)).as("nab"))
      val sym = pairs.unionByName(
        pairs.select($"bb".as("ba"), $"ba".as("bb"), $"nab"))
      val sim = sym
        .join(cnt.select($"brand".as("ba"), $"n".as("na")), "ba")
        .join(cnt.select($"brand".as("bb"), $"n".as("nb")), "bb")
        .select($"ba".as("brand"), $"bb".as("other"), $"nab",
          ($"nab".cast("double") /
            (sqrt($"na".cast("double")) * sqrt($"nb".cast("double"))))
            .as("sim"))
      Ops.topKPerGroup(sim, Seq("brand"),
          Seq($"sim".desc, $"other".asc), 3)
        .select($"brand", $"other", $"nab", round($"sim", 6).as("sim"), $"rk")
        .orderBy($"brand", $"rk")
    }),

    // Grouped OLS + r² (value-cents ~ hour-of-day per event type) on
    // EXACT integer sufficient statistics — one hash-agg with map-side
    // partials; the built-in corr/regr_* double accumulators would
    // shift with partition merge order, these decimal sums cannot.
    // Final ratios are fixed-order double arithmetic the oracle
    // replays bit-for-bit.
    "q178_regression" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_type", hour($"ts").as("x"),
          floor($"value" * 100).cast("long").as("y"))
      Ops.groupedLinearFit(ev, Seq("event_type"), $"x", $"y")
        .select($"event_type", $"n",
          round($"slope", 6).as("slope"),
          round($"intercept", 6).as("intercept"),
          round($"r2", 6).as("r2"))
        .orderBy($"event_type")
    }),

    // Logistic quality-classifier TRAINING via IRLS (the training half
    // the filtering-classifier story was missing — hashedFeatureScore
    // only applies weights): predict lang='en' from (intercept,
    // n_chars/1000), exactly 2 Newton iterations. Each iteration is ONE
    // hash-agg of decimal(30,12) sufficient statistics (order-free
    // sums) + a fixed-order 2x2 Cramer solve, so the oracle replays
    // both iterations as unrolled CTEs, arithmetic op for op.
    "q221_logit_irls" -> ((s, dir) => {
      import s.implicits._
      Ops.logisticTrainIRLS(t(s, dir, "documents"),
          features = Seq(lit(1.0), $"n_chars".cast("double") / 1000.0),
          label = ($"lang" === "en").cast("double"), iters = 2)
        .select($"idx", round($"beta", 6).as("beta"))
        .orderBy($"idx")
    }),

    // Bounded-hop shortest paths over the part↔supplier bipartite
    // graph (weight 1+(p+s)%7, seeds = suppliers 0-2): frontier
    // Bellman-Ford — O(rounds·|E|) equi-joins, NO path enumeration
    // (a recursive walk is exponential on dense graphs). The oracle
    // replays six FULL relaxation rounds as iterated CTEs; frontier
    // pruning provably lands on the same fixpoint prefix.
    "q179_sssp" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey").distinct()
      val pairs = li.select(($"l_partkey" * 2).as("a"),
        ($"l_suppkey" * 2 + 1).as("b"),
        (lit(1) + ($"l_partkey" + $"l_suppkey") % 7).as("w"))
      val edges = pairs.select($"a".as("src"), $"b".as("dst"), $"w")
        .unionByName(pairs.select($"b".as("src"), $"a".as("dst"), $"w"))
      val seeds = t(s, dir, "supplier").filter($"s_suppkey" < 3)
        .select(($"s_suppkey" * 2 + 1).as("id"))
      Ops.shortestPaths(edges, seeds, maxHops = 6)
        .select($"id", $"dist").orderBy($"id")
    }),

    // Deterministic random walks over the q168 bipartite
    // customer-supplier graph — the DeepWalk/node2vec corpus sampler.
    // Seeds scale with the data (every 100th customer); the hash-picked
    // next hop makes the walk corpus a pure function of the graph, so
    // the oracle replays it as a recursive CTE over the same md5
    // family. 100 TB shape: ranked edges built once and reused across
    // all steps; per-step work is frontier-sized, not graph-sized.
    "q211_random_walks" -> ((s, dir) => {
      import s.implicits._
      sharedWalkCorpus(s, dir).orderBy($"seed", $"step", $"node")
    }),

    // Skip-gram pair extraction over the walk corpus — the DeepWalk/
    // node2vec training-data step: (center, context) co-occurrence
    // counts within a +-2 step window. The self-join keys on the walk
    // id (seed), so its fanout is steps x window per walk — linear in
    // the walk corpus, never in the graph; the count is a map-side-
    // combining hash-agg. Oracle: the q211 recursive walk + the same
    // window self-join.
    "q216_walk_skipgrams" -> ((s, dir) => {
      import s.implicits._
      val w = sharedWalkCorpus(s, dir)
      val a = w.select($"seed", $"step".as("s1"), $"node".as("center"))
      val b = w.select($"seed", $"step".as("s2"), $"node".as("context"))
      a.join(b, "seed")
        .filter($"s1" =!= $"s2" && abs($"s1" - $"s2") <= 2)
        .groupBy($"center", $"context").agg(count(lit(1)).as("n"))
        .orderBy($"center", $"context")
    }),

    // Exact quantity-weighted median price per returnflag: the
    // two-phase coarse-bucket plan — no whole-group sort/window task
    // ever exists (the naive cumulative window is the q148-class skew
    // hazard). Values as whole cents, weights as integer quantities:
    // every comparison is exact. Oracle replays the definitional
    // cumulative-weight straddle directly.
    "q184_weighted_median" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      Ops.weightedMedian(li, Seq("l_returnflag"),
          floor($"l_extendedprice" * 100), $"l_quantity")
        .select($"l_returnflag",
          ($"median".cast("double") / 100).as("median_price"),
          $"total_weight")
        .orderBy($"l_returnflag")
    }),

    // Exact weighted quartiles in the SAME two bucket passes as the
    // median — the per-group target table carries one row per
    // requested permille. Skew-safe multi-quantile without
    // approx_percentile's error bars or a whole-group sort.
    "q185_exact_quartiles" -> ((s, dir) => {
      import s.implicits._
      Ops.weightedQuantiles(t(s, dir, "lineitem"), Seq("l_returnflag"),
          floor($"l_extendedprice" * 100), $"l_quantity",
          permilles = Seq(250, 500, 750))
        .select($"l_returnflag", $"permille",
          ($"value".cast("double") / 100).as("price"),
          $"total_weight")
        .orderBy($"l_returnflag", $"permille")
    }),

    "q84_zorder_curve" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .select($"c_custkey", $"c_nationkey",
          graft.operators.Ops.zorder2($"c_custkey", $"c_nationkey").as("z"))
        .orderBy($"z".asc, $"c_custkey".asc).limit(100)
        .orderBy($"z".asc, $"c_custkey".asc)
    }),

    // Quantile sketch companion (GK / approx_percentile): per-group
    // median from the mergeable summary vs the exact percentile. The
    // GK invariant bounds rank error at N/accuracy REGARDLESS of
    // partition merge order, so the tolerance boolean is stable even
    // though the raw estimate is not — same reporting convention as
    // q34/q82. Exact percentile (a per-group sort) is the verify-scale
    // price; the sketch IS the 100 TB path.
    "q83_percentile_sketch" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("apx"))
        .select($"l_returnflag",
          round($"exact_p50", 4).as("exact_p50"),
          (abs($"apx" - $"exact_p50") <= $"exact_p50" * 0.01).as("approx_ok"))
        .orderBy($"l_returnflag")
    }),

    // SCD Type-2 merge (CDC upsert): current dimension = latest + one
    // historical purchase per user before the cutoff; change batch =
    // purchases after it. Only keys touched by the batch pass through
    // the re-versioning window — closed history and untouched open
    // rows stream by join-pruned (the 100 TB dimension-load shape).
    "q118_scd2_merge" -> ((s, dir) => {
      import s.implicits._
      val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
      val p = t(s, dir, "events").filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", round($"value", 2).as("spend"), $"ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      val ranked = p.filter($"ts" < cutoff)
        .withColumn("rn", row_number().over(w))
        .withColumn("next_ts", lag($"ts", 1).over(w))
      val current = ranked.filter($"rn" <= 2).select(
        $"user_id", $"event_id", $"spend",
        $"ts".as("valid_from"),
        when($"rn" === 1, lit(null).cast("timestamp"))
          .otherwise($"next_ts").as("valid_to"),
        ($"rn" === 1).as("is_current"))
      val changes = p.filter($"ts" >= cutoff)
      Ops.scd2Apply(current, changes, key = "user_id",
          attrCols = Seq("event_id", "spend"), ts = "ts",
          tieBreak = Seq("event_id"))
        .orderBy($"user_id", $"valid_from", $"event_id")
        .select($"user_id", $"event_id", $"spend",
          date_format($"valid_from", "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format($"valid_to", "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          $"is_current")
    }),

    // KMV (theta) sketch algebra over daily-activity keys: per-channel
    // distinct estimates PLUS the intersection/union estimates HLL
    // (q34) structurally cannot produce. The sketch is a bounded
    // mergeable typed Aggregator (map-side partial agg — only
    // 128-value vectors cross the shuffle); every estimate replays
    // bit-exactly in the oracle from the same md5 unit hashes.
    "q119_kmv_theta" -> ((s, dir) => {
      import s.implicits._
      val k = 128
      val kmv = udaf(new graft.functions.Aggregators.KmvSketch(k),
        org.apache.spark.sql.Encoders.scalaDouble)
      val ev = t(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"event_type",
          concat_ws(":", $"user_id", to_date($"ts")).as("akey"))
      val sk = ev
        .withColumn("u", Ops.kmvUnitHash($"akey"))
        .groupBy($"event_type")
        .agg(kmv($"u").as("sk"), countDistinct($"akey").as("exact"))
      val per = sk.select($"event_type".as("scope"),
        round(Ops.kmvDistinctEstimate($"sk", k), 4).as("est_distinct"),
        $"exact".as("exact_distinct"))
      val both = sk.filter($"event_type" === "click").select($"sk".as("ska"))
        .crossJoin(sk.filter($"event_type" === "purchase")
          .select($"sk".as("skb")))
      val exact = ev.groupBy($"akey").agg(
          max(when($"event_type" === "click", 1).otherwise(0)).as("hc"),
          max(when($"event_type" === "purchase", 1).otherwise(0)).as("hp"))
        .agg(
          sum(when($"hc" === 1 && $"hp" === 1, 1).otherwise(0))
            .cast("long").as("x_and"),
          count(lit(1)).as("x_or"),
          sum(when($"hc" === 1 && $"hp" === 0, 1).otherwise(0))
            .cast("long").as("x_diff"))
      val inter = both.crossJoin(exact).select(
        lit("click_and_purchase").as("scope"),
        round(Ops.kmvIntersectEstimate($"ska", $"skb", k), 4)
          .as("est_distinct"),
        $"x_and".as("exact_distinct"))
      val uni = both.crossJoin(exact).select(
        lit("click_or_purchase").as("scope"),
        round(Ops.kmvUnionEstimate($"ska", $"skb", k), 4).as("est_distinct"),
        $"x_or".as("exact_distinct"))
      val diff = both.crossJoin(exact).select(
        lit("click_minus_purchase").as("scope"),
        round(Ops.kmvDifferenceEstimate($"ska", $"skb", k), 4)
          .as("est_distinct"),
        $"x_diff".as("exact_distinct"))
      per.unionByName(inter).unionByName(uni).unionByName(diff)
        .orderBy($"scope")
    }),

    // Data-quality profiling (Deequ-style): null count, exact distinct
    // count, min and max for EVERY column of documents — in ONE scan.
    // Multiple count(DISTINCT) in one aggregate compiles to a single
    // Expand pass (k-way row multiplication, one shuffle), not k
    // scans; stack() unpivots the 1-row summary into the per-column
    // report. UTF-8 binary string ordering matches codepoint order, so
    // min/max on text replay identically.
    "q127_profile" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      def m(c: String) = Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val metrics = cols.flatMap(m)
      val agg1 = docs.agg(metrics.head, metrics.tail: _*)
      agg1.selectExpr(
        s"stack(${cols.size}, " + cols.map(c =>
          s"'$c', null_$c, dist_$c, min_$c, max_$c").mkString(", ") +
          ") as (col_name, n_null, n_distinct, min_val, max_val)")
        .orderBy($"col_name")
    }),

    // Referential-integrity / uniqueness gate (the pre-training data
    // audit): orphan foreign keys via LEFT ANTI equi-joins (broadcast
    // the key side at scale — never a full outer), duplicate-key and
    // domain violations via aggregates; one summary row.
    "q128_integrity" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val orphanLi = li.join(o.select($"o_orderkey"),
          $"l_orderkey" === $"o_orderkey", "left_anti")
        .agg(count(lit(1)).as("orphan_lineitems"))
      val orphanOrd = o.join(c.select($"c_custkey"),
          $"o_custkey" === $"c_custkey", "left_anti")
        .agg(count(lit(1)).as("orphan_orders"))
      val dupKeys = o.groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
        .filter($"n" > 1).agg(count(lit(1)).as("dup_orderkeys"))
      val badDomain = li.filter($"l_quantity" <= 0 ||
          $"l_discount" < 0 || $"l_discount" > 1)
        .agg(count(lit(1)).as("bad_lineitem_domain"))
      orphanLi.crossJoin(orphanOrd).crossJoin(dupKeys).crossJoin(badDomain)
    }),

    // Snapshot diff — the CDC producer (inverse of q118's consumer):
    // per-user latest purchase BEFORE the cutoff vs over ALL time;
    // emits insert (new user after cutoff) / update (spend changed) /
    // delete rows with old_/new_ values. Unchanged keys never leave
    // the join.
    "q129_snapshot_diff" -> ((s, dir) => {
      import s.implicits._
      val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
      val p = t(s, dir, "events").filter($"event_type" === "purchase")
        .select($"user_id", round($"value", 2).as("spend"), $"ts", $"event_id")
      def latest(df: org.apache.spark.sql.DataFrame) =
        Ops.dedupLastWins(df, Seq("user_id"), Seq($"ts", $"event_id"))
          .select($"user_id", $"spend")
      Ops.snapshotDiff(latest(p.filter($"ts" < cutoff)), latest(p),
          "user_id", Seq("spend"))
        .orderBy($"user_id")
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis via
    // exponential keys): top-5 docs per source with probability ∝
    // n_chars, deterministic from the md5 unit hash — the
    // quality-weighted corpus subsample. Ranked by the skew-safe
    // two-phase top-k (bit-identical to the oracle's plain window).
    "q130_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
        .select($"doc_id", $"source", $"n_chars")
        .withColumn("u", Ops.kmvUnitHash($"doc_id"))
        .withColumn("es_key", -log($"u") / $"n_chars")
      Ops.saltedTopKPerGroup(d, part = Seq("source"),
          order = Seq($"es_key".asc, $"doc_id".asc), k = 5,
          saltCol = $"doc_id", saltParts = 8)
        .select($"source", $"doc_id", $"n_chars",
          round($"es_key" * 1000, 6).as("es_key_k"), $"rk")
        .orderBy($"source", $"rk")
    }),

    // 3-core backbone of the part co-occurrence graph (parts sharing
    // an order, deterministically hash-thinned 1/29 — the thinning
    // puts the mean degree near the k-core critical point, which is
    // the WORST case for peeling: at sf0.01 the cascade runs 8 full
    // rounds before fixpoint (12 at sf0.1), exactly the regime where
    // a non-iterative "degree >= k once" filter is wrong). The oracle
    // unrolls 16 idempotent peel rounds; the operator loops to the
    // true fixpoint, so the equality also certifies convergence
    // within the unroll. Output: core members with in-core degree.
    "q225_kcore" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_partkey").distinct()
      val edges = li.select($"l_orderkey", $"l_partkey".as("u"))
        .join(li.select($"l_orderkey", $"l_partkey".as("v")), "l_orderkey")
        .filter($"u" < $"v" && ($"u" * 1009 + $"v") % 29 === 0)
        .select($"u", $"v").distinct()
      Ops.kCore(edges, k = 3).orderBy($"node")
    }),

    // HITS hubs & authorities (2 rounds, max-normalized) over the
    // customer->supplier purchase graph: customers that buy from many
    // well-connected suppliers are hubs, suppliers bought by strong
    // hubs are authorities — the mutual-reinforcement ranking
    // PageRank's single score can't express on a bipartite graph.
    // Node ids disambiguated (c*2 / s*2+1, the repo's bipartite
    // convention). Top-10 each side via sort+limit (TakeOrdered — a
    // per-partition top-k merge, never a global sort); the rank
    // window runs over the 10 surviving rows only.
    "q226_hits" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val edges = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
        .distinct()
      val sc = Ops.hits(edges, iters = 2)
      def side(scoreCol: String, role: String) = {
        val top = sc.orderBy(col(scoreCol).desc, $"id".asc).limit(10)
        top.withColumn("rk", row_number().over(
            Window.orderBy(col(scoreCol).desc, $"id".asc)))
          .select(lit(role).as("role"), $"rk", $"id",
            round(col(scoreCol), 6).as("score"))
      }
      side("hub", "hub").unionByName(side("auth", "auth"))
        .orderBy($"role", $"rk")
    }),

    // Community detection over the q225 part co-occurrence graph via
    // monotone synchronous label propagation — names the pieces the
    // 3-core only bounds (crawl-spam / template-farm grouping). The
    // operator loops to the guaranteed fixpoint (labels only descend);
    // measured cascade depth at sf0.01 is 10 rounds, and the oracle
    // unrolls 14 — converged rounds are the identity, so the margin is
    // exact, certifying convergence within the unroll (q225's
    // protocol). Output: per-community size + id range.
    "q229_labelprop" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_partkey").distinct()
      val edges = li.select($"l_orderkey", $"l_partkey".as("u"))
        .join(li.select($"l_orderkey", $"l_partkey".as("v")), "l_orderkey")
        .filter($"u" < $"v" && ($"u" * 1009 + $"v") % 29 === 0)
        .select($"u", $"v").distinct()
      Ops.labelPropagation(edges)
        .groupBy($"label")
        .agg(count(lit(1)).as("n_members"),
          min($"node").as("min_node"), max($"node").as("max_node"))
        .orderBy($"label")
    })
  )

  /** q168 oracle: the 3 PageRank rounds unrolled as CTEs — same
    * decimal-exact contribution sums, same IEEE double damping
    * arithmetic, same floor output (see Ops.pageRank's determinism
    * notes).
    */
  /** k full Bellman-Ford relaxation rounds as iterated CTEs — the
    * relation the frontier-pruned distributed plan must reproduce.
    */
  private def ssspOracleSql(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""d$i AS (
         |  SELECT id, min(dist) AS dist FROM (
         |    SELECT id, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, d.dist + e.w AS dist
         |    FROM d${i - 1} d JOIN e ON e.src = d.id)
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b,
       |    1 + (l_partkey + l_suppkey) % 7 AS w
       |  FROM lineitem),
       |e AS (
       |  SELECT a AS src, b AS dst, w FROM pairs
       |  UNION ALL SELECT b, a, w FROM pairs),
       |d0 AS (
       |  SELECT s_suppkey * 2 + 1 AS id, CAST(0 AS BIGINT) AS dist
       |  FROM supplier WHERE s_suppkey < 3),
       |$steps
       |SELECT id, dist FROM d$rounds ORDER BY id""".stripMargin
  }

  /** q225 oracle: `rounds` unrolled peel rounds (degree filter + both-
    * endpoint edge restriction). Peeling is monotone and idempotent at
    * fixpoint, so rounds past convergence are exact no-ops — the
    * unroll carries margin beyond the measured sf0.01 cascade depth
    * (8) and still equals the operator's true fixpoint.
    */
  private def kcoreOracleSql(rounds: Int, k: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT u FROM e${i - 1} GROUP BY u HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT e.u, e.v FROM e${i - 1} e
         |  WHERE e.u IN (SELECT u FROM k$i)
         |    AND e.v IN (SELECT u FROM k$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |p AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey < b.l_partkey
       |    AND (a.l_partkey * 1009 + b.l_partkey) % 29 = 0),
       |e0 AS MATERIALIZED (
       |  SELECT u, v FROM p UNION ALL SELECT v AS u, u AS v FROM p),
       |$steps
       |SELECT u AS node, count(*) AS deg FROM e$rounds
       |GROUP BY u ORDER BY node""".stripMargin
  }

  /** q229 oracle: `rounds` unrolled monotone-LPA rounds. Per round:
    * neighbor labels + each node's own label counted per (node,
    * label), plurality winner picked by the SAME (count desc, label
    * asc) rule the operator encodes as max(struct(c, -label)), then
    * clamped with least() against the previous label. Labels only
    * descend, so rounds past the measured sf0.01 cascade depth (10)
    * are exact no-ops and the unroll carries idempotent margin.
    */
  private def labelpropOracleSql(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT w.node, least(w.cand, pr.label) AS label
         |  FROM (
         |    SELECT u AS node, nl AS cand FROM (
         |      SELECT u, nl,
         |        row_number() OVER (PARTITION BY u ORDER BY c DESC, nl ASC)
         |          AS rk
         |      FROM (
         |        SELECT t.u, t.nl, count(*) AS c FROM (
         |          SELECT e.u AS u, l.label AS nl
         |          FROM e JOIN l${i - 1} l ON l.node = e.v
         |          UNION ALL
         |          SELECT node AS u, label AS nl FROM l${i - 1}) t
         |        GROUP BY t.u, t.nl) cnt) rkd
         |    WHERE rk = 1) w
         |  JOIN l${i - 1} pr ON pr.node = w.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |p AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey < b.l_partkey
       |    AND (a.l_partkey * 1009 + b.l_partkey) % 29 = 0),
       |e AS MATERIALIZED (
       |  SELECT u, v FROM p UNION ALL SELECT v AS u, u AS v FROM p),
       |l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM e),
       |$steps
       |SELECT label, count(*) AS n_members, min(node) AS min_node,
       |  max(node) AS max_node
       |FROM l$rounds GROUP BY label ORDER BY label""".stripMargin
  }

  /** q226 oracle: `iters` HITS rounds unrolled — per-term
    * decimal(30,12) casts before each half-step's sum, ONE double
    * division by the exact decimal max (Ops.hits determinism notes);
    * ranking replayed as row_number over the full relation (the
    * operator's TakeOrdered+window produces the identical rows).
    */
  private def hitsOracleSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""a${i}r AS (
         |  SELECT e.dst AS id, sum(CAST(h.s AS DECIMAL(30,12))) AS sm
         |  FROM e JOIN h${i - 1} h ON h.id = e.src GROUP BY e.dst),
         |a$i AS (
         |  SELECT id, CAST(sm AS DOUBLE)
         |    / (SELECT CAST(max(sm) AS DOUBLE) FROM a${i}r) AS s
         |  FROM a${i}r),
         |h${i}r AS (
         |  SELECT e.src AS id, sum(CAST(a.s AS DECIMAL(30,12))) AS sm
         |  FROM e JOIN a$i a ON a.id = e.dst GROUP BY e.src),
         |h$i AS (
         |  SELECT id, CAST(sm AS DOUBLE)
         |    / (SELECT CAST(max(sm) AS DOUBLE) FROM h${i}r) AS s
         |  FROM h${i}r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
       |h0 AS (SELECT DISTINCT src AS id, CAST(1.0 AS DOUBLE) AS s FROM e),
       |$steps,
       |ranked AS (
       |  SELECT 'hub' AS role, id, s,
       |    row_number() OVER (ORDER BY s DESC, id ASC) AS rk FROM h$iters
       |  UNION ALL
       |  SELECT 'auth' AS role, id, s,
       |    row_number() OVER (ORDER BY s DESC, id ASC) AS rk FROM a$iters)
       |SELECT role, rk, id, round(s, 6) AS score
       |FROM ranked WHERE rk <= 10
       |ORDER BY role, rk""".stripMargin
  }

  /** The q211 walk CTEs (shared with the q216 skip-gram tail): per-src
    * dst-ranked edges, next hop = md5Long(node:step:salt, 8) mod
    * outdeg + 1 (the Ops.randomWalks recurrence, same md5 family as
    * hashSplit/KMV).
    */
  private def walkCtes(steps: Int, salt: String): String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
       |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT c AS src, p AS dst FROM pairs
       |  UNION ALL SELECT p, c FROM pairs),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |ranked AS (
       |  SELECT src, dst,
       |    row_number() OVER (PARTITION BY src ORDER BY dst) AS rk
       |  FROM edges),
       |walk(seed, step, node) AS (
       |  SELECT c_custkey * 2, 0, c_custkey * 2
       |  FROM customer WHERE c_custkey % 100 = 0
       |  UNION ALL
       |  SELECT w.seed, w.step + 1, r.dst
       |  FROM walk w
       |  JOIN deg d ON d.src = w.node
       |  JOIN ranked r ON r.src = w.node
       |    AND r.rk = CAST('0x' || substr(md5(
       |        CAST(w.node AS VARCHAR) || ':'
       |          || CAST(w.step AS VARCHAR) || ':$salt'), 1, 8) AS BIGINT)
       |      % d.outdeg + 1
       |  WHERE w.step < $steps)""".stripMargin

  // NB: walkCtes is already margin-stripped — the tails concatenate
  // plain strings (an outer stripMargin would strip the `||` concat
  // lines INSIDE the interpolated CTEs a second time).
  private def randomWalksOracleSql(steps: Int, salt: String): String =
    walkCtes(steps, salt) +
      "\nSELECT seed, step, node FROM walk\nORDER BY seed, step, node"

  /** q216 oracle: window-2 skip-gram pairs over the same walk corpus. */
  private def walkSkipgramsOracleSql(steps: Int, salt: String,
                                     window: Int): String =
    walkCtes(steps, salt) + s"""
SELECT a.node AS center, b.node AS context, count(*) AS n
FROM walk a JOIN walk b
  ON a.seed = b.seed AND a.step <> b.step
  AND abs(a.step - b.step) <= $window
GROUP BY 1, 2
ORDER BY center, context"""

  /** The generic PageRank round CTEs, shared by the q168 oracle and
    * the q260 crawl-frontier oracle (TextQueries): assumes CTEs named
    * `edges(src,dst)`, `deg(src,d)`, `nodes(id)`, `nn(cnt)`, and
    * `r0(id,r)` are already in scope, and appends dm{i}/recv{i}/r{i}
    * for rounds 1..iters. Replays Ops.pageRank's textbook recurrence
    * term-for-term: per round a 1-row dangling-mass scalar (rank on
    * nodes without out-edges, decimal sum), receiving-node
    * contribution sums in DECIMAL(30,15), and the fixed-order double
    * damping expression (1-d)/n + d·(S + DM/n) over ALL nodes via
    * LEFT JOIN.
    */
  private[queries] def pageRankRoundsSql(iters: Int): String =
    (1 to iters).map { i =>
      s"""dm$i AS (
         |  SELECT sum(CAST(rr.r AS DECIMAL(30,15))) AS dm
         |  FROM r${i - 1} rr
         |  WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.src = rr.id)),
         |recv$i AS (
         |  SELECT e.dst AS id,
         |    sum(CAST(rr.r / deg.d AS DECIMAL(30,15))) AS s
         |  FROM edges e JOIN r${i - 1} rr ON rr.id = e.src
         |  JOIN deg ON deg.src = e.src
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT nodes.id,
         |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / cnt
         |      + CAST(0.85 AS DOUBLE) *
         |        (COALESCE(CAST(s AS DOUBLE), CAST(0 AS DOUBLE))
         |         + COALESCE(CAST(dm AS DOUBLE), CAST(0 AS DOUBLE))
         |           / CAST(cnt AS DOUBLE))
         |      AS r
         |  FROM nodes LEFT JOIN recv$i ON recv$i.id = nodes.id
         |  CROSS JOIN nn CROSS JOIN dm$i)""".stripMargin
    }.mkString(",\n")

  private def pageRankOracleSql(iters: Int): String = {
    val rounds = pageRankRoundsSql(iters)
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
       |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT c AS src, p AS dst FROM pairs
       |  UNION ALL SELECT p, c FROM pairs),
       |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       |nodes AS (
       |  SELECT DISTINCT id FROM (
       |    SELECT src AS id FROM edges
       |    UNION ALL SELECT dst FROM edges)),
       |nn AS (SELECT count(*) AS cnt FROM nodes),
       |r0 AS (
       |  SELECT id, CAST(1 AS DOUBLE) / cnt AS r
       |  FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT id, CAST(floor(r * 1e10) AS BIGINT) AS r_e10
       |FROM r$iters ORDER BY r_e10 DESC, id LIMIT 100""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q168_pagerank" -> pageRankOracleSql(3),
    "q179_sssp" -> ssspOracleSql(6),
    "q225_kcore" -> kcoreOracleSql(16, 3),
    "q226_hits" -> hitsOracleSql(2),
    "q229_labelprop" -> labelpropOracleSql(14),
    "q211_random_walks" -> randomWalksOracleSql(4, "w1"),
    "q216_walk_skipgrams" -> walkSkipgramsOracleSql(4, "w1", window = 2),

    // definitional weighted lower median: first value whose cumulative
    // weight reaches half the total
    "q184_weighted_median" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |f AS (SELECT g, v, sum(w) AS vw FROM b GROUP BY g, v),
        |c AS (
        |  SELECT g, v,
        |    sum(vw) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(vw) OVER (PARTITION BY g) AS tw
        |  FROM f)
        |SELECT g AS l_returnflag,
        |  CAST(min(v) AS DOUBLE) / 100 AS median_price,
        |  CAST(min(tw) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= tw
        |GROUP BY g ORDER BY g""".stripMargin,

    // same ascending order, same integer rank sums, same two-term
    // ratio — the window rank is the relation assignIds replaces
    "q203_gini_spend" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |r AS (
        |  SELECT cents, row_number() OVER (
        |    ORDER BY cents ASC, o_custkey ASC) AS i
        |  FROM spend)
        |SELECT count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  round(CAST(sum(CAST(i AS HUGEINT) * cents) * 2 AS DOUBLE)
        |      / CAST(count(*) * sum(cents) AS DOUBLE)
        |    - CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS gini
        |FROM r""".stripMargin,

    // q196's binning CTEs + q178's exact-stat OLS arithmetic, grouped
    // by (flag, bin)
    "q200_elasticity_by_tier" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |f AS (SELECT g, v, count(*) AS vw FROM b GROUP BY g, v),
        |c AS (
        |  SELECT g, v,
        |    sum(vw) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(vw) OVER (PARTITION BY g) AS tw
        |  FROM f),
        |p AS (SELECT unnest([250, 500, 750]) AS permille),
        |bounds AS (
        |  SELECT g,
        |    max(CASE WHEN permille = 250 THEN q END) AS b1,
        |    max(CASE WHEN permille = 500 THEN q END) AS b2,
        |    max(CASE WHEN permille = 750 THEN q END) AS b3
        |  FROM (
        |    SELECT g, permille, min(v) AS q
        |    FROM c CROSS JOIN p
        |    WHERE cum * 1000 >= permille * tw
        |    GROUP BY g, permille)
        |  GROUP BY g),
        |d AS (
        |  SELECT b.g,
        |    (CASE WHEN b1 < v THEN 1 ELSE 0 END
        |     + CASE WHEN b2 < v THEN 1 ELSE 0 END
        |     + CASE WHEN b3 < v THEN 1 ELSE 0 END) AS bin,
        |    CAST(v AS HUGEINT) AS x, CAST(qty AS HUGEINT) AS y
        |  FROM b JOIN bounds ON bounds.g = b.g),
        |a AS (
        |  SELECT g, bin, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM d GROUP BY g, bin),
        |m AS (
        |  SELECT g, bin, n, sx, sy,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS varyn
        |  FROM a)
        |SELECT g AS l_returnflag, bin, n,
        |  round(CASE WHEN varxn <> 0 THEN covn / varxn END
        |    * 1000000.0, 6) AS slope_ppm,
        |  round(CASE WHEN varxn <> 0 THEN
        |    (CAST(sy AS DOUBLE) - (covn / varxn) * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) END, 6) AS intercept,
        |  round(CASE WHEN varxn <> 0 AND varyn <> 0 THEN
        |    (covn * covn) / (varxn * varyn) END, 6) AS r2
        |FROM m ORDER BY l_returnflag, bin""".stripMargin,

    // identical straddle boundaries (q185 machinery), identical
    // strict-less binning
    "q196_quantile_binning" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem),
        |f AS (SELECT g, v, count(*) AS vw FROM b GROUP BY g, v),
        |c AS (
        |  SELECT g, v,
        |    sum(vw) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(vw) OVER (PARTITION BY g) AS tw
        |  FROM f),
        |p AS (SELECT unnest([250, 500, 750]) AS permille),
        |bounds AS (
        |  SELECT g,
        |    max(CASE WHEN permille = 250 THEN q END) AS b1,
        |    max(CASE WHEN permille = 500 THEN q END) AS b2,
        |    max(CASE WHEN permille = 750 THEN q END) AS b3
        |  FROM (
        |    SELECT g, permille, min(v) AS q
        |    FROM c CROSS JOIN p
        |    WHERE cum * 1000 >= permille * tw
        |    GROUP BY g, permille)
        |  GROUP BY g)
        |SELECT b.g AS l_returnflag,
        |  (CASE WHEN b1 < v THEN 1 ELSE 0 END
        |   + CASE WHEN b2 < v THEN 1 ELSE 0 END
        |   + CASE WHEN b3 < v THEN 1 ELSE 0 END) AS bin,
        |  count(*) AS n, min(v) AS min_cents, max(v) AS max_cents
        |FROM b JOIN bounds ON bounds.g = b.g
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // identical sample, identical pair counts, identical fixed-order
    // cosine
    "q195_item_similarity" ->
      """WITH baskets AS (
        |  SELECT DISTINCT o_custkey AS ck, p_brand AS brand
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE o_custkey % 3 = 0),
        |cnt AS (SELECT brand, count(*) AS n FROM baskets GROUP BY brand),
        |pairs AS (
        |  SELECT a.brand AS ba, b.brand AS bb, count(*) AS nab
        |  FROM baskets a JOIN baskets b ON a.ck = b.ck AND a.brand < b.brand
        |  GROUP BY 1, 2),
        |sym AS (
        |  SELECT ba, bb, nab FROM pairs
        |  UNION ALL SELECT bb, ba, nab FROM pairs),
        |sim AS (
        |  SELECT sym.ba AS brand, sym.bb AS other, nab,
        |    CAST(nab AS DOUBLE) /
        |      (sqrt(CAST(ca.n AS DOUBLE)) * sqrt(CAST(cb.n AS DOUBLE)))
        |      AS sim
        |  FROM sym
        |  JOIN cnt ca ON ca.brand = sym.ba
        |  JOIN cnt cb ON cb.brand = sym.bb)
        |SELECT brand, other, nab, round(sim, 6) AS sim, rk FROM (
        |  SELECT brand, other, nab, sim, row_number() OVER (
        |    PARTITION BY brand ORDER BY sim DESC, other ASC) AS rk
        |  FROM sim)
        |WHERE rk <= 3
        |ORDER BY brand, rk""".stripMargin,

    // same straddle rule per permille point
    "q185_exact_quartiles" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |f AS (SELECT g, v, sum(w) AS vw FROM b GROUP BY g, v),
        |c AS (
        |  SELECT g, v,
        |    sum(vw) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(vw) OVER (PARTITION BY g) AS tw
        |  FROM f),
        |p AS (SELECT unnest([250, 500, 750]) AS permille)
        |SELECT g AS l_returnflag, CAST(permille AS BIGINT) AS permille,
        |  CAST(min(v) AS DOUBLE) / 100 AS price,
        |  CAST(min(tw) AS BIGINT) AS total_weight
        |FROM c CROSS JOIN p
        |WHERE cum * 1000 >= permille * tw
        |GROUP BY g, permille
        |ORDER BY g, permille""".stripMargin,

    // identical sufficient statistics, identical fixed-order double
    // ratio arithmetic
    "q178_regression" ->
      """WITH d AS (
        |  SELECT event_type,
        |    CAST(EXTRACT(hour FROM ts) AS HUGEINT) AS x,
        |    CAST(floor(value * 100) AS HUGEINT) AS y
        |  FROM events),
        |a AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM d GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n, sx, sy,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS varyn
        |  FROM a)
        |SELECT event_type, n,
        |  round(CASE WHEN varxn <> 0 THEN covn / varxn END, 6) AS slope,
        |  round(CASE WHEN varxn <> 0 THEN
        |    (CAST(sy AS DOUBLE) - (covn / varxn) * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) END, 6) AS intercept,
        |  round(CASE WHEN varxn <> 0 AND varyn <> 0 THEN
        |    (covn * covn) / (varxn * varyn) END, 6) AS r2
        |FROM m ORDER BY event_type""".stripMargin,

    // both IRLS iterations unrolled as CTEs: identical feature/label
    // projection, identical inline p = sigmoid(eta) per iteration,
    // per-term DECIMAL(30,12) casts before the (order-free) sums, and
    // the same fixed-order Cramer solve — the only engine-variant op
    // is exp(), absorbed by the round-6 output (repo-wide precedent
    // for ln/exp queries)
    "q221_logit_irls" ->
      """WITH f AS (
        |  SELECT CAST(1.0 AS DOUBLE) AS x0,
        |    CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
        |    CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
        |         ELSE CAST(0.0 AS DOUBLE) END AS y
        |  FROM documents),
        |p1 AS (
        |  SELECT x0, x1, y,
        |    1.0 / (1.0 + exp(-(0.0 * x0 + 0.0 * x1))) AS p
        |  FROM f),
        |s1 AS (
        |  SELECT
        |    sum(CAST(p * (1.0 - p) * x0 * x0 AS DECIMAL(30,12))) AS s00,
        |    sum(CAST(p * (1.0 - p) * x0 * x1 AS DECIMAL(30,12))) AS s01,
        |    sum(CAST(p * (1.0 - p) * x1 * x1 AS DECIMAL(30,12))) AS s11,
        |    sum(CAST((y - p) * x0 AS DECIMAL(30,12))) AS g0,
        |    sum(CAST((y - p) * x1 AS DECIMAL(30,12))) AS g1
        |  FROM p1),
        |b1 AS (
        |  SELECT
        |    0.0 + (CAST(s11 AS DOUBLE) * CAST(g0 AS DOUBLE)
        |         - CAST(s01 AS DOUBLE) * CAST(g1 AS DOUBLE))
        |      / (CAST(s00 AS DOUBLE) * CAST(s11 AS DOUBLE)
        |         - CAST(s01 AS DOUBLE) * CAST(s01 AS DOUBLE)) AS b0,
        |    0.0 + (CAST(s00 AS DOUBLE) * CAST(g1 AS DOUBLE)
        |         - CAST(s01 AS DOUBLE) * CAST(g0 AS DOUBLE))
        |      / (CAST(s00 AS DOUBLE) * CAST(s11 AS DOUBLE)
        |         - CAST(s01 AS DOUBLE) * CAST(s01 AS DOUBLE)) AS b1
        |  FROM s1),
        |p2 AS (
        |  SELECT x0, x1, y,
        |    1.0 / (1.0 + exp(-(b.b0 * x0 + b.b1 * x1))) AS p
        |  FROM f CROSS JOIN b1 b),
        |s2 AS (
        |  SELECT
        |    sum(CAST(p * (1.0 - p) * x0 * x0 AS DECIMAL(30,12))) AS s00,
        |    sum(CAST(p * (1.0 - p) * x0 * x1 AS DECIMAL(30,12))) AS s01,
        |    sum(CAST(p * (1.0 - p) * x1 * x1 AS DECIMAL(30,12))) AS s11,
        |    sum(CAST((y - p) * x0 AS DECIMAL(30,12))) AS g0,
        |    sum(CAST((y - p) * x1 AS DECIMAL(30,12))) AS g1
        |  FROM p2),
        |b2 AS (
        |  SELECT
        |    b.b0 + (CAST(s11 AS DOUBLE) * CAST(g0 AS DOUBLE)
        |          - CAST(s01 AS DOUBLE) * CAST(g1 AS DOUBLE))
        |      / (CAST(s00 AS DOUBLE) * CAST(s11 AS DOUBLE)
        |         - CAST(s01 AS DOUBLE) * CAST(s01 AS DOUBLE)) AS beta0,
        |    b.b1 + (CAST(s00 AS DOUBLE) * CAST(g1 AS DOUBLE)
        |          - CAST(s01 AS DOUBLE) * CAST(g0 AS DOUBLE))
        |      / (CAST(s00 AS DOUBLE) * CAST(s11 AS DOUBLE)
        |         - CAST(s01 AS DOUBLE) * CAST(s01 AS DOUBLE)) AS beta1
        |  FROM s2 CROSS JOIN b1 b)
        |SELECT 0 AS idx, round(beta0, 6) AS beta FROM b2
        |UNION ALL
        |SELECT 1 AS idx, round(beta1, 6) AS beta FROM b2
        |ORDER BY idx""".stripMargin,

    // same apriori replay: dedup baskets, item counts, pair counts,
    // identical double ratio arithmetic
    "q177_assoc_rules" ->
      """WITH baskets AS (
        |  SELECT DISTINCT o_custkey AS ck, p_brand AS b
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey),
        |nt AS (SELECT count(DISTINCT ck) AS n_total FROM baskets),
        |items AS (SELECT b, count(*) AS n_item FROM baskets GROUP BY b),
        |pairs AS (
        |  SELECT a.b AS ba, c.b AS bb, count(*) AS n_both
        |  FROM baskets a JOIN baskets c ON a.ck = c.ck AND a.b < c.b
        |  WHERE a.b IN (SELECT b FROM items WHERE n_item >= 800)
        |    AND c.b IN (SELECT b FROM items WHERE n_item >= 800)
        |  GROUP BY 1, 2 HAVING count(*) >= 800),
        |directed AS (
        |  SELECT ba AS ant, bb AS cons, n_both FROM pairs
        |  UNION ALL
        |  SELECT bb AS ant, ba AS cons, n_both FROM pairs),
        |m AS (
        |  SELECT d.ant, d.cons, d.n_both, ia.n_item AS n_ant,
        |    ic.n_item AS n_cons, nt.n_total
        |  FROM directed d
        |  JOIN items ia ON ia.b = d.ant
        |  JOIN items ic ON ic.b = d.cons
        |  CROSS JOIN nt)
        |SELECT ant, cons, n_both, n_ant, n_cons,
        |  round(CAST(n_both AS DOUBLE) / n_total, 6) AS support,
        |  round(CAST(n_both AS DOUBLE) / n_ant, 6) AS confidence,
        |  round((CAST(n_both AS DOUBLE) * n_total) / (n_ant * n_cons), 6)
        |    AS lift
        |FROM m
        |WHERE CAST(n_both AS DOUBLE) / n_ant >= 0.7
        |ORDER BY ant, cons""".stripMargin,

    // same md5 order, same integer largest-remainder arithmetic
    "q174_stratified_split" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rk
        |  FROM d),
        |n AS (SELECT lang, count(*) AS n FROM d GROUP BY lang),
        |alloc AS (
        |  SELECT lang, idx, (n * w) // 1000 AS base, (n * w) % 1000 AS fp, n
        |  FROM n CROSS JOIN (VALUES ('train', 0, 800), ('val', 1, 100),
        |    ('test', 2, 100)) AS s(split, idx, w)),
        |give AS (
        |  SELECT lang, idx, base, n,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY fp DESC, idx ASC) AS pr,
        |    n - sum(base) OVER (PARTITION BY lang) AS rem
        |  FROM alloc),
        |bounds AS (
        |  SELECT lang, idx,
        |    sum(base + CASE WHEN pr <= rem THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY lang ORDER BY idx) AS hi
        |  FROM give),
        |p AS (
        |  SELECT lang,
        |    max(CASE WHEN idx = 0 THEN hi END) AS h0,
        |    max(CASE WHEN idx = 1 THEN hi END) AS h1
        |  FROM bounds GROUP BY lang)
        |SELECT r.doc_id, r.lang,
        |  CASE WHEN rk <= h0 THEN 'train'
        |       WHEN rk <= h1 THEN 'val' ELSE 'test' END AS split
        |FROM r JOIN p ON p.lang = r.lang
        |ORDER BY r.doc_id""".stripMargin,

    // the recursive walk the pointer-doubling plan replaces
    "q173_hierarchy_flatten" ->
      """WITH RECURSIVE walk AS (
        |  SELECT c_custkey AS id, c_custkey AS cur, 0 AS depth FROM customer
        |  UNION ALL
        |  SELECT id, cur // 10 AS cur, depth + 1 AS depth
        |  FROM walk WHERE cur >= 10)
        |SELECT id, cur AS root, CAST(depth AS BIGINT) AS depth
        |FROM walk WHERE cur < 10 ORDER BY id""".stripMargin,

    // definitional triangle enumeration: a<b<c triple join over the
    // undirected edge set
    "q172_triangle_count" ->
      """WITH s AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        |      FROM s a JOIN s b
        |      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        |      WHERE (a.l_suppkey * 1009 + b.l_suppkey) % 17 = 0),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM e e1
        |        JOIN e e2 ON e2.u = e1.v
        |        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT node, count(*) AS triangles
        |FROM (SELECT unnest([a, b, c]) AS node FROM tri)
        |GROUP BY node ORDER BY node""".stripMargin,

    // direct recompute of today's snapshot — the incremental merge
    // must land on the identical view
    "q171_incremental_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(round(sum(CAST(
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
        |         ELSE o_totalprice END AS DECIMAL(30,4))), 2)
        |    AS DOUBLE) AS rev
        |FROM orders
        |WHERE o_orderkey % 13 <> 0
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    // layout must not change the answer: replay the join/agg from the
    // raw parquet tables
    "q165_bucketed_join" ->
      """SELECT o_orderpriority,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,4))), 2)
        |    AS DOUBLE) AS rev,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-03-01'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // the md5 draw replayed: same hash prefix, same mod, same
    // within-shard rank
    "q166_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'r10'),
        |      1, 15) AS BIGINT) AS hh
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(hh % 8 AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id)
        |    - 1 AS INTEGER) AS pos
        |FROM h ORDER BY doc_id""".stripMargin,
    "q34_approx_distinct" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  TRUE AS approx_parts_ok, TRUE AS approx_orders_ok
        |FROM lineitem""".stripMargin,

    "q82_cms_heavy_hitters" ->
      """SELECT tok, n, rk, TRUE AS cms_ok FROM (
        |  SELECT tok, count(*) AS n,
        |    row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS rk
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok != '' GROUP BY tok)
        |WHERE rk <= 10 ORDER BY rk""".stripMargin,

    "q88_bloom_prejoin" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,4))), 2) AS DOUBLE) AS total_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 1
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q84_zorder_curve" -> {
      val z = graft.operators.Ops.zorderSql("c_custkey", "c_nationkey")
      s"""SELECT c_custkey, c_nationkey, $z AS z
         |FROM customer ORDER BY z ASC, c_custkey ASC LIMIT 100""".stripMargin
    },

    "q83_percentile_sketch" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q30_dedup_lastwins" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q31_lookup_enrich" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,4))), 2) AS DOUBLE) AS total_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q32_concat" ->
      """SELECT count(*) AS n_rows,
        |  count(o_custkey) AS n_custkey,
        |  count(o_totalprice) AS n_totalprice,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,4))), 2) AS DOUBLE) AS sum_price
        |FROM (
        |  SELECT o_orderkey, o_custkey, NULL AS o_totalprice
        |  FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, NULL AS o_custkey, o_totalprice
        |  FROM orders WHERE o_orderstatus = 'O')""".stripMargin,

    "q37_range_join" ->
      """SELECT c.event_id, c.user_id, p.event_id AS purchase_id
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') c
        |JOIN (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
        |ORDER BY c.event_id, purchase_id""".stripMargin,

    "q36_asof_tolerance" ->
      """SELECT c.event_id, c.user_id,
        |  CASE WHEN c.ts - p.ts <= INTERVAL 24 HOURS
        |       THEN p.purchase_id END AS p_purchase_id
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS purchase_id
        |                FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "q35_weighted_avg" ->
      """SELECT l_returnflag,
        |  round(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,6))) AS DOUBLE)
        |      / CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE), 4) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q33_asof_join" ->
      """SELECT c.event_id, c.user_id,
        |  p.purchase_id AS p_purchase_id,
        |  round(p.purchase_value, 2) AS p_purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS purchase_id,
        |                  value AS purchase_value
        |                FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    // Same semantics (and oracle) as q33 — the bucketed implementation
    // must be indistinguishable from the plain one.
    "q39_asof_bucketed" ->
      """SELECT c.event_id, c.user_id,
        |  p.purchase_id AS p_purchase_id,
        |  round(p.purchase_value, 2) AS p_purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS purchase_id,
        |                  value AS purchase_value
        |                FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    "q118_scd2_merge" ->
      """WITH p AS (
        |  SELECT user_id, event_id, round(value, 2) AS spend, ts
        |  FROM events WHERE event_type = 'purchase'),
        |pre AS (
        |  SELECT user_id, event_id, spend, ts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn,
        |    lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS next_ts
        |  FROM p WHERE ts < TIMESTAMP '2024-01-21 00:00:00'),
        |cur AS (
        |  SELECT user_id, event_id, spend, ts AS valid_from,
        |    CASE WHEN rn = 1 THEN NULL ELSE next_ts END AS valid_to,
        |    (rn = 1) AS is_current
        |  FROM pre WHERE rn <= 2),
        |chg AS (SELECT user_id, event_id, spend, ts FROM p
        |        WHERE ts >= TIMESTAMP '2024-01-21 00:00:00'),
        |keys AS (SELECT DISTINCT user_id FROM chg),
        |ev AS (
        |  SELECT user_id, event_id, spend, valid_from AS ts FROM cur
        |  WHERE is_current AND user_id IN (SELECT user_id FROM keys)
        |  UNION ALL
        |  SELECT user_id, event_id, spend, ts FROM chg),
        |ver AS (
        |  SELECT user_id, event_id, spend, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS valid_to
        |  FROM ev),
        |merged AS (
        |  SELECT user_id, event_id, spend, valid_from, valid_to FROM cur
        |  WHERE (NOT is_current) OR user_id NOT IN (SELECT user_id FROM keys)
        |  UNION ALL
        |  SELECT user_id, event_id, spend, valid_from, valid_to FROM ver)
        |SELECT user_id, event_id, spend,
        |  strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM merged
        |ORDER BY user_id, merged.valid_from, event_id""".stripMargin,

    "q119_kmv_theta" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(user_id AS VARCHAR) || ':'
        |      || CAST(CAST(ts AS DATE) AS VARCHAR) AS akey
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |h AS (
        |  SELECT event_type, akey,
        |    CAST(CAST('0x' || substr(md5(akey), 1, 8) AS BIGINT) AS DOUBLE)
        |      / 4294967296.0 AS u
        |  FROM ev),
        |d AS (SELECT DISTINCT event_type, u FROM h),
        |r AS (SELECT event_type, u,
        |        row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk
        |      FROM d),
        |sk AS (SELECT event_type, u, rk FROM r WHERE rk <= 128),
        |st AS (SELECT event_type, count(*) AS m,
        |         max(CASE WHEN rk = 128 THEN u END) AS uk,
        |         CASE WHEN count(*) < 128 THEN 1.0
        |              ELSE max(CASE WHEN rk = 128 THEN u END) END AS theta
        |       FROM sk GROUP BY event_type),
        |ex AS (SELECT event_type, count(DISTINCT akey) AS exact
        |       FROM ev GROUP BY 1),
        |per AS (
        |  SELECT st.event_type AS scope,
        |    round(CASE WHEN m < 128 THEN CAST(m AS DOUBLE)
        |               ELSE 127.0 / uk END, 4) AS est_distinct,
        |    ex.exact AS exact_distinct
        |  FROM st JOIN ex ON st.event_type = ex.event_type),
        |tau AS (SELECT min(theta) AS t FROM st),
        |flags AS (SELECT akey,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
        |  FROM ev GROUP BY akey),
        |exb AS (SELECT CAST(sum(CASE WHEN hc = 1 AND hp = 1
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS x_and,
        |               count(*) AS x_or,
        |               CAST(sum(CASE WHEN hc = 1 AND hp = 0
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS x_diff
        |        FROM flags),
        |common AS (SELECT count(*) AS c FROM sk a
        |  JOIN sk b ON a.u = b.u AND a.event_type = 'click'
        |    AND b.event_type = 'purchase'
        |  CROSS JOIN tau WHERE a.u < tau.t),
        |uvals AS (SELECT count(DISTINCT u) AS c
        |  FROM sk CROSS JOIN tau WHERE u < tau.t),
        |diffc AS (SELECT count(*) AS c FROM sk a CROSS JOIN tau
        |  WHERE a.event_type = 'click' AND a.u < tau.t
        |    AND NOT EXISTS (SELECT 1 FROM sk b
        |      WHERE b.event_type = 'purchase' AND b.u = a.u))
        |SELECT scope, est_distinct, exact_distinct FROM (
        |  SELECT * FROM per
        |  UNION ALL
        |  SELECT 'click_and_purchase',
        |    round(CAST(common.c AS DOUBLE) / tau.t, 4), exb.x_and
        |  FROM common CROSS JOIN tau CROSS JOIN exb
        |  UNION ALL
        |  SELECT 'click_or_purchase',
        |    round(CAST(uvals.c AS DOUBLE) / tau.t, 4), exb.x_or
        |  FROM uvals CROSS JOIN tau CROSS JOIN exb
        |  UNION ALL
        |  SELECT 'click_minus_purchase',
        |    round(CAST(diffc.c AS DOUBLE) / tau.t, 4), exb.x_diff
        |  FROM diffc CROSS JOIN tau CROSS JOIN exb)
        |ORDER BY scope""".stripMargin,

    "q127_profile" -> {
      def row(c: String) =
        s"""SELECT '$c' AS col_name,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_val,
           |  CAST(max($c) AS VARCHAR) AS max_val
           |FROM documents""".stripMargin
      Seq("doc_id", "text", "lang", "source", "n_chars")
        .map(row).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q128_integrity" ->
      """SELECT
        |  (SELECT count(*) FROM lineitem l
        |   LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |   WHERE o.o_orderkey IS NULL) AS orphan_lineitems,
        |  (SELECT count(*) FROM orders o
        |   LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |   WHERE c.c_custkey IS NULL) AS orphan_orders,
        |  (SELECT count(*) FROM (
        |     SELECT o_orderkey FROM orders
        |     GROUP BY 1 HAVING count(*) > 1)) AS dup_orderkeys,
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_quantity <= 0 OR l_discount < 0 OR l_discount > 1)
        |    AS bad_lineitem_domain""".stripMargin,

    "q129_snapshot_diff" ->
      """WITH p AS (
        |  SELECT user_id, round(value, 2) AS spend, ts, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |oldsnap AS (
        |  SELECT user_id, spend FROM (
        |    SELECT user_id, spend, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM p WHERE ts < TIMESTAMP '2024-01-21 00:00:00')
        |  WHERE rn = 1),
        |newsnap AS (
        |  SELECT user_id, spend FROM (
        |    SELECT user_id, spend, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM p)
        |  WHERE rn = 1)
        |SELECT coalesce(o.user_id, n.user_id) AS user_id,
        |  CASE WHEN o.user_id IS NULL THEN 'insert'
        |       WHEN n.user_id IS NULL THEN 'delete'
        |       WHEN o.spend IS DISTINCT FROM n.spend THEN 'update'
        |  END AS change_type,
        |  o.spend AS old_spend, n.spend AS new_spend
        |FROM oldsnap o FULL JOIN newsnap n ON o.user_id = n.user_id
        |WHERE CASE WHEN o.user_id IS NULL THEN 'insert'
        |           WHEN n.user_id IS NULL THEN 'delete'
        |           WHEN o.spend IS DISTINCT FROM n.spend THEN 'update'
        |      END IS NOT NULL
        |ORDER BY user_id""".stripMargin,

    "q130_weighted_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, n_chars, -ln(u) / n_chars AS es_key,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY -ln(u) / n_chars ASC, doc_id ASC) AS rk
        |  FROM d)
        |SELECT source, doc_id, n_chars,
        |  round(es_key * 1000, 6) AS es_key_k, rk
        |FROM r WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin
  )
}
