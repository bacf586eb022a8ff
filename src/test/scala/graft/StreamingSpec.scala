package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Structured Streaming slice: the same EventStreams functions run
  * incrementally (readStream → watermark → memory sink) must converge
  * to the batch answer once all input is processed.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming tumbling agg converges to the batch result") {
    val stream = EventStreams.readEventStream(spark, sf)
    val q = EventStreams.streamingTumbling(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_tumbling")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("stream_tumbling")
      .select("ws", "event_type", "n", "total")

    val batch = EventStreams.tumblingCounts(Tables(spark, sf, "events"))

    // Append mode only emits windows the watermark has passed; every
    // emitted window must match its batch twin exactly, and most
    // windows must have been emitted (watermark = 2h of a 30-day span).
    val total = batch.count()
    val emitted = streamed.count()
    assert(emitted >= total - 50, s"emitted=$emitted batch=$total")
    val mismatched = streamed.join(batch,
      Seq("ws", "event_type", "n", "total"), "left_anti").count()
    assert(mismatched == 0, s"$mismatched streamed windows disagree with batch")
  }

  test("Trigger.AvailableNow backfill run terminates on its own and matches batch") {
    // The production backfill pattern: process everything currently
    // available, then STOP — no processAllAvailable() babysitting, the
    // query terminates itself. Results must match the continuously-run
    // twin above.
    val stream = EventStreams.readEventStream(spark, sf)
    val q = EventStreams.streamingTumbling(stream)
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("tumbling_backfill")
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    val streamed = spark.table("tumbling_backfill")
      .select("ws", "event_type", "n", "total")
    val batch = EventStreams.tumblingCounts(Tables(spark, sf, "events"))
    assert(streamed.count() >= batch.count() - 50)
    assert(streamed.join(batch,
      Seq("ws", "event_type", "n", "total"), "left_anti").count() == 0)
  }

  test("stream-stream interval join converges to the batch twin") {
    def views(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    // both sides watermarked → join state is bounded by wm + interval
    val q = EventStreams.intervalJoin(
        views(EventStreams.readEventStream(spark, sf)).withWatermark("ts", "2 hours"),
        clicks(EventStreams.readEventStream(spark, sf)).withWatermark("ts", "2 hours"),
        "user_id", "1 hour")
      .select(col("view_id"), col("r_click_id").as("click_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_join")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ss_join")
    val ev = Tables(spark, sf, "events")
    val batch = EventStreams.intervalJoin(views(ev), clicks(ev),
        "user_id", "1 hour")
      .select(col("view_id"), col("r_click_id").as("click_id"))
    // inner stream-stream joins emit on match (not on watermark), so
    // after processAllAvailable the pair set must equal batch exactly
    assert(streamed.count() == batch.count())
    assert(streamed.join(batch, Seq("view_id", "click_id"), "left_anti")
      .count() == 0)
  }

  test("left-outer interval join: watermark-gated nulls converge to the batch twin") {
    def views(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val q = EventStreams.intervalJoinLeftOuter(
        views(EventStreams.readEventStream(spark, sf)).withWatermark("ts", "2 hours"),
        clicks(EventStreams.readEventStream(spark, sf)).withWatermark("ts", "2 hours"),
        "user_id", "1 hour")
      .select(col("view_id"), col("r_click_id").as("click_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_outer_join")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ss_outer_join")
    val ev = Tables(spark, sf, "events")
    val batch = EventStreams.intervalJoinLeftOuter(views(ev), clicks(ev),
        "user_id", "1 hour")
      .select(col("view_id"), col("r_click_id").as("click_id"))
    // matched pairs emit on match — complete after processAllAvailable;
    // every emitted row must exist in batch (NULL click_id compared
    // null-safely: a plain equi-anti-join would flag every null row)
    assert(streamed.join(batch,
        streamed("view_id") === batch("view_id") &&
          streamed("click_id") <=> batch("click_id"), "left_anti")
      .count() == 0, "streamed a row the batch relation does not contain")
    val streamedNulls = streamed.filter(col("click_id").isNull).count()
    val batchNulls = batch.filter(col("click_id").isNull).count()
    // unmatched views emit only once the watermark proves no click can
    // still arrive — the final watermark (max ts - 2h) gates the tail,
    // so streaming emits a PREFIX of the batch null set: non-empty,
    // never larger
    assert(streamedNulls > 0,
      "no unmatched views emitted — outer-join state never closed")
    assert(streamedNulls <= batchNulls)
    // and matched rows are exactly complete
    assert(streamed.filter(col("click_id").isNotNull).count() ==
      batch.filter(col("click_id").isNotNull).count())
  }

  test("full-outer interval join: both unmatched sides converge to the batch twin") {
    def views(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val q = EventStreams.intervalJoinFullOuter(
        views(EventStreams.readEventStream(spark, sf)).withWatermark("ts", "2 hours"),
        clicks(EventStreams.readEventStream(spark, sf)).withWatermark("ts", "2 hours"),
        "user_id", "1 hour")
      .select(col("view_id"), col("r_click_id").as("click_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_full_outer_join")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ss_full_outer_join")
    val ev = Tables(spark, sf, "events")
    val batch = EventStreams.intervalJoinFullOuter(views(ev), clicks(ev),
        "user_id", "1 hour")
      .select(col("view_id"), col("r_click_id").as("click_id"))
    // soundness: every streamed row exists in the batch relation
    // (null-safe on BOTH sides — either may be the unmatched one)
    assert(streamed.join(batch,
        streamed("view_id") <=> batch("view_id") &&
          streamed("click_id") <=> batch("click_id"), "left_anti")
      .count() == 0, "streamed a row the batch relation does not contain")
    // matched pairs are exactly complete
    assert(streamed.filter(col("view_id").isNotNull &&
        col("click_id").isNotNull).count() ==
      batch.filter(col("view_id").isNotNull &&
        col("click_id").isNotNull).count())
    // each unmatched side emits a watermark-bounded, non-trivial prefix
    val sViewOnly = streamed.filter(col("click_id").isNull).count()
    val bViewOnly = batch.filter(col("click_id").isNull).count()
    val sClickOnly = streamed.filter(col("view_id").isNull).count()
    val bClickOnly = batch.filter(col("view_id").isNull).count()
    assert(sViewOnly <= bViewOnly && sClickOnly <= bClickOnly)
    assert(sViewOnly > 0,
      "no unmatched views emitted — full-outer state never closed")
    if (bClickOnly > 0) assert(sClickOnly > 0,
      "batch has orphan clicks but streaming emitted none before the final watermark")
  }

  test("foreachBatch SCD2: streamed change batches maintain the dimension") {
    // Streaming dimension maintenance: each micro-batch of changes is
    // merged with Ops.scd2Apply; the final dimension must equal the
    // one-shot merge of all changes. localCheckpoint materializes the
    // running dimension — a foreachBatch DataFrame is only valid inside
    // its own invocation, so lineage must not escape the callback.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.Ev
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val dim0 = Seq((10L, 1.0, ts(0)), (20L, 2.0, ts(0)))
      .toDF("user_id", "value", "valid_from")
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    var dim = dim0
    val ms = MemoryStream[Ev]
    val q = ms.toDF().writeStream.outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          val chg = batch.select(col("user_id"), col("value"), col("ts"))
          dim = graft.operators.Ops.scd2Apply(dim, chg,
            "user_id", Seq("value")).localCheckpoint()
      }.start()
    val b1 = Seq(Ev(1L, ts(5), 10L, "chg", 1.5), Ev(2L, ts(6), 30L, "chg", 3.0))
    val b2 = Seq(Ev(3L, ts(7), 10L, "chg", 1.7), Ev(4L, ts(8), 20L, "chg", 2.5))
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val allChanges = (b1 ++ b2).toDF()
      .select(col("user_id"), col("value"), col("ts"))
    val oneShot = graft.operators.Ops.scd2Apply(dim0, allChanges,
      "user_id", Seq("value"))
    assert(dim.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(dim).count() == 0,
      "incrementally-maintained dimension diverged from the one-shot merge")
    // sanity: u10 has 3 versions, exactly one open
    assert(dim.filter(col("user_id") === 10L).count() == 3)
    assert(dim.filter(col("is_current")).count() == 3)
  }

  test("streaming incremental dedup converges to the sequential batch relation") {
    // The daily-crawl loop (q110's operator) under Structured
    // Streaming: three "days" of docs arrive as micro-batches; the
    // maintained corpus must equal running the SAME batch operator
    // day-by-day (near-dup chains are order-dependent by design —
    // first occurrence wins — so the sequential batch apply IS the
    // reference relation, like scd2Apply is for the SCD2 test).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog in the park today"
    val corpus0 = Seq((1L, base)).toDF("doc_id", "text")
    val other = "completely different content about spark structured streaming pipelines"
    val d1 = Seq(
      (10L, base + " extra"),                       // near-dup of corpus doc 1
      (11L, other),
      (12L, other + " indeed")                      // 12 in-batch dup of 11
    )
    val d2 = Seq(
      (20L, other + " truly"),                      // 20 dup of kept 11
      (21L, "another entirely unrelated document mentioning parquet files only")
    )
    val d3 = Seq((30L, base + " extra"))            // dup of corpus doc 1 again
    val ms = MemoryStream[(Long, String)]
    val (q, current) = EventStreams.incrementalDedupStream(
      ms.toDF().toDF("doc_id", "text"), corpus0, "doc_id", "text")
    try {
      Seq(d1, d2, d3).foreach { d => ms.addData(d); q.processAllAvailable() }
    } finally q.stop()
    val streamed = current().as[(Long, String)].collect().toSet
    var ref = corpus0
    Seq(d1, d2, d3).foreach { d =>
      val delta = d.toDF("doc_id", "text")
      val keep = graft.operators.Dedup.incrementalMinhash(
          ref, delta, "doc_id", "text")
        .filter($"status" === "new").select($"id".as("doc_id"))
      ref = ref.unionByName(delta.join(keep, Seq("doc_id"))).localCheckpoint()
    }
    assert(streamed == ref.as[(Long, String)].collect().toSet)
    // the loop actually dropped the cross-batch and in-batch dups
    assert(streamed.map(_._1) == Set(1L, 11L, 21L))
  }

  test("streaming incremental agg view equals the final-snapshot recompute") {
    // q171's merge under Structured Streaming: CDC batches arrive in
    // two microbatches; because count/decimal-sum contributions are
    // commutative-associative-exact, the maintained view must equal a
    // direct recompute of the final snapshot no matter the batching.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // s0 = {(a,10),(a,20),(b,7)}
    val view0 = Seq(("a", 2L, BigDecimal("30.0")), ("b", 1L, BigDecimal("7.0")))
      .toDF("g", "n", "s")
      .select($"g", $"n", $"s".cast("decimal(30,4)").as("s"))
    val b1 = Seq( // insert (c,5); reprice a 10→12
      ("insert", None, Some("c"), None, Some(5.0)),
      ("update", Some("a"), Some("a"), Some(10.0), Some(12.0)))
    val b2 = Seq( // delete (b,7); move (a,20) → c
      ("delete", Some("b"), None, Some(7.0), None),
      ("update", Some("a"), Some("c"), Some(20.0), Some(20.0)))
    val ms = MemoryStream[(String, Option[String], Option[String],
      Option[Double], Option[Double])]
    val (q, current) = EventStreams.incrementalAggStream(
      ms.toDF().toDF("change_type", "old_g", "new_g", "old_m", "new_m"),
      view0, "g", "m")
    try {
      Seq(b1, b2).foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = current()
      .select($"g", $"n", $"s".cast("double"))
      .as[(String, Long, Double)].collect().toSet
    // final snapshot: a={12}, c={5,20}; b emptied and dropped
    assert(got == Set(("a", 1L, 12.0), ("c", 2L, 25.0)))
  }

  test("streaming PSI drift monitor equals the batch statistic at every batch cut") {
    // q201's streaming twin: the maintained per-(group, bin, period)
    // cell counts are exact sums, so psiFromCells over the view after
    // ANY batching equals Drift.psi over everything seen — down to the
    // last double bit of the smoothed log terms.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = (0 until 120).map { i =>
      (s"t${i % 3}", (i * 37 % 100).toLong, (i % 5) / 3) // per 0 or 1
    }
    val ms = MemoryStream[(String, Long, Int)]
    val (q, current) = EventStreams.psiDriftStream(
      ms.toDF().toDF("g", "v", "per"), "g", floor($"v" / 20), $"per")
    try {
      Seq(all.slice(0, 35), all.slice(35, 80), all.slice(80, 120))
        .zipWithIndex.foreach { case (b, i) =>
          ms.addData(b); q.processAllAvailable()
          val seen = all.take(Seq(35, 80, 120)(i))
          val want = graft.operators.Drift.psi(
              seen.toDF("g", "v", "per"), "g", floor($"v" / 20), $"per")
            .as[(String, Long, Long, Long, Double, Boolean)]
            .collect().sortBy(_._1)
          val got = current()
            .as[(String, Long, Long, Long, Double, Boolean)]
            .collect().sortBy(_._1)
          assert(got.toSeq == want.toSeq, s"cut $i diverged")
        }
    } finally q.stop()
  }

  test("streaming KS drift monitor equals the batch statistic at every batch cut") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = (0 until 120).map { i =>
      (s"t${i % 2}", (i * 53 % 40).toLong, (i % 7) / 4)
    }
    val ms = MemoryStream[(String, Long, Int)]
    val (q, current) = EventStreams.ksDriftStream(
      ms.toDF().toDF("g", "v", "per"), "g", $"v", $"per")
    try {
      Seq(all.slice(0, 41), all.slice(41, 77), all.slice(77, 120))
        .zipWithIndex.foreach { case (b, i) =>
          ms.addData(b); q.processAllAvailable()
          val seen = all.take(Seq(41, 77, 120)(i))
          val want = graft.operators.Drift.ks(
              seen.toDF("g", "v", "per"), "g", $"v", $"per")
            .select($"g", $"n_before", $"n_after",
              $"ks_num".cast("long"), $"ks_den".cast("long"), $"ks")
            .as[(String, Long, Long, Long, Long, Double)]
            .collect().sortBy(_._1)
          val got = current()
            .select($"g", $"n_before", $"n_after",
              $"ks_num".cast("long"), $"ks_den".cast("long"), $"ks")
            .as[(String, Long, Long, Long, Long, Double)]
            .collect().sortBy(_._1)
          assert(got.toSeq == want.toSeq, s"cut $i diverged")
        }
    } finally q.stop()
  }

  test("streaming CMS merge is bit-equal to a whole-data sketch at every batch cut") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    val all = (0 until 300).map(i => vocab(i * 7 % 5))
    val ms = MemoryStream[String]
    val (q, current) = EventStreams.cmsStream(
      ms.toDF().toDF("tok"), $"tok", eps = 0.01, confidence = 0.9, seed = 7)
    try {
      Seq(all.slice(0, 100), all.slice(100, 230), all.slice(230, 300))
        .zipWithIndex.foreach { case (b, i) =>
          ms.addData(b); q.processAllAvailable()
          val seen = all.take(Seq(100, 230, 300)(i))
          val bytes = seen.toDF("tok")
            .agg(expr("count_min_sketch(tok, CAST(0.01 AS DOUBLE), " +
              "CAST(0.9 AS DOUBLE), 7)")).head().getAs[Array[Byte]](0)
          val want = org.apache.spark.util.sketch.CountMinSketch.readFrom(
            new java.io.ByteArrayInputStream(bytes))
          val got = current()
          assert(got.totalCount() == want.totalCount(), s"cut $i totalCount")
          vocab.foreach { t =>
            assert(got.estimateCount(t) == want.estimateCount(t),
              s"cut $i estimate($t)")
          }
        }
    } finally q.stop()
  }

  test("streaming HLL estimate equals a whole-data sketch at every batch cut") {
    // HLL union is the elementwise register max, so the maintained
    // sketch's registers — and therefore its estimate — equal a
    // fresh whole-data sketch's after ANY batching.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = (0 until 400).map(i => s"user-${i * 13 % 173}")
    val ms = MemoryStream[String]
    val (q, current) = EventStreams.hllStream(
      ms.toDF().toDF("uid"), $"uid", lgK = 12)
    try {
      Seq(all.slice(0, 120), all.slice(120, 290), all.slice(290, 400))
        .zipWithIndex.foreach { case (b, i) =>
          ms.addData(b); q.processAllAvailable()
          val seen = all.take(Seq(120, 290, 400)(i))
          val want = seen.toDF("uid")
            .agg(expr("hll_sketch_estimate(hll_sketch_agg(uid, 12))"))
            .head().getLong(0)
          assert(current() == want, s"cut $i estimate")
        }
    } finally q.stop()
  }

  test("streaming shard manifest is bit-equal to the batch manifest at every cut") {
    // q214's streaming twin: counts, token sums, the decimal
    // fingerprint sum, and min/max ids all merge exactly — the
    // maintained manifest equals a from-scratch recompute after any
    // batching, bit for bit.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = (1 to 90).map(i =>
      (i.toLong, (0 to i % 7).map(j => s"tok${(i * 3 + j) % 11}").mkString(" ")))
    def batchManifest(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .withColumn("shard", pmod(graft.operators.DedupPortable.md5Long(
          concat($"doc_id".cast("string"), lit("m1"))), lit(4L)).cast("int"))
        .groupBy($"shard").agg(
          count(lit(1)).as("n_rows"),
          sum(size(split($"text", " ")).cast("long")).as("ws_tokens"),
          sum(graft.operators.DedupPortable.md5Long(
              concat($"doc_id".cast("string"), lit(":"), md5($"text")))
            .cast("decimal(38,0)")).as("fingerprint"),
          min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
    val ms = MemoryStream[(Long, String)]
    val (q, current) = EventStreams.manifestStream(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      nShards = 4, seed = "m1")
    try {
      Seq(all.slice(0, 30), all.slice(30, 71), all.slice(71, 90))
        .zipWithIndex.foreach { case (b, i) =>
          ms.addData(b); q.processAllAvailable()
          val seen = all.take(Seq(30, 71, 90)(i))
          val want = batchManifest(seen).orderBy($"shard").collect().toSeq
          val got = current().orderBy($"shard").collect().toSeq
          assert(got == want, s"cut $i diverged")
        }
    } finally q.stop()
  }

  test("streaming novelty equals the batch operator against prior ingest at every cut") {
    // q256's daily-crawl loop: batch k's per-doc novelty must equal
    // Curation.ngramNovelty(batch_k, corpus0 ∪ batches_<k) exactly —
    // the standing shingle set neither leaks in-batch shingles nor
    // loses earlier ones.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def doc(i: Long, stride: Int) =
      (i, (0 to 8).map(j => s"tok${(i * 3 + stride * j) % 17}").mkString(" "))
    val corpus0 = (1L to 10L).map(doc(_, 1)).toDF("doc_id", "text")
    val b1 = (11L to 14L).map(doc(_, 1)) ++ // stride-1 runs: all seen
      (15L to 18L).map(doc(_, 2))           // stride-2 runs: novel
    val b2 = (19L to 21L).map(doc(_, 2)) ++ // now seen (b1 added them)
      (22L to 25L).map(doc(_, 5))           // novel again
    val ms = MemoryStream[(Long, String)]
    val (q, current) = EventStreams.noveltyStream(
      ms.toDF().toDF("doc_id", "text"), corpus0, "doc_id", "text", k = 5)
    try {
      var prior = corpus0
      var expect = Seq.empty[org.apache.spark.sql.Row]
      for (b <- Seq(b1, b2)) {
        val bdf = b.toDF("doc_id", "text")
        expect = expect ++ graft.operators.Curation
          .ngramNovelty(bdf, prior, "doc_id", "text", k = 5)
          .orderBy($"doc_id").collect().toSeq
        ms.addData(b)
        q.processAllAvailable()
        val got = current().orderBy($"doc_id").collect().toSeq
        assert(got == expect, s"cut after batch ${b.head._1} diverged")
        prior = prior.unionByName(bdf)
      }
      // novelty genuinely drops once vocabulary is seen
      val m = current().collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty"))
        .toMap
      assert(m.values.exists(_ > 0.0) && m.values.exists(_ < 1.0))
    } finally q.stop()
  }

  test("novelty standing-set state writes are O(batch novelty), not O(total)") {
    // VERDICT r17 #3: the standing shingle set must be maintained as
    // appended DISJOINT deltas — per-batch checkpointed state rows =
    // the batch's never-seen shingles only. Re-feeding already-seen
    // text must checkpoint ZERO state rows even as cumulative ingest
    // keeps growing; a rewrite-the-whole-set regression would show
    // monotonically growing probe values instead.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def doc(i: Long, stride: Int) =
      (i, (0 to 8).map(j => s"tok${(i * 3 + stride * j) % 17}").mkString(" "))
    val corpus0 = (1L to 6L).map(doc(_, 1)).toDF("doc_id", "text")
    val fresh = (10L to 15L).map(doc(_, 3)) // stride-3: new vocabulary
    val rerunA = (20L to 25L).map { case i => (i, fresh(0)._2) }
    val rerunB = (30L to 35L).map { case i => (i, fresh(1)._2) }
    val probe = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ms = MemoryStream[(Long, String)]
    val (q, current) = EventStreams.noveltyStream(
      ms.toDF().toDF("doc_id", "text"), corpus0, "doc_id", "text",
      k = 5, stateProbe = Some(probe))
    try {
      for (b <- Seq(fresh, rerunA, rerunB)) {
        ms.addData(b); q.processAllAvailable()
      }
      assert(probe.size == 3, probe.toString)
      assert(probe(0) > 0, s"fresh batch must checkpoint its novel delta: $probe")
      assert(probe(1) == 0 && probe(2) == 0,
        s"re-fed batches must checkpoint ZERO state rows: $probe")
      // and the report is still right: every rerun doc scores 0.0
      val reruns = current().filter($"doc_id" >= 20L).collect()
      assert(reruns.length == 12)
      assert(reruns.forall(_.getAs[Double]("novelty") == 0.0))
    } finally q.stop()
  }

  test("streaming capture index equals the batch cdx over everything ingested, at every cut") {
    // q269's streaming twin: containers land as segments; the index
    // must be the batch cdxIndex of everything so far at each cut,
    // with non-response records excluded and per-batch deltas only
    // (the accumulation discipline is noveltyStream's report list).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def rec(no: Long, typ: String, u: String, ts: String, body: String) =
      ("f.warc.gz", no, typ, u, ts,
        if (typ == "response") Some(200) else None,
        if (typ == "response") "text/plain" else null,
        body.getBytes("UTF-8"), Option.empty[String])
    val b1 = Seq(rec(1, "warcinfo", null, null, "m"),
      rec(2, "response", "https://b.example/x", "2026-01-02T03:04:05Z", "one"))
    val b2 = Seq(
      rec(3, "response", "https://a.example/y", "2026-01-02T03:04:06Z", "two"),
      rec(4, "request", "https://a.example/y", "2026-01-02T03:04:06Z", "GET"))
    val ms = MemoryStream[(String, Long, String, String, String,
      Option[Int], String, Array[Byte], Option[String])]
    val (q, current) = EventStreams.cdxStream(ms.toDF().toDF("path",
      "rec_no", "warc_type", "url", "ts", "status", "mime", "payload",
      "http_head"))
    try {
      var all = Seq.empty[(String, Long, String, String, String,
        Option[Int], String, Array[Byte], Option[String])]
      for (b <- Seq(b1, b2)) {
        all = all ++ b
        ms.addData(b); q.processAllAvailable()
        val want = graft.formats.Warc.cdxIndex(all.toDF("path", "rec_no",
            "warc_type", "url", "ts", "status", "mime", "payload",
            "http_head"))
          .orderBy($"urlkey", $"ts14").collect().toSeq
        val got = current().orderBy($"urlkey", $"ts14").collect().toSeq
        assert(got == want, s"cut ${all.size} diverged")
      }
      assert(current().count() == 2) // responses only
    } finally q.stop()
  }

  test("streaming capture index carries replay locators when the scan provides them") {
    // a locator-bearing batch schema (warcread:locators) flows its
    // (offset, length) columns through cdxIndex's auto-detect and the
    // delta accumulation untouched — the live-maintained index is as
    // range-request-consumable as the batch one
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def rec(no: Long, u: String, off: Long, len: Long) =
      ("f.warc.gz", no, "response", u, "2026-01-01T00:00:00Z", Some(200),
        "text/plain", s"b$no".getBytes("UTF-8"), Option.empty[String],
        Some(off), Some(len))
    val ms = MemoryStream[(String, Long, String, String, String,
      Option[Int], String, Array[Byte], Option[String], Option[Long],
      Option[Long])]
    val (q, current) = EventStreams.cdxStream(ms.toDF().toDF("path",
      "rec_no", "warc_type", "url", "ts", "status", "mime", "payload",
      "http_head", "member_offset", "member_length"))
    try {
      ms.addData(Seq(rec(1, "https://a.example/1", 0L, 100L)))
      q.processAllAvailable()
      ms.addData(Seq(rec(2, "https://a.example/2", 100L, 80L)))
      q.processAllAvailable()
      val got = current().orderBy($"urlkey")
        .select($"urlkey", $"offset", $"length").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq(("example,a)/1", 0L, 100L),
        ("example,a)/2", 100L, 80L)), got.toString)
    } finally q.stop()
  }

  test("streaming recrawl priority: changeRate over the cdx snapshot equals batch at every cut") {
    // the r19 composition maintained incrementally: segments land,
    // the index accumulates as appended deltas (cdxStream), and the
    // change-rate estimate READ OFF THE SNAPSHOT must equal the batch
    // estimator over everything ingested — a URL's rate rises as a
    // changed capture arrives and falls back toward its long-run
    // value as unchanged ones do.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def rec(no: Long, u: String, ts: String, body: String) =
      ("f.warc.gz", no, "response", u, ts, Some(200), "text/plain",
        body.getBytes("UTF-8"), Option.empty[String])
    val hot = "https://hot.example/p"
    val cold = "https://cold.example/p"
    val b1 = Seq(rec(1, hot, "2026-01-01T00:00:00Z", "v1"),
      rec(2, cold, "2026-01-01T00:00:00Z", "same"))
    val b2 = Seq(rec(3, hot, "2026-02-01T00:00:00Z", "v2"),
      rec(4, cold, "2026-02-01T00:00:00Z", "same"))
    val b3 = Seq(rec(5, hot, "2026-03-01T00:00:00Z", "v3"),
      rec(6, cold, "2026-03-01T00:00:00Z", "same"))
    val ms = MemoryStream[(String, Long, String, String, String,
      Option[Int], String, Array[Byte], Option[String])]
    val (q, current) = EventStreams.cdxStream(ms.toDF().toDF("path",
      "rec_no", "warc_type", "url", "ts", "status", "mime", "payload",
      "http_head"))
    try {
      var all = Seq.empty[(String, Long, String, String, String,
        Option[Int], String, Array[Byte], Option[String])]
      for (b <- Seq(b1, b2, b3)) {
        all = all ++ b
        ms.addData(b); q.processAllAvailable()
        val want = graft.operators.Curation.changeRate(
            graft.formats.Warc.cdxIndex(all.toDF("path", "rec_no",
              "warc_type", "url", "ts", "status", "mime", "payload",
              "http_head")))
          .orderBy($"urlkey").collect().toSeq
        val got = graft.operators.Curation.changeRate(current())
          .orderBy($"urlkey").collect().toSeq
        assert(got == want, s"cut ${all.size} diverged")
      }
      val rates = graft.operators.Curation.changeRate(current())
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
      assert(rates == Map("example,hot)/p" -> 1000000L,
        "example,cold)/p" -> 0L), rates.toString)
    } finally q.stop()
  }

  test("streaming revisit detection: verdicts against the cdx snapshot equal batch at every cut") {
    // the archive write path live: as the standing index accumulates
    // (cdxStream deltas), a fixed fresh-crawl batch classifies
    // against the SNAPSHOT — verdicts must equal the batch
    // revisitDetect over everything indexed so far, and a URL flips
    // new → unchanged once its first capture lands in the index.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def rec(no: Long, u: String, ts: String, body: String) =
      ("f.warc.gz", no, "response", u, ts, Some(200), "text/plain",
        body.getBytes("UTF-8"), Option.empty[String])
    val b1 = Seq(rec(1, "https://a.example/p", "2026-01-01T00:00:00Z", "v1"))
    val b2 = Seq(rec(2, "https://b.example/p", "2026-01-15T00:00:00Z", "same"))
    val freshRows = Seq(
      rec(3, "https://a.example/p", "2026-02-01T00:00:00Z", "v2"),   // changed
      rec(4, "https://b.example/p", "2026-02-01T00:00:00Z", "same"), // unchanged once indexed
      rec(5, "https://c.example/p", "2026-02-01T00:00:00Z", "first")) // never indexed
    def cdxOf(rows: Seq[(String, Long, String, String, String,
        Option[Int], String, Array[Byte], Option[String])]) =
      graft.formats.Warc.cdxIndex(rows.toDF("path", "rec_no", "warc_type",
        "url", "ts", "status", "mime", "payload", "http_head"))
    val fresh = cdxOf(freshRows)
    val ms = MemoryStream[(String, Long, String, String, String,
      Option[Int], String, Array[Byte], Option[String])]
    val (q, current) = EventStreams.cdxStream(ms.toDF().toDF("path",
      "rec_no", "warc_type", "url", "ts", "status", "mime", "payload",
      "http_head"))
    try {
      var all = Seq.empty[(String, Long, String, String, String,
        Option[Int], String, Array[Byte], Option[String])]
      for (b <- Seq(b1, b2)) {
        all = all ++ b
        ms.addData(b); q.processAllAvailable()
        val want = graft.operators.Curation.revisitDetect(fresh, cdxOf(all))
          .orderBy($"urlkey").collect().toSeq
        val got = graft.operators.Curation.revisitDetect(fresh, current())
          .orderBy($"urlkey").collect().toSeq
        assert(got == want, s"cut ${all.size} diverged")
      }
      val verdicts = graft.operators.Curation.revisitDetect(fresh, current())
        .collect().map(r => r.getString(0) -> r.getString(3)).toMap
      assert(verdicts == Map("example,a)/p" -> "changed",
        "example,b)/p" -> "unchanged", "example,c)/p" -> "new"),
        verdicts.toString)
    } finally q.stop()
  }

  test("streaming crawl-delay view is bit-equal to batch at every cut, re-fetches take the min") {
    // q264's streaming twin: robots bodies arrive as re-fetched; the
    // per-host MIN merge must equal the batch operator over every
    // body ingested so far at each cut — including a host whose
    // re-fetched body declares a LOWER delay (the update case) and an
    // identical body re-arriving (idempotence).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def body(delay: String) =
      s"User-agent: graftbot\nCrawl-delay: $delay\nDisallow: /x\n"
    val b1 = Seq(("a.example", body("5")), ("b.example", body("2")))
    val b2 = Seq(("a.example", body("3")), // re-fetch, lower -> 3.0
      ("b.example", body("2")),            // identical body -> no change
      ("c.example", body("fast")))         // unparsable -> no row
    val b3 = b1                            // full re-feed: nothing improves
    val probe = scala.collection.mutable.Buffer.empty[Long]
    val ms = MemoryStream[(String, String)]
    val (q, current) = EventStreams.crawlDelayStream(
      ms.toDF().toDF("host", "body"), "host", "body", "graftbot",
      stateProbe = Some(probe))
    try {
      var all = Seq.empty[(String, String)]
      for (b <- Seq(b1, b2, b3)) {
        all = all ++ b
        ms.addData(b); q.processAllAvailable()
        val want = graft.operators.Curation.robotsCrawlDelays(
            all.toDF("host", "body"), "host", "body", "graftbot")
          .orderBy($"host").collect().toSeq
        val got = current().orderBy($"host").collect().toSeq
        assert(got == want, s"cut after batch ${b.head} diverged")
      }
      val m = current().collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(m == Map("a.example" -> 3.0, "b.example" -> 2.0), m.toString)
      // VERDICT r18 #1: per-batch checkpointed STATE rows are bounded
      // by the batch's TOUCHED hosts, never the standing host count —
      // batch 1 seeds 2 hosts, batch 2 improves only a (b ties, c is
      // unparsable), batch 3 re-feeds batch 1 verbatim and appends
      // NOTHING.
      assert(probe.toSeq == Seq(2L, 1L, 0L), probe.toString)
    } finally q.stop()
  }

  test("streaming crawl-extraction report is bit-equal to batch at every cut") {
    // q249/q250's streaming twin (the additive half): the HtmlKernel
    // pass is a stateless narrow map, and the per-source counters are
    // counts + Long sums — commutative-associative-exact, so the
    // maintained view equals a from-scratch recompute at any cut.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def page(body: String) =
      s"<title>t</title><nav><a href='/'>Home</a> <a href='/x'>More</a>" +
        s"</nav><p>$body</p><footer><a href='/p'>privacy</a></footer>"
    val all = (1 to 60).map { i =>
      val body =
        if (i % 5 == 0) "tiny" // under the length gate
        else (0 to 8).map(j => s"word${(i * 7 + j) % 13}").mkString(" ")
      (s"s${i % 4}", if (i % 11 == 0) "<div></div>" else page(body))
    }
    def batchReport(rows: Seq[(String, String)]) = {
      val fields = graft.functions.TextFunctions.htmlExtract($"html")
      rows.toDF("source", "html")
        .select($"source" +: fields.map { case (n, c) => c.as(n) }: _*)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          count(when($"main_text" =!= "", 1)).as("n_extracted"),
          sum($"kept_blocks").as("kept_blocks"),
          sum($"kept_chars").as("kept_chars"),
          sum($"link_chars").as("link_chars"))
    }
    val ms = MemoryStream[(String, String)]
    val (q, current) = EventStreams.crawlStatsStream(
      ms.toDF().toDF("source", "html"), "html", "source")
    try {
      Seq(all.slice(0, 20), all.slice(20, 47), all.slice(47, 60))
        .zipWithIndex.foreach { case (b, i) =>
          ms.addData(b); q.processAllAvailable()
          val seen = all.take(Seq(20, 47, 60)(i))
          val want = batchReport(seen).orderBy($"source").collect().toSeq
          val got = current().orderBy($"source").collect().toSeq
          assert(got == want, s"cut $i diverged")
        }
      // the gates are non-degenerate in this fixture
      val fin = current().collect()
      assert(fin.map(_.getAs[Long]("n_docs")).sum == 60)
      assert(fin.map(_.getAs[Long]("n_extracted")).sum < 60)
    } finally q.stop()
  }

  test("streaming bootstrap test is bit-equal to the batch recompute at every cut") {
    // q233's streaming twin: per-resample Poisson-weighted sums are
    // exact integer merges whose terms depend only on (id, resample,
    // salt), so the maintained view equals a batch bootstrapDiff over
    // everything ingested — including the reported counts and
    // frac_pos — at any batching.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = (0 until 90).map(i =>
      (i.toLong, ((i * 13) % 5 - 2).toLong)) // diffs in [-2, 2]
    val ms = MemoryStream[(Long, Long)]
    val (q, current) = EventStreams.bootstrapStream(
      ms.toDF().toDF("id", "d"), "id", "d", resamples = 60, salt = "bt")
    try {
      Seq(all.slice(0, 25), all.slice(25, 62), all.slice(62, 90))
        .zipWithIndex.foreach { case (b, i) =>
          ms.addData(b); q.processAllAvailable()
          val seen = all.take(Seq(25, 62, 90)(i))
          val want = graft.operators.Drift.bootstrapDiff(
              seen.toDF("id", "d"), "id", $"d", resamples = 60,
              salt = "bt").collect().toSeq
          val got = current().collect().toSeq
          assert(got == want, s"cut $i diverged: $got vs $want")
        }
    } finally q.stop()
  }

  test("streaming PCA is bit-equal to the batch component at every cut") {
    // q242's twin: additive decimal moments -> the shared
    // power-iteration finish must reproduce the batch component
    // bit-for-bit at any batching.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = (0 until 60).map { i =>
      (i.toLong, Array(
        (i % 13).toFloat - 6f, (i % 7).toFloat * 0.5f - 1.5f,
        (i % 3).toFloat, ((i * 31) % 11).toFloat * 0.1f))
    }
    val ms = MemoryStream[(Long, Array[Float])]
    val (q, current) = EventStreams.pcaStream(
      ms.toDF().toDF("vec_id", "embedding"), "embedding", iters = 6)
    try {
      Seq(all.slice(0, 15), all.slice(15, 41), all.slice(41, 60))
        .zipWithIndex.foreach { case (b, i) =>
          ms.addData(b); q.processAllAvailable()
          val seen = all.take(Seq(15, 41, 60)(i))
          val want = graft.operators.Similarity.pcaTopComponent(
              seen.toDF("vec_id", "embedding"), "embedding", iters = 6)
            .orderBy("dim").collect().toSeq
          val got = current().orderBy("dim").collect().toSeq
          assert(got == want, s"cut $i diverged: $got vs $want")
        }
    } finally q.stop()
  }

  test("streaming exact OLS is bit-equal to the batch refit at every batch cut") {
    // q178's streaming twin: the maintained sufficient statistics are
    // exact decimal sums, so the model after ANY batching equals a
    // batch refit over everything seen — down to the last double bit.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = (0 until 90).map(i =>
      (s"g${i % 2}", (i % 17).toLong, (i * 31 % 101).toLong))
    val ms = MemoryStream[(String, Long, Long)]
    val (q, current) = EventStreams.linfitStream(
      ms.toDF().toDF("g", "x", "y"), "g", "x", "y")
    try {
      Seq(all.slice(0, 20), all.slice(20, 57), all.slice(57, 90))
        .zipWithIndex.foreach { case (b, i) =>
          ms.addData(b); q.processAllAvailable()
          val seen = all.take(Seq(20, 57, 90)(i))
          val want = graft.operators.Ops.groupedLinearFit(
              seen.toDF("g", "x", "y"), Seq("g"), $"x", $"y")
            .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
          val got = current()
            .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
          assert(got.toSeq == want.toSeq, s"cut $i diverged")
        }
    } finally q.stop()
  }

  test("foreachBatch idempotent sink: replayed batch ids are no-ops") {
    val out = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fb_ck").toString
    val q = EventStreams.idempotentParquetSink(
      EventStreams.readEventStream(spark, sf).select("event_id"), out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val n = spark.read.parquet(s"$out/batch_0").count()
    assert(n == Tables(spark, sf, "events").count())
    // a failure-replay of batch 0 (different content stands in for a
    // partial rewrite) must be a no-op: _SUCCESS already present
    EventStreams.writeBatchIdempotent(
      Tables(spark, sf, "events").select("event_id").limit(5), 0, out)
    assert(spark.read.parquet(s"$out/batch_0").count() == n)
    // an unseen batch id writes normally
    EventStreams.writeBatchIdempotent(
      Tables(spark, sf, "events").select("event_id").limit(5), 99, out)
    assert(spark.read.parquet(s"$out/batch_99").count() == 5)
  }

  test("streaming dedup drops in-watermark duplicate event_ids") {
    import spark.implicits._
    val stream = EventStreams.readEventStream(spark, sf)
    // Duplicate the stream by unioning it with itself: every event_id
    // arrives twice within the watermark.
    val doubled = stream.union(stream)
    val q = EventStreams.streamingDedup(doubled)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup")
      .start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("stream_dedup").count()
    val distinctIds = spark.table("stream_dedup")
      .select("event_id").distinct().count()
    assert(n == distinctIds, s"rows=$n distinct=$distinctIds")
    val batchTotal = Tables(spark, sf, "events").count()
    assert(n == batchTotal)
  }

  test("streaming near-dedup drops in-watermark same-fingerprint docs") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdocs").toString
    Seq(
      (1L, 1000000L, "the same boilerplate text"),
      (2L, 2000000L, "the same boilerplate text"), // dup fingerprint
      (3L, 3000000L, "a completely different document"),
      (4L, 4000000L, null.asInstanceOf[String]),   // null text…
      (5L, 5000000L, null.asInstanceOf[String]))   // …must BOTH survive
      .toDF("doc_id", "tsu", "text")
      .withColumn("ts", timestamp_micros($"tsu")).drop("tsu")
      .write.mode("overwrite").parquet(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStreams.streamingNearDedup(stream, "text", "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_neardedup")
      .start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("stream_neardedup")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.size == 4, s"kept=$kept")
    assert(kept.contains(3L))
    assert(kept.intersect(Set(1L, 2L)).size == 1)
    // null fingerprints are NOT a dedup key (ADVICE r3): distinct
    // null-text docs all pass through
    assert(kept.contains(4L) && kept.contains(5L))
  }

  test("gaps-and-islands sessions (q141) match session_window sessions") {
    // Three formulations of the same 30-minute-gap relation: the
    // islands window query, the session_window aggregate, and (via the
    // existing test below) the stateful streaming sessionizer. Islands
    // break strictly AFTER prev+gap and session_window's half-open
    // window would break AT prev+gap — the fixtures' ns-precision
    // timestamps never land on the exact boundary, so the relations
    // coincide and this pin holds on the fixed seed.
    import org.apache.spark.sql.functions._
    val islands = SparkEntry.queries("q141_session_islands")(spark, sf)
      .select(col("user_id"), col("session_start"), col("n_events"))
    val windows = EventStreams.userSessions(Tables(spark, sf, "events"))
      .select(col("user_id"), col("session_start"), col("n_events"))
    assert(islands.count() == windows.count())
    assert(islands.join(windows,
      Seq("user_id", "session_start", "n_events"), "left_anti").count() == 0)
  }

  test("flatMapGroupsWithState sessionization matches batch session windows") {
    import org.apache.spark.sql.functions._
    val stream = EventStreams.readEventStream(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.statefulSessions(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("stateful_sessions")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stateful_sessions")
      .select(col("user_id"), col("session_start"), col("n_events"))

    val batch = EventStreams.userSessions(Tables(spark, sf, "events"))
      .select(col("user_id"), col("session_start"), col("n_events"))

    // Append mode only emits CLOSED sessions (watermark-passed); each
    // emitted session must exactly match a batch session window.
    val emitted = got.count()
    assert(emitted > 0)
    val mismatched = got.join(batch,
      Seq("user_id", "session_start", "n_events"), "left_anti").count()
    assert(mismatched == 0, s"$mismatched stateful sessions disagree with batch")
    assert(emitted >= batch.count() - 20) // tail sessions may stay open
  }

  test("transformWithState sessionization matches batch session windows") {
    import org.apache.spark.sql.functions._
    // Spark 4's arbitrary-state successor API requires the RocksDB
    // state store provider; set it for this query only and restore.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = EventStreams.readEventStream(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val q = EventStreams.statefulSessionsTws(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_sessions")
        .start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("tws_sessions")
        .select(col("user_id"), col("session_start"), col("n_events"))
      val batch = EventStreams.userSessions(Tables(spark, sf, "events"))
        .select(col("user_id"), col("session_start"), col("n_events"))
      val emitted = got.count()
      assert(emitted > 0)
      val mismatched = got.join(batch,
        Seq("user_id", "session_start", "n_events"), "left_anti").count()
      assert(mismatched == 0, s"$mismatched tws sessions disagree with batch")
      assert(emitted >= batch.count() - 20) // tail sessions may stay open
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-static enrichment joins every event to its dimension row") {
    import spark.implicits._
    val dim = (0L until 500L).map(u => (u, s"user_$u", u % 7)).toSeq
      .toDF("user_id", "user_name", "cohort")
    val stream = EventStreams.readEventStream(spark, sf)
    val q = EventStreams.streamStaticEnrich(stream, dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_enriched")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_enriched")
    val events = Tables(spark, sf, "events")
    assert(got.count() == events.count()) // left join preserves the stream
    // every user present in the dim must be enriched
    val missing = got.filter($"user_id" < 500 && $"user_name".isNull).count()
    assert(missing == 0, s"$missing events lost their dimension row")
    val batchTwin = EventStreams.streamStaticEnrich(events, dim, "user_id")
    assert(batchTwin.count() == got.count())
  }
}
