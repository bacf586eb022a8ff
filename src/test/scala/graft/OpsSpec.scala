package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ops

class OpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("dedupLastWins keeps exactly the latest row per key") {
    val df = Seq(
      ("a", 1L, "old"), ("a", 3L, "new"), ("a", 2L, "mid"),
      ("b", 5L, "only")).toDF("k", "v", "tag")
    val out = Ops.dedupLastWins(df, Seq("k"), Seq($"v")).orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("a", "new"), ("b", "only")))
  }

  test("dedupLastWins tie-break is deterministic") {
    val df = Seq(("a", 1L, 10L), ("a", 1L, 20L)).toDF("k", "ts", "id")
    val out = Ops.dedupLastWins(df, Seq("k"), Seq($"ts", $"id")).collect()
    assert(out.head.getLong(2) == 20L)
  }

  test("concat merges mismatched schemas with nulls") {
    val a = Seq((1, "x")).toDF("id", "s")
    val b = Seq((2, 9.5)).toDF("id", "d")
    val out = Ops.concat(Seq(a, b)).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Any]("d") == null && out(1).getAs[Any]("s") == null)
  }

  test("asofJoin picks most recent right row at-or-before left ts") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L))
      .toDF("id", "u", "t")
      .withColumn("t", timestamp_micros($"t"))
    val right = Seq(("u1", 100L, "exact"), ("u1", 200L, "later"),
      ("u1", 40L, "early"), ("u2", 60L, "future"))
      .toDF("u", "t", "tag")
      .withColumn("t", timestamp_micros($"t"))
    val out = Ops.asofJoin(left, right, Seq("u"), "t", "t")
      .orderBy("id").collect()
    // id=1: right@100 == left ts → inclusive match "exact"
    // id=2: latest <= 250 is 200 "later"
    // id=3: nothing at-or-before 50 → null
    assert(out.map(_.getAs[String]("r_tag")).toSeq ==
      Seq("exact", "later", null))
  }

  test("asofJoinBucketed matches asofJoin on a hot-key (50%) fixture") {
    // one key owns half of all rows — the distribution that serializes
    // the plain window as-of into a single task. Unique ts per key keeps
    // every match unambiguous so the two implementations must agree
    // row-for-row.
    val hotL = (0 until 500).map(i => (i.toLong, "hot", i * 13L + 7))
    val coldL = for (k <- 0 until 10; i <- 0 until 50)
      yield (10000L + k * 100 + i, s"k$k", i * 17L + 3)
    val left = (hotL ++ coldL).toDF("id", "u", "t")
      .withColumn("t", timestamp_micros($"t"))
    val hotR = (0 until 200).map(i => ("hot", i * 29L + 1, s"h$i"))
    val coldR = for (k <- 0 until 10; i <- 0 until 20)
      yield (s"k$k", i * 31L + 2, s"c${k}_$i")
    val right = (hotR ++ coldR).toDF("u", "t", "tag")
      .withColumn("t", timestamp_micros($"t"))

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"r_tag").collect()
        .map(r => (r.getLong(0), r.getAs[String]("r_tag"))).sortBy(_._1).toSeq

    // bucket of 1000µs splits the hot key's ~6500µs span across buckets
    val plain = norm(Ops.asofJoin(left, right, Seq("u"), "t", "t"))
    val bucketed = norm(Ops.asofJoinBucketed(left, right, Seq("u"), "t", "t",
      bucketMicros = 1000L))
    assert(plain == bucketed)
    assert(plain.length == 1000)
    assert(plain.count(_._2 != null) > 900, "fixture should mostly match")

    // tolerance variant must agree too (bounded staleness drops matches)
    val plainTol = norm(Ops.asofJoin(left, right, Seq("u"), "t", "t",
      toleranceMicros = Some(40L)))
    val bucketedTol = norm(Ops.asofJoinBucketed(left, right, Seq("u"), "t", "t",
      bucketMicros = 1000L, toleranceMicros = Some(40L)))
    assert(plainTol == bucketedTol)
    assert(plainTol.count(_._2 != null) < plain.count(_._2 != null),
      "tolerance should drop stale matches")
  }

  test("asofJoin left rows are all preserved (left-join semantics)") {
    val left = Tables(spark, sf, "events").filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val right = Tables(spark, sf, "events").filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val out = Ops.asofJoin(left, right, Seq("user_id"), "ts", "ts")
    assert(out.count() == left.count())
  }

  test("approx_count_distinct within 5% of exact") {
    val li = Tables(spark, sf, "lineitem")
    val exact = li.select(countDistinct($"l_partkey")).head().getLong(0)
    val approx = li.select(approx_count_distinct($"l_partkey")).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("keyedParquet persists last-write-wins keyed table") {
    import graft.sinks.Sinks
    val out = java.nio.file.Files.createTempDirectory("graft_ndb").toString + "/kv"
    val df = Seq((1, "a"), (2, "b"), (1, "c")).toDF("k", "v")
    Sinks.keyedParquet(df, out, "k")
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    assert(back.select("k").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("saltedJoin equals plain join on a skewed key") {
    val left = Tables(spark, sf, "lineitem")
      .select($"l_orderkey".as("k"), $"l_quantity")
    val right = Tables(spark, sf, "orders")
      .select($"o_orderkey".as("k"), $"o_totalprice")
    val plain = left.join(right, Seq("k")).count()
    val salted = Ops.saltedJoin(left, right, "k", salt = 8).count()
    assert(salted == plain, s"salted=$salted plain=$plain")
  }

  test("rangeJoin equals the naive inequality join; left keeps unmatched") {
    val ev = Tables(spark, sf, "events")
    val pts = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val iv = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("s"),
        ($"ts" + org.apache.spark.sql.functions.expr("INTERVAL 2 HOURS")).as("e"),
        $"event_id".as("iv_id"))
    val naive = pts.join(iv, Seq("user_id"))
      .filter($"ts" >= $"s" && $"ts" <= $"e")
      .select($"event_id", $"iv_id").as[(Long, Long)].collect().toSet
    val bucketed = Ops.rangeJoin(pts, iv, Seq("user_id"), "ts", "s", "e",
        bucketMicros = 3600L * 1000000)
      .select($"event_id", $"iv_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive, s"${(bucketed -- naive).size} extra, ${(naive -- bucketed).size} missing")
    val left = Ops.rangeJoin(pts, iv, Seq("user_id"), "ts", "s", "e",
        bucketMicros = 3600L * 1000000, how = "left")
    assert(left.select($"event_id").distinct().count() == pts.count())
  }

  test("stratifiedSample: proportions, determinism, partition-stability") {
    val docs = Tables(spark, sf, "documents")
    val fr = Map("en" -> 0.5, "es" -> 1.0, "fr" -> 0.0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Ops.stratifiedSample(df, "lang", "doc_id", fr)
        .select($"doc_id").as[Long].collect().toSet
    val s1 = ids(docs)
    // deterministic: same input → same sample; partitioning-independent
    assert(ids(docs) == s1)
    assert(ids(docs.repartition(7)) == s1)
    // fraction 1.0 keeps everything, 0.0 keeps nothing
    val byLang = Ops.stratifiedSample(docs, "lang", "doc_id", fr)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(byLang.getOrElse("es", 0L) == totals("es"))
    assert(byLang.getOrElse("fr", 0L) == 0L)
    assert(!byLang.contains("de") && !byLang.contains("zh")) // default 0
    // en ≈ half (hash-uniform; generous tolerance at 100-doc strata)
    val enFrac = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(enFrac > 0.3 && enFrac < 0.7, s"en fraction $enFrac")
    // no shuffle: sampling must stay a narrow filter
    val plan = Ops.stratifiedSample(docs, "lang", "doc_id", fr)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)

    // the md5-threshold (oracle-portable) twin: same contracts
    def md5Ids(df: org.apache.spark.sql.DataFrame) =
      Ops.stratifiedSampleMd5(df, "lang", "doc_id", fr)
        .select($"doc_id").as[Long].collect().toSet
    val m1 = md5Ids(docs)
    assert(md5Ids(docs.repartition(7)) == m1)
    val mByLang = Ops.stratifiedSampleMd5(docs, "lang", "doc_id", fr)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(mByLang.getOrElse("es", 0L) == totals("es"), "f=1.0 keeps all")
    assert(mByLang.getOrElse("fr", 0L) == 0L)
    val mEnFrac = mByLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(mEnFrac > 0.3 && mEnFrac < 0.7, s"en fraction $mEnFrac")
    val mPlan = Ops.stratifiedSampleMd5(docs, "lang", "doc_id", fr)
      .queryExecution.executedPlan.toString()
    assert(!mPlan.contains("Exchange"), mPlan)
  }

  test("groupSampleMd5: exact k per stratum, deterministic, a true subset") {
    val docs = Tables(spark, sf, "documents")
    def sample() = Ops.groupSampleMd5(docs, "lang", "doc_id", 10)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    val s1 = sample()
    assert(sample() == s1, "not deterministic")
    // exactly min(k, stratum size) per language
    val totals = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val counts = s1.groupBy(_._2).view.mapValues(_.size).toMap
    totals.foreach { case (lang, n) =>
      assert(counts.getOrElse(lang, 0) == math.min(10L, n), s"$lang: $counts")
    }
    // subset of the source, and partitioning-independent
    val all = docs.select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    assert(s1.subsetOf(all))
    val s2 = Ops.groupSampleMd5(docs.repartition(7), "lang", "doc_id", 10)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSet
    assert(s2 == s1)
  }

  test("bloomPreFilter: no false negatives — join result identical to plain join") {
    val fact = Tables(spark, TestSpark.sf, "lineitem")
      .select($"l_partkey", $"l_quantity")
    val dim = Tables(spark, TestSpark.sf, "part")
      .filter($"p_size" === 1).select($"p_partkey")
    val plain = fact.join(dim, $"l_partkey" === $"p_partkey")
      .orderBy($"l_partkey", $"l_quantity").collect()
    val bloomed = Ops.bloomPreFilter(fact, "l_partkey", dim, "p_partkey",
        expectedItems = 1024L, numBits = 16384L)
      .join(dim, $"l_partkey" === $"p_partkey")
      .orderBy($"l_partkey", $"l_quantity").collect()
    assert(plain.toSeq == bloomed.toSeq)
    assert(plain.nonEmpty) // non-vacuous
    // and it actually REDUCES: the pre-filtered fact is much smaller
    val reduced = Ops.bloomPreFilter(fact, "l_partkey", dim, "p_partkey",
      1024L, 16384L).count()
    assert(reduced < fact.count() / 2, s"bloom removed too little: $reduced")
  }

  test("bloomAntiJoin: bit-equal to plain left_anti, incl. null keys") {
    // VERDICT r18 next #7 — the frontier seen-set filter: the bloom
    // bypass must be INVISIBLE (no false negatives ⇒ no seen row
    // leaks through the sure-new arm; the exact anti join removes the
    // false positives). Null fact keys match nothing in an anti join,
    // so they must survive.
    val fact = Tables(spark, TestSpark.sf, "lineitem")
      .select(when($"l_partkey" % 97 === 0, lit(null).cast("long"))
        .otherwise($"l_partkey").as("k"), $"l_quantity")
    val dim = Tables(spark, TestSpark.sf, "part")
      .filter($"p_size" <= 3).select($"p_partkey".as("sk"))
    val plain = fact.join(dim, fact("k") === dim("sk"), "left_anti")
      .orderBy($"k", $"l_quantity").collect()
    val bloomed = Ops.bloomAntiJoin(fact, "k", dim, "sk",
        expectedItems = 1024L, numBits = 16384L)
      .orderBy($"k", $"l_quantity").collect()
    assert(plain.toSeq == bloomed.toSeq)
    assert(plain.nonEmpty && plain.length < fact.count()) // non-vacuous
    assert(plain.exists(_.isNullAt(0)), "null-key rows lost")
  }

  test("binPack: greedy invariants, oversize isolation, partitioning invariance") {
    val docs = Tables(spark, TestSpark.sf, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long")
        .as("n_tokens"))
    val budget = 90L
    val packed = Ops.binPack(docs, "doc_id", "n_tokens", budget, 8)
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == docs.count())
    val byBin = rows.groupBy(r => (r._3, r._4))
    // every multi-doc bin respects the budget; an over-budget bin
    // holds exactly ONE (oversized) doc
    byBin.foreach { case ((sh, b), ds) =>
      val fill = ds.map(_._2).sum
      assert(fill <= budget || ds.length == 1,
        s"bin ($sh,$b) holds ${ds.length} docs at $fill tokens")
    }
    assert(byBin.exists(_._2.length > 1), "no multi-doc bin — vacuous")
    assert(rows.exists(_._2 > budget), "no oversized doc — vacuous")
    // GREEDY, not just feasible: within a shard's id order, doc i+1
    // starts a new bin iff it would overflow the open one
    rows.groupBy(_._3).foreach { case (sh, ds) =>
      var fill = 0L; var bin = 0L
      ds.sortBy(_._1).foreach { case (id, tok, _, b) =>
        if (fill > 0 && fill + tok > budget) { bin += 1; fill = 0L }
        fill += tok
        assert(b == bin, s"doc $id in shard $sh: bin $b, greedy says $bin")
      }
    }
    // assignment is a pure function of (id, shards, budget): any
    // input partitioning/order produces the identical relation
    val shuffled = Ops.binPack(docs.repartition(13, $"n_tokens")
        .sortWithinPartitions($"n_tokens"),
      "doc_id", "n_tokens", budget, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(shuffled.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
  }

  test("bloomPreFilter rejects mismatched key types (XxHash64 width trap)") {
    // int-vs-long keys hash differently (4 vs 8 bytes) → bloom false
    // negatives → silently dropped matches. The API must refuse.
    val fact = Seq((1, "a")).toDF("k", "v") // k: int
    val dim = Seq((1L, "d")).toDF("k", "v") // k: long
    val e = intercept[IllegalArgumentException] {
      Ops.bloomPreFilter(fact, "k", dim, "k")
    }
    assert(e.getMessage.contains("identical types"))
  }

  test("count-min sketch never undercounts; heavy hitters within eps*N") {
    // numeric companion to q82's oracle boolean (same eps/seed)
    val toks = Tables(spark, TestSpark.sf, "documents")
      .select(explode(split($"text", " ")).as("tok")).filter($"tok" =!= "")
    val total = toks.count()
    val bytes = toks.agg(expr("count_min_sketch(tok, 0.001d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val sk = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = toks.groupBy($"tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // CMS structurally never undercounts — assert over the WHOLE vocab
    exact.foreach { case (t, n) =>
      assert(sk.estimateCount(t) >= n, s"undercount for '$t'")
    }
    // the eps*N overcount bound on the heavy hitters (probabilistic per
    // term at 0.99 confidence, deterministic for this fixed seed+data)
    val bound = math.ceil(total * 0.001).toLong
    exact.sortBy(-_._2).take(10).foreach { case (t, n) =>
      assert(sk.estimateCount(t) - n <= bound, s"overcount for '$t'")
    }
  }

  test("assignIds: contiguous 0-based ids matching the total order") {
    val df = spark.range(0, 1000).select(
      (col("id") * 7919 % 1000).as("k"), col("id").as("payload"))
      .repartition(13) // scrambled input partitioning
    val out = Ops.assignIds(df, Seq(col("k")))
      .select("row_id", "k").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 1000L))
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq, "ids follow k order")
    // deterministic across runs
    val again = Ops.assignIds(df, Seq(col("k")))
      .select("row_id", "k").as[(Long, Long)].collect().sortBy(_._1)
    assert(again.sameElements(out))
  }

  test("hashSplit: total cover, no overlap, weights honored, salt rotates") {
    val df = spark.range(0, 5000).toDF("id")
    val split = Ops.hashSplit(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s1")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000, "every row lands in exactly one split")
    assert(math.abs(counts("train") - 4000.0) < 200, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 500.0) < 120, s"val=${counts("val")}")
    // stable: same salt → identical assignment; new salt → different
    val a1 = split.filter($"split" === "val").select("id").as[Long].collect().toSet
    val a2 = Ops.hashSplit(df, "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s1")
      .filter($"split" === "val").select("id").as[Long].collect().toSet
    assert(a1 == a2)
    val b = Ops.hashSplit(df, "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s2")
      .filter($"split" === "val").select("id").as[Long].collect().toSet
    assert(a1 != b, "salt should rotate the assignment")
    // degenerate weight-1 head split must catch everything
    val all = Ops.hashSplit(df, "id", Seq("a" -> 1.0, "b" -> 0.0))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("a" -> 5000L))
  }

  test("saltedTopKPerGroup is bit-identical to the plain window rank") {
    // Exactness argument (Ops.scaladoc): every true top-k row is top-k
    // within its own salt bucket, so phase 1 never drops a winner.
    // Skewed data on purpose: one hub group with 10x the rows.
    val df = spark.range(0, 11000).toDF("id")
      .select($"id", when($"id" < 10000, lit("hub")).otherwise(concat(lit("g"), $"id" % 7)).as("grp"),
        (($"id" * 2654435761L) % 100000).as("score"))
    val plain = graft.operators.Ops.topKPerGroup(
        df, Seq("grp"), Seq($"score".desc, $"id".asc), 25)
      .select("grp", "id", "score", "rk")
      .as[(String, Long, Long, Int)].collect().toSet
    for (parts <- Seq(1, 4, 16)) {
      val salted = graft.operators.Ops.saltedTopKPerGroup(
          df, Seq("grp"), Seq($"score".desc, $"id".asc), 25,
          saltCol = $"id", saltParts = parts)
        .select("grp", "id", "score", "rk")
        .as[(String, Long, Long, Int)].collect().toSet
      assert(salted == plain, s"saltParts=$parts diverged from plain rank")
    }
  }

  test("hashSplit: NULL keys route to the LAST split, explicitly") {
    // Pinned contract (ADVICE r6): md5(NULL) falls through every
    // threshold to the last split in ANY engine; hashSplit makes that
    // routing an explicit plan branch. Un-keyed rows therefore
    // concentrate in the last (test) split — documented, not silent.
    val df = spark.range(0, 100).toDF("id")
      .select(when($"id" < 10, lit(null).cast("string"))
        .otherwise($"id".cast("string")).as("k"))
    val split = Ops.hashSplit(df, "k",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val nullSplits = split.filter($"k".isNull)
      .select("split").as[String].collect().toSet
    assert(nullSplits == Set("test"), s"NULL keys went to $nullSplits")
    assert(split.count() == 100, "NULL rows are not dropped")
  }

  // --- SCD2 merge ---

  private def scd2Fixture = {
    // current: u1 has history (closed + open), u2 open-only, u3 open-only
    val current = Seq(
      ("u1", "a", 10L, Some(20L), false),
      ("u1", "b", 20L, None, true),
      ("u2", "c", 15L, None, true),
      ("u3", "d", 5L, None, true)).toDF("k", "attr", "vf", "vt", "cur")
      .select($"k", $"attr", timestamp_micros($"vf").as("valid_from"),
        timestamp_micros(coalesce($"vt", lit(null).cast("long")))
          .as("valid_to"), $"cur".as("is_current"))
    // changes touch u1 (twice) and u4 (new key); u2/u3 untouched
    val changes = Seq(("u1", "e", 30L), ("u1", "f", 40L), ("u4", "g", 25L))
      .toDF("k", "attr", "t").select($"k", $"attr",
        timestamp_micros($"t").as("ts"))
    (current, changes)
  }

  test("scd2Apply versions touched keys and passes the rest through") {
    val (current, changes) = scd2Fixture
    val out = Ops.scd2Apply(current, changes, "k", Seq("attr"))
      .withColumn("vf", unix_micros($"valid_from"))
      .withColumn("vt", unix_micros($"valid_to"))
      .orderBy($"k", $"vf")
      .select($"k", $"attr", $"vf", $"vt", $"is_current")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), Option(r.get(3)), r.getBoolean(4))).toSeq
    assert(out == Seq(
      ("u1", "a", 10L, Some(20L), false),  // closed history untouched
      ("u1", "b", 20L, Some(30L), false),  // open row closed by batch
      ("u1", "e", 30L, Some(40L), false),  // first change closed by second
      ("u1", "f", 40L, None, true),        // last change stays open
      ("u2", "c", 15L, None, true),        // untouched open rows
      ("u3", "d", 5L, None, true),
      ("u4", "g", 25L, None, true)))       // brand-new key
  }

  test("scd2Apply incremental batches equal the one-shot merge") {
    // The streaming-dimension-maintenance contract: applying change
    // batches one at a time (in event-time order) lands on the same
    // dimension as applying them all at once.
    val (current, changes) = scd2Fixture
    val Array(b1, b2) = Array(
      changes.filter(col("ts") <= timestamp_micros(lit(30L))),
      changes.filter(col("ts") > timestamp_micros(lit(30L))))
    val incremental = Ops.scd2Apply(
      Ops.scd2Apply(current, b1, "k", Seq("attr")), b2, "k", Seq("attr"))
    val oneShot = Ops.scd2Apply(current, changes, "k", Seq("attr"))
    assert(incremental.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(incremental).count() == 0)
  }

  test("scd2Apply is idempotent on an empty batch") {
    val (current, changes) = scd2Fixture
    val out = Ops.scd2Apply(current, changes.limit(0), "k", Seq("attr"))
    assert(out.count() == 4)
    assert(out.filter($"is_current").count() == 3)
  }

  test("snapshotDiff emits insert/update/delete and drops unchanged keys") {
    val oldDf = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val newDf = Seq(("b", 2), ("c", 9), ("d", 4)).toDF("k", "v")
    val out = Ops.snapshotDiff(oldDf, newDf, "k", Seq("v"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(out == Seq(
      ("a", "delete", Some(1), None),
      ("c", "update", Some(3), Some(9)),
      ("d", "insert", None, Some(4))))
  }

  test("snapshotDiff treats null attributes null-safely") {
    val oldDf = Seq[(String, Option[Int])](("a", Some(1)), ("b", None))
      .toDF("k", "v")
    val newDf = Seq[(String, Option[Int])](("a", None), ("b", None))
      .toDF("k", "v")
    val out = Ops.snapshotDiff(oldDf, newDf, "k", Seq("v")).collect()
    // b: null -> null is unchanged; a: 1 -> null is an update
    assert(out.map(_.getString(0)).toSeq == Seq("a"))
    assert(out.head.getString(1) == "update")
  }

  test("incremental agg merge == direct recompute: moves, reprices, group drop") {
    // snapshots keyed by id; group g, measure m. Between s1 and s2:
    //   id 1 repriced in place; id 2 MOVES group a→b; id 3 deleted
    //   (dropping group c to zero rows); id 5 inserted into new group d
    val s1 = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "c", 5.0),
      (4L, "b", 7.0)).toDF("id", "g", "m")
    val s2 = Seq((1L, "a", 11.5), (2L, "b", 20.0), (4L, "b", 7.0),
      (5L, "d", 3.25)).toDF("id", "g", "m")
    val base = s1.groupBy($"g").agg(count(lit(1)).as("n"),
      sum($"m".cast("decimal(30,4)")).as("s"))
    val cdc = Ops.snapshotDiff(s1, s2, "id", Seq("g", "m"))
    val merged = Ops.incrementalAggMerge(base,
        Ops.cdcAggContributions(cdc, "g", "m"), "g", "n", "s")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).toSeq
    val direct = s2.groupBy($"g").agg(count(lit(1)).as("n"),
        sum($"m".cast("decimal(30,4)")).as("s"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).toSeq
    assert(merged == direct)
    assert(!merged.exists(_._1 == "c"), "emptied group must drop from the view")
  }

  test("associationRules: hand-computed support/confidence/lift, apriori prune") {
    // 4 baskets: {A,B}, {A,B}, {A,C}, {B}; duplicate (1,A) row must
    // dedup. minSupport=2: C (1 basket) is pruned before pairing.
    // A:3 B:3 AB:2 → supp 0.5, conf(A→B)=2/3, lift=2*4/(3*3)=8/9.
    val baskets = Seq((1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B"),
      (3, "A"), (3, "C"), (4, "B")).toDF("ck", "it")
    val rules = Ops.associationRules(baskets, "ck", "it",
        minSupport = 2L, minConfidence = 0.0)
      .orderBy("ant").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toSeq
    assert(rules == Seq(
      ("A", "B", 2L, 3L, 3L, 0.5, 2.0 / 3, 2.0 * 4 / 9),
      ("B", "A", 2L, 3L, 3L, 0.5, 2.0 / 3, 2.0 * 4 / 9)))
    // confidence filter: 0.7 kills both (conf = 0.667)
    assert(Ops.associationRules(baskets, "ck", "it", 2L, 0.7).count() == 0)
  }

  test("associationRules maxBasket: no-op within bound, caps a hot basket") {
    // 30 baskets of {A,B,C}, plus 3 "hot" baskets holding the full
    // 12-item vocabulary — so every item passes minSupport=3 and the
    // hot baskets genuinely exceed a maxBasket=4 cap.
    val vocab = ('A' to 'L').map(_.toString)
    val rows = (1 to 30).flatMap(ck => Seq("A", "B", "C").map((ck, _))) ++
      (31 to 33).flatMap(ck => vocab.map((ck, _)))
    val baskets = rows.toDF("ck", "it")
    val uncapped = Ops.associationRules(baskets, "ck", "it", 3L, 0.0)
      .orderBy("ant", "cons").collect().map(_.toSeq).toSeq
    // cap far above every basket: bit-identical output
    val noop = Ops.associationRules(baskets, "ck", "it", 3L, 0.0,
      maxBasket = 1000).orderBy("ant", "cons").collect().map(_.toSeq).toSeq
    assert(noop == uncapped)
    // cap below the hot basket: its pair fan-out is bounded to
    // maxBasket items (n_both may drop) but the support/confidence
    // DENOMINATORS stay exact — n_ant/n_cons count full baskets.
    val capped = Ops.associationRules(baskets, "ck", "it", 3L, 0.0,
      maxBasket = 4)
    val ab = capped.filter($"ant" === "A" && $"cons" === "B").collect()
    assert(ab.nonEmpty && ab.head.getAs[Long]("n_ant") == 33L,
      "item support must stay exact under the cap")
    assert(ab.head.getAs[Long]("n_both") >= 30L)
    // determinism: same cap twice → identical rows
    val again = Ops.associationRules(baskets, "ck", "it", 3L, 0.0,
      maxBasket = 4).orderBy("ant", "cons").collect().map(_.toSeq).toSeq
    assert(capped.orderBy("ant", "cons").collect().map(_.toSeq).toSeq == again)
  }

  test("pageRank: dangling mass redistributed, rank sum conserved, all nodes kept") {
    // 1→2, 1→3, 2→3; node 3 is dangling (no out-edges) — without
    // redistribution Σr shrinks every round and node 1 (no in-edges)
    // would drop out of the result entirely.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = Ops.pageRank(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(math.abs(out.values.sum - 1.0) < 1e-9,
      s"rank mass must be conserved, got ${out.values.sum}")
    // dense textbook replay (double arithmetic, tolerance compare)
    val deg = Map(1L -> 2.0, 2L -> 1.0)
    var r = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    for (_ <- 1 to 5) {
      val dm = r.collect { case (k, v) if !deg.contains(k) => v }.sum
      def in(v: Long): Double = v match {
        case 2L => r(1L) / deg(1L)
        case 3L => r(1L) / deg(1L) + r(2L) / deg(2L)
        case _  => 0.0
      }
      r = r.keys.map(k =>
        k -> (0.15 / 3 + 0.85 * (in(k) + dm / 3))).toMap
    }
    Seq(1L, 2L, 3L).foreach { k =>
      assert(math.abs(out(k) - r(k)) < 1e-9, s"node $k: ${out(k)} vs ${r(k)}")
    }
  }

  test("rankPerGroupDistributed == plain per-group window rank, skewed groups") {
    // group a: 200 rows (the 'hub stratum'), b: 3, c: 1
    val rows = (1 to 200).map(i => ("a", i.toLong)) ++
      Seq(("b", 1L), ("b", 2L), ("b", 3L), ("c", 9L))
    val df = rows.toDF("g", "id")
      .withColumn("u", Ops.kmvUnitHash($"id" + when($"g" === "b", 1000L)
        .when($"g" === "c", 2000L).otherwise(0L)))
    val dist = Ops.rankPerGroupDistributed(df, Seq("g"),
        floor($"u" * 8).cast("int"), Seq($"u".asc, $"id".asc), "rk")
      .select($"g", $"id", $"rk".cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"u".asc, $"id".asc)
    val plain = df.withColumn("rk", row_number().over(w))
      .select($"g", $"id", $"rk".cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(dist == plain)
  }

  test("flattenHierarchy: forest roots/depths exact; 2^rounds depth boundary") {
    // chain 1<-2<-3<-4<-5 (depths 0..4) and a second root 10<-11
    val nodes = Seq((1L, None), (2L, Some(1L)), (3L, Some(2L)),
        (4L, Some(3L)), (5L, Some(4L)), (10L, None), (11L, Some(10L)))
      .toDF("id", "parent")
    val got = Ops.flattenHierarchy(nodes, rounds = 2) // 2^2 = 4 >= depth 4
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 2L),
      (4L, 1L, 3L), (5L, 1L, 4L), (10L, 10L, 0L), (11L, 10L, 1L)))
    // extra rounds are no-ops once resolved
    val more = Ops.flattenHierarchy(nodes, rounds = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(more == got)
  }

  test("triangleCounts: K4, pendant, star — each triangle once, hubs included") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3), pendant 4-5
    // (no triangle), star 10-{11,12,13} (no triangle among leaves)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L)).toDF("u", "v")
    val got = Ops.triangleCounts(edges).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  // --- KMV sketch ---

  private def kmvOf(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val kmv = udaf(new graft.functions.Aggregators.KmvSketch(k),
      org.apache.spark.sql.Encoders.scalaDouble)
    df.agg(kmv($"u").as("sk")).select($"sk").as[Seq[Double]].head()
  }

  test("KmvSketch keeps exactly the k smallest distinct hashes") {
    val df = spark.range(2000).select(
      Ops.kmvUnitHash(($"id" % 500).cast("string")).as("u"))
    val sk = kmvOf(df, 64)
    val expected = df.distinct().orderBy($"u").limit(64)
      .as[Double].collect().toSeq
    assert(sk == expected)
  }

  test("KmvSketch is partition-merge invariant") {
    val base = spark.range(3000)
      .select(Ops.kmvUnitHash($"id".cast("string")).as("u"))
    val one = kmvOf(base.repartition(1), 32)
    val many = kmvOf(base.repartition(13), 32)
    assert(one == many)
  }

  test("KmvSketch below capacity is the exact distinct set") {
    val df = spark.range(40).select(
      Ops.kmvUnitHash(($"id" % 10).cast("string")).as("u"))
    val sk = kmvOf(df, 64)
    assert(sk.length == 10)
    val est = spark.range(1).select(
      Ops.kmvDistinctEstimate(typedLit(sk), 64)).as[Double].head()
    assert(est == 10.0)
  }

  test("KMV distinct estimate lands within the theoretical error band") {
    val n = 5000
    val k = 256
    val df = spark.range(n.toLong)
      .select(Ops.kmvUnitHash($"id".cast("string")).as("u"))
    val sk = kmvOf(df, k)
    val est = spark.range(1).select(
      Ops.kmvDistinctEstimate(typedLit(sk), k)).as[Double].head()
    // RSE ~ 1/sqrt(k-2) ≈ 6.3%; 4 sigma ≈ 25%
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs exact $n")
  }

  test("KMV intersection estimate is exact when both sets fit in k") {
    val a = spark.range(0, 30)
      .select(Ops.kmvUnitHash($"id".cast("string")).as("u"))
    val b = spark.range(20, 60)
      .select(Ops.kmvUnitHash($"id".cast("string")).as("u"))
    val (ska, skb) = (kmvOf(a, 128), kmvOf(b, 128))
    val row = spark.range(1).select(
      Ops.kmvIntersectEstimate(typedLit(ska), typedLit(skb), 128).as("i"),
      Ops.kmvUnionEstimate(typedLit(ska), typedLit(skb), 128).as("un"),
      Ops.kmvDifferenceEstimate(typedLit(ska), typedLit(skb), 128).as("d"))
      .as[(Double, Double, Double)].head()
    assert(row == ((10.0, 60.0, 20.0)))
  }

  test("KMV set-algebra identity: |A| ≈ |A∩B| + |A\\B| exactly per sample") {
    // Within one τ the three counts come from the same sample, so the
    // identity holds EXACTLY (not just in expectation).
    val a = spark.range(0, 4000)
      .select(Ops.kmvUnitHash($"id".cast("string")).as("u"))
    val b = spark.range(3000, 9000)
      .select(Ops.kmvUnitHash($"id".cast("string")).as("u"))
    val (ska, skb) = (kmvOf(a, 256), kmvOf(b, 256))
    val (i, d, tot) = spark.range(1).select(
      Ops.kmvIntersectEstimate(typedLit(ska), typedLit(skb), 256).as("i"),
      Ops.kmvDifferenceEstimate(typedLit(ska), typedLit(skb), 256).as("d"),
      {
        // |{u ∈ A : u < τ}| / τ — A's own sample at the combined τ
        val tau = least(Ops.kmvTheta(typedLit(ska), 256),
          Ops.kmvTheta(typedLit(skb), 256))
        (size(filter(typedLit(ska), u => u < tau)).cast("double") / tau)
          .as("t")
      }).as[(Double, Double, Double)].head()
    assert(math.abs(i + d - tot) < 1e-9, s"$i + $d != $tot")
    assert(math.abs(i - 1000) / 1000 < 0.5, s"intersect est $i vs 1000")
  }

  test("ntileGlobal matches the SQL window NTILE bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    // 103 rows / 4 buckets: non-divisible, so the first 103%4=3 buckets
    // take one extra row — the exact rule the closed form must encode.
    val df = spark.range(0, 103)
      .select((($"id" * 37) % 103).as("k")) // permuted unique keys
    val viaWindow = df.select($"k",
      ntile(4).over(Window.orderBy($"k")).as("b"))
    val viaGlobal = Ops.ntileGlobal(df, Seq(col("k")), 4, "b")
    assert(viaGlobal.orderBy($"k").collect().toSeq
      == viaWindow.orderBy($"k").collect().toSeq)
    // n < buckets: every row its own bucket, numbered from 1.
    val tiny = Ops.ntileGlobal(
      spark.range(0, 3).toDF("k"), Seq(col("k")), 7, "b")
    assert(tiny.orderBy($"k").select($"b").as[Int].collect().toSeq
      == Seq(1, 2, 3))
  }

  test("runningTotal matches the single-partition window cumsum bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    // 101 rows over 8 buckets: every bucket boundary exercises the
    // offset handoff; values permuted so order != insertion order.
    val df = spark.range(0, 101)
      .select((($"id" * 53) % 101).as("k"),
        (($"id" % 7) + 1).cast("decimal(20,2)").as("v"))
    val viaWindow = df.select($"k",
      sum($"v").over(Window.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("running_total"))
    val viaDist = Ops.runningTotal(df, Seq(col("k")), "v", buckets = 8)
      .select($"k", $"running_total")
    assert(viaDist.orderBy($"k").collect().toSeq
      == viaWindow.orderBy($"k").collect().toSeq)
    // descending order with a tiebreak, n not divisible by buckets
    val desc = Ops.runningTotal(df, Seq($"v".desc, $"k"), "v", buckets = 4)
      .orderBy($"v".desc, $"k").select($"running_total")
      .as[java.math.BigDecimal].collect()
    val expd = df.select($"v", $"k",
        sum($"v").over(Window.orderBy($"v".desc, $"k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("rt"))
      .orderBy($"v".desc, $"k").select($"rt")
      .as[java.math.BigDecimal].collect()
    assert(desc.toSeq == expd.toSeq)
  }

  test("shuffleShardAssign: deterministic, complete, contiguous per-shard order") {
    val df = spark.range(1000).toDF("k")
    val a = Ops.shuffleShardAssign(df, "k", nShards = 8, seed = "s1")
      .select($"k", $"shard", $"pos").as[(Long, Int, Int)].collect()
    // every row assigned, shards within range, all 8 used at n=1000
    assert(a.length == 1000)
    assert(a.map(_._2).toSet == (0 until 8).toSet)
    // per-shard positions are exactly 0..n_i-1 (an export writer can
    // trust pos as the record offset in its shard file)
    a.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length),
        s"shard $s positions not contiguous")
    }
    // deterministic replay; different seed = different permutation
    val b = Ops.shuffleShardAssign(df, "k", 8, "s1")
      .select($"k", $"shard", $"pos").as[(Long, Int, Int)].collect()
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    val c = Ops.shuffleShardAssign(df, "k", 8, "s2")
      .select($"k", $"shard", $"pos").as[(Long, Int, Int)].collect()
    assert(a.sortBy(_._1).toSeq != c.sortBy(_._1).toSeq)
  }

  test("shuffledShardedWrite: file order IS the assignment order, one file per shard") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val df = spark.range(500).toDF("k").withColumn("payload", $"k" * 7)
    Ops.shuffledShardedWrite(df, "k", nShards = 4, out, seed = "s1")
    val want = Ops.shuffleShardAssign(df, "k", 4, "s1")
      .select($"shard", $"pos", $"k").as[(Int, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    (0 until 4).foreach { s =>
      val dir = new java.io.File(s"$out/shard=$s")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s has ${files.length} files")
      // parquet preserves in-file row order: reading the single file
      // back must reproduce the md5 draw order exactly
      val got = spark.read.parquet(files.head.toString)
        .select($"k").as[Long].collect().toSeq
      assert(got == want(s), s"shard $s order mismatch")
    }
  }

  test("groupedLinearFit recovers an exact line and flags degenerate groups") {
    // g=a: y = 3x + 2 exactly -> slope 3, intercept 2, r2 1
    // g=b: zero x-variance -> nulls
    val df = Seq(
      ("a", 0L, 2L), ("a", 1L, 5L), ("a", 2L, 8L), ("a", 5L, 17L),
      ("b", 4L, 1L), ("b", 4L, 9L)).toDF("g", "x", "y")
    val out = Ops.groupedLinearFit(df, Seq("g"), $"x", $"y")
      .orderBy("g").collect()
    val a = out(0)
    assert(a.getLong(1) == 4L)
    assert(a.getDouble(2) == 3.0 && a.getDouble(3) == 2.0 &&
      a.getDouble(4) == 1.0)
    val b = out(1)
    assert(b.isNullAt(2) && b.isNullAt(3) && b.isNullAt(4))
  }

  test("groupedLinearFit is partition-layout invariant") {
    val rows = (0 until 400).map(i => ("g", (i % 23).toLong,
      (i * 37 % 101).toLong))
    val one = Ops.groupedLinearFit(
      spark.createDataFrame(rows).toDF("g", "x", "y").coalesce(1),
      Seq("g"), $"x", $"y").collect().head
    val many = Ops.groupedLinearFit(
      spark.createDataFrame(rows).toDF("g", "x", "y").repartition(13),
      Seq("g"), $"x", $"y").collect().head
    assert(one.getDouble(2) == many.getDouble(2) &&
      one.getDouble(3) == many.getDouble(3) &&
      one.getDouble(4) == many.getDouble(4))
  }

  test("weightedMedian matches the naive cumulative-window definition bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    // adversarial mix: duplicate values, weight spikes, values that
    // share / straddle coarse buckets (shift 4 -> bucket width 16)
    val rows = (0 until 500).map { i =>
      val g = s"g${i % 3}"
      val v = ((i * 131) % 97) * 3 + (if (i % 7 == 0) 1000 else 0)
      val w = 1L + (i * 17) % 9 + (if (i % 50 == 0) 200 else 0)
      (g, v.toLong, w)
    }
    val df = rows.toDF("g", "v", "w").repartition(7)
    val got = Ops.weightedMedian(df, Seq("g"), $"v", $"w", coarseShift = 4)
      .select($"g", $"median", $"total_weight")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val naive = {
      val f = df.groupBy($"g", $"v").agg(sum($"w").as("vw"))
      val cum = f.withColumn("cum", sum($"vw").over(
          Window.partitionBy($"g").orderBy($"v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tw", sum($"vw").over(Window.partitionBy($"g")))
      cum.filter($"cum" * 2 >= $"tw")
        .groupBy($"g").agg(min($"v").as("median"), min($"tw").as("tw"))
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(got == naive)
  }

  test("weightedQuantiles: every permille matches its naive window answer") {
    import org.apache.spark.sql.expressions.Window
    val rows = (0 until 300).map { i =>
      (s"g${i % 2}", ((i * 53) % 211).toLong, 1L + (i * 13) % 5) }
    val df = rows.toDF("g", "v", "w").repartition(5)
    val ps = Seq(100, 250, 500, 750, 900, 1000)
    val got = Ops.weightedQuantiles(df, Seq("g"), $"v", $"w", ps,
        coarseShift = 3)
      .select($"g", $"permille", $"value")
      .as[(String, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    val f = df.groupBy($"g", $"v").agg(sum($"w").as("vw"))
      .withColumn("cum", sum($"vw").over(Window.partitionBy($"g").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum($"vw").over(Window.partitionBy($"g")))
    val naive = ps.flatMap { p =>
      f.filter($"cum" * 1000 >= lit(p) * $"tw")
        .groupBy($"g").agg(min($"v").as("q"))
        .as[(String, Long)].collect().map { case (g, q) => (g, p.toLong, q) }
    }.sortBy(t => (t._1, t._2))
    assert(got == naive)
  }

  test("weightedQuantiles handles negative values (arithmetic-shift buckets)") {
    import org.apache.spark.sql.expressions.Window
    val rows = (0 until 200).map { i =>
      ("g", ((i * 53) % 211 - 105).toLong, 1L + i % 4) }
    val df = rows.toDF("g", "v", "w").repartition(3)
    val got = Ops.weightedQuantiles(df, Seq("g"), $"v", $"w",
        Seq(250, 500, 750), coarseShift = 4)
      .select($"permille", $"value").as[(Long, Long)].collect().sortBy(_._1)
    val f = df.groupBy($"g", $"v").agg(sum($"w").as("vw"))
      .withColumn("cum", sum($"vw").over(Window.partitionBy($"g").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum($"vw").over(Window.partitionBy($"g")))
    val naive = Seq(250, 500, 750).map { p =>
      (p.toLong, f.filter($"cum" * 1000 >= lit(p) * $"tw")
        .agg(min($"v")).as[Long].collect().head)
    }
    assert(got.toSeq == naive)
    assert(got.exists(_._2 < 0), "test data must cross zero")
  }

  test("quantileBucketize: quartile labels respect strict-less boundaries") {
    // values 1..8 in one group: quartile bounds (lower quantile) are
    // 2, 4, 6 -> bins: 1,2 -> 0; 3,4 -> 1; 5,6 -> 2; 7,8 -> 3
    val df = (1L to 8L).map(("g", _)).toDF("g", "v")
    val out = Ops.quantileBucketize(df, Seq("g"), $"v", Seq(250, 500, 750),
        coarseShift = 1)
      .select($"v", $"bin").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1,
      5L -> 2, 6L -> 2, 7L -> 3, 8L -> 3), out.toString)
  }

  test("weightedMedian straddle edge: exact half-weight picks the lower value") {
    // weights 1,1 at values 10,20: cum(10)*2 == tw -> median 10
    val df = Seq(("a", 10L, 1L), ("a", 20L, 1L)).toDF("g", "v", "w")
    val out = Ops.weightedMedian(df, Seq("g"), $"v", $"w").collect().head
    assert(out.getLong(1) == 10L && out.getLong(2) == 2L)
  }

  test("shortestPaths relaxes past the greedy route and early-stops") {
    // 1 -> 2 direct costs 10; 1 -> 3 -> 4 -> 2 costs 3. Node 5 dangles
    // at distance 10+? unreachable from seed within cap -> reachable
    // set only. maxHops generous: loop must early-stop, not run dry.
    val edges = Seq(
      (1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L), (4L, 2L, 1L),
      (6L, 5L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val got = Ops.shortestPaths(edges, seeds, maxHops = 16)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 0L), (2L, 3L), (3L, 1L), (4L, 2L)))
  }

  test("shortestPaths hop bound truncates like k-round Bellman-Ford") {
    // chain 1->2->3->4 with unit weights; 2 hops reach only node 3
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val got = Ops.shortestPaths(edges, Seq(1L).toDF("id"), maxHops = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L)))
  }

  test("randomWalks: valid edges, one node per step, sinks stop, rerun-stable") {
    // 3 is a sink: a walk reaching it must truncate, and seeding at 3
    // yields only step 0. Every consecutive hop must be a real edge
    // and every (seed, step) at most one node — the walk is a path,
    // not a tree.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (2L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 3L).toDF("id")
    val w = Ops.randomWalks(edges, seeds, steps = 5, salt = "t").persist()
    try {
      val rows = w.orderBy("seed", "step").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      // step 0 is the seed itself
      assert(rows.filter(_._2 == 0).map(x => (x._1, x._3)).toSet ==
        Set((1L, 1L), (3L, 3L)))
      // sink seed goes nowhere
      assert(rows.filter(_._1 == 3L) == Seq((3L, 0, 3L)))
      // at most one node per (seed, step)
      assert(rows.groupBy(x => (x._1, x._2)).values.forall(_.size == 1))
      // consecutive hops are edges; a walk that visited the sink ends
      val edgeSet = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (2L, 4L),
        (4L, 1L))
      val walk1 = rows.filter(_._1 == 1L).sortBy(_._2).map(_._3)
      walk1.sliding(2).foreach {
        case Seq(a, b) => assert(edgeSet.contains((a, b)), s"$a->$b not an edge")
        case _ =>
      }
      // deterministic: a second run is identical
      val again = Ops.randomWalks(edges, seeds, steps = 5, salt = "t")
        .orderBy("seed", "step").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      assert(again == rows)
      // a different salt decorrelates the picks without breaking shape
      val salted = Ops.randomWalks(edges, seeds, steps = 5, salt = "u")
        .orderBy("seed", "step").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      assert(salted.filter(_._2 == 0) == rows.filter(_._2 == 0))
    } finally w.unpersist(blocking = false)
  }

  test("randomWalks: hub guard fails loudly past maxDegree, exact under it") {
    import spark.implicits._
    // node 1 is a 50-out-edge hub; everything else is degree 1
    val edges = ((1 to 50).map(i => (1L, 100L + i)) ++
      Seq((2L, 1L), (3L, 2L))).toDF("src", "dst")
    val seeds = Seq(3L).toDF("id")
    val err = intercept[IllegalArgumentException] {
      Ops.randomWalks(edges, seeds, steps = 2, salt = "h", maxDegree = 10)
    }
    assert(err.getMessage.contains("out-degree") &&
      err.getMessage.contains("maxDegree"), err.getMessage)
    // same graph under the bound (and with the guard off): identical,
    // deterministic walks — the guard never changes results
    val ok = Ops.randomWalks(edges, seeds, steps = 2, salt = "h",
      maxDegree = 64).orderBy("step").collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq
    val off = Ops.randomWalks(edges, seeds, steps = 2, salt = "h",
      maxDegree = 0).orderBy("step").collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(ok == off)
    assert(ok.take(2) == Seq((0, 3L), (1, 2L)), ok.toString)
  }

  test("logisticTrainIRLS: separable margin grows, noisy MLE converges, d=3 solves") {
    import spark.implicits._
    def beta(df: org.apache.spark.sql.DataFrame, it: Int,
             d: Int = 2): Array[Double] = {
      val feats =
        if (d == 2) Seq(lit(1.0), col("x"))
        else Seq(lit(1.0), col("x"), col("x") * col("x"))
      Ops.logisticTrainIRLS(df, feats, col("y"), iters = it)
        .orderBy("idx").collect().map(_.getDouble(1))
    }
    // separable fixture: y = (x > 0). Newton classifies perfectly and
    // each extra iteration widens the margin (no finite MLE exists).
    val sep = (1 to 20).map(i => (i / 10.0, 1.0)) ++
      (1 to 20).map(i => (-i / 10.0, 0.0))
    val sdf = sep.toDF("x", "y")
    val b2 = beta(sdf, 2)
    val b5 = beta(sdf, 5)
    assert(b2(1) > 0, b2.toSeq.toString)
    assert(b5(1) > b2(1), s"margin should grow: ${b2(1)} -> ${b5(1)}")
    val wrong = sep.count { case (x, y) =>
      val p = 1.0 / (1.0 + math.exp(-(b5(0) + b5(1) * x)))
      (if (p > 0.5) 1.0 else 0.0) != y
    }
    assert(wrong == 0, s"$wrong of ${sep.size} misclassified")
    // overlapping labels: the MLE is finite and IRLS CONVERGES — the
    // coefficients are iteration-stable well below the decimal(30,12)
    // statistic resolution.
    val noisy = sep ++ Seq((1.5, 0.0), (-1.5, 1.0), (0.3, 0.0), (-0.3, 1.0))
    val ndf = noisy.toDF("x", "y")
    val b8 = beta(ndf, 8)
    val b12 = beta(ndf, 12)
    assert(math.abs(b8(0) - b12(0)) < 1e-8 &&
      math.abs(b8(1) - b12(1)) < 1e-8,
      s"IRLS did not converge: ${b8.toSeq} vs ${b12.toSeq}")
    assert(b8(1) > 0)
    // d = 3 exercises the Gaussian-elimination solve path
    val b3 = beta(ndf, 8, d = 3)
    assert(b3.length == 3 && b3(1) > 0, b3.toSeq.toString)
  }

  test("bootstrapDiff: signs, determinism, and the degenerate zero diff") {
    import graft.operators.Drift
    // A clearly one-sided diff: 40 items at +1, 2 at -1 — virtually
    // every resample must land positive.
    val oneSided = ((1L to 40L).map(i => (i, 1L)) ++
      Seq((41L, -1L), (42L, -1L))).toDF("id", "d")
    val r1 = Drift.bootstrapDiff(oneSided, "id", $"d", resamples = 100,
      salt = "s1").head()
    assert(r1.getAs[String]("total_diff") == "38")
    assert(r1.getAs[Long]("n_pos") > 90, r1.toString)
    // deterministic: identical inputs + salt reproduce exactly
    val r2 = Drift.bootstrapDiff(oneSided, "id", $"d", resamples = 100,
      salt = "s1").head()
    assert(r1.toString == r2.toString)
    // a different salt draws different resamples (counts may differ)
    val r3 = Drift.bootstrapDiff(oneSided, "id", $"d", resamples = 100,
      salt = "s2").head()
    assert(r3.getAs[Long]("n_pos") > 90)
    // all-zero diff: every resample sum is exactly zero
    val zero = (1L to 20L).map(i => (i, 0L)).toDF("id", "d")
    val rz = Drift.bootstrapDiff(zero, "id", $"d", resamples = 50).head()
    assert(rz.getAs[Long]("n_zero") == 50 && rz.getAs[String]("total_diff") == "0")
  }

  test("bootstrapDiff: Poisson(1) weights average to ~1 (resamples cover the data)") {
    import graft.operators.Drift
    // every item weight 1·diff with diff=1: per-resample sums should
    // concentrate around n (mean weight 1) — a gross weighting bug
    // (e.g. threshold order) would shift the mass
    val ones = (1L to 500L).map(i => (i, 1L)).toDF("id", "d")
    val r = Drift.bootstrapDiff(ones, "id", $"d", resamples = 100,
      salt = "w").head()
    // all resample sums positive (P(sum<=0) astronomically small)
    assert(r.getAs[Long]("n_pos") == 100, r.toString)
  }

  test("manifestDiff: added/removed/changed/unchanged per shard, exact deltas") {
    def m(rows: Seq[(Int, Long, Long, String)]) = rows
      .toDF("shard", "n_rows", "ws_tokens", "fp")
      .select($"shard", $"n_rows", $"ws_tokens",
        $"fp".cast("decimal(38,0)").as("fingerprint"))
    val oldM = m(Seq(
      (0, 10L, 100L, "111"),   // identical in new -> unchanged
      (1, 10L, 100L, "222"),   // fingerprint moves -> changed
      (2, 5L, 50L, "333")))    // absent from new -> removed
    val newM = m(Seq(
      (0, 10L, 100L, "111"),
      (1, 12L, 130L, "999"),
      (3, 7L, 70L, "444")))    // absent from old -> added
    val out = Ops.manifestDiff(oldM, newM).orderBy("shard")
      .select($"shard", $"status", $"d_rows", $"d_tokens")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0, "unchanged", 0L, 0L),
      (1, "changed", 2L, 30L),
      (2, "removed", -5L, -50L),
      (3, "added", 7L, 70L)), out.toString)
  }

  test("manifestUpdate: folding a delta in equals a full rebuild, bit for bit") {
    // VERDICT r14 #7 merge exactness: every manifest column is
    // commutative-additive, so standing(old rows) + delta(new rows)
    // must equal shardManifest(all rows) EXACTLY — counts, token
    // sums, the decimal fingerprint, and the id bounds.
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text")
    val standing = Ops.shardManifest(docs.filter($"doc_id" % 11 =!= 0),
      "doc_id", "text", nShards = 8, seed = "mu")
    val updated = Ops.manifestUpdate(standing,
        docs.filter($"doc_id" % 11 === 0), "doc_id", "text",
        nShards = 8, seed = "mu")
      .orderBy("shard").collect().toSeq
    val full = Ops.shardManifest(docs, "doc_id", "text",
        nShards = 8, seed = "mu")
      .orderBy("shard").collect().toSeq
    assert(updated.nonEmpty && updated == full)
    // chained updates stay exact (the daily loop composes)
    val third = docs.filter($"doc_id" % 11 === 0)
    val twoStep = Ops.manifestUpdate(
      Ops.manifestUpdate(
        Ops.shardManifest(docs.filter($"doc_id" % 11 =!= 0)
          .filter($"doc_id" % 7 =!= 0), "doc_id", "text", 8, "mu"),
        docs.filter($"doc_id" % 11 =!= 0).filter($"doc_id" % 7 === 0),
        "doc_id", "text", 8, "mu"),
      third, "doc_id", "text", 8, "mu")
      .orderBy("shard").collect().toSeq
    assert(twoStep == full)
  }

  test("manifestDiff: equal fingerprint with diverging counts is loud, not silent") {
    // belt-and-braces rule: a (theoretical) fingerprint collision with
    // different row counts must read 'changed'
    def m(n: Long) = Seq((0, n, 100L, "111"))
      .toDF("shard", "n_rows", "ws_tokens", "fp")
      .select($"shard", $"n_rows", $"ws_tokens",
        $"fp".cast("decimal(38,0)").as("fingerprint"))
    val out = Ops.manifestDiff(m(10L), m(11L))
      .select($"status").as[String].collect().toSeq
    assert(out == Seq("changed"))
  }

  test("kCore: triangle survives the 2-core, pendant tail peels") {
    // triangle 1-2-3 plus tail 3-4-5: k=2 peels 5, then 4 (a 2-round
    // cascade), leaving the triangle with in-core degree 2 each.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val out = Ops.kCore(edges, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: full cascade to an empty core returns zero rows") {
    // a path graph has no 2-core — peeling eats it end-in (2 nodes
    // per round from each side), a multi-round cascade to nothing
    val path = (1L to 8L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("u", "v")
    assert(Ops.kCore(path, k = 2).count() == 0)
  }

  test("kCore: symmetrization — one orientation per edge suffices") {
    val once = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("u", "v")
    val both = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 1L)).toDF("u", "v")
    val a = Ops.kCore(once, k = 2).orderBy("node")
      .collect().map(_.toSeq).toSeq
    val b = Ops.kCore(both, k = 2).orderBy("node")
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("kCore: maxRounds guard fails loudly before fixpoint") {
    val path = (1L to 12L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("u", "v")
    val ex = intercept[IllegalStateException](
      Ops.kCore(path, k = 2, maxRounds = 1).count())
    assert(ex.getMessage.contains("maxRounds"))
  }

  test("labelPropagation: a symmetric pair settles on the lower id") {
    // Classic synchronous LPA 2-cycles here; the monotone clamp must
    // converge it to the min id in one effective round.
    val out = Ops.labelPropagation(Seq((1L, 2L)).toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("labelPropagation: bridged cliques keep per-clique labels, not CC's flood") {
    // K4 {1,2,3,4} — bridge 4-10 — K4 {10,11,12,13}. Hand-traced
    // fixpoint: clique A all 1; in B the bridge endpoint 10 is
    // captured by its round-1 min-neighbor vote (label 4) while
    // 11/12/13 hold B's own plurality label 10. CC would flood the
    // whole component with 1 — the vote boundary is the difference.
    val cl = (for {
      c <- Seq(Seq(1L, 2L, 3L, 4L), Seq(10L, 11L, 12L, 13L))
      a <- c; b <- c if a < b
    } yield (a, b)) :+ ((4L, 10L))
    val out = Ops.labelPropagation(cl.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 4L, 11L -> 10L, 12L -> 10L, 13L -> 10L), out.toString)
  }

  test("labelPropagation: symmetrization + self-loop/dup cleaning") {
    val once = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 1L),
      (2L, 3L)).toDF("u", "v")
    val a = Ops.labelPropagation(once).orderBy("node")
      .collect().map(_.toSeq).toSeq
    val b = Ops.labelPropagation(noisy).orderBy("node")
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("labelPropagation: negative node ids fail loudly") {
    val ex = intercept[Exception](
      Ops.labelPropagation(Seq((-1L, 2L)).toDF("u", "v")).count())
    assert(ex.getMessage != null)
  }

  test("hits: mutual reinforcement beats raw degree, max-norm pins [0,1]") {
    // hub 1 → {10,11,12}, hub 2 → {10}: after 2 rounds authority 10
    // leads (backed by the strongest hub), 11/12 tie below it, hub 2
    // trails hub 1. Textbook replay in exact fractions:
    //   a1 = {10:1, 11:.5, 12:.5}; h1 = {1:1, 2:.5}
    //   a2 = {10:1, 11:2/3, 12:2/3}; h2 = {1:1, 2:3/7}
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L))
      .toDF("src", "dst")
    val out = Ops.hits(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 10L, 11L, 12L))
    def near(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(near(out(1L)._1, 1.0) && near(out(2L)._1, 3.0 / 7))
    assert(near(out(10L)._2, 1.0) && near(out(11L)._2, 2.0 / 3) &&
      near(out(12L)._2, 2.0 / 3))
    // bipartite: the absent side of each node scores exactly 0
    assert(out(1L)._2 == 0.0 && out(10L)._1 == 0.0)
  }

  test("kCore and hits release every internal persist (cache hygiene)") {
    import org.apache.spark.sql.graftprobe.CacheProbe
    spark.catalog.clearCache()
    val edges = (1L to 40L).flatMap(i => Seq((i, i % 7 + 100L),
      (i, i % 5 + 200L))).toDF("u", "v")
    Ops.kCore(edges, k = 2).count()
    assert(CacheProbe.cacheIsEmpty(spark),
      "kCore left persisted internals in the session cache")
    Ops.hits(edges.select($"u".as("src"), $"v".as("dst")), iters = 2).count()
    assert(CacheProbe.cacheIsEmpty(spark),
      "hits left persisted internals in the session cache")
  }

  test("bradleyTerry: two-player fixpoint is exact, order and smoothing hold") {
    import graft.operators.Ops
    import org.apache.spark.sql.graftprobe.CacheProbe
    // A beats B 3 of 4: smoothed wins 3.5/1.5 over n'=5 games; the
    // 2-player MM update lands the MLE odds W_A/W_B in ONE round and
    // stays there: normalized scores exactly 1.4 / 0.6.
    val ct = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("w", "l")
    val out = Ops.bradleyTerry(ct, "w", "l", iters = 8)
      .orderBy("item").collect()
    assert(out.map(_.getAs[String]("item")).toSeq == Seq("A", "B"))
    assert(out(0).getAs[Long]("n_games") == 4L
      && out(0).getAs[Long]("n_wins") == 3L)
    assert(out(0).getAs[Double]("score") == 1.4, out(0).toString)
    assert(out(1).getAs[Double]("score") == 0.6, out(1).toString)
    // transitive chain orders A > B > C
    val chain = Ops.bradleyTerry(
      Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C")).toDF("w", "l"),
      "w", "l").collect().map(r =>
        r.getAs[String]("item") -> r.getAs[Double]("score")).toMap
    assert(chain("A") > chain("B") && chain("B") > chain("C"), chain.toString)
    // winless item keeps strictly positive strength (add-half)
    assert(chain("C") > 0.0)
    // self-contests and nulls are dropped, not counted
    val noisy = Ops.bradleyTerry(
      Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"),
        ("A", "A"), (null, "B")).toDF("w", "l"), "w", "l")
      .orderBy("item").collect()
    assert(noisy.map(r => (r.getAs[String]("item"),
      r.getAs[Double]("score"))).toSeq == Seq(("A", 1.4), ("B", 0.6)),
      noisy.mkString(","))
    assert(CacheProbe.cacheIsEmpty(spark),
      "bradleyTerry left persisted internals in the session cache")
  }

  test("bradleyTerry: every executed MM round stays equi-join shaped") {
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
      val ct = (1 to 200).map(i => (s"s${i % 7}", s"s${(i * 3) % 7}"))
        .toDF("w", "l")
      Ops.bradleyTerry(ct, "w", "l", iters = 4).count()
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        if (plans.size == last) stable += 1 else { last = plans.size; stable = 0 }
      }
    } finally spark.listenerManager.unregister(l)
    assert(plans.size >= 4, s"expected per-round jobs, saw ${plans.size}")
    plans.forEach { p0 =>
      // AQE toString dumps Final AND Initial plans — grade the final
      val p = p0.split("== Initial Plan ==")(0)
      assert(!p.contains("CartesianProduct"), p)
      // tolerated: the single broadcast 1-row normalization join
      assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1, p)
    }
  }

  test("cohenKappa: hand-computed values, degenerate and disjoint raters") {
    import graft.operators.Drift
    // A [x,x,y,y] vs B [x,y,y,y]: po=3/4, marginals (2,2)/(1,3),
    // pe=(2·1+2·3)/16=0.5 -> kappa=(0.75-0.5)/0.5=0.5
    val r = Seq(("x", "x"), ("x", "y"), ("y", "y"), ("y", "y"))
      .toDF("ra", "rb")
    val out = Drift.cohenKappa(r, "ra", "rb").collect().head
    assert(out.getAs[Long]("n") == 4L && out.getAs[Long]("agree") == 3L)
    assert(out.getAs[Double]("po") == 0.75 && out.getAs[Double]("pe") == 0.5)
    assert(out.getAs[Double]("kappa") == 0.5, out.toString)
    // perfect symmetric disagreement -> kappa = -1
    val d = Drift.cohenKappa(
      Seq(("x", "y"), ("y", "x")).toDF("ra", "rb"), "ra", "rb")
      .collect().head
    assert(d.getAs[Double]("kappa") == -1.0, d.toString)
    // both raters constant and equal: pe = 1 -> kappa undefined (NULL)
    val c = Drift.cohenKappa(
      Seq(("x", "x"), ("x", "x")).toDF("ra", "rb"), "ra", "rb")
      .collect().head
    assert(c.isNullAt(c.fieldIndex("kappa")), c.toString)
    // disjoint label sets (full-outer marginals): pe = 0, kappa = po = 0
    val j = Drift.cohenKappa(
      Seq(("x", "z"), ("y", "z")).toDF("ra", "rb"), "ra", "rb")
      .collect().head
    assert(j.getAs[Double]("pe") == 0.0 && j.getAs[Double]("kappa") == 0.0,
      j.toString)
  }

  test("krippendorffAlpha: hand-computed, multi-rater, missing-data, degenerate") {
    import graft.operators.Drift
    // Two complete raters, the kappa fixture above: per-unit matching
    // mass A = 2+0+2+2 = 6, n = 8, marginals (3,5) -> Σn_c² = 34,
    // alpha = 1 − 7·(8−6)/(64−34) = 1 − 14/30 = 0.533333 (kappa gave
    // 0.5 — alpha's small-sample correction).
    val two = Seq(("u1", "x"), ("u1", "x"), ("u2", "x"), ("u2", "y"),
      ("u3", "y"), ("u3", "y"), ("u4", "y"), ("u4", "y"))
      .toDF("u", "v")
    val a2 = Drift.krippendorffAlpha(two, "u", "v").collect().head
    assert(a2.getAs[Long]("n_ratings") == 8L)
    assert(a2.getAs[Double]("alpha") == 0.533333, a2.toString)
    // a unit with ONE rating contributes nothing (missing-data rule)
    val miss = two.union(Seq(("u5", "z")).toDF("u", "v"))
    val am = Drift.krippendorffAlpha(miss, "u", "v").collect().head
    assert(am.getAs[Long]("n_ratings") == 8L &&
      am.getAs[Double]("alpha") == 0.533333, am.toString)
    // three raters, perfect agreement -> 1.0
    val three = Seq(("u1", "x"), ("u1", "x"), ("u1", "x"),
      ("u2", "y"), ("u2", "y"), ("u2", "y")).toDF("u", "v")
    assert(Drift.krippendorffAlpha(three, "u", "v")
      .collect().head.getAs[Double]("alpha") == 1.0)
    // one category everywhere: De = 0 -> NULL
    val const = Seq(("u1", "x"), ("u1", "x"), ("u2", "x"), ("u2", "x"))
      .toDF("u", "v")
    val ac = Drift.krippendorffAlpha(const, "u", "v").collect().head
    assert(ac.isNullAt(ac.fieldIndex("alpha")), ac.toString)
    // grouped keys stay independent
    val g = Seq(("g1", "u1", "x"), ("g1", "u1", "x"),
      ("g1", "u2", "y"), ("g1", "u2", "y"),
      ("g2", "u3", "x"), ("g2", "u3", "y"),
      ("g2", "u4", "y"), ("g2", "u4", "x")).toDF("g", "u", "v")
    val byG = Drift.krippendorffAlpha(g, "u", "v", Seq("g"))
      .collect().map(r => r.getAs[String]("g") ->
        Option(r.get(r.fieldIndex("alpha")))).toMap
    assert(byG("g1").contains(1.0), byG.toString) // perfect per group
    // g2: A=0, n=4, Σn_c²=8 -> 1 − 3·4/8 = −0.5 (systematic disagreement)
    assert(byG("g2").contains(-0.5), byG.toString)
  }

  test("cohenKappa: grouped keys stay independent") {
    import graft.operators.Drift
    val r = Seq(
      ("g1", "x", "x"), ("g1", "y", "y"),          // perfect, pe=0.5 -> 1.0
      ("g2", "x", "y"), ("g2", "y", "x"))          // inverted -> -1.0
      .toDF("g", "ra", "rb")
    val out = Drift.cohenKappa(r, "ra", "rb", Seq("g"))
      .orderBy("g").collect()
    assert(out(0).getAs[Double]("kappa") == 1.0, out(0).toString)
    assert(out(1).getAs[Double]("kappa") == -1.0, out(1).toString)
  }

  test("harmonicCentrality: hand-computed chain + cycle + unreachable") {
    import graft.operators.Ops
    // a->b->c chain, c->a closing a 3-cycle, d->a extra spoke,
    // e isolated on the out side only (x->e gives e in-degree 1),
    // plus a self loop a->a (must not contribute).
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"),
      ("x", "e"), ("a", "a")).toDF("src", "dst")
    val got = Ops.harmonicCentrality(edges, maxHops = 6)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("reached"), r.getAs[Long]("harmonic_e6"))).toMap
    // distances into a: b(2 via c? no: b->c->a = 2), c(1), d(1),
    // x/e unreachable to a. H(a) = 1/1 + 1/1 + 1/2 = 2.5
    assert(got("a") == ((3L, 2500000L)), got.toString)
    // into b: a(1), c(2), d(2) -> 1 + 0.5 + 0.5 = 2.0
    assert(got("b") == ((3L, 2000000L)), got.toString)
    // into c: b(1), a(2), d(3) -> 1 + 0.5 + 1/3(333333) = 1833333
    assert(got("c") == ((3L, 1833333L)), got.toString)
    // into e: x(1) only
    assert(got("e") == ((1L, 1000000L)), got.toString)
    // d and x have no in-paths -> absent
    assert(!got.contains("d") && !got.contains("x"), got.toString)
  }

  test("neighborhoodFunction: distance histogram of the same graph") {
    import graft.operators.Ops
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"),
      ("x", "e"), ("a", "a")).toDF("src", "dst")
    val got = Ops.neighborhoodFunction(edges, maxHops = 6)
      .orderBy("dist").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("cum_pairs"))).toSeq
    // d=1: a→b b→c c→a d→a x→e (5); d=2: a→c b→a c→b d→b (4);
    // d=3: d→c (1); self pairs never appear
    assert(got == Seq((1L, 5L, 5L), (2L, 4L, 9L), (3L, 1L, 10L)), got)
  }

  test("hyperBallCentrality: bit-equal to exact in the sparse range") {
    import graft.operators.Ops
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"),
      ("x", "e"), ("a", "a")).toDF("src", "dst")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getAs[Long]("reached"),
        r.getAs[Long]("harmonic_e6"))).sortBy(_._1).toSeq
    assert(key(Ops.hyperBallCentrality(edges, maxHops = 6)) ==
      key(Ops.harmonicCentrality(edges, maxHops = 6)))
  }

  test("apportionBudget: Hamilton quotas, exact sum, remainder ties") {
    import graft.operators.Ops
    // total 10 over weights 5/3/1/1 (Σ=10): exact quotas 5/3/1/1.
    val even = Ops.apportionBudget(
        Seq(("a", 5L), ("b", 3L), ("c", 1L), ("d", 1L)).toDF("k", "w"),
        "k", "w", total = 10L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("budget")).toMap
    assert(even == Map("a" -> 5L, "b" -> 3L, "c" -> 1L, "d" -> 1L))
    // total 10 over 3/3/3 (Σ=9): quotas 3/3/3 + 1 leftover -> the
    // remainder tie (all rem=3) breaks by key ASC: a gets it.
    val tie = Ops.apportionBudget(
        Seq(("a", 3L), ("b", 3L), ("c", 3L)).toDF("k", "w"),
        "k", "w", total = 10L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("budget")).toMap
    assert(tie == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // classic Hamilton: 7 over 4/3/2 (Σ=9): floors 3/2/1 = 6, one
    // leftover; remainders 1/3/5 -> c's is largest.
    val ham = Ops.apportionBudget(
        Seq(("a", 4L), ("b", 3L), ("c", 2L)).toDF("k", "w"),
        "k", "w", total = 7L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("budget")).toMap
    assert(ham == Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
    // zero-weight key gets 0; Σ stays exact
    val z = Ops.apportionBudget(
        Seq(("a", 0L), ("b", 7L)).toDF("k", "w"), "k", "w", total = 5L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("budget")).toMap
    assert(z == Map("a" -> 0L, "b" -> 5L))
    // degenerate all-zero weights: all budgets 0, no division blowup
    val zz = Ops.apportionBudget(
        Seq(("a", 0L), ("b", 0L)).toDF("k", "w"), "k", "w", total = 5L)
      .collect().map(r => r.getAs[Long]("budget")).toSeq
    assert(zz == Seq(0L, 0L))
  }
}
