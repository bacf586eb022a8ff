package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, Similarity}

class CurationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val evalDoc = "alpha beta gamma delta epsilon zeta eta theta"

  test("decontaminate flags exact train/eval duplicates and honors the threshold") {
    val eval = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val train = Seq(
      (1L, evalDoc), // exact dup: shares all 6 3-shingles
      (2L, "alpha beta gamma nothing else here at all"), // 1 shared shingle
      (3L, "completely different words in this document body")
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval, "doc_id", "text",
      k = 3, minShared = 4L).orderBy("doc_id").collect()
    // doc 3 has zero overlap -> absent; doc 1 contaminated; doc 2 not
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getLong(1) == 6L && out(0).getBoolean(3))
    assert(out(1).getLong(1) == 1L && !out(1).getBoolean(3))
    assert(out(0).getLong(2) == 1L) // one eval doc touched
  }

  test("decontaminate counts distinct eval docs touched") {
    val eval = Seq((100L, evalDoc), (101L, evalDoc)).toDF("doc_id", "text")
    val train = Seq((1L, evalDoc)).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval, "doc_id", "text", 3, 1L)
      .collect()
    assert(out.head.getLong(2) == 2L)
  }

  test("rebalanceSample is deterministic, bounded by fraction 1, and thins big domains") {
    val df = (0L until 400L).map(i => (i, if (i < 320) "big" else "small"))
      .toDF("id", "dom")
    val a = Curation.rebalanceSample(df, "dom", "id", 40L)
    val b = Curation.rebalanceSample(df, "dom", "id", 40L)
    val ra = a.orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ra == b.orderBy("id").collect().map(_.getLong(0)).toSeq)
    val byDom = a.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // big: 320 rows at fraction 40/320 = 0.125 -> expect ~40 (binomial);
    // small: 80 rows at fraction 0.5 -> expect ~40
    assert(byDom("big") > 15 && byDom("big") < 70)
    assert(byDom("small") > 20 && byDom("small") < 60)
    // target >= domain size keeps everything
    val all = Curation.rebalanceSample(df, "dom", "id", 1000L)
    assert(all.count() == 400L)
  }

  test("rebalance operators reject reserved __n/__w/__z column collisions") {
    // a pre-existing __n would make the internal count-join ambiguous —
    // refuse up front rather than resolve wrongly deep in the plan
    val df = Seq((1L, "a", 9L)).toDF("id", "dom", "__n")
    val e = intercept[IllegalArgumentException] {
      Curation.rebalanceSample(df, "dom", "id", 10L)
    }
    assert(e.getMessage.contains("__n"))
    val e2 = intercept[IllegalArgumentException] {
      Curation.temperatureRebalance(
        Seq((1L, "a", 1.0)).toDF("id", "dom", "__z"), "dom", "id", 10L, 0.5)
    }
    assert(e2.getMessage.contains("__z"))
  }

  test("rebalance NULL semantics: null domain/key rows are excluded, not errors") {
    // documented contract (Curation scaladoc): un-attributable rows
    // fall out of the sample silently — pin it so it can't drift
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (None, Some("a")))
      .toDF("id", "dom")
    val out = Curation.rebalanceSample(df, "dom", "id", 100L).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }

  test("boilerplateShare marks duplicated docs as boilerplate, unique docs clean") {
    val dup = "one two three four five six seven eight nine ten"
    val df = Seq((1L, dup), (2L, dup),
      (3L, "eleven twelve thirteen fourteen fifteen sixteen seventeen"))
      .toDF("doc_id", "text")
    val out = Curation.boilerplateShare(df, "doc_id", "text", k = 5,
      minDf = 2L, maxShare = 0.5).orderBy("doc_id").collect()
    assert(out.length == 3)
    // dup docs: every 5-shingle appears in 2 docs -> share 1.0, dropped
    assert(out(0).getDouble(3) == 1.0 && !out(0).getBoolean(4))
    assert(out(1).getDouble(3) == 1.0 && !out(1).getBoolean(4))
    // unique doc: share 0.0, kept
    assert(out(2).getDouble(3) == 0.0 && out(2).getBoolean(4))
  }

  test("rrfFuse sums 1/(k0+rk) across pools, zero for absent ids") {
    val p1 = Seq((10L, 1), (20L, 2)).toDF("id", "rk")
    val p2 = Seq((20L, 1), (30L, 2)).toDF("id", "rk")
    val out = Curation.rrfFuse(Seq(p1, p2), "id").orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(10L) - 1.0 / 61) < 1e-12)
    assert(math.abs(out(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(out(30L) - 1.0 / 62) < 1e-12)
  }

  test("temperatureRebalance: alpha=0 equalizes, alpha=1 keeps proportions") {
    val df = (0L until 500L).map(i => (i, if (i < 400) "big" else "small"))
      .toDF("id", "dom")
    def kept(alpha: Double) = Curation
      .temperatureRebalance(df, "dom", "id", 200L, alpha)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)
    val eq = kept(0.0) // equal shares: ~100 per domain
    assert(eq("big") > 60 && eq("big") < 140, eq.toString)
    assert(eq("small") == 100L, eq.toString) // fraction 1.0: all 100 kept
    val prop = kept(1.0) // natural proportions: ~160 big / ~40 small
    assert(prop("big") > 120 && prop("big") < 200, prop.toString)
    assert(prop("small") > 15 && prop("small") < 65, prop.toString)
    // alpha between: small domain's share strictly grows as alpha drops
    val mid = kept(0.5)
    assert(mid("small") >= prop("small") && mid("small") <= eq("small"),
      s"mid=$mid prop=$prop eq=$eq")
    // determinism
    assert(kept(0.5) == mid)
  }

  test("chunkDocs with stride == size reassembles the token stream exactly") {
    val texts = Seq.tabulate(20)(d =>
      (d.toLong, (1 to (7 + d * 3)).map(i => s"t${d}_$i").mkString(" ")))
    val df = texts.toDF("doc_id", "text")
    val chunks = Curation.chunkDocs(df, "doc_id", "text",
      chunkSize = 8, stride = 8).collect()
    // non-overlapping windows partition the doc: token counts add up
    val got = chunks.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val want = texts.map { case (d, t) => d -> t.split(" ").length.toLong }.toMap
    assert(got == want)
  }

  test("chunkDocs withText emits the exact token window") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val out = Curation.chunkDocs(df, "doc_id", "text", chunkSize = 3,
      stride = 2, withText = true).orderBy("chunk_idx").collect()
    assert(out.map(_.getString(4)).toSeq == Seq("a b c", "c d e", "e"))
    // default stays narrow (no text column)
    assert(!Curation.chunkDocs(df, "doc_id", "text", 3, 2)
      .columns.contains("chunk_text"))
  }

  test("chunkDocs windows overlap correctly and the tail chunk is short") {
    // 10 tokens, size 4, stride 3 -> starts 0,3,6,9 -> lens 4,4,4,1
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.chunkDocs(df, "doc_id", "text", chunkSize = 4,
      stride = 3).orderBy("chunk_idx").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 4L, 4L, 1L))
    // same token window -> same fingerprint; different -> different
    assert(out.map(_.getLong(3)).distinct.length == 4)
    val again = Curation.chunkDocs(df, "doc_id", "text", 4, 3)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getLong(3)).toSeq == again.map(_.getLong(3)).toSeq)
  }

  test("packSequences fills bins contiguously in order within each domain") {
    val df = Seq(
      ("s", 1L, 10L, 600L), ("s", 2L, 9L, 600L), ("s", 3L, 8L, 600L),
      ("s", 4L, 7L, 600L), ("t", 5L, 10L, 100L))
      .toDF("dom", "id", "q", "toks")
    val out = Curation.packSequences(df, "dom",
        Seq(org.apache.spark.sql.functions.col("q").desc,
          org.apache.spark.sql.functions.col("id").asc), "toks", 1000L)
      .orderBy("id").collect()
    // dom s by q desc: ids 1,2,3,4 with cum 600,1200,1800,2400
    // bin = floor((cum-600)/1000) = 0,0,1,1
    assert(out.map(r => (r.getLong(1), r.getLong(4))).toSeq ==
      Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 0L)))
  }

  test("hardNegatives returns only different-label neighbors, most similar first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), // anchor, label 0
      (1L, Array(0.99f, 0.1f), 0), // same label: excluded even though closest
      (2L, Array(0.9f, 0.4f), 1), // hard negative (most similar, label 1)
      (3L, Array(0.0f, 1.0f), 1), // easy negative
      (4L, Array(-1.0f, 0.0f), 2) // opposite
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", "label", k = 2).orderBy("rk").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 3L))
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2))
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  test("redactPii scrubs all four categories and counts on the raw text") {
    val df = Seq(
      ("write bob.smith+x@corp.example.org from 192.168.1.77, " +
        "ssn 123-45-6789, call 415-555-0199 or 415.555.0200", 1L),
      ("no pii here at all", 2L)).toDF("text", "id")
    val out = Curation.redactPii(df, "text").orderBy("id")
      .select($"text", $"n_email", $"n_ipv4", $"n_ssn", $"n_phone")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out(0)._1 ==
      "write <EMAIL> from <IP>, ssn <SSN>, call <PHONE> or <PHONE>")
    assert((out(0)._2, out(0)._3, out(0)._4, out(0)._5) == ((1L, 1L, 1L, 2L)))
    assert(out(1) == (("no pii here at all", 0L, 0L, 0L, 0L)))
    // version-like dotted quads inside words stay intact (\b guards)
    val v = Curation.redactPii(Seq(("v1.2.3.4beta", 3L)).toDF("text", "id"), "text")
      .select($"text").as[String].head()
    assert(v == "v1.2.3.4beta")
  }

  test("segmentDedup: first global occurrence survives, docs rebuild in order") {
    // 4-token segments; doc 1 repeats its own first segment, doc 2
    // copies doc 1's opener and adds fresh text, doc 3 is untouched.
    val a = "a b c d"        // the shared segment
    val x = "x y z w"
    val fresh = "p q r s"
    val docs = Seq(
      (1L, s"$a $x $a"),     // segs: [a b c d][x y z w][a b c d] -> 3rd drops
      (2L, s"$a $fresh"),    // opener already seen in doc 1 -> drops
      (3L, "m n o p")).toDF("doc_id", "text")
    val out = Curation.segmentDedup(docs, "doc_id", "text", segTokens = 4)
      .orderBy("id")
      .select($"id", $"n_segs", $"n_kept", $"retained")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 3L, 2L, s"$a $x")))
    assert(out(1) == ((2L, 2L, 1L, fresh)))
    assert(out(2) == ((3L, 1L, 1L, "m n o p")))
  }

  test("segmentDedup: short tails dedup too; all-dup doc retains empty text") {
    val docs = Seq(
      (1L, "a b c d e"),  // segs [a b c d][e]
      (2L, "e"),          // tail seg of doc 1 -> drops
      (3L, "a b c d")).toDF("doc_id", "text") // full first seg -> drops
    val out = Curation.segmentDedup(docs, "doc_id", "text", segTokens = 4)
      .orderBy("id")
      .select($"id", $"n_segs", $"n_kept", $"retained")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 2L, "a b c d e")))
    assert(out(1) == ((2L, 1L, 0L, "")))
    assert(out(2) == ((3L, 1L, 0L, "")))
  }

  test("EXACTSUBSTR hash-agg first occurrence is bit-equal to the window form") {
    // VERDICT r14 #1 pin: the hub-safe aggregate+join rewrite must
    // reproduce the rank-window semantics EXACTLY — rk > 1 under
    // orderBy(id, seg_idx) ⟺ not the class-min struct in a class of
    // 2+, and min(id)-over-class owner ⟺ the class-min struct's id.
    // Checked over the real sf0.001 documents corpus for all three
    // family members, with the pre-r15 window forms built inline.
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, sf, "documents")

    // -- segmentDedup vs its window form (20-token windows) --
    val toks = split($"text", " ")
    val nseg1 = ceil(size(toks).cast("double") / 20).cast("int")
    val segArr = transform(sequence(lit(0), greatest(nseg1 - 1, lit(0))),
      i => array_join(slice(toks, i * 20 + 1, lit(20)), " "))
    val segs1 = docs.select($"doc_id".as("id"),
      posexplode(segArr).as(Seq("seg_idx", "seg")))
    val w1 = Window.partitionBy(md5($"seg")).orderBy($"id", $"seg_idx")
    val dedupRef = segs1.withColumn("keep", row_number().over(w1) === 1)
      .groupBy($"id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(filter(
            array_sort(collect_list(struct($"seg_idx", $"keep", $"seg"))),
            x => x.getField("keep")), x => x.getField("seg")), " ")
          .as("retained"))
      .orderBy($"id").collect().toSeq
    val dedupGot = Curation.segmentDedup(docs, "doc_id", "text", 20)
      .orderBy($"id").collect().toSeq
    assert(dedupGot == dedupRef)

    // -- multi-granularity seg relation + window-form dups (shared
    //    reference for spans and owners) --
    val grans = Seq(100, 50, 20)
    val base = docs.select($"doc_id".as("id"), toks.as("__t"),
      size(toks).as("n_tokens"))
    val segsG = grans.map { g =>
      val nseg = ceil($"n_tokens".cast("double") / g).cast("int")
      base.select($"id", $"n_tokens", lit(g).as("g"),
          posexplode(transform(sequence(lit(0), greatest(nseg - 1, lit(0))),
            i => array_join(slice($"__t", i * g + 1, lit(g)), " ")))
            .as(Seq("seg_idx", "seg")))
        .select($"id", $"g", $"seg_idx", $"seg",
          ($"seg_idx" * g).as("start"),
          least($"seg_idx" * g + g, $"n_tokens").as("end"))
    }.reduce(_.unionByName(_))
    val wOrd = Window.partitionBy($"g", md5($"seg")).orderBy($"id", $"seg_idx")
    val wAll = Window.partitionBy($"g", md5($"seg"))
    val dupRef = segsG.withColumn("rk", row_number().over(wOrd))
      .withColumn("owner", min($"id").over(wAll))
      .filter($"rk" > 1)
      .select($"id", $"start", $"end", $"owner")
      .orderBy($"id", $"start", $"end", $"owner").collect().toSeq

    // owners output is span-merged; compare the merged outputs
    val ownGot = Curation.segmentDedupSpanOwners(docs, "doc_id", "text", grans)
      .orderBy($"id", $"start").collect().toSeq
    // replay the island merge over the window-form dup rows
    val wDoc = Window.partitionBy($"id").orderBy($"start", $"end".desc)
    val wPrev = wDoc.rowsBetween(Window.unboundedPreceding, -1)
    val dupRefDf = dupRef
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toDF("id", "start", "end", "owner")
    val ownRef = dupRefDf
      .withColumn("__maxEnd", max($"end").over(wPrev))
      .withColumn("__new",
        when($"__maxEnd".isNull || $"start" > $"__maxEnd", 1L).otherwise(0L))
      .withColumn("__isl", sum($"__new").over(wDoc))
      .groupBy($"id", $"__isl")
      .agg(min($"start").as("start"), max($"end").as("end"),
        min($"owner").as("owner"))
      .select($"id", $"start", $"end", $"owner")
      .orderBy($"id", $"start").collect().toSeq
    assert(ownGot == ownRef)
    assert(ownGot.nonEmpty, "fixture corpus has no cross-doc dups — pin is vacuous")

    // spans: per-doc rollup of the same merged islands
    val spanGot = Curation.segmentDedupSpans(docs, "doc_id", "text", grans)
      .select($"id", $"n_tokens", $"dup_tokens", $"n_spans")
      .orderBy($"id").collect().toSeq
    val perDocRef = ownRef.groupBy(_.getLong(0)).map { case (id, rows) =>
      id -> ((rows.map(r => r.getAs[Int]("end").toLong - r.getAs[Int]("start")).sum,
        rows.size.toLong))
    }
    spanGot.foreach { r =>
      val (dt, ns) = perDocRef.getOrElse(r.getLong(0), (0L, 0L))
      assert(r.getLong(2) == dt && r.getLong(3) == ns, r.toString)
    }
  }

  test("urlNormalize: hostile-URL corpus hits every rule") {
    val cases = Seq(
      // scheme/authority case, default https port, tracking strip,
      // param sort, fragment strip — path case preserved
      ("HTTPS://User@WWW.Ex.COM:443/A/B?b=2&utm_source=x&a=1#frag",
        "https://user@www.ex.com/A/B?a=1&b=2"),
      ("http://EXAMPLE.com:80", "http://example.com/"), // empty path -> '/'
      ("http://example.com:8080/x", "http://example.com:8080/x"), // port kept
      ("http://example.com./x", "http://example.com/x"), // trailing host dot
      ("http://a.b/p?utm_campaign=c&gclid=1", "http://a.b/p"), // '?' dropped
      // unreserved decodes (both hex cases); reserved %2F stays
      ("http://a.b/%7Euser/%6F%6e?x=%41%2Fy", "http://a.b/~user/on?x=A%2Fy"),
      ("http://a.b/p%23q#real", "http://a.b/p%23q"), // %23 NOT decoded
      ("http://a.b/p?", "http://a.b/p"),              // bare '?' dropped
      ("  not a url %41 #x", "not a url A "),         // graceful degradation
      ("mailto:x@y.z", "mailto:x@y.z"))               // no '://' -> untouched
    val df = cases.zipWithIndex.map { case ((in, _), i) => (i, in) }
      .toDF("i", "u")
    val got = df.select($"i", Curation.urlNormalize($"u").as("n"))
      .orderBy($"i").as[(Int, String)].collect().map(_._2).toSeq
    val bad = got.zip(cases).collect {
      case (g, (in, want)) if g != want => s"$in -> $g (want $want)" }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("segmentDedupSpans: a planted 400-token block collapses to ONE span") {
    // VERDICT r12 #5: doc 2 duplicates doc 1's 400-token block — at
    // 100/50/20 granularity every covering window is a dup and the
    // ranges merge into a single [0,400) span; doc 3 duplicates only a
    // 20-token aligned slice, which ONLY the finest granularity sees.
    val block = (1 to 400).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, block),                                          // first occurrence
      (2L, block + " " + (1 to 57).map(i => s"t$i").mkString(" ")),
      (3L, (1 to 20).map(i => s"c$i").mkString(" ") + " " +
        (1 to 20).map(i => s"b$i").mkString(" ")))          // b1..b20 at offset 20
      .toDF("doc_id", "text")
    val out = Curation.segmentDedupSpans(docs, "doc_id", "text",
        grans = Seq(100, 50, 20))
      .orderBy("id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 400L, 0L, 0L),    // first occurrence keeps everything
      (2L, 457L, 400L, 1L),  // the whole block is ONE merged span
      (3L, 40L, 20L, 1L)),   // fine-granularity-only dup still caught
      out.toString)
  }

  test("anchoredDedupSpans catches a SHIFTED copy the aligned windows miss") {
    // VERDICT r14 #2. Doc 2 copies doc 1's 80-token block at token
    // offset 3 — not a multiple of any aligned granularity, so every
    // aligned window in doc 2 mixes junk and block text and none
    // collides. Content-defined anchors derive from the tokens
    // themselves, so the block's interior segments are identical
    // strings in both docs.
    val block = (1 to 80).map(i => s"blk$i").mkString(" ")
    val docs = Seq(
      (1L, block),
      (2L, "jA jB jC " + block)).toDF("doc_id", "text")
    val aligned = Curation.segmentDedupSpans(docs, "doc_id", "text",
        grans = Seq(20))
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(aligned == Seq((1L, 80L, 0L, 0L), (2L, 83L, 0L, 0L)),
      s"aligned unexpectedly caught the shifted copy: $aligned")
    val anchored = Curation.anchoredDedupSpans(docs, "doc_id", "text",
        anchorMod = 4, minTok = 3)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    val d2 = anchored(1)
    assert(anchored.head == ((1L, 80L, 0L, 0L)), anchored.toString)
    // interior coverage: most of the 80 copied tokens flagged (edge
    // segments at the copy boundary legitimately miss)
    assert(d2._1 == 2L && d2._3 >= 50L && d2._3 <= 80L && d2._4 >= 1L,
      anchored.toString)
  }

  test("anchoredDedupSpans: offset invariance and the minTok floor") {
    // the same block at three different unaligned offsets all report
    // near-identical interior coverage; a tiny common phrase below
    // minTok never fires
    val block = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, block),
      (2L, "x1 " + block),
      (3L, "y1 y2 y3 y4 y5 " + block),
      (4L, "the of and")) // 3 tokens, all below any segment floor
      .toDF("doc_id", "text")
    val out = Curation.anchoredDedupSpans(docs, "doc_id", "text",
        anchorMod = 4, minTok = 3)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    val cov2 = out(1)._3; val cov3 = out(2)._3
    assert(out(0)._3 == 0L, out.toString)      // first occurrence clean
    assert(cov2 >= 40L && cov3 >= 40L, out.toString)
    assert(cov2 == cov3, s"offset changed interior coverage: $out")
    assert(out(3)._3 == 0L, out.toString)
  }

  test("segmentDedupSpanOwners: a three-doc copy chain attributes to the head") {
    // VERDICT r13 #6. Doc 1 originates block B; docs 2 and 3 both
    // carry it — BOTH must attribute to doc 1 (not doc 3 to doc 2,
    // even though 2 also precedes 3: the owner is the global first
    // occurrence). Doc 2 also originates its own tail T, which doc 3
    // copies — that span attributes to doc 2. So doc 3 carries TWO
    // spans with DIFFERENT owners.
    // Alignment matters: segment windows are ALIGNED (seg_idx·g), so
    // doc 3 carries a 100-token unique filler between the two copied
    // blocks — T lands at offset 200 (a multiple of every
    // granularity) and the filler keeps the two spans from merging.
    val b = (1 to 100).map(i => s"b$i").mkString(" ")
    val t = (1 to 100).map(i => s"t$i").mkString(" ")
    val f = (1 to 100).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, b),                         // owns B
      (2L, b + " " + t),               // copies B at [0,100), owns T
      (3L, b + " " + f + " " + t))     // copies B from 1, T from 2
      .toDF("doc_id", "text")
    val out = Curation.segmentDedupSpanOwners(docs, "doc_id", "text",
        grans = Seq(100, 50, 20))
      .orderBy("id", "start")
      .as[(Long, Int, Int, Long)].collect().toSeq
    assert(out == Seq(
      (2L, 0, 100, 1L),    // doc 2's B span -> owner 1
      (3L, 0, 100, 1L),    // doc 3's B span -> owner 1 (chain head)
      (3L, 200, 300, 2L)), // doc 3's T span -> owner 2
      out.toString)
  }

  test("bm25TopK: self-retrieval at rank 1, shared terms rank by idf weight") {
    // doc 1 is the query source; doc 2 shares the rare term, doc 3
    // only the common one, doc 4 nothing. Expected order 1, 2, 3.
    val docs = Seq(
      (1L, "zebra common alpha beta gamma"),
      (2L, "zebra other words here now"),
      (3L, "common filler filler filler filler"),
      (4L, "totally unrelated text body four"))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "zebra common")).toDF("query_id", "qtext")
    val out = Curation.bm25TopK(docs, "doc_id", "text", qs,
        "query_id", "qtext", k = 3)
      .select($"query_id", $"rk", $"doc_id")
      .as[(Long, Int, Long)].collect().toSeq.sorted
    assert(out == Seq((1L, 1, 1L), (1L, 2, 2L), (1L, 3, 3L)), out.toString)
  }

  test("bm25TopK: the maxDfFrac stopword cut drops ubiquitous terms") {
    // 'the' is in all 4 docs (df = N > 0.5N -> cut); only 'rare'
    // should contribute, so doc 3 (no 'rare') never appears.
    val docs = Seq(
      (1L, "the rare one"), (2L, "the rare two"),
      (3L, "the common three"), (4L, "the common four"))
      .toDF("doc_id", "text")
    val qs = Seq((9L, "the rare")).toDF("query_id", "qtext")
    val got = Curation.bm25TopK(docs, "doc_id", "text", qs,
        "query_id", "qtext", k = 4)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L), got.toString)
  }

  test("bm25TopK: the shuffle-join fallback is bit-equal to the broadcast path") {
    // VERDICT r14 #4: above broadcastQueryLimit the query side joins
    // the postings via a plain shuffle equi-join instead of a
    // broadcast. Same join, different physical strategy — every
    // (qid, rk, doc, score) row must be identical. Real sf0.001
    // corpus, queries derived from its own docs so matches are dense.
    val docs = Tables(spark, sf, "documents")
    val qs = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id".as("query_id"),
        array_join(slice(split($"text", " "), 1, 5), " ").as("qtext"))
    val broad = Curation.bm25TopK(docs, "doc_id", "text", qs,
        "query_id", "qtext", k = 5, maxDfFrac = 1.0)
      .orderBy($"query_id", $"rk").collect().toSeq
    val shuffled = Curation.bm25TopK(docs, "doc_id", "text", qs,
        "query_id", "qtext", k = 5, maxDfFrac = 1.0,
        broadcastQueryLimit = 0L)
      .orderBy($"query_id", $"rk").collect().toSeq
    assert(broad.nonEmpty && broad == shuffled)
  }

  test("robotsFilter: the shuffle-join fallback is bit-equal to the broadcast path") {
    // VERDICT r17 #1 (the bm25TopK precedent): above broadcastRuleLimit
    // the rule table reaches the URL stream via a host-keyed shuffle
    // equi-join instead of a broadcast. Same join + argmin, different
    // physical strategy — every (id, host, path, allowed, rule,
    // directive) row must be identical on both paths.
    val robots = Seq(
      ("a.example", "User-agent: graftbot\nDisallow: /private/*\n" +
        "Allow: /private/*/pub$\nDisallow: /d_e/\n\nUser-agent: *\n" +
        "Disallow: /\n"),
      ("b.example", "User-agent: *\nDisallow: /star/\n"))
      .toDF("host", "robots_txt")
    val rules = Curation.robotsRules(robots, "host", "robots_txt",
      "GraftBot")
    val urls = Seq(
      (1L, "a.example", "/private/en"), (2L, "a.example", "/private/en/pub"),
      (3L, "a.example", "/d_e/x"), (4L, "a.example", "/dxe/x"),
      (5L, "b.example", "/star/s"), (6L, "b.example", "/open"),
      (7L, "c.example", "/norules"))
      .toDF("id", "host", "path")
    val broad = Curation.robotsFilter(urls, "id", "host", "path", rules)
      .orderBy("id").collect().toSeq
    val shuffled = Curation.robotsFilter(urls, "id", "host", "path", rules,
        broadcastRuleLimit = 0L)
      .orderBy("id").collect().toSeq
    assert(broad.nonEmpty && broad == shuffled)
    // and the verdicts themselves are the RFC ones
    val allowed = broad.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(allowed == Map(1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> false, 6L -> true, 7L -> true))
  }

  test("robots parse: two bodies for one host are numbered independently (ADVICE r17)") {
    // A host carrying TWO robots bodies (a re-fetch flowing through
    // the robotsfilter pipeline module): before the (host, body)
    // window key, both files' line numbers interleaved in one
    // host-partitioned window and the User-agent group runs silently
    // misattributed rules across bodies. Each body must parse as an
    // independent file — body A's exact-graftbot group suppresses
    // only A's own star group, body B falls back to ITS star group —
    // and the chosen rules union.
    val robots = Seq(
      ("h.example", "User-agent: graftbot\nDisallow: /a\n\n" +
        "User-agent: *\nDisallow: /suppressed\n"),
      ("h.example", "User-agent: *\nDisallow: /b\n"))
      .toDF("host", "robots_txt")
    val rules = Curation.robotsRules(robots, "host", "robots_txt",
        "graftbot")
      .select($"directive", $"pattern").as[(String, String)]
      .collect().toSet
    assert(rules == Set(("disallow", "/a"), ("disallow", "/b")), rules)
    // exact duplicate (host, body) rows collapse to ONE parse: no
    // duplicated rule rows, no interleaved line numbers
    val dup = Seq(
      ("h.example", "User-agent: *\nDisallow: /x\nAllow: /x/ok\n"),
      ("h.example", "User-agent: *\nDisallow: /x\nAllow: /x/ok\n"))
      .toDF("host", "robots_txt")
    val dupRules = Curation.robotsRules(dup, "host", "robots_txt", "any")
      .select($"directive", $"pattern").as[(String, String)]
      .collect().toSeq.sorted
    assert(dupRules == Seq(("allow", "/x/ok"), ("disallow", "/x")), dupRules)
  }

  test("crawlSchedule: integer slots, politeness default, zero-delay clamp") {
    val frontier = Seq(("a.x", 100L), ("b.x", 50L), ("c.x", 10L))
      .toDF("host", "r_e10")
    val delays = Seq(("a.x", 2.0), ("c.x", 0.0), ("zz.x", 9.0))
      .toDF("host", "crawl_delay") // zz.x not on the frontier -> no rows
    val out = Curation.crawlSchedule(frontier, "host", "r_e10",
        delays, "crawl_delay", horizonMs = 6000L, defaultDelayMs = 3000L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byHost = out.groupBy(_._1)
    // a: 2 s -> 2000 ms -> slots 0..3; b: no declared delay -> default
    // 3000 -> slots 0..2; c: 0 s clamps to 1 ms -> 6001 slots
    assert(byHost.keySet == Set("a.x", "b.x", "c.x"))
    assert(byHost("a.x").length == 4 && byHost("a.x").forall(_._2 == 2000L))
    assert(byHost("b.x").length == 3 && byHost("b.x").forall(_._2 == 3000L))
    assert(byHost("c.x").length == 6001 && byHost("c.x").forall(_._2 == 1L))
    // slot times are exact products, horizon inclusive
    assert(out.forall { case (_, d, s, t) => t == s * d && t <= 6000L })
    assert(byHost("a.x").map(_._4).sorted.toSeq == Seq(0L, 2000L, 4000L, 6000L))
  }

  test("changeRate: planted fast/slow/static URLs order as the estimator predicts") {
    // VERDICT r18 next #2: per-urlkey digest changes over intervals.
    // fast changes every capture (2/2), slow once (1/2), static never
    // (0/2); a single-capture URL has no interval and rate 0; capture
    // ARRIVAL ORDER must not matter (the sorted-sequence contract).
    val cdx = Seq(
      ("fast)/a", "20260301000000", "d3"),   // deliberately unsorted
      ("fast)/a", "20260101000000", "d1"),
      ("fast)/a", "20260201000000", "d2"),
      ("slow)/b", "20260101000000", "e1"),
      ("slow)/b", "20260201000000", "e2"),
      ("slow)/b", "20260301000000", "e2"),
      ("static)/c", "20260101000000", "f1"),
      ("static)/c", "20260201000000", "f1"),
      ("static)/c", "20260301000000", "f1"),
      ("once)/d", "20260101000000", "g1"))
      .toDF("urlkey", "ts14", "digest")
    val got = Curation.changeRate(cdx).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      "fast)/a" -> ((3L, 2L, 2L, 1000000L)),
      "slow)/b" -> ((3L, 1L, 2L, 500000L)),
      "static)/c" -> ((3L, 0L, 2L, 0L)),
      "once)/d" -> ((1L, 0L, 0L, 0L))), got.toString)
    // the schedule composition: priority = rank · (10⁶ + rate_e6) —
    // equal-rank hosts order fast > slow > static under the exact
    // integer cross-multiply
    val pri = got.view.mapValues { case (_, _, _, rate) =>
      10000L * (1000000L + rate) }.toMap
    assert(pri("fast)/a") > pri("slow)/b") &&
      pri("slow)/b") > pri("static)/c"), pri.toString)
  }

  test("sitemapEntries: freshness fields, tolerance, and block kinds") {
    // VERDICT r18 missing #3: lastmod/changefreq/priority per block;
    // absent fields null, junk priority nulled, loc-less blocks
    // dropped, UPPER changefreq lowered, whitespace-tolerant loc,
    // <sitemap> blocks in an index body.
    val xml = Seq(
      ("h1", "<urlset>" +
        "<url><loc> https://h1/a </loc><lastmod>2026-01-02</lastmod>" +
        "<changefreq>DAILY</changefreq><priority>0.8</priority></url>" +
        "<url><loc>https://h1/b</loc></url>" +
        "<url><lastmod>2026-02-02</lastmod></url>" +
        "<url><loc>https://h1/c</loc><priority>junk</priority></url>" +
        "</urlset>"),
      ("h2", "<sitemapindex><sitemap><loc>https://h2/sm.xml</loc>" +
        "<lastmod>2026-03-03</lastmod></sitemap></sitemapindex>"))
      .toDF("host", "xml")
    val got = Curation.sitemapEntries(xml, "host", "xml").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSet
    assert(got == Set(
      ("h1", "urlset", "https://h1/a", Some("2026-01-02"), Some("daily"),
        Some(0.8)),
      ("h1", "urlset", "https://h1/b", None, None, None),
      ("h1", "urlset", "https://h1/c", None, None, None),
      ("h2", "index", "https://h2/sm.xml", Some("2026-03-03"), None,
        None)), got.toString)
  }

  test("LM family ngramMode=char: classifies unsegmented text the word path drops") {
    // VERDICT r14 #5. The q236 fixture: spaces stripped from the real
    // sf0.001 corpus, half the docs reversed → two "languages" with
    // distinct adjacent-char statistics and NO whitespace anywhere.
    val stripped = regexp_replace($"text", " ", "")
    val unseg = Tables(spark, sf, "documents").select($"doc_id",
      when($"doc_id" % 2 === 0, "aa").otherwise("bb").as("lang"),
      when($"doc_id" % 2 === 0, stripped).otherwise(reverse(stripped))
        .as("text"))
    // word mode: every doc is ONE token -> the n >= 2 bigram filter
    // drops everything — this IS the silent degeneracy being fixed
    val word = Curation.bigramLangId(unseg, "lang", unseg, "doc_id",
      "text", k = 0.5, ngramMode = "word")
    assert(word.count() == 0L)
    // char mode discriminates: >= 90% of docs classified correctly
    val char = Curation.bigramLangId(unseg, "lang", unseg, "doc_id",
        "text", k = 0.5, ngramMode = "char")
      .join(unseg.select($"doc_id", $"lang"), "doc_id")
    val n = char.count()
    val right = char.filter($"pred" === $"lang").count()
    assert(n > 0 && right.toDouble / n >= 0.9, s"$right/$n")
    // the filter twin: reversed text is out-of-domain for a forward-
    // trained char LM — strictly higher cross-entropy on average
    val fwd = unseg.filter($"lang" === "aa")
    val xent = Curation.bigramCrossEntropy(fwd, unseg, "doc_id", "text",
        k = 0.5, ngramMode = "char")
      .join(unseg.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang").agg(avg($"xent").as("ax"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(xent("aa") < xent("bb"), xent.toString)
  }

  test("LM char mode tokenizes by codepoint, not UTF-16 unit (non-BMP safe)") {
    // ADVICE r15: split("") cuts code units, so any non-BMP char
    // (emoji, CJK Ext B — realistic in the zh/ja text char mode
    // targets) became two lone surrogates. "a😀b" = 3 codepoints →
    // exactly 2 char bigrams; unit splitting would yield 3.
    val doc = Seq((1L, "a😀b")).toDF("doc_id", "text")
    val r = Curation.bigramCrossEntropy(doc, doc, "doc_id", "text",
      k = 0.5, ngramMode = "char").collect()
    assert(r.length == 1 && r(0).getAs[Long]("n_bigrams") == 2L,
      r.toSeq.toString)
    // Distinct non-BMP chars must stay distinct: lone-surrogate halves
    // encode to identical UTF-8 replacement bytes, so U+1F600 and
    // U+1F601 would collide and the out-of-domain doc would score
    // in-domain.
    val tr = Seq((1L, "😀a😀a😀"))
      .toDF("doc_id", "text")
    val te = Seq((1L, "😀a😀a"),
        (2L, "😁a😁a"))
      .toDF("doc_id", "text")
    val x = Curation.bigramCrossEntropy(tr, te, "doc_id", "text",
        k = 0.5, ngramMode = "char")
      .collect().map(row => row.getLong(0) -> row.getAs[Double]("xent")).toMap
    assert(x(1L) < x(2L), s"out-of-domain non-BMP must score higher: $x")
  }

  test("bigramCrossEntropy: in-domain text scores lower than gibberish") {
    val train = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "the cat ran to the dog"))
      .toDF("doc_id", "text")
    val score = Seq(
      (10L, "the cat sat on the rug"),   // all bigrams seen or near
      (11L, "zx qv wk jn pf lm"))        // entirely out of vocabulary
      .toDF("doc_id", "text")
    val out = Curation.bigramCrossEntropy(train, score, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._2) == Seq(5L, 5L), out.toString) // n-1 bigrams each
    assert(out(0)._3 < out(1)._3,
      s"in-domain should beat gibberish: $out")
    // unseen everything degrades to exactly ln(V) per bigram (B=0,
    // U=0 -> -ln(k/(kV)) = ln V); train vocab = 9 distinct words
    assert(math.abs(out(1)._3 - math.log(9.0)) < 1e-6, out.toString)
  }

  test("kneserNeyCrossEntropy: hand-traced probability on a tiny corpus") {
    // train "a b a b a c": btab {ab:2, ba:2, ac:1}; ctx a:(c1=3,nf=2),
    // b:(c1=2,nf=1); cont {a:1, b:1, c:1}; nt=3 types, vc=3.
    // pc(b) = (1+0.5)/(3+0.5·4) = 0.3
    // P(b|a) = (2−0.75)/3 + 0.75·2/3·0.3 = 0.56666…
    val train = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val score = Seq((10L, "a b")).toDF("doc_id", "text")
    val out = Curation.kneserNeyCrossEntropy(train, score, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq
    val want = -math.log(1.25 / 3.0 + 0.75 * 2.0 / 3.0 * 0.3)
    assert(out.size == 1 && out.head._2 == 1L, out.toString)
    assert(math.abs(out.head._3 - want) < 1e-6,
      s"got ${out.head._3}, want $want")
  }

  test("kneserNeyCrossEntropy: seen-context mass sums below one, OOV finite") {
    val train = Seq((1L, "a b a b a c b a")).toDF("doc_id", "text")
    // every (context, word) pair over the training vocabulary: total
    // P(w|ctx) over seen w plus the discount leak must stay <= 1
    val vocab = Seq("a", "b", "c")
    val probes = for {
      (c, i) <- vocab.zipWithIndex; (w, j) <- vocab.zipWithIndex
    } yield ((i * 3 + j).toLong, s"$c $w")
    val out = Curation.kneserNeyCrossEntropy(
        train, probes.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, math.exp(-r._3))).toMap
    for ((c, i) <- vocab.zipWithIndex) {
      val tot = vocab.indices.map(j => out((i * 3 + j).toLong)).sum
      assert(tot > 0 && tot <= 1.0 + 1e-9, s"context $c sums to $tot")
    }
    // fully OOV bigram: pure smoothed continuation -> finite positive
    val oov = Curation.kneserNeyCrossEntropy(train,
        Seq((99L, "zz qq")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().head
    assert(oov._3 > 0 && !oov._3.isInfinite, oov.toString)
  }

  test("kneserNeyCrossEntropy: in-domain beats gibberish, char mode works") {
    val train = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "the cat sat on the rug"),
      (11L, "zx qv wk jn pf lm")).toDF("doc_id", "text")
    val out = Curation.kneserNeyCrossEntropy(train, score, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(out(0)._3 < out(1)._3, s"in-domain should beat gibberish: $out")
    val ch = Curation.kneserNeyCrossEntropy(train, score, "doc_id", "text",
        ngramMode = "char")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(ch(0)._3 < ch(1)._3, s"char mode: $ch")
  }

  test("bigramLangId: separable labels classify correctly, ties go to label order") {
    val train = Seq(
      ("aa", 1L, "x y x y x y"),
      ("aa", 2L, "y x y x"),
      ("bb", 3L, "p q p q p q"),
      ("bb", 4L, "q p q p"))
      .toDF("lang", "doc_id", "text")
    val score = Seq(
      (10L, "x y x"),   // clearly aa
      (11L, "p q p"),   // clearly bb
      (12L, "m n m"))   // out of BOTH vocabularies -> per-bigram
                        // ln(k/(kV)) with V=2 both sides: exact tie ->
                        // label order -> aa
      .toDF("doc_id", "text")
    val out = graft.operators.Curation.bigramLangId(
        train.select($"lang", $"text"), "lang",
        score, "doc_id", "text")
      .orderBy("doc_id")
      .select($"doc_id", $"pred").as[(Long, String)].collect().toSeq
    assert(out == Seq((10L, "aa"), (11L, "bb"), (12L, "aa")), out.toString)
  }

  test("dsirLogWeights: target-like raw docs weigh above alien raw docs") {
    // target vocabulary {x y}; raw doc 10 mimics it, raw doc 11 is
    // from a disjoint vocabulary -> logw(10) > 0 > logw(11)
    val docs = Seq(
      (1L, "tgt", "x y x y x y x y"),
      (2L, "tgt", "y x y x y x"),
      (10L, "raw", "x y x y x"),
      (11L, "raw", "p q r s t u"))
      .toDF("doc_id", "source", "text")
    val w = Curation.dsirLogWeights(docs, "doc_id", "text",
        col("source") === "tgt", buckets = 64)
      .orderBy("doc_id")
      .select($"doc_id", $"n_feat", $"logw".cast("double"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(w.map(_._1) == Seq(10L, 11L), w.toString) // target docs absent
    assert(w(0)._2 == 4L && w(1)._2 == 5L, w.toString) // n-1 bigrams
    assert(w(0)._3 > 0 && w(1)._3 < 0,
      s"mimic should be positive, alien negative: $w")
  }

  test("dsirSelect: k rows ranked by descending perturbed score, exact k") {
    val docs = Seq(
      (1L, "tgt", "x y x y x y"),
      (10L, "raw", "x y x y"), (11L, "raw", "p q r s"),
      (12L, "raw", "x y x"), (13L, "raw", "m n o p"))
      .toDF("doc_id", "source", "text")
    val out = Curation.dsirSelect(docs, "doc_id", "text",
        col("source") === "tgt", k = 3, buckets = 64)
      .orderBy("rk")
      .select($"rk", $"doc_id", $"score".cast("double"))
      .as[(Int, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1, 2, 3), out.toString)
    assert(out.map(_._3) == out.map(_._3).sorted.reverse, out.toString)
    assert(out.map(_._2).distinct.size == 3, out.toString)
  }

  test("mooreLewisScore: target-like docs score above pool-like docs") {
    // target vocabulary {x y}; the pool adds {p q}. A doc in target
    // vocab must get a higher mls (= xent_raw - xent_target) than a
    // doc in pool-only vocab.
    val target = Seq((1L, "x y x y x y"), (2L, "y x y x")).toDF("doc_id", "text")
    val pool = target.union(
      Seq((3L, "p q p q p q"), (4L, "q p q p")).toDF("doc_id", "text"))
    val score = Seq((10L, "x y x y"), (11L, "p q p q")).toDF("doc_id", "text")
    val out = Curation.mooreLewisScore(target, pool, score, "doc_id", "text")
      .orderBy("doc_id")
      .select($"doc_id", $"mls").as[(Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(10L, 11L), out.toString)
    assert(out(0)._2 > out(1)._2,
      s"target-like must outrank pool-like: $out")
    assert(out(0)._2 > 0 && out(1)._2 < 0, out.toString)
  }

  test("perplexityBuckets: tertiles split per language, ordered by xent") {
    // lang A: three docs with increasing out-of-model content; lang B
    // has its own model so A's gibberish doesn't pollute its buckets
    val docs = Seq(
      (1L, "A", "x y x y x y x y x y"),
      (2L, "A", "x y x y q q x y x y"),
      (3L, "A", "q w e r t z u i o p"),
      (4L, "B", "p p p p p p p p"),
      (5L, "B", "p p k k p p p p"),
      (6L, "B", "k j h g f d s a"))
      .toDF("doc_id", "lang", "text")
    val out = Curation.perplexityBuckets(docs, "lang", docs,
        "doc_id", "lang", "text")
      .orderBy("doc_id")
      .select($"doc_id", $"lang", $"xent", $"ppl_bucket")
      .as[(Long, String, Double, String)].collect().toSeq
    assert(out.size == 6, out.toString)
    // per lang: one head, one middle, one tail, aligned with xent order
    for (lang <- Seq("A", "B")) {
      val g = out.filter(_._2 == lang).sortBy(_._3)
      assert(g.map(_._4) == Seq("head", "middle", "tail"),
        s"$lang buckets: $g")
    }
  }

  test("bigramCrossEntropy: docs under two tokens drop out") {
    val train = Seq((1L, "a b c")).toDF("doc_id", "text")
    val score = Seq((10L, "a"), (11L, ""), (12L, "a b")).toDF("doc_id", "text")
    val got = Curation.bigramCrossEntropy(train, score, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSeq
    assert(got == Seq(12L), got.toString)
  }

  test("segmentDedupSpanOwners: self-repetition attributes to the doc itself") {
    // one doc repeating its own aligned 20-token window: rk=2 window
    // is a dup whose class min(id) is the doc itself
    val w = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, w + " " + w)).toDF("doc_id", "text")
    val out = Curation.segmentDedupSpanOwners(docs, "doc_id", "text",
        grans = Seq(100, 50, 20))
      .as[(Long, Int, Int, Long)].collect().toSeq
    assert(out == Seq((7L, 20, 40, 7L)), out.toString)
  }
}
