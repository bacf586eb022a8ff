package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

class DedupSimSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents")
  private lazy val emb = Tables(spark, sf, "embeddings")

  /** Ground truth: exact all-pairs shingle jaccard (500 docs → 125k
    * pairs — fine at test scale).
    */
  private lazy val exactPairs: Set[(Long, Long)] = {
    val d = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    val a = d.select($"doc_id".as("idA"), $"sh".as("shA"))
    val b = d.select($"doc_id".as("idB"), $"sh".as("shB"))
    a.crossJoin(b).filter($"idA" < $"idB")
      .withColumn("jac", Dedup.jaccard($"shA", $"shB"))
      .filter($"jac" >= 0.8)
      .select($"idA", $"idB").as[(Long, Long)].collect().toSet
  }

  test("minhash-LSH recall >= 0.9 vs exact jaccard at 0.8") {
    assert(exactPairs.nonEmpty, "test data should contain near-dup pairs")
    val lsh = Dedup.minhashDuplicatePairs(docs, "doc_id", "text",
        k = 3, numPerm = 64, bands = 16, threshold = 0.8)
      .select($"idA", $"idB").as[(Long, Long)].collect().toSet
    val recall = (lsh & exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"recall=$recall lsh=${lsh.size} exact=${exactPairs.size}")
    // verification step guarantees precision 1.0 vs threshold
    assert(lsh.forall { case (a, b) => a < b })
  }

  test("prefix-filter jaccard join is EXACT: equals brute force, pairs and values") {
    // ground truth: all-pairs word-token jaccard (bounded test corpus)
    val d = docs.select($"doc_id",
      array_distinct(filter(split($"text", " "), t => t =!= "")).as("tk"))
      .filter(size($"tk") > 0)
    val brute = d.select($"doc_id".as("idA"), $"tk".as("ta"))
      .crossJoin(d.select($"doc_id".as("idB"), $"tk".as("tb")))
      .filter($"idA" < $"idB")
      .withColumn("i", size(array_intersect($"ta", $"tb")))
      .withColumn("jac",
        $"i".cast("double") / (size($"ta") + size($"tb") - $"i"))
      .filter($"jac" >= 0.7)
      .select($"idA", $"idB", $"jac")
      .as[(Long, Long, Double)].collect().toSet
    val pf = Dedup.prefixJaccardPairs(docs, "doc_id", "text", threshold = 0.7)
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty, "test corpus should contain similar pairs")
    assert(pf === brute, // exact: same pairs, bit-equal jaccard doubles
      s"missing=${(brute -- pf).take(5)} extra=${(pf -- brute).take(5)}")
  }

  test("simhash finds the high-jaccard families") {
    val sim = Dedup.simhashDuplicatePairs(docs, "doc_id", "text", maxDist = 3)
    val found = sim.select($"idA", $"idB").as[(Long, Long)].collect().toSet
    // simhash(hamming<=3) and jaccard(>=0.8) measure different things;
    // on this corpus the near-identical families should overlap heavily.
    val recall = (found & exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.5, s"recall=$recall found=${found.size}")
    val dists = sim.select(max($"dist")).head().getInt(0)
    assert(dists <= 3)
  }

  test("winnowing fingerprints: exact dup identity + near-dup recall") {
    // identical text → identical fingerprint set → jaccard 1.0
    val twin = Seq((1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "a completely different sentence about winnowing hashes"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowDuplicatePairs(twin, "doc_id", "text",
      k = 8, w = 4, threshold = 0.9)
      .select($"idA", $"idB", $"jaccard").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getDouble(2) == 1.0)

    // recall vs exact word-shingle near-dups on the real corpus
    val found = Dedup.winnowDuplicatePairs(docs, "doc_id", "text",
        k = 16, w = 8, threshold = 0.5)
      .select($"idA", $"idB").as[(Long, Long)].collect().toSet
    val recall = (found & exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"recall=$recall found=${found.size} exact=${exactPairs.size}")
  }

  test("winnow guarantee: shared substring >= k+w-1 shares a fingerprint") {
    import graft.functions.TextExpr
    // 40-byte shared substring embedded in different contexts
    val shared = "zzzz common payload substring here zzzz"
    val df = Seq(
      ("prefix one " + shared + " suffix alpha"),
      ("other beginning text " + shared + " and another ending"))
      .toDF("text")
      .select(TextExpr.winnowFingerprint($"text", 16, 8).as("fp"))
    val Array(a, b) = df.collect().map(_.getSeq[Long](0).toSet)
    assert((a & b).nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("hub-bucket cut: 1k identical docs yield linear star edges, not B^2") {
    // Boilerplate-heavy corpus: 1000 byte-identical docs share every
    // band bucket. Without the hub cut the band self-join would emit
    // ~499,500 candidate pairs per band; with it, each member links to
    // the bucket representative (min id) — exactly 999 edges total.
    val hub = (1L to 1000L).map(i =>
      (i, "the same boilerplate license header text repeated everywhere"))
    val solo = Seq((2001L, "an entirely unrelated document about turnips"),
      (2002L, "another unique text regarding astronomy and tea"))
    val df = (hub ++ solo).toDF("doc_id", "text")

    val mh = Dedup.minhashDuplicatePairs(df, "doc_id", "text",
      k = 3, numPerm = 16, bands = 4, threshold = 0.9, maxBucket = 8)
    val mhPairs = mh.select($"idA", $"idB").as[(Long, Long)].collect()
    assert(mhPairs.length == 999,
      s"expected 999 linear star edges, got ${mhPairs.length}")
    assert(mhPairs.forall(_._1 == 1L), "star edges must point at the rep")
    assert(Dedup.dropDuplicatesByPairs(df, "doc_id", mh).count() == 3)

    val sh = Dedup.simhashDuplicatePairs(df, "doc_id", "text",
      maxDist = 3, maxBucket = 8)
    val shPairs = sh.select($"idA", $"idB").as[(Long, Long)].collect()
    assert(shPairs.length == 999, s"got ${shPairs.length}")
    assert(shPairs.forall(_._1 == 1L))
  }

  test("connected components: chain, clique, pair — union-find parity") {
    // worst-case diameter: a 100-node path (stresses the O(log n)
    // star-contraction rounds), plus a 5-clique and an isolated pair
    val chain = (0L until 99L).map(i => (i, i + 1))
    val clique = for (x <- 200L to 204L; y <- 200L to 204L if x < y)
      yield (x, y)
    val pairs = (chain ++ clique ++ Seq((300L, 301L))).toDF("idA", "idB")
    val cc = Dedup.duplicateClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 99L).forall(cc(_) == 0L), "path collapses to min 0")
    assert((200L to 204L).forall(cc(_) == 200L))
    assert(cc(300L) == 300L && cc(301L) == 300L)
    assert(cc.size == 107)

    // the adaptive driver union-find (default for small graphs) and
    // the FORCED distributed alternating-star path must agree exactly
    val dist = Dedup.duplicateClusters(pairs, smallGraph = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist == cc, "driver and distributed clustering disagree")

    // transitive-closure dedup: exactly one survivor per component
    val docs = (0L to 350L).toDF("doc_id")
    val kept = Dedup.dropDuplicatesByClusters(docs, "doc_id",
      Dedup.duplicateClusters(pairs))
    assert(kept.count() == 351 - 99 - 4 - 1)
  }

  test("dropDuplicatesByPairs keeps smallest id of each family") {
    val pairs = Seq((1L, 2L), (1L, 3L), (5L, 6L)).toDF("idA", "idB")
    val df = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val kept = Dedup.dropDuplicatesByPairs(df, "doc_id", pairs)
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L))
  }

  test("brute-force topk: sims within [-1,1], k rows per query, sorted") {
    val r = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", 5)
    val rows = r.collect()
    assert(rows.length == 25)
    assert(rows.forall(x => math.abs(x.getAs[Double]("sim")) <= 1.0 + 1e-9))
    val perQuery = r.groupBy("query_id").agg(count(lit(1)).as("n"))
      .select(min($"n")).head().getLong(0)
    assert(perQuery == 5)
  }

  test("ANN topk recall vs brute force on hostile (random) vectors") {
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (ann & exact).size.toDouble / exact.size
    // random 64-dim vectors are the worst case for LSH; 1-bit
    // multi-probe lifts observed recall@5 to ~0.9.
    assert(recall >= 0.5, s"recall=$recall")
    assert(ann.groupBy(_._1).size == 20, "every query produced candidates")
  }

  test("PQ-ADC: planted clone ranks its source first; recall scales with m") {
    // Exactness property: a query identical to corpus vector 0 hits
    // ITS OWN argmin codes, so its ADC to vector 0 is the global
    // minimum of the achievable ADC sum — and any tie breaks to the
    // smallest vec_id, which IS vector 0.
    val v0 = emb.filter($"vec_id" === 0)
      .select($"embedding").as[Seq[Float]].head()
    val clone = Seq((100000L, v0)).toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(emb, clone, "vec_id", "embedding", k = 1)
      .select($"vec_id").as[Long].head()
    assert(top == 0L, s"clone's nearest must be its source, got $top")
    // Hostile-corpus recall@10 (random 64-dim vectors, N=500, random
    // baseline ≈ 0.02): measured 0.08 at m=4 and 0.34 at m=16 —
    // deterministic (md5-seeded codebooks, fixed testdata); floors
    // sit just under the measurements.
    val q = emb.filter($"vec_id" < 10)
    val qq = q.select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val d2e = Similarity.dot($"embedding", $"embedding") +
      Similarity.dot($"qe", $"qe") -
      lit(2.0) * Similarity.dot($"embedding", $"qe")
    val exact = graft.operators.Ops.topKPerGroup(
        emb.crossJoin(broadcast(qq)).filter($"vec_id" =!= $"query_id")
          .select($"query_id", $"vec_id", d2e.as("d")),
        Seq("query_id"), Seq($"d".asc, $"vec_id".asc), 10)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    def recallAt(m: Int): Double = {
      val pq = Similarity.pqTopK(emb, q, "vec_id", "embedding",
          k = 10, m = m)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
      (pq & exact).size.toDouble / exact.size
    }
    val r4 = recallAt(4)
    val r16 = recallAt(16)
    assert(r4 >= 0.05, s"m=4 recall=$r4")
    assert(r16 >= 0.25, s"m=16 recall=$r16")
    assert(r16 > r4, s"finer subspaces must lift recall: $r4 -> $r16")
  }

  test("ANN recall@10 floors match the measured evidence (SCALE.md r6)") {
    // RecallProbe measured ann multiProbe=1 → 0.910 and ivf nProbe=8 →
    // 0.668 at sf0.01 (deterministic: fixed hyperplane seed, md5 coarse
    // seeds, fixed corpus; the sf0.001 corpus draw measures 0.876 —
    // same size, different vectors — so this gate pins the sf0.01
    // corpus the SCALE.md table cites). Floors sit at the VERDICT r5
    // #6 bar so a signature-kernel, hub-cut, or probe regression fails
    // loudly.
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.filter($"vec_id" < 50)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(emb, queries, "vec_id", "embedding", 10)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val annRecall = (ann & exact).size.toDouble / exact.size
    assert(annRecall >= 0.9, s"annTopK recall@10=$annRecall < 0.9")
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10, nProbe = 8)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val ivfRecall = (ivf & exact).size.toDouble / exact.size
    assert(ivfRecall >= 0.6, s"ivfTopK(nProbe=8) recall@10=$ivfRecall < 0.6")
    // Trained coarse quantizer (VERDICT r9 #6): 2 Lloyd rounds over the
    // hash-sampled seeds must not LOSE recall at equal nProbe — better
    // centroids tighten the inverted lists, so probing the same number
    // of lists covers at least as much true-neighbor mass. All inputs
    // are deterministic (fixed corpus, md5 seeds, order-independent
    // decimal Lloyd arithmetic), so this pins an exact measurement,
    // not a statistical hope (SCALE.md r10 row records both numbers).
    val ivfT = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10,
        nProbe = 8, kmeansIters = 2)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val ivfTRecall = (ivfT & exact).size.toDouble / exact.size
    info(s"ivf sampled=$ivfRecall trained=$ivfTRecall")
    assert(ivfTRecall >= ivfRecall,
      s"trained IVF recall@10=$ivfTRecall dropped below sampled=$ivfRecall")
  }

  test("kmeans refinement: deterministic, never worsens quantizer fit") {
    def fit(cs: Array[Seq[Float]]): Double = {
      val scored = array(cs.map(c =>
        Similarity.cosine($"embedding", array(c.map(lit): _*))): _*)
      emb.select(avg(array_max(scored))).head().getDouble(0)
    }
    val seeds = Similarity.kmeansCentroids(emb, "embedding", 8,
      iters = 0, idCol = "vec_id")
    val refined = Similarity.kmeansCentroids(emb, "embedding", 8,
      iters = 2, idCol = "vec_id")
    val again = Similarity.kmeansCentroids(emb, "embedding", 8,
      iters = 2, idCol = "vec_id")
    assert(refined.map(_.toList).toSeq == again.map(_.toList).toSeq,
      "refinement must be deterministic")
    // spherical k-means: mean best-cosine is non-decreasing per round
    assert(fit(refined) >= fit(seeds) - 1e-9,
      s"fit worsened: ${fit(seeds)} -> ${fit(refined)}")
    // refined IVF still returns full coverage
    val ivf = Similarity.ivfTopK(emb, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", 5, nList = 8, nProbe = 2, kmeansIters = 2)
    assert(ivf.select($"query_id").distinct().count() == 5)
  }

  test("cosine of identical vectors is 1") {
    val one = emb.limit(1).select($"embedding".as("a"), $"embedding".as("b"))
      .select(Similarity.cosine($"a", $"b")).head().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("IVF topk: full coverage, recall beats random-list baseline") {
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nList = 16, nProbe = 4)
    val found = ivf.select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (found & exact).size.toDouble / exact.size
    // probing 4/16 lists scans ~25% of the corpus; random vectors make
    // list membership weakly correlated with the top-k, so require
    // comfortably-above-25% plus full query coverage.
    assert(recall >= 0.25, s"recall=$recall")
    assert(found.groupBy(_._1).size == 20)
    assert(found.groupBy(_._1).values.forall(_.size == 5))
  }

  test("int8 quantization: codes bounded, round-trip error <= scale/2, high top-k fidelity") {
    import graft.operators.Similarity
    val qz = emb.select($"vec_id", $"embedding",
        Similarity.quantizeInt8($"embedding").as("qz"))
      .select($"vec_id", $"embedding", $"qz.q".as("q"), $"qz.scale".as("s"),
        Similarity.dequantize($"qz").as("dq"))
      .collect()
    qz.foreach { r =>
      val v = r.getSeq[Float](1)
      val q = r.getSeq[Long](2)
      val s = r.getDouble(3)
      val dq = r.getSeq[Double](4)
      assert(q.forall(c => c >= -127 && c <= 127))
      // reconstruction error is at most half a quantization step
      v.zip(dq).foreach { case (orig, rec) =>
        assert(math.abs(orig.toDouble - rec) <= s / 2 + 1e-12,
          s"err=${math.abs(orig.toDouble - rec)} scale=$s")
      }
    }
    // the single-pass kernel is bit-identical to the HOF composition
    val kdq = emb.select($"vec_id",
        graft.functions.ArrayMath.quantizeDequantize($"embedding").as("k"),
        Similarity.dequantize(Similarity.quantizeInt8($"embedding")).as("c"))
      .as[(Long, Seq[Double], Seq[Double])].collect()
    assert(kdq.forall { case (_, kk, cc) => kk == cc }, "kernel != HOF composition")

    // ranking fidelity: quantized top-5 overlaps float top-5 heavily
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizedTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val overlap = (quant & exact).size.toDouble / exact.size
    assert(overlap >= 0.8, s"overlap=$overlap")
  }

  test("semDedup: survivors pairwise below tau within cluster, dominance sound") {
    val tau = 0.3
    val kept = Similarity.semDedup(emb, "vec_id", "embedding", k = 16, tau = tau)
    val keptRows = kept.select($"vec_id", $"cluster").as[(Long, Int)].collect()
    val n = emb.count()
    assert(keptRows.nonEmpty && keptRows.length < n,
      s"expected a strict subset, got ${keptRows.length}/$n")
    // every input id appears exactly once in kept ∪ dropped
    assert(keptRows.map(_._1).distinct.length == keptRows.length)

    // The dominance rule's fixed point: two same-cluster survivors can
    // never sit within tau of each other (the rank-better one would
    // have dropped the other). Verify by exact pairwise check over the
    // survivors joined back to their vectors.
    val keptVec = kept.join(emb, "vec_id")
      .select($"cluster", $"vec_id", $"embedding")
    val a = keptVec.select($"cluster", $"vec_id".as("idA"), $"embedding".as("ea"))
    val b = keptVec.select($"cluster".as("cB"), $"vec_id".as("idB"), $"embedding".as("eb"))
    val offenders = a.join(b, $"cluster" === $"cB" && $"idA" < $"idB")
      .withColumn("sim", Similarity.cosine($"ea", $"eb"))
      .filter($"sim" >= tau)
      .count()
    assert(offenders == 0, s"$offenders same-cluster survivor pairs >= tau")

    // deterministic: a second run returns the identical kept set
    val again = Similarity.semDedup(emb, "vec_id", "embedding", k = 16, tau = tau)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect()
    assert(again.sortBy(_._1).sameElements(keptRows.sortBy(_._1)))
  }

  test("knnClassify: planted orthogonal clusters classify perfectly") {
    // 3 labels on orthogonal axes with small deterministic jitter:
    // every held-out vector's 5 nearest live on its own axis.
    def vec(axis: Int, i: Int): Seq[Float] = {
      val v = Array.fill(6)(0.01f * ((i * 7 + axis) % 5))
      v(axis) = 1f + 0.001f * i
      v.toSeq
    }
    val rows = for (axis <- 0 until 3; i <- 0 until 8)
      yield (axis * 100L + i, vec(axis, i), axis)
    val df = rows.toDF("vec_id", "embedding", "label")
    val queries = df.filter($"vec_id" % 4 === 0)
    val train = df.filter($"vec_id" % 4 =!= 0)
    val out = Similarity.knnClassify(train, queries, "vec_id",
        "embedding", "label", k = 5)
      .as[(Long, Int)].collect().toMap
    assert(out.size == queries.count())
    out.foreach { case (qid, pred) => assert(pred == (qid / 100).toInt,
      s"query $qid predicted $pred") }
  }

  test("knnClassify vote tie-break is deterministic (smaller label wins)") {
    // two labels, k=2, one neighbor each at equal similarity -> the
    // vote is 1-1 and label 0 must win.
    val train = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 1)).toDF("vec_id", "embedding", "label")
    val q = Seq((10L, Seq(1f, 1f), 9)).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(train, q, "vec_id", "embedding",
      "label", k = 2).as[(Long, Int)].collect()
    assert(out.toSeq == Seq((10L, 0)))
  }

  test("containmentPairs finds doc-in-doc where jaccard-LSH is silent") {
    import graft.operators.DedupPortable
    // snippet = first third of a long doc: containment 1.0, jaccard
    // well under the 0.7 LSH threshold
    val big = (1 to 60).map(i => s"w${i % 37}x$i").mkString(" ")
    val snippet = big.split(" ").take(20).mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, big), (2L, snippet), (3L, other)).toDF("id", "body")
    val got = Dedup.containmentPairs(docs, "id", "body", k = 3,
        threshold = 0.8, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 1.0)), got.toString)
    // the same pair never surfaces from the jaccard-targeted path
    val lsh = DedupPortable.minhashDuplicatePairsPortable(
      docs, "id", "body", k = 3, numPerm = 64, bands = 16, threshold = 0.7)
    assert(lsh.count() == 0)
    // kernel sanity: symmetric denominator, NaN-free on real sets
    val c = docs.filter($"id" < 3)
      .select(graft.functions.PortableExpr.md5Shingles($"body", 3).as("hs"))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(c(1).subsetOf(c(0)))
  }

  test("incrementalContainment: snippet flags dup_corpus, fresh doc stays new") {
    val big = (1 to 60).map(i => s"w${i % 37}x$i").mkString(" ")
    val corpus = Seq((1L, big),
      (2L, (1 to 40).map(i => s"z$i").mkString(" "))).toDF("id", "body")
    val delta = Seq(
      (101L, big.split(" ").take(20).mkString(" ")),   // inside doc 1
      (102L, (1 to 30).map(i => s"y$i").mkString(" ")), // fresh (canonical)
      (103L, (1 to 30).map(i => s"y$i").mkString(" "))) // dup of 102 in-batch
      .toDF("id", "body")
    val out = Dedup.incrementalContainment(corpus, delta, "id", "body",
        k = 3, threshold = 0.8)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    // within-batch pairs are idA<idB: the smaller id stays canonical
    assert(out == Seq((101L, "dup_corpus", 1L), (102L, "new", -1L),
      (103L, "dup_delta", 102L)), out.toString)
  }

  test("leakage-safe split: no duplicate cluster ever straddles splits") {
    // The q209 invariant on the real corpus: route docs by their
    // cluster rep and every cluster lands in exactly one split; the
    // doc universe is partitioned (no doc lost or double-assigned).
    import graft.operators.{DedupPortable, Ops}
    val docs = Tables(spark, sf, "documents")
    val pairs = DedupPortable.minhashDuplicatePairsPortable(
      docs, "doc_id", "text", k = 3, numPerm = 64, bands = 16,
      threshold = 0.7)
    val clusters = Dedup.duplicateClusters(pairs)
    val asg = docs.select($"doc_id")
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("rep", coalesce($"rep", $"doc_id"))
    val split = Ops.hashSplit(asg, "rep",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "v1")
      .persist()
    try {
      val straddlers = split.groupBy($"rep")
        .agg(countDistinct($"split").as("ns")).filter($"ns" > 1).count()
      assert(straddlers == 0, s"$straddlers clusters straddle splits")
      assert(split.count() == docs.count())
      assert(split.select($"doc_id").distinct().count() == docs.count())
      // and the split is non-degenerate (all three splits populated)
      assert(split.select($"split").distinct().count() == 3)
    } finally split.unpersist(blocking = false)
  }

  test("pair builders self-release: session cache empty after each returns") {
    // VERDICT r12 #2: every public builder localCheckpoints its result
    // and unpersists its internals — NO caller-side clearCache
    // contract. The probe sees the CacheManager directly (checkpoint
    // blocks live in the block store, not the relation cache, so an
    // empty CacheManager is exactly "no persisted relations leaked").
    import graft.operators.{Dedup => D, DedupPortable => DP, Ops}
    import org.apache.spark.sql.graftprobe.CacheProbe
    def assertClean(name: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      val out = build
      out.count()
      assert(CacheProbe.cacheIsEmpty(spark),
        s"$name left persisted internals in the session cache")
    }
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val delta = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    assertClean("minhashDuplicatePairs")(
      D.minhashDuplicatePairs(docs, "doc_id", "text", threshold = 0.8))
    assertClean("simhashDuplicatePairs")(
      D.simhashDuplicatePairs(docs, "doc_id", "text"))
    assertClean("winnowDuplicatePairs")(
      D.winnowDuplicatePairs(docs, "doc_id", "text"))
    assertClean("containmentPairs")(
      D.containmentPairs(docs, "doc_id", "text"))
    assertClean("prefixJaccardPairs(all)")(
      D.prefixJaccardPairs(docs, "doc_id", "text", 0.9))
    assertClean("prefixJaccardPairs(starEdges)")(
      D.prefixJaccardPairs(docs, "doc_id", "text", 0.9, "starEdges"))
    assertClean("incrementalMinhash")(
      D.incrementalMinhash(corpus, delta, "doc_id", "text"))
    assertClean("incrementalContainment")(
      D.incrementalContainment(corpus, delta, "doc_id", "text"))
    assertClean("minhashDuplicatePairsPortable")(
      DP.minhashDuplicatePairsPortable(docs, "doc_id", "text"))
    assertClean("winnowDuplicatePairsPortable")(
      DP.winnowDuplicatePairsPortable(docs, "doc_id", "text"))
    assertClean("incrementalMinhashPortable")(
      DP.incrementalMinhashPortable(corpus, delta, "doc_id", "text"))
    assertClean("pageRank") {
      val e = docs.limit(60)
        .select(($"doc_id" % 7).as("src"), ($"doc_id" % 5 + 7).as("dst"))
        .distinct()
      Ops.pageRank(e, iters = 2)
    }
  }

  test("prefixJaccardPairs starEdges: linear certificate, identical clusters") {
    // VERDICT r12 #1: starEdges collapses within-shape member² pairs
    // and cross-shape fan-out to rep edges. Gates: (a) every star edge
    // IS a real pair with the bit-identical jaccard double, (b)
    // connected components over the star edges equal components over
    // ALL pairs exactly, (c) the certificate is never larger.
    val all = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 0.7)
    val star = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 0.7,
      pairsMode = "starEdges")
    val allSet = all.as[(Long, Long, Double)].collect().toSet
    val starSet = star.as[(Long, Long, Double)].collect().toSet
    assert(allSet.nonEmpty, "corpus should contain similar pairs")
    assert(starSet.subsetOf(allSet),
      s"star edges not in all-pairs: ${(starSet -- allSet).take(5)}")
    assert(starSet.size <= allSet.size)
    assert(starSet.forall { case (a, b, _) => a < b })
    val ca = Dedup.duplicateClusters(all.toDF())
      .as[(Long, Long)].collect().toSet
    val cs = Dedup.duplicateClusters(star.toDF())
      .as[(Long, Long)].collect().toSet
    assert(ca === cs,
      s"cluster mismatch: onlyAll=${(ca -- cs).take(5)} onlyStar=${(cs -- ca).take(5)}")
    // greedy pair-drop is ALSO identical: d survives iff no similar
    // doc with a smaller id exists, and the star certificate names
    // exactly the same idB victims (non-rep members + larger reps)
    val da = Dedup.dropDuplicatesByPairs(docs, "doc_id", all.toDF())
      .select($"doc_id").as[Long].collect().toSet
    val ds = Dedup.dropDuplicatesByPairs(docs, "doc_id", star.toDF())
      .select($"doc_id").as[Long].collect().toSet
    assert(da === ds,
      s"greedy mismatch: onlyAll=${(da -- ds).take(5)} onlyStar=${(ds -- da).take(5)}")
  }

  test("pcaTopComponent recovers a planted dominant axis") {
    // dim0 variance 5.0 dominates dim1 variance 0.01 (means zero);
    // C = [[5, 0.1], [0.1, 0.01]] -> top eigenvector ~ (1, 0.02),
    // eigenvalue ~ 5.002
    val vecs = Seq(
      Array(3f, 0.1f), Array(-3f, -0.1f), Array(1f, -0.1f), Array(-1f, 0.1f))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val out = Similarity.pcaTopComponent(vecs, "embedding")
      .orderBy("dim")
      .select($"dim", $"loading", $"eigenvalue")
      .as[(Int, Double, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(0, 1), out.toString)
    assert(math.abs(math.abs(out(0)._2) - 1.0) < 1e-3, out.toString)
    assert(math.abs(out(1)._2) < 0.05, out.toString)
    assert(math.abs(out(0)._3 - 5.002) < 0.01, out.toString)
    // both rows report the same eigenvalue
    assert(out(0)._3 == out(1)._3, out.toString)
  }

  test("removeTopComponent: residuals are orthogonal to the removed direction") {
    val sample = emb.limit(80)
    val pc = Similarity.pcaTopComponent(sample, "embedding")
      .orderBy("dim").select($"loading").as[Double].collect()
    val out = Similarity.removeTopComponent(sample, "vec_id", "embedding")
      .select($"vec_id", $"proj", $"resid").as[(Long, Double, Seq[Double])]
      .collect()
    assert(out.length == 80)
    // tolerance is rounding-bound, not float-bound: the operator uses
    // the PUBLISHED 6-dp component (||v|| = 1 only to ~1e-6), so
    // per-vector orthogonality holds to ~1e-6 by construction
    out.foreach { case (id, _, resid) =>
      val re = resid.zip(pc).map { case (r, v) => r * v }.sum
      assert(math.abs(re) < 1e-5, s"vec $id residual not orthogonal: $re")
    }
    // removing a component can only shrink the centered norm
    val withProj = out.map { case (_, p, r) =>
      (math.sqrt(r.map(x => x * x).sum), p)
    }
    withProj.foreach { case (rn, p) =>
      assert(rn >= 0 && !rn.isNaN, s"bad residual norm $rn (proj $p)")
    }
  }

  test("pcaTopComponent is invariant to row order (order-free decimal sums)") {
    val base = emb.limit(100)
    val a = Similarity.pcaTopComponent(base, "embedding")
      .orderBy("dim").collect().toSeq
    val b = Similarity.pcaTopComponent(
        base.orderBy($"vec_id".desc).repartition(7), "embedding")
      .orderBy("dim").collect().toSeq
    assert(a == b, "PCA must be bit-identical under row reordering")
  }
}
