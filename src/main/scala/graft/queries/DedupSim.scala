package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, DedupPortable, Ops, Similarity}

/** Near-dedup + similarity-search queries (north-star extensions).
  *
  * Oracle-checkable where the algorithm is exact (pairwise jaccard,
  * brute-force cosine); rows-only where it is probabilistic-recall
  * (MinHash-LSH, SimHash, ANN) — those get recall assertions in
  * DedupSimSpec instead.
  */
object DedupSim {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** q242/q244 share ONE top principal component of the embeddings
    * corpus — the moments scan + 10 power-iteration rounds are the
    * expensive half of both queries, so the suite pays them once (the
    * q211/q216 shared-walk pattern, VERDICT r15 #3). The component is
    * a 64-row localCheckpoint (pinned by pcaFromMoments itself); Bench
    * reports the miss cost as its own `q242_pca_build` row via
    * [[pcaBuildSeconds]] so minsum still carries the build exactly
    * once.
    */
  private val pcaCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  val pcaBuildSeconds =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  private def sharedPcaComponent(s: SparkSession, dir: String): DataFrame = {
    pcaCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val key = (s, dir)
    val cached = pcaCache.get(key)
    if (cached != null) return cached
    // Build outside the map lock; concurrent double-build resolved by
    // putIfAbsent, loser releases its checkpoint blocks.
    val t0 = System.nanoTime()
    val pc = Similarity.pcaTopComponent(t(s, dir, "embeddings"), "embedding")
    val prior = pcaCache.putIfAbsent(key, pc)
    if (prior != null) { pc.unpersist(false); prior }
    else {
      pcaBuildSeconds.merge(dir,
        java.lang.Double.valueOf((System.nanoTime() - t0) / 1e9),
        (a, b) => java.lang.Double.valueOf(a.doubleValue + b.doubleValue))
      pc
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // EXACT pairwise 3-gram jaccard on a bounded sample (quadratic by
    // definition; the scalable path is q51's LSH). The sample is an
    // ABSOLUTE cap (first 500 doc_ids), so the pair count stays O(10^5)
    // at any corpus size — a modulus sample would grow linearly with
    // the corpus and the cross join quadratically. Shingles are
    // pre-hashed to 64-bit longs: jaccard over hashed sets equals
    // string jaccard up to hash collisions (~1e-9 per doc pair), and
    // the cross join compares longs instead of strings.
    "q50_jaccard_pairs" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .orderBy($"doc_id").limit(500)
        .select($"doc_id", Dedup.hashedShingles($"text", 3).as("sh"))
        // tiny (≤500 rows) but referenced by both sides of the cross
        // join — persist so shingling runs once, and spread the
        // left side so the quadratic verify parallelizes.
        .persist()
      val a = docs.select($"doc_id".as("idA"), $"sh".as("shA")).repartition(32)
      val b = docs.select($"doc_id".as("idB"), $"sh".as("shB"))
      a.crossJoin(broadcast(b)).filter($"idA" < $"idB")
        .withColumn("jac", graft.functions.TextExpr.jaccardSorted($"shA", $"shB"))
        .filter($"jac" >= 0.5)
        .select($"idA", $"idB", round($"jac", 4).as("jac"))
        .orderBy($"idA", $"idB")
    }),

    // Connected components over the exact-jaccard pair graph (same
    // bounded pair source as q50): transitive-closure clusters with
    // rep = component min, via alternating large-star/small-star
    // rounds. Oracle: DuckDB recursive CTE reachability. This is the
    // grouping step a pair list implies — A~B, B~C clusters A,B,C even
    // though (A,C) was never emitted.
    "q48_dup_clusters" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .orderBy($"doc_id").limit(500)
        .select($"doc_id", Dedup.hashedShingles($"text", 3).as("sh"))
        .persist()
      val a = docs.select($"doc_id".as("idA"), $"sh".as("shA")).repartition(32)
      val b = docs.select($"doc_id".as("idB"), $"sh".as("shB"))
      val pairs = a.crossJoin(broadcast(b)).filter($"idA" < $"idB")
        .withColumn("jac",
          graft.functions.TextExpr.jaccardSorted($"shA", $"shB"))
        .filter($"jac" >= 0.5)
        .select($"idA", $"idB")
      Dedup.duplicateClusters(pairs).orderBy($"id")
    }),

    // Cluster survivorship — the curation step a near-dup pass feeds:
    // per duplicate cluster keep the HIGHEST-QUALITY member (not the
    // arbitrary min-id), report who survived and the family size.
    // Composition showcase: exact-jaccard pair graph → connected
    // components → quality-ranked pick. Singleton docs are their own
    // cluster. Oracle: recursive-CTE reachability + the same quality
    // formula + a window pick.
    "q71_cluster_survivor" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
        .orderBy($"doc_id").limit(500)
        .select($"doc_id", Dedup.hashedShingles($"text", 3).as("sh"),
          graft.functions.TextFunctions.qualityScore($"text").as("quality"))
        .persist()
      val a = docs.select($"doc_id".as("idA"), $"sh".as("shA")).repartition(32)
      val b = docs.select($"doc_id".as("idB"), $"sh".as("shB"))
      val pairs = a.crossJoin(broadcast(b)).filter($"idA" < $"idB")
        .withColumn("jac",
          graft.functions.TextExpr.jaccardSorted($"shA", $"shB"))
        .filter($"jac" >= 0.5)
        .select($"idA", $"idB")
      val clusters = Dedup.duplicateClusters(pairs) // (id, rep), reps incl.
      val singles = docs.select($"doc_id")
        .join(clusters.select($"id".as("doc_id")), Seq("doc_id"), "left_anti")
        .select($"doc_id".as("id"), $"doc_id".as("rep"))
      val ranked = clusters.unionByName(singles)
        .join(docs.select($"doc_id".as("id"), $"quality"), "id")
        .withColumn("rk", row_number().over(
          Window.partitionBy($"rep").orderBy($"quality".desc, $"id".asc)))
      ranked.groupBy($"rep").agg(
          max(when($"rk" === 1, $"id")).as("keep_id"),
          max(when($"rk" === 1, $"quality")).as("kept_quality"),
          count(lit(1)).as("family"))
        .orderBy($"rep")
    }),

    // Scale-true dedup clustering (VERDICT r8 #2): the banded LSH pair
    // source — full corpus, NO cap — feeds connected components. This
    // is the 100 TB composition q48 only demos on a bounded all-pairs
    // sample: every stage is equi-join/hash-agg shaped (band join with
    // hub cut, alternating-star rounds), so nothing here is quadratic
    // in the corpus. Oracle: the same md5-family pair replay as q51
    // extended with recursive-CTE reachability.
    "q147_lsh_dup_clusters" -> ((s, dir) => {
      import s.implicits._
      val pairs = DedupPortable.minhashDuplicatePairsPortable(
        t(s, dir, "documents"), "doc_id", "text",
        k = 3, numPerm = 64, bands = 16, threshold = 0.7)
      Dedup.duplicateClusters(pairs).orderBy($"id")
    }),

    // ...and the full curation tail on top of it: LSH pairs -> clusters
    // -> keep the highest-quality member per cluster, over the ENTIRE
    // corpus (singletons survive as their own cluster). The rank window
    // partitions by cluster rep — at 100 TB that's millions of tiny
    // partitions, never a global sort. Replaces q71's capped pair demo
    // with the scale path end-to-end.
    "q148_lsh_survivorship" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id",
        graft.functions.TextFunctions.qualityScore($"text").as("quality"))
      val pairs = DedupPortable.minhashDuplicatePairsPortable(
        t(s, dir, "documents"), "doc_id", "text",
        k = 3, numPerm = 64, bands = 16, threshold = 0.7)
      val clusters = Dedup.duplicateClusters(pairs) // (id, rep)
      val singles = docs.select($"doc_id")
        .join(clusters.select($"id".as("doc_id")), Seq("doc_id"), "left_anti")
        .select($"doc_id".as("id"), $"doc_id".as("rep"))
      val members = clusters.unionByName(singles)
        .join(docs.select($"doc_id".as("id"), $"quality"), "id")
      // Keeper pick is SALTED top-1: the hub-bucket cut deliberately
      // emits giant star clusters for boilerplate-heavy corpora, so a
      // plain row_number().over(partitionBy(rep)) would serialize the
      // biggest cluster into one straggler task at 100 TB.
      // saltedTopKPerGroup pre-ranks within (rep, salt) — a 16-way
      // split of any hub — then re-ranks only the <=16 survivors per
      // rep; OpsSpec pins bit-equality with the plain window. Family
      // counts come from the map-side-combining hash-agg (skew-safe by
      // construction), joined back on rep.
      val keeper = Ops.saltedTopKPerGroup(members, Seq("rep"),
          Seq($"quality".desc, $"id".asc), k = 1, saltCol = $"id")
        .select($"rep", $"id".as("keep_id"), $"quality".as("kept_quality"))
      val family = members.groupBy($"rep").agg(count(lit(1)).as("family"))
      keeper.join(family, "rep")
        .select($"rep", $"keep_id", $"kept_quality", $"family")
        .orderBy($"rep")
    }),

    // Leakage-safe train/val/test split: route every doc by md5 of its
    // duplicate-cluster REP (singletons by their own id), so near-dups
    // can never straddle splits — the contamination mode a naive
    // per-doc hash split (q101) silently allows. Composition: LSH pair
    // source → connected components → rep-keyed hashSplit; `moved`
    // counts the docs whose naive doc_id-keyed split differs, i.e. the
    // leakage this prevented. 100 TB shape: the pair/cluster stages are
    // the q147 scale path, the split itself is a narrow md5 projection
    // and the summary a map-side-combining hash-agg — no new shuffles.
    "q209_leakage_safe_split" -> ((s, dir) => {
      import s.implicits._
      val pairs = DedupPortable.minhashDuplicatePairsPortable(
        t(s, dir, "documents"), "doc_id", "text",
        k = 3, numPerm = 64, bands = 16, threshold = 0.7)
      val clusters = Dedup.duplicateClusters(pairs) // (id, rep)
      val asg = t(s, dir, "documents").select($"doc_id")
        .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("rep", coalesce($"rep", $"doc_id"))
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val both = Ops.hashSplit(
        Ops.hashSplit(asg, "rep", splits, salt = "v1"),
        "doc_id", splits, salt = "v1", splitName = "naive_split")
      both.groupBy($"split").agg(
          count(lit(1)).as("n_docs"),
          countDistinct($"rep").as("n_clusters"),
          count(when($"naive_split" =!= $"split", lit(1))).as("moved"),
          min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
        .orderBy($"split")
    }),

    // Doc-in-doc containment dedup: plant a ~1/3-prefix snippet of
    // every 7th doc as a new doc and find it — containment 1.0 where
    // jaccard-targeted LSH sees ~0.33 and stays silent. Bounded corpus
    // (first 500 docs, q50 precedent — the 31-word synthetic vocab
    // makes unbounded containment output explosive); the OPERATOR is
    // the scale path: inverted-index candidates under the hub cut,
    // merge-pass containment verify (Dedup.containmentPairs).
    "q213_containment_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .orderBy($"doc_id").limit(500)
        .select($"doc_id", $"text")
        .persist() // both union branches + the snippet derivation read
                   // it; harness cache-clear unpersists
      val snip = docs.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          array_join(slice(split($"text", " "), lit(1),
            greatest(lit(3),
              floor(size(split($"text", " ")) / lit(3.0)).cast("int"))),
            " ").as("text"))
      val corpus = docs.unionByName(snip)
      Dedup.containmentPairs(corpus, "doc_id", "text", k = 3,
          threshold = 0.8, maxBucket = 64)
        .orderBy($"idA", $"idB")
    }),

    // Incremental containment — the daily-crawl form of q213: today's
    // batch (a planted 1/3-prefix snippet of every 10th doc) is
    // checked for doc-in-doc duplication against the standing corpus
    // WITHOUT reshuffling it (corpus postings pruned by a broadcast of
    // the delta's shingles), plus within-batch self-containment. Full
    // corpus, no cap — this IS the scale path.
    "q218_incremental_containment" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val delta = docs.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          array_join(slice(split($"text", " "), lit(1),
            greatest(lit(3),
              floor(size(split($"text", " ")) / lit(3.0)).cast("int"))),
            " ").as("text"))
      Dedup.incrementalContainment(docs, delta, "doc_id", "text",
          k = 3, threshold = 0.8, maxBucket = 64)
        .orderBy($"id")
    }),

    // The end-to-end corpus-curation RECIPE — the "make a training
    // corpus" flow as ONE query: language + quality gate → LSH
    // near-dup clustering over the survivors → per-cluster
    // best-quality keep → per-source corpus summary (docs, tokens,
    // decimal-exact average quality). Every stage is the scale path
    // demonstrated piecewise elsewhere (q41 quality, q147 clusters,
    // q148 survivorship) — this query proves they COMPOSE, and the
    // oracle replays the whole chain in one recursive-CTE SQL.
    "q157_corpus_recipe" -> ((s, dir) => {
      import s.implicits._
      val docsF = t(s, dir, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore($"text"))
        .filter($"lang" === "en" && $"q" >= 0.3)
        .select($"doc_id", $"text", $"source", $"q")
        .persist()
      val pairs = DedupPortable.minhashDuplicatePairsPortable(
        docsF.select($"doc_id", $"text"), "doc_id", "text",
        k = 3, numPerm = 64, bands = 16, threshold = 0.7)
      val clusters = Dedup.duplicateClusters(pairs)
      val singles = docsF.select($"doc_id")
        .join(clusters.select($"id".as("doc_id")), Seq("doc_id"), "left_anti")
        .select($"doc_id".as("id"), $"doc_id".as("rep"))
      val members = clusters.unionByName(singles)
        .join(docsF.select($"doc_id".as("id"), $"q", $"source", $"text"), "id")
      // Salted keeper pick — same rationale and machinery as q148: no
      // per-rep window ever sees a whole hub cluster in one task.
      val keepers = Ops.saltedTopKPerGroup(members, Seq("rep"),
        Seq($"q".desc, $"id".asc), k = 1, saltCol = $"id")
      // avg quality in EXACT 1e-4 units: quality scores are 4-decimal
      // values, so a double average rounds at a structural .00005 tie
      // (sum=…X.5/n) where engines' round() tie-breaks differ — the
      // integer floor-average has no tie to break.
      keepers
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split($"text", " ")).cast("long")).as("n_tokens"),
          sum(round($"q" * 10000).cast("long")).as("sq"))
        .select($"source", $"n_docs", $"n_tokens",
          expr("sq div n_docs").as("avg_quality_e4"))
        .orderBy($"source")
    }),

    // Image perceptual-hash near-dup (VERDICT r8 #3) — multimodal as a
    // CONSUMER of the dedup family, not just codecs. Embedding vectors
    // are rendered as REAL 8×8 grayscale PNGs (plus one planted
    // single-pixel-edited variant per image: the re-encoded/retouched
    // duplicate case), decoded back through the ImageIo codec into a
    // 60-bit average-hash, then fed to the SAME banded-hamming dedup
    // machinery as SimHash text near-dup (4×15-bit bands, hub cut,
    // exact hamming verify). One pixel per grid cell makes the
    // PNG→decode→hash round-trip exact in integers, so the DuckDB
    // oracle replays the hash relationally from the quantized pixel
    // ints without any image codec. At 100 TB the codec UDFs see only
    // (id, 64-int array)-narrow rows and the join is banded — never
    // all-pairs on images.
    "q149_image_phash_dedup" -> ((s, dir) => {
      import s.implicits._
      val px = t(s, dir, "embeddings").select($"vec_id",
        expr("transform(embedding, e -> cast(least(greatest(" +
          "floor((cast(e as double) + 1.0d) * 127.5d), 0d), 255d) as int))")
          .as("px"))
      val edited = px.select(($"vec_id" * 2 + 1).as("img_id"),
        expr("transform(px, (v, i) -> if(i = cast(vec_id % 64 as int), " +
          "least(v + 8, 255), v))").as("px"))
      val imgs = px.select(($"vec_id" * 2).as("img_id"), $"px")
        .unionByName(edited)
      // no codec repartition here: the PNG round-trip is ~0.5 ms/image,
      // so at bench scale the few-task layout beats the extra
      // shuffle+task overhead a 32-way spread costs (measured; q162's
      // 4 ms/clip JPEG chain is the opposite case)
      val render = udf((p: Seq[Int]) =>
        graft.multimodal.Multimodal.renderGray8x8(p))
      val fps = graft.multimodal.Multimodal
        .perceptualHash(imgs.withColumn("content", render($"px")))
        .select($"img_id".as("id"), $"phash".as("fp"))
      Dedup.fingerprintDuplicatePairs(fps, maxDist = 3, maxBucket = 256)
        .orderBy($"idA", $"idB")
    }),

    // Audio fingerprint near-dup (VERDICT r9 #2) — the WAV codec as a
    // dedup CONSUMER, completing the image(q149)/audio pair. Embedding
    // vectors are quantized to 16-bit sample ints (sv = 4·floor(e·4096),
    // each held for 4 frames), encoded as REAL RIFF/WAVE bytes (plus
    // one planted half-gain re-master per clip with a single further-
    // attenuated segment: the "volume-normalized edited copy" case),
    // decoded back through WavCodec's windowed-RMS feature path into a
    // 60-bit mean-energy fingerprint, then fed to the SAME banded-
    // hamming machinery as SimHash/q149 (4×15-bit bands, hub cut,
    // exact hamming verify). Constant-valued windows make the
    // WAV→decode→feature→hash round-trip exact in integers
    // (WavCodec.audioFingerprint60), so the DuckDB oracle replays the
    // hash relationally from the quantized ints with no audio codec.
    // The mean-relative bits are gain-invariant by construction, so the
    // re-master differs only where it was actually edited. At 100 TB
    // the codec UDFs see (id, 64-int array)-narrow rows and the join
    // is banded — never all-pairs on audio.
    "q161_audio_fp_dedup" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "embeddings").select($"vec_id",
        expr("transform(embedding, e -> cast(4 * floor(cast(e as double)" +
          " * 4096.0d) as int))").as("sv"))
      val edited = base.select(($"vec_id" * 2 + 1).as("clip_id"),
        expr("transform(sv, (v, i) -> cast(if(i = cast(vec_id % 60 as int)," +
          " v div 4, v div 2) as int))").as("sv"))
      val clips = base.select(($"vec_id" * 2).as("clip_id"), $"sv")
        .unionByName(edited)
      val enc = udf((p: Seq[Int]) =>
        graft.multimodal.WavCodec.encodePcm16(p.flatMap(v => Seq.fill(4)(v))))
      val fpU = udf((b: Array[Byte]) =>
        graft.multimodal.WavCodec.audioFingerprint60(b))
      val fps = clips.select($"clip_id".as("id"), fpU(enc($"sv")).as("fp"))
      Dedup.fingerprintDuplicatePairs(fps, maxDist = 3, maxBucket = 256)
        .orderBy($"idA", $"idB")
    }),

    // Video near-dup (VERDICT r9 #3) — closes the multimodal trio
    // (image q149, audio q161, video here). Each embedding becomes a
    // 4-frame MJPEG/AVI clip: frame f is an 8×8 grid of 0/255 blocks
    // encoding the SIGNS of a rotated view of the vector (4 forced-high
    // + 4 forced-low margin cells keep every averageHash64 decision far
    // from the mean threshold — see AviCodec.renderBlockFrame), plus
    // one planted re-encode per clip with a single block toggled in a
    // single frame (the "edited scene" case). The REAL pipeline runs
    // container-build → RIFF parse → frame extract → Annex-K DHT
    // splice → JPEG decode → per-frame averageHash64; doc-level dedup
    // bands on (frame position, frame hash) with the hub cut and
    // verifies by exact shared-position count ≥ 3 of 4
    // (Dedup.frameHashDuplicatePairs). The oracle replays the frame
    // hashes relationally from the embedding signs — no video codec.
    // At 100 TB: codec UDFs are narrow per-clip work, the join is
    // banded on frame hashes — never all-pairs on clips.
    "q162_video_frame_dedup" -> ((s, dir) => {
      import s.implicits._
      val cells = t(s, dir, "embeddings").select($"vec_id",
        expr("transform(sequence(0, 3), f -> transform(sequence(0, 63)," +
          " j -> case when j < 4 then 255 when j < 8 then 0" +
          " when cast(element_at(embedding," +
          " cast((j + 16 * f) % 64 as int) + 1) as double) > 0d" +
          " then 255 else 0 end))").as("cells"))
      val edited = cells.select(($"vec_id" * 2 + 1).as("clip_id"),
        expr("transform(cells, (fr, f) -> if(f = cast(vec_id % 4 as int)," +
          " transform(fr, (v, j) -> if(j = cast(8 + vec_id % 52 as int)," +
          " 255 - v, v)), fr))").as("cells"))
      // spread the codec work: the embeddings parquet is 1-2 files, so
      // without this the ~4 ms/clip JPEG encode+decode chain runs on
      // 1-2 tasks while 30 cores idle (measured: 10.4 s -> 2.5 s; 16
      // partitions ties 32 with less per-stage task overhead). At
      // 100 TB this repartition is sized by bytes/core, not a constant
      // — Multimodal.partitionByBytes is that knob.
      val clips = cells.select(($"vec_id" * 2).as("clip_id"), $"cells")
        .unionByName(edited)
        .repartition(16, $"clip_id")
      val mk = udf((cs: Seq[Seq[Int]]) => graft.multimodal.AviCodec.buildAvi(
        cs.map(c => graft.multimodal.AviCodec.renderBlockFrame(c)), 64, 64))
      val fh = udf((b: Array[Byte]) => graft.multimodal.AviCodec
        .sampleFrames(b, 4)
        .map(fr => graft.multimodal.ImageIoCodec.averageHash64(fr)))
      val fhs = clips.select($"clip_id".as("id"), fh(mk($"cells")).as("fhs"))
      Dedup.frameHashDuplicatePairs(fhs, minShared = 3, maxBucket = 256)
        .orderBy($"idA", $"idB")
    }),

    // MinHash-LSH near-dup pairs, exact-jaccard verified, in PORTABLE
    // (md5-family) mode: shingle hashes, affine-permutation signatures,
    // band keys, the hub cut and the verification all replay exactly in
    // the DuckDB oracle (DedupPortableSql.minhashOracleSql) → full hash
    // check. The xxhash64 kernel path stays the 100 TB default
    // (Dedup.minhashDuplicatePairs) and is cross-checked in
    // TextKernelsSpec/DedupPortableSpec.
    "q51_minhash_lsh" -> ((s, dir) => {
      import s.implicits._
      DedupPortable.minhashDuplicatePairsPortable(t(s, dir, "documents"),
          "doc_id", "text", k = 3, numPerm = 64, bands = 16, threshold = 0.7)
        .orderBy($"idA", $"idB")
    }),

    // Near-dup provenance matrix: every LSH pair attributed to its
    // (source, source) cell — the "which sources mirror each other"
    // report a curation team reads before deciding what to crawl less
    // of. The pair relation is the q51 scale path verbatim (banded
    // LSH, hub cut); attribution is two doc-keyed equi-joins against
    // the (id, source) projection; the matrix is a |sources|²-bounded
    // hash-agg.
    "q255_dup_provenance" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val src = docs.select($"doc_id", $"source")
      DedupPortable.minhashDuplicatePairsPortable(docs,
          "doc_id", "text", k = 3, numPerm = 64, bands = 16, threshold = 0.7)
        .join(src.select($"doc_id".as("idA"), $"source".as("sa")), "idA")
        .join(src.select($"doc_id".as("idB"), $"source".as("sb")), "idB")
        .select(least($"sa", $"sb").as("src_a"),
          greatest($"sa", $"sb").as("src_b"))
        .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"src_a", $"src_b")
    }),

    // Incremental delta-vs-corpus dedup (the daily-crawl pass): docs
    // with doc_id % 10 == 0 play the new batch, the rest the standing
    // corpus. Corpus bands are pruned by a BROADCAST of the delta's
    // band keys (the corpus never shuffles), oversized corpus buckets
    // contribute only their min-id rep, delta-within-delta takes the
    // shared hub-cut join. Portable md5 family -> full DuckDB replay.
    "q110_incremental_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      DedupPortable.incrementalMinhashPortable(
          docs.filter($"doc_id" % 10 =!= 0), docs.filter($"doc_id" % 10 === 0),
          "doc_id", "text", k = 3, numPerm = 64, bands = 16, threshold = 0.7)
        .orderBy($"id")
    }),

    // SimHash near-dup pairs (hamming ≤ 3), portable mode: 60-bit
    // md5-derived fingerprints, 4×15-bit bands — full DuckDB replay.
    "q52_simhash_neardup" -> ((s, dir) => {
      import s.implicits._
      DedupPortable.simhashDuplicatePairsPortable(t(s, dir, "documents"),
          "doc_id", "text", maxDist = 3)
        .orderBy($"idA", $"idB")
    }),

    // SEMANTIC benchmark decontamination (the embedding-space sibling
    // of q77's n-gram gate): train vectors (vec_id % 25 != 0) flag
    // when their MAX cosine against the broadcast eval set
    // (vec_id % 25 == 0) crosses the threshold. The synthetic corpus
    // is near-orthogonal (max cross-set cosine ≈ 0.46), so the 0.35
    // fixture threshold sits inside the actual mass — real pipelines
    // run 0.9+ on meaningful embeddings; the MACHINERY (broadcast
    // eval, one corpus scan, codegen cosine, exact max, order-free
    // flag) is what this row pins.
    "q282_embed_decontam" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.embeddingDecontaminate(
          emb.filter($"vec_id" % 25 =!= 0), emb.filter($"vec_id" % 25 === 0),
          "vec_id", "embedding", "label", threshold = 0.35)
        .orderBy($"vec_id")
    }),

    // Brute-force cosine top-5 for 10 query vectors: broadcast queries,
    // ONE corpus scan, per-query window top-k. Oracle-checked.
    "q53_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 5)
        .select($"query_id", $"vec_id", round($"sim", 4).as("sim"), $"rk")
        .orderBy($"query_id", $"rk")
    }),

    // Distributed PCA (Similarity.pcaTopComponent): top principal
    // component of the 64-dim embedding corpus by 10 power-iteration
    // rounds over the relational covariance — one corpus scan for the
    // moments, d^2-row iterations, decimal-quantized sums everywhere,
    // so the oracle replays the unrolled iterations bit-for-bit even
    // before convergence.
    "q242_pca_top" -> ((s, dir) => {
      import s.implicits._
      sharedPcaComponent(s, dir).orderBy($"dim")
    }),

    // All-but-the-top post-processing (Similarity.removeTopComponent):
    // center + remove the q242 component from every embedding; output
    // the per-vector projection on the removed direction and the
    // residual norm — the downstream cosine family consumes `resid`.
    "q244_pca_residual" -> ((s, dir) => {
      import s.implicits._
      Similarity.removeTopComponent(t(s, dir, "embeddings"),
          "vec_id", "embedding",
          precomputed = Some(sharedPcaComponent(s, dir)))
        .select($"vec_id", round($"proj", 6).as("proj"),
          round(sqrt(Similarity.dotHof($"resid", $"resid")), 6)
            .as("resid_norm"))
        .orderBy($"vec_id")
    }),

    // Exact near-dup pairs above cosine 0.3 inside a blocked sample.
    "q54_embed_neardup" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
        .filter($"label" === 0 && $"vec_id" % 5 === 0)
      Similarity.nearDupPairs(emb, "vec_id", "embedding", "label", 0.3)
        .select($"idA", $"idB", round($"sim", 4).as("sim"))
        .orderBy($"idA", $"idB")
    }),

    // ANN top-k via random-hyperplane LSH (16 bits, 4 bands): the
    // 100 TB path — equi-join on band keys, exact cosine only on
    // colliding candidates. Oracle-checked END-TO-END: the seed-derived
    // hyperplanes are embedded as literals in the DuckDB SQL, which
    // replays signatures, multi-probe key fan-out, the band join and
    // the final top-k exactly (recall vs q53 additionally in spec).
    "q55_ann_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.annTopK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 5)
        .select($"query_id", $"vec_id", round($"sim", 4).as("sim"), $"rk")
        .orderBy($"query_id", $"rk")
    }),

    // Winnowing fingerprint near-dup pairs, portable mode: the
    // rightmost-min selection is encoded arithmetically
    // ((h40<<20)+max(0, 2^20-1-i), window min) so DuckDB replays selection,
    // candidate join and verification exactly. The byte-rolling kernel
    // (Dedup.winnowDuplicatePairs) stays the 100 TB default.
    "q57_winnow_neardup" -> ((s, dir) => {
      import s.implicits._
      DedupPortable.winnowDuplicatePairsPortable(t(s, dir, "documents"),
          "doc_id", "text", k = 16, w = 8, threshold = 0.5)
        .orderBy($"idA", $"idB")
    }),

    // Per-label embedding centroids (element-wise mean): the cluster/
    // class prototype computation — posexplode + one aggregation, long
    // format so the oracle compares scalars. Oracle-checked.
    "q59_embed_centroid" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select($"label", posexplode($"embedding").as(Seq("pos", "e")))
        .groupBy($"label", $"pos")
        .agg(round(avg($"e".cast("double")), 4).as("v"))
        .orderBy($"label", $"pos")
    }),

    // Deterministic EXACT-k per-language sample (md5-ordered ranking —
    // the oracle reproduces the identical 40 docs per stratum).
    "q66_group_sample" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Ops.groupSampleMd5(
          t(s, dir, "documents"), "lang", "doc_id", k = 40)
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // Deterministic stratified sample via an md5 hash threshold (md5 is
    // standardized, so the DuckDB oracle reproduces the EXACT sample —
    // not just its proportions). The xxhash64 variant stays the hot
    // path; proportions + determinism asserted in OpsSpec for both.
    "q58_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Ops.stratifiedSampleMd5(
          t(s, dir, "documents"), "lang", "doc_id",
          Map("en" -> 0.5, "es" -> 1.0, "fr" -> 0.25, "de" -> 1.0, "zh" -> 1.0))
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // Top-k over int8-QUANTIZED embeddings (both sides): the 4×
    // bandwidth-reduction path for ANN at scale, exact-replayed in the
    // oracle because quantization is pure floor/multiply arithmetic.
    // Quantization fidelity vs the float top-k (q53) is asserted in
    // DedupSimSpec.
    "q65_quantized_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.quantizedTopK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 5)
        .select($"query_id", $"vec_id", round($"sim", 4).as("sim"), $"rk")
        .orderBy($"query_id", $"rk")
    }),

    // ANN top-k via IVF (16 coarse lists, probe 4): the other scale
    // path. Oracle-checked END-TO-END: md5-ordered seeds, argmax-cosine
    // assignment, probe ranking and candidate top-k are all replayed
    // exactly in DuckDB (no cosine ties exist — embeddings are unique).
    "q56_ivf_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 5)
        .select($"query_id", $"vec_id", round($"sim", 4).as("sim"), $"rk")
        .orderBy($"query_id", $"rk")
    }),

    // SemDeDup-style semantic dedup (cluster-then-prune, Similarity
    // .semDedup): 16 md5-anchored clusters, intra-cluster dominance
    // drop at cosine 0.3. Oracle-checked END-TO-END — anchor choice,
    // argmax assignment, the pair dominance test and the anti join all
    // replay exactly in DuckDB.
    "q99_semdedup" -> ((s, dir) => {
      import s.implicits._
      Similarity.semDedup(t(s, dir, "embeddings"),
          "vec_id", "embedding", k = 16, tau = 0.3)
        .select($"vec_id", $"cluster",
          round($"anchor_sim", 4).as("anchor_sim"))
        .orderBy($"vec_id")
    }),

    // Distributed k-means (2 Lloyd iterations, k=8): md5-anchored
    // deterministic init (q99's convention), then the fully RELATIONAL
    // iteration — points and centroids exploded to (id, pos, value),
    // distances as decimal-exact sums over an equi-join on pos, argmin
    // via min(struct(d2, cluster)) (no window), centroid update a
    // decimal mean. Every arithmetic step is order-independent, so two
    // full iterations replay hash-exact in the oracle. At 100 TB:
    // centroids are k×dim rows (broadcast), points shuffle once per
    // iteration on vec_id — the standard MLlib plan re-expressed
    // declaratively.
    "q131_kmeans" -> ((s, dir) => {
      import s.implicits._
      val k = 8
      val emb = t(s, dir, "embeddings")
      // referenced by BOTH assign() calls and BOTH update() calls —
      // persist or the scan+explode re-runs four times per query
      // (Catalyst shares no common subtrees across actions)
      val pts = emb
        .select($"vec_id", posexplode($"embedding").as(Seq("pos", "af")))
        .select($"vec_id", $"pos", $"af".cast("double").as("a"))
        .persist()
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"h") // 8 rows post-limit — not a data-scale sort
      val anchors = emb
        .withColumn("h", substring(md5($"vec_id".cast("string")), 1, 16))
        .orderBy($"h").limit(k)
        .withColumn("cluster", (row_number().over(w) - 1).cast("int"))
      val cent0 = anchors
        .select($"cluster", posexplode($"embedding").as(Seq("pos", "cf")))
        .select($"cluster", $"pos", $"cf".cast("double").as("c"))
      // Assignment is a NARROW pass: centroids are k×dim values (a
      // bounded algorithm constant at ANY corpus size), so they ride
      // to the driver and back as literals, and the argmin is
      // least(struct(d2_j, j)) per row — no explode, no join, no
      // shuffle. The per-term arithmetic is IDENTICAL to the exploded
      // formulation the oracle replays: double (a-c)² cast to
      // decimal(30,12), summed exactly (decimal addition is
      // order-independent), so cluster picks match bit-for-bit.
      def assign(cent: org.apache.spark.sql.DataFrame) = {
        val byCluster = cent.collect()
          .groupBy(r => r.getAs[Number]("cluster").intValue())
          .view.mapValues(rs =>
            rs.map(r => (r.getAs[Number]("pos").intValue(),
              r.getAs[Double]("c"))).sortBy(_._1).map(_._2))
          .toSeq.sortBy(_._1)
        val structs = byCluster.map { case (j, cs) =>
          val centLit = array(cs.map(v => lit(v)): _*)
          struct(
            aggregate(
              zip_with($"embedding", centLit, (a, c) => {
                val d = a.cast("double") - c
                (d * d).cast("decimal(30,12)")
              }),
              lit(java.math.BigDecimal.ZERO).cast("decimal(20,12)"),
              // (20,12)+(30,12) promotes to (31,12) — scale PRESERVED
              // (a 38,12 accumulator would promote to (38,11), silently
              // rounding the 12th decimal each step); the cast back to
              // (20,12) is lossless for d2 ≤ 4·64
              (acc, x) => (acc + x).cast("decimal(20,12)")).as("d2"),
            lit(j).as("cluster"))
        }
        emb.select($"vec_id", least(structs: _*).getField("cluster")
          .cast("int").as("cluster"))
      }
      def update(a: org.apache.spark.sql.DataFrame) = pts.join(a, "vec_id")
        .groupBy($"cluster", $"pos")
        .agg((sum($"a".cast("decimal(30,12)")).cast("double") /
          count(lit(1))).as("c"))
      val c1 = update(assign(cent0))
      // a2 feeds the final centroids AND the size count — persist or
      // the entire two-iteration chain executes twice
      val a2 = assign(c1).persist()
      val c2 = update(a2)
      val sizes = a2.groupBy($"cluster").agg(count(lit(1)).as("n"))
      c2.join(sizes, "cluster")
        .select($"cluster", $"n", $"pos", round($"c", 4).as("v"))
        .orderBy($"cluster", $"pos")
    }),

    // Product-quantization ANN (ADC): corpus stored as 4 codes per
    // vector (64× smaller than float32 at scale), queries score rows
    // by m table lookups + a decimal add — no per-pair vector math.
    // Codebooks are the portable md5-ordered sample (q56's seeds), so
    // the oracle replays encode AND search decimal-exactly.
    "q175_pq_adc_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 5)
        .select($"query_id", $"vec_id",
          round($"adc".cast("double"), 6).as("adc"), $"rk")
        .orderBy($"query_id", $"rk")
    }),

    // EXACT Jaccard similarity self-join via prefix filtering
    // (AllPairs/PPJoin family): every pair with word-set jaccard
    // >= 0.9, zero false negatives, no quadratic stage — the exact
    // complement to q51's probabilistic LSH. The rarest tokens carry
    // the candidate equi-join; hot common words never enter the
    // shuffle. Oracle: the definitionally-exact shared-token
    // all-pairs replay (bounded at sf0.01; the Spark plan is the one
    // that survives 100 TB).
    "q170_prefix_jaccard_join" -> ((s, dir) => {
      import s.implicits._
      Dedup.prefixJaccardPairs(t(s, dir, "documents"),
          "doc_id", "text", threshold = 0.9)
        .select($"idA", $"idB", round($"jac", 4).as("jac"))
        .orderBy($"idA", $"idB")
    }),

    // q170's starEdges output mode (VERDICT r12 #1): the LINEAR
    // certificate of the same clustering — rep→member edges at 1.0
    // within each exact-duplicate shape, ONE rep→rep edge per
    // qualifying shape pair. Same candidate/verify plan as q170; the
    // member² expansion never runs. Oracle: shapes from sorted
    // distinct token arrays, within-stars directly, cross edges from
    // the definitional pair replay restricted to shape REPS.
    "q224_prefix_jaccard_star" -> ((s, dir) => {
      import s.implicits._
      Dedup.prefixJaccardPairs(t(s, dir, "documents"),
          "doc_id", "text", threshold = 0.9, pairsMode = "starEdges")
        .select($"idA", $"idB", round($"jac", 4).as("jac"))
        .orderBy($"idA", $"idB")
    }),

    // Classifier evaluation over the q180 holdout predictions:
    // per-label confusion counts → precision/recall/F1 as fixed-order
    // doubles over exact integers. The whole evaluation is two tiny
    // hash-aggs on the (prediction, actual) pairs — at 100 TB the
    // pair relation is the only thing that scales, the metric table
    // stays |labels| rows.
    "q197_classifier_eval" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val test = emb.filter($"vec_id" % 10 === 0)
      val train = emb.filter($"vec_id" % 10 =!= 0)
      val pred = Similarity.knnClassify(train, test, "vec_id",
          "embedding", "label", k = 5)
        .join(test.select($"vec_id".as("query_id"),
          $"label".as("actual")), "query_id")
      val tp = sum(when($"predicted" === $"actual", 1L).otherwise(0L))
      val byPred = pred.groupBy($"predicted".as("label"))
        .agg(count(lit(1)).as("n_pred"), tp.as("tp_p"))
      val byActual = pred.groupBy($"actual".as("label"))
        .agg(count(lit(1)).as("n_actual"), tp.as("tp_a"))
      byActual.join(byPred, Seq("label"), "full_outer")
        .select($"label",
          coalesce($"n_actual", lit(0L)).as("n_actual"),
          coalesce($"n_pred", lit(0L)).as("n_pred"),
          coalesce($"tp_a", lit(0L)).as("tp"))
        .withColumn("precision", when($"n_pred" > 0,
          round($"tp".cast("double") / $"n_pred".cast("double"), 6)))
        .withColumn("recall", when($"n_actual" > 0,
          round($"tp".cast("double") / $"n_actual".cast("double"), 6)))
        .withColumn("f1", when($"tp" > 0, round(
          ($"tp".cast("double") * 2.0) /
            ($"n_pred".cast("double") + $"n_actual".cast("double")), 6)))
        .orderBy($"label")
    }),

    // k-NN majority-vote classification on a 10% id-hash holdout:
    // broadcast queries, ONE labeled-corpus scan (codegen cosine),
    // label votes in a tiny hash-agg, deterministic winner. The vote
    // stage is neighbor-source-agnostic — at 100 TB the corpus scan
    // swaps for ANN candidates, nothing else changes.
    "q180_knn_classify" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val test = emb.filter($"vec_id" % 10 === 0)
      val train = emb.filter($"vec_id" % 10 =!= 0)
      Similarity.knnClassify(train, test, "vec_id", "embedding",
          "label", k = 5)
        .join(test.select($"vec_id".as("query_id"),
          $"label".as("actual")), "query_id")
        .select($"query_id", $"predicted", $"actual",
          ($"predicted" === $"actual").as("correct"))
        .orderBy($"query_id")
    })
  )

  private val shinglesSql =
    """list_distinct(list_transform(range(1, len(ws) - 1),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))""".stripMargin

  /** Cosine over two named list columns (lambda var `ii` avoids
    * shadowing any outer `i` column).
    */
  private def cosOf(a: String, b: String) =
    s"""(list_sum(list_transform(range(1, len($a) + 1),
       |      ii -> CAST($a[ii] AS DOUBLE) * CAST($b[ii] AS DOUBLE)))
       |  / (sqrt(list_sum(list_transform(range(1, len($a) + 1),
       |      ii -> CAST($a[ii] AS DOUBLE) * CAST($a[ii] AS DOUBLE))))
       |   * sqrt(list_sum(list_transform(range(1, len($b) + 1),
       |      ii -> CAST($b[ii] AS DOUBLE) * CAST($b[ii] AS DOUBLE))))))""".stripMargin

  /** The q55 oracle: generated SQL embedding the 16 seed-derived
    * 64-dim hyperplanes as literal lists (the same
    * `Similarity.hyperplanes(16, 64)` every executor derives).
    */
  private def annOracleSql: String = {
    val planes = Similarity.hyperplanes(16, 64)
    def dotPlane(p: Array[Double]) =
      s"""list_sum(list_transform(range(1, 65),
         |      ii -> CAST(embedding[ii] AS DOUBLE) *
         |            (${p.mkString("[", ", ", "]")}[ii])))""".stripMargin
    val sigExpr = (0 until 16).map(i =>
      s"(CASE WHEN ${dotPlane(planes(i))} >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString("\n    + ")
    s"""WITH sigs AS (
       |  SELECT vec_id, embedding,
       |    ($sigExpr) AS sig
       |  FROM embeddings),
       |corpus AS (
       |  SELECT vec_id, embedding, b, (sig >> (b * 4)) & 15 AS key
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
       |qkeys AS (
       |  SELECT vec_id AS query_id, embedding AS qe, b,
       |    xor((sig >> (b * 4)) & 15, f) AS key
       |  FROM sigs
       |  CROSS JOIN (SELECT unnest(range(0, 4)) AS b)
       |  CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8]) AS f)
       |  WHERE vec_id < 10),
       |cand AS (
       |  SELECT DISTINCT q.query_id, c.vec_id, c.embedding, q.qe
       |  FROM corpus c JOIN qkeys q ON c.b = q.b AND c.key = q.key
       |  WHERE c.vec_id <> q.query_id),
       |sims AS (
       |  SELECT query_id, vec_id,
       |    ${cosOf("embedding", "qe")} AS sim
       |  FROM cand)
       |SELECT query_id, vec_id, round(sim, 4) AS sim, rk FROM (
       |  SELECT query_id, vec_id, sim,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim DESC, vec_id ASC) AS rk
       |  FROM sims) WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin
  }

  private[queries] val cosSql =
    """list_sum(list_transform(range(1, len(ea) + 1),
      |      i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)))
      |  / (sqrt(list_sum(list_transform(range(1, len(ea) + 1),
      |      i -> CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE))))
      |   * sqrt(list_sum(list_transform(range(1, len(eb) + 1),
      |      i -> CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)))))""".stripMargin

  /** Shared q242/q244 CTE chain: embedding moments, covariance, and
    * 10 unrolled power-iteration rounds ending in v10(i, v, nrm) —
    * per-term decimal(30,12) quantization before every sum makes each
    * iteration order-free; all scalar ops are fixed-order IEEE, so
    * both engines trace the identical trajectory. Every multiply-
    * referenced CTE is MATERIALIZED: DuckDB inlines CTEs by default,
    * and each w_k feeding both n_k and v_k would otherwise double the
    * expansion per iteration — 2^10 copies of the corpus moment scan.
    */
  private lazy val pcaCtes: String = {
    val its = (1 to 10).map { k =>
      val pv = s"v${k - 1}"
      s"""w$k AS MATERIALIZED (
         |  SELECT c.i, CAST(sum(CAST(c.c * v.v AS DECIMAL(30,12)))
         |    AS DOUBLE) AS w
         |  FROM c JOIN $pv v ON v.i = c.j GROUP BY c.i),
         |n$k AS (SELECT sqrt(CAST(sum(CAST(w * w AS DECIMAL(30,12)))
         |  AS DOUBLE)) AS nrm FROM w$k),
         |v$k AS MATERIALIZED (SELECT i, w / nrm AS v, nrm FROM w$k, n$k)"""
    }.mkString(",\n")
    s"""e AS MATERIALIZED (SELECT embedding AS e FROM embeddings),
       |mom AS MATERIALIZED (
       |  SELECT CAST(ii.i - 1 AS INT) AS i, CAST(jj.j - 1 AS INT) AS j,
       |    sum(CAST(CAST(e[ii.i] AS DOUBLE) * CAST(e[jj.j] AS DOUBLE)
       |      AS DECIMAL(30,12))) AS sxy
       |  FROM e,
       |    LATERAL unnest(range(1, len(e) + 1)) ii(i),
       |    LATERAL unnest(range(1, len(e) + 1)) jj(j)
       |  GROUP BY 1, 2),
       |mx AS MATERIALIZED (
       |  SELECT CAST(ii.i - 1 AS INT) AS i,
       |    sum(CAST(CAST(e[ii.i] AS DOUBLE) AS DECIMAL(30,12))) AS sx
       |  FROM e, LATERAL unnest(range(1, len(e) + 1)) ii(i)
       |  GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM e),
       |c AS MATERIALIZED (
       |  SELECT m.i, m.j,
       |    CAST(m.sxy AS DOUBLE) / n - (CAST(a.sx AS DOUBLE) / n)
       |      * (CAST(b.sx AS DOUBLE) / n) AS c
       |  FROM mom m JOIN mx a ON a.i = m.i JOIN mx b ON b.i = m.j, nn),
       |dd AS (SELECT CAST(max(i) + 1 AS DOUBLE) AS d FROM mx),
       |v0 AS (SELECT i, 1.0 / sqrt(d) AS v FROM mx, dd),
       |$its"""
  }

  /** Shared CTE chain producing the q180 kNN prediction relation
    * (train/test split, neighbor ranks, votes, winner) — consumed by
    * both the q180 and q197 oracles.
    */
  private lazy val knnPredCtes: String =
    s"""c AS (SELECT vec_id, embedding AS ea, label
       |           FROM embeddings WHERE vec_id % 10 <> 0),
       |q AS (SELECT vec_id, embedding AS eb, label
       |      FROM embeddings WHERE vec_id % 10 = 0),
       |nn AS (
       |  SELECT query_id, lab FROM (
       |    SELECT query_id, lab, row_number() OVER (
       |      PARTITION BY query_id ORDER BY sim DESC, nid ASC) AS rk
       |    FROM (
       |      SELECT q.vec_id AS query_id, c.vec_id AS nid,
       |        c.label AS lab, $cosSql AS sim
       |      FROM c, q))
       |  WHERE rk <= 5),
       |votes AS (
       |  SELECT query_id, lab, count(*) AS votes
       |  FROM nn GROUP BY query_id, lab),
       |win AS (
       |  SELECT query_id, lab AS predicted FROM (
       |    SELECT query_id, lab, row_number() OVER (
       |      PARTITION BY query_id ORDER BY votes DESC, lab ASC) AS r
       |    FROM votes)
       |  WHERE r = 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // q175: full PQ replay — same md5-ordered codebook sample, same
    // decimal squared-L2 per subspace (pos//16), same argmin
    // tie-breaks, same ADC table-lookup sum.
    "q175_pq_adc_topk" ->
      """WITH pts AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS a
        |  FROM embeddings),
        |anchors AS (
        |  SELECT row_number() OVER (
        |      ORDER BY substr(md5(CAST(vec_id AS VARCHAR)), 1, 16)) - 1 AS j,
        |    embedding
        |  FROM embeddings
        |  ORDER BY substr(md5(CAST(vec_id AS VARCHAR)), 1, 16) LIMIT 16),
        |cw AS (
        |  SELECT CAST(j AS INT) AS j,
        |    generate_subscripts(embedding, 1) - 1 AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS c
        |  FROM anchors),
        |dists AS (
        |  SELECT p.vec_id, w.j, p.pos // 16 AS s,
        |    sum(CAST((p.a - w.c) * (p.a - w.c) AS DECIMAL(30,12))) AS d2
        |  FROM pts p JOIN cw w ON p.pos = w.pos
        |  GROUP BY 1, 2, 3),
        |codes AS (
        |  SELECT vec_id, s, j AS code FROM (
        |    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s
        |      ORDER BY d2 ASC, j ASC) AS rk
        |    FROM dists) WHERE rk = 1),
        |adc AS (
        |  SELECT qd.vec_id AS query_id, x.vec_id AS vec_id,
        |    sum(qd.d2) AS adc
        |  FROM codes x
        |  JOIN dists qd ON qd.s = x.s AND qd.j = x.code
        |  WHERE qd.vec_id < 10 AND x.vec_id <> qd.vec_id
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT query_id, vec_id, adc,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc ASC, vec_id ASC) AS rk
        |  FROM adc)
        |SELECT query_id, vec_id, round(CAST(adc AS DOUBLE), 6) AS adc, rk
        |FROM r WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin,

    // Definitionally-exact replay of q170: ALL pairs sharing >= 1
    // token, exact |A∩B|/|A∪B|. Quadratic in shared-token df — fine
    // at sf0.01, which is the point of the prefix-filter plan.
    "q170_prefix_jaccard_join" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents),
        |tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
        |sz AS (SELECT doc_id, count(*) AS n FROM tok2 GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS i
        |  FROM tok2 a JOIN tok2 b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT idA, idB, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac
        |  FROM inter
        |  JOIN sz sa ON sa.doc_id = inter.idA
        |  JOIN sz sb ON sb.doc_id = inter.idB)
        |SELECT idA, idB, round(jac, 4) AS jac
        |FROM j WHERE jac >= 0.9 ORDER BY idA, idB""".stripMargin,

    // Star-edge certificate: within-shape stars at exactly 1.0 plus
    // the q170 definitional pair replay over one representative per
    // shape (rep = min doc_id of its sorted distinct token array).
    "q224_prefix_jaccard_star" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents),
        |tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
        |shape AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list(tok)), chr(1))) AS skey
        |  FROM tok2 GROUP BY doc_id),
        |rep AS (SELECT skey, min(doc_id) AS rep FROM shape GROUP BY skey),
        |within AS (
        |  SELECT r.rep AS idA, s.doc_id AS idB, 1.0 AS jac
        |  FROM shape s JOIN rep r ON s.skey = r.skey
        |  WHERE s.doc_id <> r.rep),
        |rt AS (
        |  SELECT t.doc_id, t.tok FROM tok2 t
        |  JOIN rep r ON t.doc_id = r.rep),
        |sz AS (SELECT doc_id, count(*) AS n FROM rt GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS i
        |  FROM rt a JOIN rt b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |cross_e AS (
        |  SELECT idA, idB, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac
        |  FROM inter
        |  JOIN sz sa ON sa.doc_id = inter.idA
        |  JOIN sz sb ON sb.doc_id = inter.idB)
        |SELECT idA, idB, round(jac, 4) AS jac FROM (
        |  SELECT idA, idB, jac FROM cross_e WHERE jac >= 0.9
        |  UNION ALL SELECT idA, idB, jac FROM within)
        |ORDER BY idA, idB""".stripMargin,

    "q59_embed_centroid" ->
      """SELECT label, i - 1 AS pos, round(avg(CAST(e AS DOUBLE)), 4) AS v
        |FROM (SELECT label, unnest(embedding) AS e,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,

    "q50_jaccard_pairs" ->
      s"""WITH d AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 500)))
         |SELECT a.doc_id AS idA, b.doc_id AS idB,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jac
         |FROM d a JOIN d b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
         |ORDER BY idA, idB""".stripMargin,

    "q71_cluster_survivor" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 500))),
         |q AS (
         |  SELECT doc_id, ${graft.queries.TextQueries.qualitySql()} AS quality
         |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 500)),
         |p AS (
         |  SELECT a.doc_id AS ida, b.doc_id AS idb
         |  FROM d a JOIN d b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         |e AS (SELECT ida AS a, idb AS b FROM p
         |      UNION SELECT idb, ida FROM p),
         |reach AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
         |  WHERE e2.b <> r.a),
         |cl AS (SELECT a AS id, least(a, min(b)) AS rep
         |       FROM reach GROUP BY a),
         |asg AS (SELECT id, rep FROM cl
         |        UNION ALL
         |        SELECT doc_id, doc_id FROM q
         |        WHERE doc_id NOT IN (SELECT id FROM cl)),
         |rnk AS (
         |  SELECT asg.rep, asg.id, q.quality,
         |    row_number() OVER (PARTITION BY asg.rep
         |      ORDER BY q.quality DESC, asg.id ASC) AS rk
         |  FROM asg JOIN q ON asg.id = q.doc_id)
         |SELECT rep, max(CASE WHEN rk = 1 THEN id END) AS keep_id,
         |  max(CASE WHEN rk = 1 THEN quality END) AS kept_quality,
         |  count(*) AS family
         |FROM rnk GROUP BY rep ORDER BY rep""".stripMargin,

    "q48_dup_clusters" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, $shinglesSql AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 500))),
         |p AS (
         |  SELECT a.doc_id AS ida, b.doc_id AS idb
         |  FROM d a JOIN d b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         |e AS (SELECT ida AS a, idb AS b FROM p
         |      UNION SELECT idb, ida FROM p),
         |reach AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
         |  WHERE e2.b <> r.a)
         |SELECT a AS id, least(a, min(b)) AS rep
         |FROM reach GROUP BY a ORDER BY id""".stripMargin,

    // same neighbor ranks (sim desc, id asc), same vote count, same
    // (votes desc, label asc) winner pick
    "q180_knn_classify" ->
      s"""WITH $knnPredCtes
         |SELECT w.query_id, w.predicted, q.label AS actual,
         |  (w.predicted = q.label) AS correct
         |FROM win w JOIN q ON q.vec_id = w.query_id
         |ORDER BY w.query_id""".stripMargin,

    // same prediction relation (shared CTEs), same confusion counts
    // and fixed-order precision/recall/F1 arithmetic
    "q197_classifier_eval" ->
      s"""WITH $knnPredCtes,
         |pred AS (
         |  SELECT w.query_id, w.predicted, q.label AS actual
         |  FROM win w JOIN q ON q.vec_id = w.query_id),
         |byp AS (
         |  SELECT predicted AS label, count(*) AS n_pred,
         |    CAST(sum(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tp_p
         |  FROM pred GROUP BY predicted),
         |bya AS (
         |  SELECT actual AS label, count(*) AS n_actual,
         |    CAST(sum(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tp_a
         |  FROM pred GROUP BY actual)
         |SELECT label,
         |  coalesce(n_actual, 0) AS n_actual,
         |  coalesce(n_pred, 0) AS n_pred,
         |  coalesce(tp_a, 0) AS tp,
         |  CASE WHEN coalesce(n_pred, 0) > 0 THEN
         |    round(CAST(coalesce(tp_a, 0) AS DOUBLE)
         |      / CAST(n_pred AS DOUBLE), 6) END AS precision,
         |  CASE WHEN coalesce(n_actual, 0) > 0 THEN
         |    round(CAST(coalesce(tp_a, 0) AS DOUBLE)
         |      / CAST(n_actual AS DOUBLE), 6) END AS recall,
         |  CASE WHEN coalesce(tp_a, 0) > 0 THEN
         |    round((CAST(coalesce(tp_a, 0) AS DOUBLE) * 2.0)
         |      / (CAST(coalesce(n_pred, 0) AS DOUBLE)
         |         + CAST(coalesce(n_actual, 0) AS DOUBLE)), 6) END AS f1
         |FROM bya FULL OUTER JOIN byp USING (label)
         |ORDER BY label""".stripMargin,

    // q282 oracle: the same cross-set max — max over doubles is exact
    // selection, round is output-only, the flag compares the RAW max.
    "q282_embed_decontam" ->
      s"""SELECT vec_id, label, round(m, 4) AS max_eval_sim,
         |  m >= 0.35 AS contaminated
         |FROM (
         |  SELECT c.vec_id, c.label, max($cosSql) AS m
         |  FROM (SELECT vec_id, label, embedding AS ea FROM embeddings
         |        WHERE vec_id % 25 != 0) c,
         |       (SELECT embedding AS eb FROM embeddings
         |        WHERE vec_id % 25 = 0) q
         |  GROUP BY c.vec_id, c.label)
         |ORDER BY vec_id""".stripMargin,

    "q53_cosine_topk" ->
      s"""SELECT query_id, vec_id, round(sim, 4) AS sim, rk FROM (
         |  SELECT query_id, vec_id, sim, row_number() OVER (
         |    PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rk
         |  FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id,
         |      $cosSql AS sim
         |    FROM (SELECT vec_id, embedding AS ea FROM embeddings) c,
         |         (SELECT vec_id, embedding AS eb FROM embeddings WHERE vec_id < 10) q
         |    WHERE c.vec_id != q.vec_id))
         |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    // q242 oracle: moments via the double LATERAL index unnest,
    // covariance from exact decimal sums, then the 10 power-iteration
    // rounds UNROLLED as generated CTEs (pcaCtes, shared with q244).
    "q242_pca_top" ->
      s"""WITH $pcaCtes
         |SELECT i AS dim, round(v, 6) AS loading, round(nrm, 6) AS eigenvalue
         |FROM v10 ORDER BY dim""".stripMargin,

    // q244 oracle: the pcaCtes chain + the published (6-dp) component
    // and the exact-double mean packed into one-row lists, then pure
    // per-vector list arithmetic — proj is the q53 sequential-fold
    // dot convention; resid_norm reuses the RAW proj (rounding is
    // output-only), exactly like the Spark side.
    "q244_pca_residual" ->
      s"""WITH $pcaCtes,
         |vv AS (SELECT list(round(v, 6) ORDER BY i) AS vl FROM v10),
         |mm AS (SELECT list(CAST(sx AS DOUBLE) / n ORDER BY i) AS ml
         |  FROM mx, nn),
         |pr AS (
         |  SELECT vec_id,
         |    list_sum(list_transform(range(1, len(embedding) + 1),
         |      i -> (CAST(embedding[i] AS DOUBLE) - ml[i]) * vl[i])) AS p
         |  FROM embeddings, vv, mm)
         |SELECT pr.vec_id, round(p, 6) AS proj,
         |  round(sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
         |    i -> ((CAST(embedding[i] AS DOUBLE) - ml[i]) - p * vl[i])
         |       * ((CAST(embedding[i] AS DOUBLE) - ml[i]) - p * vl[i])))), 6)
         |    AS resid_norm
         |FROM pr JOIN embeddings USING (vec_id), vv, mm
         |ORDER BY pr.vec_id""".stripMargin,

    "q66_group_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) WHERE rk <= 40
        |ORDER BY doc_id""".stripMargin,

    "q58_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
        |  CASE lang WHEN 'en' THEN '80000000' WHEN 'es' THEN 'zzzzzzzz'
        |            WHEN 'fr' THEN '40000000' WHEN 'de' THEN 'zzzzzzzz'
        |            WHEN 'zh' THEN 'zzzzzzzz' ELSE '00000000' END
        |ORDER BY doc_id""".stripMargin,

    // Full replays of the portable near-dup pipelines (md5 hash
    // family — see DedupPortable / DedupPortableSql).
    "q51_minhash_lsh" -> DedupPortableSql.minhashOracleSql(
      numPerm = 64, bands = 16, threshold = 0.7, maxBucket = 64),
    "q255_dup_provenance" -> DedupPortableSql.minhashProvenanceOracleSql(
      numPerm = 64, bands = 16, threshold = 0.7, maxBucket = 64),
    "q147_lsh_dup_clusters" -> DedupPortableSql.minhashClustersOracleSql(
      numPerm = 64, bands = 16, threshold = 0.7, maxBucket = 64),
    "q148_lsh_survivorship" -> DedupPortableSql.minhashSurvivorOracleSql(
      numPerm = 64, bands = 16, threshold = 0.7, maxBucket = 64),
    "q209_leakage_safe_split" -> DedupPortableSql.leakageSafeSplitOracleSql(
      numPerm = 64, bands = 16, threshold = 0.7, maxBucket = 64, salt = "v1"),
    "q213_containment_dedup" -> DedupPortableSql.containmentOracleSql(
      threshold = 0.8, maxBucket = 64),
    "q218_incremental_containment" -> DedupPortableSql
      .incrementalContainmentOracleSql(threshold = 0.8, maxBucket = 64),
    "q149_image_phash_dedup" -> DedupPortableSql.imagePhashOracleSql(
      maxDist = 3, maxBucket = 256),
    "q161_audio_fp_dedup" -> DedupPortableSql.audioFpOracleSql(
      maxDist = 3, maxBucket = 256),
    "q162_video_frame_dedup" -> DedupPortableSql.videoFrameOracleSql(
      minShared = 3, maxBucket = 256),
    "q157_corpus_recipe" -> DedupPortableSql.corpusRecipeOracleSql(
      numPerm = 64, bands = 16, threshold = 0.7, maxBucket = 64,
      lang = "en", minQuality = 0.3),
    "q110_incremental_dedup" -> DedupPortableSql.incrementalOracleSql(
      numPerm = 64, bands = 16, threshold = 0.7, maxBucket = 64,
      deltaPred = "doc_id % 10 = 0"),
    "q52_simhash_neardup" -> DedupPortableSql.simhashOracleSql(
      maxDist = 3, maxBucket = 256),
    "q57_winnow_neardup" -> DedupPortableSql.winnowOracleSql(
      k = 16, w = 8, threshold = 0.5, maxBucket = 64),

    // Full LSH-ANN replay: the deterministic hyperplanes (seeded
    // splitmix doubles — shortest-round-trip decimal literals parse to
    // identical IEEE bits) are embedded in the SQL; signature bits,
    // 4-bit band keys, the [0,1,2,4,8] multi-probe XOR fan-out, the
    // band equi-join and the top-k all replayed. The corpus hub-bucket
    // thinning is a no-op at this scale (500 vectors < maxBucket=1024),
    // so the oracle omits it.
    "q55_ann_topk" -> annOracleSql,

    // Full IVF replay: same seeds (md5-prefix order), same assignment
    // tie-break (max list id — array_max on struct(s,i)), same probe
    // tie-break (stable sort = min list id), same final top-k ordering.
    "q56_ivf_topk" ->
      s"""WITH seeds AS (
         |  SELECT row_number() OVER (
         |      ORDER BY substr(md5(CAST(vec_id AS VARCHAR)), 1, 16)) - 1 AS i,
         |    embedding AS ce
         |  FROM embeddings
         |  ORDER BY substr(md5(CAST(vec_id AS VARCHAR)), 1, 16) LIMIT 16),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, s.i,
         |    ${cosOf("e.embedding", "s.ce")} AS cs
         |  FROM embeddings e CROSS JOIN seeds s),
         |assigned AS (
         |  SELECT vec_id, embedding, i AS list FROM (
         |    SELECT vec_id, embedding, i,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY cs DESC, i DESC) AS rk
         |    FROM scored) WHERE rk = 1),
         |probed AS (
         |  SELECT vec_id AS query_id, embedding AS qe, i AS list FROM (
         |    SELECT vec_id, embedding, i,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY cs DESC, i ASC) AS rk
         |    FROM scored WHERE vec_id < 10) WHERE rk <= 4),
         |cand AS (
         |  SELECT DISTINCT p.query_id, a.vec_id, a.embedding, p.qe
         |  FROM assigned a JOIN probed p ON a.list = p.list
         |  WHERE a.vec_id <> p.query_id),
         |sims AS (
         |  SELECT query_id, vec_id,
         |    ${cosOf("embedding", "qe")} AS sim
         |  FROM cand)
         |SELECT query_id, vec_id, round(sim, 4) AS sim, rk FROM (
         |  SELECT query_id, vec_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id ASC) AS rk
         |  FROM sims) WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin,

    // SemDeDup replay: anchors/assignment share the q56 conventions
    // (md5-ordered seeds, argmax tie-break toward the HIGHER anchor
    // index — Spark's array_max over struct(s, i)); the dominance drop
    // is a cluster-equi self-join with the rank test in the join
    // predicate, the survivors an anti join.
    "q99_semdedup" ->
      s"""WITH anchors AS (
         |  SELECT row_number() OVER (
         |      ORDER BY substr(md5(CAST(vec_id AS VARCHAR)), 1, 16)) - 1 AS i,
         |    embedding AS ce
         |  FROM embeddings
         |  ORDER BY substr(md5(CAST(vec_id AS VARCHAR)), 1, 16) LIMIT 16),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, a.i,
         |    ${cosOf("e.embedding", "a.ce")} AS cs
         |  FROM embeddings e CROSS JOIN anchors a),
         |assigned AS (
         |  SELECT vec_id, embedding, CAST(i AS INTEGER) AS cluster,
         |    cs AS anchor_sim
         |  FROM (
         |    SELECT vec_id, embedding, i, cs,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY cs DESC, i DESC) AS rk
         |    FROM scored) WHERE rk = 1),
         |dropped AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM assigned a JOIN assigned b ON a.cluster = b.cluster
         |    AND (b.anchor_sim < a.anchor_sim
         |      OR (b.anchor_sim = a.anchor_sim AND b.vec_id < a.vec_id))
         |  WHERE ${cosOf("a.embedding", "b.embedding")} >= 0.3)
         |SELECT vec_id, cluster, round(anchor_sim, 4) AS anchor_sim
         |FROM assigned
         |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
         |ORDER BY vec_id""".stripMargin,

    "q131_kmeans" -> {
      def distCte(name: String, cent: String) =
        s"""$name AS (
           |  SELECT p.vec_id, c.cluster,
           |    sum(CAST((p.a - c.c) * (p.a - c.c) AS DECIMAL(30,12))) AS d2
           |  FROM pts p JOIN $cent c ON p.pos = c.pos GROUP BY 1, 2)""".stripMargin
      def assignCte(name: String, dist: String) =
        s"""$name AS (
           |  SELECT vec_id, cluster FROM (
           |    SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY d2 ASC, cluster ASC) AS rk FROM $dist) WHERE rk = 1)""".stripMargin
      def updateCte(name: String, asg: String) =
        s"""$name AS (
           |  SELECT g.cluster, p.pos,
           |    CAST(sum(CAST(p.a AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS c
           |  FROM pts p JOIN $asg g ON p.vec_id = g.vec_id GROUP BY 1, 2)""".stripMargin
      s"""WITH pts AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS a
         |  FROM embeddings),
         |anchors AS (
         |  SELECT row_number() OVER (
         |      ORDER BY substr(md5(CAST(vec_id AS VARCHAR)), 1, 16)) - 1
         |      AS cluster,
         |    embedding
         |  FROM embeddings
         |  ORDER BY substr(md5(CAST(vec_id AS VARCHAR)), 1, 16) LIMIT 8),
         |cent0 AS (
         |  SELECT CAST(cluster AS INT) AS cluster,
         |    generate_subscripts(embedding, 1) - 1 AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS c
         |  FROM anchors),
         |${distCte("da", "cent0")},
         |${assignCte("a1", "da")},
         |${updateCte("c1", "a1")},
         |${distCte("db", "c1")},
         |${assignCte("a2", "db")},
         |${updateCte("c2", "a2")},
         |sizes AS (SELECT cluster, count(*) AS n FROM a2 GROUP BY 1)
         |SELECT c2.cluster, sizes.n, c2.pos, round(c2.c, 4) AS v
         |FROM c2 JOIN sizes ON c2.cluster = sizes.cluster
         |ORDER BY c2.cluster, c2.pos""".stripMargin
    },

    // int8 quantization replay: same floor/multiply arithmetic, then
    // the q53 cosine/top-k shape over dequantized lists.
    "q65_quantized_topk" ->
      s"""WITH dq AS (
         |  SELECT vec_id,
         |    CASE WHEN mx > 0 THEN
         |      list_transform(embedding,
         |        v -> CAST(floor(CAST(v AS DOUBLE) / (mx / 127.0) + 0.5) AS BIGINT)
         |             * (mx / 127.0))
         |    ELSE list_transform(embedding, v -> 0.0) END AS e
         |  FROM (SELECT vec_id, embedding,
         |          list_max(list_transform(embedding,
         |            v -> abs(CAST(v AS DOUBLE)))) AS mx
         |        FROM embeddings)),
         |sims AS (
         |  SELECT q.vec_id AS query_id, c.vec_id,
         |    ${cosOf("c.e", "q.qe")} AS sim
         |  FROM dq c CROSS JOIN (SELECT vec_id, e AS qe FROM dq WHERE vec_id < 10) q
         |  WHERE c.vec_id <> q.vec_id)
         |SELECT query_id, vec_id, round(sim, 4) AS sim, rk FROM (
         |  SELECT query_id, vec_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id ASC) AS rk
         |  FROM sims) WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin,

    "q54_embed_neardup" ->
      s"""SELECT idA, idB, round(sim, 4) AS sim FROM (
         |  SELECT a.vec_id AS idA, b.vec_id AS idB, $cosSql AS sim
         |  FROM (SELECT vec_id, embedding AS ea FROM embeddings
         |        WHERE label = 0 AND vec_id % 5 = 0) a,
         |       (SELECT vec_id, embedding AS eb FROM embeddings
         |        WHERE label = 0 AND vec_id % 5 = 0) b
         |  WHERE a.vec_id < b.vec_id)
         |WHERE sim >= 0.3 ORDER BY idA, idB""".stripMargin
  )
}
