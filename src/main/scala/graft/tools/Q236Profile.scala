package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profile of q236 (char-bigram language ID) at sf0.1 —
  * VERDICT r17 #2: the r17 kernel closed the generator cost but the
  * row's floor didn't move, so measure where the ~5 s actually goes.
  * Stages are cumulative prefixes of the real plan (each timed as a
  * noop write of exactly that prefix), so differences attribute cost
  * to the stage added:
  *
  *   A  unseg projection (regexp strip + reverse)        — scan-bound
  *   B  A + scoring-side bigram kernel + explode          — generator
  *   C  A + training gramTable (kernel + hash-agg + ckpt) — training
  *   D  full bigramLangId                                 — + joins/aggs
  *
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.Q236Profile
  * (3 passes round-robin, min per stage; results recorded in
  * BASELINE.md's q236 floor table.)
  */
object Q236Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def unseg: DataFrame = {
      val stripped = regexp_replace(col("text"), " ", "")
      spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "aa").otherwise("bb").as("lang"),
        when(col("doc_id") % 2 === 0, stripped).otherwise(reverse(stripped))
          .as("text"))
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()


    def scorePairs: DataFrame = unseg
      .select(col("doc_id").as("__id"),
        explode(graft.functions.NgramCountExpr.bigramCounts(col("text"),
          "char")).as("__e"))
      .select(col("__id"), col("__e.w1").as("__w1"),
        col("__e.w2").as("__w2"), col("__e.c").as("__c"))
      .withColumn("__bg", concat(col("__w1"), lit(" "), col("__w2")))

    def withGrams(f: (DataFrame, DataFrame) => Unit): Unit = {
      val grams = unseg.select(col("lang").as("__lab"),
          explode(graft.functions.NgramCountExpr.gramCounts(col("text"),
            "char")).as("__e"))
        .select(col("__lab"), col("__e.w1").as("__w1"),
          col("__e.w2").as("__w2"), col("__e.c").as("__c"))
        .groupBy(col("__lab"), col("__w1"), col("__w2"))
        .agg(sum(col("__c")).as("__cnt"))
        .localCheckpoint()
      val uTab = grams.filter(col("__w2").isNull)
        .select(col("__lab"), col("__w1"), col("__cnt").as("__u"))
      val vTab = uTab.groupBy(col("__lab")).agg(count(lit(1)).as("__v"))
      f(grams, vTab)
      grams.unpersist(false)
      ()
    }

    val stages: Seq[(String, () => Unit)] = Seq(
      "A_unseg_projection" -> (() => noop(unseg)),
      "B_scoring_kernel" -> (() => noop(unseg.select(col("doc_id"),
        explode(graft.functions.NgramCountExpr.bigramCounts(col("text"),
          "char")).as("e")))),
      "C_training_gramtable" -> (() => {
        // gramTable's exact shape: fused kernel + (lab, w1, w2)
        // hash-agg + eager localCheckpoint (the checkpoint IS part of
        // the stage cost being attributed)
        val g = unseg.select(col("lang").as("__lab"),
            explode(graft.functions.NgramCountExpr.gramCounts(col("text"),
              "char")).as("__e"))
          .select(col("__lab"), col("__e.w1").as("__w1"),
            col("__e.w2").as("__w2"), col("__e.c").as("__c"))
          .groupBy(col("__lab"), col("__w1"), col("__w2"))
          .agg(sum(col("__c")).as("__cnt"))
          .localCheckpoint()
        noop(g)
        g.unpersist(false)
        ()
      }),
      "D_full_q236" -> (() => noop(graft.queries.CurationQueries
        .queries("q236_lm_char_langid")(spark, sfDir))),
      // E..I: cumulative prefixes of bigramLangId's scoring tail
      // (internals replicated verbatim for attribution)
      "E_score_pairs_bg" -> (() => noop(scorePairs)),
      "F_xjoin_vtab" -> (() => withGrams { (grams, vTab) =>
        noop(scorePairs.crossJoin(broadcast(vTab))) }),
      "G_join_btab" -> (() => withGrams { (grams, vTab) =>
        val bTab = grams.filter(col("__w2").isNotNull)
          .select(col("__lab"),
            concat(col("__w1"), lit(" "), col("__w2")).as("__bg"),
            col("__cnt").as("__b"))
        noop(scorePairs.crossJoin(broadcast(vTab))
          .join(bTab, Seq("__lab", "__bg"), "left")) }),
      "I_doclab_agg" -> (() => withGrams { (grams, vTab) =>
        val bTab = grams.filter(col("__w2").isNotNull)
          .select(col("__lab"),
            concat(col("__w1"), lit(" "), col("__w2")).as("__bg"),
            col("__cnt").as("__b"))
        val uTab = grams.filter(col("__w2").isNull)
          .select(col("__lab"), col("__w1"), col("__cnt").as("__u"))
        val k = 0.5
        val logp = log(
          (coalesce(col("__b"), lit(0L)).cast("double") + lit(k)) /
            (coalesce(col("__u"), lit(0L)).cast("double") +
              lit(k) * col("__v").cast("double")))
        noop(scorePairs.crossJoin(broadcast(vTab))
          .join(bTab, Seq("__lab", "__bg"), "left")
          .join(uTab, Seq("__lab", "__w1"), "left")
          .select(col("__id"), col("__lab"), col("__c"),
            (logp.cast("decimal(18,12)") *
              col("__c").cast("decimal(19,0)")).as("__lpw"))
          .groupBy(col("__id"), col("__lab"))
          .agg(sum(col("__c")).as("__nb"), sum(col("__lpw")).as("__s"))) }),
      "J_real_langid" -> (() => noop(graft.operators.Curation.bigramLangId(
        unseg, "lang", unseg, "doc_id", "text", k = 0.5,
        ngramMode = "char"))),
      "K_construct_only" -> (() => {
        graft.operators.Curation.bigramLangId(
          unseg, "lang", unseg, "doc_id", "text", k = 0.5,
          ngramMode = "char")
        ()
      }))


    val mins = scala.collection.mutable.Map.empty[String, Double]
    for (pass <- 1 to 3; (tag, f) <- stages) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      f()
      val s = (System.nanoTime() - t0) / 1e9
      mins(tag) = math.min(mins.getOrElse(tag, Double.MaxValue), s)
      println(f"q236profile pass=$pass $tag%-22s $s%6.2f s")
    }
    println(stages.map { case (t, _) =>
      f"$t=${mins(t)}%.2f" }.mkString("q236profile mins: ", "  ", ""))
    spark.stop()
  }
}
