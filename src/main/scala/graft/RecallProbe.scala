package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN recall measurement harness: recall@k of annTopK (hyperplane LSH,
  * hub-cut engaged) and ivfTopK vs bruteForceTopK ground truth, swept
  * over the tuning knob each path exposes (multiProbe / nProbe). Run at
  * sf0.1 to ground the defaults in evidence — results recorded in
  * SCALE.md (VERDICT r5 #6); DedupSimSpec pins floors at sf0.01 so a
  * recall regression fails the suite.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "10").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_NQ", "50").toInt
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < nQ)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k))

    def recall(found: Set[(Long, Long)]): Double =
      (found & exact).size.toDouble / exact.size

    val annSweep = Seq(0, 1, 2).map { mp =>
      mp -> recall(pairs(
        Similarity.annTopK(emb, queries, "vec_id", "embedding", k, multiProbe = mp)))
    }
    val ivfSweep = Seq(2, 4, 8).map { np =>
      np -> recall(pairs(
        Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k, nProbe = np)))
    }
    // Lloyd-refined coarse quantizer: better-balanced lists → recall at
    // the same nProbe scan fraction.
    val ivfKmSweep = Seq(4, 8).map { np =>
      np -> recall(pairs(
        Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k,
          nProbe = np, kmeansIters = 2)))
    }
    val corpusN = emb.count()
    spark.stop()
    val annJson = annSweep.map { case (m, r) => s"\"multiProbe_$m\":$r" }.mkString(",")
    val ivfJson = ivfSweep.map { case (n, r) => s"\"nProbe_$n\":$r" }.mkString(",")
    val ivfKmJson = ivfKmSweep.map { case (n, r) => s"\"nProbe_$n\":$r" }.mkString(",")
    println(s"""{"sf":"$sfDir","corpus":$corpusN,"k":$k,"queries":$nQ,"ann":{$annJson},"ivf":{$ivfJson},"ivf_kmeans2":{$ivfKmJson}}""")
  }
}
