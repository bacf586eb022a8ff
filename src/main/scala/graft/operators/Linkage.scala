package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StringSimilarity

/** Record linkage / entity resolution over a single relation.
  *
  * The classic ER pipeline: BLOCK (cheap equality keys bound the
  * quadratic pair space) → PAIR (self-join inside each block, ordered
  * ids so each unordered pair appears once) → SCORE (scan-speed
  * string-similarity kernel) → LINK (threshold). The reference engine
  * has no join surface at all (rorabr/dbitool TODO:61-75 leaves
  * "lookup/join" to future work), so this whole category is
  * north-star depth, not parity.
  *
  * Scale design: the self-join shuffles the relation ONCE by the
  * blocking key (sort-merge or shuffled-hash; Catalyst's choice), and
  * the per-block cross product is bounded by `maxBlock` — the
  * standard production guard, because one hot block (e.g. a null-ish
  * or default-valued key) otherwise explodes quadratically: a single
  * 10M-row block is 5·10¹³ candidate pairs no cluster will finish.
  * Oversized blocks are DROPPED, mirroring e.g. Dedoop/record-linkage
  * practice of routing them to a finer blocking pass instead; the
  * block-size relation (≤ one row per distinct key) is
  * broadcast-joined, so the guard costs one map-side aggregate and
  * no extra shuffle of the data.
  */
object Linkage {

  /** Candidate pairs within blocks, each unordered pair once
    * (`id1 < id2`), from blocks of at most `maxBlock` rows. Output:
    * block columns + `id1, id2, <payload>1, <payload>2`.
    */
  def candidatePairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      blockCols: Seq[String],
      maxBlock: Int): DataFrame = {
    val bc = blockCols.map(col)
    val small = df.groupBy(bc: _*).agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") <= maxBlock)
      .drop("_bsz")
    val in = df.join(broadcast(small), blockCols, "left_semi")
    val a = in.select(
      bc :+ col(idCol).as("id1") :+ col(payloadCol).as("_p1"): _*)
    val b = in.select(
      bc :+ col(idCol).as("id2") :+ col(payloadCol).as("_p2"): _*)
    a.join(b, blockCols).filter(col("id1") < col("id2"))
  }

  /** Blocked Jaro-Winkler linkage: pairs whose payload similarity
    * meets `threshold`. Output: `id1, id2, score` (raw double — the
    * kernel is bit-pinned to the classic definition, so scores are
    * reproducible across engines).
    */
  def jaroWinklerLinks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      threshold: Double,
      maxBlock: Int = 1 << 16): DataFrame =
    candidatePairs(df, idCol, textCol, blockCols, maxBlock)
      .withColumn("score", StringSimilarity.jaroWinkler(col("_p1"), col("_p2")))
      .filter(col("score") >= threshold)
      .select("id1", "id2", "score")

  /** Blocked edit-distance profile: how far apart are co-blocked
    * payloads? One row per observed Levenshtein distance — the shape
    * analysts run FIRST to pick a linkage threshold. Uses Spark's
    * codegen'd built-in `levenshtein` (identical classic DP to the
    * oracle's).
    */
  def editDistanceHistogram(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      maxBlock: Int = 1 << 16): DataFrame =
    candidatePairs(df, idCol, textCol, blockCols, maxBlock)
      .select(levenshtein(col("_p1"), col("_p2")).as("dist"))
      .groupBy("dist").agg(count(lit(1)).as("n_pairs"))

  /** NFC-canonicalize a text column — the normalize-before-hash step
    * every exact-dedup / fingerprint pass needs so that combining-mark
    * sequences and precomposed characters hash identically.
    */
  def nfcNormalized(c: Column): Column = StringSimilarity.nfcNormalize(c)
}
