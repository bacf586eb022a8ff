package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer — the REAL merge-table algorithm
  * (Sennrich et al. 2016, the public BPE formulation GPT-2/SentencePiece
  * descend from), replacing the `bpeTokenEstimate` regex heuristic when
  * an actual subword segmentation is needed.
  *
  * Scale shape: training never collects the corpus — it aggregates the
  * WORD FREQUENCY table (vocabulary-bounded, capped at `maxVocab` by
  * frequency) with one distributed hash-agg, then runs the standard
  * iterative merge loop driver-side over that bounded table (the same
  * division of labor as kmeansCentroids: heavy scan distributed, tiny
  * state iterated on the driver). Application is a per-row expression
  * whose merge table ships with the plan (≤ numMerges entries).
  *
  * Determinism: pair-count ties break to the lexicographically
  * smallest pair, so the merge table is a pure function of the word
  * frequency table.
  */
object Bpe {

  type Merge = (String, String)

  /** End-of-word marker (its own symbol, Sennrich convention). */
  val Eow = "</w>"

  /** Train `numMerges` merges from a text column: one distributed
    * word-count agg (top `maxVocab` words by (freq desc, word asc)),
    * then the classic driver-side merge loop.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 50000): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val wordFreq = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    trainFromCounts(wordFreq, numMerges)
  }

  /** The merge loop over an explicit word-frequency table. */
  def trainFromCounts(wordFreq: Seq[(String, Long)],
                      numMerges: Int): Seq[Merge] = {
    // each word as its symbol sequence (chars + end-of-word marker)
    var words: Vector[(Vector[String], Long)] = wordFreq.toVector.map {
      case (w, f) => (w.map(_.toString).toVector :+ Eow, f)
    }
    val merges = Vector.newBuilder[Merge]
    var done = 0
    while (done < numMerges) {
      val counts = scala.collection.mutable.Map[Merge, Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = numMerges
      else {
        // max count, ties to the lexicographically smallest pair
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }
        done += 1
      }
    }
    merges.result()
  }

  /** Encode one word (no spaces) with a ranked merge table — the
    * standard lowest-rank-first loop. Returns subword symbols, last
    * one carrying the end-of-word marker.
    */
  def encodeWord(word: String, ranks: Map[Merge, Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = word.map(_.toString).toVector :+ Eow
    var go = true
    while (go && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) go = false
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  def encodeText(text: String, ranks: Map[Merge, Int]): Array[String] =
    text.split(" ").iterator.filter(_.nonEmpty)
      .flatMap(encodeWord(_, ranks)).toArray

  /** Column API: subword tokens (array<string>) for a text column. */
  def encode(text: Column, merges: Seq[Merge]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpeEncodeExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), merges))
}

/** Per-row BPE application. The merge table rides the expression
  * (bounded by numMerges); interpreted eval (CodegenFallback) — the
  * per-row cost is the tokenizer loop itself, not expression
  * dispatch, so codegen would buy little here.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[Bpe.Merge])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val ranks: Map[Bpe.Merge, Int] =
    merges.zipWithIndex.toMap

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects a string input, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    new GenericArrayData(Bpe.encodeText(t.asInstanceOf[UTF8String].toString,
      ranks).map(s => UTF8String.fromString(s): Any))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
