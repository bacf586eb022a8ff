package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ArrayMath
import graft.operators.Similarity

class ArrayMathSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")

  test("codegen cosine is bit-identical to the HOF formulation") {
    val both = emb.as("a").crossJoin(emb.as("b"))
      .filter($"a.vec_id" < 40 && $"b.vec_id" < 40 && $"a.vec_id" < $"b.vec_id")
      .select(
        Similarity.cosine($"a.embedding", $"b.embedding").as("fast"),
        Similarity.cosineHof($"a.embedding", $"b.embedding").as("ref"))
    val diff = both.filter($"fast" =!= $"ref").count()
    assert(diff == 0, s"$diff pairs differ")
  }

  test("codegen dot matches HOF dot") {
    val both = emb.as("a").crossJoin(emb.as("b"))
      .filter($"a.vec_id" < 20 && $"b.vec_id" === 0)
      .select(
        ArrayMath.dotProduct($"a.embedding", $"b.embedding").as("fast"),
        Similarity.dotHof($"a.embedding", $"b.embedding").as("ref"))
    assert(both.filter($"fast" =!= $"ref").count() == 0)
  }

  test("null input yields null") {
    val df = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(ArrayMath.cosineSimilarity($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("works on double arrays too") {
    val df = Seq((Array(1.0, 0.0), Array(1.0, 0.0))).toDF("a", "b")
    assert(df.select(ArrayMath.cosineSimilarity($"a", $"b"))
      .head().getDouble(0) == 1.0)
  }

  test("interpreted eval path (filter on eval) agrees with codegen") {
    // Force interpreted eval by using the expression in a context where
    // constant folding applies.
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val gen = df.select(ArrayMath.dotProduct($"a", $"b")).head().getDouble(0)
    assert(gen == (4.0 + 10.0 + 18.0))
  }

  test("quantizeDequantize corner semantics: nulls pass through, NaN poisons, zero vector") {
    import graft.operators.Similarity
    // null elements: kernel matches the HOF composition (array_max
    // skips nulls; transform emits null elements)
    val df = spark.range(1).select(
      expr("array(CAST(2.54 AS DOUBLE), NULL, CAST(-1.27 AS DOUBLE))").as("a"))
    val k = df.select(ArrayMath.quantizeDequantize($"a")).head().getSeq[Any](0)
    val h = df.select(Similarity.dequantize(Similarity.quantizeInt8($"a")))
      .head().getSeq[Any](0)
    assert(k == h, s"kernel=$k hof=$h")
    assert(k(1) == null && k(0) == 2.54)
    // NaN element: every non-null output is NaN (poisoned scale)
    val nan = spark.range(1)
      .select(expr("array(CAST('NaN' AS DOUBLE), CAST(1.0 AS DOUBLE))").as("a"))
      .select(ArrayMath.quantizeDequantize($"a")).head().getSeq[Double](0)
    assert(nan.forall(_.isNaN))
    // zero vector: all zeros out
    val z = spark.range(1)
      .select(expr("array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE))").as("a"))
      .select(ArrayMath.quantizeDequantize($"a")).head().getSeq[Double](0)
    assert(z.forall(_ == 0.0))
  }
}
