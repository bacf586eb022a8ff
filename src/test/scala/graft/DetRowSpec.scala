package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.testkit.DetRow
import graft.sources.Sources
import graft.sinks.Sinks

/** Self-validating round-trips in the reference's TestRow spirit: any
  * surviving row can be re-derived from its first column alone.
  */
class DetRowSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_detrow").toString

  test("derive is deterministic and self-checking") {
    (0L until 200L).foreach(n => DetRow.check(DetRow.derive(n)))
    assert(DetRow.derive(7) == DetRow.derive(7))
    intercept[IllegalArgumentException] {
      val r = DetRow.derive(5)
      DetRow.check(org.apache.spark.sql.Row(
        r.getLong(0), r.getInt(1) + 1, r.getDouble(2), r.get(3),
        r.getString(4), r.getString(5), r.getString(6)))
    }
  }

  test("csv round-trip self-validates all 300 rows") {
    val df = DetRow.frame(spark, 300)
    val out = tmp()
    Sinks.csv(df, out)
    val back = Sources.csv(spark, out, schema = Some(DetRow.schema))
    val rows = back.collect()
    assert(rows.length == 300)
    rows.foreach(DetRow.check)
  }

  test("ndjson round-trip self-validates") {
    val df = DetRow.frame(spark, 300)
    val out = tmp()
    Sinks.ndjson(df, out)
    val rows = Sources.ndjson(spark, out, Some(DetRow.schema)).collect()
    assert(rows.length == 300)
    rows.foreach(DetRow.check)
  }

  test("bson round-trip self-validates (timestamp as micros)") {
    import org.apache.spark.sql.functions._
    // BSON codec speaks int64, not timestamps: encode as epoch micros.
    val df = DetRow.frame(spark, 120)
      .withColumn("date", unix_micros(col("date")))
    val out = tmp() + "/d.bson"
    graft.formats.Bson.write(df, out)
    val back = graft.formats.Bson.read(spark, out)
      .withColumn("date", timestamp_micros(col("date")))
      .select(DetRow.schema.fieldNames.map(col): _*)
    val rows = back.collect()
    assert(rows.length == 120)
    rows.foreach(DetRow.check)
  }
}
