package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ops

class ZorderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Bit-by-bit reference Morton encode (the slow obvious loop). */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zorder2 matches the bit-by-bit reference on random coordinates") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Ops.zorder2($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y), s"($x,$y)")
    }
    // masks only see the low 16 bits, so big keys can't corrupt bits
    val big = Seq((65536L + 3L, 2L)).toDF("x", "y")
      .select(Ops.zorder2($"x", $"y")).head.getLong(0)
    assert(big == mortonRef(3L, 2L))
  }

  test("zorderWrite yields files local in BOTH dimensions; x-sort does not") {
    val n = 32
    val grid = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val dz = java.nio.file.Files.createTempDirectory("zord").toString
    Ops.zorderWrite(grid.repartition(8), "x", "y", dz, numFiles = 16)

    def spans(dir: String): Seq[(Long, Long)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          val d = spark.read.parquet(f.getAbsolutePath)
            .agg(max($"x") - min($"x"), max($"y") - min($"y")).head
          (d.getLong(0), d.getLong(1))
        }

    val zs = spans(dz)
    assert(zs.size > 1)
    // every z-clustered file covers a sub-rectangle, never a full slab
    assert(zs.forall { case (sx, sy) => sx < n - 1 && sy < n - 1 },
      s"z-order file spans: $zs")

    // baseline: 1-D x-sort gives thin x slabs whose y span is the FULL
    // range — the layout z-order exists to beat
    val dx = java.nio.file.Files.createTempDirectory("xsort").toString
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(dx)
    val xs = spans(dx)
    assert(xs.forall { case (_, sy) => sy == n - 1 }, s"x-sort spans: $xs")
  }
}
