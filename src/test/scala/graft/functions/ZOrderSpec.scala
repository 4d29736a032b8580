package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places left bits on even and right bits on odd positions") {
    assert(ZOrder2.spread(0x3L) == 0x5L)
    assert(ZOrder2.spread(0xffffffffL) == 0x5555555555555555L)
    assert(ZOrder2.interleave(3L, 5L) == 39L)
    assert(ZOrder2.interleave(0L, 0L) == 0L)
    // full 32-bit inputs fill the whole long
    assert(ZOrder2.interleave(0xffffffffL, 0xffffffffL) == -1L)
  }

  test("interleave is invertible: even/odd bit extraction recovers the inputs") {
    def unspread(z: Long): Long =
      (0 until 32).foldLeft(0L)((acc, i) => acc | (((z >>> (2 * i)) & 1L) << i))
    val samples = Seq((0L, 0L), (1L, 2L), (12345L, 67890L),
      (0xffffffffL, 0L), (0xdeadbeefL, 0xcafebabeL))
    samples.foreach { case (a, b) =>
      val z = ZOrder2.interleave(a, b)
      assert(unspread(z) == a && unspread(z >>> 1) == b)
    }
  }

  test("codegen'd column path equals the Scala reference on a range") {
    val df = spark.range(1000)
      .select(col("id"), (col("id") * 2654435761L % 100000).as("b"))
    val got = df.select(col("id"), col("b"),
        ZOrder2.zorder2(col("id"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrder2.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("z-ordered sort interleaves both dimensions (locality smoke check)") {
    // on an 8x8 grid, sorting by zkey must NOT be a lexicographic sort by
    // either dimension alone — both coordinates advance within any
    // 16-element prefix (the defining Z-curve behavior)
    val grid = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val sorted = grid.sortBy { case (x, y) => ZOrder2.interleave(x, y) }
    val prefix = sorted.take(16)
    assert(prefix.map(_._1).distinct.size > 1)
    assert(prefix.map(_._2).distinct.size > 1)
    // and the first quadrant (x,y < 4) occupies exactly the first 16 slots
    assert(prefix.forall { case (x, y) => x < 4 && y < 4 })
  }
}
