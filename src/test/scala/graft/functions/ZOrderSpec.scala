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

  test("zorderk at k=2 reproduces ZOrder2's bit layout exactly") {
    val samples = Seq((0L, 0L), (1L, 2L), (12345L, 67890L),
      (0xffffffffL, 0L), (0xdeadbeefL, 0xcafebabeL))
    samples.foreach { case (a, b) =>
      val k2 = ZOrderK.spreadK(a, 2, 0) | ZOrderK.spreadK(b, 2, 1)
      assert(k2 == ZOrder2.interleave(a, b), s"($a, $b)")
    }
  }

  test("zorderk is invertible over its 64/k bits for k = 3 and 4") {
    def unspreadK(z: Long, k: Int, offset: Int): Long =
      (0 until 64 / k).foldLeft(0L)((acc, b) =>
        acc | (((z >>> (b * k + offset)) & 1L) << b))
    for (k <- Seq(3, 4)) {
      val mask = (1L << (64 / k)) - 1
      val samples = Seq.tabulate(k)(i => (0xdeadbeefcafeL * (i + 1)) & mask)
      val z = samples.zipWithIndex
        .map { case (v, i) => ZOrderK.spreadK(v, k, i) }.reduce(_ | _)
      samples.zipWithIndex.foreach { case (v, i) =>
        assert(unspreadK(z, k, i) == v, s"k=$k dim=$i")
      }
    }
  }

  test("codegen'd zorderk column equals the Scala reference; null in means null out") {
    val df = spark.range(1000).select(
      col("id"),
      (col("id") * 2654435761L % 100000).as("b"),
      (col("id") * 40503L % 7777).as("c"))
    val got = df.select(col("id"), col("b"), col("c"),
        ZOrderK.zorderK(col("id"), col("b"), col("c")).as("z"))
      .collect()
    got.foreach { r =>
      val want = ZOrderK.spreadK(r.getLong(0), 3, 0) |
        ZOrderK.spreadK(r.getLong(1), 3, 1) |
        ZOrderK.spreadK(r.getLong(2), 3, 2)
      assert(r.getLong(3) == want)
    }
    val nulled = spark.range(1)
      .select(ZOrderK.zorderK(col("id"), lit(null).cast("long"), lit(3L)))
      .head()
    assert(nulled.isNullAt(0))
  }

  test("3-d z-ordered sort advances every dimension (locality smoke check)") {
    // on a 4x4x4 grid, any 8-element prefix of the Z-curve advances all
    // three coordinates, and the first octant occupies the first 8 slots
    val grid = for (x <- 0L until 4L; y <- 0L until 4L; z <- 0L until 4L)
      yield (x, y, z)
    val sorted = grid.sortBy { case (x, y, z) =>
      ZOrderK.spreadK(x, 3, 0) | ZOrderK.spreadK(y, 3, 1) |
        ZOrderK.spreadK(z, 3, 2)
    }
    val prefix = sorted.take(8)
    assert(prefix.map(_._1).distinct.size > 1)
    assert(prefix.map(_._2).distinct.size > 1)
    assert(prefix.map(_._3).distinct.size > 1)
    assert(prefix.forall { case (x, y, z) => x < 2 && y < 2 && z < 2 })
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
