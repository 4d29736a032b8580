package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway: the unscoped merge's data-write shape at bench-like
  * sizes — sort-merge/AQE-converted anti-join vs an explicit broadcast
  * hint on the updates' key projection. Measures wall seconds per
  * write; decides whether a deliberate broadcast (guide §3.1) is worth
  * plumbing into Snapshots.merge. Usage: ProfileMergeShape [sfDir]
  */
object ProfileMergeShape {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = ToolSession.local(cores = 32)
    val li = graft.sources.Tables(spark, sfDir, "lineitem").select(
      col("l_orderkey").as("k"), col("l_quantity").cast("long").as("v"))
      .filter(col("k") < 60000)
    val base = li.filter(col("k") % 3 === 0)
    val ups = li.filter(col("k") % 3 === 1)
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then 5 timed
      df.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      (1 to 5).foreach(_ =>
        df.write.format("noop").mode("overwrite").save())
      println(f"$label%-42s ${(System.nanoTime() - t0) / 5e9}%.3f s")
    }
    time("anti-join + union (current, AQE decides)") {
      base.join(ups, Seq("k"), "left_anti").unionByName(ups)
    }
    time("anti-join vs broadcast(ups) + union") {
      base.join(broadcast(ups), Seq("k"), "left_anti").unionByName(ups)
    }
    time("anti-join vs broadcast(distinct keys) + union") {
      base.join(broadcast(ups.select("k").distinct()), Seq("k"), "left_anti")
        .unionByName(ups)
    }
    time("anti-join vs distinct keys (no hint, AQE)") {
      base.join(ups.select("k").distinct(), Seq("k"), "left_anti")
        .unionByName(ups)
    }
    spark.stop()
  }
}
