package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: isolate the METADATA-ONLY DDL cost from the table-setup
  * cost the bench entries pay. Builds one lineitem-sized snapshot
  * table (the expensive part, timed separately), then times
  * renameColumn / widenColumn / dropColumn / cloneTable each on their
  * own — the numbers that substantiate "O(manifest), not O(data)".
  * Usage: ProfileDdl [sfDir]
  */
object ProfileDdl {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val dir = s"/tmp/graft-ddl-profile-${java.util.UUID.randomUUID()}"
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_shipdate")
    timed("commit (32-file table)") {
      graft.sources.Snapshots.commit(spark,
        li.repartitionByRange(32, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"),
        dir, statsColumns = Seq("l_orderkey"))
    }
    timed("renameColumn") {
      graft.sources.Snapshots.renameColumn(spark, dir, "l_quantity", "qty")
    }
    timed("widenColumn") {
      graft.sources.Snapshots.widenColumn(spark, dir, "l_linenumber", "bigint")
    }
    timed("dropColumn") {
      graft.sources.Snapshots.dropColumn(spark, dir, "l_shipdate")
    }
    timed("cloneTable") {
      graft.sources.Snapshots.cloneTable(spark, dir, s"$dir-clone")
    }
    timed("read-after-all-ddl (count)") {
      println("rows = " + graft.sources.Snapshots.read(spark, dir).count())
    }
    timed("pruned read via renamed col") {
      println("pruned rows = " + graft.sources.Snapshots
        .readRange(spark, dir, "l_orderkey", 1000L, 2000L).count())
    }
    spark.stop()
  }
}
