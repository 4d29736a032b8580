package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobStart}
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
import org.apache.spark.sql.functions._

/** Throwaway: per-action listing for the snapshot MERGE and the view
  * REFRESH paths — the per-operation job tax the lifecycle entries and
  * index setups pay per step. Prints each SQL execution's description
  * (the driver action call site) plus the raw job count for: one
  * recorded merge, one single-table view delta refresh, one join-view
  * insert refresh. Usage: ProfileRefresh
  */
object ProfileRefresh {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.local(cores = 32)
    import graft.sources.{Snapshots, Views}
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val execs = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onOtherEvent(event: SparkListenerEvent): Unit =
        event match {
          case e: SparkListenerSQLExecutionStart =>
            execs.add(e.description.linesIterator.next().take(120))
          case _ => ()
        }
    })
    def df = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
      .toDF("id", "grp", "v")
    def dump(label: String)(f: => Unit): Unit = {
      Thread.sleep(300); execs.clear(); val j0 = jobs.get()
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"==== $label  (${sec}%.2f s, ${jobs.get() - j0} jobs, ${execs.size} sql execs)")
      execs.forEach(n => println(s"  exec: $n"))
    }
    // warm the session
    locally {
      val w = java.nio.file.Files.createTempDirectory("graft-pr-w").toString
      Snapshots.commit(spark, df, w, statsColumns = Seq("id"))
      Snapshots.merge(spark, w, df.withColumn("v", col("v") + 1),
        Seq("id"), recordChanges = true, preImages = true)
    }
    val d = java.nio.file.Files.createTempDirectory("graft-pr").toString
    dump("commit (stats)") {
      Snapshots.commit(spark, df, d, statsColumns = Seq("id"))
    }
    dump("merge (recorded, preImages)") {
      Snapshots.merge(spark, d, df.withColumn("v", col("v") + 1),
        Seq("id"), recordChanges = true, preImages = true)
    }
    val mv = s"$d-mv"
    dump("createView") {
      Views.createView(spark, d, mv, Seq("grp"), sumCols = Seq("v"))
    }
    dump("merge #2 (recorded, new keys)") {
      Snapshots.merge(spark, d,
        df.select(col("id") + 100 as "id", col("grp"), col("v")),
        Seq("id"), recordChanges = true)
    }
    dump("refreshView (delta)") {
      Views.refreshView(spark, d, mv)
    }
    // join view walk
    val l = java.nio.file.Files.createTempDirectory("graft-pr-l").toString
    val r = java.nio.file.Files.createTempDirectory("graft-pr-r").toString
    val jv = s"$d-jv"
    Snapshots.commit(spark, df.select("id", "grp"), l)
    Snapshots.commit(spark, df.select(col("id"), col("v")), r)
    Views.createJoinView(spark, l, r, jv, Seq("id"), Seq("grp"),
      sumCols = Seq("v"))
    Snapshots.merge(spark, r,
      df.select(col("id") + 10 as "id", col("v")), Seq("id"),
      recordChanges = true)
    dump("refreshJoinView (insert delta)") {
      Views.refreshJoinView(spark, jv)
    }
    spark.stop()
  }
}
