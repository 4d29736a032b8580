package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Throwaway: the snapshot commit's FIXED cost — the ~per-commit tax
  * every lifecycle entry, index add, and ingest loop pays regardless
  * of data volume. Runs a burst of tiny commits of each flavor (plain,
  * stats, stats+changes via CAS, merge) and prints seconds/commit plus
  * the Spark JOB COUNT per commit (a listener tallies job launches —
  * each tiny job is ~30-80 ms of pure scheduling at local[32], so the
  * job count IS the cost model). Usage: ProfileCommit [n]
  */
object ProfileCommit {
  def main(args: Array[String]): Unit = {
    val n = args.find(a => a.forall(_.isDigit)).map(_.toInt).getOrElse(10)
    val spark = ToolSession.local(cores = 32)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onJobEnd(e: SparkListenerJobEnd): Unit = ()
    })
    import graft.sources.{Snapshots, Views}
    import spark.implicits._
    if (args.contains("-v")) {
      // one verbose stats+changes CAS commit: print each job's call site
      val names = new java.util.concurrent.ConcurrentLinkedQueue[String]
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(s: SparkListenerJobStart): Unit =
          names.add(
            Option(s.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse("?") + "  ||  " +
            s.stageInfos.map(_.name).mkString(" | "))
      })
      val d = java.nio.file.Files.createTempDirectory("graft-pc-v").toString
      Snapshots.commit(spark, df, d, statsColumns = Seq("id"))
      Thread.sleep(300); names.clear()
      Snapshots.commitIfVersion(spark, df, d, 1L, statsColumns = Seq("id"),
        changes = Some(df.withColumn("change_type", lit("insert"))))
      Thread.sleep(300)
      names.forEach(n => println(s"  job: $n"))
      spark.stop(); return
    }
    def df = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "v")
    def burst(label: String)(f: String => Unit): Unit = {
      // warm once outside the measurement
      val w = java.nio.file.Files.createTempDirectory("graft-pc-w").toString
      f(w)
      Thread.sleep(200)
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      (1 to n).foreach { _ =>
        val d = java.nio.file.Files.createTempDirectory("graft-pc").toString
        f(d)
      }
      val sec = (System.nanoTime() - t0) / 1e9 / n
      val nj = (jobs.get() - j0).toDouble / n
      println(f"$label%-34s ${sec}%6.3f s/commit  $nj%5.1f jobs/commit")
    }
    burst("commit (no stats)")(d => Snapshots.commit(spark, df, d))
    burst("commit (stats)")(d =>
      Snapshots.commit(spark, df, d, statsColumns = Seq("id")))
    burst("commit (stats+bloom)")(d =>
      Snapshots.commit(spark, df, d, statsColumns = Seq("id"),
        bloomColumns = Seq("grp")))
    burst("CAS commit (stats+changes)") { d =>
      Snapshots.commit(spark, df, d, statsColumns = Seq("id"))
      Snapshots.commitIfVersion(spark, df, d, 1L,
        statsColumns = Seq("id"),
        changes = Some(df.withColumn("change_type", lit("insert"))))
    }
    burst("merge (recorded)") { d =>
      Snapshots.commit(spark, df, d)
      Snapshots.merge(spark, d, df.withColumn("v", col("v") + 1),
        Seq("id"), recordChanges = true, preImages = true)
    }
    burst("view refresh (delta)") { d =>
      val mv = s"$d-mv"
      Snapshots.commit(spark, df, d)
      Views.createView(spark, d, mv, Seq("grp"), sumCols = Seq("v"))
      Snapshots.merge(spark, d, df.withColumn("v", col("v") + 1),
        Seq("id"), recordChanges = true, preImages = true)
      Views.refreshView(spark, d, mv)
    }
    spark.stop()
  }
}
