package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Throwaway: job count + wall seconds of the unscoped-merge DATA
  * WRITE candidates at bench-like sizes (guide §1.4 noop sink, §3.1).
  * The r16 shape (`cur ⟕̸ distinct keys`, AQE decides) materializes two
  * exchanges before the final stage — ~4 jobs per write at local[32],
  * each a fixed scheduling cost — and AQE's broadcast conversion still
  * pays the base-side shuffle WRITE before the local read. The r17
  * candidate collects the (capped) update keys to the driver and
  * anti-joins against a broadcast LocalRelation: the base side is
  * never shuffled at all. Usage: ProfileMergeJobs [sfDir]
  */
object ProfileMergeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.find(!_.startsWith("-"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = ToolSession.local(cores = 32)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    if (args.contains("-v")) {
      // verbose: list each job of one merge of each flavor
      val names = new java.util.concurrent.ConcurrentLinkedQueue[String]
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(s: SparkListenerJobStart): Unit =
          names.add(
            Option(s.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse("?") + "  ||  " +
            s.stageInfos.map(_.name).mkString(" | "))
      })
      import spark.implicits._
      def df = (1L to 2000L).map(i => (i, i * 10)).toDF("id", "v")
      def ups2 = graft.sources.Tables(spark, sfDir, "lineitem").select(
        col("l_orderkey").as("id"), col("l_quantity").cast("long").as("v"))
        .filter(col("id") < 3000 && col("id") % 3 === 1)
      for (flavor <- Seq("unscoped", "recorded", "scoped")) {
        val d = java.nio.file.Files.createTempDirectory("graft-pmj-v").toString
        graft.sources.Snapshots.commit(spark, df, d,
          statsColumns = Seq("id"))
        Thread.sleep(300); names.clear()
        flavor match {
          case "unscoped" =>
            graft.sources.Snapshots.merge(spark, d, ups2, Seq("id"))
          case "recorded" =>
            graft.sources.Snapshots.merge(spark, d, ups2, Seq("id"),
              recordChanges = true, preImages = true)
          case "scoped" =>
            graft.sources.Snapshots.merge(spark, d, ups2, Seq("id"),
              statsColumns = Seq("id"), scoped = true)
        }
        Thread.sleep(300)
        println(s"--- $flavor merge jobs ---")
        names.forEach(n => println(s"  job: $n"))
        names.clear()
      }
      spark.stop(); return
    }
    val li = graft.sources.Tables(spark, sfDir, "lineitem").select(
      col("l_orderkey").as("k"), col("l_quantity").cast("long").as("v"))
      .filter(col("k") < 60000)
    val base = li.filter(col("k") % 3 === 0)
    val ups = li.filter(col("k") % 3 === 1)
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(200)
      val j0 = jobs.get(); val t0 = System.nanoTime()
      (1 to 5).foreach(_ =>
        df.write.format("noop").mode("overwrite").save())
      val sec = (System.nanoTime() - t0) / 5e9
      val nj = (jobs.get() - j0).toDouble / 5
      println(f"$label%-52s $sec%6.3f s  $nj%5.1f jobs")
    }
    time("A: anti-join vs distinct keys (AQE, r16 current)") {
      base.join(ups.select("k").distinct(), Seq("k"), "left_anti")
        .unionByName(ups)
    }
    time("B: collect keys -> broadcast local anti-join") {
      val rows = ups.select("k").limit(1000001).collect()
      val keyDf = spark.createDataFrame(
        java.util.Arrays.asList(rows.distinct: _*),
        ups.select("k").schema)
      base.join(broadcast(keyDf), Seq("k"), "left_anti").unionByName(ups)
    }
    time("C: collect keys -> isin filter (single-col)") {
      val ks = ups.select("k").limit(1000001).collect()
        .map(_.getLong(0)).distinct.toSeq
      base.filter(!coalesce(col("k").isin(ks: _*), lit(false)))
        .unionByName(ups)
    }
    // end-to-end merge, current code
    import spark.implicits._
    def mkBase(d: String): Unit =
      graft.sources.Snapshots.commit(spark,
        base.toDF("id", "v"), d, statsColumns = Seq("id"))
    def burst(label: String)(f: String => Unit): Unit = {
      val w = java.nio.file.Files.createTempDirectory("graft-pmj-w").toString
      f(w)
      Thread.sleep(200)
      val j0 = jobs.get(); val t0 = System.nanoTime()
      (1 to 5).foreach { _ =>
        val d = java.nio.file.Files.createTempDirectory("graft-pmj").toString
        f(d)
      }
      val sec = (System.nanoTime() - t0) / 5e9
      val nj = (jobs.get() - j0).toDouble / 5
      println(f"$label%-52s $sec%6.3f s  $nj%5.1f jobs")
    }
    burst("merge end-to-end (unscoped)") { d =>
      mkBase(d)
      graft.sources.Snapshots.merge(spark, d,
        ups.toDF("id", "v"), Seq("id"))
    }
    burst("merge end-to-end (unscoped, recorded+preimages)") { d =>
      mkBase(d)
      graft.sources.Snapshots.merge(spark, d,
        ups.toDF("id", "v"), Seq("id"),
        recordChanges = true, preImages = true)
    }
    burst("merge end-to-end (scoped)") { d =>
      mkBase(d)
      graft.sources.Snapshots.merge(spark, d,
        ups.toDF("id", "v"), Seq("id"),
        statsColumns = Seq("id"), scoped = true)
    }
    spark.stop()
  }
}
