package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Throwaway: run a named SparkEntry entry (steady state — second run)
  * and print the JOB COUNT grouped by call site, plus wall seconds.
  * Each tiny metadata job is ~30-80 ms of scheduling at local[32], so
  * the per-site tally is the fixed-cost map of a lifecycle entry.
  * Usage: ProfileEntryJobs <name> [sfDir]
  */
object ProfileEntryJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = ToolSession.local()
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        sites.add(Option(s.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filter(_.nonEmpty)
          .getOrElse(s.stageInfos.map(_.name).mkString("|").take(80)))
    })
    // per-ACTION listing: every SQL execution with duration + plan root
    val execs = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val plan = qe.analyzed.toString.linesIterator
            .take(2).mkString(" / ").take(150)
          execs.add(f"${durationNs / 1e9}%6.3f s  $funcName%-18s $plan")
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            error: Exception): Unit = ()
      })
    // cold run (not measured)
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(300)
    sites.clear(); execs.clear()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    val tally = sites.asScala.toSeq.groupBy(identity)
      .map { case (k, v) => k -> v.size }.toSeq.sortBy(-_._2)
    println(f"$name steady: $sec%.2f s, ${sites.size} jobs, ${execs.size} SQL execs")
    tally.foreach { case (site, n) => println(f"  $n%4d  $site") }
    println("--- actions ---")
    execs.forEach(e => println(s"  $e"))
    spark.stop()
  }
}
