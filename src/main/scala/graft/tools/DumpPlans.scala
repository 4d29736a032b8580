package graft.tools

import java.nio.file.{Files, Paths}

/** Throwaway: dump `.explain("formatted")` of every declared SparkEntry
  * query (or a comma-separated subset) to one text file per entry —
  * the plan audit artifact for the optimization rounds. Runs under the
  * engine's exact session confs (ToolSession: extensions injected, UTC,
  * matched shuffle parallelism) so the captured plan is the shipped
  * plan. Lifecycle entries execute their imperative setup while the
  * frame is built — sf0.001 keeps that cheap.
  * Usage: DumpPlans <outDir> [names] [sfDir]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names: Seq[String] =
      if (args.length > 1 && args(1).nonEmpty && args(1) != "-")
        args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = ToolSession.local(cores = 32)
    Files.createDirectories(Paths.get(outDir))
    var failed = 0
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$n.txt"), plan)
      } catch {
        case scala.util.control.NonFatal(e) =>
          failed += 1
          System.err.println(s"[plans] $n FAILED: $e")
          Files.writeString(Paths.get(s"$outDir/$n.txt"),
            s"PLAN CAPTURE FAILED: $e\n")
      }
    }
    println(s"dumped ${names.size - failed}/${names.size} plans to $outDir")
    spark.stop()
  }
}
