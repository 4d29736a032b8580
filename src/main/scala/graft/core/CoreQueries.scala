package graft.core

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.{CsvSource, Tables}

/** Routes the reference-parity core path — CSV load with integer
  * promotion, `PROJECT … FILTER …` parse, execution — through the
  * driver's DuckDB oracle gate, so the actual reference-capability
  * surface (/root/reference/src/query.rs:11-84, query_engine.rs:26-60,
  * table.rs:87-136) has a CORRECTNESS row, not just unit tests.
  *
  * The entry materializes a small CSV from the parquet `nation` table,
  * loads it back through [[graft.sources.CsvSource]] (exercising the
  * all-digits → Long promotion), and executes a parsed query; the oracle
  * is the equivalent SELECT over the same parquet table (BIGINT casts
  * mirror the promotion rule).
  */
object CoreQueries {

  /** Fixed per-session scratch dir, overwritten in place per call —
    * repeated bench/verify invocations must not leak temp directories.
    */
  private lazy val csvScratch: String = {
    val p = Files.createTempDirectory("graft-core-csv")
    // deleteOnExit silently skips non-empty dirs; recurse at shutdown
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }
    p.toString
  }

  private def runCore(s: SparkSession, d: String): DataFrame = {
    val tmp = csvScratch
    Tables(s, d, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val table = CsvSource.load(s, tmp)
    val query = QueryParser
      .parse("PROJECT n_name, n_regionkey FILTER n_regionkey > 1")
      .fold(err => throw new IllegalStateException(err), identity)
    Executor
      .execute(query, table)
      .fold(err => throw new IllegalStateException(err), identity)
      .orderBy("n_name")
  }

  /** The REPL RENDER path under the oracle gate (VERDICT r7 item 8 — the
    * one §2 row without a driver-visible check): drives
    * [[graft.Repl.runLoop]] with scripted input (the query, then `exit`),
    * captures everything the loop writes — prompts included — and emits
    * the rendered block (main.rs:46-51: header line, dash separator of
    * the header's length, bare comma-joined values) as (line_no, line)
    * rows the oracle string-builds independently in SQL. Body lines are
    * sorted lexically on both sides: the reference renders in scan order,
    * which neither engine contractually preserves, so the gate pins the
    * RENDERING (header text, separator length, bare-value formatting,
    * comma joins, one line per surviving row) rather than scan order.
    * Prompt shape is asserted in-entry (exactly two `> ` prompts, output
    * between them) — a violation throws and lands as a driver-visible err.
    */
  /** Own scratch (not [[csvScratch]]) so concurrent entry execution can't
    * interleave the two writers; same overwrite-in-place + shutdown-hook
    * cleanup contract.
    */
  private lazy val replScratch: String = {
    val p = Files.createTempDirectory("graft-repl-csv")
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }
    p.toString
  }

  private def runRepl(s: SparkSession, d: String): DataFrame = {
    val tmp = replScratch
    Tables(s, d, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val table = CsvSource.load(s, tmp)
    val inputs = Iterator("PROJECT n_name, n_regionkey FILTER n_regionkey > 1", "exit")
    val captured = new StringBuilder
    graft.Repl.runLoop(
      table,
      in = () => if (inputs.hasNext) inputs.next() else null,
      out = captured.append(_),
      err = msg => throw new IllegalStateException(s"REPL error: $msg"))
    val full = captured.toString
    require(full.startsWith("> ") && full.endsWith("\n> "),
      s"unexpected REPL prompt shape: ${full.take(40)}...")
    val rendered = full.stripPrefix("> ").stripSuffix("> ")
    val lines = rendered.split("\n").toSeq
    require(lines.length >= 2, s"short render: $rendered")
    val fixed = Seq(0L -> lines(0), 1L -> lines(1))
    val body = lines.drop(2).sorted.zipWithIndex
      .map { case (l, i) => (i + 2L) -> l }
    import s.implicits._
    (fixed ++ body).toDF("line_no", "line").orderBy("line_no")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_core_language" -> (runCore _),
    "q_core_repl" -> (runRepl _)
  )

  val oracles: Map[String, String] = Map(
    "q_core_language" ->
      """SELECT n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation WHERE n_regionkey > 1 ORDER BY n_name""".stripMargin,
    "q_core_repl" ->
      """WITH body AS (
        |  SELECT n_name || ',' || CAST(CAST(n_regionkey AS BIGINT) AS VARCHAR) AS line
        |  FROM nation WHERE n_regionkey > 1
        |), sorted AS (
        |  SELECT CAST(1 + row_number() OVER (ORDER BY line) AS BIGINT) AS line_no, line
        |  FROM body
        |)
        |SELECT CAST(0 AS BIGINT) AS line_no, 'n_name,n_regionkey' AS line
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), repeat('-', length('n_name,n_regionkey'))
        |UNION ALL
        |SELECT line_no, line FROM sorted
        |ORDER BY line_no""".stripMargin
  )
}
