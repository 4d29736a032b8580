package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.core.{Executor, QueryParser}
import graft.sources.CsvSource

/** Interactive REPL over one loaded table — the reference's CLI
  * (/root/reference/src/main.rs:19-63): `> ` prompt, `exit|quit|q` to
  * leave, parse → execute → print, errors to stderr without exiting.
  *
  * Output format matches main.rs:46-51 / query_engine.rs:18-24:
  * header line (requested column names comma-joined), a dash separator of
  * the header's length, then one comma-joined line per row with values
  * rendered bare.
  *
  * Extension past the reference: a `.parquet` path (file or directory)
  * loads through the columnar reader with its real schema — the CSV
  * path keeps the reference's all-digits → Long promotion exactly.
  */
object Repl {

  private val ExitCommands = Set("exit", "quit", "q") // main.rs:17

  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println("Error: missing the table file path argument.")
      System.err.println("Usage: graft.Repl <path_to_csv_or_parquet>")
      sys.exit(1)
    }
    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-repl")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cache() mirrors the reference's in-memory residency (table.rs:13-16)
    val table = loadTable(spark, args(0)).cache()
    table.count() // materialize once, like the reference's eager load
    runLoop(table)
    spark.stop()
  }

  /** Route by format: parquet keeps its real schema, CSV goes through
    * the reference's all-digits → Long promotion. A `.parquet` suffix
    * routes directly; so does a directory containing parquet part files
    * — including hive-partitioned layouts, where the data files sit two
    * levels down under `key=value/` subdirectories (the layout
    * `partitionBy` writes). The probe looks for `*.parquet` descendants
    * specifically — a `_SUCCESS` marker alone doesn't discriminate,
    * since csv/json/orc writers leave one too. The REPL is a local
    * tool: remote URIs (hdfs://, s3a://) route as CSV; use the library
    * API for those.
    */
  private[graft] def loadTable(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".parquet") || isParquetDir(path)) spark.read.parquet(path)
    else CsvSource.load(spark, path)

  private def isParquetDir(path: String): Boolean = {
    def hasParquet(d: java.io.File, depth: Int): Boolean =
      Option(d.listFiles()).exists(_.exists { c =>
        (c.isFile && c.getName.endsWith(".parquet")) ||
          (depth > 0 && c.isDirectory && hasParquet(c, depth - 1))
      })
    val f = new java.io.File(path)
    f.isDirectory && hasParquet(f, 2)
  }

  private[graft] def runLoop(
      table: DataFrame,
      in: () => String = () => scala.io.StdIn.readLine(),
      out: String => Unit = Console.out.print,
      err: String => Unit = s => Console.err.println(s)): Unit = {
    var shouldExit = false
    while (!shouldExit) {
      out("> ")
      Console.out.flush()
      val line = in()
      if (line == null || ExitCommands.contains(line.trim)) shouldExit = true
      else
        QueryParser.parse(line) match {
          case Left(parseError) => err(s"Query parsing error: $parseError")
          case Right(query) =>
            Executor.execute(query, table) match {
              case Left(execError) => err(s"Query execution error: $execError")
              case Right(result) =>
                out(render(query.columnNames, result))
            }
        }
    }
  }

  /** main.rs:46-51: header, dashes, comma-joined rows. */
  private[graft] def render(
      columnNames: Seq[String],
      result: DataFrame): String = {
    val header = columnNames.mkString(",")
    val sep = "-" * header.length
    val body = result
      .collect()
      .iterator
      .map(renderRow)
      .mkString("\n")
    if (body.isEmpty) s"$header\n$sep\n" else s"$header\n$sep\n$body\n"
  }

  private def renderRow(row: Row): String =
    (0 until row.length)
      .map(i => if (row.isNullAt(i)) "" else row.get(i).toString)
      .mkString(",")
}
