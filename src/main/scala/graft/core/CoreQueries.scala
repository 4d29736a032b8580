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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_core_language" -> (runCore _)
  )

  val oracles: Map[String, String] = Map(
    "q_core_language" ->
      """SELECT n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation WHERE n_regionkey > 1 ORDER BY n_name""".stripMargin
  )
}
