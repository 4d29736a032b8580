package graft.core

import graft.SparkSpec
import graft.sources.CsvSource
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** The reference's 9 end-to-end execution tests ported as golden specs
  * (/root/reference/src/query_engine.rs:134-336). Result ordering is an
  * index artifact in the reference (SURVEY.md §7.4.1); our engine defines
  * results as unordered sets, so assertions compare sets. The no-filter
  * path additionally asserts input order is preserved (single small file →
  * one partition → stable order).
  */
class ExecutorSpec extends SparkSpec {

  private def loadCsv(content: String): DataFrame = {
    val dir = Files.createTempDirectory("graft-exec")
    val f = dir.resolve("t.csv")
    Files.writeString(f, content)
    CsvSource.load(spark, f.toString).cache()
  }

  // F2 — query_engine.rs:141-151
  private lazy val f2 = loadCsv(
    """column1,column2,column3
      |bbb,3,b
      |aaa,1,10
      |ccc,2,11
      |eee,2,9
      |ddd,1,5
      |""".stripMargin)

  // F3 — query_engine.rs:273-280
  private lazy val f3 = loadCsv(
    """column1,column2
      |a,1
      |b,2
      |c,3
      |d,3
      |e,3
      |f,4
      |""".stripMargin)

  private def run(df: DataFrame, q: String): DataFrame =
    Executor.execute(QueryParser.parse(q).toOption.get, df).toOption.get

  private def runErr(df: DataFrame, q: String): String =
    Executor.execute(QueryParser.parse(q).toOption.get, df).swap.toOption.get

  test("two columns, greater filter on text column") { // query_engine.rs:153-172
    val got = run(f2, "PROJECT column1, column2 FILTER column1 > \"bbb\"")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("ccc", 2L), ("ddd", 1L), ("eee", 2L)))
  }

  test("equal filter on mixed (string) column with integer literal") { // query_engine.rs:175-187
    // column3 is StringType (mixed cells) → literal 9 compares as "9"
    val got = run(f2, "PROJECT column1, column2 FILTER column3 = 9")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("eee", 2L)))
  }

  test("no filter preserves input row order") { // query_engine.rs:190-214
    val got = run(f2, "PROJECT column1, column2")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("bbb", 3L), ("aaa", 1L), ("ccc", 2L), ("eee", 2L), ("ddd", 1L)))
  }

  test("greater filter matching no rows") { // query_engine.rs:217-227
    assert(run(f2, "PROJECT column1, column2 FILTER column1 > \"eee\"").count() == 0)
  }

  test("single column projection, numeric greater filter") { // query_engine.rs:230-242
    val got = run(f2, "PROJECT column1 FILTER column2 > 2")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("bbb"))
  }

  test("error: nonexistent column in projection") { // query_engine.rs:245-257
    assert(
      runErr(f2, "PROJECT column4 FILTER column2 > 2") ==
        "Cannot find column column4, it does not exist in the table, existing columns column1, column2, column3")
  }

  test("error: nonexistent column in filter") { // query_engine.rs:260-272
    assert(
      runErr(f2, "PROJECT column1 FILTER column4 > 2") ==
        "Cannot find column column4, it does not exist in the table, existing columns column1, column2, column3")
  }

  test("filter column resolved before projection columns") { // query_engine.rs:26-33 order
    // Both unknown → the reference reports the FILTER column first
    assert(
      runErr(f2, "PROJECT column9 FILTER column4 > 2") ==
        "Cannot find column column4, it does not exist in the table, existing columns column1, column2, column3")
  }

  test("equal filter matching multiple duplicate rows") { // query_engine.rs:275-301
    val got = run(f3, "PROJECT column1 FILTER column2 = 3")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("c", "d", "e"))
  }

  test("greater filter above a run of duplicates") { // query_engine.rs:304-330
    val got = run(f3, "PROJECT column1 FILTER column2 > 3")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("f"))
  }

  test("equal filter matching no rows") { // query_engine.rs:333-343
    assert(run(f2, "PROJECT column1, column2 FILTER column1 = \"hhh\"").count() == 0)
  }

  test("equal filter on the column minimum (reference defect not reproduced)") {
    // query_engine.rs:102-103 underflows/skips at index 0; we return the match
    val got = run(f3, "PROJECT column1 FILTER column2 = 1")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a"))
  }

  test("duplicate and reordered projection columns are allowed") {
    val got = run(f3, "PROJECT column2, column1, column2 FILTER column1 = \"a\"")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "a", 1L)))
  }

  test("text literal on a Long column matches nothing (documented cast rule)") {
    assert(run(f3, "PROJECT column1 FILTER column2 = \"x\"").count() == 0)
  }
}
