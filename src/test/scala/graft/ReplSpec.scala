package graft

import graft.sources.CsvSource
import java.nio.file.Files
import scala.collection.mutable

/** REPL loop + output format tests (/root/reference/src/main.rs:19-63). */
class ReplSpec extends SparkSpec {

  private lazy val table = {
    val dir = Files.createTempDirectory("graft-repl")
    val f = dir.resolve("t.csv")
    Files.writeString(
      f,
      """city,population
        |Berlin,3755251
        |Paris,2102650
        |Vaduz,5696
        |""".stripMargin)
    CsvSource.load(spark, f.toString).cache()
  }

  private def session(lines: String*): (Seq[String], Seq[String]) = {
    val in = lines.iterator
    val outs = mutable.Buffer[String]()
    val errs = mutable.Buffer[String]()
    Repl.runLoop(
      table,
      in = () => if (in.hasNext) in.next() else null,
      out = outs += _,
      err = errs += _)
    (outs.toSeq, errs.toSeq)
  }

  test("prints header, dash separator and comma-joined rows") {
    val (outs, errs) = session("PROJECT city, population FILTER population > 2000000", "exit")
    assert(errs.isEmpty)
    val rendered = outs.filterNot(_ == "> ").mkString
    val lines = rendered.split("\n").toSeq
    assert(lines.head == "city,population")
    assert(lines(1) == "-" * "city,population".length)
    assert(lines.drop(2).toSet == Set("Berlin,3755251", "Paris,2102650"))
  }

  test("parse errors go to stderr and the loop continues") {
    val (outs, errs) = session("PROJEKT city", "q")
    assert(errs.length == 1)
    assert(errs.head.startsWith("Query parsing error: Expected to find keyword PROJECT"))
    assert(outs.count(_ == "> ") == 2) // prompted again after the error
  }

  test("execution errors go to stderr with the reference's message") {
    val (_, errs) = session("PROJECT nope", "quit")
    assert(errs == Seq(
      "Query execution error: Cannot find column nope, it does not exist in the table, existing columns city, population"))
  }

  test("parquet tables load with their real schema and query end-to-end") {
    val dir = Files.createTempDirectory("graft-repl-pq")
    import spark.implicits._
    Seq(("Berlin", 3755251L), ("Vaduz", 5696L))
      .toDF("city", "population")
      .write.mode("overwrite").parquet(dir.resolve("t.parquet").toString)
    val pq = Repl.loadTable(spark, dir.resolve("t.parquet").toString)
    val in = Iterator("PROJECT city FILTER population > 1000000", "q")
    val outs = mutable.Buffer[String]()
    Repl.runLoop(pq,
      in = () => if (in.hasNext) in.next() else null,
      out = outs += _, err = _ => ())
    assert(outs.filterNot(_ == "> ").mkString.contains("Berlin"))
    assert(!outs.mkString.contains("Vaduz"))
  }

  test("a parquet directory with no .parquet suffix routes to the parquet reader") {
    val dir = Files.createTempDirectory("graft-repl-pqdir")
    import spark.implicits._
    // the common layout: directory named without extension, part files inside
    Seq(("Berlin", 3755251L)).toDF("city", "population")
      .write.mode("overwrite").parquet(dir.resolve("cities").toString)
    val pq = Repl.loadTable(spark, dir.resolve("cities").toString)
    assert(pq.schema.fieldNames.toSeq == Seq("city", "population"))
    assert(pq.count() == 1)
  }

  test("all three exit commands work") {
    for (cmd <- Seq("exit", "quit", "q")) {
      val (outs, _) = session(cmd)
      assert(outs.count(_ == "> ") == 1)
    }
  }
}
