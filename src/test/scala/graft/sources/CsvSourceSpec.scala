package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types.{LongType, StringType}
import java.nio.file.Files

/** Load + schema-inference tests on the reference's fixtures
  * (/root/reference/src/table.rs:152-239, FIXTURES.md F1/F4).
  */
class CsvSourceSpec extends SparkSpec {

  private def loadCsv(content: String) = {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("t.csv")
    Files.writeString(f, content)
    CsvSource.load(spark, f.toString)
  }

  // F1 — table.rs:160-163
  private lazy val f1 = loadCsv(
    """column1,column2,column3
      |bbb,3,b
      |aaa,1,10
      |ccc,2,11
      |""".stripMargin)

  test("F1: integer column promoted to Long, mixed column stays String") {
    // table.rs:166-183 — column2 Integer, column1/column3 Text
    val types = f1.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("column1") == StringType)
    assert(types("column2") == LongType)
    assert(types("column3") == StringType) // mixed b,10,11 → not all-integer
  }

  test("F1: cell contents survive load") {
    val rows = f1.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(("bbb", 3L, "b"), ("aaa", 1L, "10"), ("ccc", 2L, "11")))
  }

  test("decimals and negatives stay Text (all-digits rule)") {
    // value.rs:38-44: 891.8 and -1 are not all-digits
    val df = loadCsv("a,b,c\n891.8,-1,7\n12,3,8\n")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("a") == StringType)
    assert(types("b") == StringType)
    assert(types("c") == LongType)
  }

  test("empty cell blocks integer promotion and reads as empty string") {
    val df = loadCsv("a,b\n1,x\n,y\n")
    assert(df.schema("a").dataType == StringType)
    assert(df.collect().map(_.getString(0)).toSet == Set("1", ""))
  }

  test("19-digit overflow-risk values stay Text") {
    val df = loadCsv("a\n9999999999999999999\n")
    assert(df.schema("a").dataType == StringType)
  }
}
