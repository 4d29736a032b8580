package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The reference's 12 parser unit tests ported 1:1 as golden specs
  * (/root/reference/src/query.rs:110-267) plus a few extras.
  */
class QueryParserSpec extends AnyFunSuite {

  test("parses projection and greater filter") { // query.rs:114-128
    assert(
      QueryParser.parse("PROJECT col1, col2 FILTER col3 > \"value\"") ==
        Right(Query(
          Vector("col1", "col2"),
          Some(Filter("col3", FilterOp.Greater, QText("value"))))))
  }

  test("parses single-column projection and greater filter") { // query.rs:131-143
    assert(
      QueryParser.parse("PROJECT col1 FILTER col3 > \"value\"") ==
        Right(Query(
          Vector("col1"),
          Some(Filter("col3", FilterOp.Greater, QText("value"))))))
  }

  test("parses query with multiple blanks between words") { // query.rs:146-158
    assert(
      QueryParser.parse("PROJECT   col1,   col2  FILTER     col3    >   \"value\"") ==
        Right(Query(
          Vector("col1", "col2"),
          Some(Filter("col3", FilterOp.Greater, QText("value"))))))
  }

  test("parses equality filter with integer literal") { // query.rs:161-173
    assert(
      QueryParser.parse("PROJECT col1, col2 FILTER col3 = 42") ==
        Right(Query(
          Vector("col1", "col2"),
          Some(Filter("col3", FilterOp.Equal, QLong(42))))))
  }

  test("error: empty projection column list") { // query.rs:176-183
    assert(
      QueryParser.parse("PROJECT FILTER col3 > \"value\"") ==
        Left("Projection column list is empty"))
  }

  test("error: column missing from the filter") { // query.rs:186-197
    assert(
      QueryParser.parse("PROJECT col1, col2 FILTER > \"value\"") ==
        Left(
          "Unknown filter operator in [\"PROJECT\", \"col1,\", \"col2\", \"FILTER\", \">\", \"\\\"value\\\"\"] at position 5"))
  }

  test("parses query with no filter") { // query.rs:200-207
    assert(
      QueryParser.parse("PROJECT col1, col2") ==
        Right(Query(Vector("col1", "col2"), None)))
  }

  test("error: typo in PROJECT keyword") { // query.rs:210-221
    assert(
      QueryParser.parse("PROJECTION col1, col2 FILTER col3 > \"value\"") ==
        Left(
          "Expected to find keyword PROJECT in [\"PROJECTION\", \"col1,\", \"col2\", \"FILTER\", \"col3\", \">\", \"\\\"value\\\"\"] at position 0"))
  }

  test("error: typo in FILTER keyword") { // query.rs:224-235
    assert(
      QueryParser.parse("PROJECT col1, col2 FILTRE col3 > \"value\"") ==
        Left(
          "Expected to find keyword FILTER in [\"PROJECT\", \"col1,\", \"col2\", \"FILTRE\", \"col3\", \">\", \"\\\"value\\\"\"] at position 3"))
  }

  test("error: operator missing in filter") { // query.rs:238-249
    assert(
      QueryParser.parse("PROJECT col1, col2 FILTER col3 \"value\"") ==
        Left(
          "Unknown filter operator in [\"PROJECT\", \"col1,\", \"col2\", \"FILTER\", \"col3\", \"\\\"value\\\"\"] at position 5"))
  }

  test("error: value missing in filter") { // query.rs:252-263
    assert(
      QueryParser.parse("PROJECT col1, col2 FILTER col3 >") ==
        Left(
          "Could not find value to filter by in the filter in [\"PROJECT\", \"col1,\", \"col2\", \"FILTER\", \"col3\", \">\"] at position 6"))
  }

  test("error: dangling symbols after query") { // query.rs:266-277
    assert(
      QueryParser.parse("PROJECT col1, col2 FILTER col3 > \"value\". abc") ==
        Left(
          "Unexpected suffix found in [\"PROJECT\", \"col1,\", \"col2\", \"FILTER\", \"col3\", \">\", \"\\\"value\\\".\", \"abc\"] at position 7"))
  }

  // ---- extras beyond the reference's suite ----

  test("empty input reports unparseable projection") {
    assert(
      QueryParser.parse("") ==
        Left("Could not parse projection part in [] at position 0"))
  }

  test("quote trimming strips all leading/trailing quotes") {
    val q = QueryParser.parse("PROJECT a FILTER b = \"\"x\"\"").toOption.get
    assert(q.filter.get.value == QText("x"))
  }

  test("all-digits literal above Long.MaxValue stays Text") {
    val q =
      QueryParser.parse("PROJECT a FILTER b = 99999999999999999999").toOption.get
    assert(q.filter.get.value == QText("99999999999999999999"))
  }
}
