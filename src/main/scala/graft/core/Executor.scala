package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}

/** Executes a parsed [[Query]] against a DataFrame by handing a declarative
  * plan to Catalyst: `df.filter(pred).select(cols)`.
  *
  * The reference evaluates the filter to a row-id set first and then
  * projects (/root/reference/src/query_engine.rs:26-33); Catalyst gets the
  * same effect (and more) for free via predicate pushdown and column
  * pruning — filters and the projected column set reach the data source
  * scan, which the reference never does (SURVEY.md §4).
  *
  * Column names are pre-validated against the schema so unknown columns
  * fail with the reference's exact error text (table.rs:141-144), in the
  * reference's order: the FILTER column is resolved before the projection
  * list (query_engine.rs:26-33 runs apply_filter first).
  *
  * Comparison semantics: the literal is cast to the column's data type and
  * compared with Spark semantics — numeric on Long columns, lexicographic
  * on String columns. A literal that does not cast (e.g. text vs a Long
  * column) compares as null and matches nothing. We deliberately do NOT
  * reproduce the reference's mixed-type debug-string ordering or its
  * `=`-at-index-0 defects (SURVEY.md §7.4.1-2).
  *
  * Result ordering: results are unordered sets (standard relational
  * semantics); the reference's value-sorted `>` output is an index
  * artifact we do not chase (SURVEY.md §7.4.1).
  */
object Executor {

  def execute(query: Query, df: DataFrame): Either[String, DataFrame] = {
    val existing = df.columns
    def resolve(name: String): Either[String, String] =
      if (existing.contains(name)) Right(name)
      else
        Left(
          s"Cannot find column $name, it does not exist in the table, existing columns ${existing.mkString(", ")}")

    for {
      filtered <- query.filter match {
        case Some(f) =>
          resolve(f.columnName).map { c =>
            // try_cast: an uncastable literal (text vs a Long column)
            // compares as null and matches nothing, instead of an ANSI
            // runtime error — the documented cast rule above.
            val typedLit: Column =
              lit(f.value.render).try_cast(df.schema(c).dataType)
            val pred = f.op match {
              case FilterOp.Greater => col(c) > typedLit
              case FilterOp.Equal   => col(c) === typedLit
            }
            df.filter(pred)
          }
        case None => Right(df)
      }
      projected <- query.columnNames.foldLeft[Either[String, Vector[Column]]](
        Right(Vector.empty)) { (acc, name) =>
        acc.flatMap(cols => resolve(name).map(cols :+ col(_)))
      }
    } yield filtered.select(projected: _*)
  }
}
