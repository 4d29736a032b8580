package graft.core

/** Query AST — mirrors /root/reference/src/query.rs:4-8, 87-98. */
final case class Query(columnNames: Vector[String], filter: Option[Filter])

final case class Filter(columnName: String, op: FilterOp, value: QValue)

sealed trait FilterOp
object FilterOp {
  case object Greater extends FilterOp // ">"  (query.rs:104)
  case object Equal extends FilterOp   // "="  (query.rs:105)
}

/** Recursive-descent parser for the two-clause query language
  * `PROJECT c1[, …] [FILTER col (>|=) literal]`.
  *
  * Grammar, token handling (comma-suffixed projection tokens, quote
  * trimming) and the exact error-message text — including the reference's
  * quirky error positions — follow /root/reference/src/query.rs:11-84;
  * the reference's parser unit tests (query.rs:110-267) are treated as
  * golden specs and ported 1:1 in QueryParserSpec.
  */
object QueryParser {

  /** query.rs:11-19: whitespace tokenize, parse, reject trailing tokens.
    * The reference's `split_whitespace` splits on Rust `char::is_whitespace`
    * = the Unicode White_Space property — in Java regex that is
    * `\p{IsWhite_Space}` (NOT `\s`, which is ASCII-only, and not
    * `\p{javaWhitespace}`, which excludes U+00A0 NBSP).
    */
  def parse(input: String): Either[String, Query] = {
    val tokens: Vector[String] =
      input.split("[\\p{IsWhite_Space}]+").iterator.filter(_.nonEmpty).toVector
    for {
      proj <- parseProjection(tokens, 0)
      (columnNames, afterProjection) = proj
      filt <- parseFilter(tokens, afterProjection)
      (filter, finalPosition) = filt
      _ <-
        if (finalPosition == tokens.length) Right(())
        else
          Left(
            s"Unexpected suffix found in ${debug(tokens)} at position $finalPosition")
    } yield Query(columnNames, filter)
  }

  /** query.rs:30-60: `PROJECT` + comma-suffixed identifiers until a token
    * without a trailing comma (or the literal token `FILTER`).
    */
  private def parseProjection(
      tokens: Vector[String],
      position: Int): Either[String, (Vector[String], Int)] =
    tokens.lift(position) match {
      case Some("PROJECT") =>
        var current = position + 1
        val names = Vector.newBuilder[String]
        var n = 0
        var done = false
        while (current < tokens.length && !done) {
          val tok = tokens(current)
          if (tok.endsWith(",")) {
            names += tok.dropRight(1); n += 1
            current += 1
          } else if (tok != "FILTER") {
            names += tok; n += 1
            done = true
            current += 1
          } else done = true
        }
        if (n == 0) Left("Projection column list is empty")
        else Right((names.result(), current))
      case Some(_) =>
        Left(
          s"Expected to find keyword PROJECT in ${debug(tokens)} at position $position")
      case None =>
        Left(
          s"Could not parse projection part in ${debug(tokens)} at position $position")
    }

  /** query.rs:62-84: optional `FILTER col (>|=) value`; value may be
    * wrapped in double quotes (all leading/trailing quotes stripped).
    * Error positions reproduce the reference's, including the
    * missing-operator message pointing at the FILTER keyword itself.
    */
  private def parseFilter(
      tokens: Vector[String],
      position: Int): Either[String, (Option[Filter], Int)] =
    tokens.lift(position) match {
      case Some("FILTER") =>
        for {
          column <- tokens
            .lift(position + 1)
            .toRight(
              s"Could not find column in the filter in ${debug(tokens)} at position ${position + 1}")
          opToken <- tokens
            .lift(position + 2)
            .toRight(
              s"Could not find operator '>' or '=' in the filter in ${debug(tokens)} at position $position")
          op <- opToken match {
            case ">" => Right(FilterOp.Greater)
            case "=" => Right(FilterOp.Equal)
            case _ =>
              Left(
                s"Unknown filter operator in ${debug(tokens)} at position ${position + 2}")
          }
          rawValue <- tokens
            .lift(position + 3)
            .toRight(
              s"Could not find value to filter by in the filter in ${debug(tokens)} at position ${position + 3}")
        } yield (
          Some(Filter(column, op, QValue.parse(trimQuotes(rawValue)))),
          position + 4)
      case Some(_) =>
        Left(
          s"Expected to find keyword FILTER in ${debug(tokens)} at position $position")
      case None => Right((None, position))
    }

  /** Rust's `str::trim_matches('"')` — strip ALL leading/trailing quotes. */
  private def trimQuotes(s: String): String =
    s.dropWhile(_ == '"').reverse.dropWhile(_ == '"').reverse

  /** Rust `{:?}` of a Vec<&str>, e.g. `["PROJECT", "col1,", "\"v\""]` —
    * the reference interpolates it into every positional error message.
    */
  private[core] def debug(tokens: Vector[String]): String =
    tokens
      .map { t =>
        "\"" + t.flatMap {
          case '"'  => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\t' => "\\t"
          case '\r' => "\\r"
          case c    => c.toString
        } + "\""
      }
      .mkString("[", ", ", "]")
}
