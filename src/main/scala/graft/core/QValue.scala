package graft.core

/** Literal value model for the query language.
  *
  * Mirrors the reference's two-variant value type
  * (/root/reference/src/value.rs:4-8): a literal is an Integer iff every
  * character is an ASCII digit (value.rs:38-44), else Text. Decimals
  * (`3.14`), negatives (`-1`) and scientific notation are therefore Text.
  *
  * Deviations (documented in SURVEY.md §7.4):
  *   - the reference uses u64; we use signed Long ([[QLong]]). All-digit
  *     literals that overflow Long stay Text instead of erroring.
  *   - the empty string is Text (the reference's vacuous all-digits check
  *     would attempt an integer parse of "" and fail the whole query).
  *   - we do NOT reproduce the reference's mixed-type debug-string ordering
  *     (value.rs:26) — our loader makes columns homogeneous, so the case
  *     cannot arise (SURVEY.md §1.6).
  */
sealed trait QValue {
  /** Bare rendering, as the reference's Display impl (value.rs:10-19). */
  def render: String
}
final case class QLong(value: Long) extends QValue {
  override def render: String = value.toString
}
final case class QText(value: String) extends QValue {
  override def render: String = value
}

object QValue {
  private val AllDigits = "^[0-9]+$".r

  /** value.rs:38-44 — Integer iff all chars are ASCII digits. */
  def parse(raw: String): QValue =
    if (raw.nonEmpty && AllDigits.matches(raw))
      try QLong(raw.toLong)
      catch { case _: NumberFormatException => QText(raw) } // > Long.MaxValue
    else QText(raw)
}
