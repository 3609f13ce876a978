package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A Great-Expectations-style data-quality gate (SURVEY.md §2.4), evaluated
  * in ONE aggregation pass over the batch — the whole suite costs a single
  * scan regardless of how many expectations it holds, so it runs unchanged
  * at 100 TB (violation counting is a partial-aggregatable sum).
  *
  * Mirrors ge/validate_raw_weather.py:143-189: each expectation is a boolean
  * violation predicate plus a `mostly` tolerance (fraction of rows that must
  * pass; the reference pins mostly=1.0). A failing suite throws and blocks
  * the downstream write, like the raise at etl_openmeteo.py:145-149.
  */
object Quality {

  /** `violation` is a Column that is true for rows violating the rule. */
  final case class Expectation(name: String, violation: Column, mostly: Double = 1.0)

  final case class ExpectationResult(name: String, violations: Long, rows: Long, mostly: Double) {
    def passed: Boolean = rows == 0 || (rows - violations).toDouble / rows >= mostly
  }

  final case class ValidationReport(rows: Long, results: Seq[ExpectationResult]) {
    def passed: Boolean = rows > 0 && results.forall(_.passed)
    def failures: Seq[ExpectationResult] = results.filterNot(_.passed)
  }

  final class ValidationException(val report: ValidationReport)
    extends RuntimeException(
      s"quality gate failed: rows=${report.rows} " +
        report.failures.map(r => s"${r.name}=${r.violations}").mkString(", "))

  def notNull(c: String): Expectation =
    Expectation(s"not_null_$c", col(c).isNull)

  def between(c: String, lo: Double, hi: Double, mostly: Double = 1.0): Expectation =
    Expectation(s"between_$c", col(c).isNotNull && !col(c).between(lo, hi), mostly)

  def inSet(c: String, allowed: Seq[String]): Expectation =
    Expectation(s"in_set_$c", col(c).isNotNull && !col(c).isin(allowed: _*))

  /** Evaluate the whole suite in a single `agg` pass. */
  def validate(df: DataFrame, suite: Seq[Expectation]): ValidationReport = {
    val counters = count(lit(1)).as("__rows") +:
      suite.zipWithIndex.map { case (e, i) =>
        coalesce(sum(when(e.violation, 1L).otherwise(0L)), lit(0L)).as(s"__v$i")
      }
    val row = df.agg(counters.head, counters.tail: _*).head()
    val rows = row.getLong(0)
    val results = suite.zipWithIndex.map { case (e, i) =>
      ExpectationResult(e.name, row.getLong(i + 1), rows, e.mostly)
    }
    ValidationReport(rows, results)
  }

  /** Pass `df` through untouched iff the suite passes; throw otherwise
    * (empty batches fail, matching validate_raw_weather.py:122-123).
    */
  def gate(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val report = validate(df, suite)
    if (!report.passed) throw new ValidationException(report)
    df
  }

  /** The suite as a 1-row DataFrame of violation counts — the relational
    * (oracle-checkable) face of the gate, used by `SparkEntry`.
    */
  def violationCounts(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val counters = count(lit(1)).cast("long").as("n_rows") +:
      suite.map { e =>
        coalesce(sum(when(e.violation, 1L).otherwise(0L)), lit(0L)).cast("long").as(e.name)
      }
    df.agg(counters.head, counters.tail: _*)
  }
}
