package graft.ops

import org.apache.spark.sql.DataFrame

/** P8: input validation at the query boundary (reference
  * `api/app/main.py:102-131` — ISO-date parse-or-400 and column whitelist,
  * which doubles as the reference's SQL-injection guard for its string-built
  * projection at `api/app/database.py:50-51`; here the whitelist is checked
  * against the actual schema, and Catalyst parameterization makes injection
  * structurally impossible). */
object Validation {

  /** Validated dynamic projection: select `requested` columns (all columns
    * when empty — the reference's default), failing fast with the complete
    * list of unknown names. */
  def selectValidated(df: DataFrame, requested: Seq[String]): DataFrame = {
    if (requested.isEmpty) df
    else {
      val known = df.columns.toSet
      val bad = requested.filterNot(known)
      require(bad.isEmpty,
        s"unknown column(s): ${bad.mkString(", ")} — valid: ${df.columns.mkString(", ")}")
      df.select(requested.head, requested.tail: _*)
    }
  }

  /** Validated half-open date range: ISO `yyyy-MM-dd` or fail fast
    * (≙ the reference's parse-or-400). */
  def dayRange(df: DataFrame, tsCol: String, isoDay: String): DataFrame = {
    require(isoDay.matches("\\d{4}-\\d{2}-\\d{2}"), s"not an ISO date: '$isoDay'")
    import org.apache.spark.sql.functions._
    val start = to_timestamp(lit(isoDay))
    df.where(col(tsCol) >= start && col(tsCol) < start + expr("INTERVAL 1 DAY"))
  }
}
