package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-stable statistics for oracle-differential testing.
  *
  * Problem: `round(avg(x), 4)` of fixed-point data lands EXACTLY on
  * `.xxxx5` halves (the mean of 2-decimal inputs is rational), and Spark
  * (BigDecimal HALF_UP on the double's shortest decimal representation)
  * and DuckDB (binary-scaled rounding) disagree on those halves — measured
  * ~5 row flips per 10⁵ values at sf0.1.
  *
  * Fix: make both engines compute the IDENTICAL double before rounding,
  * and round with pure IEEE arithmetic:
  * - sums are exact 64-bit integers (cents for 2-decimal data, raw for
  *   ints) — no summation-order drift, no partial-agg drift;
  * - the mean is then a fixed sequence of double ops (÷, ×, +, floor)
  *   that every IEEE-754 engine evaluates bit-identically;
  * - `floor(x·10ⁿ + 0.5)/10ⁿ` rounds halves deterministically up.
  *
  * Each Column builder has a SQL twin emitting the same operation order
  * for the DuckDB oracle. Scale caveat: exact only while the integer sum
  * fits 2⁶³ (cents of 2-decimal data: up to ~9·10¹⁶ row-value product —
  * ample for any per-group sum this engine aggregates).
  */
object StableStats {

  /** floor(c·10ⁿ + 0.5)/10ⁿ — arithmetic-only round-half-up. */
  def stableRound(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  def stableRoundSql(e: String, n: Int): String = {
    val p = s"1e$n"
    s"floor(($e) * $p + 5e-1) / $p"
  }

  /** Mean of a fixed-point(2) column, exact-cents formulation, 4dp. */
  def centsMean(c: Column): Column =
    stableRound(
      sum(round(c * 100).cast("long")).cast("double") / count(c) / lit(100.0), 4)

  def centsMeanSql(e: String): String =
    stableRoundSql(
      s"CAST(sum(CAST(round(($e) * 1e2) AS BIGINT)) AS DOUBLE) / count($e) / 1e2", 4)

  /** Mean of an integer column, exact-sum formulation, 4dp. */
  def intMean(c: Column): Column =
    stableRound(sum(c).cast("double") / count(c), 4)

  def intMeanSql(e: String): String =
    stableRoundSql(s"CAST(sum($e) AS DOUBLE) / count($e)", 4)

  /** a/b for exact integer columns, 4dp. */
  def ratio(a: Column, b: Column): Column =
    stableRound(a.cast("double") / b, 4)

  def ratioSql(a: String, b: String): String =
    stableRoundSql(s"CAST($a AS DOUBLE) / ($b)", 4)

  /** Σ price·(1−disc) rounded to 2dp, exact-integer formulation: cents ×
    * (100−disc%) accumulates in 10⁻⁴-dollar integer units. Plain
    * `round(sum(price*(1-disc)), 2)` is hazardous — the products are
    * 4-decimal values whose sums DO land on exact `.xx5` halves (observed:
    * a 1-cent cross-engine flip), unlike sums of raw 2-decimal columns. */
  def discountedSum(price: Column, disc: Column): Column =
    stableRound(
      sum(round(price * 100).cast("long") * (lit(100L) - round(disc * 100).cast("long")))
        .cast("double") / lit(1e4), 2)

  def discountedSumSql(price: String, disc: String): String =
    stableRoundSql(
      s"CAST(sum(CAST(round(($price) * 1e2) AS BIGINT) * (100 - CAST(round(($disc) * 1e2) AS BIGINT))) AS DOUBLE) / 1e4", 2)

  /** Σ price·(1−disc)·(1+tax) rounded to 2dp — 10⁻⁶-dollar integer units. */
  def chargedSum(price: Column, disc: Column, tax: Column): Column =
    stableRound(
      sum(round(price * 100).cast("long") * (lit(100L) - round(disc * 100).cast("long"))
        * (lit(100L) + round(tax * 100).cast("long")))
        .cast("double") / lit(1e6), 2)

  def chargedSumSql(price: String, disc: String, tax: String): String =
    stableRoundSql(
      s"CAST(sum(CAST(round(($price) * 1e2) AS BIGINT) * (100 - CAST(round(($disc) * 1e2) AS BIGINT))" +
        s" * (100 + CAST(round(($tax) * 1e2) AS BIGINT))) AS DOUBLE) / 1e6", 2)
}
