package graft.ops

import graft.SparkSpec

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq((1L, "a", 2.0)).toDF("id", "name", "value")

  test("whitelist projection: valid subset selects, empty means all (ref default)") {
    assert(Validation.selectValidated(df, Seq("id", "value")).columns.toSeq === Seq("id", "value"))
    assert(Validation.selectValidated(df, Nil).columns.toSeq === Seq("id", "name", "value"))
  }

  test("whitelist projection: unknown columns fail fast, naming every offender") {
    val e = intercept[IllegalArgumentException] {
      Validation.selectValidated(df, Seq("id", "nope", "also_nope"))
    }
    assert(e.getMessage.contains("nope") && e.getMessage.contains("also_nope"))
  }

  test("day range: malformed date fails fast (≙ parse-or-400)") {
    val events = Seq((java.sql.Timestamp.valueOf("2024-01-05 10:00:00"), 1.0)).toDF("ts", "v")
    assert(Validation.dayRange(events, "ts", "2024-01-05").count() === 1)
    assert(Validation.dayRange(events, "ts", "2024-01-06").count() === 0)
    intercept[IllegalArgumentException] {
      Validation.dayRange(events, "ts", "05/01/2024")
    }
  }
}
