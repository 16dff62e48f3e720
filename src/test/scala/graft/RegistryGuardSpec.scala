package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry verification guard: every registered query MUST be verified —
  * either differentially (a DuckDB oracle in [[SparkEntry.oracleSql]],
  * which the driver hash-compares at sf0.01) or by a NAMED pinning spec
  * listed here. A query with neither fails this suite, so a future
  * operator can never land in the registry unverified: round 9 lost four
  * queries from the correctness report without a trace, and while the
  * Verify manifest (`_registry.json`) now makes a CRASHED query loud,
  * only this guard makes an UNVERIFIED one loud.
  *
  * No Spark session needed — this is pure registry introspection, so it
  * stays sub-second and always runs. */
class RegistryGuardSpec extends AnyFunSuite {

  /** Queries verified by a dedicated spec instead of a DuckDB oracle —
    * inherently oracle-less shapes (catalog introspection, sketch
    * internals whose exact bits are the contract). Adding a query here
    * requires naming the spec class that pins it; the class must exist
    * on the test classpath. */
  private val pinnedBySpec: Map[String, String] = Map(
    "a_approx_sketches" -> "graft.ops.SketchCatalogSpec",
    "s9_catalog"        -> "graft.ops.SketchCatalogSpec")

  test("every registered query has an oracle or a named pinning spec") {
    val unverified = SparkEntry.queries.keySet
      .filterNot(SparkEntry.oracleSql.contains)
      .filterNot(pinnedBySpec.contains)
    assert(unverified.isEmpty,
      s"queries with neither oracle nor pinning spec: ${unverified.toSeq.sorted.mkString(", ")} — " +
        "add an oracleSql entry (preferred) or register the spec that pins each in RegistryGuardSpec.pinnedBySpec")
  }

  test("pinning-spec entries reference live registry keys and real spec classes") {
    val stale = pinnedBySpec.keySet.filterNot(SparkEntry.queries.contains)
    assert(stale.isEmpty, s"pinnedBySpec names queries no longer registered: ${stale.mkString(", ")}")
    pinnedBySpec.values.toSet[String].foreach { cls =>
      assert(scala.util.Try(Class.forName(cls)).isSuccess,
        s"pinning spec class $cls does not exist on the test classpath")
    }
  }

  test("every oracle key is a registered query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet.filterNot(SparkEntry.queries.contains)
    assert(orphans.isEmpty,
      s"oracleSql entries without a matching query: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
