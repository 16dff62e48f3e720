package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Triangle participation: degree-ordered enumeration must count each
  * triangle exactly once, per node, regardless of graph shape. */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Curation.triangleNodes(edges.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_triangles")).toMap

  test("K4: every vertex sits in C(3,2)=3 triangles") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val out = run(k4)
    assert(out === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("a path has no triangles; a pendant vertex joins none") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // triangle + pendant: the pendant is absent from the report
    val out = run(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L)))
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hub skew: degree orientation keeps wedges off the hub") {
    // star hub 0 with 6 leaves + one closing edge — exactly one triangle,
    // and every edge orients TOWARD the hub (highest degree), so wedge
    // pairs form at the leaves (out-degree ≤ 2), never |leaves|² at 0
    val star = (1L to 6L).map(l => (0L, l)) :+ (1L, 2L)
    val out = run(star)
    assert(out === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("engine agrees with a naive driver-side model on the real LSH graph") {
    val pairs = Dedup.lshCandidates(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val edges = pairs.toSet
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- edges
      c <- adj(a) & adj(b) if b < c  // (a<b<c): count once
    } { naive(a) += 1; naive(b) += 1; naive(c) += 1 }
    assert(run(pairs.toSeq) === naive.toMap)
  }
}
