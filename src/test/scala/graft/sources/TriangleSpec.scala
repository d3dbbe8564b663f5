package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Triangle counting: hand-computed complete graph, a brute-force
  * differential on a random graph, and input canonicalization (self-loops,
  * duplicates, reversed duplicates).
  */
class TriangleSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = new StructType().add("src", LongType).add("dst", LongType)
  private def g(edges: (Long, Long)*) = df(schema, edges.map(e => Row(e._1, e._2)))

  test("K4: four triangles, grouped by min vertex") {
    val k4 = g((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = GraphLoader.triangleCount(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (1,2,3) (1,2,4) (1,3,4) → vertex 1; (2,3,4) → vertex 2
    assert(got == Map(1L -> 3L, 2L -> 1L))
  }

  test("self-loops, duplicate and reversed-duplicate edges are canonicalized") {
    val messy = g((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 3L))
    val got = GraphLoader.triangleCount(messy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }

  test("triangle-free and empty graphs yield empty results") {
    assert(GraphLoader.triangleCount(g((1L, 2L), (3L, 4L), (2L, 3L))).count() == 0)
    assert(GraphLoader.triangleCount(g()).count() == 0)
  }

  test("random graph matches brute-force enumeration") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 400).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .filter(e => e._1 != e._2).distinct.toSet
    val verts = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = (for {
      i <- verts; j <- verts if j > i; k <- verts if k > j
      if und((i, j)) && und((j, k)) && und((i, k))
    } yield i).groupBy(identity).map { case (v, l) => v -> l.size.toLong }
    val got = GraphLoader.triangleCount(g(edges: _*)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute)
  }
}
