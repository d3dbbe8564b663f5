package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Grid-decomposed distance join equals the definitional quadratic join. */
class SpatialJoinSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = new StructType()
    .add("id", LongType).add("x", LongType).add("y", LongType)

  private def brute(pts: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    (for {
      (ai, ax, ay) <- pts; (bi, bx, by) <- pts
      if ai < bi
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= r * r
    } yield (ai, bi, d2)).toSet

  private def run(pts: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    SpatialJoin.gridDistanceJoin(
      df(schema, pts.map { case (i, x, y) => Row(i, x, y) }), r)
      .collect().map(w => (w.getLong(0), w.getLong(1), w.getLong(2))).toSet

  test("matches brute force on pseudo-random points") {
    // deterministic LCG, no Random dependency
    var s = 12345L
    def next(mod: Long): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s % mod }
    val pts = (1L to 300L).map(i => (i, next(10000L), next(10000L)))
    assert(run(pts, 700L) == brute(pts, 700L))
    assert(run(pts, 700L).nonEmpty)
  }

  test("boundary cases: exact radius kept, cell-edge pairs found once") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 100L, 0L),   // exactly at radius
      (3L, 99L, 199L), (4L, 101L, 201L), // straddling a cell boundary (cell=100)
      (5L, 500L, 500L))                // isolated
    val got = run(pts, 100L)
    assert(got.contains((1L, 2L, 10000L)), "pair at exactly radius distance must be kept")
    assert(got.contains((3L, 4L, 8L)), "pair straddling a cell edge must be found")
    assert(got == brute(pts, 100L))
  }

  test("coincident points pair once with distance zero") {
    val pts = Seq((1L, 50L, 50L), (2L, 50L, 50L), (3L, 50L, 50L))
    val got = run(pts, 10L)
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))
  }
}
