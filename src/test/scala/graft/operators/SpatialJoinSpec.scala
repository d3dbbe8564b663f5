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

  private def clusters(pts: Seq[(Long, Long, Long)], cell: Long, minPts: Long) =
    SpatialJoin.gridDensityClusters(
      df(schema, pts.map { case (i, x, y) => Row(i, x, y) }), cell, minPts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("gridDensityClusters: diagonal adjacency merges, noise dropped, isolated core kept") {
    val pts = Seq(
      (1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L),       // cell (0,0): core
      (4L, 11L, 11L), (5L, 12L, 12L), (6L, 13L, 13L), // cell (1,1): core, diag-adjacent
      (7L, 55L, 55L), (8L, 56L, 56L),                 // cell (5,5): below minPts → noise
      (9L, 99L, 99L), (10L, 98L, 98L), (11L, 97L, 97L), (12L, 96L, 96L)) // cell (9,9): isolated core
    val got = clusters(pts, 10L, 3L)
    // labels are min member cell_id (cx·2²⁰ + cy): (0,0)→0; (9,9)→9·2²⁰+9
    assert(got == Set((0L, 2L, 6L), (9L * 1048576L + 9L, 1L, 4L)))
  }

  test("gridDensityClusters: a chain of adjacent core cells is one cluster; a gap splits it") {
    val chain = for (c <- 0L to 2L; p <- 0L until 3L) yield (c * 10 + p + 1, c * 10 + p, 0L)
    val far = for (p <- 0L until 3L) yield (100L + p, 50L + p, 0L) // cell (5,0): 2-cell gap
    val got = clusters(chain ++ far, 10L, 3L)
    assert(got == Set((0L, 3L, 9L), (5L * 1048576L, 1L, 3L)))
  }
}
