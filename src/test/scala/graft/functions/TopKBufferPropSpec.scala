package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Randomized property tests for the bounded top-k heap (pure JVM, no
  * Spark, fixed seed): any sequence of adds, any split into partial
  * buffers merged together, and any serialize/deserialize round-trip must
  * equal the sort-based reference top-k under (score DESC, id ASC).
  */
class TopKBufferPropSpec extends AnyFunSuite {

  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortBy { case (s, i) => (-s, i) }.take(k)

  private def drain(b: TopKBuffer): Seq[(Double, Long)] = {
    val a = b.toArrayData
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2); (r.getDouble(0), r.getLong(1))
    }
  }

  private val rnd = new scala.util.Random(17)
  private def pair(): (Double, Long) = {
    // half the scores quantized to a small domain → frequent exact ties
    val s = if (rnd.nextBoolean()) rnd.nextInt(21) / 4.0 else rnd.nextDouble() * 10 - 5
    (s, rnd.nextInt(51).toLong)
  }
  private def sample(): List[(Double, Long)] = List.fill(rnd.nextInt(120))(pair())

  test("adds in any order == sort-based reference (200 random cases, ties)") {
    for (_ <- 1 to 200) {
      val xs = sample(); val k = 1 + rnd.nextInt(12)
      val b = new TopKBuffer(k)
      xs.foreach { case (s, i) => b.add(s, i) }
      assert(drain(b) == reference(xs, k), s"k=$k xs=$xs")
    }
  }

  test("partial buffers merged at any split == single buffer (200 cases)") {
    for (_ <- 1 to 200) {
      val xs = sample(); val k = 1 + rnd.nextInt(8)
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else rnd.nextInt(xs.size + 1))
      val bl = new TopKBuffer(k); l.foreach { case (s, i) => bl.add(s, i) }
      val br = new TopKBuffer(k); r.foreach { case (s, i) => br.add(s, i) }
      bl.mergeFrom(br)
      assert(drain(bl) == reference(xs, k), s"k=$k split=${l.size} xs=$xs")
    }
  }

  test("serialize/deserialize round-trips through the aggregate (100 cases)") {
    val agg = TopKByScore(org.apache.spark.sql.catalyst.expressions.Literal(1L), 7)
    for (_ <- 1 to 100) {
      val b = new TopKBuffer(7)
      sample().foreach { case (s, i) => b.add(s, i) }
      assert(drain(agg.deserialize(agg.serialize(b))) == drain(b))
    }
  }
}
