package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SemDedup semantics: the distributed keep/drop decision must equal the
  * brute-force within-cell rule — for every vector, dup_of is the LOWEST
  * same-cell vec_id below it with round(cos, 6) ≥ τ, keep ⇔ none exists.
  * Cell assignments are taken from the result itself (their cross-engine
  * correctness is the DuckDB oracle's job); this spec pins the pair logic
  * and the representative choice on top of them.
  */
class SemanticDedupSpec extends AnyFunSuite {
  import TestSpark._

  private def cosRounded(a: Array[Float], b: Array[Float]): Double = {
    // same shape as functions.CosineSimilarity: one sequential fold in
    // element order, double accumulators, then HALF_UP rounding at 6
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    val c = if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def check(tau: Double): (Int, Int) = {
    val d = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, d)
    val res = Similarity.semanticDedup(emb, tau).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(res.length == vecs.size, "one decision row per vector")
    val cellOf = res.map(r => r._1 -> r._2).toMap
    res.foreach { case (id, cell, keep, dupOf) =>
      val expected = vecs.keys.filter(u =>
        u < id && cellOf(u) == cell && cosRounded(vecs(u), vecs(id)) >= tau)
      val want = if (expected.isEmpty) None else Some(expected.min)
      assert(dupOf == want, s"vec $id cell $cell: dup_of=$dupOf want=$want")
      assert(keep == want.isEmpty, s"vec $id keep flag")
    }
    (res.count(!_._3), res.length)
    }

  test("contract threshold (τ=0.4): decisions match brute force") {
    val (_, n) = check(0.4)
    assert(n > 0)
  }

  test("low threshold forces real drops and they match brute force") {
    val (dropped, n) = check(0.05)
    assert(dropped > 0, s"expected at least one drop among $n at τ=0.05")
  }

  test("labelCentroids equals in-memory integer sums (sf0.001)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val res = Similarity.labelCentroids(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val rows = emb.select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
    val expect = rows.groupBy(_._1).flatMap { case (l, vs) =>
      (0 until vs.head._2.length).map(j => (l, j) ->
        ((vs.map(v => math.floor(v._2(j).toDouble * 1000.0 + 0.5).toLong).sum, vs.size.toLong)))
    }
    assert(res == expect)
  }
}
