package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** BPE merge training: the engine's lookbehind fold against an in-memory
  * reference implementation of greedy left-to-right merging — including
  * the sym_a = sym_b run case where greedy keeps even offsets only.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  private def docs(texts: String*): org.apache.spark.sql.DataFrame = {
    val st = new StructType().add("doc_id", LongType).add("text", StringType)
    df(st, texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) })
  }

  /** Reference greedy merge (the textbook scan-with-skip formulation —
    * deliberately NOT the engine's lookbehind fold).
    */
  private def greedy(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Reference trainer: weighted pair counts → (count desc, a, b) argmax
    * → greedy merge, repeated.
    */
  private def refMerges(words: Map[String, Long], rounds: Int): Seq[(Long, String, String, Long)] = {
    var vocab = words.map { case (w, c) => w.split("").toVector -> c }.toSeq
    (1 to rounds).map { r =>
      val counts = vocab.flatMap { case (syms, c) =>
        syms.zip(syms.tail).map(p => p -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
      vocab = vocab.map { case (syms, cnt) => greedy(syms, a, b) -> cnt }
      (r.toLong, a, b, c)
    }
  }

  test("merge table equals the reference trainer; runs merge at even offsets") {
    // "aaaa"×3 forces the (a,a) run case: greedy yields [aa,aa], so round 2
    // sees (aa,aa) pairs; "abab" exercises non-adjacent double merges
    val d = docs("aaaa aaaa aaaa abab abab low lower lowest", "low lower newest newest")
    val got = Bpe.merges(d, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq.sortBy(_._1)
    val words = Seq("aaaa", "aaaa", "aaaa", "abab", "abab", "low", "lower", "lowest",
        "low", "lower", "newest", "newest")
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = refMerges(words, 4)
    assert(got == want, s"got $got want $want")
    // round-1 winner on this corpus is the run pair (a,a) with count 9:
    // 3 per "aaaa" (positions 1,2,3) × 3 words — counts are of PAIR SITES
    assert(got.head == ((1L, "a", "a", 9L)))
  }

  test("deterministic re-run (the oracle contract)") {
    val d = docs("banana bandana", "banana")
    val once = Bpe.merges(d, rounds = 3).collect().map(_.toSeq).toSet
    val again = Bpe.merges(d, rounds = 3).collect().map(_.toSeq).toSet
    assert(once == again && once.size == 3)
  }
}
