package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** BM25 against hand-computed values on a 3-doc corpus, plus top-k order. */
class RankingSpec extends AnyFunSuite {
  import TestSpark._

  private val docSchema = new StructType().add("doc_id", LongType).add("text", StringType)

  test("bm25 matches the closed-form hand computation") {
    // corpus: N=3, dl = 4, 4, 2, avgdl = 10/3
    val d = df(docSchema, Seq(
      Row(1L, "cat dog cat fish"),
      Row(2L, "dog bird bird bird"),
      Row(3L, "fish whale")))
    val got = Ranking.bm25(d, Seq("cat", "fish")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val (k1, b) = (1.2, 0.75)
    val avgdl = 10.0 / 3
    def idf(df: Long) = math.log(1.0 + (3 - df + 0.5) / (df + 0.5))
    def term(tf: Long, dl: Long, df: Long) =
      idf(df) * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: cat tf=2 df=1, fish tf=1 df=2 — fold in sorted term order
    assert(got(1L) == ((2L, r6(term(2, 4, 1) + term(1, 4, 2)))))
    // doc 2 matches nothing; doc 3: fish tf=1 df=2
    assert(!got.contains(2L))
    assert(got(3L) == ((1L, r6(term(1, 2, 2)))))
  }

  test("hybridSearch equals the manual bm25-retrieve → cosine-rerank composition") {
    val sf = "/root/testdata/sf0.001"
    val docsDf = graft.Tables.documents(spark, sf)
    val embDf = graft.Tables.embeddings(spark, sf)
    val terms = Seq("spark", "join", "vector")
    val got = Ranking.hybridSearch(docsDf, embDf, terms,
        queryVecId = 7L, kRetrieve = 10, kFinal = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    // manual composition from the two verified stages
    import org.apache.spark.sql.functions._
    val cand = Ranking.bm25TopK(docsDf, terms, 10).collect()
      .map(_.getLong(0)).filter(_ != 7L)
    val vecs = embDf.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val (na, nb) = (math.sqrt(a.map(x => x * x).sum), math.sqrt(b.map(x => x * x).sum))
      if (na == 0 || nb == 0) 0.0
      else BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = cand.map(id => id -> cos(vecs(7L), vecs(id)))
      .sortBy { case (id, c) => (-c, id) }.take(5)
    assert(got.map(_._1).toSeq == want.map(_._1).toSeq, s"got ${got.toSeq}\nwant ${want.toSeq}")
    // scores agree to the rounding grain (the naive sum-of-products dot
    // differs from the sequential fold by ≤ 1 ulp at the 6th decimal)
    got.zip(want).foreach { case ((_, g), (_, w)) => assert(math.abs(g - w) < 2e-6) }
  }

  test("bm25TopK: descending score, doc_id tie-break, limit k") {
    val d = df(docSchema, Seq(
      Row(1L, "x y"), Row(2L, "x y"), Row(3L, "x x x"), Row(4L, "z")))
    val top = Ranking.bm25TopK(d, Seq("x"), k = 2).collect().map(_.getLong(0)).toSeq
    // doc 3 highest (tf=3, short? dl=3 vs 2 — tf dominates); docs 1,2 tie → doc 1
    assert(top.head == 3L && top(1) == 1L)
  }

  test("retrievalEval: ranks equal a collected sort of the bm25 output; no-relevant → zeros") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val queries = graft.SparkEntry.evalQueries :+ (9L -> Seq("spark", "xyzzynotoken"))
    val got = Ranking.retrievalEval(docs, queries).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    graft.pipeline.InternalCaches.release()
    for ((qid, terms) <- queries) {
      val sc = Ranking.bm25(docs, terms).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      graft.pipeline.InternalCaches.release()
      val ranked = sc.sortBy { case (id, _, s) => (-s, id) }
      val firstRel = ranked.indexWhere(_._2 == terms.size.toLong)
      val nRel = sc.count(_._2 == terms.size.toLong).toLong
      val want =
        if (nRel == 0) (sc.length.toLong, 0L, 0L, 0L)
        else (sc.length.toLong, nRel, firstRel + 1L, 1000000L / (firstRel + 1L))
      assert(got(qid) == want, s"query $qid: got ${got(qid)}, want $want")
    }
    assert(got(9L)._2 == 0L && got(9L)._4 == 0L)
    assert(got(1L)._3 >= 1L)
  }

  test("postingLists: df/tf exact, head = lowest ids, truncation flagged") {
    // "hot" appears in 25 docs (twice in doc 0) → truncated head of 3;
    // "cold" in 2 docs → full list, tf counts multiplicity
    val rows = (0L until 25L).map(i =>
      Row(i, if (i == 0) "hot hot cold" else if (i == 1) "hot cold cold" else "hot"))
    val d = df(docSchema, rows)
    val got = Ranking.postingLists(d, maxPostings = 3).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3), r.getBoolean(4)))).toMap
    graft.pipeline.InternalCaches.release()
    assert(got("hot") == ((25L, 26L, Seq(0L, 1L, 2L), true)))
    assert(got("cold") == ((2L, 3L, Seq(0L, 1L), false)))
  }
}
