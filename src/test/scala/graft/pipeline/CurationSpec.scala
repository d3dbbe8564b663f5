package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Corpus-curation operators: decontamination overlap counts and
  * per-source quota sampling (determinism, caps, superset monotonicity).
  */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  private val docSchema = new StructType().add("doc_id", LongType).add("text", StringType)

  test("crossCorpusOverlap: shared shingle counts and contamination ratio") {
    // k=3 shingles; eval doc 100 = "a b c d" → shingles {abc, bcd}, n_eval=2
    val train = df(docSchema, Seq(
      Row(1L, "a b c d e"),   // shares both abc and bcd
      Row(2L, "x b c d y"),   // shares bcd only... (shingles xbc bcd cdy)
      Row(3L, "p q r s t")))  // shares nothing
    val eval = df(docSchema, Seq(Row(100L, "a b c d")))
    val got = Dedup.crossCorpusOverlap(train, eval, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      (100L, 1L) -> ((2L, 1.0)),
      (100L, 2L) -> ((1L, 0.5))))
  }

  test("prepareCorpus: lang filter, exact dedup, near-dup clusters, split — composed") {
    val st = new StructType().add("doc_id", LongType).add("text", StringType).add("lang", StringType)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = df(st, Seq(
      Row(1L, base, "en"),
      Row(2L, base, "en"),                       // exact duplicate of 1 → dropped
      Row(3L, base.replace("upsilon", "omega"), "en"), // near-dup of 1 (19/20 tokens)
      Row(4L, base, "fr"),                       // wrong language → dropped
      Row(5L, "completely different text entirely unrelated content here", "en")))
    val out = TrainingData.prepareCorpus(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!out.contains(2L), "exact duplicate must be dropped")
    assert(!out.contains(4L), "non-target-language doc must be dropped")
    assert(out.contains(1L) && out.contains(5L))
    // near-dup resolution is deterministic under the fixed portable hash
    // family: docs 1 and 3 share 17/21 3-shingles and collide in ≥1 of the
    // 8 bands, so doc 3 resolves into doc 1's cluster and is dropped
    assert(!out.contains(3L), "near-duplicate must resolve to canonical doc 1")
    assert(out.values.forall(Set("train", "val", "test").contains))
  }

  test("quotaSample: per-group cap, determinism, quota monotonicity") {
    val st = new StructType().add("doc_id", LongType).add("source", StringType)
    val rows = (0L until 40L).map(i => Row(i, if (i < 30) "big" else "small"))
    val d = df(st, rows)
    val s5 = TrainingData.quotaSample(d, "source", 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // cap respected per group; the small group (10 docs) keeps min(10, 5)
    assert(s5.count(_._2 == "big") == 5 && s5.count(_._2 == "small") == 5)
    assert(s5.forall(_._3 <= 5))
    // deterministic across runs
    val again = TrainingData.quotaSample(d, "source", 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(s5.sorted.toSeq == again.sorted.toSeq)
    // monotone: quota=5 membership ⊂ quota=8 membership
    val s8 = TrainingData.quotaSample(d, "source", 8).collect().map(_.getLong(0)).toSet
    assert(s5.map(_._1).forall(s8.contains))
  }

  test("curateMultimodal: survivors are exactly the intersection of the three gates") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val emb = graft.Tables.embeddings(spark, sf)
    val out = TrainingData.curateMultimodal(docs, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // each gate independently
    val txt = Dedup.duplicatedNgramStats(docs)
      .filter(col("dup_frac") <= 0.65).collect().map(_.getLong(0)).toSet
    val sem = Similarity.semanticDedup(emb)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    val med = Multimodal.decodePixelStats(Multimodal.syntheticPngs(docs), 7, 5)
      .filter(col("decoded"))
      .withColumn("lum", expr("(sum_r + sum_g + sum_b) div (3 * w * h)"))
      .filter(col("lum").between(100, 160))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("lum")).toMap
    val expectIds = txt intersect sem intersect med.keySet
    assert(out.map(_._1).toSet == expectIds, "survivor set must be the 3-gate intersection")
    assert(out.nonEmpty && out.size < docs.count(), "non-trivial filter")
    out.foreach { case (id, lum, split) =>
      assert(lum == med(id), s"doc $id lum")
      val b = graft.functions.PortableHash.local60(s"mmsplit_$id") % 100
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(split == want, s"doc $id split")
    }
  }
}
