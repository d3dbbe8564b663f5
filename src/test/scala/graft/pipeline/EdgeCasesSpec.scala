package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Degenerate-input robustness: every pipeline operator must handle an
  * EMPTY corpus and a ONE-DOC corpus without throwing — the first thing a
  * new user hits when pointing the library at a not-yet-populated table.
  */
class EdgeCasesSpec extends AnyFunSuite {
  import TestSpark._

  private val docSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType)
    .add("lang", StringType).add("source", StringType)

  private def docs(rows: Row*) = df(docSchema, rows)
  private val empty = docs()
  private val one = docs(Row(1L, "just one single document here", "en", "s1"))

  test("dedup family: empty and single-doc corpora") {
    for (d <- Seq(empty, one)) {
      assert(Dedup.exact(d).count() == d.count())
      assert(Dedup.minhashPairs(d).count() == 0)
      assert(Dedup.simhashPairs(d).count() == 0)
      assert(Dedup.jaccardJoin(d).count() == 0)
      assert(Components.duplicateClusters(d).count() == 0)
      assert(Dedup.crossCorpusOverlap(d, one).count() == (if (d.count() > 0) 1 else 0))
      assert(Dedup.crossCorpusOverlap(one, empty).count() == 0)
    }
  }

  test("ranking/curation: empty and single-doc corpora") {
    for (d <- Seq(empty, one)) {
      assert(Ranking.bm25(d, Seq("single")).count() == (if (d.count() > 0) 1L else 0L))
      assert(TrainingData.splitAssign(d).count() == d.count())
      assert(TrainingData.packSequences(d).count() == d.count())
      assert(TrainingData.quotaSample(d, "source", 5).count() == d.count())
      assert(TrainingData.prepareCorpus(d).count() == d.count())
    }
  }

  test("round-3 corpus signals: empty and single-doc corpora") {
    val rates = Map("s1" -> 1000000L)
    for (d <- Seq(empty, one)) {
      // one doc: every ngram unique → dup_frac 0, row preserved
      assert(Dedup.duplicatedNgramStats(d).count() == d.count())
      assert(TextAnalysis.piiStats(d).count() == d.count())
      assert(TextAnalysis.vocabulary(d, minCount = 1L).count() ==
        (if (d.isEmpty) 0 else 5))
      assert(TrainingData.mixtureSample(d, "source", rates).count() == d.count())
      assert(TrainingData.curateCorpus(d, "source", rates).count() == d.count())
    }
  }

  test("text analysis: empty corpus and empty text") {
    val blank = docs(Row(1L, "", "en", "s1"), Row(2L, "   ", "en", "s1"))
    for (d <- Seq(empty, blank)) {
      assert(TextAnalysis.qualityStats(d).count() == d.count())
      assert(TextAnalysis.fingerprint(d).count() == d.count())
      assert(TextAnalysis.rollingFingerprint(d).count() == d.count())
    }
  }

  test("embeddings: empty corpus top-k and near-dup") {
    val es = new StructType().add("vec_id", LongType).add("embedding", ArrayType(FloatType))
    val noVecs = df(es, Nil)
    val oneVec = df(es, Seq(Row(1L, (1 to 64).map(_.toFloat))))
    assert(Similarity.bruteForceTopK(noVecs, noVecs, 5).count() == 0)
    assert(Similarity.bruteForceTopK(oneVec, oneVec, 5).count() == 0) // self excluded
    assert(Similarity.embeddingNearDup(noVecs, 0.5).count() == 0)
    assert(Similarity.embeddingNearDup(oneVec, 0.5).count() == 0)
    assert(TrainingData.quantizeEmbeddings(noVecs).count() == 0)
  }

  test("portable IVF: more cells than vectors still yields exact top-k behaviour") {
    val es = new StructType().add("vec_id", LongType).add("embedding", ArrayType(FloatType))
    val three = df(es, Seq(
      Row(1L, (1 to 64).map(_.toFloat)),
      Row(2L, (1 to 64).map(i => (65 - i).toFloat)),
      Row(3L, (1 to 64).map(i => (i % 7).toFloat))))
    // k=16 cells but only 3 vectors: seeds collapse to 3, training must
    // not divide by zero or drop vectors; every vector lands in a cell
    val r = Ivf.ivfTopKPortable(three, three, 2, nCells = 16, nProbe = 4, iters = 2)
    assert(r.count() > 0)
    assert(r.select("query_id").distinct().count() == 3)
  }

  test("portable pagerank: empty and self-loop-only edge lists") {
    val st = new StructType().add("src", LongType).add("dst", LongType)
    assert(graft.sources.GraphLoader.pageRankPortable(df(st, Nil)).count() == 0)
    // self-loops are dropped — no vertices survive
    val loops = df(st, Seq(Row(1L, 1L), Row(2L, 2L)))
    assert(graft.sources.GraphLoader.pageRankPortable(loops).count() == 0)
  }

  test("portable windowed covariance: single-bin windows are filtered (cov undefined)") {
    // sf0.001 events span many bins; restrict to one bin's worth by using
    // a window equal to the bin size → nb == 1 everywhere → empty result
    val r = graft.RelationalQueries.windowedCovariancePortable(
      graft.TestSpark.spark, "/root/testdata/sf0.001",
      windowSec = 3600L, binSec = 3600L)
    assert(r.count() == 0)
  }

  test("session-3 operators: empty and degenerate inputs") {
    import graft.RelationalQueries
    import graft.operators.ChangeData
    val evSchema = new StructType().add("event_id", LongType).add("ts", TimestampType)
      .add("user_id", LongType).add("event_type", StringType).add("value", DoubleType)
    val noEv = df(evSchema, Nil)
    val oneEv = df(evSchema,
      Seq(Row(1L, new java.sql.Timestamp(1000L), 1L, "a", 2.0)))
    for (e <- Seq(noEv, oneEv)) {
      assert(RelationalQueries.eventTransitions(e).count() == 0) // no pairs
      assert(RelationalQueries.ohlcDownsample(e).count() == e.count())
      assert(RelationalQueries.gapFill(e).count() == e.count())
      // n=1: both thresholds land on the single value → clipped == value
      assert(RelationalQueries.winsorize(e).collect()
        .forall(r => r.getDouble(2) == 2.0 && r.getLong(3) == 0L))
    }
    val partSchema = new StructType().add("p_partkey", LongType)
      .add("p_retailprice", DoubleType).add("p_size", IntegerType)
    assert(RelationalQueries.skyline(df(partSchema, Nil)).count() == 0)
    // a single part is trivially non-dominated
    assert(RelationalQueries.skyline(
      df(partSchema, Seq(Row(1L, 950.0, 7)))).count() == 1)
    val kv = new StructType().add("id", LongType).add("text", StringType)
    val noDocs = df(kv, Nil)
    assert(ChangeData.snapshotDiff(noDocs, noDocs, "id", "text").count() == 0)
    val chS = new StructType().add("id", LongType).add("op", StringType)
      .add("text", StringType).add("seq", LongType)
    // empty changelog: base passes through as "kept"
    val kept = ChangeData.cdcMerge(df(kv, Seq(Row(1L, "t"))), df(chS, Nil),
      "id", "text", "seq", "op").collect()
    assert(kept.length == 1 && kept.head.getString(2) == "kept")
    assert(TrainingData.weightedSample(
      df(new StructType().add("doc_id", LongType).add("n_chars", IntegerType), Nil)).count() == 0)
  }

  test("round-7 additions: empty and degenerate inputs") {
    import graft.RelationalQueries
    import graft.sources.GraphLoader
    val evSchema = new StructType().add("event_id", LongType).add("ts", TimestampType)
      .add("user_id", LongType).add("event_type", StringType).add("value", DoubleType)
    val noEv = df(evSchema, Nil)
    val oneEv = df(evSchema,
      Seq(Row(1L, new java.sql.Timestamp(1000L), 1L, "a", 2.0)))
    // KS: one event → one arm empty, numerator 0 (D undefined ≡ 0 by the contract)
    assert(RelationalQueries.ksTest(noEv).count() == 0)
    assert(RelationalQueries.ksTest(oneEv).collect().forall(_.getLong(3) == 0L))
    // runs test: the single event IS the median → sits out → zero runs row
    assert(RelationalQueries.runsTest(oneEv).collect().forall(_.getLong(1) == 0L))
    // survival: one user, lifetime 0, censored (active at corpus end)
    val sc = RelationalQueries.survivalCurve(oneEv).collect()
    assert(sc.length == 1 && sc.head.getLong(0) == 0L &&
      sc.head.getLong(1) == 1L && sc.head.getLong(3) == 1L)
    // audience overlap needs ≥ 2 types for a pair
    assert(RelationalQueries.audienceOverlap(oneEv).count() == 0)
    assert(RelationalQueries.audienceOverlap(noEv).count() == 0)
    // boilerplate removal: empty text is one (possibly shared) empty line
    val d2 = docs(Row(1L, "", "en", "s"), Row(2L, "", "en", "s"))
    val bp = TextAnalysis.dropBoilerplateLines(d2).collect()
    assert(bp.forall(r => r.getLong(1) == 1L && r.getLong(2) == 1L)) // df=2 ≤ maxDf
    // seed/path machinery on a seedless graph (no v ≡ 0 mod seedMod)
    val eSchema = new StructType().add("src", LongType).add("dst", LongType)
    val g = df(eSchema, Seq(Row(1L, 2L)))
    assert(GraphLoader.seedDistances(g, rounds = 2, seedMod = 97L).count() == 0)
    assert(GraphLoader.pathCounts(g, rounds = 2, seedMod = 97L).count() == 0)
    // pathCounts with every vertex a seed on a single edge: each endpoint
    // reaches the other once
    val pc = GraphLoader.pathCounts(g, rounds = 2, seedMod = 1L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(pc(1L) == ((2L, 0L, 2L)) && pc(2L) == ((2L, 0L, 2L)))
  }
}
