package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Dataset-preparation operators: split determinism, packing arithmetic
  * (incl. the bucketed prefix sum vs the naive global window), quantization.
  */
class TrainingDataSpec extends AnyFunSuite {
  import TestSpark._

  private val docSchema = new StructType().add("doc_id", LongType).add("text", StringType)

  test("chunkDocuments: window starts, tail handling, fingerprints — hand-checked") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = df(docSchema, Seq(
      Row(0L, ""),        // no chunks
      Row(1L, "w1"),      // 1 short chunk
      Row(4L, words(4)),  // exactly one window
      Row(5L, words(5)),  // [w1..w4], [w4 w5]
      Row(8L, words(8)))) // [w1..w4], [w4..w7], [w7 w8]
    val got = TrainingData.chunkDocuments(d, size = 4, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    def fp(s: String) = graft.functions.PortableHash.local60(s)
    assert(!got.keySet.exists(_._1 == 0L))
    assert(got((1L, 0L)) == ((1L, fp("w1"))))
    assert(got((4L, 0L)) == ((4L, fp("w1 w2 w3 w4"))))
    assert(got.keySet.count(_._1 == 4L) == 1)
    assert(got((5L, 0L)) == ((4L, fp("w1 w2 w3 w4"))))
    assert(got((5L, 1L)) == ((2L, fp("w4 w5"))))
    assert(got((8L, 0L)) == ((4L, fp("w1 w2 w3 w4"))))
    assert(got((8L, 1L)) == ((4L, fp("w4 w5 w6 w7"))))
    assert(got((8L, 2L)) == ((2L, fp("w7 w8"))))
    assert(got.size == 7)
    // overlap invariant: consecutive windows share size-stride tokens —
    // their fingerprints differ but every token index is covered
    val cover = TrainingData.chunkDocuments(d, size = 4, stride = 3)
      .groupBy(col("doc_id")).agg(sum(col("n_tokens")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cover(8L) == 10L) // 8 tokens + 2 overlapped twice
  }

  test("weightedSample: max-of-w keys match local replay; weight tiers bias selection") {
    val st = new StructType().add("doc_id", LongType).add("n_chars", IntegerType)
    // 2000 docs, alternating length tiers: evens short (w=1), odds long (w=4)
    val docs = df(st, (0L until 2000L).map(i =>
      Row(i, if (i % 2 == 0) 100 else 600)))
    val got = TrainingData.weightedSample(docs, k = 200).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 200)
    // every key replays locally: max of w independent portable hashes
    def key(id: Long, w: Long) =
      (1L to w).map(j => graft.functions.PortableHash.local60(s"ws_${id}_$j")).max
    got.foreach { case (id, w, k) =>
      assert(w == (if (id % 2 == 0) 1L else 4L), s"doc $id wrong tier $w")
      assert(k == key(id, w), s"doc $id key mismatch")
    }
    // selection is the global top-k of those keys — exact, not a heuristic
    val expIds = (0L until 2000L)
      .map(i => (i, key(i, if (i % 2 == 0) 1L else 4L)))
      .sortBy { case (id, k) => (-k, id) }.take(200).map(_._1).toSet
    assert(got.map(_._1).toSet == expIds)
    // Efraimidis–Spirakis bias: w=4 docs must dominate the sample — the
    // expected share is 1 - (1-p)⁴-ish vs p; with 1000/1000 docs a 200-doc
    // sample favors the heavy tier ~3-4:1. Deterministic given the hash.
    val heavy = got.count(_._2 == 4L)
    assert(heavy > 120, s"weighted bias missing: only $heavy/200 heavy-tier docs")
  }

  test("groupSplit: every group lands wholly in one split") {
    val st = new StructType().add("doc_id", LongType).add("source", StringType)
    val docs = df(st, (0L until 300L).map(i => Row(i, s"src${i % 7}")))
    val got = TrainingData.groupSplit(docs, "source").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(got.groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1),
      "a group straddles splits")
    // determinism: same formula as splitCol on the group value
    val bySrc = got.toMap
    (0 until 7).foreach { s =>
      val b = graft.functions.PortableHash.local60(s"split_src$s") % 100
      val exp = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(bySrc(s"src$s") == exp)
    }
  }

  test("splitAssign: deterministic, complete, roughly proportional") {
    val d = df(docSchema, (0L until 1000L).map(i => Row(i, s"doc $i")))
    val s1 = TrainingData.splitAssign(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = TrainingData.splitAssign(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2) // hash-based: stable across runs
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 180)
  }

  test("packSequences: concat-then-chunk offsets; bucketed plan == naive window") {
    // doc i has i+1 tokens: offsets are triangular numbers
    val d = df(docSchema, (0L until 50L).map(i =>
      Row(i, (0 to i.toInt).map(j => s"t$j").mkString(" "))))
    val packed = TrainingData.packSequences(d, budget = 16L, bucketSize = 8L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 0: 1 token at offset 0 → chunk 0..0
    assert(packed(0L) == ((1L, 0L, 0L, 0L)))
    // doc 7: 8 tokens, start = 1+2+..+7 = 28 → chunks 1..2 (28/16=1, 35/16=2)
    assert(packed(7L) == ((8L, 28L, 1L, 2L)))
    // cross-bucket correctness: equals the naive single-window formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d.select(col("doc_id"),
        size(Dedup.tokens(col("text"))).cast("long").as("n"))
      .withColumn("start", sum(col("n")).over(w) - col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    packed.foreach { case (id, (_, start, _, _)) => assert(start == naive(id), s"doc $id") }
  }

  test("reservoirSample: heap aggregate == window formulation; no Window in the plan") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val got = TrainingData.reservoirSample(ev, "event_type", "event_id", 5)
    // differential twin: the window formulation over the same hash order
    val h = pmod(graft.functions.PortableHash.hash60(concat(lit("rsv_"), col("event_id"))),
      lit(1L << 52))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(h, col("event_id"))
    val twin = ev.select(col("event_type"), col("event_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
    assert(rowSet(got) == rowSet(twin), "heap aggregate disagrees with the window twin")
    // the scale contract: the plan aggregates (partial heaps), never
    // window-sorts the corpus
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec") && !p.contains("WindowGroupLimit"),
      s"reservoir must not plan a window:\n$p")
    assert(p.contains("topk_by_score"), s"heap aggregate missing from plan:\n$p")
  }

  test("exclusivePrefixSum: hierarchical == naive at every recursion depth") {
    // fan=4, depth=2 over 100 sparse keys → both recursion levels and the
    // bounded base case are exercised (100 → 25 → 7 rows)
    val st = new StructType().add("k", LongType).add("v", LongType)
    val rows = (0L until 100L).map(i => Row(i * 3, i % 7 + 1)) // sparse, nonuniform
    val d = df(st, rows)
    val got = TrainingData.exclusivePrefixSum(d, "k", "v", "off", fan = 4L, depth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    rows.sortBy(_.getLong(0)).foreach { r =>
      assert(got(r.getLong(0)) == acc, s"key ${r.getLong(0)}")
      acc += r.getLong(1)
    }
    assert(got.size == rows.size)
  }

  test("quantizeEmbeddings: digests of the int8 vector, zero-vector safe") {
    val es = new StructType().add("vec_id", LongType).add("embedding", ArrayType(FloatType))
    val d = df(es, Seq(
      Row(1L, Seq(1.0f, -0.5f, 0.25f)), // maxabs 1.0 → scale 1/127 → q = 127, -63, 32
      Row(2L, Seq(0.0f, 0.0f, 0.0f)))) // zero vector → scale 1.0, all zero
    val r = TrainingData.quantizeEmbeddings(d).collect()
      .map(x => x.getLong(0) -> (x.getDouble(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    val (scale1, sum1, min1, max1) = r(1L)
    assert(math.abs(scale1 - 1.0 / 127) < 1e-12)
    assert(max1 == 127L && min1 == -63L && sum1 == (127L - 63L + 32L))
    assert(r(2L) == ((1.0d, 0L, 0L, 0L)))
  }

  test("embedOutliers: lower-median med/MAD over exact norms; planted outlier flagged") {
    val es = new StructType().add("vec_id", LongType).add("embedding", ArrayType(FloatType))
    // norms (e3-quantized): 9 normal-ish vectors + 1 exploded + 1 zero
    val vecs: Seq[(Long, Array[Float])] =
      (1L to 9L).map(i => i -> Array.fill(4)(0.001f * i)) ++
      Seq(10L -> Array.fill(4)(100f), 11L -> Array.fill(4)(0f))
    val d = df(es, vecs.map { case (id, a) => Row(id, a.toSeq) })
    val r = TrainingData.embedOutliers(d).collect()
    assert(r.length == 1)
    val (n, med, mad, nOut, mn, mx) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3), r(0).getLong(4), r(0).getLong(5))
    def norm(a: Array[Float]) =
      a.map(x => { val v = math.floor(x.toDouble * 1000 + 0.5); v * v }).sum.toLong
    val norms = vecs.map(v => norm(v._2)).sorted
    val wantMed = norms((norms.size + 1) / 2 - 1)
    val devs = norms.map(x => math.abs(x - wantMed)).sorted
    val wantMad = devs((devs.size + 1) / 2 - 1)
    assert((n, med, mad) == ((11L, wantMed, wantMad)), s"got ($n, $med, $mad)")
    assert(nOut == norms.count(x => math.abs(x - wantMed) > 3 * wantMad) && nOut >= 1L)
    assert(mn == norms.head && mx == norms.last)
  }

  test("randomProjection: exact integer JL fold matches a scalar replay; zero-vector safe") {
    val es = new StructType().add("vec_id", LongType).add("embedding", ArrayType(FloatType))
    val vecs: Seq[(Long, Array[Float])] = Seq(
      1L -> Array.tabulate(64)(i => math.sin(i + 1.0).toFloat),
      2L -> Array.tabulate(64)(i => ((i % 5) - 2).toFloat),
      3L -> Array.fill(64)(0f))
    val d = df(es, vecs.map { case (id, a) => Row(id, a.toSeq) })
    val got = TrainingData.randomProjection(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def sign(k: Long, i: Int): Long =
      java.lang.Math.floorMod(graft.functions.PortableHash.local60(s"rp_${k}_$i"), 6L) match {
        case 0L => 1L; case 1L => -1L; case _ => 0L
      }
    val expect = (for {
      (id, a) <- vecs
      maxabs = a.map(x => math.abs(x.toDouble)).max
      scale = if (maxabs == 0.0) 1.0 else maxabs / 127.0
      q = a.map(x => math.floor(x.toDouble / scale + 0.5).toLong)
      k <- 0L until 8L
    } yield (id, k, q.zipWithIndex.map { case (qi, i) => qi * sign(k, i) }.sum)).toSet
    assert(got == expect)
    assert(got.count(_._3 != 0L) > 8, "projection degenerated to zeros")
    assert(got.filter(_._1 == 3L).forall(_._3 == 0L), "zero vector must project to zero")
  }

  test("gramMatrix: per-label upper-triangle sums equal the brute-force outer products") {
    val es = new StructType().add("vec_id", LongType)
      .add("embedding", ArrayType(FloatType)).add("label", IntegerType)
    val rows = Seq(
      Row(1L, Seq(1.0f, -0.5f, 0.25f), 1),
      Row(2L, Seq(0.5f, 0.5f, -1.0f), 1),
      Row(3L, Seq(0.0f, 2.0f, 1.0f), 2))
    val d = df(es, rows)
    def quant(v: Seq[Float]): Seq[Long] = {
      val m = v.map(x => math.abs(x.toDouble)).max
      val s = if (m == 0.0) 1.0 else m / 127.0
      v.map(x => math.floor(x.toDouble / s + 0.5).toLong)
    }
    val expect = rows.groupBy(_.getInt(2)).flatMap { case (lbl, rs) =>
      val qs = rs.map(r => quant(r.getSeq[Float](1)))
      for (i <- 0 until 3; j <- i until 3) yield
        (lbl, i.toLong, j.toLong) ->
          ((qs.map(q => q(i) * q(j)).sum, qs.size.toLong))
    }
    val got = TrainingData.gramMatrix(d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"got $got expect $expect")
  }

  test("pcaPower matches an exact in-memory integer replica; finds the spread axis") {
    val es = new StructType().add("vec_id", LongType)
      .add("embedding", ArrayType(FloatType)).add("label", IntegerType)
    // label 1 varies along dim 1 with small dim-0 noise — the dominant
    // eigenvector must concentrate on dim 1; label 2 varies along dim 2
    val rows = Seq(
      Row(1L, Seq(0.1f, 2.0f, 0.0f), 1), Row(2L, Seq(-0.1f, -2.0f, 0.1f), 1),
      Row(3L, Seq(0.05f, 1.5f, -0.1f), 1),
      Row(4L, Seq(0.0f, 0.1f, 3.0f), 2), Row(5L, Seq(0.1f, -0.1f, -2.5f), 2))
    val d = df(es, rows)
    val scale = 1000000L
    val got = TrainingData.pcaPower(d, iters = 3, scale = scale).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.pipeline.InternalCaches.release()

    // replica: quantize, mean-normalized full Gram (sign-split floor div),
    // 3 rounds of r = G̃v with max-abs renorm — all Long arithmetic
    def quant(v: Seq[Float]): Seq[Long] = {
      val m = v.map(x => math.abs(x.toDouble)).max
      val s = if (m == 0.0) 1.0 else m / 127.0
      v.map(x => math.floor(x.toDouble / s + 0.5).toLong)
    }
    def sdiv(x: Long, dd: Long): Long = (if (x < 0) -1L else 1L) * (math.abs(x) / dd)
    val expect = rows.groupBy(_.getInt(2)).flatMap { case (lbl, rs) =>
      val qs = rs.map(r => quant(r.getSeq[Float](1)))
      val n = qs.size.toLong
      val g = Array.tabulate(3, 3)((i, j) => sdiv(qs.map(q => q(i) * q(j)).sum, n))
      var v = Array.fill(3)(scale)
      for (_ <- 1 to 3) {
        val r = Array.tabulate(3)(i => (0 until 3).map(j => g(i)(j) * v(j)).sum)
        val m = math.max(r.map(math.abs).max, 1L)
        v = r.map(x => (if (x < 0) -1L else 1L) * (math.abs(x) * scale / m))
      }
      (0 until 3).map(i => (lbl, i.toLong) -> v(i))
    }
    assert(got == expect, s"got $got expect $expect")
    // eigen-direction sanity: the max-|component| axis is the spread axis
    assert(math.abs(got((1, 1L))) == scale && math.abs(got((2, 2L))) == scale)
  }
}
