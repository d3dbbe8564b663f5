package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Training-data pipeline operators: dedup, similarity, text analysis. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private val docSchema = new StructType().add("doc_id", LongType).add("text", StringType)
  private def docs(rows: (Long, String)*) =
    df(docSchema, rows.map(r => Row(r._1, r._2)))

  test("exact dedup groups identical texts, keeps min doc_id") {
    val d = docs(1L -> "hello world", 2L -> "hello world", 3L -> "unique text")
    val r = Dedup.exact(d).collect().map(x => (x.getLong(1), x.getLong(2))).toSet
    assert(r == Set((1L, 2L), (3L, 1L))) // (canonical_id, n_copies)
  }

  test("minhash: identical docs share full signature; est_jaccard reflects overlap") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val mostly = (1 to 36).map(i => s"tok$i").mkString(" ") + " x1 x2 x3 x4"
    val other = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> mostly, 4L -> other)
    val pairs = Dedup.minhashPairs(d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0) // identical → all 32 minhashes agree
    pairs.get((1L, 3L)).foreach(j => assert(j > 0.3 && j < 1.0))
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)))
  }

  test("incremental dedup equivalence law: pairs(old ∪ delta) == pairs(old) ∪ delta-probe") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    def pairSet(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = pairSet(Dedup.minhashPairs(docs))
    assert(full.nonEmpty, "fixture should contain near-dup candidates")

    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString + "/idx"
    Dedup.indexSignatures(old, dir)
    val incr = pairSet(Dedup.minhashPairs(old)) ++ pairSet(Dedup.minhashPairsDelta(delta, dir))
    assert(incr == full, "incremental discovery must be lossless vs full recompute")

    // second increment against the APPENDED index: split delta in two
    val d1 = delta.filter(col("doc_id") % 10 === 0)
    val d2 = delta.filter(col("doc_id") % 10 =!= 0)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_incr2").toString + "/idx"
    Dedup.indexSignatures(old, dir2)
    val p1 = pairSet(Dedup.minhashPairsDelta(d1, dir2))
    Dedup.indexSignatures(d1, dir2, append = true)
    val p2 = pairSet(Dedup.minhashPairsDelta(d2, dir2))
    assert(pairSet(Dedup.minhashPairs(old)) ++ p1 ++ p2 == full,
      "two-step increments over an appended index must also be lossless")
  }

  test("jaccardJoin: exact shingle-set jaccard via inverted index") {
    // doc1 shingles {a b c, b c d}; doc2 {a b c, b c x}: 1 shared of 3
    val d = docs(1L -> "a b c d", 2L -> "a b c x", 3L -> "q r s t")
    val r = Dedup.jaccardJoin(d, minJaccard = 0.3)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    assert(r == Map((1L, 2L) -> 0.333333)) // round(1/3, 6); doc3 shares nothing
    // higher threshold excludes the pair entirely
    assert(Dedup.jaccardJoin(d, minJaccard = 0.5).count() == 0)
  }

  test("containmentJoin: asymmetric — the quoted short doc clears the bar, its container does not") {
    // doc1's shingles all appear inside doc2 (doc2 = doc1 + a tail), but
    // doc2 has many shingles outside doc1: containment(1→2)=1, (2→1) low.
    val d = docs(
      1L -> "a b c d e",
      2L -> "a b c d e p q r s t u v w",
      3L -> "z z1 z2 z3")
    val got = Dedup.containmentJoin(d, minPermille = 600L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc1: 3 shingles (5 tokens, k=3), all shared with doc2 (11 shingles)
    assert(got.keySet == Set((1L, 2L)), s"got $got")
    assert(got((1L, 2L)) == ((3L, 3L, 11L)))
    // symmetric jaccard on the same pair is 3/11 < 0.5 — invisible to jaccardJoin
    assert(Dedup.jaccardJoin(d, minJaccard = 0.5).count() == 0)
  }

  test("jaccardJoin maxDf drops hot shingles from the index, with accounting") {
    // "x y z" appears in every doc — a boilerplate shingle; docs 1/2 are
    // near-dups beyond it, docs 3/4 share ONLY the boilerplate.
    val d = docs(
      1L -> "x y z a b c d", 2L -> "x y z a b c e",
      3L -> "x y z p q r s", 4L -> "x y z t u v w")
    val capped = Dedup.jaccardJoin(d, minJaccard = 0.05, maxDf = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(capped.contains((1L, 2L))) // survives: shares non-hot shingles
    assert(!capped.contains((3L, 4L))) // dropped: only the hot shingle linked them
    val hot = Dedup.hotShingles(d, maxDf = 3).collect()
    assert(hot.length >= 1 && hot.forall(_.getLong(1) == 4L)) // accounted, not silent
  }

  test("jaccardJoin pre-flight pair budget fails fast on mass duplication") {
    // The sf10 failure mode in miniature (ScaleUp makes replicas
    // NEAR-duplicates, so clusters have multiplicity = factor): 5 clusters
    // of 10 identical docs. Each doc has 8 tokens → 6 distinct k=3
    // shingles; every shingle has df = 10 within its cluster, so the exact
    // pair count the self-join must emit is 5 clusters × 6 shingles ×
    // C(10,2) = 1350 — which the guard computes EXACTLY from the df
    // aggregate. The throw sits before the pair-join plan is even
    // constructed, so no shuffle of the quadratic stage can run.
    val rows = for (c <- 0 until 5; i <- 0 until 10)
      yield ((c * 10 + i).toLong, (1 to 8).map(t => s"c${c}tok$t").mkString(" "))
    val d = docs(rows: _*)
    val e = intercept[IllegalStateException] {
      Dedup.jaccardJoin(d, maxExpectedPairs = 1000L)
    }
    // the error must route the caller to the scalable path, by name
    assert(e.getMessage.contains("minhashPairs"), e.getMessage)
    assert(e.getMessage.contains("prepareCorpus"), e.getMessage)
    assert(e.getMessage.contains("maxDf"), e.getMessage)
    // a budget just above the true estimate passes (the guard is exact,
    // not a heuristic), and the unguarded run confirms the Θ(m²) output
    // the estimate priced: C(10,2) pairs per cluster
    assert(Dedup.jaccardJoin(d, maxExpectedPairs = 1400L).count() == 5 * 45)
    assert(Dedup.jaccardJoin(d, maxExpectedPairs = 0L).count() == 5 * 45)
    // maxDf cooperation: the guard prices the index AFTER the hot-shingle
    // cap, so a capped call inside budget proceeds
    assert(Dedup.jaccardJoin(d, maxDf = 5, maxExpectedPairs = 1000L).count() == 0)
    // the sibling inverted-index pair operators carry the same guard:
    // containment emits ORDERED pairs, so its exact count is double
    // jaccard's (2700) — a budget of 2699 fires, 2700 passes
    intercept[IllegalStateException] {
      Dedup.containmentJoin(d, maxExpectedPairs = 2699L)
    }
    assert(Dedup.containmentJoin(d, maxExpectedPairs = 2700L).count() == 5 * 90)
    intercept[IllegalStateException] {
      Dedup.tfCosinePairs(d, maxExpectedPairs = 1000L)
    }
    assert(Dedup.tfCosinePairs(d, maxExpectedPairs = 0L).count() == 5 * 45)
    // crossCorpusOverlap: Σ df_train·df_eval — eval holds one doc from
    // each of the 5 mass-dup clusters, so every one of its 6 shingles
    // meets df_train = 10: expected = 5·6·10 = 300 exactly
    val eval5 = docs((0 until 5).map(c =>
      (1000L + c) -> (1 to 8).map(t => s"c${c}tok$t").mkString(" ")): _*)
    val ce = intercept[IllegalStateException] {
      Dedup.crossCorpusOverlap(d, eval5, k = 3, maxExpectedPairs = 299L)
    }
    assert(ce.getMessage.contains("bloomDecontaminate"), ce.getMessage)
    // exactly at the estimate passes, and the join's row count is the
    // priced quantity collapsed per (eval, train) pair: 5 clusters × 10
    assert(Dedup.crossCorpusOverlap(d, eval5, k = 3, maxExpectedPairs = 300L)
      .count() == 5 * 10)
  }

  test("minhash/simhash bucket cap bounds degenerate buckets with accounting") {
    // 200 identical docs: every band maps them to one bucket — uncapped
    // that is 19 900 pairs per band; capped, zero pairs, and the oversized
    // bucket is reported. (Identical docs are Dedup.exact's job.)
    val many = (1 to 200).map(i => i.toLong -> "same text in every doc here")
    val d = docs(many: _*)
    assert(Dedup.minhashPairs(d, maxBucket = 50).count() == 0)
    assert(Dedup.simhashPairs(d, maxBucket = 50).count() == 0)
    val sigs = d.select(col("doc_id"),
        Dedup.portableBaseHashes(Dedup.shingles(Dedup.tokens(col("text")), 3)).as("bh"))
      .select(col("doc_id"), Dedup.minhashSignaturePortable(col("bh"), 32).as("sig"))
    val banded = sigs.select(col("doc_id"),
        posexplode(org.apache.spark.sql.functions.transform(
          sequence(lit(0), lit(7)),
          b => xxhash64(concat_ws("_", slice(col("sig"), b * 4 + 1, lit(4)))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val over = Dedup.oversizedBuckets(banded, 50).collect()
    assert(over.length == 8 && over.forall(_.getLong(2) == 200L)) // one hot bucket per band
  }

  test("simhash: identical docs → hamming 0; disjoint docs don't pair") {
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = (1 to 30).map(i => s"v$i").mkString(" ")
    val d = docs(1L -> a, 2L -> a, 3L -> b)
    val r = Dedup.simhashPairs(d).collect().map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r((1L, 2L)) == 0L)
    assert(!r.contains((1L, 3L)))
  }

  test("brute-force topk: exact cosine ranking on constructed vectors") {
    val es = new StructType().add("vec_id", LongType).add("embedding", ArrayType(FloatType))
    val corpus = df(es, Seq(
      Row(0L, Seq(1.0f, 0.0f)),   // query
      Row(1L, Seq(1.0f, 0.0f)),   // cos 1.0
      Row(2L, Seq(1.0f, 1.0f)),   // cos ~0.7071
      Row(3L, Seq(0.0f, 1.0f)),   // cos 0
      Row(4L, Seq(-1.0f, 0.0f)))) // cos -1
    val r = Similarity.bruteForceTopK(corpus, corpus.filter(col("vec_id") === 0), 3)
      .collect().sortBy(_.getLong(3)).map(x => (x.getLong(1), x.getDouble(2)))
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(r(0)._2 == 1.0 && math.abs(r(1)._2 - 0.707107) < 1e-6 && r(2)._2 == 0.0)
  }

  test("lsh topk returns a subset of brute-force candidates with same scores") {
    val rnd = new scala.util.Random(7)
    val es = new StructType().add("vec_id", LongType).add("embedding", ArrayType(FloatType))
    val rows = (0 until 50).map(i => Row(i.toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val corpus = df(es, rows)
    val queries = corpus.filter(col("vec_id") < 2)
    val brute = Similarity.bruteForceTopK(corpus, queries, 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Similarity.lshTopK(corpus, queries, 5, dim = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(lsh.nonEmpty)
    lsh.foreach { case (pair, score) => assert(brute(pair) == score) }
    // buckets must actually partition the corpus (a dim mismatch would
    // degenerate every sign bit to 0 and every vector to one bucket)
    val buckets = corpus.select(explode(
      Similarity.lshBandBuckets(col("embedding"), 4, 4, 8)).as("b"))
      .distinct().count()
    assert(buckets > 4, s"expected >4 distinct buckets, got $buckets")
  }

  test("fuzzyJoin: symmetric-delete blocking equals brute-force Levenshtein ≤ 1") {
    // substitution, deletion, insertion, transposition (distance 2 — must
    // NOT pair), equality (collapses in distinct), unrelated
    val vals = Seq("spark", "spork", "spar", "sparkk", "psark", "spark",
      "quartz", "quart", "xyz", "xzy", "banana")
    val d = df(new StructType().add("v", StringType), vals.map(Row(_)))
    val got = Dedup.fuzzyJoin(d, "v").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val uniq = vals.distinct
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val exp = (for {
      a <- uniq; b <- uniq
      if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got == exp, s"missing=${exp -- got} extra=${got -- exp}")
    assert(exp.contains(("spark", "spork")) && exp.contains(("spar", "spark")) &&
      exp.contains(("spark", "sparkk")), "sub/del/ins all present")
    assert(!exp.contains(("psark", "spark")), "transposition is distance 2")
  }

  test("keywordSearch: ALL-of and NONE-of semantics, repeated terms count once") {
    val schema = new StructType().add("doc_id", LongType).add("text", StringType)
      .add("source", StringType)
    val d = df(schema, Seq(
      Row(1L, "spark join vector fast", "s0"),      // all three → hit
      Row(2L, "spark spark join join vector", "s1"), // repeats count once → hit
      Row(3L, "spark join", "s0"),                  // missing vector → miss
      Row(4L, "spark join vector slow", "s1"),      // has the stopword → miss
      Row(5L, "unrelated text", "s0")))
    val got = Ranking.keywordSearch(d,
      must = Seq("spark", "join", "vector"), mustNot = Seq("slow"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "s0"), (2L, "s1")), s"got $got")
  }

  test("entityResolution: transitive fuzzy clusters, lexicographic-min canonical, singletons") {
    val schema = new StructType().add("name", StringType)
    // chain: acme ~ acme1 ~ acme12 (transitive through distance-1 hops,
    // ends are distance 2 apart); bobco alone; cases collapse via distinct
    val d = df(schema, Seq("acme", "acme1", "acme12", "bobco", "acme").map(Row(_)))
    val got = Dedup.entityResolution(d, "name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "acme" -> "acme", "acme1" -> "acme", "acme12" -> "acme",
      "bobco" -> "bobco"), s"got $got")
  }

  test("quality stats and language id on constructed docs") {
    val ds = new StructType().add("doc_id", LongType).add("text", StringType)
    val d = df(ds, Seq(
      Row(1L, "the cat and the dog is in a house"),
      Row(2L, "der hund und die katze ist gut"),
      Row(3L, "xyzzy qwerty")))
    val q = TextAnalysis.qualityStats(d).collect().map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getLong(2) == 9) // n_tokens
    assert(q(1L).getDouble(4) > 0.4) // stopword ratio: the,and,the,is,in,a → 6/9
    val lang = TextAnalysis.langId(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lang(1L) == "en" && lang(2L) == "de" && lang(3L) == "und")
  }

  test("dedupLines: first occurrence kept, order preserved, rebuilt text fingerprinted") {
    val d = df(docSchema, Seq(
      Row(1L, "header\nbody one\nheader\nbody two\nheader"),
      Row(2L, "a\na\na"),
      Row(3L, "unique")))
    val got = TextAnalysis.dedupLines(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def fp(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(got(1L) == ((5L, 3L, fp("header\nbody one\nbody two"))))
    assert(got(2L) == ((3L, 1L, fp("a"))))
    assert(got(3L) == ((1L, 1L, fp("unique"))))
  }

  test("dropBoilerplateLines: corpus-df rule drops shared lines, keeps within-doc repeats") {
    val d = df(docSchema, Seq(
      Row(1L, "NAV\nstory one\nNAV\nfooter"),   // NAV repeats inside doc 1
      Row(2L, "NAV\nstory two\nfooter"),
      Row(3L, "NAV\nstory three\nfooter"),
      Row(4L, "solo line")))
    // df: NAV → 3 docs, footer → 3 docs (> maxDf=2 → boilerplate); stories unique
    val got = TextAnalysis.dropBoilerplateLines(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def fp(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(got(1L) == ((4L, 1L, fp("story one"))))
    assert(got(2L) == ((3L, 1L, fp("story two"))))
    assert(got(3L) == ((3L, 1L, fp("story three"))))
    assert(got(4L) == ((1L, 1L, fp("solo line"))))
    // at maxDf = 3 everything survives, within-doc repeat included in order
    val lax = TextAnalysis.dropBoilerplateLines(d, maxDf = 3L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(lax(1L) == ((4L, 4L, fp("NAV\nstory one\nNAV\nfooter"))))
  }

  test("featureHash: signed bucket sums equal a scalar replay; cancelled buckets dropped") {
    val d = df(docSchema, Seq(
      Row(1L, "cat dog cat fish bird"),
      Row(2L, "dog dog dog"),
      Row(3L, "")))
    val got = TextAnalysis.featureHash(d, dims = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def bucket(t: String) =
      java.lang.Math.floorMod(graft.functions.PortableHash.local60(s"fh_$t"), 16L)
    def sgn(t: String) =
      if (java.lang.Math.floorMod(graft.functions.PortableHash.local60(s"fs_$t"), 2L) == 0L) 1L
      else -1L
    val want = Seq(1L -> "cat dog cat fish bird", 2L -> "dog dog dog")
      .flatMap { case (id, text) =>
        text.split("\\s+").filter(_.nonEmpty).map(t => (id, bucket(t)) -> sgn(t))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .filter(_._2 != 0L)
    assert(got == want)
    assert(!got.keySet.exists(_._1 == 3L), "empty doc contributes nothing")
  }

  test("calibrationBins: bins partition the corpus; per-bin sums match a qualityScore join") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val got = TextAnalysis.calibrationBins(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val q = TextAnalysis.qualityScore(docs).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lang = docs.select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = q.toSeq.groupBy { case (_, v) => math.min(math.floor(v * 10).toLong, 9L) }
      .view.mapValues { xs =>
        (xs.size.toLong,
          xs.count { case (id, _) => lang(id) == "en" }.toLong,
          xs.map { case (_, v) => math.round(v * 1000000) }.sum)
      }.toMap
    assert(got == want)
    assert(got.values.map(_._1).sum == docs.count())
  }

  test("fingerprints: normalized digest conflates formatting noise; rolling hash is order-sensitive") {
    val ds = new StructType().add("doc_id", LongType).add("text", StringType)
    val d = df(ds, Seq(
      Row(1L, "Hello  World"), Row(2L, "hello world"), // differ only in case/spacing
      Row(3L, "world hello")))                          // permuted
    val fp = TextAnalysis.fingerprint(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    val rf = TextAnalysis.rollingFingerprint(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rf(2L) != rf(3L)) // same bag of words, different order
  }

  test("plan audit: dedup/similarity scans prune to the columns they use") {
    // a scan that reads all columns for a 2-column operator is wrong at
    // 100 TB — the parquet ReadSchema must carry only what the op consumes.
    // Other suites may have cached these tables (which would swap the scan
    // for InMemoryTableScan and hide the ReadSchema): audit the cold plan.
    spark.sharedState.cacheManager.clearCache()
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val jp = Dedup.jaccardJoin(docs).queryExecution.executedPlan.toString
    assert(jp.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"jaccardJoin reads more than (doc_id, text):\n${jp.take(2000)}")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val np = Similarity.embeddingNearDup(emb, 0.4).queryExecution.executedPlan.toString
    assert(np.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      s"embeddingNearDup reads more than (vec_id, embedding):\n${np.take(2000)}")
  }

  test("repetitionStats: top-bigram share flags repeated boilerplate") {
    val ds = new StructType().add("doc_id", LongType).add("text", StringType)
    val d = df(ds, Seq(
      Row(1L, "buy now buy now buy now"),   // bigrams: (buy now)x3, (now buy)x2 → top 3/5
      Row(2L, "a b c d e")))                // all 4 bigrams distinct → top 1/4
    val r = TextAnalysis.repetitionStats(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((5L, 3L, 0.6)))
    assert(r(2L) == ((4L, 1L, 0.25)))
  }

  test("token counting: whitespace and BPE-ish") {
    val ds = new StructType().add("doc_id", LongType).add("text", StringType)
    val d = df(ds, Seq(Row(1L, "don't stop, 42 times!")))
    val r = d.select(TextAnalysis.tokenCount(col("text")).as("n"),
      size(TextAnalysis.bpeishTokens(col("text"))).as("b")).collect().head
    assert(r.getInt(0) == 4)
    // don ' t stop , 4 2 times ! → 9
    assert(r.getInt(1) == 9)
  }

  test("docKeyphrases: integer tf/df ranking equals brute force, ties by phrase") {
    val texts = Map(
      1L -> "red fox red fox jumps high red fox",
      2L -> "red fox sleeps all day long",
      3L -> "blue bird sings blue bird flies")
    val d = docs(texts.toSeq: _*)
    def sh(t: String): Seq[String] = {
      val w = t.split(" ").toSeq
      if (w.size <= 2) Seq(w.mkString(" "))
      else w.zip(w.tail).map { case (a, b) => s"$a $b" }
    }
    val tf = texts.toSeq.flatMap { case (id, t) => sh(t).map(p => (id, p)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dfm = tf.keys.toSeq.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = tf.keys.toSeq.groupBy(_._1).flatMap { case (id, ks) =>
      ks.map { case (_, p) => (p, tf((id, p)), dfm(p), tf((id, p)) * 1000000L / dfm(p)) }
        .sortBy { case (p, _, _, s) => (-s, p) }
        .take(3).zipWithIndex
        .map { case ((p, t, df, _), i) => (id, p) -> ((t, df, i + 1L)) }
    }
    val got = TextAnalysis.docKeyphrases(d, 3).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    graft.pipeline.InternalCaches.release()
    assert(got == expect, s"got $got expect $expect")
  }

  test("hardNegatives: top-k different-label vectors; same-label near-dups excluded") {
    val es = new StructType().add("vec_id", LongType)
      .add("embedding", ArrayType(FloatType)).add("label", IntegerType)
    val corpus = df(es, Seq(
      Row(0L, Seq(1.0f, 0.0f), 1),   // query, label 1
      Row(1L, Seq(1.0f, 0.0f), 1),   // identical but same label → excluded
      Row(2L, Seq(1.0f, 0.1f), 2),   // hard negative (cos ~0.995)
      Row(3L, Seq(0.0f, 1.0f), 2),   // easy negative (cos 0)
      Row(4L, Seq(-1.0f, 0.0f), 3))) // opposite (cos -1)
    val got = Similarity.hardNegatives(corpus, corpus.filter(col("vec_id") === 0), 2)
      .collect().sortBy(_.getLong(3))
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(2L, 3L), s"got ${got.toSeq}")
    assert(got(0)._2 > 0.99 && got(1)._2 == 0.0)
  }

  test("knnLabelConfusion equals an in-memory replay of LSH candidates + ranked votes") {
    val (dim, bands, ppb, k) = (4, 2, 2, 2)
    // two label clusters with deterministic spread + one outlier label
    val vecs: Seq[(Long, Array[Float], Int)] =
      (0 until 5).map(i => (i.toLong, Array(1.0f, 0.1f * i, 0.2f, -0.1f * i), 1)) ++
      (5 until 9).map(i => (i.toLong, Array(-1.0f, 0.15f * i, -0.3f, 0.05f * i), 2)) ++
      Seq((9L, Array(0.1f, 1.0f, -0.2f, 0.3f), 3))
    val es = new StructType().add("vec_id", LongType)
      .add("embedding", ArrayType(FloatType)).add("label", IntegerType)
    val d = df(es, vecs.map(v => Row(v._1, v._2.toSeq, v._3)))
    val got = Similarity.knnLabelConfusion(d, k = k, bands = bands,
        planesPerBand = ppb, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.pipeline.InternalCaches.release()

    // replay: md5 planes → sign-bit buckets → ≥1-band candidates → rounded
    // cosine ranked (desc, id asc) → top-k label votes. Same double folds.
    val planes = (0 until bands * ppb).map(p => Similarity.plane(p, dim))
    def dotd(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, j) => s + a(j).toDouble * b(j).toDouble)
    def buckets(e: Array[Float]): Seq[Long] = (0 until bands).map { b =>
      (0 until ppb).map { i =>
        val pl = planes(b * ppb + i)
        val dt = e.indices.foldLeft(0.0)((s, j) => s + e(j).toDouble * pl(j))
        if (dt > 0) 1L else 0L
      }.reduceLeft((acc, bit) => acc * 2 + bit)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (na, nb) = (math.sqrt(dotd(a, a)), math.sqrt(dotd(b, b)))
      val c = if (na == 0 || nb == 0) 0.0 else dotd(a, b) / (na * nb)
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val bks = vecs.map(v => v._1 -> buckets(v._2)).toMap
    val expected = vecs.flatMap { case (qid, qe, ql) =>
      vecs.filter(o => o._1 != qid && bks(qid).lazyZip(bks(o._1)).exists(_ == _))
        .map(o => (o._1, o._3, cos(qe, o._2)))
        .sortBy { case (id, _, c) => (-c, id) }
        .take(k)
        .map(c => (ql.toLong, c._2.toLong))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expected, s"got $got expect $expected")
  }

  test("tfCosinePairs: exact components equal brute force; threshold is a strict gate") {
    // doc1/doc2: same words, different multiplicities — high tf-cosine;
    // doc3 shares one word with doc1; doc4 disjoint
    val d = docs(
      1L -> "a a b b c",
      2L -> "a a a b b b c c",
      3L -> "c z y x w v u t",
      4L -> "q r s")
    val rows = Dedup.tfCosinePairs(d, k = 1, tauPct = 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    graft.pipeline.InternalCaches.release()
    // brute force over word tf maps
    def tf(t: String) = t.split(" ").groupBy(identity).view.mapValues(_.length.toLong).toMap
    val m = Map(1L -> tf("a a b b c"), 2L -> tf("a a a b b b c c"),
      3L -> tf("c z y x w v u t"), 4L -> tf("q r s"))
    def nsq(v: Map[String, Long]) = v.values.map(x => x * x).sum
    val expect = (for {
      a <- m.keys; b <- m.keys if a < b
      num = m(a).keySet.intersect(m(b).keySet).toSeq.map(w => m(a)(w) * m(b)(w)).sum
      if num > 0 && 10000 * num * num >= 100 * nsq(m(a)) * nsq(m(b))
    } yield (a, b) -> ((num, nsq(m(a)), nsq(m(b))))).toMap
    assert(rows == expect, s"got $rows expect $expect")
    // raising tau above (1,2)'s cosine must drop it
    val strict = Dedup.tfCosinePairs(d, k = 1, tauPct = 99L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.pipeline.InternalCaches.release()
    assert(!strict.contains((1L, 3L)) && !strict.contains((3L, 4L)))
  }

  test("tfCosinePairs maxDf: capping a stopword under-counts num, never adds pairs") {
    val d = docs(
      1L -> "the the cat sat", 2L -> "the the cat ran",
      3L -> "the dog", 4L -> "the bird")
    val full = Dedup.tfCosinePairs(d, k = 1, tauPct = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.pipeline.InternalCaches.release()
    val capped = Dedup.tfCosinePairs(d, k = 1, tauPct = 1L, maxDf = 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.pipeline.InternalCaches.release()
    assert(capped.keySet.subsetOf(full.keySet))
    capped.foreach { case (k, num) => assert(num <= full(k)) }
    // "the" (df=4) is the only capped term: pairs sharing ONLY it vanish
    assert(!capped.contains((3L, 4L)) && full.contains((3L, 4L)))
  }
}
