package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-independent semantic checks for the r7 analytics additions:
  * χ² independence, Mann–Whitney, incremental view maintenance, item-item
  * CF, and the declarative rule audit. Each is proved against a
  * brute-force Scala recomputation on sf0.001 (no DuckDB involved — the
  * driver gate is the cross-engine check; these pin the SEMANTICS).
  */
class AnalyticsExtSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  /** (event_type, cents, isA) for every event, arms resolved by the engine
    * (the portable hash is engine-side; the test replays its OUTPUT, not
    * its definition — so a hash change cannot silently desync the arms).
    */
  private lazy val armedEvents: Seq[(String, Long, Boolean)] =
    Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long"),
        pmod(graft.functions.PortableHash.hash60(
          concat(lit("ab_"), col("user_id"))), lit(2L)) === 0L)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))

  test("chi2_independence matches the closed form recomputed from its own cells") {
    val rows = RelationalQueries.chi2Query(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (a, b, c, d) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val n = (a + b + c + d).toDouble
      val dd = (a * d - b * c).toDouble
      val den = ((a + b) * (c + d)).toDouble * ((a + c) * (b + d)).toDouble
      val expect = if (den == 0) 0.0
        else BigDecimal(n * dd * dd / den).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - expect) < 1e-9, s"row $r expected chi2=$expect")
      // cells must partition the type's events exactly
      val total = armedEvents.count(_._1 == r.getString(0))
      assert(a + b + c + d == total, s"cells of $r don't sum to $total")
    }
  }

  test("mann_whitney equals the brute-force doubled rank-sum") {
    val got = RelationalQueries.mannWhitneyQuery(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val byType = armedEvents.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    for ((t, evs) <- byType) {
      val sorted = evs.map(e => (e._2, e._3)).sortBy(_._1)
      // doubled average rank per tie group: 2*(start..end avg) = 2s + k + 1
      var i = 0; var r2a = 0L
      while (i < sorted.size) {
        var j = i
        while (j < sorted.size && sorted(j)._1 == sorted(i)._1) j += 1
        val r2 = 2L * i + (j - i) + 1 // 2*(rows before) + tiecount + 1
        r2a += r2 * sorted.slice(i, j).count(_._2)
        i = j
      }
      val na = evs.count(_._3).toLong
      val nb = evs.size - na
      val u2 = r2a - na * (na + 1)
      assert(got(t) == ((na, nb, r2a, u2)), s"$t: got ${got(t)} want ${(na, nb, r2a, u2)}")
      assert(u2 >= 0 && u2 <= 2 * na * nb, s"$t: U out of range")
    }
  }

  test("ivm_agg partial merge equals the single-pass recompute") {
    val li = Tables.lineitem(spark, sf)
    val full = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("sum_price"),
        count(lit(1)).as("n"))
    val merged = RelationalQueries.ivmMergeAgg(spark, sf)
    assert(rowSet(merged.select(col("l_returnflag"), col("l_linestatus"),
      col("sum_qty"), col("sum_price"), col("n"))) == rowSet(full))
    // provenance columns must partition n
    assert(merged.filter(col("n_base") + col("n_delta") =!= col("n")).isEmpty)
    // both segments are genuinely populated in this fixture
    assert(merged.agg(sum("n_base"), sum("n_delta")).collect().head.toSeq
      .forall(_.asInstanceOf[Long] > 0))
  }

  test("item_cf equals the brute-force basket cosine top-5") {
    val got = RelationalQueries.itemCf(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    pipeline.InternalCaches.release()
    val baskets = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.part(spark, sf).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val sizes = baskets.groupBy(_._2).map { case (b, s) => b -> s.size.toLong }
    val byOrder = baskets.groupBy(_._1).values.map(_.map(_._2).toSeq.sorted)
    val num = scala.collection.mutable.Map[(String, String), Long]()
    for (bs <- byOrder; a <- bs; b <- bs if a != b)
      num((a, b)) = num.getOrElse((a, b), 0L) + 1
    val expect = num.toSeq.map { case ((a, b), nm) =>
      (a, b, nm, nm * nm * 1000000L / (sizes(a) * sizes(b)))
    }.groupBy(_._1).toSeq.flatMap { case (_, cands) =>
      cands.sortBy(c => (-c._4, -c._3, c._2)).take(5).zipWithIndex
        .map { case ((a, b, nm, s2), i) => (a, b, nm, s2, i + 1L) }
    }
    assert(got.toSet == expect.toSet)
  }

  test("dq_rules counts violations of each predicate in one scan") {
    val got = RelationalQueries.dqRules(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == RelationalQueries.dqRuleDefs.map(_._1).toSet)
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    for ((id, pred) <- RelationalQueries.dqRuleDefs) {
      val direct = li.filter(!expr(pred)).count()
      assert(got(id) == ((direct, total)), s"$id: got ${got(id)} want ($direct, $total)")
    }
    // the audit is one job over one scan: a single aggregate row exploded
    val plan = RelationalQueries.dqRules(spark, sf).queryExecution.optimizedPlan.toString
    assert("(?i)relation".r.findAllIn(plan).size == 1, s"rule audit must scan once:\n$plan")
  }

  test("corr_matrix equals BigInt-exact brute-force Pearson") {
    val quant = Tables.lineitem(spark, sf)
      .select(RelationalQueries.corrMeasures.map { case (n, q) =>
        expr(q).cast("long").as(n) }: _*)
      .collect().map(_.toSeq.map(v => BigInt(v.asInstanceOf[Long])))
    val names = RelationalQueries.corrMeasures.map(_._1)
    val n = BigInt(quant.size)
    def corr(i: Int, j: Int): Double = {
      val (sx, sy) = (quant.map(_(i)).sum, quant.map(_(j)).sum)
      val sxx = quant.map(r => r(i) * r(i)).sum
      val syy = quant.map(r => r(j) * r(j)).sum
      val sxy = quant.map(r => r(i) * r(j)).sum
      val num = (n * sxy - sx * sy).toDouble
      num / (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
    }
    val got = RelationalQueries.corrMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == 6)
    for (i <- names.indices; j <- names.indices if i < j) {
      val (gn, gc) = got((names(i), names(j)))
      assert(gn == quant.size)
      val expect = BigDecimal(corr(i, j)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(gc - expect) < 1e-9, s"${names(i)}/${names(j)}: $gc vs $expect")
      assert(math.abs(gc) <= 1.0)
    }
    // one scan: the whole matrix must not re-read lineitem per pair
    val plan = RelationalQueries.corrMatrix(spark, sf).queryExecution.optimizedPlan.toString
    assert("(?i)relation".r.findAllIn(plan).size == 1, s"corr_matrix must scan once:\n$plan")
  }

  test("corpus_divergence equals BigInt-exact brute-force smoothed TV") {
    val got = RelationalQueries.corpusDivergenceQuery(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    pipeline.InternalCaches.release()
    val counts = Tables.documents(spark, sf)
      .select(col("source"), explode(pipeline.Dedup.tokens(col("text"))).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val srcs = counts.keys.map(_._1).toSeq.distinct.sorted
    val vocab = counts.keys.map(_._2).toSet
    val vv = vocab.size.toLong
    val nTok = srcs.map(s => s -> counts.collect { case ((x, _), c) if x == s => c }.sum).toMap
    assert(got.size == srcs.size * (srcs.size - 1) / 2)
    for (i <- srcs.indices; j <- srcs.indices if i < j) {
      val (s1, s2) = (srcs(i), srcs(j))
      val (n1, n2) = (nTok(s1), nTok(s2))
      val (d1, d2) = (BigInt(n1 + vv), BigInt(n2 + vv))
      val tvNum = vocab.toSeq.map { w =>
        val c1 = BigInt(counts.getOrElse((s1, w), 0L))
        val c2 = BigInt(counts.getOrElse((s2, w), 0L))
        ((c1 + 1) * d2 - (c2 + 1) * d1).abs
      }.sum
      val (gv, gn1, gn2, gnum, gtv) = got((s1, s2))
      assert(BigInt(gnum) == tvNum, s"($s1,$s2): tv_num $gnum vs $tvNum")
      assert((gn1, gn2) == ((n1, n2)))
      assert(gv <= vv && gv > 0)
      val expect = BigDecimal(tvNum.toDouble / (2.0 * d1.toDouble * d2.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(gtv - expect) < 1e-9)
      assert(gtv >= 0.0 && gtv <= 1.0) // TV is a [0,1] metric
    }
  }

  test("window_rank_family matches per-partition recomputation") {
    val rows = RelationalQueries.windowRankFamily(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
    for ((_, part) <- rows.groupBy(_._1)) {
      val n = part.length
      val sorted = part.sortBy(p => (p._3, p._2)) // (priority, orderkey)
      // tie-stable family from priority groups
      val groups = sorted.groupBy(_._3).toSeq.sortBy(_._1)
      var before = 0L
      for (((_, g), di) <- groups.zipWithIndex) {
        val rnk = before + 1
        for (p <- g) {
          assert(p._4 == rnk, s"rank: $p")
          assert(p._5 == di + 1, s"dense_rank: $p")
          val pr = if (n > 1) (rnk - 1).toDouble / (n - 1) else 0.0
          assert(p._6 == pr, s"percent_rank: $p")
          assert(p._7 == (before + g.length).toDouble / n, s"cume_dist: $p")
        }
        before += g.length
      }
      // ntile(4): positional quartiles over the fully tiebroken order
      val base = n / 4; val rem = n % 4
      sorted.zipWithIndex.foreach { case (p, idx) =>
        val nt = (0 until 4).find { t =>
          val start = t * base + math.min(t, rem)
          idx < start + base + (if (t < rem) 1 else 0)
        }.get + 1
        assert(p._8 == nt, s"ntile: $p at $idx")
      }
    }
  }

  test("temporal_join assigns every event to exactly one dimension version") {
    val ev = Tables.events(spark, sf)
    val out = RelationalQueries.temporalJoin(spark, sf)
    assert(out.count() == ev.count()) // intervals partition each user's timeline
    assert(out.select(col("event_id")).distinct().count() == ev.count())
    // versions come from the same stream: the version's type matches the
    // event's own type whenever the event is not on a zero-length boundary
    val typed = out.join(ev.select(col("event_id"), col("event_type")), Seq("event_id"))
    val mismatch = typed.filter(col("dim_type") =!= col("event_type")).count()
    // zero-length versions require a type change on a duplicated (user, ts)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("ts"))
    val dupTs = ev.withColumn("k", count(lit(1)).over(w)).filter(col("k") > 1).count()
    assert(mismatch <= dupTs, s"$mismatch boundary mismatches vs $dupTs duplicate-ts events")
  }

  test("hierarchy_rollup equals brute-force subtree aggregation") {
    val qty = Tables.lineitem(spark, sf).groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nodes = Tables.supplier(spark, sf).select(col("s_suppkey"))
      .collect().map(_.getLong(0))
    def chainOf(k: Long): Seq[Long] =
      if (k == 0) Seq(0L)
      else Iterator.iterate(k)(_ / 5).takeWhile(_ > 0).toSeq
    val expect = nodes.flatMap(k => chainOf(k).map(a => (a, qty.getOrElse(k, 0L))))
      .groupBy(_._1).map { case (a, xs) =>
        a -> ((chainOf(a).size.toLong, xs.size.toLong, xs.map(_._2).sum))
      }
    val got = RelationalQueries.hierarchyRollup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    // conservation: root subtrees partition the forest
    val roots = got.filter(_._2._1 == 1L)
    assert(roots.values.map(_._3).sum == nodes.map(k => qty.getOrElse(k, 0L)).sum)
    assert(roots.values.map(_._2).sum == nodes.length)
  }

  test("bootstrap_ci brackets the sample mean with ordered finite bounds") {
    val got = RelationalQueries.bootstrapCiQuery(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    val means = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg((sum(round(col("value") * 100).cast("long")).cast("double") / count(lit(1)))
        .as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == means.keySet)
    for ((t, (lo, hi, n)) <- got) {
      assert(n == 2, s"$t: expected exactly the two order statistics")
      assert(lo < hi, s"$t: degenerate interval [$lo, $hi]")
      // the 95% CI of the mean must bracket the sample mean itself
      assert(lo <= means(t) && means(t) <= hi, s"$t: ${means(t)} outside [$lo, $hi]")
      // and plausibly scaled: ~200 events/type at sf0.001 with value
      // SD ≈ mean gives ≈ 2·1.96/√200 ≈ 28% relative width
      assert((hi - lo) / means(t) < 0.6, s"$t: implausibly wide CI")
    }
  }

  test("ks_test equals the brute-force integer KS numerator") {
    val got = RelationalQueries.ksTestQuery(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((t, evs) <- armedEvents.groupBy(_._1)) {
      val na = evs.count(_._3).toLong; val nb = evs.size - na
      var (cumA, cumB, best) = (0L, 0L, 0L)
      for ((c, grp) <- evs.groupBy(_._2).toSeq.sortBy(_._1)) {
        cumA += grp.count(_._3); cumB += grp.count(!_._3)
        best = best.max(math.abs(cumA * nb - cumB * na))
      }
      assert(got(t) == ((na, nb, best)), s"$t: ${got(t)} vs ${(na, nb, best)}")
    }
  }

  test("weighted_median is the smallest value reaching half the weight") {
    val cells = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_quantity")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = RelationalQueries.weightedMedian(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((flag, rows) <- cells.groupBy(_._1)) {
      val byVal = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = byVal.map(_._2).sum
      var cum = 0L
      val med = byVal.find { case (_, w) => cum += w; 2 * cum >= tot }.get._1
      assert(got(flag) == ((tot, med)), s"$flag: ${got(flag)} vs ${(tot, med)}")
    }
  }

  test("user_streaks partitions each user's active days into maximal runs") {
    val days = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_timestamp(ts) div 86400"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = days.groupBy(_._1).flatMap { case (u, ds) =>
      val sorted = ds.map(_._2).sorted
      val runs = sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((s0, e0) :: tail, d) if d == e0 + 1 => (s0, d) :: tail
        case (acc, d) => (d, d) :: acc
      }
      runs.map { case (s0, e0) => (u, s0, e0, e0 - s0 + 1) }
    }.toSet
    val got = RelationalQueries.userStreaks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("runs_test counts sign runs around the per-type median") {
    val base = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")), col("event_id"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = RelationalQueries.runsTestQuery(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((t, evs) <- base.groupBy(_._1)) {
      val sortedVals = evs.map(_._4).sorted
      var cum = 0L
      val med = sortedVals.groupBy(identity).toSeq.sortBy(_._1)
        .find { case (_, g) => cum += g.size; 2 * cum >= sortedVals.size }.get._1
      val signs = evs.sortBy(e => (e._2, e._3)).map(_._4).filter(_ != med)
        .map(c => if (c > med) 1 else -1)
      val nRuns = signs.zip(-99 +: signs.init).count { case (a, b) => a != b }.toLong
      val expect = (nRuns, signs.count(_ == 1).toLong, signs.count(_ == -1).toLong)
      assert(got(t) == expect, s"$t: ${got(t)} vs $expect")
    }
  }

  test("audience_overlap: bitmap popcount sums equal brute-force distinct-user intersections") {
    val au = Tables.events(spark, sf).select(col("event_type"), col("user_id"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = au.keys.toSeq.sorted
    val expect = (for {
      i <- types.indices; j <- (i + 1) until types.size
    } yield (types(i), types(j), (au(types(i)) & au(types(j))).size.toLong)).toSet
    val got = RelationalQueries.audienceOverlapQuery(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("survival_curve: risk set is the suffix sum, events+censored partition users") {
    val spans = Tables.events(spark, sf)
      .select(col("user_id"), floor(unix_timestamp(col("ts")) / 86400).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, ds) => (u, ds.map(_._2).min, ds.map(_._2).max) }.toSeq
    val maxD = spans.map(_._3).max
    val perT = spans.map { case (_, f, l) => (l - f, maxD - l < 7) }
      .groupBy(_._1).map { case (t, us) =>
        (t, us.count(!_._2).toLong, us.count(_._2).toLong)
      }.toSeq.sortBy(_._1)
    val expect = perT.map { case (t, ev, cen) =>
      val risk = perT.filter(_._1 >= t).map(p => p._2 + p._3).sum
      (t, risk, ev, cen)
    }.toSet
    val got = RelationalQueries.survivalCurveQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    // total events + censored across all t = total users
    assert(perT.map(p => p._2 + p._3).sum == spans.size)
  }

  test("l_diversity counts distinct sensitive buckets per QI class") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = cust.groupBy(c => (c._1, c._2)).map { case ((nat, seg), rows) =>
      val d = rows.map(_._3).distinct.size.toLong
      (nat, seg, rows.size.toLong, d, d >= 3)
    }.toSet
    val got = RelationalQueries.lDiversity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(got == expect)
  }

  test("rfm_segments scores against exact weighted quartiles and counts every customer") {
    val perCust = Tables.orders(spark, sf)
      .select(col("o_custkey"), floor(unix_timestamp(col("o_orderdate")) / 86400).cast("long"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (c, os) =>
        (c, os.map(_._2).max, os.size.toLong, os.map(_._3).sum)
      }.toSeq
    val maxD = perCust.map(_._2).max
    val rfm = perCust.map { case (_, last, f, m) => (maxD - last, f, m) }
    def quartiles(vs: Seq[Long]): (Long, Long, Long) = {
      val cells = vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val tot = cells.map(_._2).sum
      def q(p: Long): Long = {
        var cum = 0L
        cells.find { case (_, w) => cum += w; 4 * cum >= p * tot }.get._1
      }
      (q(1), q(2), q(3))
    }
    val (rq, fq, mq) = (quartiles(rfm.map(_._1)), quartiles(rfm.map(_._2)), quartiles(rfm.map(_._3)))
    def sc(v: Long, q: (Long, Long, Long)): Long =
      1L + (if (v >= q._1) 1 else 0) + (if (v >= q._2) 1 else 0) + (if (v >= q._3) 1 else 0)
    val expect = rfm.map { case (r0, f0, m0) => (sc(r0, rq), sc(f0, fq), sc(m0, mq)) }
      .groupBy(identity).map { case (k, g) => (k._1, k._2, k._3, g.size.toLong) }.toSet
    val got = RelationalQueries.rfmSegments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    assert(got.toSeq.map(_._4).sum == perCust.size)
  }

  test("streaming dedup replay equals batch count(DISTINCT) per day/type") {
    val streamed = streaming.EventStreams.streamingDedupReplay(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy((floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long").as("day"),
        col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    assert(rowSet(streamed) == rowSet(batch))
  }

  private val evSchema = new org.apache.spark.sql.types.StructType()
    .add("event_id", org.apache.spark.sql.types.LongType)
    .add("ts", org.apache.spark.sql.types.TimestampType)
    .add("user_id", org.apache.spark.sql.types.LongType)
    .add("event_type", org.apache.spark.sql.types.StringType)
  /** instant helper: exact epoch microseconds (no parse-timezone hazard) */
  private def us(sec: Long, micro: Long = 0L) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec, micro * 1000L))

  test("clickPurchaseJoinOf: band inclusive at both ends, bucket-boundary pair kept, no duplicates") {
    import org.apache.spark.sql.Row
    val h = 1704103200L // 2024-01-01 10:00:00 UTC, an exact hour boundary
    val rows = Seq(
      Row(1L, us(h - 1800), 1L, "click"),          // exactly 1h before the purchase: IN
      Row(2L, us(h - 1801, 999999L), 1L, "click"), // 1h + 1 microsecond: OUT
      Row(3L, us(h), 1L, "click"),                 // same bucket: IN
      Row(4L, us(h - 1), 1L, "click"),             // previous bucket: IN
      Row(5L, us(h + 1800), 1L, "click"),          // gap 0: IN
      Row(6L, us(h + 1800, 1L), 1L, "click"),      // after the purchase: OUT
      Row(7L, us(h + 1800), 1L, "purchase"),
      Row(8L, us(h + 3600), 2L, "purchase"),       // purchase ON a bucket boundary
      Row(9L, us(h), 2L, "click"))                 // exactly 1h, in bucket b-1: IN
    val got = RelationalQueries.clickPurchaseJoinOf(df(evSchema, rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.size == got.distinct.size, s"2-bucket probe duplicated a pair: $got")
    assert(got.toSet == Set((7L, 1L), (7L, 3L), (7L, 4L), (7L, 5L), (8L, 9L)),
      s"got ${got.toSet}")
  }

  test("temporalJoinOf: zero-length version on a duplicated timestamp skipped; boundary events take the NEW version") {
    import org.apache.spark.sql.Row
    val t0 = 1704103200L
    val rows = Seq(
      // user 1: A and B change at the SAME ts -> v1 = [t0, t0) is empty;
      // every event (including the type-A row itself) belongs to v2/B
      Row(1L, us(t0), 1L, "A"), Row(2L, us(t0), 1L, "B"), Row(3L, us(t0 + 60), 1L, "B"),
      // user 2: plain change at t0+60; the boundary event takes the new version
      Row(10L, us(t0), 2L, "A"), Row(11L, us(t0 + 60), 2L, "B"), Row(12L, us(t0 + 60), 2L, "B"))
    val got = RelationalQueries.temporalJoinOf(df(evSchema, rows)).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got == Map(
      1L -> ((2L, "B")), 2L -> ((2L, "B")), 3L -> ((2L, "B")),
      10L -> ((1L, "A")), 11L -> ((2L, "B")), 12L -> ((2L, "B"))), s"got $got")
  }
}
