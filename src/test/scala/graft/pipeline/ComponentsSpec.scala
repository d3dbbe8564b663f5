package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Connected components: equality with a union-find oracle, logarithmic
  * convergence on chains (the pointer-jump property), and the corpus-level
  * keep/drop composition.
  */
class ComponentsSpec extends AnyFunSuite {
  import TestSpark._

  private val pairSchema = new StructType().add("doc_a", LongType).add("doc_b", LongType)

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id root: path-compress to the smallest member
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byRoot = ids.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }.toMap
  }

  test("cached repartition(t) satisfies the round join's distribution — no edge re-exchange") {
    // the invariant connectedComponents' per-round cost model rests on: a
    // persisted frame repartitioned on the probe key is NOT re-shuffled by a
    // later equi-join on that key (only the label side moves per round)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val e = df(pairSchema, (0L until 50L).map(i => Row(i, i + 1)))
      .repartition(col("doc_b"))
      .persist()
    e.count()
    // force the shuffle-join path: at 100 TB neither side broadcasts
    val savedA = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedB = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val labels = df(pairSchema, (0L until 51L).map(i => Row(i, i)))
        .select(col("doc_a").as("id"), col("doc_b").as("label"))
      val joined = e.join(labels, e("doc_b") === labels("id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // the cached edge build shows as REPARTITION_BY_COL (paid once at
      // persist); per-join exchanges are tagged ENSURE_REQUIREMENTS — only
      // the label side may have one
      val perJoin = "ENSURE_REQUIREMENTS".r.findAllIn(plan.toString).size
      assert(perJoin == 1,
        s"expected only the label-side exchange, got $perJoin:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedA)
      savedB match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      e.unpersist()
    }
  }

  test("random graph matches a union-find oracle") {
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 300).map { _ =>
      val a = rnd.nextInt(200).toLong; val b = rnd.nextInt(200).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val d = df(pairSchema, pairs.map(p => Row(p._1, p._2)))
    val got = Components.connectedComponents(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(pairs)
    assert(got == want)
  }

  test("63-node chain converges within the pointer-jump bound (maxIter=8)") {
    // plain min-propagation needs 62 rounds on this; the jump needs ~log2
    val pairs = (0L until 62L).map(i => Row(i, i + 1))
    val d = df(pairSchema, pairs)
    val got = Components.connectedComponents(d, maxIter = 8).collect()
    assert(got.length == 63)
    assert(got.forall(_.getLong(1) == 0L), "all chain members must label 0")
    assert(got.count(_.getBoolean(2)) == 1)
  }

  test("two components + canonical flags + dropDuplicates composition") {
    val d = df(pairSchema, Seq(Row(5L, 9L), Row(9L, 7L), Row(20L, 21L)))
    val cc = Components.connectedComponents(d)
    val byId = cc.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(byId == Map(5L -> (5L, true), 9L -> (5L, false), 7L -> (5L, false),
      20L -> (20L, true), 21L -> (20L, false)))
    val docs = df(new StructType().add("doc_id", LongType).add("text", StringType),
      Seq(5L, 7L, 9L, 20L, 21L, 99L).map(i => Row(i, s"doc $i")))
    val kept = Components.dropDuplicates(docs, cc).collect().map(_.getLong(0)).toSet
    assert(kept == Set(5L, 20L, 99L)) // canonical per cluster + untouched singleton
  }

  test("maxIter exhaustion with labels still moving THROWS, never returns partial labels") {
    // a 63-node chain cannot converge in one round even with the pointer
    // jump; silently returning the partial labels would mis-cluster (and
    // downstream, keep/drop the wrong documents)
    val pairs = (0L until 62L).map(i => Row(i, i + 1))
    val d = df(pairSchema, pairs)
    val ex = intercept[Components.NonConvergenceException] {
      Components.connectedComponents(d, maxIter = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // and the documented remedy works: enough rounds → clean convergence
    assert(Components.connectedComponents(d, maxIter = 8).collect().length == 63)
  }

  test("empty pair list yields empty clustering") {
    val d = df(pairSchema, Nil)
    assert(Components.connectedComponents(d).collect().isEmpty)
  }
}
