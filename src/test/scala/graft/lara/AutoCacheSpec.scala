package graft.lara

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.pipeline.InternalCaches

/** Automatic shared-subtree caching (`LaraTable.noteUse`) — the reference's
  * lowering-time pipeline dedup (`api/TupleOp.kt:25-26` instance map,
  * `api/Lower.kt:107-127`) re-expressed as plan-build fan-out counting plus
  * Spark's plan-keyed CacheManager.
  */
class AutoCacheSpec extends AnyFunSuite {
  import TestSpark._

  private val vd = ValSpec("v", DoubleType, null)
  private val plus = PlusFn(null, c => sum(c), (a, b) => coalesce(a + b, a, b))

  private def base(): LaraTable = {
    val d = df(
      new StructType().add("k", StringType).add("j", StringType).add("v", DoubleType),
      Seq(Row("a", "x", 1.0), Row("a", "y", 2.0), Row("b", "x", 3.0), Row("b", "y", 4.0)))
    LaraTable(d, LaraSchema(Seq("k", "j"), Seq(vd)))
  }

  private def withCleanCaches[A](body: => A): A =
    try body finally {
      InternalCaches.release()
      spark.sharedState.cacheManager.clearCache()
    }

  test("linear chains never auto-persist") {
    withCleanCaches {
      val before = InternalCaches.registeredCount
      val g = base().agg(Seq("k"), Map("v" -> plus))
      val out = g.mapVals(Seq(vd), Map("v" -> (col("v") * 2))).where(col("v") > 0)
      assert(out.df.count() == 2)
      assert(g.df.storageLevel == StorageLevel.NONE)
      assert(InternalCaches.registeredCount == before)
    }
  }

  test("second consumption of a shuffle-bearing subtree auto-persists it") {
    withCleanCaches {
      val before = InternalCaches.registeredCount
      val g = base().agg(Seq("k"), Map("v" -> plus)) // shuffle boundary
      val left = g.where(col("k") === "a")
      assert(g.df.storageLevel == StorageLevel.NONE, "single use must not persist")
      val right = g.where(col("k") === "b")
      assert(g.df.storageLevel != StorageLevel.NONE, "fan-out 2 must persist")
      assert(InternalCaches.registeredCount == before + 1)
      assert(left.df.count() == 1 && right.df.count() == 1)
      // The FIRST consumer's plan (built before the persist) also reads the
      // cache: CacheManager matches on the canonicalized plan at execution.
      val plan = left.df.queryExecution.executedPlan.toString
      assert(plan.contains("InMemory") || plan.contains("TableCacheQueryStage"), plan)
    }
  }

  test("bare scans are never auto-persisted, regardless of fan-out") {
    withCleanCaches {
      val before = InternalCaches.registeredCount
      val t = base()
      val a = t.where(col("v") > 1)
      val b = t.where(col("v") > 2)
      val c = t.mapVals(Seq(vd), Map("v" -> (col("v") + 1)))
      assert(a.df.count() + b.df.count() + c.df.count() > 0)
      assert(t.df.storageLevel == StorageLevel.NONE)
      assert(InternalCaches.registeredCount == before)
    }
  }

  test("sortKeys views share their parent's fan-out count") {
    withCleanCaches {
      val g = base().agg(Seq("k"), Map("v" -> plus))
      val v1 = g.sortKeys(Seq("k")) // metadata-only: same underlying df
      v1.mapVals(Seq(vd), Map("v" -> (col("v") * 2))) // use 1
      assert(g.df.storageLevel == StorageLevel.NONE)
      g.where(col("k") === "a") // use 2, via the original wrapper
      assert(g.df.storageLevel != StorageLevel.NONE)
    }
  }

  test("withAutoCache(false) restores recompute plans") {
    withCleanCaches {
      LaraTable.withAutoCache(false) {
        val before = InternalCaches.registeredCount
        val g = base().agg(Seq("k"), Map("v" -> plus))
        g.where(col("k") === "a").df.count()
        g.where(col("k") === "b").df.count()
        assert(g.df.storageLevel == StorageLevel.NONE)
        assert(InternalCaches.registeredCount == before)
      }
      assert(LaraTable.autoCache)
    }
  }

  test("covariance pins one computation of the shared subtrees, no hints") {
    withCleanCaches {
      import graft.sensor.SensorPipeline
      val lines = df(new StructType().add("value", StringType),
        Seq("2020-01-01 00:00:10.000000;n;C1;f;1.5;u",
            "2020-01-01 00:00:20.000000;n;C2;f;2.5;u",
            "2020-01-01 00:02:10.000000;n;C1;f;3.5;u",
            "2020-01-01 00:02:20.000000;n;C2;f;4.5;u").map(Row(_)))
      import org.apache.spark.sql.catalyst.plans.logical.LeafNode
      import org.apache.spark.sql.execution.columnar.InMemoryRelation
      // Raw (non-cache) leaf scans in the optimized logical plan — cache
      // substitution (withCachedData) runs before optimization, and
      // InMemoryRelation is a LeafNode, so traversal counts only scans the
      // final query recomputes itself.
      def rawLeaves(d: org.apache.spark.sql.DataFrame): Int =
        d.queryExecution.optimizedPlan.collect {
          case l: LeafNode if !l.isInstanceOf[InMemoryRelation] => l
        }.size
      def build() = SensorPipeline.covariance(
        SensorPipeline.parse(lines), SensorPipeline.parse(lines))
      // Control: with auto-cache off, X's subtree (and its two parse
      // leaves) is inlined into every consumer — the parse inputs are
      // re-scanned many times.
      val offLeaves = LaraTable.withAutoCache(false) {
        val cov = build(); assert(cov.df.count() == 4); rawLeaves(cov.df)
      }
      val before = InternalCaches.registeredCount
      val cov = build()
      // X (A−B, 3 consumers) and U (mean-centered, 2 consumers) — exactly
      // the two subtrees the pre-r11 code marked with explicit `.cached`.
      assert(InternalCaches.registeredCount == before + 2)
      assert(cov.df.count() == 4) // 2x2 (c, c') matrix
      // One scan of each shared input: every path in the final plan goes
      // through a cached subtree — ZERO raw leaf scans remain, vs the
      // recompute plan's inlined re-scans.
      assert(offLeaves >= 6, s"control plan expected >=6 inlined leaves, got $offLeaves")
      assert(rawLeaves(cov.df) == 0,
        s"shared input scanned directly ${rawLeaves(cov.df)} times (recompute leaked past the cache)")
    }
  }
}
