package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guardrails over the ENTIRE contract-query surface — the
  * anti-scale-killer gate. A window with no partition spec moves the whole
  * frame through one task ("WindowExec: No Partition Defined" at runtime);
  * fine on 60k rows, fatal at 100 TB. Every contract query must be free of
  * them — bounded frames must use a constant partition key (see
  * `TrainingData.exclusivePrefixSum`) to make the boundedness explicit.
  */
class PlanGuardrailsSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  test("no contract query plans an unpartitioned (single-task) window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      val bad = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      if (bad.nonEmpty) Some(s"$name (${bad.size} unpartitioned window(s))") else None
    }
    assert(offenders.isEmpty,
      s"queries with single-partition windows:\n  ${offenders.mkString("\n  ")}")
  }

  test("media decode queries never shuffle binary payloads") {
    // decode → stats (for images also the resize round trip) is
    // partition-local; a binary column crossing an Exchange is the 100 TB
    // scale-killer an earlier join-based formulation had. The only
    // permitted exchange is the id-only rebalance BEFORE payload
    // generation (longs on the wire, never bytes) — so the invariant is
    // checked per-exchange on the columns it carries, not plan-wide.
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.BinaryType
    for (q <- Seq("media_decode", "media_audio", "media_video", "media_gif")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
      val binaryExchanges = plan.collect {
        case e: Exchange if e.child.output.exists(_.dataType == BinaryType) => e
      }
      assert(binaryExchanges.isEmpty,
        s"$q shuffles binary payloads (${binaryExchanges.size} exchange(s)):\n$plan")
    }
  }

  test("rand_project: zero exchanges — the sign matrix broadcasts, nothing shuffles") {
    // the JL projection's whole point at 100 TB: per-row map work against
    // an 8-row broadcast; any Exchange means the plan regressed to moving
    // vectors
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = SparkEntry.queries("rand_project")(spark, sf).queryExecution.executedPlan
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty, s"rand_project shuffles (${shuffles.size}):\n$plan")
  }

  test("cached key-partitioned frame self-joins with ZERO per-join exchanges") {
    // the invariant triangleCount's wedge join and semanticDedup's pair
    // join rest on: BOTH children of a self-join over a persisted frame
    // repartitioned on the join key read the cached partitioning, so the
    // join plans no ENSURE_REQUIREMENTS exchange at all (ComponentsSpec
    // pins the one-sided variant). Broadcasts disabled: at 100 TB neither
    // side broadcasts.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.functions._
    val o = spark.range(0, 200)
      .select((col("id") % 40).as("u"), col("id").as("v"))
      .repartition(col("u")).persist()
    o.count()
    val savedA = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedB = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = o.join(o.select(col("u"), col("v").as("w")), Seq("u"))
        .filter(col("v") < col("w"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val perJoin = "ENSURE_REQUIREMENTS".r.findAllIn(plan.toString).size
      assert(perJoin == 0,
        s"self-join over the cached partitioning must not re-shuffle, got $perJoin:\n$plan")
    } finally {
      o.unpersist()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedA)
      savedB match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("heavy_hitters: bounded sketch broadcast; probe agg reuses the distinct's partitioning") {
    // the CMS plan contract: the sketch (≤ depth·width rows) is broadcast
    // to the candidate probe — never sort-merge/shuffle-hash joined — and
    // the final min-aggregation reuses the hash partitioning the distinct
    // established, so the n-gram key space shuffles exactly once
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // AQE off: the static physical plan shows every exchange explicitly
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("heavy_hitters")(spark, sf)
        .queryExecution.executedPlan
      assert(plan.toString.contains("BroadcastHashJoin"),
        s"sketch probe must broadcast:\n$plan")
      // shuffles: sketch build (row,bucket) + candidate distinct (ngram) —
      // and nothing else (no exchange between the distinct and the min-agg)
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size <= 2, s"CMS plans ${shuffles.size} shuffles (expect ≤ 2):\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      graft.pipeline.InternalCaches.release()
    }
  }

  test("no contract query plans an unbounded cartesian product") {
    // a condition-less inner/cross join is the other whole-corpus-squared
    // scale killer. Whitelist: joins where one side is BOUNDED by
    // construction (an aggregate of constant cardinality) — these are
    // deliberate 1×N combine steps, not data-proportional crosses.
    import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    def boundedSide(p: LogicalPlan): Boolean = p.collectFirst {
      // grouping-key-free aggregate → exactly one row
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      // constant-cardinality Range leaf (e.g. a generated sign matrix) —
      // bounded by construction, independent of data size
      case r: org.apache.spark.sql.catalyst.plans.logical.Range
        if r.numElements <= BigInt(4096) => true
    }.nonEmpty
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      val bad = plan.collect {
        case j @ Join(l, r, Inner | Cross, None, _)
          if !boundedSide(l) && !boundedSide(r) => j
      }
      if (bad.nonEmpty) Some(s"$name (${bad.size} cartesian join(s))") else None
    }
    assert(offenders.isEmpty,
      s"queries with unbounded cartesian joins:\n  ${offenders.mkString("\n  ")}")
  }

  test("no contract query emits an ARRAY/MAP/STRUCT column") {
    // the driver's pandas comparer sorts result frames by every column;
    // complex-typed cells are unhashable there (posting_lists proved the
    // failure class: `TypeError: unhashable type: 'numpy.ndarray'`), so a
    // complex-typed contract output can never be certified. Contract
    // projections must scalarize (array_join / to_json) — the DSL-facing
    // operators keep their typed outputs, spec-covered separately.
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def complex(dt: DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | _: StructType => true
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val bad = fn(spark, sf).schema.fields.filter(f => complex(f.dataType))
      if (bad.nonEmpty)
        Some(s"$name (${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")})")
      else None
    }
    assert(offenders.isEmpty,
      s"queries with complex-typed output columns:\n  ${offenders.mkString("\n  ")}")
  }

  test("documents scans are column-pruned to what the query needs") {
    // a scan reading all 5 documents columns for a 2-column operator means
    // pruning never reached parquet — wrong at any scale, fatal at 100 TB
    def readSchemas(name: String): String = {
      val p = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      p.split("ReadSchema: ").toSeq.tail.map(_.takeWhile(_ != '\n')).mkString(";")
    }
    val mix = readSchemas("mixture_sample")
    assert(!mix.contains("text") && mix.contains("source"),
      s"mixture_sample must not scan text: $mix")
    val ngram = readSchemas("ngram_dupfrac")
    assert(!ngram.contains("lang") && !ngram.contains("source"),
      s"ngram_dupfrac reads more than doc_id+text: $ngram")
    val pii = readSchemas("pii_redact")
    assert(!pii.contains("lang") && !pii.contains("source"),
      s"pii_redact reads more than doc_id+text: $pii")
  }
}
