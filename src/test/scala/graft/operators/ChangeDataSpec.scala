package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Snapshot diff and CDC merge: hand-checked reconciliation semantics. */
class ChangeDataSpec extends AnyFunSuite {
  import TestSpark._

  private val st = new StructType().add("id", LongType).add("text", StringType)

  test("snapshotDiff: added/removed/changed; unchanged rows vanish") {
    val oldS = df(st, Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    val newS = df(st, Seq(Row(1L, "a"), Row(2L, "B!"), Row(4L, "d")))
    val got = ChangeData.snapshotDiff(oldS, newS, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"), s"got $got")
  }

  test("cdcMerge: latest seq wins, D deletes, I inserts, U upserts missing keys") {
    val base = df(st, Seq(Row(1L, "one"), Row(2L, "two"), Row(3L, "three")))
    val chSt = new StructType().add("id", LongType).add("op", StringType)
      .add("text", StringType).add("seq", LongType)
    val changes = df(chSt, Seq(
      Row(1L, "U", "one v1", 1L), Row(1L, "U", "one v2", 2L), // latest wins
      Row(2L, "U", "ghost", 1L), Row(2L, "D", null, 2L),      // delete after update
      Row(4L, "I", "four", 1L),                               // plain insert
      Row(5L, "U", "five", 1L)))                              // upsert on missing key
    val got = ChangeData.cdcMerge(base, changes, "id", "text", "seq", "op").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got == Map(
      1L -> (("one v2", "updated")),
      3L -> (("three", "kept")),
      4L -> (("four", "inserted")),
      5L -> (("five", "updated"))), s"got $got")
  }

  test("cdcMerge: randomized changelogs equal a brute-force replay") {
    val rnd = new scala.util.Random(7)
    val baseRows = (0L until 200L).map(i => Row(i, s"base$i"))
    // random changelog: ~300 ops over 250 keys with unique (key, seq)
    val ops = scala.util.Random.shuffle((0 until 300).toList).zipWithIndex.map {
      case (_, i) =>
        val key = rnd.nextInt(250).toLong
        val op = rnd.nextInt(3) match {
          case 0 => "U"; case 1 => "D"; case 2 => "I"
        }
        (key, op, if (op == "D") null else s"chg$i", i.toLong)
    }
    val chSt = new StructType().add("id", LongType).add("op", StringType)
      .add("text", StringType).add("seq", LongType)
    val got = ChangeData.cdcMerge(
      df(st, baseRows), df(chSt, ops.map(o => Row(o._1, o._2, o._3, o._4))),
      "id", "text", "seq", "op").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    // brute force: latest op per key wins over the base map
    val latest = ops.groupBy(_._1).view.mapValues(_.maxBy(_._4)).toMap
    val exp = ((0L until 250L).flatMap { k =>
      val inBase = k < 200
      latest.get(k) match {
        case Some((_, "D", _, _)) => None
        case Some((_, op, txt, _)) =>
          Some(k -> ((txt, if (op == "I") "inserted" else "updated")))
        case None if inBase => Some(k -> ((s"base$k", "kept")))
        case None => None
      }
    }).toMap
    assert(got == exp, {
      val diff = (got.keySet ++ exp.keySet).filter(k => got.get(k) != exp.get(k))
      s"diff=${diff.take(5).map(k => (k, got.get(k), exp.get(k)))}"
    })
  }
}
