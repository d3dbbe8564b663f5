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
}
