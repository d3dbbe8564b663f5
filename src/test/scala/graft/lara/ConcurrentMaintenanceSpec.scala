package graft.lara

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import scala.util.control.NonFatal

/** Store-maintenance concurrency (r10 review "next round" #7): a live
  * `appendStoreBatch` writer, a `compactStore` maintenance loop, and a
  * reader loop race on ONE store. Asserts the contract documented on
  * `compactStore`:
  *  - no committed batch is ever lost (batches landing between the
  *    compaction's input listing and the swap are reconciled, not deleted);
  *  - a reader never observes duplicated rows (no mixed old+new layout) —
  *    transient read failures (missing root between the two swap renames)
  *    are the documented retry case;
  *  - the store stays batch-layout and appendable throughout.
  */
class ConcurrentMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private val st = new StructType().add("k", LongType).add("v", IntegerType)
  private val schema = LaraSchema(Seq("k"), Seq(ValSpec("v", IntegerType, 0)))

  private def batchRows(b: Long): Seq[Row] =
    (0 until 20).map(i => Row(b * 1000L + i, b.toInt))

  test("compactStore vs concurrent batch writer + reader: no loss, no duplicates, layout intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race").toString + "/store"
    val nBatches = 12
    // seed batches 0..2 so the first compaction has something to fold
    for (b <- 0L until 3L)
      LaraTable(df(st, batchRows(b)), schema).appendStoreBatch(dir, b)

    @volatile var writerDone = false
    @volatile var compactorDone = false
    val writerErr = new AtomicReference[Throwable]()
    val compactErr = new AtomicReference[Throwable]()
    val readerViolation = new AtomicReference[String]()
    val universe = (0L until nBatches).flatMap(b => batchRows(b).map(_.toSeq)).toSet

    val writer = new Thread(() => {
      try {
        for (b <- 3L until nBatches) {
          // at-least-once contract: a write whose output dir is swapped
          // mid-commit may fail — retry; the idempotent batch=<id>
          // overwrite makes the retry safe
          var attempts = 0
          var ok = false
          while (!ok) {
            attempts += 1
            try { LaraTable(df(st, batchRows(b)), schema).appendStoreBatch(dir, b); ok = true }
            catch {
              case NonFatal(e) =>
                if (attempts >= 8) throw e
                Thread.sleep(50)
            }
          }
          Thread.sleep(30)
        }
      } catch { case t: Throwable => writerErr.set(t) } finally writerDone = true
    }, "race-writer")

    val compactor = new Thread(() => {
      try {
        var rounds = 0
        while ((!writerDone || rounds == 0) && rounds < 8) {
          LaraTable.compactStore(spark, dir, Seq("k"), schema.vals)
          rounds += 1
        }
      } catch { case t: Throwable => compactErr.set(t) } finally compactorDone = true
    }, "race-compactor")

    val reader = new Thread(() => {
      var reads = 0
      while (!(writerDone && compactorDone) && readerViolation.get() == null) {
        try {
          val rows = LaraTable.load(spark, dir, Seq("k"), schema.vals).df
            .collect().map(_.toSeq)
          reads += 1
          val ks = rows.map(_.head)
          if (ks.distinct.length != ks.length)
            readerViolation.set(s"duplicate rows visible (mixed layout): ${rows.length} rows")
          else if (!rows.forall(r => universe.contains(r)))
            readerViolation.set(s"rows outside the written universe: ${rows.toSeq.filterNot(universe.contains).take(3)}")
        } catch { case NonFatal(_) => () } // transient missing root mid-swap — documented retry case
      }
    }, "race-reader")

    writer.start(); compactor.start(); reader.start()
    writer.join(300000); compactor.join(300000); reader.join(300000)
    assert(writerErr.get() == null, s"writer failed terminally: ${writerErr.get()}")
    assert(compactErr.get() == null, s"compactor failed: ${compactErr.get()}")
    assert(readerViolation.get() == null, s"reader violation: ${readerViolation.get()}")

    // quiescent final compaction, then the loss check: every batch's rows
    // exactly once — a batch committed during any compaction window must
    // have been reconciled, never deleted with the old tree
    LaraTable.compactStore(spark, dir, Seq("k"), schema.vals)
    val finalRows = LaraTable.load(spark, dir, Seq("k"), schema.vals).df
      .collect().map(_.toSeq)
    assert(finalRows.length == universe.size,
      s"expected ${universe.size} rows, got ${finalRows.length} (lost or duplicated batches)")
    assert(finalRows.toSet == universe)

    // layout stayed pure batch: root has only batch=<id> dirs, and the
    // store is still appendable (the fail-fast would reject a mixed root)
    val root = new java.io.File(dir)
    assert(root.listFiles().filter(_.isFile).forall(!_.getName.endsWith(".parquet")),
      "flat parquet leaked into a batch-layout root")
    LaraTable(df(st, Seq(Row(99999L, 1))), schema).appendStoreBatch(dir, 1000L)
    assert(LaraTable.load(spark, dir, Seq("k"), schema.vals).df.count() == universe.size + 1)
  }
}
