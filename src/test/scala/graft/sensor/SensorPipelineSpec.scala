package graft.sensor

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Golden test for the flagship sensor covariance pipeline
  * (`Sensor_Lara_Standalone_Example.kt` analog): synthetic semicolon lines
  * through ingest + full query, verified against an independent in-memory
  * Scala recomputation of the same semantics.
  */
class SensorPipelineSpec extends AnyFunSuite {
  import TestSpark._

  private val B = SensorPipeline.BIN_SIZE // 120000 ms
  private def ts(millis: Long): String = {
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    fmt.format(new java.util.Date(millis)) + ".%06d".format((millis % 1000) * 1000)
  }
  private val c1 = "TSYS01;temperature"
  private val c2 = "HTU21D;humidity"

  // (t, class;family, value) triples for tables A and B: 3 bins, 2 classes,
  // multiple readings per bin to exercise the (sum,cnt) averaging.
  private val aTriples = Seq(
    (10_000L, c1, 8.0), (20_000L, c1, 10.0),           // bin 0 avg 9.0
    (130_000L, c1, 14.0),                              // bin 120k avg 14
    (250_000L, c1, 6.0), (255_000L, c1, 8.0),          // bin 240k avg 7
    (10_000L, c2, 40.0),                               // bin 0
    (130_000L, c2, 44.0),                              // bin 120k
    (250_000L, c2, 42.0))                              // bin 240k
  private val bTriples = Seq(
    (15_000L, c1, 5.0),                                // bin 0
    (131_000L, c1, 6.0), (135_000L, c1, 8.0),          // bin 120k avg 7
    (251_000L, c1, 3.0),                               // bin 240k
    (12_000L, c2, 30.0),                               // bin 0
    (133_000L, c2, 35.0),                              // bin 120k
    (252_000L, c2, 31.0))                              // bin 240k

  private def lines(triples: Seq[(Long, String, Double)]): Seq[String] =
    triples.map { case (t, c, v) => s"${ts(t)};node1;$c;$v;NO_UNIT" } ++ Seq(
      "short;line",                                   // <5 fields → dropped
      s"${ts(0)};node1;Chemsense ID;mac_address;abc", // mac row → dropped
      s"${ts(0)};node1;Foo;bar;notanumber;u")         // bad value → dropped

  private def toDf(ls: Seq[String]) =
    df(new StructType().add("value", StringType), ls.map(Row(_)))

  /** Independent oracle: same semantics, plain Scala collections. */
  private def oracle(a: Seq[(Long, String, Double)], b: Seq[(Long, String, Double)]):
      (Map[(String, String), Option[Double]], Int) = {
    def bin(t: Long): Long = { val m = t % B; t - m + (if (m >= B / 2) B else 0) }
    def avg(ts: Seq[(Long, String, Double)]): Map[(Long, String), Double] =
      ts.groupBy { case (t, c, _) => (bin(t), c) }
        .view.mapValues(vs => vs.map(_._3).sum / vs.size).toMap
    val (aa, bb) = (avg(a), avg(b))
    val x = (aa.keySet intersect bb.keySet).map(k => k -> (aa(k) - bb(k))).toMap
    val n = x.keys.map(_._1).toSet.size
    val cs = x.keys.map(_._2).toSet
    val m = cs.map(c => c -> { val vs = x.collect { case ((_, `c`), v) => v }; vs.sum / vs.size }).toMap
    val u = x.map { case ((t, c), v) => (t, c) -> (v - m(c)) }
    val cov = (for (c <- cs; cp <- cs) yield {
      val terms = u.collect { case ((t, `c`), v1) if u.contains((t, cp)) => v1 * u((t, cp)) }
      (c, cp) -> (if (terms.nonEmpty && n > 1) Some(terms.sum / (n - 1)) else None)
    }).toMap
    (cov, n)
  }

  test("ingest drops malformed/mac/badvalue lines and parses triples") {
    val t = SensorPipeline.parse(toDf(lines(aTriples)))
    assert(t.df.count() == aTriples.size)
    val first = t.df.orderBy("t", "c").collect().head
    assert(first.getLong(0) == 10_000L && (first.getString(1) == c1 || first.getString(1) == c2))
  }

  test("covariance matches the in-memory oracle") {
    val a = SensorPipeline.parse(toDf(lines(aTriples)))
    val b = SensorPipeline.parse(toDf(lines(bTriples)))
    val result = SensorPipeline.covariance(a, b).df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    val (expected, n) = oracle(aTriples, bTriples)
    assert(n == 3)
    assert(result.keySet == expected.keySet) // full (c, c') matrix incl. both orders
    for ((k, e) <- expected) (result(k), e) match {
      case (Some(r), Some(x)) => assert(math.abs(r - x) < 1e-9, s"$k: $r vs $x")
      case (r, x) => assert(r == x, s"$k: $r vs $x")
    }
  }

  test("binned averages match hand computation") {
    val a = SensorPipeline.binAndAvg(SensorPipeline.parse(toDf(lines(aTriples))))
    val got = a.df.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got((0L, c1)) == 9.0 && got((120_000L, c1)) == 14.0 && got((240_000L, c1)) == 7.0)
    assert(got((0L, c2)) == 40.0)
  }
}
