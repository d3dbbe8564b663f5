package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Graph500/D4M-style loader + Lara matrix ops on a small known graph. */
class GraphLoaderSpec extends AnyFunSuite {
  import TestSpark._

  // edges: 0→1, 1→2, 0→2, 2→0 (plus a duplicate 0→1 to test ⊕ on load)
  private def fixture(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graph")
    java.nio.file.Files.write(dir.resolve("Ar.txt"), "0,1,0,2,0\n".getBytes)
    java.nio.file.Files.write(dir.resolve("Ac.txt"), "1,2,2,0,1\n".getBytes)
    (dir.resolve("Ar.txt").toString, dir.resolve("Ac.txt").toString)
  }

  test("index files load into an aggregated adjacency table") {
    val (r, c) = fixture()
    val adj = GraphLoader.loadIndexFiles(spark, r, c)
    assert(rowSet(adj.df) == Set(
      Seq[Any](0L, 1L, 2), // duplicate edge summed
      Seq[Any](1L, 2L, 1), Seq[Any](0L, 2L, 1), Seq[Any](2L, 0L, 1)))
  }

  test("out-degrees via Lara agg") {
    val (r, c) = fixture()
    val deg = GraphLoader.outDegrees(GraphLoader.loadIndexFiles(spark, r, c))
    assert(rowSet(deg.df) == Set(Seq[Any](0L, 3), Seq[Any](1L, 1), Seq[Any](2L, 1)))
  }

  test("two-hop path counts = A·A via Join∘Agg (TableMult analog)") {
    val (r, c) = fixture()
    val adj = GraphLoader.loadIndexFiles(spark, r, c)
    val hops = GraphLoader.twoHop(adj)
    // A[0,1]=2: paths 0→1→2 count 2; 0→2→0 = 1; 1→2→0 = 1; 2→0→{1×2, 2}
    assert(rowSet(hops.df) == Set(
      Seq[Any](0L, 2L, 2), Seq[Any](0L, 0L, 1), Seq[Any](1L, 0L, 1),
      Seq[Any](2L, 1L, 2), Seq[Any](2L, 2L, 1)))
  }
}
