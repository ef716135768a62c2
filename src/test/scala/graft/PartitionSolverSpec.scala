package graft

import graft.ops.PartitionSolver
import org.scalatest.funsuite.AnyFunSuite

/** X1 golden + property tests (fixtures/partition_golden.json holds the
  * reference `partition.py getPartition(n)` for n=1..60). */
class PartitionSolverSpec extends AnyFunSuite {

  private def golden: Map[Int, Seq[Int]] = {
    val txt = scala.io.Source.fromFile("fixtures/partition_golden.json").mkString
    // {"1": [], "3": [3], ...}
    val entry = """"(\d+)":\s*\[([0-9,\s]*)\]""".r
    entry.findAllMatchIn(txt).map { m =>
      val n = m.group(1).toInt
      val fl = m.group(2).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
      n -> fl
    }.toMap
  }

  test("matches reference partition.py for n=1..60") {
    val g = golden
    assert(g.nonEmpty)
    for ((n, expect) <- g) {
      assert(PartitionSolver.getPartition(n) == expect, s"n=$n")
    }
  }

  test("FIXTURES.md spot values") {
    assert(PartitionSolver.getPartition(1) == Seq())
    assert(PartitionSolver.getPartition(2) == Seq())
    assert(PartitionSolver.getPartition(9) == Seq(6, 3))
    assert(PartitionSolver.getPartition(12) == Seq(6, 6))
    assert(PartitionSolver.getPartition(22) == Seq(7, 6, 6, 3))
    assert(PartitionSolver.getPartition(25) == Seq(7, 6, 6, 6))
  }

  test("invariants: sum ≤ n, elements ∈ flavors, minimal residual") {
    for (n <- 0 to 200) {
      val p = PartitionSolver.getPartition(n)
      assert(p.sum <= n)
      assert(p.forall(Seq(3, 6, 7).contains))
      // residual is globally minimal, so leftover < 3 whenever n ≥ 3
      if (n >= 3) assert(n - p.sum < 3, s"n=$n p=$p")
    }
  }
}
