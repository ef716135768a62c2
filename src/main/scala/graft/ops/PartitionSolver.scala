package graft.ops

/** Integer-partition solver (SURVEY §2.8 X1; reference partition.py:3-67).
  *
  * Given a row length and supermodule flavors (default [3,6,7]), pick the
  * flavor multiset that minimizes (residual uncovered slots, then number
  * of supermodules), preferring larger flavors on full ties — this is the
  * first-found config of the reference's recursive enumeration, which
  * iterates multiplicities of the largest flavor downward. Leftover slots
  * stay uncovered (e.g. 1,2 → []).
  *
  * Domain is tiny (row lengths ≤ ~30), so a direct enumeration is exact
  * and effectively free; exposed as a scalar UDF for DataFrame use.
  */
object PartitionSolver {

  /** Flavor list sorted descending (e.g. 22 → [7,6,6,3]). */
  def getPartition(length: Int, flavors: Seq[Int] = Seq(3, 6, 7)): Seq[Int] = {
    val desc = flavors.sorted(Ordering[Int].reverse)
    // best = (residual, count, multiplicities aligned with desc)
    var best: (Int, Int, List[Int]) = null

    def rec(i: Int, remaining: Int, counts: List[Int], total: Int): Unit = {
      if (i == desc.length) {
        if (best == null || remaining < best._1 || (remaining == best._1 && total < best._2))
          best = (remaining, total, counts.reverse)
      } else {
        val f = desc(i)
        var n = remaining / f
        while (n >= 0) {
          rec(i + 1, remaining - n * f, n :: counts, total + n)
          n -= 1
        }
      }
    }
    rec(0, math.max(length, 0), Nil, 0)

    desc.zip(best._3).flatMap { case (f, n) => Seq.fill(n)(f) }
  }

  /** Σ of the chosen flavors = number of covered slots. */
  def coveredSlots(length: Int, flavors: Seq[Int] = Seq(3, 6, 7)): Int =
    getPartition(length, flavors).sum
}
