package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout line's tail-window budget against the LARGEST
  * plausible cell set (the r12 regression: drv_cal + the v9 cells
  * pushed the 2-step extended block past 1860 chars and the
  * all-or-nothing fallback dropped every extended cell from the
  * driver's independent perf record — BENCH_r12.json has no `extended`
  * key). The tiered trim must always yield a NON-EMPTY extended block
  * at any realistic core size. Pure string logic — no Spark session. */
class BenchLineSpec extends AnyFunSuite {

  // every extended cell name the bench can emit, at the widest
  // plausible 2-decimal value (5 digits: a 17-minute cell)
  private def worstSteps: Seq[(String, Seq[(String, Double)])] = {
    val cells = Bench.extendedFamily.zipWithIndex.map { case (n, i) => (n, 90000.0 + i) }
    Seq("sf0.1" -> cells, "sf1_synth" -> cells)
  }

  // the r12 driver line measured 500 chars without the extended block;
  // drv_cal_ext adds ~60, the r14 "tiled_min" flagship key ~19, the
  // r15 "ext_heavy_first" block (5 heaviest cells, ~30 chars each)
  // ~190, and headline values could widen by ~50 — 900 stays a
  // conservative ceiling for the core
  private def mkLine(coreLen: Int): String => String =
    ext => "{" + "x" * coreLen + ext + "}"

  test("largest plausible cell set: the picked line fits the budget and is never extended-empty") {
    val tiers = Bench.extendedTiers(worstSteps)
    assert(tiers.nonEmpty)
    // tiers are richest-first and strictly shrinking in the tail
    assert(tiers.sliding(2).forall { case Seq(a, b) => a.length >= b.length; case _ => true })
    val line = Bench.pickStdoutLine(mkLine(900), tiers)
    assert(line.length <= 1860, s"picked line overflows the tail window: ${line.length}")
    assert(line.contains("\"extended\":{"), "tiered trim still dropped the whole extended block")
    assert(Bench.extendedFamily.exists(n => line.contains("\"" + n + "\":")),
      "extended block carries no recognizable cell")
  }

  test("the full 2-step block is chosen when it fits; one step when it does not") {
    val small = Seq("sf0.1" -> Seq("a" -> 1.0, "b" -> 2.0), "sf1_synth" -> Seq("a" -> 3.0))
    val line = Bench.pickStdoutLine(mkLine(900), Bench.extendedTiers(small))
    assert(line.contains("sf1_synth"), "a fitting 2-step block was trimmed")
    // the worst-case block cannot fit both steps in the remaining ~950
    // chars (30 cells x ~30 chars x 2 steps) — the tier that wins must
    // still carry the PRIMARY step
    val big = Bench.pickStdoutLine(mkLine(900), Bench.extendedTiers(worstSteps))
    assert(big.contains("\"sf0.1\":{"), "the primary step vanished from the trimmed block")
    assert(!big.contains("sf1_synth") || big.length <= 1860)
  }

  test("top-N tiers keep the HEAVIEST cells; an absurd core falls back to no block, never overflow") {
    val steps = Seq("sf0.1" -> (1 to 40).map(i => (f"cell_$i%02d", i.toDouble)))
    // force the top-N tier with a core that leaves ~400 chars
    val line = Bench.pickStdoutLine(mkLine(1460), Bench.extendedTiers(steps))
    assert(line.length <= 1860)
    assert(line.contains("\"cell_40\":40.00"), "top-N tier dropped the heaviest cell")
    assert(!line.contains("\"cell_01\":"), "top-N tier kept a light cell over a heavy one")
    // pathological core: longer than the whole budget — only then may
    // the extended block drop entirely, and the line never overflows
    // past core+empty
    val none = Bench.pickStdoutLine(mkLine(1900), Bench.extendedTiers(steps))
    assert(!none.contains("extended"))
  }

  test("empty or cell-less steps yield no tiers (and the line is just the core)") {
    assert(Bench.extendedTiers(Seq.empty).isEmpty)
    assert(Bench.extendedTiers(Seq("sf0.1" -> Seq.empty)).isEmpty)
    val line = Bench.pickStdoutLine(mkLine(900), Bench.extendedTiers(Seq.empty))
    assert(!line.contains("extended"))
  }
}
