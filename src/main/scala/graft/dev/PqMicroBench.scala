package graft.dev

import graft.functions.{PqAdc, PqBook, PqCodes}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** JVM-level microbenchmark of the PQ kernels, no Spark session: is the
  * 4.5 us/row ADC cost in compute() itself or in the plan? */
object PqMicroBench {
  def main(args: Array[String]): Unit = {
    val m = 32; val dsub = 2; val ksub = 256
    val rnd = new java.util.Random(42)
    val book = PqBook(m, dsub,
      Array.fill(m)(Array.fill(ksub)(Array.fill(dsub)(rnd.nextDouble()))))
    val q = new GenericArrayData(Array.fill(64)(rnd.nextDouble()))
    val codes = new GenericArrayData(Array.fill(m)(rnd.nextInt(ksub)))
    val adc = PqAdc(Literal(1), Literal(1), book)   // exprs unused by compute
    val pqc = PqCodes(Literal(1), book)

    var s = 0.0
    val n = 2000000
    // warm
    var i = 0
    while (i < 100000) { s += adc.compute(q, codes); i += 1 }
    var t0 = System.nanoTime()
    i = 0
    while (i < n) { s += adc.compute(q, codes); i += 1 }
    println(f"adc.compute: ${(System.nanoTime() - t0).toDouble / n}%.1f ns/call (sink $s%.1f)")

    i = 0
    while (i < 2000) { pqc.compute(q); i += 1 }
    t0 = System.nanoTime()
    i = 0
    val nc = 20000
    while (i < nc) { s += pqc.compute(q).getInt(0); i += 1 }
    println(f"codes.compute: ${(System.nanoTime() - t0).toDouble / nc}%.1f ns/call")
  }
}
