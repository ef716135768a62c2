package graft.domain

/** Detector-layout constants (FIXTURES.md §3; reference bias_voltage.py:30-50,
  * occupancy.py:49-67, dee_geometry.py:46-52). One place, so pipelines and
  * tests agree bit-for-bit with the reference drivers.
  */
object EtlConfig {
  // TAMALES 16x32 sensor prototype (bias_voltage.py:30, ETL.py:77)
  val sensorHeight    = 42.5 // x-extent, mm
  val sensorWidth     = 22.0 // y-extent, mm
  val sensorDeadspace = 0.5

  // 1x2-sensor module (bias_voltage.py:31)
  val moduleHeight = 43.10
  val moduleWidth  = 56.50
  val sensorDistY  = 22.5
  val moduleGap    = 0.5

  // service boards (bias_voltage.py:35-36): ReadoutBoard(10, 56.5), PowerBoard(10, 29.5)
  val rbWidth = 56.5
  val pbWidth = 29.5

  // dee annulus (bias_voltage.py:40)
  val rInner = 315.0
  val rOuter = 1185.0

  // face z positions in m and MC generation (dee_geometry.py:46-52, 577-586)
  val zLayersM: Seq[Double] = Seq(2.99825, 3.0055, 3.02075, 3.0285)
  val zRefM  = 2.99825
  val zGenMm = 3000.0
  val etaMin = 1.659
  val etaMax = 3.000

  // physics constants (ETL.py:148, dee_geometry.py:504, 485-489, occupancy.py:254-255)
  val addCurrent   = 0.75  // mA surface current per sensor
  val currentCap   = 20.0  // mA per BV group
  val vendorSplitR = 520.0 // FBK inside, HPK outside
  val l1aRate      = 750000.0
  val nEtrocs      = 28600.0

  /** Static supermodule partition table for the D2/x>0 half
    * (occupancy.py:94-120, bias_voltage.py:75-102):
    * (module-row y, number of supermodules, module counts per supermodule).
    */
  val modPartitions: Seq[(Double, Int, Seq[Int])] = Seq(
    (1039.65, 1, Seq(7)),
    (953.95, 2, Seq(7, 6)),
    (868.25, 3, Seq(7, 6, 3)),
    (782.55, 3, Seq(6, 6, 6)),
    (696.85, 3, Seq(7, 7, 6)),
    (611.15, 4, Seq(7, 6, 6, 3)),
    (525.45, 4, Seq(7, 7, 6, 3)),
    (439.75, 4, Seq(7, 6, 6, 3)),
    (354.05, 3, Seq(7, 6, 3)),
    (268.35, 3, Seq(7, 6, 6)),
    (182.65, 3, Seq(6, 6, 6)),
    (96.95, 3, Seq(7, 7, 3)),
    (11.25, 3, Seq(6, 6, 3)),
    (-74.45, 3, Seq(6, 6, 3)),
    (-160.15, 3, Seq(6, 6, 6)),
    (-245.85000000000002, 3, Seq(7, 6, 6)),
    (-331.55, 3, Seq(7, 6, 6)),
    (-417.25, 4, Seq(3, 7, 7, 3)),
    (-502.95000000000005, 4, Seq(7, 7, 6, 3)),
    (-588.65, 4, Seq(7, 6, 6, 3)),
    (-674.35, 3, Seq(7, 7, 7)),
    (-760.05, 3, Seq(7, 6, 6)),
    (-845.75, 3, Seq(7, 7, 3)),
    (-931.45, 3, Seq(6, 6, 3)),
    (-1017.1500000000001, 2, Seq(7, 3)),
    (-1102.85, 1, Seq(3))
  )

  /** BV study sensor configurations (bias_voltage.py:117-128). */
  val bvConfigs: Seq[(String, String)] = Seq(
    "HPK_split4_2p5fC" -> "hpk_split4_2p5fc",
    "HPK_split4_5fC"   -> "hpk_split4_5fc",
    "HPK_split4_10fC"  -> "hpk_split4_10fc",
    "HPK_split4_15fC"  -> "hpk_split4_15fc",
    "FBK_w13_2p5fC"    -> "fbk_w13_2p5fc",
    "FBK_w13_5fC"      -> "fbk_w13_5fc",
    "FBK_w13_10fC"     -> "fbk_w13_10fc",
    "FBK_w13_15fC"     -> "fbk_w13_15fc"
  )
}
