package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object HllProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      // replicate the HLL estimate per (window, type) batch-side with the same hash/registers
      import spark.implicits._
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").cast("long"), (unix_timestamp(col("ts"))).as("sec"), col("event_type"))
      val rows = ev.as[(Long, Long, String)].collect()
      val p = 12; val m = 1 << p
      val regs = scala.collection.mutable.Map[(Long, String), Array[Byte]]()
      val exact = scala.collection.mutable.Map[(Long, String), scala.collection.mutable.Set[Long]]()
      for ((u, sec, et) <- rows) {
        val w = sec / 300 * 300
        val r = regs.getOrElseUpdate((w, et), new Array[Byte](m))
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(u, 42L)
        val idx = (h >>> (64 - p)).toInt
        val rest = h << p
        val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
        if (rank > r(idx)) r(idx) = rank.toByte
        exact.getOrElseUpdate((w, et), scala.collection.mutable.Set[Long]()) += u
      }
      val alpha = 0.7213 / (1 + 1.079 / m)
      var worstAbs = 0.0; var worstRel = 0.0; var n = 0
      var worstInfo = ""
      for ((k, r) <- regs) {
        var sum = 0.0; var zeros = 0; var i = 0
        while (i < m) { sum += java.lang.Math.scalb(1.0, -r(i)); if (r(i) == 0) zeros += 1; i += 1 }
        val raw = alpha * m * m / sum
        val est = math.rint(if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw)
        val e = exact(k).size
        val abs0 = math.abs(est - e); val rel = abs0 / e.toDouble
        if (abs0 > worstAbs) worstAbs = abs0
        if (rel > worstRel) { worstRel = rel; worstInfo = s"$k est=$est exact=$e" }
        n += 1
      }
      println(s"$dir windows=$n worstAbs=$worstAbs worstRel=$worstRel ($worstInfo)")
    }
    spark.stop()
  }
}
