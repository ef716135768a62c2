package graft.dev
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession
object ListProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // plant 2048 files across 64 dirs
    val base = graft.util.TempDirs.scratch("listprobe").toString
    for (d <- 0 until 64; f <- 0 until 32) {
      val dir = new java.io.File(s"$base/bp=$d"); dir.mkdirs()
      java.nio.file.Files.write(new java.io.File(dir, f"part-$f%04d.parquet").toPath, Array[Byte](1))
    }
    val p = new Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def located(): Int = { val it = fs.listFiles(p, true); var n = 0; while (it.hasNext) { it.next(); n += 1 }; n }
    def statused(): Int = {
      def rec(q: Path): Int = fs.listStatus(q).map(s => if (s.isDirectory) rec(s.getPath) else 1).sum
      rec(p)
    }
    for (i <- 1 to 3) {
      var t0 = System.nanoTime(); val a = located()
      println(f"listFiles(recursive):  ${(System.nanoTime()-t0)/1e6}%8.1f ms ($a files)")
      t0 = System.nanoTime(); val b = statused()
      println(f"listStatus recursion:  ${(System.nanoTime()-t0)/1e6}%8.1f ms ($b files)")
    }
    spark.stop()
  }
}
