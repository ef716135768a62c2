package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection (64-bit).
  *
  * Per document: hash every token (with multiplicity) with xxhash64; the
  * simhash's bit j is the sign of Σ_tokens (±1 from the token hash's bit
  * j). Near-duplicates are pairs within Hamming distance `maxDist`.
  *
  * Scale design: signature = one hash-aggregate over exploded tokens (64
  * conditional sums, map-side partial agg). Pair generation uses the
  * pigeonhole block trick — split 64 bits into `maxDist+1` blocks; any
  * pair within distance `maxDist` shares at least one exact block — so
  * candidates come from equi-joins on (block idx, block value), never an
  * all-pairs scan, and are then filtered by exact Hamming distance
  * (`bit_count(a XOR b)`).
  */
object SimHash {

  /** (doc_id, simhash) signature table. */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = xxhash64(col("tok"))
    val bitSums = (0 until 64).map { j =>
      sum(shiftright(h, j).bitwiseAND(1) * 2 - 1).as(s"s_$j")
    }
    val sig = (0 until 64)
      .map(j => when(col(s"s_$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), sig.as("simhash"))
  }

  /** Pairs (a < b) with Hamming distance ≤ maxDist, via pigeonhole
    * blocks (maxDist+1 blocks over 64 bits). */
  def nearPairs(sigs: DataFrame, idCol: String, maxDist: Int = 3): DataFrame = {
    val nBlocks = maxDist + 1
    val width = 64 / nBlocks
    val blockCols: Seq[Column] = (0 until nBlocks).map { bi =>
      // block bi covers bits [bi*width, ...); the last block takes the remainder
      val w = if (bi == nBlocks - 1) 64 - width * (nBlocks - 1) else width
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftrightunsigned(col("simhash"), bi * width).bitwiseAND(lit(mask))
    }
    val blocks = sigs.select(
      col(idCol),
      col("simhash"),
      posexplode(array(blockCols: _*)).as(Seq("blk", "blkval"))
    )
    val a = blocks.select(col(idCol).as("a"), col("simhash").as("sha"), col("blk"), col("blkval"))
    val b = blocks.select(col(idCol).as("b"), col("simhash").as("shb"), col("blk"), col("blkval"))
    a.join(b, Seq("blk", "blkval"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), bit_count(col("sha").bitwiseXOR(col("shb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
