package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom filter for join pruning — the 100 TB scan-reduction
  * tool: build a bitset over the small (build) side's join keys, probe
  * the big side with pure expressions, and skip the full join for rows
  * that cannot match. Spark's own runtime row-level filtering does the
  * same with an engine-internal bloom; this one derives its bit
  * positions from md5 so a SQL oracle can replay membership decisions
  * (including false positives) bit-for-bit.
  *
  * Scale design: the build side aggregates to ≤ j·|build| DISTINCT bit
  * positions — collected to the driver bounded by m (the filter is
  * m bits BY CONSTRUCTION, dimension-sized by contract, same pattern as
  * Spark's bloom-pruning subquery result). The probe side never
  * shuffles and never joins: the bitset rides into the scan as a
  * literal array and the j membership tests are codegen'd md5 + bit
  * ops, so pruning happens AT the scan, before any exchange.
  */
object Bloom {

  /** 60-bit md5-derived hash of `key` mod `m` — the repo's portable
    * hash family (`conv(substring(md5(prefix||key),1,15),16,10) % m`),
    * shared by the bloom positions and the Count-Min sketch rows. */
  def hashMod(prefix: String, key: Column, m: Int): Column =
    pmod(conv(substring(md5(concat(lit(prefix), key.cast("string"))),
      1, 15), 16, 10).cast("long"), lit(m.toLong))

  /** Oracle-side twin of [[hashMod]]. */
  def hashModSql(prefix: String, key: String, m: Int): String =
    s"""CAST('0x' || substring(md5('$prefix' || CAST($key AS VARCHAR)),
          1, 15) AS BIGINT) % $m"""

  /** The j bit positions of a key in an m-bit filter. */
  def positions(key: Column, m: Int, j: Int): Seq[Column] =
    (0 until j).map(i => hashMod(s"bloom$i:", key, m))

  /** Build the filter: distinct bit positions over the build side,
    * packed into m/64 words on the driver. */
  def buildBits(build: DataFrame, key: Column, m: Int, j: Int): Array[Long] = {
    require(m % 64 == 0, s"m must pack into 64-bit words, got $m")
    val ps = build
      .select(explode(array(positions(key, m, j): _*)).as("pos"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](m / 64)
    ps.foreach(p => words((p / 64).toInt) |= 1L << (p % 64).toInt)
    words
  }

  /** Probe: true iff all j bits are set. `words` rides as a literal, so
    * this is join-free and fully codegen'd (md5, element_at, shifts). */
  def mightContain(key: Column, words: Array[Long], m: Int, j: Int): Column =
    positions(key, m, j).map { pos =>
      call_function("shiftright",
          element_at(lit(words), (pos / 64).cast("int") + 1),
          pmod(pos, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
