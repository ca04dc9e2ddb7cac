package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-handling for shuffle joins (SURVEY §4 / the 100 TB
  * design list). AQE's skew-join split handles most cases at runtime;
  * salting is the static fallback when one side has pathological hot
  * keys (a handful of keys owning a large share of rows) and the other
  * side is small enough to replicate per salt but too big to
  * broadcast.
  */
object Skew {

  /** Inner equi-join with the LEFT side's hot keys salted.
    *
    * Left rows get a deterministic salt in [0, salts) derived from a
    * unique column (no rand(): deterministic retries/replays); right
    * rows are replicated once per salt. Result equals the plain join
    * exactly — the salt only widens the shuffle key space so one hot
    * key spreads over `salts` reducers.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      leftUniqueCol: String, salts: Int): DataFrame = {
    require(salts > 1)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(s"`$leftUniqueCol`")), lit(salts.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
