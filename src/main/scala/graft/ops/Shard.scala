package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic output sharding — the last stage of a training-data
  * build: split the kept corpus into N fixed shards whose membership
  * depends only on row content, never on partitioning or cluster
  * shape, so a re-run (or a second engine) produces byte-identical
  * shard membership and a training job can resume mid-corpus.
  *
  * Shard id is a portable md5 bucket of the key (same device as
  * [[Sampling]]); within a shard, rows are ordered by a SECOND
  * independent hash — the standard "global shuffle" for training
  * consumption, reproducible because it is a sort, not a sample.
  *
  * Scale contract: assignment is a per-row expression (no shuffle);
  * the write repartitions BY the shard column (one shuffle on a
  * fixed-cardinality key) so each task owns whole shards and the
  * output is exactly N directory partitions.
  */
object Shard {

  /** Content-keyed shard id in [0, n). */
  def shardId(key: Column, n: Int, salt: String): Column =
    Sampling.hashBucket(key, salt) % n

  /** Portable intra-shard ordering key (independent salt). */
  def orderKey(key: Column, salt: String): Column =
    md5(concat(lit(salt), key.cast("string")))

  def assign(df: DataFrame, keyCol: String, n: Int,
      salt: String = "shard:"): DataFrame =
    df.withColumn("shard", shardId(col(keyCol), n, salt))

  /** Write `df` as N shard directories (`shard=K/`), each internally
    * ordered by the reproducible shuffle key. The within-partition
    * sort leads with `shard` so the partitioned writer's required
    * ordering is already satisfied — otherwise it inserts its own
    * sort on the partition column alone and destroys the intra-shard
    * order. */
  def writeSharded(df: DataFrame, keyCol: String, n: Int, dir: String,
      salt: String = "shard:", orderSalt: String = "ord:"): Unit =
    assign(df, keyCol, n, salt)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), orderKey(col(keyCol), orderSalt))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)

  /** Deterministic epoch shuffle (X257 — the global training-order
    * permutation every run performs before epoch 0): each row gets a
    * seeded shuffle key md5("epoch:E:" || key), and its GLOBAL rank in
    * key order is its training position. The scale shape avoids both
    * the partition-less ROW_NUMBER window and any driver-side sort:
    * the first hex digit of the key is an order-preserving RANGE
    * bucket (`shard` 0–15 — shard asc + key asc ≡ global key order,
    * exactly a repartition-by-range with literal boundaries), so
    * positions come from a shard-PARTITIONED window plus per-shard
    * base offsets (an exclusive prefix sum over a 16-row aggregate —
    * bounded driver metadata, the PrefixSum device). Emits `skey`,
    * `shard`, `pos_in_shard` (1-based within the shard) and
    * `global_pos` (1-based global permutation index). At 100 TB this
    * is ONE shuffle on a 16-ary key + a 16-row collect; feeding the
    * result to [[writeSharded]]-style partitioned output gives the
    * epoch's shard files in training order. */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int): DataFrame = {
    val withK = df
      .withColumn("skey",
        md5(concat(lit(s"epoch:$epoch:"), col(keyCol).cast("string"))))
      .withColumn("shard",
        conv(substring(col("skey"), 1, 1), 16, 10).cast("int"))
    val counts = withK.groupBy("shard").agg(count(lit(1)).as("n"))
      .collect() // ≤ 16 rows: bounded driver metadata
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases: Map[Int, Long] = counts
      .scanLeft((0, 0L)) { case ((_, acc), (sh, n)) => (sh, acc + n) }
      .sliding(2).collect { case Array((_, acc), (sh, _)) => sh -> acc }
      .toMap
    val w = Window.partitionBy("shard").orderBy(col("skey"), col(keyCol))
    withK
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .withColumn("global_pos",
        col("pos_in_shard") +
          coalesce(element_at(typedLit(bases), col("shard")), lit(0L)))
  }
}
