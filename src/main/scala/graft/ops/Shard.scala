package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
