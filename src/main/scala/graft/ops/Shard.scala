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

  /** Atomic manifest-committed variant of [[writeSharded]] (X293 —
    * the single-manifest-swap commit protocol at the core of the
    * lakehouse formats, reduced to one table; completes the story
    * next to q_time_travel / q_schema_evolution). Protocol:
    *
    *  1. shard files land under an opaque commit prefix
    *     `dir/data/<commitId>/shard=K/` — a crash here leaves
    *     unreferenced files, never a readable half-table;
    *  2. ONE manifest JSON naming every committed file (sorted paths,
    *     per-file shard + byte size) is written to a dot-temp name and
    *     fsynced (hsync — durable before the swap);
    *  3. the manifest is atomically renamed to `dir/manifest.json`
    *     (FileContext OVERWRITE rename — the one atomic primitive the
    *     protocol needs from the filesystem).
    *
    * Readers ([[readViaManifest]]) resolve file paths EXCLUSIVELY
    * through the manifest, so partial writes, abandoned commits and
    * in-flight temp manifests are invisible by construction
    * (ShardSpec simulates each). At 100 TB the manifest stays
    * O(n_shards) — file listing never rescans the data directory on
    * read, and old commits remain on disk for time-travel/GC exactly
    * as in the table formats. */
  def writeShardedAtomic(df: DataFrame, keyCol: String, n: Int,
      dir: String, commitId: String, salt: String = "shard:",
      orderSalt: String = "ord:"): Unit = {
    import org.apache.hadoop.fs.{FileContext, Options, Path}
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val dataPath = new Path(s"$dir/data/$commitId")
    val fs = dataPath.getFileSystem(conf)
    assign(df, keyCol, n, salt)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"),
        orderKey(col(keyCol), orderSalt))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(dataPath.toString)
    // enumerate the commit's files; sorted paths keep the manifest
    // bytes deterministic for a given file layout
    val files = fs.listStatus(dataPath)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard="))
      .flatMap { d =>
        val sh = d.getPath.getName.stripPrefix("shard=").toInt
        fs.listStatus(d.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(f => (s"data/$commitId/${d.getPath.getName}/" +
            f.getPath.getName, sh, f.getLen))
      }.sortBy(_._1)
    val manifest = files.map { case (p, sh, len) =>
      s"""{"path":"$p","shard":$sh,"bytes":$len}"""
    }.mkString(
      s"""{"commit":"$commitId","n_shards":$n,"files":[""", ",", "]}")
    val tmp = new Path(s"$dir/.manifest.json.$commitId.tmp")
    val out = fs.create(tmp, true)
    try {
      out.write(manifest.getBytes("UTF-8"))
      out.hsync() // durable BEFORE it becomes visible
    } finally out.close()
    val fc = FileContext.getFileContext(tmp.toUri, conf)
    fc.rename(tmp, new Path(s"$dir/manifest.json"),
      Options.Rename.OVERWRITE)
  }

  /** The current committed manifest of `dir` as (commitId, entries) —
    * entries are (relative path, shard). */
  def readManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, Seq[(String, Int)]) = {
    import org.apache.hadoop.fs.Path
    val mPath = new Path(s"$dir/manifest.json")
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(mPath).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(mPath)
    try in.readFully(0, buf) finally in.close()
    val txt = new String(buf, "UTF-8")
    val commit = """"commit":"([^"]+)"""".r
      .findFirstMatchIn(txt).map(_.group(1))
      .getOrElse(sys.error(s"malformed manifest at $mPath"))
    val entries = """\{"path":"([^"]+)","shard":(\d+)""".r
      .findAllMatchIn(txt)
      .map(m => (m.group(1), m.group(2).toInt)).toSeq
    (commit, entries)
  }

  /** Read ONLY the files the committed manifest names (never a
    * directory listing — the atomicity contract lives here). The
    * commit's data prefix is the parquet basePath, so the `shard=K`
    * partition column is recovered. */
  def readViaManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val (commit, entries) = readManifest(spark, dir)
    require(entries.nonEmpty, s"manifest at $dir names no files")
    spark.read.option("basePath", s"$dir/data/$commit")
      .parquet(entries.map { case (p, _) => s"$dir/$p" }: _*)
  }

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
