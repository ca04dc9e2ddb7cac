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
    // Commit ids are SINGLE-USE (ADVICE r15): re-writing an existing
    // commit prefix under mode-overwrite would delete files the
    // currently-committed manifest may still reference — a reader in
    // that window would see exactly the torn half-table the protocol
    // promises is impossible. Callers that re-run (bench best-of-2,
    // selfcheck) take a fresh [[newCommitId]] per invocation and GC.
    require(!fs.exists(dataPath),
      s"commit '$commitId' already exists under $dir — commit ids are " +
        "single-use; pass Shard.newCommitId() per invocation")
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

  private val commitCounter = new java.util.concurrent.atomic.AtomicLong()

  /** A process-unique, monotonic commit id — JVM pid + nanotime +
    * counter, so concurrent sessions sharing an output dir and
    * repeated invocations in one session (bench best-of-2) never
    * collide with an existing commit prefix. */
  def newCommitId(): String =
    s"c${ProcessHandle.current().pid()}-${System.nanoTime().toHexString}" +
      s"-${commitCounter.incrementAndGet()}"

  /** Delete commit prefixes under `dir/data/` that the CURRENT
    * committed manifest does not reference (abandoned or superseded
    * commits). Safe by the protocol's own invariant: readers resolve
    * exclusively through the manifest, and the manifest swap is
    * atomic, so any unreferenced prefix is invisible already. Keeping
    * old commits is the time-travel default; GC is the bounded-disk
    * opt-in a repeated writer (bench reruns) calls after its swap.
    *
    * Liveness is FILE-derived, not commit-field-derived: an
    * append-style manifest ([[appendTablesAtomic]]) references files
    * under SEVERAL commit prefixes (base + each delta segment), and
    * every one of them must survive GC — only prefixes no manifest
    * path points into are deleted. */
  def gcOldCommits(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dataDir = new Path(s"$dir/data")
    val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dataDir)) {
      val live = livePrefixes(spark, dir)
      fs.listStatus(dataDir)
        .filter(st => st.isDirectory && !live.contains(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true))
    }
  }

  /** Every `data/<prefix>/` the current committed manifest's file
    * paths point into — the GC keep-set (≥ 1 for a plain commit,
    * one per segment for an append chain). */
  def livePrefixes(spark: org.apache.spark.sql.SparkSession,
      dir: String): Set[String] =
    """"path":"data/([^/"]+)/""".r
      .findAllMatchIn(readManifestText(spark, dir))
      .map(_.group(1)).toSet

  private def readManifestText(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    import org.apache.hadoop.fs.Path
    val mPath = new Path(s"$dir/manifest.json")
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(mPath).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(mPath)
    try in.readFully(0, buf) finally in.close()
    new String(buf, "UTF-8")
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

  /** Multi-table atomic commit (X299 — the two-table TRANSACTION a
    * curation pipeline needs when a corpus and its audit sidecar must
    * agree: documents + dedup verdicts, codes + codebooks, committed
    * by ONE manifest swap so readers see either BOTH new tables or
    * BOTH old ones, never a new corpus with stale verdicts). Extends
    * [[writeShardedAtomic]]'s protocol from one table to a table SET:
    *
    *  1. every table's files land under
    *     `dir/data/<commitId>/<table>/…` — each table keeps whatever
    *     layout its writer produced (partitioned, sharded, single
    *     file): the manifest is file-granular, so any layout commits
    *     atomically;
    *  2. ONE manifest naming every (table, path, bytes) triple is
    *     fsynced to a dot-temp name;
    *  3. the manifest atomically renames over `dir/manifest.json`.
    *
    * A crash after table 1's files but before table 2's (or before
    * the swap) leaves only unreferenced files — [[readTableViaManifest]]
    * still resolves the PREVIOUS commit's consistent pair. Commit ids
    * are single-use exactly as in [[writeShardedAtomic]]. At 100 TB
    * the manifest stays O(total files) metadata and readers never
    * list the data directory. */
  def writeTablesAtomic(tables: Seq[(String, DataFrame)], dir: String,
      commitId: String, partitionBy: Map[String, String] = Map.empty)
      : Unit = {
    import org.apache.hadoop.fs.{FileContext, Options, Path}
    require(tables.nonEmpty, "writeTablesAtomic: no tables")
    require(tables.map(_._1).distinct.size == tables.size,
      "writeTablesAtomic: duplicate table names")
    val spark = tables.head._2.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val dataPath = new Path(s"$dir/data/$commitId")
    val fs = dataPath.getFileSystem(conf)
    require(!fs.exists(dataPath),
      s"commit '$commitId' already exists under $dir — commit ids are " +
        "single-use; pass Shard.newCommitId() per invocation")
    tables.foreach { case (name, df) =>
      // optional layout: `<table>/<col>=<v>/…` Hive-style partition
      // dirs, the granularity [[replaceTablePartitionsAtomic]] swaps
      // at. The manifest stays file-granular either way; readers
      // resolve leaf files whose parent dir is their base path, so
      // the partition column is NOT re-inferred on read (it is
      // derivable from the data by the writer's contract).
      partitionBy.get(name) match {
        case Some(c) => df.write.partitionBy(c).parquet(s"$dataPath/$name")
        case None => df.write.parquet(s"$dataPath/$name")
      }
    }
    // enumerate committed files per table; sorted (table, path) keeps
    // the manifest bytes deterministic for a given file layout
    val files = tables.flatMap { case (name, _) =>
      val tPath = new Path(s"$dataPath/$name")
      val it = fs.listFiles(tPath, true)
      val buf = Seq.newBuilder[(String, String, Long)]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
          val rel = st.getPath.toString
            .stripPrefix(fs.makeQualified(new Path(dir)).toString)
            .stripPrefix("/")
          buf += ((name, rel, st.getLen))
        }
      }
      buf.result()
    }.sortBy(e => (e._1, e._2))
    swapTablesManifest(spark, dir, commitId, tables.map(_._1), files)
  }

  /** Build + fsync + atomically swap a multi-table manifest naming
    * `files` = (table, relative path, bytes) — the shared tail of
    * [[writeTablesAtomic]] and [[appendTablesAtomic]]. */
  private def swapTablesManifest(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      commitId: String, tableNames: Seq[String],
      files: Seq[(String, String, Long)]): Unit = {
    import org.apache.hadoop.fs.{FileContext, Options, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val manifest = files.map { case (t, p, len) =>
      s"""{"table":"$t","path":"$p","bytes":$len}"""
    }.mkString(
      s"""{"commit":"$commitId","tables":[${tableNames.map(t =>
        "\"" + t + "\"").mkString(",")}],"files":[""", ",", "]}")
    val tmp = new Path(s"$dir/.manifest.json.$commitId.tmp")
    val fs = tmp.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try {
      out.write(manifest.getBytes("UTF-8"))
      out.hsync() // durable BEFORE it becomes visible
    } finally out.close()
    val fc = FileContext.getFileContext(tmp.toUri, conf)
    fc.rename(tmp, new Path(s"$dir/manifest.json"),
      Options.Rename.OVERWRITE)
  }

  /** APPEND-commit (X317 — the segment discipline the table formats
    * use for ingest): write ONLY `newTables`' rows as fresh files
    * under `dir/data/<commitId>/`, then swap ONE manifest naming the
    * new files PLUS every file of the current commit. Readers flip
    * atomically from the old table set to old ∪ appended; the
    * existing data — however large — is never rewritten, which is
    * the property that makes a 100 TB delta-ingest O(delta), not
    * O(corpus). Repeated appends accumulate segment prefixes (all
    * kept live by [[gcOldCommits]]'s file-derived keep-set) until a
    * compaction rewrites the table under a single prefix. */
  def appendTablesAtomic(newTables: Seq[(String, DataFrame)],
      dir: String, commitId: String,
      rewriteTables: Seq[(String, DataFrame)] = Seq.empty): Unit = {
    // `rewriteTables` (X326 — the dedup index's mixed commit): small
    // state tables REWRITTEN in the same swap — their fresh files
    // replace every file the current manifest names for them, while
    // `newTables`' files APPEND next to their carried segments. One
    // manifest publishes both, so readers can never pair an appended
    // segment with a stale state table (clusters must agree with the
    // band segments that produced them).
    import org.apache.hadoop.fs.Path
    require(newTables.nonEmpty, "appendTablesAtomic: no tables")
    require(newTables.map(_._1).intersect(rewriteTables.map(_._1)).isEmpty,
      "appendTablesAtomic: a table cannot both append and rewrite")
    val spark = newTables.head._2.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val dataPath = new Path(s"$dir/data/$commitId")
    val fs = dataPath.getFileSystem(conf)
    require(!fs.exists(dataPath),
      s"commit '$commitId' already exists under $dir — commit ids are " +
        "single-use; pass Shard.newCommitId() per invocation")
    // carried files: everything the CURRENT manifest names (with
    // bytes — the manifest is the only listing the protocol trusts)
    val carried =
      """\{"table":"([^"]+)","path":"([^"]+)","bytes":(\d+)\}""".r
        .findAllMatchIn(readManifestText(spark, dir))
        .map(m => (m.group(1), m.group(2), m.group(3).toLong)).toSeq
        .filterNot { case (t, _, _) => rewriteTables.exists(_._1 == t) }
    require(carried.nonEmpty, s"append against $dir: no committed base")
    (newTables ++ rewriteTables).foreach { case (name, df) =>
      df.write.parquet(s"$dataPath/$name")
    }
    val fresh = (newTables ++ rewriteTables).flatMap { case (name, _) =>
      val it = fs.listFiles(new Path(s"$dataPath/$name"), true)
      val buf = Seq.newBuilder[(String, String, Long)]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
          val rel = st.getPath.toString
            .stripPrefix(fs.makeQualified(new Path(dir)).toString)
            .stripPrefix("/")
          buf += ((name, rel, st.getLen))
        }
      }
      buf.result()
    }
    val names = (carried.map(_._1) ++ newTables.map(_._1) ++
      rewriteTables.map(_._1)).distinct
    swapTablesManifest(spark, dir, commitId, names,
      (carried ++ fresh).sortBy(e => (e._1, e._2)))
  }

  /** PARTITION-REPLACE commit (X324 — the delta-publish discipline a
    * partitioned corpus-sized table needs when an update touches a
    * BOUNDED set of its partitions: write fresh files ONLY for the
    * replaced partitions under `dir/data/<commitId>/<table>/<part>/`,
    * carry every untouched partition's files from the current
    * manifest BY REFERENCE, fully rewrite the (small) `rewriteTables`,
    * and swap ONE manifest. Readers flip atomically from the old
    * table to (untouched-old ∪ replaced-new); untouched data —
    * however large — is never rewritten, which is what makes a
    * 100 TB index delta O(touched), not O(corpus), in publish I/O
    * (the X317 append twin, for in-place list repair instead of
    * pure append). The table must have been committed with
    * `partitionBy` so its manifest paths carry `<col>=<v>/`
    * components; `replacedParts` are those dir names (e.g. "pt=3").
    *
    * Contract: `newRows` must contain exactly the rows of the
    * replaced partitions (it is written `partitionBy(partCol)`, and
    * a row outside `replacedParts` would silently commit a partition
    * dir the carry-filter also kept — so the writer enumerates the
    * written dirs and REFUSES a commit whose fresh partition set is
    * not exactly `replacedParts`). Old commits stay on disk for
    * time-travel; [[gcOldCommits]]' file-derived keep-set keeps every
    * carried prefix live. */
  def replaceTablePartitionsAtomic(dir: String, commitId: String,
      table: String, newRows: DataFrame, partCol: String,
      replacedParts: Set[String],
      rewriteTables: Seq[(String, DataFrame)]): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = newRows.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val dataPath = new Path(s"$dir/data/$commitId")
    val fs = dataPath.getFileSystem(conf)
    require(!fs.exists(dataPath),
      s"commit '$commitId' already exists under $dir — commit ids are " +
        "single-use; pass Shard.newCommitId() per invocation")
    val carried =
      """\{"table":"([^"]+)","path":"([^"]+)","bytes":(\d+)\}""".r
        .findAllMatchIn(readManifestText(spark, dir))
        .map(m => (m.group(1), m.group(2), m.group(3).toLong)).toSeq
    require(carried.nonEmpty, s"replace against $dir: no committed base")
    def partOf(rel: String): Option[String] =
      s"/($partCol=[^/]+)/".r.findFirstMatchIn(rel).map(_.group(1))
    val keptOld = carried.filter {
      case (t, p, _) if t == table =>
        val pt = partOf(p)
        require(pt.nonEmpty,
          s"replace: committed $table file '$p' has no $partCol= dir — " +
            "the table was not committed partitionBy'd")
        !replacedParts.contains(pt.get)
      case (t, _, _) => !rewriteTables.exists(_._1 == t)
    }
    newRows.write.partitionBy(partCol).parquet(s"$dataPath/$table")
    rewriteTables.foreach { case (name, df) =>
      df.write.parquet(s"$dataPath/$name")
    }
    val fresh = (Seq(table) ++ rewriteTables.map(_._1)).flatMap { name =>
      val it = fs.listFiles(new Path(s"$dataPath/$name"), true)
      val buf = Seq.newBuilder[(String, String, Long)]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
          val rel = st.getPath.toString
            .stripPrefix(fs.makeQualified(new Path(dir)).toString)
            .stripPrefix("/")
          buf += ((name, rel, st.getLen))
        }
      }
      buf.result()
    }
    val freshParts = fresh.collect {
      case (t, p, _) if t == table => partOf(p) }.flatten.toSet
    require(freshParts == replacedParts,
      s"replace: written partitions $freshParts != declared " +
        s"$replacedParts — newRows must hold exactly the replaced " +
        "partitions' rows")
    val names = (keptOld.map(_._1) ++ Seq(table) ++
      rewriteTables.map(_._1)).distinct
    swapTablesManifest(spark, dir, commitId, names,
      (keptOld ++ fresh).sortBy(e => (e._1, e._2)))
  }

  /** The current committed multi-table manifest of `dir` as
    * (commitId, entries) — entries are (table, relative path). */
  def readTablesManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, Seq[(String, String)]) = {
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
    val entries = """\{"table":"([^"]+)","path":"([^"]+)"""".r
      .findAllMatchIn(txt)
      .map(m => (m.group(1), m.group(2))).toSeq
    (commit, entries)
  }

  /** Read ONE table of the committed transaction — exclusively the
    * files the manifest names for it (the atomicity contract: a table
    * whose sibling's write crashed is invisible because the manifest
    * swap never happened). */
  def readTableViaManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String, table: String): DataFrame = {
    val (_, entries) = readTablesManifest(spark, dir)
    val paths = entries.collect { case (t, p) if t == table => s"$dir/$p" }
    require(paths.nonEmpty,
      s"manifest at $dir names no files for table '$table'")
    spark.read.parquet(paths: _*)
  }

  /** True iff `dir` carries a committed manifest naming every table in
    * `tables` — the build-once guard a serve-path calls before
    * deciding whether to (re)build. */
  def hasCommittedTables(spark: org.apache.spark.sql.SparkSession,
      dir: String, tables: Seq[String]): Boolean = {
    import org.apache.hadoop.fs.Path
    val mPath = new Path(s"$dir/manifest.json")
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(mPath) && {
      val (_, entries) = readTablesManifest(spark, dir)
      val present = entries.map(_._1).toSet
      tables.forall(present.contains)
    }
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
