package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted per-query timing for plan iteration (dev tool — the
  * driver-facing figure stays Bench, which runs the whole surface).
  * Same measurement discipline as Bench: noop sink (full column
  * evaluation), best-of-2, q1_agg warmup.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.TimeQuery q_a q_b"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
    // dev-only A/B hook: SPARK_GRAFT_CONF="k=v;k2=v2" extra confs
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) builder.config(kv.take(i).trim, kv.drop(i + 1).trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    graft.SparkEntry.queries.get("q1_agg").foreach(_ => run("q1_agg"))
    args.foreach { name =>
      def timed(): Double = {
        val t0 = System.nanoTime()
        run(name)
        (System.nanoTime() - t0) / 1e9
      }
      val (a, b) = (timed(), timed())
      println(f"[time] $name%-32s best ${math.min(a, b)}%6.2f s  (runs: $a%.2f, $b%.2f)")
    }
    spark.stop()
  }
}
