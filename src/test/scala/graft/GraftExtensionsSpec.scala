package graft

class GraftExtensionsSpec extends SparkSuite {

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT jaccard_sim(array('a','b','c'), array('b','c','d')) AS j,
             array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
             simhash64(shingle_hashes('hello world hello', 1, false)) AS sh,
             size(minhash_signature(shingle_hashes('a b c d e', 2), 16)) AS m
    """).collect().head
    assert(r.getDouble(0) === 0.5)
    assert(r.getDouble(1) === 11.0)
    assert(r.getLong(2) !== 0L)
    assert(r.getInt(3) === 16)
  }

  test("SQL results agree with the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("the quick brown fox", "jumps over the dog").toDF("text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT simhash64(shingle_hashes(text, 1, false)) AS s FROM ext_docs")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(
      graft.functions.HashFunctions.simhash64(
        graft.functions.ShingleFunctions.tokenHashes(col("text"))).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === viaCol)
  }
}
