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

  test("band-bucket and portable-shingle expressions callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT size(minhash_band_buckets(shingle_hashes('a b c d e f', 2),
               8, 4)) AS nb,
             md5_shingle_keys('one two three', 2) AS keys
    """).collect().head
    assert(r.getInt(0) === 8)
    // same keys as the SQL-built formulation they mirror
    val expected = spark.sql("""
      SELECT CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
      FROM (SELECT explode(array('one two', 'two three')) AS s)
    """).collect().map(_.getLong(0)).toSet
    assert(r.getSeq[Long](1).toSet === expected)
  }

  test("round-6 kernels callable from SQL: nfc, bag buckets, cms") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT unicode_normalize('café', 'NFC') AS n,
             hashed_bag_buckets('a b c', 64) AS hb,
             size(hashed_bag_buckets('a b c', 64)) AS nhb
    """).collect().head
    assert(r.getString(0) === "caf\u00e9")
    assert(r.getInt(2) === 5) // 3 unigrams + 2 bigrams
    // buckets agree with the Column API
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val viaCol = Seq("a b c").toDF("t")
      .select(graft.functions.ScoringFunctions
        .hashedBagBuckets(col("t"), 64, "qc:").as("b"))
      .collect().head.getSeq[Int](0)
    assert(r.getSeq[Int](1) === viaCol)
    // cms_sketch aggregate takes the per-row CELL INDICES (one per
    // sketch row, as the query surface derives them)
    val c = spark.sql("""
      SELECT cms_sketch(cells, 2, 32) AS sk
      FROM (SELECT array(
              CAST(conv(substring(md5('cms0:' || v), 1, 8), 16, 10)
                   AS BIGINT) % 32,
              CAST(conv(substring(md5('cms1:' || v), 1, 8), 16, 10)
                   AS BIGINT) % 32) AS cells
            FROM (SELECT explode(array('x','x','y')) AS v))
    """).collect().head
    assert(!c.isNullAt(0))
    // total mass per sketch row = 3 observations
    assert(c.getSeq[Long](0).sum === 6L)
  }

  test("bpe_encode callable from SQL, agrees with Column API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT bpe_encode('banana', 'a n,b an,an an') AS t").collect().head
    // (a,n) -> b|an|an|a ; (b,an) -> ban|an|a ; (an,an) no longer
    // adjacent as a pair of 'an' symbols
    assert(r.getSeq[String](0) === Seq("ban", "an", "a"))
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val viaCol = Seq("banana").toDF("w")
      .select(graft.functions.BpeFunctions.bpeEncode(col("w"),
        Seq(("a", "n"), ("b", "an"), ("an", "an"))).as("t"))
      .collect().head.getSeq[String](0)
    assert(r.getSeq[String](0) === viaCol)
  }

  test("round-7 kernels callable from SQL: span_dedup_stats, strip_html") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT span_dedup_stats('a b c d a b c e', 3) AS sd,
             strip_html('<p>hello <b>world</b></p><script>x</script>') AS h
    """).collect().head
    val sd = r.getStruct(0)
    assert(sd.getLong(0) === 8L)                      // n_tokens
    assert(sd.getLong(1) === 1L)                      // n_dup_windows
    assert(sd.getLong(2) === 3L)                      // n_removed
    assert(sd.getString(3) === "a b c d e")           // cleaned_text
    assert(r.getString(1) === "hello world")
    // agrees with the Column API
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val viaCol = Seq("<p>hello <b>world</b></p><script>x</script>")
      .toDF("t")
      .select(graft.functions.HtmlFunctions.stripHtml(col("t")))
      .as[String].collect().head
    assert(r.getString(1) === viaCol)
  }

  test("hyperplane_buckets callable from SQL, agrees with Column API") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, Sf0001).limit(20)
    e.createOrReplaceTempView("ext_embeddings")
    val viaSql = spark.sql(
      """SELECT vec_id, hyperplane_buckets(embedding, 6, 12) AS b
         FROM ext_embeddings""")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCol = e.select(col("vec_id"),
        graft.functions.HashFunctions.hyperplaneBuckets(col("embedding"),
          6, 12).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql === viaCol && viaSql.nonEmpty)
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
