package graft.queries

import graft.{QueryDef, Tables}
import graft.engine.Derive
import org.apache.spark.sql.functions._

/** Queries exposing the engine's clean-pipeline building blocks on the
  * harness testdata, each with a DuckDB oracle.
  */
object PipelineQueries {

  /** SO1 + §5: the reference's QA harness with its EXACT literals
    * (ref `:1097-1126`, FIXTURES.md A5): two 5-row tables, counts and
    * intersect count — expected (5, 5, 4). */
  val qaIntersect = QueryDef(
    "q_qa_intersect",
    Some("""WITH t1(field1, field2) AS (VALUES
              ('A','B'),('A','C'),('A','D'),('B','D'),('B','F')),
            t2(field1, field2) AS (VALUES
              ('A','B'),('A','C'),('A','D'),('B','D'),('E','F'))
            SELECT CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n1,
                   CAST((SELECT COUNT(*) FROM t2) AS BIGINT) AS n2,
                   CAST((SELECT COUNT(*) FROM
                        (SELECT * FROM t1 INTERSECT SELECT * FROM t2) x)
                        AS BIGINT) AS n_common"""),
    (s, _) => {
      import s.implicits._
      val t1 = Seq(("A", "B"), ("A", "C"), ("A", "D"), ("B", "D"),
        ("B", "F")).toDF("field1", "field2")
      val t2 = Seq(("A", "B"), ("A", "C"), ("A", "D"), ("B", "D"),
        ("E", "F")).toDF("field1", "field2")
      val ag = graft.engine.Qa.agreement(t1, t2)
      Seq((ag.countA, ag.countB, ag.countCommon)).toDF("n1", "n2", "n_common")
    })

  /** §2j generic derives on testdata: coalesce-fallback sum, NULL-safe
    * ratio, zero-pad, flag concat — the building blocks of the
    * reference's 20 calculated fields (ref `:867-936`). */
  val deriveFallbacks = QueryDef(
    "q_derive_fallbacks",
    Some("""SELECT l_orderkey, l_linenumber,
                   COALESCE(CAST(l_quantity AS DOUBLE) + CAST(l_tax AS DOUBLE),
                            CAST(l_extendedprice AS DOUBLE)) AS qty_plus_tax,
                   CAST(l_extendedprice AS DOUBLE) /
                     NULLIF(CAST(l_discount AS DOUBLE), 0.0) AS price_per_disc,
                   LPAD(CAST(l_suppkey AS VARCHAR), 6, '0') AS supp_padded,
                   CONCAT('R=', l_returnflag, ', ', 'S=', l_linestatus) AS flags
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        Derive.sumWithFallback(col("l_quantity"), col("l_tax"),
          col("l_extendedprice")).as("qty_plus_tax"),
        Derive.ratioOrNull(col("l_extendedprice"), col("l_discount"))
          .as("price_per_disc"),
        Derive.zeroPad(col("l_suppkey"), 6).as("supp_padded"),
        Derive.flagSummary(Seq("R" -> col("l_returnflag"),
          "S" -> col("l_linestatus"))).as("flags"))
      .orderBy("l_orderkey", "l_linenumber"))

  /** §2j conditional recodes shaped exactly like School Type-Original /
    * School Level-Standardized (two-input CASE then a standardizing
    * CASE over the result — ref `:800-811`, `:996-1031`). */
  val recodeChain = QueryDef(
    "q_recode_chain",
    Some("""WITH base AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderstatus = 'F' AND o_orderpriority LIKE '1-%'
                            THEN 'Done-Urgent'
                          WHEN o_orderstatus = 'F' THEN 'Done-Normal'
                          WHEN o_orderstatus <> 'F' AND o_orderpriority LIKE '1-%'
                            THEN 'Open-Urgent'
                          ELSE 'Open-Normal' END AS class_original
              FROM orders)
            SELECT o_orderkey, class_original,
                   CASE WHEN class_original = 'Done-Urgent' THEN 'Done'
                        WHEN class_original = 'Done-Normal' THEN 'Done'
                        WHEN class_original IN ('Open-Urgent','Open-Normal')
                          THEN 'Open'
                        ELSE NULL END AS class_standardized
            FROM base ORDER BY o_orderkey"""),
    (s, d) => {
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        when(col("o_orderstatus") === "F" &&
             col("o_orderpriority").like("1-%"), "Done-Urgent")
          .when(col("o_orderstatus") === "F", "Done-Normal")
          .when(col("o_orderstatus") =!= "F" &&
            col("o_orderpriority").like("1-%"), "Open-Urgent")
          .otherwise("Open-Normal").as("class_original"))
      base.select(col("o_orderkey"), col("class_original"),
        when(col("class_original") === "Done-Urgent", "Done")
          .when(col("class_original") === "Done-Normal", "Done")
          .when(col("class_original").isin("Open-Urgent", "Open-Normal"),
            "Open")
          .otherwise(lit(null)).as("class_standardized"))
        .orderBy("o_orderkey")
    })

  /** The FULL reference pipeline (ingest → dictionary clean → derive →
    * three-part-key join → distinct) over the bundled WI-shaped
    * fixtures — the flagship end-to-end flow as a driver-checked query
    * (rows-only: TSV+dictionary semantics aren't DuckDB-expressible
    * without re-implementing the engine in SQL; values are pinned by
    * PipelineGoldenSpec). */
  val cleanPipeline = QueryDef(
    "q_clean_pipeline",
    None,
    (s, _) => {
      val out = graft.engine.Pipeline.run(s, graft.engine.Pipeline.Config(
        dict1Path = Fixtures.path("data_dictionary_template_1.txt"),
        dict2Path = Fixtures.path("data_dictionary_template_2.txt"),
        breakfastPath = Fixtures.path("2017_2018_SBP_MEAL_PARTICIPATION.txt"),
        lunchPath = Fixtures.path("2017_2018_NSLP_MEAL_PARTICIPATION.txt")))
      // project a stable subset: fixture schema evolution shouldn't
      // churn the driver's schema snapshot
      out.select(col("`school name`"), col("`claim date`"),
          col("`Unique ID`").as("unique_id"),
          col("`NCES ID`").as("nces_id"),
          col("`FR Lunch Meals`").as("fr_lunch_meals"),
          col("`FR Lunch ADP`").as("fr_lunch_adp"),
          col("`FR Breakfast Meals`").as("fr_breakfast_meals"),
          col("`School Level-Standardized`").as("school_level_std"))
        .orderBy("school name")
    })

  val all: Seq[QueryDef] = Seq(qaIntersect, deriveFallbacks, recodeChain,
    cleanPipeline)
}

/** Stages bundled fixture files (classpath resources) into a temp dir
  * so path-based readers can load them regardless of packaging. */
object Fixtures {
  private lazy val dir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-fixtures")
    Seq("data_dictionary_template_1.txt", "data_dictionary_template_2.txt",
      "2017_2018_SBP_MEAL_PARTICIPATION.txt",
      "2017_2018_NSLP_MEAL_PARTICIPATION.txt").foreach { name =>
      val in = getClass.getResourceAsStream(s"/fixtures/$name")
      require(in != null, s"fixture $name missing from classpath")
      try java.nio.file.Files.copy(in, d.resolve(name))
      finally in.close()
    }
    d
  }
  def path(name: String): String = dir.resolve(name).toString
}
