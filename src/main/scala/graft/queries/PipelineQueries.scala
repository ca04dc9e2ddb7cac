package graft.queries

import graft.{QueryDef, Tables}
import graft.engine.Derive
import org.apache.spark.sql.functions._

/** Queries exposing the engine's clean-pipeline building blocks on the
  * harness testdata, each with a DuckDB oracle.
  */
object PipelineQueries {

  /** Corrupt-record ingestion (X164 — the PERMISSIVE-mode contract a
    * production JSON/CSV intake relies on: malformed rows are
    * QUARANTINED into the corrupt column, not dropped and not fatal;
    * partially-parseable rows keep their good fields AND carry the
    * raw line for the quarantine audit). A deterministic 7-line
    * fixture exercises the full matrix — valid, missing-field,
    * malformed JSON, type-mismatched field (good fields SURVIVE,
    * corrupt populated), bad double, unknown-extra-field, non-JSON —
    * and the oracle is the pinned literal outcome table (the robots-
    * fixture device; semantics probed against the reader, not
    * assumed). Sort key coalesce(v, corrupt) is unique and non-null
    * by fixture construction. */
  val corruptRecords = QueryDef(
    "q_corrupt_records",
    Some("""SELECT CAST(id AS BIGINT) AS id, v,
                   CAST(x AS DOUBLE) AS x, corrupt
            FROM (VALUES
              (1, 'alpha', 2.5, NULL),
              (2, 'beta', NULL, NULL),
              (NULL, NULL, NULL, '{id: 3, oops'),
              (NULL, 'gamma', 1.0,
               '{"id": "notanint", "v": "gamma", "x": 1.0}'),
              (5, 'delta', NULL, '{"id": 5, "v": "delta", "x": "NaNope"}'),
              (6, 'epsilon', 7.25, NULL),
              (NULL, NULL, NULL, 'not json at all'))
              AS t(id, v, x, corrupt)
            ORDER BY COALESCE(v, corrupt)"""),
    (s, _) => {
      import org.apache.spark.sql.types._
      val dir = java.nio.file.Files.createTempDirectory("graft-corrupt")
      val lines = Seq(
        """{"id": 1, "v": "alpha", "x": 2.5}""",
        """{"id": 2, "v": "beta"}""",
        """{id: 3, oops""",
        """{"id": "notanint", "v": "gamma", "x": 1.0}""",
        """{"id": 5, "v": "delta", "x": "NaNope"}""",
        """{"id": 6, "v": "epsilon", "x": 7.25, "extra": true}""",
        """not json at all""")
      java.nio.file.Files.write(dir.resolve("a.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))
      val schema = StructType(Seq(StructField("id", LongType),
        StructField("v", StringType), StructField("x", DoubleType),
        StructField("_corrupt", StringType)))
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(dir.toString)
        .select(col("id"), col("v"), col("x"),
          col("_corrupt").as("corrupt"))
        .orderBy(coalesce(col("v"), col("corrupt")))
    })

  /** Quoted-CSV ingestion (X167 — the RFC 4180 edge matrix the
    * reference's naive tab-split BULK INSERT cannot express, and the
    * second member of the intake-robustness family next to X164's
    * JSON quarantine: embedded delimiters inside quotes, doubled-
    * quote escapes, a MULTILINE quoted field (needs multiLine=true —
    * the option that changes the file's splittability contract:
    * multiline CSV cannot split inside records), and unquoted
    * whitespace preserved). Fixture-pinned literal oracle (the X164
    * device). */
  val csvQuoted = QueryDef(
    "q_csv_quoted",
    Some("""SELECT CAST(id AS BIGINT) AS id, a, b
            FROM (VALUES
              (1, 'plain', 'x'),
              (2, 'with,comma', 'y'),
              (3, 'say "hi"', 'z'),
              (4, 'two
lines', 'w'),
              (5, ' padded ', 'v'))
              AS t(id, a, b)
            ORDER BY id"""),
    (s, _) => {
      import org.apache.spark.sql.types._
      val dir = java.nio.file.Files.createTempDirectory("graft-csvq")
      val csv = Seq(
        "id,a,b",
        "1,plain,x",
        "2,\"with,comma\",y",
        "3,\"say \"\"hi\"\"\",z",
        "4,\"two\nlines\",w",
        "5, padded ,v").mkString("\n")
      java.nio.file.Files.write(dir.resolve("a.csv"),
        csv.getBytes("UTF-8"))
      val schema = StructType(Seq(StructField("id", LongType),
        StructField("a", StringType), StructField("b", StringType)))
      s.read.schema(schema)
        .option("header", "true")
        .option("multiLine", "true")
        // RFC 4180 doubled-quote escaping: Spark's DEFAULT escape is
        // backslash (a recorded gotcha — without this option the
        // doubled quote survives verbatim); escape = the quote char
        // is the RFC dialect
        .option("escape", "\"")
        // keep unquoted whitespace (the reference's all-varchar
        // spirit: bytes in, bytes kept)
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(dir.toString)
        .orderBy("id")
    })

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
    * fixtures — the flagship end-to-end flow as a driver-checked query.
    *
    * The DuckDB oracle unrolls the engine's work as literal SQL
    * (VERDICT r1 #1): `read_csv(all_varchar)` over the same fixture
    * TSVs, the dictionary plan applied as a projection (for these
    * fixtures the plan is data-independent: drop AGENCY_NAME — clean
    * name contains NOT USED — and JUNK_COL — no dictionary match;
    * rename AGENCY_CODE → "Agency Code"), every §2j derive as its SQL
    * core, the three-part-key join (zero-padded district id), DISTINCT
    * over the full wide table, then the stable 8-column projection.
    * This gives S1-S3, S7, C2, C3, C5 and §2j an end-to-end oracle. */
  val cleanPipeline = QueryDef(
    "q_clean_pipeline",
    Some(CleanPipelineOracle.sql),
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

  /** The *intended* NCES-ID join (DIVERGENCES.md #3, ref `:926-928`):
    * full pipeline + left join to the cleaned A4 NCES fixture by school
    * name, real NCES school id with coded-padded-district fallback
    * (Delta School is absent from the NCES file → falls back). */
  val ncesJoin = QueryDef(
    "q_nces_join",
    Some(CleanPipelineOracle.ncesSql),
    (s, _) => {
      val out = graft.engine.Pipeline.runWithNcesJoin(s,
        graft.engine.Pipeline.Config(
          dict1Path = Fixtures.path("data_dictionary_template_1.txt"),
          dict2Path = Fixtures.path("data_dictionary_template_2.txt"),
          breakfastPath = Fixtures.path("2017_2018_SBP_MEAL_PARTICIPATION.txt"),
          lunchPath = Fixtures.path("2017_2018_NSLP_MEAL_PARTICIPATION.txt"),
          ncesPath = Some(Fixtures.path("WI_NCES_School_Data_SY15-16.txt"))))
      out.select(col("`school name`"), col("`claim date`"),
          col("`Unique ID`").as("unique_id"),
          col("`NCES ID`").as("nces_id"),
          col("`FR Lunch Meals`").as("fr_lunch_meals"),
          col("`School Level-Standardized`").as("school_level_std"))
        .orderBy("school name")
    })

  /** The reference's stated end goal — one dictionary-driven pipeline
    * reused across states (PDF p.31; Read.md: 65 states × 4-6
    * datasets) — demonstrated for real: the SAME `Pipeline.run` plan
    * builder over a second state's fixtures (MN: different raw column
    * ORDER, a different junk column, AGENCY_NAME present — everything
    * the dictionary plan must absorb), per-state finals unioned by
    * clean schema under a state tag. At scale each state is an
    * independent plan over its own files — embarrassingly parallel,
    * one union at the end, no cross-state shuffle. */
  val multiState = QueryDef(
    "q_multi_state",
    Some(CleanPipelineOracle.multiStateSql),
    (s, _) => {
      def cfg(lunch: String, bf: String, st: String) =
        graft.engine.Pipeline.Config(
          dict1Path = Fixtures.path("data_dictionary_template_1.txt"),
          dict2Path = Fixtures.path("data_dictionary_template_2.txt"),
          breakfastPath = Fixtures.path(bf),
          lunchPath = Fixtures.path(lunch),
          state = st)
      def proj(df: org.apache.spark.sql.DataFrame, st: String) =
        df.select(lit(st).as("state"),
          col("`school name`"), col("`claim date`"),
          col("`Unique ID`").as("unique_id"),
          col("`NCES ID`").as("nces_id"),
          col("`FR Lunch Meals`").as("fr_lunch_meals"),
          col("`FR Breakfast Meals`").as("fr_breakfast_meals"),
          col("`School Level-Standardized`").as("school_level_std"))
      val wi = proj(graft.engine.Pipeline.run(s, cfg(
        "2017_2018_NSLP_MEAL_PARTICIPATION.txt",
        "2017_2018_SBP_MEAL_PARTICIPATION.txt", "WI")), "WI")
      val mn = proj(graft.engine.Pipeline.run(s, cfg(
        "MN_2017_2018_NSLP_MEAL_PARTICIPATION.txt",
        "MN_2017_2018_SBP_MEAL_PARTICIPATION.txt", "MN")), "MN")
      wi.unionByName(mn).orderBy("state", "school name")
    })

  // -------------------------------------- X207 ORC partitioned round-trip

  /** ORC partitioned write → partition-pruned read-back (X207 — the
    * third member of the intake family next to X164's JSON quarantine
    * and X167's RFC 4180 CSV: the OTHER columnar warehouse format,
    * exercising Spark's ORC writer/reader, Hive-style partition
    * directory layout, partition pruning AT THE SCAN (the `status=F`
    * predicate never reads the other partitions' files), and
    * column pruning through a non-parquet source). Orders are written
    * partitioned by status to a per-run tempdir (the X163 isolation
    * discipline), read back with the partition filter, and reduced;
    * the oracle recomputes the same slice straight from the source
    * table — a green row IS round-trip fidelity (types, timestamps,
    * doubles) plus correct pruning. IO-tagged cost by design, like
    * q_shard_write. */
  val orcRoundtrip = QueryDef(
    "q_orc_roundtrip",
    Some(s"""SELECT o_orderpriority,
                    CAST(COUNT(*) AS BIGINT) AS n_orders,
                    ${graft.functions.Num.qroundSql(
                      "SUM(o_totalprice)", 4)} AS sum_price,
                    MIN(o_orderdate) AS first_date,
                    MAX(o_orderdate) AS last_date
             FROM orders WHERE o_orderstatus = 'F'
             GROUP BY o_orderpriority
             ORDER BY o_orderpriority"""),
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_orc_").toString
      Tables.orders(s, d)
        .write.mode("overwrite").partitionBy("o_orderstatus")
        .orc(dir)
      s.read.orc(dir)
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          graft.functions.Num.qround(sum("o_totalprice"), 4)
            .as("sum_price"),
          min("o_orderdate").as("first_date"),
          max("o_orderdate").as("last_date"))
        .orderBy("o_orderpriority")
    })

  val all: Seq[QueryDef] = Seq(qaIntersect, deriveFallbacks, recodeChain,
    cleanPipeline, ncesJoin, multiState, corruptRecords, csvQuoted,
    orcRoundtrip)
}

/** The q_clean_pipeline DuckDB oracle: the reference pipeline (ref
  * `shareOurStrengthSQLCodev4.sql:25-1089`) unrolled as literal SQL over
  * the bundled fixture TSVs. Each CTE level mirrors one engine stage so
  * a mismatch localizes: `_raw` = Ingest+CleanPlan, levels 1 and 2 =
  * Derive (split where a derive reads an earlier derive, matching the
  * withColumn chain), joined = Assemble.joinClaims (breakfast-side
  * overlap suffixed _b), final = DISTINCT, then the projection. */
object CleanPipelineOracle {
  private val fx = "/root/repo/src/main/resources/fixtures"

  /** Shared CTE chain up to `${px}final` (the DISTINCT wide table),
    * parametrized on a CTE-name prefix, the state code, and the two
    * claim files — the plain oracle, the NCES-join oracle, and the
    * multi-state oracle all instantiate it (the SAME chain applied to
    * a different state's files is exactly the reference's "all 40
    * states" reuse claim, PDF p.31). */
  private def ctesFor(px: String, state: String, lunchFile: String,
      bfFile: String): String = s"""
${px}lunch_raw AS (
  SELECT "AGENCY_CODE" AS "Agency Code", "school name", "claim date",
         "district id", "School ID", "PUBLIC", "SCHOOL TYPE",
         "School Level-Original", "CEP (Y/N)", "Lunch Meals-Free",
         "Lunch Meals-Reduced", "Lunch Meals-Free and Reduced",
         "Lunch Meals-Paid", "Operating Days-Lunch Only", "Operating Days",
         "Enrollment-Free", "Enrollment-Reduced",
         "Enrollment-Free and Reduced", "Enrollment-Total", "School Year"
  FROM read_csv('$fx/$lunchFile',
                delim='\\t', header=true, all_varchar=true)
),
${px}lunch1 AS (
  SELECT *,
    CASE WHEN "PUBLIC" = 'YES' AND "SCHOOL TYPE" <> 'RCCI' THEN 'Public'
         WHEN "PUBLIC" = 'YES' AND "SCHOOL TYPE" = 'RCCI' THEN 'Public-RCCI'
         WHEN "PUBLIC" = 'NO'  AND "SCHOOL TYPE" <> 'RCCI' THEN 'Nonpublic'
         WHEN "PUBLIC" = 'NO'  AND "SCHOOL TYPE" = 'RCCI' THEN 'Nonpublic-RCCI'
         ELSE NULL END AS "School Type-Original",
    COALESCE(CAST("Lunch Meals-Free" AS DOUBLE) + CAST("Lunch Meals-Reduced" AS DOUBLE),
             CAST("Lunch Meals-Free and Reduced" AS DOUBLE)) AS "FR Lunch Meals",
    COALESCE(CAST("Enrollment-Free" AS DOUBLE) + CAST("Enrollment-Reduced" AS DOUBLE),
             CAST("Enrollment-Free and Reduced" AS DOUBLE)) AS "FR Enrollment"
  FROM ${px}lunch_raw
),
${px}lunch2 AS (
  SELECT *,
    "FR Lunch Meals" / NULLIF(COALESCE(CAST("Operating Days-Lunch Only" AS DOUBLE),
                                       CAST("Operating Days" AS DOUBLE)), 0.0)
      AS "FR Lunch ADP",
    '$state' || '-' || ('0' || "School ID") || '-' || "district id" AS "Unique ID",
    LPAD("district id", 6, '0') AS "NCES ID",
    COALESCE("School Year", '17-18') AS "School_Year",
    CAST(NULL AS VARCHAR) AS "Target Area",
    CASE WHEN "CEP (Y/N)" = 'N'
           THEN "FR Enrollment" / NULLIF(CAST("Enrollment-Total" AS DOUBLE), 0.0)
         WHEN "CEP (Y/N)" = 'Y'
           THEN CAST("Enrollment-Free" AS DOUBLE) /
                NULLIF(CAST("Enrollment-Free" AS DOUBLE) + CAST("Lunch Meals-Paid" AS DOUBLE), 0.0)
         ELSE NULL END AS "FR Enrollment Percentage",
    CASE WHEN "School Level-Original" = 'High School' THEN 'High'
         WHEN "School Level-Original" = 'Elementary School' THEN 'Elementary'
         WHEN "School Level-Original" = 'Middle School' THEN 'Middle'
         WHEN "School Level-Original" = 'Junior H.S' THEN 'Middle'
         WHEN "School Level-Original" = 'Elementary/Sec Combined' THEN 'Other'
         WHEN "School Level-Original" = 'RCCI' THEN 'Other'
         WHEN "School Level-Original" = 'Unknown' THEN 'Other'
         WHEN "School Level-Original" IS NULL THEN NULL
         ELSE 'Other' END AS "School Level-Standardized",
    CASE WHEN "School Type-Original" = 'Public' THEN 'Public'
         WHEN "School Type-Original" = 'Nonpublic' THEN 'Private'
         WHEN "School Type-Original" IN ('Public-RCCI', 'Nonpublic-RCCI') THEN 'RCCI'
         ELSE NULL END AS "School Type-Standardized"
  FROM ${px}lunch1
),
${px}bf_raw AS (
  SELECT "AGENCY_CODE" AS "Agency Code", "school name", "claim date",
         "district id", "School ID", "TRADITIONAL_MODEL", "MID_MORNING_MODEL",
         "CLASSROOM_MODEL", "REDUCED_PRICE_MODEL", "GRAB_N_GO_MODEL",
         "FREE_MODEL", "Breakfast Meals-Free", "Breakfast Meals-Reduced",
         "Breakfast Meals-Free and Reduced", "Operating Days-Breakfast Only",
         "Operating Days"
  FROM read_csv('$fx/$bfFile',
                delim='\\t', header=true, all_varchar=true)
),
${px}bf1 AS (
  SELECT *,
    'O=' || COALESCE("TRADITIONAL_MODEL", '') || ', ' ||
    'P=' || COALESCE("MID_MORNING_MODEL", '') || ', ' ||
    'C=' || COALESCE("CLASSROOM_MODEL", '') || ', ' ||
    'R=' || COALESCE("REDUCED_PRICE_MODEL", '') || ', ' ||
    'G=' || COALESCE("GRAB_N_GO_MODEL", '') || ', ' ||
    'T=' || COALESCE("FREE_MODEL", '')
      AS "Breakfast Delivery Model from State Agency-Original",
    COALESCE(CAST("Breakfast Meals-Free" AS DOUBLE) + CAST("Breakfast Meals-Reduced" AS DOUBLE),
             CAST("Breakfast Meals-Free and Reduced" AS DOUBLE)) AS "FR Breakfast Meals"
  FROM ${px}bf_raw
),
${px}bf2 AS (
  SELECT *,
    "FR Breakfast Meals" / NULLIF(COALESCE(CAST("Operating Days-Breakfast Only" AS DOUBLE),
                                           CAST("Operating Days" AS DOUBLE)), 0.0)
      AS "FR Breakfast ADP"
  FROM ${px}bf1
),
${px}joined AS (
  SELECT
    l."school name", l."claim date",
    l."Agency Code", l."district id", l."School ID", l."PUBLIC",
    l."SCHOOL TYPE", l."School Level-Original", l."CEP (Y/N)",
    l."Lunch Meals-Free", l."Lunch Meals-Reduced",
    l."Lunch Meals-Free and Reduced", l."Lunch Meals-Paid",
    l."Operating Days-Lunch Only", l."Operating Days",
    l."Enrollment-Free", l."Enrollment-Reduced",
    l."Enrollment-Free and Reduced", l."Enrollment-Total", l."School Year",
    l."School Type-Original", l."FR Lunch Meals", l."FR Enrollment",
    l."FR Lunch ADP", l."Unique ID", l."NCES ID", l."School_Year",
    l."Target Area", l."FR Enrollment Percentage",
    l."School Level-Standardized", l."School Type-Standardized",
    b."Agency Code" AS "Agency Code_b", b."district id" AS "district id_b",
    b."School ID" AS "School ID_b", b."TRADITIONAL_MODEL",
    b."MID_MORNING_MODEL", b."CLASSROOM_MODEL", b."REDUCED_PRICE_MODEL",
    b."GRAB_N_GO_MODEL", b."FREE_MODEL", b."Breakfast Meals-Free",
    b."Breakfast Meals-Reduced", b."Breakfast Meals-Free and Reduced",
    b."Operating Days-Breakfast Only", b."Operating Days" AS "Operating Days_b",
    b."Breakfast Delivery Model from State Agency-Original",
    b."FR Breakfast Meals", b."FR Breakfast ADP"
  FROM ${px}lunch2 l
  JOIN ${px}bf2 b
    ON l."school name" = b."school name"
   AND l."claim date" = b."claim date"
   AND LPAD(l."district id", 6, '0') = LPAD(b."district id", 6, '0')
),
${px}final AS (SELECT DISTINCT * FROM ${px}joined)"""

  /** The concrete WI chain (unprefixed names — `final` etc.). */
  private val ctes: String = "\nWITH " + ctesFor("", "WI",
    "2017_2018_NSLP_MEAL_PARTICIPATION.txt",
    "2017_2018_SBP_MEAL_PARTICIPATION.txt")

  val sql: String = ctes + """
SELECT "school name", "claim date",
       "Unique ID" AS unique_id, "NCES ID" AS nces_id,
       "FR Lunch Meals" AS fr_lunch_meals, "FR Lunch ADP" AS fr_lunch_adp,
       "FR Breakfast Meals" AS fr_breakfast_meals,
       "School Level-Standardized" AS school_level_std
FROM final ORDER BY "school name"
"""

  /** q_nces_join oracle: the DISTINCT wide table left-joined to the
    * cleaned NCES school list (quoted headers stripped by the CSV
    * reader; dictionary plan: School Name → school name, NOT-USED /
    * unmatched columns dropped), intended id with coded-id fallback. */
  val ncesSql: String = ctes + s""",
nces AS (
  SELECT "School Name" AS sn, "NCES School ID" AS nid
  FROM read_csv('$fx/WI_NCES_School_Data_SY15-16.txt',
                delim='\\t', header=true, all_varchar=true))
SELECT f."school name", f."claim date",
       f."Unique ID" AS unique_id,
       COALESCE(n.nid, f."NCES ID") AS nces_id,
       f."FR Lunch Meals" AS fr_lunch_meals,
       f."School Level-Standardized" AS school_level_std
FROM final f LEFT JOIN nces n ON f."school name" = n.sn
ORDER BY f."school name"
"""

  /** q_multi_state oracle: the SAME CTE chain instantiated twice — WI
    * files and MN files (different column order, different junk
    * column) — and the per-state finals unioned under a state tag. */
  val multiStateSql: String = "\nWITH " +
    ctesFor("", "WI",
      "2017_2018_NSLP_MEAL_PARTICIPATION.txt",
      "2017_2018_SBP_MEAL_PARTICIPATION.txt") + ",\n" +
    ctesFor("mn_", "MN",
      "MN_2017_2018_NSLP_MEAL_PARTICIPATION.txt",
      "MN_2017_2018_SBP_MEAL_PARTICIPATION.txt") + """
SELECT * FROM (
  SELECT 'WI' AS state, "school name", "claim date",
         "Unique ID" AS unique_id, "NCES ID" AS nces_id,
         "FR Lunch Meals" AS fr_lunch_meals,
         "FR Breakfast Meals" AS fr_breakfast_meals,
         "School Level-Standardized" AS school_level_std
  FROM final
  UNION ALL
  SELECT 'MN', "school name", "claim date", "Unique ID", "NCES ID",
         "FR Lunch Meals", "FR Breakfast Meals",
         "School Level-Standardized"
  FROM mn_final) u
ORDER BY state, "school name"
"""
}

/** Stages bundled fixture files (classpath resources) into a temp dir
  * so path-based readers can load them regardless of packaging. */
object Fixtures {
  private lazy val dir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft-fixtures")
    Seq("data_dictionary_template_1.txt", "data_dictionary_template_2.txt",
      "2017_2018_SBP_MEAL_PARTICIPATION.txt",
      "2017_2018_NSLP_MEAL_PARTICIPATION.txt",
      "MN_2017_2018_SBP_MEAL_PARTICIPATION.txt",
      "MN_2017_2018_NSLP_MEAL_PARTICIPATION.txt",
      "WI_NCES_School_Data_SY15-16.txt").foreach { name =>
      val in = getClass.getResourceAsStream(s"/fixtures/$name")
      require(in != null, s"fixture $name missing from classpath")
      try java.nio.file.Files.copy(in, d.resolve(name))
      finally in.close()
    }
    d
  }
  def path(name: String): String = dir.resolve(name).toString
}
