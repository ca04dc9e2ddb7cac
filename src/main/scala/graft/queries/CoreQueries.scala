package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Operator-parity queries: one per operator class of the reference
  * (SURVEY.md §2), generalized onto the TPC-H-ish testdata.
  *
  * Reference = `/root/reference/shareOurStrengthSQLCodev4.sql` (T-SQL);
  * each query's scaladoc cites the reference lines whose operator class
  * it re-expresses. All plans are declarative DataFrame chains — Catalyst
  * handles pushdown/pruning/join selection; `broadcast()` hints mark the
  * dimension sides that must never shuffle at 100 TB.
  */
object CoreQueries {

  /** P1/S1: projection + filter pushed into the parquet scan
    * (ref :99-104 projection idiom). */
  val scanProject = QueryDef(
    "q_scan_project",
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem WHERE l_quantity > 40
            ORDER BY l_orderkey, l_linenumber"""),
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber"))

  /** P2: `IS NULL OR LIKE '%…%'` delete-set filter (ref :128-130). */
  val filterNullLike = QueryDef(
    "q_filter_null_like",
    Some("""SELECT p_partkey, p_name, p_type FROM part
            WHERE p_type IS NULL OR p_type LIKE '%PROMO%'
            ORDER BY p_partkey"""),
    (s, d) => Tables.part(s, d)
      .filter(col("p_type").isNull || col("p_type").like("%PROMO%"))
      .select("p_partkey", "p_name", "p_type")
      .orderBy("p_partkey"))

  /** P5: multi-branch CASE WHEN recode (ref :800-811 School Type,
    * :996-1013 School Level standardization). */
  val caseWhen = QueryDef(
    "q_case_when",
    Some("""SELECT o_orderkey,
                   CASE WHEN o_orderstatus = 'F' THEN 'finished'
                        WHEN o_orderstatus = 'O' THEN 'open'
                        WHEN o_orderstatus = 'P' THEN 'pending'
                        ELSE 'unknown' END AS status_name,
                   CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                        THEN 'high' ELSE 'low' END AS prio_class
            FROM orders ORDER BY o_orderkey"""),
    (s, d) => Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "finished")
          .when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "P", "pending")
          .otherwise("unknown").as("status_name"),
        when(col("o_orderpriority").like("1-%") ||
             col("o_orderpriority").like("2-%"), "high")
          .otherwise("low").as("prio_class"))
      .orderBy("o_orderkey"))

  /** P6: SELECT DISTINCT (ref :99, :1079). */
  val distinctQ = QueryDef(
    "q_distinct",
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
            ORDER BY l_returnflag, l_linestatus"""),
    (s, d) => Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus"))

  /** J1+P5: the dictionary-lookup pattern — names LEFT JOINed to two
    * small templates, CASE/coalesce picks whichever matched (ref
    * :99-107). Both dims broadcast: at 100 TB the fact side never
    * shuffles for these joins. */
  val dictLeftJoin = QueryDef(
    "q_dict_left_join",
    Some("""SELECT c.c_custkey, c.c_name,
                   COALESCE(n.n_name, 'UNKNOWN') AS nation_name,
                   COALESCE(r.r_name, n.n_name, 'UNKNOWN') AS region_name
            FROM customer c
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
            ORDER BY c.c_custkey"""),
    (s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
        .select(
          c("c_custkey"), c("c_name"),
          coalesce(n("n_name"), lit("UNKNOWN")).as("nation_name"),
          coalesce(r("r_name"), n("n_name"), lit("UNKNOWN")).as("region_name"))
        .orderBy("c_custkey")
    })

  /** J2+W1: surrogate-key re-stitch — two single-column projections
    * keyed by row_number joined back into a wide row (ref :202-261).
    * The window partitions by a real key so no global single-partition
    * sort exists at scale (ref's global ROW_NUMBER at :163 would not).
    */
  val rowNumJoin = QueryDef(
    "q_rownum_join",
    Some("""WITH a AS (SELECT o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
                   o_custkey FROM orders),
                 b AS (SELECT o_orderkey AS bk,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
                   o_custkey, o_orderpriority FROM orders)
            SELECT a.o_orderkey, a.o_totalprice, b.o_orderpriority
            FROM a JOIN b ON a.rn = b.rn AND a.o_custkey = b.o_custkey
            ORDER BY a.o_orderkey"""),
    (s, d) => {
      val o = Tables.orders(s, d)
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      // ONE windowed pass, materialized once (the reference stages its
      // row_number'd projections as SELECT INTO tables, ref :202-261;
      // localCheckpoint is the Spark analog) — both re-stitch sides
      // read the staged result instead of each re-running scan +
      // shuffle + sort (VERDICT r1 #7: that doubled the window work).
      val win = o.select(col("o_orderkey"), col("o_totalprice"),
          col("o_custkey"), col("o_orderpriority"))
        .withColumn("rn", row_number().over(w))
        .localCheckpoint()
      val a = win.select("o_orderkey", "o_totalprice", "o_custkey", "rn")
      val b = win.select(col("rn"), col("o_custkey"),
        col("o_orderpriority"))
      a.join(b, Seq("rn", "o_custkey"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    })

  /** J3: expression-normalized equi-join — zero-padded key computed
    * BEFORE the join (ref :846-856 computes `RIGHT('000000'+id,6)`
    * inline in the predicate; precomputing lets Catalyst plan a plain
    * equi-join and reuse the normalized key, SURVEY §4). */
  val exprKeyJoin = QueryDef(
    "q_expr_key_join",
    Some("""WITH o AS (SELECT LPAD(CAST(o_orderkey AS VARCHAR), 12, '0') AS ok,
                              o_orderdate, o_totalprice FROM orders),
                 l AS (SELECT LPAD(CAST(l_orderkey AS VARCHAR), 12, '0') AS ok,
                              l_linenumber, l_quantity FROM lineitem)
            SELECT o.ok AS order_id, l.l_linenumber, l.l_quantity, o.o_totalprice
            FROM o JOIN l ON o.ok = l.ok
            ORDER BY order_id, l_linenumber"""),
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(lpad(col("o_orderkey").cast("string"), 12, "0").as("ok"),
          col("o_orderdate"), col("o_totalprice"))
      val l = Tables.lineitem(s, d)
        .select(lpad(col("l_orderkey").cast("string"), 12, "0").as("ok"),
          col("l_linenumber"), col("l_quantity"))
      o.join(l, "ok")
        .select(col("ok").as("order_id"), col("l_linenumber"),
          col("l_quantity"), col("o_totalprice"))
        .orderBy("order_id", "l_linenumber")
    })

  /** J5: FULL OUTER join (claimed PDF p.28, never coded — capability
    * parity). Order key coalesced — full-outer emits nulls on both
    * sides and Spark/DuckDB disagree on NULL sort order. */
  val fullOuter = QueryDef(
    "q_full_outer_join",
    Some("""WITH co AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
                        FROM orders GROUP BY o_custkey)
            SELECT COALESCE(c.c_custkey, co.o_custkey) AS custkey,
                   c.c_name, co.n_orders
            FROM customer c FULL JOIN co ON c.c_custkey = co.o_custkey
            ORDER BY custkey"""),
    (s, d) => {
      val c = Tables.customer(s, d)
      val co = Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      c.join(co, c("c_custkey") === co("o_custkey"), "full_outer")
        .select(coalesce(c("c_custkey"), co("o_custkey")).as("custkey"),
          c("c_name"), co("n_orders"))
        .orderBy("custkey")
    })

  /** Semi join — EXISTS (capability parity; not in reference). */
  val semiJoin = QueryDef(
    "q_semi_join",
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 100000)
            ORDER BY c_custkey"""),
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 100000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    })

  /** Anti join — NOT EXISTS (capability parity). */
  val antiJoin = QueryDef(
    "q_anti_join",
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            ORDER BY c_custkey"""),
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    })

  /** A1+P3: GROUP BY + COUNT, keep only count==1 — the 1:1-mapping
    * detection pattern (ref :172-178). Partial (map-side) aggregation
    * then final: exactly one shuffle on the group key. */
  val groupCountOne = QueryDef(
    "q_group_count_one",
    Some("""SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY o_custkey HAVING COUNT(*) = 1
            ORDER BY o_custkey"""),
    (s, d) => Tables.orders(s, d)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .filter(col("n") === 1)
      .orderBy("o_custkey"))

  /** A2: scalar MAX/MIN (ref :141 loop bounds). */
  val scalarAgg = QueryDef(
    "q_scalar_agg",
    Some("""SELECT CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
                   CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM orders"""),
    (s, d) => Tables.orders(s, d)
      .agg(max("o_orderkey").as("max_key"), min("o_orderkey").as("min_key"),
        count(lit(1)).as("n_rows")))

  /** A3: ungrouped COUNT(*) (ref :1093 QA counts). */
  val countAll = QueryDef(
    "q_count_all",
    Some("SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem"),
    (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("n")))

  /** W1: ROW_NUMBER partitioned by a real key (ref :163 global
    * row_number — re-keyed per-partition so it scales; SURVEY §4). */
  val rowNumber = QueryDef(
    "q_row_number",
    Some("""SELECT l_orderkey, l_linenumber,
                   CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                        ORDER BY l_linenumber) AS BIGINT) AS rn
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        row_number().over(
          Window.partitionBy("l_orderkey").orderBy("l_linenumber"))
          .cast("long").as("rn"))
      .orderBy("l_orderkey", "l_linenumber"))

  /** Sort + limit / top-k (§2f — parity surface). Tiebreak on the
    * unique (orderkey, linenumber) so the top-100 cut is total-ordered
    * and engine-independent. */
  val topK = QueryDef(
    "q_top_k",
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
            LIMIT 100"""),
    (s, d) => Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(100))

  /** SO1: INTERSECT — set semantics, dedups (ref :1120-1126 QA). */
  val intersectQ = QueryDef(
    "q_intersect",
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            ORDER BY o_custkey"""),
    (s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    })

  /** UNION (set semantics — dedup; PDF p.28 "SET FUNCTIONS" parity). */
  val unionQ = QueryDef(
    "q_union",
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
            UNION
            SELECT c_custkey AS o_custkey FROM customer WHERE c_acctbal < 0
            ORDER BY o_custkey"""),
    (s, d) => {
      val a = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        .select("o_custkey")
      val b = Tables.customer(s, d).filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("o_custkey"))
      a.union(b).distinct().orderBy("o_custkey")
    })

  /** UNION ALL — bag semantics, no dedup shuffle (contrast q_union). */
  val unionAll = QueryDef(
    "q_union_all",
    Some("""SELECT * FROM (
              SELECT o_custkey AS custkey, 'order_p' AS src FROM orders
              WHERE o_orderstatus = 'P'
              UNION ALL
              SELECT c_custkey AS custkey, 'neg_bal' AS src FROM customer
              WHERE c_acctbal < 0) x
            ORDER BY custkey, src"""),
    (s, d) => {
      val a = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("custkey"), lit("order_p").as("src"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"), lit("neg_bal").as("src"))
      a.union(b).orderBy("custkey", "src")
    })

  /** EXCEPT (set semantics — parity). */
  val exceptQ = QueryDef(
    "q_except",
    Some("""SELECT c_custkey FROM customer
            EXCEPT SELECT o_custkey AS c_custkey FROM orders
            ORDER BY c_custkey"""),
    (s, d) => {
      val c = Tables.customer(s, d).select("c_custkey")
      val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
      c.except(o).orderBy("c_custkey")
    })

  /** F1-F3: REPLACE / CONCAT / LPAD string pipeline (ref :35-37 header
    * munging, :817-823 delivery-model concat, :853-856 zero-pad). */
  val stringFuncs = QueryDef(
    "q_string_funcs",
    Some("""SELECT p_partkey,
                   REPLACE(p_name, ' ', '_') AS name_snake,
                   CONCAT(p_brand, '/', p_type) AS brand_type,
                   LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
                   UPPER(p_brand) AS brand_upper,
                   SUBSTR(p_type, 1, 3) AS type_prefix
            FROM part ORDER BY p_partkey"""),
    (s, d) => Tables.part(s, d)
      .select(col("p_partkey"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_type"), 1, 3).as("type_prefix"))
      .orderBy("p_partkey"))

  /** F4/F5: CAST + arithmetic with NULL-on-zero-divide (ref :873-906;
    * T-SQL would raise on div-by-zero, Spark non-ANSI and the rebuild
    * use NULLIF to make the NULL choice explicit on both engines).
    * Unrounded: identical element-wise expression trees are
    * bit-identical across engines (see functions.Num). */
  val castArith = QueryDef(
    "q_cast_arith",
    Some("""SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) AS revenue,
                   l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
                   l_quantity / NULLIF(l_discount, 0.0) AS qty_per_disc
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))).as("charged"),
        (col("l_quantity") / nullif(col("l_discount"), lit(0.0)))
          .as("qty_per_disc"))
      .orderBy("l_orderkey", "l_linenumber"))

  /** Date/time extraction (beyond the reference, which compares dates
    * as strings — SURVEY §2h note). dayofweek: Spark is 1-based from
    * Sunday, DuckDB 0-based — oracle shifts by one. */
  val dateFuncs = QueryDef(
    "q_date_funcs",
    Some("""SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INT) AS yr,
                   CAST(month(o_orderdate) AS INT) AS mo,
                   CAST(dayofmonth(o_orderdate) AS INT) AS dom,
                   CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
                   CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                     AS month_start
            FROM orders ORDER BY o_orderkey"""),
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"))
      .orderBy("o_orderkey"))

  /** Flagship: TPC-H Q1-shaped grouped aggregation — partial+final hash
    * agg, one shuffle, whole-stage codegen end to end. */
  val q1Agg = QueryDef(
    "q1_agg",
    Some(s"""SELECT l_returnflag, l_linestatus,
                   ${Num.qroundSql("SUM(l_quantity)", 2)} AS sum_qty,
                   ${Num.qroundSql("SUM(l_extendedprice)", 2)} AS sum_base_price,
                   ${Num.qroundSql("SUM(l_extendedprice * (1 - l_discount))", 2)} AS sum_disc_price,
                   ${Num.qroundSql("AVG(l_quantity)", 4)} AS avg_qty,
                   ${Num.qroundSql("AVG(l_discount)", 4)} AS avg_disc,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""),
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Num.qround(sum("l_quantity"), 2).as("sum_qty"),
        Num.qround(sum("l_extendedprice"), 2).as("sum_base_price"),
        Num.qround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        Num.qround(avg("l_quantity"), 4).as("avg_qty"),
        Num.qround(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"))

  /** X33: bucketed co-located join — both sides written hash-bucketed
    * and per-bucket-sorted on the join key
    * ([[graft.ops.Layout.bucketed]]), then joined as a SortMergeJoin
    * with ZERO exchanges and ZERO join-side sorts (BucketedJoinSpec
    * pins the plan). This is the storage-layout answer to the 100 TB
    * fact-fact join: the shuffle is paid once at write time and every
    * later join/agg on the key is co-located. The `merge` hint keeps
    * the small sf test honest — without it Catalyst would broadcast
    * the dimension and hide the property under test.
    *
    * Revenue is aggregated in exact integer cents (round(price*100) —
    * both engines round the same IEEE double half-up) so the sums are
    * order-independent and cross-engine exact. */
  val bucketedJoin = QueryDef(
    "q_bucketed_join",
    Some("""SELECT c.c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment ORDER BY c_mktsegment"""),
    (s, d) => {
      val sfTag = d.split('/').filter(_.nonEmpty).last.replace('.', '_')
      val dir = s"/tmp/graft_bucketed_$sfTag"
      val o = graft.ops.Layout.bucketed(
        Tables.orders(s, d).select("o_custkey", "o_totalprice"),
        s"graft_bkt_orders_$sfTag", dir, "o_custkey", 8)
      val c = graft.ops.Layout.bucketed(
        Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        s"graft_bkt_customer_$sfTag", dir, "c_custkey", 8)
      o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("revenue_cents"))
        .orderBy("c_mktsegment")
    })

  /** Schema-evolution read (X163 — the lakehouse ingestion reality a
    * long-lived table lives with: producers ADD columns over time and
    * old files never rewrite; the reader must union the schemas and
    * null-fill). Two parquet batches with DIFFERENT schemas land in
    * one directory (even orderkeys carry o_custkey, odd ones carry
    * the later-added o_totalprice), then ONE `mergeSchema` read
    * returns the union schema with per-batch null-fill — the
    * capability under test is the READER's, so the oracle recomputes
    * the expected union directly from `orders`. Pays a real write per
    * run (io-tagged in the bench, like q_shard_write). */
  val schemaEvolution = QueryDef(
    "q_schema_evolution",
    Some("""SELECT o_orderkey,
                   CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END
                     AS o_custkey,
                   CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END
                     AS o_totalprice
            FROM orders ORDER BY o_orderkey"""),
    (s, d) => {
      // Per-invocation tempdir (ADVICE r12 #3): a fixed shared path let
      // two concurrent harness runs at the same sf overwrite each
      // other's files mid-read; createTempDirectory isolates them like
      // the q_corrupt_records / q_csv_quoted fixtures already do.
      val dir = java.nio.file.Files
        .createTempDirectory("graft_schevo_").toString
      val o = Tables.orders(s, d)
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey")
        .write.mode("overwrite").parquet(s"$dir/b=1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/b=2")
      s.read.option("mergeSchema", "true").parquet(dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    })

  val all: Seq[QueryDef] = Seq(
    scanProject, filterNullLike, caseWhen, distinctQ, dictLeftJoin,
    rowNumJoin, exprKeyJoin, fullOuter, semiJoin, antiJoin,
    groupCountOne, scalarAgg, countAll, rowNumber, topK,
    intersectQ, unionQ, unionAll, exceptQ, stringFuncs, castArith,
    dateFuncs, q1Agg, bucketedJoin, schemaEvolution)
}
