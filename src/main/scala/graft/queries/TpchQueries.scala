package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables._

/** The TPC-H 22-query canon (q250–q271) — the industry-standard
  * relational torture test, run end-to-end with verbatim query
  * semantics over the driver testdata and replayed by DuckDB as the
  * oracle (round-17 verdict #1).
  *
  * The driver tables are TPC-H-ISH (FIXTURES.md): `partsupp` and a
  * handful of canonical columns (l_shipmode/l_commitdate/l_receiptdate/
  * l_shipinstruct, o_comment/o_shippriority, c_phone/c_address/
  * c_comment, s_address/s_phone/s_comment, p_mfgr/p_container) do not
  * ship. [[TpchLayer]] derives every missing piece DETERMINISTICALLY
  * from the keys that do ship — pure integer arithmetic, no hashing,
  * no clock — and the SAME derivations are spliced into the DuckDB
  * oracle as a CTE prelude ([[TpchLayer.preludeSql]]), so both engines
  * query one fully-canonical schema and the 22 query bodies stay
  * textbook TPC-H (substitution parameters re-fit to the synthetic
  * distributions; every ORDER BY extended to a total order per the
  * package parity rules).
  *
  * Scale notes (the canon is exactly the 100 TB shape catalog):
  *  - Dimension sides (nation/region/supplier/part and every derived
  *    dim) broadcast; fact-fact joins shuffle on their keys once.
  *  - Every correlated subquery (Q2/Q4/Q17/Q20/Q21/Q22) is written
  *    through the Spark 4 subquery API (`exists()`/`scalar()`/
  *    `isin(ds)`) and MUST decorrelate to joins — TpchPlanSpec pins
  *    the famous ones (Q2's min-cost scalar, Q17's per-part avg,
  *    Q20's nested IN + correlated scalar, Q21's double EXISTS) to
  *    subquery-free physical plans, so each costs its equivalent
  *    join/aggregate, never a per-row probe.
  *  - Money arithmetic follows the package decimal contract: narrow
  *    DECIMAL casts keep every product within precision 38 so Spark's
  *    parallel partial aggregation and DuckDB's serial fold agree
  *    bit-for-bit; averages divide exact decimal sums as doubles.
  */
object TpchQueries {

  // ─────────────────────────────────────────────────────────────────
  // The derived canonical layer. One Scala definition per missing
  // column/table, with its DuckDB rendering kept ADJACENT in
  // preludeSql (the mdUniform/mdUniformSql twin discipline) so the
  // engine and the oracle cannot drift.
  // ─────────────────────────────────────────────────────────────────
  private[graft] object TpchLayer {

    /** partsupp: 4 suppliers per part, spread by key arithmetic over
      * however many suppliers the SF ships (canonical: PS spans 4
      * suppliers/part at every SF). ps_supplycost is integer-valued
      * 1..1000 (exact as BIGINT products in Q9/Q11); ps_availqty
      * 1..9999. The supplier count/min ride a broadcast 1-row frame
      * — part-grain work, never a corpus pass.
      *
      * PRECONDITION (pinned, not assumed): the spread arithmetic is
      * only a bijection part→4 distinct existing suppliers when the
      * supplier keys are CONTIGUOUS in [s_min, s_min + s_cnt) and
      * s_cnt >= 4. A fixture violating either would dangle
      * ps_suppkey references or duplicate (ps_partkey, ps_suppkey)
      * pairs on BOTH engine and oracle (Q9 double-counts, Q16
      * supplier_cnt deflates) with every hash gate still green — so
      * the guard lives IN the 1-row broadcast frame as a lazy
      * `raise_error`: any query that touches partsupp fails loudly
      * the moment the fixture drifts, at zero extra actions.
      * TpchLayerSpec additionally asserts the fixture directly.
      * Keys are cast to BIGINT before the multiplications on both
      * twin sides so a future narrowing of the parquet column width
      * errors (DuckDB) / keeps 64-bit range (Spark) instead of the
      * two engines diverging via silent 32-bit wraparound.
      */
    def partsupp(s: SparkSession, d: String): DataFrame = {
      val sc = supplier(s, d)
        .agg(count(lit(1)).as("s_cnt"), min("s_suppkey").as("s_min"),
          max("s_suppkey").as("s_max"))
        .select(
          when(col("s_cnt") >= 4 &&
               col("s_max") - col("s_min") + 1 === col("s_cnt"),
            col("s_cnt"))
            .otherwise(raise_error(concat(
              lit("TpchLayer.partsupp precondition violated: supplier " +
                "keys must be contiguous with count >= 4; got cnt="),
              col("s_cnt"), lit(" min="), col("s_min"),
              lit(" max="), col("s_max"))))
            .as("s_cnt"),
          col("s_min"))
      val is = s.range(4).select(col("id").cast("int").as("i"))
      part(s, d).select(col("p_partkey").cast("long").as("p_partkey"))
        .crossJoin(broadcast(sc)).crossJoin(broadcast(is))
        .select(
          col("p_partkey").as("ps_partkey"),
          (col("s_min") + (col("p_partkey") * 4 + col("i")) % col("s_cnt"))
            .as("ps_suppkey"),
          (lit(1) + (col("p_partkey") * 13 + col("i") * 31) % 1000)
            .cast("double").as("ps_supplycost"),
          (lit(1) + (col("p_partkey") * 17 + col("i") * 23) % 9999)
            .cast("long").as("ps_availqty"))
    }

    private val shipmodes = Seq(
      "REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
    private val shipinstructs = Seq(
      "DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN")
    private val containerSizes = Seq("SM", "LG", "MED", "JUMBO", "WRAP")
    private[queries] val containerTypes = Seq(
      "CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM")

    private def pick(values: Seq[String], idx: Column): Column =
      element_at(array(values.map(lit): _*), (idx + 1).cast("int"))

    /** lineitem + l_shipmode / l_shipinstruct / l_commitdate /
      * l_receiptdate. Commit offsets span [-30,+30] days and receipt
      * [+1,+30] so Q4/Q12/Q21's early/late predicates all have both
      * populations. All map-side codegen'd projections.
      */
    def lineitemX(s: SparkSession, d: String): DataFrame =
      lineitem(s, d)
        .withColumn("l_shipmode",
          pick(shipmodes, (col("l_orderkey") + col("l_linenumber")) % 7))
        .withColumn("l_shipinstruct",
          pick(shipinstructs, (col("l_orderkey") + col("l_partkey")) % 4))
        .withColumn("l_commitdate",
          expr("timestampadd(DAY, CAST(l_partkey % 61 AS INT) - 30, l_shipdate)"))
        .withColumn("l_receiptdate",
          expr("timestampadd(DAY, 1 + CAST(l_suppkey % 30 AS INT), l_shipdate)"))

    /** orders + o_shippriority (canonical constant 0) + o_comment
      * (three fixed phrases; only the %11 branch matches Q13's
      * '%special%requests%' — the %7 branch has 'special' without a
      * following 'requests', the default the reverse, so the NOT LIKE
      * rejects exactly one deterministic population).
      */
    def ordersX(s: SparkSession, d: String): DataFrame =
      orders(s, d)
        .withColumn("o_shippriority", lit(0))
        .withColumn("o_comment",
          when(col("o_orderkey") % 11 === 0,
            "special packages wake across the slyly regular requests")
            .when(col("o_orderkey") % 7 === 0,
              "furiously special deposits nag")
            .otherwise("carefully final requests sleep quickly"))

    /** customer + c_phone (country code 10+nationkey, the canonical
      * rule Q22's cntrycode substring depends on) + address/comment
      * (output-only in Q10).
      */
    def customerX(s: SparkSession, d: String): DataFrame =
      customer(s, d)
        .withColumn("c_phone",
          concat((lit(10) + col("c_nationkey")).cast("string"), lit("-"),
            lpad(col("c_custkey").cast("string"), 7, "0")))
        .withColumn("c_address",
          concat(lit("Address#"), col("c_custkey").cast("string")))
        .withColumn("c_comment",
          concat(lit("standing instructions for customer "),
            col("c_custkey").cast("string")))

    /** supplier + s_address/s_phone + s_comment (the %4==0 quarter
      * carries Q16's '%Customer%Complaints%' exclusion pattern).
      */
    def supplierX(s: SparkSession, d: String): DataFrame =
      supplier(s, d)
        .withColumn("s_address",
          concat(lit("SupplierAddr#"), col("s_suppkey").cast("string")))
        .withColumn("s_phone",
          concat((lit(10) + col("s_nationkey")).cast("string"), lit("-"),
            lpad(col("s_suppkey").cast("string"), 7, "0")))
        .withColumn("s_comment",
          when(col("s_suppkey") % 4 === 0,
            "carefully pending Customer Complaints haggle")
            .otherwise("quickly bold requests sleep furiously"))

    /** part + p_mfgr (5 manufacturers by key) + p_container (the
      * canonical 5×8 = 40-value size×type grid, indexed by coprime
      * moduli so combos cycle uniformly).
      */
    def partX(s: SparkSession, d: String): DataFrame =
      part(s, d)
        .withColumn("p_mfgr",
          concat(lit("Manufacturer#"),
            (lit(1) + col("p_partkey") % 5).cast("string")))
        .withColumn("p_container",
          concat(pick(containerSizes, col("p_partkey") % 5), lit(" "),
            pick(containerTypes, col("p_partkey") % 8)))

    /** The DuckDB rendering of everything above, as a CTE prelude each
      * oracle query appends its body to. Kept adjacent to the Scala
      * definitions so a retune changes both sides in one diff; the 22
      * hash gates then prove the renderings equivalent on every column
      * a query touches.
      */
    val preludeSql: String =
      """scnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS s_cnt,
        |               MIN(s_suppkey) AS s_min FROM supplier),
        |ii(i) AS (VALUES (0),(1),(2),(3)),
        |partsupp AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
        |    s_min + (CAST(p_partkey AS BIGINT) * 4 + i) % s_cnt
        |      AS ps_suppkey,
        |    CAST(1 + (CAST(p_partkey AS BIGINT) * 13 + i * 31) % 1000
        |      AS DOUBLE) AS ps_supplycost,
        |    CAST(1 + (CAST(p_partkey AS BIGINT) * 17 + i * 23) % 9999
        |      AS BIGINT) AS ps_availqty
        |  FROM part, scnt, ii),
        |lineitem_x AS (
        |  SELECT l.*,
        |    CASE CAST((l_orderkey + l_linenumber) % 7 AS INTEGER)
        |      WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL'
        |      WHEN 3 THEN 'SHIP' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL'
        |      ELSE 'FOB' END AS l_shipmode,
        |    CASE CAST((l_orderkey + l_partkey) % 4 AS INTEGER)
        |      WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD'
        |      WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN' END
        |      AS l_shipinstruct,
        |    l_shipdate + INTERVAL (CAST(l_partkey % 61 AS INTEGER) - 30) DAY
        |      AS l_commitdate,
        |    l_shipdate + INTERVAL (1 + CAST(l_suppkey % 30 AS INTEGER)) DAY
        |      AS l_receiptdate
        |  FROM lineitem l),
        |orders_x AS (
        |  SELECT o.*, CAST(0 AS INTEGER) AS o_shippriority,
        |    CASE WHEN o_orderkey % 11 = 0
        |      THEN 'special packages wake across the slyly regular requests'
        |      WHEN o_orderkey % 7 = 0 THEN 'furiously special deposits nag'
        |      ELSE 'carefully final requests sleep quickly' END AS o_comment
        |  FROM orders o),
        |customer_x AS (
        |  SELECT c.*,
        |    CAST(10 + c_nationkey AS VARCHAR) || '-' ||
        |      lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS c_phone,
        |    'Address#' || CAST(c_custkey AS VARCHAR) AS c_address,
        |    'standing instructions for customer ' ||
        |      CAST(c_custkey AS VARCHAR) AS c_comment
        |  FROM customer c),
        |supplier_x AS (
        |  SELECT s.*,
        |    'SupplierAddr#' || CAST(s_suppkey AS VARCHAR) AS s_address,
        |    CAST(10 + s_nationkey AS VARCHAR) || '-' ||
        |      lpad(CAST(s_suppkey AS VARCHAR), 7, '0') AS s_phone,
        |    CASE WHEN s_suppkey % 4 = 0
        |      THEN 'carefully pending Customer Complaints haggle'
        |      ELSE 'quickly bold requests sleep furiously' END AS s_comment
        |  FROM supplier s),
        |part_x AS (
        |  SELECT p.*,
        |    'Manufacturer#' || CAST(1 + p_partkey % 5 AS VARCHAR) AS p_mfgr,
        |    CASE CAST(p_partkey % 5 AS INTEGER) WHEN 0 THEN 'SM'
        |      WHEN 1 THEN 'LG' WHEN 2 THEN 'MED' WHEN 3 THEN 'JUMBO'
        |      ELSE 'WRAP' END
        |    || ' ' ||
        |    CASE CAST(p_partkey % 8 AS INTEGER) WHEN 0 THEN 'CASE'
        |      WHEN 1 THEN 'BOX' WHEN 2 THEN 'BAG' WHEN 3 THEN 'JAR'
        |      WHEN 4 THEN 'PKG' WHEN 5 THEN 'PACK' WHEN 6 THEN 'CAN'
        |      ELSE 'DRUM' END AS p_container
        |  FROM part p)""".stripMargin

    /** Oracle body + prelude. The body may open with additional CTEs
      * ("x AS (...) SELECT ..."): it is appended after a comma.
      */
    def sql(body: String): String = s"WITH $preludeSql,\n$body"

    /** Oracle body with no extra CTEs. */
    def sqlSelect(body: String): String = s"WITH $preludeSql\n$body"
  }

  import TpchLayer._

  private def ts(v: String): Column =
    lit(s"$v 00:00:00").cast("timestamp")

  /** Exact narrow money forms (package doc): prices fit DECIMAL(12,2),
    * discount/tax factors DECIMAL(3,2) — every product in the canon
    * then stays within precision 38 on BOTH engines, so sums are
    * exact and engine-independent.
    */
  private def dec12(c: Column): Column = c.cast(DecimalType(12, 2))
  private def fac(c: Column): Column = c.cast(DecimalType(3, 2))
  private val one = lit(1).cast(DecimalType(3, 2))
  private def discPrice: Column =
    dec12(col("l_extendedprice")) * (one - fac(col("l_discount")))

  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"

  // ─────────────────────────────────────────────────────────────────
  // Q1 — pricing summary report. One partial-agg'd shuffle on a
  // 6-value key; the full 10-column canonical output (q01 carries the
  // abbreviated form). Averages = exact decimal sum cast to double,
  // divided by the bigint count — IEEE-identical on both engines.
  // ─────────────────────────────────────────────────────────────────
  val q250Tpch01: Q = (s, d) => {
    val charge = discPrice * (one + fac(col("l_tax")))
    lineitem(s, d)
      .filter(col("l_shipdate") <= ts("2001-08-06"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(dec12(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast("long")).cast("double") /
          count(lit(1))).as("avg_qty"),
        (sum(dec12(col("l_extendedprice"))).cast("double") /
          count(lit(1))).as("avg_price"),
        (sum(fac(col("l_discount"))).cast("double") /
          count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q250Sql: String = sqlSelect(
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
       |    AS sum_base_price,
       |  CAST(SUM($discPriceSql) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM($discPriceSql *
       |    (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2))))
       |    AS DOUBLE) AS sum_charge,
       |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)
       |    AS avg_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
       |    / COUNT(*) AS avg_price,
       |  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*)
       |    AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2001-08-06'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q2 — min-cost supplier: the canon's famous correlated scalar over
  // a 5-way join. The subquery re-joins partsupp⋈supplier⋈nation⋈
  // region per part; Catalyst must decorrelate it to a part-grain
  // min-aggregate joined back (TpchPlanSpec pins no subquery, no
  // cartesian). Dims broadcast; the only shuffles are partsupp-grain.
  // ─────────────────────────────────────────────────────────────────
  val q251Tpch02: Q = (s, d) => {
    def europe(df: DataFrame) = df
      .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
    val minCost = europe(
      partsupp(s, d)
        .join(supplier(s, d), col("ps_suppkey") === col("s_suppkey")))
      .filter(col("ps_partkey") === col("pk2").outer())
      .select(min(col("ps_supplycost"))).scalar()
    europe(
      partX(s, d)
        .filter(col("p_size") === 9 && col("p_type").like("%DARD"))
        .withColumnRenamed("p_partkey", "pk2")
        .join(partsupp(s, d), col("pk2") === col("ps_partkey"))
        .join(supplierX(s, d), col("ps_suppkey") === col("s_suppkey")))
      .filter(col("ps_supplycost") === minCost)
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("pk2").as("p_partkey"), col("p_mfgr"), col("s_address"),
        col("s_phone"), col("s_comment"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  val q251Sql: String = sqlSelect(
    """SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address,
      |  s_phone, s_comment
      |FROM part_x, partsupp, supplier_x, nation, region
      |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      |  AND p_size = 9 AND p_type LIKE '%DARD'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND ps_supplycost = (
      |    SELECT MIN(ps_supplycost)
      |    FROM partsupp, supplier, nation n2, region r2
      |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      |      AND s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q3 — shipping priority: segment-filtered star join, top-10 by
  // revenue. customer broadcasts behind its segment filter; one
  // orderkey shuffle; TakeOrderedAndProject merges the top-10.
  // ─────────────────────────────────────────────────────────────────
  val q252Tpch03: Q = (s, d) =>
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(ordersX(s, d).filter(col("o_orderdate") < ts("1998-03-15")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d).filter(col("l_shipdate") > ts("1998-03-15")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_shippriority")
      .agg(sum(discPrice).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        unix_millis(col("o_orderdate").cast("timestamp"))
          .as("o_orderdate_ms"),
        col("o_shippriority"))
      .orderBy(col("revenue").desc, col("o_orderdate_ms"), col("l_orderkey"))
      .limit(10)

  val q252Sql: String = sqlSelect(
    s"""SELECT l_orderkey, CAST(SUM($discPriceSql) AS DOUBLE) AS revenue,
       |  epoch_ms(o_orderdate) AS o_orderdate_ms, o_shippriority
       |FROM customer, orders_x, lineitem
       |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND o_orderdate < TIMESTAMP '1998-03-15'
       |  AND l_shipdate > TIMESTAMP '1998-03-15'
       |GROUP BY l_orderkey, o_orderdate, o_shippriority
       |ORDER BY revenue DESC, o_orderdate_ms, l_orderkey
       |LIMIT 10""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q4 — order priority checking: correlated EXISTS on the commit/
  // receipt inequality → one left-semi join on orderkey.
  // ─────────────────────────────────────────────────────────────────
  val q253Tpch04: Q = (s, d) => {
    val late = lineitemX(s, d).filter(
      col("l_orderkey") === col("o_orderkey").outer() &&
        col("l_commitdate") < col("l_receiptdate"))
    orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-07-01") &&
        col("o_orderdate") < ts("1996-10-01"))
      .filter(late.exists())
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q253Sql: String = sqlSelect(
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem_x l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_commitdate < l.l_receiptdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q5 — local supplier volume: the customer-and-supplier-same-nation
  // join (c_nationkey = s_nationkey rides the supplier join as an
  // extra equality). nation⋈region broadcasts; facts shuffle once.
  // ─────────────────────────────────────────────────────────────────
  val q254Tpch05: Q = (s, d) =>
    customer(s, d)
      .join(orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, d)
        .join(region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  val q254Sql: String = sqlSelect(
    s"""SELECT n_name, CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q6 — forecasting revenue change: pure pushdown scan, zero joins.
  // Every predicate reaches the parquet reader.
  // ─────────────────────────────────────────────────────────────────
  val q255Tpch06: Q = (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24)
      .agg(sum(dec12(col("l_extendedprice")) * fac(col("l_discount")))
        .cast("double").as("revenue"))

  val q255Sql: String = sqlSelect(
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |  CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.04 AND l_discount <= 0.06
      |  AND l_quantity < 24""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q7 — volume shipping: two nation roles (supplier's and
  // customer's) via independently aliased broadcast dims, the OR'd
  // nation-pair predicate as a post-join filter, volume by year.
  // ─────────────────────────────────────────────────────────────────
  val q256Tpch07: Q = (s, d) => {
    val n1 = nation(s, d).select(col("n_nationkey").as("n1_key"),
      col("n_name").as("supp_nation"))
    val n2 = nation(s, d).select(col("n_nationkey").as("n2_key"),
      col("n_name").as("cust_nation"))
    supplier(s, d)
      .join(lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") <= ts("1997-12-31")),
        col("s_suppkey") === col("l_suppkey"))
      .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q256Sql: String = sqlSelect(
    s"""SELECT supp_nation, cust_nation, l_year,
       |  CAST(SUM(volume) AS DOUBLE) AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |    $discPriceSql AS volume
       |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
       |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
       |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
       |    AND c_nationkey = n2.n_nationkey
       |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
       |      AND TIMESTAMP '1997-12-31') shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q8 — national market share: the ratio-of-conditional-sums form.
  // Numerator rides the same aggregate as the denominator (one pass);
  // both exact decimals cast to double before the one division.
  // ─────────────────────────────────────────────────────────────────
  val q257Tpch08: Q = (s, d) => {
    val custNation = nation(s, d)
      .join(broadcast(region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppNation = nation(s, d).select(col("n_nationkey").as("sn_key"),
      col("n_name").as("nation"))
    partX(s, d).filter(col("p_type") === "ECONOMY")
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .join(supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") <= ts("1997-12-31")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(when(col("nation") === "NATION_6", discPrice))
        .cast("double") /
        sum(discPrice).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  val q257Sql: String = sqlSelect(
    s"""SELECT o_year,
       |  CAST(SUM(CASE WHEN nation = 'NATION_6' THEN volume END)
       |    AS DOUBLE) / CAST(SUM(volume) AS DOUBLE) AS mkt_share
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    $discPriceSql AS volume, n2.n_name AS nation
       |  FROM part, supplier, lineitem, orders, customer,
       |    nation n1, nation n2, region
       |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
       |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
       |    AND c_nationkey = n1.n_nationkey
       |    AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
       |    AND s_nationkey = n2.n_nationkey
       |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
       |      AND TIMESTAMP '1997-12-31'
       |    AND p_type = 'ECONOMY') all_nations
       |GROUP BY o_year ORDER BY o_year""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q9 — product type profit: lineitem⋈partsupp on the COMPOSITE
  // (partkey, suppkey) key; the cost leg is exact BIGINT arithmetic
  // (integer-valued supplycost × integral quantity) subtracted inside
  // one decimal expression.
  // ─────────────────────────────────────────────────────────────────
  val q258Tpch09: Q = (s, d) => {
    val amount = discPrice -
      (col("ps_supplycost").cast("long") * col("l_quantity").cast("long"))
        .cast(DecimalType(18, 4))
    part(s, d).filter(col("p_name").like("%red%"))
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .join(partsupp(s, d),
        col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
      .join(supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q258Sql: String = sqlSelect(
    s"""SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
       |FROM (
       |  SELECT n_name AS nation,
       |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    $discPriceSql - CAST(CAST(ps_supplycost AS BIGINT) *
       |      CAST(l_quantity AS BIGINT) AS DECIMAL(18,4)) AS amount
       |  FROM part, supplier, lineitem, partsupp, orders, nation
       |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
       |    AND ps_partkey = l_partkey AND p_partkey = l_partkey
       |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
       |    AND p_name LIKE '%red%') profit
       |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q10 — returned item reporting: quarter-windowed star join, top-20
  // customers by lost revenue, the derived contact columns in the
  // output.
  // ─────────────────────────────────────────────────────────────────
  val q259Tpch10: Q = (s, d) =>
    customerX(s, d)
      .join(orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-10-01") &&
          col("o_orderdate") < ts("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "c_phone", "n_name",
        "c_address", "c_comment")
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  val q259Sql: String = sqlSelect(
    s"""SELECT c_custkey, c_name, c_acctbal, c_phone, n_name, c_address,
       |  c_comment, CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
       |FROM customer_x, orders, lineitem, nation
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND o_orderdate >= TIMESTAMP '1996-10-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       |GROUP BY c_custkey, c_name, c_acctbal, c_phone, n_name,
       |  c_address, c_comment
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q11 — important stock identification: HAVING against an
  // uncorrelated scalar total. Exact BIGINT value arithmetic; the
  // fraction (1/200) is expressed as an integer cross-multiplication
  // so no float threshold can drift between engines.
  // ─────────────────────────────────────────────────────────────────
  val q260Tpch11: Q = (s, d) => {
    val natValue = partsupp(s, d)
      .join(supplier(s, d), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("ps_partkey"),
        (col("ps_supplycost").cast("long") * col("ps_availqty"))
          .as("part_value"))
    // r21 (guide §5): the HAVING total previously re-ran the whole
    // partsupp⋈supplier⋈nation tree under the scalar subquery. The
    // grand total IS the sum of the part-grain sums (exact BIGINT —
    // regrouping an integer sum is associative, bit-identical), so
    // aggregate once to part grain, persist that bounded frame
    // (≤ |part| rows), and fold the total from it.
    val partAgg = graft.core.CacheScope.track(natValue
      .groupBy("ps_partkey")
      .agg(sum(col("part_value")).as("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val total = partAgg.select(sum(col("value"))).scalar()
    partAgg
      .filter(col("value") * 200 > total)
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  val q260Sql: String = sql(
    """nat_value AS (
      |  SELECT ps_partkey,
      |    CAST(ps_supplycost AS BIGINT) * ps_availqty AS part_value
      |  FROM partsupp, supplier, nation
      |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_name = 'NATION_7')
      |SELECT ps_partkey, CAST(SUM(part_value) AS BIGINT) AS value
      |FROM nat_value
      |GROUP BY ps_partkey
      |HAVING SUM(part_value) * 200 > (SELECT SUM(part_value) FROM nat_value)
      |ORDER BY value DESC, ps_partkey""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q12 — shipping modes and order priority: the derived
  // shipmode/commit/receipt columns under the canonical three-way
  // date inequality chain, conditional counts per mode.
  // ─────────────────────────────────────────────────────────────────
  val q261Tpch12: Q = (s, d) => {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    orders(s, d)
      .join(lineitemX(s, d)
        .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
          col("l_commitdate") < col("l_receiptdate") &&
          col("l_shipdate") < col("l_commitdate") &&
          col("l_receiptdate") >= ts("1996-01-01") &&
          col("l_receiptdate") < ts("1997-01-01")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_shipmode")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_shipmode")
  }

  val q261Sql: String = sqlSelect(
    """SELECT l_shipmode,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem_x
      |WHERE o_orderkey = l_orderkey AND l_shipmode IN ('MAIL','SHIP')
      |  AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
      |  AND l_receiptdate >= TIMESTAMP '1996-01-01'
      |  AND l_receiptdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_shipmode ORDER BY l_shipmode""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q13 — customer distribution: LEFT OUTER with the comment
  // exclusion ON the join (pushed to the orders side pre-join), then
  // the two-level count-of-counts.
  // ─────────────────────────────────────────────────────────────────
  val q262Tpch13: Q = (s, d) =>
    customer(s, d)
      .join(ordersX(s, d)
        .filter(!col("o_comment").like("%special%requests%")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q262Sql: String = sqlSelect(
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders_x
      |    ON c_custkey = o_custkey
      |      AND o_comment NOT LIKE '%special%requests%'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q14 — promotion effect: conditional-sum ratio over one month,
  // 100 * (promo / total) with both sums exact.
  // ─────────────────────────────────────────────────────────────────
  val q263Tpch14: Q = (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-09-01") &&
        col("l_shipdate") < ts("1996-10-01"))
      .join(broadcast(partX(s, d)), col("l_partkey") === col("p_partkey"))
      .agg((lit(100) *
        (sum(when(col("p_type").like("PROMO%"), discPrice))
          .cast("double") /
          sum(discPrice).cast("double"))).as("promo_revenue"))

  val q263Sql: String = sqlSelect(
    s"""SELECT 100 * (CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
       |    THEN $discPriceSql END) AS DOUBLE) /
       |  CAST(SUM($discPriceSql) AS DOUBLE)) AS promo_revenue
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |  AND l_shipdate >= TIMESTAMP '1996-09-01'
       |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q15 — top supplier: the view-over-aggregate with an equality on
  // MAX(total_revenue). The equality runs on the EXACT decimal sums
  // (never the double projections), so ties and float drift are
  // structurally impossible; the double cast happens only on output.
  // ─────────────────────────────────────────────────────────────────
  val q264Tpch15: Q = (s, d) => {
    // r21 (guide §5): the MAX scalar subquery previously re-ran the
    // whole lineitem scan+aggregate; persist the supplier-grain view
    // (bounded by |supplier|) so both the max fold and the join read
    // one execution.
    val revenue0 = graft.core.CacheScope.track(lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(discPrice).as("total_revenue"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val maxRev = revenue0.select(max(col("total_revenue"))).scalar()
    supplierX(s, d)
      .join(revenue0, col("s_suppkey") === col("supplier_no"))
      .filter(col("total_revenue") === maxRev)
      .select(col("s_suppkey"), col("s_name"), col("s_address"),
        col("s_phone"), col("total_revenue").cast("double")
          .as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q264Sql: String = sql(
    s"""revenue0 AS (
       |  SELECT l_suppkey AS supplier_no,
       |    SUM($discPriceSql) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, s_address, s_phone,
       |  CAST(total_revenue AS DOUBLE) AS total_revenue
       |FROM supplier_x, revenue0
       |WHERE s_suppkey = supplier_no
       |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
       |ORDER BY s_suppkey""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q16 — parts/supplier relationship: NOT IN over the complainer
  // suppliers (non-null RHS → plain anti join), COUNT(DISTINCT) per
  // brand/type/size.
  // ─────────────────────────────────────────────────────────────────
  val q265Tpch16: Q = (s, d) => {
    val complainers = supplierX(s, d)
      .filter(col("s_comment").like("%Customer%Complaints%"))
      .select("s_suppkey")
    partsupp(s, d)
      .join(partX(s, d)
        .filter(col("p_brand") =!= "Brand#5" &&
          !col("p_type").like("MEDIUM%") &&
          col("p_size").isin(1, 5, 9, 15, 19, 25, 36, 49)),
        col("p_partkey") === col("ps_partkey"))
      .filter(!col("ps_suppkey").isin(complainers))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q265Sql: String = sqlSelect(
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      |FROM partsupp, part_x
      |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#5'
      |  AND p_type NOT LIKE 'MEDIUM%'
      |  AND p_size IN (1, 5, 9, 15, 19, 25, 36, 49)
      |  AND ps_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier_x
      |    WHERE s_comment LIKE '%Customer%Complaints%')
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q17 — small-quantity-order revenue: the per-part 20%-of-average
  // threshold as correlated scalar subqueries in EXACT integer form
  // (qty·5·cnt < sum ⇔ qty < 0.2·avg; l_quantity is integral), the
  // q203 contract. Decorrelates to one partkey-grain aggregate.
  // ─────────────────────────────────────────────────────────────────
  val q266Tpch17: Q = (s, d) => {
    def perPart(a: Column) = lineitem(s, d)
      .filter(col("l_partkey") === col("pk17").outer())
      .select(a).scalar()
    val cnt = perPart(count(lit(1)))
    val tot = perPart(sum(col("l_quantity").cast("long")))
    lineitem(s, d).withColumnRenamed("l_partkey", "pk17")
      .join(broadcast(partX(s, d)
        .filter(col("p_brand") === "Brand#20" &&
          col("p_container") === "SM BOX")),
        col("pk17") === col("p_partkey"))
      .filter(col("l_quantity").cast("long") * 5 * cnt < tot)
      .agg((sum(dec12(col("l_extendedprice"))).cast("double") / 7)
        .as("avg_yearly"))
  }

  val q266Sql: String = sqlSelect(
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
      |    AS DOUBLE) / 7 AS avg_yearly
      |FROM lineitem l1, part_x
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#20'
      |  AND p_container = 'SM BOX'
      |  AND CAST(l_quantity AS BIGINT) * 5 *
      |    (SELECT COUNT(*) FROM lineitem l2
      |     WHERE l2.l_partkey = l1.l_partkey)
      |  < (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem l2
      |     WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q18 — large volume customer: IN over a HAVING'd aggregate → semi
  // join on orderkey; the outer re-aggregates per order.
  // ─────────────────────────────────────────────────────────────────
  val q267Tpch18: Q = (s, d) => {
    val big = lineitem(s, d).groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("sq"))
      .filter(col("sq") > 300).select("l_orderkey")
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d).withColumnRenamed("l_orderkey", "lk"),
        col("o_orderkey") === col("lk"))
      .filter(col("o_orderkey").isin(big))
      .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice")
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp"))
          .as("o_orderdate_ms"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q267Sql: String = sqlSelect(
    """SELECT c_name, c_custkey, o_orderkey,
      |  epoch_ms(o_orderdate) AS o_orderdate_ms, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |    HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q19 — discounted revenue: the canonical disjunction of three
  // brand/container/quantity/size envelopes over shared shipmode/
  // shipinstruct predicates — one broadcast join, the OR evaluated
  // post-join in codegen, no plan blowup.
  // ─────────────────────────────────────────────────────────────────
  val q268Tpch19: Q = (s, d) => {
    def branch(brand: String, prefix: String, qlo: Int, qhi: Int,
        smax: Int): Column =
      col("p_brand") === brand &&
        col("p_container").isin(
          containerIn(prefix): _*) &&
        col("l_quantity") >= qlo && col("l_quantity") <= qhi &&
        col("p_size") >= 1 && col("p_size") <= smax
    lineitemX(s, d)
      .filter(col("l_shipmode").isin("AIR", "REG AIR") &&
        col("l_shipinstruct") === "DELIVER IN PERSON")
      .join(broadcast(partX(s, d)), col("p_partkey") === col("l_partkey"))
      .filter(branch("Brand#1", "SM", 1, 15, 20) ||
        branch("Brand#2", "MED", 10, 25, 30) ||
        branch("Brand#3", "LG", 20, 35, 40))
      .agg(sum(discPrice).cast("double").as("revenue"))
  }

  private def containerIn(prefix: String): Seq[Any] =
    TpchLayer.containerTypes.map(t => s"$prefix $t")

  private def containerInSql(prefix: String): String =
    containerIn(prefix).map(c => s"'$c'").mkString("(", ",", ")")

  val q268Sql: String = sqlSelect(
    s"""SELECT CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
       |FROM lineitem_x, part_x
       |WHERE p_partkey = l_partkey
       |  AND l_shipmode IN ('AIR','REG AIR')
       |  AND l_shipinstruct = 'DELIVER IN PERSON'
       |  AND ((p_brand = 'Brand#1'
       |      AND p_container IN ${containerInSql("SM")}
       |      AND l_quantity >= 1 AND l_quantity <= 15
       |      AND p_size BETWEEN 1 AND 20)
       |    OR (p_brand = 'Brand#2'
       |      AND p_container IN ${containerInSql("MED")}
       |      AND l_quantity >= 10 AND l_quantity <= 25
       |      AND p_size BETWEEN 1 AND 30)
       |    OR (p_brand = 'Brand#3'
       |      AND p_container IN ${containerInSql("LG")}
       |      AND l_quantity >= 20 AND l_quantity <= 35
       |      AND p_size BETWEEN 1 AND 40))""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q20 — potential part promotion: the nested IN (parts by name) +
  // correlated scalar (half the shipped quantity) inside an IN over
  // suppliers — three subquery layers, all decorrelated (TpchPlanSpec).
  // The NULL scalar (no shipments in the window) excludes the row on
  // both engines, the canonical three-valued behavior.
  // ─────────────────────────────────────────────────────────────────
  val q269Tpch20: Q = (s, d) => {
    val redParts = part(s, d).filter(col("p_name").like("red%"))
      .select("p_partkey")
    val shipped = lineitem(s, d).filter(
      col("l_partkey") === col("psk_p").outer() &&
        col("l_suppkey") === col("psk_s").outer() &&
        col("l_shipdate") >= ts("1995-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .select(sum(col("l_quantity").cast("long"))).scalar()
    val candidates = partsupp(s, d)
      .withColumnRenamed("ps_partkey", "psk_p")
      .withColumnRenamed("ps_suppkey", "psk_s")
      .filter(col("psk_p").isin(redParts))
      .filter(col("ps_availqty") * 2 > shipped)
      .select("psk_s")
    supplierX(s, d)
      .join(broadcast(nation(s, d).filter(col("n_name") === "NATION_4")),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("s_suppkey").isin(candidates))
      .select("s_name", "s_address")
      .orderBy("s_name")
  }

  val q269Sql: String = sqlSelect(
    """SELECT s_name, s_address
      |FROM supplier_x, nation
      |WHERE s_suppkey IN (
      |    SELECT ps_suppkey FROM partsupp
      |    WHERE ps_partkey IN (
      |        SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |      AND ps_availqty * 2 > (
      |        SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem
      |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      |          AND l_shipdate >= TIMESTAMP '1995-01-01'
      |          AND l_shipdate < TIMESTAMP '1998-01-01'))
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
      |ORDER BY s_name""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q21 — suppliers who kept orders waiting: EXISTS (another supplier
  // on the order) ∧ NOT EXISTS (another LATE supplier) — the
  // double-correlation with a non-equi suppkey disequality on both
  // branches → a semi + anti join pair on orderkey.
  // ─────────────────────────────────────────────────────────────────
  val q270Tpch21: Q = (s, d) => {
    // r21 (guide §5): the waiting side (l1) and the NOT EXISTS side
    // (l3) are the SAME late-lineitem slice of lineitem_x — share one
    // persisted frame projected to the two join keys (2 longs/row;
    // the full-width scan ran twice before). The anti join Catalyst
    // decorrelates l3 into is unchanged — it just reads the cache.
    val late = graft.core.CacheScope.track(lineitemX(s, d)
      .filter(col("l_receiptdate") > col("l_commitdate"))
      .select(col("l_orderkey"), col("l_suppkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val other = lineitem(s, d).filter(
      col("l_orderkey") === col("ok1").outer() &&
        col("l_suppkey") =!= col("sk1").outer())
    val otherLate = late.filter(
      col("l_orderkey") === col("ok1").outer() &&
        col("l_suppkey") =!= col("sk1").outer())
    late
      .withColumnRenamed("l_orderkey", "ok1")
      .withColumnRenamed("l_suppkey", "sk1")
      .join(orders(s, d).filter(col("o_orderstatus") === "F"),
        col("ok1") === col("o_orderkey"))
      .join(broadcast(supplier(s, d)
        .join(nation(s, d).filter(col("n_name") === "NATION_2"),
          col("s_nationkey") === col("n_nationkey"))),
        col("sk1") === col("s_suppkey"))
      .filter(other.exists() && !otherLate.exists())
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q270Sql: String = sqlSelect(
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem_x l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_receiptdate > l1.l_commitdate
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem_x l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_receiptdate > l3.l_commitdate)
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
      |GROUP BY s_name ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin)

  // ─────────────────────────────────────────────────────────────────
  // Q22 — global sales opportunity: phone-prefix cohort above the
  // positive-balance average (exact-sum/count double division), with
  // NO order activity since 1999 (every synthetic customer has SOME
  // order, so the canonical "never ordered" anti join is re-aimed at
  // a recency horizon — same NOT EXISTS decorrelation, non-empty
  // answer at every SF).
  // ─────────────────────────────────────────────────────────────────
  val q271Tpch22: Q = (s, d) => {
    val codes = Seq("13", "31", "23", "29", "30", "18", "17")
    // r21 (guide §5): the cohort feeds both the average-balance scalar
    // subquery and the main query — persist the phone-prefix slice
    // (bounded well below |customer|) so the customer scan runs once.
    val cohort = graft.core.CacheScope.track(customerX(s, d)
      .withColumn("cntrycode", substring(col("c_phone"), 1, 2))
      .filter(col("cntrycode").isin(codes: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val avgBal = cohort.filter(col("c_acctbal") > 0.0)
      .select((sum(money(col("c_acctbal"))).cast("double") /
        count(lit(1))).as("a")).scalar()
    val recent = orders(s, d).filter(
      col("o_custkey") === col("ck22").outer() &&
        col("o_orderdate") >= ts("1999-01-01"))
    cohort.withColumnRenamed("c_custkey", "ck22")
      .filter(col("c_acctbal") > avgBal)
      .filter(!recent.exists())
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"),
        sum(money(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy("cntrycode")
  }

  val q271Sql: String = sqlSelect(
    """SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |    AS totacctbal
      |FROM (
      |  SELECT substr(c_phone, 1, 2) AS cntrycode, c_acctbal, c_custkey
      |  FROM customer_x
      |  WHERE substr(c_phone, 1, 2)
      |      IN ('13','31','23','29','30','18','17')
      |    AND c_acctbal > (
      |      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |          / COUNT(*)
      |      FROM customer_x
      |      WHERE c_acctbal > 0.00 AND substr(c_phone, 1, 2)
      |        IN ('13','31','23','29','30','18','17'))) custsale
      |WHERE NOT EXISTS (
      |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)

  // ─────────────────────────────────────────────────────────────────

  val queries: Map[String, Q] = Map(
    "q250_tpch01" -> q250Tpch01,
    "q251_tpch02" -> q251Tpch02,
    "q252_tpch03" -> q252Tpch03,
    "q253_tpch04" -> q253Tpch04,
    "q254_tpch05" -> q254Tpch05,
    "q255_tpch06" -> q255Tpch06,
    "q256_tpch07" -> q256Tpch07,
    "q257_tpch08" -> q257Tpch08,
    "q258_tpch09" -> q258Tpch09,
    "q259_tpch10" -> q259Tpch10,
    "q260_tpch11" -> q260Tpch11,
    "q261_tpch12" -> q261Tpch12,
    "q262_tpch13" -> q262Tpch13,
    "q263_tpch14" -> q263Tpch14,
    "q264_tpch15" -> q264Tpch15,
    "q265_tpch16" -> q265Tpch16,
    "q266_tpch17" -> q266Tpch17,
    "q267_tpch18" -> q267Tpch18,
    "q268_tpch19" -> q268Tpch19,
    "q269_tpch20" -> q269Tpch20,
    "q270_tpch21" -> q270Tpch21,
    "q271_tpch22" -> q271Tpch22)

  val oracle: Map[String, String] = Map(
    "q250_tpch01" -> q250Sql,
    "q251_tpch02" -> q251Sql,
    "q252_tpch03" -> q252Sql,
    "q253_tpch04" -> q253Sql,
    "q254_tpch05" -> q254Sql,
    "q255_tpch06" -> q255Sql,
    "q256_tpch07" -> q256Sql,
    "q257_tpch08" -> q257Sql,
    "q258_tpch09" -> q258Sql,
    "q259_tpch10" -> q259Sql,
    "q260_tpch11" -> q260Sql,
    "q261_tpch12" -> q261Sql,
    "q262_tpch13" -> q262Sql,
    "q263_tpch14" -> q263Sql,
    "q264_tpch15" -> q264Sql,
    "q265_tpch16" -> q265Sql,
    "q266_tpch17" -> q266Sql,
    "q267_tpch18" -> q267Sql,
    "q268_tpch19" -> q268Sql,
    "q269_tpch20" -> q269Sql,
    "q270_tpch21" -> q270Sql,
    "q271_tpch22" -> q271Sql)
}
