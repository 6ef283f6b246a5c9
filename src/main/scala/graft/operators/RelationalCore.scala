package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryModule, Tables}

/** Core scan/filter/project/aggregate/sort operators — the relational
  * re-expression of the reference's A1/A4/A9/A10/A12 operator family
  * (SURVEY §2.A; reference `rbmmapper.java:86-119` parse/normalize,
  * `rbmreducer.java:20-30` per-key sum, `driver.java:172-213` global
  * merge, `propreducer.java:13-24` sort-by-key).
  *
  * Oracle-parity conventions (SURVEY §2.B notes):
  *  - money sums go through DECIMAL(20,4) so both engines sum exactly
  *    (double summation order is engine-dependent; decimals are not),
  *    then cast back to double for a stable output dtype;
  *  - `l_quantity` is integer-valued, so plain double sums are exact;
  *  - every query ends with a total ORDER BY.
  */
object RelationalCore extends QueryModule {

  /** Order-independent exact sum of a monetary double column. Only for
    * SOURCE columns (≤4 decimals exact): casting a double PRODUCT to
    * decimal is engine-dependent at its noise digits — use [[revenue]]
    * for derived money terms.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(20, 4))).cast("double")
  /** DuckDB twin of [[dsum]]. */
  def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(20,4))) AS DOUBLE)"

  /** Exact TPC-H revenue term `price * (1 - discount)`: the 2-dp
    * source columns cast to DECIMAL(12,2) BEFORE the multiply, so the
    * product is exact decimal on both engines. Casting the double
    * product instead is NOT portable: Spark rounds the double's
    * shortest decimal representation, DuckDB the exact binary value —
    * they disagree at the product's noise digits, while 2-dp source
    * data casts identically on both (noise ~1e-13 « 0.005).
    */
  def revenue(price: Column, discount: Column): Column = {
    val dec = DecimalType(12, 2)
    price.cast(dec) * (lit(1).cast(dec) - discount.cast(dec))
  }
  /** DuckDB twin of [[revenue]]. */
  def revenueSql(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(12,2)) * " +
      s"(CAST(1 AS DECIMAL(12,2)) - CAST($discount AS DECIMAL(12,2)))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1+A4: scan + projection; Catalyst prunes the parquet scan to the
    // 4 referenced columns (ReadSchema) — the reference read whole text
    // lines per record (rbmmapper.java:86).
    "q01_scan_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture data —
        // sort on every output column so tied rows are identical rows.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
    }),

    // A4's validity checks as relational predicates; compound AND/OR.
    // The filter is pushed into the parquet scan (PushedFilters).
    "q02_filter_predicate" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter((col("l_quantity") >= 30 && col("l_discount") <= 0.02) ||
          (col("l_returnflag") === "R" && col("l_linestatus") === "F"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_returnflag"), col("l_linestatus"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_returnflag"), col("l_linestatus"))
    }),

    // A4 normalize (/255-style scaling, rbmmapper.java:116-119) + cast.
    // Pure narrow projection: zero shuffles, whole-stage codegen.
    "q03_normalize_scale" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") / lit(50.0)).as("norm_qty"),
          col("l_quantity").cast("int").as("qty_int"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("norm_qty"),
          col("net_price"))
    }),

    // A9: shuffle + hash aggregation per key. Spark's HashAggregateExec
    // does map-side partial aggregation automatically — the combiner the
    // reference never registered (driver.java:152-162).
    "q05_groupby_sum" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A10: global aggregate with fixed denominator (driver.java:204:
    // W[k] += sum/numCase, numCase=60000).
    "q06_grand_agg_scaled" -> ((s, d) => {
      Tables.lineitem(s, d)
        .agg((sum(col("l_quantity")) / lit(60000.0)).as("scaled_qty"),
          avg(col("l_quantity")).as("avg_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("cnt"))
    }),

    // A12: the prop job's implicit framework sort-by-offset
    // (propreducer.java:13-24) as an explicit range-partitioned sort.
    "q07_sort_by_key" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
        .orderBy(col("od"), col("o_orderkey"))
    }),

    // A5/A11 sigmoid — expressed as builtin codegen'd arithmetic, no UDF
    // (1/(1+exp(-x)) compiles into whole-stage codegen).
    "q09_sigmoid_udf" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          round(lit(1.0) / (lit(1.0) + exp(-(col("value") / lit(100.0)))), 6).as("sig"))
        .orderBy(col("event_id"))
    }),

    // A11 quantize: (int)(p*255) (propmapper.java:156). floor() is used
    // explicitly because Spark's double→int cast truncates while
    // DuckDB's rounds — floor agrees everywhere.
    "q10_quantize" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          floor(lit(255.0) / (lit(1.0) + exp(-(col("value") / lit(100.0)))))
            .cast("int").as("q"))
        .orderBy(col("event_id"))
    }),

    // A10 as relational mean: avg of per-position embedding values keyed
    // by weight id — the driver's mean-of-gradients update shape.
    "q13_mean_update" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("weight_id", "val")))
        .groupBy(col("weight_id"))
        .agg(round(avg(col("val")), 6).as("mean_val"),
          count(lit(1)).as("cnt"))
        .orderBy(col("weight_id"))
    }),

    // A13: driver-side iteration. k=3 refinement steps built as a loop;
    // the steps are narrow projections so Catalyst fuses them into one
    // codegen stage — the Spark-correct answer to the reference's
    // one-MapReduce-job-per-iteration (driver.java:90-219).
    "q14_iter_convergence" -> ((s, d) => {
      var x: Column = col("l_quantity")
      for (_ <- 1 to 3) x = x / lit(2.0) + lit(1.0)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), x.as("x_iter"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("x_iter"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q02_filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE (l_quantity >= 30 AND l_discount <= 0.02)
        |   OR (l_returnflag = 'R' AND l_linestatus = 'F')
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        |  l_returnflag, l_linestatus""".stripMargin,

    "q03_normalize_scale" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity / 50.0 AS norm_qty,
        |  CAST(l_quantity AS INT) AS qty_int,
        |  l_extendedprice * (1.0 - l_discount) AS net_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, norm_qty, net_price""".stripMargin,

    "q05_groupby_sum" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM(l_quantity) AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_price,
         |  COUNT(*) AS cnt
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q06_grand_agg_scaled" ->
      s"""SELECT SUM(l_quantity) / 60000.0 AS scaled_qty,
         |  AVG(l_quantity) AS avg_qty,
         |  MIN(l_quantity) AS min_qty,
         |  MAX(l_quantity) AS max_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_price,
         |  COUNT(*) AS cnt
         |FROM lineitem""".stripMargin,

    "q07_sort_by_key" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS od
        |FROM orders ORDER BY od, o_orderkey""".stripMargin,

    "q09_sigmoid_udf" ->
      """SELECT event_id, ROUND(1.0 / (1.0 + EXP(-(value / 100.0))), 6) AS sig
        |FROM events ORDER BY event_id""".stripMargin,

    "q10_quantize" ->
      """SELECT event_id,
        |  CAST(FLOOR(255.0 / (1.0 + EXP(-(value / 100.0)))) AS INT) AS q
        |FROM events ORDER BY event_id""".stripMargin,

    "q13_mean_update" ->
      """SELECT pos AS weight_id, ROUND(AVG(val), 6) AS mean_val, COUNT(*) AS cnt
        |FROM (SELECT CAST(unnest(range(len(embedding))) AS INT) AS pos,
        |             unnest(embedding) AS val
        |      FROM embeddings)
        |GROUP BY pos ORDER BY weight_id""".stripMargin,

    "q14_iter_convergence" ->
      """SELECT l_orderkey, l_linenumber,
        |  ((((((l_quantity / 2.0) + 1.0) / 2.0) + 1.0) / 2.0) + 1.0) AS x_iter
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, x_iter""".stripMargin
  )
}
