package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed readers for the driver-generated parquet fixture tables
  * (`TESTDATA.md`, schemas in `FIXTURES.md`). All queries read through
  * here so that table access is uniform: a plain parquet scan whose
  * filters/projections Catalyst pushes into the scan (`PushedFilters`,
  * `ReadSchema`). At 100 TB the same call sites would point at a
  * partitioned table root; nothing in the query code assumes local
  * paths beyond the `sfDir` argument.
  *
  * The reference's only source was a `TextInputFormat` line scan
  * (reference `driver.java:161,164`); parquet + column pruning replaces
  * it per SURVEY §2.A A1.
  */
object Tables {
  /** Session-level reader configuration every graft entry point applies
    * at session build (Verify/Bench/Smoke/specs). Readers in this object
    * are pure — none mutates session state as a side effect.
    */
  val sessionConfs: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def configure(b: SparkSession.Builder): SparkSession.Builder =
    sessionConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright; it is read as a raw nanosecond epoch long
    * instead (`spark.sql.legacy.parquet.nanosAsLong`, set once at
    * session construction — see [[Tables.configure]]) keeping full ns
    * precision. Queries do ordering/gap arithmetic on the long; an
    * equivalent micros timestamp is derivable via
    * `timestamp_micros(ts div 1000)` when interval semantics are needed.
    */
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One registrable slice of the engine: named queries plus (where the
  * semantics are deterministic ANSI SQL) a DuckDB oracle twin. Modules
  * are concatenated by [[SparkEntry]]. Contract per SURVEY §2.B:
  * every oracle query ends with a total ORDER BY, aliases every
  * computed column identically on both sides, and rounds/decimal-casts
  * float aggregates so both engines agree bit-for-bit.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
