package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Scratch, Tables}
import graft.operators.RelationalCore.{dsum, dsumSql}

/** Text-format source/sink round-trip as a registered query: the
  * reference's only I/O was tab-separated text via TextInputFormat /
  * TextOutputFormat (A1/A2, reference `driver.java:161-165`); this is
  * that pipeline re-expressed as a schema'd, parallel CSV write+read —
  * proving the engine reads back what it wrote with types intact.
  * (PixelText covers the reference's exact pixel formats; ORC
  * round-trips are spec-tested in SourcesSpec.)
  */
object SourceQueries extends QueryModule {

  private val csvSchema = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_returnflag", StringType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // parquet → tab-separated CSV (parallel part files, like the
    // reference's A2 sink) → schema'd CSV scan → aggregate. The
    // aggregate is materialized before the staging dir is deleted, so
    // the returned frame owns its data and the query leaves no files
    // behind. Staging lives on tmpfs (Scratch): the CSV detour is
    // deleted within this call, so disk I/O would be pure overhead.
    "q77_csv_roundtrip" -> ((s, d) => {
      val stage = Scratch.dir("q77_csv_")
      try {
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_quantity"), col("l_extendedprice"))
          .write.mode("overwrite").option("sep", "\t").csv(stage.toString)
        val back = s.read.schema(csvSchema).option("sep", "\t")
          .csv(stage.toString)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            // money sum through DECIMAL(20,4): merge-order-free
            round(dsum(col("l_extendedprice")), 2).as("sum_price"))
          .orderBy(col("l_returnflag"))
        s.createDataFrame(
          java.util.Arrays.asList(back.collect(): _*), back.schema)
      } finally Scratch.deleteTree(stage)
    })
  )

  def oracle: Map[String, String] = Map(
    // The oracle reads the original parquet: a lossless round-trip is
    // exactly "the CSV detour changes nothing".
    "q77_csv_roundtrip" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(${dsumSql("l_extendedprice")}, 2) AS sum_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
