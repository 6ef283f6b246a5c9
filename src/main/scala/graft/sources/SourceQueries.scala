package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables}

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

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      // Files.walk holds directory handles open until closed
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // parquet → tab-separated CSV (parallel part files, like the
    // reference's A2 sink) → schema'd CSV scan → aggregate. The
    // aggregate is materialized before the staging dir is deleted, so
    // the returned frame owns its data and the query leaves no files
    // behind.
    "q77_csv_roundtrip" -> ((s, d) => {
      val stage = Files.createTempDirectory("q77_csv")
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
            round(sum(col("l_extendedprice")), 2).as("sum_price"))
          .orderBy(col("l_returnflag"))
        s.createDataFrame(
          java.util.Arrays.asList(back.collect(): _*), back.schema)
      } finally deleteRecursively(stage)
    })
  )

  def oracle: Map[String, String] = Map(
    // The oracle reads the original parquet: a lossless round-trip is
    // exactly "the CSV detour changes nothing".
    "q77_csv_roundtrip" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
