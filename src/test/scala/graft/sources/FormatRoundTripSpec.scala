package graft.sources

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink format coverage beyond parquet + reference text: CSV
  * and JSON-lines round trips preserve the fixture data exactly when
  * read back with an explicit schema (never infer schemas at scale —
  * inference is a full extra pass over the data).
  */
class FormatRoundTripSpec extends SparkSpec {

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"rt_$fmt").toString + "/data"
    val orig = Tables.nation(spark, sf001)
    orig.write.mode("overwrite")
      .format(fmt).option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true")
      .schema(orig.schema)
      .load(dir)
    assert(back.schema == orig.schema, s"$fmt schema drift: ${back.schema}")
    val a = orig.orderBy("n_nationkey").collect().toSeq
    val b = back.orderBy("n_nationkey").collect().toSeq
    assert(a == b, s"$fmt round trip lost data")
  }

  test("csv round trip preserves data and explicit schema")(roundTrip("csv"))
  test("json round trip preserves data and explicit schema")(roundTrip("json"))
  test("orc round trip preserves data and explicit schema")(roundTrip("orc"))

  test("json source handles nested props the events table carries") {
    // events.props is a JSON string column; write it as real JSON and
    // read the nested field back with a declared schema
    val dir = Files.createTempDirectory("rt_props").toString + "/data"
    Tables.events(spark, sf001)
      .select(col("event_id"),
        from_json(col("props"), StructType.fromDDL("k INT")).as("p"))
      .write.mode("overwrite").json(dir)
    val back = spark.read
      .schema(StructType.fromDDL("event_id BIGINT, p STRUCT<k: INT>"))
      .json(dir)
    val direct = Tables.events(spark, sf001)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.get(1)))
    val nested = back.select(col("event_id"), col("p.k"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.get(1)))
    assert(direct.sameElements(nested))
  }
}
