package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader/writer for the reference's on-disk text formats (SURVEY §1.1,
  * FIXTURES §A) — the A1 text scan + A4 parse/normalize operators:
  *
  *  - layer-0 line: `p0 p1 … p_{d-1}` — whitespace-separated ints
  *    0–255 (reference `rbmmapper.java:86-92`);
  *  - layer-k (k>0) line: `offset\tv0 v1 … v_{h-1}` — the tab is the
  *    key/value separator TextOutputFormat wrote (`rbmmapper.java:93-97`);
  *  - values normalize to [0,1] via /255.0 (`rbmmapper.java:116-119`);
  *  - arity is validated against the declared dimensionality
  *    (`rbmmapper.java:108-114` throws on mismatch — here it is an
  *    `assert_true` column, failing the job the same way).
  *
  * The parse is pure declarative Spark (split/transform/cast): it
  * whole-stage-codegens and the scan parallelizes by line ranges, vs
  * the reference's one-record-at-a-time mapper parse.
  */
object PixelText {

  /** Read a pixel text directory/file into (`id` long, `x`
    * array&lt;double&gt;), auto-detecting the tab-prefixed layer-k form
    * per line — the reference's format detector branch.
    *
    * Id stability: layer-k lines carry their own key (the offset the
    * prop job emitted — a TextInputFormat byte offset, always ≥ 0) and
    * that key IS the id — stable under any file split. Raw layer-0
    * lines have no key, so the id is derived from the line's physical
    * coordinates: `xxhash64(file_path, byte_offset) | Long.MinValue`.
    * Both coordinates come from the Hadoop input split (the same
    * byte-offset key the reference's mapper received,
    * `rbmmapper.java:86`), so the id is stable under task retries,
    * `repartition`, and executor count — unlike
    * `monotonically_increasing_id()`, which bakes in the partition id.
    * Forcing the sign bit makes fallback ids NEGATIVE, disjoint from
    * the non-negative keyed ids by construction at any scale.
    * Uniqueness is 63-bit-hash probabilistic (~1e-2 collision odds at
    * 10^10 lines), not guaranteed — pipelines needing exact ids at
    * layer 0 should ingest from a keyed source (e.g. the parquet
    * fixtures' `vec_id`).
    */
  def read(spark: SparkSession, path: String, numdims: Int): DataFrame = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
    // newAPIHadoopFile instead of spark.read.text: the DataFrame text
    // source exposes no per-line byte offset, and a window row_number
    // over the file would need a single-partition sort per file. The
    // split's (path, offset) pair is free, exact, and retry-stable.
    val hrdd = spark.sparkContext.newAPIHadoopFile(path,
      classOf[TextInputFormat], classOf[LongWritable], classOf[Text])
      .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[LongWritable, Text]]
    val coords = hrdd.mapPartitionsWithInputSplit { (split, it) =>
      val file = split.asInstanceOf[FileSplit].getPath.toString
      // Text/LongWritable instances are reused by the record reader —
      // materialize per element before the iterator advances
      it.map { case (off, line) => (file, off.get(), line.toString) }
    }
    val sq = spark
    import sq.implicits._
    val lines = coords.toDF("file", "byte_off", "value")
      .select(
        when(col("value").contains("\t"),
          substring_index(col("value"), "\t", 1).cast("long"))
          .otherwise(xxhash64(col("file"), col("byte_off"))
            .bitwiseOR(lit(Long.MinValue))).as("row_id"),
        col("value"))
    val payload = when(col("value").contains("\t"),
      substring_index(col("value"), "\t", -1)).otherwise(col("value"))
    val toks = array_remove(split(trim(payload), "\\s+"), "")
    // the arity guard must live INSIDE the value path — a standalone
    // assert_true column would be pruned away by Catalyst
    val checked = when(size(toks) === numdims, toks)
      .otherwise(raise_error(concat(lit("arity mismatch: expected "),
        lit(numdims), lit(" got "), size(toks))))
    lines.select(col("row_id").as("id"),
      transform(checked, t => t.cast("double") / lit(255.0)).as("x"))
  }

  /** Write activations back in the reference's layer-k text form
    * (`offset\tv0 v1 …` with 0–255 ints — the A11 quantize +
    * TextOutputFormat sink, reference `propmapper.java:269-279`).
    */
  def write(df: DataFrame, path: String): Unit =
    df.select(concat_ws("\t", col("id"),
      concat_ws(" ",
        transform(col("x"), v => floor(v * 255.0).cast("int").cast("string"))))
      .as("value"))
      .write.mode("overwrite").text(path)
}
