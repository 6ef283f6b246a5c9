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
    * prop job emitted) and that key IS the id — stable under any file
    * split. Raw layer-0 lines have no key, so ids fall back to
    * `monotonically_increasing_id()`, which is stable only for a fixed
    * file layout (the same property the reference's byte-offset keys
    * had); pipelines needing layout-independent determinism at layer 0
    * should ingest from a keyed source (e.g. the parquet fixtures'
    * `vec_id`). Fallback ids are offset by 2^40 to separate them from
    * keyed ids, but the separation is bounded, not absolute:
    * monotonically_increasing_id packs partitionId into bits 33+, so a
    * scan with >= 128 partitions already exceeds the offset, and keyed
    * byte offsets beyond ~1 TB of layer-k text collide back into the
    * fallback range. Directories mixing keyed and un-keyed files at
    * that scale must ingest layer 0 from a keyed source instead of
    * relying on this fallback.
    */
  def read(spark: SparkSession, path: String, numdims: Int): DataFrame = {
    val fallbackBase = 1L << 40
    val lines = spark.read.text(path)
      .select(
        when(col("value").contains("\t"),
          substring_index(col("value"), "\t", 1).cast("long"))
          .otherwise(monotonically_increasing_id() + fallbackBase).as("row_id"),
        col("value"))
    val payload = when(col("value").contains("\t"),
      substring_index(col("value"), "\t", -1)).otherwise(col("value"))
    val toks = filter(split(trim(payload), "\\s+"), t => t =!= "")
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
