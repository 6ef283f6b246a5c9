package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway volume/phase probe for the prefix-filter pair join
  * (q000's pairs0.7 build) — optimization-round instrumentation only.
  */
object SnapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](l: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"[probe] $l ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val theta = "0.7"
    // replicate dfSortedSets inline
    val alphaToks = array_remove(split(lower(col("text")), "[^a-z]+"), "")
    val base = Tables.documents(spark, sfDir).withColumn("ts", alphaToks)
      .filter(size(col("ts")) >= 2)
    val sh = base.select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ts")) - 1),
        i => concat(element_at(col("ts"), i), lit(" "),
          element_at(col("ts"), i + 1)))).as("tk"))
      .distinct()
    t("n_shingle_rows")(println("  = " + sh.count()))
    t("n_vocab")(println("  = " + sh.select("tk").distinct().count()))
    val dfreq = sh.groupBy(col("tk")).agg(count(lit(1)).as("df"))
    val srt = sh.join(broadcast(dfreq), "tk")
      .groupBy(col("doc_id"))
      .agg(expr("transform(array_sort(collect_list(struct(df, tk)))," +
        " x -> x.tk)").as("st"))
      .withColumn("sz", size(col("st")))
      .persist()
    t("srt build")(println("  = " + srt.count()))
    t("sz stats")(srt.agg(min("sz"), avg("sz"), max("sz")).show())
    val pre = srt.select(col("doc_id"), col("sz"),
      posexplode(expr(
        s"slice(st, 1, sz - CAST(ceil($theta * sz) AS INT) + 1)"))
        .as(Seq("p0", "tk")))
      .select(col("doc_id"), col("sz"), (col("p0") + 1).as("p"), col("tk"))
      .persist()
    t("n_prefix_rows")(println("  = " + pre.count()))
    t("prefix df dist")(pre.groupBy("tk").count()
      .agg(count(lit(1)).as("n_pref_vocab"), sum(col("count") * col("count")).as("sum_sq"),
        max("count")).show())
    val joined = pre.select(col("doc_id").as("da"), col("sz").as("sza"),
        col("p").as("pa"), col("tk"))
      .join(pre.select(col("doc_id").as("db"), col("sz").as("szb"),
        col("p").as("pb"), col("tk")), Seq("tk"))
    t("raw join rows")(println("  = " + joined.count()))
    val filtered = joined.filter(col("da") < col("db") &&
        col("szb") >= expr(s"CAST(ceil($theta * sza) AS INT)") &&
        col("sza") >= expr(s"CAST(ceil($theta * szb) AS INT)") &&
        least(col("sza") - col("pa") + 1, col("szb") - col("pb") + 1) >=
          expr(s"CAST(ceil($theta * greatest(sza, szb)) AS INT)"))
    t("filtered rows")(println("  = " + filtered.count()))
    t("cand pairs")(println("  = " +
      filtered.select(col("da"), col("db")).distinct().count()))
    spark.stop()
  }
}
