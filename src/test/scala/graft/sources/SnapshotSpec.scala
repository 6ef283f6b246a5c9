package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural gates for [[SnapshotTable]] — the properties q363's
  * relational oracle cannot see: copy-on-write FILE REUSE (an upsert
  * rewrites only the buckets that hold matched keys), historical-
  * version immutability under later commits, and exact upsert
  * semantics per key.
  */
class SnapshotSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable() = {
    val t = graft.Scratch.dir("snapspec_")
    val df = (0L until 64L)
      .map(i => (i, s"text number $i", i * 10))
      .toDF("id", "text", "score")
    SnapshotTable.init(spark, t, df, "id")
    (t, df)
  }

  test("readAsOf(0) round-trips init exactly") {
    val (t, df) = freshTable()
    try {
      val back = SnapshotTable.readAsOf(spark, t, 0)
      assert(back.exceptAll(df).count() == 0 &&
        df.exceptAll(back).count() == 0)
    } finally graft.Scratch.deleteTree(t)
  }

  test("merge rewrites ONLY the buckets holding matched keys — " +
    "untouched bucket files are reused by reference") {
    val (t, _) = freshTable()
    try {
      // keys 0 and 8 both live in bucket 0 (mod 8); key 3 in bucket 3
      val upd = Seq((0L, "updated zero", 999L), (3L, "updated three", 999L))
        .toDF("id", "text", "score")
      val v1 = SnapshotTable.merge(spark, t, upd, "id")
      assert(v1 == 1)
      val m = SnapshotTable.manifest(spark, t)
      val removedAt1 = m.filter(col("version") === 1 &&
        col("action") === "remove").select("path")
        .collect().map(_.getString(0)).toSet
      val addedAt1 = m.filter(col("version") === 1 &&
        col("action") === "add").select("path")
        .collect().map(_.getString(0)).toSet
      assert(removedAt1.size == 2 && addedAt1.size == 2,
        s"expected exactly buckets 0 and 3 rewritten: " +
          s"removed=$removedAt1 added=$addedAt1")
      assert(removedAt1.forall(p =>
        p.contains("v0/__b=0") || p.contains("v0/__b=3")))
      assert(addedAt1.forall(p =>
        p.contains("v1/__b=0") || p.contains("v1/__b=3")))
      // the other 6 v0 bucket dirs remain live at v1 — reuse, not copy
      val liveV1 = SnapshotTable.readAsOf(spark, t, 1)
        .inputFiles.map(_.replace("file:", "")).toSet
      assert(liveV1.exists(_.contains("v0/__b=1")),
        "untouched bucket 1 was not reused by reference")
    } finally graft.Scratch.deleteTree(t)
  }

  test("historical versions are immutable under later commits, and " +
    "upsert semantics are exact per key") {
    val (t, df) = freshTable()
    try {
      val v0Before = SnapshotTable.readAsOf(spark, t, 0).collect()
        .map(_.toSeq).toSet
      SnapshotTable.merge(spark, t,
        Seq((5L, "five v1", 1L), (100L, "new hundred", 2L))
          .toDF("id", "text", "score"), "id")
      SnapshotTable.merge(spark, t,
        Seq((5L, "five v2", 3L)).toDF("id", "text", "score"), "id")
      // v0 unchanged after two commits
      val v0After = SnapshotTable.readAsOf(spark, t, 0).collect()
        .map(_.toSeq).toSet
      assert(v0After == v0Before, "time travel to v0 drifted")
      // v1: key 5 replaced once, key 100 inserted, count = 65
      val v1 = SnapshotTable.readAsOf(spark, t, 1)
      assert(v1.count() == 65)
      assert(v1.filter(col("id") === 5).select("text").head().getString(0)
        == "five v1")
      assert(v1.filter(col("id") === 100).count() == 1)
      // v2: key 5 replaced again, everything else as v1
      val v2 = SnapshotTable.readAsOf(spark, t, 2)
      assert(v2.count() == 65)
      assert(v2.filter(col("id") === 5).select("text").head().getString(0)
        == "five v2")
      assert(v2.filter(col("id") =!= 5)
        .exceptAll(v1.filter(col("id") =!= 5)).count() == 0)
      assert(SnapshotTable.currentVersion(spark, t) == 2)
    } finally graft.Scratch.deleteTree(t)
  }
}
