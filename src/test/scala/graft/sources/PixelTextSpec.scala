package graft.sources

import java.nio.file.Files
import graft.SparkSpec

/** Round-trip + fidelity tests for the reference text formats. */
class PixelTextSpec extends SparkSpec {

  import spark.implicits._

  test("layer-0 lines parse and normalize by /255") {
    val dir = Files.createTempDirectory("px0")
    Files.writeString(dir.resolve("part-0"), "0 128 255\n51 102 204\n")
    // layer-0 ids are (file, offset) hashes — content, not order, is
    // the contract
    val got = PixelText.read(spark, dir.toString, 3)
      .select("x").as[Array[Double]].collect().sortBy(_.head)
    assert(got(0).sameElements(Array(0.0, 128 / 255.0, 1.0)))
    assert(got(1).sameElements(Array(0.2, 0.4, 0.8)))
  }

  test("layer-0 fallback ids are deterministic across re-reads, unique, " +
    "and disjoint (negative) from keyed layer-k ids by construction") {
    val dir = Files.createTempDirectory("pxid")
    val lines = (0 until 64).map(i => s"$i ${(i * 2) % 256} ${(i * 3) % 256}")
    Files.writeString(dir.resolve("part-0"), lines.mkString("", "\n", "\n"))
    Files.writeString(dir.resolve("part-1"), "7 7 7\n9 9 9\n")
    def idMap() = PixelText.read(spark, dir.toString, 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    val a = idMap()
    val b = idMap() // independent job → different task/partition ids
    assert(a == b, "ids must not depend on the read's execution")
    assert(a.size == 66, "ids must be unique across files")
    assert(a.keys.forall(_ < 0), "fallback ids carry the sign bit")
    // same content at the same offset in DIFFERENT files → distinct ids
    val dir2 = Files.createTempDirectory("pxid2")
    Files.writeString(dir2.resolve("part-0"), "7 7 7\n")
    Files.writeString(dir2.resolve("part-1"), "7 7 7\n")
    assert(PixelText.read(spark, dir2.toString, 3)
      .select("id").distinct().count() == 2)
    // keyed layer-k ids pass through untouched, non-negative
    val dirK = Files.createTempDirectory("pxidk")
    Files.writeString(dirK.resolve("part-0"), "0\t1 2 3\n4096\t4 5 6\n")
    val keyed = PixelText.read(spark, dirK.toString, 3)
      .select("id").as[Long].collect().sorted
    assert(keyed.sameElements(Array(0L, 4096L)))
  }

  test("layer-k tab-prefixed lines drop the offset key (format detector)") {
    val dir = Files.createTempDirectory("pxk")
    Files.writeString(dir.resolve("part-0"), "1234\t255 0\n5678\t0 255\n")
    val got = PixelText.read(spark, dir.toString, 2)
      .orderBy("id").select("x").as[Array[Double]].collect()
    assert(got(0).sameElements(Array(1.0, 0.0)))
    assert(got(1).sameElements(Array(0.0, 1.0)))
  }

  test("arity mismatch fails the job like the reference's parser") {
    val dir = Files.createTempDirectory("pxbad")
    Files.writeString(dir.resolve("part-0"), "1 2 3\n")
    val ex = intercept[Exception] {
      PixelText.read(spark, dir.toString, 4).collect()
    }
    assert(ex.getMessage.contains("arity") ||
      ex.getCause != null && ex.getCause.getMessage.contains("arity"))
  }

  test("write → read round-trips through the 0-255 quantized channel") {
    val dir = Files.createTempDirectory("pxrt").toString + "/out"
    val data = Seq((0L, Array(0.0, 0.5, 1.0)), (1L, Array(0.25, 0.75, 0.1)))
    PixelText.write(spark.createDataset(data).toDF("id", "x"), dir)
    val back = PixelText.read(spark, dir, 3)
      .select("x").as[Array[Double]].collect()
    // quantize loses ≤ 1/255 per value (SURVEY §5.3 round-trip bound)
    for (row <- back; v <- row) assert(v >= 0 && v <= 1)
    val all = back.flatten.sorted
    val orig = data.flatMap(_._2).sorted
    all.zip(orig).foreach { case (b, o) => assert(math.abs(b - o) <= 1.0 / 255) }
  }
}
