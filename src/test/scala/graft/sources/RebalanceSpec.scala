package graft.sources

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import graft.{Confs, Scratch, SparkSpec}

/** Pins q194's actual claim — REBALANCE bounds output file sizes under
  * key skew — which the oracle (result equality) cannot see: a hint
  * that stopped resolving would still aggregate correctly while
  * writing one giant hot file.
  */
class RebalanceSpec extends SparkSpec {

  private def parquetSizes(dir: Path): Seq[Long] = {
    val listing = Files.list(dir)
    try listing.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(Files.size(_)).toSeq
    finally listing.close()
  }

  test("rebalance splits the hot key's file and bounds every file; " +
    "the naive hash-clustered write does not") {
    val dir = Scratch.dir("rebalance_spec_")
    try {
      // advisory sized for sf0.001's ~6k lineitem rows: the advisory
      // gates COMPRESSED SHUFFLE bytes (~20KB total here), so it must
      // sit well under the hot flag's share of that, not of the
      // parquet output
      SourceQueries.stageSkewedSource(spark, sf001, s"$dir/src")
      Confs.withConfs(spark, SourceQueries.rebalanceConfs(advisory = "2k")) {
        SourceQueries.writeRebalanced(spark, s"$dir/src", s"$dir/reb")
        SourceQueries.writeHashClustered(spark, s"$dir/src", s"$dir/hash")
      }
      val reb = parquetSizes(dir.resolve("reb"))
      val hash = parquetSizes(dir.resolve("hash"))
      // the control concentrates the skew: its biggest file carries a
      // hot key whole, so it dwarfs the rebalanced maximum
      assert(hash.max > reb.max * 2,
        s"rebalance did not flatten the hot file: hash=${hash.sorted} reb=${reb.sorted}")
      // ...and the rebalanced layout spread the same rows over more,
      // similarly-sized files (split happened, not just renaming)
      assert(reb.size > hash.size,
        s"no split: reb has ${reb.size} files vs hash ${hash.size}")
      val rows = (p: String) => spark.read.parquet(p).count()
      assert(rows(s"$dir/reb") == rows(s"$dir/hash"), "row counts differ")
    } finally Scratch.deleteTree(dir)
  }
}
