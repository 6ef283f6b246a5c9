package graft

/** Keeps tools/query_manifest.txt in lock-step with the registry: the
  * dev-side oracle checker uses the manifest to detect queries that
  * crashed in Verify and therefore produced no output dir at all
  * (otherwise a broken no-oracle query silently vanishes from the
  * gate).
  */
class RegistrySpec extends SparkSpec {
  test("query manifest matches the registry exactly") {
    val manifest = scala.util.Using.resource(
      scala.io.Source.fromFile("tools/query_manifest.txt")(scala.io.Codec.UTF8))(
      _.getLines().map(_.trim).filter(_.nonEmpty).toSet)
    val registry = SparkEntry.queries.keySet
    assert(manifest == registry,
      s"manifest drift: missing=${registry -- manifest} stale=${manifest -- registry}")
  }
}
