package graft

import java.nio.file.{Files, Path, Paths}

/** Throwaway scratch space for staging dirs (CSV round-trips, external
  * table locations, streaming replay sources/checkpoints): tmpfs
  * (/dev/shm) when available, so fixture-sized intermediate files
  * never pay disk I/O — they are deleted within the same query run, so
  * durability buys nothing. Falls back to the default temp dir where
  * /dev/shm doesn't exist. The whole tree is removed by a JVM shutdown
  * hook; callers who want earlier cleanup delete their subdir.
  */
object Scratch {

  lazy val root: Path = {
    val shm = Paths.get("/dev/shm")
    val r =
      if (Files.isDirectory(shm) && Files.isWritable(shm))
        Files.createTempDirectory(shm, "graft_scratch_")
      else Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(r)))
    r
  }

  /** New unique scratch subdir. */
  def dir(prefix: String): Path = Files.createTempDirectory(root, prefix)

  /** Remove a scratch tree (files first, then dirs). */
  def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
