package graft

import org.apache.spark.sql.SparkSession

/** Scoped session-conf window: set `confs`, run `body`, restore — a
  * key that was unset before goes BACK to unset, not to a pinned
  * explicit value (q186's getOption/unset symmetry). Assumes the
  * driver's one-query-at-a-time contract: a concurrently planned query
  * on the same session would see the window's confs.
  */
object Confs {
  def withConfs[A](s: SparkSession, confs: Seq[(String, String)])(
      body: => A): A = {
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      body
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => try s.conf.unset(k) catch { case _: Throwable => () }
    }
  }
}
