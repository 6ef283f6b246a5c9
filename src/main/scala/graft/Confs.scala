package graft

import org.apache.spark.sql.SparkSession

/** Scoped session-conf window: set `confs`, run `body`, restore — a
  * key that was not EXPLICITLY set before goes BACK to unset (i.e. it
  * keeps following its default, including defaults that fall back to
  * other confs), not to a pinned copy of the old default. That
  * distinction is why this checks SQLConf.contains rather than
  * RuntimeConfig.getOption: getOption returns the DEFAULT value for
  * registered-but-unset confs, and restoring that as an explicit
  * setting would freeze the fallback chain for the rest of the
  * session. Assumes the driver's one-query-at-a-time contract: a
  * concurrently planned query on the same session would see the
  * window's confs.
  */
object Confs {
  def withConfs[A](s: SparkSession, confs: Seq[(String, String)])(
      body: => A): A = {
    val sqlConf = s.sessionState.conf
    val prev = confs.map { case (k, _) =>
      k -> (if (sqlConf.contains(k)) Some(s.conf.get(k)) else None)
    }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      body
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      // a restore-unset that fails means the window's conf LEAKS into
      // every later query on the shared session — never silent: the
      // stderr line makes a leaked window diagnosable
      case (k, None) => try s.conf.unset(k) catch {
        case e: Throwable =>
          System.err.println(s"[confs] restore-unset of $k failed " +
            s"(window value leaks into the session): $e")
      }
    }
  }
}
