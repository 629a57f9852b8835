package graft.core

/** Bounded retry with fixed delay — the Prefect task-retry equivalent
  * (reference `flows/landing.py:56` retries=3/30 s,
  * `flows_iceberg/bronze_iceberg.py:32` retries=3/10 s).
  */
object Retry {
  def apply[T](retries: Int, delayMs: Long = 0L)(f: => T): T = {
    var attempt = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      try out = Some(f)
      catch {
        // NonFatal only: retrying InterruptedException/OOM — or Scala's
        // NonLocalReturnControl from a `return` inside the by-name
        // block — would turn successes and fatals into sleep loops.
        case scala.util.control.NonFatal(e) =>
          attempt += 1
          if (attempt > retries) throw e
          if (delayMs > 0) Thread.sleep(delayMs)
      }
    }
    out.get
  }
}
