package graft.streaming

import java.sql.Timestamp

/** The one definition of event-time micros for the stateful modules.
  *
  * `Timestamp.getTime` already carries millisecond precision and
  * `getNanos` carries the FULL fractional second, so the sub-millisecond
  * remainder is `(nanos / 1000) % 1000`. This load-bearing arithmetic was
  * copy-pasted across seven modules (round-10 review); a future edge-case
  * fix now lands once. An `object` method compiles to a static-style
  * call, so closures capturing it do not drag a non-serializable
  * enclosing instance into the state function.
  */
object EventTime {
  def micros(ts: Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
}
