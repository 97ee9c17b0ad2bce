package graft.operators

import graft.GateQuery

/** Channel-analytics aggregate semantics (SURVEY A1-A6) over the driver
  * tables. Filled in incrementally. */
object ChannelMetrics {
  def queries: Seq[GateQuery] = Seq.empty
}
