package graft.operators

import graft.GateQuery

/** Log filter/paginate/stats queries (SURVEY S10/W3/A7/S11). */
object LogAnalytics {
  def queries: Seq[GateQuery] = Seq.empty
}
