package graft.operators

import graft.GateQuery

/** Tumbling/sliding time-window semantics (SURVEY T1-T3). */
object TimeWindows {
  def queries: Seq[GateQuery] = Seq.empty
}
