package graft.operators

import graft.GateQuery

/** Text-pipeline operators: language-ID, quality scoring, token counts,
  * fingerprinting (SURVEY §7.5, P3-P8 machinery). */
object TextAnalysis {
  def queries: Seq[GateQuery] = Seq.empty
}
