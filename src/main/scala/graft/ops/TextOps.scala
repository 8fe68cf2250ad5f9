package graft.ops

import graft.Q

/** Text analysis: language-ID heuristic, quality scoring, token counting,
  * document fingerprinting — filled in after the relational surface.
  */
object TextOps {
  val queries: Seq[Q] = Seq.empty
}
