package graft.queries

/** The committed unigram piece table (see [[Unigram.FixedPieces]]):
  * `learnPieces(sf0.001 documents, vocabSize = 40)` — regenerate with
  * `runMain graft.LearnPieces /root/testdata/sf0.001 40` and paste
  * verbatim (bit-reproducible: StrictMath-quantized scores,
  * deterministic tie-breaks). vocabSize 40 is the committed depth for
  * the same reason C13 commits a 96-merge prefix: the synthetic
  * corpus has only 31 distinct words, so a production-sized
  * vocabulary saturates to fertility 1.0 (every word its own piece)
  * and the oracle's Viterbi replay would verify nothing. At 40 the
  * dict mixes whole-word pieces (scan, column, window, …) with
  * genuine multi-piece segmentations — mean fertility 2.710, 15/31
  * words single-piece — so the DP, tie-breaks, and id reassembly all
  * carry real mass. Order = id order (ids 1..40; 0 = UNK). */
private[queries] object LearnedPiecesTable {
  val pieces: Seq[(String, Long)] = Seq(
    ("a", -2434049L), ("e", -2735849L), ("r", -2742968L), ("l", -2931755L),
    ("h", -3155274L), ("t", -3156705L), ("s", -3159286L), ("o", -3172287L),
    ("c", -3464394L), ("st", -3467857L), ("m", -3473653L), ("b", -3474816L),
    ("f", -3883809L), ("i", -3897072L), ("at", -3897652L), ("w", -3908742L),
    ("scan", -4534393L), ("column", -4540807L), ("window", -4542953L), ("order", -4544028L),
    ("sort", -4545104L), ("part", -4557014L), ("agg", -4567959L), ("value", -4571265L),
    ("line", -4575690L), ("key", -4576799L), ("p", -4583478L), ("join", -4586833L),
    ("merge", -4587954L), ("group", -4589076L), ("query", -4589076L), ("v", -4592450L),
    ("d", -4599229L), ("u", -4607194L), ("k", -4616372L), ("g", -4639675L),
    ("j", -11760787L), ("n", -11760787L), ("q", -11760787L), ("y", -11760787L)
  )
}
