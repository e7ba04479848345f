package graft.tools

/** One definition of "clear every session-scoped artifact memo" shared
  * by the measurement mains (Bench cold protocol, StoreBench,
  * ScaleProbe). The memos cache expensive sketch/codebook/anchor towers
  * per (corpus fingerprint); a protocol that claims to price builds
  * must drop ALL of them before each sample or later passes silently
  * measure memo hits. Keeping the list in one place means a new memo
  * added to an operator only has to be registered once.
  */
object Memos {
  def clearAll(): Unit = {
    graft.operators.Dedup.clearSketchMemo()
    graft.operators.Dedup.clearSigMemo()
    graft.operators.Dedup.clearPairMemo()
    graft.operators.Dedup.clearVerifiedPairsMemo()
    graft.operators.Dedup.clearIncrementalPairsMemo()
    graft.operators.Dedup.clearCalibMemo()
    graft.operators.Dedup.clearClusterMemo()
    graft.operators.Dedup.clearStoredLabelsMemo()
    graft.operators.Dedup.clearMergedLabelsMemo()
    graft.operators.TextAnalysis.clearPrintMemo()
    graft.operators.TextAnalysis.clearNbMemo()
    graft.operators.TextAnalysis.clearBigramMemo()
    graft.operators.TextAnalysis.clearTfMemo()
    graft.operators.TextAnalysis.clearWinnowKeptMemo()
    graft.operators.TextAnalysis.clearWinnowPairMemo()
    graft.operators.Similarity.clearPcaMemo()
    graft.operators.Similarity.clearNswScoredMemo()
    graft.operators.Similarity.clearTrainedPq()
    graft.operators.Similarity.clearCentsMemo()
    graft.operators.Similarity.clearAssignMemo()
    graft.operators.Events.clearAnchorMemo()
    graft.operators.Bpe.clearTrainMemo()
    graft.operators.InvertedIndex.clearBm25Memo()
    graft.sources.LabelStore.clearGateMemo()
  }
}
