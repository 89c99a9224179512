package graft.tools

import graft.GraftSession

/** Throwaway build-level profiler for the shared artifacts
  * (r14 optimization round). Not part of the query surface. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(32, "graft-scratch")
    graft.plans.GraftFunctions.register(s)
    graft.Tables(s, sfDir, "documents").count() // warmup
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"BUILD $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    time("grams")(graft.operators.ClassifierArtifacts.grams(s, sfDir))
    time("shingles")(graft.operators.PairGraph.shingles(s, sfDir))
    time("bands")(graft.operators.PairGraph.bandIndex(s, sfDir))
    time("pairs")(graft.operators.PairGraph.pairs(s, sfDir))
    time("cc-labels")(graft.operators.PairGraph.labels(s, sfDir))
    time("corpus-shingles")(graft.operators.PairGraph.corpusShingles(s, sfDir))
    time("corpus-bands")(graft.operators.PairGraph.corpusBandIndex(s, sfDir))
    time("bpe-words")(graft.operators.TextAnalysis.bpeWordsShared(s, sfDir))
    time("bpe-merges")(graft.operators.TextAnalysis.bpeMerges(s, sfDir))
    time("bm25")(graft.operators.TextAnalysis.retrievalScores(s, sfDir))
    time("word8-grams")(graft.operators.GramFrames.word8(s, sfDir))
    time("word8-grams-pos")(graft.operators.GramFrames.word8Pos(s, sfDir))
    s.stop()
  }
}
