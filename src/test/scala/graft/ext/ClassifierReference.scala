package graft.ext

import graft.functions.Md5Slice64

/** Sequential straight-line reference model of the hashed-linear
  * classifier (grams → slot → integer milli-weight → floor-rounded
  * logit) — ONE definition shared by every spec that pins the
  * distributed implementation against independent digest arithmetic,
  * so a change to the feature map or weight derivation cannot leave a
  * stale hand-rolled copy silently pinning the old arithmetic. */
object ClassifierReference {
  def slotOf(g: String): Long =
    Md5Slice64.compute(g.getBytes("UTF-8"), 1, 8) % TextAnalysis.ClassifierBuckets

  def milliOf(g: String): Long =
    Md5Slice64.compute(s"w#${slotOf(g)}".getBytes("UTF-8"), 1, 8) % 2001 - 1000

  /** Unigram + bigram feature grams, trailing-empty-token parity with
    * Spark's `split(text, ' ')` (limit −1). */
  def gramsOf(text: String): Seq[String] = {
    val w = text.split(" ", -1).toSeq
    w ++ w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
  }

  /** floor-round-half-up logit, the StableStats.ratio twin. */
  def score(milliSum: Long, nFeats: Long): Double =
    math.floor(milliSum.toDouble / (nFeats * 1000) * 1e4 + 0.5) / 1e4

  def keep(text: String): Boolean = {
    val g = gramsOf(text)
    score(g.map(milliOf).sum, g.size.toLong) >= TextAnalysis.ClassifierThreshold
  }
}
