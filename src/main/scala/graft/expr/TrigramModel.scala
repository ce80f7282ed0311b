package graft.expr

import org.apache.spark.unsafe.types.UTF8String

/**
 * The char-trigram Naive-Bayes language model (q77) — seeds, smoothing,
 * and the scoring kernel live HERE (expr layer) so the codegen'd
 * expression can call a static method; `pipeline.TrigramLangId` builds
 * its DuckDB replay from these same constants (single definition).
 *
 * The kernel reproduces the reference fold EXACTLY: per language, a
 * left-to-right sum of the per-trigram log-probs in document order —
 * the same doubles the oracle's `list_reduce` adds in the same order,
 * so scores are bit-identical cross-engine (no libm at query time).
 */
object TrigramModel {

  /** ASCII-only, apostrophe-free seed text (~1 sentence-cluster each) —
    * the model's ONLY input, so the model is a pure function of this. */
  val Seeds: Seq[(String, String)] = Seq(
    "en" -> ("the quick brown fox jumps over the lazy dog and then the rain " +
      "in spain stays mainly on the plain while the children play in the " +
      "garden with their friends near the old stone bridge"),
    "es" -> ("el rapido zorro marron salta sobre el perro perezoso y la " +
      "lluvia en sevilla es una maravilla mientras los ninos juegan en el " +
      "jardin con sus amigos cerca del viejo puente de piedra"),
    "de" -> ("der schnelle braune fuchs springt ueber den faulen hund und " +
      "der regen in deutschland bleibt meistens im tal waehrend die kinder " +
      "im garten mit ihren freunden an der alten steinbruecke spielen"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux et " +
      "la pluie en france reste surtout dans la plaine pendant que les " +
      "enfants jouent dans le jardin avec leurs amis pres du vieux pont de pierre"))

  val langs: Array[String] = Seeds.map(_._1).toArray

  private def gramsOf(s: String): Seq[String] =
    (0 to s.length - 3).map(i => s.substring(i, i + 3))

  /** lang -> (trigram -> ln((c+1)/(total+V))); V = union vocabulary
    * (add-one smoothing). `unseen(l)` = ln(1/(total_l+V)). */
  lazy val model: Seq[(String, Map[String, Double])] = {
    val counts = Seeds.map { case (l, s) =>
      l -> gramsOf(s).groupBy(identity).view.mapValues(_.size).toMap
    }
    val vocab = counts.flatMap(_._2.keys).toSet.size
    counts.map { case (l, c) =>
      val total = c.values.sum
      l -> c.map { case (g, n) => g -> math.log((n + 1).toDouble / (total + vocab)) }
    }
  }

  lazy val unseen: Array[Double] = {
    val counts = Seeds.map { case (_, s) => gramsOf(s).groupBy(identity).view.mapValues(_.size).toMap }
    val vocab = counts.flatMap(_.keys).toSet.size
    counts.map(c => math.log(1.0 / (c.values.sum + vocab))).toArray
  }

  // flat lookup tables for the kernel (built once per JVM)
  private lazy val maps: Array[java.util.HashMap[String, java.lang.Double]] =
    model.map { case (_, m) =>
      val h = new java.util.HashMap[String, java.lang.Double](m.size * 2)
      m.foreach { case (g, w) => h.put(g, java.lang.Double.valueOf(w)) }
      h
    }.toArray

  private lazy val predUtf8: Array[UTF8String] =
    langs.map(UTF8String.fromString)

  /**
   * Predicted language: per-lang left fold of trigram log-probs over
   * lower(text), argmax with the first-max rule (strictly-greater scan).
   * Character indexing is UTF-16; identical to SQL character indexing on
   * the (ASCII) graded corpora — the documented scope, same as the q25
   * ord==byte fast path before q76.
   */
  def predict(s: UTF8String): UTF8String = {
    val t = s.toString.toLowerCase(java.util.Locale.ROOT)
    val nGrams = t.length - 2
    var best = Double.NegativeInfinity
    var bi = 0
    var l = 0
    while (l < langs.length) {
      val m = maps(l)
      val miss = unseen(l)
      var score = 0.0
      var i = 0
      while (i < nGrams) {
        val w = m.get(t.substring(i, i + 3))
        score += (if (w == null) miss else w.doubleValue())
        i += 1
      }
      if (score > best) { best = score; bi = l }
      l += 1
    }
    predUtf8(bi)
  }

  /** Perplexity-style fluency score: the BEST language's mean per-trigram
    * log-prob (higher = more natural text under some profile — gibberish
    * scores near the unseen floor). Same fold as [[predict]], then ONE
    * division; both steps replayed verbatim by the oracle, so the double
    * is bit-identical cross-engine. 0.0 for <3-char docs (no grams). */
  def bestAvgLogProb(s: UTF8String): Double = {
    val t = s.toString.toLowerCase(java.util.Locale.ROOT)
    val nGrams = t.length - 2
    if (nGrams <= 0) return 0.0
    var best = Double.NegativeInfinity
    var l = 0
    while (l < langs.length) {
      val m = maps(l)
      val miss = unseen(l)
      var score = 0.0
      var i = 0
      while (i < nGrams) {
        val w = m.get(t.substring(i, i + 3))
        score += (if (w == null) miss else w.doubleValue())
        i += 1
      }
      if (score > best) best = score
      l += 1
    }
    best / nGrams
  }
}
