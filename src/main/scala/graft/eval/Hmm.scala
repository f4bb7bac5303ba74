package graft.eval

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.IntegerType

/** E24 — HMM regime detection (reference: eval/walk_forward.py:906-960,
  * `GaussianHMM(n_components=3, covariance_type="diag", n_iter=100)` on a
  * 1-D per-signal feature; diagnostic only, never used for barrier
  * selection).
  *
  * This is a from-scratch 1-D Gaussian Baum-Welch + Viterbi (Rabiner 1989
  * tutorial formulation, scaled forward-backward). Initialization is
  * DETERMINISTIC (state means at the feature's 1/2k..(2k-1)/2k quantiles,
  * shared data variance, uniform start/transition) rather than hmmlearn's
  * seeded k-means, so fitted parameters are reproducible bit-for-bit
  * across runs without a random dependency; the decoded segmentation is
  * equivalent up to state relabeling, which is all a diagnostic consumes.
  * Reference guard behaviors are kept: NaN features are median-filled and
  * fewer than 10·nStates valid points short-circuits to all-zero labels.
  *
  * Scale split (same as Laguerre): fitting is sequential in the series
  * (EM over an ordered sequence), so Spark parallelism is the series
  * axis via flatMapGroups — each series' fit is one task.
  */
object Hmm {

  final case class Model(startProb: Array[Double],
      trans: Array[Array[Double]], means: Array[Double],
      vars: Array[Double], logLik: Double, iters: Int)

  private val MinVar = 1e-10

  private def gaussLogPdf(x: Double, mean: Double, v: Double): Double =
    -0.5 * (math.log(2.0 * math.Pi * v) + (x - mean) * (x - mean) / v)

  /** Baum-Welch fit; iterates until `nIter` or log-likelihood improvement
    * < `tol` (hmmlearn's default 1e-2 convergence gate). */
  def fit(x: Array[Double], nStates: Int = 3, nIter: Int = 100,
      tol: Double = 1e-2): Model = {
    val n = x.length
    require(n >= 2 && nStates >= 1)
    // deterministic init: means at interior quantiles, shared variance
    val sorted = x.clone(); java.util.Arrays.sort(sorted)
    val means = Array.tabulate(nStates)(k =>
      sorted(((2 * k + 1) * (n - 1) / (2 * nStates)).min(n - 1)))
    val mu = x.sum / n
    val v0 = math.max(x.map(d => (d - mu) * (d - mu)).sum / n, MinVar)
    val vars = Array.fill(nStates)(v0)
    val start = Array.fill(nStates)(1.0 / nStates)
    val trans = Array.fill(nStates)(Array.fill(nStates)(1.0 / nStates))

    val alpha = Array.ofDim[Double](n, nStates)
    val beta = Array.ofDim[Double](n, nStates)
    val scale = new Array[Double](n)
    val b = Array.ofDim[Double](n, nStates) // emission probs (scaled per row)

    var prevLl = Double.NegativeInfinity
    var ll = Double.NegativeInfinity
    var it = 0
    var converged = false
    while (it < nIter && !converged) {
      // emissions: exp-normalize each row by its max log-pdf for stability
      var t = 0
      while (t < n) {
        var mx = Double.NegativeInfinity
        var k = 0
        while (k < nStates) {
          val lp = gaussLogPdf(x(t), means(k), vars(k))
          b(t)(k) = lp
          if (lp > mx) mx = lp
          k += 1
        }
        k = 0
        while (k < nStates) { b(t)(k) = math.exp(b(t)(k) - mx); k += 1 }
        scale(t) = mx // stash the row shift; re-used in the ll sum below
        t += 1
      }
      // scaled forward
      ll = 0.0
      var norm = 0.0
      var k = 0
      while (k < nStates) { alpha(0)(k) = start(k) * b(0)(k); norm += alpha(0)(k); k += 1 }
      ll += math.log(norm) + scale(0)
      k = 0
      while (k < nStates) { alpha(0)(k) /= norm; k += 1 }
      t = 1
      while (t < n) {
        norm = 0.0
        var j = 0
        while (j < nStates) {
          var s = 0.0
          var i = 0
          while (i < nStates) { s += alpha(t - 1)(i) * trans(i)(j); i += 1 }
          alpha(t)(j) = s * b(t)(j)
          norm += alpha(t)(j)
          j += 1
        }
        ll += math.log(norm) + scale(t)
        j = 0
        while (j < nStates) { alpha(t)(j) /= norm; j += 1 }
        scale(t) = norm // reuse slot: forward scaling factor for beta
        t += 1
      }
      // scaled backward (same scaling factors)
      k = 0
      while (k < nStates) { beta(n - 1)(k) = 1.0; k += 1 }
      t = n - 2
      while (t >= 0) {
        var i = 0
        while (i < nStates) {
          var s = 0.0
          var j = 0
          while (j < nStates) { s += trans(i)(j) * b(t + 1)(j) * beta(t + 1)(j); j += 1 }
          beta(t)(i) = s / scale(t + 1)
          i += 1
        }
        t = t - 1
      }
      // M-step accumulators from gamma/xi
      val gammaSum = new Array[Double](nStates)
      val gammaSumNoLast = new Array[Double](nStates)
      val meanAcc = new Array[Double](nStates)
      val xiAcc = Array.fill(nStates)(new Array[Double](nStates))
      val g0 = new Array[Double](nStates)
      t = 0
      while (t < n) {
        var gNorm = 0.0
        var i = 0
        while (i < nStates) { gNorm += alpha(t)(i) * beta(t)(i); i += 1 }
        i = 0
        while (i < nStates) {
          val g = alpha(t)(i) * beta(t)(i) / gNorm
          if (t == 0) g0(i) = g
          gammaSum(i) += g
          if (t < n - 1) gammaSumNoLast(i) += g
          meanAcc(i) += g * x(t)
          i += 1
        }
        if (t < n - 1) {
          var xiNorm = 0.0
          i = 0
          while (i < nStates) {
            var j = 0
            while (j < nStates) {
              xiNorm += alpha(t)(i) * trans(i)(j) * b(t + 1)(j) * beta(t + 1)(j)
              j += 1
            }
            i += 1
          }
          i = 0
          while (i < nStates) {
            var j = 0
            while (j < nStates) {
              xiAcc(i)(j) +=
                alpha(t)(i) * trans(i)(j) * b(t + 1)(j) * beta(t + 1)(j) / xiNorm
              j += 1
            }
            i += 1
          }
        }
        t += 1
      }
      // M-step updates
      var i = 0
      while (i < nStates) {
        start(i) = g0(i)
        means(i) = meanAcc(i) / gammaSum(i)
        i += 1
      }
      // variances need the NEW means — second gamma pass
      val varAcc = new Array[Double](nStates)
      t = 0
      while (t < n) {
        var gNorm = 0.0
        i = 0
        while (i < nStates) { gNorm += alpha(t)(i) * beta(t)(i); i += 1 }
        i = 0
        while (i < nStates) {
          val g = alpha(t)(i) * beta(t)(i) / gNorm
          varAcc(i) += g * (x(t) - means(i)) * (x(t) - means(i))
          i += 1
        }
        t += 1
      }
      i = 0
      while (i < nStates) {
        vars(i) = math.max(varAcc(i) / gammaSum(i), MinVar)
        var j = 0
        while (j < nStates) {
          trans(i)(j) = if (gammaSumNoLast(i) > 0) xiAcc(i)(j) / gammaSumNoLast(i)
            else 1.0 / nStates
          j += 1
        }
        i += 1
      }
      it += 1
      converged = ll - prevLl < tol && prevLl != Double.NegativeInfinity
      prevLl = ll
    }
    Model(start, trans, means, vars, ll, it)
  }

  /** Viterbi decode (log space). */
  def predict(x: Array[Double], m: Model): Array[Int] = {
    val n = x.length
    val k = m.means.length
    val delta = Array.ofDim[Double](n, k)
    val psi = Array.ofDim[Int](n, k)
    var i = 0
    while (i < k) {
      delta(0)(i) = math.log(math.max(m.startProb(i), 1e-300)) +
        gaussLogPdf(x(0), m.means(i), m.vars(i))
      i += 1
    }
    var t = 1
    while (t < n) {
      var j = 0
      while (j < k) {
        var best = Double.NegativeInfinity
        var arg = 0
        i = 0
        while (i < k) {
          val v = delta(t - 1)(i) + math.log(math.max(m.trans(i)(j), 1e-300))
          if (v > best) { best = v; arg = i }
          i += 1
        }
        delta(t)(j) = best + gaussLogPdf(x(t), m.means(j), m.vars(j))
        psi(t)(j) = arg
        j += 1
      }
      t += 1
    }
    val path = new Array[Int](n)
    var bi = 0
    i = 1
    while (i < k) { if (delta(n - 1)(i) > delta(n - 1)(bi)) bi = i; i += 1 }
    path(n - 1) = bi
    t = n - 2
    while (t >= 0) { path(t) = psi(t + 1)(path(t + 1)); t -= 1 }
    path
  }

  /** Reference entry (walk_forward.py:906-960): labels for a 1-D feature
    * series — NaN median-filled; fewer than 10·nStates valid points →
    * all-zero labels. */
  def detectRegimes(feature: Array[Double], nStates: Int = 3): Array[Int] = {
    val valid = feature.filterNot(_.isNaN)
    if (valid.length < nStates * 10) return new Array[Int](feature.length)
    val med = {
      val s = valid.clone(); java.util.Arrays.sort(s)
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val x = feature.map(v => if (v.isNaN) med else v)
    predict(x, fit(x, nStates))
  }

  /** Distributed form: per-series sequential fit+decode via flatMapGroups
    * (the Laguerre pattern — parallelism is the series axis). Appends
    * `hmm_regime`; input needs (seriesCol, orderCol, featureCol). */
  def attachRegimes(df: DataFrame, seriesCol: String, orderCol: String,
      featureCol: String, nStates: Int = 3): DataFrame = {
    val schema = df.schema.add("hmm_regime", IntegerType)
    val sIdx = df.schema.fieldIndex(seriesCol)
    val oIdx = df.schema.fieldIndex(orderCol)
    val fIdx = df.schema.fieldIndex(featureCol)
    df.groupByKey((r: Row) => r.getString(sIdx))(Encoders.STRING)
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val rows = it.toArray.sortBy(_.getLong(oIdx))
        val feat = rows.map(r =>
          if (r.isNullAt(fIdx)) Double.NaN else r.getDouble(fIdx))
        val labels = detectRegimes(feat, nStates)
        rows.iterator.zipWithIndex.map { case (row, i) =>
          Row.fromSeq(row.toSeq :+ labels(i))
        }
      }(Encoders.row(schema))
      .toDF()
  }
}
