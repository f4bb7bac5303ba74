package graft.functions

/** Incrementally-maintained sorted multiset of a bounded sliding window —
  * the replay kernels' state (operators/Formations.withFormationColumnsReplay,
  * operators/SeriesReplay). Binary-search insert/remove keep the buffer
  * sorted under java.lang.Double total order (same comparator as Arrays.sort
  * in the declarative expression, so the sorted content — and therefore
  * every order statistic — is identical by construction). O(L) memmove per
  * op; at the reference's L ≤ 1000 (rolling-1000 policy, sql/CLAUDE.md:55)
  * that is ~8 KB per slide, vs the declarative window path's per-row
  * array materialization + O(L log L) sort.
  */
final class SortedWindow(cap: Int) {
  private val buf = new Array[Double](cap)
  private var m = 0
  def insert(v: Double): Unit = {
    var idx = java.util.Arrays.binarySearch(buf, 0, m, v)
    if (idx < 0) idx = -idx - 1
    System.arraycopy(buf, idx, buf, idx + 1, m - idx)
    buf(idx) = v
    m += 1
  }
  def remove(v: Double): Unit = {
    val idx = java.util.Arrays.binarySearch(buf, 0, m, v)
    // idx >= 0 by invariant: we only remove previously-inserted values
    System.arraycopy(buf, idx + 1, buf, idx, m - idx - 1)
    m -= 1
  }
  /** null when the window holds no non-null values (same contract as the
    * declarative expression). */
  def quantiles(qs: Array[Double]): Array[Double] =
    if (m == 0) null
    else QuantileMultiExclusive.interpolate(buf, m, qs)
}
