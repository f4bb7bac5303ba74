package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by the alternating large-star / small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) — the adversarial-graph scale lane for the dedup
  * cluster view (q61).
  *
  * q61's min-label propagation (with its pointer jump) also converges in
  * O(log n) rounds, but each round joins the FULL edge list against the
  * label frame — per-round work stays at |E| no matter how much of the
  * graph is already solved. Large-star/small-star instead reshapes the
  * edge set itself toward a star forest, so the frames later rounds touch
  * contract to ~one edge per non-root node — the property that matters
  * when the edge list is billions of rows and every round is a barrier:
  *
  *  - large-star: every node u links each strictly-LARGER neighbor to
  *    m(u) = min(Γ(u) ∪ {u}) — long chains contract exponentially;
  *  - small-star: every node u links its smaller neighbors (and itself)
  *    to their minimum — stars flatten to depth 1.
  *
  * Both steps are one groupBy + one join on the EDGE LIST only, the same
  * physical shape as q61's propagation rounds (nothing corpus-sized in
  * the loop), and both preserve connectivity exactly (proof in the
  * paper); the fixpoint is a star forest rooted at each component's
  * minimum node. Edges stay canonically oriented (hi → lo) throughout:
  * large-star emits (v, m) with v > u ≥ m, small-star emits targets that
  * are strict minima, so no orientation pass is ever needed.
  *
  * Per-round `localCheckpoint` truncates lineage exactly as in q61 (the
  * iterative-DataFrame plan-growth trap); convergence = star forest =
  * depth ≤ 1 (no edge target is also a source) AND every non-root has a
  * single parent — both tested on the checkpointed (tiny) edge frames.
  * The loop fails loudly if maxRounds is hit rather than emit a
  * non-fixpoint labeling.
  */
object StarComponents {

  /** Component labels of an undirected graph. `edges` must have exactly
    * two columns of one orderable numeric type (u, v); self-loops and
    * duplicate/reversed edges are tolerated. Returns (node, label) for
    * EVERY node appearing in `edges`, label = min node id of its
    * component.
    */
  def labels(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val Seq(cu, cv) = edges.columns.toSeq.map(col)
    // nodes appearing ONLY in self-loop edges never enter the contracted
    // edge frame (the cu =!= cv filter discards their every edge) — they
    // are singleton components and must still be labeled, or the
    // "every node appearing in edges" contract silently drops them
    // (r13 review; dedup callers always pass d1 < d2, so no fixture
    // exercised it)
    val allNodes = edges.select(cu.as("node"))
      .union(edges.select(cv.as("node"))).distinct()
    var cur = edges
      .filter(cu =!= cv)
      .select(greatest(cu, cv).as("h"), least(cu, cv).as("l"))
      .distinct()
      .localCheckpoint()
    var converged = cur.isEmpty
    var iter = 0
    while (!converged && iter < maxRounds) {
      // large-star: m(u) = min over u's full neighborhood (and u itself);
      // each larger neighbor v of u re-attaches to m(u)
      val bidir = cur.select(col("h").as("u"), col("l").as("v"))
        .union(cur.select(col("l").as("u"), col("h").as("v")))
      val mins = bidir.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      // duplicates are tolerated here: small-star's min-aggregate absorbs
      // them and the round-end distinct dedups — skipping the shuffle a
      // distinct would cost on the (largest) intermediate frame
      val ls = bidir.join(mins, "u")
        .filter(col("v") > col("u")) // m ≤ u < v, so (v, m) is canonical
        .select(col("v").as("h"), col("m").as("l"))
      // small-star: for each node h with smaller neighbors N (edges are
      // (h, l) with l < h), link N ∪ {h} minus its min to min(N)
      val mm = ls.groupBy(col("h")).agg(min(col("l")).as("m"))
      val ss = ls.join(mm, "h")
        .filter(col("l") =!= col("m"))
        .select(col("l").as("h"), col("m").as("l"))
        .union(mm.select(col("h"), col("m").as("l")))
        .distinct()
        .localCheckpoint()
      // fixpoint ⇔ star forest ⇔ depth ≤ 1 AND unique parent. The semi-join
      // alone (no edge target is also a source) only proves depth ≤ 1: a
      // node can still hold TWO parents — e.g. the path 1-5-3-9-2 reaches
      // {(3,1),(3,2),(5,1),(9,2)} after one round, which passes the depth
      // test but splits one component into two labels. Both checks run on
      // the checkpointed (tiny) frame; ss is distinct, so a plain per-h
      // count is the parent count.
      converged = ss.select(col("l"))
        .join(ss.select(col("h").as("l")), Seq("l"), "left_semi")
        .isEmpty &&
        ss.groupBy(col("h")).agg(count(lit(1)).as("n_parents"))
          .filter(col("n_parents") > 1).isEmpty
      cur = ss
      iter += 1
    }
    require(converged, s"star components did not converge in $iter rounds")
    System.err.println(s"[star-components] converged in $iter rounds")
    // fixpoint = star forest (member → root); roots label themselves
    val labeled = cur.select(col("h").as("node"), col("l").as("label"))
      .union(cur.select(col("l").as("node"), col("l").as("label")).distinct())
    labeled.union(
      allNodes.join(labeled.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), col("node").as("label")))
  }
}
