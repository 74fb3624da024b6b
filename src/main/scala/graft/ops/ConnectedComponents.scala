package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation
  * (the Pregel formulation): every node starts labeled with its own id,
  * each round takes the min of its own and its neighbors' labels, and
  * the fixpoint labels every node with the min id of its component.
  *
  * This is the step a dedup pipeline needs AFTER candidate generation:
  * LSH banding (MinHash q17, SimHash q61) emits near-dup PAIRS, but
  * keeping one canonical document per duplicate GROUP requires the
  * transitive closure of those pairs — pair (a,b) + pair (b,c) must
  * collapse a, b, c into one cluster even though (a,c) never collided.
  *
  * Scale shape, per round: partial-aggregatable `min(label)` shuffles
  * (map-side combine shrinks them before the exchange) plus equi-joins
  * back to the label table. The driver-side convergence check reads a
  * single scalar (sum of labels, which strictly decreases while any
  * label changes — summed in DECIMAL(38,0) so it cannot wrap at any
  * node-count/id scale), the standard driver-loop pattern for
  * iterative dataflow — no row data ever reaches the driver.
  * `localCheckpoint` after every round truncates lineage so the plan
  * stays O(1) across rounds instead of re-deriving round k from rounds
  * 1..k-1. Per-round path compression (label ← label(label)) turns
  * diameter-bound convergence into O(log diameter)-ish for the price
  * of one label-table self-join.
  *
  * If `maxRounds` truncates before the fixpoint a warning is printed —
  * partial labels are otherwise indistinguishable from converged ones.
  * For adversarial long-chain graphs at 100 TB, [[labelAlternating]]
  * implements alternating large-star/small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC '14), which
  * reaches the same fixpoint in O(log² n) rounds independent of graph
  * diameter — property-tested equal to [[label]] on random and
  * pathological chain graphs.
  */
object ConnectedComponents {

  /** Shared fixpoint driver: `step` maps the current (id, label) table
    * to the next one (monotone — labels only decrease); iterate with
    * path compression until the label sum stops changing.
    */
  /** Path compression — label(x) ← min(label(x), label(label(x))).
    * Labels are always ids of component members, so the lookup stays
    * inside the component; chasing one extra hop per round turns
    * diameter-bound convergence into O(log diameter)-ish, for the
    * price of one small self-join of the label table.
    */
  private def compress(labels: DataFrame): DataFrame =
    labels.as("a")
      .join(labels.select(col("id").as("lid"), col("label").as("llabel")),
        col("a.label") === col("lid"), "left")
      .select(col("a.id").as("id"),
        least(col("a.label"), coalesce(col("llabel"), col("a.label"))).as("label"))

  private def fixpoint(
      init: DataFrame, step: DataFrame => DataFrame, maxRounds: Int): DataFrame = {
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head.getDecimal(0)
    var labels = init.localCheckpoint()
    var prevSum = labelSum(labels)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = compress(step(labels)).localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      round += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round $round sum=$s converged=$converged")
    }
    if (!converged)
      System.err.println(
        s"[cc] WARNING: stopped at maxRounds=$maxRounds before the fixpoint — " +
          "labels are PARTIAL (components may still be split)")
    labels
  }

  /** Components of a MEMBERSHIP (hypergraph) relation — the shape LSH
    * dedup actually produces: `members` rows are (id, bucket), and two
    * ids are connected iff they share a bucket. Equivalent to [[label]]
    * over the expanded pair graph, but a hot bucket of k members costs
    * k membership rows here instead of k²/2 pair rows — the pair
    * expansion is exactly what melts down on a viral near-dup cluster
    * at 100 TB, and this form never creates it.
    *
    * One round = id→bucket-min→id (two partial-agg min shuffles), i.e.
    * a FULL round of the pair graph, so rounds = pair-graph diameter —
    * not the doubled diameter a naive bipartite encoding pays.
    */
  def labelViaBuckets(members: DataFrame, maxRounds: Int = 50): DataFrame = {
    val mem = members.select(col("id"), col("bucket")).localCheckpoint()
    // r14, two join eliminations with the identical fixpoint:
    //  - the old per-round label-update join (labels ⋈ viaBuckets +
    //    least/coalesce) is REDUNDANT in the membership form — every id
    //    is a member of each of its own buckets, so min-over-its-buckets
    //    of bmin is already ≤ the id's current label, and the propagate
    //    output IS the next label table;
    //  - round 1's mem ⋈ labels is an identity join (labels = ids), so
    //    that round runs join-free and SEEDS the fixpoint — it pays the
    //    same compression hop the in-loop rounds do, making the seed
    //    byte-equal to the old round-1 output.
    def propagate(memLabeled: DataFrame): DataFrame = {
      val bucketMin = memLabeled
        .groupBy(col("bucket")).agg(min(col("label")).as("bmin"))
      mem.join(bucketMin, "bucket")
        .groupBy(col("id")).agg(min(col("bmin")).as("label"))
    }
    val seed = compress(propagate(mem.withColumn("label", col("id"))))
    fixpoint(seed, labels => propagate(mem.join(labels, "id")), maxRounds)
  }

  /** Components of a graph whose edges are CONFINED to disjoint groups:
    * every node belongs to exactly one group and every edge stays inside
    * its group — the shape IVF-bounded semantic dedup produces (q105:
    * candidate pairs exist only within a cell, each vector is assigned
    * to exactly one cell). Under that invariant no component can span
    * groups, so the global iterative fixpoint ([[label]]) is the wrong
    * algorithm: ONE shuffle on the group key and an exact local
    * union-find per group replaces O(diameter) rounds of global
    * shuffles — measured 9.1 s → sub-second on q105 at sf0.1, where 11
    * propagation rounds dominated the query.
    *
    * Scale shape at 100 TB: per-group state is O(group size) (IVF cell
    * sizes are bounded by construction — the same bound that makes the
    * candidate join sub-quadratic), groups distribute across executors,
    * and there are ZERO global barriers. Union-by-min (the larger root
    * always attaches under the smaller) + path compression makes the
    * final root of every tree the component's min id — the same label
    * contract as [[label]].
    *
    * `members` = (grp, id) with each id in exactly one grp;
    * `edges` = (grp, src, dst) with both endpoints in grp. Returns
    * (id, label). The invariant is the CALLER's contract — edges that
    * cross groups would silently produce split components (use
    * [[label]] / [[labelAlternating]] for unconfined graphs).
    */
  def labelWithinGroups(members: DataFrame, edges: DataFrame): DataFrame = {
    val sp = members.sparkSession
    import sp.implicits._
    val rows = members.select(
        col(members.columns(0)).cast("long"),
        col(members.columns(1)).cast("long"),
        col(members.columns(1)).cast("long"))
      .union(edges.select(
        col(edges.columns(0)).cast("long"),
        col(edges.columns(1)).cast("long"),
        col(edges.columns(2)).cast("long")))
      .as[(Long, Long, Long)]
    rows.groupByKey(_._1).flatMapGroups { (_, it) =>
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def add(x: Long): Unit = if (!parent.contains(x)) parent(x) = x
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      it.foreach { case (_, a, b) =>
        add(a); add(b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keysIterator.map(id => (id, find(id)))
    }.toDF("id", "label")
  }

  /** Alternating large-star/small-star CC (Kiveris et al., SoCC '14):
    * rewrites the EDGE LIST itself toward a star forest instead of
    * propagating labels, converging in O(log² n) rounds regardless of
    * graph diameter — the variant to reach for on adversarial
    * long-chain graphs where min-label propagation (even with path
    * compression) pays O(log diameter) rounds that each shuffle the
    * full edge list.
    *
    *  - large-star(u): every STRICTLY LARGER neighbor of u re-attaches
    *    to m = min(Γ(u) ∪ {u});
    *  - small-star(u): every smaller-or-equal neighbor (and u itself)
    *    re-attaches to that minimum.
    *
    * Both steps preserve connectivity and only shrink edge "potential";
    * at the fixpoint every edge is (v, component-min). Per round: two
    * groupBy-min shuffles + two equi-joins — the same partial-agg
    * building blocks as [[label]], no new machinery. Convergence is
    * detected by an order-independent (count, Σ xxhash64(src,dst))
    * signature of the canonical edge set — two scalars to the driver,
    * never rows.
    *
    * Same contract as [[label]]: returns (id, label), label = min id
    * of the component.
    */
  def labelAlternating(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    def mirrored(e: DataFrame) =
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    // m(u) = min(Γ(u) ∪ {u}) for each node u present in e
    def neighborhoodMin(nbrs: DataFrame) =
      nbrs.groupBy(col("src")).agg(min(col("dst")).as("_mn"))
        .select(col("src"), least(col("_mn"), col("src")).as("m"))
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = mirrored(e)
      // no distinct here: duplicates only live within the round (the
      // small-star distinct bounds each round's output) and a dedup
      // exchange per star costs more than the duplicate rows it saves
      nbrs.filter(col("dst") > col("src"))
        .join(neighborhoodMin(nbrs), "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val sm = mirrored(e).filter(col("dst") <= col("src"))
      val mins = neighborhoodMin(sm)
      sm.join(mins, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
    }
    def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).head
      (r.getLong(0), r.getDecimal(1))
    }
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    var sig = signature(e)
    var round = 0
    var converged = sig._1 == 0L
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val s = signature(next)
      converged = s._1 == sig._1 && s._2.compareTo(sig._2) == 0
      sig = s
      e = next
      round += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc-alt] round $round edges=${s._1} converged=$converged")
    }
    if (!converged)
      System.err.println(
        s"[cc-alt] WARNING: stopped at maxRounds=$maxRounds before the star " +
          "forest stabilized — labels are PARTIAL")
    val star = e.groupBy(col("src").as("id")).agg(min(col("dst")).as("_label"))
    nodes.select(col("id")).join(star, Seq("id"), "left")
      .select(col("id"), coalesce(col("_label"), col("id")).as("label"))
  }

  /** General pair-edge form.
    * @param nodes a frame with one column `id` (long).
    * @param edges a frame with columns `src`, `dst` (longs) — treated as
    *              undirected; duplicates and either orientation are fine
    *              (min-aggregation absorbs them, so callers need not pay
    *              a distinct shuffle).
    * @param maxRounds hard cap on propagation rounds (safety valve; the
    *                  loop exits as soon as labels stop changing, and
    *                  warns if the cap truncated propagation).
    * @return (`id`, `label`) with label = min node id in the component.
    */
  def label(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    // Materialize the mirrored edge list ONCE: every round (and every
    // convergence check) re-reads it, and without this the upstream
    // edge-generation pipeline (e.g. a SimHash band self-join) would
    // re-execute per action — measured 5× the whole query's cost.
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val init = nodes.select(col("id"), col("id").as("label"))
    fixpoint(init, labels => {
      val nbrMin = und.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nbr_min"))
      labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
    }, maxRounds)
  }
}
