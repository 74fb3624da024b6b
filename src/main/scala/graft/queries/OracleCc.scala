package graft.queries

/** DuckDB-side connected components for the oracle SQL of the
  * clustering queries (q67/q91/q126/q133/q134/q147/q196/…).
  *
  * The original oracle used a recursive ALL-LABELS closure
  * (`lbl(id,label) = nodes UNION step`), whose fixpoint carries every
  * (member, reachable-label) pair — Σ k² rows per component — and whose
  * per-iteration join re-expands every accumulated label through every
  * edge: on sf0.01's sparse band graph that is instant, but at sf0.1
  * the band cliques are ~270 deep and fuse into large components, and
  * the closure's per-round work grows ~Σ k·deg·labels ≈ k³ — the
  * round-10 sf0.1 oracle sweep found five such oracles effectively hung
  * (engine side fine; the ORACLE was super-linear). This is the
  * DuckDB-side twin of the same lesson the engine learned in r07
  * (ConnectedComponents propagates MEMBERSHIP labels, never the pair
  * graph).
  *
  * Replacement: UNROLLED min-label propagation — label(t+1)(v) =
  * min(label(t)(v), min over in-edges of label(t)(u)), which is
  * per-round linear in |edges| and converges to the same fixpoint
  * (every node labeled with its component's min id) in ≤ diameter
  * rounds. Because plain SQL cannot iterate to convergence without the
  * recursive-CTE trap above, the rounds are UNROLLED to a fixed depth
  * and convergence is ASSERTED: if the last two rounds differ anywhere,
  * the oracle raises via error() — a loud gate failure, never a silent
  * wrong cluster assignment. Band-fused dup graphs have tiny diameters
  * (cliques fused on shared members); 24 rounds is orders past any
  * fixture's need, at ~24·|edges| total join work.
  */
private[queries] object OracleCc {

  /** CTE chain `lp0..lpN, ccconv, comp` computing per-node component
    * min-labels over an undirected edge CTE `undCte` (columns src, dst —
    * must contain both directions).
    *
    * @param nodesSql  SELECT producing (id, label) round-0 rows, e.g.
    *                  "SELECT doc_id AS id, doc_id AS label FROM sigs"
    * @param undCte    name of the undirected-edges CTE
    * @param idAlias   output column name for the node id in `comp`
    * @param rounds    unroll depth (assert-converged, see above)
    */
  def cc(nodesSql: String, undCte: String, idAlias: String = "id",
      rounds: Int = 24): String = {
    require(rounds >= 2)
    val sb = new StringBuilder
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs per
    // reference, and each round references its predecessor twice — an
    // un-materialized chain re-expands the whole upstream 2^rounds
    // times (first symptom: fd exhaustion re-opening the scanned
    // parquet). Materializing pins each round to one evaluation.
    sb.append(s"lp0 AS MATERIALIZED ($nodesSql),\n")
    for (r <- 1 to rounds) {
      sb.append(
        s"""lp$r AS MATERIALIZED (SELECT id, MIN(label) AS label FROM (
           |  SELECT id, label FROM lp${r - 1}
           |  UNION ALL
           |  SELECT u.dst AS id, l.label FROM lp${r - 1} l
           |  JOIN $undCte u ON u.src = l.id) t GROUP BY id),
           |""".stripMargin)
    }
    sb.append(
      s"""ccconv AS (SELECT COUNT(*) AS n FROM lp$rounds a
         |  JOIN lp${rounds - 1} b ON a.id = b.id AND a.label <> b.label),
         |comp AS (SELECT id AS $idAlias,
         |  CASE WHEN (SELECT n FROM ccconv) = 0 THEN label
         |       ELSE CAST(error('cc propagation unconverged after $rounds rounds') AS BIGINT)
         |  END AS cluster_id FROM lp$rounds)""".stripMargin)
    sb.toString
  }
}
