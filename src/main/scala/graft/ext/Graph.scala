package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation — host/URL-graph centrality
  * is a standard quality prior for web-crawl corpora (Page et al. 1999;
  * Common Crawl publishes host-level ranks for exactly this use).
  *
  * Computed in FIXED-POINT integer arithmetic: ranks are longs scaled by
  * `Scale`, every update is integer multiply/divide, so the result is
  * bit-exact regardless of partitioning, summation order, or engine —
  * the property that lets a DuckDB chained-CTE mirror hash-match it,
  * which no double-summed PageRank can do (FP addition is
  * order-dependent across a shuffle).
  */
object Graph {

  /** Rank unit: 10^12 per unit of probability mass. Room for 10^6-node
    * per-rank precision loss while staying far from Long overflow
    * (total mass = Scale, per-node ranks ≤ Scale). */
  val Scale: Long = 1000000000000L

  /** Out-degrees over the DISTINCT edge set. */
  def outDegrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(col(srcCol).as("v"), col(dstCol).as("w")).distinct()
      .groupBy("v").agg(count(lit(1)).as("out_deg"))

  /** Fixed-iteration PageRank over the distinct directed edge set.
    *
    * Per iteration: every node sends `rank div out_deg` to each
    * out-neighbor (integer division — the remainder, < out_deg units of
    * 10^-12, is dropped, identically in the mirror), and
    * `rank' = base + damp·Σcontribs div 1000` with
    * `damp = dampPerMille/1000` and
    * `base = ((1000 − dampPerMille) · (Scale div n)) div 1000`.
    * Dangling-node mass is dropped, not redistributed (ranks sum to
    * slightly under Scale) — the standard simplification, mirrored
    * exactly.
    *
    * Scale shape: each iteration is one shuffle join (edges ⋈ ranks on
    * src — ranks are (id, long) pairs, never wider) plus one partial-agg
    * groupBy on dst; lineage is cut every iteration with an eager
    * localCheckpoint so the plan stays O(1) deep (the round-10
    * cascade-rescan lesson). Node count `n` is one bounded driver
    * action. Skewed in-degree (everyone links to one hub) partial-
    * aggregates map-side — the hot key receives one partial sum per
    * partition, not one row per in-edge. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, dampPerMille: Long = 850L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    require(dampPerMille >= 0 && dampPerMille <= 1000,
      s"dampPerMille must be in [0, 1000], got $dampPerMille")
    // Partitioning is established ONCE and reused every iteration:
    // edges hash-partitioned on src, the rank frame on v (and
    // localCheckpoint preserves partitioning), so the per-iteration
    // src==v join runs exchange-free — the only shuffle per round is
    // the partial-aggregated in-mass groupBy on dst.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().repartition(col("src")).localCheckpoint(true)
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    val deg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("out_deg"))
    // out_deg rides IN the rank frame (nullable for dangling nodes), so
    // no per-iteration degree join
    var ranks = nodes.join(deg, Seq("v"), "left")
      .repartition(col("v")).localCheckpoint(true)
    val n = ranks.count()
    require(n > 0, "pageRank needs a non-empty edge set")
    val init = Scale / n
    val base = ((1000L - dampPerMille) * init) / 1000L
    ranks = ranks.withColumn("rank", lit(init)).localCheckpoint(true)

    for (_ <- 1 to iterations) {
      // `div` (not `/`): Spark's `/` on longs is DOUBLE division, whose
      // rounding would diverge from the oracle's integer `//`
      val contribs = e
        .join(ranks.filter(col("out_deg").isNotNull), col("src") === col("v"))
        .select(col("dst").as("v"), expr("rank div out_deg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("in_mass"))
      ranks = ranks.drop("rank").join(contribs, Seq("v"), "left")
        .withColumn("in_mass", coalesce(col("in_mass"), lit(0L)))
        .select(col("v"), col("out_deg"),
          expr(s"$base + ($dampPerMille * in_mass) div 1000").as("rank"))
        .localCheckpoint(true)
    }
    ranks.select("v", "rank")
  }

  /** Personalized PageRank: the teleport vector is uniform over `seeds`
    * instead of all nodes — mass flows OUT from a trusted seed set, so a
    * node ranks high only by proximity to seeds. The seed-propagation
    * quality prior of web-corpus curation (a crawl host scores by how
    * reachable it is from vetted hosts), same fixed-point integer
    * arithmetic as [[pageRank]]: init = `Scale div |S|` on seeds, 0
    * elsewhere; per iteration `rank' = seedBase(v) + damp·Σcontribs
    * div 1000` where seedBase is nonzero only on seeds. Dangling mass
    * drops, mirrored exactly. `seeds` must be a subset of the graph's
    * nodes (extra ids are ignored via the inner join). */
  def pageRankSeeded(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      iterations: Int = 5, dampPerMille: Long = 850L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    // same reused-partitioning shape as [[pageRank]]: edges on src,
    // the rank frame (carrying out_deg + is_seed) on v
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().repartition(col("src")).localCheckpoint(true)
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    val seedSet = seeds.select(col(seedCol).as("v")).distinct()
      .withColumn("is_seed", lit(true))
    val deg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("out_deg"))
    var ranks = nodes.join(seedSet, Seq("v"), "left")
      .withColumn("is_seed", coalesce(col("is_seed"), lit(false)))
      .join(deg, Seq("v"), "left")
      .repartition(col("v")).localCheckpoint(true)
    val nSeeds = ranks.filter(col("is_seed")).count()
    require(nSeeds > 0, "pageRankSeeded needs at least one seed in the graph")
    val init = Scale / nSeeds
    val base = ((1000L - dampPerMille) * init) / 1000L
    ranks = ranks.withColumn("rank",
      when(col("is_seed"), lit(init)).otherwise(lit(0L))).localCheckpoint(true)

    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.filter(col("out_deg").isNotNull), col("src") === col("v"))
        .select(col("dst").as("v"), expr("rank div out_deg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("in_mass"))
      ranks = ranks.drop("rank").join(contribs, Seq("v"), "left")
        .withColumn("in_mass", coalesce(col("in_mass"), lit(0L)))
        .select(col("v"), col("is_seed"), col("out_deg"),
          (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
            expr(s"($dampPerMille * in_mass) div 1000")).as("rank"))
        .localCheckpoint(true)
    }
    ranks.select("v", "rank")
  }

  /** Connected components over an undirected view of the edge set:
    * (v, component) where component = the minimum node id reachable
    * from v. Delegates to the min-label-propagation loop behind
    * [[Dedup.duplicateGroups]] (per iteration: one narrow label join +
    * map-side-combined min agg; converges in O(diameter) rounds,
    * maxIter-capped). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val nodes = edges.select(col(srcCol).as("v"))
      .union(edges.select(col(dstCol).as("v"))).distinct()
    Dedup.duplicateGroups(nodes, "v", edges.select(col(srcCol), col(dstCol)),
        srcCol, dstCol, maxIter)
      .withColumnRenamed("rep", "component")
  }

  /** Top-k nodes by rank with a deterministic id tiebreak. */
  def topRanked(ranks: DataFrame, k: Int): DataFrame =
    ranks.orderBy(col("rank").desc, col("v").asc).limit(k)
}
