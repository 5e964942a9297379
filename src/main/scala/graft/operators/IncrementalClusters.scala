package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MERGE step of incremental duplicate-cluster maintenance — the
  * generic engine behind the maintenance triad (text q105, embedding
  * q107, media q108), promoted out of the text pack once the second
  * modality needed it: given the PERSISTED base cluster labels
  * (`doc_id, cluster` — yesterday's cluster-store state) and the
  * DELTA-INCIDENT duplicate edges (`src, dst`, at least one endpoint
  * new), compute the updated labels WITHOUT re-running connected
  * components over the corpus:
  *
  *  1. CONTRACT: map each delta-edge endpoint through the base labels
  *     (an endpoint inside a base component becomes that component's
  *     representative; an endpoint outside any stays itself). Each
  *     base component collapses to one node, so the contracted graph
  *     is O(|delta edges| + touched components) — the delta frontier,
  *     never the corpus.
  *  2. MERGE: connected components over the contracted graph alone.
  *     Because a base representative IS its component's min doc_id,
  *     the min-id fixpoint over contracted ids equals the fixpoint
  *     over all underlying member ids — contraction is exact, not
  *     approximate.
  *  3. RELABEL: base docs re-join through their old label (touched
  *     components take the merged label, untouched keep theirs — a
  *     dup-proportional join, O(|base labels|)); docs appearing only
  *     in delta edges take their merged label directly.
  *
  * Returns (contracted edges, updated labels). The contracted frame is
  * returned so IncrementalClustersSpec can assert the frontier bound
  * as an executable property: its row count is exactly |delta edges|,
  * whatever the corpus size. Each query's oracle is the FROM-SCRATCH
  * recursive-CTE walk over the combined edge set, so the driver's hash
  * gate holds the invariant that makes incremental maintenance
  * shippable at all: incremental ≡ recompute.
  */
object IncrementalClusters {

  def merge(s: SparkSession,
      baseLabels: DataFrame, deltaEdges: DataFrame): (DataFrame, DataFrame) = {
    val contracted = deltaEdges
      .join(baseLabels.select(col("doc_id").as("src"),
        col("cluster").as("src_c")), Seq("src"), "left")
      .join(baseLabels.select(col("doc_id").as("dst"),
        col("cluster").as("dst_c")), Seq("dst"), "left")
      .select(coalesce(col("src_c"), col("src")).as("src"),
        coalesce(col("dst_c"), col("dst")).as("dst"))
    val merged = ConnectedComponents.labels(s, contracted)
      .select(col("doc_id").as("node"), col("cluster").as("mcluster"))
    val baseFinal = baseLabels
      .join(merged, baseLabels("cluster") === merged("node"), "left")
      .select(baseLabels("doc_id"),
        coalesce(col("mcluster"), baseLabels("cluster")).as("cluster"))
    // nodes of the contracted graph that are NOT base representatives
    // or members: docs entering the cluster state through this delta
    val directFinal = merged
      .join(baseLabels.select(col("doc_id").as("node")), Seq("node"),
        "left_anti")
      .select(col("node").as("doc_id"), col("mcluster").as("cluster"))
    (contracted, baseFinal.unionByName(directFinal))
  }

  /** The full maintenance pass every triad member shares: partition
    * today's edge set on the delta predicate (base = the restriction
    * to yesterday's docs — standing in for the persisted label store),
    * derive base labels, and [[merge]] the delta-incident edges in.
    * Returns the updated labels for every edge-touched doc; untouched
    * docs are singletons and join back in the caller's assembly.
    */
  def maintain(s: SparkSession, edges: DataFrame,
      isDelta: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    // ONE evaluation of the (possibly expensive — LSH chains, cosine
    // joins) edge derivation, shared by the base and delta branches:
    // the edge set is dup-proportional, so the persist is tiny, while
    // an unshared plan would re-run the derivation per branch
    val e = graft.core.CacheScope.track(
      edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val baseEdges = e.filter(!isDelta(col("src")) && !isDelta(col("dst")))
    val deltaEdges = e.filter(isDelta(col("src")) || isDelta(col("dst")))
    val baseLabels = ConnectedComponents.labels(s, baseEdges)
    merge(s, baseLabels, deltaEdges)._2
  }
}
