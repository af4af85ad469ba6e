package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-level dedup: connected components over the near-duplicate
  * pair graph.
  *
  * Pair lists (dedup_minhash_lsh & co.) are evidence; what a corpus
  * pipeline actually consumes is a CLUSTER id per document — "these 7
  * docs are one piece of content, keep one" (the reference's analogous
  * grouping step is the FK-group union-find of
  * post_load_optimization/convert_datatypes.sql:148-196, which walks
  * its edge graph on the driver because FK graphs are metadata-sized;
  * a 100 TB near-dup graph is NOT, so the walk must be distributed).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) —
  * converges to per-component stars rooted at the component minimum in
  * O(log n) rounds, each round two shuffles on node id. Both steps are
  * join + aggregate only: no `collect_list` of neighborhoods (a hub
  * node's neighbor list is the classic OOM), no driver-side graph, no
  * assumption about component diameter (plain min-label propagation
  * needs O(diameter) rounds — a chain of pairwise near-dups, e.g.
  * successive crawl snapshots, defeats it).
  */
object GraphDedup {
  type Q = (SparkSession, String) => DataFrame
  import Fixtures._

  /** Connected components of an undirected graph given as (src, dst)
    * edge rows (any orderable id type). Returns (node, cluster_id)
    * where cluster_id is the component's minimum node id; singleton
    * nodes (no edges) simply don't appear — callers left-join and
    * coalesce to the node's own id.
    *
    * Each round materializes the shrunken edge set with an EAGER
    * `localCheckpoint`: iterative plans otherwise nest one join tree
    * per round and re-execute the whole history each action (on a
    * cluster you'd use a reliable `checkpoint` to survive executor
    * loss; the lineage-truncation point is the same). Convergence is
    * detected by the edge set's (count, order-insensitive hash-sum)
    * signature going stable — one tiny aggregate per round over an
    * output-sized relation, not a driver collect of the edges.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.select(least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct()

    // order-insensitive and overflow-free under ANSI mode (a SUM of
    // 64-bit hashes overflows; XOR cannot) — safe because the edge set
    // is distinct, so there are no even-multiplicity cancellations
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(lo, hi))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var e = canon(edges).localCheckpoint(true)
    var sig = signature(e)
    var stable = false
    var iter = 0
    while (!stable && iter < maxIter) {
      // large-star: every node u links its LARGER neighbors to the
      // minimum of its closed neighborhood — long chains contract
      // toward small ids without ever growing a node's degree beyond
      // what small-star can absorb.
      val nbr = e.select(col("lo").as("u"), col("hi").as("v"))
        .union(e.select(col("hi").as("u"), col("lo").as("v")))
      val minN = nbr.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = canon(
        nbr.filter(col("v") > col("u"))
          .join(minN, "u")
          .select(col("v").as("src"), col("m").as("dst"))
      )
      // small-star: on the downward-oriented result, every node links
      // its smaller neighbors (and itself) to their common minimum —
      // this is the step that actually flattens into stars.
      val down = large.select(col("hi").as("u"), col("lo").as("v"))
      val minD = down.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = canon(
        down.join(minD, "u")
          .select(col("v").as("src"), col("m").as("dst"))
          .union(minD.select(col("u").as("src"), col("m").as("dst")))
      ).localCheckpoint(true)
      val nextSig = signature(small)
      stable = nextSig == sig
      sig = nextSig
      e = small
      iter += 1
    }
    // converged: the edge set IS the component map (hi = member,
    // lo = component-minimum root; roots appear only on the lo side)
    e.select(col("hi").as("node"), col("lo").as("cluster_id"))
      .union(e.select(col("lo"), col("lo")).distinct())
  }

  /** INCREMENTAL connected components: merge a batch of NEW edges into
    * an existing component map without re-walking the whole graph —
    * the cluster-level twin of the incremental dedup probe (a daily
    * increment's pairs must not recluster a 100 TB corpus).
    *
    * Only components TOUCHED by a new edge are recomputed: the
    * affected clusters' star edges (root ← member, already height-1
    * from the previous run — CC over them converges almost
    * immediately) union the new edges form a subgraph that is
    * increment-sized, not corpus-sized; untouched clusters pass
    * through by anti-join. The result provably equals full CC over
    * (old ∪ new) edges: any cluster containing a new-edge endpoint is
    * in the touched set by construction, so no merge can span two
    * untouched clusters (GraphDedupSpec pins the equivalence,
    * including the two-clusters-merged-by-one-edge case).
    */
  def incrementalComponents(prevStars: DataFrame, newEdges: DataFrame): DataFrame = {
    val endpoints = newEdges
      .select(col("src").as("node"))
      .union(newEdges.select(col("dst").as("node")))
      .distinct()
    val touchedRoots = prevStars.join(endpoints, "node").select(col("cluster_id")).distinct()
    val touchedStars = prevStars.join(touchedRoots, Seq("cluster_id"))
    val subEdges = touchedStars
      .select(col("node").as("src"), col("cluster_id").as("dst"))
      .union(newEdges.select(col("src"), col("dst")))
    val untouched = prevStars.join(touchedRoots, Seq("cluster_id"), "left_anti")
    untouched.select(col("node"), col("cluster_id")).union(connectedComponents(subEdges))
  }

  /** Persisted component-map lifecycle — the cluster-level analog of
    * saveMinhashIndex/appendToMinhashIndex: the map lives as a managed
    * table BUCKETED BY node, because daily maintenance's first touch
    * is "which clusters do the increment's endpoints belong to" — a
    * join on node in which the corpus-sized map side must never
    * shuffle. Bucketing gives exactly that asymmetry: the map scans
    * in place, only the increment (KBs) shuffles into the map's
    * bucketing (BucketingSpec-style shuffle-count proof in
    * GraphDedupSpec). The root-keyed joins that follow broadcast,
    * since touched roots are increment-sized.
    */
  def saveClusterMap(cc: DataFrame, table: String, nBuckets: Int = 32): Unit =
    graft.sources.Bucketing.writeBucketed(
      cc.select(col("node"), col("cluster_id")),
      table,
      "node",
      nBuckets
    )

  /** One maintenance cycle: merge a batch of new edges into the
    * persisted map and write it back. The merged map is materialized
    * (eager localCheckpoint) BEFORE the overwrite — the write targets
    * the same table the merge reads, and Spark will not read-under-
    * overwrite; on a cluster the staging write + swap of
    * core/Compaction is the equivalent move.
    */
  def maintainClusterMap(spark: SparkSession, table: String, newEdges: DataFrame, nBuckets: Int = 32): Unit = {
    val merged = incrementalComponents(spark.table(table), newEdges).localCheckpoint(true)
    saveClusterMap(merged, table, nBuckets)
  }

  /** Shared tail of the cluster queries: every document labeled with
    * its component (itself when unclustered), plus size and
    * representative flag.
    */
  private def clusterMap(docs: DataFrame, cc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(col("doc_id"))
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn(
        "cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))).cast("bigint")
      )
      .withColumn(
        "is_rep",
        when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L)
      )
      .orderBy("doc_id")
  }

  /** Near-dup clusters over the documents table: the MinHash-LSH
    * verified pairs at Jaccard >= 0.5 are the edges; every document
    * gets its component's min doc_id as cluster_id (itself when it has
    * no near-dups), plus the cluster size and a keep/drop-style
    * representative flag — the exact shape the composed pipeline's
    * "keep one per cluster" stage consumes. Edges are output-sized
    * (near-dup pairs), so the CC rounds shuffle KBs even when the
    * corpus is TBs; the only corpus-scale work is the LSH pass that
    * produced the pairs.
    */
  val dedupClusters: Q = (s, d) => {
    val docs = documents(s, d)
    val edges = Dedup
      .lshCandidatesWithJaccard(docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    clusterMap(docs, connectedComponents(edges))
  }

  /** The incremental route as an oracle-gated query: yesterday's
    * corpus is the even docs (its pairs → the previous component map),
    * today's increment brings every pair touching an odd doc; the
    * merged map must equal the full-graph clustering bit for bit — so
    * this query shares dedup_clusters' oracle verbatim. The pair
    * relation is cached across the split (one LSH pass, two filters).
    */
  val dedupClustersIncremental: Q = (s, d) => {
    val docs = documents(s, d)
    val pairs = Dedup
      .lshCandidatesWithJaccard(docs, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .cache()
    try {
      val bothEven = col("src") % 2 === 0 && col("dst") % 2 === 0
      val prev = connectedComponents(pairs.filter(bothEven))
      // materialize the merged map BEFORE releasing the pair cache —
      // the lazy plan otherwise re-derives touchedRoots (and with it
      // the whole LSH pass) at execution time
      val merged = incrementalComponents(prev, pairs.filter(!bothEven)).localCheckpoint(true)
      clusterMap(docs, merged)
    } finally pairs.unpersist(blocking = false)
  }

  def queries: Map[String, Q] = Map(
    "dedup_clusters" -> dedupClusters,
    "dedup_clusters_incremental" -> dedupClustersIncremental
  )

  /** DuckDB oracle: the same verified-pair CTE chain as
    * dedup_minhash_lsh, then components via a recursive reachability
    * walk (min reachable id = cluster id). The recursion enumerates
    * all (node, reachable) pairs — quadratic in component size, which
    * is exactly why the Spark side uses large-star/small-star instead;
    * for an oracle over fixture-scale components it is the simplest
    * correct spelling.
    */
  def oracles: Map[String, String] = Map(
    // the incremental route must equal the full clustering bit for bit
    "dedup_clusters_incremental" -> clustersOracle,
    "dedup_clusters" -> clustersOracle
  )

  private lazy val clustersOracle: String =
      s"""WITH RECURSIVE ${Dedup.shinglesSqlFrom("documents")},
         |${Dedup.minhashSql},
         |${Dedup.bandsSql},
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS n_inter
         |  FROM pairs p
         |  JOIN sh x ON x.doc_id = p.doc_a
         |  JOIN sh y ON y.doc_id = p.doc_b AND y.shingle = x.shingle
         |  GROUP BY p.doc_a, p.doc_b),
         |edges AS (
         |  SELECT p.doc_a AS src, p.doc_b AS dst
         |  FROM pairs p
         |  JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |  JOIN sizes sa ON sa.doc_id = p.doc_a
         |  JOIN sizes sb ON sb.doc_id = p.doc_b
         |  WHERE round(CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter), 6) >= 0.5),
         |und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
         |walk(node, reach) AS (
         |  SELECT DISTINCT src, src FROM und
         |  UNION
         |  SELECT w.node, u.dst FROM walk w JOIN und u ON u.src = w.reach),
         |root AS (SELECT node, min(reach) AS cluster_id FROM walk GROUP BY node),
         |lab AS (
         |  SELECT d.doc_id, coalesce(r.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN root r ON r.node = d.doc_id)
         |SELECT doc_id, cluster_id,
         |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
         |  CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_rep
         |FROM lab ORDER BY doc_id""".stripMargin
}
