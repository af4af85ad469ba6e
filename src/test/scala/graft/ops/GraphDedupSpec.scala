package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected components: hand-graph correctness, chain contraction
  * (the case plain min-propagation needs O(diameter) rounds for),
  * determinism, and the cluster query's postconditions.
  */
class GraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphDedup
      .connectedComponents(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("two components and a singleton-free map") {
    // {1,2,3,4} via 1-2, 2-3, 3-4 and {10,11}
    val m = cc(Seq((2L, 1L), (3L, 2L), (3L, 4L), (10L, 11L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain contracts to one component rooted at its minimum") {
    // a 64-node path: diameter 63, far beyond the iteration cap if the
    // algorithm were plain neighbor-min propagation
    val m = cc((1L until 64L).map(i => (i, i + 1)))
    assert(m.keySet == (1L to 64L).toSet)
    assert(m.values.toSet == Set(1L))
  }

  test("duplicate, reversed and self-loop edges do not change the result") {
    val base = cc(Seq((1L, 2L), (2L, 3L)))
    val noisy = cc(Seq((2L, 1L), (1L, 2L), (3L, 2L), (2L, 3L), (1L, 1L), (3L, 3L)))
    assert(base == noisy)
  }

  test("empty edge set yields an empty component map") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("deterministic across runs") {
    val edges = (1L to 200L).flatMap(i => Seq((i, i % 17 + 1000L)))
    assert(cc(edges) == cc(edges))
  }

  private def ccInc(old: Seq[(Long, Long)], fresh: Seq[(Long, Long)]): Map[Long, Long] =
    GraphDedup
      .incrementalComponents(
        GraphDedup.connectedComponents(old.toDF("src", "dst")),
        fresh.toDF("src", "dst")
      )
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("incrementalComponents equals full CC: merge, extend, untouched pass-through") {
    // old: {1,2,3} and {10,11} and {20,21}; new edges merge the first
    // two clusters, extend the graph with a brand-new node, and leave
    // {20,21} untouched
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val fresh = Seq((3L, 10L), (11L, 99L))
    assert(ccInc(old, fresh) == cc(old ++ fresh))
  }

  test("incrementalComponents with new-only nodes and an empty increment") {
    val old = Seq((1L, 2L))
    assert(ccInc(old, Seq((50L, 51L))) == cc(old ++ Seq((50L, 51L))))
    assert(ccInc(old, Seq.empty) == cc(old))
  }

  test("incrementalComponents on the fixture parity split equals the full clustering") {
    val pairs = Dedup
      .lshCandidatesWithJaccard(
        Fixtures.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .cache()
    val bothEven = col("src") % 2 === 0 && col("dst") % 2 === 0
    val prev = GraphDedup.connectedComponents(pairs.filter(bothEven))
    val inc = GraphDedup
      .incrementalComponents(prev, pairs.filter(!bothEven))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = GraphDedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    pairs.unpersist()
    assert(inc == full)
  }

  test("seeded random graphs match a reference union-find") {
    def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
    }
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).filter(e => e._1 != e._2)
      assert(cc(edges) == reference(edges), s"seed $seed")
    }
  }

  test("incremental CC is invariant to arbitrary batch splits") {
    for (seed <- Seq(3, 11, 29)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(40)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)).filter(e => e._1 != e._2)
      val k = rnd.nextInt(edges.size + 1)
      val (old, fresh) = edges.splitAt(k)
      assert(ccInc(old, fresh) == cc(edges), s"seed $seed split $k")
    }
  }

  test("persisted cluster map: maintenance cycles converge to full CC; map side never shuffles") {
    import org.apache.spark.sql.functions.col
    val table = "graft_cc_map_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // day 0: two clusters
    val day0 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    GraphDedup.saveClusterMap(GraphDedup.connectedComponents(day0.toDF("src", "dst")), table)
    // day 1: merge the clusters; day 2: extend with new nodes
    val day1 = Seq((3L, 10L))
    val day2 = Seq((11L, 99L), (200L, 201L))
    GraphDedup.maintainClusterMap(spark, table, day1.toDF("src", "dst"))
    GraphDedup.maintainClusterMap(spark, table, day2.toDF("src", "dst"))
    val served = spark.table(table).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served == cc(day0 ++ day1 ++ day2))
    // the endpoint lookup — maintenance's corpus-sized join — scans the
    // bucketed map in place: the only shuffle is the increment's
    val endpoints = Seq(2L, 99L).toDF("node")
    // broadcast of the tiny increment (0 shuffles) or a sort-merge
    // where ONLY the increment side exchanges (1 shuffle) both prove
    // the bucketed map scanned in place; 2 would mean the map shuffled
    val probe = spark.table(table).join(endpoints.hint("merge"), "node")
    assert(
      graft.sources.Bucketing.shuffleCount(probe) <= 1,
      probe.queryExecution.executedPlan.toString.take(2000)
    )
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("dedup_clusters postconditions: total cover, min-rooted, sizes consistent") {
    val out = GraphDedup.dedupClusters(spark, "/root/testdata/sf0.001").cache()
    val n = out.count()
    assert(n == 500L)
    // every cluster id is the min doc_id of its members, and is itself
    // a member (is_rep flags exactly that row)
    val bad = out
      .groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("mn"), count(lit(1)).as("sz"), sum(col("is_rep")).as("reps"))
      .filter(col("mn") =!= col("cluster_id") || col("reps") =!= 1)
      .count()
    assert(bad == 0L, "cluster ids must be member minima with exactly one representative")
    // cluster_size matches the actual group size
    val szBad = out
      .groupBy(col("cluster_id"), col("cluster_size"))
      .agg(count(lit(1)).as("actual"))
      .filter(col("cluster_size") =!= col("actual"))
      .count()
    assert(szBad == 0L)
    out.unpersist()
  }
}
