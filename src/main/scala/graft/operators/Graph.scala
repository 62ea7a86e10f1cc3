package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph utilities for the dedup pipeline. Near-dup pair
  * finding (MinHash/SimHash/embedding LSH) yields EDGES; an actual
  * dedup sweep needs the transitive closure — one canonical document per
  * connected component — because near-duplication chains (A~B, B~C ⇒
  * {A,B,C} is one cluster even when A~C scores below threshold).
  */
object Graph {

  /** Connected components by hash-min label propagation WITH edge
    * contraction: each round, every component id adopts the minimum
    * neighboring component id, the node→component labels are updated
    * through that mapping, and the edge set is REWRITTEN onto the new
    * component ids (self-loops dropped, duplicates collapsed). Dense
    * clusters — the near-dup shape, where LSH emits ~all pairs of a
    * duplicate group — contract to nothing after the first round, so
    * later rounds run on a vanishing residual graph instead of
    * re-joining the full edge set O(diameter) times. Every step is a
    * hash-partitioned join/aggregate; nothing funnels through one task.
    * (The large-star/small-star variant [Kiveris et al., "Connected
    * Components in MapReduce"] additionally halves path lengths per
    * round; contraction alone is the right simplicity/perf point for
    * dedup workloads, whose components are cliques and short chains.)
    *
    * Lineage is truncated every round with an eager localCheckpoint —
    * an iterative DataFrame loop otherwise compounds the plan and
    * re-executes every prior round at each action. On a cluster, point
    * `spark.checkpoint.dir` at durable storage and swap in `checkpoint`
    * if executor loss matters mid-computation.
    *
    * @return (id, component) for every node appearing in `edges`, where
    *   component = the minimum node id in the connected component.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 50): DataFrame = {
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    // partition-local spanning-forest CONTRACTION before the global
    // propagation (the r6-verdict ask): near-dup pair sources emit ~all
    // pairs of every duplicate group, so a k-clique contributes k(k-1)/2
    // edges — a per-partition union-find replaces each partition's slice
    // of them with ≤(nodes-1) star edges to the local root, preserving
    // connectivity exactly (every original edge lives in one partition,
    // where its endpoints share a root). The global rounds then start
    // from O(V)-ish edges instead of O(pairs). Long-typed node ids only
    // (the dedup shape); anything else skips the pre-pass unchanged.
    // Measured (ScaleProbe cc, 27M pairs / 500k nodes, CACHED pair
    // input): CC net 95.2s → 42.7s. GRAFT_CC_CONTRACT=false disables
    // for A/B. (Probe caveat that cost a day: clearing the session cache
    // between pair materialization and CC re-runs the whole LSH plan
    // TWICE inside the symmetrize union — measure with the cache warm.)
    val contractOn = sys.env.get("GRAFT_CC_CONTRACT")
      .orElse(sys.props.get("graft.cc.contract")).forall(_.toBoolean)
    val debug = sys.env.get("GRAFT_CC_DEBUG").exists(_ == "1")
    var tPhase = System.nanoTime()
    def phase(name: String): Unit = if (debug) {
      val now = System.nanoTime()
      println(f"[cc] $name: ${(now - tPhase) / 1e9}%.1fs")
      tPhase = now
    }
    val longIds = e0.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    // null endpoints: the typed contraction encoder would NPE on them,
    // where the un-contracted path's `a =!= b` filter silently drops
    // them — drop them explicitly first, preserving that semantics
    val e = if (contractOn && longIds)
      localSpanningForest(e0.filter(col("a").isNotNull && col("b").isNotNull))
    else e0
    var compEdges = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    phase("symmetrize+distinct")
    var labels = compEdges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    phase("labels-init")
    var it = 0
    var done = false
    while (!done && it < maxIters) {
      // one hash-min round over the CONTRACTED graph: component ids are
      // self-representing nodes here, so the neighbor minimum IS the
      // neighbor id — no label join needed inside the round
      val rawMapping = compEdges
        .groupBy("a").agg(min("b").as("m"))
        .filter(col("m") < col("a"))
        .localCheckpoint(true)
      phase(s"round$it-mapping")
      done = rawMapping.isEmpty
      // POINTER JUMPING on the mapping: compose it with itself (m := m∘m,
      // doubling the chase depth each pass) until idempotent — a
      // path-shaped component's mapping i→i-1 collapses to i→root in
      // log2(diameter) passes, where plain contraction shortens paths
      // only ~1 hop/round and a long chain exhausts maxIters (a runtime
      // failure, not just slowness). Each pass self-joins the SMALL
      // mapping relation (changed nodes only), never the edge set.
      val mapping = if (done) rawMapping else {
        var mp = rawMapping
        var jumping = true
        var pass = 0
        while (jumping) {
          val composed = resetStats(mp.alias("x")
            .join(mp.alias("y").withColumnRenamed("a", "ya")
                .withColumnRenamed("m", "ym"),
              col("x.m") === col("ya"), "left")
            .select(col("x.a").as("a"),
              coalesce(col("ym"), col("x.m")).as("m"))
            .localCheckpoint(true))
          // fixpoint test on the small relation: any target still mapped?
          jumping = !composed.alias("c")
            .join(mp.alias("o"), col("c.a") === col("o.a"))
            .filter(col("c.m") =!= col("o.m")).isEmpty
          mp = composed
          pass += 1
          phase(s"round$it-jump$pass")
        }
        mp
      }
      if (!done) {
        labels = labels
          .join(mapping.withColumnRenamed("a", "comp"), Seq("comp"), "left")
          .select(col("id"), coalesce(col("m"), col("comp")).as("comp"))
          .localCheckpoint(true)
        phase(s"round$it-labels")
        def remap(df: DataFrame, c: String): DataFrame =
          df.join(mapping.withColumnRenamed("a", c)
              .withColumnRenamed("m", s"__m_$c"), Seq(c), "left")
            .withColumn(c, coalesce(col(s"__m_$c"), col(c)))
            .drop(s"__m_$c")
        val remapped = remap(remap(compEdges, "a"), "b")
          .filter(col("a") =!= col("b"))
        // RE-contract each round (r8): remapping can re-densify the edge
        // set (many nodes collapsing onto one representative turn a
        // sparse forest back into a star-burst of parallel paths on
        // pathological chain graphs) — the same map-side union-find
        // bounds it back to ≤(nodes-1) edges per partition before the
        // distinct() shuffle, so intermediate edge volume stays O(V).
        compEdges = (if (contractOn && longIds) localSpanningForest(remapped)
          else remapped)
          .distinct()
          .localCheckpoint(true)
        phase(s"round$it-remap")
      }
      it += 1
    }
    // exiting via the iteration cap means labels are WRONG (a component
    // split across labels), not merely slow — fail loudly, never return
    // silently incorrect clusters. Contraction shortens chains by ~1-2
    // hops per round, so the cap bounds component diameter.
    if (!done)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters rounds — " +
          s"component diameter exceeds the cap; raise maxIters")
    labels.withColumnRenamed("id", srcCol).withColumnRenamed("comp", "component")
  }

  /** Per-partition union-find contraction: each task folds its slice of
    * the edge list into a forest and emits one `(node, localRoot)` star
    * edge per non-root node — connectivity-equivalent to the slice, at
    * most `nodes-1` edges regardless of how many pairs came in. Pure
    * map-side (no shuffle added); memory is O(distinct nodes per
    * partition), the same order the downstream distinct() would hold.
    */
  private def localSpanningForest(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.as[(Long, Long)].mapPartitions { it =>
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val seen = scala.collection.mutable.LongMap.empty[Unit]
      it.foreach { case (a, b) =>
        seen.update(a, ()); seen.update(b, ())
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      seen.keysIterator.flatMap { x =>
        val r = find(x)
        if (r != x) Iterator((x, r)) else Iterator.empty
      }
    }.toDF("a", "b")
  }

  /** Fixed-iteration PageRank in EXACT integer micro-units (Page et al.
    * 1999, power iteration): rank starts at 1e6 per node; each round
    * every node sends `rank·damp_e6 DIV (1e6·outdeg)` along each
    * distinct out-edge and collects `(1e6 − damp_e6) + Σ inbound`.
    * Every step is 64-bit integer arithmetic with floor division, so
    * the whole trajectory is order-independent and bit-identical in any
    * engine — an unrolled SQL CTE replays it value-for-value (a
    * float-damped PageRank could never hash-match across engines: the
    * inbound sum order alone perturbs ulps). Deviations from the
    * textbook formulation, both deliberate: per-division floors leak
    * O(outdeg) micro-units per node per round, and dangling-node mass
    * is DROPPED rather than redistributed (redistribution needs a
    * global scalar per round — a driver round-trip this operator
    * avoids; callers wanting conservation add a sink self-edge).
    *
    * Scale shape: per iteration one hash join edges⋈ranks (shuffled on
    * src) and one aggregation on dst — the canonical distributed power
    * iteration, nothing through the driver, skew on a hub's IN-degree
    * handled by partial aggregation (the Σ is commutative). Each round
    * localCheckpoints like [[connectedComponents]] so the iterated plan
    * never compounds.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampE6: Long = 850000L): DataFrame = {
    require(iters >= 1 && iters <= 16,
      s"pageRank iterations must be in [1,16], got $iters")
    require(dampE6 >= 0L && dampE6 <= 1000000L,
      s"damping must be micro-units in [0,1e6], got $dampE6")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().cache()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .cache()
    val base = 1000000L - dampE6
    var rank = nodes.withColumn("rank_e6", lit(1000000L))
    for (_ <- 0 until iters) {
      val inbound = e
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          expr(s"rank_e6 * ${dampE6}L DIV (1000000L * outdeg)").as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("c"))
      rank = nodes.join(inbound, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("c"), lit(0L))).as("rank_e6"))
        .localCheckpoint(true)
    }
    rank
  }

  /** Rebuild a (checkpointed) DataFrame on its materialized RDD so plan
    * statistics restart from defaults. Catalyst's size estimate for a
    * join is the PRODUCT of its children's BigInt sizes, and
    * localCheckpoint preserves the origin stats — an iterative self-join
    * loop therefore SQUARES the estimate per pass until the BigInt
    * itself overflows. Resetting the tiny mapping relation's lineage
    * keeps estimates bounded (and conversion cost negligible).
    */
  private def resetStats(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)
}
