package graft.queries

import graft.operators.PageRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relationship tables. Connected components
  * (q40, operators/DedupClusters) covers the clustering face; this
  * module carries the centrality face. Oracle strategy: the iteration
  * count is fixed and small, so the DuckDB oracle UNROLLS the same
  * fixed-point update — both engines run exact integer arithmetic, so
  * the hash-match is bit-for-bit (see operators/PageRank).
  */
object Graph {

  /** Half-edge list (u < v) of the part co-purchase graph — parts
    * sharing an order — shared by q153/q179/q202: distinct (order,
    * part) rows self-joined on the order key. An r18 rewrite replaced
    * this with groupBy(order) + sort_array(collect_set(part)) + a
    * position-pair explosion — two exchanges instead of four and no
    * join — and measured 0.55–0.62× on the subset bench: collect_set
    * is a TypedImperativeAggregate (ObjectHashAggregate, no codegen,
    * per-group heap sets over 150 k orders), and it loses to the fully
    * codegen'd self-join by more than the two saved exchanges buy.
    * Kept the join form (guide §1.1: the "ideal" plan lost to the
    * gotcha; measurements win). */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PageRank over the bipartite part↔supplier sourcing graph
    // (distinct lineitem pairs, symmetrized). Part nodes get even ids,
    // suppliers odd — disjoint by construction. 3 damped iterations
    // (d = 0.85) in fixed-point; ranks are comparable across runs and
    // engines because no float ever enters the pipeline.
    "q92_pagerank" -> { (s, d) =>
      val e0 = Tables.lineitem(s, d)
        .select((col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      val e = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      PageRank.ranks(e, 3).select(col("id").as("node_id"), col("rank"))
    },

    // BFS HOP HISTOGRAM — frontier-expansion shortest paths, the graph
    // family (q92 ranks, q153 counts, q179 peels) still lacked a
    // TRAVERSAL: unweighted distances from a deterministic source over
    // the symmetrized part↔supplier graph, 4 bounded rounds. The
    // distributed shape is frontier-sized, not graph-sized: each round
    // joins ONLY the newest frontier against the edge list (shuffle
    // hash join on the edge key), then folds min-distance with a
    // partial-aggregable groupBy; localCheckpoint truncates the
    // iterative lineage (the q179 BSP discipline). Output is the
    // per-distance histogram with an id-sum checksum, so the driver
    // hash pins every node's exact hop count. The oracle walks the
    // same frontier with a recursive UNION CTE — (id, d) rows dedup
    // per step, so it traverses states, never paths.
    "q217_bfs_hops" -> { (s, d) =>
      val e0 = Tables.lineitem(s, d)
        .select((col("l_partkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v")).distinct()
      // r18 (guide §2.4): hash-partition the edge list by its join key
      // ONCE and CACHE it — InMemoryTableScan advertises the cached
      // plan's hashpartitioning(u), so every round's frontier⋈edges
      // join exchanges only the frontier, never the (graph-sized) edge
      // side again. (localCheckpoint does NOT work here: under AQE the
      // captured outputPartitioning is UnknownPartitioning(0) —
      // measured, plans/r18/partcheck — and every round re-exchanged
      // the edges anyway.) The cache is operator-internal iteration
      // state (the GraphX pattern), released before returning.
      val e = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u")).persist()
      // source = 2·min(l_partkey), read off the CHECKPOINTED edges
      // (part nodes are the even ids; every lineitem part reaches e0) —
      // was a second full lineitem scan for one scalar (guide §1.2)
      val srcId = e.filter(col("u") % 2 === 0)
        .agg(min(col("u"))).collect()(0).getLong(0)
      val sp = s; import sp.implicits._
      var dist = Seq((srcId, 0L)).toDF("id", "dist").localCheckpoint()
      var frontier = dist
      for (r <- 1 to 4) {
        val next = frontier.join(e, col("id") === col("u"))
          .select(col("v").as("id"), lit(r.toLong).as("dist"))
          .distinct()
        // new frontier = reached-this-round minus already-settled
        frontier = next.join(dist.select(col("id").as("seen")),
            col("id") === col("seen"), "left_anti")
          .localCheckpoint()
        dist = dist.unionAll(frontier).localCheckpoint()
      }
      // every round's dist is materialized (eager localCheckpoint), so
      // the returned frame no longer references the cached edges
      e.unpersist(false)
      dist.groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"), sum(col("id")).as("id_sum"))
    },

    // WEIGHTED shortest paths — q217's unweighted BFS can't price an
    // edge, so this is 4 rounds of Bellman–Ford relaxation over the
    // part↔supplier graph weighted by each pair's MIN shipped
    // quantity: dist_{r}(v) = min(dist_{r-1}(v), min over edges (u,v)
    // of dist_{r-1}(u) + w). Unlike BFS, a settled node can improve in
    // a later round (a longer-hop but lighter path), so every round
    // relaxes the FULL distance table: one shuffle join against the
    // edge list + one partial-aggregable min, lineage checkpointed —
    // the distributed Bellman–Ford shape, R bounded. Quantities are
    // integral doubles, so the Long cast is exact in both engines and
    // every distance is an exact integer.
    "q220_sssp" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .groupBy((col("l_partkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
        .agg(min(col("l_quantity")).cast("long").as("w"))
      // r18: same two moves as q217 — edge list hash-partitioned by the
      // join key and CACHED (see q217: a localCheckpoint drops the
      // partitioning under AQE; the cached scan keeps it, so each
      // relaxation round exchanges only the distance table), and the
      // source scalar read off the cached edges instead of a second
      // lineitem scan
      val e = li.unionAll(li.select(col("v").as("u"), col("u").as("v"), col("w")))
        .repartition(col("u")).persist()
      val srcId = e.filter(col("u") % 2 === 0)
        .agg(min(col("u"))).collect()(0).getLong(0)
      val sp = s; import sp.implicits._
      var dist = Seq((srcId, 0L)).toDF("id", "dist").localCheckpoint()
      for (_ <- 1 to 4) {
        val relaxed = dist.join(e, col("id") === col("u"))
          .select(col("v").as("id"), (col("dist") + col("w")).as("dist"))
        dist = dist.unionAll(relaxed)
          .groupBy(col("id")).agg(min(col("dist")).as("dist"))
          .localCheckpoint()
      }
      e.unpersist(false) // rounds are materialized; edges no longer referenced
      dist.select(col("id").as("node_id"), col("dist"))
    },

    // HITS hubs/authorities over the user→event_type bipartite graph —
    // the OTHER classic eigenvector ranking next to q92's PageRank,
    // with its natural asymmetry intact: hubs live on the CORPUS-sized
    // side (users), authorities on the VALUE-DOMAIN side (types). Two
    // full mutual-reinforcement rounds in fixed-point integers
    // (authorities L1-normalized to 10¹² each round by truncating
    // division — the q197 discipline; the oracle unrolls the identical
    // HUGEINT chain). Scale shape: the edge list shuffles ONCE
    // (distinct); each round is an edge⋈broadcast(|types| authorities)
    // narrow pass + a partial-aggregable per-user sum, then an
    // edge⋈hub shuffle join + per-type sum that collapses to ≤|types|
    // rows — the hub vector NEVER reaches the driver; only the
    // |types|-bounded authority vector does (the q197 bounded-fold
    // class). Sums cross Long range at cluster scale, so every
    // corpus-sized sum runs in DECIMAL(38,0).
    "q213_hits" -> { (s, d) =>
      val Scale = BigInt("1000000000000")
      val e = Tables.events(s, d).select(col("user_id"), col("event_type"))
        .distinct().localCheckpoint() // reused by all rounds
      // round 1 folds a0(t) = SCALE into the algebra: h1(u) = SCALE·deg(u),
      // so a1'(t) = SCALE · Σ_{u∈N(t)} deg(u)
      val deg = e.groupBy(col("user_id")).agg(count(lit(1)).as("h"))
      def authOf(hubs: DataFrame): Seq[(String, BigInt)] =
        e.join(hubs, "user_id")
          .groupBy(col("event_type"))
          .agg(sum(col("h").cast("decimal(38,0)")).as("ap"))
          .collect()
          .map(r => (r.getString(0), BigInt(r.getDecimal(1).toBigInteger)))
          .toSeq
      def normalize(ap: Seq[(String, BigInt)]): Seq[(String, Long)] = {
        val total = ap.map(_._2).sum
        // a(t) = ap(t)·SCALE // Σap — truncating, non-negative: the
        // same chain as the oracle's HUGEINT //
        ap.map { case (t, v) => (t, (v * Scale / total).toLong) }.sortBy(_._1)
      }
      val a1 = normalize(authOf(deg))
      val sp = s; import sp.implicits._
      val a1Df = a1.toDF("event_type", "a")
      val h2 = e.join(broadcast(a1Df), "event_type")
        .groupBy(col("user_id")).agg(sum(col("a")).as("h"))
      val a2 = normalize(authOf(h2))
      val nUsers = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
        .as[(String, Long)].collect().toMap
      s.createDataFrame(a2.map { case (t, a) => (t, a, nUsers(t)) })
        .toDF("event_type", "auth_x1e12", "n_users")
    },

    // Hierarchical SUBTREE rollup — the org-chart/BOM aggregation
    // pattern over the implicit binary tree parent(v) = v div 2 on doc
    // ids (dense ids ⇒ every parent exists; depth = bit length). The
    // scalable plan is ANCESTOR EXPANSION, not iteration: each row
    // emits its own O(log n) ancestor chain with a narrow
    // transform+distinct+explode (shiftright — no join, no loop), and
    // ONE partial-aggregable shuffle on the ancestor id produces every
    // node's subtree docs/chars. n·log n exploded rows beats log n
    // sequential join rounds at cluster scale (one exchange vs a
    // synchronization barrier per level). The ORACLE takes the
    // structurally opposite route — a DuckDB RECURSIVE CTE walking
    // ancestor edges — so the hash gate cross-checks an iterative
    // fixpoint against a closed-form expansion.
    "q148_tree_rollup" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("n_chars"), explode(expr(
          "array_distinct(transform(sequence(0, 31), i -> shiftright(doc_id, i)))")).as("node"))
        .groupBy(col("node"))
        .agg(count(lit(1)).as("subtree_docs"), sum(col("n_chars")).as("subtree_chars"))
        .withColumn("depth",
          expr("CASE WHEN node = 0 THEN 0 ELSE length(bin(node)) END").cast("long"))
        .select(col("node"), col("depth"), col("subtree_docs"), col("subtree_chars"))
    },

    // TRIANGLE count + global transitivity of the part co-purchase
    // graph (parts sharing an order, the classic market-basket graph).
    // Edge build: lineitem self-joined on the ORDER key — fan-out
    // bounded by order size (≤7 lines/order in this schema), so the
    // pair explosion is constant-factor, never quadratic in the table.
    // Counting runs COMPACT-FORWARD (Latapy'08 / Schank-Wagner): every
    // edge is oriented from its lower-(degree, id) endpoint, and the
    // triangles through edge (u,v) are |N⁺(u) ∩ N⁺(v)| — per-edge
    // intersection of SORTED oriented-adjacency arrays via the q51
    // codegen merge walk (SortedLongIntersectSize), NOT a wedge
    // materialization: the arithmetic is the same O(m^{3/2}) bound
    // (out-degree ≤ √(2m)), but the plan ships m rows with array
    // payloads through two hash joins instead of exploding the
    // O(m^{3/2}) wedge stream through an exchange (measured 6.4 s →
    // wedge-free on the sf0.1 co-purchase graph). The lexicographic
    // (degree, id) order needs NO global rank: each edge carries its
    // endpoints' degrees, so orientation is a narrow predicate. The
    // five summary scalars ride back as 1-row bounded collects (the
    // q144 digest class — a constant-key join would plan the
    // nested-loop the sweep forbids).
    "q153_triangles" -> { (s, d) =>
      val e = coPurchaseEdges(s, d)
        .localCheckpoint() // reused by degrees, orientation, closing join
      val deg = e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // reused by both endpoint joins + wedge total
      val ed = e
        .join(deg.select(col("node").as("u"), col("c").as("cu")), "u")
        .join(deg.select(col("node").as("v"), col("c").as("cv")), "v")
      val lt = (col("cu") < col("cv")) ||
        (col("cu") === col("cv") && col("u") < col("v"))
      val o = ed.select(
          when(lt, col("u")).otherwise(col("v")).as("s"),
          when(lt, col("v")).otherwise(col("u")).as("t"))
        .localCheckpoint() // reused: edge stream + both adjacency builds
      val adj = o.groupBy(col("s"))
        .agg(sort_array(collect_list(col("t"))).as("nbrs"))
        .localCheckpoint() // reused by both endpoint joins
      val intersectSize = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        org.apache.spark.sql.GraftSqlGlue.column(
          graft.functions.SortedLongIntersectSize(
            org.apache.spark.sql.GraftSqlGlue.expression(a),
            org.apache.spark.sql.GraftSqlGlue.expression(b)))
      // merge-join hints on the two adjacency joins: AQE's shuffled-hash
      // choice builds the ARRAY-valued adj side in execution memory —
      // fine at small scale, but deserialized neighbor arrays are ~4×
      // their map-output size, and the sf10 probe measured flaky
      // AGGREGATE/ACQUIRE OOM from exactly that underestimate (two
      // builds + three checkpointed edge lists sharing the pool).
      // Sort-merge streams and spills — per-task memory stays one
      // sort buffer regardless of graph size.
      val nTri = o
        .join(adj.select(col("s"), col("nbrs").as("nu")).hint("merge"), Seq("s"))
        .join(adj.select(col("s").as("t"), col("nbrs").as("nv")).hint("merge"), Seq("t"))
        .agg(coalesce(sum(intersectSize(col("nu"), col("nv"))), lit(0L)).as("tri"))
        .collect()(0).getLong(0)
      // nodes, edges (= Σdeg/2), and wedges all come from the degree
      // table in ONE bounded job — three separate actions would re-read
      // it three times
      val st = deg.agg(count(lit(1)).as("nn"), sum(col("c")).as("sc"),
        sum(expr("c * (c - 1) div 2")).as("w")).collect()(0)
      val nNodes = st.getLong(0)
      val nEdges = st.getLong(1) / 2
      val nWedges = st.getLong(2)
      val transitivity = if (nWedges == 0) 0L else 3000L * nTri / nWedges
      s.range(1).select(lit(nNodes).as("n_nodes"), lit(nEdges).as("n_edges"),
        lit(nWedges).as("n_wedges"), lit(nTri).as("n_triangles"),
        lit(transitivity).as("transitivity_x1000"))
    },

    // K-CORE EXTRACTION (k = 64) of the q153 co-purchase graph via
    // operators/KCore — the BSP peel loop with localCheckpointed
    // frontiers. Rounds are CAPPED at 6 in BOTH engines (the oracle
    // unrolls the same 6 peels, the q92 fixed-iteration discipline) —
    // but k-core is a FIXPOINT semantic, so the row carries an explicit
    // `converged` bit (min-degree-derived, no extra job) that the
    // oracle pins TRUE: a graph deep enough to exhaust the cap flips
    // the bit and fails the hash instead of silently returning a
    // not-yet-core subgraph. The strict (throwing) posture lives on
    // the operator and is spec-pinned on a deliberately deep-peel
    // graph (GraphSpec).
    "q179_kcore" -> { (s, d) =>
      val e = coPurchaseEdges(s, d)
      val r = graft.operators.KCore.peel(e, k = 64, maxRounds = 6)
      s.range(1).select(lit(r.k).as("k"), lit(r.nNodes).as("n_nodes"),
        lit(r.nCore).as("n_core"), lit(r.nRemoved).as("n_removed"),
        lit(r.nRounds).as("n_rounds"), lit(r.coreEdges).as("core_edges"),
        lit(r.coreMinDeg).as("core_min_deg"), lit(r.converged).as("converged"))
    },

    // DEGREE DISTRIBUTION of the co-purchase graph in log2 buckets —
    // the first diagnostic every graph operator's skew defense is
    // sized against (hub mass decides salting, orientation caps,
    // broadcast sides). The bucket index is the node degree's binary
    // WIDTH (length(bin(c)) − 1 = ⌊log2 c⌋, exact in integers — a
    // floating log2 can land a power of two on the wrong side of the
    // bucket edge). Shapes: q153's edge derivation, one
    // partial-aggregable degree count, one bounded (≤ 64-bucket)
    // rollup.
    "q202_degree_distribution" -> { (s, d) =>
      val e = coPurchaseEdges(s, d)
      e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("c"))
        .withColumn("bucket", (length(expr("bin(c)")) - 1).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_nodes"), min(col("c")).as("min_deg"),
          max(col("c")).as("max_deg"), sum(col("c")).as("degree_mass"))
    }
  )

  private def prOracle: String = {
    val scale = 1000000000000L
    def iter(k: Int): String =
      s"""s$k AS (SELECT e.dst AS id, sum(r.rank // r.outdeg) AS s
            FROM e JOIN r${k - 1} r ON e.src = r.id GROUP BY 1),
          r$k AS (SELECT d.id, d.outdeg,
              (15 * (SELECT base FROM p) + 85 * coalesce(s$k.s, 0)) // 100 AS rank
            FROM deg d LEFT JOIN s$k ON d.id = s$k.id)"""
    s"""WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem),
         e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         deg AS (SELECT src AS id, count(*) AS outdeg FROM e GROUP BY 1),
         p AS (SELECT $scale // count(*) AS base FROM deg),
         r0 AS (SELECT id, outdeg, (SELECT base FROM p) AS rank FROM deg),
         ${iter(1)}, ${iter(2)}, ${iter(3)}
       SELECT id AS node_id, rank::BIGINT AS rank FROM r3"""
  }

  val oracle: Map[String, String] = Map(
    "q92_pagerank" -> prOracle,

    // four unrolled relaxation rounds, each the same union + min fold
    "q220_sssp" -> {
      def round(i: Int): String =
        s"""r$i AS (SELECT id, min(dist) AS dist FROM (
              SELECT id, dist FROM r${i - 1}
              UNION ALL
              SELECT e.v AS id, r${i - 1}.dist + e.w AS dist
              FROM r${i - 1} JOIN e ON e.u = r${i - 1}.id) GROUP BY 1)"""
      s"""WITH li AS (SELECT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v,
                min(l_quantity)::BIGINT AS w
              FROM lineitem GROUP BY 1, 2),
          e AS (SELECT u, v, w FROM li UNION ALL SELECT v, u, w FROM li),
          r0 AS (SELECT (SELECT min(l_partkey) * 2 FROM lineitem) AS id, 0::BIGINT AS dist),
          ${round(1)}, ${round(2)}, ${round(3)}, ${round(4)}
         SELECT id AS node_id, dist::BIGINT AS dist FROM r4"""
    },

    // recursive UNION walks (id, d) STATES — duplicates collapse per
    // step, so the CTE grows by nodes×hops, never by path count; the
    // final min(d) per id matches the engine's settled-frontier rule
    "q217_bfs_hops" ->
      """WITH RECURSIVE
         li AS (SELECT DISTINCT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v FROM lineitem),
         e AS (SELECT u, v FROM li UNION SELECT v, u FROM li),
         walk(id, d) AS (
           SELECT (SELECT min(l_partkey) * 2 FROM lineitem), 0
           UNION
           SELECT e.v, w.d + 1 FROM walk w JOIN e ON e.u = w.id WHERE w.d < 4
         )
         SELECT d::BIGINT AS dist, count(*)::BIGINT AS n_nodes, sum(id)::BIGINT AS id_sum
         FROM (SELECT id, min(d) AS d FROM walk GROUP BY 1)
         GROUP BY 1""",

    // two unrolled HITS rounds; every sum and truncating quotient in
    // HUGEINT, the exact chain the driver-side BigInt fold runs
    "q213_hits" ->
      """WITH e AS (SELECT DISTINCT user_id, event_type FROM events),
         deg AS (SELECT user_id, count(*)::HUGEINT AS h FROM e GROUP BY 1),
         a1p AS (SELECT e.event_type, sum(deg.h)::HUGEINT AS ap
                 FROM e JOIN deg USING (user_id) GROUP BY 1),
         s1 AS (SELECT sum(ap) AS s FROM a1p),
         a1 AS (SELECT event_type, (ap * 1000000000000 // (SELECT s FROM s1)) AS a FROM a1p),
         h2 AS (SELECT e.user_id, sum(a1.a)::HUGEINT AS h
                FROM e JOIN a1 USING (event_type) GROUP BY 1),
         a2p AS (SELECT e.event_type, sum(h2.h)::HUGEINT AS ap
                 FROM e JOIN h2 USING (user_id) GROUP BY 1),
         s2 AS (SELECT sum(ap) AS s FROM a2p),
         nu AS (SELECT event_type, count(*)::BIGINT AS n_users FROM e GROUP BY 1)
         SELECT a2p.event_type,
                (a2p.ap * 1000000000000 // (SELECT s FROM s2))::BIGINT AS auth_x1e12,
                nu.n_users
         FROM a2p JOIN nu USING (event_type)""",

    // recursive ancestor walk: (ancestor, descendant) pairs from each
    // doc up to the root, then one aggregate per ancestor — the
    // iterative mirror of the engine's closed-form expansion
    "q148_tree_rollup" ->
      """WITH RECURSIVE anc(node, leaf) AS (
           SELECT doc_id, doc_id FROM documents
           UNION ALL
           SELECT a.node // 2, a.leaf FROM anc a WHERE a.node > 0
         )
         SELECT a.node,
                (CASE WHEN a.node = 0 THEN 0 ELSE length(bin(a.node)) END)::BIGINT AS depth,
                count(*)::BIGINT AS subtree_docs,
                sum(d.n_chars)::BIGINT AS subtree_chars
         FROM anc a JOIN documents d ON a.leaf = d.doc_id
         GROUP BY 1""",

    // the same compact-forward orientation, as three relational joins
    "q153_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
          e AS (SELECT DISTINCT a.p AS u, b.p AS v
                FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
          und AS (SELECT u AS node FROM e UNION ALL SELECT v FROM e),
          deg AS (SELECT node, count(*)::BIGINT AS c FROM und GROUP BY 1),
          ed AS (SELECT e.u, e.v, du.c AS cu, dv.c AS cv
                 FROM e JOIN deg du ON du.node = e.u
                        JOIN deg dv ON dv.node = e.v),
          o AS (SELECT CASE WHEN cu < cv OR (cu = cv AND u < v) THEN u ELSE v END AS s,
                       CASE WHEN cu < cv OR (cu = cv AND u < v) THEN v ELSE u END AS t,
                       CASE WHEN cu < cv OR (cu = cv AND u < v) THEN cv ELSE cu END AS ct
                FROM ed),
          tri AS (SELECT count(*)::BIGINT AS n_triangles
                  FROM o e1 JOIN o e2 ON e1.s = e2.s
                    AND (e1.ct < e2.ct OR (e1.ct = e2.ct AND e1.t < e2.t))
                  JOIN o e3 ON e3.s = e1.t AND e3.t = e2.t),
          st AS (SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
                        (SELECT count(*) FROM e)::BIGINT AS n_edges,
                        (SELECT sum(c * (c - 1) // 2) FROM deg)::BIGINT AS n_wedges)
         SELECT st.n_nodes, st.n_edges, st.n_wedges, tri.n_triangles,
                (CASE WHEN st.n_wedges = 0 THEN 0
                      ELSE 3000 * tri.n_triangles // st.n_wedges END)::BIGINT
                  AS transitivity_x1000
         FROM st, tri""",

    "q179_kcore" -> kcoreOracle,

    "q202_degree_distribution" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
          e AS (SELECT DISTINCT a.p AS u, b.p AS v
                FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
          und AS (SELECT u AS node FROM e UNION ALL SELECT v FROM e),
          deg AS (SELECT node, count(*)::BIGINT AS c FROM und GROUP BY 1)
         SELECT (len(bin(c)) - 1)::BIGINT AS bucket, count(*)::BIGINT AS n_nodes,
                min(c)::BIGINT AS min_deg, max(c)::BIGINT AS max_deg,
                sum(c)::BIGINT AS degree_mass
         FROM deg GROUP BY 1"""
  )

  /** the same 6 peel rounds, unrolled (the q92 fixed-iteration oracle
    * discipline): b_i = the round-i kill set, e_i = the surviving
    * edges; converged rounds contribute empty kill sets on both sides. */
  private def kcoreOracle: String = {
    val k = 64
    val R = 6
    // AS MATERIALIZED: each round references its predecessor 3× — left
    // to the inliner the 6-round chain re-expands exponentially
    def round(i: Int): String =
      s"""b$i AS MATERIALIZED (SELECT u FROM (SELECT u, count(*) AS c FROM e${i - 1}
              GROUP BY 1) WHERE c < $k),
          e$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e
                  WHERE e.u NOT IN (SELECT u FROM b$i)
                    AND e.v NOT IN (SELECT u FROM b$i))"""
    val rounds = (1 to R).map(round).mkString(",\n          ")
    val nRounds = (1 to R)
      .map(i => s"(CASE WHEN EXISTS (SELECT 1 FROM b$i) THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val nRemoved = (1 to R).map(i => s"(SELECT count(*) FROM b$i)").mkString(" + ")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
          und AS (SELECT DISTINCT a.p AS u, b.p AS v
                  FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
          e0 AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
          n0 AS (SELECT count(DISTINCT u)::BIGINT AS n FROM e0),
          $rounds,
          fd AS (SELECT u, count(*)::BIGINT AS c FROM e$R GROUP BY 1)
         SELECT $k::BIGINT AS k, (SELECT n FROM n0) AS n_nodes,
                count(*)::BIGINT AS n_core,
                ($nRemoved)::BIGINT AS n_removed,
                ($nRounds)::BIGINT AS n_rounds,
                (coalesce(sum(c), 0) // 2)::BIGINT AS core_edges,
                coalesce(min(c), -1)::BIGINT AS core_min_deg,
                (coalesce(min(c), $k) >= $k) AS converged
         FROM fd"""
  }
}
