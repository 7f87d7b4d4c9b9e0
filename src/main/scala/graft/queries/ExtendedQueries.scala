package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.functions.ZOrder
import graft.text.TextOps

/** Round-3 surface widening: remaining relational shapes (cube, unpivot,
  * set ops, full-frame window navigation, cume_dist, salted skew join,
  * Z-order clustering key) and the training-data preprocessing ops that sit
  * between cleaning and batching (chunking, sequence packing, token
  * entropy, repetition scoring). Everything here has an exact DuckDB twin.
  */
object ExtendedQueries {

  import QueryShared.cents

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- relational shapes ----------------------------------------------

    // CUBE: all 2^k subtotal combinations in one pass (partial-agg
    // friendly; Spark expands grouping sets map-side).
    "q_cube" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Unpivot (wide→long melt): 3 measure columns into (measure, value)
    // rows — a narrow Expand, no shuffle.
    "q_unpivot" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
    }),

    // INTERSECT / EXCEPT: distinct set semantics (shuffle-dedup both
    // sides) — customers ordering in both 1995 and 1996, and 1995-only.
    // The operators under test scan the input once per branch (4× here);
    // the 100TB rewrite when set ops aren't the point is one scan +
    // groupBy(custkey).agg(bool_or per year) and deriving both segments
    // from the flags — same result, one shuffle.
    "q_intersect_except" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val b = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      a.intersect(b).withColumn("seg", lit("both"))
        .unionByName(a.except(b).withColumn("seg", lit("only_1995")))
        .orderBy(col("seg"), col("o_custkey"))
    }),

    // Full-frame window navigation: first/last/2nd shipment per supplier
    // visible on every row (frame = whole partition, not the running
    // default).
    "q_first_last" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      load(s, dir, "lineitem")
        .filter(col("l_suppkey") < 20)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          first(col("l_orderkey")).over(w).as("first_ok"),
          last(col("l_orderkey")).over(w).as("last_ok"),
          nth_value(col("l_orderkey"), 2).over(w).as("second_ok"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // Distribution ranks: cume_dist + percent_rank (tie-stable by SQL
    // definition — exact integer-ratio doubles in both engines).
    "q_cume_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
      load(s, dir, "events")
        .filter(col("event_id") < 2000)
        .select(col("event_id"), col("event_type"),
          cume_dist().over(w).as("cd"),
          percent_rank().over(w).as("pr"))
        .orderBy(col("event_id"))
    }),

    // Recursive CTE (Spark 4 WITH RECURSIVE): transitive chain roots over
    // consecutive same-(lang,source) documents — iterative fixpoint
    // expressed in pure SQL, ONE text shared verbatim with the DuckDB
    // oracle. Runs are short (random corpus), so recursion depth is tiny;
    // unbounded-depth graphs belong to DedupClusters' CC operators.
    "q_recursive_cte" -> ((s, dir) => {
      // SQL-surface queries run in their OWN child session (isolated
      // temp-view catalog, shared SparkContext): the canonical view names
      // the verbatim-shared oracle text requires can then never race with
      // another query's registration under Verify's concurrent pool —
      // the idempotence invariant is structural, not a convention.
      val ss = s.newSession()
      load(ss, dir, "documents").createOrReplaceTempView("documents")
      ss.sql(recursiveChainSql)
    }),

    // Correlated LATERAL subquery with per-row ORDER BY + LIMIT: each
    // customer's latest order — the top-1-per-key shape as a lateral join
    // instead of a window (Spark decorrelates it to a join plan). One SQL
    // text shared verbatim with the oracle.
    "q_lateral_topn" -> ((s, dir) => {
      val ss = s.newSession() // isolated view catalog (see q_recursive_cte)
      load(ss, dir, "customer").createOrReplaceTempView("customer")
      load(ss, dir, "orders").createOrReplaceTempView("orders")
      ss.sql(lateralTopnSql)
    }),

    // Argmin/argmax aggregates: which row holds the extreme value. The
    // ordering key packs (price_cents, orderkey, linenumber) into one
    // exact BIGINT so ties can't exist and both engines pick the same row.
    "q_arg_minmax" -> ((s, dir) => {
      val ord = (round(col("l_extendedprice") * 100).cast("long") * 10000000L
        + col("l_orderkey") * 8 + col("l_linenumber"))
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(max_by(col("l_orderkey"), ord).as("max_price_orderkey"),
          min_by(col("l_orderkey"), ord).as("min_price_orderkey"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // Prefix predicate + two-dimension star arm over the so-far-unused
    // part/supplier tables: startsWith pushes to the parquet scan as
    // StringStartsWith (asserted in PlanShapeSpec) — LIKE 'PROMO%' is a
    // footer-prunable range scan, not a post-scan regex.
    "q_prefix_filter" -> ((s, dir) => {
      val li = load(s, dir, "lineitem")
      val p = load(s, dir, "part").filter(col("p_type").startsWith("PROMO"))
      val sup = load(s, dir, "supplier")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("s_nationkey")).as("n_supp_nations"),
          cents(col("l_extendedprice")).as("promo_cents"))
        .orderBy(col("p_brand"))
    }),

    // Semi-structured extraction: schema-ful from_json over the events
    // props payload (the Spark-native path — a typed struct column, not
    // per-field string plucking).
    "q_json_extract" -> ((s, dir) => {
      load(s, dir, "events")
        .filter(col("event_id") < 3000)
        .select(col("event_id"), col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .orderBy(col("event_id"))
    }),

    // FULL OUTER join with null-producing sides: 1995 vs 1996 per-customer
    // order counts — customers active in only one year surface from either
    // side with the other side null-coalesced.
    "q_full_outer" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      def yearly(y: Int, out: String) =
        o.filter(year(col("o_orderdate")) === y)
          .groupBy(col("o_custkey").as("ck"))
          .agg(count(lit(1)).as(out))
      yearly(1995, "n95").join(yearly(1996, "n96"), Seq("ck"), "full_outer")
        .select(col("ck"),
          coalesce(col("n95"), lit(0L)).as("n95"),
          coalesce(col("n96"), lit(0L)).as("n96"))
        .orderBy(col("ck"))
    }),

    // Time-interval RANGE frame: rolling 1-hour sum per user (frame bounds
    // in event-time, not row counts — peers at the same second share a
    // frame). Values integer-ized per row BEFORE the window sum: engines'
    // segment-tree vs fold accumulation orders diverge on raw doubles.
    "q_range_time" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3600, Window.currentRow)
      load(s, dir, "events")
        .filter(col("event_id") < 5000)
        .withColumn("v_cents", round(col("value") * 100).cast("long"))
        .select(col("event_id"), col("user_id"),
          sum(col("v_cents")).over(w).as("roll_cents"))
        .orderBy(col("event_id"))
    }),

    // Salted skew join: big side salted by full-row hash, small side
    // exploded across salts — same result as the plain join, skew-immune
    // shuffle layout (operators.SkewJoin; oracle is the unsalted join).
    "q_skew_join" -> ((s, dir) => {
      // prune to the join/agg columns BEFORE salting: the salt hash and the
      // shuffle both pay per-byte, and at scale an unpruned fact side is
      // the difference between shuffling 3 columns and shuffling the table
      val li = load(s, dir, "lineitem")
        .select(col("l_orderkey").as("okey"),
          col("l_quantity"), col("l_extendedprice"))
      val o = load(s, dir, "orders")
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      graft.operators.SkewJoin.saltedInnerJoin(li, o, Seq("okey"), 4)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          cents(col("l_extendedprice")).as("sum_base_cents"))
        .orderBy(col("o_orderpriority"))
    }),

    // Z-order clustering key (functions.ZOrder): Morton interleave of two
    // bounded dims; top-100 by key via TakeOrderedAndProject.
    "q_zorder" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_partkey"), lit(65536)).as("zx"),
          pmod(col("l_suppkey"), lit(65536)).as("zy"))
        .withColumn("zkey", ZOrder.zorderKey(col("zx"), col("zy")))
        .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    // Statistical aggregates: stddev/variance/corr/covar per group.
    // Bounded-magnitude columns (quantity ~50, discount ~0.1) keep the
    // engines' different merge orders under the 1e-6 rounding grid;
    // covar/corr against extendedprice-sized values would not.
    "q_stats_agg" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_discount")), 6).as("corr_qd"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6)
            .as("covar_qd"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // Ordered set aggregation: distinct statuses per priority as a sorted
    // joined string (deterministic across engines, unlike raw collect_list).
    "q_array_agg" -> ((s, dir) => {
      load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(concat_ws(",",
            array_sort(collect_set(col("o_orderstatus")))).as("statuses"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // Conditional (filtered) aggregation — count/sum under predicates in
    // one pass over the facts.
    "q_count_if" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(when(col("l_discount") > 0.05, 1).otherwise(0))
            .cast("long").as("n_discounted"),
          sum(when(col("l_quantity") > 25, 1).otherwise(0))
            .cast("long").as("n_bulk"),
          cents(when(col("l_quantity") > 25, col("l_extendedprice"))
            .otherwise(lit(0.0))).as("bulk_cents"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // Frequent-items sketch: corpus tokens → one count-min sketch (scalar
    // subquery), probed per top-20 token by the native cms_estimate
    // expression (functions.CountMin — the read side Spark doesn't ship).
    // The sketch VALUE is engine-specific, but the CMS contract is not:
    // est ≥ true and est ≤ true + εN (ε = 1e-4 here) — emitted as boolean
    // columns DuckDB states as literal TRUE, so the inequality oracle
    // value-checks the sketch without a DuckDB twin of the sketch itself
    // (SketchSpec additionally bounds error at the operator level).
    "d_freq_sketch" -> ((s, dir) => {
      val toks = load(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("term"))
      // ONE subquery carries both the sketch and the token total (a
      // struct field read, not a second corpus scan); the upper bound
      // uses 3εN, not εN: the single-ε overcount bound is probabilistic
      // (P ≤ δ per probe), while P(overcount > 3εN) ≈ (3e)^-depth per
      // probe — regeneration-stable without weakening the contract shape
      val stats = toks.agg(struct(
        expr("count_min_sketch(term, 0.0001d, 0.99d, 42)").as("cms"),
        count(lit(1)).as("n")).as("s"))
      val sCol = org.apache.spark.sql.graftshim.ColumnBridge
        .scalarSubquery(stats)
      val top = toks.groupBy("term").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("term")).limit(20)
      top
        .withColumn("cms_est", graft.functions.CountMin.cms_estimate(
          sCol.getField("cms"), col("term")))
        .select(col("term"), col("n_exact"),
          (col("cms_est") >= col("n_exact")).as("lower_ok"),
          (col("cms_est") <= col("n_exact") +
            lit(3) * ceil(sCol.getField("n") * lit(0.0001)).cast("long"))
            .as("upper_ok"))
        .orderBy(col("n_exact").desc, col("term"))
    }),

    // --- training-data batching prep ------------------------------------

    // Sliding-window chunking: token windows of 50 with stride 40 (10
    // overlap) — the doc→training-chunk explode. Chunk content rides as an
    // md5 so output stays narrow.
    "d_chunk" -> ((s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0), greatest(size(col("t")) - 1, lit(0)),
            lit(40))).as("start"))
        .select(col("doc_id"), (col("start") / 40).cast("long").as("chunk_id"),
          slice(col("t"), col("start") + 1, lit(50)).as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast("long").as("n_tokens"),
          md5(array_join(col("chunk"), " ").cast("binary")).as("chunk_hash"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Concat-and-split sequence packing: per-language running token count
    // assigns each doc to a 512-token context bin (bin = tokens-before /
    // 512). Packing per stream partition (lang) — no global single-
    // partition window; at corpus scale the stream key is the shard.
    "d_pack_sequences" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.tokenCountWs(col("text")).cast("long").as("tok"))
        .withColumn("cum", sum(col("tok")).over(w))
        .withColumn("bin", expr("(cum - tok) div 512"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).cast("long").as("total_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("lang"), col("bin"))
    }),

    // Token-distribution entropy per doc (exact-count form:
    // H = ln N − Σ c·ln c / N) — the information-density quality signal.
    "d_entropy" -> ((s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).cast("long").as("n_tokens"),
          count(lit(1)).as("n_terms"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("_sclc"))
        .select(col("doc_id"), col("n_tokens"), col("n_terms"),
          round(log(col("n_tokens").cast("double"))
            - col("_sclc") / col("n_tokens"), 6).as("entropy"))
        .orderBy(col("doc_id"))
    }),

    // End-to-end dedup pipeline: the SAME chain graph as d_dedup_clusters
    // (QueryShared.chainClusterLabels — one definition, so the threshold
    // and shingle width can't silently diverge), then clusterSummary →
    // keep-one-per-cluster reduction stats per cluster-size band. The
    // "how much does dedup shrink the corpus" report every pipeline run
    // ends with.
    "d_dedup_keep" -> ((s, dir) => {
      val labels = QueryShared.chainClusterLabels(s, dir)
      graft.similarity.DedupClusters.clusterSummary(labels)
        .groupBy(col("size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("size")).cast("long").as("n_docs"),
          min(col("keep_id")).as("min_keep"),
          (sum(col("size")) - count(lit(1))).cast("long").as("n_dropped"))
        .orderBy(col("size"))
    }),

    // Repetition scoring (Gopher-style): duplicate 2-gram fraction —
    // exact integer set arithmetic per row.
    "d_repetition" -> ((s, dir) => {
      load(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.shingles(TextOps.tokens(col("text")), 2).as("g"))
        .select(col("doc_id"),
          size(col("g")).cast("long").as("n_grams"),
          size(array_distinct(col("g"))).cast("long").as("n_distinct"))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          round(when(col("n_grams") > 0,
            lit(1.0) - col("n_distinct").cast("double") / col("n_grams"))
            .otherwise(lit(0.0)), 6).as("rep_frac"))
        .orderBy(col("doc_id"))
    })
  )

  /** One SQL text for both engines (Spark executes it AND it is the
    * oracle): chain roots by recursive walk over doc_id adjacency within
    * the same (lang, source). */
  private val recursiveChainSql: String =
    """WITH RECURSIVE linked AS (
      |  SELECT d.doc_id,
      |    CASE WHEN p.doc_id IS NULL THEN FALSE ELSE TRUE END AS link_prev
      |  FROM documents d LEFT JOIN documents p
      |    ON p.doc_id = d.doc_id - 1 AND p.lang = d.lang
      |      AND p.source = d.source),
      |r AS (
      |  SELECT doc_id, doc_id AS root FROM linked WHERE NOT link_prev
      |  UNION ALL
      |  SELECT l.doc_id, r.root FROM linked l
      |  JOIN r ON l.doc_id = r.doc_id + 1
      |  WHERE l.link_prev)
      |SELECT doc_id, root FROM r ORDER BY doc_id""".stripMargin

  /** One SQL text for both engines: latest order per customer via a
    * correlated LATERAL (deterministic tie-break on o_orderkey). */
  private val lateralTopnSql: String =
    """SELECT c_custkey, t.o_orderkey, t.latest_cents FROM customer,
      |LATERAL (
      |  SELECT o_orderkey,
      |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS latest_cents
      |  FROM orders WHERE o_custkey = c_custkey
      |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
      |) t
      |ORDER BY c_custkey""".stripMargin

  private val tokensSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  val oracleSql: Map[String, String] = Map(
    // inequality oracle: exact top-20 counts checked directly; the CMS
    // estimate enters only through the lower/upper bound booleans, which
    // must both be TRUE (est ≥ true; est ≤ true + εN)
    "d_freq_sketch" ->
      s"""SELECT term, n_exact, TRUE AS lower_ok, TRUE AS upper_ok
         |FROM (SELECT term, COUNT(*) AS n_exact
         |      FROM (SELECT unnest($tokensSql) AS term FROM documents)
         |      GROUP BY 1 ORDER BY n_exact DESC, term LIMIT 20) t
         |ORDER BY n_exact DESC, term""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |  l_quantity AS value
        |FROM lineitem WHERE l_orderkey < 1000
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |FROM lineitem WHERE l_orderkey < 1000
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "q_intersect_except" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |SELECT o_custkey, 'both' AS seg
        |FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT o_custkey, 'only_1995' AS seg
        |FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
        |ORDER BY seg, o_custkey""".stripMargin,
    "q_first_last" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  FIRST_VALUE(l_orderkey) OVER w AS first_ok,
        |  LAST_VALUE(l_orderkey) OVER w AS last_ok,
        |  NTH_VALUE(l_orderkey, 2) OVER w AS second_ok
        |FROM lineitem WHERE l_suppkey < 20
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_cume_dist" ->
      """SELECT event_id, event_type,
        |  cume_dist() OVER w AS cd,
        |  percent_rank() OVER w AS pr
        |FROM events WHERE event_id < 2000
        |WINDOW w AS (PARTITION BY event_type ORDER BY value)
        |ORDER BY event_id""".stripMargin,
    "q_recursive_cte" -> recursiveChainSql,
    "q_lateral_topn" -> lateralTopnSql,
    "q_arg_minmax" ->
      """SELECT l_returnflag,
        |  arg_max(l_orderkey, CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |    * 10000000 + l_orderkey * 8 + l_linenumber) AS max_price_orderkey,
        |  arg_min(l_orderkey, CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |    * 10000000 + l_orderkey * 8 + l_linenumber) AS min_price_orderkey,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_prefix_filter" ->
      """SELECT p_brand, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT s_nationkey) AS n_supp_nations,
        |  CAST(ROUND(SUM(l_extendedprice*100)) AS BIGINT) AS promo_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE p_type LIKE 'PROMO%'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events WHERE event_id < 3000
        |ORDER BY event_id""".stripMargin,
    "q_full_outer" ->
      """WITH a AS (SELECT o_custkey AS ck, COUNT(*) AS n95 FROM orders
        |  WHERE year(o_orderdate) = 1995 GROUP BY 1),
        |b AS (SELECT o_custkey AS ck, COUNT(*) AS n96 FROM orders
        |  WHERE year(o_orderdate) = 1996 GROUP BY 1)
        |SELECT COALESCE(a.ck, b.ck) AS ck,
        |  COALESCE(n95, 0) AS n95, COALESCE(n96, 0) AS n96
        |FROM a FULL JOIN b ON a.ck = b.ck
        |ORDER BY ck""".stripMargin,
    "q_range_time" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS roll_cents
        |FROM events WHERE event_id < 5000
        |ORDER BY event_id""".stripMargin,
    "q_skew_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_rows,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(ROUND(SUM(l_extendedprice*100)) AS BIGINT) AS sum_base_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_zorder" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber,
        |    l_partkey % 65536 AS zx, l_suppkey % 65536 AS zy
        |  FROM lineitem),
        |s1 AS (SELECT *, (zx | (zx << 8)) & 16711935 AS ax,
        |              (zy | (zy << 8)) & 16711935 AS ay FROM b),
        |s2 AS (SELECT *, (ax | (ax << 4)) & 252645135 AS bx,
        |              (ay | (ay << 4)) & 252645135 AS by FROM s1),
        |s3 AS (SELECT *, (bx | (bx << 2)) & 858993459 AS cx,
        |              (by | (by << 2)) & 858993459 AS cy FROM s2),
        |s4 AS (SELECT *, (cx | (cx << 1)) & 1431655765 AS dx,
        |              (cy | (cy << 1)) & 1431655765 AS dy FROM s3)
        |SELECT l_orderkey, l_linenumber, zx, zy,
        |  CAST(dx | (dy << 1) AS BIGINT) AS zkey
        |FROM s4 ORDER BY zkey, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
        |  ROUND(var_samp(l_quantity), 6) AS var_qty,
        |  ROUND(corr(l_quantity, l_discount), 6) AS corr_qd,
        |  ROUND(covar_samp(l_quantity, l_discount), 6) AS covar_qd,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_array_agg" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
        |    AS statuses,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_count_if" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
        |  CAST(ROUND(SUM(CASE WHEN l_quantity > 25 THEN l_extendedprice
        |    ELSE 0 END * 100)) AS BIGINT) AS bulk_cents,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_chunk" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS t FROM documents),
         |c AS (SELECT doc_id, t,
         |        unnest(range(0, greatest(len(t), 1), 40)) AS start
         |      FROM t)
         |SELECT doc_id, CAST(start // 40 AS BIGINT) AS chunk_id,
         |  CAST(len(list_slice(t, start + 1, start + 50)) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(list_slice(t, start + 1, start + 50), ' '))
         |    AS chunk_hash
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "d_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, tok,
        |    SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT lang, CAST((cum - tok) // 512 AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d_entropy" ->
      s"""WITH c AS (
         |  SELECT doc_id, term, COUNT(*) AS c FROM (
         |    SELECT doc_id, unnest($tokensSql) AS term FROM documents)
         |  GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |  COUNT(*) AS n_terms,
         |  ROUND(ln(CAST(SUM(c) AS DOUBLE))
         |    - SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c), 6) AS entropy
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_dedup_keep" ->
      s"""WITH g AS (
         |  SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 THEN []
         |    ELSE list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS grams
         |  FROM (SELECT doc_id, $tokensSql AS t FROM documents)),
         |j AS (
         |  SELECT a.doc_id,
         |    CASE WHEN len(list_distinct(a.grams || b.grams)) > 0
         |      THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |           / len(list_distinct(a.grams || b.grams))
         |      ELSE 0 END AS jac
         |  FROM g a JOIN g b ON b.doc_id = a.doc_id - 1),
         |flags AS (
         |  SELECT g.doc_id, COALESCE(j.jac >= 0.005, FALSE) AS linked_prev
         |  FROM g LEFT JOIN j ON g.doc_id = j.doc_id),
         |labels AS (
         |  SELECT doc_id,
         |    MAX(CASE WHEN NOT linked_prev THEN doc_id END)
         |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cluster
         |  FROM flags),
         |clusters AS (
         |  SELECT cluster, COUNT(*) AS size, MIN(doc_id) AS keep_id
         |  FROM labels GROUP BY 1)
         |SELECT size, COUNT(*) AS n_clusters,
         |  CAST(SUM(size) AS BIGINT) AS n_docs, MIN(keep_id) AS min_keep,
         |  CAST(SUM(size) - COUNT(*) AS BIGINT) AS n_dropped
         |FROM clusters GROUP BY 1 ORDER BY 1""".stripMargin,
    "d_repetition" ->
      s"""WITH g AS (
         |  SELECT doc_id, CASE WHEN len(t) < 2 THEN []
         |    ELSE list_transform(range(1, len(t)),
         |      i -> t[i] || ' ' || t[i+1]) END AS grams
         |  FROM (SELECT doc_id, $tokensSql AS t FROM documents))
         |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
         |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
         |  ROUND(CASE WHEN len(grams) > 0
         |    THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
         |    ELSE 0 END, 6) AS rep_frac
         |FROM g ORDER BY doc_id""".stripMargin
  )
}
