package graft.queries

import graft.operators.Hierarchy
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second-wave coverage: outer-join enrichment chains, hierarchy
  * closure, positional explode, exact percentiles, fuzzy matching.
  */
object QueriesExtra {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_left_join" -> ((s, d) => {
      // enrich-with-fallback (cross_ref_helper.py pattern): customers
      // LEFT JOIN their order rollup, absent → zeros
      val t = Tables(s, d)
      val spend = t.orders.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend"))
      t.customer.join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("spend"), lit(0.0)).as("spend"))
        .orderBy("c_custkey")
    }),

    "q_cross_ref" -> ((s, d) => {
      // multi-step left-join enrichment chain with 'unknown' fallbacks
      // (specimen→colony→gene cross-referencing analog)
      val t = Tables(s, d)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"), "left")
        .join(t.customer, col("o_custkey") === col("c_custkey"), "left")
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"), "left")
        .groupBy(coalesce(col("n_name"), lit("unknown")).as("nation"),
          coalesce(col("o_orderstatus"), lit("unknown")).as("status"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("nation", "status")
    }),

    "q_hierarchy" -> ((s, d) => {
      // ancestor closure (ontology_hierarchy_extractor.py analog) over
      // a synthetic decimal-digit tree on orderkeys: parent = key div 10
      val t = Tables(s, d)
      val edges = t.orders.filter(col("o_orderkey") >= 10)
        .select(col("o_orderkey").as("child"),
          (col("o_orderkey") / 10).cast("long").as("parent"))
      Hierarchy.ancestors(edges, "child", "parent", maxDepth = 10)
        .orderBy("node", "depth")
    }),

    "q_posexplode" -> ((s, d) => {
      Tables(s, d).embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), (col("pos") + 1).as("pos"), col("val"))
        .orderBy("vec_id", "pos")
    }),

    "q_percentile" -> ((s, d) => {
      Tables(s, d).events
        .groupBy("event_type")
        .agg(round(percentile(col("value"), lit(0.5)), 6).as("median_value"),
          round(percentile(col("value"), lit(0.9)), 6).as("p90_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    "q_fuzzy_match" -> ((s, d) => {
      // fuzzy standardization against a small reference vocabulary
      // (the reference matches legacy colony/strain names to tracked
      // ones); broadcast probe list, levenshtein distance
      val probes = Seq("linen cornflower powder", "spring green yellow",
        "midnight navy royal")
      val best = probes.map(p =>
        struct(levenshtein(col("p_name"), lit(p)).as("dist"), lit(p).as("probe")))
        .reduce((a, b) => when(a("dist") <= b("dist"), a).otherwise(b))
      Tables(s, d).part
        .withColumn("best", best)
        .select(col("p_partkey"), col("best.probe").as("best_probe"),
          col("best.dist").as("distance"))
        .orderBy("p_partkey")
    }))

  val oracles: Map[String, String] = Map(
    "q_left_join" ->
      """SELECT c_custkey,
        | cast(coalesce(n_orders, 0) as bigint) AS n_orders,
        | coalesce(spend, 0.0) AS spend
        |FROM customer LEFT JOIN (
        | SELECT o_custkey, count(*) AS n_orders,
        |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS spend
        | FROM orders GROUP BY 1) o ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_cross_ref" ->
      """SELECT coalesce(n_name, 'unknown') AS nation,
        | coalesce(o_orderstatus, 'unknown') AS status,
        | count(*) AS n_items,
        | cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
        |FROM lineitem
        | LEFT JOIN orders ON l_orderkey = o_orderkey
        | LEFT JOIN customer ON o_custkey = c_custkey
        | LEFT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q_hierarchy" ->
      """WITH RECURSIVE edges AS (
        | SELECT o_orderkey AS child, o_orderkey // 10 AS parent
        | FROM orders WHERE o_orderkey >= 10),
        |anc AS (
        | SELECT child AS node, parent AS anc, 1 AS depth FROM edges
        | UNION ALL
        | SELECT a.node, e.parent, a.depth + 1
        | FROM anc a JOIN edges e ON a.anc = e.child)
        |SELECT node, anc, cast(depth as int) AS depth FROM anc
        |ORDER BY node, depth""".stripMargin,

    "q_posexplode" ->
      """SELECT vec_id,
        | cast(generate_subscripts(embedding, 1) as int) AS pos,
        | unnest(embedding) AS val
        |FROM embeddings WHERE vec_id < 5
        |ORDER BY vec_id, pos""".stripMargin,

    "q_percentile" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS median_value,
        | round(quantile_cont(value, 0.9), 6) AS p90_value,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_fuzzy_match" ->
      """WITH scored AS (
        | SELECT p_partkey,
        |  levenshtein(p_name, 'linen cornflower powder') AS d1,
        |  levenshtein(p_name, 'spring green yellow') AS d2,
        |  levenshtein(p_name, 'midnight navy royal') AS d3
        | FROM part)
        |SELECT p_partkey,
        | CASE WHEN d1 <= d2 AND d1 <= d3 THEN 'linen cornflower powder'
        |      WHEN d2 <= d3 THEN 'spring green yellow'
        |      ELSE 'midnight navy royal' END AS best_probe,
        | cast(least(d1, d2, d3) as int) AS distance
        |FROM scored ORDER BY p_partkey""".stripMargin)
}
