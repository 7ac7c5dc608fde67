package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.{functions => gf}
import Sql.dsum

/** TPC-H-shaped macro queries — the multi-join/agg patterns a warehouse
  * actually runs, exercising Catalyst's join ordering, broadcast
  * selection, and partial aggregation end-to-end (the per-operator
  * registry covers each piece; these cover the composition).
  *
  * Scale posture: the fact-fact join (orders ⋈ lineitem) shuffles on
  * the order key; every dimension (customer at these SFs, supplier,
  * nation, region) rides a broadcast — no dimension ever shuffles the
  * fact table twice. Revenue sums go through the decimal-exact dsum
  * (order-independent), so plans are free to re-order/parallelize
  * without moving the hash.
  */
object Macro {

  val registry: Seq[(String, Q)] = Seq(

    // --- Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    // top-10 open orders by revenue. Filters sit on three different
    // tables and must all push into the scans (date pruning on both
    // fact scans).
    "q73_tpch_q3" -> Q(
      (s, d) => {
        val cut = lit("1995-03-15").cast("timestamp")
        val cust = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") < cut)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > cut)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
          .agg(gf.dsumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
          o_orderpriority,
          ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // --- Q5 shape: 6-table star (region → nation → supplier/customer →
    // orders → lineitem), revenue by nation. The c_nationkey =
    // s_nationkey conjunct makes customer a second equi-key join, not a
    // filter — the classic join-graph query.
    "q74_tpch_q5" -> Q(
      (s, d) => {
        val nat = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")
        val sup = Tables.supplier(s, d)
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_nationkey", "n_name")
        val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(cust, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(gf.dsumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
            gf.countAll.as("n"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name,
          ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
          COUNT(*) AS n
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name ORDER BY revenue DESC, n_name"""))
  )
}
