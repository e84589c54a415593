package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY §2 (plus the
  * training-data-pipeline operators) to a `(spark, sfDir) => DataFrame`;
  * `oracleSql` holds the DuckDB-equivalent SQL with matching column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-by-flag summary joined to top customers — exercises scan,
    * pushdown filter, broadcast join, decimal-exact agg.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.load(spark, d, "lineitem")
    val orders = Tables.load(spark, d, "orders")
    val customer = Tables.load(spark, d, "customer")
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_mktsegment"), col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .orderBy(col("c_mktsegment"), col("l_returnflag"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalOps.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.VectorOps.queries ++
      graft.queries.EventOps.queries ++
      graft.queries.JsonOps.queries ++
      graft.queries.CurationOps.queries ++
      graft.queries.HtmlOps.queries ++
      graft.queries.NormalizeOps.queries ++
      graft.queries.GeoOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    *
    * Every oracle is wrapped in `ORDER BY ALL NULLS FIRST` and Verify
    * sorts its parquet dumps the same way, so the compare holds whether
    * or not the harness normalizes row order. */
  def oracleSql: Map[String, String] =
    (graft.queries.RelationalOps.oracles ++
      graft.queries.TextOps.oracles ++
      graft.queries.VectorOps.oracles ++
      graft.queries.EventOps.oracles ++
      graft.queries.JsonOps.oracles ++
      graft.queries.CurationOps.oracles ++
      graft.queries.HtmlOps.oracles ++
      graft.queries.NormalizeOps.oracles ++
      graft.queries.GeoOps.oracles)
      .map { case (k, sql) =>
        k -> s"SELECT * FROM ($sql) AS graft_q ORDER BY ALL NULLS FIRST"
      }
}
