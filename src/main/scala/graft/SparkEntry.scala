package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator surface lives in three registries:
  *   - [[graft.queries.RelationalQueries]] — SURVEY §2.3 relational rows
  *   - [[graft.queries.LlmQueries]]        — north-star LLM-pipeline rows
  *   - [[graft.queries.EventQueries]]      — event-stream analytics rows
  * Each query name appears in `queries` (Spark plan) and, when DuckDB can
  * express identical semantics, in `oracleSql` (hash-compared by driver).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape (SURVEY §2.3 "Aggregation" row). Reads only lineitem,
    * so it is safe under any session config. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.LlmQueries.queries ++
      graft.queries.EventQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables — since r9 EVERY registered query has one: the
    * hash-based ops replay their kernels in SQL (XXH64 via HUGEINT
    * mod-2^64 arithmetic, hyperplane sign matrices as literals, unrolled
    * Lloyd's iterations), and the sketch ops (HLL, GK quantiles) pair
    * the sketch with an exact twin plus an in-query error-bound
    * assertion. ScalaTest additionally pins recall/precision semantics
    * the single-dataset hash compare can't. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracle ++
      graft.queries.LlmQueries.oracle ++
      graft.queries.EventQueries.oracle
}
