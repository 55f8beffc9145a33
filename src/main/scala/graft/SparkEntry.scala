package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped hash aggregation (SURVEY.md §2.4 q_agg_group). */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("q_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql

  /** Shared SPARK_GRAFT_ONLY resolution for the Bench/Verify mains: an
    * optional comma-separated query filter for targeted local
    * iteration (the driver never sets it). Unknown names exit 2 — a
    * typo'd filter must not masquerade as a 0-second or
    * everything-passed run. */
  def selectedQueries(logTag: String): Map[String, (SparkSession, String) => DataFrame] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { f =>
      val unknown = f -- queries.keySet
      if (unknown.nonEmpty) {
        System.err.println(s"[$logTag] unknown SPARK_GRAFT_ONLY names: " +
          unknown.mkString(", "))
        sys.exit(2)
      }
    }
    only.fold(queries)(f => queries.filter { case (n, _) => f(n) })
  }
}
