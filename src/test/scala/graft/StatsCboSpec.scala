package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Stats/CBO surface (SURVEY §4.2): ANALYZE TABLE statistics must feed
  * CostBasedJoinReorder — the optimizer, given a deliberately BAD
  * user-written join order, reorders to the selective join first. This
  * is the 100-TB insurance that a user's literal FROM-clause order never
  * dictates the shuffle sizes.
  */
class StatsCboSpec extends SparkSpec {

  /** Catalog tables reached by the BOTTOM-most join (the join executed
    * first) of the optimized plan. */
  private def bottomJoinTables(df: DataFrame): Set[String] = {
    val bottom = df.queryExecution.optimizedPlan.collect {
      case j: Join
          if j.children.forall(_.collect { case x: Join => x }.isEmpty) => j
    }
    bottom.flatMap(_.collectLeaves()).collect {
      case r: LogicalRelation if r.catalogTable.isDefined =>
        r.catalogTable.get.identifier.table
    }.toSet
  }

  test("ANALYZE TABLE stats drive CostBasedJoinReorder past a bad join order") {
    val tables = Seq("cbo_lineitem" -> "lineitem", "cbo_orders" -> "orders",
                     "cbo_customer" -> "customer")
    val confs = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = confs.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      for ((t, src) <- tables) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.read.parquet(s"$sf0001/$src.parquet")
          .write.mode("overwrite").saveAsTable(t)
      }
      // the deliberately bad order: the two BIG tables joined first, the
      // selective customer filter last
      def query() = spark.sql(
        """SELECT count(*) AS n
           FROM cbo_lineitem l
           JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
           JOIN cbo_customer c ON o.o_custkey = c.c_custkey
           WHERE c.c_nationkey = 3""")
      confs.foreach(spark.conf.set(_, "false"))
      assert(bottomJoinTables(query()) === Set("cbo_lineitem", "cbo_orders"),
        "without CBO the literal (bad) join order must survive")
      confs.foreach(spark.conf.set(_, "true"))
      for ((t, _) <- tables)
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      // row counts actually landed in the catalog
      for ((t, _) <- tables)
        assert(spark.table(t).queryExecution.optimizedPlan.stats.rowCount
          .exists(_.toLong > 0L), s"no rowCount stats for $t after ANALYZE")
      assert(bottomJoinTables(query()) === Set("cbo_orders", "cbo_customer"),
        "CBO did not reorder the selective orders⋈customer join first")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      for ((t, _) <- tables) spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
