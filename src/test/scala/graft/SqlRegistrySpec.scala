package graft

import graft.sqlapi.SqlRegistry

/** The SQL front door for pipeline operators: reference scanning, lazy
  * per-statement view registration, and non-interference with user
  * tables that happen to share the prefix.
  */
class SqlRegistrySpec extends SparkSpecBase {

  test("references finds only real operator names, ignoring lookalikes") {
    val sql = """SELECT a.doc_id FROM graft_dedup_exact a
                |JOIN graft_orders_b1234 o ON a.doc_id = o.k
                |JOIN graft_not_an_operator x ON x.k = o.k
                |WHERE a.doc_id IN (SELECT doc_id FROM graft_text_stats)""".stripMargin
    // bucketed-twin tables and unknown names pass through untouched —
    // Spark's analyzer owns those errors, not the registry
    assert(SqlRegistry.references(sql).toSet == Set("dedup_exact", "text_stats"))
    assert(SqlRegistry.references("SELECT 1").isEmpty)
    // a user identifier CONTAINING the prefix is not a reference
    assert(SqlRegistry.references("SELECT * FROM mygraft_dedup_exact").isEmpty)
    assert(SqlRegistry.references("SELECT x2graft_text_stats FROM t").isEmpty)
  }

  test("ensureFor registers referenced views once and SQL runs against them") {
    val sql = s"SELECT COUNT(*) AS n FROM ${SqlRegistry.ViewPrefix}dedup_exact"
    val first = SqlRegistry.ensureFor(spark, sf(), sql)
    assert(first == Seq("dedup_exact"))
    // idempotent: the second call registers nothing new
    assert(SqlRegistry.ensureFor(spark, sf(), sql).isEmpty)
    val n = spark.sql(sql).head.getLong(0)
    assert(n > 0, s"view query returned $n rows")
    // the registered view answers the same frame as the operator itself
    val direct = graft.ext.Dedup.queries("dedup_exact")(spark, sf()).count()
    assert(spark.table(s"${SqlRegistry.ViewPrefix}dedup_exact").count() == direct)
  }

  test("available lists every graded query") {
    assert(SqlRegistry.available.toSet == SparkEntry.queries.keySet)
  }
}
