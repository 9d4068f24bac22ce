package graft.sqlapi

import org.apache.spark.sql.SparkSession

/** SQL front door for the PIPELINE operators: every `SparkEntry.queries`
  * entry is addressable as a temp view `graft_<name>` — so
  * `SELECT * FROM graft_dedup_minhash_lsh` runs the MinHash-LSH dedup
  * through plain `spark.sql`, matching the reference's everything-is-SQL
  * ergonomics (/root/reference/src/cli/main.cpp:229-242) for the 100+
  * operators that exist beyond its relational surface.
  *
  * Registration is LAZY and on-demand: [[ensureFor]] scans a SQL text
  * for `graft_*` identifiers and registers exactly those before the
  * query runs. Registering all ~130 up front would be wrong twice over —
  * view DEFINITION is cheap for most operators, but some constructors do
  * real work building their plan (iterative operators localCheckpoint
  * per round; layout operators write bucketed/partitioned files), and a
  * REPL pointed at a 100 TB table dir must not pay any of that for views
  * the session never touches.
  */
object SqlRegistry {

  val ViewPrefix = "graft_"

  /** Query names addressable as `graft_<name>` views. */
  def available: Seq[String] = graft.SparkEntry.queries.keys.toSeq.sorted

  // lookbehind: `mygraft_foo` is a user identifier, not a view reference
  private val ViewRe = ("""(?<![A-Za-z0-9_])""" + ViewPrefix + """([A-Za-z0-9_]+)""").r

  /** Pipeline-view names `sqlText` references (without registering). */
  def references(sqlText: String): Seq[String] =
    ViewRe.findAllMatchIn(sqlText).map(_.group(1)).toSeq.distinct
      .filter(graft.SparkEntry.queries.contains)

  /** Register every `graft_<query>` view that `sqlText` references and
    * is not already in the session catalog, building each referenced
    * operator's DataFrame against the parquet tables at `dataDir`.
    * Returns the names newly registered. Unknown `graft_*` identifiers
    * are left for Spark's analyzer to report (they may be user tables —
    * e.g. the bucketed-layout twins also carry the prefix).
    */
  def ensureFor(spark: SparkSession, dataDir: String, sqlText: String): Seq[String] = {
    references(sqlText).filterNot(n =>
      spark.catalog.tableExists(ViewPrefix + n)).map { n =>
      graft.SparkEntry.queries(n)(spark, dataDir)
        .createOrReplaceTempView(ViewPrefix + n)
      n
    }
  }
}
