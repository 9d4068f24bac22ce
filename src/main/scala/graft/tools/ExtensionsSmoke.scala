package graft.tools

import org.apache.spark.sql.SparkSession

/** Black-box check of the `spark.sql.extensions` injection path — the way
  * a real cluster loads the library (no programmatic `register` calls).
  * Run in a FRESH JVM (extensions apply at session creation only):
  * cli_smoke.sh drives it. Prints EXTENSIONS_SMOKE_OK on success.
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // injected FUNCTIONS reachable from plain SQL
    val n = spark.sql("SELECT size(shingle_hashes('a b c d e')) AS n").head().getInt(0)
    require(n == 3, s"shingle_hashes via injection returned $n shingles, expected 3")
    val sig = spark.sql(
      "SELECT sign_lsh(array(cast(1.0 as float), cast(-1.0 as float)), 0, 8) AS s")
      .head().getLong(0)
    require(sig >= 0 && sig < 256, s"sign_lsh via injection out of range: $sig")
    val k = spark.sql(
      "SELECT topk_by(cast(v as double), id, 2) AS t FROM VALUES (1.0, 1L), (3.0, 2L), (2.0, 3L) AS x(v, id)")
      .head().getSeq[org.apache.spark.sql.Row](0)
    require(k.map(_.getLong(1)) == Seq(2L, 3L), s"topk_by via injection: $k")

    // injected OPTIMIZER RULE: the HOF pattern rewrites without any
    // register call. Input derives from range() so neither constant
    // folding nor ConvertToLocalRelation can pre-evaluate the HOF.
    val df = spark.sql(
      """SELECT size(filter(split(concat('the quick a fox ', cast(id as string)), ' '),
        |  x -> array_contains(array('the','a'), x))) AS c FROM range(2)""".stripMargin)
    val plan = df.queryExecution.optimizedPlan.toString
    require(plan.contains("count_in_set"), s"NativeTextRewriteRule not injected:\n$plan")
    require(df.collect().map(_.getInt(0)).toSeq == Seq(2, 2), "rewritten result wrong")

    println("EXTENSIONS_SMOKE_OK")
    spark.stop()
  }
}
