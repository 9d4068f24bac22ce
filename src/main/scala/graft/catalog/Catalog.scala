package graft.catalog

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.CsvInference.TableMeta

/** Name → (view, metadata) registry mirroring the reference's Catalog
  * (/root/reference/include/catalog/catalog.h:46-62): register_table
  * overwrites on re-register (catalog.cpp:5-8), list, describe.
  *
  * The data itself lives in Spark's session catalog as temp views — this
  * class only adds the reference's statistics surface (DESCRIBE with
  * ndv/min/max, main.cpp:188-208), which Spark's ANALYZE keeps internal.
  */
class Catalog(spark: SparkSession) {
  private val metas = mutable.LinkedHashMap.empty[String, TableMeta]

  def registerCsv(name: String, path: String): TableMeta = {
    val (df, meta) = CsvInference.load(spark, path, name)
    register(name, df, meta)
  }

  def registerParquet(name: String, path: String): TableMeta = {
    val df = spark.read.parquet(path)
    register(name, df, CsvInference.statsFor(df, name))
  }

  def registerJson(name: String, path: String): TableMeta = {
    val df = spark.read.json(path)
    register(name, df, CsvInference.statsFor(df, name))
  }

  /** A versioned snapshot table ([[graft.engine.Snapshots]]) at a fixed
    * version (default latest) — SQL over time travel: registering the
    * same store under two names at two versions lets plain SQL query,
    * join, and diff table history.
    */
  def registerSnapshot(name: String, dir: String, version: Int = -1,
      mergeSchema: Boolean = false): TableMeta = {
    val df = graft.engine.Snapshots.read(spark, dir, version, mergeSchema)
    register(name, df, CsvInference.statsFor(df, name))
  }

  def register(name: String, df: DataFrame, meta: TableMeta): TableMeta = {
    df.createOrReplaceTempView(name)
    metas(name) = meta
    meta
  }

  def tables: Seq[String] = metas.keys.toSeq

  def describe(name: String): Option[TableMeta] = metas.get(name)

  def table(name: String): DataFrame = spark.table(name)
}
