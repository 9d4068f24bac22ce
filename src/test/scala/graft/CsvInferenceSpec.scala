package graft

import java.nio.file.Files

import graft.catalog.{Catalog, CsvInference}

/** The reference's CSV type-inference rules
  * (/root/reference/src/storage/csv_loader.cpp:42-162; fixtures from
  * FIXTURES.md §1b) and load-time statistics.
  */
class CsvInferenceSpec extends SparkSpecBase {

  private def tmpCsv(content: String): String = {
    val f = Files.createTempFile("graft_test", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  test("test_load.csv: INT64 / STRING / DOUBLE with stats (test_csv.cpp:7-54)") {
    val path = tmpCsv("id,name,value\n1,Alice,100.5\n2,Bob,200.25\n3,Charlie,300.75\n")
    val (df, meta) = CsvInference.load(spark, path, "t")
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("id") == "bigint" && types("name") == "string" && types("value") == "double")
    assert(meta.rowCount == 3)
    val byName = meta.columns.map(c => c.name -> c).toMap
    assert(byName("id").min == "1" && byName("id").max == "3" && byName("id").ndv == 3)
    assert(byName("value").min == "100.5" && byName("value").max == "300.75")
    assert(byName("name").ndv == 3)
  }

  test("all-integral values infer INT64 even as 2.0 / 1e3 (csv_loader.cpp:85-102)") {
    val path = tmpCsv("a,b\n2.0,7\n1e3,8\n4,9\n")
    val (df, _) = CsvInference.load(spark, path, "t")
    assert(df.schema("a").dataType.simpleString == "bigint")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L, 1000L))
  }

  test("8-digit ints in [19000000, 21000000] infer DATE32-as-int (csv_loader.cpp:49-66)") {
    val path = tmpCsv("d,x\n20231225,1\n19991231,2\n20000101,3\n")
    val (df, _) = CsvInference.load(spark, path, "t")
    assert(df.schema("d").dataType.simpleString == "int")
    assert(df.collect().map(_.getInt(0)).max == 20231225)
  }

  test("8-digit ints OUT of date range stay INT64") {
    val path = tmpCsv("d\n30231225\n19991231\n")
    val (df, _) = CsvInference.load(spark, path, "t")
    assert(df.schema("d").dataType.simpleString == "bigint")
  }

  test("one non-numeric cell flips the whole column to STRING") {
    val path = tmpCsv("v\n1\n2\noops\n")
    val (df, _) = CsvInference.load(spark, path, "t")
    assert(df.schema("v").dataType.simpleString == "string")
  }

  test("8-char non-numeric cell vetoes DATE32 → STRING (csv_loader.cpp:49-66 stoi throws)") {
    val path = tmpCsv("d\n20240101\nabcdefgh\n")
    val (df, _) = CsvInference.load(spark, path, "t")
    assert(df.schema("d").dataType.simpleString == "string")
  }

  test("empty/null cell vetoes DATE32 → STRING (reference never produces nulls)") {
    val path = tmpCsv("d,x\n20240101,1\n,2\n")
    val (df, _) = CsvInference.load(spark, path, "t")
    assert(df.schema("d").dataType.simpleString == "string")
  }

  test("zero-column input degrades to an empty table instead of crashing") {
    val (df, meta) = CsvInference.typed(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq.empty)), "empty")
    assert(df.columns.isEmpty && meta.rowCount == 0 && meta.columns.isEmpty)
  }

  test("ragged row rejects the file like the reference (csv_loader.cpp:34-36)") {
    // short row: 2 cells under a 3-column header
    val short = tmpCsv("a,b,c\n1,2,3\n4,5\n")
    val e1 = intercept[IllegalArgumentException](CsvInference.load(spark, short, "t"))
    assert(e1.getMessage.contains("Row size mismatch"))
    // long row: 4 cells over a 3-column header
    val long = tmpCsv("a,b,c\n1,2,3\n4,5,6,7\n")
    val e2 = intercept[IllegalArgumentException](CsvInference.load(spark, long, "t"))
    assert(e2.getMessage.contains("Row size mismatch"))
  }

  test("DESCRIBE renders the reference's exact shape (main.cpp:188-208)") {
    val path = tmpCsv("id,name,value,d\n1,Alice,100.5,20231225\n2,Bob,200.25,19991231\n")
    val (_, meta) = CsvInference.load(spark, path, "users")
    val out = graft.cli.Repl.describeText(meta)
    assert(out ==
      """Table: users (2 rows)
        |Columns:
        |  id INT64 (ndv: 2, min: 1, max: 2)
        |  name STRING (ndv: 2)
        |  value DOUBLE (ndv: 2, min: 100.5, max: 200.25)
        |  d DATE32 (ndv: 2, min: 19991231, max: 20231225)
        |""".stripMargin)
  }

  test("catalog register/list/describe round-trip (test_catalog.cpp:7-52)") {
    val cat = new Catalog(spark)
    val path = tmpCsv("id,value\n10,1.1\n20,2.2\n")
    val meta = cat.registerCsv("cat_t", path)
    assert(cat.tables.contains("cat_t"))
    assert(meta.rowCount == 2)
    assert(cat.table("cat_t").count() == 2)
    // re-register overwrites (catalog.cpp:5-8)
    val path2 = tmpCsv("id,value\n1,9.9\n")
    val meta2 = cat.registerCsv("cat_t", path2)
    assert(meta2.rowCount == 1 && cat.tables.count(_ == "cat_t") == 1)
  }
}
