package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Formats]]: hostile-content round trips (the gates q101-q103 cover
  * the oracle side; these cover nulls and the dead-letter splits). */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_fmt_").toString + "/t"

  test("csv round-trips nulls distinct from empty strings") {
    val path = tmp()
    val df = Seq((1L, Some("")), (2L, None), (3L, Some(" pad ")))
      .toDF("k", "v")
    Formats.writeCsv(df, path)
    val back = Formats.readCsv(spark, path, df.schema)
    assert(back.collect().toSet == df.collect().toSet)
    assert(back.where(col("v").isNull).count() == 1)
    assert(back.where(col("v") === "").count() == 1)
    assert(back.where(col("v") === " pad ").count() == 1)
  }

  test("jsonl dead-letter quarantines unparseable lines verbatim") {
    val path = tmp()
    val good = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Formats.writeJsonl(good, path)
    val p = new org.apache.hadoop.fs.Path(s"$path/junk.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    os.write("{broken\n{\"k\": }\n".getBytes("UTF-8"))
    os.close()
    val r = Formats.readJsonlDeadLetter(spark, path, good.schema)
    assert(r.good.collect().toSet == good.collect().toSet)
    assert(r.bad.as[String].collect().toSet == Set("{broken", "{\"k\": }"))
  }

  test("csv dead-letter catches wrong column counts, keeps good rows") {
    val path = tmp()
    val good = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Formats.writeCsv(good, path)
    val p = new org.apache.hadoop.fs.Path(s"$path/junk.csv")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    os.write("k,v\n1,extra,columns,here\n".getBytes("UTF-8"))
    os.close()
    val r = Formats.readCsvDeadLetter(spark, path, good.schema)
    assert(r.good.collect().toSet == good.collect().toSet)
    assert(r.bad.count() == 1)
    assert(r.bad.as[String].head().contains("extra"))
  }
}
