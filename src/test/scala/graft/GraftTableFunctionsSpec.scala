package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, FactChangeFeed, FactVersioned, TfIdf, Upsert}

/** [[GraftFunctions.tableBuilders]]: the SQL table-valued functions
  * resolve to EXACTLY their operators' plans — every TVF result is
  * hash-equal to the operator twin (the gates q157–q159 re-verify the
  * headline forms against DuckDB; this spec covers the forms without
  * a gate and the argument validation surface). */
class GraftTableFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def tmp(): String =
    Files.createTempDirectory("graft_tvf_").toString

  /** The AnnIndexSpec corpus: deterministic vectors of dim 8 in 3
    * partitions, clustered around 4 rough directions. */
  private def corpus(n: Int): DataFrame =
    (1 to n).map { i =>
      val g = i % 4
      val v = (0 until 8).map { j =>
        val bias = if (j % 4 == g) 4.0 else 0.0
        bias + math.sin(i * 31 + j * 7)
      }
      (i.toLong, i % 3, v)
    }.toDF("id", "p", "vec")

  test("graft_ann_topk_for (external query batch) is hash-equal to " +
      "ivfSq8TopKIndexedFor") {
    val path = tmp() + "/t"
    Upsert.writeSnapshotsPartitioned(Seq(
      Upsert.PartitionedWrite(corpus(180), path, "p", Seq(0, 1, 2))))
    AnnIndex.writeIndex(spark, path, "id", "vec", nLists = 4)
    corpus(180).where(col("id") % 10 === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
      .createOrReplaceTempView("tvf_queries")
    val out = spark.sql(
      s"""SELECT * FROM graft_ann_topk_for('$path', 'vec',
         |  'tvf_queries', 'qid', 'qvec', 3, 2)""".stripMargin)
      .as[(Long, Long, Int, Double)].collect().toSet
    val twin = AnnIndex.ivfSq8TopKIndexedFor(spark, path, "vec",
        spark.table("tvf_queries"), "qid", "qvec", k = 3, nProbe = 2)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(out == twin && out.nonEmpty)
  }

  test("graft_table_changes accepts a direct PATH argument and " +
      "replays an exact window") {
    val path = tmp() + "/t"
    val base = (1 to 30).map(i => (i.toLong, i % 3, i * 10L))
      .toDF("k", "p", "v")
    FactVersioned.upsert(spark, path, base, Seq("k"), "p")
    FactVersioned.upsert(spark, path,
      Seq((3L, 0, 999L), (31L, 1, 310L)).toDF("k", "p", "v"),
      Seq("k"), "p")
    val out = spark.sql(
      s"SELECT * FROM graft_table_changes('$path', 'k', 0, 1)")
      .select("op", "k", "p", "v")
      .as[(String, Long, Int, Long)].collect().toSet
    val twin = FactChangeFeed.window(spark, path, Seq("k"), Some(0L), 1L)
      .select("op", "k", "p", "v")
      .as[(String, Long, Int, Long)].collect().toSet
    assert(out == twin)
    assert(out.contains(("insert", 31L, 1, 310L)))
    assert(out.contains(("update_post", 3L, 0, 999L)))
    // from-empty: -1 reads the full snapshot as inserts
    val seed = spark.sql(
      s"SELECT op FROM graft_table_changes('$path', 'k', -1, 0)")
      .as[String].collect()
    assert(seed.length == 30 && seed.forall(_ == "insert"))
  }

  test("TVF argument validation fails loudly: non-literal args, wrong " +
      "arity, unknown catalog ref") {
    def messageOf(body: => Any): String =
      Iterator.iterate(intercept[Throwable](body))(_.getCause)
        .takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    val arity = messageOf(
      spark.sql("SELECT * FROM graft_table_changes('x', 'k')"))
    assert(arity.contains("usage:"), arity)
    val nonLit = messageOf(spark.sql(
      "SELECT * FROM graft_ann_topk(concat('a', 'b'), 'vec', 3, 2)"))
    assert(nonLit.contains("string literal"), nonLit)
    val badRef = messageOf(spark.sql(
      "SELECT * FROM graft_table_changes('nocat.tbl', 'k', 0, 1)"))
    assert(badRef.toLowerCase.contains("graftcatalog") ||
      badRef.toLowerCase.contains("catalog"), badRef)
  }
}
