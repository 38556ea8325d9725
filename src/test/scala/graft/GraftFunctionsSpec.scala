package graft

import org.apache.spark.sql.functions._

/** SQL surface: graft_* functions registered on a live session. */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Column API") {
    GraftFunctions.register(spark)
    Seq((1L, "the quick brown fox", Array(1.0f, 0.0f)),
      (2L, "lazy dogs sleep", Array(0.0f, 1.0f)))
      .toDF("id", "text", "vec").createOrReplaceTempView("t")
    val sqlOut = spark.sql(
      """SELECT id, graft_fingerprint(text) AS fp, graft_simhash(text) AS sh,
        |  graft_token_count(text) AS n, graft_cosine(vec, vec) AS self_sim,
        |  graft_langid(text) AS lang, graft_sanitize(text) AS safe
        |FROM t""".stripMargin).collect()
    val colOut = spark.table("t").select(
      col("id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
      graft.functions.TextFunctions.simHash(col("text")).as("sh"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("n"),
      graft.functions.VectorFunctions.cosine(col("vec"), col("vec"))
        .as("self_sim"),
      graft.functions.TextFunctions.langId(col("text")).as("lang"),
      graft.functions.Normalize.sanitizeName(col("text")).as("safe"))
      .collect()
    assert(sqlOut.map(_.toString).sorted === colOut.map(_.toString).sorted)
    assert(sqlOut.forall(r => r.getDouble(4) > 0.9999))
  }

  test("graft_shingles matches the Column API; rejects non-literal n") {
    GraftFunctions.register(spark)
    val sqlOut = spark.sql(
      "SELECT graft_shingles('a b c d', 2) AS g").as[Seq[String]].head()
    assert(sqlOut === Seq("a b", "b c", "c d"))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b', cast(rand() * 2 as int))")
        .collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("graft_minhash returns a 32-long signature in SQL") {
    GraftFunctions.register(spark)
    val sig = spark.sql(
      "SELECT graft_minhash('a b c d e f g h') AS s").as[Seq[Long]].head()
    assert(sig.length === 32)
  }
}
