package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-up generator for the out-of-band scale smoke (SCALING.md):
  * replicates an existing sf dir N times with FK-consistent key
  * shifts, producing ~N× the rows with the same schema, value
  * distributions and referential structure. Each replica's keys shift
  * by `i × (max(key in its DIMENSION table) + 1)`, and fact FKs shift
  * by the SAME base as their referenced dimension, so every join in
  * the query suite still resolves (replica i's orders reference
  * replica i's customers, etc.). Dimension tables `region`/`nation`
  * are shared, matching TPC-H's fixed tiny dims.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> <copies>
  *
  * This writes SYNTHETIC INPUT for memory-cliff hunting only — the
  * correctness gates keep using the driver-provided dirs untouched.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <copies>")
    val Array(src, dst, copiesStr) = args
    val copies = copiesStr.toInt
    require(copies >= 1)
    val spark = BenchSession.build()

    // events.ts comes back from Tables.load as TimestampType (micros);
    // write it back out as the raw nanos LONG the driver's files use,
    // so Tables.load applies the identical ns→µs truncation on the
    // scaled dir and the query suite runs unmodified.
    def load(t: String): DataFrame = {
      val df = Tables.load(spark, src, t)
      if (t == "events")
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      else df
    }

    def base(t: String, key: String): Long = {
      // max() of an empty table is null, and a non-Long key would CCE:
      // fail with a clear message instead of an opaque NPE mid-scale-up
      val m = load(t).agg(max(col(key))).collect()(0).getAs[Number](0)
      require(m != null, s"ScaleUp: source table $t is empty ($key)")
      m.longValue() + 1L
    }

    val custBase = base("customer", "c_custkey")
    val ordBase = base("orders", "o_orderkey")
    val partBase = base("part", "p_partkey")
    val suppBase = base("supplier", "s_suppkey")
    val evtBase = base("events", "event_id")
    val docBase = base("documents", "doc_id")
    val vecBase = base("embeddings", "vec_id")

    /** (table, key column → shift base per replica). */
    val shifts: Seq[(String, Map[String, Long])] = Seq(
      "customer" -> Map("c_custkey" -> custBase),
      "orders" -> Map("o_orderkey" -> ordBase, "o_custkey" -> custBase),
      "lineitem" -> Map("l_orderkey" -> ordBase, "l_partkey" -> partBase,
        "l_suppkey" -> suppBase),
      "part" -> Map("p_partkey" -> partBase),
      "supplier" -> Map("s_suppkey" -> suppBase),
      "events" -> Map("event_id" -> evtBase, "user_id" -> custBase),
      "documents" -> Map("doc_id" -> docBase),
      "embeddings" -> Map("vec_id" -> vecBase),
      "region" -> Map.empty,
      "nation" -> Map.empty)

    shifts.foreach { case (t, keyBases) =>
      val df = load(t)
      val out =
        if (keyBases.isEmpty) df // shared dims: one copy
        else (0 until copies).map { i =>
          df.select(df.columns.map { c =>
            keyBases.get(c) match {
              case Some(b) => (col(c) + lit(i * b)).as(c)
              case None => col(c)
            }
          }.toIndexedSeq: _*)
        }.reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      // count from the WRITTEN files (metadata-only footer scan) — a
      // count on `out` would re-execute the whole N-way shifted union
      val written = spark.read.parquet(s"$dst/$t.parquet").count()
      println(s"SCALED $t -> $written rows")
    }
    spark.stop()
  }
}
