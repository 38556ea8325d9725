package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[ZOrder]]: Morton interleave golden values, write/readback value
  * identity, and the layout's reason to exist — a z-ordered table
  * prunes files on a NON-leading dimension where a linear sort cannot. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits matches hand-computed Morton codes") {
    // x=3 (011), y=5 (101), 3 bits, x at even positions, y at odd:
    // z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5
    //   = 1 + 2 + 4 + 0 + 0 + 32 = 39
    val df = Seq((3L, 5L), (0L, 0L), (7L, 7L)).toDF("x", "y")
    val z = df.select(
      ZOrder.interleaveBits(Seq(col("x"), col("y")), bits = 3).as("z"))
      .as[Long].collect().toSeq
    assert(z == Seq(39L, 0L, 63L))
  }

  test("interleave bit budget is enforced") {
    val e = intercept[IllegalArgumentException] {
      ZOrder.interleaveBits(Seq(lit(1L), lit(1L)), bits = 32)
    }
    assert(e.getMessage.contains("exceeds a long"))
  }

  test("z-ordered write preserves exactly the input rows") {
    val path = Files.createTempDirectory("graft_z_").toString + "/t"
    val df = (1 to 500).map(i => (i.toLong, (i * 37 % 100).toLong, s"p$i"))
      .toDF("a", "b", "payload")
    val rep = ZOrder.writeZOrdered(df, path, Seq("a", "b"), targetFiles = 4)
    assert(rep.files >= 2)
    val back = spark.read.parquet(path)
    assert(back.count() == 500)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }

  test("z-order prunes a non-leading dimension; linear sort cannot") {
    val base = Files.createTempDirectory("graft_z_").toString
    // deterministic 100x100 grid
    val grid = (0 until 10000).map(i => ((i % 100).toLong, (i / 100).toLong))
      .toDF("x", "y")

    val linear = s"$base/linear"
    grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x")
      .write.parquet(linear)
    DataSkipping.writeManifest(spark, linear, Seq("x", "y"))

    val zpath = s"$base/zorder"
    ZOrder.writeZOrdered(grid, zpath, Seq("x", "y"), targetFiles = 16)
    DataSkipping.writeManifest(spark, zpath, Seq("x", "y"))

    // predicate only on y — orthogonal to the linear sort key
    val yRange = Seq(DataSkipping.ColRange("y", lit(10L), lit(19L)))
    val linScan = DataSkipping.prunedScan(spark, linear, yRange)
    val zScan = DataSkipping.prunedScan(spark, zpath, yRange)

    assert(linScan.df.count() == 1000 && zScan.df.count() == 1000)
    assert(linScan.report.filesRead == linScan.report.filesTotal,
      s"linear-by-x layout cannot prune on y: ${linScan.report}")
    assert(zScan.report.filesRead < zScan.report.filesTotal / 2,
      s"z-order should prune most files on a y-range: ${zScan.report}")

    // 2-D box: z-order still reads few files and returns the exact box
    val box = Seq(
      DataSkipping.ColRange("x", lit(20L), lit(39L)),
      DataSkipping.ColRange("y", lit(60L), lit(79L)))
    val zBox = DataSkipping.prunedScan(spark, zpath, box)
    assert(zBox.df.count() == 400)
    assert(zBox.report.filesRead < zBox.report.filesTotal,
      s"2-D box should skip files: ${zBox.report}")
  }

  test("quantile grid keeps pruning under skew where min/max degenerates") {
    val base = Files.createTempDirectory("graft_zq_").toString
    // y: 99.9% of rows in [0,100), a few outliers at 1e9 — a min/max
    // grid maps the bulk to cell 0 and interleaves nothing useful
    val skewed = (0 until 10000).map { i =>
      val y = if (i % 1000 == 999) 1000000000L else ((i / 100) % 100).toLong
      ((i % 100).toLong, y)
    }.toDF("x", "y")

    val mm = s"$base/minmax"
    ZOrder.writeZOrdered(skewed, mm, Seq("x", "y"), targetFiles = 16,
      bits = 8, grid = ZOrder.MinMaxGrid)
    DataSkipping.writeManifest(spark, mm, Seq("x", "y"))
    val qt = s"$base/quantile"
    ZOrder.writeZOrdered(skewed, qt, Seq("x", "y"), targetFiles = 16,
      bits = 8, grid = ZOrder.QuantileGrid)
    DataSkipping.writeManifest(spark, qt, Seq("x", "y"))

    // y-only range over the BULK: the min/max grid collapsed every bulk
    // row's y coordinate to cell 0 (outliers own the range), so its
    // curve carries no y information — the quantile grid still does
    val box = Seq(DataSkipping.ColRange("y", lit(40L), lit(49L)))
    val mmScan = DataSkipping.prunedScan(spark, mm, box)
    val qtScan = DataSkipping.prunedScan(spark, qt, box)
    assert(mmScan.df.count() == qtScan.df.count() && qtScan.df.count() > 0)
    assert(qtScan.report.filesRead < mmScan.report.filesRead,
      s"quantile grid should out-prune min/max under skew: " +
        s"qt=${qtScan.report} mm=${mmScan.report}")
    assert(qtScan.report.filesRead < qtScan.report.filesTotal / 2,
      s"quantile grid should prune most files: ${qtScan.report}")
  }

  test("timestamp and skewed columns survive grid normalization") {
    val path = Files.createTempDirectory("graft_z_").toString + "/t"
    val df = (1 to 300).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
        if (i == 1) 1000000L else i.toLong)  // outlier squashes the grid
    }.toDF("ts", "v")
    ZOrder.writeZOrdered(df, path, Seq("ts", "v"), targetFiles = 3)
    val back = spark.read.parquet(path)
    assert(back.count() == 300)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }
}
