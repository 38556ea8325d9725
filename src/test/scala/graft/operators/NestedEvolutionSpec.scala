package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Nested struct-field evolution ([[FactVersioned.addNestedColumn]] /
  * [[FactVersioned.dropNestedColumn]] + the `GraftCatalog.alterTable`
  * routing): metadata-only commits reshape a struct inside the pinned
  * schema; parquet schema clipping makes carried files null-fill an
  * added field (arrays of structs included) and never project a
  * dropped one. Every generation keeps its own shape — `VERSION AS OF`
  * reads both sides. */
class NestedEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_nested_").toString

  /** k, p, meta: struct<src string, score long> */
  private def base(n: Int) =
    (1 to n).map(i => (i.toLong, i % 3, s"s$i", i * 10L))
      .toDF("k", "p", "src", "score")
      .select(col("k"), col("p"),
        struct(col("src"), col("score")).as("meta"))

  test("addNestedColumn: carried files null-fill the new field; a " +
      "post-evolution upsert stages real values; VERSION AS OF reads " +
      "both shapes") {
    val path = tmp() + "/t"
    FactVersioned.upsert(spark, path, base(9), Seq("k"), "p", retain = 5)
    FactVersioned.addNestedColumn(spark, path, Seq("meta", "lang"),
      StringType, retain = 5)
    // carried rows: the field exists in the head schema and reads null
    val head = FactVersioned.read(spark, path)
    assert(head.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("src", "score", "lang"))
    assert(head.select(col("meta.lang")).as[Option[String]]
      .collect().forall(_.isEmpty))
    assert(head.count() == 9)
    // pre-evolution generation keeps its narrow shape
    val v0 = FactVersioned.read(spark, path, Some(0L))
    assert(v0.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("src", "score"))
    // a post-evolution upsert stages the FULL reshaped struct
    val batch = Seq((100L, 1)).toDF("k", "p")
      .select(col("k"), col("p"),
        struct(lit("new").as("src"), lit(7L).as("score"),
          lit("en").as("lang")).as("meta"))
    FactVersioned.upsert(spark, path, batch, Seq("k"), "p", retain = 5)
    val got = FactVersioned.read(spark, path)
      .select(col("k"), col("meta.src"), col("meta.lang"))
      .as[(Long, String, Option[String])].collect().toSet
    assert(got.contains((100L, "new", Some("en"))))
    assert(got.contains((1L, "s1", None)))
    assert(got.size == 10)
  }

  test("nested fields inside ARRAYS of structs evolve: carried rows " +
      "null-fill the field in every element") {
    val path = tmp() + "/t"
    val df = (1 to 6).map(i => (i.toLong, i % 2)).toDF("k", "p")
      .select(col("k"), col("p"),
        array(struct(col("k").as("a")),
          struct((col("k") * 2).as("a"))).as("tags"))
    FactVersioned.upsert(spark, path, df, Seq("k"), "p", retain = 5)
    // the SQL spelling (tags.element.b) and the API spelling (tags.b)
    // resolve identically
    FactVersioned.addNestedColumn(spark, path,
      Seq("tags", "element", "b"), StringType, retain = 5)
    val head = FactVersioned.read(spark, path)
    val elem = head.schema("tags").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(elem.fieldNames.toSeq == Seq("a", "b"))
    val got = head.where(col("k") === 3)
      .select(explode(col("tags")).as("t"))
      .select(col("t.a"), col("t.b"))
      .as[(Long, Option[String])].collect().toSet
    assert(got == Set((3L, None), (6L, None)), got.toString)
  }

  test("dropNestedColumn: the field vanishes from the head, history " +
      "keeps it, and a re-add of the dropped path is rejected " +
      "(tombstone, both spellings)") {
    val path = tmp() + "/t"
    FactVersioned.upsert(spark, path, base(6), Seq("k"), "p", retain = 5)
    FactVersioned.dropNestedColumn(spark, path, Seq("meta", "score"),
      retain = 5)
    val head = FactVersioned.read(spark, path)
    assert(head.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("src"))
    assert(head.select(col("meta.src")).as[String].collect().toSet ==
      (1 to 6).map(i => s"s$i").toSet)
    // history still reads the full struct
    assert(FactVersioned.read(spark, path, Some(0L))
      .select(col("meta.score")).as[Long].collect().toSet ==
      (1 to 6).map(_ * 10L).toSet)
    // the dropped path cannot re-add — carried files still hold it
    val e = intercept[IllegalArgumentException] {
      FactVersioned.addNestedColumn(spark, path, Seq("meta", "score"),
        LongType, retain = 5)
    }
    assert(e.getMessage.contains("DROPPED"), e.getMessage)
    // the last remaining field cannot drop — guidance names the column
    val last = intercept[IllegalArgumentException] {
      FactVersioned.dropNestedColumn(spark, path, Seq("meta", "src"))
    }
    assert(last.getMessage.contains("drop the whole column"),
      last.getMessage)
  }

  test("path validation fails loudly: non-struct parent, missing " +
      "segment, top-level path") {
    val path = tmp() + "/t"
    FactVersioned.upsert(spark, path, base(3), Seq("k"), "p")
    val nonStruct = intercept[IllegalArgumentException] {
      FactVersioned.addNestedColumn(spark, path, Seq("k", "x"), StringType)
    }
    assert(nonStruct.getMessage.contains("not a struct"),
      nonStruct.getMessage)
    val missing = intercept[IllegalArgumentException] {
      FactVersioned.addNestedColumn(spark, path, Seq("nope", "x"),
        StringType)
    }
    assert(missing.getMessage.contains("does not exist"),
      missing.getMessage)
    val topLevel = intercept[IllegalArgumentException] {
      FactVersioned.addNestedColumn(spark, path, Seq("x"), StringType)
    }
    assert(topLevel.getMessage.contains("addColumns"), topLevel.getMessage)
  }

  test("SQL door: ALTER TABLE ADD/DROP COLUMN of a nested field " +
      "routes to the metadata-only commits on a FACT table and a " +
      "full-copy generation on a DIMENSION") {
    val wh = tmp()
    val s = spark
    s.conf.set("spark.sql.catalog.g2",
      classOf[graft.catalog.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.g2.root", wh)
    FactVersioned.upsert(s, s"$wh/f", base(6), Seq("k"), "p", retain = 5)
    s.sql("ALTER TABLE g2.f ADD COLUMN meta.lang STRING")
    assert(FactVersioned.generations(s, s"$wh/f") == Seq(0L, 1L),
      "nested ADD on a fact must be one metadata-only generation")
    assert(s.table("g2.f").select(col("meta.lang"))
      .as[Option[String]].collect().forall(_.isEmpty))
    s.sql("ALTER TABLE g2.f DROP COLUMN meta.score")
    assert(s.table("g2.f").schema("meta").dataType
      .asInstanceOf[StructType].fieldNames.toSeq == Seq("src", "lang"))
    // dimension: full-copy reshape
    Versioned.commit(base(4), s"$wh/d")
    s.sql("ALTER TABLE g2.d ADD COLUMN meta.lang STRING")
    assert(s.table("g2.d").schema("meta").dataType
      .asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("src", "score", "lang"))
    s.sql("ALTER TABLE g2.d DROP COLUMN meta.score")
    assert(s.table("g2.d").select(col("meta.src")).as[String]
      .collect().toSet == (1 to 4).map(i => s"s$i").toSet)
  }
}
