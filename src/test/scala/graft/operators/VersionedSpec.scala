package graft.operators

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** [[Versioned]]: generation numbering, time-travel reads, retention,
  * and the commit-marker crash contract (uncommitted dirs are
  * invisible and never reused). */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_ver_").toString + "/t"

  test("commits number sequentially; any generation reads back exactly") {
    val path = tmp()
    val v0 = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val v1 = Seq((1L, "A"), (2L, "b"), (3L, "c")).toDF("k", "s")
    assert(Versioned.commit(v0, path).gen == 0)
    assert(Versioned.commit(v1, path).gen == 1)
    assert(Versioned.generations(spark, path) == Seq(0L, 1L))
    assert(Versioned.read(spark, path, Some(0)).collect().toSet ==
      v0.collect().toSet)
    assert(Versioned.read(spark, path).collect().toSet ==
      v1.collect().toSet)
  }

  test("retention keeps the newest N committed generations") {
    val path = tmp()
    (0 until 5).foreach { i =>
      Versioned.commit(Seq((i.toLong, s"v$i")).toDF("k", "s"),
        path, retain = 2)
    }
    assert(Versioned.generations(spark, path) == Seq(3L, 4L))
    intercept[IllegalArgumentException] {
      Versioned.read(spark, path, Some(1L))
    }
    assert(Versioned.read(spark, path).as[(Long, String)].head() ==
      ((4L, "v4")))
  }

  test("uncommitted directories are invisible and their numbers skipped") {
    val path = tmp()
    Versioned.commit(Seq((1L, "a")).toDF("k", "s"), path)
    // simulate a crashed writer: gen=1 exists with data, no marker
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((9L, "torn")).toDF("k", "s")
      .write.parquet(s"$path/gen=1")
    assert(Versioned.generations(spark, path) == Seq(0L),
      "uncommitted generation must not resolve")
    assert(Versioned.read(spark, path).as[(Long, String)].head() ==
      ((1L, "a")))
    intercept[IllegalArgumentException] {
      Versioned.read(spark, path, Some(1L))
    }
    // the next commit does not overwrite the torn dir's number
    val c = Versioned.commit(Seq((2L, "b")).toDF("k", "s"), path)
    assert(c.gen == 2)
    assert(Versioned.generations(spark, path) == Seq(0L, 2L))
    assert(fs.exists(new Path(s"$path/gen=1")), "torn dir left for floor cleanup")
  }

  test("claimed in-flight generation is skipped and survives retention") {
    val path = tmp()
    Versioned.commit(Seq((1L, "a")).toDF("k", "s"), path)
    // simulate a concurrent writer mid-commit: gen=1 holds a fresh
    // claim, no data, no commit marker
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(s"$path/gen=1/${Versioned.ClaimMarker}"), false).close()
    val c = Versioned.commit(Seq((2L, "b")).toDF("k", "s"), path, retain = 1)
    assert(c.gen == 2, "claimed number must not be reused")
    assert(Versioned.generations(spark, path) == Seq(2L))
    assert(fs.exists(new Path(s"$path/gen=1/${Versioned.ClaimMarker}")),
      "in-flight claimed dir below the floor must survive retention")
    assert(!fs.exists(new Path(s"$path/gen=0")),
      "committed dir below the floor is retired")
  }

  test("stale claim debris below the floor is reclaimed") {
    val path = tmp()
    Versioned.commit(Seq((1L, "a")).toDF("k", "s"), path)
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = new Path(s"$path/gen=1/${Versioned.ClaimMarker}")
    fs.create(claim, false).close()
    val old = System.currentTimeMillis() - Versioned.StaleClaimMs - 1000L
    fs.setTimes(claim, old, old)
    Versioned.commit(Seq((2L, "b")).toDF("k", "s"), path, retain = 1)
    assert(!fs.exists(new Path(s"$path/gen=1")),
      "crashed writer's stale claim is reclaimed once below the floor")
  }

  test("concurrent committers land on distinct generations, none lost") {
    val path = tmp()
    val threads = 4
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val commits = Await.result(
        Future.sequence((0 until threads).map { i =>
          Future(Versioned.commit(
            Seq((i.toLong, s"writer$i")).toDF("k", "s"), path, retain = 100))
        }), 2.minutes)
      assert(commits.map(_.gen).distinct.size == threads,
        "every committer must claim a distinct generation")
      assert(Versioned.generations(spark, path).size == threads)
      // every writer's payload is readable back, intact, at its gen
      commits.foreach { c =>
        val row = Versioned.read(spark, path, Some(c.gen))
          .as[(Long, String)].head()
        assert(row._2.startsWith("writer"), s"gen ${c.gen} torn: $row")
      }
    } finally pool.shutdown()
  }

  test("never-committed table fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Versioned.read(spark, tmp())
    }
    assert(e.getMessage.contains("no committed generations"))
  }
}
