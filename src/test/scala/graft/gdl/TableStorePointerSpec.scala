package graft.gdl

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** A local filesystem that FORBIDS publish-level rename — the
  * object-store contract (rename is copy-then-delete there, so a
  * correct commit protocol must never rely on it). Renames INSIDE a
  * staged `_data-` dir (Spark's task committer moving part files out
  * of `_temporary`) are allowed: production object-store deployments
  * replace those with a rename-free committer, and they never affect
  * COMMIT atomicity — visibility is gated solely on the pointer file.
  * Any rename at the publish level (the old `_tmp-` → `g<seq>-kind`
  * claim) throws, so the rename-based protocol CANNOT pass here. */
class NoPublishRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "norename"
  override def getUri: java.net.URI = java.net.URI.create("norename:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (dst.toString.contains("_data-") && src.toString.contains("_data-"))
      super.rename(src, dst)
    else
      throw new UnsupportedOperationException(
        s"publish-level rename forbidden (object-store contract): $src -> $dst")
  }
}

/** The pointer-commit protocol, driven end to end on the rename-free
  * filesystem: every row-visible operation (append, overwrite, merge,
  * fold, compact, time travel, change feed) must work with publish =
  * one create-exclusive pointer write. */
class TableStorePointerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot(tag: String): String = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.norename.impl", classOf[NoPublishRenameFileSystem].getName)
    "norename:" + java.nio.file.Files.createTempDirectory(tag).toString
  }

  private def hadoopFs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("full lifecycle commits without any publish-level rename") {
    val root = newRoot("store-ptr")
    val store = new TableStore(spark, root, autoCompactDeltas = 1000,
      pointerCommits = true)
    (1 to 4).foreach(i => store.append("t", Seq(i).toDF("x")))
    assert(store.read("t").get.as[Int].collect().sorted.toSeq == (1 to 4))
    // minor compaction (fold), then major (comp)
    assert(store.foldDeltas("t"))
    assert(store.read("t").get.as[Int].collect().sorted.toSeq == (1 to 4))
    store.compact("t")
    assert(store.read("t").get.as[Int].collect().sorted.toSeq == (1 to 4))
    store.append("t", Seq(5).toDF("x"))
    // time travel to before the last append still resolves
    assert(store.readAt("t", 5L).get.as[Int].collect().sorted.toSeq == (1 to 4))
    assert(store.read("t").get.as[Int].collect().sorted.toSeq == (1 to 5))
    // the change feed sees exactly the post-compaction delta
    assert(store.readChangesSince("t", 5L).get.as[Int].collect().toSeq
      == Seq(5))
    // no g<seq>-kind dirs exist — publishes were pointer files only
    val f = hadoopFs(root)
    val dirs = f.listStatus(new Path(root, "t")).map(_.getPath.getName).toSet
    assert(!dirs.exists(n => n.startsWith("g")),
      s"pointer mode must not create renamed generation dirs: $dirs")
    assert(dirs.contains("_commits"))
  }

  test("merge and deleteWhere publish tombstones through pointers") {
    val root = newRoot("store-ptr-merge")
    val store = new TableStore(spark, root, autoCompactDeltas = 1000,
      pointerCommits = true)
    store.append("t", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    store.merge("t", Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"))
    assert(store.read("t").get.as[(Int, String)].collect().sorted.toSeq
      == Seq((1, "a"), (2, "B"), (3, "c")))
    store.deleteWhere("t", org.apache.spark.sql.functions.col("k") === 1)
    assert(store.read("t").get.as[(Int, String)].collect().sorted.toSeq
      == Seq((2, "B"), (3, "c")))
  }

  test("racing appends and compactions: create-exclusive slots, no loss") {
    val root = newRoot("store-ptr-race")
    val a = new TableStore(spark, root, autoCompactDeltas = 1000,
      gcGraceMs = 0L, pointerCommits = true)
    val b = new TableStore(spark, root, autoCompactDeltas = 1000,
      gcGraceMs = 0L, pointerCommits = true)
    a.append("t", Seq(0).toDF("x"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val n = 10
    val fa = Future { (1 to n).foreach(i => a.append("t", Seq(i).toDF("x"))) }
    val fb = Future { (1 to n).foreach(_ => b.compact("t")) }
    Await.result(Future.sequence(Seq(fa, fb)), 300.seconds)
    pool.shutdown()
    assert(a.read("t").get.as[Int].collect().sorted.toSeq == (0 to n))
    // slots are unique by construction: one pointer file per seq
    val f = hadoopFs(root)
    val ptrs = f.listStatus(new Path(root, "t/_commits"))
      .map(_.getPath.getName).toSeq
    assert(ptrs.distinct.size == ptrs.size)
  }

  test("a torn pointer at the next slot does not wedge appends") {
    val root = newRoot("store-ptr-torn")
    val store = new TableStore(spark, root, pointerCommits = true)
    store.append("t", Seq(1).toDF("x"))
    // a crashed writer's torn (unparseable) pointer already sits at
    // the NEXT slot — too fresh for gc's grace, so the committer
    // itself must reclaim the name instead of looping to its attempt
    // cap against create-exclusive failures
    val f = hadoopFs(root)
    f.create(new Path(root, "t/_commits/g0000001"), true).close()
    store.append("t", Seq(2).toDF("x"))
    assert(store.read("t").get.as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("gc reclaims aged orphan stages and torn pointers, never live data") {
    val root = newRoot("store-ptr-gc")
    val store = new TableStore(spark, root, gcGraceMs = 60L * 1000,
      pointerCommits = true)
    store.append("t", Seq(1).toDF("x"))
    val f = hadoopFs(root)
    val local = root.stripPrefix("norename:")
    // a crashed stager's orphan data dir and a torn pointer, both aged
    f.mkdirs(new Path(root, "t/_data-orphan"))
    val torn = f.create(new Path(root, "t/_commits/g0000009"), true)
    torn.close() // empty = unparseable
    val old = System.currentTimeMillis() - 3600L * 1000
    assert(new java.io.File(s"$local/t/_data-orphan").setLastModified(old))
    assert(new java.io.File(s"$local/t/_commits/g0000009").setLastModified(old))
    // fresh strays must survive the same sweep
    f.mkdirs(new Path(root, "t/_data-fresh"))
    store.gc("t")
    assert(!f.exists(new Path(root, "t/_data-orphan")))
    assert(!f.exists(new Path(root, "t/_commits/g0000009")))
    assert(f.exists(new Path(root, "t/_data-fresh")))
    assert(store.read("t").get.as[Int].collect().toSeq == Seq(1))
  }
}
