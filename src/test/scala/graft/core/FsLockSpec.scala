package graft.core

import java.nio.file.Files

import graft.SparkTestBase

class FsLockSpec extends SparkTestBase {

  test("second writer gets a loud LockHeld, not silent interleaving") {
    val dir = Files.createTempDirectory("fslock").toString + "/table"
    FsLock.acquire(spark, dir, "writer-a")
    val e = intercept[FsLock.LockHeld](FsLock.acquire(spark, dir, "writer-b"))
    assert(e.owner == "writer-a")
    FsLock.release(spark, dir)
    // released → acquirable again
    FsLock.withLock(spark, dir, "writer-b") { () }
  }

  test("a stale lock from a dead writer is broken; a fresh one is not") {
    val dir = Files.createTempDirectory("fslock-stale").toString + "/table"
    FsLock.acquire(spark, dir, "crashed-writer")
    // fresh lock survives
    intercept[FsLock.LockHeld](FsLock.acquire(spark, dir, "writer-b", staleMs = 60000))
    // the same lock, judged by a 0ms horizon, is stale → broken and re-acquired
    Thread.sleep(5)
    FsLock.acquire(spark, dir, "writer-b", staleMs = 0)
    FsLock.release(spark, dir)
  }

  test("release is idempotent") {
    val dir = Files.createTempDirectory("fslock-idem").toString + "/table"
    FsLock.release(spark, dir) // never held: no-op
    FsLock.acquire(spark, dir, "w")
    FsLock.release(spark, dir)
    FsLock.release(spark, dir)
  }

  test("pruneStale reaps only marker-bearing siblings whose marker has aged out") {
    val f = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val root = Files.createTempDirectory("wh-prune").toString + "/kind"
    def mk(name: String, marker: Boolean): String = {
      val p = new org.apache.hadoop.fs.Path(s"$root/$name")
      f.mkdirs(p)
      if (marker) f.create(new org.apache.hadoop.fs.Path(p, "_GRAFT_BUILT"), true).close()
      s"$root/$name"
    }
    val current = mk("aaaa", marker = true)
    val unusedOld = mk("bbbb", marker = true)
    val usedRecently = mk("cccc", marker = true)
    val inProgress = mk("dddd", marker = false) // concurrent build: no marker yet
    f.setTimes(new org.apache.hadoop.fs.Path(s"$unusedOld/_GRAFT_BUILT"),
      System.currentTimeMillis() - 1000, -1)
    Warehouse.pruneStale(spark, current, retainMs = 500)
    assert(f.exists(new org.apache.hadoop.fs.Path(current)), "current state must survive")
    assert(!f.exists(new org.apache.hadoop.fs.Path(unusedOld)), "aged-out state must go")
    assert(f.exists(new org.apache.hadoop.fs.Path(usedRecently)),
      "a recently-used sibling (fresh marker) must survive")
    assert(f.exists(new org.apache.hadoop.fs.Path(inProgress)),
      "a markerless dir (in-progress build) must never be touched")
  }

  test("derivedDir keys on builder params: changed knobs get a fresh index dir") {
    val src = Files.createTempDirectory("wh-params")
    Files.write(src.resolve("part-0.parquet"), "payload".getBytes)
    val a = Warehouse.derivedDir(spark, "k", src.toString, params = "bits=8")
    val b = Warehouse.derivedDir(spark, "k", src.toString, params = "bits=16")
    val a2 = Warehouse.derivedDir(spark, "k", src.toString, params = "bits=8")
    assert(a != b, "different knobs must not share an index")
    assert(a == a2, "same source + knobs must be stable")
  }

  test("ownership-checked release leaves a successor's lock alone") {
    val dir = Files.createTempDirectory("fslock-owner").toString + "/table"
    FsLock.acquire(spark, dir, "slow-writer")
    // a breaker supersedes the slow writer after its stale horizon
    Thread.sleep(5)
    FsLock.acquire(spark, dir, "successor", staleMs = 0)
    // the slow writer's (owner-checked) release must NOT delete the
    // successor's lock...
    FsLock.release(spark, dir, "slow-writer")
    val e = intercept[FsLock.LockHeld](FsLock.acquire(spark, dir, "third"))
    assert(e.owner == "successor")
    // ...and the successor's own release does
    FsLock.release(spark, dir, "successor")
    FsLock.withLock(spark, dir, "third") { () }
  }

  test("ensureBuilt builds exactly once per source state and rebuilds on change") {
    val src = Files.createTempDirectory("wh-src")
    Files.write(src.resolve("part-0.parquet"), "v1-payload".getBytes)
    val builds = new java.util.concurrent.atomic.AtomicInteger
    def run(): String = {
      val d = Warehouse.derivedDir(spark, "spec_idx", src.toString)
      Warehouse.ensureBuilt(spark, d) { out =>
        builds.incrementAndGet()
        val p = new org.apache.hadoop.fs.Path(s"$out/payload")
        val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        f.mkdirs(p.getParent); f.create(p, true).close()
      }
    }
    val d1 = run(); val d2 = run()
    assert(d1 == d2 && builds.get == 1, "unchanged source must reuse the built index")
    // touching the source (new length) changes the fingerprint → new dir, fresh build
    Files.write(src.resolve("part-0.parquet"), "v2-payload-longer".getBytes)
    val d3 = run()
    assert(d3 != d1 && builds.get == 2, "changed source must get a fresh index dir")
  }
}
