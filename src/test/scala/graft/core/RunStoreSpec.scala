package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The shared store machinery's edge cases — exercised through a
  * throwaway RunStore instance so the five production stores don't
  * need to each re-prove them.
  */
class RunStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a stale warehouse directory from a previous process (orphan " +
    "location, no catalog entry) does not block the rebuild") {
    import spark.implicits._
    val store = new RunStore("graft_test_orphan", 2, Seq("k"),
      (s, _) => Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val t = store.tableName("/no/such/dir")
    try {
      // simulate the crashed-previous-JVM state: files on disk under
      // the store's location, nothing in the (in-memory) catalog
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(loc)
      val out = fs.create(new org.apache.hadoop.fs.Path(loc, "junk"))
      out.writeBytes("stale"); out.close()
      spark.sql(s"DROP TABLE IF EXISTS $t")

      assert(store.table(spark, "/no/such/dir").count() == 2)
      // and the memoized second read returns the same table untouched
      assert(store.table(spark, "/no/such/dir").count() == 2)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      store.reset()
    }
  }

  test("fingerprint revalidation: an unchanged source reuses the " +
    "on-disk build across reset(); a source change or a derivation " +
    "change rebuilds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val dir = java.nio.file.Files.createTempDirectory("runstore_src")
    java.nio.file.Files.writeString(dir.resolve("data.txt"), "v1")
    def mkStore(tag: Int) = new RunStore("graft_test_reval", 2, Seq("k"),
      (_, _) => Seq((1L, "a"), (2L, "b")).toDF("k", "v")
        .withColumn("w", lit(tag)))
    val store = mkStore(1)
    val t = store.tableName(dir.toString)
    try {
      assert(store.ensure(spark, dir.toString) == "built")
      assert(store.ensure(spark, dir.toString) == "memoized")
      // fresh memo, untouched source: the previous build is reused
      store.reset()
      assert(store.ensure(spark, dir.toString) == "reused")
      assert(store.table(spark, dir.toString).count() == 2)
      // source file changed (size): fingerprint mismatch -> rebuild
      java.nio.file.Files.writeString(dir.resolve("data.txt"), "v2 longer")
      store.reset()
      assert(store.ensure(spark, dir.toString) == "built")
      // derivation changed (different literal in the build plan):
      // sources untouched, still a rebuild — stale derived rows are the
      // dangerous direction
      assert(mkStore(2).ensure(spark, dir.toString) == "built")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      store.reset()
    }
  }

  test("an independent sortKeys spec is part of the layout contract: " +
    "the written files are sorted by it, an unchanged spec reuses " +
    "across reset(), and CHANGING the sort spec rebuilds (round-13: " +
    "the z-store's (shard, zkey) sort is what row-group pruning " +
    "stands on — a silently unsorted rebuild must be impossible)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("runstore_sort")
    java.nio.file.Files.writeString(dir.resolve("data.txt"), "v1")
    def mkStore(sort: Seq[String]) = new RunStore("graft_test_sort", 2,
      Seq("k"),
      (_, _) => Seq((1L, 5L, "a"), (1L, 3L, "b"), (2L, 9L, "c"),
        (2L, 1L, "d")).toDF("k", "z", "v"),
      sortKeys = sort)
    val store = mkStore(Seq("k", "z"))
    val t = store.tableName(dir.toString)
    try {
      assert(store.ensure(spark, dir.toString) == "built")
      // the catalog spec carries the independent sort columns
      val cat = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t))
      assert(cat.bucketSpec.get.sortColumnNames == Seq("k", "z"))
      // same spec, fresh memo: fingerprint-valid reuse
      store.reset()
      assert(store.ensure(spark, dir.toString) == "reused")
      // different sort spec, same data/derivation: must rebuild — the
      // on-disk ORDER is the product being served
      assert(mkStore(Seq("k")).ensure(spark, dir.toString) == "built")
      store.reset()
      assert(mkStore(Seq("k", "z")).ensure(spark, dir.toString) == "built")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      store.reset()
    }
  }

  test("a fresh JVM (empty in-memory catalog, fingerprint-valid files " +
    "on disk) re-registers the location with its bucket spec instead " +
    "of rebuilding") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("runstore_src2")
    java.nio.file.Files.writeString(dir.resolve("data.txt"), "stable")
    val store = new RunStore("graft_test_fresh", 2, Seq("k"),
      (_, _) => Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    val t = store.tableName(dir.toString)
    val hconf = spark.sparkContext.hadoopConfiguration
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
    val fs = loc.getFileSystem(hconf)
    try {
      assert(store.ensure(spark, dir.toString) == "built")
      // simulate a NEW process: the in-memory catalog forgets the table
      // (DROP deletes managed data, so stash the directory around it)
      val backup = new org.apache.hadoop.fs.Path(loc.getParent, t + "_bak")
      org.apache.hadoop.fs.FileUtil.copy(fs, loc, fs, backup, false, hconf)
      spark.sql(s"DROP TABLE $t")
      assert(!fs.exists(loc))
      org.apache.hadoop.fs.FileUtil.copy(fs, backup, fs, loc, true, hconf)
      store.reset()

      assert(store.ensure(spark, dir.toString) == "reused")
      assert(store.table(spark, dir.toString).count() == 3)
      // the re-registered entry carries the REAL bucket spec, so
      // bucketed scans plan exactly as if this JVM had written it
      val bs = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t)).bucketSpec
      assert(bs.exists(b => b.numBuckets == 2 &&
        b.bucketColumnNames == Seq("k") && b.sortColumnNames == Seq("k")))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      if (fs.exists(loc)) fs.delete(loc, true)
      store.reset()
    }
  }

  test("a rebuilt upstream store invalidates stores derived from its " +
    "table (the sidecar fingerprint chains through catalog reads)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("runstore_src3")
    def mkUpstream(tag: Int) = new RunStore("graft_test_up", 2, Seq("k"),
      (_, _) => Seq((1L, "a"), (2L, "b")).toDF("k", "v")
        .withColumn("w", lit(tag)))
    val up1 = mkUpstream(1)
    val tUp = up1.tableName(dir.toString)
    val down = new RunStore("graft_test_down", 2, Seq("k"),
      (s, _) => s.table(tUp).select(col("k"), col("w")))
    val tDown = down.tableName(dir.toString)
    try {
      assert(up1.ensure(spark, dir.toString) == "built")
      assert(down.ensure(spark, dir.toString) == "built")
      // nothing changed: both revalidate
      up1.reset(); down.reset()
      assert(up1.ensure(spark, dir.toString) == "reused")
      assert(down.ensure(spark, dir.toString) == "reused")
      // upstream derivation changes -> upstream rebuilds; downstream's
      // OWN plan is unchanged but its recorded upstream fingerprint no
      // longer matches -> downstream rebuilds too, never serving rows
      // derived from the dead upstream build
      assert(mkUpstream(2).ensure(spark, dir.toString) == "built")
      down.reset()
      assert(down.ensure(spark, dir.toString) == "built")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tDown")
      spark.sql(s"DROP TABLE IF EXISTS $tUp")
      down.reset(); up1.reset()
    }
  }

  test("distinct raw dirs that sanitize identically still get distinct " +
    "tables (the shared naming helper)") {
    val a = RunStore.tableName("pfx", "/data/sf0.001")
    val b = RunStore.tableName("pfx", "/data/sf0_001")
    assert(a != b)
    assert(a.matches("[A-Za-z0-9_]+"))
  }

  test("externally damaged store files fail the sidecar's output " +
    "manifest check: revalidation rebuilds instead of silently serving " +
    "a partial store (round-9 advisory)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("runstore_dmg")
    java.nio.file.Files.writeString(dir.resolve("data.txt"), "stable")
    val store = new RunStore("graft_test_dmg", 2, Seq("k"),
      (_, _) => Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v"))
    val t = store.tableName(dir.toString)
    try {
      assert(store.ensure(spark, dir.toString) == "built")
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(t)).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // damage: delete one data file, leave the sidecar intact
      val victim = fs.listStatus(loc)
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .head.getPath
      fs.delete(victim, false)
      store.reset()
      assert(store.ensure(spark, dir.toString) == "built",
        "a manifest mismatch must rebuild, never reuse")
      assert(store.table(spark, dir.toString).count() == 4)
    } finally {
      RunStore.dropWithLocation(spark, t)
      store.reset()
    }
  }

  test("an unreadable sidecar — malformed content, not just a missing " +
    "file — triggers the treat-as-stale rebuild instead of failing " +
    "the access (round-9 advisory: Properties.load throws " +
    "IllegalArgumentException on bad unicode escapes)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("runstore_bad")
    java.nio.file.Files.writeString(dir.resolve("data.txt"), "stable")
    val store = new RunStore("graft_test_bad", 2, Seq("k"),
      (_, _) => Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val t = store.tableName(dir.toString)
    try {
      assert(store.ensure(spark, dir.toString) == "built")
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(t)).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val sc = new org.apache.hadoop.fs.Path(loc, "_graft_store.properties")
      val out = fs.create(sc, true)
      try out.writeBytes("fingerprint=\\uZZZZ broken\n") finally out.close()
      store.reset()
      // must neither throw nor reuse the corrupted sidecar's location
      assert(store.ensure(spark, dir.toString) == "built")
      assert(store.table(spark, dir.toString).count() == 2)
    } finally {
      RunStore.dropWithLocation(spark, t)
      store.reset()
    }
  }

  test("the store lifecycle keeps cross-process reuse alive: after a " +
    "fold (manifest refreshed) and a compaction (sidecar carried to " +
    "the generation dir), a fresh memo still revalidates as 'reused' " +
    "with the folded rows intact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("runstore_lc")
    java.nio.file.Files.writeString(dir.resolve("data.txt"), "stable")
    val store = new RunStore("graft_test_lc", 2, Seq("band", "bkey"),
      (_, _) => Seq((1L, 0, "a"), (2L, 1, "b"))
        .toDF("doc_id", "band", "bkey"))
    val t = store.tableName(dir.toString)
    try {
      assert(store.ensure(spark, dir.toString) == "built")
      // a nightly fold appends files; the manifest must follow or the
      // next process would read the fold as damage and rebuild,
      // discarding the admitted rows
      DedupTextQueries.foldAdmittedVia(docs =>
          docs.select(col("doc_id"), col("band"), col("bkey")))(
        spark, t, Seq((9L, 2, "z")).toDF("doc_id", "band", "bkey"))
      store.reset()
      assert(store.ensure(spark, dir.toString) == "reused",
        "a folded store must revalidate, not rebuild")
      assert(store.table(spark, dir.toString).count() == 3)
      // compaction moves the store to a generation dir; discovery must
      // find the carried sidecar there
      DedupTextQueries.compactStore(spark, t)
      store.reset()
      assert(store.ensure(spark, dir.toString) == "reused",
        "a compacted store must revalidate at its generation dir")
      assert(store.table(spark, dir.toString).count() == 3)
    } finally {
      RunStore.dropWithLocation(spark, t)
      store.reset()
    }
  }

  test("a sidecar-less upstream catalog table is fingerprinted by its " +
    "file listing: changing it invalidates derived stores (round-9 " +
    "advisory: the old constant '?' never did)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("runstore_up2")
    val down = new RunStore("graft_test_rawup", 2, Seq("k"),
      (s, _) => s.table("raw_upstream").select(col("k"), col("v")))
    val t = down.tableName(dir.toString)
    try {
      Seq((1L, "a"), (2L, "b")).toDF("k", "v")
        .write.mode("overwrite").saveAsTable("raw_upstream")
      assert(down.ensure(spark, dir.toString) == "built")
      down.reset()
      assert(down.ensure(spark, dir.toString) == "reused")
      // the upstream (no sidecar — a plain catalog table) changes:
      // the derived store must rebuild, not serve rows from the dead
      // upstream state
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
        .write.mode("overwrite").saveAsTable("raw_upstream")
      down.reset()
      assert(down.ensure(spark, dir.toString) == "built")
      assert(down.table(spark, dir.toString).count() == 3)
    } finally {
      RunStore.dropWithLocation(spark, t)
      spark.sql("DROP TABLE IF EXISTS raw_upstream")
      down.reset()
    }
  }

  test("a compaction under a live lease strips the retained old " +
    "generation's SIDECAR at commit: post-swap folds land on the new " +
    "generation and a fresh process revalidates THERE, never against " +
    "the stale retained copy") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("runstore_ret")
    java.nio.file.Files.writeString(dir.resolve("data.txt"), "stable")
    val store = new RunStore("graft_test_ret", 2, Seq("band", "bkey"),
      (_, _) => Seq((1L, 0, "a"), (2L, 1, "b"))
        .toDF("doc_id", "band", "bkey"))
    val t = store.tableName(dir.toString)
    def loc(): org.apache.hadoop.fs.Path = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t)).location)
    val token = "pending:runstore-retained-spec"
    try {
      assert(store.ensure(spark, dir.toString) == "built")
      val oldLoc = loc()
      val fs = oldLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a pending-start lease (counts as live) forces the sweep deferral
      graft.core.StoreLeases.acquire(token, Set(t))
      DedupTextQueries.compactStore(spark, t)
      assert(fs.exists(oldLoc), "the leased generation must be retained")
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        oldLoc, "_graft_store.properties")),
        "the retained dir must lose its sidecar at the swap's commit — " +
          "a fresh process discovering it would miss every post-swap fold")
      // a post-swap fold lands on the NEW generation only
      DedupTextQueries.foldAdmittedVia(docs =>
          docs.select(col("doc_id"), col("band"), col("bkey")))(
        spark, t, Seq((9L, 2, "z")).toDF("doc_id", "band", "bkey"))
      // fresh process: discovery must land on the folded generation
      store.reset()
      assert(store.ensure(spark, dir.toString) == "reused")
      assert(store.table(spark, dir.toString).count() == 3,
        "revalidation must serve the folded generation, not the stale copy")
    } finally {
      graft.core.StoreLeases.release(token)
      RunStore.dropWithLocation(spark, t)
      store.reset()
    }
  }

  test("the cross-process build lock: a stale lock (older than the " +
    "bound) is broken and the build proceeds; a fresh foreign lock " +
    "delays the build until its holder releases; release only removes " +
    "a lock the releaser still owns") {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "_graft_locks")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(wh)
    val lock = new org.apache.hadoop.fs.Path(wh, "locked_store.lock")
    def plant(content: String, ageMs: Long): Unit = {
      val out = fs.create(lock, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      fs.setTimes(lock, System.currentTimeMillis() - ageMs, -1)
    }
    try {
      // stale: an 11-minute-old lock is presumed dead and broken
      plant("999:dead-process", 11L * 60 * 1000)
      var ran = false
      RunStore.withBuildLock(spark, "locked_store") { ran = true }
      assert(ran)
      assert(!fs.exists(lock), "the broken+reacquired lock must be released")

      // fresh: a live foreign lock delays until its holder releases
      plant("998:live-process", 0L)
      val releaser = new Thread(() => { Thread.sleep(700); fs.delete(lock, false); () })
      releaser.start()
      val t0 = System.nanoTime()
      RunStore.withBuildLock(spark, "locked_store") { }
      releaser.join()
      assert((System.nanoTime() - t0) / 1e6 >= 500,
        "the contender must wait for a fresh lock, not break it")
      assert(!fs.exists(lock))

      // ownership: a holder whose lock was usurped must not delete the
      // successor's — simulate by planting a foreign token mid-body
      RunStore.withBuildLock(spark, "locked_store") {
        plant("997:usurper", 0L)
      }
      assert(fs.exists(lock),
        "release must leave a lock the releaser no longer owns")
    } finally { fs.delete(lock, false); () }
  }

  test("a LIVE build outlasting the stale bound keeps its lock via the " +
    "heartbeat: a contender waits for release instead of usurping the " +
    "slow holder (only crashed holders' locks ever go stale)") {
    // bound 3 s / beat 1 s / body 5 s: generous to coarse (1 s) mtime
    // granularity on some filesystems, still fast to run
    val saved = RunStore.lockStaleMs
    RunStore.lockStaleMs = 3000
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    try {
      val slow = new Thread(() =>
        RunStore.withBuildLock(spark, "hb_store") {
          events.add("slow-start"); Thread.sleep(5000); events.add("slow-end")
        })
      slow.start()
      // let the slow holder take the lock before contending
      while (!events.contains("slow-start")) Thread.sleep(20)
      RunStore.withBuildLock(spark, "hb_store") { events.add("contender") }
      slow.join()
      // without the heartbeat, the contender breaks the lock at ~3 s
      // (mid-build) and "contender" lands before "slow-end"
      assert(events.toArray.toSeq ==
        Seq("slow-start", "slow-end", "contender"), events.toArray.toSeq)
    } finally RunStore.lockStaleMs = saved
  }

  test("foldAdmittedVia refuses a band frame whose key TYPES differ " +
    "from the store's (round-7 advisory: an unconditional cast would " +
    "silently truncate) — a cross-modality fold cannot corrupt a store") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    try {
      DedupTextQueries.writeSignatureStore(spark, TestSpark.Sf0001,
        "typed_store", lit(true))
      // the embedding band derivation emits INT bkeys; the text store
      // holds STRING bkeys — the fold must throw, not cast
      val e = intercept[IllegalArgumentException] {
        DedupTextQueries.foldAdmittedVia(
          SimilarityQueries.embBandFrame)(spark, "typed_store",
          Seq((900500L, Array.fill(64)(0.5f))).toDF("doc_id", "embedding"))
      }
      assert(e.getMessage.contains("bkey"), e.getMessage)
      // and the store is untouched by the refused fold
      assert(spark.table("typed_store").count() > 0)
    } finally spark.sql("DROP TABLE IF EXISTS typed_store")
  }

  test("sidecar metadata: round-trips through the build, is served " +
    "from the sidecar on the reuse path (no rebuild), and a " +
    "metaVersion change invalidates the fingerprint like any " +
    "derivation change") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("runstore_meta")
    java.nio.file.Files.writeString(dir.resolve("data.txt"), "stable")
    val meta = Map("mins" -> "0.25,-1.5", "note" -> "built by spec")
    def mkStore(mv: String) = new RunStore("graft_test_meta", 2, Seq("k"),
      (_, _) => Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      metaBuild = (_, _) => meta, metaVersion = mv)
    val store = mkStore("v1")
    val t = store.tableName(dir.toString)
    try {
      assert(store.ensure(spark, dir.toString) == "built")
      assert(store.metadata(spark, dir.toString) == meta)
      // fresh memo, untouched source: REUSED, metadata from the sidecar
      store.reset()
      assert(store.ensure(spark, dir.toString) == "reused")
      assert(store.metadata(spark, dir.toString) == meta)
      // a metadata-derivation version bump rebuilds
      assert(mkStore("v2").ensure(spark, dir.toString) == "built")
      // a store with no metaBuild reports no metadata
      val bare = new RunStore("graft_test_meta_bare", 2, Seq("k"),
        (_, _) => Seq((1L, "a")).toDF("k", "v"))
      try {
        assert(bare.metadata(spark, dir.toString).isEmpty)
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS ${bare.tableName(dir.toString)}")
        bare.reset()
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      store.reset()
    }
  }
}
