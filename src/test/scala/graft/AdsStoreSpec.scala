package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.serving.{AdsStore, QueryServer}

/** Concurrency hammers for the serving/publication layer (r13 verdict
  * tasks 3 + 4). The sequential ServingSpec cases prove the semantics;
  * these prove them under RACES: publishers racing one root must land
  * distinct committed versions with no lost update (the claim-file
  * protocol), and readers hammering a server across a live publish
  * sequence must never observe a torn version, a stale regression, or
  * an unbounded memo.
  */
class AdsStoreSpec extends AnyFunSuite {
  import TestSession._

  private val client = HttpClient.newHttpClient()

  private def getAt(port: Int, path: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** A tiny frame whose every row carries the publisher's tag, so a
    * torn directory (two racers co-writing one version) shows up as
    * mixed tags on read-back. */
  private def tagged(tag: String): DataFrame = {
    import spark.implicits._
    Seq.tabulate(4)(i => (tag, i.toLong)).toDF("tag", "i")
  }

  /** Run `n` tasks on a fresh pool with a common start barrier; fails
    * the test on any task exception. */
  private def race[T](n: Int)(task: Int => T): Seq[T] = {
    val pool = Executors.newFixedThreadPool(n)
    val gate = new CountDownLatch(1)
    try {
      val futs = (0 until n).map(i => pool.submit(new java.util.concurrent.Callable[T] {
        def call(): T = { gate.await(); task(i) }
      }))
      gate.countDown()
      futs.map(_.get(600, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  /** Interleaving coverage accumulates per CI run, not per code
    * change: each race test repeats N sub-second iterations with a
    * fresh store so one suite run explores many schedules. */
  private val RaceIterations = 20

  test("single-writer contract: racing publishers claim DISTINCT versions, no lost update") {
   for (iter <- 0 until RaceIterations) withClue(s"iteration $iter: ") {
    val root = Files.createTempDirectory("ads_race").toString + "/store"
    val writers = 8
    val rounds = 4
    // every publish lies about its version hint (all say 0) — the
    // worst case for the read-max-then-write race the claim file closes
    val landed = race(writers) { w =>
      (0 until rounds).map { r =>
        val tag = s"w${w}r$r"
        tag -> AdsStore.publish(tagged(tag), root, version = 0, keep = 1000)
      }
    }.flatten
    val versions = landed.map(_._2)
    assert(versions.distinct.size == versions.size,
      s"two publishers committed the SAME version: ${versions.sorted}")
    // nothing pruned (keep=1000): every publisher's frame must be
    // readable at exactly the version it was told it won — no lost
    // update, no torn co-written directory
    val committed = AdsStore.versions(spark, root)
    assert(committed == versions.sorted,
      s"committed $committed != returned $versions")
    landed.foreach { case (tag, v) =>
      val tags = AdsStore.readVersion(spark, root, v)
        .select("tag").distinct().collect().map(_.getString(0)).toSeq
      assert(tags == Seq(tag), s"version $v torn or lost: tags=$tags want=$tag")
    }
   }
  }

  test("racing publishers with pruning: store stays bounded, latest version is never torn") {
   for (iter <- 0 until RaceIterations) withClue(s"iteration $iter: ") {
    val root = Files.createTempDirectory("ads_race_prune").toString + "/store"
    race(6) { w =>
      (0 until 5).foreach { r =>
        AdsStore.publish(tagged(s"w${w}r$r"), root, version = 0, keep = 2)
      }
    }
    // a slow racer can commit BELOW a fast racer's horizon after the
    // fast racer's prune ran (grace-protected, so its write job never
    // fails); one quiet publish sweeps those stragglers
    AdsStore.publish(tagged("quiesce"), root, 0, keep = 2)
    val committed = AdsStore.versions(spark, root)
    assert(committed.size <= 2, s"prune failed to bound the store: $committed")
    // the surviving newest version reads back internally consistent
    val tags = AdsStore.read(spark, root).get._2
      .select("tag").distinct().collect().map(_.getString(0)).toSeq
    assert(tags == Seq("quiesce"), s"latest version is a torn mix: $tags")
   }
  }

  test("prune grace: a FRESH uncommitted claim below the horizon survives; a stale one is reaped") {
    val root = Files.createTempDirectory("ads_grace").toString + "/store"
    // 4 publishes at keep=2 leave committed {2,3}; slots 0 and 1 are
    // pruned clean, free to stage fake uncommitted claims below the
    // next publish's horizon (which will be 3)
    (0 until 4).foreach(i => AdsStore.publish(tagged(s"v$i"), root, i, keep = 2))
    val dir = java.nio.file.Paths.get(root)
    // a fresh claim below the horizon = a concurrent publisher still
    // writing; prune must NOT touch it (deleting it mid-write fails
    // that publisher's job — the race the hammer originally caught)
    val freshClaim = dir.resolve("v=0.claim")
    Files.createFile(freshClaim)
    Files.createDirectories(dir.resolve("v=0")) // its in-progress dir
    // a STALE claim + partial = a crashed publisher's leftover
    val staleClaim = dir.resolve("v=1.claim")
    Files.createFile(staleClaim)
    Files.createDirectories(dir.resolve("v=1"))
    java.nio.file.Files.setLastModifiedTime(staleClaim,
      java.nio.file.attribute.FileTime.fromMillis(
        java.lang.System.currentTimeMillis() - AdsStore.ClaimGraceMs - 60000))
    // tmp commit dirs (publish's own naming): a FRESH one below the
    // horizon is a live racer mid-write and must survive; a STALE one
    // is a crashed publisher's leftover and must be reaped by mtime
    val freshTmp = dir.resolve("v=0.tmp.12345.1")
    Files.createDirectories(freshTmp)
    val staleTmp = dir.resolve("v=1.tmp.54321.2")
    Files.createDirectories(staleTmp)
    java.nio.file.Files.setLastModifiedTime(staleTmp,
      java.nio.file.attribute.FileTime.fromMillis(
        java.lang.System.currentTimeMillis() - AdsStore.ClaimGraceMs - 60000))
    AdsStore.publish(tagged("next"), root, 99, keep = 2)
    assert(Files.exists(freshClaim) && Files.exists(dir.resolve("v=0")),
      "prune deleted a fresh in-flight claim below the horizon")
    assert(!Files.exists(staleClaim) && !Files.exists(dir.resolve("v=1")),
      "prune failed to reap a crashed publisher's stale claim + partial")
    assert(Files.exists(freshTmp),
      "prune deleted a live racer's fresh tmp commit dir")
    assert(!Files.exists(staleTmp),
      "prune failed to reap a crashed publisher's stale tmp dir")
  }

  test("serving hammer: parallel readers across a live publish sequence see no tears, no regressions, bounded memo") {
    val root = Files.createTempDirectory("ads_serve").toString + "/live"
    val server = new QueryServer(spark, sf, port = 0)
    val port = server.start()
    try {
      server.bindStore("ads_live_hammer", root)
      AdsStore.publish(tagged("v0"), root, 0)
      val publisher = new Thread(() => {
        (1 to 12).foreach { i =>
          // keep deeper than the publish cadence ÷ read latency: a
          // reader that resolved version v must still find v on disk
          // mid-collect even if several publishes complete meanwhile
          // (the production contract: keep ≥ 1 + publishes-per-read)
          AdsStore.publish(tagged(s"v$i"), root, i, keep = 6)
          Thread.sleep(30)
        }
      })
      publisher.start()
      // readers hammer while the publisher advances the store
      val perReader = race(6) { _ =>
        val seen = ArrayBuffer.empty[Int]
        val deadline = java.lang.System.nanoTime() + 1500L * 1000 * 1000
        while (java.lang.System.nanoTime() < deadline) {
          val (code, body) = getAt(port, "/api/query/ads_live_hammer")
          assert(code == 200, s"reader got $code: $body")
          // parse the tag set out of the JSON rows — a torn response
          // would mix two publishers' tags
          val tags = "\"tag\":\"(v\\d+)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
          assert(tags.nonEmpty && tags.distinct.size == 1,
            s"torn response mixes versions: ${tags.distinct}")
          seen += tags.head.stripPrefix("v").toInt
        }
        seen.toSeq
      }
      publisher.join()
      perReader.foreach { seq =>
        assert(seq.nonEmpty)
        // versions are monotonic per sequential reader — a regression
        // means a request resolved an OLDER committed version than a
        // previous one (stale serving)
        assert(seq.zip(seq.tail).forall { case (a, b) => b >= a },
          s"reader observed a version regression: $seq")
      }
      // one settling request, then the memo must hold exactly the
      // newest version's entry for this name (superseded evicted)
      getAt(port, "/api/query/ads_live_hammer")
      val entries = server.cachedKeys.filter(_.contains("ads_live_hammer"))
      assert(entries.size <= 1, s"memo unbounded under churn: $entries")

      // rebind under load: repoint the name to a fresh root while
      // readers are in flight; afterwards the old root's entries are
      // gone and responses serve the new root (the r13 rebind-race fix)
      val root2 = Files.createTempDirectory("ads_serve2").toString + "/live2"
      AdsStore.publish(tagged("fresh"), root2, 0)
      race(4) { i =>
        if (i == 0) server.bindStore("ads_live_hammer", root2)
        else (0 until 20).foreach(_ => getAt(port, "/api/query/ads_live_hammer"))
      }
      val (_, after) = getAt(port, "/api/query/ads_live_hammer")
      assert(after.contains("\"tag\":\"fresh\""), s"rebind not visible: $after")
      val oldHash = Integer.toHexString(root.hashCode)
      assert(!server.cachedKeys.exists(_.contains(s"@$oldHash@")),
        "stale entries for the unbound root stranded in the memo")
    } finally server.stop()
  }
}
