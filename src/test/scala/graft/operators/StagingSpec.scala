package graft.operators

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The staging discipline's contracts (ADVICE r5): stage-once per
  * fixture CONTENT, concurrent-stager serialization, crash safety via
  * the atomic marker. */
@graft.tags.Integration
class StagingSpec extends AnyFunSuite {

  private def freshFixture(): String = {
    val d = Files.createTempDirectory("graft-staging-fixture")
    Files.write(d.resolve("data.bin"), "fixture-bytes".getBytes)
    d.toString
  }

  test("ensure runs stage exactly once per fixture content and caches the marker payload") {
    val fixture = freshFixture()
    val runs = new AtomicInteger(0)
    def go() = Staging.ensure("spec-once", fixture, fixture) { d =>
      runs.incrementAndGet()
      Files.write(d.resolve("out.txt"), "staged".getBytes)
      "payload-42"
    }
    val d1 = go(); val d2 = go()
    assert(d1 == d2 && runs.get == 1, "second ensure must be a marker hit")
    assert(Staging.markerContent(d1) == "payload-42")
    assert(Files.exists(d1.resolve("out.txt")))
  }

  test("a regenerated fixture (content change) stages into a FRESH dir") {
    val fixture = freshFixture()
    val d1 = Staging.ensure("spec-rekey", fixture, fixture)(_ => "v1")
    // regenerate: new bytes + newer mtime, same path
    Files.write(java.nio.file.Paths.get(fixture, "data.bin"),
      "fixture-bytes-regenerated".getBytes)
    val d2 = Staging.ensure("spec-rekey", fixture, fixture)(_ => "v2")
    assert(d1 != d2, "stale staging must never be reused after regeneration")
    assert(Staging.markerContent(d2) == "v2")
  }

  test("8 concurrent ensures stage exactly once") {
    val fixture = freshFixture()
    val runs = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val ex = Executors.newFixedThreadPool(8)
    val results = (1 to 8).map { _ =>
      ex.submit(new java.util.concurrent.Callable[String] {
        def call(): String = {
          start.await()
          Staging.ensure("spec-race", fixture, fixture) { d =>
            runs.incrementAndGet()
            Thread.sleep(50) // widen the race window
            Files.write(d.resolve("raced.txt"), "x".getBytes)
            "raced"
          }.toString
        }
      })
    }
    start.countDown()
    ex.shutdown()
    assert(ex.awaitTermination(30, TimeUnit.SECONDS))
    assert(results.map(_.get).distinct.size == 1, "all stagers must converge on one dir")
    assert(runs.get == 1, s"stage ran ${runs.get} times under contention")
  }

  test("a crashed stage (no marker) is re-staged, never trusted") {
    val fixture = freshFixture()
    val runs = new AtomicInteger(0)
    intercept[RuntimeException] {
      Staging.ensure("spec-crash", fixture, fixture) { d =>
        Files.write(d.resolve("half.txt"), "partial".getBytes)
        throw new RuntimeException("staging died mid-way")
      }
    }
    val d = Staging.ensure("spec-crash", fixture, fixture) { _ =>
      runs.incrementAndGet(); "recovered"
    }
    assert(runs.get == 1, "the half-staged dir must be re-staged")
    assert(Staging.markerContent(d) == "recovered")
  }
}
