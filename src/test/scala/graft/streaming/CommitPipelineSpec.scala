package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The deferred-commit pipeline's contract in isolation (the gates pin the
  * end-to-end semantics — admitted-set equivalence, restart, drop — in
  * their own suites; this covers the pipeline's own edges). */
class CommitPipelineSpec extends AnyFunSuite {

  test("tasks run in submit order on one thread") {
    val p = new CommitPipeline("t-order", Nil)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    (1 to 50).foreach(i => p.submit(() => { out.add(i); () }))
    p.drain()
    assert(out.toArray.toSeq == (1 to 50))
  }

  test("a failed commit is counted + logged, never fails the draining batch") {
    val p = new CommitPipeline("t-fail", Nil)
    p.submit(() => throw new IllegalStateException("disk gone"),
      label = "batch 7")
    // the NEXT batch's drain observes the loss but must not itself fail —
    // the batch whose append died was already reported delivered; failing
    // the innocent successor would make the upstream retry the WRONG batch
    p.drain()
    assert(p.lostCommits === 1L)
    var ran = false
    p.submit(() => { ran = true })
    p.drain()
    assert(ran && p.lostCommits === 1L, "loss counted once, pipeline keeps going")
    // failpoint seam: force a loss without a real task error
    p.failNextTask = true
    p.submit(() => ())
    p.drain()
    assert(p.lostCommits === 2L)
  }

  test("consecutive losses escalate to synchronous commits; one success re-arms") {
    val p = new CommitPipeline("t-escalate", Nil)
    // N consecutive losses: still the deferred, non-failing behavior
    (1 to CommitPipeline.escalateAfter).foreach { i =>
      p.submit(() => throw new IllegalStateException("disk full"),
        label = s"batch $i")
      p.drain() // drain never throws for non-fatal task failures
    }
    assert(p.lostCommits === CommitPipeline.escalateAfter.toLong)
    // the NEXT commit runs synchronously: a persistent store failure now
    // reaches the caller instead of degrading to pass-through forever
    val ex = intercept[IllegalStateException] {
      p.submit(() => throw new IllegalStateException("disk still full"),
        label = "batch N+1")
    }
    assert(ex.getMessage === "disk still full")
    // a synchronous SUCCESS re-arms the deferred pipeline
    var ranInline = false
    p.submit(() => { ranInline = true }, label = "batch N+2")
    assert(ranInline, "escalated commit must have run inline")
    var deferredRan = false
    p.submit(() => { deferredRan = true }, label = "batch N+3")
    p.drain()
    assert(deferredRan && p.lostCommits === CommitPipeline.escalateAfter.toLong,
      "after a success the pipeline defers again; inline failures were " +
        "never counted as losses (the caller retries those batches)")
  }

  test("drain from the pipeline's own thread is a no-op (compaction cadence)") {
    val p = new CommitPipeline("t-self", Nil)
    @volatile var completed = false
    p.submit(() => { p.drain(); completed = true }) // would deadlock if not
    p.drain()
    assert(completed)
  }

  test("drainRoots joins an in-flight commit registered against a root") {
    val p = new CommitPipeline("t-roots", Seq("/tmp/cp-spec/rootA"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    @volatile var done = false
    p.submit(() => { gate.await(); done = true })
    // release from another thread after a beat, then the cross-instance
    // barrier must observe completion
    new Thread(() => { Thread.sleep(100); gate.countDown() }).start()
    CommitPipeline.drainRoots(Seq("/tmp/cp-spec/rootA"))
    assert(done)
  }

  test("drainUnder joins by directory prefix, not by string prefix") {
    val p = new CommitPipeline("t-under", Seq("/tmp/cp-spec/g1/seen_keys"))
    @volatile var n = 0
    p.submit(() => { n += 1 })
    // sibling dir with a shared string prefix must NOT match …/g1
    CommitPipeline.drainUnder("/tmp/cp-spec/g1x")
    p.submit(() => { n += 1 })
    CommitPipeline.drainUnder("/tmp/cp-spec/g1")
    assert(n == 2)
    // exact-root match drains too
    p.submit(() => { n += 1 })
    CommitPipeline.drainUnder("/tmp/cp-spec/g1/seen_keys")
    assert(n == 3)
  }

  test("a failed abandoned-instance commit is swallowed by drainRoots (logged)") {
    val p = new CommitPipeline("t-root-fail", Seq("/tmp/cp-spec/rootB"))
    p.submit(() => throw new RuntimeException("abandoned crash"))
    // bootstrap of a NEW instance must proceed from the durable store
    CommitPipeline.drainRoots(Seq("/tmp/cp-spec/rootB"))
  }
}
