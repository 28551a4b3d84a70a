package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** The commit-point semantics [[ObjectStoreFs]] must provide on a
  * no-rename store — the crash windows the manifest swap and catalog
  * journal survive on rename filesystems via `.prev` asides simply DO
  * NOT EXIST here: a single-key conditional PUT is atomic, so a reader
  * can never observe the pointer absent or torn. These tests pin that
  * contract against the in-memory double; a real S3 adapter implements
  * [[BlobStore]]'s four ops and inherits every assertion. */
class ObjectStorePublishSpec extends AnyFunSuite {

  private def mk(): (MemBlobStore, ObjectStoreFs) = {
    val b = new MemBlobStore
    (b, new ObjectStoreFs(b))
  }

  test("replace-publish has NO missing-pointer window: the destination " +
      "is readable with old or new content at every step") {
    val (_, fs) = mk()
    fs.writeString("mem:/r/m.tmp.1", "v1")
    fs.publish("mem:/r/m.tmp.1", "mem:/r/manifest", durable = true,
      replace = true)
    // the manifest-swap sequence: between staging the temp and the
    // publish, the committed pointer stays v1 (no aside rename ever
    // removes it — contrast HadoopStoreFs.publish's documented window)
    fs.writeString("mem:/r/m.tmp.2", "v2")
    assert(fs.readString("mem:/r/manifest") === "v1",
      "pointer intact while the next version is staged")
    fs.publish("mem:/r/m.tmp.2", "mem:/r/manifest", durable = true,
      replace = true)
    assert(fs.readString("mem:/r/manifest") === "v2")
    assert(!fs.exists("mem:/r/manifest.prev"),
      "no aside artifact — the window the aside covers does not exist")
  }

  test("a crash BEFORE the publish leaves the previous manifest " +
      "committed and only an orphan temp behind") {
    val (_, fs) = mk()
    fs.writeString("mem:/r/m.tmp.1", "v1")
    fs.publish("mem:/r/m.tmp.1", "mem:/r/manifest", durable = true,
      replace = true)
    fs.writeString("mem:/r/m.tmp.2", "v2")
    // "crash": the writer dies here — nothing else happens
    assert(fs.readString("mem:/r/manifest") === "v1",
      "uncommitted publish loses only the uncommitted version")
    assert(fs.exists("mem:/r/m.tmp.2"), "orphan temp, harmless")
    // the retry re-stages and wins
    fs.writeString("mem:/r/m.tmp.2", "v2")
    fs.publish("mem:/r/m.tmp.2", "mem:/r/manifest", durable = true,
      replace = true)
    assert(fs.readString("mem:/r/manifest") === "v2")
  }

  test("journal append is a CAS read-modify-write: concurrent appenders " +
      "lose no lines (the torn-append window does not exist)") {
    val (_, fs) = mk()
    val threads = (0 until 4).map { t =>
      new Thread(() => (0 until 25).foreach(i =>
        fs.appendLine("mem:/r/_catalog.jsonl", s"t$t-$i")))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val lines = fs.readString("mem:/r/_catalog.jsonl").split("\n")
    assert(lines.length === 100, s"every append landed, got ${lines.length}")
    for (t <- 0 until 4; i <- 0 until 25)
      assert(lines.contains(s"t$t-$i"), s"missing t$t-$i")
    // per-thread order preserved (each CAS appends atomically)
    for (t <- 0 until 4) {
      val mine = lines.filter(_.startsWith(s"t$t-")).map(_.split("-")(1).toInt)
      assert(mine.toSeq === mine.sorted.toSeq, s"thread $t order")
    }
  }

  test("bounded CAS retries: persistent condition failures surface as a " +
      "loud single-writer-contract error, never an infinite loop") {
    val (b, fs) = mk()
    fs.writeString("mem:/r/j", "x\n")
    b.failPutsOnce(32) // every retry loses — a phantom concurrent writer
    val e = intercept[java.io.IOException] {
      fs.appendLine("mem:/r/j", "y")
    }
    assert(e.getMessage.contains("single-writer"))
    assert(fs.readString("mem:/r/j") === "x\n", "journal untouched")
  }

  test("put-if-absent publish: the loser throws and the winner's bytes " +
      "stay; the loser's temp is NOT consumed") {
    val (_, fs) = mk()
    fs.writeString("mem:/r/t1", "winner")
    fs.publish("mem:/r/t1", "mem:/r/gen_1.json", durable = true)
    fs.writeString("mem:/r/t2", "loser")
    intercept[java.nio.file.FileAlreadyExistsException] {
      fs.publish("mem:/r/t2", "mem:/r/gen_1.json", durable = true)
    }
    assert(fs.readString("mem:/r/gen_1.json") === "winner")
    assert(fs.exists("mem:/r/t2"),
      "failed publish must not delete the staged temp")
  }

  test("readAt + fileSize serve the spool frame check over object bytes") {
    val (_, fs) = mk()
    val payload = "PAR1" + ("x" * 20) + "PAR1"
    fs.writeString("mem:/r/fwd_00001.parquet", payload)
    assert(fs.fileSize("mem:/r/fwd_00001.parquet") === payload.length.toLong)
    assert(new String(fs.readAt("mem:/r/fwd_00001.parquet", 0, 4)) === "PAR1")
    assert(new String(fs.readAt("mem:/r/fwd_00001.parquet",
      payload.length - 4L, 4)) === "PAR1")
    assert(fs.readAt("mem:/r/fwd_00001.parquet",
      payload.length - 2L, 4).length === 2, "short read at EOF")
  }
}
