package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** The scheme-portable store seam, ALL implementations driven through
  * the SAME assertions: plain-root java.nio, file:-scheme Hadoop
  * FileSystem, and the conditional-PUT object-store form (round 17 —
  * [[ObjectStoreFs]] over the in-memory [[MemBlobStore]] double) must be
  * observationally identical for every operation the store layer uses.
  * No Spark session needed.
  */
class StoreFsSpec extends AnyFunSuite {

  private def withBoth(testBody: (StoreFs, String) => Unit): Unit = {
    val plain = java.nio.file.Files.createTempDirectory("graft_sfs_l").toString
    testBody(StoreFs.forRoot(plain), plain)
    val uri = "file:" +
      java.nio.file.Files.createTempDirectory("graft_sfs_h").toString
    testBody(StoreFs.forRoot(uri), uri)
    testBody(new ObjectStoreFs(new MemBlobStore), "mem:/sfs")
  }

  test("forRoot picks the implementation by scheme") {
    assert(StoreFs.forRoot("/tmp/x") eq LocalStoreFs)
    assert(StoreFs.forRoot("rel/path") eq LocalStoreFs)
    assert(StoreFs.forRoot("file:/tmp/x").isInstanceOf[HadoopStoreFs])
    // cached per scheme+authority — one FileSystem instance, not one per call
    assert(StoreFs.forRoot("file:/tmp/a") eq StoreFs.forRoot("file:/tmp/b"))
  }

  test("write/read/exists/list/delete round-trip identically on both impls") {
    withBoth { (fs, root) =>
      assert(!fs.exists(s"$root/sub/f.txt"))
      assert(fs.list(s"$root/sub") === Nil, "absent dir lists empty")
      fs.mkdirs(s"$root/sub")
      fs.writeString(s"$root/sub/f.txt", "hello")
      assert(fs.exists(s"$root/sub/f.txt"))
      assert(fs.readString(s"$root/sub/f.txt") === "hello")
      fs.writeString(s"$root/sub/f.txt", "rewritten") // overwrite semantics
      assert(fs.readString(s"$root/sub/f.txt") === "rewritten")
      fs.writeString(s"$root/sub/g.txt", "x")
      assert(fs.list(s"$root/sub").toSet === Set("f.txt", "g.txt"))
      fs.deleteRecursively(s"$root/sub")
      assert(!fs.exists(s"$root/sub"))
    }
  }

  test("appendLine builds a journal (Hadoop path exercises the " +
      "read+rewrite+publish fallback when append() is refused)") {
    withBoth { (fs, root) =>
      fs.mkdirs(root)
      fs.appendLine(s"$root/j.jsonl", "one")
      fs.appendLine(s"$root/j.jsonl", "two")
      fs.appendLine(s"$root/j.jsonl", "three")
      assert(fs.readString(s"$root/j.jsonl") === "one\ntwo\nthree\n")
    }
  }

  test("publish replaces an existing destination (the manifest-swap shape)") {
    withBoth { (fs, root) =>
      fs.mkdirs(root)
      fs.writeString(s"$root/m.tmp.1", """{"version": 1}""")
      fs.publish(s"$root/m.tmp.1", s"$root/m.json",
        durable = false, replace = true)
      assert(fs.readString(s"$root/m.json") === """{"version": 1}""")
      fs.writeString(s"$root/m.tmp.2", """{"version": 2}""")
      fs.publish(s"$root/m.tmp.2", s"$root/m.json",
        durable = false, replace = true)
      assert(fs.readString(s"$root/m.json") === """{"version": 2}""")
      assert(!fs.exists(s"$root/m.tmp.2"), "temp consumed by the publish")
    }
  }

  test("move relocates a directory tree; treeBytes sums regular files") {
    withBoth { (fs, root) =>
      fs.mkdirs(s"$root/a/inner")
      fs.writeString(s"$root/a/inner/x", "12345")
      fs.writeString(s"$root/a/y", "12")
      assert(fs.treeBytes(s"$root/a") === 7L)
      assert(fs.treeBytes(s"$root/nope") === 0L)
      fs.move(s"$root/a", s"$root/b")
      assert(!fs.exists(s"$root/a") &&
        fs.readString(s"$root/b/inner/x") === "12345")
    }
  }

  test("move without replace refuses an existing destination on every " +
      "impl (FileSystem.rename would silently nest src INSIDE a dest dir)") {
    withBoth { (fs, root) =>
      fs.mkdirs(s"$root/src")
      fs.writeString(s"$root/src/x", "1")
      // a leftover NON-EMPTY dir at the rename target (object stores
      // have no empty dirs — content is what makes a prefix exist)
      fs.mkdirs(s"$root/dest")
      fs.writeString(s"$root/dest/z", "stale")
      intercept[java.nio.file.FileAlreadyExistsException] {
        fs.move(s"$root/src", s"$root/dest")
      }
      assert(fs.readString(s"$root/src/x") === "1", "src untouched")
      assert(!fs.exists(s"$root/dest/src"), "no silent nesting")
      fs.deleteRecursively(s"$root/dest")
      fs.move(s"$root/src", s"$root/dest") // target gone: move succeeds
      assert(fs.readString(s"$root/dest/x") === "1")
    }
  }

  test("move with replace swaps a FILE target (the quarantine shape)") {
    withBoth { (fs, root) =>
      fs.mkdirs(root)
      fs.writeString(s"$root/a", "new")
      fs.writeString(s"$root/a.corrupt", "old")
      fs.move(s"$root/a", s"$root/a.corrupt", replace = true)
      assert(fs.readString(s"$root/a.corrupt") === "new")
      assert(!fs.exists(s"$root/a"))
    }
  }

  test("publish without replace refuses an existing destination " +
      "(put-if-absent semantics on the object store)") {
    withBoth { (fs, root) =>
      fs.mkdirs(root)
      fs.writeString(s"$root/t1", "v1")
      fs.publish(s"$root/t1", s"$root/final", durable = false)
      fs.writeString(s"$root/t2", "v2")
      intercept[Exception] { // FileAlreadyExists (local/mem) or IOException
        fs.publish(s"$root/t2", s"$root/final", durable = false)
      }
      assert(fs.readString(s"$root/final") === "v1", "winner kept")
    }
  }
}
