package graft

import graft.queries.Scans

/** The artifact-keying contract of Scans.scratch — the fix for the r16
  * stale-artifact trap: the leaf used to key on `sfDir.hashCode ^
  * session.hashCode` alone, and because the session identity hash
  * repeats across identical JVM launch sequences, a format change left
  * three bench sessions silently serving a PRE-change index (PLANS_r16
  * "scratch-dir trap"). The leaf now carries a fingerprint of the
  * compiled classes, so any recompile moves every artifact path and
  * exists() honestly reads false; these laws pin both directions. */
class ScratchSpec extends SparkSpec {

  test("fingerprint is computed, stable within a session, and hex-shaped") {
    val fp = Scans.codeFingerprint
    assert(fp.nonEmpty && fp.matches("[0-9a-f]{8}"),
      s"fingerprint '$fp' should be 8 hex chars of class-file metadata")
    assert(fp == Scans.codeFingerprint, "lazy val must be stable")
  }

  test("same fingerprint + same (session, sfDir) reuses the same path") {
    val a = Scans.scratch("spec", spark, sf0001)
    val b = Scans.scratch("spec", spark, sf0001)
    assert(a == b, "same-code same-session reuse must keep the path")
    assert(a.contains(Scans.codeFingerprint),
      "the live fingerprint must be part of the leaf")
  }

  test("a fingerprint bump invalidates reuse: the path moves") {
    val v1 = Scans.scratchAt("spec", "aaaaaaaa", spark, sf0001)
    val v2 = Scans.scratchAt("spec", "bbbbbbbb", spark, sf0001)
    assert(v1 != v2,
      "a format/code change must move the artifact path so exists() " +
        "reads false and the artifact rebuilds")
    // …and only the fingerprint segment moved — kind/session/sf keying
    // is otherwise unchanged (concurrent-SF isolation preserved)
    assert(v1.replace("aaaaaaaa", "bbbbbbbb") == v2)
  }

  test("different kinds and different sf dirs never share a path") {
    assert(Scans.scratch("specA", spark, sf0001) !=
      Scans.scratch("specB", spark, sf0001))
    assert(Scans.scratch("spec", spark, sf0001) !=
      Scans.scratch("spec", spark, "/root/testdata/sf0.01"))
  }

  test("first scratch() per kind reaps stale-fingerprint siblings only") {
    // The fingerprint scheme's cost: each recompile moves every leaf,
    // stranding the previous build's artifacts in the scratch root
    // forever. The janitor fires once per (kind, JVM) and deletes
    // sibling graft_<kind>_<fp>_* leaves whose fp differs from the
    // running code's — and must NOT touch same-fp leaves (a concurrent
    // session of the same build) or other kinds' leaves.
    val root = new java.io.File(Scans.scratchRoot)
    def mk(name: String): java.io.File = {
      val d = new java.io.File(root, name)
      assert(d.mkdirs() || d.isDirectory)
      d
    }
    val fp = Scans.codeFingerprint
    val stale    = mk(s"graft_specjan_deadbeef_cafe")   // old build: reap
    val current  = mk(s"graft_specjan_${fp}_cafe")      // same build: keep
    val otherKin = mk(s"graft_specjanx_deadbeef_cafe")  // other kind: keep
    try {
      Scans.scratch("specjan", spark, sf0001) // triggers the sweep
      assert(!stale.exists(), "stale-fingerprint leaf must be reaped")
      assert(current.exists(),
        "same-fingerprint sibling (concurrent same-build session) " +
          "must survive")
      assert(otherKin.exists(), "other kinds' leaves are not this " +
        "kind's sweep's business")
    } finally {
      Seq(stale, current, otherKin).foreach { d =>
        if (d.exists()) d.delete()
      }
    }
  }
}
