package graft.tools

/** Dev probe: raw throughput of the block-scorer dot kernels on one
  * core — serial left-to-right (the exact form), 2/4/8-accumulator
  * reassociated (prefilter candidates) — on block shapes matching the
  * 100× tier (448-row cells, 64 dims). Measures cycles-per-pair so a
  * kernel change's ceiling is known before it's wired into the
  * expression. Usage: runMain graft.tools.ProbeDotKernel [reps]
  */
object ProbeDotKernel {
  private def serialDot(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def dot2(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s0 = 0.0; var s1 = 0.0; var i = 0
    val n2 = n - 1
    while (i < n2) { s0 += a(i) * b(i); s1 += a(i + 1) * b(i + 1); i += 2 }
    while (i < n) { s0 += a(i) * b(i); i += 1 }
    s0 + s1
  }

  private def dot8(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var s4 = 0.0; var s5 = 0.0; var s6 = 0.0; var s7 = 0.0
    var i = 0
    val n8 = n - 7
    while (i < n8) {
      s0 += a(i) * b(i); s1 += a(i + 1) * b(i + 1)
      s2 += a(i + 2) * b(i + 2); s3 += a(i + 3) * b(i + 3)
      s4 += a(i + 4) * b(i + 4); s5 += a(i + 5) * b(i + 5)
      s6 += a(i + 6) * b(i + 6); s7 += a(i + 7) * b(i + 7)
      i += 8
    }
    while (i < n) { s0 += a(i) * b(i); i += 1 }
    ((s0 + s1) + (s2 + s3)) + ((s4 + s5) + (s6 + s7))
  }

  private def fastDot4(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    val n4 = n - 3
    while (i < n4) {
      s0 += a(i) * b(i); s1 += a(i + 1) * b(i + 1)
      s2 += a(i + 2) * b(i + 2); s3 += a(i + 3) * b(i + 3)
      i += 4
    }
    while (i < n) { s0 += a(i) * b(i); i += 1 }
    (s0 + s1) + (s2 + s3)
  }

  /** flattened variant: both blocks as contiguous row-major buffers */
  private def dot4Flat(a: Array[Double], ao: Int, b: Array[Double], bo: Int,
                       n: Int): Double = {
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    val n4 = n - 3
    while (i < n4) {
      s0 += a(ao + i) * b(bo + i); s1 += a(ao + i + 1) * b(bo + i + 1)
      s2 += a(ao + i + 2) * b(bo + i + 2); s3 += a(ao + i + 3) * b(bo + i + 3)
      i += 4
    }
    while (i < n) { s0 += a(ao + i) * b(bo + i); i += 1 }
    (s0 + s1) + (s2 + s3)
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 5
    val rows = 448; val dim = 64
    val rnd = new scala.util.Random(42)
    val blkA = Array.fill(rows)(Array.fill(dim)(rnd.nextGaussian()))
    val blkB = Array.fill(rows)(Array.fill(dim)(rnd.nextGaussian()))
    val flatA = blkA.flatten; val flatB = blkB.flatten
    var sink = 0.0
    def bench(label: String)(body: => Double): Unit = {
      (1 to 3).foreach(_ => sink += body) // warm JIT
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); sink += body
        (System.nanoTime() - t0) / 1e9
      }
      val pairs = rows.toLong * rows
      val best = times.min
      println(f"$label%-18s ${best * 1e9 / pairs}%8.2f ns/pair  " +
        f"(${pairs / best / 1e9}%6.3f Gpair/s)  sink=$sink%.1f")
    }
    bench("serial") {
      var s = 0.0; var ai = 0
      while (ai < rows) {
        var bi = 0
        while (bi < rows) { s += serialDot(blkA(ai), blkB(bi), dim); bi += 1 }
        ai += 1
      }
      s
    }
    bench("acc2") {
      var s = 0.0; var ai = 0
      while (ai < rows) {
        var bi = 0
        while (bi < rows) { s += dot2(blkA(ai), blkB(bi), dim); bi += 1 }
        ai += 1
      }
      s
    }
    bench("acc4 (fastDot)") {
      var s = 0.0; var ai = 0
      while (ai < rows) {
        var bi = 0
        while (bi < rows) {
          s += fastDot4(blkA(ai), blkB(bi), dim)
          bi += 1
        }
        ai += 1
      }
      s
    }
    bench("acc8") {
      var s = 0.0; var ai = 0
      while (ai < rows) {
        var bi = 0
        while (bi < rows) { s += dot8(blkA(ai), blkB(bi), dim); bi += 1 }
        ai += 1
      }
      s
    }
    bench("simd (SimdDot)") {
      var s = 0.0; var ai = 0
      while (ai < rows) {
        var bi = 0
        while (bi < rows) {
          s += graft.functions.SimdDot.dot(blkA(ai), blkB(bi), dim); bi += 1
        }
        ai += 1
      }
      s
    }
    bench("acc4 flat") {
      var s = 0.0; var ai = 0
      while (ai < rows) {
        var bi = 0
        val ao = ai * dim
        while (bi < rows) { s += dot4Flat(flatA, ao, flatB, bi * dim, dim); bi += 1 }
        ai += 1
      }
      s
    }
  }
}
