package graft.functions;

import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD dot product for the block scorers' PREFILTER pass
 * (BlockKnn.BlockVec.fastDot) via the JDK Vector API.
 *
 * The scalar prefilter is load-throughput-bound: 2·d scalar loads per
 * pair at 2 loads/cycle puts a hard ~d-cycle floor under any scalar
 * kernel (measured 22.6 ns/pair at d=64 — ProbeDotKernel), which SIMD
 * loads break by moving 8 lanes per instruction (AVX-512 on this class
 * of box; SPECIES_PREFERRED degrades gracefully to 4- or 2-lane).
 *
 * NOT bit-identical to the exact left-to-right dot — lane accumulation
 * reassociates and fma() fuses — so callers may use it only on the
 * sound-skip side of a margin: every accumulation order (including
 * fused) is within (n+2)·u·SUM|a_i·b_i| <= (n+2)·u·|a||b| of the true
 * product, so |simd - exact| <= 2(n+2)·u·|a||b|, far inside
 * BlockVec.SkipMargin's 1e-5 slack (the same bound the scalar fastDot
 * relies on; see BlockKnn.scala).
 *
 * Kept deliberately free of vector-typed fields/signatures: Scala code
 * sees only (double[], double[], int) -> double, and the incubator
 * module stays an implementation detail guarded by BlockVec's runtime
 * availability probe (a JVM launched without
 * --add-modules=jdk.incubator.vector falls back to the scalar kernel).
 */
public final class SimdDot {
  private SimdDot() {}

  /**
   * Screen rows [from, to) of block B against one a-row: writes the
   * index of every b-row whose SIMD dot with {@code a} clears
   * {@code cutNa * nrms[i]} into {@code hits}, returns the hit count.
   * The caller re-scores hits with the exact serial kernel (two-phase
   * discipline — see BlockKnn.scala's margin proof; this kernel's
   * reassociation error is covered by the same bound).
   *
   * 4-row register blocking: one a-vector load is shared by four b-row
   * FMAs, cutting loads per pair from 2·d to 1.25·d — the resource the
   * scalar and single-row SIMD kernels are both bound on — while four
   * independent accumulator chains hide FMA latency. Rows with a
   * dimension shorter than {@code a} (ragged corpora) fall to the
   * per-row kernel; uniform-dimension blocks (every real fixture) stay
   * on the blocked path.
   */
  public static int screen(double[] a, double[][] vbs, double[] nrms,
                           int from, int to, double cutNa, int[] hits) {
    VectorSpecies<Double> s = DoubleVector.SPECIES_PREFERRED;
    int len = s.length();
    int d = a.length;
    int upper = s.loopBound(d);
    int m = 0;
    int i = from;
    for (; i + 3 < to; i += 4) {
      double[] b0 = vbs[i], b1 = vbs[i + 1], b2 = vbs[i + 2],
          b3 = vbs[i + 3];
      if (b0.length < d || b1.length < d || b2.length < d
          || b3.length < d) {
        // ragged rows: per-row fallback keeps n = min(|a|, |b|) exact
        for (int r = i; r < i + 4; r++) {
          double sc = dot(a, vbs[r], Math.min(d, vbs[r].length));
          if (sc >= cutNa * nrms[r]) hits[m++] = r;
        }
        continue;
      }
      DoubleVector a0 = DoubleVector.zero(s), a1 = DoubleVector.zero(s),
          a2 = DoubleVector.zero(s), a3 = DoubleVector.zero(s);
      int j = 0;
      for (; j < upper; j += len) {
        DoubleVector av = DoubleVector.fromArray(s, a, j);
        a0 = DoubleVector.fromArray(s, b0, j).fma(av, a0);
        a1 = DoubleVector.fromArray(s, b1, j).fma(av, a1);
        a2 = DoubleVector.fromArray(s, b2, j).fma(av, a2);
        a3 = DoubleVector.fromArray(s, b3, j).fma(av, a3);
      }
      double d0 = a0.reduceLanes(VectorOperators.ADD);
      double d1 = a1.reduceLanes(VectorOperators.ADD);
      double d2 = a2.reduceLanes(VectorOperators.ADD);
      double d3 = a3.reduceLanes(VectorOperators.ADD);
      for (; j < d; j++) {
        double av = a[j];
        d0 += av * b0[j]; d1 += av * b1[j];
        d2 += av * b2[j]; d3 += av * b3[j];
      }
      if (d0 >= cutNa * nrms[i]) hits[m++] = i;
      if (d1 >= cutNa * nrms[i + 1]) hits[m++] = i + 1;
      if (d2 >= cutNa * nrms[i + 2]) hits[m++] = i + 2;
      if (d3 >= cutNa * nrms[i + 3]) hits[m++] = i + 3;
    }
    for (; i < to; i++) {
      double sc = dot(a, vbs[i], Math.min(d, vbs[i].length));
      if (sc >= cutNa * nrms[i]) hits[m++] = i;
    }
    return m;
  }

  public static double dot(double[] a, double[] b, int n) {
    VectorSpecies<Double> s = DoubleVector.SPECIES_PREFERRED;
    int len = s.length();
    DoubleVector acc0 = DoubleVector.zero(s);
    DoubleVector acc1 = DoubleVector.zero(s);
    int i = 0;
    int step = len * 2;
    // two independent accumulators hide FMA latency; loopBound handles
    // the single-vector tail, the scalar loop the final remainder
    int upper2 = n - (n % step);
    for (; i < upper2; i += step) {
      acc0 = DoubleVector.fromArray(s, a, i)
          .fma(DoubleVector.fromArray(s, b, i), acc0);
      acc1 = DoubleVector.fromArray(s, a, i + len)
          .fma(DoubleVector.fromArray(s, b, i + len), acc1);
    }
    int upper = s.loopBound(n);
    for (; i < upper; i += len) {
      acc0 = DoubleVector.fromArray(s, a, i)
          .fma(DoubleVector.fromArray(s, b, i), acc0);
    }
    double r = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < n; i++) r += a[i] * b[i];
    return r;
  }
}
