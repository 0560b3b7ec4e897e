package graft.functions;

import org.apache.spark.unsafe.types.UTF8String;

/**
 * Tight-loop dHash kernel — the codegen replacement for the stacked
 * higher-order-function projection in operators/PHash.scala
 * (split+ascii per character, then 72 aggregate(slice(...)) pixel
 * means, then 63 CASE WHEN bit terms). That expression chain
 * materializes an n-element string array and walks it ~twice per row —
 * tens of microseconds per document — where this kernel is one pass
 * over the raw bytes. Semantics are replicated EXACTLY (the SQL oracle
 * twins in PHash.oracleSignatureSql recompute the same grid), and the
 * family's specs pin engine == oracle:
 *
 *  - pixel p = integer mean of value segment [p*n/72, (p+1)*n/72)
 *    (floor division; empty segment reads 0) — matching
 *    aggregate(slice(...)) div len,
 *  - bit i (i <= 62) set iff px[r*9+c] < px[r*9+c+1] with r=i/8, c=i%8.
 *
 * String payloads hash their ascii CODEPOINTS (the split('')+ascii
 * semantics and the DuckDB oracle's string_split+ascii): the all-ascii
 * fast path reads bytes directly (codepoint == byte there); any
 * non-ascii byte falls to an exact codepoint decode. Binary frames
 * hash raw UNSIGNED bytes (byte-faithful for a real decoder's output —
 * the PHashSpec non-ascii law).
 */
public final class PHashKernel {
  private PHashKernel() {}

  private static final int COLS = 9;
  private static final int N_PIX = 72;

  /** dHash of a string payload: ascii-codepoint values, exact
   * split('')+ascii replication (codepoint decode off the ascii fast
   * path). */
  public static long dhashString(UTF8String s) {
    byte[] b = s.getBytes();
    boolean ascii = true;
    for (int i = 0; i < b.length; i++) {
      if (b[i] < 0) { ascii = false; break; }
    }
    if (ascii) return dhashBytes(b);
    // slow path (contractually absent from the fixtures): per-character
    // codepoint values, exactly what split('') + ascii(c) yields
    int[] cps = s.toString().codePoints().toArray();
    long[] px = new long[N_PIX];
    long n = cps.length;
    for (int p = 0; p < N_PIX; p++) {
      long lo = p * n / N_PIX;
      long hi = (p + 1) * n / N_PIX;
      if (hi - lo >= 1) {
        long sum = 0;
        for (long j = lo; j < hi; j++) sum += cps[(int) j];
        px[p] = sum / (hi - lo);
      }
    }
    return bits(px);
  }

  /** dHash of a binary payload: raw unsigned byte values. */
  public static long dhashBytes(byte[] b) {
    long[] px = new long[N_PIX];
    long n = b.length;
    for (int p = 0; p < N_PIX; p++) {
      long lo = p * n / N_PIX;
      long hi = (p + 1) * n / N_PIX;
      if (hi - lo >= 1) {
        long sum = 0;
        for (long j = lo; j < hi; j++) sum += (b[(int) j] & 0xFFL);
        px[p] = sum / (hi - lo);
      }
    }
    return bits(px);
  }

  private static long bits(long[] px) {
    long h = 0L;
    for (int i = 0; i < 63; i++) {
      int r = i / 8, c = i % 8;
      if (px[r * COLS + c] < px[r * COLS + c + 1]) h |= 1L << i;
    }
    return h;
  }
}
