package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perceptual-hash (dHash) dedup over OPAQUE BINARY payloads — the dedup
  * family's image-modality face. The first operator here that derives a
  * decision from payload CONTENT, not metadata: the payload byte stream
  * is treated as a grayscale raster, box-filter-downsampled to a 9×8
  * pixel grid (the classic dHash resize), and hashed by comparing each
  * pixel to its right neighbor — 8 rows × 8 comparisons. Near-duplicate
  * images (re-encoded, brightness-shifted, lightly cropped) keep most
  * comparisons stable, so near-dups land at small hamming distance
  * exactly like SimHash text signatures do.
  *
  * The "decode" (bytes → pixel grid) is the stub slot: this container
  * has no image codecs, so pixels are integer block-averages of the raw
  * payload bytes — a real deployment swaps in libjpeg decode + true
  * resize AT THE SAME SEAM (one pure column expression per row; the
  * hash, banding, and clustering downstream are codec-agnostic). On the
  * fixture the payload is the utf-8 text bytes (the q_multimodal_binary
  * convention), which keeps the whole pipeline SQL-oracle-able: DuckDB
  * computes the identical pixels/hash from the same bytes.
  *
  * 63 bits, not 64: bit i (i = row·8 + col, i ≤ 62) is set iff
  * pixel[row·9+col] < pixel[row·9+col+1]; the last comparison (row 7,
  * col 7) is dropped so the hash stays non-negative — DuckDB's BIGINT
  * left shift is overflow-CHECKED at bit 63 (`1::BIGINT << 63` errors),
  * and one bit of a 64-bit perceptual hash is noise. Hamming semantics
  * are unchanged; SimHash's 16-bit banding still gives exact recall for
  * hamming ≤ 3 by pigeonhole (63 differing bits still span ≤ 3 bands).
  *
  * Scale design: the signature is a pure map-side expression (no
  * shuffle, whole-stage-codegen'd); clustering reuses
  * [[SimHash.clustersFromSignatures]] — banded equi-join candidates at
  * DISTINCT-signature grain, exact hamming verify, rep-grain CC
  * fixpoint, membership join-back. Identical payloads (the dominant
  * duplicate population: same image re-posted) share one signature, so
  * all pair work is per distinct image, constant in the duplication
  * factor.
  */
object PHash {

  /** Pixel-grid geometry: 9 columns × 8 rows (dHash compares across the
    * 9 columns to emit 8 bits per row). */
  val Cols = 9
  val Rows = 8
  val NPix: Int = Cols * Rows // 72

  /** Column: the payload byte-value array from a STRING payload column
    * (ascii bytes — the fixture payloads are ascii text standing in for
    * image bytes). Kept as its OWN projection by callers so the O(n)
    * split runs once per row, not once per pixel (CollapseProject does
    * not inline a non-cheap alias referenced 72 times). */
  def byteValues(textCol: String): Column =
    expr(s"transform(split($textCol, ''), c -> ascii(c))")

  /** Column: the 72-entry pixel array from a byte-value array column.
    * pixel p = integer mean of the byte segment [p·n/72, (p+1)·n/72);
    * empty segments (payload shorter than 72 bytes) read as 0. All
    * quantities are non-negative, so Spark `div` ≡ DuckDB `//` (the
    * floor-vs-truncate divergence never fires). */
  def pixels(bytesCol: String): Column = expr(
    s"""transform(sequence(0, ${NPix - 1}), p -> CASE
          WHEN ((p+1) * size($bytesCol)) div $NPix
             - (p * size($bytesCol)) div $NPix >= 1
          THEN aggregate(
                 slice($bytesCol,
                       cast((p * size($bytesCol)) div $NPix + 1 as int),
                       cast(((p+1) * size($bytesCol)) div $NPix
                            - (p * size($bytesCol)) div $NPix as int)),
                 cast(0 as bigint), (a, x) -> a + x)
               div (((p+1) * size($bytesCol)) div $NPix
                    - (p * size($bytesCol)) div $NPix)
          ELSE cast(0 as bigint) END)""".replaceAll("\\s+", " "))

  /** Column: the 63-bit dHash from a pixel-array column. */
  def dhash(px: Column): Column =
    (0 until 63).map { i =>
      val r = i / 8; val c = i % 8
      when(element_at(px, r * Cols + c + 1) <
           element_at(px, r * Cols + c + 2), lit(1L << i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** (doc_id, phash) — one pure map-side pass, no shuffle. Three
    * stacked projections (bytes → pixels → hash) so each expensive
    * array stage evaluates once per row. */
  def signatures(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), byteValues(textCol).as("pbytes"))
      .select(col("doc_id"), pixels("pbytes").as("px"))
      .select(col("doc_id"), dhash(col("px")).as("phash"))

  /** Decision frame (doc_id, phash, cluster_id, is_keeper): connected
    * components over the hamming-≤-maxHamming perceptual-hash graph,
    * keeper = min doc_id of the component — SimHash's signature-grain
    * machinery verbatim, with the dHash as the signature. */
  def clusters(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", b: Int = 4,
               maxHamming: Int = 3): DataFrame = {
    val sig = signatures(docs, idCol, textCol).localCheckpoint(true)
    SimHash.clustersFromSignatures(
        docs.select(col(idCol).as("doc_id")),
        sig.select(col("doc_id"), col("phash").as("simhash")),
        b, maxHamming)
      .join(sig, Seq("doc_id"))
      .select("doc_id", "phash", "cluster_id", "is_keeper")
  }

  /** The same pixel grid + dHash as DuckDB SQL over `$table` (oracle
    * twin of [[signatures]] — generated from the same geometry so the
    * two engines cannot drift). Yields a relation (doc_id, phash). */
  def oracleSignatureSql(table: String = "documents",
                         idCol: String = "doc_id",
                         textCol: String = "text"): String = {
    val n = s"length($textCol)"
    val px = s"""[CASE
        WHEN ((p+1) * $n) // $NPix - (p * $n) // $NPix >= 1
        THEN list_sum(([ascii(c) for c in string_split($textCol, '')])
               [(p * $n) // $NPix + 1 : ((p+1) * $n) // $NPix])
             // (((p+1) * $n) // $NPix - (p * $n) // $NPix)
        ELSE 0 END for p in range(0, $NPix)]"""
    val bits = (0 until 63).map { i =>
      val r = i / 8; val c = i % 8
      s"CASE WHEN px[${r * Cols + c + 1}] < px[${r * Cols + c + 2}] " +
        s"THEN (1::BIGINT << $i) ELSE 0::BIGINT END"
    }.mkString(" + ")
    s"""SELECT $idCol AS doc_id, $bits AS phash
        FROM (SELECT $idCol, $px AS px FROM $table) t"""
  }
}
