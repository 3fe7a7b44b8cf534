package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Context-window document chunking: split each document's token stream
  * into fixed-size chunks on a fixed stride (overlap = chunkSize −
  * stride) — the standard pre-tokenization pass that turns a corpus
  * into training sequences.
  *
  * Entirely row-local codegen'd work (tokenize once, explode the chunk
  * starts, `slice` each window — `slice`/`sequence` are builtin
  * expressions, not interpreted lambdas), so it is embarrassingly
  * parallel: no shuffle at all unless the caller adds one. A document
  * yields ceil(max(n−overlap,1)/stride) chunks; empty/whitespace docs
  * yield none.
  */
object Chunking {

  /** Output: (idCol, chunk_start, n_tokens, chunk_text) — `chunk_start`
    * is the 0-based token offset (start/stride is the chunk ordinal);
    * the final chunk may be short, and a chunk never starts at-or-past
    * the token count, so no empty chunks are emitted.
    */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    docs
      .select(col(idCol), TextFns.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(when(size(col("__toks")) > 0,
            sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))).as("chunk_start"))
      .select(col(idCol),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(chunkSize), size(col("__toks")) - col("chunk_start"))
          .cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("chunk_start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  // --------------------------------------- Content-defined chunking (CDC)

  /** Deterministic gear table: 256 md5-derived values in [0, 2^30) —
    * reproducible by any engine from its own md5 (the [[graft.operators.Sketches]]
    * hash discipline applied to the rolling-hash constants).
    */
  private[graft] lazy val gearTable: Array[Long] = (0 until 256).map { b =>
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"gear:$b".getBytes("US-ASCII")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % (1L << 30)
  }.toArray

  /** CONTENT-DEFINED CHUNKING (the Gear/FastCDC family — LBFS lineage):
    * boundaries fall where a rolling hash of the byte stream hits a
    * mask, so an insertion or deletion only re-cuts its local
    * neighborhood — the property that makes CHUNK-level storage dedup
    * robust to edits, where fixed-size blocks would misalign the whole
    * tail. This is the storage-layer dedup for the binary/multimodal
    * column family (exact-substring text dedup is q121's ExactSubstr;
    * CDC dedups the BYTES).
    *
    * Rolling hash: h_i = (2·h_{i−1} + gear[b_i]) mod 2^30; cut after
    * byte i when h_i < 2^(30−maskBits) — the HIGH bits decide, as in
    * FastCDC: the low bits of a gear hash depend on only the last few
    * bytes (h mod 2^m is a function of the trailing m-gram), so a
    * low-bit mask degenerates on periodic text — measured: ZERO cuts
    * over an 880-byte repeated sentence. Expected chunk ≈ 2^maskBits
    * bytes. Because 2^k ≡ 0 (mod 2^30) for k ≥ 30, h_i depends on only
    * the last 30 bytes — the self-windowing that lets a SQL oracle
    * replay the recurrence as a 30-term windowed sum with NO sequential
    * scan. All arithmetic stays < 2^60: no Int64 overflow anywhere.
    *
    * Executor-side imperative loop via mapPartitions — the established
    * opaque-byte-boundary pattern (see [[graft.multimodal.Multimodal]]);
    * everything else (chunk hashing, dedup ratios) composes
    * declaratively downstream. Row-local per document: embarrassingly
    * parallel, no shuffle.
    *
    * Contract: operates on the UTF-8 bytes of `textCol`; `start`/`len`
    * are BYTE offsets (== character offsets for ASCII payloads, which
    * is what the oracle's substr replay assumes).
    * Output: (id, chunk_idx, start, len, chunk).
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                maskBits: Int): DataFrame = {
    require(maskBits >= 2 && maskBits <= 20,
      s"maskBits must be in [2,20], got $maskBits")
    val threshold = 1L << (30 - maskBits)
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    ds.mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        val bytes = Option(text).getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (bytes.isEmpty) Iterator.empty
        else {
          val cuts = scala.collection.mutable.ArrayBuffer[Int]()
          var h = 0L
          var i = 0
          while (i < bytes.length) {
            h = (h * 2 + gearTable(bytes(i) & 0xff)) % (1L << 30)
            if (h < threshold) cuts += (i + 1)
            i += 1
          }
          if (cuts.isEmpty || cuts.last != bytes.length) cuts += bytes.length
          var s = 0
          var ci = 0L
          cuts.iterator.map { e =>
            val r = (id, ci, s.toLong, (e - s).toLong,
              new String(bytes, s, e - s, java.nio.charset.StandardCharsets.UTF_8))
            s = e; ci += 1; r
          }
        }
      }
    }.toDF(idCol, "chunk_idx", "start", "len", "chunk")
  }

  /** [[cdcChunks]] as a FULLY DECLARATIVE pipeline: the boundary scan is
    * the codegen'd [[graft.expr.GearCuts]] expression (one native loop
    * inside whole-stage codegen), starts derive row-locally from the
    * cut array (no window, no shuffle), and chunks slice with
    * `substring` — so the whole operator never crosses the typed
    * mapPartitions boundary (no per-row deserialize/re-serialize).
    *
    * Identical output to [[cdcChunks]] for ASCII payloads (`CdcSpec`
    * proves equality on the corpus). For non-ASCII UTF-8 the codegen
    * slice would misalign (`substring` counts characters, the cut
    * positions are bytes) — so rows where `length != octet_length` are
    * ROUTED to the byte-correct [[cdcChunks]] branch at runtime and
    * unioned back: callers get the byte-offset contract on any input,
    * and the mapPartitions branch processes only the multibyte slice
    * of the corpus (zero rows on an ASCII corpus). Both branches are
    * shuffle-free row-local maps, so the union costs one extra pushed
    * filter scan, not a shuffle.
    */
  def cdcChunksCodegen(docs: DataFrame, idCol: String, textCol: String,
                       maskBits: Int): DataFrame = {
    require(maskBits >= 2 && maskBits <= 20,
      s"maskBits must be in [2,20], got $maskBits")
    val multibyte = coalesce(
      length(col(textCol)) =!= octet_length(col(textCol)), lit(false))
    val pairs = transform(col("__cuts"), (e, i) => struct(
      i.cast("long").as("chunk_idx"),
      when(i === 0, lit(0L)).otherwise(element_at(col("__cuts"), i)).as("start"),
      e.as("e")))
    val ascii = docs.filter(!multibyte)
      .select(col(idCol).cast("long").as(idCol), col(textCol).as("__t"))
      .withColumn("__cuts", graft.expr.GearCuts.gearCuts(col("__t"), maskBits))
      .select(col(idCol), col("__t"), explode(pairs).as("p"))
      .select(col(idCol), col("p.chunk_idx").as("chunk_idx"),
        col("p.start").as("start"), (col("p.e") - col("p.start")).as("len"),
        expr("substring(__t, p.start + 1, p.e - p.start)").as("chunk"))
    ascii.unionByName(cdcChunks(docs.filter(multibyte), idCol, textCol, maskBits))
  }
}
