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
}
