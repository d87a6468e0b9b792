package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the embedding-/RAG-prep step that
  * turns long documents into overlapping fixed-size token windows
  * (complement of [[SequencePack]], which packs SHORT docs together;
  * this splits LONG ones). Pure relational: tokenize once, explode the
  * arithmetic start sequence, slice — no UDF, no per-doc loop, linear
  * in tokens.
  */
object TextChunk {

  /** Chunks of `chunkTokens` whitespace tokens every `stride` tokens
    * (overlap = chunkTokens - stride). Chunk emission stops with the
    * first chunk that reaches the document end, so every token is
    * covered exactly once by the non-overlapping tail of some chunk and
    * the last chunk may be short; a doc shorter than one chunk yields
    * one (short) chunk. Deterministic integer arithmetic end to end —
    * oracle-safe by construction.
    */
  def slidingChunks(docs: DataFrame, chunkTokens: Int = 64, stride: Int = 48,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("toks"))
      .withColumn("len", size(col("toks")))
      // starts 0, S, 2S, ... < len; drop starts whose PREVIOUS chunk
      // already reached the end (s - stride + chunkTokens >= len) — the
      // predicate is monotone in s, so the kept prefix is contiguous
      .withColumn("start", explode(sequence(lit(0),
        greatest(col("len") - 1, lit(0)), lit(stride))))
      .filter(col("start") === 0 ||
        col("start") - stride + chunkTokens < col("len"))
      .withColumn("chunk", slice(col("toks"), col("start") + 1, lit(chunkTokens)))
      .select(col(idCol),
        (col("start") / stride).cast("long").as("chunk_idx"),
        array_join(col("chunk"), " ").as("chunk_text"),
        size(col("chunk")).cast("long").as("n_tokens"))
  }
}
