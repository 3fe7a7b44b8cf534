package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Training-sequence preparation: vocabulary construction, document →
  * token-id encoding, and packing the corpus token stream into
  * fixed-length training sequences (the tokenize → concatenate → cut
  * pipeline of LLM pretraining, minus the learned BPE merges — the
  * Spark-side dataflow is identical for any tokenizer).
  */
object Tokenize {

  /** Frequency-ranked vocabulary over a (term) row frame: id 0 is the
    * most frequent term, ties broken lexicographically — a total order,
    * so ids are deterministic in any engine. `maxSize` caps the
    * vocabulary; everything else later encodes as OOV.
    *
    * The global rank window runs on the POST-AGGREGATE frame (one row
    * per distinct term), and is additionally CUT to the terms that can
    * still reach a rank below `maxSize` before it sorts: a raw web
    * crawl's distinct-term tail (typos, junk, URLs) is orders of
    * magnitude larger than any vocab cap, so sorting it globally would
    * be the classic single-partition window trap. A count-histogram
    * pass (tiny — one row per distinct count value) finds the smallest
    * count `thr` whose strictly-greater counts still number < maxSize;
    * any term below `thr` provably ranks >= maxSize and is dropped
    * before the sort. The sorted frame is maxSize + |ties at thr| rows
    * — vocabulary-sized — and the kept ids are bit-identical to the
    * unfiltered global ranking.
    */
  def vocabBuild(toks: DataFrame, termCol: String, maxSize: Int): DataFrame = {
    require(maxSize >= 1, s"maxSize must be >= 1, got $maxSize")
    val counts = toks.groupBy(col(termCol).as("term")).agg(count(lit(1)).as("cnt"))
    val wAbove = Window.orderBy(col("cnt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val thr = counts.groupBy("cnt").agg(count(lit(1)).as("n"))
      .withColumn("above", coalesce(sum(col("n")).over(wAbove), lit(0L)))
      .filter(col("above") < maxSize)
      .agg(min(col("cnt")).as("thr"))
    val w = Window.orderBy(col("cnt").desc, col("term"))
    counts.join(broadcast(thr), col("cnt") >= col("thr")).drop("thr")
      .withColumn("id", (row_number().over(w) - 1).cast("long"))
      .filter(col("id") < maxSize)
  }

  /** Encode each document as its vocabulary-id array in token order
    * (OOV → −1). The vocab broadcasts (it is maxSize-bounded); the
    * explode + join is linear in corpus tokens; the id array reassembles
    * with the same sorted-struct pack as [[KeyedTable.loadChildren]].
    * Documents with zero tokens are absent from the output.
    */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 vocab: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol).as("did"),
      posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "term")))
    toks.join(broadcast(vocab.select(col("term"), col("id"))), Seq("term"), "left")
      .na.fill(-1L, Seq("id"))
      .groupBy(col("did").as(idCol))
      // the final transform runs once per OUTPUT row over an
      // already-assembled array — assembly cost, not scan-path cost
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("id")))),
        x => x.getField("id")).as("ids"))
      .select(col(idCol), size(col("ids")).cast("long").as("n_tokens"), col("ids"))
  }

  /** Pack the corpus token stream into fixed-`ctx`-token training
    * sequences: documents concatenate in `idCol` order and the stream is
    * cut every `ctx` tokens. Returns the shard manifest — one row per
    * sequence: (seq_id, n_tokens, n_docs, first_doc, last_doc); every
    * sequence holds exactly `ctx` tokens except the tail.
    *
    * PRECONDITION: `idCol` values must be unique — the id order IS the
    * concatenation order, so duplicate ids would leave the stream
    * position of the duplicates undefined. (The running-sum window below
    * is ROWS-framed so it is well-defined row-wise regardless, but the
    * OUTPUT would not be deterministic under duplicate ids.)
    *
    * The global token offset of each document is a DISTRIBUTED two-phase
    * prefix sum — NOT a single-partition global window: range-partition
    * by doc id, per-partition running sums (each partition sorts only
    * its slice, in parallel), then the per-partition totals (P rows)
    * cumulate on a tiny frame and broadcast back. Partition boundaries
    * do not affect the result, so the output is partitioning-invariant.
    * Per-doc bin overlap is a ≤(len/ctx + 1)-row explode, and the final
    * aggregate combines map-side on seq_id.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String, ctx: Int): DataFrame = {
    require(ctx >= 1, s"context length must be >= 1, got $ctx")
    val spark = docs.sparkSession
    val p = Dedup.fanout(spark)
    val lens = docs.select(col(idCol).as("did"),
        size(TextFns.tokens(col(textCol))).cast("long").as("n"))
      .filter(col("n") > 0)
    // phase 1: per-partition running sums over range-partitioned slices
    // (ROWS frame, not the default RANGE frame: RANGE would merge
    // order-key ties into one cumulative value)
    val wPart = Window.partitionBy("pid").orderBy("did")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = lens.repartitionByRange(p, col("did"))
      .withColumn("pid", spark_partition_id())
      .withColumn("run", sum(col("n")).over(wPart) - col("n"))
    // phase 2: cumulate the P partition totals and broadcast back
    val wOff = Window.orderBy("pid")
    val offsets = local.groupBy("pid").agg(sum(col("n")).as("tot"))
      .withColumn("off", coalesce(sum(col("tot")).over(wOff) - col("tot"), lit(0L)))
      .select("pid", "off")
    val spans = local.join(broadcast(offsets), Seq("pid"))
      .select(col("did"), col("n"), (col("off") + col("run")).as("start"))
    // a doc overlaps bins start/ctx .. (start+n-1)/ctx
    val bins = spans.select(col("did"), col("n"), col("start"),
      explode(sequence(expr(s"start div $ctx"), expr(s"(start + n - 1) div $ctx"))).as("seq_id"))
    bins.groupBy("seq_id")
      .agg(sum(least(col("start") + col("n"), (col("seq_id") + 1) * ctx)
          - greatest(col("start"), col("seq_id") * ctx)).as("n_tokens"),
        count(lit(1)).as("n_docs"),
        min(col("did")).as("first_doc"), max(col("did")).as("last_doc"))
  }

  /** Inverted-index build: term → document frequency + the postings
    * array of (did, pos) in (doc, position) order — the keyword-search
    * index over a corpus. Terms above `dfCap` are dropped (stopword
    * posting lists are the skew hazard of index builds: one term's list
    * is one aggregation group, so an uncapped stopword concentrates the
    * corpus on one task; cap it — or shard hot terms by `did` range —
    * before building at scale).
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    dfCap: Long): DataFrame = {
    require(dfCap >= 1, s"dfCap must be >= 1, got $dfCap")
    val toks = docs.select(col(idCol).as("did"),
      posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "term")))
    val dfc = toks.groupBy("term").agg(countDistinct(col("did")).as("df"))
      .filter(col("df") <= dfCap)
    toks.join(dfc, Seq("term"))
      .groupBy("term")
      .agg(first(col("df")).as("df"), count(lit(1)).cast("long").as("n_postings"),
        sort_array(collect_list(struct(col("did"),
          col("pos").cast("long").as("pos")))).as("postings"))
  }
}
