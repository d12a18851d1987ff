package graft

import org.apache.spark.sql.functions._
import graft.ops.CdcChunk

class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  test("chunks partition each document exactly; mean length tracks the divisor") {
    val ch = CdcChunk.chunks(spark, sf0001).cache()
    // reassembling a doc's chunks in order gives back the normalized text
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.ops.TextMetrics.normalized(col("text")).as("norm"))
    val glued = ch.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))).as("parts"))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("parts"), p => p.getField("chunk_text"))).as("glued"))
    assert(glued.join(docs, "doc_id").filter(col("glued") =!= col("norm")).count() === 0)
    // expected chunk length is the divisor (geometric boundary rule);
    // allow a wide band — the tail-chunk rule biases short
    val mean = ch.agg(avg("n_words")).head().getDouble(0)
    assert(mean > CdcChunk.divisor / 3.0 && mean < CdcChunk.divisor * 3.0,
      s"mean chunk words $mean vs divisor ${CdcChunk.divisor}")
    ch.unpersist()
  }

  test("boundaries realign after a prepended edit (the CDC property)") {
    val base = (1 to 200).map(i => s"tok${i * 7 % 97}x$i").mkString(" ")
    val docs = Seq((1L, "s", base), (2L, "s", "inserted " + base))
      .toDF("doc_id", "source", "text")
    val ch = CdcChunk.chunksOf(docs).cache()
    val a = ch.filter(col("doc_id") === 1).select("fingerprint").as[String].collect().toSet
    val b = ch.filter(col("doc_id") === 2).select("fingerprint").as[String].collect().toSet
    // after the first boundary past the edit, every later cut position is
    // decided by the same trailing windows → the chunk streams re-converge;
    // fixed-offset segmentation would share zero segments here
    val shared = (a intersect b).size
    assert(shared >= a.size / 2,
      s"only $shared of ${a.size} chunks realigned after a 1-word prepend")
    // and the two documents do differ at the head
    assert(a != b)
    ch.unpersist()
  }
}
