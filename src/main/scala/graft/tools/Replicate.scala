package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side scale-experiment fixture: replicate the sf tables N×
  * with FK-consistent id offsets so the same Bench queries run on 10×
  * the rows (the protocol behind SCALE.md's measured-scaling tables).
  *
  *  - `documents`: doc_id offset per copy; copies get a distinct prefix
  *    word, so each doc gains N−1 genuine NEAR-duplicates (exercises
  *    dedup growth) while exact fingerprints stay distinct.
  *  - `embeddings`: vec_id offset per copy; the first component is
  *    perturbed by a small copy-dependent epsilon — labels and cluster
  *    structure survive, exact-tie degeneracy (cosine ≡ 1 pairs) does
  *    not.
  *  - `events`: event_id/user_id offset per copy (10× distinct users,
  *    same time range — densifies, as a bigger deployment would).
  *
  * Usage: runMain graft.tools.Replicate <srcSfDir> <dstDir> [copies]
  */
object Replicate {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dst).mkdirs()

    val docs = graft.Tables.documents(spark, src)
    val docMax = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until copies).map { c =>
      docs.select(
        (col("doc_id") + lit(c * docMax)).as("doc_id"),
        (if (c == 0) col("text")
         else concat(lit(s"copy$c "), col("text"))).as("text"),
        col("lang"), col("source"),
        // keep n_chars == length(text) on prefixed copies so char-count
        // reconciliation ops stay truthful on scale-experiment data
        (col("n_chars") + lit(if (c == 0) 0 else s"copy$c ".length))
          .as("n_chars"))
    }.reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/documents.parquet")

    val emb = graft.Tables.embeddings(spark, src)
    val vecMax = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until copies).map { c =>
      emb.select(
        (col("vec_id") + lit(c * vecMax)).as("vec_id"),
        concat(array((element_at(col("embedding"), 1) + lit(c * 1e-3f))
            .cast("float")),
          slice(col("embedding"), 2, graft.ops.Similarity.dim - 1))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/embeddings.parquet")

    val ev = graft.Tables.events(spark, src)
    val evMax = ev.agg(max("event_id")).head().getLong(0) + 1
    val userMax = ev.agg(max("user_id")).head().getLong(0) + 1
    (0 until copies).map { c =>
      ev.select(
        (col("event_id") + lit(c * evMax)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(c * userMax)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")

    // orders/lineitem replicate with a shared order-key offset so the
    // FK survives — the OLAP fact-join experiments need a real 10× fact
    // side; dimensions stay fixed (as they would at production scale)
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val oMax = ord.agg(max("o_orderkey")).head().getLong(0) + 1
    (0 until copies).map { c =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(c * oMax))
    }.reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/orders.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until copies).map { c =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(c * oMax))
    }.reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/lineitem.parquet")

    // dimension tables pass through unchanged
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      }
    println(s"[replicate] wrote ${copies}x $src -> $dst")
    spark.stop()
  }
}
