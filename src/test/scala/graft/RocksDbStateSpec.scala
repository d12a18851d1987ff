package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** The built-in stateful streaming operators proven result-identical
  * under `RocksDBStateStoreProvider` with changelog checkpointing. The
  * default heap-backed state store keeps every live key on executor
  * heap — session windows, stream–stream join buffers and dedup keys
  * OOM long before 100 TB of keys — while RocksDB spills keyed state to
  * local disk and is a pure configuration change. A config change is
  * only free if the results are bit-identical, which is exactly what
  * these cases pin: the same three stateful shapes the registered
  * checks drive (session_window, watermarked stream–stream join,
  * dropDuplicatesWithinWatermark), each run once per provider and
  * compared row-for-row.
  */
class RocksDbStateSpec extends SparkSpec {

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val ckl = "spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    spark.conf.set(ckl, "true")
    try body
    finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      spark.conf.unset(ckl)
    }
  }

  private var n = 0
  private def run(df: DataFrame): Seq[String] = {
    n += 1
    val tbl = s"rocksdb_spec_$n"
    val q = df.writeStream.format("memory").queryName(tbl)
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    spark.table(tbl).collect().map(_.toString).sorted.toSeq
  }

  test("session windows are identical under the RocksDB state store") {
    def counts = EventStream.sessionWindowCounts(spark, sf0001,
      glob = Some("events.parquet"))
    val heap = run(counts)
    val rocks = withRocksDb(run(counts))
    assert(rocks.nonEmpty, "the RocksDB run must emit sessions")
    assert(rocks === heap)
  }

  test("stream-stream join pairs are identical under RocksDB") {
    def pairs = EventStream.clickPurchaseJoin(spark, sf0001,
      glob = Some("events.parquet"))
    val heap = run(pairs)
    val rocks = withRocksDb(run(pairs))
    assert(rocks.nonEmpty, "the RocksDB run must emit join pairs")
    assert(rocks === heap)
  }

  test("watermarked dedup survivors are identical under RocksDB") {
    def deduped = EventStream.eventsStream(spark, sf0001,
      glob = Some("events.parquet"))
      .withColumn("_copy", explode(array(lit(1), lit(2))))
      .drop("_copy")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "event_type")
    val heap = run(deduped)
    val rocks = withRocksDb(run(deduped))
    assert(rocks.nonEmpty, "the RocksDB run must emit survivors")
    assert(rocks === heap)
  }
}
