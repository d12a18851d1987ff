package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{AtomicPublish, CowTable}

/** DELTA-BASED row-level SQL over a [[graft.io.CowTable]] — the
  * merge-on-read half of the SQL DML surface. Spark's row-level
  * framework rewrites `MERGE INTO` / `UPDATE` / non-metadata `DELETE`
  * against a [[SupportsDelta]] operation into a stream of per-row
  * actions identified by `rowId`; here the row id is the table's
  * CLUSTERING KEY, so:
  *
  *   - a DELETE action is a doomed key → committed as deletion-vector
  *     entries (O(deleted rows) bytes, ZERO data files rewritten);
  *   - an INSERT action is a new row → staged once, committed as new
  *     pool files (nothing read);
  *   - an UPDATE is represented as DELETE + INSERT
  *     (`representUpdateAsDeleteAndInsert`), which is exactly the
  *     copy-row-forward semantics the API [[graft.io.CowTable.merge]]
  *     has.
  *
  * Executors stage actions as plain parquet under `base/.delta-<query>`
  * (task-attempt-unique file names, only COMMITTED tasks' files are
  * read — a retried task's partial file is never picked up); the driver
  * commit turns them into one [[graft.io.CowTable.applyDelta]] version,
  * whose CAS loop REDISCOVERS key positions against the current
  * manifest on conflict — positions never carry across a competing
  * commit. Key-identity caveat: like the API merge, the key is the row
  * identity; a MERGE whose ON clause is not key equality still deletes
  * by key.
  *
  * Scale note (read side): row-level `UPDATE`/`DELETE` predicates push
  * into this scan at planning, so their target read is footer-pruned to
  * the files that may match. `MERGE INTO`'s matching depends on the
  * SOURCE, and Spark 4.1 runtime-prunes files only for GROUP-BASED
  * operations (`RowLevelOperationRuntimeGroupFiltering` matches
  * `ReplaceData`, not `WriteDelta`) — so the SQL MERGE's target read is
  * O(table) while its WRITE stays O(delta). A key-range-local merge at
  * 100 TB should use [[graft.io.CowTable.merge]], whose interval-bucket
  * discovery reads only intersecting files; the SQL surface trades that
  * read locality for ANSI MERGE compatibility.
  */
private[sources] class CowRowLevelOperation(base: String, key: String,
                                            tableSchema: StructType,
                                            cmd: RowLevelOperation.Command)
  extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  /** The snapshot the rewrite plans against: the same DV-aware,
    * footer-pruned manifest scan every other read path uses. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    val v = AtomicPublish.committed(spark, base)
    require(v >= 0, s"no committed version under $base")
    new ArtifactScanBuilder(base, "manifest", None, cow = true,
      s"$base/v$v/manifest", tableSchema)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new CowDeltaWrite(base, key, info)
    }

  override def rowId(): Array[NamedReference] = Array(Expressions.column(key))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def description(): String = s"cow-delta $cmd on $base (rowId=$key)"
}

private[sources] class CowDeltaWrite(base: String, key: String,
                                     info: LogicalWriteInfo) extends DeltaWrite {
  override def toBatch: DeltaBatchWrite = new CowDeltaBatchWrite(base, key, info)
  override def description(): String = s"cow-delta write to $base"
}

/** Per-task staged files, listed EXPLICITLY (never by directory scan):
  * a failed/retried task attempt's partial files are simply never
  * referenced. */
private[sources] case class CowDeltaMessage(insertFiles: Seq[String],
                                            deleteFiles: Seq[String])
  extends WriterCommitMessage

private[sources] class CowDeltaBatchWrite(base: String, key: String,
                                          info: LogicalWriteInfo)
  extends DeltaBatchWrite {

  private val staging = s"$base/.delta-${info.queryId()}"
  private val dataSchema = info.schema()
  private val rowIdSchema: StructType =
    if (info.rowIdSchema().isPresent) info.rowIdSchema().get()
    else new StructType().add(key, LongType)

  override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DeltaWriterFactory =
    new CowDeltaWriterFactory(staging, dataSchema.json, rowIdSchema.json,
      new SerializableHadoopConf(
        SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val msgs = messages.collect { case m: CowDeltaMessage => m }
    val ins = msgs.flatMap(_.insertFiles).toSeq
    val dels = msgs.flatMap(_.deleteFiles).toSeq
    try {
      if (ins.nonEmpty || dels.nonEmpty) {
        val inserts =
          if (ins.isEmpty) None
          else Some(spark.read.schema(dataSchema).parquet(ins: _*))
        val deleteKeys =
          if (dels.isEmpty)
            spark.range(0).select(col("id").as(key))
          else spark.read.schema(
            StructType(rowIdSchema.fields.map(_.copy(nullable = true))))
            .parquet(dels: _*)
        CowTable.applyDelta(spark, base, deleteKeys, inserts)
      }
    } finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit = {
    val spark = SparkSession.active
    val p = new Path(staging)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }
}

private[sources] class CowDeltaWriterFactory(staging: String,
                                             dataSchemaJson: String,
                                             rowIdSchemaJson: String,
                                             conf: SerializableHadoopConf)
  extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new CowDeltaTaskWriter(staging,
      DataType.fromJson(dataSchemaJson).asInstanceOf[StructType],
      DataType.fromJson(rowIdSchemaJson).asInstanceOf[StructType],
      conf, partitionId, taskId)
}

/** Executor-side action writer: inserts and deleted row ids stream into
  * task-attempt-unique parquet files via parquet-mr (no Spark write job
  * inside a write job), opened lazily so a task with no actions stages
  * nothing. */
private[sources] class CowDeltaTaskWriter(staging: String,
                                          dataSchema: StructType,
                                          rowIdSchema: StructType,
                                          conf: SerializableHadoopConf,
                                          partitionId: Int, taskId: Long)
  extends DeltaWriter[InternalRow] {

  import CowDeltaTaskWriter._

  private val insertPath = s"$staging/inserts/part-$partitionId-$taskId.parquet"
  private val deletePath = s"$staging/deletes/part-$partitionId-$taskId.parquet"
  private val insertType = toMessageType("inserts", dataSchema)
  private val deleteType = toMessageType("deletes", rowIdSchema)
  private var insertWriter: ParquetWriter[Group] = _
  private var deleteWriter: ParquetWriter[Group] = _
  private val insertFactory = new SimpleGroupFactory(insertType)
  private val deleteFactory = new SimpleGroupFactory(deleteType)

  private def open(path: String, tpe: MessageType): ParquetWriter[Group] =
    ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new Path(path), conf.value))
      .withType(tpe).withConf(conf.value).build()

  override def insert(row: InternalRow): Unit = {
    if (insertWriter == null) insertWriter = open(insertPath, insertType)
    insertWriter.write(toGroup(insertFactory.newGroup(), row, dataSchema))
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    if (deleteWriter == null) deleteWriter = open(deletePath, deleteType)
    deleteWriter.write(toGroup(deleteFactory.newGroup(), id, rowIdSchema))
  }

  /** Unreachable with `representUpdateAsDeleteAndInsert = true`; kept
    * semantically correct anyway. */
  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(meta, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    val ins = if (insertWriter != null) { insertWriter.close(); Seq(insertPath) }
              else Seq.empty
    val del = if (deleteWriter != null) { deleteWriter.close(); Seq(deletePath) }
              else Seq.empty
    CowDeltaMessage(ins, del)
  }

  override def abort(): Unit = close()

  override def close(): Unit = {
    if (insertWriter != null) insertWriter.close()
    if (deleteWriter != null) deleteWriter.close()
  }
}

private[sources] object CowDeltaTaskWriter {

  /** Catalyst → parquet-mr schema for the staged action files. Scalar
    * columns only — the cow-table DML surface is relational rows; a
    * nested/array column fails loudly here rather than staging
    * something the commit can't read back. */
  def toMessageType(name: String, schema: StructType): MessageType = {
    val fields = schema.fields.map { f =>
      val b = f.dataType match {
        case LongType => Types.optional(INT64)
        case IntegerType => Types.optional(INT32)
        case DoubleType => Types.optional(DOUBLE)
        case FloatType => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType =>
          Types.optional(BINARY).as(LogicalTypeAnnotation.stringType())
        case DateType =>
          Types.optional(INT32).as(LogicalTypeAnnotation.dateType())
        case TimestampType => Types.optional(INT64).as(
          LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case TimestampNTZType => Types.optional(INT64).as(
          LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case other => throw new UnsupportedOperationException(
          s"cow-delta staging: unsupported column type ${other.sql} " +
            s"for field ${f.name}")
      }
      b.named(f.name)
    }
    new MessageType(name, fields: _*)
  }

  def toGroup(g: Group, row: InternalRow, schema: StructType): Group = {
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val f = schema.fields(i)
        f.dataType match {
          case LongType => g.add(f.name, row.getLong(i))
          case IntegerType => g.add(f.name, row.getInt(i))
          case DoubleType => g.add(f.name, row.getDouble(i))
          case FloatType => g.add(f.name, row.getFloat(i))
          case BooleanType => g.add(f.name, row.getBoolean(i))
          case StringType => g.add(f.name, row.getUTF8String(i).toString)
          case DateType => g.add(f.name, row.getInt(i)) // days since epoch
          case TimestampType | TimestampNTZType =>
            g.add(f.name, row.getLong(i)) // micros since epoch
          case other => throw new UnsupportedOperationException(
            s"cow-delta staging: unsupported column type ${other.sql}")
        }
      }
      i += 1
    }
    g
  }
}
