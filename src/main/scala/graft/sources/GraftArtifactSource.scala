package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.example.data.Group
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 `TableProvider` serving the engine's COMMITTED artifacts
  * (any [[graft.io.AtomicPublish]] base — the persisted ANN index, the
  * incremental MV, the IVF append state) as first-class tables:
  *
  * {{{
  *   spark.read.format("graft-artifact")
  *     .option("base", "/.../annindex").option("dataset", "assignments")
  *     .load()
  *   // or SQL:  CREATE TABLE ann_lists USING `graft-artifact`
  *   //          OPTIONS (base '...', dataset 'assignments')
  * }}}
  *
  * Version resolution goes through the commit pointer (optionally pinned
  * with `version` for time travel), so a read is always a consistent
  * committed snapshot. The scan supports COLUMN PRUNING and FILTER
  * PUSHDOWN: comparison/IN filters on primitive columns prune whole
  * files via footer min/max statistics on the driver, then ride into
  * parquet-mr as row-group + record predicates on the executors — for
  * the range-laid-out inverted lists (`assignments` sorted by
  * `centroid_id`), a probe-set IN filter reads only the files holding
  * the probed lists, which at 100 TB is the difference between a
  * point lookup and a full index scan. Filters are also RE-APPLIED by
  * Spark above the scan (pushdown here is pruning, not truth), so a
  * stats edge case can never change results.
  */
class GraftArtifactSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-artifact"

  private def cow(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("cow")).exists(_.toBoolean)

  private def resolveDir(options: CaseInsensitiveStringMap): String = {
    val base = options.get("base")
    val ds = if (cow(options)) "manifest" else options.get("dataset")
    require(base != null && ds != null,
      "graft-artifact requires `base` and `dataset` options (or cow=true)")
    val spark = SparkSession.active
    val v = Option(options.get("version")).map(_.toLong)
      .getOrElse(graft.io.AtomicPublish.committed(spark, base))
    require(v >= 0, s"no committed version under $base")
    s"$base/v$v/$ds"
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    if (cow(options)) {
      // a COW table's version payload is its manifest; the DATA schema
      // comes from the pool files it references
      val files = spark.read.parquet(resolveDir(options))
        .select("file").collect().map(_.getString(0))
      require(files.nonEmpty, "empty cow table")
      spark.read.parquet(files.head).schema
    } else spark.read.parquet(resolveDir(options)).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ArtifactTable(opts.get("base"), opts.get("dataset"),
      Option(opts.get("startVersion")).map(_.toLong),
      cow(opts), resolveDir(opts), schema)
  }
}

private[sources] class ArtifactTable(base: String, dataset: String,
                                     startVersion: Option[Long],
                                     cow: Boolean,
                                     dir: String, tableSchema: StructType)
  extends Table with SupportsRead {
  override def name(): String = s"graft-artifact `$dir`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArtifactScanBuilder(base, dataset, startVersion, cow, dir, tableSchema)
}

private[sources] class ArtifactScanBuilder(base: String, dataset: String,
                                           startVersion: Option[Long],
                                           cow: Boolean,
                                           dir: String, full: StructType)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  private def primitive(name: String): Boolean =
    full.fields.find(_.name == name).exists(_.dataType match {
      case LongType | IntegerType | DoubleType | FloatType | StringType |
           DateType | BooleanType => true
      case _ => false
    })

  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => primitive(a)
    case In(a, _) => primitive(a)
    case GreaterThan(a, _) => primitive(a)
    case GreaterThanOrEqual(a, _) => primitive(a)
    case LessThan(a, _) => primitive(a)
    case LessThanOrEqual(a, _) => primitive(a)
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(supported)
    // everything is returned as residual: the source prunes by
    // statistics, Spark keeps the authoritative evaluation
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required =
      if (requiredSchema.isEmpty) StructType(full.fields.take(1))
      else requiredSchema
  override def build(): Scan =
    new ArtifactScan(base, dataset, startVersion, cow, dir, full,
      required, pushed)
}

private[sources] case class ArtifactPartition(path: String) extends InputPartition

private[sources] class ArtifactScan(base: String, dataset: String,
                                    startVersion: Option[Long],
                                    cow: Boolean,
                                    dir: String, full: StructType,
                                    required: StructType,
                                    pushed: Array[Filter])
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Streaming over the COMMIT LOG: each committed [[graft.io.AtomicPublish]]
    * version is one exactly-once micro-batch — publish/subscribe on the
    * table's own transaction history, no side channel. Offsets are
    * version ids, so a restart from checkpoint resumes exactly after the
    * last version it processed (retention permitting — a pruned version
    * inside the requested range fails fast rather than silently
    * skipping data). */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(!cow, "cow tables stream by commit-log version, whose payload " +
      "is a manifest (rewrites re-reference rows); stream the underlying " +
      "publishes instead")
    new ArtifactMicroBatchStream(base, dataset, startVersion, required)
  }

  /** Footer-stats file pruning on the driver: a file survives iff every
    * pushed filter MAY match some row group (per-column min/max). For a
    * COW table the candidate list is the committed MANIFEST's file set
    * (pool files shared across versions), not a directory listing. */
  private lazy val (allFiles, keptFiles): (Seq[String], Seq[String]) = {
    val p = new Path(dir)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val files =
      if (cow) {
        val m = SparkSession.active.read.parquet(dir)
        // a deletion-vectored manifest cannot be served by a plain
        // file scan (position deletes would silently resurrect):
        // fail fast — compaction materializes the vectors
        require(!m.columns.contains("dv") ||
          m.where("dv <> ''").isEmpty,
          s"cow table $dir has deletion vectors; run CowTable.compact " +
            "before serving through graft-artifact")
        m.select("file").collect().map(_.getString(0)).toSeq.sorted
      }
      else fs.listStatus(p).toSeq.map(_.getPath)
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .map(_.toString).sorted
    val kept = files.filter { f =>
      val in = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val blocks = in.getFooter.getBlocks.asScala
        blocks.exists { b =>
          pushed.forall { flt =>
            val colOf = ArtifactScan.filterColumn(flt)
            b.getColumns.asScala
              .find(_.getPath.toDotString == colOf)
              .forall { cm =>
                val st = cm.getStatistics
                if (st == null || !st.hasNonNullValue) true
                else ArtifactScan.mayMatch(flt, st.genericGetMin,
                  st.genericGetMax)
              }
          }
        }
      } finally in.close()
    }
    (files, kept)
  }

  override def planInputPartitions(): Array[InputPartition] =
    keptFiles.map(ArtifactPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ArtifactReaderFactory(required.json, pushed)

  override def description(): String =
    s"graft-artifact $dir pushed=[${pushed.mkString(", ")}] " +
      s"files=${keptFiles.size}/${allFiles.size}"
}

/** Offset = committed version id (the table's own transaction log). */
private[sources] case class VersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private[sources] class ArtifactMicroBatchStream(base: String, dataset: String,
                                                startVersion: Option[Long],
                                                required: StructType)
  extends MicroBatchStream {

  private def spark = SparkSession.active
  private def fs = new Path(base)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** First version to EMIT defaults to the earliest still-readable one
    * (Kafka's `earliest`); `startVersion` skips history. The offset is
    * the version BEFORE the first emitted. */
  override def initialOffset(): Offset = VersionOffset(
    startVersion.map(_ - 1).getOrElse {
      val vs = graft.io.AtomicPublish.versions(spark, base)
      if (vs.isEmpty) -1L else vs.min - 1
    })

  override def latestOffset(): Offset =
    VersionOffset(graft.io.AtomicPublish.committed(spark, base))

  override def deserializeOffset(json: String): Offset =
    VersionOffset("""-?\d+""".r.findFirstIn(json)
      .getOrElse(sys.error(s"bad offset: $json")).toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].version
    val e = end.asInstanceOf[VersionOffset].version
    ((s + 1) to e).flatMap { v =>
      // fail fast on a pruned/partial version: silently skipping a
      // committed batch would be data loss the checkpoint can't see
      require(fs.exists(new Path(base, s"v$v/_PUBLISHED")),
        s"version $v under $base is not readable (pruned?); " +
          "increase the publisher's retain window for streaming readers")
      val d = new Path(base, s"v$v/$dataset")
      fs.listStatus(d).toSeq.map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("."))
        .map(p => ArtifactPartition(p.toString))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArtifactReaderFactory(required.json, Array.empty)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] object ArtifactScan {
  def filterColumn(f: Filter): String = f match {
    case EqualTo(a, _) => a
    case In(a, _) => a
    case GreaterThan(a, _) => a
    case GreaterThanOrEqual(a, _) => a
    case LessThan(a, _) => a
    case LessThanOrEqual(a, _) => a
    case _ => ""
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Number, y: Number) =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: org.apache.parquet.io.api.Binary, y: String) =>
      x.toStringUsingUTF8.compareTo(y)
    case (x: Comparable[_], y) =>
      x.asInstanceOf[Comparable[Any]].compareTo(y)
    case _ => 0
  }

  /** Conservative: true unless min/max PROVE the filter cannot match. */
  def mayMatch(f: Filter, min: Any, max: Any): Boolean = f match {
    case EqualTo(_, v) => cmp(min, v) <= 0 && cmp(max, v) >= 0
    case In(_, vs) => vs.exists(v => cmp(min, v) <= 0 && cmp(max, v) >= 0)
    case GreaterThan(_, v) => cmp(max, v) > 0
    case GreaterThanOrEqual(_, v) => cmp(max, v) >= 0
    case LessThan(_, v) => cmp(min, v) < 0
    case LessThanOrEqual(_, v) => cmp(min, v) <= 0
    case _ => true
  }

  /** Spark filter → parquet-mr predicate (row-group + record skipping on
    * the executor). Only long/int columns — others prune by footer stats
    * alone. */
  def toParquet(f: Filter, schema: StructType): Option[FilterPredicate] = {
    val dt = schema.fields.find(_.name == filterColumn(f)).map(_.dataType)
    def longCol(a: String) = FilterApi.longColumn(a)
    def intCol(a: String) = FilterApi.intColumn(a)
    (f, dt) match {
      case (EqualTo(a, v: Number), Some(LongType)) =>
        Some(FilterApi.eq(longCol(a), java.lang.Long.valueOf(v.longValue())))
      case (EqualTo(a, v: Number), Some(IntegerType)) =>
        Some(FilterApi.eq(intCol(a), java.lang.Integer.valueOf(v.intValue())))
      case (In(a, vs), Some(LongType)) if vs.nonEmpty =>
        Some(vs.map(v => FilterApi.eq(longCol(a),
          java.lang.Long.valueOf(v.asInstanceOf[Number].longValue())))
          .reduce[FilterPredicate](FilterApi.or))
      case (In(a, vs), Some(IntegerType)) if vs.nonEmpty =>
        Some(vs.map(v => FilterApi.eq(intCol(a),
          java.lang.Integer.valueOf(v.asInstanceOf[Number].intValue())))
          .reduce[FilterPredicate](FilterApi.or))
      case _ => None
    }
  }
}

private[sources] class ArtifactReaderFactory(requiredJson: String,
                                             pushed: Array[Filter])
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    val conf = new Configuration()
    val path = new Path(p.asInstanceOf[ArtifactPartition].path)
    // column projection is built PER FILE from the file's OWN footer:
    // pool files written by different commits can disagree on field
    // repetition (a create writes `required`, a merge's join output
    // writes `optional`), and parquet-mr's checkContains rejects a
    // projection lifted from another file's footer
    val in = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    val fileSchema = try in.getFooter.getFileMetaData.getSchema
    finally in.close()
    val projection = new MessageType(fileSchema.getName,
      required.fields.map(f0 =>
        fileSchema.getType(fileSchema.getFieldIndex(f0.name))): _*)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
    val predicate = pushed.flatMap(ArtifactScan.toParquet(_, required))
      .reduceOption[FilterPredicate](FilterApi.and)
    val builder = org.apache.parquet.hadoop.ParquetReader
      .builder(new GroupReadSupport(), path)
      .withConf(conf)
    val reader = predicate
      .map(pr => builder.withFilter(FilterCompat.get(pr)).build())
      .getOrElse(builder.build())

    new PartitionReader[InternalRow] {
      private var current: Group = _
      override def next(): Boolean = {
        current = reader.read()
        current != null
      }
      override def get(): InternalRow =
        ArtifactRows.toRow(current, required)
      override def close(): Unit = reader.close()
    }
  }
}

private[sources] object ArtifactRows {

  def toRow(g: Group, schema: StructType): InternalRow = {
    val out = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      val idx = g.getType.getFieldIndex(f.name)
      out(i) =
        if (g.getFieldRepetitionCount(idx) == 0) null
        else value(g, idx, f.dataType)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  private def value(g: Group, idx: Int, dt: DataType): Any = dt match {
    case LongType => g.getLong(idx, 0)
    case IntegerType => g.getInteger(idx, 0)
    case DoubleType => g.getDouble(idx, 0)
    case FloatType => g.getFloat(idx, 0)
    case BooleanType => g.getBoolean(idx, 0)
    case DateType => g.getInteger(idx, 0) // parquet DATE = days since epoch
    case StringType => UTF8String.fromString(g.getString(idx, 0))
    case ArrayType(et, _) =>
      // Spark's 3-level list encoding: field -> repeated `list` group ->
      // `element`
      val list = g.getGroup(idx, 0)
      val n = list.getFieldRepetitionCount(0)
      val arr = new Array[Any](n)
      var i = 0
      while (i < n) {
        val el = list.getGroup(0, i)
        arr(i) =
          if (el.getFieldRepetitionCount(0) == 0) null
          else value(el, 0, et)
        i += 1
      }
      new GenericArrayData(arr)
    case other =>
      throw new UnsupportedOperationException(
        s"graft-artifact: unsupported type ${other.sql}")
  }
}
