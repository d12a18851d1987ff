package graft.sources

import java.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, SupportsDelete, SupportsRead, SupportsRowLevelOperations, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.SupportsWrite
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperationBuilder, RowLevelOperationInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{AtomicPublish, CowTable}

/** V2 `TableCatalog` exposing [[CowTable]]s to SQL DML — the reference's
  * whole mutation surface is SQL (`DELETE`/`INSERT` inside
  * `fn_etl_data_load`, `/root/reference/sql/init/01_init_all.sql:63-141`),
  * so the row-level table must be reachable without the Scala API:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     classOf[graft.sources.GraftCatalog].getName)
  *   spark.sql("DELETE FROM graft.`/warehouse/orders` WHERE status = 'X'")
  *   spark.sql("INSERT INTO graft.`/warehouse/orders` SELECT ...")
  *   spark.sql("SELECT ... FROM graft.`/warehouse/orders`")
  * }}}
  *
  * Tables are addressed by their absolute base path (one backquoted
  * identifier part), so one catalog serves every cow table with no
  * root-directory configuration. Reads go through the same
  * [[GraftArtifactSource]] scan (manifest-resolved, footer-pruned,
  * DV-aware); `DELETE FROM … WHERE` maps to [[CowTable.deleteWhere]]
  * via `SupportsDelete` when every conjunct converts (stats-pruned
  * discovery and only matching files rewritten — a METADATA-routed
  * delete, not a rewrite of the table); `INSERT INTO` maps to
  * [[CowTable.append]] through the V1 write bridge (new pool files +
  * one manifest CAS commit, nothing rewritten); `MERGE INTO` /
  * `UPDATE` / non-convertible `DELETE` rewrite through the delta-based
  * row-level framework ([[CowRowLevelOperation]]). DDL closes the
  * lifecycle: `CREATE TABLE … TBLPROPERTIES ('key'='…')` (the
  * clustering-key contract rides in properties, CTAS included),
  * `DROP TABLE`, and the maintenance surface as native `CALL`
  * procedures ([[GraftProcedures]]) — a cow table is fully operable
  * from SQL with no Scala.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** Tables are path-addressed; there is no namespace to enumerate. */
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def loadTable(ident: Identifier): Table = {
    val base = ident.name()
    if (ident.namespace().nonEmpty || !base.startsWith("/") ||
      !AtomicPublish.exists(SparkSession.active, base) ||
      CowTable.meta(SparkSession.active, base).isEmpty)
      throw new NoSuchTableException(ident)
    new CowSqlTable(base)
  }

  /** `CREATE TABLE graft.`path` (…) TBLPROPERTIES ('key'='…')` — the
    * clustering-key contract rides in table properties: `key` (required,
    * the row identity and manifest-pruning dimension) and `statsCols`
    * (optional comma-separated per-file min/max columns). Version 0 is
    * an empty manifest carrying the meta; CTAS works too (Spark creates
    * then appends through the table's write builder). */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val base = ident.name()
    require(ident.namespace().isEmpty && base.startsWith("/"),
      s"graft tables are addressed by absolute base path, got $ident")
    require(partitions.isEmpty,
      "cow tables cluster on the `key` property, not PARTITIONED BY " +
        "(per-file key ranges + stats columns replace directory partitions)")
    val key = Option(properties.get("key")).getOrElse(sys.error(
      "CREATE TABLE on a graft table requires TBLPROPERTIES ('key'='<col>')"))
    val statsCols = Option(properties.get("statscols"))
      .orElse(Option(properties.get("statsCols")))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    CowTable.createEmpty(SparkSession.active, base, schema, key, statsCols)
    new CowSqlTable(base)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported; schema evolution is additive via MERGE")

  /** `DROP TABLE graft.`path``: removes the table's versions, pool and
    * meta. Only a path that actually holds a cow table is dropped. */
  override def dropTable(ident: Identifier): Boolean = {
    val base = ident.name()
    val spark = SparkSession.active
    if (ident.namespace().nonEmpty || !base.startsWith("/") ||
      !AtomicPublish.exists(spark, base) ||
      CowTable.meta(spark, base).isEmpty) false
    else {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")

  // ---- maintenance procedures: CALL graft.compact / graft.vacuum -----
  /** Unknown procedures surface as the analyzer's own ROUTINE_NOT_FOUND
    * resolution error (Spark 4.1 has no NoSuchProcedureException class;
    * AnalysisException is what a failed routine lookup reports), not a
    * bare RuntimeException. */
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.byName.getOrElse(
      ident.name().toLowerCase(java.util.Locale.ROOT),
      throw new org.apache.spark.sql.AnalysisException("ROUTINE_NOT_FOUND",
        Map("routineName" -> s"`$catalogName`.`${ident.name()}`")))

  /** Procedures live in the catalog's root namespace only. */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.nonEmpty) Array.empty
    else GraftProcedures.byName.keys.toArray.sorted
      .map(n => Identifier.of(Array.empty, n))
}

object GraftCatalog {

  /** The registered check: the full SQL DML surface against one cow
    * table — `DELETE FROM … WHERE` (routed through `SupportsDelete` into
    * the stats-pruned copy-on-write delete), `INSERT INTO … SELECT`
    * (new pool files + one manifest CAS, nothing rewritten), and the
    * final aggregate SELECTed back through the catalog's DV-aware DSv2
    * scan. In-band require: the catalog read and the API read agree on
    * the row count (same manifest, two paths). The oracle replays the
    * DML relationally. */
  def check(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "cow_sql_delete", dir, "cow_sql") {
      val base = graft.io.FsUtil.stateDir("cow_sql", dir)
      new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true) // self-contained
      CowTable.create(spark, base, graft.Tables.orders(spark, dir),
        "o_orderkey", numFiles = 8)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[GraftCatalog].getName)

      spark.sql(s"DELETE FROM graft.`$base` " +
        "WHERE o_orderstatus = 'F' AND o_totalprice < CAST(50000 AS DOUBLE)")
      val srcView = "cow_sql_orders_" +
        java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)
      graft.Tables.orders(spark, dir).createOrReplaceTempView(srcView)
      spark.sql(s"INSERT INTO graft.`$base` " +
        "SELECT o_orderkey + 1000000000L, o_custkey, 'Z', o_totalprice, " +
        s"o_orderdate, o_orderpriority FROM $srcView " +
        "WHERE o_orderkey % 103 = 5")

      require(spark.sql(s"SELECT COUNT(*) FROM graft.`$base`")
        .head().getLong(0) == CowTable.read(spark, base).count(),
        "catalog scan and API read must resolve the same manifest")
      spark.sql(
        s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           |                 AS DECIMAL(18,2)) AS DOUBLE) AS total
           |FROM graft.`$base` GROUP BY 1 ORDER BY 1""".stripMargin)
    }

  val checkSql: String =
    """WITH final AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      |  WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000.0)
      |  UNION ALL
      |  SELECT o_orderkey + 1000000000, o_totalprice, 'Z'
      |  FROM orders WHERE o_orderkey % 103 = 5
      |)
      |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |                 AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  /** SQL `MERGE INTO` + `UPDATE`, end-to-end through Spark's delta-based
    * row-level framework ([[CowRowLevelOperation]]): one MERGE carrying
    * all three actions (matched-delete on `k % 11 = 3`, matched-update
    * re-pricing `k % 7 = 0`, not-matched insert of re-keyed `k % 103 = 5`
    * rows), then an `UPDATE … WHERE` that must take the same row-level
    * path. In-band requires: the MERGE rewrites ZERO data files (deletes
    * and the update's delete half land as deletion vectors, inserts as
    * new pool files), and the catalog read equals the API read. The
    * oracle replays both statements relationally. */
  def mergeCheck(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "cow_sql_merge", dir, "cow_sqlm") {
      val base = graft.io.FsUtil.stateDir("cow_sqlm", dir)
      new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true) // self-contained
      val orders = graft.Tables.orders(spark, dir)
      CowTable.create(spark, base, orders, "o_orderkey", numFiles = 8)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[GraftCatalog].getName)
      val pre = CowTable.manifest(spark, base).map(_.file).toSet

      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      val k = col("o_orderkey")
      val srcDf = orders.filter(k % 7 === 0 && !(k % 11 === 3))
        .withColumn("o_totalprice", col("o_totalprice") + lit(5.0))
        .unionByName(orders.filter(k % 11 === 3)
          .withColumn("o_orderstatus", lit("D")))
        .unionByName(orders.filter(k % 103 === 5)
          .withColumn("o_orderkey", k + lit(mx)))
      val srcView = "cow_sqlm_src_" +
        java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)
      srcDf.createOrReplaceTempView(srcView)

      spark.sql(
        s"""MERGE INTO graft.`$base` t USING $srcView s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED AND s.o_orderstatus = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET
           |  o_totalprice = s.o_totalprice, o_orderstatus = 'U'
           |WHEN NOT MATCHED THEN INSERT
           |  (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |   o_orderdate, o_orderpriority)
           |  VALUES (s.o_orderkey, s.o_custkey, 'I', s.o_totalprice,
           |          s.o_orderdate, s.o_orderpriority)""".stripMargin)
      val m = CowTable.manifest(spark, base)
      require(m.map(_.file).toSet.intersect(pre) == pre,
        "a delta-based SQL MERGE must rewrite ZERO data files")
      require(m.exists(_.dvRows > 0),
        "the MERGE's deletes must land as deletion vectors")

      // UPDATE rewrites through the same delta path (no SupportsUpdate
      // metadata route exists): delete-by-key + re-insert
      spark.sql(s"UPDATE graft.`$base` SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderstatus = 'I' AND o_orderkey % 5 = 1")

      require(spark.sql(s"SELECT COUNT(*) FROM graft.`$base`")
        .head().getLong(0) == CowTable.read(spark, base).count(),
        "catalog scan and API read must resolve the same manifest")
      spark.sql(
        s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           |                 AS DECIMAL(18,2)) AS DOUBLE) AS total
           |FROM graft.`$base` GROUP BY 1 ORDER BY 1""".stripMargin)
    }

  val mergeCheckSql: String =
    """WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
      |merged AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 5.0
      |              ELSE o_totalprice END AS o_totalprice,
      |         CASE WHEN o_orderkey % 7 = 0 THEN 'U'
      |              ELSE o_orderstatus END AS o_orderstatus
      |  FROM orders WHERE o_orderkey % 11 <> 3
      |  UNION ALL
      |  SELECT o_orderkey + m, o_totalprice, 'I'
      |  FROM orders, mx WHERE o_orderkey % 103 = 5
      |),
      |final AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderstatus = 'I' AND o_orderkey % 5 = 1
      |              THEN o_totalprice * 2 ELSE o_totalprice
      |         END AS o_totalprice,
      |         o_orderstatus
      |  FROM merged
      |)
      |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |                 AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM final GROUP BY 1 ORDER BY 1""".stripMargin
}

/** A [[CowTable]] as a V2 table: DV-aware manifest-resolved reads,
  * metadata-routed `DELETE WHERE`, append-only `INSERT INTO`, and the
  * full delta-based row-level surface (`MERGE INTO`, `UPDATE`,
  * arbitrary-predicate `DELETE`) via [[CowRowLevelOperation]] — a
  * convertible DELETE still takes the cheaper metadata route through
  * `SupportsDelete`; everything else rewrites row-level. */
private[sources] class CowSqlTable(base: String)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations {

  private def spark = SparkSession.active
  private def tableMeta = CowTable.meta(spark, base).getOrElse(
    sys.error(s"no cow-table meta under $base"))

  override def name(): String = s"graft.`$base`"

  /** The meta schema with the clustering key marked NON-NULL — the key
    * is the row identity ([[CowRowLevelOperation.rowId]] requires a
    * non-nullable attribute), and [[CowTable]]'s pool writer enforces
    * the invariant on every write. */
  override def schema(): StructType = {
    val m = tableMeta
    val s = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
    StructType(s.fields.map(f =>
      if (f.name == m.key) f.copy(nullable = false) else f))
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val v = AtomicPublish.committed(spark, base)
    require(v >= 0, s"no committed version under $base")
    new ArtifactScanBuilder(base, "manifest", None, cow = true,
      s"$base/v$v/manifest", schema())
  }

  // ---- DELETE FROM … WHERE … --------------------------------------
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => CowSqlTable.toColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val pred = filters.flatMap(CowSqlTable.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true)) // no WHERE = truncate
    CowTable.deleteWhere(spark, base, pred, tableMeta.key)
    ()
  }

  // ---- MERGE INTO / UPDATE / row-level DELETE ----------------------
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    val m = tableMeta
    () => new CowRowLevelOperation(base, m.key, schema(), info.command())
  }

  // ---- INSERT INTO (append) ---------------------------------------
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              require(!overwrite,
                "INSERT OVERWRITE is not supported; use DELETE + INSERT " +
                  "or CowTable.merge")
              CowTable.append(SparkSession.active, base, data)
              ()
            }
          }
      }
    }
}

private[sources] object CowSqlTable {
  /** V2 source `Filter` → `Column` for the convertible subset; `None`
    * makes `canDeleteWhere` refuse, so Spark errors instead of running
    * a partial delete. */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) => for (x <- toColumn(l); y <- toColumn(r)) yield x && y
    case Or(l, r) => for (x <- toColumn(l); y <- toColumn(r)) yield x || y
    case Not(c) => toColumn(c).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

/** Maintenance procedures for cow tables, callable from SQL — the
  * OPTIMIZE/VACUUM surface every lakehouse exposes, here as Spark 4's
  * native `CALL` statement:
  *
  * {{{
  *   CALL graft.compact(`table` => '/warehouse/orders', target_rows => 1000000)
  *   CALL graft.vacuum('/warehouse/orders', 3600000)
  * }}}
  *
  * Each returns a one-row result set (the new committed version / the
  * reclaimed file count) so the caller can assert the effect in-band.
  */
private[sources] object GraftProcedures {

  import java.util.Collections
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.connector.read.{LocalScan, Scan}
  import org.apache.spark.sql.types.{LongType, StringType, StructType}

  private def result(schema: StructType, values: Any*): java.util.Iterator[Scan] =
    Collections.singletonList[Scan](new LocalScan {
      override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
        Array(new GenericInternalRow(values.toArray))
      override def readSchema(): StructType = schema
    }).iterator()

  private def base(input: org.apache.spark.sql.catalyst.InternalRow): String = {
    val b = input.getUTF8String(0).toString
    require(CowTable.meta(SparkSession.active, b).isDefined,
      s"no cow table under $b")
    b
  }

  /** `CALL graft.compact(table, target_rows)` → (version, data_files):
    * bin-packs undersized neighbors and materializes deletion vectors
    * ([[CowTable.compact]]); a no-op returns the current version. */
  object Compact extends UnboundProcedure with BoundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "bin-pack a cow table's files to ~target_rows and materialize " +
        "deletion vectors"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("cow table base path").build(),
      ProcedureParameter.in("target_rows", LongType)
        .comment("rows per packed file").build())
    override def call(input: org.apache.spark.sql.catalyst.InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val b = base(input)
      val key = CowTable.meta(spark, b).get.key
      val v = CowTable.compact(spark, b, input.getLong(1), key)
      result(new StructType().add("version", LongType)
        .add("data_files", LongType),
        v, CowTable.manifest(spark, b).size.toLong)
    }
  }

  /** `CALL graft.vacuum(table, grace_ms)` → (reclaimed_files):
    * deletes pool files referenced by no retained version
    * ([[CowTable.vacuum]]); `grace_ms` guards in-flight writers. */
  object Vacuum extends UnboundProcedure with BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "reclaim pool files referenced by no retained version"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("cow table base path").build(),
      ProcedureParameter.in("grace_ms", LongType)
        .defaultValue("0").comment("skip files younger than this").build())
    override def call(input: org.apache.spark.sql.catalyst.InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val b = base(input)
      val n = CowTable.vacuum(spark, b,
        if (input.isNullAt(1)) 0L else input.getLong(1))
      result(new StructType().add("reclaimed_files", LongType), n.toLong)
    }
  }

  val byName: Map[String, UnboundProcedure] =
    Map("compact" -> Compact, "vacuum" -> Vacuum)
}
