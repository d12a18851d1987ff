package graft.sources

import java.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDelete, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.SupportsWrite
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
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
  * one manifest CAS commit, nothing rewritten). Table DDL stays with
  * the Scala API ([[CowTable.create]]) — a catalog `CREATE TABLE`
  * cannot express the clustering key + stats-column contract.
  */
class GraftCatalog extends TableCatalog {

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

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "create cow tables via CowTable.create (clustering key + stats columns)")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")
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
}

/** A [[CowTable]] as a V2 table: DV-aware manifest-resolved reads,
  * metadata-routed `DELETE WHERE`, append-only `INSERT INTO`. */
private[sources] class CowSqlTable(base: String)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  private def spark = SparkSession.active
  private def tableMeta = CowTable.meta(spark, base).getOrElse(
    sys.error(s"no cow-table meta under $base"))

  override def name(): String = s"graft.`$base`"

  override def schema(): StructType =
    DataType.fromJson(tableMeta.schemaJson).asInstanceOf[StructType]

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
